"""Batched mip-pyramid texture sampler (Pallas) — ONE kernel launch per
texture for ALL channels, mip levels and MSAA sample grids.

Replaces the per-(level, channel, sample-grid) sampler-launch storm
(VERDICT r1 item 3: a 6-level RGB texture at MSAA 4 cost 72 pallas_calls
per frame) with a single launch, and upgrades the production path from
mip-NEAREST to true TRILINEAR (the Metal linear-mip sampler semantics,
mtl_engine.mm:603-612).

Design (band-kernel family; see raster_pallas.py):

  * The mip chain is packed into ONE f32[L, 3, PH, PW] pyramid where each
    level carries a 1-texel wrap/edge border (so REPEAT seams sample the
    true wrapped texel — fixing the r1-advice seam bug — and no in-kernel
    mod is needed: tap column = floor(u*w - 0.5) + 1 is always in range).
  * Grid = one program per (sample-grid, framebuffer tile). Each tile
    walks ONLY the mip levels its pixels actually reference
    (lmin..lmax from per-tile scalars — usually 1-2 of 10), DMAs a
    MWIN_H x MWIN_W window per level per channel, and accumulates
    trilinear contributions masked per pixel.
  * Window origins are per (tile, level), computed in XLA from the
    coordinate minima of the RELEVANT pixels only (those whose lo/hi tap
    is this level). Isotropic LOD bounds the relevant footprint to
    < 2 texels/pixel, so a 32x384 window covers a 8x128 tile except in
    pathological anisotropy, where taps clamp to the window border.
  * The in-register bilinear uses the two Mosaic-supported gather forms
    (lane gather within 128-lane slices + sublane gather within 8-row
    groups); the 32-row window keeps the amplification ~4x below the
    old 136-row sampler.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sampling import REPEAT

TILE_H = 8
TILE_W = 128
MWIN_H = 32    # 4 sublane groups
MWIN_W = 384   # 3 lane slices


def _cdiv(a, b):
    return -(-a // b)


def _should_interpret():
    return jax.default_backend() != "tpu"


def build_pyramid(mips, address_mode=REPEAT, channels=3):
    """Pack a mip chain into a bordered, uniformly-padded pyramid.

    mips: sequence of f32[h_i, w_i, C>=channels], mips[0] largest.
    Returns (pyramid f32[L, channels, PH, PW], sizes ((h, w), ...)).
    Border column/row 0 and w+1/h+1 hold the wrapped (REPEAT) or edge
    (CLAMP) texel so bilinear taps never need address wrapping.
    """
    h0, w0 = int(mips[0].shape[0]), int(mips[0].shape[1])
    ph = max(_cdiv(h0 + 2, TILE_H) * TILE_H, MWIN_H)
    pw = max(_cdiv(w0 + 2, TILE_W) * TILE_W, MWIN_W)
    levels = []
    sizes = []
    for m in mips:
        t = jnp.asarray(m, jnp.float32)[..., :channels]
        h, w = int(t.shape[0]), int(t.shape[1])
        sizes.append((h, w))
        if address_mode == REPEAT:
            t = jnp.concatenate([t[:, -1:], t, t[:, :1]], axis=1)
            t = jnp.concatenate([t[-1:], t, t[:1]], axis=0)
        else:
            t = jnp.concatenate([t[:, :1], t, t[:, -1:]], axis=1)
            t = jnp.concatenate([t[:1], t, t[-1:]], axis=0)
        t = jnp.moveaxis(t, -1, 0)                       # [3, h+2, w+2]
        t = jnp.pad(t, ((0, 0), (0, ph - h - 2), (0, pw - w - 2)))
        levels.append(t)
    return jnp.stack(levels), tuple(sizes)


def _impl():
    """Bilinear in-window gather implementation.

    "gather" (default): the round-3 lane/sublane take_along_axis
    pyramid — TPU-proven through the r2 sweep's kernels of the same
    family.
    "matmul" (opt-in, METALRENDERER_MIP_IMPL=matmul): one-hot MXU
    matmul gathers + mask-reduce y compose (see _make_kernel) — ~4x
    fewer unrolled vector ops per level visit, built to attack the
    956 s config-1 remote Mosaic compile (results_r02.json) that no
    CPU probe reproduces (~20 s locally). Selection by one-hot f32
    matmul is EXACT (single nonzero product per output; the bf16x3
    3-way split sums back to the f32 value bit-exactly), so interpret
    goldens are unchanged. Kept opt-in until a real-TPU A/B
    (tpu_round5.sh) confirms Mosaic compiles it and the numbers.
    """
    import os
    return os.environ.get("METALRENDERER_MIP_IMPL", "gather")


def _make_kernel(n_levels, nt, channels, impl="gather"):
    lf_max = float(n_levels - 1)
    use_matmul = impl == "matmul"

    def bilinear_stacked(win3, c0, r0, fx, fy):
        """All-channel bilinear via one-hot matmul gathers.

        win3: f32[channels*MWIN_H, MWIN_W] channel-stacked window;
        c0/r0: i32[8,128] window-relative tap origins; fx/fy: f32[8,128].
        Returns a tuple of ``channels`` f32[8,128] planes.

        Per framebuffer row r: the x gather for ALL window rows and ALL
        channels is ONE [3H, W] @ [W, 128] matmul against the one-hot
        column selector (exact selection — one nonzero product per
        output, no accumulation rounding); the y pick is a mask-multiply
        + per-channel 32-row reduction instead of 16 sublane gathers.
        The x/y lerps stay on the VPU in the same expression order as
        the gather path, so both implementations round identically.
        """
        h3 = channels * MWIN_H
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (MWIN_W, TILE_W), 0)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (h3, TILE_W), 0) \
            % MWIN_H
        out_rows = [[] for _ in range(channels)]
        for r in range(TILE_H):
            c0r = c0[r:r + 1, :]                      # [1,128]
            r0r = r0[r:r + 1, :]
            e0 = (iota_c == c0r).astype(jnp.float32)  # [MWIN_W,128]
            e1 = (iota_c == c0r + 1).astype(jnp.float32)
            # precision=HIGHEST is REQUIRED for the exactness claim: the
            # MXU's default single-pass bf16 mode would truncate the
            # f32 texel values (the platform's #1 numeric trap); under
            # the multi-pass split every partial product of a one-hot
            # operand is exact and sums back to the f32 value.
            xg0 = jnp.dot(win3, e0, precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)  # [3H,128]
            xg1 = jnp.dot(win3, e1, precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
            m0 = (iota_w == r0r).astype(jnp.float32)  # [3H,128]
            m1 = (iota_w == r0r + 1).astype(jnp.float32)

            def pick(xg, m):
                s = xg * m
                return [jnp.sum(s[c * MWIN_H:(c + 1) * MWIN_H], axis=0,
                                keepdims=True) for c in range(channels)]

            t00 = pick(xg0, m0)
            t01 = pick(xg0, m1)
            t10 = pick(xg1, m0)
            t11 = pick(xg1, m1)
            fxr = fx[r:r + 1, :]
            fyr = fy[r:r + 1, :]
            for c in range(channels):
                top = t00[c] * (1.0 - fxr) + t10[c] * fxr
                bot = t01[c] * (1.0 - fxr) + t11[c] * fxr
                out_rows[c].append(top * (1.0 - fyr) + bot * fyr)
        return tuple(jnp.concatenate(rows, axis=0) for rows in out_rows)

    def bilinear_window(win2d, c0, r0, fx, fy):
        """win2d: [MWIN_H, MWIN_W]; c0/r0 i32[8,128] window-relative tap
        origins; fx/fy f32[8,128]. Returns f32[8,128]."""

        def build_xg(xi_row):
            """XG[r, j] = win2d[r, xi_row[0, j]] — lane gather per slice
            + slice select. xi_row: i32[1, 128]."""
            idx = jnp.broadcast_to(xi_row, (MWIN_H, TILE_W))
            p0 = jnp.take_along_axis(win2d[:, 0:128], idx % 128, axis=1)
            p1 = jnp.take_along_axis(win2d[:, 128:256], idx % 128, axis=1)
            p2 = jnp.take_along_axis(win2d[:, 256:384], idx % 128, axis=1)
            return jnp.where(idx < 128, p0,
                             jnp.where(idx < 256, p1, p2))

        def compose_y(xg, yi_row):
            """out[0, j] = xg[yi_row[0, j], j] — sublane gather within
            8-row groups + group select."""
            ylo = jnp.broadcast_to(yi_row % 8, (8, TILE_W))
            yhi = yi_row // 8
            out = jnp.zeros((1, TILE_W), jnp.float32)
            for g in range(MWIN_H // 8):
                part = jnp.take_along_axis(xg[8 * g:8 * g + 8], ylo, axis=0)
                out = jnp.where(yhi == g, part[0:1], out)
            return out

        rows = []
        for r in range(TILE_H):
            c0r = c0[r:r + 1, :]
            r0r = r0[r:r + 1, :]
            xg0 = build_xg(c0r)
            xg1 = build_xg(c0r + 1)
            t00 = compose_y(xg0, r0r)
            t01 = compose_y(xg0, r0r + 1)
            t10 = compose_y(xg1, r0r)
            t11 = compose_y(xg1, r0r + 1)
            fxr = fx[r:r + 1, :]
            fyr = fy[r:r + 1, :]
            top = t00 * (1.0 - fxr) + t10 * fxr
            bot = t01 * (1.0 - fxr) + t11 * fxr
            rows.append(top * (1.0 - fyr) + bot * fyr)
        return jnp.concatenate(rows, axis=0)

    def kernel(lmin_r, lmax_r, wx_r, wy_r, lw_r, lh_r,
               pyr_hbm, u_r, v_r, lodc_r, mask_r, out_r, win, sem):
        i = pl.program_id(0)
        u = u_r[...]
        v = v_r[...]
        lodc = lodc_r[...]
        msk = mask_r[...]
        l0 = jnp.floor(lodc)
        frac = lodc - l0
        hi = jnp.minimum(l0 + 1.0, lf_max)

        def body(l, acc):
            wx = pl.multiple_of(wx_r[i * n_levels + l], 128)
            wy = pl.multiple_of(wy_r[i * n_levels + l], 8)
            cp = pltpu.make_async_copy(
                pyr_hbm.at[l, :, pl.ds(wy, MWIN_H), pl.ds(wx, MWIN_W)],
                win, sem)
            cp.start()
            cp.wait()
            wl = lw_r[l].astype(jnp.float32)
            hl = lh_r[l].astype(jnp.float32)
            s = u * wl - 0.5
            x0 = jnp.floor(s)
            fx = s - x0
            c0 = jnp.clip(x0.astype(jnp.int32) + 1 - wx, 0, MWIN_W - 2)
            t = v * hl - 0.5
            y0 = jnp.floor(t)
            fy = t - y0
            r0 = jnp.clip(y0.astype(jnp.int32) + 1 - wy, 0, MWIN_H - 2)
            lfl = l.astype(jnp.float32)
            wpx = msk * ((1.0 - frac) * (l0 == lfl).astype(jnp.float32)
                         + frac * (hi == lfl).astype(jnp.float32))
            if use_matmul:
                vals = bilinear_stacked(
                    win[...].reshape(channels * MWIN_H, MWIN_W),
                    c0, r0, fx, fy)
                return tuple(acc[c] + wpx * vals[c]
                             for c in range(channels))
            return tuple(
                acc[c] + wpx * bilinear_window(win[c], c0, r0, fx, fy)
                for c in range(channels))

        zero = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        acc = jax.lax.fori_loop(lmin_r[i], lmax_r[i] + 1, body,
                                (zero,) * channels)
        for c in range(channels):
            out_r[c] = acc[c]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n_levels", "sizes", "ph", "pw",
                                    "channels", "impl"))
def _sample_padded(pyramid, u, v, lodc, maskf, n_levels, sizes, ph, pw,
                   channels=3, impl="gather"):
    """u, v, lodc, maskf: f32[B, Hp, Wp] (tile-padded). Returns
    f32[B, channels, Hp, Wp]."""
    b, hp, wp = u.shape
    nty, ntx = hp // TILE_H, wp // TILE_W
    nt = nty * ntx
    L = n_levels

    # --- per-(tile, level) window origins from RELEVANT pixels only ----
    ut = u.reshape(b, nty, TILE_H, ntx, TILE_W)
    vt = v.reshape(b, nty, TILE_H, ntx, TILE_W)
    lt = lodc.reshape(b, nty, TILE_H, ntx, TILE_W)
    mt = maskf.reshape(b, nty, TILE_H, ntx, TILE_W) > 0.0
    inf = jnp.float32(jnp.inf)

    # LOD escalation: a tile whose relevant-pixel footprint cannot fit a
    # window at level l (uv-discontinuous tiles — e.g. two cube faces, or
    # two instances sharing a texture — or forced low-LOD sampling of a
    # large texture) bumps those pixels to level l+1 and retries. The
    # result stays a VALID (blurrier) trilinear sample instead of a
    # window-border clamp to wrong texels. Isotropic-LOD footprints are
    # < 2 texels/pixel, so coherent tiles never trip the limits.
    uspan_limit = MWIN_W - 130.0   # 128-aligned origin slack + bilinear
    vspan_limit = MWIN_H - 10.0    # 8-aligned origin slack + bilinear
    for l in range(L - 1):
        lf = jnp.float32(l)
        l0t = jnp.floor(lt)
        hit = jnp.minimum(l0t + 1.0, L - 1.0)
        rel = mt & ((l0t == lf) | (hit == lf))
        h_l, w_l = sizes[l]
        umin = jnp.min(jnp.where(rel, ut, inf), axis=(2, 4))
        umax = jnp.max(jnp.where(rel, ut, -inf), axis=(2, 4))
        vmin = jnp.min(jnp.where(rel, vt, inf), axis=(2, 4))
        vmax = jnp.max(jnp.where(rel, vt, -inf), axis=(2, 4))
        bad = (((umax - umin) * w_l > uspan_limit)
               | ((vmax - vmin) * h_l > vspan_limit))   # [b, nty, ntx]
        bump = rel & bad[:, :, None, :, None]
        # lo tap at a bad level -> escalate to l+1 (blurrier, valid);
        # hi tap only -> drop it (frac -> 0; the lo level already fit).
        lt = jnp.where(bump, jnp.where(l0t == lf, lf + 1.0, l0t), lt)
    lodc = lt.reshape(b, hp, wp)

    l0t = jnp.floor(lt)
    hit = jnp.minimum(l0t + 1.0, L - 1.0)
    wx_list, wy_list = [], []
    for l in range(L):
        lf = jnp.float32(l)
        rel = mt & ((l0t == lf) | (hit == lf))
        umin = jnp.min(jnp.where(rel, ut, inf), axis=(2, 4))   # [b,nty,ntx]
        vmin = jnp.min(jnp.where(rel, vt, inf), axis=(2, 4))
        h_l, w_l = sizes[l]
        cmin = jnp.floor(umin * w_l - 0.5) + 1.0
        rmin = jnp.floor(vmin * h_l - 0.5) + 1.0
        cmin = jnp.where(jnp.isfinite(cmin), cmin, 0.0)
        rmin = jnp.where(jnp.isfinite(rmin), rmin, 0.0)
        wx_list.append(jnp.clip(
            (cmin.astype(jnp.int32) // 128) * 128, 0, pw - MWIN_W))
        wy_list.append(jnp.clip(
            (rmin.astype(jnp.int32) // 8) * 8, 0, ph - MWIN_H))
    wx = jnp.stack(wx_list, axis=-1).reshape(-1)     # [b*nt*L]
    wy = jnp.stack(wy_list, axis=-1).reshape(-1)

    lmin = jnp.min(jnp.where(mt, l0t, jnp.float32(L)), axis=(2, 4))
    lmax = jnp.max(jnp.where(mt, hit, -1.0), axis=(2, 4))
    lmin = lmin.astype(jnp.int32).reshape(-1)        # [b*nt]
    lmax = lmax.astype(jnp.int32).reshape(-1)

    lw = jnp.asarray([s[1] for s in sizes], jnp.int32)
    lh = jnp.asarray([s[0] for s in sizes], jnp.int32)

    kernel = _make_kernel(L, nt, channels, impl=impl)
    blk = lambda: pl.BlockSpec(
        (None, TILE_H, TILE_W),
        lambda i, *_: (i // nt, (i % nt) // ntx, (i % nt) % ntx))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(b * nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # pyramid in HBM
            blk(), blk(), blk(), blk(),
        ],
        out_specs=pl.BlockSpec(
            (None, channels, TILE_H, TILE_W),
            lambda i, *_: (i // nt, 0, (i % nt) // ntx, (i % nt) % ntx)),
        scratch_shapes=[
            pltpu.VMEM((channels, MWIN_H, MWIN_W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, channels, hp, wp), jnp.float32),
        interpret=_should_interpret(),
    )(lmin, lmax, wx, wy, lw, lh, pyramid, u, v, lodc, maskf)


def sample_pyramid_tiled(mips, u, v, lod, mask, address_mode=REPEAT,
                         channels=3):
    """Trilinear (or bilinear when L == 1 / lod == 0) sampling of a mip
    chain at [B, H, W] (or [H, W]) uv grids, one kernel launch.

    mips: sequence of f32[h, w, C>=channels]; u, v in [0,1] texture
    space (v down); lod: f32 LOD (clipped to the chain); mask: bool —
    pixels that consume this texture (others return 0 and cost nothing:
    a tile with no masked pixel skips its level loop entirely).
    Returns ``channels`` planes shaped like u.
    """
    squeeze = u.ndim == 2
    if squeeze:
        u, v, lod, mask = u[None], v[None], lod[None], mask[None]
    b, h, w = u.shape
    L = len(mips)

    pyramid, sizes = build_pyramid(mips, address_mode, channels)
    ph, pw = int(pyramid.shape[2]), int(pyramid.shape[3])

    if address_mode == REPEAT:
        u = jnp.mod(u, 1.0)
        v = jnp.mod(v, 1.0)
    else:
        u = jnp.clip(u, 0.0, 1.0)
        v = jnp.clip(v, 0.0, 1.0)
    lod = jnp.clip(lod, 0.0, L - 1.0)
    lodc = jnp.broadcast_to(jnp.asarray(lod, jnp.float32), u.shape)
    maskf = jnp.broadcast_to(mask, u.shape).astype(jnp.float32)

    hp = _cdiv(h, TILE_H) * TILE_H
    wp = _cdiv(w, TILE_W) * TILE_W
    if (hp, wp) != (h, w):
        pad = ((0, 0), (0, hp - h), (0, wp - w))
        u = jnp.pad(u, pad, mode="edge")
        v = jnp.pad(v, pad, mode="edge")
        lodc = jnp.pad(lodc, pad, mode="edge")
        maskf = jnp.pad(maskf, pad)                  # zero: padded px inert

    out = _sample_padded(pyramid, u, v, lodc, maskf,
                         n_levels=L, sizes=sizes, ph=ph, pw=pw,
                         channels=channels, impl=_impl())
    out = out[:, :, :h, :w]
    if squeeze:
        return tuple(out[0, c] for c in range(channels))
    return tuple(out[:, c] for c in range(channels))
