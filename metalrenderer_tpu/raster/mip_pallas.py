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
    walks a per-tile VISIT LIST (level, window origin, uv half-open
    bounds) of compile-time capacity 2L but typically 1-3 live entries,
    DMAs a MWIN_H x MWIN_W window per visit per channel, and
    accumulates trilinear contributions masked per pixel.
  * Visits are built in XLA from the coordinate minima of the RELEVANT
    pixels only (those whose lo/hi tap is this level). Isotropic LOD
    bounds the relevant footprint to < 2 texels/pixel, so a 32x384
    window covers a 8x128 tile whenever the tile's uv field is
    coherent; a uv-DISCONTINUOUS tile (two cube faces, or two
    instances sharing a texture) gets TWO visits at the same level —
    one window per uv cluster — so seam tiles sample EXACTLY instead
    of blurring (the r5 LOD-escalation scheme cost config 4 its 40 dB
    parity bar: whole-tile bumps on seam tiles vs the dense sampler).
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
FIX = float(1 << 20)   # fixed-point scale for uv visit bounds (SMEM i32)
MAX_VISITS = 8         # per-tile visit-slot cap (the arrays live in SMEM)
SMEM_VISIT_BUDGET = 600_000   # bytes of SMEM the visit arrays may use


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


def _make_kernel(n_levels, nt, channels, impl="gather", vmax=None):
    lf_max = float(n_levels - 1)
    use_matmul = impl == "matmul"
    if vmax is None:
        vmax = min(2 * n_levels, MAX_VISITS)

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

    inv_fix = 1.0 / FIX

    def kernel(nvis_r, vmeta_r, vgeo_r, lw_r, lh_r,
               pyr_hbm, u_r, v_r, lodc_r, mask_r, out_r, win, sem):
        i = pl.program_id(0)
        u = u_r[...]
        v = v_r[...]
        lodc = lodc_r[...]
        msk = mask_r[...]
        l0 = jnp.floor(lodc)
        frac = lodc - l0
        hi = jnp.minimum(l0 + 1.0, lf_max)
        shr = jax.lax.shift_right_logical

        def body(k, acc):
            idx = i * vmax + k
            m = vmeta_r[idx]
            g = vgeo_r[idx]
            l = shr(m, 24) & 31
            wx = pl.multiple_of((g & 1023) * 128, 128)
            wy = pl.multiple_of((shr(g, 10) & 16383) * 8, 8)
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
            # Visit bounds, unpacked from the meta word: a seam tile
            # splits into two visits at the same level; each pixel is
            # claimed by exactly one via the half-open range on the
            # split axis (fixed-point mid matches the XLA-side cluster
            # membership bit-for-bit). Selection is ARITHMETIC blends on
            # exact 0/1 scalars — scalar-predicate vector selects are
            # not Mosaic-compilable here.
            axis_f = (shr(m, 22) & 1).astype(jnp.float32)
            side_f = (shr(m, 21) & 1).astype(jnp.float32)
            split_f = (shr(m, 23) & 1).astype(jnp.float32)
            mid = (m & 0x1FFFFF).astype(jnp.float32) * inv_fix
            coord = u + (v - u) * axis_f
            ge_f = (coord >= mid).astype(jnp.float32)
            in_rng = ((1.0 - split_f)
                      + split_f * (side_f * ge_f
                                   + (1.0 - side_f) * (1.0 - ge_f)))
            wpx = msk * in_rng * (
                (1.0 - frac) * (l0 == lfl).astype(jnp.float32)
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
        acc = jax.lax.fori_loop(0, nvis_r[i], body, (zero,) * channels)
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

    # --- per-tile VISIT LISTS from RELEVANT pixels only ----------------
    # A visit = (level, window origin, half-open uv bounds). Coherent
    # tiles get one visit per referenced level (same windows as before);
    # a uv-discontinuous tile (cube-face seam, instances sharing a
    # texture) is SPLIT into two clusters by one threshold on the worse
    # axis and gets one exact visit per cluster. Only when even the
    # 2-way split cannot fit a window do pixels LOD-escalate (lo tap one
    # level coarser — blurrier but valid; hi-only taps drop to frac=0).
    ut = u.reshape(b, nty, TILE_H, ntx, TILE_W)
    vt = v.reshape(b, nty, TILE_H, ntx, TILE_W)
    lt = lodc.reshape(b, nty, TILE_H, ntx, TILE_W)
    mt = maskf.reshape(b, nty, TILE_H, ntx, TILE_W) > 0.0
    inf = jnp.float32(jnp.inf)

    uspan_limit = MWIN_W - 130.0   # 128-aligned origin slack + bilinear
    vspan_limit = MWIN_H - 10.0    # 8-aligned origin slack + bilinear

    def _mm(rel, a):
        return (jnp.min(jnp.where(rel, a, inf), axis=(2, 4)),
                jnp.max(jnp.where(rel, a, -inf), axis=(2, 4)))

    def _origin(umin, vmin, w_l, h_l):
        cmin = jnp.floor(umin * w_l - 0.5) + 1.0
        rmin = jnp.floor(vmin * h_l - 0.5) + 1.0
        cmin = jnp.where(jnp.isfinite(cmin), cmin, 0.0)
        rmin = jnp.where(jnp.isfinite(rmin), rmin, 0.0)
        return (jnp.clip((cmin.astype(jnp.int32) // 128) * 128,
                         0, pw - MWIN_W),
                jnp.clip((rmin.astype(jnp.int32) // 8) * 8,
                         0, ph - MWIN_H))

    # Visits are packed 2 i32/visit and capped at VMAX slots per tile —
    # these arrays live in SMEM, where the naive layout (7 arrays x 2L
    # slots) costs 1.26 MB at 1080p with an 11-level chain and kills the
    # Mosaic compile. meta: mid_i | side<<21 | axis<<22 | split<<23 |
    # level<<24; geo: wx/128 | (wy/8)<<10.
    assert L <= 32
    vmax_slots = min(2 * L, MAX_VISITS)
    used = jnp.zeros((b, nty, ntx), jnp.int32)
    slots = {k: [] for k in ("valid", "meta", "geo")}

    for l in range(L):
        lf = jnp.float32(l)
        h_l, w_l = sizes[l]
        l0t = jnp.floor(lt)
        hit = jnp.minimum(l0t + 1.0, L - 1.0)
        # frac == 0 pixels have NO hi tap: excluding them keeps dropped
        # hi taps (and integer-lod pixels) out of window footprints, so
        # an escalated pixel cannot cascade-blur its l+1 neighbors.
        rel = mt & ((l0t == lf) | ((hit == lf) & (lt > l0t)))
        has = jnp.any(rel, axis=(2, 4))                    # [b, nty, ntx]
        umin, umax = _mm(rel, ut)
        vmin, vmax = _mm(rel, vt)
        bad_u = (umax - umin) * w_l > uspan_limit
        bad_v = (vmax - vmin) * h_l > vspan_limit
        fits = has & ~bad_u & ~bad_v

        # Split threshold, quantized to the kernel's fixed-point grid so
        # XLA cluster membership and the in-kernel bounds test agree
        # bit-for-bit.
        axis_v = bad_v    # 32-row windows trip far sooner than 384-col
        mid = jnp.where(axis_v, 0.5 * (vmin + vmax), 0.5 * (umin + umax))
        mid_i = jnp.clip(jnp.round(mid * FIX), 0, FIX).astype(jnp.int32)
        mid_q = mid_i.astype(jnp.float32) / FIX
        coord = jnp.where(axis_v[:, :, None, :, None], vt, ut)
        in_a = coord < mid_q[:, :, None, :, None]
        rel_a = rel & in_a
        rel_b = rel & ~in_a

        def _cluster(relc):
            hasc = jnp.any(relc, axis=(2, 4))
            cumin, cumax = _mm(relc, ut)
            cvmin, cvmax = _mm(relc, vt)
            fitc = (hasc & ((cumax - cumin) * w_l <= uspan_limit)
                    & ((cvmax - cvmin) * h_l <= vspan_limit))
            return hasc, fitc, _origin(cumin, cvmin, w_l, h_l)

        has_a, fit_a, (wx_a, wy_a) = _cluster(rel_a)
        has_b, fit_b, (wx_b, wy_b) = _cluster(rel_b)
        wx_w, wy_w = _origin(umin, vmin, w_l, h_l)

        terminal = l == L - 1   # no coarser level: visit anyway (taps
        ok_a = fit_a | terminal  # clamp to the border as a last resort)
        ok_b = fit_b | terminal

        # Slot budget: emitting this level's visits must leave one slot
        # free for the terminal catch-all; tiles over budget emit
        # nothing here and their pixels escalate instead. At the
        # terminal level a tile whose 2-way split no longer fits the
        # remaining slots collapses to ONE whole-footprint visit.
        want0 = jnp.where(fits, has, has_a & ok_a)
        want1 = ~fits & has_b & ok_b
        need = want0.astype(jnp.int32) + want1.astype(jnp.int32)
        budget = vmax_slots if terminal else vmax_slots - 1
        can = used + need <= budget
        if terminal:
            whole = has & ~can
            v0 = jnp.where(can, want0, has)
            v1 = can & want1
            use_whole = fits | whole
        else:
            whole = jnp.zeros_like(fits)
            v0 = can & want0
            v1 = can & want1
            use_whole = fits
        used = used + v0.astype(jnp.int32) + v1.astype(jnp.int32)

        # slot 0: the whole footprint when coherent (or the terminal
        # catch-all), else cluster A with bounds coord < mid.
        split0 = (~use_whole).astype(jnp.int32)
        axis_i = axis_v.astype(jnp.int32)
        slots["valid"].append(v0)
        slots["meta"].append(mid_i | (0 << 21) | (axis_i << 22)
                             | (split0 << 23) | (l << 24))
        slots["geo"].append(
            jnp.where(use_whole, wx_w, wx_a) // 128
            | (jnp.where(use_whole, wy_w, wy_a) // 8) << 10)
        # slot 1: cluster B (split tiles only), bounds coord >= mid.
        slots["valid"].append(v1)
        slots["meta"].append(mid_i | (1 << 21) | (axis_i << 22)
                             | (1 << 23) | (l << 24))
        slots["geo"].append(wx_b // 128 | (wy_b // 8) << 10)

        if l < L - 1:
            bump = ((rel_a & ~fit_a[:, :, None, :, None])
                    | (rel_b & ~fit_b[:, :, None, :, None]))
            bump = bump & ~fits[:, :, None, :, None]
            bump = bump | (rel & ~can[:, :, None, :, None])
            lt = jnp.where(bump,
                           jnp.where(l0t == lf, lf + 1.0, l0t), lt)
    lodc = lt.reshape(b, hp, wp)

    def _stacked(key):
        return jnp.stack(slots[key], axis=-1).reshape(b * nt, 2 * L)
    valid = _stacked("valid")
    order = jnp.argsort((~valid).astype(jnp.int32), axis=-1,
                        stable=True)          # live visits first
    nvis = jnp.sum(valid, axis=-1, dtype=jnp.int32)

    def _compact(key):
        return jnp.take_along_axis(_stacked(key), order, axis=-1
                                   )[:, :vmax_slots].reshape(-1)

    lw = jnp.asarray([s[1] for s in sizes], jnp.int32)
    lh = jnp.asarray([s[0] for s in sizes], jnp.int32)

    kernel = _make_kernel(L, nt, channels, impl=impl,
                          vmax=vmax_slots)
    blk = lambda: pl.BlockSpec(
        (None, TILE_H, TILE_W),
        lambda i, *_: (i // nt, (i % nt) // ntx, (i % nt) % ntx))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
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
    )(nvis, _compact("meta"), _compact("geo"),
      lw, lh, pyramid, u, v, lodc, maskf)


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

    # The per-tile visit arrays live in SMEM and scale with b * nt —
    # a frame-folded batch (b = F) at 1080p blows the ~1 MB budget at
    # F >= 8. Process the batch in sub-batches sized to the budget;
    # quality is unchanged (visits are per-tile), only launches repeat.
    nt_single = _cdiv(h, TILE_H) * _cdiv(w, TILE_W)
    bcap = max(1, SMEM_VISIT_BUDGET // (nt_single * (1 + 2 * MAX_VISITS)
                                        * 4))
    if b > bcap:
        g = _cdiv(b, bcap)
        pad = g * bcap - b
        if pad:
            zpad = lambda a: jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
            u, v, lod = zpad(u), zpad(v), zpad(lod)
            mask = jnp.concatenate(
                [mask, jnp.zeros((pad,) + mask.shape[1:], bool)])
        outs = jax.lax.map(
            lambda args: jnp.stack(
                sample_pyramid_tiled(mips, *args, address_mode=address_mode,
                                     channels=channels), axis=1),
            (u.reshape(g, bcap, h, w), v.reshape(g, bcap, h, w),
             lod.reshape(g, bcap, h, w), mask.reshape(g, bcap, h, w)))
        outs = outs.reshape(g * bcap, channels, h, w)[:b]
        if squeeze:
            return tuple(outs[0, c] for c in range(channels))
        return tuple(outs[:, c] for c in range(channels))

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
