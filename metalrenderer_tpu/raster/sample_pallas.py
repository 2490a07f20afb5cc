"""Gather-free bilinear texture sampling on TPU (Pallas).

XLA's general gather lowers to a serial expander on TPU (~430 ms for the
shadow-map lookups of one 1080p frame). This kernel exploits the spatial
coherence of texture lookups: for each 8x128 framebuffer tile, the set of
texels it touches is (almost always) a small window. Per tile we DMA a
WIN_H x WIN_W window (origin from a per-tile coordinate min computed in
plain XLA) into VMEM and resolve the four bilinear taps with in-register
gathers:

  * lane gather  (jnp.take_along_axis axis=1, within 128 lanes) picks the
    x texel of every pixel for ALL window rows at once -> XG[r, p];
  * sublane gather (axis=0, within 8-row groups) + a group select picks
    each pixel's y row out of XG.

Mosaic supports exactly these two gather forms (verified by probe); no
other gathers exist in the frame.

Round-3 upgrades (VERDICT r2 items 2 and 4):

  * WINDOW DIMENSIONS ARE STATIC PER CALL, sized from the texture/grid
    shapes: at small framebuffers (where per-pixel uv steps are large)
    the window grows, up to the VMEM cap. The 136x256 default is kept
    at flagship scales.
  * UNIFORM-WINDOW FAST PATH: if every texel in the tile's window is
    identical (the common all-far case of shadow maps — the caster
    imprint occupies a small fraction of the 1024^2 map), the bilinear
    result IS that constant; the 8x4-tap gather pyramid is skipped.
  * Optional MASK: pixels that consume the lookup. Tiles with no masked
    pixel skip everything including the window DMA; window origins are
    computed over masked pixels only.

Round-4 upgrade (VERDICT r3 item 3 — kill the lit-fallback):

  * SEGMENT SWEEP. Pixels whose bilinear footprint falls outside their
    tile's window are no longer clamped-and-flagged: tiles containing
    any such pixel run a fori_loop over a static grid of window-sized
    segments that covers the WHOLE (padded) texture, resolving exactly
    the out-of-window pixels. Per-(tile, segment) "any pixel lands
    here" scalars skip irrelevant segments, and per-segment uniformity
    constants (same block min/max tables as the fast path) skip the DMA
    + gather pyramid over far-plane regions. Every pixel is exact at
    every framebuffer/texture size; there is NO lit fallback left. The
    ``oob`` flag now reports only masked-out pixels (whose value is
    unused by construction — ``oob_value`` substitutes there).

Since round 2 this kernel serves ONLY the shadow-map test
(BlinnPhong.metal:91); color textures and normal maps use the batched
pyramid sampler (mip_pallas.py).

VERIFICATION STATUS: the segment-sweep path (async DMA inside
lax.fori_loop under nested pl.when + the enlarged scalar-prefetch
list) has so far executed only in interpret mode — the TPU pool was
down for all of rounds 3-4. Its Mosaic compilability and MXU numerics
are gated by the real-TPU parity sweep (benchmarks/tpu_round5.sh step
10 -> tests/test_tpu_parity.py); do not rely on the exactness claim on
hardware until that gate is green.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
TILE_W = 128
WIN_H = 136   # default: 17 sublane groups; 8-aligned origin
WIN_W = 256   # default: two lane tiles; 128-aligned origin
# Window VMEM budget (f32 texels). 128k texels = 512 KiB — comfortably
# inside VMEM next to the tile blocks.
_WIN_AREA_CAP = 131072


def _cdiv(a, b):
    return -(-a // b)


def window_shape(tex_h, tex_w, height, width):
    """Static window dims for a (texture, framebuffer) pair.

    Heuristic: a planar receiver maps ~the whole texture across ~the
    whole screen, so a tile's footprint is ~tex_size * tile_size /
    fb_size texels; 2x guard + alignment slack covers curvature. Never
    below the proven 136x256 default, never above the (padded) texture
    or the VMEM cap. Footprints beyond the window are exact too — the
    segment sweep covers them — so this only tunes the fast path."""
    need_w = int(tex_w * TILE_W / max(width, 1) * 2) + 130
    need_h = int(tex_h * TILE_H / max(height, 1) * 2) + 10
    wh = max(WIN_H, _cdiv(need_h, 8) * 8)
    ww = max(WIN_W, _cdiv(need_w, 128) * 128)
    # Texture-extent clamp: the window must FIT inside the (tiled-up,
    # alignment-padded) texture, whose extent is >= WIN_H+8 / WIN_W+128
    # by construction.
    wh = min(wh, (tex_h // 8) * 8)
    ww = min(ww, (tex_w // 128) * 128)
    while wh * ww > _WIN_AREA_CAP and wh > WIN_H:
        wh -= 8
    while wh * ww > _WIN_AREA_CAP and ww > WIN_W:
        ww -= 128
    return wh, ww


def _sweep_grid(tex_h, tex_w, win_h, win_w):
    """Static segment grid covering the whole padded texture.

    Segments are window-sized, strided by (win_h-8, win_w-128) so
    consecutive segments overlap by one alignment unit — every bilinear
    footprint {x0, x0+1} x {y0, y0+1} lies fully inside at least one
    segment. Origins: min(k*stride, origin_max), all 8/128-aligned.
    Returns (n_sy, n_sx, sy, sx, oy_max, ox_max); n_sy == n_sx == 1
    means the window already covers the whole texture (no sweep)."""
    oy_max = tex_h - win_h            # 8-aligned: both multiples of 8
    ox_max = tex_w - win_w
    sy = max(win_h - 8, 8)
    sx = max(win_w - 128, 128)
    n_sy = 1 if oy_max == 0 else _cdiv(oy_max, sy) + 1
    n_sx = 1 if ox_max == 0 else _cdiv(ox_max, sx) + 1
    return n_sy, n_sx, sy, sx, oy_max, ox_max


def _make_kernel(win_h, win_w, has_mask, sweep=None, frames_nt=None,
                 frame_tex_h=None):
    """sweep: None or (n_sy, n_sx, sy, sx, oy_max, ox_max).
    frames_nt/frame_tex_h: tiles-per-frame and per-frame texture rows of
    the frame-stacked variant (segment origins are frame-local there)."""
    def kernel(*args):
        idx = 0
        wy_ref, wx_ref, uni_ref, uval_ref = args[0:4]
        idx = 4
        if has_mask:
            any_ref = args[idx]
            idx += 1
        if sweep is not None:
            full_ref, segany_ref, seguni_ref, segval_ref = args[idx:idx + 4]
            idx += 4
        tex_hbm, x_ref, y_ref, out_ref, win, sem = args[idx:]
        i = pl.program_id(0)
        # Frame-stacked variant: coordinates and window origins stay
        # FRAME-LOCAL (adding f*tex_h to f32 y would destroy fractional
        # precision at large f); the integer frame row-offset enters only
        # at the HBM DMA origin.
        if frames_nt is not None:
            base = (i // frames_nt) * frame_tex_h
            gidx = i // frames_nt
        else:
            base = 0
            gidx = 0

        def tap_rows(xl, yl, emit):
            """Resolve the bilinear taps of every pixel against the
            CURRENT contents of ``win`` (window-local coords xl, yl);
            emit(r, val[1, TILE_W]) per pixel row."""
            xl = jnp.clip(xl, 0.0, win_w - 1.001)
            yl = jnp.clip(yl, 0.0, win_h - 1.001)
            x0 = jnp.floor(xl)
            y0 = jnp.floor(yl)
            fx = xl - x0
            fy = yl - y0
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)

            def build_xg(xi_row):
                """XG[r, j] = win[r, xi_row[0, j]] for one pixel row:
                lane gather of every window row at each pixel's x
                (per 128-lane slice + slice select)."""
                idx = jnp.broadcast_to(xi_row, (win_h, TILE_W))
                out = jnp.take_along_axis(win[:, 0:128], idx % 128,
                                          axis=1)
                for s in range(1, win_w // 128):
                    part = jnp.take_along_axis(
                        win[:, s * 128:(s + 1) * 128], idx % 128, axis=1)
                    out = jnp.where(idx >= s * 128, part, out)
                return out                           # [win_h, 128]

            def compose_y(xg, yi_row):
                """out[0, j] = xg[yi_row[0, j], j]: sublane gather
                within 8-row groups + group select. Mosaic's gather
                lowering needs indices with the operand's exact shape
                (no implicit broadcast)."""
                ylo = jnp.broadcast_to(yi_row % 8, (8, TILE_W))
                yhi = yi_row // 8
                out = jnp.zeros((1, TILE_W), jnp.float32)
                for g in range(win_h // 8):
                    part = jnp.take_along_axis(xg[8 * g:8 * g + 8],
                                               ylo, axis=0)
                    out = jnp.where(yhi == g, part[0:1], out)
                return out

            for r in range(TILE_H):
                x0r = x0i[r:r + 1, :]
                y0r = y0i[r:r + 1, :]
                xg0 = build_xg(x0r)
                xg1 = build_xg(x0r + 1)
                t00 = compose_y(xg0, y0r)
                t01 = compose_y(xg0, y0r + 1)
                t10 = compose_y(xg1, y0r)
                t11 = compose_y(xg1, y0r + 1)
                fxr = fx[r:r + 1, :]
                fyr = fy[r:r + 1, :]
                top = t00 * (1.0 - fxr) + t10 * fxr
                bot = t01 * (1.0 - fxr) + t11 * fxr
                emit(r, top * (1.0 - fyr) + bot * fyr)

        def sample_tile():
            # Uniform window (precomputed block min==max — the all-far
            # shadow-map case): every bilinear tap returns the constant.
            # Skip the window DMA *and* the gather pyramid — at flagship
            # scale the 136x256 window DMA per tile is ~280 MB/frame,
            # most of it over far-plane texels.
            @pl.when(uni_ref[i] > 0)
            def _():
                out_ref[...] = jnp.full((TILE_H, TILE_W), uval_ref[i],
                                        jnp.float32)

            @pl.when(uni_ref[i] == 0)
            def _():
                # Origins are snapped in _sample_padded; tell Mosaic so
                # the dynamic DMA slice provably stays tile-aligned.
                wy = pl.multiple_of(wy_ref[i], 8)
                wx = pl.multiple_of(wx_ref[i], 128)
                wyg = pl.multiple_of(base + wy, 8)

                cp = pltpu.make_async_copy(
                    tex_hbm.at[pl.ds(wyg, win_h), pl.ds(wx, win_w)],
                    win, sem)
                cp.start()
                cp.wait()

                x = x_ref[...] - wx.astype(jnp.float32)
                y = y_ref[...] - wy.astype(jnp.float32)
                tap_rows(x, y, lambda r, val: out_ref.__setitem__(
                    (slice(r, r + 1), slice(None)), val))

        def sweep_tile():
            """Exact resolution of out-of-window pixels: visit every
            texture segment that contains some oob pixel's footprint.
            All coordinates are frame-local; ``base`` shifts the DMA."""
            n_sy, n_sx, sy, sx, oy_max, ox_max = sweep
            n_seg = n_sy * n_sx
            xg = x_ref[...]
            yg = y_ref[...]
            xo = xg - wx_ref[i].astype(jnp.float32)
            yo = yg - wy_ref[i].astype(jnp.float32)
            oob_pix = ((xo < 0.0) | (xo > win_w - 2.0) |
                       (yo < 0.0) | (yo > win_h - 2.0))
            x0g = jnp.floor(xg)
            y0g = jnp.floor(yg)

            def body(s, carry):
                oy = jnp.minimum((s // n_sx) * sy, oy_max)
                ox = jnp.minimum((s % n_sx) * sx, ox_max)

                @pl.when(segany_ref[i * n_seg + s] > 0)
                def _():
                    oyf = oy.astype(jnp.float32)
                    oxf = ox.astype(jnp.float32)
                    in_seg = ((x0g >= oxf) & (x0g + 1.0 <= oxf + win_w - 1)
                              & (y0g >= oyf)
                              & (y0g + 1.0 <= oyf + win_h - 1))
                    upd = in_seg & oob_pix

                    @pl.when(seguni_ref[gidx * n_seg + s] > 0)
                    def _():
                        const = segval_ref[gidx * n_seg + s]
                        for r in range(TILE_H):
                            out_ref[r:r + 1, :] = jnp.where(
                                upd[r:r + 1, :], const, out_ref[r:r + 1, :])

                    @pl.when(seguni_ref[gidx * n_seg + s] == 0)
                    def _():
                        oy8 = pl.multiple_of(base + oy, 8)
                        ox128 = pl.multiple_of(ox, 128)
                        cp = pltpu.make_async_copy(
                            tex_hbm.at[pl.ds(oy8, win_h),
                                       pl.ds(ox128, win_w)], win, sem)
                        cp.start()
                        cp.wait()
                        tap_rows(xg - oxf, yg - oyf,
                                 lambda r, val: out_ref.__setitem__(
                                     (slice(r, r + 1), slice(None)),
                                     jnp.where(upd[r:r + 1, :], val,
                                               out_ref[r:r + 1, :])))
                return carry

            jax.lax.fori_loop(0, n_seg, body, 0)

        if has_mask:
            @pl.when(any_ref[i] > 0)
            def _():
                sample_tile()

            @pl.when(any_ref[i] == 0)
            def _():
                # No masked pixel in this tile: any value works (the
                # caller's oob substitution / mask gating ignores it).
                out_ref[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        else:
            sample_tile()

        if sweep is not None:
            @pl.when(full_ref[i] > 0)
            def _():
                sweep_tile()

    return kernel


def _should_interpret():
    return jax.default_backend() != "tpu"


def _pad_aligned(tex, address_mode, axes=(0, 1)):
    """Pad a texture up by one alignment unit (8 rows / 128 cols) so
    every bilinear tap index is in-extent: wrap-content for repeat
    (tap x0+1 == tex_w reads texel 0's value), edge copies for clamp
    (coords are clipped to tex-0.5, so the top tap x0+1 == tex_w
    INTENTIONALLY reads the edge-replicated padding texel — that is
    what reproduces the clamp-to-edge plateau of a hardware sampler)."""
    h_ax, w_ax = axes
    pad = [(0, 0)] * tex.ndim
    pad[h_ax] = (0, 8 + (-tex.shape[h_ax]) % 8)
    pad[w_ax] = (0, 128 + (-tex.shape[w_ax]) % 128)
    mode = "wrap" if address_mode == "repeat" else "edge"
    return jnp.pad(tex, pad, mode=mode)


def _sweep_prefetch(x, y, maskf, wxg, wyg, smin, smax, sweep, win_h, win_w,
                    tile_shape, has_mask):
    """XLA-side sweep scalars: per-tile any-oob flag, per-(tile, segment)
    landing flags, per-segment uniformity (value). tile_shape =
    (nty, ntx) or (F, nty, ntx) for the frame-stacked variant (smin/smax
    then carry a leading frame axis)."""
    n_sy, n_sx, sy, sx, oy_max, ox_max = sweep
    oob = ((x - wxg) < 0.0) | ((x - wxg) > win_w - 2.0) | \
          ((y - wyg) < 0.0) | ((y - wyg) > win_h - 2.0)
    if has_mask:
        oob = oob & (maskf > 0.0)
    batched = len(tile_shape) == 3
    if batched:
        F, nty, ntx = tile_shape
        obt = oob.reshape(F, nty, TILE_H, ntx, TILE_W)
        red_axes = (2, 4)
    else:
        nty, ntx = tile_shape
        obt = oob.reshape(nty, TILE_H, ntx, TILE_W)
        red_axes = (1, 3)
    full_any = jnp.any(obt, axis=red_axes).reshape(-1).astype(jnp.int32)

    # Per-(tile, segment) visit flags from the per-tile bounding box of
    # the OOB pixels' floor coordinates — 4 reductions total instead of
    # one full-resolution landing mask per segment (up to ~32 of them on
    # the hot sampling path). Conservative by construction (a bbox can
    # overlap a segment no actual pixel lands in): the kernel re-tests
    # every pixel (`upd = in_seg & oob_pix`), so an over-claimed flag
    # costs one extra segment visit, never a wrong sample.
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    inf = jnp.float32(jnp.inf)
    x0t = x0.reshape(obt.shape)
    y0t = y0.reshape(obt.shape)
    x0min = jnp.min(jnp.where(obt, x0t, inf), axis=red_axes)
    x0max = jnp.max(jnp.where(obt, x0t, -inf), axis=red_axes)
    y0min = jnp.min(jnp.where(obt, y0t, inf), axis=red_axes)
    y0max = jnp.max(jnp.where(obt, y0t, -inf), axis=red_axes)

    seg_any, seg_uni, seg_val = [], [], []
    for s in range(n_sy * n_sx):
        oy = min((s // n_sx) * sy, oy_max)
        ox = min((s % n_sx) * sx, ox_max)
        seg_any.append((x0max >= ox) & (x0min <= ox + win_w - 2) &
                       (y0max >= oy) & (y0min <= oy + win_h - 2))
        if batched:
            seg_uni.append(smin[:, oy // 8, ox // 128]
                           == smax[:, oy // 8, ox // 128])
            seg_val.append(smin[:, oy // 8, ox // 128])
        else:
            seg_uni.append(smin[oy // 8, ox // 128]
                           == smax[oy // 8, ox // 128])
            seg_val.append(smin[oy // 8, ox // 128])
    # [tiles, n_seg] / [frames-or-1, n_seg], flattened segment-minor.
    seg_any = jnp.stack(seg_any, axis=-1).reshape(-1).astype(jnp.int32)
    seg_uni = jnp.stack(seg_uni, axis=-1).reshape(-1).astype(jnp.int32)
    seg_val = jnp.stack(seg_val, axis=-1).reshape(-1).astype(jnp.float32)
    return full_any, seg_any, seg_uni, seg_val


@functools.partial(jax.jit,
                   static_argnames=("tex_h", "tex_w", "win_h", "win_w",
                                    "has_mask"))
def _sample_padded(tex, x, y, maskf, tex_h, tex_w, win_h, win_w, has_mask):
    h, w = x.shape
    nty, ntx = h // TILE_H, w // TILE_W
    nt = nty * ntx

    # Per-tile window origins from the coordinate minima of the RELEVANT
    # pixels (plain XLA). Without a mask every pixel is relevant.
    xt = x.reshape(nty, TILE_H, ntx, TILE_W)
    yt = y.reshape(nty, TILE_H, ntx, TILE_W)
    if has_mask:
        mt = maskf.reshape(nty, TILE_H, ntx, TILE_W) > 0.0
        inf = jnp.float32(jnp.inf)
        xmin = jnp.min(jnp.where(mt, xt, inf), axis=(1, 3)).reshape(-1)
        ymin = jnp.min(jnp.where(mt, yt, inf), axis=(1, 3)).reshape(-1)
        xmin = jnp.where(jnp.isfinite(xmin), xmin, 0.0)
        ymin = jnp.where(jnp.isfinite(ymin), ymin, 0.0)
        tile_any = jnp.any(mt, axis=(1, 3)).reshape(-1).astype(jnp.int32)
    else:
        xmin = jnp.min(xt, axis=(1, 3)).reshape(-1)
        ymin = jnp.min(yt, axis=(1, 3)).reshape(-1)
        tile_any = None
    # Clip bounds snap DOWN to alignment: a raw tex_h - win_h bound on a
    # non-multiple-of-8 texture would emit unaligned origins, breaking
    # both the kernel's multiple_of DMA claim and the block-grain
    # uniformity lookup below. (Textures are alignment-padded by the
    # wrappers, so the snaps are exact.)
    wx = jnp.clip((jnp.floor(xmin).astype(jnp.int32) // 128) * 128,
                  0, ((tex_w - win_w) // 128) * 128)
    wy = jnp.clip((jnp.floor(ymin).astype(jnp.int32) // 8) * 8,
                  0, ((tex_h - win_h) // 8) * 8)

    # Per-tile window uniformity, precomputed in XLA: block min/max at the
    # window alignment grain (8x128), sliding-window-reduced to every
    # legal window origin. A uniform window (min == max) means every
    # bilinear tap returns that constant — the kernel then skips the
    # window DMA and the whole gather pyramid. Shadow maps are mostly
    # far-plane, so this turns ~80-95% of tiles into a constant fill.
    hb, wb = tex_h // 8, tex_w // 128
    blocks = tex.reshape(hb, 8, wb, 128)
    bmin = jnp.min(blocks, axis=(1, 3))
    bmax = jnp.max(blocks, axis=(1, 3))
    kh, kw = win_h // 8, win_w // 128
    smin = jax.lax.reduce_window(bmin, jnp.inf, jax.lax.min,
                                 (kh, kw), (1, 1), "VALID")
    smax = jax.lax.reduce_window(bmax, -jnp.inf, jax.lax.max,
                                 (kh, kw), (1, 1), "VALID")
    oidx = (wy // 8) * smin.shape[1] + (wx // 128)
    uval = jnp.take(smin.reshape(-1), oidx)
    umax = jnp.take(smax.reshape(-1), oidx)
    uni = (uval == umax).astype(jnp.int32)

    sweep = _sweep_grid(tex_h, tex_w, win_h, win_w)
    need_sweep = sweep[0] * sweep[1] > 1
    wxg = jnp.broadcast_to(wx.reshape(nty, 1, ntx, 1),
                           (nty, TILE_H, ntx, TILE_W)).reshape(h, w)
    wyg = jnp.broadcast_to(wy.reshape(nty, 1, ntx, 1),
                           (nty, TILE_H, ntx, TILE_W)).reshape(h, w)

    scalars = [wy, wx, uni, uval] + ([tile_any] if has_mask else [])
    if need_sweep:
        scalars += list(_sweep_prefetch(
            x, y, maskf, wxg, wyg, smin, smax, sweep, win_h, win_w,
            (nty, ntx), has_mask))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # texture stays in HBM
            pl.BlockSpec((TILE_H, TILE_W),
                         lambda i, *_: (i // ntx, i % ntx)),
            pl.BlockSpec((TILE_H, TILE_W),
                         lambda i, *_: (i // ntx, i % ntx)),
        ],
        out_specs=pl.BlockSpec((TILE_H, TILE_W),
                               lambda i, *_: (i // ntx, i % ntx)),
        scratch_shapes=[
            pltpu.VMEM((win_h, win_w), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        _make_kernel(win_h, win_w, has_mask,
                     sweep=sweep if need_sweep else None),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        interpret=_should_interpret(),
    )(*scalars, tex, x, y)

    # Every in-mask pixel is exact (window or sweep); only masked-out
    # pixels remain "oob" (their value is unused — callers may still
    # substitute oob_value there).
    if has_mask:
        oob = maskf <= 0.0
    else:
        oob = jnp.zeros((h, w), bool)
    return out, oob


@functools.partial(jax.jit,
                   static_argnames=("tex_h", "tex_w", "win_h", "win_w"))
def _sample_padded_frames(tex_b, x, y, maskf, tex_h, tex_w, win_h, win_w):
    """Frame-batched variant of _sample_padded: per-frame textures
    [F, tex_h, tex_w] and grids [F, hp, wp]. Frames stack VERTICALLY
    (texture rows and framebuffer rows both), y/window origins carry the
    frame's row offset, and per-frame origin CLIPS keep every window
    inside its own frame's map — the kernel is reused unchanged."""
    F, hp, wp = x.shape
    nty, ntx = hp // TILE_H, wp // TILE_W
    nt = nty * ntx

    xt = x.reshape(F, nty, TILE_H, ntx, TILE_W)
    yt = y.reshape(F, nty, TILE_H, ntx, TILE_W)
    mt = maskf.reshape(F, nty, TILE_H, ntx, TILE_W) > 0.0
    inf = jnp.float32(jnp.inf)
    xmin = jnp.min(jnp.where(mt, xt, inf), axis=(2, 4))      # [F,nty,ntx]
    ymin = jnp.min(jnp.where(mt, yt, inf), axis=(2, 4))
    xmin = jnp.where(jnp.isfinite(xmin), xmin, 0.0)
    ymin = jnp.where(jnp.isfinite(ymin), ymin, 0.0)
    tile_any = jnp.any(mt, axis=(2, 4)).astype(jnp.int32)

    wx = jnp.clip((jnp.floor(xmin).astype(jnp.int32) // 128) * 128,
                  0, ((tex_w - win_w) // 128) * 128)
    wy_local = jnp.clip((jnp.floor(ymin).astype(jnp.int32) // 8) * 8,
                        0, ((tex_h - win_h) // 8) * 8)

    hb, wb = tex_h // 8, tex_w // 128
    blocks = tex_b.reshape(F, hb, 8, wb, 128)
    bmin = jnp.min(blocks, axis=(2, 4))
    bmax = jnp.max(blocks, axis=(2, 4))
    kh, kw = win_h // 8, win_w // 128
    smin = jax.lax.reduce_window(bmin, jnp.inf, jax.lax.min,
                                 (1, kh, kw), (1, 1, 1), "VALID")
    smax = jax.lax.reduce_window(bmax, -jnp.inf, jax.lax.max,
                                 (1, kh, kw), (1, 1, 1), "VALID")
    oidx = ((wy_local // 8) * smin.shape[2] + (wx // 128)).reshape(F, -1)
    uval = jnp.take_along_axis(smin.reshape(F, -1), oidx, axis=1)
    umax = jnp.take_along_axis(smax.reshape(F, -1), oidx, axis=1)
    uni = (uval == umax).astype(jnp.int32)

    # Frames stack vertically in the TEXTURE only; pixel y coordinates
    # and window origins stay frame-local (adding f*tex_h to f32 y would
    # cost fractional precision at large f — measured 1e-4-grade sample
    # error at frame 2 of a 512^2 map). The kernel shifts the DMA origin
    # by (i // nt) * tex_h instead.
    tex_st = tex_b.reshape(F * tex_h, tex_w)
    x_st = x.reshape(F * hp, wp)
    y_st = y.reshape(F * hp, wp)

    sweep = _sweep_grid(tex_h, tex_w, win_h, win_w)
    need_sweep = sweep[0] * sweep[1] > 1
    wxg = jnp.broadcast_to(wx.reshape(F, nty, 1, ntx, 1),
                           (F, nty, TILE_H, ntx, TILE_W)).reshape(F, hp, wp)
    wyg_l = jnp.broadcast_to(wy_local.reshape(F, nty, 1, ntx, 1),
                             (F, nty, TILE_H, ntx, TILE_W)).reshape(F, hp, wp)

    scalars = [wy_local.reshape(-1), wx.reshape(-1), uni.reshape(-1),
               uval.reshape(-1), tile_any.reshape(-1)]
    if need_sweep:
        # Sweep scalars use FRAME-LOCAL coordinates (the kernel adds the
        # frame's row offset from i // nt).
        scalars += list(_sweep_prefetch(
            x, y, maskf, wxg, wyg_l, smin, smax, sweep, win_h, win_w,
            (F, nty, ntx), True))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(F * nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((TILE_H, TILE_W),
                         lambda i, *_: (i // ntx, i % ntx)),
            pl.BlockSpec((TILE_H, TILE_W),
                         lambda i, *_: (i // ntx, i % ntx)),
        ],
        out_specs=pl.BlockSpec((TILE_H, TILE_W),
                               lambda i, *_: (i // ntx, i % ntx)),
        scratch_shapes=[
            pltpu.VMEM((win_h, win_w), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = _make_kernel(win_h, win_w, True,
                          sweep=sweep if need_sweep else None,
                          frames_nt=nt, frame_tex_h=tex_h)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F * hp, wp), jnp.float32),
        interpret=_should_interpret(),
    )(*scalars, tex_st, x_st, y_st)

    oob = maskf <= 0.0
    return out.reshape(F, hp, wp), oob


def sample_bilinear_tiled_batch(tex_b, u, v, address_mode="repeat",
                                oob_value=None, mask=None):
    """Frame-batched sample_bilinear_tiled: per-frame textures
    f32[F, TH, TW] sampled at f32[F, H, W] uv grids in ONE launch (the
    batched shadow-map test). Semantics match sample_bilinear_tiled per
    frame exactly."""
    F, th, tw = tex_b.shape
    rep_y = _cdiv(WIN_H + 8, th) if th < WIN_H + 8 else 1
    rep_x = _cdiv(WIN_W + 128, tw) if tw < WIN_W + 128 else 1
    if rep_y > 1 or rep_x > 1:
        if address_mode == "repeat":
            tex_b = jnp.tile(tex_b, (1, rep_y, rep_x))
        else:
            tex_b = jnp.pad(
                tex_b, ((0, 0), (0, th * (rep_y - 1)),
                        (0, tw * (rep_x - 1))), mode="edge")
    tex_b = _pad_aligned(tex_b, address_mode, axes=(1, 2))
    th_p, tw_p = tex_b.shape[1:]

    x = u * tw - 0.5
    y = v * th - 0.5
    if address_mode == "repeat":
        x = jnp.mod(x, tw)
        y = jnp.mod(y, th)
    else:
        # Clip to tw-0.5 (not tw-1-eps): the top tap then reads the
        # edge-replicated padding texel, reproducing clamp-to-edge's
        # "both taps collapse onto the last texel" plateau exactly
        # (sampling.py::sample_bilinear clamps indices, not coords).
        x = jnp.clip(x, 0.0, tw - 0.5)
        y = jnp.clip(y, 0.0, th - 0.5)

    _, h, w = x.shape
    win_h, win_w = window_shape(th_p, tw_p, h, w)
    hp = _cdiv(h, TILE_H) * TILE_H
    wp = _cdiv(w, TILE_W) * TILE_W
    if mask is None:
        mask = jnp.ones(x.shape, bool)
    maskf = jnp.broadcast_to(mask, x.shape).astype(jnp.float32)
    if (hp, wp) != (h, w):
        pad = ((0, 0), (0, hp - h), (0, wp - w))
        x = jnp.pad(x, pad, mode="edge")
        y = jnp.pad(y, pad, mode="edge")
        maskf = jnp.pad(maskf, pad)

    out, oob = _sample_padded_frames(tex_b, x, y, maskf,
                                     tex_h=th_p, tex_w=tw_p,
                                     win_h=win_h, win_w=win_w)
    out = out[:, :h, :w]
    oob = oob[:, :h, :w]
    if oob_value is not None:
        out = jnp.where(oob, jnp.float32(oob_value), out)
    return out


def sample_bilinear_tiled(tex, u, v, address_mode="repeat",
                          oob_value=None, mask=None):
    """Bilinear sample of a single-channel texture at [H, W] uv grids.

    tex: f32[TH, TW]; u, v in [0,1] texture space (v down). Matches
    raster/sampling.py::sample_bilinear semantics (half-texel centers,
    repeat or clamp addressing) but runs gather-free on TPU. Exact for
    EVERY pixel: tile-window fast path + segment sweep for footprints
    beyond the window.

    ``oob_value``: substituted for masked-out pixels (whose value is
    unused by construction). With no mask it is never applied.

    ``mask``: bool[H, W] — pixels that consume the result. Tiles with no
    masked pixel skip the window DMA and all tap work; masked-out pixels
    read ``oob_value`` (or whatever the window produced if it is None).
    """
    th, tw = tex.shape
    # The window machinery needs a minimum texture extent; tile small
    # textures up (repeat) or pad-edge (clamp) on the host side of jit.
    rep_y = _cdiv(WIN_H + 8, th) if th < WIN_H + 8 else 1
    rep_x = _cdiv(WIN_W + 128, tw) if tw < WIN_W + 128 else 1
    if rep_y > 1 or rep_x > 1:
        if address_mode == "repeat":
            tex = jnp.tile(tex, (rep_y, rep_x))
        else:
            tex = jnp.pad(tex, ((0, th * (rep_y - 1)), (0, tw * (rep_x - 1))),
                          mode="edge")
    tex = _pad_aligned(tex, address_mode)
    th_p, tw_p = tex.shape

    x = u * tw - 0.5
    y = v * th - 0.5
    if address_mode == "repeat":
        x = jnp.mod(x, tw)
        y = jnp.mod(y, th)
    else:
        # See sample_bilinear_tiled_batch: tw-0.5 keeps the clamp-mode
        # edge plateau exact via the edge-replicated padding texel.
        x = jnp.clip(x, 0.0, tw - 0.5)
        y = jnp.clip(y, 0.0, th - 0.5)

    h, w = x.shape
    win_h, win_w = window_shape(th_p, tw_p, h, w)
    hp = _cdiv(h, TILE_H) * TILE_H
    wp = _cdiv(w, TILE_W) * TILE_W
    if (hp, wp) != (h, w):
        # Edge-pad so padding pixels don't poison the per-tile window min.
        x = jnp.pad(x, ((0, hp - h), (0, wp - w)), mode="edge")
        y = jnp.pad(y, ((0, hp - h), (0, wp - w)), mode="edge")
    has_mask = mask is not None
    if has_mask:
        maskf = jnp.broadcast_to(mask, (h, w)).astype(jnp.float32)
        if (hp, wp) != (h, w):
            maskf = jnp.pad(maskf, ((0, hp - h), (0, wp - w)))
    else:
        maskf = jnp.zeros((hp, wp), jnp.float32)
    out, oob = _sample_padded(tex, x, y, maskf, th_p, tw_p,
                              win_h, win_w, has_mask)
    out = out[:h, :w]
    if oob_value is not None:
        out = jnp.where(oob[:h, :w], jnp.float32(oob_value), out)
    return out
