"""Tile-binned Pallas rasterizer — the TPU replacement for Metal's
fixed-function raster + depth hardware plus the attribute interpolators
(SURVEY.md §2 "the centerpiece Pallas kernel").

Design (TPU-first; see binning.py for the data-layout contract):

  * Grid = one program per 64-triangle CHUNK. A scalar-prefetch array maps
    each chunk to its framebuffer tile; the output BlockSpec index_map
    reads it, so consecutive chunks of one tile ACCUMULATE into the same
    resident VMEM block (Pallas block-revisiting). The z-buffer lives in
    the output block itself — no scratch, no manual DMA, automatic
    double-buffered pipelining of the chunk operands.
  * Each chunk is a [3, 512] visibility operand (rows A, B, C of plane
    groups e0, e1, e2, z, tl0, tl1, tl2, valid x 64 triangles) plus a
    [3, 1024] attribute operand (14 plane groups of value/w — world, uv,
    normal, 1/w, and per-triangle constants riding on the 1/w plane).
    The kernel evaluates every plane for all 64 triangles at all tile
    pixels with MXU contractions ([3, G*64]^T x [3, P]); triangles live
    in sublanes, pixels in lanes, so depth resolve and the winner-one-hot
    attribute reduction are sublane ops producing [1, P] rows.
    Interpolated G-buffer attributes come straight out of the kernel —
    ZERO XLA gathers anywhere in the frame (432 ms -> sub-ms at 1080p).
  * Watertightness under the MXU's 3-pass bf16 f32 emulation: shared-edge
    coefficients are exact negations, multiply/add are sign-symmetric
    under IEEE rounding, so e_left == -e_right exactly and every sample
    lands in exactly one of two adjacent triangles.
  * Depth semantics: LessEqual + submission-order tie-break, matching the
    reference's depth state (mtl_engine.mm:436-439). Within a chunk the
    max sublane index among z == zmin wins; across chunks `zmin <= zbuf`
    lets later chunks win ties. Big triangles (span > cap) run after a
    tile's binned list — same-z ties between a big and a small triangle
    are the one documented deviation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from .binning import (ATTR_COLS, ATTR_GROUPS, CHUNK, COLS, ROW_DEPTH,
                      ROW_COLOR, ROW_INVW, ROW_MATKIND, ROW_NMID,
                      ROW_NORMAL, ROW_TEXID, ROW_UV, ROW_WORLD,
                      bin_triangles, build_attr_fields, build_tri_fields,
                      num_chunks)
from .geometry import TriangleSetup
from .shade import GBuffer

GOUT_ROWS = 16  # 15 attr rows + depth in ROW_DEPTH
TILE8_H = 8     # pixel block layout inside the kernel: [8, tile_w]


def _cdiv(a, b):
    return -(-a // b)


def _make_kernel(ntx, tile_h, tile_w, sample_offsets, clear_depth,
                 n_small_entries, n_big_chunks, with_attrs):
    n_samples = len(sample_offsets)
    P = tile_h * tile_w
    tile8_w = P // TILE8_H  # pixel-block lane width for the attr layout

    def process_chunk(mm, amm, base_entry, tile, accs):
        """mm: [3, COLS]; amm: [3, ATTR_COLS] or None. Accumulates into
        VMEM scratch (persistent across grid steps)."""
        if with_attrs:
            zacc, wacc, gacc = accs
        else:
            zacc, wacc = accs
        tx = tile % ntx
        ty = tile // ntx
        ox = (tx * tile_w).astype(jnp.float32)
        oy = (ty * tile_h).astype(jnp.float32)

        # Tile-relative C rows (exact f32 FMAs keep edge magnitudes small
        # so the bf16x3 matmul stays sub-1/256-pixel accurate).
        a_row, b_row, c_row = mm[0:1, :], mm[1:2, :], mm[2:3, :]
        c_adj = c_row + a_row * ox + b_row * oy          # [1, COLS]

        # Flags as [CHUNK,1] columns. A [1,N]->[N,1] reshape is a slow
        # lane->sublane relayout in Mosaic; a K=1 mat-vec lands the data
        # sublane-major for free.
        unit = jnp.ones((1, 1), jnp.float32)
        fcc = jax.lax.dot_general(
            c_adj[:, 4 * CHUNK:], unit,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [4*CHUNK, 1]
        tl0 = fcc[0:CHUNK]
        tl1 = fcc[CHUNK:2 * CHUNK]
        tl2 = fcc[2 * CHUNK:3 * CHUNK]
        vld = fcc[3 * CHUNK:4 * CHUNK]

        m3 = jnp.concatenate(
            [a_row[:, :4 * CHUNK], b_row[:, :4 * CHUNK],
             c_adj[:, :4 * CHUNK]], axis=0)              # [3, 256]

        if with_attrs:
            am3 = amm                                     # raw [3, ATTR_COLS]
            # Gather tables are sample-invariant: build the 8-sublane
            # replicated coefficient rows ONCE per chunk.
            t8_rows = [
                jnp.concatenate([am3[r:r + 1, :]] * TILE8_H, axis=0)
                for r in range(3)
            ]                                             # 3 x [8, ATTR_COLS]

        # Pixel coordinate rows built natively in [1, P] lane layout —
        # a [P,1] -> [1,P] reshape is a sublane->lane transpose Mosaic
        # executes very slowly.
        lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
        px_row = (lane_row % tile_w).astype(jnp.float32)
        py_row = (lane_row // tile_w).astype(jnp.float32)
        tri_idx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)

        for s, (sx, sy) in enumerate(sample_offsets):
            pm = jnp.concatenate(
                [px_row + sx, py_row + sy,
                 jnp.ones((1, P), jnp.float32)], axis=0)  # [3, P]
            et = jax.lax.dot_general(
                m3, pm, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)      # [4*CHUNK, P]
            e0 = et[0:CHUNK]
            e1 = et[CHUNK:2 * CHUNK]
            e2 = et[2 * CHUNK:3 * CHUNK]
            zv = et[3 * CHUNK:4 * CHUNK]
            cov = (
                ((e0 > 0.0) | ((e0 == 0.0) & (tl0 > 0.0)))
                & ((e1 > 0.0) | ((e1 == 0.0) & (tl1 > 0.0)))
                & ((e2 > 0.0) | ((e2 == 0.0) & (tl2 > 0.0)))
            )
            ok = cov & (zv >= 0.0) & (zv <= 1.0) & (vld > 0.0)
            zm = jnp.where(ok, zv, 2.0)
            zmin = jnp.min(zm, axis=0, keepdims=True)     # [1, P]
            cand = jnp.where(ok & (zm == zmin), tri_idx, -1)
            wl = jnp.max(cand, axis=0, keepdims=True)     # [1, P] i32
            zb = zacc[s]                                  # [1, P]
            take = (zmin <= zb) & (wl >= 0)
            zacc[s] = jnp.where(take, zmin, zb)
            wacc[s] = jnp.where(take, base_entry + wl, wacc[s])

            import os
            _amode = os.environ.get("MRT_ATTR_MODE", "gather")
            if with_attrs and _amode != "none":
                # Gather the WINNER's 45 plane coefficients per pixel
                # (lane gathers from a 64-wide table), then evaluate each
                # plane with two FMAs — orders of magnitude cheaper than
                # evaluating all 64 candidates' planes at all pixels.
                def to8(row):
                    """[1, P] lane row -> [8, P/8]: 128-aligned lane
                    slices stacked along sublanes (Mosaic rejects the
                    direct reshape as an unsupported shape cast)."""
                    return jnp.concatenate(
                        [row[:, r * tile8_w:(r + 1) * tile8_w]
                         for r in range(TILE8_H)], axis=0)

                wl8 = to8(jnp.maximum(wl, 0))
                # i1 vreg concatenation asserts in Mosaic; relayout the
                # mask as f32 and re-threshold.
                take8 = to8(jnp.where(take, 1.0, 0.0)) > 0.5
                # Pixel coordinates rebuilt directly in [8, P/8] layout
                # (reshaping the [P,1] columns would be a relayout).
                pidx = (jax.lax.broadcasted_iota(
                    jnp.int32, (TILE8_H, tile8_w), 0) * tile8_w
                    + jax.lax.broadcasted_iota(
                        jnp.int32, (TILE8_H, tile8_w), 1))
                sx8 = (pidx % tile_w).astype(jnp.float32) + ox + sx
                sy8 = (pidx // tile_w).astype(jnp.float32) + oy + sy

                def gather_coef(r, g):
                    """Winner's coefficient (row r, group g) per pixel.

                    Tables are sliced at 128-lane grain (128/CHUNK groups
                    per slice) so every slice stays vreg-aligned — Mosaic
                    rejects unaligned slices and broadcast-layout gather
                    operands. Groups within a slice are addressed by
                    biasing the winner lane by multiples of CHUNK.
                    """
                    per128 = 128 // CHUNK
                    pair = g // per128
                    t8 = t8_rows[r][:, pair * 128:(pair + 1) * 128]
                    idx = wl8 + CHUNK * (g % per128)
                    if tile8_w == 128:
                        return jnp.take_along_axis(t8, idx, axis=1)
                    parts = []
                    for k in range(tile8_w // 128):
                        parts.append(jnp.take_along_axis(
                            t8, idx[:, k * 128:(k + 1) * 128], axis=1))
                    return jnp.concatenate(parts, axis=1)

                for g in range(ATTR_GROUPS):
                    ag = gather_coef(0, g)
                    bg = gather_coef(1, g)
                    cg = gather_coef(2, g)
                    val = ag * sx8 + bg * sy8 + cg
                    gacc[s, g] = jnp.where(take8, val, gacc[s, g])
                gacc[s, ROW_DEPTH] = to8(zacc[s])

    def kernel(tile_map, chunk_live, first_flag, last_flag,
               big_live, big_aabb, *refs):
        # Accumulators live in SCRATCH (persistent across grid steps), so
        # the output blocks are WRITE-ONLY and flushed once per tile —
        # reading outputs as accumulators forces a serialized HBM
        # round-trip on every grid step (~40us x 2k steps = the entire
        # frame budget, measured).
        if with_attrs:
            (mm_ref, amm_ref, big_ref, bigattr_ref,
             depth_out, win_out, gout, zacc, wacc, gacc) = refs
            accs = (zacc, wacc, gacc)
        else:
            (mm_ref, big_ref, depth_out, win_out, zacc, wacc) = refs
            accs = (zacc, wacc)

        c = pl.program_id(0)
        tile = tile_map[c]

        @pl.when(first_flag[c] == 1)
        def _():
            for s in range(n_samples):
                zacc[s] = jnp.full((1, P), clear_depth, jnp.float32)
                wacc[s] = jnp.full((1, P), -1, jnp.int32)
                if with_attrs:
                    gacc[s] = jnp.zeros((GOUT_ROWS, TILE8_H, P // TILE8_H),
                                        jnp.float32)
                    gacc[s, ROW_DEPTH] = jnp.full(
                        (TILE8_H, P // TILE8_H), clear_depth, jnp.float32)

        @pl.when(chunk_live[c] > 0)
        def _():
            process_chunk(mm_ref[0], amm_ref[0] if with_attrs else None,
                          c * CHUNK, tile, accs)

        @pl.when(last_flag[c] == 1)
        def _():
            tx = tile % ntx
            ty = tile // ntx
            tx0 = tx * tile_w
            ty0 = ty * tile_h
            for bc in range(n_big_chunks):
                over = (
                    (big_aabb[bc * 4 + 0] <= tx0 + tile_w)
                    & (big_aabb[bc * 4 + 2] >= tx0)
                    & (big_aabb[bc * 4 + 1] <= ty0 + tile_h)
                    & (big_aabb[bc * 4 + 3] >= ty0)
                )

                @pl.when((big_live[bc] > 0) & over)
                def _():
                    process_chunk(
                        big_ref[bc],
                        bigattr_ref[bc] if with_attrs else None,
                        n_small_entries + bc * CHUNK, tile, accs)

            # Flush the finished tile to the (write-only) output blocks.
            for s in range(n_samples):
                depth_out[s, 0] = zacc[s]
                win_out[s, 0] = wacc[s]
                if with_attrs:
                    for g in range(GOUT_ROWS):
                        gout[s, 0, g * TILE8_H:(g + 1) * TILE8_H] = \
                            gacc[s, g]

    return kernel


def _should_interpret():
    return jax.default_backend() != "tpu"


def _tile_view(x, n_samples, nty, ntx, tile_h, tile_w, height, width):
    """[S, NT, 1|R, P] -> [S(, R), H, W]."""
    r = x.shape[2]
    x = x.reshape(n_samples, nty, ntx, r, tile_h, tile_w)
    x = x.transpose(0, 3, 1, 4, 2, 5).reshape(
        n_samples, r, nty * tile_h, ntx * tile_w)
    x = x[:, :, :height, :width]
    return x[:, 0] if r == 1 else x


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_h", "tile_w", "sample_offsets",
                     "span_cap", "big_capacity", "clear_depth",
                     "with_attrs"),
)
def rasterize_tiles(setup: TriangleSetup, width, height, tile_h, tile_w,
                    sample_offsets, span_cap=8, big_capacity=256,
                    clear_depth=1.0, with_attrs=False, pass_geom=None):
    """Visibility (+ optional fused G-buffer attributes).

    Returns (depth f32[S,H,W], winner-tri i32[S,H,W], gout or None, stats).
    ``gout``: f32[S, 16, H, W] raw attribute rows (value/w planes +
    constants*invw; consumer divides by the ROW_INVW row).
    """
    fields = build_tri_fields(setup)
    attr_fields = (build_attr_fields(setup, pass_geom)
                   if with_attrs else None)
    bins = bin_triangles(setup, fields, width, height, tile_w, tile_h,
                         span_cap=span_cap, big_capacity=big_capacity,
                         attr_fields=attr_fields)
    ntx = _cdiv(width, tile_w)
    nty = _cdiv(height, tile_h)
    nt = ntx * nty
    P = tile_h * tile_w
    n_samples = len(sample_offsets)
    T = setup.valid.shape[0]
    mc = num_chunks(nt, T, span_cap)
    n_big_chunks = bins.big_chunks.shape[0]
    n_small_entries = mc * CHUNK

    kernel = _make_kernel(ntx, tile_h, tile_w, tuple(sample_offsets),
                          clear_depth, n_small_entries, n_big_chunks,
                          with_attrs)

    out_block = lambda r: pl.BlockSpec(
        (n_samples, 1, r, P), lambda c, tile_map, *refs:
        (0, tile_map[c], 0, 0))

    in_specs = [pl.BlockSpec((1, 3, COLS), lambda c, *refs: (c, 0, 0))]
    operands = [bins.chunks]
    if with_attrs:
        in_specs.append(
            pl.BlockSpec((1, 3, ATTR_COLS), lambda c, *refs: (c, 0, 0)))
        operands.append(bins.attr_chunks)
    in_specs.append(pl.BlockSpec((n_big_chunks, 3, COLS),
                                 lambda c, *refs: (0, 0, 0)))
    operands.append(bins.big_chunks)
    if with_attrs:
        in_specs.append(pl.BlockSpec((n_big_chunks, 3, ATTR_COLS),
                                     lambda c, *refs: (0, 0, 0)))
        operands.append(bins.big_attr_chunks)

    out_specs = [out_block(1), out_block(1)]
    out_shape = [
        jax.ShapeDtypeStruct((n_samples, nt, 1, P), jnp.float32),
        jax.ShapeDtypeStruct((n_samples, nt, 1, P), jnp.int32),
    ]
    if with_attrs:
        out_specs.append(pl.BlockSpec(
            (n_samples, 1, GOUT_ROWS * TILE8_H, P // TILE8_H),
            lambda c, tile_map, *refs: (0, tile_map[c], 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct(
            (n_samples, nt, GOUT_ROWS * TILE8_H, P // TILE8_H), jnp.float32))

    scratch = [
        pltpu.VMEM((n_samples, 1, P), jnp.float32),
        pltpu.VMEM((n_samples, 1, P), jnp.int32),
    ]
    if with_attrs:
        scratch.append(pltpu.VMEM(
            (n_samples, GOUT_ROWS, TILE8_H, P // TILE8_H), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(mc,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_should_interpret(),
    )(bins.tile_of_chunk, bins.chunk_live, bins.first_flag, bins.last_flag,
      bins.big_live, bins.big_aabb, *operands)

    view = lambda x: _tile_view(x, n_samples, nty, ntx, tile_h, tile_w,
                                height, width)
    depth = view(outs[0])
    win_entry = view(outs[1])
    if with_attrs:
        # [S, NT, 16*8, P/8]: pixel p = y*tile_w + x lives at
        # (row 8*g + (p // (P/8)), col p % (P/8)). Undo in XLA.
        g_raw = outs[2].reshape(n_samples, nty, ntx, GOUT_ROWS, P)
        g_raw = g_raw.reshape(n_samples, nty, ntx, GOUT_ROWS,
                              tile_h, tile_w)
        gout = g_raw.transpose(0, 3, 1, 4, 2, 5).reshape(
            n_samples, GOUT_ROWS, nty * tile_h, ntx * tile_w)
        gout = gout[:, :, :height, :width]
    else:
        gout = None

    winner = jnp.where(win_entry >= 0,
                       bins.entry_to_tri[jnp.maximum(win_entry, 0)], -1)
    stats = {"big_dropped": bins.num_big_dropped}
    return depth, winner, gout, stats


def gbuffer_from_gout(gout, winner, depth) -> GBuffer:
    """Divide the value/w rows by the interpolated 1/w (perspective
    correction) and unpack into the shading G-buffer. Pure elementwise."""
    invw = gout[:, ROW_INVW]
    covered = winner >= 0
    safe = jnp.where(invw > 0.0, invw, 1.0)
    attrs = gout / safe[:, None]
    return GBuffer(
        world=jnp.moveaxis(attrs[:, ROW_WORLD:ROW_WORLD + 3], 1, -1),
        normal=jnp.moveaxis(attrs[:, ROW_NORMAL:ROW_NORMAL + 3], 1, -1),
        uv=jnp.moveaxis(attrs[:, ROW_UV:ROW_UV + 2], 1, -1),
        depth=depth,
        mat_kind=jnp.where(
            covered,
            jnp.rint(attrs[:, ROW_MATKIND]).astype(jnp.int32), -1),
        mat_color=jnp.moveaxis(attrs[:, ROW_COLOR:ROW_COLOR + 3], 1, -1),
        tex_id=jnp.where(
            covered, jnp.rint(attrs[:, ROW_TEXID]).astype(jnp.int32), -1),
        normal_map_id=jnp.where(
            covered, jnp.rint(attrs[:, ROW_NMID]).astype(jnp.int32), -1),
        covered=covered,
    )


def raster_gbuffer(setup: TriangleSetup, pg, config: RenderConfig):
    """Backend entry: fused Pallas visibility + attribute interpolation."""
    depth, winner, gout, _ = rasterize_tiles(
        setup, config.width, config.height, config.tile_h, config.tile_w,
        tuple(config.sample_positions), span_cap=config.span_cap,
        big_capacity=config.big_capacity, clear_depth=config.clear_depth,
        with_attrs=True, pass_geom=pg)
    return gbuffer_from_gout(gout, winner, depth)


def raster_depth(setup: TriangleSetup, size):
    """Depth-only pass for the shadow map (single center sample)."""
    depth, _, _, _ = rasterize_tiles(
        setup, size, size, 8, 128, ((0.5, 0.5),), big_capacity=256,
        clear_depth=1.0)
    return depth[0]
