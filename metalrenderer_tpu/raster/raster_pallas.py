"""Tile-binned Pallas rasterizer — the TPU replacement for Metal's
fixed-function raster + depth hardware (SURVEY.md §2 "the centerpiece
Pallas kernel").

Design (TPU-first; see binning.py for the data-layout contract):

  * Grid = one program per 64-triangle CHUNK. A scalar-prefetch array maps
    each chunk to its framebuffer tile; the output BlockSpec index_map
    reads it, so consecutive chunks of one tile ACCUMULATE into the same
    resident VMEM block (Pallas block-revisiting). The z-buffer lives in
    the output block itself — no scratch, no manual DMA, automatic
    double-buffered pipelining of the chunk operands.
  * Each chunk is a [3, 512] operand: rows (A, B, C) of 8 plane groups
    (e0, e1, e2, z, tl0, tl1, tl2, valid) x 64 triangles. The kernel
    evaluates ALL planes for ALL 64 triangles at ALL tile pixels with one
    MXU contraction per MSAA sample:  [3,256]^T x [3,P] -> [256, P].
    Triangles live in sublanes, pixels in lanes, so the depth reduction is
    a sublane min -> a [1, P] row with zero layout padding.
  * Watertightness under the MXU's 3-pass bf16 f32 emulation: shared-edge
    coefficients are exact negations of each other, multiplication and
    addition are sign-symmetric under IEEE rounding, so e_left == -e_right
    exactly and every sample lands in exactly one of the two triangles
    (ties on e == 0 resolved by the top-left rule).
  * Depth semantics: LessEqual + submission-order tie-break, matching the
    reference's depth state (mtl_engine.mm:436-439). Within a chunk the
    max sublane index among z == zmin wins; across chunks `zmin <= zbuf`
    lets later chunks win ties. Binning's stable sort preserves submission
    order. Big triangles (span > cap) run after a tile's binned list —
    same-z ties between a big and a small triangle are the one documented
    deviation.

The kernel produces per-sample (depth, winner-entry); perspective-correct
attribute interpolation and shading run as fused XLA on top (shared with
the golden path).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from . import reference_cpu
from .binning import CHUNK, COLS, bin_triangles, build_tri_fields, num_chunks
from .geometry import TriangleSetup


def _cdiv(a, b):
    return -(-a // b)


def _make_kernel(ntx, tile_h, tile_w, sample_offsets, clear_depth,
                 n_small_entries, n_big_chunks):
    n_samples = len(sample_offsets)
    P = tile_h * tile_w

    def process_chunk(mm, base_entry, tile, depth_out, win_out):
        """mm: [3, COLS] plane operand; base_entry: scalar entry base."""
        tx = tile % ntx
        ty = tile // ntx
        ox = (tx * tile_w).astype(jnp.float32)
        oy = (ty * tile_h).astype(jnp.float32)

        # Tile-relative C row (exact f32 FMAs; keeps edge magnitudes small
        # so the bf16x3 matmul stays sub-1/256-pixel accurate).
        a_row, b_row, c_row = mm[0:1, :], mm[1:2, :], mm[2:3, :]
        c_adj = c_row + a_row * ox + b_row * oy          # [1, COLS]

        # Flags as [CHUNK,1] columns: "planes" with A=B=0 evaluate to C.
        fc = c_adj[0, 4 * CHUNK:]                        # [4*CHUNK]
        fcc = fc.reshape(4 * CHUNK, 1)
        tl0 = fcc[0:CHUNK]
        tl1 = fcc[CHUNK:2 * CHUNK]
        tl2 = fcc[2 * CHUNK:3 * CHUNK]
        vld = fcc[3 * CHUNK:4 * CHUNK]

        m3 = jnp.concatenate(
            [a_row[:, :4 * CHUNK], b_row[:, :4 * CHUNK],
             c_adj[:, :4 * CHUNK]], axis=0)              # [3, 256]

        lane = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        px = (lane % tile_w).astype(jnp.float32)
        py = (lane // tile_w).astype(jnp.float32)
        tri_idx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)

        for s, (sx, sy) in enumerate(sample_offsets):
            pm = jnp.concatenate(
                [(px + sx).reshape(1, P), (py + sy).reshape(1, P),
                 jnp.ones((1, P), jnp.float32)], axis=0)  # [3, P]
            et = jax.lax.dot_general(
                m3, pm, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)      # [256, P]
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
            zb = depth_out[s, 0]                          # [1, P]
            take = (zmin <= zb) & (wl >= 0)
            depth_out[s, 0] = jnp.where(take, zmin, zb)
            win_out[s, 0] = jnp.where(take, base_entry + wl, win_out[s, 0])

    def kernel(tile_map, chunk_live, first_flag, last_flag,
               big_live, big_aabb,
               mm_ref, big_ref, depth_out, win_out):
        c = pl.program_id(0)
        tile = tile_map[c]

        @pl.when(first_flag[c] == 1)
        def _():
            for s in range(n_samples):
                depth_out[s, 0] = jnp.full((1, P), clear_depth, jnp.float32)
                win_out[s, 0] = jnp.full((1, P), -1, jnp.int32)

        @pl.when(chunk_live[c] > 0)
        def _():
            process_chunk(mm_ref[0], c * CHUNK, tile, depth_out, win_out)

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
                    process_chunk(big_ref[bc],
                                  n_small_entries + bc * CHUNK, tile,
                                  depth_out, win_out)

    return kernel


def _should_interpret():
    return jax.default_backend() != "tpu"


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_h", "tile_w", "sample_offsets",
                     "span_cap", "big_capacity", "clear_depth"),
)
def rasterize_tiles(setup: TriangleSetup, width, height, tile_h, tile_w,
                    sample_offsets, span_cap=8, big_capacity=256,
                    clear_depth=1.0):
    """Visibility: (depth f32[S,H,W], winner-tri i32[S,H,W], stats).

    winner is the ORIGINAL triangle index (mapped through entry_to_tri);
    -1 where uncovered.
    """
    fields = build_tri_fields(setup)
    bins = bin_triangles(setup, fields, width, height, tile_w, tile_h,
                         span_cap=span_cap, big_capacity=big_capacity)
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
                          clear_depth, n_small_entries, n_big_chunks)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(mc,),
        in_specs=[
            pl.BlockSpec((1, 3, COLS), lambda c, *refs: (c, 0, 0)),
            # Big list: full-array block, same index every step -> stays
            # resident in VMEM across the whole grid.
            pl.BlockSpec((n_big_chunks, 3, COLS),
                         lambda c, *refs: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((n_samples, 1, 1, P),
                         lambda c, tile_map, *refs: (0, tile_map[c], 0, 0)),
            pl.BlockSpec((n_samples, 1, 1, P),
                         lambda c, tile_map, *refs: (0, tile_map[c], 0, 0)),
        ],
    )

    depth, win_entry = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_samples, nt, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((n_samples, nt, 1, P), jnp.int32),
        ],
        interpret=_should_interpret(),
    )(bins.tile_of_chunk, bins.chunk_live, bins.first_flag, bins.last_flag,
      bins.big_live, bins.big_aabb, bins.chunks, bins.big_chunks)

    # [S, NT, 1, P] -> [S, H, W]
    hp, wp = nty * tile_h, ntx * tile_w
    depth = depth.reshape(n_samples, nty, ntx, tile_h, tile_w) \
        .transpose(0, 1, 3, 2, 4).reshape(n_samples, hp, wp)
    win_entry = win_entry.reshape(n_samples, nty, ntx, tile_h, tile_w) \
        .transpose(0, 1, 3, 2, 4).reshape(n_samples, hp, wp)
    depth = depth[:, :height, :width]
    win_entry = win_entry[:, :height, :width]

    winner = jnp.where(win_entry >= 0,
                       bins.entry_to_tri[jnp.maximum(win_entry, 0)], -1)
    stats = {"big_dropped": bins.num_big_dropped}
    return depth, winner, stats


def raster_gbuffer(setup: TriangleSetup, pg, config: RenderConfig):
    """Backend entry: Pallas visibility + shared attribute interpolation."""
    depth, winner, _ = rasterize_tiles(
        setup, config.width, config.height, config.tile_h, config.tile_w,
        tuple(config.sample_positions), span_cap=config.span_cap,
        big_capacity=config.big_capacity, clear_depth=config.clear_depth)
    return reference_cpu.interpolate_gbuffer(
        setup, winner, config.width, config.height, config.sample_positions,
        pg.world, pg.uvs, pg.normals, pg.mat_kind, pg.mat_color, pg.tex_id,
        depth)


def raster_depth(setup: TriangleSetup, size):
    """Depth-only pass for the shadow map (single center sample)."""
    depth, _, _ = rasterize_tiles(
        setup, size, size, 8, 128, ((0.5, 0.5),), big_capacity=256,
        clear_depth=1.0)
    return depth[0]
