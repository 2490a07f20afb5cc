"""Band-structured Pallas rasterizer — the TPU replacement for Metal's
fixed-function raster + depth hardware plus the attribute interpolators
(SURVEY.md §2 "the centerpiece Pallas kernel").

Design (TPU-first; see binning.py for the data-layout contract):

  * Grid = one program per 8-pixel-tall BAND of the framebuffer. Output
    block index maps are static (band = program id), so output DMA
    pipelines; accumulation happens directly in the output blocks in
    VMEM and flushes once per band.
  * Each band walks its chunk list [band_start, band_end) with a
    DYNAMIC-trip-count ``fori_loop`` + double-buffered HBM->VMEM chunk
    DMA. Empty tiles own no chunks, so sparse scenes pay nothing for
    them — the previous one-grid-step-per-chunk design paid a fixed
    ~2.5 us for every (tile, chunk) slot including dead padding, which
    is a scaling cliff at 100k+ triangles.
  * MSAA samples are folded into LANES: per-subtile quantities live in
    [1, S*P] rows (sample-major) while being computed, and in a dense
    [8, S*P/8] "to8" layout while stored, so the VPU runs full-width
    and VMEM holds no 1/8-utilized vregs.
  * Each chunk is a [3, 12*CHUNK] visibility operand (rows A, B, C of
    plane groups e0, e1, e2, z and flag groups tl0, tl1, tl2, valid,
    tid + padding) plus a [3, 16*CHUNK] attribute operand (value/w
    planes — world, uv, normal, 1/w, and per-triangle constants riding
    the 1/w plane). Triangles live in sublanes of the evaluated planes,
    pixels in lanes; depth resolve is a sublane min.
  * The winning TRIANGLE ID is resolved in-register from the tid flag
    group (masked max) — resolving it outside the kernel would need an
    entry->tri XLA gather per pixel-sample, which the TPU gather
    expander serializes (~62 ms per 1080p MSAA4 frame, measured).
  * Attribute interpolation gathers only the WINNER's 45 plane
    coefficients per pixel (in-register lane gathers from CHUNK-wide
    tables) and evaluates each plane with two FMAs. Zero XLA gathers
    exist anywhere in the frame.
  * Watertightness under the MXU's 3-pass bf16 f32 emulation: shared-edge
    coefficients are exact negations, multiply/add are sign-symmetric
    under IEEE rounding, so e_left == -e_right exactly and every sample
    lands in exactly one of two adjacent triangles.
  * Depth semantics: LessEqual + submission-order tie-break, matching the
    reference's depth state (mtl_engine.mm:436-439). Within a chunk the
    max tid among z == zmin wins; across chunks `zmin <= zbuf` lets later
    chunks win ties; per-tile entry lists ascend in submission order.
    Big triangles (span > cap) run after a subtile's binned list but
    compare against the in-register winner tid on EQUAL z, so cross-
    class ties also resolve in exact submission order (the round-4
    documented deviation is closed).

Mosaic constraints encoded here (each cost a probe to find): no
broadcast-layout gather operands, no i1 vreg concats, 128-lane-aligned
slices only, mat-vec instead of lane<->sublane reshapes, `pl.multiple_of`
hints for dynamic offsets, int32 iota only.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from ..scene.materials import BLINN_PHONG_SHADOW, EMISSIVE
from .binning import (ATTR_COLS, ATTR_GROUPS, CHUNK, COLS, ROW_DEPTH,
                      ROW_COLOR, ROW_INVW, ROW_MATKIND, ROW_NMID,
                      ROW_NORMAL, ROW_TEXID, ROW_UV, ROW_WORLD,
                      bin_triangles, build_attr_fields, build_tri_fields)
from .geometry import TriangleSetup
from .shade import GBuffer

GOUT_ROWS = 16  # 15 attr rows + depth in ROW_DEPTH
TILE8_H = 8     # sublane height of the [8, S*P/8] dense pixel-block layout

# Fused-shade uniform vector layout (one f32 SMEM array; scalar prefetch).
FU_M = 0        # 16: light_proj @ light_view, row-major (zeros w/o shadow)
FU_CAM = 16     # 3: camera position
FU_LPOS = 19    # 3: light position
FU_LCOL = 22    # 3: light color
FU_AMB = 25     # ambient intensity
FU_SHIN = 26    # shininess
FU_CLEAR = 27   # 4: clear color RGBA
FU_BIAS = 31    # shadow bias
FU_FACTOR = 32  # shadow factor
FU_LEN = 33
FB_ROWS = 5     # fused-shade output rows: R, G, B, A, covered-count


def _cdiv(a, b):
    return -(-a // b)


def _make_kernel(ntx, tile_h, tile_w, sample_offsets, clear_depth,
                 with_attrs, attr_px=False, fused=None,
                 frames=1, nbands=None, bcap=None, sm_len=None):
    """``frames > 1`` folds a FRAME BATCH into the band grid: grid step
    g renders band g % nbands of frame g // nbands. Per-band scalar
    arrays (band_start/band_end pre-offset by frame*MC, sub4_of_chunk)
    arrive flattened [F*NB]/[F*MC]; per-frame arrays (big list, fused
    uniforms, window min/max, the shadow map rows) are indexed at
    frame offsets. One kernel launch renders the whole batch — the
    zero-dispatch serving shape. frames == 1 generates byte-identical
    code to the unbatched kernel (all offsets are Python-constant 0)."""
    n_samples = len(sample_offsets)
    P = tile_h * tile_w
    SP = n_samples * P          # samples folded into lanes, sample-major
    p8w = SP // TILE8_H         # lane width of [8, .] dense-layout blocks

    def sample_select(s_idx, values):
        """Per-lane select of a static per-sample constant."""
        out = jnp.full(s_idx.shape, jnp.float32(values[0]))
        for k in range(1, n_samples):
            out = jnp.where(s_idx == k, jnp.float32(values[k]), out)
        return out

    def to8(row):
        """[1, SP] lane row -> [8, SP/8]: 128-aligned lane slices stacked
        along sublanes (a direct reshape is an unsupported shape cast)."""
        return jnp.concatenate(
            [row[:, r * p8w:(r + 1) * p8w] for r in range(TILE8_H)], axis=0)

    def pxv(x8, s, pr):
        """[1, tile_w] view of (sample s, tile row pr) inside a folded
        [8, p8w] subtile block. Static 8-sublane / 128-lane-aligned
        slices only."""
        r = (TILE8_H * s + pr) // n_samples
        c = ((TILE8_H * s + pr) % n_samples) * tile_w
        return x8[r:r + 1, c:c + tile_w]

    def first_cov_select(cov8f, extra):
        """Per-pixel FIRST-COVERED-SAMPLE selection from folded [8, p8w]
        f32 planes (Metal fragment semantics — pure f32 arithmetic:
        Mosaic cannot lower boolean vectors on 1-sublane strips).

        ``extra``: planes to select at that sample. Returns [8, tile_w]
        pixel-layout (sel_cov, cnt, sel_ox, sel_oy, [sel_extra...])."""
        offs = sample_offsets
        rows_cov, rows_cnt, rows_ox, rows_oy = [], [], [], []
        out_rows = [[] for _ in extra]
        for pr in range(TILE8_H):
            sel_cov = pxv(cov8f, 0, pr)
            cnt = pxv(cov8f, 0, pr)
            sels = [pxv(e, 0, pr) for e in extra]
            sel_ox = jnp.full((1, tile_w), jnp.float32(offs[0][0]))
            sel_oy = jnp.full((1, tile_w), jnp.float32(offs[0][1]))
            for s in range(1, n_samples):
                cs = pxv(cov8f, s, pr)
                use = cs * (1.0 - sel_cov)               # cs & ~sel_cov
                keep = 1.0 - use
                sels = [use * pxv(e, s, pr) + keep * sv
                        for e, sv in zip(extra, sels)]
                sel_ox = use * jnp.float32(offs[s][0]) + keep * sel_ox
                sel_oy = use * jnp.float32(offs[s][1]) + keep * sel_oy
                sel_cov = jnp.maximum(sel_cov, cs)       # sel_cov | cs
                cnt = cnt + cs
            rows_cov.append(sel_cov)
            rows_cnt.append(cnt)
            rows_ox.append(sel_ox)
            rows_oy.append(sel_oy)
            for k, sv in enumerate(sels):
                out_rows[k].append(sv)
        cat = lambda rs: jnp.concatenate(rs, axis=0)
        return (cat(rows_cov), cat(rows_cnt), cat(rows_ox), cat(rows_oy),
                [cat(r) for r in out_rows])

    def prep_cols(mm, amm):
        """Per-chunk column extraction, HOISTED out of the subtile loop
        (big chunks are reprocessed by every overlapped subtile; the
        mat-vecs and attr-row broadcasts only depend on the chunk).
        mm: [3+, COLS]; amm: [3+, ATTR_COLS] or None.

        Flags as [CHUNK,1] columns via a K=1 mat-vec (a [1,N]->[N,1]
        reshape is a slow lane->sublane relayout).
        precision=HIGHEST: the default single-pass bf16 MXU mode
        ROUNDS these f32 values (a triangle id like 12961 becomes
        12992; edge/z plane coefficients lose 16 mantissa bits, which
        breaks watertightness and depth exactness on real TPUs —
        interpret-mode tests never see it). HIGHEST is the exact
        bf16x3 decomposition. Flag groups have A = B = 0, so their raw
        C row IS the flag value (no tile adjustment needed).
        """
        a_row, b_row, c_row = mm[0:1, :], mm[1:2, :], mm[2:3, :]
        unit = jnp.ones((1, 1), jnp.float32)

        def col(row):
            return jax.lax.dot_general(
                row, unit,
                dimension_numbers=(((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)

        fcc = col(c_row[:, 4 * CHUNK:])                  # [8*CHUNK, 1]
        # Plane coefficients as [4*CHUNK, 1] columns (K=1 mat-vecs — the
        # cheap sublane-major transpose).
        acol = col(a_row[:, :4 * CHUNK])
        bcol = col(b_row[:, :4 * CHUNK])
        ccol = col(c_row[:, :4 * CHUNK])
        if amm is None:
            t8_rows = None
        else:
            t8_rows = [
                jnp.concatenate([amm[r:r + 1, :]] * TILE8_H, axis=0)
                for r in range(3)
            ]                                            # 3 x [8, ATTR_COLS]
        return acol, bcol, ccol, fcc, t8_rows

    def process_chunk(cols, sub, oy, outs):
        """cols: prep_cols output.
        Accumulates into this band's output blocks at subtile ``sub``."""
        if with_attrs:
            depth_blk, win_blk, gout_blk = outs
        else:
            depth_blk, win_blk = outs
        ox = (sub * tile_w).astype(jnp.float32)
        lane_off = pl.multiple_of(sub * p8w, p8w)

        acol, bcol, c_raw, fcc, t8_rows = cols
        tl0 = fcc[0:CHUNK]
        tl1 = fcc[CHUNK:2 * CHUNK]
        tl2 = fcc[2 * CHUNK:3 * CHUNK]
        vld = fcc[3 * CHUNK:4 * CHUNK]
        tid = fcc[4 * CHUNK:5 * CHUNK]
        # Tile-relative C columns (exact f32 FMAs keep edge magnitudes
        # small so plane evaluation stays sub-1/256-pixel accurate).
        # Bit-identical to adjusting the rows before the transpose.
        ccol = c_raw + acol * ox + bcol * oy             # [4*CHUNK, 1]

        # Pixel+sample coordinate rows, natively in [1, SP] lane layout.
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, SP), 1)
        p_in_tile = lane % P
        s_idx = lane // P
        px = (p_in_tile % tile_w).astype(jnp.float32) + \
            sample_select(s_idx, [o[0] for o in sample_offsets])
        py = (p_in_tile // tile_w).astype(jnp.float32) + \
            sample_select(s_idx, [o[1] for o in sample_offsets])

        # Evaluate ALL plane groups for all samples/pixels as broadcast
        # FMAs on the VPU. A [3,4C]x[3,SP] MXU contraction is 2.4%-utilized
        # at K=3 and needs 3 bf16 passes; the VPU path is ~14x faster here
        # AND exact f32.
        et = acol * px + bcol * py + ccol                # [4*CHUNK, SP]
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
        zmin = jnp.min(zm, axis=0, keepdims=True)        # [1, SP]
        at_min = ok & (zm == zmin)
        # Winning TRIANGLE ID via masked max (see module docstring).
        cand_tid = jnp.where(at_min, tid, -1.0)
        wt = jnp.max(cand_tid, axis=0, keepdims=True)    # [1, SP] f32

        zmin8 = to8(zmin)
        wt8 = to8(wt)
        zb8 = depth_blk[:, pl.ds(lane_off, p8w)]
        take8 = (zmin8 <= zb8) & (wt8 >= 0.0)
        depth_blk[:, pl.ds(lane_off, p8w)] = jnp.where(take8, zmin8, zb8)
        win_blk[:, pl.ds(lane_off, p8w)] = jnp.where(
            take8, wt8.astype(jnp.int32), win_blk[:, pl.ds(lane_off, p8w)])

        if with_attrs and attr_px:
            # PER-PIXEL attribute update (Metal fragment semantics):
            # attributes belong to the winner of the pixel's FIRST
            # covered sample, evaluated at that sample's position —
            # exactly shade._select_first_covered of the per-sample
            # variant, but computed in-kernel so gout (and everything
            # downstream of it) is n_samples-x smaller. Coverage is
            # monotone across chunks (winner only ever becomes >= 0), so
            # updating whenever THIS chunk takes the pixel's current
            # first-covered sample converges to exactly that semantic.
            tri_idx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
            cand = jnp.where(at_min, tri_idx, -1)
            wl = jnp.max(cand, axis=0, keepdims=True)    # [1, SP] i32
            wl8 = to8(jnp.maximum(wl, 0))
            # All masks become f32 at the full [8, p8w] shape BEFORE any
            # [1, tile_w] strip is cut (first_cov_select docstring).
            cov8f = (win_blk[:, pl.ds(lane_off, p8w)] >= 0).astype(
                jnp.float32)                             # post-update
            take8f = take8.astype(jnp.float32)
            wl8f = wl8.astype(jnp.float32)               # ids < 2^24: exact

            sel_cov8, cnt8, sel_ox8, sel_oy8, (sel_take8, sel_wl8) = \
                first_cov_select(cov8f, [take8f, wl8f])
            upd8 = sel_cov8 * sel_take8                  # [8, tile_w] f32
            wl8p = sel_wl8.astype(jnp.int32)
            sx8 = (jax.lax.broadcasted_iota(
                jnp.int32, (TILE8_H, tile_w), 1).astype(jnp.float32)
                + ox + sel_ox8)
            sy8 = (jax.lax.broadcasted_iota(
                jnp.int32, (TILE8_H, tile_w), 0).astype(jnp.float32)
                + oy + sel_oy8)
            lane_px = pl.multiple_of(sub * tile_w, tile_w)

            def gather_px(r, g):
                per128 = 128 // CHUNK
                pair = g // per128
                t8 = t8_rows[r][:, pair * 128:(pair + 1) * 128]
                return jnp.take_along_axis(
                    t8, wl8p + CHUNK * (g % per128), axis=1)

            for g in range(ATTR_GROUPS):
                ag = gather_px(0, g)
                bg = gather_px(1, g)
                cg = gather_px(2, g)
                val = ag * sx8 + bg * sy8 + cg
                old = gout_blk[g * TILE8_H:(g + 1) * TILE8_H,
                               pl.ds(lane_px, tile_w)]
                gout_blk[g * TILE8_H:(g + 1) * TILE8_H,
                         pl.ds(lane_px, tile_w)] = (
                    upd8 * val + (1.0 - upd8) * old)
            # The spare ROW_DEPTH row carries the per-pixel COVERED
            # SAMPLE COUNT (cov_frac * n_samples). Every chunk visit
            # rewrites it from the post-update winner state, so the last
            # chunk to touch a subtile leaves the final count — and the
            # production consumer never needs the per-sample winner
            # planes at all (their unfold is then dead code).
            gout_blk[ROW_DEPTH * TILE8_H:(ROW_DEPTH + 1) * TILE8_H,
                     pl.ds(lane_px, tile_w)] = cnt8

        elif with_attrs:
            # Gather the WINNER's plane coefficients per pixel-sample and
            # evaluate each plane with two FMAs — far cheaper than
            # evaluating all candidates' planes everywhere. The gathers
            # want the winner's CHUNK-LOCAL sublane index.
            tri_idx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
            cand = jnp.where(at_min, tri_idx, -1)
            wl = jnp.max(cand, axis=0, keepdims=True)    # [1, SP] i32
            wl8 = to8(jnp.maximum(wl, 0))
            # Absolute sample coordinates rebuilt directly in [8, SP/8].
            l8 = (jax.lax.broadcasted_iota(
                jnp.int32, (TILE8_H, p8w), 0) * p8w
                + jax.lax.broadcasted_iota(jnp.int32, (TILE8_H, p8w), 1))
            p8 = l8 % P
            s8 = l8 // P
            sx8 = (p8 % tile_w).astype(jnp.float32) + ox + \
                sample_select(s8, [o[0] for o in sample_offsets])
            sy8 = (p8 // tile_w).astype(jnp.float32) + oy + \
                sample_select(s8, [o[1] for o in sample_offsets])

            def gather_coef(r, g):
                """Winner's coefficient (row r, group g) per pixel-sample.

                Tables are sliced at 128-lane grain (128/CHUNK groups per
                slice) so every slice stays vreg-aligned; groups within a
                slice are addressed by biasing the winner lane by
                multiples of CHUNK.
                """
                per128 = 128 // CHUNK
                pair = g // per128
                t8 = t8_rows[r][:, pair * 128:(pair + 1) * 128]
                idx = wl8 + CHUNK * (g % per128)
                if p8w == 128:
                    return jnp.take_along_axis(t8, idx, axis=1)
                parts = []
                for k in range(p8w // 128):
                    parts.append(jnp.take_along_axis(
                        t8, idx[:, k * 128:(k + 1) * 128], axis=1))
                return jnp.concatenate(parts, axis=1)

            for g in range(ATTR_GROUPS):
                ag = gather_coef(0, g)
                bg = gather_coef(1, g)
                cg = gather_coef(2, g)
                val = ag * sx8 + bg * sy8 + cg
                old = gout_blk[g * TILE8_H:(g + 1) * TILE8_H,
                               pl.ds(lane_off, p8w)]
                gout_blk[g * TILE8_H:(g + 1) * TILE8_H,
                         pl.ds(lane_off, p8w)] = jnp.where(take8, val, old)
            gout_blk[ROW_DEPTH * TILE8_H:(ROW_DEPTH + 1) * TILE8_H,
                     pl.ds(lane_off, p8w)] = \
                depth_blk[:, pl.ds(lane_off, p8w)]

    def kernel(*args):
        if fused is not None:
            # Fused-shade mode: depth / winner / gout are SCRATCH (they
            # never leave VMEM); the only output is the shaded band.
            if fused["shadow"] is not None:
                (band_start, band_end, sub4_of_chunk, big_n, big_tri,
                 big_attr, big_aabb, funi, smin_r, smax_r,
                 chunks_hbm, attrs_hbm, smap_hbm, fb_out,
                 depth_out, win_out, gout, cbuf, abuf, sems,
                 swin, ssem, dbuf) = args
            else:
                (band_start, band_end, sub4_of_chunk, big_n, big_tri,
                 big_attr, big_aabb, funi,
                 chunks_hbm, attrs_hbm, fb_out,
                 depth_out, win_out, gout, cbuf, abuf, sems) = args
            outs = (depth_out, win_out, gout)
        elif with_attrs:
            (band_start, band_end, sub4_of_chunk, big_n, big_tri,
             big_attr, big_aabb, chunks_hbm, attrs_hbm,
             depth_out, win_out, gout, cbuf, abuf, sems) = args
            outs = (depth_out, win_out, gout)
        else:
            (band_start, band_end, sub4_of_chunk, big_n, big_tri,
             big_aabb, chunks_hbm, depth_out, win_out,
             cbuf, sems) = args
            outs = (depth_out, win_out)

        gid = pl.program_id(0)
        if frames == 1:
            fr = 0                     # Python 0: offsets fold away
            b = gid
        else:
            fr = gid // nbands
            b = jax.lax.rem(gid, nbands)
        oy = (b * tile_h).astype(jnp.float32)

        # Initialize the whole band once.
        depth_out[...] = jnp.full((TILE8_H, ntx * p8w), clear_depth,
                                  jnp.float32)
        win_out[...] = jnp.full((TILE8_H, ntx * p8w), -1, jnp.int32)
        if with_attrs and attr_px:
            gout[...] = jnp.zeros((GOUT_ROWS * TILE8_H, ntx * tile_w),
                                  jnp.float32)
        elif with_attrs:
            gout[...] = jnp.zeros((GOUT_ROWS * TILE8_H, ntx * p8w),
                                  jnp.float32)
            gout[ROW_DEPTH * TILE8_H:(ROW_DEPTH + 1) * TILE8_H, :] = \
                jnp.full((TILE8_H, ntx * p8w), clear_depth, jnp.float32)

        s0 = band_start[gid]
        n = band_end[gid] - s0

        def start_dma(slot, ci):
            pltpu.make_async_copy(
                chunks_hbm.at[ci], cbuf.at[slot], sems.at[slot, 0]).start()
            if with_attrs:
                pltpu.make_async_copy(
                    attrs_hbm.at[ci], abuf.at[slot], sems.at[slot, 1]).start()

        def wait_dma(slot, ci):
            pltpu.make_async_copy(
                chunks_hbm.at[ci], cbuf.at[slot], sems.at[slot, 0]).wait()
            if with_attrs:
                pltpu.make_async_copy(
                    attrs_hbm.at[ci], abuf.at[slot], sems.at[slot, 1]).wait()

        @pl.when(n > 0)
        def _():
            start_dma(0, s0)

        def body(i, _):
            ci = s0 + i
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n)
            def _():
                start_dma(1 - slot, ci + 1)

            wait_dma(slot, ci)
            cols = prep_cols(cbuf[slot],
                             abuf[slot] if with_attrs else None)
            # Subtile ids are byte-packed 4/i32 (SMEM is the scarce
            # resource: unpacked they exceed the budget at 1M tris @4K).
            sub = jax.lax.shift_right_logical(
                sub4_of_chunk[ci // 4], (ci % 4) * 8) & 0xFF
            process_chunk(cols, sub, oy, outs)
            return 0

        jax.lax.fori_loop(0, n, body, 0)

        # Big triangles (span > cap): after the binned list (documented
        # tie-break deviation), ONE triangle at a time, restricted to the
        # SUBTILES its AABB overlaps, its 17 visibility fields (+45
        # attr-plane coefficients) read from SMEM and broadcast as
        # scalars. A 32-lane chunk carrying the typical 2-3 live floor
        # triangles wastes >10x the vector work; and a whole-band sweep
        # (the round-2 design) pays ntx subtiles for every triangle —
        # 5x the needed work for mid-size "big" triangles spanning 2-3
        # subtiles (the flagship cube at 1080p).
        y0 = b * tile_h
        big_vis0 = fr * bcap * 17 if frames > 1 else 0
        big_attr0 = fr * bcap * (3 * 16) if frames > 1 else 0
        big_aabb0 = fr * bcap * 4 if frames > 1 else 0

        @pl.when(big_n[fr] > 0)
        def _():
            # Folded per-SUBTILE coordinate planes (computed once per
            # band): sublane r, lane c hold sample flat = r*p8w + c ->
            # sample flat//P, pixel flat%P. Tile-relative + subtile-base
            # plane: same anchoring (and FMA structure) as process_chunk,
            # so plane evaluation rounds identically to the chunk path.
            r8 = jax.lax.broadcasted_iota(jnp.int32, (TILE8_H, p8w), 0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (TILE8_H, p8w), 1)
            flat = r8 * p8w + lane
            s_i = flat // P
            p_i = jax.lax.rem(flat, P)
            offx = sample_select(s_i, [o[0] for o in sample_offsets])
            offy = sample_select(s_i, [o[1] for o in sample_offsets])
            xr = jax.lax.rem(p_i, tile_w).astype(jnp.float32) + offx
            yr = (p_i // tile_w).astype(jnp.float32) + offy

            def tri_body(t, _):
                f = big_vis0 + t * 17
                a0, b0, c0 = big_tri[f + 0], big_tri[f + 1], big_tri[f + 2]
                a1, b1, c1 = big_tri[f + 3], big_tri[f + 4], big_tri[f + 5]
                a2, b2, c2 = big_tri[f + 6], big_tri[f + 7], big_tri[f + 8]
                az, bz, cz = big_tri[f + 9], big_tri[f + 10], big_tri[f + 11]
                tl0, tl1, tl2 = (big_tri[f + 12], big_tri[f + 13],
                                 big_tri[f + 14])
                vld = big_tri[f + 15]
                tid = big_tri[f + 16]
                bx0 = big_aabb[big_aabb0 + t * 4 + 0]
                by0 = big_aabb[big_aabb0 + t * 4 + 1]
                bx1 = big_aabb[big_aabb0 + t * 4 + 2]
                by1 = big_aabb[big_aabb0 + t * 4 + 3]
                ov = (vld > 0.0) & (by0 < y0 + tile_h) & (by1 > y0)

                @pl.when(ov)
                def _():
                    sx0 = jnp.clip(bx0 // tile_w, 0, ntx - 1)
                    sx1 = jnp.clip((bx1 - 1) // tile_w, 0, ntx - 1)

                    def sub_body(i, _):
                        sub = sx0 + i
                        lane_off = pl.multiple_of(sub * p8w, p8w)
                        ox = (sub * tile_w).astype(jnp.float32)

                        def ev(a, bq, c):
                            cof = (c + a * ox) + bq * oy
                            return (a * xr + bq * yr) + cof

                        e0v = ev(a0, b0, c0)
                        e1v = ev(a1, b1, c1)
                        e2v = ev(a2, b2, c2)
                        zv = ev(az, bz, cz)
                        # and/or form: Mosaic cannot legalize arith.select
                        # on i1 vectors (the i8->i1 trunci trap).
                        cov = (
                            ((e0v > 0.0) | ((e0v == 0.0) & (tl0 > 0.0)))
                            & ((e1v > 0.0) | ((e1v == 0.0) & (tl1 > 0.0)))
                            & ((e2v > 0.0) | ((e2v == 0.0) & (tl2 > 0.0)))
                        )
                        ok = cov & (zv >= 0.0) & (zv <= 1.0)
                        zb = outs[0][:, pl.ds(lane_off, p8w)]
                        wb = outs[1][:, pl.ds(lane_off, p8w)]
                        # SUBMISSION-ORDER exact ties (mtl_engine.mm:
                        # 436-439): although the big list runs after the
                        # binned walk, an EQUAL-z pixel only flips to
                        # this triangle if its tid is LATER than the
                        # current winner's — the winner register makes
                        # cross-class tie order exact (closes the r4
                        # documented deviation).
                        tid_i = tid.astype(jnp.int32)
                        take = ok & ((zv < zb) | ((zv == zb) & (tid_i > wb)))
                        outs[0][:, pl.ds(lane_off, p8w)] = \
                            jnp.where(take, zv, zb)
                        outs[1][:, pl.ds(lane_off, p8w)] = jnp.where(
                            take, tid_i, wb)

                        if with_attrs and attr_px:
                            big_attr_px(t, take, sub, lane_off, ox)
                        elif with_attrs:
                            big_attr_ps(t, take, lane_off, ox)
                        return 0

                    jax.lax.fori_loop(0, sx1 - sx0 + 1, sub_body, 0)
                return 0

            def big_attr_ps(t, take, lane_off, ox):
                """Per-sample gout update for one subtile with scalar
                attr planes (absolute coords, same expression as the
                gather_coef path)."""
                gout_ref = outs[2]
                xs_abs = ox + xr
                ys_abs = oy + yr
                af = big_attr0 + t * (3 * 16)
                for g in range(ATTR_GROUPS):
                    ag = big_attr[af + g]
                    bg = big_attr[af + 16 + g]
                    cg = big_attr[af + 32 + g]
                    val = ag * xs_abs + bg * ys_abs + cg
                    old = gout_ref[g * TILE8_H:(g + 1) * TILE8_H,
                                   pl.ds(lane_off, p8w)]
                    gout_ref[g * TILE8_H:(g + 1) * TILE8_H,
                             pl.ds(lane_off, p8w)] = \
                        jnp.where(take, val, old)
                gout_ref[ROW_DEPTH * TILE8_H:(ROW_DEPTH + 1) * TILE8_H,
                         pl.ds(lane_off, p8w)] = \
                    outs[0][:, pl.ds(lane_off, p8w)]

            def big_attr_px(t, take, sub, lane_off, ox):
                """Per-pixel (attr_px) gout update for one subtile:
                first-covered-sample selection via the shared helper,
                then scalar plane evaluation at the selected sample
                coords — no gathers (the winner IS this triangle)."""
                gout_ref = outs[2]
                covb = (outs[1][:, pl.ds(lane_off, p8w)] >= 0).astype(
                    jnp.float32)                         # post-update
                takef = take.astype(jnp.float32)
                sel_cov8, cnt8, sel_ox8, sel_oy8, (sel_take8,) = \
                    first_cov_select(covb, [takef])
                upd = sel_cov8 * sel_take8               # [8, tile_w]
                sxp = (jax.lax.broadcasted_iota(
                    jnp.int32, (TILE8_H, tile_w), 1).astype(jnp.float32)
                    + ox + sel_ox8)
                syp = (jax.lax.broadcasted_iota(
                    jnp.int32, (TILE8_H, tile_w), 0).astype(jnp.float32)
                    + oy + sel_oy8)
                lane_px = pl.multiple_of(sub * tile_w, tile_w)
                af = big_attr0 + t * (3 * 16)
                for g in range(ATTR_GROUPS):
                    ag = big_attr[af + g]
                    bg = big_attr[af + 16 + g]
                    cg = big_attr[af + 32 + g]
                    val = ag * sxp + bg * syp + cg
                    old = gout_ref[g * TILE8_H:(g + 1) * TILE8_H,
                                   pl.ds(lane_px, tile_w)]
                    gout_ref[g * TILE8_H:(g + 1) * TILE8_H,
                             pl.ds(lane_px, tile_w)] = \
                        upd * val + (1.0 - upd) * old
                gout_ref[ROW_DEPTH * TILE8_H:(ROW_DEPTH + 1) * TILE8_H,
                         pl.ds(lane_px, tile_w)] = cnt8

            jax.lax.fori_loop(0, big_n[fr], tri_body, 0)

        if fused is None:
            return

        # ---- In-band fragment stage (fused-shade mode) ------------------
        # Blinn-Phong + emissive + shadow test straight out of the VMEM
        # gout scratch, writing only the shaded RGBA (+ covered count)
        # band. Mirrors shade.shade_channels / shade._shadow_factor_soa
        # expression order so results match the unfused pallas path.
        # (BlinnPhong.metal:44-57 fragment shading, :79-96 shadow test.)
        fu0 = fr * FU_LEN if frames > 1 else 0
        m = [funi[fu0 + FU_M + k] for k in range(16)]
        cam = [funi[fu0 + FU_CAM + k] for k in range(3)]
        lpos = [funi[fu0 + FU_LPOS + k] for k in range(3)]
        lcol = [funi[fu0 + FU_LCOL + k] for k in range(3)]
        amb = funi[fu0 + FU_AMB]
        shin = funi[fu0 + FU_SHIN]
        clear = [funi[fu0 + FU_CLEAR + k] for k in range(4)]
        sh_bias = funi[fu0 + FU_BIAS]
        sh_factor = funi[fu0 + FU_FACTOR]
        inv_s = jnp.float32(1.0 / n_samples)
        sh_cfg = fused["shadow"]

        def shade_sub(sub, _):
            lane_px = pl.multiple_of(sub * tile_w, tile_w)

            def grow(i):
                return gout[i * TILE8_H:(i + 1) * TILE8_H,
                            pl.ds(lane_px, tile_w)]

            cnt = grow(ROW_DEPTH)

            # All-sky subtile (no covered sample anywhere): the full
            # fragment stage would compute planes*0 + clear*1 == clear
            # exactly — skip it and write the clear color directly
            # (~18% of the flagship frame is sky).
            @pl.when(jnp.max(cnt) <= 0.0)
            def _():
                for c in range(4):
                    fb_out[c * TILE8_H:(c + 1) * TILE8_H,
                           pl.ds(lane_px, tile_w)] = \
                        jnp.full((TILE8_H, tile_w), clear[c], jnp.float32)
                fb_out[4 * TILE8_H:5 * TILE8_H, pl.ds(lane_px, tile_w)] = \
                    jnp.zeros((TILE8_H, tile_w), jnp.float32)

            @pl.when(jnp.max(cnt) > 0.0)
            def _():
                shade_sub_covered(sub, lane_px, grow, cnt)
            return 0

        def shade_sub_covered(sub, lane_px, grow, cnt):
            invw = grow(ROW_INVW)
            inv = 1.0 / jnp.where(invw > 0.0, invw, 1.0)
            wx = grow(ROW_WORLD) * inv
            wy = grow(ROW_WORLD + 1) * inv
            wz = grow(ROW_WORLD + 2) * inv
            nx = grow(ROW_NORMAL) * inv
            ny = grow(ROW_NORMAL + 1) * inv
            nz = grow(ROW_NORMAL + 2) * inv
            cr = grow(ROW_COLOR) * inv
            cg = grow(ROW_COLOR + 1) * inv
            cb = grow(ROW_COLOR + 2) * inv
            covered = cnt > 0.0
            kf = jnp.floor(grow(ROW_MATKIND) * inv + 0.5)
            emissive = covered & (kf == jnp.float32(EMISSIVE))
            receives = covered & (kf == jnp.float32(BLINN_PHONG_SHADOW))

            # Blinn-Phong (shade._blinn_phong_soa expression order).
            vx = cam[0] - wx
            vy = cam[1] - wy
            vz = cam[2] - wz
            nv = jnp.float32(1.0) / jnp.sqrt(vx * vx + vy * vy + vz * vz)
            vx, vy, vz = vx * nv, vy * nv, vz * nv
            lx = lpos[0] - wx
            ly = lpos[1] - wy
            lz = lpos[2] - wz
            nl = jnp.float32(1.0) / jnp.sqrt(lx * lx + ly * ly + lz * lz)
            lx, ly, lz = lx * nl, ly * nl, lz * nl
            hx, hy, hz = lx + vx, ly + vy, lz + vz
            nh = jnp.float32(1.0) / jnp.sqrt(hx * hx + hy * hy + hz * hz)
            hx, hy, hz = hx * nh, hy * nh, hz * nh
            diff = jnp.maximum(nx * lx + ny * ly + nz * lz, 0.0)
            spec = jnp.power(
                jnp.maximum(nx * hx + ny * hy + nz * hz, 0.0), shin)
            s = amb + diff + spec
            r = s * lcol[0] * cr
            g = s * lcol[1] * cg
            b = s * lcol[2] * cb
            r = jnp.where(emissive, cr, r)
            g = jnp.where(emissive, cg, g)
            b = jnp.where(emissive, cb, b)
            a = jnp.ones_like(r)

            if sh_cfg is not None:
                # tex_h/tex_w: ORIGINAL texture space (coordinates,
                # repeat wrap); th_p/tw_p: padded extents (window
                # origin clip bounds — small maps are tiled up).
                win_h, win_w, tex_h, tex_w, th_p, tw_p, nox = sh_cfg
                # Light-space transform (shade._shadow_factor_soa).
                lxp = m[0] * wx + m[1] * wy + m[2] * wz + m[3]
                lyp = m[4] * wx + m[5] * wy + m[6] * wz + m[7]
                lzp = m[8] * wx + m[9] * wy + m[10] * wz + m[11]
                lwp = m[12] * wx + m[13] * wy + m[14] * wz + m[15]
                ilw = 1.0 / lwp
                uu = lxp * ilw * 0.5 + 0.5
                vv = (1.0 - lyp * ilw) * 0.5
                sd = lzp * ilw * 0.5 + 0.5
                inb = (uu >= 0.0) & (uu <= 1.0) & (vv >= 0.0) & (vv <= 1.0)
                maskb = inb & receives
                maskf = maskb.astype(jnp.float32)
                # sample_bilinear_tiled coordinate pipeline (repeat mode;
                # u in [0,1] so a single negative-wrap equals jnp.mod).
                x = uu * tex_w - 0.5
                y = vv * tex_h - 0.5
                x = jnp.where(x < 0.0, x + tex_w, x)
                y = jnp.where(y < 0.0, y + tex_h, y)
                has = jnp.max(maskf) > 0.0
                big = jnp.float32(3.0e38)
                xmin = jnp.min(jnp.where(maskb, x, big))
                ymin = jnp.min(jnp.where(maskb, y, big))
                xmin = jnp.where(has, xmin, 0.0)
                ymin = jnp.where(has, ymin, 0.0)
                wxo = jnp.clip(
                    (jnp.floor(xmin).astype(jnp.int32) // 128) * 128,
                    0, ((tw_p - win_w) // 128) * 128)
                wyo = jnp.clip(
                    (jnp.floor(ymin).astype(jnp.int32) // 8) * 8,
                    0, ((th_p - win_h) // 8) * 8)
                oidx = (wyo // 8) * nox + (wxo // 128)
                if frames > 1:
                    oidx = oidx + fr * sm_len
                uval = smin_r[oidx]
                umax = smax_r[oidx]

                @pl.when(has & (uval != umax))
                def _():
                    wy8 = pl.multiple_of(wyo, 8)
                    wx128 = pl.multiple_of(wxo, 128)
                    # Batched mode: frame fr's shadow map occupies rows
                    # [fr*th_p, (fr+1)*th_p) of the stacked map (th_p is
                    # a multiple of 8, so the alignment hint holds). The
                    # offset applies to the DMA SOURCE only — window-local
                    # coordinates below stay in per-frame texture space.
                    wy8_src = (pl.multiple_of(wyo + fr * th_p, 8)
                               if frames > 1 else wy8)
                    cp = pltpu.make_async_copy(
                        smap_hbm.at[pl.ds(wy8_src, win_h),
                                    pl.ds(wx128, win_w)],
                        swin, ssem)
                    cp.start()
                    cp.wait()
                    xl = jnp.clip(x - wx128.astype(jnp.float32),
                                  0.0, win_w - 1.001)
                    yl = jnp.clip(y - wy8.astype(jnp.float32),
                                  0.0, win_h - 1.001)
                    x0 = jnp.floor(xl)
                    y0 = jnp.floor(yl)
                    fx = xl - x0
                    fy = yl - y0
                    x0i = x0.astype(jnp.int32)
                    y0i = y0.astype(jnp.int32)

                    def build_xg(xi_row):
                        idx = jnp.broadcast_to(xi_row, (win_h, tile_w))
                        out = jnp.take_along_axis(swin[:, 0:128],
                                                  idx % 128, axis=1)
                        for sl in range(1, win_w // 128):
                            part = jnp.take_along_axis(
                                swin[:, sl * 128:(sl + 1) * 128],
                                idx % 128, axis=1)
                            out = jnp.where(idx >= sl * 128, part, out)
                        return out

                    def compose_y(xg, yi_row):
                        ylo = jnp.broadcast_to(yi_row % 8, (8, tile_w))
                        yhi = yi_row // 8
                        out = jnp.zeros((1, tile_w), jnp.float32)
                        for gg in range(win_h // 8):
                            part = jnp.take_along_axis(
                                xg[8 * gg:8 * gg + 8], ylo, axis=0)
                            out = jnp.where(yhi == gg, part[0:1], out)
                        return out

                    for rr in range(TILE8_H):
                        x0r = x0i[rr:rr + 1, :]
                        y0r = y0i[rr:rr + 1, :]
                        xg0 = build_xg(x0r)
                        xg1 = build_xg(x0r + 1)
                        t00 = compose_y(xg0, y0r)
                        t01 = compose_y(xg0, y0r + 1)
                        t10 = compose_y(xg1, y0r)
                        t11 = compose_y(xg1, y0r + 1)
                        fxr = fx[rr:rr + 1, :]
                        fyr = fy[rr:rr + 1, :]
                        top = t00 * (1.0 - fxr) + t10 * fxr
                        bot = t01 * (1.0 - fxr) + t11 * fxr
                        dbuf[rr:rr + 1, :] = \
                            top * (1.0 - fyr) + bot * fyr

                @pl.when((~has) | (uval == umax))
                def _():
                    # Uniform window (or no shadow-testing pixel): every
                    # tap returns the block constant — no DMA, no taps.
                    dbuf[...] = jnp.zeros(
                        (TILE8_H, tile_w), jnp.float32) + \
                        jnp.where(has, uval, jnp.float32(1.0))

                d = dbuf[...]
                wxf = wxo.astype(jnp.float32)
                wyf = wyo.astype(jnp.float32)
                oob = (((x - wxf) < 0.0) | ((x - wxf) > win_w - 2.0)
                       | ((y - wyf) < 0.0) | ((y - wyf) > win_h - 2.0)
                       | (~maskb))
                d = jnp.where(oob, jnp.float32(1.0), d)
                shadowed = (sd - sh_bias) > d
                sf = jnp.where(inb & shadowed, sh_factor, jnp.float32(1.0))
                msk = jnp.where(receives, sf, jnp.float32(1.0))
                r, g, b, a = r * msk, g * msk, b * msk, a * msk

            covf = cnt * inv_s
            planes = (r, g, b, a)
            for c in range(4):
                fb_out[c * TILE8_H:(c + 1) * TILE8_H,
                       pl.ds(lane_px, tile_w)] = \
                    planes[c] * covf + clear[c] * (1.0 - covf)
            fb_out[4 * TILE8_H:5 * TILE8_H, pl.ds(lane_px, tile_w)] = covf
            return 0

        jax.lax.fori_loop(0, ntx, shade_sub, 0)

    return kernel


def _should_interpret():
    return jax.default_backend() != "tpu"


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_h", "tile_w", "sample_offsets",
                     "span_cap", "big_capacity", "clear_depth",
                     "with_attrs", "attr_px"),
)
def rasterize_tiles(setup: TriangleSetup, width, height, tile_h, tile_w,
                    sample_offsets, span_cap=8, big_capacity=256,
                    clear_depth=1.0, with_attrs=False, pass_geom=None,
                    attr_px=False, bins=None):
    """Visibility (+ optional fused G-buffer attributes).

    Returns (depth f32[S,H,W], winner-tri i32[S,H,W], gout or None, stats).
    ``gout``: f32[S, 16, H, W] raw attribute rows (value/w planes +
    constants*invw; consumer divides by the ROW_INVW row).

    ``attr_px``: per-PIXEL attribute rows instead (Metal fragment
    semantics — first covered sample's winner, evaluated at that
    sample's position). gout is then f32[16, H, W] and its band layout
    unfolds as a pure reshape (no lane/sublane relayout at all).

    ``bins``: optional precomputed TileBins (from the same setup /
    tile shape / caps) — lets serving shapes hoist binning OUT of a
    per-frame scan and vectorize it across frames while the kernel
    launch stays per-frame (the hoisted-prep shape).
    """
    if attr_px:
        assert with_attrs and tile_h == TILE8_H and tile_w == 128
    if bins is None:
        fields = build_tri_fields(setup)
        attr_fields = (build_attr_fields(setup, pass_geom)
                       if with_attrs else None)
        bins = bin_triangles(setup, fields, width, height, tile_w, tile_h,
                             span_cap=span_cap, big_capacity=big_capacity,
                             attr_fields=attr_fields)
    ntx = _cdiv(width, tile_w)
    nty = _cdiv(height, tile_h)
    P = tile_h * tile_w
    n_samples = len(sample_offsets)
    SP = n_samples * P
    p8w = SP // TILE8_H

    kernel = _make_kernel(ntx, tile_h, tile_w, tuple(sample_offsets),
                          clear_depth, with_attrs, attr_px)

    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]    # chunks stay in HBM
    operands = [bins.chunks]
    if with_attrs:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        operands.append(bins.attr_chunks)

    out_block = lambda r: pl.BlockSpec(
        (None, r, ntx * p8w), lambda b, *refs: (b, 0, 0))
    out_specs = [out_block(TILE8_H), out_block(TILE8_H)]
    out_shape = [
        jax.ShapeDtypeStruct((nty, TILE8_H, ntx * p8w), jnp.float32),
        jax.ShapeDtypeStruct((nty, TILE8_H, ntx * p8w), jnp.int32),
    ]
    if with_attrs and attr_px:
        # Per-pixel gout: one value per pixel, lanes are plain pixel x.
        out_specs.append(pl.BlockSpec(
            (None, GOUT_ROWS * TILE8_H, ntx * tile_w),
            lambda b, *refs: (b, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct(
            (nty, GOUT_ROWS * TILE8_H, ntx * tile_w), jnp.float32))
    elif with_attrs:
        out_specs.append(out_block(GOUT_ROWS * TILE8_H))
        out_shape.append(jax.ShapeDtypeStruct(
            (nty, GOUT_ROWS * TILE8_H, ntx * p8w), jnp.float32))

    scratch = [pltpu.VMEM((2, 4, COLS), jnp.float32)]
    if with_attrs:
        scratch.append(pltpu.VMEM((2, 4, ATTR_COLS), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((2, 2)))

    # Big-triangle fields ride as SCALAR PREFETCH (SMEM): the kernel
    # reads each live big triangle's planes as scalars and broadcasts —
    # no chunk padding, no DMA. Order must match the kernel unpack.
    scalars = [bins.band_start, bins.band_end, bins.sub4_of_chunk,
               bins.big_n, bins.big_tri]
    if with_attrs:
        scalars.append(bins.big_attr)
    scalars.append(bins.big_tri_aabb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(nty,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_should_interpret(),
    )(*scalars, *operands)

    # Undo the dense [8, SP/8] per-subtile layout: sublane r, lane c of a
    # subtile block hold flat = r*(SP/8)+c -> sample flat//P, pixel flat%P.
    def unfold(x):
        x = x.reshape(nty, TILE8_H, ntx, p8w)
        x = x.transpose(0, 2, 1, 3).reshape(
            nty, ntx, n_samples, tile_h, tile_w)
        x = x.transpose(2, 0, 3, 1, 4).reshape(
            n_samples, nty * tile_h, ntx * tile_w)
        return x[:, :height, :width]

    depth = unfold(outs[0])
    winner = unfold(outs[1])    # triangle ids, resolved in-kernel
    if with_attrs and attr_px:
        # [nty, GOUT_ROWS*8, ntx*tile_w]: sublanes are tile rows, lanes
        # are pixel x — unfolding is a major-dim transpose only (no
        # lane/sublane relayout).
        g_raw = outs[2].reshape(nty, GOUT_ROWS, tile_h, ntx * tile_w)
        gout = g_raw.transpose(1, 0, 2, 3).reshape(
            GOUT_ROWS, nty * tile_h, ntx * tile_w)
        gout = gout[:, :height, :width]
    elif with_attrs:
        g_raw = outs[2].reshape(nty, GOUT_ROWS, TILE8_H, ntx, p8w)
        g_raw = g_raw.transpose(0, 3, 1, 2, 4).reshape(
            nty, ntx, GOUT_ROWS, n_samples, tile_h, tile_w)
        gout = g_raw.transpose(3, 2, 0, 4, 1, 5).reshape(
            n_samples, GOUT_ROWS, nty * tile_h, ntx * tile_w)
        gout = gout[:, :, :height, :width]
    else:
        gout = None

    stats = {"big_dropped": bins.num_big_dropped}
    return depth, winner, gout, stats


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "sample_offsets", "span_cap",
                     "big_capacity", "clear_depth"),
)
def render_fused(setup: TriangleSetup, pass_geom, fused_uniforms,
                 width, height, sample_offsets, shadow_map=None,
                 span_cap=8, big_capacity=256, clear_depth=1.0,
                 bins=None):
    """Raster + full fragment stage in ONE band kernel (fused-shade).

    The per-pixel G-buffer (gout) and the per-sample depth/winner planes
    stay in VMEM as kernel scratch — only the shaded RGBA (+ coverage)
    band leaves the chip, cutting ~250 MB/frame of HBM traffic at 1080p
    vs the split raster->channels->shade pipeline. Supports the
    untextured Blinn-Phong/emissive/shadow material set (the flagship
    AudioApp scene; scenes with textures or normal maps take the split
    path).

    ``fused_uniforms``: f32[FU_LEN] (see FU_* layout).
    ``shadow_map``: optional f32[S, S] light-space depth map.
    ``bins``: optional precomputed TileBins (hoisted-prep serving shape;
    must come from the same setup / 8x128 tiles / caps).
    Returns (rgba f32[H, W, 4], covered_frac f32[H, W], stats).
    """
    from .sample_pallas import window_shape
    tile_h, tile_w = TILE8_H, 128
    if bins is None:
        fields = build_tri_fields(setup)
        attr_fields = build_attr_fields(setup, pass_geom)
        bins = bin_triangles(setup, fields, width, height, tile_w, tile_h,
                             span_cap=span_cap, big_capacity=big_capacity,
                             attr_fields=attr_fields)
    ntx = _cdiv(width, tile_w)
    nty = _cdiv(height, tile_h)
    P = tile_h * tile_w
    n_samples = len(sample_offsets)
    SP = n_samples * P
    p8w = SP // TILE8_H

    if shadow_map is not None:
        from .sample_pallas import WIN_H, WIN_W
        tex_h, tex_w = shadow_map.shape
        # Small maps tile up (repeat addressing) exactly as
        # sample_bilinear_tiled does: coordinates stay in the ORIGINAL
        # texture space; windows/DMA run over the padded map.
        rep_y = _cdiv(WIN_H + 8, tex_h) if tex_h < WIN_H + 8 else 1
        rep_x = _cdiv(WIN_W + 128, tex_w) if tex_w < WIN_W + 128 else 1
        if rep_y > 1 or rep_x > 1:
            shadow_map = jnp.tile(shadow_map, (rep_y, rep_x))
        th_p, tw_p = shadow_map.shape
        win_h, win_w = window_shape(th_p, tw_p, height, width)
        # Per-origin window uniformity (sample_pallas._sample_padded):
        # block min/max at the 8x128 alignment grain, sliding-reduced to
        # every legal window origin, read by the kernel from SMEM.
        hb, wb = th_p // 8, tw_p // 128
        blocks = shadow_map[:hb * 8, :wb * 128].reshape(hb, 8, wb, 128)
        bmin = jnp.min(blocks, axis=(1, 3))
        bmax = jnp.max(blocks, axis=(1, 3))
        kh, kw = win_h // 8, win_w // 128
        smin = jax.lax.reduce_window(bmin, jnp.inf, jax.lax.min,
                                     (kh, kw), (1, 1), "VALID")
        smax = jax.lax.reduce_window(bmax, -jnp.inf, jax.lax.max,
                                     (kh, kw), (1, 1), "VALID")
        nox = smin.shape[1]
        sh_cfg = (win_h, win_w, tex_h, tex_w, th_p, tw_p, nox)
    else:
        sh_cfg = None

    kernel = _make_kernel(ntx, tile_h, tile_w, tuple(sample_offsets),
                          clear_depth, with_attrs=True, attr_px=True,
                          fused={"shadow": sh_cfg})

    scalars = [bins.band_start, bins.band_end, bins.sub4_of_chunk,
               bins.big_n, bins.big_tri, bins.big_attr, bins.big_tri_aabb,
               fused_uniforms]
    if sh_cfg is not None:
        scalars += [smin.reshape(-1), smax.reshape(-1)]

    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM)]
    operands = [bins.chunks, bins.attr_chunks]
    if sh_cfg is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        operands.append(shadow_map)

    out_specs = [pl.BlockSpec((None, FB_ROWS * TILE8_H, ntx * tile_w),
                              lambda b, *refs: (b, 0, 0))]
    out_shape = [jax.ShapeDtypeStruct(
        (nty, FB_ROWS * TILE8_H, ntx * tile_w), jnp.float32)]

    scratch = [
        pltpu.VMEM((TILE8_H, ntx * p8w), jnp.float32),       # depth
        pltpu.VMEM((TILE8_H, ntx * p8w), jnp.int32),         # winner
        pltpu.VMEM((GOUT_ROWS * TILE8_H, ntx * tile_w), jnp.float32),
        pltpu.VMEM((2, 4, COLS), jnp.float32),               # chunk dbl-buf
        pltpu.VMEM((2, 4, ATTR_COLS), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 2)),
    ]
    if sh_cfg is not None:
        scratch += [
            pltpu.VMEM((win_h, win_w), jnp.float32),         # shadow window
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((TILE8_H, tile_w), jnp.float32),      # bilinear d
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(nty,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )

    fb_bands, = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_should_interpret(),
    )(*scalars, *operands)

    # [nty, FB_ROWS*8, ntx*128] -> FB_ROWS [H, W] planes (major-dim
    # transpose only, same as the attr_px gout unfold).
    planes = fb_bands.reshape(nty, FB_ROWS, tile_h, ntx * tile_w)
    planes = planes.transpose(1, 0, 2, 3).reshape(
        FB_ROWS, nty * tile_h, ntx * tile_w)[:, :height, :width]
    rgba = jnp.stack([planes[0], planes[1], planes[2], planes[3]], axis=-1)
    stats = {"big_dropped": bins.num_big_dropped}
    return rgba, planes[4], stats


def _flatten_bins(bins, F):
    """Flatten vmapped TileBins (leading frame axis) into the layouts the
    frame-folded kernel reads: per-band arrays become [F*NB]/[F*MC] with
    band chunk ranges offset by frame*MC, per-frame arrays become flat
    frame-major. Every merge here is a MAJOR-dim merge (compile-flat on
    this platform)."""
    MC = bins.chunks.shape[1]
    off = (jnp.arange(F, dtype=jnp.int32) * MC)[:, None]
    return dict(
        band_start=(bins.band_start + off).reshape(-1),
        band_end=(bins.band_end + off).reshape(-1),
        sub4_of_chunk=bins.sub4_of_chunk.reshape(-1),
        chunks=bins.chunks.reshape(F * MC, 4, COLS),
        attr_chunks=(bins.attr_chunks.reshape(F * MC, 4, ATTR_COLS)
                     if bins.attr_chunks is not None else None),
        big_tri=bins.big_tri.reshape(-1),
        big_attr=(bins.big_attr.reshape(-1)
                  if bins.big_attr is not None else None),
        big_tri_aabb=bins.big_tri_aabb.reshape(-1),
        big_n=bins.big_n.reshape(-1),              # [F]
    )


@functools.partial(
    jax.jit,
    static_argnames=("size", "tile_h", "tile_w", "span_cap",
                     "big_capacity", "clear_depth"),
)
def rasterize_depth_batch(setup_b: TriangleSetup, size, tile_h, tile_w,
                          span_cap=8, big_capacity=256, clear_depth=1.0):
    """Depth-only raster of a FRAME BATCH in one kernel launch (the
    batched shadow pass). ``setup_b``: TriangleSetup with a leading
    frame axis. Returns f32[F, size, size]."""
    F = setup_b.valid.shape[0]

    def prep(setup):
        fields = build_tri_fields(setup)
        return bin_triangles(setup, fields, size, size, tile_w, tile_h,
                             span_cap=span_cap, big_capacity=big_capacity)
    bins = jax.vmap(prep)(setup_b)
    flat = _flatten_bins(bins, F)

    ntx = _cdiv(size, tile_w)
    nty = _cdiv(size, tile_h)
    p8w = (tile_h * tile_w) // TILE8_H            # one sample
    kernel = _make_kernel(ntx, tile_h, tile_w, ((0.5, 0.5),), clear_depth,
                          with_attrs=False, frames=F, nbands=nty,
                          bcap=big_capacity)

    scalars = [flat["band_start"], flat["band_end"], flat["sub4_of_chunk"],
               flat["big_n"], flat["big_tri"], flat["big_tri_aabb"]]
    out_block = lambda r: pl.BlockSpec(
        (None, r, ntx * p8w), lambda b, *refs: (b, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(F * nty,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[out_block(TILE8_H), out_block(TILE8_H)],
        scratch_shapes=[pltpu.VMEM((2, 4, COLS), jnp.float32),
                        pltpu.SemaphoreType.DMA((2, 2))],
    )
    depth_b, _ = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((F * nty, TILE8_H, ntx * p8w), jnp.float32),
            jax.ShapeDtypeStruct((F * nty, TILE8_H, ntx * p8w), jnp.int32),
        ],
        interpret=_should_interpret(),
    )(*scalars, flat["chunks"])

    d = depth_b.reshape(F, nty, TILE8_H, ntx, p8w)
    d = d.transpose(0, 1, 3, 2, 4).reshape(
        F, nty, ntx, 1, tile_h, tile_w)               # 1 sample
    d = d.transpose(0, 3, 1, 4, 2, 5).reshape(
        F, nty * tile_h, ntx * tile_w)
    return d[:, :size, :size]


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "sample_offsets", "span_cap",
                     "big_capacity", "clear_depth"),
)
def rasterize_tiles_batch(setup_b: TriangleSetup, pass_geom_b,
                          width, height, sample_offsets,
                          span_cap=8, big_capacity=256, clear_depth=1.0):
    """attr_px rasterization of a FRAME BATCH in one kernel launch.

    The per-pixel G-buffer for all frames comes out of a single
    frame-folded grid; the (dead in this path) per-sample depth/winner
    planes are discarded. Returns (gout f32[F, GOUT_ROWS, H, W], stats
    with per-frame big_dropped)."""
    F = setup_b.valid.shape[0]
    tile_h, tile_w = TILE8_H, 128

    def prep(setup, pg):
        fields = build_tri_fields(setup)
        attr_fields = build_attr_fields(setup, pg)
        return bin_triangles(setup, fields, width, height, tile_w, tile_h,
                             span_cap=span_cap, big_capacity=big_capacity,
                             attr_fields=attr_fields)
    bins = jax.vmap(prep)(setup_b, pass_geom_b)
    flat = _flatten_bins(bins, F)

    ntx = _cdiv(width, tile_w)
    nty = _cdiv(height, tile_h)
    n_samples = len(sample_offsets)
    p8w = (n_samples * tile_h * tile_w) // TILE8_H

    kernel = _make_kernel(ntx, tile_h, tile_w, tuple(sample_offsets),
                          clear_depth, with_attrs=True, attr_px=True,
                          frames=F, nbands=nty, bcap=big_capacity)

    scalars = [flat["band_start"], flat["band_end"], flat["sub4_of_chunk"],
               flat["big_n"], flat["big_tri"], flat["big_attr"],
               flat["big_tri_aabb"]]
    out_block = lambda r, w: pl.BlockSpec(
        (None, r, w), lambda b, *refs: (b, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(F * nty,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[out_block(TILE8_H, ntx * p8w),
                   out_block(TILE8_H, ntx * p8w),
                   out_block(GOUT_ROWS * TILE8_H, ntx * tile_w)],
        scratch_shapes=[pltpu.VMEM((2, 4, COLS), jnp.float32),
                        pltpu.VMEM((2, 4, ATTR_COLS), jnp.float32),
                        pltpu.SemaphoreType.DMA((2, 2))],
    )
    _, _, gout_b = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((F * nty, TILE8_H, ntx * p8w), jnp.float32),
            jax.ShapeDtypeStruct((F * nty, TILE8_H, ntx * p8w), jnp.int32),
            jax.ShapeDtypeStruct((F * nty, GOUT_ROWS * TILE8_H,
                                  ntx * tile_w), jnp.float32),
        ],
        interpret=_should_interpret(),
    )(*scalars, flat["chunks"], flat["attr_chunks"])

    g = gout_b.reshape(F, nty, GOUT_ROWS, tile_h, ntx * tile_w)
    g = g.transpose(0, 2, 1, 3, 4).reshape(
        F, GOUT_ROWS, nty * tile_h, ntx * tile_w)[:, :, :height, :width]
    stats = {"big_dropped": bins.num_big_dropped}       # [F]
    return g, stats


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "sample_offsets", "span_cap",
                     "big_capacity", "clear_depth"),
)
def render_fused_batch(setup_b: TriangleSetup, pass_geom_b, funi_b,
                       width, height, sample_offsets, shadow_map_b=None,
                       span_cap=8, big_capacity=256, clear_depth=1.0):
    """render_fused over a FRAME BATCH in ONE kernel launch.

    Prep/binning vectorize across frames (vmapped pure XLA); the fused
    band kernel then runs with grid (F * nbands) — zero per-frame
    dispatches, zero scan sequencing of small ops. Inputs carry a
    leading frame axis; ``funi_b``: f32[F, FU_LEN]; ``shadow_map_b``:
    optional f32[F, S, S]. Returns (rgba f32[F, H, W, 4],
    covered f32[F, H, W], stats with per-frame big_dropped)."""
    from .sample_pallas import window_shape
    tile_h, tile_w = TILE8_H, 128
    F = funi_b.shape[0]

    def prep(setup, pg):
        fields = build_tri_fields(setup)
        attr_fields = build_attr_fields(setup, pg)
        return bin_triangles(setup, fields, width, height, tile_w, tile_h,
                             span_cap=span_cap, big_capacity=big_capacity,
                             attr_fields=attr_fields)
    bins = jax.vmap(prep)(setup_b, pass_geom_b)
    flat = _flatten_bins(bins, F)

    ntx = _cdiv(width, tile_w)
    nty = _cdiv(height, tile_h)
    n_samples = len(sample_offsets)
    p8w = (n_samples * tile_h * tile_w) // TILE8_H

    sm_len = None
    if shadow_map_b is not None:
        from .sample_pallas import WIN_H, WIN_W
        tex_h, tex_w = shadow_map_b.shape[1:]
        rep_y = _cdiv(WIN_H + 8, tex_h) if tex_h < WIN_H + 8 else 1
        rep_x = _cdiv(WIN_W + 128, tex_w) if tex_w < WIN_W + 128 else 1
        if rep_y > 1 or rep_x > 1:
            shadow_map_b = jnp.tile(shadow_map_b, (1, rep_y, rep_x))
        th_p, tw_p = shadow_map_b.shape[1:]
        assert th_p % 8 == 0, "stacked shadow maps need 8-row alignment"
        win_h, win_w = window_shape(th_p, tw_p, height, width)
        hb, wb = th_p // 8, tw_p // 128
        blocks = shadow_map_b[:, :hb * 8, :wb * 128].reshape(
            F, hb, 8, wb, 128)
        bmin = jnp.min(blocks, axis=(2, 4))
        bmax = jnp.max(blocks, axis=(2, 4))
        kh, kw = win_h // 8, win_w // 128
        smin = jax.lax.reduce_window(bmin, jnp.inf, jax.lax.min,
                                     (1, kh, kw), (1, 1, 1), "VALID")
        smax = jax.lax.reduce_window(bmax, -jnp.inf, jax.lax.max,
                                     (1, kh, kw), (1, 1, 1), "VALID")
        nox = smax.shape[2]
        sm_len = smax.shape[1] * nox
        sh_cfg = (win_h, win_w, tex_h, tex_w, th_p, tw_p, nox)
    else:
        sh_cfg = None

    kernel = _make_kernel(ntx, tile_h, tile_w, tuple(sample_offsets),
                          clear_depth, with_attrs=True, attr_px=True,
                          fused={"shadow": sh_cfg}, frames=F, nbands=nty,
                          bcap=big_capacity, sm_len=sm_len)

    scalars = [flat["band_start"], flat["band_end"], flat["sub4_of_chunk"],
               flat["big_n"], flat["big_tri"], flat["big_attr"],
               flat["big_tri_aabb"], funi_b.reshape(-1)]
    if sh_cfg is not None:
        scalars += [smin.reshape(-1), smax.reshape(-1)]

    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM)]
    operands = [flat["chunks"], flat["attr_chunks"]]
    if sh_cfg is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        operands.append(shadow_map_b.reshape(F * th_p, tw_p))

    out_specs = [pl.BlockSpec((None, FB_ROWS * TILE8_H, ntx * tile_w),
                              lambda b, *refs: (b, 0, 0))]
    out_shape = [jax.ShapeDtypeStruct(
        (F * nty, FB_ROWS * TILE8_H, ntx * tile_w), jnp.float32)]

    scratch = [
        pltpu.VMEM((TILE8_H, ntx * p8w), jnp.float32),
        pltpu.VMEM((TILE8_H, ntx * p8w), jnp.int32),
        pltpu.VMEM((GOUT_ROWS * TILE8_H, ntx * tile_w), jnp.float32),
        pltpu.VMEM((2, 4, COLS), jnp.float32),
        pltpu.VMEM((2, 4, ATTR_COLS), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 2)),
    ]
    if sh_cfg is not None:
        scratch += [
            pltpu.VMEM((win_h, win_w), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((TILE8_H, tile_w), jnp.float32),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(F * nty,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )

    fb_bands, = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_should_interpret(),
    )(*scalars, *operands)

    planes = fb_bands.reshape(F, nty, FB_ROWS, tile_h, ntx * tile_w)
    planes = planes.transpose(0, 2, 1, 3, 4).reshape(
        F, FB_ROWS, nty * tile_h, ntx * tile_w)[:, :, :height, :width]
    rgba = jnp.stack([planes[:, 0], planes[:, 1],
                      planes[:, 2], planes[:, 3]], axis=-1)
    stats = {"big_dropped": bins.num_big_dropped}   # [F]
    return rgba, planes[:, 4], stats


def channels_from_gout(gout, winner):
    """SoA shading channels straight from the kernel's attribute rows.

    Every channel is a full-width [S, H, W] slice of gout (no [..., 3]
    minor-dim arrays anywhere — XLA never cancels the AoS round-trip and
    minor-dim-3 relayouts cost ~10x the entire shading math).
    """
    invw = gout[:, ROW_INVW]
    covered = winner >= 0
    inv = 1.0 / jnp.where(invw > 0.0, invw, 1.0)

    def row(i):
        return gout[:, i] * inv

    return {
        "wx": row(ROW_WORLD), "wy": row(ROW_WORLD + 1),
        "wz": row(ROW_WORLD + 2),
        "nx": row(ROW_NORMAL), "ny": row(ROW_NORMAL + 1),
        "nz": row(ROW_NORMAL + 2),
        "u": row(ROW_UV), "v": row(ROW_UV + 1),
        "kind": jnp.where(covered,
                          jnp.rint(row(ROW_MATKIND)).astype(jnp.int32), -1),
        "texid": jnp.where(covered,
                           jnp.rint(row(ROW_TEXID)).astype(jnp.int32), -1),
        "nmid": jnp.where(covered,
                          jnp.rint(row(ROW_NMID)).astype(jnp.int32), -1),
        "cr": row(ROW_COLOR), "cg": row(ROW_COLOR + 1),
        "cb": row(ROW_COLOR + 2),
        "covered": covered,
    }


def channels_from_gout_px(gout, n_samples):
    """Per-PIXEL shading channels from an ``attr_px`` kernel gout.

    ``gout`` is f32[GOUT_ROWS, H, W] — attributes of the first covered
    sample's winner, already selected in-kernel (Metal fragment
    semantics). Coverage comes from the kernel's covered-sample-count
    row (ROW_DEPTH), so the per-sample winner/depth planes have NO
    consumer in this path and their band unfold dead-codes away.
    """
    invw = gout[ROW_INVW]
    cnt = gout[ROW_DEPTH]
    covered = cnt > 0.0
    inv = 1.0 / jnp.where(invw > 0.0, invw, 1.0)

    def row(i):
        return gout[i] * inv

    return {
        "wx": row(ROW_WORLD), "wy": row(ROW_WORLD + 1),
        "wz": row(ROW_WORLD + 2),
        "nx": row(ROW_NORMAL), "ny": row(ROW_NORMAL + 1),
        "nz": row(ROW_NORMAL + 2),
        "u": row(ROW_UV), "v": row(ROW_UV + 1),
        "kind": jnp.where(covered,
                          jnp.rint(row(ROW_MATKIND)).astype(jnp.int32), -1),
        "texid": jnp.where(covered,
                           jnp.rint(row(ROW_TEXID)).astype(jnp.int32), -1),
        "nmid": jnp.where(covered,
                          jnp.rint(row(ROW_NMID)).astype(jnp.int32), -1),
        "cr": row(ROW_COLOR), "cg": row(ROW_COLOR + 1),
        "cb": row(ROW_COLOR + 2),
        "covered": covered,
        "cov_frac": cnt * (1.0 / n_samples),
    }


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
