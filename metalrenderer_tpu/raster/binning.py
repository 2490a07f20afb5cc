"""Tile binning: triangle AABBs -> chunk-aligned per-tile triangle lists.

TPU-native replacement for the work distribution Metal's hardware
rasterizer does implicitly. All static shapes (SURVEY.md §7 risk
"variable-length tile bins").

Layout contract with raster_pallas.py (chosen for Mosaic's alignment
rules — no unaligned DMA slices, no scalar extracts from VMEM):

  * Triangles expand to (tile, tri) entries (span cap K), stably sorted by
    tile id — stability preserves submission order, which the LessEqual
    depth tie-break requires (mtl_engine.mm:437).
  * Entries are packed into CHUNK-aligned per-tile runs; tiles are
    row-major so each band (tile row) owns one contiguous chunk range
    [band_start, band_end) and empty tiles own nothing — the band kernel
    walks the range with a dynamic-trip-count loop, so sparse scenes pay
    only for live chunks.
  * Each chunk becomes a ``[3, COLS]`` f32 operand: rows A, B, C of
    lane groups [e0 | e1 | e2 | z | tl0 | tl1 | tl2 | valid | tid | pad].
    Edge/z groups hold real plane coefficients; flag groups have A=B=0 so
    the "plane" evaluates to the constant flag.
  * Triangles spanning more than the cap (e.g. the floor plane) go to a
    fixed-capacity "big" list in the same chunk format, processed by every
    tile (gated by a per-chunk union-AABB test). Overflow is counted,
    never silently dropped.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass
from .geometry import TriangleSetup, scalar_planes

CHUNK = 32          # triangles per chunk (matmul lane group). 32 keeps
                    # every lane slice 128-aligned (4*CHUNK = 128) while
                    # halving the wasted lanes of sparse tiles vs 64.
# Plane groups e0, e1, e2, z then flag groups tl0, tl1, tl2, valid, tid
# (padded to 8 flag groups so every lane slice stays 128-aligned). The
# tid group carries the triangle id as a constant "plane" so the kernel
# resolves the WINNING TRIANGLE ID in-register — resolving it outside
# the kernel needs an XLA gather over every pixel-sample, which the TPU
# gather expander serializes (~62 ms per 1080p MSAA4 frame, measured).
GROUPS = 12
COLS = CHUNK * GROUPS  # 384
VIS_FIELDS = 17

# Attribute-plane groups (each an affine plane of value/w in screen space;
# constants like mat_kind become value * (1/w)-plane and divide back out):
#   0-2 world xyz, 3-4 uv, 5-7 normal, 8 inv_w, 9 mat_kind, 10 tex_id,
#   11-13 color rgb, 14 normal_map_id. Padded to 16 groups -> 1024 lanes.
ATTR_GROUPS = 15
ATTR_GROUPS_PADDED = 16
ATTR_COLS = CHUNK * ATTR_GROUPS_PADDED  # 512
# Attr fields are stored COMP-MAJOR and group-padded per triangle
# ([A-row groups | B-row groups | C-row groups], 16 groups each): chunk
# assembly is then one contiguous [CHUNK, 48] block transpose instead of
# a minor-dim-3 relayout (which XLA fuses with the slot gather into a
# serialized mess — measured 47 ms/frame at 100k tris before this).
ATTR_FIELDS = ATTR_GROUPS_PADDED * 3    # 48
# gout row indices for the kernel/consumers:
ROW_WORLD = 0
ROW_UV = 3
ROW_NORMAL = 5
ROW_INVW = 8
ROW_MATKIND = 9
ROW_TEXID = 10
ROW_COLOR = 11
ROW_NMID = 14
ROW_DEPTH = 15  # depth stored in the spare padded row


def build_tri_fields(setup: TriangleSetup) -> jnp.ndarray:
    """Per-triangle visibility fields [T, 17]:
    A0,B0,C0, A1,B1,C1, A2,B2,C2, az,bz,cz, tl0,tl1,tl2, valid, tid.

    tid is the submission-order triangle id as f32 (exact up to 2^24
    triangles — far above the per-pass triangle budget)."""
    zplanes = scalar_planes(setup, setup.z)          # [T, 3]
    t = setup.valid.shape[0]
    rec = jnp.concatenate(
        [
            setup.edge.reshape(-1, 9),
            zplanes,
            setup.top_left.astype(jnp.float32),
            setup.valid.astype(jnp.float32)[:, None],
            jnp.arange(t, dtype=jnp.float32)[:, None],
        ],
        axis=-1,
    )
    return rec


def build_attr_fields(setup: TriangleSetup, pg) -> jnp.ndarray:
    """Per-triangle attribute-plane fields [T, 42] (14 groups x A,B,C).

    Interpolated attributes are screen-space planes of value/w
    (raster/geometry.py attribute_planes); per-triangle constants ride as
    value * inv_w-plane so one divide recovers them exactly.
    """
    from .geometry import attribute_planes  # local to avoid cycle at import

    vertex_vals = pg.vattrs                          # [T, 3, 8]
    ap = attribute_planes(setup, vertex_vals)        # [T, 8, 3]
    iw = scalar_planes(setup, setup.inv_w)           # [T, 3]
    consts = jnp.stack([
        pg.mat_kind.astype(jnp.float32),
        pg.tex_id.astype(jnp.float32),
        pg.mat_color[:, 0], pg.mat_color[:, 1], pg.mat_color[:, 2],
        pg.normal_map_id.astype(jnp.float32),
    ], axis=1)                                       # [T, 6]
    const_planes = consts[:, :, None] * iw[:, None, :]  # [T, 6, 3]
    all_planes = jnp.concatenate(
        [ap, iw[:, None, :], const_planes], axis=1)  # [T, 15, 3]
    t = all_planes.shape[0]
    padded = jnp.concatenate(
        [all_planes,
         jnp.zeros((t, ATTR_GROUPS_PADDED - ATTR_GROUPS, 3), jnp.float32)],
        axis=1)                                      # [T, 16, 3]
    return padded.transpose(0, 2, 1).reshape(t, ATTR_FIELDS)  # comp-major


def _fields_to_chunks(fields_padded):
    """[N*CHUNK, 17] -> visibility matmul operand [N, 3, COLS]."""
    n = fields_padded.shape[0] // CHUNK
    r = fields_padded.reshape(n, CHUNK, VIS_FIELDS)
    zeros8 = jnp.zeros((n, CHUNK, GROUPS - 4), jnp.float32)
    zeros3 = jnp.zeros((n, CHUNK, GROUPS - 9), jnp.float32)
    # Rows gather (field indices per group) then [N, CHUNK, G] -> [N, G*CHUNK]
    a = jnp.concatenate([r[:, :, (0, 3, 6, 9)], zeros8], axis=-1)
    b = jnp.concatenate([r[:, :, (1, 4, 7, 10)], zeros8], axis=-1)
    c = jnp.concatenate(
        [r[:, :, (2, 5, 8, 11, 12, 13, 14, 15, 16)], zeros3], axis=-1)
    def to_cols(x):  # [N, CHUNK, G] -> [N, G*CHUNK]
        return x.transpose(0, 2, 1).reshape(n, COLS)
    # Row 3 is zero padding: Mosaic tiles the operand (4, 128), so the
    # kernel's dynamic per-chunk DMA slice must be 4 sublanes tall.
    return jnp.stack([to_cols(a), to_cols(b), to_cols(c),
                      jnp.zeros((n, COLS), jnp.float32)], axis=1)


def _attr_fields_to_chunks(attr_padded):
    """[N*CHUNK, 48] comp-major -> attribute operand [N, 4, ATTR_COLS]."""
    n = attr_padded.shape[0] // CHUNK
    r = attr_padded.reshape(n, CHUNK, ATTR_FIELDS)
    # One contiguous block transpose: [N, CHUNK, 3*16] -> [N, 3*16, CHUNK]
    # -> rows (comp), lanes (group-major * CHUNK). Row 3 = DMA-tiling pad.
    rows3 = r.transpose(0, 2, 1).reshape(n, 3, ATTR_COLS)
    return jnp.concatenate(
        [rows3, jnp.zeros((n, 1, ATTR_COLS), jnp.float32)], axis=1)


@pytree_dataclass
class TileBins:
    """Binning result consumed by the band raster kernel.

    Chunks are laid out band-major (tiles sorted row-major), each tile's
    entries starting at a chunk boundary, so a band's chunks form one
    contiguous range [band_start[b], band_end[b]) that the kernel walks
    with a dynamic-trip-count loop — empty tiles own NO chunks and cost
    nothing (no dead grid steps at high tile counts)."""

    # --- scalar prefetch ---
    band_start: jnp.ndarray      # i32[NBANDS] first chunk of each band
    band_end: jnp.ndarray        # i32[NBANDS] one past the last chunk
    # Subtile (x tile index) per chunk, BYTE-PACKED 4/i32: this array is
    # O(chunks) and lives in SMEM — unpacked i32 it alone exceeds the
    # ~1 MB SMEM budget at config-5 scale (1M tris @4K = 258k chunks =
    # 1.03 MB) and the Mosaic compile dies with it. Requires ntx <= 256.
    sub4_of_chunk: jnp.ndarray   # i32[MC/4] four subtile bytes per word
    # --- blocked operands (stay in HBM; kernel DMAs per chunk) ---
    chunks: jnp.ndarray          # f32[MC, 4, COLS] (row 3 = pad)
    attr_chunks: jnp.ndarray     # f32[MC, 4, ATTR_COLS] or None
    # --- big list (scalar-prefetch SMEM arrays, one TRIANGLE at a time:
    # a 32-lane chunk carrying 2-3 live floor triangles wastes ~10x the
    # vector work of evaluating each triangle's planes as scalars over
    # the whole band) ---
    big_tri: jnp.ndarray         # f32[BCAP*17] per-tri vis fields, flat
    big_attr: jnp.ndarray        # f32[BCAP*48] comp-major attrs or None
    big_tri_aabb: jnp.ndarray    # i32[BCAP*4] per-tri xmin,ymin,xmax,ymax
    big_n: jnp.ndarray           # i32[1] live big-triangle count
    num_big_dropped: jnp.ndarray  # i32[] overflow beyond capacity


def num_chunks(num_tiles, num_triangles, span_cap):
    """Static chunk-grid size for (tiles, tris), rounded to a multiple
    of 4 so the byte-packed subtile array (sub4_of_chunk) stays aligned
    across frame-major merges (_flatten_bins)."""
    e = num_triangles * span_cap
    mc = num_tiles + -(-e // CHUNK)
    return (mc + 3) & ~3


def bin_triangles(setup: TriangleSetup, fields, width, height,
                  tile_w, tile_h, span_cap=8, big_capacity=256,
                  attr_fields=None) -> TileBins:
    """Build chunk-aligned per-tile triangle lists. All shapes static.

    TPU cost notes (measured on v5e at 100k triangles; VERDICT r2):
    entries move as i32 TRIANGLE IDS only — positions come from a
    boundary scatter + cumulative max (the obvious ``starts[key]`` /
    ``chunk_start[key]`` table lookups are 1-D gathers, which the TPU
    gather expander serializes at ~10 ms per 800k lookups), and the
    field payload is rebuilt by contiguous ROW gathers per operand
    (vis / attr separately: slicing columns out of one wide scattered
    array relayouts ~160 MB per frame).
    """
    n_fields = fields.shape[-1]
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    nt = ntx * nty
    T = setup.valid.shape[0]
    mc = num_chunks(nt, T, span_cap)

    aabb = setup.aabb
    tx0 = jnp.clip(jnp.floor(aabb[:, 0] / tile_w).astype(jnp.int32), 0, ntx - 1)
    ty0 = jnp.clip(jnp.floor(aabb[:, 1] / tile_h).astype(jnp.int32), 0, nty - 1)
    tx1 = jnp.clip(jnp.floor(aabb[:, 2] / tile_w).astype(jnp.int32), 0, ntx - 1)
    ty1 = jnp.clip(jnp.floor(aabb[:, 3] / tile_h).astype(jnp.int32), 0, nty - 1)
    on_screen = (aabb[:, 2] >= 0) & (aabb[:, 0] < width) & \
                (aabb[:, 3] >= 0) & (aabb[:, 1] < height)
    live = setup.valid & on_screen

    wspan = tx1 - tx0 + 1
    hspan = ty1 - ty0 + 1
    span = wspan * hspan
    small = live & (span <= span_cap)
    big = live & (span > span_cap)

    # --- expansion: (tile, tri) pairs, sorted by (tile, tri) --------------
    # j-MAJOR layout, flattened over the MAJOR dim: a (T, span_cap) ->
    # (E,) minor-dim merge compiles in O(E) on this platform's XLA build
    # (~0.17 ms/element — measured; the config-5 compile blowup), while
    # the (span_cap, T) major merge is O(1). Submission order within a
    # tile is restored by sorting with the triangle id as a SECOND key —
    # (tile, tri) pairs are unique, so this is bit-identical to the
    # previous tri-major stable sort.
    j = jnp.arange(span_cap, dtype=jnp.int32)[:, None]
    dx = j % wspan[None, :]
    dy = j // wspan[None, :]
    tile = (ty0[None, :] + dy) * ntx + (tx0[None, :] + dx)
    slot_ok = small[None, :] & (j < span[None, :])
    keys = jnp.where(slot_ok, tile, nt).astype(jnp.int32).reshape(-1)
    # Dead entries carry payload T (the zero field row): the slot array
    # below is a PREFIX slice of the sorted payload, and the tail of that
    # prefix can reach into the key==nt region.
    payload = jnp.where(
        slot_ok, jnp.arange(T, dtype=jnp.int32)[None, :], T).reshape(-1)

    # --- chunk alignment by PRE-PADDING the sort input ---------------------
    # Tile t needs (CHUNK - count_t % CHUNK) % CHUNK dead filler entries
    # for its run to end at a chunk boundary. Those fillers are generated
    # UP FRONT from a key histogram and sorted together with the real
    # entries (filler payload = T sorts after every real id within the
    # tile), so the sorted order IS the chunk-aligned layout: slot_tri is
    # simply the sorted payload, with no per-entry position computation.
    # (The alternatives all compile in O(E) on this platform's XLA build:
    # a scatter-to-first-entry + associative_scan running max ~170 s at
    # 1M entries, a 1-D pad_before[keys] gather >25 min.)
    counts_pre = jnp.zeros((nt + 1,), jnp.int32).at[keys].add(1)[:nt]
    need = (CHUNK - counts_pre % CHUNK) % CHUNK            # [NT]; 0 if empty
    tiles_range = jnp.arange(nt, dtype=jnp.int32)
    pk = jnp.arange(CHUNK - 1, dtype=jnp.int32)[:, None]   # [CHUNK-1, NT]
    pad_keys = jnp.where(pk < need[None, :], tiles_range[None, :],
                         nt).astype(jnp.int32).reshape(-1)
    n_entries = mc * CHUNK
    # The prefix slice below needs at least n_entries sort entries.
    extra = max(0, n_entries - (keys.shape[0] + pad_keys.shape[0]))
    all_keys = jnp.concatenate(
        [keys, pad_keys, jnp.full((extra,), nt, jnp.int32)])
    all_payload = jnp.concatenate(
        [payload, jnp.full((pad_keys.shape[0] + extra,), T, jnp.int32)])
    keys_sorted, payload_sorted = jax.lax.sort(
        (all_keys, all_payload), num_keys=2)

    starts = jnp.searchsorted(keys_sorted, tiles_range, side="left")
    counts = (jnp.searchsorted(keys_sorted, tiles_range, side="right")
              - starts).astype(jnp.int32)                  # incl. fillers
    starts = starts.astype(jnp.int32)

    # Empty tiles own zero chunks (the band kernel initializes the whole
    # band up front, so no per-tile init chunk is needed). counts is
    # already CHUNK-aligned, so nchunks * CHUNK == counts and every
    # tile's run starts at chunk_start * CHUNK == starts.
    nchunks = (counts // CHUNK).astype(jnp.int32)          # [NT]
    chunk_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(nchunks)[:-1].astype(jnp.int32)])

    # All real+filler entries of live tiles fit in mc*CHUNK slots
    # (sum ceil(c_t/CHUNK) <= E/CHUNK + NT = mc); key-nt padding sorts
    # past them and is sliced off (or, at low tile counts, carries
    # payload T = the zero field row).
    slot_tri = payload_sorted[:n_entries]
    vis_ext = jnp.concatenate(
        [fields, jnp.zeros((1, n_fields), jnp.float32)])   # dead row = T
    chunks = _fields_to_chunks(vis_ext[slot_tri])
    if attr_fields is not None:
        attr_ext = jnp.concatenate(
            [attr_fields, jnp.zeros((1, ATTR_FIELDS), jnp.float32)])
        attr_chunks = _attr_fields_to_chunks(attr_ext[slot_tri])
    else:
        attr_chunks = None

    # Per-chunk / per-band metadata.
    c_idx = jnp.arange(mc, dtype=jnp.int32)
    # tile_of_chunk: tile whose [chunk_start, chunk_start+nchunks) contains c.
    ends = chunk_start + nchunks
    tile_of_chunk = jnp.searchsorted(ends, c_idx, side="right").astype(jnp.int32)
    in_use = c_idx < ends[-1]
    tile_of_chunk = jnp.where(in_use, jnp.minimum(tile_of_chunk, nt - 1),
                              nt - 1)
    assert ntx <= 256, "byte-packed subtile ids need ntx <= 256"
    sub_of_chunk = (tile_of_chunk % ntx).astype(jnp.int32)
    s4 = sub_of_chunk.reshape(-1, 4)                # mc is 4-aligned
    sub4_of_chunk = (s4[:, 0] | (s4[:, 1] << 8) | (s4[:, 2] << 16)
                     | (s4[:, 3] << 24))
    # Tiles are row-major, so each band's chunks are contiguous.
    band_start = chunk_start[::ntx].astype(jnp.int32)
    band_end = jnp.concatenate(
        [band_start[1:], ends[-1:].astype(jnp.int32)])

    # --- big list -----------------------------------------------------------
    # Per-TRIANGLE scalar arrays (kernel reads them from SMEM and
    # evaluates each live big triangle's planes as scalar-broadcast FMAs
    # over the whole band — no lane padding, no chunk DMA).
    order = jnp.argsort(~big, stable=True)               # live-first, by tid
    cap = min(big_capacity, T)
    big_ids = order[:cap].astype(jnp.int32)
    big_is_live = big[big_ids]
    big_fields = fields[big_ids]
    big_fields = big_fields.at[:, 15].set(
        jnp.where(big_is_live, big_fields[:, 15], 0.0))
    pad = big_capacity - cap
    if pad:
        big_fields = jnp.concatenate(
            [big_fields, jnp.zeros((pad, n_fields), jnp.float32)])
    big_tri = big_fields[:, :VIS_FIELDS].reshape(-1)
    if attr_fields is not None:
        big_attr = attr_fields[big_ids]
        if pad:
            big_attr = jnp.concatenate(
                [big_attr, jnp.zeros((pad, ATTR_FIELDS), jnp.float32)])
        big_attr = big_attr.reshape(-1)
    else:
        big_attr = None
    n_big = jnp.sum(big.astype(jnp.int32))

    # Per-triangle AABB (band-level trivial reject in the kernel). Dead
    # slots get an empty extent.
    baabb = setup.aabb[big_ids]                          # [cap, 4]
    baabb = jnp.stack([
        jnp.floor(baabb[:, 0]), jnp.floor(baabb[:, 1]),
        jnp.ceil(baabb[:, 2]), jnp.ceil(baabb[:, 3])], axis=1)
    baabb = jnp.where(big_is_live[:, None], baabb, 0.0)
    if pad:
        baabb = jnp.concatenate(
            [baabb, jnp.zeros((pad, 4), jnp.float32)])
    big_tri_aabb = jnp.clip(
        baabb, -2**30, 2**30).astype(jnp.int32).reshape(-1)

    return TileBins(
        band_start=band_start, band_end=band_end,
        sub4_of_chunk=sub4_of_chunk,
        chunks=chunks, attr_chunks=attr_chunks,
        big_tri=big_tri, big_attr=big_attr,
        big_tri_aabb=big_tri_aabb,
        big_n=jnp.minimum(n_big, cap).astype(jnp.int32).reshape(1),
        num_big_dropped=jnp.maximum(n_big - cap, 0).astype(jnp.int32),
    )
