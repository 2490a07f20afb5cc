"""Brute-force golden rasterizer (the oracle).

A deliberately simple, obviously-correct implementation: for every sample it
scans all triangles with ``lax.scan`` (constant memory), applying the
coverage rule, LessEqual depth test and submission-order tie-break — the
exact semantics of Metal's fixed-function rasterizer + depth unit as
configured by the reference (mtl_engine.mm:436-439 LessEqual write-on,
:829-830 CCW/back-cull). Every Pallas kernel is validated against this
(SURVEY.md §4b: golden-image tests, PSNR >= 40 dB).

It shares triangle *setup* with the production path but intentionally uses
the direct barycentric formulation for interpolation (the Pallas path uses
precomputed screen-space planes), so the two paths cross-check each other's
math.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .geometry import TriangleSetup, scalar_planes
from .shade import GBuffer


def _sample_grid(width, height, sample_positions):
    """Pixel-sample coordinates: f32[S, H, W] x 2."""
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    py, px = jnp.meshgrid(ys, xs, indexing="ij")
    offs = jnp.asarray(sample_positions, jnp.float32)  # [S, 2] (x, y)
    sx = px[None] + offs[:, 0][:, None, None]
    sy = py[None] + offs[:, 1][:, None, None]
    return sx, sy


def _anchored_grid(width, height, sample_positions, anchor):
    """Tile-anchored coordinates matching the Pallas kernel's plane
    arithmetic: (tile-relative sample coords xr/yr, tile bases ox/oy),
    all f32[S, H, W]. anchor = (tile_w, tile_h)."""
    tile_w, tile_h = anchor
    ys = jnp.arange(height, dtype=jnp.int32)
    xs = jnp.arange(width, dtype=jnp.int32)
    pyi, pxi = jnp.meshgrid(ys, xs, indexing="ij")
    offs = jnp.asarray(sample_positions, jnp.float32)  # [S, 2] (x, y)
    xr = (pxi % tile_w).astype(jnp.float32)[None] + offs[:, 0][:, None, None]
    yr = (pyi % tile_h).astype(jnp.float32)[None] + offs[:, 1][:, None, None]
    ox = ((pxi // tile_w) * tile_w).astype(jnp.float32)[None] \
        + jnp.zeros_like(offs[:, 0])[:, None, None]
    oy = ((pyi // tile_h) * tile_h).astype(jnp.float32)[None] \
        + jnp.zeros_like(offs[:, 1])[:, None, None]
    return xr, yr, ox, oy


def rasterize_brute_force(setup: TriangleSetup, width, height,
                          sample_positions, anchor=None):
    """Visibility: returns (depth f32[S,H,W], winner i32[S,H,W]; -1 = none).

    ``anchor=(tile_w, tile_h)`` evaluates edge/z PLANES with the exact
    tile-relative FMA association of the Pallas band kernel
    (raster_pallas.process_chunk), so depth rounds bit-identically and
    z-fighting pixels of interpenetrating surfaces resolve to the SAME
    winner in both backends (they are genuinely arbitrary otherwise —
    config 2's whole 39 dB TPU residual was 15 such pixels). ``None``
    keeps the independent direct-barycentric formulation, which
    cross-checks the plane math everywhere except exact-tie ULPs.
    """
    if anchor is not None:
        xr, yr, ox, oy = _anchored_grid(width, height, sample_positions,
                                        anchor)

        def eval_plane(a, b, c):
            # Same association as the kernel: ((c + a*ox) + b*oy) then
            # ((a*xr + b*yr)) + c_adj.
            c_adj = (c + a * ox) + b * oy
            return (a * xr + b * yr) + c_adj
    else:
        sx, sy = _sample_grid(width, height, sample_positions)

    def body(carry, tri):
        zbuf, win = carry
        if anchor is not None:
            edge, top_left, zpl, valid, idx = tri
            e = jnp.stack([eval_plane(edge[k, 0], edge[k, 1], edge[k, 2])
                           for k in range(3)])
            zp = eval_plane(zpl[0], zpl[1], zpl[2])
        else:
            edge, top_left, z, inv_area, valid, idx = tri
            e = edge[:, 0, None, None, None] * sx + \
                edge[:, 1, None, None, None] * sy + \
                edge[:, 2, None, None, None]
        cov_edges = jnp.where(top_left[:, None, None, None], e >= 0.0, e > 0.0)
        cov = cov_edges[0] & cov_edges[1] & cov_edges[2]
        if anchor is None:
            lam0 = e[1] * inv_area
            lam1 = e[2] * inv_area
            lam2 = e[0] * inv_area
            zp = lam0 * z[0] + lam1 * z[1] + lam2 * z[2]
        # Metal clip volume: 0 <= z <= w -> NDC z in [0, 1].
        mask = cov & valid & (zp >= 0.0) & (zp <= 1.0) & (zp <= zbuf)
        zbuf = jnp.where(mask, zp, zbuf)
        win = jnp.where(mask, idx, win)
        return (zbuf, win), None

    n = setup.valid.shape[0]
    shape = (len(sample_positions), height, width)
    init = (
        jnp.ones(shape, jnp.float32),            # clear depth 1.0
        jnp.full(shape, -1, jnp.int32),
    )
    if anchor is not None:
        tris = (setup.edge, setup.top_left, scalar_planes(setup, setup.z),
                setup.valid, jnp.arange(n, dtype=jnp.int32))
    else:
        tris = (setup.edge, setup.top_left, setup.z, setup.inv_area,
                setup.valid, jnp.arange(n, dtype=jnp.int32))
    (zbuf, win), _ = jax.lax.scan(body, init, tris)
    return zbuf, win


def interpolate_gbuffer(setup: TriangleSetup, winner, width, height,
                        sample_positions, vattrs,
                        mat_kind, mat_color, tex_id, depth,
                        normal_map_id=None) -> GBuffer:
    """Perspective-correct attribute interpolation for the visible triangle.

    vattrs: per-triangle vertex attributes [T, 3, 8] (world xyz | uv |
    normal xyz). Gathers the winning triangle's data per sample and
    applies the 1/w weighting (Metal [[stage_in]] interpolation).

    Samples are processed sequentially (lax.map) so peak memory stays at
    one [H, W] sample's worth of gather temporaries — at 1080p x 4 MSAA the
    all-samples-at-once formulation overflows HBM.
    """
    attrs_t = vattrs                                         # [T, 3, 8]

    def one_sample(args):
        win_s, off = args
        ys = jnp.arange(height, dtype=jnp.float32)
        xs = jnp.arange(width, dtype=jnp.float32)
        py, px = jnp.meshgrid(ys, xs, indexing="ij")
        sx = px + off[0]
        sy = py + off[1]

        t = jnp.maximum(win_s, 0)
        edge = setup.edge[t]        # [H,W,3,3]
        inv_area = setup.inv_area[t]
        inv_w = setup.inv_w[t]      # [H,W,3]

        e = (edge[..., 0] * sx[..., None] + edge[..., 1] * sy[..., None]
             + edge[..., 2])        # [H,W,3]
        lam = jnp.stack([e[..., 1], e[..., 2], e[..., 0]], axis=-1) * \
            inv_area[..., None]
        wgt = lam * inv_w
        denom = jnp.sum(wgt, axis=-1, keepdims=True)
        wgt = wgt / jnp.where(denom == 0.0, 1.0, denom)

        g = attrs_t[t]                                       # [H,W,3,8]
        return jnp.sum(g * wgt[..., None], axis=-2)          # [H,W,8]

    offs = jnp.asarray(sample_positions, jnp.float32)        # [S, 2]
    interp = jax.lax.map(one_sample, (winner, offs))         # [S,H,W,8]

    covered = winner >= 0
    t = jnp.maximum(winner, 0)
    if normal_map_id is None:
        normal_map_id = jnp.full_like(mat_kind, -1)
    return GBuffer(
        world=interp[..., 0:3],
        normal=interp[..., 5:8],
        uv=interp[..., 3:5],
        depth=depth,
        mat_kind=jnp.where(covered, mat_kind[t], -1),
        mat_color=mat_color[t],
        tex_id=jnp.where(covered, tex_id[t], -1),
        normal_map_id=jnp.where(covered, normal_map_id[t], -1),
        covered=covered,
    )


def rasterize_depth_brute_force(setup: TriangleSetup, width, height,
                                anchor=None):
    """Depth-only pass (shadow map): single center sample, clear depth 1.0
    (createShadowPassDescriptor, mtl_engine.mm:623-634)."""
    depth, _ = rasterize_brute_force(setup, width, height, ((0.5, 0.5),),
                                     anchor=anchor)
    return depth[0]
