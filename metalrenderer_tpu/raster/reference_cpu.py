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

from .geometry import TriangleSetup
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


def rasterize_brute_force(setup: TriangleSetup, width, height,
                          sample_positions):
    """Visibility: returns (depth f32[S,H,W], winner i32[S,H,W]; -1 = none)."""
    sx, sy = _sample_grid(width, height, sample_positions)

    def body(carry, tri):
        zbuf, win = carry
        edge, top_left, z, inv_area, valid, idx = tri
        e = edge[:, 0, None, None, None] * sx + \
            edge[:, 1, None, None, None] * sy + edge[:, 2, None, None, None]
        cov_edges = jnp.where(top_left[:, None, None, None], e >= 0.0, e > 0.0)
        cov = cov_edges[0] & cov_edges[1] & cov_edges[2]
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
    init = (
        jnp.ones_like(sx),                       # clear depth 1.0
        jnp.full(sx.shape, -1, jnp.int32),
    )
    tris = (setup.edge, setup.top_left, setup.z, setup.inv_area, setup.valid,
            jnp.arange(n, dtype=jnp.int32))
    (zbuf, win), _ = jax.lax.scan(body, init, tris)
    return zbuf, win


def interpolate_gbuffer(setup: TriangleSetup, winner, width, height,
                        sample_positions, world, uvs, normals,
                        mat_kind, mat_color, tex_id, depth,
                        normal_map_id=None) -> GBuffer:
    """Perspective-correct attribute interpolation for the visible triangle.

    world/uvs/normals: per-vertex [V, D] with V = 3*T (triangle soup).
    Gathers the winning triangle's data per sample and applies the 1/w
    weighting (Metal [[stage_in]] interpolation).

    Samples are processed sequentially (lax.map) so peak memory stays at
    one [H, W] sample's worth of gather temporaries — at 1080p x 4 MSAA the
    all-samples-at-once formulation overflows HBM.
    """
    attrs = jnp.concatenate([world, uvs, normals], axis=-1)  # [V, 8]
    attrs_t = attrs.reshape(-1, 3, attrs.shape[-1])          # [T, 3, 8]

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


def rasterize_depth_brute_force(setup: TriangleSetup, width, height):
    """Depth-only pass (shadow map): single center sample, clear depth 1.0
    (createShadowPassDescriptor, mtl_engine.mm:623-634)."""
    depth, _ = rasterize_brute_force(setup, width, height, ((0.5, 0.5),))
    return depth[0]
