"""Mesh data and procedural geometry builders.

TPU-native counterpart of the reference's hard-coded vertex arrays
(mtl_engine.mm:228-283 cube, :285-296 plane, :298-350 light cube,
:352-373 legacy triangle/square). Meshes are triangle soups (non-indexed,
matching the reference's drawPrimitives usage) stored as struct-of-arrays:
positions [N,3], uv [N,2], normal [N,3] with N = 3 * num_triangles.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass


@pytree_dataclass
class Mesh:
    """Triangle-soup mesh. Layout mirrors VertexData.hpp:6-11
    (float4 position / float2 uv / float3 normal) minus the constant w=1."""

    positions: jnp.ndarray  # f32[N, 3]
    uvs: jnp.ndarray        # f32[N, 2]
    normals: jnp.ndarray    # f32[N, 3]

    @property
    def num_vertices(self):
        return self.positions.shape[0]

    @property
    def num_triangles(self):
        return self.positions.shape[0] // 3


def _mesh_from_list(rows):
    """rows: list of (px,py,pz, u,v, nx,ny,nz)."""
    a = np.asarray(rows, np.float32)
    return Mesh(
        positions=jnp.asarray(a[:, 0:3]),
        uvs=jnp.asarray(a[:, 3:5]),
        normals=jnp.asarray(a[:, 5:8]),
    )


def cube() -> Mesh:
    """Unit cube (side 1, centered), 36 vertices, CCW winding, per-face
    normals and UVs — exact vertex order of MtlEngine::createCube
    (mtl_engine.mm:228-283). The light cube (mtl_engine.mm:298-350) is
    byte-identical to this."""
    f = [
        # Front face (+Z)
        (-0.5, -0.5, 0.5, 0.0, 0.0, 0.0, 0.0, 1.0),
        (0.5, -0.5, 0.5, 1.0, 0.0, 0.0, 0.0, 1.0),
        (0.5, 0.5, 0.5, 1.0, 1.0, 0.0, 0.0, 1.0),
        (0.5, 0.5, 0.5, 1.0, 1.0, 0.0, 0.0, 1.0),
        (-0.5, 0.5, 0.5, 0.0, 1.0, 0.0, 0.0, 1.0),
        (-0.5, -0.5, 0.5, 0.0, 0.0, 0.0, 0.0, 1.0),
        # Back face (-Z)
        (0.5, -0.5, -0.5, 0.0, 0.0, 0.0, 0.0, -1.0),
        (-0.5, -0.5, -0.5, 1.0, 0.0, 0.0, 0.0, -1.0),
        (-0.5, 0.5, -0.5, 1.0, 1.0, 0.0, 0.0, -1.0),
        (-0.5, 0.5, -0.5, 1.0, 1.0, 0.0, 0.0, -1.0),
        (0.5, 0.5, -0.5, 0.0, 1.0, 0.0, 0.0, -1.0),
        (0.5, -0.5, -0.5, 0.0, 0.0, 0.0, 0.0, -1.0),
        # Top face (+Y)
        (-0.5, 0.5, 0.5, 0.0, 0.0, 0.0, 1.0, 0.0),
        (0.5, 0.5, 0.5, 1.0, 0.0, 0.0, 1.0, 0.0),
        (0.5, 0.5, -0.5, 1.0, 1.0, 0.0, 1.0, 0.0),
        (0.5, 0.5, -0.5, 1.0, 1.0, 0.0, 1.0, 0.0),
        (-0.5, 0.5, -0.5, 0.0, 1.0, 0.0, 1.0, 0.0),
        (-0.5, 0.5, 0.5, 0.0, 0.0, 0.0, 1.0, 0.0),
        # Bottom face (-Y)
        (-0.5, -0.5, -0.5, 0.0, 0.0, 0.0, -1.0, 0.0),
        (0.5, -0.5, -0.5, 1.0, 0.0, 0.0, -1.0, 0.0),
        (0.5, -0.5, 0.5, 1.0, 1.0, 0.0, -1.0, 0.0),
        (0.5, -0.5, 0.5, 1.0, 1.0, 0.0, -1.0, 0.0),
        (-0.5, -0.5, 0.5, 0.0, 1.0, 0.0, -1.0, 0.0),
        (-0.5, -0.5, -0.5, 0.0, 0.0, 0.0, -1.0, 0.0),
        # Left face (-X)
        (-0.5, -0.5, -0.5, 0.0, 0.0, -1.0, 0.0, 0.0),
        (-0.5, -0.5, 0.5, 1.0, 0.0, -1.0, 0.0, 0.0),
        (-0.5, 0.5, 0.5, 1.0, 1.0, -1.0, 0.0, 0.0),
        (-0.5, 0.5, 0.5, 1.0, 1.0, -1.0, 0.0, 0.0),
        (-0.5, 0.5, -0.5, 0.0, 1.0, -1.0, 0.0, 0.0),
        (-0.5, -0.5, -0.5, 0.0, 0.0, -1.0, 0.0, 0.0),
        # Right face (+X)
        (0.5, -0.5, 0.5, 0.0, 0.0, 1.0, 0.0, 0.0),
        (0.5, -0.5, -0.5, 1.0, 0.0, 1.0, 0.0, 0.0),
        (0.5, 0.5, -0.5, 1.0, 1.0, 1.0, 0.0, 0.0),
        (0.5, 0.5, -0.5, 1.0, 1.0, 1.0, 0.0, 0.0),
        (0.5, 0.5, 0.5, 0.0, 1.0, 1.0, 0.0, 0.0),
        (0.5, -0.5, 0.5, 0.0, 0.0, 1.0, 0.0, 0.0),
    ]
    return _mesh_from_list(f)


def plane(half_extent: float = 1.5) -> Mesh:
    """Y-up plane, 2 triangles — MtlEngine::createPlane (mtl_engine.mm:285-296)."""
    e = half_extent
    rows = [
        (-e, 0.0, e, 0.0, 0.0, 0.0, 1.0, 0.0),
        (e, 0.0, e, 1.0, 0.0, 0.0, 1.0, 0.0),
        (e, 0.0, -e, 1.0, 1.0, 0.0, 1.0, 0.0),
        (e, 0.0, -e, 1.0, 1.0, 0.0, 1.0, 0.0),
        (-e, 0.0, -e, 0.0, 1.0, 0.0, 1.0, 0.0),
        (-e, 0.0, e, 0.0, 0.0, 0.0, 1.0, 0.0),
    ]
    return _mesh_from_list(rows)


def triangle() -> Mesh:
    """Legacy tutorial triangle (mtl_engine.mm:352-360)."""
    rows = [
        (-0.5, -0.5, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0),
        (0.5, -0.5, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0),
        (0.0, 0.5, 0.0, 0.5, 1.0, 0.0, 0.0, 1.0),
    ]
    return _mesh_from_list(rows)


def square() -> Mesh:
    """Legacy tutorial square (mtl_engine.mm:362-373)."""
    rows = [
        (-0.5, -0.5, 0.5, 0.0, 0.0, 0.0, 0.0, 1.0),
        (-0.5, 0.5, 0.5, 0.0, 1.0, 0.0, 0.0, 1.0),
        (0.5, 0.5, 0.5, 1.0, 1.0, 0.0, 0.0, 1.0),
        (-0.5, -0.5, 0.5, 0.0, 0.0, 0.0, 0.0, 1.0),
        (0.5, 0.5, 0.5, 1.0, 1.0, 0.0, 0.0, 1.0),
        (0.5, -0.5, 0.5, 1.0, 0.0, 0.0, 0.0, 1.0),
    ]
    return _mesh_from_list(rows)


def uv_sphere(stacks: int = 16, slices: int = 32, radius: float = 0.5) -> Mesh:
    """UV sphere triangle soup with smooth normals and CCW winding (viewed
    from outside). New capability required by BASELINE config 2
    (multi-mesh cubes+spheres scene)."""
    verts = []
    for i in range(stacks):
        phi0 = np.pi * i / stacks
        phi1 = np.pi * (i + 1) / stacks
        for j in range(slices):
            th0 = 2 * np.pi * j / slices
            th1 = 2 * np.pi * (j + 1) / slices

            def pt(phi, th):
                n = np.array(
                    [np.sin(phi) * np.cos(th), np.cos(phi), np.sin(phi) * np.sin(th)],
                    np.float32,
                )
                p = n * radius
                uv = np.array([th / (2 * np.pi), 1.0 - phi / np.pi], np.float32)
                return p, uv, n

            p00, t00, n00 = pt(phi0, th0)
            p01, t01, n01 = pt(phi0, th1)
            p10, t10, n10 = pt(phi1, th0)
            p11, t11, n11 = pt(phi1, th1)
            # Two CCW triangles per quad (skip degenerate pole quads).
            if i > 0:
                verts += [(p00, t00, n00), (p11, t11, n11), (p01, t01, n01)]
            if i < stacks - 1:
                verts += [(p00, t00, n00), (p10, t10, n10), (p11, t11, n11)]
    pos = np.stack([v[0] for v in verts])
    uv = np.stack([v[1] for v in verts])
    nrm = np.stack([v[2] for v in verts])
    return Mesh(jnp.asarray(pos), jnp.asarray(uv), jnp.asarray(nrm))


def concatenate(meshes) -> Mesh:
    return Mesh(
        positions=jnp.concatenate([m.positions for m in meshes]),
        uvs=jnp.concatenate([m.uvs for m in meshes]),
        normals=jnp.concatenate([m.normals for m in meshes]),
    )
