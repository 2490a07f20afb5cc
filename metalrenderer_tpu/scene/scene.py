"""Scene graph: instances + bake to packed render buffers.

The reference encodes three draw calls per frame with per-draw uniform
buffers (encodeMainCube/encodeLightCube/encodePlane, mtl_engine.mm:821-877).
Here a scene is a static tuple of instances; ``bake`` runs the whole vertex
stage for every instance at trace time (one batched matmul per instance —
MXU work) and concatenates into flat triangle buffers consumed by the
rasterizer. Everything stays on device inside one XLA program.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..math import transforms
from ..utils.pytree import pytree_dataclass, static_field
from .materials import Material
from .mesh import Mesh


@pytree_dataclass
class Instance:
    """One drawable: mesh + model transform + material + flags.

    ``use_displacement`` mirrors the audio vertex displacement input of
    vertexBP (BlinnPhong.metal:23: position.xyz * (1 + displacement)); the
    reference enables it for the cube and pins 0 for the plane
    (mtl_engine.mm:868-869).
    """

    mesh: Mesh = None
    model_matrix: jnp.ndarray = None       # f32[4,4]
    material: Material = None
    cast_shadow: bool = static_field(default=False)
    use_displacement: bool = static_field(default=False)


@pytree_dataclass
class Scene:
    instances: tuple = ()
    # Tuple of texture mip pyramids; each pyramid is a tuple of f32[H,W,4].
    textures: tuple = ()

    @property
    def num_triangles(self):
        return sum(i.mesh.num_triangles for i in self.instances)


@pytree_dataclass
class PackedGeometry:
    """Flat world-space triangle buffers after the vertex stage.

    ``clip`` is produced per render pass (camera vs light) by
    :func:`project`; world-space attributes are pass-independent.
    """

    world: jnp.ndarray      # f32[V, 3] world-space positions
    uvs: jnp.ndarray        # f32[V, 2]
    normals: jnp.ndarray    # f32[V, 3] world-space, normalized per vertex
    mat_kind: jnp.ndarray   # i32[T] material kind per triangle
    mat_color: jnp.ndarray  # f32[T, 3]
    tex_id: jnp.ndarray     # i32[T] texture index (-1 = none)
    normal_map_id: jnp.ndarray  # i32[T] normal-map index (-1 = none)
    cast_shadow: jnp.ndarray  # bool[T]

    @property
    def num_vertices(self):
        return self.world.shape[0]

    @property
    def num_triangles(self):
        return self.mat_kind.shape[0]


def bake(scene: Scene, displacement=0.0) -> PackedGeometry:
    """Run the world-space part of the vertex stage for every instance.

    Mirrors vertexBP (BlinnPhong.metal:14-38): audio displacement scaling of
    object-space positions, model transform, and normal transform by the
    model matrix's upper-left 3x3 (the reference does NOT use an
    inverse-transpose; BlinnPhong.metal:21) with per-vertex normalization.
    """
    displacement = jnp.asarray(displacement, jnp.float32)
    worlds, uvs, nrms = [], [], []
    kinds, colors, texids, nmids, casts = [], [], [], [], []
    for inst in scene.instances:
        mesh = inst.mesh
        scale = jnp.where(inst.use_displacement, 1.0 + displacement, 1.0)
        pos = mesh.positions * scale
        m = inst.model_matrix
        world = transforms.transform_points(m, pos)[:, :3]
        nmat = transforms.upper_left_3x3(m)
        nrm = transforms.normalize(transforms.transform_dirs(nmat, mesh.normals))
        t = mesh.num_triangles
        worlds.append(world)
        uvs.append(mesh.uvs)
        nrms.append(nrm)
        kinds.append(jnp.full((t,), inst.material.kind, jnp.int32))
        colors.append(jnp.broadcast_to(inst.material.color, (t, 3)))
        texids.append(jnp.full((t,), inst.material.texture_id, jnp.int32))
        nmids.append(jnp.full((t,), inst.material.normal_map_id, jnp.int32))
        casts.append(jnp.full((t,), inst.cast_shadow, jnp.bool_))
    return PackedGeometry(
        world=jnp.concatenate(worlds),
        uvs=jnp.concatenate(uvs),
        normals=jnp.concatenate(nrms),
        mat_kind=jnp.concatenate(kinds),
        mat_color=jnp.concatenate(colors),
        tex_id=jnp.concatenate(texids),
        normal_map_id=jnp.concatenate(nmids),
        cast_shadow=jnp.concatenate(casts),
    )


def project(world_positions, view, proj):
    """Camera part of the vertex stage: clip = P @ V @ world (BlinnPhong.
    metal:27). One fused matmul over all vertices (MXU-friendly)."""
    vp = jnp.dot(proj, view, precision="highest")
    return transforms.transform_points(vp, world_positions)
