"""Materials.

The reference has three fragment paths, selected per draw call
(mtl_engine.mm:821-877):
  * Blinn-Phong without shadow sampling  — fragmentBP_NoShadow
    (BlinnPhong.metal:40-58), used for the main cube.
  * Blinn-Phong with shadow-map sampling — fragmentBP
    (BlinnPhong.metal:60-97), used for the floor plane.
  * Emissive flat color                  — lightFragmentShader
    (light.metal:27-29), used for the light cube.
Plus the latent textured path from the Metal-Tutorial snapshot
(Texture.cpp + cube.metal). Here a material is data, not a pipeline:
the fused shading kernel branches on ``kind``.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass, static_field

# Material kinds (values baked per-triangle into the G-buffer).
BLINN_PHONG = 0          # lit, does not sample the shadow map
BLINN_PHONG_SHADOW = 1   # lit + shadow-map test (BlinnPhong.metal:79-96)
EMISSIVE = 2             # flat color


@pytree_dataclass
class Material:
    color: jnp.ndarray = (1.0, 1.0, 1.0)  # materialColor / lightColor
    kind: int = static_field(default=BLINN_PHONG)
    # Index into the scene's texture list; -1 = untextured (solid color).
    texture_id: int = static_field(default=-1)
    # Normal-map texture index; -1 = none (BASELINE config 4).
    normal_map_id: int = static_field(default=-1)


def cube_material():
    """Main cube: color {1.0, 0.5, 0.31} (mtl_engine.mm:823)."""
    return Material(color=jnp.array([1.0, 0.5, 0.31], jnp.float32),
                    kind=BLINN_PHONG)


def plane_material():
    """Floor plane: color {0.5, 0.7, 0.5} (mtl_engine.mm:874), receives shadow."""
    return Material(color=jnp.array([0.5, 0.7, 0.5], jnp.float32),
                    kind=BLINN_PHONG_SHADOW)


def emissive_material(color):
    return Material(color=jnp.asarray(color, jnp.float32), kind=EMISSIVE)
