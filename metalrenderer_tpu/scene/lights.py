"""Light types.

The reference has one point light (LightingData, VertexData.hpp:20-28) whose
view for shadow mapping is an ortho projection looking at the main cube with
an adaptive up vector (mtl_engine.mm:668-690). Both point and directional
lights are first-class here (BASELINE config 4 adds a directional light).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import ShadowConfig
from ..math import transforms
from ..utils.pytree import pytree_dataclass, static_field


@pytree_dataclass
class PointLight:
    position: jnp.ndarray = (0.0, 2.0, 0.0)   # mtl_engine.hpp:154 default
    color: jnp.ndarray = (1.0, 1.0, 1.0)      # mtl_engine.hpp:156
    intensity: jnp.ndarray = 1.0


@pytree_dataclass
class DirectionalLight:
    direction: jnp.ndarray = (0.0, -1.0, -0.3)
    color: jnp.ndarray = (1.0, 1.0, 1.0)
    intensity: jnp.ndarray = 1.0


@pytree_dataclass
class Lighting:
    """Global lighting parameters (LightingData, VertexData.hpp:20-28;
    values set at mtl_engine.mm:755-758: ambient 0.1, shininess 32)."""

    light: PointLight = None
    ambient_intensity: jnp.ndarray = 0.1
    shininess: jnp.ndarray = 32.0

    @staticmethod
    def default():
        return Lighting(light=PointLight(
            position=jnp.array([0.0, 2.0, 0.0], jnp.float32),
            color=jnp.array([1.0, 1.0, 1.0], jnp.float32),
            intensity=jnp.asarray(1.0, jnp.float32),
        ))


def light_anchor_position(light, shadow_target,
                          shadow: ShadowConfig = ShadowConfig()):
    """World position anchoring the shadow pass's light view.

    Point lights use their own position (mtl_engine.mm:668). A directional
    light is at infinity; its shadow camera sits along -direction from the
    target at mid-ortho-depth, so casters near the target land inside the
    [near, far] depth range of the ortho volume.
    """
    shadow_target = jnp.asarray(shadow_target, jnp.float32)
    if isinstance(light, DirectionalLight):
        d = transforms.normalize(jnp.asarray(light.direction, jnp.float32))
        standoff = 0.5 * (shadow.near + shadow.far)
        return shadow_target - d * standoff
    return jnp.asarray(light.position, jnp.float32)


def adaptive_up(forward):
    """Pick a world-up axis from the smallest |forward| component, exactly
    reproducing the if-chain at mtl_engine.mm:672-683."""
    af = jnp.abs(forward)
    y_up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    x_up = jnp.array([1.0, 0.0, 0.0], jnp.float32)
    z_up = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    cond_y = (af[1] < af[0]) & (af[1] < af[2])
    cond_x = af[0] < af[2]
    return jnp.where(cond_y, y_up, jnp.where(cond_x, x_up, z_up))


def light_view_matrix(light_pos, look_target):
    """Light view used by the shadow pass (mtl_engine.mm:668-690):
    forward = normalize(target - pos); adaptive world-up; right/up rebuilt;
    then a RH look-at."""
    light_pos = jnp.asarray(light_pos, jnp.float32)
    look_target = jnp.asarray(look_target, jnp.float32)
    forward = transforms.normalize(look_target - light_pos)
    world_up = adaptive_up(forward)
    right = transforms.normalize(jnp.cross(forward, world_up))
    up = jnp.cross(right, forward)
    return transforms.look_at_rh(light_pos, look_target, up)


def light_projection_matrix(shadow: ShadowConfig = ShadowConfig()):
    """Ortho light projection (mtl_engine.mm:645-646)."""
    return transforms.ortho_rh(
        shadow.left, shadow.right, shadow.bottom, shadow.top,
        shadow.near, shadow.far,
    )
