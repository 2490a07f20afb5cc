"""Pure-functional orbit camera.

Counterpart of Camera.{hpp,cpp}: spherical coordinates (radius/theta/phi)
around a target, phi clamped near the poles (Camera.cpp:17-21), mouse-drag
rotation (Camera.cpp:33-38), scroll dolly with a minimum radius
(Camera.cpp:41-46), and a right-handed look-at view matrix
(Camera.cpp:52-71). Interaction state lives in the (immutable) dataclass;
update functions return new cameras.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..math import transforms
from ..utils.pytree import pytree_dataclass

_PHI_EPS = 0.001           # Camera.cpp:19
_MOUSE_SENSITIVITY = 0.005  # Camera.cpp:6
_MOVEMENT_SPEED = 0.2       # Camera.cpp:6
_MIN_RADIUS = 0.5           # Camera.cpp:44


@pytree_dataclass
class OrbitCamera:
    # Defaults from Camera.cpp:3-8.
    radius: jnp.ndarray = 2.0
    theta: jnp.ndarray = 3.14
    phi: jnp.ndarray = 1.57
    target: jnp.ndarray = (0.0, 0.0, 0.0)
    fov_degrees: jnp.ndarray = 45.0
    near: jnp.ndarray = 0.01
    far: jnp.ndarray = 100.0
    aspect: jnp.ndarray = 1.0

    def _clamped_phi(self):
        return jnp.clip(jnp.asarray(self.phi, jnp.float32),
                        _PHI_EPS, jnp.pi - _PHI_EPS)

    @property
    def position(self):
        """Spherical -> Cartesian (Camera.cpp:22-27)."""
        phi = self._clamped_phi()
        theta = jnp.asarray(self.theta, jnp.float32)
        r = jnp.asarray(self.radius, jnp.float32)
        t = jnp.asarray(self.target, jnp.float32)
        return t + r * jnp.stack([
            jnp.sin(phi) * jnp.sin(theta),
            jnp.cos(phi),
            jnp.sin(phi) * jnp.cos(theta),
        ])

    @property
    def up(self):
        return jnp.array([0.0, 1.0, 0.0], jnp.float32)  # Camera.cpp:30

    def view_matrix(self):
        return transforms.look_at_rh(
            self.position, jnp.asarray(self.target, jnp.float32), self.up
        )

    def projection_matrix(self):
        """Metal z∈[0,1] RH perspective (mtl_engine.hpp:86-95, used at
        mtl_engine.mm:661-662 with fov in degrees converted to radians)."""
        fov = jnp.asarray(self.fov_degrees, jnp.float32) * (jnp.pi / 180.0)
        return transforms.perspective_rh(fov, self.aspect, self.near, self.far)

    # --- interaction (pure updates) ---------------------------------------
    def process_mouse_movement(self, x_offset, y_offset):
        """Camera.cpp:33-38: theta += dx*s, phi -= dy*s*0.5."""
        return self.replace(
            theta=self.theta + x_offset * _MOUSE_SENSITIVITY,
            phi=jnp.clip(self.phi - y_offset * _MOUSE_SENSITIVITY * 0.5,
                         _PHI_EPS, jnp.pi - _PHI_EPS),
        )

    def process_mouse_scroll(self, y_offset):
        """Camera.cpp:41-46: dolly with min radius 0.5."""
        return self.replace(
            radius=jnp.maximum(self.radius - y_offset * _MOVEMENT_SPEED,
                               _MIN_RADIUS)
        )

    def with_aspect(self, aspect):
        return self.replace(aspect=aspect)
