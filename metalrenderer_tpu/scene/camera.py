"""Pure-functional cameras.

``OrbitCamera`` is the counterpart of Camera.{hpp,cpp}: spherical
coordinates (radius/theta/phi) around a target, phi clamped near the poles
(Camera.cpp:17-21), mouse-drag rotation (Camera.cpp:33-38), scroll dolly
with a minimum radius (Camera.cpp:41-46), and a right-handed look-at view
matrix (Camera.cpp:52-71). Interaction state lives in the (immutable)
dataclass; update functions return new cameras.

``PoseCamera`` is a free camera posed by position + unit quaternion
(camera-to-world), built on the quaternion suite that mirrors the
reference's AAPLMathUtilities.h:190-266. Poses interpolate smoothly
(slerp), which is what camera flythroughs
(engine.renderer.render_camera_path) are made of.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..math import quaternion, transforms
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

    def pose(self) -> "PoseCamera":
        """This orbit pose as a free PoseCamera (quaternion orientation)."""
        return PoseCamera.from_view_matrix(
            self.view_matrix(), self.position,
            fov_degrees=self.fov_degrees, near=self.near, far=self.far,
            aspect=self.aspect)


@pytree_dataclass
class PoseCamera:
    """Free camera: world position + camera-to-world unit quaternion.

    The view matrix is the inverse rigid transform: rows are the camera
    basis vectors (world-to-camera rotation) with translation -R^T p —
    the same matrix structure look_at_rh builds (Camera.cpp:52-71), but
    parameterized so that poses compose and interpolate (quaternion
    slerp, AAPLMathUtilities.h:242).
    """

    position: jnp.ndarray = (0.0, 0.0, 2.0)
    orientation: jnp.ndarray = (0.0, 0.0, 0.0, 1.0)  # (x, y, z, w)
    fov_degrees: jnp.ndarray = 45.0
    near: jnp.ndarray = 0.01
    far: jnp.ndarray = 100.0
    aspect: jnp.ndarray = 1.0

    @staticmethod
    def from_view_matrix(view, position, **kw):
        """Recover the pose from a world-to-camera view matrix."""
        r_c2w = jnp.asarray(view, jnp.float32)[:3, :3].T
        return PoseCamera(
            position=jnp.asarray(position, jnp.float32),
            orientation=quaternion.from_matrix3x3(r_c2w), **kw)

    def view_matrix(self):
        q = quaternion.normalize(
            jnp.asarray(self.orientation, jnp.float32))
        r_w2c = quaternion.to_matrix3x3(q).T
        p = jnp.asarray(self.position, jnp.float32)
        t = -(r_w2c @ p)
        m = jnp.eye(4, dtype=jnp.float32)
        m = m.at[:3, :3].set(r_w2c)
        m = m.at[:3, 3].set(t)
        return m

    def projection_matrix(self):
        fov = jnp.asarray(self.fov_degrees, jnp.float32) * (jnp.pi / 180.0)
        return transforms.perspective_rh(fov, self.aspect, self.near,
                                         self.far)

    def slerp(self, other: "PoseCamera", t):
        """Interpolated pose: slerp on orientation, lerp on everything
        else. t=0 -> self, t=1 -> other; t may be a traced scalar."""
        t = jnp.asarray(t, jnp.float32)

        def lerp(a, b):
            return (1.0 - t) * jnp.asarray(a, jnp.float32) + \
                t * jnp.asarray(b, jnp.float32)

        return PoseCamera(
            position=lerp(self.position, other.position),
            orientation=quaternion.slerp(
                jnp.asarray(self.orientation, jnp.float32),
                jnp.asarray(other.orientation, jnp.float32), t),
            fov_degrees=lerp(self.fov_degrees, other.fov_degrees),
            near=lerp(self.near, other.near),
            far=lerp(self.far, other.far),
            aspect=lerp(self.aspect, other.aspect),
        )
