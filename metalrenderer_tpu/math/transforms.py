"""Matrix/transform library reproducing the reference's exact conventions.

The reference (JellyBoonz/MetalRenderer) uses Apple's AAPLMathUtilities plus a
hand-rolled perspective in the engine header. All matrices there are stored
column-major (simd) but *specified* via ``matrix_make_rows`` — i.e. written
down the way you'd write a matrix that multiplies column vectors on the right
(``clip = P @ V @ M @ pos``). We store matrices as plain row-major
``jnp.ndarray[4,4]`` acting on column vectors, so a matrix written here with
``jnp.array([[...row0...], ...])`` is numerically identical to the reference's
``matrix_make_rows(...)`` result applied to the same vector.

Conventions (reference citations):
  * Right-handed view space, camera looks down -Z.
  * Perspective: Metal clip convention, NDC z in [0, 1]
    (AudioApp/Engine/mtl_engine.hpp:86-95 ``matrix_perspective_right_hand``).
  * Ortho RH: z in [0, 1] (AAPLMathUtilities.cpp:349-355).
  * look_at RH: AAPLMathUtilities.cpp:317-329 / Camera.cpp:52-71 (identical).
  * CCW front faces, back culling (mtl_engine.mm:829-830).
"""
from __future__ import annotations

import jax.numpy as jnp


def perspective_rh(fovy_radians, aspect, near, far, dtype=jnp.float32):
    """Right-handed perspective, Metal z∈[0,1] clip convention.

    Mirrors ``MtlEngine::matrix_perspective_right_hand``
    (AudioApp/Engine/mtl_engine.hpp:86-95)::

        ys = 1 / tan(fovy/2);  xs = ys / aspect;  zs = far / (near - far)
        rows: [xs 0 0 0; 0 ys 0 0; 0 0 zs near*zs; 0 0 -1 0]
    """
    fovy_radians = jnp.asarray(fovy_radians, dtype)
    ys = 1.0 / jnp.tan(fovy_radians * 0.5)
    xs = ys / aspect
    zs = far / (near - far)
    z = jnp.zeros((), dtype)
    o = jnp.ones((), dtype)
    return jnp.stack([
        jnp.stack([xs, z, z, z]),
        jnp.stack([z, ys, z, z]),
        jnp.stack([z, z, zs * o, near * zs * o]),
        jnp.stack([z, z, -o, z]),
    ]).astype(dtype)


def ortho_rh(left, right, bottom, top, near, far, dtype=jnp.float32):
    """Right-handed orthographic projection, z∈[0,1].

    Mirrors ``matrix_ortho_right_hand`` (AAPLMathUtilities.cpp:349-355).
    """
    return jnp.array(
        [
            [2.0 / (right - left), 0, 0, (left + right) / (left - right)],
            [0, 2.0 / (top - bottom), 0, (top + bottom) / (bottom - top)],
            [0, 0, -1.0 / (far - near), near / (near - far)],
            [0, 0, 0, 1.0],
        ],
        dtype=dtype,
    )


def normalize(v, eps=0.0):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    if eps:
        n = jnp.maximum(n, eps)
    return v / n


def look_at_rh(eye, target, up):
    """Right-handed look-at view matrix.

    Mirrors ``matrix_look_at_right_hand`` (AAPLMathUtilities.cpp:317-329),
    which is numerically identical to ``Camera::lookAt`` (Camera.cpp:52-71)::

        z = normalize(eye - target); x = normalize(cross(up, z)); y = cross(z, x)
        rows: [x -dot(x,eye); y -dot(y,eye); z -dot(z,eye); 0 0 0 1]
    """
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    z = normalize(eye - target)
    x = normalize(jnp.cross(up, z))
    y = jnp.cross(z, x)
    t = jnp.stack([-jnp.dot(x, eye), -jnp.dot(y, eye), -jnp.dot(z, eye)])
    m = jnp.concatenate(
        [
            jnp.concatenate([x, t[0:1]]),
            jnp.concatenate([y, t[1:2]]),
            jnp.concatenate([z, t[2:3]]),
            jnp.array([0.0, 0.0, 0.0, 1.0]),
        ]
    ).reshape(4, 4)
    return m


def translation(tx, ty, tz, dtype=jnp.float32):
    """Mirrors ``matrix4x4_translation`` (AAPLMathUtilities.cpp:271-276)."""
    t = jnp.stack([
        jnp.asarray(tx, dtype), jnp.asarray(ty, dtype), jnp.asarray(tz, dtype)
    ])
    m = jnp.eye(4, dtype=dtype)
    return m.at[:3, 3].set(t)


def scale(sx, sy, sz, dtype=jnp.float32):
    """Mirrors ``matrix4x4_scale`` (AAPLMathUtilities.cpp:257-262)."""
    return jnp.diag(jnp.stack([
        jnp.asarray(sx, dtype), jnp.asarray(sy, dtype),
        jnp.asarray(sz, dtype), jnp.ones((), dtype)]))


def rotation(radians, axis):
    """Axis-angle rotation. Mirrors ``matrix4x4_rotation``
    (AAPLMathUtilities.cpp:233-244)."""
    axis = normalize(jnp.asarray(axis, jnp.float32))
    x, y, z = axis[0], axis[1], axis[2]
    ct = jnp.cos(radians)
    st = jnp.sin(radians)
    ci = 1.0 - ct
    rows = jnp.stack([
        jnp.stack([ct + x * x * ci, x * y * ci - z * st, x * z * ci + y * st, jnp.zeros(())]),
        jnp.stack([y * x * ci + z * st, ct + y * y * ci, y * z * ci - x * st, jnp.zeros(())]),
        jnp.stack([z * x * ci - y * st, z * y * ci + x * st, ct + z * z * ci, jnp.zeros(())]),
        jnp.array([0.0, 0.0, 0.0, 1.0]),
    ])
    return rows


def upper_left_3x3(m):
    """First 3 columns/rows of a 4x4 model matrix — the reference's "normal
    matrix" (BlinnPhong.metal:21 builds float3x3 from modelMatrix columns;
    NOT an inverse-transpose)."""
    return m[:3, :3]


def inverse_transpose_3x3(m3):
    """``matrix_inverse_transpose`` equivalent (AAPLMathUtilities.cpp:197ff),
    provided for correct normal transforms under non-uniform scale."""
    return jnp.linalg.inv(m3).T


def transform_points(m, pts):
    """Apply a 4x4 to an [N,4] (or [N,3] homogenized) point array → [N,4]."""
    pts = jnp.asarray(pts)
    if pts.shape[-1] == 3:
        pts = jnp.concatenate(
            [pts, jnp.ones(pts.shape[:-1] + (1,), pts.dtype)], axis=-1
        )
    # Full f32 precision: geometry transforms feed edge equations whose
    # signs decide pixel coverage; bf16 MXU passes are not acceptable here.
    return jnp.dot(pts, m.T, precision="highest")


def transform_dirs(m3, dirs):
    """Apply a 3x3 to an [N,3] direction array."""
    return jnp.dot(dirs, m3.T, precision="highest")
