"""Quaternion suite — TPU-native counterpart of the reference's quaternion
library (AAPLMathUtilities.h:190-266). Quaternions are stored as
``jnp.ndarray[..., 4]`` with layout ``(x, y, z, w)`` (imaginary-first, matching
the reference's ``vector_float4`` convention: w + xi + yj + zk).

All functions are pure, jit-friendly, and broadcast over leading axes.
"""
from __future__ import annotations

import jax.numpy as jnp


def identity(dtype=jnp.float32):
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def from_axis_angle(axis, radians):
    """quaternion(radians, axis) — AAPLMathUtilities.h:203."""
    axis = jnp.asarray(axis, jnp.float32)
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    half = jnp.asarray(radians, jnp.float32) * 0.5
    s = jnp.sin(half)
    return jnp.concatenate(
        [axis * s[..., None] if jnp.ndim(half) else axis * s,
         jnp.cos(half)[..., None] if jnp.ndim(half) else jnp.cos(half)[None]],
        axis=-1,
    )


def from_euler(euler):
    """quaternion_from_euler (AAPLMathUtilities.h:231): XYZ intrinsic order."""
    euler = jnp.asarray(euler, jnp.float32)
    hx, hy, hz = euler[..., 0] * 0.5, euler[..., 1] * 0.5, euler[..., 2] * 0.5
    cx, sx = jnp.cos(hx), jnp.sin(hx)
    cy, sy = jnp.cos(hy), jnp.sin(hy)
    cz, sz = jnp.cos(hz), jnp.sin(hz)
    return jnp.stack(
        [
            sx * cy * cz - cx * sy * sz,
            cx * sy * cz + sx * cy * sz,
            cx * cy * sz - sx * sy * cz,
            cx * cy * cz + sx * sy * sz,
        ],
        axis=-1,
    )


def length(q):
    return jnp.linalg.norm(q, axis=-1)


def normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def conjugate(q):
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], q.dtype)


def inverse(q):
    return conjugate(q) / jnp.sum(q * q, axis=-1, keepdims=True)


def multiply(q0, q1):
    """Hamilton product q0*q1 (quaternion_multiply)."""
    x0, y0, z0, w0 = q0[..., 0], q0[..., 1], q0[..., 2], q0[..., 3]
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    return jnp.stack(
        [
            w0 * x1 + x0 * w1 + y0 * z1 - z0 * y1,
            w0 * y1 - x0 * z1 + y0 * w1 + z0 * x1,
            w0 * z1 + x0 * y1 - y0 * x1 + z0 * w1,
            w0 * w1 - x0 * x1 - y0 * y1 - z0 * z1,
        ],
        axis=-1,
    )


def rotate_vector(q, v):
    """quaternion_rotate_vector: v' = q v q*."""
    qv = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def axis(q):
    """Rotation axis of a unit quaternion (quaternion_axis)."""
    s = jnp.sqrt(jnp.maximum(1.0 - q[..., 3:4] ** 2, 1e-20))
    return q[..., :3] / s


def angle(q):
    """Rotation angle of a unit quaternion (quaternion_angle)."""
    return 2.0 * jnp.arccos(jnp.clip(q[..., 3], -1.0, 1.0))


def slerp(q0, q1, t):
    """Spherical linear interpolation (quaternion_slerp)."""
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    use_lerp = sin_theta < 1e-5
    w0 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    w1 = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    return normalize(w0 * q0 + w1 * q1)


def to_matrix3x3(q):
    """matrix3x3_from_quaternion (AAPLMathUtilities.h:54)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    rows = jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
    return rows


def to_matrix4x4(q):
    """matrix4x4_from_quaternion (AAPLMathUtilities.h:99)."""
    m3 = to_matrix3x3(q)
    batch = m3.shape[:-2]
    m = jnp.zeros(batch + (4, 4), m3.dtype)
    m = m.at[..., :3, :3].set(m3)
    m = m.at[..., 3, 3].set(1.0)
    return m


def from_matrix3x3(m):
    """quaternion_from_matrix3x3 — Shepperd's method, branch-free.

    Computes all four major-component candidates (w/x/y/z) with
    S_k = 2*sqrt(score_k) and picks the one with the largest score, which
    keeps the divisor well away from zero for any proper rotation.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    scores = jnp.stack([1 + tr, 1 + m00 - m11 - m22, 1 - m00 + m11 - m22,
                        1 - m00 - m11 + m22], axis=-1)
    s = 2.0 * jnp.sqrt(jnp.maximum(scores, 1e-20))  # [..., 4]
    s0, s1, s2, s3 = s[..., 0], s[..., 1], s[..., 2], s[..., 3]
    # Candidate quaternions, one per major component.
    cand = jnp.stack([
        jnp.stack([(m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0,
                   0.25 * s0], axis=-1),
        jnp.stack([0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1,
                   (m21 - m12) / s1], axis=-1),
        jnp.stack([(m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2,
                   (m02 - m20) / s2], axis=-1),
        jnp.stack([(m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3,
                   (m10 - m01) / s3], axis=-1),
    ], axis=-2)                                      # [..., 4 cand, 4 comp]
    best = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(
        cand, best[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    return normalize(q)
