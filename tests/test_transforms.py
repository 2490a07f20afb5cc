"""Unit tests for math/transforms vs hand-computed values (SURVEY.md §4a)."""
import numpy as np
import jax.numpy as jnp

from metalrenderer_tpu.math import transforms


def test_perspective_rh_matches_reference_formula():
    # mtl_engine.hpp:86-95 with fov=45deg, aspect=4/3, near=.01, far=100.
    fov = np.deg2rad(45.0)
    aspect = 4.0 / 3.0
    near, far = 0.01, 100.0
    m = np.asarray(transforms.perspective_rh(fov, aspect, near, far))
    ys = 1.0 / np.tan(fov * 0.5)
    xs = ys / aspect
    zs = far / (near - far)
    expected = np.array([
        [xs, 0, 0, 0],
        [0, ys, 0, 0],
        [0, 0, zs, near * zs],
        [0, 0, -1, 0],
    ], np.float32)
    np.testing.assert_allclose(m, expected, rtol=1e-6)


def test_perspective_maps_near_far_to_0_1():
    m = np.asarray(transforms.perspective_rh(np.deg2rad(60), 1.0, 0.1, 10.0))
    # View-space point at z=-near -> NDC z = 0; z=-far -> NDC z = 1.
    p_near = m @ np.array([0, 0, -0.1, 1.0])
    p_far = m @ np.array([0, 0, -10.0, 1.0])
    assert abs(p_near[2] / p_near[3]) < 1e-6
    assert abs(p_far[2] / p_far[3] - 1.0) < 1e-5


def test_ortho_rh_matches_reference_formula():
    # AAPLMathUtilities.cpp:349-355 with the shadow-pass bounds
    # (mtl_engine.mm:645-646): -8..8, near .1, far 15.
    m = np.asarray(transforms.ortho_rh(-8, 8, -8, 8, 0.1, 15.0))
    expected = np.array([
        [2 / 16.0, 0, 0, 0],
        [0, 2 / 16.0, 0, 0],
        [0, 0, -1 / 14.9, 0.1 / (0.1 - 15.0)],
        [0, 0, 0, 1],
    ], np.float32)
    np.testing.assert_allclose(m, expected, rtol=1e-5, atol=1e-7)
    # z=-near -> 0, z=-far -> 1.
    assert abs((m @ np.array([0, 0, -0.1, 1]))[2]) < 1e-6
    assert abs((m @ np.array([0, 0, -15.0, 1]))[2] - 1.0) < 1e-5


def test_look_at_rh_basic():
    # Eye at +Z looking at origin: view == translate(0,0,-5) with identity
    # rotation (AAPLMathUtilities.cpp:317-329).
    m = np.asarray(transforms.look_at_rh(
        jnp.array([0.0, 0.0, 5.0]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])))
    expected = np.eye(4, dtype=np.float32)
    expected[2, 3] = -5.0
    np.testing.assert_allclose(m, expected, atol=1e-6)


def test_look_at_transforms_eye_to_origin():
    eye = jnp.array([1.0, 2.0, 3.0])
    m = transforms.look_at_rh(eye, jnp.array([0.0, 1.0, -2.0]),
                              jnp.array([0.0, 1.0, 0.0]))
    p = np.asarray(m @ jnp.concatenate([eye, jnp.ones(1)]))
    np.testing.assert_allclose(p[:3], 0.0, atol=1e-6)
    # Target must land on the -Z axis (RH camera looks down -Z).
    t = np.asarray(m @ jnp.array([0.0, 1.0, -2.0, 1.0]))
    assert t[2] < 0
    np.testing.assert_allclose(t[:2], 0.0, atol=1e-6)


def test_translation_scale_compose():
    # planeModelMatrix = translate(0,-1,0) @ scale(10,1,10)
    # (mtl_engine.mm:655-656): a point (1,0,1) -> (10,-1,10).
    m = np.asarray(transforms.translation(0, -1, 0) @
                   transforms.scale(10, 1, 10))
    p = m @ np.array([1.0, 0.0, 1.0, 1.0])
    np.testing.assert_allclose(p[:3], [10.0, -1.0, 10.0], atol=1e-6)


def test_rotation_matches_axis_angle():
    m = np.asarray(transforms.rotation(np.pi / 2, jnp.array([0.0, 1.0, 0.0])))
    p = m @ np.array([1.0, 0.0, 0.0, 1.0])
    # Rotating +X by 90deg about +Y (RH) gives -Z.
    np.testing.assert_allclose(p[:3], [0.0, 0.0, -1.0], atol=1e-6)


def test_inverse_transpose_3x3():
    m3 = np.diag([2.0, 1.0, 0.5]).astype(np.float32)
    it = np.asarray(transforms.inverse_transpose_3x3(jnp.asarray(m3)))
    np.testing.assert_allclose(it, np.diag([0.5, 1.0, 2.0]), atol=1e-6)
