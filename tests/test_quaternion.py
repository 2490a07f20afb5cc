"""Quaternion suite vs the reference's AAPLMathUtilities.h:190-266
formulas, and the PoseCamera / camera-path features built on it."""
import numpy as np
import jax.numpy as jnp
import pytest

import metalrenderer_tpu as mr
from metalrenderer_tpu.engine import audio_app
from metalrenderer_tpu.engine.renderer import render_camera_path
from metalrenderer_tpu.math import quaternion as q
from metalrenderer_tpu.math import transforms
from metalrenderer_tpu.scene.camera import OrbitCamera, PoseCamera

RNG = np.random.default_rng(7)


def rand_axis_angle():
    ax = RNG.normal(size=3)
    ax /= np.linalg.norm(ax)
    return jnp.asarray(ax, jnp.float32), float(RNG.uniform(-3, 3))


def test_axis_angle_matches_rotation_matrix():
    for _ in range(10):
        ax, ang = rand_axis_angle()
        m_q = q.to_matrix4x4(q.from_axis_angle(ax, ang))
        m_r = transforms.rotation(ang, ax)
        np.testing.assert_allclose(np.asarray(m_q), np.asarray(m_r),
                                   atol=1e-5)


def test_multiply_composes_like_matrices():
    a_ax, a_ang = rand_axis_angle()
    b_ax, b_ang = rand_axis_angle()
    qa, qb = q.from_axis_angle(a_ax, a_ang), q.from_axis_angle(b_ax, b_ang)
    m_comp = q.to_matrix3x3(q.multiply(qa, qb))
    m_ref = q.to_matrix3x3(qa) @ q.to_matrix3x3(qb)
    np.testing.assert_allclose(np.asarray(m_comp), np.asarray(m_ref),
                               atol=1e-5)


def test_rotate_vector_matches_matrix():
    ax, ang = rand_axis_angle()
    qq = q.from_axis_angle(ax, ang)
    v = jnp.asarray(RNG.normal(size=3), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(q.rotate_vector(qq, v)),
        np.asarray(q.to_matrix3x3(qq) @ v), atol=1e-5)


def test_from_matrix_roundtrip():
    for _ in range(20):
        ax, ang = rand_axis_angle()
        qq = q.from_axis_angle(ax, ang)
        q2 = q.from_matrix3x3(q.to_matrix3x3(qq))
        # q and -q are the same rotation.
        d = min(float(jnp.abs(q2 - qq).max()), float(jnp.abs(q2 + qq).max()))
        assert d < 1e-5


def test_inverse_and_conjugate():
    ax, ang = rand_axis_angle()
    qq = q.from_axis_angle(ax, ang)
    ident = q.multiply(qq, q.inverse(qq))
    np.testing.assert_allclose(np.asarray(ident), np.asarray(q.identity()),
                               atol=1e-5)


def test_slerp_endpoints_and_midpoint():
    q0 = q.identity()
    q1 = q.from_axis_angle(jnp.asarray([0.0, 1.0, 0.0]), np.pi / 2)
    np.testing.assert_allclose(np.asarray(q.slerp(q0, q1, 0.0)),
                               np.asarray(q0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(q.slerp(q0, q1, 1.0)),
                               np.asarray(q1), atol=1e-6)
    mid = q.slerp(q0, q1, 0.5)
    expect = q.from_axis_angle(jnp.asarray([0.0, 1.0, 0.0]), np.pi / 4)
    np.testing.assert_allclose(np.asarray(mid), np.asarray(expect),
                               atol=1e-6)
    assert abs(float(q.angle(mid)) - np.pi / 4) < 1e-5


def test_pose_camera_matches_orbit():
    cam = OrbitCamera(radius=5.0, theta=2.5, phi=1.2, aspect=4 / 3)
    pc = cam.pose()
    np.testing.assert_allclose(np.asarray(pc.view_matrix()),
                               np.asarray(cam.view_matrix()), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pc.projection_matrix()),
                               np.asarray(cam.projection_matrix()),
                               atol=1e-6)


def test_pose_slerp_endpoints():
    a = OrbitCamera(radius=5.0, theta=2.5, phi=1.2, aspect=1.0).pose()
    b = OrbitCamera(radius=3.5, theta=3.2, phi=1.4, aspect=1.0).pose()
    np.testing.assert_allclose(np.asarray(a.slerp(b, 0.0).view_matrix()),
                               np.asarray(a.view_matrix()), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.slerp(b, 1.0).view_matrix()),
                               np.asarray(b.view_matrix()), atol=1e-4)


def test_render_camera_path_endpoints():
    cfg = mr.RenderConfig(width=64, height=48, msaa=1, shadow_map_size=64)
    scene = audio_app.build_scene()
    lighting = mr.Lighting.default()
    a = OrbitCamera(radius=5.0, theta=2.5, phi=1.2, aspect=64 / 48)
    b = OrbitCamera(radius=4.0, theta=3.0, phi=1.35, aspect=64 / 48)
    frames = render_camera_path(scene, lighting, [a, b],
                                frames_per_segment=2, config=cfg,
                                backend="reference")
    assert frames.shape == (3, 48, 64, 4)
    fb_a, _ = mr.render_frame(scene, a.pose(), lighting, cfg,
                              backend="reference")
    fb_b, _ = mr.render_frame(scene, b.pose(), lighting, cfg,
                              backend="reference")
    np.testing.assert_allclose(np.asarray(frames[0]), np.asarray(fb_a),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(frames[-1]), np.asarray(fb_b),
                               atol=1e-4)


def test_render_camera_path_needs_two_poses():
    cfg = mr.RenderConfig(width=64, height=48, msaa=1)
    with pytest.raises(ValueError):
        render_camera_path(audio_app.build_scene(), mr.Lighting.default(),
                           [OrbitCamera()], config=cfg)
