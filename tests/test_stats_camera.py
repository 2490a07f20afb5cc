"""Telemetry utilities (the ImGui panel as data) + orbit camera
interaction semantics (Camera.cpp)."""
import numpy as np
import jax.numpy as jnp

from metalrenderer_tpu.scene.camera import OrbitCamera
from metalrenderer_tpu.utils import stats


def test_spectrum_rows_window():
    spec = np.ones(513, np.float32)
    freqs, rows = stats.spectrum_rows(spec, 48000.0)
    # 20-4180 Hz at 46.875 Hz/bin -> bins 1..89 (mtl_engine.mm:902-916).
    assert freqs.min() >= 20.0 and freqs.max() <= 4180.0
    assert rows.shape[-1] == len(freqs)
    assert len(freqs) == 89


def test_display_bands_boosts():
    d = stats.display_bands(1.0, 1.0, 1.0)
    assert d == {"bass": 5.0, "mid": 0.8, "treble": 3.0}


def test_frame_clock():
    clock = stats.FrameClock()
    assert clock.tick() == 0.0       # first tick has no interval
    fps = clock.tick()
    assert fps > 0


def test_stats_to_json():
    s = stats.to_json({"a": jnp.float32(1.5)}, frame=3)
    assert '"frame": 3' in s


def test_mouse_movement_updates_angles():
    cam = OrbitCamera()
    # Camera.cpp:33-38: theta += dx*0.005; phi -= dy*0.0025.
    cam2 = cam.process_mouse_movement(10.0, 4.0)
    np.testing.assert_allclose(float(cam2.theta), 3.14 + 0.05, rtol=1e-5)
    np.testing.assert_allclose(float(cam2.phi), 1.57 - 0.01, rtol=1e-5)


def test_phi_clamped_at_poles():
    cam = OrbitCamera(phi=0.01)
    cam2 = cam.process_mouse_movement(0.0, 1000.0)
    assert float(cam2.phi) >= 0.001
    cam3 = OrbitCamera(phi=3.13).process_mouse_movement(0.0, -1000.0)
    assert float(cam3.phi) <= np.pi - 0.0009


def test_scroll_dolly_min_radius():
    cam = OrbitCamera(radius=1.0)
    # Camera.cpp:41-46: radius -= dy*0.2, min 0.5.
    cam2 = cam.process_mouse_scroll(1.0)
    np.testing.assert_allclose(float(cam2.radius), 0.8, rtol=1e-6)
    cam3 = cam.process_mouse_scroll(100.0)
    np.testing.assert_allclose(float(cam3.radius), 0.5, rtol=1e-6)


def test_camera_position_spherical():
    cam = OrbitCamera(radius=2.0, theta=0.0, phi=np.pi / 2,
                      target=jnp.zeros(3))
    # theta=0, phi=pi/2 -> +Z axis (Camera.cpp:22-27).
    np.testing.assert_allclose(np.asarray(cam.position), [0, 0, 2],
                               atol=1e-5)
