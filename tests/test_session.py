"""Interactive session loop (engine/session.py): event semantics of the
reference's GLFW callbacks (mtl_engine.mm:164-202) and ImGui sliders
(mtl_engine.mm:883-885), and frame equality with the direct render API."""
import json

import numpy as np
import pytest

from metalrenderer_tpu.config import RenderConfig
from metalrenderer_tpu.engine import audio_app
from metalrenderer_tpu.engine.session import InteractiveSession
from metalrenderer_tpu.scene.camera import OrbitCamera

CFG = RenderConfig(width=96, height=72, msaa=1, shadow_map_size=64)


def _session(**kw):
    cam = OrbitCamera(radius=5.0, theta=2.5, phi=1.2, aspect=96 / 72)
    return InteractiveSession(config=CFG, camera=cam, backend="reference",
                              **kw)


def test_cursor_rotation_is_shift_gated():
    s = _session()
    s.handle_event({"type": "cursor", "x": 100.0, "y": 100.0})
    t0 = float(np.asarray(s.camera.theta))
    # Unshifted move: anchor tracks, camera unchanged (mtl_engine.mm:183).
    s.handle_event({"type": "cursor", "x": 150.0, "y": 90.0})
    assert float(np.asarray(s.camera.theta)) == t0
    # Shifted move rotates by delta * sensitivity (Camera.cpp:33-38).
    s.handle_event({"type": "cursor", "x": 190.0, "y": 90.0,
                    "shift": True})
    assert float(np.asarray(s.camera.theta)) == pytest.approx(
        t0 + 40.0 * 0.005)
    # Phi direction: the reference REVERSES the vertical delta
    # (yoffset = lastY - ypos, mtl_engine.mm:177) before
    # processMouseMovement does phi -= dy*s*0.5 (Camera.cpp:35).
    # Cursor moving DOWN the screen (y grows) => yoffset < 0 => phi
    # INCREASES.
    p0 = float(np.asarray(s.camera.phi))
    s.handle_event({"type": "cursor", "x": 190.0, "y": 140.0,
                    "shift": True})
    assert float(np.asarray(s.camera.phi)) == pytest.approx(
        p0 + 50.0 * 0.005 * 0.5)


def test_scroll_dolly_clamps_min_radius():
    s = _session()
    s.handle_event({"type": "scroll", "dy": 1000.0})
    assert float(np.asarray(s.camera.radius)) == pytest.approx(0.5)


def test_set_and_frame_events():
    s = _session()
    assert s.handle_event({"type": "set", "light_color": [0.1, 0.2, 0.3],
                           "displacement": 0.25}) == 1
    assert s.light_color == (0.1, 0.2, 0.3)
    assert s.displacement == 0.25
    assert s.handle_event({"type": "frame", "n": 3}) == 3
    with pytest.raises(ValueError):
        s.handle_event({"type": "warp"})


def test_resize_updates_config_and_aspect():
    s = _session()
    s.handle_event({"type": "resize", "width": 128, "height": 64})
    assert (s.config.width, s.config.height) == (128, 64)
    assert float(np.asarray(s.camera.aspect)) == pytest.approx(2.0)


def test_session_frame_matches_direct_render():
    s = _session(light_color=(0.3, 0.9, 0.4), displacement=0.1)
    s.handle_event({"type": "drag", "dx": 40.0, "dy": -20.0})
    fb_sess, _ = s.render_frame()

    cam = OrbitCamera(radius=5.0, theta=2.5, phi=1.2,
                      aspect=96 / 72).process_mouse_movement(40.0, -20.0)
    fb_direct, _ = audio_app.render_audio_app(
        light_color=(0.3, 0.9, 0.4), displacement=0.1,
        camera=cam, config=CFG, backend="reference")
    np.testing.assert_array_equal(np.asarray(fb_sess),
                                  np.asarray(fb_direct))


def test_run_loop_emits_telemetry_per_frame():
    s = _session()
    lines = [
        "# comment",
        json.dumps({"type": "scroll", "dy": 1.0}),
        json.dumps({"type": "frame", "n": 2}),
    ]
    telems = [t for _, t in s.run(lines)]
    assert [t["frame"] for t in telems] == [1, 2, 3]
    assert telems[0]["camera"]["radius"] == pytest.approx(4.8)
    assert "covered_fraction" in telems[0]["stats"]


def test_cursor_event_with_missing_fields_is_safe():
    """Docstring contract: all fields optional — a cursor event without
    x/y must not crash the loop (it anchors at the last position)."""
    s = _session()
    s.handle_event({"type": "cursor", "shift": True})
    t0 = float(np.asarray(s.camera.theta))
    s.handle_event({"type": "cursor", "x": 10.0, "y": 0.0, "shift": True})
    assert float(np.asarray(s.camera.theta)) == pytest.approx(
        t0 + 10.0 * 0.005)
