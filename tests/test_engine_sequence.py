"""End-to-end audio-reactive sequence: WAV-style samples in, frames out,
all inside jitted programs (the reference's full AudioApp loop)."""
import numpy as np
import jax.numpy as jnp

from metalrenderer_tpu.config import RenderConfig
from metalrenderer_tpu.engine.renderer import (audio_visual_track,
                                               render_audio_reactive_sequence)
from metalrenderer_tpu.scene.camera import OrbitCamera

SR = 48000.0


def _tone(freq, chunks, amp=0.3):
    t = np.arange(chunks * 1024) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_audio_visual_track_shapes_and_reactivity():
    sig = np.concatenate([_tone(440.0, 3, amp=0.4), _tone(440.0, 3, amp=0.0)])
    a_st, v_st, params, ctxs = audio_visual_track(jnp.asarray(sig), SR)
    assert params.light_color.shape == (6, 3)
    # Loud tone: envelope attacks; silence: decays by 0.96 per frame.
    inten = np.asarray(params.light_intensity)
    assert inten[2] > 0.3
    assert inten[4] < inten[3] or inten[3] < inten[2] * 1.0001
    # Displacement follows rolling average (positive once window fills).
    disp = np.asarray(params.displacement)
    assert disp[0] == 0.0          # empty window on first chunk
    assert disp[2] > 0.0


def test_render_sequence_produces_distinct_frames():
    sig = np.concatenate([_tone(220.0, 2, amp=0.5), _tone(0.0, 2, amp=0.0)])
    cfg = RenderConfig(width=64, height=64, msaa=1, shadow_map_size=64)
    cam = OrbitCamera(radius=5.0, theta=2.5, phi=1.2, aspect=1.0)
    frames, telem = render_audio_reactive_sequence(
        jnp.asarray(sig), SR, camera=cam, config=cfg, backend="reference")
    frames = np.asarray(frames)
    assert frames.shape == (4, 64, 64, 4)
    assert np.isfinite(frames).all()
    # Light color changes between loud and silent frames.
    assert not np.allclose(frames[1], frames[3])
    assert telem["pitch_hz"].shape == (4,)


def test_cli_render_smoke(tmp_path):
    from metalrenderer_tpu import cli
    out = tmp_path / "f.png"
    cli.main(["render", "--width", "64", "--height", "48", "--msaa", "1",
              "--shadow-map-size", "64", "--backend", "reference",
              "--out", str(out)])
    from metalrenderer_tpu.io import png
    img = png.read_png(out)
    assert img.shape == (48, 64, 3)


def test_cli_audioapp_smoke(tmp_path):
    from metalrenderer_tpu import cli
    from metalrenderer_tpu.io import wav
    sig = _tone(330.0, 3, amp=0.4)
    wav_path = tmp_path / "in.wav"
    wav.write_wav(wav_path, sig, 48000)
    out_dir = tmp_path / "frames"
    cli.main(["audioapp", "--wav", str(wav_path), "--out-dir", str(out_dir),
              "--width", "48", "--height", "48", "--msaa", "1",
              "--shadow-map-size", "64", "--backend", "reference",
              "--max-frames", "2"])
    assert (out_dir / "frame_00000.png").exists()
    assert (out_dir / "frame_00001.png").exists()
    assert (out_dir / "telemetry.json").exists()


def test_cli_flythrough_smoke(tmp_path):
    from metalrenderer_tpu import cli
    out_dir = tmp_path / "fly"
    cli.main(["flythrough", "--width", "48", "--height", "48", "--msaa", "1",
              "--shadow-map-size", "64", "--backend", "reference",
              "--pose", "5,2.5,1.2", "--pose", "5,3.0,1.2",
              "--frames-per-segment", "2", "--out-dir", str(out_dir)])
    from metalrenderer_tpu.io import png
    img = png.read_png(out_dir / "fly_00000.png")
    assert img.shape == (48, 48, 3)
    assert (out_dir / "fly_00002.png").exists()


def test_cli_render_frames_batch(tmp_path):
    from metalrenderer_tpu import cli
    out = tmp_path / "turn.png"
    cli.main(["render", "--width", "64", "--height", "48", "--msaa", "1",
              "--shadow-map-size", "64", "--backend", "pallas",
              "--frames", "2", "--out", str(out)])
    import numpy as np
    from metalrenderer_tpu.io import png
    for i in range(2):
        f = tmp_path / f"turn_{i:04d}.png"
        assert f.exists()
        img = png.read_png(str(f))
        assert img.shape[:2] == (48, 64)


def test_stream_equals_offline_sequence():
    """Streaming serving mode (VERDICT r3 item 10): chunked rendering
    with carried analyzer/visual state must reproduce the offline batch
    exactly, including across a padded final partial chunk."""
    from metalrenderer_tpu.engine.renderer import stream_audio_reactive

    sig = np.concatenate([_tone(220.0, 3, amp=0.5), _tone(660.0, 2, amp=0.2)])
    cfg = RenderConfig(width=64, height=64, msaa=1, shadow_map_size=64)
    cam = OrbitCamera(radius=5.0, theta=2.5, phi=1.2, aspect=1.0)
    offline, telem = render_audio_reactive_sequence(
        jnp.asarray(sig), SR, camera=cam, config=cfg, backend="reference")
    chunks = list(stream_audio_reactive(
        jnp.asarray(sig), SR, chunk_frames=2, camera=cam, config=cfg,
        backend="reference"))
    assert [np.asarray(f).shape[0] for f, _ in chunks] == [2, 2, 1]
    streamed = np.concatenate([np.asarray(f) for f, _ in chunks])
    np.testing.assert_array_equal(streamed, np.asarray(offline))
    st_inten = np.concatenate(
        [np.asarray(t["light_intensity"]) for _, t in chunks])
    np.testing.assert_array_equal(st_inten, np.asarray(
        telem["light_intensity"]))


def test_cli_audioapp_stream_smoke(tmp_path):
    from metalrenderer_tpu import cli
    from metalrenderer_tpu.io import wav
    sig = _tone(330.0, 3, amp=0.4)
    wav_path = tmp_path / "in.wav"
    wav.write_wav(wav_path, sig, 48000)
    out_dir = tmp_path / "frames"
    cli.main(["audioapp", "--wav", str(wav_path), "--out-dir", str(out_dir),
              "--width", "48", "--height", "48", "--msaa", "1",
              "--shadow-map-size", "64", "--backend", "reference",
              "--stream", "--chunk-frames", "2"])
    for i in range(3):
        assert (out_dir / f"frame_{i:05d}.png").exists()
