"""Audio pipeline tests: JAX implementation vs direct NumPy ports of the
reference algorithms (AudioAnalyzer.mm, MusicalInterpreter.mm,
mtl_engine.mm:715-762)."""
import numpy as np
import jax.numpy as jnp

from metalrenderer_tpu.audio import analyzer, interpreter, mapping
from metalrenderer_tpu.io import wav

SR = 48000.0


def _chunk(freq=220.0, amp=0.3, sr=SR, n=1024, phase=0.0):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * freq * t + phase)).astype(np.float32)


def _np_pitch(windowed, sr):
    """Direct port of computePitchMPM (AudioAnalyzer.mm:129-166)."""
    n = len(windowed)
    min_lag = max(1, int(sr / 1500.0))
    max_lag = min(int(sr / 50.0), n - 1)
    best_corr, best_lag = -1.0, min_lag
    x = windowed.astype(np.float64)
    for lag in range(min_lag, max_lag + 1):
        a = x[: n - lag]
        b = x[lag:]
        sxy = float(np.dot(a, b))
        sx2 = float(np.dot(a, a))
        sy2 = float(np.dot(b, b))
        denom = np.sqrt(sx2 * sy2)
        corr = sxy / denom if denom > 1e-10 else 0.0
        if corr > best_corr:
            best_corr, best_lag = corr, lag
    return sr / best_lag, min(max(best_corr, 0.0), 1.0)


def test_hann_norm_window_unit_rms():
    w = np.asarray(analyzer.hann_norm_window())
    assert abs(np.sqrt(np.mean(w ** 2)) - 1.0) < 1e-3


def test_rms_and_rolling_average_order():
    st = analyzer.AnalyzerState.init()
    c1 = _chunk(amp=0.5)
    st, r1 = analyzer.process_chunk(st, c1, SR)
    # rollingAvg reported BEFORE pushing (AudioAnalyzer.mm:28-31): first
    # chunk sees an empty window.
    assert float(r1.rolling_avg) == 0.0
    expected_rms = np.sqrt(np.mean(c1 ** 2))
    np.testing.assert_allclose(float(r1.rms), expected_rms, rtol=1e-5)
    st, r2 = analyzer.process_chunk(st, _chunk(amp=0.1), SR)
    np.testing.assert_allclose(float(r2.rolling_avg), expected_rms,
                               rtol=1e-5)


def test_rolling_window_wraps_at_120():
    st = analyzer.AnalyzerState.init()
    for i in range(125):
        st = analyzer._rolling_push(st, float(i))
    # Window holds values 5..124 -> mean 64.5.
    avg = float(st.rolling_sum) / float(st.rolling_count)
    np.testing.assert_allclose(avg, 64.5, rtol=1e-6)
    assert int(st.rolling_count) == 120


def test_spectrum_peak_at_tone_frequency():
    c = _chunk(freq=750.0)
    spec, _ = analyzer.compute_spectrum(jnp.asarray(c))
    spec = np.asarray(spec)
    peak_bin = int(np.argmax(spec[1:])) + 1
    expected_bin = round(750.0 * 1024 / SR)
    assert abs(peak_bin - expected_bin) <= 1
    # vDSP zrip scaling: 4|DFT|/N. A full-scale windowed sine of amplitude
    # a concentrates |DFT| ~ a*N/2 * mean(window gain) around the peak.
    assert spec[peak_bin] > 0.1


def test_band_energies_split():
    spec = np.zeros(513, np.float32)
    spec[2] = 1.0     # ~94 Hz -> bass (bassEnd = 155*1024/48000 = 3)
    spec[10] = 2.0    # ~469 Hz -> mid (midEnd = 18)
    spec[50] = 3.0    # ~2344 Hz -> treble (trebleEnd = 89)
    b, m, t = analyzer.band_energies(jnp.asarray(spec), jnp.float32(SR))
    np.testing.assert_allclose([float(b), float(m), float(t)],
                               [1.0, 2.0, 3.0], atol=1e-6)


def test_pitch_matches_numpy_reference():
    # Note: 110 Hz is intentionally included even though the reference
    # algorithm mis-detects it (at min-lag the normalized correlation of a
    # smooth low tone ~0.996 beats the Hann-tapered true-period lag) — the
    # JAX port must reproduce the reference's answer, right or wrong.
    for freq in (110.0, 220.0, 440.0):
        c = _chunk(freq=freq, amp=0.4)
        w = np.asarray(analyzer.hann_norm_window())
        windowed = c * w
        p_np, conf_np = _np_pitch(windowed, SR)
        p, conf = analyzer.pitch_mpm(jnp.asarray(windowed), jnp.float32(SR))
        np.testing.assert_allclose(float(p), p_np, rtol=1e-3)
        np.testing.assert_allclose(float(conf), conf_np, atol=1e-3)
    # Mid-range tones are detected correctly.
    for freq in (220.0, 440.0):
        c = _chunk(freq=freq, amp=0.4)
        windowed = c * np.asarray(analyzer.hann_norm_window())
        p, _ = analyzer.pitch_mpm(jnp.asarray(windowed), jnp.float32(SR))
        assert abs(float(p) - freq) / freq < 0.1, (freq, float(p))


def test_interpreter_constants():
    res = analyzer.AnalysisResult(
        rms=jnp.float32(0.1), rolling_avg=jnp.float32(0.004),
        spectrum=jnp.zeros(513), bass=jnp.float32(0.2),
        mid=jnp.float32(0.5), treble=jnp.float32(0.1),
        pitch_hz=jnp.float32(0.0), pitch_confidence=jnp.float32(0.0))
    ctx = interpreter.interpret(res, SR)
    # energy = min(1, 0.004*150) = 0.6
    np.testing.assert_allclose(float(ctx.energy), 0.6, rtol=1e-5)
    bass = np.sqrt(0.2 * 5.0)
    mid = np.sqrt(0.5 * 0.8)
    treble = np.sqrt(0.1 * 1.0)
    np.testing.assert_allclose(float(ctx.brightness),
                               treble / (bass + mid + treble), rtol=1e-5)
    # Fallback melancholy (no confident pitch).
    exp_mel = 0.5 * (1 - float(ctx.brightness)) + 0.5 * (1 - 0.6)
    np.testing.assert_allclose(float(ctx.melancholy), exp_mel, rtol=1e-5)


def test_hue_to_rgb_sectors():
    rgb = np.asarray(mapping.hue_to_rgb(jnp.float32(0.0)))
    np.testing.assert_allclose(rgb, [1, 0, 0], atol=1e-6)       # red
    rgb = np.asarray(mapping.hue_to_rgb(jnp.float32(1.0 / 3.0)))
    np.testing.assert_allclose(rgb, [0, 1, 0], atol=1e-5)       # green
    rgb = np.asarray(mapping.hue_to_rgb(jnp.float32(2.0 / 3.0)))
    np.testing.assert_allclose(rgb, [0, 0, 1], atol=1e-5)       # blue


def test_brightness_envelope_attack_decay():
    st = mapping.VisualState.init()
    ctx_loud = interpreter.MusicalContext(
        energy=jnp.float32(1.0), brightness=jnp.float32(1.0),
        melancholy=jnp.float32(0.5), dominant_pitch=jnp.float32(220.0),
        pitch_confidence=jnp.float32(0.9))
    st, vp = mapping.map_audio_to_visual(st, ctx_loud, 0.1, 0.01)
    assert float(vp.light_intensity) == 1.0       # instant attack
    ctx_quiet = interpreter.MusicalContext(
        energy=jnp.float32(0.0), brightness=jnp.float32(0.0),
        melancholy=jnp.float32(0.5), dominant_pitch=jnp.float32(0.0),
        pitch_confidence=jnp.float32(0.0))
    st, vp2 = mapping.map_audio_to_visual(st, ctx_quiet, 0.0, 0.0)
    np.testing.assert_allclose(float(vp2.light_intensity), 0.96, rtol=1e-5)
    # Silence -> gray light color scaled by brightness.
    np.testing.assert_allclose(np.asarray(vp2.light_color),
                               np.full(3, 0.96 / 3.0), rtol=1e-5)
    # Displacement scalar = rollingAvg * 25 (mtl_engine.mm:761).
    st, vp3 = mapping.map_audio_to_visual(st, ctx_quiet, 0.0, 0.02)
    np.testing.assert_allclose(float(vp3.displacement), 0.5, rtol=1e-5)


def test_analyze_stream_scan():
    sr = SR
    sig = np.concatenate([_chunk(freq=220.0, phase=i) for i in range(6)])
    st, res = analyzer.analyze_stream(jnp.asarray(sig), sr)
    assert res.rms.shape == (6,)
    assert res.spectrum.shape == (6, 513)
    assert np.all(np.asarray(res.pitch_hz[1:]) > 0)


def test_wav_roundtrip(tmp_path):
    sig = _chunk(freq=330.0, n=4800)
    p = tmp_path / "t.wav"
    wav.write_wav(p, sig, 48000)
    back, rate = wav.read_wav(p)
    assert rate == 48000
    assert back.shape == (1, 4800)
    np.testing.assert_allclose(back[0], sig, atol=1e-4)
