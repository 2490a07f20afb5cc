"""Checkpoint/resume: analyzer + visual state round-trips mid-stream."""
import numpy as np
import jax.numpy as jnp

from metalrenderer_tpu.audio import analyzer, mapping
from metalrenderer_tpu.utils import checkpoint


def _tone(freq, chunks, amp=0.3, sr=48000.0):
    t = np.arange(chunks * 1024) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_analyzer_state_roundtrip(tmp_path):
    sig = _tone(220.0, 4)
    st, _ = analyzer.analyze_stream(jnp.asarray(sig), 48000.0)
    p = tmp_path / "analyzer.npz"
    checkpoint.save_pytree(p, st)
    st2 = checkpoint.restore_like(analyzer.AnalyzerState.init(), p)
    for a, b in zip(
            [st.rolling, st.rolling_sum, st.smoothed_bass],
            [st2.rolling, st2.rolling_sum, st2.smoothed_bass]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_resume_equals_continuous(tmp_path):
    """Splitting a stream at a checkpoint must equal the unbroken run."""
    sig = _tone(440.0, 6)
    st_full, res_full = analyzer.analyze_stream(jnp.asarray(sig), 48000.0)

    st_a, _ = analyzer.analyze_stream(jnp.asarray(sig[:3 * 1024]), 48000.0)
    p = tmp_path / "mid.npz"
    checkpoint.save_pytree(p, st_a)
    st_rest = checkpoint.restore_like(analyzer.AnalyzerState.init(), p)
    st_b, res_b = analyzer.analyze_stream(jnp.asarray(sig[3 * 1024:]),
                                          48000.0, st_rest)
    np.testing.assert_allclose(np.asarray(st_b.rolling_sum),
                               np.asarray(st_full.rolling_sum), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res_b.rms[-1]),
                               np.asarray(res_full.rms[-1]), rtol=1e-5)


def test_visual_state_roundtrip(tmp_path):
    vs = mapping.VisualState(brightness_envelope=jnp.float32(0.77))
    p = tmp_path / "vs.npz"
    checkpoint.save_pytree(p, vs)
    vs2 = checkpoint.restore_like(mapping.VisualState.init(), p)
    assert float(vs2.brightness_envelope) == np.float32(0.77)


def test_leaf_count_mismatch_raises(tmp_path):
    p = tmp_path / "x.npz"
    checkpoint.save_pytree(p, {"a": jnp.ones(3)})
    try:
        checkpoint.restore_like({"a": jnp.ones(3), "b": jnp.ones(2)}, p)
        assert False, "expected ValueError"
    except ValueError:
        pass
