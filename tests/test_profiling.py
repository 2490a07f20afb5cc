"""Profiling utilities (SURVEY.md §5) are live: timed() is the perf
primitive used by bench.py; device_trace captures a real profile."""
import pathlib

import jax
import jax.numpy as jnp

from metalrenderer_tpu.utils import profiling


def test_timed_returns_positive_seconds_and_result():
    f = jax.jit(lambda x: jnp.sum(x * 2.0))
    sec, out = profiling.timed(f, jnp.ones((128, 128)), iters=3, warmup=1)
    assert sec > 0.0
    assert float(out) == 128 * 128 * 2.0


def test_device_trace_writes_profile(tmp_path):
    f = jax.jit(lambda x: jnp.sum(x * x))
    with profiling.device_trace(str(tmp_path)) as d:
        with profiling.annotate("traced-op"):
            jax.block_until_ready(f(jnp.ones((64, 64))))
    files = list(pathlib.Path(d).rglob("*"))
    assert any(p.is_file() for p in files), files
