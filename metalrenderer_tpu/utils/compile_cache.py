"""Persistent XLA/Mosaic compilation cache for every entry point.

The axon TPU platform compiles through a remote helper whose large-
program compiles are extremely slow (config 1: 956 s, config 5: 1238 s
in round 2 — benchmarks/results_r02.json). Those compiles are pure
functions of the HLO + compiler fingerprint, so a persistent on-disk
cache makes every repeat — across processes, benchmark invocations,
and driver rounds on the same machine — a cache hit. Tests already
used this (tests/conftest.py); round 5 extends it to the benchmark and
CLI entry points, which previously paid full compile cost every run.

The cache lives in ``<repo>/.jax_cache/<host-cpu-fingerprint>``
(gitignored). Entries are keyed by platform + jaxlib fingerprint, so
CPU and TPU runs coexist. The host-CPU fingerprint subdirectory exists
because this sandbox MIGRATES between hosts with different CPU feature
sets: XLA:CPU AOT artifacts compiled with e.g. ``+prefer-no-scatter``
SIGSEGV when loaded on a host without it (observed r5 — the whole test
suite crashed on stale cache entries after a VM restart).
"""
import hashlib
import os
import pathlib

import jax


def host_cpu_fingerprint():
    """Short stable hash of the host CPU's feature flags."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    return "unknown-cpu"


_DEFAULT_DIR = (pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"
                / host_cpu_fingerprint())


def enable_persistent_cache(cache_dir=None, min_compile_secs=1.0):
    """Idempotently point JAX's persistent compilation cache at the
    repo-local directory (override with METALRENDERER_CACHE_DIR).

    Also honors ``METALRENDERER_PLATFORM=cpu|tpu``: the plain
    ``JAX_PLATFORMS`` env var is SILENTLY IGNORED when the axon TPU
    plugin is installed (only ``jax.config.update`` is authoritative on
    this platform), which has repeatedly produced scripts that hang on
    remote device init while 'running on CPU'. Every benchmark entry
    point calls this, so the env override works uniformly.
    """
    plat = os.environ.get("METALRENDERER_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    if jax.default_backend() != "tpu":
        # CPU runs must NOT touch the persistent cache: XLA:CPU AOT
        # executable (de)serialization crashes across this sandbox's
        # host migrations (SIGSEGV loading foreign-host entries,
        # SIGABRT writing on some hosts). TPU entries come from the
        # remote compile helper and are host-independent.
        return None
    cache_dir = (cache_dir
                 or os.environ.get("METALRENDERER_CACHE_DIR")
                 or str(_DEFAULT_DIR))
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return str(cache_dir)
