"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

The driver benches on a real TPU chip; tests exercise numerics and the
multi-device sharding paths on host CPU with
``--xla_force_host_platform_device_count=8`` so DP/tile-sharding is tested
without a TPU pod (SURVEY.md §4d).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The JAX_PLATFORMS env var is ignored when a TPU platform plugin is
# present in this environment; the config update below is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# NO persistent compilation cache for the CPU suite: this sandbox
# migrates between hosts with different CPU feature sets, and the
# XLA:CPU AOT executable (de)serialization both SIGSEGVs loading
# entries from another host AND SIGABRTs writing them on some hosts
# (observed r5 after a VM restart — the whole suite died twice). The
# cache stays enabled for TPU entry points only, where the remote
# compile result is host-independent (utils/compile_cache.py).

import pytest  # noqa: E402

# Every XLA:CPU compile pins ~3 small anonymous mmaps (LLVM ORC JIT
# code/rodata/data segments) until the executable is released. The full
# suite compiles tens of thousands of tiny programs, crossing the
# kernel's vm.max_map_count (default 65530) mid-run — at which point
# mmap fails inside LLVM and the NEXT compile SIGSEGVs, deterministic at
# whichever test crosses the line (r5: four fast-tier runs died inside
# test_sample_pallas on a trivial jnp.pad compile; /proc/<pid>/maps
# showed ~13.7k (r-xp 4K, r--p 4K, rw-p 16K) triplets at the 46% mark).
# jax.clear_caches() releases the executables and the maps with them
# (probe: 200 compiles = 1062 maps -> 468 after clearing), so clear
# ONLY when near the limit — cross-test compile caching survives
# everywhere else.
try:
    _MAP_LIMIT = int(open("/proc/sys/vm/max_map_count").read())
except OSError:  # non-Linux: no limit to manage
    _MAP_LIMIT = None
_MAP_SOFT_LIMIT = int(_MAP_LIMIT * 0.7) if _MAP_LIMIT else None


@pytest.fixture(autouse=True)
def _bound_jit_code_maps():
    yield
    if _MAP_SOFT_LIMIT is None:
        return
    try:
        n = sum(1 for _ in open("/proc/self/maps", "rb"))
    except OSError:
        return
    if n > _MAP_SOFT_LIMIT:
        jax.clear_caches()
