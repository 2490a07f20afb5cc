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

# Persistent compilation cache: interpret-mode Pallas kernels are plain
# XLA programs whose ~20 s compiles dominate the suite wall-clock; a
# warm cache brings the default tier well under the 5-minute target.
# (First run on a fresh checkout still pays full compile cost.)
_cache_dir = os.path.join(os.path.dirname(__file__), os.pardir,
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
