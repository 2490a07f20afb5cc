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
