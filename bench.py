#!/usr/bin/env python
"""Headline benchmark: Mpixels shaded/sec/chip on the flagship AudioApp
scene at 1080p, 4x MSAA, two passes (shadow + main), Pallas backend.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md); vs_baseline is measured
against the BASELINE.json north-star target of 1 Gpixel shaded/s/chip.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from metalrenderer_tpu.config import RenderConfig, ShadowConfig
from metalrenderer_tpu.engine import audio_app
from metalrenderer_tpu.scene.camera import OrbitCamera
from metalrenderer_tpu.scene.lights import Lighting, PointLight
from metalrenderer_tpu.passes.pipeline import render

WIDTH, HEIGHT = 1920, 1080
TARGET_MPIX_S = 1000.0  # north star: 1 Gpixel shaded/s/chip
WARMUP = 2
FRAMES = 16


def main():
    config = RenderConfig(width=WIDTH, height=HEIGHT, msaa=4,
                          shadow_map_size=1024)
    camera = OrbitCamera(radius=5.0, theta=2.5, phi=1.2,
                         aspect=WIDTH / HEIGHT)
    scene = audio_app.build_scene()
    lighting = Lighting.default()

    def frame(displacement):
        fb, _ = render(scene, camera, lighting, config, ShadowConfig(),
                       displacement=displacement,
                       shadow_target=jnp.asarray([0.0, 0.0, -1.0]),
                       backend="pallas")
        return fb

    frame_jit = jax.jit(frame)
    # Warmup / compile.
    for i in range(WARMUP):
        fb = frame_jit(jnp.float32(0.01 * i))
    fb.block_until_ready()

    disps = [jnp.float32(0.001 * i) for i in range(FRAMES)]
    t0 = time.perf_counter()
    for d in disps:
        fb = frame_jit(d)
    fb.block_until_ready()
    dt = time.perf_counter() - t0

    fps = FRAMES / dt
    mpix_s = fps * WIDTH * HEIGHT / 1e6
    print(json.dumps({
        "metric": "audio_app_1080p_msaa4_two_pass_pixels_shaded",
        "value": round(mpix_s, 2),
        "unit": "Mpixel/s/chip",
        "vs_baseline": round(mpix_s / TARGET_MPIX_S, 4),
    }))
    print(f"# {fps:.2f} fps at {WIDTH}x{HEIGHT} msaa4 "
          f"(backend={jax.default_backend()})", file=sys.stderr)


if __name__ == "__main__":
    main()
