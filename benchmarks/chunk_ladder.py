#!/usr/bin/env python
"""Fold-size ladder for the flagship serving shape.

The round-5 sweep measured per_frame_scan (229 fps) BEATING the
8-frame fused_chunked fold (183 fps), while the whole-128 fold dies in
the remote compile helper (HTTP 500, subprocess crash). The SMEM-budget
fixes (b1ee5a3: packed subtiles, capped visits, sub-batched samplers)
landed AFTER the r5 bisect that pinned FUSED_CHUNK_FRAMES=8, so larger
folds may now both compile and win — each rung here compiles and times
one fold size, catching per-rung failures so one broken rung never
hides the others.

Run: python benchmarks/chunk_ladder.py [--frames 128] [--chunks 8,16,32,64]
Writes benchmarks/chunk_ladder_r05.json.
"""
import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from metalrenderer_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

import jax
import jax.numpy as jnp

from metalrenderer_tpu.config import RenderConfig, ShadowConfig
from metalrenderer_tpu.engine import audio_app
from metalrenderer_tpu.passes.pipeline import render_frame_batch_chunked
from metalrenderer_tpu.scene.camera import OrbitCamera
from metalrenderer_tpu.scene.lights import Lighting
from metalrenderer_tpu.utils import profiling

WIDTH, HEIGHT = 1920, 1080


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--chunks", default="8,16,32,64")
    ap.add_argument("--out", default=str(
        pathlib.Path(__file__).parent / "chunk_ladder_r05.json"))
    args = ap.parse_args()

    config = RenderConfig(width=WIDTH, height=HEIGHT, msaa=4,
                          shadow_map_size=1024)
    camera = OrbitCamera(radius=5.0, theta=2.5, phi=1.2,
                         aspect=WIDTH / HEIGHT)
    scene = audio_app.build_scene()
    lighting = Lighting.default()
    disps = jnp.linspace(0.0, 0.05, args.frames)
    thetas = jnp.full((args.frames,), camera.theta, jnp.float32)

    rows = []
    for chunk in [int(c) for c in args.chunks.split(",")]:
        if args.frames % chunk:
            rows.append({"chunk": chunk, "error": "frames % chunk != 0"})
            continue

        @jax.jit
        def run(scene, camera, lighting, disps, thetas, _chunk=chunk):
            means, _ = render_frame_batch_chunked(
                scene, camera, lighting, config, ShadowConfig(),
                disps, thetas, chunk=_chunk,
                frame_map=lambda rgba: jnp.mean(rgba, axis=(1, 2)))
            means = means.reshape(-1, means.shape[-1])
            return jnp.sum(jnp.mean(means, axis=-1)), means

        try:
            t0 = time.perf_counter()
            out = run(scene, camera, lighting, disps, thetas)
            jax.block_until_ready(out)
            compile_s = time.perf_counter() - t0
            sec, (total, _) = profiling.timed(
                run, scene, camera, lighting, disps, thetas,
                iters=3, warmup=1)
            fps = args.frames / sec
            rows.append({
                "chunk": chunk, "fps": round(fps, 2),
                "mpix_s": round(fps * WIDTH * HEIGHT / 1e6, 2),
                "compile_s": round(compile_s, 1),
                "checksum": round(float(total), 4),
            })
        except Exception as exc:  # noqa: BLE001 — record and keep climbing
            rows.append({"chunk": chunk,
                         "error": f"{type(exc).__name__}: {str(exc)[:300]}"})
        print(json.dumps(rows[-1]), flush=True)
        pathlib.Path(args.out).write_text(json.dumps(rows, indent=1) + "\n")

    print("wrote", args.out)


if __name__ == "__main__":
    main()
