#!/usr/bin/env python
"""TPU benchmarks for the five BASELINE.json configs (VERDICT r1 item 4).

Each config renders a FRAMES-frame batch inside one compiled program
(lax.scan over frame parameters — the zero-host-round-trip serving
shape; it also amortizes the axon tunnel's ~3 ms per-dispatch latency).
Emits one JSON line per config with Mpixel/s AND Mtri/s, and writes the
full table to benchmarks/results_r02.json.

Run: python benchmarks/bench_all.py [--configs 1,2,3,4,5]
"""
import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
from metalrenderer_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
import jax.numpy as jnp

from benchmarks import configs as cfgs
from metalrenderer_tpu.config import ShadowConfig
from metalrenderer_tpu.passes.pipeline import render_frame

FRAMES = {1: 64, 2: 32, 3: 16, 4: 32, 5: 2}
REPS = 3

# Reduced-scale variants for PSNR-vs-reference-backend (the brute-force
# oracle is O(T * pixels); full config sizes are infeasible for it, so
# parity is recorded at a reduced scale of the SAME pipeline/features —
# the r2 precedent, now recorded for every config).
PSNR_BUILDERS = {
    1: lambda: cfgs.config1_textured_cube(),
    2: lambda: cfgs.config2_multi_mesh(width=384, height=216),
    3: lambda: cfgs.config3_high_poly(target_tris=5_000,
                                      width=320, height=240),
    4: lambda: cfgs.config4_shadow_normal_map(width=320, height=240),
    5: lambda: cfgs.config5_animated_high_poly(target_tris=5_000,
                                               width=320, height=240),
}


def psnr_config(idx):
    """PSNR of the pallas backend vs the reference backend on real TPU
    at the config's reduced parity scale."""
    scene, camera, lighting, config = PSNR_BUILDERS[idx]()

    @jax.jit
    def both(scene, camera, lighting):
        fb_p, _ = render_frame(scene, camera, lighting, config,
                               ShadowConfig(), 0.0,
                               jnp.asarray([0.0, 0.0, -1.0]),
                               backend="pallas")
        fb_r, _ = render_frame(scene, camera, lighting, config,
                               ShadowConfig(), 0.0,
                               jnp.asarray([0.0, 0.0, -1.0]),
                               backend="reference")
        return jnp.mean((fb_p - fb_r) ** 2)

    mse = float(both(scene, camera, lighting))
    psnr = 10.0 * jnp.log10(1.0 / mse) if mse > 0 else jnp.inf
    return round(float(psnr), 1), f"{config.width}x{config.height}"


def flagship_golden(w=1920, h=1080, msaa=4, shadow_map=1024):
    """On-hardware golden at REAL resolution (VERDICT r4 item 8): the
    flagship AudioApp scene at 1920x1080 MSAA4, pallas vs brute-force
    reference ON DEVICE, full-res PSNR + sha256 of the u8 image. The
    r2 bf16-precision bug proved interpret-mode CI cannot catch this
    class; tests/test_tpu_parity.py enforces this row once committed.
    (Non-default sizes exist for the CPU smoke test only.)"""
    import hashlib

    import numpy as np

    from metalrenderer_tpu.config import RenderConfig
    from metalrenderer_tpu.engine import audio_app
    from metalrenderer_tpu.io.png import to_u8
    from metalrenderer_tpu.scene.camera import OrbitCamera
    from metalrenderer_tpu.scene.lights import Lighting

    config = RenderConfig(width=w, height=h, msaa=msaa,
                          shadow_map_size=shadow_map)
    camera = OrbitCamera(radius=5.0, theta=2.5, phi=1.2, aspect=w / h)
    scene = audio_app.build_scene()
    lighting = Lighting.default()

    @jax.jit
    def both(scene, camera, lighting):
        fb_p, _ = render_frame(scene, camera, lighting, config,
                               ShadowConfig(), 0.0,
                               jnp.asarray([0.0, 0.0, -1.0]),
                               backend="pallas")
        fb_r, _ = render_frame(scene, camera, lighting, config,
                               ShadowConfig(), 0.0,
                               jnp.asarray([0.0, 0.0, -1.0]),
                               backend="reference")
        return fb_p, jnp.mean((fb_p - fb_r) ** 2)

    t0 = time.perf_counter()
    fb, mse = jax.block_until_ready(both(scene, camera, lighting))
    compile_s = time.perf_counter() - t0
    mse = float(mse)
    psnr = 10.0 * jnp.log10(1.0 / mse) if mse > 0 else jnp.inf
    u8 = to_u8(np.asarray(fb))
    return {
        "config": "flagship_1080p_golden",
        "width": w, "height": h, "msaa": msaa,
        "psnr_vs_reference_db": round(float(psnr), 1),
        "psnr_scale": f"{w}x{h}",
        "checksum_sha256_u8": hashlib.sha256(u8.tobytes()).hexdigest(),
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
    }


def bench_config(idx, scene, camera, lighting, config, no_batch=False):
    from metalrenderer_tpu.passes.pipeline import (
        FUSED_CHUNK_FRAMES, fused_batch_eligible, px_batch_eligible,
        render_frame_batch_chunked, render_frame_batch_fused,
        render_frame_batch_px)
    frames = FRAMES[idx]
    fused_ok = (not no_batch
                and fused_batch_eligible(scene, lighting, config, camera))
    px_ok = (not no_batch and not fused_ok
             and px_batch_eligible(scene, lighting, config, camera))

    # Scene as a jit ARGUMENT (not a closure): captured device arrays
    # become HLO constants, which blow up remote compiles at 1M tris.
    # The camera angle varies per frame: scenes with no displaced
    # instance (configs 1-4) would otherwise make the scan body
    # loop-invariant — XLA hoists ONE frame out of the batch and the
    # "benchmark" measures nothing.
    def make_runner(shape):
        if shape in ("fused_batch", "px_batch"):
            fn = (render_frame_batch_fused if shape == "fused_batch"
                  else render_frame_batch_px)

            @jax.jit
            def run(scene, camera, lighting, disps, dths):
                rgba, _ = fn(scene, camera, lighting, config,
                             ShadowConfig(), disps, camera.theta + dths)
                return jnp.sum(jnp.mean(rgba, axis=(1, 2, 3)))
        elif shape == "fused_chunked":
            @jax.jit
            def run(scene, camera, lighting, disps, dths):
                m, _ = render_frame_batch_chunked(
                    scene, camera, lighting, config, ShadowConfig(),
                    disps, camera.theta + dths,
                    frame_map=lambda r: jnp.mean(r, axis=(1, 2, 3)))
                return jnp.sum(m)
        else:
            @jax.jit
            def run(scene, camera, lighting, disps, dths):
                def one_frame(carry, p):
                    disp, dth = p
                    cam = camera.replace(theta=camera.theta + dth)
                    fb, _ = render_frame(scene, cam, lighting, config,
                                         ShadowConfig(), disp,
                                         jnp.asarray([0.0, 0.0, -1.0]),
                                         backend="pallas")
                    return carry + jnp.mean(fb), None
                total, _ = jax.lax.scan(one_frame, jnp.float32(0.0),
                                        (disps, dths))
                return total
        return run

    # Shape ladder: whole-batch fold, then the compile-proven chunked
    # fold (the r5 sweep's remote compiles died on every >8-frame whole
    # fold: SMEM scalar budget), then the per-frame scan — so a
    # full-scale timing row ALWAYS lands and records which shape ran.
    shapes = []
    if fused_ok or px_ok:
        shapes.append("fused_batch" if fused_ok else "px_batch")
        if frames > FUSED_CHUNK_FRAMES and frames % FUSED_CHUNK_FRAMES == 0:
            shapes.append("fused_chunked")
    shapes.append("per_frame_scan")

    disps = jnp.linspace(0.0, 0.05, frames)
    dths = jnp.linspace(0.0, 0.2, frames)
    shape_errors = {}
    for shape in shapes:
        run_batch = make_runner(shape)
        t0 = time.perf_counter()
        try:
            total = float(run_batch(scene, camera, lighting, disps, dths))
        except Exception as e:
            if shape == shapes[-1]:
                raise
            shape_errors[shape] = str(e)[:300]
            continue
        compile_s = time.perf_counter() - t0
        break
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        total = float(run_batch(scene, camera, lighting, disps, dths))
        best = min(best, time.perf_counter() - t0)

    n_tris = sum(int(i.mesh.positions.shape[0]) // 3
                 for i in scene.instances)
    fps = frames / best
    r = {
        "config": idx,
        "width": config.width, "height": config.height,
        "msaa": config.msaa, "triangles": n_tris,
        "shape": shape,
        "ms_per_frame": round(best / frames * 1e3, 3),
        "fps": round(fps, 2),
        "mpixel_s": round(fps * config.width * config.height / 1e6, 2),
        "mtri_s": round(fps * n_tris / 1e6, 3),
        "compile_s": round(compile_s, 1),
        "checksum": round(total, 4),
    }
    if shape_errors:
        r["shape_errors"] = shape_errors
    return r


def bench_config5_sharded(scene, camera, lighting, config):
    """Config 5 through the parallel/sharding.py frame-batch path
    (BASELINE config 5 specifies the sharded batch shape; on one real
    chip this is a 1-device mesh — the sharding program itself, not
    multi-chip speedup, is what this records)."""
    from metalrenderer_tpu.parallel import sharding

    mesh = sharding.make_mesh()
    frames = 2 * mesh.size
    disps = jnp.linspace(0.0, 0.05, frames)
    dths = camera.theta + jnp.linspace(0.0, 0.2, frames)

    reduce = jax.jit(jnp.mean)  # drain via a small compiled fetch

    def run():
        fb = sharding.render_frame_batch(
            scene, camera, lighting, disps, dths, mesh, config=config)
        return float(reduce(fb))

    t0 = time.perf_counter()
    total = run()
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        total = run()
        best = min(best, time.perf_counter() - t0)

    n_tris = sum(int(i.mesh.positions.shape[0]) // 3
                 for i in scene.instances)
    fps = frames / best
    return {
        "config": "5_sharded_frame_batch",
        "mesh_devices": mesh.size,
        "width": config.width, "height": config.height,
        "msaa": config.msaa, "triangles": n_tris,
        "ms_per_frame": round(best / frames * 1e3, 3),
        "fps": round(fps, 2),
        "mpixel_s": round(fps * config.width * config.height / 1e6, 2),
        "mtri_s": round(fps * n_tris / 1e6, 3),
        "compile_s": round(compile_s, 1),
        "checksum": round(total, 4),
    }


BUILDERS = {
    1: lambda: cfgs.config1_textured_cube(),
    2: lambda: cfgs.config2_multi_mesh(),
    3: lambda: cfgs.config3_high_poly(),
    4: lambda: cfgs.config4_shadow_normal_map(),
    5: lambda: cfgs.config5_animated_high_poly(),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4,5,5s,g")
    ap.add_argument("--tris5", type=int, default=None,
                    help="override config-5 triangle count")
    ap.add_argument("--size5", default=None,
                    help="override config-5 resolution WxH")
    ap.add_argument("--skip-psnr", action="store_true")
    ap.add_argument("--no-batch", action="store_true",
                    help="force the per-frame scan shape")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    def build5():
        kw = {}
        if args.tris5:
            kw["target_tris"] = args.tris5
        if args.size5:
            w, h = args.size5.split("x")
            kw["width"], kw["height"] = int(w), int(h)
        return cfgs.config5_animated_high_poly(**kw)

    results = []

    def flush():
        # Write after EVERY row: a later config hitting the remote
        # compile window must not lose the rows already measured
        # (round-3 lesson — the TPU pool died mid-sweep).
        if args.out:
            pathlib.Path(args.out).write_text(
                json.dumps(results, indent=1) + "\n")

    for c in args.configs.split(","):
        if c == "g":
            try:
                r = flagship_golden()
            except Exception as e:
                r = {"config": "flagship_1080p_golden",
                     "psnr_error": str(e)[:500]}
            results.append(r)
            flush()
            print(json.dumps(r), flush=True)
            continue
        if c == "5s":
            try:
                r = bench_config5_sharded(*build5())
            except Exception as e:
                r = {"config": "5_sharded_frame_batch",
                     "error": str(e)[:500]}
            results.append(r)
            flush()
            print(json.dumps(r), flush=True)
            continue
        idx = int(c)
        try:
            scene, camera, lighting, config = (
                build5() if idx == 5 else BUILDERS[idx]())
            r = bench_config(idx, scene, camera, lighting, config,
                             no_batch=args.no_batch)
        except Exception as e:  # report, keep benching the rest
            r = {"config": idx, "error": str(e)[:500]}
        if idx == 3 and cfgs.LAST_OBJ_ASSET:
            r["asset"] = cfgs.LAST_OBJ_ASSET
        if not args.skip_psnr:
            try:
                r["psnr_vs_reference_db"], r["psnr_scale"] = psnr_config(idx)
            except Exception as e:
                r["psnr_error"] = str(e)[:500]
        results.append(r)
        flush()
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
