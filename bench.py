#!/usr/bin/env python
"""Headline benchmark: Mpixels shaded/sec/chip on the flagship AudioApp
scene at 1080p, 4x MSAA, two passes (shadow + main), Pallas backend.

All frames of a batch render inside ONE compiled program (lax.scan over
frame parameters — the zero-host-round-trip serving shape; it also
amortizes the axon tunnel's per-dispatch latency, which would otherwise
dominate and misreport device throughput by >10x).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

OUTAGE-PROOF (VERDICT r4 item 2): if the accelerator backend cannot
initialize — the axon TPU pool hangs or errors — the script still exits
0 and prints a parseable record with ``value: null``, ``backend:
"unavailable"``, the last driver-verified number, and the error, so a
driver capture is never wasted on a raw stack trace. The backend is
probed in a SUBPROCESS with a hard timeout because the observed outage
mode is an indefinite hang inside device initialization, which no
in-process try/except can bound.

The reference publishes no numbers (BASELINE.md); vs_baseline is measured
against the BASELINE.json north-star target of 1 Gpixel shaded/s/chip.
"""
import json
import os
import subprocess
import sys
import time

WIDTH, HEIGHT = 1920, 1080
TARGET_MPIX_S = 1000.0  # north star: 1 Gpixel shaded/s/chip
FRAMES = 128
REPS = 3
if os.environ.get("BENCH_SMOKE"):   # CI flow check at toy scale
    WIDTH, HEIGHT, FRAMES, REPS = 128, 64, 2, 1
METRIC = "audio_app_1080p_msaa4_two_pass_pixels_shaded"
# Last driver-verified flagship number (round-5 on-TPU bench at HEAD:
# 491.67 Mpixel/s/chip, per_frame_scan, 128-frame batch).
LAST_VERIFIED_MPIX_S = 491.67
PROBE_TIMEOUT_S = int(os.environ.get("BENCH_PROBE_TIMEOUT_S", "300"))


def _emit_unavailable(error):
    """Print the structured outage record (one JSON line, rc=0)."""
    print(json.dumps({
        "metric": METRIC,
        "value": None,
        "unit": "Mpixel/s/chip",
        "vs_baseline": None,
        "backend": "unavailable",
        "last_verified": LAST_VERIFIED_MPIX_S,
        "error": str(error)[-500:],
    }))


def _probe_backend():
    """Return (ok, info). Bounded subprocess device-init probe.

    The round-3/4 outage presented as ``jax.devices()`` hanging forever
    (orphaned remote compile job in the shared pool), so the probe must
    run out-of-process under a timeout. ``BENCH_FORCE_OUTAGE=1`` forces
    the failure path for the unit test.
    """
    if os.environ.get("BENCH_FORCE_OUTAGE"):
        return False, "forced by BENCH_FORCE_OUTAGE"
    # The probe must target the SAME platform the run will use:
    # METALRENDERER_PLATFORM (authoritative on this platform — the
    # plain JAX_PLATFORMS env var is ignored by the axon plugin) would
    # otherwise make a CPU-configured bench hang probing the TPU.
    plat = os.environ.get("METALRENDERER_PLATFORM")
    pre = (f"import jax; jax.config.update('jax_platforms', {plat!r}); "
           if plat else "import jax; ")
    code = pre + "d = jax.devices(); print(d[0].platform, len(d))"
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True,
                           timeout=PROBE_TIMEOUT_S)
    except subprocess.TimeoutExpired:
        return False, (f"backend init hang: jax.devices() did not return "
                       f"within {PROBE_TIMEOUT_S}s")
    if r.returncode != 0:
        tail = (r.stderr or r.stdout or "").strip().splitlines()
        return False, "backend init failed: " + " | ".join(tail[-3:])
    return True, r.stdout.strip()


def _measure_shape(shape_name, scene, camera, lighting, config):
    """Compile + time one serving shape; returns a result dict."""
    import jax
    import jax.numpy as jnp

    from metalrenderer_tpu.config import ShadowConfig
    from metalrenderer_tpu.passes.pipeline import (
        render_frame, render_frame_batch_chunked, render_frame_batch_fused,
        render_frame_batch_hoisted)
    from metalrenderer_tpu.utils import profiling

    # Scene/camera/lighting are explicit jit ARGUMENTS: closing over
    # large device arrays embeds them as HLO constants, which this
    # platform's remote compile helper chokes on at scale.
    if shape_name == "per_frame_scan":
        # One scan step + two kernel launches per frame.
        @jax.jit
        def run_batch(scene, camera, lighting, disps, thetas):
            def one_frame(carry, disp):
                fb, _ = render_frame(scene, camera, lighting, config,
                                     ShadowConfig(), disp,
                                     jnp.asarray([0.0, 0.0, -1.0]),
                                     backend="pallas")
                return carry + jnp.mean(fb), jnp.mean(fb, axis=(0, 1))
            total, means = jax.lax.scan(one_frame, jnp.float32(0.0), disps)
            return total, means
    elif shape_name == "hoisted_scan":
        # Prep + binning for every frame vectorized OUT of the scan;
        # scan body = the two kernel launches only (the per_frame_scan
        # kernels, unchanged). Attacks the 1.44 ms/frame in-scan prep
        # cost measured by benchmarks/scan_prep_probe.py.
        @jax.jit
        def run_batch(scene, camera, lighting, disps, thetas):
            means, _ = render_frame_batch_hoisted(
                scene, camera, lighting, config, ShadowConfig(),
                disps, thetas,
                frame_map=lambda rgba: jnp.mean(rgba, axis=(0, 1)))
            return jnp.sum(jnp.mean(means, axis=-1)), means
    elif shape_name == "fused_chunked":
        # Compile-proven serving shape for long batches: lax.scan over
        # fused sub-batches of FUSED_CHUNK_FRAMES (the whole-batch fold
        # blows the SMEM scalar budget past ~8 frames — r5 bisect). The
        # in-scan frame_map reduces each chunk so the 128-frame batch
        # never materializes [F, 1080p, 4] f32 in HBM.
        @jax.jit
        def run_batch(scene, camera, lighting, disps, thetas):
            means, _ = render_frame_batch_chunked(
                scene, camera, lighting, config, ShadowConfig(),
                disps, thetas,
                frame_map=lambda rgba: jnp.mean(rgba, axis=(1, 2)))
            means = means.reshape(-1, means.shape[-1])
            return jnp.sum(jnp.mean(means, axis=-1)), means
    else:
        # Frame-folded serving shape: the WHOLE batch in two kernel
        # launches (batched shadow pass + frame-folded fused
        # raster/shade grid), prep and binning vectorized across frames.
        @jax.jit
        def run_batch(scene, camera, lighting, disps, thetas):
            rgba, _ = render_frame_batch_fused(
                scene, camera, lighting, config, ShadowConfig(),
                disps, thetas)
            means = jnp.mean(rgba, axis=(1, 2))
            return jnp.sum(jnp.mean(means, axis=-1)), means

    disps = jnp.linspace(0.0, 0.05, FRAMES)
    thetas = jnp.full((FRAMES,), camera.theta, jnp.float32)
    t0 = time.perf_counter()
    total, means = run_batch(scene, camera, lighting, disps, thetas)
    jax.block_until_ready((total, means))
    first_call_s = time.perf_counter() - t0

    if "--trace" in sys.argv:
        with profiling.device_trace() as d:
            jax.block_until_ready(
                run_batch(scene, camera, lighting, disps, thetas))
        print(f"# trace written to {d}", file=sys.stderr)

    best = float("inf")
    for _ in range(REPS):
        sec, (total, means) = profiling.timed(
            run_batch, scene, camera, lighting, disps, thetas,
            iters=1, warmup=0)
        best = min(best, sec)

    fps = FRAMES / best
    return {"shape": shape_name, "fps": fps,
            "mpix_s": fps * WIDTH * HEIGHT / 1e6,
            "first_call_s": first_call_s, "checksum": float(total)}


def _run():
    import jax

    from metalrenderer_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    from metalrenderer_tpu.config import RenderConfig
    from metalrenderer_tpu.engine import audio_app
    from metalrenderer_tpu.scene.camera import OrbitCamera
    from metalrenderer_tpu.scene.lights import Lighting

    config = RenderConfig(
        width=WIDTH, height=HEIGHT, msaa=4,
        shadow_map_size=128 if os.environ.get("BENCH_SMOKE") else 1024)
    camera = OrbitCamera(radius=5.0, theta=2.5, phi=1.2,
                         aspect=WIDTH / HEIGHT)
    scene = audio_app.build_scene()
    lighting = Lighting.default()

    # Measure BOTH serving shapes and report the better one, so the
    # recorded headline never depends on a hand-flipped default
    # (`--scan` / `--batch` pin a single shape). The scan shape is the
    # TPU-proven one, so it runs first; the frame-folded shape may fail
    # without losing the capture.
    if "--batch" in sys.argv:
        shapes = ["frame_folded"]
    elif "--scan" in sys.argv:
        shapes = ["per_frame_scan"]
    elif "--chunked" in sys.argv:
        shapes = ["fused_chunked"]
    elif "--hoisted" in sys.argv:
        shapes = ["hoisted_scan"]
    else:
        shapes = ["per_frame_scan", "hoisted_scan", "fused_chunked"]

    results = []
    for s in shapes:
        try:
            results.append(_measure_shape(s, scene, camera, lighting,
                                          config))
        except Exception as exc:  # noqa: BLE001
            print(f"# shape {s} failed: {type(exc).__name__}: "
                  f"{str(exc)[:300]}", file=sys.stderr)
    if not results:
        raise RuntimeError("every serving shape failed")
    winner = max(results, key=lambda r: r["mpix_s"])

    mpix_s = winner["mpix_s"]
    print(json.dumps({
        "metric": METRIC,
        "value": round(mpix_s, 2),
        "unit": "Mpixel/s/chip",
        "vs_baseline": round(mpix_s / TARGET_MPIX_S, 4),
        "shape": winner["shape"],
    }))
    for r in results:
        print(f"# {r['shape']}: {r['fps']:.2f} fps at {WIDTH}x{HEIGHT} "
              f"msaa4, {FRAMES}-frame batch "
              f"(backend={jax.default_backend()}, "
              f"checksum={r['checksum']:.4f}, "
              f"first_call_s={r['first_call_s']:.1f})",
              file=sys.stderr)


def main():
    ok, info = _probe_backend()
    if not ok:
        _emit_unavailable(info)
        return
    try:
        _run()
    except Exception as exc:  # noqa: BLE001 — any escape wastes a capture
        _emit_unavailable(f"{type(exc).__name__}: {exc}")


if __name__ == "__main__":
    main()
