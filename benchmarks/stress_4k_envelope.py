#!/usr/bin/env python
"""4K-scale proof of the no-x/y-clip precision envelope (VERDICT r3).

Metal's fixed-function rasterizer clips primitives to the viewport
(implicit in the PSO raster state, mtl_engine.mm:829-830); this
framework instead relies on f32 edge-function headroom and must PROVE
that unclipped coordinates at config-5 scale stay exact. This script
runs the Pallas rasterizer at the full 4K framebuffer (3840x2160) with
triangle vertices flung up to --dist px off-screen — the default 3e6 px
bounds the worst case post-near-clip screen extent at 4K (scene extent
~8 units / near 0.01 = 800x the half-viewport, x 3840/2) — and checks
coverage against a float64 oracle on a strided pixel lattice everywhere
the oracle is unambiguous (pixel center > 0.5 px from every edge line
of every live triangle).

Run on REAL TPU (interpret-mode CPU cannot see MXU rounding, see
raster_pallas.py precision notes):

    python benchmarks/stress_4k_envelope.py --out benchmarks/stress4k_r04.json

The committed artifact is enforced by
tests/test_raster_stress.py::test_guard_band_4k_artifact.
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
import numpy as np

from metalrenderer_tpu.raster.geometry import guard_clip_xy, setup_triangles
from metalrenderer_tpu.raster.raster_pallas import rasterize_tiles

SAMPLES = ((0.5, 0.5),)


def make_triangles(rng, T, width, height, max_dist):
    """One on-screen vertex, two flung off-screen up to max_dist px; w
    spans [1e-4, 1] so coefficients hit near-plane magnitudes."""
    v_on = rng.uniform([10, 5], [width - 10, height - 5], (T, 1, 2))
    # Every triangle is a wedge of bounded angular spread (0.02-1.5 rad)
    # so the union leaves uncovered screen area — the proof must
    # exercise BOTH coverage outcomes; spread doesn't change coefficient
    # magnitude, which is what the envelope is about.
    ang0 = rng.uniform(0, 2 * np.pi, T)
    spread = np.exp(rng.uniform(np.log(0.02), np.log(1.5), T))
    ang = np.stack([ang0, ang0 + spread], axis=-1)
    dist = np.exp(rng.uniform(np.log(1e3), np.log(max_dist), (T, 2)))
    v_off = v_on + np.stack([np.cos(ang) * dist, np.sin(ang) * dist], -1)
    screen = np.concatenate([v_on, v_off], axis=1)       # [T,3,2] f64
    w = np.broadcast_to(rng.uniform(1e-4, 1.0, (T, 1)), (T, 3))
    z = np.full((T, 3), 0.5)
    return screen, z, w


def clip_from_screen(screen, z, w, width, height):
    sx, sy = screen[..., 0], screen[..., 1]
    ndc_x = sx / (0.5 * width) - 1.0
    ndc_y = 1.0 - sy / (0.5 * height)
    return np.stack([ndc_x * w, ndc_y * w, z * w, w],
                    axis=-1).astype(np.float32)


def oracle_coverage(screen, valid, px, py):
    """f64 inside-test (either orientation) + per-pixel ambiguity: a
    pixel is ambiguous if its center lies within 0.5 px of ANY edge
    line of any live triangle (conservative — edge lines extend beyond
    the segment)."""
    v = [screen[:, i] for i in range(3)]
    cov = None
    ambiguous = None
    for a, b in ((v[0], v[1]), (v[1], v[2]), (v[2], v[0])):
        e = ((b[:, None, 0] - a[:, None, 0]) * (py[None] - a[:, None, 1])
             - (b[:, None, 1] - a[:, None, 1]) * (px[None] - a[:, None, 0]))
        ln = np.hypot(b[:, 0] - a[:, 0], b[:, 1] - a[:, 1])
        near = np.abs(e) / np.maximum(ln, 1e-30)[:, None] < 0.5
        pos = e > 0
        neg = e < 0
        cov = ((pos, neg) if cov is None
               else ((cov[0] & pos), (cov[1] & neg)))
        ambiguous = near if ambiguous is None else (ambiguous | near)
    covered = (cov[0] | cov[1]) & valid[:, None]
    ambiguous = ambiguous & valid[:, None]
    return covered.any(axis=0), ambiguous.any(axis=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=3840)
    ap.add_argument("--height", type=int, default=2160)
    ap.add_argument("--tris", type=int, default=64)
    ap.add_argument("--dist", type=float, default=3e6)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--stride-x", type=int, default=7)
    ap.add_argument("--stride-y", type=int, default=5)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU interpret mode (smoke only — cannot "
                         "see TPU MXU rounding)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    W, H = args.width, args.height

    rng = np.random.default_rng(args.seed)
    screen, z, w = make_triangles(rng, args.tris, W, H, args.dist)
    clip = clip_from_screen(screen, z, w, W, H)

    @jax.jit
    def raster(clip):
        setup = setup_triangles(clip, W, H, cull_backfaces=False)
        depth, winner, _, _ = rasterize_tiles(
            setup, W, H, 8, 128, SAMPLES, span_cap=8, big_capacity=256)
        return winner[0], setup.valid

    t0 = time.perf_counter()
    winner, valid = raster(jnp.asarray(clip))
    winner = np.asarray(winner)
    valid = np.asarray(valid)
    elapsed = time.perf_counter() - t0

    xs = np.arange(0, W, args.stride_x)
    ys = np.arange(0, H, args.stride_y)
    gx, gy = np.meshgrid(xs, ys)
    px = gx.ravel() + 0.5
    py = gy.ravel() + 0.5
    cov64, ambiguous = oracle_coverage(screen, valid, px, py)
    safe = ~ambiguous

    kernel_cov = (winner[gy.ravel(), gx.ravel()] >= 0)
    mism = int(np.sum(kernel_cov[safe] != cov64[safe]))

    # --- Phase 2 (round 5): the PRODUCTION path — true x/y guard-band
    # clipping (geometry.guard_clip_xy) ahead of the same raster. Proof:
    # identical oracle coverage AND every surviving vertex inside the
    # 32768 px guard box (the raw-envelope reliance is gone).
    @jax.jit
    def raster_clipped(clip):
        parent = jnp.arange(clip.shape[0], dtype=jnp.int32)
        clip2, _, _, gstats = guard_clip_xy(
            clip, None, parent, W, H, cap=clip.shape[0],
            guard_px=32768.0)
        setup = setup_triangles(clip2, W, H, cull_backfaces=False)
        _, winner, _, _ = rasterize_tiles(
            setup, W, H, 8, 128, SAMPLES, span_cap=8, big_capacity=512)
        max_coord = jnp.max(jnp.where(setup.valid[:, None, None],
                                      jnp.abs(setup.screen), 0.0))
        return (winner[0], gstats["xyclip_triangles"],
                gstats["xyclip_dropped"], max_coord)

    t0 = time.perf_counter()
    winner_c, n_clipped, n_dropped, max_coord = raster_clipped(
        jnp.asarray(clip))
    winner_c = np.asarray(winner_c)
    clipped_elapsed = time.perf_counter() - t0
    kernel_cov_c = (winner_c[gy.ravel(), gx.ravel()] >= 0)
    mism_c = int(np.sum(kernel_cov_c[safe] != cov64[safe]))
    guard_rec = {
        "clipped_triangles": int(n_clipped),
        "dropped": int(n_dropped),
        "max_screen_coord": float(max_coord),
        "mismatches": mism_c,
        "raster_s": round(clipped_elapsed, 1),
        "ok": (mism_c == 0 and int(n_dropped) == 0
               and float(max_coord) <= 32768.0 + W / 2 + 2),
    }

    result = {
        "width": W, "height": H, "triangles": int(args.tris),
        "max_offscreen_px": float(np.max(np.abs(screen))),
        "platform": jax.devices()[0].platform,
        "sampled_px": int(safe.size), "safe_px": int(safe.sum()),
        "oracle_covered_safe_px": int(cov64[safe].sum()),
        "oracle_uncovered_safe_px": int((~cov64[safe]).sum()),
        "mismatches": mism,
        "guard_clip": guard_rec,
        "ok": (mism == 0 and int(cov64[safe].sum()) > 1000
               and int((~cov64[safe]).sum()) > 1000
               and guard_rec["ok"]),
        "raster_s": round(elapsed, 1),
    }
    print(json.dumps(result))
    if args.out:
        pathlib.Path(args.out).write_text(json.dumps(result, indent=1) + "\n")
    sys.exit(0 if result["ok"] else 1)


if __name__ == "__main__":
    main()
