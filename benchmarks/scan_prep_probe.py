#!/usr/bin/env python
"""Attribute the per-frame cost of the per_frame_scan serving shape.

The flagship headline (470 Mpixel/s, 4.41 ms/frame in-scan) runs a
lax.scan whose body is the ENTIRE render_frame: geometry prep + binning
(pure XLA: bake, project, clip_near, setup_triangles, guard clip,
bin_triangles for both passes) followed by the two Pallas launches.
The standalone stage anatomy (profile_stages_r05.json) cannot separate
dispatch latency from device time, so this probe times scan-shaped
programs that stop at successive prep depths:

  prep_shadow : bake + light-space project/clip/setup + shadow binning
  prep_main   : + main-pass prepare (incl. guard clip) + main binning
  full        : the whole render_frame (reference point)

The difference full - prep_main is the two kernels' in-scan cost; if
prep_main is a material fraction of the frame, hoisting prep out of the
scan (vectorized across frames, as the fused batch path already does)
is the next headline lever.

Run on TPU: python benchmarks/scan_prep_probe.py [--frames 128]
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
from metalrenderer_tpu.passes import pipeline
from metalrenderer_tpu.raster.geometry import clip_near, setup_triangles
from metalrenderer_tpu.raster.raster_pallas import (
    bin_triangles, build_attr_fields, build_tri_fields)
from metalrenderer_tpu.scene import lights as lights_mod
from metalrenderer_tpu.scene.camera import OrbitCamera
from metalrenderer_tpu.scene.lights import Lighting
from metalrenderer_tpu.scene.scene import bake, project

WIDTH, HEIGHT = 1920, 1080


def _tree_sum(t):
    leaves = [jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(t)]
    return sum(leaves[1:], leaves[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=str(
        pathlib.Path(__file__).parent / "scan_prep_probe_r05.json"))
    args = ap.parse_args()

    config = RenderConfig(width=WIDTH, height=HEIGHT, msaa=4,
                          shadow_map_size=1024)
    shadow_config = ShadowConfig()
    camera = OrbitCamera(radius=5.0, theta=2.5, phi=1.2,
                         aspect=WIDTH / HEIGHT)
    scene = audio_app.build_scene()
    lighting = Lighting.default()
    light_anchor = lights_mod.light_anchor_position(
        lighting.light, (0.0, 0.0, -1.0), shadow_config)
    light_view = lights_mod.light_view_matrix(
        light_anchor, jnp.asarray([0.0, 0.0, -1.0], jnp.float32))
    light_proj = lights_mod.light_projection_matrix(shadow_config)

    def prep_shadow(disp):
        geom = bake(scene, disp)
        clip_l = project(geom.world, light_view, light_proj)
        clip_l2, _, parent_l = clip_near(clip_l.reshape(-1, 3, 4))
        setup_l = setup_triangles(
            clip_l2, config.shadow_map_size, config.shadow_map_size,
            cull_backfaces=False, near_eps=config.near_eps)
        setup_l = setup_l.replace(
            valid=setup_l.valid & geom.cast_shadow[parent_l])
        sfields = build_tri_fields(setup_l)
        sbins = bin_triangles(
            setup_l, sfields, config.shadow_map_size,
            config.shadow_map_size, config.shadow_tile_w,
            config.shadow_tile_h, span_cap=config.span_cap,
            big_capacity=config.big_capacity)
        return geom, sbins

    def prep_main(disp):
        geom, sbins = prep_shadow(disp)
        setup, pg = pipeline.prepare_main_pass(
            geom, camera.view_matrix(), camera.projection_matrix(), config)
        fields = build_tri_fields(setup)
        attr_fields = build_attr_fields(setup, pg)
        mbins = bin_triangles(
            setup, fields, config.width, config.height,
            config.tile_w, config.tile_h, span_cap=config.span_cap,
            big_capacity=config.big_capacity, attr_fields=attr_fields)
        return sbins, mbins

    @jax.jit
    def scan_prep_shadow(disps):
        def body(c, d):
            geom, sbins = prep_shadow(d)
            return c + _tree_sum(sbins), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), disps)
        return tot

    @jax.jit
    def scan_prep_main(disps):
        def body(c, d):
            sbins, mbins = prep_main(d)
            return c + _tree_sum(sbins) + _tree_sum(mbins), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), disps)
        return tot

    @jax.jit
    def scan_full(disps):
        def body(c, d):
            fb, _ = pipeline.render_frame(
                scene, camera, lighting, config, shadow_config, d,
                jnp.asarray([0.0, 0.0, -1.0]), backend="pallas")
            return c + jnp.mean(fb), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), disps)
        return tot

    disps = jnp.linspace(0.0, 0.05, args.frames)
    results = {}
    for name, fn in [("prep_shadow", scan_prep_shadow),
                     ("prep_main", scan_prep_main),
                     ("full", scan_full)]:
        t0 = time.perf_counter()
        jax.block_until_ready(fn(disps))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(disps))
            best = min(best, time.perf_counter() - t0)
        ms = best / args.frames * 1e3
        results[name] = {"ms_per_frame": round(ms, 4),
                         "compile_s": round(compile_s, 1)}
        print(f"{name:12s} {ms:8.3f} ms/frame  (first call {compile_s:.1f}s)",
              flush=True)

    results["kernels_ms"] = round(
        results["full"]["ms_per_frame"]
        - results["prep_main"]["ms_per_frame"], 4)
    pathlib.Path(args.out).write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
