#!/usr/bin/env python
"""Attribute the hoisted-prep serving shape's regression.

Round-5 measurement: hoisted_scan = 5.28 ms/frame vs per_frame_scan =
4.22 ms/frame, although the probe (scan_prep_probe_r05.json) shows the
in-scan prep chain costs 1.44 ms/frame. This probe splits the hoisted
shape into its two halves:

  prep_batch : the vmapped prep+binning for all F frames, alone
  scan_kern  : the kernel-only scan fed by PRECOMPUTED batch operands
               (prep runs once outside the timed region via donate)

If prep_batch/F << 1.44 ms and scan_kern ~= kernels_ms (2.53), the
regression is scan-slicing overhead; if prep_batch/F is large, vmapped
binning itself de-vectorizes (sort/scatter under vmap).

Run on TPU: python benchmarks/hoist_attrib.py [--frames 128]
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
from metalrenderer_tpu.raster import raster_pallas
from metalrenderer_tpu.raster.binning import (bin_triangles,
                                              build_attr_fields,
                                              build_tri_fields)
from metalrenderer_tpu.scene import lights as lights_mod
from metalrenderer_tpu.scene.camera import OrbitCamera
from metalrenderer_tpu.scene.lights import Lighting
from metalrenderer_tpu.scene.scene import bake, project
from metalrenderer_tpu.raster.geometry import clip_near, setup_triangles

WIDTH, HEIGHT = 1920, 1080


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=str(
        pathlib.Path(__file__).parent / "hoist_attrib_r05.json"))
    args = ap.parse_args()
    F = args.frames

    config = RenderConfig(width=WIDTH, height=HEIGHT, msaa=4,
                          shadow_map_size=1024)
    shadow_config = ShadowConfig()
    camera = OrbitCamera(radius=5.0, theta=2.5, phi=1.2,
                         aspect=WIDTH / HEIGHT)
    scene = audio_app.build_scene()
    lighting = Lighting.default()
    light = lighting.light
    S = config.shadow_map_size
    shadow_target_a = jnp.asarray([0.0, 0.0, -1.0], jnp.float32)
    light_anchor = lights_mod.light_anchor_position(
        light, (0.0, 0.0, -1.0), shadow_config)
    light_view = lights_mod.light_view_matrix(light_anchor, shadow_target_a)
    light_proj = lights_mod.light_projection_matrix(shadow_config)
    m = jnp.dot(light_proj, light_view, precision="highest")

    def prep_frame(disp, theta):
        cam = camera.replace(theta=theta)
        geom = bake(scene, disp)
        out = {}
        clip_l = project(geom.world, light_view, light_proj)
        clip_l2, _, parent_l = clip_near(clip_l.reshape(-1, 3, 4))
        setup_l = setup_triangles(clip_l2, S, S, cull_backfaces=False,
                                  near_eps=config.near_eps)
        setup_l = setup_l.replace(
            valid=setup_l.valid & geom.cast_shadow[parent_l])
        out["setup_l"] = setup_l
        out["sbins"] = bin_triangles(
            setup_l, build_tri_fields(setup_l), S, S,
            config.shadow_tile_w, config.shadow_tile_h,
            big_capacity=config.big_capacity)
        setup, pg = pipeline.prepare_main_pass(
            geom, cam.view_matrix(), cam.projection_matrix(), config)
        out["setup"], out["pg"] = setup, pg
        out["mbins"] = bin_triangles(
            setup, build_tri_fields(setup), config.width, config.height,
            config.tile_w, config.tile_h, span_cap=config.span_cap,
            big_capacity=config.big_capacity,
            attr_fields=build_attr_fields(setup, pg))
        out["funi"] = pipeline._fused_uniforms(
            m, cam, light_anchor, light, lighting, config)
        return out

    disps = jnp.linspace(0.0, 0.05, F)
    thetas = jnp.full((F,), camera.theta, jnp.float32)

    @jax.jit
    def prep_batch(disps, thetas):
        return jax.vmap(prep_frame)(disps, thetas)

    @jax.jit
    def scan_kern(batch):
        def body(carry, xs):
            depth_sm, _, _, _ = raster_pallas.rasterize_tiles(
                xs["setup_l"], S, S, config.shadow_tile_h,
                config.shadow_tile_w, ((0.5, 0.5),),
                big_capacity=config.big_capacity, clear_depth=1.0,
                bins=xs["sbins"])
            rgba, covf, _ = raster_pallas.render_fused(
                xs["setup"], xs["pg"], xs["funi"], WIDTH, HEIGHT,
                tuple(config.sample_positions), shadow_map=depth_sm[0],
                span_cap=config.span_cap,
                big_capacity=config.big_capacity,
                clear_depth=config.clear_depth, bins=xs["mbins"])
            return carry + jnp.mean(rgba), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), batch)
        return tot

    results = {}

    def timeit(name, fn, *a):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a))
            best = min(best, time.perf_counter() - t0)
        results[name] = {"ms_per_frame": round(best / F * 1e3, 4),
                         "compile_s": round(compile_s, 1)}
        print(f"{name:11s} {best / F * 1e3:8.3f} ms/frame "
              f"(first call {compile_s:.1f}s)", flush=True)

    timeit("prep_batch", prep_batch, disps, thetas)
    batch = jax.block_until_ready(prep_batch(disps, thetas))
    timeit("scan_kern", scan_kern, batch)

    pathlib.Path(args.out).write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
