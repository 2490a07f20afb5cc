#!/usr/bin/env python
"""Per-stage attribution for any benchmark config (VERDICT r2: configs
2-5 need TPU evidence). Same whole-scan prefix-delta method as
profile_stages.py, parameterized over benchmarks/configs.py builders.

Run: python benchmarks/profile_config.py --config 3 [--frames 4]
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
from metalrenderer_tpu.passes.pipeline import prepare_main_pass
from metalrenderer_tpu.raster import raster_pallas
from metalrenderer_tpu.raster.binning import (bin_triangles,
                                              build_attr_fields,
                                              build_tri_fields)
from metalrenderer_tpu.raster.shade import shade_channels
from metalrenderer_tpu.scene.scene import bake

STAGES = ["prep_geom", "binning", "raster", "channels", "shade", "resolve"]


def checksum(tree):
    return sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
               for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "astype"))


def build_stage_fn(stage, camera, lighting, config):
    # dth varies the camera per frame: scenes that ignore ``disp``
    # (configs 1-4 have no displaced instance) would otherwise make the
    # whole scan body loop-invariant and XLA hoists ONE frame out of the
    # batch -- the "benchmark" then measures nothing.
    def frame(scene, disp, dth):
        camera_f = camera.replace(theta=camera.theta + dth)
        geom = bake(scene, disp)
        view = camera_f.view_matrix()
        proj = camera_f.projection_matrix()
        setup, pg = prepare_main_pass(geom, view, proj, config)
        if stage == "prep_geom":
            return checksum((setup.edge, setup.z, pg.vattrs))

        if stage == "binning":
            fields = build_tri_fields(setup)
            attr_fields = build_attr_fields(setup, pg)
            bins = bin_triangles(setup, fields, config.width, config.height,
                                 config.tile_w, config.tile_h,
                                 span_cap=config.span_cap,
                                 big_capacity=config.big_capacity,
                                 attr_fields=attr_fields)
            return checksum((bins.chunks, bins.attr_chunks, bins.band_start))

        depth, winner, gout, _ = raster_pallas.rasterize_tiles(
            setup, config.width, config.height, config.tile_h,
            config.tile_w, tuple(config.sample_positions),
            span_cap=config.span_cap, big_capacity=config.big_capacity,
            clear_depth=config.clear_depth, with_attrs=True, pass_geom=pg)
        if stage == "raster":
            return checksum((depth, winner, gout))

        channels = raster_pallas.channels_from_gout(gout, winner)
        if stage == "channels":
            return checksum(channels)

        light = lighting.light
        from metalrenderer_tpu.scene import lights as lights_mod
        is_dir = isinstance(light, lights_mod.DirectionalLight)
        anchor = lights_mod.light_anchor_position(
            light, (0.0, 0.0, 0.0), ShadowConfig())
        r, g, b, a = shade_channels(
            channels, camera_pos=camera_f.position, light_pos=anchor,
            light_dir=(jnp.asarray(light.direction, jnp.float32)
                       if is_dir else None),
            light_color=light.color,
            ambient_intensity=lighting.ambient_intensity,
            shininess=lighting.shininess, clear_color=config.clear_color,
            shadow_ctx=None, textures=scene.textures,
            tiled_sampler=True, return_planes=True)
        if stage == "shade":
            return checksum((r, g, b, a))
        fb = jnp.stack([jnp.mean(c, axis=0) for c in (r, g, b, a)], axis=-1)
        return checksum(fb)

    return frame


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=3)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--stages", default=None)
    args = ap.parse_args()
    builders = {1: cfgs.config1_textured_cube, 2: cfgs.config2_multi_mesh,
                3: cfgs.config3_high_poly,
                4: cfgs.config4_shadow_normal_map,
                5: cfgs.config5_animated_high_poly}
    scene, camera, lighting, config = builders[args.config]()
    camera = camera.replace(aspect=config.width / config.height)

    stages = args.stages.split(",") if args.stages else STAGES
    disps = jnp.linspace(0.0, 0.05, args.frames)
    dths = jnp.linspace(0.0, 0.2, args.frames)
    results = {}
    prev = 0.0
    for stage in stages:
        frame = build_stage_fn(stage, camera, lighting, config)

        @jax.jit
        def run(scene, disps, dths, frame=frame):
            def step(c, p):
                d, t = p
                return c + frame(scene, d, t), None
            tot, _ = jax.lax.scan(step, jnp.float32(0.0), (disps, dths))
            return tot

        t0 = time.perf_counter()
        float(run(scene, disps, dths))   # host fetch = reliable sync
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(run(scene, disps, dths))
            best = min(best, time.perf_counter() - t0)
        ms = best / args.frames * 1e3
        results[stage] = {"cum_ms": round(ms, 3),
                          "delta_ms": round(ms - prev, 3),
                          "compile_s": round(compile_s, 1)}
        prev = ms
        print(f"{stage:12s} cum {ms:9.3f} ms  delta "
              f"{results[stage]['delta_ms']:9.3f} ms  "
              f"(compile {compile_s:.0f}s)", file=sys.stderr, flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
