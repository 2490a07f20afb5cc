#!/usr/bin/env python
"""Compile-TIME attribution at config-5 scale (VERDICT r2 item 3).

Whole-pipeline XLA compiles blocked config 5 (1238 s at 500k@1440p;
1M@4K never finished). This lowers each pipeline stage SEPARATELY from
abstract avals (jax.ShapeDtypeStruct - no host->device transfers) and
times .compile(), so the blowup can be pinned to a stage instead of
guessed at.

Run: python benchmarks/compile_attrib.py [--tris 1000000] [--width 3840]
     [--stages prep,raster,shade,frame]
"""
import argparse
import functools
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
from metalrenderer_tpu.passes.pipeline import (prepare_main_pass,
                                               render_frame)
from metalrenderer_tpu.raster import raster_pallas
from metalrenderer_tpu.raster.geometry import TriangleSetup
from metalrenderer_tpu.scene.scene import bake


def aval(x):
    return jax.ShapeDtypeStruct(x.shape, x.dtype)


def timed_compile(name, fn, *avals):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*avals)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered.compile()
    t_compile = time.perf_counter() - t0
    row = {"stage": name, "lower_s": round(t_lower, 1),
           "compile_s": round(t_compile, 1)}
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=3840)
    ap.add_argument("--height", type=int, default=2160)
    ap.add_argument("--stages", default="prep,raster,shade,frame")
    ap.add_argument("--span-cap", dest="span_cap", default=None)
    args = ap.parse_args()

    scene, camera, lighting, config = cfgs.config5_animated_high_poly(
        target_tris=args.tris, width=args.width, height=args.height)
    stages = args.stages.split(",")
    view = camera.view_matrix()
    proj = camera.projection_matrix()

    # Abstract traces of the intermediates (cheap: eval_shape only).
    def prep(scene, disp):
        geom = bake(scene, disp)
        return prepare_main_pass(geom, view, proj, config)

    disp = jnp.float32(0.02)
    setup_av, pg_av = jax.eval_shape(prep, scene, disp)
    scene_av = jax.tree_util.tree_map(aval, scene)
    results = []
    if "prep" in stages:
        results.append(timed_compile(
            "prep (bake+project+clip+setup)", prep, scene_av, aval(disp)))

    span_cap = (int(args.span_cap) if args.span_cap is not None
                else config.span_cap)
    raster = functools.partial(
        raster_pallas.rasterize_tiles,
        width=config.width, height=config.height, tile_h=config.tile_h,
        tile_w=config.tile_w,
        sample_offsets=tuple(config.sample_positions),
        span_cap=span_cap, big_capacity=config.big_capacity,
        clear_depth=config.clear_depth, with_attrs=True,
        attr_px=(config.shading_per_pixel and config.tile_h == 8
                 and config.tile_w == 128))

    if "binning" in stages:
        from metalrenderer_tpu.raster import binning as binning_mod

        def bin_only(setup, pg):
            fields = binning_mod.build_tri_fields(setup)
            attrs = binning_mod.build_attr_fields(setup, pg)
            return binning_mod.bin_triangles(
                setup, fields, config.width, config.height,
                config.tile_w, config.tile_h, span_cap=span_cap,
                big_capacity=config.big_capacity, attr_fields=attrs)
        results.append(timed_compile(
            f"binning only (span_cap={span_cap})", bin_only,
            setup_av, pg_av))
    if "raster" in stages:
        results.append(timed_compile(
            "raster (binning+kernel)",
            lambda s, pg: raster(s, pass_geom=pg), setup_av, pg_av))

    if "shade" in stages:
        def shade_tail(setup, pg):
            depth, winner, gout, _ = raster(setup, pass_geom=pg)
            ch = raster_pallas.channels_from_gout_px(
                gout, len(config.sample_positions))
            return ch
        results.append(timed_compile(
            "raster+channels", shade_tail, setup_av, pg_av))

    if "frame" in stages:
        def frame(scene, disp):
            fb, _ = render_frame(scene, camera, lighting, config,
                                 ShadowConfig(), disp,
                                 jnp.asarray([0.0, 0.0, -1.0]),
                                 backend="pallas")
            return fb
        results.append(timed_compile(
            "full frame", frame, scene_av, aval(disp)))

    out = pathlib.Path(__file__).parent / "compile_attrib.json"
    out.write_text(json.dumps(results, indent=1) + "\n")


if __name__ == "__main__":
    main()
