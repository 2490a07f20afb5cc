#!/usr/bin/env python
"""Micro-attribution inside rasterize_tiles at flagship scale.

Times variants of the raster call (attrs on/off, msaa 1/4, unfold or
not) as whole-scan programs, isolating where main_raster's ~10 ms goes.
"""
import json
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
from metalrenderer_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
import jax.numpy as jnp

from metalrenderer_tpu.config import RenderConfig
from metalrenderer_tpu.engine import audio_app
from metalrenderer_tpu.scene.camera import OrbitCamera
from metalrenderer_tpu.scene.scene import bake
from metalrenderer_tpu.raster import raster_pallas
from metalrenderer_tpu.passes.pipeline import prepare_main_pass

WIDTH, HEIGHT = 1920, 1080
FRAMES = 64
REPS = 3


def checksum(tree):
    leaves = [jnp.sum(jnp.abs(x.astype(jnp.float32)))
              for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "astype")]
    return sum(leaves)


def time_variant(name, msaa, with_attrs, attr_px=False, span_cap=None):
    config = RenderConfig(width=WIDTH, height=HEIGHT, msaa=msaa)
    camera = OrbitCamera(radius=5.0, theta=2.5, phi=1.2,
                         aspect=WIDTH / HEIGHT)
    scene = audio_app.build_scene()
    view = camera.view_matrix()
    proj = camera.projection_matrix()

    def frame(scene, disp):
        geom = bake(scene, disp)
        setup, pg = prepare_main_pass(geom, view, proj, config)
        depth, winner, gout, _ = raster_pallas.rasterize_tiles(
            setup, config.width, config.height, config.tile_h,
            config.tile_w, tuple(config.sample_positions),
            span_cap=(config.span_cap if span_cap is None else span_cap),
            big_capacity=config.big_capacity,
            clear_depth=config.clear_depth, with_attrs=with_attrs,
            pass_geom=pg if with_attrs else None, attr_px=attr_px)
        if with_attrs:
            return checksum((depth, winner, gout))
        return checksum((depth, winner))

    @jax.jit
    def run(scene, disps):
        def step(c, d):
            return c + frame(scene, d), None
        tot, _ = jax.lax.scan(step, jnp.float32(0.0), disps)
        return tot

    disps = jnp.linspace(0.0, 0.05, FRAMES)
    float(run(scene, disps))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(run(scene, disps))
        best = min(best, time.perf_counter() - t0)
    ms = best / FRAMES * 1e3
    print(f"{name:28s} {ms:8.3f} ms/frame", file=sys.stderr, flush=True)
    return ms


def main():
    out = {}
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "attr_px_msaa4", "attrs_msaa4", "noattrs_msaa4"]
    runners = {
        "attr_px_msaa4": lambda: time_variant(
            "attr_px msaa4 (production)", 4, True, attr_px=True),
        "attr_px_allchunk": lambda: time_variant(
            "attr_px msaa4 span_cap=1000 (no big path)", 4, True,
            attr_px=True, span_cap=1000),
        "noattr_allchunk": lambda: time_variant(
            "no-attrs msaa4 span_cap=1000", 4, False, span_cap=1000),
        "attrs_msaa4": lambda: time_variant(
            "attrs per-sample msaa4", 4, True),
        "noattrs_msaa4": lambda: time_variant("no-attrs msaa4", 4, False),
        "attrs_msaa1": lambda: time_variant("attrs msaa1", 1, True),
        "noattrs_msaa1": lambda: time_variant("no-attrs msaa1", 1, False),
    }
    for n in names:
        out[n] = runners[n]()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
