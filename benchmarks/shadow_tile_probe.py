#!/usr/bin/env python
"""Shadow depth-pass tuning sweep (flagship lever, VERDICT r4 item 1).

The 1024^2 depth-only shadow pass is the dominant residual cost of the
flagship frame (profile_stages round-3 attribution). Its band kernel
runs height/tile_h grid bands; the caster imprint (the 12-triangle
cube) occupies a small fraction, so most bands only clear depth — the
per-grid-step overhead, not bandwidth, is the suspected cost. This
probe times JUST the shadow raster for tile_h in {32, 64, 128} (and
both the single-frame and the 16-frame-scan shapes), one JSON line
each, so the config default can be flipped on measured data.

Run on real TPU: python benchmarks/shadow_tile_probe.py
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
from metalrenderer_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
import jax.numpy as jnp

from metalrenderer_tpu.config import ShadowConfig
from metalrenderer_tpu.engine import audio_app
from metalrenderer_tpu.raster import raster_pallas
from metalrenderer_tpu.raster.geometry import clip_near, setup_triangles
from metalrenderer_tpu.scene import lights as lights_mod
from metalrenderer_tpu.scene.lights import Lighting
from metalrenderer_tpu.scene.scene import bake, project

SIZE = 1024
FRAMES = 16
REPS = 3


def shadow_depth(scene, disp, tile_h):
    lighting = Lighting.default()
    shadow_config = ShadowConfig()
    target = jnp.asarray([0.0, 0.0, -1.0])
    anchor = lights_mod.light_anchor_position(lighting.light, target,
                                              shadow_config)
    geom = bake(scene, disp)
    light_view = lights_mod.light_view_matrix(anchor, target)
    light_proj = lights_mod.light_projection_matrix(shadow_config)
    clip_l = project(geom.world, light_view, light_proj)
    clip_l2, _, parent_l = clip_near(clip_l.reshape(-1, 3, 4))
    setup_l = setup_triangles(clip_l2, SIZE, SIZE, cull_backfaces=False)
    setup_l = setup_l.replace(
        valid=setup_l.valid & geom.cast_shadow[parent_l])
    depth, _, _, _ = raster_pallas.rasterize_tiles(
        setup_l, SIZE, SIZE, tile_h, 128, ((0.5, 0.5),),
        big_capacity=256, clear_depth=1.0)
    return depth[0]


def main():
    scene = audio_app.build_scene()
    for tile_h in (32, 64, 128):
        for shape in ("single", "scan16"):
            if shape == "single":
                @jax.jit
                def run(scene, disp, th=tile_h):
                    return jnp.sum(shadow_depth(scene, disp, th))
                args = (scene, jnp.float32(0.02))
            else:
                @jax.jit
                def run(scene, disps, th=tile_h):
                    def one(c, d):
                        return c + jnp.sum(shadow_depth(scene, d, th)), None
                    tot, _ = jax.lax.scan(one, jnp.float32(0.0),
                                          disps)
                    return tot
                args = (scene, jnp.linspace(0.0, 0.05, FRAMES))
            try:
                t0 = time.perf_counter()
                out = float(jax.block_until_ready(run(*args)))
                compile_s = time.perf_counter() - t0
                best = float("inf")
                for _ in range(REPS):
                    t0 = time.perf_counter()
                    jax.block_until_ready(run(*args))
                    best = min(best, time.perf_counter() - t0)
                n = FRAMES if shape == "scan16" else 1
                print(json.dumps({
                    "tile_h": tile_h, "shape": shape,
                    "ms_per_map": round(best / n * 1e3, 3),
                    "compile_s": round(compile_s, 1),
                    "checksum": round(out, 2),
                }), flush=True)
            except Exception as e:
                print(json.dumps({"tile_h": tile_h, "shape": shape,
                                  "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
