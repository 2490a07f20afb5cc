#!/usr/bin/env python
"""Isolate the config-1 compile mystery (VERDICT r3 weak #5): a
12-triangle textured cube at 512x512 compiled in 956 s on TPU
(results_r02.json) while config 2 (6.5k tris, untextured, 1080p)
compiled in 23 s. Prime suspect: the Mosaic compile of the
mip_pallas trilinear pyramid sampler.

This probe AOT-compiles each piece separately at config-1 shapes and
prints one JSON line per stage: the mip sampler kernel alone, the
frame without texturing (texture_id=-1), and the full textured frame.
Each stage is laddered after the previous so a blowup is attributed,
not just reproduced. Bound the whole run with `timeout` — stages are
independent jits, so a killed run still yields the lines it printed.
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

from benchmarks import configs as cfgs
from metalrenderer_tpu.config import ShadowConfig
from metalrenderer_tpu.passes.pipeline import render_frame


def timed_lower_compile(name, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.perf_counter()
    lowered.compile()
    t2 = time.perf_counter()
    print(json.dumps({"stage": name, "lower_s": round(t1 - t0, 1),
                      "compile_s": round(t2 - t1, 1)}), flush=True)


def main():
    scene, camera, lighting, config = cfgs.config1_textured_cube()

    # Stage 1: the mip sampler kernel alone, at the shapes the config-1
    # frame uses it with (512x512 frame's worth of texture lookups into
    # the 512x512 RGBA pyramid).
    from metalrenderer_tpu.raster.mip_pallas import sample_pyramid_tiled
    mips = scene.textures[0]
    n_px = config.width * config.height

    def sample_only(u, v, lod, mask):
        return sample_pyramid_tiled(mips, u, v, lod, mask)

    shape = (config.height, config.width)
    u = jnp.linspace(0.0, 1.0, n_px).reshape(shape)
    v = jnp.linspace(0.0, 1.0, n_px).reshape(shape)
    lod = jnp.zeros(shape, jnp.float32)
    mask = jnp.ones(shape, bool)
    timed_lower_compile("mip_sampler_alone", sample_only, u, v, lod, mask)

    # Stage 2: config-1 frame with texturing disabled (same geometry,
    # same resolution; material falls back to flat color).
    untex_scene = scene.replace(
        textures=(),
        instances=tuple(
            inst.replace(material=inst.material.replace(texture_id=-1))
            for inst in scene.instances))

    def frame_untextured(scene, camera, lighting):
        fb, _ = render_frame(scene, camera, lighting, config,
                             ShadowConfig(), 0.0,
                             jnp.asarray([0.0, 0.0, -1.0]),
                             backend="pallas")
        return fb

    timed_lower_compile("frame_untextured", frame_untextured,
                        untex_scene, camera, lighting)

    # Stage 3: the full textured config-1 frame (the 956 s reproducer).
    def frame_textured(scene, camera, lighting):
        fb, _ = render_frame(scene, camera, lighting, config,
                             ShadowConfig(), 0.0,
                             jnp.asarray([0.0, 0.0, -1.0]),
                             backend="pallas")
        return fb

    timed_lower_compile("frame_textured", frame_textured,
                        scene, camera, lighting)


if __name__ == "__main__":
    main()
