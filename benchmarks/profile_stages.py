#!/usr/bin/env python
"""Per-stage attribution of the flagship frame (VERDICT r1 item 2).

Per-dispatch device timing is unreliable on this platform (axon tunnel
latency dominates and degrades after sort/scatter programs), so each
stage is measured as the DELTA between two whole-scan prefix programs:
prefix k runs the pipeline through stage k for a batch of frames inside
one lax.scan and returns a checksum (so nothing dead-code-eliminates).

Caveat: XLA fuses across stage boundaries, so adjacent deltas are an
attribution, not an exact schedule — but they are stable and sum to the
full-frame time, which is what optimization decisions need.
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

from metalrenderer_tpu.config import RenderConfig, ShadowConfig
from metalrenderer_tpu.engine import audio_app
from metalrenderer_tpu.scene import lights as lights_mod
from metalrenderer_tpu.scene.camera import OrbitCamera
from metalrenderer_tpu.scene.lights import Lighting
from metalrenderer_tpu.scene.scene import bake, project
from metalrenderer_tpu.raster import raster_pallas
from metalrenderer_tpu.raster.geometry import clip_near, setup_triangles
from metalrenderer_tpu.raster.shade import ShadowContext, shade_channels
from metalrenderer_tpu.passes.pipeline import prepare_main_pass

WIDTH, HEIGHT = 1920, 1080
FRAMES = 16
REPS = 3


def checksum(tree):
    leaves = [jnp.sum(jnp.abs(x.astype(jnp.float32)))
              for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "astype")]
    return sum(leaves)


def build_stage_fn(stage):
    """Returns frame_fn(scene, disp) -> scalar checksum through `stage`."""
    config = RenderConfig(width=WIDTH, height=HEIGHT, msaa=4,
                          shadow_map_size=1024)
    shadow_config = ShadowConfig()
    camera = OrbitCamera(radius=5.0, theta=2.5, phi=1.2,
                         aspect=WIDTH / HEIGHT)
    lighting = Lighting.default()
    shadow_target = jnp.asarray([0.0, 0.0, -1.0])

    def frame(scene, disp):
        geom = bake(scene, disp)
        light = lighting.light
        light_view = lights_mod.light_view_matrix(light.position,
                                                  shadow_target)
        light_proj = lights_mod.light_projection_matrix(shadow_config)
        clip_l = project(geom.world, light_view, light_proj)
        clip_l2, _, parent_l = clip_near(clip_l.reshape(-1, 3, 4))
        setup_l = setup_triangles(clip_l2, config.shadow_map_size,
                                  config.shadow_map_size,
                                  cull_backfaces=False,
                                  near_eps=config.near_eps)
        setup_l = setup_l.replace(
            valid=setup_l.valid & geom.cast_shadow[parent_l])
        if stage == "prep_shadow_geom":
            return checksum((setup_l.edge, setup_l.z))

        depth_sm, _, _, _ = raster_pallas.rasterize_tiles(
            setup_l, config.shadow_map_size, config.shadow_map_size,
            config.shadow_tile_h, config.shadow_tile_w, ((0.5, 0.5),),
            big_capacity=config.big_capacity, clear_depth=1.0)
        depth_map = depth_sm[0]
        if stage == "shadow_raster":
            return checksum(depth_map)
        shadow_ctx = ShadowContext(depth_map=depth_map,
                                   light_view=light_view,
                                   light_proj=light_proj)

        view = camera.view_matrix()
        proj = camera.projection_matrix()
        setup, pg = prepare_main_pass(geom, view, proj, config)
        if stage == "prep_main_geom":
            return checksum((setup.edge, setup.z, pg.vattrs))

        attr_px = (config.shading_per_pixel
                   and config.tile_h == 8 and config.tile_w == 128)
        depth, winner, gout, _ = raster_pallas.rasterize_tiles(
            setup, config.width, config.height, config.tile_h,
            config.tile_w, tuple(config.sample_positions),
            span_cap=config.span_cap, big_capacity=config.big_capacity,
            clear_depth=config.clear_depth, with_attrs=True, pass_geom=pg,
            attr_px=attr_px)
        if stage == "main_raster":
            return checksum((depth, winner, gout))

        if attr_px:
            channels = raster_pallas.channels_from_gout_px(
                gout, len(config.sample_positions))
        else:
            channels = raster_pallas.channels_from_gout(gout, winner)
        if stage == "channels":
            return checksum(channels)

        def shade_with(ctx):
            return shade_channels(
                channels, camera_pos=camera.position,
                light_pos=light.position, light_color=light.color,
                ambient_intensity=lighting.ambient_intensity,
                shininess=lighting.shininess,
                clear_color=config.clear_color, shadow_ctx=ctx,
                textures=scene.textures, shadow_bias=config.shadow_bias,
                shadow_factor_value=config.shadow_factor,
                tiled_sampler=True,
                shadow_per_pixel=config.shadow_per_pixel,
                return_planes=True,
                per_pixel=config.shading_per_pixel)

        if stage == "shade_noshadow":
            return checksum(shade_with(None))

        r, g, b, a = shade_with(shadow_ctx)
        if stage == "shade_shadow":
            return checksum((r, g, b, a))

        if r.ndim == 2:
            fb = jnp.stack([r, g, b, a], axis=-1)
        else:
            fb = jnp.stack([jnp.mean(c, axis=0) for c in (r, g, b, a)],
                           axis=-1)
        return checksum(fb)  # stage == "resolve"

    return frame


STAGES = ["prep_shadow_geom", "shadow_raster", "prep_main_geom",
          "main_raster", "channels", "shade_noshadow", "shade_shadow",
          "resolve"]


def main():
    scene = audio_app.build_scene()
    disps = jnp.linspace(0.0, 0.05, FRAMES)
    results = {}
    prev = 0.0
    for stage in STAGES:
        frame = build_stage_fn(stage)

        @jax.jit
        def run(scene, disps, frame=frame):
            def step(c, d):
                return c + frame(scene, d), None
            tot, _ = jax.lax.scan(step, jnp.float32(0.0), disps)
            return tot

        float(run(scene, disps))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            tot = float(run(scene, disps))
            best = min(best, time.perf_counter() - t0)
        ms = best / FRAMES * 1e3
        results[stage] = {"cum_ms": round(ms, 3),
                          "delta_ms": round(ms - prev, 3)}
        prev = ms
        print(f"{stage:18s} cum {ms:8.3f} ms   delta {results[stage]['delta_ms']:8.3f} ms",
              file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
