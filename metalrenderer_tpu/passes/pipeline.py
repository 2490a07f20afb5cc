"""Two-pass render pipeline: shadow pass + main pass + MSAA resolve,
compiled as ONE XLA program (north-star requirement: zero host round-trips
per frame — unlike the reference, which blocks on ``waitUntilCompleted``
twice per frame, mtl_engine.mm:791,808).

``render(...)`` is pure: scene/camera/lights in, framebuffer + stats out.
The rasterizer backend is pluggable:
  * "reference" — brute-force golden path (raster/reference_cpu.py)
  * "pallas"    — tile-binned Pallas kernels (raster/raster_pallas.py)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import RenderConfig, ShadowConfig
from ..scene import lights as lights_mod
from ..scene.materials import BLINN_PHONG_SHADOW
from ..scene.scene import Scene, bake, project
from ..raster import reference_cpu
from ..raster.geometry import clip_near, guard_clip_xy, setup_triangles
from ..raster.shade import (GBuffer, ShadowContext, channels_from_gbuffer,
                            shade_channels)
from ..utils.pytree import pytree_dataclass


@pytree_dataclass
class PassGeometry:
    """Post-clip, per-pass triangle data consumed by a raster backend.

    Vertex attributes stay in [T, 3, 8] triangle-major form (world xyz |
    uv | normal xyz per vertex): the flat [V, k] form would need a
    (T, 3, k) -> (3T, k) minor-dim-merge reshape, which compiles in O(T)
    on this platform's XLA build (~220 s at config-5 scale) — and every
    consumer immediately splits it back to [T, 3, 8] anyway."""

    vattrs: jnp.ndarray     # f32[T_clipped, 3, 8] world | uv | normal
    mat_kind: jnp.ndarray   # i32[T_clipped]
    mat_color: jnp.ndarray  # f32[T_clipped, 3]
    tex_id: jnp.ndarray     # i32[T_clipped]
    normal_map_id: jnp.ndarray  # i32[T_clipped]


def prepare_main_pass(geom, view, proj, config: RenderConfig,
                      with_stats=False):
    """Project, near-clip, x/y guard-band clip (all with attribute
    interpolation) and set up triangles for the camera pass."""
    clip = project(geom.world, view, proj).reshape(-1, 3, 4)
    attrs = jnp.concatenate(
        [geom.world, geom.uvs, geom.normals], axis=-1
    ).reshape(-1, 3, 8)
    clip2, attrs2, parent = clip_near(clip, attrs)
    if config.xyclip_capacity > 0:
        clip2, attrs2, parent, gstats = guard_clip_xy(
            clip2, attrs2, parent, config.width, config.height,
            cap=config.xyclip_capacity, guard_px=config.guard_band_px)
    else:
        gstats = {"xyclip_triangles": jnp.zeros((), jnp.int32),
                  "xyclip_dropped": jnp.zeros((), jnp.int32)}
    setup = setup_triangles(
        clip2, config.width, config.height,
        cull_backfaces=config.cull_backfaces, near_eps=config.near_eps,
    )
    pg = PassGeometry(
        vattrs=attrs2,
        mat_kind=geom.mat_kind[parent],
        mat_color=geom.mat_color[parent],
        tex_id=geom.tex_id[parent],
        normal_map_id=geom.normal_map_id[parent],
    )
    if with_stats:
        return setup, pg, gstats
    return setup, pg


def _wants_shadow(scene: Scene):
    """Static decision: does any instance cast or receive shadows?"""
    casts = any(i.cast_shadow for i in scene.instances)
    receives = any(
        i.material.kind == BLINN_PHONG_SHADOW for i in scene.instances
    )
    return casts and receives


def _raster_gbuffer_reference(setup, pg: PassGeometry, config: RenderConfig):
    # anchor: evaluate with the Pallas kernel's tile-relative plane
    # arithmetic so z-fight pixels (interpenetrating surfaces) resolve
    # to the same winner in both backends — they are ULP-arbitrary
    # otherwise and capped config 2's TPU parity at 39 dB.
    depth, winner = reference_cpu.rasterize_brute_force(
        setup, config.width, config.height, config.sample_positions,
        anchor=(config.tile_w, config.tile_h)
    )
    return reference_cpu.interpolate_gbuffer(
        setup, winner, config.width, config.height, config.sample_positions,
        pg.vattrs,
        pg.mat_kind, pg.mat_color, pg.tex_id, depth,
        normal_map_id=pg.normal_map_id,
    )


def _raster_depth_reference(setup, size, anchor=None):
    return reference_cpu.rasterize_depth_brute_force(setup, size, size,
                                                     anchor=anchor)


def _get_backend(name):
    if name == "reference":
        return _raster_gbuffer_reference, _raster_depth_reference
    if name == "pallas":
        from ..raster import raster_pallas
        return (raster_pallas.raster_gbuffer, raster_pallas.raster_depth)
    raise ValueError(f"unknown rasterizer backend: {name}")


def _fused_uniforms(m, camera, light_anchor, light, lighting, config):
    """Pack the fused-shade kernel's scalar uniforms (FU_* layout)."""
    return jnp.concatenate([
        m.reshape(-1),
        jnp.asarray(camera.position, jnp.float32),
        light_anchor,
        jnp.asarray(light.color, jnp.float32),
        jnp.asarray(lighting.ambient_intensity, jnp.float32).reshape(1),
        jnp.asarray(lighting.shininess, jnp.float32).reshape(1),
        jnp.asarray(config.clear_color, jnp.float32),
        jnp.asarray(config.shadow_bias, jnp.float32).reshape(1),
        jnp.asarray(config.shadow_factor, jnp.float32).reshape(1),
    ])


def render_frame(scene: Scene, camera, lighting,
                 config: RenderConfig = RenderConfig(),
                 shadow_config: ShadowConfig = ShadowConfig(),
                 displacement=0.0, shadow_target=(0.0, 0.0, 0.0),
                 backend="reference", main_geom=None):
    """Render one frame. Returns (framebuffer f32[H,W,4], stats dict).

    Frame anatomy mirrors MtlEngine::draw (mtl_engine.mm:767-770):
      1. shadow pass: depth-only render of shadow casters from the light
         (renderShadowPass, :772-792) — here WITHOUT a host sync.
      2. main pass: raster + Blinn-Phong shading + shadow test.
      3. MSAA resolve (StoreActionMultisampleResolve semantics, :615).

    ``main_geom`` (optional PackedGeometry) substitutes a pre-baked —
    possibly PRUNED — triangle soup for the MAIN pass only; the shadow
    pass always uses the full scene geometry (a caster outside the
    camera's viewport band still shadows pixels inside it). Used by the
    tile-sharded mode (parallel/sharding.py) to cut per-device work.
    """
    raster_gbuffer, raster_depth = _get_backend(backend)

    geom_full = bake(scene, displacement)
    geom = main_geom if main_geom is not None else geom_full
    light = lighting.light
    is_directional = isinstance(light, lights_mod.DirectionalLight)
    light_anchor = lights_mod.light_anchor_position(
        light, shadow_target, shadow_config)
    stats = {"num_triangles": jnp.asarray(geom.num_triangles, jnp.int32)}

    shadow_ctx = None
    if _wants_shadow(scene):
        light_view = lights_mod.light_view_matrix(
            light_anchor, jnp.asarray(shadow_target, jnp.float32))
        light_proj = lights_mod.light_projection_matrix(shadow_config)
        clip_l = project(geom_full.world, light_view, light_proj)
        clip_l2, _, parent_l = clip_near(clip_l.reshape(-1, 3, 4))
        setup_l = setup_triangles(
            clip_l2, config.shadow_map_size,
            config.shadow_map_size, cull_backfaces=False,
            near_eps=config.near_eps,
        )
        # Only shadow casters contribute (the reference encodes only the
        # cube into the shadow pass, mtl_engine.mm:785-787).
        setup_l = setup_l.replace(
            valid=setup_l.valid & geom_full.cast_shadow[parent_l])
        if backend == "pallas":
            from ..raster import raster_pallas
            depth_sm, _, _, sstats = raster_pallas.rasterize_tiles(
                setup_l, config.shadow_map_size, config.shadow_map_size,
                config.shadow_tile_h, config.shadow_tile_w, ((0.5, 0.5),),
                big_capacity=config.big_capacity, clear_depth=1.0)
            depth_map = depth_sm[0]
            stats["shadow_big_dropped"] = sstats["big_dropped"]
        else:
            depth_map = raster_depth(
                setup_l, config.shadow_map_size,
                anchor=(config.shadow_tile_w, config.shadow_tile_h))
            stats["shadow_big_dropped"] = jnp.zeros((), jnp.int32)
        shadow_ctx = ShadowContext(
            depth_map=depth_map, light_view=light_view, light_proj=light_proj)
        stats["shadow_min_depth"] = jnp.min(depth_map)

    view = camera.view_matrix()
    proj = camera.projection_matrix()
    setup, pass_geom, gstats = prepare_main_pass(geom, view, proj, config,
                                                 with_stats=True)
    stats["culled_triangles"] = jnp.sum(~setup.valid)
    stats.update(gstats)
    # Post-guard-clip diagnostic: with xyclip enabled every valid vertex
    # is within guard_band_px + 1 of the screen (deep inside the f32
    # edge-plane exactness envelope); xyclip_dropped counts the only
    # triangles still relying on the raw envelope.
    stats["max_screen_coord"] = jnp.max(
        jnp.where(setup.valid[:, None, None],
                  jnp.abs(setup.screen), 0.0))

    if backend == "pallas":
        from ..raster import raster_pallas
        # Per-pixel fragment attributes straight out of the kernel when
        # the tile shape allows it: gout (and the whole fragment stage)
        # is then n_samples-x smaller than the supersampled variant.
        attr_px = (config.shading_per_pixel
                   and config.tile_h == 8 and config.tile_w == 128)
        # FUSED-SHADE fast path: raster + fragment stage in one band
        # kernel, G-buffer never leaves VMEM. Covers the untextured
        # Blinn-Phong / emissive / shadow material set with a point
        # light (the flagship AudioApp scene).
        fused_ok = (attr_px and config.fused_shade
                    and len(scene.textures) == 0 and not is_directional)
        if fused_ok:
            if shadow_ctx is not None:
                m = jnp.dot(shadow_ctx.light_proj, shadow_ctx.light_view,
                            precision="highest")
            else:
                m = jnp.zeros((4, 4), jnp.float32)
            funi = _fused_uniforms(m, camera, light_anchor, light,
                                   lighting, config)
            rgba, covf, rstats = raster_pallas.render_fused(
                setup, pass_geom, funi, config.width, config.height,
                tuple(config.sample_positions),
                shadow_map=(shadow_ctx.depth_map
                            if shadow_ctx is not None else None),
                span_cap=config.span_cap,
                big_capacity=config.big_capacity,
                clear_depth=config.clear_depth)
            stats["big_dropped"] = rstats["big_dropped"]
            stats["covered_fraction"] = jnp.mean(covf)
            return rgba, stats
        depth, winner, gout, rstats = raster_pallas.rasterize_tiles(
            setup, config.width, config.height, config.tile_h,
            config.tile_w, tuple(config.sample_positions),
            span_cap=config.span_cap, big_capacity=config.big_capacity,
            clear_depth=config.clear_depth, with_attrs=True,
            pass_geom=pass_geom, attr_px=attr_px)
        if attr_px:
            channels = raster_pallas.channels_from_gout_px(
                gout, len(config.sample_positions))
        else:
            channels = raster_pallas.channels_from_gout(gout, winner)
        # SURVEY §7: caps are counted, never silently dropped — surface
        # the big-list overflow so over-capacity scenes are detectable.
        stats["big_dropped"] = rstats["big_dropped"]
    else:
        gbuf = raster_gbuffer(setup, pass_geom, config)
        channels = channels_from_gbuffer(gbuf)
        stats["big_dropped"] = jnp.zeros((), jnp.int32)

    r, g, b, a = shade_channels(
        channels,
        camera_pos=camera.position,
        light_pos=light_anchor,
        light_dir=(jnp.asarray(light.direction, jnp.float32)
                   if is_directional else None),
        light_color=light.color,
        ambient_intensity=lighting.ambient_intensity,
        shininess=lighting.shininess,
        clear_color=config.clear_color,
        shadow_ctx=shadow_ctx,
        textures=scene.textures,
        shadow_bias=config.shadow_bias,
        shadow_factor_value=config.shadow_factor,
        tiled_sampler=(backend == "pallas"),
        shadow_per_pixel=config.shadow_per_pixel,
        return_planes=True,
        per_pixel=config.shading_per_pixel,
    )
    if r.ndim == 2:
        # Per-pixel fragment mode: coverage already resolved in-shader.
        framebuffer = jnp.stack([r, g, b, a], axis=-1)
    else:
        # MSAA box resolve per channel plane; pack [H, W, 4] exactly once
        # — stacking before the resolve would materialize a [S,H,W,4]
        # minor-4 layout (another ~10x lane-efficiency trap).
        framebuffer = jnp.stack(
            [jnp.mean(c, axis=0) for c in (r, g, b, a)], axis=-1)
    cov = channels.get("cov_frac")
    if cov is None:
        cov = channels["covered"].astype(jnp.float32)
    stats["covered_fraction"] = jnp.mean(cov)
    return framebuffer, stats


@functools.partial(
    jax.jit,
    static_argnames=("config", "shadow_config", "backend"),
)
def render(scene, camera, lighting, config=RenderConfig(),
           shadow_config=ShadowConfig(), displacement=0.0,
           shadow_target=(0.0, 0.0, 0.0), backend="reference"):
    """Jitted entry point — one XLA program per (scene-structure, config)."""
    return render_frame(scene, camera, lighting, config, shadow_config,
                        displacement, shadow_target, backend)


def fused_batch_eligible(scene: Scene, lighting, config: RenderConfig,
                         camera=None) -> bool:
    """Static check: can this (scene, lighting, config) take the
    frame-batched fused path? (Mirrors render_frame's fused_ok plus the
    batch API's orbit-camera requirement when ``camera`` is given.)"""
    ok = (not isinstance(lighting.light, lights_mod.DirectionalLight)
          and len(scene.textures) == 0
          and config.shading_per_pixel and config.fused_shade
          and config.tile_h == 8 and config.tile_w == 128)
    if camera is not None:
        ok = ok and hasattr(camera, "theta")
    return ok


def render_frame_batch_fused(scene: Scene, camera, lighting,
                             config: RenderConfig,
                             shadow_config: ShadowConfig,
                             displacements, thetas,
                             shadow_target=(0.0, 0.0, -1.0),
                             scene_fn=None, lighting_fn=None,
                             frame_params=None, cameras=None):
    """A batch of frames through the fused-shade path in TWO kernel
    launches total (batched shadow pass + batched raster/shade), with
    all prep/binning vectorized across frames — the zero-dispatch
    serving shape (vs one scan step and two launches PER FRAME).

    Eligibility matches render_frame's fused_ok: untextured
    Blinn-Phong/emissive/shadow materials, point light, per-pixel
    shading, 8x128 tiles. Raises ValueError otherwise.

    ``displacements``, ``thetas``: f32[F] per-frame animation params
    (audio displacement scalar; orbit camera angle).

    Per-frame scene/lighting (the audio-reactive serving shape — light
    color/intensity and emissive material follow the audio track):
    pass ``frame_params`` (a pytree with leading axis F) plus
    ``scene_fn(param) -> Scene`` / ``lighting_fn(param) -> Lighting``;
    ``scene``/``lighting`` then serve as the static templates
    (structure, material kinds, LIGHT POSITION — the light anchor must
    be frame-constant; color/intensity may vary).
    Returns (rgba f32[F, H, W, 4], stats with per-frame leaves).
    """
    from ..raster import raster_pallas

    light = lighting.light
    if isinstance(light, lights_mod.DirectionalLight):
        raise ValueError("fused batch path needs a point light")
    if len(scene.textures):
        raise ValueError("fused batch path is untextured-only")
    if not (config.shading_per_pixel and config.fused_shade
            and config.tile_h == 8 and config.tile_w == 128):
        raise ValueError("fused batch path needs per-pixel 8x128 config")

    displacements = jnp.asarray(displacements, jnp.float32)
    thetas = jnp.asarray(thetas, jnp.float32)
    wants_shadow = _wants_shadow(scene)
    shadow_target_a = jnp.asarray(shadow_target, jnp.float32)

    light_anchor = lights_mod.light_anchor_position(
        light, shadow_target, shadow_config)
    if wants_shadow:
        light_view = lights_mod.light_view_matrix(
            light_anchor, shadow_target_a)
        light_proj = lights_mod.light_projection_matrix(shadow_config)
        m = jnp.dot(light_proj, light_view, precision="highest")
    else:
        m = jnp.zeros((4, 4), jnp.float32)

    def prep_frame(disp, theta, param, cam_in):
        sc = scene_fn(param) if scene_fn is not None else scene
        lt = lighting_fn(param) if lighting_fn is not None else lighting
        cam = cam_in if cameras is not None else camera.replace(theta=theta)
        geom = bake(sc, disp)
        out = {}
        if wants_shadow:
            clip_l = project(geom.world, light_view, light_proj)
            clip_l2, _, parent_l = clip_near(clip_l.reshape(-1, 3, 4))
            setup_l = setup_triangles(
                clip_l2, config.shadow_map_size, config.shadow_map_size,
                cull_backfaces=False, near_eps=config.near_eps)
            out["setup_l"] = setup_l.replace(
                valid=setup_l.valid & geom.cast_shadow[parent_l])
        setup, pg = prepare_main_pass(
            geom, cam.view_matrix(), cam.projection_matrix(), config)
        out["setup"], out["pg"] = setup, pg
        out["funi"] = _fused_uniforms(m, cam, light_anchor, lt.light,
                                      lt, config)
        return out

    if frame_params is None:
        frame_params = jnp.zeros_like(displacements)
    batch = jax.vmap(
        prep_frame,
        in_axes=(0, 0, 0, 0 if cameras is not None else None),
    )(displacements, thetas, frame_params,
      cameras if cameras is not None else camera)
    stats = {}

    shadow_maps = None
    if wants_shadow:
        shadow_maps = raster_pallas.rasterize_depth_batch(
            batch["setup_l"], config.shadow_map_size,
            config.shadow_tile_h, config.shadow_tile_w,
            big_capacity=config.big_capacity, clear_depth=1.0)

    rgba, covf, rstats = raster_pallas.render_fused_batch(
        batch["setup"], batch["pg"], batch["funi"],
        config.width, config.height, tuple(config.sample_positions),
        shadow_map_b=shadow_maps,
        span_cap=config.span_cap, big_capacity=config.big_capacity,
        clear_depth=config.clear_depth)
    stats["big_dropped"] = rstats["big_dropped"]        # [F]
    stats["covered_fraction"] = jnp.mean(covf, axis=(1, 2))
    return rgba, stats


def render_frame_batch_hoisted(scene: Scene, camera, lighting,
                               config: RenderConfig,
                               shadow_config: ShadowConfig,
                               displacements, thetas,
                               shadow_target=(0.0, 0.0, -1.0),
                               frame_map=None):
    """Hoisted-prep serving shape: prep + binning for ALL frames run
    ONCE, vectorized across the batch (one vmapped XLA chain), then a
    ``lax.scan`` whose body is only the two per-frame kernel launches.

    Motivation (benchmarks/scan_prep_probe_r05.json, TPU v5e): inside
    the per_frame_scan shape the pure-XLA prep chain (bake, project,
    clip_near, guard clip, setup, binning for both passes) costs
    1.44 ms of the 3.96 ms frame — a long chain of tiny ops that a scan
    re-sequences per frame. Hoisting it out leaves the scan body at the
    kernels' cost while keeping each kernel in its compile-proven
    UNBATCHED shape (the whole-batch fold blows the SMEM scalar-prefetch
    budget — see render_frame_batch_chunked).

    Eligibility matches render_frame's fused_ok (untextured
    Blinn-Phong/emissive/shadow materials, point light, per-pixel
    8x128 tiles); output is BIT-IDENTICAL to per-frame render_frame
    (tests/test_fused_batch.py). ``frame_map``: optional fn(rgba
    f32[H, W, 4]) -> pytree applied inside the scan so long batches
    need not materialize [F, H, W, 4] in HBM. Returns (rgba
    f32[F, H, W, 4] — or stacked frame_map outputs — and stats with
    per-frame leaves).
    """
    from ..raster import raster_pallas
    from ..raster.binning import (bin_triangles, build_attr_fields,
                                  build_tri_fields)

    light = lighting.light
    if isinstance(light, lights_mod.DirectionalLight):
        raise ValueError("hoisted batch path needs a point light")
    if len(scene.textures):
        raise ValueError("hoisted batch path is untextured-only")
    if not (config.shading_per_pixel and config.fused_shade
            and config.tile_h == 8 and config.tile_w == 128):
        raise ValueError("hoisted batch path needs per-pixel 8x128 config")

    displacements = jnp.asarray(displacements, jnp.float32)
    thetas = jnp.asarray(thetas, jnp.float32)
    wants_shadow = _wants_shadow(scene)
    shadow_target_a = jnp.asarray(shadow_target, jnp.float32)
    light_anchor = lights_mod.light_anchor_position(
        light, shadow_target, shadow_config)
    if wants_shadow:
        light_view = lights_mod.light_view_matrix(
            light_anchor, shadow_target_a)
        light_proj = lights_mod.light_projection_matrix(shadow_config)
        m = jnp.dot(light_proj, light_view, precision="highest")
    else:
        m = jnp.zeros((4, 4), jnp.float32)
    S = config.shadow_map_size

    def prep_frame(disp, theta):
        cam = camera.replace(theta=theta)
        geom = bake(scene, disp)
        out = {}
        if wants_shadow:
            clip_l = project(geom.world, light_view, light_proj)
            clip_l2, _, parent_l = clip_near(clip_l.reshape(-1, 3, 4))
            setup_l = setup_triangles(
                clip_l2, S, S, cull_backfaces=False,
                near_eps=config.near_eps)
            setup_l = setup_l.replace(
                valid=setup_l.valid & geom.cast_shadow[parent_l])
            out["setup_l"] = setup_l
            # Mirrors render_frame's shadow rasterize_tiles call: the
            # shadow pass bins with the DEFAULT span cap.
            out["sbins"] = bin_triangles(
                setup_l, build_tri_fields(setup_l), S, S,
                config.shadow_tile_w, config.shadow_tile_h,
                big_capacity=config.big_capacity)
        setup, pg = prepare_main_pass(
            geom, cam.view_matrix(), cam.projection_matrix(), config)
        out["setup"], out["pg"] = setup, pg
        out["mbins"] = bin_triangles(
            setup, build_tri_fields(setup), config.width, config.height,
            config.tile_w, config.tile_h, span_cap=config.span_cap,
            big_capacity=config.big_capacity,
            attr_fields=build_attr_fields(setup, pg))
        out["funi"] = _fused_uniforms(m, cam, light_anchor, light,
                                      lighting, config)
        return out

    batch = jax.vmap(prep_frame)(displacements, thetas)

    def body(carry, xs):
        shadow_map = None
        if wants_shadow:
            depth_sm, _, _, _ = raster_pallas.rasterize_tiles(
                xs["setup_l"], S, S, config.shadow_tile_h,
                config.shadow_tile_w, ((0.5, 0.5),),
                big_capacity=config.big_capacity, clear_depth=1.0,
                bins=xs["sbins"])
            shadow_map = depth_sm[0]
        rgba, covf, rstats = raster_pallas.render_fused(
            xs["setup"], xs["pg"], xs["funi"],
            config.width, config.height,
            tuple(config.sample_positions), shadow_map=shadow_map,
            span_cap=config.span_cap, big_capacity=config.big_capacity,
            clear_depth=config.clear_depth, bins=xs["mbins"])
        out = rgba if frame_map is None else frame_map(rgba)
        return carry, (out, rstats["big_dropped"], jnp.mean(covf))

    _, (outs, big_dropped, covf) = jax.lax.scan(
        body, jnp.float32(0.0), batch)
    return outs, {"big_dropped": big_dropped, "covered_fraction": covf}


def px_batch_eligible(scene: Scene, lighting, config: RenderConfig,
                      camera=None) -> bool:
    """Static check for the TEXTURED frame-batched path: per-pixel
    attr_px raster + batch-transparent XLA shading (the mip sampler and
    the windowed shadow sampler both take frame batches natively)."""
    ok = (config.shading_per_pixel
          and config.tile_h == 8 and config.tile_w == 128)
    if camera is not None:
        ok = ok and hasattr(camera, "theta")
    return ok


def render_frame_batch_px(scene: Scene, camera, lighting,
                          config: RenderConfig,
                          shadow_config: ShadowConfig,
                          displacements, thetas,
                          shadow_target=(0.0, 0.0, -1.0), cameras=None):
    """A batch of TEXTURED (or otherwise non-fused-eligible, shadowless)
    frames in one raster launch + batch-wide XLA shading.

    The attr_px kernel folds frames into its band grid; the shading
    stage is batch-transparent: channel planes carry [F, H, W], the mip
    pyramid sampler natively accepts batched uv grids (one launch per
    texture for ALL frames), and per-frame camera/light uniforms ride
    as [3, F, 1, 1] broadcasts. Returns (rgba f32[F, H, W, 4], stats).
    """
    from ..raster import raster_pallas

    if not px_batch_eligible(scene, lighting, config):
        raise ValueError("scene/config not eligible for the px batch path")

    displacements = jnp.asarray(displacements, jnp.float32)
    thetas = jnp.asarray(thetas, jnp.float32)
    light = lighting.light
    is_directional = isinstance(light, lights_mod.DirectionalLight)
    light_anchor = lights_mod.light_anchor_position(
        light, shadow_target, shadow_config)
    wants_shadow = _wants_shadow(scene)
    if wants_shadow:
        light_view = lights_mod.light_view_matrix(
            light_anchor, jnp.asarray(shadow_target, jnp.float32))
        light_proj = lights_mod.light_projection_matrix(shadow_config)

    def prep_frame(disp, theta, cam_in):
        cam = cam_in if cameras is not None else camera.replace(theta=theta)
        geom = bake(scene, disp)
        out = {}
        if wants_shadow:
            clip_l = project(geom.world, light_view, light_proj)
            clip_l2, _, parent_l = clip_near(clip_l.reshape(-1, 3, 4))
            setup_l = setup_triangles(
                clip_l2, config.shadow_map_size, config.shadow_map_size,
                cull_backfaces=False, near_eps=config.near_eps)
            out["setup_l"] = setup_l.replace(
                valid=setup_l.valid & geom.cast_shadow[parent_l])
        setup, pg = prepare_main_pass(
            geom, cam.view_matrix(), cam.projection_matrix(), config)
        out["setup"], out["pg"] = setup, pg
        out["campos"] = jnp.asarray(cam.position, jnp.float32)
        return out

    batch = jax.vmap(
        prep_frame,
        in_axes=(0, 0, 0 if cameras is not None else None),
    )(displacements, thetas,
      cameras if cameras is not None else camera)
    setup_b, pg_b, campos_b = batch["setup"], batch["pg"], batch["campos"]

    shadow_ctx = None
    if wants_shadow:
        depth_maps = raster_pallas.rasterize_depth_batch(
            batch["setup_l"], config.shadow_map_size,
            config.shadow_tile_h, config.shadow_tile_w,
            big_capacity=config.big_capacity, clear_depth=1.0)
        shadow_ctx = ShadowContext(depth_map=depth_maps,
                                   light_view=light_view,
                                   light_proj=light_proj)

    gout_b, rstats = raster_pallas.rasterize_tiles_batch(
        setup_b, pg_b, config.width, config.height,
        tuple(config.sample_positions),
        span_cap=config.span_cap, big_capacity=config.big_capacity,
        clear_depth=config.clear_depth)

    # channels_from_gout_px indexes attribute rows on axis 0: feed it
    # [GOUT_ROWS, F, H, W] and every channel comes out [F, H, W].
    channels = raster_pallas.channels_from_gout_px(
        gout_b.transpose(1, 0, 2, 3), len(config.sample_positions))

    # Per-frame camera positions broadcast as [3, F, 1, 1] (shade indexes
    # component 0/1/2 on axis 0 and broadcasts against [F, H, W] planes).
    campos = campos_b.T[:, :, None, None]
    r, g, b, a = shade_channels(
        channels,
        camera_pos=campos,
        light_pos=light_anchor,
        light_dir=(jnp.asarray(light.direction, jnp.float32)
                   if is_directional else None),
        light_color=light.color,
        ambient_intensity=lighting.ambient_intensity,
        shininess=lighting.shininess,
        clear_color=config.clear_color,
        shadow_ctx=shadow_ctx,
        textures=scene.textures,
        shadow_bias=config.shadow_bias,
        shadow_factor_value=config.shadow_factor,
        tiled_sampler=True,
        shadow_per_pixel=config.shadow_per_pixel,
        return_planes=True,
        per_pixel=True,
    )
    stats = {"big_dropped": rstats["big_dropped"]}
    stats["covered_fraction"] = jnp.mean(
        channels["cov_frac"], axis=(1, 2))
    return jnp.stack([r, g, b, a], axis=-1), stats


FUSED_CHUNK_FRAMES = 8


def render_frame_batch_chunked(scene: Scene, camera, lighting,
                               config: RenderConfig,
                               shadow_config: ShadowConfig,
                               displacements, thetas,
                               chunk=FUSED_CHUNK_FRAMES,
                               shadow_target=(0.0, 0.0, -1.0),
                               cameras=None, frame_map=None):
    """lax.scan over frame-folded sub-batches of ``chunk`` frames.

    The folded kernels' scalar-prefetch (SMEM) footprint scales with the
    folded frame count — ~80 KB/frame on the flagship scene (band chunk
    ranges + big-triangle side lists + fused uniforms) — so folding a
    long batch whole blows the ~1 MB SMEM budget, and the remote Mosaic
    compile with it (r5 bisect: F=8 compiles, F=32 does not). This shape
    keeps the fold at a compile-proven size while retaining the
    vectorized prep and the two-launches-per-chunk dispatch shape; it is
    the serving default for long batches (render_batch ``chunk`` arg).

    ``frame_map``: optional fn(rgba f32[C, H, W, 4]) -> pytree applied
    INSIDE the scan (a reduction, u8 quantization, ...) so long batches
    need not materialize [F, H, W, 4] f32 in HBM. Returns (rgba
    f32[F, H, W, 4] — or [S, ...] of frame_map outputs — and stats with
    per-frame leaves).
    """
    displacements = jnp.asarray(displacements, jnp.float32)
    thetas = jnp.asarray(thetas, jnp.float32)
    F = displacements.shape[0]
    if F % chunk:
        raise ValueError(f"frame count {F} not divisible by chunk {chunk}")
    s = F // chunk
    fused = fused_batch_eligible(scene, lighting, config,
                                 camera if cameras is None else None)
    if not fused and not px_batch_eligible(
            scene, lighting, config, camera if cameras is None else None):
        raise ValueError("scene/config not eligible for a folded batch")
    fn = render_frame_batch_fused if fused else render_frame_batch_px

    dd = displacements.reshape(s, chunk)
    tt = thetas.reshape(s, chunk)
    if cameras is None:
        xs = (dd, tt, None)
    else:
        xs = (dd, tt, jax.tree.map(
            lambda x: x.reshape((s, chunk) + x.shape[1:]), cameras))

    def body(carry, p):
        d, t, cam = p
        rgba, st = fn(scene, camera, lighting, config, shadow_config,
                      d, t, shadow_target=shadow_target, cameras=cam)
        return carry, (rgba if frame_map is None else frame_map(rgba), st)

    _, (outs, stats) = jax.lax.scan(body, jnp.float32(0.0), xs)
    if frame_map is None:
        outs = outs.reshape((F,) + outs.shape[2:])
    stats = jax.tree.map(
        lambda x: (x.reshape((F,) + x.shape[2:])
                   if x.ndim >= 2 and x.shape[:2] == (s, chunk) else x),
        stats)
    return outs, stats


def render_batch(scene: Scene, camera, lighting,
                 displacements, thetas=None,
                 config: RenderConfig = RenderConfig(),
                 shadow_config: ShadowConfig = ShadowConfig(),
                 shadow_target=(0.0, 0.0, -1.0), cameras=None,
                 backend="pallas", chunk="auto"):
    """Render a batch of frames in the fewest kernel launches available.

    Dispatches to the fused frame-batch (untextured point-light scenes:
    2 launches total), the attr_px frame-batch (textured / shadowed /
    directional scenes: raster + samplers each take the whole batch), or
    a lax.map of per-frame programs (reference backend or non-8x128
    tiles). All paths are bit-identical per frame.

    ``chunk``: "auto" (default) folds long batches in compile-proven
    FUSED_CHUNK_FRAMES sub-batches (see render_frame_batch_chunked —
    whole-batch folds blow the SMEM scalar budget past ~8 frames); an
    int pins the chunk size; None folds the whole batch in one grid.

    ``displacements``: f32[F]; ``thetas``: f32[F] orbit angles (defaults
    to the camera's); ``cameras``: optional stacked camera pytree
    overriding thetas. Returns (rgba f32[F, H, W, 4], stats).
    """
    displacements = jnp.asarray(displacements, jnp.float32)
    F = displacements.shape[0]
    if thetas is None:
        base = getattr(camera, "theta", 0.0)
        thetas = jnp.full((F,), base, jnp.float32)
    if backend == "pallas" and cameras is None and not hasattr(
            camera, "theta"):
        cameras = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (F,) + jnp.shape(x)), camera)
    folded_ok = backend == "pallas" and (
        fused_batch_eligible(scene, lighting, config,
                             camera if cameras is None else None)
        or px_batch_eligible(scene, lighting, config,
                             camera if cameras is None else None))
    if folded_ok:
        c = FUSED_CHUNK_FRAMES if chunk == "auto" else chunk
        if c is not None and F > c and F % c == 0:
            return render_frame_batch_chunked(
                scene, camera, lighting, config, shadow_config,
                displacements, thetas, chunk=c,
                shadow_target=shadow_target, cameras=cameras)
    if backend == "pallas" and fused_batch_eligible(
            scene, lighting, config,
            camera if cameras is None else None):
        return render_frame_batch_fused(
            scene, camera, lighting, config, shadow_config,
            displacements, thetas, shadow_target=shadow_target,
            cameras=cameras)
    if backend == "pallas" and px_batch_eligible(
            scene, lighting, config,
            camera if cameras is None else None):
        return render_frame_batch_px(
            scene, camera, lighting, config, shadow_config,
            displacements, thetas, shadow_target=shadow_target,
            cameras=cameras)

    def one(args):
        disp, theta, cam = args
        if cameras is None:
            cam = (camera.replace(theta=theta)
                   if hasattr(camera, "theta") else camera)
        return render_frame(scene, cam, lighting, config, shadow_config,
                            disp, shadow_target, backend)

    cams_in = cameras if cameras is not None else jax.tree.map(
        lambda x: jnp.broadcast_to(x, (F,) + jnp.shape(x)), camera)
    fbs, stats = jax.lax.map(one, (displacements, thetas, cams_in))
    return fbs, stats
