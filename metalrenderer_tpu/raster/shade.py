"""Deferred shading: Blinn-Phong + emissive + shadow test over a G-buffer.

Exact port of the reference fragment stage:
  * fragmentBP_NoShadow (BlinnPhong.metal:40-58): ambient + diffuse +
    specular(half-vector, shininess) multiplied by materialColor. The
    interpolated normal is used WITHOUT fragment renormalization, matching
    the reference shader.
  * fragmentBP (BlinnPhong.metal:60-97): same + shadow-map test with
    0.005 bias and 0.5 shadow factor; fragments whose light-space UV falls
    outside [0,1] are fully lit.
  * lightFragmentShader (light.metal:27-29): flat emissive color.

Deviation from the reference (documented): the reference's shadow lookup
uses ``shadowUV = ndc.xy*0.5+0.5`` which ignores Metal's top-left texture
origin (a latent vertical mirror) and compares a remapped depth
``ndc.z*0.5+0.5`` against the raw stored depth. We keep the depth-remap
semantics (bias/factor behave identically for caster!=receiver setups) but
use the self-consistent viewport mapping ``v = (1-ndc.y)/2`` so the lookup
addresses the texel the caster actually rendered to.

Shading is pure elementwise math + gathers; XLA fuses it into the
surrounding program. All arrays broadcast over arbitrary leading dims
(samples x height x width).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..scene.materials import BLINN_PHONG_SHADOW, EMISSIVE
from ..utils.pytree import pytree_dataclass
from . import sampling


def _sample2d(tex_hw, u, v, address_mode, tiled, oob_value=None):
    """Single-channel bilinear sample; ``tiled`` selects the gather-free
    Pallas path (sample_pallas.py) used by the production backend. The
    tiled path requires 2-D [H, W] coordinate grids; callers with leading
    sample dims loop them (python loop at trace time)."""
    if not tiled:
        return sampling.sample_bilinear(tex_hw[..., None], u, v,
                                        address_mode)[..., 0]
    from .sample_pallas import sample_bilinear_tiled
    if u.ndim == 2:
        return sample_bilinear_tiled(tex_hw, u, v, address_mode, oob_value)
    flat_u = u.reshape((-1,) + u.shape[-2:])
    flat_v = v.reshape((-1,) + v.shape[-2:])
    outs = [sample_bilinear_tiled(tex_hw, flat_u[i], flat_v[i], address_mode,
                                  oob_value)
            for i in range(flat_u.shape[0])]
    return jnp.stack(outs).reshape(u.shape)


@pytree_dataclass
class GBuffer:
    """Per-sample geometry buffers produced by the rasterizer."""

    world: jnp.ndarray      # f32[..., 3]
    normal: jnp.ndarray     # f32[..., 3] (interpolated, not renormalized)
    uv: jnp.ndarray         # f32[..., 2]
    depth: jnp.ndarray      # f32[...] NDC z of the visible surface
    mat_kind: jnp.ndarray   # i32[...]
    mat_color: jnp.ndarray  # f32[..., 3]
    tex_id: jnp.ndarray     # i32[...]
    normal_map_id: jnp.ndarray  # i32[...] (-1 = none)
    covered: jnp.ndarray    # bool[...] any geometry at this sample


def apply_normal_maps(gbuf: GBuffer, textures, normal_map_ids,
                      tiled_sampler=False):
    """Perturb G-buffer normals with tangent-space normal maps
    (BASELINE config 4; new capability — the reference has no normal
    mapping).

    Deferred-style TBN: tangent/bitangent come from screen-space
    derivatives of world position and uv (finite differences along the
    framebuffer axes — the TPU equivalent of dFdx/dFdy), so no per-vertex
    tangents are needed. ``normal_map_ids``: i32[...] per-sample normal
    map index (-1 = none).
    """
    if not textures:
        return gbuf

    def ddx(a):
        d = jnp.roll(a, -1, axis=-2 if a.ndim == 3 else a.ndim - 2)
        # axis: second-to-last spatial axis is W for [..., H, W, C]
        return d - a

    # world/uv: [..., H, W, C]; derivatives along W (x) and H (y).
    def diff(a, axis):
        return jnp.roll(a, -1, axis=axis) - a

    wx = diff(gbuf.world, -2)
    wy = diff(gbuf.world, -3)
    ux = diff(gbuf.uv, -2)
    uy = diff(gbuf.uv, -3)

    det = ux[..., 0:1] * uy[..., 1:2] - ux[..., 1:2] * uy[..., 0:1]
    inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tangent = (wx * uy[..., 1:2] - wy * ux[..., 1:2]) * inv
    bitangent = (wy * ux[..., 0:1] - wx * uy[..., 0:1]) * inv

    def safe_norm(v):
        n = jnp.linalg.norm(v, axis=-1, keepdims=True)
        return v / jnp.where(n > 1e-12, n, 1.0)

    t = safe_norm(tangent)
    b = safe_norm(bitangent)
    n = safe_norm(gbuf.normal)

    new_normal = gbuf.normal
    for i, mips in enumerate(textures):
        if tiled_sampler:
            chans = [_sample2d(mips[0][..., c], gbuf.uv[..., 0],
                               gbuf.uv[..., 1], sampling.REPEAT, True)
                     for c in range(3)]
            nm = jnp.stack(chans, axis=-1)
        else:
            nm = sampling.sample_bilinear(
                mips[0], gbuf.uv[..., 0], gbuf.uv[..., 1])[..., :3]
        nm = nm * 2.0 - 1.0              # [0,1] -> [-1,1]
        perturbed = safe_norm(
            t * nm[..., 0:1] + b * nm[..., 1:2] + n * nm[..., 2:3])
        use = (normal_map_ids == i) & gbuf.covered
        new_normal = jnp.where(use[..., None], perturbed, new_normal)
    return gbuf.replace(normal=new_normal)


@pytree_dataclass
class ShadowContext:
    """Shadow pass output consumed by the main pass."""

    depth_map: jnp.ndarray       # f32[S, S] light-space NDC depth
    light_view: jnp.ndarray      # f32[4,4]
    light_proj: jnp.ndarray      # f32[4,4]


def blinn_phong(world, normal, mat_color, camera_pos, light_pos, light_color,
                ambient_intensity, shininess):
    """BlinnPhong.metal:44-57 / :66-77, vectorized."""
    view_dir = camera_pos - world
    view_dir = view_dir / jnp.linalg.norm(view_dir, axis=-1, keepdims=True)
    light_dir = light_pos - world
    light_dir = light_dir / jnp.linalg.norm(light_dir, axis=-1, keepdims=True)
    half_dir = light_dir + view_dir
    half_dir = half_dir / jnp.linalg.norm(half_dir, axis=-1, keepdims=True)

    ambient = ambient_intensity * light_color
    diff = jnp.maximum(jnp.sum(normal * light_dir, axis=-1, keepdims=True), 0.0)
    diffuse = diff * light_color
    spec = jnp.power(
        jnp.maximum(jnp.sum(normal * half_dir, axis=-1, keepdims=True), 0.0),
        shininess,
    )
    specular = light_color * spec
    return (ambient + diffuse + specular) * mat_color


def shadow_factor(world, shadow_ctx: ShadowContext, bias=0.005, factor=0.5,
                  tiled_sampler=False):
    """BlinnPhong.metal:79-96 shadow test, evaluated from world position.

    lightSpacePos is an affine transform of worldPos, so computing it here
    is exactly equivalent to interpolating the per-vertex value (linear maps
    commute with perspective-correct interpolation).
    """
    lvp = jnp.dot(shadow_ctx.light_proj, shadow_ctx.light_view,
                  precision="highest")
    w1 = jnp.concatenate([world, jnp.ones_like(world[..., :1])], axis=-1)
    lsp = jnp.dot(w1, lvp.T, precision="highest")
    proj = lsp[..., :3] / lsp[..., 3:4]
    u = proj[..., 0] * 0.5 + 0.5
    v = (1.0 - proj[..., 1]) * 0.5          # self-consistent viewport mapping
    shadow_depth = proj[..., 2] * 0.5 + 0.5  # reference depth remap quirk
    in_bounds = (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0)
    # oob_value=1.0: pixels outside their tile's sampling window read far
    # depth -> lit (never phantom-shadowed).
    d = _sample2d(shadow_ctx.depth_map, u, v, sampling.REPEAT,
                  tiled_sampler, oob_value=1.0)
    shadowed = (shadow_depth - bias) > d
    return jnp.where(in_bounds & shadowed, factor, 1.0)


def _texture_lod(uv, tex_w, tex_h):
    """Per-pixel isotropic LOD from screen-space uv derivatives (the
    dFdx/dFdy equivalent: finite differences along framebuffer axes)."""
    du_dx = jnp.roll(uv[..., 0], -1, axis=-1) - uv[..., 0]
    dv_dx = jnp.roll(uv[..., 1], -1, axis=-1) - uv[..., 1]
    du_dy = jnp.roll(uv[..., 0], -1, axis=-2) - uv[..., 0]
    dv_dy = jnp.roll(uv[..., 1], -1, axis=-2) - uv[..., 1]
    return sampling.mip_level_from_uv_derivatives(
        du_dx, dv_dx, du_dy, dv_dy, tex_w, tex_h)


def resolve_base_color(mat_color, tex_id, uv, textures,
                       tiled_sampler=False, use_mipmaps=True):
    """Material base color, overridden by a texture sample when tex_id >= 0.

    ``textures``: static tuple of mip pyramids (tuples of f32[H,W,4]).
    The texture replaces materialColor (Metal-Tutorial textured path).

    Mipmapping (config 3): the gather-free tiled path picks the nearest
    mip level per pixel (bilinear within the level — mip-nearest); the
    reference path uses full trilinear. Both derive LOD from screen-space
    uv derivatives.
    """
    color = mat_color
    for i, mips in enumerate(textures):
        n_levels = len(mips)
        if tiled_sampler:
            if use_mipmaps and n_levels > 1:
                lod = _texture_lod(uv, mips[0].shape[1], mips[0].shape[0])
                # Cap the ladder: levels beyond ~6 cover pixels at extreme
                # minification where mip-nearest error is invisible, and
                # each extra level costs 3 sampler launches.
                max_level = min(n_levels, 6) - 1
                level = jnp.clip(jnp.rint(lod).astype(jnp.int32),
                                 0, max_level)
                tex_rgb = None
                for li, mip in enumerate(mips[:max_level + 1]):
                    chans = [_sample2d(mip[..., c], uv[..., 0], uv[..., 1],
                                       sampling.REPEAT, True)
                             for c in range(3)]
                    sampled = jnp.stack(chans, axis=-1)
                    tex_rgb = sampled if tex_rgb is None else jnp.where(
                        (level == li)[..., None], sampled, tex_rgb)
            else:
                chans = [_sample2d(mips[0][..., c], uv[..., 0], uv[..., 1],
                                   sampling.REPEAT, True) for c in range(3)]
                tex_rgb = jnp.stack(chans, axis=-1)
        else:
            if use_mipmaps and n_levels > 1:
                lod = _texture_lod(uv, mips[0].shape[1], mips[0].shape[0])
                tex_rgb = sampling.sample_trilinear(
                    mips, uv[..., 0], uv[..., 1], lod)[..., :3]
            else:
                tex_rgb = sampling.sample_bilinear(
                    mips[0], uv[..., 0], uv[..., 1])[..., :3]
        color = jnp.where((tex_id == i)[..., None], tex_rgb, color)
    return color


def shade(gbuf: GBuffer, camera_pos, light_pos, light_color,
          ambient_intensity, shininess, clear_color,
          shadow_ctx: ShadowContext = None, textures=(),
          shadow_bias=0.005, shadow_factor_value=0.5,
          tiled_sampler=False, normal_map_ids=None,
          shadow_per_pixel=True):
    """Full fragment stage -> f32[..., 4] RGBA."""
    camera_pos = jnp.asarray(camera_pos, jnp.float32)
    light_pos = jnp.asarray(light_pos, jnp.float32)
    light_color = jnp.asarray(light_color, jnp.float32)

    if normal_map_ids is not None:
        gbuf = apply_normal_maps(gbuf, textures, normal_map_ids,
                                 tiled_sampler)

    base = resolve_base_color(gbuf.mat_color, gbuf.tex_id, gbuf.uv, textures,
                              tiled_sampler)

    lit = blinn_phong(gbuf.world, gbuf.normal, base, camera_pos, light_pos,
                      light_color, ambient_intensity, shininess)
    rgb = jnp.where((gbuf.mat_kind == EMISSIVE)[..., None], base, lit)
    rgba = jnp.concatenate([rgb, jnp.ones_like(rgb[..., :1])], axis=-1)

    if shadow_ctx is not None:
        if shadow_per_pixel and gbuf.world.ndim == 4:
            # One shadow evaluation per pixel at the first covered
            # sample's world position (Metal shades fragments per pixel,
            # not per sample).
            world_px = gbuf.world[0]
            cov_any = gbuf.covered[0]
            for si in range(1, gbuf.world.shape[0]):
                use = (~cov_any) & gbuf.covered[si]
                world_px = jnp.where(use[..., None], gbuf.world[si],
                                     world_px)
                cov_any = cov_any | gbuf.covered[si]
            sf = shadow_factor(world_px, shadow_ctx, shadow_bias,
                               shadow_factor_value, tiled_sampler)
            sf = jnp.broadcast_to(sf[None], gbuf.covered.shape)
        else:
            sf = shadow_factor(gbuf.world, shadow_ctx, shadow_bias,
                               shadow_factor_value, tiled_sampler)
        # fragColor * shadow multiplies all four channels
        # (BlinnPhong.metal:96).
        apply = (gbuf.mat_kind == BLINN_PHONG_SHADOW)
        rgba = jnp.where(apply[..., None], rgba * sf[..., None], rgba)

    clear = jnp.asarray(clear_color, jnp.float32)
    return jnp.where(gbuf.covered[..., None], rgba, clear)
