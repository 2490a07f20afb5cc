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
    covered: jnp.ndarray    # bool[...] any geometry at this sample


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


def shadow_factor(world, shadow_ctx: ShadowContext, bias=0.005, factor=0.5):
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
    d = sampling.sample_bilinear(
        shadow_ctx.depth_map[..., None], u, v, sampling.REPEAT
    )[..., 0]
    shadowed = (shadow_depth - bias) > d
    return jnp.where(in_bounds & shadowed, factor, 1.0)


def resolve_base_color(mat_color, tex_id, uv, textures):
    """Material base color, overridden by a texture sample when tex_id >= 0.

    ``textures``: static tuple of mip pyramids (tuples of f32[H,W,4]).
    The texture replaces materialColor (Metal-Tutorial textured path).
    """
    color = mat_color
    for i, mips in enumerate(textures):
        tex_rgb = sampling.sample_bilinear(mips[0], uv[..., 0], uv[..., 1])[..., :3]
        color = jnp.where((tex_id == i)[..., None], tex_rgb, color)
    return color


def shade(gbuf: GBuffer, camera_pos, light_pos, light_color,
          ambient_intensity, shininess, clear_color,
          shadow_ctx: ShadowContext = None, textures=(),
          shadow_bias=0.005, shadow_factor_value=0.5):
    """Full fragment stage -> f32[..., 4] RGBA."""
    camera_pos = jnp.asarray(camera_pos, jnp.float32)
    light_pos = jnp.asarray(light_pos, jnp.float32)
    light_color = jnp.asarray(light_color, jnp.float32)

    base = resolve_base_color(gbuf.mat_color, gbuf.tex_id, gbuf.uv, textures)

    lit = blinn_phong(gbuf.world, gbuf.normal, base, camera_pos, light_pos,
                      light_color, ambient_intensity, shininess)
    rgb = jnp.where((gbuf.mat_kind == EMISSIVE)[..., None], base, lit)
    rgba = jnp.concatenate([rgb, jnp.ones_like(rgb[..., :1])], axis=-1)

    if shadow_ctx is not None:
        sf = shadow_factor(gbuf.world, shadow_ctx, shadow_bias,
                           shadow_factor_value)
        # fragColor * shadow multiplies all four channels
        # (BlinnPhong.metal:96).
        apply = (gbuf.mat_kind == BLINN_PHONG_SHADOW)
        rgba = jnp.where(apply[..., None], rgba * sf[..., None], rgba)

    clear = jnp.asarray(clear_color, jnp.float32)
    return jnp.where(gbuf.covered[..., None], rgba, clear)
