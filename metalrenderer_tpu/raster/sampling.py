"""Texture sampling: nearest / bilinear / mipmapped-trilinear gathers.

TPU-native replacement for Metal sampler state objects
(mtl_engine.mm:603-612 creates a linear min/mag, repeat-address sampler for
the shadow map; the Metal-Tutorial snapshot used the default sampler for the
grass texture). Textures are plain ``f32[H, W, C]`` arrays in HBM; sampling
is a batched XLA gather.
"""
from __future__ import annotations

import jax.numpy as jnp

REPEAT = "repeat"               # MTL::SamplerAddressModeRepeat
CLAMP = "clamp_to_edge"         # MTL::SamplerAddressModeClampToEdge


def _wrap(idx, size, address_mode):
    if address_mode == REPEAT:
        return jnp.mod(idx, size)
    return jnp.clip(idx, 0, size - 1)


def sample_nearest(tex, u, v, address_mode=REPEAT):
    """tex: f32[H,W,C]; u, v: f32[...] in texture space (u right, v down)."""
    h, w = tex.shape[0], tex.shape[1]
    xi = _wrap(jnp.floor(u * w).astype(jnp.int32), w, address_mode)
    yi = _wrap(jnp.floor(v * h).astype(jnp.int32), h, address_mode)
    return tex[yi, xi]


def sample_bilinear(tex, u, v, address_mode=REPEAT):
    """Bilinear filtering with half-texel-centered footprint
    (MTL::SamplerMinMagFilterLinear semantics)."""
    h, w = tex.shape[0], tex.shape[1]
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = _wrap(x0.astype(jnp.int32), w, address_mode)
    x1i = _wrap(x0.astype(jnp.int32) + 1, w, address_mode)
    y0i = _wrap(y0.astype(jnp.int32), h, address_mode)
    y1i = _wrap(y0.astype(jnp.int32) + 1, h, address_mode)
    t00 = tex[y0i, x0i]
    t10 = tex[y0i, x1i]
    t01 = tex[y1i, x0i]
    t11 = tex[y1i, x1i]
    top = t00 * (1.0 - fx) + t10 * fx
    bot = t01 * (1.0 - fx) + t11 * fx
    return top * (1.0 - fy) + bot * fy


def sample_trilinear(mips, u, v, lod, address_mode=REPEAT):
    """Trilinear: bilinear in two adjacent mip levels, blended by frac(lod).

    ``mips``: tuple of f32[H_i, W_i, C] with mips[0] the base level.
    ``lod``: f32[...] level-of-detail (0 = base).
    """
    n = len(mips)
    if n == 1:
        return sample_bilinear(mips[0], u, v, address_mode)
    lod = jnp.clip(lod, 0.0, n - 1.0)
    lo = jnp.floor(lod)
    frac = (lod - lo)[..., None]
    lo_i = lo.astype(jnp.int32)
    # Static unroll over mip levels (mip count is static) — select per pixel.
    out_lo = sample_bilinear(mips[0], u, v, address_mode)
    out_hi = sample_bilinear(mips[min(1, n - 1)], u, v, address_mode)
    acc_lo = out_lo
    acc_hi = out_hi
    for level in range(1, n):
        s_lo = sample_bilinear(mips[level], u, v, address_mode)
        s_hi = sample_bilinear(mips[min(level + 1, n - 1)], u, v, address_mode)
        sel = (lo_i == level)[..., None]
        acc_lo = jnp.where(sel, s_lo, acc_lo)
        acc_hi = jnp.where(sel, s_hi, acc_hi)
    return acc_lo * (1.0 - frac) + acc_hi * frac


def mip_level_from_uv_derivatives(du_dx, dv_dx, du_dy, dv_dy, tex_w, tex_h):
    """Standard isotropic LOD: log2 of the max screen-space texel footprint."""
    fx = jnp.sqrt((du_dx * tex_w) ** 2 + (dv_dx * tex_h) ** 2)
    fy = jnp.sqrt((du_dy * tex_w) ** 2 + (dv_dy * tex_h) ** 2)
    rho = jnp.maximum(fx, fy)
    return jnp.log2(jnp.maximum(rho, 1e-12))
