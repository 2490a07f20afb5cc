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

TPU layout note: ALL math here runs in structure-of-arrays form — each
vector channel is its own full-width [S, H, W] array. Arrays with a
3-wide minor dimension run at 3/128 lane efficiency on the VPU; the SoA
rewrite of this module took the 1080p shading stage from ~65 ms to
single-digit ms. Channels are sliced from the [..., C] G-buffer once at
entry and packed to RGBA once at exit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..scene.materials import BLINN_PHONG_SHADOW, EMISSIVE
from ..utils.pytree import pytree_dataclass
from . import sampling


def _sample2d(tex_hw, u, v, address_mode, tiled, oob_value=None, mask=None):
    """Single-channel bilinear sample; ``tiled`` selects the gather-free
    Pallas path (sample_pallas.py) used by the production backend. The
    tiled path requires 2-D [H, W] coordinate grids; callers with leading
    sample dims loop them (python loop at trace time). ``mask``: pixels
    that consume the result (tiled path skips maskless tiles; masked-out
    pixels read ``oob_value``)."""
    if not tiled:
        if tex_hw.ndim == 3:
            # Per-frame textures [F, TH, TW] at [F, H, W] grids: vmap the
            # XLA gather sampler across frames.
            return jax.vmap(
                lambda t, uu, vv: sampling.sample_bilinear(
                    t[..., None], uu, vv, address_mode)[..., 0]
            )(tex_hw, u, v)
        return sampling.sample_bilinear(tex_hw[..., None], u, v,
                                        address_mode)[..., 0]
    from .sample_pallas import (sample_bilinear_tiled,
                                sample_bilinear_tiled_batch)
    if tex_hw.ndim == 3:
        # Per-frame textures (the batched shadow maps): one launch for
        # the whole frame batch.
        assert u.ndim == 3 and u.shape[0] == tex_hw.shape[0]
        return sample_bilinear_tiled_batch(tex_hw, u, v, address_mode,
                                           oob_value, mask=mask)
    if u.ndim == 2:
        return sample_bilinear_tiled(tex_hw, u, v, address_mode, oob_value,
                                     mask=mask)
    flat_u = u.reshape((-1,) + u.shape[-2:])
    flat_v = v.reshape((-1,) + v.shape[-2:])
    flat_m = (None if mask is None
              else jnp.broadcast_to(mask, u.shape).reshape(
                  (-1,) + u.shape[-2:]))
    outs = [sample_bilinear_tiled(tex_hw, flat_u[i], flat_v[i], address_mode,
                                  oob_value,
                                  mask=None if flat_m is None else flat_m[i])
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


@pytree_dataclass
class ShadowContext:
    """Shadow pass output consumed by the main pass."""

    depth_map: jnp.ndarray       # f32[S, S] light-space NDC depth
    light_view: jnp.ndarray      # f32[4,4]
    light_proj: jnp.ndarray      # f32[4,4]


def _rsqrt_norm3(x, y, z):
    """1/||v|| for a 3-vector in SoA channels."""
    return jnp.float32(1.0) / jnp.sqrt(x * x + y * y + z * z)


def _blinn_phong_soa(w, n, base, camera_pos, light_pos, light_color,
                     ambient_intensity, shininess, light_dir=None):
    """BlinnPhong.metal:44-57 / :66-77 in SoA channels.

    ``light_dir``: if given (f32[3], pointing FROM the light), the light is
    directional: L = -normalize(light_dir) is constant across fragments
    (BASELINE config 4's sun light — a capability the reference's single
    point light lacks). Otherwise L points at ``light_pos`` per fragment.
    """
    wx, wy, wz = w
    nx, ny, nz = n
    vx = camera_pos[0] - wx
    vy = camera_pos[1] - wy
    vz = camera_pos[2] - wz
    inv = _rsqrt_norm3(vx, vy, vz)
    vx, vy, vz = vx * inv, vy * inv, vz * inv
    if light_dir is not None:
        inv = _rsqrt_norm3(light_dir[0], light_dir[1], light_dir[2])
        lx, ly, lz = (-light_dir[0] * inv, -light_dir[1] * inv,
                      -light_dir[2] * inv)
    else:
        lx = light_pos[0] - wx
        ly = light_pos[1] - wy
        lz = light_pos[2] - wz
        inv = _rsqrt_norm3(lx, ly, lz)
        lx, ly, lz = lx * inv, ly * inv, lz * inv
    hx, hy, hz = lx + vx, ly + vy, lz + vz
    inv = _rsqrt_norm3(hx, hy, hz)
    hx, hy, hz = hx * inv, hy * inv, hz * inv

    diff = jnp.maximum(nx * lx + ny * ly + nz * lz, 0.0)
    spec = jnp.power(jnp.maximum(nx * hx + ny * hy + nz * hz, 0.0),
                     shininess)
    # (ambient + diffuse + specular) shares the lightColor factor.
    s = ambient_intensity + diff + spec
    return (s * light_color[0] * base[0],
            s * light_color[1] * base[1],
            s * light_color[2] * base[2])


def blinn_phong(world, normal, mat_color, camera_pos, light_pos, light_color,
                ambient_intensity, shininess):
    """AoS convenience wrapper (unit tests / external callers)."""
    rgb = _blinn_phong_soa(
        (world[..., 0], world[..., 1], world[..., 2]),
        (normal[..., 0], normal[..., 1], normal[..., 2]),
        (mat_color[..., 0], mat_color[..., 1], mat_color[..., 2]),
        jnp.asarray(camera_pos, jnp.float32),
        jnp.asarray(light_pos, jnp.float32),
        jnp.asarray(light_color, jnp.float32),
        ambient_intensity, shininess)
    return jnp.stack(rgb, axis=-1)


def _shadow_factor_soa(w, shadow_ctx: ShadowContext, bias, factor,
                       tiled_sampler, needs=None):
    """BlinnPhong.metal:79-96. lightSpacePos is an affine transform of
    worldPos, so computing it here is exactly equivalent to interpolating
    the per-vertex value (linear maps commute with perspective-correct
    interpolation)."""
    wx, wy, wz = w
    m = jnp.dot(shadow_ctx.light_proj, shadow_ctx.light_view,
                precision="highest")
    lx = m[0, 0] * wx + m[0, 1] * wy + m[0, 2] * wz + m[0, 3]
    ly = m[1, 0] * wx + m[1, 1] * wy + m[1, 2] * wz + m[1, 3]
    lz = m[2, 0] * wx + m[2, 1] * wy + m[2, 2] * wz + m[2, 3]
    lw = m[3, 0] * wx + m[3, 1] * wy + m[3, 2] * wz + m[3, 3]
    inv_w = 1.0 / lw
    u = lx * inv_w * 0.5 + 0.5
    v = (1.0 - ly * inv_w) * 0.5             # self-consistent viewport map
    shadow_depth = lz * inv_w * 0.5 + 0.5    # reference depth remap quirk
    in_bounds = (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0)
    # oob_value=1.0: pixels outside their tile's sampling window read far
    # depth -> lit (never phantom-shadowed). ``needs`` narrows the work
    # to the fragments whose material actually runs the shadow test
    # (BlinnPhong.metal:60 fragmentBP vs :40 fragmentBP_NoShadow) — the
    # tiled sampler skips tiles with no such pixel entirely.
    mask = in_bounds if needs is None else (in_bounds & needs)
    d = _sample2d(shadow_ctx.depth_map, u, v, sampling.REPEAT,
                  tiled_sampler, oob_value=1.0,
                  mask=mask if tiled_sampler else None)
    shadowed = (shadow_depth - bias) > d
    return jnp.where(in_bounds & shadowed, factor, 1.0)


def shadow_factor(world, shadow_ctx: ShadowContext, bias=0.005, factor=0.5,
                  tiled_sampler=False):
    """AoS wrapper."""
    return _shadow_factor_soa(
        (world[..., 0], world[..., 1], world[..., 2]),
        shadow_ctx, bias, factor, tiled_sampler)


def _texture_lod(u, v, tex_w, tex_h):
    """Per-pixel isotropic LOD from screen-space uv derivatives (the
    dFdx/dFdy equivalent: finite differences along framebuffer axes)."""
    du_dx = jnp.roll(u, -1, axis=-1) - u
    dv_dx = jnp.roll(v, -1, axis=-1) - v
    du_dy = jnp.roll(u, -1, axis=-2) - u
    dv_dy = jnp.roll(v, -1, axis=-2) - v
    return sampling.mip_level_from_uv_derivatives(
        du_dx, dv_dx, du_dy, dv_dy, tex_w, tex_h)


def _sample_rgb(mips, u, v, tiled_sampler, use_mipmaps, mask=None):
    """Texture RGB in SoA channels.

    The tiled (production) path runs mip_pallas.sample_pyramid_tiled: ONE
    kernel launch per texture resolving all channels, mip levels (true
    TRILINEAR — Metal's linear-mip sampler, mtl_engine.mm:603-612) and
    MSAA sample grids; ``mask`` limits work to the pixels that consume
    this texture. The reference path is the XLA-gather golden oracle.
    """
    n_levels = len(mips)
    if tiled_sampler:
        from .mip_pallas import sample_pyramid_tiled, MWIN_H, MWIN_W
        if not (use_mipmaps and n_levels > 1):
            # Truncated chain: the kernel's LOD-escalation escape hatch
            # (bump uv-discontinuous tiles to a coarser level) has no
            # coarser level to go to. A single-level texture larger than
            # the per-tile window could then clamp taps to the window
            # border (wrong texels) on seam/discontinuous tiles — fall
            # back to the exact XLA gather sampler for those textures.
            h0, w0 = mips[0].shape[0], mips[0].shape[1]
            if w0 > MWIN_W - 130 or h0 > MWIN_H - 10:
                t = sampling.sample_bilinear(mips[0], u, v)
                return (t[..., 0], t[..., 1], t[..., 2])
        if use_mipmaps and n_levels > 1:
            lod = _texture_lod(u, v, mips[0].shape[1], mips[0].shape[0])
        else:
            lod = jnp.zeros_like(u)
            mips = mips[:1]
        if mask is None:
            mask = jnp.ones(u.shape, bool)
        return sample_pyramid_tiled(mips, u, v, lod, mask, sampling.REPEAT)
    if use_mipmaps and n_levels > 1:
        lod = _texture_lod(u, v, mips[0].shape[1], mips[0].shape[0])
        t = sampling.sample_trilinear(mips, u, v, lod)
        return (t[..., 0], t[..., 1], t[..., 2])
    t = sampling.sample_bilinear(mips[0], u, v)
    return (t[..., 0], t[..., 1], t[..., 2])


def _resolve_base_color_soa(base, tex_id, u, v, textures, tiled_sampler,
                            use_mipmaps=True):
    for i, mips in enumerate(textures):
        sel = tex_id == i
        tex = _sample_rgb(mips, u, v, tiled_sampler, use_mipmaps, mask=sel)
        base = tuple(jnp.where(sel, tex[c], base[c]) for c in range(3))
    return base


def resolve_base_color(mat_color, tex_id, uv, textures,
                       tiled_sampler=False, use_mipmaps=True):
    """AoS wrapper: texture sample replaces materialColor where
    tex_id >= 0 (Metal-Tutorial textured path)."""
    base = (mat_color[..., 0], mat_color[..., 1], mat_color[..., 2])
    base = _resolve_base_color_soa(base, tex_id, uv[..., 0], uv[..., 1],
                                   textures, tiled_sampler, use_mipmaps)
    return jnp.stack(base, axis=-1)


def _apply_normal_maps_soa(w, n, u, v, covered, textures, normal_map_ids,
                           tiled_sampler):
    """Tangent-space normal mapping from screen-space derivatives
    (BASELINE config 4; new capability — the reference has no normal
    mapping). Deferred-style TBN: tangent/bitangent come from finite
    differences of world position and uv along the framebuffer axes, so
    no per-vertex tangents are needed."""
    if not textures:
        return n

    def ddx(a):
        return jnp.roll(a, -1, axis=-1) - a

    def ddy(a):
        return jnp.roll(a, -1, axis=-2) - a

    wx, wy, wz = w
    dwx_x, dwy_x, dwz_x = ddx(wx), ddx(wy), ddx(wz)
    dwx_y, dwy_y, dwz_y = ddy(wx), ddy(wy), ddy(wz)
    du_x, dv_x = ddx(u), ddx(v)
    du_y, dv_y = ddy(u), ddy(v)

    det = du_x * dv_y - dv_x * du_y
    inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tx = (dwx_x * dv_y - dwx_y * dv_x) * inv
    ty = (dwy_x * dv_y - dwy_y * dv_x) * inv
    tz = (dwz_x * dv_y - dwz_y * dv_x) * inv
    bx = (dwx_y * du_x - dwx_x * du_y) * inv
    by = (dwy_y * du_x - dwy_x * du_y) * inv
    bz = (dwz_y * du_x - dwz_x * du_y) * inv

    def norm3(x, y, z):
        r = jnp.sqrt(x * x + y * y + z * z)
        s = jnp.where(r > 1e-12, 1.0 / r, 0.0)
        return x * s, y * s, z * s

    tx, ty, tz = norm3(tx, ty, tz)
    bx, by, bz = norm3(bx, by, bz)
    nx, ny, nz = norm3(*n)

    out = n
    for i, mips in enumerate(textures):
        use = (normal_map_ids == i) & covered
        # Normal maps are mip-sampled like color textures (both paths):
        # LOD-matched footprints keep the tiled sampler's windows valid
        # and avoid normal aliasing at minification.
        if len(mips) > 1:
            lod = _texture_lod(u, v, mips[0].shape[1], mips[0].shape[0])
        else:
            lod = jnp.zeros_like(u)
        if tiled_sampler:
            from .mip_pallas import sample_pyramid_tiled
            m0, m1, m2 = sample_pyramid_tiled(
                mips, u, v, lod, use, sampling.REPEAT)
        else:
            t = sampling.sample_trilinear(mips, u, v, lod)
            m0, m1, m2 = t[..., 0], t[..., 1], t[..., 2]
        m0 = m0 * 2.0 - 1.0
        m1 = m1 * 2.0 - 1.0
        m2 = m2 * 2.0 - 1.0
        px = tx * m0 + bx * m1 + nx * m2
        py = ty * m0 + by * m1 + ny * m2
        pz = tz * m0 + bz * m1 + nz * m2
        px, py, pz = norm3(px, py, pz)
        use = (normal_map_ids == i) & covered
        out = (jnp.where(use, px, out[0]), jnp.where(use, py, out[1]),
               jnp.where(use, pz, out[2]))
    return out


def apply_normal_maps(gbuf: GBuffer, textures, normal_map_ids,
                      tiled_sampler=False):
    """AoS wrapper retained for compatibility."""
    n = _apply_normal_maps_soa(
        (gbuf.world[..., 0], gbuf.world[..., 1], gbuf.world[..., 2]),
        (gbuf.normal[..., 0], gbuf.normal[..., 1], gbuf.normal[..., 2]),
        gbuf.uv[..., 0], gbuf.uv[..., 1], gbuf.covered, textures,
        normal_map_ids, tiled_sampler)
    return gbuf.replace(normal=jnp.stack(n, axis=-1))


def _select_first_covered(ch, covered):
    """Per-pixel channel planes at the FIRST covered sample.

    Metal invokes the fragment shader once per fragment (per pixel for
    non-centroid attributes), not once per MSAA sample; this reduction
    implements that semantics for the deferred pipeline. Returns
    (2-D channel dict, any-covered bool[H, W])."""
    keys = [k for k in ("wx", "wy", "wz", "nx", "ny", "nz", "u", "v",
                        "kind", "texid", "nmid", "cr", "cg", "cb")
            if ch.get(k) is not None]
    sel = {k: ch[k][0] for k in keys}
    cov_any = covered[0]
    for si in range(1, covered.shape[0]):
        use = (~cov_any) & covered[si]
        for k in keys:
            sel[k] = jnp.where(use, ch[k][si], sel[k])
        cov_any = cov_any | covered[si]
    out = dict(ch, **sel)
    out["covered"] = cov_any
    return out, cov_any


def shade_channels(ch, camera_pos, light_pos, light_color,
                   ambient_intensity, shininess, clear_color,
                   shadow_ctx: ShadowContext = None, textures=(),
                   shadow_bias=0.005, shadow_factor_value=0.5,
                   tiled_sampler=False, shadow_per_pixel=True,
                   return_planes=False, light_dir=None, per_pixel=False):
    """Full fragment stage over SoA channel planes -> f32[..., 4] RGBA.

    ``ch``: dict of full-width planes (each [S, H, W] or broadcastable):
    wx wy wz, nx ny nz, u v, kind, texid, nmid, cr cg cb, covered.
    This is the production entry point — no [..., 3]-minor arrays ever
    exist, which is worth ~10x on shading throughput.

    ``per_pixel``: shade once per PIXEL at the first covered sample's
    attributes (Metal fragment semantics, BlinnPhong.metal:40-97) and
    resolve per-sample coverage into the clear-color blend. Returns
    [H, W] planes / [H, W, 4] in this mode. False = supersampled
    shading over every [S, H, W] sample.
    """
    camera_pos = jnp.asarray(camera_pos, jnp.float32)
    light_pos = jnp.asarray(light_pos, jnp.float32)
    light_color = jnp.asarray(light_color, jnp.float32)

    cov_frac = None
    if per_pixel and ch.get("cov_frac") is not None:
        # Channels already selected per pixel in-kernel (attr_px path);
        # only the per-sample coverage fraction survives for the resolve.
        cov_frac = ch["cov_frac"]
    elif per_pixel and ch["covered"].ndim == 3 and ch["covered"].shape[0] > 1:
        cov_frac = jnp.mean(ch["covered"].astype(jnp.float32), axis=0)
        ch, _ = _select_first_covered(ch, ch["covered"])

    w = (ch["wx"], ch["wy"], ch["wz"])
    n = (ch["nx"], ch["ny"], ch["nz"])
    u, v = ch["u"], ch["v"]
    base = (ch["cr"], ch["cg"], ch["cb"])
    covered = ch["covered"]

    if ch.get("nmid") is not None:
        n = _apply_normal_maps_soa(w, n, u, v, covered, textures,
                                   ch["nmid"], tiled_sampler)

    base = _resolve_base_color_soa(base, ch["texid"], u, v, textures,
                                   tiled_sampler)

    if light_dir is not None:
        light_dir = jnp.asarray(light_dir, jnp.float32)
    lit = _blinn_phong_soa(w, n, base, camera_pos, light_pos, light_color,
                           ambient_intensity, shininess, light_dir)
    emissive = ch["kind"] == EMISSIVE
    r = jnp.where(emissive, base[0], lit[0])
    g = jnp.where(emissive, base[1], lit[1])
    b = jnp.where(emissive, base[2], lit[2])
    a = jnp.ones_like(r)

    if shadow_ctx is not None:
        receives = ch["kind"] == BLINN_PHONG_SHADOW
        # A leading axis means SAMPLES only when the channels weren't
        # already per-pixel-selected in-kernel (attr_px sets cov_frac);
        # the batched-frames path carries [F, H, W] per-pixel planes.
        if (shadow_per_pixel and covered.ndim == 3
                and ch.get("cov_frac") is None):
            # One shadow evaluation per pixel at the first covered
            # sample's world position (Metal shades fragments per pixel,
            # not per sample).
            wx, wy, wz = w[0][0], w[1][0], w[2][0]
            cov_any = covered[0]
            for si in range(1, covered.shape[0]):
                use = (~cov_any) & covered[si]
                wx = jnp.where(use, w[0][si], wx)
                wy = jnp.where(use, w[1][si], wy)
                wz = jnp.where(use, w[2][si], wz)
                cov_any = cov_any | covered[si]
            sf = _shadow_factor_soa((wx, wy, wz), shadow_ctx, shadow_bias,
                                    shadow_factor_value, tiled_sampler,
                                    needs=jnp.any(receives & covered,
                                                  axis=0))
            sf = jnp.broadcast_to(sf[None], covered.shape)
        else:
            sf = _shadow_factor_soa(w, shadow_ctx, shadow_bias,
                                    shadow_factor_value, tiled_sampler,
                                    needs=receives & covered)
        # fragColor * shadow multiplies all four channels
        # (BlinnPhong.metal:96).
        msk = jnp.where(receives, sf, 1.0)
        r, g, b, a = r * msk, g * msk, b * msk, a * msk

    clear = jnp.asarray(clear_color, jnp.float32)
    if cov_frac is not None:
        # Per-sample coverage resolve: every covered sample of a pixel
        # carries the per-pixel fragment color, uncovered samples the
        # clear color; the MSAA box filter reduces to this blend.
        r = r * cov_frac + clear[0] * (1.0 - cov_frac)
        g = g * cov_frac + clear[1] * (1.0 - cov_frac)
        b = b * cov_frac + clear[2] * (1.0 - cov_frac)
        a = a * cov_frac + clear[3] * (1.0 - cov_frac)
    else:
        r = jnp.where(covered, r, clear[0])
        g = jnp.where(covered, g, clear[1])
        b = jnp.where(covered, b, clear[2])
        a = jnp.where(covered, a, clear[3])
    if return_planes:
        return r, g, b, a
    return jnp.stack([r, g, b, a], axis=-1)


def channels_from_gbuffer(gbuf: GBuffer):
    """SoA channel planes from an AoS G-buffer (golden path)."""
    return {
        "wx": gbuf.world[..., 0], "wy": gbuf.world[..., 1],
        "wz": gbuf.world[..., 2],
        "nx": gbuf.normal[..., 0], "ny": gbuf.normal[..., 1],
        "nz": gbuf.normal[..., 2],
        "u": gbuf.uv[..., 0], "v": gbuf.uv[..., 1],
        "kind": gbuf.mat_kind, "texid": gbuf.tex_id,
        "nmid": gbuf.normal_map_id,
        "cr": gbuf.mat_color[..., 0], "cg": gbuf.mat_color[..., 1],
        "cb": gbuf.mat_color[..., 2],
        "covered": gbuf.covered,
    }


def shade(gbuf: GBuffer, camera_pos, light_pos, light_color,
          ambient_intensity, shininess, clear_color,
          shadow_ctx: ShadowContext = None, textures=(),
          shadow_bias=0.005, shadow_factor_value=0.5,
          tiled_sampler=False, normal_map_ids=None,
          shadow_per_pixel=True):
    """AoS wrapper around :func:`shade_channels`."""
    ch = channels_from_gbuffer(gbuf)
    if normal_map_ids is None:
        ch = dict(ch, nmid=None)
    return shade_channels(
        ch, camera_pos, light_pos, light_color, ambient_intensity,
        shininess, clear_color, shadow_ctx, textures, shadow_bias,
        shadow_factor_value, tiled_sampler, shadow_per_pixel)
