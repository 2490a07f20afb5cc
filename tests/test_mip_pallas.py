"""Batched pyramid sampler (mip_pallas) vs the golden samplers.

The kernel is bit-exact for window-fitting (spatially coherent) inputs
AND for 2-cluster uv-discontinuous tiles (cube-face seams), which get
one window visit per cluster. Only tiles whose footprint defeats even
the 2-way split escalate to a coarser mip level, which stays a valid
convex combination of texel values.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from metalrenderer_tpu.io import textures as tex_mod
from metalrenderer_tpu.raster import sampling
from metalrenderer_tpu.raster.mip_pallas import sample_pyramid_tiled

H, W = 16, 128
YY, XX = np.mgrid[0:H, 0:W]


def coherent_uv():
    u = jnp.asarray(0.1 + 0.8 * XX / W + 0.03 * YY / H, jnp.float32)
    v = jnp.asarray(0.05 + 1.6 * (YY / H) ** 1.3, jnp.float32)
    return u, v


def mips3():
    return tex_mod.checkerboard(size=32, squares=4)[:3]


def test_trilinear_exact_on_coherent_fields():
    mips = mips3()
    u, v = coherent_uv()
    lod = jnp.asarray(0.2 + 1.6 * YY / H, jnp.float32)
    mask = jnp.ones((H, W), bool)
    r, g, b = sample_pyramid_tiled(mips, u, v, lod, mask)
    ref = sampling.sample_trilinear(mips, u, v, lod)
    np.testing.assert_allclose(np.asarray(jnp.stack([r, g, b], -1)),
                               np.asarray(ref[..., :3]), atol=1e-6)


def test_repeat_seam_crossing():
    """Bilinear footprints straddling u=1 blend the WRAPPED texel
    (ADVICE r1: the old windowed sampler could not reach it)."""
    mips = mips3()
    # u hovers around the seam; v coherent.
    u = jnp.asarray(0.96 + 0.08 * XX / W, jnp.float32)   # crosses 1.0
    v = jnp.asarray(0.2 + 0.3 * YY / H, jnp.float32)
    lod = jnp.zeros((H, W))
    mask = jnp.ones((H, W), bool)
    r, g, b = sample_pyramid_tiled(mips, u, v, lod, mask)
    ref = sampling.sample_bilinear(mips[0], u, v, sampling.REPEAT)
    np.testing.assert_allclose(np.asarray(jnp.stack([r, g, b], -1)),
                               np.asarray(ref[..., :3]), atol=1e-6)


def test_clamp_mode_and_single_channel():
    mips = [m[..., :1] for m in mips3()]
    u = jnp.asarray(-0.1 + 1.2 * XX / W, jnp.float32)    # out of range
    v = jnp.asarray(-0.05 + 1.1 * YY / H, jnp.float32)
    lod = jnp.zeros((H, W))
    mask = jnp.ones((H, W), bool)
    (c,) = sample_pyramid_tiled(mips, u, v, lod, mask,
                                sampling.CLAMP, channels=1)
    ref = sampling.sample_bilinear(mips[0], u, v, sampling.CLAMP)
    np.testing.assert_allclose(np.asarray(c), np.asarray(ref[..., 0]),
                               atol=1e-6)


@pytest.mark.slow
def test_masked_pixels_are_inert():
    """Masked-off pixels return 0 and do not distort in-mask windows."""
    mips = mips3()
    # Strictly in [0,1]: a repeat-wrap inside the mask would (correctly)
    # trigger LOD escalation, which is not what this test pins.
    u = jnp.asarray(0.1 + 0.8 * XX / W, jnp.float32)
    v = jnp.asarray(0.1 + 0.6 * YY / H, jnp.float32)
    # Poison the masked-off half with wild coordinates.
    half = jnp.asarray(XX < W // 2)
    u_poison = jnp.where(half, u, u * 37.0 + 5.0)
    v_poison = jnp.where(half, v, v * 29.0 - 3.0)
    lod = jnp.zeros((H, W))
    r, g, b = sample_pyramid_tiled(mips, u_poison, v_poison, lod, half)
    ref = sampling.sample_bilinear(mips[0], u, v)
    got = np.asarray(jnp.stack([r, g, b], -1))
    np.testing.assert_allclose(got[:, :W // 2],
                               np.asarray(ref[..., :3])[:, :W // 2],
                               atol=1e-6)
    assert np.all(got[:, W // 2:] == 0.0)


def test_two_island_tiles_sample_exactly():
    """A tile containing two distant uv islands (the cube-face-seam
    shape that cost config 4 its 40 dB parity bar in the r5 sweep) gets
    one window visit per cluster and matches the dense sampler EXACTLY
    — no LOD escalation, no window-border clamping."""
    mips = tex_mod.checkerboard(size=64, squares=8)
    half = XX < W // 2
    u = jnp.asarray(np.where(half, 0.1 + 0.1 * XX / W, 0.8), jnp.float32)
    v = jnp.asarray(np.where(half, 0.1 + 0.1 * YY / H, 0.9), jnp.float32)
    lod = jnp.zeros((H, W))
    mask = jnp.ones((H, W), bool)
    r, g, b = sample_pyramid_tiled(mips, u, v, lod, mask)
    ref = sampling.sample_trilinear(mips, u, v, lod)
    np.testing.assert_allclose(np.asarray(jnp.stack([r, g, b], -1)),
                               np.asarray(ref[..., :3]), atol=1e-6)


def test_two_island_trilinear_with_mip_fraction():
    """Split visits must respect per-pixel lo/hi tap weights: islands
    with a FRACTIONAL lod blend two levels, each via its own cluster
    window, still matching dense trilinear exactly."""
    mips = tex_mod.checkerboard(size=64, squares=8)
    half = XX < W // 2
    u = jnp.asarray(np.where(half, 0.05 + 0.2 * XX / W, 0.75), jnp.float32)
    v = jnp.asarray(np.where(half, 0.1 + 0.15 * YY / H, 0.85), jnp.float32)
    lod = jnp.asarray(0.3 + 1.2 * YY / H, jnp.float32)
    mask = jnp.ones((H, W), bool)
    r, g, b = sample_pyramid_tiled(mips, u, v, lod, mask)
    ref = sampling.sample_trilinear(mips, u, v, lod)
    np.testing.assert_allclose(np.asarray(jnp.stack([r, g, b], -1)),
                               np.asarray(ref[..., :3]), atol=1e-6)


@pytest.mark.slow
def test_many_island_tiles_escalate_not_corrupt():
    """THREE+ uv islands defeat the 2-way split; those pixels escalate
    to a coarser level — a valid convex combination of texel values,
    never clamped garbage."""
    mips = tex_mod.checkerboard(size=64, squares=8)
    third = W // 3
    u = jnp.asarray(np.where(XX < third, 0.05,
                             np.where(XX < 2 * third, 0.45, 0.9)),
                    jnp.float32)
    v = jnp.asarray(np.where(XX < third, 0.05,
                             np.where(XX < 2 * third, 0.5, 0.92)),
                    jnp.float32)
    lod = jnp.zeros((H, W))
    mask = jnp.ones((H, W), bool)
    r, g, b = sample_pyramid_tiled(mips, u, v, lod, mask)
    got = np.asarray(jnp.stack([r, g, b], -1))
    lo = min(float(m[..., :3].min()) for m in mips)
    hi = max(float(m[..., :3].max()) for m in mips)
    assert got.min() >= lo - 1e-5 and got.max() <= hi + 1e-5
    assert np.isfinite(got).all()


@pytest.mark.slow
def test_batched_sample_grids():
    """[B, H, W] coordinate batches (MSAA grids) in one call."""
    mips = mips3()
    u = jnp.asarray(0.1 + 0.8 * XX / W, jnp.float32)
    v = jnp.asarray(0.1 + 0.6 * YY / H, jnp.float32)
    ub = jnp.stack([u, u + 0.002])
    vb = jnp.stack([v, v + 0.001])
    lod = jnp.zeros((2, H, W))
    mask = jnp.ones((2, H, W), bool)
    r, g, b = sample_pyramid_tiled(mips, ub, vb, lod, mask)
    assert r.shape == (2, H, W)
    ref0 = sampling.sample_bilinear(mips[0], u, v)
    ref1 = sampling.sample_bilinear(mips[0], u + 0.002, v + 0.001)
    np.testing.assert_allclose(np.asarray(r[0]), np.asarray(ref0[..., 0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(r[1]), np.asarray(ref1[..., 0]),
                               atol=1e-6)


def test_matmul_impl_matches_gather_impl():
    """The opt-in one-hot-matmul bilinear (METALRENDERER_MIP_IMPL=matmul,
    built to attack the 956 s config-1 remote Mosaic compile) must
    reproduce the gather implementation: selection is mathematically
    exact in both, so results agree to <= 1 ULP (FMA contraction of the
    shared lerp differs between the two compiled programs)."""
    import os

    import numpy as np

    rng = np.random.default_rng(17)
    mips = []
    s = 32
    while True:
        mips.append(jnp.asarray(rng.random((s, s, 4)), jnp.float32))
        if s == 1:
            break
        s //= 2
    shape = (24, 140)
    u = jnp.asarray(rng.random(shape), jnp.float32)
    v = jnp.asarray(rng.random(shape), jnp.float32)
    lod = jnp.asarray(rng.random(shape) * 2.5, jnp.float32)
    mask = jnp.asarray(rng.random(shape) > 0.2)

    saved = os.environ.pop("METALRENDERER_MIP_IMPL", None)
    try:
        ref = sample_pyramid_tiled(mips, u, v, lod, mask)
        os.environ["METALRENDERER_MIP_IMPL"] = "matmul"
        new = sample_pyramid_tiled(mips, u, v, lod, mask)
    finally:
        if saved is None:
            os.environ.pop("METALRENDERER_MIP_IMPL", None)
        else:
            os.environ["METALRENDERER_MIP_IMPL"] = saved
    for a, b in zip(ref, new):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1.2e-7, rtol=0)
