"""Gather-free tiled sampler vs the plain bilinear reference."""
import numpy as np
import jax.numpy as jnp

from metalrenderer_tpu.raster import sample_pallas, sampling


def _coherent_uv(h, w, u0=0.2, u1=0.4, v0=0.6, v1=0.72, seed=0):
    rng = np.random.default_rng(seed)
    u = (np.linspace(u0, u1, w)[None, :]
         + np.linspace(0, 0.05, h)[:, None]).astype(np.float32)
    v = (np.linspace(v0, v1, h)[:, None]
         + 0.01 * rng.uniform(size=(h, w))).astype(np.float32)
    return jnp.asarray(u), jnp.asarray(v)


def test_matches_reference_clamp_and_repeat():
    rng = np.random.default_rng(0)
    tex = jnp.asarray(rng.uniform(size=(512, 512)).astype(np.float32))
    u, v = _coherent_uv(48, 256)
    for mode in (sampling.CLAMP, sampling.REPEAT):
        ref = sampling.sample_bilinear(tex[..., None], u, v, mode)[..., 0]
        out = sample_pallas.sample_bilinear_tiled(tex, u, v, mode)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)


def test_small_texture_tiles_up():
    rng = np.random.default_rng(1)
    tex = jnp.asarray(rng.uniform(size=(32, 32)).astype(np.float32))
    u, v = _coherent_uv(16, 128)
    ref = sampling.sample_bilinear(tex[..., None], u, v,
                                   sampling.REPEAT)[..., 0]
    out = sample_pallas.sample_bilinear_tiled(tex, u, v, sampling.REPEAT)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_non_tile_aligned_grid():
    rng = np.random.default_rng(2)
    tex = jnp.asarray(rng.uniform(size=(256, 512)).astype(np.float32))
    u, v = _coherent_uv(37, 201)
    ref = sampling.sample_bilinear(tex[..., None], u, v,
                                   sampling.CLAMP)[..., 0]
    out = sample_pallas.sample_bilinear_tiled(tex, u, v, sampling.CLAMP)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_window_clamp_fallback_is_bounded():
    """A tile whose footprint exceeds the window clamps to the border —
    values must stay within the texture's value range (no garbage)."""
    rng = np.random.default_rng(3)
    tex = jnp.asarray(rng.uniform(0.25, 0.75, size=(512, 512))
                      .astype(np.float32))
    # Huge incoherent spread inside single tiles.
    u = jnp.asarray(rng.uniform(0, 1, size=(8, 128)).astype(np.float32))
    v = jnp.asarray(rng.uniform(0, 1, size=(8, 128)).astype(np.float32))
    out = np.asarray(sample_pallas.sample_bilinear_tiled(
        tex, u, v, sampling.CLAMP))
    assert out.min() >= 0.25 - 1e-5 and out.max() <= 0.75 + 1e-5
