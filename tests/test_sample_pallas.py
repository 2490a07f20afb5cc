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


def test_out_of_window_footprints_are_exact():
    """Round-4 segment sweep (VERDICT r3 item 3): tiles whose bilinear
    footprint exceeds the VMEM window must still be EXACT — the old
    clamp-and-flag fallback is gone."""
    rng = np.random.default_rng(3)
    tex = jnp.asarray(rng.uniform(0.25, 0.75, size=(512, 512))
                      .astype(np.float32))
    # Huge incoherent spread inside single tiles: guaranteed far beyond
    # any static window.
    u = jnp.asarray(rng.uniform(0, 1, size=(8, 128)).astype(np.float32))
    v = jnp.asarray(rng.uniform(0, 1, size=(8, 128)).astype(np.float32))
    for mode in (sampling.CLAMP, sampling.REPEAT):
        ref = sampling.sample_bilinear(tex[..., None], u, v, mode)[..., 0]
        out = sample_pallas.sample_bilinear_tiled(tex, u, v, mode)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=4e-6)


def test_out_of_window_exact_with_mask():
    """Sweep + mask: masked pixels are exact wherever they land; only
    masked-OUT pixels read oob_value."""
    rng = np.random.default_rng(4)
    tex = jnp.asarray(rng.uniform(size=(1024, 1024)).astype(np.float32))
    u = jnp.asarray(rng.uniform(0, 1, size=(24, 256)).astype(np.float32))
    v = jnp.asarray(rng.uniform(0, 1, size=(24, 256)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(24, 256)) > 0.35)
    ref = sampling.sample_bilinear(tex[..., None], u, v,
                                   sampling.CLAMP)[..., 0]
    out = np.asarray(sample_pallas.sample_bilinear_tiled(
        tex, u, v, sampling.CLAMP, oob_value=1.0, mask=mask))
    m = np.asarray(mask)
    np.testing.assert_allclose(out[m], np.asarray(ref)[m], atol=4e-6)
    np.testing.assert_allclose(out[~m], 1.0)


def test_batched_out_of_window_exact():
    """Frame-batched sampler: per-frame sweep segments stay inside each
    frame's own (vertically stacked) texture."""
    rng = np.random.default_rng(5)
    F = 3
    tex_b = jnp.asarray(rng.uniform(size=(F, 512, 512)).astype(np.float32))
    u = jnp.asarray(rng.uniform(0, 1, size=(F, 16, 128)).astype(np.float32))
    v = jnp.asarray(rng.uniform(0, 1, size=(F, 16, 128)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(F, 16, 128)) > 0.2)
    out = np.asarray(sample_pallas.sample_bilinear_tiled_batch(
        tex_b, u, v, sampling.CLAMP, oob_value=1.0, mask=mask))
    m = np.asarray(mask)
    for f in range(F):
        ref = np.asarray(sampling.sample_bilinear(
            tex_b[f][..., None], u[f], v[f], sampling.CLAMP)[..., 0])
        np.testing.assert_allclose(out[f][m[f]], ref[m[f]], atol=4e-6)
        np.testing.assert_allclose(out[f][~m[f]], 1.0)
