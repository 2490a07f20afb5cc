"""Texture + OBJ asset IO tests (SURVEY.md §2 Texture loader / geometry)."""
import numpy as np
import jax.numpy as jnp

from metalrenderer_tpu.io import obj, textures
from metalrenderer_tpu.raster import sampling
from metalrenderer_tpu.scene import mesh as mesh_mod


def test_mipmap_chain_shapes_and_means():
    base = jnp.asarray(np.random.default_rng(0)
                       .uniform(size=(64, 32, 4)).astype(np.float32))
    mips = textures.build_mipmaps(base)
    assert mips[0].shape == (64, 32, 4)
    assert mips[1].shape == (32, 16, 4)
    assert mips[-1].shape == (1, 1, 4)
    # Box filter preserves the mean at every level.
    m0 = float(jnp.mean(mips[0][..., 0]))
    for m in mips[1:]:
        np.testing.assert_allclose(float(jnp.mean(m[..., 0])), m0, rtol=1e-4)


def test_bilinear_sampling_interpolates():
    tex = jnp.zeros((2, 2, 1)).at[0, 0, 0].set(1.0)
    # Sample exactly between the four texels -> average 0.25.
    v = sampling.sample_bilinear(tex, jnp.float32(0.5), jnp.float32(0.5))
    np.testing.assert_allclose(float(v[0]), 0.25, atol=1e-6)
    # At texel center -> exact value.
    v = sampling.sample_bilinear(tex, jnp.float32(0.25), jnp.float32(0.25))
    np.testing.assert_allclose(float(v[0]), 1.0, atol=1e-6)


def test_repeat_addressing_wraps():
    tex = jnp.zeros((2, 2, 1)).at[0, 0, 0].set(1.0)
    a = sampling.sample_nearest(tex, jnp.float32(0.1), jnp.float32(0.1))
    b = sampling.sample_nearest(tex, jnp.float32(1.1), jnp.float32(-0.9))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_trilinear_blends_levels():
    mips = (jnp.ones((4, 4, 1)), jnp.zeros((2, 2, 1)) + 0.5,
            jnp.zeros((1, 1, 1)))
    v0 = sampling.sample_trilinear(mips, jnp.float32(0.5), jnp.float32(0.5),
                                   jnp.float32(0.0))
    v1 = sampling.sample_trilinear(mips, jnp.float32(0.5), jnp.float32(0.5),
                                   jnp.float32(1.0))
    vh = sampling.sample_trilinear(mips, jnp.float32(0.5), jnp.float32(0.5),
                                   jnp.float32(0.5))
    np.testing.assert_allclose(float(v0[0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(v1[0]), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(vh[0]), 0.75, atol=1e-6)


def test_checkerboard_texture():
    mips = textures.checkerboard(size=16, squares=4)
    assert mips[0].shape == (16, 16, 4)
    top_left = np.asarray(mips[0][0, 0, :3])
    np.testing.assert_allclose(top_left, [1, 1, 1], atol=1e-6)


def test_obj_roundtrip(tmp_path):
    cube = mesh_mod.cube()
    p = tmp_path / "cube.obj"
    obj.save_obj(p, cube)
    back = obj.load_obj(p)
    np.testing.assert_allclose(np.asarray(back.positions),
                               np.asarray(cube.positions), atol=1e-5)
    np.testing.assert_allclose(np.asarray(back.uvs),
                               np.asarray(cube.uvs), atol=1e-5)
    np.testing.assert_allclose(np.asarray(back.normals),
                               np.asarray(cube.normals), atol=1e-5)


def test_obj_quad_fan_triangulation(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1 2 3 4\n")
    m = obj.load_obj(p)
    assert m.num_triangles == 2
    # Generated flat normals point +Z (CCW quad).
    np.testing.assert_allclose(np.asarray(m.normals[0]), [0, 0, 1],
                               atol=1e-6)


def test_textured_cube_renders(tmp_path):
    """BASELINE config 1: textured cube + Blinn-Phong point light."""
    import metalrenderer_tpu as mr
    from metalrenderer_tpu.config import RenderConfig
    from metalrenderer_tpu.math import transforms
    from metalrenderer_tpu.scene.camera import OrbitCamera
    from metalrenderer_tpu.scene.lights import Lighting

    tex = textures.checkerboard(size=32, squares=4,
                                color_a=(1, 0, 0), color_b=(0, 0, 1))
    scene = mr.Scene(
        instances=(mr.Instance(
            mesh=mr.cube(), model_matrix=transforms.translation(0, 0, 0),
            material=mr.Material(color=jnp.ones(3), kind=mr.BLINN_PHONG,
                                 texture_id=0)),),
        textures=(tex,))
    cam = OrbitCamera(radius=2.5, theta=2.5, phi=1.2, aspect=1.0)
    cfg = RenderConfig(width=96, height=96, msaa=1, shadow_map_size=64)
    fb, stats = mr.render(scene, cam, Lighting.default(), cfg)
    fb = np.asarray(fb)
    assert np.isfinite(fb).all()
    # The checker must produce BOTH red-dominant and blue-dominant pixels.
    cube_px = fb[..., :3][np.asarray(fb[..., :3]).max(-1) > 0.2]
    reds = (cube_px[:, 0] > cube_px[:, 2] * 1.5).sum()
    blues = (cube_px[:, 2] > cube_px[:, 0] * 1.5).sum()
    assert reds > 20 and blues > 20, (reds, blues)


def test_png_sub_filter_roundtrip_exact():
    """The Sub-filtered fast encode path (io/png.py) must be lossless
    for ANY content (mod-256 delta coding), every channel count."""
    from metalrenderer_tpu.io import png

    rng = np.random.default_rng(7)
    for c in (1, 3, 4):
        img = rng.integers(0, 256, (23, 41, c), np.uint8)
        if c == 1:
            img = img[..., 0]
        for filt in ("sub", "none"):
            out = png.decode_png(png.encode_png(img, row_filter=filt))
            ref = img[..., None] if img.ndim == 2 else img
            np.testing.assert_array_equal(out, ref)


def test_png_sub_filter_is_spec_valid():
    """Cross-check against an independent decoder (PIL) so our encoder
    can't drift into a dialect only our own decoder reads."""
    import io as _io

    PIL_Image = __import__("pytest").importorskip("PIL.Image")
    from metalrenderer_tpu.io import png

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (32, 48, 3), np.uint8)
    got = np.asarray(PIL_Image.open(_io.BytesIO(png.encode_png(img))))
    np.testing.assert_array_equal(got, img)
