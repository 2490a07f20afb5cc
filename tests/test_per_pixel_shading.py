"""Per-pixel fragment shading (Metal semantics) + big-list overflow stats.

Metal runs the fragment shader once per fragment and resolves per-sample
coverage in hardware (BlinnPhong.metal:40-97 fragment functions;
mtl_engine.mm:615 StoreActionMultisampleResolve). The renderer's
``shading_per_pixel`` config reproduces that; the supersampled variant
(shade every MSAA sample) remains available for comparison.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import metalrenderer_tpu as mr
from metalrenderer_tpu.config import RenderConfig, ShadowConfig
from metalrenderer_tpu.engine import audio_app
from metalrenderer_tpu.math import transforms
from metalrenderer_tpu.passes.pipeline import render_frame
from metalrenderer_tpu.scene.camera import OrbitCamera


def _psnr(a, b):
    mse = np.mean((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2)
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def _render(cfg):
    cam = OrbitCamera(radius=5.0, theta=2.5, phi=1.2,
                      aspect=cfg.width / cfg.height)
    fb, _ = audio_app.render_audio_app(config=cfg, camera=cam,
                                       backend="reference")
    return np.asarray(fb)


def test_per_pixel_close_to_supersampled():
    """The two fragment-rate modes differ only at attribute gradients and
    partially-covered edge pixels — globally they stay close."""
    base = dict(width=96, height=72, msaa=4, shadow_map_size=128)
    fb_px = _render(RenderConfig(**base, shading_per_pixel=True))
    fb_ss = _render(RenderConfig(**base, shading_per_pixel=False))
    assert _psnr(fb_px[..., :3], fb_ss[..., :3]) >= 28.0


def test_per_pixel_noop_at_msaa1():
    base = dict(width=96, height=72, msaa=1, shadow_map_size=128)
    fb_px = _render(RenderConfig(**base, shading_per_pixel=True))
    fb_ss = _render(RenderConfig(**base, shading_per_pixel=False))
    np.testing.assert_array_equal(fb_px, fb_ss)


def test_per_pixel_interior_coverage_resolve():
    """A pixel fully covered by one triangle carries exactly the fragment
    color; an uncovered pixel carries exactly the clear color."""
    cfg = RenderConfig(width=96, height=72, msaa=4, shadow_map_size=128)
    cam = OrbitCamera(radius=5.0, theta=2.5, phi=1.2, aspect=96 / 72)
    fb, _ = audio_app.render_audio_app(config=cfg, camera=cam,
                                       backend="reference")
    fb = np.asarray(fb)
    clear = np.asarray(cfg.clear_color, np.float32)
    # Corner pixels are background: exact clear color, alpha included.
    np.testing.assert_allclose(fb[0, 0], clear, rtol=0, atol=1e-6)
    np.testing.assert_allclose(fb[0, -1], clear, rtol=0, atol=1e-6)
    assert np.isfinite(fb).all()


def _big_overflow_scene(n_tris):
    """n_tris submission-ordered full-screen triangles (every one 'big')."""
    tri = np.array([[-30.0, -30.0, 0.0], [30.0, -30.0, 0.0],
                    [0.0, 40.0, 0.0]], np.float32)
    pos = np.concatenate([tri + [0, 0, -0.001 * i] for i in range(n_tris)])
    n = pos.shape[0]
    mesh = mr.Mesh(positions=jnp.asarray(pos),
                   uvs=jnp.zeros((n, 2), jnp.float32),
                   normals=jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1)))
    return mr.Scene(instances=(mr.Instance(
        mesh=mesh, model_matrix=transforms.translation(0, 0, 0),
        material=mr.Material(color=jnp.ones(3), kind=mr.BLINN_PHONG)),))


def test_big_list_overflow_surfaced_in_stats():
    """SURVEY §7: over-capacity big lists must be COUNTED in the frame
    stats, not silently dropped inside the kernel API."""
    scene = _big_overflow_scene(40)
    cam = OrbitCamera(radius=3.0, theta=0.0, phi=np.pi / 2, aspect=1.0)
    cfg = RenderConfig(width=128, height=32, msaa=1, shadow_map_size=64,
                       span_cap=1, big_capacity=32, cull_backfaces=False)
    _, stats = render_frame(scene, cam, mr.Lighting.default(), cfg,
                            ShadowConfig(), backend="pallas")
    assert int(stats["big_dropped"]) == 40 - 32


def test_big_list_within_capacity_reports_zero():
    scene = _big_overflow_scene(4)
    cam = OrbitCamera(radius=3.0, theta=0.0, phi=np.pi / 2, aspect=1.0)
    cfg = RenderConfig(width=128, height=32, msaa=1, shadow_map_size=64,
                       span_cap=1, big_capacity=32, cull_backfaces=False)
    fb, stats = render_frame(scene, cam, mr.Lighting.default(), cfg,
                             ShadowConfig(), backend="pallas")
    assert int(stats["big_dropped"]) == 0
    assert np.isfinite(np.asarray(fb)).all()
