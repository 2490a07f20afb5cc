"""End-to-end: the flagship AudioApp scene renders through ONE jitted
program and produces a sane image (minimum end-to-end slice, SURVEY.md §7
step 3)."""
import numpy as np
import jax.numpy as jnp

from metalrenderer_tpu.config import RenderConfig
from metalrenderer_tpu.engine import audio_app
from metalrenderer_tpu.scene.camera import OrbitCamera

CLEAR = (41.0 / 255.0, 42.0 / 255.0, 48.0 / 255.0)


def _camera(w, h):
    # Pulled-back orbit so cube, light cube, floor and shadow are all in
    # frame (the reference's default camera starts inside the cube's
    # screen footprint).
    return OrbitCamera(radius=5.0, theta=2.5, phi=1.2, aspect=w / h)


def test_audio_app_renders_cube_light_plane():
    cfg = RenderConfig(width=128, height=96, msaa=1, shadow_map_size=128)
    fb, stats = audio_app.render_audio_app(config=cfg, camera=_camera(128, 96))
    fb = np.asarray(fb)
    assert fb.shape == (96, 128, 4)
    assert np.isfinite(fb).all()
    # 26 triangles: 12 cube + 12 light cube + 2 plane (mtl_engine.mm:785,856)
    assert int(stats["num_triangles"]) == 26
    # Something is on screen.
    cov = float(stats["covered_fraction"])
    assert cov > 0.3, cov
    # Background pixels equal the clear color (top corner looks at sky).
    np.testing.assert_allclose(fb[0, 0, :3], CLEAR, atol=1e-5)
    # The floor plane occupies the bottom of the frame and is lit greenish
    # (plane color {.5,.7,.5} * lighting): green channel dominates red.
    bottom = fb[90, 64]
    assert bottom[1] > bottom[0] > 0.05, bottom
    # The x/y precision-envelope detector: the near-clipped floor plane
    # extends well past the viewport but stays far inside the
    # stress-tested ~5e5 px envelope.
    mx = float(stats["max_screen_coord"])
    assert 128.0 < mx < 5e5, mx


def test_displacement_scales_cube():
    cfg = RenderConfig(width=96, height=96, msaa=1, shadow_map_size=64)
    cam = _camera(96, 96)
    fb0, s0 = audio_app.render_audio_app(config=cfg, displacement=0.0,
                                         camera=cam)
    fb1, s1 = audio_app.render_audio_app(config=cfg, displacement=0.8,
                                         camera=cam)
    # A bigger cube covers more pixels (BlinnPhong.metal:23 scaling). The
    # cube is the only orange object: count pixels with red > green.
    def cube_pixels(fb):
        fb = np.asarray(fb)
        return int(((fb[..., 0] > fb[..., 1] + 0.02)).sum())

    assert cube_pixels(fb1) > cube_pixels(fb0)
    assert not np.allclose(np.asarray(fb0), np.asarray(fb1))


def test_msaa_reduces_edge_aliasing():
    cfg1 = RenderConfig(width=96, height=96, msaa=1, shadow_map_size=64)
    cfg4 = RenderConfig(width=96, height=96, msaa=4, shadow_map_size=64)
    cam = _camera(96, 96)
    fb1, _ = audio_app.render_audio_app(config=cfg1, camera=cam)
    fb4, _ = audio_app.render_audio_app(config=cfg4, camera=cam)
    fb1, fb4 = np.asarray(fb1), np.asarray(fb4)
    # 4x MSAA must produce intermediate coverage values along silhouette
    # edges, while the bulk of the image (surface interiors) is unchanged:
    # large max difference, small mean difference.
    diff = np.abs(fb1 - fb4)
    assert diff.max() > 0.05, diff.max()
    assert diff.mean() < 0.02, diff.mean()


def test_shadow_darkens_plane():
    cfg = RenderConfig(width=128, height=96, msaa=1, shadow_map_size=256)
    fb, _ = audio_app.render_audio_app(config=cfg, camera=_camera(128, 96))
    fb = np.asarray(fb)
    # With the pulled-back orbit the cube's shadow falls on the floor:
    # there must exist plane pixels at half the brightness of nearby ones.
    # Identify greenish plane pixels.
    plane_mask = (fb[..., 1] > fb[..., 0]) & (fb[..., 1] > 0.05)
    vals = fb[..., 1][plane_mask]
    assert vals.size > 100
    # Shadowed pixels exist: min green < 0.6 * max green on the plane.
    assert vals.min() < 0.6 * vals.max(), (vals.min(), vals.max())
