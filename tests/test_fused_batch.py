"""Frame-batched fused rendering == per-frame rendering, bit for bit.

render_frame_batch_fused folds F frames into the band grid of ONE
kernel launch (plus one batched shadow pass); the math per band is
identical to the unbatched kernel, so outputs must be exactly equal.
"""
import numpy as np
import jax.numpy as jnp

from metalrenderer_tpu.config import RenderConfig, ShadowConfig
from metalrenderer_tpu.engine import audio_app
from metalrenderer_tpu.passes.pipeline import (render_frame,
                                               render_frame_batch_fused)
from metalrenderer_tpu.scene.camera import OrbitCamera
from metalrenderer_tpu.scene.lights import Lighting


def test_fused_batch_matches_per_frame():
    cfg = RenderConfig(width=128, height=64, msaa=4, shadow_map_size=64)
    cam = OrbitCamera(radius=5.0, theta=2.5, phi=1.2, aspect=2.0)
    scene = audio_app.build_scene()
    lighting = Lighting.default()
    # Frame 3's displacement blows the cube up past the camera: heavy
    # near-clipping, radically different bins/band ranges per frame.
    disps = jnp.asarray([0.0, 0.35, 5.0], jnp.float32)
    thetas = jnp.asarray([2.5, 2.8, 2.2], jnp.float32)

    rgba_b, stats = render_frame_batch_fused(
        scene, cam, lighting, cfg, ShadowConfig(), disps, thetas)
    assert rgba_b.shape == (3, 64, 128, 4)
    assert stats["big_dropped"].shape == (3,)

    for i in range(3):
        fb, _ = render_frame(scene, cam.replace(theta=float(thetas[i])),
                             lighting, cfg, ShadowConfig(),
                             float(disps[i]), (0.0, 0.0, -1.0),
                             backend="pallas")
        np.testing.assert_array_equal(np.asarray(rgba_b[i]),
                                      np.asarray(fb))


def test_hoisted_batch_matches_per_frame():
    """The hoisted-prep serving shape (vectorized prep/binning + scan of
    unbatched kernel launches) == per-frame rendering, bit for bit —
    including the heavy near-clip divergence frame."""
    from metalrenderer_tpu.passes.pipeline import render_frame_batch_hoisted

    cfg = RenderConfig(width=128, height=64, msaa=4, shadow_map_size=64)
    cam = OrbitCamera(radius=5.0, theta=2.5, phi=1.2, aspect=2.0)
    scene = audio_app.build_scene()
    lighting = Lighting.default()
    disps = jnp.asarray([0.0, 0.35, 5.0], jnp.float32)
    thetas = jnp.asarray([2.5, 2.8, 2.2], jnp.float32)

    rgba_b, stats = render_frame_batch_hoisted(
        scene, cam, lighting, cfg, ShadowConfig(), disps, thetas)
    assert rgba_b.shape == (3, 64, 128, 4)
    assert stats["big_dropped"].shape == (3,)

    for i in range(3):
        fb, _ = render_frame(scene, cam.replace(theta=float(thetas[i])),
                             lighting, cfg, ShadowConfig(),
                             float(disps[i]), (0.0, 0.0, -1.0),
                             backend="pallas")
        np.testing.assert_array_equal(np.asarray(rgba_b[i]),
                                      np.asarray(fb))

    # frame_map reduction path (the bench shape) matches too.
    means, _ = render_frame_batch_hoisted(
        scene, cam, lighting, cfg, ShadowConfig(), disps, thetas,
        frame_map=lambda rgba: jnp.mean(rgba, axis=(0, 1)))
    np.testing.assert_allclose(
        np.asarray(means),
        np.asarray(jnp.mean(rgba_b, axis=(1, 2))), rtol=1e-6)


def test_audio_sequence_batched_matches_per_frame():
    """The audio-reactive serving path (per-frame light color/intensity,
    batched kernels) == the per-frame fused path, bit for bit."""
    import jax
    from metalrenderer_tpu.engine.renderer import (
        audio_visual_track, render_audio_reactive_sequence)
    from metalrenderer_tpu.scene.lights import PointLight

    sr = 48000
    t = np.arange(2048) / sr
    sig = (0.4 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)

    cfg = RenderConfig(width=128, height=64, msaa=1, shadow_map_size=64)
    cam = OrbitCamera(radius=5.0, theta=2.5, phi=1.2, aspect=2.0)
    frames, telem = render_audio_reactive_sequence(
        jnp.asarray(sig), sr, camera=cam, config=cfg, backend="pallas")
    assert frames.shape[0] == 2

    _, _, params, _ = audio_visual_track(jnp.asarray(sig), sr)
    cube = jnp.asarray([0.0, 0.0, -1.0], jnp.float32)
    lpos = jnp.asarray([0.0, 2.0, 0.0], jnp.float32)
    for i in range(2):
        p = jax.tree.map(lambda x: x[i], params)
        scene = audio_app.build_scene(cube, lpos, p.light_color)
        lighting = Lighting(
            light=PointLight(position=lpos, color=p.light_color,
                             intensity=p.light_intensity),
            ambient_intensity=jnp.asarray(0.1, jnp.float32),
            shininess=jnp.asarray(32.0, jnp.float32))
        fb, _ = render_frame(scene, cam, lighting, cfg, ShadowConfig(),
                             p.displacement, cube, backend="pallas")
        np.testing.assert_array_equal(np.asarray(frames[i]),
                                      np.asarray(fb))


def test_px_batch_matches_per_frame_textured():
    """The TEXTURED batched path (frame-folded attr_px raster + batch-
    transparent XLA shading + batched mip sampler) == per-frame."""
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                           / "benchmarks"))
    import configs as bench_configs
    from metalrenderer_tpu.passes.pipeline import render_frame_batch_px

    scene, cam, lighting, cfg = bench_configs.config1_textured_cube()
    cfg = cfg.replace(width=128, height=64, msaa=4, shadow_map_size=64)
    cam = cam.replace(aspect=2.0)

    disps = jnp.asarray([0.0, 0.0], jnp.float32)
    thetas = jnp.asarray([float(cam.theta), float(cam.theta) + 0.4],
                         jnp.float32)
    rgba_b, stats = render_frame_batch_px(
        scene, cam, lighting, cfg, ShadowConfig(), disps, thetas)
    assert rgba_b.shape == (2, 64, 128, 4)

    for i in range(2):
        fb, _ = render_frame(scene, cam.replace(theta=float(thetas[i])),
                             lighting, cfg, ShadowConfig(),
                             0.0, (0.0, 0.0, -1.0), backend="pallas")
        np.testing.assert_array_equal(np.asarray(rgba_b[i]),
                                      np.asarray(fb))


def test_px_batch_matches_per_frame_shadow_normal_map():
    """Config-4 class scene (shadow receiver + normal map) through the
    batched path: frame-folded raster, batched shadow depth pass,
    frame-batched window shadow sampler — still bit-identical."""
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                           / "benchmarks"))
    import configs as bench_configs
    from metalrenderer_tpu.passes.pipeline import render_frame_batch_px

    scene, cam, lighting, cfg = bench_configs.config4_shadow_normal_map()
    cfg = cfg.replace(width=128, height=64, msaa=4, shadow_map_size=64)
    cam = cam.replace(aspect=2.0)

    disps = jnp.asarray([0.0, 0.0], jnp.float32)
    thetas = jnp.asarray([float(cam.theta), float(cam.theta) + 0.3],
                         jnp.float32)
    rgba_b, _ = render_frame_batch_px(
        scene, cam, lighting, cfg, ShadowConfig(), disps, thetas)

    for i in range(2):
        fb, _ = render_frame(scene, cam.replace(theta=float(thetas[i])),
                             lighting, cfg, ShadowConfig(),
                             0.0, (0.0, 0.0, -1.0), backend="pallas")
        np.testing.assert_array_equal(np.asarray(rgba_b[i]),
                                      np.asarray(fb))


def test_camera_path_batched_matches_per_frame():
    """Quaternion-slerp flythrough through the batched fused path ==
    per-frame rendering at the same poses."""
    from metalrenderer_tpu.engine.renderer import render_camera_path

    cfg = RenderConfig(width=128, height=64, msaa=1, shadow_map_size=64)
    scene = audio_app.build_scene()
    lighting = Lighting.default()
    a = OrbitCamera(radius=5.0, theta=2.5, phi=1.2, aspect=2.0)
    b = OrbitCamera(radius=4.0, theta=3.0, phi=1.35, aspect=2.0)
    frames = render_camera_path(scene, lighting, [a, b],
                                frames_per_segment=2, config=cfg,
                                backend="pallas")
    assert frames.shape == (3, 64, 128, 4)
    pa, pb = a.pose(), b.pose()
    for i, tt in enumerate([0.0, 0.5, 1.0]):
        cam = pa.slerp(pb, jnp.float32(tt))
        fb, _ = render_frame(scene, cam, lighting, cfg, ShadowConfig(),
                             0.0, (0.0, 0.0, 0.0), backend="pallas")
        np.testing.assert_array_equal(np.asarray(frames[i]),
                                      np.asarray(fb))


def test_public_render_batch_api():
    """mr.render_batch dispatches to a batched path and matches
    mr.render per frame."""
    import metalrenderer_tpu as mr

    cfg = RenderConfig(width=128, height=64, msaa=1, shadow_map_size=64)
    cam = OrbitCamera(radius=5.0, theta=2.5, phi=1.2, aspect=2.0)
    scene = audio_app.build_scene()
    lighting = Lighting.default()
    disps = jnp.asarray([0.0, 0.4], jnp.float32)

    fbs, stats = mr.render_batch(scene, cam, lighting, disps, config=cfg,
                                 shadow_target=(0.0, 0.0, -1.0))
    assert fbs.shape == (2, 64, 128, 4)
    for i in range(2):
        fb, _ = mr.render(scene, cam, lighting, cfg,
                          displacement=float(disps[i]),
                          shadow_target=(0.0, 0.0, -1.0), backend="pallas")
        # mr.render is a separately-jitted program: XLA fuses its shading
        # arithmetic differently than the (eagerly traced) batch call in
        # this test, so equality here is allclose, not bitwise — the
        # bitwise guarantees are asserted against render_frame above.
        np.testing.assert_allclose(np.asarray(fbs[i]), np.asarray(fb),
                                   atol=5e-5)


def _assert_render_equiv(got, want, big=1e-3, big_frac=0.005):
    """Equality up to compile-context ULP: a lax.scan-wrapped program
    fuses the XLA prep arithmetic differently than the same ops run
    eagerly, and last-ULP vertex/depth differences legitimately flip a
    few sub-pixel coverage / shadow-compare decisions at edges (a
    flipped shadow compare moves a pixel by the full 0.5 shadow
    factor). Bound the POPULATION of such flips and the mean error,
    not the per-pixel magnitude."""
    d = np.abs(np.asarray(got) - np.asarray(want))
    assert (d > big).mean() <= big_frac, (d > big).mean()
    assert d.mean() <= 1e-4, d.mean()


def test_chunked_batch_matches_whole_fold():
    """render_frame_batch_chunked (the serving shape for long batches —
    whole-batch folds blow the SMEM scalar-prefetch budget past ~8
    frames, r5 TPU bisect) == the whole fold up to compile-context ULP
    edge flips; the in-scan frame_map variant reduces each chunk without
    materializing frames."""
    from metalrenderer_tpu.passes.pipeline import render_frame_batch_chunked

    cfg = RenderConfig(width=128, height=64, msaa=4, shadow_map_size=64)
    cam = OrbitCamera(radius=5.0, theta=2.5, phi=1.2, aspect=2.0)
    scene = audio_app.build_scene()
    lighting = Lighting.default()
    disps = jnp.linspace(0.0, 0.4, 4)
    thetas = jnp.linspace(2.2, 2.8, 4)

    rgba_w, stats_w = render_frame_batch_fused(
        scene, cam, lighting, cfg, ShadowConfig(), disps, thetas)
    rgba_c, stats_c = render_frame_batch_chunked(
        scene, cam, lighting, cfg, ShadowConfig(), disps, thetas, chunk=2)
    assert rgba_c.shape == (4, 64, 128, 4)
    _assert_render_equiv(rgba_c, rgba_w)
    np.testing.assert_array_equal(np.asarray(stats_c["big_dropped"]),
                                  np.asarray(stats_w["big_dropped"]))

    # frame_map reduces inside the scan; vs the full chunked render the
    # only delta is the reduction itself.
    means, _ = render_frame_batch_chunked(
        scene, cam, lighting, cfg, ShadowConfig(), disps, thetas, chunk=2,
        frame_map=lambda r: jnp.mean(r, axis=(1, 2)))
    np.testing.assert_allclose(
        np.asarray(means.reshape(4, 4)),
        np.asarray(jnp.mean(rgba_c, axis=(1, 2))), atol=1e-5)


def test_render_batch_auto_chunks_long_batches():
    """render_batch's chunk="auto" folds a 16-frame batch in sub-batches
    and matches the whole fold (same ULP-flip bound as above)."""
    import metalrenderer_tpu as mr

    cfg = RenderConfig(width=128, height=64, msaa=1, shadow_map_size=64)
    cam = OrbitCamera(radius=5.0, theta=2.5, phi=1.2, aspect=2.0)
    scene = audio_app.build_scene()
    lighting = Lighting.default()
    disps = jnp.linspace(0.0, 0.3, 16)
    thetas = jnp.linspace(2.2, 2.8, 16)

    fbs, _ = mr.render_batch(scene, cam, lighting, disps, thetas,
                             config=cfg, shadow_target=(0.0, 0.0, -1.0))
    rgba_w, _ = render_frame_batch_fused(
        scene, cam, lighting, cfg, ShadowConfig(), disps, thetas)
    _assert_render_equiv(fbs, rgba_w)
