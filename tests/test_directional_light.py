"""DirectionalLight shading + shadow semantics (BASELINE config 4's sun
light — a capability beyond the reference's single point light,
VertexData.hpp:20-28)."""
import numpy as np
import jax.numpy as jnp
import pytest

import metalrenderer_tpu as mr
from metalrenderer_tpu.engine import audio_app
from metalrenderer_tpu.raster import shade
from metalrenderer_tpu.scene.camera import OrbitCamera
from metalrenderer_tpu.scene.lights import (DirectionalLight, Lighting,
                                            light_anchor_position)


def _psnr(a, b):
    mse = float(jnp.mean((a - b) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def test_directional_blinn_phong_closed_form():
    """Surface facing straight up, light straight down, camera above:
    L = N = H = +y so diffuse = 1, spec = 1."""
    w = jnp.zeros((1, 1, 3))
    n = jnp.asarray([[[0.0, 1.0, 0.0]]])
    base = jnp.asarray([[[0.2, 0.5, 0.9]]])
    out = shade.blinn_phong(
        w, n, base, camera_pos=(0.0, 3.0, 0.0), light_pos=(9.0, 9.0, 9.0),
        light_color=(1.0, 1.0, 1.0), ambient_intensity=0.1, shininess=32.0)
    # Point light at arbitrary position differs ...
    ch = {
        "wx": w[..., 0], "wy": w[..., 1], "wz": w[..., 2],
        "nx": n[..., 0], "ny": n[..., 1], "nz": n[..., 2],
        "u": jnp.zeros((1, 1)), "v": jnp.zeros((1, 1)),
        "kind": jnp.zeros((1, 1), jnp.int32),
        "texid": jnp.full((1, 1), -1, jnp.int32), "nmid": None,
        "cr": base[..., 0], "cg": base[..., 1], "cb": base[..., 2],
        "covered": jnp.ones((1, 1), bool),
    }
    r, g, b, a = shade.shade_channels(
        ch, camera_pos=(0.0, 3.0, 0.0), light_pos=(0.0, 0.0, 0.0),
        light_color=(1.0, 1.0, 1.0), ambient_intensity=0.1, shininess=32.0,
        clear_color=(0, 0, 0, 1), return_planes=True,
        light_dir=(0.0, -2.0, 0.0))   # un-normalized on purpose
    # (ambient + diff + spec) * base = 2.1 * base
    np.testing.assert_allclose(float(r[0, 0]), 2.1 * 0.2, atol=1e-5)
    np.testing.assert_allclose(float(g[0, 0]), 2.1 * 0.5, atol=1e-5)
    np.testing.assert_allclose(float(b[0, 0]), 2.1 * 0.9, atol=1e-5)
    del out, a


def test_directional_equals_far_point_light():
    """A point light placed very far along -direction converges to the
    directional result."""
    cfg = mr.RenderConfig(width=64, height=48, msaa=1, shadow_map_size=64)
    # No shadow pass (a 5000-unit anchor can't fit the ortho depth range);
    # this test isolates the L-vector math.
    scene = audio_app.build_scene()
    scene = scene.replace(instances=tuple(
        i.replace(cast_shadow=False) for i in scene.instances))
    cam = OrbitCamera(radius=5.0, theta=2.5, phi=1.2, aspect=64 / 48)
    d = jnp.asarray([-0.45, -1.0, -0.35], jnp.float32)
    lit_dir = Lighting(light=DirectionalLight(
        direction=d, color=jnp.ones(3), intensity=jnp.asarray(1.0)))
    far_pos = -d / jnp.linalg.norm(d) * 5000.0
    lit_pt = Lighting(light=mr.PointLight(
        position=far_pos, color=jnp.ones(3), intensity=jnp.asarray(1.0)))
    fb_d, _ = mr.render_frame(scene, cam, lit_dir, cfg, backend="reference")
    fb_p, _ = mr.render_frame(scene, cam, lit_pt, cfg, backend="reference")
    assert _psnr(fb_d, fb_p) > 40.0


def test_directional_anchor_position():
    light = DirectionalLight(direction=jnp.asarray([0.0, -1.0, 0.0]))
    pos = light_anchor_position(light, (0.0, 0.0, -1.0),
                                mr.ShadowConfig())
    # Mid-ortho-depth standoff straight above the target.
    np.testing.assert_allclose(np.asarray(pos), [0.0, 7.55, -1.0],
                               atol=1e-5)


def test_directional_casts_shadow():
    """The audio-app scene lit by a sun: the floor must show a shadowed
    region (factor 0.5) that vanishes when the cube stops casting."""
    cfg = mr.RenderConfig(width=96, height=72, msaa=1, shadow_map_size=128)
    cam = OrbitCamera(radius=5.0, theta=2.5, phi=1.2, aspect=96 / 72)
    lighting = Lighting(light=DirectionalLight(
        direction=jnp.asarray([-0.2, -1.0, -0.1]), color=jnp.ones(3),
        intensity=jnp.asarray(1.0)))
    scene = audio_app.build_scene()
    fb, _ = mr.render_frame(scene, cam, lighting, cfg,
                            shadow_target=(0.0, 0.0, -1.0),
                            backend="reference")
    no_cast = scene.replace(instances=tuple(
        i.replace(cast_shadow=False) for i in scene.instances))
    fb_nc, _ = mr.render_frame(no_cast, cam, lighting, cfg,
                               shadow_target=(0.0, 0.0, -1.0),
                               backend="reference")
    darker = np.asarray(jnp.sum((fb_nc[..., :3] - fb[..., :3]) > 0.05))
    assert darker > 20  # a real shadowed region exists


@pytest.mark.slow  # interpret-mode Pallas two-pass compile: ~40 s on CPU
def test_directional_pallas_parity():
    cfg = mr.RenderConfig(width=64, height=48, msaa=1, shadow_map_size=64)
    scene = audio_app.build_scene()
    cam = OrbitCamera(radius=5.0, theta=2.5, phi=1.2, aspect=64 / 48)
    lighting = Lighting(light=DirectionalLight(
        direction=jnp.asarray([-0.45, -1.0, -0.35]), color=jnp.ones(3),
        intensity=jnp.asarray(1.0)))
    fb_ref, _ = mr.render_frame(scene, cam, lighting, cfg,
                                shadow_target=(0.0, 0.0, -1.0),
                                backend="reference")
    fb_pal, _ = mr.render_frame(scene, cam, lighting, cfg,
                                shadow_target=(0.0, 0.0, -1.0),
                                backend="pallas")
    assert _psnr(fb_ref, fb_pal) >= 40.0
