"""The flagship "AudioApp" scene: Blinn-Phong cube + emissive light cube +
shadow-receiving floor plane, audio-reactive displacement and light color.

Scene construction mirrors MtlEngine::init/updateSharedTransformData:
  * main cube at ``cube_position`` (default {0,0,-1}, mtl_engine.hpp:155),
    color {1.0,0.5,0.31} (mtl_engine.mm:823), audio displacement enabled,
    rendered without shadow sampling (NoShadow PSO, mtl_engine.mm:827).
  * light cube at ``light_position`` (default {0,2,0}, mtl_engine.hpp:154),
    emissive with the audio-driven light color (mtl_engine.mm:849-850).
  * floor plane: translate(0,-1,0) @ scale(10,1,10) (mtl_engine.mm:655-656),
    color {0.5,0.7,0.5} (mtl_engine.mm:874), receives the shadow.
  * shadow casters: the main cube (renderShadowPass draws only the cube,
    mtl_engine.mm:785-787). Deviation (documented): the reference transforms
    the shadow-pass cube by the LIGHT's model matrix (shadowTransformBuffer
    holds lightModelMatrix, mtl_engine.mm:692-697) — a latent bug placing
    the caster at the light; we use the cube's own model matrix.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import RenderConfig, ShadowConfig
from ..math import transforms
from ..scene import materials, mesh
from ..scene.camera import OrbitCamera
from ..scene.lights import Lighting, PointLight
from ..scene.scene import Instance, Scene
from ..passes.pipeline import render


def build_scene(cube_position=(0.0, 0.0, -1.0),
                light_position=(0.0, 2.0, 0.0),
                light_color=(1.0, 1.0, 1.0),
                textures=(), cube_texture_id=-1) -> Scene:
    cube_pos = jnp.asarray(cube_position, jnp.float32)
    light_pos = jnp.asarray(light_position, jnp.float32)

    cube_model = transforms.translation(cube_pos[0], cube_pos[1], cube_pos[2])
    light_model = transforms.translation(
        light_pos[0], light_pos[1], light_pos[2])
    plane_model = transforms.translation(0.0, -1.0, 0.0) @ \
        transforms.scale(10.0, 1.0, 10.0)

    cube_mat = materials.cube_material()
    if cube_texture_id >= 0:
        cube_mat = cube_mat.replace()
        cube_mat = materials.Material(
            color=cube_mat.color, kind=cube_mat.kind,
            texture_id=cube_texture_id)

    instances = (
        Instance(mesh=mesh.cube(), model_matrix=cube_model,
                 material=cube_mat, cast_shadow=True,
                 use_displacement=True),
        Instance(mesh=mesh.cube(), model_matrix=light_model,
                 material=materials.emissive_material(light_color),
                 cast_shadow=False, use_displacement=False),
        Instance(mesh=mesh.plane(), model_matrix=plane_model,
                 material=materials.plane_material(),
                 cast_shadow=False, use_displacement=False),
    )
    return Scene(instances=instances, textures=tuple(textures))


def default_camera(width=800, height=600) -> OrbitCamera:
    return OrbitCamera(aspect=float(width) / float(height))


def grass_texture():
    """The bundled Metal-Tutorial grass texture as a mip pyramid.

    The reference ships assets/mc_grass.jpeg and loads it with stb_image
    (Texture.cpp:3-24) — the latent textured-cube capability SURVEY L4
    requires restoring. The repo bundles a lossless PNG conversion so
    PIL-less hosts decode it with the built-in PNG reader.
    """
    import pathlib
    from ..io.textures import load_texture
    root = pathlib.Path(__file__).resolve().parents[2]
    return load_texture(root / "assets" / "mc_grass.png")


def render_audio_app(cube_position=(0.0, 0.0, -1.0),
                     light_position=(0.0, 2.0, 0.0),
                     light_color=(1.0, 1.0, 1.0),
                     displacement=0.0,
                     camera: OrbitCamera = None,
                     config: RenderConfig = RenderConfig(),
                     shadow_config: ShadowConfig = ShadowConfig(),
                     backend="reference", textures=(),
                     cube_texture_id=-1):
    """One AudioApp frame; returns (framebuffer, stats)."""
    scene = build_scene(cube_position, light_position, light_color,
                        textures=textures, cube_texture_id=cube_texture_id)
    if camera is None:
        camera = default_camera(config.width, config.height)
    lighting = Lighting(
        light=PointLight(
            position=jnp.asarray(light_position, jnp.float32),
            color=jnp.asarray(light_color, jnp.float32),
            intensity=jnp.asarray(1.0, jnp.float32),
        ),
        ambient_intensity=jnp.asarray(0.1, jnp.float32),   # mtl_engine.mm:757
        shininess=jnp.asarray(32.0, jnp.float32),          # mtl_engine.mm:758
    )
    return render(
        scene, camera, lighting, config, shadow_config,
        displacement=jnp.asarray(displacement, jnp.float32),
        shadow_target=jnp.asarray(cube_position, jnp.float32),
        backend=backend,
    )
