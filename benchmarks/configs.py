"""The five BASELINE.json benchmark configurations as scene builders.

1. Single textured cube, Blinn-Phong point light, 512x512 (CPU-ref oracle)
2. Multi-mesh scene (cubes + spheres), per-object transforms, depth, 1080p
3. ~100k-tri OBJ asset scene, bilinear+mip textures, 1080p
4. Shadow-mapped light + normal mapping, two-pass, 1080p
5. Animated 1M-tri scene at 4K, vmapped frame batch sharded across cores
"""
from __future__ import annotations

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

import metalrenderer_tpu as mr
from metalrenderer_tpu.config import RenderConfig
from metalrenderer_tpu.io import textures as tex_mod
from metalrenderer_tpu.math import transforms
from metalrenderer_tpu.scene.camera import OrbitCamera
from metalrenderer_tpu.scene.lights import (DirectionalLight, Lighting)


def config1_textured_cube():
    tex = tex_mod.checkerboard(size=256, squares=8,
                               color_a=(0.9, 0.9, 0.85),
                               color_b=(0.25, 0.55, 0.2))
    scene = mr.Scene(
        instances=(mr.Instance(
            mesh=mr.cube(), model_matrix=transforms.translation(0, 0, 0),
            material=mr.Material(color=jnp.ones(3), kind=mr.BLINN_PHONG,
                                 texture_id=0)),),
        textures=(tex,))
    camera = OrbitCamera(radius=2.5, theta=2.5, phi=1.2, aspect=1.0)
    cfg = RenderConfig(width=512, height=512, msaa=4, shadow_map_size=64)
    return scene, camera, Lighting.default(), cfg


def config2_multi_mesh(n_objects=24, width=1920, height=1080, seed=0):
    rng = np.random.default_rng(seed)
    cube_mesh = mr.cube()
    sphere_mesh = mr.uv_sphere(stacks=12, slices=24)
    instances = []
    palette = [(1.0, 0.5, 0.31), (0.3, 0.6, 0.9), (0.8, 0.8, 0.3),
               (0.6, 0.3, 0.7)]
    for i in range(n_objects):
        pos = rng.uniform(-4, 4, 3) * np.array([1, 0.4, 1]) + [0, 0.5, 0]
        s = rng.uniform(0.3, 0.9)
        m = transforms.translation(*pos) @ transforms.scale(s, s, s) @ \
            transforms.rotation(rng.uniform(0, np.pi),
                                jnp.asarray(rng.uniform(-1, 1, 3)))
        mesh = cube_mesh if i % 2 == 0 else sphere_mesh
        instances.append(mr.Instance(
            mesh=mesh, model_matrix=m,
            material=mr.Material(color=jnp.asarray(palette[i % 4]),
                                 kind=mr.BLINN_PHONG)))
    instances.append(mr.Instance(
        mesh=mr.plane(), model_matrix=transforms.translation(0, -1, 0)
        @ transforms.scale(10, 1, 10),
        material=mr.Material(color=jnp.asarray([0.5, 0.7, 0.5]),
                             kind=mr.BLINN_PHONG)))
    scene = mr.Scene(instances=tuple(instances))
    camera = OrbitCamera(radius=9.0, theta=2.4, phi=1.1,
                         aspect=width / height)
    cfg = RenderConfig(width=width, height=height, msaa=4,
                       shadow_map_size=64)
    return scene, camera, Lighting.default(), cfg


def _dense_sphere_mesh(target_tris):
    """Procedural high-poly mesh standing in for an OBJ asset (vectorized
    UV-sphere builder; io/obj.py + native/objparser.cpp load real files)."""
    stacks = max(8, int(np.sqrt(target_tris / 4)))
    slices = 2 * stacks
    phi = np.linspace(0, np.pi, stacks + 1)
    th = np.linspace(0, 2 * np.pi, slices + 1)
    pp, tt = np.meshgrid(phi, th, indexing="ij")
    pts = np.stack([np.sin(pp) * np.cos(tt), np.cos(pp),
                    np.sin(pp) * np.sin(tt)], -1).astype(np.float32)
    uv = np.stack([tt / (2 * np.pi), 1 - pp / np.pi], -1).astype(np.float32)

    def quad_corners(a):  # [stacks+1, slices+1, C] -> two tris per quad
        c00 = a[:-1, :-1]
        c01 = a[:-1, 1:]
        c10 = a[1:, :-1]
        c11 = a[1:, 1:]
        t1 = np.stack([c00, c11, c01], axis=2)
        t2 = np.stack([c00, c10, c11], axis=2)
        return np.concatenate([t1, t2], axis=2).reshape(-1, a.shape[-1])

    pos = quad_corners(pts)
    uvs = quad_corners(uv)
    nrm = pos.copy()  # unit sphere: normal == position
    return mr.Mesh(positions=jnp.asarray(pos * 0.5), uvs=jnp.asarray(uvs),
                   normals=jnp.asarray(nrm))


# Path of the OBJ file config 3 actually loaded (recorded in bench rows).
LAST_OBJ_ASSET = None


def _obj_asset_mesh(target_tris):
    """The config-3 mesh loaded THROUGH the real OBJ asset path
    (VERDICT r3 item 7): build the dense sphere once, save_obj it to a
    cached .obj file, and load it back via io/obj.py (native
    objparser.cpp when available, Python fallback otherwise) — the same
    path a user's asset takes (reference analog: Texture.cpp:3-24 + the
    planned assimp import, pbxproj:148)."""
    import hashlib

    from metalrenderer_tpu.io import obj as obj_mod
    cache = pathlib.Path(__file__).resolve().parent / "_assets"
    cache.mkdir(exist_ok=True)
    # Key the cached file by the generator's bytecode too: a stale
    # cache after editing _dense_sphere_mesh would otherwise silently
    # bench (and PSNR-check) the OLD geometry.
    gen_tag = hashlib.sha1(
        _dense_sphere_mesh.__code__.co_code).hexdigest()[:8]
    path = cache / f"sphere_{target_tris}_{gen_tag}.obj"
    if not path.exists():
        obj_mod.save_obj(str(path), _dense_sphere_mesh(target_tris))
    global LAST_OBJ_ASSET
    LAST_OBJ_ASSET = str(path)
    return obj_mod.load_obj(str(path))


def config3_high_poly(target_tris=100_000, width=1920, height=1080):
    mesh = _obj_asset_mesh(target_tris)
    tex = tex_mod.checkerboard(size=512, squares=16)
    scene = mr.Scene(
        instances=(mr.Instance(
            mesh=mesh, model_matrix=transforms.translation(0, 0, 0),
            material=mr.Material(color=jnp.ones(3), kind=mr.BLINN_PHONG,
                                 texture_id=0)),),
        textures=(tex,))
    camera = OrbitCamera(radius=2.0, theta=2.5, phi=1.3,
                         aspect=width / height)
    # span_cap 4 halves the binning entry pool; ~14 px^2 triangles span
    # more than 2x2 tiles only at silhouette grazing (big list absorbs).
    cfg = RenderConfig(width=width, height=height, msaa=1,
                       shadow_map_size=64, span_cap=4)
    return scene, camera, Lighting.default(), cfg


def config4_shadow_normal_map(width=1920, height=1080):
    # Bumpy normal map: sinusoidal height field -> tangent-space normals.
    n = 256
    y, x = np.mgrid[0:n, 0:n] / n
    h = 0.15 * np.sin(12 * np.pi * x) * np.sin(12 * np.pi * y)
    dhdx = np.gradient(h, axis=1) * n
    dhdy = np.gradient(h, axis=0) * n
    nm = np.stack([-dhdx, -dhdy, np.ones_like(h)], -1)
    nm /= np.linalg.norm(nm, axis=-1, keepdims=True)
    nm01 = ((nm + 1) / 2).astype(np.float32)
    nm_tex = tex_mod.from_array(
        np.concatenate([nm01, np.ones((n, n, 1), np.float32)], -1),
        generate_mips=True)

    scene = mr.Scene(
        instances=(
            mr.Instance(mesh=mr.cube(),
                        model_matrix=transforms.translation(0, 0, -1),
                        material=mr.Material(
                            color=jnp.asarray([1.0, 0.5, 0.31]),
                            kind=mr.BLINN_PHONG, normal_map_id=0),
                        cast_shadow=True),
            mr.Instance(mesh=mr.plane(),
                        model_matrix=transforms.translation(0, -1, 0)
                        @ transforms.scale(10, 1, 10),
                        material=mr.Material(
                            color=jnp.asarray([0.5, 0.7, 0.5]),
                            kind=mr.BLINN_PHONG_SHADOW)),
        ),
        textures=(nm_tex,))
    camera = OrbitCamera(radius=5.0, theta=2.5, phi=1.2,
                         aspect=width / height)
    cfg = RenderConfig(width=width, height=height, msaa=4,
                       shadow_map_size=1024)
    # BASELINE config 4 is a shadow-mapped DIRECTIONAL light (sun).
    lighting = Lighting(light=DirectionalLight(
        direction=jnp.asarray([-0.45, -1.0, -0.35], jnp.float32),
        color=jnp.asarray([1.0, 1.0, 1.0], jnp.float32),
        intensity=jnp.asarray(1.0, jnp.float32)))
    return scene, camera, lighting, cfg


def config5_animated_high_poly(target_tris=1_000_000, width=3840,
                               height=2160):
    mesh = _dense_sphere_mesh(target_tris)
    scene = mr.Scene(
        instances=(mr.Instance(
            mesh=mesh, model_matrix=transforms.translation(0, 0, 0),
            material=mr.Material(color=jnp.asarray([0.8, 0.4, 0.3]),
                                 kind=mr.BLINN_PHONG),
            use_displacement=True),))
    camera = OrbitCamera(radius=2.0, theta=2.5, phi=1.3,
                         aspect=width / height)
    cfg = RenderConfig(width=width, height=height, msaa=1,
                       shadow_map_size=64, span_cap=4)
    return scene, camera, Lighting.default(), cfg
