"""Multi-device scale-out (SURVEY.md §2 "Parallelism & communication").

The reference is strictly single-GPU (one MTL::Device, mtl_engine.mm:122).
Here the analogous axes are first-class and TPU-native:

  * Frame-batch data parallelism (BASELINE config 5): a batch of frames
    (animated parameters: displacement, camera angle, light color) is
    sharded across a 1-D device mesh with ``shard_map``; each device runs
    the full single-frame pipeline — including the Pallas raster kernel —
    on its local frames via ``lax.map`` (no vmap of the kernel needed).
    Zero cross-device communication during rendering; the gather happens
    only if the host assembles the batch (XLA all_gather on ICI).
  * Tile-sharded single frame: the framebuffer is split into horizontal
    bands, one per device; each device rasterizes the full triangle list
    against its band (binning makes non-overlapping work cheap) and the
    bands concatenate back along ICI.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RenderConfig, ShadowConfig
from ..passes.pipeline import render_frame
from ..utils.pytree import pytree_dataclass, static_field


@pytree_dataclass
class BandedCamera:
    """Camera adapter whose projection maps one horizontal band of the
    full frame onto the whole (band-sized) viewport.

    A real pytree (unlike a duck-typed closure adapter): it can cross
    shard_map/jit boundaries, be vmapped over ``band``, and be stored in
    scene state. ``base`` may be any camera pytree (OrbitCamera,
    PoseCamera).
    """

    base: object = None
    band: jnp.ndarray = 0          # band index in [0, n_bands)
    n_bands: int = static_field(default=1)

    @property
    def position(self):
        return self.base.position

    def view_matrix(self):
        return self.base.view_matrix()

    def projection_matrix(self):
        p = self.base.projection_matrix()
        # NDC y in [-1,1] maps to rows [0,H]. Band b covers NDC
        # [1 - 2(b+1)/n, 1 - 2b/n]. Affine remap to [-1, 1]:
        # y' = n*y - (n - 1 - 2b).
        nf = jnp.float32(self.n_bands)
        bf = jnp.asarray(self.band, jnp.float32)
        row = p[1] * nf + p[3] * -(nf - 1.0 - 2.0 * bf)
        return p.at[1].set(row)


def make_mesh(num_devices=None, axis="batch"):
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def render_frame_batch(scene, camera, lighting, displacements, thetas,
                       mesh: Mesh,
                       config: RenderConfig = RenderConfig(),
                       shadow_config: ShadowConfig = ShadowConfig(),
                       shadow_target=(0.0, 0.0, 0.0), backend="pallas"):
    """Render a batch of frames sharded over ``mesh``'s 'batch' axis.

    displacements, thetas: f32[B] with B divisible by mesh size. Returns
    framebuffers f32[B, H, W, 4].
    """
    displacements = jnp.asarray(displacements, jnp.float32)
    thetas = jnp.asarray(thetas, jnp.float32)

    from ..passes.pipeline import (fused_batch_eligible,
                                   render_frame_batch_fused)
    use_fused_batch = (backend == "pallas" and
                       fused_batch_eligible(scene, lighting, config, camera))

    def local(scene, camera, lighting, disp_shard, theta_shard):
        if use_fused_batch:
            # Each device renders its local frames in TWO kernel
            # launches (batched shadow pass + frame-folded fused
            # raster/shade) instead of a lax.map of per-frame programs.
            fb, _ = render_frame_batch_fused(
                scene, camera, lighting, config, shadow_config,
                disp_shard, theta_shard, shadow_target=shadow_target)
            return fb

        def one(args):
            disp, theta = args
            cam = camera.replace(theta=theta)
            fb, _ = render_frame(scene, cam, lighting, config,
                                 shadow_config, disp, shadow_target,
                                 backend)
            return fb
        return jax.lax.map(one, (disp_shard, theta_shard))

    # Scene/camera/lighting ride as REPLICATED shard_map arguments (not
    # closures): captured device arrays embed as HLO constants, which
    # the remote compile path chokes on at 1M-triangle scales.
    shardf = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P("batch"), P("batch")),
        out_specs=P("batch"),
        check_vma=False,  # scan carries inside the raster are unvarying
    )
    return jax.jit(shardf)(scene, camera, lighting, displacements, thetas)


def render_tile_sharded(scene, camera, lighting, mesh: Mesh,
                        config: RenderConfig = RenderConfig(),
                        shadow_config: ShadowConfig = ShadowConfig(),
                        displacement=0.0, shadow_target=(0.0, 0.0, 0.0),
                        backend="pallas"):
    """Render ONE frame with the framebuffer row-sharded across devices.

    Each device renders a horizontal band of the image: the vertex stage
    is replicated (cheap), rasterization/shading run on the local band
    only (viewport offset via a per-device scissor on the projected
    geometry). Output: f32[H, W, 4] sharded along rows.
    """
    n = mesh.size
    if config.height % n:
        raise ValueError(f"height {config.height} not divisible by mesh size {n}")
    band_h = config.height // n
    band_cfg = config.replace(height=band_h)

    def local_band(scene, camera, lighting, band_index):
        # Shift the viewport: rendering rows [b*band_h, (b+1)*band_h) of
        # the full image == rendering a band_h-tall image whose screen-y
        # is offset, via a principal-point shift in the projection.
        cam = BandedCamera(base=camera, band=band_index[0], n_bands=n)
        fb, _ = render_frame(
            scene, cam, lighting, band_cfg,
            shadow_config, displacement, shadow_target, backend)
        return fb

    band_ids = jnp.arange(n, dtype=jnp.int32)
    shardf = jax.shard_map(
        local_band, mesh=mesh,
        in_specs=(P(), P(), P(), P("batch")), out_specs=P("batch"),
        check_vma=False,
    )
    out = jax.jit(shardf)(scene, camera, lighting, band_ids)
    return out                           # [H, W, 4] row-sharded
