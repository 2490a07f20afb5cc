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
from ..scene.scene import bake, project
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


def prune_to_band(geom, view, proj, width, height, band_index,
                  band_h, cap, margin=1.0):
    """Compact the triangle soup to those touching one horizontal band.

    Per-triangle screen-row extents come from the (replicated, one-
    matmul) vertex projection: row = (1 - ndc_y) * H/2 (the exact
    viewport convention of raster/geometry.py clip_to_screen). A
    triangle rides into the band's list iff its [ymin - margin,
    ymax + margin] interval intersects rows [band*band_h,
    (band+1)*band_h) — the 1 px margin absorbs any ULP difference
    between this row computation and triangle setup's. Triangles with a
    vertex at w <= eps cannot be y-bounded without clipping, so they
    conservatively enter EVERY band (clip_near handles them later).

    Compaction is a stable sort (in-band first, submission order
    preserved within the band — the LessEqual depth tie-break of
    mtl_engine.mm:437 stays exact) followed by a prefix gather of
    ``cap`` triangle ids. Slots past the in-band count carry
    out-of-band triangles, which are harmless: their pixels fall
    outside the band's viewport by construction. Overflow BEYOND cap is
    counted, never silent (SURVEY §7 cap discipline).

    Returns (pruned PackedGeometry, n_in_band i32[], dropped i32[]).
    """
    from ..raster.geometry import clip_to_screen
    clip = project(geom.world, view, proj).reshape(-1, 3, 4)   # [T,3,4]
    # Reuse the ONE viewport mapping (clip_to_screen) — a drifting
    # inline copy of the row formula could misclassify bands by more
    # than the margin if the convention ever changed.
    screen, _, _, w_ok = clip_to_screen(clip, width, height)
    rows = screen[..., 1]                                      # [T,3]
    ymin = jnp.min(rows, axis=-1) - margin
    ymax = jnp.max(rows, axis=-1) + margin
    y0 = band_index * band_h
    y1 = y0 + band_h
    in_band = ~w_ok | ((ymax >= y0) & (ymin < y1))

    t = in_band.shape[0]
    order = jnp.argsort(~in_band, stable=True)                 # in-band first
    ids = order[:cap]                                          # i32[cap]
    tri_world = geom.world.reshape(t, 3, -1)[ids].reshape(cap * 3, -1)
    tri_uvs = geom.uvs.reshape(t, 3, -1)[ids].reshape(cap * 3, -1)
    tri_nrm = geom.normals.reshape(t, 3, -1)[ids].reshape(cap * 3, -1)
    pruned = geom.replace(
        world=tri_world, uvs=tri_uvs, normals=tri_nrm,
        mat_kind=geom.mat_kind[ids], mat_color=geom.mat_color[ids],
        tex_id=geom.tex_id[ids], normal_map_id=geom.normal_map_id[ids],
        cast_shadow=geom.cast_shadow[ids],
    )
    n_in = jnp.sum(in_band.astype(jnp.int32))
    dropped = jnp.maximum(n_in - cap, 0)
    return pruned, n_in, dropped


def band_capacity(num_triangles, n_bands, slack=2.0, floor=64):
    """Static per-band triangle capacity: ~slack * T/n, clamped to T.

    slack=2 covers moderately uneven screen-space triangle densities;
    overflow beyond it is reported per device in the stats (and those
    triangles drop, so callers with pathological one-band scenes should
    raise slack)."""
    import math
    cap = max(floor, math.ceil(num_triangles * slack / n_bands))
    return min(num_triangles, cap)


def render_tile_sharded(scene, camera, lighting, mesh: Mesh,
                        config: RenderConfig = RenderConfig(),
                        shadow_config: ShadowConfig = ShadowConfig(),
                        displacement=0.0, shadow_target=(0.0, 0.0, 0.0),
                        backend="pallas", band_slack=2.0,
                        with_stats=False):
    """Render ONE frame with the framebuffer row-sharded across devices.

    Each device renders a horizontal band of the image. The vertex
    stage is replicated (one batched matmul — cheap), then each
    device PRUNES the triangle list to its band (prune_to_band) before
    the expensive stages, so expansion/sort/binning and chunk building
    run over ~T/n + boundary-crossing triangles instead of all T
    (VERDICT r4 item 6: per-device work O(T/n + band pixels)).
    Rasterization/shading run on the local band only (viewport offset
    via a principal-point shift in the projection).

    Output: f32[H, W, 4] sharded along rows; with ``with_stats=True``
    returns (fb, stats) where stats carries per-device
    ``band_triangles`` (in-band count) and ``band_dropped`` (overflow
    beyond the static per-band capacity — nonzero means raise
    band_slack).
    """
    n = mesh.size
    if config.height % n:
        raise ValueError(f"height {config.height} not divisible by mesh size {n}")
    band_h = config.height // n
    band_cfg = config.replace(height=band_h)
    cap = band_capacity(scene.num_triangles, n, slack=band_slack)

    def local_band(scene, camera, lighting, band_index):
        # Shift the viewport: rendering rows [b*band_h, (b+1)*band_h) of
        # the full image == rendering a band_h-tall image whose screen-y
        # is offset, via a principal-point shift in the projection.
        band = band_index[0]
        cam = BandedCamera(base=camera, band=band, n_bands=n)
        geom = bake(scene, displacement)
        # Band membership in FULL-image rows, from the base projection.
        pruned, n_in, dropped = prune_to_band(
            geom, camera.view_matrix(), camera.projection_matrix(),
            config.width, config.height, band, band_h, cap)
        fb, _ = render_frame(
            scene, cam, lighting, band_cfg,
            shadow_config, displacement, shadow_target, backend,
            main_geom=pruned)
        return fb, n_in.reshape(1), dropped.reshape(1)

    band_ids = jnp.arange(n, dtype=jnp.int32)
    shardf = jax.shard_map(
        local_band, mesh=mesh,
        in_specs=(P(), P(), P(), P("batch")),
        out_specs=(P("batch"), P("batch"), P("batch")),
        check_vma=False,
    )
    out, n_in, dropped = jax.jit(shardf)(scene, camera, lighting, band_ids)
    if with_stats:
        return out, {"band_triangles": n_in, "band_dropped": dropped,
                     "band_capacity": cap}
    # Cap discipline (SURVEY §7): even without stats, overflow must not
    # pass silently — the arrays are already concrete here (this call
    # runs outside any surrounding jit), so the check costs nothing.
    total_dropped = int(np.asarray(dropped).sum())
    if total_dropped:
        import warnings
        warnings.warn(
            f"render_tile_sharded dropped {total_dropped} triangles "
            f"beyond the per-band capacity {cap}; raise band_slack "
            "(or call with with_stats=True to inspect per-device "
            "band_dropped)", RuntimeWarning, stacklevel=2)
    return out                           # [H, W, 4] row-sharded
