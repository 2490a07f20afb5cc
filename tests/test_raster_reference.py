"""Rasterizer correctness: coverage rules, depth test, interpolation
(SURVEY.md §4a/§4c: closed-form unit tests + property tests)."""
import numpy as np
import jax.numpy as jnp

from metalrenderer_tpu.raster.geometry import setup_triangles
from metalrenderer_tpu.raster import reference_cpu

CENTER = ((0.5, 0.5),)


def _ndc_tri(v0, v1, v2, z=0.5):
    """Build clip-space triangle from NDC xy coords at constant depth."""
    tri = np.zeros((1, 3, 4), np.float32)
    for i, v in enumerate((v0, v1, v2)):
        tri[0, i] = [v[0], v[1], z, 1.0]
    return jnp.asarray(tri)


def test_fullscreen_ccw_triangle_covers_center():
    # Big CCW triangle covering the viewport.
    clip = _ndc_tri((-3, -3), (3, -3), (0, 3))
    s = setup_triangles(clip, 8, 8)
    assert bool(s.valid[0])
    depth, win = reference_cpu.rasterize_brute_force(s, 8, 8, CENTER)
    assert int(win[0, 4, 4]) == 0
    np.testing.assert_allclose(np.asarray(depth[0, 4, 4]), 0.5, atol=1e-6)


def test_cw_triangle_is_backface_culled():
    clip = _ndc_tri((-3, -3), (0, 3), (3, -3))  # CW winding
    s = setup_triangles(clip, 8, 8, cull_backfaces=True)
    assert not bool(s.valid[0])
    s2 = setup_triangles(clip, 8, 8, cull_backfaces=False)
    assert bool(s2.valid[0])


def test_half_screen_coverage_fraction():
    # Right triangle covering exactly the lower-left half of NDC square
    # => covered pixel fraction ~0.5 on a fine grid.
    clip = _ndc_tri((-1, -1), (1, -1), (-1, 1))
    s = setup_triangles(clip, 64, 64)
    _, win = reference_cpu.rasterize_brute_force(s, 64, 64, CENTER)
    frac = float(np.mean(np.asarray(win[0]) >= 0))
    assert abs(frac - 0.5) < 0.02


def test_shared_edge_watertight():
    """Two triangles sharing a diagonal: every interior pixel covered by
    EXACTLY one (top-left fill rule -> no double-hits, no cracks)."""
    quad = np.array([
        [[-1, -1, 0.5, 1], [1, -1, 0.5, 1], [1, 1, 0.5, 1]],
        [[-1, -1, 0.5, 1], [1, 1, 0.5, 1], [-1, 1, 0.5, 1]],
    ], np.float32)
    s = setup_triangles(jnp.asarray(quad), 32, 32)
    assert bool(s.valid[0]) and bool(s.valid[1])

    # Count hits per pixel by rasterizing each triangle alone at z ties.
    hits = np.zeros((32, 32), np.int32)
    for t in range(2):
        only = s.replace(valid=s.valid & (jnp.arange(2) == t))
        _, win = reference_cpu.rasterize_brute_force(only, 32, 32, CENTER)
        hits += (np.asarray(win[0]) >= 0).astype(np.int32)
    # Quad covers the whole screen: every pixel hit exactly once.
    assert hits.min() == 1 and hits.max() == 1


def test_depth_test_less_equal_order():
    """Same-depth triangles: the LATER submission wins (LessEqual,
    mtl_engine.mm:437)."""
    tri = np.array([[[-3, -3, 0.5, 1], [3, -3, 0.5, 1], [0, 3, 0.5, 1]]],
                   np.float32)
    clip = jnp.asarray(np.concatenate([tri, tri], axis=0))
    s = setup_triangles(clip, 8, 8)
    _, win = reference_cpu.rasterize_brute_force(s, 8, 8, CENTER)
    assert int(win[0, 4, 4]) == 1


def test_depth_test_nearer_wins_regardless_of_order():
    near = np.array([[[-3, -3, 0.2, 1], [3, -3, 0.2, 1], [0, 3, 0.2, 1]]],
                    np.float32)
    far = np.array([[[-3, -3, 0.8, 1], [3, -3, 0.8, 1], [0, 3, 0.8, 1]]],
                   np.float32)
    for order, expect in (((near, far), 0), ((far, near), 1)):
        clip = jnp.asarray(np.concatenate(order, axis=0))
        s = setup_triangles(clip, 8, 8)
        depth, win = reference_cpu.rasterize_brute_force(s, 8, 8, CENTER)
        assert int(win[0, 4, 4]) == expect
        np.testing.assert_allclose(np.asarray(depth[0, 4, 4]), 0.2, atol=1e-6)


def test_triangle_order_commutes_for_distinct_depths():
    """Property (SURVEY.md §4c): final depth buffer is independent of
    submission order when depths differ."""
    rng = np.random.default_rng(0)
    tris = []
    for k in range(8):
        center = rng.uniform(-0.7, 0.7, 2)
        pts = center + rng.uniform(0.1, 0.8, (3, 2)) * \
            np.array([[1, 0], [0, 1], [-1, -0.5]])
        # Enforce CCW in NDC.
        d1, d2 = pts[1] - pts[0], pts[2] - pts[0]
        a = d1[0] * d2[1] - d1[1] * d2[0]
        if a < 0:
            pts = pts[::-1]
        z = 0.1 + 0.1 * k
        tris.append([[pts[0][0], pts[0][1], z, 1],
                     [pts[1][0], pts[1][1], z, 1],
                     [pts[2][0], pts[2][1], z, 1]])
    tris = np.asarray(tris, np.float32)
    perm = rng.permutation(8)
    s1 = setup_triangles(jnp.asarray(tris), 48, 48)
    s2 = setup_triangles(jnp.asarray(tris[perm]), 48, 48)
    d1, _ = reference_cpu.rasterize_brute_force(s1, 48, 48, CENTER)
    d2, _ = reference_cpu.rasterize_brute_force(s2, 48, 48, CENTER)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)


def test_perspective_correct_interpolation():
    """A triangle with one far vertex: interpolated attribute at the screen
    midpoint of an edge must follow the 1/w weighting, not the screen lerp."""
    # Edge from near vertex (w=1) to far vertex (w=4), attribute u: 0 -> 1.
    clip = np.array([[
        [-0.5, -0.5, 0.2, 1.0],
        [2.0, -2.0, 2.0, 4.0],     # NDC (0.5, -0.5)
        [-0.5, 2.0, 0.2, 1.0],
    ]], np.float32)
    W = H = 65  # odd => a pixel center sits immediately near the edge mid
    s = setup_triangles(jnp.asarray(clip), W, H)
    assert bool(s.valid[0])
    depth, win = reference_cpu.rasterize_brute_force(s, W, H, CENTER)

    uvs = jnp.asarray(np.array([[0, 0], [1, 0], [0, 1]], np.float32))
    world = jnp.zeros((3, 3))
    normals = jnp.zeros((3, 3))
    vattrs = jnp.concatenate([world, uvs, normals], axis=-1)[None]  # [1,3,8]
    g = reference_cpu.interpolate_gbuffer(
        s, win, W, H, CENTER, vattrs,
        jnp.zeros(1, jnp.int32), jnp.zeros((1, 3)), -jnp.ones(1, jnp.int32),
        depth)
    # At screen midpoint between v0 and v1, perspective-correct u is
    # (0.5/w0*0 + 0.5/w1*1)/(0.5/w0 + 0.5/w1) = (1/4)/(1+1/4) = 0.2.
    # v0 screen=(16.25,48.75), v1 screen=(48.75,48.75) -> mid (32.5, 48.75).
    u_mid = float(g.uv[0, 48, 32, 0])
    assert abs(u_mid - 0.2) < 0.02, u_mid
