"""Stress tests pinned by VERDICT r1 items 9-10: the no-x/y-clip precision
envelope, and the documented big-triangle tie-break deviation."""
import numpy as np
import jax.numpy as jnp

from metalrenderer_tpu.raster.geometry import setup_triangles
from metalrenderer_tpu.raster.raster_pallas import rasterize_tiles
from metalrenderer_tpu.raster.reference_cpu import rasterize_brute_force

W, H = 128, 64
SAMPLES = ((0.5, 0.5),)


def _clip_from_screen(screen, z, w):
    """Build clip-space vertices that land at the given screen coords with
    the given w (so huge off-screen coords exercise the f32 envelope).
    screen: [T,3,2]; z, w: [T,3]."""
    sx, sy = screen[..., 0], screen[..., 1]
    ndc_x = sx / (0.5 * W) - 1.0
    ndc_y = 1.0 - sy / (0.5 * H)
    w = np.broadcast_to(w, sx.shape)
    return np.stack([ndc_x * w, ndc_y * w, z * w, w],
                    axis=-1).astype(np.float32)


def _f64_coverage(screen, px, py):
    """Float64 oracle: inside-test of a CCW-in-screen triangle (either
    orientation accepted), no fill rule — used only >0.5 px from edges."""
    v0, v1, v2 = screen[:, 0], screen[:, 1], screen[:, 2]

    def edge(a, b):
        return ((b[:, None, 0] - a[:, None, 0]) * (py[None] - a[:, None, 1])
                - (b[:, None, 1] - a[:, None, 1]) * (px[None] - a[:, None, 0]))

    e0 = edge(v0, v1)
    e1 = edge(v1, v2)
    e2 = edge(v2, v0)
    pos = (e0 > 0) & (e1 > 0) & (e2 > 0)
    neg = (e0 < 0) & (e1 < 0) & (e2 < 0)
    # distance-to-edge proxy: |e| / edge length
    def dist(e, a, b):
        ln = np.hypot(b[:, None, 0] - a[:, None, 0],
                      b[:, None, 1] - a[:, None, 1])
        return np.abs(e) / np.maximum(ln, 1e-30)

    margin = np.minimum(np.minimum(dist(e0, v0, v1), dist(e1, v1, v2)),
                        dist(e2, v2, v0))
    return pos | neg, margin


def test_guard_band_extreme_offscreen_vertices():
    """Triangles with vertices hundreds of thousands of pixels off-screen
    (screen extent ~ scene_extent/near after near-clipping) must still
    rasterize their on-screen interiors exactly: kernel == brute force,
    and both match a float64 oracle away from edges."""
    rng = np.random.default_rng(3)
    T = 64
    # One on-screen vertex, two flung far off-screen (up to 500k px).
    v_on = rng.uniform([10, 5], [W - 10, H - 5], (T, 1, 2))
    ang = rng.uniform(0, 2 * np.pi, (T, 2))
    dist = rng.uniform(1e3, 5e5, (T, 2))
    v_off = v_on + np.stack([np.cos(ang) * dist, np.sin(ang) * dist], -1)
    screen = np.concatenate([v_on, v_off], axis=1).astype(np.float64)
    w = np.broadcast_to(rng.uniform(1e-4, 1.0, (T, 1)), (T, 3)) \
        .astype(np.float32)                              # w near `near`
    z = np.full((T, 3), 0.5, np.float32)
    clip = _clip_from_screen(screen.astype(np.float32), z, w)

    setup = setup_triangles(jnp.asarray(clip), W, H, cull_backfaces=False)
    depth_k, winner_k, _, _ = rasterize_tiles(
        setup, W, H, 8, 128, SAMPLES, span_cap=8, big_capacity=256)
    depth_b, winner_b = rasterize_brute_force(setup, W, H, SAMPLES)
    # The kernel's tile-relative plane evaluation and the brute-force
    # global evaluation round differently at ~5e5-px coefficient
    # magnitudes; winners may flip within the sub-pixel edge band only.
    frac = np.mean(np.asarray(winner_k) != np.asarray(winner_b))
    assert frac < 0.01, frac

    # f64 ground truth away from edges: neither engine corrupts interior
    # coverage — the actual no-x/y-clip precision-envelope claim.
    py, px = np.mgrid[0:H, 0:W].astype(np.float64) + 0.5
    px, py = px.ravel(), py.ravel()
    cov64, margin = _f64_coverage(screen, px, py)
    valid = np.asarray(setup.valid)
    cov_any64 = (cov64 & valid[:, None]).any(axis=0)
    interior_safe = (margin[np.argmax(cov64 & valid[:, None], axis=0),
                            np.arange(px.size)] > 0.5)
    check = cov_any64 & interior_safe
    for name, win in (("kernel", winner_k), ("brute", winner_b)):
        covered_any = np.asarray(win[0]).ravel() >= 0
        bad = int((covered_any[check] != cov_any64[check]).sum())
        assert bad == 0, (name, bad)


def test_big_triangle_tiebreak_submission_order():
    """Exact SUBMISSION-ORDER ties across the big/binned class boundary
    (VERDICT r4 item 7 — the r2-r4 documented deviation, now closed):
    at bit-equal depth the LATER-submitted triangle wins, whether it is
    the big-list or the binned one (mtl_engine.mm:436-439 LessEqual).

    z = 0 makes every z-plane coefficient EXACTLY zero (all einsum terms
    vanish) — the cleanest way to construct a bit-exact cross-class
    depth tie."""
    z = 0.0
    w = 1.0
    # Small: fits ONE tile (span 1 <= cap 2). Big: spans all 8 tile rows
    # (> cap 2), so it goes to the big list.
    small = np.array([[[20, 10], [40, 10], [20, 14]]], np.float64)
    big = np.array([[[-10, -10], [3 * W, -10], [-10, 3 * H]]], np.float64)

    for order, later_idx in [((small, big), 1), ((big, small), 1)]:
        screen = np.concatenate(order, axis=0)
        clip = _clip_from_screen(screen.astype(np.float32),
                                 np.full((2, 3), z, np.float32),
                                 np.full((2, 3), w, np.float32))
        setup = setup_triangles(jnp.asarray(clip), W, H,
                                cull_backfaces=False)
        assert bool(setup.valid[0]) and bool(setup.valid[1])
        _, winner, _, _ = rasterize_tiles(
            setup, W, H, 8, 128, SAMPLES, span_cap=2, big_capacity=256)
        win = np.asarray(winner[0])
        big_idx = 1 if order[1] is big else 0
        # A pixel covered by both at identical (exact-tie) depth: the
        # LATER-SUBMITTED triangle wins regardless of class.
        assert win[11, 25] == later_idx, (win[11, 25], later_idx)
        # A pixel covered only by the big triangle.
        assert win[50, 100] == big_idx
        # And the brute-force reference agrees pixel-for-pixel.
        _, win_b = rasterize_brute_force(setup, W, H, SAMPLES)
        np.testing.assert_array_equal(win, np.asarray(win_b[0]))


def test_guard_band_4k_artifact():
    """Enforce the committed 4K-scale envelope proof (VERDICT r3 item 8).

    ``benchmarks/stress_4k_envelope.py`` runs the Pallas rasterizer at
    the full 3840x2160 framebuffer with vertices flung up to 3e6 px
    off-screen (the worst-case post-near-clip extent at 4K) on REAL
    TPU and validates coverage against an f64 oracle; this test gates
    the committed artifact the same way ``test_tpu_parity`` gates the
    PSNR record. Skips until the artifact lands."""
    import json
    import pathlib

    import pytest

    arts = sorted((pathlib.Path(__file__).parent.parent / "benchmarks")
                  .glob("stress4k_r*.json"))
    if not arts:
        pytest.skip("no committed 4K envelope artifact yet")
    rec = json.loads(arts[-1].read_text())
    assert rec["width"] == 3840 and rec["height"] == 2160
    assert rec["max_offscreen_px"] >= 1e6, rec["max_offscreen_px"]
    assert rec["mismatches"] == 0, rec
    # The proof must exercise BOTH coverage outcomes at scale.
    assert rec["oracle_covered_safe_px"] > 1000
    assert rec["oracle_uncovered_safe_px"] > 1000
    assert rec["ok"] is True
    if "guard_clip" in rec:   # r5+ artifacts: the production clipped path
        g = rec["guard_clip"]
        assert g["mismatches"] == 0 and g["dropped"] == 0
        assert g["max_screen_coord"] <= 32768.0 + rec["width"] / 2 + 2
        assert g["ok"] is True


def test_big_vs_binned_samez_property():
    """Property test (VERDICT r4 item 7): random mixes of binned and
    big-list triangles ALL at the exact-tie plane z=0 — the Pallas
    kernel must equal the brute-force reference pixel-for-pixel, i.e.
    every cross-class tie resolves in submission order."""
    rng = np.random.default_rng(23)
    for trial in range(4):
        T = 12
        tris = []
        for i in range(T):
            if rng.random() < 0.3:
                # Big: spans most of the screen (goes to the big list).
                c = rng.uniform([0, 0], [W, H])
                tris.append([c + [-2 * W, -2 * H], c + [3 * W, 0],
                             c + [0, 3 * H]])
            else:
                c = rng.uniform([5, 5], [W - 5, H - 5])
                r = rng.uniform(3, 12)
                a = rng.uniform(0, 2 * np.pi, 3)
                tris.append([c + [np.cos(t) * r, np.sin(t) * r]
                             for t in a])
        screen = np.asarray(tris, np.float64)
        clip = _clip_from_screen(screen.astype(np.float32),
                                 np.zeros((T, 3), np.float32),
                                 np.ones((T, 3), np.float32))
        setup = setup_triangles(jnp.asarray(clip), W, H,
                                cull_backfaces=False)
        _, winner_k, _, _ = rasterize_tiles(
            setup, W, H, 8, 128, SAMPLES, span_cap=2, big_capacity=256)
        _, winner_b = rasterize_brute_force(setup, W, H, SAMPLES)
        np.testing.assert_array_equal(np.asarray(winner_k),
                                      np.asarray(winner_b), err_msg=str(trial))
