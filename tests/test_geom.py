"""Unit oracles for the geometry kernels, including the reference's own
test assertions (reference tests/get_polygons_tests.py:13-33 — 50x50
square mask -> polygon area 2500 containing the prompt point)."""

import numpy as np
import pytest

from geotreehealth_ray.functions import geom


def square(x0, y0, s):
    return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]], float)


def test_square_area_2500():
    # reference tests/get_polygons_tests.py:31 — area == 2500
    sq = square(25.0, 25.0, 50.0)
    assert geom.ring_area(sq) == 2500.0
    # and contains the prompt point (50, 50)
    assert geom.points_in_ring(np.array([50.0]), np.array([50.0]), sq)[0]


def test_area_orientation_invariant():
    sq = square(0, 0, 10)
    assert geom.ring_area(sq) == geom.ring_area(sq[::-1]) == 100.0


def test_centroid():
    cx, cy = geom.ring_centroid(square(2, 4, 10))
    assert cx == pytest.approx(7.0)
    assert cy == pytest.approx(9.0)


def test_perimeter():
    assert geom.ring_perimeter(square(0, 0, 5)) == pytest.approx(20.0)


def test_pip_boundary_and_outside():
    sq = square(0, 0, 10)
    px = np.array([5.0, 10.0, 10.1, -0.1, 0.0])
    py = np.array([5.0, 5.0, 5.0, 5.0, 0.0])
    got = geom.points_in_ring(px, py, sq)
    assert list(got) == [True, True, False, False, True]


def test_pip_star_polygon():
    ring = geom.make_star_ring(50, 50, 10, 16, seed=7)
    # center always inside a star-convex ring
    assert geom.points_in_ring(np.array([50.0]), np.array([50.0]), ring)[0]
    # far point outside
    assert not geom.points_in_ring(np.array([500.0]), np.array([50.0]), ring)[0]


def test_clip_ring_to_bbox():
    sq = square(0, 0, 10)
    clipped = geom.clip_ring_to_bbox(sq, 5, 5, 20, 20)
    assert clipped is not None
    assert geom.ring_area(clipped) == pytest.approx(25.0)
    assert geom.clip_ring_to_bbox(sq, 50, 50, 60, 60) is None


def test_intersection_area_squares():
    a = square(0, 0, 10)
    b = square(5, 5, 10)
    assert geom.intersection_area_star(a, b) == pytest.approx(25.0)
    assert geom.iou_star(a, b) == pytest.approx(25.0 / 175.0)
    assert geom.overlap_of_max_area(a, b) == pytest.approx(0.25)


def test_intersection_area_disjoint():
    assert geom.intersection_area_star(square(0, 0, 1), square(5, 5, 1)) == 0.0


def test_intersection_star_vs_grid_sampling():
    # property check of the triangulated clip against dense grid sampling
    a = geom.make_star_ring(50, 50, 12, 20, seed=1)
    b = geom.make_star_ring(58, 54, 10, 14, seed=2)
    exact = geom.intersection_area_star(a, b)
    xs = np.linspace(30, 80, 401)
    ys = np.linspace(30, 80, 401)
    gx, gy = np.meshgrid(xs, ys)
    ina = geom.points_in_ring(gx.ravel(), gy.ravel(), a)
    inb = geom.points_in_ring(gx.ravel(), gy.ravel(), b)
    cellsz = (xs[1] - xs[0]) * (ys[1] - ys[0])
    approx = float((ina & inb).sum()) * cellsz
    assert exact == pytest.approx(approx, rel=0.03)


def test_iou_symmetry():
    a = geom.make_star_ring(10, 10, 5, 12, seed=3)
    b = geom.make_star_ring(13, 11, 4, 9, seed=4)
    assert geom.iou_star(a, b) == pytest.approx(geom.iou_star(b, a), rel=1e-9)
    assert 0.0 <= geom.iou_star(a, b) <= 1.0


def test_simplify_preserves_square():
    sq = square(0, 0, 10)
    # add collinear midpoints; DP at small tol must drop them
    dense = np.array(
        [[0, 0], [5, 0], [10, 0], [10, 5], [10, 10], [5, 10], [0, 10], [0, 5]],
        float,
    )
    out = geom.simplify_ring(dense, 0.1)
    assert geom.ring_area(out) == pytest.approx(100.0)
    assert len(out) == 4


def test_point_ring_distance():
    sq = square(0, 0, 10)
    assert geom.point_ring_distance(5, 5, sq) == pytest.approx(5.0)
    assert geom.point_ring_distance(15, 5, sq) == pytest.approx(5.0)
    assert geom.point_ring_distance(0, 0, sq) == pytest.approx(0.0)


def test_star_ring_deterministic():
    a = geom.make_star_ring(1, 2, 5, 12, seed=42)
    b = geom.make_star_ring(1, 2, 5, 12, seed=42)
    np.testing.assert_array_equal(a, b)


def test_pair_pip_matches_per_ring_pip():
    """points_in_rings_pairs must be bit-equal to per-ring
    points_in_ring over random (point, ring) pairs, including boundary
    vertices (the vectorized join kernel relies on this equivalence)."""
    rng = np.random.default_rng(7)
    rings = [
        geom.make_star_ring(
            rng.uniform(10, 90), rng.uniform(10, 90), rng.uniform(1, 8),
            int(rng.integers(5, 40)), seed=int(rng.integers(1_000_000)),
        )
        for _ in range(40)
    ]
    pack = geom.pack_ring_edges(rings)
    px = rng.uniform(0, 100, 1500)
    py = rng.uniform(0, 100, 1500)
    rid = rng.integers(0, len(rings), 1500)
    got = geom.points_in_rings_pairs(px, py, rid, pack)
    want = np.array(
        [
            geom.points_in_ring(px[i : i + 1], py[i : i + 1], rings[rid[i]])[0]
            for i in range(len(px))
        ]
    )
    np.testing.assert_array_equal(got, want)
    # every ring vertex is on-boundary => inside
    vx = np.array([r[0, 0] for r in rings])
    vy = np.array([r[0, 1] for r in rings])
    assert geom.points_in_rings_pairs(vx, vy, np.arange(len(rings)), pack).all()
    # empty pair list
    assert len(geom.points_in_rings_pairs(np.empty(0), np.empty(0), np.empty(0, np.int64), pack)) == 0


def _gen_simple_star(rng, nmin=5, nmax=14, rlo=3.0, rhi=7.0):
    """Simple polygon: star about the origin with every angular gap
    < π (a chord spanning more than π wraps the origin and can cross
    other edges)."""
    while True:
        n = int(rng.integers(nmin, nmax))
        th = np.sort(rng.random(n)) * 2 * np.pi
        gaps = np.diff(np.r_[th, th[0] + 2 * np.pi])
        if gaps.max() < np.pi * 0.95:
            r = rlo + rng.random(n) * (rhi - rlo)
            return np.c_[r * np.cos(th), r * np.sin(th)]


def test_difference_rings_square_cases():
    a = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    # side overlap: 100 - 30 = 70, one piece (shoelace-exact)
    b = np.array([[7, -1], [14, -1], [14, 11], [7, 11]], float)
    d = geom.difference_rings(a, b)
    assert len(d) == 1
    assert abs(sum(geom.ring_area(r) for r in d) - 70.0) < 1e-9
    # bisecting strip: two pieces, 80 total
    c = np.array([[4, -1], [6, -1], [6, 11], [4, 11]], float)
    d = geom.difference_rings(a, c)
    assert len(d) == 2
    assert abs(sum(geom.ring_area(r) for r in d) - 80.0) < 1e-9
    # hole: keyhole ring with exact area 100 - 16 = 84
    h = np.array([[3, 3], [7, 3], [7, 7], [3, 7]], float)
    d = geom.difference_rings(a, h)
    assert len(d) == 1
    assert abs(geom.ring_area(d[0]) - 84.0) < 1e-9
    # disjoint → subject unchanged; covered → empty
    assert len(geom.difference_rings(a, h + 100)) == 1
    big = np.array([[-5, -5], [15, -5], [15, 15], [-5, 15]], float)
    assert geom.difference_rings(a, big) == []
    # shared-edge degeneracy resolves via nudge (error ~1e-9·perimeter)
    shared = np.array([[7, 0], [14, 0], [14, 10], [7, 10]], float)
    d = geom.difference_rings(a, shared)
    assert abs(sum(geom.ring_area(r) for r in d) - 70.0) < 1e-5


def test_difference_rings_matches_signed_intersection_area():
    """Two independent exact algorithms agree: shoelace(A\\B pieces)
    == area(A) − intersection_area_star(A, B) on arbitrary simple
    (non-convex, non-mean-star) rings."""
    rng = np.random.default_rng(42)
    for _ in range(120):
        a = _gen_simple_star(rng)
        b = _gen_simple_star(rng) + (rng.random(2) * 8 - 4)
        expect = geom.ring_area(a) - geom.intersection_area_star(a, b)
        got = sum(geom.ring_area(r) for r in geom.difference_rings(a, b))
        assert abs(got - expect) <= 1e-6 * max(1.0, expect)


def test_intersection_area_signed_reflex_wedges():
    """A ring NOT star-shaped about its vertex mean: the signed fan
    cover must subtract reflex wedges (the unsigned sum overcounts).
    Oracle: convex_clip of the convex partner against each piece of a
    manual convex decomposition."""
    # L-shape (not star about its vertex mean's fan in general) vs square
    L = np.array([[0, 0], [10, 0], [10, 4], [4, 4], [4, 10], [0, 10]], float)
    q = np.array([[2, 2], [8, 2], [8, 8], [2, 8]], float)
    # manual: L ∩ q = (2..8)x(2..4) ∪ (2..4)x(4..8) → 12 + 8 = 20
    assert abs(geom.intersection_area_star(L, q) - 20.0) < 1e-9
