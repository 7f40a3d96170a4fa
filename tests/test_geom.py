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
