"""Mask→polygon tracer vs the reference's own oracles (reference
tests/get_polygons_tests.py:13-33 — 50×50 square mask → area 2500
containing the prompt point)."""

import numpy as np
import pytest

from geotreehealth_ray.functions import contours, geom


def test_square_mask_area_2500():
    mask = np.zeros((100, 100), dtype=bool)
    mask[25:75, 25:75] = True  # 50x50 square
    ring = contours.mask_to_polygon(mask, 50.0, 50.0)
    assert ring is not None
    assert geom.ring_area(ring) == 2500.0
    assert geom.points_in_ring(np.array([50.0]), np.array([50.0]), ring)[0]


def test_two_regions_pick_containing():
    mask = np.zeros((60, 60), dtype=bool)
    mask[5:15, 5:15] = True       # area 100
    mask[30:55, 30:55] = True     # area 625
    rings = contours.mask_rings(mask)
    assert len(rings) == 2
    ring = contours.pick_polygon_for_point(rings, 10.0, 10.0)
    assert geom.ring_area(ring) == 100.0
    ring2 = contours.pick_polygon_for_point(rings, 40.0, 40.0)
    assert geom.ring_area(ring2) == 625.0


def test_nearest_fallback():
    mask = np.zeros((30, 30), dtype=bool)
    mask[2:6, 2:6] = True
    mask[20:28, 20:28] = True
    rings = contours.mask_rings(mask)
    # point outside both → nearest (the big one at 20..28)
    ring = contours.pick_polygon_for_point(rings, 18.0, 18.0)
    assert geom.ring_area(ring) == 64.0


def test_hole_is_dropped():
    mask = np.zeros((40, 40), dtype=bool)
    mask[5:35, 5:35] = True
    mask[15:25, 15:25] = False  # hole
    rings = contours.mask_rings(mask)
    assert len(rings) == 1  # exterior only
    assert geom.ring_area(rings[0]) == 900.0


def test_irregular_region_roundtrip():
    rng = np.random.default_rng(5)
    # rasterize a star ring, trace it back, compare areas (±1 px band)
    ring = geom.make_star_ring(30, 30, 12, 16, seed=9)
    xs = np.arange(60) + 0.5
    ys = np.arange(60) + 0.5
    mask = geom.raster_mask(ring, xs, ys)
    traced = contours.mask_to_polygon(mask, 30.0, 30.0)
    assert traced is not None
    a_mask = mask.sum()
    assert geom.ring_area(traced) == pytest.approx(a_mask, rel=1e-9)


def test_empty_mask():
    assert contours.mask_rings(np.zeros((5, 5), bool)) == []
    assert contours.mask_to_polygon(np.zeros((5, 5), bool), 1, 1) is None


def test_simplify_reduces_vertices():
    mask = np.zeros((100, 100), dtype=bool)
    mask[25:75, 25:75] = True
    raw = contours.mask_to_polygon(mask, 50, 50)
    simp = contours.mask_to_polygon(mask, 50, 50, simplify_tol=0.1)
    assert len(simp) < len(raw)
    assert geom.ring_area(simp) == 2500.0
