"""Property-based tests (hypothesis) for the geometry kernels —
invariants that must hold for ANY star-convex input (SURVEY.md §7.4
"property-testing IoU symmetry/bounds")."""

import numpy as np
from hypothesis import given, settings, strategies as st

from geotreehealth_ray.functions import cells, geom

ring_params = st.tuples(
    st.floats(10, 1000), st.floats(10, 1000),      # center
    st.floats(1.0, 15.0),                           # radius
    st.integers(5, 24),                             # vertices
    st.integers(0, 10_000),                         # seed
)


@settings(max_examples=60, deadline=None)
@given(ring_params)
def test_area_positive_and_bounded(p):
    cx, cy, r, n, seed = p
    ring = geom.make_star_ring(cx, cy, r, n, seed)
    a = geom.ring_area(ring)
    assert 0 < a <= np.pi * (r * 1.35) ** 2 * 1.05


@settings(max_examples=40, deadline=None)
@given(ring_params, ring_params)
def test_iou_symmetric_bounded(p, q):
    a = geom.make_star_ring(p[0], p[1], p[2], p[3], p[4])
    b = geom.make_star_ring(q[0], q[1], q[2], q[3], q[4])
    i1 = geom.iou_star(a, b)
    i2 = geom.iou_star(b, a)
    assert abs(i1 - i2) <= 1e-6  # triangulated clip is fp-asymmetric at tiny areas
    assert 0.0 <= i1 <= 1.0 + 1e-9


@settings(max_examples=40, deadline=None)
@given(ring_params)
def test_self_iou_is_one(p):
    ring = geom.make_star_ring(p[0], p[1], p[2], p[3], p[4])
    np.testing.assert_allclose(geom.iou_star(ring, ring), 1.0, rtol=1e-6)


@settings(max_examples=40, deadline=None)
@given(ring_params)
def test_centroid_inside_star(p):
    ring = geom.make_star_ring(p[0], p[1], p[2], p[3], p[4])
    cx, cy = geom.ring_centroid(ring)
    assert geom.points_in_ring(np.array([cx]), np.array([cy]), ring)[0]


@settings(max_examples=40, deadline=None)
@given(ring_params)
def test_raster_mask_agrees_with_pip(p):
    ring = geom.make_star_ring(p[0], p[1], p[2], p[3], p[4])
    minx, miny, maxx, maxy = geom.ring_bbox(ring)
    wx = np.linspace(minx - 1, maxx + 1, 25)
    wy = np.linspace(miny - 1, maxy + 1, 23)
    mask = geom.raster_mask(ring, wx, wy)
    gx, gy = np.meshgrid(wx, wy)
    pip = geom.points_in_ring(gx.ravel(), gy.ravel(), ring).reshape(mask.shape)
    # scanline vs ray-casting may disagree only exactly ON an edge
    disagree = mask != pip
    assert disagree.mean() < 0.01


@settings(max_examples=60, deadline=None)
@given(
    st.floats(0, float(cells.BASE_CELL_M) - 1e-3),
    st.floats(0, float(cells.BASE_CELL_M) - 1e-3),
    st.integers(1, 15),
)
def test_cell_roundtrip_property(x, y, res):
    c = cells.cell_of(np.array([x]), np.array([y]), res)
    minx, miny, maxx, maxy = cells.cell_bounds(c)
    assert minx[0] <= x < maxx[0] + 1e-6
    assert miny[0] <= y < maxy[0] + 1e-6
