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


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(4, 40),
       st.booleans())
def test_pairs_pip_layouts_agree(seed, n_rings, force_cohort):
    """The size-dispatched pair-PIP layouts (one-shot explosion vs
    ring-length cohorts) must agree bit-for-bit on identical inputs —
    the dispatch is a pure performance fork."""
    rng = np.random.default_rng(seed)
    rings = []
    for _ in range(n_rings):
        nv = int(rng.integers(3, 17))
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        r = rng.uniform(0.5, 8.0)
        cx, cy = rng.uniform(0, 60, 2)
        rings.append(np.column_stack([cx + r * np.cos(ang),
                                      cy + r * np.sin(ang)]))
    pack = geom.pack_ring_edges(rings)
    n_pairs = int(rng.integers(1, 5000))
    ids = np.sort(rng.integers(0, n_rings, n_pairs))
    px = rng.uniform(-5, 65, n_pairs)
    py = rng.uniform(-5, 65, n_pairs)
    a = geom._pairs_pip_exploded(px, py, ids, pack)
    # n_pairs < 5000 is under the 32768 dispatch threshold, so the
    # public entry always takes the exploded path here; force_cohort
    # calls the cohort body DIRECTLY so the layout that runs on hot
    # dense-cell groups is compared on the same inputs (ADVICE r3).
    if force_cohort:
        got = geom._pairs_pip_cohort(px, py, ids, pack)
    else:
        got = geom.points_in_rings_pairs(px, py, ids, pack)
    np.testing.assert_array_equal(got, a)


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(1, 3))
def test_wkb_gpkg_shp_record_roundtrips(seed, n_holes):
    """Random polygon (+ holes) survives every binary codec exactly:
    WKB, GPKG blob, and the shapefile record layout (up to ring
    orientation, which the shp writer normalizes)."""
    from geotreehealth_ray.sources import geoformats as gf

    rng = np.random.default_rng(seed)
    nv = int(rng.integers(3, 24))
    ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
    r = rng.uniform(5.0, 20.0)
    ext = np.column_stack([50 + r * np.cos(ang), 50 + r * np.sin(ang)])
    holes = []
    for _ in range(n_holes):
        hv = int(rng.integers(3, 8))
        hang = np.sort(rng.uniform(0, 2 * np.pi, hv))
        hr = rng.uniform(0.2, 1.5)
        hc = 50 + rng.uniform(-1, 1, 2)
        holes.append(np.column_stack([hc[0] + hr * np.cos(hang),
                                      hc[1] + hr * np.sin(hang)]))
    # WKB
    buf = gf.rings_to_wkb(ext, holes=holes)
    (gext, gholes), = gf.parse_wkb_polygons(buf)
    np.testing.assert_array_equal(gext, ext)
    assert len(gholes) == len(holes)
    for a, b in zip(gholes, holes):
        np.testing.assert_array_equal(a, b)
    # GPKG blob header
    assert gf.strip_gpkg_header(gf.make_gpkg_blob(buf)) == buf
    # exact net area is codec-invariant
    want = geom.polygon_area_with_holes(ext, holes)
    assert geom.polygon_area_with_holes(gext, gholes) == want
