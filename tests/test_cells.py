import numpy as np

from geotreehealth_ray.functions import cells


def test_roundtrip():
    x = np.array([0.0, 100.0, 5000.5, 123456.7])
    y = np.array([0.0, 250.0, 4999.9, 654321.0])
    c = cells.cell_of(x, y, res=13)
    res, gx, gy = cells.cell_decode(c)
    egx, egy = cells.cell_grid_xy(x, y, res=13)
    np.testing.assert_array_equal(gx, egx)
    np.testing.assert_array_equal(gy, egy)
    assert (res == 13).all()


def test_bounds_contain_point():
    x = np.array([1234.5, 99999.9])
    y = np.array([777.7, 123.4])
    c = cells.cell_of(x, y, res=10)
    minx, miny, maxx, maxy = cells.cell_bounds(c)
    assert ((x >= minx) & (x < maxx)).all()
    assert ((y >= miny) & (y < maxy)).all()
    edge = cells.cell_edge_m(10)
    np.testing.assert_allclose(maxx - minx, edge)


def test_same_cell_same_key():
    edge = cells.cell_edge_m(13)
    a = cells.cell_of(np.array([edge * 3 + 1.0]), np.array([edge * 5 + 1.0]), 13)
    b = cells.cell_of(np.array([edge * 3 + edge - 1]), np.array([edge * 5 + 0.5]), 13)
    assert a[0] == b[0]


def test_different_res_no_collision():
    x, y = np.array([500.0]), np.array([500.0])
    assert cells.cell_of(x, y, 10)[0] != cells.cell_of(x, y, 11)[0]


def test_neighbors_interior():
    edge = cells.cell_edge_m(8)
    c = cells.cell_of(np.array([edge * 10.5]), np.array([edge * 10.5]), 8)[0]
    nb = cells.neighbors(int(c))
    assert len(nb) == 9
    assert c in nb
    nb2 = cells.neighbors(int(c), include_self=False)
    assert len(nb2) == 8 and c not in nb2


def test_neighbors_corner():
    c = cells.cell_of(np.array([0.1]), np.array([0.1]), 8)[0]
    assert len(cells.neighbors(int(c))) == 4


def test_cells_covering():
    edge = cells.cell_edge_m(10)
    cs = cells.cells_covering(0.0, 0.0, edge * 2.5, edge * 1.5, res=10)
    assert len(cs) == 6  # 3 x 2 grid
    # single-cell bbox
    cs1 = cells.cells_covering(edge * 4 + 1, edge * 4 + 1, edge * 4 + 2, edge * 4 + 2, 10)
    assert len(cs1) == 1


def test_cells_covering_many():
    edge = cells.cell_edge_m(10)
    idx, cs = cells.cells_covering_many(
        np.array([0.0, edge * 5]),
        np.array([0.0, edge * 5]),
        np.array([edge * 0.5, edge * 6.5]),
        np.array([edge * 0.5, edge * 5.5]),
        res=10,
    )
    assert (idx == 0).sum() == 1
    assert (idx == 1).sum() == 2


def _xy2d_scalar(n, x, y):
    # classic scalar reference (Wikipedia "Hilbert curve")
    rx = ry = 0
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_scalar_reference():
    from geotreehealth_ray.functions import cells

    res = 5
    n = 1 << res
    gx, gy = np.meshgrid(np.arange(n), np.arange(n))
    gx, gy = gx.ravel(), gy.ravel()
    d = cells.hilbert_xy2d(gx, gy, res)
    ref = np.array([_xy2d_scalar(n, int(a), int(b)) for a, b in zip(gx, gy)])
    np.testing.assert_array_equal(d.astype(np.int64), ref)


def test_hilbert_bijective_roundtrip():
    from geotreehealth_ray.functions import cells

    res = 6
    n = 1 << res
    gx, gy = np.meshgrid(np.arange(n), np.arange(n))
    gx, gy = gx.ravel(), gy.ravel()
    d = cells.hilbert_xy2d(gx, gy, res)
    assert len(np.unique(d)) == n * n  # bijection onto [0, n^2)
    assert int(d.max()) == n * n - 1
    rx, ry = cells.hilbert_d2xy(d, res)
    np.testing.assert_array_equal(rx, gx)
    np.testing.assert_array_equal(ry, gy)


def test_hilbert_consecutive_cells_adjacent():
    """The defining locality property (why S2 uses Hilbert, not
    Z-order): consecutive curve indices are 4-neighbor grid cells."""
    from geotreehealth_ray.functions import cells

    res = 7
    n = 1 << res
    d = np.arange(n * n, dtype=np.uint64)
    gx, gy = cells.hilbert_d2xy(d, res)
    step = np.abs(np.diff(gx)) + np.abs(np.diff(gy))
    assert (step == 1).all()


def test_hilbert_of_key_layout_and_decode():
    from geotreehealth_ray.functions import cells

    rng = np.random.default_rng(5)
    x = rng.uniform(0, 100000, 500)
    y = rng.uniform(0, 100000, 500)
    key = cells.hilbert_of(x, y, 13)
    assert (key >> np.uint64(60) == 13).all()
    res, gx, gy = cells.hilbert_decode(key)
    egx, egy = cells.cell_grid_xy(x, y, 13)
    np.testing.assert_array_equal(gx, egx)
    np.testing.assert_array_equal(gy, egy)
