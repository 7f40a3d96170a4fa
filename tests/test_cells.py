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
