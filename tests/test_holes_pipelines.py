"""Hole-aware distributed kernels (r4): donut crowns flow through the
big pipelines — assignment join, pair join, chip extraction, zonal
stats — and compute shapely-covers semantics (interior excluded,
boundaries inclusive) instead of aborting or silently filling
(reference produces holed polygons via ``difference``,
tree_delineation/delineation_utils.py:38-47)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geotreehealth_ray.functions import geom
from geotreehealth_ray.pipelines.chips import (
    GridSpec,
    extract_chips,
    extract_chips_storage,
    zonal_stats,
)
from geotreehealth_ray.sources import synth

RING_T = pa.list_(pa.struct([("x", pa.float64()), ("y", pa.float64())]))
HOLES_T = pa.list_(RING_T)


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth_holes")
    return synth.write_all(synth.TINY, str(out))


def _with_holes(crowns_path: str, frac_px: float = 0.35):
    """Crowns table + a holes column: every 3rd crown gets a centered
    square hole scaled to its bbox. Returns (holed_table, holes_map)."""
    t = pq.read_table(crowns_path)
    holes_rows = []
    holes_map = {}
    for i in range(len(t)):
        cid = t["crown_id"][i].as_py()
        if i % 3 == 0:
            minx = t["minx"][i].as_py(); maxx = t["maxx"][i].as_py()
            miny = t["miny"][i].as_py(); maxy = t["maxy"][i].as_py()
            cx = (minx + maxx) / 2; cy = (miny + maxy) / 2
            hw = (maxx - minx) * frac_px / 2; hh = (maxy - miny) * frac_px / 2
            h = np.array([[cx - hw, cy - hh], [cx + hw, cy - hh],
                          [cx + hw, cy + hh], [cx - hw, cy + hh]])
            holes_rows.append([[{"x": float(x), "y": float(y)}
                                for x, y in h]])
            holes_map[cid] = [h]
        else:
            holes_rows.append([])
            holes_map[cid] = []
    return t.append_column("holes", pa.array(holes_rows, HOLES_T)), holes_map


def test_chips_holed_masks_and_path_agreement(tiny, ray_session):
    import ray.data as rd

    grid = GridSpec.from_synth(synth.TINY)
    holed_t, holes_map = _with_holes(tiny["crowns"])
    crowns_holed = rd.from_arrow(holed_t)
    crowns_plain = rd.read_parquet(tiny["crowns"])
    images = rd.read_parquet(tiny["images"])
    tiles = rd.read_parquet(tiny["tiles"])

    a = extract_chips_storage(crowns_holed, tiny["tiles"], images,
                              grid).to_pandas().set_index("crown_id")
    b = extract_chips_storage(crowns_plain, tiny["tiles"], images,
                              grid).to_pandas().set_index("crown_id")
    c = extract_chips(crowns_holed, tiles, images,
                      grid).to_pandas().set_index("crown_id")
    assert sorted(a.index) == sorted(b.index) == sorted(c.index)
    n_holed_hit = 0
    for cid in a.index:
        # storage and in-memory paths agree exactly on holed inputs
        assert a.loc[cid, "mask_px_count"] == c.loc[cid, "mask_px_count"]
        assert a.loc[cid, "pixel_checksum"] == c.loc[cid, "pixel_checksum"]
        assert a.loc[cid, "bytes"] == c.loc[cid, "bytes"]
        if holes_map[cid]:
            # the hole must carve pixels out (holes here are sized to
            # guarantee interior pixel centers at the synth resolution)
            if a.loc[cid, "mask_px_count"] < b.loc[cid, "mask_px_count"]:
                n_holed_hit += 1
        else:
            assert a.loc[cid, "mask_px_count"] == b.loc[cid, "mask_px_count"]
            assert a.loc[cid, "pixel_checksum"] == b.loc[cid, "pixel_checksum"]
    assert n_holed_hit > 0


def test_zonal_holed_px_counts(tiny, ray_session):
    import ray.data as rd

    grid = GridSpec.from_synth(synth.TINY)
    holed_t, holes_map = _with_holes(tiny["crowns"])
    za = zonal_stats(rd.from_arrow(holed_t), tiny["tiles"],
                     grid).to_pandas().set_index("crown_id")
    zb = zonal_stats(rd.read_parquet(tiny["crowns"]), tiny["tiles"],
                     grid).to_pandas().set_index("crown_id")
    holed_lost = 0
    for cid in za.index:
        if holes_map[cid]:
            assert za.loc[cid, "px_count"] <= zb.loc[cid, "px_count"]
            if za.loc[cid, "px_count"] < zb.loc[cid, "px_count"]:
                holed_lost += 1
        else:
            assert za.loc[cid, "px_count"] == zb.loc[cid, "px_count"]
            assert list(za.loc[cid, "band_sums"]) == list(
                zb.loc[cid, "band_sums"])
    assert holed_lost > 0


def test_pip_pairs_and_assign_exclude_hole_stems(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.assign import (
        assign_stems_to_crowns,
        pip_join_pairs,
    )

    ext = np.array([[0, 0], [12, 0], [12, 12], [0, 12]], float)
    hole = np.array([[4, 4], [8, 4], [8, 8], [4, 8]], float)
    crowns = rd.from_arrow(pa.table({
        "crown_id": pa.array(["donut"]),
        "ring": pa.array([[{"x": float(x), "y": float(y)}
                           for x, y in ext]], RING_T),
        "holes": pa.array([[[{"x": float(x), "y": float(y)}
                             for x, y in hole]]], HOLES_T),
        "cx": pa.array([6.0]), "cy": pa.array([6.0]),
        "minx": pa.array([0.0]), "miny": pa.array([0.0]),
        "maxx": pa.array([12.0]), "maxy": pa.array([12.0]),
    }))
    stems = rd.from_items([
        {"stem_id": "in_ring", "x": 2.0, "y": 6.0},
        {"stem_id": "in_hole", "x": 6.0, "y": 6.0},
        {"stem_id": "on_hole_edge", "x": 4.0, "y": 6.0},  # boundary=inside
        {"stem_id": "outside", "x": 30.0, "y": 30.0},
    ])
    pairs = pip_join_pairs(stems, crowns).to_pandas()
    assert sorted(pairs["stem_id"]) == ["in_ring", "on_hole_edge"]
    asgn, un = assign_stems_to_crowns(stems, crowns)
    df = asgn.to_pandas()
    # nearest-to-centroid among contained stems: on_hole_edge (d=2)
    assert df["stem_id"].tolist() == ["on_hole_edge"]
    # unassigned = stems minus WINNERS (in_ring is contained but loses
    # the nearest-stem pick; in_hole is excluded by the hole parity)
    assert sorted(un.to_pandas()["stem_id"]) == [
        "in_hole", "in_ring", "outside"]


def _ring_col(rings):
    return pa.array([[{"x": float(x), "y": float(y)} for x, y in r]
                     for r in rings], RING_T)


def _holes_col(holes):
    return pa.array([[[{"x": float(x), "y": float(y)} for x, y in h]
                      for h in hs] for hs in holes], HOLES_T)


def _sq(x1, y1, x2, y2):
    return np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2]], float)


def test_intersection_area_with_holes_exact():
    a = _sq(0, 0, 10, 10); ha = [_sq(1, 1, 9, 9)]
    b = _sq(2, 2, 8, 8)
    # b entirely inside a's hole -> zero net intersection
    assert geom.intersection_area_with_holes(a, ha, b, None) == 0.0
    # filled comparison
    assert geom.intersection_area_star(a, b) == 36.0
    # partial: c overlaps a's frame and hole
    c = _sq(-2, -2, 3, 3)  # I(a,c)=9, I(ha,c)=4 -> 5
    assert geom.intersection_area_with_holes(a, ha, c, None) == 5.0
    # holes on both sides incl. hole-hole overlap
    d = _sq(0, 0, 10, 10); hd = [_sq(3, 3, 7, 7)]
    # I(a,d)=100 - I(ha,d)=64 - I(hd,a)=16 + I(ha,hd)=16 -> 36
    assert geom.intersection_area_with_holes(a, ha, d, hd) == 36.0
    assert geom.polygon_area_with_holes(a, ha) == 36.0


def _nms_input(ray_session):
    """A = 10x10 donut (frame), B = 6x6 box inside A's hole, C = far
    box. Filled treatment suppresses B under A; hole-aware keeps it."""
    import ray.data as rd

    rings = [_sq(0, 0, 10, 10), _sq(2, 2, 8, 8), _sq(20, 20, 26, 26)]
    holes = [[_sq(1, 1, 9, 9)], [], []]
    t = pa.table({
        "crown_id": pa.array(["c_A", "c_B", "c_C"]),
        "ring": _ring_col(rings),
        "holes": _holes_col(holes),
        "score": pa.array([3.0, 2.0, 1.0]),
        "cx": pa.array([5.0, 5.0, 23.0]),
        "cy": pa.array([5.0, 5.0, 23.0]),
        "minx": pa.array([0.0, 2.0, 20.0]),
        "miny": pa.array([0.0, 2.0, 20.0]),
        "maxx": pa.array([10.0, 8.0, 26.0]),
        "maxy": pa.array([10.0, 8.0, 26.0]),
    })
    return rd.from_arrow(t), rd.from_arrow(t.drop_columns(["holes"]))


def test_greedy_nms_hole_aware(ray_session):
    from geotreehealth_ray.pipelines.nms import greedy_nms

    holed, filled = _nms_input(ray_session)
    a = greedy_nms(holed, threshold=0.3).to_pandas().set_index("crown_id")
    b = greedy_nms(filled, threshold=0.3).to_pandas().set_index("crown_id")
    assert bool(a.loc["c_B", "selected"]) is True     # hole: no overlap
    assert bool(b.loc["c_B", "selected"]) is False    # filled: suppressed
    assert bool(a.loc["c_A", "selected"]) and bool(a.loc["c_C", "selected"])


def test_merge_components_hole_aware(ray_session):
    from geotreehealth_ray.pipelines.nms import merge_overlapping_components

    holed, filled = _nms_input(ray_session)
    a = merge_overlapping_components(holed).to_pandas().set_index("crown_id")
    b = merge_overlapping_components(filled).to_pandas().set_index("crown_id")
    assert a.loc["c_A", "component_id"] != a.loc["c_B", "component_id"]
    assert b.loc["c_A", "component_id"] == b.loc["c_B", "component_id"]


def test_remove_smaller_overlapping_hole_aware(ray_session):
    from geotreehealth_ray.pipelines.cleanup import remove_smaller_overlapping

    holed, filled = _nms_input(ray_session)
    a = remove_smaller_overlapping(holed, min_frac=0.5).to_pandas()
    b = remove_smaller_overlapping(filled, min_frac=0.5).to_pandas()
    assert sorted(a["crown_id"]) == ["c_A", "c_B", "c_C"]
    assert sorted(b["crown_id"]) == ["c_A", "c_C"]


def test_drop_degenerate_net_area(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.cleanup import drop_degenerate

    rings = [_sq(0, 0, 4, 4), _sq(10, 10, 14, 14)]
    holes = [[_sq(0, 0, 4, 4)], []]  # first is hollowed to zero net
    t = pa.table({
        "crown_id": pa.array(["hollow", "solid"]),
        "ring": _ring_col(rings),
        "holes": _holes_col(holes),
    })
    out = drop_degenerate(rd.from_arrow(t)).to_pandas()
    assert out["crown_id"].tolist() == ["solid"]
    out2 = drop_degenerate(
        rd.from_arrow(t.drop_columns(["holes"]))).to_pandas()
    assert sorted(out2["crown_id"]) == ["hollow", "solid"]
