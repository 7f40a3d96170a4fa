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
