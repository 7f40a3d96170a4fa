"""Cleanup family, treetop detector, field alignment."""

import numpy as np
import pandas as pd
import pytest

from geotreehealth_ray.functions import geom
from geotreehealth_ray.pipelines import alignment, cleanup, treetops
from geotreehealth_ray.sources import synth


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth_cln")
    return synth.write_all(synth.TINY, str(out))


def test_remove_perc_of_smallest(tiny, ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    crowns = rd.read_parquet(tiny["crowns"])
    out = cleanup.remove_perc_of_smallest(crowns, pct=20.0).to_pandas()
    df = pq.read_table(tiny["crowns"]).to_pandas()
    assert len(out) < len(df)
    # roughly the bottom 20% by area removed (quantile is exact here —
    # the sample covers the whole tiny table)
    thresh = np.quantile(df["area"], 0.20)
    assert (out["area"] >= thresh).all()


def test_remove_smaller_overlapping(tiny, ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    crowns = rd.read_parquet(tiny["crowns"])
    got = cleanup.remove_smaller_overlapping(crowns, min_frac=0.5).to_pandas()
    df = pq.read_table(tiny["crowns"]).to_pandas()
    assert len(got) < len(df)  # some were dropped
    assert got["kept"].all()
    # survivors: no pair among them overlaps >50% of the smaller…
    # verified on a sample driver-side
    from geotreehealth_ray.stages.spatial import rings_from_arrow

    cr = pq.read_table(tiny["crowns"])
    rings = dict(zip(cr["crown_id"].to_pylist(), rings_from_arrow(cr["ring"])))
    kept = sorted(got["crown_id"])[:60]
    for i in range(len(kept)):
        for j in range(i + 1, len(kept)):
            a, b = rings[kept[i]], rings[kept[j]]
            if not geom.bbox_intersects(*geom.ring_bbox(a), *geom.ring_bbox(b)):
                continue
            inter = geom.intersection_area_star(a, b)
            assert inter <= 0.5 * min(geom.ring_area(a), geom.ring_area(b)) + 1e-9


def test_subtract_overlap_kernel():
    a = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float) + 100.0
    b = np.array([[7, 0], [14, 0], [14, 10], [7, 10]], float) + 100.0
    # shared = 3x10 = 30 → 30/70 ≈ 0.43 of smaller → in (0.10, 0.50]
    out = cleanup.subtract_overlap_from_larger_kernel(a, b)
    assert out is not None
    # vector difference: larger (a, 100 m²) loses the 30 m²
    # intersection. The collinear shared edges here take the nudge
    # path (error ~1e-9·perimeter); general-position pairs are exact.
    assert sum(geom.ring_area(r) for r in out) == pytest.approx(70.0, abs=1e-5)
    # disjoint → None
    c = b + 50.0
    assert cleanup.subtract_overlap_from_larger_kernel(a, c) is None


def test_drop_degenerate(ray_session):
    import pyarrow as pa
    import ray.data as rd

    rows = [
        {"crown_id": "ok", "ring": [{"x": 0.0, "y": 0.0}, {"x": 5.0, "y": 0.0}, {"x": 5.0, "y": 5.0}]},
        {"crown_id": "line", "ring": [{"x": 0.0, "y": 0.0}, {"x": 5.0, "y": 0.0}, {"x": 10.0, "y": 0.0}]},
        {"crown_id": "two", "ring": [{"x": 0.0, "y": 0.0}, {"x": 1.0, "y": 1.0}]},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = cleanup.drop_degenerate(ds).to_pandas()
    assert list(out["crown_id"]) == ["ok"]


def test_detect_treetops(tiny, ray_session):
    import ray.data as rd

    lidar = rd.read_parquet(tiny["lidar"])
    tops = treetops.detect_treetops(lidar, grid_m=2.0, min_height=8.0).to_pandas()
    assert len(tops) > 10
    assert (tops["height"] >= 8.0).all()
    # deterministic
    tops2 = treetops.detect_treetops(lidar, grid_m=2.0, min_height=8.0).to_pandas()
    a = tops.sort_values(["x", "y"]).reset_index(drop=True)
    b = tops2.sort_values(["x", "y"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_alignment_recovers_known_shift(tiny, ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    st = pq.read_table(tiny["stems"]).to_pandas().drop_duplicates("stem_id")
    ref = st[["stem_id", "x", "y"]].copy()
    field = ref.copy()
    # known affine-ish distortion: shift + small linear term
    field["x"] = field["x"] - (1.5 + 0.001 * field["y"])
    field["y"] = field["y"] + (0.8 - 0.0005 * field["x"])
    matched = alignment.match_control_points(field, ref)
    coef = alignment.fit_offset_model(matched)
    ds = rd.from_pandas(field)
    out = alignment.apply_alignment(ds, coef).to_pandas().set_index("stem_id")
    ref = ref.set_index("stem_id")
    err = np.hypot(
        out["x_aligned"] - ref.loc[out.index, "x"],
        out["y_aligned"] - ref.loc[out.index, "y"],
    )
    assert err.max() < 0.05  # recovered to centimeters
