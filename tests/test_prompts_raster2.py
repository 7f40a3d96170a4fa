"""Prompt strategies, pansharpening fusion, sessionize/hash_join."""

import numpy as np
import pandas as pd
import pytest

from geotreehealth_ray.pipelines.knn import knn_cardinal, knn_points
from geotreehealth_ray.pipelines.prompts import PipelineConfig, build_prompts
from geotreehealth_ray.sources import synth
from geotreehealth_ray.stages import raster


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth_pr")
    return synth.write_all(synth.TINY, str(out))


def _stems_ds(tiny):
    import pyarrow.parquet as pq
    import ray.data as rd

    st = pq.read_table(tiny["stems"]).to_pandas().drop_duplicates("stem_id")
    return rd.from_pandas(st[["stem_id", "x", "y"]]), st


def test_prompts_distance_strategy(tiny, ray_session):
    stems, st = _stems_ds(tiny)
    nb = knn_points(stems, k=6, res=13)
    cfg = PipelineConfig(point_type="distance", neighbors=3, first_neigh=1)
    out = build_prompts(stems, nb, cfg).to_pandas()
    assert len(out) == len(st)
    st_idx = st.set_index("stem_id")
    sample = out.head(20)
    for r in sample.itertuples():
        assert r.pos_x == st_idx.loc[r.stem_id, "x"]
        assert len(r.neg_xs) <= 3
        for nx, ny in zip(r.neg_xs, r.neg_ys):
            d = np.hypot(nx - r.pos_x, ny - r.pos_y)
            assert d >= 3.0  # remove_too_close floor
    # deterministic
    out2 = build_prompts(stems, nb, cfg).to_pandas()
    a = out.sort_values("stem_id").reset_index(drop=True)
    b = out2.sort_values("stem_id").reset_index(drop=True)
    assert a["neg_xs"].astype(str).equals(b["neg_xs"].astype(str))


def test_prompts_cardinal_and_grid(tiny, ray_session):
    stems, st = _stems_ds(tiny)
    nb = knn_cardinal(stems, min_dist=3.0, res=13).map_batches(
        lambda df: df.rename(columns={}), batch_format="pandas"
    )
    cfg = PipelineConfig(point_type="cardinal")
    out = build_prompts(stems, nb, cfg).to_pandas()
    assert (out["neg_xs"].map(len) <= 4).all()

    cfgg = PipelineConfig(point_type="grid", neighbors=4, grid_step_m=5.0)
    outg = build_prompts(stems, nb, cfgg).to_pandas()
    r = outg.iloc[0]
    assert len(r["neg_xs"]) == 8
    for nx, ny in zip(r["neg_xs"], r["neg_ys"]):
        assert abs(nx - r["pos_x"]) in (0.0, 5.0)


def test_prompts_bbox_modes(tiny, ray_session):
    """mode='bbox' prompts with the box alone; 'bbox_and_centers' adds
    4 corner negatives + the center positive in the reference's order
    (get_polygons.py:171-262)."""
    import ray.data as rd

    stems, st = _stems_ds(tiny)
    boxes = pd.DataFrame(
        {
            "stem_id": ["b0", "b1"],
            "minx": [10.0, 40.0],
            "miny": [20.0, 50.0],
            "maxx": [14.0, 46.0],
            "maxy": [26.0, 58.0],
        }
    )
    boxes_ds = rd.from_pandas(boxes)

    cfg = PipelineConfig(mode="bbox")
    out = build_prompts(stems, None, cfg, boxes=boxes_ds).to_pandas()
    out = out.sort_values("stem_id").reset_index(drop=True)
    assert list(out["stem_id"]) == ["b0", "b1"]
    assert out["has_box"].all()
    assert np.isnan(out["pos_x"]).all()  # box-only: no point prompts
    assert (out["neg_xs"].map(len) == 0).all()
    assert out.loc[0, "box_minx"] == 10.0 and out.loc[0, "box_maxy"] == 26.0

    cfg2 = PipelineConfig(mode="bbox_and_centers")
    out2 = build_prompts(stems, None, cfg2, boxes=boxes_ds).to_pandas()
    out2 = out2.sort_values("stem_id").reset_index(drop=True)
    r = out2.iloc[0]
    assert r["pos_x"] == 12.0 and r["pos_y"] == 23.0  # box center
    # corners in reference order: (minx,miny),(maxx,maxy),(maxx,miny),(minx,maxy)
    assert list(r["neg_xs"]) == [10.0, 14.0, 14.0, 10.0]
    assert list(r["neg_ys"]) == [20.0, 26.0, 20.0, 26.0]

    with pytest.raises(ValueError, match="bbox"):
        build_prompts(stems, None, PipelineConfig(mode="bbox"))

    # point modes now share the unified schema
    nb = knn_points(stems, k=3, res=13)
    outp = build_prompts(stems, nb, PipelineConfig()).to_pandas()
    assert not outp["has_box"].any()
    assert np.isnan(outp["box_minx"]).all()


def test_pansharpen_shapes_and_lab_roundtrip():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    lab = raster.rgb_to_lab(rgb)
    back = raster.lab_to_rgb(lab)
    assert int(np.abs(back.astype(int) - rgb.astype(int)).max()) <= 1
    hsi_rgb = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    pan = rng.integers(0, 256, (32, 32)).astype(np.float64)
    fused = raster.pansharpen(hsi_rgb, pan)
    assert fused.shape == (32, 32, 3)
    assert fused.dtype == np.uint8


def test_bilinear_resize_identity_and_scale():
    img = np.arange(16, dtype=np.float64).reshape(4, 4)
    same = raster.bilinear_resize(img, 4, 4)
    np.testing.assert_allclose(same, img)
    up = raster.bilinear_resize(img, 8, 8)
    assert up.shape == (8, 8)
    assert up.min() >= img.min() and up.max() <= img.max()


def test_hash_join_matches_pandas(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import hash_join

    left = pd.DataFrame({"k": np.arange(100) % 17, "a": np.arange(100)})
    right = pd.DataFrame({"k": np.arange(30) % 17, "b": np.arange(30) * 2})
    got = hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k").to_pandas()
    exp = left.merge(right, on="k")
    key = ["k", "a", "b"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[key], exp[key])


def test_asof_join_semantics(ray_session):
    """Backward as-of: latest right.ts <= left.ts per key; inner (no
    earlier view → dropped); ties on right ts → max event_id."""
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import asof_join

    t = pd.to_datetime
    left = pd.DataFrame(
        {"event_id": [10, 11, 12, 13],
         "user_id": [1, 1, 2, 3],
         "ts": t(["2020-01-01 01:00", "2020-01-01 03:00",
                  "2020-01-01 02:00", "2020-01-01 02:00"])}
    )
    right = pd.DataFrame(
        {"event_id": [1, 2, 3, 4, 5],
         "user_id": [1, 1, 1, 2, 2],
         # user 1: views at 00:30 and 02:00 (tie pair 2/3 at 02:00);
         # user 2: view AFTER the click only at 03:00, plus 01:00
         "ts": t(["2020-01-01 00:30", "2020-01-01 02:00",
                  "2020-01-01 02:00", "2020-01-01 01:00",
                  "2020-01-01 03:00"]),
         "value": [1.0, 2.0, 3.0, 4.0, 5.0]}
    )
    right.loc[2, "event_id"] = 3  # tie: ids 2 and 3 at the same ts
    out = asof_join(rd.from_pandas(left), rd.from_pandas(right)).to_pandas()
    out = out.sort_values("event_id").reset_index(drop=True)
    # click 10 (01:00) → view 1 (00:30); click 11 (03:00) → tie at
    # 02:00 resolved to max id 3; click 12 (02:00) → view 4 (01:00);
    # click 13: user 3 has no view → dropped (inner)
    assert list(out["event_id"]) == [10, 11, 12]
    assert list(out["match_event_id"]) == [1, 3, 4]
    assert list(out["match_value"]) == [1.0, 3.0, 4.0]
    assert list(out["lag_us"]) == [30 * 60 * 10**6, 3600 * 10**6,
                                   3600 * 10**6]


def test_sessionize_gap_semantics(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import sessionize

    ts = pd.to_datetime(
        ["2020-01-01 00:00:00", "2020-01-01 00:10:00", "2020-01-01 01:30:00",
         "2020-01-01 01:40:00", "2020-01-01 05:00:00"]
    )
    df = pd.DataFrame(
        {"user_id": [1, 1, 1, 1, 1], "event_id": range(5), "ts": ts,
         "event_type": "x", "value": 1.0, "props": ""}
    )
    out = sessionize(rd.from_pandas(df), gap_s=1800).to_pandas()
    out = out.sort_values("session_start").reset_index(drop=True)
    assert len(out) == 3
    assert list(out["n_events"]) == [2, 2, 1]
    assert out.loc[0, "duration_s"] == 600
