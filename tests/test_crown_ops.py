"""Tests for the per-stem reductions (reference batch_sam.py:740-765,
158-178; delineation_utils.py:451-454; main.py:120-176)."""

import numpy as np
import pandas as pd
import pytest

from geotreehealth_ray.pipelines import crown_ops
from geotreehealth_ray.sources import synth


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth_ops")
    return synth.write_all(synth.TINY, str(out))


def test_dedup_stems_matches_pandas(tiny, ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    stems = rd.read_parquet(tiny["stems"])
    got = crown_ops.dedup_stems(stems).to_pandas().sort_values("stem_id")

    df = pq.read_table(tiny["stems"]).to_pandas()
    exp = (
        df.sort_values(["dbh", "year"], ascending=[False, False], kind="stable")
        .drop_duplicates("stem_id")
        .sort_values("stem_id")
    )
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True)[["stem_id", "dbh", "year"]],
        exp.reset_index(drop=True)[["stem_id", "dbh", "year"]],
    )
    # duplicates existed in the input (year-dup rows)
    assert len(df) > len(exp)


def test_select_median_polygon(tiny, ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    crowns = rd.read_parquet(tiny["crowns"])
    got = crown_ops.select_median_polygon(crowns).to_pandas()
    df = pq.read_table(tiny["crowns"]).to_pandas()
    labeled = df[df["stem_id"].notna()]
    # one row per labeled stem
    assert sorted(got["stem_id"]) == sorted(labeled["stem_id"].unique())
    # verify the median-closest rule on a grouped sample
    for sid, g in list(labeled.groupby("stem_id"))[:20]:
        med = g["area"].median()
        d = (g["area"] - med).abs()
        best = g.loc[d.idxmin(), "crown_id"]
        chosen = got.loc[got["stem_id"] == sid, "crown_id"].iloc[0]
        assert chosen == best


def test_filter_stems_predicates(tiny, ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    stems = rd.read_parquet(tiny["stems"])
    got = crown_ops.filter_stems(
        stems, min_crwnpst=2, min_dbh=10.0, sites=["HARV", "SERC"]
    ).to_pandas()
    df = pq.read_table(tiny["stems"]).to_pandas()
    exp = df[(df["crwnpst"] > 2) & (df["dbh"] > 10.0) & df["site_id"].isin(["HARV", "SERC"])]
    assert len(got) == len(exp)
    assert "D" not in set(got["status"])  # recode applied
    assert (got["dbh"] > 10).all()


def test_rebalance_by_class_deterministic(tiny, ray_session):
    import ray.data as rd

    stems = rd.read_parquet(tiny["stems"])
    a = crown_ops.rebalance_by_class(stems, min_count=5).to_pandas()
    b = crown_ops.rebalance_by_class(stems, min_count=5).to_pandas()
    key = ["stem_id", "year", "site_id", "status"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # balanced: within each site all classes have equal counts
    for site, g in a.groupby("site_id"):
        sizes = g.groupby("status").size()
        assert sizes.nunique() == 1
