"""ROLLUP grouping sets and the Count-Min frequency sketch."""

import duckdb
import numpy as np
import pandas as pd

from geotreehealth_ray.pipelines.relational import rollup_sum
from geotreehealth_ray.pipelines.sketch import cms_cells, cms_estimate

SF = "/root/testdata/sf0.001"


def test_rollup_levels_and_totals(ray_session):
    import ray.data as rd

    got = rollup_sum(
        rd.read_parquet(f"{SF}/orders.parquet"),
        ["o_orderpriority", "o_orderstatus"], "o_totalprice",
        scale=100, sum_alias="sum_cents",
    ).to_pandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    exp = con.sql(
        """SELECT o_orderpriority, o_orderstatus,
                  CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
                       AS BIGINT) AS sum_cents,
                  count(*) AS n
           FROM orders
           GROUP BY ROLLUP(o_orderpriority, o_orderstatus)"""
    ).df()
    key = ["o_orderpriority", "o_orderstatus"]
    got = got.sort_values(key, na_position="last").reset_index(drop=True)
    exp = exp.sort_values(key, na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp[got.columns])
    # structural invariants: grand total row present, level sums agree
    grand = got[got["o_orderpriority"].isna()]
    assert len(grand) == 1
    finest = got[got["o_orderstatus"].notna()]
    assert finest["n"].sum() == grand["n"].iloc[0]
    assert finest["sum_cents"].sum() == grand["sum_cents"].iloc[0]


def test_cms_never_underestimates_and_is_tight(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(f"{SF}/orders.parquet")
    cells = cms_cells(ds, "o_custkey").to_pandas()
    true = (
        ds.select_columns(["o_custkey"]).to_pandas()["o_custkey"]
        .value_counts()
    )
    keys = true.index.to_numpy()
    est = cms_estimate(cells, keys)
    # CMS is a one-sided estimator: never below the true count
    assert (est >= true.to_numpy()).all()
    # at 1.5k keys vs 4096-wide x depth-4 table, collisions are rare:
    # the heavy keys should be exact
    exact_frac = float(np.mean(est == true.to_numpy()))
    assert exact_frac > 0.95
    # total mass in any row equals the input row count
    assert cells.groupby("row")["cnt"].sum().nunique() == 1
    assert int(cells[cells["row"] == 0]["cnt"].sum()) == ds.count()


def test_cms_absent_key_estimates_near_zero(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(f"{SF}/orders.parquet")
    cells = cms_cells(ds, "o_custkey").to_pandas()
    est = cms_estimate(cells, np.arange(10_000_000, 10_000_100))
    # absent keys can only collide; with this load factor most read 0
    assert float(np.mean(est == 0)) > 0.9


def test_grouping_sets_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import grouping_sets_sum

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], 500),
        "b": rng.choice(["p", "q"], 500),
        "v": rng.uniform(0, 100, 500),
    })
    out = grouping_sets_sum(
        rd.from_pandas(df), [["a"], ["b"], []], "v", scale=100
    ).to_pandas()
    sv = np.floor(df["v"].to_numpy() * 100 + 0.5).astype(np.int64)
    d2 = df.assign(sv=sv)
    # per-a level
    for g, sub in d2.groupby("a"):
        row = out[(out["a"] == g) & (out["b"].isna())]
        assert len(row) == 1
        assert int(row["sum_scaled"].iloc[0]) == sub["sv"].sum()
        assert int(row["n"].iloc[0]) == len(sub)
    # per-b level
    for g, sub in d2.groupby("b"):
        row = out[(out["b"] == g) & (out["a"].isna())]
        assert int(row["sum_scaled"].iloc[0]) == sub["sv"].sum()
    # grand total
    row = out[out["a"].isna() & out["b"].isna()]
    assert len(row) == 1 and int(row["sum_scaled"].iloc[0]) == sv.sum()
    assert len(out) == 3 + 2 + 1


def test_heavy_hitters_exact_vs_bruteforce(ray_session):
    import math

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from geotreehealth_ray.pipelines.sketch import heavy_hitters

    rng = np.random.default_rng(7)
    # zipf-ish: few hot keys + long tail
    hot = np.repeat(np.array([1, 2, 3], np.int64), [400, 250, 120])
    tail = rng.integers(100, 5000, 2000)
    keys = np.concatenate([hot, tail])
    rng.shuffle(keys)
    df = pd.DataFrame({"k": keys})
    for phi in (0.02, 0.05, 0.1):
        out = heavy_hitters(
            rd.from_pandas(df).repartition(7), "k", phi,
            key_alias="k", count_alias="n",
        ).to_pandas()
        thresh = math.ceil(phi * len(keys))
        vc = df["k"].value_counts()
        want = vc[vc >= thresh].sort_index()
        got = out.sort_values("k").reset_index(drop=True)
        assert list(got["k"]) == list(want.index)
        assert list(got["n"]) == list(want.values)


def test_equidepth_histogram_exact_counts_and_invariance(ray_session):
    import hashlib

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from geotreehealth_ray.pipelines.sketch import equidepth_histogram

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "id": np.arange(2000, dtype=np.int64),
        "val": rng.normal(50.0, 20.0, 2000),
    })
    out = equidepth_histogram(
        rd.from_pandas(df).repartition(6), "id", "val", bins=32, scale=100
    ).to_pandas().sort_values("bin").reset_index(drop=True)

    # brute-force reference: md5-ranked sample → sorted boundaries →
    # exact cumulative counts
    scaled = np.floor(df["val"].to_numpy() * 100 + 0.5).astype("int64")
    rank = np.array([
        hashlib.md5(str(i).encode()).hexdigest() for i in df["id"]
    ])
    samp_idx = np.lexsort((df["id"].to_numpy(), rank))[:32]
    bounds = np.sort(scaled[samp_idx])
    cum = np.searchsorted(np.sort(scaled), bounds, side="right")
    assert list(out["boundary_c"]) == list(bounds)
    assert list(out["cum_count"]) == list(cum)

    # parallelism invariance: different block structure, same rows
    out2 = equidepth_histogram(
        rd.from_pandas(df).repartition(13), "id", "val", bins=32, scale=100
    ).to_pandas().sort_values("bin").reset_index(drop=True)
    assert out.equals(out2)

    # the q-quantile estimate lands within O(1/sqrt(bins)) rank error
    n = len(scaled)
    for q in (0.25, 0.5, 0.9):
        est = out[out["cum_count"] >= q * n]["boundary_c"].iloc[0]
        rank_err = abs((scaled <= est).sum() - q * n) / n
        assert rank_err < 2.0 / np.sqrt(32)


def test_heavy_hitters_no_hitters_returns_empty(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from geotreehealth_ray.pipelines.sketch import heavy_hitters

    # uniform keys: nobody reaches phi=0.1 of 1000 rows (regression:
    # the empty-candidate path used to pd.concat an empty batch list)
    df = pd.DataFrame({"k": np.arange(1000, dtype=np.int64)})
    out = heavy_hitters(
        rd.from_pandas(df).repartition(5), "k", 0.1,
        key_alias="k", count_alias="n",
    ).to_pandas()
    assert len(out) == 0
    # (Ray Data does not preserve column metadata through an empty
    # from_pandas → to_pandas round trip, so only emptiness is
    # asserted — the crash regression is the point.)


def test_grouped_hll_accuracy_sequential_and_random(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from geotreehealth_ray.pipelines.sketch import (
        hll_estimate_by_key,
        hll_registers_by_key,
    )

    rng = np.random.default_rng(41)
    # sequential keys are the adversarial case for raw FNV (clustered
    # high bits) — the splitmix finalizer must hold ~2% error here too
    df = pd.DataFrame({
        "grp": np.r_[np.zeros(6000, np.int64), np.ones(9000, np.int64)],
        "val": np.r_[
            np.arange(3000, dtype=np.int64)[
                rng.integers(0, 3000, 6000)
            ],
            rng.integers(0, 10**12, 9000),
        ],
    })
    regs = hll_registers_by_key(
        rd.from_pandas(df).repartition(6), "grp", "val"
    ).to_pandas()
    est = hll_estimate_by_key(regs, "grp").set_index("grp")["est_distinct"]
    for g in (0, 1):
        exact = df[df["grp"] == g]["val"].nunique()
        assert abs(est[g] - exact) / exact < 0.05, (g, est[g], exact)
