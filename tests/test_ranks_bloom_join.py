"""Ranking-window family (RANK / DENSE_RANK / NTILE) and the
Bloom-pushdown semi join (output bit-identical to the exact semi)."""

import duckdb
import pandas as pd
import pytest

from geotreehealth_ray.pipelines.relational import group_ranks, hash_join
from geotreehealth_ray.pipelines.sketch import bloom_semi_join

SF = "/root/testdata/sf0.001"


def _duck(sql):
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.sql(sql).df()


def test_group_ranks_match_sql_windows(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(f"{SF}/lineitem.parquet")
    got = group_ranks(
        ds, "l_suppkey", "l_quantity", ["l_orderkey", "l_linenumber"],
        n_tiles=4,
    ).to_pandas()
    exp = _duck(
        """SELECT l_suppkey, l_quantity, l_orderkey, l_linenumber,
                  rank() OVER (PARTITION BY l_suppkey
                               ORDER BY l_quantity) AS rnk,
                  dense_rank() OVER (PARTITION BY l_suppkey
                                     ORDER BY l_quantity) AS drnk,
                  ntile(4) OVER (PARTITION BY l_suppkey
                                 ORDER BY l_quantity, l_orderkey,
                                          l_linenumber) AS tile
           FROM lineitem"""
    )
    key = ["l_suppkey", "l_orderkey", "l_linenumber"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)[got.columns]
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))


def test_group_ranks_tie_semantics(ray_session):
    # crafted ties: rank leaves a gap after a tie, dense_rank doesn't
    import ray.data as rd

    df = pd.DataFrame(
        {"k": [1] * 4, "v": [10.0, 10.0, 20.0, 30.0], "id": [1, 2, 3, 4]}
    )
    got = (
        group_ranks(rd.from_pandas(df), "k", "v", ["id"], n_tiles=2)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert got["rnk"].tolist() == [1, 1, 3, 4]
    assert got["drnk"].tolist() == [1, 1, 2, 3]
    assert got["tile"].tolist() == [1, 1, 2, 2]


def test_ntile_fewer_rows_than_tiles(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"k": [7, 7], "v": [1.0, 2.0], "id": [1, 2]})
    got = (
        group_ranks(rd.from_pandas(df), "k", "v", ["id"], n_tiles=4)
        .to_pandas()
        .sort_values("id")
    )
    assert got["tile"].tolist() == [1, 2]


def test_bloom_semi_join_equals_exact_semi(ray_session):
    import ray.data as rd

    cust = rd.read_parquet(f"{SF}/customer.parquet").select_columns(
        ["c_custkey", "c_name"]
    )
    urgent = (
        rd.read_parquet(f"{SF}/orders.parquet")
        .filter(expr="o_orderpriority == '1-URGENT'")
        .map_batches(
            lambda df: df[["o_custkey"]].rename(columns={"o_custkey": "c_custkey"}),
            batch_format="pandas",
        )
    )
    fast = (
        bloom_semi_join(cust, urgent, on="c_custkey")
        .to_pandas().sort_values("c_custkey").reset_index(drop=True)
    )
    exact = (
        hash_join(cust, urgent, on="c_custkey", how="semi")
        .to_pandas().sort_values("c_custkey").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, exact)
    assert len(fast) > 0


def test_bloom_semi_join_rejects_anti():
    with pytest.raises(ValueError):
        bloom_semi_join(None, None, on="k", how="anti")
