"""Pivot (long→wide), unpivot (wide→long melt), and grouped MODE."""

import duckdb
import pandas as pd

from geotreehealth_ray.pipelines.relational import (
    grouped_mode,
    pivot_counts,
    unpivot,
)

SF = "/root/testdata/sf0.001"
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _duck(sql):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    return con.sql(sql).df()


def test_pivot_counts_matches_filter_aggregates(ray_session):
    import ray.data as rd

    got = (
        pivot_counts(
            rd.read_parquet(f"{SF}/events.parquet"), "user_id",
            "event_type", categories=EVENT_TYPES,
        )
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    exp = _duck(
        """SELECT user_id,
                  count(*) FILTER (event_type = 'click')    AS n_click,
                  count(*) FILTER (event_type = 'error')    AS n_error,
                  count(*) FILTER (event_type = 'purchase') AS n_purchase,
                  count(*) FILTER (event_type = 'signup')   AS n_signup,
                  count(*) FILTER (event_type = 'view')     AS n_view
           FROM events GROUP BY user_id ORDER BY user_id"""
    )
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))


def test_pivot_absent_category_yields_zero_column(ray_session):
    import ray.data as rd

    got = pivot_counts(
        rd.read_parquet(f"{SF}/events.parquet"), "user_id", "event_type",
        categories=["click", "no_such_type"],
    ).to_pandas()
    assert (got["n_no_such_type"] == 0).all()
    assert got["n_click"].sum() > 0


def test_unpivot_roundtrip_counts(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(f"{SF}/events.parquet")
    n = ds.count()
    long = unpivot(ds, id_cols=["event_id"], value_cols=["value"],
                   var_name="m", value_name="v")
    df = long.to_pandas()
    assert len(df) == n
    assert set(df["m"]) == {"value"}
    two = unpivot(ds, id_cols=["event_id"], value_cols=["value", "user_id"])
    assert two.count() == 2 * n


def test_grouped_mode_tie_breaks_to_smallest(ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        {"k": [1, 1, 1, 1, 2], "v": ["b", "b", "a", "a", "z"]}
    )
    got = (
        grouped_mode(rd.from_pandas(df), "k", "v")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert got["mode_val"].tolist() == ["a", "z"]


def test_grouped_mode_matches_sql(ray_session):
    import ray.data as rd

    got = (
        grouped_mode(
            rd.read_parquet(f"{SF}/events.parquet"), "user_id",
            "event_type", alias="top_event",
        )
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    exp = _duck(
        """SELECT user_id, top_event FROM (
             SELECT user_id, event_type AS top_event,
                    row_number() OVER (PARTITION BY user_id
                      ORDER BY count(*) DESC, event_type ASC) AS rn
             FROM events GROUP BY user_id, event_type) t
           WHERE rn = 1 ORDER BY user_id"""
    )
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))
