"""Relational building blocks used by the engine's query surface:
partial-aggregation groupbys, broadcast hash joins, windowed event
aggregates, argmax-per-key dedup. These are the Ray-Data-idiomatic
counterparts of the reference's pandas merge/groupby usage
(SURVEY.md §2.4-2.6) applied to arbitrary tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["grouped_agg", "broadcast_join", "latest_per_key", "hourly_window_agg"]


def grouped_agg(ds, keys: list[str], sum_cols: dict[str, str],
                mean_cols: dict[str, str] | None = None,
                count_alias: str | None = None):
    """groupby(keys) with sums/means/count, pre-aggregated per batch
    inside map_batches before the shuffle (combiner pattern — the
    shuffle moves one row per key per batch, not every input row).

    sum_cols / mean_cols: {output_name: input_col}.
    """
    mean_cols = mean_cols or {}
    need = sorted({*sum_cols.values(), *mean_cols.values()})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False)
        out = pd.DataFrame(index=g.size().index)
        for name, col in sum_cols.items():
            out[f"__s_{name}"] = g[col].sum()
        for name, col in mean_cols.items():
            out[f"__s_mean_{name}"] = g[col].sum()
        out["__n"] = g.size()
        return out.reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        row = {k: [g[k].iloc[0]] for k in keys}
        n = int(g["__n"].sum())
        for name in sum_cols:
            row[name] = [g[f"__s_{name}"].sum()]
        for name in mean_cols:
            row[name] = [g[f"__s_mean_{name}"].sum() / n]
        if count_alias:
            row[count_alias] = [np.int64(n)]
        return pd.DataFrame(row)

    return partials.groupby(keys).map_groups(final, batch_format="pandas")


def broadcast_join(ds, small_df: pd.DataFrame, on: str | list[str],
                   how: str = "inner"):
    """Hash join against a SMALL side broadcast once via ray.put and
    merged per batch (no shuffle — ray_guide 'Joins and lookups')."""
    import ray

    ref = ray.put(small_df)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return df.merge(ray.get(ref), on=on, how=how)

    return ds.map_batches(fn, batch_format="pandas")


def latest_per_key(ds, key: str, order_cols: list[str]):
    """One row per key: max by order_cols (desc), deterministic
    (the 'latest record wins' dedup — reference batch_sam.py:764-765)."""

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_cols, ascending=False, kind="stable").head(1)

    return ds.groupby(key).map_groups(pick, batch_format="pandas")


def hourly_window_agg(events, ts_col: str = "ts", key: str = "user_id",
                      value_col: str = "value", window_s: int = 3600):
    """Tumbling event-time window aggregate per key: (key, window_start
    epoch-seconds, total_value, n_events). Ray Data has no watermarks
    (SURVEY.md §2.9 — reference is strictly batch too); windows are
    computed by bucketing epoch(ts) // window_s with partial
    pre-aggregation, equivalent to SQL GROUP BY key, floor(epoch/size)."""

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        epoch = df[ts_col].astype("int64") // 1_000_000  # us → s
        out = pd.DataFrame(
            {
                key: df[key],
                "window_start": (epoch // window_s) * window_s,
                # integer micro-units: exact, order-insensitive sums
                # that match SQL sum(floor(value*1e6+0.5)) bit-for-bit
                "__v": np.floor(df[value_col].to_numpy() * 1e6 + 0.5).astype(np.int64),
            }
        )
        g = out.groupby([key, "window_start"], sort=False)
        agg = g["__v"].agg(["sum", "size"]).reset_index()
        return agg.rename(columns={"sum": "__s", "size": "__n"})

    partials = events.map_batches(bucket, batch_format="pandas")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key: [g[key].iloc[0]],
                "window_start": [np.int64(g["window_start"].iloc[0])],
                "total_value": [int(g["__s"].sum()) / 1e6],
                "n_events": [np.int64(g["__n"].sum())],
            }
        )

    return partials.groupby([key, "window_start"]).map_groups(
        final, batch_format="pandas"
    )
