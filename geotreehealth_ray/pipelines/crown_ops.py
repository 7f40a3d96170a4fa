"""Per-stem reductions over stems/crowns tables.

- ``dedup_stems``: keep one record per stem_id — max DBH first, then
  latest year (reference tree_delineation/batch_sam.py:740-741 sort by
  DBH desc + drop_duplicates, then :764-765 sort by Year desc + dedup).
- ``select_median_polygon``: per stem_id keep the crown whose area is
  closest to the group median area (reference batch_sam.py:158-178).
- ``best_box_per_stem``: per stem keep the row with max (crwnpst, dbh)
  (reference delineation_utils.py:451-454 sort desc + first).
- ``filter_stems``: the reference's attribute predicate stack
  (batch_sam.py:750-768, delineation_pipeline.py:105, main.py:149-159):
  crwnpst/dbh thresholds, site membership, D→DS status recode.
- ``rebalance_by_class``: per (site_id, status): drop classes with ≤
  min_count rows and downsample each remaining class to the min class
  size with a deterministic hash-of-id sample (reference
  main.py:162-176 value_counts + sample).

All reductions are groupby().map_groups with deterministic tie-breaks
(sort keys include the id), so N-CPU and 4N-CPU runs emit identical
rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["dedup_stems", "select_median_polygon", "best_box_per_stem",
           "filter_stems", "rebalance_by_class", "stable_hash_u64",
           "md5_hex_hash"]


def dedup_stems(stems):
    """One row per stem_id: max DBH, tie → latest year, tie → stable.
    Hash-bucketed reduce (vectorized per bucket, not per key)."""
    from .relational import bucketed_reduce

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["stem_id", "dbh", "year"], ascending=[True, False, False], kind="stable"
        )
        return df.drop_duplicates("stem_id", keep="first")

    return bucketed_reduce(stems, "stem_id", pick)


def select_median_polygon(crowns):
    """Per stem_id (non-null): crown whose area is closest to the group
    median area; ties broken by crown_id asc. Output = full crown rows."""
    from .relational import bucketed_reduce

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        med = df.groupby("stem_id")["area"].transform("median")
        df = df.assign(_d=(df["area"] - med).abs())
        df = df.sort_values(["stem_id", "_d", "crown_id"], kind="stable")
        return df.drop_duplicates("stem_id", keep="first").drop(columns="_d")

    labeled = crowns.map_batches(
        lambda t: t.filter(pc.is_valid(t["stem_id"])), batch_format="pyarrow"
    )
    return bucketed_reduce(labeled, "stem_id", pick)


def best_box_per_stem(rows, priority=("crwnpst", "dbh")):
    from .relational import bucketed_reduce

    cols = list(priority)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["stem_id"] + cols + ["year"],
            ascending=[True] + [False] * (len(cols) + 1),
            kind="stable",
        )
        return df.drop_duplicates("stem_id", keep="first")

    return bucketed_reduce(rows, "stem_id", pick)


def filter_stems(stems, min_crwnpst: int | None = None, min_dbh: float | None = None,
                 sites: list[str] | None = None, recode_status: bool = True):
    """Vectorized Arrow predicate stack (reference batch_sam.py:750-768)."""

    def fn(t: pa.Table) -> pa.Table:
        mask = pa.array(np.ones(len(t), dtype=bool))
        if min_crwnpst is not None:
            mask = pc.and_(mask, pc.greater(t["crwnpst"], min_crwnpst))
        if min_dbh is not None:
            mask = pc.and_(mask, pc.greater(t["dbh"], min_dbh))
        if sites is not None:
            mask = pc.and_(mask, pc.is_in(t["site_id"], value_set=pa.array(sites)))
        t = t.filter(mask)
        if recode_status:
            # D→DS recode (main.py:159)
            status = pc.if_else(
                pc.equal(t["status"], "D"), pa.scalar("DS"), t["status"]
            )
            t = t.set_column(t.schema.get_field_index("status"), "status", status)
        return t

    return stems.map_batches(fn, batch_format="pyarrow")


def stable_hash_u64(values: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit hash of string ids (RNG-free sampling key —
    SURVEY.md §7.4 determinism under parallelism)."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        h = hashlib.blake2b(str(v).encode(), digest_size=8).digest()
        out[i] = int.from_bytes(h, "little")
    return out


def md5_hex_hash(values: np.ndarray) -> np.ndarray:
    """md5 hex digest per id — rank-equivalent to DuckDB ``md5(id)``
    (fixed-width lowercase hex sorts identically as string and as the
    128-bit value), so deterministic sampling keyed on it can be
    reconstructed exactly by a SQL oracle."""
    return np.array(
        [hashlib.md5(str(v).encode()).hexdigest() for v in values],
        dtype=object,
    )


def rebalance_by_class(stems, min_count: int = 10,
                       hash_fn=stable_hash_u64):
    """Per site: drop (site, status) classes with ≤ min_count rows, then
    downsample every remaining class to the site's min class size.
    Sampling = lowest hash-of-stem_id first → identical rows at any
    parallelism (reference main.py:162-176 used RNG sampling)."""

    def per_site(g: pd.DataFrame) -> pd.DataFrame:
        counts = g["status"].value_counts()
        keep_classes = counts[counts > min_count]
        if keep_classes.empty:
            return g.head(0)
        n = int(keep_classes.min())
        parts = []
        for status in sorted(keep_classes.index):
            sub = g[g["status"] == status].copy()
            sub["_h"] = hash_fn(sub["stem_id"].to_numpy())
            sub = sub.sort_values(["_h", "stem_id"], kind="stable").head(n)
            parts.append(sub.drop(columns="_h"))
        return pd.concat(parts, ignore_index=True)

    return stems.groupby("site_id").map_groups(per_site, batch_format="pandas")
