"""Deterministic stratified train/val/test split.

Reference: sklearn ``train_test_split(stratify=Status_SiteID)`` 70/15/15
with seed 42 (reference tree_health_detection/main.py:185-194,
utils.py:231-270). RNG-state splitting breaks under parallelism, so
this engine assigns each row a stable uniform draw u = hash(id)/2^64
and splits per stratum by rank of u — deterministic at any parallelism,
approximately stratified at the configured fractions (exact as group
size → ∞; per-stratum counts deviate by < 1 row from rank-splitting).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .crown_ops import stable_hash_u64
from .relational import bucketed_reduce

__all__ = ["stratified_split", "stratified_sample_n", "weighted_sample"]


def stratified_split(ds, id_col: str, strata_cols: list[str],
                     fractions=(0.70, 0.15, 0.15),
                     names=("train", "val", "test"),
                     hash_fn=stable_hash_u64):
    """Adds a ``split`` column. Within each stratum, rows ranked by
    hash(id) are cut at the cumulative fractions — exact per-stratum
    proportions up to integer rounding, stable across runs.

    Cut points use integer percent arithmetic (``n·pct // 100``) so an
    external SQL oracle computes the identical boundary with no float
    rounding hazard; ``hash_fn`` is injectable for the same reason
    (md5-hex ranks are reconstructible in DuckDB)."""
    cum_pct = np.cumsum([int(round(f * 100)) for f in fractions])
    assert cum_pct[-1] == 100

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__u"] = hash_fn(df[id_col].to_numpy())
        df["__stratum"] = df[strata_cols].astype(str).agg("_".join, axis=1)
        out = []
        for _, g in df.groupby("__stratum", sort=False):
            # cut at the UNIQUE-id level: duplicate rows of one entity
            # (e.g. a stem's multi-year records) share a split, and the
            # result is independent of row order
            uids = g[[id_col, "__u"]].drop_duplicates(id_col)
            uids = uids.sort_values(["__u", id_col], kind="stable")
            n = len(uids)
            bounds = [(n * int(p)) // 100 for p in cum_pct]
            labels = np.empty(n, dtype=object)
            prev = 0
            for b, name in zip(bounds, names):
                labels[prev:b] = name
                prev = b
            labels[prev:] = names[-1]
            lut = dict(zip(uids[id_col], labels))
            g = g.assign(split=g[id_col].map(lut))
            out.append(g)
        return pd.concat(out).drop(columns=["__u", "__stratum"])

    # strata must be reduced globally per stratum → bucket on the
    # stratum key (all rows of a stratum share a bucket)
    def add_stratum(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__sk"] = df[strata_cols].astype(str).agg("_".join, axis=1)
        return df

    with_key = ds.map_batches(add_stratum, batch_format="pandas")
    return bucketed_reduce(
        with_key, "__sk", lambda df: assign(df.drop(columns="__sk"))
    )


def stratified_sample_n(ds, id_col: str, strata_cols: list[str], n_per: int):
    """Equal-n deterministic subset per stratum (reference
    stratified_subset_indices, main.py:37-45): lowest hash(id) first."""

    def add_stratum(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__sk"] = df[strata_cols].astype(str).agg("_".join, axis=1)
        return df

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__u"] = stable_hash_u64(df[id_col].to_numpy())
        df = df.sort_values(["__sk", "__u", id_col], kind="stable")
        out = df.groupby("__sk", sort=False).head(n_per)
        return out.drop(columns=["__sk", "__u"])

    with_key = ds.map_batches(add_stratum, batch_format="pandas")
    return bucketed_reduce(with_key, "__sk", pick)


def weighted_sample(ds, id_col: str, domain_col: str,
                    weights: dict[str, float], default: float = 1.0,
                    keep_cols: list[str] | None = None):
    """Domain-weighted deterministic downsampling (training-data mixture
    control): a row survives iff the first 32 bits of md5(id) fall below
    its domain's keep-fraction threshold. Pure per-batch filter — zero
    shuffle, zero state, identical keep-set at any parallelism, and the
    md5-hex comparison is reconstructible verbatim by a SQL oracle
    (``substr(md5(id),1,8) < '<thr_hex>'``).

    Weights must be in [0, 1): thresholds are 8-hex-digit strings and
    lowercase-hex string order equals numeric order only at fixed
    width."""
    from .crown_ops import md5_hex_hash

    for w in [*weights.values(), default]:
        if not (0.0 <= w < 1.0):
            raise ValueError("weights must be in [0, 1)")
    thr = {d: format(int(w * 2**32), "08x") for d, w in weights.items()}
    thr_default = format(int(default * 2**32), "08x")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        hexes = md5_hex_hash(df[id_col].to_numpy())
        pre = np.array([h[:8] for h in hexes], dtype=object)
        cut = df[domain_col].map(thr).fillna(thr_default).to_numpy(dtype=object)
        keep = pre < cut
        out = df[keep]
        return out[keep_cols] if keep_cols else out

    return ds.map_batches(fn, batch_format="pandas")
