"""Poison-row quarantine for map_batches kernels.

The reference swallows per-polygon exceptions silently
(tree_health_detection/main.py:126-134: ``except Exception: continue``)
— at 10^12 rows that drops data with no audit trail. This wrapper is
the SURVEY §4 replacement: a failing batch is bisected until the
poison rows are isolated; healthy rows still flow through the kernel,
poison rows come out as rows too, flagged with ``q_error`` (the
exception text) and null kernel outputs. Nothing is lost, the failure
set is queryable downstream (``filter(q_error is not null)``), and a
clean batch pays exactly one kernel call — the bisection costs
O(log batch) kernel calls ONLY on batches that actually contain a
poison row.

Contract: ``fn`` is a pandas kernel whose output is row-aligned per
input batch is NOT required — outputs of healthy sub-batches are
concatenated as-is; quarantined rows carry the ``keep_cols`` identity
columns so they can be joined back to the source.
"""

from __future__ import annotations

import traceback

import numpy as np
import pandas as pd

__all__ = ["quarantine_map_batches"]


def _apply(fn, df: pd.DataFrame, keep_cols: list[str], out: list) -> None:
    """Recursively bisect df until fn succeeds or a single poison row
    is isolated; append (is_good, frame) pieces to out."""
    if not len(df):
        return
    try:
        res = fn(df)
        res = res.copy()
        res["q_error"] = pd.Series([None] * len(res), dtype=object)
        out.append(res)
        return
    except Exception as exc:  # noqa: BLE001 — quarantine IS the handler
        if len(df) == 1:
            row = df[keep_cols].copy()
            msg = "".join(
                traceback.format_exception_only(type(exc), exc)
            ).strip()
            row["q_error"] = msg
            out.append(row)
            return
    mid = len(df) // 2
    _apply(fn, df.iloc[:mid], keep_cols, out)
    _apply(fn, df.iloc[mid:], keep_cols, out)


def quarantine_map_batches(ds, fn, keep_cols: list[str],
                           batch_size: int | None = None):
    """``ds.map_batches(fn)`` with poison-row quarantine: the output
    dataset has the kernel's columns plus ``q_error`` (null = healthy
    row, else the isolating exception's message) and, for quarantined
    rows, the ``keep_cols`` identity columns (kernel columns null)."""

    def run(df: pd.DataFrame) -> pd.DataFrame:
        pieces: list[pd.DataFrame] = []
        _apply(fn, df, keep_cols, pieces)
        if not pieces:
            empty = pd.DataFrame({c: pd.Series([], dtype=object)
                                  for c in keep_cols})
            empty["q_error"] = pd.Series([], dtype=object)
            return empty
        return pd.concat(pieces, ignore_index=True)

    kwargs = {} if batch_size is None else {"batch_size": batch_size}
    return ds.map_batches(run, batch_format="pandas", **kwargs)
