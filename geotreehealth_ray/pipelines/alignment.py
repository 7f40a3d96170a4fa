"""Field-data alignment: learn per-axis coordinate offsets from matched
control points and shift all field stems.

Reference: ``FieldAlignment`` (reference field_data_alignment/
utils.py:12-119) — inner-join field↔reference stems on StemTag, fit
GBM + RF regressors on the (x, y) offsets, predict shifted geometries
for every field stem. sklearn is unavailable in-sandbox, so the model
slot is a from-scratch ridge-regularized polynomial least squares on
(x, y) features — the fit/broadcast/apply shape is identical and the
regressor is pluggable.

Plan: the matched-pair set is small (field plots), so the join + fit
run driver-side on collected pairs; the fitted coefficient matrix is
broadcast via ray.put and applied vectorized in map_batches
(SURVEY.md §2.3 "fit driver-side, broadcast model to appliers").
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["fit_offset_model", "apply_alignment", "match_control_points"]


def _design(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    return np.column_stack(
        [np.ones_like(x), x, y, x * y, x * x, y * y]
    )


def fit_offset_model(matched: pd.DataFrame, ridge: float = 1e-6) -> np.ndarray:
    """matched: columns (x_field, y_field, x_ref, y_ref). Returns a
    (6, 2) coefficient matrix mapping design(x, y) → (dx, dy)."""
    a = _design(matched["x_field"].to_numpy(), matched["y_field"].to_numpy())
    b = np.column_stack(
        [
            matched["x_ref"].to_numpy() - matched["x_field"].to_numpy(),
            matched["y_ref"].to_numpy() - matched["y_field"].to_numpy(),
        ]
    )
    ata = a.T @ a + ridge * np.eye(a.shape[1])
    return np.linalg.solve(ata, a.T @ b)


def match_control_points(field_df: pd.DataFrame, ref_df: pd.DataFrame) -> pd.DataFrame:
    """Inner join on stem_id (reference field_data_alignment/utils.py:32)."""
    m = field_df[["stem_id", "x", "y"]].merge(
        ref_df[["stem_id", "x", "y"]], on="stem_id", suffixes=("_field", "_ref")
    )
    return m


def apply_alignment(stems, coef: np.ndarray):
    """Broadcast the fitted model and shift every stem's coordinates
    (adds x_aligned / y_aligned columns)."""
    import ray
    import pyarrow as pa

    ref = ray.put(coef)

    def fn(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        x = t["x"].to_numpy()
        y = t["y"].to_numpy()
        d = _design(x, y) @ c
        return t.append_column(
            "x_aligned", pa.array(x + d[:, 0], pa.float64())
        ).append_column("y_aligned", pa.array(y + d[:, 1], pa.float64()))

    return stems.map_batches(fn, batch_format="pyarrow")
