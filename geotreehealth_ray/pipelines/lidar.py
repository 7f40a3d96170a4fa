"""LiDAR point-cloud operators.

Reference semantics mirrored:
- per-crown lidar crop: boolean mask of points inside the crown bbox
  (reference tree_health_detection/store_data_structures.py:58-63,
  delineation_utils.py:354-359, utils.py:95-104) — here a
  cell-co-partitioned range join emitting per-crown stats + (optional)
  packed point payloads;
- normalize: subtract centroid (build_dataloaders.py:96-109);
- subsample/pad to max_points — deterministic hash-of-index sampling
  instead of np.random.choice (build_dataloaders.py:47-55; cap 2700
  config.py:73), so any parallelism level emits identical rows.

Physical plan mirrors the PIP join (pipelines/assign.py): lidar points
carry their cell; crowns halo-replicate to every cell their bbox
covers; groupby(cell) co-locates; per-cell the point grid index serves
bbox probes; a crown spanning cells gets partial stats per cell that a
bucketed reduce merges (sum/max are mergeable).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


from ..functions import cells
from ..stages.spatial import explode_to_covering_cells, scramble_cell

__all__ = ["crown_lidar_stats", "subsample_points", "normalize_xyz"]


def normalize_xyz(xyz: np.ndarray) -> np.ndarray:
    return xyz - xyz.mean(axis=0, keepdims=True)


def subsample_points(xyz: np.ndarray, max_points: int = 2700) -> np.ndarray:
    """Deterministic subsample (or zero-pad) to max_points: points are
    ranked by blake2-style mix of their index — stable, seed-free."""
    n = len(xyz)
    if n >= max_points:
        idx = np.arange(n, dtype=np.uint64)
        mixed = (idx * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
        keep = np.argsort(mixed, kind="stable")[:max_points]
        return xyz[np.sort(keep)]
    pad = np.zeros((max_points - n, xyz.shape[1]), dtype=xyz.dtype)
    return np.vstack([xyz, pad])


_UNION = pa.schema(
    [
        ("side", pa.int8()),
        ("cell", pa.uint64()),
        ("x", pa.float64()),
        ("y", pa.float64()),
        ("z", pa.float64()),
        ("crown_id", pa.string()),
        ("minx", pa.float64()),
        ("miny", pa.float64()),
        ("maxx", pa.float64()),
        ("maxy", pa.float64()),
    ]
)


def _nulls(n, typ):
    return pa.nulls(n, typ)


def _stats_cell(group: pa.Table) -> pa.Table:
    side = group["side"].to_numpy()
    pts = group.filter(pa.array(side == 0))
    crowns = group.filter(pa.array(side == 1))
    empty = pa.table(
        {
            "crown_id": pa.array([], pa.string()),
            "n_points": pa.array([], pa.int64()),
            "max_z": pa.array([], pa.float64()),
            "sum_z": pa.array([], pa.float64()),
        }
    )
    if len(pts) == 0 or len(crowns) == 0:
        return empty
    # vectorized range join: points sorted by the (y-bucket, x)
    # composite key, one array searchsorted for all crown boxes, then
    # per-crown reduceat aggregation — no per-crown Python loop
    # (assign.py's candidate machinery; chunks are crown-contiguous)
    from .assign import _bbox_candidate_pairs, _stem_sort_key

    px = pts["x"].to_numpy()
    py = pts["y"].to_numpy()
    pz = pts["z"].to_numpy()
    skey = _stem_sort_key(px, py)
    order = np.argsort(skey, kind="stable")
    py_s, pz_s, skey_s = py[order], pz[order], skey[order]
    cids = crowns["crown_id"].to_numpy(zero_copy_only=False)
    bb = [crowns[c].to_numpy() for c in ("minx", "miny", "maxx", "maxy")]
    out = {"crown_id": [], "n_points": [], "max_z": [], "sum_z": []}
    for box_ids, pt in _bbox_candidate_pairs(
        skey_s, py_s, bb[0], bb[1], bb[2], bb[3]
    ):
        bounds = np.flatnonzero(np.r_[True, box_ids[1:] != box_ids[:-1]])
        z = pz_s[pt]
        out["crown_id"].append(cids[box_ids[bounds]])
        out["n_points"].append(
            np.diff(np.r_[bounds, len(box_ids)]).astype(np.int64)
        )
        out["max_z"].append(np.maximum.reduceat(z, bounds))
        out["sum_z"].append(np.add.reduceat(z, bounds))
    if not out["crown_id"]:
        return empty
    return pa.table(
        {
            "crown_id": pa.array(np.concatenate(out["crown_id"]), pa.string()),
            "n_points": pa.array(np.concatenate(out["n_points"]), pa.int64()),
            "max_z": pa.array(np.concatenate(out["max_z"]), pa.float64()),
            "sum_z": pa.array(np.concatenate(out["sum_z"]), pa.float64()),
        }
    )


def crown_lidar_stats(lidar, crowns, res: int = cells.DEFAULT_RES):
    """(crown_id, n_points, max_z, mean_z) — per-crown stats of lidar
    points inside the crown bbox (the raster↔vector range join of the
    lidar modality). max_z is the canopy-height proxy."""
    from .relational import bucketed_reduce
    from ..stages.spatial import attach_cell

    def point_side(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table(
            {
                "side": pa.array(np.zeros(n, np.int8)),
                "cell": t["cell"],
                "x": t["x"],
                "y": t["y"],
                "z": t["z"],
                "crown_id": _nulls(n, pa.string()),
                "minx": _nulls(n, pa.float64()),
                "miny": _nulls(n, pa.float64()),
                "maxx": _nulls(n, pa.float64()),
                "maxy": _nulls(n, pa.float64()),
            },
            schema=_UNION,
        )

    def crown_side(t: pa.Table) -> pa.Table:
        t = explode_to_covering_cells(t, res=res)
        n = len(t)
        return pa.table(
            {
                "side": pa.array(np.ones(n, np.int8)),
                "cell": t["cell"],
                "x": _nulls(n, pa.float64()),
                "y": _nulls(n, pa.float64()),
                "z": _nulls(n, pa.float64()),
                "crown_id": t["crown_id"],
                "minx": t["minx"],
                "miny": t["miny"],
                "maxx": t["maxx"],
                "maxy": t["maxy"],
            },
            schema=_UNION,
        )

    p = lidar.select_columns(["x", "y", "z"]).map_batches(
        lambda t: attach_cell(t, res=res), batch_format="pyarrow"
    ).map_batches(point_side, batch_format="pyarrow")
    c = crowns.select_columns(
        ["crown_id", "minx", "miny", "maxx", "maxy"]
    ).map_batches(crown_side, batch_format="pyarrow")

    from .relational import sorted_group_map

    partials = sorted_group_map(
        p.union(c).map_batches(scramble_cell, batch_format="pyarrow"),
        ["cell"], _stats_cell,
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("crown_id", sort=False)
        out = g.agg(
            n_points=("n_points", "sum"),
            max_z=("max_z", "max"),
            sum_z=("sum_z", "sum"),
        ).reset_index()
        out["mean_z"] = out["sum_z"] / out["n_points"]
        return out[["crown_id", "n_points", "max_z", "mean_z"]]

    return bucketed_reduce(partials, "crown_id", merge)
