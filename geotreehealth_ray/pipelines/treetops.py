"""Tree-top detection from the lidar canopy-height model.

Reference: DBSCAN-based treetop detector per tile (reference
tree_top_detector.py:6-50, selected by ``ttops`` config switch,
config.py:35 / delineation_pipeline.py:77-102). Re-expressed as a
per-cell numpy grid clustering: rasterize max-z onto a coarse grid,
threshold by height, union-find 8-connected high cells into clusters,
emit each cluster's peak as the treetop. Deterministic and stateless →
plain map_groups over cell partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .relational import sorted_group_map

from ..functions import cells

__all__ = ["detect_treetops"]


def _cluster_kernel(group: pa.Table, grid_m: float, min_height: float) -> pa.Table:
    x = group["x"].to_numpy()
    y = group["y"].to_numpy()
    z = group["z"].to_numpy()
    empty = pa.table(
        {
            "x": pa.array([], pa.float64()),
            "y": pa.array([], pa.float64()),
            "height": pa.array([], pa.float64()),
            "n_cells": pa.array([], pa.int64()),
        }
    )
    if len(x) == 0:
        return empty
    x0, y0 = x.min(), y.min()
    gx = ((x - x0) / grid_m).astype(np.int64)
    gy = ((y - y0) / grid_m).astype(np.int64)
    w = int(gx.max()) + 1
    h = int(gy.max()) + 1
    zmax = np.full((h, w), -np.inf)
    np.maximum.at(zmax, (gy, gx), z)
    high = zmax >= min_height
    if not high.any():
        return empty
    # union-find over 8-connected high cells
    lbl = -np.ones((h, w), dtype=np.int64)
    ids = np.nonzero(high)
    n = len(ids[0])
    lbl[ids] = np.arange(n)
    parent = np.arange(n)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for dy_, dx_ in ((0, 1), (1, -1), (1, 0), (1, 1)):
        ys, xs = ids
        ny, nx = ys + dy_, xs + dx_
        ok = (ny >= 0) & (ny < h) & (nx >= 0) & (nx < w)
        for a, b in zip(lbl[ys[ok], xs[ok]], lbl[ny[ok], nx[ok]]):
            if b >= 0:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[rb] = ra
    roots = np.array([find(i) for i in range(n)])
    out = {"x": [], "y": [], "height": [], "n_cells": []}
    ys, xs = ids
    for r in np.unique(roots):
        m = roots == r
        cz = zmax[ys[m], xs[m]]
        k = int(np.argmax(cz))
        # peak cell center in world coords
        out["x"].append(x0 + (xs[m][k] + 0.5) * grid_m)
        out["y"].append(y0 + (ys[m][k] + 0.5) * grid_m)
        out["height"].append(float(cz[k]))
        out["n_cells"].append(int(m.sum()))
    return pa.table(
        {
            "x": pa.array(out["x"], pa.float64()),
            "y": pa.array(out["y"], pa.float64()),
            "height": pa.array(out["height"], pa.float64()),
            "n_cells": pa.array(out["n_cells"], pa.int64()),
        }
    )


def detect_treetops(lidar, grid_m: float = 2.0, min_height: float = 5.0,
                    res: int = cells.DEFAULT_RES):
    """(x, y, height, n_cells) — one treetop per canopy cluster.
    Clusters are cell-local (a cluster straddling a cell boundary may
    yield one top per side — acceptable for the detector's purpose, as
    in the reference's per-tile loop which has the same property at
    tile boundaries)."""
    from ..stages.spatial import attach_cell, scramble_cell

    pts = lidar.select_columns(["x", "y", "z"]).map_batches(
        lambda t: attach_cell(t, res=res), batch_format="pyarrow"
    )
    return sorted_group_map(
        pts.map_batches(scramble_cell, batch_format="pyarrow"),
        ["cell"], _cluster_kernel,
        fn_kwargs={"grid_m": grid_m, "min_height": min_height},
    )
