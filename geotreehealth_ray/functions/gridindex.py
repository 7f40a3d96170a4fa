"""In-partition spatial grid index — the engine's R-tree equivalent
(reference builds rtree.index per DataFrame, e.g. batch_sam.py:225-228,
delineation_utils.py:119; here: a sorted-bucket numpy grid built once
per cell partition and probed per geometry, SURVEY.md §2.3 "index state
is per-cell-partition, never global").

Points are bucketed on a fine uniform grid (key = bx << 21 | by) and
sorted once; a bbox probe walks the ≤ few bucket columns overlapping
the box with two searchsorted calls each — O(log n + hits) instead of
O(n) per probe. This is what keeps dense forest-patch cells (10k+
stems) from turning the PIP join into an O(stems × crowns) scan.
"""

from __future__ import annotations

import numpy as np

__all__ = ["PointGridIndex"]

_SHIFT = np.uint64(21)


class PointGridIndex:
    def __init__(self, x: np.ndarray, y: np.ndarray, bucket_m: float = 4.0):
        self.bucket_m = bucket_m
        self.x = x
        self.y = y
        bx = np.floor(x / bucket_m).astype(np.uint64)
        by = np.floor(y / bucket_m).astype(np.uint64)
        key = (bx << _SHIFT) | by
        self.order = np.argsort(key, kind="stable")
        self.sorted_key = key[self.order]

    def query_bbox(self, minx: float, miny: float, maxx: float, maxy: float) -> np.ndarray:
        """Indices (into the original arrays) of points whose bucket
        intersects the bbox — a superset of points inside the bbox."""
        bs = self.bucket_m
        bx0 = int(np.floor(minx / bs))
        bx1 = int(np.floor(maxx / bs))
        by0 = np.uint64(max(0, int(np.floor(miny / bs))))
        by1 = np.uint64(max(0, int(np.floor(maxy / bs))))
        out = []
        for bx in range(max(0, bx0), bx1 + 1):
            base = np.uint64(bx) << _SHIFT
            lo = np.searchsorted(self.sorted_key, base | by0, side="left")
            hi = np.searchsorted(self.sorted_key, base | by1, side="right")
            if hi > lo:
                out.append(self.order[lo:hi])
        if not out:
            return np.empty(0, dtype=np.int64)
        return np.concatenate(out)
