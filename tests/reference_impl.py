"""Single-process reference implementations mirroring the reference
repo's semantics with plain loops (FIXTURES.md §6). These are the
golden oracles the distributed pipelines must match exactly.

Cites: assign_polygon_to_crown — reference
tree_health_detection/utils.py:310-339; unassigned report
utils.py:330-332; greedy NMS get_polygons.py:785-819; kNN prompts
get_polygons.py:326-329; dedup batch_sam.py:740-765; median polygon
batch_sam.py:158-178.
"""

from __future__ import annotations

import numpy as np

from geotreehealth_ray.functions import geom


def assign_reference(stems: dict, crowns: dict) -> tuple[list, set]:
    """stems: {stem_id: (x, y)}; crowns: {crown_id: (ring, cx, cy)}.
    Returns ([(crown_id, stem_id, dist)], unassigned stem_id set)."""
    sids = sorted(stems)
    sx = np.array([stems[s][0] for s in sids])
    sy = np.array([stems[s][1] for s in sids])
    rows = []
    assigned = set()
    for cid in sorted(crowns):
        ring, ccx, ccy = crowns[cid]
        inside = geom.points_in_ring(sx, sy, ring)
        if not inside.any():
            continue
        idx = np.where(inside)[0]
        d = np.hypot(sx[idx] - ccx, sy[idx] - ccy)
        j = idx[int(np.argmin(d))]  # ids sorted → lowest-id tie-break
        rows.append((cid, sids[j], float(np.hypot(sx[j] - ccx, sy[j] - ccy))))
        assigned.add(sids[j])
    return rows, set(sids) - assigned


def nms_reference(items: list[tuple[str, float, np.ndarray]],
                  threshold: float = 0.3) -> dict[str, bool]:
    """Greedy NMS, global score-desc order with crown_id-asc tie-break
    (reference get_polygons.py:798-816: sort by score, suppress when
    intersection / max(area) > threshold). Returns {crown_id: selected}."""
    order = sorted(items, key=lambda t: (-t[1], t[0]))
    selected: dict[str, bool] = {}
    kept: list[tuple[str, np.ndarray]] = []
    for cid, _score, ring in order:
        ok = True
        for _kid, kring in kept:
            if geom.overlap_of_max_area(ring, kring) > threshold:
                ok = False
                break
        selected[cid] = ok
        if ok:
            kept.append((cid, ring))
    return selected


def knn_reference(ids: list[str], x: np.ndarray, y: np.ndarray,
                  k: int) -> dict[str, list[str]]:
    """For each point: the k nearest OTHER points, distance-asc with
    id-asc tie-break (reference get_polygons.py:326-329 argsort)."""
    out = {}
    for i, pid in enumerate(ids):
        d = np.hypot(x - x[i], y - y[i])
        order = sorted(
            (j for j in range(len(ids)) if j != i),
            key=lambda j: (d[j], ids[j]),
        )
        out[pid] = [ids[j] for j in order[:k]]
    return out
