"""Independent single-process oracles for the polygon-NMS composites.

VERDICT r4 'What's wrong' #3: the synth_* composite oracles were
distribution goldens built from the ENGINE'S OWN kernels
(geotreehealth_ray/goldenref.py) — they catch distributed-plan bugs
but co-inherit any kernel bug. This module reimplements the geometry
from scratch with a DIFFERENT algorithm so the oracle and the engine
share only the spec:

- engine (functions/geom.py): signed fan-triangle decomposition +
  Sutherland–Hodgman convex clipping per triangle pair;
- here: y-slab trapezoid decomposition — breakpoints at every vertex
  y and every cross-polygon edge-intersection y, even-odd interval
  coverage at each slab's midline, exact midpoint integration (width
  is linear within a refined slab, so midpoint × height IS the
  integral).

The two methods agree to float rounding on any pair of simple
polygons; greedy NMS decisions can only diverge if a pair's overlap
metric lands within ~1e-9 of the threshold — measure-zero for the
synthetic inputs, and a loud gate failure if it ever happens.

No imports from geotreehealth_ray (checked by the gate test).
"""
from __future__ import annotations

import numpy as np
import pandas as pd


def shoelace(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return float(abs(np.sum(x * np.roll(y, -1)) - np.sum(y * np.roll(x, -1)))) / 2.0


def _edge_cross_ys(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """y-coordinates of every intersection between an edge of ring a
    and an edge of ring b (all pairs, vectorized)."""
    p1 = a
    p2 = np.roll(a, -1, axis=0)
    q1 = b
    q2 = np.roll(b, -1, axis=0)
    r = p2 - p1
    s = q2 - q1
    denom = r[:, None, 0] * s[None, :, 1] - r[:, None, 1] * s[None, :, 0]
    qp = q1[None, :, :] - p1[:, None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (qp[:, :, 0] * s[None, :, 1] - qp[:, :, 1] * s[None, :, 0]) / denom
        u = (qp[:, :, 0] * r[:, None, 1] - qp[:, :, 1] * r[:, None, 0]) / denom
    ok = (denom != 0.0) & (t >= 0.0) & (t <= 1.0) & (u >= 0.0) & (u <= 1.0)
    ys = p1[:, None, 1] + t * r[:, None, 1]
    return ys[ok]


def _coverage_at(ring: np.ndarray, ym: float) -> np.ndarray:
    """Sorted x-crossings of the ring with the horizontal line y=ym;
    consecutive pairs are the even-odd coverage intervals."""
    y1 = ring[:, 1]
    y2 = np.roll(y1, -1)
    m = (np.minimum(y1, y2) < ym) & (np.maximum(y1, y2) > ym)
    if not m.any():
        return np.empty(0)
    x1 = ring[m, 0]
    x2 = np.roll(ring[:, 0], -1)[m]
    t = (ym - y1[m]) / (y2[m] - y1[m])
    xs = x1 + t * (x2 - x1)
    xs.sort()
    return xs


def _interval_overlap_width(xa: np.ndarray, xb: np.ndarray) -> float:
    """Total width of the intersection of two even-odd interval sets
    (each given as sorted crossing xs, paired consecutively)."""
    if len(xa) < 2 or len(xb) < 2:
        return 0.0
    a = xa.reshape(-1, 2)
    b = xb.reshape(-1, 2)
    lo = np.maximum(a[:, None, 0], b[None, :, 0])
    hi = np.minimum(a[:, None, 1], b[None, :, 1])
    return float(np.maximum(hi - lo, 0.0).sum())


def intersection_area(a: np.ndarray, b: np.ndarray) -> float:
    """Exact |A ∩ B| for two simple rings via y-slab decomposition."""
    ylo = max(a[:, 1].min(), b[:, 1].min())
    yhi = min(a[:, 1].max(), b[:, 1].max())
    if ylo >= yhi or a[:, 0].max() <= b[:, 0].min() \
            or b[:, 0].max() <= a[:, 0].min():
        return 0.0
    ys = np.concatenate([a[:, 1], b[:, 1], _edge_cross_ys(a, b),
                         [ylo, yhi]])
    ys = np.unique(ys)
    ys = ys[(ys >= ylo) & (ys <= yhi)]
    total = 0.0
    for y0, y1 in zip(ys[:-1], ys[1:]):
        if y1 <= y0:
            continue
        ym = 0.5 * (y0 + y1)
        w = _interval_overlap_width(_coverage_at(a, ym),
                                    _coverage_at(b, ym))
        total += w * (y1 - y0)
    return total


def rings_of(df: pd.DataFrame) -> list[np.ndarray]:
    return [np.array([[p["x"], p["y"]] for p in r], np.float64)
            for r in df["ring"]]


def greedy_nms(df: pd.DataFrame, threshold: float = 0.3) -> pd.DataFrame:
    """Global greedy max-area-frac NMS (the reference spec,
    tree_delineation/get_polygons.py:785-819): order by (score desc,
    crown_id asc); suppress when inter / max(area) > threshold against
    any kept crown. Returns (crown_id, selected)."""
    ids = df["crown_id"].to_numpy()
    score = df["score"].to_numpy().astype(np.float64)
    rings = rings_of(df)
    order = np.lexsort((ids, -score))
    areas = np.array([shoelace(r) for r in rings])
    bbox = np.array([[r[:, 0].min(), r[:, 1].min(),
                      r[:, 0].max(), r[:, 1].max()] for r in rings])
    kept: list[int] = []
    sel = np.zeros(len(ids), dtype=bool)
    for i in order:
        ok = True
        for j in kept:
            if bbox[i, 2] <= bbox[j, 0] or bbox[j, 2] <= bbox[i, 0] \
                    or bbox[i, 3] <= bbox[j, 1] or bbox[j, 3] <= bbox[i, 1]:
                continue
            inter = intersection_area(rings[i], rings[j])
            if inter <= 0.0:
                continue
            if inter / max(areas[i], areas[j]) > threshold:
                ok = False
                break
        sel[i] = ok
        if ok:
            kept.append(i)
    out = pd.DataFrame({"crown_id": ids, "selected": sel})
    return out.sort_values("crown_id").reset_index(drop=True)
