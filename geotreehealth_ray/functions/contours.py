"""Binary mask → polygon extraction (from-scratch replacement for
rasterio.features.shapes / cv2.findContours).

Reference semantics mirrored:
- ``mask_to_polygons``: polygons of connected True regions; keep the
  largest polygon containing the prompt point — reference
  tree_delineation/get_polygons.py:75-111; oracle: a 50×50 mask square
  yields a polygon with area == 2500 containing the prompt
  (reference tests/get_polygons_tests.py:13-33).
- ``mask_to_delineation`` nearest-fallback: if no polygon contains the
  point, take the one whose boundary is nearest —
  get_polygons.py:764-776.

Algorithm: boundary tracing on the pixel grid. Every edge between an
inside cell and an outside (or off-grid) cell contributes a unit
segment oriented so the inside region lies on its LEFT; walking
start→end corners links segments into closed rings. Outer rings come
out counter-clockwise (in x-right/y-down pixel coords), holes
clockwise; holes are dropped (the reference keeps simple exterior
rings). Pixel (col, row) occupies [col, col+1) × [row, row+1); vertex
coordinates are integer corners, so a w×h solid mask has exact area
w*h.
"""

from __future__ import annotations

import numpy as np

from . import geom

__all__ = ["mask_rings", "mask_to_polygon", "pick_polygon_for_point"]


def mask_rings(mask: np.ndarray) -> list[np.ndarray]:
    """All exterior rings of the True regions of ``mask`` (h, w) —
    (n, 2) float64 arrays in pixel corner coordinates (x=col, y=row)."""
    m = np.asarray(mask, dtype=bool)
    h, w = m.shape
    pad = np.zeros((h + 2, w + 2), dtype=bool)
    pad[1:-1, 1:-1] = m
    # oriented segments: inside on the left, coords are corner lattice
    # points of the padded grid minus the pad offset.
    segs: dict[tuple[int, int, int, int], None] = {}
    inside = pad[1:-1, 1:-1]
    up_out = ~pad[0:-2, 1:-1]
    down_out = ~pad[2:, 1:-1]
    left_out = ~pad[1:-1, 0:-2]
    right_out = ~pad[1:-1, 2:]
    ys, xs = np.nonzero(inside & up_out)
    seg_list = []
    # top edge: outside above → walk left-to-right keeps inside (below) on..
    # use convention: inside on LEFT while walking:
    #   top edge (outside above): walk +x? inside is below the edge →
    #   walking from (x, y) to (x+1, y) has below on the right. So walk
    #   -x: (x+1, y) -> (x, y).
    for x, y in zip(xs, ys):
        seg_list.append(((x + 1, y), (x, y)))
    ys, xs = np.nonzero(inside & down_out)
    for x, y in zip(xs, ys):
        seg_list.append(((x, y + 1), (x + 1, y + 1)))
    ys, xs = np.nonzero(inside & left_out)
    for x, y in zip(xs, ys):
        seg_list.append(((x, y), (x, y + 1)))
    ys, xs = np.nonzero(inside & right_out)
    for x, y in zip(xs, ys):
        seg_list.append(((x + 1, y + 1), (x + 1, y)))

    # start corner → list of segments (rare corners have 2: diagonal touch)
    by_start: dict[tuple[int, int], list[tuple[tuple[int, int], tuple[int, int]]]] = {}
    for s in seg_list:
        by_start.setdefault(s[0], []).append(s)
    for v in by_start.values():
        v.sort()  # deterministic choice at ambiguous corners

    used: set = set()
    rings: list[np.ndarray] = []
    for s0 in seg_list:
        if s0 in used:
            continue
        ring = [s0[0]]
        cur = s0
        while True:
            used.add(cur)
            nxt_corner = cur[1]
            if nxt_corner == ring[0]:
                break
            ring.append(nxt_corner)
            options = [s for s in by_start.get(nxt_corner, []) if s not in used]
            if not options:
                break  # open chain (cannot happen on valid masks)
            cur = options[0]
        if len(ring) >= 3:
            r = np.array(ring, dtype=np.float64)
            # inside-on-right walking in y-down pixel coords → exterior
            # rings have NEGATIVE signed area, holes positive
            if geom.signed_ring_area(r) < 0:
                rings.append(r[::-1])  # return CCW
    return rings


def pick_polygon_for_point(rings: list[np.ndarray], px: float, py: float
                           ) -> np.ndarray | None:
    """Largest ring containing the point; else the nearest ring
    (reference get_polygons.py:764-776). None when no rings."""
    if not rings:
        return None
    containing = [
        r for r in rings
        if geom.points_in_ring(np.array([px]), np.array([py]), r)[0]
    ]
    if containing:
        return max(containing, key=geom.ring_area)
    return min(rings, key=lambda r: geom.point_ring_distance(px, py, r))


def mask_to_polygon(mask: np.ndarray, px: float, py: float,
                    simplify_tol: float = 0.0) -> np.ndarray | None:
    """The reference ``mask_to_polygons`` composite: trace rings, pick
    for the prompt point, optionally Douglas–Peucker simplify
    (reference simplify(0.1) at delineation_pipeline.py:169)."""
    ring = pick_polygon_for_point(mask_rings(mask), px, py)
    if ring is not None and simplify_tol > 0:
        ring = geom.simplify_ring(ring, simplify_tol)
    return ring
