"""Pure-numpy planar geometry kernels (zero external deps).

From-scratch replacements for every shapely primitive the reference uses
(see SURVEY.md §2.8 and reference cites per function). All kernels are
vectorized where the hot path demands it; polygons are simple rings
represented as ``(n, 2)`` float64 arrays (open ring — last vertex is NOT
a repeat of the first; closure is implicit).

Crowns synthesized by this engine are *star-convex about their center*
(as the reference's mask→contour polygons effectively are, see
reference tree_delineation/get_polygons.py:705-780), which lets
polygon∩polygon area be computed exactly by fan-triangulating each ring
about its centroid and clipping convex triangle pairs
(Sutherland–Hodgman) — no general-polygon clipping dependency needed.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "convex_hull",
    "ring_area",
    "ring_centroid",
    "ring_bbox",
    "points_in_ring",
    "points_in_rings_any",
    "pack_ring_edges",
    "points_in_rings_pairs",
    "clip_ring_to_bbox",
    "convex_clip",
    "intersection_area_star",
    "difference_rings",
    "iou_star",
    "overlap_of_max_area",
    "simplify_ring",
    "ring_perimeter",
    "point_ring_distance",
    "make_star_ring",
    "bbox_intersects",
    "bbox_intersection_area",
]


def ring_area(ring: np.ndarray) -> float:
    """Shoelace area of a simple ring (reference: shapely ``.area``,
    used at tree_health_detection/main.py:120, batch_sam.py:784).
    Uses np.sum, NOT np.dot: BLAS ddot picks a different instruction
    path (and rounding order) for unaligned buffers, so bit-identical
    values could yield different areas depending on where a decoded
    ring landed in memory (seen with WKB payloads, whose doubles sit
    at byte 13). np.sum's pairwise order depends only on length."""
    x, y = ring[:, 0], ring[:, 1]
    return float(abs(np.sum(x * np.roll(y, -1)) - np.sum(y * np.roll(x, -1)))) / 2.0


def polygon_area_with_holes(ring: np.ndarray,
                            holes: list[np.ndarray] | None) -> float:
    """Net area of a polygon with interior rings: exterior shoelace
    minus each hole's shoelace (shapely ``.area`` semantics for holed
    polygons, e.g. the reference's ``difference`` outputs,
    tree_delineation/delineation_utils.py:38-47)."""
    a = ring_area(ring)
    for h in holes or []:
        a -= ring_area(h)
    return a


def points_in_polygon_with_holes(px: np.ndarray, py: np.ndarray,
                                 ring: np.ndarray,
                                 holes: list[np.ndarray] | None) -> np.ndarray:
    """Hole-aware PIP: inside the exterior AND strictly outside every
    interior ring (a point ON a hole boundary counts as inside the
    polygon — shapely covers semantics, consistent with the
    boundary-inclusive exterior rule of :func:`points_in_ring`)."""
    inside = points_in_ring(px, py, ring)
    for h in holes or []:
        if not inside.any():
            break
        in_hole = points_in_ring(px, py, h)
        pxb = np.asarray(px, np.float64)[None, :]
        pyb = np.asarray(py, np.float64)[None, :]
        x1, y1 = h[:, 0], h[:, 1]
        x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
        on_b = _points_on_edges(pxb, pyb, x1[:, None], y1[:, None],
                                x2[:, None], y2[:, None])
        inside &= ~(in_hole & ~on_b)
    return inside


def signed_ring_area(ring: np.ndarray) -> float:
    # np.sum, not BLAS dot — see ring_area (alignment-stable rounding)
    x, y = ring[:, 0], ring[:, 1]
    return float(np.sum(x * np.roll(y, -1)) - np.sum(y * np.roll(x, -1))) / 2.0


def ring_centroid(ring: np.ndarray) -> tuple[float, float]:
    """Area-weighted centroid (reference: shapely ``.centroid``,
    batch_sam.py:413, get_polygons.py:776). Falls back to the vertex
    mean for degenerate (zero-area) rings."""
    x, y = ring[:, 0], ring[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    cross = x * yn - xn * y
    a = cross.sum() / 2.0
    if abs(a) < 1e-12:
        return float(x.mean()), float(y.mean())
    cx = ((x + xn) * cross).sum() / (6.0 * a)
    cy = ((y + yn) * cross).sum() / (6.0 * a)
    return float(cx), float(cy)


def ring_bbox(ring: np.ndarray) -> tuple[float, float, float, float]:
    """(minx, miny, maxx, maxy) — reference: shapely ``.bounds``
    (batch_sam.py:565)."""
    return (
        float(ring[:, 0].min()),
        float(ring[:, 1].min()),
        float(ring[:, 0].max()),
        float(ring[:, 1].max()),
    )


def ring_perimeter(ring: np.ndarray) -> float:
    """Reference: shapely ``.length`` (delineation_utils.py:169,241)."""
    d = np.diff(np.vstack([ring, ring[:1]]), axis=0)
    return float(np.hypot(d[:, 0], d[:, 1]).sum())


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized ray-casting point-in-polygon over arrays of points.

    Boundary points count as inside (matches shapely ``contains`` being
    used by the reference for crown assignment where stems sit well
    inside crowns; we make the edge rule explicit and deterministic).
    Reference semantics: ``sjoin(..., predicate='contains')``
    (delineation_utils.py:437) and ``polygon.contains(point)``
    (tree_health_detection/utils.py:310-339).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    x1, y1 = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    # (n_edges, n_points) broadcast
    pyb = py[None, :]
    pxb = px[None, :]
    y1b, y2b = y1[:, None], y2[:, None]
    x1b, x2b = x1[:, None], x2[:, None]
    cond = (y1b <= pyb) != (y2b <= pyb)
    denom = y2b - y1b
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1b + (pyb - y1b) * (x2b - x1b) / np.where(denom == 0, 1.0, denom)
    crossings = (cond & (pxb < xint)).sum(axis=0)
    inside = (crossings % 2) == 1
    # boundary: point exactly on an edge segment → inside
    on_edge = _points_on_edges(pxb, pyb, x1b, y1b, x2b, y2b)
    return inside | on_edge


def _points_on_edges(pxb, pyb, x1b, y1b, x2b, y2b, eps: float = 1e-9) -> np.ndarray:
    cross = (x2b - x1b) * (pyb - y1b) - (y2b - y1b) * (pxb - x1b)
    collinear = np.abs(cross) <= eps * (
        np.abs(x2b - x1b) + np.abs(y2b - y1b) + 1.0
    )
    within = (
        (pxb >= np.minimum(x1b, x2b) - eps)
        & (pxb <= np.maximum(x1b, x2b) + eps)
        & (pyb >= np.minimum(y1b, y2b) - eps)
        & (pyb <= np.maximum(y1b, y2b) + eps)
    )
    return (collinear & within).any(axis=0)


def pack_ring_edges(rings: list[np.ndarray]):
    """Flatten a list of rings into edge-parallel arrays for the
    pair-vectorized PIP below: returns ``(x1, y1, x2, y2, lens,
    starts)`` where edges ``starts[r] : starts[r] + lens[r]`` belong to
    ring ``r`` (one edge per vertex; the closing edge wraps to the
    ring's first vertex). Built once per partition group, probed for
    every candidate (point, ring) pair."""
    if not rings:
        z = np.empty(0, np.float64)
        iz = np.empty(0, np.int64)
        return z, z, z, z, iz, iz
    lens = np.array([len(r) for r in rings], dtype=np.int64)
    vx = np.concatenate([r[:, 0] for r in rings]).astype(np.float64)
    vy = np.concatenate([r[:, 1] for r in rings]).astype(np.float64)
    ends = np.cumsum(lens)
    starts = ends - lens
    nxt = np.arange(len(vx)) + 1
    nxt[ends - 1] = starts
    return vx, vy, vx[nxt], vy[nxt], lens, starts


def points_in_rings_pairs(px: np.ndarray, py: np.ndarray,
                          ring_ids: np.ndarray, edge_pack) -> np.ndarray:
    """PIP for a LIST OF (point, ring) PAIRS in one shot — the
    vectorized replacement for calling :func:`points_in_ring` once per
    ring inside per-partition join kernels (that loop's per-call numpy
    overhead, ~1 ms × 10^4 rings per group, dominated the crown-assign
    stage). Pair ``i`` tests point ``(px[i], py[i])`` against ring
    ``ring_ids[i]`` of ``edge_pack`` (from :func:`pack_ring_edges`).

    Exactly the same ray-casting + on-edge arithmetic as
    :func:`points_in_ring` (element-for-element identical formulas), so
    results are bit-equal. Layout: pairs are COHORTED BY RING LENGTH
    and each cohort loops over edge SLOTS (L small vectorized passes
    over per-pair arrays) instead of materializing the full
    pairs×edges explosion — same ``sum(len(ring) per pair)`` edge
    tests, but ~O(pairs) peak memory and no giant int64 index/repeat
    temporaries (which made dense-cluster groups memory-bandwidth
    bound at 10^7 pairs)."""
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    ring_ids = np.asarray(ring_ids, np.int64)
    x1, y1, x2, y2, lens, starts = edge_pack
    n = len(px)
    if n == 0:
        return np.zeros(0, dtype=bool)
    if n < 32_768:
        # small groups (the long tail — most cells): one-shot edge
        # explosion; ~15 numpy calls total vs the cohort layout's
        # L×cohorts small calls (which cost more than the work here)
        return _pairs_pip_exploded(px, py, ring_ids, edge_pack)
    return _pairs_pip_cohort(px, py, ring_ids, edge_pack)


def _pairs_pip_cohort(px: np.ndarray, py: np.ndarray,
                      ring_ids: np.ndarray, edge_pack) -> np.ndarray:
    """Large-input PIP layout: pairs cohorted by ring length, L small
    vectorized passes per cohort (~O(pairs) peak memory). Same
    per-(pair, edge) formulas as :func:`_pairs_pip_exploded` →
    bit-equal results (tested directly in test_geom_properties)."""
    x1, y1, x2, y2, lens, starts = edge_pack
    n = len(px)
    eps = 1e-9
    out = np.zeros(n, dtype=bool)
    pls = lens[ring_ids]
    for L in np.unique(pls):
        sel = np.flatnonzero(pls == L)
        base = starts[ring_ids[sel]]
        PX, PY = px[sel], py[sel]
        crossings = np.zeros(len(sel), np.int64)
        on_edge = np.zeros(len(sel), dtype=bool)
        for e in range(int(L)):
            ei = base + e
            Y1, Y2 = y1[ei], y2[ei]
            # cheap y-tests first — most (pair, edge) rows fail both,
            # so the x/cross arithmetic runs on small survivor sets
            lo1 = Y1 <= PY
            # crossing test only on edges straddling the point's y
            # level (cond excludes horizontal edges, so no 0-denom)
            cand = np.flatnonzero(lo1 != (Y2 <= PY))
            # on-edge candidates by the edge's y eps-band
            near = np.flatnonzero(
                (PY >= np.minimum(Y1, Y2) - eps)
                & (PY <= np.maximum(Y1, Y2) + eps)
            )
            if len(cand):
                e1 = ei[cand]
                X1c, X2c = x1[e1], x2[e1]
                xint = X1c + (PY[cand] - Y1[cand]) * (
                    X2c - X1c) / (Y2[cand] - Y1[cand])
                crossings[cand[PX[cand] < xint]] += 1
            if len(near):
                e2 = ei[near]
                X1n, X2n = x1[e2], x2[e2]
                PXn = PX[near]
                inb = np.flatnonzero(
                    (PXn >= np.minimum(X1n, X2n) - eps)
                    & (PXn <= np.maximum(X1n, X2n) + eps)
                )
                if len(inb):
                    nb = near[inb]
                    dx = X2n[inb] - X1n[inb]
                    dy = Y2[nb] - Y1[nb]
                    cross = dx * (PY[nb] - Y1[nb]) - dy * (PX[nb] - X1n[inb])
                    collinear = np.abs(cross) <= eps * (
                        np.abs(dx) + np.abs(dy) + 1.0)
                    on_edge[nb[collinear]] = True
        out[sel] = ((crossings % 2) == 1) | on_edge
    return out


def _pairs_pip_exploded(px: np.ndarray, py: np.ndarray,
                        ring_ids: np.ndarray, edge_pack) -> np.ndarray:
    """Small-input PIP layout: materialize the pairs×edges explosion
    and reduce with bincount (identical per-(pair, edge) formulas as
    the cohort path → bit-equal results)."""
    x1, y1, x2, y2, lens, starts = edge_pack
    n = len(px)
    ecnt = lens[ring_ids]
    total = int(ecnt.sum())
    pair_of_edge = np.repeat(np.arange(n), ecnt)
    off = np.arange(total) - np.repeat(np.cumsum(ecnt) - ecnt, ecnt)
    eidx = np.repeat(starts[ring_ids], ecnt) + off
    X1, Y1, X2, Y2 = x1[eidx], y1[eidx], x2[eidx], y2[eidx]
    PX, PY = px[pair_of_edge], py[pair_of_edge]
    # crossing test only on the ~2-per-ring edges straddling the
    # point's y level (cond excludes horizontal edges, so no 0-denom)
    cand = np.flatnonzero((Y1 <= PY) != (Y2 <= PY))
    cX1, cY1 = X1[cand], Y1[cand]
    cPY = PY[cand]
    xint = cX1 + (cPY - cY1) * (X2[cand] - cX1) / (Y2[cand] - cY1)
    crossings = np.bincount(
        pair_of_edge[cand[PX[cand] < xint]], minlength=n
    )
    inside = (crossings % 2) == 1
    eps = 1e-9
    # on-edge test only where the point sits in the edge's eps-bbox
    near = np.flatnonzero(
        (PX >= np.minimum(X1, X2) - eps)
        & (PX <= np.maximum(X1, X2) + eps)
        & (PY >= np.minimum(Y1, Y2) - eps)
        & (PY <= np.maximum(Y1, Y2) + eps)
    )
    dx, dy = X2[near] - X1[near], Y2[near] - Y1[near]
    cross = dx * (PY[near] - Y1[near]) - dy * (PX[near] - X1[near])
    collinear = np.abs(cross) <= eps * (np.abs(dx) + np.abs(dy) + 1.0)
    on_edge = np.bincount(pair_of_edge[near[collinear]], minlength=n) > 0
    return inside | on_edge


def points_in_rings_any(
    px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]
) -> np.ndarray:
    """True for each point contained by at least one ring."""
    out = np.zeros(len(px), dtype=bool)
    for ring in rings:
        rem = ~out
        if not rem.any():
            break
        out[rem] = points_in_ring(px[rem], py[rem], ring)
    return out


def clip_ring_to_bbox(
    ring: np.ndarray, minx: float, miny: float, maxx: float, maxy: float
) -> np.ndarray | None:
    """Sutherland–Hodgman clip of a ring to an axis-aligned box.

    Reference semantics: ``gpd.clip(itcs, batch_bounds)`` and raster
    window clipping (get_polygons.py:625-630, store_data_structures.py:15-39).
    Returns the clipped ring or None when the intersection is empty.
    """
    poly = ring
    for edge in range(4):
        if len(poly) == 0:
            return None
        out: list[np.ndarray] = []
        prev = poly[-1]
        prev_in = _inside_bbox_edge(prev, edge, minx, miny, maxx, maxy)
        for cur in poly:
            cur_in = _inside_bbox_edge(cur, edge, minx, miny, maxx, maxy)
            if cur_in:
                if not prev_in:
                    out.append(
                        _bbox_edge_intersect(prev, cur, edge, minx, miny, maxx, maxy)
                    )
                out.append(cur)
            elif prev_in:
                out.append(
                    _bbox_edge_intersect(prev, cur, edge, minx, miny, maxx, maxy)
                )
            prev, prev_in = cur, cur_in
        poly = np.array(out) if out else np.empty((0, 2))
    if len(poly) < 3:
        return None
    return poly


def _inside_bbox_edge(p, edge, minx, miny, maxx, maxy) -> bool:
    if edge == 0:
        return p[0] >= minx
    if edge == 1:
        return p[0] <= maxx
    if edge == 2:
        return p[1] >= miny
    return p[1] <= maxy


def _bbox_edge_intersect(p, q, edge, minx, miny, maxx, maxy) -> np.ndarray:
    if edge == 0 or edge == 1:
        xb = minx if edge == 0 else maxx
        t = (xb - p[0]) / (q[0] - p[0])
        return np.array([xb, p[1] + t * (q[1] - p[1])])
    yb = miny if edge == 2 else maxy
    t = (yb - p[1]) / (q[1] - p[1])
    return np.array([p[0] + t * (q[0] - p[0]), yb])


def convex_clip(subject: np.ndarray, clipper: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip ``subject`` by CONVEX ``clipper``
    (both CCW). Returns possibly-empty ring."""
    cx, cy = clipper[:, 0], clipper[:, 1]
    nxt = np.roll(np.arange(len(clipper)), -1)
    poly = subject
    for i in range(len(clipper)):
        if len(poly) == 0:
            return np.empty((0, 2))
        ax, ay = cx[i], cy[i]
        bx, by = cx[nxt[i]], cy[nxt[i]]
        ex, ey = bx - ax, by - ay
        side = ex * (poly[:, 1] - ay) - ey * (poly[:, 0] - ax)
        inside = side >= -1e-12
        out: list = []
        n = len(poly)
        for j in range(n):
            k = (j + 1) % n
            if inside[j]:
                out.append(poly[j])
                if not inside[k]:
                    out.append(_seg_line_intersect(poly[j], poly[k], ax, ay, ex, ey))
            elif inside[k]:
                out.append(_seg_line_intersect(poly[j], poly[k], ax, ay, ex, ey))
        poly = np.array(out) if out else np.empty((0, 2))
    return poly


def _seg_line_intersect(p, q, ax, ay, ex, ey) -> np.ndarray:
    dx, dy = q[0] - p[0], q[1] - p[1]
    denom = ex * dy - ey * dx
    if abs(denom) < 1e-300:
        return p
    t = (ex * (p[1] - ay) - ey * (p[0] - ax)) / -denom
    return np.array([p[0] + t * dx, p[1] + t * dy])


def _ensure_ccw(ring: np.ndarray) -> np.ndarray:
    return ring if signed_ring_area(ring) >= 0 else ring[::-1]


def _fan_triangles(ring: np.ndarray) -> np.ndarray:
    """Fan-triangulate a ring about its vertex mean. Returns (n, 3, 2).
    With SIGNED accumulation (each triangle weighted by the sign of its
    own orientation) the fan from ANY origin is an exact signed cover
    of the polygon — χ_ring(x) = Σᵢ signᵢ·χ_triᵢ(x) a.e. — so
    downstream sums are exact for arbitrary simple rings, star-shaped
    or not."""
    c = ring.mean(axis=0)
    n = len(ring)
    tris = np.empty((n, 3, 2))
    tris[:, 0] = c
    tris[:, 1] = ring
    tris[:, 2] = np.roll(ring, -1, axis=0)
    return tris


def intersection_area_star(a: np.ndarray, b: np.ndarray) -> float:
    """Exact area of intersection of two SIMPLE rings via signed
    pairwise triangle clipping (reference: ``intersection(...).area``,
    batch_sam.py:150-151, delineation_utils.py:38-47): with each
    polygon written as a signed fan cover (see :func:`_fan_triangles`),
    area(A∩B) = Σᵢⱼ signᵢ·signⱼ·|triᵢ ∩ triⱼ|. Reflex wedges enter
    with negative sign instead of being flipped positive, so the sum
    is exact for arbitrary simple rings — not just rings star-shaped
    about their vertex mean. (The name keeps the star suffix for API
    stability.)

    Fast path: when both rings are convex, one Sutherland–Hodgman clip.
    """
    if not bbox_intersects(*ring_bbox(a), *ring_bbox(b)):
        return 0.0
    if _is_axis_rect(a) and _is_axis_rect(b):
        # detector-box fast path: the result is the closed-form IEEE
        # product max(0,Δx)·max(0,Δy) — structurally exact (no clip
        # vertex rounding), which the box-NMS SQL oracles rely on
        return float(bbox_intersection_area(*ring_bbox(a), *ring_bbox(b)))
    a = _ensure_ccw(a)
    b = _ensure_ccw(b)
    if _is_convex(a) and _is_convex(b):
        clipped = convex_clip(a, b)
        return ring_area(clipped) if len(clipped) >= 3 else 0.0
    ta = _fan_triangles(a)
    tb = _fan_triangles(b)
    total = 0.0
    tb_ccw, tb_sign, tb_boxes = [], [], []
    for t in tb:
        s = signed_ring_area(t)
        if s == 0.0:
            continue
        tb_ccw.append(t if s > 0 else t[::-1])
        tb_sign.append(1.0 if s > 0 else -1.0)
        tb_boxes.append((t[:, 0].min(), t[:, 1].min(),
                         t[:, 0].max(), t[:, 1].max()))
    for tri_a in ta:
        sa = signed_ring_area(tri_a)
        if sa == 0.0:
            continue
        sign_a = 1.0 if sa > 0 else -1.0
        tri_a_ccw = tri_a if sa > 0 else tri_a[::-1]
        abox = (
            tri_a[:, 0].min(),
            tri_a[:, 1].min(),
            tri_a[:, 0].max(),
            tri_a[:, 1].max(),
        )
        for tri_b, sign_b, bbox_b in zip(tb_ccw, tb_sign, tb_boxes):
            if not bbox_intersects(*abox, *bbox_b):
                continue
            clipped = convex_clip(tri_a_ccw, tri_b)
            if len(clipped) >= 3:
                total += sign_a * sign_b * ring_area(clipped)
    return max(total, 0.0)


def _is_axis_rect(ring: np.ndarray) -> bool:
    """True iff the ring is a 4-vertex axis-aligned rectangle (every
    edge parallel to an axis) — the shape every detector box has."""
    if len(ring) != 4:
        return False
    d = np.roll(ring, -1, axis=0) - ring
    return bool(((d[:, 0] == 0.0) | (d[:, 1] == 0.0)).all()
                and (ring[:, 0].min() != ring[:, 0].max())
                and (ring[:, 1].min() != ring[:, 1].max()))


def _is_convex(ring: np.ndarray) -> bool:
    d = np.diff(np.vstack([ring, ring[:2]]), axis=0)
    cross = d[:-1, 0] * d[1:, 1] - d[:-1, 1] * d[1:, 0]
    return bool((cross >= -1e-9).all() or (cross <= 1e-9).all())


def intersection_area_with_holes(a: np.ndarray,
                                 ha: list[np.ndarray] | None,
                                 b: np.ndarray,
                                 hb: list[np.ndarray] | None) -> float:
    """Exact area of (a − ∪ha) ∩ (b − ∪hb) for polygons with interior
    rings, by inclusion–exclusion over the hole rings:

        I = I(a,b) − Σᵢ I(haᵢ,b) − Σⱼ I(hbⱼ,a) + Σᵢⱼ I(haᵢ,hbⱼ)

    Valid under OGC polygon validity — each polygon's holes are
    pairwise disjoint and contained in its exterior, which collapses
    haᵢ∩a∩b to haᵢ∩b (and symmetrically). Each term is
    :func:`intersection_area_star`, so the whole expression is exact
    for arbitrary simple rings, and closed-form (integer-exact) when
    every ring is an axis-aligned rectangle — the property the
    synth_holed_nms DuckDB oracle relies on. Hole-free inputs cost one
    extra truthiness check over plain intersection_area_star.

    Reference parity: shapely ``intersection(...).area`` on holed
    polygons (the reference's ``difference`` outputs,
    tree_delineation/delineation_utils.py:38-47, feed its overlap
    checks at batch_sam.py:150-151)."""
    total = intersection_area_star(a, b)
    if total <= 0.0:
        return 0.0
    for h in ha or ():
        total -= intersection_area_star(h, b)
    for h in hb or ():
        total -= intersection_area_star(h, a)
    if ha and hb:
        for i in ha:
            for j in hb:
                total += intersection_area_star(i, j)
    return max(total, 0.0)


def iou_star(a: np.ndarray, b: np.ndarray) -> float:
    """IoU = |a∩b| / |a∪b| (reference ``calculate_overlap``,
    batch_sam.py:150-151)."""
    inter = intersection_area_star(a, b)
    if inter == 0.0:
        return 0.0
    area_a = ring_area(a)
    area_b = ring_area(b)
    # Triangulated clipping can overshoot by ~1e-9 relative; the true
    # intersection is bounded by min(area_a, area_b).
    inter = min(inter, area_a, area_b)
    union = area_a + area_b - inter
    return inter / union if union > 0 else 0.0


def overlap_of_max_area(a: np.ndarray, b: np.ndarray) -> float:
    """intersection / max(area_a, area_b) — the reference NMS criterion
    (get_polygons.py:810-816 suppresses when > 0.3)."""
    inter = intersection_area_star(a, b)
    if inter == 0.0:
        return 0.0
    area_a = ring_area(a)
    area_b = ring_area(b)
    inter = min(inter, area_a, area_b)
    return inter / max(area_a, area_b)


def simplify_ring(ring: np.ndarray, tolerance: float) -> np.ndarray:
    """Douglas–Peucker simplification (reference ``simplify(0.1)``,
    delineation_pipeline.py:169). Keeps at least a triangle."""
    closed = np.vstack([ring, ring[:1]])
    keep = _dp_mask(closed, tolerance)
    out = closed[keep][:-1]
    if len(out) < 3:
        return ring
    return out


def _dp_mask(pts: np.ndarray, tol: float) -> np.ndarray:
    n = len(pts)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = pts[i + 1 : j]
        a, b = pts[i], pts[j]
        ab = b - a
        denom = np.hypot(*ab)
        if denom < 1e-300:
            d = np.hypot(seg[:, 0] - a[0], seg[:, 1] - a[1])
        else:
            d = np.abs(ab[0] * (seg[:, 1] - a[1]) - ab[1] * (seg[:, 0] - a[0])) / denom
        k = int(np.argmax(d))
        if d[k] > tol:
            keep[i + 1 + k] = True
            stack.append((i, i + 1 + k))
            stack.append((i + 1 + k, j))
    return keep


def point_ring_distance(px: float, py: float, ring: np.ndarray) -> float:
    """Distance from a point to a ring boundary (0 if on it); used with
    containment for nearest-polygon picks (get_polygons.py:764-776)."""
    a = ring
    b = np.roll(ring, -1, axis=0)
    ab = b - a
    ap = np.array([px, py]) - a
    denom = (ab * ab).sum(axis=1)
    t = np.clip(
        np.where(denom > 0, (ap * ab).sum(axis=1) / np.where(denom == 0, 1, denom), 0),
        0,
        1,
    )
    proj = a + t[:, None] * ab
    d = np.hypot(px - proj[:, 0], py - proj[:, 1])
    return float(d.min())


def raster_mask(ring: np.ndarray, wx: np.ndarray, wy: np.ndarray) -> np.ndarray:
    """Scanline polygon rasterization: boolean mask of shape
    (len(wy), len(wx)) — True where the pixel CENTER (wx[j], wy[i])
    is inside the ring. Same semantics as points_in_ring evaluated on
    the grid (rasterio.mask default all_touched=False — reference
    store_data_structures.py:15-39) but O(edges×rows + pixels) instead
    of O(edges×pixels): per scanline, edge crossings are computed once
    and each pixel does one searchsorted lookup."""
    x1, y1 = ring[:, 0], ring[:, 1]
    return _raster_mask_edges(x1, y1, np.roll(x1, -1), np.roll(y1, -1),
                              wx, wy)


def raster_mask_loops(loops: list[np.ndarray], wx: np.ndarray,
                      wy: np.ndarray) -> np.ndarray:
    """Hole-aware rasterization: crossing parity over ALL loops of a
    polygon (exterior + interior rings). A pixel center inside a hole
    crosses the exterior once and the hole once → even parity →
    outside; rasterio.mask semantics for holed geometries (reference
    produces them via shapely ``difference``,
    tree_delineation/delineation_utils.py:38-47). For a single loop
    this is BIT-IDENTICAL to :func:`raster_mask` (same edge arrays,
    same arithmetic)."""
    x1 = np.concatenate([lp[:, 0] for lp in loops])
    y1 = np.concatenate([lp[:, 1] for lp in loops])
    x2 = np.concatenate([np.roll(lp[:, 0], -1) for lp in loops])
    y2 = np.concatenate([np.roll(lp[:, 1], -1) for lp in loops])
    return _raster_mask_edges(x1, y1, x2, y2, wx, wy)


def _raster_mask_edges(x1: np.ndarray, y1: np.ndarray, x2: np.ndarray,
                       y2: np.ndarray, wx: np.ndarray,
                       wy: np.ndarray) -> np.ndarray:
    h, w = len(wy), len(wx)
    # (E, R): which edges straddle each scanline — a straddling edge is
    # never horizontal, so the crossing-x division below is always safe
    yr = wy[None, :]
    cond = (y1[:, None] <= yr) != (y2[:, None] <= yr)
    eidx, ridx = np.nonzero(cond)
    if len(eidx) == 0:
        return np.zeros((h, w), dtype=bool)
    xs = x1[eidx] + (wy[ridx] - y1[eidx]) * (x2 - x1)[eidx] / (y2 - y1)[eidx]
    # Parity via a crossing difference array: each crossing flips every
    # pixel strictly to its right (center wx[j] > xs — same tie rule as
    # a strict "crossings left of center" count), so bump a per-row
    # counter at the first flipped column and cumsum along the row.
    # O(C log w + h·w) with a cumsum constant, vs the former per-pixel
    # searchsorted over all C crossings (C ≈ 2 per scanline).
    cols = np.searchsorted(wx, xs, side="right")
    flips = np.zeros((h, w + 1), dtype=np.int8)
    np.add.at(flips, (ridx, cols), 1)
    cnt = np.cumsum(flips[:, :w], axis=1, dtype=np.int8)
    return (cnt & 1).astype(bool)


def bbox_intersects(
    aminx, aminy, amaxx, amaxy, bminx, bminy, bmaxx, bmaxy
) -> bool:
    return not (amaxx < bminx or bmaxx < aminx or amaxy < bminy or bmaxy < aminy)


def bbox_intersection_area(aminx, aminy, amaxx, amaxy, bminx, bminy, bmaxx, bmaxy):
    """Vectorized bbox∩bbox area (arrays broadcast)."""
    w = np.minimum(amaxx, bmaxx) - np.maximum(aminx, bminx)
    h = np.minimum(amaxy, bmaxy) - np.maximum(aminy, bminy)
    return np.where((w > 0) & (h > 0), w * h, 0.0)


def make_star_ring(
    cx: float,
    cy: float,
    mean_radius: float,
    n_vertices: int,
    seed: int,
    jitter: float = 0.35,
) -> np.ndarray:
    """Deterministic star-convex ring generator (synthetic crowns,
    FIXTURES.md §3). Radii are seeded per-ring so any process
    regenerates the identical polygon from (seed, id)."""
    rng = np.random.default_rng(seed)
    ang = np.linspace(0, 2 * np.pi, n_vertices, endpoint=False)
    radii = mean_radius * (1.0 + jitter * (rng.random(n_vertices) * 2 - 1))
    return np.column_stack([cx + radii * np.cos(ang), cy + radii * np.sin(ang)])


def convex_hull(xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Convex hull via Andrew's monotone chain, O(n log n): returns
    the INDICES of hull vertices in counter-clockwise order starting
    at the lexicographically smallest point. Strict turns — collinear
    points interior to an edge are excluded — so the vertex set is
    canonical and deterministic for any input order. (The reference
    leans on shapely for every hull-adjacent need; this is the
    from-scratch equivalent for per-group footprints.)"""
    n = len(xs)
    if n == 0:
        return np.array([], np.int64)
    order = np.lexsort((ys, xs))
    if n <= 2:
        return order.astype(np.int64)
    x, y = xs[order], ys[order]

    def chain(idx_range):
        out = []
        for i in idx_range:
            while len(out) >= 2:
                ax, ay = x[out[-2]], y[out[-2]]
                bx, by = x[out[-1]], y[out[-1]]
                if (bx - ax) * (y[i] - ay) - (by - ay) * (x[i] - ax) <= 0:
                    out.pop()
                else:
                    break
            out.append(i)
        return out

    lower = chain(range(n))
    upper = chain(range(n - 1, -1, -1))
    hull_sorted = lower[:-1] + upper[:-1]
    if len(hull_sorted) == 0:  # all points coincide
        hull_sorted = [0]
    return order[np.array(hull_sorted, np.int64)]


# ---------------------------------------------------------------------------
# Vector-exact polygon difference (Greiner–Hormann)
# ---------------------------------------------------------------------------

def _proper_crossings(a: np.ndarray, b: np.ndarray, teps: float = 1e-12):
    """All proper interior crossings between edges of rings a and b.
    Vectorized all-pairs segment intersection. Returns
    (edge_a, t, edge_b, u) arrays sorted by (edge_a, t), plus a
    degeneracy flag (a crossing at/near an endpoint, or collinear
    overlapping edges — general position violated)."""
    a0, a1 = a, np.roll(a, -1, axis=0)
    b0, b1 = b, np.roll(b, -1, axis=0)
    d1 = a1 - a0                                    # (n, 2)
    d2 = b1 - b0                                    # (m, 2)
    denom = d1[:, None, 0] * d2[None, :, 1] - d1[:, None, 1] * d2[None, :, 0]
    r = b0[None, :, :] - a0[:, None, :]             # (n, m, 2)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (r[..., 0] * d2[None, :, 1] - r[..., 1] * d2[None, :, 0]) / denom
        u = (r[..., 0] * d1[:, None, 1] - r[..., 1] * d1[:, None, 0]) / denom
    nonpar = np.abs(denom) > teps
    on_seg = nonpar & (t > -teps) & (t < 1 + teps) & (u > -teps) & (u < 1 + teps)
    near_end = on_seg & (
        (np.abs(t) < teps) | (np.abs(t - 1) < teps)
        | (np.abs(u) < teps) | (np.abs(u - 1) < teps)
    )
    proper = on_seg & ~near_end
    # collinear overlap: parallel edges whose supporting lines coincide
    # and whose spans overlap — conservative flag via endpoint-on-edge
    degenerate = bool(near_end.any())
    ia, ib = np.nonzero(proper)
    ts, us = t[ia, ib], u[ia, ib]
    order = np.lexsort((ts, ia))
    return ia[order], ts[order], ib[order], us[order], degenerate


def _augmented(ring: np.ndarray, edge_idx: np.ndarray, alphas: np.ndarray,
               inter_ids: np.ndarray):
    """Ring vertices with intersection points spliced into their edges
    (sorted by alpha along each edge). Returns (pts (k,2), ids (k,)
    int64 with -1 for original vertices)."""
    pts, ids = [], []
    n = len(ring)
    for v in range(n):
        pts.append(ring[v]); ids.append(-1)
        sel = edge_idx == v
        if sel.any():
            a = alphas[sel]
            iid = inter_ids[sel]
            o = np.argsort(a, kind="stable")
            p0, p1 = ring[v], ring[(v + 1) % n]
            for j in o:
                pts.append(p0 + a[j] * (p1 - p0)); ids.append(int(iid[j]))
    return np.asarray(pts), np.asarray(ids, np.int64)


def _keyhole(outer: np.ndarray, inner: np.ndarray) -> np.ndarray:
    """Polygon-with-hole → single simple-ish ring via a zero-width
    bridge between the closest (outer vertex, inner vertex) pair. The
    bridge is traversed once each way, so the shoelace area is EXACTLY
    area(outer) − area(inner). outer CCW, inner becomes CW."""
    outer = _ensure_ccw(outer)
    inner = _ensure_ccw(inner)[::-1]  # CW = hole orientation
    d2 = ((outer[:, None, :] - inner[None, :, :]) ** 2).sum(-1)
    i, j = np.unravel_index(np.argmin(d2), d2.shape)
    hole = np.roll(inner, -j, axis=0)
    return np.vstack([
        outer[: i + 1], hole, hole[:1], outer[i:],
    ])


def difference_rings(subject: np.ndarray, clip: np.ndarray,
                     _retry: int = 2) -> list:
    """Exact vector difference ``subject \\ clip`` of two SIMPLE rings
    — Greiner–Hormann traversal (subject forward / clip backward), the
    reference's ``shapely`` ``polygon.difference(other)`` semantics
    (batch_sam.py:267-324, delineation_utils.py:38-47) without the
    raster round-trip. Returns a list of CCW rings (possibly several —
    a clip that bisects the subject yields one ring per piece; a clip
    strictly inside yields a keyhole ring whose shoelace area equals
    area(subject) − area(clip) exactly).

    General-position: a crossing landing exactly on a vertex (shared
    vertices, collinear overlapping edges) is resolved by retrying with
    the clip nudged by ~1e-9 of its bbox span — area error is O(eps ·
    perimeter), far below the reference's raster quantization."""
    s = _ensure_ccw(np.asarray(subject, np.float64))
    c = _ensure_ccw(np.asarray(clip, np.float64))
    ia, ts, ib, us, degenerate = _proper_crossings(s, c)
    if degenerate and _retry > 0:
        span = max(float(np.ptp(c[:, 0])), float(np.ptp(c[:, 1])), 1.0)
        nudge = span * 1e-9 * np.array([1.0, 1.0])
        return difference_rings(s, c + nudge, _retry=_retry - 1)

    if len(ia) == 0:
        s_in_c = bool(points_in_ring(s[:1, 0], s[:1, 1], c)[0])
        c_in_s = bool(points_in_ring(c[:1, 0], c[:1, 1], s)[0])
        if s_in_c:
            return []                     # fully covered
        if c_in_s:
            return [_keyhole(s, c)]       # hole → bridge-cut ring
        return [s.copy()]                 # disjoint

    ids = np.arange(len(ia), dtype=np.int64)
    s_pts, s_ids = _augmented(s, ia, ts, ids)
    oc = np.argsort(ib, kind="stable")
    c_pts, c_ids = _augmented(c, ib[oc], us[oc], ids[oc])
    s_pos = {int(k): int(p) for p, k in enumerate(s_ids) if k >= 0}
    c_pos = {int(k): int(p) for p, k in enumerate(c_ids) if k >= 0}

    # per-segment membership flags, one vectorized PIP call per side:
    # subject's augmented segments vs clip, clip's vs subject. Every
    # traversal decision reads these flags — no flip-propagation, so a
    # single noisy midpoint can't corrupt the whole walk.
    s_mid = (s_pts + np.roll(s_pts, -1, axis=0)) / 2.0
    s_seg_in = points_in_ring(s_mid[:, 0], s_mid[:, 1], c)
    c_mid = (c_pts + np.roll(c_pts, -1, axis=0)) / 2.0
    c_seg_in = points_in_ring(c_mid[:, 0], c_mid[:, 1], s)

    # boundary arcs of A\B on the subject are ALWAYS traversed in A's
    # own (CCW) direction; they start at crossings whose outgoing
    # subject segment is outside B
    starts = [int(s_ids[p]) for p in range(len(s_pts))
              if s_ids[p] >= 0 and not s_seg_in[p]]
    if not starts:
        return [s.copy()]

    out, visited = [], set()
    for start in sorted(starts):
        if start in visited:
            continue
        ring_pts = []
        cur_id = start
        guard = 4 * (len(s_pts) + len(c_pts)) + 8
        while guard:
            guard -= 1
            visited.add(cur_id)
            # subject: walk FORWARD to the next crossing (the arc is
            # outside B by construction of `starts` / the clip hop)
            p = s_pos[cur_id]
            ring_pts.append(s_pts[p])
            p = (p + 1) % len(s_pts)
            while s_ids[p] < 0:
                ring_pts.append(s_pts[p])
                p = (p + 1) % len(s_pts)
            entry = int(s_ids[p])
            if entry == start:
                break
            # clip: walk along whichever adjacent clip arc lies INSIDE
            # the subject (exactly one does at a transversal crossing —
            # the piece of ∂B that bounds A\B). Direction is per-
            # crossing, not a global rule: a clip arc may bound the
            # removed region from either side.
            q = c_pos[entry]
            ring_pts.append(c_pts[q])
            step = 1 if c_seg_in[q] else -1
            q = (q + step) % len(c_pts)
            while c_ids[q] < 0:
                ring_pts.append(c_pts[q])
                q = (q + step) % len(c_pts)
            cur_id = int(c_ids[q])
            if cur_id == start:
                break
        ring = np.asarray(ring_pts)
        if len(ring) >= 3 and ring_area(ring) > 1e-12:
            out.append(_ensure_ccw(ring))
    return out
