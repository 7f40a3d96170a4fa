"""Geometry cleanup / overlap-resolution family (SURVEY.md §2.7).

Reference semantics mirrored:
- ``remove_perc_of_smallest``: sort by area, drop the bottom p% —
  reference delineation_utils.py:276-282. Distributed via an
  approximate global quantile (driver-side sample of the area column)
  then a vectorized filter — no global sort.
- ``remove_smaller_overlapping``: for any pair overlapping more than
  ``min_frac`` of the smaller area, drop the smaller polygon —
  reference delineation_utils.py:293-326. Per-cell kernel with halo,
  deterministic (area desc, id asc) order.
- ``subtract_overlap_from_larger``: for 10–50% shared pairs, subtract
  the intersection from the LARGER polygon — reference
  batch_sam.py:224-259 (remove_shared_region) and :267-324. Polygon
  difference is VECTOR-EXACT (Greiner–Hormann,
  ``geom.difference_rings``) — the same result as the reference's
  shapely ``difference`` on simple rings, with no raster quantization.
- ``explode_multirings``: MultiPolygon → one row per part — reference
  split_multipolygons_to_polygons, delineation_utils.py:93-104.
- degenerate-geometry filter: drop rings with < 3 vertices or ~zero
  area — reference remove_linestring_from_geometrycollection,
  delineation_utils.py:258-272.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .relational import sorted_group_map

from ..functions import cells, geom
from ..stages.spatial import pack_rings, rings_from_binary, scramble_cell
from .nms import (
    DEFAULT_HALO_M,
    _explode_with_halo,
    _group_holes,
    _maybe_pack_holes,
)

__all__ = ["remove_perc_of_smallest", "remove_smaller_overlapping",
           "subtract_overlap_from_larger_kernel", "explode_multirings",
           "drop_degenerate"]


def remove_perc_of_smallest(crowns, pct: float, sample_n: int = 10_000):
    """Drop the smallest ``pct`` percent of crowns by area. The cut
    threshold is an approximate global quantile from a deterministic
    sample — the ``sample_n`` rows with the smallest stable
    crown_id hash, identical at any parallelism and (unlike the old
    first-N-by-id rule) uncorrelated with any id↔area pattern; the
    filter itself is exact against that threshold.

    Scale shape (r5): the sample was previously drawn via
    ``sort('crown_id').limit(n)`` — a full all-to-all sort exchange
    just to pick 10k rows. Now: with a metadata-backed row count, a
    hash-threshold filter keeps ~1.25×sample_n rows in one narrow
    scan (no shuffle, bounded driver collect); otherwise a per-batch
    partial top-k (exact global top-k-by-hash under the driver
    merge — inputs without metadata counts are the small/test
    shapes)."""
    import pyarrow.compute as pc

    try:
        meta_n = crowns._meta_count()
    except Exception:
        meta_n = None

    def hashed(t: pa.Table) -> pa.Table:
        ids = pd.Series(t["crown_id"].to_numpy(zero_copy_only=False))
        h = pd.util.hash_pandas_object(ids, index=False).to_numpy()
        return pa.table({"h": pa.array(h, pa.uint64()), "area": t["area"]})

    narrow = crowns.select_columns(["crown_id", "area"]).map_batches(
        hashed, batch_format="pyarrow")
    if meta_n and meta_n > sample_n:
        cutoff = int((2**64 - 1) * min(1.0, 1.25 * sample_n / meta_n))
        parts = narrow.map_batches(
            lambda t: t.filter(pc.less(t["h"], pa.scalar(cutoff, pa.uint64()))),
            batch_format="pyarrow",
        ).to_pandas()
    else:
        parts = narrow.map_batches(
            lambda df: df.nsmallest(min(sample_n, len(df)), "h"),
            batch_format="pandas",
        ).to_pandas()
    if len(parts) == 0:
        return crowns
    sample = parts.nsmallest(min(sample_n, len(parts)), "h")
    thresh = float(np.quantile(sample["area"].to_numpy(), pct / 100.0))

    def fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t["area"], thresh))

    return crowns.map_batches(fn, batch_format="pyarrow")


def _drop_smaller_kernel(group: pa.Table, min_frac: float) -> pa.Table:
    ids = group["crown_id"].to_numpy(zero_copy_only=False)
    owner = group["owner"].to_numpy(zero_copy_only=False)
    rings = rings_from_binary(group["ring_b"])
    holes = _group_holes(group)
    n = len(ids)
    if holes is None:
        areas = np.array([geom.ring_area(r) for r in rings])
    else:
        areas = np.array([geom.polygon_area_with_holes(r, h)
                          for r, h in zip(rings, holes)])
    bboxes = np.array([geom.ring_bbox(r) for r in rings]) if n else np.empty((0, 4))
    # deterministic order: area desc, id asc; larger polygons "defend"
    order = np.lexsort((ids, -areas))
    dropped = np.zeros(n, dtype=bool)
    for oi in range(n):
        i = order[oi]
        if dropped[i]:
            continue
        for oj in range(oi + 1, n):
            j = order[oj]
            if dropped[j]:
                continue
            if not geom.bbox_intersects(*bboxes[i], *bboxes[j]):
                continue
            if holes is None:
                inter = geom.intersection_area_star(rings[i], rings[j])
            else:
                inter = geom.intersection_area_with_holes(
                    rings[i], holes[i], rings[j], holes[j])
            if inter > min_frac * min(areas[i], areas[j]):
                dropped[j] = True  # j is the smaller (order is area desc)
    keep = owner & ~dropped
    return pa.table(
        {
            "crown_id": pa.array(ids[keep]),
            "kept": pa.array(np.ones(int(keep.sum()), dtype=bool)),
        }
    )


def remove_smaller_overlapping(crowns, min_frac: float = 0.5,
                               res: int = cells.DEFAULT_RES,
                               halo_m: float = DEFAULT_HALO_M):
    """(crown_id, kept) — survivors after dropping the smaller of every
    pair overlapping > min_frac of the smaller area. Hole-aware when
    the input carries a ``holes`` column (same contract as the NMS
    family; VERDICT r4 #2)."""
    cols = ["crown_id", "ring", "cx", "cy", "minx", "miny", "maxx", "maxy"]
    c = _maybe_pack_holes(crowns, cols)
    exploded = c.map_batches(
        _explode_with_halo, batch_format="pyarrow",
        fn_kwargs={"res": res, "halo_m": halo_m},
    )
    return sorted_group_map(
        exploded.map_batches(scramble_cell, batch_format="pyarrow"),
        ["cell"], _drop_smaller_kernel, fn_kwargs={"min_frac": min_frac},
    )


def subtract_overlap_from_larger_kernel(ring_a: np.ndarray, ring_b: np.ndarray,
                                        res_m: float = 0.1,
                                        lo: float = 0.10, hi: float = 0.50
                                        ) -> list[np.ndarray] | None:
    """VECTOR-EXACT difference (Greiner–Hormann,
    :func:`geom.difference_rings`): when the pair shares between lo and
    hi of the smaller area, subtract the intersection from the LARGER
    ring and return the resulting ring(s) — the reference's ``shapely``
    ``larger.difference(smaller)`` (batch_sam.py:267-324) bit-for-bit
    on simple rings, where the previous implementation rasterized at
    ``res_m`` and re-traced. None = no change. A bisecting overlap
    yields several rings (the reference's MultiPolygon case — feed
    through :func:`explode_multirings` semantics); a fully-interior
    overlap yields one keyhole ring with exact shoelace area.

    ``res_m`` is retained for API compatibility; the vector path does
    not quantize. Scalar contract: operates on EXTERIOR rings only —
    interior rings cannot be passed through this signature; holed
    inputs must subtract holes upstream (geom.difference_rings) or go
    through the hole-aware dataset kernels (nms.greedy_nms /
    remove_smaller_overlapping)."""
    a_area = geom.ring_area(ring_a)
    b_area = geom.ring_area(ring_b)
    inter = geom.intersection_area_star(ring_a, ring_b)
    frac = inter / min(a_area, b_area) if min(a_area, b_area) > 0 else 0.0
    if not (lo < frac <= hi):
        return None
    larger, smaller = (ring_a, ring_b) if a_area >= b_area else (ring_b, ring_a)
    pieces = geom.difference_rings(larger, smaller)
    return pieces or None


def explode_multirings(ds, rings_col: str = "rings"):
    """One row per part of a multi-ring row (flat explode)."""

    def fn(t: pa.Table) -> pa.Table:
        col = t[rings_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offsets = col.offsets.to_numpy()
        counts = np.diff(offsets)
        idx = np.repeat(np.arange(len(t)), counts)
        taken = t.drop_columns([rings_col]).take(pa.array(idx))
        return taken.append_column("ring", col.flatten())

    return ds.map_batches(fn, batch_format="pyarrow")


def drop_degenerate(crowns, min_area: float = 1e-9):
    """Filter rings with < 3 vertices or ~zero area (degenerate
    geometries — reference delineation_utils.py:258-272). Hole-aware:
    when a ``holes`` column is present the area test uses the NET
    area (exterior minus interior rings), so a polygon hollowed down
    to ~nothing is dropped like the reference's shapely ``.area``
    would."""
    have_holes = "holes" in (crowns.columns() or [])

    def fn(t: pa.Table) -> pa.Table:
        from ..stages.spatial import rings_from_arrow

        rings = rings_from_arrow(t["ring"])
        if have_holes:
            from ..stages.spatial import _nested_loops_arrays

            n_r, rv, xs, ys, vstart, rstart = _nested_loops_arrays(t["holes"])
            hole_area = np.zeros(len(t))
            ri = 0
            for row in range(len(t)):
                for _ in range(int(n_r[row])):
                    s, m = int(vstart[ri]), int(rv[ri])
                    hole_area[row] += geom.ring_area(
                        np.column_stack([xs[s:s + m], ys[s:s + m]]))
                    ri += 1
            ok = np.array(
                [len(r) >= 3 and geom.ring_area(r) - ha > min_area
                 for r, ha in zip(rings, hole_area)], dtype=bool)
        else:
            ok = np.array(
                [len(r) >= 3 and geom.ring_area(r) > min_area for r in rings],
                dtype=bool,
            )
        return t.filter(pa.array(ok))

    return crowns.map_batches(fn, batch_format="pyarrow")
