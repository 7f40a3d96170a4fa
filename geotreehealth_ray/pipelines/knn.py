"""kNN neighbor search over point tables, cell-partitioned with
neighbor-cell halo replication.

Reference semantics: per target stem, the k nearest other stems by
Euclidean distance (argsort of norms — reference
tree_delineation/get_polygons.py:326-329, full_image_sam.py:65-72), and
the cardinal-bucket variant (nearest neighbor per NE/NW/SE/SW quadrant
with a minimum-distance exclusion floor — reference
batch_sam.py:425-452 + ``remove_too_close`` config.py:34; quadrant
classification ``find_cardinal_direction`` batch_sam.py:195-207).

Physical plan: every point is replicated to its own cell plus the 8
Moore neighbors (halo); ``groupby(cell)`` co-locates each cell's
targets with all candidate neighbors within one cell edge; the per-cell
kernel answers queries only for points OWNED by the cell (ownership =
point's own cell), so output rows are exact and unduplicated.
Correctness requires cell edge ≥ max neighbor distance of interest —
the kernel also returns each answer's k-th distance so callers can
assert `kth_dist <= cell_edge` (guaranteed-exact region).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .relational import sorted_group_map

from ..functions import cells, geom
from ..stages.spatial import scramble_cell

__all__ = ["knn_points", "knn_cardinal", "radius_pairs", "cell_hulls"]


def _halo_explode(batch: pa.Table, res: int, halo_m: float | None = None) -> pa.Table:
    """Replicate each point to its 3×3 cell neighborhood; ``owner`` marks
    the copy living in the point's own cell (query rows).

    ``halo_m`` bounds the replication: a point is copied into a
    neighbor cell only when it lies within ``halo_m`` of the shared
    boundary (a point can only serve queries within halo_m of it).
    None → full-cell halo (exact for kth-distance ≤ cell edge); at
    scale pass the actual search radius so shuffle volume grows by
    ~4·halo/edge instead of 9×."""
    x = batch["x"].to_numpy()
    y = batch["y"].to_numpy()
    edge = cells.cell_edge_m(res)
    if halo_m is None:
        halo_m = edge
    n_axis = 1 << res
    gx = np.clip((x // edge).astype(np.int64), 0, n_axis - 1)
    gy = np.clip((y // edge).astype(np.int64), 0, n_axis - 1)
    # distances to own-cell boundaries
    off_x = x - gx * edge
    off_y = y - gy * edge
    idx_out, cell_out, owner_out = [], [], []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            nx, ny = gx + dx, gy + dy
            ok = (nx >= 0) & (nx < n_axis) & (ny >= 0) & (ny < n_axis)
            if dx == -1:
                ok &= off_x <= halo_m
            elif dx == 1:
                ok &= (edge - off_x) <= halo_m
            if dy == -1:
                ok &= off_y <= halo_m
            elif dy == 1:
                ok &= (edge - off_y) <= halo_m
            w = np.where(ok)[0]
            idx_out.append(w)
            cell_out.append(
                cells._part1by1(nx[w].astype(np.uint64))
                | (cells._part1by1(ny[w].astype(np.uint64)) << np.uint64(1))
                | (np.uint64(res) << np.uint64(60))
            )
            owner_out.append(np.full(len(w), dx == 0 and dy == 0))
    idx = np.concatenate(idx_out)
    taken = batch.take(pa.array(idx))
    if "cell" in taken.column_names:
        taken = taken.drop_columns(["cell"])
    return taken.append_column(
        "cell", pa.array(np.concatenate(cell_out), pa.uint64())
    ).append_column("owner", pa.array(np.concatenate(owner_out), pa.bool_()))


_KNN_CHUNK = 512


def _knn_cell(group: pa.Table, k: int) -> pa.Table:
    """Vectorized per-cell kNN: query chunks × candidate distance
    matrix, stable argsort along axis 1. Candidates are pre-sorted by
    id, so the STABLE sort on distance yields exactly the (dist asc,
    id asc) order the per-query lexsort produced — bit-equal output
    with no per-query Python loop."""
    ids = group["id"].to_numpy(zero_copy_only=False)
    x = group["x"].to_numpy()
    y = group["y"].to_numpy()
    owner = group["owner"].to_numpy(zero_copy_only=False)
    # candidates: all copies in this cell, deduped by id (a point's own
    # copy and a halo copy never coexist for the same cell)
    qi = np.where(owner)[0]
    empty = pa.table(
        {
            "id": pa.array([], pa.string()),
            "neighbor_id": pa.array([], pa.string()),
            "rank": pa.array([], pa.int32()),
            "dist": pa.array([], pa.float64()),
        }
    )
    if len(qi) == 0 or len(ids) <= 1:
        return empty
    order = np.lexsort((ids,))
    x_s, y_s, ids_s = x[order], y[order], ids[order]
    out_q, out_j, out_rank, out_d = [], [], [], []
    for c0 in range(0, len(qi), _KNN_CHUNK):
        q = qi[c0 : c0 + _KNN_CHUNK]
        d = np.hypot(x_s[None, :] - x[q][:, None], y_s[None, :] - y[q][:, None])
        self_mask = ids_s[None, :] == ids[q][:, None]
        d[self_mask] = np.inf
        kk = np.minimum(k, len(ids_s) - self_mask.sum(axis=1))
        srt = np.argsort(d, axis=1, kind="stable")  # (dist, id) order
        take = np.minimum(kk, srt.shape[1])
        maxk = int(take.max()) if len(take) else 0
        for r in range(maxk):
            rows = np.where(take > r)[0]
            out_q.append(q[rows])
            out_j.append(srt[rows, r])
            out_rank.append(np.full(len(rows), r, np.int32))
            out_d.append(d[rows, srt[rows, r]])
    if not out_q:
        return empty
    qv = np.concatenate(out_q)
    jv = np.concatenate(out_j)
    return pa.table(
        {
            "id": pa.array(ids[qv], pa.string()),
            "neighbor_id": pa.array(ids_s[jv], pa.string()),
            "rank": pa.array(np.concatenate(out_rank), pa.int32()),
            "dist": pa.array(np.concatenate(out_d), pa.float64()),
        }
    )


def knn_points(points, k: int = 5, res: int = cells.DEFAULT_RES,
               id_col: str = "stem_id", halo_m: float | None = None):
    """(id, neighbor_id, rank, dist) — k nearest other points per point.

    Exact when the k-th neighbor lies within min(halo_m, cell edge)
    (the halo guarantee); choose ``res``/``halo_m`` so that bound
    covers the search radius. Passing the actual radius as ``halo_m``
    cuts halo replication from 9× to ~(1 + 4·halo/edge)×.
    """
    pts = points.select_columns([id_col, "x", "y"]).map_batches(
        lambda t: t.rename_columns(["id", "x", "y"]), batch_format="pyarrow"
    )
    exploded = pts.map_batches(
        _halo_explode, batch_format="pyarrow",
        fn_kwargs={"res": res, "halo_m": halo_m},
    )
    return sorted_group_map(
        exploded.map_batches(scramble_cell, batch_format="pyarrow"),
        ["cell"], _knn_cell, fn_kwargs={"k": k},
    )


_QUADS = ("NE", "NW", "SE", "SW")


def _cardinal_cell(group: pa.Table, min_dist: float) -> pa.Table:
    """Nearest neighbor per cardinal quadrant with a too-close exclusion
    floor (reference batch_sam.py:425-452)."""
    ids = group["id"].to_numpy(zero_copy_only=False)
    x = group["x"].to_numpy()
    y = group["y"].to_numpy()
    owner = group["owner"].to_numpy(zero_copy_only=False)
    qi = np.where(owner)[0]
    order = np.lexsort((ids,))
    x_s, y_s, ids_s = x[order], y[order], ids[order]
    out_q, out_quad, out_j, out_d = [], [], [], []
    # vectorized: query chunks × candidates; per quadrant a masked
    # argmin along axis 1 (candidates id-sorted → argmin's first-of-min
    # IS the lowest-id tie-break the reference loop produced)
    for c0 in range(0, len(qi), _KNN_CHUNK):
        q = qi[c0 : c0 + _KNN_CHUNK]
        dx = x_s[None, :] - x[q][:, None]
        dy = y_s[None, :] - y[q][:, None]
        # sqrt(dx²+dy²), not np.hypot: each IEEE op (*, +, sqrt) is
        # correctly rounded, so this matches ANSI-SQL sqrt(...) bit for
        # bit — the DuckDB oracle reproduces dist and the >=min_dist
        # boundary exactly
        d = np.sqrt(dx * dx + dy * dy)
        valid = (d >= min_dist) & (ids_s[None, :] != ids[q][:, None])
        # quadrant of neighbor relative to target (find_cardinal_direction)
        # E = dx>=0, N = dy>=0 → 0:NE 1:NW 2:SE 3:SW (_QUADS order)
        quad = np.where(dx >= 0, np.where(dy >= 0, 0, 2), np.where(dy >= 0, 1, 3))
        for qcode in range(4):
            dd = np.where(valid & (quad == qcode), d, np.inf)
            j = np.argmin(dd, axis=1)
            best = dd[np.arange(len(q)), j]
            hit = np.isfinite(best)
            out_q.append(q[hit])
            out_quad.append(np.full(hit.sum(), qcode, np.int8))
            out_j.append(j[hit])
            out_d.append(best[hit])
    qv = np.concatenate(out_q) if out_q else np.empty(0, np.int64)
    jv = np.concatenate(out_j) if out_j else np.empty(0, np.int64)
    quadv = np.concatenate(out_quad) if out_quad else np.empty(0, np.int8)
    quad_names = np.array(_QUADS)
    return pa.table(
        {
            "id": pa.array(ids[qv.astype(np.int64)], pa.string()),
            "quad": pa.array(quad_names[quadv.astype(np.int64)], pa.string()),
            "neighbor_id": pa.array(ids_s[jv.astype(np.int64)], pa.string()),
            "dist": pa.array(
                np.concatenate(out_d) if out_d else np.empty(0), pa.float64()
            ),
        }
    )


def knn_cardinal(points, min_dist: float = 3.0, res: int = cells.DEFAULT_RES,
                 id_col: str = "stem_id", halo_m: float | None = None,
                 local: bool = False):
    """(id, quad, neighbor_id, dist) — nearest neighbor per NE/NW/SE/SW
    quadrant at distance ≥ min_dist (reference 3 m floor, config.py:34).

    ``local=True`` restricts candidates to the point's own cell with no
    halo replication — the reference's actual semantics (stems are
    clipped to the tile before prompting, batch_sam.py:396-410), zero
    shuffle amplification, and exactly reproducible by a SQL self-join
    on the cell key. Default (halo) mode instead approximates global
    quadrant-nearest, exact while that neighbor is within the halo."""
    pts = points.select_columns([id_col, "x", "y"]).map_batches(
        lambda t: t.rename_columns(["id", "x", "y"]), batch_format="pyarrow"
    )
    if local:
        from ..stages.spatial import attach_cell

        def own_cell(t: pa.Table) -> pa.Table:
            t = attach_cell(t, res=res)
            return t.append_column(
                "owner", pa.array(np.ones(len(t), dtype=bool))
            )

        exploded = pts.map_batches(own_cell, batch_format="pyarrow")
    else:
        exploded = pts.map_batches(
            _halo_explode, batch_format="pyarrow",
            fn_kwargs={"res": res, "halo_m": halo_m},
        )
    return sorted_group_map(
        exploded.map_batches(scramble_cell, batch_format="pyarrow"),
        ["cell"], _cardinal_cell, fn_kwargs={"min_dist": min_dist},
    )


_R_CHUNK = 512


def _radius_cell(group: pa.Table, radius: float) -> pa.Table:
    """Per-cell radius-pair kernel: owner rows probe all copies in the
    cell with a chunked distance matrix; a pair is emitted once, from
    the owner with the LOWER id (the ownership rule that makes halo
    replication dupe-free). d² ≤ r² masks match the SQL oracle's
    float comparison exactly (each IEEE op correctly rounded, same
    order of operations)."""
    ids = group["id"].to_numpy(zero_copy_only=False)
    x = group["x"].to_numpy()
    y = group["y"].to_numpy()
    owner = group["owner"].to_numpy(zero_copy_only=False)
    qi = np.where(owner)[0]
    empty = pa.table({
        "id_a": pa.array([], pa.string()),
        "id_b": pa.array([], pa.string()),
        "dist": pa.array([], pa.float64()),
    })
    if len(qi) == 0 or len(ids) <= 1:
        return empty
    r2 = radius * radius
    out_a, out_b, out_d = [], [], []
    for c0 in range(0, len(qi), _R_CHUNK):
        q = qi[c0 : c0 + _R_CHUNK]
        dx = x[None, :] - x[q][:, None]
        dy = y[None, :] - y[q][:, None]
        d2 = dx * dx + dy * dy
        hit = (d2 <= r2) & (ids[None, :] > ids[q][:, None])
        qq, jj = np.where(hit)
        if len(qq):
            out_a.append(ids[q][qq])
            out_b.append(ids[jj])
            out_d.append(np.sqrt(d2[qq, jj]))
    if not out_a:
        return empty
    return pa.table({
        "id_a": pa.array(np.concatenate(out_a)),
        "id_b": pa.array(np.concatenate(out_b)),
        "dist": pa.array(np.concatenate(out_d)),
    })


def radius_pairs(points, radius: float, res: int = cells.DEFAULT_RES,
                 id_col: str = "stem_id"):
    """Spatial radius self-join: every unordered pair of points within
    ``radius`` of each other, as (id_a < id_b, dist). The fixed-radius
    variant of the kNN machinery (same halo-replication exchange,
    SURVEY §7.3): each point is copied only into neighbor cells whose
    boundary lies within ``radius`` (halo_m=radius bounds shuffle
    growth to ~1 + 4·r/edge), pairs resolve cell-locally, and the
    lower-id-owner rule emits each pair exactly once — no post-join
    dedup exchange. Exact for radius ≤ cell edge (asserted)."""
    if radius > cells.cell_edge_m(res):
        raise ValueError("radius must be <= cell edge for halo exactness")
    pts = points.select_columns([id_col, "x", "y"]).map_batches(
        lambda t: t.rename_columns(["id", "x", "y"]), batch_format="pyarrow"
    )
    exploded = pts.map_batches(
        _halo_explode, batch_format="pyarrow",
        fn_kwargs={"res": res, "halo_m": radius},
    )
    return sorted_group_map(
        exploded.map_batches(scramble_cell, batch_format="pyarrow"),
        ["cell"], _radius_cell, fn_kwargs={"radius": radius},
    )


def cell_hulls(points, res: int = cells.DEFAULT_RES,
               x_col: str = "x", y_col: str = "y",
               scale: float | None = None):
    """Per-cell convex-hull footprints (the grouped spatial aggregate a
    plot-summary layer serves): points co-locate once by Morton cell,
    each group runs the monotone-chain kernel, and the output is one
    slim row per cell — (cell, n_points, n_vertices, hull_area_c4
    int ×1e4, canonical CCW vertex count) — exact shoelace area on the
    canonical hull so rows are bit-identical at any parallelism.

    ``scale``: when the coordinates live on a 1/scale grid (e.g.
    decimal tenths → scale=10), pass it to run the hull predicate AND
    the shoelace on round(x·scale) INTEGER coordinates: every cross
    product and the area sum are then exact int64 arithmetic —
    order-free, reproducible by any external oracle — and the area is
    divided back by scale² before the ×1e4 rounding. Cell assignment
    always uses the original coordinates."""
    from .relational import bucketed_reduce

    def add_cell(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["cell"] = cells.cell_of(
            df[x_col].to_numpy(), df[y_col].to_numpy(), res
        ).astype(np.uint64)
        return df

    pts = points.select_columns([x_col, y_col]).map_batches(
        add_cell, batch_format="pandas"
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"cell": [], "n_points": [], "n_vertices": [],
                "hull_area_c4": []}
        for cell, g in df.groupby("cell", sort=False):
            xs = g[x_col].to_numpy()
            ys = g[y_col].to_numpy()
            if scale is not None:
                xs = np.floor(xs * scale + 0.5)
                ys = np.floor(ys * scale + 0.5)
            h = geom.convex_hull(xs, ys)
            hx, hy = xs[h], ys[h]
            if scale is not None:
                area2 = float(abs(int(
                    np.dot(hx.astype(np.int64),
                           np.roll(hy, -1).astype(np.int64))
                    - np.dot(hy.astype(np.int64),
                             np.roll(hx, -1).astype(np.int64))
                )) / (scale * scale))
            else:
                area2 = abs(float(
                    np.dot(hx, np.roll(hy, -1)) - np.dot(hy, np.roll(hx, -1))
                ))
            rows["cell"].append(np.uint64(cell))
            rows["n_points"].append(len(g))
            rows["n_vertices"].append(len(h))
            rows["hull_area_c4"].append(
                np.int64(np.floor(area2 / 2.0 * 10000 + 0.5))
            )
        return pd.DataFrame({
            "cell": np.array(rows["cell"], np.uint64),
            "n_points": np.array(rows["n_points"], np.int64),
            "n_vertices": np.array(rows["n_vertices"], np.int64),
            "hull_area_c4": np.array(rows["hull_area_c4"], np.int64),
        })

    return bucketed_reduce(pts, "cell", per_bucket)
