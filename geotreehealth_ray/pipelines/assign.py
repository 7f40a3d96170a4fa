"""Crown-assignment join: point-in-polygon assignment of stem points to
crown polygons, Ray-Data-native.

Reference semantics (mirrored exactly, validated by golden tests):
- ``sjoin(..., predicate='contains')`` — reference
  tree_delineation/delineation_utils.py:437
- ``assign_polygon_to_crown`` — reference
  tree_health_detection/utils.py:310-339: per crown, the contained stem
  nearest to the crown centroid wins (ties broken by stem_id asc here,
  making the parallel result deterministic where the reference's
  iterrows order was incidental).
- stems contained by no crown → "unassigned" report — reference
  utils.py:330-332 (a left-anti output of the join).

Physical plan (SURVEY.md §7.1 steps 5+9):
1. cell-encode stems at resolution ``res`` (narrow projection only);
2. halo-replicate crowns to every cell their bbox covers (vectorized
   explode), rings packed as binary; skew salting splits each cell
   into N_SALT sub-groups — crowns partition by hash(crown_id), stems
   replicate — so dense forest-patch cells fan out instead of
   straggling;
3. union both sides and ``groupby(cell, salt)`` — ONE all-to-all
   exchange co-locating each sub-group's stems with every crown that
   can contain them;
4. per group: per-partition grid index (R-tree slot) + bbox prefilter
   + exact ray-casting PIP + local nearest-stem partial argmin
   (combiner);
5. a hash-bucketed reduce resolves the global winner per crown across
   its ≤#covered-cells partials (single-cell crowns pass through
   untouched inside the same reduce);
6. unassigned = bucketed anti-reduce of distinct stems vs winners.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import cells, geom
from ..functions.gridindex import PointGridIndex
from ..stages.spatial import (
    attach_cell,
    explode_to_covering_cells,
    pack_rings,
    rings_from_binary,
)

__all__ = ["assign_stems_to_crowns", "candidate_pairs_schema"]

_UNION_SCHEMA = pa.schema(
    [
        ("side", pa.int8()),  # 0 = stem, 1 = crown
        ("cell", pa.uint64()),
        ("stem_id", pa.string()),
        ("x", pa.float64()),
        ("y", pa.float64()),
        ("crown_id", pa.string()),
        ("ring_b", pa.binary()),
        ("ccx", pa.float64()),
        ("ccy", pa.float64()),
        ("multi", pa.bool_()),  # crown bbox spans >1 cell → needs reduce
        ("salt", pa.int8()),
    ]
)

# Hot-cell salting (SURVEY §7.1 step 9): in cells whose stem count
# exceeds HOT_CELL_THRESHOLD, crowns are PARTITIONED across N_SALT
# sub-groups while stems are REPLICATED to every sub-group — per-crown
# work is unchanged, but a dense cell's crown loop fans out over N_SALT
# parallel tasks instead of one straggler. Cold cells keep salt 0, so
# the shuffle volume only grows where the skew actually is. The hot
# set comes from a cheap pre-aggregated count pass and is broadcast.
N_SALT = 4
HOT_CELL_THRESHOLD = 2000


def _salt_of(ids) -> np.ndarray:
    h = pd.util.hash_pandas_object(pd.Series(ids), index=False).to_numpy()
    return (h % N_SALT).astype(np.int8)


def _hot_cells(stems, res: int):
    """Broadcastable set of hot cell keys: per-batch partial counts →
    one tiny groupby — the 'stem-count histogram per cell' pass."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        key = cells.cell_of(t["x"].to_numpy(), t["y"].to_numpy(), res)
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {"cell": pa.array(uniq, pa.uint64()), "n": pa.array(cnt, pa.int64())}
        )

    counts = (
        stems.select_columns(["x", "y"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .sum("n")
        .to_pandas()
    )
    ncol = "sum(n)" if "sum(n)" in counts.columns else "n"
    hot = set(counts.loc[counts[ncol] > HOT_CELL_THRESHOLD, "cell"].astype(np.uint64))
    return ray.put(hot)


def _stem_side(batch: pa.Table, res: int, hot_ref=None, salt_all=True) -> pa.Table:
    import ray

    batch = attach_cell(batch, res=res)
    if salt_all:
        is_hot = np.ones(len(batch), dtype=bool)
    else:
        hot = ray.get(hot_ref) if hot_ref is not None else set()
        key = batch["cell"].to_numpy()
        is_hot = (
            np.isin(key, np.fromiter(hot, dtype=np.uint64)) if hot else
            np.zeros(len(batch), dtype=bool)
        )
    # hot-cell stems replicate to every salt; cold stems stay single
    reps = np.where(is_hot, N_SALT, 1)
    idx = np.repeat(np.arange(len(batch)), reps)
    starts = np.cumsum(reps) - reps
    salt = (np.arange(len(idx)) - np.repeat(starts, reps)).astype(np.int8)
    batch = batch.take(pa.array(idx))
    n = len(batch)
    return pa.table(
        {
            "side": pa.array(np.zeros(n, np.int8)),
            "cell": batch["cell"],
            "stem_id": batch["stem_id"],
            "x": batch["x"],
            "y": batch["y"],
            "crown_id": pa.nulls(n, pa.string()),
            "ring_b": pa.nulls(n, pa.binary()),
            "ccx": pa.nulls(n, pa.float64()),
            "ccy": pa.nulls(n, pa.float64()),
            "multi": pa.nulls(n, pa.bool_()),
            "salt": pa.array(salt),
        },
        schema=_UNION_SCHEMA,
    )


def _crown_side(batch: pa.Table, res: int, hot_ref=None, salt_all=True) -> pa.Table:
    import ray

    hot = None if salt_all else (ray.get(hot_ref) if hot_ref is not None else set())
    batch = pack_rings(batch)
    idx, keys = cells.cells_covering_arrays(
        batch["minx"].to_numpy(),
        batch["miny"].to_numpy(),
        batch["maxx"].to_numpy(),
        batch["maxy"].to_numpy(),
        res,
    )
    # spans >1 cell ⇔ replicated more than once (vectorized)
    reps = np.bincount(idx, minlength=len(batch))
    salt_per_row = _salt_of(batch["crown_id"].to_numpy(zero_copy_only=False))
    taken = batch.take(pa.array(idx))
    n = len(taken)
    if hot is None:
        is_hot = np.ones(n, dtype=bool)
    else:
        is_hot = (
            np.isin(keys, np.fromiter(hot, dtype=np.uint64)) if hot else
            np.zeros(n, dtype=bool)
        )
    salts = np.where(is_hot, salt_per_row[idx], np.int8(0)).astype(np.int8)
    return pa.table(
        {
            "side": pa.array(np.ones(n, np.int8)),
            "cell": pa.array(keys, pa.uint64()),
            "stem_id": pa.nulls(n, pa.string()),
            "x": taken["minx"],  # carried for bbox prefilter
            "y": taken["miny"],
            "crown_id": taken["crown_id"],
            "ring_b": taken["ring_b"],
            "ccx": taken["cx"],
            "ccy": taken["cy"],
            "multi": pa.array((reps > 1)[idx]),
            "salt": pa.array(salts),
        },
        schema=_UNION_SCHEMA,
    )


def _assign_cell(group: pa.Table) -> pa.Table:
    """Per-cell kernel: PIP + local nearest-stem partial argmin."""
    side = group["side"].to_numpy()
    stems = group.filter(pa.array(side == 0))
    crowns = group.filter(pa.array(side == 1))
    empty = pa.table(
        {
            "crown_id": pa.array([], pa.string()),
            "stem_id": pa.array([], pa.string()),
            "dist": pa.array([], pa.float64()),
            "multi": pa.array([], pa.bool_()),
        }
    )
    if len(stems) == 0 or len(crowns) == 0:
        return empty
    sx = stems["x"].to_numpy()
    sy = stems["y"].to_numpy()
    sid = stems["stem_id"].to_numpy(zero_copy_only=False)
    rings = rings_from_binary(crowns["ring_b"])
    cids = crowns["crown_id"].to_numpy(zero_copy_only=False)
    ccx = crowns["ccx"].to_numpy()
    ccy = crowns["ccy"].to_numpy()
    cmulti = crowns["multi"].to_numpy(zero_copy_only=False)
    out_c: list[str] = []
    out_s: list[str] = []
    out_d: list[float] = []
    out_m: list[bool] = []
    order = np.lexsort((sid,))  # stable stem order for deterministic ties
    sx, sy, sid = sx[order], sy[order], sid[order]
    # per-partition grid index (R-tree slot, SURVEY §2.3): bbox probes
    # are O(log n + hits) — dense cells stay sub-quadratic
    index = PointGridIndex(sx, sy)
    for i, ring in enumerate(rings):
        minx, miny, maxx, maxy = (
            ring[:, 0].min(),
            ring[:, 1].min(),
            ring[:, 0].max(),
            ring[:, 1].max(),
        )
        hit = index.query_bbox(minx, miny, maxx, maxy)
        if len(hit) == 0:
            continue
        hx, hy = sx[hit], sy[hit]
        cand = (hx >= minx) & (hx <= maxx) & (hy >= miny) & (hy <= maxy)
        if not cand.any():
            continue
        hit = hit[cand]
        cx_, cy_ = sx[hit], sy[hit]
        inside = geom.points_in_ring(cx_, cy_, ring)
        if not inside.any():
            continue
        d = np.hypot(cx_[inside] - ccx[i], cy_[inside] - ccy[i])
        ids_in = sid[hit[inside]]
        # deterministic (dist, stem_id) argmin — index order is not
        # id-sorted, so break ties explicitly
        j = int(np.lexsort((ids_in, d))[0])
        out_c.append(cids[i])
        out_s.append(ids_in[j])
        out_d.append(float(d[j]))
        out_m.append(bool(cmulti[i]))
    return pa.table(
        {
            "crown_id": pa.array(out_c, pa.string()),
            "stem_id": pa.array(out_s, pa.string()),
            "dist": pa.array(out_d, pa.float64()),
            "multi": pa.array(out_m, pa.bool_()),
        }
    )


def _final_pick_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized duplicate resolution after halo replication: global
    (dist, stem_id) argmin per crown across its ≤#covered-cells
    partial winners."""
    df = df.sort_values(["crown_id", "dist", "stem_id"], kind="stable")
    return df.drop_duplicates("crown_id", keep="first")


def assign_stems_to_crowns(stems, crowns, res: int = cells.DEFAULT_RES,
                           salt_mode: str = "all"):
    """Returns (assignment_ds, unassigned_ds).

    salt_mode: 'all' (default — every cell fans out over N_SALT
    sub-groups; the extra stem replicas are slim rows and the blanket
    policy avoids a pre-pass), 'hot' (adaptive: a cheap count pass
    finds hot cells and only those are salted — preferable when the
    stems table is enormous relative to the skew), or 'none'.

    assignment: (crown_id, stem_id, dist) — one row per crown that
    contains ≥1 stem. unassigned: (stem_id) — distinct stems no crown
    selected.
    """
    hot_ref = _hot_cells(stems, res) if salt_mode == "hot" else None
    salt_all = salt_mode == "all"
    s = stems.select_columns(["stem_id", "x", "y"]).map_batches(
        _stem_side, batch_format="pyarrow",
        fn_kwargs={"res": res, "hot_ref": hot_ref, "salt_all": salt_all},
    )
    c = crowns.select_columns(
        ["crown_id", "ring", "cx", "cy", "minx", "miny", "maxx", "maxy"]
    ).map_batches(
        _crown_side, batch_format="pyarrow",
        fn_kwargs={"res": res, "hot_ref": hot_ref, "salt_all": salt_all},
    )
    from .relational import bucketed_reduce

    both = s.union(c)
    candidates = both.groupby(["cell", "salt"]).map_groups(
        _assign_cell, batch_format="pyarrow"
    )
    # single-cell crowns (the vast majority) have exactly one candidate
    # row; only cell-spanning crowns need duplicate resolution. Branching
    # the dataset would re-execute the upstream per branch, so the split
    # happens inside one pass: the reduce sorts only rows flagged multi.
    def _resolve(df: pd.DataFrame) -> pd.DataFrame:
        direct = df[~df["multi"]]
        span = df[df["multi"]]
        if len(span):
            span = _final_pick_bucket(span)
        return pd.concat([direct, span], ignore_index=True).drop(columns="multi")

    assignment = bucketed_reduce(candidates, "crown_id", _resolve)
    # left-anti: distinct stems minus winners (co-partitioned on
    # stem_id hash buckets — no broadcast, works at any winner size)
    stem_ids = stems.select_columns(["stem_id"]).map_batches(
        lambda t: pa.table(
            {"stem_id": t["stem_id"], "tag": pa.array(np.zeros(len(t), np.int8))}
        ),
        batch_format="pyarrow",
    )
    winner_ids = assignment.map_batches(
        lambda t: pa.table(
            {"stem_id": t["stem_id"], "tag": pa.array(np.ones(len(t), np.int8))}
        ),
        batch_format="pyarrow",
    )

    def _anti_bucket(df: pd.DataFrame) -> pd.DataFrame:
        no_winner = df.groupby("stem_id")["tag"].transform("max") == 0
        return df[no_winner].drop_duplicates("stem_id")[["stem_id"]]

    unassigned = bucketed_reduce(
        stem_ids.union(winner_ids), "stem_id", _anti_bucket
    )
    return assignment, unassigned


def _pairs_cell(group: pa.Table) -> pa.Table:
    """Per-cell kernel emitting ALL containment pairs (the raw
    ``sjoin(predicate='contains')`` — reference delineation_utils.py:437).
    Each pair is discovered exactly once: in the cell that owns the
    point (crowns are halo-replicated to it)."""
    side = group["side"].to_numpy()
    stems = group.filter(pa.array(side == 0))
    crowns = group.filter(pa.array(side == 1))
    if len(stems) == 0 or len(crowns) == 0:
        return pa.table(
            {"crown_id": pa.array([], pa.string()),
             "stem_id": pa.array([], pa.string())}
        )
    sx = stems["x"].to_numpy()
    sy = stems["y"].to_numpy()
    sid = stems["stem_id"].to_numpy(zero_copy_only=False)
    rings = rings_from_binary(crowns["ring_b"])
    cids = crowns["crown_id"].to_numpy(zero_copy_only=False)
    out_c, out_s = [], []
    index = PointGridIndex(sx, sy)
    for i, ring in enumerate(rings):
        minx, miny = ring[:, 0].min(), ring[:, 1].min()
        maxx, maxy = ring[:, 0].max(), ring[:, 1].max()
        hit = index.query_bbox(minx, miny, maxx, maxy)
        if len(hit) == 0:
            continue
        hx, hy = sx[hit], sy[hit]
        cand = (hx >= minx) & (hx <= maxx) & (hy >= miny) & (hy <= maxy)
        if not cand.any():
            continue
        hit = hit[cand]
        inside = geom.points_in_ring(sx[hit], sy[hit], ring)
        for s in sid[hit[inside]]:
            out_c.append(cids[i])
            out_s.append(s)
    return pa.table(
        {"crown_id": pa.array(out_c, pa.string()),
         "stem_id": pa.array(out_s, pa.string())}
    )


def pip_join_pairs(stems, crowns, res: int = cells.DEFAULT_RES):
    """(crown_id, stem_id) — every point-in-polygon containment pair
    (the spatial inner join itself, without the nearest-stem reduce)."""
    s = stems.select_columns(["stem_id", "x", "y"]).map_batches(
        _stem_side, batch_format="pyarrow", fn_kwargs={"res": res}
    )
    c = crowns.select_columns(
        ["crown_id", "ring", "cx", "cy", "minx", "miny", "maxx", "maxy"]
    ).map_batches(_crown_side, batch_format="pyarrow", fn_kwargs={"res": res})
    return s.union(c).groupby(["cell", "salt"]).map_groups(
        _pairs_cell, batch_format="pyarrow"
    )


def candidate_pairs_schema() -> pa.Schema:
    return pa.schema(
        [("crown_id", pa.string()), ("stem_id", pa.string()), ("dist", pa.float64())]
    )
