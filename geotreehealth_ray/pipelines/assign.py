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

Physical plan (SURVEY.md §7.1 steps 5+9), default ``mode='owner'``:
1. two CONCURRENT narrow driver pre-passes: a sampled stem histogram
   and the crown reach/cell-histogram combiner (the pair-aware salt
   table costs no extra scan);
2. each crown keys to its centroid's cell ONCE (no replication);
   stems replicate to every cell their margin box touches — every
   (crown, contained-stem) pair meets in exactly one group, so the
   per-group argmin IS the global winner, no second exchange;
3. union both sides (~32 fat blocks per side) and sort on the fused
   (cell, salt) key with analytic uniform boundaries — ONE
   all-to-all, no sample round; skew salting splits hot cells into
   sub-groups (crowns partition by hash(crown_id), stems replicate)
   sized by BOTH the stem count and the stem×crown pair estimate;
4. per group: fully vectorized candidate generation (array
   ``searchsorted`` of crown bboxes over x-sorted stems — the R-tree
   slot collapsed into one probe for ALL crowns) + pair-level
   multi-ring ray-casting PIP (``geom.points_in_rings_pairs``) +
   (dist, stem-id-rank) argmin — no per-crown Python loop, no string
   sorts in the pair path;
5. unassigned = bucketed anti-reduce of distinct stems vs winners.

``mode='halo'`` inverts the replication (crowns explode to covering
cells, a hash-bucketed reduce resolves cross-cell duplicate winners)
— cheaper when a few monster crowns would blow up the owner margin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import cells, geom
from ..stages.spatial import (
    attach_cell,
    crown_pack_from_blob,
    explode_to_covering_cells,
    pack_crown_blobs,
)

__all__ = ["assign_stems_to_crowns", "candidate_pairs_schema"]

# Exchange payload (VERDICT r3 next #3 + r4 next #3): crown-only
# fields — centroid, multi-cell flag, every ring loop (exterior +
# interior) — are FUSED into one blob (stages.spatial.pack_crown_blobs)
# instead of 4 separate columns; the blob also carries interior rings,
# making the PIP kernels hole-aware (crossing parity over all loops —
# crown_pack_from_blob) with no kernel change. r5 slims the schema to
# FOUR columns: both sides have exactly one id (stem_id XOR crown_id)
# so they share the ``id`` column, and the stem coordinates pack into
# the shared ``payload`` binary column (16 B fixed rows — _pack_xy)
# that crowns use for their blob. Arrow null columns are NOT free —
# a null float64 column still allocates 8 B/row and a null
# string/binary column 4 B/row of offsets — so the 7-column schema
# paid ~8 dead B per stem row and ~20 dead B per crown row
# (tools/measure_exchange.py: union 345 → 311 MB at 960k, −10%).
_UNION_SCHEMA = pa.schema(
    [
        ("side", pa.int8()),  # 0 = stem, 1 = crown
        ("cell", pa.uint64()),
        ("id", pa.string()),       # stem_id (side 0) / crown_id (side 1)
        ("payload", pa.binary()),  # packed (x, y) / crown blob
    ]
)


def _pack_xy(x: np.ndarray, y: np.ndarray) -> pa.Array:
    """(x, y) float64 pairs → 16-byte binary rows (the stem payload).
    Vectorized: one interleaved buffer + uniform offsets."""
    n = len(x)
    inter = np.empty(2 * n, np.float64)
    inter[0::2] = x
    inter[1::2] = y
    off = (np.arange(n + 1, dtype=np.int64) * 16).astype(np.int32)
    return pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(off.tobytes()), pa.py_buffer(inter.tobytes())],
    )


def _unpack_xy(col) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`_pack_xy` — zero-copy view over the binary
    column's value buffer (rows are uniform 16 B by construction;
    loudly guarded)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.array([], np.float64), np.array([], np.float64)
    bufs = col.buffers()
    off = np.frombuffer(bufs[1], np.int32)[col.offset:col.offset + n + 1]
    base, end = int(off[0]), int(off[-1])
    if end - base != 16 * n:
        raise ValueError("stem payload rows must be uniform 16 bytes")
    a = np.frombuffer(memoryview(bufs[2])[base:end],
                      np.float64).reshape(-1, 2)
    # aligned copies (BLAS-alignment determinism rule, functions.geom)
    return np.ascontiguousarray(a[:, 0]), np.ascontiguousarray(a[:, 1])
# NOTE: salt is FUSED into the mixed cell key (cells.fused_group_key),
# not carried as a column — the exchange sorts ONE uniform uint64 key,
# which lets the caller hand the sort analytic uniform boundaries and
# collapse the groupby to a single barrier (no sample, no coalesce).

# Hot-cell salting (SURVEY §7.1 step 9): in cells whose stem count
# exceeds HOT_CELL_THRESHOLD, crowns are PARTITIONED across the cell's
# salt sub-groups while stems are REPLICATED to every sub-group —
# per-crown work is unchanged, but a dense cell's work fans out over
# parallel tasks instead of one straggler. Cold cells keep salt 0, so
# the shuffle volume only grows where the skew actually is.
#
# The salt count is ADAPTIVE per cell — ceil(estimated_stems /
# HOT_CELL_THRESHOLD), capped at N_SALT_MAX — so a cell at 1.2× the
# threshold replicates its stems 2×, not a blanket max fan-out (a
# fixed ×8 fanned HALF the dataset out 8-fold on the 15.36M clustered
# input and blew the exchange to 100M+ rows). The (cell → k) table
# comes from a cheap sampled count pass and is broadcast.
#
# Threshold calibration: the vectorized pair kernel handles a
# 5k-stem × ~1k-crown cell in ~0.2-0.3 s, a healthy task size — only
# beyond that is splitting worth the replicated stem rows.
N_SALT = 8  # blanket fan-out used by salt_mode='all' only
N_SALT_MAX = 96  # fused key carries 7 salt bits (cells.fused_group_key)
HOT_CELL_THRESHOLD = 5000
HOT_CELL_EXTREME = 3 * HOT_CELL_THRESHOLD  # quadratic-salt escalation floor


def _salt_of(ids, k: np.ndarray) -> np.ndarray:
    """Deterministic per-row salt: hash(id) % k, with k the row's
    cell's salt count (vectorized modulo-by-array)."""
    h = pd.util.hash_pandas_object(pd.Series(ids), index=False).to_numpy()
    return (h % np.maximum(k, 1).astype(np.uint64)).astype(np.int8)


_HOT_SAMPLE_ROWS = 200_000


def _crown_reach(crowns) -> tuple[float, float]:
    """Back-compat wrapper: (mx, my) global max reach only."""
    mx, my, _qx, _qy = _reach_stats(crowns)
    return mx, my


# outlier-crown broadcast budget (rows). Above this the reach tail is
# too fat to call "outliers" and the plan falls back to the full
# max-reach margin.
BIG_BROADCAST_MAX = 200_000
_REACH_QUANTILE = 0.9995
# the split must BUY something: only trigger when the quantile margin
# is well under the max (a genuine monster-polygon tail). On smooth
# heavy-tailed reach distributions the broadcast join costs more than
# the saved replication (measured: p99.8 split on the 15.36M synth
# input = 49k "outliers", cover 1.76→1.44, net SLOWER), so the guard
# stays dormant there and the plan keeps the max-reach margin.
_REACH_SPLIT_RATIO = 0.6


_CROWN_HIST_STEP = 64


def _crown_stride(n_crowns: int | None) -> int:
    """Deterministic crown-sample stride, scaled so the DRIVER-side
    collected sample (reach quantile + cell histogram) stays bounded
    at ~_HOT_SAMPLE_ROWS regardless of crown count — the fixed 1/64
    stride grew linearly with the table (the same unbounded-collect
    class as the r4 chips boundary pre-scan finding). The stride only
    steers sampled estimates (quantile / salt table), never output
    rows."""
    return max(_CROWN_HIST_STEP, (n_crowns or 0) // _HOT_SAMPLE_ROWS)


def _reach_stats(crowns, res: int | None = None):
    """One narrow combiner scan → (mx, my, qx, qy[, crown_hist]): the
    global max crown reach per axis (bbox extent from the centroid)
    AND a high reach quantile (p≈99.8) from a deterministic stride
    sample. The margin for owner-mode stem replication only needs to
    cover the crowns that take the exchange path — crowns with reach
    beyond the quantile go through the outlier broadcast join
    instead, so ONE 21 m monster crown no longer inflates every
    stem's margin box (measured: max-reach margin was 1.77× stem
    replication vs 1.27× at p99.8 on the 15.36M clustered input).
    Which crowns take which path is a pure partitioning choice — both
    paths are exact — so a sampled quantile is safe. The scan is a
    combiner (one slim row per batch) — no shuffle.

    With ``res``, the same stride sample additionally yields a
    per-cell CROWN count histogram ``crown_hist = (keys, est)``
    (centroid cells, counts × stride) for the pair-aware salt rule —
    piggybacked here so the salting needs no third pre-pass, and
    returns a 5-tuple. The stride scales with a metadata-backed crown
    count (:func:`_crown_stride`) so the driver collect stays
    bounded."""
    try:
        meta_n = crowns._meta_count()
    except Exception:
        meta_n = None
    step = _crown_stride(meta_n)

    def partial(t: pa.Table):
        if len(t) == 0:
            return pa.table({"mx": pa.array([], pa.float64()),
                             "my": pa.array([], pa.float64()),
                             "sx": pa.array([], pa.binary()),
                             "sy": pa.array([], pa.binary()),
                             "ck": pa.array([], pa.binary())})
        cx = t["cx"].to_numpy()
        cy = t["cy"].to_numpy()
        rx = np.maximum(cx - t["minx"].to_numpy(),
                        t["maxx"].to_numpy() - cx)
        ry = np.maximum(cy - t["miny"].to_numpy(),
                        t["maxy"].to_numpy() - cy)
        # every-step'th row: deterministic, costs nothing (row order
        # inside a parquet batch is stable; the quantile only steers a
        # partitioning choice, so mild within-batch correlation is
        # irrelevant — an id-hash sample here measurably slowed the
        # whole pass at small scale)
        ck = (cells.cell_of(cx[::step], cy[::step], res).tobytes()
              if res is not None else b"")
        return pa.table({
            "mx": pa.array([float(rx.max())]),
            "my": pa.array([float(ry.max())]),
            "sx": pa.array([rx[::step].tobytes()], pa.binary()),
            "sy": pa.array([ry[::step].tobytes()], pa.binary()),
            "ck": pa.array([ck], pa.binary()),
        })

    parts = (
        crowns.select_columns(["cx", "cy", "minx", "miny", "maxx", "maxy"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    zhist = (np.array([], np.uint64), np.array([], np.float64))
    if len(parts) == 0:
        return (0.0, 0.0, 0.0, 0.0) if res is None else (
            0.0, 0.0, 0.0, 0.0, zhist)
    mx = float(parts["mx"].max())
    my = float(parts["my"].max())
    sx = np.concatenate([np.frombuffer(b) for b in parts["sx"]])
    sy = np.concatenate([np.frombuffer(b) for b in parts["sy"]])
    qx = float(np.quantile(sx, _REACH_QUANTILE)) if len(sx) else mx
    qy = float(np.quantile(sy, _REACH_QUANTILE)) if len(sy) else my
    if res is None:
        return mx, my, qx, qy
    ck = np.concatenate(
        [np.frombuffer(b, np.uint64) for b in parts["ck"]]
    ) if len(parts) else np.array([], np.uint64)
    if len(ck):
        uniq, cnt = np.unique(ck, return_counts=True)
        hist = (uniq, cnt.astype(np.float64) * step)
    else:
        hist = zhist
    return mx, my, qx, qy, hist


def _parquet_read_files(ds) -> list[str] | None:
    """The file list iff ``ds`` is a PLAIN parquet read — a bare Read
    op with a ParquetDatasource and no upstream transforms. Only then
    is bypassing the Dataset plan semantics-preserving (a filtered or
    mapped dataset must go through its own plan). None otherwise."""
    try:
        dag = ds._logical_plan.dag
        if type(dag).__name__ != "Read" or dag.input_dependencies:
            return None
        if type(getattr(dag, "_datasource", None)).__name__ \
                != "ParquetDatasource":
            return None
        files = ds.input_files()
        return list(files) or None
    except Exception:
        return None


def _prepass_chunk(stem_files, crown_files, res: int, stride: int,
                   step: int = _CROWN_HIST_STEP):
    """One raw-task unit of the fused pre-pass: per-file narrow
    parquet reads → stem (cell, count) partials (strided sample) and
    crown reach partials (exact per-file max + step-strided quantile /
    histogram samples; ``step`` scales with crown count so the driver
    merge stays bounded — _crown_stride). Runs as a plain Ray task —
    see _fused_prepass for why not map_batches."""
    import pyarrow.parquet as pq

    ks, cs = [], []
    for f in stem_files:
        t = pq.read_table(f, columns=["x", "y"])
        key = cells.cell_of(t["x"].to_numpy()[::stride],
                            t["y"].to_numpy()[::stride], res)
        u, c = np.unique(key, return_counts=True)
        ks.append(u)
        cs.append(c)
    mx = my = 0.0
    rxs, rys, cks = [], [], []
    for f in crown_files:
        t = pq.read_table(f, columns=["cx", "cy", "minx", "miny",
                                      "maxx", "maxy"])
        cx = t["cx"].to_numpy()
        cy = t["cy"].to_numpy()
        rx = np.maximum(cx - t["minx"].to_numpy(),
                        t["maxx"].to_numpy() - cx)
        ry = np.maximum(cy - t["miny"].to_numpy(),
                        t["maxy"].to_numpy() - cy)
        if len(rx):
            mx = max(mx, float(rx.max()))  # EXACT max — margin safety
            my = max(my, float(ry.max()))
        rxs.append(rx[::step])
        rys.append(ry[::step])
        cks.append(cells.cell_of(cx[::step], cy[::step], res))
    z64 = np.array([], np.uint64)
    return (
        np.concatenate(ks) if ks else z64,
        np.concatenate(cs) if cs else np.array([], np.int64),
        mx, my,
        np.concatenate(rxs) if rxs else np.array([], np.float64),
        np.concatenate(rys) if rys else np.array([], np.float64),
        np.concatenate(cks) if cks else z64,
    )


def _fused_prepass(stems, crowns, res: int):
    """BOTH driver pre-passes in one task wave (VERDICT r4 #4): the
    sampled stem cell histogram and the crown reach/histogram scan are
    ~0.04 s of actual compute at the 960k bench input, but as two
    Dataset executions they cost ~1.0 s of plan/schedule/collect
    latency that never scales with CPUs — the measured floor of the
    small-input scaling efficiency. When both inputs are PLAIN parquet
    reads (the production shape; _parquet_read_files), the pre-pass
    runs as one wave of raw Ray tasks over the file lists — narrow
    column reads, per-task fold, driver merge — for ~10× less fixed
    wall. Any other input shape falls back to the two concurrent
    Dataset executions (correct for arbitrary upstream plans).

    Returns (stem_hist, mx, my, qx, qy, crown_hist). mx/my are the
    EXACT per-axis max crown reach (margin correctness depends on
    them); the histograms and the qx/qy quantile come from
    deterministic stride samples and only steer partitioning choices
    (salting / outlier split), never output rows — the raw path's
    samples differ from the Dataset path's only in batch framing."""
    import ray

    sf = _parquet_read_files(stems)
    cf = _parquet_read_files(crowns)
    zhist = (np.array([], np.uint64), np.array([], np.float64))
    if not (sf and cf):
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as ex:
            fh = ex.submit(_stem_cell_hist, stems, res)
            fr = ex.submit(_reach_stats, crowns, res)
            sh = fh.result()
            mx, my, qx, qy, crown_hist = fr.result()
        return sh, mx, my, qx, qy, crown_hist

    n = stems.count()  # parquet metadata — no scan
    stride = max(1, n // _HOT_SAMPLE_ROWS)
    cstep = _crown_stride(crowns.count())
    k = max(1, min(len(sf) + len(cf),
                   2 * int(ray.cluster_resources().get("CPU", 8))))
    fn = ray.remote(_prepass_chunk)
    outs = ray.get([
        fn.remote(sf[i::k], cf[i::k], res, stride, cstep)
        for i in range(k)
    ])

    keys = np.concatenate([o[0] for o in outs])
    cnts = np.concatenate([o[1] for o in outs])
    if len(keys):
        order = np.argsort(keys, kind="stable")
        keys, cnts = keys[order], cnts[order]
        new = np.r_[True, keys[1:] != keys[:-1]]
        gidx = np.cumsum(new) - 1
        stem_hist = (keys[new],
                     np.bincount(gidx, weights=cnts) * float(stride))
    else:
        stem_hist = zhist
    mx = max((o[2] for o in outs), default=0.0)
    my = max((o[3] for o in outs), default=0.0)
    rx = np.concatenate([o[4] for o in outs])
    ry = np.concatenate([o[5] for o in outs])
    qx = float(np.quantile(rx, _REACH_QUANTILE)) if len(rx) else mx
    qy = float(np.quantile(ry, _REACH_QUANTILE)) if len(ry) else my
    ck = np.concatenate([o[6] for o in outs])
    if len(ck):
        uniq, cnt = np.unique(ck, return_counts=True)
        crown_hist = (uniq, cnt.astype(np.float64) * cstep)
    else:
        crown_hist = zhist
    return stem_hist, mx, my, qx, qy, crown_hist


def _collect_big_crowns(crowns, qx: float, qy: float) -> pa.Table:
    """Slim driver-side table of the outlier crowns (reach beyond the
    quantile margin): (crown_id, crown_b). By construction
    ≤ ~0.2% of crowns — small enough to broadcast."""
    import ray

    empty = pa.table({"crown_id": pa.array([], pa.string()),
                      "crown_b": pa.array([], pa.binary())})

    def pick(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        cx = t["cx"].to_numpy()
        cy = t["cy"].to_numpy()
        rx = np.maximum(cx - t["minx"].to_numpy(),
                        t["maxx"].to_numpy() - cx)
        ry = np.maximum(cy - t["miny"].to_numpy(),
                        t["maxy"].to_numpy() - cy)
        m = (rx > qx) | (ry > qy)
        if not m.any():
            return empty
        t = t.filter(pa.array(m))
        return pa.table({
            "crown_id": t["crown_id"],
            "crown_b": pack_crown_blobs(t),
        })

    tabs = ray.get(
        crowns.select_columns(_crown_cols(crowns)).map_batches(
            pick, batch_format="pyarrow").to_arrow_refs()
    )
    tabs = [t for t in tabs if len(t)]
    if not tabs:
        return empty
    return pa.concat_tables(tabs)


def _crown_cols(crowns) -> list[str]:
    """Crown-side projection: the narrow join columns plus ``holes``
    when the source carries interior rings (every geo reader emits the
    column for holed inputs; the blob packer folds them in)."""
    cols = ["crown_id", "ring", "cx", "cy", "minx", "miny", "maxx", "maxy"]
    if "holes" in (crowns.columns() or []):
        cols.append("holes")
    return cols


_BIG_PACK_CACHE: dict = {}


def _big_crown_partials(t: pa.Table, big_ref) -> pa.Table:
    """Map-side broadcast join of one stems batch against the outlier
    crowns: per-batch partial (dist, stem_id) argmin per crown — same
    candidate prefilter + PIP + argmin arithmetic as _assign_cell, so
    the global reduce over partials is bit-identical to the exchange
    path. The parsed edge pack is cached per worker process."""
    import ray

    empty = pa.table({"crown_id": pa.array([], pa.string()),
                      "stem_id": pa.array([], pa.string()),
                      "dist": pa.array([], pa.float64())})
    key = big_ref.hex() if hasattr(big_ref, "hex") else id(big_ref)
    ent = _BIG_PACK_CACHE.get(key)
    if ent is None:
        bt = ray.get(big_ref)
        ccx, ccy, _multi, pack = crown_pack_from_blob(bt["crown_b"])
        ent = (pack, bt["crown_id"].to_numpy(zero_copy_only=False), ccx, ccy)
        _BIG_PACK_CACHE.clear()  # one live broadcast per pipeline
        _BIG_PACK_CACHE[key] = ent
    pack, cids, ccx, ccy = ent
    if len(t) == 0 or len(cids) == 0:
        return empty
    sx = t["x"].to_numpy()
    sy = t["y"].to_numpy()
    sid = t["stem_id"].to_numpy(zero_copy_only=False)
    skey = _stem_sort_key(sx, sy)
    order = np.argsort(skey, kind="stable")
    sx, sy, sid, skey = sx[order], sy[order], sid[order], skey[order]
    sid_rank = np.empty(len(sid), np.int64)
    sid_rank[np.argsort(sid, kind="stable")] = np.arange(len(sid))
    win_ring, win_pt, win_d = [], [], []
    for ring_ids, pt in _candidate_pairs(skey, sy, pack):
        inside = geom.points_in_rings_pairs(sx[pt], sy[pt], ring_ids, pack)
        if not inside.any():
            continue
        ring_ids, pt = ring_ids[inside], pt[inside]
        d = np.hypot(sx[pt] - ccx[ring_ids], sy[pt] - ccy[ring_ids])
        sel = np.lexsort((sid_rank[pt], d, ring_ids))
        first = sel[np.r_[True, ring_ids[sel][1:] != ring_ids[sel][:-1]]]
        win_ring.append(ring_ids[first])
        win_pt.append(pt[first])
        win_d.append(d[first])
    if not win_ring:
        return empty
    ring_ids = np.concatenate(win_ring)
    pt = np.concatenate(win_pt)
    return pa.table({
        "crown_id": pa.array(cids[ring_ids], pa.string()),
        "stem_id": pa.array(sid[pt], pa.string()),
        "dist": pa.array(np.concatenate(win_d), pa.float64()),
    })


def _hot_cells(stems, res: int):
    """Broadcastable (sorted cell keys, per-cell salt count) table —
    the 'stem-count histogram per cell' pass, estimated from a
    deterministic sample so the pre-pass costs one narrow read, never a
    shuffle. Which cells get salted (and how finely) is a pure
    partitioning choice (output rows are identical under any salting),
    so a sampled estimate is safe: a missed hot cell only costs
    straggler time, a false positive only a few replicated stem rows.

    Returns (ray.ObjectRef[(keys, ks)], extra_stem_rows_estimate) —
    the estimate feeds the shuffle partition-count sizing."""
    import ray

    sh = _stem_cell_hist(stems, res)
    return _salt_table(sh, None)


def _stem_cell_hist(stems, res: int):
    """Sampled per-cell stem-count histogram: (keys u64 sorted, est
    f64). One narrow sampled read, no shuffle."""
    n = stems.count()  # parquet metadata count — no scan
    frac = min(1.0, _HOT_SAMPLE_ROWS / max(1, n))
    sample = stems.select_columns(["x", "y"])
    if frac < 1.0:
        sample = sample.random_sample(frac, seed=0)
    df = sample.to_pandas()
    if df.empty:  # empty input (may arrive schema-less): no hot cells
        return np.array([], np.uint64), np.array([], np.float64)
    key = cells.cell_of(df["x"].to_numpy(), df["y"].to_numpy(), res)
    uniq, cnt = np.unique(key, return_counts=True)
    return uniq.astype(np.uint64), cnt / frac


# Per-(sub)group pair-work budget for the crown-aware salt rule: the
# vectorized pair kernel clears ~25M bbox-candidate pairs in
# ~0.2-0.6 s. stem_est × crown_est per cell is the candidate-pair
# proxy; k splits CROWNS while stems replicate, so per-sub-group work
# ≈ stem_est × crown_est / k ≤ budget.
PAIR_SALT_BUDGET = 25e6


def _salt_table(stem_hist, crown_hist):
    """Driver-side salt-table build from the sampled histograms:
    (ray.ObjectRef[(keys, ks)], extra_stem_rows_estimate).

    Two escalation rules, max wins: the legacy stem-count rule
    (k ∝ est/T, ^1.5 in the extreme tail) and — when a crown
    histogram is supplied — the PAIR rule k = ceil(stem_est ×
    crown_est / PAIR_SALT_BUDGET). The pair rule is what actually
    bounds the kernel tail in clustered inputs: cluster-core cells
    hold ~4× more crown CENTROIDS than stems (owner keying), so a
    stem-only rule leaves one ~650M-pair sub-group per core — a
    measured 2.8 s straggler task at 3.84M/32 CPUs while the mean
    task was 0.6 s. Which cells get salted (and how finely) is a pure
    partitioning choice — output rows are identical under any
    salting — so sampled estimates are safe."""
    import ray

    uniq, est = stem_hist
    if len(uniq) == 0:
        return ray.put(
            (np.array([], np.uint64), np.array([], np.int64))
        ), 0.0
    if crown_hist is not None and len(crown_hist[0]):
        ck, cest = crown_hist
        pos = np.clip(np.searchsorted(ck, uniq), 0, len(ck) - 1)
        crown_est = np.where(ck[pos] == uniq, cest[pos], 0.0)
    else:
        crown_est = np.zeros(len(uniq), np.float64)
    k_pair = np.ceil(est * crown_est / PAIR_SALT_BUDGET)
    hot = (est > HOT_CELL_THRESHOLD) | (k_pair >= 2)
    # Per-group PIP work in a hot cell scales like stems × crowns ×
    # local density ∝ est² (dense clusters pack both join sides into
    # the same cell), and crowns split across salts while stems
    # replicate — so k ∝ est only equalizes ROWS, leaving one
    # ~est²-pair straggler group per cluster core (measured 15M-pair
    # / 16 s tasks at 15.36M stems). Fix: k ∝ ~(est/threshold)^1.5
    # for the EXTREME tail (est ≥ HOT_CELL_EXTREME) — between the
    # linear row-equalizing rule and a full pair-equalizing square,
    # measured best on the clustered input; mid-tier hot cells keep
    # the linear rule — a blanket superlinear k would multiply the
    # whole exchange (est·k extra stem rows per cell), while the
    # extreme tail is only a handful of cluster-core cells.
    eh = np.maximum(est[hot] / HOT_CELL_THRESHOLD, 1.0)
    k_rows = np.where(est[hot] >= HOT_CELL_EXTREME,
                      np.ceil(eh ** 1.5), np.ceil(eh))
    ks = np.minimum(np.maximum(k_rows, k_pair[hot]),
                    N_SALT_MAX).astype(np.int64)
    keys = uniq[hot].astype(np.uint64)  # np.unique output is sorted
    extra = float(np.sum(est[hot] * (ks - 1)))
    return ray.put((keys, ks)), extra


def _cell_salt_k(hot, keys: np.ndarray, salt_all: bool) -> np.ndarray:
    """Per-row salt count for each row's cell key: adaptive table
    lookup (sorted-array searchsorted), 1 where not hot; blanket
    N_SALT when salt_all."""
    if salt_all:
        return np.full(len(keys), N_SALT, np.int64)
    if hot is None:
        return np.ones(len(keys), np.int64)
    hk, kv = hot
    if len(hk) == 0:
        return np.ones(len(keys), np.int64)
    pos = np.clip(np.searchsorted(hk, keys), 0, len(hk) - 1)
    return np.where(hk[pos] == keys, kv[pos], 1).astype(np.int64)


def _stem_side(batch: pa.Table, res: int, hot_ref=None, salt_all=True) -> pa.Table:
    import ray

    batch = attach_cell(batch, res=res)
    hot = ray.get(hot_ref) if hot_ref is not None else None
    key = batch["cell"].to_numpy()
    # hot-cell stems replicate to every salt of their cell (adaptive
    # count); cold stems stay single
    reps = _cell_salt_k(hot, key, salt_all)
    idx = np.repeat(np.arange(len(batch)), reps)
    starts = np.cumsum(reps) - reps
    salt = (np.arange(len(idx)) - np.repeat(starts, reps)).astype(np.int8)
    batch = batch.take(pa.array(idx))
    n = len(batch)
    return pa.table(
        {
            "side": pa.array(np.zeros(n, np.int8)),
            # (cell, salt) fused then scrambled (bijective) so hot
            # spatial clusters AND a hot cell's salt sub-groups spread
            # across range partitions — see cells.fused_group_key
            "cell": pa.array(
                cells.fused_group_key(batch["cell"].to_numpy(), salt),
                pa.uint64(),
            ),
            "id": batch["stem_id"],
            "payload": _pack_xy(batch["x"].to_numpy(),
                                batch["y"].to_numpy()),
        },
        schema=_UNION_SCHEMA,
    )


def _crown_side(batch: pa.Table, res: int, hot_ref=None, salt_all=True) -> pa.Table:
    import ray

    hot = ray.get(hot_ref) if hot_ref is not None else None
    idx, keys = cells.cells_covering_arrays(
        batch["minx"].to_numpy(),
        batch["miny"].to_numpy(),
        batch["maxx"].to_numpy(),
        batch["maxy"].to_numpy(),
        res,
    )
    # spans >1 cell ⇔ replicated more than once (vectorized)
    reps = np.bincount(idx, minlength=len(batch))
    k = _cell_salt_k(hot, keys, salt_all)
    salts = _salt_of(
        batch["crown_id"].to_numpy(zero_copy_only=False)[idx], k
    )
    taken = batch.take(pa.array(idx))
    n = len(taken)
    return pa.table(
        {
            "side": pa.array(np.ones(n, np.int8)),
            "cell": pa.array(cells.fused_group_key(keys, salts), pa.uint64()),
            "id": taken["crown_id"],
            "payload": pack_crown_blobs(taken, multi=(reps > 1)[idx]),
        },
        schema=_UNION_SCHEMA,
    )


def _stem_side_owner(batch: pa.Table, res: int, mx: float, my: float,
                     hot_ref=None, salt_all=True) -> pa.Table:
    """Owner-mode stem side: each stem replicates to every cell its
    margin box [x−mx, x+mx] × [y−my, y+my] touches — the inverse of
    halo mode's crown replication. Every crown that can contain the
    stem has its centroid within that box, so the pair meets in the
    crown's owner cell and the per-cell argmin is already the GLOBAL
    winner (no second exchange)."""
    import ray

    sx = batch["x"].to_numpy()
    sy = batch["y"].to_numpy()
    idx, keys = cells.cells_covering_arrays(sx - mx, sy - my, sx + mx, sy + my, res)
    taken = batch.take(pa.array(idx))
    hot = ray.get(hot_ref) if hot_ref is not None else None
    reps = _cell_salt_k(hot, keys, salt_all)
    idx2 = np.repeat(np.arange(len(taken)), reps)
    starts = np.cumsum(reps) - reps
    salt = (np.arange(len(idx2)) - np.repeat(starts, reps)).astype(np.int8)
    taken = taken.take(pa.array(idx2))
    keys2 = keys[idx2]
    n = len(taken)
    return pa.table(
        {
            "side": pa.array(np.zeros(n, np.int8)),
            "cell": pa.array(cells.fused_group_key(keys2, salt), pa.uint64()),
            "id": taken["stem_id"],
            "payload": _pack_xy(taken["x"].to_numpy(),
                                taken["y"].to_numpy()),
        },
        schema=_UNION_SCHEMA,
    )


def _crown_side_owner(batch: pa.Table, res: int, hot_ref=None,
                      salt_all=True, max_reach=None) -> pa.Table:
    """Owner-mode crown side: exactly ONE row per crown, keyed by its
    centroid's cell (the ownership rule — SURVEY.md §7.4 halo
    correctness). No replication, no ``multi`` duplicate resolution.
    With ``max_reach=(mx, my)``, crowns reaching beyond it are DROPPED
    here — they take the outlier broadcast path instead (see
    assign_stems_to_crowns)."""
    import ray

    if max_reach is not None and len(batch):
        cx = batch["cx"].to_numpy()
        cy = batch["cy"].to_numpy()
        rx = np.maximum(cx - batch["minx"].to_numpy(),
                        batch["maxx"].to_numpy() - cx)
        ry = np.maximum(cy - batch["miny"].to_numpy(),
                        batch["maxy"].to_numpy() - cy)
        keep = (rx <= max_reach[0]) & (ry <= max_reach[1])
        if not keep.all():
            batch = batch.filter(pa.array(keep))
    keys = cells.cell_of(batch["cx"].to_numpy(), batch["cy"].to_numpy(), res)
    n = len(batch)
    hot = ray.get(hot_ref) if hot_ref is not None else None
    k = _cell_salt_k(hot, keys, salt_all)
    salts = _salt_of(batch["crown_id"].to_numpy(zero_copy_only=False), k)
    return pa.table(
        {
            "side": pa.array(np.ones(n, np.int8)),
            "cell": pa.array(cells.fused_group_key(keys, salts), pa.uint64()),
            "id": batch["crown_id"],
            "payload": pack_crown_blobs(batch),
        },
        schema=_UNION_SCHEMA,
    )


_YBUCKET_M = 8.0  # ~median crown diameter; crowns span ≤ 3 buckets
_YKEY_STRIDE = float(1 << 21)  # > world extent → composite key is exact


def _candidate_pairs(skey: np.ndarray, sy: np.ndarray, pack,
                     max_block_pairs: int = 1_000_000):
    """Vectorized 2-D bbox prefilter for ALL (crown, stem) pairs of a
    partition at once (replaces the per-crown grid-index probe loop,
    whose ~0.4 ms/probe numpy fixed cost dominated the join stage).

    ``skey`` must be the ASCENDING composite key
    ``ybucket(y) * _YKEY_STRIDE + x`` (see :func:`_stem_sort_key`) —
    stems ordered by (y-bucket, x). Each crown probes only the ≤3
    y-buckets its bbox spans, via one array ``searchsorted`` over all
    (crown, bucket) rows; without the y-bucketing, an x-only slice
    explodes ~#stems × crown-width/cell-width candidates per crown,
    which made dense skew cells (10⁴ stems) multi-second tasks. The
    exact y cut is applied to the exploded pair list (x is exact from
    the searchsorted bounds). Crown bboxes come from the edge pack via
    ``minimum.reduceat`` — no per-ring Python. Yields
    ``(ring_ids, pt_idx)`` chunks with bounded pair-explosion memory.
    """
    vx, vy, _, _, lens, starts = pack
    if len(lens) == 0 or len(skey) == 0:
        return
    yield from _bbox_candidate_pairs(
        skey, sy,
        np.minimum.reduceat(vx, starts), np.minimum.reduceat(vy, starts),
        np.maximum.reduceat(vx, starts), np.maximum.reduceat(vy, starts),
        max_block_pairs,
    )


def _bbox_candidate_pairs(skey: np.ndarray, sy: np.ndarray,
                          minx: np.ndarray, miny: np.ndarray,
                          maxx: np.ndarray, maxy: np.ndarray,
                          max_block_pairs: int = 1_000_000):
    """bbox-rectangle variant of :func:`_candidate_pairs` (same probe,
    boxes given directly — used by the lidar range join). Yields exact
    bbox-hit ``(box_ids, pt_idx)`` chunks; within a chunk ``box_ids``
    is non-decreasing and a box never spans two chunks."""
    n_crowns = len(minx)
    if n_crowns == 0 or len(skey) == 0:
        return
    b0 = np.floor(miny / _YBUCKET_M).astype(np.int64)
    b1 = np.floor(maxy / _YBUCKET_M).astype(np.int64)
    nb = b1 - b0 + 1
    n_cb = int(nb.sum())
    # explode crowns × spanned y-buckets
    crow = np.repeat(np.arange(n_crowns), nb)
    cbucket = (np.arange(n_cb) - np.repeat(np.cumsum(nb) - nb, nb)) + b0[crow]
    lo = np.searchsorted(skey, cbucket * _YKEY_STRIDE + minx[crow], side="left")
    hi = np.searchsorted(skey, cbucket * _YKEY_STRIDE + maxx[crow], side="right")
    cnt = hi - lo
    csum = np.cumsum(cnt)
    # split (crown, bucket) rows into blocks of ≤ max_block_pairs
    # exploded candidates; a crown's buckets stay within one block so
    # downstream per-crown reduces see each crown exactly once
    block_ends = []
    pos = 0
    while pos < n_cb:
        end = int(np.searchsorted(csum, (csum[pos - 1] if pos else 0) + max_block_pairs,
                                  side="right"))
        end = max(end, pos + 1)
        # round the block end UP to a crown boundary
        while end < n_cb and crow[end] == crow[end - 1]:
            end += 1
        block_ends.append((pos, min(end, n_cb)))
        pos = min(end, n_cb)
    for p0, p1 in block_ends:
        c = cnt[p0:p1]
        total = int(c.sum())
        if total == 0:
            continue
        ring_ids = crow[p0:p1].repeat(c)
        off = np.arange(total) - np.repeat(np.cumsum(c) - c, c)
        pt = np.repeat(lo[p0:p1], c) + off
        keep = (sy[pt] >= miny[ring_ids]) & (sy[pt] <= maxy[ring_ids])
        if keep.any():
            yield ring_ids[keep], pt[keep]


def _stem_sort_key(sx: np.ndarray, sy: np.ndarray) -> np.ndarray:
    """Composite (y-bucket, x) sort key for :func:`_candidate_pairs`.
    Exact in float64: bucket ≤ 2^17, stride 2^21, x < 2^20 → key < 2^38."""
    return np.floor(sy / _YBUCKET_M) * _YKEY_STRIDE + sx


def _assign_cell(group: pa.Table) -> pa.Table:
    """Per-cell kernel: PIP + local nearest-stem partial argmin —
    fully vectorized (array searchsorted candidates + pair-level
    multi-ring PIP; no per-crown Python loop)."""
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
    sx, sy = _unpack_xy(stems["payload"])
    sid = stems["id"].to_numpy(zero_copy_only=False)
    skey = _stem_sort_key(sx, sy)
    order = np.argsort(skey, kind="stable")  # ties broken by (d, id) below
    sx, sy, sid, skey = sx[order], sy[order], sid[order], skey[order]
    # integer rank of each stem's id, computed ONCE per group: the
    # (dist, stem_id) tie-break below lexsorts PER PAIR, and dense
    # cluster-core groups carry millions of inside-pairs — lexsort on
    # the Python-object string array was 60% of the straggler task
    # (measured 1.5 s of a 2.5 s group at 3.84M; ints sort ~20×
    # faster and give the identical order)
    sid_rank = np.empty(len(sid), np.int64)
    sid_rank[np.argsort(sid, kind="stable")] = np.arange(len(sid))
    ccx, ccy, cmulti, pack = crown_pack_from_blob(crowns["payload"])
    cids = crowns["id"].to_numpy(zero_copy_only=False)
    win_ring: list[np.ndarray] = []
    win_pt: list[np.ndarray] = []
    win_d: list[np.ndarray] = []
    for ring_ids, pt in _candidate_pairs(skey, sy, pack):
        inside = geom.points_in_rings_pairs(sx[pt], sy[pt], ring_ids, pack)
        if not inside.any():
            continue
        ring_ids, pt = ring_ids[inside], pt[inside]
        d = np.hypot(sx[pt] - ccx[ring_ids], sy[pt] - ccy[ring_ids])
        # deterministic (dist, stem_id) argmin per crown, vectorized:
        # sort pairs by (ring, d, id) and keep each ring's first row
        sel = np.lexsort((sid_rank[pt], d, ring_ids))
        first = sel[np.r_[True, ring_ids[sel][1:] != ring_ids[sel][:-1]]]
        win_ring.append(ring_ids[first])
        win_pt.append(pt[first])
        win_d.append(d[first])
    if not win_ring:
        return empty
    ring_ids = np.concatenate(win_ring)
    pt = np.concatenate(win_pt)
    d = np.concatenate(win_d)
    return pa.table(
        {
            "crown_id": pa.array(cids[ring_ids], pa.string()),
            "stem_id": pa.array(sid[pt], pa.string()),
            "dist": pa.array(d, pa.float64()),
            "multi": pa.array(cmulti[ring_ids], pa.bool_()),
        }
    )


def _final_pick_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized duplicate resolution after halo replication: global
    (dist, stem_id) argmin per crown across its ≤#covered-cells
    partial winners."""
    df = df.sort_values(["crown_id", "dist", "stem_id"], kind="stable")
    return df.drop_duplicates("crown_id", keep="first")


def _kernel_partitions(est_bytes: float) -> int:
    """Sort-partition count for the assign exchange: the generic
    sqrt(bytes) rule sizes for SORT cost alone, but here every output
    partition is also one PIP-kernel task whose work is pairs — far
    spikier than rows (measured at 3.84M/32 CPUs: 71 partitions, task
    range 0.36–3.62 s, the 10× straggler tail alone ~1.5 s of the
    12 s wall). Floor the count at 2× the default partitions
    (≈ 4 × cluster CPUs) so the tail amortizes, bounded by ~8 MiB
    blocks so small inputs don't pay barrier overhead for parallelism
    they can't use."""
    from .relational import _cpu_default_partitions, shuffle_partitions_for

    base = shuffle_partitions_for(est_bytes)
    cpu_floor = min(2 * _cpu_default_partitions(),
                    int(est_bytes / (8 * 1024 * 1024)) + 1)
    return max(base, cpu_floor)


def assign_stems_to_crowns(stems, crowns, res: int = cells.DEFAULT_RES,
                           salt_mode: str = "hot", mode: str = "owner",
                           margin: tuple[float, float] | None = None):
    """Returns (assignment_ds, unassigned_ds).

    salt_mode: 'hot' (default — a sampled count pass finds cells above
    HOT_CELL_THRESHOLD and only those are salted, so the shuffle grows
    only where the skew is), 'all' (blanket N_SALT fan-out, no
    pre-pass — pays ~N_SALT× stem shuffle volume), or 'none'.

    mode: 'owner' (default) keys each crown to its centroid's cell and
    halo-replicates STEMS by the global max crown reach (``margin``,
    computed by a narrow combiner scan when not given) — every
    (crown, contained-stem) pair meets in exactly one group, so the
    assignment needs ONE all-to-all exchange. 'halo' is the inverse
    (crowns replicate to bbox-covering cells; a second hash-bucketed
    exchange resolves cross-cell duplicates) — cheaper when a few huge
    outlier crowns would blow up the global stem margin.

    assignment: (crown_id, stem_id, dist) — one row per crown that
    contains ≥1 stem. unassigned: (stem_id) — distinct stems no crown
    selected. Interior rings (holed crowns, e.g. the reference's
    ``difference`` outputs) are honored: the crown blob carries every
    loop and the PIP parity excludes stems inside holes.
    """
    want_hot = salt_mode == "hot"
    want_reach = mode == "owner" and margin is None
    if want_hot and want_reach:
        # the two driver pre-passes (sampled stem histogram, crown
        # reach + cell-histogram combiner) scan DIFFERENT tables but
        # are each ~driver latency, not CPU — ONE tag-unioned Dataset
        # execution pays the plan/schedule/collect round once instead
        # of twice (r4 ran them as two threaded executions; the fixed
        # non-scaling wall was still ~2 executions' worth and set the
        # small-input efficiency floor — VERDICT r4 #4). The crown
        # histogram rides the reach scan, so the pair-aware salt rule
        # costs no third pass.
        _sh, mx_, my_, qx_, qy_, _crown_hist = _fused_prepass(
            stems, crowns, res)
        hot_ref, hot_extra = _salt_table(_sh, _crown_hist)
        _reach = (mx_, my_, qx_, qy_)
    else:
        hot_ref, hot_extra = _hot_cells(stems, res) if want_hot else (None, 0.0)
        _reach = _reach_stats(crowns) if want_reach else None
    salt_all = salt_mode == "all"
    from .relational import (
        bucketed_reduce,
        shuffle_partitions_for,
        sorted_group_map,
        uniform_uint64_boundaries,
    )

    n_stems = stems.count()  # parquet metadata — no scan
    n_crowns = crowns.count()
    edge = cells.cell_edge_m(res)

    def _union_bytes(mx: float, my: float) -> float:
        """Sort-exchange size estimate to pick the partition count:
        stems replicate by the margin-box covering factor plus the
        measured hot-cell salt fan-out; crown rows carry packed rings
        (~row const + ring bytes). Only block SIZING depends on this —
        correctness never does."""
        cover = (1.0 + 2.0 * mx / edge) * (1.0 + 2.0 * my / edge)
        mult = N_SALT if salt_all else 1.0
        stem_rows = n_stems * cover * mult + (0 if salt_all else hot_extra)
        # per-row constants re-measured for the 4-column slim schema
        # (tools/measure_exchange.py @960k: stem row 41.0 B Arrow +
        # block overheads, crown row 187.1 B — the r4 7-column schema
        # paid 45.3 / 207.5 in dead null slots; union 345 → 312 MB)
        return stem_rows * 63.0 + n_crowns * 287.0

    if mode == "owner":
        import ray

        big_ref = None
        if margin is not None:
            mx, my = margin
        else:
            mx, my, qx, qy = _reach
            if (qx <= _REACH_SPLIT_RATIO * mx
                    or qy <= _REACH_SPLIT_RATIO * my):
                # outlier split: crowns with reach beyond the high
                # quantile broadcast instead of inflating every stem's
                # margin box (a single monster crown otherwise sets
                # the replication factor for the whole exchange)
                big_tbl = _collect_big_crowns(crowns, qx, qy)
                if 0 < len(big_tbl) <= BIG_BROADCAST_MAX:
                    big_ref = ray.put(big_tbl)
                    mx, my = qx, qy
        parts = _kernel_partitions(_union_bytes(mx, my))
        # side-builder OUTPUT block count feeds the sort's all-to-all:
        # Ray's range exchange creates #input-blocks × #partitions
        # intermediate objects, so 400 small side blocks against 128
        # partitions is 51k objects of pure per-object overhead
        # (measured ~2-3 s of the 12 s wall at 3.84M/32 CPUs).
        # batch_size bundles multiple input files into one map task →
        # one fat block each; ~2 side blocks per sort partition keeps
        # every reduce fetch meaningful. Blocks stay ≤ ~32 MB.
        sbatch = max(16384, int(n_stems / 32) + 1)
        cbatch = max(16384, int(n_crowns / 32) + 1)
        s = stems.select_columns(["stem_id", "x", "y"]).map_batches(
            _stem_side_owner, batch_format="pyarrow", batch_size=sbatch,
            fn_kwargs={"res": res, "mx": mx, "my": my,
                       "hot_ref": hot_ref, "salt_all": salt_all},
        )
        c = crowns.select_columns(_crown_cols(crowns)).map_batches(
            _crown_side_owner, batch_format="pyarrow", batch_size=cbatch,
            fn_kwargs={"res": res, "hot_ref": hot_ref,
                       "salt_all": salt_all,
                       "max_reach": (mx, my) if big_ref is not None
                       else None},
        )
        # each crown lives in exactly one group → the per-group
        # (dist, stem_id) argmin IS the global winner; project off the
        # dormant 'multi' column in the same fused stage
        # the fused mix64 key is uniform ⇒ analytic boundaries: ONE
        # all-to-all barrier, no sample round, no pre-coalesce
        assignment = sorted_group_map(
            s.union(c), ["cell"], _assign_cell, partitions=parts,
            boundaries=uniform_uint64_boundaries(parts),
        ).select_columns(["crown_id", "stem_id", "dist"])
        if big_ref is not None:
            # outlier crowns: map-side broadcast join over the stems
            # scan + one tiny grouped reduce (partials ≪ stems)
            partials = stems.select_columns(["stem_id", "x", "y"]).map_batches(
                _big_crown_partials, batch_format="pyarrow",
                fn_kwargs={"big_ref": big_ref},
            )
            big_asgn = bucketed_reduce(partials, "crown_id",
                                       _final_pick_bucket)
            assignment = assignment.union(big_asgn)
    else:
        parts = shuffle_partitions_for(_union_bytes(6.0, 6.0))
        s = stems.select_columns(["stem_id", "x", "y"]).map_batches(
            _stem_side, batch_format="pyarrow",
            fn_kwargs={"res": res, "hot_ref": hot_ref, "salt_all": salt_all},
        )
        c = crowns.select_columns(_crown_cols(crowns)).map_batches(
            _crown_side, batch_format="pyarrow",
            fn_kwargs={"res": res, "hot_ref": hot_ref, "salt_all": salt_all},
        )
        candidates = sorted_group_map(
            s.union(c), ["cell"], _assign_cell, partitions=parts,
            boundaries=uniform_uint64_boundaries(parts),
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
    sx, sy = _unpack_xy(stems["payload"])
    sid = stems["id"].to_numpy(zero_copy_only=False)
    skey = _stem_sort_key(sx, sy)
    order = np.argsort(skey, kind="stable")
    sx, sy, sid, skey = sx[order], sy[order], sid[order], skey[order]
    _ccx, _ccy, _m, pack = crown_pack_from_blob(crowns["payload"])
    cids = crowns["id"].to_numpy(zero_copy_only=False)
    out_c, out_s = [], []
    for ring_ids, pt in _candidate_pairs(skey, sy, pack):
        inside = geom.points_in_rings_pairs(sx[pt], sy[pt], ring_ids, pack)
        if inside.any():
            out_c.append(cids[ring_ids[inside]])
            out_s.append(sid[pt[inside]])
    if not out_c:
        return pa.table(
            {"crown_id": pa.array([], pa.string()),
             "stem_id": pa.array([], pa.string())}
        )
    return pa.table(
        {"crown_id": pa.array(np.concatenate(out_c), pa.string()),
         "stem_id": pa.array(np.concatenate(out_s), pa.string())}
    )


def pip_join_pairs(stems, crowns, res: int = cells.DEFAULT_RES):
    """(crown_id, stem_id) — every point-in-polygon containment pair
    (the spatial inner join itself, without the nearest-stem reduce)."""
    from .relational import sorted_group_map, uniform_uint64_boundaries

    # no salting: the vectorized pair kernel keeps even dense cells to
    # sub-second tasks, and the pair join has no per-crown reduce to
    # protect — skip the replication volume entirely
    s = stems.select_columns(["stem_id", "x", "y"]).map_batches(
        _stem_side, batch_format="pyarrow",
        fn_kwargs={"res": res, "salt_all": False},
    )
    c = crowns.select_columns(_crown_cols(crowns)).map_batches(
        _crown_side, batch_format="pyarrow",
        fn_kwargs={"res": res, "salt_all": False},
    )
    from .relational import auto_partitions

    parts = auto_partitions(stems, crowns) or 0
    return sorted_group_map(
        s.union(c), ["cell"], _pairs_cell, partitions=parts or None,
        boundaries=uniform_uint64_boundaries(parts) if parts > 1 else None,
    )


def candidate_pairs_schema() -> pa.Schema:
    return pa.schema(
        [("crown_id", pa.string()), ("stem_id", pa.string()), ("dist", pa.float64())]
    )
