"""Similarity search over an embedding column (``list<float>``).

- ``ann_bruteforce_topk``: exact cosine top-k — the query matrix is
  broadcast ONCE via ``ray.put`` and read in each task; each batch does
  one numpy matmul and emits its per-batch partial top-k; a final tiny
  groupby merges partials. Never materializes the dataset.
- ``ann_ivf_topk``: IVF scale path — coarse centroids (k-means on a
  driver-side sample), vectors bucketed by nearest centroid
  (one pass), queries probe only ``nprobe`` nearest buckets.

Determinism: fixed seeds; ties broken by vec_id asc.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["ann_bruteforce_topk", "ann_ivf_topk", "train_centroids",
           "label_centroids", "kmeans_lloyd"]


def _as_matrix(col) -> np.ndarray:
    return np.stack(col.to_numpy()).astype(np.float64)


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n == 0, 1, n)


def ann_bruteforce_topk(embeddings, queries: np.ndarray, k: int = 10,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        quantize: int | None = None):
    """(query_id, vec_id, sim, rank) — exact cosine top-k per query row
    of ``queries`` (q, dim). Partial top-k per batch → merge.

    ``quantize``: when set (e.g. 10**6), similarities are ranked and
    emitted as integers floor(sim·quantize + 0.5) in a ``sim_q``
    column — bit-identical across engines whose float accumulation
    order differs (the cross-engine oracle mode)."""
    import ray

    qref = ray.put(_unit(np.asarray(queries, dtype=np.float64)))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(qref)
        vecs = _unit(_as_matrix(df[vec_col]))
        sims = vecs @ q.T  # (n, nq)
        ids = df[id_col].to_numpy()
        out = {"query_id": [], "vec_id": [], "sim": []}
        kk = min(k, len(ids))
        for qi in range(q.shape[0]):
            s = sims[:, qi]
            if quantize:
                s = np.floor(s * quantize + 0.5)
            else:
                s = np.round(s, 9)
            part = np.lexsort((ids, -s))[:kk]
            out["query_id"].extend([qi] * len(part))
            out["vec_id"].extend(ids[part])
            out["sim"].extend(s[part])
        return pd.DataFrame(
            {
                "query_id": np.array(out["query_id"], np.int64),
                "vec_id": np.array(out["vec_id"], np.int64),
                "sim": np.array(out["sim"], np.float64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True], kind="stable")
        g = g.head(k).reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        if quantize:
            g = g.rename(columns={"sim": "sim_q"})
            g["sim_q"] = g["sim_q"].astype("int64")
        return g

    return (
        embeddings.map_batches(partial, batch_format="pandas")
        .groupby("query_id")
        .map_groups(merge, batch_format="pandas")
    )


def label_centroids(embeddings, label_col: str = "label",
                    vec_col: str = "embedding"):
    """Per-class mean embedding (class centroids — the vector-column
    analogue of a grouped mean, used for prototype/centroid classifiers
    over training corpora). Output: one row per (label, dim) with the
    centroid component as double.

    Combiner pattern over the vector column: each batch reduces its
    rows to (label, dim, sum_micro, n) partials — exact int64
    micro-unit sums, so the reduce is order-insensitive and matches
    the SQL oracle bit-for-bit — and only labels × dims slim rows
    enter the shuffle, never the vectors."""
    from .relational import grouped_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        micro = np.floor(m * 1e6 + 0.5).astype(np.int64)
        labels = df[label_col].to_numpy()
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), m.shape[1]), np.int64)
        np.add.at(sums, inv, micro)
        counts = np.bincount(inv, minlength=len(uniq))
        dims = m.shape[1]
        return pd.DataFrame(
            {
                "label": np.repeat(uniq.astype(np.int64), dims),
                "dim": np.tile(np.arange(dims, dtype=np.int64), len(uniq)),
                "s": sums.ravel(),
                "n": np.repeat(counts.astype(np.int64), dims),
            }
        )

    partials = embeddings.map_batches(partial, batch_format="pandas")
    agg = grouped_agg(partials, ["label", "dim"], {"s": "s", "n": "n"})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "label": df["label"].astype("int64"),
                "dim": df["dim"].astype("int64"),
                "centroid": (df["s"] / df["n"]) / 1e6,
            }
        )

    return agg.map_batches(finish, batch_format="pandas")


def kmeans_lloyd(embeddings, k: int = 8, iters: int = 5,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
    """Distributed Lloyd's k-means over the full table (iterative
    algorithm pattern): per iteration the k×dim centroid matrix is
    broadcast once (``ray.put``) and one streaming ``map_batches`` pass
    emits per-batch partials — k slim rows of exact int64 micro-unit
    sums + counts — which the driver reduces (k × #batches rows, never
    the data). Exact integer partials make the reduce order-insensitive,
    so centroids (and therefore assignments) are bit-identical at any
    parallelism — the same determinism contract as the scaling bench.

    Init: the k rows with smallest ``id_col`` (deterministic, no RNG),
    found by a per-block smallest-k fold — k rows per block reach the
    driver, never a global sort.
    Distance: squared Euclidean, argmin ties → lowest cluster index.
    Empty clusters keep their previous centroid.

    Returns (assignments Dataset of (id, cluster), centroids ndarray).
    The input is NEVER materialized: every Lloyd pass re-streams the
    (id, vec) projection from the source with backpressure, so the
    working set per iteration is one batch per worker — at 100 TB the
    object store holds blocks in flight, not the whole table (re-read
    cost ≪ the spill storm a full materialize() causes)."""
    import ray

    ds = embeddings.select_columns([id_col, vec_col])
    # exact global k-smallest-by-id seeds via staged partial top-k
    # (per-batch → per-merged-block → driver): the driver collect is
    # ≤ 8k rows regardless of batch count (a raw collect of per-batch
    # top-k grew as k × batches — vectors included)
    init = (
        ds.map_batches(lambda df: df.nsmallest(k, id_col),
                       batch_format="pandas")
        .repartition(8)
        .map_batches(lambda df: df.nsmallest(k, id_col),
                     batch_format="pandas")
        .to_pandas().nsmallest(k, id_col).sort_values(id_col)
    )
    cent = np.stack(init[vec_col].to_numpy()).astype(np.float64)

    def _argmin(x: np.ndarray, c: np.ndarray) -> np.ndarray:
        d = (x * x).sum(1)[:, None] - 2.0 * (x @ c.T) + (c * c).sum(1)[None, :]
        return np.argmin(d, axis=1)

    for _ in range(iters):
        ref = ray.put(cent)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(ref)
            x = np.stack(df[vec_col].to_numpy()).astype(np.float64)
            a = _argmin(x, c)
            micro = np.floor(x * 1e6 + 0.5).astype(np.int64)
            sums = np.zeros((k, x.shape[1]), np.int64)
            np.add.at(sums, a, micro)
            return pd.DataFrame(
                {
                    "c": np.arange(k, dtype=np.int64),
                    "n": np.bincount(a, minlength=k).astype(np.int64),
                    "s": list(sums),
                }
            )

        # distributed fold of the k-row per-batch partials (the raw
        # collect grew as k × batch count — multi-GB at the 100-TB
        # target); integer sums are order-free, so the bucketed
        # reduce is exact and the driver sees exactly k rows
        def fold(df: pd.DataFrame) -> pd.DataFrame:
            out_c, out_n, out_s = [], [], []
            for ci, grp in df.groupby("c", sort=False):
                out_c.append(ci)
                out_n.append(int(grp["n"].sum()))
                out_s.append(np.sum(np.stack(grp["s"].to_numpy())
                                    .astype(np.int64), axis=0))
            return pd.DataFrame({"c": out_c, "n": out_n, "s": out_s})

        from .relational import bucketed_reduce

        parts = bucketed_reduce(
            ds.map_batches(partial, batch_format="pandas"), "c", fold
        ).to_pandas()
        for row in parts.itertuples():
            if row.n:
                s = np.asarray(row.s, dtype=np.int64)
                cent[int(row.c)] = (s / int(row.n)) / 1e6

    ref = ray.put(cent)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(ref)
        x = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {
                id_col: df[id_col].astype("int64"),
                "cluster": _argmin(x, c).astype("int64"),
            }
        )

    return ds.map_batches(assign, batch_format="pandas"), cent


def train_centroids(embeddings, n_centroids: int = 16, sample_n: int = 4096,
                    iters: int = 10, seed: int = 11,
                    vec_col: str = "embedding") -> np.ndarray:
    """Driver-side mini k-means on a deterministic sample (the IVF
    coarse quantizer). Sample = first ``sample_n`` rows by vec_id —
    stable across parallelism levels. Drawn via staged partial top-k
    (r5): identical rows to the old ``sort().limit()`` but without an
    all-to-all sort of the whole table just to take a bounded head."""
    sample = (
        embeddings.select_columns(["vec_id", vec_col])
        .map_batches(lambda df: df.nsmallest(sample_n, "vec_id"),
                     batch_format="pandas")
        .repartition(8)
        .map_batches(lambda df: df.nsmallest(sample_n, "vec_id"),
                     batch_format="pandas")
        .to_pandas().nsmallest(sample_n, "vec_id").sort_values("vec_id")
        .reset_index(drop=True)
    )
    x = _unit(_as_matrix(sample[vec_col]))
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                cent[c] = v / (np.linalg.norm(v) or 1.0)
    return cent


def ann_ivf_topk(embeddings, queries: np.ndarray, k: int = 10,
                 n_centroids: int = 16, nprobe: int = 4,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 centroids: np.ndarray | None = None):
    """IVF top-k: vectors partitioned by nearest centroid; each query
    scans only its ``nprobe`` closest buckets. Approximate (recall
    depends on nprobe/n_centroids); exact within probed buckets."""
    import ray

    if centroids is None:
        centroids = train_centroids(embeddings, n_centroids)
    q = _unit(np.asarray(queries, dtype=np.float64))
    # buckets each query probes
    probe = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]
    probe_sets = [set(map(int, row)) for row in probe]
    cref = ray.put(centroids)
    qref = ray.put(q)
    pref = ray.put(probe_sets)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cent = ray.get(cref)
        qm = ray.get(qref)
        probes = ray.get(pref)
        vecs = _unit(_as_matrix(df[vec_col]))
        ids = df[id_col].to_numpy()
        bucket = np.argmax(vecs @ cent.T, axis=1)
        out = {"query_id": [], "vec_id": [], "sim": []}
        for qi in range(qm.shape[0]):
            m = np.isin(bucket, list(probes[qi]))
            if not m.any():
                continue
            s = vecs[m] @ qm[qi]
            sel_ids = ids[m]
            kk = min(k, len(sel_ids))
            part = np.lexsort((sel_ids, -s))[:kk]
            out["query_id"].extend([qi] * len(part))
            out["vec_id"].extend(sel_ids[part])
            out["sim"].extend(np.round(s[part], 9))
        return pd.DataFrame(
            {
                "query_id": np.array(out["query_id"], np.int64),
                "vec_id": np.array(out["vec_id"], np.int64),
                "sim": np.array(out["sim"], np.float64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True], kind="stable")
        g = g.head(k).reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        return g

    return (
        embeddings.map_batches(partial, batch_format="pandas")
        .groupby("query_id")
        .map_groups(merge, batch_format="pandas")
    )
