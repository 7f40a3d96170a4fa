"""Deduplication family over a ``documents`` table — exact,
MinHash+LSH, SimHash, n-gram Jaccard — plus embedding-cosine near-dup
over an ``embeddings`` table. Built for the 100 TB shape:

- exact: content-hash inside map_batches → groupby(hash) → keep min id
  (one shuffle of (hash, id) pairs only, never text);
- MinHash LSH: signatures per batch (vectorized) → explode to
  (band_id, band_hash, doc_id) rows → groupby bands → candidate pairs
  → exact-Jaccard verify co-partitioned by pair (shingles recomputed
  from the pair's texts shipped via the band group — texts never
  broadcast);
- SimHash: 64-bit signature per doc, near-dup via 4-segment bucketing
  (Hamming ≤ 3 ⇒ one 16-bit segment equal);
- embedding near-dup: multi-table random-hyperplane LSH → slim
  candidate-pair shuffles → exact cosine verify (vectors never fan out
  per table).

Determinism: every hash seed is a fixed constant; outputs are exact
functions of the input rows, so N- and 4N-CPU runs emit identical rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["exact_dedup", "minhash_lsh_pairs", "simhash_pairs",
           "ngram_jaccard_pairs", "jaccard_of_texts", "embedding_near_dup",
           "phash_near_dup", "connected_components_dedup",
           "edit_distance_pairs"]


def _auto_parts(partitions, ds, scale: float = 1.0):
    """Default a dedup exchange's partition count from the input
    table's file metadata (see relational.auto_partitions): the slim
    rows these ops shuffle track input bytes × ``scale``. Explicit
    ``partitions`` always wins; non-file-backed inputs keep the
    CPU-count default."""
    if partitions is not None:
        return partitions
    from .relational import auto_partitions

    return auto_partitions(ds, scale=scale)


# ------------------------------------------------------------- exact

def exact_dedup(docs, partitions: int | None = None):
    """(doc_id, n_dups) — one row per distinct text: the minimum doc_id
    plus the duplicate count. Equivalent SQL:
    SELECT min(doc_id) AS doc_id, count(*) AS n_dups GROUP BY text."""
    partitions = _auto_parts(partitions, docs)
    import hashlib as _h

    def hash_stage(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "h": [_h.md5(t.encode()).hexdigest() for t in df["text"].fillna("")],
            }
        )

    def pick_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("h", sort=False)["doc_id"]
        out = g.agg(doc_id="min", n_dups="size").reset_index(drop=True)
        out["n_dups"] = out["n_dups"].astype("int64")
        return out

    from .relational import bucketed_reduce

    return bucketed_reduce(
        docs.map_batches(hash_stage, batch_format="pandas"), "h", pick_bucket,
        partitions=partitions,
    )


# ----------------------------------------------------------- shingles

_POLY_BASE = np.uint64(1099511628211)  # FNV prime as polynomial base


def _char_shingles(text: str, k: int) -> np.ndarray:
    """k-char shingles hashed to 64-bit ints — vectorized polynomial
    rolling hash over the whitespace-normalized byte string (sorted
    unique array; ~100× faster than per-shingle cryptographic hashes,
    which dominated the MinHash verify stage)."""
    t = " ".join(text.split()).encode()
    if len(t) == 0:
        return np.empty(0, dtype=np.uint64)
    a = np.frombuffer(t, dtype=np.uint8)
    if len(a) < k:
        pad = np.zeros(k, dtype=np.uint8)
        pad[: len(a)] = a
        a = pad
    win = np.lib.stride_tricks.sliding_window_view(a, k).astype(np.uint64)
    powers = np.empty(k, dtype=np.uint64)
    p = np.uint64(1)
    with np.errstate(over="ignore"):  # uint64 wraparound IS the modulus
        for i in range(k - 1, -1, -1):
            powers[i] = p
            p = p * _POLY_BASE
    h = (win * powers[None, :]).sum(axis=1, dtype=np.uint64)
    return np.unique(h)


def _pairs_in_groups(keys: np.ndarray, ids: np.ndarray):
    """All unordered id pairs within equal-key groups, vectorized.

    Replaces the per-group ``df.groupby`` loop in candidate generation:
    a bucket holds ~10^5 distinct (band/gram/table) keys of which
    almost all have one member, and pandas group extraction costs
    ~50 µs each — the loop, not the shuffle, was the near-dup wall at
    sf0.1. Here one lexsort finds group boundaries, size-1 groups are
    skipped wholesale, and only true collision groups (rare) reach
    Python. Returns (a, b) int64 arrays with a < b per pair; (key, id)
    duplicates are dropped first."""
    order = np.lexsort((ids, keys))
    k = keys[order]
    v = ids[order]
    if len(k) >= 1:
        keep = np.r_[True, (k[1:] != k[:-1]) | (v[1:] != v[:-1])]
        k = k[keep]
        v = v[keep]
    n = len(k)
    empty = np.empty(0, dtype=np.int64)
    if n < 2:
        return empty, empty
    starts = np.r_[0, np.flatnonzero(k[1:] != k[:-1]) + 1, n]
    sizes = np.diff(starts)
    out_a, out_b = [], []
    for s, size in zip(starts[:-1][sizes >= 2], sizes[sizes >= 2]):
        ii, jj = np.triu_indices(int(size), k=1)
        out_a.append(v[s + ii])
        out_b.append(v[s + jj])
    if not out_a:
        return empty, empty
    return (np.concatenate(out_a).astype(np.int64),
            np.concatenate(out_b).astype(np.int64))


def _jaccard_bulk(flat: np.ndarray, offs: np.ndarray, lens: np.ndarray,
                  a_codes: np.ndarray, b_codes: np.ndarray) -> np.ndarray:
    """Exact Jaccard for MANY candidate pairs at once. ``flat`` is the
    concatenation of every involved doc's sorted-unique shingle array
    (``offs``/``lens`` index it); pairs reference docs by code. One
    python iteration per DISTINCT LEFT DOC (not per pair): all of a
    left doc's partners gather their grams with a repeat/cumsum index
    trick, one searchsorted probes them against the left doc's grams,
    and add.reduceat sums hits per partner — ~10^2 pairs verify per
    python-level step instead of one."""
    n = len(a_codes)
    out = np.empty(n, np.float64)
    if not n:
        return out
    order = np.argsort(a_codes, kind="stable")
    a_s, b_s = a_codes[order], b_codes[order]
    starts = np.r_[0, np.flatnonzero(a_s[1:] != a_s[:-1]) + 1, n]
    inter_s = np.empty(n, np.int64)
    for s0, s1 in zip(starts[:-1], starts[1:]):
        a = int(a_s[s0])
        sa = flat[offs[a] : offs[a] + lens[a]]
        partners = b_s[s0:s1]
        pl = lens[partners]
        total = int(pl.sum())
        if total == 0 or len(sa) == 0:
            inter_s[s0:s1] = 0
            continue
        cum = np.cumsum(pl)
        base = np.repeat(cum - pl, pl)
        gidx = np.repeat(offs[partners], pl) + (np.arange(total) - base)
        b_grams = flat[gidx]
        idx = np.searchsorted(sa, b_grams)
        idx[idx == len(sa)] = 0
        hits = (sa[idx] == b_grams).astype(np.int64)
        bounds_ = cum - pl
        seg = np.add.reduceat(hits, bounds_) if total else np.zeros(len(pl), np.int64)
        seg[pl == 0] = 0
        inter_s[s0:s1] = seg
    la = lens[a_s].astype(np.float64)
    lb = lens[b_s].astype(np.float64)
    union = la + lb - inter_s
    jac_s = np.where(union > 0, inter_s / np.maximum(union, 1.0), 1.0)
    out[order] = jac_s
    return out


def _jaccard_arrays(sa: np.ndarray, sb: np.ndarray) -> float:
    if len(sa) == 0 or len(sb) == 0:
        return 1.0 if len(sa) == len(sb) else 0.0
    if len(sa) > len(sb):
        sa, sb = sb, sa
    # searchsorted membership count beats intersect1d (which re-sorts
    # the concatenation) — both inputs are already sorted unique
    idx = np.searchsorted(sb, sa)
    idx[idx == len(sb)] = 0  # out-of-range probes can't match sb[0]
    inter = int(np.count_nonzero(sb[idx] == sa))
    union = len(sa) + len(sb) - inter
    return inter / union


def jaccard_of_texts(a: str, b: str, k: int = 5) -> float:
    return _jaccard_arrays(_char_shingles(a, k), _char_shingles(b, k))


def _word_ngrams(text: str, n: int = 3) -> np.ndarray:
    """Word n-grams hashed to 64-bit ints (sorted unique array). Token
    hash is md5 first-8-bytes little-endian (== DuckDB
    ``md5_number_upper``, same as SimHash's ``_tok64``); gram hash is
    the degree-(n-1) polynomial of the token hashes in uint64
    wraparound arithmetic — vectorized over all grams of a doc.
    Injective on any realistic corpus (collision odds ~ (#grams)²/2⁶⁴),
    which is what makes the string-based DuckDB oracle exact."""
    toks = text.split()
    if len(toks) < n:
        return np.empty(0, dtype=np.uint64)
    th = np.array([_tok64(t) for t in toks], dtype=np.uint64)
    g = np.zeros(len(toks) - n + 1, dtype=np.uint64)
    for j in range(n):
        g = g * _POLY_BASE + th[j : len(toks) - n + 1 + j]
    return np.unique(g)


def ngram_jaccard_pairs(docs, n: int = 3, threshold: float = 0.5,
                        partitions: int | None = None):
    """(doc_id_a, doc_id_b, jaccard) — EXACT word-n-gram Jaccard
    near-dup pairs at ``jaccard ≥ threshold`` (a < b). Unlike MinHash
    this has recall 1.0 by construction: candidate generation uses
    prefix filtering (Bayardo et al., "Scaling Up All Pairs Similarity
    Search", WWW'07; Xiao et al. PPJoin): under any fixed global total
    order on grams (here: hash ascending), two sets with Jaccard ≥ t
    must share a gram within their first ``m - ceil(t*m) + 1`` grams —
    so only those prefix grams are emitted as slim (gram, doc_id) rows.

    Scale flow (text never fans out per gram):
    1. per-batch gram sets → SLIM prefix rows, ~(1-t)·m per doc;
    2. groupby(gram) → candidate id pairs (dedup in-bucket);
    3. shared `_verify_pairs` tail: two bucketed text joins + exact
       set-Jaccard verify, same exchanges as MinHash.
    A pathological gram shared by every document would make one bucket
    quadratic; the prefix trick already biases emitted grams toward the
    rare end (hash-ascending ≈ frequency-agnostic uniform), and a df-cap
    salting pass can be layered if a real corpus ever hits it."""
    if partitions is None:
        # candidate generation + verify are compute-bound (pair count,
        # not byte count): never drop below half the CPU default even
        # when the gram stream itself is tiny
        from .relational import _cpu_default_partitions

        est = _auto_parts(None, docs)
        partitions = (None if est is None
                      else max(est, _cpu_default_partitions() // 2))
    import math

    def prefix_stage(df: pd.DataFrame) -> pd.DataFrame:
        out_gram, out_doc = [], []
        for did, text in zip(df["doc_id"], df["text"].fillna("")):
            s = _word_ngrams(text, n)  # sorted unique = global order
            m = len(s)
            if m == 0:
                continue
            p = m - math.ceil(threshold * m) + 1
            out_gram.append(s[:p])
            out_doc.append(np.full(p, did, dtype=np.int64))
        if not out_gram:
            return pd.DataFrame(
                {"gram": pd.array([], "uint64"),
                 "doc_id": pd.array([], "int64")}
            )
        return pd.DataFrame(
            {"gram": np.concatenate(out_gram),
             "doc_id": np.concatenate(out_doc)}
        )

    def candidates_bucket(df: pd.DataFrame) -> pd.DataFrame:
        a, b = _pairs_in_groups(
            df["gram"].to_numpy(np.uint64),
            df["doc_id"].to_numpy(np.int64),
        )
        return pd.DataFrame(
            {"doc_id_a": pd.array(a, "int64"),
             "doc_id_b": pd.array(b, "int64")}
        ).drop_duplicates(["doc_id_a", "doc_id_b"])

    from .relational import bucketed_reduce

    prefix_rows = docs.select_columns(["doc_id", "text"]).map_batches(
        prefix_stage, batch_format="pandas"
    )
    pairs = bucketed_reduce(prefix_rows, "gram", candidates_bucket,
                            partitions=partitions)
    return _verify_dispatch(docs, pairs, lambda t: _word_ngrams(t, n), threshold,
                         partitions=partitions)


# ------------------------------------------------------------ minhash

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _signatures(texts, k: int, num_perm: int) -> np.ndarray:
    a, b = _minhash_params(num_perm)
    sigs = np.empty((len(texts), num_perm), dtype=np.uint64)
    for i, t in enumerate(texts):
        sh = _char_shingles(t or "", k)
        if len(sh) == 0:
            sigs[i] = 0
            continue
        # (a*x + b) mod p, vectorized over shingles per permutation
        vals = (
            (sh[None, :] % _MERSENNE) * (a[:, None] % _MERSENNE) + b[:, None]
        ) % _MERSENNE
        sigs[i] = vals.min(axis=1)
    return sigs


def minhash_lsh_pairs(docs, k: int = 5, num_perm: int = 128, bands: int = 32,
                      threshold: float = 0.5, partitions: int | None = None):
    """(doc_id_a, doc_id_b, jaccard) — near-duplicate pairs with exact
    shingle-Jaccard ≥ threshold among LSH candidates (a < b; precision
    1.0 by construction; recall set by (bands, rows-per-band)).

    Scale-aware flow — document text NEVER fans out per band:
    1. per-batch signatures → explode to SLIM band rows
       (band_id, band_hash, doc_id) — ~50 B/row × bands;
    2. groupby(band_id, band_hash) → candidate pairs (ids only);
    3. dedup pairs (a pair surfaces from several bands);
    4. two bucketed joins attach text_a then text_b — each text crosses
       the wire once per pair-membership, not once per band;
    5. exact shingle-Jaccard verify per pair, keep ≥ threshold.
    """
    # band rows are slim but fan out ×bands — ~2× the raw text bytes
    partitions = _auto_parts(partitions, docs, scale=2.0)
    rows_per_band = num_perm // bands

    def band_stage(df: pd.DataFrame) -> pd.DataFrame:
        sigs = _signatures(df["text"].fillna("").tolist(), k, num_perm)
        n = len(df)
        out_doc = np.repeat(df["doc_id"].to_numpy(), bands)
        out_band = np.tile(np.arange(bands, dtype=np.int32), n)
        # fold each band's rows with a splitmix-style mix, vectorized
        # over (docs × bands) at once. Any deterministic fold keeps
        # LSH semantics — identical segments always collide — and a
        # cross-segment collision only ADDS a candidate that the exact
        # verify filters (the former per-segment blake2b loop was the
        # signature stage's wall: docs×bands python-level digests)
        lanes = sigs.reshape(n, bands, rows_per_band)
        with np.errstate(over="ignore"):
            h = np.full((n, bands), np.uint64(0x9E3779B97F4A7C15))
            for r in range(rows_per_band):
                h ^= lanes[:, :, r]
                h *= np.uint64(0xBF58476D1CE4E5B9)
                h ^= h >> np.uint64(31)
        out_hash = (h >> np.uint64(1)).astype(np.int64).ravel()
        return pd.DataFrame(
            {"doc_id": out_doc, "band_id": out_band, "band_hash": out_hash}
        )

    def candidates_bucket(df: pd.DataFrame) -> pd.DataFrame:
        """All in-bucket pairs across the many (band_id, band_hash)
        groups of one hash bucket, via _pairs_in_groups. The composite
        key folds band_id into band_hash with an odd-constant multiply
        (a uint64 bijection); a cross-group fold collision could only
        ADD a candidate pair, which the exact-Jaccard verify then
        filters — precision is unaffected."""
        k = (df["band_hash"].to_numpy(np.int64).view(np.uint64)
             * np.uint64(0x9E3779B97F4A7C15)
             + df["band_id"].to_numpy(np.int64).view(np.uint64))
        a, b = _pairs_in_groups(k, df["doc_id"].to_numpy(np.int64))
        return pd.DataFrame(
            {"doc_id_a": pd.array(a, "int64"),
             "doc_id_b": pd.array(b, "int64")}
        ).drop_duplicates(["doc_id_a", "doc_id_b"])

    from .relational import bucketed_reduce

    # signatures are compute-bound (~tens of µs per doc), not
    # byte-bound: when the byte-derived partition estimate says the
    # corpus is small (fewer exchange partitions than cores), a sized
    # read gives only 1-2 blocks and the permutation work serializes.
    # Fan it out explicitly — repartitioning a corpus that small is
    # cheap, and large inputs (estimate ≥ cores) keep their read
    # parallelism untouched.
    from .relational import _cpu_default_partitions

    sig_src = docs.select_columns(["doc_id", "text"])
    cpu_parts = _cpu_default_partitions()
    if partitions is not None and partitions < cpu_parts:
        sig_src = sig_src.repartition(cpu_parts)
    band_rows = sig_src.map_batches(band_stage, batch_format="pandas")
    # shuffle 1: band buckets → candidate pairs
    pairs = bucketed_reduce(band_rows, "band_hash", candidates_bucket,
                            partitions=partitions)
    return _verify_dispatch(docs, pairs, lambda t: _char_shingles(t, k), threshold,
                         partitions=partitions)


def _verify_dispatch(docs, pairs, shingle_fn, threshold: float,
                     partitions: int | None = None):
    """Pick the verify strategy by corpus size: broadcast id→text map
    under BROADCAST_TEXT_BYTES (saves two text-attach exchanges),
    partitioned text joins above it (texts never broadcast). Both emit
    the identical (doc_id_a, doc_id_b, jaccard) rows."""
    from .relational import input_bytes_estimate

    est = input_bytes_estimate(docs)
    if est is not None and est <= BROADCAST_TEXT_BYTES:
        return _verify_pairs_broadcast(docs, pairs, shingle_fn, threshold)
    return _verify_pairs(docs, pairs, shingle_fn, threshold,
                         partitions=partitions)


def _verify_pairs(docs, pairs, shingle_fn, threshold: float,
                  partitions: int | None = None):
    """Shared tail of the near-dup pipelines: given slim candidate id
    pairs, attach both texts with two bucketed joins (each text crosses
    the wire once per pair-membership) and keep pairs whose exact
    set-Jaccard under ``shingle_fn`` is ≥ threshold. Emits
    (doc_id_a, doc_id_b, jaccard)."""
    from .relational import bucketed_reduce

    _COLS = ["key", "kind", "doc_id_a", "doc_id_b", "text_x"]

    def text_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": df["doc_id"].astype("int64"), "kind": np.int8(1),
             "doc_id_a": -1, "doc_id_b": -1, "text_x": df["text"]}
        ).reindex(columns=_COLS)

    texts = docs.select_columns(["doc_id", "text"]).map_batches(
        text_side, batch_format="pandas"
    )

    def pairs_keyed_a(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": df["doc_id_a"].astype("int64"), "kind": np.int8(0),
             "doc_id_a": df["doc_id_a"], "doc_id_b": df["doc_id_b"],
             "text_x": ""}
        ).reindex(columns=_COLS)

    # shuffle 2 (key = doc_id_a): global pair dedup + attach text_a —
    # one exchange does both (fused to cut sort-barrier latency)
    def stage_a(df: pd.DataFrame) -> pd.DataFrame:
        p = df[df["kind"] == 0][["doc_id_a", "doc_id_b"]].drop_duplicates()
        t = df[df["kind"] == 1][["key", "text_x"]].rename(
            columns={"key": "doc_id_a", "text_x": "text_a"}
        )
        return p.merge(t, on="doc_id_a", how="inner")

    pairs_a = bucketed_reduce(
        pairs.map_batches(pairs_keyed_a, batch_format="pandas").union(texts),
        "key", stage_a, partitions=partitions,
    )

    _COLS_B = ["key", "kind", "doc_id_a", "doc_id_b", "text_a", "text_x"]

    def pairs_keyed_b(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": df["doc_id_b"].astype("int64"), "kind": np.int8(0),
             "doc_id_a": df["doc_id_a"], "doc_id_b": df["doc_id_b"],
             "text_a": df["text_a"], "text_x": ""}
        ).reindex(columns=_COLS_B)

    def text_side_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["text_a"] = ""
        return df.reindex(columns=_COLS_B)

    with_b_input = pairs_a.map_batches(pairs_keyed_b, batch_format="pandas").union(
        texts.map_batches(text_side_b, batch_format="pandas")
    )

    def with_b_merge(df: pd.DataFrame) -> pd.DataFrame:
        p = df[df["kind"] == 0][["doc_id_a", "doc_id_b", "text_a"]]
        t = df[df["kind"] == 1][["key", "text_x"]].rename(
            columns={"key": "doc_id_b", "text_x": "text_b"}
        )
        return p.merge(t, on="doc_id_b", how="inner")

    # shuffle 3 (key = doc_id_b): attach text_b AND verify in the same
    # exchange — every distinct doc in the bucket is shingled ONCE into
    # a packed gram arena, then all pairs verify through the same
    # vectorized _jaccard_bulk kernel the broadcast path uses (one
    # python step per distinct left doc, not per pair)
    def stage_b_verify(df: pd.DataFrame) -> pd.DataFrame:
        merged = with_b_merge(df)
        if merged.empty:
            return pd.DataFrame(
                {"doc_id_a": pd.array([], "int64"),
                 "doc_id_b": pd.array([], "int64"),
                 "jaccard": pd.array([], "float64")}
            )
        a_ids = merged["doc_id_a"].to_numpy(np.int64)
        b_ids = merged["doc_id_b"].to_numpy(np.int64)
        ta = merged.drop_duplicates("doc_id_a")
        tb = merged.drop_duplicates("doc_id_b")
        all_ids = np.concatenate(
            [ta["doc_id_a"].to_numpy(np.int64),
             tb["doc_id_b"].to_numpy(np.int64)]
        )
        all_texts = np.concatenate(
            [ta["text_a"].to_numpy(object), tb["text_b"].to_numpy(object)]
        )
        uids, first = np.unique(all_ids, return_index=True)
        grams = [shingle_fn(all_texts[i] or "") for i in first]
        lens = np.fromiter((len(g) for g in grams), np.int64, len(grams))
        offs = np.zeros(len(grams), np.int64)
        np.cumsum(lens[:-1], out=offs[1:])
        flat = (np.concatenate(grams) if len(grams)
                else np.empty(0, np.uint64))
        jac = _jaccard_bulk(flat, offs, lens,
                            np.searchsorted(uids, a_ids),
                            np.searchsorted(uids, b_ids))
        keep = jac >= threshold
        return pd.DataFrame(
            {"doc_id_a": pd.array(a_ids[keep], "int64"),
             "doc_id_b": pd.array(b_ids[keep], "int64"),
             "jaccard": pd.array(np.round(jac[keep], 9), "float64")}
        )

    return bucketed_reduce(with_b_input, "key", stage_b_verify,
                           partitions=partitions)


# Text corpora under this in-memory estimate verify candidate pairs
# against a broadcast id→text map instead of paying two text-attach
# exchanges (ray_guide small-side broadcast); one ray.put, read by
# every verify task. 64 MiB of text is far below a worker heap.
BROADCAST_TEXT_BYTES = 64 << 20


def _verify_pairs_broadcast(docs, pairs, shingle_fn, threshold: float):
    """Broadcast-side verify for :func:`_verify_pairs` when the corpus
    fits comfortably in the object store: every doc is shingled ONCE
    (distributed map over the docs table), the packed gram arena ships
    once via ``ray.put`` as plain numpy buffers (out-of-band — each
    verify task's ray.get is a near-zero-cost view), and the verify
    tasks are pure :func:`_jaccard_bulk` calls over id codes. Without
    the precompute every verify task re-shingled most of the corpus
    (candidate pairs touch nearly all docs), multiplying shingle work
    by the task count. ONE tiny exchange on the candidate pairs
    resolves cross-band duplicates first. Output is identical to the
    partitioned path — precision 1.0 either way."""
    import ray

    from .relational import bucketed_reduce

    def shingle_batch(df: pd.DataFrame) -> pd.DataFrame:
        grams = [shingle_fn(t or "") for t in df["text"].fillna("")]
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "grams": [g.tobytes() for g in grams],
        })

    sh = docs.select_columns(["doc_id", "text"]).map_batches(
        shingle_batch, batch_format="pandas"
    ).to_pandas()
    order = np.argsort(sh["doc_id"].to_numpy(np.int64), kind="stable")
    ids_sorted = sh["doc_id"].to_numpy(np.int64)[order]
    bufs = sh["grams"].to_numpy()[order]
    lens_all = np.fromiter((len(b) >> 3 for b in bufs), np.int64, len(bufs))
    offs_all = np.zeros(len(bufs), np.int64)
    if len(bufs):
        np.cumsum(lens_all[:-1], out=offs_all[1:])
    flat_all = (
        np.frombuffer(b"".join(bufs), np.uint64) if lens_all.sum()
        else np.empty(0, np.uint64)
    )
    ref = ray.put((ids_sorted, flat_all, offs_all, lens_all))

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        ids_s, flat, offs, lens = ray.get(ref)
        a_ids = df["doc_id_a"].to_numpy(np.int64)
        b_ids = df["doc_id_b"].to_numpy(np.int64)
        a_pos = np.searchsorted(ids_s, a_ids).clip(max=max(len(ids_s) - 1, 0))
        b_pos = np.searchsorted(ids_s, b_ids).clip(max=max(len(ids_s) - 1, 0))
        jac = _jaccard_bulk(flat, offs, lens, a_pos, b_pos)
        # ids absent from the corpus behave as empty-gram docs (the old
        # shingle_fn("") fallback); candidate generation never emits
        # them, so this is belt-and-braces only
        if len(ids_s):
            missing = (ids_s[a_pos] != a_ids) | (ids_s[b_pos] != b_ids)
            if missing.any():
                jac = np.where(missing, 0.0, jac)
        keep = jac >= threshold
        return pd.DataFrame(
            {"doc_id_a": pd.array(a_ids[keep], "int64"),
             "doc_id_b": pd.array(b_ids[keep], "int64"),
             "jaccard": pd.array(np.round(jac[keep], 9), "float64")}
        )

    # dedup candidates BEFORE the verify: a pair surfacing from many
    # bands/grams is shingled+verified once, not once per source — and
    # the verify (a pure map afterwards) spreads across cores
    from .relational import _cpu_default_partitions

    unique_pairs = bucketed_reduce(
        pairs, "doc_id_a",
        lambda df: df.drop_duplicates(["doc_id_a", "doc_id_b"]),
        partitions=max(4, _cpu_default_partitions() // 2),
    )
    return unique_pairs.map_batches(verify, batch_format="pandas")


_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_H01 = np.uint64(0x0101010101010101)


_PC_LUT16 = None


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (any shape) via a 64 KiB
    16-bit lookup table (four gathers + three adds per word — the
    table lives in L1/L2, measured ~3× faster than the previous
    in-register SWAR sequence, which itself replaced an unpackbits
    version that expanded every word to 64 bytes)."""
    global _PC_LUT16
    if _PC_LUT16 is None:
        b = np.arange(65536, dtype=np.uint16)
        c = np.zeros(65536, np.uint8)
        for s in range(16):
            c += ((b >> s) & 1).astype(np.uint8)
        _PC_LUT16 = c
    v = np.ascontiguousarray(x).view(np.uint16).reshape(*x.shape, 4)
    out = _PC_LUT16[v[..., 0]].astype(np.int64)
    out += _PC_LUT16[v[..., 1]]
    out += _PC_LUT16[v[..., 2]]
    out += _PC_LUT16[v[..., 3]]
    return out


_FOLD64 = np.uint64(0x9E3779B97F4A7C15)  # odd => uint64 bijection


def _hamming_pairs_in_groups(keys: np.ndarray, ids: np.ndarray,
                             sigs: np.ndarray, max_h: int,
                             segs: np.ndarray | None = None,
                             bounds: list[tuple[int, int]] | None = None):
    """All (a, b, hamming) pairs with hamming <= max_h within equal-key
    groups, vectorized with the same boundary trick as
    :func:`_pairs_in_groups` (size-1 groups — the vast majority —
    never reach Python). ``ids`` may be any dtype; pairs are ordered
    a < b by id VALUE via np.unique codes. Because membership is decided
    by the exact in-group Hamming test, a folded-key collision merging
    two unrelated groups only adds comparisons — the emitted pair set
    is unchanged.

    ``segs``/``bounds`` enable OWNER-SEGMENT emission: each row carries
    the pigeonhole segment index its bucket keys on, and a pair is
    emitted only from the FIRST segment on which the two hashes agree
    (any earlier agreeing segment j < s means bucket j already emits
    it). Globally each pair then surfaces exactly once, so the
    downstream cross-bucket dedup exchange disappears."""
    uniq, codes = np.unique(ids, return_inverse=True)
    order = np.lexsort((codes, keys))
    k, c, sg = keys[order], codes[order], sigs[order]
    se = segs[order] if segs is not None else None
    if len(k):
        keep = np.r_[True, (k[1:] != k[:-1]) | (c[1:] != c[:-1])]
        k, c, sg = k[keep], c[keep], sg[keep]
        if se is not None:
            se = se[keep]
    n = len(k)
    out_a, out_b, out_h = [], [], []
    if n >= 2:
        starts = np.r_[0, np.flatnonzero(k[1:] != k[:-1]) + 1, n]
        sizes = np.diff(starts)
        chunk = 2048  # bound the XOR matrix (heavy-group guard)
        for s0, size in zip(starts[:-1][sizes >= 2], sizes[sizes >= 2]):
            gc = c[s0 : s0 + size]
            gs = sg[s0 : s0 + size]
            seg_i = int(se[s0]) if se is not None else 0
            for off in range(0, int(size), chunk):
                rows = gs[off : off + chunk]
                # only columns j > off can form an (i < j) pair with
                # this row chunk — skip the left half of the matrix
                cols = gs[off + 1 :]
                ham = _popcount64(rows[:, None] ^ cols[None, :])
                ia, jb = np.nonzero(ham <= max_h)
                keep2 = ia <= jb  # global i < j (j = jb + off + 1)
                ia, jb = ia[keep2], jb[keep2]
                ha = ham[ia, jb].astype(np.int64)
                if se is not None and seg_i > 0 and len(ia):
                    # owner rule: drop pairs already owned by an
                    # earlier agreeing segment
                    x = gs[ia + off] ^ gs[jb + off + 1]
                    owned = np.zeros(len(ia), bool)
                    for j in range(seg_i):
                        lo, hi = bounds[j]
                        m = np.uint64((1 << (hi - lo)) - 1)
                        owned |= ((x >> np.uint64(lo)) & m) == 0
                    ia, jb, ha = ia[~owned], jb[~owned], ha[~owned]
                out_a.append(gc[ia + off])
                out_b.append(gc[jb + off + 1])
                out_h.append(ha)
    if not out_a:
        return uniq[:0], uniq[:0], np.empty(0, np.int64)
    return (uniq[np.concatenate(out_a)], uniq[np.concatenate(out_b)],
            np.concatenate(out_h))


# ------------------------------------------------------------ simhash

def _tok64(s: str) -> int:
    """md5 first-8-bytes little-endian — chosen because it equals
    DuckDB's ``md5_number_upper``, which makes the SimHash signature
    (and thus the near-dup pair set) exactly SQL-reproducible."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def _simhash64(tokens: list[str]) -> int:
    acc = np.zeros(64, dtype=np.int64)
    for tok in tokens:
        h = np.uint64(_tok64(tok))
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    v = 0
    for i in range(64):
        if acc[i] > 0:
            v |= 1 << i
    return v


_TOK_MEMO: dict[str, int] = {}


def _simhash_batch(texts) -> np.ndarray:
    """Vectorized :func:`_simhash64` over a batch: md5 runs once per
    DISTINCT token (worker-global memo — the md5-per-occurrence loop
    was the simhash wall), the ±1 bit matrix gathers by inverse code,
    and one add.reduceat folds occurrences per doc. Bit-identical to
    the per-doc loop (same per-occurrence counting, same bit order)."""
    toks = [(t or "").split() for t in texts]
    counts = np.fromiter((len(x) for x in toks), np.int64, len(toks))
    flat = [tok for ts in toks for tok in ts]
    sigs = np.zeros(len(toks), np.uint64)
    if not flat:
        return sigs
    if len(_TOK_MEMO) > 1_000_000:
        _TOK_MEMO.clear()
    uniq, inv = np.unique(np.array(flat, dtype=object), return_inverse=True)
    hs = np.empty(len(uniq), np.uint64)
    for i, tok in enumerate(uniq):
        v = _TOK_MEMO.get(tok)
        if v is None:
            v = _tok64(tok)
            _TOK_MEMO[tok] = v
        hs[i] = v
    shifts = np.arange(64, dtype=np.uint64)[None, :]
    pm = (((hs[:, None] >> shifts) & np.uint64(1)).astype(np.int16) * 2 - 1)
    contrib = pm[inv]
    bounds = np.r_[0, np.cumsum(counts)]
    nz = counts > 0
    acc = np.zeros((len(toks), 64), np.int64)
    acc[nz] = np.add.reduceat(contrib.astype(np.int64), bounds[:-1][nz])
    bits = (acc > 0).astype(np.uint64)
    sigs = (bits << np.arange(64, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    return sigs


def simhash_pairs(docs, max_hamming: int = 3, partitions: int | None = None):
    """(doc_id_a, doc_id_b, hamming) — SimHash near-dups. Pigeonhole:
    Hamming ≤ 3 over 4 16-bit segments ⇒ ≥1 segment identical, so
    bucket by each segment and verify in-bucket."""
    partitions = _auto_parts(partitions, docs)

    def sig_stage(df: pd.DataFrame) -> pd.DataFrame:
        sigs = _simhash_batch(df["text"].fillna("").tolist())
        seg = np.arange(4, dtype=np.uint64)
        seg_val = (sigs[:, None] >> (np.uint64(16) * seg[None, :])) \
            & np.uint64(0xFFFF)
        gkey = seg_val * _FOLD64 + seg[None, :]
        return pd.DataFrame(
            {
                "doc_id": np.repeat(df["doc_id"].to_numpy(np.int64), 4),
                "gkey": gkey.reshape(-1).view(np.int64),
                "sig": np.repeat(sigs.view(np.int64), 4),
                "seg": np.tile(np.arange(4, dtype=np.int8), len(df)),
            }
        )

    _SIM_BOUNDS = [(16 * i, 16 * (i + 1)) for i in range(4)]

    def verify_bucket(df: pd.DataFrame) -> pd.DataFrame:
        a, b, h = _hamming_pairs_in_groups(
            df["gkey"].to_numpy(np.int64).view(np.uint64),
            df["doc_id"].to_numpy(np.int64),
            df["sig"].to_numpy(np.int64).view(np.uint64),
            max_hamming,
            segs=df["seg"].to_numpy(),
            bounds=_SIM_BOUNDS,
        )
        return pd.DataFrame(
            {"doc_id_a": pd.array(a, "int64"),
             "doc_id_b": pd.array(b, "int64"),
             "hamming": pd.array(h, "int64")}
        )

    from .relational import bucketed_reduce

    # owner-segment emission — pairs are globally unique already
    return bucketed_reduce(
        docs.map_batches(sig_stage, batch_format="pandas"),
        "gkey", verify_bucket, partitions=partitions,
    )


# ------------------------------------------------------- phash neardup

def _lane_dists(x: np.ndarray) -> np.ndarray:
    """(n, 4) per-16-bit-lane popcounts of a uint64 xor vector — one
    LUT gather per lane; lane L covers bits [16L, 16L+16) (little-
    endian uint16 view order)."""
    _popcount64(np.empty(0, np.uint64))  # ensure the LUT is built
    v = np.ascontiguousarray(x).view(np.uint16).reshape(-1, 4)
    return _PC_LUT16[v]


def _hamming_probe_pairs(keys: np.ndarray, ids: np.ndarray,
                         sigs: np.ndarray, lanes: np.ndarray,
                         kinds: np.ndarray, max_h: int):
    """Candidate generation + exact verify for the 4x16-bit probe
    scheme, fully vectorized across every (lane, value) bucket in the
    block: anchors (kind=1) sort by key once, each probe row (kind=0)
    gathers its key-equal anchor range with two searchsorteds, and a
    repeat/cumsum expansion yields all probe x anchor candidates with
    zero python per bucket. Emission: exact Hamming <= max_h, owner
    lane (FIRST lane with <= 1 differing bits) equals the bucket's
    lane, and for lane-equal pairs (d_lane = 0, where both directions
    surface) the probe's id-code must precede the anchor's — so every
    pair is emitted exactly once globally. ids may be any dtype;
    output pairs are ordered a < b by id value."""
    uniq, codes = np.unique(ids, return_inverse=True)
    empty = uniq[:0]
    anchor = kinds == 1
    order_a = np.argsort(keys[anchor], kind="stable")
    ak = keys[anchor][order_a]
    ac = codes[anchor][order_a]
    asg = sigs[anchor][order_a]
    pk = keys[~anchor]
    pc_all = codes[~anchor]
    psg = sigs[~anchor]
    pl = lanes[~anchor]
    s0 = np.searchsorted(ak, pk, side="left")
    s1 = np.searchsorted(ak, pk, side="right")
    cnt = s1 - s0
    total = int(cnt.sum())
    if total == 0:
        return empty, empty, np.empty(0, np.int64)
    pidx = np.repeat(np.arange(len(pk)), cnt)
    cum = np.cumsum(cnt)
    within = np.arange(total) - np.repeat(cum - cnt, cnt)
    aidx = np.repeat(s0, cnt) + within
    x = psg[pidx] ^ asg[aidx]
    ld = _lane_dists(x)
    ham = ld.sum(axis=1, dtype=np.int64)
    rows = np.arange(total)
    bl = pl[pidx].astype(np.int64)
    d_here = ld[rows, bl]
    owner = np.argmax(ld <= 1, axis=1)
    p_c = pc_all[pidx]
    a_c = ac[aidx]
    emit = (
        (ham <= max_h)
        & (p_c != a_c)
        & (owner == bl)
        & ((d_here == 1) | (p_c < a_c))
    )
    p_c, a_c, ham = p_c[emit], a_c[emit], ham[emit]
    lo = np.minimum(p_c, a_c)
    hi = np.maximum(p_c, a_c)
    return uniq[lo], uniq[hi], ham


def phash_near_dup(images, max_hamming: int = 7,
                   id_col: str = "image_id", hash_col: str = "phash",
                   partitions: int | None = None):
    """(image_id_a, image_id_b, hamming) — near-duplicate images by
    perceptual-hash Hamming distance over the image+caption table's
    ``phash`` int64 column (sources/synth.py gen_images;
    functions/codec.py average_hash).

    Pigeonhole blocking, exact for the threshold: the 64-bit hash is
    split into ``max_hamming + 1`` contiguous segments, so any pair
    within Hamming ``max_hamming`` agrees exactly on >= 1 segment —
    bucket by each (seg_id, seg_val) and verify in-bucket (recall 1.0,
    like simhash_pairs' 4x16-bit scheme but parameterized). Only slim
    (id, seg, sig) rows enter the shuffle — never image bytes. In-bucket
    verify is one vectorized XOR + popcount over the bucket matrix;
    buckets are 2^(64/(h+1))-way splits of the corpus, so they stay
    small unless the corpus is dominated by byte-identical images (run
    exact_dedup first in that case — same guidance as the reference's
    drop_duplicates-before-overlap-cleanup order, see
    reference src/delineation_utils.py dedup-then-merge flow).

    For ``max_hamming <= 7`` the blocking is a 4x16-bit probe scheme
    (PartEnum-style) instead of ``max_hamming+1`` narrow segments:
    pigeonhole guarantees some 16-bit lane carries <= floor(7/4) = 1
    of the pair's differing bits, so candidates are exact-key matches
    between an item's lane value ("anchor" rows) and another item's
    lane value OR one of its 0->1 single-bit flips ("probe" rows).
    Narrow 8-bit segments put n/256 items in every bucket — 10^8+
    quadratic comparisons at n = 10^5 — while 16-bit lanes keep
    buckets at n/65536 and the probe fan-out is ~9 slim rows per lane.
    The verify is fully vectorized across buckets (no per-bucket
    python), and the owner-lane rule (first lane with <= 1 differing
    bits emits) makes every pair globally unique with no dedup
    exchange."""
    if partitions is None:
        from .relational import _cpu_default_partitions, auto_partitions

        est = auto_partitions(images, scale=0.05)
        # quadratic in-bucket verify: size for CPU, not bytes, so a
        # hot bucket's task holds as little unrelated work as possible
        partitions = (None if est is None
                      else max(est, _cpu_default_partitions()))
    from .relational import bucketed_reduce

    if 0 <= max_hamming <= 7:
        def sig_stage(df: pd.DataFrame) -> pd.DataFrame:
            ph = df[hash_col].to_numpy(np.int64).view(np.uint64)
            ids = df[id_col].to_numpy()
            n = len(df)
            keys, out_ids, sigs, lanes_c, kinds = [], [], [], [], []

            def emit(lane, vals, mask, kind):
                k = ((vals.astype(np.uint64) << np.uint64(2))
                     | np.uint64(lane)) * _FOLD64
                if mask is None:
                    keys.append(k.view(np.int64))
                    out_ids.append(ids)
                    sigs.append(ph.view(np.int64))
                    cnt = n
                else:
                    keys.append(k[mask].view(np.int64))
                    out_ids.append(ids[mask])
                    sigs.append(ph[mask].view(np.int64))
                    cnt = int(mask.sum())
                lanes_c.append(np.full(cnt, lane, np.int8))
                kinds.append(np.full(cnt, kind, np.int8))

            for lane in range(4):
                seg = (ph >> np.uint64(16 * lane)) & np.uint64(0xFFFF)
                emit(lane, seg, None, 1)   # anchor
                emit(lane, seg, None, 0)   # probe, 0 flips (d_lane == 0)
                for b in range(16):
                    zero = (seg >> np.uint64(b)) & np.uint64(1) == 0
                    if zero.any():
                        # 0->1 flips only: for a lane differing in one
                        # bit, exactly ONE side has a 0 there — unique
                        # probe direction, half the fan-out
                        emit(lane, seg | np.uint64(1 << b), zero, 0)
            return pd.DataFrame(
                {
                    id_col: np.concatenate(out_ids),
                    "gkey": np.concatenate(keys),
                    "sig": np.concatenate(sigs),
                    "lane": np.concatenate(lanes_c),
                    "kind": np.concatenate(kinds),
                }
            )

        def verify_bucket(df: pd.DataFrame) -> pd.DataFrame:
            a, b, h = _hamming_probe_pairs(
                df["gkey"].to_numpy(np.int64),
                df[id_col].to_numpy(),
                df["sig"].to_numpy(np.int64).view(np.uint64),
                df["lane"].to_numpy(),
                df["kind"].to_numpy(),
                max_hamming,
            )
            return pd.DataFrame(
                {"image_id_a": a, "image_id_b": b,
                 "hamming": pd.array(h, "int64")}
            )

        return bucketed_reduce(
            images.map_batches(sig_stage, batch_format="pandas"),
            "gkey", verify_bucket, partitions=partitions,
        )

    n_seg = max_hamming + 1
    if not 1 <= n_seg <= 64:
        raise ValueError("max_hamming must be in [0, 63]")
    bounds = [(i * 64 // n_seg, (i + 1) * 64 // n_seg) for i in range(n_seg)]

    def sig_stage(df: pd.DataFrame) -> pd.DataFrame:
        ph = df[hash_col].to_numpy(np.int64).view(np.uint64)
        ids = df[id_col].to_numpy()
        gkeys = [
            (((ph >> np.uint64(lo)) & np.uint64((1 << (hi - lo)) - 1))
             * _FOLD64 + np.uint64(i))
            for i, (lo, hi) in enumerate(bounds)
        ]
        return pd.DataFrame(
            {
                id_col: np.tile(ids, n_seg),
                "gkey": np.concatenate(gkeys).view(np.int64),
                "sig": np.tile(ph.view(np.int64), n_seg),
                "seg": np.repeat(np.arange(n_seg, dtype=np.int8), len(ids)),
            }
        )

    def verify_bucket(df: pd.DataFrame) -> pd.DataFrame:
        a, b, h = _hamming_pairs_in_groups(
            df["gkey"].to_numpy(np.int64).view(np.uint64),
            df[id_col].to_numpy(),
            df["sig"].to_numpy(np.int64).view(np.uint64),
            max_hamming,
            segs=df["seg"].to_numpy(),
            bounds=bounds,
        )
        return pd.DataFrame(
            {"image_id_a": a, "image_id_b": b,
             "hamming": pd.array(h, "int64")}
        )

    # owner-segment emission inside the verify makes pairs globally
    # unique — no cross-bucket dedup exchange needed
    return bucketed_reduce(
        images.map_batches(sig_stage, batch_format="pandas"),
        "gkey", verify_bucket, partitions=partitions,
    )


# --------------------------------------------------- embedding neardup

def embedding_near_dup(embeddings, threshold: float = 0.95, n_planes: int = 12,
                       n_tables: int = 8, seed: int = 7,
                       partitions: int | None = None):
    """(vec_id_a, vec_id_b, cosine) — pairs with cosine ≥ threshold.

    Multi-table random-hyperplane LSH: a pair at angle θ collides in at
    least one of L tables w.p. 1 − (1 − (1−θ/π)^b)^L — with the default
    (b=12, L=8) that is ≈0.9999 at cosine 0.99 and ≈0.93 at 0.95,
    vs ≈0.28 for a single table. Precision is 1.0 (exact in-bucket
    cosine verify).

    Scale flow mirrors ``minhash_lsh_pairs`` — embedding vectors NEVER
    fan out per table:
    1. per-batch bucket ids → SLIM (vec_id, tkey) rows, L per vector;
    2. groupby(tkey) → candidate id pairs;
    3. shuffle on vec_id_a: global pair dedup + attach unit vector a;
    4. shuffle on vec_id_b: attach unit vector b + exact cosine verify
       in the same exchange.
    """
    partitions = _auto_parts(partitions, embeddings)

    def bucket_stage(df: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        dim = vecs.shape[1]
        planes = np.random.default_rng(seed).normal(size=(dim, n_tables * n_planes))
        signs = (vecs @ planes) >= 0  # (n, L*b)
        n = len(df)
        tkey = np.zeros((n, n_tables), dtype=np.int64)
        for t in range(n_tables):
            for b in range(n_planes):
                tkey[:, t] |= signs[:, t * n_planes + b].astype(np.int64) << b
            tkey[:, t] |= np.int64(t) << n_planes
        return pd.DataFrame(
            {
                "vec_id": np.repeat(df["vec_id"].to_numpy(), n_tables),
                "tkey": tkey.reshape(-1),
            }
        )

    def candidates_bucket(df: pd.DataFrame) -> pd.DataFrame:
        a, b = _pairs_in_groups(
            df["tkey"].to_numpy(np.int64).view(np.uint64),
            df["vec_id"].to_numpy(np.int64),
        )
        return pd.DataFrame(
            {"vec_id_a": pd.array(a, "int64"),
             "vec_id_b": pd.array(b, "int64")}
        ).drop_duplicates(["vec_id_a", "vec_id_b"])

    from .relational import bucketed_reduce

    slim = embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        bucket_stage, batch_format="pandas"
    )
    # shuffle 1: LSH buckets → candidate pairs (ids only)
    pairs = bucketed_reduce(slim, "tkey", candidates_bucket,
                            partitions=partitions)

    _COLS = ["key", "kind", "vec_id_a", "vec_id_b", "vec_x"]

    def unit_side(df: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        norm = np.linalg.norm(vecs, axis=1, keepdims=True)
        unit = vecs / np.where(norm == 0, 1, norm)
        return pd.DataFrame(
            {"key": df["vec_id"].astype("int64"), "kind": np.int8(1),
             "vec_id_a": -1, "vec_id_b": -1,
             "vec_x": list(unit)}
        ).reindex(columns=_COLS)

    units = embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        unit_side, batch_format="pandas"
    )

    _EMPTY_VEC = np.empty(0, dtype=np.float64)

    def pairs_keyed_a(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": df["vec_id_a"].astype("int64"), "kind": np.int8(0),
             "vec_id_a": df["vec_id_a"], "vec_id_b": df["vec_id_b"],
             "vec_x": [_EMPTY_VEC] * len(df)}
        ).reindex(columns=_COLS)

    # shuffle 2 (key = vec_id_a): global pair dedup + attach unit a
    def stage_a(df: pd.DataFrame) -> pd.DataFrame:
        p = df[df["kind"] == 0][["vec_id_a", "vec_id_b"]].drop_duplicates()
        t = df[df["kind"] == 1][["key", "vec_x"]].rename(
            columns={"key": "vec_id_a", "vec_x": "vec_a"}
        )
        return p.merge(t, on="vec_id_a", how="inner")

    pairs_a = bucketed_reduce(
        pairs.map_batches(pairs_keyed_a, batch_format="pandas").union(units),
        "key", stage_a, partitions=partitions,
    )

    _COLS_B = ["key", "kind", "vec_id_a", "vec_id_b", "vec_a", "vec_x"]

    def pairs_keyed_b(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": df["vec_id_b"].astype("int64"), "kind": np.int8(0),
             "vec_id_a": df["vec_id_a"], "vec_id_b": df["vec_id_b"],
             "vec_a": df["vec_a"], "vec_x": [_EMPTY_VEC] * len(df)}
        ).reindex(columns=_COLS_B)

    def unit_side_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["vec_a"] = [_EMPTY_VEC] * len(df)
        return df.reindex(columns=_COLS_B)

    with_b_input = pairs_a.map_batches(pairs_keyed_b, batch_format="pandas").union(
        units.map_batches(unit_side_b, batch_format="pandas")
    )

    # shuffle 3 (key = vec_id_b): attach unit b AND verify cosine in the
    # same exchange
    def stage_b_verify(df: pd.DataFrame) -> pd.DataFrame:
        p = df[df["kind"] == 0][["vec_id_a", "vec_id_b", "vec_a"]]
        t = df[df["kind"] == 1][["key", "vec_x"]].rename(
            columns={"key": "vec_id_b", "vec_x": "vec_b"}
        )
        merged = p.merge(t, on="vec_id_b", how="inner")
        if len(merged) == 0:
            return pd.DataFrame(
                {"vec_id_a": pd.array([], "int64"),
                 "vec_id_b": pd.array([], "int64"),
                 "cosine": pd.array([], "float64")}
            )
        va = np.stack([np.asarray(v, np.float64) for v in merged["vec_a"]])
        vb = np.stack([np.asarray(v, np.float64) for v in merged["vec_b"]])
        cos = (va * vb).sum(axis=1)
        keep = cos >= threshold
        return pd.DataFrame(
            {"vec_id_a": merged["vec_id_a"].to_numpy()[keep].astype("int64"),
             "vec_id_b": merged["vec_id_b"].to_numpy()[keep].astype("int64"),
             "cosine": np.round(cos[keep], 9)}
        )

    return bucketed_reduce(with_b_input, "key", stage_b_verify,
                           partitions=partitions)


# ----------------------------------------- connected-components dedup
# Above this many duplicate edges the driver union-find (a python dict
# of every edge endpoint) stops fitting one node's heap; auto mode
# switches to the distributed min-label rounds. Overridable per call.
CC_EDGE_BUDGET = 10_000_000


def connected_components_dedup(docs, pairs, id_col: str = "doc_id",
                               pair_cols: tuple[str, str] = ("doc_id_a",
                                                             "doc_id_b"),
                               mode: str = "auto",
                               edge_budget: int = CC_EDGE_BUDGET,
                               partitions: int | None = None):
    """Resolve near-dup PAIRS into clusters and assign every document
    its cluster representative ``rep_id`` = min id of its connected
    component (singletons map to themselves). This is the step that
    turns a pair list (minhash/simhash/jaccard) into the actual
    keep-one-per-cluster dedup decision.

    Scale shape, two regimes (``mode``):

    - ``"driver"`` (and ``"auto"`` with ≤ ``edge_budget`` edges): the
      edge list is O(#duplicates) — normally orders of magnitude
      smaller than the corpus — so edges stream to the driver in
      batches feeding an in-memory union-find keyed only on ids that
      appear in some edge (memory O(nodes-in-edges), never
      O(corpus)). The root map then broadcasts once via ``ray.put``
      and the corpus-wide assignment is an embarrassingly-parallel
      ``map_batches`` lookup with ZERO extra exchanges. Forcing
      ``mode="driver"`` past the budget raises loudly instead of
      silently OOMing the driver.
    - ``"distributed"`` (and ``"auto"`` above the budget — the 100 TB
      crawl with a 30-50% dup rate, where the edge set is itself
      huge): min-label propagation with pointer doubling over the
      edge Dataset (hash-to-min family, Rastogi et al.), 2 bucketed
      exchanges per round, O(log diameter) rounds, nothing ever
      collected to the driver. The corpus-side assignment is then one
      hash-partitioned join instead of a broadcast lookup — the
      unavoidable price once the root map outgrows one node. Both
      regimes emit byte-identical (id, rep_id) rows.

    Reference semantics: the union-merge of >50%-overlap polygon pairs
    builds a networkx graph + connected_components
    (from_mask_to_polygons.py:9-42); here the same closure runs over
    text/embedding near-dup pairs."""
    import ray

    if mode not in ("auto", "driver", "distributed"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode != "driver":
        # count() executes the (slim) pair pipeline; materialize so
        # the chosen path doesn't recompute it
        pairs = pairs.materialize()
        n_edges = pairs.count()
        if mode == "distributed" or n_edges > edge_budget:
            return _cc_distributed(docs, pairs, id_col, pair_cols,
                                   partitions)
    else:
        n_edges = None

    parent: dict = {}

    def find(a):
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:  # path compression
            parent[a], a = root, parent[a]
        return root

    # stream the (small) edge list; never materialize the corpus
    seen_edges = 0
    for batch in pairs.select_columns(list(pair_cols)).iter_batches(
        batch_format="pandas"
    ):
        seen_edges += len(batch)
        if seen_edges > edge_budget:
            raise ValueError(
                f"connected_components_dedup(mode='driver'): edge list "
                f"exceeds edge_budget={edge_budget} — the driver "
                f"union-find would not fit one node; use mode='auto' or "
                f"'distributed' (min-label rounds over the edge Dataset)"
            )
        for a, b in zip(batch[pair_cols[0]], batch[pair_cols[1]]):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:  # union by min → rep is the component min
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra

    roots = {k: find(k) for k in parent}
    roots_ref = ray.put(roots)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(roots_ref)
        ids = df[id_col]
        return pd.DataFrame(
            {id_col: ids,
             "rep_id": ids.map(lambda i: lut.get(i, i))}
        )

    return docs.select_columns([id_col]).map_batches(
        assign, batch_format="pandas"
    )


def _cc_distributed(docs, pairs, id_col: str,
                    pair_cols: tuple[str, str],
                    partitions: int | None):
    """Distributed closure of the duplicate graph: min-label
    propagation + pointer doubling, entirely as Ray Data exchanges.

    Per round every node k's group (keyed by k) holds its label row,
    its incident edges, and 'ask' rows from nodes whose label IS k;
    the group emits label(k) to each of them, and a grouped min +
    changed-count closes the round. new_label(u) =
    min(label(u), min_n∈N(u) label(n), label(label(u))) — the doubling
    term makes long chains collapse in O(log diameter) rounds. Labels
    only decrease and the per-component fixpoint is the component-min
    id, so output is byte-identical to the driver union-find."""
    from .relational import bucketed_reduce

    _R = ["key", "kind", "val"]

    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        a, b = df[pair_cols[0]], df[pair_cols[1]]
        return pd.DataFrame(
            {"key": pd.concat([a, b], ignore_index=True),
             "kind": np.int8(1),
             "val": pd.concat([b, a], ignore_index=True)}
        ).reindex(columns=_R)

    # both directions of every edge, keyed by the receiving node —
    # built once, reused (re-read from the object store) every round
    edges = pairs.select_columns(list(pair_cols)).map_batches(
        edge_rows, batch_format="pandas"
    ).materialize()

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        nodes = df["key"].drop_duplicates()
        return pd.DataFrame({"node": nodes, "label": nodes, "changed": 1})

    labels = bucketed_reduce(edges, "key", init_labels,
                             partitions=partitions).materialize()

    for _round in range(64):
        def label_rows(df: pd.DataFrame) -> pd.DataFrame:
            lab = pd.DataFrame(
                {"key": df["node"], "kind": np.int8(0), "val": df["label"]}
            )
            ask = pd.DataFrame(
                {"key": df["label"], "kind": np.int8(2), "val": df["node"]}
            )
            return pd.concat([lab, ask], ignore_index=True).reindex(
                columns=_R)

        def send(df: pd.DataFrame) -> pd.DataFrame:
            labs = df[df["kind"] == 0][["key", "val"]].rename(
                columns={"val": "lab"})
            targets = df[df["kind"] != 0][["key", "val"]]
            m = targets.merge(labs, on="key", how="inner")
            return pd.concat(
                [pd.DataFrame({"node": labs["key"], "cand": labs["lab"],
                               "old": np.int8(1)}),
                 pd.DataFrame({"node": m["val"], "cand": m["lab"],
                               "old": np.int8(0)})],
                ignore_index=True,
            )

        def take_min(df: pd.DataFrame) -> pd.DataFrame:
            new = df.groupby("node", sort=False)["cand"].min()
            old = df[df["old"] == 1].set_index("node")["cand"]
            out = new.rename("label").reset_index()
            out["changed"] = (new < old.reindex(new.index)).to_numpy(
                np.int8)
            return out

        cand = labels.map_batches(
            label_rows, batch_format="pandas").union(edges)
        labels = bucketed_reduce(
            bucketed_reduce(cand, "key", send, partitions=partitions),
            "node", take_min, partitions=partitions,
        ).materialize()
        from ray.data.aggregate import Sum

        n_changed = labels.aggregate(Sum("changed"))["sum(changed)"]
        if not n_changed:
            break
    else:  # pragma: no cover - 2^64 chain needed
        raise RuntimeError("connected components did not converge")

    # corpus-side assignment: one hash-partitioned join (no broadcast —
    # the root map is, by assumption of this path, too big for one node)
    _J = ["key", "kind", "rep"]

    def doc_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": df[id_col], "kind": np.int8(0), "rep": df[id_col]}
        ).reindex(columns=_J)

    def rep_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": df["node"], "kind": np.int8(1), "rep": df["label"]}
        ).reindex(columns=_J)

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["kind"] == 0][["key"]]
        r = df[df["kind"] == 1][["key", "rep"]]
        m = d.merge(r, on="key", how="left")
        # cast back after the NaN fill: a left-miss promotes int64 rep
        # to float64, which would break byte-parity with the driver path
        rep = m["rep"].fillna(m["key"]).astype(m["key"].dtype, copy=False)
        return pd.DataFrame({id_col: m["key"], "rep_id": rep})

    both = docs.select_columns([id_col]).map_batches(
        doc_rows, batch_format="pandas"
    ).union(labels.map_batches(rep_rows, batch_format="pandas"))
    return bucketed_reduce(both, "key", attach, partitions=partitions)


# --------------------------------------------------- edit distance <= 1

def _lev_le1_eq(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Equal-length cohort: Levenshtein <= 1 iff <= 1 substitution.
    a, b: (n, L) uint32 codepoint matrices."""
    return (a != b).sum(axis=1) <= 1


def _lev_le1_del(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """len(a) == len(b)+1 cohort: distance <= 1 iff b equals a with one
    char deleted — exists j with a[:j]==b[:j] and a[j+1:]==b[j:].
    Vectorized via prefix/suffix all-equal cumulations (no per-row
    scan): P[j] = prefix match up to j, S[j] = shifted suffix match
    from j."""
    n, la = a.shape
    eq1 = a[:, : la - 1] == b          # a[k] == b[k]
    eq2 = a[:, 1:] == b                # a[k+1] == b[k]
    # P[:, j] = all(eq1[:, :j]); S[:, j] = all(eq2[:, j:])
    p = np.ones((n, la), dtype=bool)
    p[:, 1:] = np.logical_and.accumulate(eq1, axis=1)
    s = np.ones((n, la), dtype=bool)
    s[:, :-1] = np.logical_and.accumulate(eq2[:, ::-1], axis=1)[:, ::-1]
    return (p & s).any(axis=1)


def _str_matrix(vals: np.ndarray, width: int) -> np.ndarray:
    """Strings (all length <= width) → (n, width) uint32 codepoints,
    NUL-padded — one numpy cast, no per-char python."""
    arr = np.asarray(vals, dtype=f"<U{width}")
    return arr.view(np.uint32).reshape(len(arr), width)


def edit_distance_pairs(ds, id_col: str = "c_custkey",
                        text_col: str = "c_name",
                        partitions: int | None = None):
    """All pairs (id_a < id_b) with Levenshtein distance <= 1 — the
    SymSpell deletion-neighborhood join (fuzzy key matching /
    record-linkage; the reference joins only on exact StemTag equality,
    SURVEY §2.4). Recall is exact: dist<=1 implies the two strings
    share a blocking key (substitution at i → both i-th deletion
    variants equal; insert/delete → the longer one's variant equals the
    shorter string itself; equality → the identity key). Hash
    collisions and shared-variant distance-2 pairs only ADD candidates,
    and the exact verifier kills them.

    Two slim hash exchanges: (key, id, text) rows — one row per
    deletion variant, same cost class as shingling — co-group by key;
    per bucket a self-merge emits candidate pairs verified by the
    vectorized prefix/suffix kernels above (never a per-row python
    edit-distance loop); a second exchange on id_a dedups pairs found
    under several keys."""
    # deletion variants fan out ×(len+1) slim rows per string
    partitions = _auto_parts(partitions, ds, scale=4.0)
    from .relational import bucketed_reduce

    def keys_stage(df: pd.DataFrame) -> pd.DataFrame:
        ids, texts, variants = [], [], []
        for i, t in zip(df[id_col].to_numpy(), df[text_col].to_numpy()):
            t = t or ""
            ids.extend([i] * (len(t) + 1))
            texts.extend([t] * (len(t) + 1))
            variants.append(t)
            variants.extend(t[:j] + t[j + 1:] for j in range(len(t)))
        out = pd.DataFrame({id_col: ids, "__t": texts})
        out["__k"] = pd.util.hash_pandas_object(
            pd.Series(variants), index=False
        ).astype(np.int64)
        return out

    keyed = ds.select_columns([id_col, text_col]).map_batches(
        keys_stage, batch_format="pandas"
    )

    def candidates_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates([id_col, "__k"])
        m = df.merge(df, on="__k", suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]].drop_duplicates(
            [f"{id_col}_a", f"{id_col}_b"]
        )
        if not len(m):
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64)})
        ta, tb = m["__t_a"].to_numpy(), m["__t_b"].to_numpy()
        la = np.array([len(x) for x in ta])
        lb = np.array([len(x) for x in tb])
        ok = np.zeros(len(m), dtype=bool)
        for (na, nb), idx in pd.Series(range(len(m))).groupby(
            [pd.Series(la), pd.Series(lb)]
        ):
            sel = idx.to_numpy()
            if abs(na - nb) > 1:
                continue
            if na == nb:
                w = max(na, 1)
                ok[sel] = _lev_le1_eq(
                    _str_matrix(ta[sel], w), _str_matrix(tb[sel], w)
                ) if na else True
            else:
                lng, sht = (ta, tb) if na > nb else (tb, ta)
                w = max(na, nb)
                if w - 1 == 0:
                    ok[sel] = True  # "x" vs "" is one deletion
                    continue
                ok[sel] = _lev_le1_del(
                    _str_matrix(lng[sel], w),
                    _str_matrix(sht[sel], w - 1),
                )
        m = m[ok]
        return pd.DataFrame({
            "id_a": m[f"{id_col}_a"].to_numpy(),
            "id_b": m[f"{id_col}_b"].to_numpy(),
        })

    pairs = bucketed_reduce(keyed, "__k", candidates_bucket,
                            partitions=partitions)

    def dedup_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    return bucketed_reduce(pairs, "id_a", dedup_bucket,
                           partitions=partitions)
