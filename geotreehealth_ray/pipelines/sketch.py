"""Sketch aggregates — the "no sketches / approx-distinct" gap row of
the reference's aggregation surface (SURVEY.md §2.5), filled with a
HyperLogLog-style distinct-count sketch built for exact verifiability:

- the operator's OUTPUT is the register table (bucket, reg) — a pure
  integer function of the input multiset, so the driver's DuckDB oracle
  reconstructs it bit-for-bit (vectorized FNV-1a over the key's 8 LE
  bytes; rank via length(bin(x)) — no floating point anywhere);
- the cardinality estimate is a deterministic driver-side fold of the
  4096-row register table (`hll_estimate`), never of the data.

Scale shape: per-batch partial register maxima (≤ m slim rows per
batch) → one hash-bucketed grouped max. The raw keys never shuffle, so
the sketch costs O(m) network per batch regardless of input size —
this is the operator to reach for when `distinct_count`'s exact
pair-shuffle would dominate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["hll_registers", "hll_estimate", "P_DEFAULT",
           "bloom_words", "bloom_might_contain", "BLOOM_BITS_LOG2",
           "BLOOM_K", "bloom_semi_join", "cms_cells", "cms_estimate",
           "CMS_W_LOG2", "CMS_D", "heavy_hitters", "equidepth_histogram",
           "hll_registers_by_key", "hll_estimate_by_key"]

P_DEFAULT = 12  # 2^12 = 4096 registers → ~1.6% standard error

# Inputs under this estimate fold their sketch partials on the driver
# (collect ≤ sketch-size slim rows per block, one vectorized groupby)
# instead of paying a one-partition sort exchange, whose fixed barrier
# latency (~1.3 s) dwarfs any sketch fold at small scale. Above it the
# exchange amortizes and bounds driver memory: partial rows collected
# scale with block count, so a 100 TB input keeps the distributed
# path. Outputs are identical — the folds are associative/commutative.
SKETCH_FOLD_BYTES = 1 << 30


def _fold_or_exchange(ds, partials, fold_fn, exchange_fn):
    """Dispatch a sketch's final combine by input size: driver fold of
    the collected partials when the input estimate is small and known,
    else the distributed one-partition exchange."""
    from .relational import _SIZE_HINT, input_bytes_estimate

    est = input_bytes_estimate(ds)
    if est is None:
        # transforms erase file lineage; the ambient per-run hint (an
        # over-estimate — whole input dir) still safely proves "small"
        est = _SIZE_HINT.get()
    if est is not None and est <= SKETCH_FOLD_BYTES:
        import ray.data as rd

        return rd.from_pandas(fold_fn(partials.to_pandas()))
    return exchange_fn(partials)

_FNV_OFF = np.uint64(14695981039346656037)
_FNV_PRM = np.uint64(1099511628211)


def _fnv1a_u64(keys: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a over the 8 little-endian bytes of each int64
    key (identical to hashing the key's struct.pack('<q') bytes)."""
    v = keys.astype(np.int64).view(np.uint64)
    h = np.full(len(v), _FNV_OFF, np.uint64)
    with np.errstate(over="ignore"):
        for b in range(8):
            byte = (v >> np.uint64(8 * b)) & np.uint64(0xFF)
            h = (h ^ byte) * _FNV_PRM
    return h


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized integer bit length (0 for 0) — exact, no log2."""
    x = x.copy()
    r = np.zeros(x.shape, np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = x >= (np.uint64(1) << np.uint64(s))
        r[m] += s
        x[m] >>= np.uint64(s)
    r[x == 1] += 1
    return r


def hll_registers(ds, col: str, p: int = P_DEFAULT):
    """(bucket, reg) register table of the HLL sketch of ``col``
    (int64 keys): bucket = top ``p`` hash bits; reg = max over the
    bucket's values of (leading-zero count of the remaining 64-p bits)
    + 1 (values whose remaining bits are all zero contribute 64-p+1).
    Buckets never hit by any key are absent (estimate treats them as
    0). Combiner: per-batch max per bucket, then one grouped max."""
    from .relational import bucketed_reduce

    w = 64 - p
    mask = (np.uint64(1) << np.uint64(w)) - np.uint64(1)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = _fnv1a_u64(df[col].to_numpy())
        bucket = (h >> np.uint64(w)).astype(np.int64)
        rest = h & mask
        reg = np.where(rest == 0, w + 1, w + 1 - _bit_length_u64(rest)).astype(
            np.int64
        )
        out = pd.DataFrame({"bucket": bucket, "reg": reg})
        return out.groupby("bucket", sort=False, as_index=False)["reg"].max()

    partials = ds.select_columns([col]).map_batches(
        partial, batch_format="pandas"
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("bucket", sort=False, as_index=False)["reg"].max()

    return _fold_or_exchange(
        ds, partials, per_bucket,
        lambda p: bucketed_reduce(p, "bucket", per_bucket, partitions=1),
    )


def hll_estimate(registers: pd.DataFrame, p: int = P_DEFAULT) -> float:
    """Deterministic cardinality estimate from the register table
    (standard HLL with the small-range linear-counting correction)."""
    m = 1 << p
    regs = np.zeros(m, np.int64)
    regs[registers["bucket"].to_numpy()] = registers["reg"].to_numpy()
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if e <= 2.5 * m and zeros:
        e = m * np.log(m / zeros)
    return float(e)


# ---------------------------------------------------------------------------
# Bloom filter — the membership-sketch sibling of the HLL above, with
# the same exact-verifiability design: the operator's OUTPUT is the
# nonzero 32-bit words of the bitmap, a pure integer function of the
# input key SET, reconstructible in SQL (FNV-1a + bit slicing + bit_or).
# ---------------------------------------------------------------------------

BLOOM_BITS_LOG2 = 18  # m = 2^18 bits (32 KiB) → FPR ~1e-3 at 10k keys
BLOOM_K = 3  # bit positions = three disjoint 18-bit slices of the hash


def _bloom_positions(keys: np.ndarray) -> np.ndarray:
    """(n, BLOOM_K) bit positions: the k low disjoint BLOOM_BITS_LOG2-bit
    slices of the FNV-1a hash (k·log2(m) = 54 ≤ 64 — one hash, k
    independent-enough slices; integer-exact to reproduce in SQL)."""
    h = _fnv1a_u64(keys)
    m_mask = np.uint64((1 << BLOOM_BITS_LOG2) - 1)
    return np.stack(
        [
            ((h >> np.uint64(BLOOM_BITS_LOG2 * i)) & m_mask).astype(np.int64)
            for i in range(BLOOM_K)
        ],
        axis=1,
    )


def bloom_words(ds, col: str):
    """(word, bits) — the nonzero 32-bit words of the Bloom bitmap of
    ``col`` (int64 keys): word = bit_position >> 5, bits = OR of
    1 << (bit_position & 31). 32-bit words keep ``bits`` in int64 range
    for loss-free Arrow/SQL comparison. Combiner: per-batch OR per word
    (≤ 3n slim rows collapse to ≤ 8192), then one grouped OR — raw keys
    never shuffle."""
    from .relational import bucketed_reduce

    def _or_fold(words: np.ndarray, bits: np.ndarray) -> pd.DataFrame:
        """OR rows into a dense word table and emit the nonzero words —
        a pandas groupby.agg(bitwise_or.reduce) here would fall back to
        one python call per group (≤ 8192 of them per batch)."""
        table = np.zeros(1 << (BLOOM_BITS_LOG2 - 5), np.int64)
        np.bitwise_or.at(table, words, bits)
        nz = np.flatnonzero(table)
        return pd.DataFrame({"word": nz, "bits": table[nz]})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pos = _bloom_positions(df[col].to_numpy()).ravel()
        return _or_fold(pos >> 5, np.int64(1) << (pos & 31))

    partials = ds.select_columns([col]).map_batches(partial, batch_format="pandas")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return _or_fold(df["word"].to_numpy(), df["bits"].to_numpy())

    return _fold_or_exchange(
        ds, partials, per_bucket,
        lambda p: bucketed_reduce(p, "word", per_bucket, partitions=1),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch — frequency estimation (heavy hitters) with the same
# exact-verifiability design as the HLL/Bloom above: the operator's
# OUTPUT is the sketch's nonzero cells, a pure integer function of the
# input key MULTISET, reconstructible in SQL (FNV-1a + slice + count).
# ---------------------------------------------------------------------------

CMS_W_LOG2 = 12  # width = 2^12 = 4096 counters per row
CMS_D = 4  # depth: four disjoint 12-bit slices of the 64-bit hash


def _cms_positions(keys: np.ndarray) -> np.ndarray:
    """(n, CMS_D) counter columns: disjoint low CMS_W_LOG2-bit slices
    of the FNV-1a hash (d·log2(w) = 48 ≤ 64)."""
    h = _fnv1a_u64(keys)
    mask = np.uint64((1 << CMS_W_LOG2) - 1)
    return np.stack(
        [
            ((h >> np.uint64(CMS_W_LOG2 * i)) & mask).astype(np.int64)
            for i in range(CMS_D)
        ],
        axis=1,
    )


def cms_cells(ds, col: str):
    """(row, col, cnt) — the nonzero cells of the Count-Min table of
    ``col`` (int64 keys): for each depth row i, counter col is hash
    slice i, cnt the number of input rows landing there. Combiner:
    per-batch cell counts (≤ d·w slim rows per batch), one grouped sum
    — raw keys never shuffle. Estimation is driver-side over the
    ≤ 16384-cell table (:func:`cms_estimate`); estimates are exact
    upper bounds (min over rows ≥ true count, equality whp for heavy
    keys)."""
    from .relational import bucketed_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pos = _cms_positions(df[col].to_numpy())
        rows = np.tile(np.arange(CMS_D, dtype=np.int64), len(df))
        out = pd.DataFrame({"row": rows, "col": pos.ravel()})
        g = out.groupby(["row", "col"], sort=False).size().rename("cnt")
        return g.reset_index()

    partials = ds.select_columns([col]).map_batches(partial, batch_format="pandas")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["row", "col"], sort=False, as_index=False)["cnt"].sum()

    return _fold_or_exchange(
        ds, partials, per_bucket,
        lambda p: bucketed_reduce(p, "col", per_bucket, partitions=1),
    )


def cms_estimate(cells: pd.DataFrame, keys: np.ndarray) -> np.ndarray:
    """Frequency estimate per key: min over the d rows of the looked-up
    counters. Driver-side fold of the SKETCH (≤ d·w cells), never of
    data."""
    table = np.zeros((CMS_D, 1 << CMS_W_LOG2), np.int64)
    table[cells["row"].to_numpy(), cells["col"].to_numpy()] = (
        cells["cnt"].to_numpy()
    )
    pos = _cms_positions(np.asarray(keys))
    est = table[0, pos[:, 0]]
    for i in range(1, CMS_D):
        est = np.minimum(est, table[i, pos[:, i]])
    return est


def bloom_semi_join(left, right, on: str, how: str = "semi",
                    partitions: int | None = None):
    """Join-filter pushdown (the classic runtime Bloom filter of
    distributed SQL engines): build a Bloom sketch of the RIGHT side's
    keys (sketch exchange only — raw keys never shuffle), broadcast
    the ≤32 KiB bitmap with ``ray.put`` once, prefilter LEFT batches
    against it BEFORE the join shuffle, then run the exact
    :func:`~geotreehealth_ray.pipelines.relational.hash_join` semi
    join on the survivors. False positives pass the prefilter and are
    killed by the exact join; false negatives are impossible — so the
    OUTPUT IS BIT-IDENTICAL to ``hash_join(how='semi')`` while the
    big side's shuffle volume drops to roughly its match rate.

    At 100 TB this is the difference between shuffling the whole
    probe table and shuffling only the rows that can match. Only
    'semi' (and inner-style) probes benefit: an ANTI join needs the
    non-members kept, so the prefilter can't drop anything."""
    import ray

    from .relational import auto_partitions, hash_join

    if how != "semi":
        raise ValueError("bloom pushdown only accelerates semi joins")
    if partitions is None:
        # the exchange carries prefilter survivors + the slim probe key
        partitions = auto_partitions(left, right)
    # sketch table is ≤ 2^13 rows — a driver-side fold of the SKETCH,
    # never of data — then one object-store broadcast
    table = np.zeros(1 << (BLOOM_BITS_LOG2 - 5), np.int64)
    w = bloom_words(right, on).to_pandas()
    table[w["word"].to_numpy()] = w["bits"].to_numpy()
    table_ref = ray.put(table)

    def prefilter(df: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(table_ref)
        pos = _bloom_positions(df[on].to_numpy())
        hit = np.ones(len(df), bool)
        for i in range(BLOOM_K):
            p = pos[:, i]
            hit &= (t[p >> 5] & (np.int64(1) << (p & 31))) != 0
        return df[hit]

    survivors = left.map_batches(prefilter, batch_format="pandas")
    return hash_join(survivors, right, on=on, how="semi", partitions=partitions)


def bloom_might_contain(words: pd.DataFrame, keys: np.ndarray) -> np.ndarray:
    """Membership probe against a collected (word, bits) table: True ⇔
    all k bits set (no false negatives; false positives at the designed
    rate). Driver-side fold of the ≤ 8192-row sketch, never of data."""
    table = np.zeros(1 << (BLOOM_BITS_LOG2 - 5), np.int64)
    table[words["word"].to_numpy()] = words["bits"].to_numpy()
    pos = _bloom_positions(np.asarray(keys))
    hit = np.ones(len(pos), bool)
    for i in range(BLOOM_K):
        p = pos[:, i]
        hit &= (table[p >> 5] & (np.int64(1) << (p & 31))) != 0
    return hit


# ------------------------------------------------------- heavy hitters

def _mg_summary(counts: pd.Series, k: int) -> pd.Series:
    """Misra-Gries reduction of an exact count vector to ≤ k counters:
    subtract the (k+1)-th largest count from all, keep positives. The
    undercount introduced is ≤ n_batch/(k+1) (standard MG bound)."""
    if len(counts) <= k:
        return counts
    vals = counts.to_numpy()
    t = np.partition(vals, len(vals) - k - 1)[len(vals) - k - 1]
    kept = counts[counts > t] - t
    return kept


def heavy_hitters(ds, col: str, phi: float, key_alias: str = "key",
                  count_alias: str = "n"):
    """EXACT heavy hitters — (key, count) for every key whose count is
    ≥ ceil(phi·N) — in two passes, never a full-key groupby:

    pass 1: per-batch Misra-Gries summaries of k = ceil(2/phi) counters
    (vectorized value_counts + one np.partition). MG summaries are
    mergeable (Agarwal et al., "Mergeable Summaries"): summing them
    undercounts any key by at most N/(k+1) ≤ phi·N/2, so every true
    heavy hitter's summed estimate is ≥ phi·N/2 — the candidate cut at
    that bound has NO false negatives. Candidates are ≤ 2/phi keys by
    construction; raw keys never shuffle (summaries fold driver-side,
    ≤ k slim rows per block).

    pass 2: candidates broadcast via ray.put; per-batch exact counts of
    candidate keys fold to exact totals, thresholded at ceil(phi·N).
    Output is bit-identical to the full groupby's HAVING clause at any
    parallelism.

    Scale note: the driver folds ≤ k rows per BLOCK; at block counts
    where that bites (100 TB ⇒ ~10^6 blocks), route the summary fold
    through a one-partition exchange first (`_fold_or_exchange`
    pattern) — the merge is the same associative sum."""
    import math

    import ray
    import ray.data as rd

    k = int(math.ceil(2.0 / phi))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df[col].value_counts(sort=False)
        mg = _mg_summary(c, k)
        return pd.DataFrame({
            "key": mg.index.to_numpy(), "cnt": mg.to_numpy(),
            "nrows": np.full(len(mg), 0, np.int64),
        }).pipe(lambda d: pd.concat(
            [d, pd.DataFrame({"key": [np.int64(-1)], "cnt": [0],
                              "nrows": [len(df)]})],
            ignore_index=True,
        ))

    summ_batches = list(ds.select_columns([col]).map_batches(
        partial, batch_format="pandas"
    ).iter_batches(batch_size=None, batch_format="pandas"))
    if not summ_batches:  # fully-empty input yields no batches at all
        return rd.from_pandas(pd.DataFrame(
            {key_alias: pd.Series([], dtype=np.int64),
             count_alias: pd.Series([], dtype=np.int64)}))
    summ = pd.concat(summ_batches, ignore_index=True)
    n_total = int(summ["nrows"].sum())
    est = summ[summ["nrows"] == 0].groupby("key", sort=False)["cnt"].sum()
    if n_total == 0:
        return rd.from_pandas(pd.DataFrame(
            {key_alias: pd.Series([], dtype=np.int64),
             count_alias: pd.Series([], dtype=np.int64)}))
    thresh = int(math.ceil(phi * n_total))
    # recall-safe candidate cut: true count ≥ thresh ⇒ estimate ≥
    # thresh − floor(N/(k+1))
    cut = thresh - n_total // (k + 1)
    cands = est[est >= max(cut, 1)].index.to_numpy()
    empty = pd.DataFrame(
        {key_alias: pd.Series([], dtype=np.int64),
         count_alias: pd.Series([], dtype=np.int64)})
    if len(cands) == 0:
        # no key can reach the threshold (uniform-ish data) — skip
        # the recount pass entirely
        return rd.from_pandas(empty)
    cand_ref = ray.put(set(cands.tolist()))

    def recount(df: pd.DataFrame) -> pd.DataFrame:
        hit = df[df[col].isin(ray.get(cand_ref))]
        c = hit[col].value_counts(sort=False)
        return pd.DataFrame({"key": c.index.to_numpy(),
                             "cnt": c.to_numpy()})

    batches = list(ds.select_columns([col]).map_batches(
        recount, batch_format="pandas"
    ).iter_batches(batch_size=None, batch_format="pandas"))
    if not batches:  # every batch empty → Ray yields nothing
        return rd.from_pandas(empty)
    exact = pd.concat(batches, ignore_index=True)
    tot = exact.groupby("key", sort=False)["cnt"].sum()
    out = tot[tot >= thresh].sort_index()
    return rd.from_pandas(pd.DataFrame({
        key_alias: out.index.to_numpy().astype(np.int64),
        count_alias: out.to_numpy().astype(np.int64),
    }))


def equidepth_histogram(ds, id_col: str, val_col: str, bins: int = 64,
                        scale: int = 100):
    """Approximate quantiles via a sampled equi-depth histogram —
    parallelism-invariant AND exactly SQL-reconstructable (unlike
    KLL/t-digest, whose merge state depends on block order):

    pass 1 (sample): the ``bins`` rows with the smallest
    ``(md5(id), id)`` rank form a deterministic uniform sample (the
    md5-rank idiom of `split.weighted_sample`); its values, scaled to
    integers and sorted, are the bin boundaries.

    pass 2 (count): each batch sorts its values once and takes ONE
    vectorized searchsorted against the boundary vector → a ``bins``-row
    partial of cumulative counts. Zero shuffles touch the data; the
    partials reduce through a tiny fixed-size groupby.

    Output (bin, boundary_c, cum_count): ``cum_count`` is the EXACT
    number of rows with scaled value ≤ that boundary, so the q-quantile
    estimate — the first boundary with cum_count ≥ q·N — carries the
    standard order-statistic error O(1/sqrt(bins)) from sampling alone,
    never from the counting. The whole output is a pure function of the
    input multiset: the driver's DuckDB oracle rebuilds it with ORDER BY
    md5 LIMIT + a correlated count."""
    from .crown_ops import md5_hex_hash
    from .relational import global_topk, grouped_agg

    def to_scaled(df: pd.DataFrame) -> pd.DataFrame:
        v = np.floor(
            df[val_col].to_numpy(dtype=np.float64) * scale + 0.5
        ).astype("int64")
        return pd.DataFrame({id_col: df[id_col], "__v": v})

    scaled = ds.select_columns([id_col, val_col]).map_batches(
        to_scaled, batch_format="pandas"
    )

    def add_rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__h"] = md5_hex_hash(df[id_col].to_numpy())
        return df

    samp = global_topk(
        scaled.map_batches(add_rank, batch_format="pandas"),
        "__h", id_col, bins, descending=False,
    ).to_pandas()
    if samp.empty:  # empty input: no boundaries, empty histogram
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame({
            "bin": pd.Series([], dtype=np.int64),
            "boundary_c": pd.Series([], dtype=np.int64),
            "cum_count": pd.Series([], dtype=np.int64),
        }))
    bounds = np.sort(samp["__v"].to_numpy())
    m = len(bounds)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vs = np.sort(df["__v"].to_numpy())
        cum = np.searchsorted(vs, bounds, side="right").astype("int64")
        return pd.DataFrame({
            "bin": np.arange(1, m + 1, dtype=np.int64), "cnt": cum,
        })

    counts = grouped_agg(
        scaled.map_batches(partial, batch_format="pandas"),
        ["bin"], {"cum_count": "cnt"},
    )
    bound_of = dict(zip(range(1, m + 1), bounds.tolist()))

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["boundary_c"] = df["bin"].map(bound_of).astype("int64")
        return df[["bin", "boundary_c", "cum_count"]]

    return counts.map_batches(attach, batch_format="pandas")


def _splitmix_fin(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer on top of FNV-1a: sequential int64 keys
    leave FNV's HIGH bits strongly clustered (each trailing zero byte
    is a fixed bijective multiply — no avalanche), which starves HLL
    buckets (top-p bits) and wrecks the estimate. Two xorshift-multiply
    rounds restore avalanche; every step is >> / xor / mod-2^64
    multiply, so a SQL oracle reproduces it exactly."""
    with np.errstate(over="ignore"):
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return h ^ (h >> np.uint64(31))


def hll_registers_by_key(ds, key: str, col: str, p: int = P_DEFAULT):
    """Per-key HLL register tables — approximate COUNT(DISTINCT col)
    GROUP BY key with O(2^p) state per key instead of a distinct-pair
    shuffle: (key, bucket, reg) rows under the integer-exact FNV-1a +
    splitmix64-finalizer / leading-zero-rank formula (finalizer
    rationale in :func:`_splitmix_fin`), so the whole output remains a
    pure function of the input multiset (DuckDB oracle reconstructs it
    bit-for-bit). Combiner: per-batch (key, bucket) max — ≤ 2^p slim
    rows per key per batch — then one hash co-location on the key and
    a vectorized grouped max. The raw ``col`` values never shuffle.
    Feed the result to :func:`hll_estimate_by_key`."""
    from .relational import bucketed_reduce

    w = 64 - p
    mask = (np.uint64(1) << np.uint64(w)) - np.uint64(1)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = _splitmix_fin(_fnv1a_u64(df[col].to_numpy()))
        bucket = (h >> np.uint64(w)).astype(np.int64)
        rest = h & mask
        reg = np.where(
            rest == 0, w + 1, w + 1 - _bit_length_u64(rest)
        ).astype(np.int64)
        out = pd.DataFrame({key: df[key], "bucket": bucket, "reg": reg})
        return out.groupby([key, "bucket"], sort=False,
                           as_index=False)["reg"].max()

    partials = ds.select_columns([key, col]).map_batches(
        partial, batch_format="pandas"
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby([key, "bucket"], sort=False,
                          as_index=False)["reg"].max()

    return bucketed_reduce(partials, key, per_bucket)


def hll_estimate_by_key(registers: pd.DataFrame, key: str,
                        p: int = P_DEFAULT) -> pd.DataFrame:
    """Fold a (key, bucket, reg) table to per-key cardinality
    estimates (same raw + small-range estimator as
    :func:`hll_estimate`; absent buckets are zero registers)."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    out = []
    for k, g in registers.groupby(key, sort=False):
        regs = np.zeros(m)
        regs[g["bucket"].to_numpy()] = g["reg"].to_numpy()
        raw = alpha * m * m / np.sum(2.0 ** -regs)
        zeros = m - len(g)
        est = (
            m * np.log(m / zeros)
            if (raw <= 2.5 * m and zeros > 0) else raw
        )
        out.append((k, float(est)))
    return pd.DataFrame(out, columns=[key, "est_distinct"])
