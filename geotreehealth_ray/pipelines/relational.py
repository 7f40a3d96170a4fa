"""Relational building blocks used by the engine's query surface:
partial-aggregation groupbys, broadcast hash joins, windowed event
aggregates, argmax-per-key dedup. These are the Ray-Data-idiomatic
counterparts of the reference's pandas merge/groupby usage
(SURVEY.md §2.4-2.6) applied to arbitrary tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["grouped_agg", "broadcast_join", "latest_per_key",
           "asof_join", "hourly_window_agg", "bucketed_reduce",
           "sorted_group_map", "NUM_BUCKETS", "shuffle_partitions",
           "shuffle_partitions_for", "coalesce_for_shuffle",
           "input_bytes_estimate", "auto_partitions", "shuffle_size_hint",
           "combiner_partitions",
           "running_total", "topk_per_group",
           "grouped_median", "distinct_count", "lag_delta", "set_op",
           "rolling_sum", "grouped_quantile", "group_ranks",
           "pivot_counts", "unpivot", "grouped_mode", "rollup_sum", "cube_sum",
           "global_topk", "grouped_variance", "grouped_cov_stats",
           "grouped_concat", "cross_join", "explode_list",
           "time_window_sum", "funnel_match", "rank_fractions",
           "set_op_all", "first_last_value", "interval_overlap_pairs",
           "skyline", "cohort_retention"]

NUM_BUCKETS = 256


import contextlib
import contextvars

# Ambient input-size hint for exchanges whose callers passed no
# explicit partition count (transforms erase file lineage, so the
# pipeline fns can't estimate it themselves). Set once per query by
# the entry surface from the source tables' file bytes; read at PLAN
# BUILD time (partition counts bake into the plan inside the query
# call, before lazy execution starts).
_SIZE_HINT: contextvars.ContextVar = contextvars.ContextVar(
    "graft_shuffle_size_hint", default=None
)


@contextlib.contextmanager
def shuffle_size_hint(est_bytes: float | None):
    """Scope an in-memory size estimate over plan construction: every
    exchange built inside the block that has no explicit ``partitions``
    sizes itself by the sqrt rule on this estimate instead of the
    CPU-count default. An upper bound (e.g. the whole input directory)
    is fine — the rule is flat enough that 2× over-estimates move the
    count by ~1.4×. Only block sizing depends on it, never results."""
    token = _SIZE_HINT.set(est_bytes)
    try:
        yield
    finally:
        _SIZE_HINT.reset(token)


def shuffle_partitions() -> int:
    """Target partition count for sort-based all-to-all ops (groupby /
    sort). Ray Data's range shuffle creates #input-blocks × #output-
    blocks intermediate objects, so feeding a groupby hundreds of tiny
    blocks is quadratically worse than a handful of full ones (measured
    109 s → 16 s on the 240k-stem assign at 240 vs 64 blocks). 2 ×
    cluster CPUs keeps every core busy while bounding the exchange at
    (2·CPUs)² objects; on a multi-node cluster the CPU count scales
    with the cluster, so partition size — not count — tracks data.
    When a :func:`shuffle_size_hint` is in scope, the sqrt sizing rule
    on that estimate replaces the CPU-count heuristic."""
    hint = _SIZE_HINT.get()
    if hint:
        return _partitions_for_bytes(hint)
    return _cpu_default_partitions()


def _cpu_default_partitions() -> int:
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(8, 2 * cpus)


# Sort-exchange cost is two-sided: per-partition barrier overhead
# (sample + #maps × #reduces intermediate objects) grows with the
# partition count, while per-block take/concat/kernel cost grows with
# block SIZE — the measured optimum tracks sqrt(bytes). Swept at 32
# CPUs on the assign exchange: 174 MiB → best 16 parts (3.88 s; 8:
# 5.22, 64: 4.27, 128: 5.52), 690 MiB → best 32 (5.35 s; 16: 5.97,
# 64: 5.78, 96: 6.59), 10.3 GiB → best 160 (53 s; 83: 74, 256: 102,
# 320: 183), sub-5 MiB near-dup sorts → 4 parts (>80 % of their wall
# was 64-part barrier overhead). sqrt(est / 400 KiB) reproduces every
# optimum within noise (21 / 41 / 162 / 4).
SQRT_SHUFFLE_UNIT = 400 << 10  # sqrt rule denominator (~400 KiB)
MAX_SHUFFLE_BLOCK_BYTES = 128 << 20  # GiB blocks hit 32-bit-offset cliffs
SINGLE_BLOCK_BYTES = 2 << 20  # below this, one local-sort task wins


def shuffle_partitions_for(est_bytes: float | None) -> int:
    """Partition count for a sort exchange whose input size is known
    (estimated): sqrt(bytes / 400 KiB) — the empirical optimum of the
    barrier-overhead vs block-size tradeoff (sweep table above) — with
    a linear floor that keeps sorted blocks ≤ 128 MiB once the input
    is large enough that block size, not the single-node object-count
    quadratic, is the binding constraint (multi-node: the cap on
    partitions scales with cluster CPUs via ``shuffle_partitions``).
    Only block SIZING depends on the estimate — correctness never
    does."""
    if not est_bytes:
        return shuffle_partitions()
    return _partitions_for_bytes(est_bytes)


def _partitions_for_bytes(est_bytes: float) -> int:
    import math

    if est_bytes < SINGLE_BLOCK_BYTES:
        # below ~2 MiB the distributed sort's sample/exchange rounds
        # cost more than processing the whole stream in one task;
        # sorted_group_map's partitions=1 path skips the exchange
        return 1
    sqrt_rule = round(math.sqrt(est_bytes / SQRT_SHUFFLE_UNIT))
    size_floor = math.ceil(est_bytes / MAX_SHUFFLE_BLOCK_BYTES)
    return int(max(4, min(8 * _cpu_default_partitions(),
                          max(sqrt_rule, size_floor))))


def coalesce_for_shuffle(ds, partitions: int | None = None):
    """Coalesce (no shuffle — adjacent-block concat) to the target
    partition count before a sort-based wide op."""
    return ds.repartition(partitions or shuffle_partitions())


# Parquet bytes decompress ~3× into Arrow/pandas heap on the synthetic
# tables (text and int columns mixed); only block SIZING uses this.
PARQUET_EXPANSION = 3.0


def input_bytes_estimate(*dss, expansion: float = PARQUET_EXPANSION):
    """Best-effort in-memory size estimate of datasets whose plan root
    is still a file read: sum of source file bytes × decompression
    expansion. Metadata-only (``input_files`` never executes the plan).
    Returns None once transforms have erased file lineage or no file
    exists — callers fall back to the CPU-count default."""
    import os

    total = 0
    for ds in dss:
        try:
            files = ds.input_files()
        except Exception:
            return None
        if not files:
            return None
        for f in files:
            try:
                total += os.path.getsize(f)
            except OSError:
                pass
    return expansion * total if total else None


def combiner_partitions() -> int:
    """Partition count for the FINAL exchange of a partial/combiner
    aggregate: the stream holds at most one row per key per input
    block — orders of magnitude smaller than the data — so an eighth
    of the CPU-count default avoids paying 64 sort-barrier tasks on a
    stream of a few thousand rows while still scaling with cluster
    size (a 2048-CPU cluster gets 512 reduce partitions). Under a
    :func:`shuffle_size_hint`, sizes as an eighth of the hinted bytes."""
    hint = _SIZE_HINT.get()
    if hint:
        return _partitions_for_bytes(hint / 8.0)
    return max(4, _cpu_default_partitions() // 8)


def auto_partitions(*dss, scale: float = 1.0):
    """Size a sort exchange from its input datasets' file metadata:
    ``shuffle_partitions_for`` over the summed estimate × ``scale``
    (the op's fan-out/slim-down factor vs raw input — e.g. a combiner
    that ships one row per key per block passes scale << 1; a per-band
    explode passes its slim-row fan-out). None (caller keeps the
    default) when the inputs are not raw file reads."""
    est = input_bytes_estimate(*dss)
    return None if est is None else shuffle_partitions_for(scale * est)


def _row_hash(df: pd.DataFrame, keys: list[str]) -> np.ndarray:
    """Deterministic per-row uint64 hash of the key columns (ALL of a
    composite key's components — a hot first component must not funnel
    whole key families into one bucket). Stable across processes and
    parallelism levels (pd.util.hash_pandas_object, fixed seed)."""
    return pd.util.hash_pandas_object(
        df[keys] if len(keys) > 1 else df[keys[0]], index=False
    ).to_numpy().astype(np.uint64)


def _arrow_schema_of(ds) -> pa.Schema | None:
    """Best-effort Arrow schema of a Dataset: exact for Arrow-block
    plans; for pandas-block plans, numpy dtypes map through
    ``pa.from_numpy_dtype`` with object → string (the engine's pandas
    stages only carry strings as objects). None if the dataset is
    fully empty (schema unknowable)."""
    try:
        s = ds.schema()
    except Exception:
        return None
    if s is None:
        return None
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for name, typ in zip(s.names, s.types):
        if isinstance(typ, pa.DataType):
            fields.append(pa.field(name, typ))
            continue
        try:
            at = pa.from_numpy_dtype(typ)
        except (pa.ArrowNotImplementedError, TypeError):
            at = pa.string()
        fields.append(pa.field(name, at))
    return pa.schema(fields)


def _cast_column(col, target: pa.DataType):
    """Cast a pa.ChunkedArray/Array to target type (permissive)."""
    if col.type == target:
        return col
    return col.cast(target)


def _table_from_pandas(df: pd.DataFrame, schema: pa.Schema) -> pa.Table:
    """pandas → Arrow under an EXPLICIT schema: column-wise
    ``pa.array(..., from_pandas=True)`` so NaN/None become typed nulls
    (an int64 column that picked up NaN through a left join's
    null-extension comes back as int64-with-nulls, not float64 —
    dtypes survive the exchange)."""
    arrays = []
    for field in schema:
        col = df[field.name]
        try:
            arr = pa.array(col, type=field.type, from_pandas=True)
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            # lossy path (e.g. true floats meeting an int field after
            # an outer merge of mixed types): preserve values, let the
            # field widen
            arr = pa.array(col, from_pandas=True)
        arrays.append(arr)
    return pa.table(
        {f.name: a for f, a in zip(schema, arrays)}
    )


def _epoch_seconds(ts: pd.Series) -> pd.Series:
    """Timestamp column → int64 epoch seconds, unit-safe (pandas may
    carry datetime64[ns] or [us] depending on the source)."""
    return (
        pd.to_datetime(ts).astype("datetime64[us]").astype("int64") // 1_000_000
    )


def uniform_uint64_boundaries(partitions: int) -> list[int]:
    """Analytic sort boundaries for a uint64 key that is ALREADY
    uniform (a ``cells.mix64``-scrambled group key): the i/P quantiles
    of [0, 2^64) — no sampling pass can beat knowing the distribution.
    Feed to :func:`sorted_group_map` ``boundaries`` to collapse its
    exchange to ONE barrier (no sample round, no pre-coalesce)."""
    if partitions <= 1:
        return []
    step = (1 << 64) / partitions
    return [int(i * step) for i in range(1, partitions)]


def sorted_group_map(ds, keys: list[str], fn, batch_format: str = "pyarrow",
                     fn_kwargs: dict | None = None,
                     partitions: int | None = None,
                     boundaries: list | None = None):
    """Drop-in for ``ds.groupby(keys).map_groups(fn)`` with Ray's
    per-group block machinery taken out of the hot path: ONE sort
    exchange on ``keys``, then whole-block ``map_batches`` tasks that
    slice out each group zero-copy and call ``fn`` in a plain loop.

    Why: map_groups pays ~1.5 ms of block building per group, so a
    10^5-cell groupby spends ~10 s at 32 CPUs on scaffolding alone
    (measured: noop map_groups 10.0 s vs sort + whole-block
    map_batches 0.8 s on the same 1M-row input). That scaffolding was
    the entire "shuffle barrier floor" of the assign/chips pipelines.

    Correctness rests on Ray sort's range rule
    (table_block.py _find_partitions_sorted: partition i holds
    boundaries[i] <= x < boundaries[i+1], boundary membership counted
    by find_partition_index): rows with EQUAL sort keys are never
    split across output blocks, so every group arrives whole in
    exactly one task. ``fn`` keeps map_groups semantics — called once
    per group with all the group's rows, never with an empty group.
    Group ordering inside a task follows the sort; output is the
    concatenation of per-group results (Datasets are unordered, same
    as map_groups). Skewed keys make skewed BLOCKS here (one group is
    still one task's work) — salt hot keys upstream exactly as with
    map_groups: called once per group with all its rows, never with an
    empty group (empty sort partitions yield no output block at all —
    the block fn is a generator, so schema-less empty results never
    enter the stream).

    ``partitions=1`` (what shuffle_partitions_for returns for sub-2MiB
    streams) replaces the distributed sort with one coalesced block
    sorted locally inside the task — same grouping guarantee (all keys
    trivially co-reside), zero exchange rounds.

    ``boundaries``: precomputed range boundaries on the PRIMARY key
    (e.g. :func:`uniform_uint64_boundaries` for a mix64-uniform key).
    Skips BOTH the pre-coalesce barrier and the sort's sampling round
    — the exchange collapses to one map→reduce all-to-all whose
    reduce count is ``len(boundaries)+1``, independent of input block
    count. Grouping is unaffected (boundaries only choose WHERE key
    ranges split, never split equal keys)."""
    if fn_kwargs:
        import functools

        fn = functools.partial(fn, **fn_kwargs)
    local_sort = partitions == 1 and not boundaries
    if local_sort:
        # one block holds every key — sort inside the task instead of
        # paying the distributed sort's sample/exchange rounds
        sorted_ds = ds.repartition(1)
    elif boundaries:
        sorted_ds = ds.sort(keys, boundaries=boundaries)
    else:
        sorted_ds = coalesce_for_shuffle(ds, partitions).sort(keys)

    if batch_format == "pyarrow":

        def run_block(t: pa.Table):
            n = len(t)
            if n == 0:
                return
            if local_sort:
                t = t.sort_by([(k, "ascending") for k in keys])
            change = np.zeros(n - 1, dtype=bool)
            for k in keys:
                col = t[k].to_numpy(zero_copy_only=False)
                change |= col[1:] != col[:-1]
            starts = np.r_[0, np.flatnonzero(change) + 1, n]
            outs = [
                fn(t.slice(int(a), int(b - a)))
                for a, b in zip(starts[:-1], starts[1:])
            ]
            outs = [o for o in outs if len(o)]
            if outs:
                # one defragmenting copy: thousands of 1-group chunks
                # would tax every downstream to_numpy / take
                yield pa.concat_tables(outs).combine_chunks()

    else:

        def run_block(df: pd.DataFrame):
            n = len(df)
            if n == 0:
                return
            if local_sort:
                df = df.sort_values(keys, kind="stable", ignore_index=True)
            change = np.zeros(n - 1, dtype=bool)
            for k in keys:
                col = df[k].to_numpy()
                change |= col[1:] != col[:-1]
            starts = np.r_[0, np.flatnonzero(change) + 1, n]
            outs = [
                fn(df.iloc[int(a) : int(b)])
                for a, b in zip(starts[:-1], starts[1:])
            ]
            outs = [o for o in outs if len(o)]
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return sorted_ds.map_batches(
        run_block, batch_size=None, batch_format=batch_format
    )


def bucketed_reduce(ds, key: str | list[str], fn, num_buckets: int = NUM_BUCKETS,
                    partitions: int | None = None):
    """Hash-partitioned grouped reduce with VECTORIZED per-bucket
    kernels: rows are bucketed by a deterministic hash of ``key``,
    shuffled once (groupby on the bucket), and ``fn`` — a pandas
    function that must itself reduce per key (e.g. sort +
    drop_duplicates, groupby().agg) — runs once per BUCKET over
    thousands of keys at a time.

    This replaces ``groupby(key).map_groups(fn)`` wherever the key has
    high cardinality: per-group python overhead (~ms) × 10^5 groups
    dominates wall time, while 256 vectorized bucket calls cost ~nothing.
    The hash (pd.util.hash_pandas_object, fixed key) is deterministic
    across processes and parallelism levels. Composite keys hash ALL
    components (equal composites still co-locate, but a hot or
    low-cardinality FIRST component no longer funnels whole key
    families into one bucket)."""
    keys = [key] if isinstance(key, str) else list(key)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = _row_hash(df, keys)
        df = df.copy()
        df["__bucket"] = (h % num_buckets).astype(np.int64)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns="__bucket"))

    return sorted_group_map(
        ds.map_batches(add_bucket, batch_format="pandas"),
        ["__bucket"], per_bucket, batch_format="pandas",
        partitions=partitions,
    )


def grouped_agg(ds, keys: list[str], sum_cols: dict[str, str],
                mean_cols: dict[str, str] | None = None,
                count_alias: str | None = None,
                partitions: int | None = None):
    """groupby(keys) with sums/means/count, pre-aggregated per batch
    inside map_batches before the shuffle (combiner pattern — the
    shuffle moves one row per key per batch, not every input row).

    sum_cols / mean_cols: {output_name: input_col}.
    """
    mean_cols = mean_cols or {}
    need = sorted({*sum_cols.values(), *mean_cols.values()})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False)
        out = pd.DataFrame(index=g.size().index)
        for name, col in sum_cols.items():
            out[f"__s_{name}"] = g[col].sum()
        for name, col in mean_cols.items():
            out[f"__s_mean_{name}"] = g[col].sum()
        out["__n"] = g.size()
        return out.reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")

    def final_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False)
        out = pd.DataFrame(index=g.size().index)
        n = g["__n"].sum()
        for name in sum_cols:
            out[name] = g[f"__s_{name}"].sum()
        for name in mean_cols:
            out[name] = g[f"__s_mean_{name}"].sum() / n
        if count_alias:
            out[count_alias] = n.astype("int64")
        return out.reset_index()

    return bucketed_reduce(partials, keys, final_bucket,
                           partitions=partitions or combiner_partitions())


def broadcast_join(ds, small_df: pd.DataFrame, on: str | list[str],
                   how: str = "inner",
                   lsuffix: str = "", rsuffix: str = "_r"):
    """Hash join against a SMALL side broadcast once via ray.put and
    merged per batch (no shuffle — ray_guide 'Joins and lookups').
    Overlapping non-key columns take the SAME suffixes as
    :func:`hash_join` so `auto_join`'s plan choice never changes the
    output schema."""
    import ray

    ref = ray.put(small_df)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return df.merge(ray.get(ref), on=on, how=how,
                        suffixes=(lsuffix, rsuffix))

    return ds.map_batches(fn, batch_format="pandas")


def hash_join(left, right, on: str | list[str], how: str = "inner",
              num_buckets: int = NUM_BUCKETS,
              lsuffix: str = "", rsuffix: str = "_r",
              partitions: int | None = None,
              right_schema: "pa.Schema | list[str] | None" = None):
    """Co-partitioned hash join for two LARGE sides: both datasets are
    bucketed on a deterministic hash of the FULL key (all composite
    components) and merged per bucket — one shuffle each side, no
    broadcast (ray_guide 'Both sides large'). Columns common to both
    sides (other than the key) get the suffixes, applied STATICALLY
    before the exchange so the output schema never depends on runtime
    sizes.

    Arrow-native exchange: both sides are tagged and padded to one
    unified Arrow schema with TYPED null columns (never pandas
    object-dtype padding), so dtypes survive the union/sort and every
    block carries the same schema — no "RefBundle with a different
    schema" churn, no Arrow→pandas→Arrow round-trip on the wide path.
    Only the per-bucket merge itself drops to pandas (its hash join
    kernel), and the result is cast straight back to the precomputed
    output schema (int columns that picked up nulls via
    null-extension come back as int-with-nulls, not float64).

    Skew note: all rows of one key land in one bucket; for a key whose
    many-to-many match set exceeds a worker's heap, pre-salt the key
    (split one side by hash(row) % s, replicate the other side per
    salt) before calling — the same pattern assign.py uses for hot
    cells.

    how: 'inner' | 'left' | 'outer' (pandas merge semantics — 'outer'
    is a FULL OUTER join: both sides co-bucket on the key, so per-bucket
    outer merges compose to the global one), or 'semi' / 'anti'
    — left rows with ≥1 / 0 key matches on the right, LEFT COLUMNS
    ONLY, never duplicated by multiple right matches (SQL EXISTS /
    NOT EXISTS). The right side is projected to its key column before
    the shuffle, so a semi/anti probe moves one slim column.

    ``right_schema``: optional schema (or column-name list) describing
    the right side, used when the right dataset is FULLY EMPTY (Ray
    loses an empty dataset's schema): left/outer results are then
    null-extended with exactly these columns instead of silently
    passing the left side through unchanged."""
    keys = [on] if isinstance(on, str) else list(on)

    if how in ("semi", "anti"):
        # the probe only needs key presence: dedup per batch (combiner)
        # and ship the key columns alone
        def slim(df: pd.DataFrame) -> pd.DataFrame:
            return df[keys].drop_duplicates()

        right = right.map_batches(slim, batch_format="pandas")

    # a fully-empty side can lose its schema entirely (Ray returns
    # None); the join is still total — resolve it by semantics, using
    # right_schema when the caller provided one.
    lschema = _arrow_schema_of(left)
    rschema = _arrow_schema_of(right)
    if rschema is None:
        if how in ("inner", "semi"):
            return left.limit(0)
        if how in ("left", "outer") and right_schema is not None and lschema is not None:
            if isinstance(right_schema, list):
                right_schema = pa.schema(
                    [pa.field(c, pa.string()) for c in right_schema]
                )
            add = [f for f in right_schema
                   if f.name not in keys and f.name not in lschema.names]

            def extend(t: pa.Table) -> pa.Table:
                for f in add:
                    t = t.append_column(f, pa.nulls(len(t), f.type))
                return t

            return left.map_batches(extend, batch_format="pyarrow")
        return left  # left / anti / outer: every left row is unmatched
    if lschema is None:
        if how == "outer":
            return right
        return left.limit(0)

    lcols, rcols = list(lschema.names), list(rschema.names)
    overlap = [c for c in rcols if c in lcols and c not in keys]
    # static suffix renames (pandas-merge-compatible naming), applied
    # before the exchange; None marks an unresolvable collision
    lmap = {c: (c + lsuffix if c in overlap else c) for c in lcols}
    rmap = {c: (c + rsuffix if c in overlap else c) for c in rcols}
    if lsuffix == rsuffix and overlap and lsuffix == "":
        raise ValueError(
            f"overlapping non-key columns {overlap} need distinct suffixes"
        )

    # unified exchange schema: keys first (promoted types), then left
    # exclusives, then right exclusives — plus __side / __bucket
    def promoted(name: str) -> pa.DataType:
        lt = lschema.field(name).type
        rt = rschema.field(name).type
        if lt == rt:
            return lt
        try:
            return pa.unify_schemas(
                [pa.schema([pa.field(name, lt)]),
                 pa.schema([pa.field(name, rt)])],
                promote_options="permissive",
            ).field(name).type
        except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError):
            return lt

    key_fields = [pa.field(k, promoted(k)) for k in keys]
    lonly = [pa.field(lmap[c], lschema.field(c).type)
             for c in lcols if c not in keys]
    ronly = [pa.field(rmap[c], rschema.field(c).type)
             for c in rcols if c not in keys]
    if how in ("semi", "anti"):
        # semi/anti output keeps the LEFT side's own key names/types
        ronly = []
        out_schema = pa.schema(
            [pa.field(k, lschema.field(k).type) for k in keys] + lonly
        )
    else:
        out_schema = pa.schema(key_fields + lonly + ronly)
    ex_fields = key_fields + lonly + ronly
    ex_names = [f.name for f in ex_fields]

    def tag(side: int, schema: pa.Schema, colmap: dict):
        inv = {v: k for k, v in colmap.items()}

        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            cols = {}
            for f in ex_fields:
                src = inv.get(f.name, f.name)
                if src in schema.names and src in t.column_names:
                    cols[f.name] = _cast_column(t[src], f.type)
                else:
                    cols[f.name] = pa.nulls(n, f.type)
            # bucket on the full composite key (deterministic)
            kdf = pa.table({k: cols[k] for k in keys}).to_pandas()
            h = _row_hash(kdf, keys)
            cols["__side"] = pa.array(
                np.full(n, side, dtype=np.int8), pa.int8()
            )
            cols["__bucket"] = pa.array(
                (h % np.uint64(num_buckets)).astype(np.int64), pa.int64()
            )
            return pa.table(cols)

        return fn

    u = left.map_batches(tag(0, lschema, lmap), batch_format="pyarrow").union(
        right.map_batches(tag(1, rschema, rmap), batch_format="pyarrow")
    )

    lnames = [f.name for f in key_fields] + [f.name for f in lonly]
    rnames = [f.name for f in key_fields] + [f.name for f in ronly]

    def merge(t: pa.Table) -> pa.Table:
        side = t["__side"].to_numpy(zero_copy_only=False)
        lhs = t.select(lnames).take(np.flatnonzero(side == 0)).to_pandas()
        rhs = t.select(rnames).take(np.flatnonzero(side == 1)).to_pandas()
        if how in ("semi", "anti"):
            if len(keys) == 1:
                present = lhs[keys[0]].isin(rhs[keys[0]].to_numpy())
            else:
                m = lhs.merge(rhs.drop_duplicates(), on=keys, how="left",
                              indicator=True)
                present = (m["_merge"] == "both").to_numpy()
            res = lhs[present if how == "semi" else ~present]
        else:
            res = lhs.merge(rhs, on=keys, how=how)
        return _table_from_pandas(res, out_schema)

    return sorted_group_map(u, ["__bucket"], merge, batch_format="pyarrow",
                            partitions=partitions)


def sessionize(events, key: str = "user_id", ts_col: str = "ts",
               gap_s: int = 1800):
    """Gap-based session windows per key: consecutive events closer
    than ``gap_s`` seconds share a session. Output: (key, session_start
    epoch-s, n_events, duration_s). Equivalent SQL: lag() + cumulative
    sum of new-session flags. Ordering contract: per-key order by
    (ts, event_id) — stated per SURVEY.md §2.9 (Ray Data has no
    watermarks; the reference is strictly batch too)."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col, "event_id"], kind="stable")
        epoch = _epoch_seconds(df[ts_col])
        new_key = df[key] != df[key].shift(1)
        gap = epoch - epoch.shift(1).fillna(-10**18).astype("int64")
        new_sess = new_key | (gap > gap_s)
        sess_id = new_sess.cumsum()
        g = pd.DataFrame(
            {key: df[key], "sess": sess_id, "epoch": epoch}
        ).groupby("sess", sort=False)
        out = pd.DataFrame(
            {
                key: g[key].first(),
                "session_start": g["epoch"].min().astype("int64"),
                "n_events": g["epoch"].size().astype("int64"),
                "duration_s": (g["epoch"].max() - g["epoch"].min()).astype("int64"),
            }
        )
        return out.reset_index(drop=True)

    return bucketed_reduce(events, key, per_bucket)


def asof_join(left, right, key: str = "user_id", ts_col: str = "ts",
              id_col: str = "event_id", right_vals: tuple = ("value",)):
    """Distributed as-of join: for each left row, the LATEST right row
    of the same key with ``right.ts <= left.ts`` (inner join; ties on
    right ts broken by max right id — deterministic). Output:
    (id_col, key, match_<id_col>, match_<v>..., lag_us).

    Ray-Data shape: ONE hash shuffle — both sides are tagged, unioned
    and bucketed by ``key`` (`bucketed_reduce`), then a vectorized
    ``pandas.merge_asof`` (sorted-merge, O(n log n)) runs per bucket
    across thousands of keys at once. DuckDB equivalent: ``ASOF JOIN``.

    Partitioning assumption (documented per the custom-operator rule):
    the full right-side history of one KEY must co-reside in a bucket —
    as-of semantics admit no correct per-key time split without
    replicating right rows across time-slice boundaries; per-key
    history is bounded in the target workloads (events per user)."""
    _COLS = ["kind", id_col, key, ts_col, *right_vals]

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[id_col, key, ts_col]].copy()
        out["kind"] = np.int8(0)
        for v in right_vals:
            out[v] = np.nan
        return out.reindex(columns=_COLS)

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[id_col, key, ts_col, *right_vals]].copy()
        out["kind"] = np.int8(1)
        return out.reindex(columns=_COLS)

    out_cols = {id_col: "int64", key: "int64", f"match_{id_col}": "int64"}
    out_cols.update({f"match_{v}": "float64" for v in right_vals})
    out_cols["lag_us"] = "int64"

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({c: pd.array([], t) for c, t in out_cols.items()})

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["kind"] == 0][[id_col, key, ts_col]].sort_values(
            ts_col, kind="stable"
        )
        r = df[df["kind"] == 1][[id_col, key, ts_col, *right_vals]].sort_values(
            [ts_col, id_col], kind="stable"
        ).drop_duplicates([key, ts_col], keep="last")
        if l.empty or r.empty:
            return _empty()
        r = r.copy()
        r["__rts"] = r[ts_col]  # right ts survives the merge for lag
        m = pd.merge_asof(
            l, r, on=ts_col, by=key, direction="backward",
            suffixes=("", "_r"),
        )
        m = m[m[f"{id_col}_r"].notna()]
        if m.empty:
            return _empty()
        lag = (m[ts_col] - m["__rts"]).to_numpy().astype(
            "timedelta64[us]"
        ).astype("int64")
        out = {
            id_col: m[id_col].astype("int64"),
            key: m[key].astype("int64"),
            f"match_{id_col}": m[f"{id_col}_r"].astype("int64"),
        }
        for v in right_vals:
            out[f"match_{v}"] = m[v].astype("float64")
        out["lag_us"] = lag
        return pd.DataFrame(out).reset_index(drop=True)

    both = left.map_batches(tag_left, batch_format="pandas").union(
        right.map_batches(tag_right, batch_format="pandas")
    )
    return bucketed_reduce(both, key, per_bucket)


def latest_per_key(ds, key: str, order_cols: list[str]):
    """One row per key: max by order_cols (desc), deterministic
    (the 'latest record wins' dedup — reference batch_sam.py:764-765)."""

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            [key] + order_cols,
            ascending=[True] + [False] * len(order_cols),
            kind="stable",
        )
        return df.drop_duplicates(key, keep="first")

    return bucketed_reduce(ds, key, pick)


def running_total(ds, key: str = "user_id", ts_col: str = "ts",
                  id_col: str = "event_id", value_col: str = "value"):
    """Cumulative windowed aggregate per key: each row gets the running
    sum of ``value_col`` over all rows of the same key up to and
    including itself, ordered by (ts, id). The classic streaming
    running-state operator, batch-expressed: one hash shuffle
    (`bucketed_reduce` co-locates each key's history), then a
    vectorized groupby().cumsum() per bucket. Sums are integer
    micro-units (floor(v*1e6+0.5)) so they are exact and match SQL
    ``SUM(...) OVER (PARTITION BY key ORDER BY ts, id ROWS UNBOUNDED
    PRECEDING)`` bit-for-bit. Output: (id, key, seq, running_micro).

    Partitioning assumption: one key's full history co-resides in a
    bucket (same contract as `asof_join`)."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col, id_col], kind="stable")
        micro = np.floor(df[value_col].to_numpy() * 1e6 + 0.5).astype(np.int64)
        g = pd.DataFrame({key: df[key], "__m": micro}).groupby(key, sort=False)
        return pd.DataFrame(
            {
                id_col: df[id_col].astype("int64"),
                key: df[key].astype("int64"),
                "seq": (g.cumcount() + 1).astype("int64"),
                "running_micro": g["__m"].cumsum().astype("int64"),
            }
        ).reset_index(drop=True)

    return bucketed_reduce(ds, key, per_bucket)


def rolling_sum(ds, key: str = "user_id", ts_col: str = "ts",
                id_col: str = "event_id", value_col: str = "value",
                window: int = 3):
    """Sliding row-based window aggregate per key: each row gets the
    sum of ``value_col`` over the last ``window`` rows (inclusive) of
    its key, ordered by (ts, id) — SQL ``SUM(...) OVER (PARTITION BY
    key ORDER BY ts, id ROWS BETWEEN window-1 PRECEDING AND CURRENT
    ROW)``. Completes the window family (tumbling `hourly_window_agg`,
    session `sessionize`, cumulative `running_total`, lag `lag_delta`).
    Exact int64 micro-unit sums; same key-co-residence contract and
    single hash shuffle as the others."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col, id_col], kind="stable").reset_index(
            drop=True
        )
        micro = np.floor(df[value_col].to_numpy() * 1e6 + 0.5).astype(np.int64)
        work = pd.DataFrame({key: df[key], "__m": micro})
        roll = (
            work.groupby(key, sort=False)["__m"]
            .rolling(window, min_periods=1)
            .sum()
            .reset_index(level=0, drop=True)
            .sort_index()
        )
        return pd.DataFrame(
            {
                id_col: df[id_col].astype("int64"),
                key: df[key].astype("int64"),
                "rolling_micro": roll.to_numpy().astype("int64"),
            }
        )

    return bucketed_reduce(
        ds.select_columns([id_col, key, ts_col, value_col]), key, per_bucket
    )


def topk_per_group(ds, key: str, order_col: str, id_col: str, k: int = 3):
    """Top-k rows per key by (order_col desc, id asc) with a dense
    1-based rank — the grouped analogue of global sort+limit
    (ROW_NUMBER() ... QUALIFY rn <= k in SQL). One hash shuffle, then
    a vectorized sort + cumcount per bucket; ties on order_col broken
    by id so output is deterministic at any parallelism."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            [key, order_col, id_col], ascending=[True, False, True],
            kind="stable",
        )
        rnk = df.groupby(key, sort=False).cumcount() + 1
        out = df.loc[rnk <= k, [key, id_col, order_col]].copy()
        out["rnk"] = rnk[rnk <= k].astype("int64")
        return out.reset_index(drop=True)

    return bucketed_reduce(ds, key, per_bucket)


def grouped_median(ds, key: str, val_col: str, alias: str = "median_val"):
    """Exact lower-median per key: the element at 0-based index
    (n-1)//2 of the key's sorted values (== SQL row_number()=(n+1)//2
    over ORDER BY val). Deterministic under ties — the VALUE at that
    rank is unique even when rows tie. Holistic aggregate, so unlike
    `grouped_agg` there is no combiner: each key's values co-reside in
    one hash bucket and one vectorized sort + take runs per bucket."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, val_col], kind="stable").reset_index(drop=True)
        sizes = df.groupby(key, sort=False).size()
        starts = np.r_[0, np.cumsum(sizes.to_numpy())[:-1]]
        idx = starts + (sizes.to_numpy() - 1) // 2
        out = df.iloc[idx][[key, val_col]].rename(columns={val_col: alias})
        return out.reset_index(drop=True)

    return bucketed_reduce(ds.select_columns([key, val_col]), key, per_bucket)


def grouped_quantile(ds, key: str, val_col: str, num: int, den: int,
                     alias: str = "quantile_val"):
    """Exact discrete p-quantile per key for rational p = num/den: the
    VALUE at 1-indexed rank ceil(n·num/den) of the key's sorted values
    (quantile_disc semantics). The rank is computed with integer
    arithmetic — ``(n·num + den − 1) // den`` — so the engine and a SQL
    oracle using ``//`` agree bit-for-bit with no float ceil() hazards
    (e.g. ceil(0.9·10) = 10.000…2 → 11 in binary float). Holistic like
    :func:`grouped_median`: one hash-bucket co-location, one vectorized
    sort + take per bucket."""
    if not (0 < num <= den):
        raise ValueError("need 0 < num <= den")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, val_col], kind="stable").reset_index(drop=True)
        sizes = df.groupby(key, sort=False).size().to_numpy()
        starts = np.r_[0, np.cumsum(sizes)[:-1]]
        idx = starts + (sizes * num + den - 1) // den - 1
        out = df.iloc[idx][[key, val_col]].rename(columns={val_col: alias})
        return out.reset_index(drop=True)

    return bucketed_reduce(ds.select_columns([key, val_col]), key, per_bucket)


def grouped_quantile_cont(ds, key: str, val_col: str, num: int, den: int,
                          alias: str = "q_scaled"):
    """Exact interpolated p-quantile per key (PERCENTILE_CONT
    semantics) for rational p = num/den, kept in integers end to end:
    with 0-indexed sorted values v_0..v_{n-1}, the continuous position
    is pos = (n−1)·num/den; writing lo = ⌊pos⌋ and rem = (n−1)·num mod
    den, the result ×den is

        q_scaled = v_lo·(den − rem) + v_{lo+1}·rem

    — the linear interpolation scaled by den so it stays an exact
    int64 (the consumer divides by den; SQL reconstructs the identical
    integer with two CASE-summed row_number probes, no float ever).
    Holistic like :func:`grouped_quantile`: one hash-bucket
    co-location, one vectorized sort + gather per bucket. ``val_col``
    must already be integer-scaled (cents / micro-units)."""
    if not (0 <= num <= den) or den <= 0:
        raise ValueError("need 0 <= num <= den, den > 0")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, val_col], kind="stable").reset_index(drop=True)
        sizes = df.groupby(key, sort=False).size().to_numpy()
        starts = np.r_[0, np.cumsum(sizes)[:-1]]
        p_num = (sizes - 1) * num
        lo = p_num // den
        rem = p_num % den
        v = df[val_col].to_numpy()
        v_lo = v[starts + lo]
        v_hi = v[starts + np.minimum(lo + 1, sizes - 1)]
        q = v_lo * (den - rem) + v_hi * rem
        keys = df[key].to_numpy()[starts]
        return pd.DataFrame({key: keys, alias: q.astype("int64")})

    return bucketed_reduce(ds.select_columns([key, val_col]), key, per_bucket)


def global_topk(ds, order_col: str, id_col: str, k: int,
                descending: bool = True):
    """Global ORDER BY + LIMIT k without the global sort: each block
    keeps its local top-k (a map task — nothing shuffles), then ONE
    final task sorts the ≤ k·#blocks survivors. At 100 TB a
    ``sort().limit(k)`` pays a full all-to-all range exchange to then
    discard everything but k rows; this moves k rows per block,
    period. Ties on ``order_col`` break by ``id_col`` asc, so the
    result is deterministic at any parallelism and matches SQL
    ``ORDER BY val DESC, id ASC LIMIT k``."""
    asc = [not descending, True]

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            [order_col, id_col], ascending=asc, kind="stable"
        ).head(k)

    survivors = ds.map_batches(local_topk, batch_format="pandas")
    # final reduce: one task over the slim survivor set
    return (
        survivors.repartition(1)
        .map_batches(local_topk, batch_size=None, batch_format="pandas")
    )


def rollup_sum(ds, keys: list[str], val_col: str, scale: int = 100,
               sum_alias: str = "sum_scaled", count_alias: str = "n"):
    """GROUP BY ROLLUP(keys…): the finest aggregate plus every
    prefix-subtotal level up to the grand total, subtotal key columns
    NULL — one dataset, union of levels.

    Cost model: ONE pass over the data (per-batch integer-scaled
    partials), one hash exchange for the finest level; every coarser
    level re-aggregates the FINEST AGGREGATE (size = #distinct key
    combos, not #rows), so subtotals are near-free. Values are
    ``floor(v·scale + 0.5)`` int64 — exact, SQL-reproducible sums."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        scaled = np.floor(df[val_col].to_numpy() * scale + 0.5).astype(np.int64)
        t = pd.DataFrame({k: df[k] for k in keys})
        t["__s"] = scaled
        g = t.groupby(keys, sort=False)["__s"].agg(["sum", "size"]).reset_index()
        g.columns = keys + [sum_alias, count_alias]
        return g

    partials = ds.select_columns(keys + [val_col]).map_batches(
        partial, batch_format="pandas"
    )

    def reducer(cols):
        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            return (
                df.groupby(cols, sort=False)[[sum_alias, count_alias]]
                .sum().reset_index()
            )

        return per_bucket

    def widen(level_cols):
        # pad the missing (rolled-up) key columns with NULL so every
        # level shares one schema for the union
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            for k in keys:
                if k not in df.columns:
                    df[k] = None
            return df[keys + [sum_alias, count_alias]]

        return fn

    # finest feeds both its own output level and the subtotal chain;
    # materialize (bounded: #distinct key combos) so the data pass and
    # each subtotal level run once, not once per consumer branch
    finest = bucketed_reduce(partials, keys[0], reducer(keys),
                             partitions=combiner_partitions()).materialize()
    if finest.count() == 0:
        # SQL grouping sets on an EMPTY input still emit the () set:
        # one grand-total row (keys NULL, sum NULL, n 0) — DuckDB
        # semantics
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame({
            **{k: [None] for k in keys},
            sum_alias: [np.nan],
            count_alias: [0],
        }))
    levels = [finest.map_batches(widen(keys), batch_format="pandas")]
    prev = finest
    for i in range(len(keys) - 1, 0, -1):
        cols = keys[:i]
        # each subtotal re-aggregates the PREVIOUS (already tiny) level
        lvl = bucketed_reduce(
            prev.select_columns(cols + [sum_alias, count_alias]),
            cols[0], reducer(cols), partitions=4,
        )
        levels.append(lvl.map_batches(widen(cols), batch_format="pandas"))
        prev = lvl

    # grand total: block partials of the coarsest level → driver fold
    # of ≤ #blocks slim rows (never of data)
    def block_total(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {sum_alias: [df[sum_alias].sum()], count_alias: [df[count_alias].sum()]}
        )

    tot = (
        prev.select_columns([sum_alias, count_alias])
        .map_batches(block_total, batch_format="pandas").to_pandas()
    )
    grand = pd.DataFrame(
        {
            **{k: [None] for k in keys},
            sum_alias: [int(tot[sum_alias].sum())],
            count_alias: [int(tot[count_alias].sum())],
        }
    )
    import ray.data as rd

    levels.append(rd.from_pandas(grand))
    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def cube_sum(ds, keys: list[str], val_col: str, scale: int = 100,
             sum_alias: str = "sum_scaled", count_alias: str = "n"):
    """GROUP BY CUBE(keys…): the aggregate at EVERY subset of the key
    columns (2^k grouping sets incl. the grand total), rolled-up key
    columns NULL — one dataset, union of levels.

    Same cost model as :func:`rollup_sum`: ONE pass over the data for
    the finest level (per-batch integer-scaled partials → one hash
    exchange); every other grouping set re-aggregates the FINEST
    AGGREGATE (size = #distinct key combos, not #rows). k is a schema
    contract (2^k sets), so this is for the 2-4 dashboard-dimension
    case, not arbitrary-width keys."""
    from itertools import combinations

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        scaled = np.floor(df[val_col].to_numpy() * scale + 0.5).astype(np.int64)
        t = pd.DataFrame({k: df[k] for k in keys})
        t["__s"] = scaled
        g = t.groupby(keys, sort=False)["__s"].agg(["sum", "size"]).reset_index()
        g.columns = keys + [sum_alias, count_alias]
        return g

    partials = ds.select_columns(keys + [val_col]).map_batches(
        partial, batch_format="pandas"
    )

    def reducer(cols):
        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            return (
                df.groupby(cols, sort=False)[[sum_alias, count_alias]]
                .sum().reset_index()
            )

        return per_bucket

    def widen(level_cols):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            for k in keys:
                if k not in df.columns:
                    df[k] = None
            return df[keys + [sum_alias, count_alias]]

        return fn

    # finest is reused by every other grouping set and the grand total;
    # materialize it (bounded: #distinct key combos, never #rows) so the
    # data pass runs once instead of once per branch
    finest = bucketed_reduce(partials, keys[0], reducer(keys),
                             partitions=combiner_partitions()).materialize()
    if finest.count() == 0:
        # SQL grouping sets on an EMPTY input still emit the () set:
        # one grand-total row (keys NULL, sum NULL, n 0) — DuckDB
        # semantics
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame({
            **{k: [None] for k in keys},
            sum_alias: [np.nan],
            count_alias: [0],
        }))
    levels = [finest.map_batches(widen(keys), batch_format="pandas")]
    for r in range(len(keys) - 1, 0, -1):
        for cols in combinations(keys, r):
            cols = list(cols)
            lvl = bucketed_reduce(
                finest.select_columns(cols + [sum_alias, count_alias]),
                cols[0], reducer(cols), partitions=4,
            )
            levels.append(lvl.map_batches(widen(cols), batch_format="pandas"))

    # grand total: block partials of the finest level → driver fold of
    # ≤ #blocks slim rows (never of data)
    def block_total(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {sum_alias: [df[sum_alias].sum()], count_alias: [df[count_alias].sum()]}
        )

    tot = (
        finest.select_columns([sum_alias, count_alias])
        .map_batches(block_total, batch_format="pandas").to_pandas()
    )
    grand = pd.DataFrame(
        {
            **{k: [None] for k in keys},
            sum_alias: [int(tot[sum_alias].sum())],
            count_alias: [int(tot[count_alias].sum())],
        }
    )
    import ray.data as rd

    levels.append(rd.from_pandas(grand))
    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def grouping_sets_sum(ds, sets: list[list[str]], val_col: str,
                      scale: int = 100, sum_alias: str = "sum_scaled",
                      count_alias: str = "n"):
    """GROUP BY GROUPING SETS((…), (…), …): the aggregate at each
    EXPLICIT set of key columns (the general form ROLLUP and CUBE
    specialize; [] = grand total), absent key columns NULL — one
    dataset, union of levels. Same cost model as rollup_sum/cube_sum:
    ONE data pass builds the finest aggregate over the union of all
    set columns; every requested set re-aggregates that (bounded by
    #distinct key combos, never #rows)."""
    keys = list(dict.fromkeys(c for s in sets for c in s))
    if not keys:
        raise ValueError("at least one non-empty grouping set required")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        scaled = np.floor(df[val_col].to_numpy() * scale + 0.5).astype(np.int64)
        t = pd.DataFrame({k: df[k] for k in keys})
        t["__s"] = scaled
        g = t.groupby(keys, sort=False)["__s"].agg(["sum", "size"]).reset_index()
        g.columns = keys + [sum_alias, count_alias]
        return g

    partials = ds.select_columns(keys + [val_col]).map_batches(
        partial, batch_format="pandas"
    )

    def reducer(cols):
        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            return (
                df.groupby(cols, sort=False)[[sum_alias, count_alias]]
                .sum().reset_index()
            )

        return per_bucket

    def widen(level_cols):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            for k in keys:
                if k not in df.columns:
                    df[k] = None
            return df[keys + [sum_alias, count_alias]]

        return fn

    finest = bucketed_reduce(partials, keys[0], reducer(keys),
                             partitions=combiner_partitions()).materialize()
    if finest.count() == 0:
        # SQL semantics on an EMPTY input: only the () grouping set
        # emits a row (grand total, keys NULL, sum NULL, n 0); without
        # it the result is empty — DuckDB-verified
        import ray.data as rd

        if not any(len(s) == 0 for s in sets):
            return rd.from_pandas(pd.DataFrame(
                {**{k: pd.Series([], dtype=object) for k in keys},
                 sum_alias: pd.Series([], dtype=np.float64),
                 count_alias: pd.Series([], dtype=np.int64)}))
        return rd.from_pandas(pd.DataFrame({
            **{k: [None] for k in keys},
            sum_alias: [np.nan],
            count_alias: [0],
        }))
    import ray.data as rd

    levels = []
    for s in sets:
        cols = list(s)
        if cols == keys:
            levels.append(finest.map_batches(widen(keys), batch_format="pandas"))
            continue
        if not cols:
            def block_total(df: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame({
                    sum_alias: [df[sum_alias].sum()],
                    count_alias: [df[count_alias].sum()],
                })

            tot = (
                finest.select_columns([sum_alias, count_alias])
                .map_batches(block_total, batch_format="pandas").to_pandas()
            )
            levels.append(rd.from_pandas(pd.DataFrame({
                **{k: [None] for k in keys},
                sum_alias: [int(tot[sum_alias].sum())],
                count_alias: [int(tot[count_alias].sum())],
            })))
            continue
        lvl = bucketed_reduce(
            finest.select_columns(cols + [sum_alias, count_alias]),
            cols[0], reducer(cols), partitions=4,
        )
        levels.append(lvl.map_batches(widen(cols), batch_format="pandas"))
    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def grouped_variance(ds, keys: list[str], val_col: str, scale: int = 100,
                     var_alias: str = "var_micro"):
    """Per-key sample VARIANCE with the distributive-partials pattern:
    each batch emits exact int64 (n, Σx, Σx²) in integer-scaled units,
    one slim hash exchange reduces them, and the variance is derived
    per key by pure integer arithmetic — bit-reproducible at any
    parallelism (float Welford partials would not be).

    Output: keys, n, sum_scaled, sumsq_scaled (exact sufficient
    statistics) + ``var_alias`` = floor(10^6 · (n·Σx² − (Σx)²) /
    (n·(n−1))) — the sample variance in scaled² micro-units (NULL-free:
    0 when n == 1). The numerator is ≥ 0, so Python ``//`` and SQL
    integer division agree (they differ on negatives — DuckDB
    truncates, Python floors). Caller sizes ``scale`` so n·Σx² fits a
    128-bit product; the derivation uses Python ints (never wraps).
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = np.floor(df[val_col].to_numpy() * scale + 0.5).astype(np.int64)
        t = pd.DataFrame({k: df[k] for k in keys})
        t["__x"] = x
        t["__xx"] = x * x
        g = t.groupby(keys, sort=False)
        out = g.agg(n=("__x", "size"), sum_scaled=("__x", "sum"),
                    sumsq_scaled=("__xx", "sum")).reset_index()
        return out

    partials = ds.select_columns(keys + [val_col]).map_batches(
        partial, batch_format="pandas"
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False)[["n", "sum_scaled", "sumsq_scaled"]]
        out = g.sum().reset_index()
        # python-int arithmetic: n·Σx² overflows int64 long before the
        # inputs do
        var = []
        for n, s, ss in zip(out["n"], out["sum_scaled"], out["sumsq_scaled"]):
            n, s, ss = int(n), int(s), int(ss)
            var.append(0 if n < 2 else (10**6 * (n * ss - s * s)) // (n * (n - 1)))
        out[var_alias] = pd.array(var, dtype="int64")
        return out

    return bucketed_reduce(partials, keys[0] if len(keys) == 1 else keys,
                           finalize, partitions=combiner_partitions())


def grouped_cov_stats(ds, keys: list[str], x_col: str, y_col: str,
                      x_scale: int = 1, y_scale: int = 100):
    """Per-key COVARIANCE sufficient statistics: exact int64
    (n, Σx, Σy, Σxy) partials per batch → one slim exchange →
    ``cov_num`` = n·Σxy − Σx·Σy (the covariance numerator; divide by n²
    for population covariance). The division is left to the consumer
    because the numerator can be NEGATIVE and SQL/Python integer
    division disagree on negatives — the integers themselves are
    engine-independent and exactly comparable.

    Caller contract: size scales so n·Σxy and Σx·Σy fit int64
    (n · max|x| · max|y| · n < 2^63)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = np.floor(df[x_col].to_numpy() * x_scale + 0.5).astype(np.int64)
        y = np.floor(df[y_col].to_numpy() * y_scale + 0.5).astype(np.int64)
        t = pd.DataFrame({k: df[k] for k in keys})
        t["__x"] = x
        t["__y"] = y
        t["__xy"] = x * y
        g = t.groupby(keys, sort=False)
        return g.agg(n=("__x", "size"), sum_x=("__x", "sum"),
                     sum_y=("__y", "sum"), sum_xy=("__xy", "sum")).reset_index()

    partials = ds.select_columns(keys + [x_col, y_col]).map_batches(
        partial, batch_format="pandas"
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(keys, sort=False)[["n", "sum_x", "sum_y", "sum_xy"]]
            .sum().reset_index()
        )
        out["cov_num"] = out["n"] * out["sum_xy"] - out["sum_x"] * out["sum_y"]
        return out

    return bucketed_reduce(partials, keys[0] if len(keys) == 1 else keys,
                           finalize, partitions=combiner_partitions())


def grouped_corr_stats(ds, keys: list[str], x_col: str, y_col: str,
                       x_scale: int = 1, y_scale: int = 100):
    """Per-key Pearson CORRELATION sufficient statistics: exact int64
    (n, Σx, Σy, Σx², Σy², Σxy) partials per batch → one slim exchange →
    integer numerator ``corr_num`` = n·Σxy − Σx·Σy and the two variance
    numerators ``var_x_num`` / ``var_y_num`` (n·Σx² − (Σx)², n·Σy² −
    (Σy)²). corr = corr_num / sqrt(var_x_num · var_y_num) — the sqrt
    and division are left to the consumer so the shipped values stay
    engine-independent integers (same contract as grouped_cov_stats).

    Caller contract: n · max|x|² · n fits int64."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = np.floor(df[x_col].to_numpy() * x_scale + 0.5).astype(np.int64)
        y = np.floor(df[y_col].to_numpy() * y_scale + 0.5).astype(np.int64)
        t = pd.DataFrame({k: df[k] for k in keys})
        t["__x"] = x
        t["__y"] = y
        t["__xx"] = x * x
        t["__yy"] = y * y
        t["__xy"] = x * y
        g = t.groupby(keys, sort=False)
        return g.agg(n=("__x", "size"), sum_x=("__x", "sum"),
                     sum_y=("__y", "sum"), sum_xx=("__xx", "sum"),
                     sum_yy=("__yy", "sum"),
                     sum_xy=("__xy", "sum")).reset_index()

    partials = ds.select_columns(keys + [x_col, y_col]).map_batches(
        partial, batch_format="pandas"
    )

    cols = ["n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"]

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(keys, sort=False)[cols].sum().reset_index()
        out["corr_num"] = out["n"] * out["sum_xy"] - out["sum_x"] * out["sum_y"]
        out["var_x_num"] = out["n"] * out["sum_xx"] - out["sum_x"] ** 2
        out["var_y_num"] = out["n"] * out["sum_yy"] - out["sum_y"] ** 2
        return out[keys + ["n", "corr_num", "var_x_num", "var_y_num"]]

    return bucketed_reduce(partials, keys[0] if len(keys) == 1 else keys,
                           finalize, partitions=combiner_partitions())


def grouped_concat(ds, keys: list[str], val_col: str, order_col: str,
                   alias: str = "concat", sep: str = ",",
                   count_alias: str = "n"):
    """SQL ``string_agg(val, sep ORDER BY order_col)`` per key: the
    value column co-buckets with its key (ONE hash exchange — ordered
    concat is holistic, there is no lossless combiner), each bucket
    sorts once and joins per key vectorized. ``order_col`` must be a
    unique total order within each key (e.g. an event id) or the
    result is nondeterministic."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([*keys, order_col], kind="stable")
        g = df.groupby(keys, sort=False)
        return g.agg(**{alias: (val_col, sep.join),
                        count_alias: (val_col, "size")}).reset_index()

    return bucketed_reduce(
        ds.select_columns(keys + [val_col, order_col]),
        keys[0] if len(keys) == 1 else keys, per_bucket,
    )


def pivot_counts(ds, key: str, pivot_col: str, categories: list[str],
                 prefix: str = "n_"):
    """Long→wide pivot: one row per key, one int64 count column per
    category of ``pivot_col`` (SQL ``count(*) FILTER (WHERE col =
    'cat')``). ``categories`` is EXPLICIT — a pivot's output schema
    must be known up front to be a schema at all; at 100 TB the
    category set is a contract, not a discovery (run a `unique()`
    pass separately if you genuinely don't know it). Unlisted
    categories are ignored; absent ones produce 0 columns.

    Combiner shape: per-batch (key, cat) counts → slim partials →
    one hash shuffle on key → per-bucket unstack. The wide row set
    (one per key) is the only thing that leaves the reduce."""
    cats = list(categories)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[pivot_col].isin(cats)]
        out = (
            df.groupby([key, pivot_col], sort=False)
            .size().rename("__n").reset_index()
        )
        return out

    partials = ds.select_columns([key, pivot_col]).map_batches(
        partial, batch_format="pandas"
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        wide = (
            df.groupby([key, pivot_col], sort=False)["__n"].sum()
            .unstack(pivot_col, fill_value=0)
            .reindex(columns=cats, fill_value=0)
            .astype("int64")
        )
        wide.columns = [f"{prefix}{c}" for c in wide.columns]
        return wide.reset_index()

    return bucketed_reduce(partials, key, per_bucket,
                           partitions=combiner_partitions())


def unpivot(ds, id_cols: list[str], value_cols: list[str],
            var_name: str = "measure", value_name: str = "value"):
    """Wide→long melt: each input row becomes len(value_cols) rows of
    (id_cols…, measure, value) — SQL UNPIVOT / stacked UNION ALL.
    Pure per-batch transform: NO shuffle, fully streaming, output
    size is a fixed multiple of input."""

    # pandas melt refuses a value_name that matches ANY input column —
    # alias the measure columns to placeholders and map the labels back
    alias = {c: f"__v{i}" for i, c in enumerate(value_cols)}
    unalias = {v: k for k, v in alias.items()}

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        out = df.rename(columns=alias).melt(
            id_vars=id_cols, value_vars=list(alias.values()),
            var_name=var_name, value_name=value_name,
        )
        out[var_name] = out[var_name].map(unalias)
        return out

    return ds.select_columns(id_cols + value_cols).map_batches(
        melt, batch_format="pandas"
    )


def grouped_mode(ds, key: str, val_col: str, alias: str = "mode_val"):
    """Most frequent value per key, ties broken by smallest value —
    deterministic at any parallelism. Combiner: per-batch (key, val)
    counts so the shuffle moves one slim row per distinct pair per
    batch, never raw rows; per-bucket reduce sums the partial counts
    and takes the (count desc, val asc) head per key, vectorized."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby([key, val_col], sort=False)
            .size().rename("__n").reset_index()
        )

    partials = ds.select_columns([key, val_col]).map_batches(
        partial, batch_format="pandas"
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([key, val_col], sort=False)["__n"].sum().reset_index()
        g = g.sort_values(
            [key, "__n", val_col], ascending=[True, False, True],
            kind="stable",
        )
        out = g.drop_duplicates(key)[[key, val_col]].rename(
            columns={val_col: alias}
        )
        return out.reset_index(drop=True)

    return bucketed_reduce(partials, key, per_bucket,
                           partitions=combiner_partitions())


def group_ranks(ds, key: str, val_col: str, tiebreak_cols: list[str],
                n_tiles: int = 4):
    """SQL ranking-window family per key, one hash shuffle: for each
    row, RANK() and DENSE_RANK() over (PARTITION BY key ORDER BY
    val_col ASC) — ties share a rank, so the output is engine-
    independent without a tiebreak — plus NTILE(n_tiles) over the
    DETERMINISTIC total order (val_col, *tiebreak_cols), which SQL's
    NTILE needs to be reproducible at all. Output: input columns +
    (rnk, drnk, tile) int64.

    Vectorized per bucket: pandas rank('min'/'dense') + the exact
    NTILE fill rule (first n%k tiles get one extra row) computed from
    cumcount/size arrays — no per-group loop. Same key-co-residence
    contract as the other bucketed ops; skewed keys make skewed
    buckets (salt upstream if one key dominates)."""

    order = [val_col] + list(tiebreak_cols)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key] + order, kind="stable").reset_index(drop=True)
        g = df.groupby(key, sort=False)
        df["rnk"] = g[val_col].rank(method="min").astype("int64")
        df["drnk"] = g[val_col].rank(method="dense").astype("int64")
        rn = g.cumcount().to_numpy()  # 0-based row_number
        cnt = g[val_col].transform("size").to_numpy()
        q, r = cnt // n_tiles, cnt % n_tiles
        big = np.maximum(q + 1, 1)  # guard q=0: first r tiles get 1 row
        head = r * big
        df["tile"] = np.where(
            rn < head,
            rn // big,
            # rows past the r oversized tiles fall into size-q tiles;
            # q can only be 0 when ALL rows are in the head, so the
            # maximum() divisor never changes a taken branch
            r + (rn - head) // np.maximum(q, 1),
        ).astype("int64") + 1
        return df

    return bucketed_reduce(ds.select_columns([key] + order), key, per_bucket)


def funnel_match(ds, steps: list[str], key: str = "user_id",
                 ts_col: str = "ts", type_col: str = "event_type"):
    """Ordered-sequence funnel: keys that performed ``steps`` in strict
    event-time order (each step strictly after the previous one), with
    the greedy per-step completion times. Greedy is exact for
    existence: taking the EARLIEST valid time at every step maximizes
    the options for all later steps, so a key completes the funnel iff
    the greedy chain completes. The reference has no sequence analytics
    (SURVEY §2.9 gap row); the standard engines express this as
    MATCH_RECOGNIZE / windowFunnel.

    One hash exchange total: rows are pre-filtered to the step types
    per batch (combiner — the shuffle moves only funnel-relevant
    rows), then each key's chain is resolved per bucket with k
    vectorized min-reductions (k = #steps), never a per-key loop.
    Output: (key, t1_us..tk_us int64 epoch microseconds)."""
    steps = list(steps)
    step_set = set(steps)

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        return df[df[type_col].isin(step_set)]

    prepped = ds.select_columns([key, ts_col, type_col]).map_batches(
        slim, batch_format="pandas"
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = (
            pd.to_datetime(df[ts_col]).astype("datetime64[us]").astype("int64")
        )
        df = pd.DataFrame({key: df[key], "__us": ts_us,
                           type_col: df[type_col]})
        cur = None
        times = []
        for s in steps:
            m = df[df[type_col] == s]
            if cur is not None:
                m = m.merge(cur.rename("__prev"), left_on=key,
                            right_index=True)
                m = m[m["__us"] > m["__prev"]]
            cur = m.groupby(key, sort=False)["__us"].min()
            times.append(cur)
        out = pd.concat(times, axis=1, join="inner")
        out.columns = [f"t{i + 1}_us" for i in range(len(steps))]
        return out.reset_index()

    return bucketed_reduce(prepped, key, per_bucket)


def rank_fractions(ds, key: str, val_col: str, id_col: str):
    """PERCENT_RANK / CUME_DIST per key as exact integer numerators —
    (rnk, pr_num = rnk−1, cd_cnt = #rows with value ≤ current, n_rows)
    — so the result is engine-independent (no float division to
    disagree on). One hash exchange; per bucket two vectorized pandas
    rank passes ('min' is RANK, 'max' is the CUME_DIST count) and a
    size transform, no per-key loop."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, sort=False)
        rnk = g[val_col].rank(method="min").astype("int64")
        return pd.DataFrame({
            id_col: df[id_col], key: df[key], "rnk": rnk,
            "pr_num": rnk - 1,
            "cd_cnt": g[val_col].rank(method="max").astype("int64"),
            "n_rows": g[val_col].transform("size").astype("int64"),
        })

    return bucketed_reduce(
        ds.select_columns([id_col, key, val_col]), key, per_bucket
    )


def distinct_count(ds, key: str, val_col: str, alias: str = "n_distinct"):
    """COUNT(DISTINCT val) per key, shuffle-lean: each batch first
    drops its local duplicate (key, val) pairs (combiner — the shuffle
    moves unique pairs per batch, not raw rows), then one hash shuffle
    co-locates each key and a vectorized nunique runs per bucket."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[[key, val_col]].drop_duplicates()

    pairs = ds.select_columns([key, val_col]).map_batches(
        partial, batch_format="pandas"
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates().groupby(key, sort=False)
        return pd.DataFrame({alias: g[val_col].size().astype("int64")}).reset_index()

    return bucketed_reduce(pairs, key, per_bucket)


def lag_delta(ds, key: str = "user_id", ts_col: str = "ts",
              id_col: str = "event_id"):
    """Per-key LAG: each row joined to its immediate predecessor in
    (ts, id) order within the key, emitting the gap in microseconds.
    Rows with no predecessor (first per key) are dropped — inner-LAG
    semantics, matching SQL LAG(...)+filter. One hash shuffle, then a
    vectorized shift per bucket. Output: (id, key, prev_id, delta_us)."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col, id_col], kind="stable")
        keys = df[key].to_numpy()
        ids = df[id_col].to_numpy()
        epoch_us = (
            pd.to_datetime(df[ts_col]).astype("datetime64[us]").astype("int64")
        ).to_numpy()
        same = np.r_[False, keys[1:] == keys[:-1]]
        delta = epoch_us - np.r_[0, epoch_us[:-1]]
        prev = np.r_[0, ids[:-1]]
        return pd.DataFrame(
            {
                id_col: ids[same].astype("int64"),
                key: keys[same].astype("int64"),
                "prev_id": prev[same].astype("int64"),
                "delta_us": delta[same].astype("int64"),
            }
        )

    return bucketed_reduce(
        ds.select_columns([id_col, key, ts_col]), key, per_bucket
    )


def set_op(left, right, op: str = "intersect"):
    """SQL set operators with set (distinct-row) semantics over two
    datasets of identical schema: ``intersect`` → distinct rows present
    in both; ``except`` → distinct left rows absent from the right;
    ``union`` → distinct rows of either side (SQL UNION, not UNION ALL)
    (the reference has no table set ops — SURVEY §2.7 gap row). Both
    sides are tagged, unioned, and hash-bucketed on the first column
    (equal rows always co-bucket), then one vectorized pandas
    merge/anti-merge runs per bucket — a single shuffle total."""
    if op not in ("intersect", "except", "union"):
        raise ValueError(op)
    cols = [c for c in left.columns()]

    def tag(side):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            # per-batch distinct first: the shuffle moves unique rows
            df = df.drop_duplicates().copy()
            df["__side"] = np.int8(side)
            return df

        return fn

    u = left.map_batches(tag(0), batch_format="pandas").union(
        right.map_batches(tag(1), batch_format="pandas")
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if op == "union":
            return df[cols].drop_duplicates().reset_index(drop=True)
        l = df[df["__side"] == 0][cols].drop_duplicates()
        r = df[df["__side"] == 1][cols].drop_duplicates()
        if op == "intersect":
            return l.merge(r, on=cols, how="inner").reset_index(drop=True)
        m = l.merge(r, on=cols, how="left", indicator=True)
        return (
            m[m["_merge"] == "left_only"][cols].reset_index(drop=True)
        )

    return bucketed_reduce(u, cols[0], per_bucket)


def cross_join(ds, small_df: pd.DataFrame):
    """CROSS JOIN against a SMALL broadcast side: the small table ships
    once via ``ray.put`` and each batch takes a vectorized cartesian
    merge — no shuffle, output streams at |batch| × |small| rows. The
    small side must fit in one worker's heap times the batch fan-out;
    a large-large cross join is a deliberate non-feature (at 100 TB it
    is always a modeling error)."""
    import ray

    ref = ray.put(small_df)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return df.merge(ray.get(ref), how="cross")

    return ds.map_batches(fn, batch_format="pandas")


def explode_list(ds, id_col: str, list_col: str, scale: int = 1_000_000,
                 pos_alias: str = "pos", val_alias: str = "val_micro"):
    """Flatten a ``list<float>`` column to (id, pos, val) rows — SQL
    UNNEST WITH ORDINALITY. Pure per-batch zero-copy Arrow kernel:
    ``list_flatten`` + ``list_parent_indices`` + an offsets subtraction
    for the 1-based position; values are emitted as integer
    ``scale``-units (float32 → float64 is exact and the scaled floor is
    engine-independent, so the SQL oracle reproduces them bit-for-bit).
    """

    def fn(t: pa.Table) -> pa.Table:
        col = t[list_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col)
        parents = pc.list_parent_indices(col).to_numpy()
        offs = col.offsets.to_numpy()
        pos = (np.arange(len(flat), dtype=np.int64) + offs[0]) - offs[parents]
        vals = flat.to_numpy(zero_copy_only=False).astype(np.float64)
        micro = np.floor(vals * scale + 0.5).astype(np.int64)
        return pa.table({
            id_col: t[id_col].take(pa.array(parents)),
            pos_alias: pa.array(pos + 1, pa.int64()),
            val_alias: pa.array(micro, pa.int64()),
        })

    return ds.select_columns([id_col, list_col]).map_batches(
        fn, batch_format="pyarrow"
    )


def time_window_sum(ds, key: str, ts_col: str, val_col: str, id_col: str,
                    window_s: int = 3600, scale: int = 100,
                    alias: str = "w_sum_scaled"):
    """Sliding EVENT-TIME window aggregate: for every row, the sum of
    ``val_col`` over the same key's rows with ts in
    [ts − window, ts] — SQL ``SUM(val) OVER (PARTITION BY key ORDER BY
    ts RANGE BETWEEN <window> PRECEDING AND CURRENT ROW)``. One hash
    exchange co-locates each key; per key the window is two vectorized
    ``searchsorted`` probes into a prefix-sum (O(n log n) total, no
    per-row rescan). Values are integer-scaled so the result is exact
    and tie-order independent (RANGE windows sum all ts-peers — a sum
    over a value range, invariant to intra-tie ordering)."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col], kind="stable")
        ts = (
            pd.to_datetime(df[ts_col]).astype("datetime64[us]")
            .astype("int64").to_numpy()
        )
        v = np.floor(df[val_col].to_numpy() * scale + 0.5).astype(np.int64)
        k = df[key].to_numpy()
        out = np.empty(len(df), dtype=np.int64)
        w_us = np.int64(window_s) * 1_000_000
        starts = np.r_[0, np.flatnonzero(k[1:] != k[:-1]) + 1, len(df)]
        for a, b in zip(starts[:-1], starts[1:]):
            seg = ts[a:b]
            cum = np.r_[0, np.cumsum(v[a:b])]
            hi = np.searchsorted(seg, seg, side="right")
            lo = np.searchsorted(seg, seg - w_us, side="left")
            out[a:b] = cum[hi] - cum[lo]
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            key: k,
            alias: out,
        })

    return bucketed_reduce(
        ds.select_columns([id_col, key, ts_col, val_col]), key, per_bucket
    )


def hourly_window_agg(events, ts_col: str = "ts", key: str = "user_id",
                      value_col: str = "value", window_s: int = 3600):
    """Tumbling event-time window aggregate per key: (key, window_start
    epoch-seconds, total_value, n_events). Ray Data has no watermarks
    (SURVEY.md §2.9 — reference is strictly batch too); windows are
    computed by bucketing epoch(ts) // window_s with partial
    pre-aggregation, equivalent to SQL GROUP BY key, floor(epoch/size)."""

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        epoch = _epoch_seconds(df[ts_col])
        out = pd.DataFrame(
            {
                key: df[key],
                "window_start": (epoch // window_s) * window_s,
                # integer micro-units: exact, order-insensitive sums
                # that match SQL sum(floor(value*1e6+0.5)) bit-for-bit
                "__v": np.floor(df[value_col].to_numpy() * 1e6 + 0.5).astype(np.int64),
            }
        )
        g = out.groupby([key, "window_start"], sort=False)
        agg = g["__v"].agg(["sum", "size"]).reset_index()
        return agg.rename(columns={"sum": "__s", "size": "__n"})

    partials = events.map_batches(bucket, batch_format="pandas")

    def final_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([key, "window_start"], sort=False)
        out = pd.DataFrame(index=g.size().index)
        out["total_value"] = g["__s"].sum() / 1e6
        out["n_events"] = g["__n"].sum().astype("int64")
        out = out.reset_index()
        out["window_start"] = out["window_start"].astype("int64")
        return out

    return bucketed_reduce(partials, key, final_bucket,
                           partitions=combiner_partitions())


def hopping_window_agg(events, ts_col: str = "ts",
                       value_col: str = "value",
                       size_s: int = 3600, hop_s: int = 900):
    """Hopping (sliding) event-time windows — the window family between
    tumbling (`hourly_window_agg`) and gap sessions (`sessionize`):
    every window has length ``size_s`` and starts on a ``hop_s``
    boundary, so each event belongs to exactly k = size_s // hop_s
    overlapping windows. The per-batch combiner replicates events into
    their k windows with ONE vectorized outer subtraction + np.repeat
    (never a per-row loop) and pre-aggregates, so the single hash
    shuffle moves (window_start, Σ, n) partials — k slim rows per
    distinct window per batch, not k× the event stream. Sums are exact
    integer micro-units (matches SQL sum(floor(v·1e6+0.5))).

    Output: (window_start epoch-s, total_c6, n_events)."""
    if size_s % hop_s != 0:
        raise ValueError("size_s must be a multiple of hop_s")
    k = size_s // hop_s

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        epoch = _epoch_seconds(df[ts_col]).to_numpy()
        v = np.floor(
            df[value_col].to_numpy() * 1e6 + 0.5
        ).astype(np.int64)
        base = (epoch // hop_s) * hop_s
        ws = (
            base[:, None]
            - np.arange(k, dtype=np.int64)[None, :] * hop_s
        ).ravel()
        out = pd.DataFrame({"window_start": ws, "__v": np.repeat(v, k)})
        g = out.groupby("window_start", sort=False)
        agg = g["__v"].agg(["sum", "size"]).reset_index()
        return agg.rename(columns={"sum": "__s", "size": "__n"})

    partials = events.map_batches(explode, batch_format="pandas")

    def final_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("window_start", sort=False)
        out = pd.DataFrame(index=g.size().index)
        out["total_c6"] = g["__s"].sum().astype("int64")
        out["n_events"] = g["__n"].sum().astype("int64")
        out = out.reset_index()
        out["window_start"] = out["window_start"].astype("int64")
        return out

    return bucketed_reduce(partials, "window_start", final_bucket,
                           partitions=combiner_partitions())


AUTO_BROADCAST_BYTES = 256 << 20  # right side under this → broadcast


def auto_join(left, right, on: str | list[str], how: str = "inner",
              broadcast_bytes: int = AUTO_BROADCAST_BYTES,
              right_bytes: float | None = None,
              lsuffix: str = "", rsuffix: str = "_r"):
    """Size-based join strategy selection (the planner decision every
    SQL engine makes): when the RIGHT side's estimated in-memory size
    (file metadata × expansion — never executes the plan) fits under
    ``broadcast_bytes``, it collects once, ships via ray.put and joins
    per batch with ZERO shuffle; otherwise both sides co-partition
    through :func:`hash_join`. Unknown size (lineage erased by
    transforms) falls back to the safe hash path. Outputs are
    identical either way — only the exchange plan differs (both paths
    use the same suffixes for overlapping non-key columns, so the
    schema never depends on the right side's estimated size).

    ``right_bytes``: explicit in-memory upper bound for the right side,
    for callers whose transforms erased file lineage — pass
    ``input_bytes_estimate(raw_read_ds)`` of the PRE-filter read (a
    filter only shrinks, so the pre-filter bytes are a safe gate: the
    query broadcasts at test scale and co-partitions at 100 TB).

    Broadcast covers inner/left (a broadcast side cannot drive the
    null-extension of its own unmatched rows); other modes always
    co-partition."""
    est = right_bytes if right_bytes is not None else input_bytes_estimate(right)
    if (est is not None and est <= broadcast_bytes
            and how in ("inner", "left")):
        return broadcast_join(left, right.to_pandas(), on=on, how=how,
                              lsuffix=lsuffix, rsuffix=rsuffix)
    return hash_join(left, right, on=on, how=how,
                     lsuffix=lsuffix, rsuffix=rsuffix)


def salted_join(left, right, on: str, salt_col: str, n_salt: int = 8,
                phi: float = 0.01, how: str = "inner",
                hot_keys: set | None = None):
    """Skew-resistant hash join for hot keys (the relational twin of
    assign.py's salted cells): a plain hash join sends EVERY row of a
    hot key to one bucket — one straggler task owns the whole key.
    Here the hot keys' left rows split across ``n_salt`` sub-keys
    (salt = deterministic hash of ``salt_col``, so any parallelism
    produces the same split) while the right side replicates its hot
    rows once per salt; cold keys pay nothing. Output rows are
    IDENTICAL to `hash_join` — each (left, right) pair still meets
    exactly once, under key·S+salt.

    ``hot_keys``: pass the known hot set, or leave None to auto-detect
    with the Misra-Gries heavy-hitter pass (`sketch.heavy_hitters`,
    exact, never a full groupby) at threshold ``phi``. int64 keys;
    how ∈ inner | left (right's null-extension would need unsalted
    ownership)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left")
    if hot_keys is None:
        from .sketch import heavy_hitters

        hot = heavy_hitters(left, on, phi).to_pandas()
        # an all-cold input yields an empty result (and Ray drops the
        # column metadata of an empty dataset) — no key salts
        hot_keys = (
            set(int(k) for k in hot["key"]) if "key" in hot.columns else set()
        )
    S = np.int64(n_salt)

    def prep_left(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        k = df[on].to_numpy().astype(np.int64)
        is_hot = df[on].isin(hot_keys).to_numpy()
        salt = (
            pd.util.hash_pandas_object(df[salt_col], index=False)
            .to_numpy().astype(np.uint64) % np.uint64(n_salt)
        ).astype(np.int64)
        df["__sk"] = k * S + np.where(is_hot, salt, 0)
        return df

    def prep_right(df: pd.DataFrame) -> pd.DataFrame:
        k = df[on].to_numpy().astype(np.int64)
        is_hot = df[on].isin(hot_keys).to_numpy()
        cold = df[~is_hot].copy()
        cold["__sk"] = cold[on].to_numpy().astype(np.int64) * S
        hot_df = df[is_hot]
        reps = []
        for s in range(n_salt):
            r = hot_df.copy()
            r["__sk"] = r[on].to_numpy().astype(np.int64) * S + np.int64(s)
            reps.append(r)
        return pd.concat([cold, *reps], ignore_index=True)

    l = left.map_batches(prep_left, batch_format="pandas")
    r = right.map_batches(prep_right, batch_format="pandas").map_batches(
        lambda df: df.drop(columns=[on]), batch_format="pandas"
    )
    joined = hash_join(l, r, on="__sk", how=how)
    return joined.map_batches(
        lambda df: df.drop(columns="__sk"), batch_format="pandas"
    )


def ratio_to_report(ds, keys: list[str], sum_cols: dict[str, str],
                    total_prefix: str = "total_"):
    """Percent-of-total (SQL ``sum(x) OVER ()`` next to ``GROUP BY``,
    Oracle's RATIO_TO_REPORT): per-key combiner sums plus the grand
    total carried as a constant column, both exact integers — the
    ratio itself is left to the consumer so no float division enters
    the engine. The grouped result is one row per key, so the grand
    total folds over THAT (driver-side, tiny), never over the data
    again."""
    per_key = grouped_agg(ds, keys, sum_cols)
    totals = {
        name: 0 for name in sum_cols
    }
    small = per_key.to_pandas()
    for name in sum_cols:
        totals[name] = int(small[name].sum())

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for name, tot in totals.items():
            df[f"{total_prefix}{name}"] = np.int64(tot)
        return df

    import ray.data as rd

    return rd.from_pandas(attach(small))


def cooccurrence_pairs(ds, basket_col: str, item_col: str,
                       min_count: int = 2):
    """Market-basket co-occurrence: unordered item pairs appearing
    together in ≥ min_count baskets (the candidate-generation core of
    frequent-itemset mining). Two shuffles, both slim:

    1. (basket, item) pairs dedupe per batch (combiner), then
       co-locate by BASKET; per bucket a vectorized self-merge emits
       each basket's pairs (item_a < item_b) and pre-counts them —
       the k² expansion is bounded by the max basket size, a data
       contract documented here (salt huge baskets upstream if one
       key's k² exceeds a worker's heap).
    2. the (pair, partial-count) rows — one per distinct pair per
       bucket — re-aggregate by PAIR and threshold.

    Output: (item_a, item_b, n_baskets), item_a < item_b."""

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df[[basket_col, item_col]].drop_duplicates()

    pairs_in = ds.select_columns([basket_col, item_col]).map_batches(
        dedup, batch_format="pandas"
    )

    def per_basket_bucket(df: pd.DataFrame) -> pd.DataFrame:
        dd = df.drop_duplicates()
        m = dd.merge(dd, on=basket_col, suffixes=("_a", "_b"))
        a = m[f"{item_col}_a"].to_numpy()
        b = m[f"{item_col}_b"].to_numpy()
        m = m[a < b]
        g = m.groupby([f"{item_col}_a", f"{item_col}_b"], sort=False)
        out = g.size().rename("cnt").reset_index()
        return out.rename(columns={f"{item_col}_a": "item_a",
                                   f"{item_col}_b": "item_b"})

    partials = bucketed_reduce(pairs_in, basket_col, per_basket_bucket)
    counted = grouped_agg(
        partials, ["item_a", "item_b"], {"n_baskets": "cnt"}
    )
    return counted.map_batches(
        lambda df: df[df["n_baskets"] >= min_count],
        batch_format="pandas",
    )


# ----------------------------------------------------- bag set ops (ALL)

def set_op_all(left, right, op: str = "intersect_all"):
    """SQL INTERSECT ALL / EXCEPT ALL — bag (multiplicity) semantics
    over two datasets of identical schema (completes `set_op`, which is
    distinct-row only; the reference has no table set ops, SURVEY §2.7
    gap row). Per-batch combiner counts each row value's multiplicity,
    so the single hash shuffle moves (row-value, side, count) partials
    — never the rows themselves; per bucket the two sides' counts
    merge and each row value is re-emitted min(cl, cr) times
    (INTERSECT ALL) or max(cl − cr, 0) times (EXCEPT ALL) via one
    np.repeat, no per-row loop."""
    if op not in ("intersect_all", "except_all"):
        raise ValueError(op)
    cols = [c for c in left.columns()]

    def counter(side):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby(cols, sort=False).size().rename("__n")
            out = out.reset_index()
            out["__side"] = np.int8(side)
            return out

        return fn

    u = left.map_batches(counter(0), batch_format="pandas").union(
        right.map_batches(counter(1), batch_format="pandas")
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(cols + ["__side"], sort=False)["__n"].sum().unstack(
            "__side", fill_value=0
        )
        cl = g[0].to_numpy() if 0 in g.columns else np.zeros(len(g), np.int64)
        cr = g[1].to_numpy() if 1 in g.columns else np.zeros(len(g), np.int64)
        reps = (
            np.minimum(cl, cr)
            if op == "intersect_all"
            else np.maximum(cl - cr, 0)
        )
        vals = g.index.to_frame(index=False)
        return vals.iloc[np.repeat(np.arange(len(vals)), reps)].reset_index(
            drop=True
        )

    return bucketed_reduce(u, cols[0], per_bucket)


# ------------------------------------------- FIRST/LAST_VALUE windows

def first_last_value(ds, key: str, order_col: str, val_col: str,
                     id_col: str, scale: int = 100):
    """FIRST_VALUE / LAST_VALUE over the full partition frame (ROWS
    BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), ordered by
    (order_col, id) per key — every row gets its partition's earliest
    and latest value. Values are exact integer units
    (floor(v·scale + 0.5)) so the result is engine-independent. One
    hash exchange; per bucket a single stable sort + two groupby
    transforms ('first'/'last'), no per-key loop."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, order_col, id_col], kind="stable")
        units = np.floor(df[val_col].to_numpy() * scale + 0.5).astype(
            np.int64
        )
        g = pd.DataFrame({key: df[key], "__u": units}).groupby(
            key, sort=False
        )["__u"]
        return pd.DataFrame({
            id_col: df[id_col].astype("int64"),
            key: df[key].astype("int64"),
            "first_val_c": g.transform("first").to_numpy(),
            "last_val_c": g.transform("last").to_numpy(),
        }).reset_index(drop=True)

    return bucketed_reduce(
        ds.select_columns([id_col, key, order_col, val_col]), key, per_bucket
    )


# ------------------------------------------- interval overlap self-join

def interval_overlap_pairs(ds, key: str, start_col: str, end_col: str,
                           id_col: str):
    """Per-key interval-overlap self-join: all pairs of rows with the
    same ``key`` whose integer intervals [start, end] overlap
    (start_a <= end_b AND start_b <= end_a), emitted once per unordered
    pair as (key, id_a=min, id_b=max). A non-equi range join neither
    the reference (equi-joins only, SURVEY §2.4) nor Ray Data has
    natively; the classic plan is per-key sweep-line.

    One hash exchange on ``key``; per bucket the sweep is ONE global
    searchsorted — keys are folded into the sort dimension (dense key
    code × offset + start, offset > max end) so intervals of different
    keys can never capture each other, and for each row i the rows
    j > i with start_j <= end_i form a contiguous run found in O(log n)
    with no per-key loop. Pairs are materialized with np.repeat +
    arange arithmetic (never a Python loop). Output size is the true
    join cardinality — callers should bound interval length/key fanout
    the way any range join requires."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, start_col, id_col], kind="stable")
        n = len(df)
        s = df[start_col].to_numpy(np.int64)
        e = df[end_col].to_numpy(np.int64)
        ids = df[id_col].to_numpy(np.int64)
        codes = pd.factorize(df[key].to_numpy(), use_na_sentinel=False)[0]
        base = s.min()
        s2 = s - base
        e2 = np.maximum(e - base, s2)  # degenerate end<start: only self
        off = e2.max() + 2
        cs = codes * off + s2
        ce = codes * off + e2
        hi = np.searchsorted(cs, ce, side="right")
        counts = np.maximum(hi - np.arange(n) - 1, 0)
        total = int(counts.sum())
        if not total:
            return pd.DataFrame({key: pd.Series([], dtype=df[key].dtype),
                                 "id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64)})
        li = np.repeat(np.arange(n), counts)
        run_starts = np.repeat(np.cumsum(counts) - counts, counts)
        ri = li + 1 + (np.arange(total) - run_starts)
        ia, ib = ids[li], ids[ri]
        return pd.DataFrame({
            key: df[key].to_numpy()[li],
            "id_a": np.minimum(ia, ib),
            "id_b": np.maximum(ia, ib),
        })

    return bucketed_reduce(
        ds.select_columns([key, start_col, end_col, id_col]), key, per_bucket
    )


# --------------------------------------------------- skyline (Pareto)

def _pareto_kernel(df: pd.DataFrame, max_col: str, min_col: str,
                   id_col: str) -> pd.DataFrame:
    """Rows not dominated (dominator has >= max_col, <= min_col, and is
    strictly better on at least one). Sort by (max desc, min asc, id
    asc); a row is dominated iff the running min of min_col over
    strictly-greater max_col rows is <= its own, or a same-max row has
    a strictly smaller min_col — both vectorized prefix reductions."""
    df = df.sort_values(
        [max_col, min_col, id_col], ascending=[False, True, True],
        kind="stable",
    ).reset_index(drop=True)
    a = df[max_col].to_numpy()
    b = df[min_col].to_numpy()
    n = len(df)
    if n == 0:
        return df
    new_grp = np.r_[True, a[1:] != a[:-1]]
    grp_id = np.cumsum(new_grp) - 1
    cummin_b = np.minimum.accumulate(b)
    grp_starts = np.flatnonzero(new_grp)
    # min of b among all rows of strictly greater a = cummin at the
    # previous group's last element
    prev_last = grp_starts - 1  # index of previous group's last row
    min_b_gt_grp = np.where(
        grp_starts == 0, np.iinfo(np.int64).max, cummin_b[prev_last]
    )
    min_b_gt = min_b_gt_grp[grp_id]
    # same-a rows are sorted b asc: the group's first row holds min b
    min_b_same = b[grp_starts][grp_id]
    dominated = (min_b_gt <= b) | (min_b_same < b)
    return df[~dominated].reset_index(drop=True)


def skyline(ds, max_col: str, min_col: str, id_col: str):
    """Pareto frontier (skyline operator): rows for which no other row
    is >= on ``max_col`` AND <= on ``min_col`` with at least one strict
    inequality. SQL expresses it as NOT EXISTS anti-self-join (O(n²));
    the distributed plan exploits that the global skyline is a subset
    of every batch's local skyline, so a per-batch combiner prunes to
    local frontiers (typically O(log n) rows) and one single-partition
    pass finishes — no all-to-all shuffle at all."""
    local = ds.select_columns([id_col, max_col, min_col]).map_batches(
        _pareto_kernel, batch_format="pandas",
        fn_kwargs={"max_col": max_col, "min_col": min_col,
                   "id_col": id_col},
    )
    return local.repartition(1).map_batches(
        _pareto_kernel, batch_format="pandas",
        fn_kwargs={"max_col": max_col, "min_col": min_col,
                   "id_col": id_col},
    )


# --------------------------------------------------- cohort retention

def cohort_retention(events, key: str = "user_id", ts_col: str = "ts"):
    """Cohort/retention matrix: each key's cohort is its first active
    day; output counts distinct keys per (cohort_day, offset_day) —
    the standard activity-retention analysis. Per-batch combiner
    first distincts (key, day) pairs so the key exchange moves at most
    one row per key-day; per bucket each key's full history co-resides
    (bucketed_reduce contract), so cohort = groupby(key).min is local,
    and the bucket emits partial (cohort, offset) counts; a final tiny
    grouped sum merges buckets. Days are int64 epoch days (UTC)."""

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        day = (_epoch_seconds(df[ts_col]) // 86400).astype("int64")
        return pd.DataFrame({key: df[key], "__day": day}).drop_duplicates()

    pairs = events.select_columns([key, ts_col]).map_batches(
        slim, batch_format="pandas"
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()  # cross-batch dups for the same key-day
        cohort = df.groupby(key, sort=False)["__day"].transform("min")
        part = pd.DataFrame({
            "cohort_day": cohort.to_numpy(),
            "offset_day": (df["__day"] - cohort).to_numpy(),
        })
        out = part.groupby(["cohort_day", "offset_day"], sort=False).size()
        return out.rename("__n").reset_index()

    partials = bucketed_reduce(pairs, key, per_bucket)

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["cohort_day", "offset_day"], sort=False)["__n"].sum()
        return out.rename("n_users").astype("int64").reset_index()

    return bucketed_reduce(partials, "cohort_day", merge_bucket,
                           partitions=4)
