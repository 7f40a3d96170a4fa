"""From-scratch hierarchical spatial cell encoder (H3/S2-style).

64-bit Morton (Z-order) key over a planar CRS: 4 bits of resolution +
interleaved 30+30-bit quantized x/y. This is the partitioning/shuffle
key for every wide op in the engine (SURVEY.md §7.3): the PIP
crown-assignment join, kNN halo replication, per-cell NMS, tile
co-location. The reference has no such concept — it grids rasters into
file tiles instead (tree_delineation/get_polygons.py:588-663); here the
cell key is a first-class column so Ray Data `groupby(cell)` co-locates
both sides of every spatial join.

Resolution r → cell edge = BASE_CELL_M / 2**r meters. All functions are
vectorized over numpy arrays and deterministic.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "cell_of",
    "cell_edge_m",
    "cell_bounds",
    "neighbors",
    "cells_covering",
    "cell_grid_xy",
    "mix64",
    "fused_group_key",
    "hilbert_of",
    "hilbert_decode",
    "hilbert_xy2d",
    "hilbert_d2xy",
    "DEFAULT_RES",
    "BASE_CELL_M",
]

# World extent handled: [0, BASE_CELL_M) on each axis at res 0. The key
# layout reserves 4 bits for the resolution, so valid res is 0..15
# (finest cell edge = 2^20 / 2^15 = 32 m — coarser than any per-point
# op needs a cell for; sub-cell work happens inside partition kernels).
BASE_CELL_M = float(1 << 20)  # 1,048,576 m square world plane
DEFAULT_RES = 13  # 1048576 / 2**13 = 128 m cells (~ reference 100 m tiles)
MAX_RES = 15
_AXIS_BITS = 30


def cell_edge_m(res: int) -> float:
    return BASE_CELL_M / float(1 << res)


def mix64(v: np.ndarray) -> np.ndarray:
    """Bijective 64-bit mix (splitmix64 finalizer). Used to SCRAMBLE a
    Morton cell key before a sort-based groupby: Z-order puts a dense
    spatial cluster's cells in adjacent key ranges, so the range
    partitioner packs the whole hot region into one output block and
    that block's task becomes the straggler. Mixing the key spreads
    neighboring cells uniformly across range partitions while keeping
    the cell→group mapping exact (bijection ⇒ no group merging)."""
    v = np.asarray(v, dtype=np.uint64).copy()
    v += np.uint64(0x9E3779B97F4A7C15)
    v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return v ^ (v >> np.uint64(31))


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 30 bits of v so there is a 0 bit between each."""
    v = v.astype(np.uint64) & np.uint64((1 << _AXIS_BITS) - 1)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _compact1by1(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def cell_grid_xy(x, y, res: int = DEFAULT_RES) -> tuple[np.ndarray, np.ndarray]:
    """Integer grid coordinates (gx, gy) of each point at resolution
    ``res``. SQL-oracle-friendly: equals floor(x / edge), floor(y / edge)."""
    edge = cell_edge_m(res)
    gx = np.floor(np.asarray(x, dtype=np.float64) / edge).astype(np.int64)
    gy = np.floor(np.asarray(y, dtype=np.float64) / edge).astype(np.int64)
    n = np.int64(1 << res)
    return np.clip(gx, 0, n - 1), np.clip(gy, 0, n - 1)


def cell_of(x, y, res: int = DEFAULT_RES) -> np.ndarray:
    """Vectorized: 64-bit cell key of each (x, y).

    Layout: [4 bits res][60 bits morton(gx, gy)] — keys at different
    resolutions never collide, and sorting by key at one resolution
    yields Z-order spatial locality (good block co-location)."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}], got {res}")
    gx, gy = cell_grid_xy(x, y, res)
    code = _part1by1(gx.astype(np.uint64)) | (
        _part1by1(gy.astype(np.uint64)) << np.uint64(1)
    )
    return (np.uint64(res) << np.uint64(60)) | code


def cell_decode(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of cell_of → (res, gx, gy)."""
    cell = np.asarray(cell, dtype=np.uint64)
    res = (cell >> np.uint64(60)).astype(np.int64)
    code = cell & np.uint64((1 << 60) - 1)
    gx = _compact1by1(code).astype(np.int64)
    gy = _compact1by1(code >> np.uint64(1)).astype(np.int64)
    return res, gx, gy


def hilbert_xy2d(gx: np.ndarray, gy: np.ndarray, res: int) -> np.ndarray:
    """Vectorized Hilbert-curve index of integer grid cells (gx, gy)
    on a 2^res × 2^res grid — the space-filling curve S2 uses (Morton
    is H3/Z-order's). Hilbert consecutive indices are ALWAYS 4-adjacent
    cells, so a contiguous index range is one compact blob — a Z-order
    range can be two disjoint rectangles. Standard bit-rotation walk
    (Hamilton 2006 / Wikipedia "Hilbert curve"), vectorized across
    points: O(res) numpy passes, no per-point loop."""
    x = np.asarray(gx, dtype=np.uint64).copy()
    y = np.asarray(gy, dtype=np.uint64).copy()
    d = np.zeros(x.shape, dtype=np.uint64)
    s = np.uint64(1 << (res - 1)) if res > 0 else np.uint64(0)
    one = np.uint64(1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.uint64)
        ry = ((y & s) > 0).astype(np.uint64)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate quadrant: when ry == 0, flip (if rx) then swap x/y
        flip = (ry == 0) & (rx == 1)
        sm1 = s - one
        x_f = np.where(flip, sm1 - x, x)
        y_f = np.where(flip, sm1 - y, y)
        swap = ry == 0
        x, y = (np.where(swap, y_f, x_f), np.where(swap, x_f, y_f))
        s >>= one
    return d


def hilbert_d2xy(d: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of hilbert_xy2d → (gx, gy); same vectorized walk, from
    the lowest bit pair up."""
    t = np.asarray(d, dtype=np.uint64).copy()
    x = np.zeros(t.shape, dtype=np.uint64)
    y = np.zeros(t.shape, dtype=np.uint64)
    one = np.uint64(1)
    s = np.uint64(1)
    top = np.uint64(1 << res)
    while s < top:
        rx = one & (t >> one)
        ry = one & (t ^ rx)
        # un-rotate
        flip = (ry == 0) & (rx == 1)
        sm1 = s - one
        x_s = np.where(flip, sm1 - x, x)
        y_s = np.where(flip, sm1 - y, y)
        swap = ry == 0
        x, y = (np.where(swap, y_s, x_s), np.where(swap, x_s, y_s))
        x += s * rx
        y += s * ry
        t >>= np.uint64(2)
        s <<= one
    return x.astype(np.int64), y.astype(np.int64)


def hilbert_of(x, y, res: int = DEFAULT_RES) -> np.ndarray:
    """64-bit Hilbert cell key of each (x, y): [4 bits res][60 bits
    hilbert index]. Same grid quantization as `cell_of` (one key per
    cell, bijective with it at equal res) but sorted order follows the
    Hilbert curve — use as the sort/partition key when each partition
    should be one COMPACT contiguous region (checkpoint partitioning,
    range-sharded spatial writes); keep Morton `cell_of` when the key
    must also support cheap prefix/interleave math (halo covers)."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}], got {res}")
    gx, gy = cell_grid_xy(x, y, res)
    d = hilbert_xy2d(gx, gy, res)
    return (np.uint64(res) << np.uint64(60)) | d


def hilbert_decode(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of hilbert_of → (res, gx, gy). Assumes uniform res per
    call (vectorized walk needs one res; mixed-res keys sort apart by
    the 4-bit prefix anyway)."""
    cell = np.asarray(cell, dtype=np.uint64)
    res = (cell >> np.uint64(60)).astype(np.int64)
    if len(res) and not (res == res[0]).all():
        raise ValueError("hilbert_decode requires uniform resolution")
    d = cell & np.uint64((1 << 60) - 1)
    r = int(res[0]) if len(res) else 0
    gx, gy = hilbert_d2xy(d, r)
    return res, gx, gy


def cell_bounds(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(minx, miny, maxx, maxy) of each cell key (vectorized)."""
    res, gx, gy = cell_decode(cell)
    edge = BASE_CELL_M / (1 << res).astype(np.float64)
    minx = gx * edge
    miny = gy * edge
    return minx, miny, minx + edge, miny + edge


def neighbors(cell: int, include_self: bool = True) -> np.ndarray:
    """The ≤9-cell Moore neighborhood of one cell (halo expansion for
    kNN / NMS, SURVEY.md §7.1 steps 5-8)."""
    res, gx, gy = cell_decode(np.array([cell], dtype=np.uint64))
    r, gx, gy = int(res[0]), int(gx[0]), int(gy[0])
    n = 1 << r
    out = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if not include_self and dx == 0 and dy == 0:
                continue
            nx, ny = gx + dx, gy + dy
            if 0 <= nx < n and 0 <= ny < n:
                out.append(_encode_grid(nx, ny, r))
    return np.array(sorted(set(out)), dtype=np.uint64)


def _encode_grid(gx: int, gy: int, res: int) -> int:
    code = int(
        _part1by1(np.array([gx], dtype=np.uint64))[0]
        | (_part1by1(np.array([gy], dtype=np.uint64))[0] << np.uint64(1))
    )
    return (res << 60) | code


def cells_covering(
    minx: float, miny: float, maxx: float, maxy: float, res: int = DEFAULT_RES
) -> np.ndarray:
    """All cell keys whose square intersects the bbox — the halo
    replication set for a polygon/tile (a crown is sent to every cell
    its bbox touches; ownership = cell of the centroid)."""
    edge = cell_edge_m(res)
    n = 1 << res
    gx0 = max(0, int(np.floor(minx / edge)))
    gy0 = max(0, int(np.floor(miny / edge)))
    gx1 = min(n - 1, int(np.floor(maxx / edge)))
    gy1 = min(n - 1, int(np.floor(maxy / edge)))
    if gx1 < gx0 or gy1 < gy0:
        return np.empty(0, dtype=np.uint64)
    gxs, gys = np.meshgrid(
        np.arange(gx0, gx1 + 1, dtype=np.uint64),
        np.arange(gy0, gy1 + 1, dtype=np.uint64),
    )
    code = _part1by1(gxs.ravel()) | (_part1by1(gys.ravel()) << np.uint64(1))
    return np.sort((np.uint64(res) << np.uint64(60)) | code)


def cells_covering_arrays(
    minx: np.ndarray,
    miny: np.ndarray,
    maxx: np.ndarray,
    maxy: np.ndarray,
    res: int = DEFAULT_RES,
) -> tuple[np.ndarray, np.ndarray]:
    """Fully vectorized halo explode: (row_index, cell_key) pairs for
    every cell each bbox intersects. No Python loop — the hot path for
    crown replication at scale."""
    edge = cell_edge_m(res)
    n = np.int64(1 << res)
    gx0 = np.clip(np.floor(np.asarray(minx) / edge).astype(np.int64), 0, n - 1)
    gy0 = np.clip(np.floor(np.asarray(miny) / edge).astype(np.int64), 0, n - 1)
    gx1 = np.clip(np.floor(np.asarray(maxx) / edge).astype(np.int64), 0, n - 1)
    gy1 = np.clip(np.floor(np.asarray(maxy) / edge).astype(np.int64), 0, n - 1)
    nx = gx1 - gx0 + 1
    ny = gy1 - gy0 + 1
    counts = nx * ny
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    starts = np.cumsum(counts) - counts
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    rnx = np.repeat(nx, counts)
    cx = (np.repeat(gx0, counts) + local % rnx).astype(np.uint64)
    cy = (np.repeat(gy0, counts) + local // rnx).astype(np.uint64)
    keys = (
        _part1by1(cx)
        | (_part1by1(cy) << np.uint64(1))
        | (np.uint64(res) << np.uint64(60))
    )
    return idx, keys


def cells_covering_many(
    minx: np.ndarray,
    miny: np.ndarray,
    maxx: np.ndarray,
    maxy: np.ndarray,
    res: int = DEFAULT_RES,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized-ish covering for row arrays: returns (row_index,
    cell_key) pairs, i.e. the exploded halo-replication table."""
    idx_out: list[np.ndarray] = []
    cell_out: list[np.ndarray] = []
    for i in range(len(minx)):
        cs = cells_covering(minx[i], miny[i], maxx[i], maxy[i], res)
        idx_out.append(np.full(len(cs), i, dtype=np.int64))
        cell_out.append(cs)
    if not idx_out:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
    return np.concatenate(idx_out), np.concatenate(cell_out)


def fused_group_key(raw_cell: np.ndarray, salt) -> np.ndarray:
    """Bijective (cell, salt) → uniform uint64 group key: the salt
    (< 128) packs into the low 7 bits ahead of the :func:`mix64`
    scramble, so two different (cell, salt) pairs can NEVER collide
    (injective pack ∘ bijective mix) and the key is uniform over
    [0, 2^64) — the property that lets a sort exchange use analytic
    ``uniform_uint64_boundaries`` instead of a sampling round.
    Requires the cell's Morton payload < 2^57 (res ≤ 28; DEFAULT_RES
    is 13 → 26 payload bits). The res nibble in the key's top bits is
    shifted out — all rows of one exchange share a single res, so
    grouping is unaffected."""
    c = np.asarray(raw_cell, np.uint64)
    s = np.asarray(salt, np.uint64) if not np.isscalar(salt) else np.uint64(salt)
    return mix64((c << np.uint64(7)) | (s & np.uint64(0x7F)))
