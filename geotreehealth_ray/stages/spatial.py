"""Spatial map_batches stages: cell encoding, ring serialization, halo
replication. All Arrow-native (batch_format="pyarrow", zero-copy in).

The ``ring`` column travels through shuffles as a compact binary column
(float64 x/y pairs) rather than list<struct> — cheaper to exchange and
trivially zero-copy to numpy inside group kernels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import cells

__all__ = [
    "reject_holed",
    "rings_from_arrow",
    "ring_to_bytes",
    "rings_from_binary",
    "attach_cell",
    "pack_rings",
    "explode_to_covering_cells",
    "flip_boxes_y",
    "boxes_to_world",
    "bbox_to_ring",
]


def flip_boxes_y(batch: pa.Table, height_px: int | str = "h") -> pa.Table:
    """y-axis flip of detector boxes: ymin/ymax → height − y (reference
    delineation_pipeline.py:80-82, batch_sam.py:677-679 — detector
    pixel rows count down, rasters count up)."""
    h = (
        batch[height_px].to_numpy().astype(np.float64)
        if isinstance(height_px, str)
        else float(height_px)
    )
    ymin = batch["ymin"].to_numpy()
    ymax = batch["ymax"].to_numpy()
    new_min = h - ymax
    new_max = h - ymin
    i_min = batch.schema.get_field_index("ymin")
    batch = batch.set_column(i_min, "ymin", pa.array(new_min, pa.float64()))
    i_max = batch.schema.get_field_index("ymax")
    return batch.set_column(i_max, "ymax", pa.array(new_max, pa.float64()))


def boxes_to_world(batch: pa.Table, a: float, b: float, c: float,
                   d: float, e: float, f: float) -> pa.Table:
    """Pixel boxes → world coordinates via the affine (x = a·col + b·row
    + c ; y = d·col + e·row + f) — reference translate/scale to georef
    (get_polygons.py:494-499, batch_sam.py:529-539). Assumes axis-
    aligned affines (b == d == 0), the only kind the engine produces."""
    xmin = batch["xmin"].to_numpy()
    xmax = batch["xmax"].to_numpy()
    ymin = batch["ymin"].to_numpy()
    ymax = batch["ymax"].to_numpy()
    wx0 = a * xmin + c
    wx1 = a * xmax + c
    wy0 = e * ymin + f
    wy1 = e * ymax + f
    out = {
        "minx": np.minimum(wx0, wx1),
        "maxx": np.maximum(wx0, wx1),
        "miny": np.minimum(wy0, wy1),
        "maxy": np.maximum(wy0, wy1),
    }
    for name, arr in out.items():
        if name in batch.column_names:
            batch = batch.drop_columns([name])
        batch = batch.append_column(name, pa.array(arr, pa.float64()))
    return batch


def bbox_to_ring(batch: pa.Table) -> pa.Table:
    """minx/miny/maxx/maxy → a 4-vertex ``ring`` column (reference
    create_bounding_box, delineation_utils.py:329-333)."""
    minx = batch["minx"].to_numpy()
    miny = batch["miny"].to_numpy()
    maxx = batch["maxx"].to_numpy()
    maxy = batch["maxy"].to_numpy()
    ring_type = pa.list_(pa.struct([("x", pa.float64()), ("y", pa.float64())]))
    rings = pa.array(
        [
            [
                {"x": a, "y": b},
                {"x": cx, "y": b},
                {"x": cx, "y": dy},
                {"x": a, "y": dy},
            ]
            for a, b, cx, dy in zip(minx, miny, maxx, maxy)
        ],
        type=ring_type,
    )
    return batch.append_column("ring", rings)


def rings_from_arrow(col: pa.ChunkedArray | pa.Array) -> list[np.ndarray]:
    """list<struct<x,y>> column → list of (n, 2) float64 arrays."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy()
    flat = col.flatten()
    xs = flat.field("x").to_numpy()
    ys = flat.field("y").to_numpy()
    out = []
    for i in range(len(col)):
        s, e = offsets[i], offsets[i + 1]
        out.append(np.column_stack([xs[s:e], ys[s:e]]))
    return out


def ring_to_bytes(ring: np.ndarray) -> bytes:
    return np.ascontiguousarray(ring, dtype=np.float64).tobytes()


def rings_from_binary(col) -> list[np.ndarray]:
    """binary ring column → list of (n, 2) float64 arrays. Zero-copy:
    one frombuffer over the column's data buffer, per-ring views."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    bufs = col.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int32)[
        col.offset : col.offset + len(col) + 1
    ]
    data = np.frombuffer(bufs[2], dtype=np.float64)
    out = []
    for i in range(len(col)):
        s, e = offsets[i] // 8, offsets[i + 1] // 8
        out.append(data[s:e].reshape(-1, 2))
    return out


def edge_pack_from_binary(col):
    """binary ring column → ``geom.pack_ring_edges``-style edge pack
    built with zero per-ring Python work: ring vertex counts come from
    the binary offsets, vertices from one strided view of the data
    buffer. Feeds :func:`geom.points_in_rings_pairs`."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    bufs = col.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int32)[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.float64)
    lens = (offsets[1:] - offsets[:-1]) // 16  # 16 bytes per (x, y)
    total = int(lens.sum())
    first = offsets[0] // 8  # the column may be a slice of the buffer
    vx = data[first + 0 :: 2][:total]
    vy = data[first + 1 :: 2][:total]
    ends = np.cumsum(lens)
    starts = ends - lens
    nxt = np.arange(total) + 1
    if len(ends):
        nxt[ends - 1] = starts
    return vx, vy, vx[nxt], vy[nxt], lens, starts


def reject_holed(ds, op: str):
    """Guard for exterior-ring-only kernels: polygons with interior
    rings now flow in from every format reader (WKB/GPKG/shapefile/
    GeoJSON emit a ``holes`` column), but the packed-edge PIP and the
    raster mask treat rings as FILLED — a donut crown would silently
    capture stems/pixels inside its hole. This maps a cheap vectorized
    check over the stream and raises loudly on the first non-empty
    hole list, naming the remediations. No-op when the column is
    absent (the engine's native crown tables)."""
    if "holes" not in (ds.columns() or []):
        return ds

    def check(t: pa.Table) -> pa.Table:
        col = t["holes"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(col):
            import pyarrow.compute as pc

            mx = pc.max(pc.list_value_length(col)).as_py()
            if mx and mx > 0:
                raise NotImplementedError(
                    f"{op}: polygons with interior rings are not "
                    "supported by this kernel (rings are treated as "
                    "filled). Subtract the holes upstream "
                    "(functions.geom.difference_rings), split the "
                    "geometry, or use the hole-aware scalar kernels "
                    "(geom.points_in_polygon_with_holes / "
                    "polygon_area_with_holes)."
                )
        return t

    return ds.map_batches(check, batch_format="pyarrow")


def pack_rings(batch: pa.Table, ring_col: str = "ring",
               out_col: str = "ring_b") -> pa.Table:
    """map_batches stage: add binary-packed ring column, drop the nested
    one. Run before any shuffle that must carry geometry. Vectorized:
    the binary array is built from one interleaved buffer + the list
    column's own offsets — no per-row Python loop."""
    col = batch[ring_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy().astype(np.int64)
    flat = col.flatten()
    xs = flat.field("x").to_numpy()
    ys = flat.field("y").to_numpy()
    inter = np.empty(2 * len(xs), dtype=np.float64)
    inter[0::2] = xs
    inter[1::2] = ys
    byte_offsets = (offsets * 16).astype(np.int32)
    packed = pa.Array.from_buffers(
        pa.binary(), len(col),
        [None, pa.py_buffer(byte_offsets.tobytes()),
         pa.py_buffer(inter.tobytes())],
    )
    return batch.drop_columns([ring_col]).append_column(out_col, packed)


def attach_cell(batch: pa.Table, x_col: str = "x", y_col: str = "y",
                res: int = cells.DEFAULT_RES, out_col: str = "cell") -> pa.Table:
    """map_batches stage: (re-)derive the Morton cell key of point rows."""
    key = cells.cell_of(batch[x_col].to_numpy(), batch[y_col].to_numpy(), res)
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, pa.array(key, pa.uint64()))


def scramble_cell(batch: pa.Table, col: str = "cell") -> pa.Table:
    """map_batches stage: bijectively mix the Morton cell key right
    before a sort-based ``groupby(cell)`` (cells.mix64). Z-order makes
    a dense spatial cluster's cells key-adjacent, so the range
    partitioner would pack the whole hot region into one output block
    and its task becomes the straggler; mixing spreads neighboring
    cells uniformly while keeping cell→group exact. Apply only at
    shuffle time — the raw Morton key stays the storage/partition
    ordering (checkpoint partition ids are Z-order prefixes)."""
    mixed = cells.mix64(batch[col].to_numpy())
    i = batch.column_names.index(col)
    return batch.set_column(i, col, pa.array(mixed, pa.uint64()))


def explode_to_covering_cells(batch: pa.Table, res: int = cells.DEFAULT_RES,
                              out_col: str = "cell") -> pa.Table:
    """map_batches stage: replicate each bbox-carrying row to every cell
    its bbox intersects (halo replication — SURVEY.md §7.1 step 5).
    Requires minx/miny/maxx/maxy columns. Output has one row per
    (row, covered cell); downstream ops resolve duplicates by a
    groupby on the row's id (ownership rule)."""
    idx, cell_keys = cells.cells_covering_arrays(
        batch["minx"].to_numpy(),
        batch["miny"].to_numpy(),
        batch["maxx"].to_numpy(),
        batch["maxy"].to_numpy(),
        res,
    )
    taken = batch.take(pa.array(idx))
    if out_col in taken.column_names:
        taken = taken.drop_columns([out_col])
    return taken.append_column(out_col, pa.array(cell_keys, pa.uint64()))
