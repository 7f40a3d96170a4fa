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
    "rings_from_arrow",
    "ring_to_bytes",
    "rings_from_binary",
    "attach_cell",
    "pack_rings",
    "explode_to_covering_cells",
]


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
    """binary ring column → list of (n, 2) arrays (zero-copy per value)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = []
    for v in col:
        buf = v.as_buffer()
        out.append(np.frombuffer(buf, dtype=np.float64).reshape(-1, 2))
    return out


def pack_rings(batch: pa.Table, ring_col: str = "ring",
               out_col: str = "ring_b") -> pa.Table:
    """map_batches stage: add binary-packed ring column, drop the nested
    one. Run before any shuffle that must carry geometry."""
    rings = rings_from_arrow(batch[ring_col])
    packed = pa.array([ring_to_bytes(r) for r in rings], pa.binary())
    return batch.drop_columns([ring_col]).append_column(out_col, packed)


def attach_cell(batch: pa.Table, x_col: str = "x", y_col: str = "y",
                res: int = cells.DEFAULT_RES, out_col: str = "cell") -> pa.Table:
    """map_batches stage: (re-)derive the Morton cell key of point rows."""
    key = cells.cell_of(batch[x_col].to_numpy(), batch[y_col].to_numpy(), res)
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, pa.array(key, pa.uint64()))


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
