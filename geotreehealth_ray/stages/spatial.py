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
    "pack_holes",
    "decode_holes_blob",
    "pack_crown_blobs",
    "crown_pack_from_blob",
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
    """Guard for exterior-ring-only kernels. RETIRED from the big
    pipelines in r4: assign_stems_to_crowns / pip_join_pairs carry
    every loop in the crown blob (pack_crown_blobs) and the chips /
    zonal paths carry ``holes_b`` (pack_holes) — all four now COMPUTE
    holed polygons (crossing parity). Kept as a utility for any future
    kernel that is genuinely filled-ring-only: maps a cheap vectorized
    check over the stream and raises loudly on the first non-empty
    hole list. No-op when the column is absent."""
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


def _nested_loops_arrays(col):
    """list<list<struct{x,y}>> column → flat numpy views:
    (rings_per_row, ring_verts, xs, ys, ring_starts_norm) with all
    offsets normalized to 0. Shared by the hole packers below."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    outer = col.offsets.to_numpy().astype(np.int64)
    outer = outer - outer[0]
    n_rings = outer[1:] - outer[:-1]
    inner = col.flatten()
    if isinstance(inner, pa.ChunkedArray):
        inner = inner.combine_chunks()
    ioff = inner.offsets.to_numpy().astype(np.int64)
    ioff = ioff - ioff[0]
    ring_verts = ioff[1:] - ioff[:-1]
    flat = inner.flatten()
    xs = flat.field("x").to_numpy()
    ys = flat.field("y").to_numpy()
    return n_rings, ring_verts, xs, ys, ioff[:-1], outer[:-1]


def pack_holes(batch: pa.Table, holes_col: str = "holes",
               out_col: str = "holes_b") -> pa.Table:
    """map_batches stage: pack the ``holes`` list<list<struct{x,y}>>
    column into a self-contained per-row binary blob and drop the
    nested column — the hole-aware sibling of :func:`pack_rings`, run
    before any shuffle that must carry interior rings.

    Blob layout (all fields 8-byte aligned, f64 stream with int64
    bit-cast counts): ``[n_holes][verts_0 .. verts_{n-1}][interleaved
    x,y of every hole ring]``; rows with no holes pack to ZERO bytes
    (a 4-byte offset is their only exchange cost). Fully vectorized —
    one scatter over the batch, no per-row Python."""
    n, rv, xs, ys, ring_vstart, ring_rstart = _nested_loops_arrays(
        batch[holes_col])
    nrows = len(n)
    total_rings = int(n.sum())
    row_verts = np.bincount(
        np.repeat(np.arange(nrows), n), weights=rv, minlength=nrows
    ).astype(np.int64) if total_rings else np.zeros(nrows, np.int64)
    len_f64 = np.where(n > 0, 1 + n + 2 * row_verts, 0)
    total = int(len_f64.sum())
    buf = np.zeros(total, np.float64)
    ibuf = buf.view(np.int64)
    row_starts = np.cumsum(len_f64) - len_f64
    has = n > 0
    ibuf[row_starts[has]] = n[has]
    if total_rings:
        ring_row = np.repeat(np.arange(nrows), n)
        within = np.arange(total_rings) - ring_rstart[ring_row]
        ibuf[row_starts[ring_row] + 1 + within] = rv
        data_start = row_starts + 1 + n
        row_vert_base = ring_vstart[ring_rstart.clip(max=max(total_rings - 1, 0))]
        ring_dest = (data_start[ring_row]
                     + 2 * (ring_vstart - row_vert_base[ring_row]))
        total_verts = int(rv.sum())
        if total_verts:
            vert_ring = np.repeat(np.arange(total_rings), rv)
            vert_within = np.arange(total_verts) - np.repeat(ring_vstart, rv)
            dest = ring_dest[vert_ring] + 2 * vert_within
            buf[dest] = xs[:total_verts]
            buf[dest + 1] = ys[:total_verts]
    byte_off = np.zeros(nrows + 1, np.int32)
    np.cumsum(len_f64 * 8, out=byte_off[1:])
    packed = pa.Array.from_buffers(
        pa.binary(), nrows,
        [None, pa.py_buffer(byte_off.tobytes()), pa.py_buffer(buf.tobytes())],
    )
    return batch.drop_columns([holes_col]).append_column(out_col, packed)


def decode_holes_blob(b) -> list[np.ndarray]:
    """One ``holes_b`` blob → list of (n, 2) float64 hole rings
    (aligned copies — the BLAS-alignment determinism rule)."""
    if b is None or len(b) == 0:
        return []
    a = np.frombuffer(b, np.float64)
    n = int(a[:1].view(np.int64)[0])
    lens = a[1:1 + n].view(np.int64)
    out = []
    pos = 1 + n
    for L in lens:
        out.append(a[pos:pos + 2 * int(L)].reshape(-1, 2).copy())
        pos += 2 * int(L)
    return out


# Compact vertex encoding for the crown blob: verts are stored as
# int32 counts of 0.1 µm relative to the crown centroid, HALVING the
# dominant exchange column (measured at 960k bench stems: crown_b was
# 322 MB of the 485 MB union — 66% — at 16 B/vertex; compact is
# 8 B/vertex). Quantization error ≤ 50 nm per coordinate, far below
# any survey/LiDAR positioning noise and five orders below the chip
# pixel (0.1 m); the engine's determinism contract is unaffected
# (both parallelism levels read the same blobs). Crowns whose
# vertex-to-centroid reach exceeds the int32 range (~214.7 m — a
# malformed monster polygon) fall back to the exact f64 layout,
# flagged per row, so no geometry is ever rejected or silently
# clipped.
_BLOB_SCALE = 1e7  # int32 counts of 0.1 µm
_BLOB_INV = 1e-7
_BLOB_FMT_BIT = np.int64(1) << 33  # meta bit 33: 1 = compact int32 verts
_BLOB_DELTA_MAX = float(2**31 - 2)


def pack_crown_blobs(batch: pa.Table, multi: np.ndarray | None = None,
                     ring_col: str = "ring", holes_col: str = "holes",
                     cx_col: str = "cx", cy_col: str = "cy",
                     compact: bool | None = None) -> pa.Array:
    """Fused crown exchange payload for the assignment join: ONE binary
    column carrying everything a crown row needs through the all-to-all
    — centroid, multi-cell flag, and every loop (exterior + holes) —
    instead of 4 separate columns whose nulls every STEM row in the
    union also paid for (~24 dead bytes per stem row; VERDICT r3 next
    #3: shrink the assign exchange payload).

    Blob layout (8-aligned; header f64/int64, verts per format bit):
    ``[ccx f64][ccy f64][meta = n_loops | multi<<32 | fmt<<33]``
    then, fmt=1 (compact, the default whenever every vertex fits):
    ``[verts-per-loop int32 × n_loops, zero-padded to 8 B][dx,dy int32
    pairs = round((v − centroid) × 1e7)]``; fmt=0 (exact fallback):
    ``[verts-per-loop int64 × n_loops][interleaved x,y f64]``.
    Loop order: exterior first, then holes. Parsed back by
    :func:`crown_pack_from_blob`; with ``compact=False`` the resulting
    edge pack is element-identical to
    ``edge_pack_from_binary(pack_rings(...))`` for hole-free crowns;
    the default compact path reproduces every vertex to ≤ 50 nm.
    ``compact``: None = auto per batch (fallback if any row is out of
    int32 range), True = force (raises if out of range), False = f64."""
    ring = batch[ring_col]
    if isinstance(ring, pa.ChunkedArray):
        ring = ring.combine_chunks()
    r_off = ring.offsets.to_numpy().astype(np.int64)
    r_off = r_off - r_off[0]
    ext_verts = r_off[1:] - r_off[:-1]
    flat = ring.flatten()
    exs = flat.field("x").to_numpy()
    eys = flat.field("y").to_numpy()
    nrows = len(ext_verts)
    cx = batch[cx_col].to_numpy()
    cy = batch[cy_col].to_numpy()
    if holes_col in batch.column_names:
        nh, hrv, hxs, hys, h_vstart, h_rstart = _nested_loops_arrays(
            batch[holes_col])
        hole_row_verts = np.bincount(
            np.repeat(np.arange(nrows), nh), weights=hrv, minlength=nrows
        ).astype(np.int64) if nh.sum() else np.zeros(nrows, np.int64)
    else:
        nh = np.zeros(nrows, np.int64)
        hrv = np.zeros(0, np.int64)
        hxs = hys = np.zeros(0, np.float64)
        h_vstart = h_rstart = np.zeros(0, np.int64)
        hole_row_verts = np.zeros(nrows, np.int64)
    n_loops = 1 + nh
    row_verts = ext_verts + hole_row_verts
    total_hrings = int(nh.sum())
    total_ext = int(ext_verts.sum())
    total_hverts = int(hrv.sum())
    # per-vertex row index + quantized deltas (shared by the range
    # check and the compact scatter)
    vrow = np.repeat(np.arange(nrows), ext_verts)
    if total_ext:
        vwithin = np.arange(total_ext) - np.repeat(r_off[:-1], ext_verts)
        dxe = np.rint((exs[:total_ext] - cx[vrow]) * _BLOB_SCALE)
        dye = np.rint((eys[:total_ext] - cy[vrow]) * _BLOB_SCALE)
    else:
        vwithin = np.zeros(0, np.int64)
        dxe = dye = np.zeros(0, np.float64)
    if total_hrings:
        ring_row = np.repeat(np.arange(nrows), nh)
        within = np.arange(total_hrings) - h_rstart[ring_row]
        row_vert_base = h_vstart[h_rstart.clip(max=max(total_hrings - 1, 0))]
        vert_ring = np.repeat(np.arange(total_hrings), hrv)
        vert_within = np.arange(total_hverts) - np.repeat(h_vstart, hrv)
        hrow = ring_row[vert_ring]
        dxh = np.rint((hxs[:total_hverts] - cx[hrow]) * _BLOB_SCALE)
        dyh = np.rint((hys[:total_hverts] - cy[hrow]) * _BLOB_SCALE)
    else:
        dxh = dyh = np.zeros(0, np.float64)
    if compact is None or compact:
        peak = 0.0
        for d in (dxe, dye, dxh, dyh):
            if len(d):
                peak = max(peak, float(np.abs(d).max()))
        fits = peak <= _BLOB_DELTA_MAX
        if compact and not fits:
            raise ValueError(
                f"pack_crown_blobs(compact=True): vertex {peak * _BLOB_INV:.1f} m "
                "from centroid exceeds the int32 0.1 µm range (±214.7 m)")
        use_compact = fits
    else:
        use_compact = False
    lens_slots = (n_loops + 1) // 2 if use_compact else n_loops
    len_f64 = 3 + lens_slots + (1 if use_compact else 2) * row_verts
    total = int(len_f64.sum())
    buf = np.zeros(total, np.float64)
    ibuf = buf.view(np.int64)
    rs = np.cumsum(len_f64) - len_f64
    buf[rs] = cx
    buf[rs + 1] = cy
    mflag = (multi.astype(np.int64) << 32) if multi is not None else 0
    ibuf[rs + 2] = n_loops + mflag + (_BLOB_FMT_BIT if use_compact else 0)
    data_start = rs + 3 + lens_slots
    if use_compact:
        i32 = buf.view(np.int32)
        # loop-length section: int32, exterior is loop 0, holes follow
        i32[2 * (rs + 3)] = ext_verts
        if total_ext:
            dest = 2 * (data_start[vrow] + vwithin)
            i32[dest] = dxe.astype(np.int32)
            i32[dest + 1] = dye.astype(np.int32)
        if total_hrings:
            i32[2 * (rs[ring_row] + 3) + 1 + within] = hrv
            hole_base = data_start + ext_verts
            ring_dest = (hole_base[ring_row]
                         + (h_vstart - row_vert_base[ring_row]))
            if total_hverts:
                dest = 2 * (ring_dest[vert_ring] + vert_within)
                i32[dest] = dxh.astype(np.int32)
                i32[dest + 1] = dyh.astype(np.int32)
    else:
        # loop-length section: exterior is loop 0, holes follow
        ibuf[rs + 3] = ext_verts
        if total_ext:
            dest = data_start[vrow] + 2 * vwithin
            buf[dest] = exs[:total_ext]
            buf[dest + 1] = eys[:total_ext]
        if total_hrings:
            ibuf[rs[ring_row] + 4 + within] = hrv
            hole_base = data_start + 2 * ext_verts
            ring_dest = (hole_base[ring_row]
                         + 2 * (h_vstart - row_vert_base[ring_row]))
            if total_hverts:
                dest = ring_dest[vert_ring] + 2 * vert_within
                buf[dest] = hxs[:total_hverts]
                buf[dest + 1] = hys[:total_hverts]
    byte_off = np.zeros(nrows + 1, np.int32)
    np.cumsum(len_f64 * 8, out=byte_off[1:])
    return pa.Array.from_buffers(
        pa.binary(), nrows,
        [None, pa.py_buffer(byte_off.tobytes()), pa.py_buffer(buf.tobytes())],
    )


def crown_pack_from_blob(col):
    """``crown_b`` column → (ccx, ccy, multi, edge_pack) with the edge
    pack in :func:`geom.pack_ring_edges` layout, except ``lens`` /
    ``starts`` are PER POLYGON (all its loops' edges contiguous) and
    the next-vertex wrap is PER LOOP — crossing parity over all loops
    makes :func:`geom.points_in_rings_pairs` hole-aware with zero
    kernel change (a point in a hole crosses exterior + hole → even →
    outside; a point ON a hole boundary hits the on-edge rule →
    inside, matching geom.points_in_polygon_with_holes)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    z = np.zeros(0, np.float64)
    iz = np.zeros(0, np.int64)
    if n == 0:
        return z, z, np.zeros(0, bool), (z, z, z, z, iz, iz)
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], np.int32)[
        col.offset: col.offset + n + 1
    ].astype(np.int64) // 8
    data = np.frombuffer(bufs[2], np.float64)
    i32 = np.frombuffer(bufs[2], np.int32)
    rs = offs[:-1]
    ccx = data[rs]
    ccy = data[rs + 1]
    meta = data[rs + 2].view(np.int64)
    n_loops = meta & 0xFFFFFFFF
    multi = ((meta >> 32) & 1).astype(bool)
    fmt = ((meta >> 33) & 1).astype(bool)  # 1 = compact int32 verts
    total_loops = int(n_loops.sum())
    loop_row = np.repeat(np.arange(n), n_loops)
    loop_rstart = np.cumsum(n_loops) - n_loops
    loop_within = np.arange(total_loops) - loop_rstart[loop_row]
    # rows may mix formats after a shuffle — per-loop/vertex dispatch
    lmask = fmt[loop_row]
    loop_lens = np.empty(total_loops, np.int64)
    if lmask.any():
        loop_lens[lmask] = i32[
            (2 * (rs[loop_row] + 3) + loop_within)[lmask]]
    if not lmask.all():
        loop_lens[~lmask] = data[
            (rs[loop_row] + 3 + loop_within)[~lmask]].view(np.int64)
    data_start = rs + 3 + np.where(fmt, (n_loops + 1) // 2, n_loops)
    loop_cs = np.cumsum(loop_lens) - loop_lens
    row_vert_base = loop_cs[loop_rstart]
    loop_voff = loop_cs - row_vert_base[loop_row]  # verts before loop, in row
    total_verts = int(loop_lens.sum())
    vert_loop = np.repeat(np.arange(total_loops), loop_lens)
    vert_within = np.arange(total_verts) - np.repeat(loop_cs, loop_lens)
    vx = np.empty(total_verts, np.float64)
    vy = np.empty(total_verts, np.float64)
    vmask = lmask[vert_loop]
    if vmask.any():
        src = 2 * ((data_start[loop_row] + loop_voff)[vert_loop]
                   + vert_within)[vmask]
        rowv = loop_row[vert_loop[vmask]]
        vx[vmask] = ccx[rowv] + i32[src] * _BLOB_INV
        vy[vmask] = ccy[rowv] + i32[src + 1] * _BLOB_INV
    if not vmask.all():
        nm = ~vmask
        src = ((data_start[loop_row] + 2 * loop_voff)[vert_loop]
               + 2 * vert_within)[nm]
        vx[nm] = data[src]
        vy[nm] = data[src + 1]
    ends = np.cumsum(loop_lens)
    starts_l = ends - loop_lens
    nxt = np.arange(total_verts) + 1
    if total_verts:
        nxt[ends - 1] = starts_l
    poly_lens = np.bincount(
        loop_row, weights=loop_lens, minlength=n
    ).astype(np.int64)
    poly_starts = np.cumsum(poly_lens) - poly_lens
    return ccx, ccy, multi, (vx, vy, vx[nxt], vy[nxt], poly_lens, poly_starts)


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
