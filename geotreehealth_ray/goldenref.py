"""Single-process golden references for the composite end-to-end
queries whose geometry/codec math is not SQL-expressible
(synth_nms, synth_delineation, synth_training, synth_alignment,
synth_pansharpen).

These are DISTRIBUTION oracles: each composes the engine's pure
per-row kernels (functions/geom.py, functions/codec.py,
stages/raster.py, pipelines/lidar.py — all individually verified by
unit goldens and/or the exact SQL oracles of their component queries)
in one plain global loop, with none of the engine's partitioning,
salting, co-partition exchanges, or per-cell/halo decompositions.
A distributed-plan bug (dropped partition boundary row, double-emitted
halo pair, order-dependent reduce) changes the engine output but not
these, so the driver's value-hash compare catches it.

``__ray_entry__.oracle_sql`` materializes each as a parquet golden
table (regenerated once per process — staleness-proof against engine
edits) and points DuckDB at it via ``read_parquet``.

Reference provenance: greedy NMS get_polygons.py:785-819; delineation
composition tree_delineation/delineation_pipeline.py:61-185; training
sample assembly tree_health_detection/build_dataloaders.py:13-169;
alignment field_data_alignment/utils.py:12-119.
"""

from __future__ import annotations

import glob
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .functions import codec, geom

__all__ = [
    "read_dir", "rings_of", "golden_nms", "golden_delineation",
    "golden_chip_rows", "golden_training", "golden_alignment",
    "golden_pansharpen",
]


def read_dir(path: str, columns: list[str] | None = None) -> pa.Table:
    """Concat all parquet shards of a synth table dir, filename order
    (the same order ray.data.read_parquet enumerates them)."""
    files = sorted(glob.glob(f"{path}/**/*.parquet", recursive=True))
    return pa.concat_tables(pq.read_table(f, columns=columns) for f in files)


def rings_of(tbl: pa.Table) -> list[np.ndarray]:
    """list<struct<x,y>> ring column → per-row (n, 2) float arrays."""
    return [
        np.array([[p["x"], p["y"]] for p in row], dtype=np.float64)
        for row in tbl["ring"].to_pylist()
    ]


def golden_nms(crowns: pa.Table, threshold: float = 0.3) -> pd.DataFrame:
    """Global sequential greedy NMS, score-desc with crown_id-asc
    tie-break; suppress when intersection / max(area) > threshold
    (reference get_polygons.py:798-816). One loop, no cells, no halo —
    the engine's per-cell/halo decomposition must agree exactly."""
    ids = crowns["crown_id"].to_pylist()
    scores = crowns["score"].to_numpy()
    rings = rings_of(crowns)
    order = sorted(range(len(ids)), key=lambda i: (-scores[i], ids[i]))
    kept: list[np.ndarray] = []
    selected: dict[str, bool] = {}
    for i in order:
        ok = all(
            geom.overlap_of_max_area(rings[i], kr) <= threshold
            for kr in kept
        )
        selected[ids[i]] = ok
        if ok:
            kept.append(rings[i])
    return pd.DataFrame(
        {"crown_id": ids, "selected": [selected[c] for c in ids]}
    )


def golden_delineation(crowns: pa.Table, stems: pa.Table) -> pd.DataFrame:
    """delineation_pipeline output rows: NMS flag on every crown, then
    crowns with a stem joined to each matching stem-attribute row
    (multi-year stems fan out, like the engine's hash_join)."""
    flags = golden_nms(crowns)
    cr = crowns.select(["crown_id", "stem_id"]).to_pandas()
    cr = cr.merge(flags, on="crown_id")
    cr = cr[cr["stem_id"].notna()]
    st = stems.select(["stem_id", "species"]).to_pandas()
    out = cr.merge(st, on="stem_id", how="inner")
    return out[["crown_id", "stem_id", "selected", "species"]]


def golden_chip_rows(crowns: pa.Table, tiles: pa.Table, images: pa.Table,
                     grid) -> pd.DataFrame:
    """Per-crown chip rows via one plain loop: analytic owning tile,
    decode the tile, window by the affine, center-parity scanline
    mask, masked encode — reference rasterio.mask semantics
    (store_data_structures.py:14-39). Mirrors pipelines/chips.py
    kernels with zero shuffle machinery."""
    tid = grid.owning_tile(
        crowns["minx"].to_numpy(), crowns["miny"].to_numpy(),
        crowns["maxx"].to_numpy(), crowns["maxy"].to_numpy(),
    )
    rings = rings_of(crowns)
    cids = crowns["crown_id"].to_pylist()
    cells_ = crowns["cell"].to_numpy()
    tdf = tiles.select(
        ["tile_id", "bytes", "fmt", "a", "c", "e", "f"]
    ).to_pandas().set_index("tile_id")
    cap_key = "image_id" if "image_id" in images.column_names else "tile_id"
    caps = dict(zip(images[cap_key].to_pylist(), images["caption"].to_pylist()))
    decoded: dict[str, np.ndarray] = {}
    rows = []
    for i in range(len(cids)):
        t = tid[i]
        if t == "":
            continue
        if t not in decoded:
            r = tdf.loc[t]
            img = codec.decode(r["bytes"], r["fmt"])
            if img.ndim == 2:
                img = img[:, :, None]
            decoded[t] = img
        r = tdf.loc[t]
        img = decoded[t]
        a, c0, e, f0 = float(r["a"]), float(r["c"]), float(r["e"]), float(r["f"])
        th, tw = img.shape[0], img.shape[1]
        ring = rings[i]
        minx, miny, maxx, maxy = geom.ring_bbox(ring)
        col0 = max(0, int(np.floor((minx - c0) / a)))
        col1 = min(tw, int(np.ceil((maxx - c0) / a)))
        row0 = max(0, int(np.floor((maxy - f0) / e)))
        row1 = min(th, int(np.ceil((miny - f0) / e)))
        if col1 <= col0 or row1 <= row0:
            continue
        crop = img[row0:row1, col0:col1]
        wx = c0 + (np.arange(col0, col1) + 0.5) * a
        wy = f0 + (np.arange(row0, row1) + 0.5) * e
        inside = geom.raster_mask(ring, wx, wy)
        masked = crop * inside[:, :, None]
        rows.append({
            "crown_id": cids[i], "tile_id": t,
            "w": crop.shape[1], "h": crop.shape[0],
            "bytes": codec.encode(masked, r["fmt"]), "fmt": r["fmt"],
            "caption": caps.get(t, ""),
            "mask_px_count": int(inside.sum()),
            "pixel_checksum": int(masked.sum(dtype=np.int64)),
            "cell": int(cells_[i]),
        })
    return pd.DataFrame(rows)


def golden_training(crowns: pa.Table, tiles: pa.Table, images: pa.Table,
                    lidar: pa.Table, grid, rgb_shape: int = 16,
                    max_points: int = 64) -> pd.DataFrame:
    """Training-handoff rows (crown_id, hsi_crc, rgb_crc, lidar_crc,
    label): golden chips × per-crown inclusive-bbox lidar point sets
    (canonical (x, y, z) lexsort → hash-ranked subsample → mean-center)
    → the reference __getitem__ sample math (build_dataloaders.py:
    58-105) in one loop."""
    from .pipelines.lidar import normalize_xyz, subsample_points
    from .pipelines.training import _pseudo_hsi_cube
    from .stages.raster import _center_crop_or_pad, normalize_rgb_array, preprocess_hsi

    chips = golden_chip_rows(crowns, tiles, images, grid)
    px = lidar["x"].to_numpy()
    py = lidar["y"].to_numpy()
    pz = lidar["z"].to_numpy()
    cb = crowns.select(["crown_id", "minx", "miny", "maxx", "maxy"]).to_pandas()
    rows = []
    for cr in cb.itertuples():
        m = (px >= cr.minx) & (px <= cr.maxx) & (py >= cr.miny) & (py <= cr.maxy)
        if not m.any():
            continue
        pts = np.column_stack([px[m], py[m], pz[m]])
        pts = pts[np.lexsort((pts[:, 2], pts[:, 1], pts[:, 0]))]
        fixed = normalize_xyz(subsample_points(pts, max_points))
        rows.append({"crown_id": cr.crown_id, "xyz": fixed})
    lp = pd.DataFrame(rows)
    j = chips.merge(lp, on="crown_id", how="inner")
    out = {"crown_id": [], "hsi_crc": [], "rgb_crc": [], "lidar_crc": [],
           "label": []}
    for row in j.itertuples():
        img = codec.decode(row.bytes, row.fmt)
        if img.ndim == 2:
            img = img[:, :, None]
        if img.shape[2] == 1:
            img = np.repeat(img, 3, axis=2)
        rgb = np.moveaxis(normalize_rgb_array(img, crop=rgb_shape), 2, 0)
        raw = _center_crop_or_pad(
            img[:, :, :3].astype(np.float64), rgb_shape, rgb_shape
        )
        hsi = np.moveaxis(preprocess_hsi(_pseudo_hsi_cube(raw)), 2, 0)
        out["crown_id"].append(row.crown_id)
        out["hsi_crc"].append(zlib.crc32(hsi.astype(np.float32).tobytes()))
        out["rgb_crc"].append(zlib.crc32(rgb.astype(np.float32).tobytes()))
        out["lidar_crc"].append(
            zlib.crc32(row.xyz.astype(np.float32).tobytes())
        )
        out["label"].append(row.caption or "")
    df = pd.DataFrame(out)
    for c in ("hsi_crc", "rgb_crc", "lidar_crc"):
        df[c] = df[c].astype("int64")
    return df


def golden_alignment(stems: pa.Table, dx: float = 1.5,
                     dy: float = -0.75) -> pd.DataFrame:
    """alignment_pipeline on a (dx, dy)-shifted field copy, all on the
    driver: control-point match, ridge-poly fit (the engine's own
    driver-side fit — the distributed part under test is the broadcast
    apply + collection), per-row design·coef shift, ×1000 snap."""
    from .pipelines.alignment import _design, fit_offset_model, match_control_points

    ref = stems.select(["stem_id", "x", "y"]).to_pandas()
    field = ref.assign(x=ref["x"] + dx, y=ref["y"] + dy)
    matched = match_control_points(
        field.drop_duplicates("stem_id"), ref.drop_duplicates("stem_id")
    )
    coef = fit_offset_model(matched)
    x = field["x"].to_numpy()
    y = field["y"].to_numpy()
    d = _design(x, y) @ coef
    return pd.DataFrame({
        "stem_id": field["stem_id"],
        "x_c3": np.floor((x + d[:, 0]) * 1000 + 0.5).astype("int64"),
        "y_c3": np.floor((y + d[:, 1]) * 1000 + 0.5).astype("int64"),
    })


def golden_pansharpen(images: pa.Table) -> pd.DataFrame:
    """LAB pansharpen per image (stages/raster.py pansharpen): 2× box
    mean low-res RGB fused with the full-res gray pan; slim stats."""
    from .stages.raster import pansharpen

    rows = []
    for i in range(len(images)):
        img = codec.decode(images["bytes"][i].as_py(), images["fmt"][i].as_py())
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        h2, w2 = img.shape[0] // 2 * 2, img.shape[1] // 2 * 2
        c = img[:h2, :w2].astype(np.uint32)
        low = ((c[0::2, 0::2] + c[0::2, 1::2] + c[1::2, 0::2]
                + c[1::2, 1::2] + 2) // 4).astype(np.uint8)
        pan = img[:h2, :w2].mean(axis=2)
        sharp = pansharpen(low, pan)
        rows.append({
            "image_id": images["image_id"][i].as_py(),
            "px_sum": int(sharp.astype(np.int64).sum()),
            "h": sharp.shape[0], "w": sharp.shape[1],
        })
    df = pd.DataFrame(rows)
    df["h"] = df["h"].astype("int64")
    df["w"] = df["w"].astype("int64")
    return df
