"""Deterministic synthetic geospatial tables (FIXTURES.md).

Generates the engine's five logical tables — ``images`` (authoritative
input shape per BASELINE.json:input_hint), ``stems``, ``crowns``,
``tiles``, ``lidar`` — as seeded, shard-parallel pyarrow tables. Every
shard is a pure function of (seed, shard_id), so any worker regenerates
identical rows: the N-CPU and 4N-CPU bench runs consume byte-identical
input (BASELINE.md determinism requirement).

Semantics mirrored from the reference fixtures and filters:
- stems attrs = label row schema (reference tests/data/labels/0.csv:1)
  with duplicate stem_id across years (latest-wins dedup,
  tree_delineation/batch_sam.py:740-765) and the D→DS recode population
  (tree_health_detection/main.py:159).
- crowns are star-convex rings (reference masks→contours produce simple
  rings, get_polygons.py:705-780) with overlapping pairs spanning every
  NMS threshold (0.3 / 0.5 / 0.8).
- tiles = regular grid, 0.1 m/px (reference config.py:53), with
  overlap buffer (config.py:42-45); tile pixel texture is a pure
  function of WORLD coordinates, so a chip cropped from any tile can be
  verified against the formula (golden chips without golden rasters).
- images = one row per tile in the input_hint schema
  (image_id, bytes, w, h, fmt, caption, phash).

Skew: a fraction of stems is drawn from dense Gaussian "forest patch"
clusters so per-cell counts are heavy-tailed — this exercises the
salted-groupby path (SURVEY.md §7.1 step 9).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..functions import codec, geom
from ..functions.cells import cell_of

__all__ = ["SynthConfig", "gen_stems", "gen_crowns", "gen_tiles_and_images",
           "gen_lidar", "write_all", "texture_at", "TINY", "SMALL"]

_SPECIES = ["ACRU", "QUAL", "LITU", "FAGR", "PIST", "CATO"]
_SITES = ["HARV", "SERC", "OSBS"]
_STATUS = ["A", "AU", "DS", "D"]


@dataclass(frozen=True)
class SynthConfig:
    seed: int = 42
    n_stems: int = 2_000          # unique stems (extra year-duplicate rows added)
    extent_m: float = 400.0       # square world extent (origin at offset)
    origin_m: float = 1024.0      # keep everything inside the cell plane
    tile_m: float = 25.6          # tile edge (256 px at 0.1 m)
    overlap_m: float = 3.2        # tile overlap buffer (reference 100 px → 10 m @0.1m; scaled)
    res_m: float = 0.1            # raster resolution (reference config.py:53)
    cell_res: int = 13            # Morton resolution for partitioning
    crown_frac: float = 0.8       # stems that own a crown
    extra_crown_frac: float = 0.15  # unlabeled crowns (null stem_id)
    cluster_frac: float = 0.5     # stems inside dense skew clusters
    n_clusters: int = 8
    year_dup_frac: float = 0.3    # stems with rows in >1 year
    lidar_per_crown: int = 30
    shard_rows: int = 4_000       # stems per generation shard

    @property
    def n_shards(self) -> int:
        return max(1, -(-self.n_stems // self.shard_rows))


TINY = SynthConfig(n_stems=300, extent_m=160.0, lidar_per_crown=12)
SMALL = SynthConfig(n_stems=2_000, extent_m=400.0)


def _rng(cfg: SynthConfig, table: str, shard: int) -> np.random.Generator:
    h = hashlib.sha256(f"{cfg.seed}:{table}:{shard}".encode()).digest()
    return np.random.default_rng(int.from_bytes(h[:8], "little"))


def _stem_positions(cfg: SynthConfig, shard: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Clustered Poisson process; returns (ids, x, y) for one shard."""
    lo = shard * cfg.shard_rows
    hi = min(cfg.n_stems, lo + cfg.shard_rows)
    n = hi - lo
    rng = _rng(cfg, "stem_pos", shard)
    ids = np.arange(lo, hi, dtype=np.int64)
    # cluster centers are global (seeded independent of shard)
    crng = _rng(cfg, "clusters", 0)
    centers = cfg.origin_m + crng.random((cfg.n_clusters, 2)) * cfg.extent_m
    in_cluster = rng.random(n) < cfg.cluster_frac
    which = rng.integers(0, cfg.n_clusters, n)
    x = cfg.origin_m + rng.random(n) * cfg.extent_m
    y = cfg.origin_m + rng.random(n) * cfg.extent_m
    spread = cfg.extent_m * 0.02
    x = np.where(in_cluster, centers[which, 0] + rng.normal(0, spread, n), x)
    y = np.where(in_cluster, centers[which, 1] + rng.normal(0, spread, n), y)
    x = np.clip(x, cfg.origin_m, cfg.origin_m + cfg.extent_m - 1e-6)
    y = np.clip(y, cfg.origin_m, cfg.origin_m + cfg.extent_m - 1e-6)
    return ids, x, y


def gen_stems(cfg: SynthConfig, shard: int) -> pa.Table:
    ids, x, y = _stem_positions(cfg, shard)
    n = len(ids)
    rng = _rng(cfg, "stems", shard)
    status = np.array(_STATUS)[rng.integers(0, len(_STATUS), n)]
    crwnpst = rng.integers(1, 6, n).astype(np.int32)
    dbh = np.round(np.exp(rng.normal(3.0, 0.5, n)), 2)  # includes ≤10 tail
    site = np.array(_SITES)[rng.integers(0, len(_SITES), n)]
    species = np.array(_SPECIES)[rng.integers(0, len(_SPECIES), n)]
    fad = np.where(rng.random(n) < 0.1, "FAD", None)
    year = rng.integers(2018, 2022, n).astype(np.int32)

    # year-duplicate rows: older record with smaller DBH (dedup keeps
    # max-DBH then latest-year — batch_sam.py:740-765)
    dup = rng.random(n) < cfg.year_dup_frac
    d_ids = ids[dup]
    d_year = (year[dup] - rng.integers(1, 3, dup.sum())).astype(np.int32)
    d_dbh = np.round(dbh[dup] * rng.uniform(0.7, 0.95, dup.sum()), 2)

    all_ids = np.concatenate([ids, d_ids])
    cols = {
        "stem_id": np.char.zfill(all_ids.astype(str), 8),
        "x": np.concatenate([x, x[dup]]),
        "y": np.concatenate([y, y[dup]]),
        "status": np.concatenate([status, status[dup]]),
        "crwnpst": np.concatenate([crwnpst, crwnpst[dup]]),
        "dbh": np.concatenate([dbh, d_dbh]),
        "site_id": np.concatenate([site, site[dup]]),
        "species": np.concatenate([species, species[dup]]),
        "fad": np.concatenate([fad, fad[dup]]),
        "year": np.concatenate([year, d_year]),
    }
    t = pa.table(
        {
            "stem_id": pa.array(cols["stem_id"]),
            "x": pa.array(cols["x"], pa.float64()),
            "y": pa.array(cols["y"], pa.float64()),
            "cell": pa.array(cell_of(cols["x"], cols["y"], cfg.cell_res), pa.uint64()),
            "status": pa.array(cols["status"]),
            "crwnpst": pa.array(cols["crwnpst"], pa.int32()),
            "dbh": pa.array(cols["dbh"], pa.float64()),
            "site_id": pa.array(cols["site_id"]),
            "species": pa.array(cols["species"]),
            "fad": pa.array(cols["fad"], pa.string()),
            "year": pa.array(cols["year"], pa.int32()),
        }
    )
    return t


def _crown_ring(cfg: SynthConfig, crown_idx: int, cx: float, cy: float,
                radius: float, n_vert: int) -> np.ndarray:
    return geom.make_star_ring(cx, cy, radius, n_vert, seed=cfg.seed * 1_000_003 + crown_idx)


def gen_crowns(cfg: SynthConfig, shard: int) -> pa.Table:
    """Crown polygons for one shard of stems (+ unlabeled extras)."""
    ids, x, y = _stem_positions(cfg, shard)
    n = len(ids)
    rng = _rng(cfg, "crowns", shard)
    own = rng.random(n) < cfg.crown_frac
    sidx = np.where(own)[0]
    n_extra = int(n * cfg.extra_crown_frac)

    crown_ids, stem_ids, rings, scores = [], [], [], []
    # stem-owned crowns: centered near the stem (stem guaranteed inside)
    for i in sidx:
        radius = float(np.clip(np.exp(rng.normal(1.1, 0.45)), 1.0, 12.0))
        nv = int(rng.integers(8, 25))
        cidx = int(ids[i])
        ring = _crown_ring(cfg, cidx, x[i] + rng.normal(0, 0.3), y[i] + rng.normal(0, 0.3), radius, nv)
        crown_ids.append(f"c_{cidx:08d}")
        stem_ids.append(f"{ids[i]:08d}".zfill(8))
        rings.append(ring)
        scores.append(float(rng.random()))
        # overlapping twin at a controlled offset for some crowns — spans
        # the NMS thresholds 0.3/0.5/0.8 (get_polygons.py:815 etc.)
        if rng.random() < 0.25:
            off = radius * float(rng.choice([0.2, 0.5, 0.9, 1.4]))
            ring2 = _crown_ring(cfg, cidx + 50_000_000, x[i] + off, y[i], radius * float(rng.uniform(0.8, 1.2)), nv)
            crown_ids.append(f"c_{cidx + 50_000_000:08d}")
            stem_ids.append(None)
            rings.append(ring2)
            scores.append(float(rng.random()))
    # unlabeled extras scattered in the shard's area
    for j in range(n_extra):
        cidx = 100_000_000 + shard * cfg.shard_rows + j
        cx = cfg.origin_m + rng.random() * cfg.extent_m
        cy = cfg.origin_m + rng.random() * cfg.extent_m
        radius = float(np.clip(np.exp(rng.normal(0.9, 0.5)), 1.0, 10.0))
        ring = _crown_ring(cfg, cidx, cx, cy, radius, int(rng.integers(8, 25)))
        crown_ids.append(f"c_{cidx:08d}")
        stem_ids.append(None)
        rings.append(ring)
        scores.append(float(rng.random()))

    flat_x = [r[:, 0] for r in rings]
    flat_y = [r[:, 1] for r in rings]
    bboxes = np.array([geom.ring_bbox(r) for r in rings]) if rings else np.empty((0, 4))
    cents = np.array([geom.ring_centroid(r) for r in rings]) if rings else np.empty((0, 2))
    areas = np.array([geom.ring_area(r) for r in rings])
    ring_type = pa.list_(pa.struct([("x", pa.float64()), ("y", pa.float64())]))
    ring_arr = pa.array(
        [[{"x": float(px), "y": float(py)} for px, py in zip(rx, ry)]
         for rx, ry in zip(flat_x, flat_y)],
        type=ring_type,
    )
    return pa.table(
        {
            "crown_id": pa.array(crown_ids),
            "stem_id": pa.array(stem_ids, pa.string()),
            "ring": ring_arr,
            "score": pa.array(np.array(scores, dtype=np.float32), pa.float32()),
            "area": pa.array(areas, pa.float64()),
            "cx": pa.array(cents[:, 0] if len(cents) else [], pa.float64()),
            "cy": pa.array(cents[:, 1] if len(cents) else [], pa.float64()),
            "minx": pa.array(bboxes[:, 0] if len(bboxes) else [], pa.float64()),
            "miny": pa.array(bboxes[:, 1] if len(bboxes) else [], pa.float64()),
            "maxx": pa.array(bboxes[:, 2] if len(bboxes) else [], pa.float64()),
            "maxy": pa.array(bboxes[:, 3] if len(bboxes) else [], pa.float64()),
            "cell": pa.array(
                cell_of(cents[:, 0], cents[:, 1], cfg.cell_res)
                if len(cents)
                else np.empty(0, np.uint64),
                pa.uint64(),
            ),
        }
    )


def texture_at(wx: np.ndarray, wy: np.ndarray, res_m: float, seed: int) -> np.ndarray:
    """Deterministic RGB texture as a pure function of world coords.

    Returns uint8 array of shape broadcast(wx, wy) x 3. Any chip cropped
    from any tile must equal this formula evaluated at the chip's world
    pixel centers — the per-row invariant for golden chips."""
    gx = np.floor(wx / res_m).astype(np.int64)
    gy = np.floor(wy / res_m).astype(np.int64)
    r = (gx * 31 + gy * 17 + seed) % 251
    g = (gx * 13 + gy * 41 + seed * 7) % 241
    b = (gx * 29 + gy * 23 + seed * 13) % 239
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def tile_grid(cfg: SynthConfig) -> list[tuple[str, float, float]]:
    """All (tile_id, minx, miny) of the regular grid covering the extent."""
    n = int(np.ceil(cfg.extent_m / cfg.tile_m))
    w = max(4, len(str(max(n - 1, 0))))  # GridSpec.id_width contract
    out = []
    for r in range(n):
        for c in range(n):
            out.append(
                (f"t_{r:0{w}d}_{c:0{w}d}", cfg.origin_m + c * cfg.tile_m, cfg.origin_m + r * cfg.tile_m)
            )
    return out


def gen_tiles_and_images(cfg: SynthConfig, tile_ids: list[tuple[str, float, float]] | None = None
                         ) -> tuple[pa.Table, pa.Table]:
    """tiles (geo metadata + bytes) and images (input_hint schema) rows.

    Tiles include the overlap buffer on max edges (reference
    split_raster overlap, batch_sam.py:359): pixel extent covers
    [minx, minx + tile_m + overlap_m) clipped to the world extent.
    """
    if tile_ids is None:
        tile_ids = tile_grid(cfg)
    rng = _rng(cfg, "tiles", 0)
    t_rows = {k: [] for k in ("tile_id", "minx", "miny", "maxx", "maxy", "w", "h",
                              "a", "b", "c", "d", "e", "f", "bytes", "fmt", "cell")}
    i_rows = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")}
    extent_max = cfg.origin_m + cfg.extent_m
    for tid, minx, miny in tile_ids:
        maxx = min(minx + cfg.tile_m + cfg.overlap_m, extent_max)
        maxy = min(miny + cfg.tile_m + cfg.overlap_m, extent_max)
        w = int(round((maxx - minx) / cfg.res_m))
        h = int(round((maxy - miny) / cfg.res_m))
        # pixel centers; row 0 = TOP of tile (y-flip, get_polygons.py:659)
        pxc = minx + (np.arange(w) + 0.5) * cfg.res_m
        pyc = maxy - (np.arange(h) + 0.5) * cfg.res_m
        img = texture_at(pxc[None, :], pyc[:, None], cfg.res_m, cfg.seed)
        fmt = "png" if rng.random() < 0.5 else "qdct"
        data = codec.encode(img, fmt)
        t_rows["tile_id"].append(tid)
        t_rows["minx"].append(minx); t_rows["miny"].append(miny)
        t_rows["maxx"].append(maxx); t_rows["maxy"].append(maxy)
        t_rows["w"].append(w); t_rows["h"].append(h)
        # affine: world = A @ (col, row) — a..f as (a, b, c, d, e, f) with
        # x = a*col + b*row + c ; y = d*col + e*row + f (y-flipped raster)
        t_rows["a"].append(cfg.res_m); t_rows["b"].append(0.0); t_rows["c"].append(minx)
        t_rows["d"].append(0.0); t_rows["e"].append(-cfg.res_m); t_rows["f"].append(maxy)
        t_rows["bytes"].append(data); t_rows["fmt"].append(fmt)
        cx, cy = (minx + maxx) / 2, (miny + maxy) / 2
        t_rows["cell"].append(int(cell_of(np.array([cx]), np.array([cy]), cfg.cell_res)[0]))
        i_rows["image_id"].append(tid)
        i_rows["bytes"].append(data)
        i_rows["w"].append(w); i_rows["h"].append(h); i_rows["fmt"].append(fmt)
        i_rows["caption"].append(f"aerial tile {tid} extent {minx:.1f} {miny:.1f} res {cfg.res_m}")
        i_rows["phash"].append(codec.average_hash(img))
    tiles = pa.table({
        "tile_id": pa.array(t_rows["tile_id"]),
        "minx": pa.array(t_rows["minx"], pa.float64()),
        "miny": pa.array(t_rows["miny"], pa.float64()),
        "maxx": pa.array(t_rows["maxx"], pa.float64()),
        "maxy": pa.array(t_rows["maxy"], pa.float64()),
        "w": pa.array(t_rows["w"], pa.int32()),
        "h": pa.array(t_rows["h"], pa.int32()),
        "a": pa.array(t_rows["a"], pa.float64()),
        "b": pa.array(t_rows["b"], pa.float64()),
        "c": pa.array(t_rows["c"], pa.float64()),
        "d": pa.array(t_rows["d"], pa.float64()),
        "e": pa.array(t_rows["e"], pa.float64()),
        "f": pa.array(t_rows["f"], pa.float64()),
        "bytes": pa.array(t_rows["bytes"], pa.binary()),
        "fmt": pa.array(t_rows["fmt"]),
        "cell": pa.array(t_rows["cell"], pa.uint64()),
    })
    images = pa.table({
        "image_id": pa.array(i_rows["image_id"]),
        "bytes": pa.array(i_rows["bytes"], pa.binary()),
        "w": pa.array(i_rows["w"], pa.int32()),
        "h": pa.array(i_rows["h"], pa.int32()),
        "fmt": pa.array(i_rows["fmt"]),
        "caption": pa.array(i_rows["caption"]),
        "phash": pa.array(i_rows["phash"], pa.int64()),
    })
    return tiles, images


def gen_lidar(cfg: SynthConfig, shard: int) -> pa.Table:
    """Canopy-height-model point cloud: per-crown paraboloid + ground
    noise (reference fixture (2773, 6) xyzrgb, tests/data/lidar/0.npy)."""
    ids, x, y = _stem_positions(cfg, shard)
    rng = _rng(cfg, "lidar", shard)
    n = len(ids)
    k = cfg.lidar_per_crown
    # crown points
    theta = rng.random((n, k)) * 2 * np.pi
    rr = np.sqrt(rng.random((n, k))) * 4.0
    px = x[:, None] + rr * np.cos(theta)
    py = y[:, None] + rr * np.sin(theta)
    hmax = 10.0 + 20.0 * rng.random((n, 1))
    pz = hmax * (1 - (rr / 4.0) ** 2) + rng.normal(0, 0.3, (n, k))
    # ground noise points
    gk = max(1, k // 3)
    gx = cfg.origin_m + rng.random((n, gk)) * cfg.extent_m
    gy = cfg.origin_m + rng.random((n, gk)) * cfg.extent_m
    gz = rng.normal(0, 0.2, (n, gk))
    ax = np.concatenate([px.ravel(), gx.ravel()])
    ay = np.concatenate([py.ravel(), gy.ravel()])
    az = np.concatenate([pz.ravel(), gz.ravel()])
    m = len(ax)
    return pa.table({
        "x": pa.array(ax, pa.float64()),
        "y": pa.array(ay, pa.float64()),
        "z": pa.array(az, pa.float64()),
        "r": pa.array(rng.integers(0, 65535, m, dtype=np.uint16), pa.uint16()),
        "g": pa.array(rng.integers(0, 65535, m, dtype=np.uint16), pa.uint16()),
        "b": pa.array(rng.integers(0, 65535, m, dtype=np.uint16), pa.uint16()),
        "cell": pa.array(cell_of(ax, ay, cfg.cell_res), pa.uint64()),
    })


def write_all(cfg: SynthConfig, out_dir: str) -> dict[str, str]:
    """Driver-side writer: one parquet file per shard per table under
    ``out_dir/<table>/``. Used by tests and by bench data prep (cached)."""
    import os

    import pyarrow.parquet as pq

    paths = {}
    for name, gen in (("stems", gen_stems), ("crowns", gen_crowns), ("lidar", gen_lidar)):
        d = os.path.join(out_dir, name)
        os.makedirs(d, exist_ok=True)
        for s in range(cfg.n_shards):
            pq.write_table(gen(cfg, s), os.path.join(d, f"part-{s:05d}.parquet"))
        paths[name] = d
    tiles, images = gen_tiles_and_images(cfg)
    for name, tbl in (("tiles", tiles), ("images", images)):
        d = os.path.join(out_dir, name)
        os.makedirs(d, exist_ok=True)
        pq.write_table(tbl, os.path.join(d, "part-00000.parquet"))
        paths[name] = d
    return paths


def add_holes(crowns: pa.Table, frac: int = 3) -> pa.Table:
    """Deterministic holed variant of a crowns table: every crown whose
    crc32(crown_id) % ``frac`` == 0 gets one square interior ring
    centered at its centroid, sized to half the centroid's exact
    distance to the exterior boundary (strictly inside for the synth
    star polygons, which are star-shaped about the centroid). The
    ``holes`` column matches the geo readers' list<list<struct{x,y}>>
    layout; ``area`` becomes net-of-holes. Drives the hole-aware
    pipeline queries (synth_holed_assign / synth_holed_chips)."""
    import zlib

    from ..functions import geom
    from ..stages.spatial import rings_from_arrow

    ring_t = pa.list_(pa.struct([("x", pa.float64()), ("y", pa.float64())]))
    holes_t = pa.list_(ring_t)
    rings = rings_from_arrow(crowns["ring"])
    cids = crowns["crown_id"].to_pylist()
    cx = crowns["cx"].to_numpy()
    cy = crowns["cy"].to_numpy()
    holes_rows: list = []
    areas: list[float] = []
    for i, (cid, ring) in enumerate(zip(cids, rings)):
        want = zlib.crc32(cid.encode()) % frac == 0
        hole = None
        if want:
            # exact min distance centroid -> boundary (point-segment)
            x1, y1 = ring[:, 0], ring[:, 1]
            x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
            dx, dy = x2 - x1, y2 - y1
            L2 = dx * dx + dy * dy
            t = np.clip(((cx[i] - x1) * dx + (cy[i] - y1) * dy)
                        / np.where(L2 == 0, 1.0, L2), 0.0, 1.0)
            px, py = x1 + t * dx, y1 + t * dy
            dmin = float(np.sqrt(((px - cx[i]) ** 2
                                  + (py - cy[i]) ** 2).min()))
            h = 0.5 * dmin / np.sqrt(2.0)  # half-width; diag = dmin/2
            if h > 1e-3:
                hole = np.array([
                    [cx[i] - h, cy[i] - h], [cx[i] + h, cy[i] - h],
                    [cx[i] + h, cy[i] + h], [cx[i] - h, cy[i] + h],
                ])
        if hole is not None:
            holes_rows.append([[{"x": float(x), "y": float(y)}
                                for x, y in hole]])
            areas.append(geom.polygon_area_with_holes(ring, [hole]))
        else:
            holes_rows.append([])
            areas.append(geom.ring_area(ring))
    out = crowns.append_column("holes", pa.array(holes_rows, holes_t))
    if "area" in out.column_names:
        i = out.schema.get_field_index("area")
        out = out.set_column(i, "area", pa.array(areas, pa.float64()))
    return out
