"""SAM prompt-assembly strategies + typed pipeline configuration
(the reference's user-extension surface, SURVEY.md §2.10).

Reference: per-stem prompt building with ``point_type ∈ {distance,
random, grid, cardinal}`` (reference config.py:32,
tree_delineation/get_polygons.py:326-367; cardinal variant
batch_sam.py:425-455) and ``mode ∈ {only_points, bbox,
bbox_and_centers}`` (config.py:31, get_polygons.py:170,226,299).

Each strategy turns a stem + its neighbor rows (from the kNN
pipelines) into one prompt row: the positive point plus negative
points. 'random' uses a stable hash of the stem id — not RNG state —
so prompts are identical at any parallelism (SURVEY.md §7.4).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

__all__ = ["PipelineConfig", "build_prompts", "PROMPT_STRATEGIES"]


@dataclass(frozen=True)
class PipelineConfig:
    """Typed replacement for the reference's config.py module of
    globals (reference config.py:1-82)."""

    point_type: str = "distance"        # distance | random | grid | cardinal
    mode: str = "only_points"           # only_points | bbox | bbox_and_centers
    neighbors: int = 5                  # config.py:49
    first_neigh: int = 1
    remove_too_close: float = 3.0       # config.py:34
    sam_min_area: float = 200.0         # config.py:47
    sam_max_area: float = 40_000.0      # config.py:48
    tile_m: float = 25.6
    overlap_m: float = 3.2
    cell_res: int = 13
    grid_step_m: float = 5.0
    detelineation: str = "SAM"          # config.py:40
    ttops: str | None = "deepforest"    # config.py:35


def _stable_unit(key: str) -> float:
    h = hashlib.blake2b(key.encode(), digest_size=8).digest()
    return int.from_bytes(h, "little") / 2**64


def _neg_distance(row, nb: pd.DataFrame, cfg: PipelineConfig):
    nb = nb[nb["dist"] >= cfg.remove_too_close]
    nb = nb.sort_values(["dist", "neighbor_id"]).iloc[
        cfg.first_neigh : cfg.first_neigh + cfg.neighbors
    ]
    return list(zip(nb["nx"], nb["ny"]))


def _neg_random(row, nb: pd.DataFrame, cfg: PipelineConfig):
    nb = nb[nb["dist"] >= cfg.remove_too_close].sort_values(
        ["dist", "neighbor_id"]
    )
    if nb.empty:
        return []
    # stable hash pick instead of np.random.choice (get_polygons.py:330-332)
    picks = []
    for k in range(min(cfg.neighbors, len(nb))):
        i = int(_stable_unit(f"{row.id}:{k}") * len(nb))
        picks.append((nb.iloc[i]["nx"], nb.iloc[i]["ny"]))
    return picks


def _neg_grid(row, nb: pd.DataFrame, cfg: PipelineConfig):
    # regular grid of negatives around the stem (get_polygons.py:333-364)
    s = cfg.grid_step_m
    out = []
    for dx in (-s, 0, s):
        for dy in (-s, 0, s):
            if dx == 0 and dy == 0:
                continue
            out.append((row.x + dx, row.y + dy))
    return out[: cfg.neighbors * 2]


def _neg_cardinal(row, nb: pd.DataFrame, cfg: PipelineConfig):
    # one negative per NE/NW/SE/SW quadrant (batch_sam.py:425-452);
    # expects nb to carry a 'quad' column from knn_cardinal
    nb = nb[nb["dist"] >= cfg.remove_too_close]
    out = []
    for quad in ("NE", "NW", "SE", "SW"):
        q = nb[nb["quad"] == quad] if "quad" in nb.columns else nb.head(0)
        if not q.empty:
            r = q.sort_values(["dist", "neighbor_id"]).iloc[0]
            out.append((r["nx"], r["ny"]))
    return out


PROMPT_STRATEGIES = {
    "distance": _neg_distance,
    "random": _neg_random,
    "grid": _neg_grid,
    "cardinal": _neg_cardinal,
}


_NO_BOX = (np.nan, np.nan, np.nan, np.nan)


def _box_prompts(boxes, with_centers: bool):
    """One prompt row per treetop box (reference get_polygons.py:170-299).

    mode='bbox': the box alone prompts the mask (predict_torch with
    boxes only, get_polygons.py:171-198) — no points.
    mode='bbox_and_centers': the box plus 5 points — 4 corners labeled
    negative and the box center labeled positive, in the reference's
    order (xmin,ymin), (xmax,ymax), (xmax,ymin), (xmin,ymax), center
    (get_polygons.py:240-262).
    Embarrassingly parallel: a single map_batches, no shuffle.
    """

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        minx = df["minx"].to_numpy(np.float64)
        miny = df["miny"].to_numpy(np.float64)
        maxx = df["maxx"].to_numpy(np.float64)
        maxy = df["maxy"].to_numpy(np.float64)
        cx = (minx + maxx) / 2
        cy = (miny + maxy) / 2
        n = len(df)
        if with_centers:
            neg_xs = [[minx[i], maxx[i], maxx[i], minx[i]] for i in range(n)]
            neg_ys = [[miny[i], maxy[i], miny[i], maxy[i]] for i in range(n)]
            pos_x, pos_y = cx, cy
        else:
            neg_xs = [[] for _ in range(n)]
            neg_ys = [[] for _ in range(n)]
            pos_x = np.full(n, np.nan)
            pos_y = np.full(n, np.nan)
        return pd.DataFrame(
            {
                "stem_id": df["stem_id"],
                "pos_x": pos_x,
                "pos_y": pos_y,
                "neg_xs": neg_xs,
                "neg_ys": neg_ys,
                "box_minx": minx,
                "box_miny": miny,
                "box_maxx": maxx,
                "box_maxy": maxy,
                "has_box": np.ones(n, dtype=bool),
            }
        )

    return boxes.map_batches(per_batch, batch_format="pandas")


def build_prompts(stems, neighbors, cfg: PipelineConfig, boxes=None):
    """stems: (stem_id, x, y); neighbors: kNN output (id, neighbor_id,
    dist[, quad]) from pipelines.knn; boxes (bbox modes): treetop boxes
    (stem_id, minx, miny, maxx, maxy) from the DeepForest slot. Returns
    one prompt row per stem/box: (stem_id, pos_x, pos_y, neg_xs: list,
    neg_ys: list, box_minx..box_maxy, has_box) — the box columns are
    NaN/False for point-only prompts so every mode shares one schema.

    Physical plan: point modes co-partition stems and neighbor rows on
    a hash bucket of the stem id (bucketed_reduce), join neighbor
    coordinates in-bucket, apply the configured strategy vectorised per
    bucket; bbox modes are a single map_batches over the boxes.
    """
    import pyarrow as pa

    from .relational import bucketed_reduce

    if cfg.mode in ("bbox", "bbox_and_centers"):
        if boxes is None:
            raise ValueError(f"mode={cfg.mode!r} requires a boxes dataset")
        return _box_prompts(boxes, with_centers=cfg.mode == "bbox_and_centers")
    if cfg.mode != "only_points":
        raise ValueError(
            f"unknown mode {cfg.mode!r}: expected only_points, bbox, "
            "or bbox_and_centers"
        )
    if cfg.point_type not in PROMPT_STRATEGIES:
        raise ValueError(
            f"unknown point_type {cfg.point_type!r}: expected one of "
            f"{sorted(PROMPT_STRATEGIES)}"
        )

    strategy = PROMPT_STRATEGIES[cfg.point_type]

    # neighbor rows need the neighbor's coordinates: join driver-free by
    # sending stems twice (as targets and as coordinate source)
    def coord_rows(df: pd.DataFrame) -> pd.DataFrame:
        # keyed by the NEIGHBOR id so the coordinates co-locate with
        # every edge that references them
        return pd.DataFrame(
            {"key": df["stem_id"], "kind": 1, "id": df["stem_id"],
             "x": df["x"], "y": df["y"], "neighbor_id": "",
             "dist": np.nan, "quad": ""}
        )

    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": df["neighbor_id"], "kind": 2, "id": df["id"],
             "x": np.nan, "y": np.nan, "neighbor_id": df["neighbor_id"],
             "dist": df["dist"],
             "quad": df["quad"] if "quad" in df.columns else ""}
        )

    s1 = stems.map_batches(coord_rows, batch_format="pandas")
    e = neighbors.map_batches(edge_rows, batch_format="pandas")

    # phase 1: attach neighbor coords to edges (bucket by neighbor id)
    def attach(df: pd.DataFrame) -> pd.DataFrame:
        coords = df[df["kind"] == 1][["id", "x", "y"]].rename(
            columns={"id": "neighbor_id", "x": "nx", "y": "ny"}
        )
        edges = df[df["kind"] == 2][["id", "neighbor_id", "dist", "quad"]]
        return edges.merge(coords, on="neighbor_id", how="inner")

    edges_xy = bucketed_reduce(s1.union(e), "key", attach)

    # phase 2: group edges by target stem, apply strategy
    _COLS = ["key", "kind", "id", "x", "y", "neighbor_id", "dist",
             "quad", "nx", "ny"]

    def edges_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["key"] = df["id"]
        df["kind"] = 2
        df["x"] = np.nan
        df["y"] = np.nan
        return df.reindex(columns=_COLS)

    def stems_key(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": df["stem_id"], "kind": 0, "id": df["stem_id"],
             "x": df["x"], "y": df["y"], "neighbor_id": "",
             "dist": np.nan, "quad": "", "nx": np.nan, "ny": np.nan}
        ).reindex(columns=_COLS)

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        targets = df[df["kind"] == 0]
        edges = df[df["kind"] == 2]
        by_id = dict(tuple(edges.groupby("id", sort=False))) if len(edges) else {}
        out = {"stem_id": [], "pos_x": [], "pos_y": [], "neg_xs": [], "neg_ys": []}
        for row in targets.itertuples():
            nb = by_id.get(row.id, edges.head(0))
            negs = strategy(row, nb, cfg)
            out["stem_id"].append(row.id)
            out["pos_x"].append(row.x)
            out["pos_y"].append(row.y)
            out["neg_xs"].append([float(a) for a, _ in negs])
            out["neg_ys"].append([float(b) for _, b in negs])
        df_out = pd.DataFrame(out)
        for col, val in zip(
            ("box_minx", "box_miny", "box_maxx", "box_maxy"), _NO_BOX
        ):
            df_out[col] = val
        df_out["has_box"] = False
        return df_out

    union = stems.map_batches(stems_key, batch_format="pandas").union(
        edges_xy.map_batches(edges_key, batch_format="pandas")
    )
    return bucketed_reduce(union, "key", assemble)
