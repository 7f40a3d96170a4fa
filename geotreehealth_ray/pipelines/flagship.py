"""End-to-end pipeline compositions mirroring the reference's entry
points (SURVEY.md §3), wired from this engine's stages.

1. ``delineation_pipeline`` — reference
   tree_delineation/delineation_pipeline.py:61-185 (build_data_schema):
   detector boxes → stem filter → prompts → SAM-slot scoring →
   mask→polygon → simplify → NMS → per-stem attribute join. The SAM
   forward is the stub slot (stages/scorers.py); every surrounding
   stage is real.
2. ``health_dataset_pipeline`` — reference
   tree_health_detection/main.py:64-194: crown filters → chip
   extraction → label build → rebalance → stratified split.
3. ``alignment_pipeline`` — reference field_data_alignment/utils.py:
   12-119: match control points → fit offsets → apply to all stems.

Each returns its principal Dataset plus a per-stage row-count metrics
dict (the lineage the north rule requires alongside the partition
manifests in state/checkpoint.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import cells

__all__ = ["delineation_pipeline", "health_dataset_pipeline",
           "alignment_pipeline"]


def delineation_pipeline(stems, crowns, cfg=None, res: int = cells.DEFAULT_RES,
                         boxes=None):
    """Stem-prompted crown delineation, NMS'd and attribute-joined.

    In the reference the crowns come out of SAM masks; in-sandbox the
    SAM slot is a stub, so the synthetic ``crowns`` table plays the
    mask→polygon output and the pipeline exercises the full surrounding
    graph: filter → kNN prompts → NMS (selected flag) → crown↔stem
    attribute join (broadcast-free).

    ``boxes`` (stem_id, minx, miny, maxx, maxy — e.g. the BoxDetector
    slot's output through stages.spatial.boxes_to_world) feeds the
    ``cfg.mode ∈ {bbox, bbox_and_centers}`` prompt variants
    (reference get_polygons.py:170-299); point modes ignore it."""
    import pyarrow.compute as pc

    from .crown_ops import filter_stems
    from .knn import knn_points
    from .nms import greedy_nms
    from .prompts import PipelineConfig, build_prompts
    from .relational import hash_join

    cfg = cfg or PipelineConfig()
    metrics: dict[str, int] = {}

    stems_f = filter_stems(stems, min_crwnpst=2)
    if cfg.mode in ("bbox", "bbox_and_centers"):
        prompts = build_prompts(stems_f, None, cfg, boxes=boxes)
    else:
        prompts = build_prompts(
            stems_f.select_columns(["stem_id", "x", "y"]),
            knn_points(stems_f, k=cfg.neighbors + cfg.first_neigh, res=res),
            cfg,
        )
    # Per-stage row-count metrics (the north rule's lineage contract)
    # ride ONE execution each: a Dataset is lazy and does NOT cache,
    # so `.count()` on an unmaterialized stage executes its whole
    # subtree and the downstream consumer executes it AGAIN — this
    # pipeline used to run the prompt/NMS subtrees up to 4× (measured
    # 25.8 s vs 7.5 s of unique work on the synth input). The staged
    # outputs here are slim (ids + scalars, no geometry/bytes), so
    # materializing them is bounded at any scale and every count is a
    # free metadata read.
    prompts = prompts.materialize()
    metrics["prompts"] = prompts.count()

    selected = greedy_nms(crowns, threshold=0.3, res=res)
    crowns_slim = crowns.select_columns(["crown_id", "stem_id", "score", "area"])
    crowns_sel = hash_join(crowns_slim, selected, on="crown_id").materialize()
    metrics["crowns_selected"] = crowns_sel.count()

    # left-join stem attrs onto surviving crowns (delineation_pipeline
    # .py:159-160) — co-partitioned, large-large safe
    stems_attrs = stems.select_columns(
        ["stem_id", "status", "crwnpst", "dbh", "site_id", "species"]
    )
    out = hash_join(
        crowns_sel.map_batches(
            lambda t: t.filter(pc.is_valid(t["stem_id"])),
            batch_format="pyarrow",
        ),
        stems_attrs,
        on="stem_id",
    ).materialize()
    metrics["crowns_with_attrs"] = out.count()
    return out, metrics


def health_dataset_pipeline(crowns, tiles_path: str, images, grid,
                            min_area: float = 8.0):
    """Chip dataset build: area/selected filters → chip extraction →
    label rows → deterministic stratified split (main.py:97-194)."""
    import pyarrow.compute as pc

    from .chips import extract_chips_storage
    from .split import stratified_split

    metrics: dict[str, int] = {}
    big = crowns.map_batches(
        lambda t: t.filter(pc.greater(t["area"], min_area)),
        batch_format="pyarrow",
    )
    chips = extract_chips_storage(big, tiles_path, images, grid)
    labels = chips.map_batches(
        lambda t: t.drop_columns(["bytes", "mask"]), batch_format="pyarrow"
    )
    # label rows carry the caption (site/species/status proxy); split
    # stratified on tile_id prefix as the site analogue
    def add_site(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["site"] = df["tile_id"].str.slice(0, 6)
        return df

    labeled = labels.map_batches(add_site, batch_format="pandas")
    # md5-hex rank key (not the default blake2b): same determinism
    # contract, but reconstructible by a SQL oracle (split.py docstring;
    # same choice as the doc_split driver query)
    from .crown_ops import md5_hex_hash

    split_ds = stratified_split(labeled, "crown_id", ["site"],
                                hash_fn=md5_hex_hash)
    # slim rows (bytes/mask dropped above): materialize so the metric
    # count and the caller's consumption share one execution (a lazy
    # count would re-run the whole chip extraction — see
    # delineation_pipeline)
    split_ds = split_ds.materialize()
    metrics["chips"] = split_ds.count()
    return split_ds, metrics


def alignment_pipeline(field_stems, ref_stems):
    """Field→reference coordinate alignment (field_data_alignment).

    Size contract: the control-point MATCH collects both tables'
    (stem_id, x, y) projections to the driver — correct for the
    reference's semantics, where field-campaign stem tables are
    hand-collected (thousands of rows, reference
    field_data_alignment/utils.py loads both CSVs in memory too). The
    APPLY side streams distributed at any size. For a hypothetical
    huge control survey, subsample the control points upstream
    (e.g. remove_perc-style hash sampling) before calling this — the
    fit needs thousands of matches, not millions."""
    from .alignment import apply_alignment, fit_offset_model, match_control_points

    field_df = field_stems.select_columns(["stem_id", "x", "y"]).to_pandas()
    ref_df = ref_stems.select_columns(["stem_id", "x", "y"]).to_pandas()
    matched = match_control_points(
        field_df.drop_duplicates("stem_id"), ref_df.drop_duplicates("stem_id")
    )
    coef = fit_offset_model(matched)
    out = apply_alignment(field_stems, coef)
    return out, {"matched_points": len(matched)}
