"""Headline benchmark (BASELINE.md protocol).

Measures the two BASELINE.json metrics on bench-scale synthetic tables
(generated in parallel with Ray, cached under /tmp keyed by config):

- crown-assignment join rows/sec (cell co-partitioned PIP + reduce)
- image tiles/sec (chip extraction: decode tile once, crop+mask+encode
  per crown)

plus per-query timings over $GRAFT_SF_DIR (default /root/testdata/sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": <total headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, ...}

--scaling: runs the same job in two fresh processes at RAY_GRAFT_CPUS=8
and 32 on identical input, reports throughput at both + scaling
efficiency (T_lo/T_hi)/(hi/lo), and asserts the outputs' value hashes
are identical (determinism gate).
"""

from __future__ import annotations

import hashlib
import numpy as np
import json
import os
import subprocess
import sys
import time

# default scale: large enough that compute+shuffle dominate fixed
# per-run costs (at 60k stems the sort barriers were most of the wall);
# the --scaling protocol uses 4x this (960k, BENCH/BASELINE.md)
BENCH_STEMS = int(os.environ.get("GRAFT_BENCH_STEMS", "240000"))
BENCH_EXTENT = float(os.environ.get("GRAFT_BENCH_EXTENT", "4000"))


def bench_config():
    from geotreehealth_ray.sources.synth import SynthConfig

    return SynthConfig(
        seed=42, n_stems=BENCH_STEMS, extent_m=BENCH_EXTENT,
        tile_m=25.6, overlap_m=3.2, lidar_per_crown=0, shard_rows=4000,
    )


def data_dir(cfg) -> str:
    key = hashlib.md5(
        f"{cfg.seed}:{cfg.n_stems}:{cfg.extent_m}:{cfg.tile_m}:{cfg.overlap_m}".encode()
    ).hexdigest()[:12]
    return f"/tmp/geotreehealth_bench/{key}"


def prepare_data(cfg) -> str:
    """Ray-parallel deterministic generation, cached. Every shard/tile
    is a pure function of (seed, id) → identical bytes at any
    parallelism."""
    import ray.data as rd

    out = data_dir(cfg)
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    from geotreehealth_ray.sources import synth

    n_shards = cfg.n_shards

    def gen_shard_tables(batch):
        import pyarrow as pa

        shard = int(batch["id"][0])
        return {"shard": [shard]}

    # stems + crowns shards
    for name, gen in (("stems", synth.gen_stems), ("crowns", synth.gen_crowns)):
        d = os.path.join(out, name)
        os.makedirs(d, exist_ok=True)

        def write_shard(batch, _gen=gen, _d=d):
            import pyarrow.parquet as pq

            for shard in batch["id"]:
                pq.write_table(_gen(cfg, int(shard)), f"{_d}/part-{int(shard):05d}.parquet")
            return {"id": batch["id"]}

        rd.range(n_shards).map_batches(
            write_shard, batch_size=1, batch_format="numpy"
        ).count()

    # tiles + images, generated tile-row-parallel
    grid = synth.tile_grid(cfg)
    tile_dir = os.path.join(out, "tiles")
    img_dir = os.path.join(out, "images")
    os.makedirs(tile_dir, exist_ok=True)
    os.makedirs(img_dir, exist_ok=True)
    chunks = [grid[i : i + 64] for i in range(0, len(grid), 64)]

    def write_tiles(batch):
        import pyarrow.parquet as pq

        ci = int(batch["id"][0])
        tiles, images = synth.gen_tiles_and_images(cfg, chunks[ci])
        pq.write_table(tiles, f"{tile_dir}/part-{ci:05d}.parquet")
        pq.write_table(images, f"{img_dir}/part-{ci:05d}.parquet")
        return {"id": batch["id"]}

    rd.range(len(chunks)).map_batches(
        write_tiles, batch_size=1, batch_format="numpy"
    ).count()
    with open(done, "w") as f:
        f.write("ok")
    return out


def _hash_int_col(ds, col: str) -> int:
    """Cheap order-insensitive content hash: sum of blake2b of values."""
    import pandas as pd

    total = 0
    for batch in ds.iter_batches(batch_size=65536, batch_format="pandas"):
        h = pd.util.hash_pandas_object(batch[col].astype(str), index=False)
        total = (total + int(h.to_numpy().astype(np.uint64).sum(dtype=np.uint64))) % (1 << 63)
    return total


def run_headline(cfg, num_cpus: int) -> dict:
    import ray.data as rd

    from geotreehealth_ray.pipelines.assign import assign_stems_to_crowns
    from geotreehealth_ray.pipelines.chips import GridSpec, extract_chips_storage

    base = prepare_data(cfg)
    stems = rd.read_parquet(f"{base}/stems")
    crowns = rd.read_parquet(f"{base}/crowns")
    # warm pass (untimed): OS page cache + Ray worker import/jit —
    # the BASELINE.md protocol measures steady-state compute+shuffle
    stems.count(); crowns.count()
    warm, _ = assign_stems_to_crowns(stems, crowns)
    warm.count()

    # best of 2 timed repetitions: steady-state capability, robust to
    # single-node I/O noise (both parallelism levels measured the same way)
    assign_sec = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        assignment, _unassigned = assign_stems_to_crowns(stems, crowns)
        assignment = assignment.materialize()
        n_assign = assignment.count()
        assign_sec = min(assign_sec, time.perf_counter() - t0)
    assign_hash = _hash_int_col(assignment, "crown_id")

    images = rd.read_parquet(f"{base}/images", columns=["image_id", "caption"])
    images.count()

    def chips_pipeline():
        return extract_chips_storage(
            crowns, f"{base}/tiles", images, GridSpec.from_synth(cfg),
            num_out_blocks=num_cpus * 8,
        ).map_batches(
            lambda t: t.drop_columns(["bytes", "mask"]), batch_format="pyarrow"
        )

    chips_pipeline().count()  # warm pass (untimed)
    chips_sec = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        chips_meta = chips_pipeline().materialize()
        n_chips = chips_meta.count()
        chips_sec = min(chips_sec, time.perf_counter() - t0)
    from ray.data.aggregate import Sum

    chips_hash = int(chips_meta.aggregate(Sum("pixel_checksum"))["sum(pixel_checksum)"]) % (1 << 63)

    return {
        "assign_rows": n_assign,
        "assign_sec": round(assign_sec, 3),
        "assign_rows_per_sec": round(n_assign / assign_sec, 1),
        "assign_hash": assign_hash,
        "chip_rows": n_chips,
        "chips_sec": round(chips_sec, 3),
        "chips_rows_per_sec": round(n_chips / chips_sec, 1),
        "chips_hash": chips_hash,
    }


def run_queries(sf_dir: str) -> dict:
    import __ray_entry__ as mod

    qs = mod.queries()
    # r5 rotation: picks prioritize the plans rewritten/added this
    # round (hole-aware NMS, independent-oracle composites, training
    # lineage stats, GLZ ingest, distributed chips pre-scan, slim
    # assign exchange) plus the remaining never-driver-sampled
    # complement of CORRECTNESS_r01..r04, plus a small stable core so
    # BENCH diffs stay comparable across rounds.
    picks = [
        # stable core (cross-round comparability)
        "pip_join", "crown_assign", "minhash_pairs", "ann_topk",
        "q5_region_volume",
        # plans rewritten/added in r5 — keep in the BENCH diff
        "synth_chips", "synth_training", "synth_nms",
        "synth_holed_nms", "synth_delineation", "synth_glz_ingest",
        "synth_resume",
        # never-driver-sampled rotation (complement of r1–r4)
        "funnel_vcp", "order_rank_fracs", "acctbal_equidepth",
        "doc_decontam", "qty_disc_corr", "supp_heavy_hitters",
        "order_grouping_sets", "order_first_last", "ship_overlap",
        "user_top_event", "price_p90", "part_pairs",
        "nation_rev_share", "lineitem_audit", "hll_parts_by_flag",
        "orders_diff", "user_event_attach", "user_event_attach_salted",
    ]
    out = {}
    for name in picks:
        t0 = time.perf_counter()
        res = qs[name](sf_dir)
        if hasattr(res, "count"):
            res.count()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main():
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    # This sandbox faults fresh pages in at ~10 MB/s, and glibc munmaps
    # large freed buffers, so every big numpy temp re-pays the fault
    # (measured 23 s to re-fill a 320 MB array; 44 ms with these set).
    # Raising the thresholds keeps freed buffers in the arena for
    # reuse. Set BEFORE ray.init so raylet-spawned workers inherit.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "2147483647")
    os.environ.setdefault("RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION", "0.5")  # headroom: at 42.9% the 15M-stem exchange queues deadlock the streaming scheduler
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "2147483647")

    if "--scaling" in sys.argv:
        results = {}
        for n in (8, 32):
            # scaling protocol uses a 16× dataset so parallel compute
            # dominates the fixed per-run costs (sort barriers, driver
            # coordination) — same input at both levels. These defaults
            # are the configuration recorded in BENCH/BASELINE.md.
            env = dict(os.environ, RAY_GRAFT_CPUS=str(n))
            env.setdefault("GRAFT_BENCH_STEMS", "960000")
            env.setdefault("GRAFT_BENCH_EXTENT", "8000")
            out = subprocess.run(
                [sys.executable, "bench.py"], env=env,
                capture_output=True, text=True, check=True,
            ).stdout
            results[n] = json.loads(out.strip().splitlines()[-1])
        lo, hi = results[8], results[32]
        det_ok = (
            lo["assign_hash"] == hi["assign_hash"]
            and lo["chips_hash"] == hi["chips_hash"]
            and lo["assign_rows"] == hi["assign_rows"]
            and lo["chip_rows"] == hi["chip_rows"]
        )
        def eff(key):
            return round((lo[key] / hi[key]) / (32 / 8), 3)
        summary = {
            "metric": "scaling_efficiency",
            "assign_sec_8": lo["assign_sec"], "assign_sec_32": hi["assign_sec"],
            "assign_rows_per_sec_8": lo["assign_rows_per_sec"],
            "assign_rows_per_sec_32": hi["assign_rows_per_sec"],
            "assign_scaling_efficiency": eff("assign_sec"),
            "chips_sec_8": lo["chips_sec"], "chips_sec_32": hi["chips_sec"],
            "chips_rows_per_sec_8": lo["chips_rows_per_sec"],
            "chips_rows_per_sec_32": hi["chips_rows_per_sec"],
            "chips_scaling_efficiency": eff("chips_sec"),
            "deterministic_outputs": det_ok,
        }
        print(json.dumps(summary))
        return

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    cfg = bench_config()
    headline = run_headline(cfg, num_cpus)
    queries = run_queries(sf_dir)
    total = headline["assign_sec"] + headline["chips_sec"]
    print(json.dumps({
        "metric": "crown_assign_join+chip_extraction_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        **headline,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
