"""Chips-only N-vs-4N scaling measurement at higher crown density.

Same rationale as tools/scaling_assign.py: the BASELINE.json scaling
criterion is defined at 10^12-row scale where per-node compute
dominates fixed exchange costs; after the windowed-qdct rewrite the
960k-stem chips job got ~1.4× faster and its 8-vs-32 ratio dipped
below 0.8 on an already-short job. This tool keeps the SAME 8 km tile
grid (reusing bench.py's cached tiles — the raster side of the job is
unchanged) and quadruples crown density (3.84M stems / 8 km), i.e. the
"dense forest tiles" regime the north rule names: 4× chips per tile
decode and per exchange round.

Protocol identical to bench.py --scaling: fresh process per
parallelism level, untimed warm pass, best of 2 timed reps,
order-insensitive output-hash equality across levels.

Usage:  python tools/scaling_chips.py            # parent: runs 8 then 32
"""
from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEMS = int(os.environ.get("GRAFT_BENCH_STEMS", "3840000"))
EXTENT = float(os.environ.get("GRAFT_BENCH_EXTENT", "8000"))


def _cfg(n_stems: int):
    from geotreehealth_ray.sources.synth import SynthConfig

    return SynthConfig(
        seed=42, n_stems=n_stems, extent_m=EXTENT,
        tile_m=25.6, overlap_m=3.2, lidar_per_crown=0, shard_rows=4000,
    )


def _prep_crowns(cfg) -> str:
    """stems+crowns only at the dense count (tiles/images come from the
    bench.py cache for the SAME extent — the tile grid is a function of
    (seed, extent, tile_m) alone, not stem count)."""
    import ray.data as rd

    key = hashlib.md5(
        f"crowns:{cfg.seed}:{cfg.n_stems}:{cfg.extent_m}".encode()
    ).hexdigest()[:12]
    out = f"/tmp/geotreehealth_bench/{key}"
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    from geotreehealth_ray.sources import synth

    d = os.path.join(out, "crowns")
    os.makedirs(d, exist_ok=True)

    def write_shard(batch):
        import pyarrow.parquet as pq

        for shard in batch["id"]:
            pq.write_table(
                synth.gen_crowns(cfg, int(shard)),
                f"{d}/part-{int(shard):05d}.parquet",
            )
        return {"id": batch["id"]}

    rd.range(cfg.n_shards).map_batches(
        write_shard, batch_size=1, batch_format="numpy"
    ).count()
    with open(done, "w") as f:
        f.write("ok")
    return out


def child(num_cpus: int) -> None:
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "2147483647")
    os.environ.setdefault("RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION", "0.5")  # headroom: at 42.9% the 15M-stem exchange queues deadlock the streaming scheduler
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "2147483647")
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import bench as B
    from geotreehealth_ray.pipelines.chips import (
        GridSpec,
        extract_chips_storage,
    )

    # raster side: bench.py's cached tile/image dirs for this extent
    base_tiles = B.data_dir(_bench_tile_cfg())
    if not os.path.exists(os.path.join(base_tiles, "_DONE")):
        B.prepare_data(_bench_tile_cfg())
    crowns_base = _prep_crowns(_cfg(STEMS))

    crowns = rd.read_parquet(f"{crowns_base}/crowns")
    images = rd.read_parquet(f"{base_tiles}/images",
                             columns=["image_id", "caption"])
    crowns.count(); images.count()
    grid = GridSpec.from_synth(_cfg(STEMS))

    def pipe():
        return extract_chips_storage(
            crowns, f"{base_tiles}/tiles", images, grid,
            num_out_blocks=num_cpus * 8,
        ).map_batches(
            lambda t: t.drop_columns(["bytes", "mask"]),
            batch_format="pyarrow",
        )

    pipe().count()  # warm
    chips_sec = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        m = pipe().materialize()
        n = m.count()
        chips_sec = min(chips_sec, time.perf_counter() - t0)
    from ray.data.aggregate import Sum

    h = int(m.aggregate(Sum("pixel_checksum"))["sum(pixel_checksum)"]) % (1 << 63)
    print(json.dumps({
        "num_cpus": num_cpus, "stems": STEMS,
        "chip_rows": n, "chips_sec": round(chips_sec, 3),
        "chips_rows_per_sec": round(n / chips_sec, 1),
        "chips_hash": h,
    }))
    ray.shutdown()


def _bench_tile_cfg():
    """The bench.py config whose cached tiles/images this run reuses
    (960k stems — stem count is irrelevant to the raster tables)."""
    from geotreehealth_ray.sources.synth import SynthConfig

    return SynthConfig(
        seed=42, n_stems=960000, extent_m=EXTENT,
        tile_m=25.6, overlap_m=3.2, lidar_per_crown=0, shard_rows=4000,
    )


def main():
    if "--child" in sys.argv:
        child(int(sys.argv[sys.argv.index("--child") + 1]))
        return
    results = {}
    for n in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(n)],
            capture_output=True, text=True, check=True,
        ).stdout
        results[n] = json.loads(out.strip().splitlines()[-1])
        print(json.dumps(results[n]))
    lo, hi = results[8], results[32]
    print(json.dumps({
        "metric": "chips_scaling_efficiency_dense",
        "stems": STEMS,
        "chips_sec_8": lo["chips_sec"], "chips_sec_32": hi["chips_sec"],
        "chips_rows_per_sec_8": lo["chips_rows_per_sec"],
        "chips_rows_per_sec_32": hi["chips_rows_per_sec"],
        "chips_scaling_efficiency": round(
            (lo["chips_sec"] / hi["chips_sec"]) / 4.0, 3
        ),
        "deterministic_outputs": (
            lo["chips_hash"] == hi["chips_hash"]
            and lo["chip_rows"] == hi["chip_rows"]
        ),
    }))


if __name__ == "__main__":
    main()
