"""Assign-only N-vs-4N scaling measurement at a larger stem count.

Why this exists: the BASELINE.json criterion (scaling efficiency >= 0.8
between N and 4N) is defined at 10^12-row scale, where per-node compute
dominates fixed costs. After the assign kernels were vectorized, the
960k-stem input of `bench.py --scaling` finishes in ~16 s at 32 CPUs —
mostly sort barriers and driver coordination, i.e. the regime the rule
explicitly does NOT measure. This tool reruns ONLY the assign phase at
4x the input (3.84M stems / 16 km extent — same density, so identical
per-cell skew profile), with the same protocol as bench.py: fresh
process per parallelism level, untimed warm pass, best of 2 timed reps,
order-insensitive output-hash equality across levels.

Usage:  python tools/scaling_assign.py            # parent: runs 8 then 32
        GRAFT_BENCH_STEMS=... python tools/scaling_assign.py --child 8
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
EXTENT = float(os.environ.get("GRAFT_BENCH_EXTENT", "16000"))


def _cfg():
    from geotreehealth_ray.sources.synth import SynthConfig

    return SynthConfig(
        seed=42, n_stems=STEMS, extent_m=EXTENT,
        tile_m=25.6, overlap_m=3.2, lidar_per_crown=0, shard_rows=4000,
    )


def _prep(cfg) -> str:
    """stems+crowns only (no tiles/images — assign doesn't read them);
    cached under a key distinct from bench.py's full prep."""
    import ray.data as rd

    key = hashlib.md5(
        f"assign:{cfg.seed}:{cfg.n_stems}:{cfg.extent_m}".encode()
    ).hexdigest()[:12]
    out = f"/tmp/geotreehealth_bench/{key}"
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    from geotreehealth_ray.sources import synth

    for name, gen in (("stems", synth.gen_stems), ("crowns", synth.gen_crowns)):
        d = os.path.join(out, name)
        os.makedirs(d, exist_ok=True)

        def write_shard(batch, _gen=gen, _d=d):
            import pyarrow.parquet as pq

            for shard in batch["id"]:
                pq.write_table(
                    _gen(cfg, int(shard)), f"{_d}/part-{int(shard):05d}.parquet"
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

    # Explicit object store: the owner-mode union at 15.36M stems holds
    # ~62M rows (~15 GB with packed rings) across the Repartition+Sort
    # barriers; Ray's default 30%-of-RAM store plus the reservation
    # backpressure policy throttled the upstream maps to one task at a
    # time (measured: 8-CPU run stalled >20 min at 94% driver CPU). On a
    # real cluster the store scales with nodes; single-node evidence
    # needs the same headroom.
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             object_store_memory=64 * 1024**3)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from bench import _hash_int_col
    from geotreehealth_ray.pipelines.assign import assign_stems_to_crowns

    base = _prep(_cfg())
    stems = rd.read_parquet(f"{base}/stems")
    crowns = rd.read_parquet(f"{base}/crowns")
    stems.count(); crowns.count()
    warm, _ = assign_stems_to_crowns(stems, crowns)
    warm.count()

    assign_sec = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        assignment, _un = assign_stems_to_crowns(stems, crowns)
        assignment = assignment.materialize()
        n = assignment.count()
        assign_sec = min(assign_sec, time.perf_counter() - t0)
    h = _hash_int_col(assignment, "crown_id")
    print(json.dumps({
        "num_cpus": num_cpus, "stems": STEMS,
        "assign_rows": n, "assign_sec": round(assign_sec, 3),
        "assign_rows_per_sec": round(n / assign_sec, 1),
        "assign_hash": h,
    }))
    ray.shutdown()


def main() -> None:
    if "--child" in sys.argv:
        child(int(sys.argv[sys.argv.index("--child") + 1]))
        return
    res = {}
    for n in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(n)],
            capture_output=True, text=True, check=True,
            env=dict(os.environ),
        ).stdout
        res[n] = json.loads(out.strip().splitlines()[-1])
    lo, hi = res[8], res[32]
    print(json.dumps({
        "metric": "assign_scaling_efficiency_large",
        "stems": STEMS,
        "assign_sec_8": lo["assign_sec"], "assign_sec_32": hi["assign_sec"],
        "assign_rows_per_sec_8": lo["assign_rows_per_sec"],
        "assign_rows_per_sec_32": hi["assign_rows_per_sec"],
        "assign_scaling_efficiency": round(
            (lo["assign_sec"] / hi["assign_sec"]) / 4.0, 3
        ),
        "deterministic_outputs": lo["assign_hash"] == hi["assign_hash"]
        and lo["assign_rows"] == hi["assign_rows"],
    }))


if __name__ == "__main__":
    main()
