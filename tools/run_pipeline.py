"""CLI entry point for `ray job submit` style runs.

    python tools/run_pipeline.py assign  --data DIR --out DIR
    python tools/run_pipeline.py chips   --data DIR --out DIR [--resume]
    python tools/run_pipeline.py health  --data DIR --out DIR
    python tools/run_pipeline.py synth   --out DIR [--stems N --extent M]
    python tools/run_pipeline.py compact --out DIR [--target-bytes N]

`--data` is a directory holding the engine tables (stems/ crowns/
tiles/ images/ lidar/ parquet dirs, e.g. from the `synth` command).
Outputs are resumable partitioned parquet with per-partition lineage
manifests; rerunning with `--resume` (chips) skips completed
partitions. On a cluster:  ray job submit -- python tools/run_pipeline.py …
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("command", choices=["assign", "chips", "health", "synth", "compact"])
    ap.add_argument("--data", default="/tmp/geotreehealth_data")
    ap.add_argument("--out", required=True)
    ap.add_argument("--stems", type=int, default=10_000)
    ap.add_argument("--extent", type=float, default=800.0)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--resume", action="store_true",
                    help="(chips) informational — resume is automatic via the manifest")
    ap.add_argument("--target-bytes", type=int, default=128 << 20,
                    help="(compact) bin-pack adjacent partitions to this file size")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR", **kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from geotreehealth_ray.sources import synth as synth_mod

    if args.command == "compact":
        from geotreehealth_ray.state import checkpoint as cp

        print(json.dumps(cp.compact_partitions(args.out, args.target_bytes)))
        ray.shutdown()
        return

    if args.command == "synth":
        cfg = synth_mod.SynthConfig(n_stems=args.stems, extent_m=args.extent)
        paths = synth_mod.write_all(cfg, args.out)
        print(json.dumps({"written": paths, "n_stems": args.stems}))
        ray.shutdown()
        return

    stems = rd.read_parquet(f"{args.data}/stems")
    crowns = rd.read_parquet(f"{args.data}/crowns")

    if args.command == "assign":
        from geotreehealth_ray.pipelines.assign import assign_stems_to_crowns
        from geotreehealth_ray.state import checkpoint as cp
        import pyarrow as pa

        assignment, unassigned = assign_stems_to_crowns(stems, crowns)

        def add_pid(t: pa.Table) -> pa.Table:
            import numpy as np
            import zlib

            pid = np.array(
                [zlib.crc32(v.encode()) % 64 for v in t["crown_id"].to_pylist()],
                dtype=np.int64,
            )
            return t.append_column("partition_id", pa.array(pid))

        rows = cp.write_partitioned(
            assignment.map_batches(add_pid, batch_format="pyarrow"),
            args.out, stage="assign",
        )
        print(json.dumps({"partitions": len(rows),
                          "rows": int(sum(r["rows"] for r in rows))}))
    elif args.command == "chips":
        from geotreehealth_ray.pipelines.chips import (
            GridSpec, extract_chips_checkpointed,
        )

        # grid params recovered from the synth config defaults; a real
        # deployment stores them beside the tiles table
        cfg = synth_mod.SynthConfig(n_stems=args.stems, extent_m=args.extent)
        images = rd.read_parquet(f"{args.data}/images")
        rows = extract_chips_checkpointed(
            crowns, f"{args.data}/tiles", images,
            GridSpec.from_synth(cfg), args.out,
        )
        print(json.dumps({"partitions_written": len(rows),
                          "rows": int(sum(r["rows"] for r in rows))}))
    elif args.command == "health":
        from geotreehealth_ray.pipelines.chips import GridSpec
        from geotreehealth_ray.pipelines.flagship import health_dataset_pipeline

        cfg = synth_mod.SynthConfig(n_stems=args.stems, extent_m=args.extent)
        images = rd.read_parquet(f"{args.data}/images")
        ds, metrics = health_dataset_pipeline(
            crowns, f"{args.data}/tiles", images, GridSpec.from_synth(cfg)
        )
        ds.write_parquet(args.out)
        print(json.dumps(metrics))
    ray.shutdown()


if __name__ == "__main__":
    main()
