"""Resumable partitioned output with per-partition lineage + metrics
(north_rule: "resumable from per-partition checkpoints with lineage and
row-count metrics per stage").

Layout:
    out_dir/
      part=<pid>/part-<pid>.parquet     # one atomic file per partition
      _manifest/<pid>.json              # written AFTER the data rename:
                                        #   {partition, rows, bytes,
                                        #    stage, wall_sec, input_tag}
      _manifest/_stage.json             # stage-level rollup

A partition is "done" iff its manifest entry exists; the data file is
written to a temp name and os.replace()d first, so a crash can never
leave a manifest without data. ``resume_filter`` drops rows of already
completed partitions before any work happens (when the upstream source
is partitioned on the same key the filter prunes whole files).

The partition id is any small-cardinality column — the engine uses a
coarse prefix of the Morton cell key (``partition_of_cells``), so one
partition ≈ one contiguous spatial region ≈ one output fragment.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa

__all__ = ["partition_of_cells", "write_partitioned", "completed_partitions",
           "resume_filter", "stage_metrics", "compact_partitions",
           "output_files"]


def partition_of_cells(cell: np.ndarray, bits: int = 8,
                       curve: str = "morton") -> np.ndarray:
    """Coarse partition id: top ``bits`` of the key's space-filling-
    curve code (which occupies the low 2*res bits), so each partition
    is a spatially contiguous block of cells.

    curve: 'morton' (default — prefix of the Morton cell key itself,
    zero extra work) or 'hilbert' (re-encode the cell's grid coords on
    the Hilbert curve first — S2's ordering: every partition becomes
    ONE compact blob instead of Z-order's up-to-two disjoint
    rectangles, which halves a resumed run's worst-case halo re-reads
    at partition edges)."""
    cell = np.asarray(cell, dtype=np.uint64)
    res = (cell >> np.uint64(60)).astype(np.uint64)
    if curve == "hilbert":
        from ..functions import cells as _cells

        r, gx, gy = _cells.cell_decode(cell)
        if len(r) and not (r == r[0]).all():
            raise ValueError("hilbert partitioning requires uniform res")
        code = _cells.hilbert_xy2d(gx, gy, int(r[0]) if len(r) else 0)
    elif curve == "morton":
        code = cell & np.uint64((1 << 60) - 1)
    else:
        raise ValueError(f"unknown curve {curve!r}")
    shift = np.maximum(np.uint64(0), (np.uint64(2) * res).astype(np.int64) - bits).astype(np.uint64)
    return (code >> shift).astype(np.int64)


def completed_partitions(out_dir: str) -> set[int]:
    mdir = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(mdir):
        return set()
    out = set()
    for f in os.listdir(mdir):
        if f.endswith(".json") and not f.startswith("_"):
            out.add(int(f[:-5]))
    return out


def resume_filter(ds, out_dir: str, partition_col: str = "partition_id"):
    """Drop rows of partitions that already have a manifest entry."""
    done = completed_partitions(out_dir)
    if not done:
        return ds
    done_arr = pa.array(sorted(done), pa.int64())

    def fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.invert(pc.is_in(t[partition_col], value_set=done_arr)))

    return ds.map_batches(fn, batch_format="pyarrow")


def write_partitioned(ds, out_dir: str, partition_col: str = "partition_id",
                      stage: str = "stage", input_tag: str = "") -> list[dict]:
    """Write one parquet file + manifest entry per partition; returns
    the manifest rows. Each partition is written by its own group task
    (parallel), atomically (tmp file → os.replace → manifest)."""
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)

    def write_group(t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        pid = int(t[partition_col][0].as_py())
        t0 = time.perf_counter()
        pdir = os.path.join(out_dir, f"part={pid}")
        os.makedirs(pdir, exist_ok=True)
        final = os.path.join(pdir, f"part-{pid}.parquet")
        tmp = final + ".tmp"
        pq.write_table(t, tmp)
        nbytes = os.path.getsize(tmp)
        os.replace(tmp, final)
        entry = {
            "partition": pid,
            "rows": len(t),
            "bytes": nbytes,
            "stage": stage,
            "wall_sec": round(time.perf_counter() - t0, 4),
            "input_tag": input_tag,
        }
        mtmp = os.path.join(out_dir, "_manifest", f"{pid}.json.tmp")
        with open(mtmp, "w") as f:
            json.dump(entry, f)
        os.replace(mtmp, os.path.join(out_dir, "_manifest", f"{pid}.json"))
        return pa.table(
            {
                "partition": pa.array([pid], pa.int64()),
                "rows": pa.array([len(t)], pa.int64()),
                "bytes": pa.array([nbytes], pa.int64()),
            }
        )

    manifest_ds = ds.groupby(partition_col).map_groups(
        write_group, batch_format="pyarrow"
    )
    rows = manifest_ds.to_pandas().to_dict("records")
    rollup = {
        "stage": stage,
        "partitions_written": len(rows),
        "rows": int(sum(r["rows"] for r in rows)),
        "bytes": int(sum(r["bytes"] for r in rows)),
        "input_tag": input_tag,
    }
    with open(os.path.join(out_dir, "_manifest", "_stage.json"), "w") as f:
        json.dump(rollup, f)
    return rows


def stage_metrics(out_dir: str) -> dict:
    """Lineage rollup across all completed partitions."""
    mdir = os.path.join(out_dir, "_manifest")
    rows = 0
    nbytes = 0
    parts = []
    for f in sorted(os.listdir(mdir)) if os.path.isdir(mdir) else []:
        if f.endswith(".json") and not f.startswith("_"):
            with open(os.path.join(mdir, f)) as fh:
                e = json.load(fh)
            rows += e["rows"]
            nbytes += e["bytes"]
            parts.append(e["partition"])
    return {"partitions": sorted(parts), "rows": rows, "bytes": nbytes}


def output_files(out_dir: str) -> list[str]:
    """Current data files of a checkpointed stage, resolved through the
    manifests (post-compaction entries point several partitions at one
    shared file — deduped here). Feed to ray.data.read_parquet."""
    mdir = os.path.join(out_dir, "_manifest")
    files = []
    for f in sorted(os.listdir(mdir)) if os.path.isdir(mdir) else []:
        if f.endswith(".json") and not f.startswith("_"):
            with open(os.path.join(mdir, f)) as fh:
                e = json.load(fh)
            rel = e.get("file", f"part={e['partition']}/part-{e['partition']}.parquet")
            files.append(os.path.join(out_dir, rel))
    return sorted(set(files))


def compact_partitions(out_dir: str, target_bytes: int = 128 << 20) -> dict:
    """Small-file compaction: greedily bin-pack ADJACENT partitions
    (ascending pid — spatial contiguity survives, so range reads stay
    range reads) into ~``target_bytes`` files, rewrite each group in
    one parallel Ray task, and repoint the member manifests at the
    shared file. Per-partition manifests REMAIN the resume contract —
    `completed_partitions` / `resume_filter` are untouched by
    compaction; only the data-file layout changes.

    Safe to re-run with ANY target_bytes, including after more
    partitions landed since the last pass: a data file shared by
    several partitions is an ATOMIC packing unit (grouped by current
    file, never split across groups, sized by its on-disk bytes), so a
    group always rewrites whole files — no row duplication. Source
    files are deleted only in a final GC pass over files that no
    manifest references, after every group's manifests are repointed —
    a shared file can never be removed out from under another group,
    and a crash mid-compaction leaves at worst an orphaned (still
    readable, unreferenced) file for the next pass's GC.

    At 100 TB this is the maintenance pass that keeps a
    many-partition stage (e.g. 2^16 Hilbert partitions × a few MB
    after a sparse filter) from handing the next reader a
    small-file storm."""
    import ray

    mdir = os.path.join(out_dir, "_manifest")
    entries = []
    for f in sorted(os.listdir(mdir)) if os.path.isdir(mdir) else []:
        if f.endswith(".json") and not f.startswith("_"):
            with open(os.path.join(mdir, f)) as fh:
                entries.append(json.load(fh))
    entries.sort(key=lambda e: e["partition"])

    # Atomic packing units: all manifest entries pointing at the same
    # current data file move together, weighted by actual file size.
    units: dict[str, list[dict]] = {}
    for e in entries:
        rel = e.get("file", f"part={e['partition']}/part-{e['partition']}.parquet")
        units.setdefault(rel, []).append(e)
    unit_list = sorted(units.items(), key=lambda kv: kv[1][0]["partition"])

    groups, cur, cur_bytes = [], [], 0
    for rel, members in unit_list:
        try:
            fbytes = os.path.getsize(os.path.join(out_dir, rel))
        except OSError:
            fbytes = sum(m["bytes"] for m in members)
        cur.append((rel, members))
        cur_bytes += fbytes
        if cur_bytes >= target_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
    if cur:
        groups.append(cur)

    @ray.remote
    def compact_group(group: list[tuple[str, list[dict]]]) -> dict:
        import pyarrow.parquet as pq

        all_members = [m for _, members in group for m in members]
        lo = min(m["partition"] for m in all_members)
        hi = max(m["partition"] for m in all_members)
        srcs = [os.path.join(out_dir, rel) for rel, _ in group]
        if len(srcs) == 1:
            return {"lo": lo, "hi": hi, "files_in": 1, "skipped": True}
        cdir = os.path.join(out_dir, "compact")
        os.makedirs(cdir, exist_ok=True)
        rel_out = f"compact/part-{lo}-{hi}.parquet"
        final = os.path.join(out_dir, rel_out)
        tmp = final + ".tmp"
        t = pa.concat_tables([pq.read_table(s) for s in srcs])
        pq.write_table(t, tmp)
        os.replace(tmp, final)
        for e in all_members:  # repoint manifests AFTER the data landed
            e2 = dict(e)
            e2["file"] = rel_out
            mtmp = os.path.join(mdir, f"{e['partition']}.json.tmp")
            with open(mtmp, "w") as fh:
                json.dump(e2, fh)
            os.replace(mtmp, os.path.join(mdir, f"{e['partition']}.json"))
        return {"lo": lo, "hi": hi, "files_in": len(srcs), "skipped": False}

    results = ray.get([compact_group.remote(g) for g in groups])
    done = [r for r in results if not r["skipped"]]

    # GC: delete data files nothing references anymore. Runs after ALL
    # manifests are repointed, so a file shared across groups survives
    # until its last referencing manifest moved off it.
    live = {os.path.normpath(f) for f in output_files(out_dir)}
    removed = 0
    for root, _dirs, files in os.walk(out_dir):
        if os.path.basename(root) == "_manifest":
            continue
        for f in files:
            if not f.endswith(".parquet"):
                continue
            path = os.path.normpath(os.path.join(root, f))
            if path not in live:
                os.remove(path)
                removed += 1

    rollup = {
        "groups": len(groups),
        "groups_compacted": len(done),
        "files_before": int(sum(r["files_in"] for r in results)),
        "files_after": len(results),
        "files_gc": removed,
        "target_bytes": target_bytes,
    }
    with open(os.path.join(mdir, "_compaction.json"), "w") as f:
        json.dump(rollup, f)
    return rollup
