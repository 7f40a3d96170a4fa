"""Checkpoint/resume semantics: partial run → resume completes only
pending partitions; completed partitions are not rewritten; final
output equals a from-scratch run (north_rule resumability)."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from geotreehealth_ray.state import checkpoint as cp


def _demo_ds(rd, n=1000):
    from geotreehealth_ray.functions.cells import BASE_CELL_M, cell_of

    rng = np.random.default_rng(0)
    x = rng.uniform(0, BASE_CELL_M, n)
    y = rng.uniform(0, BASE_CELL_M, n)
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "cell": cell_of(x, y, 13),
            "v": np.arange(n, dtype=np.float64),
        }
    )
    df["partition_id"] = cp.partition_of_cells(df["cell"].to_numpy(), bits=3)
    return rd.from_pandas(df), df


def _read_all(out_dir):
    import glob

    files = sorted(glob.glob(os.path.join(out_dir, "part=*", "*.parquet")))
    return pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)


def test_write_resume_cycle(tmp_path, ray_session):
    import ray.data as rd

    ds, df = _demo_ds(rd)
    out = str(tmp_path / "out")

    # simulate a partial run: only partitions 0..3 written
    part_ids = sorted(df["partition_id"].unique())
    first = [p for p in part_ids if p < 4]
    sub = rd.from_pandas(df[df["partition_id"].isin(first)])
    rows1 = cp.write_partitioned(sub, out, stage="demo")
    assert cp.completed_partitions(out) == set(first)

    mtimes = {
        p: os.path.getmtime(os.path.join(out, f"part={p}", f"part-{p}.parquet"))
        for p in first
    }

    # resume: filter drops completed partitions, then write the rest
    pending = cp.resume_filter(ds, out)
    pdf = pending.to_pandas()
    assert set(pdf["partition_id"].unique()) == set(p for p in part_ids if p >= 4)
    cp.write_partitioned(pending, out, stage="demo")
    assert cp.completed_partitions(out) == set(part_ids)

    # completed partitions untouched
    for p in first:
        assert os.path.getmtime(os.path.join(out, f"part={p}", f"part-{p}.parquet")) == mtimes[p]

    # final content equals input
    got = _read_all(out).sort_values("id").reset_index(drop=True)
    exp = df.sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["id", "v"]], exp[["id", "v"]])

    # lineage metrics
    m = cp.stage_metrics(out)
    assert m["rows"] == len(df)
    assert m["partitions"] == list(part_ids)


def test_partition_of_cells_contiguous():
    from geotreehealth_ray.functions.cells import cell_of

    x = np.array([10.0, 11.0, 500000.0])
    y = np.array([10.0, 11.0, 500000.0])
    c = cell_of(x, y, 13)
    p = cp.partition_of_cells(c, bits=8)
    # nearby points share a partition; far points don't
    assert p[0] == p[1]
    assert p[0] != p[2]


def test_partition_of_cells_hilbert_compact():
    import numpy as np

    from geotreehealth_ray.functions import cells
    from geotreehealth_ray.state.checkpoint import partition_of_cells

    rng = np.random.default_rng(9)
    x = rng.uniform(0, 2000, 4000)
    y = rng.uniform(0, 2000, 4000)
    key = cells.cell_of(x, y, 13)
    pid_m = partition_of_cells(key, bits=4)
    pid_h = partition_of_cells(key, bits=4, curve="hilbert")
    # same number of coarse groups, both complete partitions of rows
    assert len(pid_m) == len(pid_h) == 4000
    # hilbert ids are deterministic re-encodings: same key -> same pid
    again = partition_of_cells(key, bits=4, curve="hilbert")
    np.testing.assert_array_equal(pid_h, again)
    # compactness: mean bbox area per hilbert partition <= morton's
    def mean_area(pid):
        areas = []
        for p in np.unique(pid):
            m = pid == p
            areas.append((x[m].ptp() + 1) * (y[m].ptp() + 1))
        return np.mean(areas)

    assert mean_area(pid_h) <= mean_area(pid_m) * 1.05


def test_compaction_preserves_rows_and_resume_contract(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from geotreehealth_ray.state import checkpoint as cp

    out = str(tmp_path / "stage_out")
    n = 5000
    df = pd.DataFrame({
        "partition_id": (np.arange(n) % 40).astype(np.int64),
        "v": np.arange(n, dtype=np.int64),
    })
    cp.write_partitioned(rd.from_pandas(df).repartition(8), out,
                         stage="s1", input_tag="t1")
    before_files = cp.output_files(out)
    assert len(before_files) == 40
    done_before = cp.completed_partitions(out)

    # pack ~8 small partitions per compacted file
    one = os.path.getsize(before_files[0])
    roll = cp.compact_partitions(out, target_bytes=8 * one)
    after_files = cp.output_files(out)
    assert len(after_files) < len(before_files) / 3

    # data identical through the manifest-resolved reader
    got = rd.read_parquet(after_files).to_pandas().sort_values("v")
    assert (got["v"].to_numpy() == np.arange(n)).all()

    # the resume contract is untouched: same done-set, rows metric
    assert cp.completed_partitions(out) == done_before
    assert cp.stage_metrics(out)["rows"] == n
    filtered = cp.resume_filter(rd.from_pandas(df), out)
    assert filtered.count() == 0

    # convergent: re-runs may merge still-undersized compact files
    # further, but reach a fixpoint (no groups compacted) within a few
    # passes, preserving the data exactly at every step
    for _ in range(4):
        roll2 = cp.compact_partitions(out, target_bytes=8 * one)
        got2 = rd.read_parquet(cp.output_files(out)).to_pandas()
        assert len(got2) == n
        if roll2["groups_compacted"] == 0:
            break
    assert roll2["groups_compacted"] == 0


def test_recompaction_with_changed_grouping(ray_session, tmp_path):
    """Re-running compaction with a different target (or after new
    partitions landed post-resume) must treat a shared compacted file
    as one atomic unit: no duplicated rows, no FileNotFoundError from
    two groups deleting the same source, no dangling manifests."""
    import glob

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from geotreehealth_ray.state import checkpoint as cp

    out = str(tmp_path / "stage_out")
    n = 4000
    df = pd.DataFrame({
        "partition_id": (np.arange(n) % 32).astype(np.int64),
        "v": np.arange(n, dtype=np.int64),
    })
    cp.write_partitioned(rd.from_pandas(df).repartition(8), out, stage="s1")
    one = os.path.getsize(cp.output_files(out)[0])

    # pass 1: ~4 partitions per compacted file
    cp.compact_partitions(out, target_bytes=4 * one)
    n_files_1 = len(cp.output_files(out))
    assert n_files_1 <= 10

    # new partitions land after a resume
    df2 = pd.DataFrame({
        "partition_id": (32 + np.arange(n) % 8).astype(np.int64),
        "v": (n + np.arange(n)).astype(np.int64),
    })
    cp.write_partitioned(rd.from_pandas(df2).repartition(4), out, stage="s1")

    # pass 2 with a DIFFERENT grouping: would previously split a shared
    # compacted file's members across two groups (dup rows + double rm)
    cp.compact_partitions(out, target_bytes=6 * one)

    files = cp.output_files(out)
    for f in files:  # no dangling manifest → every file exists
        assert os.path.exists(f), f
    got = rd.read_parquet(files).to_pandas().sort_values("v")
    assert len(got) == 2 * n  # no duplication
    assert (got["v"].to_numpy() == np.arange(2 * n)).all()
    assert cp.stage_metrics(out)["rows"] == 2 * n

    # GC left no unreferenced parquet behind
    on_disk = {
        os.path.normpath(p)
        for p in glob.glob(os.path.join(out, "**", "*.parquet"), recursive=True)
    }
    assert on_disk == {os.path.normpath(f) for f in files}

    # pass 3 at the same target is a no-op that still reads clean
    cp.compact_partitions(out, target_bytes=6 * one)
    got3 = rd.read_parquet(cp.output_files(out)).to_pandas()
    assert len(got3) == 2 * n
