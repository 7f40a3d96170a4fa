"""Resumable chip extraction: a rerun skips completed partitions at the
source (no raster work repeated) and leaves their files untouched."""

import glob
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from geotreehealth_ray.pipelines.chips import GridSpec, extract_chips_checkpointed
from geotreehealth_ray.sources import synth
from geotreehealth_ray.state import checkpoint as cp


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth_ckpt")
    return synth.write_all(synth.TINY, str(out))


def test_resume_skips_done_partitions(tiny, tmp_path, ray_session):
    import ray.data as rd

    grid = GridSpec.from_synth(synth.TINY)
    crowns = rd.read_parquet(tiny["crowns"])
    images = rd.read_parquet(tiny["images"])
    out_dir = str(tmp_path / "chips_out")

    rows1 = extract_chips_checkpointed(crowns, tiny["tiles"], images, grid,
                                       out_dir, partition_bits=26)
    assert len(rows1) >= 2  # several spatial partitions
    done1 = cp.completed_partitions(out_dir)
    total_rows = sum(r["rows"] for r in rows1)
    assert total_rows > 0

    mtimes = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(out_dir, "part=*", "*.parquet"))
    }

    # rerun: everything already checkpointed → nothing rewritten
    rows2 = extract_chips_checkpointed(crowns, tiny["tiles"], images, grid,
                                       out_dir, partition_bits=26)
    assert sum(r["rows"] for r in rows2) == 0 or len(rows2) == 0
    for f, m in mtimes.items():
        assert os.path.getmtime(f) == m
    assert cp.completed_partitions(out_dir) == done1

    # lineage rollup equals the written rows
    metrics = cp.stage_metrics(out_dir)
    assert metrics["rows"] == total_rows

    # written content is complete: equals a direct (non-checkpointed) run
    from geotreehealth_ray.pipelines.chips import extract_chips_storage

    direct = extract_chips_storage(crowns, tiny["tiles"], images, grid)
    direct_meta = direct.map_batches(
        lambda t: t.drop_columns(["bytes", "mask"]), batch_format="pyarrow"
    ).to_pandas()
    written = pd.concat(
        [pq.read_table(f).to_pandas() for f in mtimes], ignore_index=True
    )
    assert sorted(written["crown_id"]) == sorted(direct_meta["crown_id"])
    a = written.set_index("crown_id")["pixel_checksum"].sort_index()
    b = direct_meta.set_index("crown_id")["pixel_checksum"].sort_index()
    assert (a == b).all()
