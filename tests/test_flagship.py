"""End-to-end pipeline compositions (reference entry points §3)."""

import numpy as np
import pytest

from geotreehealth_ray.pipelines import flagship
from geotreehealth_ray.pipelines.chips import GridSpec
from geotreehealth_ray.sources import synth


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth_flag")
    return synth.write_all(synth.TINY, str(out))


def test_delineation_pipeline(tiny, ray_session):
    import ray.data as rd

    stems = rd.read_parquet(tiny["stems"])
    crowns = rd.read_parquet(
        tiny["crowns"],
        columns=["crown_id", "stem_id", "ring", "score", "area",
                 "cx", "cy", "minx", "miny", "maxx", "maxy"],
    )
    out, metrics = flagship.delineation_pipeline(stems, crowns)
    df = out.to_pandas()
    assert metrics["prompts"] > 0
    assert metrics["crowns_selected"] > 0
    assert len(df) == metrics["crowns_with_attrs"]
    assert {"crown_id", "stem_id", "selected", "species", "dbh"} <= set(df.columns)
    # joined attrs are non-null for labeled crowns
    assert df["species"].notna().all()


def test_health_dataset_pipeline(tiny, ray_session):
    import ray.data as rd

    crowns = rd.read_parquet(tiny["crowns"])
    images = rd.read_parquet(tiny["images"])
    out, metrics = flagship.health_dataset_pipeline(
        crowns, tiny["tiles"], images, GridSpec.from_synth(synth.TINY)
    )
    df = out.to_pandas()
    assert metrics["chips"] == len(df)
    assert set(df["split"]) <= {"train", "val", "test"}
    assert (df["mask_px_count"] > 0).all()


def test_alignment_pipeline(tiny, ray_session):
    import ray.data as rd

    ref = rd.read_parquet(tiny["stems"])
    # field copy with a known shift
    field = ref.map_batches(
        lambda df: df.assign(x=df["x"] - 2.0, y=df["y"] + 1.0),
        batch_format="pandas",
    )
    out, metrics = flagship.alignment_pipeline(field, ref)
    df = out.to_pandas()
    assert metrics["matched_points"] > 0
    ref_df = ref.to_pandas().drop_duplicates("stem_id").set_index("stem_id")
    sample = df.drop_duplicates("stem_id").head(50).set_index("stem_id")
    err = np.hypot(
        sample["x_aligned"] - ref_df.loc[sample.index, "x"],
        sample["y_aligned"] - ref_df.loc[sample.index, "y"],
    )
    assert err.max() < 0.01
