"""Training handoff: MultiModalDataset/DataLoader counterpart
(reference build_dataloaders.py:13-169, main.py:205-371) — fixed-shape
multimodal samples assembled in-pipeline, consumed via iter_batches."""

import numpy as np
import pytest

from geotreehealth_ray.pipelines import training
from geotreehealth_ray.pipelines.chips import GridSpec, extract_chips
from geotreehealth_ray.sources import synth


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth_training")
    return synth.write_all(synth.TINY, str(out))


RS, MP = 16, 64


@pytest.fixture(scope="module")
def samples(tiny, ray_session):
    import ray.data as rd

    crowns = rd.read_parquet(tiny["crowns"])
    tiles = rd.read_parquet(tiny["tiles"])
    images = rd.read_parquet(tiny["images"])
    lidar = rd.read_parquet(tiny["lidar"])
    grid = GridSpec.from_synth(synth.TINY)

    chips = extract_chips(crowns, tiles, images, grid)
    pts = training.crown_lidar_points(lidar, crowns, max_points=MP)
    return training.multimodal_training_rows(
        chips, pts, rgb_shape=RS, max_points=MP
    ).materialize()


def test_crown_lidar_points_deterministic_and_bboxed(tiny, ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    crowns = rd.read_parquet(tiny["crowns"])
    lidar = rd.read_parquet(tiny["lidar"])
    a = training.crown_lidar_points(lidar, crowns, max_points=MP).to_pandas()
    b = training.crown_lidar_points(
        lidar.repartition(7), crowns.repartition(3), max_points=MP
    ).to_pandas()
    assert len(a) > 0
    da = dict(zip(a["crown_id"], a["xyz_b"]))
    db = dict(zip(b["crown_id"], b["xyz_b"]))
    assert da == db  # parallelism-independent (canonical-sort contract)

    # single-process oracle: replicate the contract exactly — bbox
    # membership → canonical (x, y, z) sort → hash-ranked subsample /
    # zero-pad → mean-center (pad-then-normalize, the reference
    # __getitem__ order)
    from geotreehealth_ray.pipelines.lidar import (
        normalize_xyz,
        subsample_points,
    )

    cr = pq.read_table(tiny["crowns"]).to_pandas().set_index("crown_id")
    li = pq.read_table(tiny["lidar"]).to_pandas()
    checked = 0
    for cid, buf in list(da.items())[:10]:
        pts = np.frombuffer(buf, np.float64).reshape(MP, 3)
        assert abs(pts.mean(axis=0)).max() < 1e-9  # normalize_xyz
        row = cr.loc[cid]
        inside = li[
            (li["x"] >= row["minx"]) & (li["x"] <= row["maxx"])
            & (li["y"] >= row["miny"]) & (li["y"] <= row["maxy"])
        ][["x", "y", "z"]].to_numpy(np.float64)
        inside = inside[np.lexsort((inside[:, 2], inside[:, 1], inside[:, 0]))]
        want = normalize_xyz(subsample_points(inside, MP))
        np.testing.assert_array_equal(pts, want)
        checked += 1
    assert checked


def test_multimodal_rows_fixed_shapes(samples):
    df = samples.to_pandas()
    assert len(df) > 0
    hsi = np.frombuffer(df["hsi_b"].iloc[0], np.float32)
    assert hsi.size == 314 * RS * (RS + 4)  # reference 426→314 contract
    rgb = np.frombuffer(df["rgb_b"].iloc[0], np.float32)
    assert rgb.size == 3 * RS * RS
    xyz = np.frombuffer(df["lidar_b"].iloc[0], np.float32)
    assert xyz.size == MP * 3
    assert (df["label"].str.len() > 0).any()  # captions flow through


def test_iter_training_batches_shapes_and_coverage(samples):
    n_rows = samples.count()
    seen = 0
    for batch in training.iter_training_batches(samples, batch_size=8):
        b = len(batch["crown_id"])
        assert batch["hsi"].shape == (b, 314, RS, RS + 4)
        assert batch["hsi"].dtype == np.float32
        assert batch["rgb"].shape == (b, 3, RS, RS)
        assert batch["lidar"].shape == (b, MP, 3)
        assert len(batch["label"]) == b
        seen += b
    assert seen == n_rows


def test_iter_torch_requires_torch(samples):
    try:
        import torch  # noqa: F401
        pytest.skip("torch present; passthrough covered implicitly")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="torch"):
        next(training.iter_torch_training_batches(samples))


def test_fused_pipeline_matches_composable(tiny, samples, ray_session):
    """multimodal_training_pipeline (single crown_id exchange) must be
    byte-identical to crown_lidar_points + multimodal_training_rows."""
    import ray.data as rd

    crowns = rd.read_parquet(tiny["crowns"])
    tiles = rd.read_parquet(tiny["tiles"])
    images = rd.read_parquet(tiny["images"])
    lidar = rd.read_parquet(tiny["lidar"])
    grid = GridSpec.from_synth(synth.TINY)
    chips = extract_chips(crowns, tiles, images, grid)

    fused = training.multimodal_training_pipeline(
        chips, lidar, crowns, rgb_shape=RS, max_points=MP
    ).to_pandas().sort_values("crown_id").reset_index(drop=True)
    base = samples.to_pandas().sort_values("crown_id").reset_index(drop=True)
    assert len(fused) == len(base) > 0
    for col in ("crown_id", "label", "rgb_shape", "max_points"):
        assert (fused[col].to_numpy() == base[col].to_numpy()).all(), col
    for col in ("hsi_b", "rgb_b", "lidar_b"):
        assert all(a == b for a, b in zip(fused[col], base[col])), col
