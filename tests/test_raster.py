"""Raster stage kernels: stretches, HSI cleanup, tiling (reference
main.py:47-61, batch_sam.py:328-342, utils.py:27-48,
build_dataloaders.py:22-142, batch_sam.py:359)."""

import numpy as np
import pytest

from geotreehealth_ray.functions import codec
from geotreehealth_ray.stages import raster
from geotreehealth_ray.sources import synth


def test_linear_stretch():
    a = np.array([[10, 20], [30, 40]], dtype=np.float64)
    out = raster.linear_stretch(a)
    assert out.min() == 0 and out.max() == 255
    assert out.dtype == np.uint8


def test_percentile_stretch_clips_outliers():
    rng = np.random.default_rng(0)
    a = rng.normal(100, 10, (50, 50))
    a[0, 0] = 1e6  # outlier must not wash out the range
    out = raster.percentile_stretch(a)
    assert out.dtype == np.uint8
    assert np.median(out) > 50  # bulk of the data uses the range


def test_masked_stretch_ignores_background():
    a = np.zeros((4, 4, 1))
    a[:2, :, 0] = [[10, 20, 30, 40]] * 2
    a[2:, :, 0] = 9999  # background
    mask = np.zeros((4, 4), bool)
    mask[:2] = True
    out = raster.masked_linear_stretch(a, mask)
    assert out[:2].max() == 255


def test_clean_hsi_band_count():
    cube = np.random.default_rng(1).uniform(0, 12000, (426, 4, 5))
    out = raster.clean_hsi(cube)
    assert out.shape == (310, 4, 5)  # 426 − 116 bad bands
    assert out.dtype == np.uint8


def test_normalize_rgb_shape_and_range():
    img = np.random.default_rng(2).integers(0, 256, (300, 120, 3), dtype=np.uint8)
    out = raster.normalize_rgb_array(img, crop=224)
    assert out.shape == (224, 224, 3)
    assert out.dtype == np.float32


def test_normalize_hsi_transpose_and_scaled_branch():
    cube = np.random.default_rng(4).uniform(0, 1, (7, 4, 5)).astype(np.float32)
    # active reference behavior: pure CHW→HWC transpose
    out = raster.normalize_hsi(cube)
    assert out.shape == (4, 5, 7)
    np.testing.assert_array_equal(out, np.transpose(cube, (1, 2, 0)))
    # dormant branch: values land in [0, 1], zeros stay zero
    cube[0, 0, 0] = 0.0
    s = raster.normalize_hsi(cube, scale=True)
    assert s.shape == (4, 5, 7)
    assert s.min() >= 0.0 and s.max() <= 1.0 + 1e-6
    assert s[0, 0, 0] == 0.0


def test_preprocess_hsi_reference_chain():
    # reference tests/build_dataloaders_test.py:31-36: the enshrined
    # output contract is shape[2] == 314 (310 kept bands + the 2+2 pad
    # that lands on the CHANNEL axis after the transpose)
    rng = np.random.default_rng(8)
    cube = rng.integers(-10000, 10000, (426, 40, 40)).astype(np.float64)
    out = raster.preprocess_hsi(cube)
    assert out.shape == (40, 44, 314)
    assert out.min() >= 0.0
    # the reference test's max<=1 assertion holds only with the dormant
    # scaling branch enabled
    s = raster.preprocess_hsi(cube, scale=True)
    assert s.shape == (40, 44, 314)
    assert s.max() <= 1.0 + 1e-6


def test_normalize_point_cloud_centroid_zero():
    # reference tests/build_dataloaders_test.py:38-42
    pts = np.random.default_rng(3).normal(10, 5, (2773, 3))
    out = raster.normalize_point_cloud(pts)
    np.testing.assert_allclose(out.mean(axis=0), 0, atol=1e-9)


def test_pad_image():
    a = np.ones((3, 5, 2))
    out = raster.pad_image(a, 8, 8)
    assert out.shape == (8, 8, 2)
    assert out[:3, :5].sum() == 30


def test_image_tiler_covers_everything(ray_session):
    import ray.data as rd

    cfg = synth.TINY
    tiles, images = synth.gen_tiles_and_images(cfg, synth.tile_grid(cfg)[:4])
    ds = rd.from_arrow(images)
    sub = raster.split_images(ds, tile_px=100, overlap_px=10).to_pandas()
    # every source image appears; offsets step by 90
    assert set(sub["image_id"]) == set(images["image_id"].to_pylist())
    one = sub[sub["image_id"] == images["image_id"][0].as_py()]
    w = int(images["w"][0].as_py())
    n_steps = len(range(0, max(1, w - 10), 90))
    assert len(one) == n_steps * n_steps
    # decode a subtile and verify pixels equal the source crop
    src = codec.decode(images["bytes"][0].as_py(), images["fmt"][0].as_py())
    r0 = one.sort_values("tile_idx").iloc[0]
    got = codec.decode(r0["bytes"], r0["fmt"])
    exp = src[r0.y_off : r0.y_off + r0.h, r0.x_off : r0.x_off + r0.w]
    if r0.fmt == "png":
        np.testing.assert_array_equal(got, exp)
    else:
        assert codec.psnr(exp, got) >= 40.0


def test_tile_pyramid_levels(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (96, 64, 3), dtype=np.uint8)
    import pyarrow as pa
    images = pa.table({
        "image_id": pa.array(["a"], pa.string()),
        "bytes": pa.array([codec.encode(img, "png")], pa.binary()),
        "fmt": pa.array(["png"], pa.string()),
    })
    out = raster.build_tile_pyramid(
        rd.from_arrow(images), levels=3
    ).to_pandas().sort_values("level").reset_index(drop=True)
    assert list(out["level"]) == [0, 1, 2]
    assert list(zip(out["h"], out["w"])) == [(96, 64), (48, 32), (24, 16)]
    # level 0 is the source; level 1 equals the 2x2 round-half-up mean
    np.testing.assert_array_equal(
        codec.decode(out.iloc[0]["bytes"], "png"), img
    )
    c = img.astype(np.uint32)
    want1 = ((c[0::2, 0::2] + c[0::2, 1::2] + c[1::2, 0::2]
              + c[1::2, 1::2] + 2) // 4).astype(np.uint8)
    np.testing.assert_array_equal(
        codec.decode(out.iloc[1]["bytes"], "png"), want1
    )


def test_split_then_stitch_roundtrip(ray_session):
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(23)
    imgs = {
        f"img{i}": rng.integers(0, 256, (70 + 7 * i, 90 - 5 * i, 3),
                                dtype=np.uint8)
        for i in range(3)
    }
    images = pa.table({
        "image_id": pa.array(list(imgs), pa.string()),
        "bytes": pa.array(
            [codec.encode(v, "png") for v in imgs.values()], pa.binary()
        ),
        "fmt": pa.array(["png"] * len(imgs), pa.string()),
    })
    tiles = raster.split_images(
        rd.from_arrow(images).repartition(2), tile_px=48, overlap_px=8
    )
    whole = raster.stitch_tiles(tiles).to_pandas()
    assert len(whole) == len(imgs)
    for r in whole.itertuples():
        np.testing.assert_array_equal(
            codec.decode(r.bytes, r.fmt), imgs[r.image_id]
        )
