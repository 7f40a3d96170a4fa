"""Golden per-row chip verification (BASELINE.md correctness gate):
decoded chip pixels equal the analytic world texture under the mask
(exact for png; PSNR ≥ 40 dB for the lossy fmt), caption equality, and
tile assignment invariants (reference store_data_structures.py:14-39,
batch_sam.py:563-568)."""

import numpy as np
import pytest

from geotreehealth_ray.functions import codec, geom
from geotreehealth_ray.pipelines.chips import (
    GridSpec,
    assign_crowns_to_tiles,
    extract_chips,
    extract_chips_storage,
)
from geotreehealth_ray.sources import synth
from geotreehealth_ray.stages.spatial import rings_from_arrow


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth_chips")
    return synth.write_all(synth.TINY, str(out))


def test_chips_match_reference_semantics(tiny, ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    cfg = synth.TINY
    grid = GridSpec.from_synth(cfg)
    crowns = rd.read_parquet(tiny["crowns"])
    tiles = rd.read_parquet(tiny["tiles"])
    images = rd.read_parquet(tiny["images"])
    chips = extract_chips(crowns, tiles, images, grid).to_pandas()

    cr = pq.read_table(tiny["crowns"])
    rings = {cid: r for cid, r in zip(cr["crown_id"].to_pylist(), rings_from_arrow(cr["ring"]))}
    tl = pq.read_table(tiny["tiles"]).to_pandas().set_index("tile_id")
    im = pq.read_table(tiny["images"]).to_pandas().set_index("image_id")

    # expected servable crowns
    crd = cr.to_pandas()
    exp_tid = grid.owning_tile(
        crd["minx"].to_numpy(), crd["miny"].to_numpy(),
        crd["maxx"].to_numpy(), crd["maxy"].to_numpy(),
    )
    servable = {cid: t for cid, t in zip(crd["crown_id"], exp_tid) if t}
    assert set(chips["crown_id"]) == set(servable)
    assert len(chips) == len(servable)

    checked_png = checked_qdct = 0
    for row in chips.itertuples():
        assert servable[row.crown_id] == row.tile_id
        trow = tl.loc[row.tile_id]
        # caption equality (BASELINE.json invariant)
        assert row.caption == im.loc[row.tile_id, "caption"]
        assert row.fmt == trow["fmt"]
        ring = rings[row.crown_id]
        minx, miny, maxx, maxy = geom.ring_bbox(ring)
        a, c0, e, f0 = trow["a"], trow["c"], trow["e"], trow["f"]
        col0 = max(0, int(np.floor((minx - c0) / a)))
        col1 = min(int(trow["w"]), int(np.ceil((maxx - c0) / a)))
        row0 = max(0, int(np.floor((maxy - f0) / e)))
        row1 = min(int(trow["h"]), int(np.ceil((miny - f0) / e)))
        assert (row.w, row.h) == (col1 - col0, row1 - row0)
        wx = c0 + (np.arange(col0, col1) + 0.5) * a
        wy = f0 + (np.arange(row0, row1) + 0.5) * e
        gx, gy = np.meshgrid(wx, wy)
        inside = geom.points_in_ring(gx.ravel(), gy.ravel(), ring).reshape(row.h, row.w)
        # mask and count
        mask_img = codec.decode(row.mask)
        np.testing.assert_array_equal(mask_img > 0, inside)
        assert row.mask_px_count == int(inside.sum())
        got = codec.decode(row.bytes, row.fmt)
        if row.fmt == "png":
            # exact: decoded chip == analytic texture under mask
            tex = synth.texture_at(gx, gy, cfg.res_m, cfg.seed)
            expected = tex * inside[:, :, None]
            np.testing.assert_array_equal(got, expected)
            assert row.pixel_checksum == int(expected.astype(np.int64).sum())
            checked_png += 1
        else:
            # lossy: decoded chip vs masked crop of the decoded tile
            tile_img = codec.decode(trow["bytes"], trow["fmt"])
            expected = tile_img[row0:row1, col0:col1] * inside[:, :, None]
            assert codec.psnr(expected, got) >= 40.0
            checked_qdct += 1
    assert checked_png >= 5 and checked_qdct >= 5


def test_storage_path_equals_shuffle_path(tiny, ray_session):
    """The storage-join extractor and the salted-shuffle extractor must
    produce identical chip rows (both orders of the same join)."""
    import ray.data as rd

    cfg = synth.TINY
    grid = GridSpec.from_synth(cfg)
    crowns = rd.read_parquet(tiny["crowns"])
    tiles = rd.read_parquet(tiny["tiles"])
    images = rd.read_parquet(tiny["images"])
    a = extract_chips(crowns, tiles, images, grid).to_pandas()
    b = extract_chips_storage(crowns, tiny["tiles"], images, grid).to_pandas()
    key = ["crown_id"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a[["crown_id", "tile_id", "w", "h", "mask_px_count",
              "pixel_checksum", "caption", "fmt"]].equals(
        b[["crown_id", "tile_id", "w", "h", "mask_px_count",
           "pixel_checksum", "caption", "fmt"]]
    )
    assert list(a["bytes"]) == list(b["bytes"])


def test_unservable_crowns_are_flagged(tiny, ray_session):
    """A crown wider than tile+overlap has no owning tile → ''."""
    grid = GridSpec.from_synth(synth.TINY)
    out = grid.owning_tile(
        np.array([synth.TINY.origin_m + 1.0]),
        np.array([synth.TINY.origin_m + 1.0]),
        np.array([synth.TINY.origin_m + 100.0]),
        np.array([synth.TINY.origin_m + 100.0]),
    )
    assert out[0] == ""


def test_tile_rank_wide_grids():
    """Grids with n >= 10000 tiles per side (100 TB scale) keep the
    tile_rank contract: id width grows with the grid, rank parse is
    exact, and lexicographic id order == row-major rank order
    (ADVICE r3: zfill(4) broke both at n >= 10000)."""
    import pyarrow as pa

    from geotreehealth_ray.pipelines.chips import tile_rank

    g = GridSpec(0, 0, 25.6, 2.0, 25.6 * 12000)
    assert g.n == 12000 and g.id_width == 5
    rows = np.array([0, 9999, 10000, 11999])
    cols = np.array([5, 11999, 0, 11999])
    ids = g.tile_id(rows, cols)
    rk = tile_rank(pa.array([str(s) for s in ids]), g.n)
    assert (rk == (rows * g.n + cols).astype(np.uint64)).all()
    assert list(sorted(ids)) == list(ids[np.argsort(rk)])
    # small grids keep the historic 4-digit ids (hash stability)
    g4 = GridSpec(0, 0, 25.6, 2.0, 100.0)
    assert g4.id_width == 4
    assert g4.tile_id(np.array([3]), np.array([1]))[0] == "t_0003_0001"
