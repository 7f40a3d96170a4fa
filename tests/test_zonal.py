"""Zonal statistics golden: per-crown masked band reductions equal a
driver-side single-process recomputation over the same synthetic tiles
(raster↔vector aggregation half of store_data_structures.py:15-39)."""

import numpy as np
import pytest

from geotreehealth_ray.functions import codec, geom
from geotreehealth_ray.pipelines.chips import GridSpec, zonal_stats
from geotreehealth_ray.sources import synth
from geotreehealth_ray.stages.spatial import rings_from_arrow


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth_zonal")
    return synth.write_all(synth.TINY, str(out))


def test_zonal_stats_match_reference(tiny, ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    cfg = synth.TINY
    grid = GridSpec.from_synth(cfg)
    crowns = rd.read_parquet(tiny["crowns"])
    got = zonal_stats(crowns, tiny["tiles"], grid).to_pandas()
    got = got.set_index("crown_id")

    cr = pq.read_table(tiny["crowns"])
    rings = {
        cid: r
        for cid, r in zip(cr["crown_id"].to_pylist(),
                          rings_from_arrow(cr["ring"]))
    }
    crd = cr.to_pandas()
    tl = pq.read_table(tiny["tiles"]).to_pandas().set_index("tile_id")
    exp_tid = grid.owning_tile(
        crd["minx"].to_numpy(), crd["miny"].to_numpy(),
        crd["maxx"].to_numpy(), crd["maxy"].to_numpy(),
    )

    n_checked = 0
    for cid, tid in zip(crd["crown_id"], exp_tid):
        if not tid:
            assert cid not in got.index
            continue
        trow = tl.loc[tid]
        img = codec.decode(trow["bytes"], trow["fmt"])
        if img.ndim == 2:
            img = img[:, :, None]
        ring = rings[cid]
        minx, miny, maxx, maxy = geom.ring_bbox(ring)
        a, c0, e, f0 = trow["a"], trow["c"], trow["e"], trow["f"]
        th, tw = img.shape[0], img.shape[1]
        col0 = max(0, int(np.floor((minx - c0) / a)))
        col1 = min(tw, int(np.ceil((maxx - c0) / a)))
        row0 = max(0, int(np.floor((maxy - f0) / e)))
        row1 = min(th, int(np.ceil((miny - f0) / e)))
        crop = img[row0:row1, col0:col1]
        wx = c0 + (np.arange(col0, col1) + 0.5) * a
        wy = f0 + (np.arange(row0, row1) + 0.5) * e
        inside = geom.raster_mask(ring, wx, wy)
        npx = int(inside.sum())
        if npx == 0:
            assert cid not in got.index
            continue
        vals = crop[inside].astype(np.int64)
        row = got.loc[cid]
        assert row["tile_id"] == tid
        assert row["px_count"] == npx
        assert list(row["band_sums"]) == vals.sum(axis=0).tolist()
        assert list(row["band_mins"]) == vals.min(axis=0).tolist()
        assert list(row["band_maxs"]) == vals.max(axis=0).tolist()
        n_checked += 1
    assert n_checked > 50  # the TINY table serves most crowns
