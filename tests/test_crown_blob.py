"""Crown exchange blob (stages/spatial.py pack_crown_blobs /
crown_pack_from_blob): compact int32-delta layout vs exact f64
fallback, mixed-format unpack (post-shuffle tables interleave rows
from different producer batches), and the out-of-range guard.

No Ray needed — pure Arrow/numpy kernels."""
import numpy as np
import pyarrow as pa
import pytest

from geotreehealth_ray.stages.spatial import (
    _BLOB_FMT_BIT,
    crown_pack_from_blob,
    pack_crown_blobs,
)


def _crowns(n, seed=7, holed=True, reach_max=12.0):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        cx, cy = rng.uniform(0.0, 8000.0, 2)
        k = int(rng.integers(5, 20))
        th = np.sort(rng.uniform(0, 2 * np.pi, k))
        r = rng.uniform(2.0, reach_max, k)
        ring = [{"x": cx + ri * np.cos(t), "y": cy + ri * np.sin(t)}
                for ri, t in zip(r, th)]
        holes = []
        if holed and i % 3 == 0:
            hth = np.sort(rng.uniform(0, 2 * np.pi, int(rng.integers(3, 6))))
            holes.append([{"x": cx + np.cos(t), "y": cy + np.sin(t)}
                          for t in hth])
        rows.append({"crown_id": f"c{i}", "cx": cx, "cy": cy,
                     "ring": ring, "holes": holes})
    pt = pa.struct([("x", pa.float64()), ("y", pa.float64())])
    return pa.Table.from_pylist(rows, schema=pa.schema([
        ("crown_id", pa.string()), ("cx", pa.float64()),
        ("cy", pa.float64()), ("ring", pa.list_(pt)),
        ("holes", pa.list_(pa.list_(pt))),
    ]))


def _fmt_bits(blob):
    bufs = blob.buffers()
    offs = np.frombuffer(bufs[1], np.int32).astype(np.int64) // 8
    data = np.frombuffer(bufs[2], np.float64)
    meta = data[offs[:-1] + 2].view(np.int64)
    return (meta & _BLOB_FMT_BIT) != 0


def test_compact_halves_bytes_and_roundtrips_within_50nm():
    t = _crowns(60)
    legacy = pack_crown_blobs(t, compact=False)
    comp = pack_crown_blobs(t, compact=True)
    lb = sum(b.size for b in legacy.buffers() if b)
    cb = sum(b.size for b in comp.buffers() if b)
    assert cb < 0.62 * lb  # header amortizes; verts exactly halve
    lcx, lcy, lm, (lvx, lvy, lnx, lny, llen, lst) = crown_pack_from_blob(legacy)
    ccx, ccy, cm, (cvx, cvy, cnx, cny, clen, cst) = crown_pack_from_blob(comp)
    np.testing.assert_array_equal(lcx, ccx)  # centroids stay exact f64
    np.testing.assert_array_equal(llen, clen)
    np.testing.assert_array_equal(lst, cst)
    for a, b in ((lvx, cvx), (lvy, cvy), (lnx, cnx), (lny, cny)):
        assert np.abs(a - b).max() <= 5.01e-8


def test_legacy_layout_is_exact():
    t = _crowns(30, holed=False)
    _, _, _, (vx, vy, _, _, lens, starts) = crown_pack_from_blob(
        pack_crown_blobs(t, compact=False))
    ring = t["ring"].combine_chunks().flatten()
    np.testing.assert_array_equal(vx, ring.field("x").to_numpy())
    np.testing.assert_array_equal(vy, ring.field("y").to_numpy())


def test_auto_falls_back_for_monster_reach_and_mixed_unpack():
    small = _crowns(20)
    big = _crowns(6, seed=11, holed=False, reach_max=400.0)  # > 214.7 m
    assert _fmt_bits(pack_crown_blobs(small)).all()
    assert not _fmt_bits(pack_crown_blobs(big)).any()
    with pytest.raises(ValueError, match="int32"):
        pack_crown_blobs(big, compact=True)
    mixed = pa.concat_arrays([
        pack_crown_blobs(small), pack_crown_blobs(big),
        pack_crown_blobs(_crowns(20, seed=3)),
    ])
    ref = [crown_pack_from_blob(pack_crown_blobs(t, compact=False))
           for t in (small, big, _crowns(20, seed=3))]
    ccx, ccy, multi, (vx, vy, nx, ny, lens, starts) = crown_pack_from_blob(mixed)
    np.testing.assert_array_equal(
        ccx, np.concatenate([r[0] for r in ref]))
    np.testing.assert_array_equal(
        lens, np.concatenate([r[3][4] for r in ref]))
    cat = np.concatenate
    assert np.abs(vx - cat([r[3][0] for r in ref])).max() <= 5.01e-8
    assert np.abs(ny - cat([r[3][3] for r in ref])).max() <= 5.01e-8
    # the exact-f64 rows inside the mixed column stay bit-exact
    n_small = len(ref[0][3][0])
    n_big = len(ref[1][3][0])
    np.testing.assert_array_equal(
        vx[n_small:n_small + n_big], ref[1][3][0])


def test_multi_flag_survives_both_layouts():
    t = _crowns(9, holed=False)
    m = np.array([i % 2 == 0 for i in range(9)])
    for c in (True, False):
        got = crown_pack_from_blob(pack_crown_blobs(t, multi=m, compact=c))[2]
        np.testing.assert_array_equal(got, m)
