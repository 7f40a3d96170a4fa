"""Geo-format adapter layer: GeoJSON + WKB are real (dependency-free),
GPKG/GeoTIFF/LAZ are gated seams (reference delineation_pipeline.py:
63-64, store_data_structures.py:42-55)."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geotreehealth_ray.functions import geom
from geotreehealth_ray.sources import geoformats as gf


def _write_geojson_file(path, feats):
    with open(path, "w") as fh:
        json.dump({"type": "FeatureCollection", "features": feats}, fh)


def _square(x0, y0, s):
    return [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]]


def test_geojson_dir_concat_reader(ray_session, tmp_path):
    d = tmp_path / "vec"
    d.mkdir()
    _write_geojson_file(d / "a.geojson", [
        {"type": "Feature", "properties": {"id": "c1", "status": "A"},
         "geometry": {"type": "Polygon", "coordinates": [_square(0, 0, 10)]}},
        {"type": "Feature", "properties": {"id": "c2", "status": "DS"},
         "geometry": {"type": "MultiPolygon", "coordinates": [
             [_square(20, 0, 4)], [_square(30, 0, 6)]]}},
    ])
    _write_geojson_file(d / "b.geojson", [
        {"type": "Feature", "properties": {"id": "c3"},
         "geometry": {"type": "Polygon", "coordinates": [_square(50, 50, 2)]}},
    ])
    out = gf.read_vector(str(d)).to_pandas().sort_values(
        ["crown_id", "area"]).reset_index(drop=True)
    # c2's MultiPolygon explodes to two ring rows (dir concat: 4 rows)
    assert list(out["crown_id"]) == ["c1", "c2", "c2", "c3"]
    assert out["area"].tolist() == [100.0, 16.0, 36.0, 4.0]
    assert out.loc[0, "cx"] == 5.0 and out.loc[0, "cy"] == 5.0
    assert out.loc[3, "minx"] == 50.0 and out.loc[3, "maxy"] == 52.0
    assert out.loc[0, "status"] == "A"
    assert out.loc[3, "status"] is None or out.loc[3, "status"] != out.loc[3, "status"]  # missing prop → null


def test_geojson_writer_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    d = tmp_path / "vec"
    d.mkdir()
    _write_geojson_file(d / "a.geojson", [
        {"type": "Feature", "properties": {"id": f"c{i}"},
         "geometry": {"type": "Polygon",
                      "coordinates": [_square(10 * i, 0, 5)]}}
        for i in range(6)
    ])
    ds = gf.read_vector(str(d))
    out_dir = tmp_path / "out"
    n = gf.write_geojson(ds.repartition(3), str(out_dir))
    assert n == 6
    back = gf.read_vector(str(out_dir)).to_pandas().sort_values("crown_id")
    assert list(back["crown_id"]) == [f"c{i}" for i in range(6)]
    assert (back["area"] == 25.0).all()


def test_wkb_roundtrip_and_parquet_decode(ray_session, tmp_path):
    ring = np.array([[0, 0], [8, 0], [8, 4], [0, 4]], float)
    buf = gf.rings_to_wkb(ring)
    rings = gf.parse_wkb_rings(buf)
    assert len(rings) == 1
    np.testing.assert_array_equal(rings[0], ring)

    # big-endian multipolygon with a hole (hole skipped)
    import struct
    def be_poly(rings_):
        out = struct.pack(">BII", 0, 3, len(rings_))
        for r in rings_:
            closed = np.vstack([r, r[:1]])
            out += struct.pack(">I", len(closed))
            out += closed.astype(">f8").tobytes()
        return out
    hole = np.array([[2, 1], [4, 1], [4, 2], [2, 2]], float)
    mp = struct.pack(">BII", 0, 6, 2) + be_poly([ring, hole]) + be_poly([ring + 100])
    got = gf.parse_wkb_rings(mp)
    assert len(got) == 2  # exteriors only
    np.testing.assert_array_equal(got[0], ring)
    np.testing.assert_array_equal(got[1], ring + 100)

    # GeoParquet-ish table: geometry column decodes to ring rows
    t = pa.table({
        "crown_id": pa.array(["a", "b"]),
        "geometry": pa.array([gf.rings_to_wkb(ring), gf.rings_to_wkb(ring + 50)],
                             pa.binary()),
    })
    p = tmp_path / "geo.parquet"
    pq.write_table(t, p)
    out = gf.read_vector(str(p)).to_pandas().sort_values("crown_id")
    assert list(out["crown_id"]) == ["a", "b"]
    assert (out["area"] == 32.0).all()
    assert out.iloc[1]["minx"] == 50.0


def test_gated_formats_fail_loudly(tmp_path):
    for name, fn in (("x.tif", gf.read_raster),
                     ("x.laz", gf.read_lidar)):
        p = tmp_path / name
        p.write_bytes(b"\x00")
        with pytest.raises(NotImplementedError, match="requires"):
            fn(str(p))


def test_wkb_holes_roundtrip():
    # donut: 10x10 exterior with a 2x1 hole → net area 100 - 2 = 98
    ext = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    hole = np.array([[2, 1], [4, 1], [4, 2], [2, 2]], float)
    buf = gf.rings_to_wkb(ext, holes=[hole])
    polys = gf.parse_wkb_polygons(buf)
    assert len(polys) == 1
    got_ext, got_holes = polys[0]
    np.testing.assert_array_equal(got_ext, ext)
    assert len(got_holes) == 1
    np.testing.assert_array_equal(got_holes[0], hole)
    assert geom.polygon_area_with_holes(got_ext, got_holes) == 98.0
    # hole-aware PIP: interior of hole is out, hole boundary is in
    px = np.array([3.0, 3.0, 2.0, 5.0, 11.0])
    py = np.array([1.5, 0.5, 1.0, 5.0, 5.0])
    inside = geom.points_in_polygon_with_holes(px, py, got_ext, got_holes)
    assert inside.tolist() == [False, True, True, True, False]
    # back-compat wrapper still returns exteriors only
    np.testing.assert_array_equal(gf.parse_wkb_rings(buf)[0], ext)


def test_gpkg_header_strip_variants():
    ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float)
    wkb = gf.rings_to_wkb(ring)
    # no envelope
    assert gf.strip_gpkg_header(gf.make_gpkg_blob(wkb)) == wkb
    # with a 32-byte XY envelope (indicator 1)
    import struct
    blob = (b"GP" + struct.pack("<BBi", 0, 0x03, 4326)
            + struct.pack("<4d", 0, 4, 0, 4) + wkb)
    assert gf.strip_gpkg_header(blob) == wkb
    # bare WKB passes through (lenient)
    assert gf.strip_gpkg_header(wkb) == wkb
    # empty-geometry flag → b""
    empty = b"GP" + struct.pack("<BBi", 0, 0x11, 0) + wkb
    assert gf.strip_gpkg_header(empty) == b""


def test_gpkg_write_read_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    ext = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    hole = np.array([[2, 1], [4, 1], [4, 2], [2, 2]], float)
    rows = []
    for i in range(5):
        off = 20.0 * i
        rows.append({
            "crown_id": f"c{i}",
            "ring": [{"x": float(x + off), "y": float(y)} for x, y in ext],
            "holes": ([[{"x": float(x + off), "y": float(y)}
                        for x, y in hole]] if i == 2 else []),
        })
    ds = rd.from_items(rows)
    out = tmp_path / "merged.gpkg"
    n = gf.write_gpkg(ds, str(out))
    assert n == 5
    back = gf.read_vector(str(out)).to_pandas().sort_values(
        "crown_id").reset_index(drop=True)
    assert list(back["crown_id"]) == [f"c{i}" for i in range(5)]
    # c2 is the donut: net area 98; everyone else 100
    assert back["area"].tolist() == [100.0, 100.0, 98.0, 100.0, 100.0]
    assert back.loc[2, "minx"] == 40.0 and back.loc[2, "maxx"] == 50.0
    # dir-of-gpkg concat works like the GeoJSON dir reader
    d = tmp_path / "gdir"
    d.mkdir()
    gf.write_gpkg(ds.filter(lambda r: r["crown_id"] < "c2"), str(d / "a.gpkg"))
    gf.write_gpkg(ds.filter(lambda r: r["crown_id"] >= "c2"), str(d / "b.gpkg"))
    both = gf.read_vector(str(d)).to_pandas()
    assert sorted(both["crown_id"]) == [f"c{i}" for i in range(5)]


def test_las_write_read_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(3)
    n = 5000
    df = {
        "x": np.round(rng.uniform(1000, 1200, n), 3),
        "y": np.round(rng.uniform(5000, 5100, n), 3),
        "z": np.round(rng.uniform(0, 40, n), 3),
        "intensity": rng.integers(0, 4096, n).astype(np.uint16),
        "classification": rng.integers(0, 6, n).astype(np.uint8),
        "gps_time": rng.uniform(0, 1e6, n),
    }
    import pandas as pd
    ds = rd.from_pandas(pd.DataFrame(df))
    p = tmp_path / "cloud.las"
    assert gf.write_las(ds, str(p)) == n

    hdr = gf.read_las_header(str(p))
    assert hdr["format"] == 1 and hdr["count"] == n and not hdr["compressed"]

    back = gf.read_lidar(str(p)).to_pandas()
    assert len(back) == n
    # mm quantization grid → exact for 3-decimal inputs
    np.testing.assert_allclose(np.sort(back["x"]), np.sort(df["x"]),
                               atol=5e-4)
    assert back["intensity"].sum() == int(df["intensity"].sum())
    assert sorted(back.columns[:3]) == ["x", "y", "z"]

    # chunked fan-out reads the same rows (force tiny chunks)
    old = gf._LAS_CHUNK_POINTS
    gf._LAS_CHUNK_POINTS = 1024
    try:
        chunked = gf.read_lidar(str(p)).to_pandas()
    finally:
        gf._LAS_CHUNK_POINTS = old
    assert len(chunked) == n
    assert np.isclose(chunked["z"].sum(), back["z"].sum())

    # point-format-3 with RGB decodes through the same dtype table
    t3 = gf.parse_las_points(str(p), start=100, count=50)
    assert len(t3) == 50

    # LAZ flag (bit 7 of the format byte) gates loudly
    data = bytearray(p.read_bytes())
    data[104] |= 0x80
    pz = tmp_path / "cloud2.las"
    pz.write_bytes(bytes(data))
    with pytest.raises(NotImplementedError, match="laszip"):
        gf.parse_las_points(str(pz))


def test_parquet_passthrough_matches_native_read(ray_session, tmp_path):
    import ray.data as rd

    t = pa.table({"x": pa.array([1.0, 2.0]), "y": pa.array([3.0, 4.0]),
                  "z": pa.array([5.0, 6.0])})
    p = tmp_path / "pts.parquet"
    pq.write_table(t, p)
    a = gf.read_lidar(str(p)).to_pandas()
    b = rd.read_parquet(str(p)).to_pandas()
    assert a.equals(b)
