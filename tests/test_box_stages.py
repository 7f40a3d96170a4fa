"""Box transform stages (reference delineation_pipeline.py:80-93:
y-flip detector boxes → translate to CRS → bbox polygons)."""

import numpy as np
import pyarrow as pa

from geotreehealth_ray.stages import spatial


def _boxes():
    return pa.table(
        {
            "image_id": pa.array(["i0", "i0"]),
            "xmin": pa.array([10.0, 0.0]),
            "ymin": pa.array([20.0, 5.0]),
            "xmax": pa.array([30.0, 8.0]),
            "ymax": pa.array([50.0, 9.0]),
            "h": pa.array([100, 100], pa.int64()),
        }
    )


def test_flip_boxes_y():
    out = spatial.flip_boxes_y(_boxes())
    assert out["ymin"].to_pylist() == [50.0, 91.0]
    assert out["ymax"].to_pylist() == [80.0, 95.0]
    # still valid boxes
    assert all(
        lo < hi for lo, hi in zip(out["ymin"].to_pylist(), out["ymax"].to_pylist())
    )


def test_boxes_to_world_with_y_flip_affine():
    # affine of a 0.1 m raster anchored at (1000, 2000), y-down rows
    out = spatial.boxes_to_world(_boxes(), a=0.1, b=0.0, c=1000.0,
                                 d=0.0, e=-0.1, f=2000.0)
    assert out["minx"].to_pylist() == [1001.0, 1000.0]
    assert out["maxx"].to_pylist() == [1003.0, 1000.8]
    # y flipped: larger pixel row → smaller world y
    assert out["miny"].to_pylist() == [1995.0, 1999.1]
    np.testing.assert_allclose(out["maxy"].to_pylist(), [1998.0, 1999.5])


def test_bbox_to_ring_area():
    from geotreehealth_ray.functions import geom
    from geotreehealth_ray.stages.spatial import rings_from_arrow

    world = spatial.boxes_to_world(_boxes(), 0.1, 0, 1000.0, 0, -0.1, 2000.0)
    ringed = spatial.bbox_to_ring(world)
    rings = rings_from_arrow(ringed["ring"])
    assert geom.ring_area(rings[0]) == (1003.0 - 1001.0) * (1998.0 - 1995.0)
