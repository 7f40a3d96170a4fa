"""tools/independent_oracle.py — the from-scratch y-slab geometry
oracle that replaced the goldenref distribution goldens for the NMS /
delineation composites (VERDICT r4 #6). Its whole value is
INDEPENDENCE from the engine's kernels, so that is asserted here,
plus agreement of the two algorithms on adversarial simple polygons.
"""

import importlib.util
import os

import numpy as np
import pytest

from geotreehealth_ray.functions import geom

_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "independent_oracle.py")


def _load():
    spec = importlib.util.spec_from_file_location("independent_oracle",
                                                  _PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_no_engine_imports():
    import ast

    tree = ast.parse(open(_PATH).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            assert not any("geotreehealth" in a.name for a in node.names)
        if isinstance(node, ast.ImportFrom):
            assert "geotreehealth" not in (node.module or "")
    mod = _load()  # also importable without the package on sys.path
    assert hasattr(mod, "greedy_nms")


def test_slab_area_agrees_with_engine_on_stars():
    """Two structurally different exact algorithms (y-slab trapezoids
    vs signed fan-triangle clipping) must agree to float rounding on
    arbitrary simple star polygons."""
    mod = _load()
    rng = np.random.default_rng(11)
    for _ in range(60):
        cx, cy = rng.uniform(0, 50, 2)
        a = geom.make_star_ring(cx, cy, rng.uniform(3, 9),
                                int(rng.integers(5, 17)),
                                int(rng.integers(1 << 30)))
        b = geom.make_star_ring(cx + rng.uniform(-6, 6),
                                cy + rng.uniform(-6, 6),
                                rng.uniform(3, 9),
                                int(rng.integers(5, 17)),
                                int(rng.integers(1 << 30)))
        i1 = mod.intersection_area(a, b)
        i2 = geom.intersection_area_star(a, b)
        assert i1 == pytest.approx(i2, abs=1e-7)


def test_slab_area_exact_cases():
    mod = _load()
    sq = lambda x1, y1, x2, y2: np.array(
        [[x1, y1], [x2, y1], [x2, y2], [x1, y2]], float)
    assert mod.intersection_area(sq(0, 0, 4, 4), sq(2, 2, 6, 6)) == 4.0
    assert mod.intersection_area(sq(0, 0, 4, 4), sq(4, 0, 8, 4)) == 0.0
    # non-convex L-shape vs square (exercises multi-interval slabs)
    L = np.array([[0, 0], [6, 0], [6, 2], [2, 2], [2, 6], [0, 6]], float)
    # bottom bar strip (y 1..2, x 1..5) = 4 + left column (y 2..5,
    # x 1..2) = 3; cross-checked against the engine's fan clipping
    got = mod.intersection_area(L, sq(1, 1, 5, 5))
    assert got == pytest.approx(7.0)
    assert got == pytest.approx(
        geom.intersection_area_star(L, sq(1, 1, 5, 5)))
    assert mod.shoelace(L) == 20.0


def test_independent_nms_tiny():
    import pandas as pd

    mod = _load()
    ring = lambda x1, y1, x2, y2: [
        {"x": x1, "y": y1}, {"x": x2, "y": y1},
        {"x": x2, "y": y2}, {"x": x1, "y": y2}]
    df = pd.DataFrame({
        "crown_id": ["c_1", "c_2", "c_3"],
        "ring": [ring(0, 0, 10, 10), ring(1, 1, 9, 9),
                 ring(20, 20, 24, 24)],
        "score": [3.0, 2.0, 1.0],
    })
    out = mod.greedy_nms(df, threshold=0.3).set_index("crown_id")
    assert bool(out.loc["c_1", "selected"]) is True
    assert bool(out.loc["c_2", "selected"]) is False  # 64/100 > 0.3
    assert bool(out.loc["c_3", "selected"]) is True
