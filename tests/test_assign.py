"""Golden e2e for the crown-assignment PIP join: the distributed
cell-partitioned pipeline must exactly match the single-process
reference-semantics oracle (reference tree_health_detection/
utils.py:310-339, delineation_utils.py:437, utils.py:330-332)."""

import numpy as np
import pytest

import reference_impl
from geotreehealth_ray.functions import geom
from geotreehealth_ray.pipelines.assign import assign_stems_to_crowns
from geotreehealth_ray.sources import synth
from geotreehealth_ray.stages.spatial import rings_from_arrow


@pytest.fixture(scope="module")
def tiny_tables(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth")
    paths = synth.write_all(synth.TINY, str(out))
    return paths


def _load(paths, ray_session):
    import ray.data as rd

    stems = rd.read_parquet(paths["stems"])
    crowns = rd.read_parquet(paths["crowns"])
    return stems, crowns


@pytest.mark.parametrize("mode", ["owner", "halo"])
def test_assignment_matches_reference(tiny_tables, ray_session, mode):
    import pyarrow.parquet as pq

    stems, crowns = _load(tiny_tables, ray_session)
    assignment, unassigned = assign_stems_to_crowns(
        stems, crowns, res=13, mode=mode
    )
    got = assignment.to_pandas().sort_values("crown_id").reset_index(drop=True)
    got_un = set(unassigned.to_pandas()["stem_id"])

    st = pq.read_table(tiny_tables["stems"]).to_pandas()
    st = st.drop_duplicates("stem_id")
    cr = pq.read_table(tiny_tables["crowns"])
    rings = rings_from_arrow(cr["ring"])
    crd = cr.to_pandas()
    stems_map = {r.stem_id: (r.x, r.y) for r in st.itertuples()}
    crowns_map = {
        r.crown_id: (rings[i], r.cx, r.cy) for i, r in enumerate(crd.itertuples())
    }
    exp_rows, exp_un = reference_impl.assign_reference(stems_map, crowns_map)
    exp = sorted(exp_rows)

    assert len(got) == len(exp), (len(got), len(exp))
    for (gcid, gsid, gd), (ecid, esid, ed) in zip(
        got[["crown_id", "stem_id", "dist"]].itertuples(index=False), exp
    ):
        assert gcid == ecid
        assert gsid == esid, (gcid, gsid, esid)
        assert gd == pytest.approx(ed, abs=1e-9)
    assert got_un == exp_un


def test_assignment_has_multistem_and_unassigned_cases(tiny_tables, ray_session):
    """The synthetic world must actually exercise the tie-break and the
    anti-join paths (FIXTURES.md §3 invariants)."""
    import pyarrow.parquet as pq

    st = pq.read_table(tiny_tables["stems"]).to_pandas().drop_duplicates("stem_id")
    cr = pq.read_table(tiny_tables["crowns"])
    rings = rings_from_arrow(cr["ring"])
    sx, sy = st["x"].to_numpy(), st["y"].to_numpy()
    multi = 0
    for ring in rings:
        n_in = int(geom.points_in_ring(sx, sy, ring).sum())
        if n_in > 1:
            multi += 1
    assert multi >= 3  # several crowns contain >1 stem → nearest-wins used


def test_owner_mode_outlier_crown_broadcast_split(ray_session):
    """A monster crown (reach ≫ everyone else) must trigger the
    outlier broadcast split — the exchange margin shrinks to the
    quantile while the monster resolves through the broadcast join —
    and the result must still exactly match the single-process
    reference."""
    import pandas as pd
    import ray.data as rd

    import geotreehealth_ray.pipelines.assign as A

    rng = np.random.default_rng(9)
    n = 4000
    sx = rng.uniform(0, 400, n)
    sy = rng.uniform(0, 400, n)
    stems = pd.DataFrame({"stem_id": [f"s{i:05d}" for i in range(n)],
                          "x": sx, "y": sy})

    def square(cx, cy, r):
        return np.array([[cx - r, cy - r], [cx + r, cy - r],
                         [cx + r, cy + r], [cx - r, cy + r]])

    rings, rows = [], []
    for i in range(300):
        cx, cy = rng.uniform(20, 380, 2)
        r = rng.uniform(1.5, 4.0)
        ring = square(cx, cy, r)
        rings.append(ring)
        rows.append(("c%04d" % i, cx, cy, ring))
    # the monster: covers a quarter of the world
    ring = square(200.0, 200.0, 100.0)
    rings.append(ring)
    rows.append(("monster", 200.0, 200.0, ring))

    crowns = pd.DataFrame({
        "crown_id": [r[0] for r in rows],
        "ring": [[{"x": float(x), "y": float(y)} for x, y in r[3]]
                 for r in rows],
        "cx": [r[1] for r in rows], "cy": [r[2] for r in rows],
        "minx": [r[3][:, 0].min() for r in rows],
        "miny": [r[3][:, 1].min() for r in rows],
        "maxx": [r[3][:, 0].max() for r in rows],
        "maxy": [r[3][:, 1].max() for r in rows],
    })
    # the split condition must hold on this input (monster ≫ q)
    sds = rd.from_pandas(stems)
    cds = rd.from_pandas(crowns)
    mx, my, qx, qy = A._reach_stats(cds)
    assert mx == 100.0 and qx <= A._REACH_SPLIT_RATIO * mx
    big = A._collect_big_crowns(cds, qx, qy)
    # the quantile comes from a hash sample — coarse at 301 crowns —
    # but the monster is always in the big set and the set stays small
    assert 1 <= len(big) <= 100 and "monster" in big["crown_id"].to_pylist()

    assignment, unassigned = assign_stems_to_crowns(sds, cds, mode="owner")
    got = assignment.to_pandas().sort_values("crown_id").reset_index(drop=True)
    got_un = set(unassigned.to_pandas()["stem_id"])

    stems_map = {r.stem_id: (r.x, r.y) for r in stems.itertuples()}
    crowns_map = {rows[i][0]: (rings[i], rows[i][1], rows[i][2])
                  for i in range(len(rows))}
    exp_rows, exp_un = reference_impl.assign_reference(stems_map, crowns_map)
    exp = sorted(exp_rows)
    assert len(got) == len(exp)
    for (gcid, gsid, gd), (ecid, esid, ed) in zip(
        got[["crown_id", "stem_id", "dist"]].itertuples(index=False), exp
    ):
        assert (gcid, gsid) == (ecid, esid)
        assert gd == pytest.approx(ed, abs=1e-9)
    assert got_un == exp_un
    # the monster itself won its nearest stem through the broadcast path
    assert "monster" in set(got["crown_id"])
