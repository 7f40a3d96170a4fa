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
