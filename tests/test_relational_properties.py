"""Property-based differential tests (hypothesis) for the core
relational exchanges: hash_join / grouped_agg / set_op compared against
pandas on generated tables — duplicate keys, disjoint key ranges,
single rows, skewed multiplicities. Complements the fixed-corpus
DuckDB oracle gate with adversarial SHAPES."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

keys = st.lists(st.integers(min_value=-3, max_value=6),
                min_size=1, max_size=25)


def _mk(ks, tag):
    return pd.DataFrame({
        "k": np.array(ks, np.int64),
        tag: np.arange(len(ks), dtype=np.int64),
    })


@settings(max_examples=12, deadline=None)
@given(lk=keys, rk=keys, how=st.sampled_from(
    ["inner", "left", "outer", "semi", "anti"]))
def test_hash_join_matches_pandas(ray_session, lk, rk, how):
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import hash_join

    left, right = _mk(lk, "lv"), _mk(rk, "rv")
    got = hash_join(
        rd.from_pandas(left).repartition(3),
        rd.from_pandas(right).repartition(2), on="k", how=how,
    ).to_pandas()
    if how in ("semi", "anti"):
        inr = left["k"].isin(set(rk))
        want = left[inr if how == "semi" else ~inr]
        assert len(got) == len(want)
        if len(want):  # Ray drops column metadata on empty results
            assert sorted(got["lv"]) == sorted(want["lv"])
        return
    want = left.merge(right, on="k", how=how)
    assert len(got) == len(want)
    if len(want) == 0:  # Ray drops column metadata on empty results
        return
    g = got.sort_values(["k", "lv", "rv"], na_position="last",
                        kind="stable").reset_index(drop=True)
    w = want.sort_values(["k", "lv", "rv"], na_position="last",
                         kind="stable").reset_index(drop=True)
    for c in ("k", "lv", "rv"):
        assert (
            g[c].fillna(-99).to_numpy() == w[c].fillna(-99).to_numpy()
        ).all(), c


@settings(max_examples=12, deadline=None)
@given(ks=keys, vs=st.data())
def test_grouped_agg_matches_pandas(ray_session, ks, vs):
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import grouped_agg

    v = vs.draw(st.lists(
        st.integers(min_value=-10**6, max_value=10**6),
        min_size=len(ks), max_size=len(ks)))
    df = pd.DataFrame({"k": np.array(ks, np.int64),
                       "v": np.array(v, np.int64)})
    got = grouped_agg(
        rd.from_pandas(df).repartition(3), ["k"], {"s": "v"},
        count_alias="n",
    ).to_pandas().sort_values("k").reset_index(drop=True)
    want = df.groupby("k", as_index=False).agg(
        s=("v", "sum"), n=("v", "size")).sort_values("k").reset_index(drop=True)
    assert (got["k"].to_numpy() == want["k"].to_numpy()).all()
    assert (got["s"].to_numpy() == want["s"].to_numpy()).all()
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()


@settings(max_examples=10, deadline=None)
@given(lk=keys, rk=keys, op=st.sampled_from(
    ["intersect", "except", "union"]))
def test_set_ops_match_python_sets(ray_session, lk, rk, op):
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import set_op

    left = pd.DataFrame({"k": np.array(lk, np.int64)})
    right = pd.DataFrame({"k": np.array(rk, np.int64)})
    got = set_op(
        rd.from_pandas(left).repartition(2),
        rd.from_pandas(right).repartition(3), op=op,
    ).to_pandas()
    a, b = set(lk), set(rk)
    want = {"intersect": a & b, "except": a - b, "union": a | b}[op]
    assert len(got) == len(want)
    if want:  # Ray drops column metadata on empty results
        assert set(got["k"]) == want
