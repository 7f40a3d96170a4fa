"""Edge-shape robustness: every core relational op on EMPTY and
single-row inputs — the shapes a sparse filter hands every operator in
production (two real empty-input crashes were found this way:
heavy_hitters' empty-candidate concat and salted_join's empty
hot-set)."""

import numpy as np
import pandas as pd
import pytest


def _empty():
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({
        "k": pd.Series([], dtype=np.int64),
        "v": pd.Series([], dtype=np.int64),
        "id": pd.Series([], dtype=np.int64),
    }))


def _one():
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({
        "k": [3], "v": [7], "id": [1],
    }))


def test_grouped_aggs_on_edge_shapes(ray_session):
    from geotreehealth_ray.pipelines.relational import (
        distinct_count,
        grouped_agg,
        grouped_median,
        grouped_quantile,
        grouped_quantile_cont,
    )

    for mk, n in ((_empty, 0), (_one, 1)):
        assert len(grouped_agg(mk(), ["k"], {"s": "v"}).to_pandas()) == n
        assert len(grouped_median(mk(), "k", "v").to_pandas()) == n
        assert len(grouped_quantile(mk(), "k", "v", 1, 2).to_pandas()) == n
        assert len(
            grouped_quantile_cont(mk(), "k", "v", 1, 2).to_pandas()
        ) == n
        assert len(distinct_count(mk(), "k", "v").to_pandas()) == n


def test_joins_on_edge_shapes(ray_session):
    from geotreehealth_ray.pipelines.relational import hash_join

    for how in ("inner", "left", "outer", "semi", "anti"):
        out = hash_join(_empty(), _one(), on="k", how=how).to_pandas()
        expect = 1 if how == "outer" else 0
        assert len(out) == expect, how
        out = hash_join(_one(), _empty(), on="k", how=how).to_pandas()
        expect = 0 if how in ("inner", "semi") else 1
        assert len(out) == expect, how
        out = hash_join(_empty(), _empty(), on="k", how=how).to_pandas()
        assert len(out) == 0, how


def test_windows_and_topk_on_edge_shapes(ray_session):
    from geotreehealth_ray.pipelines.relational import (
        global_topk,
        group_ranks,
        topk_per_group,
    )

    assert len(global_topk(_empty(), "v", "id", 5).to_pandas()) == 0
    assert len(global_topk(_one(), "v", "id", 5).to_pandas()) == 1
    assert len(topk_per_group(_empty(), "k", "v", "id", 3).to_pandas()) == 0
    assert len(topk_per_group(_one(), "k", "v", "id", 3).to_pandas()) == 1
    assert len(group_ranks(_empty(), "k", "v", ["id"]).to_pandas()) == 0
    assert len(group_ranks(_one(), "k", "v", ["id"]).to_pandas()) == 1


def test_sketches_on_edge_shapes(ray_session):
    from geotreehealth_ray.pipelines.sketch import (
        bloom_words,
        cms_cells,
        equidepth_histogram,
        heavy_hitters,
        hll_registers,
        hll_registers_by_key,
    )

    assert len(heavy_hitters(_empty(), "v", 0.1).to_pandas()) == 0
    assert len(hll_registers(_empty(), "v").to_pandas()) == 0
    assert len(hll_registers(_one(), "v").to_pandas()) == 1
    assert len(hll_registers_by_key(_empty(), "k", "v").to_pandas()) == 0
    assert len(hll_registers_by_key(_one(), "k", "v").to_pandas()) == 1
    assert len(bloom_words(_empty(), "v").to_pandas()) == 0
    assert len(cms_cells(_empty(), "v").to_pandas()) == 0
    assert len(equidepth_histogram(_empty(), "id", "v").to_pandas()) == 0
    one = equidepth_histogram(_one(), "id", "v").to_pandas()
    assert len(one) == 1 and int(one["cum_count"].iloc[0]) == 1


def test_dedup_and_setops_on_edge_shapes(ray_session):
    from geotreehealth_ray.pipelines.relational import set_op, set_op_all

    for op in ("intersect", "except_", "union"):
        kw = {"op": op.rstrip("_")}
        out = set_op(_empty(), _one(), **kw).to_pandas()
        if op == "union":
            assert len(out) == 1
        else:
            assert len(out) == 0 if op == "intersect" else len(out) == 0
    assert len(set_op_all(_one(), _empty(), op="except_all").to_pandas()) == 1
    assert len(set_op_all(_empty(), _one(), op="intersect_all").to_pandas()) == 0


def _empty_docs():
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({
        "doc_id": pd.Series([], dtype=np.int64),
        "text": pd.Series([], dtype=str),
    }))


def _one_doc():
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({
        "doc_id": [1], "text": ["alpha beta gamma delta"],
    }))


def test_text_ops_on_edge_shapes(ray_session):
    from geotreehealth_ray.pipelines.text import (
        chunk_documents,
        duplicate_ngrams,
        fingerprints,
        normalize_text,
        term_stats,
        token_counts,
    )

    for mk, n in ((_empty_docs, 0), (_one_doc, 1)):
        assert len(token_counts(mk()).to_pandas()) == n
        assert len(fingerprints(mk()).to_pandas()) == n
        assert len(normalize_text(mk()).to_pandas()) == n
        assert len(chunk_documents(mk(), size=3, stride=2).to_pandas()) \
            == (0 if n == 0 else 2)
        assert len(term_stats(mk(), min_df=1).to_pandas()) \
            == (0 if n == 0 else 4)
        assert len(duplicate_ngrams(mk(), n=2).to_pandas()) == 0


def test_dedup_ops_on_edge_shapes(ray_session):
    from geotreehealth_ray.pipelines.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_pairs,
    )

    for mk, n in ((_empty_docs, 0), (_one_doc, 1)):
        assert len(exact_dedup(mk()).to_pandas()) == n
        assert len(minhash_lsh_pairs(mk()).to_pandas()) == 0
        assert len(simhash_pairs(mk()).to_pandas()) == 0
        assert len(ngram_jaccard_pairs(mk()).to_pandas()) == 0


def test_spatial_ops_on_edge_shapes(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.assign import assign_stems_to_crowns
    from geotreehealth_ray.pipelines.knn import knn_points

    stems = rd.from_pandas(pd.DataFrame({
        "stem_id": pd.Series([], dtype=str),
        "x": pd.Series([], dtype=np.float64),
        "y": pd.Series([], dtype=np.float64),
    }))
    crowns = rd.from_pandas(pd.DataFrame({
        "crown_id": pd.Series([], dtype=str),
        "minx": pd.Series([], dtype=np.float64),
        "miny": pd.Series([], dtype=np.float64),
        "maxx": pd.Series([], dtype=np.float64),
        "maxy": pd.Series([], dtype=np.float64),
        "ring": pd.Series([], dtype=object),
    }))
    assigned, unassigned = assign_stems_to_crowns(stems, crowns)
    assert assigned.count() == 0 and unassigned.count() == 0
    assert knn_points(stems, k=2).count() == 0


def _events(n):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({
        "event_id": pd.Series(range(n), dtype=np.int64),
        "user_id": pd.Series([1] * n, dtype=np.int64),
        "ts": pd.Series(
            pd.to_datetime(np.arange(n) * 10**9 + 1_700_000_000 * 10**9)),
        "event_type": pd.Series(["view"] * n, dtype=str),
        "value": pd.Series([1.0] * n, dtype=np.float64),
    }).head(n))


def test_window_ops_on_edge_shapes(ray_session):
    from geotreehealth_ray.pipelines.relational import (
        asof_join,
        hopping_window_agg,
        hourly_window_agg,
        lag_delta,
        sessionize,
    )

    for n in (0, 1):
        assert len(hourly_window_agg(_events(n)).to_pandas()) == n
        assert len(hopping_window_agg(_events(n)).to_pandas()) == \
            (0 if n == 0 else 4)
        assert len(sessionize(_events(n)).to_pandas()) == n
        assert len(lag_delta(_events(n)).to_pandas()) == 0
        assert len(
            asof_join(_events(n), _events(n)).to_pandas()
        ) in (0, n)


def test_rollup_pivot_on_edge_shapes(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import (
        pivot_counts,
        rollup_sum,
        unpivot,
    )

    df = pd.DataFrame({
        "a": pd.Series([], dtype=str),
        "b": pd.Series([], dtype=str),
        "v": pd.Series([], dtype=np.float64),
    })
    empty = rd.from_pandas(df)
    # SQL ROLLUP on an empty table still emits the () grouping set:
    # one grand-total row (NULL, NULL, NULL, 0) — DuckDB-verified
    r = rollup_sum(empty, ["a", "b"], "v").to_pandas()
    assert len(r) == 1 and int(r["n"].iloc[0]) == 0
    assert len(
        pivot_counts(empty, "a", "b", ["x", "y"]).to_pandas()
    ) == 0
    one = rd.from_pandas(pd.DataFrame({
        "a": ["p"], "b": ["x"], "v": [2.0],
    }))
    # rollup of one row: finest + per-a + grand total
    assert len(rollup_sum(one, ["a", "b"], "v").to_pandas()) == 3
    assert len(unpivot(one, ["a"], ["v"]).to_pandas()) == 1
