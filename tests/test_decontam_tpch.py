"""Decontamination kernel golden + brute-force equality, plus smoke
coverage for the Q4/Q5/Q12-style compositions (their exact SQL oracles
in __ray_entry__ gate full-table behavior at sf0.01)."""

import pandas as pd
import pytest


def _brute_contaminated(train: pd.DataFrame, bench: pd.DataFrame,
                        n: int) -> set:
    def grams(text):
        w = text.split(" ")
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    vocab = set()
    for t in bench["text"]:
        vocab |= grams(t)
    return {
        int(r.doc_id) for r in train.itertuples()
        if grams(r.text) & vocab
    }


def test_decontaminate_planted(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.text import decontaminate

    shared = "alpha beta gamma delta epsilon zeta"  # a full 6-gram
    train = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            f"noise one two {shared} trailing words here",
            "totally unrelated words with no overlap at all",
            f"{shared}",  # exactly the contaminated gram
            "alpha beta gamma delta epsilon",  # only 5 shared words
        ],
    })
    bench = pd.DataFrame({
        "doc_id": [100],
        "text": f"prefix {shared} suffix tokens",
    })
    out = decontaminate(
        rd.from_pandas(train), rd.from_pandas(bench), n=6
    ).to_pandas()
    assert set(out["doc_id"]) == {1, 3}
    assert set(out["doc_id"]) == _brute_contaminated(train, bench, 6)


def test_decontaminate_random_matches_brute(ray_session):
    import numpy as np
    import ray.data as rd

    from geotreehealth_ray.pipelines.text import decontaminate

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(12)]

    def doc():
        return " ".join(rng.choice(vocab, int(rng.integers(3, 20))))

    train = pd.DataFrame({
        "doc_id": range(60), "text": [doc() for _ in range(60)]
    })
    bench = pd.DataFrame({
        "doc_id": range(100, 110), "text": [doc() for _ in range(10)]
    })
    for n in (2, 3):
        out = decontaminate(
            rd.from_pandas(train), rd.from_pandas(bench), n=n
        ).to_pandas()
        assert set(out["doc_id"].astype(int)) == _brute_contaminated(
            train, bench, n
        )


def _entry_mod():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_mod", "/root/repo/__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("qname", ["q4_priority", "q12_shipmode"])
def test_tpch_compositions_smoke(ray_session, qname, tmp_path):
    """Tiny-sf smoke: runs end-to-end with a stable schema. (Exact
    value equality vs DuckDB is the driver's oracle gate.)"""
    res = _entry_mod().queries()[qname]("/root/testdata/sf0.001")
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert len(df) >= 1


@pytest.mark.parametrize("qname", [
    "q7_nation_volume", "q10_returned", "q14_promo", "q16_supplier_cnt",
    "q18_large_volume", "q19_disjunct", "q22_idle_customers",
])
def test_tpch_compositions_match_duckdb(ray_session, qname):
    """Exact value equality vs the query's own DuckDB oracle at
    sf0.001 (the driver re-runs the same gate at sf0.01)."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    mod = _entry_mod()
    res = mod.queries()[qname](sf)
    got = res.to_pandas() if hasattr(res, "to_pandas") else res

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    want = con.execute(mod.oracle_sql()[qname]).df()

    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(
            list(df.columns), kind="stable"
        ).reset_index(drop=True)

    got, want = norm(got), norm(want)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) >= 1
    for c in got.columns:
        assert (
            got[c].astype(str).to_numpy() == want[c].astype(str).to_numpy()
        ).all(), c
