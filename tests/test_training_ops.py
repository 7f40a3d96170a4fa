"""Training-data ops: PII/blocklist scrub, repetition stats, sequence
packing, domain-weighted sampling; plus variance / covariance /
ordered-concat relational aggregates. The sf0.001 queries also carry
exact DuckDB oracles via ``tools/check_oracles.py``; these tests pin
the semantics on crafted inputs the synthetic corpus can't exercise
(real emails/phones, planted repetition, budget-overflow docs)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _docs_ds(rows):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(rows))


def test_scrub_redacts_real_pii(ray_session):
    from geotreehealth_ray.pipelines.text import PII_PATTERNS, scrub_patterns

    rows = [
        {"doc_id": 0, "text": "mail me at jane.doe+x@example.co.uk today"},
        {"doc_id": 1, "text": "call +1 (415) 555-0199 now"},
        {"doc_id": 2, "text": "no pii here"},
        {"doc_id": 3, "text": "two: a@b.io and c.d@e.org"},
    ]
    out = (
        scrub_patterns(_docs_ds(rows), PII_PATTERNS)
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert out.loc[0, "clean_text"] == "mail me at <EMAIL> today"
    assert out.loc[0, "n_redactions"] == 1
    assert out.loc[1, "clean_text"] == "call <PHONE> now"
    assert out.loc[2, "clean_text"] == "no pii here"
    assert out.loc[2, "n_redactions"] == 0
    assert out.loc[3, "clean_text"] == "two: <EMAIL> and <EMAIL>"
    assert out.loc[3, "n_redactions"] == 2


def test_repetition_stats_planted(ray_session):
    from geotreehealth_ray.pipelines.text import repetition_stats

    rows = [
        {"doc_id": 0, "text": "a b a b a b"},   # 6 words, 2 distinct; bigram "a b" x3
        {"doc_id": 1, "text": "x"},              # single word: no bigrams
        {"doc_id": 2, "text": "p q r s"},        # all distinct, each bigram once
    ]
    out = (
        repetition_stats(_docs_ds(rows))
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert out.loc[0].tolist() == [6, 2, 5, 3]   # "b a" x2, "a b" x3 -> top 3
    assert out.loc[1].tolist() == [1, 1, 0, 0]
    assert out.loc[2].tolist() == [4, 4, 3, 1]


def test_pack_sequences_budget_and_density(ray_session):
    from geotreehealth_ray.pipelines.text import pack_sequences

    rows = [{"doc_id": i, "text": " ".join(["w"] * n)}
            for i, n in enumerate([50, 60, 40, 200, 10, 90, 30, 30, 128, 1])]
    out = pack_sequences(_docs_ds(rows), budget=128, num_buckets=2).to_pandas()
    assert len(out) == len(rows)
    for b, g in out.groupby("bucket"):
        g = g.sort_values("doc_id")
        # dense seq ids starting at 0, nondecreasing in doc order
        sids = g["seq_id"].to_numpy()
        assert sids[0] == 0
        assert set(np.diff(sids)) <= {0, 1}
        # a sequence never exceeds the budget unless it is one long doc
        for _, s in g.groupby("seq_id"):
            assert s["n_tokens"].sum() <= 128 or len(s) == 1


def test_weighted_sample_deterministic_and_bounded(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.split import weighted_sample

    docs = rd.read_parquet(f"{SF}/documents.parquet")
    kw = dict(weights={"src0": 0.25}, default=0.8,
              keep_cols=["doc_id", "source"])
    a = weighted_sample(docs, "doc_id", "source", **kw).to_pandas()
    b = weighted_sample(docs.repartition(7), "doc_id", "source", **kw).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])  # parallelism-invariant
    n_total = docs.count()
    assert 0 < len(a) < n_total
    with pytest.raises(ValueError):
        weighted_sample(docs, "doc_id", "source", weights={"src0": 1.0})


def test_grouped_variance_matches_numpy(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import grouped_variance

    li = rd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity"])
    got = grouped_variance(li, ["l_returnflag"], "l_quantity", scale=100)
    got = got.to_pandas().set_index("l_returnflag").sort_index()
    pdf = li.to_pandas()
    for flag, g in pdf.groupby("l_returnflag"):
        x = np.floor(g["l_quantity"].to_numpy() * 100 + 0.5).astype(np.int64)
        assert got.loc[flag, "n"] == len(x)
        assert got.loc[flag, "sum_scaled"] == x.sum()
        # derived micro-variance within 1 micro-unit of float sample var
        v = got.loc[flag, "var_micro"] / 1e6
        assert abs(v - np.var(x, ddof=1)) < 1e-4 * max(1.0, np.var(x, ddof=1))


def test_grouped_cov_sign_and_exactness(ray_session):
    from geotreehealth_ray.pipelines.relational import grouped_cov_stats

    # planted positive and negative covariance groups
    rows = []
    for i in range(200):
        rows.append({"k": "pos", "x": float(i), "y": float(2 * i)})
        rows.append({"k": "neg", "x": float(i), "y": float(-3 * i)})
    got = (
        grouped_cov_stats(_docs_ds(rows), ["k"], "x", "y",
                          x_scale=1, y_scale=1)
        .to_pandas().set_index("k")
    )
    assert got.loc["pos", "cov_num"] > 0
    assert got.loc["neg", "cov_num"] < 0
    x = np.arange(200, dtype=np.int64)
    n = 200
    assert got.loc["pos", "cov_num"] == n * (x * 2 * x).sum() - x.sum() * (2 * x).sum()


def test_grouped_concat_ordered(ray_session):
    from geotreehealth_ray.pipelines.relational import grouped_concat

    rows = [
        {"u": 1, "v": "c", "i": 3}, {"u": 1, "v": "a", "i": 1},
        {"u": 1, "v": "b", "i": 2}, {"u": 2, "v": "z", "i": 9},
    ]
    got = (
        grouped_concat(_docs_ds(rows), ["u"], "v", "i", alias="seq")
        .to_pandas().set_index("u").sort_index()
    )
    assert got.loc[1, "seq"] == "a,b,c"
    assert got.loc[1, "n"] == 3
    assert got.loc[2, "seq"] == "z"


def test_grouped_corr_stats_matches_numpy(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import grouped_corr_stats

    rng = np.random.default_rng(21)
    k = rng.choice(["a", "b", "c"], 600)
    x = rng.integers(0, 50, 600).astype(float)
    y = (x * 3 + rng.integers(-40, 40, 600)) / 100.0
    df = pd.DataFrame({"k": k, "x": x, "y": y})
    out = grouped_corr_stats(
        rd.from_pandas(df), ["k"], "x", "y", x_scale=1, y_scale=100
    ).to_pandas().set_index("k")
    for g, sub in df.groupby("k"):
        xi = sub["x"].to_numpy().astype(np.int64)
        yi = np.floor(sub["y"].to_numpy() * 100 + 0.5).astype(np.int64)
        n = len(sub)
        r = out.loc[g]
        assert r["n"] == n
        assert r["corr_num"] == n * (xi * yi).sum() - xi.sum() * yi.sum()
        assert r["var_x_num"] == n * (xi * xi).sum() - xi.sum() ** 2
        assert r["var_y_num"] == n * (yi * yi).sum() - yi.sum() ** 2
        # the derived correlation matches numpy's (float check)
        got = r["corr_num"] / np.sqrt(r["var_x_num"] * r["var_y_num"])
        want = np.corrcoef(xi, yi)[0, 1]
        assert abs(got - want) < 1e-12


def test_chunk_documents_windows(ray_session):
    import pandas as pd
    import ray.data as rd

    from geotreehealth_ray.pipelines.text import chunk_documents

    toks = [f"t{i}" for i in range(95)]
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [" ".join(toks), "one two", ""],
    })
    out = chunk_documents(
        rd.from_pandas(df).repartition(2), size=50, stride=40
    ).to_pandas().sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)

    d1 = out[out["doc_id"] == 1]
    # starts 0, 40, 80 — the last window is the 15-token tail
    assert list(d1["chunk_idx"]) == [0, 1, 2]
    assert list(d1["n_tokens"]) == [50, 50, 15]
    assert d1.iloc[0]["chunk_text"] == " ".join(toks[0:50])
    assert d1.iloc[2]["chunk_text"] == " ".join(toks[80:95])
    # overlap: consecutive windows share size - stride = 10 tokens
    assert d1.iloc[0]["chunk_text"].split(" ")[40:] == \
        d1.iloc[1]["chunk_text"].split(" ")[:10]
    assert list(out[out["doc_id"] == 2]["n_tokens"]) == [2]
    # empty text: split(' ') gives one empty token — one 1-token chunk
    assert list(out[out["doc_id"] == 3]["n_tokens"]) == [1]
