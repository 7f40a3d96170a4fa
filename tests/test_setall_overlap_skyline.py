"""Bag set ops, interval-overlap join, skyline, cohort retention and
duplicate n-grams — brute-force equality on small random inputs plus
hand goldens. (Exact SQL oracles in __ray_entry__ gate sf0.01.)"""

import numpy as np
import pandas as pd


def test_set_op_all_bruteforce(ray_session):
    import ray.data as rd
    from collections import Counter

    from geotreehealth_ray.pipelines.relational import set_op_all

    rng = np.random.default_rng(11)
    a = rng.integers(0, 20, 300)
    b = rng.integers(0, 20, 250)
    la = rd.from_pandas(pd.DataFrame({"k": a})).repartition(3)
    lb = rd.from_pandas(pd.DataFrame({"k": b})).repartition(4)
    ca, cb = Counter(a.tolist()), Counter(b.tolist())

    got = Counter(set_op_all(la, lb, "intersect_all").to_pandas()["k"])
    want = Counter({k: min(ca[k], cb[k]) for k in ca if min(ca[k], cb[k])})
    assert got == want

    got = Counter(set_op_all(la, lb, "except_all").to_pandas()["k"])
    want = Counter({k: ca[k] - cb[k] for k in ca if ca[k] - cb[k] > 0})
    assert got == want


def test_interval_overlap_bruteforce(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import interval_overlap_pairs

    rng = np.random.default_rng(5)
    n = 400
    df = pd.DataFrame({
        "k": rng.integers(0, 12, n),
        "s": rng.integers(0, 1000, n).astype(np.int64),
        "rid": np.arange(n, dtype=np.int64),
    })
    df["e"] = df["s"] + rng.integers(0, 60, n)
    got = interval_overlap_pairs(
        rd.from_pandas(df).repartition(4), "k", "s", "e", "rid"
    ).to_pandas()
    got_pairs = set(zip(got["id_a"], got["id_b"]))
    want = set()
    rows = df.to_numpy()
    for i in range(n):
        for j in range(i + 1, n):
            ki, si, ri, ei = rows[i]
            kj, sj, rj, ej = rows[j]
            if ki == kj and si <= ej and sj <= ei:
                want.add((min(ri, rj), max(ri, rj)))
    assert got_pairs == want


def test_skyline_bruteforce(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import skyline

    rng = np.random.default_rng(9)
    n = 500
    # small value range → many ties, stressing the equal-key logic
    df = pd.DataFrame({
        "rid": np.arange(n, dtype=np.int64),
        "a": rng.integers(0, 15, n).astype(np.int64),
        "b": rng.integers(0, 15, n).astype(np.int64),
    })
    got = skyline(rd.from_pandas(df).repartition(5), "a", "b", "rid")
    got_ids = set(got.to_pandas()["rid"])
    rows = df[["a", "b"]].to_numpy()
    want = {
        int(df["rid"][i])
        for i in range(n)
        if not any(
            rows[j, 0] >= rows[i, 0]
            and rows[j, 1] <= rows[i, 1]
            and (rows[j, 0] > rows[i, 0] or rows[j, 1] < rows[i, 1])
            for j in range(n)
        )
    }
    assert got_ids == want


def test_cohort_retention_golden(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import cohort_retention

    day = 86400
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # u1 active day 0, 1, 3; u2 active day 1 only (twice, same day);
    # u3 active day 0 and 1
    for uid, secs in ((1, [0, day, 3 * day]), (2, [day, day + 5]),
                      (3, [10, day + 20])):
        rows += [{"user_id": uid, "ts": t0 + pd.Timedelta(seconds=s)}
                 for s in secs]
    out = cohort_retention(
        rd.from_pandas(pd.DataFrame(rows)).repartition(3)
    ).to_pandas()
    got = {(r.cohort_day, r.offset_day): r.n_users
           for r in out.itertuples()}
    base = (t0.value // 1_000_000_000) // day
    assert got == {
        (base, 0): 2,        # u1, u3 cohort day0 active day0
        (base, 1): 2,        # u1, u3 at offset 1
        (base, 3): 1,        # u1 at offset 3
        (base + 1, 0): 1,    # u2 cohort day1
    }


def test_duplicate_ngrams_golden(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.text import duplicate_ngrams

    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [
            "the quick brown fox jumps over the lazy dog",
            "a quick brown fox jumps over me",       # shares 1 5-gram
            "the quick brown fox jumps over the lazy dog",  # full dup
            "short text",                             # < 5 tokens
        ],
    })
    out = duplicate_ngrams(
        rd.from_pandas(docs).repartition(2), n=5
    ).to_pandas()
    got = dict(zip(out["gram"], out["n_docs"]))
    # every 5-gram of doc0 appears in doc2 too (n_docs >= 2); the one
    # shared with doc1 has n_docs == 3
    assert got["quick brown fox jumps over"] == 3
    assert got["the quick brown fox jumps"] == 2
    assert all(v >= 2 for v in got.values())
    assert len(got) == 5  # doc0 has 9 tokens → 5 distinct 5-grams
