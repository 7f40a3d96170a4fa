"""Funnel sequence match, rank fractions, and the Levenshtein<=1
deletion-blocking join — kernel-level goldens plus brute-force
equality on small random inputs. (The exact SQL oracles in
__ray_entry__ gate the full-table behavior at sf0.01.)"""

import numpy as np
import pandas as pd
import pytest


def _lev(a: str, b: str) -> int:
    # classic DP reference (small strings only)
    la, lb = len(a), len(b)
    d = np.arange(lb + 1)
    for i in range(1, la + 1):
        prev = d.copy()
        d[0] = i
        for j in range(1, lb + 1):
            d[j] = min(prev[j] + 1, d[j - 1] + 1,
                       prev[j - 1] + (a[i - 1] != b[j - 1]))
    return int(d[lb])


def test_lev_kernels_match_dp():
    from geotreehealth_ray.pipelines.dedup import (
        _lev_le1_del,
        _lev_le1_eq,
        _str_matrix,
    )

    rng = np.random.default_rng(7)
    alphabet = list("abc")
    eq_a, eq_b, del_a, del_b = [], [], [], []
    for _ in range(400):
        n = int(rng.integers(1, 9))
        a = "".join(rng.choice(alphabet, n))
        b = "".join(rng.choice(alphabet, n))
        eq_a.append(a), eq_b.append(b)
        # same-prefix mutations: denser near the <=1 boundary
        c = list(a)
        for _ in range(int(rng.integers(0, 3))):
            c[int(rng.integers(0, n))] = str(rng.choice(alphabet))
        eq_a.append(a), eq_b.append("".join(c))
        if n >= 2:
            j = int(rng.integers(0, n))
            del_a.append(a), del_b.append(a[:j] + a[j + 1:])
            del_a.append(a), del_b.append("".join(c)[: n - 1])
    for pairs, kern, wdiff in ((list(zip(eq_a, eq_b)), _lev_le1_eq, 0),
                               (list(zip(del_a, del_b)), _lev_le1_del, 1)):
        bylen = {}
        for a, b in pairs:
            bylen.setdefault(len(a), []).append((a, b))
        for la, ps in bylen.items():
            A = _str_matrix(np.array([p[0] for p in ps]), la)
            B = _str_matrix(np.array([p[1] for p in ps]), la - wdiff)
            got = kern(A, B)
            want = np.array([_lev(a, b) <= 1 for a, b in ps])
            assert (got == want).all()


def test_edit_distance_pairs_bruteforce(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.dedup import edit_distance_pairs

    rng = np.random.default_rng(3)
    words = ["".join(rng.choice(list("abcd"), int(rng.integers(2, 7))))
             for _ in range(120)]
    df = pd.DataFrame({"wid": np.arange(120, dtype=np.int64), "w": words})
    got = edit_distance_pairs(rd.from_pandas(df), "wid", "w").to_pandas()
    got_pairs = set(zip(got["id_a"], got["id_b"]))
    want = {
        (i, j)
        for i in range(120)
        for j in range(i + 1, 120)
        if _lev(words[i], words[j]) <= 1
    }
    assert got_pairs == want


def test_funnel_greedy_chain(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import funnel_match

    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # user 1 completes in order; user 2 has purchase BEFORE click (no);
    # user 3 needs the greedy retry: view@0, click@1, view@2, purchase@3
    for uid, seq in ((1, [("view", 0), ("click", 1), ("purchase", 2)]),
                     (2, [("view", 0), ("purchase", 1), ("click", 2)]),
                     (3, [("view", 0), ("click", 1), ("view", 2),
                          ("purchase", 3)]),
                     (4, [("click", 0), ("purchase", 1)])):
        rows += [{"user_id": uid, "event_type": e,
                  "ts": t0 + pd.Timedelta(seconds=s)} for e, s in seq]
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(3)
    out = funnel_match(ds, ["view", "click", "purchase"]).to_pandas()
    out = out.sort_values("user_id").reset_index(drop=True)
    assert out["user_id"].tolist() == [1, 3]
    base = t0.value // 1000
    assert out.loc[0, ["t1_us", "t2_us", "t3_us"]].tolist() == [
        base, base + 1_000_000, base + 2_000_000]
    assert out.loc[1, ["t1_us", "t2_us", "t3_us"]].tolist() == [
        base, base + 1_000_000, base + 3_000_000]


def test_rank_fractions_golden(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import rank_fractions

    df = pd.DataFrame({
        "k": ["a"] * 4 + ["b"] * 2,
        "v": [10.0, 10.0, 20.0, 5.0, 1.0, 1.0],
        "rid": np.arange(6, dtype=np.int64),
    })
    out = rank_fractions(rd.from_pandas(df).repartition(2), "k", "v", "rid")
    out = out.to_pandas().sort_values("rid").reset_index(drop=True)
    assert out["rnk"].tolist() == [2, 2, 4, 1, 1, 1]
    assert out["pr_num"].tolist() == [1, 1, 3, 0, 0, 0]
    assert out["cd_cnt"].tolist() == [3, 3, 4, 1, 2, 2]
    assert out["n_rows"].tolist() == [4, 4, 4, 4, 2, 2]
