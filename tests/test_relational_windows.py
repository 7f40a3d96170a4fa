"""Windowed / grouped relational operators: running total, top-k per
group, grouped median, distinct count, lag delta. Each checked against
a single-process pandas reference on a small skewed frame — the exact
SQL equivalence is additionally gated by the driver oracles
(__ray_entry__.oracle_sql: running_total, topk_per_cust, median_price,
distinct_suppliers, event_deltas)."""

import numpy as np
import pandas as pd
import pytest


def _events(n=200, users=7, seed=11):
    rng = np.random.default_rng(seed)
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        np.sort(rng.integers(0, 10**6, n)), unit="s"
    )
    return pd.DataFrame(
        {
            "event_id": np.arange(1, n + 1, dtype=np.int64),
            "user_id": rng.integers(1, users + 1, n).astype(np.int64),
            "ts": ts,
            "value": rng.uniform(-5, 5, n).round(4),
        }
    )


def test_running_total_matches_pandas(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import running_total

    df = _events()
    out = (
        running_total(rd.from_pandas(df))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
    ref["micro"] = np.floor(ref["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    g = ref.groupby("user_id", sort=False)
    ref["seq"] = g.cumcount() + 1
    ref["running_micro"] = g["micro"].cumsum()
    ref = ref.sort_values("event_id").reset_index(drop=True)
    assert len(out) == len(ref)
    np.testing.assert_array_equal(out["seq"], ref["seq"])
    np.testing.assert_array_equal(out["running_micro"], ref["running_micro"])


def test_rolling_sum_matches_pandas(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import rolling_sum

    df = _events(n=150, users=6, seed=13)
    out = (
        rolling_sum(rd.from_pandas(df), window=3)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    micro = np.floor(ref["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    exp = (
        pd.DataFrame({"u": ref["user_id"], "m": micro})
        .groupby("u", sort=False)["m"]
        .rolling(3, min_periods=1)
        .sum()
        .reset_index(level=0, drop=True)
        .sort_index()
        .astype("int64")
    )
    ref_out = pd.DataFrame(
        {"event_id": ref["event_id"], "rolling_micro": exp}
    ).sort_values("event_id").reset_index(drop=True)
    np.testing.assert_array_equal(out["rolling_micro"], ref_out["rolling_micro"])


def test_topk_per_group_rank_and_ties(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import topk_per_group

    # deliberate ties on the order col — id must break them
    df = pd.DataFrame(
        {
            "k": np.repeat([1, 2], 5).astype(np.int64),
            "id": np.arange(10, dtype=np.int64),
            "v": np.array([5.0, 5.0, 3.0, 9.0, 1.0, 2.0, 2.0, 2.0, 2.0, 2.0]),
        }
    )
    out = (
        topk_per_group(rd.from_pandas(df), "k", "v", "id", k=3)
        .to_pandas()
        .sort_values(["k", "rnk"])
        .reset_index(drop=True)
    )
    assert out[out["k"] == 1]["id"].tolist() == [3, 0, 1]
    assert out[out["k"] == 2]["id"].tolist() == [5, 6, 7]
    assert out["rnk"].tolist() == [1, 2, 3, 1, 2, 3]


def test_grouped_median_lower_median(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import grouped_median

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 20, 500).astype(np.int64),
            "v": rng.uniform(0, 100, 500).round(2),
        }
    )
    out = (
        grouped_median(rd.from_pandas(df), "k", "v", alias="m")
        .to_pandas()
        .set_index("k")["m"]
    )
    for k, g in df.groupby("k"):
        vals = np.sort(g["v"].to_numpy())
        assert out[k] == vals[(len(vals) - 1) // 2]


def test_distinct_count(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import distinct_count

    rng = np.random.default_rng(6)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 15, 800).astype(np.int64),
            "v": rng.integers(0, 10, 800).astype(np.int64),
        }
    )
    out = (
        distinct_count(rd.from_pandas(df), "k", "v", alias="nd")
        .to_pandas()
        .set_index("k")["nd"]
    )
    ref = df.groupby("k")["v"].nunique()
    assert out.sort_index().tolist() == ref.sort_index().tolist()


def test_json_extract_int(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.text import json_extract_int

    df = pd.DataFrame(
        {
            "id": np.arange(4, dtype=np.int64),
            "props": ['{"k": 87}', '{"a": 1, "k": -3}', '{"a": 2}', None],
        }
    )
    out = (
        json_extract_int(rd.from_pandas(df), "props", "k", "k")
        .to_pandas()
        .sort_values("id")
    )
    assert out["k"].tolist()[:2] == [87, -3]
    assert pd.isna(out["k"].iloc[2]) and pd.isna(out["k"].iloc[3])


def test_label_centroids_matches_numpy(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.ann import label_centroids

    rng = np.random.default_rng(9)
    vecs = rng.normal(0, 1, (300, 8)).astype(np.float32)
    labels = rng.integers(0, 4, 300).astype(np.int32)
    df = pd.DataFrame({"label": labels, "embedding": list(vecs)})
    out = (
        label_centroids(rd.from_pandas(df))
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    assert len(out) == 4 * 8
    for lbl in range(4):
        exp = vecs[labels == lbl].astype(np.float64).mean(axis=0)
        got = out[out["label"] == lbl]["centroid"].to_numpy()
        np.testing.assert_allclose(got, exp, atol=1e-6)


def test_hash_join_left_outer_nulls(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import hash_join

    left = pd.DataFrame({"k": np.arange(10, dtype=np.int64)})
    right = pd.DataFrame(
        {"k": np.array([0, 2, 4], dtype=np.int64), "v": [1.0, 2.0, 3.0]}
    )
    out = (
        hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k", how="left")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert len(out) == 10
    assert out.loc[out["k"].isin([0, 2, 4]), "v"].tolist() == [1.0, 2.0, 3.0]
    assert out.loc[~out["k"].isin([0, 2, 4]), "v"].isna().all()


def test_set_op_intersect_except(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import set_op

    a = pd.DataFrame({"k": np.array([1, 2, 2, 3, 4, 4, 4], np.int64)})
    b = pd.DataFrame({"k": np.array([2, 4, 5, 5], np.int64)})
    inter = sorted(
        set_op(rd.from_pandas(a), rd.from_pandas(b), "intersect")
        .to_pandas()["k"].tolist()
    )
    assert inter == [2, 4]  # distinct-row semantics
    exc = sorted(
        set_op(rd.from_pandas(a), rd.from_pandas(b), "except")
        .to_pandas()["k"].tolist()
    )
    assert exc == [1, 3]


def test_hll_registers_and_estimate(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines import sketch

    n_distinct = 5000
    rng = np.random.default_rng(3)
    keys = rng.choice(10**9, n_distinct, replace=False).astype(np.int64)
    # duplicates must not change the register table
    dup = np.concatenate([keys, keys[:1000]])
    df = pd.DataFrame({"k": dup})
    regs = sketch.hll_registers(rd.from_pandas(df), "k").to_pandas()
    regs_nodup = sketch.hll_registers(
        rd.from_pandas(pd.DataFrame({"k": keys})), "k"
    ).to_pandas()
    key = lambda d: d.sort_values("bucket").reset_index(drop=True)
    pd.testing.assert_frame_equal(key(regs), key(regs_nodup))
    est = sketch.hll_estimate(regs)
    assert abs(est - n_distinct) / n_distinct < 0.05  # ~1.6% stderr @ p=12


def test_kmeans_lloyd_matches_single_process(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.ann import kmeans_lloyd

    rng = np.random.default_rng(21)
    k, iters, dim = 4, 3, 6
    centers = rng.normal(0, 8, (k, dim))
    vecs = (centers[rng.integers(0, k, 240)] + rng.normal(0, 0.5, (240, dim))
            ).astype(np.float32)
    df = pd.DataFrame(
        {"vec_id": np.arange(240, dtype=np.int64), "embedding": list(vecs)}
    )

    out_ds, cent = kmeans_lloyd(rd.from_pandas(df), k=k, iters=iters)
    out = out_ds.to_pandas().sort_values("vec_id").reset_index(drop=True)

    # single-process reference with the identical protocol
    x = vecs.astype(np.float64)
    c = x[:k].copy()

    def am(xx, cc):
        d = (xx * xx).sum(1)[:, None] - 2 * xx @ cc.T + (cc * cc).sum(1)[None, :]
        return np.argmin(d, axis=1)

    for _ in range(iters):
        a = am(x, c)
        micro = np.floor(x * 1e6 + 0.5).astype(np.int64)
        for ci in range(k):
            m = a == ci
            if m.any():
                c[ci] = (micro[m].sum(axis=0) / m.sum()) / 1e6
    np.testing.assert_array_equal(cent, c)
    np.testing.assert_array_equal(out["cluster"].to_numpy(), am(x, c))


def test_lag_delta_first_rows_dropped(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import lag_delta

    df = _events(n=120, users=5, seed=12)
    out = (
        lag_delta(rd.from_pandas(df))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
    epoch = ref["ts"].astype("datetime64[us]").astype("int64")
    same = ref["user_id"].eq(ref["user_id"].shift(1))
    exp = pd.DataFrame(
        {
            "event_id": ref["event_id"],
            "prev_id": ref["event_id"].shift(1),
            "delta_us": epoch - epoch.shift(1),
        }
    )[same.to_numpy()]
    exp = exp.sort_values("event_id").reset_index(drop=True)
    assert len(out) == len(exp)
    np.testing.assert_array_equal(out["prev_id"], exp["prev_id"].astype("int64"))
    np.testing.assert_array_equal(out["delta_us"], exp["delta_us"].astype("int64"))
    assert (out["delta_us"] >= 0).all()


def test_global_topk_matches_full_sort(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import global_topk

    rng = np.random.default_rng(7)
    # duplicate order values force the id tie-break to matter
    df = pd.DataFrame(
        {
            "id": np.arange(500, dtype=np.int64),
            "val": rng.integers(0, 50, 500).astype(np.float64),
        }
    )
    ds = rd.from_pandas(df).repartition(8)
    out = global_topk(ds, "val", "id", k=10).to_pandas()
    exp = df.sort_values(["val", "id"], ascending=[False, True]).head(10)
    np.testing.assert_array_equal(out["id"].to_numpy(), exp["id"].to_numpy())
    np.testing.assert_array_equal(out["val"].to_numpy(), exp["val"].to_numpy())


def test_hopping_window_matches_bruteforce(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import hopping_window_agg

    rng = np.random.default_rng(5)
    n = 500
    epoch = rng.integers(1_700_000_000, 1_700_050_000, n)
    df = pd.DataFrame({
        "ts": pd.to_datetime(epoch, unit="s"),
        "value": rng.normal(10.0, 3.0, n),
    })
    out = hopping_window_agg(
        rd.from_pandas(df).repartition(7), size_s=600, hop_s=200
    ).to_pandas().sort_values("window_start").reset_index(drop=True)

    # brute force: every window start w on a 200 s boundary aggregates
    # events with w <= t < w + 600
    v6 = np.floor(df["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    rows = {}
    for t, v in zip(epoch, v6):
        base = (t // 200) * 200
        for i in range(3):
            w = base - i * 200
            s, c = rows.get(w, (0, 0))
            rows[w] = (s + v, c + 1)
    want = pd.DataFrame(
        [(w, s, c) for w, (s, c) in sorted(rows.items())],
        columns=["window_start", "total_c6", "n_events"],
    )
    assert len(out) == len(want)
    for c in want.columns:
        assert (out[c].to_numpy() == want[c].to_numpy()).all(), c


def test_cooccurrence_pairs_matches_bruteforce(ray_session):
    from itertools import combinations

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import cooccurrence_pairs

    rng = np.random.default_rng(21)
    rows = []
    for b in range(120):
        items = rng.choice(30, size=rng.integers(1, 6), replace=False)
        rows += [(b, int(i)) for i in items]
        if b % 3 == 0:  # duplicate rows must not double-count
            rows += [(b, int(items[0]))]
    df = pd.DataFrame(rows, columns=["basket", "item"])

    out = cooccurrence_pairs(
        rd.from_pandas(df).repartition(7), "basket", "item", min_count=2
    ).to_pandas().sort_values(["item_a", "item_b"]).reset_index(drop=True)

    from collections import Counter
    cnt = Counter()
    for _, g in df.drop_duplicates().groupby("basket"):
        for a, b in combinations(sorted(g["item"]), 2):
            cnt[(a, b)] += 1
    want = pd.DataFrame(
        [(a, b, n) for (a, b), n in sorted(cnt.items()) if n >= 2],
        columns=["item_a", "item_b", "n_baskets"],
    )
    assert len(out) == len(want) >= 1
    for c in want.columns:
        assert (out[c].to_numpy() == want[c].to_numpy()).all(), c


def test_hash_join_composite_key_all_modes(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import hash_join

    rng = np.random.default_rng(13)
    left = pd.DataFrame({
        "a": rng.integers(0, 6, 300).astype(np.int64),
        "b": rng.choice(["x", "y", "z"], 300),
        "lv": np.arange(300, dtype=np.int64),
    })
    right = pd.DataFrame({
        "a": rng.integers(0, 8, 120).astype(np.int64),
        "b": rng.choice(["x", "y", "w"], 120),
        "rv": np.arange(120, dtype=np.int64),
    })
    l = rd.from_pandas(left).repartition(4)
    r = rd.from_pandas(right).repartition(3)
    keys = ["a", "b"]

    for how in ("inner", "left", "outer"):
        got = hash_join(l, r, on=keys, how=how).to_pandas()
        want = left.merge(right, on=keys, how=how)
        gs = got.sort_values(["a", "b", "lv", "rv"], na_position="last",
                             kind="stable").reset_index(drop=True)
        ws = want.sort_values(["a", "b", "lv", "rv"], na_position="last",
                              kind="stable").reset_index(drop=True)
        assert len(gs) == len(ws), how
        for c in ("a", "lv", "rv"):
            assert (
                gs[c].fillna(-1).to_numpy() == ws[c].fillna(-1).to_numpy()
            ).all(), (how, c)

    match_keys = set(map(tuple, right[keys].itertuples(index=False)))
    in_right = left.apply(
        lambda row: (row["a"], row["b"]) in match_keys, axis=1
    )
    semi = hash_join(l, r, on=keys, how="semi").to_pandas()
    anti = hash_join(l, r, on=keys, how="anti").to_pandas()
    assert sorted(semi["lv"]) == sorted(left[in_right]["lv"])
    assert sorted(anti["lv"]) == sorted(left[~in_right]["lv"])
    assert list(semi.columns) == list(left.columns)


def test_auto_join_both_paths_identical(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import auto_join, hash_join

    rng = np.random.default_rng(19)
    left = pd.DataFrame({
        "k": rng.integers(0, 50, 400).astype(np.int64),
        "lv": np.arange(400, dtype=np.int64),
    })
    right = pd.DataFrame({
        "k": np.arange(60, dtype=np.int64),
        "rv": rng.integers(0, 9, 60).astype(np.int64),
    })
    rpath = str(tmp_path / "right.parquet")
    right.to_parquet(rpath)
    l = rd.from_pandas(left).repartition(4)

    # file-backed right side, tiny → broadcast path
    bc = auto_join(l, rd.read_parquet(rpath), "k").to_pandas()
    # forced hash path (threshold 0)
    hj = auto_join(l, rd.read_parquet(rpath), "k",
                   broadcast_bytes=0).to_pandas()
    ref = hash_join(l, rd.read_parquet(rpath), "k").to_pandas()
    for out in (bc, hj):
        a = out.sort_values(["k", "lv"]).reset_index(drop=True)
        b = ref.sort_values(["k", "lv"]).reset_index(drop=True)
        assert len(a) == len(b)
        for c in ("k", "lv", "rv"):
            assert (a[c].to_numpy() == b[c].to_numpy()).all(), c


def test_salted_join_matches_plain_hash_join(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from geotreehealth_ray.pipelines.relational import hash_join, salted_join

    rng = np.random.default_rng(29)
    # zipf-ish: key 7 owns ~40% of the left side
    keys = np.r_[
        np.full(800, 7, np.int64), rng.integers(0, 200, 1200),
    ]
    rng.shuffle(keys)
    left = pd.DataFrame({
        "k": keys, "lv": np.arange(len(keys), dtype=np.int64),
    })
    right = pd.DataFrame({
        "k": np.arange(200, dtype=np.int64),
        "rv": rng.integers(0, 9, 200).astype(np.int64),
    })
    l = rd.from_pandas(left).repartition(5)
    r = rd.from_pandas(right).repartition(3)

    for how in ("inner", "left"):
        for hk in (None, {7}):
            got = salted_join(
                l, r, "k", salt_col="lv", n_salt=4, phi=0.05,
                how=how, hot_keys=hk,
            ).to_pandas()
            want = hash_join(l, r, "k", how=how).to_pandas()
            a = got.sort_values(["k", "lv"]).reset_index(drop=True)
            b = want.sort_values(["k", "lv"]).reset_index(drop=True)
            assert len(a) == len(b), (how, hk)
            for c in ("k", "lv", "rv"):
                assert (
                    a[c].fillna(-1).to_numpy() == b[c].fillna(-1).to_numpy()
                ).all(), (how, hk, c)
