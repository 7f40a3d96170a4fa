"""Data-quality audit + upsert_latest (pipelines/quality.py):
planted-violation and brute-force merge equality."""

import numpy as np
import pandas as pd


def test_audit_counts_planted_violations(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.quality import Check, audit

    df = pd.DataFrame({
        "id": [1, 1, 2, 3, 4, 4, 4],       # dup ids: 1 extra + 2 extra
        "fk": [10, 10, 11, 99, 12, 98, 12],  # 99, 98 orphaned
        "v":  [5, -1, 3, -2, 0, 7, -9],      # three negatives
    })
    dim = pd.DataFrame({"pk": [10, 11, 12]})
    out = audit(
        rd.from_pandas(df).repartition(3),
        checks=[Check("neg_v", lambda d: d["v"] < 0)],
        key_col="id",
        fk=("fk", rd.from_pandas(dim), "pk"),
    ).set_index("check_name")["n_violations"]
    assert out["neg_v"] == 3
    assert out["unique_id"] == 3
    assert out["fk_fk"] == 2


def test_upsert_latest_matches_bruteforce(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.quality import upsert_latest

    rng = np.random.default_rng(31)
    base = pd.DataFrame({
        "k": np.arange(200, dtype=np.int64),
        "val": rng.integers(0, 100, 200).astype(np.int64),
        "version": rng.integers(0, 5, 200).astype(np.int64),
    })
    upd = pd.DataFrame({
        "k": rng.choice(250, 80, replace=False).astype(np.int64),
        "val": rng.integers(1000, 1100, 80).astype(np.int64),
        "version": rng.integers(0, 8, 80).astype(np.int64),
    })
    out = upsert_latest(
        rd.from_pandas(base).repartition(4),
        rd.from_pandas(upd).repartition(3),
        "k", "version",
    ).to_pandas().sort_values("k").reset_index(drop=True)

    b = base.assign(side=0)
    u = upd.assign(side=1)
    allr = pd.concat([b, u], ignore_index=True).sort_values(
        ["k", "version", "side"], kind="stable"
    )
    want = allr.drop_duplicates("k", keep="last").drop(columns="side")
    want = want.sort_values("k").reset_index(drop=True)
    assert len(out) == len(want)
    for c in ("k", "val", "version"):
        assert (out[c].to_numpy() == want[c].to_numpy()).all(), c


def test_table_diff_classifies_all_changes(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.quality import table_diff

    old = pd.DataFrame({
        "k": [1, 2, 3, 4], "a": ["x", "y", "z", "w"], "b": [10, 20, 30, 40],
    })
    new = pd.DataFrame({
        "k": [1, 2, 5], "a": ["x", "y", "q"], "b": [10, 99, 50],
    })
    out = table_diff(
        rd.from_pandas(old).repartition(2),
        rd.from_pandas(new).repartition(2), "k", ["a", "b"],
    ).to_pandas().sort_values("k").reset_index(drop=True)
    want = {1: None, 2: "changed", 3: "removed", 4: "removed", 5: "added"}
    got = dict(zip(out["k"], out["change"]))
    assert 1 not in got  # unchanged keys are dropped
    assert got == {k: v for k, v in want.items() if v}


def test_table_diff_nan_equals_nan(ray_session):
    """A value that is NaN on BOTH sides is unchanged (SQL IS NOT
    DISTINCT FROM), not 'changed'; NaN vs value IS changed."""
    import numpy as np
    import ray.data as rd

    from geotreehealth_ray.pipelines.quality import table_diff

    old = pd.DataFrame({"k": [1, 2, 3], "v": [np.nan, np.nan, 7.0]})
    new = pd.DataFrame({"k": [1, 2, 3], "v": [np.nan, 5.0, np.nan]})
    out = table_diff(
        rd.from_pandas(old).repartition(2),
        rd.from_pandas(new).repartition(2), "k", ["v"],
    ).to_pandas()
    got = dict(zip(out["k"], out["change"]))
    assert got == {2: "changed", 3: "changed"}  # 1 (NaN==NaN) dropped
