"""Poison-row quarantine: healthy rows flow through the kernel, poison
rows surface as q_error rows (never silently dropped — the SURVEY §4
replacement for the reference's except-continue at main.py:126-134)."""

import numpy as np
import pandas as pd


def _make_kernel():
    # defined via closure so it pickles by value (tests aren't importable
    # on Ray workers); vectorized kernel that (like a real decode) blows
    # up on bad rows
    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        v = df["v"].to_numpy()
        if (v < 0).any():
            raise ValueError(f"negative value for id={df['rid'].iloc[0]}")
        return pd.DataFrame({"rid": df["rid"], "doubled": v * 2})

    return kernel


def test_quarantine_isolates_poison_rows(ray_session):
    import ray.data as rd

    from geotreehealth_ray.stages.quarantine import quarantine_map_batches

    rng = np.random.default_rng(2)
    n = 500
    df = pd.DataFrame({
        "rid": np.arange(n, dtype=np.int64),
        "v": rng.integers(1, 100, n).astype(np.int64),
    })
    bad = [7, 128, 129, 333, 499]
    df.loc[bad, "v"] = -1

    out = quarantine_map_batches(
        rd.from_pandas(df).repartition(4), _make_kernel(), keep_cols=["rid"]
    ).to_pandas()

    good = out[out["q_error"].isna()]
    poison = out[out["q_error"].notna()]
    assert sorted(poison["rid"]) == bad
    assert poison["q_error"].str.contains("negative value").all()
    assert len(good) == n - len(bad)
    exp = df[~df["rid"].isin(bad)].set_index("rid")["v"] * 2
    got = good.set_index("rid")["doubled"].astype("int64")
    assert got.sort_index().tolist() == exp.sort_index().tolist()
    # nothing lost, nothing duplicated
    assert sorted(out["rid"]) == list(range(n))


def test_quarantine_clean_batch_single_call(ray_session):
    import ray.data as rd

    from geotreehealth_ray.stages.quarantine import quarantine_map_batches

    df = pd.DataFrame({"rid": np.arange(10, dtype=np.int64),
                       "v": np.ones(10, dtype=np.int64)})
    out = quarantine_map_batches(
        rd.from_pandas(df), _make_kernel(), keep_cols=["rid"]
    ).to_pandas()
    assert out["q_error"].isna().all()
    assert (out["doubled"] == 2).all()
