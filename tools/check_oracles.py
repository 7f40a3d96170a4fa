"""Driver-mimic: run every queries() entry at a given sf and compare to
its oracle_sql() via DuckDB — row count, sorted-column schema, and an
order-insensitive value hash. Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    if df.empty:  # apply(axis=1) on an empty frame returns a DataFrame
        return hashlib.md5(b"").hexdigest()
    for c in df.columns:
        df[c] = df[c].astype(str)
    rows = sorted(df.apply(lambda r: "|".join(r.values), axis=1).tolist())
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def run_gate(sf_dir: str, only=None, echo=print) -> int:
    """Run every queries() entry at sf_dir against its oracle_sql()
    (rows + sorted-schema + order-insensitive value hash) and return
    the failure count. Assumes Ray is ALREADY initialised (the pytest
    session fixture or main() below owns the session); never inits or
    shuts down Ray itself, so it is safe to call from tests."""
    import __ray_entry__ as mod

    qs = mod.queries()
    oracles = mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            echo(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            echo(f"okR  {name}: rows={len(got)} (rows-only, no oracle)")
            continue
        exp = con.sql(oracles[name]).df()
        ok_rows = len(got) == len(exp)
        ok_schema = sorted(got.columns) == sorted(exp.columns)
        ok_hash = ok_rows and ok_schema and value_hash(got) == value_hash(exp)
        if ok_hash:
            echo(f"OK   {name}: rows={len(got)}")
        else:
            failures += 1
            echo(f"FAIL {name}: rows {len(got)} vs {len(exp)}; "
                 f"schema {sorted(got.columns)} vs {sorted(exp.columns)}; hash_eq={ok_hash}")
            if ok_rows and ok_schema:
                g = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
                e = exp[sorted(exp.columns)].sort_values(sorted(exp.columns)).reset_index(drop=True)
                diff = (g.astype(str) != e.astype(str)).any(axis=1)
                echo(g[diff].head(3))
                echo(e[diff].head(3))
    return failures


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    failures = run_gate(sf_dir, only=only)
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
