"""Measure bytes/row through the assign sort exchange, per column/side.

VERDICT r3 next #3 asks for measured bytes-through-exchange before vs
after payload changes. This builds the owner-mode union exactly as
assign_stems_to_crowns does (same side builders, same hot-cell salt
table, same margin) over the bench synthetic input and reports:
rows + Arrow buffer bytes per column, split by side, plus the
replication factors — WITHOUT running the sort itself.

Usage: GRAFT_BENCH_STEMS=960000 GRAFT_BENCH_EXTENT=8000 \
           python tools/measure_exchange.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEMS = int(os.environ.get("GRAFT_BENCH_STEMS", "960000"))
EXTENT = float(os.environ.get("GRAFT_BENCH_EXTENT", "8000"))


def main() -> None:
    os.environ.setdefault("RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION", "0.5")
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=16, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from tools.scaling_assign import _cfg, _prep
    from geotreehealth_ray.functions import cells
    from geotreehealth_ray.pipelines import assign as A

    base = _prep(_cfg())
    stems = rd.read_parquet(f"{base}/stems")
    crowns = rd.read_parquet(f"{base}/crowns")
    n_stems = stems.count()
    n_crowns = crowns.count()

    res = cells.DEFAULT_RES
    mx, my, qx, qy, crown_hist = A._reach_stats(crowns, res)
    if (qx <= A._REACH_SPLIT_RATIO * mx or qy <= A._REACH_SPLIT_RATIO * my):
        mx, my = qx, qy  # outlier-split margin, same rule as assign
    # same pair-aware salt table the owner plan builds
    hot_ref, _hot_extra = A._salt_table(A._stem_cell_hist(stems, res),
                                        crown_hist)

    def _col_bytes(t: pa.Table) -> dict:
        out = {}
        for name in t.column_names:
            col = t[name].combine_chunks() if isinstance(t[name], pa.ChunkedArray) else t[name]
            out[name] = sum(b.size for b in col.buffers() if b is not None)
        return out

    totals = {}
    stems_sel = stems.select_columns(["stem_id", "x", "y"])
    crowns_sel = crowns.select_columns(A._crown_cols(crowns))
    for label, ds, fn in (
        ("stem", stems_sel, lambda b: A._stem_side_owner(b, res, mx, my, hot_ref, False)),
        ("crown", crowns_sel, lambda b: A._crown_side_owner(b, res, hot_ref, False, None)),
    ):
        agg = {"rows": 0, "bytes": 0, "cols": {}}

        def acc(batch: pa.Table, _fn=fn) -> pa.Table:
            t = _fn(batch)
            cb = _col_bytes(t)
            return pa.table({
                "rows": pa.array([len(t)], pa.int64()),
                "col_json": pa.array([json.dumps(cb)]),
            })

        for row in ds.map_batches(acc, batch_format="pyarrow").take_all():
            agg["rows"] += row["rows"]
            for k, v in json.loads(row["col_json"]).items():
                agg["cols"][k] = agg["cols"].get(k, 0) + v
        agg["bytes"] = sum(agg["cols"].values())
        totals[label] = agg

    st, cr = totals["stem"], totals["crown"]
    print(json.dumps({
        "n_stems": n_stems, "n_crowns": n_crowns,
        "margin": [round(mx, 2), round(my, 2)],
        "stem_rows": st["rows"],
        "stem_replication": round(st["rows"] / n_stems, 3),
        "stem_bytes": st["bytes"],
        "stem_bytes_per_row": round(st["bytes"] / max(st["rows"], 1), 1),
        "stem_cols": st["cols"],
        "crown_rows": cr["rows"],
        "crown_bytes": cr["bytes"],
        "crown_bytes_per_row": round(cr["bytes"] / max(cr["rows"], 1), 1),
        "crown_cols": cr["cols"],
        "union_bytes": st["bytes"] + cr["bytes"],
        "stem_share": round(st["bytes"] / (st["bytes"] + cr["bytes"]), 3),
    }, indent=2))
    ray.shutdown()


if __name__ == "__main__":
    main()
