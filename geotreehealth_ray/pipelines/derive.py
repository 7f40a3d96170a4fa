"""Deterministic derivation of spatial tables from the driver's
relational testdata (TPC-H-ish parquet). Formulas are integer-hash
based and EXACTLY expressible in ANSI SQL, so the driver's DuckDB
oracle can reproduce every coordinate bit-for-bit:

    x(key) = ((key * 7919)  % 10000) / 10.0        -- [0, 1000) m
    y(key) = ((key * 104729) % 10000) / 10.0
    half(part) = (1 + p_size % 10)                  -- box half-edge, m

Points come from ``orders`` (one stem per o_orderkey), axis-aligned
boxes ("crowns") from ``part``. These exercise the real cell-partition
PIP machinery with polygons whose SQL predicate is a BETWEEN pair —
the arbitrary-polygon path is validated separately by the synthetic
golden tests (tests/test_assign.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["derive_points", "derive_boxes", "derive_phashes",
           "XMUL", "YMUL", "DOMAIN"]

XMUL = 7919
YMUL = 104729
DOMAIN = 10000  # tenths of meters → 1000 m extent


def _coords(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    x = ((key * XMUL) % DOMAIN) / 10.0
    y = ((key * YMUL) % DOMAIN) / 10.0
    return x, y


def derive_points(orders):
    """orders → stems-shaped Dataset (stem_id, x, y)."""

    def fn(t: pa.Table) -> pa.Table:
        key = t["o_orderkey"].to_numpy()
        x, y = _coords(key)
        # zero-padded ids: lexicographic order == numeric order, so the
        # engine's string tie-breaks match the SQL oracle's integer ones
        return pa.table(
            {
                "stem_id": pa.array(np.char.zfill(key.astype(str), 12)),
                "okey": pa.array(key, pa.int64()),
                "x": pa.array(x, pa.float64()),
                "y": pa.array(y, pa.float64()),
            }
        )

    return orders.select_columns(["o_orderkey"]).map_batches(
        fn, batch_format="pyarrow"
    )


def derive_phashes(orders):
    """orders → image-table-shaped Dataset (image_id, phash) with
    PLANTED near-duplicate groups, SQL-reproducible bit-for-bit.

    Members of group g = o_orderkey // 4 share the 64-bit base pattern
    md5_u64(str(g)); the variant v = o_orderkey % 4 flips the first v
    of the group's 3 flip positions md5_u64(f"{g}:{j}") % 64 — so
    in-group pairs sit at Hamming <= 3 and cross-group pairs at ~32.
    md5_u64 is md5-first-8-bytes-little-endian == DuckDB
    md5_number_upper (same trick as simhash_pairs' token hash), so
    oracle_sql()['phash_pairs'] reproduces every hash exactly."""
    from .dedup import _tok64

    def fn(t: pa.Table) -> pa.Table:
        key = t["o_orderkey"].to_numpy()
        ph = np.empty(len(key), np.uint64)
        cache: dict[int, list[int]] = {}
        for i, k in enumerate(key):
            g, v = int(k) // 4, int(k) % 4
            masks = cache.get(g)
            if masks is None:
                base = _tok64(str(g))
                masks = [base]
                for j in (1, 2, 3):
                    masks.append(masks[-1] ^ (1 << (_tok64(f"{g}:{j}") % 64)))
                cache[g] = masks
            ph[i] = masks[v]
        return pa.table(
            {
                "image_id": pa.array(key, pa.int64()),
                "phash": pa.array(ph.view(np.int64), pa.int64()),
            }
        )

    return orders.select_columns(["o_orderkey"]).map_batches(
        fn, batch_format="pyarrow"
    )


def derive_boxes(part):
    """part → crowns-shaped Dataset (crown_id, ring, cx, cy, bbox…)."""

    def fn(t: pa.Table) -> pa.Table:
        key = t["p_partkey"].to_numpy()
        size = t["p_size"].to_numpy()
        cx, cy = _coords(key)
        half = (1 + (size % 10)).astype(np.float64)
        minx, maxx = cx - half, cx + half
        miny, maxy = cy - half, cy + half
        rings = pa.array(
            [
                [
                    {"x": a, "y": b},
                    {"x": c, "y": b},
                    {"x": c, "y": d},
                    {"x": a, "y": d},
                ]
                for a, b, c, d in zip(minx, miny, maxx, maxy)
            ],
            type=pa.list_(pa.struct([("x", pa.float64()), ("y", pa.float64())])),
        )
        return pa.table(
            {
                "crown_id": pa.array(np.char.zfill(key.astype(str), 12)),
                "pkey": pa.array(key, pa.int64()),
                "ring": rings,
                "cx": pa.array(cx, pa.float64()),
                "cy": pa.array(cy, pa.float64()),
                "minx": pa.array(minx, pa.float64()),
                "miny": pa.array(miny, pa.float64()),
                "maxx": pa.array(maxx, pa.float64()),
                "maxy": pa.array(maxy, pa.float64()),
            }
        )

    return part.select_columns(["p_partkey", "p_size"]).map_batches(
        fn, batch_format="pyarrow"
    )
