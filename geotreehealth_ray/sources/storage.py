"""Storage-format shim: Lance-first, Parquet fallback.

The north rule targets Lance tables of image+caption pairs at 10^12
rows; `lance` is not installed in this sandbox (SURVEY.md §7.4), so the
engine reads/writes through this shim and the format is a CONFIG
SWITCH, not a code fork. When `lance`/`pylance` is importable,
``read_table``/``write_table`` use `ray.data.read_lance` /
``write_lance`` (fragment-based, random-access-friendly for the chip
storage-join); otherwise partitioned Parquet with identical schemas.
"""

from __future__ import annotations

import importlib.util

__all__ = ["lance_available", "read_table", "write_table", "FORMAT"]


def lance_available() -> bool:
    return importlib.util.find_spec("lance") is not None


FORMAT = "lance" if lance_available() else "parquet"


def read_table(path: str, columns: list[str] | None = None,
               fmt: str | None = None):
    """ray.data Dataset from a table directory (format auto-detected
    from the environment unless forced)."""
    import ray.data as rd

    fmt = fmt or FORMAT
    if fmt == "lance":
        return rd.read_lance(path, columns=columns)
    kwargs = {"columns": columns} if columns else {}
    return rd.read_parquet(path, **kwargs)


def write_table(ds, path: str, fmt: str | None = None, **kwargs):
    fmt = fmt or FORMAT
    if fmt == "lance":
        return ds.write_lance(path, **kwargs)
    return ds.write_parquet(path, **kwargs)
