"""Table source with the Lance-first read path (BASELINE.json
input_hint: "Lance table of image + caption pairs").

At scale the flagship input is a Lance dataset whose FRAGMENTS are the
validation partitions (`ray.data.read_lance` exists in Ray 2.49).  The
sandbox has no ``lance`` python package, so :func:`read_table`
auto-detects: a ``.lance`` path uses ``read_lance`` when the package is
importable, anything else (or a missing package) falls back to
``read_parquet`` — same Dataset, same downstream plan.  Parquet files
stand in for fragments locally (state/checkpoint.py treats one file =
one partition unit).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Union

__all__ = ["read_table", "read_sql", "write_table", "lance_available"]


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_table(path: Union[str, Sequence[str]], *,
               columns: Optional[Sequence[str]] = None,
               fmt: str = "auto", **kwargs):
    """Read a table as a ray.data.Dataset.

    fmt='auto': ``.lance`` directory -> read_lance (if the package is
    present), ``.csv`` -> read_csv (the reference's
    ``working_directory`` + csv fixture idiom, SURVEY.md §2.F),
    ``.json`` / ``.jsonl`` -> read_json (NDJSON — the event-log
    interchange format), else parquet.  fmt='lance' | 'parquet' |
    'csv' | 'json' force the path.  ``columns`` prunes at the read for
    every format (csv/json prune after parse via select_columns — the
    formats have no column projection).
    """
    import ray.data as rd

    first = path if isinstance(path, str) else next(iter(path))
    if fmt == "auto":
        p = str(first).rstrip("/")
        if p.endswith(".lance"):
            fmt = "lance"
        elif p.endswith(".csv"):
            fmt = "csv"
        elif p.endswith(".json") or p.endswith(".jsonl"):
            fmt = "json"
        else:
            fmt = "parquet"
    if fmt == "csv":
        ds = rd.read_csv(path, **kwargs)
        return ds.select_columns(list(columns)) if columns else ds
    if fmt == "json":
        ds = rd.read_json(path, **kwargs)
        return ds.select_columns(list(columns)) if columns else ds
    if fmt == "lance":
        if not lance_available():
            raise ImportError(
                "lance is not installed in this environment; pass parquet "
                "paths (the local stand-in) or install lance"
            )
        return rd.read_lance(path, columns=list(columns) if columns else None,
                             **kwargs)
    if fmt != "parquet":
        raise ValueError(f"unknown table format {fmt!r}")
    if isinstance(path, str) and os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".parquet")
        )
        path = files or path
    return rd.read_parquet(path, columns=list(columns) if columns else None,
                           **kwargs)


def read_sql(sql: str, connection_factory, *,
             columns: Optional[Sequence[str]] = None, **kwargs):
    """Read a SQL query result as a ray.data.Dataset — the engine's
    source-side counterpart of the reference's DB-API2 cursor adapter
    (``datatest/_normalize.py`` cursor branch, SURVEY.md §2.F; the
    in-memory normalization path already accepts live cursors via
    ``pipelines/validate.py``).

    ``connection_factory`` is a zero-arg callable returning a DB-API2
    connection; it is shipped to workers and called there, so it must
    close over picklable state (a path / DSN string), not an open
    connection.  Column pruning happens post-read (DB-API2 has no
    projection pushdown beyond what the SQL itself selects — prefer
    selecting only needed columns in ``sql``).
    """
    import ray.data as rd

    ds = rd.read_sql(sql, connection_factory, **kwargs)
    return ds.select_columns(list(columns)) if columns else ds


def write_table(data, path: str, *, fmt: str = "auto", **kwargs) -> None:
    """Write a ray.data.Dataset or pyarrow.Table sink (the
    violations/verdicts output side of SURVEY.md §2.F).

    fmt='auto': a ``.lance`` path -> ``write_lance`` / ``lance.
    write_dataset`` when the package is importable (ImportError
    otherwise — the sandbox has none; the flagship's scale deployment
    does), a ``.json``/``.jsonl`` path -> NDJSON, anything else ->
    partitioned parquet.  A Dataset writes one
    file per block (resumable, never one giant file); a pa.Table writes
    a single file at ``path``.
    """
    import pyarrow.parquet as pq

    if fmt == "auto":
        p = str(path).rstrip("/")
        if p.endswith(".lance"):
            fmt = "lance"
        elif p.endswith(".json") or p.endswith(".jsonl"):
            fmt = "json"
        else:
            fmt = "parquet"
    is_dataset = hasattr(data, "write_parquet")
    if fmt == "lance":
        if not lance_available():
            raise ImportError(
                "lance is not installed in this environment; write parquet "
                "(the local stand-in) or install lance"
            )
        if is_dataset:
            data.write_lance(path, **kwargs)
        else:
            import lance

            lance.write_dataset(data, path, **kwargs)
        return
    if fmt == "json":
        if is_dataset:
            data.write_json(path, **kwargs)
        else:
            import ray.data as rd

            rd.from_arrow(data).write_json(path, **kwargs)
        return
    if fmt != "parquet":
        raise ValueError(f"unknown table format {fmt!r}")
    if is_dataset:
        data.write_parquet(path, **kwargs)
    else:
        pq.write_table(data, path, **kwargs)
