"""Windowed aggregates over event streams.

Not in the datatest reference (it is single-pass batch, no streaming
operators — SURVEY.md §2.H); engine extension for event tables.  A
tumbling window is a pure per-batch ``floor_temporal`` projection
followed by ONE ``groupby(window, keys)`` shuffle — the window column is
just another group key, so the plan is identical to any grouped
aggregate and streams with backpressure.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["tumbling_window"]

_UNITS = {"minute", "hour", "day", "week", "month"}


def tumbling_window(ds, ts_col: str, *, unit: str = "hour",
                    by: Optional[Sequence[str]] = None,
                    sum_col: Optional[str] = None):
    """Tumbling-window aggregate: (window, *by, n[, total]).

    ``window`` is the window start formatted '%Y-%m-%d %H:%M:%S' (string
    so results compare stably across engines).
    """
    if unit not in _UNITS:
        raise ValueError(f"unit must be one of {sorted(_UNITS)}")
    from ray.data.aggregate import Count, Sum

    by_cols: List[str] = list(by or [])
    need = [ts_col] + by_cols + ([sum_col] if sum_col else [])

    def project(batch: pa.Table) -> pa.Table:
        win = pc.floor_temporal(batch.column(ts_col), unit=unit)
        # cast to second resolution: Arrow's %S renders fractional digits
        # for timestamp[us], which would break string-level parity
        win = pc.cast(win, pa.timestamp("s"))
        cols = {"window": pc.strftime(win, format="%Y-%m-%d %H:%M:%S")}
        for c in by_cols:
            cols[c] = batch.column(c)
        if sum_col:
            cols[sum_col] = batch.column(sum_col)
        return pa.table(cols)

    projected = ds.select_columns(need).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )
    aggs = [Count(alias_name="n")]
    if sum_col:
        aggs.append(Sum(sum_col, alias_name="total"))
    return projected.groupby(["window"] + by_cols).aggregate(*aggs)
