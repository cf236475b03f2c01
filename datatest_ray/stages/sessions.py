"""Gap-based sessionization over event streams.

Engine extension (the reference has no streaming/window operators —
SURVEY.md §2.H).  A session is a maximal run of one user's events where
consecutive gaps are <= ``gap``; the classic training-data /
clickstream primitive.

Plan: ONE ``groupby(user)`` shuffle, vectorized per-key merge (sort
timestamps, count gaps > threshold).  SQL-oracle-able via
``lag() OVER (PARTITION BY user ORDER BY ts)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["sessionize"]


def sessionize(ds, *, by: str, ts: str, gap_s: float = 1800.0):
    """Per-key session stats: (key, n_events, n_sessions,
    max_session_events).  Sessions split where the gap between
    consecutive events exceeds ``gap_s`` seconds."""
    gap_us = int(gap_s * 1_000_000)

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                by: batch.column(by),
                "ts_us": pc.cast(
                    pc.cast(batch.column(ts), pa.timestamp("us")), pa.int64()
                ),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        t = np.sort(group.column("ts_us").to_numpy(zero_copy_only=False))
        n = len(t)
        breaks = np.diff(t) > gap_us
        n_sessions = int(breaks.sum()) + 1 if n else 0
        # events per session = distances between break positions
        edges = np.concatenate([[0], np.flatnonzero(breaks) + 1, [n]])
        max_len = int(np.diff(edges).max()) if n else 0
        return pa.table(
            {
                by: group.column(by).slice(0, 1),
                "n_events": pa.array([n], pa.int64()),
                "n_sessions": pa.array([n_sessions], pa.int64()),
                "max_session_events": pa.array([max_len], pa.int64()),
            }
        )

    projected = ds.select_columns([by, ts]).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )
    return projected.groupby(by).map_groups(merge, batch_format="pyarrow")
