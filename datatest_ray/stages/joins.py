"""As-of join (time-series point lookup) — a custom operator Ray Data
lacks (SURVEY.md §2.H "joins/lookups"; the reference has none either).

``asof_join_latest(left, right, by=..., ts=...)``: for every left row,
find the LATEST right row of the same ``by`` key with
``right.ts <= left.ts``.

Plan (no dedicated join operator needed): both sides project to one
tagged schema, union, ONE ``groupby(by)`` shuffle, and a vectorized
per-key merge (sort right timestamps once, ``np.searchsorted`` for all
left rows).  Partitioning assumption: a single ``by`` key's rows fit in
one group (true for per-user/per-entity event streams; salt by time
range via stages/salting.py if a key is pathologically hot).

Output columns are tie-immune: the matched right TIMESTAMP (epoch µs)
and the gap, never a payload column an equal-timestamp tie could make
ambiguous across engines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["asof_join_latest", "asof_join_next"]


def _project(ds, by: str, ts: str, id_col: str, side: int):
    def kernel(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(pc.cast(batch.column(ts), pa.timestamp("us")), pa.int64())
        ids = (
            batch.column(id_col)
            if side == 1
            else pa.nulls(batch.num_rows, pa.int64())
        )
        return pa.table(
            {
                "k": batch.column(by),
                "ts_us": ts_us,
                "left_id": ids,
                "side": pa.array(
                    np.full(batch.num_rows, side, dtype=np.int8)
                ),
            }
        )

    cols = [by, ts] + ([id_col] if side == 1 else [])
    return ds.select_columns(cols).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


def asof_join_latest(left_ds, right_ds, *, by: str, ts: str,
                     left_id: str, tolerance_us: int | None = None):
    """(left_id, k, prior_ts_us, gap_us) — one row per LEFT row; nulls
    when no right row precedes it.  With ``tolerance_us`` set, a match
    whose gap exceeds the tolerance is treated as no-match (nulls) —
    the bounded-staleness variant (pandas ``merge_asof(tolerance=)``):
    since the as-of match is the LATEST prior row, any earlier row is
    staler still, so exceeding the tolerance means no row qualifies."""
    tagged = _project(left_ds, by, ts, left_id, side=1).union(
        _project(right_ds, by, ts, left_id, side=0)
    )

    def merge(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy(zero_copy_only=False)
        ts_us = group.column("ts_us").to_numpy(zero_copy_only=False)
        lmask = side == 1
        l_ts = ts_us[lmask]
        r_ts = np.sort(ts_us[~lmask])
        lid = group.column("left_id").filter(pa.array(lmask))
        key = group.column("k").filter(pa.array(lmask))
        prior = np.zeros_like(l_ts)
        if r_ts.size:
            idx = np.searchsorted(r_ts, l_ts, side="right") - 1
            has = idx >= 0
            prior[has] = r_ts[idx[has]]
        else:
            # key has left rows but no right rows: all-null match
            has = np.zeros(l_ts.shape, dtype=bool)
        if tolerance_us is not None:
            has = has & (l_ts - prior <= tolerance_us)
        prior_arr = pa.array(prior, type=pa.int64(), mask=~has)
        gap_arr = pa.array(l_ts - prior, type=pa.int64(), mask=~has)
        return pa.table(
            {"left_id": lid, "k": key, "prior_ts_us": prior_arr,
             "gap_us": gap_arr}
        )

    return tagged.groupby("k").map_groups(merge, batch_format="pyarrow")


def asof_join_next(left_ds, right_ds, *, by: str, ts: str,
                   left_id: str):
    """Forward as-of: for every left row, the EARLIEST right row of the
    same key with ``right.ts >= left.ts`` (inclusive).  Output
    (left_id, k, next_ts_us, gap_us); nulls when nothing follows.
    Same one-shuffle plan and tie-immune output as
    :func:`asof_join_latest`."""
    tagged = _project(left_ds, by, ts, left_id, side=1).union(
        _project(right_ds, by, ts, left_id, side=0)
    )

    def merge(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy(zero_copy_only=False)
        ts_us = group.column("ts_us").to_numpy(zero_copy_only=False)
        lmask = side == 1
        l_ts = ts_us[lmask]
        r_ts = np.sort(ts_us[~lmask])
        lid = group.column("left_id").filter(pa.array(lmask))
        key = group.column("k").filter(pa.array(lmask))
        nxt = np.zeros_like(l_ts)
        if r_ts.size:
            idx = np.searchsorted(r_ts, l_ts, side="left")
            has = idx < r_ts.size
            nxt[has] = r_ts[idx[has]]
        else:
            has = np.zeros(l_ts.shape, dtype=bool)
        nxt_arr = pa.array(nxt, type=pa.int64(), mask=~has)
        gap_arr = pa.array(nxt - l_ts, type=pa.int64(), mask=~has)
        return pa.table(
            {"left_id": lid, "k": key, "next_ts_us": nxt_arr,
             "gap_us": gap_arr}
        )

    return tagged.groupby("k").map_groups(merge, batch_format="pyarrow")
