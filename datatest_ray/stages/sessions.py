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

__all__ = ["sessionize", "session_durations", "funnel_conversion",
           "rate_limit"]


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


def funnel_conversion(ds, *, by: str, ts: str, type_col: str,
                      from_type: str, to_type: str,
                      within_s: float = 3600.0, n_buckets: int = 256):
    """Two-step funnel: per key, how many ``from_type`` events were
    followed by a ``to_type`` event within ``within_s`` seconds —
    (key, n_from, n_to, n_conv, min_gap_us) with min_gap_us the
    smallest qualifying gap (null when no conversion).  The conversion
    primitive of clickstream / training-data event pipelines.

    Plan: rows filtered to the two step types at the scan, ONE
    coarse-bucket shuffle (``hash(key) % n_buckets`` — never one tiny
    group per key), then a fully vectorized kernel: sort by (key, ts,
    step) putting same-timestamp targets AFTER sources, find each
    source's next target with one ``searchsorted`` over target
    positions (first target at ts >= source ts within the key's
    contiguous run), then per-key bincounts.  A source's FIRST
    following target has the minimal gap, so "first within the window"
    equals SQL's "EXISTS target in [t, t+w]"."""
    from ..functions.aggregates import hash64

    win_us = int(within_s * 1_000_000)

    def project(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch.column(type_col),
                     value_set=pa.array([from_type, to_type]))
        t = batch.filter(m)
        coarse = (hash64(t.column(by)) % np.uint64(n_buckets)).astype(
            np.int64)
        return pa.table({
            by: t.column(by),
            "ts_us": pc.cast(
                pc.cast(t.column(ts), pa.timestamp("us")), pa.int64()),
            "isp": pc.cast(
                pc.equal(t.column(type_col), to_type), pa.int8()),
            "coarse": pa.array(coarse),
        })

    def kernel(group: pa.Table) -> pa.Table:
        keys = group.column(by).to_numpy(zero_copy_only=False)
        t = group.column("ts_us").to_numpy(zero_copy_only=False)
        isp = group.column("isp").to_numpy(zero_copy_only=False).astype(bool)
        order = np.lexsort((isp, t, keys))
        keys, t, isp = keys[order], t[order], isp[order]
        uniq, code = np.unique(keys, return_inverse=True)
        m = len(uniq)
        n_to = np.bincount(code[isp], minlength=m)
        n_from = np.bincount(code[~isp], minlength=m)
        P = np.flatnonzero(isp)  # target positions, ascending
        C = np.flatnonzero(~isp)
        n_conv = np.zeros(m, dtype=np.int64)
        min_gap = np.full(m, np.iinfo(np.int64).max, dtype=np.int64)
        if len(P) and len(C):
            nxt = np.searchsorted(P, C, side="left")
            has = nxt < len(P)
            np_pos = P[np.minimum(nxt, len(P) - 1)]
            gap = t[np_pos] - t[C]
            ok = has & (code[np_pos] == code[C]) & (gap <= win_us)
            n_conv = np.bincount(code[C][ok], minlength=m)
            np.minimum.at(min_gap, code[C][ok], gap[ok])
        no_conv = n_conv == 0
        return pa.table({
            by: pa.array(uniq),
            "n_from": pa.array(n_from.astype(np.int64)),
            "n_to": pa.array(n_to.astype(np.int64)),
            "n_conv": pa.array(n_conv.astype(np.int64)),
            "min_gap_us": pa.array(
                np.where(no_conv, 0, min_gap), pa.int64(), mask=no_conv),
        })

    return (
        ds.select_columns([by, ts, type_col])
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse")
        .map_groups(kernel, batch_format="pyarrow")
        .select_columns([by, "n_from", "n_to", "n_conv", "min_gap_us"])
    )


def session_durations(ds, *, by: str, ts: str, gap_s: float = 1800.0):
    """Per-key session DURATION stats: (key, n_sessions, total_dur_us,
    max_dur_us) where a session's duration is last-event − first-event
    (0 for singleton sessions).  Same gap rule and single
    ``groupby(key)`` plan as :func:`sessionize`; the kernel reads
    durations off the sorted timestamp array's break edges."""
    gap_us = int(gap_s * 1_000_000)

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            by: batch.column(by),
            "ts_us": pc.cast(
                pc.cast(batch.column(ts), pa.timestamp("us")), pa.int64()),
        })

    def merge(group: pa.Table) -> pa.Table:
        t = np.sort(group.column("ts_us").to_numpy(zero_copy_only=False))
        n = len(t)
        if not n:
            return pa.table({
                by: group.column(by).slice(0, 1),
                "n_sessions": pa.array([0], pa.int64()),
                "total_dur_us": pa.array([0], pa.int64()),
                "max_dur_us": pa.array([0], pa.int64()),
            })
        breaks = np.diff(t) > gap_us
        starts = np.concatenate([[0], np.flatnonzero(breaks) + 1])
        ends = np.concatenate([np.flatnonzero(breaks), [n - 1]])
        dur = t[ends] - t[starts]
        return pa.table({
            by: group.column(by).slice(0, 1),
            "n_sessions": pa.array([len(starts)], pa.int64()),
            "total_dur_us": pa.array([int(dur.sum())], pa.int64()),
            "max_dur_us": pa.array([int(dur.max())], pa.int64()),
        })

    projected = ds.select_columns([by, ts]).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )
    return projected.groupby(by).map_groups(merge, batch_format="pyarrow")


def funnel_steps(ds, *, by: str, ts: str, type_col: str, steps,
                 n_buckets: int = 256):
    """Multi-step funnel (ordered subsequence match): per key, walk the
    earliest chain step1 < step2 < ... (each step's FIRST event
    strictly after the previous step's time) and count how many keys
    reach each stage — the k-step generalization of
    :func:`funnel_conversion` (no window bound; strict-inequality
    ordering mirrors the SQL ``e.ts > prev.t`` oracle).

    Output: (step int64 1-based, step_type, n_keys).

    Plan: rows filtered to the step types at the scan, ONE coarse-
    bucket shuffle, then a vectorized kernel: one sort per bucket; for
    each step a per-key segment MIN over that step's timestamps that
    exceed the key's previous-step time (mask + minimum.reduceat-style
    scatter) — no Python loop over keys.  Bucket partials then sum in
    one tiny groupby.
    """
    from ray.data.aggregate import Sum

    from ..functions.aggregates import hash64

    steps = list(steps)
    k = len(steps)

    def project(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.is_in(batch.column(type_col), value_set=pa.array(steps)),
            pc.and_(pc.is_valid(batch.column(by)),
                    pc.is_valid(batch.column(ts))))
        t = batch.filter(m)
        coarse = (hash64(t.column(by)) % np.uint64(n_buckets)).astype(
            np.int64)
        step_idx = pc.index_in(t.column(type_col),
                               value_set=pa.array(steps))
        return pa.table({
            by: t.column(by),
            "ts_us": pc.cast(
                pc.cast(t.column(ts), pa.timestamp("us")), pa.int64()),
            "si": pc.cast(step_idx, pa.int8()),
            "coarse": pa.array(coarse),
        })

    def kernel(group: pa.Table) -> pa.Table:
        keys = group.column(by).to_numpy(zero_copy_only=False)
        t = group.column("ts_us").to_numpy(zero_copy_only=False)
        si = group.column("si").to_numpy(zero_copy_only=False)
        order = np.lexsort((t, keys))
        keys, t, si = keys[order], t[order], si[order]
        n = len(keys)
        counts = np.zeros(k, dtype=np.int64)
        if n:
            new = np.ones(n, dtype=bool)
            new[1:] = keys[1:] != keys[:-1]
            seg = np.cumsum(new) - 1
            nseg = int(seg[-1]) + 1
            prev = np.full(nseg, -(1 << 62), dtype=np.int64)
            alive = np.ones(nseg, dtype=bool)
            for s in range(k):
                m = (si == s) & alive[seg] & (t > prev[seg])
                best = np.full(nseg, np.iinfo(np.int64).max, dtype=np.int64)
                np.minimum.at(best, seg[m], t[m])
                reached = best < np.iinfo(np.int64).max
                alive &= reached
                prev = np.where(alive, best, prev)
                counts[s] = int(alive.sum())
        out = {"step": pa.array(np.arange(1, k + 1, dtype=np.int64)),
               "step_type": pa.array(steps, pa.string()),
               "n_keys": pa.array(counts)}
        return pa.table(out)

    partials = ds.select_columns(
        list(dict.fromkeys([by, ts, type_col]))
    ).map_batches(project, batch_format="pyarrow", zero_copy_batch=True
                  ).groupby("coarse").map_groups(kernel,
                                                 batch_format="pyarrow")
    return partials.groupby(["step", "step_type"]).aggregate(
        Sum("n_keys", alias_name="n_keys"))


def rate_limit(ds, *, by: str, ts: str, id_col: str, window_s: int = 3600,
               cap: int = 1, n_buckets: int = 256):
    """Windowed rate-limit audit: events beyond the first ``cap`` per
    (key, tumbling window of ``window_s`` seconds) are SUPPRESSED —
    the dedup/throttle primitive event collectors apply before a
    training-data pipeline ever sees the stream.

    Output: one row per suppressed event, (id_col, by, rn) where
    ``rn`` is the event's 1-based arrival rank inside its window
    (ordered by ts then id; rn > cap).  SQL oracle:
    ``row_number() OVER (PARTITION BY key, date_trunc(...) ORDER BY
    ts, id) > cap``.

    Plan: one coarse ``hash(key) % n_buckets`` shuffle (never one tiny
    group per key), per-bucket Arrow sort by (key, window, ts, id) +
    numpy segment ranks — no Python loop.  Partitioning assumption:
    one bucket fits in a task's heap; raise ``n_buckets`` at scale.
    """
    from ..functions.aggregates import hash64

    win_us = int(window_s) * 1_000_000
    need = [id_col, by, ts]

    def project(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(
            pc.cast(batch.column(ts), pa.timestamp("us")), pa.int64())
        coarse = (hash64(batch.column(by)) % np.uint64(n_buckets)).astype(
            np.int64)
        # integer floor-divide (timestamps are post-epoch, so truncation
        # == floor); keeps window ids exact at any magnitude
        win = pc.multiply(pc.divide(ts_us, win_us), win_us)
        return pa.table({
            id_col: batch.column(id_col),
            by: batch.column(by),
            "ts_us": ts_us,
            "win": win,
            "coarse": pa.array(coarse),
        })

    def kernel(group: pa.Table) -> pa.Table:
        t = group.sort_by([(by, "ascending"), ("win", "ascending"),
                           ("ts_us", "ascending"), (id_col, "ascending")])
        keys = t.column(by).to_numpy(zero_copy_only=False)
        win = t.column("win").to_numpy(zero_copy_only=False)
        n = len(win)
        if n == 0:
            return pa.table({id_col: t.column(id_col), by: t.column(by),
                             "rn": pa.array([], pa.int64())})
        new_seg = np.ones(n, dtype=bool)
        new_seg[1:] = (keys[1:] != keys[:-1]) | (win[1:] != win[:-1])
        seg = np.cumsum(new_seg) - 1
        seg_start = np.flatnonzero(new_seg)[seg]
        rn = np.arange(n, dtype=np.int64) - seg_start + 1
        keep = rn > cap
        out = t.filter(pa.array(keep))
        return pa.table({
            id_col: out.column(id_col),
            by: out.column(by),
            "rn": pa.array(rn[keep]),
        })

    return ds.select_columns(need).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("coarse").map_groups(
        kernel, batch_format="pyarrow"
    ).select_columns([id_col, by, "rn"])
