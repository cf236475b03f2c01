"""Ordered event-sequence operators (first/last, transitions, EWMA,
monotonicity, streaks).

Engine extensions (the reference has no sequence operators — SURVEY.md
§2.H); these are the per-key ORDERED primitives a clickstream /
training-data pipeline needs beyond sessionization: endpoint
attribution (first/last touch), Markov transition counts, recency
weighting (EWMA), ingest-order monotonicity validation, and
consecutive-day streaks.

Plan (shared by every operator here): ONE shuffle on a bounded coarse
key (``hash(key) % n_buckets`` — never a groupby with one tiny group
per key), then a fully vectorized per-bucket kernel: one
``np.lexsort`` by (key, order, tie), boundary masks / bincounts per
segment, no Python loop over rows or keys.  Partitioning assumption:
one BUCKET (not one key) fits in a task's heap; raise ``n_buckets``
for bigger corpora.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.aggregates import hash64

__all__ = ["first_last_by", "transition_counts", "ewma_last",
           "inversion_counts", "day_streaks", "next_day_retention",
           "interval_islands", "late_events", "time_weighted_avg",
           "peak_concurrency", "scd2_intervals", "first_touch_attribution",
           "transition_cond_entropy"]


def _ts_us(col):
    return pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())


def _bucketed(ds, project, n_buckets: int):
    return ds.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("coarse")


def _seg_first(keys: np.ndarray) -> np.ndarray:
    new = np.ones(len(keys), dtype=bool)
    if len(keys) > 1:
        new[1:] = keys[1:] != keys[:-1]
    return new


def _seg_cummax(v: np.ndarray, seg: np.ndarray,
                new: np.ndarray) -> np.ndarray:
    """Per-segment running max over a segment-sorted int64 array.

    One global ``np.maximum.accumulate`` over ``(v - base) + K·segid``
    (K > value range, so a later segment's floor always exceeds an
    earlier segment's ceiling — no cross-segment leak).  Values are
    normalized to their RANGE first: epoch-µs magnitudes would
    otherwise overflow int64 at a handful of segments.  Falls back to
    an exact per-segment accumulate (loop over segments, vectorized
    within each — never over rows) when range × #segments still
    cannot fit."""
    n = len(v)
    nseg = int(seg[-1]) + 1
    base = int(v.min())
    v2 = v - base
    K = int(v2.max()) + 1
    if K * nseg < (1 << 62):
        return np.maximum.accumulate(v2 + K * seg) - K * seg + base
    out = np.empty_like(v)
    starts_all = np.append(np.flatnonzero(new), n)
    for a, b in zip(starts_all[:-1], starts_all[1:]):
        out[a:b] = np.maximum.accumulate(v[a:b])
    return out


def first_last_by(ds, *, by: str, ts: str, value_col: str, id_col: str,
                  n_buckets: int = 256):
    """First/last-touch attribution: per key the value of the earliest
    and latest row ordered by (ts, id) — SQL's
    ``row_number() OVER (... ORDER BY ts, id) = 1 / = n``.

    Output: (by, n_events, first_value, last_value).
    """
    def project(batch: pa.Table) -> pa.Table:
        coarse = (hash64(batch.column(by)) % np.uint64(n_buckets)).astype(
            np.int64)
        return pa.table({
            by: batch.column(by),
            "_t": _ts_us(batch.column(ts)),
            "_i": pc.cast(batch.column(id_col), pa.int64()),
            "_v": batch.column(value_col),
            "coarse": pa.array(coarse),
        })

    def kernel(group: pa.Table) -> pa.Table:
        keys = group.column(by).to_numpy(zero_copy_only=False)
        t = group.column("_t").to_numpy(zero_copy_only=False)
        i = group.column("_i").to_numpy(zero_copy_only=False)
        order = np.lexsort((i, t, keys))
        keys = keys[order]
        first = _seg_first(keys)
        starts = np.flatnonzero(first)
        ends = np.concatenate([starts[1:] - 1, [len(keys) - 1]]) \
            if len(keys) else np.array([], dtype=np.int64)
        n = (ends - starts + 1).astype(np.int64)
        vals = group.column("_v")
        vals = vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) \
            else vals
        idx = pa.array(order, pa.int64())
        sorted_vals = pc.take(vals, idx)
        kcol = group.column(by)
        kcol = kcol.combine_chunks() if isinstance(kcol, pa.ChunkedArray) \
            else kcol
        return pa.table({
            by: pc.take(kcol, pa.array(order[starts], pa.int64())),
            "n_events": pa.array(n),
            "first_value": pc.take(sorted_vals, pa.array(starts, pa.int64())),
            "last_value": pc.take(sorted_vals, pa.array(ends, pa.int64())),
        })

    return _bucketed(ds.select_columns(
        list(dict.fromkeys([by, ts, value_col, id_col]))), project,
        n_buckets).map_groups(kernel, batch_format="pyarrow"
    ).select_columns([by, "n_events", "first_value", "last_value"])


def transition_counts(ds, *, by: str, ts: str, type_col: str, id_col: str,
                      n_buckets: int = 256):
    """Markov transition matrix over event types: count of consecutive
    (from → to) pairs within a key's (ts, id)-ordered stream — SQL's
    ``lead() OVER (PARTITION BY key ORDER BY ts, id)`` + group count.

    Output: (from_type, to_type, n).  The per-bucket kernel
    PRE-COUNTS pairs (dictionary codes → bincount), so the final
    ``groupby([from,to])`` shuffle moves one row per distinct pair per
    bucket, never one row per event pair.
    """
    from ray.data.aggregate import Sum

    def project(batch: pa.Table) -> pa.Table:
        coarse = (hash64(batch.column(by)) % np.uint64(n_buckets)).astype(
            np.int64)
        return pa.table({
            by: batch.column(by),
            "_t": _ts_us(batch.column(ts)),
            "_i": pc.cast(batch.column(id_col), pa.int64()),
            "_y": batch.column(type_col),
            "coarse": pa.array(coarse),
        })

    def kernel(group: pa.Table) -> pa.Table:
        keys = group.column(by).to_numpy(zero_copy_only=False)
        t = group.column("_t").to_numpy(zero_copy_only=False)
        i = group.column("_i").to_numpy(zero_copy_only=False)
        order = np.lexsort((i, t, keys))
        keys = keys[order]
        ycol = group.column("_y")
        ycol = ycol.combine_chunks() if isinstance(ycol, pa.ChunkedArray) \
            else ycol
        enc = pc.dictionary_encode(pc.take(ycol, pa.array(order, pa.int64())))
        code = np.asarray(enc.indices, dtype=np.int64)
        k = len(enc.dictionary)
        empty = pa.table({
            "from_type": pa.array([], enc.dictionary.type),
            "to_type": pa.array([], enc.dictionary.type),
            "n": pa.array([], pa.int64()),
        })
        if len(keys) < 2:
            return empty
        same = keys[1:] == keys[:-1]
        frm = code[:-1][same]
        to = code[1:][same]
        if not len(frm):
            return empty
        pair = frm * k + to
        cnt = np.bincount(pair, minlength=k * k)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "from_type": pc.take(enc.dictionary,
                                 pa.array(nz // k, pa.int64())),
            "to_type": pc.take(enc.dictionary, pa.array(nz % k, pa.int64())),
            "n": pa.array(cnt[nz], pa.int64()),
        })

    partials = _bucketed(ds.select_columns(
        list(dict.fromkeys([by, ts, type_col, id_col]))), project,
        n_buckets).map_groups(kernel, batch_format="pyarrow")
    return partials.groupby(["from_type", "to_type"]).aggregate(
        Sum("n", alias_name="n"))


def ewma_last(ds, *, by: str, ts: str, value_col: str, id_col: str,
              alpha: float = 0.3, n_buckets: int = 256):
    """Per-key exponentially-weighted moving average of ``value_col``
    over the (ts, id)-ordered stream, reporting the FINAL (most recent)
    EWMA — the recency-weighted feature of behavioral pipelines.

    Closed form (matches the recurrence ``y_i = a·x_i + (1-a)·y_{i-1}``
    with ``y_1 = x_1``):  ``y_n = (1-a)^{n-1}·x_1 +
    a·Σ_{i=2..n} (1-a)^{n-i}·x_i`` — one weighted bincount per bucket,
    identical to the SQL ``sum(x * CASE ...)`` oracle form.

    Output: (by, n_events, ewma) with ewma rounded to 6 dp (both sides
    compute the same closed form; rounding pins the float repr).
    """
    def project(batch: pa.Table) -> pa.Table:
        coarse = (hash64(batch.column(by)) % np.uint64(n_buckets)).astype(
            np.int64)
        return pa.table({
            by: batch.column(by),
            "_t": _ts_us(batch.column(ts)),
            "_i": pc.cast(batch.column(id_col), pa.int64()),
            "_v": pc.cast(batch.column(value_col), pa.float64()),
            "coarse": pa.array(coarse),
        })

    def kernel(group: pa.Table) -> pa.Table:
        keys = group.column(by).to_numpy(zero_copy_only=False)
        t = group.column("_t").to_numpy(zero_copy_only=False)
        i = group.column("_i").to_numpy(zero_copy_only=False)
        v = group.column("_v").to_numpy(zero_copy_only=False)
        order = np.lexsort((i, t, keys))
        keys, v = keys[order], v[order]
        first = _seg_first(keys)
        seg = np.cumsum(first) - 1
        m = int(seg[-1]) + 1 if len(seg) else 0
        starts = np.flatnonzero(first)
        n = np.bincount(seg, minlength=m)
        rn = np.arange(len(keys)) - starts[seg] + 1  # 1-based row number
        w = alpha * np.power(1.0 - alpha, (n[seg] - rn).astype(np.float64))
        w[first] = np.power(1.0 - alpha, (n[seg] - rn).astype(np.float64))[first]
        # null values: SQL's sum(v * w) skips them while the row keeps
        # its position in the weight schedule (rn / n unchanged); a key
        # whose values are ALL null gets SQL's sum-of-nothing = NULL,
        # not 0 (fuzz seed 777777 under carve=3 hot-key skew)
        ok = ~np.isnan(v)
        y = np.bincount(seg, weights=np.where(ok, v, 0.0) * w,
                        minlength=m)
        n_ok = np.bincount(seg, weights=ok.astype(np.float64),
                           minlength=m)
        kcol = group.column(by)
        kcol = kcol.combine_chunks() if isinstance(kcol, pa.ChunkedArray) \
            else kcol
        return pa.table({
            by: pc.take(kcol, pa.array(order[starts], pa.int64())),
            "n_events": pa.array(n.astype(np.int64)),
            "ewma": pa.array(np.round(y, 6), mask=n_ok == 0),
        })

    return _bucketed(ds.select_columns(
        list(dict.fromkeys([by, ts, value_col, id_col]))), project,
        n_buckets).map_groups(kernel, batch_format="pyarrow"
    ).select_columns([by, "n_events", "ewma"])


def inversion_counts(ds, *, by: str, seq_col: str, ts: str,
                     n_buckets: int = 256):
    """Ingest-order monotonicity check: per key, how many rows arrive
    with a timestamp STRICTLY BEFORE their predecessor's when ordered
    by ``seq_col`` (ingest sequence) — the out-of-order-delivery
    validation of event pipelines (SQL: ``ts < lag(ts) OVER
    (PARTITION BY key ORDER BY seq)``).

    Output: (by, n_events, n_inversions).
    """
    def project(batch: pa.Table) -> pa.Table:
        coarse = (hash64(batch.column(by)) % np.uint64(n_buckets)).astype(
            np.int64)
        return pa.table({
            by: batch.column(by),
            "_s": pc.cast(batch.column(seq_col), pa.int64()),
            "_t": _ts_us(batch.column(ts)),
            "coarse": pa.array(coarse),
        })

    def kernel(group: pa.Table) -> pa.Table:
        keys = group.column(by).to_numpy(zero_copy_only=False)
        s = group.column("_s").to_numpy(zero_copy_only=False)
        t = group.column("_t").to_numpy(zero_copy_only=False)
        order = np.lexsort((s, keys))
        keys, t = keys[order], t[order]
        first = _seg_first(keys)
        seg = np.cumsum(first) - 1
        m = int(seg[-1]) + 1 if len(seg) else 0
        inv = np.zeros(len(keys), dtype=bool)
        if len(keys) > 1:
            inv[1:] = (~first[1:]) & (t[1:] < t[:-1])
        starts = np.flatnonzero(first)
        kcol = group.column(by)
        kcol = kcol.combine_chunks() if isinstance(kcol, pa.ChunkedArray) \
            else kcol
        return pa.table({
            by: pc.take(kcol, pa.array(order[starts], pa.int64())),
            "n_events": pa.array(np.bincount(seg, minlength=m).astype(
                np.int64)),
            "n_inversions": pa.array(
                np.bincount(seg[inv], minlength=m).astype(np.int64)),
        })

    return _bucketed(ds.select_columns(
        list(dict.fromkeys([by, seq_col, ts]))), project,
        n_buckets).map_groups(kernel, batch_format="pyarrow"
    ).select_columns([by, "n_events", "n_inversions"])


def day_streaks(ds, *, by: str, ts: str, n_buckets: int = 256):
    """Longest consecutive-day streak per key (gaps-and-islands):
    distinct UTC days per key, longest run where successive days differ
    by exactly 1.

    Output: (by, n_days, max_streak).
    """
    DAY_US = 86_400_000_000

    def project(batch: pa.Table) -> pa.Table:
        coarse = (hash64(batch.column(by)) % np.uint64(n_buckets)).astype(
            np.int64)
        day = pc.divide(_ts_us(batch.column(ts)), DAY_US)
        return pa.table({
            by: batch.column(by),
            "_d": day,
            "coarse": pa.array(coarse),
        })

    def kernel(group: pa.Table) -> pa.Table:
        keys = group.column(by).to_numpy(zero_copy_only=False)
        d = group.column("_d").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, keys))
        keys, d = keys[order], d[order]
        keep = np.ones(len(keys), dtype=bool)  # distinct (key, day)
        if len(keys) > 1:
            keep[1:] = (keys[1:] != keys[:-1]) | (d[1:] != d[:-1])
        keys, d, order = keys[keep], d[keep], order[keep]
        first = _seg_first(keys)
        seg = np.cumsum(first) - 1
        m = int(seg[-1]) + 1 if len(seg) else 0
        # island id: bump wherever a new key starts or the day gap != 1
        new_island = first.copy()
        if len(keys) > 1:
            new_island[1:] |= d[1:] != d[:-1] + 1
        isl = np.cumsum(new_island) - 1
        isl_len = np.bincount(isl)
        isl_seg = seg[np.flatnonzero(new_island)]
        max_streak = np.zeros(m, dtype=np.int64)
        np.maximum.at(max_streak, isl_seg, isl_len)
        starts = np.flatnonzero(first)
        kcol = group.column(by)
        kcol = kcol.combine_chunks() if isinstance(kcol, pa.ChunkedArray) \
            else kcol
        return pa.table({
            by: pc.take(kcol, pa.array(order[starts], pa.int64())),
            "n_days": pa.array(np.bincount(seg, minlength=m).astype(
                np.int64)),
            "max_streak": pa.array(max_streak),
        })

    return _bucketed(ds.select_columns([by, ts]), project,
                     n_buckets).map_groups(kernel, batch_format="pyarrow"
    ).select_columns([by, "n_days", "max_streak"])


def next_day_retention(ds, *, by: str, ts: str, n_buckets: int = 256):
    """Classic D1 retention: for each UTC day, how many active keys
    were ALSO active the next day.  Output: (day, n_active,
    n_retained).

    Plan: the standard coarse-bucket shuffle on the key, then a
    vectorized kernel over distinct (key, day) pairs — same-key
    consecutive day-diff == 1 marks retention — emitting per-day
    partial counts; one final tiny ``groupby(day).sum``."""
    from ray.data.aggregate import Sum

    DAY_US = 86_400_000_000

    def project(batch: pa.Table) -> pa.Table:
        coarse = (hash64(batch.column(by)) % np.uint64(n_buckets)).astype(
            np.int64)
        return pa.table({
            by: batch.column(by),
            "_d": pc.divide(_ts_us(batch.column(ts)), DAY_US),
            "coarse": pa.array(coarse),
        })

    def kernel(group: pa.Table) -> pa.Table:
        keys = group.column(by).to_numpy(zero_copy_only=False)
        d = group.column("_d").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, keys))
        keys, d = keys[order], d[order]
        keep = np.ones(len(keys), dtype=bool)
        if len(keys) > 1:
            keep[1:] = (keys[1:] != keys[:-1]) | (d[1:] != d[:-1])
        keys, d = keys[keep], d[keep]
        if not len(keys):
            return pa.table({"day": pa.array([], pa.int64()),
                             "n_active": pa.array([], pa.int64()),
                             "n_retained": pa.array([], pa.int64())})
        ret = np.zeros(len(keys), dtype=bool)
        if len(keys) > 1:
            ret[:-1] = (keys[1:] == keys[:-1]) & (d[1:] == d[:-1] + 1)
        days, inv = np.unique(d, return_inverse=True)
        return pa.table({
            "day": pa.array(days, pa.int64()),
            "n_active": pa.array(np.bincount(inv).astype(np.int64)),
            "n_retained": pa.array(
                np.bincount(inv[ret], minlength=len(days)).astype(np.int64)),
        })

    partials = _bucketed(ds.select_columns([by, ts]), project,
                         n_buckets).map_groups(kernel,
                                               batch_format="pyarrow")
    return partials.groupby("day").aggregate(
        Sum("n_active", alias_name="n_active"),
        Sum("n_retained", alias_name="n_retained"))


def interval_islands(ds, *, by: str, start_col: str, end_col: str,
                     n_buckets: int = 256):
    """Gaps-and-islands: merge each key's overlapping-or-touching
    [start, end] intervals into maximal islands (next.start <= running
    max end joins the island) and report per key the island count and
    total covered span — the coverage/fragmentation audit for shipping
    windows, session spans, on-call rotations.

    Output: (by, n_islands int64, covered int64 = Σ(island_end −
    island_start)).  Inputs are int64 units (e.g. epoch days).

    Vectorized island detection without a per-key loop: after one sort
    by (key, start, end), the per-segment running max of ``end`` is one
    global ``np.maximum.accumulate`` over ``end + K·segid`` (K > max
    end, so a later segment's floor always exceeds an earlier segment's
    ceiling — the accumulate can never leak a previous key's max
    forward).  An island starts where the segment starts or where
    ``start > running_max_end`` of the rows before it.
    """
    need = [by, start_col, end_col]

    def project(batch: pa.Table) -> pa.Table:
        coarse = (hash64(batch.column(by)) % np.uint64(n_buckets)).astype(
            np.int64)
        return batch.select(need).append_column("coarse", pa.array(coarse))

    def kernel(group: pa.Table) -> pa.Table:
        t = group.sort_by([(by, "ascending"), (start_col, "ascending"),
                           (end_col, "ascending")])
        keys = t.column(by).to_numpy(zero_copy_only=False)
        s = t.column(start_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        e = t.column(end_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(s)
        if n == 0:
            empty = pa.array([], pa.int64())
            return pa.table({by: t.column(by), "n_islands": empty,
                             "covered": empty})
        new = _seg_first(keys)
        seg = np.cumsum(new) - 1
        cummax = _seg_cummax(e, seg, new)
        isl_start = new.copy()
        isl_start[1:] |= s[1:] > cummax[:-1]
        isl = np.cumsum(isl_start) - 1
        isl_s = s[np.flatnonzero(isl_start)]
        # island end = running max at the island's last row
        isl_last = np.empty(isl_start.sum(), dtype=np.int64)
        isl_last[:-1] = np.flatnonzero(isl_start)[1:] - 1
        isl_last[-1] = n - 1
        isl_e = cummax[isl_last]
        isl_seg = seg[np.flatnonzero(isl_start)]
        n_isl = np.bincount(isl_seg)
        covered = np.bincount(isl_seg, weights=isl_e - isl_s).astype(
            np.int64)
        segstart = np.flatnonzero(new)
        return pa.table({
            by: pc.take(t.column(by), pa.array(segstart)),
            "n_islands": pa.array(n_isl.astype(np.int64)),
            "covered": pa.array(covered),
        })

    return ds.select_columns(need).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("coarse").map_groups(
        kernel, batch_format="pyarrow"
    ).select_columns([by, "n_islands", "covered"])


def late_events(ds, *, by: str, ts: str, seq_col: str,
                lateness_us: int, n_buckets: int = 256):
    """Watermark audit: per key, how many events arrived LATE — event
    timestamp more than ``lateness_us`` behind the running maximum
    timestamp of earlier arrivals (``seq_col`` is the ingest order) —
    the streaming-ingestion health metric that decides watermark delay
    and late-data policy.

    Output: (by, n_events, n_late, max_lateness_us).  Same one-shuffle
    sorted-segment plan as the rest of the module; the running max is
    the overflow-safe ``_seg_cummax``.
    """
    need = [by, seq_col, ts]

    def project(batch: pa.Table) -> pa.Table:
        coarse = (hash64(batch.column(by)) % np.uint64(n_buckets)).astype(
            np.int64)
        return pa.table({
            by: batch.column(by),
            seq_col: batch.column(seq_col),
            "_t": _ts_us(batch.column(ts)),
            "coarse": pa.array(coarse),
        })

    def kernel(group: pa.Table) -> pa.Table:
        t = group.sort_by([(by, "ascending"), (seq_col, "ascending")])
        keys = t.column(by).to_numpy(zero_copy_only=False)
        tv = t.column("_t").to_numpy(zero_copy_only=False)
        n = len(keys)
        if n == 0:
            e = pa.array([], pa.int64())
            return pa.table({by: t.column(by), "n_events": e,
                             "n_late": e, "max_lateness_us": e})
        new = _seg_first(keys)
        seg = np.cumsum(new) - 1
        cm = _seg_cummax(tv, seg, new)
        # lateness vs the watermark BEFORE this arrival (prev cummax)
        lateness = np.zeros(n, dtype=np.int64)
        lateness[1:] = cm[:-1] - tv[1:]
        lateness[new] = 0  # each key's first arrival is never late
        late = lateness > lateness_us
        segstart = np.flatnonzero(new)
        n_ev = np.bincount(seg)
        n_late = np.bincount(seg, weights=late).astype(np.int64)
        maxl = np.maximum(np.zeros(len(segstart), dtype=np.int64),
                          np.maximum.reduceat(lateness, segstart))
        return pa.table({
            by: pc.take(t.column(by), pa.array(segstart)),
            "n_events": pa.array(n_ev.astype(np.int64)),
            "n_late": pa.array(n_late),
            "max_lateness_us": pa.array(maxl),
        })

    return ds.select_columns(need).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("coarse").map_groups(
        kernel, batch_format="pyarrow"
    ).select_columns([by, "n_events", "n_late", "max_lateness_us"])


def time_weighted_avg(ds, *, by: str, ts: str, value_col: str,
                      id_col: str, n_buckets: int = 256):
    """Time-weighted average per key: each value is weighted by the
    seconds until the NEXT event of the same key (the value "held" for
    that long); the last event of a key carries no weight.  Keys with a
    single event yield no row — there is no holding interval.  Output:
    ``(by, twa, span_s)`` where span_s is the total weighted span.

    Mirrors ``sum(v * dt) / sum(dt)`` over ``dt = lead(ts) - ts``
    (ties on ts break by id, as everywhere in this module)."""

    def project(batch: pa.Table) -> pa.Table:
        coarse = (hash64(batch.column(by)) % np.uint64(n_buckets)).astype(
            np.int64)
        return pa.table({
            "coarse": pa.array(coarse),
            by: batch.column(by),
            "us": _ts_us(batch.column(ts)),
            "id": batch.column(id_col),
            "v": pc.cast(batch.column(value_col), pa.float64()),
        })

    def kernel(group: pa.Table) -> pa.Table:
        t = group.sort_by([(by, "ascending"), ("us", "ascending"),
                           ("id", "ascending")])
        keys = t.column(by).to_numpy(zero_copy_only=False)
        us = t.column("us").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        n = len(keys)
        if n == 0:
            return pa.table({by: t.column(by),
                             "twa": pa.array([], pa.float64()),
                             "span_s": pa.array([], pa.float64())})
        new = _seg_first(keys)
        seg = np.cumsum(new) - 1
        # dt to next row, valid only when the next row is the same key
        dt = np.zeros(n, dtype=np.float64)
        dt[:-1] = (us[1:] - us[:-1]) / 1e6
        last = np.zeros(n, dtype=bool)
        last[:-1] = new[1:]
        last[-1] = True
        dt[last] = 0.0
        # null values: SQL's sum(v * dt) skips them while sum(dt) still
        # counts their holding interval — mirror exactly
        wsum = np.bincount(seg,
                           weights=np.where(np.isnan(v), 0.0, v) * dt)
        span = np.bincount(seg, weights=dt)
        # SQL's sum over zero non-null terms is NULL, not 0: a group
        # whose every dt-carrying value is NULL must emit twa = NULL
        # (fuzz seed 1: a two-event user whose first value is null)
        terms = np.bincount(seg, weights=(~np.isnan(v) & ~last))
        has = span > 0
        first_idx = np.flatnonzero(new)
        keys_out = t.column(by).take(pa.array(first_idx[has]))
        twa = np.where(terms[has] > 0, wsum[has] / span[has], np.nan)
        return pa.table({
            by: keys_out,
            "twa": pa.array([None if np.isnan(x) else x for x in twa],
                            pa.float64()),
            "span_s": pa.array(span[has]),
        })

    return _bucketed(ds.select_columns(
        list(dict.fromkeys([by, ts, value_col, id_col]))), project,
        n_buckets).map_groups(kernel, batch_format="pyarrow")


def peak_concurrency(intervals_ds, *, start_col: str, end_col: str,
                     n_buckets: int = 32):
    """Maximum number of simultaneously-open intervals (peak concurrent
    sessions / users / connections).  End-exclusive: an interval ending
    at T does not overlap one starting at T (at equal timestamps the
    −1 boundary applies first — mirror with ``ORDER BY t, delta`` in a
    SQL window oracle).

    Distributed sweep without a global sort materialization (same
    two-level scan as ``drift.ks_exact``): boundaries are range-
    bucketed on time; a tiny per-bucket delta-sum gives each bucket's
    PREFIX offset; each bucket then sorts locally and reports its local
    running-max; the global max is the answer.  Returns one row
    ``(peak, n_intervals)``."""
    import ray
    from ray.data.aggregate import Max, Min, Sum

    def to_bounds(batch: pa.Table) -> pa.Table:
        s = _ts_us(batch.column(start_col)).to_numpy(zero_copy_only=False)
        e = _ts_us(batch.column(end_col)).to_numpy(zero_copy_only=False)
        t = np.concatenate([s, e])
        d = np.concatenate([np.ones(len(s), dtype=np.int64),
                            -np.ones(len(e), dtype=np.int64)])
        return pa.table({"t": pa.array(t), "d": pa.array(d)})

    bounds = intervals_ds.select_columns(
        [start_col, end_col]).map_batches(
        to_bounds, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_intervals = bounds.count() // 2
    if n_intervals == 0:
        return pa.table({"peak": pa.array([0], pa.int64()),
                         "n_intervals": pa.array([0], pa.int64())})
    stats = bounds.aggregate(Min("t", alias_name="lo"),
                             Max("t", alias_name="hi"))
    lo, hi = stats["lo"], stats["hi"]
    B = n_buckets
    edges = np.linspace(lo, hi, B + 1)[1:-1]

    def bucketize(batch: pa.Table) -> pa.Table:
        t = batch.column("t").to_numpy(zero_copy_only=False)
        b = np.searchsorted(edges, t, side="right").astype(np.int64)
        return batch.append_column("b", pa.array(b))

    bucketed = bounds.map_batches(bucketize, batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()

    def totals(batch: pa.Table) -> pa.Table:
        b = batch.column("b").to_numpy(zero_copy_only=False)
        d = batch.column("d").to_numpy(zero_copy_only=False)
        return pa.table({
            "b": pa.array(np.arange(B, dtype=np.int64)),
            "s": pa.array(np.bincount(b, weights=d,
                                      minlength=B).astype(np.int64)),
        })

    tot = pa.concat_tables(list(
        bucketed.map_batches(totals, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("b").aggregate(Sum("s", alias_name="s"))
        .iter_batches(batch_format="pyarrow"))).sort_by("b")
    bs = np.zeros(B, dtype=np.int64)
    bs[tot.column("b").to_numpy(zero_copy_only=False)] = \
        tot.column("s").to_numpy(zero_copy_only=False)
    prefix = np.concatenate([[0], np.cumsum(bs)[:-1]])
    ref = ray.put(prefix)

    def kernel(group: pa.Table) -> pa.Table:
        pfx = ray.get(ref)
        b = int(group.column("b")[0].as_py())
        t = group.sort_by([("t", "ascending"), ("d", "ascending")])
        d = t.column("d").to_numpy(zero_copy_only=False)
        run = np.cumsum(d) + pfx[b]
        return pa.table({"m": pa.array([int(run.max())])})

    peak = bucketed.groupby("b").map_groups(
        kernel, batch_format="pyarrow").max("m")
    return pa.table({"peak": pa.array([int(peak)], pa.int64()),
                     "n_intervals": pa.array([int(n_intervals)],
                                             pa.int64())})


def scd2_intervals(ds, *, by: str, ts: str, state_col: str, id_col: str,
                   n_buckets: int = 256):
    """Slowly-changing-dimension (type 2) interval construction: per
    key, ordered by (ts, id), collapse consecutive runs of EQUAL state
    into one validity interval — the event-log -> dimension-history
    compaction every warehouse backfill needs.  Null states compare
    like SQL ``IS NOT DISTINCT FROM`` (a null run is one run).

    Output: (by, version 1-based int64, value = the run's state,
    valid_from_us, valid_to_us = next run's start else null, n_rows).

    Plan: ONE coarse-bucket shuffle on ``hash(by)``; the kernel sorts
    each bucket once and finds run boundaries with dictionary-code
    compares (null-safe via :func:`dict_encode_keep_null`) — no Python
    loop over rows or keys.
    """
    from ..functions.aggregates import dict_encode_keep_null

    need = list(dict.fromkeys([by, ts, state_col, id_col]))

    def project(batch: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(batch.column(by)),
                     pc.is_valid(batch.column(ts)))
        batch = batch.filter(ok)
        coarse = (hash64(batch.column(by)) % np.uint64(n_buckets)).astype(
            np.int64)
        return pa.table({
            by: batch.column(by),
            "_t": _ts_us(batch.column(ts)),
            "_i": pc.cast(batch.column(id_col), pa.int64()),
            "_v": batch.column(state_col),
            "coarse": pa.array(coarse),
        })

    def kernel(group: pa.Table) -> pa.Table:
        keys_arr = group.column(by)
        keys_arr = keys_arr.combine_chunks() \
            if isinstance(keys_arr, pa.ChunkedArray) else keys_arr
        keys = keys_arr.to_numpy(zero_copy_only=False)
        t = group.column("_t").to_numpy(zero_copy_only=False)
        i = group.column("_i").to_numpy(zero_copy_only=False)
        order = np.lexsort((i, t, keys))
        keys = keys[order]
        t = t[order]
        vals = group.column("_v")
        vals = vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) \
            else vals
        vals = vals.take(pa.array(order, pa.int64()))
        codes, _d = dict_encode_keep_null(vals)
        key_new = _seg_first(keys)
        run_new = key_new.copy()
        if len(codes) > 1:
            run_new[1:] |= codes[1:] != codes[:-1]
        starts = np.flatnonzero(run_new)
        n_rows = np.diff(np.append(starts, len(keys)))
        # version = run index within its key (1-based): runs are sorted
        # by key, so a running max of "index of the key's first run"
        # gives each run its key-local offset
        key_start_of_run = np.cumsum(key_new)[starts] - 1  # key id per run
        run_idx = np.arange(len(starts))
        run_is_first = key_new[starts]
        first_idx = np.maximum.accumulate(
            np.where(run_is_first, run_idx, -1))
        version = run_idx - first_idx + 1
        valid_from = t[starts]
        # next run's start within the same key, else null
        same_key_next = np.zeros(len(starts), dtype=bool)
        if len(starts) > 1:
            same_key_next[:-1] = (key_start_of_run[1:]
                                  == key_start_of_run[:-1])
        nxt = np.empty(len(starts), dtype=np.int64)
        if len(starts) > 1:
            nxt[:-1] = valid_from[1:]
        valid_to = pa.array(
            np.where(same_key_next, nxt, 0).astype(np.int64), pa.int64())
        valid_to = pc.if_else(pa.array(same_key_next), valid_to,
                              pa.nulls(len(starts), pa.int64()))
        take_starts = pa.array(starts, pa.int64())
        return pa.table({
            by: pc.take(keys_arr.take(pa.array(order, pa.int64())),
                        take_starts),
            "version": pa.array(version.astype(np.int64)),
            "value": vals.take(take_starts),
            "valid_from_us": pa.array(valid_from.astype(np.int64)),
            "valid_to_us": valid_to,
            "n_rows": pa.array(n_rows.astype(np.int64)),
        })

    return ds.select_columns(need).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("coarse").map_groups(
        kernel, batch_format="pyarrow"
    ).select_columns([by, "version", "value", "valid_from_us",
                      "valid_to_us", "n_rows"])


def date_spine_gaps(ds, *, by: str, ts: str, n_buckets: int = 256):
    """Calendar-coverage audit per key: distinct active UTC days vs the
    full day spine between the key's first and last activity — flags
    keys whose series has holes (missing days) and how large the worst
    hole is.  The complement of :func:`day_streaks` (which reports the
    longest unbroken run).

    Plan: one coarse-bucket shuffle of (key, epoch_day) pairs (duplicate
    days collapse in the kernel), then a vectorized gaps-and-islands
    segment kernel — no per-key Python, no global sort.

    Output: (by, n_days, span_days, n_missing, max_gap) all int64 where
    span_days = last−first+1, n_missing = span_days − n_days and
    max_gap is the largest run of consecutive missing days (0 when the
    spine is fully covered).
    """
    DAY_US = 86_400_000_000

    def project(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_kleene(pc.is_valid(batch.column(by)),
                                           pc.is_valid(batch.column(ts))))
        coarse = (hash64(batch.column(by)) % np.uint64(n_buckets)).astype(
            np.int64)
        day = pc.divide(_ts_us(batch.column(ts)), DAY_US)
        return pa.table({
            by: batch.column(by),
            "_d": day,
            "coarse": pa.array(coarse),
        })

    def kernel(group: pa.Table) -> pa.Table:
        keys = group.column(by).to_numpy(zero_copy_only=False)
        d = group.column("_d").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, keys))
        keys, d = keys[order], d[order]
        keep = np.ones(len(keys), dtype=bool)  # distinct (key, day)
        if len(keys) > 1:
            keep[1:] = (keys[1:] != keys[:-1]) | (d[1:] != d[:-1])
        keys, d, order = keys[keep], d[keep], order[keep]
        first = _seg_first(keys)
        seg = np.cumsum(first) - 1
        m = int(seg[-1]) + 1 if len(seg) else 0
        n_days = np.bincount(seg, minlength=m).astype(np.int64)
        first_day = np.zeros(m, dtype=np.int64)
        first_day[seg[np.flatnonzero(first)]] = d[np.flatnonzero(first)]
        last_day = np.zeros(m, dtype=np.int64)
        np.maximum.at(last_day, seg, d)
        span = last_day - first_day + 1
        # per-row gap to previous distinct day within the same key
        gap = np.zeros(len(d), dtype=np.int64)
        if len(d) > 1:
            inner = ~first
            inner_idx = np.flatnonzero(inner)
            gap[inner_idx] = d[inner_idx] - d[inner_idx - 1] - 1
        max_gap = np.zeros(m, dtype=np.int64)
        np.maximum.at(max_gap, seg, gap)
        starts = np.flatnonzero(first)
        kcol = group.column(by)
        kcol = kcol.combine_chunks() if isinstance(kcol, pa.ChunkedArray) \
            else kcol
        return pa.table({
            by: pc.take(kcol, pa.array(order[starts], pa.int64())),
            "n_days": pa.array(n_days),
            "span_days": pa.array(span),
            "n_missing": pa.array(span - n_days),
            "max_gap": pa.array(max_gap),
        })

    return _bucketed(ds.select_columns([by, ts]), project,
                     n_buckets).map_groups(kernel, batch_format="pyarrow"
    ).select_columns([by, "n_days", "span_days", "n_missing", "max_gap"])


def stuck_runs(ds, *, by: str, ts: str, value_col: str, id_col: str,
               n_buckets: int = 256):
    """Stuck-sensor / frozen-pipeline audit: the longest run of
    CONSECUTIVE identical values per key in event order — a healthy
    metered stream rarely repeats the exact same reading many times in
    a row, so a long run means a stuck sensor, a frozen upstream cache,
    or a retry storm re-emitting one payload.

    Order is (ts, id) lexicographic so same-timestamp rows resolve
    identically everywhere.  Null values are excluded before run
    detection (both engines).  One coarse-bucket shuffle; vectorized
    gaps-and-islands kernel per bucket.

    Output: (by, n_rows, n_runs, max_run) int64.
    """
    def project(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_kleene(pc.and_kleene(
            pc.is_valid(batch.column(by)),
            pc.is_valid(batch.column(ts))),
            pc.is_valid(batch.column(value_col))))
        coarse = (hash64(batch.column(by)) % np.uint64(n_buckets)).astype(
            np.int64)
        return pa.table({
            by: batch.column(by),
            "_t": _ts_us(batch.column(ts)),
            "_i": pc.cast(batch.column(id_col), pa.int64()),
            "_v": pc.cast(batch.column(value_col), pa.float64()),
            "coarse": pa.array(coarse),
        })

    def kernel(group: pa.Table) -> pa.Table:
        keys = group.column(by).to_numpy(zero_copy_only=False)
        t = group.column("_t").to_numpy(zero_copy_only=False)
        i = group.column("_i").to_numpy(zero_copy_only=False)
        v = group.column("_v").to_numpy(zero_copy_only=False)
        order = np.lexsort((i, t, keys))
        keys, v = keys[order], v[order]
        first = _seg_first(keys)
        seg = np.cumsum(first) - 1
        m = int(seg[-1]) + 1 if len(seg) else 0
        # island: new key OR value changed vs previous row
        new_run = first.copy()
        if len(keys) > 1:
            new_run[1:] |= v[1:] != v[:-1]
        run_id = np.cumsum(new_run) - 1
        run_len = np.bincount(run_id)
        run_seg = seg[np.flatnonzero(new_run)]
        max_run = np.zeros(m, dtype=np.int64)
        np.maximum.at(max_run, run_seg, run_len)
        n_runs = np.bincount(run_seg, minlength=m).astype(np.int64)
        starts = np.flatnonzero(first)
        kcol = group.column(by)
        kcol = kcol.combine_chunks() if isinstance(kcol, pa.ChunkedArray) \
            else kcol
        return pa.table({
            by: pc.take(kcol, pa.array(order[starts], pa.int64())),
            "n_rows": pa.array(np.bincount(seg, minlength=m).astype(
                np.int64)),
            "n_runs": pa.array(n_runs),
            "max_run": pa.array(max_run),
        })

    need = list(dict.fromkeys([by, ts, value_col, id_col]))
    return _bucketed(ds.select_columns(need), project,
                     n_buckets).map_groups(kernel, batch_format="pyarrow"
    ).select_columns([by, "n_rows", "n_runs", "max_run"])


def ledger_min(ds, *, by: str, ts: str, id_col: str, delta_col: str,
               decimals: int = 2, n_buckets: int = 256):
    """Ledger / inventory invariant: per key, the running balance of
    signed deltas in (ts, id) order must never dip below zero — the
    "sold more than was ever in stock" / double-spend audit.  Deltas
    accumulate as EXACT integer units (``round(v·10^decimals)``), so
    the running minimum is bit-identical on any engine and any block
    split.

    Output: (by, n, final_units, min_units, went_negative 0/1); one
    coarse-bucket shuffle, vectorized per-segment cumsum kernel.
    """
    scale = float(10 ** decimals)

    def project(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_kleene(pc.and_kleene(
            pc.is_valid(batch.column(by)),
            pc.is_valid(batch.column(ts))),
            pc.is_valid(batch.column(delta_col))))
        coarse = (hash64(batch.column(by)) % np.uint64(n_buckets)).astype(
            np.int64)
        units = pc.cast(pc.round(pc.multiply(pc.cast(
            batch.column(delta_col), pa.float64()), scale)), pa.int64())
        return pa.table({
            by: batch.column(by),
            "_t": _ts_us(batch.column(ts)),
            "_i": pc.cast(batch.column(id_col), pa.int64()),
            "_d": units,
            "coarse": pa.array(coarse),
        })

    def kernel(group: pa.Table) -> pa.Table:
        keys = group.column(by).to_numpy(zero_copy_only=False)
        t = group.column("_t").to_numpy(zero_copy_only=False)
        i = group.column("_i").to_numpy(zero_copy_only=False)
        d = group.column("_d").to_numpy(zero_copy_only=False)
        order = np.lexsort((i, t, keys))
        keys, d = keys[order], d[order]
        first = _seg_first(keys)
        seg = np.cumsum(first) - 1
        m = int(seg[-1]) + 1 if len(seg) else 0
        cum = np.cumsum(d)
        # per-segment running sum: subtract the cumsum just before the
        # segment start (indexed per segment — signed deltas make cum
        # non-monotonic, so no accumulate trick here)
        starts = np.flatnonzero(first)
        seg_base = np.zeros(m, dtype=np.int64)
        seg_base[1:] = cum[starts[1:] - 1]
        run = cum - seg_base[seg]
        min_units = np.full(m, np.iinfo(np.int64).max)
        np.minimum.at(min_units, seg, run)
        ends = np.append(starts[1:], len(d)) - 1
        kcol = group.column(by)
        kcol = kcol.combine_chunks() if isinstance(kcol, pa.ChunkedArray) \
            else kcol
        return pa.table({
            by: pc.take(kcol, pa.array(order[starts], pa.int64())),
            "n": pa.array(np.bincount(seg, minlength=m).astype(np.int64)),
            "final_units": pa.array(run[ends]),
            "min_units": pa.array(min_units),
            "went_negative": pa.array((min_units < 0).astype(np.int64)),
        })

    need = list(dict.fromkeys([by, ts, id_col, delta_col]))
    return _bucketed(ds.select_columns(need), project,
                     n_buckets).map_groups(kernel, batch_format="pyarrow"
    ).select_columns([by, "n", "final_units", "min_units",
                      "went_negative"])


def trigram_topk(ds, *, by: str, ts: str, type_col: str, id_col: str,
                 k: int = 10, n_buckets: int = 256):
    """Top-k event TRIGRAMS (three consecutive event types within a
    key, (ts, id) order) — the sequence-mining step past the Markov
    bigram: which 3-step paths dominate the product flow.

    Per coarse bucket, a vectorized double-shift builds trigram codes
    and collapses them to counts, so the second exchange moves
    (t0, t1, t2, count) partials — key space ≤ |types|³.  A one-block
    finalize ranks with (count desc, t0, t1, t2) determinism.
    Output: (t0, t1, t2, n), k rows.
    """
    from ray.data.aggregate import Sum

    def project(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_kleene(pc.and_kleene(
            pc.is_valid(batch.column(by)),
            pc.is_valid(batch.column(ts))),
            pc.is_valid(batch.column(type_col))))
        coarse = (hash64(batch.column(by)) % np.uint64(n_buckets)).astype(
            np.int64)
        return pa.table({
            by: batch.column(by),
            "_t": _ts_us(batch.column(ts)),
            "_i": pc.cast(batch.column(id_col), pa.int64()),
            "_e": pc.cast(batch.column(type_col), pa.string()),
            "coarse": pa.array(coarse),
        })

    def kernel(group: pa.Table) -> pa.Table:
        keys = group.column(by).to_numpy(zero_copy_only=False)
        t = group.column("_t").to_numpy(zero_copy_only=False)
        i = group.column("_i").to_numpy(zero_copy_only=False)
        ev = group.column("_e")
        ev = ev.combine_chunks() if isinstance(ev, pa.ChunkedArray) else ev
        order = np.lexsort((i, t, keys))
        keys = keys[order]
        evc = pc.dictionary_encode(pc.take(ev, pa.array(order, pa.int64())))
        codes = np.asarray(evc.indices, dtype=np.int64)
        d = len(evc.dictionary)
        n = len(codes)
        empty = pa.table({"t0": pa.array([], pa.string()),
                          "t1": pa.array([], pa.string()),
                          "t2": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if n < 3 or d == 0:
            return empty
        same3 = (keys[:-2] == keys[1:-1]) & (keys[1:-1] == keys[2:])
        if not same3.any():
            return empty
        tri = (codes[:-2] * d + codes[1:-1]) * d + codes[2:]
        tri = tri[same3]
        cnt = np.bincount(tri)
        keep = np.flatnonzero(cnt)
        return pa.table({
            "t0": pc.take(evc.dictionary, pa.array(keep // (d * d))),
            "t1": pc.take(evc.dictionary, pa.array((keep // d) % d)),
            "t2": pc.take(evc.dictionary, pa.array(keep % d)),
            "n": pa.array(cnt[keep].astype(np.int64)),
        })

    counts = _bucketed(ds.select_columns(
        list(dict.fromkeys([by, ts, type_col, id_col]))), project,
        n_buckets).map_groups(kernel, batch_format="pyarrow").groupby(
        ["t0", "t1", "t2"]).aggregate(Sum("n", alias_name="n"))

    def topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"t0": pa.array([], pa.string()),
                             "t1": pa.array([], pa.string()),
                             "t2": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        a0 = t.column("t0").to_numpy(zero_copy_only=False).astype(str)
        a1 = t.column("t1").to_numpy(zero_copy_only=False).astype(str)
        a2 = t.column("t2").to_numpy(zero_copy_only=False).astype(str)
        order = np.lexsort((a2, a1, a0, -n))[:k]
        idx = pa.array(order, pa.int64())
        g = lambda c: pc.take(
            c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c,
            idx)
        return pa.table({
            "t0": g(t.column("t0")), "t1": g(t.column("t1")),
            "t2": g(t.column("t2")),
            "n": pa.array(n[order]),
        })

    return counts.repartition(1).map_batches(
        topk, batch_format="pyarrow", batch_size=None)


def first_touch_attribution(ds, *, by: str, ts: str, type_col: str,
                            id_col: str, value_col: str,
                            target: str = "purchase",
                            n_buckets: int = 256):
    """First-touch revenue attribution: credit each key's total
    ``target`` value (e.g. purchase revenue) to the key's FIRST event
    type — the classic marketing-attribution aggregate, and an ordered
    multi-output kernel (first + conditional sum in one pass).

    Plan: ONE coarse-key shuffle of the projected events, a per-bucket
    kernel (lexsort by (key, ts, id); first-type via segment-first
    mask; per-segment conditional value sums via bincount), then one
    tiny groupby on the first type.  Null ts/key rows are excluded;
    null values count 0.  Output: (first_type, n_users, total_value).
    """
    from ray.data.aggregate import Sum

    need = [id_col, by, ts, type_col, value_col]

    def project(batch: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(batch.column(ts)),
                     pc.is_valid(batch.column(by)))
        t = batch.filter(ok)
        coarse = (hash64(t.column(by)) % np.uint64(n_buckets)).astype(
            np.int64)
        return pa.table({
            "coarse": pa.array(coarse),
            by: t.column(by),
            "_ts": _ts_us(t.column(ts)),
            id_col: t.column(id_col),
            type_col: t.column(type_col),
            value_col: pc.cast(t.column(value_col), pa.float64()),
        })

    def kernel(group: pa.Table) -> pa.Table:
        keys = group.column(by).to_numpy(zero_copy_only=False)
        o = group.column("_ts").to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, o, keys))
        keys = keys[order]
        new = _seg_first(keys)
        seg = np.cumsum(new) - 1
        types = group.column(type_col).take(pa.array(order))
        v = group.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.float64)[order]
        is_t = pc.fill_null(pc.equal(types, target),
                            False).to_numpy(zero_copy_only=False)
        w = np.where(is_t & ~np.isnan(v), v, 0.0)
        tot = np.bincount(seg, weights=w)
        first_type = types.take(pa.array(np.flatnonzero(new)))
        return pa.table({
            "first_type": first_type,
            "n": pa.array(np.ones(len(tot), dtype=np.int64)),
            "v": pa.array(tot),
        })

    per_key = ds.select_columns(need).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("coarse").map_groups(kernel, batch_format="pyarrow")
    return per_key.groupby("first_type").aggregate(
        Sum("n", alias_name="n_users"),
        Sum("v", alias_name="total_value"))


def transition_cond_entropy(ds, *, by: str, ts: str, type_col: str,
                            id_col: str, n_buckets: int = 256):
    """Per-state conditional entropy of the NEXT event type,
    H(next | cur = x) = −Σ_y p(y|x)·ln p(y|x) — the predictability
    profile of the event stream (0 = deterministic next step, ln(k) =
    uniform over k successors).  Flags states whose behavior went
    noisy — a drift signal transition-count tables bury.

    Built on :func:`transition_counts` (one coarse-key shuffle); the
    entropy finalize is a single block over the tiny (from, to, n)
    aggregate.  Output: (from_type, n, h).
    """

    counts = transition_counts(ds, by=by, ts=ts, type_col=type_col,
                               id_col=id_col, n_buckets=n_buckets)

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("from_type", pa.string()),
                            ("n", pa.int64()), ("h", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        enc = pc.dictionary_encode(t.column("from_type").combine_chunks())
        code = np.asarray(enc.indices, dtype=np.int64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.float64)
        m = len(enc.dictionary)
        tot = np.bincount(code, weights=n, minlength=m)
        p = n / tot[code]
        h = -np.bincount(code, weights=p * np.log(p), minlength=m)
        return pa.table({
            "from_type": pc.cast(enc.dictionary, pa.string()),
            "n": pa.array(tot.astype(np.int64)),
            "h": pa.array(h),
        })

    return counts.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)
