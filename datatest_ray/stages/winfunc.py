"""Per-key ORDERED window functions (lag / rolling frame aggregates).

Engine extension (the reference has no window operators — SURVEY.md
§2.H); these are the SQL ``... OVER (PARTITION BY k ORDER BY o)``
primitives a feature/training-data pipeline needs (inter-event gaps,
trailing averages).

Plan: ONE shuffle on a bounded coarse key (``hash(k) % n_buckets``) —
never a groupby with one tiny group per key — then a fully vectorized
per-bucket kernel: one Arrow sort by (key, order, tie) and numpy
segment arithmetic (boundary masks / cumulative sums), no Python loop
over rows or keys.  Partitioning assumption: one BUCKET (not one key)
fits in a task's heap; raise ``n_buckets`` for bigger corpora.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.aggregates import hash64

__all__ = ["lag_diff", "rolling_agg", "rolling_median", "cume_dist",
           "group_zscore", "rank_window", "percent_rank",
           "trailing_range_agg", "ntile_window", "record_counts",
           "trailing_distinct", "capped_balance", "max_drawdown", "first_passage"]


def _bucketed(ds, need, key: str, n_buckets: int):
    def add_bucket(batch: pa.Table) -> pa.Table:
        coarse = (hash64(batch.column(key)) % np.uint64(n_buckets)).astype(
            np.int64
        )
        return batch.select(need).append_column(
            "coarse", pa.array(coarse)
        )

    return ds.select_columns(need).map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("coarse")


def _segments(keys: np.ndarray) -> np.ndarray:
    """Boolean new-segment mask over a SORTED key array."""
    new = np.ones(len(keys), dtype=bool)
    if len(keys) > 1:
        new[1:] = keys[1:] != keys[:-1]
    return new


def lag_diff(ds, *, by: str, order_col: str, id_col: str,
             n_buckets: int = 256):
    """SQL ``x - lag(x) OVER (PARTITION BY by ORDER BY order, id)``
    for a timestamp/numeric order column.

    Output: (id_col, by, gap) — ``gap`` is the delta to the previous
    row of the same key in epoch-µs for timestamps (int64, null on each
    key's first row).
    """
    need = [id_col, by, order_col]

    def to_int(col):
        if pa.types.is_timestamp(col.type):
            return pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())
        return pc.cast(col, pa.int64())

    def kernel(group: pa.Table) -> pa.Table:
        t = pa.table({
            id_col: group.column(id_col),
            by: group.column(by),
            "_o": to_int(group.column(order_col)),
        }).sort_by([(by, "ascending"), ("_o", "ascending"),
                    (id_col, "ascending")])
        keys = t.column(by).to_numpy(zero_copy_only=False)
        o = t.column("_o").to_numpy(zero_copy_only=False)
        first = _segments(keys)
        gap = np.empty(len(o), dtype=np.int64)
        gap[0:] = 0
        if len(o) > 1:
            gap[1:] = o[1:] - o[:-1]
        return pa.table({
            id_col: t.column(id_col),
            by: t.column(by),
            "gap": pa.array(gap, type=pa.int64(), mask=first),
        })

    return _bucketed(ds, need, by, n_buckets).map_groups(
        kernel, batch_format="pyarrow"
    ).select_columns([id_col, by, "gap"])


def group_zscore(ds, *, by: str, value_col: str, id_col: str):
    """Per-group standardization: ``(v - mean_g) / stddev_samp_g``
    (SQL window ``avg/stddev_samp OVER (PARTITION BY g)``), the feature
    normalization step of tabular training pipelines.

    Plan: ONE tiny ``groupby(by)`` over per-batch moment partials
    (n, sum, sumsq — same sufficient-statistics shape as
    ``grouped_corr``), the per-key stats broadcast back via ``ray.put``,
    and the row pass attaches z via vectorized ``index_in`` — the data
    itself is never shuffled.  NULL z for groups with <2 rows or zero
    variance.  Assumption: #groups fits in memory (it is an aggregate).
    """
    import ray
    from ray.data.aggregate import Sum

    def moments(batch: pa.Table) -> pa.Table:
        keys = batch.column(by)
        keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
        enc = pc.dictionary_encode(keys)
        code = np.asarray(enc.indices, dtype=np.int64)
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        ok = ~np.isnan(v)
        m = len(enc.dictionary)
        return pa.table({
            by: enc.dictionary,
            "n": pa.array(
                np.bincount(code[ok], minlength=m).astype(np.float64)),
            "s": pa.array(np.bincount(code[ok], weights=v[ok], minlength=m)),
            "ss": pa.array(
                np.bincount(code[ok], weights=v[ok] * v[ok], minlength=m)),
        })

    stats = (
        ds.select_columns([by, value_col])
        .map_batches(moments, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(by)
        .aggregate(*[Sum(c, alias_name=c) for c in ("n", "s", "ss")])
    )
    from .base import collect_table

    stat_t = collect_table(stats, [by, "n", "s", "ss"])
    keys = stat_t.column(by)
    keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
    n = stat_t.column("n").to_numpy(zero_copy_only=False)
    s = stat_t.column("s").to_numpy(zero_copy_only=False)
    ss = stat_t.column("ss").to_numpy(zero_copy_only=False)
    mean = np.where(n > 0, s / np.maximum(n, 1), np.nan)
    var = np.where(
        n > 1, (ss - s * s / np.maximum(n, 1)) / np.maximum(n - 1, 1), np.nan
    )
    std = np.sqrt(np.where(var > 0, var, np.nan))
    handle = ray.put((keys, mean, std))

    def attach(batch: pa.Table) -> pa.Table:
        k, mu, sd = ray.get(handle)
        idx = pc.index_in(batch.column(by), value_set=k)
        pos = idx.to_numpy(zero_copy_only=False).astype(np.float64)
        pos = np.where(np.isnan(pos), 0, pos).astype(np.int64)
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        z = (v - mu[pos]) / sd[pos]
        return pa.table({
            id_col: batch.column(id_col),
            by: batch.column(by),
            "z": pa.array(z, pa.float64(), mask=np.isnan(z)),
        })

    return ds.select_columns(
        list(dict.fromkeys([id_col, by, value_col]))
    ).map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)


def cume_dist(ds, *, by: str, value_col: str, id_col: str,
              n_buckets: int = 256):
    """SQL ``cume_dist() OVER (PARTITION BY by ORDER BY value)``:
    fraction of the key's rows with value <= the current row's value.
    Tie-immune by definition (depends on the VALUE, not row order).

    Output: (id_col, by, cd) with ``cd`` float64.  Vectorized: one sort
    by (key, value), run-length ends per equal-value run, integer ratio
    per row — identical IEEE division on both engines.
    """
    need = list(dict.fromkeys([id_col, by, value_col]))

    def kernel(group: pa.Table) -> pa.Table:
        t = group.select(need).sort_by(
            [(by, "ascending"), (value_col, "ascending")]
        )
        keys = t.column(by).to_numpy(zero_copy_only=False)
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        n = len(v)
        if n == 0:
            return pa.table({id_col: t.column(id_col), by: t.column(by),
                             "cd": pa.array([], pa.float64())})
        new_seg = _segments(keys)
        seg = np.cumsum(new_seg) - 1
        seg_start = np.flatnonzero(new_seg)[seg]
        seg_len = np.bincount(seg)[seg]
        # equal-value runs within a segment
        new_run = new_seg.copy()
        new_run[1:] |= v[1:] != v[:-1]
        run = np.cumsum(new_run) - 1
        run_starts = np.flatnonzero(new_run)
        run_ends = np.empty(len(run_starts), dtype=np.int64)
        run_ends[:-1] = run_starts[1:] - 1
        run_ends[-1] = n - 1
        cd = (run_ends[run] - seg_start + 1).astype(np.float64) / seg_len
        return pa.table({
            id_col: t.column(id_col),
            by: t.column(by),
            "cd": pa.array(cd),
        })

    return _bucketed(ds, need, by, n_buckets).map_groups(
        kernel, batch_format="pyarrow"
    ).select_columns([id_col, by, "cd"])


def percent_rank(ds, *, by: str, value_col: str, id_col: str,
                 n_buckets: int = 256):
    """SQL ``percent_rank() OVER (PARTITION BY by ORDER BY value)``:
    ``(rank - 1) / (n - 1)`` per key (0.0 for single-row keys).
    Tie-aware on the VALUE alone (rank-based), so no tie-break column
    is needed for engine/oracle parity.

    Output: (id_col, by, pct) with ``pct`` float64.  Same plan as the
    rest of this module: one coarse-bucket shuffle, per-bucket Arrow
    sort + numpy segment arithmetic — no Python loop over rows/keys.
    """
    need = list(dict.fromkeys([id_col, by, value_col]))

    def kernel(group: pa.Table) -> pa.Table:
        t = group.select(need).sort_by(
            [(by, "ascending"), (value_col, "ascending")]
        )
        keys = t.column(by).to_numpy(zero_copy_only=False)
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        n = len(v)
        if n == 0:
            return pa.table({id_col: t.column(id_col), by: t.column(by),
                             "pct": pa.array([], pa.float64())})
        new_seg = _segments(keys)
        seg = np.cumsum(new_seg) - 1
        seg_start = np.flatnonzero(new_seg)[seg]
        seg_len = np.bincount(seg)[seg]
        new_run = new_seg.copy()
        new_run[1:] |= v[1:] != v[:-1]
        run = np.cumsum(new_run) - 1
        run_start = np.flatnonzero(new_run)[run]
        rnk = run_start - seg_start + 1
        pct = np.where(
            seg_len > 1,
            (rnk - 1).astype(np.float64) / np.maximum(seg_len - 1, 1),
            0.0,
        )
        return pa.table({
            id_col: t.column(id_col),
            by: t.column(by),
            "pct": pa.array(pct),
        })

    return _bucketed(ds, need, by, n_buckets).map_groups(
        kernel, batch_format="pyarrow"
    ).select_columns([id_col, by, "pct"])


def rank_window(ds, *, by: str, value_col: str, id_col: str,
                descending: bool = True, ntile: int = 4,
                n_buckets: int = 256):
    """The SQL ranking-window family in one vectorized pass:

    - ``rnk``  = ``rank()        OVER (PARTITION BY by ORDER BY v)``
    - ``drnk`` = ``dense_rank()  OVER (PARTITION BY by ORDER BY v)``
    - ``rn``   = ``row_number()  OVER (PARTITION BY by ORDER BY v, id)``
    - ``tile`` = ``ntile(k)      OVER (PARTITION BY by ORDER BY v, id)``

    rank/dense_rank are tie-aware on the VALUE alone; row_number/ntile
    need a total order, so ties break on ``id_col`` (mirror the same
    tie-break in any oracle SQL).  Same plan as the rest of this
    module: one coarse-bucket shuffle, then per-bucket Arrow sort +
    numpy segment arithmetic — no Python loop over rows or keys.
    """
    need = list(dict.fromkeys([id_col, by, value_col]))
    vdir = "descending" if descending else "ascending"

    def kernel(group: pa.Table) -> pa.Table:
        t = group.select(need).sort_by(
            [(by, "ascending"), (value_col, vdir), (id_col, "ascending")]
        )
        keys = t.column(by).to_numpy(zero_copy_only=False)
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        n = len(v)
        if n == 0:
            e = pa.array([], pa.int64())
            return pa.table({id_col: t.column(id_col), by: t.column(by),
                             "rnk": e, "drnk": e, "rn": e, "tile": e})
        new_seg = _segments(keys)
        seg = np.cumsum(new_seg) - 1
        seg_start = np.flatnonzero(new_seg)[seg]
        i = np.arange(n, dtype=np.int64)
        rn = i - seg_start + 1
        # equal-value runs within a segment drive rank/dense_rank
        new_run = new_seg.copy()
        new_run[1:] |= v[1:] != v[:-1]
        run = np.cumsum(new_run) - 1
        run_start = np.flatnonzero(new_run)[run]
        rnk = run_start - seg_start + 1
        run_at_seg_start = run[seg_start]
        drnk = run - run_at_seg_start + 1
        # ntile(k): the first n%k tiles get one extra row (SQL standard)
        seg_len = np.bincount(seg)[seg]
        k = ntile
        rn0 = rn - 1
        small = seg_len // k
        big = seg_len % k  # number of (small+1)-sized leading tiles
        cut = big * (small + 1)
        in_big = rn0 < cut
        tile = np.where(
            in_big,
            rn0 // np.maximum(small + 1, 1),
            big + (rn0 - cut) // np.maximum(small, 1),
        ) + 1
        return pa.table({
            id_col: t.column(id_col),
            by: t.column(by),
            "rnk": pa.array(rnk, pa.int64()),
            "drnk": pa.array(drnk, pa.int64()),
            "rn": pa.array(rn, pa.int64()),
            "tile": pa.array(tile.astype(np.int64)),
        })

    return _bucketed(ds, need, by, n_buckets).map_groups(
        kernel, batch_format="pyarrow"
    ).select_columns([id_col, by, "rnk", "drnk", "rn", "tile"])


def rolling_agg(ds, *, by: str, order_col: str, value_col: str,
                id_col: str, window: int = 3, agg: str = "mean",
                n_buckets: int = 256):
    """SQL ``agg(v) OVER (PARTITION BY by ORDER BY order, id
    ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)``.

    Output: (id_col, by, roll) with ``roll`` float64.  Vectorized via
    per-segment cumulative sums: for global row i in a segment starting
    at s, the frame start is j = max(s, i-window+1) and the frame sum
    is cs[i] - cs[j-1].
    """
    if agg not in ("mean", "sum"):
        raise ValueError("agg must be 'mean' or 'sum'")
    need = list(dict.fromkeys([id_col, by, order_col, value_col]))

    def kernel(group: pa.Table) -> pa.Table:
        t = group.select(need).sort_by(
            [(by, "ascending"), (order_col, "ascending"),
             (id_col, "ascending")]
        )
        keys = t.column(by).to_numpy(zero_copy_only=False)
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        n = len(v)
        if n == 0:
            return pa.table({id_col: t.column(id_col), by: t.column(by),
                             "roll": pa.array([], pa.float64())})
        new = _segments(keys)
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)  # segment start index per segment
        i = np.arange(n, dtype=np.int64)
        j = np.maximum(starts[seg], i - window + 1)
        cs = np.cumsum(v)
        frame_sum = cs[i] - np.where(j > 0, cs[j - 1], 0.0)
        if agg == "mean":
            out = frame_sum / (i - j + 1)
        else:
            out = frame_sum
        return pa.table({
            id_col: t.column(id_col),
            by: t.column(by),
            "roll": pa.array(out),
        })

    return _bucketed(ds, need, by, n_buckets).map_groups(
        kernel, batch_format="pyarrow"
    ).select_columns([id_col, by, "roll"])


def rolling_median(ds, *, by: str, order_col: str, value_col: str,
                   id_col: str, window: int = 7, n_buckets: int = 256):
    """SQL ``median(v) OVER (PARTITION BY by ORDER BY order, id
    ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)`` — the robust
    trailing statistic (spike-immune, unlike ``rolling_agg('mean')``).

    Output: (id_col, by, rmed) with ``rmed`` float64.  Vectorized with
    no per-row Python: each bucket builds an (n × window) strided view
    of the sorted value array, masks positions before the row's segment
    start to NaN, and takes one ``np.nanmedian(axis=1)`` — O(n·window)
    and exactly DuckDB's interpolation (mean of the two middle values
    for even frame sizes).  ``window`` is a small constant (trailing
    frames), so the matrix stays a few× the bucket size.
    """
    need = list(dict.fromkeys([id_col, by, order_col, value_col]))

    def kernel(group: pa.Table) -> pa.Table:
        t = group.select(need).sort_by(
            [(by, "ascending"), (order_col, "ascending"),
             (id_col, "ascending")]
        )
        keys = t.column(by).to_numpy(zero_copy_only=False)
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        n = len(v)
        if n == 0:
            return pa.table({id_col: t.column(id_col), by: t.column(by),
                             "rmed": pa.array([], pa.float64())})
        new = _segments(keys)
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        i = np.arange(n, dtype=np.int64)
        lo = np.maximum(starts[seg], i - window + 1)
        # frame matrix: column j holds v[i - (window-1) + j]
        offs = np.arange(window, dtype=np.int64) - (window - 1)
        idx = i[:, None] + offs[None, :]
        valid = idx >= lo[:, None]
        vals = v[np.maximum(idx, 0)]
        vals[~valid] = np.nan
        out = np.nanmedian(vals, axis=1)
        return pa.table({
            id_col: t.column(id_col),
            by: t.column(by),
            "rmed": pa.array(out),
        })

    return _bucketed(ds, need, by, n_buckets).map_groups(
        kernel, batch_format="pyarrow"
    ).select_columns([id_col, by, "rmed"])


def trailing_range_agg(ds, *, by: str, ts_col: str, value_col: str,
                       id_col: str, window_s: int = 3600,
                       n_buckets: int = 256):
    """SQL ``count(*)/sum(v) OVER (PARTITION BY by ORDER BY ts
    RANGE BETWEEN INTERVAL window_s seconds PRECEDING AND CURRENT
    ROW)`` — the time-based trailing frame (vs ``rolling_agg``'s
    row-count frame): burst detection, trailing-spend features.

    RANGE semantics: the frame holds every row of the key whose ts is
    in ``[ts_i − window_s, ts_i]`` INCLUDING peers of the current ts
    (rows with equal ts that sort after it) — exactly DuckDB's frame.
    Sums are exact integer cents via prefix-sum differences, so the
    result is summation-order independent.

    Plan: one coarse-key shuffle, then per segment two vectorized
    ``searchsorted`` calls over the time-sorted slice (the only Python
    loop is over KEYS in a bucket, never rows).  Output:
    (id_col, by, n_win int64, sum_win_c int64).
    """
    need = list(dict.fromkeys([id_col, by, ts_col, value_col]))

    def to_cents(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.and_(pc.is_valid(batch.column(by)),
                    pc.is_valid(batch.column(ts_col))),
            pc.is_valid(batch.column(value_col)))
        t = batch.select(need).filter(ok)
        return t.set_column(
            t.schema.get_field_index(value_col), "v_c",
            pc.cast(pc.round(pc.multiply(t.column(value_col), 100.0)),
                    pa.int64()))

    win_us = np.int64(window_s) * 1_000_000

    def kernel(group: pa.Table) -> pa.Table:
        t = group.sort_by([(by, "ascending"), (ts_col, "ascending"),
                           (id_col, "ascending")])
        keys = t.column(by).to_numpy(zero_copy_only=False)
        ts = t.column(ts_col).to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        v = t.column("v_c").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(v)
        if n == 0:
            return pa.table({
                id_col: t.column(id_col), by: t.column(by),
                "n_win": pa.array([], pa.int64()),
                "sum_win_c": pa.array([], pa.int64()),
            })
        new = _segments(keys)
        starts = np.flatnonzero(new)
        bounds = np.append(starts, n)
        cs = np.concatenate([[0], np.cumsum(v)])  # exclusive prefix sums
        n_win = np.empty(n, dtype=np.int64)
        sum_c = np.empty(n, dtype=np.int64)
        for s, e in zip(bounds[:-1], bounds[1:]):
            seg_ts = ts[s:e]
            lo = s + np.searchsorted(seg_ts, seg_ts - win_us, side="left")
            hi = s + np.searchsorted(seg_ts, seg_ts, side="right")
            n_win[s:e] = hi - lo
            sum_c[s:e] = cs[hi] - cs[lo]
        return pa.table({
            id_col: t.column(id_col),
            by: t.column(by),
            "n_win": pa.array(n_win),
            "sum_win_c": pa.array(sum_c),
        })

    pre = ds.select_columns(need).map_batches(
        to_cents, batch_format="pyarrow", zero_copy_batch=True)
    return _bucketed(pre, [id_col, by, ts_col, "v_c"], by,
                     n_buckets).map_groups(
        kernel, batch_format="pyarrow"
    ).select_columns([id_col, by, "n_win", "sum_win_c"])


def ntile_window(ds, *, by: str, value_col: str, id_col: str, k: int = 4,
                 n_buckets: int = 256):
    """SQL ``ntile(k) OVER (PARTITION BY by ORDER BY value, id)``:
    split each key's rows into k buckets as equal as possible — the
    first ``n mod k`` buckets get ``⌈n/k⌉`` rows (SQL semantics).  The
    id tiebreak makes the assignment deterministic across engines
    (ntile is ROW-order dependent, unlike cume_dist).

    Output: (id_col, by, tile int64).  Vectorized: position-in-segment
    arithmetic, no per-row Python.
    """
    need = list(dict.fromkeys([id_col, by, value_col]))

    def kernel(group: pa.Table) -> pa.Table:
        t = group.select(need).sort_by(
            [(by, "ascending"), (value_col, "ascending"),
             (id_col, "ascending")]
        )
        keys = t.column(by).to_numpy(zero_copy_only=False)
        n = len(keys)
        if n == 0:
            return pa.table({id_col: t.column(id_col), by: t.column(by),
                             "tile": pa.array([], pa.int64())})
        new = _segments(keys)
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        seg_len = np.bincount(seg)
        pos = np.arange(n, dtype=np.int64) - starts[seg]  # 0-based in key
        sl = seg_len[seg]
        q, r = sl // k, sl % k
        big = r * (q + 1)  # rows covered by the (q+1)-sized buckets
        tile = np.where(
            pos < big,
            pos // np.maximum(q + 1, 1),
            r + np.where(q > 0, (pos - big) // np.maximum(q, 1), 0),
        ) + 1
        return pa.table({
            id_col: t.column(id_col),
            by: t.column(by),
            "tile": pa.array(tile.astype(np.int64)),
        })

    return _bucketed(ds, need, by, n_buckets).map_groups(
        kernel, batch_format="pyarrow"
    ).select_columns([id_col, by, "tile"])


def record_counts(ds, *, by: str, ts_col: str, value_col: str,
                  id_col: str, n_buckets: int = 256):
    """Per-key count of RECORD events: rows whose value strictly
    exceeds the key's running maximum over (ts, id) order — "how often
    does this user set a new personal best", the streak/engagement
    feature and a quick stationarity probe (a stationary series sets
    ~ln(n) records; a trending one far more).

    The first row of a key is NOT a record (empty preceding frame —
    matches SQL ``v > max(v) OVER (... ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)`` where the empty max is NULL).  One
    coarse-key shuffle; per-key running max via vectorized
    ``np.maximum.accumulate`` per segment (the Python loop is over
    KEYS in a bucket, never rows).  Output per key:
    (by, n, n_records).
    """
    need = list(dict.fromkeys([by, ts_col, value_col, id_col]))

    def clean(batch: pa.Table) -> pa.Table:
        ok = None
        for c in need:
            v = pc.is_valid(batch.column(c))
            ok = v if ok is None else pc.and_(ok, v)
        return batch.select(need).filter(ok)

    def kernel(group: pa.Table) -> pa.Table:
        t = group.sort_by([(by, "ascending"), (ts_col, "ascending"),
                           (id_col, "ascending")])
        keys = t.column(by).to_numpy(zero_copy_only=False)
        v = t.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.float64)
        n = len(v)
        if n == 0:
            return pa.table({by: pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "n_records": pa.array([], pa.int64())})
        new = _segments(keys)
        starts = np.flatnonzero(new)
        bounds = np.append(starts, n)
        out_k, out_n, out_r = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            seg = v[s:e]
            if len(seg) < 2:
                rec = 0
            else:
                run = np.maximum.accumulate(seg)
                rec = int((seg[1:] > run[:-1]).sum())
            out_k.append(keys[s])
            out_n.append(e - s)
            out_r.append(rec)
        return pa.table({
            by: pa.array(out_k, pa.int64()),
            "n": pa.array(out_n, pa.int64()),
            "n_records": pa.array(out_r, pa.int64()),
        })

    pre = ds.select_columns(need).map_batches(
        clean, batch_format="pyarrow", zero_copy_batch=True)
    return _bucketed(pre, need, by, n_buckets).map_groups(
        kernel, batch_format="pyarrow"
    ).select_columns([by, "n", "n_records"])


def trailing_distinct(ds, *, by: str, ts_col: str, type_col: str,
                      id_col: str, window_us: int = 3_600_000_000,
                      n_buckets: int = 256):
    """SQL ``count(DISTINCT type) OVER (PARTITION BY by RANGE window)``
    — for every row, how many distinct ``type_col`` values the same
    key produced in the trailing time window ``(t - W, t]`` (the
    anchor row included).  No window-function form exists for
    DISTINCT in most engines; the oracle is the correlated self-join.

    Kernel (same plan as the rest of this module — one coarse-bucket
    shuffle, per-bucket Arrow sort): per key segment the window bounds
    come from two vectorized ``searchsorted`` calls, and the distinct
    count is Σ_c [last-occurrence(c) within window] computed with ONE
    ``np.maximum.accumulate`` pass per DISTINCT type — O(C·n) per key,
    no Python over rows (C = types per key, small by construction for
    event-type columns).  Window semantics are time-based, so rows
    sharing the anchor's timestamp all count, regardless of tie order.

    Output: (id_col, by, n_types) int64.
    """
    need = [by, ts_col, type_col, id_col]

    def kernel(group: pa.Table) -> pa.Table:
        t = group.sort_by([(by, "ascending"), (ts_col, "ascending"),
                           (id_col, "ascending")])
        k = t.column(by).to_numpy(zero_copy_only=False)
        ts = pc.cast(t.column(ts_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        typ = t.column(type_col).to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        n = len(k)
        out = np.zeros(n, dtype=np.int64)
        new = _segments(k)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        for s, e in zip(starts, ends):
            tseg = ts[s:e]
            lo = np.searchsorted(tseg, tseg - window_us, side="right")
            hi = np.searchsorted(tseg, tseg, side="right") - 1
            _, inv = np.unique(typ[s:e], return_inverse=True)
            idx = np.arange(e - s)
            cnt = np.zeros(e - s, dtype=np.int64)
            for c in range(inv.max() + 1 if e > s else 0):
                last = np.maximum.accumulate(
                    np.where(inv == c, idx, -1))
                cnt += last[hi] >= lo
            out[s:e] = cnt
        return pa.table({
            id_col: pa.array(ids), by: pa.array(k),
            "n_types": pa.array(out),
        })

    return _bucketed(ds, need, by, n_buckets).map_groups(
        kernel, batch_format="pyarrow")


def capped_balance(ds, *, by: str, ts_col: str, delta_col: str,
                   id_col: str, n_buckets: int = 256):
    """Floor-at-zero running balance per key — the inventory/meter/
    prepaid-credit recursion ``bal_i = max(0, bal_{i-1} + d_i)`` over
    ``(ts, id)`` order, plus the count of floor hits (resets).

    The recursion LOOKS inherently sequential but has a closed
    vectorized form: with ``c_i = Σ_{j≤i} d_j`` and ``m_i = min(0,
    min_{j≤i} c_j)``, ``bal_i = c_i - m_i`` and row i RESETS exactly
    when ``c_i - m_{i-1} < 0`` — two ``cumsum``/``minimum.accumulate``
    passes per key segment, no Python over rows.  Deltas must be
    integers (cents) so the identity is exact and hash-stable against
    the recursive-CTE oracle; same coarse-bucket plan as the rest of
    this module.

    Output: (by, n_events, final_bal, n_resets) int64 — final balance
    per key.
    """
    need = [by, ts_col, delta_col, id_col]

    def kernel(group: pa.Table) -> pa.Table:
        t = group.sort_by([(by, "ascending"), (ts_col, "ascending"),
                           (id_col, "ascending")])
        k = t.column(by).to_numpy(zero_copy_only=False)
        d = t.column(delta_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = len(k)
        new = _segments(k)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        keys, nev, fin, rst = [], [], [], []
        for s, e in zip(starts, ends):
            c = np.cumsum(d[s:e])
            runmin = np.minimum.accumulate(c)
            m = np.minimum(runmin, 0)
            m_prev = np.empty(e - s, dtype=np.int64)
            m_prev[0] = 0
            m_prev[1:] = m[:-1]
            keys.append(k[s])
            nev.append(e - s)
            fin.append(int(c[-1] - m[-1]))
            rst.append(int(np.count_nonzero(c - m_prev < 0)))
        return pa.table({
            by: pa.array(keys, pa.int64()),
            "n_events": pa.array(nev, pa.int64()),
            "final_bal": pa.array(fin, pa.int64()),
            "n_resets": pa.array(rst, pa.int64()),
        })

    return _bucketed(ds, need, by, n_buckets).map_groups(
        kernel, batch_format="pyarrow")


def max_drawdown(ds, *, by: str, ts_col: str, value_col: str,
                 id_col: str, n_buckets: int = 256):
    """Per-key maximum drawdown of the running balance: with ``cum_i``
    the cumulative sum of the (cents-scaled) value stream in ``(ts,
    id)`` order, drawdown_i = max_{j<=i} cum_j - cum_i and the output
    is its per-key maximum -- the canonical "worst peak-to-trough"
    risk/health metric for any metered stream (spend, credits, queue
    depth).  All arithmetic is exact int64 cents; two vectorized
    accumulate passes per key segment (cumsum + running max), same
    coarse-bucket plan as the rest of this module.

    Output: (by, n_events int64, final_bal round-6, max_drawdown
    round-6) -- balances back in value units.
    """
    need = [by, ts_col, value_col, id_col]

    def clean(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.and_(pc.is_valid(t.column(by)),
                             pc.is_valid(t.column(ts_col))),
                     pc.is_valid(t.column(value_col)))
        t = t.select(need).filter(ok)
        cents = pc.cast(pc.round(pc.multiply(
            pc.cast(t.column(value_col), pa.float64()), 100.0)), pa.int64())
        return t.set_column(t.schema.get_field_index(value_col),
                            value_col, cents)

    def kernel(group: pa.Table) -> pa.Table:
        t = group.sort_by([(by, "ascending"), (ts_col, "ascending"),
                           (id_col, "ascending")])
        k = t.column(by).to_numpy(zero_copy_only=False)
        d = t.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = len(k)
        starts = np.flatnonzero(_segments(k))
        ends = np.append(starts[1:], n)
        keys, nev, fin, mdd = [], [], [], []
        for s, e in zip(starts, ends):
            c = np.cumsum(d[s:e])
            runmax = np.maximum.accumulate(c)
            keys.append(k[s])
            nev.append(e - s)
            fin.append(round(int(c[-1]) / 100.0, 6))
            mdd.append(round(int((runmax - c).max()) / 100.0, 6))
        return pa.table({
            by: pa.array(keys, pa.int64()),
            "n_events": pa.array(nev, pa.int64()),
            "final_bal": pa.array(fin, pa.float64()),
            "max_drawdown": pa.array(mdd, pa.float64()),
        })

    bucketed = (
        ds.select_columns(need)
        .map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            lambda t: t.append_column("coarse", pa.array(
                (hash64(t.column(by)) % np.uint64(n_buckets)).astype(
                    np.int64))),
            batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse")
    )
    return bucketed.map_groups(kernel, batch_format="pyarrow")


def first_passage(ds, *, by: str, ts_col: str, value_col: str,
                  id_col: str, threshold: float,
                  n_buckets: int = 256):
    """First-passage summary: per key, the number of events until the
    cents-exact running value sum first reaches ``threshold`` -- the
    time-to-milestone distribution (days to $1k spend, events to
    quota) summarized as (n_keys, n_crossed, min / median / max
    events-to-cross).  The median over crossing counts is the exact
    lower median (integer, deterministic).

    Same coarse-bucket plan as the rest of this module; exact int64
    cumsums.  Output one row.
    """
    thr_cents = int(round(threshold * 100))
    need = [by, ts_col, value_col, id_col]

    def clean(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.and_(pc.is_valid(t.column(by)),
                             pc.is_valid(t.column(ts_col))),
                     pc.is_valid(t.column(value_col)))
        t = t.select(need).filter(ok)
        cents = pc.cast(pc.round(pc.multiply(
            pc.cast(t.column(value_col), pa.float64()), 100.0)),
            pa.int64())
        return t.set_column(t.schema.get_field_index(value_col),
                            value_col, cents)

    def kernel(group: pa.Table) -> pa.Table:
        t = group.sort_by([(by, "ascending"), (ts_col, "ascending"),
                           (id_col, "ascending")])
        k = t.column(by).to_numpy(zero_copy_only=False)
        d = t.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = len(k)
        starts = np.flatnonzero(_segments(k))
        ends = np.append(starts[1:], n)
        nk = 0
        crossed = []
        for s, e in zip(starts, ends):
            nk += 1
            c = np.cumsum(d[s:e])
            hit = np.flatnonzero(c >= thr_cents)
            if len(hit):
                crossed.append(int(hit[0]) + 1)
        return pa.table({
            "n_keys": pa.array([nk], pa.int64()),
            "crossed": pa.array([crossed],
                                pa.list_(pa.int64())),
        })

    parts = (
        ds.select_columns(need)
        .map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            lambda t: t.append_column("coarse", pa.array(
                (hash64(t.column(by)) % np.uint64(n_buckets)).astype(
                    np.int64))),
            batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse").map_groups(kernel, batch_format="pyarrow")
    ).take_all()
    n_keys = sum(r["n_keys"] for r in parts)
    crossed = sorted(x for r in parts for x in r["crossed"])
    import ray

    nc = len(crossed)
    return ray.data.from_arrow(pa.table({
        "n_keys": pa.array([n_keys], pa.int64()),
        "n_crossed": pa.array([nc], pa.int64()),
        "min_events": pa.array(
            [crossed[0] if nc else None], pa.int64()),
        "median_events": pa.array(
            [crossed[(nc - 1) // 2] if nc else None], pa.int64()),
        "max_events": pa.array(
            [crossed[-1] if nc else None], pa.int64()),
    }))
