"""Temporal / sequence validation checks (SURVEY.md §2 ext).

Two production-suite invariants the upstream reference can only express
as hand-written predicates over pre-sorted rows (``datatest/validation.py
:: validate`` with a callable requirement; SURVEY.md §2.A2):

* :class:`MonotonicCheck` — a value column must be non-decreasing (or
  non-increasing) within each group when rows are ordered by an order
  column.  Distributed plan: one coarse-bucket shuffle on the group key
  (same plan family as ``stages/winfunc.py``), then a per-bucket Arrow
  sort + vectorized shift compare — no Python loop over rows or keys.
* :class:`FreshnessCheck` — every group's newest timestamp must be
  within ``max_lag_s`` seconds of the table-wide newest timestamp (the
  "stale partition" test).  Plan: per-batch ``(group, max_ts)`` partials
  -> one tiny groupby-max shuffle (one row per group) -> single-block
  finalize that knows the global max.  The shuffle payload is O(groups),
  never O(rows).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..differences import empty_violations, violations_table
from .base import Check, RunContext, round6_half_up

__all__ = ["MonotonicCheck", "FreshnessCheck", "SequenceContiguityCheck",
           "acf_daily", "expfit_ks", "km_survival",
           "circular_hour_stats", "dispersion_index_hourly",
           "holt_daily", "nelson_aalen", "holt_winters_daily", "dow_strength",
           "mase_daily", "c_chart", "bollinger_daily",
           "stoch_donchian_daily", "gumbel_weekly_max", "cox_stuart_daily",
           "hoeffding_d_daily", "distance_correlation_daily",
           "ljung_box_daily", "von_neumann_daily",
           "buishand_range_daily", "binseg_change_daily",
           "page_hinkley_daily", "seasonal_mk_daily",
           "turning_points_daily", "bartels_rank_daily",
           "hampel_daily", "hurst_rs_daily", "granger_lag1_daily",
           "transfer_entropy_daily", "ewma_chart_daily",
           "optimal_changepoints_daily", "sax_motifs_daily",
           "sign_test_daily", "ccc_daily", "median_polish_dow_type",
           "above_median_streak", "variogram_daily",
           "extremal_index_daily", "intermittency_classes",
           "spectral_entropy_daily", "records_daily",
           "time_reversibility_daily", "capacity_profile_daily"]


def acf_daily(ds, ts_col: str, *, by: str, max_lag: int = 3,
              count_col: Optional[str] = None):
    """Autocorrelation (Pearson, row-lag over the ordered day series)
    of the daily event-count series per ``by`` group, for lags
    1..max_lag — the periodicity probe for ingest monitoring (a strong
    lag-7 on daily volume = weekly seasonality; a lag-1 near 1 = drift,
    near 0 = noise).

    Plan: ONE row-level shuffle builds the (group, day) daily counts
    (O(groups x days) rows — bounded); the per-group ACF is then a
    vectorized kernel inside ``map_groups`` over that tiny aggregate.
    Lag pairs follow ROW semantics over the ordered existing days
    (exactly SQL ``corr(n, lag(n, l) OVER (PARTITION BY g ORDER BY
    day))``), matching the oracle even when days are missing.
    NULL group keys / timestamps are excluded (SQL corr ignores them
    anyway once lag pairs go null).
    """
    from ray.data.aggregate import Count

    def to_day(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(ts_col)),
                     pc.is_valid(t.column(by)))
        t = t.filter(ok)
        day = pc.strftime(pc.floor_temporal(t.column(ts_col), unit="day"),
                          format="%Y-%m-%d")
        return pa.table({by: t.column(by), "day": day})

    daily = (
        ds.select_columns([ts_col, by])
        .map_batches(to_day, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([by, "day"]).aggregate(Count(alias_name="n"))
    )

    def acf_group(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        x = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        key = t.column(by)[0]
        lags, ns, vals = [], [], []
        for lag in range(1, max_lag + 1):
            a, b = x[lag:], x[:-lag]
            lags.append(lag)
            ns.append(len(a))
            if len(a) < 2 or a.std() == 0.0 or b.std() == 0.0:
                vals.append(None)  # SQL corr is NULL on degenerate pairs
                continue
            c = np.corrcoef(a, b)[0, 1]
            vals.append(round(float(c), 6))
        return pa.table({
            by: pa.array([key.as_py()] * len(lags)),
            "lag": pa.array(lags, pa.int64()),
            "n_pairs": pa.array(ns, pa.int64()),
            "acf": pa.array(vals, pa.float64()),
        })

    return daily.groupby(by).map_groups(acf_group, batch_format="pyarrow")


class MonotonicCheck(Check):
    """``value_col`` ordered by ``(order_col, id_col)`` within each
    ``by`` group must be monotonic; every step in the wrong direction
    emits one ``deviation`` violation row (``value_num`` = offending
    value, ``expected_num`` = its predecessor, ``deviation`` = the
    signed step).

    Ties on ``order_col`` are broken by ``id_col`` so a SQL oracle's
    ``lag(v) OVER (PARTITION BY by ORDER BY order_col, id_col)``
    reproduces the exact same predecessor.
    """

    def __init__(self, by: str, order_col: str, value_col: str,
                 id_col: str, *, direction: str = "non_decreasing",
                 n_buckets: int = 256, check_id: Optional[str] = None):
        assert direction in ("non_decreasing", "non_increasing")
        self.by = by
        self.order_col = order_col
        self.value_col = value_col
        self.id_col = id_col
        self.direction = direction
        self.n_buckets = n_buckets
        self.check_id = check_id or (
            f"monotonic({value_col} by {by} over {order_col})")
        self.columns = [by, order_col, value_col, id_col]

    def violations(self, ds, ctx: RunContext):
        from ..functions.aggregates import hash64
        from .base import coalesced

        by, order_col = self.by, self.order_col
        value_col, id_col = self.value_col, self.id_col
        decreasing = self.direction == "non_increasing"
        check_id = self.check_id
        default_part = ctx.default_partition
        need = list(dict.fromkeys(
            [by, order_col, value_col, id_col]))
        n_buckets = np.uint64(self.n_buckets)

        def add_bucket(batch: pa.Table) -> pa.Table:
            coarse = (hash64(batch.column(by)) % n_buckets).astype(np.int64)
            return batch.select(need).append_column(
                "coarse", pa.array(coarse))

        def kernel(group: pa.Table) -> pa.Table:
            t = group.sort_by([(by, "ascending"),
                               (order_col, "ascending"),
                               (id_col, "ascending")])
            keys = t.column(by).to_numpy(zero_copy_only=False)
            v = t.column(value_col).to_numpy(zero_copy_only=False).astype(
                np.float64)
            n = len(v)
            if n == 0:
                return empty_violations()
            new_seg = np.ones(n, dtype=bool)
            new_seg[1:] = keys[1:] != keys[:-1]
            prev = np.empty(n, dtype=np.float64)
            prev[0] = np.nan
            prev[1:] = v[:-1]
            step = v - prev
            bad = (~new_seg) & ((step < 0) if not decreasing else (step > 0))
            if not bad.any():
                return empty_violations()
            idx = np.flatnonzero(bad)
            ids = t.column(id_col).take(pa.array(idx))
            return violations_table(
                len(idx), check_id=check_id, kind="deviation",
                partition_id=default_part,
                key=pc.cast(pa.array(keys[idx]), pa.string()),
                row_ref=pc.cast(ids, pa.string()),
                value_num=pa.array(v[idx]),
                expected_num=pa.array(prev[idx]),
                deviation=pa.array(step[idx]),
            )

        bucketed = coalesced(
            ds.select_columns(need).map_batches(
                add_bucket, batch_format="pyarrow", zero_copy_batch=True),
            ctx,
        )
        return bucketed.groupby("coarse").map_groups(
            kernel, batch_format="pyarrow")


class FreshnessCheck(Check):
    """Every ``group_col`` group's ``max(ts_col)`` must be within
    ``max_lag_s`` seconds of the global ``max(ts_col)``.  Stale groups
    emit one ``deviation`` row each: ``key`` = group, ``value`` = the
    group's newest timestamp (ISO seconds), ``value_num`` = lag in
    seconds, ``expected_num`` = ``max_lag_s``, ``deviation`` = lag −
    allowance.

    The single-block finalize sees one row per group (bounded by group
    cardinality, not row count) — the same "tiny aggregate output"
    shape as the sketch finalizers in ``functions/aggregates.py``.
    """

    def __init__(self, group_col: str, ts_col: str, max_lag_s: float,
                 check_id: Optional[str] = None):
        self.group_col = group_col
        self.ts_col = ts_col
        self.max_lag_s = float(max_lag_s)
        self.check_id = check_id or (
            f"freshness({ts_col} by {group_col} <= {max_lag_s}s)")
        self.columns = [group_col, ts_col]

    def violations(self, ds, ctx: RunContext):
        from ray.data.aggregate import Max

        from .base import coalesced

        group_col, ts_col = self.group_col, self.ts_col
        max_lag_s, check_id = self.max_lag_s, self.check_id
        default_part = ctx.default_partition

        def partial(batch: pa.Table) -> pa.Table:
            # epoch micros as int64: Ray's Max aggregate is
            # numeric-only, and micros round-trip exactly
            us = batch.column(ts_col).cast(pa.int64())
            t = pa.table({group_col: batch.column(group_col), "us": us})
            g = t.group_by(group_col).aggregate([("us", "max")])
            return pa.table({group_col: g.column(group_col),
                             "us": g.column("us_max")})

        partials = coalesced(
            ds.select_columns([group_col, ts_col]).map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True),
            ctx, cap=4,
        )
        merged = partials.groupby(group_col).aggregate(
            Max("us", alias_name="us"))

        def finalize(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return empty_violations()
            us = t.column("us").to_numpy(zero_copy_only=False).astype(
                np.int64)
            lag_s = (us.max() - us) / 1e6
            stale = lag_s > max_lag_s
            if not stale.any():
                return empty_violations()
            idx = np.flatnonzero(stale)
            groups = t.column(group_col).take(pa.array(idx))
            newest = pa.array(us[idx] // 1_000_000).cast(pa.timestamp("s"))
            return violations_table(
                len(idx), check_id=check_id, kind="deviation",
                partition_id=default_part,
                key=pc.cast(groups, pa.string()),
                value=pc.strftime(newest, "%Y-%m-%d %H:%M:%S"),
                value_num=pa.array(lag_s[idx]),
                expected_num=max_lag_s,
                deviation=pa.array(lag_s[idx] - max_lag_s),
            )

        return merged.repartition(1).map_batches(
            finalize, batch_format="pyarrow", batch_size=None)


class SequenceContiguityCheck(Check):
    """Within each ``group_col`` group, the integer ``seq_col`` must be
    exactly ``1..n`` (no gaps, no duplicates, starts at 1) — the
    "line-number integrity" invariant of any header/detail schema.
    A group fails when ``count != max(seq)`` or ``min(seq) != 1``; it
    emits one ``deviation`` row (``value_num`` = row count,
    ``expected_num`` = max seq, ``deviation`` = count − max).

    Plan: per-batch (group, count, min, max) partials -> one
    coarse-bucket shuffle on the group hash -> vectorized segment
    combine.  The shuffle carries three ints per group per block."""

    def __init__(self, group_col: str, seq_col: str,
                 check_id: Optional[str] = None):
        self.group_col = group_col
        self.seq_col = seq_col
        self.columns = [group_col, seq_col]
        self.check_id = check_id or (
            f"seq_contiguous({seq_col} by {group_col})")

    def violations(self, ds, ctx: RunContext):
        from ..functions.aggregates import hash64
        from .base import coalesced

        g, s = self.group_col, self.seq_col
        check_id = self.check_id
        default_part = ctx.default_partition

        def partial(batch: pa.Table) -> pa.Table:
            t = pa.table({g: batch.column(g),
                          "s": batch.column(s).cast(pa.int64())})
            agg = t.group_by(g).aggregate(
                [("s", "count"), ("s", "min"), ("s", "max")])
            return pa.table({
                "k": agg.column(g),
                "n": agg.column("s_count").cast(pa.int64()),
                "lo": agg.column("s_min"),
                "hi": agg.column("s_max"),
            })

        def add_coarse(batch: pa.Table) -> pa.Table:
            h = hash64(batch.column("k")) % np.uint64(256)
            return batch.append_column("coarse", pa.array(h.astype(np.int64)))

        def combine(group: pa.Table) -> pa.Table:
            k = group.column("k").combine_chunks()
            k_np = k.to_numpy(zero_copy_only=False)
            n = group.column("n").to_numpy(zero_copy_only=False)
            lo = group.column("lo").to_numpy(zero_copy_only=False)
            hi = group.column("hi").to_numpy(zero_copy_only=False)
            order = np.argsort(k_np, kind="stable")
            k_np, n, lo, hi = k_np[order], n[order], lo[order], hi[order]
            new_seg = np.ones(len(k_np), dtype=bool)
            if len(k_np):
                new_seg[1:] = k_np[1:] != k_np[:-1]
            seg = np.cumsum(new_seg) - 1
            tot = np.bincount(seg, weights=n).astype(np.int64)
            n_seg = len(tot)
            lo_seg = np.full(n_seg, np.iinfo(np.int64).max)
            np.minimum.at(lo_seg, seg, lo)
            hi_seg = np.full(n_seg, np.iinfo(np.int64).min)
            np.maximum.at(hi_seg, seg, hi)
            bad = (tot != hi_seg) | (lo_seg != 1)
            if not bad.any():
                return empty_violations()
            first = np.flatnonzero(new_seg)
            keys = k.take(pa.array(order[first[bad]]))
            return violations_table(
                int(bad.sum()), check_id=check_id, kind="deviation",
                partition_id=default_part,
                key=pc.cast(keys, pa.string()),
                value_num=pa.array(tot[bad].astype(np.float64)),
                expected_num=pa.array(hi_seg[bad].astype(np.float64)),
                deviation=pa.array((tot[bad] - hi_seg[bad]).astype(
                    np.float64)),
            )

        partials = coalesced(
            ds.select_columns([g, s]).map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True),
            ctx,
        ).map_batches(add_coarse, batch_format="pyarrow",
                      zero_copy_batch=True)
        return partials.groupby("coarse").map_groups(
            combine, batch_format="pyarrow")


def _epoch_day(ts_col) -> pa.Array:
    us = pc.cast(pc.cast(ts_col, pa.timestamp("us")), pa.int64())
    return pc.cast(pc.floor(pc.divide(pc.cast(us, pa.float64()),
                                      86400e6)), pa.int64())


def user_growth_daily(ds, ts_col: str, *, by: str):
    """Cumulative-unique growth curve: per epoch day, how many keys
    appear for the FIRST time and the running total of distinct keys
    seen — the "user growth" audit.  Two pre-aggregated shuffles
    (per-key min day, then per-day count); the cumulative sum runs over
    the tiny per-day table in one final block.

    Output: (day int64 epoch days, n_new int64, n_cumulative int64).
    """
    from ray.data.aggregate import Count, Min

    def project(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(by)), pc.is_valid(t.column(ts_col)))
        t = t.filter(ok)
        return pa.table({by: t.column(by),
                         "day": _epoch_day(t.column(ts_col))})

    first = (
        ds.select_columns([by, ts_col])
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(by).aggregate(Min("day", alias_name="first_day"))
    )
    per_day = first.groupby("first_day").aggregate(Count(alias_name="n_new"))

    def cum(t: pa.Table) -> pa.Table:
        t = t.sort_by([("first_day", "ascending")])
        n = t.column("n_new").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "day": t.column("first_day"),
            "n_new": pa.array(n),
            "n_cumulative": pa.array(np.cumsum(n)),
        })

    return per_day.repartition(1).map_batches(
        cum, batch_format="pyarrow", batch_size=None)


def cohort_matrix(ds, ts_col: str, *, by: str, num_partitions: int = 8):
    """Cohort retention matrix: keys grouped by their FIRST-seen epoch
    day (the cohort), counted by how many are active ``offset`` days
    after it — the classic (cohort x offset) retention triangle.

    Plan: distinct (key, day) pairs (one shuffle), per-key min day (one
    tiny shuffle), hash-join pairs back to their cohort, then ONE
    (cohort, offset) count shuffle — every exchange is pre-aggregated,
    nothing keys on raw rows.

    Output: (cohort_day int64, offset_days int64, n_users int64).
    """
    from ray.data.aggregate import Count, Min

    from .relational import safe_join

    def project(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(by)), pc.is_valid(t.column(ts_col)))
        t = t.filter(ok)
        return pa.table({by: t.column(by),
                         "day": _epoch_day(t.column(ts_col))})

    pairs = (
        ds.select_columns([by, ts_col])
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([by, "day"]).aggregate(Count(alias_name="_c"))
    )
    first = pairs.groupby(by).aggregate(Min("day", alias_name="cohort"))
    joined = safe_join(pairs, first, join_type="inner",
                       num_partitions=num_partitions, on=(by,))

    def derive(t: pa.Table) -> pa.Table:
        return pa.table({
            "cohort_day": t.column("cohort"),
            "offset_days": pc.subtract(t.column("day"), t.column("cohort")),
        })

    return (
        joined.map_batches(derive, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby(["cohort_day", "offset_days"])
        .aggregate(Count(alias_name="n_users"))
    )


def xcorr_daily(ds, ts_col: str, *, type_col: str, type_a: str,
                type_b: str, max_lag: int = 2):
    """Lead-lag cross-correlation between two event types' daily-count
    series: corr(a[day], b[day + lag]) for lag in -max_lag..max_lag,
    over calendar days where BOTH series exist — "do purchases follow
    clicks by a day?".  Output: (lag int64, n_days int64, xcorr float64
    round-6, NULL on degenerate overlap like SQL corr).

    ONE row-level shuffle (daily counts per type); the lag alignment
    runs vectorized (searchsorted on calendar day) over the tiny
    per-day table in a single final block.
    """
    from ray.data.aggregate import Count

    def to_day(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(ts_col)),
                     pc.is_in(t.column(type_col),
                              value_set=pa.array([type_a, type_b])))
        t = t.filter(ok)
        us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                     pa.int64())
        day = pc.cast(pc.floor(pc.divide(pc.cast(us, pa.float64()),
                                         86400e6)), pa.int64())
        return pa.table({"day": day, "et": t.column(type_col)})

    daily = (
        ds.select_columns([ts_col, type_col])
        .map_batches(to_day, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["day", "et"]).aggregate(Count(alias_name="n"))
    )

    def kernel(t: pa.Table) -> pa.Table:
        et = t.column("et").to_numpy(zero_copy_only=False)
        day = t.column("day").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        ma, mb = et == type_a, et == type_b
        da, na = day[ma], n[ma]
        db, nb = day[mb], n[mb]
        oa, ob = np.argsort(da), np.argsort(db)
        da, na, db, nb = da[oa], na[oa], db[ob], nb[ob]
        lags = np.arange(-max_lag, max_lag + 1, dtype=np.int64)
        n_days, vals = [], []
        for lag in lags:
            idx = np.searchsorted(db, da + lag)
            ok = (idx < len(db))
            ok[ok] = db[idx[ok]] == da[ok] + lag
            x, y = na[ok], nb[idx[ok]]
            n_days.append(int(ok.sum()))
            if len(x) < 2 or x.std() == 0.0 or y.std() == 0.0:
                vals.append(None)
            else:
                vals.append(round(float(np.corrcoef(x, y)[0, 1]), 6))
        return pa.table({
            "lag": pa.array(lags),
            "n_days": pa.array(n_days, pa.int64()),
            "xcorr": pa.array(vals, pa.float64()),
        })

    return daily.repartition(1).map_batches(
        kernel, batch_format="pyarrow", batch_size=None)


def trend_daily(ds, ts_col: str, *, by: str):
    """Nonparametric trend audit per group over the daily-count series:
    Mann-Kendall S (sum of pairwise sign differences — INTEGER exact),
    Kendall tau-a = S / n_pairs, and the Theil-Sen slope (median of all
    pairwise slopes, robust to outlier days).  The "is ingest volume
    drifting" test that a mean-based regression gets wrong on spiky
    series.

    ONE row-level shuffle (daily counts), then a vectorized pairwise
    kernel per group over the tiny per-day aggregate (m days -> m(m-1)/2
    pairs; m is calendar-bounded).  Output: (by, n_days, n_pairs,
    mk_s int64, tau round-6, sen_slope round-6).
    """
    from ray.data.aggregate import Count

    def to_day(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(ts_col)),
                     pc.is_valid(t.column(by)))
        t = t.filter(ok)
        us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                     pa.int64())
        day = pc.cast(pc.floor(pc.divide(pc.cast(us, pa.float64()),
                                         86400e6)), pa.int64())
        return pa.table({by: t.column(by), "day": day})

    daily = (
        ds.select_columns([ts_col, by])
        .map_batches(to_day, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([by, "day"]).aggregate(Count(alias_name="n"))
    )

    def kernel(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        day = t.column("day").to_numpy(zero_copy_only=False).astype(
            np.float64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        key = t.column(by)[0].as_py()
        m = len(n)
        i, j = np.triu_indices(m, k=1)
        dn = n[j] - n[i]
        dd = day[j] - day[i]
        s = int(np.sign(dn).sum())
        n_pairs = len(i)
        # raw count quotient, NOT rounded (6-dp half-even vs
        # half-away tie risk); sen_slope stays rounded — quantile
        # interpolation of arbitrary rationals can't hit exact halves
        tau = s / n_pairs if n_pairs else None
        sen = round(float(np.quantile(dn / dd, 0.5)), 6) if n_pairs else None
        return pa.table({
            by: pa.array([key]),
            "n_days": pa.array([m], pa.int64()),
            "n_pairs": pa.array([n_pairs], pa.int64()),
            "mk_s": pa.array([s], pa.int64()),
            "tau": pa.array([tau], pa.float64()),
            "sen_slope": pa.array([sen], pa.float64()),
        })

    return daily.groupby(by).map_groups(kernel, batch_format="pyarrow")


def ohlc_daily(ds, ts_col: str, *, by: str, value_col: str, id_col: str):
    """Daily OHLC (open/high/low/close) bars per key — the canonical
    time-bucketed summary for any metered value stream (prices, spend,
    sensor readings).  Open/close are tie-proof: "first/last" is the
    lexicographic (ts, id) extreme, so same-timestamp rows resolve
    identically on any engine and any partitioning.

    Per-batch combiner emits ONE partial row per (key, day) per block
    (open/close candidates carried as (ts, id, value) triples, high/low
    as plain extremes), then a tiny ``groupby(key, day).map_groups``
    merges partials — raw rows never shuffle.

    Null values/keys/timestamps are excluded.  Output:
    (by, day, open, high, low, close, n) with day = UTC epoch day.
    """
    DAY_US = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_kleene(pc.and_kleene(
            pc.is_valid(batch.column(by)),
            pc.is_valid(batch.column(ts_col))),
            pc.is_valid(batch.column(value_col))))
        if batch.num_rows == 0:
            return pa.table({
                by: pa.array([], batch.schema.field(by).type),
                "day": pa.array([], pa.int64()),
                "o_ts": pa.array([], pa.int64()),
                "o_id": pa.array([], pa.int64()),
                "o_val": pa.array([], pa.float64()),
                "c_ts": pa.array([], pa.int64()),
                "c_id": pa.array([], pa.int64()),
                "c_val": pa.array([], pa.float64()),
                "lo": pa.array([], pa.float64()),
                "hi": pa.array([], pa.float64()),
                "n": pa.array([], pa.int64()),
            })
        ts_us = pc.cast(pc.cast(batch.column(ts_col), pa.timestamp("us")),
                        pa.int64()).to_numpy(zero_copy_only=False)
        day = np.floor_divide(ts_us, DAY_US)
        keys = batch.column(by).to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        vals = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.float64)
        # lexicographic (key, day, ts, id) order: first per segment is
        # the open candidate, last the close candidate
        order = np.lexsort((ids, ts_us, day, keys))
        k_s, d_s = keys[order], day[order]
        new = np.ones(len(k_s), dtype=bool)
        if len(k_s) > 1:
            new[1:] = (k_s[1:] != k_s[:-1]) | (d_s[1:] != d_s[:-1])
        seg = np.cumsum(new) - 1
        m = int(seg[-1]) + 1
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(k_s)) - 1
        lo = np.full(m, np.inf)
        hi = np.full(m, -np.inf)
        v_s = vals[order]
        np.minimum.at(lo, seg, v_s)
        np.maximum.at(hi, seg, v_s)
        kcol = batch.column(by)
        kcol = kcol.combine_chunks() if isinstance(kcol, pa.ChunkedArray) \
            else kcol
        return pa.table({
            by: pc.take(kcol, pa.array(order[starts], pa.int64())),
            "day": pa.array(d_s[starts]),
            "o_ts": pa.array(ts_us[order[starts]]),
            "o_id": pa.array(ids[order[starts]].astype(np.int64)),
            "o_val": pa.array(v_s[starts]),
            "c_ts": pa.array(ts_us[order[ends]]),
            "c_id": pa.array(ids[order[ends]].astype(np.int64)),
            "c_val": pa.array(vals[order[ends]]),
            "lo": pa.array(lo),
            "hi": pa.array(hi),
            "n": pa.array(np.bincount(seg, minlength=m).astype(np.int64)),
        })

    def merge(group: pa.Table) -> pa.Table:
        o_ts = group.column("o_ts").to_numpy(zero_copy_only=False)
        o_id = group.column("o_id").to_numpy(zero_copy_only=False)
        c_ts = group.column("c_ts").to_numpy(zero_copy_only=False)
        c_id = group.column("c_id").to_numpy(zero_copy_only=False)
        oi = np.lexsort((o_id, o_ts))[0]
        ci = np.lexsort((c_id, c_ts))[-1]
        return pa.table({
            by: group.column(by)[:1],
            "day": group.column("day")[:1],
            "open": group.column("o_val")[oi:oi + 1],
            "high": pa.array(
                [float(pc.max(group.column("hi")).as_py())], pa.float64()),
            "low": pa.array(
                [float(pc.min(group.column("lo")).as_py())], pa.float64()),
            "close": group.column("c_val")[ci:ci + 1],
            "n": pa.array(
                [int(pc.sum(group.column("n")).as_py())], pa.int64()),
        })

    need = list(dict.fromkeys([by, ts_col, value_col, id_col]))
    return ds.select_columns(need).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby([by, "day"]).map_groups(merge, batch_format="pyarrow")


def hourly_peak(ds, ts_col: str, *, by: str):
    """Hour-of-day load profile per key: which UTC hour carries each
    key's traffic peak and how concentrated that peak is — the
    capacity-planning / bot-detection companion to the day-of-week
    rollup (a key whose traffic all lands in one hour is not human).

    Per-batch 24-bin bincount partials per key → one tiny
    groupby(key, hour) Sum → per-key argmax with smallest-hour
    tie-break.  Output: (by, peak_hour, n_peak, n_total, share 6 dp).
    """
    from ray.data.aggregate import Sum

    HOUR_US = 3_600_000_000

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_kleene(
            pc.is_valid(batch.column(by)),
            pc.is_valid(batch.column(ts_col))))
        us = pc.cast(pc.cast(batch.column(ts_col), pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        hour = (us // HOUR_US) % 24
        keys = batch.column(by)
        keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) \
            else keys
        kc = pc.dictionary_encode(keys)
        codes = np.asarray(kc.indices, dtype=np.int64)
        nd = len(kc.dictionary)
        cnt = np.bincount(codes * 24 + hour, minlength=nd * 24)
        keep = np.flatnonzero(cnt)
        return pa.table({
            by: pc.take(kc.dictionary, pa.array(keep // 24)),
            "hour": pa.array((keep % 24).astype(np.int64)),
            "n": pa.array(cnt[keep].astype(np.int64)),
        })

    counts = ds.select_columns([by, ts_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby([by, "hour"]).aggregate(Sum("n", alias_name="n"))

    def peak(group: pa.Table) -> pa.Table:
        n = group.column("n").to_numpy(zero_copy_only=False).astype(
            np.int64)
        h = group.column("hour").to_numpy(zero_copy_only=False).astype(
            np.int64)
        order = np.lexsort((h, -n))
        i = order[0]
        tot = int(n.sum())
        return pa.table({
            by: group.column(by)[:1],
            "peak_hour": pa.array([int(h[i])], pa.int64()),
            "n_peak": pa.array([int(n[i])], pa.int64()),
            "n_total": pa.array([tot], pa.int64()),
            # raw quotient of exact ints (see drift.py rare-combo
            # note): rounding a rational can hit a half-even vs
            # half-away tie between engines
            "share": pa.array([float(n[i]) / tot],
                              pa.float64()),
        })

    return counts.groupby(by).map_groups(peak, batch_format="pyarrow")


def rate_with_ci(ds, ts_col: str, *, type_col: str, target: str,
                 z: float = 1.96):
    """Daily incident-rate SLO with a Wilson confidence interval: per
    UTC day, the share of rows whose ``type_col`` equals ``target``
    plus the Wilson score interval — the uncertainty-aware version of
    a bare error-rate chart, so low-traffic days do not fire alerts on
    noise.

    Per-batch (day, n, n_target) partials → one tiny groupby → a
    closed-form finalize (identical IEEE ops both engines, 6 dp).
    Output: (day, n, n_target, rate, ci_lo, ci_hi).
    """
    from ray.data.aggregate import Sum

    DAY_US = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_kleene(
            pc.is_valid(batch.column(ts_col)),
            pc.is_valid(batch.column(type_col))))
        us = pc.cast(pc.cast(batch.column(ts_col), pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        day = us // DAY_US
        hit = pc.equal(batch.column(type_col), target).to_numpy(
            zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(day, return_inverse=True)
        return pa.table({
            "day": pa.array(uniq),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "n_target": pa.array(np.bincount(inv, weights=hit).astype(
                np.int64)),
        })

    merged = ds.select_columns([ts_col, type_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("day").aggregate(Sum("n", alias_name="n"),
                               Sum("n_target", alias_name="n_target"))

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            f = pa.array([], pa.float64())
            return pa.table({"day": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "n_target": pa.array([], pa.int64()),
                             "rate": f, "ci_lo": f, "ci_hi": f})
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        k = t.column("n_target").to_numpy(zero_copy_only=False).astype(
            np.float64)
        p = k / n
        z2 = z * z
        denom = 1.0 + z2 / n
        center = (p + z2 / (2.0 * n)) / denom
        half = (z * np.sqrt(p * (1.0 - p) / n
                            + z2 / (4.0 * n * n))) / denom
        return pa.table({
            "day": pc.cast(t.column("day"), pa.int64()),
            "n": pc.cast(t.column("n"), pa.int64()),
            "n_target": pc.cast(t.column("n_target"), pa.int64()),
            "rate": pa.array(p),  # k/n exact rational: emit raw
            "ci_lo": pa.array(np.round(center - half, 6)),
            "ci_hi": pa.array(np.round(center + half, 6)),
        })

    return merged.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True)


def churned_keys(ds, ts_col: str, *, by: str, split_day: int,
                 only_churned: bool = False):
    """Churn audit: per-key activity split around ``split_day`` (UTC
    epoch day) — (n_before, n_after, last_day_before, churned) where
    churned = active before the split with NO activity on or after it.
    The retention complement of :func:`user_growth_daily`, as a
    concrete key table with recency; ``only_churned=True`` filters to
    the churn set.

    One projection pass emits (key, n_before, last_day_before,
    n_after) per-batch partials; one tiny groupby.
    """
    from ray.data.aggregate import Max, Sum

    DAY_US = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_kleene(
            pc.is_valid(batch.column(by)),
            pc.is_valid(batch.column(ts_col))))
        us = pc.cast(pc.cast(batch.column(ts_col), pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        day = us // DAY_US
        before = day < split_day
        keys = batch.column(by)
        keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) \
            else keys
        kc = pc.dictionary_encode(keys)
        codes = np.asarray(kc.indices, dtype=np.int64)
        m = len(kc.dictionary)
        nb = np.bincount(codes[before], minlength=m).astype(np.int64)
        na = np.bincount(codes[~before], minlength=m).astype(np.int64)
        last = np.full(m, np.iinfo(np.int64).min)
        np.maximum.at(last, codes[before], day[before])
        keep = np.flatnonzero(nb + na)
        return pa.table({
            by: pc.take(kc.dictionary, pa.array(keep)),
            "n_before": pa.array(nb[keep]),
            "n_after": pa.array(na[keep]),
            "last_b": pa.array(last[keep]),
        })

    merged = ds.select_columns([by, ts_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(by).aggregate(Sum("n_before", alias_name="n_before"),
                            Sum("n_after", alias_name="n_after"),
                            Max("last_b", alias_name="last_day_before"))

    def finalize(t: pa.Table) -> pa.Table:
        churned = pc.and_(pc.greater(t.column("n_before"), 0),
                          pc.equal(t.column("n_after"), 0))
        if only_churned:
            t = t.filter(churned)
            churned = pc.and_(pc.greater(t.column("n_before"), 0),
                              pc.equal(t.column("n_after"), 0))
        nb = t.column("n_before")
        last = pc.if_else(pc.greater(nb, 0),
                          pc.cast(t.column("last_day_before"), pa.int64()),
                          pa.nulls(t.num_rows, pa.int64()))
        return pa.table({
            by: t.column(by),
            "n_before": pc.cast(nb, pa.int64()),
            "n_after": pc.cast(t.column("n_after"), pa.int64()),
            "last_day_before": last,
            "churned": pc.cast(churned, pa.int64()),
        })

    return merged.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True)


def expfit_ks(ds, ts_col: str, *, by: str, id_col: str):
    """Exponential goodness-of-fit on pooled inter-arrival gaps: fit
    λ = 1/mean to the per-key event gaps (MLE) and report the one-sample
    Kolmogorov–Smirnov distance against Exp(λ) — the Poisson-process
    sanity check behind rate alarms (a large KS means bursty/periodic
    traffic where an exponential-arrival assumption would misfire).

    Plan: gaps via the lag_diff bucketed-window stage (one coarse-key
    shuffle), then ONE groupby on the distinct gap value (counts — the
    ECDF needs cumulative counts at distinct points only), single-block
    finalize: exact integer Σgap / n for the mean (bit-identical to the
    SQL oracle's BIGINT sum), vectorized cumsum ECDF and the two-sided
    step deviation ``max(cum/n − F(v), F(v) − (cum−c)/n)``.  Output one
    row: (n, mean_gap_s, ks).  Null ts / key rows are excluded BEFORE
    the window on both engines.
    """
    from ray.data.aggregate import Sum

    from .winfunc import lag_diff

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.and_(pc.is_valid(t.column(ts_col)),
                                pc.is_valid(t.column(by))))

    gaps = lag_diff(
        ds.select_columns([id_col, by, ts_col]).map_batches(
            keep, batch_format="pyarrow", zero_copy_batch=True),
        by=by, order_col=ts_col, id_col=id_col)

    def counts(t: pa.Table) -> pa.Table:
        g = t.column("gap")
        vc = pc.value_counts(g.filter(pc.is_valid(g)))
        return pa.table({"gap": pc.cast(vc.field("values"), pa.int64()),
                         "c": pc.cast(vc.field("counts"), pa.int64())})

    merged = gaps.map_batches(
        counts, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("gap").aggregate(Sum("c", alias_name="c"))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("n", pa.int64()), ("mean_gap_s", pa.float64()),
                            ("ks", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        order = pc.sort_indices(t.column("gap"))
        g = t.column("gap").take(order).to_numpy(zero_copy_only=False)
        c = t.column("c").take(order).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n = int(c.sum())
        tot = int(np.sum(g * c))          # exact: int64 µs totals
        mu = float(tot) / float(n)        # same double division as SQL
        f = 1.0 - np.exp(-(g.astype(np.float64)) / mu)
        cum = np.cumsum(c)
        dev = np.maximum(cum / n - f, f - (cum - c) / n)
        return pa.table({
            "n": pa.array([n], pa.int64()),
            "mean_gap_s": pa.array([mu / 1e6]),
            "ks": pa.array([float(dev.max())]),
        })

    return merged.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def km_survival(ds, ts_col: str, *, by: str, horizon_days: int = 7,
                failure_type=None, type_col: str = "event_type"):
    """Kaplan–Meier survival estimate of key LIFETIME (first→last event
    span in days) with right-censoring — the churn curve: S(t) is the
    probability a user stays active beyond t days.  A key whose last
    event is within ``horizon_days`` of the corpus end is CENSORED
    (still alive); only genuinely-churned keys count as events.

    ``failure_type`` switches to time-to-failure semantics: the event
    is the key's FIRST ``type_col == failure_type`` row (duration =
    first event → first failure), censored at the last-activity span
    when the key never fails — the right framing when the corpus
    window is too short for churn (an always-active population yields
    an empty churn curve, which proves nothing).

    Plan: per-key (first, last) via native Min/Max groupby (one
    shuffle), the corpus max as a driver scalar, then ONE tiny groupby
    on the distinct duration day: the KM table needs only (events d,
    at-risk n) per distinct time, and at-risk counts are a reversed
    cumulative sum.  The survival product is computed as
    ``exp(cumsum(log(1 − d/n)))`` — the exact float recipe the SQL
    oracle's window uses, so both engines agree bitwise.  Output one
    row per EVENT time: (dur_days, d, n_risk, s).
    """
    from ray.data.aggregate import Max, Min, Sum

    fail_mode = failure_type is not None
    need = [by, ts_col] + ([type_col] if fail_mode else [])

    def project(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(ts_col)),
                     pc.is_valid(t.column(by)))
        t = t.filter(ok)
        ts_us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                        pa.int64())
        cols = {by: t.column(by), "_ts": ts_us}
        if fail_mode:
            is_fail = pc.fill_null(
                pc.equal(t.column(type_col), failure_type), False)
            cols["_fts"] = pc.if_else(is_fail, ts_us,
                                      pa.scalar(None, pa.int64()))
        return pa.table(cols)

    aggs = [Min("_ts", alias_name="first"), Max("_ts", alias_name="last")]
    if fail_mode:
        aggs.append(Min("_fts", alias_name="fail"))
    spans = (
        ds.select_columns(need)
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(by)
        .aggregate(*aggs)
    )
    # the per-key span table is consumed twice (corpus max, then the
    # duration histogram): pin it in the object store once rather than
    # re-running the groupby — it is O(keys), far smaller than events
    spans = spans.materialize()
    gmax = spans.max("last")
    cutoff = int(gmax) - horizon_days * 86_400_000_000

    def durations(t: pa.Table) -> pa.Table:
        first = t.column("first").to_numpy(zero_copy_only=False)
        last = t.column("last").to_numpy(zero_copy_only=False)
        if fail_mode:
            fts = t.column("fail").to_numpy(zero_copy_only=False)
            has = ~np.isnan(fts.astype(np.float64))
            t_end = np.where(has, np.nan_to_num(
                fts.astype(np.float64)), last.astype(np.float64)
            ).astype(np.int64)
            dur = (t_end - first) // 86_400_000_000
            ev = has.astype(np.int64)
        else:
            dur = (last - first) // 86_400_000_000
            ev = (last < cutoff).astype(np.int64)
        order = np.argsort(dur, kind="stable")
        dur, ev = dur[order], ev[order]
        new = np.ones(len(dur), dtype=bool)
        if len(dur) > 1:
            new[1:] = dur[1:] != dur[:-1]
        seg = np.cumsum(new) - 1
        first_i = np.flatnonzero(new)
        return pa.table({
            "dur_days": pa.array(dur[first_i]),
            "d": pa.array(np.bincount(seg, weights=ev).astype(np.int64)),
            "c": pa.array(np.bincount(seg).astype(np.int64)),
        })

    merged = spans.map_batches(
        durations, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("dur_days").aggregate(Sum("d", alias_name="d"),
                                    Sum("c", alias_name="c"))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("dur_days", pa.int64()), ("d", pa.int64()),
                            ("n_risk", pa.int64()), ("s", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        order = pc.sort_indices(t.column("dur_days"))
        dur = t.column("dur_days").take(order).to_numpy(
            zero_copy_only=False)
        d = t.column("d").take(order).to_numpy(
            zero_copy_only=False).astype(np.int64)
        c = t.column("c").take(order).to_numpy(
            zero_copy_only=False).astype(np.int64)
        total = int(c.sum())
        n_risk = total - (np.cumsum(c) - c)
        ev = d > 0
        dur, d, n_risk = dur[ev], d[ev], n_risk[ev]
        # direct cumulative product (NOT exp∘Σln: a time where every
        # remaining key fails gives the factor 0, where ln(0) errors)
        s = np.cumprod(1.0 - d * 1.0 / n_risk)
        return pa.table({
            "dur_days": pa.array(dur.astype(np.int64)),
            "d": pa.array(d),
            "n_risk": pa.array(n_risk.astype(np.int64)),
            "s": pa.array(s),
        })

    return merged.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def pettitt_daily(ds, ts_col: str):
    """Pettitt change-point test on the DAILY EVENT-COUNT series — the
    nonparametric single-change-point detector (rank-based
    Mann–Whitney family: no distribution assumption, robust to
    outliers).  U_t = 2·Σ_{i≤t} rank_i − t·(n+1); the split day is the
    argmax of |U_t| (first on ties), K = max|U_t|.

    Daily counts are integers, so the average-rank tie handling is
    EXACT on both engines (no float-rank divergence).  Plan: one tiny
    ``groupby(day)`` count → single-block finalize (argsort + tie-
    averaged ranks + cumsum).  Output one row: (split_day, k_stat,
    n_days).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        ts = ts.filter(pc.is_valid(ts))
        # integer division (ts are positive): exact, mirrors SQL `//`
        day = pc.divide(pc.cast(pc.cast(ts, pa.timestamp("us")),
                                pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        vc = pc.value_counts(day)
        return pa.table({"day": vc.field("values"),
                         "c": pc.cast(vc.field("counts"), pa.int64())})

    merged = (
        ds.select_columns([ts_col])
        .map_batches(partial, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("day")
        .aggregate(Sum("c", alias_name="c"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("split_day", pa.int64()),
                            ("k_stat", pa.float64()),
                            ("n_days", pa.int64())])
        if t.num_rows == 0:
            return schema.empty_table()
        order = pc.sort_indices(t.column("day"))
        day = t.column("day").take(order).to_numpy(zero_copy_only=False)
        c = t.column("c").take(order).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n = len(c)
        if n < 2:
            return pa.table({"split_day": pa.array([int(day[0])],
                                                   pa.int64()),
                             "k_stat": pa.array([0.0]),
                             "n_days": pa.array([n], pa.int64())})
        # average ranks of the daily counts (exact: integer counts)
        o2 = np.argsort(c, kind="stable")
        cs = c[o2]
        new = np.ones(n, dtype=bool)
        new[1:] = cs[1:] != cs[:-1]
        seg = np.cumsum(new) - 1
        cnt = np.bincount(seg)
        cum = np.cumsum(cnt)
        avg = cum - cnt + (cnt + 1) / 2.0
        ranks = np.empty(n, dtype=np.float64)
        ranks[o2] = avg[seg]
        u = 2.0 * np.cumsum(ranks) - np.arange(1, n + 1) * (n + 1.0)
        u = u[:-1]  # t = 1..n-1
        k = np.abs(u)
        i = int(np.argmax(k))  # first max
        return pa.table({
            "split_day": pa.array([int(day[i])], pa.int64()),
            "k_stat": pa.array([float(k[i])]),
            "n_days": pa.array([n], pa.int64()),
        })

    return merged.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def circular_hour_stats(ds, ts_col: str, *, by: str):
    """Circular (directional) statistics of the hour-of-day per group:
    the hour is an angle θ = 2π·h/24 on the clock circle, so "when
    does this event type happen" is the circular mean direction and
    the resultant length R̄ = |Σe^{iθ}|/n ∈ [0,1] (1 = always the same
    hour, 0 = uniform around the clock); circular variance = 1 − R̄.
    A linear mean of hours is wrong across midnight — this is the
    correct statistic.

    One (group, hour) count shuffle — 24 exact integers per group —
    then the trig on the tiny count table.  ``mean_angle`` is the raw
    atan2 direction in (−π, π] (no mod-24 wraparound, whose 0/24
    discontinuity would flip on a 1-ulp libm difference between
    engines); hour-of-day = mod(mean_angle·24/2π, 24).  Output per
    group: (by, n, mean_angle, resultant, circ_var).
    """
    import numpy as np
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = t.column(by)
        h = pc.hour(t.column(ts_col))
        ok = pc.and_(pc.is_valid(g), pc.is_valid(h))
        tt = pa.table({"g": g, "h": pc.cast(h, pa.int64())}).filter(ok)
        gv = tt.column("g").to_numpy(zero_copy_only=False)
        hv = tt.column("h").to_numpy(zero_copy_only=False)
        u, inv = np.unique(gv, return_inverse=True)
        m = len(u)
        code = inv * 24 + hv
        cnt = np.bincount(code, minlength=m * 24).reshape(m, 24)
        out = {by: pa.array(np.repeat(u, 24)),
               "h": pa.array(np.tile(np.arange(24, dtype=np.int64), m)),
               "c": pa.array(cnt.reshape(-1).astype(np.int64))}
        return pa.table(out)

    counts = (ds.select_columns([by, ts_col])
              .map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby([by, "h"])
              .aggregate(Sum("c", alias_name="c")))

    def finalize(t: pa.Table) -> pa.Table:
        import numpy as np

        schema = pa.schema([(by, pa.string()), ("n", pa.int64()),
                            ("mean_angle", pa.float64()),
                            ("resultant", pa.float64()),
                            ("circ_var", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        g = t.column(by).to_numpy(zero_copy_only=False)
        h = t.column("h").to_numpy(zero_copy_only=False).astype(np.int64)
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        u, inv = np.unique(g, return_inverse=True)
        ang = 2.0 * np.pi * h / 24.0
        m = len(u)
        cos_s = np.bincount(inv, weights=c * np.cos(ang), minlength=m)
        sin_s = np.bincount(inv, weights=c * np.sin(ang), minlength=m)
        n = np.bincount(inv, weights=c, minlength=m)
        r = np.sqrt(cos_s * cos_s + sin_s * sin_s) / n
        mean_ang = np.arctan2(sin_s, cos_s)
        return pa.table({
            by: pa.array(u),
            "n": pa.array(n.astype(np.int64)),
            "mean_angle": pa.array(mean_ang, pa.float64()),
            "resultant": pa.array(r, pa.float64()),
            "circ_var": pa.array(1.0 - r, pa.float64()),
        })

    return counts.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def dispersion_index_hourly(ds, ts_col: str, *, by: str):
    """Index of dispersion (Fano factor) of the hourly arrival counts
    per group: D = Var(N)/E(N) over the group's OBSERVED hourly
    buckets — D ≈ 1 is Poisson-like arrivals, D ≫ 1 is bursty
    (overdispersed), D < 1 is regular/paced.  The burstiness audit
    behind rate-limit and bot screens.

    Exact integers end-to-end: hourly counts via one (group, bucket)
    shuffle, then population variance from Σn, Σn² as big ints,
    converted to double once.  Output per group:
    (by, n_events, n_buckets, mean_per_hour, dispersion).
    """
    import numpy as np
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = t.column(by)
        hb = pc.floor_temporal(t.column(ts_col), unit="hour")
        ok = pc.and_(pc.is_valid(g), pc.is_valid(hb))
        tt = pa.table({
            "g": g,
            "b": pc.cast(pc.cast(hb, pa.timestamp("s")), pa.int64()),
        }).filter(ok)
        gv = tt.column("g").to_numpy(zero_copy_only=False)
        bv = tt.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((bv, gv))
        gv, bv = gv[order], bv[order]
        new = np.ones(len(gv), dtype=bool)
        if len(gv) > 1:
            new[1:] = (gv[1:] != gv[:-1]) | (bv[1:] != bv[:-1])
        seg = np.cumsum(new) - 1
        first = np.flatnonzero(new)
        return pa.table({
            "g": pa.array(gv[first]),
            "b": pa.array(bv[first], pa.int64()),
            "c": pa.array(np.bincount(seg).astype(np.int64)),
        })

    counts = (ds.select_columns([by, ts_col])
              .map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby(["g", "b"])
              .aggregate(Sum("c", alias_name="c")))

    def per_group(t: pa.Table) -> pa.Table:
        import numpy as np

        schema = pa.schema([(by, pa.string()), ("n_events", pa.int64()),
                            ("n_buckets", pa.int64()),
                            ("mean_per_hour", pa.float64()),
                            ("dispersion", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        g = t.column("g").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(g, return_inverse=True)
        m = len(u)
        s1 = np.bincount(inv, weights=c, minlength=m).astype(np.int64)
        s2 = np.bincount(inv, weights=c * c, minlength=m).astype(np.int64)
        nb = np.bincount(inv, minlength=m).astype(np.int64)
        rows = []
        for i in range(m):
            b, s, ss = int(nb[i]), int(s1[i]), int(s2[i])
            mean = float(s) / b
            var = float(b * ss - s * s) / (float(b) * b)
            disp = var / mean if s > 0 else None
            rows.append((u[i], s, b, mean, disp))
        return pa.table({
            by: pa.array([r[0] for r in rows]),
            "n_events": pa.array([r[1] for r in rows], pa.int64()),
            "n_buckets": pa.array([r[2] for r in rows], pa.int64()),
            "mean_per_hour": pa.array([r[3] for r in rows], pa.float64()),
            "dispersion": pa.array([r[4] for r in rows], pa.float64()),
        })

    return counts.repartition(1).map_batches(
        per_group, batch_format="pyarrow", batch_size=None)


def holt_daily(ds, ts_col: str, *, by: str, alpha: float = 0.5,
               beta: float = 0.25):
    """Holt double exponential smoothing (level + trend) over each
    group's DAILY count series, emitting the one-step-ahead forecast
    and residual per day — the classic sequential-state smoother for
    "is today's volume off-trend" monitoring (catches gradual drift a
    fixed threshold misses).

        s_t = α·x_t + (1−α)(s_{t−1} + b_{t−1})
        b_t = β(s_t − s_{t−1}) + (1−β)·b_{t−1}
        resid_t = x_t − (s_{t−1} + b_{t−1})      (t ≥ 2)

    initialized s₁ = x₁, b₁ = x₂ − x₁.  α/β default to exactly-
    representable binaries (0.5, 0.25) and the recursion's op order is
    fixed, so a SQL recursive-CTE mirror is bit-identical.  Plan: ONE
    (group, day) count shuffle; the recursion runs per group over the
    tiny daily table (sequential by nature — days per group, not
    rows).  Groups with <2 days are skipped.  Output per day t ≥ 2:
    (by, day, x, forecast, resid).
    """
    from ray.data.aggregate import Count

    def to_day(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(ts_col)),
                     pc.is_valid(t.column(by)))
        t = t.filter(ok)
        day = pc.strftime(pc.floor_temporal(t.column(ts_col), unit="day"),
                          format="%Y-%m-%d")
        return pa.table({by: t.column(by), "day": day})

    daily = (ds.select_columns([ts_col, by])
             .map_batches(to_day, batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby([by, "day"]).aggregate(Count(alias_name="x")))

    a1 = 1.0 - alpha
    b1 = 1.0 - beta

    def smooth(group: pa.Table) -> pa.Table:
        schema = pa.schema([(by, pa.string()), ("day", pa.string()),
                            ("x", pa.int64()), ("forecast", pa.float64()),
                            ("resid", pa.float64())])
        t = group.sort_by([("day", "ascending")])
        if t.num_rows < 2:
            return schema.empty_table()
        x = t.column("x").to_numpy(zero_copy_only=False).astype(
            np.float64)
        days = t.column("day").to_pylist()
        key = t.column(by)[0].as_py()
        s = x[0]
        b = x[1] - x[0]
        out_day, out_x, out_f, out_r = [], [], [], []
        # sequential recurrence over the group's DAYS (a bounded
        # aggregate, not rows) — op order mirrors the SQL CTE exactly
        for i in range(1, len(x)):
            f = s + b
            out_day.append(days[i])
            out_x.append(int(x[i]))
            out_f.append(f)
            out_r.append(x[i] - f)
            s_new = alpha * x[i] + a1 * (s + b)
            b = beta * (s_new - s) + b1 * b
            s = s_new
        return pa.table({
            by: pa.array([key] * len(out_day)),
            "day": pa.array(out_day),
            "x": pa.array(out_x, pa.int64()),
            "forecast": pa.array(out_f, pa.float64()),
            "resid": pa.array(out_r, pa.float64()),
        })

    return daily.groupby(by).map_groups(smooth, batch_format="pyarrow")


def nelson_aalen(ds, ts_col: str, *, by: str, horizon_days: int = 7,
                 failure_type=None, type_col: str = "event_type"):
    """Nelson-Aalen cumulative-hazard estimate over key lifetimes
    (same spans/censoring as :func:`km_survival`, including the
    ``failure_type`` time-to-failure mode):

        H(t) = Σ_{t_i ≤ t} d_i / n_i,     Var = Σ d_i / n_i²

    — the additive counterpart to KM's product (preferred for hazard-
    rate comparisons: H is linear in the increments, so per-partition
    hazards sum).  Identical one-groupby plan; the cumulative sums
    mirror SQL windows.  Output one row per EVENT time:
    (dur_days, d, n_risk, h, var_h).
    """
    from ray.data.aggregate import Max, Min, Sum

    fail_mode = failure_type is not None
    need = [by, ts_col] + ([type_col] if fail_mode else [])

    def project(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(ts_col)),
                     pc.is_valid(t.column(by)))
        t = t.filter(ok)
        ts_us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                        pa.int64())
        cols = {by: t.column(by), "_ts": ts_us}
        if fail_mode:
            is_fail = pc.fill_null(
                pc.equal(t.column(type_col), failure_type), False)
            cols["_fts"] = pc.if_else(is_fail, ts_us,
                                      pa.scalar(None, pa.int64()))
        return pa.table(cols)

    aggs = [Min("_ts", alias_name="first"), Max("_ts", alias_name="last")]
    if fail_mode:
        aggs.append(Min("_fts", alias_name="fail"))
    spans = (
        ds.select_columns(need)
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(by)
        .aggregate(*aggs)
    ).materialize()
    gmax = spans.max("last")
    cutoff = int(gmax) - horizon_days * 86_400_000_000

    def durations(t: pa.Table) -> pa.Table:
        first = t.column("first").to_numpy(zero_copy_only=False)
        last = t.column("last").to_numpy(zero_copy_only=False)
        if fail_mode:
            fts = t.column("fail").to_numpy(zero_copy_only=False)
            has = ~np.isnan(fts.astype(np.float64))
            t_end = np.where(has, np.nan_to_num(
                fts.astype(np.float64)), last.astype(np.float64)
            ).astype(np.int64)
            dur = (t_end - first) // 86_400_000_000
            ev = has.astype(np.int64)
        else:
            dur = (last - first) // 86_400_000_000
            ev = (last < cutoff).astype(np.int64)
        order = np.argsort(dur, kind="stable")
        dur, ev = dur[order], ev[order]
        new = np.ones(len(dur), dtype=bool)
        if len(dur) > 1:
            new[1:] = dur[1:] != dur[:-1]
        seg = np.cumsum(new) - 1
        first_i = np.flatnonzero(new)
        return pa.table({
            "dur_days": pa.array(dur[first_i]),
            "d": pa.array(np.bincount(seg, weights=ev).astype(np.int64)),
            "c": pa.array(np.bincount(seg).astype(np.int64)),
        })

    merged = spans.map_batches(
        durations, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("dur_days").aggregate(Sum("d", alias_name="d"),
                                    Sum("c", alias_name="c"))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("dur_days", pa.int64()), ("d", pa.int64()),
                            ("n_risk", pa.int64()), ("h", pa.float64()),
                            ("var_h", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        order = pc.sort_indices(t.column("dur_days"))
        dur = t.column("dur_days").take(order).to_numpy(
            zero_copy_only=False)
        d = t.column("d").take(order).to_numpy(
            zero_copy_only=False).astype(np.int64)
        c = t.column("c").take(order).to_numpy(
            zero_copy_only=False).astype(np.int64)
        total = int(c.sum())
        n_risk = total - (np.cumsum(c) - c)
        haz = d * 1.0 / n_risk
        var = d * 1.0 / (n_risk * n_risk)
        h = np.cumsum(haz)
        vh = np.cumsum(var)
        ev = d > 0
        return pa.table({
            "dur_days": pa.array(dur[ev].astype(np.int64)),
            "d": pa.array(d[ev]),
            "n_risk": pa.array(n_risk[ev].astype(np.int64)),
            "h": pa.array(h[ev]),
            "var_h": pa.array(vh[ev]),
        })

    return merged.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def holt_winters_daily(ds, ts_col: str, *, by: str, period: int = 7,
                       alpha: float = 0.5, beta: float = 0.25,
                       gamma: float = 0.25):
    """Additive Holt-Winters (level + trend + weekly season) over each
    group's DAILY count series — :func:`holt_daily` plus the seasonal
    component, i.e. "is today off-trend AFTER accounting for the
    day-of-week cycle" (the residual a weekday-blind smoother would
    flag every Saturday).

    Init on the first ``period`` days:  L = mean(x₁..x_m) (summed in
    day order), B = 0, S_i = x_i − L.  Then for each later day, with
    s₁ the seasonal slot ``period`` days back:

        f_t = L + B + s₁                     (forecast; resid = x_t − f_t)
        L'  = α(x_t − s₁) + (1−α)(L + B)
        B'  = β(L' − L) + (1−β)B
        S'  = γ(x_t − L') + (1−γ)s₁          (rotates into the window)

    α/β/γ are exactly-representable binaries and the op order is fixed,
    so the SQL recursive-CTE mirror (carrying the rotating s₁..s₇
    window as columns) is bit-identical.  Groups shorter than
    ``period + 1`` days are skipped.  One (group, day) count shuffle;
    the recursion runs over each group's bounded daily table.  Output
    per day t > period: (by, day, x, forecast, resid).
    """
    from ray.data.aggregate import Count

    def to_day(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(ts_col)),
                     pc.is_valid(t.column(by)))
        t = t.filter(ok)
        day = pc.strftime(pc.floor_temporal(t.column(ts_col), unit="day"),
                          format="%Y-%m-%d")
        return pa.table({by: t.column(by), "day": day})

    daily = (ds.select_columns([ts_col, by])
             .map_batches(to_day, batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby([by, "day"]).aggregate(Count(alias_name="x")))

    a1, b1, g1 = 1.0 - alpha, 1.0 - beta, 1.0 - gamma

    def smooth(group: pa.Table) -> pa.Table:
        schema = pa.schema([(by, pa.string()), ("day", pa.string()),
                            ("x", pa.int64()), ("forecast", pa.float64()),
                            ("resid", pa.float64())])
        t = group.sort_by([("day", "ascending")])
        if t.num_rows < period + 1:
            return schema.empty_table()
        x = t.column("x").to_numpy(zero_copy_only=False).astype(np.float64)
        days = t.column("day").to_pylist()
        key = t.column(by)[0].as_py()
        lvl = 0.0
        for i in range(period):  # explicit day-order sum → SQL mirror
            lvl = lvl + x[i]
        lvl = lvl / float(period)
        b = 0.0
        season = [x[i] - lvl for i in range(period)]  # s₁ = oldest slot
        out_day, out_x, out_f, out_r = [], [], [], []
        for i in range(period, len(x)):
            s1 = season[0]
            f = lvl + b + s1
            out_day.append(days[i])
            out_x.append(int(x[i]))
            out_f.append(f)
            out_r.append(x[i] - f)
            l_new = alpha * (x[i] - s1) + a1 * (lvl + b)
            b = beta * (l_new - lvl) + b1 * b
            s_new = gamma * (x[i] - l_new) + g1 * s1
            lvl = l_new
            season = season[1:] + [s_new]
        return pa.table({
            by: pa.array([key] * len(out_day)),
            "day": pa.array(out_day),
            "x": pa.array(out_x, pa.int64()),
            "forecast": pa.array(out_f, pa.float64()),
            "resid": pa.array(out_r, pa.float64()),
        })

    return daily.groupby(by).map_groups(smooth, batch_format="pyarrow")


def dow_strength(ds, ts_col: str, *, by: str):
    """Day-of-week seasonality strength per group: the share of daily-
    count variance explained by the ISO-weekday profile,

        r2 = SS_between / SS_total
           = (Σ_d S_d²/n_d − S²/N) / (Σ x² − S²/N)

    over the group's daily counts x (d = isodow 1..7) — "how weekly IS
    this series" (≈1: pick the seasonal smoother; ≈0: don't).  All
    sums are exact integers up to the final division, so a SQL mirror
    hashes identically.  Plan: ONE (group, day) count shuffle; the
    per-group dow reduction runs over the bounded daily table.  Output
    (by, n_days, r2) with r2 NULL for constant series; groups with <2
    days are skipped.
    """
    from ray.data.aggregate import Count

    def to_day(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(ts_col)),
                     pc.is_valid(t.column(by)))
        t = t.filter(ok)
        day = pc.strftime(pc.floor_temporal(t.column(ts_col), unit="day"),
                          format="%Y-%m-%d")
        return pa.table({by: t.column(by), "day": day})

    daily = (ds.select_columns([ts_col, by])
             .map_batches(to_day, batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby([by, "day"]).aggregate(Count(alias_name="x")))

    def finalize(group: pa.Table) -> pa.Table:
        schema = pa.schema([(by, pa.string()), ("n_days", pa.int64()),
                            ("r2", pa.float64())])
        if group.num_rows < 2:
            return schema.empty_table()
        key = group.column(by)[0].as_py()
        dow = pc.day_of_week(
            pc.strptime(group.column("day"), format="%Y-%m-%d",
                        unit="us"),
            count_from_zero=False, week_start=1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        x = group.column("x").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = len(x)
        s = int(x.sum())
        ss = int((x * x).sum())
        n_d = np.bincount(dow, minlength=8)[1:]
        s_d = np.bincount(dow, weights=x, minlength=8)[1:].astype(np.int64)
        keep = n_d > 0
        between = float((s_d[keep].astype(np.float64) ** 2
                         / n_d[keep]).sum()) - s * s / n
        total = ss - s * s / n
        r2 = between / total if total > 0 else None
        return pa.table({
            by: pa.array([key]),
            "n_days": pa.array([n], pa.int64()),
            "r2": pa.array([None if r2 is None else round(r2, 6)],
                           pa.float64()),
        })

    return daily.groupby(by).map_groups(finalize, batch_format="pyarrow")


def mase_daily(ds, ts_col: str, *, by: str, period: int = 7,
               alpha: float = 0.5, beta: float = 0.25,
               gamma: float = 0.25):
    """Forecast-accuracy scoreboard per group: MASE of the
    Holt-Winters one-step forecasts (:func:`holt_winters_daily`, same
    recursion and init) against the seasonal-naive benchmark
    x̂_t = x_{t−period} over the same days (t > period):

        mase = mean|resid_model| / mean|x_t − x_{t−period}|

    — the scale-free "is the smoother actually better than 'same day
    last week'" gate (mase < 1: keep the model; ≥ 1: the naive rule
    wins).  Same one-(group, day)-shuffle plan; output one row per
    group (by, n_obs, mae_model, mae_naive, mase), 6-dp rounded,
    mase NULL when the naive MAE is 0.
    """
    from ray.data.aggregate import Count

    def to_day(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(ts_col)),
                     pc.is_valid(t.column(by)))
        t = t.filter(ok)
        day = pc.strftime(pc.floor_temporal(t.column(ts_col), unit="day"),
                          format="%Y-%m-%d")
        return pa.table({by: t.column(by), "day": day})

    daily = (ds.select_columns([ts_col, by])
             .map_batches(to_day, batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby([by, "day"]).aggregate(Count(alias_name="x")))

    a1, b1, g1 = 1.0 - alpha, 1.0 - beta, 1.0 - gamma

    def score(group: pa.Table) -> pa.Table:
        schema = pa.schema([(by, pa.string()), ("n_obs", pa.int64()),
                            ("mae_model", pa.float64()),
                            ("mae_naive", pa.float64()),
                            ("mase", pa.float64())])
        t = group.sort_by([("day", "ascending")])
        if t.num_rows < period + 1:
            return schema.empty_table()
        x = t.column("x").to_numpy(zero_copy_only=False).astype(np.float64)
        key = t.column(by)[0].as_py()
        lvl = 0.0
        for i in range(period):
            lvl = lvl + x[i]
        lvl = lvl / float(period)
        b = 0.0
        season = [x[i] - lvl for i in range(period)]
        abs_m = abs_n = 0.0
        n_obs = 0
        for i in range(period, len(x)):
            s1 = season[0]
            abs_m += abs(x[i] - (lvl + b + s1))
            abs_n += abs(x[i] - x[i - period])
            n_obs += 1
            l_new = alpha * (x[i] - s1) + a1 * (lvl + b)
            b = beta * (l_new - lvl) + b1 * b
            s_new = gamma * (x[i] - l_new) + g1 * s1
            lvl = l_new
            season = season[1:] + [s_new]
        mae_m = abs_m / n_obs
        mae_n = abs_n / n_obs
        mase = mae_m / mae_n if mae_n > 0 else None
        return pa.table({
            by: pa.array([key]),
            "n_obs": pa.array([n_obs], pa.int64()),
            "mae_model": pa.array([round(mae_m, 6)], pa.float64()),
            "mae_naive": pa.array([round(mae_n, 6)], pa.float64()),
            "mase": pa.array([None if mase is None else round(mase, 6)],
                             pa.float64()),
        })

    return daily.groupby(by).map_groups(score, batch_format="pyarrow")


def c_chart(ds, ts_col: str, *, filter_expr=None, sigma: float = 3.0):
    """Poisson c-chart over daily occurrence counts: centerline
    c̄ = mean daily count, control limits c̄ ± σ·√c̄ (LCL floored at
    0) — the SRE-style "is today's error volume out of control" audit,
    assuming count ≈ Poisson so variance ≈ mean.  ``filter_expr``
    (batch → bool mask) selects the occurrences to count (e.g. only
    error events).  Output one row per day: (day, x, cl, ucl, lcl,
    out_of_control), limits 6-dp; the day table is bounded, so the
    limit computation reduces on one task.
    """
    from ray.data.aggregate import Count

    def to_day(t: pa.Table) -> pa.Table:
        if filter_expr is not None:
            t = t.filter(filter_expr(t))
        t = t.filter(pc.is_valid(t.column(ts_col)))
        day = pc.strftime(pc.floor_temporal(t.column(ts_col), unit="day"),
                          format="%Y-%m-%d")
        return pa.table({"day": day})

    daily = (ds.map_batches(to_day, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("day").aggregate(Count(alias_name="x")))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("day", pa.string()), ("x", pa.int64()),
                            ("cl", pa.float64()), ("ucl", pa.float64()),
                            ("lcl", pa.float64()),
                            ("out_of_control", pa.bool_())])
        if t.num_rows == 0:
            return schema.empty_table()
        x = t.column("x").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(x)
        cl = int(x.sum()) / n
        ucl = cl + sigma * np.sqrt(cl)
        lcl = max(cl - sigma * np.sqrt(cl), 0.0)
        out = (x > ucl) | (x < lcl)
        return pa.table({
            "day": t.column("day"),
            "x": pa.array(x, pa.int64()),
            "cl": pa.array(np.full(n, round(cl, 6)), pa.float64()),
            "ucl": pa.array(np.full(n, round(ucl, 6)), pa.float64()),
            "lcl": pa.array(np.full(n, round(lcl, 6)), pa.float64()),
            "out_of_control": pa.array(out),
        })

    return daily.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def _daily_counts(ds, ts_col: str, by: str):
    """(by, day:int64 epoch-day, n:int64) daily event counts -- the one
    row-level shuffle shared by the trailing-window indicator audits."""
    from ray.data.aggregate import Count

    def to_day(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(ts_col)),
                     pc.is_valid(t.column(by)))
        t = t.filter(ok)
        us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                     pa.int64())
        day = pc.cast(pc.floor(pc.divide(pc.cast(us, pa.float64()),
                                         86400e6)), pa.int64())
        return pa.table({by: t.column(by), "day": day})

    return (
        ds.select_columns([ts_col, by])
        .map_batches(to_day, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([by, "day"]).aggregate(Count(alias_name="n"))
    )


def bollinger_daily(ds, ts_col: str, *, by: str, window: int = 7):
    """Bollinger-band breach audit over the per-group daily-count
    series: for every full ``window``-row trailing window (observed
    days, not calendar days -- gaps compress), the band is mean +/- 2
    population-sigma and a day breaches when it falls strictly outside.
    The volume-anomaly control chart that adapts to local level, unlike
    the global-mean c-chart.

    Breach tests are evaluated in EXACT int64 arithmetic -- with s1 =
    sum(x), s2 = sum(x^2) over the window, ``x > mean + 2 sigma`` iff
    ``dev = w*x - s1 > 0 and dev^2 > 4*(w*s2 - s1^2)`` -- so the result
    is hash-stable against a SQL-window oracle (no float sqrt at the
    decision boundary).  One daily-count shuffle, then a tiny
    vectorized per-group kernel (cumsum sliding sums over m days).

    Output: (by, n_days, n_windows, n_breach_hi, n_breach_lo) int64.
    """
    w = int(window)

    def kernel(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        key = t.column(by)[0].as_py()
        x = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        m = len(x)
        hi = lo = 0
        nw = max(0, m - w + 1)
        if nw:
            c1 = np.concatenate(([0], np.cumsum(x)))
            c2 = np.concatenate(([0], np.cumsum(x * x)))
            s1 = c1[w:] - c1[:-w]
            s2 = c2[w:] - c2[:-w]
            cur = x[w - 1:]
            dev = w * cur - s1
            var = w * s2 - s1 * s1
            breach = dev * dev > 4 * var
            hi = int(np.count_nonzero(breach & (dev > 0)))
            lo = int(np.count_nonzero(breach & (dev < 0)))
        return pa.table({
            by: pa.array([key]),
            "n_days": pa.array([m], pa.int64()),
            "n_windows": pa.array([nw], pa.int64()),
            "n_breach_hi": pa.array([hi], pa.int64()),
            "n_breach_lo": pa.array([lo], pa.int64()),
        })

    return _daily_counts(ds, ts_col, by).groupby(by).map_groups(
        kernel, batch_format="pyarrow")


def stoch_donchian_daily(ds, ts_col: str, *, by: str, window: int = 14):
    """Stochastic-oscillator / Donchian-channel audit over the daily
    count series per group: %K = (x - min_w)/(max_w - min_w) over the
    trailing ``window`` observed days (inclusive), counting days in the
    overheated band (%K >= 0.8, evaluated exactly as ``5*(x - lo) >=
    4*(hi - lo)`` in int64), and Donchian breakouts -- days strictly
    above the max of the PRIOR ``window`` days.  The "is today extreme
    relative to its own recent range" screen, scale-free per group.

    Same plan as :func:`bollinger_daily`: one daily-count shuffle, then
    an exact-integer vectorized kernel per group.

    Output: (by, n_days, n_k_hi, n_breakout) int64.
    """
    w = int(window)

    def kernel(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        key = t.column(by)[0].as_py()
        x = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        m = len(x)
        k_hi = brk = 0
        if m >= w:
            win = np.lib.stride_tricks.sliding_window_view(x, w)
            lo = win.min(axis=1)
            hi = win.max(axis=1)
            cur = x[w - 1:]
            k_hi = int(np.count_nonzero(
                (hi > lo) & (5 * (cur - lo) >= 4 * (hi - lo))))
        if m >= w + 1:
            win = np.lib.stride_tricks.sliding_window_view(x[:-1], w)
            prior_hi = win.max(axis=1)
            brk = int(np.count_nonzero(x[w:] > prior_hi))
        return pa.table({
            by: pa.array([key]),
            "n_days": pa.array([m], pa.int64()),
            "n_k_hi": pa.array([k_hi], pa.int64()),
            "n_breakout": pa.array([brk], pa.int64()),
        })

    return _daily_counts(ds, ts_col, by).groupby(by).map_groups(
        kernel, batch_format="pyarrow")


def gumbel_weekly_max(ds, ts_col: str, *, by: str, period: int = 7):
    """Gumbel (EV-I) fit to block maxima of the daily-count series per
    group: weeks are fixed ``period``-day epoch blocks, the block
    statistic is the max daily count, and the fit is the method of
    moments -- beta = s sqrt(6)/pi, mu = mean - gamma_E beta (Euler-
    Mascheroni) -- the classical extreme-value model behind "what daily
    peak should we provision for".  Sample std uses the explicit
    (sum x^2 - (sum x)^2/n)/(n-1) form over EXACT integer maxima so a
    SQL mirror hashes identically.

    One daily-count shuffle, then per-group closed forms.  Output:
    (by, n_weeks int64, mu round-6, beta round-6); NULL fit under 2
    weeks or zero variance.
    """
    import math

    EULER = 0.5772156649015329

    def kernel(t: pa.Table) -> pa.Table:
        key = t.column(by)[0].as_py()
        day = t.column("day").to_numpy(zero_copy_only=False).astype(
            np.int64)
        x = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        week = day // period
        order = np.argsort(week, kind="stable")
        week, x = week[order], x[order]
        new = np.ones(len(week), dtype=bool)
        if len(week) > 1:
            new[1:] = week[1:] != week[:-1]
        seg = np.cumsum(new) - 1
        wmax = np.zeros(seg[-1] + 1, dtype=np.int64) if len(seg) else \
            np.zeros(0, dtype=np.int64)
        np.maximum.at(wmax, seg, x)
        nw = len(wmax)
        mu = beta = None
        if nw >= 2:
            s1 = int(wmax.sum())
            s2 = int((wmax * wmax).sum())
            var = (s2 - s1 * s1 / float(nw)) / (nw - 1)
            if var > 0:
                s = math.sqrt(var)
                beta_v = s * math.sqrt(6.0) / math.pi
                mu = round(s1 / float(nw) - EULER * beta_v, 6)
                beta = round(beta_v, 6)
        return pa.table({
            by: pa.array([key]),
            "n_weeks": pa.array([nw], pa.int64()),
            "mu": pa.array([mu], pa.float64()),
            "beta": pa.array([beta], pa.float64()),
        })

    return _daily_counts(ds, ts_col, by).groupby(by).map_groups(
        kernel, batch_format="pyarrow")


def cox_stuart_daily(ds, ts_col: str, *, by: str):
    """Cox-Stuart sign test for monotone trend per group over the
    daily-count series: pair day i with day i + ceil(m/2) (odd-length
    middle dropped), count positive/negative differences (ties
    dropped), z = (n_pos - n_neg)/sqrt(n_pos + n_neg) -- the
    assumption-free "is volume trending" screen that complements the
    Mann-Kendall census in :func:`trend_daily` at a fraction of the
    pairwise cost (m/2 comparisons, not m^2/2).

    Exact integer comparisons; one daily-count shuffle then a tiny
    per-group kernel.  Output: (by, n_days, n_pos, n_neg, z round-6;
    z NULL when n_pos + n_neg = 0).
    """
    def kernel(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        key = t.column(by)[0].as_py()
        x = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        m = len(x)
        c = (m + 1) // 2
        k = m // 2
        d = x[c:c + k] - x[:k]
        n_pos = int(np.count_nonzero(d > 0))
        n_neg = int(np.count_nonzero(d < 0))
        tot = n_pos + n_neg
        z = (round((n_pos - n_neg) / np.sqrt(tot), 6) if tot else None)
        return pa.table({
            by: pa.array([key]),
            "n_days": pa.array([m], pa.int64()),
            "n_pos": pa.array([n_pos], pa.int64()),
            "n_neg": pa.array([n_neg], pa.int64()),
            "z": pa.array([z], pa.float64()),
        })

    return _daily_counts(ds, ts_col, by).groupby(by).map_groups(
        kernel, batch_format="pyarrow")


def _daily_xy(ds, ts_col: str, *, type_col: str, type_a, type_b):
    """Zero-filled (day, x, y) spine: every observed day (any non-null
    type) with the counts of the two named types -- the shared input
    for the bivariate daily dependence audits."""
    from ray.data.aggregate import Sum

    def to_day(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(ts_col)),
                     pc.is_valid(t.column(type_col)))
        t = t.filter(ok)
        us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                     pa.int64())
        day = pc.cast(pc.floor(pc.divide(pc.cast(us, pa.float64()),
                                         86400e6)), pa.int64())
        isa = pc.cast(pc.equal(t.column(type_col), type_a), pa.int64())
        isb = pc.cast(pc.equal(t.column(type_col), type_b), pa.int64())
        return pa.table({"day": day, "x": isa, "y": isb})

    return (
        ds.select_columns([ts_col, type_col])
        .map_batches(to_day, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day").aggregate(Sum("x", alias_name="x"),
                                  Sum("y", alias_name="y"))
    )


def hoeffding_d_daily(ds, ts_col: str, *, type_col: str, type_a,
                      type_b):
    """Hoeffding's D dependence statistic between the daily counts of
    two event types (zero-filled over the observed-day spine) -- the
    classical omnibus independence test that catches non-monotone
    association Spearman/Kendall miss, predating distance correlation
    by 60 years.  With midranks R, S and the tie-weighted concordance
    counts c_i = sum_j!=i w_x w_y (w = 1 below, 1/2 at a tie):

        D1 = sum c_i (c_i - 1),  D2 = sum (R-1)(R-2)(S-1)(S-2),
        D3 = sum (R-2)(S-2) c_i,
        D  = 30 ((n-2)(n-3) D1 + D2 - 2(n-2) D3)
             / (n (n-1)(n-2)(n-3)(n-4)).

    All quarter-integer quantities are exact in binary floats, so a
    SQL cross-join mirror hashes identically.  The day spine is
    calendar-bounded; the O(n^2) kernel runs once on a single tiny
    partition.  Output one row (n int64, d round-6; NULL when n < 5).
    """
    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("n", pa.int64()), ("d", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        x = t.column("x").to_numpy(zero_copy_only=False).astype(
            np.float64)
        y = t.column("y").to_numpy(zero_copy_only=False).astype(
            np.float64)
        n = len(x)
        if n < 5:
            return pa.table({"n": pa.array([n], pa.int64()),
                             "d": pa.array([None], pa.float64())})
        lx = (x[:, None] < x[None, :])
        ex = (x[:, None] == x[None, :])
        ly = (y[:, None] < y[None, :])
        ey = (y[:, None] == y[None, :])
        wx = lx + 0.5 * ex
        wy = ly + 0.5 * ey
        np.fill_diagonal(wx, 0.0)
        np.fill_diagonal(wy, 0.0)
        r = wx.sum(axis=0) + 1.0          # midrank of x
        s = wy.sum(axis=0) + 1.0          # midrank of y
        c = (wx * wy).sum(axis=0)
        d1 = float(np.sum(c * (c - 1.0)))
        d2 = float(np.sum((r - 1.0) * (r - 2.0) * (s - 1.0) * (s - 2.0)))
        d3 = float(np.sum((r - 2.0) * (s - 2.0) * c))
        denom = (float(n) * (n - 1) * (n - 2) * (n - 3) * (n - 4))
        d = 30.0 * ((n - 2) * (n - 3) * d1 + d2 - 2.0 * (n - 2) * d3) \
            / denom
        return pa.table({"n": pa.array([n], pa.int64()),
                         "d": pa.array([round(d, 6)], pa.float64())})

    return _daily_xy(ds, ts_col, type_col=type_col, type_a=type_a,
                     type_b=type_b).repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def distance_correlation_daily(ds, ts_col: str, *, type_col: str,
                               type_a, type_b):
    """Distance correlation (Szekely-Rizzo 2007) between the daily
    counts of two event types: dCor = 0 iff independent (unlike
    Pearson), computed exactly from integer pairwise |differences| on
    the zero-filled day spine --

        dCov^2  = Sxy/n^2 - 2 sum_i ax_i ay_i / n^3 + Sx Sy / n^4

    with ax_i the row sums of |x_i - x_j| (all int64-exact), and
    dCor^2 = dCov^2 / sqrt(dVarX^2 dVarY^2).  O(n^2) on a calendar-
    bounded spine, single tiny partition.  Output one row (n int64,
    dcor round-6; NULL on degenerate variance).
    """
    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("n", pa.int64()), ("dcor", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        x = t.column("x").to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column("y").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(x)
        if n < 2:
            return pa.table({"n": pa.array([n], pa.int64()),
                             "dcor": pa.array([None], pa.float64())})
        ax = np.abs(x[:, None] - x[None, :])
        ay = np.abs(y[:, None] - y[None, :])
        rx = ax.sum(axis=1)               # int64 row sums
        ry = ay.sum(axis=1)
        sx = int(rx.sum())
        sy = int(ry.sum())
        nf = float(n)

        def dstat(m1_sum, cross_rowsum, tot_a, tot_b):
            return (m1_sum / nf ** 2
                    - 2.0 * cross_rowsum / nf ** 3
                    + float(tot_a) * tot_b / nf ** 4)

        dcov2 = dstat(float(np.sum(ax * ay)), float(np.sum(rx * ry)),
                      sx, sy)
        dvarx = dstat(float(np.sum(ax * ax)), float(np.sum(rx * rx)),
                      sx, sx)
        dvary = dstat(float(np.sum(ay * ay)), float(np.sum(ry * ry)),
                      sy, sy)
        prod = dvarx * dvary
        if prod <= 0:
            dcor = None
        else:
            dcor = round(float(np.sqrt(
                max(dcov2, 0.0) / np.sqrt(prod))), 6)
        return pa.table({"n": pa.array([n], pa.int64()),
                         "dcor": pa.array([dcor], pa.float64())})

    return _daily_xy(ds, ts_col, type_col=type_col, type_a=type_a,
                     type_b=type_b).repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def ljung_box_daily(ds, ts_col: str, *, by: str, max_lag: int = 7):
    """Ljung-Box portmanteau whiteness test per group over the daily
    count series: Q = n (n+2) sum_{h=1..m} rho_h^2 / (n-h) with rho_h
    the lag-h sample autocorrelation (row semantics over observed
    days) -- "is there ANY autocorrelation structure" in one number,
    the standard residual-whiteness gate after a seasonal fit.

    One daily-count shuffle, then a vectorized per-group kernel.
    Output: (by, n_days int64, q round-6; NULL when n <= max_lag or
    zero variance).
    """
    m = int(max_lag)

    def kernel(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        key = t.column(by)[0].as_py()
        x = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.float64)
        n = len(x)
        q = None
        if n > m:
            mu = x.sum() / n
            d = x - mu
            den = float(np.sum(d * d))
            if den > 0:
                acc = 0.0
                for h in range(1, m + 1):
                    rho = float(np.sum(d[h:] * d[:-h])) / den
                    acc += rho * rho / (n - h)
                q = round(n * (n + 2.0) * acc, 6)
        return pa.table({
            by: pa.array([key]),
            "n_days": pa.array([n], pa.int64()),
            "q": pa.array([q], pa.float64()),
        })

    return _daily_counts(ds, ts_col, by).groupby(by).map_groups(
        kernel, batch_format="pyarrow")


def von_neumann_daily(ds, ts_col: str, *, by: str):
    """Von Neumann successive-difference ratio per group over the
    daily-count series: eta = sum (x_{i+1} - x_i)^2 / sum (x - mean)^2.
    Under randomness E[eta] ~ 2; eta << 2 flags positive
    autocorrelation (trend/drift), eta >> 2 flags oscillation -- the
    oldest and cheapest "is this series actually random" screen.

    Numerator is exact int64; denominator is the exact rational
    (n sum x^2 - (sum x)^2)/n evaluated once in double.  One
    daily-count shuffle, tiny per-group kernel.  Output: (by, n_days,
    eta round-6; NULL on constant series or n < 2).
    """
    def kernel(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        key = t.column(by)[0].as_py()
        x = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(x)
        eta = None
        if n >= 2:
            num = int(np.sum(np.diff(x) ** 2))
            s1 = int(x.sum())
            s2 = int((x * x).sum())
            den = (n * s2 - s1 * s1) / float(n)
            if den > 0:
                eta = round(num / den, 6)
        return pa.table({
            by: pa.array([key]),
            "n_days": pa.array([n], pa.int64()),
            "eta": pa.array([eta], pa.float64()),
        })

    return _daily_counts(ds, ts_col, by).groupby(by).map_groups(
        kernel, batch_format="pyarrow")


def buishand_range_daily(ds, ts_col: str, *, by: str):
    """Buishand range test for a level shift per group: with partial
    sums S_k = sum_{i<=k} (x_i - mean) over the ordered daily counts,
    R = (max S - min S) / (s sqrt(n)) (s the population std) -- the
    cumulative-deviations changepoint screen that complements Pettitt
    (rank-based) with a parametric range statistic.

    One daily-count shuffle, tiny per-group kernel.  Output: (by,
    n_days, q round-6 = max|S_k|/(s sqrt n), r round-6; NULL on
    constant series).
    """
    def kernel(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        key = t.column(by)[0].as_py()
        x = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.float64)
        n = len(x)
        q = r = None
        if n >= 2:
            mean = x.sum() / n
            s_k = np.cumsum(x - mean)
            var = float(np.sum((x - mean) * (x - mean))) / n
            if var > 0:
                scale = np.sqrt(var) * np.sqrt(n)
                q = round(float(np.abs(s_k).max()) / scale, 6)
                r = round(float(s_k.max() - s_k.min()) / scale, 6)
        return pa.table({
            by: pa.array([key]),
            "n_days": pa.array([n], pa.int64()),
            "q": pa.array([q], pa.float64()),
            "r": pa.array([r], pa.float64()),
        })

    return _daily_counts(ds, ts_col, by).groupby(by).map_groups(
        kernel, batch_format="pyarrow")


def binseg_change_daily(ds, ts_col: str, *, by: str):
    """Single-changepoint binary segmentation per group: the split
    k (1 <= k < n) of the ordered daily counts maximizing the
    between-segment sum of squares cum_k^2/k + (S - cum_k)^2/(n - k)
    (equivalently minimizing total SSE), ties to the EARLIEST k -- the
    first step of the binary-segmentation changepoint family, with the
    level shift it implies.

    Objective evaluated with the same single-expression double
    arithmetic a SQL window mirror uses, over exact int64 prefix sums.
    Output: (by, n_days, split_pos int64 [days in the left segment],
    delta_mean round-6 = right mean - left mean; NULL when n < 2).
    """
    def kernel(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        key = t.column(by)[0].as_py()
        x = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(x)
        if n < 2:
            return pa.table({
                by: pa.array([key]),
                "n_days": pa.array([n], pa.int64()),
                "split_pos": pa.array([None], pa.int64()),
                "delta_mean": pa.array([None], pa.float64()),
            })
        s = int(x.sum())
        cum = np.cumsum(x)[:-1]            # k = 1..n-1
        k = np.arange(1, n, dtype=np.int64)
        obj = (cum * cum) / k.astype(np.float64) \
            + (s - cum) * (s - cum) / (n - k).astype(np.float64)
        best = int(np.argmax(obj))         # first max: earliest k
        kk = int(k[best])
        left = float(cum[best]) / kk
        right = float(s - cum[best]) / (n - kk)
        return pa.table({
            by: pa.array([key]),
            "n_days": pa.array([n], pa.int64()),
            "split_pos": pa.array([kk], pa.int64()),
            "delta_mean": pa.array([round(right - left, 6)],
                                   pa.float64()),
        })

    return _daily_counts(ds, ts_col, by).groupby(by).map_groups(
        kernel, batch_format="pyarrow")


def page_hinkley_daily(ds, ts_col: str, *, by: str):
    """Page-Hinkley drift statistics per group over the daily-count
    series: with running mean xbar_i = cum_i / i and M_t =
    sum_{i<=t} (x_i - xbar_i), PH_up = max_t (M_t - min_{s<=t} M_s)
    and PH_down = max_t (max_{s<=t} M_s - M_t) -- the classic
    streaming change detector, evaluated here in one exact pass (the
    running mean has the closed form cum/i, so nothing is
    approximated).

    One daily-count shuffle, tiny per-group kernel.  Output: (by,
    n_days, ph_up round-6, ph_down round-6).
    """
    def kernel(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        key = t.column(by)[0].as_py()
        x = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.float64)
        n = len(x)
        cum = np.cumsum(x)
        xbar = cum / np.arange(1, n + 1, dtype=np.float64)
        m = np.cumsum(x - xbar)
        runmin = np.minimum.accumulate(m)
        runmax = np.maximum.accumulate(m)
        ph_up = round(float((m - runmin).max()), 6)
        ph_down = round(float((runmax - m).max()), 6)
        return pa.table({
            by: pa.array([key]),
            "n_days": pa.array([n], pa.int64()),
            "ph_up": pa.array([ph_up], pa.float64()),
            "ph_down": pa.array([ph_down], pa.float64()),
        })

    return _daily_counts(ds, ts_col, by).groupby(by).map_groups(
        kernel, batch_format="pyarrow")


def seasonal_mk_daily(ds, ts_col: str, *, by: str, period: int = 7):
    """Seasonal Mann-Kendall trend test per group: the MK sign census
    runs WITHIN each season (epoch-day mod ``period``, i.e. day-of-week
    for 7) and the S statistics add across seasons, so weekly
    seasonality cannot masquerade as trend -- the standard fix for the
    plain MK test (trend_daily) on seasonal ops data.  Variance uses
    the exact per-season tie-corrected form sum n(n-1)(2n+5)/18 -
    sum_t t(t-1)(2t+5)/18, and z applies the +/-1 continuity
    correction.

    Exact integer S and variance numerators; one daily-count shuffle
    then a tiny per-group pairwise kernel (days are calendar-bounded).
    Output: (by, n_days, s int64, z round-6; z NULL when var = 0).
    """
    p = int(period)

    def kernel(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        key = t.column(by)[0].as_py()
        day = t.column("day").to_numpy(zero_copy_only=False).astype(
            np.int64)
        x = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        m = len(x)
        s_total = 0
        var18 = 0  # 18 * Var, exact integer
        for season in range(p):
            xs = x[day % p == season]
            ns = len(xs)
            if ns < 2:
                continue
            i, j = np.triu_indices(ns, k=1)
            s_total += int(np.sign(xs[j] - xs[i]).sum())
            var18 += ns * (ns - 1) * (2 * ns + 5)
            _, tc = np.unique(xs, return_counts=True)
            tc = tc[tc > 1]
            var18 -= int(np.sum(tc * (tc - 1) * (2 * tc + 5)))
        z = None
        if var18 > 0:
            sd = np.sqrt(var18 / 18.0)
            if s_total > 0:
                z = round((s_total - 1) / sd, 6)
            elif s_total < 0:
                z = round((s_total + 1) / sd, 6)
            else:
                z = 0.0
        return pa.table({
            by: pa.array([key]),
            "n_days": pa.array([m], pa.int64()),
            "s": pa.array([s_total], pa.int64()),
            "z": pa.array([z], pa.float64()),
        })

    return _daily_counts(ds, ts_col, by).groupby(by).map_groups(
        kernel, batch_format="pyarrow")


def turning_points_daily(ds, ts_col: str, *, by: str):
    """Turning-points randomness test per group: count interior days
    that are strict local maxima or minima of the daily-count series;
    under randomness E[T] = 2(n-2)/3 and Var[T] = (16n-29)/90, so
    z = (T - E)/sqrt(Var) -- too FEW turning points means trend or
    stickiness, too many means oscillation/over-dithering.

    Exact integer T; one daily-count shuffle, tiny per-group kernel.
    Output: (by, n_days, t int64, z round-6; NULL when n < 3).
    """
    def kernel(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        key = t.column(by)[0].as_py()
        x = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(x)
        tp = 0
        z = None
        if n >= 3:
            a, b, c = x[:-2], x[1:-1], x[2:]
            tp = int(np.count_nonzero(((b > a) & (b > c))
                                      | ((b < a) & (b < c))))
            var = (16.0 * n - 29.0) / 90.0
            if var > 0:
                z = round((tp - 2.0 * (n - 2) / 3.0) / np.sqrt(var), 6)
        return pa.table({
            by: pa.array([key]),
            "n_days": pa.array([n], pa.int64()),
            "t": pa.array([tp], pa.int64()),
            "z": pa.array([z], pa.float64()),
        })

    return _daily_counts(ds, ts_col, by).groupby(by).map_groups(
        kernel, batch_format="pyarrow")


def bartels_rank_daily(ds, ts_col: str, *, by: str):
    """Bartels rank version of the von Neumann ratio per group:
    RVN = sum (r_{i+1} - r_i)^2 / sum (r_i - (n+1)/2)^2 over the
    midranks of the daily counts -- the distribution-free randomness
    test (E[RVN] = 2 under H0; << 2 trend, >> 2 oscillation), immune
    to the heavy-tail days that distort the raw-value ratio.

    Midranks are exact half-integers, so both sums are exact in
    doubles; one daily-count shuffle, tiny per-group kernel.
    Output: (by, n_days, rvn round-6; NULL when n < 2 or constant).
    """
    def kernel(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        key = t.column(by)[0].as_py()
        x = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.float64)
        n = len(x)
        rvn = None
        if n >= 2:
            order = np.argsort(x, kind="stable")
            srt = x[order]
            new = np.ones(n, dtype=bool)
            new[1:] = srt[1:] != srt[:-1]
            rseg = np.cumsum(new) - 1
            run_len = np.bincount(rseg)
            run_first = np.flatnonzero(new) + 1
            mid_sorted = run_first[rseg] + (run_len[rseg] - 1) / 2.0
            r = np.empty(n, dtype=np.float64)
            r[order] = mid_sorted
            num = float(np.sum(np.diff(r) ** 2))
            den = float(np.sum((r - (n + 1) / 2.0) ** 2))
            if den > 0:
                rvn = round(num / den, 6)
        return pa.table({
            by: pa.array([key]),
            "n_days": pa.array([n], pa.int64()),
            "rvn": pa.array([rvn], pa.float64()),
        })

    return _daily_counts(ds, ts_col, by).groupby(by).map_groups(
        kernel, batch_format="pyarrow")


def hampel_daily(ds, ts_col: str, *, by: str, window: int = 7,
                 k: float = 3.0):
    """Hampel filter outlier census per group: a day is flagged when
    |x - median_w| > k * 1.4826 * MAD_w over the trailing ``window``
    observed days (inclusive; full windows only) -- the robust
    control chart that a single previous spike cannot blow up (unlike
    the mean/sigma Bollinger screen, which it complements).

    Window medians/MADs of integer counts are exact half-integers, so
    the flag comparisons are deterministic across engines.  One
    daily-count shuffle, tiny per-group sliding kernel.  Output: (by,
    n_days, n_windows, n_outliers) int64.
    """
    w = int(window)

    def kernel(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        key = t.column(by)[0].as_py()
        x = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.float64)
        m = len(x)
        nw = max(0, m - w + 1)
        n_out = 0
        if nw:
            win = np.lib.stride_tricks.sliding_window_view(x, w)
            med = np.median(win, axis=1)
            mad = np.median(np.abs(win - med[:, None]), axis=1)
            cur = x[w - 1:]
            flag = (mad > 0) & (np.abs(cur - med) > k * 1.4826 * mad)
            n_out = int(np.count_nonzero(flag))
        return pa.table({
            by: pa.array([key]),
            "n_days": pa.array([m], pa.int64()),
            "n_windows": pa.array([nw], pa.int64()),
            "n_outliers": pa.array([n_out], pa.int64()),
        })

    return _daily_counts(ds, ts_col, by).groupby(by).map_groups(
        kernel, batch_format="pyarrow")


def hurst_rs_daily(ds, ts_col: str, *, by: str,
                   window_sizes=(8, 16, 32)):
    """Hurst exponent via classical rescaled-range (R/S) analysis per
    group: the daily-count series splits into consecutive
    non-overlapping windows of each size w (tail dropped), each window
    contributes R/S (range of cumulative mean-deviations over its
    population std), and H is the OLS slope of ln(mean R/S) on ln(w).
    H ~ 0.5 is memoryless, H > 0.5 long-range persistent (slow ops
    drifts), H < 0.5 anti-persistent.

    One daily-count shuffle, tiny per-group kernel.  Output: (by,
    n_days, hurst round-6; NULL when fewer than 2 window sizes
    produce a valid mean R/S).
    """
    def kernel(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        key = t.column(by)[0].as_py()
        x = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.float64)
        n = len(x)
        xs, ys = [], []
        for w in window_sizes:
            m = n // w
            if m < 1:
                continue
            seg = x[:m * w].reshape(m, w)
            mu = seg.mean(axis=1, keepdims=True)
            dev = np.cumsum(seg - mu, axis=1)
            rng = dev.max(axis=1) - dev.min(axis=1)
            sd = seg.std(axis=1)
            ok = sd > 0
            if not ok.any():
                continue
            rs = float((rng[ok] / sd[ok]).mean())
            if rs > 0:
                xs.append(np.log(w))
                ys.append(np.log(rs))
        h = None
        if len(xs) >= 2:
            xa, ya = np.array(xs), np.array(ys)
            den = float(np.sum((xa - xa.mean()) ** 2))
            if den > 0:
                h = round(float(np.sum(
                    (xa - xa.mean()) * (ya - ya.mean())) / den), 6)
        return pa.table({
            by: pa.array([key]),
            "n_days": pa.array([n], pa.int64()),
            "hurst": pa.array([h], pa.float64()),
        })

    return _daily_counts(ds, ts_col, by).groupby(by).map_groups(
        kernel, batch_format="pyarrow")


def granger_lag1_daily(ds, ts_col: str, *, type_col: str, cause,
                       effect):
    """Lag-1 Granger causality on the zero-filled daily spine: does
    yesterday's ``cause`` count improve the prediction of today's
    ``effect`` count beyond the effect's own lag?  F-statistic of the
    one-restriction nested OLS comparison

        y_t ~ y_{t-1}            vs.   y_t ~ y_{t-1} + x_{t-1}

    with every moment an exact integer sum (counts), centered and
    solved in closed form -- the ops-grade "does this stream LEAD that
    one" probe behind alert routing.  Output one row (n_days int64,
    b_x round-6 [the cause's coefficient], f round-6; NULL on
    degenerate designs).
    """
    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("n_days", pa.int64()),
                            ("b_x", pa.float64()), ("f", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        t = t.sort_by([("day", "ascending")])
        x = t.column("x").to_numpy(zero_copy_only=False).astype(
            np.float64)
        y = t.column("y").to_numpy(zero_copy_only=False).astype(
            np.float64)
        n = len(x)
        if n < 5:
            return pa.table({"n_days": pa.array([n], pa.int64()),
                             "b_x": pa.array([None], pa.float64()),
                             "f": pa.array([None], pa.float64())})
        w, z1, z2 = y[1:], y[:-1], x[:-1]
        m = float(n - 1)
        s11 = float(np.sum(z1 * z1)) - float(z1.sum()) ** 2 / m
        s22 = float(np.sum(z2 * z2)) - float(z2.sum()) ** 2 / m
        s12 = float(np.sum(z1 * z2)) - float(z1.sum()) * z2.sum() / m
        s1w = float(np.sum(z1 * w)) - float(z1.sum()) * w.sum() / m
        s2w = float(np.sum(z2 * w)) - float(z2.sum()) * w.sum() / m
        sww = float(np.sum(w * w)) - float(w.sum()) ** 2 / m
        d = s11 * s22 - s12 * s12
        if d <= 0 or s11 <= 0:
            return pa.table({"n_days": pa.array([n], pa.int64()),
                             "b_x": pa.array([None], pa.float64()),
                             "f": pa.array([None], pa.float64())})
        b1 = (s22 * s1w - s12 * s2w) / d
        b2 = (s11 * s2w - s12 * s1w) / d
        sse_u = sww - (b1 * s1w + b2 * s2w)
        sse_r = sww - s1w * s1w / s11
        f = (round((sse_r - sse_u) * (m - 3.0) / sse_u, 6)
             if sse_u > 0 else None)
        return pa.table({"n_days": pa.array([n], pa.int64()),
                         "b_x": pa.array([round(b2, 6)], pa.float64()),
                         "f": pa.array([f], pa.float64())})

    return _daily_xy(ds, ts_col, type_col=type_col, type_a=cause,
                     type_b=effect).repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def transfer_entropy_daily(ds, ts_col: str, *, type_col: str, cause,
                           effect):
    """Binary transfer entropy TE(X -> Y) over the daily spine: both
    series binarize at their own median (strictly above = 1; medians
    of integer counts are exact half-integers), and

        TE = sum p(y_t, y_{t-1}, x_{t-1})
                 log2[ p(y_t | y_{t-1}, x_{t-1}) / p(y_t | y_{t-1}) ]

    from the exact integer 2x2x2 transition counts -- the
    model-free directional-information complement to the Granger
    F-test (catches nonlinear lead-lag the OLS misses).  Output one
    row (n_days int64, n_transitions int64, te round-6 bits).
    """
    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("n_days", pa.int64()),
                            ("n_transitions", pa.int64()),
                            ("te", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        t = t.sort_by([("day", "ascending")])
        x = t.column("x").to_numpy(zero_copy_only=False).astype(
            np.float64)
        y = t.column("y").to_numpy(zero_copy_only=False).astype(
            np.float64)
        n = len(x)
        if n < 2:
            return pa.table({
                "n_days": pa.array([n], pa.int64()),
                "n_transitions": pa.array([0], pa.int64()),
                "te": pa.array([None], pa.float64())})
        a = (x > np.median(x)).astype(np.int64)
        b = (y > np.median(y)).astype(np.int64)
        i = b[1:]           # y_t
        j = b[:-1]          # y_{t-1}
        k = a[:-1]          # x_{t-1}
        cell = i * 4 + j * 2 + k
        n_ijk = np.bincount(cell, minlength=8).astype(np.int64)
        big_n = int(n_ijk.sum())
        te = 0.0
        for ii in range(2):
            for jj in range(2):
                for kk in range(2):
                    c = int(n_ijk[ii * 4 + jj * 2 + kk])
                    if c == 0:
                        continue
                    n_jk = int(n_ijk[jj * 2 + kk]
                               + n_ijk[4 + jj * 2 + kk])
                    n_ij = int(n_ijk[ii * 4 + jj * 2]
                               + n_ijk[ii * 4 + jj * 2 + 1])
                    n_j = int(sum(n_ijk[z * 4 + jj * 2 + w]
                                  for z in range(2) for w in range(2)))
                    te += (c / big_n) * np.log2(
                        (c * n_j) / (float(n_jk) * n_ij))
        return pa.table({
            "n_days": pa.array([n], pa.int64()),
            "n_transitions": pa.array([big_n], pa.int64()),
            "te": pa.array([round(te, 6)], pa.float64())})

    return _daily_xy(ds, ts_col, type_col=type_col, type_a=cause,
                     type_b=effect).repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def ewma_chart_daily(ds, ts_col: str, *, by: str, lam: float = 0.2,
                     l_sigma: float = 3.0):
    """EWMA control chart per group over the daily-count series
    (Roberts 1959): z_t = lam*x_t + (1-lam)*z_{t-1} seeded at the
    series mean, with time-varying limits mu +/- L*sigma*
    sqrt(lam/(2-lam)*(1-(1-lam)^(2t))) -- the small-persistent-shift
    detector that the Shewhart/c-chart misses (it reacts to ~0.5-1
    sigma drifts in a few days).

    The recursion is evaluated with the exact double sequence a
    recursive-CTE oracle replays (one multiply-add per day), so breach
    flags are hash-stable.  Output: (by, n_days, n_breach_hi,
    n_breach_lo, last_z round-6).
    """
    def kernel(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        key = t.column(by)[0].as_py()
        x = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.float64)
        n = len(x)
        s1 = x.sum()
        mu = s1 / n
        var = float(np.sum((x - mu) * (x - mu))) / n
        sigma = np.sqrt(var)
        z = mu
        hi = lo = 0
        for t_i in range(1, n + 1):
            z = lam * x[t_i - 1] + (1.0 - lam) * z
            lim = (l_sigma * sigma
                   * np.sqrt(lam / (2.0 - lam)
                             * (1.0 - (1.0 - lam) ** (2 * t_i))))
            if z > mu + lim:
                hi += 1
            elif z < mu - lim:
                lo += 1
        return pa.table({
            by: pa.array([key]),
            "n_days": pa.array([n], pa.int64()),
            "n_breach_hi": pa.array([hi], pa.int64()),
            "n_breach_lo": pa.array([lo], pa.int64()),
            "last_z": pa.array([round(float(z), 6)], pa.float64()),
        })

    return _daily_counts(ds, ts_col, by).groupby(by).map_groups(
        kernel, batch_format="pyarrow")


def optimal_changepoints_daily(ds, ts_col: str, *, by: str,
                               penalty_factor: float = 2.0):
    """Exact optimal-partitioning changepoint segmentation per group
    (the dynamic program PELT prunes): minimize total within-segment
    SSE + penalty * n_changepoints over ALL segmentations of the daily
    count series, penalty = penalty_factor * global variance * ln(n)
    (BIC-flavored).  Returns every changepoint -- the multi-shift
    answer the single-split binseg probe (binseg_change_daily) only
    approximates.

    O(n^2) DP on the calendar-bounded series with exact integer prefix
    sums; rows-only by contract (sequential DP has no SQL mirror);
    brute-force parity pinned in unit tests.  Output: (by, n_days,
    n_changepoints int64, split_pos string 'p1,p2,...' [left-segment
    lengths], cost round-6).
    """
    def kernel(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        key = t.column(by)[0].as_py()
        x = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.float64)
        n = len(x)
        if n < 2:
            return pa.table({
                by: pa.array([key]),
                "n_days": pa.array([n], pa.int64()),
                "n_changepoints": pa.array([0], pa.int64()),
                "split_pos": pa.array([""], pa.string()),
                "cost": pa.array([0.0], pa.float64()),
            })
        c1 = np.concatenate(([0.0], np.cumsum(x)))
        c2 = np.concatenate(([0.0], np.cumsum(x * x)))

        def sse(i, j):  # segment x[i:j]
            m = j - i
            s = c1[j] - c1[i]
            return (c2[j] - c2[i]) - s * s / m

        var = float(np.var(x))
        pen = penalty_factor * var * np.log(n) if var > 0 else 1.0
        best = np.full(n + 1, np.inf)
        prev = np.zeros(n + 1, dtype=np.int64)
        best[0] = -pen
        for j in range(1, n + 1):
            for i in range(j):
                c = best[i] + sse(i, j) + pen
                if c < best[j] - 1e-12:
                    best[j] = c
                    prev[j] = i
        cps = []
        j = n
        while j > 0:
            i = int(prev[j])
            if i > 0:
                cps.append(i)
            j = i
        cps = sorted(cps)
        return pa.table({
            by: pa.array([key]),
            "n_days": pa.array([n], pa.int64()),
            "n_changepoints": pa.array([len(cps)], pa.int64()),
            "split_pos": pa.array([",".join(map(str, cps))],
                                  pa.string()),
            "cost": pa.array([round(float(best[n]), 6)], pa.float64()),
        })

    return _daily_counts(ds, ts_col, by).groupby(by).map_groups(
        kernel, batch_format="pyarrow")


def sax_motifs_daily(ds, ts_col: str, *, by: str, word_len: int = 3):
    """SAX motif census per group: the daily counts z-normalize
    against the group's own mean/std, discretize into the classic
    4-symbol alphabet (breakpoints -0.6745 / 0 / 0.6745 -- standard
    normal quartiles), and consecutive ``word_len``-day windows form
    SAX words; repeated words are the series' MOTIFS (recurring local
    shapes).  Output per group: total and repeated word counts plus
    the most frequent word (count desc, lexicographic tie-break) --
    the cheap "does this series have a recurring weekly shape"
    detector (Lin et al. 2003).

    One daily-count shuffle, tiny per-group kernel; symbol boundaries
    are evaluated on the identical doubles a SQL mirror computes.
    Output: (by, n_days, n_words, n_repeated, top_word, top_count).
    """
    w = int(word_len)
    BPS = (-0.6745, 0.0, 0.6745)
    ABC = "abcd"

    def kernel(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        key = t.column(by)[0].as_py()
        x = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.float64)
        n = len(x)
        n_words = n_rep = 0
        top_word, top_count = None, None
        if n >= w:
            mu = x.sum() / n
            var = float(np.sum((x - mu) * (x - mu))) / n
            sd = np.sqrt(var)
            if sd > 0:
                z = (x - mu) / sd
                sym = np.full(n, 0, dtype=np.int64)
                for bp in BPS:
                    sym += (z > bp).astype(np.int64)
                words = {}
                for i in range(n - w + 1):
                    word = "".join(ABC[s] for s in sym[i:i + w])
                    words[word] = words.get(word, 0) + 1
                n_words = len(words)
                n_rep = sum(1 for c in words.values() if c >= 2)
                top_word = min(words,
                               key=lambda k: (-words[k], k))
                top_count = int(words[top_word])
        return pa.table({
            by: pa.array([key]),
            "n_days": pa.array([n], pa.int64()),
            "n_words": pa.array([n_words], pa.int64()),
            "n_repeated": pa.array([n_rep], pa.int64()),
            "top_word": pa.array([top_word], pa.string()),
            "top_count": pa.array([top_count], pa.int64()),
        })

    return _daily_counts(ds, ts_col, by).groupby(by).map_groups(
        kernel, batch_format="pyarrow")


def sign_test_daily(ds, ts_col: str, *, type_col: str, type_a,
                    type_b):
    """Paired sign test on the daily spine: on each observed day,
    score +1 when ``type_a``'s count exceeds ``type_b``'s, -1 when it
    trails (ties drop), and z = (n_pos - n_neg)/sqrt(n_pos + n_neg)
    -- the median-free "which stream usually wins the day" test,
    robust to any daily-volume distribution.

    Exact integer comparisons on the shared zero-filled spine.
    Output one row (n_days, n_pos, n_neg, z round-6; z NULL when all
    days tie).
    """
    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("n_days", pa.int64()),
                            ("n_pos", pa.int64()),
                            ("n_neg", pa.int64()), ("z", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        x = t.column("x").to_numpy(zero_copy_only=False).astype(
            np.int64)
        y = t.column("y").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n_pos = int(np.count_nonzero(x > y))
        n_neg = int(np.count_nonzero(x < y))
        tot = n_pos + n_neg
        z = round((n_pos - n_neg) / np.sqrt(tot), 6) if tot else None
        return pa.table({
            "n_days": pa.array([len(x)], pa.int64()),
            "n_pos": pa.array([n_pos], pa.int64()),
            "n_neg": pa.array([n_neg], pa.int64()),
            "z": pa.array([z], pa.float64()),
        })

    return _daily_xy(ds, ts_col, type_col=type_col, type_a=type_a,
                     type_b=type_b).repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def ccc_daily(ds, ts_col: str, *, type_col: str, type_a, type_b):
    """Lin's concordance correlation between two daily count series on
    the shared spine: CCC = 2 s_xy / (s_x^2 + s_y^2 + (mean_x -
    mean_y)^2) -- Pearson r PENALIZED for scale and location offsets,
    i.e. "do these two streams AGREE", not merely co-move.  The
    mirror-stream / double-write audit statistic.

    Exact integer sums from the daily spine, one closed-form
    finalize.  Output one row (n_days, r round-6, ccc round-6; NULLs
    on degenerate variance).
    """
    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("n_days", pa.int64()), ("r", pa.float64()),
                            ("ccc", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        x = t.column("x").to_numpy(zero_copy_only=False).astype(
            np.float64)
        y = t.column("y").to_numpy(zero_copy_only=False).astype(
            np.float64)
        n = len(x)
        if n < 2:
            return pa.table({"n_days": pa.array([n], pa.int64()),
                             "r": pa.array([None], pa.float64()),
                             "ccc": pa.array([None], pa.float64())})
        mx, my = x.sum() / n, y.sum() / n
        sxx = float(np.sum((x - mx) * (x - mx))) / n
        syy = float(np.sum((y - my) * (y - my))) / n
        sxy = float(np.sum((x - mx) * (y - my))) / n
        r = (round(sxy / np.sqrt(sxx * syy), 6)
             if sxx > 0 and syy > 0 else None)
        den = sxx + syy + (mx - my) * (mx - my)
        ccc = round(2.0 * sxy / den, 6) if den > 0 else None
        return pa.table({"n_days": pa.array([n], pa.int64()),
                         "r": pa.array([r], pa.float64()),
                         "ccc": pa.array([ccc], pa.float64())})

    return _daily_xy(ds, ts_col, type_col=type_col, type_a=type_a,
                     type_b=type_b).repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def median_polish_dow_type(ds, ts_col: str, *, type_col: str,
                           n_iter: int = 10):
    """Tukey median polish of the (day-of-week x event-type) daily-
    median count matrix: iteratively sweep row and column medians out
    until the additive decomposition overall + dow-effect +
    type-effect + residual stabilizes -- the robust two-way ANOVA that
    says WHERE the volume rhythm lives (weekday rhythm vs type mix)
    and flags cells that obey neither (interaction outliers).

    The matrix is 7 x n_types of per-cell MEDIAN daily counts (exact
    half-integers), polished on the driver; rows-only by contract
    (iterative); brute-force parity pinned in unit tests.  Output:
    one row per cell (dow int64, event_type, cell round-6, fitted
    round-6, residual round-6) plus the decomposition carried on
    every row (overall round-6).
    """
    from ray.data.aggregate import Count

    def to_day(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(ts_col)),
                     pc.is_valid(t.column(type_col)))
        t = t.filter(ok)
        us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                     pa.int64())
        day = pc.cast(pc.floor(pc.divide(pc.cast(us, pa.float64()),
                                         86400e6)), pa.int64())
        return pa.table({"g": t.column(type_col), "day": day})

    daily = (ds.select_columns([ts_col, type_col])
             .map_batches(to_day, batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby(["g", "day"]).aggregate(Count(alias_name="n"))
             ).take_all()
    if not daily:
        import ray

        return ray.data.from_arrow(pa.schema(
            [("dow", pa.int64()), ("event_type", pa.string()),
             ("cell", pa.float64()), ("fitted", pa.float64()),
             ("residual", pa.float64()),
             ("overall", pa.float64())]).empty_table())
    types = sorted({r["g"] for r in daily})
    ti = {v: i for i, v in enumerate(types)}
    cells = {}
    for r in daily:
        cells.setdefault((r["day"] % 7, ti[r["g"]]),
                         []).append(r["n"])
    mat = np.zeros((7, len(types)))
    for (dow, j), vals in cells.items():
        mat[dow, j] = float(np.median(vals))
    resid = mat.copy()
    overall = 0.0
    row_eff = np.zeros(7)
    col_eff = np.zeros(len(types))
    for _ in range(n_iter):
        rm = np.median(resid, axis=1)
        row_eff += rm
        resid -= rm[:, None]
        cm_r = float(np.median(row_eff))
        overall += cm_r
        row_eff -= cm_r
        cm = np.median(resid, axis=0)
        col_eff += cm
        resid -= cm[None, :]
        cm_c = float(np.median(col_eff))
        overall += cm_c
        col_eff -= cm_c
    rows = {"dow": [], "event_type": [], "cell": [], "fitted": [],
            "residual": [], "overall": []}
    for d in range(7):
        for j, tname in enumerate(types):
            fitted = overall + row_eff[d] + col_eff[j]
            rows["dow"].append(d)
            rows["event_type"].append(tname)
            rows["cell"].append(round(mat[d, j], 6))
            rows["fitted"].append(round(fitted, 6))
            rows["residual"].append(round(float(resid[d, j]), 6))
            rows["overall"].append(round(overall, 6))
    import ray

    return ray.data.from_arrow(pa.table({
        "dow": pa.array(rows["dow"], pa.int64()),
        "event_type": pa.array(rows["event_type"], pa.string()),
        "cell": pa.array(rows["cell"], pa.float64()),
        "fitted": pa.array(rows["fitted"], pa.float64()),
        "residual": pa.array(rows["residual"], pa.float64()),
        "overall": pa.array(rows["overall"], pa.float64()),
    }))


def above_median_streak(ds, ts_col: str, *, by: str):
    """Longest streak of OBSERVED days strictly above the group's own
    daily-count median (exact half-integer median, gaps compress) --
    the "how long do hot spells last" persistence probe that the
    autocorrelation number obscures.

    One daily-count shuffle, tiny per-group kernel.  Output: (by,
    n_days, n_above, longest_streak int64).
    """
    def kernel(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        key = t.column(by)[0].as_py()
        x = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.float64)
        n = len(x)
        med = float(np.median(x))
        above = x > med
        best = cur = 0
        for a in above:
            cur = cur + 1 if a else 0
            best = max(best, cur)
        return pa.table({
            by: pa.array([key]),
            "n_days": pa.array([n], pa.int64()),
            "n_above": pa.array([int(above.sum())], pa.int64()),
            "longest_streak": pa.array([best], pa.int64()),
        })

    return _daily_counts(ds, ts_col, by).groupby(by).map_groups(
        kernel, batch_format="pyarrow")


def variogram_daily(ds, ts_col: str, *, by: str,
                    lags=(1, 2, 3, 7, 14)):
    """Madogram (first-order variogram) of the daily count series per
    group: gamma(h) = mean |x_{t+h} - x_t| over observed-day ROW lags
    -- the robust scale-of-change profile (a spiky series inflates an
    ACF's variance normalization; absolute differences don't care).
    gamma flattening by h = 7 with a dip AT 7 is the weekly-rhythm
    signature.

    Exact integer |differences|; one daily-count shuffle, tiny
    per-group kernel.  Output: (by, lag int64, n_pairs int64, gamma
    round-6), one row per lag with pairs.
    """
    ls = [int(h) for h in lags]

    def kernel(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        key = t.column(by)[0].as_py()
        x = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = len(x)
        rows = {"lag": [], "n_pairs": [], "gamma": []}
        for h in ls:
            if n <= h:
                continue
            d = np.abs(x[h:] - x[:-h])
            rows["lag"].append(h)
            rows["n_pairs"].append(len(d))
            # int/int quotient: decimal half-up ties = DuckDB round()
            rows["gamma"].append(round6_half_up(int(d.sum()) / len(d)))
        return pa.table({
            by: pa.array([key] * len(rows["lag"])),
            "lag": pa.array(rows["lag"], pa.int64()),
            "n_pairs": pa.array(rows["n_pairs"], pa.int64()),
            "gamma": pa.array(rows["gamma"], pa.float64()),
        })

    return _daily_counts(ds, ts_col, by).groupby(by).map_groups(
        kernel, batch_format="pyarrow")


def extremal_index_daily(ds, ts_col: str, *, by: str,
                         q: float = 0.9, run_gap: int = 2):
    """Runs-estimator extremal index per group: exceedances of the
    group's own q-quantile daily count decluster into runs separated
    by > ``run_gap`` observed days, and theta = n_clusters /
    n_exceedances -- theta near 1 means spikes arrive alone, small
    theta means they CLUSTER (one incident spans days), the number
    that converts a daily exceedance rate into an incident rate.

    Thresholds are exact inverted-CDF quantiles of integer counts;
    all counting exact.  Output: (by, n_days, n_exceed, n_clusters,
    theta round-6).
    """
    qn = int(round(q * 100))

    def kernel(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        key = t.column(by)[0].as_py()
        x = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = len(x)
        srt = np.sort(x)
        r = max(1, (n * qn + 99) // 100)
        thr = int(srt[r - 1])
        idx = np.flatnonzero(x > thr)
        ne = len(idx)
        if ne == 0:
            clusters = 0
            theta = None
        else:
            gaps = np.diff(idx)
            clusters = 1 + int(np.count_nonzero(gaps > run_gap))
            theta = round(clusters / ne, 6)
        return pa.table({
            by: pa.array([key]),
            "n_days": pa.array([n], pa.int64()),
            "n_exceed": pa.array([ne], pa.int64()),
            "n_clusters": pa.array([clusters], pa.int64()),
            "theta": pa.array([theta], pa.float64()),
        })

    return _daily_counts(ds, ts_col, by).groupby(by).map_groups(
        kernel, batch_format="pyarrow")


def intermittency_classes(ds, ts_col: str, *, key_col: str,
                          qty_col: str, period: int = 7):
    """Syntetos-Boylan intermittent-demand classification per SKU:
    over fixed ``period``-day epoch buckets between each key's first
    and last demand, ADI = buckets / nonzero-demand buckets and CV^2 =
    population variance / mean^2 of the nonzero bucket demand sizes;
    the (ADI <= 1.32) x (CV^2 <= 0.49) quadrants split keys into
    smooth / intermittent / erratic / lumpy -- the standard routing
    table for WHICH forecasting method each SKU gets (SES vs Croston
    vs bootstrap).

    All integer bucket sums; boundary comparisons evaluated as exact
    cross-multiplications, so the census is hash-stable.  Output:
    (class string, n_keys int64, share round-6).
    """
    from ray.data.aggregate import Sum

    def units(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.and_(pc.is_valid(t.column(key_col)),
                             pc.is_valid(t.column(ts_col))),
                     pc.is_valid(t.column(qty_col)))
        t = t.filter(ok)
        us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                     pa.int64())
        day = pc.cast(pc.floor(pc.divide(pc.cast(us, pa.float64()),
                                         86400e6)), pa.int64())
        bucket = pc.divide(day, period)
        q = pc.cast(pc.round(pc.multiply(
            pc.cast(t.column(qty_col), pa.float64()), 100.0)),
            pa.int64())
        return pa.table({"k": t.column(key_col), "b": bucket, "q": q})

    per_bucket = ds.select_columns([key_col, ts_col, qty_col]) \
        .map_batches(units, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby(["k", "b"]).aggregate(Sum("q", alias_name="q"))

    def per_key(t: pa.Table) -> pa.Table:
        t = t.sort_by([("k", "ascending"), ("b", "ascending")])
        k = t.column("k").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(
            np.int64)
        q = t.column("q").to_numpy(zero_copy_only=False).astype(
            np.int64)
        new = np.ones(len(k), dtype=bool)
        if len(k) > 1:
            new[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(k))
        counts = {"smooth": 0, "intermittent": 0, "erratic": 0,
                  "lumpy": 0}
        for s, e in zip(starts, ends):
            nz = q[s:e][q[s:e] > 0]
            nd = len(nz)
            if nd == 0:
                continue
            span = int(b[e - 1] - b[s]) + 1
            # ADI <= 1.32  <=>  span * 100 <= 132 * nd  (exact ints)
            low_adi = span * 100 <= 132 * nd
            s1 = int(nz.sum())
            s2 = int((nz * nz).sum())
            # CV^2 = (s2/nd - (s1/nd)^2) / (s1/nd)^2
            #      = (nd*s2 - s1^2) / s1^2
            # CV^2 <= 0.49  <=>  100*(nd*s2 - s1^2) <= 49*s1^2
            low_cv = 100 * (nd * s2 - s1 * s1) <= 49 * s1 * s1
            if low_adi and low_cv:
                cls = "smooth"
            elif low_adi:
                cls = "erratic"
            elif low_cv:
                cls = "intermittent"
            else:
                cls = "lumpy"
            counts[cls] += 1
        rows = [(c, n) for c, n in sorted(counts.items())]
        tot = sum(n for _, n in rows)
        return pa.table({
            "class": pa.array([r[0] for r in rows], pa.string()),
            "n_keys": pa.array([r[1] for r in rows], pa.int64()),
            "share": pa.array(
                [round6_half_up(r[1] / tot) if tot else None
                 for r in rows], pa.float64()),
        })

    return per_bucket.repartition(1).map_batches(
        per_key, batch_format="pyarrow", batch_size=None)


def spectral_entropy_daily(ds, ts_col: str, *, by: str):
    """Spectral entropy (forecastability) per group: the Shannon
    entropy of the normalized periodogram of the mean-centered daily
    counts, scaled to [0, 1] by ln(n_freqs) -- near 0 means the energy
    sits in a few frequencies (strong rhythm, forecastable), near 1
    means white noise (don't bother with a seasonal model).  The
    standard 'forecastability' feature in tsfeatures/catch22.

    rows-only by contract (FFT); planted-cycle behavior pinned in
    unit tests.  Output: (by, n_days, spectral_entropy round-6).
    """
    def kernel(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        key = t.column(by)[0].as_py()
        x = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.float64)
        n = len(x)
        se = None
        if n >= 4:
            xc = x - x.sum() / n
            spec = np.abs(np.fft.rfft(xc)[1:]) ** 2
            tot = spec.sum()
            if tot > 0 and len(spec) >= 2:
                p = spec / tot
                p = p[p > 0]
                se = round(float(-(p * np.log(p)).sum())
                           / np.log(len(spec)), 6)
        return pa.table({
            by: pa.array([key]),
            "n_days": pa.array([n], pa.int64()),
            "spectral_entropy": pa.array([se], pa.float64()),
        })

    return _daily_counts(ds, ts_col, by).groupby(by).map_groups(
        kernel, batch_format="pyarrow")


def records_daily(ds, ts_col: str, *, by: str):
    """Running-record census per group: the number of days setting a
    new all-time-high daily count (first day counts), against the
    i.i.d. expectation H_n = sum 1/k and variance H_n - sum 1/k^2 --
    too many records = growth/trend, too few = early peak then decay;
    the classic records test reads trend off ORDER STATISTICS alone.
    Strict records (ties do not count) on exact integers.

    Output: (by, n_days, n_records int64, expected round-6, z
    round-6).
    """
    def kernel(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        key = t.column(by)[0].as_py()
        x = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = len(x)
        runmax = np.maximum.accumulate(x)
        rec = 1 + int(np.count_nonzero(x[1:] > runmax[:-1])) \
            if n else 0
        k = np.arange(1, n + 1, dtype=np.float64)
        h1 = float(np.sum(1.0 / k))
        h2 = float(np.sum(1.0 / (k * k)))
        var = h1 - h2
        z = (round((rec - h1) / np.sqrt(var), 6) if var > 0 else None)
        return pa.table({
            by: pa.array([key]),
            "n_days": pa.array([n], pa.int64()),
            "n_records": pa.array([rec], pa.int64()),
            "expected": pa.array([round(h1, 6)], pa.float64()),
            "z": pa.array([z], pa.float64()),
        })

    return _daily_counts(ds, ts_col, by).groupby(by).map_groups(
        kernel, batch_format="pyarrow")


def time_reversibility_daily(ds, ts_col: str, *, by: str):
    """catch22-style time-reversibility statistic per group: trev =
    mean(d^3) / mean(d^2)^1.5 over successive differences d of the
    daily counts -- zero for reversible (e.g. Gaussian linear)
    dynamics; sharply nonzero for sawtooth ramp-up/crash-down cycles,
    a shape the variance and ACF are blind to.  Exact integer
    difference powers.

    Output: (by, n_days, trev round-6; NULL on constant series).
    """
    def kernel(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        key = t.column(by)[0].as_py()
        x = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = len(x)
        trev = None
        if n >= 3:
            d = np.diff(x)
            s2 = int((d * d).sum())
            s3 = int((d * d * d).sum())
            m = len(d)
            if s2 > 0:
                trev = round((s3 / m) / (s2 / m) ** 1.5, 6)
        return pa.table({
            by: pa.array([key]),
            "n_days": pa.array([n], pa.int64()),
            "trev": pa.array([trev], pa.float64()),
        })

    return _daily_counts(ds, ts_col, by).groupby(by).map_groups(
        kernel, batch_format="pyarrow")


def capacity_profile_daily(ds, ts_col: str, *, by: str):
    """Capacity-planning profile of the daily count series per group:
    mean, exact p95 (inverted CDF), max, the peak-to-average ratio
    max/mean, and the p95-to-mean ratio -- the numbers that size a
    fixed fleet (PAR >> 1 argues for burst capacity, p95/mean is what
    autoscaling actually tracks).  Exact integer order statistics;
    the two ratios are single divisions of exact quantities.

    Output: (by, n_days, mean round-6, p95 int64, max int64, par
    round-6, p95_ratio round-6).
    """
    def kernel(t: pa.Table) -> pa.Table:
        key = t.column(by)[0].as_py()
        x = np.sort(t.column("n").to_numpy(
            zero_copy_only=False).astype(np.int64))
        n = len(x)
        s1 = int(x.sum())
        mean = s1 / n
        r = max(1, (n * 95 + 99) // 100)
        p95 = int(x[r - 1])
        mx = int(x[-1])
        return pa.table({
            by: pa.array([key]),
            "n_days": pa.array([n], pa.int64()),
            "mean": pa.array([round(mean, 6)], pa.float64()),
            "p95": pa.array([p95], pa.int64()),
            "max": pa.array([mx], pa.int64()),
            "par": pa.array([round(mx / mean, 6)], pa.float64()),
            "p95_ratio": pa.array([round(p95 / mean, 6)],
                                  pa.float64()),
        })

    return _daily_counts(ds, ts_col, by).groupby(by).map_groups(
        kernel, batch_format="pyarrow")
