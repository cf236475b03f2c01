"""Driver-contract queries, batch 21 (see oracle.py for the contract):
heavy-tail and mix-shift audits — the Hill tail-index estimator over
the event-value distribution (is the tail power-law-heavy enough to
break mean-based SLOs?) and a per-day event-type-mix chi-square
against the global mix (which days' traffic composition shifted).
Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


# ---------------------------------------------------------------------------
# Hill tail-index estimator (top-k order statistics)
# ---------------------------------------------------------------------------


def q_hill_tail_value(sf_dir: str):
    """Hill estimator of the tail index alpha over the top-100 event
    values: alpha = 1 / mean(ln(x_i / x_(k+1))) — the heavy-tail audit
    behind "can I trust a mean-based SLO on this metric".  The top-101
    order statistics come from the combiner-backed grouped_topk (each
    block ships at most k+1 rows); the statistic itself only depends on
    the top-(k+1) VALUE multiset, so order-statistic ties cannot make
    it nondeterministic."""
    from ..stages.window import grouped_topk

    ev = _read(sf_dir, "events", ["event_id", "value"])

    def positive(t: pa.Table) -> pa.Table:
        m = pc.fill_null(pc.greater(t.column("value"), 0.0), False)
        t = t.filter(m)
        return t.append_column(
            "g", pa.array(np.zeros(t.num_rows, dtype=np.int64)))

    top = _materialize(grouped_topk(
        ev.map_batches(positive, batch_format="pyarrow",
                       zero_copy_batch=True),
        by="g", order_col="value", k=101, tie_col="event_id"))
    v = np.sort(top.column("value").to_numpy(zero_copy_only=False))[::-1]
    k = min(100, len(v) - 1)
    if k < 1:
        return pa.table({"k": pa.array([0], pa.int64()),
                         "hill": pa.array([None], pa.float64())})
    hill = 1.0 / np.mean(np.log(v[:k] / v[k]))
    return pa.table({
        "k": pa.array([k], pa.int64()),
        "hill": pa.array([round(float(hill), 6)], pa.float64()),
    })


SQL_HILL_TAIL_VALUE = """
WITH pos AS (SELECT value FROM events WHERE value IS NOT NULL AND value > 0),
topk AS (SELECT value, row_number() OVER (ORDER BY value DESC) AS rk
         FROM pos QUALIFY rk <= 101)
SELECT CAST(count(*) AS BIGINT) AS k,
       round(1.0 / avg(ln(value / (SELECT min(value) FROM topk))), 6)
         AS hill
FROM topk WHERE rk <= 100
"""


# ---------------------------------------------------------------------------
# Per-day event-type mix chi-square vs the global mix
# ---------------------------------------------------------------------------


def q_mix_chisq_daily(sf_dir: str):
    """(day, nd, chi2): each day's event-type composition tested
    against the corpus-wide mix — the change-of-mix monitor that flags
    days whose traffic composition (not volume) shifted.  One
    (day, type) count shuffle with per-batch combiners; the chi-square
    arithmetic runs on the collected (days x types) contingency table,
    which is bounded by the calendar, not the data."""
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t.column("ts")),
                             pc.is_valid(t.column("event_type"))))
        ts_us = pc.cast(
            pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64())
        day = pc.cast(pc.floor(pc.divide(
            pc.cast(ts_us, pa.float64()), 86400000000.0)), pa.int64())
        g = pa.table({"day": day, "et": t.column("event_type")})
        agg = g.group_by(["day", "et"]).aggregate([([], "count_all")])
        return pa.table({
            "day": agg.column("day"),
            "et": agg.column("et"),
            "n": agg.column("count_all").cast(pa.int64()),
        })

    cells = _materialize(
        ev.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(["day", "et"]).aggregate(Sum("n", alias_name="n")))

    day = cells.column("day").to_numpy(zero_copy_only=False)
    et = cells.column("et").to_numpy(zero_copy_only=False)
    n = cells.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    days, di = np.unique(day, return_inverse=True)
    types, ti = np.unique(et, return_inverse=True)
    nd = np.bincount(di, weights=n)
    nt = np.bincount(ti, weights=n)
    N = n.sum()
    e = nd[di] * nt[ti] / N
    chi_cell = (n - e) ** 2 / e
    chi2 = np.bincount(di, weights=chi_cell, minlength=len(days))
    return pa.table({
        "day": pa.array(days.astype(np.int64)),
        "nd": pa.array(nd.astype(np.int64)),
        "chi2": pa.array(np.round(chi2, 4)),
    })


SQL_MIX_CHISQ_DAILY = """
WITH d AS (
  SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day,
         event_type AS et, count(*) AS n
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2),
tot AS (SELECT et, sum(n) AS nt FROM d GROUP BY et),
g AS (SELECT sum(n) AS N FROM d),
dd AS (SELECT day, sum(n) AS nd FROM d GROUP BY day)
SELECT d.day, CAST(any_value(dd.nd) AS BIGINT) AS nd,
       round(sum(pow(d.n - dd.nd * tot.nt / g.N, 2)
                 / (dd.nd * tot.nt / g.N)), 4) AS chi2
FROM d JOIN tot USING (et) JOIN dd USING (day) CROSS JOIN g
GROUP BY d.day
"""


QUERIES21: Dict[str, Callable] = {
    "hill_tail_value": q_hill_tail_value,
    "mix_chisq_daily": q_mix_chisq_daily,
}

SQL21: Dict[str, str] = {
    "hill_tail_value": SQL_HILL_TAIL_VALUE,
    "mix_chisq_daily": SQL_MIX_CHISQ_DAILY,
}
