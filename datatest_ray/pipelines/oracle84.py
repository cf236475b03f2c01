"""Driver-contract queries, batch 84 (see oracle.py for the contract):
madogram/variogram of the daily series and weekly top-k leaderboard
turnover.  Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict

import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_variogram_events(sf_dir: str):
    """Madogram gamma(h) at row lags 1/2/3/7/14 per event type
    (stages/temporal.py :: variogram_daily)."""
    from ..stages.temporal import variogram_daily

    return _materialize(variogram_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type"))


SQL_VARIOGRAM_EVENTS = """
WITH f AS (
  SELECT event_type AS g,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL),
daily AS (
  SELECT g, day, CAST(count(*) AS BIGINT) AS x
  FROM f GROUP BY 1, 2),
numbered AS (
  SELECT g, x,
         CAST(row_number() OVER (PARTITION BY g ORDER BY day)
              AS BIGINT) AS rn
  FROM daily),
lags AS (SELECT unnest([1, 2, 3, 7, 14]) AS h),
pairs AS (
  SELECT a.g, l.h, abs(b.x - a.x) AS d
  FROM numbered a
  JOIN lags l ON true
  JOIN numbered b ON b.g = a.g AND b.rn = a.rn + l.h)
SELECT g AS event_type, CAST(h AS BIGINT) AS lag,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(CAST(sum(d) AS BIGINT) / CAST(count(*) AS DOUBLE), 6)
         AS gamma
FROM pairs GROUP BY g, h
"""


def q_topk_turnover_parts(sf_dir: str):
    """Week-over-week Jaccard of the top-5 revenue parts
    (stages/relational.py :: topk_turnover)."""
    from ray.data.aggregate import Sum

    from ..stages.relational import topk_turnover

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount",
                "l_shipdate"])

    def units(t: pa.Table) -> pa.Table:
        ok = pc.is_valid(t.column("l_shipdate"))
        for c in ("l_partkey", "l_extendedprice", "l_discount"):
            ok = pc.and_(ok, pc.is_valid(t.column(c)))
        t = t.filter(ok)
        us = pc.cast(pc.cast(t.column("l_shipdate"),
                             pa.timestamp("us")), pa.int64())
        day = pc.cast(pc.floor(pc.divide(pc.cast(us, pa.float64()),
                                         86400e6)), pa.int64())
        week = pc.divide(day, 7)
        rev = pc.cast(pc.round(pc.multiply(pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount"))),
            100.0)), pa.int64())
        return pa.table({"week": week, "l_partkey": t.column("l_partkey"),
                         "rev": rev})

    agg = li.map_batches(
        units, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(["week", "l_partkey"]).aggregate(
        Sum("rev", alias_name="rev"))
    return _materialize(topk_turnover(
        agg, period_col="week", key_col="l_partkey",
        score_col="rev", k=5))


SQL_TOPK_TURNOVER_PARTS = """
WITH f AS (
  SELECT CAST(floor(epoch(l_shipdate) / 86400) AS BIGINT) // 7
           AS week,
         l_partkey,
         CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
              AS BIGINT) AS rev
  FROM lineitem
  WHERE l_shipdate IS NOT NULL AND l_partkey IS NOT NULL
    AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL),
agg AS (
  SELECT week, l_partkey, CAST(sum(rev) AS BIGINT) AS rev
  FROM f GROUP BY 1, 2),
rk AS (
  SELECT week, l_partkey,
         row_number() OVER (PARTITION BY week
                            ORDER BY rev DESC, l_partkey) AS r
  FROM agg),
top AS (SELECT week, l_partkey FROM rk WHERE r <= 5),
weeks AS (SELECT DISTINCT week FROM top),
pairs AS (
  SELECT w.week AS pa_, lead(w.week) OVER (ORDER BY w.week) AS pb_
  FROM weeks w),
cons AS (SELECT pa_, pb_ FROM pairs WHERE pb_ IS NOT NULL),
inter AS (
  SELECT c.pa_, c.pb_,
         CAST(count(b.l_partkey) AS BIGINT) AS n_common
  FROM cons c
  LEFT JOIN top a ON a.week = c.pa_
  LEFT JOIN top b ON b.week = c.pb_ AND b.l_partkey = a.l_partkey
  GROUP BY c.pa_, c.pb_),
sizes AS (
  SELECT c.pa_, c.pb_,
         (SELECT count(*) FROM top WHERE week = c.pa_) AS na,
         (SELECT count(*) FROM top WHERE week = c.pb_) AS nb
  FROM cons c)
SELECT i.pa_ AS period_a, i.pb_ AS period_b,
       CAST(coalesce(i.n_common, 0) AS BIGINT) AS n_common,
       round(CAST(coalesce(i.n_common, 0) AS DOUBLE)
             / (s.na + s.nb - coalesce(i.n_common, 0)), 6) AS jaccard
FROM inter i JOIN sizes s ON s.pa_ = i.pa_ AND s.pb_ = i.pb_
"""


QUERIES84: Dict[str, Callable] = {
    "variogram_events": q_variogram_events,
    "topk_turnover_parts": q_topk_turnover_parts,
}

SQL84: Dict[str, str] = {
    "variogram_events": SQL_VARIOGRAM_EVENTS,
    "topk_turnover_parts": SQL_TOPK_TURNOVER_PARTS,
}
