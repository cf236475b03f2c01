"""Driver-contract queries, batch 92 (see oracle.py for the contract):
running-record census and the time-reversibility statistic over daily
counts.  Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


_DAILY_CTE = """
WITH f AS (
  SELECT event_type AS g,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL),
daily AS (
  SELECT g, day, CAST(count(*) AS BIGINT) AS x
  FROM f GROUP BY 1, 2)
"""


def q_records_events(sf_dir: str):
    """New-all-time-high day census vs the iid expectation
    (stages/temporal.py :: records_daily)."""
    from ..stages.temporal import records_daily

    return _materialize(records_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type"))


SQL_RECORDS_EVENTS = _DAILY_CTE + """,
w AS (
  SELECT g, day, x,
         CAST(max(x) OVER (PARTITION BY g ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS BIGINT) AS prev_max,
         CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n
  FROM daily),
rec AS (
  SELECT g, max(n) AS n,
         CAST(sum(CASE WHEN prev_max IS NULL OR x > prev_max
                  THEN 1 ELSE 0 END) AS BIGINT) AS r
  FROM w GROUP BY g),
harm AS (
  SELECT rec.g,
         sum(1.0 / ks.k) AS h1,
         sum(1.0 / (CAST(ks.k AS DOUBLE) * ks.k)) AS h2
  FROM rec JOIN (SELECT unnest(range(1, 100000)) AS k) ks
    ON ks.k <= rec.n
  GROUP BY rec.g)
SELECT rec.g AS event_type, rec.n AS n_days, rec.r AS n_records,
       round(harm.h1, 6) AS expected,
       CASE WHEN harm.h1 - harm.h2 > 0
            THEN round((rec.r - harm.h1)
                       / sqrt(harm.h1 - harm.h2), 6)
       END AS z
FROM rec JOIN harm ON harm.g = rec.g
"""


def q_time_reversibility_events(sf_dir: str):
    """trev statistic of the daily series per event type
    (stages/temporal.py :: time_reversibility_daily)."""
    from ..stages.temporal import time_reversibility_daily

    return _materialize(time_reversibility_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type"))


SQL_TIME_REVERSIBILITY_EVENTS = _DAILY_CTE + """,
d AS (
  SELECT g,
         lead(x) OVER (PARTITION BY g ORDER BY day) - x AS dd,
         CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n
  FROM daily),
s AS (
  SELECT g, max(n) AS n,
         CAST(sum(dd * dd) AS BIGINT) AS s2,
         CAST(sum(dd * dd * dd) AS BIGINT) AS s3,
         CAST(count(dd) AS BIGINT) AS m
  FROM d GROUP BY g)
SELECT g AS event_type, n AS n_days,
       CASE WHEN n >= 3 AND s2 > 0
            THEN round((CAST(s3 AS DOUBLE) / m)
                       / power(CAST(s2 AS DOUBLE) / m, 1.5), 6)
       END AS trev
FROM s
"""


QUERIES92: Dict[str, Callable] = {
    "records_events": q_records_events,
    "time_reversibility_events": q_time_reversibility_events,
}

SQL92: Dict[str, str] = {
    "records_events": SQL_RECORDS_EVENTS,
    "time_reversibility_events": SQL_TIME_REVERSIBILITY_EVENTS,
}
