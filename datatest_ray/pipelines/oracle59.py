"""Driver-contract queries, batch 59 (see oracle.py for the contract):
seasonal Mann-Kendall trend, turning-points randomness test, Bartels
rank von Neumann ratio, and the isotonic (PAVA) calibration audit.
Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict

import pyarrow.compute as pc


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


def q_seasonal_mk_events(sf_dir: str):
    """Seasonal (day-of-week) Mann-Kendall per event type
    (stages/temporal.py :: seasonal_mk_daily)."""
    from ..stages.temporal import seasonal_mk_daily

    return _materialize(seasonal_mk_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type", period=7))


SQL_SEASONAL_MK_EVENTS = _DAILY_CTE + """,
pairs AS (
  SELECT a.g,
         CAST(sum(CASE WHEN b.x > a.x THEN 1
                       WHEN b.x < a.x THEN -1 ELSE 0 END)
              AS BIGINT) AS s
  FROM daily a
  JOIN daily b ON b.g = a.g AND b.day > a.day
              AND b.day % 7 = a.day % 7
  GROUP BY a.g),
seas AS (
  SELECT g, day % 7 AS dow, CAST(count(*) AS BIGINT) AS nd
  FROM daily GROUP BY 1, 2),
base AS (
  SELECT g, CAST(sum(nd * (nd - 1) * (2 * nd + 5)) AS BIGINT) AS v
  FROM seas GROUP BY g),
tievc AS (
  SELECT g, day % 7 AS dow, x, CAST(count(*) AS BIGINT) AS t
  FROM daily GROUP BY 1, 2, 3),
ties AS (
  SELECT g, CAST(sum(CASE WHEN t > 1
                          THEN t * (t - 1) * (2 * t + 5)
                          ELSE 0 END) AS BIGINT) AS v
  FROM tievc GROUP BY g),
nd AS (SELECT g, CAST(count(*) AS BIGINT) AS n_days
       FROM daily GROUP BY g),
var18 AS (
  SELECT base.g, base.v - coalesce(ties.v, 0) AS v18
  FROM base LEFT JOIN ties ON ties.g = base.g)
SELECT nd.g AS event_type, nd.n_days,
       coalesce(pairs.s, 0) AS s,
       CASE WHEN var18.v18 > 0 THEN
         CASE WHEN coalesce(pairs.s, 0) > 0
              THEN round((pairs.s - 1) / sqrt(var18.v18 / 18.0), 6)
              WHEN coalesce(pairs.s, 0) < 0
              THEN round((pairs.s + 1) / sqrt(var18.v18 / 18.0), 6)
              ELSE 0.0 END
       END AS z
FROM nd
LEFT JOIN pairs ON pairs.g = nd.g
LEFT JOIN var18 ON var18.g = nd.g
"""


def q_turning_points_events(sf_dir: str):
    """Turning-points randomness test per event type
    (stages/temporal.py :: turning_points_daily)."""
    from ..stages.temporal import turning_points_daily

    return _materialize(turning_points_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type"))


SQL_TURNING_POINTS_EVENTS = _DAILY_CTE + """,
w AS (
  SELECT g, x,
         lag(x) OVER (PARTITION BY g ORDER BY day) AS xp,
         lead(x) OVER (PARTITION BY g ORDER BY day) AS xn
  FROM daily),
agg AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN xp IS NOT NULL AND xn IS NOT NULL
                        AND ((x > xp AND x > xn)
                             OR (x < xp AND x < xn))
                  THEN 1 ELSE 0 END) AS BIGINT) AS t
  FROM w GROUP BY g)
SELECT g AS event_type, n AS n_days, t,
       CASE WHEN n >= 3 AND (16.0 * n - 29.0) / 90.0 > 0
            THEN round((t - 2.0 * (n - 2) / 3.0)
                       / sqrt((16.0 * n - 29.0) / 90.0), 6)
       END AS z
FROM agg
"""


def q_bartels_events(sf_dir: str):
    """Bartels rank von Neumann ratio per event type
    (stages/temporal.py :: bartels_rank_daily)."""
    from ..stages.temporal import bartels_rank_daily

    return _materialize(bartels_rank_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type"))


SQL_BARTELS_EVENTS = _DAILY_CTE + """,
r AS (
  SELECT g, day,
         CAST(rank() OVER (PARTITION BY g ORDER BY x) AS BIGINT)
           + (CAST(count(*) OVER (PARTITION BY g, x) AS BIGINT) - 1)
             / 2.0 AS r,
         CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n
  FROM daily),
w AS (
  SELECT g, n, r,
         lead(r) OVER (PARTITION BY g ORDER BY day) AS r2
  FROM r),
agg AS (
  SELECT g, CAST(max(n) AS BIGINT) AS n,
         sum(CASE WHEN r2 IS NOT NULL
                  THEN (r2 - r) * (r2 - r) ELSE 0 END) AS num,
         sum((r - (n + 1) / 2.0) * (r - (n + 1) / 2.0)) AS den
  FROM w GROUP BY g)
SELECT g AS event_type, n AS n_days,
       CASE WHEN n >= 2 AND den > 0
            THEN round(num / den, 6)
       END AS rvn
FROM agg
"""


def q_isotonic_purchase(sf_dir: str):
    """Isotonic calibration of the purchase rate against the value
    score over 10 equal-width bins.  Oracle-paired: over the tiny bin
    aggregate, PAVA's L2 projection equals the minimax closed form
    iso_i = max_{j<=i} min_{l>=i} avg(pos/n over bins j..l)
    (SQL_ISOTONIC_PURCHASE) — both sides divide the SAME pooled
    integer sums, so the match is bit-exact.  PAVA parity vs a
    brute-force reference additionally pinned in tests/test_batch59.py
    (stages/mlprep.py :: isotonic_calibration)."""
    from ..stages.mlprep import isotonic_calibration

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return _materialize(isotonic_calibration(
        ev, score_col="value",
        label_expr=lambda t: pc.equal(t.column("event_type"),
                                      "purchase"),
        n_bins=10))


QUERIES59: Dict[str, Callable] = {
    "seasonal_mk_events": q_seasonal_mk_events,
    "turning_points_events": q_turning_points_events,
    "bartels_events": q_bartels_events,
    "isotonic_purchase": q_isotonic_purchase,
}


SQL_ISOTONIC_PURCHASE = """
WITH base AS MATERIALIZED (
  SELECT CAST(value AS DOUBLE) AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
b AS MATERIALIZED (SELECT min(s) AS lo, max(s) AS hi FROM base),
bins AS MATERIALIZED (
  SELECT least(CAST(floor((s - b.lo)/((b.hi - b.lo)/10.0)) AS BIGINT), 9)
           AS bin, y
  FROM base, b WHERE b.hi > b.lo),
agg AS MATERIALIZED (
  SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
  FROM bins GROUP BY 1),
ord_ AS MATERIALIZED (
  SELECT bin, n, pos,
         row_number() OVER (ORDER BY bin) AS i,
         sum(n) OVER (ORDER BY bin) AS cn,
         sum(pos) OVER (ORDER BY bin) AS cp
  FROM agg),
seg AS MATERIALIZED (
  SELECT j.i AS j, l.i AS l,
         (l.cp - j.cp + j.pos) AS p, (l.cn - j.cn + j.n) AS nn
  FROM ord_ j JOIN ord_ l ON l.i >= j.i),
mn AS MATERIALIZED (
  SELECT s.j, i.i AS i, min(s.p * 1.0 / s.nn) AS m
  FROM seg s JOIN ord_ i ON s.l >= i.i AND s.j <= i.i
  GROUP BY 1, 2),
iso AS MATERIALIZED (SELECT i, max(m) AS iso FROM mn GROUP BY 1)
SELECT o.bin, o.n, o.pos,
       round(o.pos * 1.0 / o.n, 6) AS raw_rate,
       round(iso.iso, 6) AS iso_rate
FROM ord_ o JOIN iso ON iso.i = o.i ORDER BY o.bin
"""


def _sql59() -> Dict[str, str]:
    return {
        "seasonal_mk_events": SQL_SEASONAL_MK_EVENTS,
        "turning_points_events": SQL_TURNING_POINTS_EVENTS,
        "bartels_events": SQL_BARTELS_EVENTS,
        "isotonic_purchase": SQL_ISOTONIC_PURCHASE,
    }
