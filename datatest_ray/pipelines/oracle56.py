"""Driver-contract queries, batch 56 (see oracle.py for the contract):
Hoeffding's D, distance correlation and Ljung-Box whiteness over the
daily event series, and the Quade range-weighted blocked-rank test.
Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


_DAILY_XY_CTE = """
WITH f AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ib
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL),
d AS (SELECT day, CAST(sum(ia) AS BIGINT) AS x,
             CAST(sum(ib) AS BIGINT) AS y
      FROM f GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d)
"""


def q_hoeffding_d_daily(sf_dir: str):
    """Hoeffding's D between daily click and purchase counts
    (stages/temporal.py :: hoeffding_d_daily)."""
    from ..stages.temporal import hoeffding_d_daily

    return _materialize(hoeffding_d_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", type_col="event_type", type_a="click", type_b="purchase"))


SQL_HOEFFDING_D_DAILY = _DAILY_XY_CTE + """,
p AS (
  SELECT a.day,
         sum(CASE WHEN b.x < a.x THEN 1.0
                  WHEN b.x = a.x THEN 0.5 ELSE 0.0 END) AS wx,
         sum(CASE WHEN b.y < a.y THEN 1.0
                  WHEN b.y = a.y THEN 0.5 ELSE 0.0 END) AS wy,
         sum((CASE WHEN b.x < a.x THEN 1.0
                   WHEN b.x = a.x THEN 0.5 ELSE 0.0 END)
             * (CASE WHEN b.y < a.y THEN 1.0
                     WHEN b.y = a.y THEN 0.5 ELSE 0.0 END)) AS c
  FROM d a JOIN d b ON b.day <> a.day
  GROUP BY a.day),
m AS (
  SELECT sum(c * (c - 1.0)) AS d1,
         sum(wx * (wx - 1.0) * wy * (wy - 1.0)) AS d2,
         sum((wx - 1.0) * (wy - 1.0) * c) AS d3
  FROM p)
SELECT tot.n AS n,
       CASE WHEN tot.n >= 5
            THEN round(30.0 * ((tot.n - 2) * (tot.n - 3) * m.d1 + m.d2
                               - 2.0 * (tot.n - 2) * m.d3)
                       / (CAST(tot.n AS DOUBLE) * (tot.n - 1)
                          * (tot.n - 2) * (tot.n - 3) * (tot.n - 4)), 6)
       END AS d
FROM tot, m
"""


def q_dcor_daily(sf_dir: str):
    """Distance correlation between daily click and purchase counts
    (stages/temporal.py :: distance_correlation_daily)."""
    from ..stages.temporal import distance_correlation_daily

    return _materialize(distance_correlation_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", type_col="event_type", type_a="click", type_b="purchase"))


SQL_DCOR_DAILY = _DAILY_XY_CTE + """,
rows_ AS (
  SELECT a.day,
         CAST(sum(abs(a.x - b.x)) AS BIGINT) AS rx,
         CAST(sum(abs(a.y - b.y)) AS BIGINT) AS ry
  FROM d a CROSS JOIN d b GROUP BY a.day),
m2 AS (
  SELECT CAST(sum(abs(a.x - b.x) * abs(a.y - b.y)) AS BIGINT) AS sxy,
         CAST(sum(abs(a.x - b.x) * abs(a.x - b.x)) AS BIGINT) AS sxx,
         CAST(sum(abs(a.y - b.y) * abs(a.y - b.y)) AS BIGINT) AS syy
  FROM d a CROSS JOIN d b),
m3 AS (
  SELECT CAST(sum(rx * ry) AS BIGINT) AS crxy,
         CAST(sum(rx * rx) AS BIGINT) AS crxx,
         CAST(sum(ry * ry) AS BIGINT) AS cryy,
         CAST(sum(rx) AS BIGINT) AS sx,
         CAST(sum(ry) AS BIGINT) AS sy
  FROM rows_),
st AS (
  SELECT tot.n AS n,
         CAST(m2.sxy AS DOUBLE) / (CAST(tot.n AS DOUBLE) * tot.n)
           - 2.0 * m3.crxy
             / (CAST(tot.n AS DOUBLE) * tot.n * tot.n)
           + CAST(m3.sx AS DOUBLE) * m3.sy
             / (CAST(tot.n AS DOUBLE) * tot.n * tot.n * tot.n) AS dcov2,
         CAST(m2.sxx AS DOUBLE) / (CAST(tot.n AS DOUBLE) * tot.n)
           - 2.0 * m3.crxx
             / (CAST(tot.n AS DOUBLE) * tot.n * tot.n)
           + CAST(m3.sx AS DOUBLE) * m3.sx
             / (CAST(tot.n AS DOUBLE) * tot.n * tot.n * tot.n) AS vx,
         CAST(m2.syy AS DOUBLE) / (CAST(tot.n AS DOUBLE) * tot.n)
           - 2.0 * m3.cryy
             / (CAST(tot.n AS DOUBLE) * tot.n * tot.n)
           + CAST(m3.sy AS DOUBLE) * m3.sy
             / (CAST(tot.n AS DOUBLE) * tot.n * tot.n * tot.n) AS vy
  FROM tot, m2, m3)
SELECT n,
       CASE WHEN n >= 2 AND vx * vy > 0
            THEN round(sqrt(greatest(dcov2, 0.0) / sqrt(vx * vy)), 6)
       END AS dcor
FROM st
"""


def q_ljung_box_events(sf_dir: str):
    """Ljung-Box Q (lags 1..7) per event type over daily counts
    (stages/temporal.py :: ljung_box_daily)."""
    from ..stages.temporal import ljung_box_daily

    return _materialize(ljung_box_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type", max_lag=7))


SQL_LJUNG_BOX_EVENTS = """
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
mu AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS DOUBLE) / count(*) AS mu
  FROM numbered GROUP BY g),
den AS (
  SELECT nb.g, sum((nb.x - mu.mu) * (nb.x - mu.mu)) AS den
  FROM numbered nb JOIN mu ON mu.g = nb.g GROUP BY nb.g),
lags AS (SELECT unnest(range(1, 8)) AS h),
num AS (
  SELECT a.g, l.h,
         sum((a.x - mu.mu) * (b.x - mu.mu)) AS num
  FROM numbered a
  JOIN lags l ON true
  JOIN numbered b ON b.g = a.g AND b.rn = a.rn - l.h
  JOIN mu ON mu.g = a.g
  GROUP BY a.g, l.h),
q AS (
  SELECT num.g,
         sum((num.num / den.den) * (num.num / den.den)
             / (mu.n - num.h)) AS acc
  FROM num
  JOIN den ON den.g = num.g
  JOIN mu ON mu.g = num.g
  WHERE den.den > 0 AND mu.n > 7
  GROUP BY num.g)
SELECT mu.g AS event_type, mu.n AS n_days,
       CASE WHEN mu.n > 7 AND den.den > 0
            THEN round(mu.n * (mu.n + 2.0) * q.acc, 6)
       END AS q
FROM mu
JOIN den ON den.g = mu.g
LEFT JOIN q ON q.g = mu.g
"""


def q_quade_user_value(sf_dir: str):
    """Quade range-weighted blocked-rank F over per-user mean value
    across the five event types (stages/stattests.py :: quade_test)."""
    from ..stages.stattests import quade_test

    return _materialize(quade_test(
        _read(sf_dir, "events", ["user_id", "event_type", "value"]),
        subject_col="user_id", treatment_col="event_type",
        treatments=EVENT_TYPES, value_col="value"))


SQL_QUADE_USER_VALUE = """
WITH m AS (
  SELECT user_id AS s, event_type AS t,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sc,
         CAST(count(*) AS BIGINT) AS c
  FROM events
  WHERE user_id IS NOT NULL AND value IS NOT NULL
    AND event_type IN ('click', 'view', 'purchase', 'signup', 'error')
  GROUP BY 1, 2),
full_s AS (SELECT s FROM m GROUP BY s HAVING count(*) = 5),
d AS (
  SELECT m.s, m.t, CAST(sc AS DOUBLE) / c AS d
  FROM m JOIN full_s USING (s)),
r AS (
  SELECT s, t, d,
         CAST(rank() OVER (PARTITION BY s ORDER BY d) AS BIGINT)
           AS rmin,
         CAST(count(*) OVER (PARTITION BY s, d) AS BIGINT) AS ties,
         max(d) OVER (PARTITION BY s)
           - min(d) OVER (PARTITION BY s) AS rng
  FROM d),
rr AS (SELECT s, t, (2 * rmin + ties - 1) / 2.0 AS rij, rng FROM r),
blocks AS (SELECT DISTINCT s, rng FROM rr),
qb AS (
  SELECT s,
         rank() OVER (ORDER BY rng)
           + (count(*) OVER (PARTITION BY rng) - 1) / 2.0 AS q
  FROM blocks),
sij AS (
  SELECT rr.t, qb.q * (rr.rij - 3.0) AS sij
  FROM rr JOIN qb USING (s)),
a AS (SELECT sum(sij * sij) AS a FROM sij),
b AS (SELECT sum(sj * sj) AS bsum
      FROM (SELECT t, sum(sij) AS sj FROM sij GROUP BY t)),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM blocks)
SELECT tot.n AS n_subjects,
       CASE WHEN tot.n >= 2 AND a.a > b.bsum / tot.n
            THEN round((tot.n - 1) * (b.bsum / tot.n)
                       / (a.a - b.bsum / tot.n), 6)
       END AS quade_f
FROM tot, a, b
"""


QUERIES56: Dict[str, Callable] = {
    "hoeffding_d_daily": q_hoeffding_d_daily,
    "dcor_daily": q_dcor_daily,
    "ljung_box_events": q_ljung_box_events,
    "quade_user_value": q_quade_user_value,
}

SQL56: Dict[str, str] = {
    "hoeffding_d_daily": SQL_HOEFFDING_D_DAILY,
    "dcor_daily": SQL_DCOR_DAILY,
    "ljung_box_events": SQL_LJUNG_BOX_EVENTS,
    "quade_user_value": SQL_QUADE_USER_VALUE,
}
