"""Driver-contract queries, batch 68 (see oracle.py for the contract):
EWMA control chart under a recursive-CTE oracle and the two-group
log-rank survival test.  Merged into ``oracle.queries()`` /
``oracle.oracle_sql()``."""

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


def q_ewma_chart_events(sf_dir: str):
    """EWMA (lam=0.2, 3-sigma) control-chart breach census per event
    type (stages/temporal.py :: ewma_chart_daily)."""
    from ..stages.temporal import ewma_chart_daily

    return _materialize(ewma_chart_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type", lam=0.2, l_sigma=3.0))


SQL_EWMA_CHART_EVENTS = """
WITH RECURSIVE f AS (
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
stats AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS DOUBLE) / count(*) AS mu
  FROM numbered GROUP BY g),
sig AS (
  SELECT nb.g,
         sqrt(sum((nb.x - st.mu) * (nb.x - st.mu)) / st.n) AS sigma
  FROM numbered nb JOIN stats st ON st.g = nb.g
  GROUP BY nb.g, st.n),
rec(g, rn, z) AS (
  SELECT g, CAST(0 AS BIGINT), mu FROM stats
  UNION ALL
  SELECT r.g, r.rn + 1,
         0.2 * CAST(n.x AS DOUBLE) + 0.8 * r.z
  FROM rec r JOIN numbered n ON n.g = r.g AND n.rn = r.rn + 1),
lim AS (
  SELECT r.g, r.rn, r.z, st.mu,
         3.0 * sig.sigma
           * sqrt(0.2 / 1.8 * (1.0 - power(0.8, 2 * r.rn))) AS lim
  FROM rec r
  JOIN stats st ON st.g = r.g
  JOIN sig ON sig.g = r.g
  WHERE r.rn >= 1),
agg AS (
  SELECT g,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(CASE WHEN z > mu + lim THEN 1 ELSE 0 END)
              AS BIGINT) AS n_breach_hi,
         CAST(sum(CASE WHEN z < mu - lim THEN 1 ELSE 0 END)
              AS BIGINT) AS n_breach_lo,
         max(CASE WHEN rn = (SELECT max(rn) FROM lim l2
                             WHERE l2.g = lim.g)
                  THEN z END) AS last_z
  FROM lim GROUP BY g)
SELECT g AS event_type, n_days, n_breach_hi, n_breach_lo,
       round(last_z, 6) AS last_z
FROM agg
"""


def q_logrank_users(sf_dir: str):
    """Log-rank test: do even-keyed and odd-keyed users share the same
    lifetime (last minus first active day) survival curve?
    (stages/stattests.py :: logrank_test)."""
    from ..stages.stattests import logrank_test

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    return _materialize(logrank_test(
        ev, id_col="user_id", ts_col="ts",
        group_expr=lambda t: pc.equal(
            pc.bit_wise_and(t.column("user_id"), 1), 0)))


SQL_LOGRANK_USERS = """
WITH f AS (
  SELECT user_id AS k,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
pk AS (
  SELECT k, CAST(max(day) - min(day) AS BIGINT) AS dur,
         CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END AS g1
  FROM f GROUP BY k),
tot AS (SELECT CAST(count(*) AS BIGINT) AS total,
               CAST(sum(g1) AS BIGINT) AS n1 FROM pk),
census AS (
  SELECT dur, CAST(count(*) AS BIGINT) AS d,
         CAST(sum(g1) AS BIGINT) AS d1
  FROM pk GROUP BY dur),
w AS (
  SELECT dur, d, d1,
         tot.total - CAST(coalesce(
           sum(d) OVER (ORDER BY dur
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS BIGINT) AS n_t,
         tot.n1 - CAST(coalesce(
           sum(d1) OVER (ORDER BY dur
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS BIGINT) AS n1_t
  FROM census, tot),
agg AS (
  SELECT CAST(sum(d1) AS BIGINT) AS o1,
         sum(d * (CAST(n1_t AS DOUBLE) / n_t)) AS e1,
         sum(CASE WHEN n_t > 1
                  THEN d * (CAST(n1_t AS DOUBLE) / n_t)
                       * (1.0 - CAST(n1_t AS DOUBLE) / n_t)
                       * (n_t - d) / (n_t - 1.0)
                  ELSE 0 END) AS v
  FROM w)
SELECT tot.n1, tot.total - tot.n1 AS n2, agg.o1,
       round(agg.e1, 6) AS e1,
       CASE WHEN agg.v > 0
            THEN round((agg.o1 - agg.e1) / sqrt(agg.v), 6)
       END AS z
FROM tot, agg
"""


QUERIES68: Dict[str, Callable] = {
    "ewma_chart_events": q_ewma_chart_events,
    "logrank_users": q_logrank_users,
}

SQL68: Dict[str, str] = {
    "ewma_chart_events": SQL_EWMA_CHART_EVENTS,
    "logrank_users": SQL_LOGRANK_USERS,
}
