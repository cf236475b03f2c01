"""Driver-contract queries, batch 33 (see oracle.py for the contract):
the Friedman test (tie-corrected) + Kendall's W over per-user
event-type mean values — the blocked k-treatment rank test.  Merged
into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_friedman_user_value(sf_dir: str):
    """Friedman χ² (tie-corrected) + Kendall's W of per-user mean
    ``value`` across the five event types, over users exposed to ALL
    five (stages/stattests.py :: friedman_test)."""
    from ..stages.stattests import friedman_test

    return _materialize(friedman_test(
        _read(sf_dir, "events", ["user_id", "event_type", "value"]),
        subject_col="user_id", treatment_col="event_type",
        treatments=EVENT_TYPES, value_col="value"))


SQL_FRIEDMAN_USER_VALUE = """
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
  SELECT s, t,
         CAST(rank() OVER (PARTITION BY s ORDER BY d) AS BIGINT) AS rmin,
         CAST(count(*) OVER (PARTITION BY s, d) AS BIGINT) AS ties
  FROM d),
rr AS (SELECT s, t, 2 * rmin + ties - 1 AS r2 FROM r),
agg AS (SELECT t, CAST(sum(r2) AS BIGINT) AS big_r2 FROM rr GROUP BY t),
tot AS (SELECT CAST(count(DISTINCT s) AS BIGINT) AS n,
               CAST(sum(r2 * r2) AS BIGINT) AS sr4
        FROM rr),
num AS (
  SELECT CAST(sum((big_r2 - tot.n * 6) * (big_r2 - tot.n * 6))
              AS BIGINT) AS num, tot.n AS n, tot.sr4 AS sr4
  FROM agg CROSS JOIN tot GROUP BY tot.n, tot.sr4)
SELECT n AS n_subjects, 5 AS k,
       CASE WHEN sr4 - n * 180 > 0 THEN
         4 * CAST(num AS DOUBLE) / CAST(sr4 - n * 180 AS DOUBLE)
       END AS chi2,
       CASE WHEN sr4 - n * 180 > 0 THEN
         CAST(num AS DOUBLE) / (CAST(sr4 - n * 180 AS DOUBLE) * n)
       END AS w
FROM num
"""


QUERIES33: Dict[str, Callable] = {
    "friedman_user_value": q_friedman_user_value,
}

SQL33: Dict[str, str] = {
    "friedman_user_value": SQL_FRIEDMAN_USER_VALUE,
}
