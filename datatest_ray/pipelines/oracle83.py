"""Driver-contract queries, batch 83 (see oracle.py for the contract):
first-passage time to a cumulative spend threshold and the longest
above-median daily streak.  Merged into ``oracle.queries()`` /
``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_first_passage_users(sf_dir: str):
    """Events until a user's cumulative value first reaches 1000.00
    (stages/winfunc.py :: first_passage)."""
    from ..stages.winfunc import first_passage

    ev = _read(sf_dir, "events", ["user_id", "ts", "value", "event_id"])
    return _materialize(first_passage(
        ev, by="user_id", ts_col="ts", value_col="value",
        id_col="event_id", threshold=1000.0))


SQL_FIRST_PASSAGE_USERS = """
WITH f AS (
  SELECT user_id AS u, ts, event_id AS id,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND value IS NOT NULL),
w AS (
  SELECT u,
         CAST(sum(c) OVER (PARTITION BY u ORDER BY ts, id)
              AS BIGINT) AS cum,
         CAST(row_number() OVER (PARTITION BY u ORDER BY ts, id)
              AS BIGINT) AS rn
  FROM f),
cross_ AS (
  SELECT u, CAST(min(rn) AS BIGINT) AS k
  FROM w WHERE cum >= 100000 GROUP BY u),
keys_ AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS n_keys FROM f),
ord_ AS (
  SELECT k, CAST(row_number() OVER (ORDER BY k) AS BIGINT) AS rn,
         CAST(count(*) OVER () AS BIGINT) AS nc
  FROM cross_)
SELECT keys_.n_keys,
       coalesce((SELECT max(nc) FROM ord_), 0) AS n_crossed,
       (SELECT min(k) FROM cross_) AS min_events,
       (SELECT k FROM ord_ WHERE rn = (nc - 1) // 2 + 1 LIMIT 1)
         AS median_events,
       (SELECT max(k) FROM cross_) AS max_events
FROM keys_
"""


def q_above_median_streak_events(sf_dir: str):
    """Longest streak of observed days strictly above the per-type
    median daily count (stages/temporal.py :: above_median_streak)."""
    from ..stages.temporal import above_median_streak

    return _materialize(above_median_streak(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type"))


SQL_ABOVE_MEDIAN_STREAK_EVENTS = """
WITH f AS (
  SELECT event_type AS g,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL),
daily AS (
  SELECT g, day, CAST(count(*) AS BIGINT) AS x
  FROM f GROUP BY 1, 2),
med AS (SELECT g, median(x) AS m FROM daily GROUP BY g),
flagged AS (
  SELECT d.g, d.day,
         CASE WHEN d.x > med.m THEN 1 ELSE 0 END AS a,
         CAST(row_number() OVER (PARTITION BY d.g ORDER BY d.day)
              AS BIGINT) AS rn
  FROM daily d JOIN med ON med.g = d.g),
runs AS (
  SELECT g, a,
         rn - CAST(row_number() OVER (PARTITION BY g, a ORDER BY rn)
                   AS BIGINT) AS grp
  FROM flagged),
streaks AS (
  SELECT g, CAST(count(*) AS BIGINT) AS len
  FROM runs WHERE a = 1 GROUP BY g, grp),
agg AS (
  SELECT g, CAST(max(len) AS BIGINT) AS longest
  FROM streaks GROUP BY g)
SELECT d.g AS event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(CASE WHEN d.x > med.m THEN 1 ELSE 0 END) AS BIGINT)
         AS n_above,
       coalesce(max(agg.longest), 0) AS longest_streak
FROM daily d
JOIN med ON med.g = d.g
LEFT JOIN agg ON agg.g = d.g
GROUP BY d.g
"""


QUERIES83: Dict[str, Callable] = {
    "first_passage_users": q_first_passage_users,
    "above_median_streak_events": q_above_median_streak_events,
}

SQL83: Dict[str, str] = {
    "first_passage_users": SQL_FIRST_PASSAGE_USERS,
    "above_median_streak_events": SQL_ABOVE_MEDIAN_STREAK_EVENTS,
}
