"""Driver-contract queries, batch 81 (see oracle.py for the contract):
Dunn's post-hoc pairwise rank comparisons across the five event
types.  Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_dunn_pairs_value(sf_dir: str):
    """Dunn's post-hoc z for every event-type pair on value
    (stages/stattests.py :: dunn_pairs)."""
    from ..stages.stattests import dunn_pairs

    return _materialize(dunn_pairs(
        _read(sf_dir, "events", ["event_type", "value"]),
        value_col="value", group_col="event_type",
        groups=EVENT_TYPES))


SQL_DUNN_PAIRS_VALUE = """
WITH f AS (
  SELECT event_type AS g, value AS v
  FROM events
  WHERE value IS NOT NULL
    AND event_type IN ('click', 'view', 'purchase', 'signup',
                       'error')),
vc AS (SELECT v, g, CAST(count(*) AS BIGINT) AS c
       FROM f GROUP BY 1, 2),
tc AS (SELECT v, CAST(sum(c) AS BIGINT) AS cnt FROM vc GROUP BY v),
w AS (SELECT v, cnt,
             CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS hi
      FROM tc),
mr AS (SELECT v, (hi - cnt) + (cnt + 1) / 2.0 AS mr FROM w),
per_g AS (
  SELECT vc.g, CAST(sum(vc.c) AS BIGINT) AS n,
         sum(vc.c * mr.mr) AS rsum
  FROM vc JOIN mr ON mr.v = vc.v GROUP BY vc.g),
tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n,
         sum(CAST(cnt AS DOUBLE) * cnt * cnt - cnt) AS ties
  FROM tc),
base AS (
  SELECT tot.n,
         tot.n * (tot.n + 1) / 12.0
           - tot.ties / (12.0 * (tot.n - 1)) AS b
  FROM tot)
SELECT a.g AS group_a, b.g AS group_b,
       CASE WHEN base.b > 0
            THEN round((a.rsum / a.n - b.rsum / b.n)
                       / sqrt(base.b * (1.0 / a.n + 1.0 / b.n)), 6)
       END AS z
FROM per_g a
JOIN per_g b ON a.g < b.g, base
"""


QUERIES81: Dict[str, Callable] = {
    "dunn_pairs_value": q_dunn_pairs_value,
}

SQL81: Dict[str, str] = {
    "dunn_pairs_value": SQL_DUNN_PAIRS_VALUE,
}
