"""Driver-contract queries, batch 13 (see oracle.py for the contract):
Kruskal–Wallis H across event types, one-way ANOVA F, and per-group
Jarque–Bera normality.  Merged into ``oracle.queries()`` /
``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict

import pyarrow as pa


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


# ---------------------------------------------------------------------------
# Kruskal–Wallis H (k-sample rank test)
# ---------------------------------------------------------------------------


def q_kruskal_value_types(sf_dir: str):
    """Kruskal–Wallis H of event value across ALL event types — the
    k-sample location test on ranks (no normality assumption); exact
    tie handling from (group, value) counts, O(distinct) shuffle."""
    from ..stages.robust import kruskal_wallis

    return _materialize(kruskal_wallis(
        _read(sf_dir, "events", ["event_type", "value"]),
        value_col="value", group_col="event_type"))


SQL_KRUSKAL_VALUE_TYPES = """
WITH v AS (
  SELECT event_type AS g, value AS v FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
),
c AS (SELECT v, count(*) AS cnt FROM v GROUP BY v),
r AS (
  SELECT v, cnt,
         sum(cnt) OVER (ORDER BY v) - cnt + (cnt + 1) / 2.0 AS avg_rank
  FROM c
),
g AS (
  SELECT v.g, sum(r.avg_rank) AS rsum, count(*) AS n_i
  FROM v JOIN r USING (v) GROUP BY v.g
),
t AS (
  SELECT count(*) AS k, sum(n_i) AS n,
         sum(rsum * rsum / n_i) AS s
  FROM g
),
tie AS (SELECT sum(cnt * cnt * cnt - cnt) AS tt FROM c)
SELECT CAST(t.k AS BIGINT) AS k, CAST(t.n AS BIGINT) AS n,
       (12.0 / (t.n * (t.n + 1.0)) * t.s - 3.0 * (t.n + 1.0))
         / (1.0 - tie.tt / (CAST(t.n AS DOUBLE) * t.n * t.n - t.n)) AS h
FROM t, tie
"""


# ---------------------------------------------------------------------------
# One-way ANOVA F
# ---------------------------------------------------------------------------


def q_anova_value_types(sf_dir: str):
    """One-way ANOVA F of event value across event types — equal-means
    test from per-group moment partials; rows never shuffle."""
    from ..stages.robust import anova_oneway

    return _materialize(anova_oneway(
        _read(sf_dir, "events", ["event_type", "value"]),
        value_col="value", group_col="event_type"))


SQL_ANOVA_VALUE_TYPES = """
WITH g AS (
  SELECT event_type AS g, count(*) AS n, sum(value) AS s,
         sum(value * value) AS ss
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY event_type
),
t AS (
  SELECT count(*) AS k, sum(n) AS n, sum(s) AS gs,
         sum(s * s / n) AS sb_part, sum(ss - s * s / n) AS ssw
  FROM g
)
SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
       ((sb_part - gs * gs / n) / (k - 1)) / (ssw / (n - k)) AS f
FROM t
"""


# ---------------------------------------------------------------------------
# Jarque–Bera normality per group
# ---------------------------------------------------------------------------


def q_jarque_bera_value(sf_dir: str):
    """Jarque–Bera normality screen of event value per event type —
    skew/kurtosis from raw power sums, JB = n/6·(S² + (K−3)²/4); the
    pre-flight check before any z-score anomaly rule."""
    from ..stages.robust import jarque_bera

    return _materialize(jarque_bera(
        _read(sf_dir, "events", ["event_type", "value"]),
        value_col="value", by="event_type"))


SQL_JARQUE_BERA_VALUE = """
WITH g AS (
  SELECT event_type, count(*) AS n, sum(value) AS s1,
         sum(value * value) AS s2,
         sum(value * value * value) AS s3,
         sum(value * value * value * value) AS s4
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY event_type
),
m AS (
  SELECT event_type, n,
         s1 / n AS m1,
         s2 / n - (s1 / n) * (s1 / n) AS m2,
         s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * pow(s1 / n, 3) AS m3,
         s4 / n - 4 * (s1 / n) * (s3 / n)
           + 6 * (s1 / n) * (s1 / n) * (s2 / n)
           - 3 * pow(s1 / n, 4) AS m4
  FROM g
),
s AS (
  SELECT event_type, n,
         CASE WHEN n >= 2 AND m2 > 0
              THEN m3 / pow(m2, 1.5) END AS skew,
         CASE WHEN n >= 2 AND m2 > 0
              THEN m4 / (m2 * m2) END AS kurt
  FROM m
)
SELECT event_type, CAST(n AS BIGINT) AS n, skew, kurt,
       n / 6.0 * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0) AS jb
FROM s
"""


QUERIES13: Dict[str, Callable] = {
    "kruskal_value_types": q_kruskal_value_types,
    "anova_value_types": q_anova_value_types,
    "jarque_bera_value": q_jarque_bera_value,
}

SQL13: Dict[str, str] = {
    "kruskal_value_types": SQL_KRUSKAL_VALUE_TYPES,
    "anova_value_types": SQL_ANOVA_VALUE_TYPES,
    "jarque_bera_value": SQL_JARQUE_BERA_VALUE,
}
