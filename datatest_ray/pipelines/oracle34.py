"""Driver-contract queries, batch 34 (see oracle.py for the contract):
sequential-state smoothing and density estimation — Holt double
exponential smoothing residuals over the daily event-count series per
type (recursive-CTE oracle: the recurrence is mirrored op-for-op) and
a fixed-grid Gaussian KDE of the event value distribution.  Merged
into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


# ---------------------------------------------------------------------------
# Holt smoothing residuals on daily event counts per type
# ---------------------------------------------------------------------------


def q_holt_daily_events(sf_dir: str):
    """Holt level+trend smoothing (α=0.5, β=0.25) over each event
    type's daily count series; per-day one-step forecast + residual
    (stages/temporal.py :: holt_daily)."""
    from ..stages.temporal import holt_daily

    return _materialize(holt_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type"))


SQL_HOLT_DAILY_EVENTS = """
WITH RECURSIVE daily AS (
  SELECT event_type AS g,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2),
numbered AS (
  SELECT g, day, x,
         CAST(row_number() OVER (PARTITION BY g ORDER BY day)
              AS BIGINT) AS rn
  FROM daily),
rec(g, rn, s, b) AS (
  SELECT n1.g, CAST(1 AS BIGINT), CAST(n1.x AS DOUBLE),
         CAST(n2.x AS DOUBLE) - CAST(n1.x AS DOUBLE)
  FROM numbered n1
  JOIN numbered n2 ON n1.g = n2.g AND n1.rn = 1 AND n2.rn = 2
  UNION ALL
  SELECT r.g, r.rn + 1,
         0.5 * CAST(n.x AS DOUBLE) + 0.5 * (r.s + r.b),
         0.25 * ((0.5 * CAST(n.x AS DOUBLE) + 0.5 * (r.s + r.b)) - r.s)
           + 0.75 * r.b
  FROM rec r
  JOIN numbered n ON n.g = r.g AND n.rn = r.rn + 1)
SELECT n.g AS event_type, n.day, n.x,
       r.s + r.b AS forecast,
       CAST(n.x AS DOUBLE) - (r.s + r.b) AS resid
FROM rec r
JOIN numbered n ON n.g = r.g AND n.rn = r.rn + 1
"""


# ---------------------------------------------------------------------------
# Fixed-grid Gaussian KDE of event values
# ---------------------------------------------------------------------------

_KDE_GRID = [float(j * 50) for j in range(11)]  # 0, 50, ..., 500
_KDE_H = 25.0


def q_kde_value_events(sf_dir: str):
    """Gaussian KDE of ``value`` at the fixed grid 0..500 step 50,
    bandwidth 25 (stages/stattests.py :: kde_fixed_grid)."""
    from ..stages.stattests import kde_fixed_grid

    return _materialize(kde_fixed_grid(
        _read(sf_dir, "events", ["value"]),
        value_col="value", grid=_KDE_GRID, bandwidth=_KDE_H))


SQL_KDE_VALUE_EVENTS = """
WITH grid(g) AS (
  SELECT CAST(j * 50 AS DOUBLE) FROM generate_series(0, 10) t(j)),
f AS (SELECT value AS x FROM events WHERE value IS NOT NULL),
a AS (
  SELECT g, sum(exp(-((g - x) * (g - x)) / (2.0 * 25.0 * 25.0))) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM grid CROSS JOIN f GROUP BY g)
SELECT g AS grid, n,
       CASE WHEN n > 0 THEN
         s / (n * 25.0 * sqrt(2.0 * pi())) END AS density
FROM a
"""


QUERIES34: Dict[str, Callable] = {
    "holt_daily_events": q_holt_daily_events,
    "kde_value_events": q_kde_value_events,
}

SQL34: Dict[str, str] = {
    "holt_daily_events": SQL_HOLT_DAILY_EVENTS,
    "kde_value_events": SQL_KDE_VALUE_EVENTS,
}
