"""Driver-contract queries, batch 30 (see oracle.py for the contract):
time-based RANGE window frames (trailing 1-hour count/spend per user),
two-predictor OLS via exact integer normal equations, circular
hour-of-day statistics per event type, and the hourly dispersion
(Fano) index — the burstiness audit.  Merged into
``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


# ---------------------------------------------------------------------------
# Trailing 1-hour RANGE frame per user
# ---------------------------------------------------------------------------


def q_trail1h_user_value(sf_dir: str):
    """``count/sum OVER (PARTITION BY user ORDER BY ts RANGE BETWEEN
    INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)`` — exact integer-cents
    trailing spend (stages/winfunc.py :: trailing_range_agg)."""
    from ..stages.winfunc import trailing_range_agg

    return _materialize(trailing_range_agg(
        _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"]),
        by="user_id", ts_col="ts", value_col="value",
        id_col="event_id", window_s=3600))


SQL_TRAIL1H_USER_VALUE = """
SELECT event_id, user_id,
       CAST(count(*) OVER w AS BIGINT) AS n_win,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w
            AS BIGINT) AS sum_win_c
FROM events
WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# Two-predictor OLS: extendedprice ~ quantity + discount
# ---------------------------------------------------------------------------


def q_ols2_lineitem(sf_dir: str):
    """Multiple regression l_extendedprice(cents) ~ l_quantity +
    l_discount(pct-hundredths) — exact big-int normal equations
    (stages/window.py :: regression_two_predictors)."""
    from ..stages.window import regression_two_predictors

    return _materialize(regression_two_predictors(
        _read(sf_dir, "lineitem",
              ["l_extendedprice", "l_quantity", "l_discount"]),
        y="l_extendedprice", x1="l_quantity", x2="l_discount",
        y_scale=100.0, x1_scale=1.0, x2_scale=100.0))


SQL_OLS2_LINEITEM = """
WITH f AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
         CAST(round(l_quantity) AS BIGINT) AS a,
         CAST(round(l_discount * 100) AS BIGINT) AS b
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
    AND l_discount IS NOT NULL),
s AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(a) AS HUGEINT) AS s1,
         CAST(sum(b) AS HUGEINT) AS s2,
         CAST(sum(a * a) AS HUGEINT) AS s11,
         CAST(sum(b * b) AS HUGEINT) AS s22,
         CAST(sum(a * b) AS HUGEINT) AS s12,
         CAST(sum(a * y) AS HUGEINT) AS s1y,
         CAST(sum(b * y) AS HUGEINT) AS s2y
  FROM f),
c AS (
  SELECT n, sy, s1, s2,
         n * s11 - s1 * s1 AS sxx1,
         n * s22 - s2 * s2 AS sxx2,
         n * s12 - s1 * s2 AS sx12,
         n * s1y - s1 * sy AS sx1y,
         n * s2y - s2 * sy AS sx2y
  FROM s),
d AS (SELECT *, sxx1 * sxx2 - sx12 * sx12 AS det FROM c),
e AS (
  SELECT CAST(n AS BIGINT) AS n, sy, s1, s2, det,
         CASE WHEN det <> 0 THEN
           CAST(sx1y * sxx2 - sx2y * sx12 AS DOUBLE)
             / CAST(det AS DOUBLE) END AS beta_x1,
         CASE WHEN det <> 0 THEN
           CAST(sx2y * sxx1 - sx1y * sx12 AS DOUBLE)
             / CAST(det AS DOUBLE) END AS beta_x2
  FROM d)
SELECT n, beta_x1, beta_x2,
       CASE WHEN det <> 0 THEN
         (CAST(sy AS DOUBLE) - beta_x1 * CAST(s1 AS DOUBLE)
          - beta_x2 * CAST(s2 AS DOUBLE)) / n END AS intercept
FROM e
"""


# ---------------------------------------------------------------------------
# Circular hour-of-day statistics per event type
# ---------------------------------------------------------------------------


def q_circular_hour_events(sf_dir: str):
    """Circular mean direction / resultant length / circular variance
    of the hour-of-day per event type (stages/temporal.py ::
    circular_hour_stats)."""
    from ..stages.temporal import circular_hour_stats

    return _materialize(circular_hour_stats(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type"))


SQL_CIRCULAR_HOUR_EVENTS = """
WITH f AS (
  SELECT event_type AS g, CAST(hour(ts) AS BIGINT) AS h
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
c AS (SELECT g, h, CAST(count(*) AS BIGINT) AS c FROM f GROUP BY 1, 2),
a AS (
  SELECT g, CAST(sum(c) AS BIGINT) AS n,
         sum(c * cos(2 * pi() * h / 24.0)) AS cs,
         sum(c * sin(2 * pi() * h / 24.0)) AS ss
  FROM c GROUP BY 1)
SELECT g AS event_type, n,
       atan2(ss, cs) AS mean_angle,
       sqrt(cs * cs + ss * ss) / n AS resultant,
       1.0 - sqrt(cs * cs + ss * ss) / n AS circ_var
FROM a
"""


# ---------------------------------------------------------------------------
# Hourly dispersion (Fano) index per event type
# ---------------------------------------------------------------------------


def q_dispersion_hourly_events(sf_dir: str):
    """Index of dispersion Var/Mean over hourly arrival counts per
    event type — exact integer moments (stages/temporal.py ::
    dispersion_index_hourly)."""
    from ..stages.temporal import dispersion_index_hourly

    return _materialize(dispersion_index_hourly(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type"))


SQL_DISPERSION_HOURLY_EVENTS = """
WITH f AS (
  SELECT event_type AS g,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS b
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
c AS (SELECT g, b, CAST(count(*) AS BIGINT) AS c FROM f GROUP BY 1, 2),
a AS (SELECT g, CAST(count(*) AS BIGINT) AS nb,
             CAST(sum(c) AS BIGINT) AS s1,
             CAST(sum(c * c) AS BIGINT) AS s2
      FROM c GROUP BY 1)
SELECT g AS event_type, s1 AS n_events, nb AS n_buckets,
       CAST(s1 AS DOUBLE) / nb AS mean_per_hour,
       CASE WHEN s1 > 0 THEN
         (CAST(nb * s2 - s1 * s1 AS DOUBLE) / (CAST(nb AS DOUBLE) * nb))
           / (CAST(s1 AS DOUBLE) / nb) END AS dispersion
FROM a
"""


QUERIES30: Dict[str, Callable] = {
    "trail1h_user_value": q_trail1h_user_value,
    "ols2_lineitem": q_ols2_lineitem,
    "circular_hour_events": q_circular_hour_events,
    "dispersion_hourly_events": q_dispersion_hourly_events,
}

SQL30: Dict[str, str] = {
    "trail1h_user_value": SQL_TRAIL1H_USER_VALUE,
    "ols2_lineitem": SQL_OLS2_LINEITEM,
    "circular_hour_events": SQL_CIRCULAR_HOUR_EVENTS,
    "dispersion_hourly_events": SQL_DISPERSION_HOURLY_EVENTS,
}
