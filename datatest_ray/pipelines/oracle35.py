"""Driver-contract queries, batch 35 (see oracle.py for the contract):
Nelson-Aalen cumulative hazard over user lifetimes, Grubbs' max-outlier
statistic on event values, and the characteristic-function drift
distance between view/purchase value distributions.  Merged into
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
# Nelson-Aalen cumulative hazard over user lifetimes
# ---------------------------------------------------------------------------


def q_nelson_aalen_users(sf_dir: str):
    """Nelson-Aalen H(t) + variance of user time-to-first-'error'
    (censored at last activity for users who never error) — the
    always-active population makes the churn framing empty, so the
    failure framing is the one that proves something
    (stages/temporal.py :: nelson_aalen)."""
    from ..stages.temporal import nelson_aalen

    return _materialize(nelson_aalen(
        _read(sf_dir, "events", ["user_id", "ts", "event_type"]),
        "ts", by="user_id", failure_type="error"))


SQL_NELSON_AALEN_USERS = """
WITH u AS (
  SELECT user_id,
         (coalesce(min(CASE WHEN event_type = 'error'
                            THEN epoch_us(ts) END),
                   max(epoch_us(ts)))
          - min(epoch_us(ts))) // 86400000000 AS dur_days,
         CASE WHEN min(CASE WHEN event_type = 'error'
                            THEN epoch_us(ts) END) IS NOT NULL
              THEN 1 ELSE 0 END AS ev
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
  GROUP BY user_id
),
agg AS (SELECT dur_days, sum(ev) AS d, count(*) AS c
        FROM u GROUP BY dur_days),
r AS (
  SELECT dur_days, d,
         sum(c) OVER (ORDER BY dur_days DESC) AS n_risk
  FROM agg
),
na AS (
  SELECT dur_days, CAST(d AS BIGINT) AS d,
         CAST(n_risk AS BIGINT) AS n_risk,
         sum(d * 1.0 / n_risk) OVER (ORDER BY dur_days) AS h,
         sum(d * 1.0 / (n_risk * n_risk))
           OVER (ORDER BY dur_days) AS var_h
  FROM r
)
SELECT dur_days, d, n_risk, h, var_h FROM na WHERE d > 0
"""


# ---------------------------------------------------------------------------
# Grubbs' statistic on event values
# ---------------------------------------------------------------------------


def q_grubbs_value(sf_dir: str):
    """Grubbs' two-sided max-outlier statistic of ``value`` — exact
    integer-cent moments (stages/stattests.py :: grubbs_statistic)."""
    from ..stages.stattests import grubbs_statistic

    return _materialize(grubbs_statistic(
        _read(sf_dir, "events", ["value"]), value_col="value"))


SQL_GRUBBS_VALUE = """
WITH f AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events
  WHERE value IS NOT NULL),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(c) AS HUGEINT) AS s1,
         CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2,
         CAST(min(c) AS BIGINT) AS mn,
         CAST(max(c) AS BIGINT) AS mx
  FROM f),
m AS (
  SELECT n, mn, mx,
         CAST(s1 AS DOUBLE) / n AS mean_c,
         CASE WHEN n >= 2 THEN
           CAST(n * s2 - s1 * s1 AS DOUBLE)
             / (CAST(n AS DOUBLE) * (n - 1)) END AS var_c
  FROM s)
SELECT n,
       CASE WHEN var_c > 0 THEN mean_c / 100.0 END AS mean,
       CASE WHEN var_c > 0 THEN sqrt(var_c) / 100.0 END AS sd,
       CASE WHEN var_c > 0 THEN
         greatest(mean_c - mn, mx - mean_c) / sqrt(var_c) END AS g,
       CASE WHEN var_c > 0 THEN
         CASE WHEN mean_c - mn >= mx - mean_c
              THEN CAST(mn AS DOUBLE) / 100.0
              ELSE CAST(mx AS DOUBLE) / 100.0 END END AS extreme
FROM m
"""


# ---------------------------------------------------------------------------
# Characteristic-function drift: view vs purchase values
# ---------------------------------------------------------------------------


def q_cf_drift_value(sf_dir: str):
    """Empirical characteristic-function distance between the view and
    purchase ``value`` distributions at t = 0.01, 0.05, 0.25
    (stages/stattests.py :: cf_drift)."""
    from ..stages.stattests import cf_drift

    return _materialize(cf_drift(
        _read(sf_dir, "events", ["event_type", "value"]),
        value_col="value", group_col="event_type",
        a="view", b="purchase"))


SQL_CF_DRIFT_VALUE = """
WITH f AS (
  SELECT value AS x, CAST(event_type = 'view' AS BIGINT) AS ia
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('view', 'purchase')),
s AS (
  SELECT CAST(sum(ia) AS BIGINT) AS na,
         CAST(sum(1 - ia) AS BIGINT) AS nb,
         sum(CASE WHEN ia = 1 THEN cos(0.01 * x) ELSE 0.0 END) AS ca0,
         sum(CASE WHEN ia = 1 THEN sin(0.01 * x) ELSE 0.0 END) AS sa0,
         sum(CASE WHEN ia = 0 THEN cos(0.01 * x) ELSE 0.0 END) AS cb0,
         sum(CASE WHEN ia = 0 THEN sin(0.01 * x) ELSE 0.0 END) AS sb0,
         sum(CASE WHEN ia = 1 THEN cos(0.05 * x) ELSE 0.0 END) AS ca1,
         sum(CASE WHEN ia = 1 THEN sin(0.05 * x) ELSE 0.0 END) AS sa1,
         sum(CASE WHEN ia = 0 THEN cos(0.05 * x) ELSE 0.0 END) AS cb1,
         sum(CASE WHEN ia = 0 THEN sin(0.05 * x) ELSE 0.0 END) AS sb1,
         sum(CASE WHEN ia = 1 THEN cos(0.25 * x) ELSE 0.0 END) AS ca2,
         sum(CASE WHEN ia = 1 THEN sin(0.25 * x) ELSE 0.0 END) AS sa2,
         sum(CASE WHEN ia = 0 THEN cos(0.25 * x) ELSE 0.0 END) AS cb2,
         sum(CASE WHEN ia = 0 THEN sin(0.25 * x) ELSE 0.0 END) AS sb2
  FROM f)
SELECT na AS n_a, nb AS n_b,
       CASE WHEN na > 0 AND nb > 0 THEN
           (ca0 / na - cb0 / nb) * (ca0 / na - cb0 / nb)
         + (sa0 / na - sb0 / nb) * (sa0 / na - sb0 / nb)
         + (ca1 / na - cb1 / nb) * (ca1 / na - cb1 / nb)
         + (sa1 / na - sb1 / nb) * (sa1 / na - sb1 / nb)
         + (ca2 / na - cb2 / nb) * (ca2 / na - cb2 / nb)
         + (sa2 / na - sb2 / nb) * (sa2 / na - sb2 / nb)
       END AS d
FROM s
"""


QUERIES35: Dict[str, Callable] = {
    "nelson_aalen_users": q_nelson_aalen_users,
    "grubbs_value": q_grubbs_value,
    "cf_drift_value": q_cf_drift_value,
}

SQL35: Dict[str, str] = {
    "nelson_aalen_users": SQL_NELSON_AALEN_USERS,
    "grubbs_value": SQL_GRUBBS_VALUE,
    "cf_drift_value": SQL_CF_DRIFT_VALUE,
}
