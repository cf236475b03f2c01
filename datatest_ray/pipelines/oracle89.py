"""Driver-contract queries, batch 89 (see oracle.py for the contract):
AUC with Hanley-McNeil interval and the per-user overdispersion z.
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


def q_auc_ci_value(sf_dir: str):
    """AUC of value separating purchase from click, with the
    Hanley-McNeil 95% interval (stages/stattests.py :: auc_with_ci)."""
    from ..stages.stattests import auc_with_ci

    return _materialize(auc_with_ci(
        _read(sf_dir, "events", ["event_type", "value"]),
        score_col="value", group_col="event_type",
        pos="purchase", neg="click"))


SQL_AUC_CI_VALUE = """
WITH f AS (
  SELECT value AS v,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isp
  FROM events
  WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL),
g AS (SELECT v, CAST(sum(isp) AS BIGINT) AS ca,
             CAST(count(*) AS BIGINT) AS cnt
      FROM f GROUP BY v),
w AS (
  SELECT ca, cnt - ca AS cb,
         CAST(sum(cnt - ca) OVER (ORDER BY v) AS BIGINT) AS cum_b
  FROM g),
tot AS (SELECT CAST(sum(ca) AS BIGINT) AS np_,
               CAST(sum(cb) AS BIGINT) AS nn FROM w),
u AS (
  SELECT sum(ca * CAST(cum_b - cb AS DOUBLE))
           + 0.5 * sum(CAST(ca AS DOUBLE) * cb) AS u
  FROM w),
a AS (
  SELECT tot.np_, tot.nn,
         u.u / (CAST(tot.np_ AS DOUBLE) * tot.nn) AS auc
  FROM tot, u),
v AS (
  SELECT np_, nn, auc,
         sqrt(greatest(
           (auc * (1.0 - auc)
            + (np_ - 1) * (auc / (2.0 - auc) - auc * auc)
            + (nn - 1) * (2.0 * auc * auc / (1.0 + auc)
                          - auc * auc))
           / (CAST(np_ AS DOUBLE) * nn), 0.0)) AS se
  FROM a)
SELECT np_ AS n_pos, nn AS n_neg,
       round(auc, 6) AS auc, round(se, 6) AS se,
       round(auc - 1.959964 * se, 6) AS ci_lo,
       round(auc + 1.959964 * se, 6) AS ci_hi
FROM v
"""


def q_overdispersion_users(sf_dir: str):
    """Cameron-Trivedi overdispersion z of per-user event counts
    (stages/stattests.py :: overdispersion_test)."""
    import pyarrow as pa

    from ..stages.stattests import overdispersion_test

    ev = _read(sf_dir, "events", ["user_id"]).map_batches(
        lambda t: t.filter(pc.is_valid(t.column("user_id"))),
        batch_format="pyarrow", zero_copy_batch=True)
    return _materialize(overdispersion_test(ev, group_col="user_id"))


SQL_OVERDISPERSION_USERS = """
WITH c AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS y
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS s1,
         CAST(sum(y * y) AS BIGINT) AS s2
  FROM c),
m AS (SELECT n, s1, s2, CAST(s1 AS DOUBLE) / n AS mu FROM s)
SELECT n AS n_keys,
       round(mu, 6) AS mean,
       round(CAST(s2 AS DOUBLE) / n - mu * mu, 6) AS var,
       CASE WHEN n >= 2 AND mu > 0
            THEN round((CAST(s2 AS DOUBLE) - 2.0 * mu * s1
                        + n * mu * mu - s1)
                       / sqrt(2.0 * n * mu * mu), 6)
       END AS z
FROM m
"""


QUERIES89: Dict[str, Callable] = {
    "auc_ci_value": q_auc_ci_value,
    "overdispersion_users": q_overdispersion_users,
}

SQL89: Dict[str, str] = {
    "auc_ci_value": SQL_AUC_CI_VALUE,
    "overdispersion_users": SQL_OVERDISPERSION_USERS,
}
