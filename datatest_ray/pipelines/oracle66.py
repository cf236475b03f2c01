"""Driver-contract queries, batch 66 (see oracle.py for the contract):
expected shortfall (CVaR) of order totals, mean-excess POT tail
diagnostic, and Taylor's power-law fit across per-user value streams.
Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_es95_price(sf_dir: str):
    """Expected shortfall of the top 5% of o_totalprice
    (stages/robust.py :: expected_shortfall)."""
    from ..stages.robust import expected_shortfall

    return _materialize(expected_shortfall(
        _read(sf_dir, "orders", ["o_totalprice"]),
        col="o_totalprice", q=0.95))


SQL_ES95_PRICE = """
WITH f AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders WHERE o_totalprice IS NOT NULL),
vc AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM f GROUP BY v),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM vc),
m AS (SELECT greatest(CAST(ceil(0.05 * tot.n) AS BIGINT), 1) AS m,
             tot.n AS n FROM tot),
dw AS (SELECT v, cnt,
              CAST(sum(cnt) OVER (ORDER BY v DESC) AS BIGINT) AS dcum
       FROM vc),
tail AS (
  SELECT m.n, m.m,
         CAST(sum(CASE WHEN dw.dcum - dw.cnt >= m.m THEN 0
                       WHEN dw.dcum <= m.m THEN dw.v * dw.cnt
                       ELSE dw.v * (m.m - (dw.dcum - dw.cnt)) END)
              AS BIGINT) AS tail_sum
  FROM dw, m GROUP BY m.n, m.m),
aw AS (SELECT v, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS acum
       FROM vc),
varq AS (
  SELECT min(v) AS var_c
  FROM aw, tot
  WHERE acum >= greatest(CAST(ceil(0.95 * tot.n) AS BIGINT), 1))
SELECT tail.n, tail.m,
       round(varq.var_c / 100.0, 6) AS var_q,
       round(tail.tail_sum / (100.0 * tail.m), 6) AS es
FROM tail, varq
"""


def q_mean_excess_price(sf_dir: str):
    """Mean-excess e(u) over a fixed threshold grid + its OLS slope
    (GPD tail-shape probe) (stages/robust.py :: mean_excess_slope)."""
    from ..stages.robust import mean_excess_slope

    return _materialize(mean_excess_slope(
        _read(sf_dir, "orders", ["o_totalprice"]),
        col="o_totalprice",
        thresholds=(100000.0, 200000.0, 300000.0, 400000.0)))


SQL_MEAN_EXCESS_PRICE = """
WITH f AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders WHERE o_totalprice IS NOT NULL),
grid AS (
  SELECT unnest([10000000, 20000000, 30000000, 40000000]) AS u),
per AS (
  SELECT grid.u,
         CAST(count(*) FILTER (WHERE f.v > grid.u) AS BIGINT) AS n,
         CAST(coalesce(sum(f.v - grid.u)
                       FILTER (WHERE f.v > grid.u), 0) AS BIGINT) AS s
  FROM grid LEFT JOIN f ON true
  GROUP BY grid.u),
me AS (
  SELECT u / 100.0 AS u, n,
         CASE WHEN n > 0 THEN (s / 100.0) / n END AS mean_ex
  FROM per),
fit AS (
  SELECT CAST(count(*) AS BIGINT) AS g,
         sum(u) AS sx, sum(mean_ex) AS sy,
         sum(u * u) AS sxx, sum(u * mean_ex) AS sxy
  FROM me WHERE mean_ex IS NOT NULL),
slope AS (
  SELECT CASE WHEN g >= 2 AND g * sxx - sx * sx > 0
              THEN round((g * sxy - sx * sy) / (g * sxx - sx * sx), 6)
         END AS s
  FROM fit)
SELECT round(me.u, 6) AS u, me.n AS n_exceed,
       CASE WHEN me.mean_ex IS NOT NULL
            THEN round(me.mean_ex, 6) END AS mean_ex,
       slope.s AS me_slope
FROM me, slope
"""


def q_taylors_law_users(sf_dir: str):
    """Taylor's power law across per-user value streams
    (stages/stattests.py :: taylors_law)."""
    from ..stages.stattests import taylors_law

    return _materialize(taylors_law(
        _read(sf_dir, "events", ["user_id", "value"]),
        group_col="user_id", value_col="value", min_n=5))


SQL_TAYLORS_LAW_USERS = """
WITH f AS (
  SELECT user_id AS g, CAST(round(value * 100) AS BIGINT) AS u
  FROM events
  WHERE user_id IS NOT NULL AND value IS NOT NULL),
a AS (SELECT g, CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(u) AS DOUBLE) AS s,
             CAST(sum(u * u) AS DOUBLE) AS s2
      FROM f GROUP BY g),
mv AS (
  SELECT s / n / 100.0 AS mean,
         (s2 - s * s / n) / n / 10000.0 AS var, n
  FROM a),
ok AS (SELECT ln(mean) AS x, ln(var) AS y FROM mv
       WHERE n >= 5 AND mean > 0 AND var > 0),
fit AS (
  SELECT CAST(count(*) AS BIGINT) AS g,
         sum(x) / count(*) AS mx, sum(y) / count(*) AS my,
         sum(x * x) AS sxx, sum(x * y) AS sxy,
         sum(x) AS sx, sum(y) AS sy
  FROM ok)
SELECT g AS n_groups,
       CASE WHEN g >= 2 AND sxx - sx * mx > 0
            THEN round((sxy - sx * my) / (sxx - sx * mx), 6)
       END AS b,
       CASE WHEN g >= 2 AND sxx - sx * mx > 0
            THEN round(my - ((sxy - sx * my) / (sxx - sx * mx)) * mx,
                       6)
       END AS ln_a
FROM fit
"""


QUERIES66: Dict[str, Callable] = {
    "es95_price": q_es95_price,
    "mean_excess_price": q_mean_excess_price,
    "taylors_law_users": q_taylors_law_users,
}

SQL66: Dict[str, str] = {
    "es95_price": SQL_ES95_PRICE,
    "mean_excess_price": SQL_MEAN_EXCESS_PRICE,
    "taylors_law_users": SQL_TAYLORS_LAW_USERS,
}
