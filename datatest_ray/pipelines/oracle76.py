"""Driver-contract queries, batch 76 (see oracle.py for the contract):
Box-Cox lambda profile scan and the Lorenz asymmetry coefficient over
order totals.  Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_boxcox_price(sf_dir: str):
    """Box-Cox lambda scan over o_totalprice
    (stages/robust.py :: boxcox_scan)."""
    from ..stages.robust import boxcox_scan

    return _materialize(boxcox_scan(
        _read(sf_dir, "orders", ["o_totalprice"]),
        col="o_totalprice"))


SQL_BOXCOX_PRICE = """
WITH f AS (
  SELECT o_totalprice AS x, ln(o_totalprice) AS lx
  FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice > 0),
grid AS (
  SELECT * FROM (VALUES (0, -1.0), (1, -0.5), (2, 0.0), (3, 0.5),
                        (4, 1.0)) AS t(i, lam)),
y AS (
  SELECT g.i, g.lam,
         CASE WHEN g.lam = 0.0 THEN f.lx
              ELSE power(f.x, g.lam) END AS y,
         f.lx
  FROM f CROSS JOIN grid g),
agg AS (
  SELECT i, lam, CAST(count(*) AS BIGINT) AS n,
         sum(y) AS s, sum(y * y) AS s2, sum(lx) AS slx
  FROM y GROUP BY 1, 2),
ll AS (
  SELECT i, lam, n,
         CASE WHEN n >= 2
                   AND s2 / n - (s / n) * (s / n) > 0
              THEN (-n / 2.0 * ln(CASE WHEN lam = 0.0
                       THEN s2 / n - (s / n) * (s / n)
                       ELSE (s2 / n - (s / n) * (s / n))
                            / (lam * lam) END)
                    + (lam - 1.0) * slx) / n
         END AS llp
  FROM agg),
best AS (SELECT max(llp) AS b FROM ll WHERE llp IS NOT NULL)
SELECT round(ll.lam, 6) AS lam,
       CASE WHEN ll.llp IS NOT NULL THEN round(ll.llp, 6) END
         AS ll_per_n,
       CAST(CASE WHEN ll.llp = best.b THEN 1 ELSE 0 END AS BIGINT)
         AS best
FROM ll, best
"""


def q_lorenz_asymmetry_price(sf_dir: str):
    """Lorenz asymmetry of o_totalprice
    (stages/robust.py :: lorenz_asymmetry)."""
    from ..stages.robust import lorenz_asymmetry

    return _materialize(lorenz_asymmetry(
        _read(sf_dir, "orders", ["o_totalprice"]),
        col="o_totalprice"))


SQL_LORENZ_ASYMMETRY_PRICE = """
WITH f AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice > 0),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(v) AS BIGINT) AS s FROM f),
below AS (
  SELECT CAST(count(*) AS BIGINT) AS nb,
         CAST(coalesce(sum(f.v), 0) AS BIGINT) AS sb
  FROM f, tot WHERE f.v * tot.n < tot.s)
SELECT tot.n,
       round(CAST(below.nb AS DOUBLE) / tot.n
             + CAST(below.sb AS DOUBLE) / tot.s, 6) AS s,
       round(CAST(below.nb AS DOUBLE) / tot.n, 6) AS f_mu,
       round(CAST(below.sb AS DOUBLE) / tot.s, 6) AS l_mu
FROM tot, below
"""


QUERIES76: Dict[str, Callable] = {
    "boxcox_price": q_boxcox_price,
    "lorenz_asymmetry_price": q_lorenz_asymmetry_price,
}

SQL76: Dict[str, str] = {
    "boxcox_price": SQL_BOXCOX_PRICE,
    "lorenz_asymmetry_price": SQL_LORENZ_ASYMMETRY_PRICE,
}
