"""Driver-contract queries, batch 39 (see oracle.py for the contract):
exact distributed L-moments of the extended-price distribution —
probability-weighted big-integer sums with hockey-stick tie handling,
mirrored in SQL via cumulative counts and integer binomial terms.
Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_lmoments_price(sf_dir: str):
    """L-moments (λ1, L-scale, L-CV, L-skew, L-kurtosis) of
    l_extendedprice — exact big-int probability-weighted sums
    (stages/stattests.py :: lmoments)."""
    from ..stages.stattests import lmoments

    return _materialize(lmoments(
        _read(sf_dir, "lineitem", ["l_extendedprice"]),
        value_col="l_extendedprice"))


SQL_LMOMENTS_PRICE = """
WITH f AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
  FROM lineitem WHERE l_extendedprice IS NOT NULL),
pts AS (SELECT c AS v, CAST(count(*) AS BIGINT) AS cnt
        FROM f GROUP BY 1),
r AS (SELECT CAST(v AS HUGEINT) AS v,
             CAST(sum(cnt) OVER (ORDER BY v) AS HUGEINT) AS hi,
             CAST(sum(cnt) OVER (ORDER BY v) - cnt AS HUGEINT) AS lo1
      FROM pts),
s AS (
  SELECT
    CAST(sum((hi - lo1) * v) AS HUGEINT) AS s0,
    CAST(sum((hi * (hi - 1) // 2
              - lo1 * (lo1 - 1) // 2) * v) AS HUGEINT) AS s1,
    CAST(sum((hi * (hi - 1) * (hi - 2) // 6
              - lo1 * (lo1 - 1) * (lo1 - 2) // 6) * v)
         AS HUGEINT) AS s2,
    CAST(sum((hi * (hi - 1) * (hi - 2) * (hi - 3) // 24
              - lo1 * (lo1 - 1) * (lo1 - 2) * (lo1 - 3) // 24) * v)
         AS HUGEINT) AS s3,
    CAST(max(hi) AS BIGINT) AS n
  FROM r),
b AS (
  SELECT n,
         CAST(s0 AS DOUBLE) / n AS b0,
         CAST(s1 AS DOUBLE)
           / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE) AS b1,
         CAST(s2 AS DOUBLE)
           / CAST(CAST(n AS HUGEINT)
                  * ((n - 1) * (n - 2) // 2) AS DOUBLE) AS b2,
         CAST(s3 AS DOUBLE)
           / CAST(CAST(n AS HUGEINT)
                  * (CAST(n - 1 AS HUGEINT) * (n - 2) * (n - 3) // 6)
             AS DOUBLE) AS b3
  FROM s WHERE n >= 4),
l AS (
  SELECT n, b0 / 100.0 AS l1,
         (2.0 * b1 - b0) / 100.0 AS l2,
         (6.0 * b2 - 6.0 * b1 + b0) / 100.0 AS l3,
         (20.0 * b3 - 30.0 * b2 + 12.0 * b1 - b0) / 100.0 AS l4
  FROM b)
SELECT n, l1, l2,
       CASE WHEN l1 <> 0 THEN l2 / l1 END AS t,
       CASE WHEN l2 <> 0 THEN l3 / l2 END AS t3,
       CASE WHEN l2 <> 0 THEN l4 / l2 END AS t4
FROM l
"""


QUERIES39: Dict[str, Callable] = {
    "lmoments_price": q_lmoments_price,
}

SQL39: Dict[str, str] = {
    "lmoments_price": SQL_LMOMENTS_PRICE,
}
