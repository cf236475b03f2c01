"""Driver-contract queries, batch 90 (see oracle.py for the contract):
Syntetos-Boylan intermittent-demand classification of parts.  Merged
into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_intermittency_parts(sf_dir: str):
    """Smooth/intermittent/erratic/lumpy census of parts' weekly
    shipped demand (stages/temporal.py :: intermittency_classes)."""
    from ..stages.temporal import intermittency_classes

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_shipdate", "l_quantity"])
    return _materialize(intermittency_classes(
        li, "l_shipdate", key_col="l_partkey", qty_col="l_quantity",
        period=7))


SQL_INTERMITTENCY_PARTS = """
WITH f AS (
  SELECT l_partkey AS k,
         CAST(floor(epoch(l_shipdate) / 86400) AS BIGINT) // 7 AS b,
         CAST(round(l_quantity * 100) AS BIGINT) AS q
  FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_shipdate IS NOT NULL
    AND l_quantity IS NOT NULL),
pb AS (SELECT k, b, CAST(sum(q) AS BIGINT) AS q
       FROM f GROUP BY 1, 2),
pk AS (
  SELECT k,
         CAST(max(b) - min(b) + 1 AS BIGINT) AS span,
         CAST(sum(CASE WHEN q > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS nd,
         CAST(sum(CASE WHEN q > 0 THEN q ELSE 0 END) AS BIGINT)
           AS s1,
         CAST(sum(CASE WHEN q > 0 THEN q * q ELSE 0 END) AS BIGINT)
           AS s2
  FROM pb GROUP BY k),
cls AS (
  SELECT CASE
           WHEN span * 100 <= 132 * nd
                AND 100 * (nd * s2 - s1 * s1) <= 49 * s1 * s1
             THEN 'smooth'
           WHEN span * 100 <= 132 * nd THEN 'erratic'
           WHEN 100 * (nd * s2 - s1 * s1) <= 49 * s1 * s1
             THEN 'intermittent'
           ELSE 'lumpy' END AS class
  FROM pk WHERE nd > 0),
ct AS (SELECT class, CAST(count(*) AS BIGINT) AS n_keys
       FROM cls GROUP BY class),
base AS (SELECT unnest(['erratic', 'intermittent', 'lumpy',
                        'smooth']) AS class),
tot AS (SELECT CAST(sum(n_keys) AS BIGINT) AS n FROM ct)
SELECT base.class,
       CAST(coalesce(ct.n_keys, 0) AS BIGINT) AS n_keys,
       round(coalesce(ct.n_keys, 0) / CAST(tot.n AS DOUBLE), 6)
         AS share
FROM base LEFT JOIN ct ON ct.class = base.class, tot
"""


QUERIES90: Dict[str, Callable] = {
    "intermittency_parts": q_intermittency_parts,
}

SQL90: Dict[str, str] = {
    "intermittency_parts": SQL_INTERMITTENCY_PARTS,
}
