"""Driver-contract queries, batch 40 (see oracle.py for the contract):
t-closeness privacy audit — per-market-segment earth mover's distance
between the segment's account-balance distribution and the global one
(completes the k-anonymity / l-diversity release-audit family).
Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_t_closeness_customer(sf_dir: str):
    """t-closeness of c_acctbal within c_mktsegment groups — exact 1-D
    EMD over sorted distinct cents values (stages/mlprep.py ::
    t_closeness)."""
    from ..stages.mlprep import t_closeness

    return _materialize(t_closeness(
        _read(sf_dir, "customer", ["c_mktsegment", "c_acctbal"]),
        qi_col="c_mktsegment", sensitive_col="c_acctbal"))


SQL_T_CLOSENESS_CUSTOMER = """
WITH f AS (
  SELECT c_mktsegment AS g,
         CAST(round(c_acctbal * 100) AS BIGINT) AS v
  FROM customer
  WHERE c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL),
cnts AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
         FROM f GROUP BY 1, 2),
vals AS (SELECT DISTINCT v FROM f),
grps AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY 1),
grid AS (SELECT grps.g, grps.n, vals.v FROM grps CROSS JOIN vals),
gc AS (
  SELECT grid.g, grid.n, grid.v, coalesce(cnts.c, 0) AS c
  FROM grid LEFT JOIN cnts ON grid.g = cnts.g AND grid.v = cnts.v),
cum AS (
  SELECT g, n, v,
         CAST(sum(c) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cg
  FROM gc),
gall AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM f GROUP BY 1),
cumall AS (
  SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS ca,
         CAST(lead(v) OVER (ORDER BY v) AS BIGINT) AS vn
  FROM gall),
na AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f)
SELECT cum.g AS c_mktsegment, cum.n AS n,
       sum(CASE WHEN cumall.vn IS NOT NULL THEN
             abs(CAST(cum.cg AS DOUBLE) / cum.n
                 - CAST(cumall.ca AS DOUBLE) / na.n)
             * (cumall.vn - cumall.v) ELSE 0.0 END) / 100.0 AS emd
FROM cum JOIN cumall USING (v) CROSS JOIN na
GROUP BY cum.g, cum.n
"""


QUERIES40: Dict[str, Callable] = {
    "t_closeness_customer": q_t_closeness_customer,
}

SQL40: Dict[str, str] = {
    "t_closeness_customer": SQL_T_CLOSENESS_CUSTOMER,
}
