"""Driver-contract queries, batch 74 (see oracle.py for the contract):
ECOD empirical-CDF multivariate outlier top-k over lineitem.  Merged
into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_ecod_lineitem(sf_dir: str):
    """Top-10 ECOD outliers over (quantity, extendedprice, discount)
    (stages/robust.py :: ecod_topk)."""
    from ..stages.robust import ecod_topk

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_quantity",
                "l_extendedprice", "l_discount"])
    return _materialize(ecod_topk(
        li, cols=["l_quantity", "l_extendedprice", "l_discount"],
        key_cols=["l_orderkey", "l_linenumber"], k=10))


def _dim_cte(col: str, alias: str) -> str:
    return f"""
vc_{alias} AS (
  SELECT CAST(round({col} * 100) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem WHERE {col} IS NOT NULL GROUP BY 1),
w_{alias} AS (
  SELECT v, cnt,
         CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum,
         CAST(sum(cnt) OVER () AS BIGINT) AS n
  FROM vc_{alias})"""


SQL_ECOD_LINEITEM = ("WITH " + ",".join([
    _dim_cte("l_quantity", "q").lstrip(),
    _dim_cte("l_extendedprice", "p").lstrip(),
    _dim_cte("l_discount", "d").lstrip(),
]) + """,
base AS (
  SELECT l_orderkey, l_linenumber,
         CAST(round(l_quantity * 100) AS BIGINT) AS xq,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS xp,
         CAST(round(l_discount * 100) AS BIGINT) AS xd
  FROM lineitem),
scored AS (
  SELECT b.l_orderkey, b.l_linenumber,
         (-ln(least(CAST(wq.cum AS DOUBLE) / wq.n,
                    CAST(wq.n - wq.cum + wq.cnt AS DOUBLE) / wq.n)))
         + (-ln(least(CAST(wp.cum AS DOUBLE) / wp.n,
                      CAST(wp.n - wp.cum + wp.cnt AS DOUBLE) / wp.n)))
         + (-ln(least(CAST(wd.cum AS DOUBLE) / wd.n,
                      CAST(wd.n - wd.cum + wd.cnt AS DOUBLE) / wd.n)))
           AS score
  FROM base b
  JOIN w_q wq ON wq.v = b.xq
  JOIN w_p wp ON wp.v = b.xp
  JOIN w_d wd ON wd.v = b.xd)
SELECT l_orderkey, l_linenumber, round(score, 6) AS score
FROM scored
ORDER BY score DESC, l_orderkey, l_linenumber
LIMIT 10
""")


QUERIES74: Dict[str, Callable] = {
    "ecod_lineitem": q_ecod_lineitem,
}

SQL74: Dict[str, str] = {
    "ecod_lineitem": SQL_ECOD_LINEITEM,
}
