"""Driver-contract queries, batch 88 (see oracle.py for the contract):
log-log demand elasticity across parts and the degree-Gini of
supplier fan-out.  Merged into ``oracle.queries()`` /
``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict

import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_elasticity_parts(sf_dir: str):
    """Cross-part log-log regression of shipped quantity on mean line
    price -- the demand-curve slope screen.  Exact integer per-part
    sums; OLS via the same n*sxy - sx*sy expression shape the SQL
    mirror uses (stages/window.py :: grouped_regression is the
    per-group sibling; this is ONE global fit over the part
    aggregate)."""
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice"])

    def units(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.and_(pc.is_valid(t.column("l_partkey")),
                             pc.is_valid(t.column("l_quantity"))),
                     pc.is_valid(t.column("l_extendedprice")))
        t = t.filter(ok)
        q = pc.cast(pc.round(pc.multiply(
            t.column("l_quantity"), 100.0)), pa.int64())
        p = pc.cast(pc.round(pc.multiply(
            t.column("l_extendedprice"), 100.0)), pa.int64())
        return pa.table({"k": t.column("l_partkey"), "q": q, "p": p,
                         "one": pa.array(
                             [1] * t.num_rows, pa.int64())})

    agg = li.map_batches(
        units, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("k").aggregate(Sum("q", alias_name="sq"),
                             Sum("p", alias_name="sp"),
                             Sum("one", alias_name="n"))

    def finalize(t: pa.Table) -> pa.Table:
        import numpy as np

        schema = pa.schema([("n_parts", pa.int64()),
                            ("slope", pa.float64()),
                            ("r2", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        sq = t.column("sq").to_numpy(zero_copy_only=False).astype(
            np.float64)
        sp = t.column("sp").to_numpy(zero_copy_only=False).astype(
            np.float64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.float64)
        ok = (sq > 0) & (sp > 0) & (n > 0)
        x = np.log(sp[ok] / n[ok] / 100.0)   # mean line price
        y = np.log(sq[ok] / 100.0)           # total quantity
        g = len(x)
        slope = r2 = None
        if g >= 2:
            gx, gy = x.sum(), y.sum()
            sxx = float(np.sum(x * x))
            sxy = float(np.sum(x * y))
            syy = float(np.sum(y * y))
            den = g * sxx - gx * gx
            if den > 0:
                b = (g * sxy - gx * gy) / den
                slope = round(b, 6)
                dy = g * syy - gy * gy
                if dy > 0:
                    r2 = round((g * sxy - gx * gy) ** 2
                               / (den * dy), 6)
        return pa.table({"n_parts": pa.array([g], pa.int64()),
                         "slope": pa.array([slope], pa.float64()),
                         "r2": pa.array([r2], pa.float64())})

    return _materialize(agg.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None))


SQL_ELASTICITY_PARTS = """
WITH f AS (
  SELECT l_partkey AS k,
         CAST(round(l_quantity * 100) AS BIGINT) AS q,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS p
  FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_quantity IS NOT NULL
    AND l_extendedprice IS NOT NULL),
agg AS (
  SELECT k, CAST(sum(q) AS BIGINT) AS sq,
         CAST(sum(p) AS BIGINT) AS sp,
         CAST(count(*) AS BIGINT) AS n
  FROM f GROUP BY k),
xy AS (
  SELECT ln(CAST(sp AS DOUBLE) / n / 100.0) AS x,
         ln(CAST(sq AS DOUBLE) / 100.0) AS y
  FROM agg WHERE sq > 0 AND sp > 0 AND n > 0),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS g,
         sum(x) AS gx, sum(y) AS gy,
         sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
  FROM xy)
SELECT g AS n_parts,
       CASE WHEN g >= 2 AND g * sxx - gx * gx > 0
            THEN round((g * sxy - gx * gy) / (g * sxx - gx * gx), 6)
       END AS slope,
       CASE WHEN g >= 2 AND g * sxx - gx * gx > 0
                 AND g * syy - gy * gy > 0
            THEN round((g * sxy - gx * gy) * (g * sxy - gx * gy)
                       / ((g * sxx - gx * gx)
                          * (g * syy - gy * gy)), 6)
       END AS r2
FROM s
"""


def q_degree_gini_suppliers(sf_dir: str):
    """Gini of distinct-part fan-out across suppliers
    (stages/graph.py :: degree_gini)."""
    from ray.data.aggregate import Count

    from ..stages.graph import degree_gini

    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])

    def clean(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column("l_suppkey")),
                     pc.is_valid(t.column("l_partkey")))
        return t.filter(ok)

    pairs = li.map_batches(
        clean, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(["l_suppkey", "l_partkey"]).aggregate(
        Count(alias_name="_"))
    return _materialize(degree_gini(
        pairs, node_col="l_suppkey", other_col="l_partkey"))


SQL_DEGREE_GINI_SUPPLIERS = """
WITH d AS (
  SELECT l_suppkey, CAST(count(DISTINCT l_partkey) AS BIGINT) AS deg
  FROM lineitem
  WHERE l_suppkey IS NOT NULL AND l_partkey IS NOT NULL
  GROUP BY l_suppkey),
r AS (SELECT deg, row_number() OVER (ORDER BY deg) AS i FROM d),
a AS (SELECT CAST(sum(i * deg) AS BIGINT) AS rw,
             CAST(sum(deg) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM r)
SELECT n AS n_nodes,
       CASE WHEN n > 0 AND s > 0
            THEN round(2.0 * rw / (CAST(n AS DOUBLE) * s)
                       - (n + 1.0) / n, 6)
       END AS gini
FROM a
"""


QUERIES88: Dict[str, Callable] = {
    "elasticity_parts": q_elasticity_parts,
    "degree_gini_suppliers": q_degree_gini_suppliers,
}

SQL88: Dict[str, str] = {
    "elasticity_parts": SQL_ELASTICITY_PARTS,
    "degree_gini_suppliers": SQL_DEGREE_GINI_SUPPLIERS,
}
