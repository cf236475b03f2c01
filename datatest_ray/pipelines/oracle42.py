"""Driver-contract queries, batch 42 (see oracle.py for the contract):
BFS hop levels over the supplier-part co-purchase graph (recursive-CTE
oracle) and degree assortativity of the same graph (exact integer
moments, corr formula mirrored op-for-op).  Merged into
``oracle.queries()`` / ``oracle.oracle_sql()``."""

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


_PART_OFFSET = 1_000_000  # part node ids live above every suppkey


def _supp_part_edges(sf_dir: str):
    """Distinct (supplier, part+OFFSET) bipartite edges from lineitem —
    dedup is one groupby over the pair (per-batch distinct combiner
    keeps the shuffle at the distinct-pair size, not the fact size)."""
    import numpy as np

    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])

    def pairs(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column("l_suppkey")),
                     pc.is_valid(t.column("l_partkey")))
        t = t.filter(ok)
        u = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        v = t.column("l_partkey").to_numpy(zero_copy_only=False)
        uv = np.unique(  # per-batch distinct combiner
            np.stack([u.astype(np.int64),
                      v.astype(np.int64) + _PART_OFFSET], axis=1), axis=0)
        return pa.table({"u": pa.array(uv[:, 0]), "v": pa.array(uv[:, 1])})

    from ray.data.aggregate import Count

    return (li.map_batches(pairs, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["u", "v"]).aggregate(Count(alias_name="c"))
            .select_columns(["u", "v"]))


def q_bfs_supplier_graph(sf_dir: str):
    """BFS levels from the minimum supplier node over the symmetrized
    supplier-part graph, capped at 6 hops (stages/graph.py ::
    bfs_levels)."""
    import numpy as np

    from ..stages.graph import bfs_levels

    edges = _supp_part_edges(sf_dir).materialize()
    src = edges.min("u")

    def sym(t: pa.Table) -> pa.Table:
        a = t.column("u").to_numpy(zero_copy_only=False)
        b = t.column("v").to_numpy(zero_copy_only=False)
        return pa.table({"u": pa.array(np.concatenate([a, b])),
                         "v": pa.array(np.concatenate([b, a]))})

    sym_ds = edges.map_batches(sym, batch_format="pyarrow",
                               zero_copy_batch=True)
    return _materialize(bfs_levels(sym_ds, src_col="u", dst_col="v",
                                   source=int(src), max_hops=6))


SQL_BFS_SUPPLIER_GRAPH = """
WITH RECURSIVE e AS (
  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS u,
         CAST(l_partkey AS BIGINT) + 1000000 AS v
  FROM lineitem
  WHERE l_suppkey IS NOT NULL AND l_partkey IS NOT NULL),
sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
src AS (SELECT min(u) AS s FROM e),
walk AS (
  SELECT s AS node, 0 AS level FROM src
  UNION
  SELECT sym.v AS node, walk.level + 1 AS level
  FROM walk JOIN sym ON sym.u = walk.node
  WHERE walk.level < 6)
SELECT CAST(node AS BIGINT) AS node,
       CAST(min(level) AS BIGINT) AS level
FROM walk GROUP BY 1
"""


def q_assortativity_supp_part(sf_dir: str):
    """Degree assortativity of the supplier-part graph (stages/graph.py
    :: degree_assortativity) — bipartite graphs are disassortative when
    the two sides' degree scales differ."""
    from ..stages.graph import degree_assortativity

    return degree_assortativity(_supp_part_edges(sf_dir),
                                src_col="u", dst_col="v")


SQL_ASSORTATIVITY_SUPP_PART = """
WITH e AS (
  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS u,
         CAST(l_partkey AS BIGINT) + 1000000 AS v
  FROM lineitem
  WHERE l_suppkey IS NOT NULL AND l_partkey IS NOT NULL),
sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d
        FROM sym GROUP BY 1),
xy AS (SELECT du.d AS x, dv.d AS y
       FROM sym
       JOIN deg du ON du.node = sym.u
       JOIN deg dv ON dv.node = sym.v),
s AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM xy)
SELECT n AS n_edges_directed,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
         AS assortativity
FROM s
"""


QUERIES42: Dict[str, Callable] = {
    "bfs_supplier_graph": q_bfs_supplier_graph,
    "assortativity_supp_part": q_assortativity_supp_part,
}

SQL42: Dict[str, str] = {
    "bfs_supplier_graph": SQL_BFS_SUPPLIER_GRAPH,
    "assortativity_supp_part": SQL_ASSORTATIVITY_SUPP_PART,
}
