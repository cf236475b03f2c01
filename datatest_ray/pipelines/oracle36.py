"""Driver-contract queries, batch 36 (see oracle.py for the contract):
Page's L within-subject ordered trend test (blocked ranks scored
against the priority ordering) and Somers' D asymmetric ordinal
association between quantity and discount.  Merged into
``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict

import pyarrow as pa
import pyarrow.compute as pc

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
              "5-LOW"]


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


# ---------------------------------------------------------------------------
# Page's L: per-customer order value across priority tiers
# ---------------------------------------------------------------------------


def q_pages_l_customer(sf_dir: str):
    """Page's L over customers with orders in ALL five priority tiers:
    does each customer's mean order value rise along the tier order?
    (stages/stattests.py :: pages_l_test)."""
    from ..stages.stattests import pages_l_test

    return _materialize(pages_l_test(
        _read(sf_dir, "orders",
              ["o_custkey", "o_orderpriority", "o_totalprice"]),
        subject_col="o_custkey", treatment_col="o_orderpriority",
        ordered_treatments=PRIORITIES, value_col="o_totalprice"))


SQL_PAGES_L_CUSTOMER = """
WITH m AS (
  SELECT o_custkey AS s,
         CASE o_orderpriority
           WHEN '1-URGENT' THEN 0 WHEN '2-HIGH' THEN 1
           WHEN '3-MEDIUM' THEN 2 WHEN '4-NOT SPECIFIED' THEN 3
           WHEN '5-LOW' THEN 4 END AS code,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS sc,
         CAST(count(*) AS BIGINT) AS c
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
    AND o_orderpriority IN
      ('1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')
  GROUP BY 1, 2),
full_s AS (SELECT s FROM m GROUP BY s HAVING count(*) = 5),
d AS (
  SELECT m.s, m.code, CAST(sc AS DOUBLE) / c AS d
  FROM m JOIN full_s USING (s)),
r AS (
  SELECT s, code,
         CAST(rank() OVER (PARTITION BY s ORDER BY d) AS BIGINT) AS rmin,
         CAST(count(*) OVER (PARTITION BY s, d) AS BIGINT) AS ties
  FROM d),
rr AS (SELECT s, code, 2 * rmin + ties - 1 AS r2 FROM r),
agg AS (
  SELECT CAST(sum((code + 1) * r2) AS BIGINT) AS l2,
         CAST(count(DISTINCT s) AS BIGINT) AS n
  FROM rr)
SELECT n AS n_subjects, 5 AS k,
       CASE WHEN n > 0 THEN l2 / 2.0 END AS l,
       CASE WHEN n > 0 THEN
         (l2 / 2.0 - n * 5 * 36 / 4.0)
           / sqrt(n * 14400 / (144.0 * 4)) END AS z
FROM agg
"""


# ---------------------------------------------------------------------------
# Somers' D: quantity band vs discount band
# ---------------------------------------------------------------------------


def q_somers_qty_disc(sf_dir: str):
    """Somers' d_yx / d_xy between l_quantity (x) and the discount
    percent band (y) — asymmetric ordinal association
    (stages/stattests.py :: somers_d)."""
    from ..stages.stattests import somers_d

    li = _read(sf_dir, "lineitem", ["l_quantity", "l_discount"])

    def bands(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column("l_quantity")),
                     pc.is_valid(t.column("l_discount")))
        t = t.filter(ok)
        return pa.table({
            "i": pc.cast(pc.round(t.column("l_quantity")), pa.int64()),
            "j": pc.cast(pc.round(pc.multiply(
                t.column("l_discount"), 100.0)), pa.int64()),
        })

    ds = li.map_batches(bands, batch_format="pyarrow",
                        zero_copy_batch=True)
    return _materialize(somers_d(ds, i_col="i", j_col="j"))


SQL_SOMERS_QTY_DISC = """
WITH f AS (
  SELECT CAST(round(l_quantity) AS BIGINT) AS i,
         CAST(round(l_discount * 100) AS BIGINT) AS j
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL),
cells AS (SELECT i, j, CAST(count(*) AS BIGINT) AS n
          FROM f GROUP BY 1, 2),
p AS (
  SELECT
    CAST(coalesce(sum(a.n * b.n) FILTER (a.i > b.i AND a.j > b.j), 0)
         AS BIGINT) AS c_pairs,
    CAST(coalesce(sum(a.n * b.n) FILTER (a.i > b.i AND a.j < b.j), 0)
         AS BIGINT) AS d_pairs,
    CAST(coalesce(sum(a.n * b.n) FILTER (a.i = b.i AND a.j > b.j), 0)
         AS BIGINT) AS t_x,
    CAST(coalesce(sum(a.n * b.n) FILTER (a.i > b.i AND a.j = b.j), 0)
         AS BIGINT) AS t_y
  FROM cells a CROSS JOIN cells b)
SELECT c_pairs, d_pairs, t_x, t_y,
       CASE WHEN c_pairs + d_pairs + t_y > 0 THEN
         CAST(c_pairs - d_pairs AS DOUBLE)
           / CAST(c_pairs + d_pairs + t_y AS DOUBLE) END AS d_yx,
       CASE WHEN c_pairs + d_pairs + t_x > 0 THEN
         CAST(c_pairs - d_pairs AS DOUBLE)
           / CAST(c_pairs + d_pairs + t_x AS DOUBLE) END AS d_xy
FROM p
"""


QUERIES36: Dict[str, Callable] = {
    "pages_l_customer": q_pages_l_customer,
    "somers_qty_disc": q_somers_qty_disc,
}

SQL36: Dict[str, str] = {
    "pages_l_customer": SQL_PAGES_L_CUSTOMER,
    "somers_qty_disc": SQL_SOMERS_QTY_DISC,
}
