"""Driver-contract queries, batch 15 (see oracle.py for the contract):
the remaining TPC-H-shaped relational pipelines adapted to the testdata
schema — Q4 (exists-style late-shipping priority counts), Q6 (forecast
revenue delta), Q7 (bi-national shipping volume), Q9 (profit by nation
and year), Q10 (returned-item top customers), Q13 (customer order-count
distribution), Q15 (top supplier of a quarter), Q17 (small-quantity
revenue vs 0.2x per-part average), Q19 (disjunctive brand/size/quantity
revenue), Q22 (idle high-balance customers).  Money math is exact on
both sides: prices/balances in integer cents, discounts in integer
basis points, so `price_c * (100 - disc_bp)` is an int64 the SQL oracle
reproduces verbatim — no float-rounding-mode hazard.  Merged into
``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from datetime import datetime
from typing import Callable, Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def _cents(col) -> pa.Array:
    """Exact integer cents from a 2-decimal money double (the *100
    product is never near .5, so rounding mode cannot matter)."""
    return pc.cast(pc.round(pc.multiply(col, 100.0)), pa.int64())


def _bp(col) -> pa.Array:
    """Integer basis points (x100) from a 2-decimal rate double."""
    return pc.cast(pc.round(pc.multiply(col, 100.0)), pa.int64())


def _rev_numer(t: pa.Table) -> pa.Array:
    """price * (1 - discount) as an EXACT int64 in 1e-4 dollars."""
    return pc.multiply(
        _cents(t.column("l_extendedprice")),
        pc.subtract(pa.scalar(100, pa.int64()), _bp(t.column("l_discount"))),
    )


# ---------------------------------------------------------------------------
# Q6 shape: forecast revenue change (filter + global aggregate)
# ---------------------------------------------------------------------------

_Q6_LO = datetime(1997, 1, 1)
_Q6_HI = datetime(1998, 1, 1)


def q_q6_discount_revenue(sf_dir: str):
    """TPC-H Q6 adapted: total `price*discount` revenue give-back for
    1997 shipments with discount in [0.02, 0.04] and quantity < 24.
    Columns+rows pruned at the read edge, per-batch exact integer
    numerators, one tiny global aggregate — no shuffle at all."""
    from ray.data.aggregate import Count, Sum

    li = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_discount", "l_quantity",
                "l_extendedprice"])

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.greater_equal(t.column("l_shipdate"),
                                     pa.scalar(_Q6_LO)),
                    pc.less(t.column("l_shipdate"), pa.scalar(_Q6_HI))),
            pc.and_(
                pc.and_(pc.greater_equal(t.column("l_discount"),
                                         pa.scalar(0.02)),
                        pc.less_equal(t.column("l_discount"),
                                      pa.scalar(0.04))),
                pc.less(t.column("l_quantity"), pa.scalar(24.0))),
        )
        t = t.filter(m)
        numer = pc.multiply(_cents(t.column("l_extendedprice")),
                            _bp(t.column("l_discount")))
        return pa.table({"numer": numer})

    ds = li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    row = ds.aggregate(Sum("numer", alias_name="numer_sum"),
                       Count(alias_name="n_items"))
    s = row["numer_sum"]
    # typed float64 even when the filter matched nothing (NULL sum)
    return pa.table({
        "revenue": pa.array(
            [None if s is None else float(s) / 10000.0], pa.float64()),
        "n_items": pa.array([row["n_items"]], pa.int64()),
    })


SQL_Q6_DISCOUNT_REVENUE = """
SELECT
  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
    / 10000.0 AS revenue,
  CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.04
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Q4 shape: order-priority checking (EXISTS a late-shipping lineitem)
# ---------------------------------------------------------------------------

_Q4_LATE_US = 90 * 86400 * 1_000_000  # 90 days in microseconds


def q_q4_order_priority(sf_dir: str):
    """TPC-H Q4 adapted (no commitdate column): per order priority, how
    many orders have at least one lineitem that shipped more than 90
    days after the order date.  Plan: one partitioned hash join
    lineitem⋈orders (only 3 narrow columns of each side move), the
    late-ship predicate on exact µs int64 timestamps, then distinct
    (orderkey, priority) via groupby Count and a 5-group recount —
    the EXISTS never materializes per-order lists."""
    from ray.data.aggregate import Count

    from ..stages.relational import safe_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])
    j = safe_join(li, orders, join_type="inner", num_partitions=8,
                  on=("l_orderkey",), right_on=("o_orderkey",))

    def late(t: pa.Table) -> pa.Table:
        ship = pc.cast(t.column("l_shipdate"), pa.int64())
        odate = pc.cast(t.column("o_orderdate"), pa.int64())
        keep = pc.greater(pc.subtract(ship, odate),
                          pa.scalar(_Q4_LATE_US, pa.int64()))
        t = t.filter(keep)
        return pa.table({
            "l_orderkey": t.column("l_orderkey"),
            "o_orderpriority": t.column("o_orderpriority"),
        })

    j = j.map_batches(late, batch_format="pyarrow", zero_copy_batch=True)
    per_order = j.groupby(["o_orderpriority", "l_orderkey"]).aggregate(
        Count(alias_name="n_lines"))
    agg = per_order.groupby("o_orderpriority").aggregate(
        Count(alias_name="n_orders"))
    t = _materialize(agg, empty_schema=pa.schema(
        [("o_orderpriority", pa.string()), ("n_orders", pa.int64())]))
    return t.select(["o_orderpriority", "n_orders"])


SQL_Q4_ORDER_PRIORITY = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q7 shape: volume shipping between two nations, by direction and year
# ---------------------------------------------------------------------------

_Q7_A = "NATION_19"
_Q7_B = "NATION_11"
_Q7_LO = datetime(1997, 1, 1)
_Q7_HI = datetime(1999, 1, 1)


def q_q7_nation_volume(sf_dir: str):
    """TPC-H Q7 adapted: revenue shipped between NATION_1 suppliers and
    NATION_2 customers (both directions) per ship year, 1997-1998.
    Plan: nation⋈supplier and nation⋈customer are dimension lookups
    broadcast via ``ray.put`` (no shuffle); each side filters to the
    two nations BEFORE the single fact-fact hash join
    lineitem⋈orders; the final groupby has at most 2x2xyears groups."""
    from ray.data.aggregate import Sum

    from ..stages.relational import broadcast_join, safe_join

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    supp = broadcast_join(
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        nation, on="s_nationkey", right_on="n_nationkey",
        right_cols=["n_name"], how="inner")
    cust = broadcast_join(
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        nation, on="c_nationkey", right_on="n_nationkey",
        right_cols=["n_name"], how="inner")

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount", "l_shipdate"])

    def prep_li(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t.column("l_shipdate"), pa.scalar(_Q7_LO)),
            pc.less(t.column("l_shipdate"), pa.scalar(_Q7_HI)))
        t = t.filter(keep)
        return pa.table({
            "l_orderkey": t.column("l_orderkey"),
            "l_suppkey": t.column("l_suppkey"),
            "l_year": pc.cast(pc.year(t.column("l_shipdate")), pa.int64()),
            "numer": _rev_numer(t),
        })

    li = li.map_batches(prep_li, batch_format="pyarrow",
                        zero_copy_batch=True)
    li = broadcast_join(li, supp, on="l_suppkey", right_on="s_suppkey",
                        right_cols=["n_name"], how="inner")

    def keep_supp(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t.column("n_name"),
                              value_set=pa.array([_Q7_A, _Q7_B])))
        return t.rename_columns(
            [{"n_name": "supp_nation"}.get(c, c) for c in t.column_names])

    li = li.map_batches(keep_supp, batch_format="pyarrow",
                        zero_copy_batch=True)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    orders = broadcast_join(orders, cust, on="o_custkey",
                            right_on="c_custkey",
                            right_cols=["n_name"], how="inner")

    def keep_cust(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t.column("n_name"),
                              value_set=pa.array([_Q7_A, _Q7_B])))
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "cust_nation": t.column("n_name")})

    orders = orders.map_batches(keep_cust, batch_format="pyarrow",
                                zero_copy_batch=True)
    j = safe_join(li, orders, join_type="inner", num_partitions=8,
                  on=("l_orderkey",), right_on=("o_orderkey",))

    def cross_only(t: pa.Table) -> pa.Table:
        a = pc.and_(pc.equal(t.column("supp_nation"), pa.scalar(_Q7_A)),
                    pc.equal(t.column("cust_nation"), pa.scalar(_Q7_B)))
        b = pc.and_(pc.equal(t.column("supp_nation"), pa.scalar(_Q7_B)),
                    pc.equal(t.column("cust_nation"), pa.scalar(_Q7_A)))
        return t.filter(pc.or_(a, b))

    j = j.map_batches(cross_only, batch_format="pyarrow",
                      zero_copy_batch=True)
    agg = j.groupby(["supp_nation", "cust_nation", "l_year"]).aggregate(
        Sum("numer", alias_name="numer_sum"))
    t = _materialize(agg, empty_schema=pa.schema(
        [("supp_nation", pa.string()), ("cust_nation", pa.string()),
         ("l_year", pa.int64()), ("numer_sum", pa.int64())]))
    return pa.table({
        "supp_nation": t.column("supp_nation"),
        "cust_nation": t.column("cust_nation"),
        "l_year": t.column("l_year"),
        "revenue": pc.divide(pc.cast(t.column("numer_sum"), pa.float64()),
                             10000.0),
    })


SQL_Q7_NATION_VOLUME = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_11')
    OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_19'))
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1999-01-01'
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q9 shape: profit by supplier nation and ship year
# ---------------------------------------------------------------------------


def q_q9_profit_by_nation(sf_dir: str):
    """TPC-H Q9 adapted (no partsupp: part.p_retailprice stands in for
    supplycost): per supplier nation and ship year,
    sum(price*(1-disc) - retailprice*quantity).  Both dimension hops
    (part, supplier→nation) are ray.put broadcasts; the fact table
    streams through one map_batches and one small groupby — zero
    fact-fact shuffles."""
    from ray.data.aggregate import Sum

    from ..stages.relational import broadcast_join

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    supp = broadcast_join(
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        nation, on="s_nationkey", right_on="n_nationkey",
        right_cols=["n_name"], how="inner")
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity",
                "l_extendedprice", "l_discount", "l_shipdate"])
    li = broadcast_join(li, _read(sf_dir, "part",
                                  ["p_partkey", "p_retailprice"]),
                        on="l_partkey", right_on="p_partkey",
                        right_cols=["p_retailprice"], how="inner")
    li = broadcast_join(li, supp, on="l_suppkey", right_on="s_suppkey",
                        right_cols=["n_name"], how="inner")

    def prep(t: pa.Table) -> pa.Table:
        cost = pc.multiply(
            pc.multiply(_cents(t.column("p_retailprice")),
                        pc.cast(t.column("l_quantity"), pa.int64())),
            pa.scalar(100, pa.int64()))
        return pa.table({
            "nation": t.column("n_name"),
            "o_year": pc.cast(pc.year(t.column("l_shipdate")), pa.int64()),
            "numer": pc.subtract(_rev_numer(t), cost),
        })

    ds = li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    agg = ds.groupby(["nation", "o_year"]).aggregate(
        Sum("numer", alias_name="numer_sum"))
    t = _materialize(agg, empty_schema=pa.schema(
        [("nation", pa.string()), ("o_year", pa.int64()),
         ("numer_sum", pa.int64())]))
    return pa.table({
        "nation": t.column("nation"),
        "o_year": t.column("o_year"),
        "profit": pc.divide(pc.cast(t.column("numer_sum"), pa.float64()),
                            10000.0),
    })


SQL_Q9_PROFIT_BY_NATION = """
SELECT n_name AS nation,
       CAST(year(l_shipdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))
                - CAST(round(p_retailprice * 100) AS BIGINT)
                  * CAST(l_quantity AS BIGINT) * 100)
            AS DOUBLE) / 10000.0 AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q10 shape: returned-item revenue, top 20 customers
# ---------------------------------------------------------------------------

_Q10_LO = datetime(1997, 7, 1)
_Q10_HI = datetime(1997, 10, 1)


def q_q10_returned_revenue(sf_dir: str):
    """TPC-H Q10 adapted: top 20 customers by revenue of RETURNED
    ('R') lineitems against Q3-1997 orders.  Both fact sides prune
    rows+columns at the read edge before the one hash join; customer
    attributes attach by broadcast AFTER the per-customer aggregate
    (the dimension hop touches ≤|customers| aggregated rows, not the
    fact table).  Sort runs on the exact int64 numerator."""
    from ray.data.aggregate import Sum

    from ..stages.relational import broadcast_join, safe_join

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_extendedprice",
                "l_discount"])

    def prep_li(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("l_returnflag"), pa.scalar("R")))
        return pa.table({"l_orderkey": t.column("l_orderkey"),
                         "numer": _rev_numer(t)})

    li = li.map_batches(prep_li, batch_format="pyarrow",
                        zero_copy_batch=True)
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])

    def prep_orders(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t.column("o_orderdate"), pa.scalar(_Q10_LO)),
            pc.less(t.column("o_orderdate"), pa.scalar(_Q10_HI)))
        t = t.filter(keep)
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "o_custkey": t.column("o_custkey")})

    orders = orders.map_batches(prep_orders, batch_format="pyarrow",
                                zero_copy_batch=True)
    j = safe_join(li, orders, join_type="inner", num_partitions=8,
                  on=("l_orderkey",), right_on=("o_orderkey",))
    agg = j.groupby("o_custkey").aggregate(
        Sum("numer", alias_name="numer_sum"))
    top = agg.sort(["numer_sum", "o_custkey"],
                   descending=[True, False]).limit(20)
    top = broadcast_join(
        top, _read(sf_dir, "customer",
                   ["c_custkey", "c_name", "c_acctbal", "c_nationkey"]),
        on="o_custkey", right_on="c_custkey",
        right_cols=["c_name", "c_acctbal", "c_nationkey"], how="inner")
    t = _materialize(top, empty_schema=pa.schema(
        [("o_custkey", pa.int64()), ("numer_sum", pa.int64()),
         ("c_name", pa.string()), ("c_acctbal", pa.float64()),
         ("c_nationkey", pa.int32())]))
    return pa.table({
        "c_custkey": t.column("o_custkey"),
        "c_name": t.column("c_name"),
        "revenue": pc.divide(pc.cast(t.column("numer_sum"), pa.float64()),
                             10000.0),
        "c_acctbal": t.column("c_acctbal"),
        "c_nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
    })


SQL_Q10_RETURNED_REVENUE = """
SELECT c_custkey, c_name,
       CAST(numer_sum AS DOUBLE) / 10000.0 AS revenue,
       c_acctbal, CAST(c_nationkey AS BIGINT) AS c_nationkey
FROM (
  SELECT o_custkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT)))
           AS numer_sum
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1997-07-01'
    AND o_orderdate < TIMESTAMP '1997-10-01'
  GROUP BY o_custkey
  ORDER BY numer_sum DESC, o_custkey
  LIMIT 20) t
JOIN customer ON c_custkey = o_custkey
"""


# ---------------------------------------------------------------------------
# Q13 shape: distribution of customers by order count
# ---------------------------------------------------------------------------


def q_q13_order_count_dist(sf_dir: str):
    """TPC-H Q13 adapted: how many customers placed k orders, for each
    k (including k=0).  Per-customer counts come from ONE groupby on
    orders; zero-order customers attach via a LEFT broadcast lookup of
    the aggregated counts onto the customer key column — the second
    groupby has at most max-k groups.  Partitioning note: the
    aggregated per-customer count table is |customers|-sized; at
    10^12-fact scale swap the broadcast for a safe_join left join
    (same semantics, one extra shuffle)."""
    from ray.data.aggregate import Count

    from ..stages.relational import broadcast_join

    per_cust = _read(sf_dir, "orders",
                     ["o_custkey"]).groupby("o_custkey").aggregate(
        Count(alias_name="c_count"))
    cust = _read(sf_dir, "customer", ["c_custkey"])
    cust = broadcast_join(cust, per_cust, on="c_custkey",
                          right_on="o_custkey",
                          right_cols=["c_count"], how="left")

    def fill0(t: pa.Table) -> pa.Table:
        return pa.table({"c_count": pc.coalesce(
            pc.cast(t.column("c_count"), pa.int64()),
            pa.scalar(0, pa.int64()))})

    dist = cust.map_batches(fill0, batch_format="pyarrow",
                            zero_copy_batch=True)
    agg = dist.groupby("c_count").aggregate(Count(alias_name="custdist"))
    t = _materialize(agg, empty_schema=pa.schema(
        [("c_count", pa.int64()), ("custdist", pa.int64())]))
    return t.select(["c_count", "custdist"])


SQL_Q13_ORDER_COUNT_DIST = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey) t
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# Q15 shape: top supplier of a quarter
# ---------------------------------------------------------------------------

_Q15_LO = datetime(1997, 1, 1)
_Q15_HI = datetime(1997, 4, 1)


def q_q15_top_supplier(sf_dir: str):
    """TPC-H Q15 adapted: the supplier(s) with the maximum revenue in
    Q1-1997.  Per-supplier revenue is one groupby over exact int64
    numerators; the max is taken over the (≤|suppliers|) aggregate and
    broadcast back as a filter, so ties surface exactly like the SQL
    `= (SELECT max(...))` — no ORDER BY/LIMIT tie hazard."""
    from ray.data.aggregate import Sum

    from ..stages.relational import broadcast_join

    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_extendedprice", "l_discount",
                "l_shipdate"])

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t.column("l_shipdate"), pa.scalar(_Q15_LO)),
            pc.less(t.column("l_shipdate"), pa.scalar(_Q15_HI)))
        t = t.filter(keep)
        return pa.table({"l_suppkey": t.column("l_suppkey"),
                         "numer": _rev_numer(t)})

    rev = li.map_batches(prep, batch_format="pyarrow",
                         zero_copy_batch=True)
    agg = rev.groupby("l_suppkey").aggregate(
        Sum("numer", alias_name="numer_sum"))
    best = agg.max("numer_sum")

    def keep_max(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("numer_sum"),
                                 pa.scalar(best, pa.int64())))

    top = agg.map_batches(keep_max, batch_format="pyarrow",
                          zero_copy_batch=True)
    top = broadcast_join(top, _read(sf_dir, "supplier",
                                    ["s_suppkey", "s_name"]),
                         on="l_suppkey", right_on="s_suppkey",
                         right_cols=["s_name"], how="inner")
    t = _materialize(top, empty_schema=pa.schema(
        [("l_suppkey", pa.int64()), ("numer_sum", pa.int64()),
         ("s_name", pa.string())]))
    return pa.table({
        "s_suppkey": t.column("l_suppkey"),
        "s_name": t.column("s_name"),
        "total_revenue": pc.divide(
            pc.cast(t.column("numer_sum"), pa.float64()), 10000.0),
    })


SQL_Q15_TOP_SUPPLIER = """
WITH revenue AS (
  SELECT l_suppkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT)))
           AS numer_sum
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name,
       CAST(numer_sum AS DOUBLE) / 10000.0 AS total_revenue
FROM revenue JOIN supplier ON s_suppkey = l_suppkey
WHERE numer_sum = (SELECT max(numer_sum) FROM revenue)
"""


# ---------------------------------------------------------------------------
# Q17 shape: small-quantity revenue vs 0.2x the per-part average
# ---------------------------------------------------------------------------

_Q17_BRAND = "Brand#4"


def q_q17_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 adapted: average yearly revenue lost if Brand#4 orders
    below 0.2x the part's average quantity were not filled.  The
    per-part quantity average is ONE groupby over the brand-filtered
    fact rows (the brand's partkey set broadcasts as an inner lookup),
    then broadcasts back as a (sum, count) pair so the threshold
    compare `qty < 0.2*(sum/cnt)` is bit-identical to SQL AVG."""
    from ray.data.aggregate import Count, Sum

    from ..stages.relational import broadcast_join

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"])
    part = part.filter(expr=f"p_brand == '{_Q17_BRAND}'").select_columns(
        ["p_partkey"])
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice"])
    li = broadcast_join(li, part, on="l_partkey", right_on="p_partkey",
                        right_cols=[], how="inner")

    def add_nonnull(t: pa.Table) -> pa.Table:
        # SQL AVG/count(col) skip NULL quantities; a bare row Count
        # would divide by too many rows on null-bearing data
        return t.append_column("qty_nn", pc.cast(
            pc.is_valid(t.column("l_quantity")), pa.int64()))

    li = li.map_batches(add_nonnull, batch_format="pyarrow",
                        zero_copy_batch=True)
    per_part = li.groupby("l_partkey").aggregate(
        Sum("l_quantity", alias_name="qty_sum"),
        Sum("qty_nn", alias_name="qty_cnt"))
    li = broadcast_join(li, per_part, on="l_partkey",
                        right_on="l_partkey",
                        right_cols=["qty_sum", "qty_cnt"], how="inner")

    def prep(t: pa.Table) -> pa.Table:
        avg = pc.divide(pc.cast(t.column("qty_sum"), pa.float64()),
                        pc.cast(t.column("qty_cnt"), pa.float64()))
        thr = pc.multiply(pa.scalar(0.2), avg)
        t = t.filter(pc.less(t.column("l_quantity"), thr))
        return pa.table({"price_c": _cents(t.column("l_extendedprice"))})

    ds = li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    row = ds.aggregate(Sum("price_c", alias_name="price_sum"))
    s = row["price_sum"]
    # typed float64 even when NULL: a bare [None] would make a
    # null-typed column that compares unequal to SQL's float NaN
    return pa.table({"avg_yearly": pa.array(
        [None if s is None else float(s) / 100.0 / 7.0], pa.float64())})


SQL_Q17_SMALL_QTY_REVENUE = """
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
         / 100.0 / 7.0 AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#4'
  AND l_quantity < (
    SELECT 0.2 * (CAST(sum(l_quantity) AS DOUBLE)
                  / CAST(count(l_quantity) AS DOUBLE))
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


# ---------------------------------------------------------------------------
# Q19 shape: disjunctive brand/size/quantity revenue
# ---------------------------------------------------------------------------


def q_q19_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 adapted: revenue from three OR'd brand/size/quantity
    windows.  The part attributes attach by broadcast lookup; the
    disjunction evaluates as one vectorized boolean kernel per batch;
    a single global aggregate finishes — no shuffle."""
    from ray.data.aggregate import Count, Sum

    from ..stages.relational import broadcast_join

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice",
                "l_discount"])
    li = broadcast_join(li, _read(sf_dir, "part",
                                  ["p_partkey", "p_brand", "p_size"]),
                        on="l_partkey", right_on="p_partkey",
                        right_cols=["p_brand", "p_size"], how="inner")

    def arm(t, brand, size_lo, size_hi, qty_lo, qty_hi):
        return pc.and_(
            pc.and_(pc.equal(t.column("p_brand"), pa.scalar(brand)),
                    pc.and_(pc.greater_equal(t.column("p_size"),
                                             pa.scalar(size_lo)),
                            pc.less_equal(t.column("p_size"),
                                          pa.scalar(size_hi)))),
            pc.and_(pc.greater_equal(t.column("l_quantity"),
                                     pa.scalar(float(qty_lo))),
                    pc.less_equal(t.column("l_quantity"),
                                  pa.scalar(float(qty_hi)))))

    def prep(t: pa.Table) -> pa.Table:
        m = pc.or_(pc.or_(arm(t, "Brand#2", 1, 10, 1, 20),
                          arm(t, "Brand#19", 11, 25, 5, 25)),
                   arm(t, "Brand#4", 26, 50, 10, 30))
        t = t.filter(m)
        return pa.table({"numer": _rev_numer(t)})

    ds = li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    row = ds.aggregate(Sum("numer", alias_name="numer_sum"),
                       Count(alias_name="n_items"))
    s = row["numer_sum"]
    return pa.table({
        "revenue": pa.array(
            [None if s is None else float(s) / 10000.0], pa.float64()),
        "n_items": pa.array([row["n_items"]], pa.int64()),
    })


SQL_Q19_DISJUNCTIVE_REVENUE = """
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#19' AND p_size BETWEEN 11 AND 25
       AND l_quantity BETWEEN 5 AND 25)
   OR (p_brand = 'Brand#4' AND p_size BETWEEN 26 AND 50
       AND l_quantity BETWEEN 10 AND 30)
"""


# ---------------------------------------------------------------------------
# Q22 shape: idle high-balance customers per nation
# ---------------------------------------------------------------------------


_Q22_CUT = datetime(1999, 1, 1)


def q_q22_idle_customers(sf_dir: str):
    """TPC-H Q22 adapted: per nation, customers with above-average
    positive balance and no order since 1999 (a recency cutoff keeps
    the anti-join side non-vacuous: in this corpus nearly every
    customer has SOME order).  The global average is one tiny
    aggregate; the no-recent-orders test is an exact anti join
    (distinct recent-order custkeys broadcast — the documented
    small-side contract of ``anti_join``); balances aggregate in
    exact integer cents."""
    from ray.data.aggregate import Count, Sum

    from ..stages.relational import anti_join

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"])
    pos = cust.filter(expr="c_acctbal > 0.0")
    row = pos.aggregate(Sum("c_acctbal", alias_name="s"),
                        Count(alias_name="n"))
    avg = float(row["s"]) / float(row["n"]) if row["n"] else 0.0
    recent = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def keep_recent(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("o_orderdate"),
                                      pa.scalar(_Q22_CUT)))
        return t.select(["o_custkey"])

    recent = recent.map_batches(keep_recent, batch_format="pyarrow",
                                zero_copy_batch=True)
    idle = anti_join(cust, recent, on="c_custkey", right_on="o_custkey")

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("c_acctbal"), pa.scalar(avg)))
        return pa.table({
            "c_nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
            "bal_c": _cents(t.column("c_acctbal")),
        })

    ds = idle.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
    agg = ds.groupby("c_nationkey").aggregate(
        Count(alias_name="numcust"), Sum("bal_c", alias_name="bal_sum"))
    t = _materialize(agg, empty_schema=pa.schema(
        [("c_nationkey", pa.int64()), ("numcust", pa.int64()),
         ("bal_sum", pa.int64())]))
    return pa.table({
        "c_nationkey": t.column("c_nationkey"),
        "numcust": t.column("numcust"),
        "totacctbal": pc.divide(pc.cast(t.column("bal_sum"), pa.float64()),
                                100.0),
    })


SQL_Q22_IDLE_CUSTOMERS = """
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
         / 100.0 AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(sum(c_acctbal) AS DOUBLE) / CAST(count(*) AS DOUBLE)
    FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_nationkey
"""


QUERIES15: Dict[str, Callable] = {
    "q4_order_priority": q_q4_order_priority,
    "q6_discount_revenue": q_q6_discount_revenue,
    "q7_nation_volume": q_q7_nation_volume,
    "q9_profit_by_nation": q_q9_profit_by_nation,
    "q10_returned_revenue": q_q10_returned_revenue,
    "q13_order_count_dist": q_q13_order_count_dist,
    "q15_top_supplier": q_q15_top_supplier,
    "q17_small_qty_revenue": q_q17_small_qty_revenue,
    "q19_disjunctive_revenue": q_q19_disjunctive_revenue,
    "q22_idle_customers": q_q22_idle_customers,
}

SQL15: Dict[str, str] = {
    "q4_order_priority": SQL_Q4_ORDER_PRIORITY,
    "q6_discount_revenue": SQL_Q6_DISCOUNT_REVENUE,
    "q7_nation_volume": SQL_Q7_NATION_VOLUME,
    "q9_profit_by_nation": SQL_Q9_PROFIT_BY_NATION,
    "q10_returned_revenue": SQL_Q10_RETURNED_REVENUE,
    "q13_order_count_dist": SQL_Q13_ORDER_COUNT_DIST,
    "q15_top_supplier": SQL_Q15_TOP_SUPPLIER,
    "q17_small_qty_revenue": SQL_Q17_SMALL_QTY_REVENUE,
    "q19_disjunctive_revenue": SQL_Q19_DISJUNCTIVE_REVENUE,
    "q22_idle_customers": SQL_Q22_IDLE_CUSTOMERS,
}
