"""Driver-contract queries, batch 16 (see oracle.py for the contract):
the last six TPC-H query shapes adapted to the testdata schema — Q2
(per-part min-balance supplier), Q8 (nation market share), Q11
(important-part value screen), Q16 (supplier counts per part class),
Q20 (year-over-year excess suppliers), Q21 (blocking-supplier census)
— completing the full Q1–Q22 family alongside batches 13/14/15, plus
three classical association statistics: Bartlett's variance-homogeneity
test, Goodman–Kruskal gamma, and a 2x2 odds ratio with Wald CI.
Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

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


def _cents(col) -> pa.Array:
    return pc.cast(pc.round(pc.multiply(col, 100.0)), pa.int64())


def _bp(col) -> pa.Array:
    return pc.cast(pc.round(pc.multiply(col, 100.0)), pa.int64())


def _rev_numer(t: pa.Table) -> pa.Array:
    return pc.multiply(
        _cents(t.column("l_extendedprice")),
        pc.subtract(pa.scalar(100, pa.int64()), _bp(t.column("l_discount"))),
    )


# ---------------------------------------------------------------------------
# Q2 shape: minimum-balance supplier per qualifying part
# ---------------------------------------------------------------------------


def q_q2_min_acct_supplier(sf_dir: str):
    """TPC-H Q2 adapted (no partsupp: lineitem is the part↔supplier
    bridge, s_acctbal stands in for supplycost): for every LARGE part
    of size 10–15, the supplier(s) with the minimum account balance
    among those who shipped it.  The bridge distinct-pairs groupby is
    the only shuffle; supplier attributes and the per-part minimum
    both broadcast (≤|parts-in-class| rows), and ties surface exactly
    like the SQL correlated `= (SELECT min(...))`."""
    from ray.data.aggregate import Count, Min

    from ..stages.relational import broadcast_join

    part = _read(sf_dir, "part", ["p_partkey", "p_size", "p_type"])

    def keep_parts(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.equal(t.column("p_type"), pa.scalar("LARGE")),
            pc.and_(pc.greater_equal(t.column("p_size"), pa.scalar(10)),
                    pc.less_equal(t.column("p_size"), pa.scalar(15))))
        return t.filter(m).select(["p_partkey"])

    part = part.map_batches(keep_parts, batch_format="pyarrow",
                            zero_copy_batch=True)
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    li = broadcast_join(li, part, on="l_partkey", right_on="p_partkey",
                        right_cols=[], how="inner")
    pairs = li.groupby(["l_partkey", "l_suppkey"]).aggregate(
        Count(alias_name="n_ship"))
    pairs = broadcast_join(
        pairs, _read(sf_dir, "supplier",
                     ["s_suppkey", "s_name", "s_acctbal"]),
        on="l_suppkey", right_on="s_suppkey",
        right_cols=["s_name", "s_acctbal"], how="inner")
    per_part_min = pairs.groupby("l_partkey").aggregate(
        Min("s_acctbal", alias_name="min_bal"))
    pairs = broadcast_join(pairs, per_part_min, on="l_partkey",
                           right_on="l_partkey",
                           right_cols=["min_bal"], how="inner")

    def keep_min(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("s_acctbal"),
                              t.column("min_bal")))
        return pa.table({
            "p_partkey": t.column("l_partkey"),
            "s_suppkey": t.column("l_suppkey"),
            "s_name": t.column("s_name"),
            "s_acctbal": t.column("s_acctbal"),
        })

    out = pairs.map_batches(keep_min, batch_format="pyarrow",
                            zero_copy_batch=True)
    return _materialize(out, empty_schema=pa.schema(
        [("p_partkey", pa.int64()), ("s_suppkey", pa.int64()),
         ("s_name", pa.string()), ("s_acctbal", pa.float64())]))


SQL_Q2_MIN_ACCT_SUPPLIER = """
WITH pairs AS (
  SELECT DISTINCT l_partkey, l_suppkey
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 15),
j AS (
  SELECT l_partkey AS p_partkey, s_suppkey, s_name, s_acctbal
  FROM pairs JOIN supplier ON s_suppkey = l_suppkey)
SELECT p_partkey, s_suppkey, s_name, s_acctbal
FROM j
WHERE s_acctbal = (SELECT min(s_acctbal) FROM j j2
                   WHERE j2.p_partkey = j.p_partkey)
"""


# ---------------------------------------------------------------------------
# Q8 shape: national market share within a customer region, by year
# ---------------------------------------------------------------------------

_Q8_NATION = "NATION_9"
_Q8_REGION = "ASIA"


def q_q8_market_share(sf_dir: str):
    """TPC-H Q8 adapted: per order year, NATION_9 suppliers' share of
    revenue on orders placed by ASIA-region customers.  Supplier and
    customer nation/region hops broadcast; one fact-fact hash join
    (lineitem⋈orders); numerator and denominator stay exact int64
    through the per-year groupby, so the share is a deterministic
    single division."""
    from ray.data.aggregate import Sum

    from ..stages.relational import broadcast_join, safe_join

    nation = _read(sf_dir, "nation",
                   ["n_nationkey", "n_name", "n_regionkey"])
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"])
    nation = broadcast_join(nation, region, on="n_regionkey",
                            right_on="r_regionkey",
                            right_cols=["r_name"], how="inner")
    cust = broadcast_join(
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        nation, on="c_nationkey", right_on="n_nationkey",
        right_cols=["r_name"], how="inner")
    cust = cust.filter(expr=f"r_name == '{_Q8_REGION}'").select_columns(
        ["c_custkey"])
    supp = broadcast_join(
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        nation, on="s_nationkey", right_on="n_nationkey",
        right_cols=["n_name"], how="inner")

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    orders = broadcast_join(orders, cust, on="o_custkey",
                            right_on="c_custkey", right_cols=[],
                            how="inner")

    def prep_orders(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "o_year": pc.cast(pc.year(t.column("o_orderdate")),
                              pa.int64()),
        })

    orders = orders.map_batches(prep_orders, batch_format="pyarrow",
                                zero_copy_batch=True)
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount"])
    li = broadcast_join(li, supp, on="l_suppkey", right_on="s_suppkey",
                        right_cols=["n_name"], how="inner")

    def prep_li(t: pa.Table) -> pa.Table:
        numer = _rev_numer(t)
        is_nat = pc.cast(pc.equal(t.column("n_name"),
                                  pa.scalar(_Q8_NATION)), pa.int64())
        return pa.table({
            "l_orderkey": t.column("l_orderkey"),
            "rev": numer,
            "rev_nat": pc.multiply(numer, is_nat),
        })

    li = li.map_batches(prep_li, batch_format="pyarrow",
                        zero_copy_batch=True)
    j = safe_join(li, orders, join_type="inner", num_partitions=8,
                  on=("l_orderkey",), right_on=("o_orderkey",))
    agg = j.groupby("o_year").aggregate(
        Sum("rev_nat", alias_name="nat_sum"),
        Sum("rev", alias_name="all_sum"))
    t = _materialize(agg, empty_schema=pa.schema(
        [("o_year", pa.int64()), ("nat_sum", pa.int64()),
         ("all_sum", pa.int64())]))
    share = pc.round(pc.divide(pc.cast(t.column("nat_sum"), pa.float64()),
                               pc.cast(t.column("all_sum"), pa.float64())),
                     ndigits=6)
    return pa.table({"o_year": t.column("o_year"), "mkt_share": share})


SQL_Q8_MARKET_SHARE = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(CAST(sum(CASE WHEN n1.n_name = 'NATION_9'
                   THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT))
                   ELSE 0 END) AS DOUBLE)
             / CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                    AS DOUBLE), 6) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region   ON n2.n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q11 shape: important parts by shipped retail value
# ---------------------------------------------------------------------------

_Q11_FACTOR = 1.3


def q_q11_important_parts(sf_dir: str):
    """TPC-H Q11 adapted (no partsupp: shipped retail value
    `quantity * p_retailprice` stands in for stock value): parts whose
    total shipped value exceeds 1.3x the average per-part value (a
    RELATIVE threshold — TPC-H's fixed corpus fraction goes vacuous as
    the part count grows).  The part dimension broadcasts; per-part
    int64 value sums go through ONE groupby; the global mean is a
    second pass over the (small) per-part aggregate, broadcast back as
    a scalar threshold."""
    from ray.data.aggregate import Count as CountQ11
    from ray.data.aggregate import Sum

    from ..stages.relational import broadcast_join

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
    li = broadcast_join(li, _read(sf_dir, "part",
                                  ["p_partkey", "p_retailprice"]),
                        on="l_partkey", right_on="p_partkey",
                        right_cols=["p_retailprice"], how="inner")

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": t.column("l_partkey"),
            "val_c": pc.multiply(
                _cents(t.column("p_retailprice")),
                pc.cast(t.column("l_quantity"), pa.int64())),
        })

    per_part = li.map_batches(prep, batch_format="pyarrow",
                              zero_copy_batch=True).groupby(
        "l_partkey").aggregate(Sum("val_c", alias_name="val_sum"))
    stats = per_part.aggregate(Sum("val_sum", alias_name="total"),
                               CountQ11(alias_name="n_parts"))
    total = stats["total"] or 0
    n_parts = stats["n_parts"] or 0
    thr = (_Q11_FACTOR * (float(total) / float(n_parts))
           if n_parts else 0.0)

    def keep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(
            pc.cast(t.column("val_sum"), pa.float64()), pa.scalar(thr)))
        return pa.table({
            "p_partkey": t.column("l_partkey"),
            "value": pc.divide(pc.cast(t.column("val_sum"),
                                       pa.float64()), 100.0),
        })

    return _materialize(
        per_part.map_batches(keep, batch_format="pyarrow",
                             zero_copy_batch=True),
        empty_schema=pa.schema([("p_partkey", pa.int64()),
                                ("value", pa.float64())]))


SQL_Q11_IMPORTANT_PARTS = """
WITH v AS (
  SELECT l_partkey,
         sum(CAST(round(p_retailprice * 100) AS BIGINT)
             * CAST(l_quantity AS BIGINT)) AS val_sum
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY l_partkey)
SELECT l_partkey AS p_partkey,
       CAST(val_sum AS DOUBLE) / 100.0 AS value
FROM v
WHERE CAST(val_sum AS DOUBLE) >
      1.3 * (CAST((SELECT sum(val_sum) FROM v) AS DOUBLE)
             / CAST((SELECT count(*) FROM v) AS DOUBLE))
"""


# ---------------------------------------------------------------------------
# Q16 shape: distinct supplier counts per part class
# ---------------------------------------------------------------------------


def q_q16_supplier_cnt(sf_dir: str):
    """TPC-H Q16 adapted: distinct suppliers per (brand, type, size)
    part class, excluding Brand#2 and PROMO parts.  The count-distinct
    lowers to two groupbys — distinct (brand, type, size, suppkey)
    quadruples first (pre-aggregated per batch by Arrow group_by), then
    a count per class — so the exchange carries quadruples, not rows."""
    from ray.data.aggregate import Count

    from ..stages.relational import broadcast_join

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    li = broadcast_join(
        li, _read(sf_dir, "part",
                  ["p_partkey", "p_brand", "p_type", "p_size"]),
        on="l_partkey", right_on="p_partkey",
        right_cols=["p_brand", "p_type", "p_size"], how="inner")

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.invert(pc.equal(t.column("p_brand"), pa.scalar("Brand#2"))),
            pc.invert(pc.equal(t.column("p_type"), pa.scalar("PROMO"))))
        t = t.filter(m)
        # per-batch distinct quadruples: shrinks the shuffle payload
        quad = pa.table({
            "p_brand": t.column("p_brand"),
            "p_type": t.column("p_type"),
            "p_size": pc.cast(t.column("p_size"), pa.int64()),
            "l_suppkey": t.column("l_suppkey"),
        })
        return quad.group_by(
            ["p_brand", "p_type", "p_size", "l_suppkey"]).aggregate([])

    quads = li.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True)
    distinct = quads.groupby(
        ["p_brand", "p_type", "p_size", "l_suppkey"]).aggregate(
        Count(alias_name="_n"))
    agg = distinct.groupby(["p_brand", "p_type", "p_size"]).aggregate(
        Count(alias_name="supplier_cnt"))
    t = _materialize(agg, empty_schema=pa.schema(
        [("p_brand", pa.string()), ("p_type", pa.string()),
         ("p_size", pa.int64()), ("supplier_cnt", pa.int64())]))
    return t.select(["p_brand", "p_type", "p_size", "supplier_cnt"])


SQL_Q16_SUPPLIER_CNT = """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#2' AND p_type <> 'PROMO'
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q20 shape: suppliers with excess year-over-year shipped quantity
# ---------------------------------------------------------------------------

_Q20_BRAND = "Brand#2"


def q_q20_growth_suppliers(sf_dir: str):
    """TPC-H Q20 adapted (availqty is not in this schema): suppliers
    whose 1997 shipped quantity of Brand#2 parts exceeded 1.5x their
    1996 quantity (with a non-zero 1996 base).  The brand's partkeys
    broadcast as an inner lookup; the two yearly sums are conditional
    int64 aggregates in ONE groupby; supplier names attach to the
    surviving sliver by broadcast."""
    from ray.data.aggregate import Sum

    from ..stages.relational import broadcast_join

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"])
    part = part.filter(expr=f"p_brand == '{_Q20_BRAND}'").select_columns(
        ["p_partkey"])
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])
    li = broadcast_join(li, part, on="l_partkey", right_on="p_partkey",
                        right_cols=[], how="inner")

    def prep(t: pa.Table) -> pa.Table:
        year = pc.year(t.column("l_shipdate"))
        qty = pc.cast(t.column("l_quantity"), pa.int64())
        is96 = pc.cast(pc.equal(year, pa.scalar(1996)), pa.int64())
        is97 = pc.cast(pc.equal(year, pa.scalar(1997)), pa.int64())
        return pa.table({
            "l_suppkey": t.column("l_suppkey"),
            "q96": pc.multiply(qty, is96),
            "q97": pc.multiply(qty, is97),
        })

    agg = li.map_batches(prep, batch_format="pyarrow",
                         zero_copy_batch=True).groupby(
        "l_suppkey").aggregate(Sum("q96", alias_name="qty_1996"),
                               Sum("q97", alias_name="qty_1997"))

    def keep(t: pa.Table) -> pa.Table:
        g96 = pc.cast(t.column("qty_1996"), pa.float64())
        g97 = pc.cast(t.column("qty_1997"), pa.float64())
        m = pc.and_(pc.greater(t.column("qty_1996"),
                               pa.scalar(0, pa.int64())),
                    pc.greater(g97, pc.multiply(pa.scalar(1.5), g96)))
        return t.filter(m)

    agg = agg.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)
    agg = broadcast_join(agg, _read(sf_dir, "supplier",
                                    ["s_suppkey", "s_name"]),
                         on="l_suppkey", right_on="s_suppkey",
                         right_cols=["s_name"], how="inner")
    t = _materialize(agg, empty_schema=pa.schema(
        [("l_suppkey", pa.int64()), ("qty_1996", pa.int64()),
         ("qty_1997", pa.int64()), ("s_name", pa.string())]))
    return pa.table({
        "s_suppkey": t.column("l_suppkey"),
        "s_name": t.column("s_name"),
        "qty_1996": t.column("qty_1996"),
        "qty_1997": t.column("qty_1997"),
    })


SQL_Q20_GROWTH_SUPPLIERS = """
WITH s AS (
  SELECT l_suppkey,
         CAST(coalesce(sum(CAST(l_quantity AS BIGINT))
                       FILTER (year(l_shipdate) = 1996), 0) AS BIGINT)
           AS qty_1996,
         CAST(coalesce(sum(CAST(l_quantity AS BIGINT))
                       FILTER (year(l_shipdate) = 1997), 0) AS BIGINT)
           AS qty_1997
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#2'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, qty_1996, qty_1997
FROM s JOIN supplier ON s_suppkey = l_suppkey
WHERE qty_1996 > 0
  AND CAST(qty_1997 AS DOUBLE) > 1.5 * CAST(qty_1996 AS DOUBLE)
"""


# ---------------------------------------------------------------------------
# Q21 shape: blocking suppliers (latest shipper on multi-supplier orders)
# ---------------------------------------------------------------------------


def q_q21_late_supplier(sf_dir: str):
    """TPC-H Q21 adapted (no receipt/commit dates): on orders served
    by ≥2 distinct suppliers, the supplier whose latest lineitem
    shipped LAST "blocked" the order; count blocked orders per
    supplier, top 10.  Plan: per-batch (order, supplier) max-shipdate
    partials (the combiner), ONE coarse-bucket shuffle on orderkey,
    then a vectorized segment kernel derives per-order max + supplier
    count and the blocking suppliers in the same pass — no join at
    all (the per-order side is a projection of the same bucket)."""
    import numpy as np
    from ray.data.aggregate import Sum

    from ..functions.aggregates import hash64
    from ..stages.relational import broadcast_join

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate"])

    def pair_partial(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.and_(pc.is_valid(t.column("l_orderkey")),
                             pc.is_valid(t.column("l_suppkey"))),
                     pc.is_valid(t.column("l_shipdate")))
        t = t.filter(ok)
        okey = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        skey = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        ship = t.column("l_shipdate").to_numpy(
            zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((skey, okey))
        okey, skey, ship = okey[order], skey[order], ship[order]
        new = np.ones(len(okey), dtype=bool)
        if len(okey) > 1:
            new[1:] = (okey[1:] != okey[:-1]) | (skey[1:] != skey[:-1])
        starts = np.flatnonzero(new)
        pair_max = (np.maximum.reduceat(ship, starts)
                    if len(starts) else ship[:0])
        out_ok, out_sk = okey[starts], skey[starts]
        coarse = (hash64(pa.array(out_ok)) % np.uint64(64)).astype(
            np.int64)
        return pa.table({
            "okey": pa.array(out_ok), "skey": pa.array(out_sk),
            "supp_max": pa.array(pair_max), "coarse": pa.array(coarse),
        })

    pairs = li.map_batches(pair_partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def bucket_kernel(group: pa.Table) -> pa.Table:
        t = group.sort_by([("okey", "ascending"), ("skey", "ascending")])
        okey = t.column("okey").to_numpy(zero_copy_only=False)
        skey = t.column("skey").to_numpy(zero_copy_only=False)
        smax = t.column("supp_max").to_numpy(zero_copy_only=False)
        n = len(okey)
        if n == 0:
            return pa.table({"l_suppkey": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        # merge duplicate (order, supplier) partials from different
        # input blocks, then segment per order
        pnew = np.ones(n, dtype=bool)
        pnew[1:] = (okey[1:] != okey[:-1]) | (skey[1:] != skey[:-1])
        ps = np.flatnonzero(pnew)
        okey, skey = okey[ps], skey[ps]
        smax = np.maximum.reduceat(smax, ps)
        onew = np.ones(len(okey), dtype=bool)
        onew[1:] = okey[1:] != okey[:-1]
        oseg = np.cumsum(onew) - 1
        ostarts = np.flatnonzero(onew)
        omax = np.maximum.reduceat(smax, ostarts)
        nsupp = np.bincount(oseg)
        blocked = (nsupp[oseg] >= 2) & (smax == omax[oseg])
        bsk = skey[blocked]
        u, cnt = np.unique(bsk, return_counts=True)
        return pa.table({"l_suppkey": pa.array(u, pa.int64()),
                         "c": pa.array(cnt.astype(np.int64))})

    blocked = pairs.groupby("coarse").map_groups(
        bucket_kernel, batch_format="pyarrow")
    agg = blocked.groupby("l_suppkey").aggregate(
        Sum("c", alias_name="numwait"))
    # join supplier BEFORE the top-10: an l_suppkey with no supplier
    # row (FK orphan) must not consume a limit slot — the SQL mirror
    # inner-joins before ORDER BY/LIMIT (carved-fuzz finding)
    named = broadcast_join(agg, _read(sf_dir, "supplier",
                                      ["s_suppkey", "s_name"]),
                           on="l_suppkey", right_on="s_suppkey",
                           right_cols=["s_name"], how="inner")
    top = named.sort(["numwait", "l_suppkey"],
                     descending=[True, False]).limit(10)
    t = _materialize(top, empty_schema=pa.schema(
        [("l_suppkey", pa.int64()), ("numwait", pa.int64()),
         ("s_name", pa.string())]))
    return pa.table({
        "s_suppkey": t.column("l_suppkey"),
        "s_name": t.column("s_name"),
        "numwait": t.column("numwait"),
    })


SQL_Q21_LATE_SUPPLIER = """
WITH ps AS (
  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS supp_max
  FROM lineitem GROUP BY 1, 2),
o AS (
  SELECT l_orderkey, max(supp_max) AS order_max,
         count(*) AS n_supp
  FROM ps GROUP BY 1)
SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
FROM ps
JOIN o USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE n_supp >= 2 AND supp_max = order_max
GROUP BY 1, 2
ORDER BY numwait DESC, s_suppkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Bartlett variance homogeneity across event types
# ---------------------------------------------------------------------------


def q_bartlett_value_types(sf_dir: str):
    """Bartlett's test of equal value-variance across event types —
    the parametric counterpart to `levene_value_types` (same moment-
    partials skeleton: data rows never shuffle)."""
    from ..stages.robust import bartlett_test

    t = _materialize(bartlett_test(
        _read(sf_dir, "events", ["event_type", "value"]),
        value_col="value", group_col="event_type"))
    return pa.table({
        "k": t.column("k"), "n": t.column("n"),
        "stat": pc.round(t.column("stat"), ndigits=6),
    })


SQL_BARTLETT_VALUE_TYPES = """
WITH g AS (
  SELECT event_type, count(value) AS n, var_samp(value) AS v
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type HAVING count(value) >= 2
)
SELECT CAST(count(*) AS BIGINT) AS k,
       CAST(sum(n) AS BIGINT) AS n,
       CASE WHEN count(*) >= 2 AND sum(n) > count(*)
                 AND min(v) > 0 THEN
         round(((sum(n) - count(*))
                  * ln(sum((n - 1) * v) / (sum(n) - count(*)))
                - sum((n - 1) * ln(v)))
               / (1 + (sum(1.0 / (n - 1)) - 1.0 / (sum(n) - count(*)))
                      / (3 * (count(*) - 1))), 6)
       END AS stat
FROM g
"""


# ---------------------------------------------------------------------------
# Goodman–Kruskal gamma: order priority vs total-price band
# ---------------------------------------------------------------------------


def q_gk_gamma_orders(sf_dir: str):
    """Goodman–Kruskal gamma between order priority rank (the leading
    digit of o_orderpriority) and the 100k-wide total-price band —
    ordinal association from the contingency table, exact int64
    concordant/discordant pair counts."""
    from ..stages.robust import gk_gamma

    orders = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def ranks(t: pa.Table) -> pa.Table:
        return pa.table({
            "i": pc.cast(pc.utf8_slice_codeunits(
                t.column("o_orderpriority"), 0, 1), pa.int64()),
            "j": pc.cast(pc.floor(pc.divide(t.column("o_totalprice"),
                                            100000.0)), pa.int64()),
        })

    ds = orders.map_batches(ranks, batch_format="pyarrow",
                            zero_copy_batch=True)
    t = _materialize(gk_gamma(ds, i_col="i", j_col="j"))
    return pa.table({
        "c_pairs": t.column("c_pairs"),
        "d_pairs": t.column("d_pairs"),
        # raw (C-D)/(C+D) over exact pair counts, NOT rounded (6-dp
        # halves tie half-even vs half-away; both sides do the same
        # single double division)
        "gamma": t.column("gamma"),
    })


SQL_GK_GAMMA_ORDERS = """
WITH cells AS (
  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS i,
         CAST(floor(o_totalprice / 100000.0) AS BIGINT) AS j,
         count(*) AS n
  FROM orders GROUP BY 1, 2),
pairsum AS (
  SELECT
    CAST(coalesce(sum(a.n * b.n) FILTER (b.i > a.i AND b.j > a.j), 0)
         AS BIGINT) AS c_pairs,
    CAST(coalesce(sum(a.n * b.n) FILTER (b.i > a.i AND b.j < a.j), 0)
         AS BIGINT) AS d_pairs
  FROM cells a CROSS JOIN cells b)
SELECT c_pairs, d_pairs,
       CASE WHEN c_pairs + d_pairs > 0 THEN
         CAST(c_pairs - d_pairs AS DOUBLE)
           / CAST(c_pairs + d_pairs AS DOUBLE)
       END AS gamma
FROM pairsum
"""


# ---------------------------------------------------------------------------
# 2x2 odds ratio: urgent priority vs fulfilled status
# ---------------------------------------------------------------------------


def q_odds_ratio_orders(sf_dir: str):
    """Odds ratio (with 95% Wald CI) of an order being fulfilled
    ('F') given 1-URGENT priority — the classic 2x2 association
    screen, one streaming cell-count pass."""
    from ..stages.robust import odds_ratio_2x2

    t = _materialize(odds_ratio_2x2(
        _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"]),
        exposure_col="o_orderpriority", exposure="1-URGENT",
        outcome_col="o_orderstatus", outcome="F"))
    return pa.table({
        "a": t.column("a"), "b": t.column("b"),
        "c": t.column("c"), "d": t.column("d"),
        # raw (a·d)/(b·c) over exact counts, NOT rounded (6-dp tie
        # risk); ci_lo/ci_hi stay rounded — exp/ln/sqrt values can't
        # land on exact halves but CAN differ by a ulp across libms
        "odds_ratio": t.column("odds_ratio"),
        "ci_lo": pc.round(t.column("ci_lo"), ndigits=6),
        "ci_hi": pc.round(t.column("ci_hi"), ndigits=6),
    })


SQL_ODDS_RATIO_ORDERS = """
WITH c AS (
  SELECT
    count(*) FILTER (o_orderpriority = '1-URGENT'
                     AND o_orderstatus = 'F') AS a,
    count(*) FILTER (o_orderpriority = '1-URGENT'
                     AND o_orderstatus <> 'F') AS b,
    count(*) FILTER (o_orderpriority <> '1-URGENT'
                     AND o_orderstatus = 'F') AS c,
    count(*) FILTER (o_orderpriority <> '1-URGENT'
                     AND o_orderstatus <> 'F') AS d
  FROM orders)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
       CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
         (CAST(a AS DOUBLE) * d) / (CAST(b AS DOUBLE) * c)
       END AS odds_ratio,
       CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
         round(exp(ln((CAST(a AS DOUBLE) * d) / (CAST(b AS DOUBLE) * c))
                   - 1.959963984540054
                     * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6)
       END AS ci_lo,
       CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
         round(exp(ln((CAST(a AS DOUBLE) * d) / (CAST(b AS DOUBLE) * c))
                   + 1.959963984540054
                     * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6)
       END AS ci_hi
FROM c
"""


QUERIES16: Dict[str, Callable] = {
    "q2_min_acct_supplier": q_q2_min_acct_supplier,
    "q8_market_share": q_q8_market_share,
    "q11_important_parts": q_q11_important_parts,
    "q16_supplier_cnt": q_q16_supplier_cnt,
    "q20_growth_suppliers": q_q20_growth_suppliers,
    "q21_late_supplier": q_q21_late_supplier,
    "bartlett_value_types": q_bartlett_value_types,
    "gk_gamma_orders": q_gk_gamma_orders,
    "odds_ratio_orders": q_odds_ratio_orders,
}

SQL16: Dict[str, str] = {
    "q2_min_acct_supplier": SQL_Q2_MIN_ACCT_SUPPLIER,
    "q8_market_share": SQL_Q8_MARKET_SHARE,
    "q11_important_parts": SQL_Q11_IMPORTANT_PARTS,
    "q16_supplier_cnt": SQL_Q16_SUPPLIER_CNT,
    "q20_growth_suppliers": SQL_Q20_GROWTH_SUPPLIERS,
    "q21_late_supplier": SQL_Q21_LATE_SUPPLIER,
    "bartlett_value_types": SQL_BARTLETT_VALUE_TYPES,
    "gk_gamma_orders": SQL_GK_GAMMA_ORDERS,
    "odds_ratio_orders": SQL_ODDS_RATIO_ORDERS,
}
