"""Driver-contract queries, batch 12 (see oracle.py for the contract):
TPC-H Q5-style star-join revenue per nation, order-total vs lineitem
reconciliation top-k, and exact distributed ROC AUC (Mann-Whitney with
a one-vs-rest class).  Merged into ``oracle.queries()`` /
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


# ---------------------------------------------------------------------------
# TPC-H Q5-style star join: revenue per nation within one region
# ---------------------------------------------------------------------------


def q_q5_star_revenue(sf_dir: str):
    """Revenue per supplier nation restricted to the ASIA region — the
    classic star-join shape: the fact table (lineitem) streams through
    THREE chained broadcast dimension lookups (supplier -> nation ->
    region, each `ray.put` once per run, `pc.index_in` per batch — no
    shuffle of the fact side), then one small groupby on the 25-value
    nation key.  Revenue is summed in integer cents so the result is
    independent of float64 summation order."""
    from ray.data.aggregate import Count, Sum

    from ..stages.relational import broadcast_join

    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_extendedprice", "l_discount"])
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nation = _read(sf_dir, "nation",
                   ["n_nationkey", "n_name", "n_regionkey"])
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"])

    joined = broadcast_join(li, supp, on="l_suppkey",
                            right_on="s_suppkey",
                            right_cols=["s_nationkey"], how="inner")
    joined = broadcast_join(joined, nation, on="s_nationkey",
                            right_on="n_nationkey",
                            right_cols=["n_name", "n_regionkey"],
                            how="inner")
    joined = broadcast_join(joined, region, on="n_regionkey",
                            right_on="r_regionkey",
                            right_cols=["r_name"], how="inner")

    def project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("r_name"), "ASIA"))
        # exact integer numerator: price in cents x (100 - discount in
        # basis points) — rounding a float `price*(1-disc)*100` is
        # rounding-MODE-sensitive exactly when the true product ends in
        # .5 cents (half_to_even here vs half-away in DuckDB round())
        price_c = pc.cast(pc.round(pc.multiply(
            t.column("l_extendedprice"), 100.0)), pa.int64())
        disc_bp = pc.cast(pc.round(pc.multiply(
            t.column("l_discount"), 100.0)), pa.int64())
        return pa.table({
            "n_name": t.column("n_name"),
            "rev_c": pc.multiply(
                price_c, pc.subtract(pa.scalar(100, pa.int64()),
                                     disc_bp)),
        })

    agg = joined.map_batches(project, batch_format="pyarrow",
                             zero_copy_batch=True)
    agg = agg.groupby("n_name").aggregate(
        Count(alias_name="n_items"), Sum("rev_c", alias_name="rev_sum"))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": t.column("n_name"),
            "n_items": t.column("n_items"),
            "revenue": pc.divide(
                pc.cast(t.column("rev_sum"), pa.float64()), 10000.0),
        })

    # empty_schema: a corpus with no ASIA-region supplier leaves the
    # groupby with zero blocks, so the finalize never runs and the
    # Dataset has no inferable schema (fuzz seed 99)
    return _materialize(
        agg.map_batches(finalize, batch_format="pyarrow",
                        zero_copy_batch=True),
        empty_schema=pa.schema([("n_name", pa.string()),
                                ("n_items", pa.int64()),
                                ("revenue", pa.float64())]))


SQL_Q5_STAR_REVENUE = """
SELECT n_name, count(*) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# Order-total reconciliation: top-k largest header-vs-detail deviations
# ---------------------------------------------------------------------------


def q_order_recon_topk(sf_dir: str):
    """Largest |o_totalprice - sum(lineitem prices)| discrepancies —
    the header/detail ledger reconciliation.  Scale shape: a
    large-large 'join' expressed as tagged-union + ONE groupby (each
    side projected to (key, side_cents) with a per-batch combiner on
    the lineitem side), so the exchange moves two ints per order
    instead of a hash-join of two fact tables.  Full-outer semantics
    fall out for free: a key missing on one side sums that side to 0."""
    import numpy as np
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])

    def o_side(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
            "o_c": pc.cast(pc.round(pc.multiply(
                t.column("o_totalprice"), 100.0)), pa.int64()),
            "li_c": pa.nulls(t.num_rows, pa.int64()).fill_null(0),
        })

    def li_side(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column("l_orderkey")),
                     pc.is_valid(t.column("l_extendedprice")))
        t = t.filter(ok)
        keys = t.column("l_orderkey")
        keys = (keys.combine_chunks()
                if isinstance(keys, pa.ChunkedArray) else keys)
        enc = pc.dictionary_encode(keys)
        codes = np.asarray(enc.indices, dtype=np.int64)
        cents = np.asarray(
            pc.cast(pc.round(pc.multiply(
                t.column("l_extendedprice"), 100.0)), pa.int64()))
        sums = np.bincount(codes, weights=cents,
                           minlength=len(enc.dictionary))
        return pa.table({
            "o_orderkey": pc.cast(enc.dictionary, pa.int64()),
            "o_c": pa.array(np.zeros(len(enc.dictionary),
                                     dtype=np.int64)),
            "li_c": pa.array(sums.astype(np.int64)),
        })

    tagged = orders.map_batches(
        o_side, batch_format="pyarrow", zero_copy_batch=True,
    ).union(li.map_batches(
        li_side, batch_format="pyarrow", zero_copy_batch=True))
    agg = tagged.groupby("o_orderkey").aggregate(
        Sum("o_c", alias_name="o_sum"), Sum("li_c", alias_name="li_sum"))

    def widen(t: pa.Table) -> pa.Table:
        diff = pc.subtract(t.column("o_sum"), t.column("li_sum"))
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "o_sum": t.column("o_sum"),
            "li_sum": t.column("li_sum"),
            "diff_c": diff,
            "abs_c": pc.abs(diff),
        })

    top = agg.map_batches(widen, batch_format="pyarrow",
                          zero_copy_batch=True).sort(
        ["abs_c", "o_orderkey"], descending=[True, False]).limit(10)

    def finalize(t: pa.Table) -> pa.Table:
        def money(name):
            return pc.divide(pc.cast(t.column(name), pa.float64()),
                             100.0)
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "o_total": money("o_sum"),
            "li_total": money("li_sum"),
            "diff": money("diff_c"),
        })

    return _materialize(top.map_batches(
        finalize, batch_format="pyarrow", zero_copy_batch=True))


SQL_ORDER_RECON_TOPK = """
WITH li AS (
  SELECT l_orderkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS li_c
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_extendedprice IS NOT NULL
  GROUP BY l_orderkey
),
o AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS o_c
  FROM orders
),
j AS (
  SELECT COALESCE(o.o_orderkey, li.l_orderkey) AS o_orderkey,
         COALESCE(o_c, 0) AS o_c, COALESCE(li_c, 0) AS li_c
  FROM o FULL OUTER JOIN li ON o.o_orderkey = li.l_orderkey
)
SELECT o_orderkey, o_c / 100.0 AS o_total, li_c / 100.0 AS li_total,
       (o_c - li_c) / 100.0 AS diff
FROM j
ORDER BY abs(o_c - li_c) DESC, o_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Exact distributed ROC AUC (Mann-Whitney U, one-vs-rest)
# ---------------------------------------------------------------------------


def q_auc_purchase_value(sf_dir: str):
    """Exact ROC AUC of `value` as a score for event_type='purchase'
    vs every other event — U/(n_a*n_b) with average-rank tie handling,
    computed from per-batch distinct-value count partials (shuffle
    payload O(distinct values), never rows)."""
    from ..stages.robust import mann_whitney

    out = mann_whitney(
        _read(sf_dir, "events", ["event_type", "value"]),
        value_col="value", group_col="event_type", a="purchase")

    def add_auc(t: pa.Table) -> pa.Table:
        denom = pc.multiply(
            pc.cast(t.column("n_a"), pa.float64()),
            pc.cast(t.column("n_b"), pa.float64()))
        return pa.table({
            "n_a": t.column("n_a"),
            "n_b": t.column("n_b"),
            "u": t.column("u"),
            "auc": pc.divide(t.column("u"), denom),
        })

    return _materialize(out.map_batches(
        add_auc, batch_format="pyarrow", zero_copy_batch=True))


SQL_AUC_PURCHASE_VALUE = """
WITH e AS (
  SELECT value AS v,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
),
rk AS (
  SELECT pos, avg(rn) OVER (PARTITION BY v) AS r
  FROM (SELECT v, pos, row_number() OVER (ORDER BY v) AS rn FROM e)
),
a AS (
  SELECT count(*) FILTER (pos = 1) AS na,
         count(*) FILTER (pos = 0) AS nb,
         sum(r) FILTER (pos = 1) AS ra
  FROM rk
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       ra - na * (na + 1) / 2.0 AS u,
       (ra - na * (na + 1) / 2.0) / (na * 1.0 * nb) AS auc
FROM a
"""


QUERIES12: Dict[str, Callable] = {
    "q5_star_revenue": q_q5_star_revenue,
    "order_recon_topk": q_order_recon_topk,
    "auc_purchase_value": q_auc_purchase_value,
}

SQL12: Dict[str, str] = {
    "q5_star_revenue": SQL_Q5_STAR_REVENUE,
    "order_recon_topk": SQL_ORDER_RECON_TOPK,
    "auc_purchase_value": SQL_AUC_PURCHASE_VALUE,
}
