"""Driver-contract queries, batch 14 (see oracle.py for the contract):
TPC-H-shaped multi-table join pipelines (Q3/Q12/Q14/Q18 adapted to the
testdata schema) plus four classical statistics — Brown–Forsythe
variance homogeneity, Cronbach's alpha, the Wald–Wolfowitz runs test,
and per-group Durbin–Watson.  Merged into ``oracle.queries()`` /
``oracle.oracle_sql()``."""

from __future__ import annotations

from datetime import datetime
from typing import Callable, Dict

import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


_Q3_CUT = datetime(1998, 6, 1)


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: top unshipped orders by revenue
# ---------------------------------------------------------------------------


def q_q3_top_unshipped(sf_dir: str):
    """TPC-H Q3 adapted: the 10 highest-revenue orders placed before
    the cutoff by BUILDING-segment customers whose lineitems shipped
    after it.  Plan: bloom-prefiltered semi join (orders ⋉ customer —
    the bloom side ships a bitset, not keys), the fact table prunes
    rows+columns at the read, one partitioned hash join
    (lineitem ⋈ orders), a 3-key groupby on integer-cents revenue,
    then a distributed sort-limit top-k.  No full materialization."""
    from ray.data.aggregate import Sum

    from ..stages.relational import bloom_semi_join, safe_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    cust = cust.filter(
        expr="c_mktsegment == 'BUILDING'").select_columns(["c_custkey"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_orderpriority"])

    def before_cut(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t.column("o_orderdate"),
                                pa.scalar(_Q3_CUT)))

    orders = orders.map_batches(before_cut, batch_format="pyarrow",
                                zero_copy_batch=True)
    orders = bloom_semi_join(orders, cust, on="o_custkey",
                             right_on="c_custkey")
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount",
                "l_shipdate"])

    def rev_after_cut(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("l_shipdate"),
                                pa.scalar(_Q3_CUT)))
        # exact integer numerator (cents x basis points): rounding the
        # float product is rounding-mode-sensitive on .5-cent values
        price_c = pc.cast(pc.round(pc.multiply(
            t.column("l_extendedprice"), 100.0)), pa.int64())
        disc_bp = pc.cast(pc.round(pc.multiply(
            t.column("l_discount"), 100.0)), pa.int64())
        return pa.table({
            "l_orderkey": t.column("l_orderkey"),
            "rev_c": pc.multiply(
                price_c, pc.subtract(pa.scalar(100, pa.int64()),
                                     disc_bp)),
        })

    li = li.map_batches(rev_after_cut, batch_format="pyarrow",
                        zero_copy_batch=True)
    j = safe_join(li, orders, join_type="inner", num_partitions=8,
                  on=("l_orderkey",), right_on=("o_orderkey",))
    agg = j.groupby(["l_orderkey", "o_orderdate",
                     "o_orderpriority"]).aggregate(
        Sum("rev_c", alias_name="rev_sum"))
    top = agg.sort(["rev_sum", "l_orderkey"],
                   descending=[True, False]).limit(10)

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": t.column("l_orderkey"),
            # the groupby key round-trips at second precision; restore
            # the source µs unit so dtype matches the oracle exactly
            "o_orderdate": t.column("o_orderdate").cast(
                pa.timestamp("us")),
            "o_orderpriority": t.column("o_orderpriority"),
            "revenue": pc.divide(
                pc.cast(t.column("rev_sum"), pa.float64()), 10000.0),
        })

    return _materialize(
        top.map_batches(finalize, batch_format="pyarrow",
                        zero_copy_batch=True),
        empty_schema=pa.schema(
            [("l_orderkey", pa.int64()),
             ("o_orderdate", pa.timestamp("us")),
             ("o_orderpriority", pa.string()),
             ("revenue", pa.float64())]))


SQL_Q3_TOP_UNSHIPPED = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY 1, 2, 3
ORDER BY sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT)))
         DESC, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# TPC-H Q12 shape: late-shipment rate per order priority
# ---------------------------------------------------------------------------


def q_q12_late_by_priority(sf_dir: str):
    """Late-shipment audit per order priority (TPC-H Q12 shape, no
    l_shipmode in this schema): a lineitem is LATE when it ships more
    than 90 days after its order date.  One partitioned hash join
    (both sides large — neither broadcasts), a vectorized µs-domain
    date comparison, and a 5-group count/sum.  Output per priority:
    n_items, n_late, late_rate."""
    from ray.data.aggregate import Count, Sum

    from ..stages.relational import safe_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])
    j = safe_join(li, orders, join_type="inner", num_partitions=8,
                  on=("l_orderkey",), right_on=("o_orderkey",))
    lim_us = 90 * 86_400_000_000

    def late_flag(t: pa.Table) -> pa.Table:
        s_us = pc.cast(t.column("l_shipdate"), pa.int64())
        o_us = pc.cast(t.column("o_orderdate"), pa.int64())
        late = pc.greater(pc.subtract(s_us, o_us), pa.scalar(lim_us))
        return pa.table({
            "o_orderpriority": t.column("o_orderpriority"),
            "late": pc.cast(late, pa.int64()),
        })

    agg = j.map_batches(late_flag, batch_format="pyarrow",
                        zero_copy_batch=True)
    agg = agg.groupby("o_orderpriority").aggregate(
        Count(alias_name="n_items"), Sum("late", alias_name="n_late"))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderpriority": t.column("o_orderpriority"),
            "n_items": t.column("n_items"),
            "n_late": t.column("n_late"),
            "late_rate": pc.round(pc.divide(
                pc.cast(t.column("n_late"), pa.float64()),
                pc.cast(t.column("n_items"), pa.float64())), ndigits=6),
        })

    return _materialize(
        agg.map_batches(finalize, batch_format="pyarrow",
                        zero_copy_batch=True),
        empty_schema=pa.schema(
            [("o_orderpriority", pa.string()),
             ("n_items", pa.int64()), ("n_late", pa.int64()),
             ("late_rate", pa.float64())]))


SQL_Q12_LATE_BY_PRIORITY = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       round(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                      THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS late_rate
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: promo revenue share
# ---------------------------------------------------------------------------


def q_q14_promo_share(sf_dir: str):
    """PROMO revenue share (TPC-H Q14 shape): what fraction of total
    discounted revenue flows through parts of type PROMO?  The part
    dimension broadcasts once (``ray.put`` + per-batch ``index_in``);
    the fact table streams through one stateless pass; two integer-
    cents sums reduce globally.  Output one row
    (promo_revenue, total_revenue, promo_share_pct)."""
    import ray.data as rd

    from ..stages.relational import broadcast_join

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount"])
    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    j = broadcast_join(li, part, on="l_partkey", right_on="p_partkey",
                       right_cols=["p_type"], how="inner")

    def cents(t: pa.Table) -> pa.Table:
        # exact integer numerator (cents x basis points): rounding the
        # float product is rounding-mode-sensitive on .5-cent values
        price_c = pc.cast(pc.round(pc.multiply(
            t.column("l_extendedprice"), 100.0)), pa.int64())
        disc_bp = pc.cast(pc.round(pc.multiply(
            t.column("l_discount"), 100.0)), pa.int64())
        rev_c = pc.multiply(price_c,
                            pc.subtract(pa.scalar(100, pa.int64()),
                                        disc_bp))
        promo = pc.equal(t.column("p_type"), "PROMO")
        return pa.table({
            "rev_c": rev_c,
            "promo_c": pc.if_else(promo, rev_c, pa.scalar(0, pa.int64())),
        })

    from ray.data.aggregate import Sum

    row = j.map_batches(cents, batch_format="pyarrow",
                        zero_copy_batch=True).aggregate(
        Sum("rev_c", alias_name="total_c"),
        Sum("promo_c", alias_name="promo_c"))
    total_c = row.get("total_c") or 0
    promo_c = row.get("promo_c") or 0
    return _materialize(rd.from_arrow(pa.table({
        "promo_revenue": pa.array([promo_c / 10000.0], pa.float64()),
        "total_revenue": pa.array([total_c / 10000.0], pa.float64()),
        # raw quotient of exact cent counts, NOT rounded: a 6-dp round
        # can land on a half where Python (half-even) and SQL
        # (half-away) disagree; both sides do the same double ops
        "promo_share_pct": pa.array(
            [100.0 * promo_c / total_c if total_c else None],
            pa.float64()),
    })))


SQL_Q14_PROMO_SHARE = """
WITH c AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c,
         CASE WHEN p_type = 'PROMO'
              THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))
              ELSE 0 END AS promo_c
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT CAST(sum(promo_c) AS DOUBLE) / 10000.0 AS promo_revenue,
       CAST(sum(rev_c) AS DOUBLE) / 10000.0 AS total_revenue,
       100.0 * CAST(sum(promo_c) AS DOUBLE)
         / CAST(sum(rev_c) AS DOUBLE) AS promo_share_pct
FROM c
"""


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume orders
# ---------------------------------------------------------------------------


def q_q18_big_orders(sf_dir: str):
    """Large-volume orders (TPC-H Q18 shape): orders whose total
    lineitem quantity exceeds 300, with customer name attached.  Plan:
    the fact table pre-aggregates per orderkey FIRST (integer-cents
    quantity sum — the shuffle moves one row per order, not per item),
    the >300 filter shrinks it to a sliver that BROADCASTS over the
    orders scan (Q18's classic selective-semijoin shape — no shuffle
    join at all), the customer dimension broadcasts too, and a
    sort-limit yields the top 20 by quantity (orderkey tiebreak)."""
    from ray.data.aggregate import Sum

    from ..stages.relational import broadcast_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def qty_c(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": t.column("l_orderkey"),
            "qty_c": pc.cast(pc.round(pc.multiply(
                t.column("l_quantity"), 100.0)), pa.int64()),
        })

    agg = li.map_batches(qty_c, batch_format="pyarrow",
                         zero_copy_batch=True)
    agg = agg.groupby("l_orderkey").aggregate(
        Sum("qty_c", alias_name="qty_sum"))
    agg = agg.filter(expr="qty_sum > 30000")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_totalprice"])
    j = broadcast_join(orders, agg, on="o_orderkey",
                       right_on="l_orderkey", right_cols=["qty_sum"],
                       how="inner")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    j = broadcast_join(j, cust, on="o_custkey", right_on="c_custkey",
                       right_cols=["c_name"], how="inner")
    top = j.sort(["qty_sum", "o_orderkey"],
                 descending=[True, False]).limit(20)

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "c_name": t.column("c_name"),
            "o_orderdate": t.column("o_orderdate"),
            "o_totalprice": t.column("o_totalprice"),
            "sum_qty": pc.divide(
                pc.cast(t.column("qty_sum"), pa.float64()), 100.0),
        })

    return _materialize(
        top.map_batches(finalize, batch_format="pyarrow",
                        zero_copy_batch=True),
        # a corpus with no >300-qty orders drains the whole plan to
        # zero rows with no schema (fuzz harness hits this)
        empty_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("c_name", pa.string()),
             ("o_orderdate", pa.timestamp("us")),
             ("o_totalprice", pa.float64()),
             ("sum_qty", pa.float64())]))


SQL_Q18_BIG_ORDERS = """
WITH q AS (
  SELECT l_orderkey,
         sum(CAST(round(l_quantity * 100) AS BIGINT)) AS qty_sum
  FROM lineitem GROUP BY 1 HAVING qty_sum > 30000
)
SELECT o_orderkey, c_name, o_orderdate, o_totalprice,
       qty_sum / 100.0 AS sum_qty
FROM q
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY qty_sum DESC, o_orderkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Brown–Forsythe (Levene) variance homogeneity
# ---------------------------------------------------------------------------


def q_levene_value_types(sf_dir: str):
    """Brown–Forsythe homogeneity-of-variance test of event value
    across event types — exact per-group medians (one groupby), then
    one moment pass over |x − median|; W from merged moments."""
    from ..stages.robust import levene_brown_forsythe

    return _materialize(levene_brown_forsythe(
        _read(sf_dir, "events", ["event_type", "value"]),
        value_col="value", group_col="event_type"))


SQL_LEVENE_VALUE_TYPES = """
WITH v AS (
  SELECT event_type AS g, value AS v FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
),
med AS (SELECT g, quantile_cont(v, 0.5) AS med FROM v GROUP BY g),
z AS (
  SELECT v.g, abs(v.v - med.med) AS z
  FROM v JOIN med ON v.g = med.g
),
gm AS (
  SELECT g, count(*) AS n, sum(z) AS sz, sum(z * z) AS szz
  FROM z GROUP BY g
),
t AS (
  SELECT count(*) AS k, sum(n) AS n, sum(sz) AS szt,
         sum(szz - sz * sz / n) AS ssw
  FROM gm
),
b AS (
  SELECT sum(gm.n * pow(gm.sz / gm.n - t.szt / t.n, 2)) AS ssb
  FROM gm, t
)
SELECT CAST(t.k AS BIGINT) AS k, CAST(t.n AS BIGINT) AS n,
       CASE WHEN t.k >= 2 AND t.n > t.k AND t.ssw > 0
            THEN ((t.n - t.k) / (t.k - 1.0)) * b.ssb / t.ssw END AS w
FROM t, b
"""


# ---------------------------------------------------------------------------
# Cronbach's alpha
# ---------------------------------------------------------------------------


def q_cronbach_lineitem(sf_dir: str):
    """Cronbach's alpha over the four numeric lineitem measures — the
    internal-consistency audit (do these columns co-vary like items of
    one scale?); one moment pass, 2k+3 numbers per batch."""
    from ..stages.robust import cronbach_alpha

    return _materialize(cronbach_alpha(
        _read(sf_dir, "lineitem",
              ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]),
        item_cols=["l_quantity", "l_extendedprice", "l_discount",
                   "l_tax"]))


SQL_CRONBACH_LINEITEM = """
WITH c AS (
  SELECT l_quantity AS a, l_extendedprice AS b,
         l_discount AS c2, l_tax AS d
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    AND l_discount IS NOT NULL AND l_tax IS NOT NULL
),
t AS (
  SELECT count(*) AS n,
         var_samp(a) + var_samp(b) + var_samp(c2) + var_samp(d) AS vi,
         var_samp(a + b + c2 + d) AS vt
  FROM c
)
SELECT CAST(4 AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
       CASE WHEN n >= 2 AND vt > 0
            THEN 4.0 / 3.0 * (1.0 - vi / vt) END AS alpha
FROM t
"""


# ---------------------------------------------------------------------------
# Wald–Wolfowitz runs test on daily traffic direction
# ---------------------------------------------------------------------------


def q_runs_daily_events(sf_dir: str):
    """Runs test on the sign of day-over-day change in daily event
    count — randomness audit of traffic direction (trend/oscillation
    shows up as too few/many runs).  One tiny groupby then a
    vectorized pass over the #days series."""
    from ..stages.robust import runs_test_daily

    return _materialize(runs_test_daily(
        _read(sf_dir, "events", ["ts"]), ts_col="ts"))


SQL_RUNS_DAILY_EVENTS = """
WITH dly AS (
  SELECT date_trunc('day', ts) AS day, count(*) AS n
  FROM events GROUP BY 1
),
df AS (SELECT day, n - lag(n) OVER (ORDER BY day) AS d FROM dly),
sg AS (
  SELECT day, CASE WHEN d > 0 THEN 1 ELSE -1 END AS s
  FROM df WHERE d IS NOT NULL AND d <> 0
),
r AS (SELECT s, lag(s) OVER (ORDER BY day) AS ps FROM sg),
agg AS (
  SELECT sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS np,
         sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS nn,
         1 + sum(CASE WHEN ps IS NOT NULL AND s <> ps
                      THEN 1 ELSE 0 END) AS runs
  FROM r
)
SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
       CAST(runs AS BIGINT) AS n_runs,
       CASE WHEN np > 0 AND nn > 0 AND np + nn > 1
                 AND (2.0 * np * nn / (np + nn) + 1 - 1)
                     * (2.0 * np * nn / (np + nn) + 1 - 2)
                     / (np + nn - 1.0) > 0
            THEN (runs - (2.0 * np * nn / (np + nn) + 1))
                 / sqrt((2.0 * np * nn / (np + nn))
                        * (2.0 * np * nn / (np + nn) - 1)
                        / (np + nn - 1.0))
       END AS z
FROM agg
"""


# ---------------------------------------------------------------------------
# Durbin–Watson per user
# ---------------------------------------------------------------------------


def q_durbin_watson_user(sf_dir: str):
    """Durbin–Watson first-order autocorrelation of each user's
    time-ordered event values (event_id tiebreak for determinism) —
    ≈2 random, →0 sticky, →4 alternating.  One groupby shuffle,
    per-group vectorized kernel."""
    from ..stages.robust import durbin_watson_grouped

    return _materialize(durbin_watson_grouped(
        _read(sf_dir, "events", ["user_id", "ts", "value", "event_id"]),
        by="user_id", ts_col="ts", value_col="value",
        id_col="event_id"))


SQL_DURBIN_WATSON_USER = """
WITH v AS (
  SELECT user_id, value, ts, event_id FROM events
  WHERE value IS NOT NULL
),
l AS (
  SELECT user_id, value,
         value - lag(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS d
  FROM v
),
g AS (
  SELECT user_id, count(*) AS n, sum(d * d) AS sdd,
         sum(value) AS s, sum(value * value) AS ss
  FROM l GROUP BY user_id
)
SELECT user_id, CAST(n AS BIGINT) AS n,
       CASE WHEN n >= 3 AND (ss - s * s / n) > 0
            THEN sdd / (ss - s * s / n) END AS dw
FROM g
"""


QUERIES14: Dict[str, Callable] = {
    "q3_top_unshipped": q_q3_top_unshipped,
    "q12_late_by_priority": q_q12_late_by_priority,
    "q14_promo_share": q_q14_promo_share,
    "q18_big_orders": q_q18_big_orders,
    "levene_value_types": q_levene_value_types,
    "cronbach_lineitem": q_cronbach_lineitem,
    "runs_daily_events": q_runs_daily_events,
    "durbin_watson_user": q_durbin_watson_user,
}

SQL14: Dict[str, str] = {
    "q3_top_unshipped": SQL_Q3_TOP_UNSHIPPED,
    "q12_late_by_priority": SQL_Q12_LATE_BY_PRIORITY,
    "q14_promo_share": SQL_Q14_PROMO_SHARE,
    "q18_big_orders": SQL_Q18_BIG_ORDERS,
    "levene_value_types": SQL_LEVENE_VALUE_TYPES,
    "cronbach_lineitem": SQL_CRONBACH_LINEITEM,
    "runs_daily_events": SQL_RUNS_DAILY_EVENTS,
    "durbin_watson_user": SQL_DURBIN_WATSON_USER,
}
