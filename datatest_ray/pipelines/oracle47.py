"""Driver-contract queries, batch 47 (see oracle.py for the contract):
the Ansari-Bradley two-sample scale test, Atkinson inequality indices,
a tie-stable Lorenz decile curve, a skew-aware fact⨝dimension join,
Adamic-Adar link-prediction scores, conditional-FD violations,
weight-of-evidence / information-value encoding, and a Flesch-style
readability profile.  Merged into ``oracle.queries()`` /
``oracle.oracle_sql()``."""

from __future__ import annotations

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


def q_ansari_bradley_value(sf_dir: str):
    """Ansari-Bradley scale test, events.value click vs purchase
    (stages/stattests.py :: ansari_bradley)."""
    from ..stages.stattests import ansari_bradley

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return _materialize(ansari_bradley(
        ev, value_col="value", group_col="event_type",
        a="click", b="purchase"))


def _fsql(x: str) -> str:
    """SQL mirror of the exact prefix score sum
    f(t) = Σ_{r=1..t} min(r, N+1-r) with c = (N+1)//2 — N and c come
    from the ``t`` relation (nt, c)."""
    return (f"(CASE WHEN ({x}) <= c THEN ({x})*(({x})+1)//2 "
            f"ELSE c*(c+1)//2 + (nt+1)*(({x})-c) "
            f"- (({x})*(({x})+1)//2 - c*(c+1)//2) END)")


SQL_ANSARI_BRADLEY_VALUE = f"""
WITH f AS (
  SELECT value AS v,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS isa
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
g AS (SELECT v, CAST(sum(isa) AS BIGINT) AS ca, count(*) AS cnt
      FROM f GROUP BY v),
t AS (SELECT CAST(sum(cnt) AS BIGINT) AS nt,
             CAST(sum(ca) AS BIGINT) AS na,
             (CAST(sum(cnt) AS BIGINT) + 1) // 2 AS c
      FROM g),
w AS (SELECT ca, cnt,
             CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS hi
      FROM g),
s AS (SELECT w.ca, w.cnt,
             {_fsql('w.hi')} - {_fsql('w.hi - w.cnt')} AS s_blk
      FROM w, t),
m AS (SELECT
        sum(ca * (s_blk / CAST(cnt AS DOUBLE))) AS wst,
        sum(cnt * (s_blk / CAST(cnt AS DOUBLE))
                * (s_blk / CAST(cnt AS DOUBLE))) AS s2
      FROM s)
SELECT na AS n_a, nt - na AS n_b,
       round(wst / na, 6) AS w_mean,
       round((wst - na * CAST({_fsql('nt')} AS DOUBLE) / nt)
             / sqrt(na * (nt - na)
                    * (nt * s2 - CAST({_fsql('nt')} AS DOUBLE)
                                 * {_fsql('nt')})
                    / (CAST(nt AS DOUBLE) * nt * (nt - 1))), 6) AS z
FROM m, t
"""


def q_atkinson_price_priority(sf_dir: str):
    """Atkinson ε=0.5 / ε=1 inequality of o_totalprice per priority
    (stages/stattests.py :: atkinson_index_by_group)."""
    from ..stages.stattests import atkinson_index_by_group

    od = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    return _materialize(atkinson_index_by_group(
        od, by="o_orderpriority", value_col="o_totalprice"))


SQL_ATKINSON_PRICE_PRIORITY = """
WITH f AS (
  SELECT o_orderpriority AS g, o_totalprice AS x
  FROM orders
  WHERE o_totalprice > 0 AND o_orderpriority IS NOT NULL),
a AS (SELECT g, count(*) AS n,
             CAST(sum(CAST(round(x * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 / count(*) AS mu,
             sum(sqrt(x)) / count(*) AS msqrt,
             sum(ln(x)) / count(*) AS mlog
      FROM f GROUP BY g)
SELECT g AS o_orderpriority, CAST(n AS BIGINT) AS n,
       round(1.0 - (msqrt * msqrt) / mu, 6) AS atkinson_half,
       round(1.0 - exp(mlog) / mu, 6) AS atkinson_one
FROM a
"""


def q_lorenz_price(sf_dir: str):
    """Lorenz decile curve over o_totalprice, tie-stable buckets
    (stages/stattests.py :: lorenz_deciles)."""
    from ..stages.stattests import lorenz_deciles

    od = _read(sf_dir, "orders", ["o_totalprice"])
    return _materialize(lorenz_deciles(od, value_col="o_totalprice"))


SQL_LORENZ_PRICE = """
WITH f AS (SELECT o_totalprice AS v FROM orders
           WHERE o_totalprice IS NOT NULL),
g AS (SELECT v, count(*) AS cnt,
             CAST(round(v * 100) AS BIGINT) AS cents
      FROM f GROUP BY v),
w AS (SELECT cents, cnt,
             CAST(sum(cnt) OVER (ORDER BY v) - cnt AS BIGINT)
               AS cum_before
      FROM g),
t AS (SELECT CAST(sum(cnt) AS BIGINT) AS nt FROM g),
b AS (SELECT (10 * cum_before) // nt AS bucket,
             CAST(sum(cnt) AS BIGINT) AS n,
             CAST(sum(cents * cnt) AS BIGINT) AS s
      FROM w, t GROUP BY 1),
tot AS (SELECT CAST(sum(s) AS BIGINT) AS ts FROM b)
SELECT CAST(bucket AS BIGINT) AS bucket, n,
       round(CAST(s AS DOUBLE) / ts, 6) AS share,
       round(CAST(sum(s) OVER (ORDER BY bucket) AS BIGINT)
             / CAST(ts AS DOUBLE), 6) AS cum_share
FROM b, tot
"""


def q_skewjoin_supplier_revenue(sf_dir: str):
    """Skew-aware lineitem⨝supplier join (hot keys broadcast, cold
    keys bucketed lookup), revenue per nation
    (stages/relational.py :: skew_join)."""
    from ray.data.aggregate import Sum

    from ..stages.relational import skew_join

    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice"])
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    j = skew_join(li, sup, on="l_suppkey", right_on="s_suppkey",
                  right_cols=["s_nationkey"], how="inner", hot_k=4)

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "s_nationkey": pc.cast(t.column("s_nationkey"), pa.int64()),
            "c": pc.cast(pc.round(pc.multiply(
                t.column("l_extendedprice"), 100.0)), pa.int64()),
            "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        })

    agg = (j.map_batches(cents, batch_format="pyarrow",
                         zero_copy_batch=True)
           .groupby("s_nationkey")
           .aggregate(Sum("c", alias_name="cents"),
                      Sum("one", alias_name="n")))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("s_nationkey", pa.int64()),
                            ("n", pa.int64()), ("revenue", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        return pa.table({
            "s_nationkey": pc.cast(t.column("s_nationkey"), pa.int64()),
            "n": pc.cast(t.column("n"), pa.int64()),
            "revenue": pc.divide(
                pc.cast(t.column("cents"), pa.float64()), 100.0),
        })

    return _materialize(agg.map_batches(finalize, batch_format="pyarrow"))


SQL_SKEWJOIN_SUPPLIER_REVENUE = """
SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
         / 100.0 AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY 1
"""


def q_adamic_adar_suppliers(sf_dir: str):
    """Adamic-Adar supplier-pair scores over shared parts
    (stages/graph.py :: adamic_adar)."""
    from ..stages.graph import adamic_adar

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    return _materialize(adamic_adar(
        li, group_col="l_partkey", node_col="l_suppkey"))


SQL_ADAMIC_ADAR_SUPPLIERS = """
WITH e AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
d AS (SELECT p, count(*) AS deg FROM e GROUP BY p),
pr AS (SELECT a.s AS u, b.s AS v, d.deg AS deg
       FROM e a JOIN e b ON a.p = b.p AND a.s < b.s
       JOIN d ON d.p = a.p
       WHERE d.deg >= 2)
SELECT u, v, CAST(count(*) AS BIGINT) AS n_common,
       round(sum(1.0 / ln(deg)), 6) AS aa
FROM pr GROUP BY u, v
"""


def q_cfd_lineitem(sf_dir: str):
    """Conditional FD audit: within each returnflag regime, orderkeys
    whose lines take >1 linestatus (stages/mlprep.py ::
    cfd_violations)."""
    from ..stages.mlprep import cfd_violations

    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_orderkey", "l_linestatus"])
    return _materialize(cfd_violations(
        li, cond_col="l_returnflag", det_col="l_orderkey",
        dep_col="l_linestatus"))


SQL_CFD_LINEITEM = """
SELECT l_returnflag, l_orderkey,
       CAST(count(DISTINCT l_linestatus) AS BIGINT) AS n_vals
FROM lineitem
GROUP BY 1, 2
HAVING count(DISTINCT l_linestatus) > 1
"""


def q_woe_mktsegment(sf_dir: str):
    """WoE / IV of market segment vs finished-order flag
    (stages/mlprep.py :: woe_iv over a broadcast dimension join)."""
    from ..stages.mlprep import woe_iv
    from ..stages.relational import broadcast_join

    od = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    j = broadcast_join(od, cust, on="o_custkey", right_on="c_custkey",
                       right_cols=["c_mktsegment"], how="inner")

    def flag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "flag", pc.equal(t.column("o_orderstatus"), "F"))

    flagged = j.map_batches(flag, batch_format="pyarrow",
                            zero_copy_batch=True)
    return _materialize(woe_iv(
        flagged, cat_col="c_mktsegment", flag_col="flag"))


SQL_WOE_MKTSEGMENT = """
WITH f AS (
  SELECT c_mktsegment AS g,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS fl
  FROM orders JOIN customer ON o_custkey = c_custkey),
a AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(fl) AS BIGINT) AS np
      FROM f GROUP BY g),
t AS (SELECT CAST(sum(np) AS DOUBLE) AS pt,
             CAST(sum(n - np) AS DOUBLE) AS nt
      FROM a)
SELECT g AS c_mktsegment, n, np AS n_pos,
       round(ln(((np + 0.5) / pt) / (((n - np) + 0.5) / nt)), 6) AS woe,
       round((np / pt - (n - np) / nt)
             * ln(((np + 0.5) / pt) / (((n - np) + 0.5) / nt)), 6)
         AS iv_term
FROM a, t
"""


def q_readability_docs(sf_dir: str):
    """Flesch-style readability per language
    (stages/text.py :: readability_by_lang)."""
    from ..stages.text import readability_by_lang

    docs = _read(sf_dir, "documents", ["lang", "text"])
    return _materialize(readability_by_lang(
        docs, text_col="text", lang_col="lang"))


SQL_READABILITY_DOCS = r"""
WITH f AS (
  SELECT lang,
         len(regexp_extract_all(text, '\S+')) AS w,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
         len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS y
  FROM documents WHERE lang IS NOT NULL),
g AS (SELECT * FROM f WHERE w > 0)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(sum(w) AS BIGINT) / CAST(sum(s) AS DOUBLE), 6)
         AS words_per_sent,
       round(CAST(sum(y) AS BIGINT) / CAST(sum(w) AS DOUBLE), 6)
         AS syll_per_word,
       round(avg(206.835 - 1.015 * w / s - 84.6 * CAST(y AS DOUBLE) / w), 6)
         AS flesch
FROM g GROUP BY lang
"""


QUERIES47: Dict[str, Callable] = {
    "ansari_bradley_value": q_ansari_bradley_value,
    "atkinson_price_priority": q_atkinson_price_priority,
    "lorenz_price": q_lorenz_price,
    "skewjoin_supplier_revenue": q_skewjoin_supplier_revenue,
    "adamic_adar_suppliers": q_adamic_adar_suppliers,
    "cfd_lineitem": q_cfd_lineitem,
    "woe_mktsegment": q_woe_mktsegment,
    "readability_docs": q_readability_docs,
}

SQL47: Dict[str, str] = {
    "ansari_bradley_value": SQL_ANSARI_BRADLEY_VALUE,
    "atkinson_price_priority": SQL_ATKINSON_PRICE_PRIORITY,
    "lorenz_price": SQL_LORENZ_PRICE,
    "skewjoin_supplier_revenue": SQL_SKEWJOIN_SUPPLIER_REVENUE,
    "adamic_adar_suppliers": SQL_ADAMIC_ADAR_SUPPLIERS,
    "cfd_lineitem": SQL_CFD_LINEITEM,
    "woe_mktsegment": SQL_WOE_MKTSEGMENT,
    "readability_docs": SQL_READABILITY_DOCS,
}
