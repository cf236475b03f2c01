"""Driver-contract queries: each engine operator exposed as a callable
over the TPC-H-ish parquet tables, paired with an ANSI-SQL oracle that
DuckDB runs on the same data (SURVEY.md §5.2; FIXTURES.md §F3).

Every callable takes ``sf_dir`` and returns a ray.data.Dataset whose
column NAMES and VALUES match the oracle SQL exactly (the driver's
compare hashes values after sorting columns by name).

These run the REAL engine paths (CheckSuite / checks / groupby plans) —
they are not reimplementations; the SQL is the independent oracle.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

REGION_NAMES = {"AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"}
LANGS = {"en", "de", "zh", "fr", "es"}
_EN = "'the','and','of','to','a','in','is','it','that','for'"


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _run_check(check, ds, select, ctx=None):
    """Run one check via the real CheckSuite plan and collect the
    violation rows (violations are the small OUTPUT of the pipeline —
    collecting them is the standard consume; the input is never
    materialized)."""
    from ..stages.base import RunContext
    from .suite import CheckSuite

    result = CheckSuite([check], ctx or RunContext()).run(ds)
    return result.to_table().select(select)


# ---------------------------------------------------------------------------
# Interval checks (SURVEY.md §2.B5)
# ---------------------------------------------------------------------------


def q_interval_quantity(sf_dir: str):
    from ..stages.row_checks import IntervalCheck

    ds = _read(sf_dir, "lineitem", ["l_quantity"])
    return _run_check(
        IntervalCheck("l_quantity", min=1, max=30), ds,
        ["value_num", "expected_num", "deviation", "kind"],
    )


SQL_INTERVAL_QUANTITY = """
SELECT CAST(l_quantity AS DOUBLE) AS value_num,
       CASE WHEN l_quantity < 1 THEN CAST(1 AS DOUBLE) ELSE CAST(30 AS DOUBLE) END AS expected_num,
       CAST(l_quantity AS DOUBLE) - (CASE WHEN l_quantity < 1 THEN 1 ELSE 30 END) AS deviation,
       'deviation' AS kind
FROM lineitem
WHERE l_quantity < 1 OR l_quantity > 30
"""


def q_interval_discount(sf_dir: str):
    from ..stages.row_checks import IntervalCheck

    ds = _read(sf_dir, "lineitem", ["l_discount"])
    return _run_check(
        IntervalCheck("l_discount", min=0.0, max=0.05), ds,
        ["value_num", "expected_num", "deviation", "kind"],
    )


SQL_INTERVAL_DISCOUNT = """
SELECT CAST(l_discount AS DOUBLE) AS value_num,
       CASE WHEN l_discount IS NULL THEN NULL
            WHEN l_discount < 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(0.05 AS DOUBLE) END AS expected_num,
       l_discount - (CASE WHEN l_discount < 0 THEN 0 ELSE 0.05 END) AS deviation,
       CASE WHEN l_discount IS NULL THEN 'invalid' ELSE 'deviation' END AS kind
FROM lineitem
WHERE l_discount < 0 OR l_discount > 0.05 OR l_discount IS NULL
"""


def q_method_interval_extprice(sf_dir: str):
    """Exercises the EXPLICIT-METHOD Dataset dispatch (``validate.interval``
    on a ray.data.Dataset — round-1 verdict gap #1), not the Check class
    directly: the ValidationError's differences are converted back to
    rows for the oracle compare."""
    from ..differences import ValidationError
    from .validate import validate

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    try:
        validate.interval(ds, min=1000.0, max=90000.0,
                          columns=["l_extendedprice"])
    except ValidationError as e:
        devs = [float(d.deviation) for d in e.differences]
        exps = [float(d.expected) for d in e.differences]
        return pa.table({
            "deviation": pa.array(devs, pa.float64()),
            "expected_num": pa.array(exps, pa.float64()),
        })
    return pa.table({"deviation": pa.array([], pa.float64()),
                     "expected_num": pa.array([], pa.float64())})


SQL_METHOD_INTERVAL_EXTPRICE = """
SELECT l_extendedprice - (CASE WHEN l_extendedprice < 1000 THEN 1000 ELSE 90000 END) AS deviation,
       CASE WHEN l_extendedprice < 1000 THEN CAST(1000 AS DOUBLE) ELSE CAST(90000 AS DOUBLE) END AS expected_num
FROM lineitem
WHERE l_extendedprice < 1000 OR l_extendedprice > 90000
"""


# ---------------------------------------------------------------------------
# Regex check (§2.B2) with row lineage
# ---------------------------------------------------------------------------


def q_regex_lang(sf_dir: str):
    from ..stages.base import RunContext
    from ..stages.row_checks import RegexCheck

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    return _run_check(
        RegexCheck("lang", r"^(en|de|fr)$"), ds,
        ["row_ref", "value", "kind"],
        ctx=RunContext(row_ref_col="doc_id"),
    )


SQL_REGEX_LANG = """
SELECT CAST(doc_id AS VARCHAR) AS row_ref, lang AS value, 'invalid' AS kind
FROM documents
WHERE NOT regexp_matches(lang, '^(en|de|fr)$')
"""


# ---------------------------------------------------------------------------
# Set membership, two-sided (§2.A1/B6)
# ---------------------------------------------------------------------------


def q_set_region(sf_dir: str):
    from ..stages.global_checks import SetCheck

    ds = _read(sf_dir, "region", ["r_name"])
    required = REGION_NAMES | {"ATLANTIS"}
    return _run_check(SetCheck("r_name", required), ds, ["value", "kind"])


SQL_SET_REGION = """
WITH req(v) AS (VALUES ('AFRICA'),('AMERICA'),('ASIA'),('EUROPE'),('MIDDLE EAST'),('ATLANTIS')),
  extras AS (
    SELECT DISTINCT r_name AS value, 'extra' AS kind FROM region
    WHERE r_name NOT IN (SELECT v FROM req)),
  missings AS (
    SELECT v AS value, 'missing' AS kind FROM req
    WHERE v NOT IN (SELECT r_name FROM region))
SELECT * FROM extras UNION ALL SELECT * FROM missings
"""


# ---------------------------------------------------------------------------
# Uniqueness (§2.B9): pre-aggregated groupby-count
# ---------------------------------------------------------------------------


def q_unique_orderkey(sf_dir: str):
    from ..stages.global_checks import UniqueCheck

    ds = _read(sf_dir, "lineitem", ["l_orderkey"])
    return _run_check(
        UniqueCheck("l_orderkey"), ds, ["value_num", "deviation", "kind"]
    )


SQL_UNIQUE_ORDERKEY = """
SELECT CAST(l_orderkey AS DOUBLE) AS value_num,
       CAST(count(*) - 1 AS DOUBLE) AS deviation,
       'extra' AS kind
FROM lineitem GROUP BY l_orderkey HAVING count(*) > 1
"""


# ---------------------------------------------------------------------------
# Referential subset / superset (§2.B7/B8): union-tag anti-join
# ---------------------------------------------------------------------------


def q_subset_nationkey_region(sf_dir: str):
    from ..stages.global_checks import SubsetCheck

    data = _read(sf_dir, "nation", ["n_nationkey"])
    ref = _read(sf_dir, "region", ["r_regionkey"])
    return _run_check(
        SubsetCheck("n_nationkey", (ref, "r_regionkey")), data,
        ["value_num", "kind"],
    )


SQL_SUBSET_NATIONKEY_REGION = """
SELECT CAST(n_nationkey AS DOUBLE) AS value_num, 'extra' AS kind
FROM (SELECT DISTINCT n_nationkey FROM nation
      WHERE n_nationkey NOT IN (SELECT r_regionkey FROM region))
"""


def q_subset_fk_customer_nation(sf_dir: str):
    from ..stages.global_checks import SubsetCheck

    data = _read(sf_dir, "customer", ["c_nationkey"])
    ref = _read(sf_dir, "nation", ["n_nationkey"])
    return _run_check(
        SubsetCheck("c_nationkey", (ref, "n_nationkey")), data,
        ["value_num", "kind"],
    )


SQL_SUBSET_FK_CUSTOMER_NATION = """
SELECT CAST(c_nationkey AS DOUBLE) AS value_num, 'extra' AS kind
FROM (SELECT DISTINCT c_nationkey FROM customer
      WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))
"""


def q_superset_lang(sf_dir: str):
    from ..stages.global_checks import SupersetCheck

    ds = _read(sf_dir, "documents", ["lang"])
    return _run_check(
        SupersetCheck("lang", LANGS | {"pt"}), ds, ["value", "kind"]
    )


SQL_SUPERSET_LANG = """
WITH req(v) AS (VALUES ('en'),('de'),('zh'),('fr'),('es'),('pt'))
SELECT v AS value, 'missing' AS kind FROM req
WHERE v NOT IN (SELECT DISTINCT lang FROM documents)
"""


# ---------------------------------------------------------------------------
# Composed validation report (§2.A/B + §3.1): FIVE checks in ONE CheckSuite
# pass — stateless checks fused into a single input scan, global checks as
# pre-aggregated shuffle branches — reduced to per-(check, kind) counts.
# This is the engine's headline call shape (validate() over a whole table).
# ---------------------------------------------------------------------------


def q_validation_report(sf_dir: str):
    from ..stages.base import RunContext
    from ..stages.global_checks import SetCheck, UniqueCheck
    from ..stages.row_checks import DomainCheck, IntervalCheck
    from .suite import CheckSuite

    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_quantity", "l_discount",
                "l_returnflag", "l_linestatus"])
    from ray.data.aggregate import Sum

    suite = CheckSuite([
        IntervalCheck("l_quantity", min=1, max=30),
        IntervalCheck("l_discount", min=0.0, max=0.05),
        DomainCheck("l_returnflag", {"A", "N"}),
        UniqueCheck("l_orderkey"),
        SetCheck("l_linestatus", {"O", "F", "X"}),
    ], RunContext())
    violations = suite.run(ds).violations

    # reduce DISTRIBUTED: per-batch (check_id, kind) counts -> one tiny
    # groupby-sum -> collect only the count rows (never ~40% of the
    # input as violation rows onto the driver)
    def partial(t: pa.Table) -> pa.Table:
        g = t.select(["check_id", "kind"]).group_by(
            ["check_id", "kind"]).aggregate([("kind", "count")])
        return pa.table({
            "check_id": g.column("check_id"),
            "kind": g.column("kind"),
            "n": pc.cast(g.column("kind_count"), pa.int64()),
        })

    agg = (
        violations.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
        .groupby(["check_id", "kind"]).aggregate(Sum("n", alias_name="n"))
    )
    t = _materialize(agg, empty_schema=pa.schema(
        [("check_id", pa.string()), ("kind", pa.string()),
         ("n", pa.int64())]))
    return pa.table({
        "check_id": t.column("check_id"),
        "kind": t.column("kind"),
        "n_violations": t.column("n"),
    }).sort_by([("check_id", "ascending"), ("kind", "ascending")])


SQL_VALIDATION_REPORT = """
WITH v(check_id, kind, n) AS (
  SELECT 'interval(l_quantity,1,30)', 'deviation', count(*)
  FROM lineitem WHERE l_quantity < 1 OR l_quantity > 30
  UNION ALL
  SELECT 'interval(l_discount,0.0,0.05)', 'deviation', count(*)
  FROM lineitem WHERE l_discount < 0.0 OR l_discount > 0.05
  UNION ALL
  SELECT 'interval(l_discount,0.0,0.05)', 'invalid', count(*)
  FROM lineitem WHERE l_discount IS NULL
  UNION ALL
  SELECT 'domain(l_returnflag,2 allowed)', 'extra', count(*)
  FROM lineitem WHERE l_returnflag NOT IN ('A', 'N')
  UNION ALL
  SELECT 'unique(l_orderkey)', 'extra', count(*)
  FROM (SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING count(*) > 1)
  UNION ALL
  SELECT 'set(l_linestatus,3)', 'extra', count(*)
  FROM (SELECT DISTINCT l_linestatus FROM lineitem
        WHERE l_linestatus NOT IN ('O', 'F', 'X'))
  UNION ALL
  SELECT 'set(l_linestatus,3)', 'missing', count(*)
  FROM (SELECT v FROM (VALUES ('O'),('F'),('X')) req(v)
        WHERE v NOT IN (SELECT DISTINCT l_linestatus FROM lineitem))
)
SELECT check_id, kind, CAST(n AS BIGINT) AS n_violations
FROM v WHERE n > 0
"""


def q_rare_categories(sf_dir: str):
    """RareCategoryCheck over a category column with a deterministically
    planted rare value (orderkey % 997 -> 'PRIORITY-GLITCH', ~0.1%
    share at every scale), so the below-min-share path is exercised
    with non-empty output regardless of sf."""
    from ..stages.base import RunContext
    from ..stages.global_checks import RareCategoryCheck

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def derive(t: pa.Table) -> pa.Table:
        key = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        glitch = pa.array(key % 997 == 0)
        cat = pc.if_else(glitch, pa.scalar("PRIORITY-GLITCH"),
                         t.column("o_orderpriority").combine_chunks())
        return pa.table({"cat": cat})

    ds = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    check = RareCategoryCheck("cat", min_share=0.01)
    return _run_check(check, ds, ["value", "value_num", "deviation", "kind"])


SQL_RARE_CATEGORIES = """
WITH d AS (
  SELECT CASE WHEN o_orderkey % 997 = 0 THEN 'PRIORITY-GLITCH'
              ELSE o_orderpriority END AS cat
  FROM orders
), c AS (
  SELECT cat, count(*) AS n FROM d GROUP BY 1
), t AS (
  SELECT CAST(sum(n) AS DOUBLE) AS tot FROM c
)
SELECT cat AS value, CAST(n AS DOUBLE) AS value_num,
       n / tot - 0.01 AS deviation, 'invalid' AS kind
FROM c, t WHERE n / tot < 0.01
"""


def q_pack_contexts(sf_dir: str):
    from ..stages.text import pack_contexts

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    return _materialize(
        pack_contexts(ds, "text", "doc_id", group_col="lang", budget=512)
    )


SQL_PACK_CONTEXTS = r"""
WITH tok AS (
  SELECT doc_id, lang,
         CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) = '' THEN 0
              ELSE len(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\s+')) END AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, lang, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM tok
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST((cum - n_tokens) // 512 AS BIGINT) AS first_bin,
       CAST(CASE WHEN n_tokens = 0 THEN (cum - n_tokens) // 512
                 ELSE (cum - 1) // 512 END AS BIGINT) AS last_bin
FROM c
"""


def q_mix_weights(sf_dir: str):
    from ..pipelines.corpus import mixture_weights

    return mixture_weights(_read(sf_dir, "documents", ["lang", "text"]),
                           text_col="text", group_col="lang")


SQL_MIX_WEIGHTS = r"""
WITH tok AS (
  SELECT lang,
         CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) = '' THEN 0
              ELSE len(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\s+')) END AS n
  FROM documents
), c AS (
  SELECT lang, CAST(sum(n) AS BIGINT) AS n_tokens FROM tok GROUP BY 1
), s AS (
  SELECT CAST(sum(n_tokens) AS DOUBLE) AS tot,
         sum(CASE WHEN n_tokens > 0
                  THEN (SELECT CAST(sum(n_tokens) AS DOUBLE) FROM c) / n_tokens
             END) AS inv_sum
  FROM c
)
SELECT lang, n_tokens,
       CASE WHEN n_tokens = 0 THEN NULL ELSE n_tokens / tot END AS share,
       CASE WHEN n_tokens = 0 THEN NULL
            ELSE (tot / n_tokens) / inv_sum END AS weight
FROM c, s
"""


def q_quality_funnel(sf_dir: str):
    from ..pipelines.corpus import quality_funnel

    return quality_funnel(_read(sf_dir, "documents", ["doc_id", "text"]))


SQL_QUALITY_FUNNEL = f"""
WITH b AS (SELECT doc_id, text,
             CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) = '' THEN []
                  ELSE string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+') END AS ts
           FROM documents),
s AS (SELECT len(ts) AS n_tokens, length(text) AS n_chars,
       length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct,
       len(list_filter(ts, t -> list_contains([{_EN}], t))) AS stop_hits
      FROM b),
f AS (SELECT CASE
        WHEN n_tokens < 20 THEN 1
        WHEN n_tokens > 90 THEN 2
        WHEN stop_hits::DOUBLE / greatest(n_tokens, 1) < 0.03 THEN 3
        WHEN 0.5*(least(n_tokens,100)/100.0)
             + 0.3*(stop_hits::DOUBLE/greatest(n_tokens,1))
             + 0.2*(1 - punct::DOUBLE/greatest(n_chars,1)) < 0.55 THEN 4
        ELSE 0 END AS fail
      FROM s),
c AS (SELECT fail, count(*) AS n FROM f GROUP BY 1),
t AS (SELECT count(*) AS total FROM f)
SELECT CAST(st.stage AS BIGINT) AS stage, st.rule,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n_dropped,
       CAST(t.total - (SELECT coalesce(sum(n), 0) FROM c
                       WHERE fail BETWEEN 1 AND st.stage) AS BIGINT)
         AS n_remaining
FROM (VALUES (1, 'too_short'), (2, 'too_long'),
             (3, 'low_stopword'), (4, 'low_quality')) st(stage, rule)
LEFT JOIN c ON c.fail = st.stage
CROSS JOIN t
"""


def q_completeness_events(sf_dir: str):
    """CompletenessCheck over columns with deterministically planted
    nulls (click events / small values nulled), plus one fully-present
    column that must NOT be flagged."""
    from ..stages.base import RunContext
    from ..stages.global_checks import CompletenessCheck

    ds = _read(sf_dir, "events", ["event_type", "value", "user_id"])

    def derive(t: pa.Table) -> pa.Table:
        et = t.column("event_type").combine_chunks()
        val = t.column("value").combine_chunks()
        return pa.table({
            "et": pc.if_else(pc.equal(et, "click"), pa.scalar(None, pa.string()), et),
            "v": pc.if_else(pc.less(val, 10.0), pa.scalar(None, pa.float64()), val),
            "u": t.column("user_id"),
        })

    ds = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    check = CompletenessCheck(["et", "v", "u"], max_null_share=0.05)
    return _run_check(check, ds, ["key", "value_num", "deviation", "kind"])


SQL_COMPLETENESS_EVENTS = """
WITH d AS (
  SELECT NULLIF(event_type, 'click') AS et,
         CASE WHEN value < 10 THEN NULL ELSE value END AS v,
         user_id AS u
  FROM events
), c(key, n_null, total) AS (
  SELECT 'et', count(*) - count(et), count(*) FROM d
  UNION ALL
  SELECT 'v', count(*) - count(v), count(*) FROM d
  UNION ALL
  SELECT 'u', count(*) - count(u), count(*) FROM d
)
SELECT key, CAST(n_null AS DOUBLE) AS value_num,
       CAST(n_null AS DOUBLE) / total - 0.05 AS deviation,
       'missing' AS kind
FROM c WHERE CAST(n_null AS DOUBLE) / total > 0.05
"""


def q_zipf_slope(sf_dir: str):
    from ..stages.text import zipf_slope

    return _materialize(
        zipf_slope(_read(sf_dir, "documents", ["lang", "text"]),
                   "text", group_col="lang")
    )


SQL_ZIPF_SLOPE = r"""
WITH tok AS (
  SELECT lang,
         unnest(CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) = '' THEN []
                     ELSE string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\s+')
                END) AS token
  FROM documents
), c AS (
  SELECT lang, token, count(*) AS n FROM tok GROUP BY 1, 2
), r AS (
  SELECT lang, ln(n) AS y,
         ln(row_number() OVER (PARTITION BY lang
                               ORDER BY n DESC, token)) AS x
  FROM c
)
SELECT lang, CAST(count(*) AS BIGINT) AS vocab,
       CASE WHEN count(*) > 1
            THEN (sum(x*y) - sum(x)*sum(y)/count(*))
                 / NULLIF(sum(x*x) - sum(x)*sum(x)/count(*), 0)
       END AS slope
FROM r GROUP BY lang
"""


def q_pack_greedy(sf_dir: str):
    from ..stages.text import pack_greedy

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    return _materialize(
        pack_greedy(ds, "text", "doc_id", group_col="lang", budget=256)
    )


SQL_PACK_GREEDY = r"""
WITH RECURSIVE tok AS (
  SELECT doc_id, lang,
         CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) = '' THEN 0
              ELSE len(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\s+')) END AS n_tokens
  FROM documents
), o AS (
  SELECT doc_id, lang, n_tokens,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM tok
), p AS (
  SELECT doc_id, lang, n_tokens, rn,
         0 AS bin, n_tokens AS filled
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.doc_id, o.lang, o.n_tokens, o.rn,
         CASE WHEN p.filled + o.n_tokens > 256 AND p.filled > 0
              THEN p.bin + 1 ELSE p.bin END,
         CASE WHEN p.filled + o.n_tokens > 256 AND p.filled > 0
              THEN o.n_tokens ELSE p.filled + o.n_tokens END
  FROM o JOIN p ON o.lang = p.lang AND o.rn = p.rn + 1
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(bin AS BIGINT) AS bin
FROM p
"""


def q_boilerplate_ngrams(sf_dir: str):
    from ..stages.text import boilerplate_ngrams

    return _materialize(
        boilerplate_ngrams(_read(sf_dir, "documents", ["text"]), "text",
                           n=5, k=20)
    )


SQL_BOILERPLATE_NGRAMS = r"""
WITH b AS (
  SELECT CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) = '' THEN []
              ELSE string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\s+') END AS ts
  FROM documents
), g AS (
  SELECT array_to_string(ts[i:i+4], ' ') AS gram
  FROM (SELECT ts, unnest(range(1, len(ts) - 3)) AS i
        FROM b WHERE len(ts) >= 5)
), c AS (
  SELECT gram, count(*) AS n FROM g GROUP BY 1
)
SELECT gram, CAST(n AS BIGINT) AS n
FROM c ORDER BY n DESC, gram LIMIT 20
"""


# ---------------------------------------------------------------------------
# Grouped aggregation (§2.H): shuffle groupby with built-in aggregates
# ---------------------------------------------------------------------------


def q_agg_returnflag(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])

    # Sum in integer cents so the result is independent of float64
    # summation order (distributed partial sums associate differently
    # than DuckDB's single pass); divide back to currency at the end.
    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "qty_c": pc.cast(pc.round(pc.multiply(t.column("l_quantity"), 100.0)),
                             pa.int64()),
            "price_c": pc.cast(pc.round(pc.multiply(t.column("l_extendedprice"), 100.0)),
                               pa.int64()),
        })

    agg = ds.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True)
    agg = agg.groupby("l_returnflag").aggregate(
        Sum("qty_c", alias_name="sum_qty_c"),
        Sum("price_c", alias_name="sum_price_c"),
        Count(alias_name="n"),
    )

    def from_cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "sum_qty": pc.divide(pc.cast(t.column("sum_qty_c"), pa.float64()), 100.0),
            "sum_price": pc.divide(pc.cast(t.column("sum_price_c"), pa.float64()), 100.0),
            "n": t.column("n"),
        })

    return agg.map_batches(from_cents, batch_format="pyarrow", zero_copy_batch=True)


SQL_AGG_RETURNFLAG = """
SELECT l_returnflag,
       sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_price,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Drift histogram partials (§2.I): per-batch bucketing, then a small groupby
# ---------------------------------------------------------------------------


def q_hist_price(sf_dir: str):
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])

    def bucketize(t: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.floor(pc.divide(t.column("l_extendedprice"), 5000.0)), pa.int64()
        )
        return pa.table({"bucket": b})

    ds = ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
    return ds.groupby("bucket").aggregate(Count(alias_name="n"))


SQL_HIST_PRICE = """
SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bucket, count(*) AS n
FROM lineitem GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Explicit-method checks: approx (§2.B3), tuple (§2.A7), predicate (§2.A2)
# ---------------------------------------------------------------------------


def q_approx_tax(sf_dir: str):
    from ..stages.row_checks import ApproxCheck

    ds = _read(sf_dir, "lineitem", ["l_tax"])
    return _run_check(
        ApproxCheck("l_tax", 0.04, delta=0.03), ds,
        ["value_num", "expected_num", "deviation", "kind"],
    )


SQL_APPROX_TAX = """
SELECT CAST(l_tax AS DOUBLE) AS value_num, CAST(0.04 AS DOUBLE) AS expected_num,
       l_tax - 0.04 AS deviation, 'deviation' AS kind
FROM lineitem WHERE NOT abs(l_tax - 0.04) <= 0.03
"""


def q_tuple_orders(sf_dir: str):
    from ..stages.row_checks import TupleCheck
    import re as _re

    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])
    return _run_check(
        TupleCheck(
            ["o_orderstatus", "o_orderpriority"],
            ({"O", "F"}, _re.compile(r"^[123]-")),
        ),
        ds,
        ["value", "kind"],
    )


SQL_TUPLE_ORDERS = """
SELECT '(' || chr(39) || o_orderstatus || chr(39) || ', ' || chr(39) || o_orderpriority || chr(39) || ')' AS value,
       'invalid' AS kind
FROM orders
WHERE NOT (o_orderstatus IN ('O','F') AND regexp_matches(o_orderpriority, '^[123]-'))
"""


def q_predicate_custkey(sf_dir: str):
    from ..stages.row_checks import PredicateCheck

    ds = _read(sf_dir, "customer", ["c_custkey"])
    return _run_check(
        PredicateCheck("c_custkey", lambda v: v % 3 != 0, check_id="pred_mod3"),
        ds,
        ["value_num", "kind"],
    )


SQL_PREDICATE_CUSTKEY = """
SELECT CAST(c_custkey AS DOUBLE) AS value_num, 'invalid' AS kind
FROM customer WHERE c_custkey % 3 = 0
"""


# ---------------------------------------------------------------------------
# Mapping / per-key aggregate requirement (§2.A10 decomposable fast path)
# ---------------------------------------------------------------------------


def q_group_mean_qty(sf_dir: str):
    from ..stages.base import RunContext
    from ..stages.mapping import GroupAggCheck

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    return _run_check(
        GroupAggCheck("l_quantity", "l_returnflag", "mean", min=25.3, max=25.6),
        ds,
        ["key", "value_num", "expected_num", "deviation", "kind"],
    )


SQL_GROUP_MEAN_QTY = """
SELECT l_returnflag AS key, avg(l_quantity) AS value_num,
  CASE WHEN avg(l_quantity) < 25.3 THEN 25.3 ELSE 25.6 END AS expected_num,
  avg(l_quantity) - (CASE WHEN avg(l_quantity) < 25.3 THEN 25.3 ELSE 25.6 END) AS deviation,
  'deviation' AS kind
FROM lineitem GROUP BY l_returnflag
HAVING avg(l_quantity) < 25.3 OR avg(l_quantity) > 25.6
"""


# ---------------------------------------------------------------------------
# Sort / limit: global top-k (§2.H)
# ---------------------------------------------------------------------------


def q_topk_price(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


SQL_TOPK_PRICE = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# ---------------------------------------------------------------------------
# Text analysis (engine extensions; stages/text.py)
# ---------------------------------------------------------------------------

_DE = "'der','die','das','und','ist','nicht','mit','ein','zu','den'"
_FR = "'le','la','les','et','est','une','dans','pour','que','au'"
_ES = "'el','los','las','y','es','una','en','para','por','con'"
_ZH = "'\u7684','\u662f','\u5728','\u4e86','\u548c','\u6709','\u6211','\u4e0d','\u4eba','\u8fd9'"


def q_text_tokens(sf_dir: str):
    from ..stages.text import token_counts

    return _materialize(token_counts(_read(sf_dir, "documents", ["doc_id", "text"]),
                                     "text", "doc_id"))


SQL_TEXT_TOKENS = """
SELECT doc_id,
       CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) = '' THEN 0
            ELSE len(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\s+')) END AS n_tokens
FROM documents
"""


def q_text_quality(sf_dir: str):
    from ..stages.text import text_stats

    return _materialize(text_stats(_read(sf_dir, "documents", ["doc_id", "text"]),
                                   "text", "doc_id"))


SQL_TEXT_QUALITY = f"""
WITH b AS (SELECT doc_id, text,
             CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) = '' THEN []
                  ELSE string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\s+') END AS ts
           FROM documents),
s AS (SELECT doc_id, len(ts) AS n_tokens, length(text) AS n_chars,
       length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct,
       len(list_filter(ts, t -> list_contains([{_EN}], t))) AS stop_hits
      FROM b)
SELECT doc_id, n_tokens, n_chars, punct, stop_hits,
  0.5*(least(n_tokens,100)/100.0) + 0.3*(stop_hits::DOUBLE/greatest(n_tokens,1))
  + 0.2*(1 - punct::DOUBLE/greatest(n_chars,1)) AS quality FROM s
"""


def q_text_lang_id(sf_dir: str):
    from ..stages.text import lang_id

    return _materialize(lang_id(_read(sf_dir, "documents", ["doc_id", "text"]),
                                "text", "doc_id"))


SQL_TEXT_LANG_ID = f"""
WITH b AS (SELECT doc_id,
             CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) = '' THEN []
                  ELSE string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\s+') END AS ts
           FROM documents),
s AS (SELECT doc_id,
  len(list_filter(ts, t -> list_contains([{_EN}], t))) AS s_en,
  len(list_filter(ts, t -> list_contains([{_DE}], t))) AS s_de,
  len(list_filter(ts, t -> list_contains([{_FR}], t))) AS s_fr,
  len(list_filter(ts, t -> list_contains([{_ES}], t))) AS s_es,
  len(list_filter(ts, t -> list_contains([{_ZH}], t))) AS s_zh FROM b)
SELECT doc_id, CASE WHEN s_en+s_de+s_fr+s_es+s_zh = 0 THEN 'unknown'
  WHEN s_en >= greatest(s_de,s_fr,s_es,s_zh) THEN 'en'
  WHEN s_de >= greatest(s_fr,s_es,s_zh) THEN 'de'
  WHEN s_fr >= greatest(s_es,s_zh) THEN 'fr'
  WHEN s_es >= s_zh THEN 'es' ELSE 'zh' END AS lang_pred FROM s
"""


def q_text_fingerprint(sf_dir: str):
    from ..stages.text import fingerprints

    return _materialize(fingerprints(_read(sf_dir, "documents", ["doc_id", "text"]),
                                     "text", "doc_id"))


SQL_TEXT_FINGERPRINT = """
SELECT doc_id, md5(text) AS fingerprint FROM documents
"""


# ---------------------------------------------------------------------------
# Deduplication (engine extensions; stages/dedup.py)
# ---------------------------------------------------------------------------


def q_dedup_exact(sf_dir: str):
    """Exact dedup over documents UNION a deterministic subset of itself
    (doc_id % 10 == 0, re-keyed +1_000_000) — the testdata has no exact
    duplicate texts, so inject some to actually exercise the
    groupby+filter path (round-1 verdict: a 0-row pass proves nothing)."""
    from ..stages.dedup import exact_duplicates

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def dup_subset(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(ids % 10 == 0))
        return pa.table({
            "doc_id": pc.add(sub.column("doc_id"), 1_000_000),
            "text": sub.column("text"),
        })

    dups = ds.map_batches(dup_subset, batch_format="pyarrow", zero_copy_batch=True)
    return _materialize(exact_duplicates(ds.union(dups), "text", "doc_id"))


SQL_DEDUP_EXACT = """
WITH docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
)
SELECT md5(text) AS fingerprint, count(*)-1 AS n_dups, min(doc_id) AS keep_id
FROM docs2 GROUP BY 1 HAVING count(*) > 1
"""


def q_dedup_keep_first(sf_dir: str):
    from ..stages.dedup import keep_first

    return _materialize(keep_first(
        _read(sf_dir, "documents", ["doc_id", "lang", "source"]),
        ["lang", "source"], "doc_id"))


SQL_DEDUP_KEEP_FIRST = """
SELECT lang, source, count(*) AS n, min(doc_id) AS keep_id
FROM documents GROUP BY 1, 2
"""


_SQL_JACCARD_PAIRS = """
WITH tok AS (SELECT doc_id, string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\s+') AS ts FROM documents),
sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(ts)-2),
         i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s FROM tok),
pairs AS (SELECT a.doc_id AS a, b.doc_id AS b,
    len(list_intersect(a.s,b.s))::DOUBLE / (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) AS j
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
SELECT a, b, j FROM pairs WHERE j >= 0.8
"""


def q_dedup_jaccard_ngram(sf_dir: str):
    from ..stages.dedup import jaccard_pairs_exact

    return _materialize(jaccard_pairs_exact(
        _read(sf_dir, "documents", ["doc_id", "text"]), "text", "doc_id",
        n=3, threshold=0.8, shuffle_partitions=8))


def q_dedup_jaccard_prefix(sf_dir: str):
    """Prefix-filtered EXACT Jaccard (the exactness-preserving scale
    path: index only each doc's rarest ceil-complement shingles; any
    qualifying pair must collide there) — same oracle as the all-
    shingle inverted index."""
    from ..stages.dedup import jaccard_pairs_prefix

    return _materialize(
        jaccard_pairs_prefix(
            _read(sf_dir, "documents", ["doc_id", "text"]), "text",
            "doc_id", n=3, threshold=0.8, shuffle_partitions=8),
        empty_schema=pa.schema([("a", pa.int64()), ("b", pa.int64()),
                                ("j", pa.float64())]),
    )


def q_dedup_minhash_lsh(sf_dir: str):
    from ..stages.dedup import minhash_lsh_pairs

    return _materialize(minhash_lsh_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), "text", "doc_id",
        n=3, threshold=0.8, shuffle_partitions=8))


def q_dedup_minhash_join(sf_dir: str):
    """MinHash LSH with the fully-distributed exact verify: candidate
    pairs never touch the driver — semi-join selects candidate docs,
    two hash joins attach shingle sets, a vectorized kernel computes
    exact j.  Same oracle as the collected-verify variant."""
    from ..stages.dedup import minhash_lsh_pairs

    return _materialize(
        minhash_lsh_pairs(
            _read(sf_dir, "documents", ["doc_id", "text"]), "text",
            "doc_id", n=3, threshold=0.8, shuffle_partitions=8,
            verify="join"),
        empty_schema=pa.schema([("a", pa.int64()), ("b", pa.int64()),
                                ("j", pa.float64())]),
    )


def q_dedup_clusters(sf_dir: str):
    """Near-dup CLUSTERS: the jaccard pair list (which chains: (a,b),
    (b,c) → one cluster {a,b,c}) resolved to per-document canonical
    labels via distributed hash-to-min connected components
    (stages/graph.py) — the operation a dedup pipeline actually keys
    its keep-one-per-cluster filter on."""
    from ..stages.dedup import jaccard_pairs_exact
    from ..stages.graph import connected_components

    pairs = jaccard_pairs_exact(
        _read(sf_dir, "documents", ["doc_id", "text"]), "text", "doc_id",
        n=3, threshold=0.8, shuffle_partitions=8)
    return _materialize(connected_components(
        pairs, a_col="a", b_col="b", shuffle_partitions=8))


SQL_DEDUP_CLUSTERS = """
WITH RECURSIVE
tok AS (SELECT doc_id, string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+') AS ts FROM documents),
sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(ts)-2),
         i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s FROM tok),
pairs AS (SELECT a.doc_id AS a, b.doc_id AS b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s,b.s))::DOUBLE
        / (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.8),
edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
nodes AS (SELECT DISTINCT u AS node FROM edges),
reach(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.v AS node, r.lbl FROM reach r JOIN edges e ON e.u = r.node
)
SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node
"""


def q_dedup_simhash(sf_dir: str):
    """SimHash near-dup pairs — oracle-paired since round 4: token
    hashes are md5-based (``dedup.md5_hash64`` == DuckDB
    ``md5_number_lower``), the 3-gram shingle combine is a polynomial
    mod 2^64 reproduced with HUGEINT split-multiply, the per-bit
    majority vote and the Hamming pair filter are relational
    (SQL_DEDUP_SIMHASH).  The engine's 8x8-band pigeonhole LSH has
    recall 1.0 at Hamming <= 7 with exact verification, so its output
    IS exactly every pair at Hamming <= 7 — what the SQL computes
    brute-force.  Brute-force numpy parity additionally pinned in
    tests/test_text_dedup_similarity.py."""
    from ..stages.dedup import simhash_pairs

    return _materialize(simhash_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), "text", "doc_id",
        shuffle_partitions=8),
        empty_schema=pa.schema([("a", pa.int64()), ("b", pa.int64()),
                                ("hamming", pa.int64())]))


def _simhash_sql(max_hamming: int = 7) -> str:
    """SQL mirror of ``dedup.simhash_pairs``: tokenize exactly like
    ``tokens_and_offsets`` (lower, trim, split \\s+), hash tokens with
    ``md5_number_lower``, combine 3-token shingles with the engine's
    polynomial (acc = (h0*C + h1)*C + h2 mod 2^64; C powers precomputed
    here, the 128-bit-safe h*c mod 2^64 done as a 32-bit split), DISTINCT
    shingles per doc, per-bit majority vote (2*ones > n), reassemble the
    uint64, reinterpret as int64, and emit every doc pair at Hamming <=
    max_hamming via xor + bit_count.  Docs with <3 tokens get simhash 0
    (they pair with each other at Hamming 0), matching the engine."""
    M = 1 << 64
    M32 = 1 << 32
    C = 0x9E3779B97F4A7C15
    C2 = (C * C) % M

    def mm(h: str, c: int) -> str:
        # h*c mod 2^64 without overflowing signed HUGEINT
        return (f"((((CAST({h} AS HUGEINT) // {M32}) * {c}) % {M32})"
                f" * {M32} + (CAST({h} AS HUGEINT) % {M32}) * {c})")

    pw_vals = ", ".join(f"({b}, {1 << b})" for b in range(64))
    return f"""
WITH base AS MATERIALIZED (
  SELECT doc_id AS doc,
         CASE WHEN text IS NULL OR trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) = '' THEN []
              ELSE string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+') END AS ts
  FROM documents),
tok AS MATERIALIZED (
  SELECT doc, i, md5_number_lower(ts[i]) AS h
  FROM (SELECT doc, ts, unnest(range(1, len(ts) + 1)) AS i FROM base)),
sh AS MATERIALIZED (
  SELECT doc,
         CAST(({mm('h0', C2)} + {mm('h1', C)} + CAST(h2 AS HUGEINT))
              % {M} AS UBIGINT) AS s
  FROM (SELECT doc, h AS h0,
               lead(h, 1) OVER w AS h1, lead(h, 2) OVER w AS h2
        FROM tok WINDOW w AS (PARTITION BY doc ORDER BY i))
  WHERE h2 IS NOT NULL),
shd AS MATERIALIZED (SELECT DISTINCT doc, s FROM sh),
pw(b, p) AS (VALUES {pw_vals}),
bits AS MATERIALIZED (
  SELECT d.doc, pw.b,
         CASE WHEN 2 * sum((CAST(d.s AS HUGEINT) // pw.p) % 2) > count(*)
              THEN CAST(pw.p AS HUGEINT) ELSE 0 END AS contrib
  FROM shd d CROSS JOIN pw
  GROUP BY d.doc, pw.b, pw.p),
sims AS MATERIALIZED (
  SELECT b.doc, COALESCE(u.u, 0) AS u
  FROM base b LEFT JOIN
       (SELECT doc, sum(contrib) AS u FROM bits GROUP BY doc) u
    ON u.doc = b.doc),
ivals AS MATERIALIZED (
  SELECT doc, CAST(u - CASE WHEN u >= {1 << 63}
                            THEN CAST({M} AS HUGEINT) ELSE 0 END
              AS BIGINT) AS sim
  FROM sims)
SELECT a.doc AS a, b.doc AS b,
       CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
FROM ivals a JOIN ivals b ON a.doc < b.doc
WHERE bit_count(xor(a.sim, b.sim)) <= {max_hamming}
ORDER BY a, b"""


SQL_DEDUP_SIMHASH = _simhash_sql(7)


# ---------------------------------------------------------------------------
# Similarity search over embeddings (engine extensions; stages/similarity.py)
# ---------------------------------------------------------------------------


def q_sim_neardup_cosine(sf_dir: str):
    from ..stages.similarity import neardup_cosine_pairs

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    # mode='blocked' is the scale path (block-pair grid join, no
    # whole-dataset broadcast) — run THAT through the oracle gate
    return _materialize(neardup_cosine_pairs(
        emb, id_col="vec_id", vec_col="embedding", threshold=0.4,
        mode="blocked"))


SQL_SIM_NEARDUP_COSINE = """
SELECT a.vec_id AS a, b.vec_id AS b,
  ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.4
"""


def q_sim_topk_cosine(sf_dir: str):
    from ..stages.similarity import topk_cosine

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    queries = emb.filter(expr="vec_id < 8")
    return _materialize(topk_cosine(
        emb, queries, id_col="vec_id", vec_col="embedding", k=5))


SQL_SIM_TOPK_COSINE = """
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8)
SELECT query_id, neighbor_id, sim FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
    ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS sim,
    row_number() OVER (PARTITION BY q.vec_id
      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) DESC, e.vec_id) AS rk
  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.vec_id) WHERE rk <= 5
"""


def q_sim_ann_lsh(sf_dir: str):
    # approximate ANN (hyperplane LSH) — no SQL oracle by design;
    # recall vs the exact top-k is asserted in tests/test_similarity.py
    from ..stages.similarity import ann_lsh_topk

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    queries = emb.filter(expr="vec_id < 8")
    return _materialize(ann_lsh_topk(
        emb, queries, id_col="vec_id", vec_col="embedding", k=5))


# ---------------------------------------------------------------------------
# Windowed aggregate over the events stream (engine extension)
# ---------------------------------------------------------------------------


def q_window_hourly(sf_dir: str):
    from ..stages.window import tumbling_window

    ev = _read(sf_dir, "events", ["ts", "event_type", "value"])
    return tumbling_window(ev, "ts", unit="hour", by=["event_type"], sum_col="value")


SQL_WINDOW_HOURLY = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window,
       event_type, count(*) AS n, sum(value) AS total
FROM events GROUP BY 1, 2
"""


def q_window_hopping(sf_dir: str):
    """Hopping (sliding) window: 2h windows every 1h — each event lands
    in two windows (stages/window.py :: hopping_window)."""
    from ..stages.window import hopping_window

    ev = _read(sf_dir, "events", ["ts", "event_type", "value"])
    return hopping_window(ev, "ts", size_s=7200, hop_s=3600,
                          by=["event_type"], sum_col="value")


SQL_WINDOW_HOPPING = """
WITH ex AS (
  SELECT date_trunc('hour', ts) - i * INTERVAL 1 HOUR AS ws, event_type, value
  FROM events CROSS JOIN range(2) AS t(i)
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window, event_type,
       count(*) AS n, sum(value) AS total
FROM ex GROUP BY 1, 2
"""


def q_join_orders_customer(sf_dir: str):
    """Real distributed hash join (ray.data.Dataset.join, SURVEY.md §2.H
    'joins/lookups'): orders x customer on custkey."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
    from ..stages.relational import safe_join

    j = safe_join(orders, cust, join_type="inner", num_partitions=8,
                  on=("o_custkey",), right_on=("c_custkey",))
    return _materialize(j.select_columns(["o_orderkey", "c_name", "c_nationkey"]))


SQL_JOIN_ORDERS_CUSTOMER = """
SELECT o_orderkey, c_name, c_nationkey
FROM orders JOIN customer ON o_custkey = c_custkey
"""


def q_text_vocab(sf_dir: str):
    from ..stages.text import vocab_topk

    return _materialize(vocab_topk(_read(sf_dir, "documents", ["text"]),
                                   "text", k=20))


SQL_TEXT_VOCAB = """
WITH toks AS (
  SELECT unnest(string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\s+')) AS token
  FROM documents WHERE trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) <> ''
)
SELECT token, count(*) AS n FROM toks WHERE token <> ''
GROUP BY token ORDER BY n DESC, token LIMIT 20
"""


def q_grouped_median_price(sf_dir: str):
    """Exact grouped quantile (linear interpolation = quantile_cont);
    the scale path for huge groups is the t-digest sketch
    (tdigest_price_quantiles, rows-only)."""
    from ..stages.window import grouped_quantile

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])
    out = grouped_quantile(ds, by="l_returnflag", col="l_extendedprice",
                           q=0.5, alias="med")

    def rnd(t: pa.Table) -> pa.Table:
        return t.set_column(t.schema.get_field_index("med"), "med",
                            pc.round(t.column("med"), ndigits=6))

    return _materialize(out.map_batches(rnd, batch_format="pyarrow",
                                        zero_copy_batch=True))


SQL_GROUPED_MEDIAN_PRICE = """
SELECT l_returnflag, ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS med
FROM lineitem GROUP BY l_returnflag
"""


def q_emb_label_centroids(sf_dir: str):
    """Per-label mean embedding exploded to (label, dim, val) — the
    vector-aggregate combiner pattern (stages/similarity.py ::
    label_centroids)."""
    from ..stages.similarity import label_centroids

    emb = _read(sf_dir, "embeddings", ["label", "embedding"])
    out = label_centroids(emb, label_col="label", vec_col="embedding")

    def widen(t: pa.Table) -> pa.Table:
        # BIGINT on both sides so the driver's value-hash sees one dtype
        return pa.table({
            "label": pc.cast(t.column("label"), pa.int64()),
            "dim": t.column("dim"),
            "val": t.column("val"),
        })

    return _materialize(out.map_batches(widen, batch_format="pyarrow",
                                        zero_copy_batch=True))


SQL_EMB_LABEL_CENTROIDS = """
WITH u AS (
  SELECT label,
         unnest(range(len(embedding))) AS dim,
         unnest(CAST(embedding AS DOUBLE[])) AS e
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label, dim, ROUND(avg(e), 6) AS val
FROM u GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Sketch aggregates (HLL distinct, t-digest quantiles) — approximate, so
# rows-only contract; accuracy bounds asserted in tests/test_aggregates.py
# ---------------------------------------------------------------------------


def q_hll_distinct_parts(sf_dir: str):
    from ..functions.aggregates import HLLDistinct

    ds = _read(sf_dir, "lineitem", ["l_partkey"])
    return _materialize(ds.aggregate(HLLDistinct(on="l_partkey")))


def q_tdigest_price_quantiles(sf_dir: str):
    from ..functions.aggregates import TDigestQuantile

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    return _materialize(
        ds.aggregate(
            TDigestQuantile(on="l_extendedprice", q=0.5, alias_name="p50"),
            TDigestQuantile(on="l_extendedprice", q=0.95, alias_name="p95"),
        )
    )


def _materialize(result, empty_schema: pa.Schema | None = None):
    """Collect a (small) result into a pa.Table, preserving the schema
    even when there are zero rows (to_pandas() on an empty Dataset loses
    columns — the driver compare needs them).  ``empty_schema`` covers
    the fully-empty case where even ``Dataset.schema()`` is None (e.g. a
    groupby whose input was filtered to zero rows)."""
    import ray.data

    if isinstance(result, ray.data.Dataset):
        batches = list(result.iter_batches(batch_format="pyarrow", batch_size=65536))
        if batches:
            return pa.concat_tables(batches)
        schema = result.schema()
        if schema is None:
            if empty_schema is None:
                raise ValueError(
                    "empty Dataset with unknown schema; pass empty_schema"
                )
            return empty_schema.empty_table()
        base = getattr(schema, "base_schema", schema)
        return base.empty_table()
    if isinstance(result, dict):  # Dataset.aggregate returns a row dict
        # None values type as float64 nulls, not a null-typed column
        # (which would stringify differently from SQL's NaN downstream)
        return pa.table({
            k: pa.array([v], pa.float64() if v is None else None)
            for k, v in result.items()})
    return result


def q_hll_group_supp(sf_dir: str):
    """GROUPED approximate distinct: HyperLogLog as an AggregateFnV2
    inside groupby — per-group register arrays merge lane-wise through
    the shuffle, so the exchange moves 4 KiB per (group, block)
    regardless of row count.  Approximate → rows-only (tests pin the
    error bound against exact counts)."""
    from ..functions.aggregates import HLLDistinct

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_suppkey"])
    return _materialize(ds.groupby("l_returnflag").aggregate(
        HLLDistinct(on="l_suppkey", alias_name="n_approx")))


def q_salted_distinct_supp(sf_dir: str):
    # skew handling: l_returnflag has 3 values over the whole table; the
    # two-stage value-hash salt spreads each hot key over 32 reducers
    from ..stages.salting import salted_distinct_count

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_suppkey"])
    return _materialize(
        salted_distinct_count(ds, "l_returnflag", "l_suppkey", salt=32)
    )


SQL_SALTED_DISTINCT_SUPP = """
SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_distinct
FROM lineitem GROUP BY l_returnflag
"""


def q_cms_event_counts(sf_dir: str):
    """Count-Min heavy hitters over event_type: per-block CMS partials
    merged via AggregateFnV2, then the (small) distinct key set queried
    against the merged sketch.  With |keys| << sketch width the CM
    estimate equals the exact count, so the plain GROUP BY is a valid
    oracle (the sketch path itself is what's under test)."""
    import numpy as np

    from ..functions.aggregates import (
        CountMinSketch, SketchAggregate, sketch_loads,
    )

    ds = _read(sf_dir, "events", ["event_type"])
    row = ds.aggregate(
        SketchAggregate(on="event_type",
                        factory=lambda: CountMinSketch(width=2048, depth=5),
                        alias_name="cms")
    )
    cms = sketch_loads(row["cms"])
    keys = sorted(
        ds.groupby("event_type").count().to_pandas()["event_type"].tolist()
    )
    est = cms.query(np.asarray(keys, dtype=object))
    return pa.table({"event_type": pa.array(keys),
                     "est_count": pa.array(est.astype("int64"))})


SQL_CMS_EVENT_COUNTS = """
SELECT event_type, count(*) AS est_count FROM events GROUP BY event_type
"""


def q_asof_click_purchase(sf_dir: str):
    """As-of join: every click joined to the user's latest prior
    purchase (tie-immune outputs: matched timestamp + gap, epoch us)."""
    from ..stages.joins import asof_join_latest

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    clicks = ev.filter(expr="event_type == 'click'")
    purchases = ev.filter(expr="event_type == 'purchase'")
    out = asof_join_latest(clicks, purchases, by="user_id", ts="ts",
                           left_id="event_id")
    return _materialize(out.select_columns(["left_id", "prior_ts_us", "gap_us"]))


SQL_ASOF_CLICK_PURCHASE = """
SELECT a.event_id AS left_id,
       epoch_us(b.ts) AS prior_ts_us,
       epoch_us(a.ts) - epoch_us(b.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'click') a
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
  ON a.user_id = b.user_id AND a.ts >= b.ts
"""


def q_asof_next_purchase(sf_dir: str):
    """Forward as-of join: every click joined to the user's EARLIEST
    following purchase (inclusive) — the time-to-conversion lookup."""
    from ..stages.joins import asof_join_next

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    clicks = ev.filter(expr="event_type == 'click'")
    purchases = ev.filter(expr="event_type == 'purchase'")
    out = asof_join_next(clicks, purchases, by="user_id", ts="ts",
                         left_id="event_id")
    return _materialize(out.select_columns(["left_id", "next_ts_us", "gap_us"]))


SQL_ASOF_NEXT_PURCHASE = """
SELECT a.event_id AS left_id,
       epoch_us(b.ts) AS next_ts_us,
       epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'click') a
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
  ON a.user_id = b.user_id AND a.ts <= b.ts
"""


def q_sessionize_users(sf_dir: str):
    from ..stages.sessions import sessionize

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    return _materialize(sessionize(ev, by="user_id", ts="ts", gap_s=3600))


SQL_SESSIONIZE_USERS = """
WITH g AS (
  SELECT user_id, ts,
    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > CAST(3600 AS BIGINT) * 1000000
         THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
), per_session AS (
  SELECT user_id, sid, count(*) AS n FROM s GROUP BY 1, 2
)
SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events, count(*) AS n_sessions,
       max(n) AS max_session_events
FROM per_session GROUP BY user_id
"""


def q_accepted_tolerance_quantity(sf_dir: str):
    """Acceptance algebra over the violations dataset: interval
    violations on l_quantity with ``accepted.tolerance(5)`` applied —
    only deviations beyond +/-5 remain (reference `with accepted(...)`
    semantics, E7 in SURVEY.md §2.E)."""
    from ..pipelines.acceptance import accepted
    from ..stages.base import RunContext
    from ..stages.row_checks import IntervalCheck
    from .suite import CheckSuite

    ds = _read(sf_dir, "lineitem", ["l_quantity"])
    result = CheckSuite([IntervalCheck("l_quantity", min=1, max=30)],
                        RunContext()).run(ds)
    remaining = accepted.tolerance(5).filter_violations(result.to_table())
    return remaining.select(["value_num", "deviation", "kind"])


SQL_ACCEPTED_TOLERANCE_QUANTITY = """
SELECT CAST(l_quantity AS DOUBLE) AS value_num,
       CAST(l_quantity AS DOUBLE) - (CASE WHEN l_quantity < 1 THEN 1 ELSE 30 END) AS deviation,
       'deviation' AS kind
FROM lineitem
WHERE (l_quantity < 1 OR l_quantity > 30)
  AND abs(l_quantity - (CASE WHEN l_quantity < 1 THEN 1 ELSE 30 END)) > 5
"""


def q_order_region(sf_dir: str):
    """Order-sensitive sequence check (B10; bounded data by design):
    region names ordered by r_regionkey vs the expected sequence.
    Oracle-paired with a set-difference mirror (SQL_ORDER_REGION):
    when the common elements appear in consistent order and each name
    is unique — true of the region table at every SF — difflib's
    alignment reduces exactly to (required EXCEPT data) = missing and
    (data EXCEPT required) = extra with their source positions.  The
    general transposition case (where difflib pairs a move as
    missing+extra at alignment-dependent positions) stays covered by
    unit tests on OrderCheck itself."""
    from ..stages.base import RunContext
    from ..stages.order import OrderCheck

    ds = _read(sf_dir, "region", ["r_regionkey", "r_name"])
    # Required sequence deliberately DIFFERS from the data (ANTARCTICA
    # inserted, MIDDLE EAST omitted) so the difflib alignment emits a
    # non-empty, assertable diff — a 0-row result would pass even with a
    # broken OrderCheck (round-1 verdict "What's wrong" #3).
    required = ["AFRICA", "ANTARCTICA", "AMERICA", "ASIA", "EUROPE"]
    # Assumption guard (round-3 ADVICE): the set-difference SQL mirror
    # is exact ONLY while the data's common elements appear in the
    # required list's relative order (then difflib's diff degenerates
    # to a pure set difference — all-distinct elements in consistent
    # order always fully match).  If the region names are ever permuted
    # out of that order, difflib emits transposition diffs no
    # set-difference SQL can mirror; BOTH sides then emit the same
    # self-describing sentinel row instead of silently diverging.
    # region is 5 rows by construction — a declared-small collect.
    seq = _materialize(ds).sort_by([("r_regionkey", "ascending")])
    names = seq.column("r_name").to_pylist()
    rpos = {n: i for i, n in enumerate(required)}
    common = [rpos[n] for n in names if n in rpos]
    inversions = sum(
        1
        for i in range(len(common))
        for j in range(i + 1, len(common))
        if common[i] > common[j]
    )
    if inversions:
        return pa.table({
            "kind": pa.array(["order_inconsistent"], pa.string()),
            "value": pa.array([None], pa.string()),
            "value_num": pa.array([float(inversions)], pa.float64()),
        })
    v = OrderCheck("r_name", required, pos_col="r_regionkey").violations(
        ds, RunContext()
    )
    return _materialize(v).select(["kind", "value", "value_num"])


SQL_ORDER_REGION = """
WITH req AS (
  SELECT * FROM (VALUES ('AFRICA', 0), ('ANTARCTICA', 1),
                        ('AMERICA', 2), ('ASIA', 3), ('EUROPE', 4))
    r(name, pos)),
dat AS (
  SELECT r_name AS name,
         row_number() OVER (ORDER BY r_regionkey) - 1 AS pos
  FROM region),
com AS (
  SELECT r.name, r.pos AS rpos, d.pos AS dpos
  FROM req r JOIN dat d ON d.name = r.name),
inv AS (
  SELECT count(*) AS n
  FROM com a JOIN com b ON a.rpos < b.rpos AND a.dpos > b.dpos)
SELECT 'missing' AS kind, r.name AS value, CAST(r.pos AS DOUBLE) AS value_num
FROM req r LEFT JOIN dat d ON d.name = r.name
WHERE d.name IS NULL AND (SELECT n FROM inv) = 0
UNION ALL
SELECT 'extra' AS kind, d.name AS value, CAST(d.pos AS DOUBLE) AS value_num
FROM dat d LEFT JOIN req r ON r.name = d.name
WHERE r.name IS NULL AND (SELECT n FROM inv) = 0
UNION ALL
SELECT 'order_inconsistent' AS kind, CAST(NULL AS VARCHAR) AS value,
       CAST(n AS DOUBLE) AS value_num
FROM inv WHERE n > 0
"""


def q_sim_ivf_topk(sf_dir: str):
    # IVF (k-means coarse quantizer) ANN — approximate scale path, so
    # rows-only; recall vs the exact top-k asserted in unit tests
    from ..stages.similarity import ivf_topk

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    queries = emb.filter(expr="vec_id < 8")
    return _materialize(ivf_topk(
        emb, queries, id_col="vec_id", vec_col="embedding", k=5,
        n_centroids=16, n_probe=8))


def q_fuzzy_event_type(sf_dir: str):
    # fuzzy string match (B4): difflib ratio is not SQL-expressible, so
    # rows-only; exact per-element semantics pinned in tests
    from ..stages.row_checks import FuzzyCheck

    ds = _read(sf_dir, "events", ["event_type"])
    return _run_check(
        FuzzyCheck("event_type", "click", cutoff=0.6), ds,
        ["value", "kind"],
    )


def q_grouped_topk_orders(sf_dir: str):
    from ..stages.window import grouped_topk

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice", "o_orderkey"])
    return grouped_topk(ds, by="o_orderpriority", order_col="o_totalprice",
                        k=3, tie_col="o_orderkey")


SQL_GROUPED_TOPK_ORDERS = """
SELECT o_orderpriority, o_totalprice, o_orderkey FROM (
  SELECT o_orderpriority, o_totalprice, o_orderkey,
    row_number() OVER (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders) WHERE rk <= 3
"""


# ---------------------------------------------------------------------------
# Ordered window functions (stages/winfunc.py)
# ---------------------------------------------------------------------------


def q_lag_user_gap(sf_dir: str):
    """lag() OVER (PARTITION BY user ORDER BY ts): per-event gap to the
    user's previous event."""
    from ..stages.winfunc import lag_diff

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    return _materialize(
        lag_diff(ds, by="user_id", order_col="ts", id_col="event_id")
    )


SQL_LAG_USER_GAP = """
SELECT event_id, user_id,
       CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
            PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS gap
FROM events
"""


def q_rolling_avg_order(sf_dir: str):
    """Trailing 3-row mean per customer (frame window aggregate)."""
    from ..stages.winfunc import rolling_agg

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    return _materialize(rolling_agg(
        ds, by="o_custkey", order_col="o_orderdate",
        value_col="o_totalprice", id_col="o_orderkey", window=3))


SQL_ROLLING_AVG_ORDER = """
SELECT o_orderkey, o_custkey,
       avg(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS roll
FROM orders
"""


# ---------------------------------------------------------------------------
# Relational composition: semi/anti join, set ops, pivot, outer join
# (stages/relational.py)
# ---------------------------------------------------------------------------


def q_semi_join_big_orders(sf_dir: str):
    """Semi join (SQL EXISTS): customers with at least one order over
    400k — the right side reduces to distinct keys before the hash
    join."""
    from ..stages.relational import semi_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    big = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).filter(
        expr="o_totalprice > 400000"
    )
    return _materialize(
        semi_join(cust, big, on="c_custkey", right_on="o_custkey")
    )


SQL_SEMI_JOIN_BIG_ORDERS = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
"""


def q_anti_join_big_orders(sf_dir: str):
    """Anti join (SQL NOT EXISTS): customers with NO order over 400k."""
    from ..stages.relational import anti_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    big = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).filter(
        expr="o_totalprice > 400000"
    )
    return _materialize(
        anti_join(cust, big, on="c_custkey", right_on="o_custkey")
    )


SQL_ANTI_JOIN_BIG_ORDERS = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
"""


def q_setop_except_status(sf_dir: str):
    """EXCEPT over distinct keys: customers with a finished order but
    no open one."""
    from ..stages.relational import except_distinct

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])
    f = orders.filter(expr="o_orderstatus == 'F'")
    o = orders.filter(expr="o_orderstatus == 'O'")
    return _materialize(except_distinct(f, o, col="o_custkey"))


SQL_SETOP_EXCEPT_STATUS = """
SELECT CAST(o_custkey AS BIGINT) AS v FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT CAST(o_custkey AS BIGINT) AS v FROM orders WHERE o_orderstatus = 'O'
"""


def q_setop_intersect_status(sf_dir: str):
    """INTERSECT over distinct keys: customers with both statuses."""
    from ..stages.relational import intersect_distinct

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])
    f = orders.filter(expr="o_orderstatus == 'F'")
    o = orders.filter(expr="o_orderstatus == 'O'")
    return _materialize(intersect_distinct(f, o, col="o_custkey"))


SQL_SETOP_INTERSECT_STATUS = """
SELECT CAST(o_custkey AS BIGINT) AS v FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT CAST(o_custkey AS BIGINT) AS v FROM orders WHERE o_orderstatus = 'O'
"""


def q_pivot_user_events(sf_dir: str):
    """Pivot event_type into per-user count columns."""
    from ..stages.relational import pivot_counts

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    return _materialize(pivot_counts(
        ev, by="user_id", pivot_col="event_type",
        values=["click", "error", "purchase", "signup", "view"]))


SQL_PIVOT_USER_EVENTS = """
SELECT user_id,
  CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
  CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
  CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
  CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events GROUP BY user_id
"""


def q_left_join_orders_poorcust(sf_dir: str):
    """Left outer hash join with a filtered right side (nulls for the
    ~91% of orders whose customer has a non-negative balance)."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    poor = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_acctbal"]).filter(
        expr="c_acctbal < 0"
    )
    from ..stages.relational import safe_join

    j = safe_join(orders, poor, join_type="left_outer", num_partitions=8,
                  on=("o_custkey",), right_on=("c_custkey",))
    return _materialize(j.select_columns(["o_orderkey", "c_name"]))


SQL_LEFT_JOIN_ORDERS_POORCUST = """
SELECT o_orderkey, c_name
FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_acctbal < 0) c
  ON o_custkey = c_custkey
"""


# ---------------------------------------------------------------------------
# Text corpus ops: repetition, normalization, JSON projection
# (stages/text.py)
# ---------------------------------------------------------------------------


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def q_text_redact(sf_dir: str):
    """PII-style scrub (stages/text.py::redact): the synthetic corpus
    has no PII, so — like dedup_exact's duplicate inject — a dirty
    column is built DETERMINISTICALLY from doc_id (an email and a
    numeric id appended to the first words) in both the engine and the
    SQL, then emails and digit runs are redacted sequentially.  Counts
    vary per row (doc_id digit length), so the query exercises real
    hits, not a 0-hit no-op."""
    from ..stages.text import redact

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def dirty(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id")
        head = pc.utf8_slice_codeunits(t.column("text"), 0, 40)
        sid = pc.cast(ids, pa.string())
        mail = pc.binary_join_element_wise(
            "user", sid, "@example.com", "")
        num = pc.cast(pc.multiply(ids, 7), pa.string())
        s = pc.binary_join_element_wise(
            head, " contact ", mail, " ref ", num, "")
        return pa.table({"doc_id": ids, "dirty": s})

    dirty_ds = ds.map_batches(dirty, batch_format="pyarrow",
                              zero_copy_batch=True)
    return _materialize(redact(
        dirty_ds, "dirty", "doc_id",
        rules=[("email", _EMAIL_RE, "<EMAIL>"),
               ("num", "[0-9]+", "<NUM>")]))


SQL_TEXT_REDACT = f"""
WITH dirty AS (
  SELECT doc_id,
         substr(text, 1, 40) || ' contact user' || doc_id ||
         '@example.com ref ' || (doc_id * 7) AS s
  FROM documents
),
e AS (
  SELECT doc_id,
         len(regexp_extract_all(s, '{_EMAIL_RE}')) AS n_email,
         regexp_replace(s, '{_EMAIL_RE}', '<EMAIL>', 'g') AS s1
  FROM dirty
)
SELECT doc_id, n_email,
       len(regexp_extract_all(s1, '[0-9]+')) AS n_num,
       regexp_replace(s1, '[0-9]+', '<NUM>', 'g') AS redacted
FROM e
"""


def q_range_join_priceband(sf_dir: str):
    """Broadcast range (interval) join: every lineitem row labeled with
    its price band — bands validated + sorted once, broadcast via
    ray.put, resolved per batch with one np.searchsorted (no shuffle;
    the fact side streams)."""
    from ..stages.relational import range_join_broadcast

    bands = pa.table({
        "band": ["low", "mid", "high", "lux"],
        "lo": [0.0, 20000.0, 50000.0, 80000.0],
        "hi": [20000.0, 50000.0, 80000.0, 1e12],
    })
    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_extendedprice"])
    out = range_join_broadcast(ds, bands, value_col="l_extendedprice",
                               band_cols=["band", "lo"], how="inner")

    def rename(t: pa.Table) -> pa.Table:
        return t.select(["l_orderkey", "l_linenumber", "band", "lo"]) \
                .rename_columns(["l_orderkey", "l_linenumber", "band", "band_lo"])

    return _materialize(out.map_batches(rename, batch_format="pyarrow",
                                        zero_copy_batch=True))


SQL_RANGE_JOIN_PRICEBAND = """
WITH bands(band, lo, hi) AS (VALUES
  ('low', 0.0, 20000.0), ('mid', 20000.0, 50000.0),
  ('high', 50000.0, 80000.0), ('lux', 80000.0, 1e12))
SELECT l.l_orderkey, l.l_linenumber, b.band, b.lo AS band_lo
FROM lineitem l JOIN bands b
  ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
"""


def q_text_repetition(sf_dir: str):
    from ..stages.text import repetition_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _materialize(repetition_stats(ds, "text", "doc_id"))


SQL_TEXT_REPETITION = """
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) = '' THEN []
              ELSE string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+') END AS ts
  FROM documents)
SELECT doc_id,
       CAST(len(ts) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(ts)) AS BIGINT) AS n_distinct,
       CASE WHEN len(ts) = 0 THEN 0.0
            ELSE 1.0 - len(list_distinct(ts)) / len(ts) END AS dup_frac
FROM toks
"""


def q_text_normalized_fp(sf_dir: str):
    from ..stages.text import normalize_fingerprint

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _materialize(normalize_fingerprint(ds, "text", "doc_id"))


SQL_TEXT_NORMALIZED_FP = """
WITH norm AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text),
              '[.,;:!?]', '', 'g'), '\\s+', ' ', 'g')) AS t
  FROM documents)
SELECT doc_id, CAST(length(t) AS BIGINT) AS norm_len, md5(t) AS norm_fp
FROM norm
"""


def q_json_props_k(sf_dir: str):
    from ..stages.text import json_extract_int

    ds = _read(sf_dir, "events", ["event_id", "props"])
    return _materialize(json_extract_int(ds, "props", "event_id", key="k"))


SQL_JSON_PROPS_K = """
SELECT event_id,
       CAST(NULLIF(regexp_extract(props, '"k"\\s*:\\s*(-?\\d+)', 1), '')
            AS BIGINT) AS val
FROM events
"""


def q_unnest_tokens(sf_dir: str):
    """Row explosion (SQL unnest): one row per token occurrence."""
    from ..stages.text import unnest_tokens

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _materialize(unnest_tokens(ds, "text", "doc_id"))


SQL_UNNEST_TOKENS = """
SELECT doc_id, unnest(CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) = '' THEN []
                           ELSE string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+')
                      END) AS token
FROM documents
"""


def q_cume_dist_price(sf_dir: str):
    """cume_dist() OVER (PARTITION BY priority ORDER BY totalprice)."""
    from ..stages.winfunc import cume_dist

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderpriority", "o_totalprice"])
    return _materialize(cume_dist(
        ds, by="o_orderpriority", value_col="o_totalprice",
        id_col="o_orderkey"))


SQL_CUME_DIST_PRICE = """
SELECT o_orderkey, o_orderpriority,
       cume_dist() OVER (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice) AS cd
FROM orders
"""


def q_rank_orders(sf_dir: str):
    """rank / dense_rank / row_number / ntile(4) per priority class,
    ordered by totalprice DESC (ties on orderkey for the total-order
    pair)."""
    from ..stages.winfunc import rank_window

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderpriority", "o_totalprice"])
    return _materialize(rank_window(
        ds, by="o_orderpriority", value_col="o_totalprice",
        id_col="o_orderkey", descending=True, ntile=4))


SQL_RANK_ORDERS = """
SELECT o_orderkey, o_orderpriority,
       rank()        OVER w  AS rnk,
       dense_rank()  OVER w  AS drnk,
       row_number()  OVER wt AS rn,
       ntile(4)      OVER wt AS tile
FROM orders
WINDOW w  AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC),
       wt AS (PARTITION BY o_orderpriority
              ORDER BY o_totalprice DESC, o_orderkey)
"""


def q_funnel_click_purchase(sf_dir: str):
    """Two-step funnel per user: clicks followed by a purchase within
    one hour (counts + smallest qualifying gap)."""
    from ..stages.sessions import funnel_conversion

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    return _materialize(funnel_conversion(
        ds, by="user_id", ts="ts", type_col="event_type",
        from_type="click", to_type="purchase", within_s=3600.0))


SQL_FUNNEL_CLICK_PURCHASE = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS t, event_id
  FROM events WHERE event_type IN ('click', 'purchase')
),
base AS (
  SELECT user_id,
         count(*) FILTER (WHERE event_type = 'click')    AS n_from,
         count(*) FILTER (WHERE event_type = 'purchase') AS n_to
  FROM e GROUP BY user_id
),
per_click AS (
  SELECT c.user_id, c.event_id, MIN(p.t - c.t) AS gap
  FROM (SELECT * FROM e WHERE event_type = 'click') c
  JOIN (SELECT * FROM e WHERE event_type = 'purchase') p
    ON c.user_id = p.user_id
   AND p.t >= c.t AND p.t <= c.t + 3600000000
  GROUP BY c.user_id, c.event_id
),
conv AS (
  SELECT user_id, count(*) AS n_conv, MIN(gap) AS min_gap_us
  FROM per_click GROUP BY user_id
)
SELECT b.user_id, b.n_from, b.n_to,
       COALESCE(conv.n_conv, 0) AS n_conv,
       conv.min_gap_us
FROM base b LEFT JOIN conv USING (user_id)
"""


def q_benford_price(sf_dir: str):
    """First-digit (Benford) distribution of o_totalprice in cents,
    with per-digit chi-square contributions."""
    from ..stages.drift import benford

    ds = _read(sf_dir, "orders", ["o_totalprice"])
    return benford(ds, "o_totalprice", scale=100)


SQL_BENFORD_PRICE = """
WITH v AS (
  SELECT CAST(ROUND(ABS(o_totalprice) * 100) AS BIGINT) AS iv
  FROM orders WHERE o_totalprice IS NOT NULL
),
d AS (
  SELECT CAST(substr(CAST(iv AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM v WHERE iv > 0
),
c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
t AS (SELECT SUM(n) AS total FROM c)
SELECT digit, n,
       n / total AS p,
       LOG10(1 + 1.0 / digit) AS q,
       total * POWER(n / total - LOG10(1 + 1.0 / digit), 2)
             / LOG10(1 + 1.0 / digit) AS chi2
FROM c, t
"""


def q_regr_discount(sf_dir: str):
    """Per-returnflag OLS of extendedprice on quantity."""
    from ..stages.window import grouped_regression

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])
    return _materialize(grouped_regression(
        ds, by="l_returnflag", x="l_quantity", y="l_extendedprice"))


SQL_REGR_DISCOUNT = """
SELECT l_returnflag,
       regr_slope(l_extendedprice, l_quantity)     AS slope,
       regr_intercept(l_extendedprice, l_quantity) AS icept,
       regr_r2(l_extendedprice, l_quantity)        AS r2
FROM lineitem GROUP BY l_returnflag
"""


def q_tfidf_lang(sf_dir: str):
    """Top-5 tf-idf terms per language over documents."""
    from ..stages.text import tfidf_top_terms

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    return _materialize(tfidf_top_terms(ds, "text", "doc_id",
                                        group_col="lang", k=5))


SQL_TFIDF_LANG = """
WITH tok AS (
  SELECT doc_id, lang,
         unnest(CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) = '' THEN []
                     ELSE string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+')
                END) AS term
  FROM documents
),
tf AS (SELECT lang, term, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
n AS (SELECT count(*) AS nd FROM documents),
s AS (
  SELECT lang, term, tf, df, tf * LN(nd / df) AS score,
         row_number() OVER (PARTITION BY lang
                            ORDER BY tf * LN(nd / df) DESC, term) AS rn
  FROM tf JOIN df USING (term), n
)
SELECT lang, term, tf, df, score FROM s WHERE rn <= 5
"""


def q_lev_neardup(sf_dir: str):
    """Character-level near-dups: doc pairs in the same
    (lang, length-band) block whose 32-char prefixes are within 12
    edits — chunked pair-vectorized DP kernel.  The length band is the
    blocking key that keeps block pair counts bounded as the corpus
    grows (near-dups have near-equal lengths)."""
    from ..stages.dedup import levenshtein_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars", "text"])

    def add_band(t: pa.Table) -> pa.Table:
        band = pc.cast(
            pc.floor(pc.divide(pc.cast(t.column("n_chars"), pa.float64()),
                               64.0)),
            pa.int64(),
        )
        return t.append_column("band", band)

    ds = ds.map_batches(add_band, batch_format="pyarrow",
                        zero_copy_batch=True)
    return _materialize(levenshtein_pairs(
        ds, "text", "doc_id", block_cols=["lang", "band"],
        prefix=32, max_dist=12))


SQL_LEV_NEARDUP = """
WITH d AS (
  SELECT doc_id, lang, CAST(FLOOR(n_chars / 64.0) AS BIGINT) AS band,
         substr(text, 1, 32) AS p
  FROM documents
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       levenshtein(a.p, b.p) AS dist
FROM d a JOIN d b
  ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id
WHERE levenshtein(a.p, b.p) <= 12
"""


def q_jw_neardup(sf_dir: str):
    """Name-matching near-dups: part pairs in the same brand block
    whose lowercased 32-char name prefixes have Jaro-Winkler
    similarity >= 0.85 (pair-vectorized greedy window-match kernel,
    bit-identical to DuckDB's jaro_winkler_similarity)."""
    from ..stages.dedup import jaro_winkler_pairs

    ds = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_name"])
    return _materialize(
        jaro_winkler_pairs(ds, "p_name", "p_partkey",
                           block_cols="p_brand", prefix=32,
                           threshold=0.85),
        empty_schema=pa.schema([("a_id", pa.int64()),
                                ("b_id", pa.int64()),
                                ("jw", pa.float64())]),
    )


SQL_JW_NEARDUP = """
WITH d AS (
  SELECT p_partkey, p_brand, substr(lower(p_name), 1, 32) AS s
  FROM part
)
SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
       jaro_winkler_similarity(a.s, b.s) AS jw
FROM d a JOIN d b
  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE jaro_winkler_similarity(a.s, b.s) >= 0.85
"""


def q_moments_quantity(sf_dir: str):
    """Distribution-shape profile per returnflag: mean / stddev_samp /
    skewness / kurtosis from merged power sums (SQL bias corrections)."""
    from ..stages.window import grouped_moments

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    return _materialize(grouped_moments(ds, by="l_returnflag",
                                        col="l_quantity"))


SQL_MOMENTS_QUANTITY = """
SELECT l_returnflag,
       avg(l_quantity)         AS mean,
       stddev_samp(l_quantity) AS sd,
       skewness(l_quantity)    AS skew,
       kurtosis(l_quantity)    AS kurt
FROM lineitem GROUP BY l_returnflag
"""


def q_entropy_status(sf_dir: str):
    """Shannon entropy (nats) of the order-status mix per priority."""
    from ..stages.window import grouped_entropy

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"])
    return _materialize(grouped_entropy(ds, by="o_orderpriority",
                                        col="o_orderstatus"))


SQL_ENTROPY_STATUS = """
WITH c AS (
  SELECT o_orderpriority, o_orderstatus, count(*) AS n
  FROM orders GROUP BY 1, 2
),
t AS (
  SELECT o_orderpriority, SUM(n) AS tot FROM c GROUP BY o_orderpriority
)
SELECT c.o_orderpriority,
       SUM(-(n / tot) * LN(n / tot)) AS entropy
FROM c JOIN t USING (o_orderpriority)
GROUP BY c.o_orderpriority
"""


def q_mode_event(sf_dir: str):
    """Most frequent event_type per user (ties -> smallest value)."""
    from ..stages.window import grouped_mode

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return _materialize(grouped_mode(ds, by="user_id", col="event_type"))


SQL_MODE_EVENT = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT user_id, event_type, n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type) AS rn
  FROM c
)
SELECT user_id, event_type AS mode, n AS n_mode FROM r WHERE rn = 1
"""


def q_cube_orders(sf_dir: str):
    """GROUP BY CUBE(priority, status) counts — rollup + per-status
    subtotals."""
    from ..stages.relational import cube_counts

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"])
    return _materialize(cube_counts(
        ds, cols=["o_orderpriority", "o_orderstatus"]))


SQL_CUBE_ORDERS = """
SELECT o_orderpriority, o_orderstatus, CAST(count(*) AS BIGINT) AS n
FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
"""


def q_rollup_orders(sf_dir: str):
    """GROUP BY ROLLUP(priority, status) counts with subtotal rows."""
    from ..stages.relational import rollup_counts

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"])
    return _materialize(rollup_counts(
        ds, cols=["o_orderpriority", "o_orderstatus"]))


SQL_ROLLUP_ORDERS = """
SELECT o_orderpriority, o_orderstatus, CAST(count(*) AS BIGINT) AS n
FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
"""


def q_zscore_order_price(sf_dir: str):
    """Per-group standardization: tiny moment aggregate broadcast back
    onto the streaming rows — the data itself is never shuffled."""
    from ..stages.winfunc import group_zscore

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderpriority", "o_totalprice"])
    return _materialize(group_zscore(
        ds, by="o_orderpriority", value_col="o_totalprice",
        id_col="o_orderkey"))


SQL_ZSCORE_ORDER_PRICE = """
SELECT o_orderkey, o_orderpriority,
       (o_totalprice - avg(o_totalprice) OVER (PARTITION BY o_orderpriority))
       / stddev_samp(o_totalprice) OVER (PARTITION BY o_orderpriority) AS z
FROM orders
"""


def q_broadcast_join_orders(sf_dir: str):
    """Map-side dimension lookup: customer broadcast once via ray.put,
    orders stream through a vectorized index_in attach — no shuffle."""
    from ..stages.relational import broadcast_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    return _materialize(broadcast_join(
        orders, cust, on="o_custkey", right_on="c_custkey",
        right_cols=["c_mktsegment"]))


SQL_BROADCAST_JOIN_ORDERS = """
SELECT o_orderkey, o_custkey, c_mktsegment
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
"""


def q_profile_lineitem(sf_dir: str):
    """One-pass column profiler: per-batch (n, n_null, sum, min, max)
    partials, one tiny groupby(col) merge."""
    from ..stages.profile import profile_columns

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    # decimals=2: fixed-point money/rate columns -> exact integer-cent
    # sums so the mean never differs from the oracle in the last ulps
    return _materialize(profile_columns(
        _read(sf_dir, "lineitem", cols), cols, decimals=2))


def _profile_sql_one(c: str) -> str:
    return f"""
SELECT '{c}' AS col, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(min({c}) AS DOUBLE) AS min, CAST(max({c}) AS DOUBLE) AS max,
       CAST(sum(CAST(round({c} * 100) AS BIGINT)) AS DOUBLE) / 100.0
           / count({c}) AS mean
FROM lineitem"""


SQL_PROFILE_LINEITEM = " UNION ALL ".join(
    _profile_sql_one(c)
    for c in ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
)


def q_corr_qty_price(sf_dir: str):
    """Per-group Pearson correlation via sufficient-statistics
    combiners (six numbers per key per block through the shuffle)."""
    from ..stages.window import grouped_corr

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])
    return _materialize(grouped_corr(
        ds, by="l_returnflag", x="l_quantity", y="l_extendedprice"))


SQL_CORR_QTY_PRICE = """
SELECT l_returnflag, corr(l_quantity, l_extendedprice) AS corr
FROM lineitem GROUP BY l_returnflag
"""


def q_concat_nations(sf_dir: str):
    """Ordered string aggregation per region (SQL string_agg)."""
    from ..stages.window import grouped_concat

    ds = _read(sf_dir, "nation", ["n_regionkey", "n_name"])
    return _materialize(grouped_concat(
        ds, by="n_regionkey", col="n_name", sep=","))


SQL_CONCAT_NATIONS = """
SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS agg
FROM nation GROUP BY n_regionkey
"""


def q_sample_docs(sf_dir: str):
    """Deterministic md5-keyed Bernoulli sample (reproducible across
    runs/cluster sizes — not random_sample)."""
    from ..stages.sampling import hash_sample

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    return _materialize(hash_sample(ds, id_col="doc_id", rate=0.2))


SQL_SAMPLE_DOCS = """
SELECT doc_id, lang FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      < 0.2 * 4294967296
"""


def q_sample_stratified(sf_dir: str):
    """Stratified deterministic sampling: downsample 'en' docs to 10%,
    keep 50% of the rest (corpus balancing primitive)."""
    from ..stages.sampling import stratified_hash_sample

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    return _materialize(stratified_hash_sample(
        ds, id_col="doc_id", strata_col="lang",
        rates={"en": 0.1}, default_rate=0.5))


SQL_SAMPLE_STRATIFIED = """
SELECT doc_id, lang FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      < (CASE WHEN lang = 'en' THEN 0.1 ELSE 0.5 END) * 4294967296
"""


def q_emb_hygiene(sf_dir: str):
    """Composed embedding pipeline: blocked cosine near-dup pairs ->
    drop the greater id per pair (broadcast drop set) -> per-label
    survivor counts."""
    from .corpus import embedding_hygiene

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    return _materialize(embedding_hygiene(emb, threshold=0.4))


SQL_EMB_HYGIENE = """
WITH pairs AS (
  SELECT b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) >= 0.4)
SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n_kept
FROM embeddings WHERE vec_id NOT IN (SELECT b FROM pairs)
GROUP BY label
"""


def q_corpus_prep(sf_dir: str):
    """Composed corpus-prep pipeline: one fused text scan (quality +
    md5 + lang-ID), vectorized quality filter, keep-first exact dedup,
    per-language rollup — all in one lazy streaming plan."""
    from .corpus import corpus_prep

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _materialize(
        corpus_prep(ds, min_quality=0.45),
        empty_schema=pa.schema([
            ("lang_pred", pa.string()), ("n_docs", pa.int64()),
            ("n_total", pa.int64()), ("mean_quality", pa.float64()),
        ]),
    )


SQL_CORPUS_PREP = f"""
WITH b AS (SELECT doc_id, text,
             CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) = '' THEN []
                  ELSE string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+') END AS ts
           FROM documents),
s AS (SELECT doc_id, md5(text) AS fp,
        0.5*(least(len(ts),100)/100.0)
        + 0.3*(len(list_filter(ts, t -> list_contains([{_EN}], t)))::DOUBLE
               / greatest(len(ts),1))
        + 0.2*(1 - length(regexp_replace(text,'[^.,;:!?]','','g'))::DOUBLE
               / greatest(length(text),1)) AS quality,
        len(list_filter(ts, t -> list_contains([{_EN}], t))) AS s_en,
        len(list_filter(ts, t -> list_contains([{_DE}], t))) AS s_de,
        len(list_filter(ts, t -> list_contains([{_FR}], t))) AS s_fr,
        len(list_filter(ts, t -> list_contains([{_ES}], t))) AS s_es,
        len(list_filter(ts, t -> list_contains([{_ZH}], t))) AS s_zh
      FROM b),
l AS (SELECT doc_id, fp, quality,
        CASE WHEN s_en+s_de+s_fr+s_es+s_zh = 0 THEN 'unknown'
             WHEN s_en >= greatest(s_de,s_fr,s_es,s_zh) THEN 'en'
             WHEN s_de >= greatest(s_fr,s_es,s_zh) THEN 'de'
             WHEN s_fr >= greatest(s_es,s_zh) THEN 'fr'
             WHEN s_es >= s_zh THEN 'es' ELSE 'zh' END AS lang_pred
      FROM s WHERE quality >= 0.45),
g AS (SELECT fp, count(*) AS n, min(quality) AS quality,
             min(lang_pred) AS lang_pred FROM l GROUP BY fp)
SELECT lang_pred, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS n_total,
       avg(quality) AS mean_quality
FROM g GROUP BY lang_pred
"""


# ---------------------------------------------------------------------------
# PSI drift (§2.I family): Population Stability Index between two slices
# ---------------------------------------------------------------------------


def q_psi_price_drift(sf_dir: str):
    """PSI of l_extendedprice: returnflag 'A' population vs the rest.
    Exercises stages.drift.psi — per-batch bincount partials, one
    tiny groupby over ≤10 bin keys, in-plan finalize."""
    from ..stages.drift import psi

    ds = _read(sf_dir, "lineitem", ["l_extendedprice", "l_returnflag"])
    return psi(
        ds, "l_extendedprice", split_col="l_returnflag", ref_value="A",
        lo=900.0, hi=105000.0, bins=10,
    )


SQL_PSI_PRICE_DRIFT = """
WITH binned AS (
  SELECT CAST(LEAST(GREATEST(FLOOR((l_extendedprice - 900.0) / 10410.0), 0), 9) AS BIGINT) AS bin,
         (l_returnflag = 'A') AS is_ref
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL
),
counts AS (
  SELECT bin,
         SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS nref,
         SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS ncmp
  FROM binned GROUP BY bin
),
tot AS (SELECT SUM(nref) AS tref, SUM(ncmp) AS tcmp FROM counts)
SELECT bin,
       (nref + 0.5) / (tref + 5.0) AS p,
       (ncmp + 0.5) / (tcmp + 5.0) AS q,
       ROUND(((nref + 0.5) / (tref + 5.0) - (ncmp + 0.5) / (tcmp + 5.0))
             * LN(((nref + 0.5) / (tref + 5.0)) / ((ncmp + 0.5) / (tcmp + 5.0))), 6) AS psi
FROM counts, tot
"""


# ---------------------------------------------------------------------------
# Event-sequence operators (stages/seq.py): first/last touch, transitions,
# EWMA, out-of-order validation, day streaks
# ---------------------------------------------------------------------------


def q_first_last_event(sf_dir: str):
    """First/last-touch attribution per user over the (ts, event_id)
    ordered stream."""
    from ..stages.seq import first_last_by

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type", "event_id"])
    return _materialize(first_last_by(
        ds, by="user_id", ts="ts", value_col="event_type",
        id_col="event_id"))


SQL_FIRST_LAST_EVENT = """
WITH o AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events
)
SELECT user_id, max(n) AS n_events,
       max(CASE WHEN rn = 1 THEN event_type END) AS first_value,
       max(CASE WHEN rn = n THEN event_type END) AS last_value
FROM o GROUP BY user_id
"""


def q_event_transitions(sf_dir: str):
    """Markov transition counts between consecutive event types per
    user (pre-counted per bucket; the groupby moves pair rows)."""
    from ..stages.seq import transition_counts

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type", "event_id"])
    return _materialize(transition_counts(
        ds, by="user_id", ts="ts", type_col="event_type",
        id_col="event_id"))


SQL_EVENT_TRANSITIONS = """
WITH o AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
)
SELECT event_type AS from_type, nxt AS to_type, count(*) AS n
FROM o WHERE nxt IS NOT NULL
GROUP BY event_type, nxt
"""


def q_ewma_user_value(sf_dir: str):
    """Final EWMA (alpha=0.3) of the event value per user — closed-form
    weighted sum, identical on both engines."""
    from ..stages.seq import ewma_last

    ds = _read(sf_dir, "events", ["user_id", "ts", "value", "event_id"])
    return _materialize(ewma_last(
        ds, by="user_id", ts="ts", value_col="value", id_col="event_id",
        alpha=0.3))


SQL_EWMA_USER_VALUE = """
WITH o AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events
)
SELECT user_id, max(n) AS n_events,
       round(sum(value * CASE WHEN rn = 1 THEN power(0.7, n - rn)
                              ELSE 0.3 * power(0.7, n - rn) END
                 ORDER BY rn), 6) AS ewma
FROM o GROUP BY user_id
"""


def q_inversions_events(sf_dir: str):
    """Out-of-order-delivery validation: per user, events whose ts runs
    backwards in event_id (ingest) order."""
    from ..stages.seq import inversion_counts

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts"])
    return _materialize(inversion_counts(
        ds, by="user_id", seq_col="event_id", ts="ts"))


SQL_INVERSIONS_EVENTS = """
WITH o AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS pts
  FROM events
)
SELECT user_id, count(*) AS n_events,
       coalesce(count(*) FILTER (WHERE ts < pts), 0) AS n_inversions
FROM o GROUP BY user_id
"""


def q_streak_days_user(sf_dir: str):
    """Longest consecutive-day activity streak per user
    (gaps-and-islands)."""
    from ..stages.seq import day_streaks

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    return _materialize(day_streaks(ds, by="user_id", ts="ts"))


SQL_STREAK_DAYS_USER = """
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events
),
r AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM d
),
s AS (SELECT user_id, grp, count(*) AS len FROM r GROUP BY user_id, grp)
SELECT user_id, CAST(sum(len) AS BIGINT) AS n_days, max(len) AS max_streak
FROM s GROUP BY user_id
"""


def q_cooccur_parts(sf_dir: str):
    """Top-100 co-ordered part pairs (market basket over lineitem,
    shift-join pair generation, pre-counted per bucket)."""
    from ..stages.basket import cooccur_pairs

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    return _materialize(cooccur_pairs(
        ds, by="l_orderkey", item_col="l_partkey", top=100))


SQL_COOCCUR_PARTS = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_partkey AS item_a, b.l_partkey AS item_b
  FROM d a JOIN d b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT item_a, item_b, count(*) AS n
FROM p GROUP BY item_a, item_b
ORDER BY n DESC, item_a, item_b LIMIT 100
"""


# ---------------------------------------------------------------------------
# Robust per-group statistics (stages/robust.py): Tukey fences, MAD
# ---------------------------------------------------------------------------


def q_iqr_outliers_price(sf_dir: str):
    """Per-priority Tukey-fence outlier count on o_totalprice
    (quartiles rounded to 6 dp on both sides before the fences)."""
    from ..stages.robust import iqr_outliers

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    return _materialize(iqr_outliers(
        ds, by="o_orderpriority", col="o_totalprice", k=1.5))


SQL_IQR_OUTLIERS_PRICE = """
WITH q AS (
  SELECT o_orderpriority,
         round(quantile_cont(o_totalprice, 0.25), 6) AS q1,
         round(quantile_cont(o_totalprice, 0.75), 6) AS q3
  FROM orders GROUP BY o_orderpriority
)
SELECT o.o_orderpriority, q.q1, q.q3,
       coalesce(count(*) FILTER (
         WHERE o.o_totalprice < q.q1 - 1.5 * (q.q3 - q.q1)
            OR o.o_totalprice > q.q3 + 1.5 * (q.q3 - q.q1)), 0) AS n_out
FROM orders o JOIN q USING (o_orderpriority)
GROUP BY o.o_orderpriority, q.q1, q.q3
"""


def q_mad_price_brand(sf_dir: str):
    """Median absolute deviation of p_retailprice per brand."""
    from ..stages.robust import grouped_mad

    ds = _read(sf_dir, "part", ["p_brand", "p_retailprice"])
    return _materialize(grouped_mad(ds, by="p_brand", col="p_retailprice"))


SQL_MAD_PRICE_BRAND = """
WITH med AS (
  SELECT p_brand, round(quantile_cont(p_retailprice, 0.5), 6) AS med
  FROM part GROUP BY p_brand
)
SELECT p.p_brand, med.med,
       round(quantile_cont(abs(p.p_retailprice - med.med), 0.5), 6) AS mad
FROM part p JOIN med USING (p_brand)
GROUP BY p.p_brand, med.med
"""


# ---------------------------------------------------------------------------
# Categorical / symmetric drift metrics (stages/drift.py)
# ---------------------------------------------------------------------------


def q_chi2_flag_status(sf_dir: str):
    """Chi-square independence of l_returnflag × l_linestatus (full
    grid including zero cells)."""
    from ..stages.drift import chi2_independence

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
    return _materialize(chi2_independence(ds, "l_returnflag",
                                          "l_linestatus"))


SQL_CHI2_FLAG_STATUS = """
WITH c AS (
  SELECT l_returnflag AS a, l_linestatus AS b, count(*) AS n
  FROM lineitem GROUP BY a, b
),
ra AS (SELECT a, sum(n) AS na FROM c GROUP BY a),
cb AS (SELECT b, sum(n) AS nb FROM c GROUP BY b),
tot AS (SELECT sum(n) AS t FROM c),
grid AS (
  SELECT ra.a, cb.b, ra.na * cb.nb / tot.t AS e,
         coalesce(c.n, 0) AS o
  FROM ra CROSS JOIN cb CROSS JOIN tot
  LEFT JOIN c ON c.a = ra.a AND c.b = cb.b
)
SELECT round(sum((o - e) * (o - e) / e), 6) AS chi2,
       (SELECT (count(*) - 1) FROM ra) * (SELECT (count(*) - 1) FROM cb)
         AS dof,
       (SELECT CAST(t AS BIGINT) FROM tot) AS n
FROM grid
"""


def q_jsd_price_drift(sf_dir: str):
    """Jensen–Shannon divergence of l_extendedprice: returnflag 'A'
    vs the rest (same smoothed histogram frame as PSI)."""
    from ..stages.drift import jsd

    ds = _read(sf_dir, "lineitem", ["l_extendedprice", "l_returnflag"])
    return jsd(
        ds, "l_extendedprice", split_col="l_returnflag", ref_value="A",
        lo=900.0, hi=105000.0, bins=10,
    )


SQL_JSD_PRICE_DRIFT = """
WITH binned AS (
  SELECT CAST(LEAST(GREATEST(FLOOR((l_extendedprice - 900.0) / 10410.0), 0), 9) AS BIGINT) AS bin,
         (l_returnflag = 'A') AS is_ref
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL
),
counts AS (
  SELECT bin,
         SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS nref,
         SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS ncmp
  FROM binned GROUP BY bin
),
tot AS (SELECT SUM(nref) AS tref, SUM(ncmp) AS tcmp FROM counts),
pq AS (
  SELECT bin,
         (nref + 0.5) / (tref + 5.0) AS p,
         (ncmp + 0.5) / (tcmp + 5.0) AS q
  FROM counts, tot
)
SELECT bin, p, q,
       ROUND(0.5 * p * LN(p / ((p + q) / 2))
             + 0.5 * q * LN(q / ((p + q) / 2)), 6) AS jsd
FROM pq
"""


# ---------------------------------------------------------------------------
# Small grouped aggregates: calendar rollup, weighted mean, geometric mean
# ---------------------------------------------------------------------------


def q_dow_orders(sf_dir: str):
    """Orders per ISO day-of-week: count + order-independent
    integer-cents revenue sum (same stabilization as agg_returnflag)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def project(t: pa.Table) -> pa.Table:
        dow = pc.day_of_week(t.column("o_orderdate"),
                             count_from_zero=False, week_start=1)
        return pa.table({
            "dow": pc.cast(dow, pa.int64()),
            "price_c": pc.cast(
                pc.round(pc.multiply(t.column("o_totalprice"), 100.0)),
                pa.int64()),
        })

    agg = ds.map_batches(project, batch_format="pyarrow",
                         zero_copy_batch=True)
    agg = agg.groupby("dow").aggregate(
        Count(alias_name="n"), Sum("price_c", alias_name="sum_c"))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "dow": t.column("dow"),
            "n": t.column("n"),
            "sum_price": pc.divide(
                pc.cast(t.column("sum_c"), pa.float64()), 100.0),
        })

    return agg.map_batches(finalize, batch_format="pyarrow",
                           zero_copy_batch=True)


SQL_DOW_ORDERS = """
SELECT isodow(o_orderdate) AS dow, count(*) AS n,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS sum_price
FROM orders GROUP BY dow
"""


def q_wavg_discount(sf_dir: str):
    """Quantity-weighted mean discount per returnflag (ratio of two
    distributed sums; division normalizes the association error)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_discount", "l_quantity"])

    def project(t: pa.Table) -> pa.Table:
        # exact integer basis points × integer quantity: a double-sum
        # here is order-dependent (engine and SQL sum in different
        # orders), and the true ratio is an exact rational that can
        # straddle a 6-dp rounding boundary between the two sums
        bp = pc.cast(pc.round(pc.multiply(t.column("l_discount"), 100.0)),
                     pa.int64())
        q = pc.cast(pc.round(t.column("l_quantity")), pa.int64())
        return pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "dq": pc.multiply(bp, q),
            "q": q,
        })

    agg = ds.map_batches(project, batch_format="pyarrow",
                         zero_copy_batch=True).groupby(
        "l_returnflag").aggregate(
        Sum("dq", alias_name="sdq"), Sum("q", alias_name="sq"))

    def finalize(t: pa.Table) -> pa.Table:
        den = pc.multiply(pc.cast(t.column("sq"), pa.float64()), 100.0)
        return pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "wavg_discount": pc.divide(
                pc.cast(t.column("sdq"), pa.float64()), den),
        })

    return agg.map_batches(finalize, batch_format="pyarrow",
                           zero_copy_batch=True)


SQL_WAVG_DISCOUNT = """
SELECT l_returnflag,
       CAST(sum(CAST(round(l_discount * 100) AS BIGINT)
                * CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
         / (CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
            * 100.0) AS wavg_discount
FROM lineitem GROUP BY l_returnflag
"""


def q_geomean_price_brand(sf_dir: str):
    """Geometric mean retail price per brand: exp(mean(ln x)) from
    (n, sum ln) partials."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "part", ["p_brand", "p_retailprice"])

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "p_brand": t.column("p_brand"),
            "lnp": pc.ln(pc.cast(t.column("p_retailprice"), pa.float64())),
        })

    agg = ds.map_batches(project, batch_format="pyarrow",
                         zero_copy_batch=True).groupby("p_brand").aggregate(
        Sum("lnp", alias_name="slnp"), Count(alias_name="n"))

    def finalize(t: pa.Table) -> pa.Table:
        import numpy as np

        s = t.column("slnp").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(float)
        return pa.table({
            "p_brand": t.column("p_brand"),
            "n": t.column("n"),
            "geomean": pa.array(np.round(np.exp(s / n), 6)),
        })

    return agg.map_batches(finalize, batch_format="pyarrow",
                           zero_copy_batch=True)


SQL_GEOMEAN_PRICE_BRAND = """
SELECT p_brand, count(*) AS n,
       round(exp(avg(ln(p_retailprice))), 6) AS geomean
FROM part GROUP BY p_brand
"""


# ---------------------------------------------------------------------------
# One-pass correlation matrix, equi-depth histogram, quantile_disc,
# regex-structured extraction, lexical richness, cross-table consistency
# ---------------------------------------------------------------------------


def q_corr_matrix_lineitem(sf_dir: str):
    """Pairwise Pearson correlations over four lineitem measures in one
    sufficient-statistics pass."""
    from ..stages.profile import corr_matrix

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    return corr_matrix(_read(sf_dir, "lineitem", cols), cols)


SQL_CORR_MATRIX_LINEITEM = """
SELECT 'l_quantity' AS x, 'l_extendedprice' AS y,
       round(corr(l_quantity, l_extendedprice), 6) AS corr FROM lineitem
UNION ALL SELECT 'l_quantity', 'l_discount',
       round(corr(l_quantity, l_discount), 6) FROM lineitem
UNION ALL SELECT 'l_quantity', 'l_tax',
       round(corr(l_quantity, l_tax), 6) FROM lineitem
UNION ALL SELECT 'l_extendedprice', 'l_discount',
       round(corr(l_extendedprice, l_discount), 6) FROM lineitem
UNION ALL SELECT 'l_extendedprice', 'l_tax',
       round(corr(l_extendedprice, l_tax), 6) FROM lineitem
UNION ALL SELECT 'l_discount', 'l_tax',
       round(corr(l_discount, l_tax), 6) FROM lineitem
"""


def q_qhist_price(sf_dir: str):
    """Equi-depth decile histogram of l_extendedprice (edges = exact
    global quantiles, rounded to 6 dp on both engines)."""
    from ..stages.profile import quantile_histogram

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    return _materialize(quantile_histogram(ds, "l_extendedprice",
                                           n_bins=10))


SQL_QHIST_PRICE = """
WITH e AS (
  SELECT round(unnest(quantile_cont(l_extendedprice,
    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])), 6) AS edge
  FROM lineitem
)
SELECT (SELECT count(*) FROM e WHERE e.edge <= l.l_extendedprice) AS bin,
       count(*) AS n
FROM lineitem l GROUP BY bin
"""


def q_p90_disc_price(sf_dir: str):
    """Per-priority discrete 90th percentile (quantile_disc parity:
    smallest value whose cumulative rank reaches q)."""
    from ..stages.window import grouped_quantile

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    return _materialize(grouped_quantile(
        ds, by="o_orderpriority", col="o_totalprice", q=0.9,
        alias="p90", method="disc"))


SQL_P90_DISC_PRICE = """
SELECT o_orderpriority, quantile_disc(o_totalprice, 0.9) AS p90
FROM orders GROUP BY o_orderpriority
"""


def q_brand_id_extract(sf_dir: str):
    """Regex-structured extraction: numeric id out of 'Brand#NN' via
    pc.extract_regex, then a count per id — the parse-a-schema-from-a-
    string primitive."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "part", ["p_brand"])

    def extract(t: pa.Table) -> pa.Table:
        st = pc.extract_regex(t.column("p_brand"), r"Brand#(?P<id>\d+)")
        return pa.table({
            "brand_id": pc.cast(pc.struct_field(st, "id"), pa.int64()),
        })

    return ds.map_batches(extract, batch_format="pyarrow",
                          zero_copy_batch=True).groupby(
        "brand_id").aggregate(Count(alias_name="n"))


SQL_BRAND_ID_EXTRACT = """
SELECT CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS BIGINT)
         AS brand_id,
       count(*) AS n
FROM part GROUP BY brand_id
"""


def q_lexical_lang(sf_dir: str):
    """Per-language lexical richness: occurrences, types, hapax,
    type-token ratio."""
    from ..stages.text import lexical_richness

    ds = _read(sf_dir, "documents", ["lang", "text"])
    return _materialize(lexical_richness(ds, "text", group_col="lang"))


SQL_LEXICAL_LANG = """
WITH toks AS (
  SELECT lang,
         unnest(string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\s+')) AS token
  FROM documents WHERE trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) <> ''
),
tc AS (
  SELECT lang, token, count(*) AS c
  FROM toks WHERE token <> '' GROUP BY lang, token
)
SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_types,
       coalesce(count(*) FILTER (WHERE c = 1), 0) AS hapax,
       count(*) / CAST(sum(c) AS DOUBLE) AS ttr
FROM tc GROUP BY lang
"""


def q_ship_consistency(sf_dir: str):
    """Cross-table temporal consistency: line items shipped BEFORE
    their order date, counted per order status (distributed hash join
    + per-batch partial counts)."""
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderstatus"])
    from ..stages.relational import safe_join

    j = safe_join(li, orders, join_type="inner", num_partitions=8,
                  on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(
            t.column("o_orderstatus").combine_chunks()
            if isinstance(t.column("o_orderstatus"), pa.ChunkedArray)
            else t.column("o_orderstatus"))
        import numpy as np

        code = np.asarray(enc.indices, dtype=np.int64)
        bad = pc.less(t.column("l_shipdate"), t.column("o_orderdate"))
        b = bad.combine_chunks().to_numpy(zero_copy_only=False).astype(
            np.int64) if isinstance(bad, pa.ChunkedArray) else \
            bad.to_numpy(zero_copy_only=False).astype(np.int64)
        m = len(enc.dictionary)
        return pa.table({
            "o_orderstatus": enc.dictionary,
            "n": pa.array(np.bincount(code, minlength=m).astype("int64")),
            "n_bad": pa.array(np.bincount(code, weights=b,
                                          minlength=m).astype("int64")),
        })

    return j.map_batches(partial, batch_format="pyarrow").groupby(
        "o_orderstatus").aggregate(Sum("n", alias_name="n"),
                                   Sum("n_bad", alias_name="n_bad"))


SQL_SHIP_CONSISTENCY = """
SELECT o_orderstatus, count(*) AS n,
       coalesce(count(*) FILTER (WHERE l_shipdate < o_orderdate), 0)
         AS n_bad
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# Share-of-total, cumulative series, FK fan-out, day-level anomaly,
# composed lag+quantile
# ---------------------------------------------------------------------------


def q_revenue_share(sf_dir: str):
    """Percent-of-total revenue per priority: integer-cents group sums,
    share = group / grand total (one groupby, finalize on one block)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderpriority": t.column("o_orderpriority"),
            "c": pc.cast(pc.round(pc.multiply(t.column("o_totalprice"),
                                              100.0)), pa.int64()),
        })

    agg = ds.map_batches(to_cents, batch_format="pyarrow",
                         zero_copy_batch=True).groupby(
        "o_orderpriority").aggregate(Sum("c", alias_name="c"))

    def finalize(t: pa.Table) -> pa.Table:
        import numpy as np

        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        total = float(c.sum())
        return pa.table({
            "o_orderpriority": t.column("o_orderpriority"),
            "revenue": pa.array(c / 100.0),
            "share": pa.array(c / total),
        })

    # ≤ #priorities rows reach the finalize: one block
    return agg.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


SQL_REVENUE_SHARE = """
WITH g AS (
  SELECT o_orderpriority,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS c
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, c / 100.0 AS revenue,
       c / (SELECT CAST(sum(c) AS DOUBLE) FROM g) AS share
FROM g
"""


def q_monthly_cumulative(sf_dir: str):
    """Monthly revenue + running cumulative (months are few, so the
    cumulative scan happens in one finalize block after the groupby)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def project(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column("o_orderdate"), pa.timestamp("s"))
        return pa.table({
            "ym": pc.strftime(ts, format="%Y-%m"),
            "c": pc.cast(pc.round(pc.multiply(t.column("o_totalprice"),
                                              100.0)), pa.int64()),
        })

    agg = ds.map_batches(project, batch_format="pyarrow",
                         zero_copy_batch=True).groupby("ym").aggregate(
        Sum("c", alias_name="c"))

    def finalize(t: pa.Table) -> pa.Table:
        import numpy as np

        t = t.sort_by("ym")
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "ym": t.column("ym"),
            "revenue": pa.array(c / 100.0),
            "cum_revenue": pa.array(np.cumsum(c) / 100.0),
        })

    return agg.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


SQL_MONTHLY_CUMULATIVE = """
WITH g AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS ym,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS c
  FROM orders GROUP BY ym
)
SELECT ym, c / 100.0 AS revenue,
       CAST(sum(c) OVER (ORDER BY ym) AS BIGINT) / 100.0 AS cum_revenue
FROM g
"""


def q_fanout_stats(sf_dir: str):
    """Referential fan-out profile: orders-per-customer distribution
    per market segment, customers with zero orders included (left
    join)."""
    from ray.data.aggregate import Count, Max, Sum

    orders = _read(sf_dir, "orders", ["o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    counts = orders.groupby("o_custkey").aggregate(Count(alias_name="n"))
    from ..stages.relational import safe_join

    j = safe_join(cust, counts, join_type="left_outer", num_partitions=8,
                  on=("c_custkey",), right_on=("o_custkey",))

    def project(t: pa.Table) -> pa.Table:
        n = pc.coalesce(t.column("n"), pa.scalar(0, pa.int64()))
        return pa.table({
            "c_mktsegment": t.column("c_mktsegment"),
            "n": pc.cast(n, pa.int64()),
        })

    agg = j.map_batches(project, batch_format="pyarrow").groupby(
        "c_mktsegment").aggregate(
        Count(alias_name="n_cust"),
        Sum("n", alias_name="s"),
        Max("n", alias_name="max_orders"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        import numpy as np

        s = t.column("s").to_numpy(zero_copy_only=False).astype(np.float64)
        nc = t.column("n_cust").to_numpy(zero_copy_only=False).astype(
            np.float64)
        return pa.table({
            "c_mktsegment": t.column("c_mktsegment"),
            "n_cust": t.column("n_cust"),
            "mean_orders": pa.array(s / nc),
            "max_orders": t.column("max_orders"),
        })

    return agg.map_batches(finalize, batch_format="pyarrow",
                           zero_copy_batch=True)


SQL_FANOUT_STATS = """
WITH cnt AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey)
SELECT c_mktsegment, count(*) AS n_cust,
       sum(coalesce(n, 0)) / CAST(count(*) AS DOUBLE) AS mean_orders,
       max(coalesce(n, 0)) AS max_orders
FROM customer LEFT JOIN cnt ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


def q_daily_anomaly(sf_dir: str):
    """Day-level volume anomaly screen: daily event counts flagged when
    |z| > 2 against the all-days mean/stddev (monitoring primitive)."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", ["ts"])

    def project(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")),
                     pa.int64())
        return pa.table({"day": pc.divide(us, 86_400_000_000)})

    agg = ds.map_batches(project, batch_format="pyarrow",
                         zero_copy_batch=True).groupby("day").aggregate(
        Count(alias_name="n"))

    def finalize(t: pa.Table) -> pa.Table:
        import numpy as np

        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        mu = n.mean()
        sd = n.std(ddof=1) if len(n) > 1 else float("nan")
        z = (n - mu) / sd
        return pa.table({
            "day": t.column("day"),
            "n": t.column("n"),
            "z": pa.array(np.round(z, 6)),
            "is_anom": pa.array(np.abs(n - mu) > 2 * sd),
        })

    return agg.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


SQL_DAILY_ANOMALY = """
WITH d AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         count(*) AS n
  FROM events GROUP BY day
),
s AS (SELECT avg(n) AS mu, stddev_samp(n) AS sd FROM d)
SELECT day, n, round((n - mu) / sd, 6) AS z,
       (abs(n - mu) > 2 * sd) AS is_anom
FROM d, s
"""


def q_median_gap_user(sf_dir: str):
    """Composition: lag_diff (inter-event gaps) feeding grouped_quantile
    (median gap per user) — two engine stages chained lazily."""
    from ..stages.window import grouped_quantile
    from ..stages.winfunc import lag_diff

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    gaps = lag_diff(ds, by="user_id", order_col="ts", id_col="event_id")

    def drop_null(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column("gap")))

    gaps = gaps.map_batches(drop_null, batch_format="pyarrow",
                            zero_copy_batch=True)
    return _materialize(grouped_quantile(
        gaps, by="user_id", col="gap", q=0.5, alias="med_gap"))


SQL_MEDIAN_GAP_USER = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT user_id, round(quantile_cont(gap, 0.5), 6) AS med_gap
FROM g WHERE gap IS NOT NULL GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Behavioral analytics: transition probabilities, activity matrix,
# D1 retention, session durations
# ---------------------------------------------------------------------------


def q_transition_probs(sf_dir: str):
    """Markov transition PROBABILITIES: transition_counts (small) →
    one-block finalize normalizing per from_type."""
    from ..stages.seq import transition_counts

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type", "event_id"])
    counts = transition_counts(ds, by="user_id", ts="ts",
                               type_col="event_type", id_col="event_id")

    def finalize(t: pa.Table) -> pa.Table:
        import numpy as np

        enc = pc.dictionary_encode(
            t.column("from_type").combine_chunks()
            if isinstance(t.column("from_type"), pa.ChunkedArray)
            else t.column("from_type"))
        code = np.asarray(enc.indices, dtype=np.int64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        tot = np.bincount(code, weights=n)
        # NO query-side rounding: both engines compute the identical
        # exact float64 quotient (integer counts), and np.round
        # (half-even) vs DuckDB round (half-away) disagree when the
        # quotient lands exactly on a 6dp half (e.g. 1/128).  The
        # driver's canonicalization rounds both sides with ONE function.
        return pa.table({
            "from_type": t.column("from_type"),
            "to_type": t.column("to_type"),
            "n": t.column("n"),
            "p": pa.array(n / tot[code]),
        })

    return counts.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


SQL_TRANSITION_PROBS = """
WITH o AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
),
c AS (
  SELECT event_type AS from_type, nxt AS to_type, count(*) AS n
  FROM o WHERE nxt IS NOT NULL GROUP BY event_type, nxt
)
SELECT from_type, to_type, n,
       n / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
FROM c
"""


def q_activity_matrix(sf_dir: str):
    """Distinct active users and event volume per (day, event_type) —
    COUNT(DISTINCT) via a dedupe groupby feeding a count groupby."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["ts", "event_type", "user_id"])

    def project(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64())
        return pa.table({
            "day": pc.divide(us, 86_400_000_000),
            "event_type": t.column("event_type"),
            "user_id": t.column("user_id"),
        })

    per_user = ds.map_batches(project, batch_format="pyarrow",
                              zero_copy_batch=True).groupby(
        ["day", "event_type", "user_id"]).aggregate(Count(alias_name="n"))
    return per_user.groupby(["day", "event_type"]).aggregate(
        Count(alias_name="n_users"), Sum("n", alias_name="n"))


SQL_ACTIVITY_MATRIX = """
SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day, event_type,
       count(DISTINCT user_id) AS n_users, count(*) AS n
FROM events GROUP BY day, event_type
"""


def q_retention_daily(sf_dir: str):
    """D1 retention: per day, active users who return the next day."""
    from ..stages.seq import next_day_retention

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    return _materialize(next_day_retention(ds, by="user_id", ts="ts"))


SQL_RETENTION_DAILY = """
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events
)
SELECT a.day, count(*) AS n_active,
       coalesce(count(*) FILTER (WHERE b.user_id IS NOT NULL), 0)
         AS n_retained
FROM d a LEFT JOIN d b
  ON a.user_id = b.user_id AND b.day = a.day + 1
GROUP BY a.day
"""


def q_session_durations_users(sf_dir: str):
    """Per-user session duration stats (same 30-min gap rule as
    sessionize_users)."""
    from ..stages.sessions import session_durations

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    return _materialize(session_durations(ds, by="user_id", ts="ts",
                                          gap_s=1800.0))


SQL_SESSION_DURATIONS_USERS = """
WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
o AS (
  SELECT user_id, t,
         CASE WHEN lag(t) OVER w IS NULL
                OR t - lag(t) OVER w > 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)
),
s AS (
  SELECT user_id, t,
         sum(brk) OVER (PARTITION BY user_id ORDER BY t
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
),
g AS (
  SELECT user_id, sid, max(t) - min(t) AS dur
  FROM s GROUP BY user_id, sid
)
SELECT user_id, count(*) AS n_sessions,
       CAST(sum(dur) AS BIGINT) AS total_dur_us,
       max(dur) AS max_dur_us
FROM g GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Shuffle-planning skew diagnostic + PPS weighted sampling
# ---------------------------------------------------------------------------


def q_skew_suppkey(sf_dir: str):
    """Key-skew report for l_suppkey — the measurement that decides
    whether a prospective shuffle key needs salting."""
    from ..stages.profile import key_skew_report

    ds = _read(sf_dir, "lineitem", ["l_suppkey"])
    return _materialize(key_skew_report(ds, "l_suppkey", top=10))


SQL_SKEW_SUPPKEY = """
WITH c AS (SELECT l_suppkey AS k, count(*) AS n FROM lineitem GROUP BY k),
t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot, count(*) AS nk FROM c),
r AS (SELECT n, row_number() OVER (ORDER BY n DESC, k) AS rn FROM c)
SELECT (SELECT nk FROM t) AS n_keys,
       (SELECT CAST(tot AS BIGINT) FROM t) AS n_rows,
       (SELECT max(n) FROM c) / (SELECT tot FROM t) AS top1_share,
       (SELECT sum(n) FROM r WHERE rn <= 10) / (SELECT tot FROM t)
         AS topk_share,
       round(-(SELECT sum((n / tot) * ln(n / tot)) FROM c, t)
             / ln((SELECT nk FROM t)), 6) AS entropy
"""


def q_sample_weighted(sf_dir: str):
    """Probability-proportional-to-size sampling: orders kept with
    probability o_totalprice / 500000 (clamped), deterministic in
    o_orderkey — DuckDB recomputes the identical md5 decision."""
    from ..stages.sampling import weighted_hash_sample

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return _materialize(weighted_hash_sample(
        ds, id_col="o_orderkey", weight_col="o_totalprice",
        rate_per_unit=1.0 / 500000.0))


SQL_SAMPLE_WEIGHTED = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
           AS BIGINT) / 4294967296.0
      < LEAST(o_totalprice / 500000.0, 1.0)
"""


def q_quantize_embeddings(sf_dir: str):
    """Int8 quantization audit of the embedding corpus: per-dim
    (vmin, vmax, scale, mse of round-trip reconstruction).  The SQL
    side uses round_even() so both engines apply the identical
    banker's rounding to the code assignment."""
    from ..stages.mlprep import quantize_report

    ds = _read(sf_dir, "embeddings", ["embedding"])
    return _materialize(quantize_report(ds, vec_col="embedding",
                                        levels=255))


SQL_QUANTIZE_EMBEDDINGS = """
WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
dims AS (SELECT CAST(unnest(range(64)) AS BIGINT) AS dim),
x AS (SELECT d.dim, e.v[d.dim + 1] AS val FROM e CROSS JOIN dims d),
mm AS (SELECT dim, min(val) AS vmin, max(val) AS vmax FROM x GROUP BY dim),
q AS (
  SELECT x.dim, x.val, mm.vmin, mm.vmax,
         (mm.vmax - mm.vmin) / 255.0 AS scale
  FROM x JOIN mm USING (dim)
),
r AS (
  SELECT dim, vmin, vmax, scale,
         CASE WHEN scale = 0 THEN 0.0
              ELSE val - (vmin + round_even((val - vmin) / scale, 0)
                          * scale) END AS err
  FROM q
)
SELECT dim, vmin, vmax, scale, avg(err * err) AS mse
FROM r GROUP BY dim, vmin, vmax, scale
"""


def q_dup_degree_hist(sf_dir: str):
    """Degree distribution of the near-dup pair graph (jaccard >= 0.8
    pairs over documents): (degree, n_nodes)."""
    from ..stages.dedup import jaccard_pairs_exact
    from ..stages.graph import degree_histogram

    pairs = jaccard_pairs_exact(
        _read(sf_dir, "documents", ["doc_id", "text"]), "text", "doc_id",
        n=3, threshold=0.8, shuffle_partitions=8)
    return _materialize(
        degree_histogram(pairs, a_col="a", b_col="b"),
        empty_schema=pa.schema([("degree", pa.int64()),
                                ("n_nodes", pa.int64())]),
    )


SQL_DUP_DEGREE_HIST = """
WITH tok AS (SELECT doc_id, string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+') AS ts FROM documents),
sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(ts)-2),
         i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s FROM tok),
pairs AS (SELECT a.doc_id AS a, b.doc_id AS b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s,b.s))::DOUBLE
        / (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.8),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT a AS node FROM pairs UNION ALL SELECT b FROM pairs) t
  GROUP BY node
)
SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY degree
"""


def q_kmeans_embeddings(sf_dir: str):
    """Distributed Lloyd's k-means (k=4, 2 iterations) — the iterative
    broadcast-small-state pattern: per iteration the corpus streams
    through one assignment+partial-sum map_batches and a tiny groupby;
    integer-unit centroid updates make the whole run bitwise
    SQL-reproducible (verified atol=0 vs DuckDB at sf0.001)."""
    from ..stages.similarity import kmeans

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return kmeans(ds, id_col="vec_id", vec_col="embedding", k=4, iters=2)


SQL_KMEANS_EMBEDDINGS = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
dims AS (SELECT CAST(unnest(range(64)) AS BIGINT) AS dim),
init AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, v
  FROM e ORDER BY vec_id LIMIT 4
),
a1 AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, i.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY list_distance(e.v, i.v), i.cid) AS rn
    FROM e CROSS JOIN init i) t WHERE rn = 1
),
s1 AS (
  SELECT a1.cid, d.dim,
         sum(CAST(round(e.v[d.dim + 1] * 1000000.0) AS BIGINT)) AS s,
         count(*) AS n
  FROM a1 JOIN e USING (vec_id) CROSS JOIN dims d
  GROUP BY a1.cid, d.dim
),
c1 AS (
  SELECT i.cid, d.dim,
         CASE WHEN s1.n IS NULL THEN i.v[d.dim + 1]
              ELSE (CAST(s1.s AS DOUBLE) / 1000000.0) / s1.n END AS c
  FROM init i CROSS JOIN dims d
  LEFT JOIN s1 ON s1.cid = i.cid AND s1.dim = d.dim
),
c1v AS (SELECT cid, list(c ORDER BY dim) AS v FROM c1 GROUP BY cid),
a2 AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, cv.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY list_distance(e.v, cv.v), cv.cid) AS rn
    FROM e CROSS JOIN c1v cv) t WHERE rn = 1
),
s2 AS (
  SELECT a2.cid, d.dim,
         sum(CAST(round(e.v[d.dim + 1] * 1000000.0) AS BIGINT)) AS s,
         count(*) AS n
  FROM a2 JOIN e USING (vec_id) CROSS JOIN dims d
  GROUP BY a2.cid, d.dim
)
SELECT c1.cid, c1.dim,
       CASE WHEN s2.n IS NULL THEN c1.c
            ELSE (CAST(s2.s AS DOUBLE) / 1000000.0) / s2.n END AS c,
       COALESCE(s2.n, 0) AS n
FROM c1 LEFT JOIN s2 ON s2.cid = c1.cid AND s2.dim = c1.dim
"""


def q_fd_brand_type(sf_dir: str):
    """Functional-dependency audit: brands whose p_type is not
    determined by p_brand (count of distinct dependent values per
    violating determinant)."""
    from ..stages.mlprep import fd_violations

    ds = _read(sf_dir, "part", ["p_brand", "p_type"])
    return _materialize(
        fd_violations(ds, det_col="p_brand", dep_col="p_type"),
        empty_schema=pa.schema([("p_brand", pa.string()),
                                ("n_vals", pa.int64())]),
    )


SQL_FD_BRAND_TYPE = """
SELECT p_brand, CAST(count(DISTINCT p_type) AS BIGINT) AS n_vals
FROM part GROUP BY p_brand HAVING count(DISTINCT p_type) > 1
"""


def q_target_encode_segment(sf_dir: str):
    """Target encoding: per-market-segment mean account balance
    attached to every customer row (integer-cents stats broadcast via
    ray.put; the fact table streams with no shuffle)."""
    from ..stages.mlprep import target_encode

    ds = _read(sf_dir, "customer",
               ["c_custkey", "c_mktsegment", "c_acctbal"])
    return _materialize(target_encode(
        ds, cat_col="c_mktsegment", target_col="c_acctbal",
        id_col="c_custkey"))


SQL_TARGET_ENCODE_SEGMENT = """
WITH g AS (
  SELECT c_mktsegment,
         sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS s,
         count(*) AS n
  FROM customer GROUP BY c_mktsegment
)
SELECT c_custkey, c.c_mktsegment,
       (CAST(s AS DOUBLE) / 100.0) / n AS te
FROM customer c JOIN g USING (c_mktsegment)
"""


def q_split_balance_orders(sf_dir: str):
    """Deterministic md5-keyed train/val/test split of orders with the
    per-(split, status) class-balance matrix."""
    from ..stages.mlprep import split_balance

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    return _materialize(split_balance(
        ds, id_col="o_orderkey", class_col="o_orderstatus",
        train=0.8, val=0.1))


SQL_SPLIT_BALANCE_ORDERS = """
WITH u AS (
  SELECT o_orderstatus,
         CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
              AS BIGINT) / 4294967296.0 AS u
  FROM orders
)
SELECT CASE WHEN u < 0.8 THEN 'train'
            WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split,
       o_orderstatus, CAST(count(*) AS BIGINT) AS n
FROM u GROUP BY 1, 2
"""


def q_text_bigrams(sf_dir: str):
    """Top-20 consecutive token pairs across the corpus (combiner
    pre-counts per batch; vocabulary-bounded exchange)."""
    from ..stages.text import bigram_topk

    return _materialize(bigram_topk(
        _read(sf_dir, "documents", ["text"]), "text", k=20))


SQL_TEXT_BIGRAMS = """
WITH t AS (
  SELECT string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\s+') AS l
  FROM documents WHERE trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) <> ''
),
b AS (
  SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p FROM t
)
SELECT p[1] AS w1, p[2] AS w2, count(*) AS n
FROM b WHERE p[1] <> '' AND p[2] <> ''
GROUP BY w1, w2 ORDER BY n DESC, w1, w2 LIMIT 20
"""


def q_emb_confusion(sf_dir: str):
    """Pairwise cosine between label centroids (label-confusion
    screen), computed from the 6-dp-rounded centroids on both engines."""
    from ..stages.similarity import centroid_confusion

    ds = _read(sf_dir, "embeddings", ["label", "embedding"])
    return centroid_confusion(ds, label_col="label", vec_col="embedding")


SQL_EMB_CONFUSION = """
WITH u AS (
  SELECT label,
         unnest(range(len(embedding))) AS dim,
         unnest(CAST(embedding AS DOUBLE[])) AS e
  FROM embeddings
),
c AS (
  SELECT CAST(label AS BIGINT) AS label, dim, ROUND(avg(e), 6) AS v
  FROM u GROUP BY label, dim
),
n AS (SELECT label, sqrt(sum(v * v)) AS nrm FROM c GROUP BY label),
d AS (
  SELECT a.label AS label_a, b.label AS label_b, sum(a.v * b.v) AS dot
  FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
  GROUP BY a.label, b.label
)
SELECT label_a, label_b,
       round(dot / (na.nrm * nb.nrm), 6) AS cos
FROM d
JOIN n na ON label_a = na.label
JOIN n nb ON label_b = nb.label
"""


def q_mom_change(sf_dir: str):
    """Month-over-month revenue change: monthly integer-cents sums →
    one-block finalize computing pct change vs the previous month."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def project(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column("o_orderdate"), pa.timestamp("s"))
        return pa.table({
            "ym": pc.strftime(ts, format="%Y-%m"),
            "c": pc.cast(pc.round(pc.multiply(t.column("o_totalprice"),
                                              100.0)), pa.int64()),
        })

    agg = ds.map_batches(project, batch_format="pyarrow",
                         zero_copy_batch=True).groupby("ym").aggregate(
        Sum("c", alias_name="c"))

    def finalize(t: pa.Table) -> pa.Table:
        import numpy as np

        t = t.sort_by("ym")
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        prev = np.empty_like(c)
        prev[0] = np.nan
        prev[1:] = c[:-1]
        # exact integer-cent arithmetic → bitwise-equal quotient on both
        # engines; no query-side rounding (6dp-half split hazard)
        with np.errstate(invalid="ignore", divide="ignore"):
            pct = (c - prev) / prev
        return pa.table({
            "ym": t.column("ym"),
            "revenue": pa.array(c / 100.0),
            "mom_pct": pa.array(pct, pa.float64(), mask=np.isnan(pct)),
        })

    return agg.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


SQL_MOM_CHANGE = """
WITH g AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS ym,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS c
  FROM orders GROUP BY ym
)
SELECT ym, c / 100.0 AS revenue,
       (c - lag(c) OVER (ORDER BY ym))
         / CAST(lag(c) OVER (ORDER BY ym) AS DOUBLE) AS mom_pct
FROM g
"""


def q_wau_rolling(sf_dir: str):
    """Rolling 7-day active users per day: each distinct (user, day)
    pair is credited to days d..d+6, then distinct users per credited
    day — a bounded 7x expansion of the DEDUPED pair stream, never of
    raw events."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def project(t: pa.Table) -> pa.Table:
        import numpy as np

        us = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")),
                     pa.int64())
        return pa.table({
            "user_id": t.column("user_id"),
            "day": pc.divide(us, 86_400_000_000),
        })

    pairs = ds.map_batches(project, batch_format="pyarrow",
                           zero_copy_batch=True).groupby(
        ["user_id", "day"]).aggregate(Count(alias_name="_n"))

    def credit(t: pa.Table) -> pa.Table:
        import numpy as np

        u = t.column("user_id").to_numpy(zero_copy_only=False)
        d = t.column("day").to_numpy(zero_copy_only=False)
        n = len(u)
        rep_u = np.repeat(u, 7)
        rep_d = np.repeat(d, 7) + np.tile(np.arange(7, dtype=np.int64), n)
        return pa.table({"user_id": pa.array(rep_u),
                         "day": pa.array(rep_d)})

    credited = pairs.map_batches(credit, batch_format="pyarrow")
    # a user active on several days inside one window is credited to
    # the same day more than once — dedupe before the per-day count
    dedup = credited.groupby(["day", "user_id"]).aggregate(
        Count(alias_name="_n"))
    out = dedup.groupby("day").aggregate(Count(alias_name="wau"))

    # drop the 6 warm-up days credited past each real day only when no
    # real activity happened there: keep days that exist in the data
    days = pairs.groupby("day").aggregate(Count(alias_name="_d"))

    def mark(t: pa.Table) -> pa.Table:
        return pa.table({"day": t.column("day")})

    real_days = _materialize(days.map_batches(
        mark, batch_format="pyarrow")).column("day")

    def keep_real(t: pa.Table) -> pa.Table:
        m = pc.is_in(t.column("day"), value_set=real_days)
        return t.filter(m)

    return out.map_batches(keep_real, batch_format="pyarrow")


SQL_WAU_ROLLING = """
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events
),
days AS (SELECT DISTINCT day FROM d)
SELECT g.day, count(DISTINCT d.user_id) AS wau
FROM days g JOIN d ON d.day BETWEEN g.day - 6 AND g.day
GROUP BY g.day
"""


def q_rolling_median_value(sf_dir: str):
    """Trailing 7-row median of event value per user (robust rolling
    statistic — spike-immune counterpart of rolling_avg_order)."""
    from ..stages.winfunc import rolling_median

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    return rolling_median(ds, by="user_id", order_col="ts",
                          value_col="value", id_col="event_id", window=7)


SQL_ROLLING_MEDIAN_VALUE = """
SELECT event_id, user_id,
       median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS rmed
FROM events
"""


def q_interval_islands(sf_dir: str):
    """Gaps-and-islands over per-supplier shipping windows
    [shipday, shipday + 2·linenumber]: overlapping-or-touching windows
    merge; islands and total covered days per supplier."""
    from ..stages.seq import interval_islands

    ds = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_linenumber", "l_shipdate"])

    def mk(batch: pa.Table) -> pa.Table:
        day = pc.divide(
            pc.cast(pc.cast(batch.column("l_shipdate"), pa.timestamp("us")),
                    pa.int64()),
            86400000000,
        )
        end = pc.add(day, pc.multiply(
            pc.cast(batch.column("l_linenumber"), pa.int64()), 2))
        return pa.table({
            "supp": batch.column("l_suppkey"),
            "s": day,
            "e": end,
        })

    iv = ds.map_batches(mk, batch_format="pyarrow", zero_copy_batch=True)
    return interval_islands(iv, by="supp", start_col="s", end_col="e")


SQL_INTERVAL_ISLANDS = """
WITH iv AS (
  SELECT l_suppkey AS supp,
         CAST(epoch_us(l_shipdate) // 86400000000 AS BIGINT) AS s,
         CAST(epoch_us(l_shipdate) // 86400000000 AS BIGINT)
           + 2 * l_linenumber AS e
  FROM lineitem
), m AS (
  SELECT supp, s, e,
         max(e) OVER (PARTITION BY supp ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS pmax
  FROM iv
), f AS (
  SELECT supp, s, e,
         CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS isl_start
  FROM m
), g AS (
  SELECT supp, s, e,
         sum(isl_start) OVER (PARTITION BY supp ORDER BY s, e) AS isl
  FROM f
), isl AS (
  SELECT supp, isl, min(s) AS istart, max(e) AS iend
  FROM g GROUP BY supp, isl
)
SELECT supp, count(*) AS n_islands,
       CAST(sum(iend - istart) AS BIGINT) AS covered
FROM isl GROUP BY supp
"""


def q_weighted_median_price(sf_dir: str):
    """Quantity-weighted lower median of extended price per return
    flag (order statistics with per-row multiplicity; integer-exact
    cutover)."""
    from ..stages.robust import weighted_median

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_extendedprice", "l_quantity"])
    return weighted_median(ds, by="l_returnflag", col="l_extendedprice",
                           weight_col="l_quantity")


SQL_WEIGHTED_MEDIAN_PRICE = """
WITH agg AS (
  SELECT l_returnflag, l_extendedprice AS v,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2
), c AS (
  SELECT l_returnflag, v,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY v) AS cw,
         sum(w) OVER (PARTITION BY l_returnflag) AS tw
  FROM agg
)
SELECT l_returnflag, min(v) AS wmedian
FROM c WHERE 2 * cw >= tw GROUP BY l_returnflag
"""


def q_winsorize_brand(sf_dir: str):
    """Per-brand winsorization of retail price at [p05, p95]
    (quantile_cont bounds broadcast; rows never shuffled)."""
    from ..stages.robust import winsorize

    ds = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_retailprice"])
    return winsorize(ds, by="p_brand", col="p_retailprice",
                     id_col="p_partkey", p_lo=0.05, p_hi=0.95)


SQL_WINSORIZE_BRAND = """
WITH b AS (
  SELECT p_brand, round(quantile_cont(p_retailprice, 0.05), 6) AS lo,
         round(quantile_cont(p_retailprice, 0.95), 6) AS hi
  FROM part GROUP BY p_brand
)
SELECT p_partkey, p.p_brand,
       CASE WHEN p_retailprice < lo THEN lo
            WHEN p_retailprice > hi THEN hi
            ELSE p_retailprice END AS clipped
FROM part p JOIN b ON p.p_brand = b.p_brand
"""


def q_feature_hash_lang(sf_dir: str):
    """Hashing-trick token features per language: md5(token) % 16
    bucket counts (unbounded-vocab encoder, md5 contract)."""
    from ..stages.text import feature_hash

    ds = _read(sf_dir, "documents", ["lang", "text"])
    return feature_hash(ds, "text", by="lang", n_buckets=16)


SQL_FEATURE_HASH_LANG = """
WITH toks AS (
  SELECT lang,
         unnest(string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+')) AS tok
  FROM documents WHERE trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) <> ''
)
SELECT lang,
       CAST(CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 16
            AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM toks WHERE trim(tok) <> ''
GROUP BY lang, bucket
"""


def q_impute_discount(sf_dir: str):
    """Deterministic-mask null imputation: rows whose md5 key falls
    below 10% are 'missing' and repaired with the per-returnflag median
    of the surviving rows."""
    from ..stages.mlprep import impute_group_median

    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_returnflag", "l_discount"])
    return impute_group_median(
        ds, id_cols=["l_orderkey", "l_linenumber"], by="l_returnflag",
        col="l_discount", miss_rate=0.1)


SQL_IMPUTE_DISCOUNT = """
WITH m AS (
  SELECT l_orderkey, l_linenumber, l_returnflag, l_discount,
         CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '-' ||
                                  CAST(l_linenumber AS VARCHAR)), 1, 8))
              AS BIGINT) < 0.1 * 4294967296 AS miss
  FROM lineitem
), med AS (
  SELECT l_returnflag, round(quantile_cont(l_discount, 0.5), 6) AS med
  FROM m WHERE NOT miss GROUP BY l_returnflag
)
SELECT m.l_orderkey, m.l_linenumber,
       CASE WHEN m.miss THEN med.med ELSE m.l_discount END AS imputed
FROM m JOIN med ON m.l_returnflag = med.l_returnflag
"""


def q_snm_partnames(sf_dir: str):
    """Sorted-neighborhood linkage over part names: window-5 neighbor
    pairs in (3-char-block, sorted-key) order scored with DuckDB-exact
    Jaro-Winkler."""
    from ..stages.dedup import sorted_neighborhood_pairs

    ds = _read(sf_dir, "part", ["p_partkey", "p_name"])
    return sorted_neighborhood_pairs(
        ds, "p_name", "p_partkey", block_chars=3, window=5,
        prefix=32, threshold=0.88)


SQL_SNM_PARTNAMES = """
WITH k AS (
  SELECT p_partkey AS id, substr(lower(p_name), 1, 32) AS key,
         substr(lower(p_name), 1, 3) AS blk
  FROM part
), r AS (
  SELECT id, key, blk,
         row_number() OVER (PARTITION BY blk ORDER BY key, id) AS rn
  FROM k
)
SELECT least(a.id, b.id) AS a_id, greatest(a.id, b.id) AS b_id,
       jaro_winkler_similarity(a.key, b.key) AS jw
FROM r a JOIN r b ON a.blk = b.blk AND b.rn BETWEEN a.rn + 1 AND a.rn + 5
WHERE jaro_winkler_similarity(a.key, b.key) >= 0.88
"""


def q_wasserstein_price(sf_dir: str):
    """Earth-mover drift of extended price, returnflag 'A' vs rest:
    per-bin CDFs over a fixed 20-bin grid (integer cumsums, one IEEE
    division per bin on both engines)."""
    from ..stages.drift import wasserstein

    ds = _read(sf_dir, "lineitem", ["l_extendedprice", "l_returnflag"])
    return wasserstein(ds, "l_extendedprice", split_col="l_returnflag",
                       ref_value="A", lo=900.0, hi=105000.0, bins=20)


SQL_WASSERSTEIN_PRICE = """
WITH b AS (
  SELECT CAST(least(greatest(floor((l_extendedprice - 900.0) / 5205.0),
                             0), 19) AS BIGINT) AS bin,
         CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS is_ref
  FROM lineitem
), c AS (
  SELECT bin, CAST(sum(is_ref) AS BIGINT) AS nref,
         CAST(sum(1 - is_ref) AS BIGINT) AS ncmp
  FROM b GROUP BY bin
), grid AS (
  SELECT unnest(generate_series(0, 19)) AS bin
), f AS (
  SELECT grid.bin, coalesce(c.nref, 0) AS nref, coalesce(c.ncmp, 0) AS ncmp
  FROM grid LEFT JOIN c ON grid.bin = c.bin
), cdf AS (
  SELECT bin,
         CAST(sum(nref) OVER (ORDER BY bin) AS DOUBLE)
           / greatest(sum(nref) OVER (), 1) AS cdf_ref,
         CAST(sum(ncmp) OVER (ORDER BY bin) AS DOUBLE)
           / greatest(sum(ncmp) OVER (), 1) AS cdf_cmp
  FROM f
)
SELECT bin, cdf_ref, cdf_cmp, abs(cdf_ref - cdf_cmp) AS dcdf FROM cdf
"""


def q_mi_flag_status(sf_dir: str):
    """Mutual information between returnflag and linestatus: per-cell
    p_xy and contribution (integer-count divisions, one ln per cell)."""
    from ..stages.drift import mutual_information

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
    return mutual_information(ds, "l_returnflag", "l_linestatus")


SQL_MI_FLAG_STATUS = """
WITH c AS (
  SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1, 2
), t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c),
mx AS (SELECT l_returnflag, CAST(sum(n) AS BIGINT) AS nx FROM c GROUP BY 1),
my AS (SELECT l_linestatus, CAST(sum(n) AS BIGINT) AS ny FROM c GROUP BY 1)
SELECT c.l_returnflag, c.l_linestatus,
       CAST(c.n AS DOUBLE) / tot AS pxy,
       round((CAST(c.n AS DOUBLE) / tot) *
             ln((CAST(c.n AS DOUBLE) / tot) /
                ((CAST(nx AS DOUBLE) / tot) *
                 (CAST(ny AS DOUBLE) / tot))), 6) AS mi
FROM c CROSS JOIN t
JOIN mx ON c.l_returnflag = mx.l_returnflag
JOIN my ON c.l_linestatus = my.l_linestatus
"""


def q_pareto_parts(sf_dir: str):
    """2-D Pareto frontier of parts: cheapest price vs largest size,
    local-skyline combiner then one exact pass over survivors."""
    from ..stages.relational import pareto_front

    ds = _read(sf_dir, "part", ["p_partkey", "p_retailprice", "p_size"])
    return pareto_front(ds, min_col="p_retailprice", max_col="p_size",
                        id_col="p_partkey")


SQL_PARETO_PARTS = """
SELECT p_partkey, p_retailprice, p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
"""


def q_er_part_clusters(sf_dir: str):
    """Composed entity-resolution audit: SNM candidate pairs at
    JW >= 0.94 → connected components → cluster-size histogram."""
    from ..stages.graph import er_cluster_sizes

    ds = _read(sf_dir, "part", ["p_partkey", "p_name"])
    return _materialize(
        er_cluster_sizes(ds, "p_name", "p_partkey", block_chars=3,
                         window=5, threshold=0.94),
        empty_schema=pa.schema([("size", pa.int64()),
                                ("n_clusters", pa.int64())]))


SQL_ER_PART_CLUSTERS = """
WITH RECURSIVE k AS (
  SELECT p_partkey AS id, substr(lower(p_name), 1, 32) AS key,
         substr(lower(p_name), 1, 3) AS blk
  FROM part
), rr AS (
  SELECT id, key, blk,
         row_number() OVER (PARTITION BY blk ORDER BY key, id) AS rn
  FROM k
), p AS (
  SELECT least(a.id, b.id) AS a, greatest(a.id, b.id) AS b
  FROM rr a JOIN rr b ON a.blk = b.blk AND b.rn BETWEEN a.rn + 1 AND a.rn + 5
  WHERE jaro_winkler_similarity(a.key, b.key) >= 0.94
), edges AS (SELECT a AS u, b AS v FROM p UNION SELECT b, a FROM p),
nodes AS (SELECT DISTINCT u AS node FROM edges),
reach(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.v AS node, r2.lbl FROM reach r2 JOIN edges e ON e.u = r2.node
),
comp AS (SELECT node, min(lbl) AS cid FROM reach GROUP BY node),
sz AS (SELECT cid, CAST(count(*) AS BIGINT) AS size FROM comp GROUP BY cid)
SELECT size, CAST(count(*) AS BIGINT) AS n_clusters FROM sz GROUP BY size
"""


def q_image_dup_clusters(sf_dir: str):
    """Image near-dup cluster audit over the deterministic seeded
    image+caption fixture (FIXTURES.md F1; the sf dirname sets the row
    count): phash LSH pairs → connected components → cluster-size
    histogram.  rows-only by design: phash banding is not
    SQL-expressible; brute-force Hamming parity is pinned in
    tests/test_imaging.py."""
    import os

    from ..sources.images import ImageFixtureSpec, generate_dataset
    from ..stages.imaging import image_dup_clusters

    import re

    base = os.path.basename(os.path.normpath(sf_dir))
    m = re.search(r"sf(\d+(?:\.\d+)?)", base)
    sf = float(m.group(1)) if m else 0.001
    spec = ImageFixtureSpec(n_rows=max(1000, int(1_000_000 * sf)),
                            seed=42, rows_per_part=2048)
    # source-level pruning: the audit touches only (image_id, phash),
    # so payload encode and caption synthesis never run
    images = generate_dataset(spec, columns={"image_id", "phash"})
    return _materialize(
        image_dup_clusters(images, threshold=4, mode="sampled"),
        empty_schema=pa.schema([("size", pa.int64()),
                                ("n_clusters", pa.int64())]))


def q_image_channel_profile(sf_dir: str):
    """Per-partition decoded-pixel profile over the seeded image
    fixture (actor-pool decode -> mean/std stats -> one row per
    partition).  rows-only by design: the pure-python codec is not
    SQL-expressible; per-image stat parity vs a brute-force numpy
    decode is pinned in tests/test_imaging.py."""
    import os
    import re

    from ..sources.images import ImageFixtureSpec, generate_dataset
    from ..stages.imaging import channel_profile

    base = os.path.basename(os.path.normpath(sf_dir))
    m = re.search(r"sf(\d+(?:\.\d+)?)", base)
    sf = float(m.group(1)) if m else 0.001
    # decode-heavy: cap the audited rows (profile quality needs
    # partitions, not the full corpus)
    spec = ImageFixtureSpec(n_rows=min(20_000, max(1000, int(1_000_000 * sf))),
                            seed=42, rows_per_part=2048)
    images = generate_dataset(
        spec, columns={"image_id", "bytes", "fmt", "partition_id"})
    return _materialize(channel_profile(images))


def q_tfidf_pairs(sf_dir: str):
    """TF-IDF cosine near-dup pairs over the top-64 df vocabulary:
    vectorize → exact block-pair grid join (no corpus broadcast)."""
    from ..stages.text import tfidf_cosine_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _materialize(
        tfidf_cosine_pairs(ds, "text", "doc_id", vocab_k=64,
                           threshold=0.9),
        empty_schema=pa.schema([("a", pa.int64()), ("b", pa.int64()),
                                ("sim", pa.float64())]))


SQL_TFIDF_PAIRS = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+')) AS tok
  FROM documents WHERE trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) <> ''
), tf AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
  FROM toks WHERE trim(tok) <> '' GROUP BY 1, 2
), dfreq AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok
), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
vocab AS (
  SELECT tok, df FROM dfreq ORDER BY df DESC, tok ASC LIMIT 64
), w AS (
  SELECT tf.doc_id, tf.tok, tf.tf * ln(CAST(n AS DOUBLE) / df) AS w
  FROM tf JOIN vocab USING (tok) CROSS JOIN nn
), nrm AS (
  SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id
), dots AS (
  SELECT a.doc_id AS a, b.doc_id AS b, sum(a.w * b.w) AS dot
  FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT dots.a, dots.b, round(dot / (na.nrm * nb.nrm), 6) AS sim
FROM dots
JOIN nrm na ON dots.a = na.doc_id
JOIN nrm nb ON dots.b = nb.doc_id
WHERE dot / (na.nrm * nb.nrm) >= 0.9
"""


def q_overlap_pairs(sf_dir: str):
    """Containment near-dup: shingle overlap coefficient
    |A∩B| / min(|A|,|B|) >= 0.9 — the excerpt/quote detector (a short
    doc fully contained in a long one scores ~1.0 here, near-zero on
    Jaccard)."""
    from ..stages.dedup import jaccard_pairs_exact

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _materialize(
        jaccard_pairs_exact(ds, "text", "doc_id", n=3, threshold=0.9,
                            shuffle_partitions=8, metric="overlap"),
        empty_schema=pa.schema([("a", pa.int64()), ("b", pa.int64()),
                                ("j", pa.float64())]))


SQL_OVERLAP_PAIRS = """
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+') AS ts
  FROM documents WHERE trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) <> ''
), sh AS (
  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(ts)-2),
           i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s
  FROM tok WHERE len(ts) >= 3
)
SELECT a.doc_id AS a, b.doc_id AS b,
       len(list_intersect(a.s, b.s))::DOUBLE / least(len(a.s), len(b.s)) AS j
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.s, b.s))::DOUBLE / least(len(a.s), len(b.s)) >= 0.9
"""


def q_pagerank_custsupp(sf_dir: str):
    """Distributed PageRank (3 rounds, d=0.85) over the symmetrized
    customer–supplier bipartite graph from orders⋈lineitem — the
    iterative-JOIN pattern (rank state stays a Dataset; one hash join
    + one groupby per round).  Node ids namespaced even=cust·2,
    odd=supp·2+1; every node's rank is emitted (no top-k tie risk)."""
    from ..stages.graph import pagerank
    from ..stages.relational import lookup_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
    j = lookup_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                    right_cols=["o_custkey"], how="inner")

    def pair_partial(t: pa.Table) -> pa.Table:
        # per-batch distinct + coarse PAIR-hash bucket: the global
        # distinct is one groupby over ≤256 buckets with a vectorized
        # np.unique kernel — never one tiny group per (cust, supp) pair
        c = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        s = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        u = np.unique(c * (1 << 32) + s)
        coarse = ((u.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                  % np.uint64(256)).astype(np.int64)
        return pa.table({"p": pa.array(u), "coarse": pa.array(coarse)})

    def symmetrize_bucket(t: pa.Table) -> pa.Table:
        u = np.unique(t.column("p").to_numpy(zero_copy_only=False))
        c = (u >> 32).astype(np.int64)
        s = (u & 0xFFFFFFFF).astype(np.int64)
        src = np.concatenate([c * 2, s * 2 + 1])
        dst = np.concatenate([s * 2 + 1, c * 2])
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    edges = j.map_batches(
        pair_partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("coarse").map_groups(symmetrize_bucket,
                                   batch_format="pyarrow")
    return _materialize(
        pagerank(edges, iters=3, num_partitions=4),
        empty_schema=pa.schema([("node", pa.int64()),
                                ("pr", pa.float64())]))


def _sql_pagerank() -> str:
    step = """
r{K} AS (
  SELECT e.dst AS node,
         (1.0 - 0.85) / (SELECT n FROM nn) +
         0.85 * sum(r{P}.r / deg.deg) AS r
  FROM edges e
  JOIN r{P} ON e.src = r{P}.node
  JOIN deg ON e.src = deg.src
  GROUP BY e.dst
)"""
    iters = "".join(
        "," + step.format(K=k, P=k - 1) for k in range(1, 4))
    return f"""
WITH e0 AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), edges AS (
  SELECT c * 2 AS src, s * 2 + 1 AS dst FROM e0
  UNION ALL
  SELECT s * 2 + 1, c * 2 FROM e0
), deg AS (
  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src
), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
r0 AS (
  SELECT src AS node, 1.0 / (SELECT n FROM nn) AS r FROM deg
){iters}
SELECT node, r AS pr FROM r3
"""


SQL_PAGERANK_CUSTSUPP = _sql_pagerank()


def q_qnorm_brand_price(sf_dir: str):
    """Quantile normalization of retail price across brand 'batches':
    per-brand percent-rank mapped through a 101-point global
    quantile_cont grid (batch-effect correction)."""
    from ..stages.mlprep import quantile_normalize

    ds = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_retailprice"])
    return quantile_normalize(ds, by="p_brand", col="p_retailprice",
                              id_col="p_partkey", grid_k=101)


_QGRID = ", ".join(f"{i}/100.0" for i in range(101))

SQL_QNORM_BRAND_PRICE = f"""
WITH g AS (
  SELECT quantile_cont(p_retailprice, [{_QGRID}]) AS gl FROM part
), r AS (
  SELECT p_partkey, p_brand,
         percent_rank() OVER (PARTITION BY p_brand
                              ORDER BY p_retailprice, p_partkey) AS pr
  FROM part
), xx AS (
  SELECT p_partkey, p_brand, pr * 100.0 AS x FROM r
)
SELECT p_partkey, p_brand,
       gl[CAST(least(floor(x), 99) AS INT) + 1]
         * (1.0 - (x - least(floor(x), 99)))
     + gl[CAST(least(floor(x), 99) AS INT) + 2]
         * (x - least(floor(x), 99)) AS qn
FROM xx CROSS JOIN g
"""


def q_cusum_events(sf_dir: str):
    """CUSUM change-point alarm over daily event counts (sustained
    mean-shift detector; clamped recursion replayed by the oracle's
    recursive CTE)."""
    from ..stages.drift import cusum_daily

    ds = _read(sf_dir, "events", ["ts"])
    return cusum_daily(ds, "ts", k=0.5, h=4.0)


SQL_CUSUM_EVENTS = """
WITH RECURSIVE daily AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
), st AS (
  SELECT avg(n) AS mu, stddev_samp(n) AS sd FROM daily
), o AS (
  SELECT day, n, row_number() OVER (ORDER BY day) AS rn FROM daily
), z AS (
  SELECT rn, day,
         CASE WHEN st.sd IS NULL OR st.sd = 0 THEN 0.0
              ELSE (n - st.mu) / st.sd END AS z
  FROM o CROSS JOIN st
), c(rn, day, cp, cn) AS (
  SELECT rn, day, greatest(0.0, z - 0.5), least(0.0, z + 0.5)
  FROM z WHERE rn = 1
  UNION ALL
  SELECT nz.rn, nz.day,
         greatest(0.0, c.cp + nz.z - 0.5),
         least(0.0, c.cn + nz.z + 0.5)
  FROM c JOIN z nz ON nz.rn = c.rn + 1
)
SELECT day, round(cp, 6) AS cp, round(cn, 6) AS cn,
       (cp > 4.0 OR cn < -4.0) AS alarm
FROM c
"""


def q_cap_per_source(sf_dir: str):
    """Domain capping: at most 20 docs per source, picked by
    deterministic md5 rank (C4-style per-host balancing; reruns keep
    the identical subset)."""
    from ..stages.sampling import cap_per_group

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    return cap_per_group(ds, by="source", id_col="doc_id", cap=20)


SQL_CAP_PER_SOURCE = """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                         1, 8)) AS BIGINT),
                    doc_id) AS rn
  FROM documents) t
WHERE rn <= 20
"""


def q_late_events(sf_dir: str):
    """Watermark audit: events arriving >60s behind the running max
    timestamp of earlier arrivals (ingest order = event_id)."""
    from ..stages.seq import late_events

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts"])
    return late_events(ds, by="user_id", ts="ts", seq_col="event_id",
                       lateness_us=60_000_000)


SQL_LATE_EVENTS = """
WITH o AS (
  SELECT user_id, epoch_us(ts) AS t,
         max(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM events
), l AS (
  SELECT user_id, coalesce(wm - t, 0) AS lateness FROM o
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN lateness > 60000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_late,
       CAST(greatest(max(lateness), 0) AS BIGINT) AS max_lateness_us
FROM l GROUP BY user_id
"""


def q_decontaminate(sf_dir: str):
    """Train/eval decontamination: training docs sharing >=2 distinct
    3-token shingles with the deterministic 5% held-out set (md5
    contract; neither side is broadcast — both stream through one
    shingle-bucket shuffle)."""
    from ..stages.dedup import decontaminate

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _materialize(
        decontaminate(ds, "text", "doc_id", eval_rate=0.05, n=3,
                      min_shared=2),
        empty_schema=pa.schema([("doc_id", pa.int64()),
                                ("n_shared", pa.int64())]))


SQL_DECONTAMINATE = """
WITH t AS (
  SELECT doc_id, text,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) < 0.05 * 4294967296 AS is_eval
  FROM documents
), tok AS (
  SELECT doc_id, is_eval,
         string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+') AS ts
  FROM t WHERE trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) <> ''
), sh AS (
  SELECT doc_id, is_eval,
         unnest(list_distinct(list_transform(
           generate_series(1, len(ts) - 2),
           i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS s
  FROM tok WHERE len(ts) >= 3
), dirty AS (SELECT DISTINCT s FROM sh WHERE is_eval)
SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shared
FROM sh JOIN dirty USING (s)
WHERE NOT sh.is_eval
GROUP BY sh.doc_id
HAVING count(*) >= 2
"""


def q_lm_score(sf_dir: str):
    """CCNet-style statistical quality score: per-doc mean add-one
    bigram log-likelihood under the corpus's own bigram model."""
    from ..stages.text import lm_bigram_score

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _materialize(
        lm_bigram_score(ds, "text", "doc_id"),
        empty_schema=pa.schema([("doc_id", pa.int64()),
                                ("lm", pa.float64())]))


SQL_LM_SCORE = """
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+') AS l
  FROM documents WHERE trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) <> ''
), uni AS (SELECT unnest(l) AS w FROM tok),
uc AS (SELECT w, CAST(count(*) AS BIGINT) AS c1 FROM uni GROUP BY w),
vv AS (SELECT CAST(count(*) AS BIGINT) AS V FROM uc),
bg AS (
  SELECT doc_id, unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p
  FROM tok WHERE len(l) >= 2
), bc AS (
  SELECT p[1] AS w1, p[2] AS w2, CAST(count(*) AS BIGINT) AS c12
  FROM bg GROUP BY 1, 2
), sc AS (
  SELECT bg.doc_id, ln((bc.c12 + 1.0) / (uc.c1 + vv.V)) AS lp
  FROM bg
  JOIN bc ON bg.p[1] = bc.w1 AND bg.p[2] = bc.w2
  JOIN uc ON bg.p[1] = uc.w
  CROSS JOIN vv
)
SELECT doc_id, avg(lp) AS lm FROM sc GROUP BY doc_id
"""


def q_hard_negatives(sf_dir: str):
    """Hard-negative mining: each query's top-5 nearest neighbors
    restricted to OTHER labels (contrastive-training pair source)."""
    from ..stages.similarity import hard_negatives

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    queries_ds = emb.filter(expr="vec_id < 8")
    return _materialize(
        hard_negatives(emb, queries_ds, id_col="vec_id",
                       vec_col="embedding", label_col="label", k=5),
        empty_schema=pa.schema([("query_id", pa.int64()),
                                ("neighbor_id", pa.int64()),
                                ("sim", pa.float64())]))


SQL_HARD_NEGATIVES = """
WITH q AS (SELECT vec_id, embedding, label FROM embeddings
           WHERE vec_id < 8)
SELECT query_id, neighbor_id, sim FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
    ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                 CAST(e.embedding AS DOUBLE[])), 6) AS sim,
    row_number() OVER (PARTITION BY q.vec_id
      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])) DESC,
               e.vec_id) AS rk
  FROM q CROSS JOIN embeddings e
  WHERE e.label <> q.label) t
WHERE rk <= 5
"""


def queries() -> Dict[str, Callable]:
    from .oracle2 import QUERIES2
    from .oracle3 import QUERIES3
    from .oracle4 import QUERIES4
    from .oracle5 import QUERIES5
    from .oracle6 import QUERIES6
    from .oracle7 import QUERIES7
    from .oracle8 import QUERIES8
    from .oracle9 import QUERIES9
    from .oracle10 import QUERIES10
    from .oracle11 import QUERIES11
    from .oracle12 import QUERIES12
    from .oracle13 import QUERIES13
    from .oracle14 import QUERIES14
    from .oracle15 import QUERIES15
    from .oracle16 import QUERIES16
    from .oracle17 import QUERIES17
    from .oracle18 import QUERIES18
    from .oracle19 import QUERIES19
    from .oracle20 import QUERIES20
    from .oracle21 import QUERIES21
    from .oracle22 import QUERIES22
    from .oracle23 import QUERIES23
    from .oracle24 import QUERIES24
    from .oracle25 import QUERIES25
    from .oracle26 import QUERIES26
    from .oracle27 import QUERIES27
    from .oracle28 import QUERIES28
    from .oracle29 import QUERIES29
    from .oracle30 import QUERIES30
    from .oracle31 import QUERIES31
    from .oracle32 import QUERIES32
    from .oracle33 import QUERIES33
    from .oracle34 import QUERIES34
    from .oracle35 import QUERIES35
    from .oracle36 import QUERIES36
    from .oracle37 import QUERIES37
    from .oracle38 import QUERIES38
    from .oracle39 import QUERIES39
    from .oracle40 import QUERIES40
    from .oracle41 import QUERIES41
    from .oracle42 import QUERIES42
    from .oracle43 import QUERIES43
    from .oracle44 import QUERIES44
    from .oracle45 import QUERIES45
    from .oracle46 import QUERIES46
    from .oracle47 import QUERIES47
    from .oracle48 import QUERIES48
    from .oracle49 import QUERIES49
    from .oracle50 import QUERIES50
    from .oracle51 import QUERIES51
    from .oracle52 import QUERIES52
    from .oracle53 import QUERIES53
    from .oracle54 import QUERIES54
    from .oracle55 import QUERIES55
    from .oracle56 import QUERIES56
    from .oracle57 import QUERIES57
    from .oracle58 import QUERIES58
    from .oracle59 import QUERIES59
    from .oracle60 import QUERIES60
    from .oracle61 import QUERIES61
    from .oracle62 import QUERIES62
    from .oracle63 import QUERIES63
    from .oracle64 import QUERIES64
    from .oracle65 import QUERIES65
    from .oracle66 import QUERIES66
    from .oracle67 import QUERIES67
    from .oracle68 import QUERIES68
    from .oracle69 import QUERIES69
    from .oracle70 import QUERIES70
    from .oracle71 import QUERIES71
    from .oracle72 import QUERIES72
    from .oracle73 import QUERIES73
    from .oracle74 import QUERIES74
    from .oracle75 import QUERIES75
    from .oracle76 import QUERIES76
    from .oracle77 import QUERIES77
    from .oracle78 import QUERIES78
    from .oracle79 import QUERIES79
    from .oracle80 import QUERIES80
    from .oracle81 import QUERIES81
    from .oracle82 import QUERIES82
    from .oracle83 import QUERIES83
    from .oracle84 import QUERIES84
    from .oracle85 import QUERIES85
    from .oracle86 import QUERIES86
    from .oracle87 import QUERIES87
    from .oracle88 import QUERIES88
    from .oracle89 import QUERIES89
    from .oracle90 import QUERIES90
    from .oracle91 import QUERIES91
    from .oracle92 import QUERIES92
    from .oracle93 import QUERIES93

    return (QUERIES93 | QUERIES92 | QUERIES91 | QUERIES90 | QUERIES89 | QUERIES88 | QUERIES87 | QUERIES86 | QUERIES85 | QUERIES84 | QUERIES83 | QUERIES82 | QUERIES81 | QUERIES80 | QUERIES79 | QUERIES78 | QUERIES77 | QUERIES76 | QUERIES75 | QUERIES74 | QUERIES73 | QUERIES72 | QUERIES71 | QUERIES70 | QUERIES69 | QUERIES68 | QUERIES67 | QUERIES66 | QUERIES65 | QUERIES64 | QUERIES63 | QUERIES62 | QUERIES61 | QUERIES60 | QUERIES59 | QUERIES58 | QUERIES57 | QUERIES56 | QUERIES55 | QUERIES54 | QUERIES53 | QUERIES52 | QUERIES51 | QUERIES50 | QUERIES49 | QUERIES48 | QUERIES47 | QUERIES46 | QUERIES45 | QUERIES44 | QUERIES43 | QUERIES42 | QUERIES41 | QUERIES40 | QUERIES39 | QUERIES38 | QUERIES37 | QUERIES36 | QUERIES35 | QUERIES34 | QUERIES33 | QUERIES32 | QUERIES31 | QUERIES30 | QUERIES29 | QUERIES28 | QUERIES27 | QUERIES26 | QUERIES25 | QUERIES24 | QUERIES23 | QUERIES22 | QUERIES21 | QUERIES20 | QUERIES19 | QUERIES18 | QUERIES17 | QUERIES16 | QUERIES15 | QUERIES14 | QUERIES13 | QUERIES12 | QUERIES11 | QUERIES10 | QUERIES9 | QUERIES8 | QUERIES7 | QUERIES6 | QUERIES5 | QUERIES4 | QUERIES3
            | QUERIES2 | {
        "interval_quantity": q_interval_quantity,
        "interval_discount": q_interval_discount,
        "regex_lang": q_regex_lang,
        "set_region": q_set_region,
        "unique_orderkey": q_unique_orderkey,
        "validation_report": q_validation_report,
        "rare_categories": q_rare_categories,
        "pack_contexts": q_pack_contexts,
        "mix_weights": q_mix_weights,
        "quality_funnel": q_quality_funnel,
        "completeness_events": q_completeness_events,
        "zipf_lang": q_zipf_slope,
        "pack_greedy": q_pack_greedy,
        "boilerplate_ngrams": q_boilerplate_ngrams,
        "image_channel_profile": q_image_channel_profile,
        "subset_nationkey_region": q_subset_nationkey_region,
        "subset_fk_customer_nation": q_subset_fk_customer_nation,
        "superset_lang": q_superset_lang,
        "agg_returnflag": q_agg_returnflag,
        "hist_price": q_hist_price,
        "approx_tax": q_approx_tax,
        "tuple_orders": q_tuple_orders,
        "predicate_custkey": q_predicate_custkey,
        "group_mean_qty": q_group_mean_qty,
        "topk_price": q_topk_price,
        "text_tokens": q_text_tokens,
        "text_quality": q_text_quality,
        "text_lang_id": q_text_lang_id,
        "text_fingerprint": q_text_fingerprint,
        "dedup_exact": q_dedup_exact,
        "dedup_keep_first": q_dedup_keep_first,
        "dedup_jaccard_ngram": q_dedup_jaccard_ngram,
        "dedup_jaccard_prefix": q_dedup_jaccard_prefix,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_minhash_join": q_dedup_minhash_join,
        "dedup_clusters": q_dedup_clusters,
        "dedup_simhash": q_dedup_simhash,
        "sim_neardup_cosine": q_sim_neardup_cosine,
        "sim_topk_cosine": q_sim_topk_cosine,
        "sim_ann_lsh": q_sim_ann_lsh,
        "sim_ivf_topk": q_sim_ivf_topk,
        "fuzzy_event_type": q_fuzzy_event_type,
        "window_hourly": q_window_hourly,
        "salted_distinct_supp": q_salted_distinct_supp,
        "cms_event_counts": q_cms_event_counts,
        "asof_click_purchase": q_asof_click_purchase,
        "asof_next_purchase": q_asof_next_purchase,
        "sessionize_users": q_sessionize_users,
        "accepted_tolerance_quantity": q_accepted_tolerance_quantity,
        "order_region": q_order_region,
        "grouped_topk_orders": q_grouped_topk_orders,
        "hll_distinct_parts": q_hll_distinct_parts,
        "tdigest_price_quantiles": q_tdigest_price_quantiles,
        "method_interval_extprice": q_method_interval_extprice,
        "window_hopping": q_window_hopping,
        "join_orders_customer": q_join_orders_customer,
        "text_vocab": q_text_vocab,
        "grouped_median_price": q_grouped_median_price,
        "emb_label_centroids": q_emb_label_centroids,
        "lag_user_gap": q_lag_user_gap,
        "rolling_avg_order": q_rolling_avg_order,
        "semi_join_big_orders": q_semi_join_big_orders,
        "anti_join_big_orders": q_anti_join_big_orders,
        "setop_except_status": q_setop_except_status,
        "setop_intersect_status": q_setop_intersect_status,
        "pivot_user_events": q_pivot_user_events,
        "left_join_orders_poorcust": q_left_join_orders_poorcust,
        "text_repetition": q_text_repetition,
        "text_normalized_fp": q_text_normalized_fp,
        "json_props_k": q_json_props_k,
        "corpus_prep": q_corpus_prep,
        "unnest_tokens": q_unnest_tokens,
        "cume_dist_price": q_cume_dist_price,
        "rank_orders": q_rank_orders,
        "moments_quantity": q_moments_quantity,
        "entropy_status": q_entropy_status,
        "mode_event": q_mode_event,
        "lev_neardup": q_lev_neardup,
        "jw_neardup": q_jw_neardup,
        "tfidf_lang": q_tfidf_lang,
        "regr_price_qty": q_regr_discount,
        "benford_price": q_benford_price,
        "funnel_click_purchase": q_funnel_click_purchase,
        "cube_orders": q_cube_orders,
        "rollup_orders": q_rollup_orders,
        "sample_docs": q_sample_docs,
        "sample_stratified": q_sample_stratified,
        "corr_qty_price": q_corr_qty_price,
        "concat_nations": q_concat_nations,
        "profile_lineitem": q_profile_lineitem,
        "broadcast_join_orders": q_broadcast_join_orders,
        "range_join_priceband": q_range_join_priceband,
        "text_redact": q_text_redact,
        "zscore_order_price": q_zscore_order_price,
        "emb_hygiene": q_emb_hygiene,
        "psi_price_drift": q_psi_price_drift,
        "first_last_event": q_first_last_event,
        "event_transitions": q_event_transitions,
        "ewma_user_value": q_ewma_user_value,
        "inversions_events": q_inversions_events,
        "streak_days_user": q_streak_days_user,
        "cooccur_parts": q_cooccur_parts,
        "iqr_outliers_price": q_iqr_outliers_price,
        "mad_price_brand": q_mad_price_brand,
        "chi2_flag_status": q_chi2_flag_status,
        "jsd_price_drift": q_jsd_price_drift,
        "dow_orders": q_dow_orders,
        "wavg_discount": q_wavg_discount,
        "geomean_price_brand": q_geomean_price_brand,
        "corr_matrix_lineitem": q_corr_matrix_lineitem,
        "qhist_price": q_qhist_price,
        "p90_disc_price": q_p90_disc_price,
        "brand_id_extract": q_brand_id_extract,
        "lexical_lang": q_lexical_lang,
        "ship_consistency": q_ship_consistency,
        "revenue_share": q_revenue_share,
        "monthly_cumulative": q_monthly_cumulative,
        "fanout_stats": q_fanout_stats,
        "daily_anomaly": q_daily_anomaly,
        "median_gap_user": q_median_gap_user,
        "transition_probs": q_transition_probs,
        "activity_matrix": q_activity_matrix,
        "retention_daily": q_retention_daily,
        "session_durations_users": q_session_durations_users,
        "skew_suppkey": q_skew_suppkey,
        "sample_weighted": q_sample_weighted,
        "kmeans_embeddings": q_kmeans_embeddings,
        "dup_degree_hist": q_dup_degree_hist,
        "hll_group_supp": q_hll_group_supp,
        "quantize_embeddings": q_quantize_embeddings,
        "fd_brand_type": q_fd_brand_type,
        "target_encode_segment": q_target_encode_segment,
        "split_balance_orders": q_split_balance_orders,
        "text_bigrams": q_text_bigrams,
        "emb_confusion": q_emb_confusion,
        "mom_change": q_mom_change,
        "wau_rolling": q_wau_rolling,
        "rolling_median_value": q_rolling_median_value,
        "interval_islands_supp": q_interval_islands,
        "weighted_median_price": q_weighted_median_price,
        "winsorize_brand": q_winsorize_brand,
        "feature_hash_lang": q_feature_hash_lang,
        "impute_discount": q_impute_discount,
        "snm_partnames": q_snm_partnames,
        "wasserstein_price": q_wasserstein_price,
        "mi_flag_status": q_mi_flag_status,
        "pareto_parts": q_pareto_parts,
        "er_part_clusters": q_er_part_clusters,
        "image_dup_clusters": q_image_dup_clusters,
        "tfidf_pairs": q_tfidf_pairs,
        "overlap_pairs": q_overlap_pairs,
        "pagerank_custsupp": q_pagerank_custsupp,
        "qnorm_brand_price": q_qnorm_brand_price,
        "cusum_events": q_cusum_events,
        "cap_per_source": q_cap_per_source,
        "late_events_users": q_late_events,
        "decontaminate_docs": q_decontaminate,
        "lm_score_docs": q_lm_score,
        "hard_negatives": q_hard_negatives,
    })


def oracle_sql() -> Dict[str, str]:
    from .oracle2 import SQL2
    from .oracle3 import SQL3
    from .oracle4 import SQL4
    from .oracle5 import SQL5
    from .oracle6 import SQL6
    from .oracle7 import SQL7
    from .oracle8 import SQL8
    from .oracle9 import SQL9
    from .oracle10 import SQL10
    from .oracle11 import SQL11
    from .oracle12 import SQL12
    from .oracle13 import SQL13
    from .oracle14 import SQL14
    from .oracle15 import SQL15
    from .oracle16 import SQL16
    from .oracle17 import SQL17
    from .oracle18 import SQL18
    from .oracle19 import SQL19
    from .oracle20 import SQL20
    from .oracle21 import SQL21
    from .oracle22 import SQL22
    from .oracle23 import SQL23
    from .oracle24 import SQL24
    from .oracle25 import SQL25
    from .oracle26 import SQL26
    from .oracle27 import SQL27
    from .oracle28 import SQL28
    from .oracle29 import SQL29
    from .oracle30 import SQL30
    from .oracle31 import SQL31
    from .oracle32 import SQL32
    from .oracle33 import SQL33
    from .oracle34 import SQL34
    from .oracle35 import SQL35
    from .oracle36 import SQL36
    from .oracle37 import SQL37
    from .oracle38 import SQL38
    from .oracle39 import SQL39
    from .oracle40 import SQL40
    from .oracle41 import SQL41
    from .oracle42 import SQL42
    from .oracle43 import SQL43
    from .oracle44 import SQL44
    from .oracle45 import SQL45
    from .oracle46 import SQL46
    from .oracle47 import SQL47
    from .oracle48 import SQL48
    from .oracle49 import SQL49
    from .oracle50 import _sql50
    from .oracle51 import SQL51
    from .oracle52 import SQL52
    from .oracle53 import SQL53
    from .oracle54 import _sql54
    from .oracle55 import SQL55
    from .oracle56 import SQL56
    from .oracle57 import _sql57
    from .oracle58 import SQL58
    from .oracle59 import _sql59
    from .oracle60 import SQL60
    from .oracle61 import _sql61
    from .oracle62 import _sql62
    from .oracle63 import SQL63
    from .oracle64 import SQL64
    from .oracle65 import _sql65
    from .oracle66 import SQL66
    from .oracle67 import _sql67
    from .oracle68 import SQL68
    from .oracle69 import SQL69
    from .oracle70 import _sql70
    from .oracle71 import SQL71
    from .oracle72 import SQL72
    from .oracle73 import SQL73
    from .oracle74 import SQL74
    from .oracle75 import _sql75
    from .oracle76 import SQL76
    from .oracle77 import _sql77
    from .oracle78 import SQL78
    from .oracle79 import SQL79
    from .oracle80 import _sql80
    from .oracle81 import SQL81
    from .oracle82 import SQL82
    from .oracle83 import SQL83
    from .oracle84 import SQL84
    from .oracle85 import SQL85
    from .oracle86 import SQL86
    from .oracle87 import SQL87
    from .oracle88 import SQL88
    from .oracle89 import SQL89
    from .oracle90 import SQL90
    from .oracle91 import _sql91
    from .oracle92 import SQL92
    from .oracle93 import _sql93

    return (_sql93() | SQL92 | _sql91() | SQL90 | SQL89 | SQL88 | SQL87 | SQL86 | SQL85 | SQL84 | SQL83 | SQL82 | SQL81 | _sql80() | SQL79 | SQL78 | _sql77() | SQL76 | _sql75() | SQL74 | SQL73 | SQL72 | SQL71 | _sql70() | SQL69 | SQL68 | _sql67() | SQL66 | _sql65() | SQL64 | SQL63 | _sql62() | _sql61() | SQL60 | _sql59() | SQL58 | _sql57() | SQL56 | SQL55 | _sql54() | SQL53 | SQL52 | SQL51 | _sql50() | SQL49 | SQL48 | SQL47 | SQL46 | SQL45 | SQL44 | SQL43 | SQL42 | SQL41 | SQL40 | SQL39 | SQL38 | SQL37 | SQL36 | SQL35 | SQL34 | SQL33 | SQL32 | SQL31 | SQL30 | SQL29 | SQL28 | SQL27 | SQL26 | SQL25 | SQL24 | SQL23 | SQL22 | SQL21 | SQL20 | SQL19 | SQL18 | SQL17 | SQL16 | SQL15 | SQL14 | SQL13 | SQL12 | SQL11 | SQL10 | SQL9 | SQL8 | SQL7 | SQL6 | SQL5 | SQL4 | SQL3 | SQL2 | {
        "order_region": SQL_ORDER_REGION,
        "interval_quantity": SQL_INTERVAL_QUANTITY,
        "interval_discount": SQL_INTERVAL_DISCOUNT,
        "regex_lang": SQL_REGEX_LANG,
        "set_region": SQL_SET_REGION,
        "unique_orderkey": SQL_UNIQUE_ORDERKEY,
        "validation_report": SQL_VALIDATION_REPORT,
        "rare_categories": SQL_RARE_CATEGORIES,
        "pack_contexts": SQL_PACK_CONTEXTS,
        "mix_weights": SQL_MIX_WEIGHTS,
        "quality_funnel": SQL_QUALITY_FUNNEL,
        "completeness_events": SQL_COMPLETENESS_EVENTS,
        "zipf_lang": SQL_ZIPF_SLOPE,
        "pack_greedy": SQL_PACK_GREEDY,
        "boilerplate_ngrams": SQL_BOILERPLATE_NGRAMS,
        "subset_nationkey_region": SQL_SUBSET_NATIONKEY_REGION,
        "subset_fk_customer_nation": SQL_SUBSET_FK_CUSTOMER_NATION,
        "superset_lang": SQL_SUPERSET_LANG,
        "agg_returnflag": SQL_AGG_RETURNFLAG,
        "hist_price": SQL_HIST_PRICE,
        "approx_tax": SQL_APPROX_TAX,
        "tuple_orders": SQL_TUPLE_ORDERS,
        "predicate_custkey": SQL_PREDICATE_CUSTKEY,
        "group_mean_qty": SQL_GROUP_MEAN_QTY,
        "topk_price": SQL_TOPK_PRICE,
        "text_tokens": SQL_TEXT_TOKENS,
        "text_quality": SQL_TEXT_QUALITY,
        "text_lang_id": SQL_TEXT_LANG_ID,
        "text_fingerprint": SQL_TEXT_FINGERPRINT,
        "dedup_exact": SQL_DEDUP_EXACT,
        "dedup_keep_first": SQL_DEDUP_KEEP_FIRST,
        "dedup_jaccard_ngram": _SQL_JACCARD_PAIRS,
        "dedup_jaccard_prefix": _SQL_JACCARD_PAIRS,
        "dedup_minhash_lsh": _SQL_JACCARD_PAIRS,
        "dedup_minhash_join": _SQL_JACCARD_PAIRS,
        "dedup_clusters": SQL_DEDUP_CLUSTERS,
        "dedup_simhash": SQL_DEDUP_SIMHASH,
        "sim_neardup_cosine": SQL_SIM_NEARDUP_COSINE,
        "sim_topk_cosine": SQL_SIM_TOPK_COSINE,
        "window_hourly": SQL_WINDOW_HOURLY,
        "salted_distinct_supp": SQL_SALTED_DISTINCT_SUPP,
        "cms_event_counts": SQL_CMS_EVENT_COUNTS,
        "asof_click_purchase": SQL_ASOF_CLICK_PURCHASE,
        "asof_next_purchase": SQL_ASOF_NEXT_PURCHASE,
        "sessionize_users": SQL_SESSIONIZE_USERS,
        "accepted_tolerance_quantity": SQL_ACCEPTED_TOLERANCE_QUANTITY,
        "grouped_topk_orders": SQL_GROUPED_TOPK_ORDERS,
        "method_interval_extprice": SQL_METHOD_INTERVAL_EXTPRICE,
        "window_hopping": SQL_WINDOW_HOPPING,
        "join_orders_customer": SQL_JOIN_ORDERS_CUSTOMER,
        "text_vocab": SQL_TEXT_VOCAB,
        "grouped_median_price": SQL_GROUPED_MEDIAN_PRICE,
        "emb_label_centroids": SQL_EMB_LABEL_CENTROIDS,
        "lag_user_gap": SQL_LAG_USER_GAP,
        "rolling_avg_order": SQL_ROLLING_AVG_ORDER,
        "semi_join_big_orders": SQL_SEMI_JOIN_BIG_ORDERS,
        "anti_join_big_orders": SQL_ANTI_JOIN_BIG_ORDERS,
        "setop_except_status": SQL_SETOP_EXCEPT_STATUS,
        "setop_intersect_status": SQL_SETOP_INTERSECT_STATUS,
        "pivot_user_events": SQL_PIVOT_USER_EVENTS,
        "left_join_orders_poorcust": SQL_LEFT_JOIN_ORDERS_POORCUST,
        "text_repetition": SQL_TEXT_REPETITION,
        "text_normalized_fp": SQL_TEXT_NORMALIZED_FP,
        "json_props_k": SQL_JSON_PROPS_K,
        "corpus_prep": SQL_CORPUS_PREP,
        "unnest_tokens": SQL_UNNEST_TOKENS,
        "cume_dist_price": SQL_CUME_DIST_PRICE,
        "rank_orders": SQL_RANK_ORDERS,
        "moments_quantity": SQL_MOMENTS_QUANTITY,
        "entropy_status": SQL_ENTROPY_STATUS,
        "mode_event": SQL_MODE_EVENT,
        "lev_neardup": SQL_LEV_NEARDUP,
        "jw_neardup": SQL_JW_NEARDUP,
        "tfidf_lang": SQL_TFIDF_LANG,
        "regr_price_qty": SQL_REGR_DISCOUNT,
        "benford_price": SQL_BENFORD_PRICE,
        "funnel_click_purchase": SQL_FUNNEL_CLICK_PURCHASE,
        "cube_orders": SQL_CUBE_ORDERS,
        "rollup_orders": SQL_ROLLUP_ORDERS,
        "sample_docs": SQL_SAMPLE_DOCS,
        "sample_stratified": SQL_SAMPLE_STRATIFIED,
        "corr_qty_price": SQL_CORR_QTY_PRICE,
        "concat_nations": SQL_CONCAT_NATIONS,
        "profile_lineitem": SQL_PROFILE_LINEITEM,
        "broadcast_join_orders": SQL_BROADCAST_JOIN_ORDERS,
        "range_join_priceband": SQL_RANGE_JOIN_PRICEBAND,
        "text_redact": SQL_TEXT_REDACT,
        "zscore_order_price": SQL_ZSCORE_ORDER_PRICE,
        "emb_hygiene": SQL_EMB_HYGIENE,
        "psi_price_drift": SQL_PSI_PRICE_DRIFT,
        "first_last_event": SQL_FIRST_LAST_EVENT,
        "event_transitions": SQL_EVENT_TRANSITIONS,
        "ewma_user_value": SQL_EWMA_USER_VALUE,
        "inversions_events": SQL_INVERSIONS_EVENTS,
        "streak_days_user": SQL_STREAK_DAYS_USER,
        "cooccur_parts": SQL_COOCCUR_PARTS,
        "iqr_outliers_price": SQL_IQR_OUTLIERS_PRICE,
        "mad_price_brand": SQL_MAD_PRICE_BRAND,
        "chi2_flag_status": SQL_CHI2_FLAG_STATUS,
        "jsd_price_drift": SQL_JSD_PRICE_DRIFT,
        "dow_orders": SQL_DOW_ORDERS,
        "wavg_discount": SQL_WAVG_DISCOUNT,
        "geomean_price_brand": SQL_GEOMEAN_PRICE_BRAND,
        "corr_matrix_lineitem": SQL_CORR_MATRIX_LINEITEM,
        "qhist_price": SQL_QHIST_PRICE,
        "p90_disc_price": SQL_P90_DISC_PRICE,
        "brand_id_extract": SQL_BRAND_ID_EXTRACT,
        "lexical_lang": SQL_LEXICAL_LANG,
        "ship_consistency": SQL_SHIP_CONSISTENCY,
        "revenue_share": SQL_REVENUE_SHARE,
        "monthly_cumulative": SQL_MONTHLY_CUMULATIVE,
        "fanout_stats": SQL_FANOUT_STATS,
        "daily_anomaly": SQL_DAILY_ANOMALY,
        "median_gap_user": SQL_MEDIAN_GAP_USER,
        "transition_probs": SQL_TRANSITION_PROBS,
        "activity_matrix": SQL_ACTIVITY_MATRIX,
        "retention_daily": SQL_RETENTION_DAILY,
        "session_durations_users": SQL_SESSION_DURATIONS_USERS,
        "skew_suppkey": SQL_SKEW_SUPPKEY,
        "sample_weighted": SQL_SAMPLE_WEIGHTED,
        "kmeans_embeddings": SQL_KMEANS_EMBEDDINGS,
        "dup_degree_hist": SQL_DUP_DEGREE_HIST,
        "quantize_embeddings": SQL_QUANTIZE_EMBEDDINGS,
        "fd_brand_type": SQL_FD_BRAND_TYPE,
        "target_encode_segment": SQL_TARGET_ENCODE_SEGMENT,
        "split_balance_orders": SQL_SPLIT_BALANCE_ORDERS,
        "text_bigrams": SQL_TEXT_BIGRAMS,
        "emb_confusion": SQL_EMB_CONFUSION,
        "mom_change": SQL_MOM_CHANGE,
        "wau_rolling": SQL_WAU_ROLLING,
        "rolling_median_value": SQL_ROLLING_MEDIAN_VALUE,
        "interval_islands_supp": SQL_INTERVAL_ISLANDS,
        "weighted_median_price": SQL_WEIGHTED_MEDIAN_PRICE,
        "winsorize_brand": SQL_WINSORIZE_BRAND,
        "feature_hash_lang": SQL_FEATURE_HASH_LANG,
        "impute_discount": SQL_IMPUTE_DISCOUNT,
        "snm_partnames": SQL_SNM_PARTNAMES,
        "wasserstein_price": SQL_WASSERSTEIN_PRICE,
        "mi_flag_status": SQL_MI_FLAG_STATUS,
        "pareto_parts": SQL_PARETO_PARTS,
        "er_part_clusters": SQL_ER_PART_CLUSTERS,
        "tfidf_pairs": SQL_TFIDF_PAIRS,
        "overlap_pairs": SQL_OVERLAP_PAIRS,
        "pagerank_custsupp": SQL_PAGERANK_CUSTSUPP,
        "qnorm_brand_price": SQL_QNORM_BRAND_PRICE,
        "cusum_events": SQL_CUSUM_EVENTS,
        "cap_per_source": SQL_CAP_PER_SOURCE,
        "late_events_users": SQL_LATE_EVENTS,
        "decontaminate_docs": SQL_DECONTAMINATE,
        "lm_score_docs": SQL_LM_SCORE,
        "hard_negatives": SQL_HARD_NEGATIVES,
    })
