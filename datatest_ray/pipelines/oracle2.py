"""Oracle-paired driver queries, continuation of ``oracle.py`` (that
module holds the first ~150 entries; this one takes new additions so the
registration dicts stay navigable).  Same contract: every query returns
a collected ``pa.Table`` whose column NAMES and value representations
match the paired DuckDB SQL exactly (driver canon: sort columns by name,
round floats, sort rows, hash)."""

from __future__ import annotations

from typing import Callable, Dict

import pyarrow as pa
import pyarrow.compute as pc

from .oracle import _materialize, _read, _run_check

# ---------------------------------------------------------------------------
# Temporal validation checks (stages/temporal.py)
# ---------------------------------------------------------------------------


def q_monotonic_user_value(sf_dir: str):
    """Per-user event ``value`` must be non-decreasing over time — every
    backward step is one deviation row (MonotonicCheck; ties on ts break
    by event_id, mirrored in the oracle's lag ORDER BY)."""
    from ..stages.temporal import MonotonicCheck

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    return _run_check(
        MonotonicCheck("user_id", "ts", "value", "event_id"), ds,
        ["key", "row_ref", "value_num", "expected_num", "deviation"],
    )


SQL_MONOTONIC_USER_VALUE = """
WITH w AS (
  SELECT user_id, event_id, value,
         lag(value) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT CAST(user_id AS VARCHAR) AS key,
       CAST(event_id AS VARCHAR) AS row_ref,
       value AS value_num,
       prev AS expected_num,
       value - prev AS deviation
FROM w WHERE value < prev
"""


def q_freshness_users(sf_dir: str):
    """Stale-entity audit: users whose newest event lags the global
    newest event by more than 24h (FreshnessCheck; shuffle payload is
    one (user, max_ts) row per user, never the event rows)."""
    from ..stages.temporal import FreshnessCheck

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    return _run_check(
        FreshnessCheck("user_id", "ts", max_lag_s=24 * 3600.0), ds,
        ["key", "value", "value_num", "expected_num", "deviation"],
    )


SQL_FRESHNESS_USERS = """
WITH m AS (
  SELECT user_id,
         max(ts) AS mt,
         CAST(epoch_us(max(ts)) AS BIGINT) AS mt_us
  FROM events GROUP BY user_id
), g AS (SELECT max(mt_us) AS gm_us FROM m)
SELECT CAST(user_id AS VARCHAR) AS key,
       strftime(date_trunc('second', mt), '%Y-%m-%d %H:%M:%S') AS value,
       (gm_us - mt_us) / 1e6 AS value_num,
       CAST(86400 AS DOUBLE) AS expected_num,
       (gm_us - mt_us) / 1e6 - 86400 AS deviation
FROM m, g
WHERE (gm_us - mt_us) / 1e6 > 86400
"""


def q_unique_composite_events(sf_dir: str):
    """Composite-key uniqueness: each (user_id, event_type) pair should
    occur once; duplicated pairs emit one Extra row with the surplus
    count (UniqueCheck with a column LIST — the '|'-joined key is
    mirrored verbatim in the SQL)."""
    from ..stages.global_checks import UniqueCheck

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return _run_check(
        UniqueCheck(["user_id", "event_type"]), ds,
        ["value", "deviation", "kind"],
    )


SQL_UNIQUE_COMPOSITE_EVENTS = """
SELECT CAST(user_id AS VARCHAR) || '|' || event_type AS value,
       CAST(count(*) - 1 AS DOUBLE) AS deviation,
       'extra' AS kind
FROM events
GROUP BY user_id, event_type
HAVING count(*) > 1
"""


# ---------------------------------------------------------------------------
# Full-outer join (stages/relational.py :: safe_join)
# ---------------------------------------------------------------------------


def q_full_outer_nation_activity(sf_dir: str):
    """Two sparse per-nation aggregates stitched with a FULL OUTER
    join: nations with high-balance AUTOMOBILE customers vs nations
    with high-balance suppliers — unmatched sides surface as null
    counts on exactly one side (safe_join's dual-marker sentinel path)."""
    from ray.data.aggregate import Count

    from ..stages.relational import safe_join

    cust = _read(sf_dir, "customer",
                 ["c_nationkey", "c_mktsegment", "c_acctbal"])
    supp = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])

    def lfilter(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t.column("c_mktsegment"), "AUTOMOBILE"),
                    pc.greater(t.column("c_acctbal"), 9200.0))
        f = t.filter(m)
        return pa.table({"c_nationkey":
                         f.column("c_nationkey").cast(pa.int64())})

    def rfilter(t: pa.Table) -> pa.Table:
        f = t.filter(pc.greater(t.column("s_acctbal"), 7000.0))
        return pa.table({"s_nationkey":
                         f.column("s_nationkey").cast(pa.int64())})

    l = cust.map_batches(lfilter, batch_format="pyarrow",
                         zero_copy_batch=True).groupby(
        "c_nationkey").aggregate(Count(alias_name="c_cnt"))
    r = supp.map_batches(rfilter, batch_format="pyarrow",
                         zero_copy_batch=True).groupby(
        "s_nationkey").aggregate(Count(alias_name="s_cnt"))
    # schema hints cover the fully-empty-aggregate case (at tiny scale
    # a filter can leave zero suppliers -> Dataset.schema() is None)
    joined = safe_join(
        l, r, join_type="full_outer", num_partitions=8,
        on="c_nationkey", right_on="s_nationkey",
        left_schema=pa.schema([("c_nationkey", pa.int64()),
                               ("c_cnt", pa.int64())]),
        right_schema=pa.schema([("s_nationkey", pa.int64()),
                                ("s_cnt", pa.int64())]))

    def finalize(t: pa.Table) -> pa.Table:
        # Ray's hash join coalesces the key pair into the LEFT name, so
        # c_nationkey already carries the right key on right-only rows
        return pa.table({
            "nationkey": t.column("c_nationkey").cast(pa.int64()),
            "c_cnt": t.column("c_cnt").cast(pa.int64()),
            "s_cnt": t.column("s_cnt").cast(pa.int64()),
        })

    return _materialize(
        joined.map_batches(finalize, batch_format="pyarrow"),
        empty_schema=pa.schema([("nationkey", pa.int64()),
                                ("c_cnt", pa.int64()),
                                ("s_cnt", pa.int64())]))


SQL_FULL_OUTER_NATION_ACTIVITY = """
WITH l AS (
  SELECT c_nationkey AS k, CAST(count(*) AS BIGINT) AS c_cnt
  FROM customer
  WHERE c_mktsegment = 'AUTOMOBILE' AND c_acctbal > 9200
  GROUP BY 1
), r AS (
  SELECT s_nationkey AS k, CAST(count(*) AS BIGINT) AS s_cnt
  FROM supplier WHERE s_acctbal > 7000 GROUP BY 1
)
SELECT CAST(coalesce(l.k, r.k) AS BIGINT) AS nationkey, c_cnt, s_cnt
FROM l FULL OUTER JOIN r ON l.k = r.k
"""


# ---------------------------------------------------------------------------
# Keep-best-per-cluster dedup (stages/dedup.py :: cluster_representatives)
# ---------------------------------------------------------------------------


def q_dedup_best_rep(sf_dir: str):
    """Quality-keyed near-dup resolution: jaccard pairs -> connected
    components -> per cluster keep the longest document (ties: lowest
    doc_id).  One row per clustered doc with its cluster, representative
    and keep decision."""
    from ..stages.dedup import cluster_representatives

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    return _materialize(
        cluster_representatives(ds, "text", "doc_id",
                                quality_col="n_chars", n=3, threshold=0.8,
                                shuffle_partitions=8),
        empty_schema=pa.schema([("doc_id", pa.int64()),
                                ("cluster_id", pa.int64()),
                                ("rep_id", pa.int64()),
                                ("keep", pa.bool_())]))


SQL_DEDUP_BEST_REP = """
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
),
comp AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node),
q AS (SELECT c.node, c.cluster_id, d.n_chars
      FROM comp c JOIN documents d ON d.doc_id = c.node),
rep AS (
  SELECT cluster_id, node AS rep_id FROM (
    SELECT cluster_id, node,
           row_number() OVER (PARTITION BY cluster_id
                              ORDER BY n_chars DESC, node ASC) AS rn
    FROM q) WHERE rn = 1
)
SELECT q.node AS doc_id, q.cluster_id, rep.rep_id,
       q.node = rep.rep_id AS keep
FROM q JOIN rep ON q.cluster_id = rep.cluster_id
"""


# ---------------------------------------------------------------------------
# Charset / encoding-hygiene profile (stages/text.py :: charset_profile)
# ---------------------------------------------------------------------------


def q_text_charset(sf_dir: str):
    from ..stages.text import charset_profile

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _materialize(charset_profile(ds, "text", "doc_id"))


SQL_TEXT_CHARSET = r"""
SELECT doc_id,
       length(text) AS n_chars_total,
       length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
         AS n_digit,
       length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))
         AS n_upper,
       length(text) - length(regexp_replace(text,
         '[\x21-\x2F\x3A-\x40\x5B-\x60\x7B-\x7E]', '', 'g')) AS n_punct,
       length(text) - length(regexp_replace(text, '[^\x00-\x7F]', '', 'g'))
         AS n_nonascii
FROM documents
"""


# ---------------------------------------------------------------------------
# Cramér's V (stages/drift.py :: cramers_v)
# ---------------------------------------------------------------------------


def q_cramers_v_orders(sf_dir: str):
    from ..stages.drift import cramers_v

    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])
    return _materialize(cramers_v(ds, "o_orderstatus", "o_orderpriority"))


SQL_CRAMERS_V_ORDERS = """
WITH c AS (
  SELECT o_orderstatus AS a, o_orderpriority AS b, count(*) AS n
  FROM orders GROUP BY a, b
),
ra AS (SELECT a, sum(n) AS na FROM c GROUP BY a),
cb AS (SELECT b, sum(n) AS nb FROM c GROUP BY b),
tot AS (SELECT sum(n) AS t FROM c),
grid AS (
  SELECT ra.a, cb.b, ra.na * cb.nb / tot.t AS e,
         coalesce(c.n, 0) AS o
  FROM ra CROSS JOIN cb CROSS JOIN tot
  LEFT JOIN c ON c.a = ra.a AND c.b = cb.b
),
agg AS (SELECT sum((o - e) * (o - e) / e) AS chi2 FROM grid)
SELECT sqrt(agg.chi2 / ((SELECT t FROM tot) *
        (least((SELECT count(*) FROM ra),
               (SELECT count(*) FROM cb)) - 1))) AS v,
       agg.chi2 AS chi2,
       (SELECT CAST(t AS BIGINT) FROM tot) AS n
FROM agg
"""


# ---------------------------------------------------------------------------
# Pixel-derived dHash near-dup clusters (stages/imaging.py)
# ---------------------------------------------------------------------------


def q_image_dhash_clusters(sf_dir: str):
    """Near-dup cluster histogram keyed on dhash computed FROM DECODED
    PIXELS (actor-pool decode) over the seeded image fixture.  rows-only
    by design: the codec + gradient hash are not SQL-expressible;
    brute-force dhash parity is pinned in tests/test_imaging_dhash.py."""
    import os
    import re

    from ..sources.images import ImageFixtureSpec, generate_dataset
    from ..stages.imaging import image_pixel_dup_clusters

    base = os.path.basename(os.path.normpath(sf_dir))
    m = re.search(r"sf(\d+(?:\.\d+)?)", base)
    sf = float(m.group(1)) if m else 0.001
    spec = ImageFixtureSpec(n_rows=max(1000, int(100_000 * sf)),
                            seed=42, rows_per_part=2048)
    images = generate_dataset(spec, columns={"image_id", "bytes", "fmt"})
    return _materialize(
        image_pixel_dup_clusters(images, algo="dhash", threshold=4,
                                 mode="sampled"),
        empty_schema=pa.schema([("size", pa.int64()),
                                ("n_clusters", pa.int64())]))


# ---------------------------------------------------------------------------
# Group-cardinality bounds (stages/global_checks.py :: GroupSizeCheck)
# ---------------------------------------------------------------------------


def q_group_size_users(sf_dir: str):
    """Entity-volume invariant: every user must have between 55 and 70
    events; out-of-bounds users emit one deviation row with the count
    and the violated bound."""
    from ..stages.global_checks import GroupSizeCheck

    ds = _read(sf_dir, "events", ["user_id"])
    return _run_check(
        GroupSizeCheck("user_id", min_rows=55, max_rows=70), ds,
        ["key", "value_num", "expected_num", "deviation"],
    )


SQL_GROUP_SIZE_USERS = """
WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id)
SELECT CAST(user_id AS VARCHAR) AS key,
       CAST(n AS DOUBLE) AS value_num,
       CAST(CASE WHEN n < 55 THEN 55 ELSE 70 END AS DOUBLE) AS expected_num,
       CAST(n AS DOUBLE) - (CASE WHEN n < 55 THEN 55 ELSE 70 END)
         AS deviation
FROM c WHERE n < 55 OR n > 70
"""


# ---------------------------------------------------------------------------
# accepted.percent over a distributed violations dataset (§2.E)
# ---------------------------------------------------------------------------


def q_accepted_percent_quantity(sf_dir: str):
    """``with accepted.percent(0.1)`` applied to interval violations:
    only rows whose deviation exceeds 10% of the violated boundary
    survive (the stateless-mask fast path of the acceptance algebra,
    applied inside the violations Dataset without collecting it)."""
    from ..pipelines.acceptance import accepted
    from ..stages.base import RunContext
    from ..stages.row_checks import IntervalCheck
    from .suite import CheckSuite

    ds = _read(sf_dir, "lineitem", ["l_quantity"])
    result = CheckSuite([IntervalCheck("l_quantity", min=1, max=27)],
                        RunContext()).run(ds)
    remaining = accepted.percent(0.1).filter_violations_dataset(
        result.violations)
    return _materialize(remaining).select(
        ["value_num", "expected_num", "deviation", "kind"])


SQL_ACCEPTED_PERCENT_QUANTITY = """
SELECT CAST(l_quantity AS DOUBLE) AS value_num,
       CAST(CASE WHEN l_quantity < 1 THEN 1 ELSE 27 END AS DOUBLE)
         AS expected_num,
       CAST(l_quantity AS DOUBLE)
         - (CASE WHEN l_quantity < 1 THEN 1 ELSE 27 END) AS deviation,
       'deviation' AS kind
FROM lineitem
WHERE (l_quantity < 1 OR l_quantity > 27)
  AND abs((l_quantity - (CASE WHEN l_quantity < 1 THEN 1 ELSE 27 END))
          / (CASE WHEN l_quantity < 1 THEN 1 ELSE 27 END)) > 0.1
"""


# ---------------------------------------------------------------------------
# Per-partition pass/fail verdict report (north rule: "matching the
# reference's per-partition pass/fail and violation rows")
# ---------------------------------------------------------------------------


def q_partition_verdicts(sf_dir: str):
    """Per-partition x per-check violation counts from ONE fused
    stateless pass (RunContext(partition_col=...) threads partition
    lineage through every violation row; the report is a tiny groupby
    over the violations output, never over the input)."""
    from ray.data.aggregate import Count

    from ..stages.base import RunContext
    from ..stages.row_checks import DomainCheck, IntervalCheck
    from .suite import CheckSuite

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_discount", "l_linestatus"])
    suite = CheckSuite(
        [IntervalCheck("l_quantity", min=1, max=27),
         IntervalCheck("l_discount", min=0.0, max=0.04),
         DomainCheck("l_linestatus", {"O"})],
        RunContext(partition_col="l_returnflag"),
    )
    v = suite.run(ds).violations
    counts = v.groupby(["partition_id", "check_id"]).aggregate(
        Count(alias_name="n_violations"))

    def fix(t: pa.Table) -> pa.Table:
        return pa.table({
            "partition_id": t.column("partition_id"),
            "check_id": t.column("check_id"),
            "n_violations": t.column("n_violations").cast(pa.int64()),
        })

    return _materialize(
        counts.map_batches(fix, batch_format="pyarrow"),
        empty_schema=pa.schema([("partition_id", pa.string()),
                                ("check_id", pa.string()),
                                ("n_violations", pa.int64())]))


SQL_PARTITION_VERDICTS = """
SELECT l_returnflag AS partition_id,
       'interval(l_quantity,1,27)' AS check_id,
       CAST(count(*) AS BIGINT) AS n_violations
FROM lineitem WHERE l_quantity < 1 OR l_quantity > 27 GROUP BY 1
UNION ALL
SELECT l_returnflag, 'interval(l_discount,0.0,0.04)',
       CAST(count(*) AS BIGINT)
FROM lineitem
WHERE l_discount < 0.0 OR l_discount > 0.04 OR l_discount IS NULL
GROUP BY 1
UNION ALL
SELECT l_returnflag, 'domain(l_linestatus,1 allowed)',
       CAST(count(*) AS BIGINT)
FROM lineitem WHERE l_linestatus <> 'O' GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Schema-tightening profile (narrowest integer dtype per column)
# ---------------------------------------------------------------------------


def q_schema_tighten_lineitem(sf_dir: str):
    """Storage-audit profile: global min/max of every integer column
    plus the narrowest signed dtype that holds the range — the input to
    a schema-tightening migration.  One Min/Max aggregate pass."""
    from ray.data.aggregate import Max, Min

    cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
    ds = _read(sf_dir, "lineitem", cols)
    aggs = []
    for c in cols:
        aggs.append(Min(c, alias_name=f"min_{c}"))
        aggs.append(Max(c, alias_name=f"max_{c}"))
    row = ds.aggregate(*aggs)  # one dict: the 8 global extrema

    def suggest(lo: int, hi: int) -> str:
        for name, bound in (("int8", 127), ("int16", 32767),
                            ("int32", 2147483647)):
            if -bound - 1 <= lo and hi <= bound:
                return name
        return "int64"

    out = {"column": [], "min_v": [], "max_v": [], "suggested": []}
    for c in cols:
        lo, hi = int(row[f"min_{c}"]), int(row[f"max_{c}"])
        out["column"].append(c)
        out["min_v"].append(lo)
        out["max_v"].append(hi)
        out["suggested"].append(suggest(lo, hi))
    return pa.table({"column": pa.array(out["column"]),
                     "min_v": pa.array(out["min_v"], pa.int64()),
                     "max_v": pa.array(out["max_v"], pa.int64()),
                     "suggested": pa.array(out["suggested"])})


SQL_SCHEMA_TIGHTEN_LINEITEM = """
WITH s AS (
  SELECT 'l_orderkey' AS "column", min(l_orderkey) AS min_v,
         max(l_orderkey) AS max_v FROM lineitem
  UNION ALL
  SELECT 'l_partkey', min(l_partkey), max(l_partkey) FROM lineitem
  UNION ALL
  SELECT 'l_suppkey', min(l_suppkey), max(l_suppkey) FROM lineitem
  UNION ALL
  SELECT 'l_linenumber', min(l_linenumber), max(l_linenumber) FROM lineitem
)
SELECT "column", CAST(min_v AS BIGINT) AS min_v, CAST(max_v AS BIGINT) AS max_v,
       CASE WHEN min_v >= -128 AND max_v <= 127 THEN 'int8'
            WHEN min_v >= -32768 AND max_v <= 32767 THEN 'int16'
            WHEN min_v >= -2147483648 AND max_v <= 2147483647 THEN 'int32'
            ELSE 'int64' END AS suggested
FROM s
"""


# ---------------------------------------------------------------------------
# Distributed table diff (stages/compare.py :: compare_tables)
# ---------------------------------------------------------------------------


def q_compare_customer_ref(sf_dir: str):
    """Dataset diff against a deterministically-perturbed reference copy
    of ``customer`` (md5-keyed plants, recomputable in SQL): dropped
    keys surface as ``extra`` in the actual, synthetic reference keys as
    ``missing``, +1-shifted nationkeys as per-column ``invalid`` rows."""
    import numpy as np

    from ..stages.compare import compare_tables
    from ..stages.sampling import _key_units

    actual = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def build_ref(t: pa.Table) -> pa.Table:
        u = _key_units(t.column("c_custkey"), "md5")
        keep = u >= 0.01
        tk = t.filter(pa.array(keep))
        uk = u[keep]
        nk = tk.column("c_nationkey").to_numpy(
            zero_copy_only=False).astype(np.int64).copy()
        nk[(uk >= 0.01) & (uk < 0.03)] += 1
        base = pa.table({"c_custkey": tk.column("c_custkey"),
                         "c_nationkey": pa.array(nk)})
        syn_keys = pc.add(t.filter(pa.array(u >= 0.99)).column("c_custkey"),
                          1000000)
        syn = pa.table({"c_custkey": syn_keys.cast(pa.int64()),
                        "c_nationkey": pa.array(
                            np.zeros(len(syn_keys), dtype=np.int64))})
        return pa.concat_tables([base, syn])

    reference = _read(sf_dir, "customer",
                      ["c_custkey", "c_nationkey"]).map_batches(
        build_ref, batch_format="pyarrow", zero_copy_batch=True)
    v = compare_tables(actual, reference, key="c_custkey",
                       columns=["c_nationkey"], num_partitions=8)
    return _materialize(v).select(
        ["row_ref", "kind", "key", "value", "expected", "deviation"])


SQL_COMPARE_CUSTOMER_REF = """
WITH u AS (
  SELECT c_custkey, c_nationkey,
         CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))
              AS BIGINT) / 4294967296.0 AS h
  FROM customer
)
SELECT CAST(c_custkey AS VARCHAR) AS row_ref, 'extra' AS kind,
       CAST(NULL AS VARCHAR) AS key, CAST(NULL AS VARCHAR) AS value,
       CAST(NULL AS VARCHAR) AS expected, CAST(NULL AS DOUBLE) AS deviation
FROM u WHERE h < 0.01
UNION ALL
SELECT CAST(c_custkey + 1000000 AS VARCHAR), 'missing',
       CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE)
FROM u WHERE h >= 0.99
UNION ALL
SELECT CAST(c_custkey AS VARCHAR), 'invalid', 'c_nationkey',
       CAST(c_nationkey AS VARCHAR), CAST(c_nationkey + 1 AS VARCHAR),
       CAST(-1 AS DOUBLE)
FROM u WHERE h >= 0.01 AND h < 0.03
"""


# ---------------------------------------------------------------------------
# Sequence contiguity (stages/temporal.py :: SequenceContiguityCheck)
# ---------------------------------------------------------------------------


def q_seq_contig_lineitem(sf_dir: str):
    """Header/detail integrity: l_linenumber within each order must be
    exactly 1..n (the synthetic data assigns random line numbers, so
    most orders fail — one compact deviation row per bad order)."""
    from ..stages.temporal import SequenceContiguityCheck

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    return _run_check(
        SequenceContiguityCheck("l_orderkey", "l_linenumber"), ds,
        ["key", "value_num", "expected_num", "deviation"],
    )


SQL_SEQ_CONTIG_LINEITEM = """
WITH g AS (
  SELECT l_orderkey, count(*) AS n, min(l_linenumber) AS lo,
         max(l_linenumber) AS hi
  FROM lineitem GROUP BY 1
)
SELECT CAST(l_orderkey AS VARCHAR) AS key,
       CAST(n AS DOUBLE) AS value_num,
       CAST(hi AS DOUBLE) AS expected_num,
       CAST(n - hi AS DOUBLE) AS deviation
FROM g WHERE n <> hi OR lo <> 1
"""


# ---------------------------------------------------------------------------
# Cross-table field consistency (stages/compare.py :: JoinConsistencyCheck)
# ---------------------------------------------------------------------------


def q_ship_after_order(sf_dir: str):
    """Every lineitem must ship on/after its order's date — the
    cross-TABLE temporal invariant (one inner hash join + vectorized
    compare; timestamps compared in epoch seconds)."""
    from ..stages.compare import JoinConsistencyCheck

    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    return _run_check(
        JoinConsistencyCheck(orders, on="l_orderkey",
                             right_on="o_orderkey",
                             left_col="l_shipdate",
                             right_col="o_orderdate", op=">="),
        lineitem,
        ["key", "value_num", "expected_num", "deviation"],
    )


SQL_SHIP_AFTER_ORDER = """
SELECT CAST(l.l_orderkey AS VARCHAR) AS key,
       epoch_us(l.l_shipdate) / 1e6 AS value_num,
       epoch_us(o.o_orderdate) / 1e6 AS expected_num,
       (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) / 1e6
         AS deviation
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate < o.o_orderdate
"""


# ---------------------------------------------------------------------------
# Latest-version compaction (stages/dedup.py :: latest_by_key)
# ---------------------------------------------------------------------------


def q_latest_event_state(sf_dir: str):
    """CDC snapshot: each (user, event_type) key's LATEST event (max ts,
    ties by event_id) — the upsert-compaction read of a streaming
    table."""
    from ..stages.dedup import latest_by_key

    ds = _read(sf_dir, "events",
               ["user_id", "event_type", "ts", "event_id", "value"])
    out = latest_by_key(ds, key_cols=["user_id", "event_type"],
                        order_col="ts", id_col="event_id")

    def fix(t: pa.Table) -> pa.Table:
        return t.select(["user_id", "event_type", "event_id", "value"])

    return _materialize(out.map_batches(fix, batch_format="pyarrow",
                                        zero_copy_batch=True))


SQL_LATEST_EVENT_STATE = """
SELECT user_id, event_type, event_id, value
FROM (
  SELECT user_id, event_type, event_id, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Bucketed checksum reconcile (stages/compare.py :: checksum_reconcile)
# ---------------------------------------------------------------------------


def q_checksum_reconcile_customer(sf_dir: str):
    """CDC reconcile prefilter over the same perturbed reference as
    ``compare_customer_ref``: 64 bucket checksums per side; planted
    drops/shifts flip their buckets to match=false while untouched
    buckets stay equal — O(buckets) instead of O(rows) comparison."""
    import numpy as np

    from ..stages.compare import checksum_reconcile
    from ..stages.sampling import _key_units

    actual = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def build_ref(t: pa.Table) -> pa.Table:
        u = _key_units(t.column("c_custkey"), "md5")
        keep = u >= 0.01
        tk = t.filter(pa.array(keep))
        uk = u[keep]
        nk = tk.column("c_nationkey").to_numpy(
            zero_copy_only=False).astype(np.int64).copy()
        nk[(uk >= 0.01) & (uk < 0.03)] += 1
        base = pa.table({"c_custkey": tk.column("c_custkey"),
                         "c_nationkey": pa.array(nk)})
        syn_keys = pc.add(t.filter(pa.array(u >= 0.99)).column("c_custkey"),
                          1000000)
        syn = pa.table({"c_custkey": syn_keys.cast(pa.int64()),
                        "c_nationkey": pa.array(
                            np.zeros(len(syn_keys), dtype=np.int64))})
        return pa.concat_tables([base, syn])

    reference = _read(sf_dir, "customer",
                      ["c_custkey", "c_nationkey"]).map_batches(
        build_ref, batch_format="pyarrow", zero_copy_batch=True)
    out = checksum_reconcile(actual, reference, key_col="c_custkey",
                             columns=["c_nationkey"], n_buckets=64)
    return _materialize(out)


SQL_CHECKSUM_RECONCILE_CUSTOMER = """
WITH u AS (
  SELECT c_custkey, c_nationkey,
         CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))
              AS BIGINT) / 4294967296.0 AS h
  FROM customer
),
act AS (SELECT CAST(c_custkey AS VARCHAR) AS k,
               CAST(c_nationkey AS VARCHAR) AS v FROM customer),
ref AS (
  SELECT CAST(c_custkey AS VARCHAR) AS k,
         CAST(c_nationkey + CASE WHEN h >= 0.01 AND h < 0.03
                                 THEN 1 ELSE 0 END AS VARCHAR) AS v
  FROM u WHERE h >= 0.01
  UNION ALL
  SELECT CAST(c_custkey + 1000000 AS VARCHAR), '0' FROM u WHERE h >= 0.99
),
ca AS (
  SELECT CAST(('0x' || substr(md5(k), 1, 8)) AS BIGINT) % 64 AS bucket,
         CAST(sum(CAST(('0x' || substr(md5(k || '|' || v), 1, 10))
                       AS BIGINT)) AS BIGINT) AS s
  FROM act GROUP BY 1
),
cr AS (
  SELECT CAST(('0x' || substr(md5(k), 1, 8)) AS BIGINT) % 64 AS bucket,
         CAST(sum(CAST(('0x' || substr(md5(k || '|' || v), 1, 10))
                       AS BIGINT)) AS BIGINT) AS s
  FROM ref GROUP BY 1
)
SELECT CAST(coalesce(ca.bucket, cr.bucket) AS BIGINT) AS bucket,
       ca.s AS sum_actual, cr.s AS sum_reference,
       coalesce(ca.s = cr.s, FALSE) AS match
FROM ca FULL OUTER JOIN cr ON ca.bucket = cr.bucket
"""


# ---------------------------------------------------------------------------
# Label silhouette over embeddings (stages/similarity.py)
# ---------------------------------------------------------------------------


def q_silhouette_labels(sf_dir: str):
    from ..stages.similarity import silhouette_labels

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    return _materialize(silhouette_labels(ds, label_col="label",
                                          vec_col="embedding"))


SQL_SILHOUETTE_LABELS = """
WITH u AS (
  SELECT vec_id, label,
         unnest(range(len(embedding))) AS dim,
         unnest(CAST(embedding AS DOUBLE[])) AS e
  FROM embeddings
),
c AS (
  SELECT CAST(label AS BIGINT) AS label, dim, ROUND(avg(e), 6) AS v
  FROM u GROUP BY label, dim
),
pd AS (
  SELECT u.vec_id, CAST(u.label AS BIGINT) AS own, c.label AS cl,
         sum((u.e - c.v) * (u.e - c.v)) AS d2
  FROM u JOIN c ON u.dim = c.dim
  GROUP BY 1, 2, 3
),
s AS (
  SELECT vec_id, own,
         sqrt(max(CASE WHEN cl = own THEN d2 END)) AS a,
         sqrt(min(CASE WHEN cl <> own THEN d2 END)) AS b
  FROM pd GROUP BY 1, 2
)
SELECT own AS label,
       avg(CASE WHEN greatest(a, b) = 0 OR b IS NULL THEN 0
                ELSE (b - a) / greatest(a, b) END) AS sil,
       CAST(count(*) AS BIGINT) AS n
FROM s GROUP BY own
"""


# ---------------------------------------------------------------------------
# Exact cardinality profile (stages/profile.py :: cardinality_profile)
# ---------------------------------------------------------------------------


def q_cardinality_lineitem(sf_dir: str):
    from ..stages.profile import cardinality_profile

    cols = ["l_orderkey", "l_returnflag", "l_linestatus", "l_quantity"]
    ds = _read(sf_dir, "lineitem", cols)
    return _materialize(cardinality_profile(ds, cols))


SQL_CARDINALITY_LINEITEM = """
SELECT 'l_orderkey' AS "column",
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_distinct
FROM lineitem
UNION ALL
SELECT 'l_returnflag', CAST(count(DISTINCT l_returnflag) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'l_linestatus', CAST(count(DISTINCT l_linestatus) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'l_quantity', CAST(count(DISTINCT l_quantity) AS BIGINT)
FROM lineitem
"""


# ---------------------------------------------------------------------------
# Time-weighted average (stages/seq.py :: time_weighted_avg)
# ---------------------------------------------------------------------------


def q_twa_user_value(sf_dir: str):
    from ..stages.seq import time_weighted_avg

    ds = _read(sf_dir, "events", ["user_id", "ts", "value", "event_id"])
    out = time_weighted_avg(ds, by="user_id", ts="ts",
                            value_col="value", id_col="event_id")
    return _materialize(out)


SQL_TWA_USER_VALUE = """
WITH w AS (
  SELECT user_id, value,
         (epoch_us(lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id))
          - epoch_us(ts)) / 1e6 AS dt
  FROM events
)
SELECT user_id,
       sum(value * dt) / sum(dt) AS twa,
       sum(dt) AS span_s
FROM w WHERE dt IS NOT NULL
GROUP BY user_id
HAVING sum(dt) > 0
"""


# ---------------------------------------------------------------------------
# ANN recall evaluation (stages/similarity.py :: ann_recall_report)
# ---------------------------------------------------------------------------


def q_ann_recall_report(sf_dir: str):
    """rows-only by design (the ANN side is approximate): recall@5 of
    the multi-probe hyperplane-LSH index vs the exact top-k, computed
    via a distributed pair join.  The >=0.8 recall bar itself is pinned
    in tests/test_text_dedup_similarity.py."""
    from ..stages.similarity import ann_recall_report

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    queries = emb.filter(expr="vec_id < 8")
    return ann_recall_report(emb, queries, id_col="vec_id",
                             vec_col="embedding", k=5, method="lsh")


# ---------------------------------------------------------------------------
# Token-budget mixture sampling (pipelines/corpus.py)
# ---------------------------------------------------------------------------


def q_sample_token_budget(sf_dir: str):
    from .corpus import sample_token_budget

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    return _materialize(sample_token_budget(
        ds, budget_tokens=3000))


SQL_SAMPLE_TOKEN_BUDGET = r"""
WITH tok AS (
  SELECT doc_id, lang,
         CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) = '' THEN 0
              ELSE len(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\s+')) END AS nt
  FROM documents
),
tot AS (SELECT lang, sum(nt) AS t FROM tok GROUP BY 1),
r AS (SELECT lang, least(1.0, 3000.0 / t) AS rate FROM tot)
SELECT d.doc_id, d.lang
FROM documents d JOIN r ON d.lang = r.lang
WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
           AS BIGINT) / 4294967296.0 < r.rate
"""


# ---------------------------------------------------------------------------
# K-anonymity + sentinel-value audits (privacy / disguised-null checks)
# ---------------------------------------------------------------------------


def q_k_anonymity_customer(sf_dir: str):
    """K-anonymity over quasi-identifiers (nationkey, mktsegment):
    every combination observed fewer than 10 times is a
    re-identification risk (GroupSizeCheck with a composite key)."""
    from ..stages.global_checks import GroupSizeCheck

    ds = _read(sf_dir, "customer", ["c_nationkey", "c_mktsegment"])
    return _run_check(
        GroupSizeCheck(["c_nationkey", "c_mktsegment"], min_rows=10), ds,
        ["key", "value_num", "expected_num", "deviation"],
    )


SQL_K_ANONYMITY_CUSTOMER = """
WITH g AS (
  SELECT c_nationkey, c_mktsegment, count(*) AS n
  FROM customer GROUP BY 1, 2
)
SELECT CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment AS key,
       CAST(n AS DOUBLE) AS value_num,
       CAST(10 AS DOUBLE) AS expected_num,
       CAST(n - 10 AS DOUBLE) AS deviation
FROM g WHERE n < 10
"""


def q_sentinel_values_orders(sf_dir: str):
    """Disguised-missing-value audit: per column the dominant non-null
    value and its share (ties break on the smaller value string, both
    engines)."""
    from ..stages.profile import sentinel_value_report

    cols = ["o_orderstatus", "o_orderpriority", "o_custkey"]
    ds = _read(sf_dir, "orders", cols)
    return _materialize(sentinel_value_report(ds, cols))


SQL_SENTINEL_VALUES_ORDERS = """
WITH v AS (
  SELECT 'o_orderstatus' AS "column", CAST(o_orderstatus AS VARCHAR) AS tv
  FROM orders WHERE o_orderstatus IS NOT NULL
  UNION ALL
  SELECT 'o_orderpriority', CAST(o_orderpriority AS VARCHAR)
  FROM orders WHERE o_orderpriority IS NOT NULL
  UNION ALL
  SELECT 'o_custkey', CAST(o_custkey AS VARCHAR)
  FROM orders WHERE o_custkey IS NOT NULL
),
c AS (SELECT "column", tv, count(*) AS n FROM v GROUP BY 1, 2),
t AS (SELECT "column", CAST(sum(n) AS BIGINT) AS n_nonnull FROM c GROUP BY 1),
r AS (
  SELECT "column", tv, n,
         row_number() OVER (PARTITION BY "column"
                            ORDER BY n DESC, tv ASC) AS rn
  FROM c
)
SELECT r."column", r.tv AS top_value, CAST(r.n AS BIGINT) AS n_top,
       t.n_nonnull, r.n / CAST(t.n_nonnull AS DOUBLE) AS share
FROM r JOIN t ON r."column" = t."column"
WHERE r.rn = 1
"""


# ---------------------------------------------------------------------------
# Exact distributed Kolmogorov–Smirnov (stages/drift.py :: ks_exact)
# ---------------------------------------------------------------------------


def q_ks_exact_price(sf_dir: str):
    from ..stages.drift import ks_exact

    ds = _read(sf_dir, "lineitem", ["l_extendedprice", "l_returnflag"])
    return ks_exact(ds, "l_extendedprice", split_col="l_returnflag",
                    ref_value="A")


SQL_KS_EXACT_PRICE = """
WITH p AS (
  SELECT l_extendedprice AS v,
         CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS g
  FROM lineitem WHERE l_extendedprice IS NOT NULL
),
n AS (SELECT CAST(sum(g) AS BIGINT) AS n1,
             CAST(count(*) - sum(g) AS BIGINT) AS n0 FROM p),
c AS (SELECT v, sum(g) AS c1, count(*) AS cn FROM p GROUP BY v),
s AS (SELECT v, sum(c1) OVER (ORDER BY v) AS cum1,
             sum(cn) OVER (ORDER BY v) AS cum FROM c)
SELECT max(abs(cum1 / CAST(n.n1 AS DOUBLE)
               - (cum - cum1) / CAST(n.n0 AS DOUBLE))) AS ks,
       n.n1 AS n_ref, n.n0 AS n_other
FROM s, n GROUP BY n.n1, n.n0
"""


# ---------------------------------------------------------------------------
# Deterministic violation examples (pipelines/suite.py)
# ---------------------------------------------------------------------------


def q_violation_examples(sf_dir: str):
    """Report tooling: 3 deterministic example rows per check (smallest
    md5(row_ref|kind)) from a 2-check suite over events — the "show me
    three offending rows" sample that reproduces identically across
    runs and engines."""
    from ..pipelines.suite import CheckSuite, violation_examples
    from ..stages.base import RunContext
    from ..stages.row_checks import IntervalCheck, RegexCheck

    ds = _read(sf_dir, "events", ["event_id", "value", "event_type"])
    suite = CheckSuite(
        [IntervalCheck("value", min=0, max=95),
         RegexCheck("event_type", r"^(click|view|purchase|signup)$")],
        RunContext(row_ref_col="event_id"),
    )
    out = violation_examples(suite.run(ds).violations, k=3)
    return _materialize(out).select(["check_id", "row_ref", "kind",
                                     "pick"])


SQL_VIOLATION_EXAMPLES = """
WITH v AS (
  SELECT 'interval(value,0,95)' AS check_id,
         CAST(event_id AS VARCHAR) AS row_ref,
         CASE WHEN value IS NULL THEN 'invalid'
              ELSE 'deviation' END AS kind
  FROM events WHERE value < 0 OR value > 95 OR value IS NULL
  UNION ALL
  SELECT 'regex(event_type,' || chr(39)
           || '^(click|view|purchase|signup)$' || chr(39) || ')',
         CAST(event_id AS VARCHAR), 'invalid'
  FROM events WHERE NOT regexp_matches(event_type,
                                       '^(click|view|purchase|signup)$')
),
p AS (
  SELECT check_id, row_ref, kind,
         CAST(('0x' || substr(md5(row_ref || '|' || kind), 1, 15))
              AS BIGINT) AS pick
  FROM v
),
r AS (SELECT *, row_number() OVER (PARTITION BY check_id
                                   ORDER BY pick ASC) AS rn FROM p)
SELECT check_id, row_ref, kind, pick FROM r WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# Association lift (stages/basket.py :: pair_lift)
# ---------------------------------------------------------------------------


def q_pair_lift_parts(sf_dir: str):
    from ..stages.basket import pair_lift

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    return _materialize(
        pair_lift(ds, by="l_orderkey", item_col="l_partkey", min_n=3),
        empty_schema=pa.schema([("item_a", pa.int64()),
                                ("item_b", pa.int64()),
                                ("n", pa.int64()),
                                ("lift", pa.float64())]))


SQL_PAIR_LIFT_PARTS = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
nb AS (SELECT count(DISTINCT l_orderkey) AS t FROM d),
ic AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_item
       FROM d GROUP BY 1),
p AS (
  SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
         CAST(count(*) AS BIGINT) AS n
  FROM d a JOIN d b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 3
)
SELECT p.item_a, p.item_b, p.n,
       p.n * CAST(nb.t AS DOUBLE) / (ia.n_item * ib.n_item) AS lift
FROM p
JOIN ic ia ON p.item_a = ia.l_partkey
JOIN ic ib ON p.item_b = ib.l_partkey
CROSS JOIN nb
"""


# ---------------------------------------------------------------------------
# Peak concurrency sweep (stages/seq.py :: peak_concurrency)
# ---------------------------------------------------------------------------


def q_peak_active_users(sf_dir: str):
    """Peak number of simultaneously-active users, where each user's
    daily activity interval is [min ts, max ts] of that user-day —
    the interval-overlap sweep (end-exclusive boundaries, two-level
    prefix scan; no global sort materialization)."""
    from ray.data.aggregate import Max, Min

    from ..stages.seq import peak_concurrency

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def to_day(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")),
                     pa.int64())
        day = pc.divide(us, 86_400_000_000)
        return pa.table({"user_id": t.column("user_id"),
                         "day": day, "us": us})

    spans = ds.map_batches(to_day, batch_format="pyarrow",
                           zero_copy_batch=True).groupby(
        ["user_id", "day"]).aggregate(Min("us", alias_name="s_us"),
                                      Max("us", alias_name="e_us"))

    def to_ts(t: pa.Table) -> pa.Table:
        return pa.table({
            "s": t.column("s_us").cast(pa.timestamp("us")),
            "e": t.column("e_us").cast(pa.timestamp("us")),
        })

    iv = spans.map_batches(to_ts, batch_format="pyarrow",
                           zero_copy_batch=True)
    return peak_concurrency(iv, start_col="s", end_col="e")


SQL_PEAK_ACTIVE_USERS = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         min(epoch_us(ts)) AS s, max(epoch_us(ts)) AS e
  FROM events GROUP BY 1, 2
),
b AS (
  SELECT s AS t, 1 AS d FROM iv
  UNION ALL
  SELECT e AS t, -1 AS d FROM iv
),
r AS (SELECT sum(d) OVER (ORDER BY t, d
                          ROWS UNBOUNDED PRECEDING) AS run FROM b)
SELECT CAST(max(run) AS BIGINT) AS peak,
       (SELECT CAST(count(*) AS BIGINT) FROM iv) AS n_intervals
FROM r
"""


# ---------------------------------------------------------------------------
# Image quality scoring (stages/imaging.py :: image_quality_scores)
# ---------------------------------------------------------------------------


def q_image_quality_profile(sf_dir: str):
    """rows-only by design (pure-python codec + pixel kernels are not
    SQL-expressible): decode the seeded image fixture, score sharpness
    (Laplacian variance) and contrast, and summarize — the blurry/flat
    image filter signals.  Metric parity is pinned in
    tests/test_imaging_dhash.py."""
    import os
    import re

    import numpy as np

    from ..sources.images import ImageFixtureSpec, generate_dataset
    from ..stages.imaging import image_quality_scores

    base = os.path.basename(os.path.normpath(sf_dir))
    m = re.search(r"sf(\d+(?:\.\d+)?)", base)
    sf = float(m.group(1)) if m else 0.001
    spec = ImageFixtureSpec(n_rows=max(1000, int(100_000 * sf)),
                            seed=42, rows_per_part=2048)
    images = generate_dataset(spec, columns={"image_id", "bytes", "fmt"})
    scores = image_quality_scores(images)
    t = _materialize(scores)
    sharp = t.column("sharpness").to_numpy(zero_copy_only=False)
    contr = t.column("contrast").to_numpy(zero_copy_only=False)
    ok = ~np.isnan(sharp)
    return pa.table({
        "n_images": pa.array([t.num_rows], pa.int64()),
        "n_decoded": pa.array([int(ok.sum())], pa.int64()),
        "mean_sharpness": pa.array(
            [round(float(np.sort(sharp[ok]).sum() / max(ok.sum(), 1)), 4)],
            pa.float64()),
        "n_low_contrast": pa.array(
            [int((contr[ok] < 10.0).sum())], pa.int64()),
    })


# ---------------------------------------------------------------------------
# Golden-record survivorship merge (stages/dedup.py :: golden_record)
# ---------------------------------------------------------------------------


def q_golden_record_users(sf_dir: str):
    """MDM survivorship: per user, each column independently keeps its
    latest NON-NULL value (value and event_type may come from
    different rows when the newest row is partial)."""
    from ..stages.dedup import golden_record

    ds = _read(sf_dir, "events",
               ["user_id", "ts", "event_id", "value", "event_type"])
    return _materialize(golden_record(
        ds, key_col="user_id", order_col="ts", id_col="event_id",
        value_cols=["value", "event_type"]))


SQL_GOLDEN_RECORD_USERS = """
SELECT user_id,
       first(value ORDER BY ts DESC, event_id DESC)
         FILTER (WHERE value IS NOT NULL) AS value,
       first(event_type ORDER BY ts DESC, event_id DESC)
         FILTER (WHERE event_type IS NOT NULL) AS event_type
FROM events GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Gini concentration per group (stages/robust.py :: gini_by_group)
# ---------------------------------------------------------------------------


def q_gini_priority_price(sf_dir: str):
    """Revenue-concentration audit: Gini coefficient of order value per
    priority class, computed distributed via the bucket+prefix
    rank-weighted sum (integer-cents units -> bit-identical to the SQL
    window formula)."""
    from ..stages.robust import gini_by_group

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    return _materialize(gini_by_group(
        ds, by="o_orderpriority", value_col="o_totalprice", decimals=2))


SQL_GINI_PRIORITY_PRICE = """
WITH x AS (
  SELECT o_orderpriority AS g,
         CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DOUBLE) AS v
  FROM orders WHERE o_totalprice IS NOT NULL
),
r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS i
      FROM x),
a AS (SELECT g, sum(i * v) AS rw, sum(v) AS s,
             CAST(count(*) AS DOUBLE) AS n
      FROM r GROUP BY g)
SELECT g AS o_orderpriority,
       2.0 * rw / (n * s) - (n + 1.0) / n AS gini,
       CAST(n AS BIGINT) AS n
FROM a
"""


# ---------------------------------------------------------------------------
# RAG chunk planning + blocklist audit (stages/text.py)
# ---------------------------------------------------------------------------


def q_chunk_plan_docs(sf_dir: str):
    from ..stages.text import chunk_plan

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _materialize(chunk_plan(ds, "text", "doc_id",
                                   size=16, overlap=4))


SQL_CHUNK_PLAN_DOCS = r"""
WITH tok AS (
  SELECT doc_id,
         CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) = '' THEN 0
              ELSE len(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\s+')) END AS nt
  FROM documents
),
c AS (
  SELECT doc_id, nt,
         greatest((nt + 11) // 12, CASE WHEN nt > 0 THEN 1 ELSE 0 END)
           AS n_chunks
  FROM tok
)
SELECT doc_id,
       CAST(g.i AS BIGINT) AS chunk_id,
       CAST(g.i * 12 AS BIGINT) AS tok_start,
       CAST(least(g.i * 12 + 16, nt) AS BIGINT) AS tok_end,
       CAST(least(g.i * 12 + 16, nt) - g.i * 12 AS BIGINT) AS n_tokens
FROM c, LATERAL unnest(range(n_chunks)) AS g(i)
"""


def q_blocklist_docs(sf_dir: str):
    """Safety/compliance pass: distinct blocklist-term hits per doc
    (exact lowercase token match; term list broadcast via closure)."""
    from ..stages.text import blocklist_scan

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _materialize(blocklist_scan(
        ds, "text", "doc_id", terms=["slow", "error", "spark"]))


SQL_BLOCKLIST_DOCS = r"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) = '' THEN []::VARCHAR[]
              ELSE string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\s+') END AS ts
  FROM documents
)
SELECT doc_id,
       CAST(CAST(list_contains(ts, 'slow') AS INT)
            + CAST(list_contains(ts, 'error') AS INT)
            + CAST(list_contains(ts, 'spark') AS INT) AS BIGINT)
         AS n_terms_hit,
       list_contains(ts, 'slow') OR list_contains(ts, 'error')
         OR list_contains(ts, 'spark') AS flagged
FROM t
"""


def q_benford_price(sf_dir: str):
    """Benford first-digit screen over l_extendedprice (digit derived
    from the decimal string of floor(value) on BOTH engines — no
    float-log10 boundary can split them)."""
    from ..stages.profile import benford_digits

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    return _materialize(benford_digits(ds, "l_extendedprice"))


SQL_BENFORD_PRICE = """
WITH d AS (
  SELECT substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR),
                1, 1) AS digit
  FROM lineitem
  WHERE l_extendedprice >= 1
),
c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM c)
SELECT digit, n,
       CAST(n AS DOUBLE) / tot AS share,
       log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS expected_share,
       CAST(n AS DOUBLE) / tot
         - log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS excess
FROM c, t
"""


def q_entropy_user_events(sf_dir: str):
    """Per-user behavioral diversity: Shannon entropy of the
    event-type mix, computed distributed via H = ln(n) - (sum c ln c)/n
    (two Sum aggregates, no per-group kernel)."""
    from ..stages.profile import group_entropy

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return _materialize(group_entropy(ds, "user_id", "event_type"))


SQL_ENTROPY_USER_EVENTS = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS c
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
g AS (
  SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS n_cats,
         sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS slc
  FROM c GROUP BY 1
)
SELECT CAST(user_id AS VARCHAR) AS key, n, n_cats,
       round(ln(CAST(n AS DOUBLE)) - slc / CAST(n AS DOUBLE), 6) AS entropy
FROM g
"""


def q_triangles_dupgraph(sf_dir: str):
    """Triangle census of the document near-dup pair graph (exact
    3-gram Jaccard >= 0.5): node/edge/wedge counts, min-oriented exact
    triangle count, transitivity 3T/W — the cluster-quality audit that
    says whether "near-duplicate" behaves transitively on this corpus
    (high transitivity -> keep-one-per-cluster is safe; low -> chains
    of marginal pairs are being glued).  All counts exact integers;
    transitivity one exact quotient.

    A co-occurrence projection (stages/graph.py::projected_edges) also
    feeds this census, but NOT as a driver query: on the synthetic
    tables such projections are near-complete graphs and the census is
    Θ(n³) by construction — the dup graph is the sparse real use."""
    from ..stages.dedup import jaccard_pairs_exact
    from ..stages.graph import triangle_stats

    pairs = jaccard_pairs_exact(
        _read(sf_dir, "documents", ["doc_id", "text"]), "text", "doc_id",
        n=3, threshold=0.5, shuffle_partitions=8)
    return triangle_stats(pairs, a_col="a", b_col="b")


SQL_TRIANGLES_DUPGRAPH = r"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\s+') AS ts
  FROM documents
),
sh AS (
  SELECT doc_id, list_distinct(list_transform(
           generate_series(1, len(ts) - 2),
           i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s
  FROM tok
),
e AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s, b.s))::DOUBLE
        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
),
d AS (
  SELECT node, count(*) AS d
  FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
  GROUP BY 1
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(coalesce(sum(d * (d - 1) // 2), 0) AS BIGINT) AS n_wedges
  FROM d
),
t AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM e e1
  JOIN e e2 ON e2.u = e1.u AND e1.v < e2.v
  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
),
en AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
SELECT n_nodes, n_edges, n_wedges, n_triangles,
       CASE WHEN n_wedges > 0
            THEN 3.0 * n_triangles / n_wedges END AS transitivity
FROM m, t, en
"""


QUERIES2: Dict[str, Callable] = {
    "benford_lineitem": q_benford_price,
    "triangles_dupgraph": q_triangles_dupgraph,
    "entropy_user_events": q_entropy_user_events,
    "monotonic_user_value": q_monotonic_user_value,
    "freshness_users": q_freshness_users,
    "unique_composite_events": q_unique_composite_events,
    "full_outer_nation_activity": q_full_outer_nation_activity,
    "dedup_best_rep": q_dedup_best_rep,
    "text_charset": q_text_charset,
    "cramers_v_orders": q_cramers_v_orders,
    "image_dhash_clusters": q_image_dhash_clusters,
    "group_size_users": q_group_size_users,
    "accepted_percent_quantity": q_accepted_percent_quantity,
    "partition_verdicts": q_partition_verdicts,
    "schema_tighten_lineitem": q_schema_tighten_lineitem,
    "compare_customer_ref": q_compare_customer_ref,
    "seq_contig_lineitem": q_seq_contig_lineitem,
    "ship_after_order": q_ship_after_order,
    "latest_event_state": q_latest_event_state,
    "checksum_reconcile_customer": q_checksum_reconcile_customer,
    "silhouette_labels": q_silhouette_labels,
    "cardinality_lineitem": q_cardinality_lineitem,
    "twa_user_value": q_twa_user_value,
    "ann_recall_report": q_ann_recall_report,
    "sample_token_budget": q_sample_token_budget,
    "k_anonymity_customer": q_k_anonymity_customer,
    "sentinel_values_orders": q_sentinel_values_orders,
    "ks_exact_price": q_ks_exact_price,
    "violation_examples": q_violation_examples,
    "pair_lift_parts": q_pair_lift_parts,
    "peak_active_users": q_peak_active_users,
    "image_quality_profile": q_image_quality_profile,
    "golden_record_users": q_golden_record_users,
    "gini_priority_price": q_gini_priority_price,
    "chunk_plan_docs": q_chunk_plan_docs,
    "blocklist_docs": q_blocklist_docs,
}

SQL2: Dict[str, str] = {
    "benford_lineitem": SQL_BENFORD_PRICE,
    "triangles_dupgraph": SQL_TRIANGLES_DUPGRAPH,
    "entropy_user_events": SQL_ENTROPY_USER_EVENTS,
    "monotonic_user_value": SQL_MONOTONIC_USER_VALUE,
    "freshness_users": SQL_FRESHNESS_USERS,
    "unique_composite_events": SQL_UNIQUE_COMPOSITE_EVENTS,
    "full_outer_nation_activity": SQL_FULL_OUTER_NATION_ACTIVITY,
    "dedup_best_rep": SQL_DEDUP_BEST_REP,
    "text_charset": SQL_TEXT_CHARSET,
    "cramers_v_orders": SQL_CRAMERS_V_ORDERS,
    "group_size_users": SQL_GROUP_SIZE_USERS,
    "accepted_percent_quantity": SQL_ACCEPTED_PERCENT_QUANTITY,
    "partition_verdicts": SQL_PARTITION_VERDICTS,
    "schema_tighten_lineitem": SQL_SCHEMA_TIGHTEN_LINEITEM,
    "compare_customer_ref": SQL_COMPARE_CUSTOMER_REF,
    "seq_contig_lineitem": SQL_SEQ_CONTIG_LINEITEM,
    "ship_after_order": SQL_SHIP_AFTER_ORDER,
    "latest_event_state": SQL_LATEST_EVENT_STATE,
    "checksum_reconcile_customer": SQL_CHECKSUM_RECONCILE_CUSTOMER,
    "silhouette_labels": SQL_SILHOUETTE_LABELS,
    "cardinality_lineitem": SQL_CARDINALITY_LINEITEM,
    "twa_user_value": SQL_TWA_USER_VALUE,
    "sample_token_budget": SQL_SAMPLE_TOKEN_BUDGET,
    "k_anonymity_customer": SQL_K_ANONYMITY_CUSTOMER,
    "sentinel_values_orders": SQL_SENTINEL_VALUES_ORDERS,
    "ks_exact_price": SQL_KS_EXACT_PRICE,
    "violation_examples": SQL_VIOLATION_EXAMPLES,
    "pair_lift_parts": SQL_PAIR_LIFT_PARTS,
    "peak_active_users": SQL_PEAK_ACTIVE_USERS,
    "golden_record_users": SQL_GOLDEN_RECORD_USERS,
    "gini_priority_price": SQL_GINI_PRIORITY_PRICE,
    "chunk_plan_docs": SQL_CHUNK_PLAN_DOCS,
    "blocklist_docs": SQL_BLOCKLIST_DOCS,
}
