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

import pyarrow as pa
import pyarrow.compute as pc

REGION_NAMES = {"AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"}
LANGS = {"en", "de", "zh", "fr", "es"}


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
       CASE WHEN l_discount < 0 THEN CAST(0 AS DOUBLE) ELSE CAST(0.05 AS DOUBLE) END AS expected_num,
       l_discount - (CASE WHEN l_discount < 0 THEN 0 ELSE 0.05 END) AS deviation,
       'deviation' AS kind
FROM lineitem
WHERE l_discount < 0 OR l_discount > 0.05
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
# Grouped aggregation (§2.H): shuffle groupby with built-in aggregates
# ---------------------------------------------------------------------------


def q_agg_returnflag(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])
    return ds.groupby("l_returnflag").aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("l_extendedprice", alias_name="sum_price"),
        Count(alias_name="n"),
    )


SQL_AGG_RETURNFLAG = """
SELECT l_returnflag, sum(l_quantity) AS sum_qty,
       sum(l_extendedprice) AS sum_price, count(*) AS n
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


def queries() -> Dict[str, Callable]:
    return {
        "interval_quantity": q_interval_quantity,
        "interval_discount": q_interval_discount,
        "regex_lang": q_regex_lang,
        "set_region": q_set_region,
        "unique_orderkey": q_unique_orderkey,
        "subset_nationkey_region": q_subset_nationkey_region,
        "subset_fk_customer_nation": q_subset_fk_customer_nation,
        "superset_lang": q_superset_lang,
        "agg_returnflag": q_agg_returnflag,
        "hist_price": q_hist_price,
    }


def oracle_sql() -> Dict[str, str]:
    return {
        "interval_quantity": SQL_INTERVAL_QUANTITY,
        "interval_discount": SQL_INTERVAL_DISCOUNT,
        "regex_lang": SQL_REGEX_LANG,
        "set_region": SQL_SET_REGION,
        "unique_orderkey": SQL_UNIQUE_ORDERKEY,
        "subset_nationkey_region": SQL_SUBSET_NATIONKEY_REGION,
        "subset_fk_customer_nation": SQL_SUBSET_FK_CUSTOMER_NATION,
        "superset_lang": SQL_SUPERSET_LANG,
        "agg_returnflag": SQL_AGG_RETURNFLAG,
        "hist_price": SQL_HIST_PRICE,
    }
