"""Driver-contract queries, batch 23 (see oracle.py for the contract):
quota-bearing acceptance algebra under the DuckDB oracle — the two
E-table forms that were previously unit-test-only because they depend
on the deterministic consume ORDER, now mirrored in SQL via the same
(check, partition, row_ref, value-string) ordering the engine sorts by:
``accepted.count(n)`` (E10) and the ``tolerance | count`` union (E11,
a-consumes-first short-circuit).
Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _interval_quantity_violations(sf_dir: str):
    from ..stages.base import RunContext
    from ..stages.row_checks import IntervalCheck
    from .suite import CheckSuite

    ds = _read(sf_dir, "lineitem", ["l_quantity"])
    return CheckSuite([IntervalCheck("l_quantity", min=1, max=30)],
                      RunContext()).run(ds).to_table()


def q_accepted_count_quantity(sf_dir: str):
    """``accepted.count(500)`` over l_quantity interval violations —
    the global violation BUDGET (E10): the first 500 differences in
    the engine's deterministic consume order (check, partition,
    row_ref, stringified value) are consumed, the rest re-raise.  The
    SQL oracle reproduces the same order with ``row_number() OVER
    (ORDER BY CAST(value AS VARCHAR))`` — single check + single
    partition + null row_ref here, so the value string IS the order."""
    from ..pipelines.acceptance import accepted

    remaining = accepted.count(500).filter_violations(
        _interval_quantity_violations(sf_dir))
    return remaining.select(["value_num", "deviation", "kind"])


SQL_ACCEPTED_COUNT_QUANTITY = """
WITH v AS (
  SELECT CAST(l_quantity AS DOUBLE) AS value_num,
         CAST(l_quantity AS DOUBLE)
           - (CASE WHEN l_quantity < 1 THEN 1 ELSE 30 END) AS deviation,
         'deviation' AS kind,
         row_number() OVER (
           ORDER BY CAST(CAST(l_quantity AS DOUBLE) AS VARCHAR)) AS rn
  FROM lineitem WHERE l_quantity < 1 OR l_quantity > 30)
SELECT value_num, deviation, kind FROM v WHERE rn > 500
"""


def q_accepted_union_tol_count(sf_dir: str):
    """``accepted.tolerance(5) | accepted.count(500)`` (E11): union
    consults the left side FIRST, so the count quota is consumed only
    by differences the tolerance rejects — the SQL mirror ranks only
    the |deviation| > 5 rows in the same value-string consume order."""
    from ..pipelines.acceptance import accepted

    acc = accepted.tolerance(5) | accepted.count(500)
    remaining = acc.filter_violations(
        _interval_quantity_violations(sf_dir))
    return remaining.select(["value_num", "deviation", "kind"])


SQL_ACCEPTED_UNION_TOL_COUNT = """
WITH v AS (
  SELECT CAST(l_quantity AS DOUBLE) AS value_num,
         CAST(l_quantity AS DOUBLE)
           - (CASE WHEN l_quantity < 1 THEN 1 ELSE 30 END) AS deviation,
         'deviation' AS kind
  FROM lineitem WHERE l_quantity < 1 OR l_quantity > 30),
rej AS (
  SELECT *, row_number() OVER (
    ORDER BY CAST(value_num AS VARCHAR)) AS rn
  FROM v WHERE abs(deviation) > 5)
SELECT value_num, deviation, kind FROM rej WHERE rn > 500
"""


QUERIES23: Dict[str, Callable] = {
    "accepted_count_quantity": q_accepted_count_quantity,
    "accepted_union_tol_count": q_accepted_union_tol_count,
}

SQL23: Dict[str, str] = {
    "accepted_count_quantity": SQL_ACCEPTED_COUNT_QUANTITY,
    "accepted_union_tol_count": SQL_ACCEPTED_UNION_TOL_COUNT,
}
