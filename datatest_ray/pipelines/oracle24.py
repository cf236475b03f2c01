"""Driver-contract queries, batch 24 (see oracle.py for the contract):
the remaining acceptance-algebra forms under the DuckDB oracle —
``accepted.keys`` (E5, per-key acceptance on mapping-shaped
violations) and the ``tolerance & percent`` intersection (E12, both
sides must accept).  Both are stateless predicates, so the SQL mirror
is a plain WHERE clause; no consume-order machinery needed.
Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def q_accepted_keys_mean_qty(sf_dir: str):
    """``accepted.keys({'A'})`` over per-flag mean-quantity violations
    (E5): bounds are set so every l_returnflag group violates, then
    the acceptance waives the 'A' group per key — leftover = the other
    groups' deviation rows."""
    from ..pipelines.acceptance import accepted
    from ..stages.base import RunContext
    from ..stages.mapping import GroupAggCheck
    from .suite import CheckSuite

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    t = CheckSuite(
        [GroupAggCheck("l_quantity", "l_returnflag", "mean", min=40.0)],
        RunContext()).run(ds).to_table()
    remaining = accepted.keys({"A"}).filter_violations(t)
    return remaining.select(["key", "value_num", "expected_num",
                             "deviation", "kind"])


SQL_ACCEPTED_KEYS_MEAN_QTY = """
SELECT l_returnflag AS key, avg(l_quantity) AS value_num,
       40.0 AS expected_num,
       avg(l_quantity) - 40.0 AS deviation,
       'deviation' AS kind
FROM lineitem GROUP BY l_returnflag
HAVING avg(l_quantity) < 40.0 AND l_returnflag NOT IN ('A')
"""


def q_accepted_intersect_tol_pct(sf_dir: str):
    """``accepted.tolerance(10) & accepted.percent(0.25)`` (E12) over
    l_quantity interval violations: a deviation is waived only when it
    is BOTH within +/-10 absolute AND within 25% of the violated
    bound — leftover = rows failing either arm."""
    from ..pipelines.acceptance import accepted
    from ..stages.base import RunContext
    from ..stages.row_checks import IntervalCheck
    from .suite import CheckSuite

    ds = _read(sf_dir, "lineitem", ["l_quantity"])
    t = CheckSuite([IntervalCheck("l_quantity", min=1, max=30)],
                   RunContext()).run(ds).to_table()
    acc = accepted.tolerance(10) & accepted.percent(0.25)
    remaining = acc.filter_violations(t)
    return remaining.select(["value_num", "deviation", "kind"])


SQL_ACCEPTED_INTERSECT_TOL_PCT = """
WITH v AS (
  SELECT CAST(l_quantity AS DOUBLE) AS value_num,
         CAST(l_quantity AS DOUBLE)
           - (CASE WHEN l_quantity < 1 THEN 1 ELSE 30 END) AS deviation,
         (CASE WHEN l_quantity < 1 THEN 1.0 ELSE 30.0 END) AS expected_num,
         'deviation' AS kind
  FROM lineitem WHERE l_quantity < 1 OR l_quantity > 30)
SELECT value_num, deviation, kind FROM v
WHERE NOT (abs(deviation) <= 10
           AND abs(deviation / expected_num) <= 0.25)
"""


QUERIES24: Dict[str, Callable] = {
    "accepted_keys_mean_qty": q_accepted_keys_mean_qty,
    "accepted_intersect_tol_pct": q_accepted_intersect_tol_pct,
}

SQL24: Dict[str, str] = {
    "accepted_keys_mean_qty": SQL_ACCEPTED_KEYS_MEAN_QTY,
    "accepted_intersect_tol_pct": SQL_ACCEPTED_INTERSECT_TOL_PCT,
}
