"""Driver-contract queries, batch 64 (see oracle.py for the contract):
hash-seeded permutation test, Mantel-Haenszel pooled odds ratio across
day-of-week strata, and deterministic systematic PPS sampling.
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


def q_perm_test_value(sf_dir: str):
    """Hash-seeded permutation test: click vs purchase mean value
    (stages/stattests.py :: perm_test_two_sample)."""
    from ..stages.stattests import perm_test_two_sample

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    return _materialize(perm_test_two_sample(
        ev, value_col="value", group_col="event_type",
        id_col="event_id", a="click", b="purchase", n_perm=200))


SQL_PERM_TEST_VALUE = """
WITH reps AS (SELECT unnest(range(200)) AS r),
f AS (
  SELECT event_id AS id, CAST(round(value * 100) AS BIGINT) AS c,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS isa
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
    AND event_id IS NOT NULL),
obs AS (
  SELECT CAST(sum(CASE WHEN isa = 1 THEN c ELSE 0 END) AS BIGINT)
           AS osa,
         CAST(sum(isa) AS BIGINT) AS ona,
         CAST(sum(CASE WHEN isa = 0 THEN c ELSE 0 END) AS BIGINT)
           AS osb,
         CAST(sum(1 - isa) AS BIGINT) AS onb
  FROM f),
w AS (
  SELECT r, ((id * 2654435761 + r * 40503) % 2147483648) % 2 AS side,
         c
  FROM f CROSS JOIN reps),
m AS (
  SELECT r,
         CAST(sum(CASE WHEN side = 1 THEN c ELSE 0 END) AS BIGINT)
           AS sa,
         CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS na,
         CAST(sum(CASE WHEN side = 0 THEN c ELSE 0 END) AS BIGINT)
           AS sb,
         CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS nb
  FROM w GROUP BY r),
diffs AS (
  SELECT (CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb) / 100.0
           AS diff
  FROM m WHERE na > 0 AND nb > 0),
st AS (
  SELECT (CAST(osa AS DOUBLE) / ona - CAST(osb AS DOUBLE) / onb)
           / 100.0 AS obs_diff,
         ona, onb
  FROM obs WHERE ona > 0 AND onb > 0),
cnt AS (
  SELECT CAST(count(*) AS BIGINT) AS b,
         CAST(sum(CASE WHEN abs(diffs.diff) >= abs(st.obs_diff)
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_ge
  FROM diffs, st)
SELECT st.ona AS n_a, st.onb AS n_b,
       round(st.obs_diff, 6) AS obs_diff,
       cnt.b, cnt.n_ge,
       round((1 + cnt.n_ge) / (cnt.b + 1.0), 6) AS p
FROM st, cnt
"""


def q_mantel_haenszel_events(sf_dir: str):
    """Mantel-Haenszel odds ratio of (value > 50) for purchase
    across day-of-week strata
    (stages/stattests.py :: mantel_haenszel)."""
    from ..stages.stattests import mantel_haenszel

    ev = _read(sf_dir, "events", ["event_type", "value", "ts"])

    def strata(t: pa.Table):
        us = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")),
                     pa.int64())
        import numpy as np

        day = pc.cast(pc.floor(pc.divide(pc.cast(us, pa.float64()),
                                         86400e6)), pa.int64())
        return pc.cast(
            pc.subtract(day, pc.multiply(pc.divide(day, 7),
                                         pa.scalar(7))), pa.int64())

    # null ts yields a null stratum, which mantel_haenszel drops
    return _materialize(mantel_haenszel(
        ev,
        strata_expr=strata,
        exposure_expr=lambda t: pc.fill_null(
            pc.greater(t.column("value"), 50.0), False),
        outcome_expr=lambda t: pc.fill_null(
            pc.equal(t.column("event_type"), "purchase"), False)))


SQL_MANTEL_HAENSZEL_EVENTS = """
WITH f AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7 AS s,
         CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS e,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS o
  FROM events WHERE ts IS NOT NULL),
ct AS (
  SELECT s,
         CAST(sum(e * o) AS BIGINT) AS a,
         CAST(sum(e * (1 - o)) AS BIGINT) AS b,
         CAST(sum((1 - e) * o) AS BIGINT) AS c,
         CAST(sum((1 - e) * (1 - o)) AS BIGINT) AS d
  FROM f GROUP BY s),
agg AS (
  SELECT CAST(sum(a + b + c + d) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS n_strata,
         CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb,
         CAST(sum(c) AS BIGINT) AS tc, CAST(sum(d) AS BIGINT) AS td,
         sum(a * d / CAST(a + b + c + d AS DOUBLE)) AS num,
         sum(b * c / CAST(a + b + c + d AS DOUBLE)) AS den
  FROM ct)
SELECT n, n_strata,
       CASE WHEN tb > 0 AND tc > 0
            THEN round((ta * td) / (CAST(tb AS DOUBLE) * tc), 6)
       END AS or_crude,
       CASE WHEN den > 0 THEN round(num / den, 6) END AS or_mh
FROM agg
"""


def q_pps_customers(sf_dir: str):
    """Systematic PPS draw of 20 customers weighted by (positive)
    account balance (stages/sampling.py :: pps_systematic)."""
    from ..stages.sampling import pps_systematic

    cu = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    return _materialize(pps_systematic(
        cu, key_col="c_custkey", weight_col="c_acctbal", k=20))


SQL_PPS_CUSTOMERS = """
WITH f AS (
  SELECT c_custkey AS k, CAST(round(c_acctbal * 100) AS BIGINT) AS w
  FROM customer
  WHERE c_custkey IS NOT NULL AND c_acctbal IS NOT NULL),
g AS (SELECT k, CAST(sum(w) AS BIGINT) AS w FROM f GROUP BY k),
pos AS (
  SELECT k, w, CAST(sum(w) OVER (ORDER BY k) AS BIGINT) AS cum
  FROM g WHERE w > 0),
tot AS (SELECT CAST(sum(w) AS BIGINT) AS t FROM g WHERE w > 0),
draws AS (SELECT unnest(range(20)) AS i),
sel AS (
  SELECT draws.i, min(pos.k) AS k
  FROM draws
  CROSS JOIN tot
  JOIN pos ON 40 * pos.cum >= (2 * draws.i + 1) * tot.t
  GROUP BY draws.i)
SELECT sel.i AS draw, sel.k AS c_custkey,
       round(pos.w / 100.0, 6) AS weight
FROM sel JOIN pos ON pos.k = sel.k
"""


QUERIES64: Dict[str, Callable] = {
    "perm_test_value": q_perm_test_value,
    "mantel_haenszel_events": q_mantel_haenszel_events,
    "pps_customers": q_pps_customers,
}

SQL64: Dict[str, str] = {
    "perm_test_value": SQL_PERM_TEST_VALUE,
    "mantel_haenszel_events": SQL_MANTEL_HAENSZEL_EVENTS,
    "pps_customers": SQL_PPS_CUSTOMERS,
}
