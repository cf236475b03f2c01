"""Driver-contract queries, batch 78 (see oracle.py for the contract):
day-of-week x hour independence chi-square and the Benford
second-digit audit.  Merged into ``oracle.queries()`` /
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


def q_chi2_dow_hour(sf_dir: str):
    """Chi-square independence of day-of-week vs hour-of-day over
    events -- 'is the daily rhythm the same every weekday'
    (stages/drift.py :: chi2_independence over derived calendar
    columns)."""
    from ..stages.drift import chi2_independence

    ev = _read(sf_dir, "events", ["ts"])

    def derive(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("ts")))
        us = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")),
                     pa.int64())
        day = pc.cast(pc.floor(pc.divide(pc.cast(us, pa.float64()),
                                         86400e6)), pa.int64())
        hour = pc.cast(pc.floor(pc.divide(pc.cast(us, pa.float64()),
                                          3600e6)), pa.int64())
        dow = pc.subtract(day, pc.multiply(
            pc.divide(day, 7), pa.scalar(7)))
        hod = pc.subtract(hour, pc.multiply(
            pc.divide(hour, 24), pa.scalar(24)))
        return pa.table({"dow": pc.cast(dow, pa.string()),
                         "hod": pc.cast(hod, pa.string())})

    derived = ev.map_batches(derive, batch_format="pyarrow",
                             zero_copy_batch=True)
    return _materialize(chi2_independence(derived, "dow", "hod"))


SQL_CHI2_DOW_HOUR = """
WITH f AS (
  SELECT CAST(CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7
              AS VARCHAR) AS a,
         CAST(CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24
              AS VARCHAR) AS b
  FROM events WHERE ts IS NOT NULL),
ct AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n
       FROM f GROUP BY 1, 2),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM ct),
ra  AS (SELECT a, CAST(sum(n) AS BIGINT) AS na FROM ct GROUP BY a),
rb  AS (SELECT b, CAST(sum(n) AS BIGINT) AS nb FROM ct GROUP BY b),
grid AS (SELECT ra.a, rb.b, ra.na, rb.nb FROM ra CROSS JOIN rb),
cells AS (
  SELECT g.a, g.b,
         coalesce(ct.n, 0) AS o,
         CAST(g.na AS DOUBLE) * g.nb / tot.n AS e
  FROM grid g
  LEFT JOIN ct ON ct.a = g.a AND ct.b = g.b, tot)
SELECT round(sum((o - e) * (o - e) / e), 6) AS chi2,
       CAST(((SELECT count(*) FROM ra) - 1)
            * ((SELECT count(*) FROM rb) - 1) AS BIGINT) AS dof,
       tot.n
FROM cells, tot
GROUP BY tot.n
"""


def q_benford2_price(sf_dir: str):
    """Benford SECOND-digit distribution of o_totalprice
    (stages/profile.py :: benford_second_digit)."""
    from ..stages.profile import benford_second_digit

    return _materialize(benford_second_digit(
        _read(sf_dir, "orders", ["o_totalprice"]), "o_totalprice"))


SQL_BENFORD2_PRICE = """
WITH digits AS (SELECT unnest(range(10)) AS d2),
exp_ AS (
  SELECT digits.d2,
         sum(log10(1.0 + 1.0 / (10 * d1.d1 + digits.d2))) AS e
  FROM digits
  CROSS JOIN (SELECT unnest(range(1, 10)) AS d1) d1
  GROUP BY digits.d2),
f AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                          AS VARCHAR), 2, 1) AS BIGINT) AS d2
  FROM orders
  WHERE o_totalprice IS NOT NULL AND o_totalprice >= 10),
obs AS (SELECT d2, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY d2),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM obs)
SELECT exp_.d2 AS digit,
       CAST(coalesce(obs.n, 0) AS BIGINT) AS n,
       round(coalesce(obs.n, 0) / CAST(tot.n AS DOUBLE), 6) AS share,
       round(exp_.e, 6) AS expected,
       round((coalesce(obs.n, 0) / CAST(tot.n AS DOUBLE) - exp_.e)
             * (coalesce(obs.n, 0) / CAST(tot.n AS DOUBLE) - exp_.e)
             / exp_.e, 6) AS chi2_term
FROM exp_ LEFT JOIN obs ON obs.d2 = exp_.d2, tot
"""


QUERIES78: Dict[str, Callable] = {
    "chi2_dow_hour": q_chi2_dow_hour,
    "benford2_price": q_benford2_price,
}

SQL78: Dict[str, str] = {
    "chi2_dow_hour": SQL_CHI2_DOW_HOUR,
    "benford2_price": SQL_BENFORD2_PRICE,
}
