"""Driver-contract queries, batch 58 (see oracle.py for the contract):
Borda-count + Copeland voting fusion of per-returnflag brand revenue
ballots, Page-Hinkley drift statistics, and the one-way intraclass
correlation.  Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

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


def q_voting_brands(sf_dir: str):
    """Borda + Copeland over brand-revenue ballots: each returnflag
    'voter' ranks every p_brand by cents-exact revenue
    (stages/alloc.py :: borda_copeland; many-to-one attach via
    stages/relational.py :: lookup_join)."""
    from ray.data.aggregate import Sum

    from ..stages.alloc import borda_copeland
    from ..stages.relational import lookup_join

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_returnflag", "l_extendedprice",
                "l_discount"])
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"])
    joined = lookup_join(li, part, on="l_partkey",
                         right_on="p_partkey", right_cols=["p_brand"])

    def units(t: pa.Table) -> pa.Table:
        rev = pc.cast(pc.round(pc.multiply(pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount"))),
            100.0)), pa.int64())
        return pa.table({"v": t.column("l_returnflag"),
                         "c": t.column("p_brand"), "rev": rev})

    agg = joined.map_batches(
        units, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(["v", "c"]).aggregate(Sum("rev", alias_name="s"))
    out = borda_copeland(agg, voter_col="v", cand_col="c",
                         score_col="s")

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["p_brand", "borda", "copeland"])

    return _materialize(out.map_batches(
        rename, batch_format="pyarrow", zero_copy_batch=True))


SQL_VOTING_BRANDS = """
WITH rev AS (
  SELECT l.l_returnflag AS v, p.p_brand AS c,
         CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
                             * 100) AS BIGINT)) AS BIGINT) AS s
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2),
voters AS (SELECT DISTINCT v FROM rev),
cands AS (SELECT DISTINCT c FROM rev),
full_b AS (
  SELECT voters.v, cands.c, coalesce(rev.s, 0) AS s
  FROM voters CROSS JOIN cands
  LEFT JOIN rev ON rev.v = voters.v AND rev.c = cands.c),
rk AS (
  SELECT v, c,
         CAST(row_number() OVER (PARTITION BY v ORDER BY s DESC, c)
              AS BIGINT) AS r,
         CAST(count(*) OVER (PARTITION BY v) AS BIGINT) AS k
  FROM full_b),
borda AS (SELECT c, CAST(sum(k - r) AS BIGINT) AS borda
          FROM rk GROUP BY c),
pair AS (
  SELECT a.c AS ca, b.c AS cb,
         CAST(sum(CASE WHEN a.s > b.s THEN 1 ELSE 0 END) AS BIGINT)
           AS wins,
         CAST(sum(CASE WHEN a.s < b.s THEN 1 ELSE 0 END) AS BIGINT)
           AS losses,
         CAST(count(*) AS BIGINT) AS nv
  FROM full_b a JOIN full_b b ON a.v = b.v AND a.c <> b.c
  GROUP BY 1, 2),
cop AS (
  SELECT ca AS c,
         CAST(sum(CASE WHEN wins > nv / 2.0 THEN 1 ELSE 0 END)
              - sum(CASE WHEN losses > nv / 2.0 THEN 1 ELSE 0 END)
              AS BIGINT) AS copeland
  FROM pair GROUP BY 1)
SELECT borda.c AS p_brand, borda.borda, cop.copeland
FROM borda JOIN cop ON cop.c = borda.c
"""


def q_page_hinkley_events(sf_dir: str):
    """Page-Hinkley up/down drift statistics per event type over daily
    counts (stages/temporal.py :: page_hinkley_daily)."""
    from ..stages.temporal import page_hinkley_daily

    return _materialize(page_hinkley_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type"))


SQL_PAGE_HINKLEY_EVENTS = """
WITH f AS (
  SELECT event_type AS g,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL),
daily AS (
  SELECT g, day, CAST(count(*) AS BIGINT) AS x
  FROM f GROUP BY 1, 2),
w AS (
  SELECT g, day, x,
         CAST(sum(x) OVER (PARTITION BY g ORDER BY day) AS BIGINT)
           AS cum,
         CAST(row_number() OVER (PARTITION BY g ORDER BY day)
              AS BIGINT) AS rn
  FROM daily),
dev AS (
  SELECT g, day, x - cum / CAST(rn AS DOUBLE) AS d
  FROM w),
m AS (
  SELECT g, day,
         sum(d) OVER (PARTITION BY g ORDER BY day) AS m
  FROM dev),
r AS (
  SELECT g, m,
         min(m) OVER (PARTITION BY g ORDER BY day) AS runmin,
         max(m) OVER (PARTITION BY g ORDER BY day) AS runmax
  FROM m)
SELECT g AS event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       round(max(m - runmin), 6) AS ph_up,
       round(max(runmax - m), 6) AS ph_down
FROM r GROUP BY g
"""


def q_icc_user_value(sf_dir: str):
    """One-way ICC(1) of events.value clustered by user
    (stages/stattests.py :: icc_oneway)."""
    from ..stages.stattests import icc_oneway

    return _materialize(icc_oneway(
        _read(sf_dir, "events", ["user_id", "value"]),
        group_col="user_id", value_col="value"))


SQL_ICC_USER_VALUE = """
WITH f AS (
  SELECT user_id AS g, CAST(round(value * 100) AS BIGINT) AS u
  FROM events
  WHERE user_id IS NOT NULL AND value IS NOT NULL),
a AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(u) AS BIGINT) AS s,
             CAST(sum(u * u) AS BIGINT) AS s2
      FROM f GROUP BY g),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS bn,
         CAST(count(*) AS BIGINT) AS ng,
         sum(CAST(s AS DOUBLE)) AS stot,
         sum(CAST(s AS DOUBLE) * s / n) AS ssbp,
         sum(CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n) AS ssw,
         sum(CAST(n AS DOUBLE) * n) AS sn2
  FROM a),
calc AS (
  SELECT bn, ng,
         (ssbp - stot * stot / bn) / (ng - 1) AS msb,
         ssw / (bn - ng) AS msw,
         (bn - sn2 / bn) / (ng - 1) AS k0
  FROM tot WHERE ng >= 2 AND bn > ng)
SELECT tot.bn AS n, tot.ng AS n_groups,
       CASE WHEN calc.msb + (calc.k0 - 1.0) * calc.msw <> 0
            THEN round((calc.msb - calc.msw)
                       / (calc.msb + (calc.k0 - 1.0) * calc.msw), 6)
       END AS icc
FROM tot LEFT JOIN calc ON calc.bn = tot.bn
"""


QUERIES58: Dict[str, Callable] = {
    "voting_brands": q_voting_brands,
    "page_hinkley_events": q_page_hinkley_events,
    "icc_user_value": q_icc_user_value,
}

SQL58: Dict[str, str] = {
    "voting_brands": SQL_VOTING_BRANDS,
    "page_hinkley_events": SQL_PAGE_HINKLEY_EVENTS,
    "icc_user_value": SQL_ICC_USER_VALUE,
}
