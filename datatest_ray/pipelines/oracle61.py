"""Driver-contract queries, batch 61 (see oracle.py for the contract):
Goodman-Kruskal lambda, cumulative-gains/lift decile table, Hurst R/S
exponent.  Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict

import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_gk_lambda_orders(sf_dir: str):
    """Goodman-Kruskal lambda between order priority and status
    (stages/mlprep.py :: gk_lambda)."""
    from ..stages.mlprep import gk_lambda

    return _materialize(gk_lambda(
        _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"]),
        row_col="o_orderpriority", col_col="o_orderstatus"))


SQL_GK_LAMBDA_ORDERS = """
WITH f AS (
  SELECT o_orderpriority AS r, o_orderstatus AS c
  FROM orders
  WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL),
ct AS (SELECT r, c, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY 1, 2),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM ct),
rowmax AS (SELECT CAST(sum(mx) AS BIGINT) AS s
           FROM (SELECT r, max(n) AS mx FROM ct GROUP BY r)),
colmax AS (SELECT CAST(sum(mx) AS BIGINT) AS s
           FROM (SELECT c, max(n) AS mx FROM ct GROUP BY c)),
margr AS (SELECT CAST(max(s) AS BIGINT) AS mx
          FROM (SELECT r, sum(n) AS s FROM ct GROUP BY r)),
margc AS (SELECT CAST(max(s) AS BIGINT) AS mx
          FROM (SELECT c, sum(n) AS s FROM ct GROUP BY c))
SELECT tot.n,
       CASE WHEN tot.n - margc.mx > 0
            THEN round(CAST(rowmax.s - margc.mx AS DOUBLE)
                       / (tot.n - margc.mx), 6)
       END AS lambda_col,
       CASE WHEN tot.n - margr.mx > 0
            THEN round(CAST(colmax.s - margr.mx AS DOUBLE)
                       / (tot.n - margr.mx), 6)
       END AS lambda_row
FROM tot, rowmax, colmax, margr, margc
"""


def q_gains_deciles_events(sf_dir: str):
    """Cumulative-gains/lift deciles of value as a purchase score
    (stages/mlprep.py :: gains_table)."""
    from ..stages.mlprep import gains_table

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    return _materialize(gains_table(
        ev, score_col="value", id_col="event_id",
        label_expr=lambda t: pc.equal(t.column("event_type"),
                                      "purchase"),
        k=10))


SQL_GAINS_DECILES_EVENTS = """
WITH f AS (
  SELECT value AS s, event_id AS id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS p FROM f),
tiles AS (
  SELECT CAST(ntile(10) OVER (ORDER BY s DESC, id) AS BIGINT) AS tile,
         y
  FROM f),
agg AS (
  SELECT tile, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS pos
  FROM tiles GROUP BY tile),
w AS (
  SELECT tile, n, pos,
         CAST(sum(pos) OVER (ORDER BY tile) AS BIGINT) AS cum_pos
  FROM agg)
SELECT w.tile, w.n, w.pos,
       CASE WHEN tot.p > 0
            THEN round(w.cum_pos / CAST(tot.p AS DOUBLE), 6)
       END AS cum_capture,
       CASE WHEN tot.p > 0
            THEN round((CAST(w.pos AS DOUBLE) / w.n)
                       / (CAST(tot.p AS DOUBLE) / tot.n), 6)
       END AS lift
FROM w, tot
"""


def q_hurst_events(sf_dir: str):
    """Hurst exponent per event type over daily counts.
    Oracle-paired: the fixed window sizes (8/16/32) make the R/S
    windowing a window-function grid (SQL_HURST_EVENTS — cumulative
    mean-deviation range per non-overlapping window via running sums);
    R/S parity vs brute-force numpy additionally pinned in
    tests/test_batch61.py (stages/temporal.py :: hurst_rs_daily)."""
    from ..stages.temporal import hurst_rs_daily

    return _materialize(hurst_rs_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type"))


SQL_HURST_EVENTS = """
WITH daily AS MATERIALIZED (
  SELECT event_type AS g, CAST(floor(epoch(ts)/86400) AS BIGINT) AS day,
         CAST(count(*) AS DOUBLE) AS n
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2),
idx AS MATERIALIZED (
  SELECT g, n AS x,
         row_number() OVER (PARTITION BY g ORDER BY day) - 1 AS j,
         count(*) OVER (PARTITION BY g) AS nn
  FROM daily),
win AS MATERIALIZED (
  SELECT i.g, w.w, i.j, i.x, i.j // w.w AS wi,
         row_number() OVER (PARTITION BY i.g, w.w, i.j // w.w
                            ORDER BY i.j) AS pos,
         sum(i.x) OVER (PARTITION BY i.g, w.w, i.j // w.w
                        ORDER BY i.j ROWS UNBOUNDED PRECEDING) AS cs
  FROM idx i, (SELECT unnest([8, 16, 32]) AS w) w
  WHERE i.j < (i.nn // w.w) * w.w),
wstat AS MATERIALIZED (
  SELECT g, w, wi, avg(x) AS mu,
         sqrt(avg(x*x) - avg(x)*avg(x)) AS sd
  FROM win GROUP BY 1, 2, 3),
dev AS MATERIALIZED (
  SELECT wn.g, wn.w, wn.wi,
         max(wn.cs - wn.pos * ws.mu) - min(wn.cs - wn.pos * ws.mu) AS rng,
         any_value(ws.sd) AS sd
  FROM win wn JOIN wstat ws
    ON ws.g = wn.g AND ws.w = wn.w AND ws.wi = wn.wi
  GROUP BY 1, 2, 3),
rsw AS MATERIALIZED (
  SELECT g, w, avg(rng/sd) AS rs
  FROM dev WHERE sd > 0 GROUP BY 1, 2),
ptsr AS MATERIALIZED (
  SELECT g, ln(CAST(w AS DOUBLE)) AS lx, ln(rs) AS ly
  FROM rsw WHERE rs > 0),
ols AS (
  SELECT g, count(*) AS np,
         sum(lx*ly) - sum(lx)*sum(ly)/count(*) AS sxy,
         sum(lx*lx) - sum(lx)*sum(lx)/count(*) AS sxx
  FROM ptsr GROUP BY g),
nd AS (SELECT g, CAST(count(*) AS BIGINT) AS n_days FROM daily GROUP BY g)
SELECT nd.g AS event_type, nd.n_days,
       CASE WHEN o.np >= 2 AND o.sxx > 0
            THEN round(o.sxy/o.sxx, 6) END AS hurst
FROM nd LEFT JOIN ols o ON o.g = nd.g
ORDER BY nd.g
"""


QUERIES61: Dict[str, Callable] = {
    "gk_lambda_orders": q_gk_lambda_orders,
    "gains_deciles_events": q_gains_deciles_events,
    "hurst_events": q_hurst_events,
}


def _sql61() -> Dict[str, str]:
    return {
        "gk_lambda_orders": SQL_GK_LAMBDA_ORDERS,
        "gains_deciles_events": SQL_GAINS_DECILES_EVENTS,
        "hurst_events": SQL_HURST_EVENTS,
    }
