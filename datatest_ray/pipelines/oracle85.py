"""Driver-contract queries, batch 85 (see oracle.py for the contract):
upper-tail dependence between quantity and price, and the runs-
estimator extremal index of daily spikes.  Merged into
``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_tail_dependence_qty_price(sf_dir: str):
    """lambda_U(0.9): do extreme quantities and extreme prices
    co-occur on the same line item?
    (stages/stattests.py :: tail_dependence)."""
    from ..stages.stattests import tail_dependence

    return _materialize(tail_dependence(
        _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"]),
        x_col="l_quantity", y_col="l_extendedprice", q=0.9))


SQL_TAIL_DEPENDENCE_QTY_PRICE = """
WITH f AS (
  SELECT CAST(round(l_quantity * 100) AS BIGINT) AS x,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
xq AS (
  SELECT v FROM (
    SELECT x AS v,
           CAST(sum(count(*)) OVER (ORDER BY x) AS BIGINT) AS cum,
           CAST(sum(count(*)) OVER () AS BIGINT) AS n
    FROM f GROUP BY x) t
  WHERE cum >= greatest((n * 90 + 99) // 100, 1)
  ORDER BY v LIMIT 1),
yq AS (
  SELECT v FROM (
    SELECT y AS v,
           CAST(sum(count(*)) OVER (ORDER BY y) AS BIGINT) AS cum,
           CAST(sum(count(*)) OVER () AS BIGINT) AS n
    FROM f GROUP BY y) t
  WHERE cum >= greatest((n * 90 + 99) // 100, 1)
  ORDER BY v LIMIT 1),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN f.x > xq.v THEN 1 ELSE 0 END) AS BIGINT)
           AS nx,
         CAST(sum(CASE WHEN f.x > xq.v AND f.y > yq.v
                  THEN 1 ELSE 0 END) AS BIGINT) AS nj
  FROM f, xq, yq)
SELECT agg.n,
       round(xq.v / 100.0, 6) AS x_thr,
       round(yq.v / 100.0, 6) AS y_thr,
       agg.nx AS n_x, agg.nj AS n_joint,
       CASE WHEN agg.nx > 0
            THEN round(CAST(agg.nj AS DOUBLE) / agg.nx, 6)
       END AS lambda_u
FROM agg, xq, yq
"""


def q_extremal_index_events(sf_dir: str):
    """Runs-estimator extremal index of daily spike clustering per
    event type (stages/temporal.py :: extremal_index_daily)."""
    from ..stages.temporal import extremal_index_daily

    return _materialize(extremal_index_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type", q=0.9, run_gap=2))


SQL_EXTREMAL_INDEX_EVENTS = """
WITH f AS (
  SELECT event_type AS g,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL),
daily AS (
  SELECT g, day, CAST(count(*) AS BIGINT) AS x
  FROM f GROUP BY 1, 2),
nd AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY g),
thr AS (
  SELECT d.g, min(d.x) AS thr
  FROM (
    SELECT g, x,
           CAST(sum(count(*)) OVER (PARTITION BY g ORDER BY x)
                AS BIGINT) AS cum
    FROM daily GROUP BY g, x) d
  JOIN nd ON nd.g = d.g
  WHERE d.cum >= greatest((nd.n * 90 + 99) // 100, 1)
  GROUP BY d.g),
exceed AS (
  SELECT d.g, d.day,
         CAST(row_number() OVER (PARTITION BY d.g ORDER BY d.day)
              AS BIGINT) AS rn
  FROM daily d JOIN thr ON thr.g = d.g
  WHERE d.x > thr.thr),
ordpos AS (
  SELECT e.g, e.day,
         CAST(n2.rnall AS BIGINT) AS pos
  FROM exceed e
  JOIN (SELECT g, day,
               CAST(row_number() OVER (PARTITION BY g ORDER BY day)
                    AS BIGINT) AS rnall
        FROM daily) n2 ON n2.g = e.g AND n2.day = e.day),
gaps AS (
  SELECT g, pos - lag(pos) OVER (PARTITION BY g ORDER BY pos) AS gap
  FROM ordpos),
cl AS (
  SELECT g,
         CAST(1 + sum(CASE WHEN gap > 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clusters,
         CAST(count(*) AS BIGINT) AS n_exceed
  FROM gaps GROUP BY g)
SELECT nd.g AS event_type, nd.n AS n_days,
       coalesce(cl.n_exceed, 0) AS n_exceed,
       coalesce(cl.n_clusters, 0) AS n_clusters,
       CASE WHEN cl.n_exceed > 0
            THEN round(CAST(cl.n_clusters AS DOUBLE) / cl.n_exceed, 6)
       END AS theta
FROM nd LEFT JOIN cl ON cl.g = nd.g
"""


QUERIES85: Dict[str, Callable] = {
    "tail_dependence_qty_price": q_tail_dependence_qty_price,
    "extremal_index_events": q_extremal_index_events,
}

SQL85: Dict[str, str] = {
    "tail_dependence_qty_price": SQL_TAIL_DEPENDENCE_QTY_PRICE,
    "extremal_index_events": SQL_EXTREMAL_INDEX_EVENTS,
}
