"""Driver-contract queries, batch 79 (see oracle.py for the contract):
frequent 3-itemsets over user baskets and the weekend-vs-weekday
quantile treatment-effect table.  Merged into ``oracle.queries()`` /
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


def q_item_triples_events(sf_dir: str):
    """Top event-type triples by user support + independence lift
    (stages/basket.py :: item_triples)."""
    from ..stages.basket import item_triples

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    return _materialize(item_triples(
        ev, user_col="user_id", item_col="event_type", k=10))


SQL_ITEM_TRIPLES_EVENTS = """
WITH d AS (
  SELECT DISTINCT user_id AS u, event_type AS item
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
nu AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS n FROM d),
n1 AS (SELECT item, CAST(count(*) AS BIGINT) AS n
       FROM d GROUP BY item),
tri AS (
  SELECT a.item AS item_a, b.item AS item_b, c.item AS item_c,
         CAST(count(*) AS BIGINT) AS n_all3
  FROM d a
  JOIN d b ON a.u = b.u AND a.item < b.item
  JOIN d c ON a.u = c.u AND b.item < c.item
  GROUP BY 1, 2, 3)
SELECT tri.item_a, tri.item_b, tri.item_c, tri.n_all3,
       round(CAST(tri.n_all3 AS DOUBLE) * nu.n * nu.n
             / (CAST(na.n AS DOUBLE) * nb.n * nc.n), 6) AS lift
FROM tri
JOIN n1 na ON na.item = tri.item_a
JOIN n1 nb ON nb.item = tri.item_b
JOIN n1 nc ON nc.item = tri.item_c, nu
ORDER BY tri.n_all3 DESC, tri.item_a, tri.item_b, tri.item_c
LIMIT 10
"""


def q_qte_weekend_value(sf_dir: str):
    """Quantile treatment-effect table: weekend (A) vs weekday (B)
    event values at fixed deciles
    (stages/robust.py :: quantile_diff)."""
    from ..stages.robust import quantile_diff

    ev = _read(sf_dir, "events", ["ts", "value"])

    def weekend(t: pa.Table):
        us = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")),
                     pa.int64())
        day = pc.cast(pc.floor(pc.divide(pc.cast(us, pa.float64()),
                                         86400e6)), pa.int64())
        dow = pc.subtract(day, pc.multiply(pc.divide(day, 7),
                                           pa.scalar(7)))
        # epoch day 0 = Thursday: dow 2 = Saturday, 3 = Sunday
        return pc.if_else(pc.is_valid(t.column("ts")),
                          pc.or_(pc.equal(dow, 2), pc.equal(dow, 3)),
                          pa.scalar(None, pa.bool_()))

    return _materialize(quantile_diff(
        ev, value_col="value", split_expr=weekend))


SQL_QTE_WEEKEND_VALUE = """
WITH f AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS v,
         CASE WHEN CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7
                   IN (2, 3) THEN 1 ELSE 0 END AS a
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
vc AS (
  SELECT v, CAST(sum(a) AS BIGINT) AS ca,
         CAST(sum(1 - a) AS BIGINT) AS cb
  FROM f GROUP BY v),
tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
               CAST(sum(cb) AS BIGINT) AS nb FROM vc),
w AS (
  SELECT v,
         CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS cum_a,
         CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS cum_b
  FROM vc),
qs AS (SELECT unnest([10, 25, 50, 75, 90]) AS qn),
pick AS (
  SELECT qs.qn,
         (SELECT min(w.v) FROM w, tot
          WHERE w.cum_a >= greatest((tot.na * qs.qn + 99) // 100, 1))
           AS va,
         (SELECT min(w.v) FROM w, tot
          WHERE w.cum_b >= greatest((tot.nb * qs.qn + 99) // 100, 1))
           AS vb
  FROM qs)
SELECT round(qn / 100.0, 6) AS q,
       round(va / 100.0, 6) AS q_a,
       round(vb / 100.0, 6) AS q_b,
       round((va - vb) / 100.0, 6) AS diff
FROM pick
"""


QUERIES79: Dict[str, Callable] = {
    "item_triples_events": q_item_triples_events,
    "qte_weekend_value": q_qte_weekend_value,
}

SQL79: Dict[str, str] = {
    "item_triples_events": SQL_ITEM_TRIPLES_EVENTS,
    "qte_weekend_value": SQL_QTE_WEEKEND_VALUE,
}
