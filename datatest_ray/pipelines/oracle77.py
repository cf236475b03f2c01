"""Driver-contract queries, batch 77 (see oracle.py for the contract):
item-item cosine over user event baskets and Tukey median polish of
the day-of-week x type matrix.  Merged into ``oracle.queries()`` /
``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_itemcos_events(sf_dir: str):
    """Top event-type pairs by item-item (Ochiai) cosine over user
    baskets (stages/basket.py :: item_cosine)."""
    from ..stages.basket import item_cosine

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    return _materialize(item_cosine(
        ev, user_col="user_id", item_col="event_type", k=10))


SQL_ITEMCOS_EVENTS = """
WITH d AS (
  SELECT DISTINCT user_id AS u, event_type AS item
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
n1 AS (SELECT item, CAST(count(*) AS BIGINT) AS n
       FROM d GROUP BY item),
co AS (
  SELECT a.item AS item_a, b.item AS item_b,
         CAST(count(*) AS BIGINT) AS n_both
  FROM d a JOIN d b ON a.u = b.u AND a.item < b.item
  GROUP BY 1, 2)
SELECT co.item_a, co.item_b, co.n_both,
       round(co.n_both / sqrt(CAST(na.n AS DOUBLE) * nb.n), 6)
         AS cosine
FROM co
JOIN n1 na ON na.item = co.item_a
JOIN n1 nb ON nb.item = co.item_b
ORDER BY co.n_both / sqrt(CAST(na.n AS DOUBLE) * nb.n) DESC,
         co.item_a, co.item_b
LIMIT 10
"""


def q_median_polish_events(sf_dir: str):
    """rows-only by design (iterative sweep): Tukey median polish of
    the (dow x event-type) daily-median matrix; brute-force parity
    pinned in tests/test_batch77.py
    (stages/temporal.py :: median_polish_dow_type)."""
    from ..stages.temporal import median_polish_dow_type

    return _materialize(median_polish_dow_type(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", type_col="event_type"))


QUERIES77: Dict[str, Callable] = {
    "itemcos_events": q_itemcos_events,
    "median_polish_events": q_median_polish_events,
}


def _sql77() -> Dict[str, str]:
    return {
        "itemcos_events": SQL_ITEMCOS_EVENTS,
    }
