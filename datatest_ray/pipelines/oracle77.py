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
    """Tukey median polish of the (dow x event-type) daily-median
    matrix.  Oracle-paired: the fixed 10 sweeps unroll into a
    MATERIALIZED-CTE chain (SQL_MEDIAN_POLISH_EVENTS); brute-force
    parity additionally pinned in tests/test_batch77.py
    (stages/temporal.py :: median_polish_dow_type)."""
    from ..stages.temporal import median_polish_dow_type

    return _materialize(median_polish_dow_type(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", type_col="event_type"))


def _median_polish_sql(n_iter: int = 10) -> str:
    """Unrolled Tukey median-polish mirror: each sweep is a fixed
    (row-median, recenter, col-median, recenter) CTE block over the
    7 x n_types state.  Every state CTE is MATERIALIZED — the chain
    references each prior state twice, so inlined expansion would be
    exponential in sweep count (and reopen the parquet per reference).
    """
    ctes = ["""daily AS MATERIALIZED (
  SELECT event_type AS g, CAST(floor(epoch(ts)/86400) AS BIGINT) AS day,
         count(*) AS n
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2)""",
        """cellv AS MATERIALIZED (
  SELECT (day % 7) AS dow, g, median(n) AS cell FROM daily GROUP BY 1, 2)""",
        """grid AS MATERIALIZED (
  SELECT d.dow, t.g, CAST(COALESCE(c.cell, 0.0) AS DOUBLE) AS cell
  FROM (SELECT CAST(unnest(range(7)) AS BIGINT) AS dow) d
  CROSS JOIN (SELECT DISTINCT g FROM daily) t
  LEFT JOIN cellv c ON c.dow = d.dow AND c.g = t.g)""",
        "resid_0 AS MATERIALIZED (SELECT dow, g, cell AS v FROM grid)",
        "re_0 AS MATERIALIZED (SELECT DISTINCT dow, 0.0 AS v FROM grid)",
        "ce_0 AS MATERIALIZED (SELECT DISTINCT g, 0.0 AS v FROM grid)",
        "ov_0 AS MATERIALIZED (SELECT 0.0 AS v)"]
    for k in range(1, n_iter + 1):
        p = k - 1
        ctes += [
            f"rm_{k} AS MATERIALIZED (SELECT dow, median(v) AS m"
            f" FROM resid_{p} GROUP BY dow)",
            f"reA_{k} AS MATERIALIZED (SELECT r.dow, r.v + m.m AS v"
            f" FROM re_{p} r JOIN rm_{k} m ON r.dow = m.dow)",
            f"residA_{k} AS MATERIALIZED (SELECT t.dow, t.g, t.v - m.m AS v"
            f" FROM resid_{p} t JOIN rm_{k} m ON t.dow = m.dow)",
            f"cmr_{k} AS MATERIALIZED (SELECT median(v) AS m FROM reA_{k})",
            f"ovA_{k} AS MATERIALIZED (SELECT o.v + c.m AS v"
            f" FROM ov_{p} o, cmr_{k} c)",
            f"re_{k} AS MATERIALIZED (SELECT dow, r.v - c.m AS v"
            f" FROM reA_{k} r, cmr_{k} c)",
            f"cm_{k} AS MATERIALIZED (SELECT g, median(v) AS m"
            f" FROM residA_{k} GROUP BY g)",
            f"ceA_{k} AS MATERIALIZED (SELECT c.g, c.v + m.m AS v"
            f" FROM ce_{p} c JOIN cm_{k} m ON c.g = m.g)",
            f"resid_{k} AS MATERIALIZED (SELECT t.dow, t.g, t.v - m.m AS v"
            f" FROM residA_{k} t JOIN cm_{k} m ON t.g = m.g)",
            f"cmc_{k} AS MATERIALIZED (SELECT median(v) AS m FROM ceA_{k})",
            f"ov_{k} AS MATERIALIZED (SELECT o.v + c.m AS v"
            f" FROM ovA_{k} o, cmc_{k} c)",
            f"ce_{k} AS MATERIALIZED (SELECT c.g, c.v - x.m AS v"
            f" FROM ceA_{k} c, cmc_{k} x)",
        ]
    n = n_iter
    return "WITH " + ",\n".join(ctes) + f"""
SELECT gr.dow, gr.g AS event_type, round(gr.cell, 6) AS cell,
       round(ov.v + re.v + ce.v, 6) AS fitted,
       round(rs.v, 6) AS residual, round(ov.v, 6) AS overall
FROM grid gr
JOIN re_{n} re ON re.dow = gr.dow
JOIN ce_{n} ce ON ce.g = gr.g
JOIN resid_{n} rs ON rs.dow = gr.dow AND rs.g = gr.g
CROSS JOIN ov_{n} ov
ORDER BY gr.dow, gr.g"""


SQL_MEDIAN_POLISH_EVENTS = _median_polish_sql(10)


QUERIES77: Dict[str, Callable] = {
    "itemcos_events": q_itemcos_events,
    "median_polish_events": q_median_polish_events,
}


def _sql77() -> Dict[str, str]:
    return {
        "itemcos_events": SQL_ITEMCOS_EVENTS,
        "median_polish_events": SQL_MEDIAN_POLISH_EVENTS,
    }
