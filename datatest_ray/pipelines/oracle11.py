"""Driver-contract queries, batch 11 (see oracle.py for the contract):
Cochran–Armitage trend test, Pettitt change-point on daily counts,
per-state conditional entropy of event transitions.  Merged into
``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


# ---------------------------------------------------------------------------
# Cochran–Armitage trend test
# ---------------------------------------------------------------------------


def q_ca_trend_orders(sf_dir: str):
    """Is the 'F' (finished) rate drifting monotonically across the
    ordered priority tiers?  CA weights the ordered categories by
    score where plain chi-square wastes the ordering."""
    from ..stages.profile import cochran_armitage

    return _materialize(cochran_armitage(
        _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"]),
        "o_orderpriority", "o_orderstatus", "F"))


SQL_CA_TREND_ORDERS = """
WITH c AS (
  SELECT o_orderpriority AS cat, count(*) AS n,
         count(*) FILTER (o_orderstatus = 'F') AS r
  FROM orders
  WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
  GROUP BY 1
),
w AS (SELECT CAST(substr(cat, 1, 1) AS DOUBLE) AS w, n, r FROM c),
a AS (
  SELECT sum(n) AS nn, sum(r) AS rr, sum(w * r) AS wr,
         sum(w * n) AS wn, sum(w * w * n) AS wwn
  FROM w
)
SELECT CAST(nn AS BIGINT) AS n, CAST(rr AS BIGINT) AS r,
       (wr - (rr * 1.0 / nn) * wn)
         / sqrt((rr * 1.0 / nn) * (1.0 - rr * 1.0 / nn)
                * (wwn - wn * wn * 1.0 / nn)) AS z
FROM a
"""


# ---------------------------------------------------------------------------
# Pettitt change-point on the daily event-count series
# ---------------------------------------------------------------------------


def q_pettitt_daily_events(sf_dir: str):
    """Nonparametric single change-point of the daily ingest volume —
    rank-based, so one crazy day cannot fake a level shift."""
    from ..stages.temporal import pettitt_daily

    return _materialize(pettitt_daily(
        _read(sf_dir, "events", ["ts"]), "ts"))


SQL_PETTITT_DAILY_EVENTS = """
WITH d AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         count(*) AS c
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
rk AS (
  SELECT day, c, avg(rn) OVER (PARTITION BY c) AS r
  FROM (SELECT day, c, row_number() OVER (ORDER BY c) AS rn FROM d)
),
u AS (
  SELECT day,
         2.0 * sum(r) OVER (ORDER BY day)
           - (row_number() OVER (ORDER BY day))
             * ((SELECT count(*) FROM d) + 1.0) AS u,
         row_number() OVER (ORDER BY day) AS t,
         (SELECT count(*) FROM d) AS n
  FROM rk
)
SELECT day AS split_day, abs(u) AS k_stat, CAST(n AS BIGINT) AS n_days
FROM u WHERE t < n ORDER BY abs(u) DESC, day LIMIT 1
"""


# ---------------------------------------------------------------------------
# Conditional entropy of event transitions
# ---------------------------------------------------------------------------


def q_cond_entropy_transitions(sf_dir: str):
    """Predictability of the next event given the current one —
    H(next|cur=x) per state (0 = deterministic, ln(k) = uniform)."""
    from ..stages.seq import transition_cond_entropy

    return _materialize(transition_cond_entropy(
        _read(sf_dir, "events",
              ["user_id", "ts", "event_type", "event_id"]),
        by="user_id", ts="ts", type_col="event_type",
        id_col="event_id"))


SQL_COND_ENTROPY_TRANSITIONS = """
WITH o AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
),
c AS (
  SELECT event_type AS from_type, nxt AS to_type, count(*) AS n
  FROM o WHERE nxt IS NOT NULL GROUP BY event_type, nxt
),
t AS (SELECT from_type, sum(n) AS tot FROM c GROUP BY from_type)
SELECT c.from_type, CAST(max(t.tot) AS BIGINT) AS n,
       -sum((c.n * 1.0 / t.tot) * ln(c.n * 1.0 / t.tot)) AS h
FROM c JOIN t USING (from_type)
GROUP BY c.from_type
"""


QUERIES11: Dict[str, Callable] = {
    "ca_trend_orders": q_ca_trend_orders,
    "pettitt_daily_events": q_pettitt_daily_events,
    "cond_entropy_transitions": q_cond_entropy_transitions,
}

SQL11: Dict[str, str] = {
    "ca_trend_orders": SQL_CA_TREND_ORDERS,
    "pettitt_daily_events": SQL_PETTITT_DAILY_EVENTS,
    "cond_entropy_transitions": SQL_COND_ENTROPY_TRANSITIONS,
}
