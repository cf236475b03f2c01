"""Driver-contract queries, batch 51 (see oracle.py for the contract):
Chatterjee's xi rank correlation, per-user max drawdown of the running
value balance, Bollinger-band breach counts and stochastic/Donchian
range indicators over the daily event series.  Merged into
``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_chatterjee_xi(sf_dir: str):
    """Chatterjee's xi(l_extendedprice -> l_quantity) with the
    deterministic (x, orderkey, linenumber) tie-break
    (stages/stattests.py :: chatterjee_xi)."""
    from ..stages.stattests import chatterjee_xi

    return _materialize(chatterjee_xi(
        _read(sf_dir, "lineitem",
              ["l_extendedprice", "l_quantity", "l_orderkey",
               "l_linenumber"]),
        x_col="l_extendedprice", y_col="l_quantity",
        tie_cols=["l_orderkey", "l_linenumber"]))


SQL_CHATTERJEE_XI = """
WITH f AS (
  SELECT l_extendedprice AS x, l_quantity AS y,
         l_orderkey AS k1, l_linenumber AS k2
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
vc AS (SELECT y, CAST(count(*) AS BIGINT) AS c FROM f GROUP BY y),
cum AS (SELECT y, c,
               CAST(sum(c) OVER (ORDER BY y) AS BIGINT) AS r_le,
               CAST(sum(c) OVER (ORDER BY y DESC) AS BIGINT) AS l_ge
        FROM vc),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f),
seq AS (SELECT y AS y1, lead(y) OVER (ORDER BY x, k1, k2) AS y2 FROM f),
s AS (SELECT CAST(sum(abs(c2.r_le - c1.r_le)) AS BIGINT) AS s
      FROM seq
      JOIN cum c1 ON c1.y = seq.y1
      JOIN cum c2 ON c2.y = seq.y2
      WHERE seq.y2 IS NOT NULL),
d AS (SELECT CAST(sum(c * l_ge * (tot.n - l_ge)) AS BIGINT) AS d
      FROM cum, tot GROUP BY tot.n)
SELECT tot.n AS n,
       CASE WHEN tot.n >= 2 AND d.d > 0
            THEN round(1.0 - (CAST(tot.n AS DOUBLE) * s.s)
                       / (2.0 * d.d), 6)
       END AS xi
FROM tot, s, d
"""


def q_max_drawdown_users(sf_dir: str):
    """Per-user max drawdown / final balance of the cents-exact running
    value stream in (ts, event_id) order
    (stages/winfunc.py :: max_drawdown)."""
    from ..stages.winfunc import max_drawdown

    return _materialize(max_drawdown(
        _read(sf_dir, "events", ["user_id", "ts", "value", "event_id"]),
        by="user_id", ts_col="ts", value_col="value", id_col="event_id"))


SQL_MAX_DRAWDOWN_USERS = """
WITH f AS (
  SELECT user_id AS u, ts, event_id AS id,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
w AS (
  SELECT u, ts, id,
         CAST(sum(c) OVER (PARTITION BY u ORDER BY ts, id) AS BIGINT)
           AS cum
  FROM f),
w2 AS (
  SELECT u, cum,
         CAST(max(cum) OVER (PARTITION BY u ORDER BY ts, id)
              AS BIGINT) AS runmax,
         row_number() OVER (PARTITION BY u ORDER BY ts DESC, id DESC)
           AS rn
  FROM w)
SELECT u AS user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       round(max(CASE WHEN rn = 1 THEN cum END) / 100.0, 6) AS final_bal,
       round(max(runmax - cum) / 100.0, 6) AS max_drawdown
FROM w2
GROUP BY u
"""


def q_bollinger_daily_events(sf_dir: str):
    """Bollinger 2-sigma breach counts over the 7-observed-day trailing
    window of daily counts per event type
    (stages/temporal.py :: bollinger_daily)."""
    from ..stages.temporal import bollinger_daily

    return _materialize(bollinger_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type", window=7))


SQL_BOLLINGER_DAILY_EVENTS = """
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
         CAST(sum(x) OVER win AS BIGINT) AS s1,
         CAST(sum(x * x) OVER win AS BIGINT) AS s2,
         CAST(count(*) OVER win AS BIGINT) AS m
  FROM daily
  WINDOW win AS (PARTITION BY g ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
b AS (
  SELECT g, (7 * x - s1) AS dev, (7 * s2 - s1 * s1) AS var49,
         CASE WHEN m = 7 THEN 1 ELSE 0 END AS full_w
  FROM w)
SELECT g AS event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(full_w) AS BIGINT) AS n_windows,
       CAST(sum(CASE WHEN full_w = 1 AND dev > 0
                      AND dev * dev > 4 * var49 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_breach_hi,
       CAST(sum(CASE WHEN full_w = 1 AND dev < 0
                      AND dev * dev > 4 * var49 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_breach_lo
FROM b
GROUP BY 1
"""


def q_stoch_donchian_events(sf_dir: str):
    """Stochastic %K overheated-band days and Donchian breakout days
    over the 14-observed-day range of daily counts per event type
    (stages/temporal.py :: stoch_donchian_daily)."""
    from ..stages.temporal import stoch_donchian_daily

    return _materialize(stoch_donchian_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type", window=14))


SQL_STOCH_DONCHIAN_EVENTS = """
WITH f AS (
  SELECT event_type AS g,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL),
daily AS (
  SELECT g, day, CAST(count(*) AS BIGINT) AS x
  FROM f GROUP BY 1, 2),
w AS (
  SELECT g, x,
         CAST(min(x) OVER win14 AS BIGINT) AS lo,
         CAST(max(x) OVER win14 AS BIGINT) AS hi,
         CAST(count(*) OVER win14 AS BIGINT) AS m,
         CAST(max(x) OVER prior AS BIGINT) AS prior_hi,
         CAST(count(*) OVER prior AS BIGINT) AS pm
  FROM daily
  WINDOW
    win14 AS (PARTITION BY g ORDER BY day
              ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
    prior AS (PARTITION BY g ORDER BY day
              ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING))
SELECT g AS event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(CASE WHEN m = 14 AND hi > lo
                      AND 5 * (x - lo) >= 4 * (hi - lo)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_k_hi,
       CAST(sum(CASE WHEN pm = 14 AND x > prior_hi THEN 1 ELSE 0 END)
            AS BIGINT) AS n_breakout
FROM w
GROUP BY 1
"""


QUERIES51: Dict[str, Callable] = {
    "chatterjee_xi_lineitem": q_chatterjee_xi,
    "max_drawdown_users": q_max_drawdown_users,
    "bollinger_daily_events": q_bollinger_daily_events,
    "stoch_donchian_events": q_stoch_donchian_events,
}

SQL51: Dict[str, str] = {
    "chatterjee_xi_lineitem": SQL_CHATTERJEE_XI,
    "max_drawdown_users": SQL_MAX_DRAWDOWN_USERS,
    "bollinger_daily_events": SQL_BOLLINGER_DAILY_EVENTS,
    "stoch_donchian_events": SQL_STOCH_DONCHIAN_EVENTS,
}
