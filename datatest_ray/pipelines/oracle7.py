"""Driver-contract queries, batch 7 (see oracle.py for the contract):
Wilson-interval daily error rate, ledger running-balance invariant,
churn split audit, top event trigrams.  Merged into
``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict

import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# Daily error rate with Wilson 95% interval
# ---------------------------------------------------------------------------


def q_error_rate_ci(sf_dir: str):
    """Share of 'error' events per day with the Wilson score interval —
    the uncertainty-aware SLO chart (low-traffic days get wide bands
    instead of false alarms)."""
    from ..stages.temporal import rate_with_ci

    return rate_with_ci(_read(sf_dir, "events", ["ts", "event_type"]),
                        "ts", type_col="event_type", target="error",
                        z=1.96)


SQL_ERROR_RATE_CI = """
WITH d AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         count(*) AS n,
         count(*) FILTER (event_type = 'error') AS n_target
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1
)
SELECT day, n, n_target,
       CAST(n_target AS DOUBLE) / n AS rate,
       round(((CAST(n_target AS DOUBLE) / n) + 1.96*1.96/(2.0*n)
              - 1.96 * sqrt((CAST(n_target AS DOUBLE)/n)
                            * (1.0 - CAST(n_target AS DOUBLE)/n) / n
                            + 1.96*1.96/(4.0*n*n)))
             / (1.0 + 1.96*1.96/n), 6) AS ci_lo,
       round(((CAST(n_target AS DOUBLE) / n) + 1.96*1.96/(2.0*n)
              + 1.96 * sqrt((CAST(n_target AS DOUBLE)/n)
                            * (1.0 - CAST(n_target AS DOUBLE)/n) / n
                            + 1.96*1.96/(4.0*n*n)))
             / (1.0 + 1.96*1.96/n), 6) AS ci_hi
FROM d
"""


# ---------------------------------------------------------------------------
# Ledger running-balance invariant (never-below-zero audit)
# ---------------------------------------------------------------------------


def q_ledger_users(sf_dir: str):
    """Per-user running balance where purchases debit and every other
    event credits `value` — flags users whose ledger ever dips below
    zero.  Integer-cents running sums, bit-identical on any split."""
    from ..stages.seq import ledger_min

    ds = _read(sf_dir, "events",
               ["user_id", "ts", "event_id", "event_type", "value"])

    def signed(t: pa.Table) -> pa.Table:
        delta = pc.if_else(pc.equal(t.column("event_type"), "purchase"),
                           pc.negate(pc.cast(t.column("value"),
                                             pa.float64())),
                           pc.cast(t.column("value"), pa.float64()))
        return pa.table({
            "user_id": t.column("user_id"),
            "ts": t.column("ts"),
            "event_id": t.column("event_id"),
            "delta": delta,
        })

    sds = ds.map_batches(signed, batch_format="pyarrow",
                         zero_copy_batch=True)
    return ledger_min(sds, by="user_id", ts="ts", id_col="event_id",
                      delta_col="delta", decimals=2)


SQL_LEDGER_USERS = """
WITH e AS (
  SELECT user_id, ts, event_id,
         CAST(round((CASE WHEN event_type = 'purchase' THEN -value
                          ELSE value END) * 100) AS BIGINT) AS units
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
        AND event_type IS NOT NULL
), r AS (
  SELECT user_id, units,
         sum(units) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS run
  FROM e
)
SELECT user_id, count(*) AS n,
       CAST(sum(units) AS BIGINT) AS final_units,
       CAST(min(run) AS BIGINT) AS min_units,
       CAST(min(run) < 0 AS BIGINT) AS went_negative
FROM r GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Churn split audit (active before split day, silent after)
# ---------------------------------------------------------------------------

_SPLIT_OFFSET = 20


def q_churn_users(sf_dir: str):
    """Per-user activity split around day min_day+20: who went silent
    in the last stretch of the window."""
    from ray.data.aggregate import Min

    from ..stages.temporal import churned_keys

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def to_day(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")),
                     pa.int64())
        return pa.table({"day": pc.cast(pc.floor(pc.divide(pc.cast(
            us, pa.float64()), 86400e6)), pa.int64())})

    min_day = ds.map_batches(to_day, batch_format="pyarrow",
                             zero_copy_batch=True).aggregate(
        Min("day", alias_name="m"))["m"]
    return churned_keys(ds, "ts", by="user_id",
                        split_day=int(min_day) + _SPLIT_OFFSET)


SQL_CHURN_USERS = f"""
WITH base AS (
  SELECT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), s AS (
  SELECT (SELECT min(day) FROM base) + {_SPLIT_OFFSET} AS split
)
SELECT user_id,
       count(*) FILTER (day < (SELECT split FROM s)) AS n_before,
       count(*) FILTER (day >= (SELECT split FROM s)) AS n_after,
       max(day) FILTER (day < (SELECT split FROM s)) AS last_day_before,
       CAST(count(*) FILTER (day < (SELECT split FROM s)) > 0
            AND count(*) FILTER (day >= (SELECT split FROM s)) = 0
            AS BIGINT) AS churned
FROM base GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Top event trigrams (3-step sequence mining)
# ---------------------------------------------------------------------------


def q_trigrams_events(sf_dir: str):
    """The 10 most common 3-step event-type paths within a user
    ((ts, event_id) order; deterministic count/lex tie-break)."""
    from ..stages.seq import trigram_topk

    return trigram_topk(
        _read(sf_dir, "events", ["user_id", "ts", "event_type",
                                 "event_id"]),
        by="user_id", ts="ts", type_col="event_type", id_col="event_id",
        k=10)


SQL_TRIGRAMS_EVENTS = """
WITH o AS (
  SELECT event_type AS t0,
         lead(event_type) OVER w AS t1,
         lead(event_type, 2) OVER w AS t2
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), c AS (
  SELECT t0, t1, t2, count(*) AS n FROM o
  WHERE t1 IS NOT NULL AND t2 IS NOT NULL GROUP BY 1, 2, 3
), r AS (
  SELECT t0, t1, t2, n,
         row_number() OVER (ORDER BY n DESC, t0, t1, t2) AS rn
  FROM c
)
SELECT t0, t1, t2, n FROM r WHERE rn <= 10
"""


QUERIES7: Dict[str, Callable] = {
    "error_rate_ci": q_error_rate_ci,
    "ledger_users": q_ledger_users,
    "churn_users": q_churn_users,
    "trigrams_events": q_trigrams_events,
}

SQL7: Dict[str, str] = {
    "error_rate_ci": SQL_ERROR_RATE_CI,
    "ledger_users": SQL_LEDGER_USERS,
    "churn_users": SQL_CHURN_USERS,
    "trigrams_events": SQL_TRIGRAMS_EVENTS,
}
