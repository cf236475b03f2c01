"""Driver-contract queries, batch 6 (see oracle.py for the contract):
generalized weighted quantile, stuck-value run audit, candidate-key
discovery.  Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# Weighted p90 (generalized lower weighted quantile; exact integer cutover)
# ---------------------------------------------------------------------------


def q_weighted_p90_price(sf_dir: str):
    """Quantity-weighted lower p90 of extended price per return flag —
    the same O(distinct)-shuffle order-statistics plan as the weighted
    median, with the cutover generalized to 10·cumw ≥ 9·totw."""
    from ..stages.robust import weighted_quantile

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_extendedprice", "l_quantity"])
    return weighted_quantile(ds, by="l_returnflag", col="l_extendedprice",
                             weight_col="l_quantity", q_num=9, q_den=10)


SQL_WEIGHTED_P90_PRICE = """
WITH agg AS (
  SELECT l_returnflag, l_extendedprice AS v,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2
), c AS (
  SELECT l_returnflag, v,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY v) AS cw,
         sum(w) OVER (PARTITION BY l_returnflag) AS tw
  FROM agg
)
SELECT l_returnflag, min(v) AS wq
FROM c WHERE 10 * cw >= 9 * tw GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Stuck-sensor run audit (longest run of identical consecutive values)
# ---------------------------------------------------------------------------


def q_stuck_runs_users(sf_dir: str):
    """Longest run of identical consecutive `value` readings per user
    in (ts, event_id) order — frozen-stream detection."""
    from ..stages.seq import stuck_runs

    return stuck_runs(
        _read(sf_dir, "events", ["user_id", "ts", "value", "event_id"]),
        by="user_id", ts="ts", value_col="value", id_col="event_id")


SQL_STUCK_RUNS_USERS = """
WITH e AS (
  SELECT user_id, value, ts, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         row_number() OVER (PARTITION BY user_id, value
                            ORDER BY ts, event_id) AS rnv
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), runs AS (
  SELECT user_id, value, rn - rnv AS island, count(*) AS run_len
  FROM e GROUP BY 1, 2, 3
)
SELECT user_id, CAST(sum(run_len) AS BIGINT) AS n_rows,
       count(*) AS n_runs, CAST(max(run_len) AS BIGINT) AS max_run
FROM runs GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Candidate-key discovery (how close column combos come to unique)
# ---------------------------------------------------------------------------

_COMBOS = [["event_id"], ["user_id", "ts"],
           ["user_id", "event_type", "ts"]]


def q_key_candidates_events(sf_dir: str):
    """Which column combos uniquely identify event rows?  Per-combo
    distinct counting with per-block local dedup — the exchange moves
    distinct keys, never rows."""
    from ..stages.profile import key_candidates

    return key_candidates(
        _read(sf_dir, "events", ["event_id", "user_id", "event_type",
                                 "ts"]), _COMBOS)


SQL_KEY_CANDIDATES_EVENTS = """
WITH a AS (
  SELECT count(*) AS n_rows,
         count(DISTINCT CAST(event_id AS VARCHAR)) AS n_distinct
  FROM events WHERE event_id IS NOT NULL
), b AS (
  SELECT count(*) AS n_rows,
         count(DISTINCT CAST(user_id AS VARCHAR) || '|'
               || CAST(ts AS VARCHAR)) AS n_distinct
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), c AS (
  SELECT count(*) AS n_rows,
         count(DISTINCT CAST(user_id AS VARCHAR) || '|' || event_type
               || '|' || CAST(ts AS VARCHAR)) AS n_distinct
  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        AND ts IS NOT NULL
)
SELECT 'event_id' AS combo, n_rows, n_distinct,
       n_rows - n_distinct AS dup_rows,
       CAST(n_rows = n_distinct AS BIGINT) AS is_key FROM a
UNION ALL
SELECT 'user_id+ts', n_rows, n_distinct, n_rows - n_distinct,
       CAST(n_rows = n_distinct AS BIGINT) FROM b
UNION ALL
SELECT 'user_id+event_type+ts', n_rows, n_distinct,
       n_rows - n_distinct, CAST(n_rows = n_distinct AS BIGINT) FROM c
"""


QUERIES6: Dict[str, Callable] = {
    "weighted_p90_price": q_weighted_p90_price,
    "stuck_runs_users": q_stuck_runs_users,
    "key_candidates_events": q_key_candidates_events,
}

SQL6: Dict[str, str] = {
    "weighted_p90_price": SQL_WEIGHTED_P90_PRICE,
    "stuck_runs_users": SQL_STUCK_RUNS_USERS,
    "key_candidates_events": SQL_KEY_CANDIDATES_EVENTS,
}
