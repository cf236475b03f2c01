"""Driver-contract queries, batch 45 (see oracle.py for the contract):
floor-at-zero running balances in integer cents (recursive-CTE oracle
— the engine's closed-form vectorization must match the row-by-row
recursion exactly) and the k-core of the user-day engagement graph
(iterative peeling; rows-only by design, parity pinned by brute-force
tests).  Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_capped_balance_users(sf_dir: str):
    """Prepaid-credit simulation: per user, delta = value in cents
    minus a 5000-cent debit per event, balance floored at zero
    (stages/winfunc.py :: capped_balance)."""
    from ..stages.winfunc import capped_balance

    ev = _read(sf_dir, "events", ["user_id", "ts", "value", "event_id"])

    def to_cents(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.and_(pc.is_valid(t.column("user_id")),
                             pc.is_valid(t.column("ts"))),
                     pc.and_(pc.is_valid(t.column("value")),
                             pc.is_valid(t.column("event_id"))))
        t = t.filter(ok)
        d = pc.subtract(
            pc.cast(pc.round(pc.multiply(t.column("value"), 100.0)),
                    pa.int64()),
            pa.scalar(5000, pa.int64()))
        return pa.table({"user_id": t.column("user_id"),
                         "ts": t.column("ts"),
                         "d": d,
                         "event_id": t.column("event_id")})

    ds = ev.map_batches(to_cents, batch_format="pyarrow",
                        zero_copy_batch=True)
    return _materialize(capped_balance(
        ds, by="user_id", ts_col="ts", delta_col="d",
        id_col="event_id"))


SQL_CAPPED_BALANCE_USERS = """
WITH RECURSIVE f AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 100) AS BIGINT) - 5000 AS d
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND value IS NOT NULL AND event_id IS NOT NULL),
o AS (
  SELECT user_id, d,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM f),
r AS (
  SELECT user_id, rn, greatest(0, d) AS bal,
         CASE WHEN d < 0 THEN 1 ELSE 0 END AS resets
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.user_id, o.rn, greatest(0, r.bal + o.d),
         r.resets + CASE WHEN r.bal + o.d < 0 THEN 1 ELSE 0 END
  FROM r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1),
mx AS (SELECT user_id, max(rn) AS n FROM o GROUP BY 1)
SELECT r.user_id, CAST(mx.n AS BIGINT) AS n_events,
       CAST(r.bal AS BIGINT) AS final_bal,
       CAST(r.resets AS BIGINT) AS n_resets
FROM r JOIN mx ON mx.user_id = r.user_id AND r.rn = mx.n
"""


def q_kcore_user_days(sf_dir: str):
    """24-core of the bipartite user-day activity graph (day nodes
    encoded negative); the engagement core that survives mutual
    peeling (stages/graph.py :: k_core).  Oracle-paired: peeling is
    monotone and idempotent at the fixed point, so unrolling the
    engine's max_iters=64 rounds in SQL (SQL_KCORE_USER_DAYS) is
    exact — extra rounds past convergence are no-ops."""
    from ray.data.aggregate import Count

    from ..stages.graph import k_core

    def edges(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column("user_id")),
                     pc.is_valid(t.column("ts")))
        t = t.filter(ok)
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(
            np.int64)
        day = (pc.cast(t.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False) // 86_400_000_000).astype(np.int64)
        uv = np.unique(np.stack([u, -day - 1], axis=1), axis=0)
        return pa.table({"u": pa.array(uv[:, 0]),
                         "v": pa.array(uv[:, 1])})

    e = (_read(sf_dir, "events", ["user_id", "ts"])
         .map_batches(edges, batch_format="pyarrow",
                      zero_copy_batch=True)
         .groupby(["u", "v"]).aggregate(Count(alias_name="c"))
         .select_columns(["u", "v"]))
    return _materialize(k_core(e, src_col="u", dst_col="v", k=24))


def _kcore_sql(k: int = 24, rounds: int = 64) -> str:
    """Unrolled k-core peeling mirror: each round keeps nodes of
    degree >= k and re-filters the symmetric edge list to surviving
    endpoints.  ``rounds`` matches the engine's max_iters bound; once
    the core stabilizes the remaining rounds change nothing."""
    ctes = ["""e0d AS MATERIALIZED (
  SELECT DISTINCT user_id AS u,
         -CAST(floor(epoch(ts)/86400) AS BIGINT) - 1 AS v
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)""",
        """e_0 AS MATERIALIZED (
  SELECT u, v FROM e0d UNION ALL SELECT v AS u, u AS v FROM e0d)"""]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes += [
            f"""a_{i} AS MATERIALIZED (
  SELECT u FROM e_{p} GROUP BY u HAVING count(*) >= {k})""",
            f"""e_{i} AS MATERIALIZED (
  SELECT e.u, e.v FROM e_{p} e
  JOIN a_{i} x ON x.u = e.u JOIN a_{i} y ON y.u = e.v)""",
        ]
    return "WITH " + ",\n".join(ctes) + f"""
SELECT u AS node, CAST(count(*) AS BIGINT) AS degree
FROM e_{rounds} GROUP BY u ORDER BY node"""


SQL_KCORE_USER_DAYS = _kcore_sql(24, 64)


QUERIES45: Dict[str, Callable] = {
    "capped_balance_users": q_capped_balance_users,
    "kcore_user_days": q_kcore_user_days,
}

SQL45: Dict[str, str] = {
    "capped_balance_users": SQL_CAPPED_BALANCE_USERS,
    "kcore_user_days": SQL_KCORE_USER_DAYS,
}
