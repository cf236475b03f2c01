"""Driver-contract queries, batch 93 (see oracle.py for the contract):
daily capacity profile and the embedding effective rank.  Merged into
``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_capacity_profile_events(sf_dir: str):
    """Peak-to-average and p95 capacity profile per event type
    (stages/temporal.py :: capacity_profile_daily)."""
    from ..stages.temporal import capacity_profile_daily

    return _materialize(capacity_profile_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type"))


SQL_CAPACITY_PROFILE_EVENTS = """
WITH f AS (
  SELECT event_type AS g,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL),
daily AS (
  SELECT g, day, CAST(count(*) AS BIGINT) AS x
  FROM f GROUP BY 1, 2),
st AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS s1,
         CAST(max(x) AS BIGINT) AS mx
  FROM daily GROUP BY g),
rk AS (
  SELECT g, x,
         CAST(sum(count(*)) OVER (PARTITION BY g ORDER BY x)
              AS BIGINT) AS cum
  FROM daily GROUP BY g, x),
p95 AS (
  SELECT rk.g, CAST(min(rk.x) AS BIGINT) AS p95
  FROM rk JOIN st ON st.g = rk.g
  WHERE rk.cum >= greatest((st.n * 95 + 99) // 100, 1)
  GROUP BY rk.g)
SELECT st.g AS event_type, st.n AS n_days,
       round(CAST(st.s1 AS DOUBLE) / st.n, 6) AS mean,
       p95.p95, st.mx AS max,
       round(st.mx / (CAST(st.s1 AS DOUBLE) / st.n), 6) AS par,
       round(p95.p95 / (CAST(st.s1 AS DOUBLE) / st.n), 6)
         AS p95_ratio
FROM st JOIN p95 ON p95.g = st.g
"""


def q_effective_rank_embeddings(sf_dir: str):
    """rows-only by design (eigendecomposition): effective rank of
    the embedding covariance; numpy parity pinned in
    tests/test_batch93.py (stages/similarity.py :: effective_rank)."""
    from ..stages.similarity import effective_rank

    emb = _read(sf_dir, "embeddings", ["embedding"])
    return _materialize(effective_rank(emb, vec_col="embedding"))


QUERIES93: Dict[str, Callable] = {
    "capacity_profile_events": q_capacity_profile_events,
    "effective_rank_embeddings": q_effective_rank_embeddings,
}


def _sql93() -> Dict[str, str]:
    return {
        "capacity_profile_events": SQL_CAPACITY_PROFILE_EVENTS,
    }
