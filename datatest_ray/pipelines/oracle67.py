"""Driver-contract queries, batch 67 (see oracle.py for the contract):
RFM quintile segmentation, per-label geometric medians (Weiszfeld),
and the greedy k-center embedding coreset.  Merged into
``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_rfm_segments_users(sf_dir: str):
    """RFM quintile cell census over users
    (stages/mlprep.py :: rfm_segments)."""
    from ..stages.mlprep import rfm_segments

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])
    return _materialize(rfm_segments(
        ev, id_col="user_id", ts_col="ts", value_col="value", k=5))


SQL_RFM_SEGMENTS_USERS = """
WITH f AS (
  SELECT user_id AS k,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND value IS NOT NULL),
a AS (
  SELECT k, CAST(max(day) AS BIGINT) AS last_day,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(c) AS BIGINT) AS m
  FROM f GROUP BY k),
mx AS (SELECT CAST(max(last_day) AS BIGINT) AS maxd FROM a),
q AS (
  SELECT a.k,
         CAST(ntile(5) OVER (ORDER BY mx.maxd - a.last_day, a.k)
              AS BIGINT) AS r_q,
         CAST(ntile(5) OVER (ORDER BY a.freq, a.k) AS BIGINT) AS f_q,
         CAST(ntile(5) OVER (ORDER BY a.m, a.k) AS BIGINT) AS m_q
  FROM a, mx)
SELECT r_q, f_q, m_q, CAST(count(*) AS BIGINT) AS n_users
FROM q GROUP BY 1, 2, 3
"""


def q_geometric_median_labels(sf_dir: str):
    """rows-only by design (Weiszfeld is iterative): per-label robust
    centroid vs mean-centroid displacement; brute-force parity pinned
    in tests/test_batch67.py
    (stages/similarity.py :: geometric_median_labels)."""
    from ..stages.similarity import geometric_median_labels

    emb = _read(sf_dir, "embeddings", ["embedding", "label"])
    return _materialize(geometric_median_labels(
        emb, vec_col="embedding", label_col="label", n_iter=8))


def q_kcenter_embeddings(sf_dir: str):
    """rows-only by design (greedy k-center is iterative): the 8-point
    farthest-first coreset of the embedding cloud; brute-force parity
    pinned in tests/test_batch67.py
    (stages/similarity.py :: kcenter_greedy)."""
    from ..stages.similarity import kcenter_greedy

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return _materialize(kcenter_greedy(
        emb, id_col="vec_id", vec_col="embedding", k=8))


QUERIES67: Dict[str, Callable] = {
    "rfm_segments_users": q_rfm_segments_users,
    "geometric_median_labels": q_geometric_median_labels,
    "kcenter_embeddings": q_kcenter_embeddings,
}


def _sql67() -> Dict[str, str]:
    return {
        "rfm_segments_users": SQL_RFM_SEGMENTS_USERS,
    }
