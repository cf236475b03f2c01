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
    """Per-label robust centroid vs mean-centroid displacement.
    Oracle-paired: the fixed 8 Weiszfeld iterations unroll into an
    8-stage CTE chain (SQL_GEOMETRIC_MEDIAN_LABELS); brute-force
    parity additionally pinned in tests/test_batch67.py
    (stages/similarity.py :: geometric_median_labels)."""
    from ..stages.similarity import geometric_median_labels

    emb = _read(sf_dir, "embeddings", ["embedding", "label"])
    return _materialize(geometric_median_labels(
        emb, vec_col="embedding", label_col="label", n_iter=8))


def q_kcenter_embeddings(sf_dir: str):
    """The 8-point farthest-first (Gonzalez) coreset of the embedding
    cloud.  Oracle-paired: the fixed 8 greedy rounds unroll into
    (distance-grid, min, argmax-pick) MATERIALIZED CTE blocks
    (SQL_KCENTER_EMBEDDINGS); brute-force parity additionally pinned
    in tests/test_batch67.py (stages/similarity.py :: kcenter_greedy)."""
    from ..stages.similarity import kcenter_greedy

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return _materialize(kcenter_greedy(
        emb, id_col="vec_id", vec_col="embedding", k=8))


QUERIES67: Dict[str, Callable] = {
    "rfm_segments_users": q_rfm_segments_users,
    "geometric_median_labels": q_geometric_median_labels,
    "kcenter_embeddings": q_kcenter_embeddings,
}


def _geometric_median_sql(n_iter: int = 8) -> str:
    """Unrolled-Weiszfeld DuckDB mirror of ``geometric_median_labels``:
    each of the fixed ``n_iter`` iterations is one (distance, update)
    CTE pair over the unnested (vec_id, label, dim, x) point grid —
    the same technique the pagerank/kmeans oracles use for bounded
    iteration counts."""
    ctes = [
        """pts AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings WHERE label IS NOT NULL)""",
        """est0 AS (
  SELECT label, dim, sum(x)/count(*) AS c FROM pts GROUP BY 1, 2)""",
    ]
    prev = "est0"
    for k in range(1, n_iter + 1):
        ctes.append(f"""d{k} AS (
  SELECT p.vec_id, p.label,
         greatest(sqrt(sum((p.x - e.c)*(p.x - e.c))), 1e-12) AS dist
  FROM pts p JOIN {prev} e ON p.label = e.label AND p.dim = e.dim
  GROUP BY 1, 2)""")
        ctes.append(f"""est{k} AS (
  SELECT p.label, p.dim, sum(p.x/d.dist)/sum(1.0/d.dist) AS c
  FROM pts p JOIN d{k} d ON p.vec_id = d.vec_id AND p.label = d.label
  GROUP BY 1, 2)""")
        prev = f"est{k}"
    ctes.append(f"""dfin AS (
  SELECT p.vec_id, p.label, sqrt(sum((p.x - e.c)*(p.x - e.c))) AS dist
  FROM pts p JOIN {prev} e ON p.label = e.label AND p.dim = e.dim
  GROUP BY 1, 2)""")
    ctes.append("""md AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n,
         sum(dist)/count(*) AS mean_dist FROM dfin GROUP BY 1)""")
    ctes.append(f"""sh AS (
  SELECT e.label, sqrt(sum((e.c - m.c)*(e.c - m.c))) AS s
  FROM {prev} e JOIN est0 m ON e.label = m.label AND e.dim = m.dim
  GROUP BY 1)""")
    return "WITH " + ",\n".join(ctes) + """
SELECT m.label, m.n,
       CASE WHEN m.mean_dist > 0
            THEN round(s.s/m.mean_dist, 6) END AS shift,
       round(m.mean_dist, 6) AS mean_dist
FROM md m JOIN sh s ON m.label = s.label ORDER BY m.label"""


SQL_GEOMETRIC_MEDIAN_LABELS = _geometric_median_sql(8)


def _kcenter_sql(k: int = 8) -> str:
    """Unrolled greedy k-center mirror: round r computes every point's
    distance to each already-chosen center over the unnested (id, dim)
    grid, takes the min per point, and picks the farthest (ties to the
    smaller id, matching the engine's lexsort rule)."""
    ctes = ["""pts AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings WHERE vec_id IS NOT NULL)""",
        """sel_1 AS MATERIALIZED (
  SELECT 0 AS round, min(vec_id) AS id, 0.0 AS dist FROM embeddings
  WHERE vec_id IS NOT NULL)""",
        "ch_1 AS MATERIALIZED (SELECT id FROM sel_1)"]
    for r in range(2, k + 1):
        p = r - 1
        ctes += [
            f"""dist_{r} AS MATERIALIZED (
  SELECT p.vec_id AS pid, cp.vec_id AS cid,
         sqrt(sum((p.x - cp.x)*(p.x - cp.x))) AS d
  FROM pts p
  JOIN pts cp ON cp.dim = p.dim
  JOIN ch_{p} ct ON ct.id = cp.vec_id
  GROUP BY 1, 2)""",
            f"""dmin_{r} AS MATERIALIZED (
  SELECT pid, min(d) AS dmin FROM dist_{r} GROUP BY 1)""",
            f"""pick_{r} AS MATERIALIZED (
  SELECT {r - 1} AS round, pid AS id, dmin AS dist
  FROM dmin_{r} ORDER BY dmin DESC, pid ASC LIMIT 1)""",
            f"""sel_{r} AS MATERIALIZED (
  SELECT * FROM sel_{p} UNION ALL SELECT * FROM pick_{r})""",
            f"""ch_{r} AS MATERIALIZED (
  SELECT id FROM ch_{p} UNION ALL SELECT id FROM pick_{r})""",
        ]
    return "WITH " + ",\n".join(ctes) + f"""
SELECT CAST(round AS BIGINT) AS round, id AS vec_id,
       round(dist, 6) AS dist
FROM sel_{k} ORDER BY round"""


SQL_KCENTER_EMBEDDINGS = _kcenter_sql(8)


def _sql67() -> Dict[str, str]:
    return {
        "rfm_segments_users": SQL_RFM_SEGMENTS_USERS,
        "geometric_median_labels": SQL_GEOMETRIC_MEDIAN_LABELS,
        "kcenter_embeddings": SQL_KCENTER_EMBEDDINGS,
    }
