"""Driver-contract queries, batch 87 (see oracle.py for the contract):
hubness probe over the embedding k-NN graph.  Merged into
``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_hubness_embeddings(sf_dir: str):
    """k-NN in-degree hubness of the embedding cloud
    (stages/similarity.py :: hubness)."""
    from ..stages.similarity import hubness

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return _materialize(hubness(
        emb, id_col="vec_id", vec_col="embedding", k=5,
        n_queries=100))


SQL_HUBNESS_EMBEDDINGS = """
WITH q AS (SELECT vec_id, embedding FROM embeddings
           WHERE vec_id < 100),
rk AS (
  SELECT q.vec_id AS qid, e.vec_id AS nid,
         row_number() OVER (PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(
                      CAST(e.embedding AS DOUBLE[]),
                      CAST(q.embedding AS DOUBLE[])) DESC,
                    e.vec_id) AS rk
  FROM q JOIN embeddings e ON e.vec_id <> q.vec_id),
top AS (SELECT qid, nid FROM rk WHERE rk <= 5),
indeg AS (SELECT nid, CAST(count(*) AS BIGINT) AS d
          FROM top GROUP BY nid),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nb,
         CAST(max(d) AS BIGINT) AS mx,
         CAST(sum(CASE WHEN d >= 10 THEN 1 ELSE 0 END) AS BIGINT)
           AS hubs,
         sum(CAST(d AS DOUBLE)) / count(*) AS mu
  FROM indeg),
mom AS (
  SELECT m.n_nb, m.mx, m.hubs,
         sum((indeg.d - m.mu) * (indeg.d - m.mu)) / m.n_nb AS m2,
         sum((indeg.d - m.mu) * (indeg.d - m.mu)
             * (indeg.d - m.mu)) / m.n_nb AS m3
  FROM indeg, m GROUP BY m.n_nb, m.mx, m.hubs)
SELECT (SELECT CAST(count(DISTINCT qid) AS BIGINT) FROM top)
         AS n_queries,
       mom.n_nb AS n_neighbors, mom.mx AS max_indeg,
       mom.hubs AS n_hubs,
       CASE WHEN mom.n_nb >= 2 AND mom.m2 > 0
            THEN round(mom.m3 / power(mom.m2, 1.5), 6)
       END AS indeg_skew
FROM mom
"""


QUERIES87: Dict[str, Callable] = {
    "hubness_embeddings": q_hubness_embeddings,
}

SQL87: Dict[str, str] = {
    "hubness_embeddings": SQL_HUBNESS_EMBEDDINGS,
}
