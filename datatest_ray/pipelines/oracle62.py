"""Driver-contract queries, batch 62 (see oracle.py for the contract):
k-NN label purity over the embedding space, polynomial-kernel MMD
two-sample distance, and the phash bit-balance audit.  Merged into
``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_knn_purity_embeddings(sf_dir: str):
    """Per-label fraction of 5-NN (exact cosine) neighbors sharing the
    query's label, 50 queries
    (stages/similarity.py :: knn_label_purity)."""
    from ..stages.similarity import knn_label_purity

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    return _materialize(knn_label_purity(
        emb, id_col="vec_id", vec_col="embedding", label_col="label",
        k=5, n_queries=50))


SQL_KNN_PURITY_EMBEDDINGS = """
WITH q AS (SELECT vec_id, embedding, label FROM embeddings
           WHERE vec_id < 50),
rk AS (
  SELECT q.vec_id AS qid, q.label AS qlab, e.label AS nlab,
         row_number() OVER (PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(
                      CAST(e.embedding AS DOUBLE[]),
                      CAST(q.embedding AS DOUBLE[])) DESC,
                    e.vec_id) AS rk
  FROM q JOIN embeddings e ON e.vec_id <> q.vec_id),
top AS (SELECT qid, qlab, nlab FROM rk WHERE rk <= 5)
SELECT CAST(qlab AS BIGINT) AS label,
       CAST(count(DISTINCT qid) AS BIGINT) AS n_queries,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN nlab = qlab THEN 1 ELSE 0 END) AS BIGINT)
         AS n_same,
       round(sum(CASE WHEN nlab = qlab THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS purity
FROM top GROUP BY qlab
"""


def q_mmd_poly_value(sf_dir: str):
    """Quadratic-kernel MMD^2 between click and purchase values
    (stages/stattests.py :: mmd_poly)."""
    from ..stages.stattests import mmd_poly

    return _materialize(mmd_poly(
        _read(sf_dir, "events", ["event_type", "value"]),
        value_col="value", group_col="event_type",
        a="click", b="purchase", c=1.0, scale=100.0))


SQL_MMD_POLY_VALUE = """
WITH f AS (
  SELECT value / 100.0 AS x,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS isa
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
s AS (
  SELECT CAST(sum(isa) AS BIGINT) AS na,
         CAST(sum(1 - isa) AS BIGINT) AS nb,
         sum(CASE WHEN isa = 1 THEN x ELSE 0 END) AS sx,
         sum(CASE WHEN isa = 1 THEN x * x ELSE 0 END) AS sx2,
         sum(CASE WHEN isa = 0 THEN x ELSE 0 END) AS sy,
         sum(CASE WHEN isa = 0 THEN x * x ELSE 0 END) AS sy2
  FROM f)
SELECT na AS n_a, nb AS n_b,
       CASE WHEN na > 0 AND nb > 0
            THEN round((sx2 / na - sy2 / nb) * (sx2 / na - sy2 / nb)
                       + 2.0 * (sx / na - sy / nb)
                             * (sx / na - sy / nb), 6)
       END AS mmd2
FROM s
"""


def q_phash_bit_balance(sf_dir: str):
    """rows-only by design (the stored-phash column lives on the
    synthetic image fixture, which has no parquet twin for DuckDB):
    per-bit ones-fraction of the 64-bit phash column; brute-force bit
    parity is pinned in tests/test_batch62.py
    (stages/imaging.py :: phash_bit_balance)."""
    import os
    import re

    from ..sources.images import ImageFixtureSpec, generate_dataset
    from ..stages.imaging import phash_bit_balance

    base = os.path.basename(os.path.normpath(sf_dir))
    m = re.search(r"sf(\d+(?:\.\d+)?)", base)
    sf = float(m.group(1)) if m else 0.001
    spec = ImageFixtureSpec(n_rows=max(1000, int(100_000 * sf)),
                            seed=42, rows_per_part=2048)
    images = generate_dataset(spec, columns={"image_id", "phash"})
    return _materialize(phash_bit_balance(images, hash_col="phash"))


QUERIES62: Dict[str, Callable] = {
    "knn_purity_embeddings": q_knn_purity_embeddings,
    "mmd_poly_value": q_mmd_poly_value,
    "phash_bit_balance": q_phash_bit_balance,
}


def _sql62() -> Dict[str, str]:
    return {
        "knn_purity_embeddings": SQL_KNN_PURITY_EMBEDDINGS,
        "mmd_poly_value": SQL_MMD_POLY_VALUE,
    }
