"""Driver-contract queries, batch 65 (see oracle.py for the contract):
TwoNN intrinsic-dimension estimate of the embedding cloud and the
tile-uniformity imaging audit.  Merged into ``oracle.queries()`` /
``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_twonn_embeddings(sf_dir: str):
    """TwoNN MLE intrinsic dimension from the top-2 cosine neighbors
    of 50 query vectors (stages/similarity.py :: twonn_intrinsic_dim).
    """
    from ..stages.similarity import twonn_intrinsic_dim

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return _materialize(twonn_intrinsic_dim(
        emb, id_col="vec_id", vec_col="embedding", n_queries=50))


SQL_TWONN_EMBEDDINGS = """
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 50),
rk AS (
  SELECT q.vec_id AS qid,
         round(list_cosine_similarity(
                 CAST(e.embedding AS DOUBLE[]),
                 CAST(q.embedding AS DOUBLE[])), 6) AS sim,
         row_number() OVER (PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(
                      CAST(e.embedding AS DOUBLE[]),
                      CAST(q.embedding AS DOUBLE[])) DESC,
                    e.vec_id) AS rk
  FROM q JOIN embeddings e ON e.vec_id <> q.vec_id),
pairs AS (
  SELECT qid,
         max(CASE WHEN rk = 1 THEN 1.0 - sim END) AS d1,
         max(CASE WHEN rk = 2 THEN 1.0 - sim END) AS d2
  FROM rk WHERE rk <= 2 GROUP BY qid),
mu AS (
  SELECT ln(d2 / d1) AS lmu
  FROM pairs WHERE d1 > 0 AND d2 > d1),
agg AS (SELECT CAST(count(*) AS BIGINT) AS n_used,
               sum(lmu) AS s FROM mu)
SELECT n_used,
       CASE WHEN n_used > 0 AND s > 0
            THEN round(n_used / s, 6)
       END AS id_mle
FROM agg
"""


def q_image_tile_uniformity(sf_dir: str):
    """rows-only by design (pure-python codec is not SQL-expressible):
    per-format tile-uniformity audit over decoded fixture pixels;
    metric parity vs a brute-force numpy reference is pinned in
    tests/test_batch65.py (stages/imaging.py :: tile_uniformity_audit).
    """
    import os
    import re

    from ..sources.images import ImageFixtureSpec, generate_dataset
    from ..stages.imaging import tile_uniformity_audit

    base = os.path.basename(os.path.normpath(sf_dir))
    m = re.search(r"sf(\d+(?:\.\d+)?)", base)
    sf = float(m.group(1)) if m else 0.001
    spec = ImageFixtureSpec(n_rows=min(20_000,
                                       max(1000, int(1_000_000 * sf))),
                            seed=42, rows_per_part=2048)
    images = generate_dataset(spec, columns={"image_id", "bytes", "fmt"})
    out = tile_uniformity_audit(images, threshold=0.5)
    return _materialize(out).sort_by([("fmt", "ascending")])


QUERIES65: Dict[str, Callable] = {
    "twonn_embeddings": q_twonn_embeddings,
    "image_tile_uniformity": q_image_tile_uniformity,
}


def _sql65() -> Dict[str, str]:
    return {
        "twonn_embeddings": SQL_TWONN_EMBEDDINGS,
    }
