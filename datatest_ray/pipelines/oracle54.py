"""Driver-contract queries, batch 54 (see oracle.py for the contract):
Matryoshka truncated-dim cosine recall, reciprocal-rank fusion of the
part revenue/volume league tables, variance-of-Laplacian blur audit
over decoded fixture pixels, and the SDXL-style aspect-ratio bucket
plan.  Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict

import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def _fixture(sf_dir: str, n_cap: int, columns):
    import os
    import re

    from ..sources.images import ImageFixtureSpec, generate_dataset

    base = os.path.basename(os.path.normpath(sf_dir))
    m = re.search(r"sf(\d+(?:\.\d+)?)", base)
    sf = float(m.group(1)) if m else 0.001
    spec = ImageFixtureSpec(n_rows=min(n_cap, max(1000, int(1_000_000 * sf))),
                            seed=42, rows_per_part=2048)
    return generate_dataset(spec, columns=set(columns))


def q_matryoshka_recall(sf_dir: str):
    """recall@10 of prefix-dim (8/16/32 of 64) exact cosine top-k vs
    the full-dim top-k, 20 query vectors
    (stages/similarity.py :: matryoshka_recall)."""
    from ..stages.similarity import matryoshka_recall

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return _materialize(matryoshka_recall(
        emb, id_col="vec_id", vec_col="embedding",
        dims=(8, 16, 32), k=10, n_queries=20))


def _sql_matryoshka() -> str:
    def rk(vec_expr: str) -> str:
        return f"""
  SELECT q.vec_id AS qid, e.vec_id AS nid,
         row_number() OVER (PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(
                      CAST(e.{vec_expr} AS DOUBLE[]),
                      CAST(q.{vec_expr} AS DOUBLE[])) DESC,
                    e.vec_id) AS rk
  FROM q JOIN embeddings e ON e.vec_id <> q.vec_id"""

    parts = []
    for d in (8, 16, 32):
        parts.append(f"""
SELECT {d} AS dim, (SELECT count(*) FROM q) AS n_queries,
       CAST(count(*) AS BIGINT) AS overlap,
       round(count(*) / ((SELECT count(*) FROM q) * 10.0), 6) AS recall
FROM (SELECT qid, nid FROM full_rk WHERE rk <= 10) f
JOIN (SELECT qid, nid FROM ({rk(f'embedding[1:{d}]')}) t
      WHERE rk <= 10) p
  ON f.qid = p.qid AND f.nid = p.nid""")
    return (f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20),
full_rk AS ({rk('embedding')})
""" + "\nUNION ALL\n".join(parts))


def q_rrf_parts(sf_dir: str):
    """Reciprocal-rank fusion (c = 60) of parts ranked by revenue and
    by shipped quantity, fused top-20
    (stages/mlprep.py :: rrf_fuse)."""
    from ray.data.aggregate import Sum

    from ..stages.mlprep import rrf_fuse

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount",
                "l_quantity"])

    def units(t: pa.Table) -> pa.Table:
        rev = pc.cast(pc.round(pc.multiply(pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount"))),
            100.0)), pa.int64())
        qty = pc.cast(pc.round(pc.multiply(
            t.column("l_quantity"), 100.0)), pa.int64())
        return pa.table({"l_partkey": t.column("l_partkey"),
                         "rev": rev, "qty": qty})

    agg = li.map_batches(
        units, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("l_partkey").aggregate(Sum("rev", alias_name="rev"),
                                     Sum("qty", alias_name="qty"))
    return _materialize(rrf_fuse(agg, key_col="l_partkey",
                                 score_cols=["rev", "qty"],
                                 c=60, top_k=20))


SQL_RRF_PARTS = """
WITH agg AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS rev,
         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
              AS BIGINT) AS qty
  FROM lineitem GROUP BY 1),
r AS (
  SELECT l_partkey,
         CAST(row_number() OVER (ORDER BY rev DESC, l_partkey)
              AS BIGINT) AS rank_rev,
         CAST(row_number() OVER (ORDER BY qty DESC, l_partkey)
              AS BIGINT) AS rank_qty
  FROM agg)
SELECT l_partkey, rank_rev, rank_qty,
       round(1.0 / (60 + rank_rev) + 1.0 / (60 + rank_qty), 6) AS rrf
FROM r
ORDER BY 1.0 / (60 + rank_rev) + 1.0 / (60 + rank_qty) DESC, l_partkey
LIMIT 20
"""


def q_image_blur_audit(sf_dir: str):
    """rows-only by design (pure-python codec is not SQL-expressible):
    per-format variance-of-Laplacian blur audit over decoded fixture
    pixels; metric parity vs a brute-force numpy Laplacian is pinned in
    tests/test_batch54.py (stages/imaging.py :: blur_audit)."""
    from ..stages.imaging import blur_audit

    images = _fixture(sf_dir, 20_000, ["image_id", "bytes", "fmt"])
    out = blur_audit(images, threshold=25.0)
    return _materialize(out).sort_by([("fmt", "ascending")])


def q_aspect_bucket_plan(sf_dir: str):
    """rows-only by design (metadata of the synthetic image fixture,
    which has no parquet twin for DuckDB): SDXL-style aspect bucket
    counts + resize stats from (w, h) only
    (stages/transforms.py :: aspect_bucket_plan)."""
    from ..stages.transforms import aspect_bucket_plan

    images = _fixture(sf_dir, 100_000, ["image_id", "w", "h"])
    out = aspect_bucket_plan(images, target_area=256 * 256)
    return _materialize(out).sort_by([("bucket", "ascending")])


QUERIES54: Dict[str, Callable] = {
    "matryoshka_recall": q_matryoshka_recall,
    "rrf_parts": q_rrf_parts,
    "image_blur_audit": q_image_blur_audit,
    "aspect_bucket_plan": q_aspect_bucket_plan,
}


def _sql54() -> Dict[str, str]:
    return {
        "matryoshka_recall": _sql_matryoshka(),
        "rrf_parts": SQL_RRF_PARTS,
    }
