"""Driver-contract queries, batch 75 (see oracle.py for the contract):
weighted-Jaccard source similarity and Hotelling T^2 between embedding
label clouds.  Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_source_similarity_docs(sf_dir: str):
    """Top-10 most word-distribution-similar source pairs (weighted
    Jaccard) (stages/text.py :: source_similarity)."""
    from ..stages.text import source_similarity

    return _materialize(source_similarity(
        _read(sf_dir, "documents", ["text", "source"]),
        "text", source_col="source", k=10))


SQL_SOURCE_SIMILARITY_DOCS = """
WITH toks AS (
  SELECT source,
         unnest(string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+')) AS token
  FROM documents
  WHERE source IS NOT NULL AND trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) <> ''),
wc AS (
  SELECT source, token, CAST(count(*) AS BIGINT) AS n
  FROM toks WHERE token <> '' GROUP BY 1, 2),
srcs AS (SELECT DISTINCT source FROM wc),
tok AS (SELECT DISTINCT token FROM wc),
grid AS (
  SELECT a.source AS sa, b.source AS sb, tok.token
  FROM srcs a JOIN srcs b ON a.source < b.source
  CROSS JOIN tok),
j AS (
  SELECT g.sa, g.sb,
         CAST(sum(least(coalesce(wa.n, 0), coalesce(wb.n, 0)))
              AS BIGINT) AS mn,
         CAST(sum(greatest(coalesce(wa.n, 0), coalesce(wb.n, 0)))
              AS BIGINT) AS mx
  FROM grid g
  LEFT JOIN wc wa ON wa.source = g.sa AND wa.token = g.token
  LEFT JOIN wc wb ON wb.source = g.sb AND wb.token = g.token
  GROUP BY g.sa, g.sb)
SELECT sa AS src_a, sb AS src_b,
       round(CAST(mn AS DOUBLE) / mx, 6) AS wjac
FROM j WHERE mx > 0
ORDER BY CAST(mn AS DOUBLE) / mx DESC, sa, sb
LIMIT 10
"""


def q_hotelling_labels(sf_dir: str):
    """rows-only by design (d x d matrix solve is not
    SQL-expressible): Hotelling T^2 between embedding labels 0 and 1;
    brute-force parity pinned in tests/test_batch75.py
    (stages/similarity.py :: hotelling_t2)."""
    from ..stages.similarity import hotelling_t2

    emb = _read(sf_dir, "embeddings", ["embedding", "label"])
    return _materialize(hotelling_t2(
        emb, vec_col="embedding", label_col="label",
        label_a=0, label_b=1))


QUERIES75: Dict[str, Callable] = {
    "source_similarity_docs": q_source_similarity_docs,
    "hotelling_labels": q_hotelling_labels,
}


def _sql75() -> Dict[str, str]:
    return {
        "source_similarity_docs": SQL_SOURCE_SIMILARITY_DOCS,
    }
