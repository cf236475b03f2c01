"""Driver-contract queries, batch 19 (see oracle.py for the contract):
the dedup-tuning and split-hygiene family — train/test split leakage
through near-duplicate pairs, a cosine-similarity threshold sweep for
dedup-threshold tuning, per-language exact-duplication share, and a
zlib compressibility quality signal (rows-only; no SQL zlib).
Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

import zlib
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


# ---------------------------------------------------------------------------
# Train/test split leakage via near-duplicate pairs
# ---------------------------------------------------------------------------


def q_split_leakage_jaccard(sf_dir: str):
    """Near-duplicate pairs (3-gram Jaccard >= 0.8) that CROSS a
    deterministic train/test split (test = doc_id % 5 == 0) — the
    contamination check run before any eval split ships: a test doc
    with a near-copy in train invalidates the eval.  Reuses the exact
    inverted-index Jaccard pair pipeline; the split filter is a
    stateless per-batch kernel on the (tiny) surviving pair set."""
    from ..stages.dedup import jaccard_pairs_exact

    pairs = jaccard_pairs_exact(
        _read(sf_dir, "documents", ["doc_id", "text"]), "text",
        "doc_id", n=3, threshold=0.8, shuffle_partitions=8)

    def crossing(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return t.filter(pa.array((a % 5 == 0) != (b % 5 == 0)))

    return _materialize(
        pairs.map_batches(crossing, batch_format="pyarrow",
                          zero_copy_batch=True),
        empty_schema=pa.schema([("a", pa.int64()), ("b", pa.int64()),
                                ("j", pa.float64())]),
    )


SQL_SPLIT_LEAKAGE_JACCARD = r"""
WITH tok AS (SELECT doc_id, string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\s+') AS ts FROM documents),
sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(ts)-2),
         i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s FROM tok),
pairs AS (SELECT a.doc_id AS a, b.doc_id AS b,
    len(list_intersect(a.s,b.s))::DOUBLE / (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) AS j
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
SELECT a, b, j FROM pairs
WHERE j >= 0.8 AND (a % 5 = 0) <> (b % 5 = 0)
"""


# ---------------------------------------------------------------------------
# Cosine-similarity threshold sweep (dedup-threshold tuning curve)
# ---------------------------------------------------------------------------


def q_sim_threshold_sweep(sf_dir: str):
    """Pair counts per similarity band (width 0.10 from 0.30) over the
    embeddings table — the tuning curve consulted before fixing a
    near-dup threshold.  One exact blocked pair pass (block-pair grid
    join, no broadcast) at the LOWEST band edge, then a tiny band
    groupby over the surviving pairs."""
    from ray.data.aggregate import Count

    from ..stages.similarity import neardup_cosine_pairs

    pairs = neardup_cosine_pairs(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        id_col="vec_id", vec_col="embedding", threshold=0.30,
        mode="blocked")

    def to_band(t: pa.Table) -> pa.Table:
        sim = t.column("sim").to_numpy(zero_copy_only=False)
        band = np.floor((sim - 0.30) / 0.10).astype(np.int64)
        return pa.table({"band": pa.array(band)})

    out = pairs.map_batches(
        to_band, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("band").aggregate(Count(alias_name="n"))
    return _materialize(out, empty_schema=pa.schema(
        [("band", pa.int64()), ("n", pa.int64())]))


SQL_SIM_THRESHOLD_SWEEP = """
WITH p AS (
  SELECT round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6)
         AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
SELECT CAST(floor((sim - 0.30) / 0.10) AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n
FROM p WHERE sim >= 0.30 GROUP BY band
"""


# ---------------------------------------------------------------------------
# Per-language exact-duplication share
# ---------------------------------------------------------------------------


def q_dup_share_by_lang(sf_dir: str):
    """Per-language share of docs whose exact content fingerprint
    repeats corpus-wide — which language is flooding the corpus with
    copies.  Duplicates injected deterministically (doc_id % 10 == 0,
    re-keyed +1_000_000; the testdata has none), same pattern as
    ``dedup_exact``.  Aggregate-side join only, never raw rows
    (stages/dedup.py :: dup_share)."""
    from ..stages.dedup import dup_share

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def dup_subset(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(ids % 10 == 0))
        return pa.table({
            "doc_id": pc.add(sub.column("doc_id"), 1_000_000),
            "lang": sub.column("lang"),
            "text": sub.column("text"),
        })

    dups = ds.map_batches(dup_subset, batch_format="pyarrow",
                          zero_copy_batch=True)
    return _materialize(dup_share(
        ds.union(dups), "text", "doc_id", group_col="lang"))


SQL_DUP_SHARE_BY_LANG = """
WITH docs2 AS (
  SELECT doc_id, lang, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, lang, text FROM documents
  WHERE doc_id % 10 = 0),
fp AS (SELECT doc_id, lang, md5(text) AS f FROM docs2),
dup AS (SELECT f FROM fp GROUP BY f HAVING count(*) > 1)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (f IN (SELECT f FROM dup)) AS BIGINT)
         AS n_duped
FROM fp GROUP BY lang
"""


# ---------------------------------------------------------------------------
# zlib compressibility quality signal (rows-only; SQL has no zlib)
# ---------------------------------------------------------------------------


def q_compress_ratio_docs(sf_dir: str):
    """Per-document zlib compressibility: (doc_id, raw_bytes,
    comp_bytes) — the classic cheap quality heuristic (highly
    compressible text = repetitive boilerplate; near-incompressible =
    binary junk).  Deterministic (zlib level 6); per-row loop is the
    codec itself (C speed), embarrassingly parallel, no shuffle.
    Rows-only: DuckDB has no zlib; invariants pinned by
    test_batch19.py."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def kernel(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        enc = [("" if t is None else t).encode("utf-8") for t in texts]
        raw = np.fromiter((len(e) for e in enc), np.int64, count=len(enc))
        comp = np.fromiter(
            (len(zlib.compress(e, 6)) for e in enc), np.int64,
            count=len(enc))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "raw_bytes": pa.array(raw),
            "comp_bytes": pa.array(comp),
        })

    return _materialize(ds.map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True))


QUERIES19: Dict[str, Callable] = {
    "split_leakage_jaccard": q_split_leakage_jaccard,
    "sim_threshold_sweep": q_sim_threshold_sweep,
    "dup_share_by_lang": q_dup_share_by_lang,
    "compress_ratio_docs": q_compress_ratio_docs,
}

SQL19: Dict[str, str] = {
    "split_leakage_jaccard": SQL_SPLIT_LEAKAGE_JACCARD,
    "sim_threshold_sweep": SQL_SIM_THRESHOLD_SWEEP,
    "dup_share_by_lang": SQL_DUP_SHARE_BY_LANG,
    # compress_ratio_docs: rows-only by design (no SQL zlib)
}
