"""Driver-contract queries, batch 20 (see oracle.py for the contract):
the corpus n-gram statistics family — per-document n-gram novelty
(inverse boilerplate), per-language distinct-n diversity, and a
MinHash-LSH precision/recall report against the exact-Jaccard pair
oracle (rows-only: LSH banding is not SQL-expressible).
Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict

import pyarrow as pa


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


# ---------------------------------------------------------------------------
# Per-document n-gram novelty (inverse boilerplate)
# ---------------------------------------------------------------------------


def q_ngram_novelty_docs(sf_dir: str):
    """(doc_id, novel, n_grams): how many of the doc's distinct
    3-gram shingles appear in no other document — up-weight original
    content, down-weight template text (stages/text.py ::
    ngram_novelty)."""
    from ..stages.text import ngram_novelty

    return _materialize(ngram_novelty(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        "text", "doc_id", n=3))


SQL_NGRAM_NOVELTY_DOCS = r"""
WITH tok AS (SELECT doc_id, string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\s+') AS ts FROM documents),
ng AS (SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(ts)-2),
         i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS g FROM tok),
df AS (SELECT g, count(*) AS d FROM ng GROUP BY g)
SELECT ng.doc_id, CAST(count(*) FILTER (df.d = 1) AS BIGINT) AS novel,
       CAST(count(*) AS BIGINT) AS n_grams
FROM ng JOIN df USING (g) GROUP BY ng.doc_id
"""


# ---------------------------------------------------------------------------
# Per-language distinct-n diversity
# ---------------------------------------------------------------------------


def q_distinct_ngrams_lang(sf_dir: str):
    """(lang, n_distinct, n_docgrams): corpus-wide distinct 3-gram
    count per language vs the sum of per-doc distinct counts — the
    distinct-n diversity ratio that flags repetitive subcorpora
    (stages/text.py :: ngram_diversity)."""
    from ..stages.text import ngram_diversity

    return _materialize(ngram_diversity(
        _read(sf_dir, "documents", ["lang", "text"]),
        "text", group_col="lang", n=3))


SQL_DISTINCT_NGRAMS_LANG = r"""
WITH tok AS (SELECT lang, string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\s+') AS ts FROM documents),
ng AS (SELECT lang, unnest(list_distinct(list_transform(generate_series(1, len(ts)-2),
         i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS g FROM tok)
SELECT lang, CAST(count(DISTINCT g) AS BIGINT) AS n_distinct,
       CAST(count(*) AS BIGINT) AS n_docgrams
FROM ng GROUP BY lang
"""


# ---------------------------------------------------------------------------
# MinHash-LSH precision/recall vs exact Jaccard (rows-only)
# ---------------------------------------------------------------------------


def q_minhash_pr_report(sf_dir: str):
    """One-row report (n_exact, n_lsh, n_both): the exact 3-gram
    Jaccard>=0.8 pair set vs the MinHash+LSH candidate-then-verify
    pipeline's output — the recall audit run before trusting an
    approximate dedup pass at scale.  Rows-only (LSH banding is not
    SQL-expressible); both pair pipelines ARE individually
    oracle-paired elsewhere (dedup_jaccard_ngram, dedup_minhash_lsh).
    The thresholded pair sets are bounded outputs, so the set algebra
    runs on the collected results."""
    from ..stages.dedup import jaccard_pairs_exact, minhash_lsh_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    exact = _materialize(
        jaccard_pairs_exact(docs, "text", "doc_id", n=3, threshold=0.8,
                            shuffle_partitions=8),
        empty_schema=pa.schema([("a", pa.int64()), ("b", pa.int64()),
                                ("j", pa.float64())]))
    lsh = _materialize(
        minhash_lsh_pairs(docs, "text", "doc_id", n=3, threshold=0.8,
                          shuffle_partitions=8),
        empty_schema=pa.schema([("a", pa.int64()), ("b", pa.int64()),
                                ("j", pa.float64())]))
    e_pairs = set(zip(exact.column("a").to_pylist(),
                      exact.column("b").to_pylist()))
    l_pairs = set(zip(lsh.column("a").to_pylist(),
                      lsh.column("b").to_pylist()))
    return pa.table({
        "n_exact": pa.array([len(e_pairs)], pa.int64()),
        "n_lsh": pa.array([len(l_pairs)], pa.int64()),
        "n_both": pa.array([len(e_pairs & l_pairs)], pa.int64()),
    })


QUERIES20: Dict[str, Callable] = {
    "ngram_novelty_docs": q_ngram_novelty_docs,
    "distinct_ngrams_lang": q_distinct_ngrams_lang,
    "minhash_pr_report": q_minhash_pr_report,
}

SQL20: Dict[str, str] = {
    "ngram_novelty_docs": SQL_NGRAM_NOVELTY_DOCS,
    "distinct_ngrams_lang": SQL_DISTINCT_NGRAMS_LANG,
    # minhash_pr_report: rows-only by design (LSH not SQL-expressible)
}
