"""Driver-contract queries, batch 22 (see oracle.py for the contract):
BPE-ish regex token counting (the tokenizer-budget estimate SURVEY's
task brief calls for alongside whitespace counts) — per-document
counts and per-language fertility (regex-token / whitespace-token
ratio).  Both engines run the SAME RE2 pattern (Arrow
``count_substring_regex`` and DuckDB ``regexp_extract_all`` are both
RE2), so the counts are oracle-exact.
Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

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


# GPT-2-style pretokenizer, RE2-compatible (no lookahead): contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs,
# whitespace runs.  ASCII classes — the corpus is ASCII; swap in
# \p{L}/\p{N} for multilingual data (RE2 supports those too).
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def q_bpe_token_counts(sf_dir: str):
    """(doc_id, n_ws, n_bpe): whitespace-token count next to the
    BPE-ish regex token count — the context-window budget estimate run
    before packing documents into training sequences.  One stateless
    vectorized scan (two RE2 kernels per batch), no shuffle."""
    from ..stages.text import _row_counts, tokens_and_offsets

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def kernel(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("text")))
        _, offsets = tokens_and_offsets(batch.column("text"))
        n_bpe = pc.count_substring_regex(
            pc.cast(batch.column("text"), pa.string()), BPE_PATTERN)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_ws": pa.array(_row_counts(offsets)),
            "n_bpe": pc.cast(n_bpe, pa.int64()),
        })

    return _materialize(ds.map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True))


SQL_BPE_TOKEN_COUNTS = r"""
SELECT doc_id,
       CAST(CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) = '' THEN 0
            ELSE len(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\s+')) END AS BIGINT)
         AS n_ws,
       CAST(len(regexp_extract_all(text,
         '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+'))
         AS BIGINT) AS n_bpe
FROM documents WHERE text IS NOT NULL
"""


def q_bpe_fertility_lang(sf_dir: str):
    """(lang, n_ws, n_bpe): per-language tokenizer fertility numerators
    (regex tokens per whitespace word, as exact integer sums) — the
    signal that flags languages a tokenizer fragments badly.  Per-batch
    integer partials, one tiny groupby(lang) sum."""
    from ray.data.aggregate import Sum

    from ..stages.text import _row_counts, tokens_and_offsets

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("text")))
        _, offsets = tokens_and_offsets(batch.column("text"))
        n_bpe = pc.count_substring_regex(
            pc.cast(batch.column("text"), pa.string()), BPE_PATTERN)
        return pa.table({
            "lang": batch.column("lang"),
            "n_ws": pa.array(_row_counts(offsets)),
            "n_bpe": pc.cast(n_bpe, pa.int64()),
        })

    return _materialize(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("lang").aggregate(Sum("n_ws", alias_name="n_ws"),
                                   Sum("n_bpe", alias_name="n_bpe")))


SQL_BPE_FERTILITY_LANG = r"""
SELECT lang,
       CAST(sum(CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) = '' THEN 0
            ELSE len(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\s+')) END) AS BIGINT)
         AS n_ws,
       CAST(sum(len(regexp_extract_all(text,
         '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+')))
         AS BIGINT) AS n_bpe
FROM documents WHERE text IS NOT NULL GROUP BY lang
"""


QUERIES22: Dict[str, Callable] = {
    "bpe_token_counts": q_bpe_token_counts,
    "bpe_fertility_lang": q_bpe_fertility_lang,
}

SQL22: Dict[str, str] = {
    "bpe_token_counts": SQL_BPE_TOKEN_COUNTS,
    "bpe_fertility_lang": SQL_BPE_FERTILITY_LANG,
}
