"""Text analysis stages for large-scale training-data pipelines.

Not part of the datatest reference (which has no text operators —
SURVEY.md §2.H); these are the engine extensions a 100 TB document
pipeline needs: language ID (stopword-hit heuristic), quality scoring
(length / punctuation / stopword ratios), token counting, and document
fingerprinting.  All are stateless per-batch Arrow/numpy kernels fused
into ``map_batches`` — no shuffle, no Python loop over rows in the hot
path (tokenization uses ``pc.utf8_split_whitespace`` + flat-array
segment arithmetic).

Every function takes and returns a ``ray.data.Dataset`` and has an
ANSI-SQL-expressible definition (oracle pairs in pipelines/oracle.py).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.aggregates import hash64
from .base import round6_half_up as _r6

__all__ = [
    "STOPWORDS",
    "LANG_ORDER",
    "tokens_and_offsets",
    "feature_hash",
    "tfidf_cosine_pairs",
    "lm_bigram_score",
    "token_counts",
    "text_stats",
    "lang_id",
    "fingerprints",
    "vocab_topk",
    "repetition_stats",
    "normalize_fingerprint",
    "json_extract_int",
    "unnest_tokens",
    "redact",
    "tfidf_top_terms",
    "bpe_train",
    "readability_by_lang",
    "collocations_pmi",
    "lang_confusion",
    "vocab_richness",
    "heaps_law",
    "dsir_profile",
    "species_richness",
    "word_burstiness",
    "source_similarity",
    "script_mix_audit",
]

# Deterministic per-language stopword lists (tiny n-gram-free heuristic;
# the zh list is CJK so it never fires on latin-token corpora — that is
# intentional and mirrored by the SQL oracle).
STOPWORDS: Dict[str, List[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "pour", "que", "au"],
    "es": ["el", "los", "las", "y", "es", "una", "en", "para", "por", "con"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不", "人", "这"],
}
LANG_ORDER: Sequence[str] = ("en", "de", "fr", "es", "zh")

_PUNCT_RE = r"[.,;:!?]"


def tokens_and_offsets(text_col: pa.ChunkedArray):
    """Whitespace-tokenize a string column (lowercased) into a flat token
    array + row offsets — the vectorized base for every text kernel."""
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    toks = pc.utf8_split_whitespace(pc.utf8_lower(text_col))
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = toks.flatten()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    # Arrow's split emits empty strings at leading/trailing/consecutive
    # whitespace; drop them so semantics equal whitespace-set trim
    # (SQL: trim(text, ' '||chr(9)||chr(10)||...)) + split on
    # \s+ (the SQL-oracle definition).  Filter on trim != '' rather than
    # != '': a token is by definition a maximal non-whitespace run, so
    # any whitespace-only output is a split artifact — observed once as
    # a literal ' ' token from utf8_split_whitespace on a warm Ray
    # worker (heap-state-dependent kernel quirk); trimming makes the
    # tokenizer immune to that class of artifact.
    nonempty = pc.not_equal(
        pc.utf8_trim_whitespace(flat), ""
    ).to_numpy(zero_copy_only=False)
    if not nonempty.all():
        n_rows = len(offsets) - 1
        parents = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(offsets))
        flat = flat.filter(pa.array(nonempty))
        counts = np.bincount(parents[nonempty], minlength=n_rows).astype(np.int64)
        offsets = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
    return flat, offsets


def _row_counts(offsets: np.ndarray) -> np.ndarray:
    return np.diff(offsets)


def _per_row_hits(flat: pa.Array, offsets: np.ndarray, words: Sequence[str]) -> np.ndarray:
    """Number of token OCCURRENCES per row that fall in ``words``."""
    n_rows = len(offsets) - 1
    if len(flat) == 0:
        return np.zeros(n_rows, dtype=np.int64)
    mask = pc.is_in(flat, value_set=pa.array(words)).to_numpy(zero_copy_only=False)
    parents = np.repeat(np.arange(n_rows, dtype=np.int64), _row_counts(offsets))
    return np.bincount(parents, weights=mask, minlength=n_rows).astype(np.int64)


def token_counts(ds, text_col: str, id_col: str):
    """(id, n_tokens) per document.  SQL: len(string_split_regex(trim(..)))."""

    def kernel(batch: pa.Table) -> pa.Table:
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        return pa.table(
            {id_col: batch.column(id_col), "n_tokens": pa.array(_row_counts(offsets))}
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


def text_stats(ds, text_col: str, id_col: str):
    """Quality scoring: (id, n_tokens, n_chars, punct, stop_hits, quality).

    quality = 0.5 * min(n_tokens, 100)/100
            + 0.3 * stop_hits/max(n_tokens, 1)
            + 0.2 * (1 - punct/max(n_chars, 1))

    Exactly mirrored by SQL_TEXT_QUALITY in pipelines/oracle.py.
    """
    en_words = STOPWORDS["en"]

    def kernel(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        flat, offsets = tokens_and_offsets(text)
        n_tok = _row_counts(offsets).astype(np.float64)
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.float64)
        punct = pc.count_substring_regex(text, _PUNCT_RE).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        stop = _per_row_hits(flat, offsets, en_words).astype(np.float64)
        quality = (
            0.5 * (np.minimum(n_tok, 100.0) / 100.0)
            + 0.3 * (stop / np.maximum(n_tok, 1.0))
            + 0.2 * (1.0 - punct / np.maximum(n_chars, 1.0))
        )
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": pa.array(n_tok.astype(np.int64)),
                "n_chars": pa.array(n_chars.astype(np.int64)),
                "punct": pa.array(punct.astype(np.int64)),
                "stop_hits": pa.array(stop.astype(np.int64)),
                "quality": pa.array(quality),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


def lang_id(ds, text_col: str, id_col: str):
    """Language ID: stopword-occurrence score per language; prediction is
    the first language (in LANG_ORDER) attaining the max score, or
    'unknown' when every score is zero.  Mirrored by SQL_LANG_ID."""

    def kernel(batch: pa.Table) -> pa.Table:
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        n_rows = batch.num_rows
        scores = np.zeros((n_rows, len(LANG_ORDER)), dtype=np.int64)
        for j, lang in enumerate(LANG_ORDER):
            scores[:, j] = _per_row_hits(flat, offsets, STOPWORDS[lang])
        best = np.argmax(scores, axis=1)  # first max wins (= SQL CASE chain)
        pred = np.asarray(LANG_ORDER, dtype=object)[best]
        pred[scores.sum(axis=1) == 0] = "unknown"
        return pa.table(
            {id_col: batch.column(id_col), "lang_pred": pa.array(pred)}
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


def fingerprints(ds, text_col: str, id_col: str):
    """Content fingerprint: md5 hexdigest of the raw text (md5 so DuckDB
    can recompute it — the exact-dedup key in stages/dedup.py)."""
    import hashlib

    def kernel(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        fp = [hashlib.md5(("" if t is None else t).encode("utf-8")).hexdigest() for t in texts]
        return pa.table({id_col: batch.column(id_col), "fingerprint": pa.array(fp)})

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


def redact(ds, text_col: str, id_col: str, rules):
    """PII-style scrubbing: apply ``rules`` — an ordered list of
    ``(name, regex, replacement)`` — SEQUENTIALLY to every document.
    Output: ``id_col``, ``redacted`` (final text), and one ``n_<name>``
    count per rule, counted against the text state the rule saw (so an
    email redacted by rule 1 no longer feeds rule 2's number count —
    the semantics a scrub pipeline wants, and the one an oracle can
    mirror with nested regexp_replace).

    Fully vectorized: Arrow's RE2 kernels (count_substring_regex /
    replace_substring_regex) per batch, no per-row Python; patterns are
    RE2 on both Arrow and DuckDB, so oracle parity is exact."""

    def kernel(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col)
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        cols = {id_col: batch.column(id_col)}
        for name, pattern, replacement in rules:
            cols[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(s, pattern=pattern), pa.int64())
            s = pc.replace_substring_regex(
                s, pattern=pattern, replacement=replacement)
        cols["redacted"] = s
        return pa.table(cols)

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


def vocab_topk(ds, text_col: str, *, k: int = 20):
    """Corpus vocabulary top-k: the k most frequent lowercase tokens,
    (token, n), ties broken by token ascending (deterministic across
    engines).

    Plan: per-batch ``pc.value_counts`` over the flat token array is the
    COMBINER (the shuffle moves at most one row per distinct token per
    block, never per occurrence), ONE ``groupby(token).sum`` exchange,
    then a k-row sort+limit.  At 100 TB the shuffle volume is bounded by
    blocks x per-block vocabulary, not corpus token count."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        flat, _ = tokens_and_offsets(batch.column(text_col))
        vc = pc.value_counts(flat)
        return pa.table({
            "token": vc.field("values"),
            "n": vc.field("counts").cast(pa.int64()),
        })

    partials = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    totals = partials.groupby("token").aggregate(Sum("n", alias_name="n"))
    return totals.sort(["n", "token"], descending=[True, False]).limit(k)


def unnest_tokens(ds, text_col: str, id_col: str):
    """Row explosion (SQL ``unnest``): one output row per token
    OCCURRENCE, (id, token) — the flat_map primitive tokenized corpora
    feed into downstream count/index builds.  Pure per-batch Arrow
    (flat token array + vectorized id repeat): the expansion factor is
    the only data amplification, no shuffle, no Python loop."""

    def kernel(batch: pa.Table) -> pa.Table:
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        ids = batch.column(id_col)
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
        take = np.repeat(
            np.arange(batch.num_rows, dtype=np.int64), _row_counts(offsets)
        )
        return pa.table({
            id_col: ids.take(pa.array(take)),
            "token": flat,
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


def repetition_stats(ds, text_col: str, id_col: str):
    """Intra-document repetition: (id, n_tokens, n_distinct, dup_frac)
    with ``dup_frac = 1 - n_distinct / n_tokens`` (0.0 for empty docs).

    The boilerplate/low-quality signal LLM corpus filters key on.
    Fully vectorized: one dictionary-encode of the flat token array,
    distinct-per-row via a (row, code) lexsort dedup — no Python loop,
    no shuffle.  SQL: ``len(list_distinct(string_split_regex(...)))``.
    """

    def kernel(batch: pa.Table) -> pa.Table:
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        counts = _row_counts(offsets)
        n_rows = len(counts)
        if len(flat) == 0:
            distinct = np.zeros(n_rows, dtype=np.int64)
        else:
            enc = pc.dictionary_encode(flat)
            codes = np.asarray(enc.indices, dtype=np.int64)
            parents = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
            order = np.lexsort((codes, parents))
            ps, cs = parents[order], codes[order]
            keep = np.ones(len(cs), dtype=bool)
            keep[1:] = (ps[1:] != ps[:-1]) | (cs[1:] != cs[:-1])
            distinct = np.bincount(ps[keep], minlength=n_rows).astype(np.int64)
        dup_frac = np.where(
            counts > 0, 1.0 - distinct / np.maximum(counts, 1), 0.0
        )
        return pa.table({
            id_col: batch.column(id_col),
            "n_tokens": pa.array(counts),
            "n_distinct": pa.array(distinct),
            "dup_frac": pa.array(dup_frac),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


def normalize_fingerprint(ds, text_col: str, id_col: str):
    """Canonicalizing normalization before dedup: lowercase, strip
    sentence punctuation, collapse runs of whitespace, trim — then the
    md5 of the normalized text (md5 so DuckDB recomputes it exactly).
    Output: (id, norm_len, norm_fp)."""
    import hashlib

    def kernel(batch: pa.Table) -> pa.Table:
        t = pc.utf8_lower(batch.column(text_col))
        t = pc.replace_substring_regex(t, _PUNCT_RE, "")
        t = pc.replace_substring_regex(t, r"\s+", " ")
        t = pc.utf8_trim_whitespace(t)
        texts = t.to_pylist()
        fp = [hashlib.md5(("" if s is None else s).encode("utf-8")).hexdigest()
              for s in texts]
        return pa.table({
            id_col: batch.column(id_col),
            "norm_len": pc.utf8_length(t).cast(pa.int64()),
            "norm_fp": pa.array(fp),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


def json_extract_int(ds, col: str, id_col: str, *, key: str,
                     out: str = "val"):
    """Extract an integer field from a flat JSON-object string column
    (``{"k": 69}`` -> 69), vectorized via ``pc.extract_regex`` — the
    hot-path projection for semi-structured event payloads.  Null when
    the key is absent or non-integer.  SQL: ``json_extract`` cast to
    BIGINT."""
    import re

    pattern = r'"' + re.escape(key) + r'"\s*:\s*(?P<v>-?\d+)'

    def kernel(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch.column(col), pattern)
        vals = pc.struct_field(m, "v")
        return pa.table({
            id_col: batch.column(id_col),
            out: pc.cast(vals, pa.int64()),
        })

    return ds.select_columns([id_col, col]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


def shingle_hash_sets(
    flat_tokens: pa.Array, offsets: np.ndarray, n: int = 3, tok_hash=None
):
    """Per-row DISTINCT hashes of n-token shingles, fully vectorized.

    Returns (flat_shingle_hashes: uint64, shingle_offsets: int64) in the
    same flat+offsets layout as the token input.  Token hashes are mixed
    with a polynomial rolling combine so no shingle strings are ever
    materialized.  ``tok_hash`` overrides the token-hash function
    (default ``hash64``); pass ``dedup.md5_hash64`` for hashes that are
    bit-reproducible in SQL (DuckDB ``md5_number_lower``).
    """
    tok_h = (tok_hash or hash64)(flat_tokens)
    counts = _row_counts(offsets)
    n_rows = len(counts)
    sh_counts = np.maximum(counts - (n - 1), 0)
    if sh_counts.sum() == 0:
        return (
            np.empty(0, dtype=np.uint64),
            np.zeros(n_rows + 1, dtype=np.int64),
        )
    C = np.uint64(0x9E3779B97F4A7C15)
    # poly combine of n consecutive token hashes; windows never cross row
    # boundaries because we only take the first (count - n + 1) per row.
    acc = tok_h[: len(tok_h) - (n - 1)].copy()
    for k in range(1, n):
        acc = acc * C + tok_h[k : len(tok_h) - (n - 1) + k]
    # valid window start positions per row
    starts = np.repeat(offsets[:-1], sh_counts) + _concat_ranges(sh_counts)
    flat_sh = acc[starts]
    # distinct within each row
    parents = np.repeat(np.arange(n_rows, dtype=np.int64), sh_counts)
    order = np.lexsort((flat_sh, parents))
    ps, hs = parents[order], flat_sh[order]
    keep = np.ones(len(hs), dtype=bool)
    keep[1:] = (ps[1:] != ps[:-1]) | (hs[1:] != hs[:-1])
    ps, hs = ps[keep], hs[keep]
    out_counts = np.bincount(ps, minlength=n_rows).astype(np.int64)
    out_offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(out_counts, out=out_offsets[1:])
    return hs, out_offsets


def _concat_ranges(counts: np.ndarray) -> np.ndarray:
    """[arange(c) for c in counts] concatenated, vectorized."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ids = np.arange(total, dtype=np.int64)
    offs = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=offs[1:])
    return ids - np.repeat(offs, counts)


def tfidf_top_terms(ds, text_col: str, id_col: str, *, group_col: str,
                    k: int = 5):
    """Top-k terms per group by tf-idf: ``score = tf * ln(N / df)``
    with tf = term occurrences inside the group, df = number of docs
    (corpus-wide) containing the term, N = total docs — the
    keyword-profile / topic-drift probe of a corpus pipeline.

    Plan: two count pipelines that never shuffle tokens —
    (1) per-batch (group, term) occurrence counts → ONE
    ``groupby(group, term).sum``; (2) per-batch per-doc DISTINCT terms
    (docs never span batches, so per-batch dedup is exact) →
    ``groupby(term).sum`` = df.  The df table is vocabulary-sized and
    broadcast once via ``ray.put``; score attach + per-group top-k are
    vectorized.  Ties break (score DESC, term ASC).  Assumption: the
    VOCABULARY (not the corpus) fits a worker's heap."""
    import ray
    from ray.data.aggregate import Sum

    n_docs = ds.count()

    def tf_partial(batch: pa.Table) -> pa.Table:
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        groups = batch.column(group_col)
        groups = (groups.combine_chunks()
                  if isinstance(groups, pa.ChunkedArray) else groups)
        parents = np.repeat(np.arange(batch.num_rows, dtype=np.int64),
                            _row_counts(offsets))
        t = pa.table({"g": groups.take(pa.array(parents)), "term": flat})
        c = t.group_by(["g", "term"]).aggregate([([], "count_all")])
        return c.rename_columns([group_col, "term", "tf"])

    tf = (
        ds.select_columns([group_col, text_col])
        .map_batches(tf_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([group_col, "term"])
        .aggregate(Sum("tf", alias_name="tf"))
    )

    def df_partial(batch: pa.Table) -> pa.Table:
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        parents = np.repeat(np.arange(batch.num_rows, dtype=np.int64),
                            _row_counts(offsets))
        t = pa.table({"d": pa.array(parents), "term": flat})
        dt = t.group_by(["d", "term"]).aggregate([])  # distinct (doc, term)
        vc = pc.value_counts(dt.column("term").combine_chunks())
        return pa.table({"term": vc.field("values"),
                         "df": vc.field("counts").cast(pa.int64())})

    df = (
        ds.select_columns([text_col])
        .map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
    )
    from .base import collect_table

    df_t = collect_table(df, ["term", "df"])
    handle = ray.put((df_t.column("term").combine_chunks(),
                      df_t.column("df").to_numpy(zero_copy_only=False)))

    def topk(group: pa.Table) -> pa.Table:
        terms, dfs = ray.get(handle)
        idx = pc.index_in(group.column("term"), value_set=terms)
        pos = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        tfv = group.column("tf").to_numpy(zero_copy_only=False).astype(
            np.float64)
        dfv = dfs[pos].astype(np.float64)
        score = tfv * np.log(n_docs / dfv)
        t = group.append_column("score", pa.array(score)).append_column(
            "df", pa.array(dfv.astype(np.int64)))
        t = t.sort_by([("score", "descending"), ("term", "ascending")])
        return t.select([group_col, "term", "tf", "df", "score"]).slice(0, k)

    return tf.groupby(group_col).map_groups(topk, batch_format="pyarrow")


def lexical_richness(ds, text_col: str, *, group_col: str):
    """Per-group lexical-richness profile: token occurrences, distinct
    types, hapax legomena (types seen exactly once in the group) and
    type–token ratio — the vocabulary-health screen of corpus QA.

    Plan: per-batch (group, token) pre-counts via dictionary-code
    bincount (the combiner — the first shuffle moves one row per
    distinct (group, token) per block, never per occurrence), ONE
    ``groupby([group, token]).sum`` to merge counts, then a second
    TINY ``groupby(group)`` over per-type rows reduced to
    (n_tokens, n_types, hapax).  Output: (group, n_tokens, n_types,
    hapax, ttr) with ``ttr = n_types / n_tokens`` (raw quotient)."""
    from ray.data.aggregate import Count, Sum

    def partial(batch: pa.Table) -> pa.Table:
        gcol = batch.column(group_col)
        gcol = gcol.combine_chunks() if isinstance(gcol, pa.ChunkedArray) \
            else gcol
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        if len(flat) == 0:
            return pa.table({group_col: pa.array([], gcol.type),
                             "token": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        parents = np.repeat(np.arange(batch.num_rows, dtype=np.int64),
                            _row_counts(offsets))
        genc = pc.dictionary_encode(gcol)
        gcode = np.asarray(genc.indices, dtype=np.int64)[parents]
        tenc = pc.dictionary_encode(flat)
        tcode = np.asarray(tenc.indices, dtype=np.int64)
        V = len(tenc.dictionary)
        pair = gcode * V + tcode
        cnt = np.bincount(pair)
        nz = np.flatnonzero(cnt)
        return pa.table({
            group_col: pc.take(genc.dictionary,
                               pa.array(nz // V, pa.int64())),
            "token": pc.take(tenc.dictionary, pa.array(nz % V, pa.int64())),
            "c": pa.array(cnt[nz], pa.int64()),
        })

    tc = ds.select_columns([group_col, text_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby([group_col, "token"]).aggregate(Sum("c", alias_name="c"))

    def mark(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy(zero_copy_only=False)
        return pa.table({
            group_col: t.column(group_col),
            "c": t.column("c"),
            "h": pa.array((c == 1).astype(np.int64)),
        })

    agg = tc.map_batches(mark, batch_format="pyarrow",
                         zero_copy_batch=True).groupby(group_col).aggregate(
        Sum("c", alias_name="n_tokens"),
        Count(alias_name="n_types"),
        Sum("h", alias_name="hapax"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        nt = t.column("n_tokens").to_numpy(zero_copy_only=False).astype(
            np.float64)
        ty = t.column("n_types").to_numpy(zero_copy_only=False).astype(
            np.float64)
        # exact integer quotient → bitwise-equal on both engines; no
        # query-side rounding (np half-even vs SQL half-away diverge
        # when the quotient lands exactly on a 6dp half)
        with np.errstate(invalid="ignore", divide="ignore"):
            ttr = ty / nt
        return pa.table({
            group_col: t.column(group_col),
            "n_tokens": t.column("n_tokens"),
            "n_types": t.column("n_types"),
            "hapax": t.column("hapax"),
            "ttr": pa.array(ttr, pa.float64(), mask=nt == 0),
        })

    return agg.map_batches(finalize, batch_format="pyarrow",
                           zero_copy_batch=True)


def bigram_topk(ds, text_col: str, *, k: int = 20):
    """Corpus bigram top-k: the k most frequent consecutive lowercase
    token pairs, (w1, w2, n), ties broken by (w1, w2) ascending.

    Same combiner discipline as :func:`vocab_topk`: per-batch
    dictionary-code bincount pre-counts pairs (the shuffle moves one
    row per distinct bigram per block, never per occurrence), one
    ``groupby([w1, w2]).sum`` — key space bounded by the observed
    bigram vocabulary, not the corpus — then a k-row sort+limit."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        empty = pa.table({"w1": pa.array([], pa.string()),
                          "w2": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if len(flat) < 2:
            return empty
        parents = np.repeat(np.arange(len(offsets) - 1, dtype=np.int64),
                            _row_counts(offsets))
        enc = pc.dictionary_encode(flat)
        code = np.asarray(enc.indices, dtype=np.int64)
        same = parents[1:] == parents[:-1]
        if not same.any():
            return empty
        V = len(enc.dictionary)
        pair = code[:-1][same] * V + code[1:][same]
        cnt = np.bincount(pair)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "w1": pc.take(enc.dictionary, pa.array(nz // V, pa.int64())),
            "w2": pc.take(enc.dictionary, pa.array(nz % V, pa.int64())),
            "n": pa.array(cnt[nz], pa.int64()),
        })

    partials = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    totals = partials.groupby(["w1", "w2"]).aggregate(
        Sum("n", alias_name="n"))
    return totals.sort(["n", "w1", "w2"],
                       descending=[True, False, False]).limit(k)


def feature_hash(ds, text_col: str, *, by: str, n_buckets: int = 16):
    """Hashing-trick token features: per ``by`` group, token
    occurrences folded into a fixed ``n_buckets``-wide count vector via
    ``md5(token) % n_buckets`` — the unbounded-vocabulary encoder
    (Weinberger et al.'s feature hashing) that needs no vocab build or
    second pass.

    Output: (by, bucket int64, n int64), one row per non-empty
    (group, bucket) cell.  Plan: per-batch combiner hashes only the
    batch's DISTINCT tokens (dictionary-encode first — the md5 loop
    runs over the block vocabulary, not token occurrences), scatters
    counts with one bincount over ``group_code·n_buckets + bucket``,
    and ships ≤ groups×n_buckets partial rows into ONE tiny groupby
    sum.  md5 (not hash64) IS the cross-engine contract: DuckDB
    recomputes the identical bucket assignment.
    """
    import hashlib

    from ray.data.aggregate import Sum

    from ..functions.aggregates import dict_encode_keep_null

    def partial(batch: pa.Table) -> pa.Table:
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        gcode, gdict = dict_encode_keep_null(batch.column(by))
        row_of_tok = np.repeat(
            np.arange(batch.num_rows, dtype=np.int64), _row_counts(offsets)
        )
        tenc = pc.dictionary_encode(flat)
        tcode = np.asarray(tenc.indices, dtype=np.int64)
        vocab = tenc.dictionary.to_pylist()
        tb = np.array(
            [int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16)
             % n_buckets for t in vocab],
            dtype=np.int64,
        ) if vocab else np.empty(0, dtype=np.int64)
        cell = gcode[row_of_tok] * n_buckets + tb[tcode]
        m = len(gdict) * n_buckets
        cnt = np.bincount(cell, minlength=m).astype(np.int64)
        keep = np.flatnonzero(cnt)
        return pa.table({
            by: pc.take(gdict, pa.array(keep // n_buckets)),
            "bucket": pa.array(keep % n_buckets),
            "n": pa.array(cnt[keep]),
        })

    return ds.select_columns([by, text_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby([by, "bucket"]).aggregate(Sum("n", alias_name="n"))


def tfidf_cosine_pairs(ds, text_col: str, id_col: str, *,
                       vocab_k: int = 64, threshold: float = 0.9,
                       n_blocks: int = 8):
    """Sparse-text near-dup by TF-IDF cosine: all document pairs whose
    tf-idf vectors over the corpus's top-``vocab_k`` tokens (by df,
    ties token-ascending) have cosine >= ``threshold`` — the
    profile-similarity complement to shingle Jaccard (it matches
    reworded documents with the same vocabulary mix, which share few
    3-gram shingles).

    Plan: (1) one groupby(token) df pass over per-doc DISTINCT token
    partials; top-k vocabulary + ln(N/df) idf broadcast via ``ray.put``
    (assumption: the CUT vocabulary is small by construction —
    ``vocab_k`` rows).  (2) a streaming per-batch vectorize: each doc
    becomes a dense vocab_k-wide tf·idf vector (one bincount per
    batch — no per-row Python).  (3) the existing exact block-pair
    grid join (``similarity.neardup_cosine_pairs(mode='blocked')``) —
    no whole-corpus broadcast, no O(N²) GEMM in one task.  Output:
    (a, b, sim rounded 6dp).  Docs with no vocabulary token (zero
    norm) drop out, mirroring the SQL oracle's inner joins.
    """
    import ray
    from ray.data.aggregate import Count

    from .similarity import neardup_cosine_pairs

    # metadata-only count on a parquet-backed projection (no data pass)
    n_docs = ds.count()

    def distinct_tokens(batch: pa.Table) -> pa.Table:
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        row = np.repeat(np.arange(batch.num_rows, dtype=np.int64),
                        _row_counts(offsets))
        enc = pc.dictionary_encode(flat)
        code = np.asarray(enc.indices, dtype=np.int64)
        pair = np.unique(row * len(enc.dictionary) + code)
        return pa.table({
            "token": pc.take(enc.dictionary,
                             pa.array(pair % len(enc.dictionary))),
        })

    from .base import collect_table

    df_tbl = collect_table(
        ds.select_columns([text_col])
        .map_batches(distinct_tokens, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("token").aggregate(Count(alias_name="df"))
        .sort(["df", "token"], descending=[True, False]).limit(vocab_k),
        ["token", "df"])
    vocab = df_tbl.column("token").to_pylist()
    idf = np.log(float(n_docs) / df_tbl.column("df").to_numpy(
        zero_copy_only=False).astype(np.float64))
    handle = ray.put((vocab, idf))

    def vectorize(batch: pa.Table) -> pa.Table:
        voc, idf_ = ray.get(handle)
        V = len(voc)
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        row = np.repeat(np.arange(batch.num_rows, dtype=np.int64),
                        _row_counts(offsets))
        pos = pc.index_in(flat, value_set=pa.array(voc, pa.string()))
        posn = pos.to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(posn)
        cell = row[ok] * V + posn[ok].astype(np.int64)
        tf = np.bincount(cell, minlength=batch.num_rows * V).astype(
            np.float64).reshape(batch.num_rows, V)
        w = tf * idf_[None, :]
        norm = np.sqrt((w * w).sum(axis=1))
        keep = norm > 0
        w = w[keep]
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            id_col: pa.array(ids),
            "vec": pa.FixedSizeListArray.from_arrays(
                pa.array(w.ravel(), pa.float64()), V),
        })

    vecs = ds.select_columns([id_col, text_col]).map_batches(
        vectorize, batch_format="pyarrow", zero_copy_batch=True)
    return neardup_cosine_pairs(vecs, id_col=id_col, vec_col="vec",
                                threshold=threshold, mode="blocked",
                                n_blocks=n_blocks)


def lm_bigram_score(ds, text_col: str, id_col: str):
    """Per-document average bigram log-likelihood under the corpus's
    OWN add-one-smoothed bigram model — the CCNet-style statistical
    quality filter (gibberish and boilerplate score far from the
    corpus mode): score(d) = mean over consecutive token pairs of
    ``ln((c12 + 1) / (c1 + V))``.

    Output: (id_col, lm float64); docs with <2 tokens drop out.

    Plan: unigram and bigram corpus counts aggregate through the same
    one-row-per-distinct-ngram combiners as :func:`vocab_topk` /
    :func:`bigram_topk`, then the fitted model (vocab, c1, sorted
    bigram keys) broadcasts via ``ray.put`` — the standard n-gram-LM
    assumption (the MODEL fits in memory; the corpus does not) — and
    the scoring pass streams with one ``searchsorted`` lookup per
    batch.  No shuffle touches document text beyond the count passes.
    """
    import ray
    from ray.data.aggregate import Sum

    def uni_partial(batch: pa.Table) -> pa.Table:
        flat, _ = tokens_and_offsets(batch.column(text_col))
        vc = pc.value_counts(flat)
        return pa.table({"w": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    uni = pa.concat_tables(list(
        ds.select_columns([text_col])
        .map_batches(uni_partial, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("w").aggregate(Sum("n", alias_name="n"))
        .iter_batches(batch_format="pyarrow")
    ))
    vocab = uni.column("w")
    vocab = vocab.combine_chunks() if isinstance(vocab, pa.ChunkedArray) \
        else vocab
    c1 = uni.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    V = len(c1)

    def bi_partial(batch: pa.Table) -> pa.Table:
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        empty = pa.table({"w1": pa.array([], pa.string()),
                          "w2": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if len(flat) < 2:
            return empty
        parents = np.repeat(np.arange(len(offsets) - 1, dtype=np.int64),
                            _row_counts(offsets))
        enc = pc.dictionary_encode(flat)
        code = np.asarray(enc.indices, dtype=np.int64)
        same = parents[1:] == parents[:-1]
        if not same.any():
            return empty
        k = len(enc.dictionary)
        pair = code[:-1][same] * k + code[1:][same]
        cnt = np.bincount(pair)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "w1": pc.take(enc.dictionary, pa.array(nz // k, pa.int64())),
            "w2": pc.take(enc.dictionary, pa.array(nz % k, pa.int64())),
            "n": pa.array(cnt[nz], pa.int64()),
        })

    bi = pa.concat_tables(list(
        ds.select_columns([text_col])
        .map_batches(bi_partial, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby(["w1", "w2"]).aggregate(Sum("n", alias_name="n"))
        .iter_batches(batch_format="pyarrow")
    ))
    i1 = pc.index_in(bi.column("w1"), value_set=vocab).to_numpy(
        zero_copy_only=False).astype(np.int64)
    i2 = pc.index_in(bi.column("w2"), value_set=vocab).to_numpy(
        zero_copy_only=False).astype(np.int64)
    bkey = i1 * V + i2
    bcnt = bi.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(bkey)
    handle = ray.put((vocab, c1, bkey[order], bcnt[order]))

    def score(batch: pa.Table) -> pa.Table:
        voc, c1_, bk, bn = ray.get(handle)
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        n_rows = batch.num_rows
        ids = batch.column(id_col)
        empty = pa.table({id_col: pa.array([], ids.type),
                          "lm": pa.array([], pa.float64())})
        if len(flat) < 2:
            return empty
        parents = np.repeat(np.arange(n_rows, dtype=np.int64),
                            _row_counts(offsets))
        pos = pc.index_in(flat, value_set=voc).to_numpy(
            zero_copy_only=False).astype(np.int64)
        same = parents[1:] == parents[:-1]
        if not same.any():
            return empty
        key = pos[:-1][same] * len(c1_) + pos[1:][same]
        row = parents[:-1][same]
        loc = np.searchsorted(bk, key)
        loc = np.minimum(loc, len(bk) - 1)
        c12 = np.where(bk[loc] == key, bn[loc], 0)
        lp = np.log((c12 + 1.0) / (c1_[pos[:-1][same]] + len(c1_)))
        s = np.bincount(row, weights=lp, minlength=n_rows)
        cnt = np.bincount(row, minlength=n_rows)
        keep = cnt > 0
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
        return pa.table({
            id_col: ids.filter(pa.array(keep)),
            "lm": pa.array(s[keep] / cnt[keep]),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True)


def pack_contexts(ds, text_col: str, id_col: str, *, group_col: str,
                  budget: int = 512):
    """Concat-and-split context packing (pretraining style): within each
    group, docs ordered by id form one conceptual token stream cut into
    fixed ``budget``-token windows; each doc reports the window range
    [first_bin, last_bin] it lands in (spanning >1 bin = split doc).

    Plan: ONE fused tokenize pass -> tiny (group, id, n_tokens) rows ->
    ``groupby(group).map_groups`` ordered prefix-sum.  Group count is
    the grouping-key cardinality (languages: small); a huge single
    group would two-phase the same kernel as per-block partial sums +
    offset broadcast — same documented assumption as sessionize.
    """

    def kernel(batch: pa.Table) -> pa.Table:
        _, offsets = tokens_and_offsets(batch.column(text_col))
        return pa.table({
            id_col: batch.column(id_col),
            group_col: batch.column(group_col),
            "n_tokens": pa.array(_row_counts(offsets)),
        })

    counts = ds.select_columns([id_col, group_col, text_col]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )

    def pack(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group.column(id_col))
        g = group.take(order)
        n = g.column("n_tokens").to_numpy(zero_copy_only=False)
        cum = np.cumsum(n)
        prev = cum - n
        first = prev // budget
        # a zero-token doc occupies no span: pin it to the boundary bin
        last = np.where(n > 0, (cum - 1) // budget, first)
        return pa.table({
            id_col: g.column(id_col),
            group_col: g.column(group_col),
            "n_tokens": pa.array(n),
            "first_bin": pa.array(first.astype(np.int64)),
            "last_bin": pa.array(last.astype(np.int64)),
        })

    return counts.groupby(group_col).map_groups(pack, batch_format="pyarrow")


def zipf_slope(ds, text_col: str, *, group_col: str):
    """Per-group Zipf exponent: OLS slope of ln(freq) ~ ln(rank) over
    the group's token vocabulary (rank by count desc, token asc) — the
    corpus-statistics sanity check that a text source follows the
    expected power law (slope ~ -1 for natural language).

    Plan: per-batch (group, token) value-count COMBINER -> ONE
    ``groupby(group, token).sum`` exchange bounded by blocks x per-block
    vocabulary -> per-group vectorized rank + closed-form OLS in
    ``map_groups`` (a group holds one row per DISTINCT token, not per
    occurrence).  Groups with vocabulary < 2 get a NULL slope.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        g = batch.column(group_col)
        g = g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
        take = np.repeat(
            np.arange(batch.num_rows, dtype=np.int64), _row_counts(offsets)
        )
        occ = pa.table({group_col: g.take(pa.array(take)), "token": flat})
        counts = occ.group_by([group_col, "token"]).aggregate(
            [("token", "count")]
        )
        return pa.table({
            group_col: counts.column(group_col),
            "token": counts.column("token"),
            "n": counts.column("token_count").cast(pa.int64()),
        })

    totals = ds.select_columns([group_col, text_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby([group_col, "token"]).aggregate(Sum("n", alias_name="n"))

    def slope(group: pa.Table) -> pa.Table:
        n = group.column("n").to_numpy(zero_copy_only=False)
        tok = group.column("token").to_numpy(zero_copy_only=False)
        order = np.lexsort((tok, -n))
        y = np.log(n[order].astype(np.float64))
        x = np.log(np.arange(1, len(y) + 1, dtype=np.float64))
        v = float(len(y))
        denom = float((x * x).sum() - x.sum() * x.sum() / v) if v > 1 else 0.0
        s = (
            float(((x * y).sum() - x.sum() * y.sum() / v) / denom)
            if denom > 0 else None
        )
        gval = group.column(group_col)[0]
        return pa.table({
            group_col: pa.array([gval.as_py()]),
            "vocab": pa.array([len(y)], pa.int64()),
            "slope": pa.array([s], pa.float64()),
        })

    return totals.groupby(group_col).map_groups(slope, batch_format="pyarrow")


def pack_greedy(ds, text_col: str, id_col: str, *, group_col: str,
                budget: int = 512):
    """Whole-document next-fit packing: within each group, docs ordered
    by id are placed into the current bin while its token total stays
    <= ``budget``; an overflowing doc starts a new bin (an oversized doc
    sits alone in its own bin).  No doc is split — the instruction-
    tuning-style packing counterpart to ``pack_contexts``.

    Plan: same fused tokenize -> tiny (group, id, n_tokens) rows ->
    ``groupby(group).map_groups``.  The per-group kernel gallops with
    ``np.searchsorted`` over the token prefix-sum — one step per BIN,
    not per doc (the recursion is inherently sequential; same
    documented per-group assumption as sessionize/cusum).
    """

    def kernel(batch: pa.Table) -> pa.Table:
        _, offsets = tokens_and_offsets(batch.column(text_col))
        return pa.table({
            id_col: batch.column(id_col),
            group_col: batch.column(group_col),
            "n_tokens": pa.array(_row_counts(offsets)),
        })

    counts = ds.select_columns([id_col, group_col, text_col]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )

    def pack(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group.column(id_col))
        g = group.take(order)
        n = g.column("n_tokens").to_numpy(zero_copy_only=False)
        cum = np.cumsum(n)
        bins = np.empty(len(n), dtype=np.int64)
        start, b, base = 0, 0, 0
        while start < len(n):
            j = int(np.searchsorted(cum, base + budget, side="right"))
            if j <= start:            # single doc over budget: take it alone
                j = start + 1
            elif j < len(n) and cum[j - 1] == base:
                # bin holds only zero-token docs so far (filled == 0):
                # the overflowing doc still joins this bin — mirrors the
                # `filled > 0` guard in the next-fit recursion
                j += 1
            bins[start:j] = b
            base = int(cum[j - 1])
            start, b = j, b + 1
        return pa.table({
            id_col: g.column(id_col),
            group_col: g.column(group_col),
            "n_tokens": pa.array(n),
            "bin": pa.array(bins),
        })

    return counts.groupby(group_col).map_groups(pack, batch_format="pyarrow")


def boilerplate_ngrams(ds, text_col: str, *, n: int = 5, k: int = 20):
    """Top-k most repeated token n-grams across the corpus — the
    boilerplate/template detector (repeated banners, headers, license
    blurbs) that feeds a remove-list for corpus cleaning.

    Plan: n-gram STRINGS are built per batch fully vectorized
    (flat token array + window masks + ``binary_join_element_wise``),
    reduced by per-batch ``value_counts`` (combiner), then ONE
    ``groupby(gram).sum`` exchange and a k-row sort — shuffle volume is
    bounded by per-block distinct n-grams, never occurrences.  Ties
    break (count desc, gram asc) for a total order.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        counts = _row_counts(offsets)
        row_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        base = np.arange(len(flat), dtype=np.int64)
        valid = base + (n - 1) < offsets[1:][row_of] if len(flat) else base
        idx = base[valid] if len(flat) else base
        if len(idx) == 0:
            return pa.table({"gram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        parts = [flat.take(pa.array(idx + j)) for j in range(n)]
        grams = pc.binary_join_element_wise(*parts, " ")
        vc = pc.value_counts(grams)
        return pa.table({
            "gram": vc.field("values"),
            "n": vc.field("counts").cast(pa.int64()),
        })

    totals = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("gram").aggregate(Sum("n", alias_name="n"))
    return totals.sort(["n", "gram"], descending=[True, False]).limit(k)


CHARSET_CLASSES = (
    # identical RE2 class strings run on both the Arrow and DuckDB side;
    # \xNN escapes avoid any quoting/metachar divergence between engines
    ("n_digit", r"[0-9]"),
    ("n_upper", r"[A-Z]"),
    ("n_punct", r"[\x21-\x2F\x3A-\x40\x5B-\x60\x7B-\x7E]"),
    ("n_nonascii", r"[^\x00-\x7F]"),
)


def charset_profile(ds, text_col: str, id_col: str):
    """Per-document character-class profile — the encoding-hygiene
    signal of a web-scale text pipeline (mojibake shows up as a
    non-ascii spike, scraped tables as a punct/digit spike).  One
    zero-copy pass; each class is a single vectorized RE2 count
    (``pc.count_substring_regex``), no per-row Python."""

    def kernel(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col)
        cols = {id_col: batch.column(id_col),
                "n_chars_total": pc.utf8_length(txt).cast(pa.int64())}
        for name, pat in CHARSET_CLASSES:
            cols[name] = pc.count_substring_regex(txt, pat).cast(pa.int64())
        return pa.table(cols)

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True)


def chunk_plan(ds, text_col: str, id_col: str, *, size: int = 64,
               overlap: int = 16):
    """RAG-style chunking PLAN: split each document's token stream into
    fixed-size windows with overlap — one row per chunk
    ``(id, chunk_id, tok_start, tok_end, n_tokens)`` where
    ``tok_start = chunk_id · (size − overlap)`` and windows keep
    starting while ``tok_start < n_doc_tokens`` (the last chunk may be
    short).  Token indices, not text, so the plan is cheap to ship and
    a SQL oracle reproduces it from token counts alone; the slice
    itself happens wherever the tokens already live.

    Fully vectorized: per-doc token counts -> per-doc chunk counts ->
    one ``np.repeat``/``arange`` expansion per batch."""
    step = size - overlap
    if step <= 0:
        raise ValueError("overlap must be smaller than size")

    def kernel(batch: pa.Table) -> pa.Table:
        _, offsets = tokens_and_offsets(batch.column(text_col))
        nt = _row_counts(offsets).astype(np.int64)
        n_chunks = np.maximum((nt + step - 1) // step, (nt > 0)
                              .astype(np.int64))
        # documents with 0 tokens emit no chunks
        reps = n_chunks
        doc_idx = np.repeat(np.arange(len(nt)), reps)
        local = np.concatenate([np.arange(c) for c in reps]) if len(
            reps) and reps.sum() else np.empty(0, dtype=np.int64)
        starts = local * step
        ends = np.minimum(starts + size, nt[doc_idx])
        ids = batch.column(id_col).take(pa.array(doc_idx))
        return pa.table({
            id_col: ids,
            "chunk_id": pa.array(local.astype(np.int64)),
            "tok_start": pa.array(starts.astype(np.int64)),
            "tok_end": pa.array(ends.astype(np.int64)),
            "n_tokens": pa.array((ends - starts).astype(np.int64)),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True)


def blocklist_scan(ds, text_col: str, id_col: str, *, terms):
    """Blocklist audit: per document, how many distinct blocklist TERMS
    appear among its whitespace tokens (exact token match, lowercase)
    and whether the document is flagged.  The filter step of a
    safety/compliance pass; the term list ships once per task via
    closure (broadcast-small-side pattern).  Output:
    (id, n_terms_hit, flagged)."""
    term_list = sorted({t.lower() for t in terms})

    def kernel(batch: pa.Table) -> pa.Table:
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        flat = pc.utf8_lower(flat)
        n = batch.num_rows
        hits = np.zeros(n, dtype=np.int64)
        for term in term_list:
            eq = pc.equal(flat, term)
            eq_np = np.asarray(pc.fill_null(eq, False).to_numpy(
                zero_copy_only=False), dtype=np.int64)
            cum = np.concatenate([[0], np.cumsum(eq_np)])
            per_row = cum[offsets[1:]] - cum[offsets[:-1]]
            hits += (per_row > 0).astype(np.int64)
        return pa.table({
            id_col: batch.column(id_col),
            "n_terms_hit": pa.array(hits),
            "flagged": pa.array(hits > 0),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True)


def dup_lines(ds, text_col: str, id_col: str, *, sep: str = ".",
              min_chars: int = 20, n_buckets: int = 256):
    """Corpus-level duplicated-LINE detection (the C4 / RefinedWeb
    line-dedup primitive): sentences appearing verbatim in more than
    one document are boilerplate (navigation chrome, license headers,
    templated intros) and get removed before LLM training.  Reports
    each normalized line found in >1 distinct document with its doc
    count.

    Plan: per-batch vectorized split on ``sep`` (flat child array +
    offsets — no Python over rows), normalize (trim/lower), filter
    short lines, LOCAL distinct (line, doc), then ONE shuffle on
    ``hash64(line) % n_buckets`` — the coarse-bucket discipline every
    dedup stage here uses — and a per-bucket segment kernel counting
    distinct docs per line.  Line text rides along for the report; the
    segment key is the 64-bit hash (collision odds ~n²/2⁶⁴,
    documented).  Output: (line, n_docs) for n_docs > 1.
    """
    from ..functions.aggregates import hash64

    def to_lines(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col)
        txt = txt.combine_chunks() if isinstance(txt, pa.ChunkedArray) \
            else txt
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        parts = pc.split_pattern(txt, sep)
        parts = parts.combine_chunks() if isinstance(
            parts, pa.ChunkedArray) else parts
        flat = pc.utf8_trim_whitespace(pc.utf8_lower(parts.flatten()))
        offsets = parts.offsets.to_numpy(zero_copy_only=False).astype(
            np.int64)
        parent = np.repeat(np.arange(len(offsets) - 1, dtype=np.int64),
                           np.diff(offsets))
        keep = pc.greater_equal(pc.utf8_length(flat),
                                min_chars).to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        doc = ids[parent[keep]]
        h = hash64(flat)
        # local distinct (line, doc)
        order = np.lexsort((doc, h))
        hs, ds_ = h[order], doc[order]
        new = np.ones(len(hs), dtype=bool)
        if len(hs) > 1:
            new[1:] = (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])
        first = np.flatnonzero(new)
        sel = order[first]
        return pa.table({
            "coarse": pa.array((h[sel] % np.uint64(n_buckets)).astype(
                np.int64)),
            "h": pa.array(h[sel].view(np.int64)),
            "doc": pa.array(doc[sel]),
            "line": flat.take(pa.array(sel)),
        })

    def bucket_count(group: pa.Table) -> pa.Table:
        h = group.column("h").to_numpy(zero_copy_only=False)
        doc = group.column("doc").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, h))
        hs, ds_ = h[order], doc[order]
        new = np.ones(len(hs), dtype=bool)
        if len(hs) > 1:
            new[1:] = (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])
        first = np.flatnonzero(new)
        hs = hs[first]
        newh = np.ones(len(hs), dtype=bool)
        if len(hs) > 1:
            newh[1:] = hs[1:] != hs[:-1]
        seg = np.cumsum(newh) - 1
        n_docs = np.bincount(seg).astype(np.int64)
        line_first = group.column("line").take(
            pa.array(order[first][np.flatnonzero(newh)]))
        ok = n_docs > 1
        return pa.table({
            "line": line_first.filter(pa.array(ok)),
            "n_docs": pa.array(n_docs[ok]),
        })

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(to_lines, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("coarse")
        .map_groups(bucket_count, batch_format="pyarrow")
        .select_columns(["line", "n_docs"])
    )


def _shingle_doc_rows(ds, text_col: str, cols: Sequence[str], *,
                      n: int = 3, n_buckets: int = 256):
    """Explode docs into (coarse, sh, *cols) rows — one row per DISTINCT
    per-doc n-token shingle hash, with the doc's ``cols`` values
    repeated.  ``coarse = sh % n_buckets`` so a shingle's every
    occurrence lands in ONE bucket (corpus-wide per-shingle statistics
    are complete inside a bucket group)."""

    def kernel(batch: pa.Table) -> pa.Table:
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        sh, sh_off = shingle_hash_sets(flat, offsets, n=n)
        counts = np.diff(sh_off)
        out = {
            "coarse": pa.array((sh % np.uint64(n_buckets)).astype(np.int64)),
            "sh": pa.array(sh.view(np.int64)),
        }
        take = pa.array(np.repeat(
            np.arange(batch.num_rows, dtype=np.int64), counts))
        for c in cols:
            col = batch.column(c)
            col = col.combine_chunks() if isinstance(
                col, pa.ChunkedArray) else col
            out[c] = col.take(take)
        return pa.table(out)

    return ds.select_columns(
        list(dict.fromkeys([text_col, *cols]))
    ).map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)


def ngram_novelty(ds, text_col: str, id_col: str, *, n: int = 3,
                  n_buckets: int = 256):
    """Per-document novelty: (id, novel, n_grams) where ``novel``
    counts the doc's distinct n-gram shingles that appear in NO other
    document (corpus document frequency 1) and ``n_grams`` its distinct
    shingle count — the inverse-boilerplate score used to up-weight
    original content in a training mix.

    Plan: one shuffle on the bounded shingle-hash bucket key (a
    shingle's full corpus df is computable inside its bucket), a
    vectorized per-bucket segment kernel emitting per-doc partials,
    then a ``groupby(id).sum``.  Shingle identity is the 64-bit rolling
    hash (collision odds ~1e-11 at corpus scale; no shingle strings are
    ever materialized or shuffled)."""
    from ray.data.aggregate import Sum

    rows = _shingle_doc_rows(ds, text_col, [id_col], n=n,
                             n_buckets=n_buckets)

    def per_bucket(t: pa.Table) -> pa.Table:
        sh = t.column("sh").to_numpy(zero_copy_only=False)
        docs = t.column(id_col).to_numpy(zero_copy_only=False)
        if len(sh) == 0:
            e = pa.array([], pa.int64())
            return pa.table({id_col: t.column(id_col),
                             "novel": e, "n_grams": e})
        order = np.argsort(sh, kind="stable")
        sh_s, docs_s = sh[order], docs[order]
        new = np.ones(len(sh_s), dtype=bool)
        new[1:] = sh_s[1:] != sh_s[:-1]
        seg = np.cumsum(new) - 1
        df = np.bincount(seg)[seg]
        uniq, code = np.unique(docs_s, return_inverse=True)
        novel = np.bincount(code, weights=(df == 1)).astype(np.int64)
        total = np.bincount(code).astype(np.int64)
        return pa.table({
            id_col: pa.array(uniq),
            "novel": pa.array(novel),
            "n_grams": pa.array(total),
        })

    return rows.groupby("coarse").map_groups(
        per_bucket, batch_format="pyarrow"
    ).groupby(id_col).aggregate(
        Sum("novel", alias_name="novel"),
        Sum("n_grams", alias_name="n_grams"))


def ngram_diversity(ds, text_col: str, *, group_col: str, n: int = 3,
                    n_buckets: int = 256):
    """Per-group n-gram diversity: (group, n_distinct, n_docgrams)
    where ``n_distinct`` is the group's corpus-wide distinct shingle
    count and ``n_docgrams`` the sum of per-doc distinct counts — the
    distinct-n diversity metric (low ratio = repetitive/boilerplate
    subcorpus).  Same bucketed plan as :func:`ngram_novelty`: distinct
    (group, shingle) pairs are complete inside a shingle-hash bucket."""
    from ray.data.aggregate import Sum

    rows = _shingle_doc_rows(ds, text_col, [group_col], n=n,
                             n_buckets=n_buckets)

    def per_bucket(t: pa.Table) -> pa.Table:
        sh = t.column("sh").to_numpy(zero_copy_only=False)
        grp = t.column(group_col).to_numpy(zero_copy_only=False)
        if len(sh) == 0:
            e = pa.array([], pa.int64())
            return pa.table({group_col: t.column(group_col),
                             "n_distinct": e, "n_docgrams": e})
        uniq, code = np.unique(grp, return_inverse=True)
        total = np.bincount(code, minlength=len(uniq)).astype(np.int64)
        # distinct (group, sh) pairs per group
        order = np.lexsort((sh, code))
        cs, ss = code[order], sh[order]
        new = np.ones(len(ss), dtype=bool)
        new[1:] = (cs[1:] != cs[:-1]) | (ss[1:] != ss[:-1])
        nd = np.bincount(cs[new], minlength=len(uniq)).astype(np.int64)
        return pa.table({
            group_col: pa.array(uniq),
            "n_distinct": pa.array(nd),
            "n_docgrams": pa.array(total),
        })

    return rows.groupby("coarse").map_groups(
        per_bucket, batch_format="pyarrow"
    ).groupby(group_col).aggregate(
        Sum("n_distinct", alias_name="n_distinct"),
        Sum("n_docgrams", alias_name="n_docgrams"))


def bpe_train(ds, text_col: str, *, n_merges: int = 8,
              min_pair_count: int = 2):
    """Distributed byte-pair-encoding trainer (Sennrich-style): learn
    ``n_merges`` merges over the corpus' WORD-FREQUENCY table — the
    tokenizer-training step of an LLM data pipeline.

    Plan (each round is bounded by the VOCAB, never the corpus):

    1. one corpus pass → (word, count) via groupby (the only
       row-scale shuffle);
    2. per round: vectorized adjacent-symbol pair counts over the
       vocab Dataset (flat split + offset mask, weighted by word
       count) → one tiny groupby(pair) → best pair by
       (count DESC, pair ASC — a deterministic tie-break) →
       re-segment via a single non-overlapping left-to-right
       ``replace_substring`` (exactly the greedy-left merge BPE
       applies) and materialize the next vocab state.

    Stops early when the best pair's count drops below
    ``min_pair_count``.  Output: one row per learned merge
    (merge_rank, left, right, pair_count) — rows-only vs SQL by
    design (iterative re-segmentation is not expressible in one
    query); parity is pinned against a brute-force reference in
    tests.
    """
    from ray.data.aggregate import Sum

    SEP = "\x1f"

    def word_counts(t: pa.Table) -> pa.Table:
        flat, offsets = tokens_and_offsets(t.column(text_col))
        w = flat.to_numpy(zero_copy_only=False)
        u, c = np.unique(w, return_counts=True)
        return pa.table({"w": pa.array(u),
                         "c": pa.array(c.astype(np.int64))})

    vocab = (ds.select_columns([text_col])
             .map_batches(word_counts, batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby("w").aggregate(Sum("c", alias_name="c")))

    def to_seq(t: pa.Table) -> pa.Table:
        w = t.column("w").to_pylist()
        return pa.table({
            "seq": pa.array([SEP.join(x) for x in w]),
            "c": t.column("c"),
        })

    state = vocab.map_batches(to_seq, batch_format="pyarrow").materialize()

    def pair_partial(t: pa.Table) -> pa.Table:
        seqs = t.column("seq")
        seqs = (seqs.combine_chunks()
                if isinstance(seqs, pa.ChunkedArray) else seqs)
        parts = pc.split_pattern(seqs, pattern=SEP)
        parts = (parts.combine_chunks()
                 if isinstance(parts, pa.ChunkedArray) else parts)
        flat = parts.flatten()
        offsets = parts.offsets.to_numpy(zero_copy_only=False).astype(
            np.int64)
        n_rows = len(offsets) - 1
        cnt = t.column("c").to_numpy(zero_copy_only=False).astype(
            np.int64)
        row = np.repeat(np.arange(n_rows, dtype=np.int64),
                        np.diff(offsets))
        if len(row) < 2:
            return pa.table({"pair": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        same = row[1:] == row[:-1]
        fl = flat.to_numpy(zero_copy_only=False)
        left = fl[:-1][same]
        right = fl[1:][same]
        w = cnt[row[:-1][same]]
        pairs = np.char.add(np.char.add(
            left.astype(str), SEP), right.astype(str))
        u, inv = np.unique(pairs, return_inverse=True)
        return pa.table({
            "pair": pa.array(u),
            "n": pa.array(np.bincount(
                inv, weights=w).astype(np.int64)),
        })

    merges = []
    for rank in range(n_merges):
        best = (state.map_batches(pair_partial, batch_format="pyarrow",
                                  zero_copy_batch=True)
                .groupby("pair").aggregate(Sum("n", alias_name="n"))
                .sort(["n", "pair"], descending=[True, False])
                .limit(1).take_all())
        if not best or int(best[0]["n"]) < min_pair_count:
            break
        pair = best[0]["pair"]
        left, right = pair.split(SEP)
        merges.append((rank + 1, left, right, int(best[0]["n"])))

        def apply_merge(t: pa.Table, pat=pair,
                        rep=left + right) -> pa.Table:
            return pa.table({
                "seq": pc.replace_substring(t.column("seq"),
                                            pattern=pat,
                                            replacement=rep),
                "c": t.column("c"),
            })

        state = state.map_batches(apply_merge,
                                  batch_format="pyarrow").materialize()

    return pa.table({
        "merge_rank": pa.array([m[0] for m in merges], pa.int64()),
        "left": pa.array([m[1] for m in merges], pa.string()),
        "right": pa.array([m[2] for m in merges], pa.string()),
        "pair_count": pa.array([m[3] for m in merges], pa.int64()),
    })


def readability_by_lang(ds, *, text_col: str, lang_col: str):
    """Flesch-style readability profile per language bucket.

    Per document (docs with ≥1 word):

        words     = non-overlapping ``\\S+`` matches
        sentences = max(1, runs of ``[.!?]+``)
        syllables = runs of ``[aeiouyAEIOUY]+``  (vowel-group heuristic)
        flesch    = 206.835 − 1.015·words/sentences − 84.6·syllables/words

    — the corpus-quality screen for "is this slice written like prose
    or like a parts catalog".  All three counts are Arrow RE2 kernels
    (count_substring_regex), so the semantics mirror DuckDB's
    regexp_extract_all 1:1 (SQL_READABILITY_DOCS).  Per-batch partials
    (lang → n, Σwords, Σsentences, Σsyllables, Σflesch); one groupby.
    Output (lang, n_docs, words_per_sent, syll_per_word, flesch) with
    the ratio-of-means for the per-word/per-sentence rates and the
    mean per-doc flesch, 6-dp rounded.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        text = t.column(text_col)
        lang = t.column(lang_col)
        words = pc.cast(pc.count_substring_regex(text, pattern=r"\S+"),
                        pa.int64()).to_numpy(zero_copy_only=False)
        sents = pc.cast(pc.count_substring_regex(text, pattern=r"[.!?]+"),
                        pa.int64()).to_numpy(zero_copy_only=False)
        syll = pc.cast(
            pc.count_substring_regex(text, pattern=r"[aeiouyAEIOUY]+"),
            pa.int64()).to_numpy(zero_copy_only=False)
        ok = (words > 0) & pc.is_valid(lang).to_numpy(zero_copy_only=False)
        words, syll = words[ok], syll[ok]
        sents = np.maximum(sents[ok], 1)
        flesch = (206.835 - 1.015 * words / sents - 84.6 * syll / words)
        gv = lang.to_numpy(zero_copy_only=False)[ok]
        u, inv = np.unique(gv, return_inverse=True)
        return pa.table({
            lang_col: pa.array(u),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "sw": pa.array(np.bincount(inv, weights=words).astype(np.int64)),
            "ss": pa.array(np.bincount(inv, weights=sents).astype(np.int64)),
            "sy": pa.array(np.bincount(inv, weights=syll).astype(np.int64)),
            "sf": pa.array(np.bincount(inv, weights=flesch)),
        })

    agg = (ds.select_columns([lang_col, text_col])
           .map_batches(partial, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby(lang_col)
           .aggregate(Sum("n", alias_name="n"), Sum("sw", alias_name="sw"),
                      Sum("ss", alias_name="ss"), Sum("sy", alias_name="sy"),
                      Sum("sf", alias_name="sf")))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([(lang_col, pa.string()),
                            ("n_docs", pa.int64()),
                            ("words_per_sent", pa.float64()),
                            ("syll_per_word", pa.float64()),
                            ("flesch", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        sw = t.column("sw").to_numpy(zero_copy_only=False).astype(np.float64)
        ss = t.column("ss").to_numpy(zero_copy_only=False).astype(np.float64)
        sy = t.column("sy").to_numpy(zero_copy_only=False).astype(np.float64)
        sf = t.column("sf").to_numpy(zero_copy_only=False)
        return pa.table({
            lang_col: t.column(lang_col),
            "n_docs": pc.cast(t.column("n"), pa.int64()),
            "words_per_sent": pa.array(
                [_r6(x) for x in sw / ss], pa.float64()),
            "syll_per_word": pa.array(
                [_r6(x) for x in sy / sw], pa.float64()),
            "flesch": pa.array(np.round(sf / n, 6), pa.float64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def collocations_pmi(ds, text_col: str, *, min_count: int = 5,
                     k: int = 20):
    """Collocation mining: top-k adjacent token pairs by pointwise
    mutual information,

        PMI(w1, w2) = ln( (B·Nu·Nu) / (Nb·U1·U2) )

    with B the bigram count, U the unigram counts, Nu/Nb the corpus
    totals — the "fixed phrase" detector (raw bigram frequency top-k
    surfaces 'of the'; PMI surfaces 'los angeles').  ``min_count``
    guards the low-frequency PMI explosion.

    Plan: the :func:`bigram_topk` / :func:`vocab_topk` combiner
    discipline builds both count tables (shuffle payload bounded by
    vocabulary); the two tables materialize once (vocab-bounded) so
    the scalar totals don't re-scan the corpus; unigram counts attach
    to the (min_count-filtered, small) bigram side via two bucketed
    :func:`~datatest_ray.stages.relational.lookup_join` passes; PMI is
    rounded to 6dp BEFORE the (pmi, w1, w2) top-k so tie order is
    engine-independent.  Output (w1, w2, n, pmi).
    """
    from ray.data.aggregate import Sum

    from .relational import lookup_join

    def bigram_partial(batch: pa.Table) -> pa.Table:
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        empty = pa.table({"w1": pa.array([], pa.string()),
                          "w2": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if len(flat) < 2:
            return empty
        parents = np.repeat(np.arange(len(offsets) - 1, dtype=np.int64),
                            _row_counts(offsets))
        enc = pc.dictionary_encode(flat)
        code = np.asarray(enc.indices, dtype=np.int64)
        same = parents[1:] == parents[:-1]
        if not same.any():
            return empty
        V = len(enc.dictionary)
        pair = code[:-1][same] * V + code[1:][same]
        cnt = np.bincount(pair)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "w1": pc.take(enc.dictionary, pa.array(nz // V, pa.int64())),
            "w2": pc.take(enc.dictionary, pa.array(nz % V, pa.int64())),
            "n": pa.array(cnt[nz], pa.int64()),
        })

    def unigram_partial(batch: pa.Table) -> pa.Table:
        flat, _ = tokens_and_offsets(batch.column(text_col))
        enc = pc.dictionary_encode(flat)
        cnt = np.bincount(np.asarray(enc.indices, dtype=np.int64),
                          minlength=len(enc.dictionary))
        return pa.table({
            "w": enc.dictionary,
            "u": pa.array(cnt.astype(np.int64)),
        })

    text_only = ds.select_columns([text_col])
    bigrams = (text_only.map_batches(bigram_partial,
                                     batch_format="pyarrow",
                                     zero_copy_batch=True)
               .groupby(["w1", "w2"]).aggregate(Sum("n", alias_name="n"))
               .materialize())
    unigrams = (text_only.map_batches(unigram_partial,
                                      batch_format="pyarrow",
                                      zero_copy_batch=True)
                .groupby("w").aggregate(Sum("u", alias_name="u"))
                .materialize())
    n_uni = float(unigrams.sum("u") or 0)
    n_bi = float(bigrams.sum("n") or 0)
    if n_uni == 0 or n_bi == 0:
        return pa.schema([("w1", pa.string()), ("w2", pa.string()),
                          ("n", pa.int64()),
                          ("pmi", pa.float64())]).empty_table()

    frequent = bigrams.filter(expr=f"n >= {int(min_count)}")
    j1 = lookup_join(frequent, unigrams, on="w1", right_on="w",
                     right_cols=["u"]).map_batches(
        lambda t: t.rename_columns(
            [{"u": "u1"}.get(c, c) for c in t.column_names]),
        batch_format="pyarrow", zero_copy_batch=True)
    j2 = lookup_join(j1, unigrams, on="w2", right_on="w",
                     right_cols=["u"])

    def score(t: pa.Table) -> pa.Table:
        b = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        u1 = t.column("u1").to_numpy(zero_copy_only=False).astype(
            np.float64)
        u2 = t.column("u").to_numpy(zero_copy_only=False).astype(
            np.float64)
        pmi = np.log((b * n_uni * n_uni) / (n_bi * u1 * u2))
        return pa.table({
            "w1": t.column("w1"), "w2": t.column("w2"),
            "n": pc.cast(t.column("n"), pa.int64()),
            "pmi": pa.array(np.round(pmi, 6), pa.float64()),
        })

    return (j2.map_batches(score, batch_format="pyarrow",
                           zero_copy_batch=True)
            .sort(["pmi", "w1", "w2"], descending=[True, False, False])
            .limit(k))


def lang_confusion(ds, text_col: str, *, lang_col: str):
    """Declared-vs-predicted language confusion matrix: run the
    :func:`lang_id` scorer and count (declared, predicted) pairs — the
    metadata-trust audit ("the `lang` column says 'de'; does the text
    agree?").  Off-diagonal mass localizes either bad metadata or a
    scorer blind spot; both are per-slice data-quality findings.

    Plan: one pass scoring per batch (same kernel as lang_id), the
    pair counts pre-reduce per batch (combiner), ONE tiny groupby over
    the (languages × languages)-bounded key space.  Output
    (lang, lang_pred, n).
    """
    from ray.data.aggregate import Sum

    def kernel(batch: pa.Table) -> pa.Table:
        ok = pc.is_valid(batch.column(lang_col))
        batch = batch.filter(ok)
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        n_rows = batch.num_rows
        scores = np.zeros((n_rows, len(LANG_ORDER)), dtype=np.int64)
        for j, lang in enumerate(LANG_ORDER):
            scores[:, j] = _per_row_hits(flat, offsets, STOPWORDS[lang])
        best = np.argmax(scores, axis=1)
        pred = np.asarray(LANG_ORDER, dtype=object)[best]
        pred[scores.sum(axis=1) == 0] = "unknown"
        decl = batch.column(lang_col)
        decl = (decl.combine_chunks()
                if isinstance(decl, pa.ChunkedArray) else decl)
        enc_d = pc.dictionary_encode(decl)
        dc = np.asarray(enc_d.indices, dtype=np.int64)
        enc_p = pc.dictionary_encode(pa.array(pred))
        pcs = np.asarray(enc_p.indices, dtype=np.int64)
        k = max(len(enc_p.dictionary), 1)
        flat_code = dc * k + pcs
        cnt = np.bincount(flat_code)
        nz = np.flatnonzero(cnt)
        return pa.table({
            lang_col: pc.take(enc_d.dictionary,
                              pa.array(nz // k, pa.int64())),
            "lang_pred": pc.take(enc_p.dictionary,
                                 pa.array(nz % k, pa.int64())),
            "n": pa.array(cnt[nz], pa.int64()),
        })

    return (ds.select_columns([lang_col, text_col])
            .map_batches(kernel, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby([lang_col, "lang_pred"])
            .aggregate(Sum("n", alias_name="n")))


def vocab_richness(ds, text_col: str, *, lang_col: str):
    """Vocabulary-richness profile per language from the word frequency
    spectrum: Yule's K = 10^4 (sum m^2 - N)/N^2 (repeat-rate constant,
    higher = poorer vocabulary), Simpson's D = (sum m^2 - N)/(N(N-1))
    (probability two random token occurrences are the same word), and
    Honore's H = 100 ln N / (1 - V1/V) (hapax-legomena richness; NULL
    when every word is a hapax) -- the classic authorship/quality
    screens for a text corpus, all exact up to one final float per
    statistic.

    Plan: per-batch (lang, token, n) partial counts -> one word-level
    groupby -> per-batch per-lang spectrum partials (sum m, sum m^2,
    V, V1) -> tiny groupby(lang) -> finalize.  Shuffle payload is
    O(distinct words), never O(tokens).
    """
    from ray.data.aggregate import Sum

    def word_partials(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column(lang_col)))
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        counts = _row_counts(offsets)
        n_rows = len(counts)
        langs = batch.column(lang_col)
        parents = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
        lang_flat = langs.take(pa.array(parents))
        t = pa.table({"lang": lang_flat, "token": flat})
        return t.group_by(["lang", "token"]).aggregate(
            [("token", "count")]).rename_columns(["lang", "token", "n"])

    wc = (
        ds.select_columns([text_col, lang_col])
        .map_batches(word_partials, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby(["lang", "token"]).aggregate(Sum("n", alias_name="m"))
    )

    def spectrum_partials(t: pa.Table) -> pa.Table:
        m = t.column("m").to_numpy(zero_copy_only=False).astype(np.int64)
        g = pa.table({
            "lang": t.column("lang"),
            "n": pa.array(m),
            "m2": pa.array(m * m),
            "v": pa.array(np.ones(len(m), dtype=np.int64)),
            "v1": pa.array((m == 1).astype(np.int64)),
        })
        return g.group_by("lang").aggregate(
            [("n", "sum"), ("m2", "sum"), ("v", "sum"), ("v1", "sum")]
        ).rename_columns(["lang", "n", "m2", "v", "v1"])

    agg = wc.map_batches(
        spectrum_partials, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("lang").aggregate(
        Sum("n", alias_name="n"), Sum("m2", alias_name="m2"),
        Sum("v", alias_name="v"), Sum("v1", alias_name="v1"))

    def finalize(t: pa.Table) -> pa.Table:
        import math

        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        m2 = t.column("m2").to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        v1 = t.column("v1").to_numpy(zero_copy_only=False).astype(np.int64)
        yk = [round(10000.0 * (b - a) / (float(a) * a), 6)
              if a > 0 else None for a, b in zip(n, m2)]
        sd = [round(float(b - a) / (float(a) * (a - 1)), 6)
              if a > 1 else None for a, b in zip(n, m2)]
        hh = [round(100.0 * math.log(a) / (1.0 - float(d) / c), 6)
              if a > 0 and c > 0 and d < c else None
              for a, c, d in zip(n, v, v1)]
        return pa.table({
            "lang": t.column("lang"),
            "n_tokens": pa.array(n),
            "vocab": pa.array(v),
            "yules_k": pa.array(yk, pa.float64()),
            "simpson_d": pa.array(sd, pa.float64()),
            "honore_h": pa.array(hh, pa.float64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow",
                           zero_copy_batch=True)


def heaps_law(ds, text_col: str, *, lang_col: str):
    """Heaps'-law fit per language: OLS of ln(distinct types per doc)
    on ln(tokens per doc) across documents -- V ~= k N^beta.  beta well
    below 1 is the healthy sublinear vocabulary growth of natural text;
    beta ~= 1 flags template/random corpora, and k shifts flag
    tokenizer or language drift.

    Per-batch vectorized per-doc (N, V) (dictionary-encode + lexsort
    dedup, no Python over rows) folded straight into per-lang OLS
    partial sums -- the only shuffle moves 5 floats per (lang, block).

    Output: (lang, n_docs, beta round-6, k round-6); NULL fit when
    under 2 docs or zero variance in ln N.
    """
    from ray.data.aggregate import Count, Sum

    def partials(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column(lang_col)))
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        counts = _row_counts(offsets)
        n_rows = len(counts)
        if len(flat) == 0:
            distinct = np.zeros(n_rows, dtype=np.int64)
        else:
            enc = pc.dictionary_encode(flat)
            codes = np.asarray(enc.indices, dtype=np.int64)
            parents = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
            order = np.lexsort((codes, parents))
            ps, cs = parents[order], codes[order]
            keep = np.ones(len(cs), dtype=bool)
            keep[1:] = (ps[1:] != ps[:-1]) | (cs[1:] != cs[:-1])
            distinct = np.bincount(ps[keep], minlength=n_rows).astype(
                np.int64)
        ok = counts > 0
        x = np.log(counts[ok].astype(np.float64))
        y = np.log(distinct[ok].astype(np.float64))
        langs = batch.column(lang_col).take(
            pa.array(np.flatnonzero(ok)))
        return pa.table({
            "lang": langs,
            "sx": pa.array(x), "sy": pa.array(y),
            "sxx": pa.array(x * x), "sxy": pa.array(x * y),
        })

    agg = (
        ds.select_columns([text_col, lang_col])
        .map_batches(partials, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("lang").aggregate(
            Count(alias_name="n_docs"),
            Sum("sx", alias_name="sx"), Sum("sy", alias_name="sy"),
            Sum("sxx", alias_name="sxx"), Sum("sxy", alias_name="sxy"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        import math

        n = t.column("n_docs").to_numpy(zero_copy_only=False)
        sx = t.column("sx").to_numpy(zero_copy_only=False)
        sy = t.column("sy").to_numpy(zero_copy_only=False)
        sxx = t.column("sxx").to_numpy(zero_copy_only=False)
        sxy = t.column("sxy").to_numpy(zero_copy_only=False)
        betas, ks = [], []
        for i in range(len(n)):
            den = n[i] * sxx[i] - sx[i] * sx[i]
            if n[i] < 2 or den == 0:
                betas.append(None)
                ks.append(None)
                continue
            b = (n[i] * sxy[i] - sx[i] * sy[i]) / den
            betas.append(round(b, 6))
            ks.append(round(math.exp(sy[i] / n[i] - b * sx[i] / n[i]), 6))
        return pa.table({
            "lang": t.column("lang"),
            "n_docs": pa.array(n.astype(np.int64)),
            "beta": pa.array(betas, pa.float64()),
            "k": pa.array(ks, pa.float64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow",
                           zero_copy_batch=True)


def dsir_profile(ds, text_col: str, *, lang_col: str, target_lang: str):
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): per-document mean
    log-likelihood ratio between a TARGET unigram LM (docs of
    ``target_lang``) and the corpus LM, both add-1 smoothed -- the
    score used to up-sample target-domain-looking data.  This reports
    the per-language profile (n_docs, mean/sd of the doc scores):
    target-language docs must score high and the gap IS the signal
    available to a resampler.

    Two passes: one word-count groupby builds both LMs (the vocabulary
    is broadcast via ``ray.put`` -- hash features replace the exact
    vocab when it is unbounded), then a vectorized per-doc scoring
    pass feeds per-lang moment partials.  Output: (lang, n_docs,
    mean_score round-6, sd_score round-6).
    """
    import ray
    from ray.data.aggregate import Count, Sum

    def word_partials(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column(lang_col)))
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        counts = _row_counts(offsets)
        n_rows = len(counts)
        parents = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
        is_t = pc.cast(pc.equal(batch.column(lang_col), target_lang),
                       pa.int64())
        t_flat = is_t.take(pa.array(parents))
        t = pa.table({"w": flat, "t": t_flat})
        return t.group_by("w").aggregate(
            [("t", "count"), ("t", "sum")]
        ).rename_columns(["w", "n_all", "n_t"])

    vocab = (
        ds.select_columns([text_col, lang_col])
        .map_batches(word_partials, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("w").aggregate(Sum("n_all", alias_name="n_all"),
                                Sum("n_t", alias_name="n_t"))
    ).take_all()
    if not vocab:
        return ray.data.from_arrow(pa.schema(
            [("lang", pa.string()), ("n_docs", pa.int64()),
             ("mean_score", pa.float64()),
             ("sd_score", pa.float64())]).empty_table())
    words = sorted(r["w"] for r in vocab)
    by_w = {r["w"]: r for r in vocab}
    n_all = np.array([by_w[w]["n_all"] for w in words], dtype=np.int64)
    n_t = np.array([by_w[w]["n_t"] for w in words], dtype=np.int64)
    v = len(words)
    na, nt = int(n_all.sum()), int(n_t.sum())
    lr = (np.log((n_t + 1) / float(nt + v))
          - np.log((n_all + 1) / float(na + v)))
    words_arr = pa.array(words)
    lr_ref = ray.put((words_arr, lr))

    def score_docs(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column(lang_col)))
        warr, lrv = ray.get(lr_ref)
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        counts = _row_counts(offsets)
        n_rows = len(counts)
        idx = pc.index_in(flat, value_set=warr).to_numpy(
            zero_copy_only=False)
        parents = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
        ssum = np.bincount(parents, weights=lrv[idx],
                           minlength=n_rows)
        ok = counts > 0
        score = ssum[ok] / counts[ok]
        langs = batch.column(lang_col).take(
            pa.array(np.flatnonzero(ok)))
        return pa.table({
            "lang": langs,
            "one": pa.array(np.ones(int(ok.sum()), dtype=np.int64)),
            "s": pa.array(score),
            "s2": pa.array(score * score),
        })

    agg = (
        ds.select_columns([text_col, lang_col])
        .map_batches(score_docs, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("lang").aggregate(
            Count(alias_name="n_docs"),
            Sum("s", alias_name="s"), Sum("s2", alias_name="s2"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t.column("n_docs").to_numpy(zero_copy_only=False)
        s = t.column("s").to_numpy(zero_copy_only=False)
        s2 = t.column("s2").to_numpy(zero_copy_only=False)
        mean = [round(a / c, 6) if c else None for a, c in zip(s, n)]
        sd = [round(float(np.sqrt(max(b / c - (a / c) ** 2, 0.0))), 6)
              if c else None for a, b, c in zip(s, s2, n)]
        return pa.table({
            "lang": t.column("lang"),
            "n_docs": pa.array(n.astype(np.int64)),
            "mean_score": pa.array(mean, pa.float64()),
            "sd_score": pa.array(sd, pa.float64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow",
                           zero_copy_batch=True)


def species_richness(ds, text_col: str, *, lang_col: str):
    """Unseen-vocabulary estimators per language from the word
    frequency spectrum: Chao1 richness (V + V1^2 / (2 V2) -- how many
    word types the corpus has NOT yet seen), the Good-Turing unseen
    probability mass (V1/N -- the chance the next token is a new
    type), and the Hill number exp(H) (effective vocabulary size under
    Shannon weighting).  Together they answer "has this crawl
    saturated its domain" before anyone trains on it.

    Same O(distinct words) plan as :func:`vocab_richness` (shared
    spectrum partials).  Output: (lang, n_tokens, vocab, v1, v2,
    chao1 round-6, gt_p0 round-6, hill_1 round-6).
    """
    from ray.data.aggregate import Sum

    def word_partials(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column(lang_col)))
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        counts = _row_counts(offsets)
        parents = np.repeat(np.arange(len(counts), dtype=np.int64),
                            counts)
        lang_flat = batch.column(lang_col).take(pa.array(parents))
        t = pa.table({"lang": lang_flat, "token": flat})
        return t.group_by(["lang", "token"]).aggregate(
            [("token", "count")]).rename_columns(
                ["lang", "token", "n"])

    wc = (
        ds.select_columns([text_col, lang_col])
        .map_batches(word_partials, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby(["lang", "token"]).aggregate(Sum("n", alias_name="m"))
    )

    def spectrum(t: pa.Table) -> pa.Table:
        m = t.column("m").to_numpy(zero_copy_only=False).astype(
            np.int64)
        g = pa.table({
            "lang": t.column("lang"),
            "n": pa.array(m),
            "v": pa.array(np.ones(len(m), dtype=np.int64)),
            "v1": pa.array((m == 1).astype(np.int64)),
            "v2": pa.array((m == 2).astype(np.int64)),
            "mlnm": pa.array(m * np.log(m)),
        })
        return g.group_by("lang").aggregate(
            [("n", "sum"), ("v", "sum"), ("v1", "sum"), ("v2", "sum"),
             ("mlnm", "sum")]
        ).rename_columns(["lang", "n", "v", "v1", "v2", "mlnm"])

    agg = wc.map_batches(
        spectrum, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("lang").aggregate(
        Sum("n", alias_name="n"), Sum("v", alias_name="v"),
        Sum("v1", alias_name="v1"), Sum("v2", alias_name="v2"),
        Sum("mlnm", alias_name="mlnm"))

    def finalize(t: pa.Table) -> pa.Table:
        import math

        n = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.int64)
        v = t.column("v").to_numpy(zero_copy_only=False).astype(
            np.int64)
        v1 = t.column("v1").to_numpy(zero_copy_only=False).astype(
            np.int64)
        v2 = t.column("v2").to_numpy(zero_copy_only=False).astype(
            np.int64)
        mlnm = t.column("mlnm").to_numpy(zero_copy_only=False)
        chao, gt, hill = [], [], []
        for ni, vi, v1i, v2i, si in zip(n, v, v1, v2, mlnm):
            chao.append(round(vi + v1i * v1i / (2.0 * v2i), 6)
                        if v2i > 0 else None)
            gt.append(round(v1i / float(ni), 6) if ni > 0 else None)
            # H = ln N - (1/N) sum m ln m; hill_1 = exp(H)
            hill.append(round(math.exp(math.log(ni) - si / ni), 6)
                        if ni > 0 else None)
        return pa.table({
            "lang": t.column("lang"),
            "n_tokens": pa.array(n),
            "vocab": pa.array(v),
            "v1": pa.array(v1),
            "v2": pa.array(v2),
            "chao1": pa.array(chao, pa.float64()),
            "gt_p0": pa.array(gt, pa.float64()),
            "hill_1": pa.array(hill, pa.float64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow",
                           zero_copy_batch=True)


def word_burstiness(ds, text_col: str, *, id_col: str, k: int = 10):
    """Per-word burstiness over the top-k corpus words (by total
    occurrences, alphabetical tie-break): the variance-to-mean ratio
    of the word's PER-DOCUMENT count across ALL documents (zeros
    included).  VMR ~ 1 is Poisson scatter (function words); VMR >> 1
    marks topical/bursty words -- the Church-Gale dispersion signal
    that separates content words from glue, and a drift alarm when a
    "function" word suddenly goes bursty.

    One (word, doc) count shuffle restricted to the top-k vocabulary
    (found from a first O(distinct words) pass).  Exact integer sums;
    D includes empty documents.  Output: (token, cf int64, df int64,
    vmr round-6).
    """
    from ray.data.aggregate import Count, Sum

    n_docs = ds.select_columns([id_col]).count()

    def word_partials(batch: pa.Table) -> pa.Table:
        flat, _ = tokens_and_offsets(batch.column(text_col))
        t = pa.table({"token": flat})
        return t.group_by("token").aggregate(
            [("token", "count")]).rename_columns(["token", "n"])

    top = (
        ds.select_columns([text_col])
        .map_batches(word_partials, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("token").aggregate(Sum("n", alias_name="cf"))
    ).take_all()
    top.sort(key=lambda r: (-r["cf"], r["token"]))
    vocab = [r["token"] for r in top[:k]]
    vocab_arr = pa.array(sorted(vocab))

    def doc_counts(batch: pa.Table) -> pa.Table:
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        counts = _row_counts(offsets)
        n_rows = len(counts)
        sel = pc.is_in(flat, value_set=vocab_arr).to_numpy(
            zero_copy_only=False)
        parents = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
        code = pc.index_in(flat, value_set=vocab_arr).to_numpy(
            zero_copy_only=False)
        psel, csel = parents[sel], code[sel]
        key = psel * len(vocab) + csel
        uk, cnt = np.unique(key, return_counts=True)
        tok = pc.take(vocab_arr, pa.array(uk % len(vocab), pa.int64()))
        c = cnt.astype(np.int64)
        return pa.table({
            "token": tok,
            "one": pa.array(np.ones(len(uk), dtype=np.int64)),
            "c": pa.array(c),
            "c2": pa.array(c * c),
        })

    agg = (
        ds.select_columns([text_col, id_col])
        .map_batches(doc_counts, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("token").aggregate(
            Sum("one", alias_name="df"), Sum("c", alias_name="cf"),
            Sum("c2", alias_name="c2"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        df = t.column("df").to_numpy(zero_copy_only=False).astype(
            np.int64)
        cf = t.column("cf").to_numpy(zero_copy_only=False).astype(
            np.int64)
        c2 = t.column("c2").to_numpy(zero_copy_only=False).astype(
            np.int64)
        d = float(n_docs)
        vmr = []
        for cfi, c2i in zip(cf, c2):
            mean = cfi / d
            var = c2i / d - mean * mean
            vmr.append(round(var / mean, 6) if mean > 0 else None)
        return pa.table({
            "token": t.column("token"),
            "cf": pa.array(cf),
            "df": pa.array(df),
            "vmr": pa.array(vmr, pa.float64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow",
                           zero_copy_batch=True)


def source_similarity(ds, text_col: str, *, source_col: str,
                      k: int = 10):
    """Weighted-Jaccard (Ruzicka) similarity between per-source word
    distributions: for sources A, B with word counts a_w, b_w,
    sim = sum_w min(a_w, b_w) / sum_w max(a_w, b_w) -- the exact
    bag-of-words overlap that catches mirror/scraper sources whose
    per-document texts never collide (set-level dedup misses them).
    Reports the top-k most similar pairs.

    One O(distinct words x sources) shuffle, pairwise kernel on the
    tiny (source, token) aggregate.  Exact integer sums.  Output:
    (src_a, src_b, wjac round-6), wjac desc then names asc.
    """
    from ray.data.aggregate import Sum

    def word_partials(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column(source_col)))
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        counts = _row_counts(offsets)
        parents = np.repeat(np.arange(len(counts), dtype=np.int64),
                            counts)
        src = batch.column(source_col).take(pa.array(parents))
        t = pa.table({"src": src, "token": flat})
        return t.group_by(["src", "token"]).aggregate(
            [("token", "count")]).rename_columns(
                ["src", "token", "n"])

    wc = (
        ds.select_columns([text_col, source_col])
        .map_batches(word_partials, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby(["src", "token"]).aggregate(Sum("n", alias_name="n"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("src_a", pa.string()),
                            ("src_b", pa.string()),
                            ("wjac", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        srcs = t.column("src").to_pylist()
        toks = t.column("token").to_pylist()
        n = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.int64)
        u_src = sorted(set(srcs))
        u_tok = sorted(set(toks))
        si = {v: i for i, v in enumerate(u_src)}
        ti = {v: i for i, v in enumerate(u_tok)}
        mat = np.zeros((len(u_src), len(u_tok)), dtype=np.int64)
        for s_, w_, c_ in zip(srcs, toks, n):
            mat[si[s_], ti[w_]] = c_
        rows = []
        for i in range(len(u_src)):
            for j in range(i + 1, len(u_src)):
                mx = int(np.maximum(mat[i], mat[j]).sum())
                mn = int(np.minimum(mat[i], mat[j]).sum())
                if mx > 0:
                    # sort on the UNROUNDED ratio (rounding is
                    # monotone but collapses near-ties the SQL mirror
                    # still distinguishes); round only for output
                    rows.append((u_src[i], u_src[j], mn / mx))
        rows.sort(key=lambda r: (-r[2], r[0], r[1]))
        rows = rows[:k]
        return pa.table({
            "src_a": pa.array([r[0] for r in rows], pa.string()),
            "src_b": pa.array([r[1] for r in rows], pa.string()),
            "wjac": pa.array([round(r[2], 6) for r in rows],
                             pa.float64()),
        })

    return wc.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def script_mix_audit(ds, text_col: str, *, lang_col: str):
    """Script-mixing and invisible-character audit per language: counts
    documents whose text (a) mixes Han and Latin letters, (b) contains
    zero-width/invisible characters (ZWSP/ZWNJ/ZWJ/BOM), or (c)
    carries bidirectional control characters -- the homoglyph/spoofing
    and copy-paste-artifact screens a multilingual corpus needs before
    training (invisible chars silently split tokens).

    Both engines evaluate the SAME RE2 patterns (Arrow and DuckDB both
    embed RE2), so the flags are definitionally identical.  One
    O(langs) shuffle of per-batch counts.  Output: (lang, n_docs,
    n_mixed_script, n_invisible, n_bidi) int64.
    """
    from ray.data.aggregate import Count, Sum

    RE_MIXED = r"\p{Han}[^\s]*[A-Za-z]|[A-Za-z][^\s]*\p{Han}"
    RE_INVIS = "[​‌‍﻿]"
    RE_BIDI = "[‪-‮⁦-⁩]"

    def partials(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(lang_col)),
                     pc.is_valid(t.column(text_col)))
        t = t.filter(ok)
        txt = t.column(text_col)
        mixed = pc.cast(pc.match_substring_regex(txt, RE_MIXED),
                        pa.int64())
        invis = pc.cast(pc.match_substring_regex(txt, RE_INVIS),
                        pa.int64())
        bidi = pc.cast(pc.match_substring_regex(txt, RE_BIDI),
                       pa.int64())
        return pa.table({"lang": t.column(lang_col),
                         "mixed": mixed, "invis": invis,
                         "bidi": bidi})

    return (ds.select_columns([text_col, lang_col])
            .map_batches(partials, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("lang").aggregate(
                Count(alias_name="n_docs"),
                Sum("mixed", alias_name="n_mixed_script"),
                Sum("invis", alias_name="n_invisible"),
                Sum("bidi", alias_name="n_bidi")))
