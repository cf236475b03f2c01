"""End-to-end corpus preparation: the composed LLM-training-data
pipeline (quality-filter -> exact-dedup keep-first -> per-language
summary) as ONE lazy streaming plan.

Engine extension (the reference validates, it does not prepare
corpora).  Design for 100 TB:

- ONE text scan computes every per-doc feature (quality score, md5
  fingerprint, language ID) in a single fused ``map_batches`` kernel —
  the text column is read once and never shuffled.
- The quality filter is a vectorized mask in the same pass, so
  below-threshold docs never reach the exchange.
- Dedup is ONE hash-shuffle ``groupby(fingerprint).aggregate`` (a
  vectorized hash aggregate, not per-group Python); duplicate rows
  carry identical features by construction (exact-text duplicates), so
  the representative's features survive as ``min``.
- The final per-language rollup is a tiny second groupby over
  (#languages) rows per block.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.text import (
    _PUNCT_RE,
    LANG_ORDER,
    STOPWORDS,
    _per_row_hits,
    _row_counts,
    tokens_and_offsets,
)

__all__ = ["corpus_prep", "embedding_hygiene"]


def embedding_hygiene(emb_ds, *, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      label_col: str = "label",
                      threshold: float = 0.4):
    """Embedding-corpus hygiene as one composed plan: exact cosine
    near-dup detection (blocked grid join — the scale path), drop the
    GREATER id of every near-dup pair (deterministic keep-first rule,
    no transitive chasing), then per-label survivor counts.

    The drop set is bounded by the duplicate count, so it is collected
    once and broadcast via ``ray.put``; the corpus itself streams
    through a vectorized is_in filter.  Output: (label, n_kept).
    """
    import ray
    from ray.data.aggregate import Count

    from ..stages.similarity import neardup_cosine_pairs

    pairs = neardup_cosine_pairs(
        emb_ds.select_columns([id_col, vec_col]),
        id_col=id_col, vec_col=vec_col, threshold=threshold,
        mode="blocked",
    )
    from ..stages.base import collect_table

    drop = pc.unique(
        collect_table(pairs, ["b"]).column("b").combine_chunks()
    )
    handle = ray.put(drop)

    def keep(batch: pa.Table) -> pa.Table:
        d = ray.get(handle)
        if len(d) == 0:      # no near-dup pairs: keep everything
            return batch
        mask = pc.invert(pc.is_in(batch.column(id_col), value_set=d))
        return batch.filter(mask)

    kept = emb_ds.select_columns([id_col, label_col]).map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True
    )
    return kept.groupby(label_col).aggregate(Count(alias_name="n_kept"))


def corpus_prep(ds, *, text_col: str = "text", id_col: str = "doc_id",
                min_quality: float = 0.45):
    """(lang_pred, n_docs, n_total, mean_quality) per language over the
    quality-filtered, exact-deduplicated corpus.

    ``n_docs`` = unique surviving documents, ``n_total`` = rows before
    dedup (so ``n_total - n_docs`` is the duplicate count), and
    ``mean_quality`` averages the representatives' quality scores.
    """
    from ray.data.aggregate import Count, Mean, Min, Sum

    en_words = STOPWORDS["en"]

    def features(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        flat, offsets = tokens_and_offsets(text)
        n_tok = _row_counts(offsets).astype(np.float64)
        n_chars = pc.utf8_length(text).to_numpy(
            zero_copy_only=False).astype(np.float64)
        punct = pc.count_substring_regex(text, _PUNCT_RE).to_numpy(
            zero_copy_only=False).astype(np.float64)
        stop = _per_row_hits(flat, offsets, en_words).astype(np.float64)
        quality = (
            0.5 * (np.minimum(n_tok, 100.0) / 100.0)
            + 0.3 * (stop / np.maximum(n_tok, 1.0))
            + 0.2 * (1.0 - punct / np.maximum(n_chars, 1.0))
        )
        scores = np.zeros((batch.num_rows, len(LANG_ORDER)), dtype=np.int64)
        for j, lang in enumerate(LANG_ORDER):
            scores[:, j] = _per_row_hits(flat, offsets, STOPWORDS[lang])
        best = np.argmax(scores, axis=1)
        pred = np.asarray(LANG_ORDER, dtype=object)[best]
        pred[scores.sum(axis=1) == 0] = "unknown"
        texts = text.to_pylist()
        fp = [hashlib.md5(("" if t is None else t).encode("utf-8")).hexdigest()
              for t in texts]
        keep = quality >= min_quality
        return pa.table({
            id_col: batch.column(id_col),
            "fp": pa.array(fp),
            "quality": pa.array(quality),
            "lang_pred": pa.array(pred),
        }).filter(pa.array(keep))

    feats = ds.select_columns([id_col, text_col]).map_batches(
        features, batch_format="pyarrow", zero_copy_batch=True
    )
    # exact-text duplicates have identical quality/lang, so Min picks
    # the representative's values for free alongside the keep-first id
    reps = feats.groupby("fp").aggregate(
        Count(alias_name="n"),
        Min(id_col, alias_name="keep_id"),
        Min("quality", alias_name="quality"),
        Min("lang_pred", alias_name="lang_pred"),
    )
    return reps.groupby("lang_pred").aggregate(
        Count(alias_name="n_docs"),
        Sum("n", alias_name="n_total"),
        Mean("quality", alias_name="mean_quality"),
    )


def mixture_weights(ds, *, text_col: str = "text", group_col: str = "lang"):
    """Data-mixing weights: per-group token counts -> inverse-share
    sampling weight normalized to sum 1 (uniform target mixture), the
    standard corpus-rebalancing step before pretraining sampling.

    Plan: one fused tokenize pass emits (group, n_tokens) partials,
    a groupby(group) Sum reduces them (shuffle moves one row per group
    per block), and the normalization runs on the materialized per-group
    table — bounded by group cardinality, never by corpus size.
    Zero-token groups get a NULL weight and are excluded from the
    normalizing sum.
    """
    import numpy as np
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from ..stages.text import _row_counts, tokens_and_offsets

    def kernel(batch: pa.Table) -> pa.Table:
        _, offsets = tokens_and_offsets(batch.column(text_col))
        return pa.table({
            group_col: batch.column(group_col),
            "n": pa.array(_row_counts(offsets)),
        })

    counts = ds.select_columns([group_col, text_col]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(group_col).aggregate(Sum("n", alias_name="n_tokens"))

    batches = list(counts.iter_batches(batch_format="pyarrow",
                                       batch_size=65536))
    t = pa.concat_tables(batches) if batches else pa.table(
        {group_col: pa.array([], pa.string()),
         "n_tokens": pa.array([], pa.int64())})
    t = t.sort_by([(group_col, "ascending")])
    n = t.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.float64)
    tot = n.sum()
    share = np.divide(n, tot, out=np.zeros_like(n), where=tot > 0)
    inv = np.divide(tot, n, out=np.zeros_like(n), where=n > 0)
    inv_sum = inv.sum()
    weight = np.divide(inv, inv_sum, out=np.zeros_like(n), where=inv_sum > 0)
    nz = n > 0
    return pa.table({
        group_col: t.column(group_col),
        "n_tokens": t.column("n_tokens"),
        "share": pa.array(share, pa.float64(), mask=~nz),
        "weight": pa.array(weight, pa.float64(), mask=~nz),
    })


def quality_funnel(ds, *, text_col: str = "text", id_col: str = "doc_id",
                   min_tokens: int = 20, max_tokens: int = 90,
                   min_stop_ratio: float = 0.03,
                   min_quality: float = 0.55):
    """C4/Gopher-style filter-funnel report: rules applied IN ORDER,
    each row = (stage, rule, n_dropped among docs surviving the earlier
    rules, n_remaining after it).

    Plan: ONE fused feature pass per batch reduces to a 5-int partial
    (total + first-failing-rule counts); ``Dataset.sum`` combines the
    partials — the shuffle moves one tiny row per block, never docs.
    """
    import numpy as np
    import pyarrow as pa

    from ..stages.text import (STOPWORDS, _PUNCT_RE, _per_row_hits,
                               _row_counts, tokens_and_offsets)

    en_words = STOPWORDS["en"]

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        flat, offsets = tokens_and_offsets(text)
        n_tok = _row_counts(offsets).astype(np.float64)
        n_chars = pc.utf8_length(text).to_numpy(
            zero_copy_only=False).astype(np.float64)
        punct = pc.count_substring_regex(text, _PUNCT_RE).to_numpy(
            zero_copy_only=False).astype(np.float64)
        stop = _per_row_hits(flat, offsets, en_words).astype(np.float64)
        ratio = stop / np.maximum(n_tok, 1.0)
        quality = (
            0.5 * (np.minimum(n_tok, 100.0) / 100.0)
            + 0.3 * ratio
            + 0.2 * (1.0 - punct / np.maximum(n_chars, 1.0))
        )
        f1 = n_tok < min_tokens
        f2 = ~f1 & (n_tok > max_tokens)
        f3 = ~f1 & ~f2 & (ratio < min_stop_ratio)
        f4 = ~f1 & ~f2 & ~f3 & (quality < min_quality)
        return pa.table({
            "total": pa.array([batch.num_rows], pa.int64()),
            "d1": pa.array([int(f1.sum())], pa.int64()),
            "d2": pa.array([int(f2.sum())], pa.int64()),
            "d3": pa.array([int(f3.sum())], pa.int64()),
            "d4": pa.array([int(f4.sum())], pa.int64()),
        })

    sums = ds.select_columns([id_col, text_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).sum(["total", "d1", "d2", "d3", "d4"])
    sums = sums or {f"sum({c})": 0 for c in ("total", "d1", "d2", "d3", "d4")}
    total = sums["sum(total)"]
    drops = [sums[f"sum(d{i})"] for i in (1, 2, 3, 4)]
    rules = ["too_short", "too_long", "low_stopword", "low_quality"]
    remaining, rem = [], total
    for d in drops:
        rem -= d
        remaining.append(rem)
    return pa.table({
        "stage": pa.array([1, 2, 3, 4], pa.int64()),
        "rule": pa.array(rules),
        "n_dropped": pa.array(drops, pa.int64()),
        "n_remaining": pa.array(remaining, pa.int64()),
    })


def sample_token_budget(ds, *, text_col: str = "text",
                        id_col: str = "doc_id", group_col: str = "lang",
                        budget_tokens: int = 3000):
    """Token-budget-aware mixture sampling: each group (language /
    source) is hash-downsampled at ``rate = min(1, budget / tokens)``
    so every group contributes roughly ``budget_tokens`` whitespace
    tokens — the "sample the corpus to a per-language token budget"
    step of mixture construction.

    Two passes: a tiny per-group token-sum aggregate (collected —
    bounded by group cardinality) sets the rates; then
    :func:`~..stages.sampling.stratified_hash_sample` applies them in
    one streaming md5-keyed pass (deterministic; a SQL oracle
    recomputes the same keep decision).  Returns (id, group) of kept
    docs."""
    from ray.data.aggregate import Sum

    from ..stages.sampling import stratified_hash_sample
    from ..stages.text import _row_counts, tokens_and_offsets

    def partial(batch: pa.Table) -> pa.Table:
        _, offsets = tokens_and_offsets(batch.column(text_col))
        t = pa.table({group_col: batch.column(group_col),
                      "nt": pa.array(_row_counts(offsets).astype(
                          np.int64))})
        g = t.group_by(group_col).aggregate([("nt", "sum")])
        return pa.table({group_col: g.column(group_col),
                         "nt": g.column("nt_sum")})

    totals = pa.concat_tables(list(
        ds.select_columns([group_col, text_col]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).groupby(group_col).aggregate(Sum("nt", alias_name="nt"))
        .iter_batches(batch_format="pyarrow")))
    rates = {
        g: min(1.0, float(budget_tokens) / float(t)) if t else 1.0
        for g, t in zip(totals.column(group_col).to_pylist(),
                        totals.column("nt").to_pylist())
    }
    kept = stratified_hash_sample(
        ds.select_columns([id_col, group_col]), id_col=id_col,
        strata_col=group_col, rates=rates, default_rate=1.0)
    return kept
