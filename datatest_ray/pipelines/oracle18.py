"""Driver-contract queries, batch 18 (see oracle.py for the contract):
stream-hygiene and corpus-hygiene audits — windowed rate-limit
suppression over the event stream, an NFC Unicode-normalization audit
(decomposed variants injected deterministically, same pattern as
``dedup_exact``), the SQL ``percent_rank`` window, and per-document
out-of-vocabulary rate against the broadcast top-K corpus vocabulary.
Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

import unicodedata
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
# Windowed rate-limit suppression (events beyond cap per user-hour)
# ---------------------------------------------------------------------------


def q_suppress_rate_limit(sf_dir: str):
    """Events suppressed by a 1-per-(user, hour) rate limit: the
    throttle/dedup gate collectors apply before a training pipeline
    sees the stream.  One coarse shuffle on user, vectorized window
    ranks (stages/sessions.py :: rate_limit)."""
    from ..stages.sessions import rate_limit

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    ev = ev.map_batches(
        lambda t: t.drop_null(), batch_format="pyarrow",
        zero_copy_batch=True)
    out = _materialize(rate_limit(
        ev, by="user_id", ts="ts", id_col="event_id",
        window_s=3600, cap=1))
    return out.sort_by([("event_id", "ascending")])


SQL_SUPPRESS_RATE_LIMIT = """
SELECT event_id, user_id, rn FROM (
  SELECT event_id, user_id,
         row_number() OVER (
           PARTITION BY user_id, date_trunc('hour', ts)
           ORDER BY ts, event_id) AS rn
  FROM events
  WHERE event_id IS NOT NULL AND user_id IS NOT NULL AND ts IS NOT NULL
) t WHERE rn > 1 ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# NFC Unicode-normalization audit (injected decomposed variants)
# ---------------------------------------------------------------------------


def q_nfc_audit_docs(sf_dir: str):
    """Documents whose text is NOT in Unicode NFC form — the
    canonicalization audit a multilingual corpus needs before exact
    dedup (decomposed 'e'+U+0301 vs precomposed 'é' defeats hash
    equality).  The testdata is pure ASCII, so decomposed variants are
    injected deterministically (doc_id % 20 == 0, re-keyed
    +2_000_000) — same injection pattern as ``dedup_exact``.
    Per-row ``unicodedata.normalize`` (no Arrow kernel exists); the
    scan is embarrassingly parallel, no shuffle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def inject(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(ids % 20 == 0))
        # decomposed prefix: 'Cafe' + COMBINING ACUTE (U+0301),
        # joined to the text with a single-space separator
        prefixed = pc.binary_join_element_wise(
            "Cafe\u0301", sub.column("text").cast(pa.string()), " ")
        return pa.table({
            "doc_id": pc.add(sub.column("doc_id"), 2_000_000),
            "text": prefixed,
        })

    def audit(t: pa.Table) -> pa.Table:
        # null text -> '' (never flagged), matching SQL's NULL<>NULL
        # three-valued filter
        texts = ["" if s is None else s
                 for s in t.column("text").to_pylist()]
        raw_len = np.fromiter((len(s) for s in texts), np.int64,
                              count=len(texts))
        nfc = [unicodedata.normalize("NFC", s) for s in texts]
        nfc_len = np.fromiter((len(s) for s in nfc), np.int64,
                              count=len(nfc))
        bad = np.fromiter((a != b for a, b in zip(texts, nfc)), bool,
                          count=len(texts))
        out = pa.table({
            "doc_id": t.column("doc_id"),
            "len_raw": pa.array(raw_len),
            "len_nfc": pa.array(nfc_len),
        })
        return out.filter(pa.array(bad))

    dups = ds.map_batches(inject, batch_format="pyarrow",
                          zero_copy_batch=True)
    out = _materialize(ds.union(dups).map_batches(
        audit, batch_format="pyarrow", zero_copy_batch=True))
    return out.sort_by([("doc_id", "ascending")])


SQL_NFC_AUDIT_DOCS = """
WITH docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id,
         'Cafe' || chr(769) || ' ' || text AS text
  FROM documents WHERE doc_id % 20 = 0
)
SELECT doc_id, length(text) AS len_raw,
       length(nfc_normalize(text)) AS len_nfc
FROM docs2 WHERE nfc_normalize(text) <> text ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# percent_rank window: top-0.1% order totals per priority
# ---------------------------------------------------------------------------


def q_percent_rank_orders(sf_dir: str):
    """``percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY
    o_totalprice)`` >= 0.999 — the per-stratum extreme-value screen.
    Tie-aware on the value alone, so no tie-break column is needed for
    engine/oracle parity (stages/winfunc.py :: percent_rank)."""
    from ..stages.winfunc import percent_rank

    ranked = percent_rank(
        _read(sf_dir, "orders",
              ["o_orderkey", "o_orderpriority", "o_totalprice"]),
        by="o_orderpriority", value_col="o_totalprice",
        id_col="o_orderkey")

    def keep(t: pa.Table) -> pa.Table:
        m = pc.fill_null(pc.greater_equal(t.column("pct"), 0.999), False)
        out = t.filter(m)
        return pa.table({
            "o_orderkey": out.column("o_orderkey"),
            "o_orderpriority": out.column("o_orderpriority"),
            # raw (rank-1)/(n-1) count rational, NOT rounded (6-dp
            # half-even vs half-away tie risk between engines)
            "pct": out.column("pct"),
        })

    return _materialize(ranked.map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True))


SQL_PERCENT_RANK_ORDERS = """
SELECT o_orderkey, o_orderpriority, pct FROM (
  SELECT o_orderkey, o_orderpriority,
         percent_rank() OVER (
           PARTITION BY o_orderpriority ORDER BY o_totalprice) AS pct
  FROM orders) t
WHERE pct >= 0.999
"""


# ---------------------------------------------------------------------------
# Out-of-vocabulary rate vs broadcast top-K corpus vocabulary
# ---------------------------------------------------------------------------


def q_oov_rate_docs(sf_dir: str):
    """Per-document out-of-vocabulary token rate against the corpus
    top-10 vocabulary — the tokenizer-coverage check run before
    committing a vocab.  Two passes: a combiner-backed global top-k
    (shuffle moves per-block distinct tokens, not occurrences), then a
    stateless scan with the 10-word vocab broadcast in the closure."""
    from ..stages.text import (_per_row_hits, _row_counts,
                               tokens_and_offsets, vocab_topk)

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    vocab = [r["token"] for r in vocab_topk(ds, "text", k=10).take(10)]

    def kernel(batch: pa.Table) -> pa.Table:
        flat, offsets = tokens_and_offsets(batch.column("text"))
        n = _row_counts(offsets)
        hits = _per_row_hits(flat, offsets, vocab)
        # integer counts only: a rounded rate invites half-tie
        # disagreements (banker's vs half-away) between engines
        oov = n - hits
        out = pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n),
            "n_oov": pa.array(oov.astype(np.int64)),
        })
        return out.filter(pa.array(n > 0))

    return _materialize(ds.map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True))


SQL_OOV_RATE_DOCS = """
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+')) AS w
  FROM documents WHERE text IS NOT NULL AND trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) <> ''),
vocab AS (
  SELECT w FROM (
    SELECT w, count(*) AS c FROM tok GROUP BY w
    ORDER BY c DESC, w LIMIT 10) v)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(*) FILTER (w NOT IN (SELECT w FROM vocab)) AS BIGINT)
         AS n_oov
FROM tok GROUP BY doc_id
"""


QUERIES18: Dict[str, Callable] = {
    "suppress_rate_limit": q_suppress_rate_limit,
    "nfc_audit_docs": q_nfc_audit_docs,
    "percent_rank_orders": q_percent_rank_orders,
    "oov_rate_docs": q_oov_rate_docs,
}

SQL18: Dict[str, str] = {
    "suppress_rate_limit": SQL_SUPPRESS_RATE_LIMIT,
    "nfc_audit_docs": SQL_NFC_AUDIT_DOCS,
    "percent_rank_orders": SQL_PERCENT_RANK_ORDERS,
    "oov_rate_docs": SQL_OOV_RATE_DOCS,
}
