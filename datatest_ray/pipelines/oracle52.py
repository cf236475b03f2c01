"""Driver-contract queries, batch 52 (see oracle.py for the contract):
vocabulary-richness spectrum statistics (Yule's K / Simpson's D /
Honore's H), Heaps'-law vocabulary-growth fit, DDSketch relative-error
quantiles, and tie-aware average precision (PR-AUC).  Merged into
``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict

import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_vocab_richness_lang(sf_dir: str):
    """Yule's K / Simpson's D / Honore's H per language from the word
    frequency spectrum (stages/text.py :: vocab_richness)."""
    from ..stages.text import vocab_richness

    return _materialize(vocab_richness(
        _read(sf_dir, "documents", ["text", "lang"]),
        "text", lang_col="lang"))


SQL_VOCAB_RICHNESS_LANG = """
WITH toks AS (
  SELECT lang,
         unnest(string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+')) AS token
  FROM documents
  WHERE lang IS NOT NULL AND trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) <> ''),
wc AS (
  SELECT lang, token, CAST(count(*) AS BIGINT) AS m
  FROM toks WHERE token <> '' GROUP BY 1, 2),
agg AS (
  SELECT lang,
         CAST(sum(m) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS v,
         CAST(sum(m * m) AS BIGINT) AS m2,
         CAST(sum(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1
  FROM wc GROUP BY 1)
SELECT lang,
       n AS n_tokens,
       v AS vocab,
       CASE WHEN n > 0
            THEN round(10000.0 * (m2 - n) / (CAST(n AS DOUBLE) * n), 6)
       END AS yules_k,
       CASE WHEN n > 1
            THEN round(CAST(m2 - n AS DOUBLE)
                       / (CAST(n AS DOUBLE) * (n - 1)), 6)
       END AS simpson_d,
       CASE WHEN n > 0 AND v > 0 AND v1 < v
            THEN round(100.0 * ln(n) / (1.0 - CAST(v1 AS DOUBLE) / v), 6)
       END AS honore_h
FROM agg
"""


def q_heaps_law_docs(sf_dir: str):
    """Heaps'-law (V ~ k N^beta) OLS fit per language over per-doc
    (tokens, distinct types) (stages/text.py :: heaps_law)."""
    from ..stages.text import heaps_law

    return _materialize(heaps_law(
        _read(sf_dir, "documents", ["text", "lang"]),
        "text", lang_col="lang"))


SQL_HEAPS_LAW_DOCS = """
WITH per_doc AS (
  SELECT lang,
         CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) = '' THEN 0
              ELSE len(string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+'))
         END AS nt,
         CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) = '' THEN 0
              ELSE len(list_distinct(
                     string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+')))
         END AS nd
  FROM documents WHERE lang IS NOT NULL),
logs AS (
  SELECT lang, ln(nt) AS x, ln(nd) AS y
  FROM per_doc WHERE nt > 0),
agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy
  FROM logs GROUP BY 1)
SELECT lang, n_docs,
       CASE WHEN n_docs >= 2 AND n_docs * sxx - sx * sx <> 0
            THEN round((n_docs * sxy - sx * sy)
                       / (n_docs * sxx - sx * sx), 6)
       END AS beta,
       CASE WHEN n_docs >= 2 AND n_docs * sxx - sx * sx <> 0
            THEN round(exp(sy / n_docs
                           - ((n_docs * sxy - sx * sy)
                              / (n_docs * sxx - sx * sx))
                             * sx / n_docs), 6)
       END AS k
FROM agg
"""


def q_ddsketch_price(sf_dir: str):
    """DDSketch (gamma = 1.02, <=1% relative error) p50/p90/p99 of
    o_totalprice -- deterministic log-bucket quantiles, fully
    oracle-paired unlike the t-digest
    (stages/profile.py :: ddsketch_quantiles)."""
    from ..stages.profile import ddsketch_quantiles

    return _materialize(ddsketch_quantiles(
        _read(sf_dir, "orders", ["o_totalprice"]),
        "o_totalprice", gamma=1.02, qs=(0.5, 0.9, 0.99)))


SQL_DDSKETCH_PRICE = """
WITH f AS (
  SELECT o_totalprice AS x FROM orders
  WHERE o_totalprice IS NOT NULL AND o_totalprice > 0),
b AS (
  SELECT CAST(ceil(round(ln(x) / ln(1.02), 9)) AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS n
  FROM f GROUP BY 1),
w AS (
  SELECT bucket, CAST(sum(n) OVER (ORDER BY bucket) AS BIGINT) AS cum
  FROM b),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM b),
qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q),
pick AS (
  SELECT qs.q,
         min(w.bucket) AS bucket
  FROM qs, tot
  JOIN w ON w.cum >= greatest(CAST(ceil(qs.q * tot.n) AS BIGINT), 1)
  GROUP BY qs.q)
SELECT q, bucket,
       round(2.0 * power(1.02, bucket) / 2.02, 6) AS est
FROM pick
"""


def q_pr_auc_purchase(sf_dir: str):
    """Tie-aware average precision of ``value`` as a score for
    event_type = 'purchase' (stages/mlprep.py :: average_precision)."""
    from ..stages.mlprep import average_precision

    ds = _read(sf_dir, "events", ["event_type", "value"])
    return _materialize(average_precision(
        ds, score_col="value",
        label_expr=lambda t: pc.equal(t.column("event_type"),
                                      "purchase")))


SQL_PR_AUC_PURCHASE = """
WITH f AS (
  SELECT value AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL),
g AS (
  SELECT s, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS tp
  FROM f GROUP BY s),
w AS (
  SELECT s, n, tp,
         CAST(sum(tp) OVER (ORDER BY s DESC) AS BIGINT) AS ctp,
         CAST(sum(n) OVER (ORDER BY s DESC) AS BIGINT) AS cn
  FROM g),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n,
               CAST(sum(tp) AS BIGINT) AS p FROM g)
SELECT tot.n, tot.p,
       CASE WHEN tot.p > 0
            THEN round(sum((CAST(tp AS DOUBLE) / tot.p)
                           * (CAST(ctp AS DOUBLE) / cn)), 6)
       END AS ap
FROM w, tot
GROUP BY tot.n, tot.p
"""


QUERIES52: Dict[str, Callable] = {
    "vocab_richness_lang": q_vocab_richness_lang,
    "heaps_law_docs": q_heaps_law_docs,
    "ddsketch_price": q_ddsketch_price,
    "pr_auc_purchase": q_pr_auc_purchase,
}

SQL52: Dict[str, str] = {
    "vocab_richness_lang": SQL_VOCAB_RICHNESS_LANG,
    "heaps_law_docs": SQL_HEAPS_LAW_DOCS,
    "ddsketch_price": SQL_DDSKETCH_PRICE,
    "pr_auc_purchase": SQL_PR_AUC_PURCHASE,
}
