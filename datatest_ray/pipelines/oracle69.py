"""Driver-contract queries, batch 69 (see oracle.py for the contract):
species-richness estimators (Chao1 / Good-Turing / Hill) and per-word
burstiness over the document corpus.  Merged into
``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_species_richness_lang(sf_dir: str):
    """Chao1, Good-Turing unseen mass and Hill-1 effective vocabulary
    per language (stages/text.py :: species_richness)."""
    from ..stages.text import species_richness

    return _materialize(species_richness(
        _read(sf_dir, "documents", ["text", "lang"]),
        "text", lang_col="lang"))


SQL_SPECIES_RICHNESS_LANG = """
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
         CAST(sum(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
         CAST(sum(CASE WHEN m = 2 THEN 1 ELSE 0 END) AS BIGINT) AS v2,
         sum(m * ln(m)) AS mlnm
  FROM wc GROUP BY 1)
SELECT lang, n AS n_tokens, v AS vocab, v1, v2,
       CASE WHEN v2 > 0
            THEN round(v + v1 * v1 / (2.0 * v2), 6) END AS chao1,
       CASE WHEN n > 0
            THEN round(v1 / CAST(n AS DOUBLE), 6) END AS gt_p0,
       CASE WHEN n > 0
            THEN round(exp(ln(n) - mlnm / n), 6) END AS hill_1
FROM agg
"""


def q_word_burstiness_docs(sf_dir: str):
    """Variance-to-mean (Church-Gale burstiness) of the top-10 corpus
    words' per-document counts (stages/text.py :: word_burstiness)."""
    from ..stages.text import word_burstiness

    return _materialize(word_burstiness(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        "text", id_col="doc_id", k=10))


SQL_WORD_BURSTINESS_DOCS = """
WITH d AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+')) AS token
  FROM documents WHERE trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) <> ''),
tk AS (SELECT doc_id, token FROM toks WHERE token <> ''),
top AS (
  SELECT token, CAST(count(*) AS BIGINT) AS cf
  FROM tk GROUP BY token
  ORDER BY cf DESC, token LIMIT 10),
dc AS (
  SELECT tk.token, tk.doc_id, CAST(count(*) AS BIGINT) AS c
  FROM tk JOIN top ON top.token = tk.token
  GROUP BY 1, 2),
agg AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df,
         CAST(sum(c) AS BIGINT) AS cf,
         CAST(sum(c * c) AS BIGINT) AS c2
  FROM dc GROUP BY token)
SELECT agg.token, agg.cf, agg.df,
       CASE WHEN agg.cf > 0
            THEN round((CAST(agg.c2 AS DOUBLE) / d.nd
                        - (CAST(agg.cf AS DOUBLE) / d.nd)
                          * (CAST(agg.cf AS DOUBLE) / d.nd))
                       / (CAST(agg.cf AS DOUBLE) / d.nd), 6)
       END AS vmr
FROM agg, d
"""


QUERIES69: Dict[str, Callable] = {
    "species_richness_lang": q_species_richness_lang,
    "word_burstiness_docs": q_word_burstiness_docs,
}

SQL69: Dict[str, str] = {
    "species_richness_lang": SQL_SPECIES_RICHNESS_LANG,
    "word_burstiness_docs": SQL_WORD_BURSTINESS_DOCS,
}
