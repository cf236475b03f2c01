"""Driver-contract queries, batch 60 (see oracle.py for the contract):
DSIR importance-weight profile per language, Hampel robust outlier
census over daily counts, and first-order partial correlation.
Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_dsir_profile_docs(sf_dir: str):
    """DSIR unigram log-likelihood-ratio score profile per language
    (target LM = lang 'en') (stages/text.py :: dsir_profile)."""
    from ..stages.text import dsir_profile

    return _materialize(dsir_profile(
        _read(sf_dir, "documents", ["text", "lang"]),
        "text", lang_col="lang", target_lang="en"))


SQL_DSIR_PROFILE_DOCS = """
WITH toks AS (
  SELECT lang,
         row_number() OVER () AS doc_key,
         string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+') AS ws
  FROM documents WHERE lang IS NOT NULL AND trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) <> ''),
tk AS (
  SELECT lang, doc_key, unnest(ws) AS w FROM toks),
tk2 AS (SELECT lang, doc_key, w FROM tk WHERE w <> ''),
vocab AS (
  SELECT w, CAST(count(*) AS BIGINT) AS n_all,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_t
  FROM tk2 GROUP BY w),
tot AS (
  SELECT CAST(sum(n_all) AS BIGINT) AS na,
         CAST(sum(n_t) AS BIGINT) AS nt,
         CAST(count(*) AS BIGINT) AS v
  FROM vocab),
lr AS (
  SELECT w,
         ln((n_t + 1) / CAST(nt + v AS DOUBLE))
           - ln((n_all + 1) / CAST(na + v AS DOUBLE)) AS lr
  FROM vocab, tot),
doc AS (
  SELECT tk2.lang, tk2.doc_key,
         sum(lr.lr) / count(*) AS score
  FROM tk2 JOIN lr ON lr.w = tk2.w
  GROUP BY tk2.lang, tk2.doc_key),
agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         sum(score) AS s, sum(score * score) AS s2
  FROM doc GROUP BY lang)
SELECT lang, n_docs,
       round(s / n_docs, 6) AS mean_score,
       round(sqrt(greatest(s2 / n_docs - (s / n_docs) * (s / n_docs),
                           0.0)), 6) AS sd_score
FROM agg
"""


def q_hampel_events(sf_dir: str):
    """Hampel (median/MAD) outlier census per event type over the
    7-day trailing window (stages/temporal.py :: hampel_daily)."""
    from ..stages.temporal import hampel_daily

    return _materialize(hampel_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type", window=7, k=3.0))


SQL_HAMPEL_EVENTS = """
WITH f AS (
  SELECT event_type AS g,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL),
daily AS (
  SELECT g, day, CAST(count(*) AS BIGINT) AS x
  FROM f GROUP BY 1, 2),
numbered AS (
  SELECT g, x,
         CAST(row_number() OVER (PARTITION BY g ORDER BY day)
              AS BIGINT) AS rn,
         CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS m
  FROM daily),
win AS (
  SELECT a.g, a.rn, max(a.x) AS x0,
         median(b.x) AS med
  FROM numbered a
  JOIN numbered b ON b.g = a.g AND b.rn BETWEEN a.rn - 6 AND a.rn
  WHERE a.rn >= 7
  GROUP BY a.g, a.rn),
dev AS (
  SELECT w.g, w.rn, w.x0, w.med, abs(b.x - w.med) AS ad
  FROM win w
  JOIN numbered b ON b.g = w.g AND b.rn BETWEEN w.rn - 6 AND w.rn),
mad AS (
  SELECT g, rn, max(x0) AS x0, max(med) AS med, median(ad) AS mad
  FROM dev GROUP BY g, rn),
nd AS (SELECT g, CAST(max(m) AS BIGINT) AS n_days FROM numbered
       GROUP BY g)
SELECT nd.g AS event_type, nd.n_days,
       CAST(count(mad.rn) AS BIGINT) AS n_windows,
       CAST(coalesce(sum(CASE WHEN mad.mad > 0
                               AND abs(mad.x0 - mad.med)
                                   > 3.0 * 1.4826 * mad.mad
                          THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_outliers
FROM nd LEFT JOIN mad ON mad.g = nd.g
GROUP BY nd.g, nd.n_days
"""


def q_partial_corr_lineitem(sf_dir: str):
    """Partial correlation of quantity and extended price controlling
    for discount (stages/stattests.py :: partial_correlation)."""
    from ..stages.stattests import partial_correlation

    return _materialize(partial_correlation(
        _read(sf_dir, "lineitem",
              ["l_quantity", "l_extendedprice", "l_discount"]),
        x_col="l_quantity", y_col="l_extendedprice",
        z_col="l_discount"))


SQL_PARTIAL_CORR_LINEITEM = """
WITH f AS (
  SELECT CAST(round(l_quantity * 100) AS BIGINT) AS x,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
         CAST(round(l_discount * 100) AS BIGINT) AS z
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    AND l_discount IS NOT NULL),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(z) AS BIGINT) AS sz,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(z * z) AS BIGINT) AS szz,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * z) AS BIGINT) AS sxz,
         CAST(sum(y * z) AS BIGINT) AS syz
  FROM f),
r AS (
  SELECT n,
         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                  * (CAST(n AS DOUBLE) * syy
                     - CAST(sy AS DOUBLE) * sy)) AS r_xy,
         (CAST(n AS DOUBLE) * sxz - CAST(sx AS DOUBLE) * sz)
           / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                  * (CAST(n AS DOUBLE) * szz
                     - CAST(sz AS DOUBLE) * sz)) AS r_xz,
         (CAST(n AS DOUBLE) * syz - CAST(sy AS DOUBLE) * sz)
           / sqrt((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
                  * (CAST(n AS DOUBLE) * szz
                     - CAST(sz AS DOUBLE) * sz)) AS r_yz
  FROM s WHERE n >= 3)
SELECT n, round(r_xy, 6) AS r_xy, round(r_xz, 6) AS r_xz,
       round(r_yz, 6) AS r_yz,
       CASE WHEN (1.0 - r_xz * r_xz) * (1.0 - r_yz * r_yz) > 0
            THEN round((r_xy - r_xz * r_yz)
                       / sqrt((1.0 - r_xz * r_xz)
                              * (1.0 - r_yz * r_yz)), 6)
       END AS r_xy_z
FROM r
"""


QUERIES60: Dict[str, Callable] = {
    "dsir_profile_docs": q_dsir_profile_docs,
    "hampel_events": q_hampel_events,
    "partial_corr_lineitem": q_partial_corr_lineitem,
}

SQL60: Dict[str, str] = {
    "dsir_profile_docs": SQL_DSIR_PROFILE_DOCS,
    "hampel_events": SQL_HAMPEL_EVENTS,
    "partial_corr_lineitem": SQL_PARTIAL_CORR_LINEITEM,
}
