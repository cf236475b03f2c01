"""Driver-contract queries, batch 50 (see oracle.py for the contract):
MASE forecast-accuracy scoreboard (Holt-Winters vs seasonal naive),
Poisson c-chart on daily error counts, declared-vs-predicted language
confusion matrix, and a deterministic hash-seeded bootstrap mean CI.
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


def q_mase_daily_events(sf_dir: str):
    """MASE of the Holt-Winters forecasts vs same-day-last-week naive,
    per event type (stages/temporal.py :: mase_daily)."""
    from ..stages.temporal import mase_daily

    return _materialize(mase_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type"))


SQL_MASE_DAILY_EVENTS = """
WITH RECURSIVE daily AS (
  SELECT event_type AS g,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2),
numbered AS (
  SELECT g, day, x,
         CAST(row_number() OVER (PARTITION BY g ORDER BY day)
              AS BIGINT) AS rn
  FROM daily),
init AS (
  SELECT g, list(CAST(x AS DOUBLE) ORDER BY rn) AS xs
  FROM numbered WHERE rn <= 7 GROUP BY g HAVING count(*) = 7),
init2 AS (
  SELECT g, xs,
         (((((((0.0 + xs[1]) + xs[2]) + xs[3]) + xs[4]) + xs[5])
            + xs[6]) + xs[7]) / 7.0 AS l
  FROM init),
rec(g, rn, l, b, s1, s2, s3, s4, s5, s6, s7) AS (
  SELECT g, CAST(7 AS BIGINT), l, CAST(0.0 AS DOUBLE),
         xs[1] - l, xs[2] - l, xs[3] - l, xs[4] - l,
         xs[5] - l, xs[6] - l, xs[7] - l
  FROM init2
  UNION ALL
  SELECT r.g, r.rn + 1,
         0.5 * (CAST(n.x AS DOUBLE) - r.s1) + 0.5 * (r.l + r.b),
         0.25 * ((0.5 * (CAST(n.x AS DOUBLE) - r.s1)
                  + 0.5 * (r.l + r.b)) - r.l) + 0.75 * r.b,
         r.s2, r.s3, r.s4, r.s5, r.s6, r.s7,
         0.25 * (CAST(n.x AS DOUBLE)
                 - (0.5 * (CAST(n.x AS DOUBLE) - r.s1)
                    + 0.5 * (r.l + r.b))) + 0.75 * r.s1
  FROM rec r JOIN numbered n ON n.g = r.g AND n.rn = r.rn + 1),
model AS (
  SELECT n.g, n.rn,
         abs(CAST(n.x AS DOUBLE) - (r.l + r.b + r.s1)) AS aresid
  FROM rec r JOIN numbered n ON n.g = r.g AND n.rn = r.rn + 1),
naive AS (
  SELECT a.g, a.rn,
         abs(CAST(a.x AS DOUBLE) - b.x) AS aresid
  FROM numbered a JOIN numbered b ON a.g = b.g AND b.rn = a.rn - 7
  WHERE a.rn >= 8),
mm AS (SELECT g, CAST(count(*) AS BIGINT) AS n_obs,
              avg(aresid) AS mae_m
       FROM model GROUP BY g),
mn AS (SELECT g, avg(aresid) AS mae_n FROM naive GROUP BY g)
SELECT mm.g AS event_type, mm.n_obs,
       round(mm.mae_m, 6) AS mae_model,
       round(mn.mae_n, 6) AS mae_naive,
       CASE WHEN mn.mae_n > 0
            THEN round(mm.mae_m / mn.mae_n, 6) END AS mase
FROM mm JOIN mn ON mm.g = mn.g
"""


def q_cchart_errors(sf_dir: str):
    """Poisson c-chart over daily 'error' event counts
    (stages/temporal.py :: c_chart)."""
    from ..stages.temporal import c_chart

    def only_errors(t: pa.Table):
        return pc.fill_null(
            pc.equal(t.column("event_type"), "error"), False)

    return _materialize(c_chart(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", filter_expr=only_errors))


SQL_CCHART_ERRORS = """
WITH daily AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM events
  WHERE event_type = 'error' AND ts IS NOT NULL
  GROUP BY 1),
t AS (SELECT CAST(sum(x) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM daily),
lim AS (SELECT s / CAST(n AS DOUBLE) AS cl,
               s / CAST(n AS DOUBLE)
                 + 3.0 * sqrt(s / CAST(n AS DOUBLE)) AS ucl,
               greatest(s / CAST(n AS DOUBLE)
                 - 3.0 * sqrt(s / CAST(n AS DOUBLE)), 0.0) AS lcl
        FROM t)
SELECT day, x, round(cl, 6) AS cl, round(ucl, 6) AS ucl,
       round(lcl, 6) AS lcl,
       (x > ucl OR x < lcl) AS out_of_control
FROM daily, lim
"""


def q_lang_confusion_docs(sf_dir: str):
    """Declared-vs-predicted language confusion matrix
    (stages/text.py :: lang_confusion)."""
    from ..stages.text import lang_confusion

    return _materialize(lang_confusion(
        _read(sf_dir, "documents", ["lang", "text"]),
        "text", lang_col="lang"))


def _sql_lang_confusion() -> str:
    # reuse the oracle-green per-doc predictor CTE verbatim: the engine
    # scorer and SQL_TEXT_LANG_ID are already pinned equal
    from .oracle import _DE, _EN, _ES, _FR, _ZH

    return f"""
WITH b AS (SELECT lang,
             CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) = '' THEN []
                  ELSE string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+')
             END AS ts
           FROM documents WHERE lang IS NOT NULL),
s AS (SELECT lang,
  len(list_filter(ts, t -> list_contains([{_EN}], t))) AS s_en,
  len(list_filter(ts, t -> list_contains([{_DE}], t))) AS s_de,
  len(list_filter(ts, t -> list_contains([{_FR}], t))) AS s_fr,
  len(list_filter(ts, t -> list_contains([{_ES}], t))) AS s_es,
  len(list_filter(ts, t -> list_contains([{_ZH}], t))) AS s_zh FROM b),
p AS (SELECT lang,
  CASE WHEN s_en+s_de+s_fr+s_es+s_zh = 0 THEN 'unknown'
       WHEN s_en >= greatest(s_de,s_fr,s_es,s_zh) THEN 'en'
       WHEN s_de >= greatest(s_fr,s_es,s_zh) THEN 'de'
       WHEN s_fr >= greatest(s_es,s_zh) THEN 'fr'
       WHEN s_es >= s_zh THEN 'es' ELSE 'zh' END AS lang_pred
  FROM s)
SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
FROM p GROUP BY 1, 2
"""


def q_bootstrap_ci_value(sf_dir: str):
    """Deterministic hash-seeded bootstrap CI (B=200) for the mean
    event value (stages/stattests.py :: hash_bootstrap_mean_ci)."""
    from ..stages.stattests import hash_bootstrap_mean_ci

    return _materialize(hash_bootstrap_mean_ci(
        _read(sf_dir, "events", ["event_id", "value"]),
        value_col="value", id_col="event_id", n_boot=200))


SQL_BOOTSTRAP_CI_VALUE = """
WITH reps AS (SELECT unnest(range(200)) AS r),
f AS (SELECT event_id AS id, CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL),
w AS (SELECT r,
             ((id * 2654435761 + r * 40503) % 2147483648) % 8 AS h,
             c
      FROM f CROSS JOIN reps),
w2 AS (SELECT r,
              CASE WHEN h < 3 THEN 0 WHEN h < 6 THEN 1
                   WHEN h < 7 THEN 2 ELSE 3 END AS wgt, c
       FROM w),
m AS (SELECT r, CAST(sum(wgt * c) AS BIGINT) AS swx,
             CAST(sum(wgt) AS BIGINT) AS sw
      FROM w2 GROUP BY r),
means AS (SELECT r, swx / (100.0 * sw) AS mu FROM m WHERE sw > 0),
ord AS (SELECT mu,
               CAST(row_number() OVER (ORDER BY mu, r) AS BIGINT) AS rn,
               CAST(count(*) OVER () AS BIGINT) AS b
        FROM means),
k AS (SELECT b, greatest(CAST(ceil(0.025 * b) AS BIGINT), 1) AS k
      FROM ord LIMIT 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c) AS BIGINT) AS sc
        FROM f)
SELECT tot.n, k.b,
       round(tot.sc / (100.0 * tot.n), 6) AS mean,
       (SELECT round(mu, 6) FROM ord, k WHERE rn = k.k) AS ci_lo,
       (SELECT round(mu, 6) FROM ord, k
        WHERE rn = k.b - k.k + 1) AS ci_hi
FROM tot, k
"""


QUERIES50: Dict[str, Callable] = {
    "mase_daily_events": q_mase_daily_events,
    "cchart_errors": q_cchart_errors,
    "lang_confusion_docs": q_lang_confusion_docs,
    "bootstrap_ci_value": q_bootstrap_ci_value,
}


def _sql50() -> Dict[str, str]:
    return {
        "mase_daily_events": SQL_MASE_DAILY_EVENTS,
        "cchart_errors": SQL_CCHART_ERRORS,
        "lang_confusion_docs": _sql_lang_confusion(),
        "bootstrap_ci_value": SQL_BOOTSTRAP_CI_VALUE,
    }
