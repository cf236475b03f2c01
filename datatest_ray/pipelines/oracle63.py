"""Driver-contract queries, batch 63 (see oracle.py for the contract):
lag-1 Granger causality and binary transfer entropy between the click
and purchase daily streams.  Merged into ``oracle.queries()`` /
``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


_DAILY_XY_CTE = """
WITH f AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ib
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL),
d AS (SELECT day, CAST(sum(ia) AS BIGINT) AS x,
             CAST(sum(ib) AS BIGINT) AS y
      FROM f GROUP BY 1),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d)
"""


def q_granger_click_purchase(sf_dir: str):
    """Does yesterday's click volume Granger-cause today's purchase
    volume at lag 1? (stages/temporal.py :: granger_lag1_daily)."""
    from ..stages.temporal import granger_lag1_daily

    return _materialize(granger_lag1_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", type_col="event_type", cause="click", effect="purchase"))


SQL_GRANGER_CLICK_PURCHASE = _DAILY_XY_CTE + """,
ord_ AS (
  SELECT day, x, y,
         lead(y) OVER (ORDER BY day) AS yn
  FROM d),
samp AS (SELECT y AS z1, x AS z2, yn AS w FROM ord_
         WHERE yn IS NOT NULL),
s AS (
  SELECT CAST(count(*) AS DOUBLE) AS m,
         sum(CAST(z1 AS DOUBLE)) AS sz1,
         sum(CAST(z2 AS DOUBLE)) AS sz2,
         sum(CAST(w AS DOUBLE)) AS sw,
         sum(CAST(z1 AS DOUBLE) * z1) AS s11r,
         sum(CAST(z2 AS DOUBLE) * z2) AS s22r,
         sum(CAST(z1 AS DOUBLE) * z2) AS s12r,
         sum(CAST(z1 AS DOUBLE) * w) AS s1wr,
         sum(CAST(z2 AS DOUBLE) * w) AS s2wr,
         sum(CAST(w AS DOUBLE) * w) AS swwr
  FROM samp),
c AS (
  SELECT m,
         s11r - sz1 * sz1 / m AS s11,
         s22r - sz2 * sz2 / m AS s22,
         s12r - sz1 * sz2 / m AS s12,
         s1wr - sz1 * sw / m AS s1w,
         s2wr - sz2 * sw / m AS s2w,
         swwr - sw * sw / m AS sww
  FROM s),
fin AS (
  SELECT m, s11, s1w, s2w, sww, s12, s22,
         s11 * s22 - s12 * s12 AS det,
         (s22 * s1w - s12 * s2w) / (s11 * s22 - s12 * s12) AS b1,
         (s11 * s2w - s12 * s1w) / (s11 * s22 - s12 * s12) AS b2
  FROM c)
SELECT nd.n AS n_days,
       CASE WHEN nd.n >= 5 AND fin.det > 0 AND fin.s11 > 0
            THEN round(fin.b2, 6) END AS b_x,
       CASE WHEN nd.n >= 5 AND fin.det > 0 AND fin.s11 > 0
                 AND fin.sww - (fin.b1 * fin.s1w + fin.b2 * fin.s2w)
                     > 0
            THEN round(((fin.sww - fin.s1w * fin.s1w / fin.s11)
                        - (fin.sww - (fin.b1 * fin.s1w
                                      + fin.b2 * fin.s2w)))
                       * (fin.m - 3.0)
                       / (fin.sww - (fin.b1 * fin.s1w
                                     + fin.b2 * fin.s2w)), 6)
       END AS f
FROM nd, fin
"""


def q_transfer_entropy_click_purchase(sf_dir: str):
    """Binary transfer entropy TE(click -> purchase) over the daily
    spine (stages/temporal.py :: transfer_entropy_daily)."""
    from ..stages.temporal import transfer_entropy_daily

    return _materialize(transfer_entropy_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", type_col="event_type", cause="click", effect="purchase"))


SQL_TRANSFER_ENTROPY = _DAILY_XY_CTE + """,
med AS (SELECT median(x) AS mx, median(y) AS my FROM d),
bin AS (
  SELECT day,
         CASE WHEN x > med.mx THEN 1 ELSE 0 END AS a,
         CASE WHEN y > med.my THEN 1 ELSE 0 END AS b
  FROM d, med),
tr AS (
  SELECT lead(b) OVER (ORDER BY day) AS i, b AS j, a AS k
  FROM bin),
tr2 AS (SELECT i, j, k FROM tr WHERE i IS NOT NULL),
cnt AS (SELECT i, j, k, CAST(count(*) AS BIGINT) AS c
        FROM tr2 GROUP BY 1, 2, 3),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cnt),
njk AS (SELECT j, k, CAST(sum(c) AS BIGINT) AS njk
        FROM cnt GROUP BY 1, 2),
nij AS (SELECT i, j, CAST(sum(c) AS BIGINT) AS nij
        FROM cnt GROUP BY 1, 2),
nj AS (SELECT j, CAST(sum(c) AS BIGINT) AS nj FROM cnt GROUP BY 1),
te AS (
  SELECT tot.n,
         sum((CAST(cnt.c AS DOUBLE) / tot.n)
             * log2((CAST(cnt.c AS DOUBLE) * nj.nj)
                    / (CAST(njk.njk AS DOUBLE) * nij.nij))) AS te
  FROM cnt
  JOIN njk ON njk.j = cnt.j AND njk.k = cnt.k
  JOIN nij ON nij.i = cnt.i AND nij.j = cnt.j
  JOIN nj ON nj.j = cnt.j, tot
  GROUP BY tot.n)
SELECT nd.n AS n_days, te.n AS n_transitions, round(te.te, 6) AS te
FROM nd, te
"""


QUERIES63: Dict[str, Callable] = {
    "granger_click_purchase": q_granger_click_purchase,
    "transfer_entropy_click_purchase": q_transfer_entropy_click_purchase,
}

SQL63: Dict[str, str] = {
    "granger_click_purchase": SQL_GRANGER_CLICK_PURCHASE,
    "transfer_entropy_click_purchase": SQL_TRANSFER_ENTROPY,
}
