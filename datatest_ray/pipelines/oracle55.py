"""Driver-contract queries, batch 55 (see oracle.py for the contract):
Weibull median-rank fit to inter-event gaps, best Gini decision stump,
Cox-Stuart trend sign test, leave-one-out target-encoding audit.
Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict

import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_weibull_gaps(sf_dir: str):
    """Weibull median-rank regression on per-user inter-event gaps
    (positive epoch-us deltas)
    (stages/stattests.py :: weibull_median_rank_fit)."""
    from ..stages.stattests import weibull_median_rank_fit
    from ..stages.winfunc import lag_diff

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    gaps = lag_diff(ev, by="user_id", order_col="ts",
                    id_col="event_id").filter(expr="gap > 0")
    return _materialize(weibull_median_rank_fit(gaps, value_col="gap"))


SQL_WEIBULL_GAPS = """
WITH g AS (
  SELECT CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS gap
  FROM events),
f AS (SELECT CAST(gap AS DOUBLE) AS v FROM g
      WHERE gap IS NOT NULL AND gap > 0),
vc AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM f GROUP BY v),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS nv FROM vc),
w AS (SELECT v, cnt,
             CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS hi
      FROM vc),
xy AS (SELECT cnt, ln(v) AS x,
              ln(-ln(1.0 - (((hi - cnt) + (cnt + 1) / 2.0) - 0.3)
                           / (tot.n + 0.4))) AS y
       FROM w, tot),
s AS (SELECT sum(CAST(cnt AS DOUBLE)) AS sw,
             sum(cnt * x) AS sx, sum(cnt * y) AS sy,
             sum(cnt * x * x) AS sxx, sum(cnt * x * y) AS sxy
      FROM xy)
SELECT tot.n AS n,
       CASE WHEN tot.nv >= 2 AND s.sw * s.sxx - s.sx * s.sx <> 0
            THEN round((s.sw * s.sxy - s.sx * s.sy)
                       / (s.sw * s.sxx - s.sx * s.sx), 6)
       END AS shape,
       CASE WHEN tot.nv >= 2 AND s.sw * s.sxx - s.sx * s.sx <> 0
                 AND (s.sw * s.sxy - s.sx * s.sy) <> 0
            THEN round(-(s.sy - ((s.sw * s.sxy - s.sx * s.sy)
                                 / (s.sw * s.sxx - s.sx * s.sx))
                                * s.sx)
                       / (s.sw * ((s.sw * s.sxy - s.sx * s.sy)
                                  / (s.sw * s.sxx - s.sx * s.sx))),
                       6)
       END AS log_scale
FROM tot, s
"""


def q_gini_stump_orders(sf_dir: str):
    """Best Gini-impurity threshold on o_totalprice for predicting
    o_orderpriority = '1-URGENT' (stages/mlprep.py :: gini_stump)."""
    from ..stages.mlprep import gini_stump

    od = _read(sf_dir, "orders", ["o_totalprice", "o_orderpriority"])
    return _materialize(gini_stump(
        od, score_col="o_totalprice",
        label_expr=lambda t: pc.equal(t.column("o_orderpriority"),
                                      "1-URGENT")))


SQL_GINI_STUMP_ORDERS = """
WITH f AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS s,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
  FROM orders
  WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL),
g AS (SELECT s, CAST(count(*) AS BIGINT) AS cn,
             CAST(sum(y) AS BIGINT) AS cp
      FROM f GROUP BY s),
tot AS (SELECT CAST(sum(cn) AS BIGINT) AS n,
               CAST(sum(cp) AS BIGINT) AS p FROM g),
w AS (SELECT s,
             CAST(sum(cn) OVER (ORDER BY s) AS BIGINT) AS nl,
             CAST(sum(cp) OVER (ORDER BY s) AS BIGINT) AS pl
      FROM g),
obj AS (SELECT s, nl, pl, tot.n AS n, tot.p AS p,
               (pl * pl + (nl - pl) * (nl - pl))
                 / CAST(nl AS DOUBLE)
               + ((tot.p - pl) * (tot.p - pl)
                  + ((tot.n - nl) - (tot.p - pl))
                    * ((tot.n - nl) - (tot.p - pl)))
                 / CAST(tot.n - nl AS DOUBLE) AS imp
        FROM w, tot
        WHERE nl > 0 AND tot.n - nl > 0)
SELECT n, p AS pos,
       round(s / 100.0, 6) AS threshold,
       round((n - imp) / n, 6) AS gini
FROM obj
ORDER BY imp DESC, s
LIMIT 1
"""


def q_cox_stuart_events(sf_dir: str):
    """Cox-Stuart paired-sign trend test over daily counts per event
    type (stages/temporal.py :: cox_stuart_daily)."""
    from ..stages.temporal import cox_stuart_daily

    return _materialize(cox_stuart_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type"))


SQL_COX_STUART_EVENTS = """
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
pairs AS (
  SELECT a.g, a.m, b.x - a.x AS d
  FROM numbered a
  JOIN numbered b
    ON b.g = a.g AND b.rn = a.rn + (a.m + 1) // 2
  WHERE a.rn <= a.m // 2),
agg AS (
  SELECT g, CAST(max(m) AS BIGINT) AS n_days,
         CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pos,
         CAST(sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_neg
  FROM pairs GROUP BY g)
SELECT g AS event_type, n_days, n_pos, n_neg,
       CASE WHEN n_pos + n_neg > 0
            THEN round((n_pos - n_neg) / sqrt(n_pos + n_neg), 6)
       END AS z
FROM agg
"""


def q_loo_encode_mktsegment(sf_dir: str):
    """Leave-one-out target-encoding audit of c_acctbal by market
    segment (stages/mlprep.py :: loo_encode_audit)."""
    from ..stages.mlprep import loo_encode_audit

    cu = _read(sf_dir, "customer", ["c_mktsegment", "c_acctbal"])
    return _materialize(loo_encode_audit(
        cu, cat_col="c_mktsegment", target_col="c_acctbal"))


SQL_LOO_ENCODE_MKTSEGMENT = """
WITH f AS (
  SELECT c_mktsegment AS seg,
         CAST(round(c_acctbal * 100) AS BIGINT) AS u
  FROM customer
  WHERE c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL),
a AS (SELECT seg, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(u) AS BIGINT) AS s,
             CAST(sum(u * u) AS BIGINT) AS s2
      FROM f GROUP BY seg)
SELECT seg AS c_mktsegment, n,
       CASE WHEN n >= 2
            THEN round(CAST(s AS DOUBLE) / n / 100.0, 6)
       END AS mean_loo,
       CASE WHEN n >= 2
            THEN round(sqrt(greatest(
                   (CAST(s AS DOUBLE) * s * (n - 2) + CAST(s2 AS DOUBLE))
                     / (n * CAST(n - 1 AS DOUBLE) * (n - 1)) / 10000.0
                   - (CAST(s AS DOUBLE) / n / 100.0)
                     * (CAST(s AS DOUBLE) / n / 100.0), 0.0)), 6)
       END AS sd_loo
FROM a
"""


QUERIES55: Dict[str, Callable] = {
    "weibull_gaps": q_weibull_gaps,
    "gini_stump_orders": q_gini_stump_orders,
    "cox_stuart_events": q_cox_stuart_events,
    "loo_encode_mktsegment": q_loo_encode_mktsegment,
}

SQL55: Dict[str, str] = {
    "weibull_gaps": SQL_WEIBULL_GAPS,
    "gini_stump_orders": SQL_GINI_STUMP_ORDERS,
    "cox_stuart_events": SQL_COX_STUART_EVENTS,
    "loo_encode_mktsegment": SQL_LOO_ENCODE_MKTSEGMENT,
}
