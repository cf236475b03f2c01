"""Driver-contract queries, batch 71 (see oracle.py for the contract):
Matthews correlation and the Youden-J optimal threshold for the
value-score purchase classifier.  Merged into ``oracle.queries()`` /
``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict

import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_mcc_events(sf_dir: str):
    """MCC of the (value > 50) flag against purchase
    (stages/mlprep.py :: mcc_binary)."""
    from ..stages.mlprep import mcc_binary

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return _materialize(mcc_binary(
        ev,
        flag_expr=lambda t: pc.fill_null(
            pc.greater(t.column("value"), 50.0), False),
        label_expr=lambda t: pc.fill_null(
            pc.equal(t.column("event_type"), "purchase"), False)))


SQL_MCC_EVENTS = """
WITH f AS (
  SELECT CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS fl,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events),
c AS (
  SELECT CAST(sum(fl * y) AS BIGINT) AS tp,
         CAST(sum(fl * (1 - y)) AS BIGINT) AS fp,
         CAST(sum((1 - fl) * y) AS BIGINT) AS fn_,
         CAST(sum((1 - fl) * (1 - y)) AS BIGINT) AS tn
  FROM f)
SELECT tp + fp + fn_ + tn AS n, tp, fp, fn_, tn,
       CASE WHEN CAST(tp + fp AS DOUBLE) * (tp + fn_) * (tn + fp)
                 * (tn + fn_) > 0
            THEN round((CAST(tp AS DOUBLE) * tn
                        - CAST(fp AS DOUBLE) * fn_)
                       / sqrt(CAST(tp + fp AS DOUBLE) * (tp + fn_)
                              * (tn + fp) * (tn + fn_)), 6)
       END AS mcc
FROM c
"""


def q_youden_events(sf_dir: str):
    """Youden-J optimal value threshold for predicting purchase
    (stages/mlprep.py :: youden_threshold)."""
    from ..stages.mlprep import youden_threshold

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return _materialize(youden_threshold(
        ev, score_col="value",
        label_expr=lambda t: pc.equal(t.column("event_type"),
                                      "purchase")))


SQL_YOUDEN_EVENTS = """
WITH f AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL),
g AS (SELECT s, CAST(count(*) AS BIGINT) AS cn,
             CAST(sum(y) AS BIGINT) AS cp
      FROM f GROUP BY s),
tot AS (SELECT CAST(sum(cn) AS BIGINT) AS n,
               CAST(sum(cp) AS BIGINT) AS p FROM g),
w AS (
  SELECT s,
         tot.p - CAST(sum(cp) OVER (ORDER BY s) AS BIGINT) AS tp,
         (tot.n - tot.p)
           - CAST(sum(cn - cp) OVER (ORDER BY s) AS BIGINT) AS fp,
         tot.n AS n, tot.p AS p
  FROM g, tot),
obj AS (
  SELECT s, tp, fp, n, p,
         tp * (n - p) - fp * p AS o
  FROM w WHERE p > 0 AND n - p > 0)
SELECT n, p AS pos,
       round(s / 100.0, 6) AS threshold,
       round(CAST(tp AS DOUBLE) / p
             - CAST(fp AS DOUBLE) / (n - p), 6) AS j,
       round(CAST(tp AS DOUBLE) / p, 6) AS tpr,
       round(1.0 - CAST(fp AS DOUBLE) / (n - p), 6) AS tnr
FROM obj
ORDER BY o DESC, s
LIMIT 1
"""


QUERIES71: Dict[str, Callable] = {
    "mcc_events": q_mcc_events,
    "youden_events": q_youden_events,
}

SQL71: Dict[str, str] = {
    "mcc_events": SQL_MCC_EVENTS,
    "youden_events": SQL_YOUDEN_EVENTS,
}
