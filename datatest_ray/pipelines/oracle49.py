"""Driver-contract queries, batch 49 (see oracle.py for the contract):
Hodges-Lehmann two-sample shift estimator, day-of-week seasonality
strength, CUPED variance-reduction audit, PMI collocation mining, and
the decoded-pixel SSIM parity audit (rows-only: pure-python codec).
Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np
import pyarrow as pa

_CUPED_CUTOFF = "2024-01-16"


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_hl_shift_value(sf_dir: str):
    """Hodges-Lehmann shift of events.value, click minus purchase
    (stages/stattests.py :: hodges_lehmann_shift)."""
    from ..stages.stattests import hodges_lehmann_shift

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return _materialize(hodges_lehmann_shift(
        ev, value_col="value", group_col="event_type",
        a="click", b="purchase"))


SQL_HL_SHIFT_VALUE = """
WITH f AS (
  SELECT value AS v, event_type AS g FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
ga AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM f
       WHERE g = 'click' GROUP BY v),
gb AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM f
       WHERE g = 'purchase' GROUP BY v),
d AS (SELECT a.v - b.v AS diff, a.c * b.c AS w
      FROM ga a CROSS JOIN gb b),
agg AS (SELECT diff, CAST(sum(w) AS BIGINT) AS w FROM d GROUP BY diff),
t AS (SELECT CAST(sum(w) AS BIGINT) AS tot FROM agg),
o AS (SELECT diff, CAST(sum(w) OVER (ORDER BY diff) AS BIGINT) AS cum
      FROM agg)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM f WHERE g = 'click') AS n_a,
  (SELECT CAST(count(*) AS BIGINT) FROM f WHERE g = 'purchase') AS n_b,
  t.tot AS n_pairs,
  ((SELECT min(diff) FROM o WHERE cum >= (t.tot + 1) // 2)
   + (SELECT min(diff) FROM o WHERE cum >= t.tot // 2 + 1)) / 2.0
    AS hl_shift
FROM t
"""


def q_dow_strength_events(sf_dir: str):
    """Share of daily-count variance explained by the weekday profile,
    per event type (stages/temporal.py :: dow_strength)."""
    from ..stages.temporal import dow_strength

    return _materialize(dow_strength(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type"))


SQL_DOW_STRENGTH_EVENTS = """
WITH daily AS (
  SELECT event_type AS g,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2),
d2 AS (SELECT g, isodow(CAST(day AS DATE)) AS dw, x FROM daily),
pg AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(x) AS BIGINT) AS s,
              CAST(sum(x * x) AS BIGINT) AS ss
       FROM d2 GROUP BY g),
pd AS (SELECT g, dw, CAST(count(*) AS BIGINT) AS nd,
              CAST(sum(x) AS BIGINT) AS sd
       FROM d2 GROUP BY g, dw),
bt AS (SELECT g, sum(CAST(sd AS DOUBLE) * sd / nd) AS btw
       FROM pd GROUP BY g)
SELECT pg.g AS event_type, pg.n AS n_days,
       CASE WHEN (pg.ss - CAST(pg.s AS DOUBLE) * pg.s / pg.n) > 0 THEN
         round((bt.btw - CAST(pg.s AS DOUBLE) * pg.s / pg.n)
               / (pg.ss - CAST(pg.s AS DOUBLE) * pg.s / pg.n), 6)
       END AS r2
FROM pg JOIN bt ON pg.g = bt.g
WHERE pg.n >= 2
"""


def q_cuped_users(sf_dir: str):
    """CUPED variance-reduction audit of per-user spend, pre/post
    2024-01-16 (stages/mlprep.py :: cuped)."""
    from ..stages.mlprep import cuped

    ev = _read(sf_dir, "events", ["ts", "user_id", "value"])
    return _materialize(cuped(ev, ts_col="ts", key_col="user_id",
                              value_col="value", cutoff=_CUPED_CUTOFF))


SQL_CUPED_USERS = f"""
WITH f AS (
  SELECT user_id AS k,
         CASE WHEN ts < TIMESTAMP '{_CUPED_CUTOFF}'
              THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END AS px,
         CASE WHEN ts >= TIMESTAMP '{_CUPED_CUTOFF}'
              THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END AS py
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL),
pk AS (SELECT k, CAST(sum(px) AS BIGINT) AS x,
              CAST(sum(py) AS BIGINT) AS y
       FROM f GROUP BY k),
m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM pk),
v AS (SELECT n,
             (sxx / CAST(n AS DOUBLE)
              - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE)))
               / 10000.0 AS var_x,
             (syy / CAST(n AS DOUBLE)
              - (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
               / 10000.0 AS var_y,
             (sxy / CAST(n AS DOUBLE)
              - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
               / 10000.0 AS cov
      FROM m)
SELECT n AS n_keys,
       CASE WHEN var_x > 0 THEN round(cov / var_x, 6) END AS theta,
       round(var_y, 6) AS var_y,
       round(CASE WHEN var_x > 0
                  THEN var_y - cov * cov / var_x ELSE var_y END, 6)
         AS var_adj,
       CASE WHEN var_y > 0 THEN
         round(1.0 - (CASE WHEN var_x > 0
                           THEN var_y - cov * cov / var_x
                           ELSE var_y END) / var_y, 6)
       END AS var_reduction
FROM v
"""


def q_collocations_pmi(sf_dir: str):
    """Top-20 collocations by 6-dp-rounded PMI, min bigram count 5
    (stages/text.py :: collocations_pmi)."""
    from ..stages.text import collocations_pmi

    return _materialize(collocations_pmi(
        _read(sf_dir, "documents", ["text"]), "text",
        min_count=5, k=20))


SQL_COLLOCATIONS_PMI = r"""
WITH t AS (
  SELECT string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\s+') AS l
  FROM documents WHERE trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) <> ''),
uni AS (SELECT unnest(l) AS w FROM t),
u AS (SELECT w, CAST(count(*) AS BIGINT) AS u FROM uni
      WHERE w <> '' GROUP BY w),
nu AS (SELECT CAST(sum(u) AS BIGINT) AS nu FROM u),
bp AS (SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p FROM t),
bg AS (SELECT p[1] AS w1, p[2] AS w2, CAST(count(*) AS BIGINT) AS n
       FROM bp WHERE p[1] <> '' AND p[2] <> '' GROUP BY 1, 2),
nb AS (SELECT CAST(sum(n) AS BIGINT) AS nb FROM bg),
j AS (SELECT bg.w1, bg.w2, bg.n,
             round(ln((CAST(bg.n AS DOUBLE) * nu.nu * nu.nu)
                      / (CAST(nb.nb AS DOUBLE) * u1.u * u2.u)), 6) AS pmi
      FROM bg
      JOIN u u1 ON bg.w1 = u1.w
      JOIN u u2 ON bg.w2 = u2.w, nu, nb
      WHERE bg.n >= 5)
SELECT w1, w2, n, pmi FROM j ORDER BY pmi DESC, w1, w2 LIMIT 20
"""


def q_image_ssim_audit(sf_dir: str):
    """rows-only by design (pure-python codec + pixel kernels are not
    SQL-expressible): global SSIM of every decoded fixture image vs
    its regenerated reference; summary of the perceptual-parity
    distribution.  Formula parity pinned in tests/test_batch49.py."""
    import os
    import re

    from ..sources.images import ImageFixtureSpec, generate_dataset
    from ..stages.imaging import image_ssim_scores

    base = os.path.basename(os.path.normpath(sf_dir))
    m = re.search(r"sf(\d+(?:\.\d+)?)", base)
    sf = float(m.group(1)) if m else 0.001
    spec = ImageFixtureSpec(n_rows=max(1000, int(100_000 * sf)),
                            seed=42, rows_per_part=2048)
    images = generate_dataset(spec,
                              columns={"image_id", "bytes", "w", "h"})
    t = _materialize(image_ssim_scores(images, reference_seed=42))
    s = t.column("ssim").to_numpy(zero_copy_only=False)
    ok = ~np.isnan(s)
    return pa.table({
        "n_images": pa.array([t.num_rows], pa.int64()),
        "n_scored": pa.array([int(ok.sum())], pa.int64()),
        "n_below_95": pa.array([int((s[ok] < 0.95).sum())], pa.int64()),
        "mean_ssim": pa.array(
            [round(float(np.sort(s[ok]).sum() / max(ok.sum(), 1)), 4)],
            pa.float64()),
    })


QUERIES49: Dict[str, Callable] = {
    "hl_shift_value": q_hl_shift_value,
    "dow_strength_events": q_dow_strength_events,
    "cuped_users": q_cuped_users,
    "collocations_pmi": q_collocations_pmi,
    "image_ssim_audit": q_image_ssim_audit,
}

SQL49: Dict[str, str] = {
    "hl_shift_value": SQL_HL_SHIFT_VALUE,
    "dow_strength_events": SQL_DOW_STRENGTH_EVENTS,
    "cuped_users": SQL_CUPED_USERS,
    "collocations_pmi": SQL_COLLOCATIONS_PMI,
}
