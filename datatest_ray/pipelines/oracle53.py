"""Driver-contract queries, batch 53 (see oracle.py for the contract):
Brunner-Munzel heteroscedastic rank test, Lepage combined
location-scale test, Cucconi squared-rank location-scale test, and a
Gumbel block-maxima fit to weekly peak daily counts.  Merged into
``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


_VC_CTE = """
WITH f AS (
  SELECT value AS v,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS isa
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
g AS (SELECT v, CAST(sum(isa) AS BIGINT) AS ca,
             CAST(count(*) AS BIGINT) AS cnt
      FROM f GROUP BY v),
t AS (SELECT CAST(sum(cnt) AS BIGINT) AS nt,
             CAST(sum(ca) AS BIGINT) AS na,
             (CAST(sum(cnt) AS BIGINT) + 1) // 2 AS c
      FROM g)
"""


def q_brunner_munzel_value(sf_dir: str):
    """Brunner-Munzel test, events.value click (a) vs purchase (b)
    (stages/stattests.py :: brunner_munzel)."""
    from ..stages.stattests import brunner_munzel

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return _materialize(brunner_munzel(
        ev, value_col="value", group_col="event_type",
        a="click", b="purchase"))


SQL_BRUNNER_MUNZEL_VALUE = _VC_CTE + """,
w AS (SELECT ca, cnt, cnt - ca AS cb,
             CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS hi,
             CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS ahi,
             CAST(sum(cnt - ca) OVER (ORDER BY v) AS BIGINT) AS bhi
      FROM g),
mr AS (SELECT ca, cb,
              (hi - cnt) + (cnt + 1) / 2.0 AS pr,
              (ahi - ca) + (ca + 1) / 2.0 AS wra,
              (bhi - cb) + (cb + 1) / 2.0 AS wrb
       FROM w),
rb AS (SELECT sum(ca * pr) / t.na AS rbar_a,
              sum(cb * pr) / (t.nt - t.na) AS rbar_b,
              t.na AS na, t.nt AS nt
       FROM mr, t GROUP BY t.na, t.nt),
sv AS (SELECT
         sum(ca * (pr - wra - rb.rbar_a + (rb.na + 1) / 2.0)
                * (pr - wra - rb.rbar_a + (rb.na + 1) / 2.0))
           / (rb.na - 1) AS s_a,
         sum(cb * (pr - wrb - rb.rbar_b + (rb.nt - rb.na + 1) / 2.0)
                * (pr - wrb - rb.rbar_b + (rb.nt - rb.na + 1) / 2.0))
           / (rb.nt - rb.na - 1) AS s_b,
         rb.na AS na, rb.nt AS nt,
         rb.rbar_a AS rbar_a, rb.rbar_b AS rbar_b
       FROM mr, rb
       GROUP BY rb.na, rb.nt, rb.rbar_a, rb.rbar_b)
SELECT na AS n_a, nt - na AS n_b,
       round((rbar_b - (nt - na + 1) / 2.0) / na, 6) AS p_hat,
       CASE WHEN na * s_a + (nt - na) * s_b > 0
            THEN round(na * (nt - na) * (rbar_b - rbar_a)
                       / (nt * sqrt(na * s_a + (nt - na) * s_b)), 6)
       END AS w
FROM sv
"""


def _fsql(x: str) -> str:
    """SQL mirror of f(t) = sum_{r<=t} min(r, N+1-r); N, c from t."""
    return (f"(CASE WHEN ({x}) <= c THEN ({x})*(({x})+1)//2 "
            f"ELSE c*(c+1)//2 + (nt+1)*(({x})-c) "
            f"- (({x})*(({x})+1)//2 - c*(c+1)//2) END)")


def q_lepage_value(sf_dir: str):
    """Lepage L = Z_W^2 + Z_AB^2, events.value click vs purchase
    (stages/stattests.py :: lepage_test)."""
    from ..stages.stattests import lepage_test

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return _materialize(lepage_test(
        ev, value_col="value", group_col="event_type",
        a="click", b="purchase"))


SQL_LEPAGE_VALUE = _VC_CTE + f""",
w AS (SELECT ca, cnt,
             CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS hi
      FROM g),
mr AS (SELECT w.ca, w.cnt,
              (w.hi - w.cnt) + (w.cnt + 1) / 2.0 AS pr,
              ({_fsql('w.hi')} - {_fsql('w.hi - w.cnt')})
                / CAST(w.cnt AS DOUBLE) AS a_v
       FROM w, t),
m AS (SELECT sum(ca * pr) AS w_sum,
             sum(CAST(cnt AS DOUBLE) * cnt * cnt - cnt) AS tie,
             sum(ca * a_v) AS w_ab,
             sum(cnt * a_v * a_v) AS s2
      FROM mr),
z AS (SELECT
        (m.w_sum - t.na * (t.nt + 1) / 2.0)
          / sqrt(t.na * CAST(t.nt - t.na AS DOUBLE) / 12.0
                 * ((t.nt + 1) - m.tie
                    / (CAST(t.nt AS DOUBLE) * (t.nt - 1)))) AS z_w,
        (m.w_ab - t.na * CAST({_fsql('nt')} AS DOUBLE) / t.nt)
          / sqrt(t.na * CAST(t.nt - t.na AS DOUBLE)
                 * (t.nt * m.s2 - CAST({_fsql('nt')} AS DOUBLE)
                                  * {_fsql('nt')})
                 / (CAST(t.nt AS DOUBLE) * t.nt * (t.nt - 1))) AS z_ab,
        t.na AS na, t.nt AS nt
      FROM m, t)
SELECT na AS n_a, nt - na AS n_b,
       round(z_w, 6) AS z_w,
       round(z_ab, 6) AS z_ab,
       round(z_w * z_w + z_ab * z_ab, 6) AS lepage_l
FROM z
"""


def q_cucconi_value(sf_dir: str):
    """Cucconi squared-rank location-scale test, events.value click vs
    purchase (stages/stattests.py :: cucconi_test)."""
    from ..stages.stattests import cucconi_test

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return _materialize(cucconi_test(
        ev, value_col="value", group_col="event_type",
        a="click", b="purchase"))


SQL_CUCCONI_VALUE = _VC_CTE + """,
w AS (SELECT ca, cnt,
             CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS hi
      FROM g),
mr AS (SELECT ca, (hi - cnt) + (cnt + 1) / 2.0 AS pr FROM w),
m AS (SELECT sum(ca * pr * pr) AS sum_r2 FROM mr),
m2 AS (SELECT sum(ca * ((t.nt + 1) - pr) * ((t.nt + 1) - pr)) AS sum_c2
       FROM mr, t GROUP BY t.nt),
uv AS (SELECT
         (6.0 * m.sum_r2
          - t.na * (t.nt + 1.0) * (2.0 * t.nt + 1.0))
           / sqrt(t.na * CAST(t.nt - t.na AS DOUBLE) * (t.nt + 1.0)
                  * (2.0 * t.nt + 1.0) * (8.0 * t.nt + 11.0) / 5.0) AS u,
         (6.0 * m2.sum_c2
          - t.na * (t.nt + 1.0) * (2.0 * t.nt + 1.0))
           / sqrt(t.na * CAST(t.nt - t.na AS DOUBLE) * (t.nt + 1.0)
                  * (2.0 * t.nt + 1.0) * (8.0 * t.nt + 11.0) / 5.0) AS v,
         2.0 * (CAST(t.nt AS DOUBLE) * t.nt - 4.0)
           / ((2.0 * t.nt + 1.0) * (8.0 * t.nt + 11.0)) - 1.0 AS rho,
         t.na AS na, t.nt AS nt
       FROM m, m2, t)
SELECT na AS n_a, nt - na AS n_b,
       round(u, 6) AS u, round(v, 6) AS v,
       CASE WHEN abs(rho) < 1
            THEN round((u * u + v * v - 2.0 * rho * u * v)
                       / (2.0 * (1.0 - rho * rho)), 6)
       END AS c
FROM uv
"""


def q_gumbel_weekly_events(sf_dir: str):
    """Gumbel method-of-moments fit to weekly maxima of daily counts
    per event type (stages/temporal.py :: gumbel_weekly_max)."""
    from ..stages.temporal import gumbel_weekly_max

    return _materialize(gumbel_weekly_max(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type", period=7))


SQL_GUMBEL_WEEKLY_EVENTS = """
WITH f AS (
  SELECT event_type AS g,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL),
daily AS (
  SELECT g, day, CAST(count(*) AS BIGINT) AS x
  FROM f GROUP BY 1, 2),
wk AS (
  SELECT g, day // 7 AS week, CAST(max(x) AS BIGINT) AS wmax
  FROM daily GROUP BY 1, 2),
a AS (
  SELECT g, CAST(count(*) AS BIGINT) AS nw,
         CAST(sum(wmax) AS BIGINT) AS s1,
         CAST(sum(wmax * wmax) AS BIGINT) AS s2
  FROM wk GROUP BY 1)
SELECT g AS event_type, nw AS n_weeks,
       CASE WHEN nw >= 2
                 AND (s2 - s1 * s1 / CAST(nw AS DOUBLE)) / (nw - 1) > 0
            THEN round(s1 / CAST(nw AS DOUBLE)
                       - 0.5772156649015329
                         * (sqrt((s2 - s1 * s1 / CAST(nw AS DOUBLE))
                                 / (nw - 1)) * sqrt(6.0) / pi()), 6)
       END AS mu,
       CASE WHEN nw >= 2
                 AND (s2 - s1 * s1 / CAST(nw AS DOUBLE)) / (nw - 1) > 0
            THEN round(sqrt((s2 - s1 * s1 / CAST(nw AS DOUBLE))
                            / (nw - 1)) * sqrt(6.0) / pi(), 6)
       END AS beta
FROM a
"""


QUERIES53: Dict[str, Callable] = {
    "brunner_munzel_value": q_brunner_munzel_value,
    "lepage_value": q_lepage_value,
    "cucconi_value": q_cucconi_value,
    "gumbel_weekly_events": q_gumbel_weekly_events,
}

SQL53: Dict[str, str] = {
    "brunner_munzel_value": SQL_BRUNNER_MUNZEL_VALUE,
    "lepage_value": SQL_LEPAGE_VALUE,
    "cucconi_value": SQL_CUCCONI_VALUE,
    "gumbel_weekly_events": SQL_GUMBEL_WEEKLY_EVENTS,
}
