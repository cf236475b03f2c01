"""Driver-contract queries, batch 9 (see oracle.py for the contract):
grouped Kendall tau-b, Mann–Whitney U rank-sum test, Kaplan–Meier
survival of user lifetimes.  Merged into ``oracle.queries()`` /
``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


# ---------------------------------------------------------------------------
# Grouped Kendall tau-b from contingency grids
# ---------------------------------------------------------------------------


def q_kendall_qty_disc(sf_dir: str):
    """Kendall tau-b of quantity vs discount per return flag —
    concordance-based rank correlation, exact from the per-group joint
    count grid (2-D suffix sums; O(distinct cells) shuffle, no O(n²)
    pair pass)."""
    from ..stages.robust import kendall_grouped

    return _materialize(kendall_grouped(
        _read(sf_dir, "lineitem",
              ["l_returnflag", "l_quantity", "l_discount"]),
        by="l_returnflag", x_col="l_quantity", y_col="l_discount"))


SQL_KENDALL_QTY_DISC = """
WITH base AS (
  SELECT l_returnflag, l_quantity AS x, l_discount AS y
  FROM lineitem
  WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
    AND l_discount IS NOT NULL
),
cells AS (
  SELECT l_returnflag, x, y, count(*) AS c FROM base GROUP BY 1, 2, 3
),
cd AS (
  SELECT a.l_returnflag,
         coalesce(sum(a.c * b.c) FILTER (
           (b.x > a.x AND b.y > a.y) OR (b.x < a.x AND b.y < a.y)), 0)
           AS c2,
         coalesce(sum(a.c * b.c) FILTER (
           (b.x > a.x AND b.y < a.y) OR (b.x < a.x AND b.y > a.y)), 0)
           AS d2
  FROM cells a JOIN cells b USING (l_returnflag)
  GROUP BY a.l_returnflag
),
tx AS (
  SELECT l_returnflag, sum(t * (t - 1) // 2) AS n1 FROM (
    SELECT l_returnflag, x, sum(c) AS t FROM cells GROUP BY 1, 2)
  GROUP BY l_returnflag
),
ty AS (
  SELECT l_returnflag, sum(t * (t - 1) // 2) AS n2 FROM (
    SELECT l_returnflag, y, sum(c) AS t FROM cells GROUP BY 1, 2)
  GROUP BY l_returnflag
),
nn AS (
  SELECT l_returnflag, count(*) AS n,
         count(*) * (count(*) - 1) // 2 AS n0
  FROM base GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       ((c2 - d2) / 2.0)
         / sqrt((n0 - n1) * 1.0 * (n0 - n2)) AS tau
FROM cd JOIN tx USING (l_returnflag) JOIN ty USING (l_returnflag)
        JOIN nn USING (l_returnflag)
"""


# ---------------------------------------------------------------------------
# Mann–Whitney U rank-sum test
# ---------------------------------------------------------------------------


def q_mannwhitney_qty(sf_dir: str):
    """Mann–Whitney U between returned ('R') and accepted ('A') line
    items on quantity — the nonparametric two-sample location test
    with exact average-rank ties and tie-corrected z."""
    from ..stages.robust import mann_whitney

    return _materialize(mann_whitney(
        _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"]),
        value_col="l_quantity", group_col="l_returnflag", a="A", b="R"))


SQL_MANNWHITNEY_QTY = """
WITH base AS (
  SELECT l_quantity AS v, (l_returnflag = 'A') AS isa
  FROM lineitem
  WHERE l_returnflag IN ('A', 'R') AND l_quantity IS NOT NULL
),
s AS (
  SELECT v, count(*) FILTER (isa) AS ca, count(*) AS cnt
  FROM base GROUP BY v
),
r AS (SELECT v, ca, cnt, sum(cnt) OVER (ORDER BY v) AS cum FROM s),
agg AS (
  SELECT sum(ca * (cum - cnt + (cnt + 1) / 2.0)) AS ra,
         (SELECT count(*) FILTER (isa) FROM base) AS na,
         (SELECT count(*) FROM base) AS n,
         sum(cnt * cnt * cnt - cnt) AS tie
  FROM r
)
SELECT CAST(na AS BIGINT) AS n_a,
       CAST(n - na AS BIGINT) AS n_b,
       ra - na * (na + 1) / 2.0 AS u,
       (ra - na * (na + 1) / 2.0 - na * 1.0 * (n - na) / 2.0)
         / sqrt(na * 1.0 * (n - na) / 12.0
                * ((n + 1) - tie * 1.0 / (n * 1.0 * (n - 1)))) AS z
FROM agg
"""


# ---------------------------------------------------------------------------
# Kaplan–Meier survival of user lifetimes
# ---------------------------------------------------------------------------


def q_km_survival_users(sf_dir: str):
    """Kaplan–Meier estimate of user time-to-first-'error' (censored
    at last activity for users who never error).  The original churn
    framing (lifetime vs corpus end) yields an EMPTY curve on this
    always-active population — round-1 verdict's "matched on 0 rows
    proves nothing" class — so the query uses the failure framing;
    the churn mode stays available via ``horizon_days``."""
    from ..stages.temporal import km_survival

    return _materialize(km_survival(
        _read(sf_dir, "events", ["user_id", "ts", "event_type"]),
        "ts", by="user_id", failure_type="error"))


SQL_KM_SURVIVAL_USERS = """
WITH u AS (
  SELECT user_id,
         (coalesce(min(CASE WHEN event_type = 'error'
                            THEN epoch_us(ts) END),
                   max(epoch_us(ts)))
          - min(epoch_us(ts))) // 86400000000 AS dur_days,
         CASE WHEN min(CASE WHEN event_type = 'error'
                            THEN epoch_us(ts) END) IS NOT NULL
              THEN 1 ELSE 0 END AS ev
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
  GROUP BY user_id
),
agg AS (SELECT dur_days, sum(ev) AS d, count(*) AS c
        FROM u GROUP BY dur_days),
r AS (
  SELECT dur_days, d,
         sum(c) OVER (ORDER BY dur_days DESC) AS n_risk
  FROM agg
),
km AS (
  SELECT dur_days, CAST(d AS BIGINT) AS d, CAST(n_risk AS BIGINT)
           AS n_risk,
         product(1.0 - d * 1.0 / n_risk)
           OVER (ORDER BY dur_days) AS s
  FROM r WHERE d > 0
)
SELECT dur_days, d, n_risk, s FROM km
"""


QUERIES9: Dict[str, Callable] = {
    "kendall_qty_disc": q_kendall_qty_disc,
    "mannwhitney_qty": q_mannwhitney_qty,
    "km_survival_users": q_km_survival_users,
}

SQL9: Dict[str, str] = {
    "kendall_qty_disc": SQL_KENDALL_QTY_DISC,
    "mannwhitney_qty": SQL_MANNWHITNEY_QTY,
    "km_survival_users": SQL_KM_SURVIVAL_USERS,
}
