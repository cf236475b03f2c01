"""Driver-contract queries, batch 32 (see oracle.py for the contract):
ordered/blocked nonparametrics — the Jonckheere-Terpstra trend test
across ordered order-priority tiers and Cochran's Q over per-user
event-type presence.  Merged into ``oracle.queries()`` /
``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
              "5-LOW"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


# ---------------------------------------------------------------------------
# Jonckheere-Terpstra: does o_totalprice trend with priority tier?
# ---------------------------------------------------------------------------


def q_jt_priority_price(sf_dir: str):
    """Jonckheere-Terpstra U across the five ordered priority tiers on
    o_totalprice — exact integer pair counts from distinct-value group
    counts (stages/stattests.py :: jonckheere_terpstra)."""
    from ..stages.stattests import jonckheere_terpstra

    return _materialize(jonckheere_terpstra(
        _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"]),
        value_col="o_totalprice", group_col="o_orderpriority",
        ordered_groups=PRIORITIES))


SQL_JT_PRIORITY_PRICE = """
WITH f AS (
  SELECT o_totalprice AS v,
         CASE o_orderpriority
           WHEN '1-URGENT' THEN 0 WHEN '2-HIGH' THEN 1
           WHEN '3-MEDIUM' THEN 2 WHEN '4-NOT SPECIFIED' THEN 3
           WHEN '5-LOW' THEN 4 END AS k
  FROM orders
  WHERE o_totalprice IS NOT NULL AND o_orderpriority IN
    ('1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')),
pts AS (
  SELECT v,
         CAST(count(*) FILTER (k = 0) AS BIGINT) AS c0,
         CAST(count(*) FILTER (k = 1) AS BIGINT) AS c1,
         CAST(count(*) FILTER (k = 2) AS BIGINT) AS c2,
         CAST(count(*) FILTER (k = 3) AS BIGINT) AS c3,
         CAST(count(*) FILTER (k = 4) AS BIGINT) AS c4
  FROM f GROUP BY 1),
c AS (
  SELECT c0, c1, c2, c3, c4,
         sum(c0) OVER (ORDER BY v) - c0 AS p0,
         sum(c1) OVER (ORDER BY v) - c1 AS p1,
         sum(c2) OVER (ORDER BY v) - c2 AS p2,
         sum(c3) OVER (ORDER BY v) - c3 AS p3
  FROM pts),
agg AS (
  SELECT CAST(sum(
           c1 * (2 * p0 + c0)
         + c2 * (2 * (p0 + p1) + (c0 + c1))
         + c3 * (2 * (p0 + p1 + p2) + (c0 + c1 + c2))
         + c4 * (2 * (p0 + p1 + p2 + p3) + (c0 + c1 + c2 + c3))
         ) AS HUGEINT) AS w2,
         CAST(sum(c0) AS BIGINT) AS n0, CAST(sum(c1) AS BIGINT) AS n1,
         CAST(sum(c2) AS BIGINT) AS n2, CAST(sum(c3) AS BIGINT) AS n3,
         CAST(sum(c4) AS BIGINT) AS n4
  FROM c)
SELECT n0 + n1 + n2 + n3 + n4 AS n,
       CAST(w2 AS DOUBLE) / 2.0 AS u,
       CASE WHEN ((n0+n1+n2+n3+n4) * (n0+n1+n2+n3+n4)
                  * (2 * (n0+n1+n2+n3+n4) + 3)
                  - (n0*n0*(2*n0+3) + n1*n1*(2*n1+3) + n2*n2*(2*n2+3)
                     + n3*n3*(2*n3+3) + n4*n4*(2*n4+3))) / 72.0 > 0
       THEN (CAST(w2 AS DOUBLE) / 2.0
             - ((n0+n1+n2+n3+n4) * (n0+n1+n2+n3+n4)
                - (n0*n0 + n1*n1 + n2*n2 + n3*n3 + n4*n4)) / 4.0)
            / sqrt(((n0+n1+n2+n3+n4) * (n0+n1+n2+n3+n4)
                    * (2 * (n0+n1+n2+n3+n4) + 3)
                    - (n0*n0*(2*n0+3) + n1*n1*(2*n1+3) + n2*n2*(2*n2+3)
                       + n3*n3*(2*n3+3) + n4*n4*(2*n4+3))) / 72.0)
       END AS z
FROM agg
"""


# ---------------------------------------------------------------------------
# Cochran's Q: per-user event-type presence rates
# ---------------------------------------------------------------------------


def q_cochran_q_users(sf_dir: str):
    """Cochran's Q across the five event types' per-user presence
    flags — bitmask OR per subject, exact integer moments
    (stages/stattests.py :: cochrans_q)."""
    from ..stages.stattests import cochrans_q

    return _materialize(cochrans_q(
        _read(sf_dir, "events", ["user_id", "event_type"]),
        subject_col="user_id", cat_col="event_type",
        categories=EVENT_TYPES))


SQL_COCHRAN_Q_USERS = """
WITH p AS (
  SELECT user_id,
         CAST(max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS x0,
         CAST(max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS x1,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS x2,
         CAST(max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
              AS BIGINT) AS x3,
         CAST(max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS x4
  FROM events
  WHERE user_id IS NOT NULL AND event_type IN
    ('click', 'view', 'purchase', 'signup', 'error')
  GROUP BY 1),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x0) AS BIGINT) AS c0, CAST(sum(x1) AS BIGINT) AS c1,
         CAST(sum(x2) AS BIGINT) AS c2, CAST(sum(x3) AS BIGINT) AS c3,
         CAST(sum(x4) AS BIGINT) AS c4,
         CAST(sum(x0 + x1 + x2 + x3 + x4) AS BIGINT) AS sr,
         CAST(sum((x0 + x1 + x2 + x3 + x4)
                  * (x0 + x1 + x2 + x3 + x4)) AS BIGINT) AS sr2
  FROM p)
SELECT n AS n_subjects, 5 AS k,
       CASE WHEN 5 * sr - sr2 > 0 THEN
         4 * CAST(5 * (c0*c0 + c1*c1 + c2*c2 + c3*c3 + c4*c4)
                  - (c0 + c1 + c2 + c3 + c4)
                    * (c0 + c1 + c2 + c3 + c4) AS DOUBLE)
           / CAST(5 * sr - sr2 AS DOUBLE)
       END AS q
FROM s
"""


QUERIES32: Dict[str, Callable] = {
    "jt_priority_price": q_jt_priority_price,
    "cochran_q_users": q_cochran_q_users,
}

SQL32: Dict[str, str] = {
    "jt_priority_price": SQL_JT_PRIORITY_PRICE,
    "cochran_q_users": SQL_COCHRAN_Q_USERS,
}
