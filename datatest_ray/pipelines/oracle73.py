"""Driver-contract queries, batch 73 (see oracle.py for the contract):
paired sign test and Lin's concordance on the daily spine, and
quadratic-weighted kappa between order priority and price band.
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


_DAILY_XY_CTE = """
WITH f AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ib
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL),
d AS (SELECT day, CAST(sum(ia) AS BIGINT) AS x,
             CAST(sum(ib) AS BIGINT) AS y
      FROM f GROUP BY 1)
"""


def q_sign_test_daily(sf_dir: str):
    """Paired sign test: do clicks beat purchases day by day?
    (stages/temporal.py :: sign_test_daily)."""
    from ..stages.temporal import sign_test_daily

    return _materialize(sign_test_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", type_col="event_type", type_a="click",
        type_b="purchase"))


SQL_SIGN_TEST_DAILY = _DAILY_XY_CTE + """
SELECT CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(CASE WHEN x > y THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pos,
       CAST(sum(CASE WHEN x < y THEN 1 ELSE 0 END) AS BIGINT)
         AS n_neg,
       CASE WHEN sum(CASE WHEN x <> y THEN 1 ELSE 0 END) > 0
            THEN round((sum(CASE WHEN x > y THEN 1 ELSE 0 END)
                        - sum(CASE WHEN x < y THEN 1 ELSE 0 END))
                       / sqrt(sum(CASE WHEN x <> y THEN 1
                                  ELSE 0 END)), 6)
       END AS z
FROM d
"""


def q_ccc_daily(sf_dir: str):
    """Lin's concordance correlation between the click and purchase
    daily series (stages/temporal.py :: ccc_daily)."""
    from ..stages.temporal import ccc_daily

    return _materialize(ccc_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", type_col="event_type", type_a="click",
        type_b="purchase"))


SQL_CCC_DAILY = _DAILY_XY_CTE + """,
m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS DOUBLE) / count(*) AS mx,
             CAST(sum(y) AS DOUBLE) / count(*) AS my
      FROM d),
s AS (
  SELECT m.n, m.mx, m.my,
         sum((d.x - m.mx) * (d.x - m.mx)) / m.n AS sxx,
         sum((d.y - m.my) * (d.y - m.my)) / m.n AS syy,
         sum((d.x - m.mx) * (d.y - m.my)) / m.n AS sxy
  FROM d, m GROUP BY m.n, m.mx, m.my)
SELECT n AS n_days,
       CASE WHEN n >= 2 AND sxx > 0 AND syy > 0
            THEN round(sxy / sqrt(sxx * syy), 6) END AS r,
       CASE WHEN n >= 2
                 AND sxx + syy + (mx - my) * (mx - my) > 0
            THEN round(2.0 * sxy
                       / (sxx + syy + (mx - my) * (mx - my)), 6)
       END AS ccc
FROM s
"""


def q_weighted_kappa_orders(sf_dir: str):
    """Quadratic-weighted kappa between the order priority grade
    (1..5) and a fixed price band (1..5)
    (stages/mlprep.py :: weighted_kappa)."""
    from ..stages.mlprep import weighted_kappa

    od = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def grade(t: pa.Table):
        # '1-URGENT' -> 1 ... '5-LOW' -> 5
        first = pc.utf8_slice_codeunits(t.column("o_orderpriority"),
                                        0, 1)
        g = pc.cast(first, pa.int64())
        ok = pc.and_(pc.greater_equal(g, 1), pc.less_equal(g, 5))
        return pc.if_else(pc.fill_null(ok, False), g,
                          pa.scalar(None, pa.int64()))

    def band(t: pa.Table):
        p = t.column("o_totalprice")
        b = pc.add(
            pc.add(
                pc.add(
                    pc.add(
                        pa.scalar(1, pa.int64()),
                        pc.cast(pc.fill_null(
                            pc.greater(p, 100000.0), False),
                            pa.int64())),
                    pc.cast(pc.fill_null(
                        pc.greater(p, 200000.0), False), pa.int64())),
                pc.cast(pc.fill_null(
                    pc.greater(p, 300000.0), False), pa.int64())),
            pc.cast(pc.fill_null(
                pc.greater(p, 400000.0), False), pa.int64()))
        return pc.if_else(pc.is_valid(p), b,
                          pa.scalar(None, pa.int64()))

    return _materialize(weighted_kappa(
        od, rater_a_expr=grade, rater_b_expr=band, k_levels=5))


SQL_WEIGHTED_KAPPA_ORDERS = """
WITH f AS (
  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS a,
         1 + CASE WHEN o_totalprice > 100000.0 THEN 1 ELSE 0 END
           + CASE WHEN o_totalprice > 200000.0 THEN 1 ELSE 0 END
           + CASE WHEN o_totalprice > 300000.0 THEN 1 ELSE 0 END
           + CASE WHEN o_totalprice > 400000.0 THEN 1 ELSE 0 END AS b
  FROM orders
  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
    AND substr(o_orderpriority, 1, 1) BETWEEN '1' AND '5'),
ct AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n
       FROM f GROUP BY 1, 2),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM ct),
po AS (
  SELECT sum(((ct.a - ct.b) * (ct.a - ct.b) / 16.0) * ct.n)
           / tot.n AS po
  FROM ct, tot GROUP BY tot.n),
marg AS (
  SELECT ra.a, rb.b,
         CAST(ra.na AS DOUBLE) * rb.nb AS w
  FROM (SELECT a, CAST(sum(n) AS BIGINT) AS na FROM ct GROUP BY a) ra
  CROSS JOIN (SELECT b, CAST(sum(n) AS BIGINT) AS nb
              FROM ct GROUP BY b) rb),
pe AS (
  SELECT sum(((a - b) * (a - b) / 16.0) * w)
           / (CAST(tot.n AS DOUBLE) * tot.n) AS pe
  FROM marg, tot GROUP BY tot.n)
SELECT tot.n,
       CASE WHEN pe.pe > 0
            THEN round(1.0 - po.po / pe.pe, 6) END AS kappa_w
FROM tot, po, pe
"""


QUERIES73: Dict[str, Callable] = {
    "sign_test_daily": q_sign_test_daily,
    "ccc_daily": q_ccc_daily,
    "weighted_kappa_orders": q_weighted_kappa_orders,
}

SQL73: Dict[str, str] = {
    "sign_test_daily": SQL_SIGN_TEST_DAILY,
    "ccc_daily": SQL_CCC_DAILY,
    "weighted_kappa_orders": SQL_WEIGHTED_KAPPA_ORDERS,
}
