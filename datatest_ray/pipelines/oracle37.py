"""Driver-contract queries, batch 37 (see oracle.py for the contract):
Blomqvist's β quadrant correlation between quantity and price, and
ranking-agreement metrics (footrule / Kendall distance / RBO) between
a brand leaderboard ranked by revenue vs by item count.  Merged into
``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


# ---------------------------------------------------------------------------
# Blomqvist's beta: quantity vs extended price
# ---------------------------------------------------------------------------


def q_blomqvist_qty_price(sf_dir: str):
    """Blomqvist's β between l_quantity and l_extendedprice — exact
    lower medians, exact quadrant counts (stages/stattests.py ::
    blomqvist_beta)."""
    from ..stages.stattests import blomqvist_beta

    return _materialize(blomqvist_beta(
        _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"]),
        x_col="l_quantity", y_col="l_extendedprice"))


SQL_BLOMQVIST_QTY_PRICE = """
WITH fx AS (SELECT l_quantity AS x FROM lineitem
            WHERE l_quantity IS NOT NULL),
fy AS (SELECT l_extendedprice AS y FROM lineitem
       WHERE l_extendedprice IS NOT NULL),
mx AS (SELECT quantile_disc(x, 0.5) AS m FROM fx),
my AS (SELECT quantile_disc(y, 0.5) AS m FROM fy),
f AS (
  SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
q AS (
  SELECT
    CAST(count(*) FILTER (x > (SELECT m FROM mx)
                          AND y > (SELECT m FROM my)) AS BIGINT) AS n_pp,
    CAST(count(*) FILTER (x < (SELECT m FROM mx)
                          AND y < (SELECT m FROM my)) AS BIGINT) AS n_mm,
    CAST(count(*) FILTER (x > (SELECT m FROM mx)
                          AND y < (SELECT m FROM my)) AS BIGINT) AS n_pm,
    CAST(count(*) FILTER (x < (SELECT m FROM mx)
                          AND y > (SELECT m FROM my)) AS BIGINT) AS n_mp,
    CAST(count(*) AS BIGINT) AS n
  FROM f)
SELECT n, (SELECT m FROM mx) AS x_med, (SELECT m FROM my) AS y_med,
       n_pp, n_mm, n_pm, n_mp,
       CASE WHEN n_pp + n_mm + n_pm + n_mp > 0 THEN
         CAST(n_pp + n_mm - n_pm - n_mp AS DOUBLE)
           / (n_pp + n_mm + n_pm + n_mp) END AS beta
FROM q
"""


# ---------------------------------------------------------------------------
# Ranking agreement: brand leaderboard by revenue vs by count
# ---------------------------------------------------------------------------


def q_rank_agreement_brands(sf_dir: str):
    """Footrule / Kendall distance / RBO(0.9) between the brand
    ranking by total retail value and by part count
    (stages/stattests.py :: rank_agreement)."""
    from ..stages.stattests import rank_agreement

    def rev_cents(t: pa.Table):
        return pc.cast(pc.round(pc.multiply(
            t.column("p_retailprice"), 100.0)), pa.int64()).to_numpy(
            zero_copy_only=False)

    def ones(t: pa.Table):
        return np.ones(t.num_rows, dtype=np.int64)

    def drop_nulls(t: pa.Table) -> pa.Table:
        return t.filter(pc.and_(pc.is_valid(t.column("p_brand")),
                                pc.is_valid(t.column("p_retailprice"))))

    ds = _read(sf_dir, "part", ["p_brand", "p_retailprice"]).map_batches(
        drop_nulls, batch_format="pyarrow", zero_copy_batch=True)
    return _materialize(rank_agreement(
        ds, key_col="p_brand", score_a=rev_cents, score_b=ones,
        rbo_p=0.9))


SQL_RANK_AGREEMENT_BRANDS = """
WITH s AS (
  SELECT p_brand AS k,
         CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT))
              AS BIGINT) AS sa,
         CAST(count(*) AS BIGINT) AS sb
  FROM part
  WHERE p_brand IS NOT NULL AND p_retailprice IS NOT NULL
  GROUP BY 1),
r AS (
  SELECT k,
         CAST(row_number() OVER (ORDER BY sa DESC, k) AS BIGINT) AS ra,
         CAST(row_number() OVER (ORDER BY sb DESC, k) AS BIGINT) AS rb
  FROM s),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM r),
foot AS (SELECT CAST(sum(abs(ra - rb)) AS BIGINT) AS footrule FROM r),
kd AS (
  SELECT CAST(coalesce(sum(1) FILTER (a.ra > b.ra AND a.rb < b.rb), 0)
              AS BIGINT) AS kendall_dist
  FROM r a CROSS JOIN r b),
rbo AS (
  SELECT (1.0 - 0.9) * sum(
           power(0.9, d - 1)
           * (SELECT count(*) FROM r WHERE ra <= d AND rb <= d)
           / d) AS rbo
  FROM (SELECT CAST(ra AS DOUBLE) AS d FROM r))
SELECT nn.n AS n_keys, foot.footrule, kd.kendall_dist, rbo.rbo
FROM nn, foot, kd, rbo
"""


QUERIES37: Dict[str, Callable] = {
    "blomqvist_qty_price": q_blomqvist_qty_price,
    "rank_agreement_brands": q_rank_agreement_brands,
}

SQL37: Dict[str, str] = {
    "blomqvist_qty_price": SQL_BLOMQVIST_QTY_PRICE,
    "rank_agreement_brands": SQL_RANK_AGREEMENT_BRANDS,
}
