"""Driver-contract queries, batch 29 (see oracle.py for the contract):
second wave of distribution/association tests from stages/stattests.py
— two-sample Anderson-Darling (tail-sensitive drift), Wilcoxon
signed-rank over paired per-user condition means, the G-test of
independence, the Theil inequality index per brand, and categorical
weekend-vs-weekday drift distances (TVD / Bhattacharyya / Hellinger).
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


# ---------------------------------------------------------------------------
# Anderson-Darling: view vs purchase value distributions
# ---------------------------------------------------------------------------


def q_ad_value_events(sf_dir: str):
    """Two-sample Anderson-Darling A² between the view and purchase
    ``value`` distributions — exact big-int per-block numerators over
    pooled distinct values (stages/stattests.py ::
    anderson_darling_two_sample)."""
    from ..stages.stattests import anderson_darling_two_sample

    return _materialize(anderson_darling_two_sample(
        _read(sf_dir, "events", ["event_type", "value"]),
        value_col="value", group_col="event_type", a="view", b="purchase"))


SQL_AD_VALUE_EVENTS = """
WITH pts AS (
  SELECT value AS v,
         count(*) FILTER (event_type = 'view') AS ca,
         count(*) FILTER (event_type = 'purchase') AS cb
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('view', 'purchase')
  GROUP BY 1),
c AS (
  SELECT ca + cb AS l,
         sum(ca + cb) OVER (ORDER BY v) AS b,
         sum(ca) OVER (ORDER BY v) AS ma
  FROM pts),
nn AS (SELECT CAST(sum(ca) AS BIGINT) AS n,
              CAST(sum(cb) AS BIGINT) AS m,
              CAST(sum(ca + cb) AS BIGINT) AS nt
       FROM pts)
SELECT nn.n AS n_a, nn.m AS n_b,
       CASE WHEN nn.n > 0 AND nn.m > 0 THEN
         sum(CAST(CAST(l AS HUGEINT)
                  * ((CAST(nn.nt AS HUGEINT) * ma
                      - CAST(nn.n AS HUGEINT) * b)
                     * (CAST(nn.nt AS HUGEINT) * ma
                        - CAST(nn.n AS HUGEINT) * b)) AS DOUBLE)
             / (CAST(b AS DOUBLE) * (nn.nt - b)))
           FILTER (b < nn.nt)
         / (CAST(nn.n AS DOUBLE) * nn.m)
       END AS a2
FROM c, nn GROUP BY nn.n, nn.m, nn.nt
"""


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank: per-user purchase-vs-view mean value
# ---------------------------------------------------------------------------


def q_wilcoxon_user_value(sf_dir: str):
    """Wilcoxon signed-rank over paired per-user mean purchase vs mean
    view values (exact integer-cents means, average-rank ties, tie-
    corrected z) — stages/stattests.py :: wilcoxon_signed_rank."""
    from ..stages.stattests import wilcoxon_signed_rank

    return _materialize(wilcoxon_signed_rank(
        _read(sf_dir, "events", ["user_id", "event_type", "value"]),
        key_col="user_id", group_col="event_type",
        a="purchase", b="view", value_col="value"))


SQL_WILCOXON_USER_VALUE = """
WITH k AS (
  SELECT user_id,
         CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))
                       FILTER (event_type = 'purchase'), 0) AS BIGINT) AS sa,
         CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS ca,
         CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))
                       FILTER (event_type = 'view'), 0) AS BIGINT) AS sb,
         CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS cb
  FROM events
  WHERE value IS NOT NULL AND user_id IS NOT NULL
    AND event_type IN ('purchase', 'view')
  GROUP BY 1),
d AS (
  SELECT CAST(sa AS DOUBLE) / ca - CAST(sb AS DOUBLE) / cb AS d
  FROM k WHERE ca > 0 AND cb > 0),
nz AS (SELECT d, abs(d) AS ad FROM d WHERE d <> 0),
blocks AS (
  SELECT ad, CAST(count(*) AS BIGINT) AS l,
         CAST(count(*) FILTER (d > 0) AS BIGINT) AS npos
  FROM nz GROUP BY 1),
r AS (
  SELECT l, npos,
         CAST(sum(l) OVER (ORDER BY ad) - l AS BIGINT) AS h_prev
  FROM blocks),
agg AS (
  SELECT CAST(coalesce(sum(npos * (2 * h_prev + l + 1)), 0) AS BIGINT) AS w2,
         CAST(coalesce(sum(l), 0) AS BIGINT) AS n,
         CAST(coalesce(sum(l * l * l - l), 0) AS BIGINT) AS tie
  FROM r)
SELECT n AS n_pairs,
       CASE WHEN n > 0 THEN w2 / 2.0 END AS w_plus,
       CASE WHEN n > 0
                 AND n * (n + 1) * (2 * n + 1) / 24.0 - tie / 48.0 > 0
       THEN (w2 / 2.0 - n * (n + 1) / 4.0)
            / sqrt(n * (n + 1) * (2 * n + 1) / 24.0 - tie / 48.0)
       END AS z
FROM agg
"""


# ---------------------------------------------------------------------------
# G-test of independence: order status x priority
# ---------------------------------------------------------------------------


def q_gtest_orders(sf_dir: str):
    """G-test (log-likelihood-ratio independence) over the
    o_orderstatus x o_orderpriority contingency table
    (stages/stattests.py :: g_test_independence)."""
    from ..stages.stattests import g_test_independence

    return _materialize(g_test_independence(
        _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"]),
        i_col="o_orderstatus", j_col="o_orderpriority"))


SQL_GTEST_ORDERS = """
WITH cells AS (
  SELECT o_orderstatus AS i, o_orderpriority AS j,
         CAST(count(*) AS BIGINT) AS o
  FROM orders
  WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
  GROUP BY 1, 2),
rt AS (SELECT i, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
ct AS (SELECT j, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
               CAST(count(DISTINCT i) AS BIGINT) AS nr,
               CAST(count(DISTINCT j) AS BIGINT) AS nc
        FROM cells)
SELECT tot.n AS n, tot.nr AS n_rows, tot.nc AS n_cols,
       (tot.nr - 1) * (tot.nc - 1) AS dof,
       2.0 * sum(o * ln(CAST(o * tot.n AS DOUBLE)
                        / CAST(rt.r * ct.c AS DOUBLE))) AS g
FROM cells
JOIN rt USING (i) JOIN ct USING (j) CROSS JOIN tot
GROUP BY tot.n, tot.nr, tot.nc
"""


# ---------------------------------------------------------------------------
# Theil inequality index of retail price per brand
# ---------------------------------------------------------------------------


def q_theil_brand_price(sf_dir: str):
    """Theil T inequality of p_retailprice within each p_brand —
    entropy-based concentration with exact integer-cents means
    (stages/stattests.py :: theil_index_by_group)."""
    from ..stages.stattests import theil_index_by_group

    return _materialize(theil_index_by_group(
        _read(sf_dir, "part", ["p_brand", "p_retailprice"]),
        by="p_brand", value_col="p_retailprice"))


SQL_THEIL_BRAND_PRICE = """
WITH f AS (
  SELECT p_brand AS g, p_retailprice AS x
  FROM part
  WHERE p_brand IS NOT NULL AND p_retailprice IS NOT NULL
    AND p_retailprice > 0),
a AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(x * 100) AS BIGINT)) AS BIGINT) AS sx_c,
         sum(x * ln(x)) AS sxlx
  FROM f GROUP BY 1)
SELECT g AS p_brand, n,
       CAST(sx_c AS DOUBLE) / 100.0 / n AS mean,
       sxlx / (n * (CAST(sx_c AS DOUBLE) / 100.0 / n))
         - ln(CAST(sx_c AS DOUBLE) / 100.0 / n) AS theil
FROM a
"""


# ---------------------------------------------------------------------------
# Weekend-vs-weekday event-mix drift: TVD / Bhattacharyya / Hellinger
# ---------------------------------------------------------------------------


def q_drift_weekend_events(sf_dir: str):
    """Total-variation, Bhattacharyya and Hellinger distances between
    the weekend and weekday event-type mixes (stages/stattests.py ::
    categorical_drift); ISO dow 6/7 = weekend, mirroring isodow()."""
    from ..stages.stattests import categorical_drift

    def is_weekend(t: pa.Table):
        dow = pc.day_of_week(t.column("ts"),
                             count_from_zero=False, week_start=1)
        return pc.greater_equal(dow, 6)

    return _materialize(categorical_drift(
        _read(sf_dir, "events", ["event_type", "ts"]),
        cat_col="event_type", split_col="ts", split_expr=is_weekend))


SQL_DRIFT_WEEKEND_EVENTS = """
WITH f AS (
  SELECT event_type AS c, CAST(isodow(ts) >= 6 AS BIGINT) AS w
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL),
cells AS (
  SELECT c, CAST(sum(w) AS BIGINT) AS nt,
         CAST(sum(1 - w) AS BIGINT) AS nf
  FROM f GROUP BY 1),
tot AS (SELECT CAST(sum(nt) AS BIGINT) AS st,
               CAST(sum(nf) AS BIGINT) AS sf,
               CAST(count(*) AS BIGINT) AS ncats
        FROM cells)
SELECT tot.st AS n_true, tot.sf AS n_false, tot.ncats AS n_cats,
       CASE WHEN tot.st > 0 AND tot.sf > 0 THEN
         0.5 * sum(abs(CAST(nt AS DOUBLE) / tot.st
                       - CAST(nf AS DOUBLE) / tot.sf)) END AS tvd,
       CASE WHEN tot.st > 0 AND tot.sf > 0 THEN
         sum(sqrt((CAST(nt AS DOUBLE) / tot.st)
                  * (CAST(nf AS DOUBLE) / tot.sf))) END AS bc,
       CASE WHEN tot.st > 0 AND tot.sf > 0 THEN
         sqrt(greatest(0.0, 1.0 - sum(sqrt((CAST(nt AS DOUBLE) / tot.st)
                  * (CAST(nf AS DOUBLE) / tot.sf))))) END AS hellinger
FROM cells CROSS JOIN tot
GROUP BY tot.st, tot.sf, tot.ncats
"""


QUERIES29: Dict[str, Callable] = {
    "ad_value_events": q_ad_value_events,
    "wilcoxon_user_value": q_wilcoxon_user_value,
    "gtest_orders": q_gtest_orders,
    "theil_brand_price": q_theil_brand_price,
    "drift_weekend_events": q_drift_weekend_events,
}

SQL29: Dict[str, str] = {
    "ad_value_events": SQL_AD_VALUE_EVENTS,
    "wilcoxon_user_value": SQL_WILCOXON_USER_VALUE,
    "gtest_orders": SQL_GTEST_ORDERS,
    "theil_brand_price": SQL_THEIL_BRAND_PRICE,
    "drift_weekend_events": SQL_DRIFT_WEEKEND_EVENTS,
}
