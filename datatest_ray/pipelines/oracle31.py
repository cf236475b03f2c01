"""Driver-contract queries, batch 31 (see oracle.py for the contract):
the Kuiper two-sample statistic (tail-and-median-sensitive drift),
Cohen's h effect size between weekend/weekday conversion rates,
Mood's median test across event types, and the ntile(k) window.
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
# Kuiper V between returned-flag A prices and the rest
# ---------------------------------------------------------------------------


def q_kuiper_price(sf_dir: str):
    """Kuiper V = D⁺ + D⁻ between l_returnflag='A' prices and the rest
    — exact integer ECDF gaps (stages/stattests.py ::
    kuiper_two_sample)."""
    from ..stages.stattests import kuiper_two_sample

    return _materialize(kuiper_two_sample(
        _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"]),
        value_col="l_extendedprice", group_col="l_returnflag", a="A"))


SQL_KUIPER_PRICE = """
WITH p AS (
  SELECT l_extendedprice AS v,
         CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS g
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_returnflag IS NOT NULL),
pts AS (SELECT v, CAST(sum(g) AS BIGINT) AS ca,
               CAST(count(*) AS BIGINT) AS cnt
        FROM p GROUP BY 1),
c AS (SELECT sum(ca) OVER (ORDER BY v) AS cumn,
             sum(cnt - ca) OVER (ORDER BY v) AS cumm
      FROM pts),
nn AS (SELECT CAST(sum(ca) AS BIGINT) AS n,
              CAST(sum(cnt - ca) AS BIGINT) AS m FROM pts),
g AS (SELECT CAST(max(nn.m * cumn - nn.n * cumm) AS BIGINT) AS gmax,
             CAST(min(nn.m * cumn - nn.n * cumm) AS BIGINT) AS gmin,
             nn.n AS n, nn.m AS m
      FROM c, nn GROUP BY nn.n, nn.m)
SELECT n AS n_a, m AS n_b,
       CASE WHEN n > 0 AND m > 0 THEN
         CAST(greatest(gmax, 0) AS DOUBLE) / (CAST(n AS DOUBLE) * m)
       END AS d_plus,
       CASE WHEN n > 0 AND m > 0 THEN
         CAST(greatest(-gmin, 0) AS DOUBLE) / (CAST(n AS DOUBLE) * m)
       END AS d_minus,
       CASE WHEN n > 0 AND m > 0 THEN
         CAST(greatest(gmax, 0) AS DOUBLE) / (CAST(n AS DOUBLE) * m)
         + CAST(greatest(-gmin, 0) AS DOUBLE) / (CAST(n AS DOUBLE) * m)
       END AS v
FROM g
"""


# ---------------------------------------------------------------------------
# Cohen's h: weekend vs weekday purchase rate
# ---------------------------------------------------------------------------


def q_cohens_h_weekend(sf_dir: str):
    """Cohen's h between the weekend and weekday purchase-event share
    (stages/stattests.py :: cohens_h_two_proportions)."""
    from ..stages.stattests import cohens_h_two_proportions

    def is_purchase(t: pa.Table):
        return pc.equal(t.column("event_type"), "purchase")

    def is_weekend(t: pa.Table):
        dow = pc.day_of_week(t.column("ts"),
                             count_from_zero=False, week_start=1)
        return pc.greater_equal(dow, 6)

    return _materialize(cohens_h_two_proportions(
        _read(sf_dir, "events", ["event_type", "ts"]),
        flag_expr=is_purchase, split_expr=is_weekend,
        flag_col="event_type", split_col="ts"))


SQL_COHENS_H_WEEKEND = """
WITH f AS (
  SELECT CAST(event_type = 'purchase' AS BIGINT) AS fl,
         CAST(isodow(ts) >= 6 AS BIGINT) AS s
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
a AS (SELECT CAST(sum(s) AS BIGINT) AS n1,
             CAST(sum(fl * s) AS BIGINT) AS k1,
             CAST(sum(1 - s) AS BIGINT) AS n2,
             CAST(sum(fl * (1 - s)) AS BIGINT) AS k2
      FROM f)
SELECT n1 AS n_1, k1 AS k_1, n2 AS n_2, k2 AS k_2,
       CASE WHEN n1 > 0 THEN CAST(k1 AS DOUBLE) / n1 END AS p_1,
       CASE WHEN n2 > 0 THEN CAST(k2 AS DOUBLE) / n2 END AS p_2,
       CASE WHEN n1 > 0 AND n2 > 0 THEN
         2.0 * asin(sqrt(CAST(k1 AS DOUBLE) / n1))
         - 2.0 * asin(sqrt(CAST(k2 AS DOUBLE) / n2))
       END AS h
FROM a
"""


# ---------------------------------------------------------------------------
# Mood's median test: value by event type
# ---------------------------------------------------------------------------


def q_moods_median_value(sf_dir: str):
    """Mood's median test of ``value`` across event types — above/below
    the exact pooled lower median, then Pearson chi-square
    (stages/stattests.py :: moods_median_test)."""
    from ..stages.stattests import moods_median_test

    return _materialize(moods_median_test(
        _read(sf_dir, "events", ["event_type", "value"]),
        value_col="value", group_col="event_type"))


SQL_MOODS_MEDIAN_VALUE = """
WITH f AS (
  SELECT event_type AS g, value AS v FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL),
med AS (SELECT quantile_disc(v, 0.5) AS m FROM f),
cnt AS (
  SELECT g,
         CAST(count(*) FILTER (v > (SELECT m FROM med)) AS BIGINT) AS ka,
         CAST(count(*) AS BIGINT) AS ng
  FROM f GROUP BY 1),
tot AS (SELECT CAST(sum(ka) AS BIGINT) AS ta,
               CAST(sum(ng - ka) AS BIGINT) AS tb,
               CAST(sum(ng) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS k
        FROM cnt)
SELECT tot.n AS n, tot.k AS n_groups,
       (SELECT m FROM med) AS median,
       CASE WHEN tot.ta > 0 AND tot.tb > 0 AND tot.k >= 2 THEN
         sum((ka - CAST(ng AS DOUBLE) * tot.ta / tot.n)
             * (ka - CAST(ng AS DOUBLE) * tot.ta / tot.n)
             / (CAST(ng AS DOUBLE) * tot.ta / tot.n)
             + ((ng - ka) - CAST(ng AS DOUBLE) * tot.tb / tot.n)
               * ((ng - ka) - CAST(ng AS DOUBLE) * tot.tb / tot.n)
               / (CAST(ng AS DOUBLE) * tot.tb / tot.n))
       END AS chi2,
       tot.k - 1 AS dof
FROM cnt CROSS JOIN tot
GROUP BY tot.n, tot.k, tot.ta, tot.tb
"""


# ---------------------------------------------------------------------------
# ntile(4) of value per user
# ---------------------------------------------------------------------------


def q_ntile_user_value(sf_dir: str):
    """``ntile(4) OVER (PARTITION BY user ORDER BY value, event_id)``
    — deterministic quartile assignment (stages/winfunc.py ::
    ntile_window)."""
    from ..stages.winfunc import ntile_window

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def drop_nulls(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.and_(pc.is_valid(t.column("event_id")),
                             pc.is_valid(t.column("user_id"))),
                     pc.is_valid(t.column("value")))
        return t.filter(ok)

    clean = ds.map_batches(drop_nulls, batch_format="pyarrow",
                           zero_copy_batch=True)
    return _materialize(ntile_window(
        clean, by="user_id", value_col="value", id_col="event_id", k=4))


SQL_NTILE_USER_VALUE = """
SELECT event_id, user_id,
       CAST(ntile(4) OVER (PARTITION BY user_id
                           ORDER BY value, event_id) AS BIGINT) AS tile
FROM events
WHERE event_id IS NOT NULL AND user_id IS NOT NULL
  AND value IS NOT NULL
"""


QUERIES31: Dict[str, Callable] = {
    "kuiper_price": q_kuiper_price,
    "cohens_h_weekend": q_cohens_h_weekend,
    "moods_median_value": q_moods_median_value,
    "ntile_user_value": q_ntile_user_value,
}

SQL31: Dict[str, str] = {
    "kuiper_price": SQL_KUIPER_PRICE,
    "cohens_h_weekend": SQL_COHENS_H_WEEKEND,
    "moods_median_value": SQL_MOODS_MEDIAN_VALUE,
    "ntile_user_value": SQL_NTILE_USER_VALUE,
}
