"""Driver-contract queries, batch 4 (see oracle.py for the contract):
calendar-spine coverage, trimmed mean, Theil's U, HHI concentration,
semantic-type detection, null co-occurrence, exact duplicate vectors,
daily OHLC bars, tolerance-bounded as-of join.  Merged into
``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict

import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# Calendar-spine coverage per key (gaps-and-islands complement of streaks)
# ---------------------------------------------------------------------------


def q_date_spine_gaps(sf_dir: str):
    """Per-user calendar coverage: distinct active days vs the full
    first→last day spine, with the largest hole."""
    from ..stages.seq import date_spine_gaps

    return date_spine_gaps(_read(sf_dir, "events", ["user_id", "ts"]),
                           by="user_id", ts="ts")


SQL_DATE_SPINE_GAPS = """
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), g AS (
  SELECT user_id, day,
         lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev
  FROM d
)
SELECT user_id, count(*) AS n_days,
       CAST(max(day) - min(day) + 1 AS BIGINT) AS span_days,
       CAST(max(day) - min(day) + 1 - count(*) AS BIGINT) AS n_missing,
       CAST(coalesce(max(day - prev - 1), 0) AS BIGINT) AS max_gap
FROM g GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Per-group trimmed mean (robust location; drops the tails, cf. winsorize)
# ---------------------------------------------------------------------------


def q_trimmed_mean_price(sf_dir: str):
    """5%-trimmed mean extended price per return flag — integer-cents
    sums over the inside-the-band rows, quantile bounds broadcast."""
    from ..stages.robust import trimmed_mean

    return trimmed_mean(
        _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"]),
        by="l_returnflag", col="l_extendedprice", p_lo=0.05, p_hi=0.95)


SQL_TRIMMED_MEAN_PRICE = """
WITH b AS (
  SELECT l_returnflag AS k,
         round(quantile_cont(l_extendedprice, 0.05), 6) AS lo,
         round(quantile_cont(l_extendedprice, 0.95), 6) AS hi
  FROM lineitem WHERE l_returnflag IS NOT NULL GROUP BY 1
), f AS (
  SELECT l.l_returnflag AS k,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem l JOIN b ON l.l_returnflag = b.k
  WHERE l.l_extendedprice >= b.lo AND l.l_extendedprice <= b.hi
)
SELECT k AS l_returnflag, count(*) AS n_kept,
       CAST(sum(cents) AS DOUBLE) / (100.0 * count(*)) AS tmean
FROM f GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Theil's U — asymmetric normalized dependence between two categoricals
# ---------------------------------------------------------------------------


def q_theils_u_orders(sf_dir: str):
    """Does order status predict priority, or the reverse?  Theil's
    uncertainty coefficient both ways from one contingency pass."""
    from ..stages.drift import theils_u

    return theils_u(
        _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"]),
        "o_orderstatus", "o_orderpriority")


SQL_THEILS_U_ORDERS = """
WITH c AS (
  SELECT o_orderstatus AS x, o_orderpriority AS y, count(*) AS n
  FROM orders
  WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
  GROUP BY 1, 2
), mx AS (SELECT x, CAST(sum(n) AS DOUBLE) AS cn FROM c GROUP BY x),
my AS (SELECT y, CAST(sum(n) AS DOUBLE) AS cn FROM c GROUP BY y),
s AS (SELECT (SELECT CAST(sum(n) AS DOUBLE) FROM c) AS tot,
             (SELECT sum(cn * ln(cn)) FROM mx) AS sx,
             (SELECT sum(cn * ln(cn)) FROM my) AS sy,
             (SELECT sum(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)))
              FROM c) AS sc)
SELECT CAST(tot AS BIGINT) AS n,
       round(ln(tot) - sx / tot, 6) AS h_x,
       round(ln(tot) - sy / tot, 6) AS h_y,
       round(ln(tot) - sc / tot, 6) AS h_xy,
       round((ln(tot) - sx / tot) + (ln(tot) - sy / tot)
             - (ln(tot) - sc / tot), 6) AS mi,
       CASE WHEN (ln(tot) - sx / tot) > 0 THEN
         round(((ln(tot) - sx / tot) + (ln(tot) - sy / tot)
                - (ln(tot) - sc / tot)) / (ln(tot) - sx / tot), 6) END
         AS u_xy,
       CASE WHEN (ln(tot) - sy / tot) > 0 THEN
         round(((ln(tot) - sx / tot) + (ln(tot) - sy / tot)
                - (ln(tot) - sc / tot)) / (ln(tot) - sy / tot), 6) END
         AS u_yx
FROM s
"""


# ---------------------------------------------------------------------------
# HHI concentration per key (complement of group_entropy)
# ---------------------------------------------------------------------------


def q_hhi_user_events(sf_dir: str):
    """How concentrated is each user's event mix?  HHI = Σ(cᵢ/n)²."""
    from ..stages.profile import group_hhi

    return group_hhi(_read(sf_dir, "events", ["user_id", "event_type"]),
                     "user_id", "event_type")


SQL_HHI_USER_EVENTS = """
WITH c AS (
  SELECT user_id AS k, event_type, count(*) AS n FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL GROUP BY 1, 2
)
SELECT k AS user_id, CAST(sum(n) AS BIGINT) AS n, count(*) AS n_cats,
       CAST(sum(n * n) AS DOUBLE)
         / (CAST(sum(n) AS DOUBLE) * CAST(sum(n) AS DOUBLE)) AS hhi
FROM c GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Semantic-type detection battery (regex match-share per column)
# ---------------------------------------------------------------------------

_SEM_RULES = [
    ("p_brand", "brand_code", "^Brand#[0-9]{1,2}$"),
    ("p_name", "lower_words", "^[a-z]+( [a-z]+)*$"),
    ("p_type", "digits_only", "^[0-9]+$"),
]


def q_semantic_types_part(sf_dir: str):
    """Which string columns of `part` are actually typed codes?
    RE2 match-share per (column, rule) in one streaming pass."""
    from ..stages.profile import semantic_type_profile

    return semantic_type_profile(
        _read(sf_dir, "part", ["p_brand", "p_name", "p_type"]), _SEM_RULES)


SQL_SEMANTIC_TYPES_PART = """
SELECT 'p_brand' AS col_name, 'brand_code' AS sem_type,
       count(*) FILTER (regexp_matches(p_brand, '^Brand#[0-9]{1,2}$'))
         AS n_match,
       count(p_brand) AS n_nonnull,
       CASE WHEN count(p_brand) > 0 THEN
         CAST(count(*) FILTER (
           regexp_matches(p_brand, '^Brand#[0-9]{1,2}$')) AS DOUBLE)
           / count(p_brand) END AS share
FROM part
UNION ALL
SELECT 'p_name', 'lower_words',
       count(*) FILTER (regexp_matches(p_name, '^[a-z]+( [a-z]+)*$')),
       count(p_name),
       CASE WHEN count(p_name) > 0 THEN
         CAST(count(*) FILTER (
           regexp_matches(p_name, '^[a-z]+( [a-z]+)*$')) AS DOUBLE)
           / count(p_name) END
FROM part
UNION ALL
SELECT 'p_type', 'digits_only',
       count(*) FILTER (regexp_matches(p_type, '^[0-9]+$')),
       count(p_type),
       CASE WHEN count(p_type) > 0 THEN
         CAST(count(*) FILTER (
           regexp_matches(p_type, '^[0-9]+$')) AS DOUBLE)
           / count(p_type) END
FROM part
"""


# ---------------------------------------------------------------------------
# Null co-occurrence (joint-missingness audit)
# ---------------------------------------------------------------------------


def q_null_cooccur_lineitem(sf_dir: str):
    """Do lineitem measures go missing together?  Pairwise null
    co-occurrence + jaccard over the null masks."""
    from ..stages.profile import null_cooccurrence

    return null_cooccurrence(
        _read(sf_dir, "lineitem", ["l_quantity", "l_discount", "l_tax"]),
        ["l_quantity", "l_discount", "l_tax"])


SQL_NULL_COOCCUR_LINEITEM = """
SELECT 'l_quantity' AS x, 'l_discount' AS y, count(*) AS n_rows,
       count(*) FILTER (l_quantity IS NULL) AS nx_null,
       count(*) FILTER (l_discount IS NULL) AS ny_null,
       count(*) FILTER (l_quantity IS NULL AND l_discount IS NULL)
         AS n_both,
       CASE WHEN count(*) FILTER (l_quantity IS NULL OR l_discount IS NULL)
                 > 0 THEN
         CAST(count(*) FILTER (l_quantity IS NULL
                                     AND l_discount IS NULL) AS DOUBLE)
           / count(*) FILTER (l_quantity IS NULL OR l_discount IS NULL)
       END AS jaccard
FROM lineitem
UNION ALL
SELECT 'l_quantity', 'l_tax', count(*),
       count(*) FILTER (l_quantity IS NULL),
       count(*) FILTER (l_tax IS NULL),
       count(*) FILTER (l_quantity IS NULL AND l_tax IS NULL),
       CASE WHEN count(*) FILTER (l_quantity IS NULL OR l_tax IS NULL)
                 > 0 THEN
         CAST(count(*) FILTER (l_quantity IS NULL
                                     AND l_tax IS NULL) AS DOUBLE)
           / count(*) FILTER (l_quantity IS NULL OR l_tax IS NULL) END
FROM lineitem
UNION ALL
SELECT 'l_discount', 'l_tax', count(*),
       count(*) FILTER (l_discount IS NULL),
       count(*) FILTER (l_tax IS NULL),
       count(*) FILTER (l_discount IS NULL AND l_tax IS NULL),
       CASE WHEN count(*) FILTER (l_discount IS NULL OR l_tax IS NULL)
                 > 0 THEN
         CAST(count(*) FILTER (l_discount IS NULL
                                     AND l_tax IS NULL) AS DOUBLE)
           / count(*) FILTER (l_discount IS NULL OR l_tax IS NULL) END
FROM lineitem
"""


# ---------------------------------------------------------------------------
# Exact duplicate embedding vectors (bitwise; md5 over the float32 bytes)
# ---------------------------------------------------------------------------


def q_dup_vectors(sf_dir: str):
    """Byte-identical embedding vectors over embeddings UNION a
    deterministic re-keyed subset of itself (vec_id % 7 == 0,
    +1_000_000) — the driver table has no exact dup vectors, so inject
    some to actually exercise the fingerprint groupby."""
    from ..stages.similarity import exact_dup_vectors

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def dup_subset(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(ids % 7 == 0))
        return pa.table({
            "vec_id": pc.add(sub.column("vec_id"), 1_000_000),
            "embedding": sub.column("embedding"),
        })

    dups = ds.map_batches(dup_subset, batch_format="pyarrow",
                          zero_copy_batch=True)
    return exact_dup_vectors(ds.union(dups), vec_col="embedding",
                             id_col="vec_id")


SQL_DUP_VECTORS = """
WITH embs2 AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 7 = 0
)
SELECT min(vec_id) AS keep_id, CAST(count(*) - 1 AS BIGINT) AS n_dups
FROM embs2 GROUP BY embedding HAVING count(*) > 1
"""


# ---------------------------------------------------------------------------
# Daily OHLC bars per event type (tie-proof open/close)
# ---------------------------------------------------------------------------


def q_ohlc_daily_events(sf_dir: str):
    """Open/high/low/close of `value` per (event_type, day); first/last
    resolved by lexicographic (ts, event_id) so ties are engine-proof."""
    from ..stages.temporal import ohlc_daily

    return ohlc_daily(
        _read(sf_dir, "events", ["event_type", "ts", "value", "event_id"]),
        "ts", by="event_type", value_col="value", id_col="event_id")


SQL_OHLC_DAILY_EVENTS = """
WITH e AS (
  SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         ts, event_id, value
  FROM events
  WHERE value IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
), w AS (
  SELECT event_type, day, value,
         first_value(value) OVER (PARTITION BY event_type, day
                                  ORDER BY ts, event_id) AS open,
         first_value(value) OVER (PARTITION BY event_type, day
                                  ORDER BY ts DESC, event_id DESC) AS close
  FROM e
)
SELECT event_type, day, min(open) AS open, max(value) AS high,
       min(value) AS low, min(close) AS close, count(*) AS n
FROM w GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Tolerance-bounded as-of join (bounded staleness)
# ---------------------------------------------------------------------------

_TOL_US = 21_600_000_000  # 6 hours


def q_asof_tolerance_click(sf_dir: str):
    """Each click joined to the user's latest PRIOR purchase only if it
    happened within 6 hours — matches staler than the tolerance become
    nulls (pandas merge_asof(tolerance=) semantics)."""
    from ..stages.joins import asof_join_latest

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])
    clicks = ev.filter(expr="event_type == 'click'")
    buys = ev.filter(expr="event_type == 'purchase'")
    out = asof_join_latest(clicks, buys, by="user_id", ts="ts",
                           left_id="event_id", tolerance_us=_TOL_US)
    return out.select_columns(["left_id", "prior_ts_us", "gap_us"])


SQL_ASOF_TOLERANCE_CLICK = f"""
SELECT a.event_id AS left_id,
       CASE WHEN epoch_us(a.ts) - epoch_us(b.ts) <= {_TOL_US}
            THEN epoch_us(b.ts) END AS prior_ts_us,
       CASE WHEN epoch_us(a.ts) - epoch_us(b.ts) <= {_TOL_US}
            THEN epoch_us(a.ts) - epoch_us(b.ts) END AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'click') a
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
  ON a.user_id = b.user_id AND a.ts >= b.ts
"""


QUERIES4: Dict[str, Callable] = {
    "date_spine_gaps_users": q_date_spine_gaps,
    "trimmed_mean_price": q_trimmed_mean_price,
    "theils_u_orders": q_theils_u_orders,
    "hhi_user_events": q_hhi_user_events,
    "semantic_types_part": q_semantic_types_part,
    "null_cooccur_lineitem": q_null_cooccur_lineitem,
    "dup_vectors": q_dup_vectors,
    "ohlc_daily_events": q_ohlc_daily_events,
    "asof_tolerance_click": q_asof_tolerance_click,
}

SQL4: Dict[str, str] = {
    "date_spine_gaps_users": SQL_DATE_SPINE_GAPS,
    "trimmed_mean_price": SQL_TRIMMED_MEAN_PRICE,
    "theils_u_orders": SQL_THEILS_U_ORDERS,
    "hhi_user_events": SQL_HHI_USER_EVENTS,
    "semantic_types_part": SQL_SEMANTIC_TYPES_PART,
    "null_cooccur_lineitem": SQL_NULL_COOCCUR_LINEITEM,
    "dup_vectors": SQL_DUP_VECTORS,
    "ohlc_daily_events": SQL_OHLC_DAILY_EVENTS,
    "asof_tolerance_click": SQL_ASOF_TOLERANCE_CLICK,
}
