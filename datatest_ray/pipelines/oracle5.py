"""Driver-contract queries, batch 5 (see oracle.py for the contract):
rare-combination surprise screen, hour-of-day peak profile, robust-z
outlier report, top-share concentration, grouped harmonic mean.
Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# Most-surprising (x, y) combinations vs the independence expectation
# ---------------------------------------------------------------------------


def q_rare_combos_events(sf_dir: str):
    """The 5 (user, event_type) cells whose observed count falls
    furthest below cx·cy/total — per-entity behavioral anomaly cells
    chi-square's scalar would hide."""
    from ..stages.drift import rare_combos

    return rare_combos(_read(sf_dir, "events", ["user_id", "event_type"]),
                       "user_id", "event_type", k=5)


SQL_RARE_COMBOS_EVENTS = """
WITH c AS (
  SELECT user_id AS x, event_type AS y, count(*) AS n FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL GROUP BY 1, 2
), m AS (
  SELECT x, y, n,
         CAST(sum(n) OVER (PARTITION BY x) AS DOUBLE)
           * CAST(sum(n) OVER (PARTITION BY y) AS DOUBLE)
           / CAST(sum(n) OVER () AS DOUBLE) AS exp
  FROM c
), r AS (
  SELECT x, y, n, exp AS expected,
         n / exp AS ratio,
         row_number() OVER (ORDER BY n / exp,
                            CAST(x AS VARCHAR), CAST(y AS VARCHAR)) AS rn
  FROM m
)
SELECT x AS user_id, y AS event_type, n, expected, ratio
FROM r WHERE rn <= 5
"""


# ---------------------------------------------------------------------------
# Hour-of-day peak profile per key
# ---------------------------------------------------------------------------


def q_hourly_peak_events(sf_dir: str):
    """Which UTC hour carries each event type's traffic peak, with a
    smallest-hour tie-break."""
    from ..stages.temporal import hourly_peak

    return hourly_peak(_read(sf_dir, "events", ["event_type", "ts"]),
                       "ts", by="event_type")


SQL_HOURLY_PEAK_EVENTS = """
WITH c AS (
  SELECT event_type,
         CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hour,
         count(*) AS n
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), r AS (
  SELECT event_type, hour, n,
         CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS n_total,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY n DESC, hour) AS rn
  FROM c
)
SELECT event_type, hour AS peak_hour, CAST(n AS BIGINT) AS n_peak,
       n_total, CAST(n AS DOUBLE) / n_total AS share
FROM r WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Robust-z (median/MAD) outlier report per group
# ---------------------------------------------------------------------------


def q_robust_z_events(sf_dir: str):
    """Iglewicz–Hoaglin modified-z outlier counts of `value` per event
    type — median/MAD broadcast, rows never shuffle."""
    from ..stages.robust import robust_zscore_report

    return robust_zscore_report(
        _read(sf_dir, "events", ["event_type", "value"]),
        by="event_type", col="value", z=3.5)


SQL_ROBUST_Z_EVENTS = """
WITH med AS (
  SELECT event_type AS k, round(quantile_cont(value, 0.5), 6) AS med
  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
  GROUP BY 1
), mad AS (
  SELECT e.event_type AS k,
         round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
  FROM events e JOIN med m ON e.event_type = m.k
  WHERE e.value IS NOT NULL GROUP BY 1
), rz AS (
  SELECT e.event_type AS k,
         round(abs(e.value - m.med) / (1.4826 * d.mad), 6) AS rz
  FROM events e JOIN med m ON e.event_type = m.k
                JOIN mad d ON e.event_type = d.k
  WHERE e.value IS NOT NULL AND d.mad > 0
)
SELECT k AS event_type, count(*) AS n,
       count(*) FILTER (rz > 3.5) AS n_outliers,
       max(rz) AS max_rz
FROM rz GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Top-share concentration (share of total held by the top frac of keys)
# ---------------------------------------------------------------------------


def q_top_share_customers(sf_dir: str):
    """Revenue share of the top-10% customers by total order value —
    rank threshold found via a range-bucket histogram, no global sort."""
    from ..stages.profile import top_share

    return top_share(_read(sf_dir, "orders", ["o_custkey", "o_totalprice"]),
                     key_col="o_custkey", value_col="o_totalprice",
                     frac=0.1, decimals=2)


SQL_TOP_SHARE_CUSTOMERS = """
WITH r AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
  GROUP BY 1
), p AS (
  SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS total,
         CAST(ceil(0.1 * count(*)) AS BIGINT) AS topn
  FROM r
), rk AS (
  SELECT cents, row_number() OVER (ORDER BY cents DESC) AS rn FROM r
)
SELECT (SELECT n FROM p) AS n_keys, (SELECT topn FROM p) AS n_top,
       CAST((SELECT CAST(sum(cents) AS BIGINT) FROM rk
             WHERE rn <= (SELECT topn FROM p)) AS DOUBLE)
         / (SELECT total FROM p) AS top_share
"""


# ---------------------------------------------------------------------------
# Grouped harmonic mean (rate-style average; n / Σ(1/x) over positives)
# ---------------------------------------------------------------------------


def q_hmean_acctbal(sf_dir: str):
    """Harmonic mean of positive supplier balances per nation — the
    correct average for rate-like quantities; Sum partials over 1/x."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])

    def project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_kleene(
            pc.is_valid(t.column("s_nationkey")),
            pc.greater(t.column("s_acctbal"), 0.0)))
        return pa.table({
            "s_nationkey": t.column("s_nationkey"),
            "inv": pc.divide(pa.scalar(1.0), pc.cast(
                t.column("s_acctbal"), pa.float64())),
        })

    agg = ds.map_batches(project, batch_format="pyarrow",
                         zero_copy_batch=True).groupby(
        "s_nationkey").aggregate(Sum("inv", alias_name="sinv"),
                                 Count(alias_name="n_pos"))

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"s_nationkey": pa.array([], pa.int32()),
                             "n_pos": pa.array([], pa.int64()),
                             "hmean": pa.array([], pa.float64())})
        s = t.column("sinv").to_numpy(zero_copy_only=False)
        n = t.column("n_pos").to_numpy(zero_copy_only=False).astype(
            np.float64)
        return pa.table({
            "s_nationkey": t.column("s_nationkey"),
            "n_pos": pc.cast(t.column("n_pos"), pa.int64()),
            "hmean": pa.array(np.round(n / s, 6)),
        })

    return agg.map_batches(finalize, batch_format="pyarrow",
                           zero_copy_batch=True)


SQL_HMEAN_ACCTBAL = """
SELECT s_nationkey, count(*) AS n_pos,
       round(count(*) / sum(1.0 / s_acctbal), 6) AS hmean
FROM supplier
WHERE s_nationkey IS NOT NULL AND s_acctbal > 0
GROUP BY 1
"""


QUERIES5: Dict[str, Callable] = {
    "rare_combos_events": q_rare_combos_events,
    "hourly_peak_events": q_hourly_peak_events,
    "robust_z_events": q_robust_z_events,
    "top_share_customers": q_top_share_customers,
    "hmean_acctbal": q_hmean_acctbal,
}

SQL5: Dict[str, str] = {
    "rare_combos_events": SQL_RARE_COMBOS_EVENTS,
    "hourly_peak_events": SQL_HOURLY_PEAK_EVENTS,
    "robust_z_events": SQL_ROBUST_Z_EVENTS,
    "top_share_customers": SQL_TOP_SHARE_CUSTOMERS,
    "hmean_acctbal": SQL_HMEAN_ACCTBAL,
}
