"""Driver-contract queries, batch 57 (see oracle.py for the contract):
von Neumann successive-difference ratio, Buishand range level-shift
test, single-changepoint binary segmentation, and the stored-bytes
entropy audit over the image fixture.  Merged into
``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


_DAILY_CTE = """
WITH f AS (
  SELECT event_type AS g,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL),
daily AS (
  SELECT g, day, CAST(count(*) AS BIGINT) AS x
  FROM f GROUP BY 1, 2)
"""


def q_von_neumann_events(sf_dir: str):
    """Von Neumann ratio per event type over daily counts
    (stages/temporal.py :: von_neumann_daily)."""
    from ..stages.temporal import von_neumann_daily

    return _materialize(von_neumann_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type"))


SQL_VON_NEUMANN_EVENTS = _DAILY_CTE + """,
numbered AS (
  SELECT g, x, lead(x) OVER (PARTITION BY g ORDER BY day) AS x2
  FROM daily),
agg AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS s1,
         CAST(sum(x * x) AS BIGINT) AS s2,
         CAST(sum(CASE WHEN x2 IS NOT NULL
                       THEN (x2 - x) * (x2 - x) ELSE 0 END)
              AS BIGINT) AS num
  FROM numbered GROUP BY g)
SELECT g AS event_type, n AS n_days,
       CASE WHEN n >= 2 AND (n * s2 - s1 * s1) / CAST(n AS DOUBLE) > 0
            THEN round(num / ((n * s2 - s1 * s1) / CAST(n AS DOUBLE)),
                       6)
       END AS eta
FROM agg
"""


def q_buishand_events(sf_dir: str):
    """Buishand cumulative-deviation range test per event type
    (stages/temporal.py :: buishand_range_daily)."""
    from ..stages.temporal import buishand_range_daily

    return _materialize(buishand_range_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type"))


SQL_BUISHAND_EVENTS = _DAILY_CTE + """,
m AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS DOUBLE) / count(*) AS mean
  FROM daily GROUP BY g),
s AS (
  SELECT d.g, m.n, m.mean,
         sum(d.x - m.mean) OVER (PARTITION BY d.g ORDER BY d.day)
           AS s_k,
         (d.x - m.mean) * (d.x - m.mean) AS dev2
  FROM daily d JOIN m ON m.g = d.g),
agg AS (
  SELECT g, max(n) AS n,
         max(abs(s_k)) AS max_abs,
         max(s_k) - min(s_k) AS rng,
         sum(dev2) / max(n) AS var
  FROM s GROUP BY g)
SELECT g AS event_type, n AS n_days,
       CASE WHEN n >= 2 AND var > 0
            THEN round(max_abs / (sqrt(var) * sqrt(n)), 6)
       END AS q,
       CASE WHEN n >= 2 AND var > 0
            THEN round(rng / (sqrt(var) * sqrt(n)), 6)
       END AS r
FROM agg
"""


def q_binseg_events(sf_dir: str):
    """First binary-segmentation changepoint per event type
    (stages/temporal.py :: binseg_change_daily)."""
    from ..stages.temporal import binseg_change_daily

    return _materialize(binseg_change_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type"))


SQL_BINSEG_EVENTS = _DAILY_CTE + """,
w AS (
  SELECT g, day, x,
         CAST(sum(x) OVER (PARTITION BY g ORDER BY day) AS BIGINT)
           AS cum,
         CAST(row_number() OVER (PARTITION BY g ORDER BY day)
              AS BIGINT) AS k,
         CAST(sum(x) OVER (PARTITION BY g) AS BIGINT) AS s,
         CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n
  FROM daily),
obj AS (
  SELECT g, k, n, cum, s,
         (cum * cum) / CAST(k AS DOUBLE)
           + (s - cum) * (s - cum) / CAST(n - k AS DOUBLE) AS obj
  FROM w WHERE k < n),
best AS (
  SELECT g, k, n, cum, s,
         row_number() OVER (PARTITION BY g ORDER BY obj DESC, k)
           AS rk
  FROM obj)
SELECT b.g AS event_type, b.n AS n_days,
       b.k AS split_pos,
       round(CAST(b.s - b.cum AS DOUBLE) / (b.n - b.k)
             - CAST(b.cum AS DOUBLE) / b.k, 6) AS delta_mean
FROM best b WHERE b.rk = 1
"""


def q_image_entropy_audit(sf_dir: str):
    """rows-only by design (byte histograms of the synthetic fixture
    payloads have no SQL twin): per-format stored-bytes entropy audit;
    per-image parity vs a brute-force numpy bincount is pinned in
    tests/test_batch57.py (stages/imaging.py :: payload_entropy_audit).
    """
    import os
    import re

    from ..sources.images import ImageFixtureSpec, generate_dataset
    from ..stages.imaging import payload_entropy_audit

    base = os.path.basename(os.path.normpath(sf_dir))
    m = re.search(r"sf(\d+(?:\.\d+)?)", base)
    sf = float(m.group(1)) if m else 0.001
    spec = ImageFixtureSpec(n_rows=min(40_000,
                                       max(1000, int(1_000_000 * sf))),
                            seed=42, rows_per_part=2048)
    images = generate_dataset(spec, columns={"image_id", "bytes", "fmt"})
    out = payload_entropy_audit(images, low_threshold=6.0)
    return _materialize(out).sort_by([("fmt", "ascending")])


QUERIES57: Dict[str, Callable] = {
    "von_neumann_events": q_von_neumann_events,
    "buishand_events": q_buishand_events,
    "binseg_events": q_binseg_events,
    "image_entropy_audit": q_image_entropy_audit,
}


def _sql57() -> Dict[str, str]:
    return {
        "von_neumann_events": SQL_VON_NEUMANN_EVENTS,
        "buishand_events": SQL_BUISHAND_EVENTS,
        "binseg_events": SQL_BINSEG_EVENTS,
    }
