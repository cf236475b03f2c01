"""Driver-contract queries, batch 91 (see oracle.py for the contract):
spectral-entropy forecastability and the gradient-orientation imaging
profile.  Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_spectral_entropy_events(sf_dir: str):
    """Forecastability of each event type's daily series.
    Oracle-paired: the small-N rfft unrolls into an explicit cos/sin
    cross-join DFT (SQL_SPECTRAL_ENTROPY_EVENTS); planted-cycle
    behavior additionally pinned in tests/test_batch91.py
    (stages/temporal.py :: spectral_entropy_daily)."""
    from ..stages.temporal import spectral_entropy_daily

    return _materialize(spectral_entropy_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type"))


# Explicit-DFT mirror of spectral_entropy_daily: observed days only
# (gaps compress; j = day rank), bins k=1..n/2 as cos/sin cross-join
# sums, entropy of the normalized power spectrum scaled by ln(#bins).
SQL_SPECTRAL_ENTROPY_EVENTS = """
WITH daily AS MATERIALIZED (
  SELECT event_type AS g, CAST(floor(epoch(ts)/86400) AS BIGINT) AS day,
         CAST(count(*) AS DOUBLE) AS n
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2),
idx AS MATERIALIZED (
  SELECT g, n,
         row_number() OVER (PARTITION BY g ORDER BY day) - 1 AS j,
         count(*) OVER (PARTITION BY g) AS nn,
         avg(n) OVER (PARTITION BY g) AS mu
  FROM daily),
freq AS MATERIALIZED (
  SELECT g, nn,
         CAST(unnest(range(1, CAST(nn//2 AS BIGINT) + 1)) AS BIGINT) AS k
  FROM (SELECT DISTINCT g, nn FROM idx)),
co AS MATERIALIZED (
  SELECT f.g, f.k, f.nn,
         sum((i.n - i.mu) * cos(2*pi()*i.j*f.k/f.nn)) AS c,
         sum((i.n - i.mu) * sin(2*pi()*i.j*f.k/f.nn)) AS s
  FROM freq f JOIN idx i ON i.g = f.g GROUP BY 1, 2, 3),
spec AS MATERIALIZED (SELECT g, k, c*c + s*s AS p FROM co),
tot AS MATERIALIZED (
  SELECT g, sum(p) AS tot, count(*) AS nf FROM spec GROUP BY g),
nd AS (SELECT g, CAST(count(*) AS BIGINT) AS n_days FROM daily GROUP BY g)
SELECT nd.g AS event_type, nd.n_days,
       CASE WHEN nd.n_days >= 4 AND t.tot > 0 AND t.nf >= 2 THEN
         round((-sum(CASE WHEN s.p > 0
                          THEN (s.p/t.tot)*ln(s.p/t.tot)
                          ELSE 0 END))/ln(t.nf), 6)
       END AS spectral_entropy
FROM nd LEFT JOIN tot t ON t.g = nd.g LEFT JOIN spec s ON s.g = nd.g
GROUP BY nd.g, nd.n_days, t.tot, t.nf
ORDER BY nd.g
"""


def q_orientation_profile_images(sf_dir: str):
    """rows-only by design (pure-python codec): per-format gradient
    orientation histograms over decoded fixture pixels; numpy parity
    pinned in tests/test_batch91.py
    (stages/imaging.py :: orientation_profile)."""
    import os
    import re

    from ..sources.images import ImageFixtureSpec, generate_dataset
    from ..stages.imaging import orientation_profile

    base = os.path.basename(os.path.normpath(sf_dir))
    m = re.search(r"sf(\d+(?:\.\d+)?)", base)
    sf = float(m.group(1)) if m else 0.001
    spec = ImageFixtureSpec(n_rows=min(20_000,
                                       max(1000, int(1_000_000 * sf))),
                            seed=42, rows_per_part=2048)
    images = generate_dataset(spec, columns={"image_id", "bytes", "fmt"})
    out = orientation_profile(images)
    return _materialize(out).sort_by([("fmt", "ascending")])


QUERIES91: Dict[str, Callable] = {
    "spectral_entropy_events": q_spectral_entropy_events,
    "orientation_profile_images": q_orientation_profile_images,
}


def _sql91() -> Dict[str, str]:
    return {
        "spectral_entropy_events": SQL_SPECTRAL_ENTROPY_EVENTS,
    }
