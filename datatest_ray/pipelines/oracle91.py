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
    """rows-only by design (FFT): forecastability of each event
    type's daily series; planted-cycle behavior pinned in
    tests/test_batch91.py
    (stages/temporal.py :: spectral_entropy_daily)."""
    from ..stages.temporal import spectral_entropy_daily

    return _materialize(spectral_entropy_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type"))


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
    return {}
