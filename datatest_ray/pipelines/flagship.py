"""Flagship pipeline: the full validation suite over the image+caption
table (BASELINE.json north_star).

Check inventory (all in one run):

* schema / dtype (zero data read)
* interval on w, h                       — fused stateless pass
* fmt set membership (row-level domain)  — fused stateless pass
* caption regex                          — fused stateless pass
* image_id uniqueness                    — pre-aggregated shuffle
* decode + PSNR>=40dB + caption parity + phash consistency
                                         — actor-pool map_batches
* per-partition KS drift on w / h / byte-size
* phash Hamming near-dup via LSH banding

The metadata checks never touch the ``bytes`` column (column pruning at
the read); only the parity and byte-size stages read payloads.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

from ..stages.base import RunContext
from ..stages.drift import BinSpec, DriftCheck
from ..stages.global_checks import UniqueCheck
from ..stages.imaging import (ImageIntegrityCheck, ImageParityCheck,
                              PhashNearDupCheck)
from ..stages.row_checks import DomainCheck, IntervalCheck, RegexCheck, SchemaCheck
from .suite import CheckSuite, ValidationResult

__all__ = ["flagship_checks", "run_flagship", "IMAGE_CTX"]

IMAGE_CTX = RunContext(partition_col="partition_id", row_ref_col="image_id")

CAPTION_RE = r"^[A-Za-z0-9 ,.'-]+$"
FMT_DOMAIN = {"jpeg", "png", "webp"}


def flagship_checks(
    reference_seed: Optional[int] = None,
    with_parity: bool = True,
    with_integrity: bool = False,
    with_drift: bool = True,
    with_near_dup: bool = True,
    parity_concurrency=(2, 8),
    parity_batch_size: int = 256,
    dim_hi: int = 80,
    bytes_hi: int = 8192,
    near_dup_mode: str = "exact",
):
    checks = [
        SchemaCheck({
            "image_id": str, "bytes": bytes, "w": int, "h": int,
            "fmt": str, "caption": str, "phash": int,
        }),
        IntervalCheck("w", min=1, max=16384),
        IntervalCheck("h", min=1, max=16384),
        DomainCheck("fmt", FMT_DOMAIN),
        RegexCheck("caption", CAPTION_RE),
        UniqueCheck("image_id"),
    ]
    if with_integrity:
        # structural screen (magic/CRC/framing, no decode) — cheap
        # enough to run everywhere; off by default so the benched
        # flagship profile stays comparable across rounds
        checks.append(ImageIntegrityCheck())
    if with_parity:
        checks.append(ImageParityCheck(
            reference_seed=reference_seed,
            concurrency=parity_concurrency,
            batch_size=parity_batch_size,
        ))
    if with_drift:
        checks.append(DriftCheck([
            BinSpec("w", 0, dim_hi, min(dim_hi // 2, 64)),
            BinSpec("h", 0, dim_hi, min(dim_hi // 2, 64)),
            BinSpec("bytes", 0, bytes_hi, 64, source="binary_length"),
        ]))
    if with_near_dup:
        checks.append(PhashNearDupCheck(threshold=4, mode=near_dup_mode))
    return checks


def run_flagship(ds, reference_seed: Optional[int] = None,
                 shuffle_partitions: Optional[int] = None,
                 reader=None, **kwargs) -> ValidationResult:
    """``reader``: optional per-branch pruned-read factory
    (``callable(columns) -> Dataset`` — see CheckSuite.run); pass
    ``lambda cols: ray.data.read_parquet(files, columns=cols)`` so each
    branch scans only its columns (Ray Data does not push
    ``select_columns`` into the parquet read)."""
    import dataclasses

    ctx = dataclasses.replace(IMAGE_CTX, shuffle_partitions=shuffle_partitions)
    suite = CheckSuite(flagship_checks(reference_seed=reference_seed, **kwargs), ctx)
    return suite.run(ds, reader=reader)
