"""Image-payload checks (SURVEY.md §2.I — engine extensions mandated by
BASELINE.json; none exist in the reference, which validates only plain
Python values).

* :class:`ImageParityCheck` — decode + pixel parity (PSNR>=40 dB for
  lossy), exact caption equality, phash-recompute consistency.  Runs as
  an ACTOR-POOL ``map_batches`` stage (callable class: the reference
  provider and codec state are built once per actor in ``__init__``,
  work happens per batch) with a small batch size — the ``bytes``
  column is wide, so blocks stay modest and the object store never
  holds more than concurrency x batch_size payloads.
* :class:`PhashNearDupCheck` — Hamming-collision detection via LSH on
  bit-bands of the int64 phash: per-batch explode to (band, band_key)
  rows, ONE groupby shuffle on the band key, within-bucket pairwise
  Hamming (buckets are capped), pair dedup by a second tiny groupby.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..differences import empty_violations, violations_table
from ..functions.png import decode_image, hamming64, phash64, psnr
# imported at module top (NOT lazily inside methods): worker processes may
# only have this code via cloudpickle by-value shipping, where runtime
# imports of the package would fail
from ..sources.images import reference_caption, reference_pixels
from .base import Check, RunContext

__all__ = ["ImageParityCheck", "ImageParityChecker", "PhashNearDupCheck", "fixture_reference_provider"]


class FixtureReference:
    """Reference provider for the synthetic fixture: regenerates clean
    pixels and captions from (seed, row index encoded in image_id).  In
    production this role is played by reading the reference Lance table;
    the checker only needs the two methods."""

    def __init__(self, seed: int):
        self.seed = seed

    def pixels(self, image_id: str, w: int, h: int) -> Optional[np.ndarray]:
        try:
            i = int(image_id.split("_")[-1])
        except ValueError:
            return None
        return reference_pixels(self.seed, i, w, h)

    def caption(self, image_id: str) -> Optional[str]:
        try:
            i = int(image_id.split("_")[-1])
        except ValueError:
            return None
        return reference_caption(self.seed, i)


def fixture_reference_provider(seed: int) -> FixtureReference:
    return FixtureReference(seed)


class ImageParityChecker:
    """Actor-pool callable: decode every payload, compare to reference
    pixels at PSNR >= threshold, recompute phash and compare to the
    phash column.  One instance per actor; construction cost (reference
    provider, codec tables) is amortized across batches."""

    def __init__(
        self,
        check_id: str = "image_parity",
        psnr_threshold: float = 40.0,
        phash_max_hamming: int = 2,
        reference_seed: Optional[int] = None,
        partition_col: Optional[str] = "partition_id",
        row_ref_col: str = "image_id",
    ):
        self.check_id = check_id
        self.psnr_threshold = psnr_threshold
        self.phash_max_hamming = phash_max_hamming
        self.provider = (
            fixture_reference_provider(reference_seed)
            if reference_seed is not None
            else None
        )
        self.partition_col = partition_col
        self.row_ref_col = row_ref_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch.column(self.row_ref_col).to_pylist()
        payloads = batch.column("bytes").to_pylist()
        phashes = batch.column("phash").to_numpy(zero_copy_only=False)
        captions = (
            batch.column("caption").to_pylist()
            if "caption" in batch.column_names
            else None
        )
        parts = (
            batch.column(self.partition_col).to_pylist()
            if self.partition_col and self.partition_col in batch.column_names
            else [""] * n
        )
        rows: dict = {k: [] for k in ("row_ref", "part", "kind", "value", "value_num", "expected", "expected_num", "deviation")}

        def emit(i, kind, value=None, value_num=None, expected=None,
                 expected_num=None, deviation=None):
            rows["row_ref"].append(ids[i])
            rows["part"].append(parts[i])
            rows["kind"].append(kind)
            rows["value"].append(value)
            rows["value_num"].append(value_num)
            rows["expected"].append(expected)
            rows["expected_num"].append(expected_num)
            rows["deviation"].append(deviation)

        for i in range(n):
            try:
                img = decode_image(payloads[i])
            except Exception as err:
                emit(i, "invalid", value=f"decode_error:{type(err).__name__}")
                continue
            # phash-recompute consistency (payload vs phash column)
            ph = phash64(img)
            dist = int(hamming64(ph, np.int64(phashes[i])))
            if dist > self.phash_max_hamming:
                emit(
                    i, "deviation", value=str(int(ph)),
                    expected=str(int(phashes[i])),
                    expected_num=float(self.phash_max_hamming),
                    value_num=float(dist), deviation=float(dist - self.phash_max_hamming),
                )
            # pixel parity vs reference (PSNR >= threshold for lossy)
            if self.provider is not None:
                h, w = img.shape[:2]
                ref = self.provider.pixels(ids[i], w, h)
                if ref is not None:
                    p = psnr(ref, img)
                    if p < self.psnr_threshold:
                        emit(
                            i, "deviation", value=f"psnr={p:.2f}",
                            value_num=p, expected=f">={self.psnr_threshold}",
                            expected_num=self.psnr_threshold,
                            deviation=p - self.psnr_threshold,
                        )
                # exact caption equality vs reference
                if captions is not None:
                    want = self.provider.caption(ids[i])
                    if want is not None and captions[i] != want:
                        emit(i, "invalid", value=captions[i], expected=want)
        if not rows["row_ref"]:
            return empty_violations()
        return violations_table(
            len(rows["row_ref"]), check_id=self.check_id, kind=rows["kind"],
            partition_id=rows["part"], row_ref=rows["row_ref"],
            value=rows["value"], value_num=rows["value_num"],
            expected=rows["expected"], expected_num=rows["expected_num"],
            deviation=rows["deviation"],
        )


class ImageParityCheck(Check):
    """Suite wrapper for :class:`ImageParityChecker` as an actor pool."""

    def __init__(
        self,
        check_id: str = "image_parity",
        psnr_threshold: float = 40.0,
        phash_max_hamming: int = 2,
        reference_seed: Optional[int] = None,
        concurrency=(2, 8),
        batch_size: int = 128,
    ):
        self.check_id = check_id
        self.psnr_threshold = psnr_threshold
        self.phash_max_hamming = phash_max_hamming
        self.reference_seed = reference_seed
        self.concurrency = concurrency
        self.batch_size = batch_size
        self.columns = ["image_id", "bytes", "phash", "caption"]

    def violations(self, ds, ctx: RunContext):
        cols = ["image_id", "bytes", "phash"]
        names = ds.schema().names
        if "caption" in names:
            cols.append("caption")
        part_col = ctx.partition_col
        if part_col and part_col in names:
            cols.append(part_col)
        return ds.select_columns(cols).map_batches(
            ImageParityChecker,
            fn_constructor_kwargs=dict(
                check_id=self.check_id,
                psnr_threshold=self.psnr_threshold,
                phash_max_hamming=self.phash_max_hamming,
                reference_seed=self.reference_seed,
                partition_col=part_col,
                row_ref_col=ctx.row_ref_col or "image_id",
            ),
            batch_format="pyarrow",
            batch_size=self.batch_size,
            concurrency=self.concurrency,
        )


class PhashNearDupCheck(Check):
    """Near-duplicate detection: Hamming(phash_a, phash_b) <= threshold.

    LSH banding: an int64 phash splits into ``n_bands`` bit-bands; two
    hashes within Hamming distance d collide in at least one band when
    d < n_bands (pigeonhole).  Plan: per-batch explode to (band_key,
    image_id, phash) — one row per band per image — then ONE groupby
    shuffle on band_key, pairwise Hamming inside each bucket (bucket
    size capped to defuse degenerate keys), pair-dedup via a second
    groupby over the (a, b) pair key.  Violation: kind='extra',
    row_ref=duplicate id, expected=kept id, deviation=hamming distance.
    """

    def __init__(self, threshold: int = 4, n_bands: int = 8,
                 max_bucket: int = 256, column: str = "phash",
                 id_column: str = "image_id",
                 check_id: Optional[str] = None):
        assert 64 % n_bands == 0
        self.threshold = threshold
        self.n_bands = n_bands
        self.max_bucket = max_bucket
        self.column = column
        self.id_column = id_column
        self.check_id = check_id or f"phash_near_dup(<={threshold})"

    def violations(self, ds, ctx: RunContext):
        from ray.data.aggregate import Min

        n_bands = self.n_bands
        band_bits = 64 // n_bands
        mask = np.uint64((1 << band_bits) - 1)
        col, id_col = self.column, self.id_column
        threshold, max_bucket, check_id = self.threshold, self.max_bucket, self.check_id

        def explode(batch: pa.Table) -> pa.Table:
            ph = batch.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
            u = ph.view(np.uint64)
            ids = batch.column(id_col)
            n = len(ph)
            keys, out_ids, out_ph = [], [], []
            for b in range(n_bands):
                band = (u >> np.uint64(b * band_bits)) & mask
                # band key: band index tag + band value
                keys.append(band.astype(np.int64) | (np.int64(b) << np.int64(band_bits + 1)))
                out_ids.append(ids)
                out_ph.append(batch.column(col))
            return pa.table({
                "bkey": pa.array(np.concatenate(keys)),
                "iid": pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in out_ids]),
                "ph": pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in out_ph]),
            })

        exploded = ds.select_columns([col, id_col]).map_batches(
            explode, batch_format="pyarrow", zero_copy_batch=True
        )

        def bucket_pairs(group: pa.Table) -> pa.Table:
            m = group.num_rows
            if m < 2:
                return pa.table({"a": pa.array([], pa.string()),
                                 "b": pa.array([], pa.string()),
                                 "d": pa.array([], pa.int64())})
            if m > max_bucket:
                group = group.slice(0, max_bucket)
                m = max_bucket
            ph = group.column("ph").to_numpy(zero_copy_only=False)
            ids = np.asarray(group.column("iid").to_pylist(), dtype=object)
            order = np.argsort(ids, kind="stable")
            ph, ids = ph[order], ids[order]
            ai, bi, dd = [], [], []
            for i in range(m - 1):
                d = hamming64(ph[i], ph[i + 1 :])
                hit = np.flatnonzero(d <= threshold)
                for j in hit:
                    ai.append(ids[i])
                    bi.append(ids[i + 1 + j])
                    dd.append(int(d[j]))
            return pa.table({"a": pa.array(ai, pa.string()),
                             "b": pa.array(bi, pa.string()),
                             "d": pa.array(dd, pa.int64())})

        pairs = exploded.groupby("bkey").map_groups(
            bucket_pairs, batch_format="pyarrow"
        )
        # a pair may collide in several bands: dedup on (a, b)
        deduped = pairs.groupby(["a", "b"]).aggregate(Min("d", alias_name="d"))
        default_part = ctx.default_partition

        def to_violations(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return empty_violations()
            return violations_table(
                batch.num_rows, check_id=check_id, kind="extra",
                partition_id=default_part,
                row_ref=batch.column("b"),
                value=batch.column("b"),
                expected=batch.column("a"),
                deviation=batch.column("d").cast(pa.float64()),
            )

        return deduped.map_batches(to_violations, batch_format="pyarrow")
