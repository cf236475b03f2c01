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
from ..functions.png import (UnsupportedCodecError, container_scan,
                             decode_image, dhash64,
                             hamming64, phash64, psnr)
# imported at module top (NOT lazily inside methods): worker processes may
# only have this code via cloudpickle by-value shipping, where runtime
# imports of the package would fail
from ..sources.images import reference_caption, reference_pixels
from .base import Check, RunContext

__all__ = ["ImageParityCheck", "ImageParityChecker", "ImageIntegrityCheck", "ImageIntegrityChecker", "PhashNearDupCheck", "fixture_reference_provider", "image_dup_clusters", "ChannelStatsExtractor", "channel_stats", "channel_profile", "PixelFingerprintExtractor", "pixel_fingerprints", "image_pixel_dup_clusters", "ImageQualityExtractor", "image_quality_scores", "PixelMD5Extractor", "image_exact_pixel_dups", "ExposureExtractor", "image_exposure_scores", "SSIMExtractor", "image_ssim_scores", "BlurScoreExtractor", "blur_scores", "blur_audit", "PayloadEntropyExtractor", "payload_entropy_audit", "phash_bit_balance", "TileStatsExtractor", "tile_uniformity_audit", "GradientOrientationExtractor", "orientation_profile"]


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
        decl_w = (
            batch.column("w").to_numpy(zero_copy_only=False)
            if "w" in batch.column_names else None
        )
        decl_h = (
            batch.column("h").to_numpy(zero_copy_only=False)
            if "h" in batch.column_names else None
        )
        parts = (
            batch.column(self.partition_col).to_pylist()
            if self.partition_col and self.partition_col in batch.column_names
            else [""] * n
        )
        rows: dict = {k: [] for k in ("check_id", "row_ref", "part", "kind", "value", "value_num", "expected", "expected_num", "deviation")}

        def emit(i, kind, value=None, value_num=None, expected=None,
                 expected_num=None, deviation=None, check_id=None):
            rows["check_id"].append(check_id or self.check_id)
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
            except UnsupportedCodecError as err:
                emit(i, "invalid", value=f"codec_unsupported:{err.codec}",
                     expected="decodable container (png|SJPG|SWBP)",
                     check_id="codec_unsupported")
                continue
            except Exception as err:
                emit(i, "invalid", value=f"decode_error:{type(err).__name__}")
                continue
            # declared-vs-decoded dimension consistency (w/h columns
            # are metadata; the payload is the truth).  Null declared
            # dims (NaN after to_numpy) are the SchemaCheck's problem,
            # not a mismatch.
            if decl_w is not None and decl_h is not None:
                vw, vh = decl_w[i], decl_h[i]
                if vw == vw and vh == vh:
                    dh, dw = img.shape[:2]
                    if dw != int(vw) or dh != int(vh):
                        emit(
                            i, "invalid", value=f"decoded={dw}x{dh}",
                            expected=f"declared={int(vw)}x{int(vh)}",
                        )
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
            len(rows["row_ref"]), check_id=rows["check_id"], kind=rows["kind"],
            partition_id=rows["part"], row_ref=rows["row_ref"],
            value=rows["value"], value_num=rows["value_num"],
            expected=rows["expected"], expected_num=rows["expected_num"],
            deviation=rows["deviation"],
        )


class ImageParityCheck(Check):
    """Suite wrapper for :class:`ImageParityChecker` as an actor pool."""

    # NOTE: CheckSuite can schedule actor-pool branches in a separate
    # phase (Check.actor_pool = True) when a reserved pool would starve
    # concurrent task branches; with the lean sampled near-dup path,
    # full overlap measured faster at BOTH 8 and 32 CPUs, so parity
    # runs concurrently with the other branches by default.

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
        self.columns = ["image_id", "bytes", "phash"]
        # caption/dimension parity is checked only when the columns exist
        self.optional_columns = ["caption", "w", "h"]

    def violations(self, ds, ctx: RunContext):
        cols = ["image_id", "bytes", "phash"]
        names = ds.schema().names
        if "caption" in names:
            cols.append("caption")
        if "w" in names and "h" in names:
            cols += ["w", "h"]
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

    def __init__(self, threshold: int = 4, n_bands: int = 5,
                 max_bucket: int = 256, column: str = "phash",
                 id_column: str = "image_id",
                 mode: str = "exact", n_tables: int = 12,
                 sample_bits: int = 24, seed: int = 17,
                 check_id: Optional[str] = None):
        """mode='exact': contiguous bit-bands, pigeonhole recall 1.0 for
        Hamming < n_bands — but bucket occupancy grows linearly with
        corpus size, so candidate volume is quadratic (the verify path).
        mode='sampled': n_tables random sample_bits-bit projections of
        the 64 phash bits; 24-bit keys keep buckets near-singleton at any
        corpus size (the SCALE path).  Recall at Hamming d is
        1-(1-((64-d)/64)^sample_bits)^n_tables ~ 0.97 at d=4, >0.999 at
        d<=2, with exact Hamming verification so precision is 1.0."""
        assert 0 < n_bands <= 64 and threshold < n_bands
        assert mode in ("exact", "sampled")
        self.threshold = threshold
        self.n_bands = n_bands
        self.max_bucket = max_bucket
        self.column = column
        self.id_column = id_column
        self.mode = mode
        self.n_tables = n_tables
        self.sample_bits = sample_bits
        self.seed = seed
        self.check_id = check_id or f"phash_near_dup(<={threshold})"

    def pairs(self, ds, ctx: RunContext):
        """The deduped near-dup pair stream (a, b, d) — a < b string
        ids, d = exact Hamming — before violation formatting; the
        building block :func:`image_dup_clusters` composes on."""
        from ray.data.aggregate import Min

        from .base import coalesced
        from .dedup import _N_COARSE, _concat_ranges_np, _segment_pairs

        n_bands = self.n_bands
        # variable-width bands: 64 bits split as evenly as possible so a
        # small band alphabet (e.g. 8-bit bands -> only 256 buckets over
        # 10^5+ rows) can never degenerate into giant buckets; the first
        # `extra` bands get one extra bit.  Pigeonhole recall guarantee
        # holds for Hamming distance < n_bands.
        base_bits, extra = divmod(64, n_bands)
        bands = []
        shift = 0
        for b in range(n_bands):
            bits = base_bits + (1 if b < extra else 0)
            bands.append((shift, bits))
            shift += bits
        col, id_col = self.column, self.id_column
        threshold, max_bucket, check_id = self.threshold, self.max_bucket, self.check_id
        mode = self.mode
        if mode == "sampled":
            rng = np.random.RandomState(self.seed)
            tables = [
                np.sort(rng.choice(64, size=self.sample_bits, replace=False))
                for _ in range(self.n_tables)
            ]

        def _keys_for(u: np.ndarray):
            if mode == "exact":
                out = []
                for b, (sh, bits) in enumerate(bands):
                    band = (u >> np.uint64(sh)) & np.uint64((1 << bits) - 1)
                    out.append(band.astype(np.int64) | (np.int64(b) << np.int64(26)))
                return out
            out = []
            for t_i, pos in enumerate(tables):
                key = np.zeros(len(u), dtype=np.uint64)
                for k, pbit in enumerate(pos):
                    key |= ((u >> np.uint64(pbit)) & np.uint64(1)) << np.uint64(k)
                out.append(key.astype(np.int64) | (np.int64(t_i) << np.int64(26)))
            return out

        def explode(batch: pa.Table) -> pa.Table:
            ph = batch.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
            u = ph.view(np.uint64)
            ids = batch.column(id_col)
            ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
            keys = _keys_for(u)
            out_ids = [ids] * len(keys)
            out_ph = [batch.column(col)] * len(keys)
            bkey = np.concatenate(keys)
            return pa.table({
                "coarse": pa.array((bkey.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                                    % np.uint64(_N_COARSE)).astype(np.int64)),
                "bkey": pa.array(bkey),
                "iid": pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in out_ids]),
                "ph": pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in out_ph]),
            })

        exploded = coalesced(
            ds.select_columns([col, id_col]).map_batches(
                explode, batch_format="pyarrow", zero_copy_batch=True
            ),
            ctx,
        )

        def coarse_pairs(group: pa.Table) -> pa.Table:
            """Vectorized over ALL band buckets hashed into this coarse
            group: segment by exact band key, cap skewed buckets
            deterministically (id order), pairwise Hamming via
            _segment_pairs.  Candidate volume is quadratic in bucket
            occupancy, so everything up to the final few hits runs on
            int arrays (Arrow C++ sort + dictionary codes) — object
            (string) comparisons only touch surviving pairs."""
            g = group.sort_by([("bkey", "ascending"), ("iid", "ascending")])
            iid = g.column("iid")
            iid = iid.combine_chunks() if isinstance(iid, pa.ChunkedArray) else iid
            bkey = g.column("bkey").to_numpy(zero_copy_only=False)
            ph = g.column("ph").to_numpy(zero_copy_only=False)
            enc = pc.dictionary_encode(iid)
            enc = enc.combine_chunks() if isinstance(enc, pa.ChunkedArray) else enc
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            empty = pa.table({"a": pa.array([], pa.string()),
                              "b": pa.array([], pa.string()),
                              "d": pa.array([], pa.int64())})
            if len(bkey) < 2:
                return empty
            seg_new = np.ones(len(bkey), dtype=bool)
            seg_new[1:] = bkey[1:] != bkey[:-1]
            counts = np.diff(np.append(np.flatnonzero(seg_new), len(bkey)))
            rank = _concat_ranges_np(counts)
            keep = rank < max_bucket
            row_idx = np.flatnonzero(keep)
            ph_k, codes_k = ph[keep], codes[keep]
            counts = np.minimum(counts, max_bucket)
            ii, jj = _segment_pairs(counts)
            if not len(ii):
                return empty
            d = hamming64(ph_k[ii], ph_k[jj])
            hit = (d <= threshold) & (codes_k[ii] != codes_k[jj])
            if not hit.any():
                return empty
            ai = row_idx[ii[hit]]
            bi = row_idx[jj[hit]]
            d = d[hit]
            a = np.asarray(iid.take(pa.array(ai)).to_pylist(), dtype=object)
            b = np.asarray(iid.take(pa.array(bi)).to_pylist(), dtype=object)
            swap = a > b
            a2 = np.where(swap, b, a)
            b2 = np.where(swap, a, b)
            return pa.table({"a": pa.array(a2.astype(str)),
                             "b": pa.array(b2.astype(str)),
                             "d": pa.array(d.astype(np.int64))})

        pairs = exploded.groupby("coarse").map_groups(
            coarse_pairs, batch_format="pyarrow"
        )
        # a pair may collide in several bands: dedup on (a, b).  The
        # pairs stream is tiny (near-dup hits only) — cap the coalesce so
        # this second exchange is a handful of blocks, not P x P
        return coalesced(pairs, ctx, cap=4).groupby(["a", "b"]).aggregate(
            Min("d", alias_name="d")
        )

    def violations(self, ds, ctx: RunContext):
        check_id = self.check_id
        deduped = self.pairs(ds, ctx)
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


class ImageIntegrityChecker:
    """Per-batch structural scan (see ``png.container_scan``): no
    inflate, no pixel work — validates container magic, PNG chunk CRC
    framing, header dims vs the declared w/h columns, and the declared
    fmt vs the actual container."""

    def __init__(self, check_id: str = "image_integrity",
                 partition_col: Optional[str] = "partition_id",
                 row_ref_col: str = "image_id"):
        self.check_id = check_id
        self.partition_col = partition_col
        self.row_ref_col = row_ref_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch.column(self.row_ref_col).to_pylist()
        payloads = batch.column("bytes").to_pylist()
        fmts = (batch.column("fmt").to_pylist()
                if "fmt" in batch.column_names else None)
        decl_w = (batch.column("w").to_numpy(zero_copy_only=False)
                  if "w" in batch.column_names else None)
        decl_h = (batch.column("h").to_numpy(zero_copy_only=False)
                  if "h" in batch.column_names else None)
        parts = (batch.column(self.partition_col).to_pylist()
                 if self.partition_col
                 and self.partition_col in batch.column_names
                 else [""] * n)
        rows: dict = {k: [] for k in
                      ("check_id", "row_ref", "part", "kind", "value",
                       "expected")}

        def emit(i, kind, value=None, expected=None, check_id=None):
            rows["check_id"].append(check_id or self.check_id)
            rows["row_ref"].append(ids[i])
            rows["part"].append(parts[i])
            rows["kind"].append(kind)
            rows["value"].append(value)
            rows["expected"].append(expected)

        for i in range(n):
            fmt, w, h, err = container_scan(payloads[i])
            if err is not None:
                if err.startswith("codec_unsupported"):
                    # recognized real-world codec with no in-sandbox
                    # decoder: a clean self-describing violation row,
                    # not a corrupt-container report (verdict r4 #3)
                    emit(i, "invalid", value=err,
                         expected="decodable container (png|SJPG|SWBP)",
                         check_id="codec_unsupported")
                else:
                    emit(i, "corrupt", value=err,
                         expected="sound container")
                continue
            if fmts is not None and fmts[i] != fmt:
                emit(i, "invalid", value=fmts[i], expected=fmt)
            if decl_w is not None and w is not None and (
                    int(decl_w[i]) != w or int(decl_h[i]) != h):
                emit(i, "deviation",
                     value=f"{int(decl_w[i])}x{int(decl_h[i])}",
                     expected=f"{w}x{h}")
        if not rows["row_ref"]:
            return empty_violations()
        return violations_table(
            len(rows["row_ref"]), check_id=rows["check_id"],
            kind=rows["kind"], partition_id=rows["part"],
            row_ref=rows["row_ref"], value=rows["value"],
            expected=rows["expected"],
        )


class ImageIntegrityCheck(Check):
    """Structural container validation (magic / CRC / framing /
    header-vs-declared metadata) WITHOUT decoding pixels — the cheap
    first-line screen that runs before :class:`ImageParityCheck`'s
    decode at 10^12-image scale.  Stateless per row, so it runs as
    plain ``map_batches`` tasks (no actor pool needed)."""

    def __init__(self, check_id: str = "image_integrity",
                 batch_size: int = 256):
        self.check_id = check_id
        self.batch_size = batch_size
        self.columns = ["image_id", "bytes"]
        self.optional_columns = ["fmt", "w", "h"]

    def violations(self, ds, ctx: RunContext):
        cols = ["image_id", "bytes"]
        names = ds.schema().names
        for c in ("fmt",):
            if c in names:
                cols.append(c)
        if "w" in names and "h" in names:
            cols += ["w", "h"]
        part_col = ctx.partition_col
        if part_col and part_col in names:
            cols.append(part_col)
        # stateless: a bound instance ships as a plain task function
        # (no actor pool to spin up, unlike the decode-parity checker)
        fn = ImageIntegrityChecker(
            check_id=self.check_id,
            partition_col=part_col,
            row_ref_col=ctx.row_ref_col or "image_id",
        )
        return ds.select_columns(cols).map_batches(
            fn,
            batch_format="pyarrow",
            batch_size=self.batch_size,
        )


def image_dup_clusters(ds, *, threshold: int = 4, mode: str = "sampled",
                       id_prefix_len: int = 4, **check_kwargs):
    """Composed image near-dup audit: phash LSH pairs (the same
    candidate/verify plan as :class:`PhashNearDupCheck`) → connected
    components → cluster-size histogram (size, n_clusters) — "how many
    visually-identical groups of each size does the corpus hold?".

    ``id_prefix_len`` strips the fixture's ``img_`` prefix so the
    numeric id suffix feeds the integer-keyed components loop.
    """
    from .base import RunContext
    from .graph import cluster_size_histogram

    check = PhashNearDupCheck(threshold=threshold, mode=mode,
                              **check_kwargs)
    pairs = check.pairs(ds, RunContext())

    def to_int(batch: pa.Table) -> pa.Table:
        return pa.table({
            "a": pc.cast(pc.utf8_slice_codeunits(
                batch.column("a"), id_prefix_len, 64), pa.int64()),
            "b": pc.cast(pc.utf8_slice_codeunits(
                batch.column("b"), id_prefix_len, 64), pa.int64()),
        })

    int_pairs = pairs.map_batches(to_int, batch_format="pyarrow",
                                  zero_copy_batch=True)
    return cluster_size_histogram(int_pairs, a_col="a", b_col="b")


class ChannelStatsExtractor:
    """Actor-pool callable: decode every payload and emit per-image
    pixel statistics (mean, std, channel count) — the decoded-CONTENT
    counterpart to the metadata drift histograms (w/h/byte-size).
    Codec tables are built once per actor; decode failures emit NULL
    stats (corruption reporting belongs to the integrity/parity
    checks, not here)."""

    def __init__(self, id_col: str = "image_id", bytes_col: str = "bytes",
                 fmt_col: str = "fmt",
                 partition_col: Optional[str] = "partition_id"):
        self.id_col = id_col
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col
        self.partition_col = partition_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        payloads = batch.column(self.bytes_col).to_pylist()
        fmts = (
            batch.column(self.fmt_col).to_pylist()
            if self.fmt_col in batch.column_names else [None] * n
        )
        mean = np.full(n, np.nan)
        std = np.full(n, np.nan)
        chans = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i, (data, fmt) in enumerate(zip(payloads, fmts)):
            if data is None:
                continue
            try:
                img = decode_image(data, fmt)
            except Exception:
                continue
            px = img.astype(np.float64)
            mean[i] = px.mean()
            std[i] = px.std()
            chans[i] = img.shape[2] if img.ndim == 3 else 1
            ok[i] = True
        out = {self.id_col: batch.column(self.id_col)}
        if self.partition_col and self.partition_col in batch.column_names:
            out[self.partition_col] = batch.column(self.partition_col)
        out["mean_px"] = pa.array(mean, pa.float64(), mask=~ok)
        out["std_px"] = pa.array(std, pa.float64(), mask=~ok)
        out["n_channels"] = pa.array(chans, mask=~ok)
        return pa.table(out)


def channel_stats(ds, *, concurrency=(2, 8), batch_size: int = 128,
                  partition_col: Optional[str] = "partition_id",
                  fmt_col: str = "fmt"):
    """Per-image decoded-pixel stats as a Dataset (actor-pool decode).

    Feed the result into :class:`~.drift.DriftCheck` with a
    ``BinSpec('mean_px', 0, 255, ...)`` for per-partition
    brightness-drift verdicts on decoded CONTENT, or aggregate it into
    a per-partition profile (``channel_profile``)."""
    names = ds.schema().names
    cols = ["image_id", "bytes"]
    if fmt_col in names:
        cols.append(fmt_col)
    if partition_col and partition_col in names:
        cols.append(partition_col)
    return ds.select_columns(cols).map_batches(
        ChannelStatsExtractor,
        fn_constructor_kwargs=dict(partition_col=partition_col,
                                   fmt_col=fmt_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def channel_profile(ds, **kwargs):
    """Per-partition decoded-content profile: (partition_id, n_images,
    n_decode_failures, avg_mean_px, avg_std_px) — always one row per
    partition, so lineage dashboards see every partition even when no
    drift fires."""
    from ray.data.aggregate import Count, Mean, Sum

    stats = channel_stats(ds, **kwargs)

    def mark_failed(batch: pa.Table) -> pa.Table:
        failed = pc.cast(pc.is_null(batch.column("mean_px")), pa.int64())
        return batch.append_column("failed", failed)

    marked = stats.map_batches(mark_failed, batch_format="pyarrow",
                               zero_copy_batch=True)
    agg = marked.groupby("partition_id").aggregate(
        Count(alias_name="n_images"),
        Sum("failed", alias_name="n_decode_failures"),
        Mean("mean_px", alias_name="avg_mean_px"),
        Mean("std_px", alias_name="avg_std_px"),
    )
    return agg.sort("partition_id")


class PixelFingerprintExtractor:
    """Actor-pool callable: decode every payload and emit a 64-bit
    perceptual fingerprint computed from the DECODED PIXELS (dhash —
    gradient family — or phash — median family).  Unlike the table's
    stored ``phash`` column, this validates what the bytes actually
    decode to, so a corrupted-but-well-hashed row cannot hide.  Decode
    failures emit NULL fingerprints (corruption reporting belongs to
    the integrity/parity checks)."""

    def __init__(self, algo: str = "dhash", id_col: str = "image_id",
                 bytes_col: str = "bytes", fmt_col: str = "fmt"):
        # module-level codec imports only: a runtime relative import in
        # an actor ctor defeats cloudpickle by-value shipping (workers
        # without the repo on sys.path would die on ModuleNotFoundError)
        assert algo in ("dhash", "phash")
        self.fp = dhash64 if algo == "dhash" else phash64
        self.id_col = id_col
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        payloads = batch.column(self.bytes_col).to_pylist()
        fmts = (
            batch.column(self.fmt_col).to_pylist()
            if self.fmt_col in batch.column_names else [None] * n
        )
        fps = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i, (data, fmt) in enumerate(zip(payloads, fmts)):
            if data is None:
                continue
            try:
                fps[i] = self.fp(decode_image(data, fmt))
                ok[i] = True
            except Exception:
                continue
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "phash": pa.array(fps, mask=~ok),
        })


def pixel_fingerprints(ds, *, algo: str = "dhash",
                       concurrency=(2, 8), batch_size: int = 128,
                       fmt_col: str = "fmt"):
    """Per-image pixel-derived fingerprint as a (id, phash) Dataset —
    named ``phash`` so every downstream consumer of the stored-hash
    column (PhashNearDupCheck, image_dup_clusters) runs unchanged on
    pixel-derived hashes."""
    names = ds.schema().names
    cols = ["image_id", "bytes"]
    if fmt_col in names:
        cols.append(fmt_col)
    return ds.select_columns(cols).map_batches(
        PixelFingerprintExtractor,
        fn_constructor_kwargs=dict(algo=algo, fmt_col=fmt_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def image_pixel_dup_clusters(ds, *, algo: str = "dhash",
                             threshold: int = 4, mode: str = "sampled",
                             concurrency=(2, 8), **check_kwargs):
    """Near-dup cluster audit keyed on PIXEL-derived fingerprints:
    actor-pool decode -> dhash/phash -> the same LSH pair plan and
    connected-components histogram as :func:`image_dup_clusters`.
    Rows whose payload fails to decode are dropped (null fingerprint)."""
    fps = pixel_fingerprints(ds, algo=algo, concurrency=concurrency)

    def drop_null(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column("phash")))

    valid = fps.map_batches(drop_null, batch_format="pyarrow",
                            zero_copy_batch=True)
    return image_dup_clusters(valid, threshold=threshold, mode=mode,
                              **check_kwargs)


class ImageQualityExtractor:
    """Actor-pool callable: decoded-pixel quality metrics per image —
    ``sharpness`` = variance of the 4-neighbour Laplacian of the gray
    plane (blur detection: blurry images score low) and ``contrast`` =
    gray-plane std — the blurry/flat-image filter signals of an image
    training-data pipeline.  Decode failures emit NULL metrics."""

    def __init__(self, id_col: str = "image_id", bytes_col: str = "bytes",
                 fmt_col: str = "fmt"):
        self.id_col = id_col
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col

    @staticmethod
    def metrics(img: np.ndarray):
        g = img.astype(np.float64)
        if g.ndim == 3:
            g = g.mean(axis=2)
        contrast = float(g.std())
        if g.shape[0] < 3 or g.shape[1] < 3:
            return 0.0, contrast
        lap = (4.0 * g[1:-1, 1:-1] - g[:-2, 1:-1] - g[2:, 1:-1]
               - g[1:-1, :-2] - g[1:-1, 2:])
        return float(lap.var()), contrast

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        payloads = batch.column(self.bytes_col).to_pylist()
        fmts = (batch.column(self.fmt_col).to_pylist()
                if self.fmt_col in batch.column_names else [None] * n)
        sharp = np.full(n, np.nan)
        contr = np.full(n, np.nan)
        ok = np.zeros(n, dtype=bool)
        for i, (data, fmt) in enumerate(zip(payloads, fmts)):
            if data is None:
                continue
            try:
                s, c = self.metrics(decode_image(data, fmt))
            except Exception:
                continue
            sharp[i], contr[i], ok[i] = s, c, True
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "sharpness": pa.array(sharp, pa.float64(), mask=~ok),
            "contrast": pa.array(contr, pa.float64(), mask=~ok),
        })


def image_quality_scores(ds, *, concurrency=(2, 8), batch_size: int = 128,
                         fmt_col: str = "fmt"):
    """Per-image (sharpness, contrast) as a Dataset — feed into an
    IntervalCheck / quantile filter to drop blurry or flat images."""
    names = ds.schema().names
    cols = ["image_id", "bytes"]
    if fmt_col in names:
        cols.append(fmt_col)
    return ds.select_columns(cols).map_batches(
        ImageQualityExtractor,
        fn_constructor_kwargs=dict(fmt_col=fmt_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class BorderEntropyExtractor:
    """Actor-pool callable: letterbox/pillarbox border audit + pixel
    entropy per image.  Border width per side = number of consecutive
    edge rows/cols whose gray-plane std is <= ``flat_tol`` (a constant
    matte bar has ~zero variance); ``entropy`` is the Shannon entropy
    (bits) of the 256-bin gray histogram — near-zero for synthetic
    flat fills, high for natural texture.  The crop-before-train and
    junk-image screens of an image pipeline.  Decode failures emit
    NULL metrics."""

    def __init__(self, id_col: str = "image_id", bytes_col: str = "bytes",
                 fmt_col: str = "fmt", flat_tol: float = 1.0):
        self.id_col = id_col
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col
        self.flat_tol = float(flat_tol)

    def metrics(self, img: np.ndarray):
        g = img.astype(np.float64)
        if g.ndim == 3:
            g = g.mean(axis=2)
        h, w = g.shape
        hist = np.bincount(
            np.clip(g.astype(np.int64).ravel(), 0, 255), minlength=256)
        p = hist[hist > 0] / hist.sum()
        entropy = float(-(p * np.log2(p)).sum())

        def run_len(stds: np.ndarray) -> int:
            flat = stds <= self.flat_tol
            stop = np.flatnonzero(~flat)
            return int(stop[0]) if stop.size else len(stds)

        row_std = g.std(axis=1)
        col_std = g.std(axis=0)
        top = run_len(row_std)
        bottom = run_len(row_std[::-1])
        left = run_len(col_std)
        right = run_len(col_std[::-1])
        # fully-flat image: report whole extent once, not double-counted
        if top == h:
            bottom = 0
        if left == w:
            right = 0
        return entropy, top, bottom, left, right

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        payloads = batch.column(self.bytes_col).to_pylist()
        fmts = (batch.column(self.fmt_col).to_pylist()
                if self.fmt_col in batch.column_names else [None] * n)
        ent = np.full(n, np.nan)
        borders = np.zeros((n, 4), dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i, (data, fmt) in enumerate(zip(payloads, fmts)):
            if data is None:
                continue
            try:
                e, t, b, lft, r = self.metrics(decode_image(data, fmt))
            except Exception:
                continue
            ent[i] = e
            borders[i] = (t, b, lft, r)
            ok[i] = True
        mask = ~ok
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "entropy": pa.array(ent, pa.float64(), mask=mask),
            "border_top": pa.array(borders[:, 0], pa.int64(), mask=mask),
            "border_bottom": pa.array(borders[:, 1], pa.int64(),
                                      mask=mask),
            "border_left": pa.array(borders[:, 2], pa.int64(), mask=mask),
            "border_right": pa.array(borders[:, 3], pa.int64(), mask=mask),
        })


def image_border_audit(ds, *, concurrency=(2, 8), batch_size: int = 128,
                       fmt_col: str = "fmt", flat_tol: float = 1.0):
    """Per-image letterbox borders + gray-histogram entropy as a
    Dataset — feed into interval checks to flag matte-framed or
    near-constant junk images before training."""
    names = ds.schema().names
    cols = ["image_id", "bytes"]
    if fmt_col in names:
        cols.append(fmt_col)
    return ds.select_columns(cols).map_batches(
        BorderEntropyExtractor,
        fn_constructor_kwargs=dict(fmt_col=fmt_col, flat_tol=flat_tol),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class PixelMD5Extractor:
    """Actor-pool callable: decode every payload and emit the md5 of
    the RAW PIXEL BUFFER (shape-prefixed) — the content identity that
    survives re-encoding.  Byte-hash dedup misses the same picture
    compressed at a different zlib level; perceptual dhash/phash
    collapses near-misses.  This sits exactly between: equal digest ⟺
    bit-identical decoded pixels.  Decode failures emit NULL digests.
    """

    def __init__(self, id_col: str = "image_id",
                 bytes_col: str = "bytes", fmt_col: str = "fmt"):
        self.id_col = id_col
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        n = batch.num_rows
        payloads = batch.column(self.bytes_col).to_pylist()
        fmts = (
            batch.column(self.fmt_col).to_pylist()
            if self.fmt_col in batch.column_names else [None] * n
        )
        digests: list = [None] * n
        for i, (data, fmt) in enumerate(zip(payloads, fmts)):
            if data is None:
                continue
            try:
                img = decode_image(data, fmt)
            except Exception:
                continue
            h = hashlib.md5(repr(img.shape).encode())
            h.update(np.ascontiguousarray(img).tobytes())
            digests[i] = h.hexdigest()
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "pixel_md5": pa.array(digests, pa.string()),
        })


def image_exact_pixel_dups(ds, *, concurrency=(2, 8),
                           batch_size: int = 128,
                           fmt_col: str = "fmt"):
    """Exact pixel-content duplicate groups: actor-pool decode → md5
    of the raw pixel buffer → ONE hash shuffle on the digest →
    (pixel_md5, n_dups, keep_id).  The per-batch digest pass is the
    combiner; the shuffle moves (digest, id) rows only, never pixels
    or payloads."""
    from ray.data.aggregate import Count, Min

    names = ds.schema().names
    cols = ["image_id", "bytes"]
    if fmt_col in names:
        cols.append(fmt_col)
    fps = ds.select_columns(cols).map_batches(
        PixelMD5Extractor,
        fn_constructor_kwargs=dict(fmt_col=fmt_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    def valid(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column("pixel_md5")))

    grouped = fps.map_batches(
        valid, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("pixel_md5").aggregate(
        Count(alias_name="n"), Min("image_id", alias_name="keep_id"))

    def only_dups(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("n"), 1))
        return pa.table({
            "pixel_md5": t.column("pixel_md5"),
            "n_dups": pc.subtract(t.column("n"), 1),
            "keep_id": t.column("keep_id"),
        })

    return grouped.map_batches(only_dups, batch_format="pyarrow",
                               zero_copy_batch=True)


class ExposureExtractor:
    """Actor-pool callable: exposure / color-cast audit per decoded
    image — ``frac_under`` / ``frac_over`` = fraction of gray-plane
    pixels at or below ``lo`` / at or above ``hi`` (histogram-clipping
    detection: a heavily under/over-exposed capture clips into the end
    bins and carries no recoverable detail), and ``cast`` = max minus
    min per-channel mean (a strong single-channel bias = color cast /
    dead sensor channel).  Grayscale images get cast = 0.  Decode
    failures emit NULL metrics (same contract as
    :class:`ImageQualityExtractor`)."""

    def __init__(self, id_col: str = "image_id", bytes_col: str = "bytes",
                 fmt_col: str = "fmt", lo: int = 2, hi: int = 253):
        self.id_col = id_col
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col
        self.lo = lo
        self.hi = hi

    def metrics(self, img: np.ndarray):
        g = img.astype(np.float64)
        if g.ndim == 3:
            ch_means = g.mean(axis=(0, 1))
            cast = float(ch_means.max() - ch_means.min())
            g = g.mean(axis=2)
        else:
            cast = 0.0
        n_px = g.size
        under = float((g <= self.lo).sum()) / n_px
        over = float((g >= self.hi).sum()) / n_px
        return under, over, cast

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        payloads = batch.column(self.bytes_col).to_pylist()
        fmts = (batch.column(self.fmt_col).to_pylist()
                if self.fmt_col in batch.column_names else [None] * n)
        under = np.full(n, np.nan)
        over = np.full(n, np.nan)
        cast = np.full(n, np.nan)
        ok = np.zeros(n, dtype=bool)
        for i, (data, fmt) in enumerate(zip(payloads, fmts)):
            if data is None:
                continue
            try:
                u, o, c = self.metrics(decode_image(data, fmt))
            except Exception:
                continue
            under[i], over[i], cast[i], ok[i] = u, o, c, True
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "frac_under": pa.array(under, pa.float64(), mask=~ok),
            "frac_over": pa.array(over, pa.float64(), mask=~ok),
            "cast": pa.array(cast, pa.float64(), mask=~ok),
        })


def image_exposure_scores(ds, *, concurrency=(2, 8), batch_size: int = 128,
                          fmt_col: str = "fmt", lo: int = 2, hi: int = 253):
    """Per-image (frac_under, frac_over, cast) as a Dataset — the
    exposure-clipping / color-cast screen of an image ingest pipeline
    (pair with an IntervalCheck to quarantine clipped captures)."""
    names = ds.schema().names
    cols = ["image_id", "bytes"]
    if fmt_col in names:
        cols.append(fmt_col)
    return ds.select_columns(cols).map_batches(
        ExposureExtractor,
        fn_constructor_kwargs=dict(fmt_col=fmt_col, lo=lo, hi=hi),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class SSIMExtractor:
    """Actor-pool callable: global SSIM between each decoded payload
    and its reference pixels (Wang et al. 2004, single-window variant
    over the whole gray plane):

        SSIM = ((2·μx·μy + C1)(2·σxy + C2))
             / ((μx² + μy² + C1)(σx² + σy² + C2)),
        C1 = (0.01·255)², C2 = (0.03·255)²

    — the perceptual parity score that complements PSNR (PSNR counts
    absolute error; SSIM tracks structure, catching contrast/luminance
    shifts PSNR under-weights).  Reference pixels regenerate from the
    fixture provider (in production: the reference Lance table).
    Decode/reference failures emit NULL."""

    def __init__(self, reference_seed: int = 42,
                 id_col: str = "image_id", bytes_col: str = "bytes"):
        self.provider = fixture_reference_provider(reference_seed)
        self.id_col = id_col
        self.bytes_col = bytes_col

    @staticmethod
    def ssim(a: np.ndarray, b: np.ndarray) -> float:
        x = a.astype(np.float64)
        y = b.astype(np.float64)
        if x.ndim == 3:
            x = x.mean(axis=2)
        if y.ndim == 3:
            y = y.mean(axis=2)
        if x.shape != y.shape:
            return float("nan")
        c1 = (0.01 * 255.0) ** 2
        c2 = (0.03 * 255.0) ** 2
        mx, my = x.mean(), y.mean()
        vx, vy = x.var(), y.var()
        cxy = ((x - mx) * (y - my)).mean()
        return float(((2.0 * mx * my + c1) * (2.0 * cxy + c2))
                     / ((mx * mx + my * my + c1) * (vx + vy + c2)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch.column(self.id_col).to_pylist()
        payloads = batch.column(self.bytes_col).to_pylist()
        w = (batch.column("w").to_numpy(zero_copy_only=False)
             if "w" in batch.column_names else [None] * n)
        h = (batch.column("h").to_numpy(zero_copy_only=False)
             if "h" in batch.column_names else [None] * n)
        out = np.full(n, np.nan)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            if payloads[i] is None:
                continue
            try:
                img = decode_image(payloads[i])
                ref = self.provider.pixels(ids[i], int(w[i]), int(h[i]))
                if ref is None:
                    continue
                s = self.ssim(img, ref)
            except Exception:
                continue
            if not np.isnan(s):
                out[i], ok[i] = s, True
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "ssim": pa.array(out, pa.float64(), mask=~ok),
        })


def image_ssim_scores(ds, *, reference_seed: int = 42,
                      concurrency=(2, 8), batch_size: int = 128):
    """Per-image global SSIM against the reference as a Dataset — the
    perceptual companion to the PSNR parity check (ImageParityCheck);
    threshold downstream with an IntervalCheck."""
    return ds.select_columns(["image_id", "bytes", "w", "h"]).map_batches(
        SSIMExtractor,
        fn_constructor_kwargs=dict(reference_seed=reference_seed),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class BlurScoreExtractor:
    """Actor-pool callable: decode every payload and emit the variance
    of the 4-neighbour Laplacian of the grayscale image — the classic
    sharpness score (low variance = blurry/flat).  Codec state is
    per-actor; decode failures emit NULL scores (corruption reporting
    belongs to the integrity/parity checks)."""

    def __init__(self, id_col: str = "image_id", bytes_col: str = "bytes",
                 fmt_col: str = "fmt"):
        self.id_col = id_col
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col

    @staticmethod
    def var_laplacian(img: np.ndarray) -> float:
        px = img.astype(np.float64)
        if px.ndim == 3:
            px = px.mean(axis=2)
        if px.shape[0] < 3 or px.shape[1] < 3:
            return 0.0
        lap = (4.0 * px[1:-1, 1:-1] - px[:-2, 1:-1] - px[2:, 1:-1]
               - px[1:-1, :-2] - px[1:-1, 2:])
        return float(lap.var())

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        payloads = batch.column(self.bytes_col).to_pylist()
        fmts = (batch.column(self.fmt_col).to_pylist()
                if self.fmt_col in batch.column_names else [None] * n)
        score = np.full(n, np.nan)
        ok = np.zeros(n, dtype=bool)
        for i, (data, fmt) in enumerate(zip(payloads, fmts)):
            if data is None:
                continue
            try:
                img = decode_image(data, fmt)
            except Exception:
                continue
            score[i] = self.var_laplacian(img)
            ok[i] = True
        out = {self.id_col: batch.column(self.id_col)}
        if self.fmt_col in batch.column_names:
            out[self.fmt_col] = batch.column(self.fmt_col)
        out["var_lap"] = pa.array(score, pa.float64(), mask=~ok)
        return pa.table(out)


def blur_scores(ds, *, concurrency=(2, 8), batch_size: int = 128,
                fmt_col: str = "fmt"):
    """Per-image variance-of-Laplacian sharpness as a Dataset
    (actor-pool decode; bytes never shuffle — the score column is 8
    bytes/row downstream)."""
    names = ds.schema().names
    cols = ["image_id", "bytes"]
    if fmt_col in names:
        cols.append(fmt_col)
    return ds.select_columns(cols).map_batches(
        BlurScoreExtractor,
        fn_constructor_kwargs=dict(fmt_col=fmt_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def blur_audit(ds, *, threshold: float = 25.0, **kwargs):
    """Per-format blur audit over decoded pixels: (fmt, n_images,
    n_decode_fail, n_blurry) with blurry = var_laplacian < threshold.
    The "did a resize/compression job soften everything" screen; at
    corpus scale feed per-format counts into a DomainCheck-style gate.
    """
    from ray.data.aggregate import Count, Sum

    scores = blur_scores(ds, **kwargs)

    def mark(t: pa.Table) -> pa.Table:
        v = t.column("var_lap")
        failed = pc.cast(pc.is_null(v), pa.int64())
        blurry = pc.cast(
            pc.fill_null(pc.less(v, threshold), False), pa.int64())
        return pa.table({
            "fmt": t.column("fmt"),
            "failed": failed,
            "blurry": blurry,
        })

    return scores.map_batches(
        mark, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("fmt").aggregate(
        Count(alias_name="n_images"),
        Sum("failed", alias_name="n_decode_fail"),
        Sum("blurry", alias_name="n_blurry"),
    )


class PayloadEntropyExtractor:
    """Actor-pool callable: per-payload BYTE-level Shannon entropy
    (bits/byte, 0..8) computed straight off the stored bytes -- no
    decode.  Near-8 entropy is what healthy compressed payloads look
    like; low entropy flags padding/truncation/constant fills, and a
    per-format mean shift flags a codec change upstream."""

    def __init__(self, id_col: str = "image_id", bytes_col: str = "bytes",
                 fmt_col: str = "fmt"):
        self.id_col = id_col
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col

    @staticmethod
    def byte_entropy(data: bytes) -> float:
        if not data:
            return 0.0
        arr = np.frombuffer(data, dtype=np.uint8)
        cnt = np.bincount(arr, minlength=256).astype(np.float64)
        p = cnt[cnt > 0] / len(arr)
        return float(-(p * np.log2(p)).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        payloads = batch.column(self.bytes_col).to_pylist()
        ent = np.zeros(n, dtype=np.float64)
        size = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i, data in enumerate(payloads):
            if data is None:
                continue
            ent[i] = self.byte_entropy(data)
            size[i] = len(data)
            ok[i] = True
        out = {self.id_col: batch.column(self.id_col)}
        if self.fmt_col in batch.column_names:
            out[self.fmt_col] = batch.column(self.fmt_col)
        out["entropy"] = pa.array(ent, pa.float64(), mask=~ok)
        out["n_bytes"] = pa.array(size, mask=~ok)
        return pa.table(out)


def payload_entropy_audit(ds, *, low_threshold: float = 6.0,
                          concurrency=(2, 8), batch_size: int = 256,
                          fmt_col: str = "fmt"):
    """Per-format stored-bytes entropy audit: (fmt, n_images, n_null,
    n_low_entropy, mean_entropy round-6) with low = entropy <
    low_threshold bits/byte -- the cheapest corpus-integrity screen
    (no decode, no shuffle of bytes; entropies are 8 bytes/row
    downstream)."""
    from ray.data.aggregate import Count, Sum

    names = ds.schema().names
    cols = ["image_id", "bytes"]
    if fmt_col in names:
        cols.append(fmt_col)
    scores = ds.select_columns(cols).map_batches(
        PayloadEntropyExtractor,
        fn_constructor_kwargs=dict(fmt_col=fmt_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    def mark(t: pa.Table) -> pa.Table:
        e = t.column("entropy")
        return pa.table({
            "fmt": t.column(fmt_col),
            "is_null": pc.cast(pc.is_null(e), pa.int64()),
            "low": pc.cast(pc.fill_null(
                pc.less(e, low_threshold), False), pa.int64()),
            "ent": pc.fill_null(e, 0.0),
        })

    agg = scores.map_batches(
        mark, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("fmt").aggregate(
        Count(alias_name="n_images"),
        Sum("is_null", alias_name="n_null"),
        Sum("low", alias_name="n_low_entropy"),
        Sum("ent", alias_name="_ent_sum"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t.column("n_images").to_numpy(zero_copy_only=False)
        nn = t.column("n_null").to_numpy(zero_copy_only=False)
        es = t.column("_ent_sum").to_numpy(zero_copy_only=False)
        mean = [round(e / (c - u), 6) if c - u > 0 else None
                for e, c, u in zip(es, n, nn)]
        return pa.table({
            "fmt": t.column("fmt"),
            "n_images": t.column("n_images"),
            "n_null": t.column("n_null"),
            "n_low_entropy": t.column("n_low_entropy"),
            "mean_entropy": pa.array(mean, pa.float64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow",
                           zero_copy_batch=True)


def phash_bit_balance(ds, *, hash_col: str = "phash", n_bits: int = 64):
    """Bit-balance audit of a stored perceptual-hash column: per bit
    position, the fraction of rows with that bit set, plus the count
    of DEGENERATE bits (ones-fraction outside [lo, hi] = [0.05, 0.95])
    -- a healthy hash family keeps every bit near 0.5; stuck bits
    shrink the effective Hamming space and silently inflate LSH
    collision rates.

    Fully vectorized bit extraction (uint64 shifts per batch, one
    64-row partial per block).  Output: (bit int64, n int64, ones
    int64, frac round-6), one row per bit.
    """
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        h = t.column(hash_col).to_numpy(zero_copy_only=False)
        h = h[~pa.compute.is_null(t.column(hash_col)).to_numpy(
            zero_copy_only=False)] if t.column(hash_col).null_count \
            else h
        u = h.astype(np.uint64)
        ones = np.array(
            [int(((u >> np.uint64(b)) & np.uint64(1)).sum())
             for b in range(n_bits)], dtype=np.int64)
        return pa.table({
            "bit": pa.array(range(n_bits), pa.int64()),
            "n": pa.array([len(u)] * n_bits, pa.int64()),
            "ones": pa.array(ones),
        })

    agg = ds.select_columns([hash_col]).map_batches(
        partials, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("bit").aggregate(Sum("n", alias_name="n"),
                               Sum("ones", alias_name="ones"))

    def finalize(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        o = t.column("ones").to_numpy(zero_copy_only=False)
        frac = [round(b / a, 6) if a else None for a, b in zip(n, o)]
        return pa.table({
            "bit": t.column("bit"),
            "n": t.column("n"),
            "ones": t.column("ones"),
            "frac": pa.array(frac, pa.float64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow",
                           zero_copy_batch=True).sort("bit")


class TileStatsExtractor:
    """Actor-pool callable: decode each payload and emit the variance
    of a g x g grid of tile means (grayscale) normalized by the global
    pixel variance -- near-0 means illumination/content is uniform
    across the frame; high values flag vignetting, letterboxing
    remnants, watermark corners or split-frame composites."""

    def __init__(self, id_col: str = "image_id", bytes_col: str = "bytes",
                 fmt_col: str = "fmt", grid: int = 4):
        self.id_col = id_col
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col
        self.grid = grid

    @staticmethod
    def tile_nonuniformity(img: np.ndarray, grid: int) -> float:
        px = img.astype(np.float64)
        if px.ndim == 3:
            px = px.mean(axis=2)
        h, w = px.shape
        if h < grid or w < grid:
            return 0.0
        hb = (np.arange(grid + 1) * h) // grid
        wb = (np.arange(grid + 1) * w) // grid
        means = np.array([[px[hb[i]:hb[i + 1], wb[j]:wb[j + 1]].mean()
                           for j in range(grid)] for i in range(grid)])
        gvar = px.var()
        if gvar <= 0:
            return 0.0
        return float(means.var() / gvar)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        payloads = batch.column(self.bytes_col).to_pylist()
        fmts = (batch.column(self.fmt_col).to_pylist()
                if self.fmt_col in batch.column_names else [None] * n)
        score = np.full(n, np.nan)
        ok = np.zeros(n, dtype=bool)
        for i, (data, fmt) in enumerate(zip(payloads, fmts)):
            if data is None:
                continue
            try:
                img = decode_image(data, fmt)
            except Exception:
                continue
            score[i] = self.tile_nonuniformity(img, self.grid)
            ok[i] = True
        out = {self.id_col: batch.column(self.id_col)}
        if self.fmt_col in batch.column_names:
            out[self.fmt_col] = batch.column(self.fmt_col)
        out["tile_nonuniformity"] = pa.array(score, pa.float64(),
                                             mask=~ok)
        return pa.table(out)


def tile_uniformity_audit(ds, *, threshold: float = 0.5, grid: int = 4,
                          concurrency=(2, 8), batch_size: int = 128,
                          fmt_col: str = "fmt"):
    """Per-format tile-uniformity audit over decoded pixels: (fmt,
    n_images, n_decode_fail, n_nonuniform) with nonuniform =
    tile-mean variance > threshold x global pixel variance --
    the spatial-composition counterpart to the exposure and blur
    audits (same actor-pool decode contract)."""
    from ray.data.aggregate import Count, Sum

    names = ds.schema().names
    cols = ["image_id", "bytes"]
    if fmt_col in names:
        cols.append(fmt_col)
    scores = ds.select_columns(cols).map_batches(
        TileStatsExtractor,
        fn_constructor_kwargs=dict(fmt_col=fmt_col, grid=grid),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    def mark(t: pa.Table) -> pa.Table:
        v = t.column("tile_nonuniformity")
        return pa.table({
            "fmt": t.column(fmt_col),
            "failed": pc.cast(pc.is_null(v), pa.int64()),
            "nonuni": pc.cast(pc.fill_null(
                pc.greater(v, threshold), False), pa.int64()),
        })

    return scores.map_batches(
        mark, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("fmt").aggregate(
        Count(alias_name="n_images"),
        Sum("failed", alias_name="n_decode_fail"),
        Sum("nonuni", alias_name="n_nonuniform"),
    )


class GradientOrientationExtractor:
    """Actor-pool callable: decode each payload and emit the 8-bin
    gradient-orientation histogram (HOG-lite) of the grayscale image,
    L1-normalized, plus its entropy -- the texture/structure signature
    that separates flat fills, axis-aligned synthetic art and natural
    gradients without any model."""

    def __init__(self, id_col: str = "image_id", bytes_col: str = "bytes",
                 fmt_col: str = "fmt", bins: int = 8):
        self.id_col = id_col
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col
        self.bins = bins

    @staticmethod
    def orientation_hist(img: np.ndarray, bins: int) -> np.ndarray:
        px = img.astype(np.float64)
        if px.ndim == 3:
            px = px.mean(axis=2)
        gy = px[1:, :-1] - px[:-1, :-1]
        gx = px[:-1, 1:] - px[:-1, :-1]
        mag = np.sqrt(gx * gx + gy * gy)
        ang = np.arctan2(gy, gx)          # [-pi, pi]
        b = np.minimum(((ang + np.pi) / (2 * np.pi) * bins)
                       .astype(np.int64), bins - 1)
        h = np.bincount(b.ravel(), weights=mag.ravel(),
                        minlength=bins)
        s = h.sum()
        return h / s if s > 0 else h

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        payloads = batch.column(self.bytes_col).to_pylist()
        fmts = (batch.column(self.fmt_col).to_pylist()
                if self.fmt_col in batch.column_names else [None] * n)
        hists = np.zeros((n, self.bins))
        ent = np.full(n, np.nan)
        ok = np.zeros(n, dtype=bool)
        for i, (data, fmt) in enumerate(zip(payloads, fmts)):
            if data is None:
                continue
            try:
                img = decode_image(data, fmt)
            except Exception:
                continue
            h = self.orientation_hist(img, self.bins)
            hists[i] = h
            p = h[h > 0]
            ent[i] = float(-(p * np.log2(p)).sum()) if len(p) else 0.0
            ok[i] = True
        out = {self.id_col: batch.column(self.id_col)}
        if self.fmt_col in batch.column_names:
            out[self.fmt_col] = batch.column(self.fmt_col)
        out["orient_entropy"] = pa.array(ent, pa.float64(), mask=~ok)
        out["hist"] = pa.array(
            [list(h) if o else None for h, o in zip(hists, ok)],
            pa.list_(pa.float64()))
        return pa.table(out)


def orientation_profile(ds, *, concurrency=(2, 8),
                        batch_size: int = 128, fmt_col: str = "fmt"):
    """Per-format gradient-orientation profile: mean 8-bin histogram
    (as 8 columns) and mean orientation entropy over decoded pixels --
    a distribution shift here flags a renderer/codec change before
    any labeled metric moves.  Same actor-pool decode contract as the
    other imaging audits; rows-only with numpy parity in tests.

    Output: (fmt, n_images, n_decode_fail, mean_entropy round-6,
    b0..b7 round-6)."""
    from ray.data.aggregate import Count, Sum

    names = ds.schema().names
    cols = ["image_id", "bytes"]
    if fmt_col in names:
        cols.append(fmt_col)
    scores = ds.select_columns(cols).map_batches(
        GradientOrientationExtractor,
        fn_constructor_kwargs=dict(fmt_col=fmt_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    def mark(t: pa.Table) -> pa.Table:
        ent = t.column("orient_entropy")
        hist = t.column("hist")
        hist = hist.combine_chunks() if isinstance(
            hist, pa.ChunkedArray) else hist
        n = t.num_rows
        cols_out = {
            "fmt": t.column(fmt_col),
            "failed": pc.cast(pc.is_null(ent), pa.int64()),
            "ent": pc.fill_null(ent, 0.0),
        }
        mat = np.zeros((n, 8))
        valid = ~pc.is_null(hist).to_numpy(zero_copy_only=False)
        vals = hist.to_pylist()
        for i in np.flatnonzero(valid):
            mat[i] = vals[i]
        for j in range(8):
            cols_out[f"b{j}"] = pa.array(mat[:, j])
        return pa.table(cols_out)

    agg = scores.map_batches(
        mark, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("fmt").aggregate(
        Count(alias_name="n_images"),
        Sum("failed", alias_name="n_decode_fail"),
        Sum("ent", alias_name="_ent"),
        *[Sum(f"b{j}", alias_name=f"_b{j}") for j in range(8)])

    def finalize(t: pa.Table) -> pa.Table:
        n = t.column("n_images").to_numpy(zero_copy_only=False)
        f = t.column("n_decode_fail").to_numpy(zero_copy_only=False)
        good = np.maximum(n - f, 1)
        out = {
            "fmt": t.column("fmt"),
            "n_images": t.column("n_images"),
            "n_decode_fail": t.column("n_decode_fail"),
            "mean_entropy": pa.array(np.round(
                t.column("_ent").to_numpy(zero_copy_only=False)
                / good, 6)),
        }
        for j in range(8):
            out[f"b{j}"] = pa.array(np.round(
                t.column(f"_b{j}").to_numpy(zero_copy_only=False)
                / good, 6))
        return pa.table(out)

    return agg.map_batches(finalize, batch_format="pyarrow",
                           zero_copy_batch=True)
