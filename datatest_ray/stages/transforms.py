"""Multimodal transform stages: decode / resize / feature-extract /
frame-sample over opaque ``binary`` payload columns.

Engine extensions for training-data pipelines (not in the datatest
reference).  Every stage is an ACTOR-POOL ``map_batches`` callable class
— codec state is built once per actor in ``__init__``, work happens per
batch — with small batch sizes because the payload column is wide.

The sandbox has no PIL/ffmpeg: the image path runs fully (the engine's
pure-numpy PNG/lossy codecs from functions/png.py), and the video/audio
paths decode the engine's own GVC1/GAC1 containers (functions/av.py —
per-frame PNG video, int16-PCM audio, pure numpy) end-to-end.
Real-world codec formats (mp4/wav/...) are sniffed by magic
(functions/png.py :: sniff_real_codec): extractors stream past them by
default (``on_unsupported="skip"``) and :class:`CodecSupportCheck`
reports each one as a clean ``check_id='codec_unsupported'`` violation
row — a codec library plugs in at the UnsupportedCodecError seam.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from ..functions.png import decode_image, png_encode
from .base import Check

__all__ = ["ImageResizer", "ImageFeatureExtractor", "FrameSampler",
           "AudioFeatureExtractor", "resize_images",
           "extract_image_features", "sample_frames",
           "extract_audio_features", "ImageContentAuditor",
           "audit_image_content", "aspect_bucket_plan",
           "CodecSupportCheck"]


def _resize_nn(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy)."""
    sh, sw = img.shape[:2]
    yy = (np.arange(h) * sh // h).clip(0, sh - 1)
    xx = (np.arange(w) * sw // w).clip(0, sw - 1)
    return img[np.ix_(yy, xx)]


class ImageResizer:
    """Actor-pool callable: decode -> nearest-neighbor resize -> PNG
    re-encode.  Output schema: (id, bytes, w, h); undecodable payloads
    pass through as null bytes with w=h=0 (they are the decode check's
    problem, not the transform's)."""

    def __init__(self, width: int, height: int, id_col: str = "image_id",
                 bytes_col: str = "bytes"):
        self.width, self.height = width, height
        self.id_col, self.bytes_col = id_col, bytes_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        out = []
        for payload in batch.column(self.bytes_col).to_pylist():
            try:
                img = decode_image(payload)
            except Exception:
                out.append(None)
                continue
            out.append(png_encode(_resize_nn(img, self.width, self.height)))
        ok = [p is not None for p in out]
        return pa.table(
            {
                self.id_col: ids,
                "bytes": pa.array(out, pa.binary()),
                "w": pa.array([self.width if k else 0 for k in ok], pa.int32()),
                "h": pa.array([self.height if k else 0 for k in ok], pa.int32()),
            }
        )


class ImageFeatureExtractor:
    """Actor-pool callable: decode -> 66-dim feature vector
    (64 normalized 8x8 block means + global mean + std).  Output:
    (id, embedding list<float>).  The embedding feeds directly into
    stages/similarity.py (cosine top-k / near-dup) — image near-dup via
    embedding distance."""

    def __init__(self, id_col: str = "image_id", bytes_col: str = "bytes"):
        self.id_col, self.bytes_col = id_col, bytes_col

    @staticmethod
    def features(img: np.ndarray) -> np.ndarray:
        g = img.astype(np.float64)
        if g.ndim == 3:
            g = g.mean(axis=2)
        h, w = g.shape
        h8, w8 = max(h // 8, 1) * 8, max(w // 8, 1) * 8
        if h < 8 or w < 8:
            g = np.kron(g, np.ones((max(1, -(-8 // h)), max(1, -(-8 // w)))))
            h, w = g.shape
            h8, w8 = h // 8 * 8, w // 8 * 8
        g8 = g[:h8, :w8]
        blocks = g8.reshape(8, h8 // 8, 8, w8 // 8).mean(axis=(1, 3))
        feats = np.concatenate([(blocks / 255.0).ravel(),
                                [g.mean() / 255.0, g.std() / 255.0]])
        return feats.astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, vecs = [], []
        id_list = batch.column(self.id_col).to_pylist()
        for i, payload in enumerate(batch.column(self.bytes_col).to_pylist()):
            try:
                img = decode_image(payload)
            except Exception:
                continue
            ids.append(id_list[i])
            vecs.append(self.features(img))
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "embedding": pa.array([v.tolist() for v in vecs],
                                      pa.list_(pa.float32())),
            }
        )


class FrameSampler:
    """Actor-pool callable for VIDEO payloads: sample ``n_frames``
    evenly-spaced frames per clip, emit one row per frame
    (id, frame_idx, bytes).  Payloads in the engine's own GVC1
    container (functions/av.py — per-frame PNG, pure numpy) decode for
    REAL end-to-end; real-world containers (mp4/h264) need a codec
    library absent from this sandbox.  ``on_unsupported`` controls the
    seam: ``"skip"`` (default) streams past the clip so a stray real
    mp4 never kills the pipeline (pair with :class:`CodecSupportCheck`
    to get the clip reported as a ``codec_unsupported`` violation row);
    ``"raise"`` raises the clearly-marked
    :class:`~datatest_ray.functions.png.UnsupportedCodecError` at the
    decoder seam.  ``fake=True`` substitutes a deterministic synthetic
    decoder for plumbing-only tests."""

    def __init__(self, n_frames: int = 4, id_col: str = "video_id",
                 bytes_col: str = "bytes", fake: bool = False,
                 on_unsupported: str = "skip"):
        if on_unsupported not in ("skip", "raise"):
            raise ValueError("on_unsupported must be 'skip' or 'raise'")
        self.n_frames = n_frames
        self.id_col, self.bytes_col = id_col, bytes_col
        self.fake = fake
        self.on_unsupported = on_unsupported

    def _decode_frames(self, payload: bytes) -> list:
        from ..functions.av import GVC_MAGIC, decode_video
        from ..functions.png import UnsupportedCodecError, sniff_real_codec

        if payload[:4] == GVC_MAGIC:
            return decode_video(payload)
        if self.fake:
            rng = np.random.RandomState(len(payload) % (2**31))
            total = 16
            return [rng.randint(0, 256, (8, 8)).astype(np.uint8)
                    for _ in range(total)]
        raise UnsupportedCodecError(
            sniff_real_codec(payload) or "unknown", "video")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.png import UnsupportedCodecError

        ids = batch.column(self.id_col).to_pylist()
        out_id, out_idx, out_bytes = [], [], []
        for i, payload in enumerate(batch.column(self.bytes_col).to_pylist()):
            try:
                frames = self._decode_frames(payload)
            except UnsupportedCodecError:
                if self.on_unsupported == "raise":
                    raise
                continue
            n = len(frames)
            take = np.linspace(0, n - 1, min(self.n_frames, n)).astype(int)
            for j in take:
                out_id.append(ids[i])
                out_idx.append(int(j))
                out_bytes.append(png_encode(frames[j]))
        return pa.table(
            {
                self.id_col: pa.array(out_id),
                "frame_idx": pa.array(out_idx, pa.int32()),
                "bytes": pa.array(out_bytes, pa.binary()),
            }
        )


class AudioFeatureExtractor:
    """Actor-pool callable for AUDIO payloads: decode PCM and emit
    fixed-size per-clip features (duration, RMS energy per band-window).
    Payloads in the engine's own GAC1 container (functions/av.py —
    int16 PCM, pure numpy) decode for REAL end-to-end, using the
    container's embedded sample rate for duration; real-world codecs
    (wav/mp3/flac) need a library absent from this sandbox.
    ``on_unsupported="skip"`` (default) streams past such clips (pair
    with :class:`CodecSupportCheck` for the violation rows);
    ``"raise"`` raises the clearly-marked
    :class:`~datatest_ray.functions.png.UnsupportedCodecError` at the
    decoder seam.  ``fake=True`` substitutes a deterministic synthetic
    PCM decoder for plumbing-only tests."""

    def __init__(self, n_windows: int = 8, sample_rate: int = 16000,
                 id_col: str = "audio_id", bytes_col: str = "bytes",
                 fake: bool = False, on_unsupported: str = "skip"):
        if on_unsupported not in ("skip", "raise"):
            raise ValueError("on_unsupported must be 'skip' or 'raise'")
        self.n_windows = n_windows
        self.sample_rate = sample_rate
        self.id_col, self.bytes_col = id_col, bytes_col
        self.fake = fake
        self.on_unsupported = on_unsupported

    def _decode_pcm(self, payload: bytes):
        from ..functions.av import GAC_MAGIC, decode_audio
        from ..functions.png import UnsupportedCodecError, sniff_real_codec

        if payload[:4] == GAC_MAGIC:
            return decode_audio(payload)
        if self.fake:
            rng = np.random.RandomState(len(payload) % (2**31))
            n = 4000 + (len(payload) % 4000)
            return ((rng.standard_normal(n) * 0.1).astype(np.float32),
                    self.sample_rate)
        raise UnsupportedCodecError(
            sniff_real_codec(payload) or "unknown", "audio")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.png import UnsupportedCodecError

        ids = batch.column(self.id_col).to_pylist()
        out_id, out_dur, out_rms = [], [], []
        for i, payload in enumerate(batch.column(self.bytes_col).to_pylist()):
            try:
                pcm, rate = self._decode_pcm(payload)
            except UnsupportedCodecError:
                if self.on_unsupported == "raise":
                    raise
                continue
            out_id.append(ids[i])
            out_dur.append(len(pcm) / float(rate))
            # RMS energy over n_windows equal slices (pad the tail)
            w = int(np.ceil(len(pcm) / self.n_windows))
            padded = np.zeros(w * self.n_windows, dtype=np.float64)
            padded[: len(pcm)] = pcm
            rms = np.sqrt(
                (padded.reshape(self.n_windows, w) ** 2).mean(axis=1)
            )
            out_rms.append(rms.astype(np.float32).tolist())
        return pa.table(
            {
                self.id_col: pa.array(out_id),
                "duration_s": pa.array(out_dur, pa.float64()),
                "rms": pa.array(
                    out_rms, pa.list_(pa.float32(), self.n_windows)
                ),
            }
        )


def _actor_stage(ds, cls, columns, *, concurrency=4, batch_size=128, **kw):
    return ds.select_columns(columns).map_batches(
        cls, fn_constructor_kwargs=kw, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )


def resize_images(ds, width: int, height: int, *, id_col="image_id",
                  bytes_col="bytes", concurrency=4, batch_size=128):
    return _actor_stage(ds, ImageResizer, [id_col, bytes_col],
                        concurrency=concurrency, batch_size=batch_size,
                        width=width, height=height, id_col=id_col,
                        bytes_col=bytes_col)


def extract_image_features(ds, *, id_col="image_id", bytes_col="bytes",
                           concurrency=4, batch_size=128):
    return _actor_stage(ds, ImageFeatureExtractor, [id_col, bytes_col],
                        concurrency=concurrency, batch_size=batch_size,
                        id_col=id_col, bytes_col=bytes_col)


def sample_frames(ds, n_frames: int = 4, *, id_col="video_id",
                  bytes_col="bytes", fake=False, concurrency=4,
                  batch_size=64):
    return _actor_stage(ds, FrameSampler, [id_col, bytes_col],
                        concurrency=concurrency, batch_size=batch_size,
                        n_frames=n_frames, id_col=id_col,
                        bytes_col=bytes_col, fake=fake)


def extract_audio_features(ds, *, n_windows=8, sample_rate=16000,
                           id_col="audio_id", bytes_col="bytes",
                           fake=False, concurrency=4, batch_size=64):
    return _actor_stage(ds, AudioFeatureExtractor, [id_col, bytes_col],
                        concurrency=concurrency, batch_size=batch_size,
                        n_windows=n_windows, sample_rate=sample_rate,
                        id_col=id_col, bytes_col=bytes_col, fake=fake)


class ImageContentAuditor:
    """Actor-pool callable: decode once, then two content-quality
    signals a 100 TB image corpus needs screened —

    * constant-color BORDERS (letterbox/pillarbox): from each edge,
      count consecutive rows/columns whose pixels all sit within
      ``tol`` of that edge's corner color (vectorized per-row/column
      max-abs-deviation, no pixel loops);
    * DOMINANT-COLOR fraction (flat / solid / low-information
      images): share of pixels equal to the modal 4-bit-quantized
      color.

    Output per row: (id, top, bottom, left, right, border_frac,
    dominant_frac, decode_ok).  Undecodable payloads keep the row
    with decode_ok=false and nulls (the decode CHECK owns those).
    Batch sizes stay small upstream because the payload column is
    wide; per-image work is pure numpy.
    """

    def __init__(self, id_col: str = "image_id",
                 bytes_col: str = "bytes", tol: int = 8):
        self.id_col, self.bytes_col, self.tol = id_col, bytes_col, tol

    @staticmethod
    def _border_len(dev: np.ndarray) -> int:
        """Length of the leading run of True in a 1-D bool array."""
        bad = np.flatnonzero(~dev)
        return int(bad[0]) if bad.size else int(dev.size)

    def audit(self, img: np.ndarray):
        px = img.astype(np.int16)
        if px.ndim == 2:
            px = px[:, :, None]
        h, w = px.shape[:2]
        flat = self.tol

        def run(axis_slices, corner):
            ok = (np.abs(axis_slices - corner).reshape(
                axis_slices.shape[0], -1).max(axis=1) <= flat)
            return self._border_len(ok)

        top = run(px, px[0, 0])
        bottom = run(px[::-1], px[-1, 0])
        left = run(px.transpose(1, 0, 2), px[0, 0])
        right = run(px.transpose(1, 0, 2)[::-1], px[0, -1])
        top, bottom = min(top, h), min(bottom, h)
        left, right = min(left, w), min(right, w)
        core = max(h - min(top + bottom, h), 0) * max(
            w - min(left + right, w), 0)
        border_frac = 1.0 - core / float(h * w)
        q = (px >> 4).reshape(-1, px.shape[2])
        codes = np.zeros(q.shape[0], dtype=np.int64)
        for c in range(q.shape[1]):
            codes = codes * 16 + q[:, c]
        _, counts = np.unique(codes, return_counts=True)
        dominant = counts.max() / float(codes.size)
        return top, bottom, left, right, border_frac, dominant

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        n = batch.num_rows
        cols = {k: np.zeros(n, dtype=np.int64)
                for k in ("top", "bottom", "left", "right")}
        bf = np.zeros(n, dtype=np.float64)
        df = np.zeros(n, dtype=np.float64)
        ok = np.zeros(n, dtype=bool)
        for i, payload in enumerate(batch.column(self.bytes_col)
                                    .to_pylist()):
            try:
                img = decode_image(payload)
            except Exception:
                continue
            (cols["top"][i], cols["bottom"][i], cols["left"][i],
             cols["right"][i], bf[i], df[i]) = self.audit(img)
            ok[i] = True
        mask = ~ok
        return pa.table({
            self.id_col: ids,
            "top": pa.array(cols["top"], pa.int64(), mask=mask),
            "bottom": pa.array(cols["bottom"], pa.int64(), mask=mask),
            "left": pa.array(cols["left"], pa.int64(), mask=mask),
            "right": pa.array(cols["right"], pa.int64(), mask=mask),
            "border_frac": pa.array(bf, pa.float64(), mask=mask),
            "dominant_frac": pa.array(df, pa.float64(), mask=mask),
            "decode_ok": pa.array(ok),
        })


def audit_image_content(ds, *, id_col: str = "image_id",
                        bytes_col: str = "bytes", tol: int = 8,
                        concurrency: int = 4, batch_size: int = 64):
    """Letterbox/flat-image audit as an actor-pool stage (state — the
    codec dispatch — built once per actor; wide payload column kept
    out of every other stage by selecting only (id, bytes) here)."""
    return ds.select_columns([id_col, bytes_col]).map_batches(
        ImageContentAuditor,
        fn_constructor_kwargs={"id_col": id_col, "bytes_col": bytes_col,
                               "tol": tol},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def aspect_bucket_plan(ds, *, w_col: str = "w", h_col: str = "h",
                       ratios=((1, 1), (4, 3), (3, 4), (16, 9), (9, 16)),
                       target_area: int = 1024 * 1024):
    """SDXL-style aspect-ratio bucketing plan from metadata only: each
    image snaps to the ratio bucket nearest in |log(aspect) -
    log(bucket aspect)| (ties to the earlier bucket in ``ratios``), and
    the plan reports per bucket how many images land there plus the
    resize statistics toward the bucket's target_area-preserving
    dimensions -- the batching table an aspect-bucketed trainer needs
    BEFORE any pixels move.

    Pure vectorized metadata pass (no decode, no shuffle beyond one
    tiny groupby).  Output: (bucket string "W:H", n_images int64,
    n_upscale int64 [scale > 1], mean_scale round-6) with scale =
    sqrt(target_area / (w*h)).
    """
    from ray.data.aggregate import Count, Sum

    r = np.array([a / b for a, b in ratios], dtype=np.float64)
    log_r = np.log(r)
    names = [f"{a}:{b}" for a, b in ratios]

    def assign(t: pa.Table) -> pa.Table:
        w = t.column(w_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        h = t.column(h_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        ok = np.isfinite(w) & np.isfinite(h) & (w > 0) & (h > 0)
        w, h = w[ok], h[ok]
        la = np.log(w / h)
        # argmin of |la - log_r| with ties to the earlier ratio
        d = np.abs(la[:, None] - log_r[None, :])
        bucket = np.argmin(d, axis=1)
        scale = np.sqrt(target_area / (w * h))
        return pa.table({
            "bucket": pa.array([names[i] for i in bucket]),
            "one": pa.array(np.ones(len(w), dtype=np.int64)),
            "up": pa.array((scale > 1.0).astype(np.int64)),
            "scale": pa.array(scale),
        })

    agg = ds.select_columns([w_col, h_col]).map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("bucket").aggregate(
        Count(alias_name="n_images"),
        Sum("up", alias_name="n_upscale"),
        Sum("scale", alias_name="_scale_sum"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t.column("n_images").to_numpy(zero_copy_only=False)
        s = t.column("_scale_sum").to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": t.column("bucket"),
            "n_images": t.column("n_images"),
            "n_upscale": t.column("n_upscale"),
            "mean_scale": pa.array(
                [round(x / c, 6) if c else None
                 for x, c in zip(s, n)], pa.float64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow",
                           zero_copy_batch=True)

# ---------------------------------------------------------------------------
# Codec-support screen (round-4 verdict #3)
# ---------------------------------------------------------------------------

_DECODABLE_MAGICS = {
    # magic prefixes the in-sandbox codecs actually decode, per media
    "image": (b"\x89PNG\r\n\x1a\n", b"SJPG", b"SWBP"),
    "video": (b"GVC1",),
    "audio": (b"GAC1",),
}


class CodecSupportCheck(Check):
    """Per-row screen: every payload whose container this engine cannot
    decode becomes a violation row — ``check_id='codec_unsupported'`` /
    kind ``invalid`` when the magic is a RECOGNIZED real-world codec
    (jpeg, mp4, wav, ...; see ``functions/png.sniff_real_codec``), or
    this check's own ``check_id`` / kind ``corrupt`` for garbage magic.

    Pairs with the extractors' default ``on_unsupported="skip"``: the
    feature pipeline streams past undecodable clips, this check reports
    them, and the pipeline COMPLETES instead of dying on a worker-side
    exception the first time a real mp4 shows up.  Stateless prefix
    compares only — no decode work — so it runs as plain task
    ``map_batches``.
    """

    check_id = "av_codec_support"

    def __init__(self, media: str = "image", *, id_col: Optional[str] = None,
                 bytes_col: str = "bytes", check_id: Optional[str] = None,
                 batch_size: int = 256):
        if media not in _DECODABLE_MAGICS:
            raise ValueError(f"media must be one of {sorted(_DECODABLE_MAGICS)}")
        self.media = media
        self.id_col = id_col or {"image": "image_id", "video": "video_id",
                                 "audio": "audio_id"}[media]
        self.bytes_col = bytes_col
        if check_id is not None:
            self.check_id = check_id
        self.batch_size = batch_size
        self.columns = [self.id_col, self.bytes_col]

    def kernel(self, batch: pa.Table, part_col: Optional[str]) -> pa.Table:
        from ..differences import empty_violations, violations_table
        from ..functions.png import sniff_real_codec

        magics = _DECODABLE_MAGICS[self.media]
        ids = batch.column(self.id_col).to_pylist()
        parts = (batch.column(part_col).to_pylist()
                 if part_col and part_col in batch.column_names
                 else [""] * batch.num_rows)
        out_check, out_ref, out_part, out_kind, out_val = [], [], [], [], []
        for i, payload in enumerate(batch.column(self.bytes_col).to_pylist()):
            if payload is None:
                out_check.append(self.check_id)
                out_kind.append("missing")
                out_val.append(None)
            else:
                if any(payload[: len(m)] == m for m in magics):
                    continue
                codec = sniff_real_codec(payload)
                if codec is not None:
                    out_check.append("codec_unsupported")
                    out_kind.append("invalid")
                    out_val.append(f"codec_unsupported:{codec}")
                else:
                    out_check.append(self.check_id)
                    out_kind.append("corrupt")
                    out_val.append("bad_magic")
            out_ref.append(ids[i])
            out_part.append(parts[i])
        if not out_ref:
            return empty_violations()
        expected = "decodable container (" + "|".join(
            m.decode("latin1").strip() for m in magics) + ")"
        return violations_table(
            len(out_ref), check_id=out_check, kind=out_kind,
            partition_id=out_part, row_ref=out_ref, value=out_val,
            expected=expected,
        )

    def violations(self, ds, ctx):
        part_col = getattr(ctx, "partition_col", None)
        cols = list(self.columns)
        names = ds.schema().names
        if part_col and part_col in names and part_col not in cols:
            cols.append(part_col)
        check = self

        def _apply(batch: pa.Table) -> pa.Table:
            return check.kernel(batch, part_col)

        return ds.select_columns(cols).map_batches(
            _apply, batch_format="pyarrow", batch_size=self.batch_size)
