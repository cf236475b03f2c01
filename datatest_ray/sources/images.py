"""Deterministic synthetic image+caption fixture (FIXTURES.md §F1).

Generates the flagship table (BASELINE.json input_hint schema)::

    image_id: string   bytes: binary   w,h: int32   fmt: string
    caption:  string   phash: int64    partition_id: string

Fully seeded and byte-reproducible per (seed, row index) regardless of
how rows are batched across workers — every quantity derives from a
per-row counter-based RNG, so distributed generation is deterministic.

Injected violations (rates are knobs; defaults exercise every check):

* ``p_dup_id``      — duplicate image_id            (uniqueness)
* ``p_corrupt``     — corrupted/truncated payload   (decode / PSNR)
* ``p_lossy_bad``   — over-quantized lossy payload  (PSNR < 40 dB)
* ``p_oob_w``       — w out of [1, 16384]           (interval)
* ``p_null_w``      — null w                        (interval null)
* ``p_bad_fmt``     — fmt outside {jpeg,png,webp}   (set membership)
* ``p_bad_cap``     — caption breaking the regex    (regex)
* ``p_phash_dup``   — near-duplicate pixel field    (phash LSH near-dup)

One designated **drifted partition** (the last one): w/h scaled +25%
so the per-partition KS drift check fails exactly there (expected
verdict computable from the seed).

Generation itself is a Ray Data pipeline (``ray.data.range`` ->
``map_batches``) so large fixture scales use every core; the image
payload is intentionally small (8..48 px) to keep fixture cost
bounded while exercising real codecs.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa

from ..functions.png import lossy_encode, phash64, png_encode, webp_encode

__all__ = ["ImageFixtureSpec", "generate_batch", "generate_dataset", "materialize_fixture"]

_WORDS = (
    "a an the red blue green small large bright dark cat dog bird tree "
    "house car boat sky sea hill field road bridge tower garden market "
    "sitting running flying standing near beside under over with and"
).split()


class ImageFixtureSpec:
    def __init__(
        self,
        n_rows: int,
        seed: int = 42,
        rows_per_part: int = 1000,
        p_dup_id: float = 0.002,
        p_corrupt: float = 0.002,
        p_lossy_bad: float = 0.002,
        p_oob_w: float = 0.002,
        p_null_w: float = 0.001,
        p_bad_fmt: float = 0.003,
        p_bad_cap: float = 0.003,
        p_phash_dup: float = 0.004,
        drift_last_partition: bool = True,
        dim_mu: float = 3.0,
        dim_sigma: float = 0.35,
        dim_lo: int = 8,
        dim_hi: int = 48,
    ):
        self.n_rows = n_rows
        self.seed = seed
        self.rows_per_part = rows_per_part
        self.p_dup_id = p_dup_id
        self.p_corrupt = p_corrupt
        self.p_lossy_bad = p_lossy_bad
        self.p_oob_w = p_oob_w
        self.p_null_w = p_null_w
        self.p_bad_fmt = p_bad_fmt
        self.p_bad_cap = p_bad_cap
        self.p_phash_dup = p_phash_dup
        self.drift_last_partition = drift_last_partition
        self.dim_mu = dim_mu
        self.dim_sigma = dim_sigma
        self.dim_lo = dim_lo
        self.dim_hi = dim_hi

    @property
    def n_parts(self) -> int:
        return max(1, -(-self.n_rows // self.rows_per_part))


def _row_rng(seed: int, i: int) -> np.random.RandomState:
    # counter-based: independent of batching/order
    return np.random.RandomState((seed * 1_000_003 + i) % (2**32))


def reference_pixels(seed: int, i: int, w: int, h: int) -> np.ndarray:
    """The clean pixel field for row i — the decode-parity reference.

    A per-row random 8x8 coarse grid upsampled to (h, w) plus mild
    noise: every image has a DISTINCTIVE coarse structure, so phash
    bits are effectively row-random (unrelated images sit at Hamming
    ~32) while jittered near-duplicate copies stay within a few bits.
    (A shared structure — e.g. one global gradient — would make every
    image a perceptual near-dup of every other and blow up the LSH
    near-dup check.)"""
    rng = np.random.RandomState((seed * 2_000_003 + i) % (2**32))
    coarse = rng.randint(0, 256, (8, 8)).astype(np.float64)
    yy = (np.arange(h) * 8 // max(h, 1)).clip(0, 7)
    xx = (np.arange(w) * 8 // max(w, 1)).clip(0, 7)
    base = coarse[np.ix_(yy, xx)]
    noise = rng.normal(0, 6, (h, w))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def _caption(rng: np.random.RandomState) -> str:
    k = rng.randint(4, 9)
    return " ".join(_WORDS[j] for j in rng.randint(0, len(_WORDS), k))


def reference_caption(seed: int, i: int) -> str:
    """The clean caption for row i — its own counter-based stream, so a
    reference provider can regenerate it for exact-equality parity."""
    return _caption(np.random.RandomState((seed * 3_000_017 + i) % (2**32)))


def generate_batch(indices: np.ndarray, spec: ImageFixtureSpec,
                   columns=None) -> pa.Table:
    """Generate rows for the given global indices (deterministic).

    ``columns`` prunes generation work at the SOURCE (read-level
    pruning for a synthetic source): payload encode and caption text
    are skipped when not requested — but every draw on the row RNG
    still happens in the same order, so pruned and full generation
    emit bitwise-identical values for the shared columns (pinned by
    test_transforms.py).  Pixel synthesis is kept whenever ``bytes``
    or ``phash`` is needed."""
    want = set(columns) if columns is not None else None

    def need(c):
        return want is None or c in want

    want_bytes = need("bytes")
    want_pixels = want_bytes or need("phash")
    seed = spec.seed
    drift_part = spec.n_parts - 1 if spec.drift_last_partition else -1
    ids, payloads, ws, hs, fmts, caps, phashes, parts = [], [], [], [], [], [], [], []
    for i in indices:
        i = int(i)
        rng = _row_rng(seed, i)
        part = i // spec.rows_per_part
        # dimensions: log-normal-ish in [dim_lo, dim_hi] (spec knobs —
        # tests keep small payloads; BENCH uses realistic image sizes so
        # decode work dominates, as in the north-star workload)
        scale = 1.25 if part == drift_part else 1.0
        w = int(np.clip(np.exp(rng.normal(spec.dim_mu, spec.dim_sigma)) * scale,
                        spec.dim_lo, spec.dim_hi))
        h = int(np.clip(np.exp(rng.normal(spec.dim_mu, spec.dim_sigma)) * scale,
                        spec.dim_lo, spec.dim_hi))

        near_dup_of = None
        if rng.rand() < spec.p_phash_dup and i > 0:
            near_dup_of = rng.randint(0, i)
        if near_dup_of is not None:
            src_rng = _row_rng(seed, near_dup_of)
            src_part = near_dup_of // spec.rows_per_part
            s_scale = 1.25 if src_part == drift_part else 1.0
            w = int(np.clip(np.exp(src_rng.normal(spec.dim_mu, spec.dim_sigma)) * s_scale,
                            spec.dim_lo, spec.dim_hi))
            h = int(np.clip(np.exp(src_rng.normal(spec.dim_mu, spec.dim_sigma)) * s_scale,
                            spec.dim_lo, spec.dim_hi))
            pixels = reference_pixels(seed, near_dup_of, w, h)
            jitter = rng.randint(-2, 3, pixels.shape)
            pixels = np.clip(pixels.astype(np.int32) + jitter, 0, 255).astype(np.uint8)
        else:
            pixels = reference_pixels(seed, i, w, h)

        r = rng.rand()
        if r < 0.90:
            fmt = "jpeg"
        elif r < 0.99:
            fmt = "png"
        else:
            fmt = "webp"
        stored = pixels  # what a decoder will actually reconstruct
        payload = b""
        if fmt == "jpeg":
            q = 16 if rng.rand() < spec.p_lossy_bad else 4
            if want_bytes:
                payload = lossy_encode(pixels, q)
            if want_pixels:
                stored = ((pixels.astype(np.int32) + q // 2) // q * q).clip(0, 255).astype(np.uint8)
        elif fmt == "png":
            if want_bytes:
                payload = png_encode(pixels)
        else:
            if want_bytes:
                payload = webp_encode(pixels)

        if rng.rand() < spec.p_corrupt:
            mode = rng.randint(3)
            if mode == 0:
                payload = payload[: max(8, len(payload) // 2)]  # truncate
            elif mode == 1:
                payload = b"CORRUPTED" + payload[9:] if payload else payload
            else:
                payload = payload[:16] + b"\x00\x00\x00\x00" + payload[20:]

        image_id = f"img_{i:012d}"
        if rng.rand() < spec.p_dup_id and i > 0:
            image_id = f"img_{rng.randint(0, i):012d}"

        w_out: Optional[int] = w
        if rng.rand() < spec.p_oob_w:
            w_out = int(rng.choice([0, -1, 1_000_000]))
        elif rng.rand() < spec.p_null_w:
            w_out = None

        if rng.rand() < spec.p_bad_fmt:
            fmt = str(rng.choice(["jpg ", "JPEG", ""]))

        # caption text rides its own counter-based stream — skipping it
        # cannot shift the row RNG; the p_bad_cap draw still happens
        cap = reference_caption(seed, i) if need("caption") else ""
        if rng.rand() < spec.p_bad_cap:
            bad = rng.choice(["", "bad\x01caption", "naughty\ttab"])
            if need("caption"):
                cap = str(bad)

        ids.append(image_id)
        payloads.append(payload)
        ws.append(w_out)
        hs.append(h)
        fmts.append(fmt)
        caps.append(cap)
        # phash of the STORED image; skipped only when neither bytes
        # nor phash is requested (pixel synthesis itself always runs —
        # the near-dup jitter draw depends on the pixel shape)
        phashes.append(int(phash64(stored)) if want_pixels else 0)
        parts.append(f"part_{part:05d}")

    full = {
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(payloads, pa.binary()),
        "w": pa.array(ws, pa.int32()),
        "h": pa.array(hs, pa.int32()),
        "fmt": pa.array(fmts, pa.string()),
        "caption": pa.array(caps, pa.string()),
        "phash": pa.array(phashes, pa.int64()),
        "partition_id": pa.array(parts, pa.string()),
    }
    if want is not None:
        full = {k: v for k, v in full.items() if k in want}
    return pa.table(full)


def generate_dataset(spec: ImageFixtureSpec, parallelism: int = -1,
                     columns=None):
    """Distributed fixture generation as a Ray Data pipeline.
    ``columns`` prunes generation work at the source (see
    :func:`generate_batch`)."""
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        return generate_batch(batch.column("id").to_numpy(), spec,
                              columns=columns)

    ds = rd.range(spec.n_rows, override_num_blocks=parallelism if parallelism > 0 else None)
    return ds.map_batches(gen, batch_format="pyarrow", batch_size=512)


def materialize_fixture(path: str, spec: ImageFixtureSpec) -> str:
    """Write the fixture as partitioned parquet (one dir per run spec);
    returns the path.  Skips generation when already present (the layout
    is deterministic in (seed, n_rows, knobs))."""
    marker = os.path.join(path, "_FIXTURE_OK")
    if os.path.exists(marker):
        return path
    os.makedirs(path, exist_ok=True)
    ds = generate_dataset(spec)
    ds.write_parquet(path)
    with open(marker, "w") as f:
        f.write(f"n_rows={spec.n_rows} seed={spec.seed}\n")
    return path
