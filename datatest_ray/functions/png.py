"""Pure-numpy image codecs + pixel kernels (no PIL in the sandbox).

Flagship payload support (BASELINE.json input_hint; SURVEY.md §2.I):

* a real, spec-conformant **PNG** encoder/decoder (8-bit grayscale or
  RGB; zlib + struct only; decoder handles filter types 0-4) for rows
  with ``fmt='png'``;
* a deterministic **synthetic lossy codec** ("jpeg-like": uniform pixel
  quantization, container ``SJPG``) whose reconstruction error lands
  just above the PSNR>=40 dB parity bar for quantization step 4 — so
  the decoded-pixel-parity check is meaningful on lossy rows;
* a trivial ``SWBP`` container for ``fmt='webp'`` (lossless, zlib);
* PSNR and a DCT-free 64-bit perceptual hash (8x8 block-mean vs median)
  used by the phash uniqueness / Hamming-collision checks.

Everything is deterministic and seed-reproducible (FIXTURES.md).
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional

import numpy as np

__all__ = [
    "png_encode",
    "png_decode",
    "lossy_encode",
    "lossy_decode",
    "webp_encode",
    "webp_decode",
    "decode_image",
    "container_scan",
    "sniff_real_codec",
    "UnsupportedCodecError",
    "psnr",
    "phash64",
    "dhash64",
    "hamming64",
]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


class UnsupportedCodecError(NotImplementedError, ValueError):
    """A payload whose container magic IS a recognized real-world codec
    (jpeg, mp4, wav, ...) that this sandbox has no decode library for.

    Distinct from a corrupt/garbage payload: the data is probably fine,
    the engine just can't decode it here.  Checks report it as a clean
    ``check_id='codec_unsupported'`` violation row instead of letting a
    worker-side exception kill the pipeline (round-4 verdict item #3).
    Subclasses ``NotImplementedError`` (the historical seam contract)
    and ``ValueError`` (so generic decode-error handlers still catch).
    """

    def __init__(self, codec: str, media: str = "image"):
        self.codec = codec
        self.media = media
        super().__init__(
            f"codec_unsupported:{codec} — real-world {media} container "
            f"recognized but no codec library is available in-sandbox; "
            f"plug a decoder in at this seam"
        )


def sniff_real_codec(data: bytes) -> Optional[str]:
    """Identify a real-world media container by magic, or None.

    Only unambiguous signatures (no mp3 frame-sync heuristics — a
    corrupt payload must keep reporting as corrupt, not as mp3).
    """
    if len(data) < 12:
        return None
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if data[:2] == b"BM" and len(data) >= 14:
        return "bmp"
    if data[:4] == b"RIFF":
        sub = data[8:12]
        if sub == b"WEBP":
            return "webp-real"
        if sub == b"WAVE":
            return "wav"
        if sub == b"AVI ":
            return "avi"
        return "riff"
    if data[4:8] == b"ftyp":
        brand = data[8:12]
        if brand[:3] == b"hei" or brand == b"mif1":
            return "heic"
        if brand == b"avif":
            return "avif"
        if brand == b"qt  ":
            return "mov"
        return "mp4"
    if data[:4] == b"\x1aE\xdf\xa3":
        return "mkv"
    if data[:4] == b"fLaC":
        return "flac"
    if data[:4] == b"OggS":
        return "ogg"
    if data[:3] == b"ID3":
        return "mp3"
    return None


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray) -> bytes:
    """Encode HxW (grayscale) or HxWx3 (RGB) uint8 -> PNG bytes
    (filter type 0 on every scanline)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, channels = 0, 1
        h, w = img.shape
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, channels = 2, 3
        h, w = img.shape[:2]
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    rows = img.reshape(h, w * channels)
    raw = np.zeros((h, w * channels + 1), dtype=np.uint8)
    raw[:, 1:] = rows
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa_, pb, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc_), a, np.where(pb <= pc_, b, c))
    return out.astype(np.uint8)


def png_decode(data: bytes) -> np.ndarray:
    """Decode PNG bytes -> HxW or HxWx3 uint8.  Supports 8-bit
    grayscale/RGB, filters 0-4, no interlace."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    color_type = bit_depth = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if bit_depth != 8 or color_type not in (0, 2) or interlace:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    channels = 1 if color_type == 0 else 3
    stride = w * channels
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG payload")
    raw = raw.reshape(h, stride + 1)
    filters = raw[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels
    for y in range(h):
        f = filters[y]
        line = raw[y, 1:].copy()
        prior = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = line
        elif f == 1:  # Sub
            for x in range(stride):
                left = out[y, x - bpp] if x >= bpp else 0
                out[y, x] = (int(line[x]) + int(left)) & 0xFF
        elif f == 2:  # Up
            out[y] = (line.astype(np.int16) + prior.astype(np.int16)).astype(np.uint8)
        elif f == 3:  # Average
            for x in range(stride):
                left = int(out[y, x - bpp]) if x >= bpp else 0
                out[y, x] = (int(line[x]) + ((left + int(prior[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                left = int(out[y, x - bpp]) if x >= bpp else 0
                ul = int(prior[x - bpp]) if x >= bpp else 0
                out[y, x] = (
                    int(line[x]) + int(_paeth(
                        np.uint8(left), prior[x : x + 1][0], np.uint8(ul)
                    ))
                ) & 0xFF
        else:
            raise ValueError(f"bad filter {f}")
    if channels == 1:
        return out.reshape(h, w)
    return out.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# Synthetic lossy ("jpeg-like") + lossless ("webp-like") containers
# ---------------------------------------------------------------------------


def lossy_encode(img: np.ndarray, q: int = 4) -> bytes:
    """Deterministic lossy: quantize pixels to multiples of ``q`` then
    zlib.  q=4 -> reconstruction PSNR ~ 44-47 dB (above the 40 dB bar);
    q=16 -> ~32 dB (below it, for negative fixtures)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    quant = ((img.astype(np.int32) + q // 2) // q * q).clip(0, 255).astype(np.uint8)
    ndim = img.ndim
    h, w = img.shape[:2]
    header = struct.pack(">4sBBHHB", b"SJPG", 1, ndim, w, h, q)
    return header + zlib.compress(quant.tobytes(), 6)


def lossy_decode(data: bytes) -> np.ndarray:
    magic, _ver, ndim, w, h, _q = struct.unpack(">4sBBHHB", data[:11])
    if magic != b"SJPG":
        raise ValueError("not SJPG")
    raw = np.frombuffer(zlib.decompress(data[11:]), dtype=np.uint8)
    if ndim == 2:
        return raw.reshape(h, w)
    return raw.reshape(h, w, 3)


def webp_encode(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    header = struct.pack(">4sBBHH", b"SWBP", 1, img.ndim, w, h)
    return header + zlib.compress(img.tobytes(), 6)


def webp_decode(data: bytes) -> np.ndarray:
    magic, _ver, ndim, w, h = struct.unpack(">4sBBHH", data[:10])
    if magic != b"SWBP":
        raise ValueError("not SWBP")
    raw = np.frombuffer(zlib.decompress(data[10:]), dtype=np.uint8)
    if ndim == 2:
        return raw.reshape(h, w)
    return raw.reshape(h, w, 3)


def decode_image(data: bytes, fmt: Optional[str] = None) -> np.ndarray:
    """Dispatch on container magic (fmt hint is advisory only —
    mismatched fmt columns must not break decode)."""
    if data[:8] == _PNG_SIG:
        return png_decode(data)
    if data[:4] == b"SJPG":
        return lossy_decode(data)
    if data[:4] == b"SWBP":
        return webp_decode(data)
    codec = sniff_real_codec(data)
    if codec is not None:
        raise UnsupportedCodecError(codec, "image")
    raise ValueError(f"unknown image container (fmt hint {fmt!r})")


# ---------------------------------------------------------------------------
# Pixel kernels
# ---------------------------------------------------------------------------


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    if a.shape != b.shape:
        return 0.0
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0 * 255.0 / mse))


def phash64(img: np.ndarray) -> np.int64:
    """64-bit perceptual hash: 8x8 block means vs their median.
    Deterministic; near-duplicate images share most bits."""
    g = img.astype(np.float64)
    if g.ndim == 3:
        g = g.mean(axis=2)
    h, w = g.shape
    # crop to multiples of 8 then block-average to 8x8
    h8, w8 = max(h // 8, 1) * 8, max(w // 8, 1) * 8
    if h < 8 or w < 8:
        # tiny image: resize by repetition
        g = np.kron(g, np.ones((max(1, -(-8 // h)), max(1, -(-8 // w)))))
        h, w = g.shape
        h8, w8 = h // 8 * 8, w // 8 * 8
    g = g[:h8, :w8]
    blocks = g.reshape(8, h8 // 8, 8, w8 // 8).mean(axis=(1, 3))
    med = np.median(blocks)
    bits = (blocks > med).flatten()
    val = np.uint64(0)
    for i, b in enumerate(bits):
        if b:
            val |= np.uint64(1) << np.uint64(i)
    return np.int64(val.astype(np.int64))


def hamming64(a, b) -> np.ndarray:
    """Vectorized Hamming distance between int64 phashes."""
    x = (np.asarray(a, dtype=np.int64).view(np.uint64)
         ^ np.asarray(b, dtype=np.int64).view(np.uint64))
    # popcount via bit tricks (no np.popcount in this numpy)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    with np.errstate(over="ignore"):  # uint64 wraparound is the algorithm
        return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def container_scan(data: bytes):
    """Cheap STRUCTURAL validation without pixel decode: verify the
    container magic, chunk framing and (for PNG) per-chunk CRCs, and
    read the header-declared dimensions.  Orders of magnitude cheaper
    than ``decode_image`` (no inflate, no filter reconstruction) — the
    first-line corruption screen a 10^12-image validation run applies
    before spending decode cycles.

    Returns ``(fmt, w, h, err)``: detected container name (or None),
    header dims (or None), and an error string (None when sound).
    """
    if len(data) < 10:
        return None, None, None, "truncated:header"
    if data[:8] == _PNG_SIG:
        pos = 8
        w = h = None
        saw_end = False
        while pos + 8 <= len(data):
            (length,) = struct.unpack(">I", data[pos:pos + 4])
            tag = data[pos + 4:pos + 8]
            end = pos + 8 + length
            if end + 4 > len(data):
                return "png", w, h, "truncated:chunk"
            payload = data[pos + 8:end]
            (crc,) = struct.unpack(">I", data[end:end + 4])
            if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
                return "png", w, h, f"bad_crc:{tag.decode('latin1')}"
            if tag == b"IHDR":
                w, h = struct.unpack(">II", payload[:8])
            if tag == b"IEND":
                saw_end = True
                break
            pos = end + 4
        if w is None:
            return "png", None, None, "missing:IHDR"
        if not saw_end:
            return "png", w, h, "missing:IEND"
        return "png", int(w), int(h), None
    if data[:4] == b"SJPG":
        if len(data) < 11:
            return "jpeg", None, None, "truncated:header"
        _, _ver, _ndim, w, h, _q = struct.unpack(">4sBBHHB", data[:11])
        return "jpeg", int(w), int(h), None
    if data[:4] == b"SWBP":
        if len(data) < 10:
            return "webp", None, None, "truncated:header"
        _, _ver, _ndim, w, h = struct.unpack(">4sBBHH", data[:10])
        return "webp", int(w), int(h), None
    codec = sniff_real_codec(data)
    if codec is not None:
        # recognized real-world codec, no in-sandbox decoder: report a
        # self-describing unsupported-codec error, not generic bad_magic
        return codec, None, None, f"codec_unsupported:{codec}"
    return None, None, None, "bad_magic"


def dhash64(img: np.ndarray) -> np.int64:
    """64-bit DIFFERENCE hash: area-average to an 8x9 grid of cell
    means, take the horizontal gradient sign (cell[r, c+1] > cell[r, c])
    — a second, independent perceptual-fingerprint family alongside
    :func:`phash64` (median hash).  Gradient hashes are robust to
    global brightness/contrast shifts that flip median-hash bits.

    Cell means come from one integral image with floor-divided grid
    boundaries, so any input size maps deterministically; tiny images
    are repeated up to the grid size first."""
    g = img.astype(np.float64)
    if g.ndim == 3:
        g = g.mean(axis=2)
    h, w = g.shape
    if h < 8 or w < 9:
        g = np.kron(g, np.ones((-(-8 // max(h, 1)), -(-9 // max(w, 1)))))
        h, w = g.shape
    integral = np.zeros((h + 1, w + 1))
    integral[1:, 1:] = g.cumsum(0).cumsum(1)
    rb = (np.arange(9) * h) // 8
    cb = (np.arange(10) * w) // 9
    s = integral[rb][:, cb]
    area = np.outer(np.diff(rb), np.diff(cb)).astype(np.float64)
    cells = (s[1:, 1:] - s[:-1, 1:] - s[1:, :-1] + s[:-1, :-1]) / area
    bits = (cells[:, 1:] > cells[:, :-1]).flatten()
    val = np.uint64(0)
    for i, b in enumerate(bits):
        if b:
            val |= np.uint64(1) << np.uint64(i)
    return np.int64(val.astype(np.int64))
