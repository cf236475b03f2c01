"""Deterministic pure-numpy audio/video container codecs.

The sandbox has no ffmpeg/PIL, so real-world containers (mp4/h264,
wav/mp3) cannot be decoded here.  Instead of leaving the video/audio
stages as bare ``NotImplementedError`` stubs, this module defines two
tiny self-describing container formats the engine can ENCODE and DECODE
end-to-end with numpy only — so the actor-pool plumbing (schema,
explode layout, framing arithmetic) exercises a REAL decode path in
tests and fixtures, and a production deployment only needs to swap the
codec behind the same byte-payload interface:

* ``GVC1`` (graft video container): magic + frame count + per-frame
  byte lengths + concatenated PNG payloads (the engine's own pure-numpy
  PNG codec from functions/png.py).
* ``GAC1`` (graft audio container): magic + sample rate + sample count
  + little-endian int16 PCM.

Both are versioned by magic; unknown magics still raise
``NotImplementedError`` in the transform stages, which keeps the
"plug a real codec here" seam explicit.
"""

from __future__ import annotations

import struct

import numpy as np

from .png import decode_image, png_encode

GVC_MAGIC = b"GVC1"
GAC_MAGIC = b"GAC1"

__all__ = ["GVC_MAGIC", "GAC_MAGIC", "encode_video", "decode_video",
           "encode_audio", "decode_audio", "synthetic_clip",
           "synthetic_pcm"]


def encode_video(frames) -> bytes:
    """Encode a list of HxW / HxWx3 uint8 frames into a GVC1 payload."""
    payloads = [png_encode(np.asarray(f, dtype=np.uint8)) for f in frames]
    head = GVC_MAGIC + struct.pack("<I", len(payloads))
    head += b"".join(struct.pack("<I", len(p)) for p in payloads)
    return head + b"".join(payloads)


def decode_video(payload: bytes) -> list:
    """Decode a GVC1 payload into its list of uint8 frame arrays."""
    if payload[:4] != GVC_MAGIC:
        raise ValueError("not a GVC1 payload")
    (n,) = struct.unpack_from("<I", payload, 4)
    lens = struct.unpack_from(f"<{n}I", payload, 8)
    off = 8 + 4 * n
    frames = []
    for ln in lens:
        frames.append(decode_image(payload[off:off + ln]))
        off += ln
    return frames


def encode_audio(pcm, sample_rate: int = 16000) -> bytes:
    """Encode float32 PCM in [-1, 1] into a GAC1 payload (int16)."""
    pcm = np.asarray(pcm, dtype=np.float64)
    q = np.clip(np.round(pcm * 32767.0), -32768, 32767).astype("<i2")
    return (GAC_MAGIC + struct.pack("<II", int(sample_rate), len(q))
            + q.tobytes())


def decode_audio(payload: bytes):
    """Decode a GAC1 payload -> (float32 PCM in [-1, 1], sample_rate)."""
    if payload[:4] != GAC_MAGIC:
        raise ValueError("not a GAC1 payload")
    rate, n = struct.unpack_from("<II", payload, 4)
    pcm = np.frombuffer(payload, dtype="<i2", count=n, offset=12)
    return (pcm.astype(np.float32) / 32767.0), int(rate)


def synthetic_clip(seed: int, n_frames: int = 16, w: int = 16,
                   h: int = 16) -> bytes:
    """Deterministic GVC1 test clip: a bright block drifting across a
    seeded noise background — consecutive frames are near-duplicates,
    so frame-sampling and frame-level near-dup checks have structure
    to find."""
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 128, (h, w)).astype(np.uint8)
    frames = []
    for t in range(n_frames):
        f = base.copy()
        x = (t * max(1, w // n_frames)) % max(1, w - 4)
        f[2:6, x:x + 4] = 255
        frames.append(f)
    return encode_video(frames)


def synthetic_pcm(seed: int, n: int = 8000, sample_rate: int = 16000,
                  freq: float = 440.0) -> bytes:
    """Deterministic GAC1 test clip: a seeded-phase sine plus low
    noise, so RMS windows are non-trivial but reproducible."""
    rng = np.random.RandomState(seed)
    t = np.arange(n, dtype=np.float64) / sample_rate
    phase = rng.uniform(0, 2 * np.pi)
    pcm = 0.5 * np.sin(2 * np.pi * freq * t + phase)
    pcm += 0.01 * rng.standard_normal(n)
    return encode_audio(np.clip(pcm, -1, 1), sample_rate)
