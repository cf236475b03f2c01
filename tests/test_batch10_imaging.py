"""Session-9 batch 10 (image): exact pixel-content dedup across
different encodings of the same pixels."""

import struct
import zlib

import numpy as np
import pyarrow as pa

from datatest_ray.functions.png import _PNG_SIG, _chunk, png_encode


def _png_encode_level9(img: np.ndarray) -> bytes:
    """Same pixels as png_encode but a different zlib level — byte
    stream differs, decoded pixels identical."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    color_type, channels = (0, 1) if img.ndim == 2 else (2, 3)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    rows = img.reshape(h, w * channels)
    raw = np.zeros((h, w * channels + 1), dtype=np.uint8)
    raw[:, 1:] = rows
    idat = zlib.compress(raw.tobytes(), 9)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def _ds(table: pa.Table):
    import ray.data as rd

    return rd.from_arrow(table)


class TestImageExactPixelDups:
    def test_reencoded_same_pixels_found(self, ray_session):
        from datatest_ray.stages.imaging import image_exact_pixel_dups

        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
                for _ in range(6)]
        ids, blobs = [], []
        for i, img in enumerate(imgs):
            ids.append(f"img{i:03d}")
            blobs.append(png_encode(img))
        # re-encode images 0 and 3 at a different zlib level: bytes
        # differ, pixels identical
        for i in (0, 3):
            ids.append(f"img{i:03d}_re")
            blobs.append(_png_encode_level9(imgs[i]))
            assert blobs[-1] != blobs[i]  # genuinely different bytes
        t = pa.table({
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "fmt": pa.array(["png"] * len(ids), pa.string()),
        })
        out = image_exact_pixel_dups(
            _ds(t), concurrency=(1, 2), batch_size=4).to_pandas()
        assert len(out) == 2
        assert set(out["keep_id"]) == {"img000", "img003"}
        assert (out["n_dups"] == 1).all()

    def test_distinct_pixels_no_dups_and_corrupt_skipped(
            self, ray_session):
        from datatest_ray.stages.imaging import image_exact_pixel_dups

        rng = np.random.default_rng(1)
        t = pa.table({
            "image_id": pa.array(["a", "b", "bad"], pa.string()),
            "bytes": pa.array(
                [png_encode(rng.integers(0, 255, (8, 8)).astype(
                    np.uint8)),
                 png_encode(rng.integers(0, 255, (8, 8)).astype(
                     np.uint8)),
                 b"not a png at all"], pa.binary()),
            "fmt": pa.array(["png", "png", "png"], pa.string()),
        })
        out = image_exact_pixel_dups(
            _ds(t), concurrency=(1, 2), batch_size=4).to_pandas()
        assert len(out) == 0
