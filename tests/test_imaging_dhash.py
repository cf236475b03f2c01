"""dhash64 + pixel-derived fingerprint stage (stages/imaging.py)."""

import numpy as np
import pyarrow as pa


def _collect(ds):
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    return pa.concat_tables(batches) if batches else None


class TestDhash64:
    def test_matches_naive_reference(self):
        from datatest_ray.functions.png import dhash64

        rng = np.random.default_rng(3)
        for shape in [(16, 18), (32, 45, 3), (8, 9), (40, 33, 3)]:
            img = rng.integers(0, 256, shape).astype(np.uint8)
            g = img.astype(np.float64)
            if g.ndim == 3:
                g = g.mean(axis=2)
            h, w = g.shape
            rb = (np.arange(9) * h) // 8
            cb = (np.arange(10) * w) // 9
            cells = np.zeros((8, 9))
            for r in range(8):
                for c in range(9):
                    cells[r, c] = g[rb[r]:rb[r + 1], cb[c]:cb[c + 1]].mean()
            bits = (cells[:, 1:] > cells[:, :-1]).flatten()
            want = 0
            for i, b in enumerate(bits):
                if b:
                    want |= 1 << i
            assert int(dhash64(img)) & ((1 << 64) - 1) == want

    def test_invariances(self):
        from datatest_ray.functions.png import dhash64, hamming64

        rng = np.random.default_rng(4)
        img = rng.integers(40, 216, (24, 30, 3)).astype(np.uint8)
        # global brightness shift leaves every gradient sign unchanged
        brighter = np.clip(img.astype(np.int32) + 30, 0, 255).astype(np.uint8)
        assert int(hamming64(dhash64(img), dhash64(brighter))[()]) <= 2
        # small jitter stays close; unrelated content is far
        jit = np.clip(img.astype(np.int32)
                      + rng.integers(-2, 3, img.shape), 0, 255).astype(np.uint8)
        other = rng.integers(0, 256, (24, 30, 3)).astype(np.uint8)
        assert int(hamming64(dhash64(img), dhash64(jit))[()]) <= 4
        assert int(hamming64(dhash64(img), dhash64(other))[()]) >= 16

    def test_tiny_images_dont_crash(self):
        from datatest_ray.functions.png import dhash64

        assert int(dhash64(np.ones((1, 1)))) == 0
        assert int(dhash64(np.zeros((2, 3, 3)))) == 0


class TestPixelFingerprints:
    def test_decode_roundtrip_and_null_on_corrupt(self, ray_session):
        import ray.data as rd

        from datatest_ray.functions.png import dhash64, png_encode
        from datatest_ray.stages.imaging import pixel_fingerprints

        rng = np.random.default_rng(5)
        imgs = [rng.integers(0, 256, (12, 14, 3)).astype(np.uint8)
                for _ in range(3)]
        rows = {
            "image_id": ["img_0001", "img_0002", "img_0003", "img_0004"],
            "bytes": [png_encode(i) for i in imgs] + [b"not an image"],
            "fmt": ["png"] * 4,
        }
        out = _collect(pixel_fingerprints(
            rd.from_arrow(pa.table(rows)), algo="dhash",
            concurrency=2, batch_size=2)).sort_by("image_id")
        got = out.column("phash").to_pylist()
        assert got[:3] == [int(dhash64(i)) for i in imgs]
        assert got[3] is None

    def test_pixel_dup_clusters_find_planted_neardups(self, ray_session):
        from datatest_ray.sources.images import (ImageFixtureSpec,
                                                 generate_dataset)
        from datatest_ray.stages.imaging import image_pixel_dup_clusters

        spec = ImageFixtureSpec(n_rows=600, seed=42, rows_per_part=200,
                                p_phash_dup=0.05)
        ds = generate_dataset(spec, columns={"image_id", "bytes", "fmt"})
        t = _collect(image_pixel_dup_clusters(ds, algo="dhash",
                                              threshold=4, mode="sampled"))
        assert t is not None and t.num_rows > 0
        # every cluster has >= 2 members and the planted dups are found
        sizes = t.column("size").to_pylist()
        counts = t.column("n_clusters").to_pylist()
        assert min(sizes) >= 2
        assert sum(s * c for s, c in zip(sizes, counts)) >= 10


class TestImageQuality:
    def test_blur_lowers_sharpness_and_flat_lowers_contrast(self):
        from datatest_ray.stages.imaging import ImageQualityExtractor

        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, (32, 32)).astype(np.uint8)
        # 3x3 box blur
        p = img.astype(np.float64)
        blur = (p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
                + p[1:-1, :-2] + p[1:-1, 1:-1] + p[1:-1, 2:]
                + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:]) / 9.0
        s1, c1 = ImageQualityExtractor.metrics(img)
        s2, _ = ImageQualityExtractor.metrics(blur.astype(np.uint8))
        assert s2 < s1 * 0.5
        flat = np.full((32, 32), 128, dtype=np.uint8)
        s3, c3 = ImageQualityExtractor.metrics(flat)
        assert s3 == 0.0 and c3 == 0.0 and c1 > 0

    def test_stage_over_fixture(self, ray_session):
        from datatest_ray.sources.images import (ImageFixtureSpec,
                                                 generate_dataset)
        from datatest_ray.stages.imaging import image_quality_scores

        spec = ImageFixtureSpec(n_rows=200, seed=42, rows_per_part=100)
        ds = generate_dataset(spec, columns={"image_id", "bytes", "fmt"})
        t = pa.concat_tables(list(image_quality_scores(
            ds, concurrency=2).iter_batches(batch_format="pyarrow")))
        assert t.num_rows == 200
        valid = t.column("sharpness").drop_null()
        # corrupt plants yield a few nulls; the rest are finite numbers
        assert len(valid) > 150
        assert all(v >= 0 for v in valid.to_pylist())
