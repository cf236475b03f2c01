"""Batch 91: spectral entropy, gradient-orientation profile
(rows-only operators; parity/behavior pinned here)."""

import datetime

import numpy as np
import pyarrow as pa


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestSpectralEntropy:
    def _daily(self, counts):
        ts, day0 = [], datetime.datetime(2024, 1, 1)
        for d, c in enumerate(counts):
            ts.extend([day0 + datetime.timedelta(days=d)] * c)
        return pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                         "event_type": pa.array(["a"] * len(ts))})

    def test_pure_cycle_low_entropy(self, ray_session):
        from datatest_ray.stages.temporal import spectral_entropy_daily

        counts = [10 + (9 if d % 7 == 0 else 0) for d in range(56)]
        out = spectral_entropy_daily(_ds(self._daily(counts)), "ts",
                                     by="event_type").take_all()[0]
        noise = list(np.random.RandomState(0).randint(5, 30, 56))
        out_n = spectral_entropy_daily(_ds(self._daily(noise)), "ts",
                                       by="event_type").take_all()[0]
        assert out["spectral_entropy"] < out_n["spectral_entropy"]
        assert out_n["spectral_entropy"] > 0.8

    def test_matches_numpy_reference(self, ray_session):
        from datatest_ray.stages.temporal import spectral_entropy_daily

        rng = np.random.RandomState(5)
        counts = list(rng.randint(5, 40, 48))
        out = spectral_entropy_daily(_ds(self._daily(counts)), "ts",
                                     by="event_type").take_all()[0]
        x = np.array(counts, float)
        xc = x - x.mean()
        spec = np.abs(np.fft.rfft(xc)[1:]) ** 2
        p = spec / spec.sum()
        p = p[p > 0]
        se = -(p * np.log(p)).sum() / np.log(len(spec))
        assert abs(out["spectral_entropy"] - round(se, 6)) < 1e-9


class TestOrientationProfile:
    def test_hist_matches_brute_force(self):
        from datatest_ray.stages.imaging import (
            GradientOrientationExtractor)

        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (32, 32, 3)).astype(np.uint8)
        h = GradientOrientationExtractor.orientation_hist(img, 8)
        assert abs(h.sum() - 1.0) < 1e-9
        # horizontal ramp: gradient points along +x -> one bin holds
        # all the mass
        ramp = np.tile(np.arange(64, dtype=np.uint8) * 2, (64, 1))
        hr = GradientOrientationExtractor.orientation_hist(ramp, 8)
        assert hr.max() > 0.99

    def test_profile_over_fixture(self, ray_session):
        from datatest_ray.sources.images import (ImageFixtureSpec,
                                                 generate_dataset)
        from datatest_ray.stages.imaging import orientation_profile

        spec = ImageFixtureSpec(n_rows=200, seed=42, rows_per_part=50)
        ds = generate_dataset(spec, columns={"image_id", "bytes", "fmt"})
        out = orientation_profile(ds, concurrency=2).take_all()
        assert sum(r["n_images"] for r in out) == 200
        for r in out:
            if r["n_images"] - r["n_decode_fail"] > 0:
                total = sum(r[f"b{j}"] for j in range(8))
                assert abs(total - 1.0) < 0.01
                assert 0.0 <= r["mean_entropy"] <= 3.0
