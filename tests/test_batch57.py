"""Batch 57: von Neumann ratio, Buishand range test, binary-
segmentation changepoint, payload byte-entropy audit (oracle parity
for the first three covered by test_oracle.py)."""

import datetime

import numpy as np
import pyarrow as pa


def _daily(counts, et="a"):
    ts, day0 = [], datetime.datetime(2024, 1, 1)
    for d, c in enumerate(counts):
        ts.extend([day0 + datetime.timedelta(days=d)] * c)
    return pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                     "event_type": pa.array([et] * len(ts))})


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestVonNeumann:
    def test_oscillating_series_high(self, ray_session):
        from datatest_ray.stages.temporal import von_neumann_daily

        out = von_neumann_daily(_ds(_daily([5, 30] * 10)), "ts",
                                by="event_type").take_all()[0]
        assert out["eta"] > 3.0

    def test_trending_series_low(self, ray_session):
        from datatest_ray.stages.temporal import von_neumann_daily

        out = von_neumann_daily(_ds(_daily(list(range(1, 31)))), "ts",
                                by="event_type").take_all()[0]
        assert out["eta"] < 0.5

    def test_constant_series_null(self, ray_session):
        from datatest_ray.stages.temporal import von_neumann_daily

        out = von_neumann_daily(_ds(_daily([4] * 10), 1), "ts",
                                by="event_type").take_all()[0]
        assert out["eta"] is None


class TestBuishand:
    def test_level_shift_detected(self, ray_session):
        from datatest_ray.stages.temporal import buishand_range_daily

        counts = [10] * 15 + [40] * 15
        out = buishand_range_daily(_ds(_daily(counts)), "ts",
                                   by="event_type").take_all()[0]
        # critical value for R/sqrt(n) at n=30, alpha=0.05 is ~1.5
        assert out["r"] > 1.5
        assert out["q"] > 1.5

    def test_stable_below_shifted(self, ray_session):
        from datatest_ray.stages.temporal import buishand_range_daily

        rng = np.random.RandomState(1)
        stable = list(rng.randint(18, 23, 40))
        shifted = [10] * 20 + [40] * 20
        r_stable = buishand_range_daily(
            _ds(_daily(stable)), "ts", by="event_type").take_all()[0]
        r_shift = buishand_range_daily(
            _ds(_daily(shifted)), "ts", by="event_type").take_all()[0]
        # iid noise sits near E[R/sqrt(n)] ~ 1.6; a hard level shift
        # pushes R toward its sqrt(n)/2 ceiling
        assert r_stable["r"] < 2.0 < r_shift["r"]
        assert r_stable["q"] >= 0 and r_stable["r"] >= r_stable["q"]


class TestBinseg:
    def test_finds_planted_changepoint(self, ray_session):
        from datatest_ray.stages.temporal import binseg_change_daily

        counts = [10] * 12 + [50] * 8
        out = binseg_change_daily(_ds(_daily(counts)), "ts",
                                  by="event_type").take_all()[0]
        assert out["split_pos"] == 12
        assert out["delta_mean"] == 40.0

    def test_two_days_trivial_split(self, ray_session):
        from datatest_ray.stages.temporal import binseg_change_daily

        out = binseg_change_daily(_ds(_daily([3, 9]), 1), "ts",
                                  by="event_type").take_all()[0]
        assert out["split_pos"] == 1
        assert out["delta_mean"] == 6.0


class TestPayloadEntropy:
    def test_entropy_matches_brute_force(self):
        from datatest_ray.stages.imaging import PayloadEntropyExtractor

        data = bytes(range(256)) * 4  # uniform bytes -> exactly 8 bits
        assert PayloadEntropyExtractor.byte_entropy(data) == 8.0
        assert PayloadEntropyExtractor.byte_entropy(b"\x00" * 100) == 0.0
        # two symbols 50/50 -> 1 bit
        assert abs(PayloadEntropyExtractor.byte_entropy(
            b"ab" * 50) - 1.0) < 1e-12

    def test_audit_over_fixture(self, ray_session):
        from datatest_ray.sources.images import (ImageFixtureSpec,
                                                 generate_dataset)
        from datatest_ray.stages.imaging import payload_entropy_audit

        spec = ImageFixtureSpec(n_rows=300, seed=42, rows_per_part=100)
        ds = generate_dataset(spec, columns={"image_id", "bytes", "fmt"})
        out = payload_entropy_audit(ds, concurrency=2).take_all()
        total = sum(r["n_images"] for r in out)
        assert total == 300
        # compressed payloads should mostly have sane entropy values
        for r in out:
            if r["mean_entropy"] is not None:
                assert 0.0 <= r["mean_entropy"] <= 8.0
