"""Batch 49: Hodges-Lehmann shift, dow-seasonality strength, CUPED,
PMI collocations, SSIM parity (oracle parity for the first four
covered by test_oracle.py)."""

import itertools
import math
import statistics

import numpy as np
import pyarrow as pa


def _ds(t: pa.Table):
    import ray.data as rd

    return rd.from_arrow(t)


class TestHodgesLehmann:
    def test_matches_bruteforce(self, ray_session):
        from datatest_ray.stages.stattests import hodges_lehmann_shift

        rng = np.random.default_rng(3)
        xa = np.round(rng.normal(5, 2, 60), 1)
        xb = np.round(rng.normal(3, 2, 45), 1)
        t = pa.table({
            "g": pa.array(["a"] * 60 + ["b"] * 45),
            "v": pa.array(np.concatenate([xa, xb])),
        })
        row = hodges_lehmann_shift(
            _ds(t).repartition(4), value_col="v", group_col="g",
            a="a", b="b").take_all()[0]
        diffs = sorted(x - y for x, y in itertools.product(xa, xb))
        assert row["n_pairs"] == len(diffs)
        assert row["hl_shift"] == statistics.median(diffs)
        assert abs(row["hl_shift"] - 2.0) < 1.0  # locates the true shift

    def test_shift_invariance(self, ray_session):
        from datatest_ray.stages.stattests import hodges_lehmann_shift

        rng = np.random.default_rng(4)
        base = np.round(rng.normal(0, 1, 50), 2)
        t = pa.table({
            "g": pa.array(["a"] * 50 + ["b"] * 50),
            "v": pa.array(np.concatenate([base + 7.5, base])),
        })
        row = hodges_lehmann_shift(
            _ds(t), value_col="v", group_col="g",
            a="a", b="b").take_all()[0]
        assert row["hl_shift"] == 7.5


class TestDowStrength:
    def _events(self, counts, et="a"):
        import datetime

        ts = []
        day0 = datetime.datetime(2024, 1, 1)  # a Monday (isodow 1)
        for d, c in enumerate(counts):
            ts.extend([day0 + datetime.timedelta(days=d)] * c)
        return pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                         "event_type": pa.array([et] * len(ts))})

    def test_pure_weekly_r2_one(self, ray_session):
        from datatest_ray.stages.temporal import dow_strength

        cycle = [10, 12, 14, 16, 18, 30, 40]
        out = dow_strength(_ds(self._events(cycle * 3)), "ts",
                           by="event_type").take_all()
        assert out[0]["r2"] == 1.0

    def test_constant_series_null(self, ray_session):
        from datatest_ray.stages.temporal import dow_strength

        out = dow_strength(_ds(self._events([5] * 14)), "ts",
                           by="event_type").take_all()
        assert out[0]["r2"] is None

    def test_no_weekly_structure_low(self, ray_session):
        from datatest_ray.stages.temporal import dow_strength

        rng = np.random.default_rng(9)
        counts = rng.integers(5, 50, 70).tolist()  # 10 weeks of noise
        out = dow_strength(_ds(self._events(counts)), "ts",
                           by="event_type").take_all()
        assert 0.0 <= out[0]["r2"] < 0.4


class TestCuped:
    def test_perfect_covariate_kills_variance(self, ray_session):
        from datatest_ray.stages.mlprep import cuped

        import datetime

        # y = 2x exactly: CUPED removes ALL variance
        ts, uid, val = [], [], []
        pre = datetime.datetime(2024, 1, 10)
        post = datetime.datetime(2024, 1, 20)
        for u in range(20):
            ts.append(pre)
            uid.append(u)
            val.append(float(u + 1))
            ts.append(post)
            uid.append(u)
            val.append(2.0 * (u + 1))
        t = pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                      "user_id": pa.array(uid, pa.int64()),
                      "value": pa.array(val)})
        row = cuped(_ds(t).repartition(3), ts_col="ts",
                    key_col="user_id", value_col="value",
                    cutoff="2024-01-16").to_pylist()[0]
        assert row["n_keys"] == 20
        assert row["theta"] == 2.0
        assert row["var_adj"] == 0.0
        assert row["var_reduction"] == 1.0

    def test_independent_covariate_no_gain(self, ray_session):
        from datatest_ray.stages.mlprep import cuped

        import datetime

        rng = np.random.default_rng(2)
        ts, uid, val = [], [], []
        pre = datetime.datetime(2024, 1, 10)
        post = datetime.datetime(2024, 1, 20)
        for u in range(200):
            ts += [pre, post]
            uid += [u, u]
            val += [float(rng.integers(1, 100)),
                    float(rng.integers(1, 100))]
        t = pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                      "user_id": pa.array(uid, pa.int64()),
                      "value": pa.array(val)})
        row = cuped(_ds(t), ts_col="ts", key_col="user_id",
                    value_col="value", cutoff="2024-01-16").to_pylist()[0]
        assert row["var_reduction"] < 0.05


class TestCollocations:
    def test_pmi_beats_frequency(self, ray_session):
        from datatest_ray.stages.text import collocations_pmi

        # 'los angeles' always together (high PMI); 'of the' frequent
        # but both words also appear everywhere (low PMI)
        docs = (["los angeles of the beach"] * 10
                + ["of car the house of town the street"] * 30)
        t = pa.table({"text": pa.array(docs)})
        out = collocations_pmi(_ds(t).repartition(3), "text",
                               min_count=5, k=5).take_all()
        top = (out[0]["w1"], out[0]["w2"])
        assert top == ("los", "angeles")
        ranks = {(r["w1"], r["w2"]): i for i, r in enumerate(out)}
        if ("of", "the") in ranks:
            assert ranks[("of", "the")] > ranks[("los", "angeles")]


class TestSSIM:
    def test_identical_is_one(self):
        from datatest_ray.stages.imaging import SSIMExtractor

        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
        assert SSIMExtractor.ssim(img, img) == 1.0

    def test_degradation_ordering(self):
        from datatest_ray.stages.imaging import SSIMExtractor

        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (32, 32)).astype(np.uint8)
        mild = np.clip(img.astype(int)
                       + rng.integers(-5, 6, img.shape), 0, 255)
        harsh = np.clip(img.astype(int)
                        + rng.integers(-60, 61, img.shape), 0, 255)
        s_mild = SSIMExtractor.ssim(img, mild.astype(np.uint8))
        s_harsh = SSIMExtractor.ssim(img, harsh.astype(np.uint8))
        assert 1.0 > s_mild > s_harsh

    def test_fixture_roundtrip_scores(self, ray_session):
        from datatest_ray.sources.images import (ImageFixtureSpec,
                                                 generate_dataset)
        from datatest_ray.stages.imaging import image_ssim_scores

        spec = ImageFixtureSpec(n_rows=100, seed=42, rows_per_part=64)
        images = generate_dataset(
            spec, columns={"image_id", "bytes", "w", "h"})
        out = image_ssim_scores(images, reference_seed=42,
                                concurrency=2).to_pandas()
        scored = out["ssim"].dropna()
        assert len(scored) > 50
        # clean fixtures score near 1; planted corruptions may score
        # arbitrarily low (SSIM ∈ [−1, 1]) — that's what the audit is for
        assert (scored <= 1.0 + 1e-12).all()
        assert (scored >= -1.0 - 1e-12).all()
        assert scored.median() > 0.99
