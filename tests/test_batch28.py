"""Batch 28: Cliff's delta, two-sample Cramér–von Mises, calibration
bins + Brier (oracle parity covered by test_oracle.py /
test_fuzz_oracle.py)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ds(t: pa.Table):
    import ray.data as rd

    return rd.from_arrow(t)


class TestCliffsDelta:
    def test_matches_brute_force_with_ties(self, ray_session):
        from datatest_ray.stages.robust import cliffs_delta

        rng = np.random.RandomState(7)
        va = np.round(rng.uniform(0, 10, 200), 0)   # heavy ties
        vb = np.round(rng.uniform(2, 12, 300), 0)
        t = pa.table({
            "g": ["a"] * 200 + ["b"] * 300,
            "v": pa.array(np.concatenate([va, vb])),
        })
        out = cliffs_delta(_ds(t), value_col="v", group_col="g",
                           a="a", b="b").to_pandas()
        gt = int((va[:, None] > vb[None, :]).sum())
        lt = int((va[:, None] < vb[None, :]).sum())
        r = out.iloc[0]
        assert (r["n_a"], r["n_b"]) == (200, 300)
        assert (r["gt_pairs"], r["lt_pairs"]) == (gt, lt)
        assert abs(r["delta"] - (gt - lt) / (200.0 * 300.0)) < 1e-15

    def test_one_vs_rest_and_nulls(self, ray_session):
        from datatest_ray.stages.robust import cliffs_delta

        t = pa.table({
            "g": ["a", "a", "b", "c", None, "a"],
            "v": pa.array([3.0, 5.0, 1.0, None, 2.0, None]),
        })
        # a-side values {3,5}; rest (non-null group, non-null v) = {1}
        out = cliffs_delta(_ds(t), value_col="v", group_col="g",
                           a="a").to_pandas()
        r = out.iloc[0]
        assert (r["n_a"], r["n_b"]) == (2, 1)
        assert (r["gt_pairs"], r["lt_pairs"]) == (2, 0)
        assert r["delta"] == 1.0

    def test_delta_sign_convention(self, ray_session):
        from datatest_ray.stages.robust import cliffs_delta

        t = pa.table({"g": ["a", "b"], "v": pa.array([1.0, 9.0])})
        out = cliffs_delta(_ds(t), value_col="v", group_col="g",
                           a="a", b="b").to_pandas()
        assert out.iloc[0]["delta"] == -1.0  # a below b -> negative


class TestCvmTwoSample:
    def test_matches_direct_formula(self, ray_session):
        from datatest_ray.stages.robust import cvm_two_sample

        rng = np.random.RandomState(11)
        xa = np.round(rng.normal(0, 1, 150), 1)
        xb = np.round(rng.normal(0.4, 1.2, 100), 1)
        t = pa.table({
            "g": ["x"] * 150 + ["y"] * 100,
            "v": pa.array(np.concatenate([xa, xb])),
        })
        out = cvm_two_sample(_ds(t), value_col="v", group_col="g",
                             a="x", b="y").to_pandas()
        n, m = 150, 100
        pooled = np.sort(np.concatenate([xa, xb]))
        fa = np.searchsorted(np.sort(xa), pooled, side="right") / n
        fb = np.searchsorted(np.sort(xb), pooled, side="right") / m
        want = n * m / (n + m) ** 2 * ((fa - fb) ** 2).sum()
        r = out.iloc[0]
        assert (r["n_a"], r["n_b"]) == (n, m)
        assert abs(r["t"] - want) < 1e-9

    def test_identical_samples_zero(self, ray_session):
        from datatest_ray.stages.robust import cvm_two_sample

        v = np.arange(50, dtype=np.float64)
        t = pa.table({"g": ["x"] * 50 + ["y"] * 50,
                      "v": pa.array(np.concatenate([v, v]))})
        out = cvm_two_sample(_ds(t), value_col="v", group_col="g",
                             a="x", b="y").to_pandas()
        assert out.iloc[0]["t"] == 0.0


class TestCalibrationBins:
    def test_exact_integer_path(self, ray_session):
        from datatest_ray.stages.mlprep import calibration_bins

        rng = np.random.RandomState(3)
        k = rng.randint(0, 1024, 5000).astype(np.int64)
        y = (rng.rand(5000) < (k / 1024.0)).astype(np.int64)  # calibrated
        out = calibration_bins(
            _ds(pa.table({"k": pa.array(k), "y": pa.array(y)})),
            score_col="k", label_col="y", n_bins=8,
            denom=1024).to_pandas().set_index("bin").sort_index()
        assert list(out.index) == list(range(8))
        assert out["n"].sum() == 5000
        for b in range(8):
            sel = (k * 8) // 1024 == b
            kk, yy = k[sel], y[sel]
            r = out.loc[b]
            assert r["n"] == sel.sum()
            assert r["n_pos"] == yy.sum()
            assert r["rate"] == yy.sum() / float(sel.sum())
            assert r["avg_score"] == float(kk.sum()) / (1024.0 * sel.sum())
            brier = ((kk / 1024.0 - yy) ** 2).sum() / sel.sum()
            assert abs(r["brier"] - brier) < 1e-12
        # a calibrated score: per-bin rate tracks per-bin mean score
        assert (np.abs(out["rate"] - out["avg_score"]) < 0.1).all()

    def test_float_path_and_nulls(self, ray_session):
        from datatest_ray.stages.mlprep import calibration_bins

        t = pa.table({
            "s": pa.array([0.05, 0.10, 0.95, None, 0.5]),
            "y": pa.array([0, 0, 1, 1, None], pa.int64()),
        })
        out = calibration_bins(_ds(t), score_col="s", label_col="y",
                               n_bins=4).to_pandas().set_index("bin")
        assert out["n"].sum() == 3          # nulls on either side drop
        assert out.loc[0, "n"] == 2 and out.loc[0, "n_pos"] == 0
        assert out.loc[3, "n"] == 1 and out.loc[3, "rate"] == 1.0
        assert abs(out.loc[3, "brier"] - (0.95 - 1) ** 2) < 1e-12


class TestEnergyDistance:
    def test_matches_brute_force(self, ray_session):
        from datatest_ray.stages.drift import energy_distance

        rng = np.random.RandomState(5)
        xa = np.round(rng.uniform(0, 50, 120), 2)
        xb = np.round(rng.uniform(10, 80, 80), 2)
        t = pa.table({
            "g": ["x"] * 120 + ["y"] * 80,
            "v": pa.array(np.concatenate([xa, xb])),
        })
        out = energy_distance(_ds(t), value_col="v", group_col="g",
                              a="x", b="y").to_pandas()
        ca = np.round(xa * 100).astype(np.int64)
        cb = np.round(xb * 100).astype(np.int64)
        mxy = np.abs(ca[:, None] - cb[None, :]).sum() / (120.0 * 80 * 100)
        mxx = np.abs(ca[:, None] - ca[None, :]).sum() / (120.0 * 120 * 100)
        myy = np.abs(cb[:, None] - cb[None, :]).sum() / (80.0 * 80 * 100)
        r = out.iloc[0]
        assert (r["n_a"], r["n_b"]) == (120, 80)
        assert abs(r["mean_between"] - mxy) < 1e-9
        assert abs(r["mean_within_a"] - mxx) < 1e-9
        assert abs(r["mean_within_b"] - myy) < 1e-9
        assert abs(r["e"] - (2 * mxy - mxx - myy)) < 1e-9
        assert r["e"] > 0  # shifted distributions

    def test_identical_distributions_zero(self, ray_session):
        from datatest_ray.stages.drift import energy_distance

        v = np.round(np.linspace(1, 9, 40), 2)
        t = pa.table({"g": ["x"] * 40 + ["y"] * 40,
                      "v": pa.array(np.concatenate([v, v]))})
        out = energy_distance(_ds(t), value_col="v", group_col="g",
                              a="x", b="y").to_pandas()
        assert out.iloc[0]["e"] == 0.0
