"""Batch 60: DSIR importance-weight profile, Hampel outlier census,
partial correlation (oracle parity covered by test_oracle.py)."""

import datetime

import numpy as np
import pyarrow as pa


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestDsirProfile:
    def test_target_language_scores_highest(self, ray_session):
        from datatest_ray.stages.text import dsir_profile

        t = pa.table({
            "text": pa.array(["alpha beta alpha", "alpha beta gamma",
                              "delta epsilon zeta", "delta zeta zeta"]),
            "lang": pa.array(["en", "en", "de", "de"]),
        })
        out = {r["lang"]: r for r in dsir_profile(
            _ds(t), "text", lang_col="lang",
            target_lang="en").take_all()}
        assert out["en"]["n_docs"] == 2 and out["de"]["n_docs"] == 2
        # target-LM words dominate 'en' docs -> higher mean score
        assert out["en"]["mean_score"] > out["de"]["mean_score"]

    def test_identical_corpora_score_zero_gap(self, ray_session):
        from datatest_ray.stages.text import dsir_profile

        t = pa.table({
            "text": pa.array(["w1 w2", "w1 w2"]),
            "lang": pa.array(["en", "de"]),
        })
        out = {r["lang"]: r for r in dsir_profile(
            _ds(t, 1), "text", lang_col="lang",
            target_lang="en").take_all()}
        # same unigram dist in target and corpus up to smoothing:
        # both langs get the same score
        assert out["en"]["mean_score"] == out["de"]["mean_score"]


class TestHampel:
    def _daily(self, counts):
        ts, day0 = [], datetime.datetime(2024, 1, 1)
        for d, c in enumerate(counts):
            ts.extend([day0 + datetime.timedelta(days=d)] * c)
        return pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                         "event_type": pa.array(["a"] * len(ts))})

    def test_spike_flagged_once(self, ray_session):
        from datatest_ray.stages.temporal import hampel_daily

        counts = [10, 11, 10, 12, 10, 11, 10, 60, 10, 11, 10]
        out = hampel_daily(_ds(self._daily(counts)), "ts",
                           by="event_type").take_all()[0]
        assert out["n_windows"] == len(counts) - 6
        assert out["n_outliers"] == 1

    def test_constant_series_no_flags(self, ray_session):
        from datatest_ray.stages.temporal import hampel_daily

        out = hampel_daily(_ds(self._daily([5] * 12), 1), "ts",
                           by="event_type").take_all()[0]
        assert out["n_outliers"] == 0  # MAD = 0 -> never flags


class TestPartialCorrelation:
    def test_confounder_removed(self, ray_session):
        from datatest_ray.stages.stattests import partial_correlation

        # x and y both driven by z only: r_xy high, r_xy.z ~ 0
        rng = np.random.RandomState(5)
        z = rng.uniform(0, 100, 500)
        x = np.round(z + rng.normal(0, 1, 500), 2)
        y = np.round(2 * z + rng.normal(0, 1, 500), 2)
        t = pa.table({"x": pa.array(x), "y": pa.array(y),
                      "z": pa.array(np.round(z, 2))})
        out = partial_correlation(_ds(t), x_col="x", y_col="y",
                                  z_col="z").take_all()[0]
        assert out["r_xy"] > 0.99
        assert abs(out["r_xy_z"]) < 0.2

    def test_direct_relation_survives(self, ray_session):
        from datatest_ray.stages.stattests import partial_correlation

        rng = np.random.RandomState(6)
        x = rng.uniform(0, 100, 400)
        z = rng.uniform(0, 100, 400)
        y = x + rng.normal(0, 5, 400)  # y depends on x, not z
        t = pa.table({"x": pa.array(np.round(x, 2)),
                      "y": pa.array(np.round(y, 2)),
                      "z": pa.array(np.round(z, 2))})
        out = partial_correlation(_ds(t), x_col="x", y_col="y",
                                  z_col="z").take_all()[0]
        assert out["r_xy_z"] > 0.9

    def test_degenerate_null(self, ray_session):
        from datatest_ray.stages.stattests import partial_correlation

        t = pa.table({"x": pa.array([1.0, 1.0, 1.0]),
                      "y": pa.array([1.0, 2.0, 3.0]),
                      "z": pa.array([4.0, 5.0, 6.0])})
        out = partial_correlation(_ds(t, 1), x_col="x", y_col="y",
                                  z_col="z").take_all()[0]
        assert out["r_xy"] is None and out["r_xy_z"] is None
