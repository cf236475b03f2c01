"""Batch 35: Nelson-Aalen hazard (+ failure-mode KM), Grubbs'
statistic, characteristic-function drift (oracle parity covered by
test_oracle.py)."""

import math

import numpy as np
import pyarrow as pa


def _ds(t: pa.Table):
    import ray.data as rd

    return rd.from_arrow(t)


def _ev(rows):
    return pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([np.datetime64(r[1], "us") for r in rows],
                       pa.timestamp("us")),
        "t": pa.array([r[2] for r in rows]),
    })


class TestNelsonAalenFailureMode:
    def test_hand_case(self, ray_session):
        from datatest_ray.stages.temporal import nelson_aalen

        # u1: starts d1, errors d3 (dur 2, event)
        # u2: starts d1, never errors, last d5 (dur 4, censored)
        # u3: starts d2, errors d4 (dur 2, event)
        rows = [
            (1, "2024-01-01T00:00:00", "view"),
            (1, "2024-01-03T00:00:00", "error"),
            (2, "2024-01-01T00:00:00", "view"),
            (2, "2024-01-05T00:00:00", "click"),
            (3, "2024-01-02T00:00:00", "view"),
            (3, "2024-01-04T00:00:00", "error"),
        ]
        out = nelson_aalen(_ds(_ev(rows)), "ts", by="u",
                           failure_type="error",
                           type_col="t").to_pandas()
        # event times: dur 2 with d=2; at-risk at 2: all 3
        assert len(out) == 1
        r = out.iloc[0]
        assert r["dur_days"] == 2 and r["d"] == 2 and r["n_risk"] == 3
        assert abs(r["h"] - 2.0 / 3.0) < 1e-12
        assert abs(r["var_h"] - 2.0 / 9.0) < 1e-12

    def test_km_failure_mode_product(self, ray_session):
        from datatest_ray.stages.temporal import km_survival

        # all three fail at distinct times -> S steps 2/3, 1/3, 0
        rows = [
            (1, "2024-01-01T00:00:00", "view"),
            (1, "2024-01-02T00:00:00", "error"),
            (2, "2024-01-01T00:00:00", "view"),
            (2, "2024-01-03T00:00:00", "error"),
            (3, "2024-01-01T00:00:00", "view"),
            (3, "2024-01-04T00:00:00", "error"),
        ]
        out = km_survival(_ds(_ev(rows)), "ts", by="u",
                          failure_type="error",
                          type_col="t").to_pandas()
        assert list(out["dur_days"]) == [1, 2, 3]
        assert abs(out.iloc[0]["s"] - 2 / 3) < 1e-12
        assert abs(out.iloc[1]["s"] - 1 / 3) < 1e-12
        assert out.iloc[2]["s"] == 0.0  # last at-risk fails: ln(0) trap


class TestGrubbs:
    def test_known_outlier(self, ray_session):
        from datatest_ray.stages.stattests import grubbs_statistic

        x = np.array([10.0] * 9 + [100.0])
        t = pa.table({"v": pa.array(x)})
        out = grubbs_statistic(_ds(t), value_col="v").to_pandas()
        r = out.iloc[0]
        mean = x.mean()
        sd = x.std(ddof=1)
        assert r["n"] == 10
        assert abs(r["mean"] - mean) < 1e-9
        assert abs(r["sd"] - sd) < 1e-9
        assert abs(r["g"] - (100.0 - mean) / sd) < 1e-9
        assert r["extreme"] == 100.0

    def test_constant_column_nulls(self, ray_session):
        from datatest_ray.stages.stattests import grubbs_statistic

        t = pa.table({"v": pa.array([5.0] * 6)})
        out = grubbs_statistic(_ds(t), value_col="v").to_pandas()
        assert out.iloc[0]["n"] == 6
        assert np.isnan(out.iloc[0]["g"])


class TestCfDrift:
    def test_identical_distributions_zero(self, ray_session):
        from datatest_ray.stages.stattests import cf_drift

        x = np.arange(50, dtype=np.float64)
        t = pa.table({
            "g": ["a"] * 50 + ["b"] * 50,
            "v": pa.array(np.concatenate([x, x])),
        })
        out = cf_drift(_ds(t), value_col="v", group_col="g",
                       a="a", b="b").to_pandas()
        assert abs(out.iloc[0]["d"]) < 1e-24

    def test_matches_direct_formula(self, ray_session):
        from datatest_ray.stages.stattests import cf_drift

        rng = np.random.RandomState(8)
        xa = rng.normal(10, 5, 300)
        xb = rng.normal(30, 5, 200)
        t = pa.table({
            "g": ["a"] * 300 + ["b"] * 200,
            "v": pa.array(np.concatenate([xa, xb])),
        })
        out = cf_drift(_ds(t), value_col="v", group_col="g",
                       a="a", b="b").to_pandas()
        d_ref = 0.0
        for tp in (0.01, 0.05, 0.25):
            dre = np.cos(tp * xa).mean() - np.cos(tp * xb).mean()
            dim = np.sin(tp * xa).mean() - np.sin(tp * xb).mean()
            d_ref += dre * dre + dim * dim
        assert abs(out.iloc[0]["d"] - d_ref) < 1e-12
        assert out.iloc[0]["d"] > 0.01  # separated means -> real drift
