"""Batch 30: trailing RANGE-interval window, two-predictor OLS,
circular hour statistics, hourly dispersion (Fano) index (oracle
parity covered by test_oracle.py)."""

import math

import numpy as np
import pyarrow as pa


def _ds(t: pa.Table):
    import ray.data as rd

    return rd.from_arrow(t)


def _ts(*strs):
    return pa.array([np.datetime64(s, "us") for s in strs],
                    pa.timestamp("us"))


class TestTrailingRangeAgg:
    def test_frame_boundaries_and_peers(self, ray_session):
        from datatest_ray.stages.winfunc import trailing_range_agg

        # one key; events at 0s, 1800s, 3600s, 3601s, 3601s (peer),
        # 7202s — 1h window includes rows with ts in [t-3600, t]
        t = pa.table({
            "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "u": pa.array([7] * 6, pa.int64()),
            "ts": _ts("2024-01-01T00:00:00", "2024-01-01T00:30:00",
                      "2024-01-01T01:00:00", "2024-01-01T01:00:01",
                      "2024-01-01T01:00:01", "2024-01-01T02:00:02"),
            "v": pa.array([1.0, 2.0, 4.0, 8.0, 16.0, 32.0]),
        })
        out = trailing_range_agg(
            _ds(t), by="u", ts_col="ts", value_col="v", id_col="id",
            window_s=3600).to_pandas().set_index("id").sort_index()
        # id=1: just itself; id=2: {1,2}; id=3: {1,2,3} (0s is exactly
        # t-3600 -> included); id=4: {2,3,4,5} (peers included);
        # id=5: same frame as its peer id=4; id=6: {6} (3601s is
        # outside [3602, 7202]... 7202-3600=3602 > 3601)
        assert out.loc[1, "n_win"] == 1 and out.loc[1, "sum_win_c"] == 100
        assert out.loc[2, "n_win"] == 2 and out.loc[2, "sum_win_c"] == 300
        assert out.loc[3, "n_win"] == 3 and out.loc[3, "sum_win_c"] == 700
        assert out.loc[4, "n_win"] == 4
        assert out.loc[4, "sum_win_c"] == (2 + 4 + 8 + 16) * 100
        assert out.loc[5, "n_win"] == 4
        assert out.loc[5, "sum_win_c"] == out.loc[4, "sum_win_c"]
        assert out.loc[6, "n_win"] == 1 and out.loc[6, "sum_win_c"] == 3200

    def test_keys_isolated_and_nulls_dropped(self, ray_session):
        from datatest_ray.stages.winfunc import trailing_range_agg

        t = pa.table({
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "u": pa.array([1, 2, None, 1], pa.int64()),
            "ts": _ts("2024-01-01T00:00:00", "2024-01-01T00:00:00",
                      "2024-01-01T00:00:01", "2024-01-01T00:10:00"),
            "v": pa.array([1.0, 2.0, 3.0, None]),
        })
        out = trailing_range_agg(
            _ds(t), by="u", ts_col="ts", value_col="v", id_col="id",
            window_s=3600).to_pandas()
        assert set(out["id"]) == {1, 2}  # null key + null value dropped
        assert out.set_index("id").loc[1, "n_win"] == 1
        assert out.set_index("id").loc[2, "n_win"] == 1


class TestRegressionTwoPredictors:
    def test_recovers_exact_plane(self, ray_session):
        from datatest_ray.stages.window import regression_two_predictors

        rng = np.random.RandomState(5)
        x1 = rng.randint(1, 50, 400).astype(np.float64)
        x2 = np.round(rng.uniform(0, 0.1, 400), 2)
        y = np.round(7.0 + 3.0 * x1 - 2.0 * x2 * 100.0, 2)  # exact cents
        t = pa.table({"y": pa.array(y), "x1": pa.array(x1),
                      "x2": pa.array(x2)})
        out = regression_two_predictors(
            _ds(t), y="y", x1="x1", x2="x2",
            y_scale=100.0, x1_scale=1.0, x2_scale=100.0).to_pandas()
        r = out.iloc[0]
        # betas are in quantized units: cents per x1-unit, cents per
        # x2-percent; y = 700c + 300c*x1 - 200c*x2pct
        assert r["n"] == 400
        assert abs(r["beta_x1"] - 300.0) < 1e-6
        assert abs(r["beta_x2"] - (-200.0)) < 1e-6
        assert abs(r["intercept"] - 700.0) < 1e-6

    def test_singular_design_nulls(self, ray_session):
        from datatest_ray.stages.window import regression_two_predictors

        # x2 = 2*x1 exactly -> collinear -> det 0
        x1 = np.arange(1, 21, dtype=np.float64)
        t = pa.table({"y": pa.array(x1 * 3), "x1": pa.array(x1),
                      "x2": pa.array(2 * x1)})
        out = regression_two_predictors(
            _ds(t), y="y", x1="x1", x2="x2", y_scale=1.0,
            x1_scale=1.0, x2_scale=1.0).to_pandas()
        assert np.isnan(out.iloc[0]["beta_x1"])
        assert np.isnan(out.iloc[0]["intercept"])


class TestCircularHourStats:
    def test_concentrated_and_uniform(self, ray_session):
        from datatest_ray.stages.temporal import circular_hour_stats

        # group "peak": all at hour 6 -> resultant 1, angle pi/2
        # group "flat": uniform over all 24 hours -> resultant ~0
        ts_peak = [np.datetime64(f"2024-01-0{d}T06:00:00", "us")
                   for d in range(1, 9)]
        ts_flat = [np.datetime64(f"2024-01-01T{h:02d}:30:00", "us")
                   for h in range(24)]
        t = pa.table({
            "g": ["peak"] * 8 + ["flat"] * 24,
            "ts": pa.array(ts_peak + ts_flat, pa.timestamp("us")),
        })
        out = circular_hour_stats(_ds(t), "ts", by="g").to_pandas()
        out = out.set_index("g")
        assert abs(out.loc["peak", "resultant"] - 1.0) < 1e-12
        assert abs(out.loc["peak", "mean_angle"] - math.pi / 2) < 1e-12
        assert out.loc["flat", "resultant"] < 1e-12
        assert abs(out.loc["flat", "circ_var"] - 1.0) < 1e-12

    def test_midnight_wrap(self, ray_session):
        from datatest_ray.stages.temporal import circular_hour_stats

        # hours 23 and 1 average to midnight direction (angle 0),
        # where a linear mean would say 12:00
        t = pa.table({
            "g": ["w", "w"],
            "ts": _ts("2024-01-01T23:00:00", "2024-01-02T01:00:00"),
        })
        out = circular_hour_stats(_ds(t), "ts", by="g").to_pandas()
        assert abs(out.iloc[0]["mean_angle"]) < 1e-12


class TestDispersionIndex:
    def test_regular_vs_bursty(self, ray_session):
        from datatest_ray.stages.temporal import dispersion_index_hourly

        # "reg": exactly 2 events in each of 4 hours -> var 0 -> D=0
        # "burst": 8 events in one hour, 1 in each of 3 others
        reg = [np.datetime64(f"2024-01-01T{h:02d}:0{m}:00", "us")
               for h in range(4) for m in range(2)]
        burst = ([np.datetime64("2024-01-01T00:00:00", "us")] * 8
                 + [np.datetime64(f"2024-01-01T{h:02d}:00:00", "us")
                    for h in (1, 2, 3)])
        t = pa.table({
            "g": ["reg"] * len(reg) + ["burst"] * len(burst),
            "ts": pa.array(reg + burst, pa.timestamp("us")),
        })
        out = dispersion_index_hourly(_ds(t), "ts",
                                      by="g").to_pandas().set_index("g")
        assert out.loc["reg", "dispersion"] == 0.0
        assert out.loc["reg", "n_buckets"] == 4
        # burst: counts [8,1,1,1], mean 11/4, var (by population formula)
        c = np.array([8, 1, 1, 1], dtype=np.float64)
        d = c.var() / c.mean()
        assert abs(out.loc["burst", "dispersion"] - d) < 1e-12
