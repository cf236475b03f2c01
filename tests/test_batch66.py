"""Batch 66: expected shortfall, mean-excess POT slope, Taylor's law
(oracle parity covered by test_oracle.py)."""

import numpy as np
import pyarrow as pa


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestExpectedShortfall:
    def test_known_tail(self, ray_session):
        from datatest_ray.stages.robust import expected_shortfall

        vals = [float(i) for i in range(1, 101)]  # 1..100
        t = pa.table({"v": pa.array(vals, pa.float64())})
        out = expected_shortfall(_ds(t), col="v", q=0.95).take_all()[0]
        # top 5 values: 96..100 -> mean 98; VaR95 = 95
        assert out["m"] == 5
        assert out["es"] == 98.0
        assert out["var_q"] == 95.0

    def test_boundary_block_partial_take(self, ray_session):
        from datatest_ray.stages.robust import expected_shortfall

        # 10 values, top-2 tail, but the 3 largest are tied at 50:
        # tail = two of the 50s -> ES = 50
        vals = [1.0] * 7 + [50.0] * 3
        t = pa.table({"v": pa.array(vals, pa.float64())})
        out = expected_shortfall(_ds(t, 1), col="v", q=0.8).take_all()[0]
        assert out["m"] == 2
        assert out["es"] == 50.0

    def test_es_dominates_var(self, ray_session):
        from datatest_ray.stages.robust import expected_shortfall

        rng = np.random.RandomState(3)
        vals = np.round(np.exp(rng.normal(3, 1, 2000)), 2)
        t = pa.table({"v": pa.array(vals, pa.float64())})
        out = expected_shortfall(_ds(t), col="v", q=0.95).take_all()[0]
        assert out["es"] > out["var_q"]


class TestMeanExcess:
    def test_exponential_flat_slope(self, ray_session):
        from datatest_ray.stages.robust import mean_excess_slope

        # exponential tail: e(u) constant = 1/lambda -> slope ~ 0
        u = (np.arange(1, 8001) - 0.5) / 8000.0
        x = np.round(-np.log(1 - u) * 10.0, 2)
        t = pa.table({"v": pa.array(x, pa.float64())})
        out = mean_excess_slope(_ds(t), col="v",
                                thresholds=(5.0, 10.0, 15.0,
                                            20.0)).take_all()
        assert len(out) == 4
        slope = out[0]["me_slope"]
        assert abs(slope) < 0.15
        for r in out:
            assert abs(r["mean_ex"] - 10.0) < 1.5

    def test_uniform_negative_slope(self, ray_session):
        from datatest_ray.stages.robust import mean_excess_slope

        x = np.round(np.linspace(0, 100, 5000), 2)
        t = pa.table({"v": pa.array(x, pa.float64())})
        out = mean_excess_slope(_ds(t), col="v",
                                thresholds=(20.0, 40.0,
                                            60.0, 80.0)).take_all()
        # bounded support: e(u) = (max-u)/2, slope -1/2
        assert abs(out[0]["me_slope"] + 0.5) < 0.02


class TestTaylorsLaw:
    def test_poisson_like_slope_one(self, ray_session):
        from datatest_ray.stages.stattests import taylors_law

        rng = np.random.RandomState(5)
        g, v = [], []
        for i, lam in enumerate([3, 8, 20, 50, 120, 300]):
            draws = rng.poisson(lam, 400).astype(float)
            g.extend([i] * 400)
            v.extend(draws)
        t = pa.table({"g": pa.array(g, pa.int64()),
                      "v": pa.array(v, pa.float64())})
        out = taylors_law(_ds(t), group_col="g",
                          value_col="v").take_all()[0]
        assert out["n_groups"] == 6
        assert abs(out["b"] - 1.0) < 0.15

    def test_small_groups_excluded(self, ray_session):
        from datatest_ray.stages.stattests import taylors_law

        t = pa.table({"g": pa.array([1, 1, 2, 2], pa.int64()),
                      "v": pa.array([1.0, 2.0, 3.0, 4.0])})
        out = taylors_law(_ds(t, 1), group_col="g", value_col="v",
                          min_n=5).take_all()[0]
        assert out["n_groups"] == 0 and out["b"] is None
