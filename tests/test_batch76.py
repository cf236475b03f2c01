"""Batch 76: Box-Cox lambda scan, Lorenz asymmetry (oracle parity
covered by test_oracle.py)."""

import numpy as np
import pyarrow as pa


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestBoxCoxScan:
    def test_lognormal_prefers_log(self, ray_session):
        from datatest_ray.stages.robust import boxcox_scan

        rng = np.random.RandomState(0)
        x = np.exp(rng.normal(3, 1, 4000))
        t = pa.table({"v": pa.array(np.round(x, 4), pa.float64())})
        out = boxcox_scan(_ds(t), col="v").take_all()
        best = [r for r in out if r["best"] == 1]
        assert len(best) == 1
        assert best[0]["lam"] == 0.0     # log is the right transform

    def test_normal_prefers_identity(self, ray_session):
        from datatest_ray.stages.robust import boxcox_scan

        rng = np.random.RandomState(1)
        x = rng.normal(100, 5, 4000)     # already normal, positive
        t = pa.table({"v": pa.array(np.round(x, 4), pa.float64())})
        out = boxcox_scan(_ds(t), col="v").take_all()
        best = [r for r in out if r["best"] == 1][0]
        assert best["lam"] in (0.5, 1.0)  # near-identity wins


class TestLorenzAsymmetry:
    def test_few_giants_s_above_one(self, ray_session):
        from datatest_ray.stages.robust import lorenz_asymmetry

        vals = [10.0] * 95 + [1000.0] * 5
        t = pa.table({"v": pa.array(vals, pa.float64())})
        out = lorenz_asymmetry(_ds(t), col="v").take_all()[0]
        # 95% of units sit below the mean but hold a small share:
        # f_mu large, l_mu small
        assert out["f_mu"] == 0.95
        assert out["l_mu"] < 0.2

    def test_symmetric_low_spread_near_one(self, ray_session):
        from datatest_ray.stages.robust import lorenz_asymmetry

        # symmetric with small relative spread: S -> 1 (Damgaard &
        # Weiner); high-cv symmetric data legitimately sits below 1
        vals = list(np.linspace(90, 110, 81))
        t = pa.table({"v": pa.array(vals, pa.float64())})
        out = lorenz_asymmetry(_ds(t), col="v").take_all()[0]
        assert abs(out["s"] - 1.0) < 0.06
        assert out["f_mu"] < 0.51
