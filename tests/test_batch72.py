"""Batch 72: discrete power-law alpha, gamma moments fit (oracle
parity covered by test_oracle.py)."""

import numpy as np
import pyarrow as pa


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestPowerlawAlpha:
    def test_recovers_planted_exponent(self, ray_session):
        from datatest_ray.stages.stattests import powerlaw_alpha

        # zeta(2.5)-ish sample via inverse CDF over a finite support
        rng = np.random.RandomState(0)
        alpha = 2.5
        xs = np.arange(5, 2000)
        p = xs.astype(float) ** -alpha
        p /= p.sum()
        counts = rng.choice(xs, size=4000, p=p)
        rows = []
        for uid, c in enumerate(counts):
            rows.extend([uid] * int(c))
        t = pa.table({"user_id": pa.array(rows, pa.int64())})
        out = powerlaw_alpha(_ds(t, 4), group_col="user_id",
                             x_min=5).take_all()[0]
        assert out["n_tail"] == 4000
        assert abs(out["alpha"] - alpha) < 0.1

    def test_empty_tail_null(self, ray_session):
        from datatest_ray.stages.stattests import powerlaw_alpha

        t = pa.table({"user_id": pa.array([1, 2, 3], pa.int64())})
        out = powerlaw_alpha(_ds(t, 1), group_col="user_id",
                             x_min=5).take_all()[0]
        assert out["alpha"] is None


class TestGammaMomentsFit:
    def test_recovers_planted_shape(self, ray_session):
        from datatest_ray.stages.stattests import gamma_moments_fit

        rng = np.random.RandomState(2)
        x = rng.gamma(shape=3.0, scale=7.0, size=20000)
        t = pa.table({"v": pa.array(np.round(x, 4), pa.float64())})
        out = gamma_moments_fit(_ds(t, 4), value_col="v").take_all()[0]
        assert abs(out["shape"] - 3.0) < 0.15
        assert abs(out["scale"] - 7.0) < 0.4
        assert abs(out["mean"] - 21.0) < 0.5

    def test_exponential_shape_one(self, ray_session):
        from datatest_ray.stages.stattests import gamma_moments_fit

        u = (np.arange(1, 5001) - 0.5) / 5000.0
        x = -np.log(1 - u) * 4.0
        t = pa.table({"v": pa.array(x, pa.float64())})
        out = gamma_moments_fit(_ds(t), value_col="v").take_all()[0]
        assert abs(out["shape"] - 1.0) < 0.05
        assert abs(out["scale"] - 4.0) < 0.25
