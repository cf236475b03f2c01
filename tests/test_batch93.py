"""Batch 93: capacity profile, effective rank (capacity oracle parity
covered by test_oracle.py)."""

import datetime

import numpy as np
import pyarrow as pa


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestCapacityProfile:
    def _daily(self, counts):
        ts, day0 = [], datetime.datetime(2024, 1, 1)
        for d, c in enumerate(counts):
            ts.extend([day0 + datetime.timedelta(days=d)] * c)
        return pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                         "event_type": pa.array(["a"] * len(ts))})

    def test_known_profile(self, ray_session):
        from datatest_ray.stages.temporal import capacity_profile_daily

        counts = [10] * 19 + [100]
        out = capacity_profile_daily(_ds(self._daily(counts)), "ts",
                                     by="event_type").take_all()[0]
        mean = (19 * 10 + 100) / 20
        assert out["mean"] == round(mean, 6)
        assert out["max"] == 100
        # rank ceil(0.95*20) = 19 lands on the 19th of 19 tens
        assert out["p95"] == 10
        assert out["par"] == round(100 / mean, 6)

    def test_flat_series_par_one(self, ray_session):
        from datatest_ray.stages.temporal import capacity_profile_daily

        out = capacity_profile_daily(_ds(self._daily([7] * 15), 1),
                                     "ts", by="event_type").take_all()[0]
        assert out["par"] == 1.0 and out["p95_ratio"] == 1.0


class TestEffectiveRank:
    def _run(self, vecs):
        from datatest_ray.stages.similarity import effective_rank

        t = pa.table({"embedding": pa.array(
            [list(v) for v in vecs], pa.list_(pa.float32()))})
        return effective_rank(_ds(t, 3),
                              vec_col="embedding").take_all()[0]

    def test_isotropic_near_dim(self, ray_session):
        rng = np.random.RandomState(0)
        out = self._run(rng.normal(0, 1, (2000, 8)).astype(np.float32))
        assert out["dim"] == 8
        assert out["erank"] > 7.5

    def test_rank_one_cloud(self, ray_session):
        rng = np.random.RandomState(1)
        base = rng.normal(0, 1, 8)
        vecs = (np.outer(rng.normal(0, 1, 300), base)
                + rng.normal(0, 1e-4, (300, 8))).astype(np.float32)
        out = self._run(vecs)
        assert out["erank"] < 1.3
        assert out["top1_share"] > 0.95

    def test_matches_numpy(self, ray_session):
        rng = np.random.RandomState(2)
        vecs = rng.normal(0, 1, (150, 5)).astype(np.float32)
        out = self._run(vecs)
        x = vecs.astype(np.float64)
        cov = np.cov(x.T)
        lam = np.linalg.eigvalsh(cov)
        lam = lam[lam > 0]
        p = lam / lam.sum()
        erank = np.exp(-(p * np.log(p)).sum())
        assert abs(out["erank"] - erank) < 1e-4
