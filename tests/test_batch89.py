"""Batch 89: AUC with Hanley-McNeil CI, overdispersion z (oracle
parity covered by test_oracle.py)."""

import numpy as np
import pyarrow as pa


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestAucWithCi:
    def _run(self, pos_scores, neg_scores):
        from datatest_ray.stages.stattests import auc_with_ci

        t = pa.table({
            "g": pa.array(["p"] * len(pos_scores)
                          + ["n"] * len(neg_scores)),
            "s": pa.array(list(pos_scores) + list(neg_scores),
                          pa.float64()),
        })
        return auc_with_ci(_ds(t), score_col="s", group_col="g",
                           pos="p", neg="n").take_all()[0]

    def test_perfect_separation(self, ray_session):
        out = self._run([10.0, 11.0, 12.0], [1.0, 2.0, 3.0])
        assert out["auc"] == 1.0
        assert out["se"] == 0.0

    def test_random_scores_half(self, ray_session):
        rng = np.random.RandomState(0)
        pos = np.round(rng.uniform(0, 1, 400), 3)
        neg = np.round(rng.uniform(0, 1, 400), 3)
        out = self._run(pos, neg)
        assert abs(out["auc"] - 0.5) < 0.05
        assert out["ci_lo"] < 0.5 < out["ci_hi"]

    def test_ties_count_half(self, ray_session):
        out = self._run([1.0, 1.0], [1.0, 1.0])
        assert out["auc"] == 0.5


class TestOverdispersion:
    def _run(self, counts):
        from datatest_ray.stages.stattests import overdispersion_test

        rows = []
        for uid, c in enumerate(counts):
            rows.extend([uid] * int(c))
        t = pa.table({"u": pa.array(rows, pa.int64())})
        return overdispersion_test(_ds(t, 4),
                                   group_col="u").take_all()[0]

    def test_poisson_counts_near_zero(self, ray_session):
        rng = np.random.RandomState(2)
        counts = rng.poisson(8, 800)
        counts = counts[counts > 0]
        out = self._run(counts)
        assert abs(out["z"]) < 4.0

    def test_clustered_counts_large_z(self, ray_session):
        rng = np.random.RandomState(3)
        # negative-binomial-ish: half quiet users, half whales
        counts = np.concatenate([rng.poisson(2, 300) + 1,
                                 rng.poisson(60, 300)])
        out = self._run(counts)
        assert out["z"] > 10.0
        assert out["var"] > out["mean"]
