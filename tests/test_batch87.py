"""Batch 87: embedding hubness (oracle parity covered by
test_oracle.py)."""

import numpy as np
import pyarrow as pa


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestHubness:
    def _run(self, vecs, k=3, n_queries=20):
        from datatest_ray.stages.similarity import hubness

        t = pa.table({
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([list(v) for v in vecs],
                                  pa.list_(pa.float32())),
        })
        return hubness(_ds(t), id_col="vec_id", vec_col="embedding",
                       k=k, n_queries=n_queries).take_all()[0]

    def test_planted_hub_dominates(self, ray_session):
        rng = np.random.RandomState(0)
        # noisy copies of one direction u, plus the NOISELESS u: u is
        # the highest-cosine neighbor of nearly every query
        u = np.ones(6)
        pts = (u[None, :] + rng.normal(0, 0.8, (60, 6)))
        vecs = np.vstack([pts, u[None, :]]).astype(np.float32)
        out = self._run(list(vecs), k=3, n_queries=30)
        # the noiseless u collects several times the ~1.6 average
        # in-degree (30 queries x 3 slots over ~55 touched neighbors)
        assert out["max_indeg"] >= 5
        assert out["indeg_skew"] is not None and out["indeg_skew"] > 0.5

    def test_counts_consistent(self, ray_session):
        rng = np.random.RandomState(1)
        vecs = rng.normal(0, 1, (50, 8)).astype(np.float32)
        out = self._run(list(vecs), k=4, n_queries=25)
        assert out["n_queries"] == 25
        # total in-degree = queries * k, so the max is bounded by it
        assert out["max_indeg"] <= 25 * 4
        assert out["n_neighbors"] <= 50
