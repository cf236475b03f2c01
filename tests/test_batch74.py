"""Batch 74: ECOD outlier top-k (oracle parity covered by
test_oracle.py)."""

import numpy as np
import pyarrow as pa


def _ds(t, n=3):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestEcod:
    def test_planted_outlier_ranks_first(self, ray_session):
        from datatest_ray.stages.robust import ecod_topk

        rng = np.random.RandomState(0)
        n = 400
        a = np.round(rng.normal(50, 5, n), 2)
        b = np.round(rng.normal(100, 10, n), 2)
        a[7], b[7] = 500.0, 0.01     # extreme in both dims
        t = pa.table({
            "id": pa.array(range(n), pa.int64()),
            "sub": pa.array([0] * n, pa.int64()),
            "a": pa.array(a, pa.float64()),
            "b": pa.array(b, pa.float64()),
        })
        out = ecod_topk(_ds(t), cols=["a", "b"],
                        key_cols=["id", "sub"], k=5).take_all()
        assert out[0]["id"] == 7
        assert out[0]["score"] >= out[-1]["score"]

    def test_matches_brute_force_scores(self, ray_session):
        from datatest_ray.stages.robust import ecod_topk

        rng = np.random.RandomState(2)
        n = 120
        a = np.round(rng.uniform(0, 10, n), 1)
        t = pa.table({"id": pa.array(range(n), pa.int64()),
                      "sub": pa.array([0] * n, pa.int64()),
                      "a": pa.array(a, pa.float64())})
        out = ecod_topk(_ds(t), cols=["a"], key_cols=["id", "sub"],
                        k=3).take_all()
        # brute force on cents
        c = np.rint(a * 100).astype(np.int64)
        scores = []
        for x in c:
            pl = (c <= x).sum() / n
            pr = (c >= x).sum() / n
            scores.append(-np.log(min(pl, pr)))
        order = np.lexsort((np.arange(n), -np.array(scores)))
        for r, j in zip(out, order[:3]):
            assert r["id"] == j
            assert abs(r["score"] - round(scores[j], 6)) < 1e-9
