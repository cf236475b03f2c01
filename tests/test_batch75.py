"""Batch 75: weighted-Jaccard source similarity, Hotelling T^2
(source-similarity oracle parity covered by test_oracle.py)."""

import numpy as np
import pyarrow as pa


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestSourceSimilarity:
    def test_mirror_sources_top(self, ray_session):
        from datatest_ray.stages.text import source_similarity

        t = pa.table({
            "text": pa.array(["alpha beta beta", "alpha beta beta",
                              "gamma delta", "alpha gamma"]),
            "source": pa.array(["m1", "m2", "other", "mixed"]),
        })
        out = source_similarity(_ds(t), "text", source_col="source",
                                k=3).take_all()
        assert (out[0]["src_a"], out[0]["src_b"]) == ("m1", "m2")
        assert out[0]["wjac"] == 1.0      # identical bags

    def test_disjoint_vocab_zero(self, ray_session):
        from datatest_ray.stages.text import source_similarity

        t = pa.table({
            "text": pa.array(["a a b", "c d e"]),
            "source": pa.array(["s1", "s2"]),
        })
        out = source_similarity(_ds(t, 1), "text",
                                source_col="source").take_all()
        assert out[0]["wjac"] == 0.0


class TestHotellingT2:
    def _run(self, xa, xb):
        from datatest_ray.stages.similarity import hotelling_t2

        vecs = np.vstack([xa, xb]).astype(np.float32)
        t = pa.table({
            "embedding": pa.array([list(v) for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array([0] * len(xa) + [1] * len(xb),
                              pa.int32()),
        })
        return hotelling_t2(_ds(t, 3), vec_col="embedding",
                            label_col="label", label_a=0,
                            label_b=1).take_all()[0]

    def test_matches_brute_force(self, ray_session):
        rng = np.random.RandomState(1)
        xa = rng.normal(0, 1, (60, 4))
        xb = rng.normal(0.8, 1, (70, 4))
        out = self._run(xa, xb)
        # brute force
        xa64, xb64 = (np.float32(xa).astype(np.float64),
                      np.float32(xb).astype(np.float64))
        na, nb, d = len(xa64), len(xb64), 4
        mua, mub = xa64.mean(axis=0), xb64.mean(axis=0)
        ca = (xa64 - mua).T @ (xa64 - mua)
        cb = (xb64 - mub).T @ (xb64 - mub)
        sp = (ca + cb) / (na + nb - 2)
        diff = mua - mub
        t2 = (na * nb / (na + nb)) * float(
            diff @ np.linalg.solve(sp, diff))
        assert out["n_a"] == 60 and out["n_b"] == 70
        assert abs(out["t2"] - t2) < 1e-3
        assert out["f"] > 5.0            # strong planted shift

    def test_same_cloud_small(self, ray_session):
        rng = np.random.RandomState(4)
        pooled = rng.normal(0, 1, (160, 5))
        out = self._run(pooled[:80], pooled[80:])
        assert out["f"] < 2.5
