"""Batch 80: interquartile mean, Davies-Bouldin index (iqm oracle
parity covered by test_oracle.py)."""

import numpy as np
import pyarrow as pa


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestInterquartileMean:
    def test_divisible_by_four(self, ray_session):
        from datatest_ray.stages.robust import interquartile_mean

        t = pa.table({"v": pa.array([float(i) for i in range(1, 9)])})
        out = interquartile_mean(_ds(t), col="v").take_all()[0]
        assert out["iqm"] == 4.5          # mean of 3,4,5,6

    def test_fractional_boundary(self, ray_session):
        from datatest_ray.stages.robust import interquartile_mean

        # n=6: trim 1.5 each side -> (0.5*2 + 3 + 4 + 0.5*5)/3 = 3.5
        t = pa.table({"v": pa.array([float(i) for i in range(1, 7)])})
        out = interquartile_mean(_ds(t, 1), col="v").take_all()[0]
        assert out["iqm"] == 3.5

    def test_outlier_immune(self, ray_session):
        from datatest_ray.stages.robust import interquartile_mean

        base = [float(i) for i in range(1, 101)]
        spiked = base[:-1] + [1e9]
        a = interquartile_mean(
            _ds(pa.table({"v": pa.array(base)})), col="v"
        ).take_all()[0]["iqm"]
        b = interquartile_mean(
            _ds(pa.table({"v": pa.array(spiked)})), col="v"
        ).take_all()[0]["iqm"]
        assert abs(a - b) < 1.0


class TestDaviesBouldin:
    def _run(self, vecs, labels):
        from datatest_ray.stages.similarity import (
            davies_bouldin_labels)

        t = pa.table({
            "embedding": pa.array([list(v) for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        })
        return davies_bouldin_labels(
            _ds(t, 3), vec_col="embedding",
            label_col="label").take_all()[0]

    def test_matches_brute_force(self, ray_session):
        rng = np.random.RandomState(0)
        a = rng.normal(0, 1, (40, 4)) + [5, 0, 0, 0]
        b = rng.normal(0, 1, (40, 4)) - [5, 0, 0, 0]
        vecs = np.vstack([a, b]).astype(np.float32)
        labels = [0] * 40 + [1] * 40
        out = self._run(vecs, labels)
        x = vecs.astype(np.float64)
        cents = [x[:40].mean(axis=0), x[40:].mean(axis=0)]
        s = [np.sqrt(((x[:40] - cents[0]) ** 2).sum(axis=1)).mean(),
             np.sqrt(((x[40:] - cents[1]) ** 2).sum(axis=1)).mean()]
        dij = np.sqrt(((cents[0] - cents[1]) ** 2).sum())
        expect = (s[0] + s[1]) / dij
        assert out["k"] == 2
        assert abs(out["db"] - expect) < 1e-6

    def test_tight_far_clusters_low(self, ray_session):
        rng = np.random.RandomState(2)
        tight = np.vstack([
            rng.normal(0, 0.05, (30, 3)) + [10, 0, 0],
            rng.normal(0, 0.05, (30, 3)) - [10, 0, 0],
        ]).astype(np.float32)
        loose = np.vstack([
            rng.normal(0, 3, (30, 3)) + [1, 0, 0],
            rng.normal(0, 3, (30, 3)) - [1, 0, 0],
        ]).astype(np.float32)
        labels = [0] * 30 + [1] * 30
        db_tight = self._run(tight, labels)["db"]
        db_loose = self._run(loose, labels)["db"]
        assert db_tight < 0.05
        assert db_loose > 1.0
