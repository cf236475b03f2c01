"""Batch 62: k-NN label purity, polynomial-kernel MMD, phash bit
balance (oracle parity for the first two covered by test_oracle.py)."""

import numpy as np
import pyarrow as pa


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestKnnLabelPurity:
    def test_separable_clusters_pure(self, ray_session):
        from datatest_ray.stages.similarity import knn_label_purity

        rng = np.random.RandomState(0)
        # two tight, far-apart clusters
        a = rng.normal(0, 0.05, (30, 8)) + np.array([10.0] + [0] * 7)
        b = rng.normal(0, 0.05, (30, 8)) + np.array([0] * 7 + [10.0])
        vecs = np.vstack([a, b]).astype(np.float32)
        t = pa.table({
            "vec_id": pa.array(range(60), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array([0] * 30 + [1] * 30, pa.int32()),
        })
        out = {r["label"]: r for r in knn_label_purity(
            _ds(t), id_col="vec_id", vec_col="embedding",
            label_col="label", k=3, n_queries=40).take_all()}
        assert out[0]["purity"] == 1.0
        assert out[1]["purity"] == 1.0
        assert out[0]["n_pairs"] == out[0]["n_queries"] * 3

    def test_shuffled_labels_impure(self, ray_session):
        from datatest_ray.stages.similarity import knn_label_purity

        rng = np.random.RandomState(1)
        vecs = rng.normal(0, 1, (80, 8)).astype(np.float32)
        t = pa.table({
            "vec_id": pa.array(range(80), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(list(rng.randint(0, 4, 80)), pa.int32()),
        })
        out = knn_label_purity(_ds(t), id_col="vec_id",
                               vec_col="embedding", label_col="label",
                               k=5, n_queries=40).take_all()
        overall = (sum(r["n_same"] for r in out)
                   / sum(r["n_pairs"] for r in out))
        assert overall < 0.5  # ~0.25 expected for 4 random labels


class TestMmdPoly:
    def _run(self, xa, xb):
        from datatest_ray.stages.stattests import mmd_poly

        t = pa.table({
            "g": pa.array(["a"] * len(xa) + ["b"] * len(xb)),
            "v": pa.array(list(xa) + list(xb), pa.float64()),
        })
        return mmd_poly(_ds(t), value_col="v", group_col="g",
                        a="a", b="b", scale=1.0).take_all()[0]

    def test_identical_samples_zero(self, ray_session):
        x = list(np.linspace(1, 5, 50))
        out = self._run(x, x)
        assert out["mmd2"] == 0.0

    def test_matches_closed_form(self, ray_session):
        rng = np.random.RandomState(5)
        xa = rng.normal(0, 1, 60)
        xb = rng.normal(1, 2, 80)
        out = self._run(xa, xb)
        dm2 = (xa ** 2).mean() - (xb ** 2).mean()
        dm1 = xa.mean() - xb.mean()
        expect = dm2 * dm2 + 2 * dm1 * dm1
        assert abs(out["mmd2"] - expect) < 1e-6
        assert out["mmd2"] > 0


class TestPhashBitBalance:
    def test_counts_match_brute_force(self, ray_session):
        from datatest_ray.stages.imaging import phash_bit_balance

        rng = np.random.RandomState(7)
        h = rng.randint(0, 2 ** 63, 500, dtype=np.int64)
        t = pa.table({"phash": pa.array(h, pa.int64())})
        out = phash_bit_balance(_ds(t, 3), hash_col="phash").take_all()
        assert len(out) == 64
        u = h.astype(np.uint64)
        for r in out:
            expect = int(((u >> np.uint64(r["bit"]))
                          & np.uint64(1)).sum())
            assert r["ones"] == expect
            assert r["n"] == 500
            assert r["frac"] == round(expect / 500, 6)

    def test_stuck_bit_detected(self, ray_session):
        from datatest_ray.stages.imaging import phash_bit_balance

        # bit 3 always set, bit 5 never
        h = np.full(100, 0b1000, dtype=np.int64)
        t = pa.table({"phash": pa.array(h, pa.int64())})
        out = {r["bit"]: r for r in phash_bit_balance(
            _ds(t, 1), hash_col="phash").take_all()}
        assert out[3]["frac"] == 1.0
        assert out[5]["frac"] == 0.0
