"""Batch 71: Matthews correlation, Youden-J threshold (oracle parity
covered by test_oracle.py)."""

import numpy as np
import pyarrow as pa


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestMcc:
    def _run(self, flags, labels):
        from datatest_ray.stages.mlprep import mcc_binary

        t = pa.table({"f": pa.array([bool(v) for v in flags]),
                      "y": pa.array([bool(v) for v in labels])})
        return mcc_binary(_ds(t), flag_expr=lambda b: b.column("f"),
                          label_expr=lambda b: b.column("y")
                          ).take_all()[0]

    def test_perfect_agreement(self, ray_session):
        out = self._run([1, 1, 0, 0] * 5, [1, 1, 0, 0] * 5)
        assert out["mcc"] == 1.0

    def test_perfect_disagreement(self, ray_session):
        out = self._run([1, 0] * 10, [0, 1] * 10)
        assert out["mcc"] == -1.0

    def test_independent_near_zero(self, ray_session):
        rng = np.random.RandomState(3)
        f = list(rng.randint(0, 2, 500))
        y = list(rng.randint(0, 2, 500))
        out = self._run(f, y)
        assert abs(out["mcc"]) < 0.12

    def test_degenerate_null(self, ray_session):
        out = self._run([1, 1, 1], [1, 0, 1])
        assert out["mcc"] is None  # no negatives flagged


class TestYouden:
    def _run(self, scores, labels):
        from datatest_ray.stages.mlprep import youden_threshold

        t = pa.table({"s": pa.array(scores, pa.float64()),
                      "y": pa.array([bool(v) for v in labels])})
        return youden_threshold(
            _ds(t), score_col="s",
            label_expr=lambda b: b.column("y")).take_all()[0]

    def test_separable_finds_gap(self, ray_session):
        scores = [1.0, 2.0, 3.0, 10.0, 11.0, 12.0]
        labels = [0, 0, 0, 1, 1, 1]
        out = self._run(scores, labels)
        # any cut in (3, 10] is perfect; smallest distinct score cut
        # with max J is 3.0 (predict positive when score > 3)
        assert out["threshold"] == 3.0
        assert out["j"] == 1.0
        assert out["tpr"] == 1.0 and out["tnr"] == 1.0

    def test_all_one_class_null(self, ray_session):
        out = self._run([1.0, 2.0, 3.0], [1, 1, 1])
        assert out["threshold"] is None

    def test_overlapping_classes(self, ray_session):
        rng = np.random.RandomState(1)
        neg = list(np.round(rng.normal(10, 2, 300), 2))
        pos = list(np.round(rng.normal(14, 2, 300), 2))
        out = self._run(neg + pos, [0] * 300 + [1] * 300)
        # optimal cut sits between the means; J ~ 2*Phi(1)-1 ~ 0.68
        assert 10.5 < out["threshold"] < 13.5
        assert 0.45 < out["j"] < 0.8
