"""Batch 73: paired sign test, Lin's CCC, weighted kappa (oracle
parity covered by test_oracle.py)."""

import datetime

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _events_two_types(xa, xb):
    ts, et = [], []
    day0 = datetime.datetime(2024, 1, 1)
    for d, (ca, cb) in enumerate(zip(xa, xb)):
        t = day0 + datetime.timedelta(days=d)
        ts.extend([t] * ca + [t] * cb)
        et.extend(["click"] * ca + ["purchase"] * cb)
    return pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                     "event_type": pa.array(et)})


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestSignTest:
    def test_dominant_stream(self, ray_session):
        from datatest_ray.stages.temporal import sign_test_daily

        xa = [20] * 15
        xb = [5] * 14 + [20]  # one tie, otherwise clicks win
        out = sign_test_daily(
            _ds(_events_two_types(xa, xb)), "ts",
            type_col="event_type", type_a="click",
            type_b="purchase").take_all()[0]
        assert (out["n_pos"], out["n_neg"]) == (14, 0)
        assert out["z"] == round(14 / np.sqrt(14), 6)

    def test_all_ties_null(self, ray_session):
        from datatest_ray.stages.temporal import sign_test_daily

        out = sign_test_daily(
            _ds(_events_two_types([3] * 8, [3] * 8), 1), "ts",
            type_col="event_type", type_a="click",
            type_b="purchase").take_all()[0]
        assert out["z"] is None


class TestCcc:
    def test_identical_series_ccc_one(self, ray_session):
        from datatest_ray.stages.temporal import ccc_daily

        x = [5, 9, 14, 7, 11] * 4
        out = ccc_daily(_ds(_events_two_types(x, x)), "ts",
                        type_col="event_type", type_a="click",
                        type_b="purchase").take_all()[0]
        assert out["r"] == 1.0
        assert out["ccc"] == 1.0

    def test_offset_series_penalized(self, ray_session):
        from datatest_ray.stages.temporal import ccc_daily

        x = [5, 9, 14, 7, 11] * 4
        y = [v + 20 for v in x]  # perfectly correlated, offset
        out = ccc_daily(_ds(_events_two_types(x, y)), "ts",
                        type_col="event_type", type_a="click",
                        type_b="purchase").take_all()[0]
        assert out["r"] == 1.0
        assert out["ccc"] < 0.2   # CCC punishes the location shift


class TestWeightedKappa:
    def _run(self, a, b, k=5):
        from datatest_ray.stages.mlprep import weighted_kappa

        t = pa.table({"a": pa.array(a, pa.int64()),
                      "b": pa.array(b, pa.int64())})
        return weighted_kappa(
            _ds(t), rater_a_expr=lambda x: x.column("a"),
            rater_b_expr=lambda x: x.column("b"),
            k_levels=k).take_all()[0]

    def test_perfect_agreement(self, ray_session):
        a = [1, 2, 3, 4, 5] * 10
        out = self._run(a, a)
        assert out["kappa_w"] == 1.0

    def test_near_miss_beats_far_miss(self, ray_session):
        a = [1, 2, 3, 4, 5] * 20
        near = [min(v + 1, 5) for v in a]        # off by one
        far = [6 - v for v in a]                 # reversed
        k_near = self._run(a, near)["kappa_w"]
        k_far = self._run(a, far)["kappa_w"]
        assert k_near > 0.5
        assert k_far < 0.0
        assert k_near > k_far
