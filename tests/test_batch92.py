"""Batch 92: running records, time reversibility (oracle parity
covered by test_oracle.py)."""

import datetime

import numpy as np
import pyarrow as pa


def _daily(counts, et="a"):
    ts, day0 = [], datetime.datetime(2024, 1, 1)
    for d, c in enumerate(counts):
        ts.extend([day0 + datetime.timedelta(days=d)] * c)
    return pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                     "event_type": pa.array([et] * len(ts))})


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestRecords:
    def test_monotone_all_records(self, ray_session):
        from datatest_ray.stages.temporal import records_daily

        out = records_daily(_ds(_daily(list(range(1, 21)))), "ts",
                            by="event_type").take_all()[0]
        assert out["n_records"] == 20
        assert out["z"] > 5.0

    def test_early_peak_few_records(self, ray_session):
        from datatest_ray.stages.temporal import records_daily

        counts = [100] + [10] * 29
        out = records_daily(_ds(_daily(counts)), "ts",
                            by="event_type").take_all()[0]
        assert out["n_records"] == 1
        assert out["z"] < -1.5

    def test_expected_is_harmonic(self, ray_session):
        from datatest_ray.stages.temporal import records_daily

        out = records_daily(_ds(_daily([5] * 10), 1), "ts",
                            by="event_type").take_all()[0]
        h10 = sum(1.0 / k for k in range(1, 11))
        assert out["expected"] == round(h10, 6)


class TestTimeReversibility:
    def test_sawtooth_strongly_asymmetric(self, ray_session):
        from datatest_ray.stages.temporal import (
            time_reversibility_daily)

        # slow ramp up, instant crash: many small +1 diffs, few -9
        cycle = list(range(10, 20)) + [10]
        out = time_reversibility_daily(
            _ds(_daily(cycle * 4)), "ts", by="event_type").take_all()[0]
        assert out["trev"] < -0.5

    def test_symmetric_alternation_near_zero(self, ray_session):
        from datatest_ray.stages.temporal import (
            time_reversibility_daily)

        out = time_reversibility_daily(
            _ds(_daily([10, 20] * 10), 1), "ts",
            by="event_type").take_all()[0]
        assert abs(out["trev"]) < 0.2
