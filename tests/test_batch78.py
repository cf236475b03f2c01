"""Batch 78: dow x hour chi-square, Benford second digit (oracle
parity covered by test_oracle.py)."""

import math

import numpy as np
import pyarrow as pa


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestBenfordSecondDigit:
    def test_benford_sample_fits(self, ray_session):
        from datatest_ray.stages.profile import benford_second_digit

        # log-uniform sample follows Benford in every digit position
        rng = np.random.RandomState(0)
        x = 10 ** rng.uniform(1, 5, 20000)
        t = pa.table({"v": pa.array(np.round(x, 2), pa.float64())})
        out = benford_second_digit(_ds(t), "v").take_all()
        assert len(out) == 10
        total_chi2 = sum(r["chi2_term"] for r in out)
        assert total_chi2 < 0.001        # tight fit at n=20k
        # expectation columns match the closed form
        for r in out:
            e = sum(math.log10(1 + 1 / (10 * d1 + r["digit"]))
                    for d1 in range(1, 10))
            assert r["expected"] == round(e, 6)

    def test_flat_second_digit_flagged(self, ray_session):
        from datatest_ray.stages.profile import benford_second_digit

        # doctored: second digit always 5
        vals = [float(f"{d1}5{d3}") for d1 in range(1, 10)
                for d3 in range(10) for _ in range(5)]
        t = pa.table({"v": pa.array(vals, pa.float64())})
        out = {r["digit"]: r for r in benford_second_digit(
            _ds(t, 1), "v").take_all()}
        assert out[5]["share"] == 1.0
        assert out[5]["chi2_term"] > 5.0

    def test_small_values_excluded(self, ray_session):
        from datatest_ray.stages.profile import benford_second_digit

        t = pa.table({"v": pa.array([5.0, 9.9, 42.0], pa.float64())})
        out = benford_second_digit(_ds(t, 1), "v").take_all()
        assert sum(r["n"] for r in out) == 1   # only 42 qualifies
