"""Batch 64: hash-seeded permutation test, Mantel-Haenszel pooled OR,
systematic PPS sampling (oracle parity covered by test_oracle.py)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestPermTest:
    def _run(self, xa, xb):
        from datatest_ray.stages.stattests import perm_test_two_sample

        t = pa.table({
            "id": pa.array(range(len(xa) + len(xb)), pa.int64()),
            "g": pa.array(["a"] * len(xa) + ["b"] * len(xb)),
            "v": pa.array(list(xa) + list(xb), pa.float64()),
        })
        return perm_test_two_sample(
            _ds(t), value_col="v", group_col="g", id_col="id",
            a="a", b="b", n_perm=200).take_all()[0]

    def test_big_shift_significant(self, ray_session):
        rng = np.random.RandomState(2)
        xa = np.round(rng.normal(0, 1, 80), 2)
        xb = np.round(rng.normal(10, 1, 80), 2)
        out = self._run(xa, xb)
        assert out["p"] < 0.02
        assert abs(out["obs_diff"] + 10) < 1.0

    def test_null_effect_insignificant(self, ray_session):
        rng = np.random.RandomState(4)
        pooled = np.round(rng.normal(5, 2, 200), 2)
        out = self._run(pooled[:100], pooled[100:])
        assert out["p"] > 0.05

    def test_deterministic_across_partitionings(self, ray_session):
        rng = np.random.RandomState(6)
        xa = np.round(rng.normal(0, 1, 50), 2)
        xb = np.round(rng.normal(0.5, 1, 50), 2)
        from datatest_ray.stages.stattests import perm_test_two_sample

        t = pa.table({
            "id": pa.array(range(100), pa.int64()),
            "g": pa.array(["a"] * 50 + ["b"] * 50),
            "v": pa.array(list(xa) + list(xb), pa.float64()),
        })
        r1 = perm_test_two_sample(_ds(t, 1), value_col="v",
                                  group_col="g", id_col="id", a="a",
                                  b="b").take_all()[0]
        r2 = perm_test_two_sample(_ds(t, 7), value_col="v",
                                  group_col="g", id_col="id", a="a",
                                  b="b").take_all()[0]
        assert r1 == r2


class TestMantelHaenszel:
    def test_simpsons_paradox_adjusted(self, ray_session):
        from datatest_ray.stages.stattests import mantel_haenszel

        # within each stratum exposure has NO effect (OR = 1), but
        # stratum sizes + base rates make the crude OR far from 1
        rows = []
        # stratum 0: high outcome rate, mostly exposed
        rows += [(0, 1, 1)] * 80 + [(0, 1, 0)] * 20
        rows += [(0, 0, 1)] * 8 + [(0, 0, 0)] * 2
        # stratum 1: low outcome rate, mostly unexposed
        rows += [(1, 1, 1)] * 2 + [(1, 1, 0)] * 8
        rows += [(1, 0, 1)] * 20 + [(1, 0, 0)] * 80
        t = pa.table({
            "s": pa.array([r[0] for r in rows], pa.int64()),
            "e": pa.array([bool(r[1]) for r in rows]),
            "o": pa.array([bool(r[2]) for r in rows]),
        })
        out = mantel_haenszel(
            _ds(t), strata_expr=lambda b: b.column("s"),
            exposure_expr=lambda b: b.column("e"),
            outcome_expr=lambda b: b.column("o")).take_all()[0]
        assert out["n_strata"] == 2
        assert out["or_mh"] == 1.0          # no within-stratum effect
        assert out["or_crude"] > 3.0        # confounded crude estimate


class TestPpsSystematic:
    def test_weights_drive_selection(self, ray_session):
        from datatest_ray.stages.sampling import pps_systematic

        # one key holds 90% of the weight: it must win most draws
        keys = list(range(1, 21))
        w = [1.0] * 19 + [171.0]
        t = pa.table({"k": pa.array(keys, pa.int64()),
                      "w": pa.array(w, pa.float64())})
        out = pps_systematic(_ds(t), key_col="k", weight_col="w",
                             k=10).take_all()
        assert len(out) == 10
        heavy = sum(1 for r in out if r["k"] == 20)
        assert heavy >= 8

    def test_uniform_weights_stride_evenly(self, ray_session):
        from datatest_ray.stages.sampling import pps_systematic

        t = pa.table({"k": pa.array(range(100), pa.int64()),
                      "w": pa.array([1.0] * 100, pa.float64())})
        out = pps_systematic(_ds(t), key_col="k", weight_col="w",
                             k=10).take_all()
        # mid-stride target (2i+1)T/2k first reaches cum at key 10i+4
        assert [r["k"] for r in out] == [4, 14, 24, 34, 44, 54, 64,
                                         74, 84, 94]

    def test_nonpositive_weights_dropped(self, ray_session):
        from datatest_ray.stages.sampling import pps_systematic

        t = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                      "w": pa.array([-5.0, 0.0, 2.0], pa.float64())})
        out = pps_systematic(_ds(t, 1), key_col="k", weight_col="w",
                             k=3).take_all()
        assert all(r["k"] == 3 for r in out)
