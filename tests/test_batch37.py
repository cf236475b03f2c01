"""Batch 37: Blomqvist's beta, ranking agreement (footrule / Kendall
distance / RBO) — oracle parity covered by test_oracle.py."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _ds(t: pa.Table):
    import ray.data as rd

    return rd.from_arrow(t)


class TestBlomqvistBeta:
    def test_perfect_monotone(self, ray_session):
        from datatest_ray.stages.stattests import blomqvist_beta

        x = np.arange(1.0, 22.0)  # odd count -> clean median 11
        t = pa.table({"x": pa.array(x), "y": pa.array(x * 3)})
        out = blomqvist_beta(_ds(t), x_col="x", y_col="y").to_pandas()
        r = out.iloc[0]
        assert r["x_med"] == 11.0 and r["y_med"] == 33.0
        assert r["n_pp"] == 10 and r["n_mm"] == 10
        assert r["beta"] == 1.0

    def test_anti_monotone(self, ray_session):
        from datatest_ray.stages.stattests import blomqvist_beta

        x = np.arange(1.0, 22.0)
        t = pa.table({"x": pa.array(x), "y": pa.array(-x)})
        out = blomqvist_beta(_ds(t), x_col="x", y_col="y").to_pandas()
        assert out.iloc[0]["beta"] == -1.0

    def test_on_median_points_excluded(self, ray_session):
        from datatest_ray.stages.stattests import blomqvist_beta

        # many points ON the median contribute to neither quadrant
        t = pa.table({"x": pa.array([1.0, 2.0, 2.0, 2.0, 3.0]),
                      "y": pa.array([1.0, 5.0, 5.0, 5.0, 9.0])})
        out = blomqvist_beta(_ds(t), x_col="x", y_col="y").to_pandas()
        r = out.iloc[0]
        assert r["n_pp"] + r["n_mm"] + r["n_pm"] + r["n_mp"] == 2
        assert r["beta"] == 1.0


class TestRankAgreement:
    def test_identical_rankings(self, ray_session):
        from datatest_ray.stages.stattests import rank_agreement

        t = pa.table({
            "k": pa.array([1, 1, 2, 3], pa.int64()),
            "v": pa.array([5.0, 5.0, 7.0, 1.0]),
        })

        def score(tt):
            return pc.cast(pc.round(pc.multiply(
                tt.column("v"), 100.0)), pa.int64()).to_numpy(
                zero_copy_only=False)

        out = rank_agreement(_ds(t), key_col="k", score_a=score,
                             score_b=score).to_pandas()
        r = out.iloc[0]
        assert r["n_keys"] == 3
        assert r["footrule"] == 0 and r["kendall_dist"] == 0
        assert abs(r["rbo"] - (1 - 0.9) * sum(
            0.9 ** (d - 1) for d in (1, 2, 3))) < 1e-12

    def test_reversed_rankings(self, ray_session):
        from datatest_ray.stages.stattests import rank_agreement

        t = pa.table({
            "k": pa.array([1, 2, 3, 4], pa.int64()),
            "v": pa.array([40.0, 30.0, 20.0, 10.0]),
        })

        def up(tt):
            return pc.cast(pc.round(pc.multiply(
                tt.column("v"), 100.0)), pa.int64()).to_numpy(
                zero_copy_only=False)

        def down(tt):
            return -up(tt)

        out = rank_agreement(_ds(t), key_col="k", score_a=up,
                             score_b=down).to_pandas()
        r = out.iloc[0]
        # ranks 1234 vs 4321: footrule = 3+1+1+3 = 8; inversions = 6
        assert r["footrule"] == 8
        assert r["kendall_dist"] == 6
        # overlap by depth: 0, 2, 2? depth1: {1} vs {4} -> 0;
        # depth2: {1,2} vs {4,3} -> 0; depth3: {1,2,3} vs {4,3,2} -> 2;
        # depth4: all -> 4
        ref = 0.1 * (0.9 ** 0 * 0 / 1 + 0.9 ** 1 * 0 / 2
                     + 0.9 ** 2 * 2 / 3 + 0.9 ** 3 * 4 / 4)
        assert abs(r["rbo"] - ref) < 1e-12


class TestLMoments:
    def test_matches_direct_definition(self, ray_session):
        from math import comb

        from datatest_ray.stages.stattests import lmoments

        rng = np.random.RandomState(0)
        x = np.round(rng.gamma(2.0, 50.0, 400), 2)
        t = pa.table({"v": pa.array(x)})
        out = lmoments(_ds(t), value_col="v").to_pandas()
        c = np.sort(np.round(x * 100).astype(np.int64))
        n = len(c)
        b = [sum(comb(i, k) * int(c[i]) for i in range(n))
             / (n * comb(n - 1, k)) for k in range(4)]
        l1 = b[0] / 100
        l2 = (2 * b[1] - b[0]) / 100
        l3 = (6 * b[2] - 6 * b[1] + b[0]) / 100
        l4 = (20 * b[3] - 30 * b[2] + 12 * b[1] - b[0]) / 100
        r = out.iloc[0]
        assert r["n"] == n
        assert abs(r["l1"] - l1) < 1e-9
        assert abs(r["l2"] - l2) < 1e-9
        assert abs(r["t3"] - l3 / l2) < 1e-9
        assert abs(r["t4"] - l4 / l2) < 1e-9

    def test_symmetric_distribution_zero_lskew(self, ray_session):
        from datatest_ray.stages.stattests import lmoments

        x = np.concatenate([np.arange(1.0, 51.0), 102.0 - np.arange(
            1.0, 51.0)])  # symmetric around 51
        t = pa.table({"v": pa.array(x)})
        out = lmoments(_ds(t), value_col="v").to_pandas()
        assert abs(out.iloc[0]["t3"]) < 1e-12
