"""Batch 31: Kuiper two-sample, Cohen's h, Mood's median test,
ntile window (oracle parity covered by test_oracle.py)."""

import math

import numpy as np
import pyarrow as pa


def _ds(t: pa.Table):
    import ray.data as rd

    return rd.from_arrow(t)


class TestKuiper:
    def test_matches_brute_force(self, ray_session):
        from datatest_ray.stages.stattests import kuiper_two_sample

        rng = np.random.RandomState(2)
        va = np.round(rng.normal(0, 1, 120), 1)
        vb = np.round(rng.normal(0.7, 1, 180), 1)
        t = pa.table({"g": ["a"] * 120 + ["b"] * 180,
                      "v": pa.array(np.concatenate([va, vb]))})
        out = kuiper_two_sample(_ds(t), value_col="v", group_col="g",
                                a="a", b="b").to_pandas()
        pooled = np.unique(np.concatenate([va, vb]))
        fn = np.searchsorted(np.sort(va), pooled, side="right") / len(va)
        gm = np.searchsorted(np.sort(vb), pooled, side="right") / len(vb)
        dp = max(float((fn - gm).max()), 0.0)
        dm = max(float((gm - fn).max()), 0.0)
        r = out.iloc[0]
        assert abs(r["d_plus"] - dp) < 1e-12
        assert abs(r["d_minus"] - dm) < 1e-12
        assert abs(r["v"] - (dp + dm)) < 1e-12

    def test_pure_shift_catches_both_gaps(self, ray_session):
        from datatest_ray.stages.stattests import kuiper_two_sample

        # b is a's values rotated (cyclic) — Kuiper sees both sides
        va = np.arange(10, dtype=np.float64)
        vb = va + 0.5
        t = pa.table({"g": ["a"] * 10 + ["b"] * 10,
                      "v": pa.array(np.concatenate([va, vb]))})
        out = kuiper_two_sample(_ds(t), value_col="v", group_col="g",
                                a="a", b="b").to_pandas()
        assert out.iloc[0]["d_plus"] > 0
        assert out.iloc[0]["v"] >= out.iloc[0]["d_plus"]


class TestCohensH:
    def test_known_proportions(self, ray_session):
        import pyarrow.compute as pc

        from datatest_ray.stages.stattests import cohens_h_two_proportions

        # split=1: 4/8 success; split=0: 1/4 success
        t = pa.table({
            "f": pa.array([1, 1, 1, 1, 0, 0, 0, 0, 1, 0, 0, 0],
                          pa.int64()),
            "s": pa.array([1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0],
                          pa.int64()),
        })
        out = cohens_h_two_proportions(
            _ds(t),
            flag_expr=lambda b: pc.equal(b.column("f"), 1),
            split_expr=lambda b: pc.equal(b.column("s"), 1),
            flag_col="f", split_col="s").to_pandas()
        r = out.iloc[0]
        assert (r["n_1"], r["k_1"], r["n_2"], r["k_2"]) == (8, 4, 4, 1)
        h = 2 * math.asin(math.sqrt(0.5)) - 2 * math.asin(math.sqrt(0.25))
        assert abs(r["h"] - h) < 1e-12


class TestMoodsMedian:
    def test_separated_groups(self, ray_session):
        from datatest_ray.stages.stattests import moods_median_test

        # group a all below pooled median, group b all above
        t = pa.table({
            "g": ["a"] * 10 + ["b"] * 10,
            "v": pa.array(list(map(float, range(10)))
                          + list(map(float, range(100, 110)))),
        })
        out = moods_median_test(_ds(t), value_col="v",
                                group_col="g").to_pandas()
        r = out.iloc[0]
        # pooled lower median = 10th of 20 sorted values = 9.0
        assert r["median"] == 9.0
        assert r["n_groups"] == 2 and r["dof"] == 1
        # a: 0 above, b: 10 above -> chi2 = 20 * (10*10)/(10*10) = 20
        assert abs(r["chi2"] - 20.0) < 1e-9

    def test_identical_groups_zero(self, ray_session):
        from datatest_ray.stages.stattests import moods_median_test

        v = list(map(float, range(8)))
        t = pa.table({"g": ["a"] * 8 + ["b"] * 8, "v": pa.array(v + v)})
        out = moods_median_test(_ds(t), value_col="v",
                                group_col="g").to_pandas()
        assert abs(out.iloc[0]["chi2"]) < 1e-12


class TestNtile:
    def test_sql_bucket_sizes(self, ray_session):
        from datatest_ray.stages.winfunc import ntile_window

        # n=10, k=4 -> bucket sizes 3,3,2,2 (first n%k get ceil)
        t = pa.table({
            "id": pa.array(list(range(10)), pa.int64()),
            "g": pa.array([1] * 10, pa.int64()),
            "v": pa.array([float(i) for i in range(10)]),
        })
        out = ntile_window(_ds(t), by="g", value_col="v", id_col="id",
                           k=4).to_pandas().sort_values("id")
        assert list(out["tile"]) == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]

    def test_small_group_fewer_than_k(self, ray_session):
        from datatest_ray.stages.winfunc import ntile_window

        t = pa.table({
            "id": pa.array([1, 2], pa.int64()),
            "g": pa.array([5, 5], pa.int64()),
            "v": pa.array([2.0, 1.0]),
        })
        out = ntile_window(_ds(t), by="g", value_col="v", id_col="id",
                           k=4).to_pandas().sort_values("id")
        # 2 rows into 4 tiles -> tiles 1 and 2, ordered by value:
        # id=2 has the smaller value -> tile 1; id=1 -> tile 2
        assert list(out["tile"]) == [2, 1]
