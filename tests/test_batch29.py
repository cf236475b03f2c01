"""Batch 29: two-sample Anderson-Darling, Wilcoxon signed-rank,
G-test of independence, Theil inequality index, categorical drift
distances (oracle parity covered by test_oracle.py)."""

import math

import numpy as np
import pyarrow as pa


def _ds(t: pa.Table):
    import ray.data as rd

    return rd.from_arrow(t)


def _ad_brute(va: np.ndarray, vb: np.ndarray) -> float:
    """Right-continuous tie-block A² reference (tiny, O(N²))."""
    pooled = np.concatenate([va, vb])
    vals = np.unique(pooled)
    n, m = len(va), len(vb)
    total = n + m
    s = 0.0
    for v in vals:
        b = int((pooled <= v).sum())
        if b >= total:
            continue
        l = int((pooled == v).sum())
        ma = int((va <= v).sum())
        s += l * (total * ma - n * b) ** 2 / (b * (total - b))
    return s / (n * m)


class TestAndersonDarling:
    def test_matches_brute_force_with_ties(self, ray_session):
        from datatest_ray.stages.stattests import (
            anderson_darling_two_sample,
        )

        rng = np.random.RandomState(11)
        va = np.round(rng.normal(5, 2, 150), 1)
        vb = np.round(rng.normal(6, 3, 250), 1)
        t = pa.table({
            "g": ["a"] * 150 + ["b"] * 250,
            "v": pa.array(np.concatenate([va, vb])),
        })
        out = anderson_darling_two_sample(
            _ds(t), value_col="v", group_col="g", a="a", b="b").to_pandas()
        r = out.iloc[0]
        assert (r["n_a"], r["n_b"]) == (150, 250)
        assert abs(r["a2"] - _ad_brute(va, vb)) < 1e-9

    def test_identical_samples_near_zero(self, ray_session):
        from datatest_ray.stages.stattests import (
            anderson_darling_two_sample,
        )

        v = np.arange(100, dtype=np.float64)
        t = pa.table({"g": ["a"] * 100 + ["b"] * 100,
                      "v": pa.array(np.concatenate([v, v]))})
        out = anderson_darling_two_sample(
            _ds(t), value_col="v", group_col="g", a="a", b="b").to_pandas()
        # identical ECDFs -> numerator 0 at every block
        assert out.iloc[0]["a2"] == 0.0

    def test_empty_side_null_stat(self, ray_session):
        from datatest_ray.stages.stattests import (
            anderson_darling_two_sample,
        )

        t = pa.table({"g": ["a", "a"], "v": pa.array([1.0, 2.0])})
        out = anderson_darling_two_sample(
            _ds(t), value_col="v", group_col="g", a="a", b="b").to_pandas()
        assert out.iloc[0]["n_b"] == 0
        assert out.iloc[0]["a2"] is None or np.isnan(out.iloc[0]["a2"])


class TestWilcoxonSignedRank:
    def test_matches_scipy_formula_hand_case(self, ray_session):
        from datatest_ray.stages.stattests import wilcoxon_signed_rank

        # keys 1..6: (a_mean - b_mean) differences engineered via one
        # observation per condition; diffs: +1, -2, +3, +3, -1, 0(drop)
        keys, groups, vals = [], [], []
        diffs = {1: (5.0, 4.0), 2: (2.0, 4.0), 3: (6.0, 3.0),
                 4: (7.0, 4.0), 5: (3.0, 4.0), 6: (4.0, 4.0)}
        for k, (a_v, b_v) in diffs.items():
            keys += [k, k]
            groups += ["a", "b"]
            vals += [a_v, b_v]
        t = pa.table({"k": pa.array(keys, pa.int64()),
                      "g": groups, "v": pa.array(vals)})
        out = wilcoxon_signed_rank(
            _ds(t), key_col="k", group_col="g", a="a", b="b",
            value_col="v").to_pandas()
        r = out.iloc[0]
        # |d|: 1,2,3,3,1 -> avg ranks: 1.5,3,4.5,4.5,1.5 ; positive:
        # d=+1 (1.5), +3 (4.5), +3 (4.5) -> W+ = 10.5 ; n=5
        assert r["n_pairs"] == 5
        assert r["w_plus"] == 10.5
        mu = 5 * 6 / 4.0
        tie = (2 ** 3 - 2) + (2 ** 3 - 2)  # two tie blocks of size 2
        var = 5 * 6 * 11 / 24.0 - tie / 48.0
        assert abs(r["z"] - (10.5 - mu) / math.sqrt(var)) < 1e-12

    def test_unpaired_keys_dropped(self, ray_session):
        from datatest_ray.stages.stattests import wilcoxon_signed_rank

        t = pa.table({
            "k": pa.array([1, 1, 2, 3], pa.int64()),
            "g": ["a", "b", "a", "b"],
            "v": pa.array([5.0, 3.0, 9.0, 9.0]),
        })
        out = wilcoxon_signed_rank(
            _ds(t), key_col="k", group_col="g", a="a", b="b",
            value_col="v").to_pandas()
        assert out.iloc[0]["n_pairs"] == 1  # keys 2,3 have one side only
        assert out.iloc[0]["w_plus"] == 1.0


class TestGTest:
    def test_matches_direct_formula(self, ray_session):
        from datatest_ray.stages.stattests import g_test_independence

        rng = np.random.RandomState(3)
        i = rng.choice(["x", "y", "z"], 500)
        j = rng.choice(["p", "q"], 500)
        t = pa.table({"i": i, "j": j})
        out = g_test_independence(_ds(t), i_col="i", j_col="j").to_pandas()
        r = out.iloc[0]
        # direct dense-table reference
        import collections
        cells = collections.Counter(zip(i, j))
        n = 500
        ri = collections.Counter(i)
        cj = collections.Counter(j)
        g = 2.0 * sum(o * math.log(o * n / (ri[a] * cj[b]))
                      for (a, b), o in cells.items())
        assert r["n"] == 500
        assert (r["n_rows"], r["n_cols"], r["dof"]) == (3, 2, 2)
        assert abs(r["g"] - g) < 1e-9

    def test_independent_uniform_g_zero(self, ray_session):
        from datatest_ray.stages.stattests import g_test_independence

        # perfectly balanced 2x2 -> G exactly 0
        t = pa.table({"i": ["a", "a", "b", "b"],
                      "j": ["p", "q", "p", "q"]})
        out = g_test_independence(_ds(t), i_col="i", j_col="j").to_pandas()
        assert out.iloc[0]["g"] == 0.0


class TestTheilIndex:
    def test_equal_values_zero(self, ray_session):
        from datatest_ray.stages.stattests import theil_index_by_group

        t = pa.table({"g": ["a"] * 10, "x": pa.array([4.0] * 10)})
        out = theil_index_by_group(_ds(t), by="g",
                                   value_col="x").to_pandas()
        assert abs(out.iloc[0]["theil"]) < 1e-12
        assert out.iloc[0]["mean"] == 4.0

    def test_matches_direct_formula(self, ray_session):
        from datatest_ray.stages.stattests import theil_index_by_group

        x = np.array([1.0, 2.0, 3.0, 10.0, 0.25])
        t = pa.table({"g": ["a"] * 5, "x": pa.array(x)})
        out = theil_index_by_group(_ds(t), by="g",
                                   value_col="x").to_pandas()
        mu = x.mean()
        ref = float((x / (5 * mu) * np.log(x / mu)).sum())
        assert abs(out.iloc[0]["theil"] - ref) < 1e-9

    def test_nonpositive_and_null_dropped(self, ray_session):
        from datatest_ray.stages.stattests import theil_index_by_group

        t = pa.table({"g": ["a", "a", "a", None],
                      "x": pa.array([2.0, -1.0, None, 5.0])})
        out = theil_index_by_group(_ds(t), by="g",
                                   value_col="x").to_pandas()
        assert len(out) == 1
        assert out.iloc[0]["n"] == 1


class TestCategoricalDrift:
    def test_identical_halves_zero_distance(self, ray_session):
        import pyarrow.compute as pc

        from datatest_ray.stages.stattests import categorical_drift

        t = pa.table({
            "c": ["x", "y"] * 20,
            "f": pa.array([1, 1, 0, 0] * 10, pa.int64()),
        })
        out = categorical_drift(
            _ds(t), cat_col="c", split_col="f",
            split_expr=lambda b: pc.equal(b.column("f"), 1)).to_pandas()
        r = out.iloc[0]
        assert (r["n_true"], r["n_false"]) == (20, 20)
        assert abs(r["tvd"]) < 1e-12
        assert abs(r["bc"] - 1.0) < 1e-12
        assert abs(r["hellinger"]) < 1e-7

    def test_disjoint_categories_max_distance(self, ray_session):
        import pyarrow.compute as pc

        from datatest_ray.stages.stattests import categorical_drift

        t = pa.table({
            "c": ["x"] * 10 + ["y"] * 10,
            "f": pa.array([1] * 10 + [0] * 10, pa.int64()),
        })
        out = categorical_drift(
            _ds(t), cat_col="c", split_col="f",
            split_expr=lambda b: pc.equal(b.column("f"), 1)).to_pandas()
        r = out.iloc[0]
        assert r["tvd"] == 1.0
        assert r["bc"] == 0.0
        assert r["hellinger"] == 1.0
