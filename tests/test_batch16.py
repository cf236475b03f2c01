"""Batch 16: Bartlett, Goodman–Kruskal gamma, odds ratio (full sf0.001
oracle parity for the six TPC-H shapes is covered by test_oracle.py)."""

import numpy as np
import pyarrow as pa


def _ds(t: pa.Table, blocks: int = 1):
    import ray.data as rd

    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


class TestBartlett:
    def test_matches_bruteforce(self, ray_session):
        from datatest_ray.stages.robust import bartlett_test

        rng = np.random.default_rng(51)
        v = np.concatenate([rng.normal(0, 1, 150),
                            rng.normal(0, 2, 120),
                            rng.normal(0, 1, 90)])
        g = np.array(["a"] * 150 + ["b"] * 120 + ["c"] * 90)
        out = bartlett_test(_ds(pa.table({"v": v, "g": g}), blocks=4),
                            value_col="v", group_col="g").take_all()[0]
        # brute force
        ns, vs = [], []
        for gi in "abc":
            x = v[g == gi]
            ns.append(len(x))
            vs.append(x.var(ddof=1))
        ns, vs = np.array(ns), np.array(vs)
        n, k = ns.sum(), 3
        sp2 = ((ns - 1) * vs).sum() / (n - k)
        num = (n - k) * np.log(sp2) - ((ns - 1) * np.log(vs)).sum()
        c = 1 + ((1.0 / (ns - 1)).sum() - 1.0 / (n - k)) / (3 * (k - 1))
        assert out["k"] == 3 and out["n"] == int(n)
        assert abs(out["stat"] - num / c) < 1e-8
        # group b has 2x the spread: decisively non-homogeneous
        assert out["stat"] > 20

    def test_degenerate_single_group(self, ray_session):
        from datatest_ray.stages.robust import bartlett_test

        t = pa.table({"v": [1.0, 2.0, 3.0], "g": ["a"] * 3})
        out = bartlett_test(_ds(t), value_col="v",
                            group_col="g").take_all()[0]
        assert out["k"] == 1 and out["stat"] is None


class TestGKGamma:
    def test_matches_bruteforce_pairs(self, ray_session):
        from datatest_ray.stages.robust import gk_gamma

        rng = np.random.default_rng(52)
        i = rng.integers(1, 5, 400)
        j = np.clip(i + rng.integers(-2, 3, 400), 0, 6)
        out = gk_gamma(_ds(pa.table({"i": i, "j": j}), blocks=3),
                       i_col="i", j_col="j").take_all()[0]
        conc = disc = 0
        for a in range(400):
            di = i[a + 1:] - i[a]
            dj = j[a + 1:] - j[a]
            conc += int(((di * dj) > 0).sum())
            disc += int(((di * dj) < 0).sum())
        assert out["c_pairs"] == conc and out["d_pairs"] == disc
        assert abs(out["gamma"] - (conc - disc) / (conc + disc)) < 1e-12
        # j tracks i: strong positive ordinal association
        assert out["gamma"] > 0.5

    def test_constant_column_null_gamma(self, ray_session):
        from datatest_ray.stages.robust import gk_gamma

        t = pa.table({"i": [1, 2, 3], "j": [5, 5, 5]})
        out = gk_gamma(_ds(t), i_col="i", j_col="j").take_all()[0]
        assert out["c_pairs"] == 0 and out["d_pairs"] == 0
        assert out["gamma"] is None


class TestOddsRatio:
    def test_known_2x2(self, ray_session):
        from datatest_ray.stages.robust import odds_ratio_2x2

        # a=20 b=10 c=5 d=40 -> OR = 16
        rows_e = ["x"] * 30 + ["y"] * 45
        rows_o = ["F"] * 20 + ["O"] * 10 + ["F"] * 5 + ["O"] * 40
        t = pa.table({"e": rows_e, "o": rows_o})
        out = odds_ratio_2x2(_ds(t, blocks=3), exposure_col="e",
                             exposure="x", outcome_col="o",
                             outcome="F").take_all()[0]
        assert (out["a"], out["b"], out["c"], out["d"]) == (20, 10, 5, 40)
        assert abs(out["odds_ratio"] - 16.0) < 1e-12
        se = np.sqrt(1 / 20 + 1 / 10 + 1 / 5 + 1 / 40)
        assert abs(out["ci_lo"]
                   - np.exp(np.log(16) - 1.959963984540054 * se)) < 1e-9
        assert out["ci_lo"] < 16.0 < out["ci_hi"]

    def test_zero_cell_null(self, ray_session):
        from datatest_ray.stages.robust import odds_ratio_2x2

        t = pa.table({"e": ["x", "x", "y"], "o": ["F", "F", "O"]})
        out = odds_ratio_2x2(_ds(t), exposure_col="e", exposure="x",
                             outcome_col="o", outcome="F").take_all()[0]
        assert out["odds_ratio"] is None
