"""Batch 13: Kruskal–Wallis H, one-way ANOVA F, Jarque–Bera normality."""

import numpy as np
import pyarrow as pa


def _ds(t: pa.Table, blocks: int = 1):
    import ray.data as rd

    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def _rankdata(v):
    """Average-rank (scipy.stats.rankdata 'average') in plain numpy."""
    order = np.argsort(v, kind="stable")
    sv = v[order]
    new = np.ones(len(sv), dtype=bool)
    new[1:] = sv[1:] != sv[:-1]
    seg = np.cumsum(new) - 1
    cnt = np.bincount(seg)
    cum = np.cumsum(cnt)
    avg = cum - cnt + (cnt + 1) / 2.0
    ranks = np.empty(len(v))
    ranks[order] = avg[seg]
    return ranks


class TestKruskalWallis:
    def test_matches_bruteforce_with_ties(self, ray_session):
        from datatest_ray.stages.robust import kruskal_wallis

        rng = np.random.default_rng(13)
        v = np.round(rng.normal(size=300), 1)  # heavy ties
        g = rng.choice(["a", "b", "c"], size=300)
        t = pa.table({"v": v, "g": g})
        out = kruskal_wallis(_ds(t, blocks=5), value_col="v",
                             group_col="g").take_all()[0]
        ranks = _rankdata(v)
        n = len(v)
        h = 12.0 / (n * (n + 1)) * sum(
            ranks[g == gi].sum() ** 2 / (g == gi).sum()
            for gi in "abc") - 3 * (n + 1)
        _, tcnt = np.unique(v, return_counts=True)
        h /= 1 - ((tcnt ** 3 - tcnt).sum() / (n ** 3 - n))
        assert out["k"] == 3 and out["n"] == n
        assert abs(out["h"] - h) < 1e-9

    def test_nulls_and_nan_dropped(self, ray_session):
        from datatest_ray.stages.robust import kruskal_wallis

        t = pa.table({
            "v": pa.array([1.0, 2.0, None, float("nan"), 3.0, 4.0]),
            "g": pa.array(["a", "a", "b", "b", "b", None]),
        })
        out = kruskal_wallis(_ds(t), value_col="v",
                             group_col="g").take_all()[0]
        assert out["n"] == 3 and out["k"] == 2

    def test_single_group_null_h(self, ray_session):
        from datatest_ray.stages.robust import kruskal_wallis

        t = pa.table({"v": [1.0, 2.0, 3.0], "g": ["a", "a", "a"]})
        out = kruskal_wallis(_ds(t), value_col="v",
                             group_col="g").take_all()[0]
        assert out["k"] == 1 and out["h"] is None


class TestAnovaOneway:
    def test_matches_bruteforce(self, ray_session):
        from datatest_ray.stages.robust import anova_oneway

        rng = np.random.default_rng(17)
        v = rng.normal(size=240)
        g = rng.choice(["x", "y", "z", "w"], size=240)
        v[g == "y"] += 0.8
        t = pa.table({"v": v, "g": g})
        out = anova_oneway(_ds(t, blocks=4), value_col="v",
                           group_col="g").take_all()[0]
        grand = v.mean()
        k = 4
        n = len(v)
        ssb = sum((g == gi).sum() * (v[g == gi].mean() - grand) ** 2
                  for gi in "xyzw")
        ssw = sum(((v[g == gi] - v[g == gi].mean()) ** 2).sum()
                  for gi in "xyzw")
        f = (ssb / (k - 1)) / (ssw / (n - k))
        assert out["k"] == k and out["n"] == n
        assert abs(out["f"] - f) < 1e-8

    def test_degenerate_returns_null(self, ray_session):
        from datatest_ray.stages.robust import anova_oneway

        t = pa.table({"v": [5.0, 6.0], "g": ["a", "b"]})
        out = anova_oneway(_ds(t), value_col="v",
                           group_col="g").take_all()[0]
        assert out["f"] is None  # n == k


class TestJarqueBera:
    def test_matches_bruteforce_per_group(self, ray_session):
        from datatest_ray.stages.robust import jarque_bera

        rng = np.random.default_rng(23)
        v = np.concatenate([rng.normal(size=150),
                            rng.exponential(size=150)])
        g = np.array(["norm"] * 150 + ["exp"] * 150)
        t = pa.table({"v": v, "g": g})
        rows = {r["g"]: r for r in jarque_bera(
            _ds(t, blocks=3), value_col="v", by="g").take_all()}
        for gi in ("norm", "exp"):
            x = v[g == gi]
            n = len(x)
            m2 = ((x - x.mean()) ** 2).mean()
            m3 = ((x - x.mean()) ** 3).mean()
            m4 = ((x - x.mean()) ** 4).mean()
            skew = m3 / m2 ** 1.5
            kurt = m4 / m2 ** 2
            jb = n / 6.0 * (skew ** 2 + (kurt - 3) ** 2 / 4)
            assert rows[gi]["n"] == n
            assert abs(rows[gi]["skew"] - skew) < 1e-7
            assert abs(rows[gi]["kurt"] - kurt) < 1e-7
            assert abs(rows[gi]["jb"] - jb) < 1e-5
        # exponential is decisively non-normal, normal is not
        assert rows["exp"]["jb"] > 20 > rows["norm"]["jb"]

    def test_constant_group_null(self, ray_session):
        from datatest_ray.stages.robust import jarque_bera

        t = pa.table({"v": [2.0, 2.0, 2.0, 1.0, 3.0],
                      "g": ["c", "c", "c", "d", "d"]})
        rows = {r["g"]: r for r in jarque_bera(
            _ds(t), value_col="v", by="g").take_all()}
        assert rows["c"]["skew"] is None and rows["c"]["jb"] is None
        assert rows["d"]["n"] == 2
