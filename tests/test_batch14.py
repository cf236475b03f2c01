"""Batch 14: Brown–Forsythe, Cronbach's alpha, runs test, Durbin–Watson."""

import numpy as np
import pyarrow as pa


def _ds(t: pa.Table, blocks: int = 1):
    import ray.data as rd

    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


class TestLeveneBrownForsythe:
    def test_matches_bruteforce(self, ray_session):
        from datatest_ray.stages.robust import levene_brown_forsythe

        rng = np.random.default_rng(41)
        v = np.concatenate([rng.normal(0, 1, 120),
                            rng.normal(0, 3, 100),
                            rng.normal(0, 1, 80)])
        g = np.array(["a"] * 120 + ["b"] * 100 + ["c"] * 80)
        t = pa.table({"v": v, "g": g})
        out = levene_brown_forsythe(_ds(t, blocks=4), value_col="v",
                                    group_col="g").take_all()[0]
        # brute force with median centers
        zs, ns, zbars = [], [], []
        for gi in "abc":
            x = v[g == gi]
            z = np.abs(x - np.median(x))
            zs.append(z)
            ns.append(len(z))
            zbars.append(z.mean())
        allz = np.concatenate(zs)
        k, n = 3, len(allz)
        zbar = allz.mean()
        ssb = sum(ni * (zi - zbar) ** 2 for ni, zi in zip(ns, zbars))
        ssw = sum(((z - z.mean()) ** 2).sum() for z in zs)
        w = ((n - k) / (k - 1)) * ssb / ssw
        assert out["k"] == k and out["n"] == n
        assert abs(out["w"] - w) < 1e-8
        # group "b" has 3x the spread: W should be decisively large
        assert out["w"] > 10

    def test_single_group_null(self, ray_session):
        from datatest_ray.stages.robust import levene_brown_forsythe

        t = pa.table({"v": [1.0, 2.0, 5.0], "g": ["a", "a", "a"]})
        out = levene_brown_forsythe(_ds(t), value_col="v",
                                    group_col="g").take_all()[0]
        assert out["k"] == 1 and out["w"] is None


class TestCronbachAlpha:
    def test_matches_bruteforce(self, ray_session):
        from datatest_ray.stages.robust import cronbach_alpha

        rng = np.random.default_rng(43)
        latent = rng.normal(size=200)
        items = {f"i{j}": latent + rng.normal(0, 0.5, 200)
                 for j in range(4)}
        t = pa.table(items)
        out = cronbach_alpha(_ds(t, blocks=3),
                             item_cols=list(items)).take_all()[0]
        X = np.column_stack(list(items.values()))
        k = 4
        alpha = k / (k - 1) * (1 - X.var(axis=0, ddof=1).sum()
                               / X.sum(axis=1).var(ddof=1))
        assert out["k"] == 4 and out["n"] == 200
        assert abs(out["alpha"] - alpha) < 1e-9
        assert out["alpha"] > 0.8  # strongly consistent by construction

    def test_null_rows_listwise_deleted(self, ray_session):
        from datatest_ray.stages.robust import cronbach_alpha

        t = pa.table({
            "a": pa.array([1.0, 2.0, None, 4.0, 5.0, 6.0]),
            "b": pa.array([1.0, 2.5, 3.0, 4.0, 5.5, 6.0]),
        })
        out = cronbach_alpha(_ds(t), item_cols=["a", "b"]).take_all()[0]
        assert out["n"] == 5


class TestRunsTestDaily:
    def test_counts_and_z(self, ray_session):
        from datatest_ray.stages.robust import runs_test_daily

        # daily counts by construction: day i gets (i % 3 + 1) rows ->
        # deltas alternate +1,+1,-2 -> signs +,+,- repeating
        days, rows = 9, []
        for i in range(days):
            rows += [i * 86_400_000_000] * (i % 3 + 1)
        t = pa.table({"ts": pa.array(rows, pa.int64()).cast(
            pa.timestamp("us"))})
        out = runs_test_daily(_ds(t, blocks=3), ts_col="ts").take_all()[0]
        # deltas: +1,+1,-2,+1,+1,-2,+1,+1 -> 6 pos, 2 neg
        assert out["n_pos"] == 6 and out["n_neg"] == 2
        # runs: ++ / - / ++ / - / ++  -> 5
        assert out["n_runs"] == 5
        m, npos, nneg = 8, 6, 2
        mu = 2 * npos * nneg / m + 1
        var = (mu - 1) * (mu - 2) / (m - 1)
        assert abs(out["z"] - (5 - mu) / np.sqrt(var)) < 1e-12

    def test_monotone_series_no_neg(self, ray_session):
        from datatest_ray.stages.robust import runs_test_daily

        rows = []
        for i in range(5):
            rows += [i * 86_400_000_000] * (i + 1)
        t = pa.table({"ts": pa.array(rows, pa.int64()).cast(
            pa.timestamp("us"))})
        out = runs_test_daily(_ds(t), ts_col="ts").take_all()[0]
        assert out["n_neg"] == 0 and out["n_runs"] == 1
        assert out["z"] is None


class TestDurbinWatson:
    def test_matches_bruteforce(self, ray_session):
        from datatest_ray.stages.robust import durbin_watson_grouped

        rng = np.random.default_rng(47)
        rows = {"u": [], "ts": [], "v": [], "id": []}
        expect = {}
        for u in range(4):
            v = np.cumsum(rng.normal(size=30)) if u % 2 == 0 \
                else rng.normal(size=30)
            rows["u"] += [u] * 30
            rows["ts"] += list(range(30))
            rows["v"] += list(v)
            rows["id"] += list(range(30))
            expect[u] = float((np.diff(v) ** 2).sum()
                              / ((v - v.mean()) ** 2).sum())
        t = pa.table({"u": rows["u"],
                      "ts": pa.array(rows["ts"], pa.int64()),
                      "v": rows["v"], "id": rows["id"]})
        got = {r["u"]: r for r in durbin_watson_grouped(
            _ds(t, blocks=4), by="u", ts_col="ts", value_col="v",
            id_col="id").take_all()}
        for u in range(4):
            assert got[u]["n"] == 30
            assert abs(got[u]["dw"] - expect[u]) < 1e-10
        # random walk autocorrelates (dw << 2); white noise ~2
        assert got[0]["dw"] < 1.0 < got[1]["dw"]

    def test_short_group_null(self, ray_session):
        from datatest_ray.stages.robust import durbin_watson_grouped

        t = pa.table({"u": [1, 1], "ts": [1, 2], "v": [3.0, 4.0],
                      "id": [1, 2]})
        out = durbin_watson_grouped(_ds(t), by="u", ts_col="ts",
                                    value_col="v", id_col="id").take_all()[0]
        assert out["n"] == 2 and out["dw"] is None
