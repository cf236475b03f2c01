"""Batch 61: Goodman-Kruskal lambda, gains/lift table, Hurst R/S
exponent (oracle parity for the first two covered by test_oracle.py)."""

import datetime

import numpy as np
import pyarrow as pa


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestGkLambda:
    def test_perfect_predictor(self, ray_session):
        from datatest_ray.stages.mlprep import gk_lambda

        t = pa.table({
            "r": pa.array(["a", "a", "b", "b", "c", "c"]),
            "c": pa.array(["x", "x", "y", "y", "z", "z"]),
        })
        out = gk_lambda(_ds(t), row_col="r", col_col="c").take_all()[0]
        assert out["lambda_col"] == 1.0
        assert out["lambda_row"] == 1.0

    def test_independent_is_zero(self, ray_session):
        from datatest_ray.stages.mlprep import gk_lambda

        # every row category has the same modal column -> lambda 0
        t = pa.table({
            "r": pa.array(["a"] * 4 + ["b"] * 4),
            "c": pa.array(["x", "x", "x", "y"] * 2),
        })
        out = gk_lambda(_ds(t), row_col="r", col_col="c").take_all()[0]
        assert out["lambda_col"] == 0.0


class TestGainsTable:
    def test_perfect_ranking_concentrates_top(self, ray_session):
        from datatest_ray.stages.mlprep import gains_table

        n = 100
        scores = list(range(n, 0, -1))
        labels = [1] * 10 + [0] * 90  # positives all in the top decile
        t = pa.table({"s": pa.array(scores, pa.float64()),
                      "id": pa.array(range(n), pa.int64()),
                      "y": pa.array([bool(v) for v in labels])})
        out = gains_table(_ds(t), score_col="s", id_col="id",
                          label_expr=lambda b: b.column("y"),
                          k=10).take_all()
        assert len(out) == 10
        assert out[0]["pos"] == 10 and out[0]["cum_capture"] == 1.0
        assert out[0]["lift"] == 10.0
        assert all(r["pos"] == 0 for r in out[1:])

    def test_uneven_split_sizes(self, ray_session):
        from datatest_ray.stages.mlprep import gains_table

        # 13 rows, 10 tiles: first 3 tiles get 2 rows (SQL ntile)
        t = pa.table({"s": pa.array(np.arange(13.0)),
                      "id": pa.array(range(13), pa.int64()),
                      "y": pa.array([True] * 13)})
        out = gains_table(_ds(t, 1), score_col="s", id_col="id",
                          label_expr=lambda b: b.column("y"),
                          k=10).take_all()
        assert [r["n"] for r in out] == [2, 2, 2, 1, 1, 1, 1, 1, 1, 1]


class TestHurst:
    def _daily(self, counts):
        ts, day0 = [], datetime.datetime(2024, 1, 1)
        for d, c in enumerate(counts):
            ts.extend([day0 + datetime.timedelta(days=d)] * c)
        return pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                         "event_type": pa.array(["a"] * len(ts))})

    def _brute(self, x, sizes=(8, 16, 32)):
        xs, ys = [], []
        x = np.asarray(x, float)
        for w in sizes:
            m = len(x) // w
            if m < 1:
                continue
            seg = x[:m * w].reshape(m, w)
            mu = seg.mean(axis=1, keepdims=True)
            dev = np.cumsum(seg - mu, axis=1)
            rng = dev.max(axis=1) - dev.min(axis=1)
            sd = seg.std(axis=1)
            ok = sd > 0
            rs = float((rng[ok] / sd[ok]).mean())
            xs.append(np.log(w))
            ys.append(np.log(rs))
        xa, ya = np.array(xs), np.array(ys)
        return float(np.sum((xa - xa.mean()) * (ya - ya.mean()))
                     / np.sum((xa - xa.mean()) ** 2))

    def test_matches_brute_force(self, ray_session):
        from datatest_ray.stages.temporal import hurst_rs_daily

        rng = np.random.RandomState(12)
        counts = list(rng.randint(5, 40, 96))
        out = hurst_rs_daily(_ds(self._daily(counts)), "ts",
                             by="event_type").take_all()[0]
        assert abs(out["hurst"] - round(self._brute(counts), 6)) < 1e-9

    def test_persistent_beats_noise(self, ray_session):
        from datatest_ray.stages.temporal import hurst_rs_daily

        rng = np.random.RandomState(3)
        noise = list(rng.randint(10, 30, 96))
        # persistent: integrated random walk (clipped positive)
        steps = rng.choice([-1, 1], 96)
        walk = list(np.maximum(20 + np.cumsum(steps), 1).astype(int))
        h_noise = hurst_rs_daily(_ds(self._daily(noise)), "ts",
                                 by="event_type").take_all()[0]["hurst"]
        h_walk = hurst_rs_daily(_ds(self._daily(walk)), "ts",
                                by="event_type").take_all()[0]["hurst"]
        assert h_walk > h_noise
