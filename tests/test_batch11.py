"""Session-9 operator batch 11: Cochran–Armitage trend, Pettitt
change-point, transition conditional entropy."""

import numpy as np
import pyarrow as pa


def _ds(table: pa.Table):
    import ray.data as rd

    return rd.from_arrow(table)


class TestCochranArmitage:
    def test_matches_closed_form(self, ray_session):
        from datatest_ray.stages.profile import cochran_armitage

        # tiers 1..3, rates 0.2 / 0.5 / 0.8 -> strong positive trend
        cats, outs = [], []
        spec = {"1-LOW": (50, 10), "2-MID": (40, 20), "3-HIGH": (30, 24)}
        for cat, (n, r) in spec.items():
            cats += [cat] * n
            outs += ["F"] * r + ["O"] * (n - r)
        out = cochran_armitage(
            _ds(pa.table({"c": cats, "o": outs})), "c", "o", "F"
        ).to_pandas()
        w = np.array([1.0, 2.0, 3.0])
        n = np.array([50.0, 40.0, 30.0])
        r = np.array([10.0, 20.0, 24.0])
        N, R = n.sum(), r.sum()
        p = R / N
        num = (w * r).sum() - p * (w * n).sum()
        var = p * (1 - p) * ((w * w * n).sum() - (w * n).sum() ** 2 / N)
        z = num / np.sqrt(var)
        assert out.iloc[0]["n"] == 120 and out.iloc[0]["r"] == 54
        assert abs(out.iloc[0]["z"] - z) < 1e-10
        assert z > 5  # the planted trend is detected

    def test_no_trend_small_z(self, ray_session):
        from datatest_ray.stages.profile import cochran_armitage

        rng = np.random.default_rng(8)
        cats = rng.choice(["1-A", "2-B", "3-C"], 600)
        outs = rng.choice(["F", "O"], 600)
        out = cochran_armitage(
            _ds(pa.table({"c": cats, "o": outs})), "c", "o", "F"
        ).to_pandas()
        assert abs(out.iloc[0]["z"]) < 3


class TestPettittDaily:
    def test_finds_planted_level_shift(self, ray_session):
        from datatest_ray.stages.temporal import pettitt_daily

        DAY = 86_400_000_000
        rng = np.random.default_rng(3)
        ts = []
        for day in range(40):
            n = int(rng.integers(8, 13)) if day < 20 \
                else int(rng.integers(30, 36))
            ts += [day * DAY + int(o) for o in
                   rng.integers(0, DAY, n)]
        t = pa.table({"ts": pa.array(np.array(ts, dtype=np.int64),
                                     pa.timestamp("us"))})
        out = pettitt_daily(_ds(t), "ts").to_pandas()
        assert out.iloc[0]["n_days"] == 40
        assert 17 <= out.iloc[0]["split_day"] <= 21
        # K near its maximum possible value (n1*n2 = 400) for a clean
        # shift with perfectly separated ranks
        assert out.iloc[0]["k_stat"] > 0.8 * (20 * 20)

    def test_matches_brute_force(self, ray_session):
        from datatest_ray.stages.temporal import pettitt_daily

        DAY = 86_400_000_000
        counts = [3, 1, 4, 1, 5, 9, 2, 6]
        ts = []
        for day, n in enumerate(counts):
            ts += [day * DAY + i for i in range(n)]
        t = pa.table({"ts": pa.array(np.array(ts, dtype=np.int64),
                                     pa.timestamp("us"))})
        out = pettitt_daily(_ds(t), "ts").to_pandas()
        import pandas as pd

        r = pd.Series(counts).rank(method="average").to_numpy()
        n = len(counts)
        u = 2 * np.cumsum(r) - np.arange(1, n + 1) * (n + 1)
        k = np.abs(u[:-1])
        i = int(np.argmax(k))
        assert out.iloc[0]["split_day"] == i
        assert abs(out.iloc[0]["k_stat"] - k[i]) < 1e-12


class TestTransitionCondEntropy:
    def test_deterministic_vs_uniform(self, ray_session):
        from datatest_ray.stages.seq import transition_cond_entropy

        # 'a' always -> 'b' (H=0); 'b' -> {a, c} evenly (H=ln 2)
        seq = ["a", "b", "a", "b", "c", "a", "b", "a", "b", "c"]
        t = pa.table({
            "user_id": pa.array([1] * len(seq), pa.int64()),
            "ts": pa.array(np.arange(len(seq), dtype=np.int64) * 10 ** 6,
                           pa.timestamp("us")),
            "event_type": seq,
            "event_id": pa.array(range(len(seq)), pa.int64()),
        })
        out = transition_cond_entropy(
            _ds(t), by="user_id", ts="ts", type_col="event_type",
            id_col="event_id",
        ).to_pandas().set_index("from_type")
        assert abs(out.loc["a", "h"]) < 1e-12          # a -> b always
        assert abs(out.loc["b", "h"] - np.log(2)) < 1e-12
        assert out.loc["a", "n"] == 4 and out.loc["b", "n"] == 4
