"""Session-9 operator batch 9: grouped Kendall tau-b, Mann–Whitney U,
Kaplan–Meier survival."""

import numpy as np
import pyarrow as pa


def _ds(table: pa.Table):
    import ray.data as rd

    return rd.from_arrow(table)


def _kendall_brute(x, y):
    """O(n²) tau-b with tie correction."""
    n = len(x)
    C = D = 0
    for i in range(n):
        for j in range(i + 1, n):
            sx = np.sign(x[j] - x[i])
            sy = np.sign(y[j] - y[i])
            p = sx * sy
            if p > 0:
                C += 1
            elif p < 0:
                D += 1
    n0 = n * (n - 1) // 2
    _, tx = np.unique(x, return_counts=True)
    _, ty = np.unique(y, return_counts=True)
    n1 = int((tx * (tx - 1) // 2).sum())
    n2 = int((ty * (ty - 1) // 2).sum())
    return (C - D) / np.sqrt(float(n0 - n1) * float(n0 - n2))


class TestKendallGrouped:
    def test_matches_brute_force_with_ties(self, ray_session):
        from datatest_ray.stages.robust import kendall_grouped

        rng = np.random.default_rng(2)
        x = rng.integers(1, 6, 200).astype(np.float64)
        y = (x + rng.integers(0, 4, 200)).astype(np.float64)
        g = np.where(rng.random(200) < 0.5, "a", "b")
        out = kendall_grouped(
            _ds(pa.table({"g": g, "x": x, "y": y})),
            by="g", x_col="x", y_col="y",
        ).to_pandas().set_index("g")
        for grp in ["a", "b"]:
            m = g == grp
            assert abs(out.loc[grp, "tau"]
                       - _kendall_brute(x[m], y[m])) < 1e-12
            assert out.loc[grp, "n"] == int(m.sum())

    def test_perfect_orders(self, ray_session):
        from datatest_ray.stages.robust import kendall_grouped

        t = pa.table({
            "g": ["up"] * 5 + ["down"] * 5,
            "x": [1.0, 2, 3, 4, 5] * 2,
            "y": [1.0, 2, 3, 4, 5] + [5.0, 4, 3, 2, 1],
        })
        out = kendall_grouped(_ds(t), by="g", x_col="x",
                              y_col="y").to_pandas().set_index("g")
        assert abs(out.loc["up", "tau"] - 1.0) < 1e-12
        assert abs(out.loc["down", "tau"] + 1.0) < 1e-12


class TestMannWhitney:
    def test_matches_brute_force(self, ray_session):
        from datatest_ray.stages.robust import mann_whitney

        rng = np.random.default_rng(9)
        va = rng.integers(1, 20, 150).astype(np.float64)
        vb = rng.integers(5, 25, 120).astype(np.float64)
        t = pa.table({
            "v": np.concatenate([va, vb]),
            "g": ["A"] * 150 + ["B"] * 120,
        })
        out = mann_whitney(_ds(t), value_col="v", group_col="g",
                           a="A", b="B").to_pandas()
        # brute force: U = #(a > b) + 0.5 #(a == b)
        u = float((va[:, None] > vb[None, :]).sum()
                  + 0.5 * (va[:, None] == vb[None, :]).sum())
        assert out.iloc[0]["n_a"] == 150 and out.iloc[0]["n_b"] == 120
        assert abs(out.iloc[0]["u"] - u) < 1e-9
        pooled = np.concatenate([va, vb])
        n = len(pooled)
        _, cnt = np.unique(pooled, return_counts=True)
        tie = float((cnt.astype(np.int64) ** 3 - cnt).sum())
        var = 150 * 120 / 12.0 * ((n + 1) - tie / (n * (n - 1)))
        z = (u - 150 * 120 / 2.0) / np.sqrt(var)
        assert abs(out.iloc[0]["z"] - z) < 1e-9

    def test_shifted_distribution_flagged(self, ray_session):
        from datatest_ray.stages.robust import mann_whitney

        rng = np.random.default_rng(4)
        t = pa.table({
            "v": np.concatenate([rng.normal(0, 1, 300),
                                 rng.normal(1.0, 1, 300)]),
            "g": ["A"] * 300 + ["B"] * 300,
        })
        out = mann_whitney(_ds(t), value_col="v", group_col="g",
                           a="A", b="B").to_pandas()
        assert out.iloc[0]["z"] < -5  # A stochastically smaller

    def test_other_groups_excluded(self, ray_session):
        from datatest_ray.stages.robust import mann_whitney

        t = pa.table({"v": [1.0, 2, 3, 4, 100.0],
                      "g": ["A", "A", "B", "B", "C"]})
        out = mann_whitney(_ds(t), value_col="v", group_col="g",
                           a="A", b="B").to_pandas()
        assert out.iloc[0]["n_a"] == 2 and out.iloc[0]["n_b"] == 2


class TestKMSurvival:
    def test_textbook_km_table(self, ray_session):
        from datatest_ray.stages.temporal import km_survival

        DAY = 86_400_000_000
        # corpus end at day 100; horizon 7 -> censored if last >= day 93
        rows = []
        # 3 users churned at lifetime 2 days, 1 at 5, 2 censored (last
        # near corpus end), 1 churned at 5
        specs = [
            (0, 0, 2, True), (1, 10, 12, True), (2, 20, 22, True),
            (3, 30, 35, True), (4, 40, 45, True),
            (5, 90, 100, False), (6, 94, 99, False),
        ]
        for uid, a, b, _ in specs:
            rows += [(uid, a * DAY), (uid, b * DAY)]
        t = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        })
        out = km_survival(_ds(t), "ts", by="user_id",
                          horizon_days=7).to_pandas()
        # durations: 2,2,2,5,5 churned; 10,5 censored (users 5,6: last
        # within 7 days of max -> censored). user6 dur=5 censored!
        # at t=2: n_risk=7, d=3 -> S=4/7
        # at t=5: n_risk=4, d=2 -> S=4/7 * 2/4 = 2/7
        assert list(out["dur_days"]) == [2, 5]
        assert list(out["d"]) == [3, 2]
        assert list(out["n_risk"]) == [7, 4]
        assert abs(out.iloc[0]["s"] - 4 / 7) < 1e-12
        assert abs(out.iloc[1]["s"] - 2 / 7) < 1e-12

    def test_survival_monotone_nonincreasing(self, ray_session):
        from datatest_ray.stages.temporal import km_survival

        rng = np.random.default_rng(6)
        DAY = 86_400_000_000
        uids, tss = [], []
        for uid in range(50):
            start = int(rng.integers(0, 50)) * DAY
            life = int(rng.integers(1, 40)) * DAY
            uids += [uid, uid]
            tss += [start, start + life]
        t = pa.table({"user_id": pa.array(uids, pa.int64()),
                      "ts": pa.array(tss, pa.timestamp("us"))})
        out = km_survival(_ds(t), "ts", by="user_id").to_pandas()
        s = out["s"].to_numpy()
        assert (np.diff(s) <= 1e-12).all()
        assert (s > 0).all() or s[-1] == 0
