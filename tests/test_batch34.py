"""Batch 34: Holt smoothing residuals, fixed-grid Gaussian KDE
(oracle parity covered by test_oracle.py)."""

import numpy as np
import pyarrow as pa


def _ds(t: pa.Table):
    import ray.data as rd

    return rd.from_arrow(t)


class TestHoltDaily:
    def test_linear_series_zero_residuals(self, ray_session):
        from datatest_ray.stages.temporal import holt_daily

        # perfectly linear daily counts: day d has 10 + 2*d events ->
        # Holt locks on after init (s1=x1, b1=x2-x1) and every
        # one-step forecast is exact
        ts = []
        for d in range(1, 9):
            n = 10 + 2 * d
            ts += [np.datetime64(f"2024-01-0{d}T12:00:00", "us")] * n
        t = pa.table({"g": ["a"] * len(ts),
                      "ts": pa.array(ts, pa.timestamp("us"))})
        out = holt_daily(_ds(t), "ts", by="g").to_pandas()
        assert len(out) == 7  # days 2..8
        assert np.abs(out["resid"]).max() < 1e-9

    def test_recurrence_hand_check(self, ray_session):
        from datatest_ray.stages.temporal import holt_daily

        counts = [4, 6, 3, 9]
        ts = []
        for d, n in enumerate(counts, start=1):
            ts += [np.datetime64(f"2024-02-0{d}T00:00:00", "us")] * n
        t = pa.table({"g": ["g"] * len(ts),
                      "ts": pa.array(ts, pa.timestamp("us"))})
        out = holt_daily(_ds(t), "ts", by="g").to_pandas()
        s, b = 4.0, 2.0
        expect = []
        for x in counts[1:]:
            f = s + b
            expect.append((x, f, x - f))
            s_new = 0.5 * x + 0.5 * (s + b)
            b = 0.25 * (s_new - s) + 0.75 * b
            s = s_new
        got = list(zip(out["x"], out["forecast"], out["resid"]))
        for (x, f, r), (gx, gf, gr) in zip(expect, got):
            assert gx == x and abs(gf - f) < 1e-12 and abs(gr - r) < 1e-12

    def test_single_day_group_skipped(self, ray_session):
        from datatest_ray.stages.temporal import holt_daily

        t = pa.table({
            "g": ["only"],
            "ts": pa.array([np.datetime64("2024-01-01T00:00:00", "us")],
                           pa.timestamp("us")),
        })
        out = holt_daily(_ds(t), "ts", by="g").to_pandas()
        assert len(out) == 0


class TestKdeFixedGrid:
    def test_matches_direct_formula(self, ray_session):
        from datatest_ray.stages.stattests import kde_fixed_grid

        rng = np.random.RandomState(1)
        x = rng.normal(100, 30, 500)
        t = pa.table({"v": pa.array(x)})
        grid = [0.0, 50.0, 100.0, 150.0]
        out = kde_fixed_grid(_ds(t), value_col="v", grid=grid,
                             bandwidth=25.0).to_pandas().set_index("grid")
        for g in grid:
            ref = np.exp(-((g - x) ** 2) / (2 * 625.0)).sum() / (
                500 * 25.0 * np.sqrt(2 * np.pi))
            assert abs(out.loc[g, "density"] - ref) < 1e-12
        # mass concentrates at the mean
        assert out.loc[100.0, "density"] > out.loc[0.0, "density"]

    def test_nulls_dropped(self, ray_session):
        from datatest_ray.stages.stattests import kde_fixed_grid

        t = pa.table({"v": pa.array([10.0, None, 20.0])})
        out = kde_fixed_grid(_ds(t), value_col="v", grid=[15.0],
                             bandwidth=5.0).to_pandas()
        assert out.iloc[0]["n"] == 2
