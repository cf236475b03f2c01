"""Session-8 operator batch 5: rare combinations, hourly peak,
robust-z report, top-share concentration."""

import numpy as np
import pyarrow as pa


def _ds(table: pa.Table):
    import ray.data as rd

    return rd.from_arrow(table)


def _collect(ds):
    import ray.data

    if isinstance(ds, ray.data.Dataset):
        return ds.to_pandas()
    return ds.to_pandas()


HOUR_US = 3_600_000_000


class TestRareCombos:
    def test_suppressed_cell_ranks_first(self, ray_session):
        from datatest_ray.stages.drift import rare_combos

        # x=a,b uniform over y=p,q EXCEPT the (b,q) cell is suppressed
        x = ["a"] * 40 + ["b"] * 40
        y = ["p", "q"] * 20 + ["p"] * 39 + ["q"]
        out = _collect(rare_combos(_ds(pa.table({"x": x, "y": y})),
                                   "x", "y", k=2))
        assert (out.iloc[0]["x"], out.iloc[0]["y"]) == ("b", "q")
        assert out.iloc[0]["ratio"] < 0.2
        assert len(out) == 2

    def test_deterministic_tiebreak(self, ray_session):
        from datatest_ray.stages.drift import rare_combos

        # perfectly independent 2x2 → all ratios 1.0; order by (x, y)
        x = ["a", "a", "b", "b"] * 5
        y = ["p", "q", "p", "q"] * 5
        out = _collect(rare_combos(_ds(pa.table({"x": x, "y": y})),
                                   "x", "y", k=4))
        assert list(zip(out["x"], out["y"])) == [
            ("a", "p"), ("a", "q"), ("b", "p"), ("b", "q")]


class TestHourlyPeak:
    def test_peak_and_tiebreak(self, ray_session):
        from datatest_ray.stages.temporal import hourly_peak

        # key 'k1': hour 3 dominates; key 'k2': hours 1 and 5 tie → 1
        us = ([3 * HOUR_US] * 4 + [7 * HOUR_US]
              + [1 * HOUR_US] * 2 + [5 * HOUR_US] * 2)
        keys = ["k1"] * 5 + ["k2"] * 4
        t = pa.table({
            "k": keys,
            "ts": pa.array(np.array(us, dtype=np.int64),
                           pa.timestamp("us")),
        })
        out = _collect(hourly_peak(_ds(t), "ts", by="k")).set_index("k")
        assert out.loc["k1", "peak_hour"] == 3
        assert out.loc["k1", "n_peak"] == 4
        assert out.loc["k1", "n_total"] == 5
        assert out.loc["k2", "peak_hour"] == 1     # smallest-hour tie-break


class TestRobustZ:
    def test_outlier_counts_match_numpy(self, ray_session):
        from datatest_ray.stages.robust import robust_zscore_report

        rng = np.random.RandomState(11)
        v = np.concatenate([rng.normal(50, 5, 400), [500.0, -400.0]])
        out = _collect(robust_zscore_report(
            _ds(pa.table({"k": ["g"] * 402, "v": v})),
            by="k", col="v", z=3.5))
        med = round(float(np.quantile(v, 0.5)), 6)
        mad = round(float(np.quantile(np.abs(v - med), 0.5)), 6)
        rz = np.round(np.abs(v - med) / (1.4826 * mad), 6)
        assert out.iloc[0]["n"] == 402
        assert out.iloc[0]["n_outliers"] == int((rz > 3.5).sum())
        assert out.iloc[0]["n_outliers"] >= 2
        assert abs(out.iloc[0]["max_rz"] - rz.max()) < 1e-9

    def test_zero_mad_group_skipped(self, ray_session):
        from datatest_ray.stages.robust import robust_zscore_report

        t = pa.table({"k": ["c"] * 10 + ["v"] * 10,
                      "v": [5.0] * 10 + list(range(10))})
        out = _collect(robust_zscore_report(_ds(t), by="k", col="v"))
        assert set(out["k"]) == {"v"}              # constant group dropped


class TestTopShare:
    def test_exact_share_with_ties(self, ray_session):
        from datatest_ray.stages.profile import top_share

        # 10 keys; top-20% = 2 keys; values 10,9,9,9,... tie at the cut
        keys = np.arange(10)
        vals = np.array([10.0, 9.0, 9.0, 9.0, 1.0, 1.0, 1.0, 1.0, 1.0,
                         1.0])
        out = top_share(_ds(pa.table({"k": keys, "v": vals})),
                        key_col="k", value_col="v", frac=0.2).to_pandas()
        total = vals.sum()
        want = (10.0 + 9.0) / total
        assert out.iloc[0]["n_keys"] == 10
        assert out.iloc[0]["n_top"] == 2
        assert abs(out.iloc[0]["top_share"] - want) < 1e-9

    def test_aggregates_per_key_before_ranking(self, ray_session):
        from datatest_ray.stages.profile import top_share

        # key 1 appears 3 times summing to 30 — must beat single 20
        t = pa.table({"k": [1, 1, 1, 2, 3, 4, 5],
                      "v": [10.0, 10.0, 10.0, 20.0, 1.0, 1.0, 1.0]})
        out = top_share(_ds(t), key_col="k", value_col="v",
                        frac=0.2).to_pandas()
        assert out.iloc[0]["n_top"] == 1
        assert abs(out.iloc[0]["top_share"] - 30.0 / 53.0) < 1e-9
