"""Batch 50: MASE scoreboard, c-chart, language confusion matrix,
hash-seeded bootstrap CI (oracle parity for all four covered by
test_oracle.py)."""

import datetime

import numpy as np
import pyarrow as pa


def _ds(t: pa.Table):
    import ray.data as rd

    return rd.from_arrow(t)


def _daily_events(counts, et="a"):
    ts = []
    day0 = datetime.datetime(2024, 1, 1)
    for d, c in enumerate(counts):
        ts.extend([day0 + datetime.timedelta(days=d)] * c)
    return pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                     "event_type": pa.array([et] * len(ts))})


class TestMase:
    def test_pure_cycle_model_wins(self, ray_session):
        from datatest_ray.stages.temporal import mase_daily

        # periodic + tiny trend: HW tracks the trend, naive lags by a
        # week's drift — HW must win (mase < 1)
        cycle = [10, 12, 14, 16, 18, 30, 40]
        counts = [c + w for w in range(6) for c in cycle]
        out = mase_daily(_ds(_daily_events(counts)), "ts",
                         by="event_type").take_all()
        assert len(out) == 1
        assert out[0]["n_obs"] == len(counts) - 7
        assert out[0]["mase"] is not None and out[0]["mase"] < 1.0

    def test_naive_perfect_when_exactly_periodic(self, ray_session):
        from datatest_ray.stages.temporal import mase_daily

        cycle = [10, 12, 14, 16, 18, 30, 40]
        out = mase_daily(_ds(_daily_events(cycle * 4)), "ts",
                         by="event_type").take_all()
        # the seasonal-naive MAE is exactly 0 → mase undefined (NULL)
        assert out[0]["mae_naive"] == 0.0
        assert out[0]["mase"] is None


class TestCChart:
    def test_flags_spike_day(self, ray_session):
        from datatest_ray.stages.temporal import c_chart

        counts = [10] * 20 + [60]  # spike on the last day
        out = {r["day"]: r for r in
               c_chart(_ds(_daily_events(counts)), "ts").take_all()}
        assert sum(r["out_of_control"] for r in out.values()) == 1
        spike_day = sorted(out)[-1]
        assert out[spike_day]["out_of_control"]
        cl = (10 * 20 + 60) / 21
        assert out[spike_day]["ucl"] == round(cl + 3 * np.sqrt(cl), 6)

    def test_filter_expr(self, ray_session):
        import pyarrow.compute as pc

        from datatest_ray.stages.temporal import c_chart

        t = _daily_events([5, 5], et="error")
        t2 = _daily_events([50, 50], et="view")
        both = pa.concat_tables([t, t2])
        out = c_chart(_ds(both), "ts",
                      filter_expr=lambda b: pc.equal(
                          b.column("event_type"), "error")).take_all()
        assert all(r["x"] == 5 for r in out)


class TestLangConfusion:
    def test_diagonal_dominates_and_planted_mismatch(self, ray_session):
        from datatest_ray.stages.text import lang_confusion

        en = "the cat and the dog is in it for a day"
        de = "der hund und die katze ist nicht mit ein zu den"
        t = pa.table({
            "lang": pa.array(["en"] * 10 + ["de"] * 10 + ["en"] * 3),
            "text": pa.array([en] * 10 + [de] * 10 + [de] * 3),
        })
        out = {(r["lang"], r["lang_pred"]): r["n"] for r in
               lang_confusion(_ds(t).repartition(3), "text",
                              lang_col="lang").take_all()}
        assert out[("en", "en")] == 10
        assert out[("de", "de")] == 10
        assert out[("en", "de")] == 3  # the planted metadata lie


class TestBootstrap:
    def test_reproducible_and_brackets_mean(self, ray_session):
        from datatest_ray.stages.stattests import hash_bootstrap_mean_ci

        rng = np.random.default_rng(6)
        vals = np.round(rng.normal(50, 10, 500), 2)
        t = pa.table({"id": pa.array(np.arange(500, dtype=np.int64)),
                      "v": pa.array(vals)})
        r1 = hash_bootstrap_mean_ci(
            _ds(t).repartition(4), value_col="v", id_col="id",
            n_boot=200).take_all()[0]
        r2 = hash_bootstrap_mean_ci(
            _ds(t).repartition(9), value_col="v", id_col="id",
            n_boot=200).take_all()[0]
        assert r1 == r2  # partition-count invariant (the audit property)
        assert r1["ci_lo"] < r1["mean"] < r1["ci_hi"]
        # CI width ≈ 2·2·σ/√n ≈ 1.8 — sane bounds
        assert 0.5 < r1["ci_hi"] - r1["ci_lo"] < 4.0

    def test_weight_distribution(self):
        # the hash weights must approximate Poisson(1) mass
        ids = np.arange(10000, dtype=np.int64)
        h = ((ids * 2654435761 + 7 * 40503) % 2147483648) % 8
        w = np.where(h < 3, 0, np.where(h < 6, 1, np.where(h < 7, 2, 3)))
        frac = np.bincount(w, minlength=4) / len(w)
        assert abs(frac[0] - 0.375) < 0.02
        assert abs(frac[1] - 0.375) < 0.02
        assert abs(frac[2] - 0.125) < 0.01
        assert abs(frac[3] - 0.125) < 0.01
