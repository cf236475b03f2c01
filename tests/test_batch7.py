"""Session-8 operator batch 7: Wilson-CI rate, ledger invariant,
churn split, event trigrams, image border/entropy audit."""

import numpy as np
import pyarrow as pa


def _ds(table: pa.Table):
    import ray.data as rd

    return rd.from_arrow(table)


DAY = 86_400_000_000


class TestRateWithCI:
    def test_wilson_interval_closed_form(self, ray_session):
        from datatest_ray.stages.temporal import rate_with_ci

        # one day, 40 trials, 8 errors
        types = ["error"] * 8 + ["ok"] * 32
        t = pa.table({
            "ts": pa.array(np.arange(40, dtype=np.int64) * 1000,
                           pa.timestamp("us")),
            "y": types,
        })
        out = rate_with_ci(_ds(t), "ts", type_col="y",
                           target="error").to_pandas()
        n, k, z = 40.0, 8.0, 1.96
        p = k / n
        denom = 1 + z * z / n
        center = (p + z * z / (2 * n)) / denom
        half = z * np.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
        assert out.iloc[0]["rate"] == round(p, 6)
        assert abs(out.iloc[0]["ci_lo"] - round(center - half, 6)) < 1e-9
        assert abs(out.iloc[0]["ci_hi"] - round(center + half, 6)) < 1e-9
        assert out.iloc[0]["ci_lo"] > 0 and out.iloc[0]["ci_hi"] < 1


class TestLedgerMin:
    def test_dip_below_zero_flagged(self, ray_session):
        from datatest_ray.stages.seq import ledger_min

        # +5, -8 (dip to -3), +10 → final 7, min -3
        t = pa.table({
            "u": [1, 1, 1, 2, 2],
            "ts": pa.array([0, 1000, 2000, 0, 1000], pa.timestamp("us")),
            "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "d": [5.0, -8.0, 10.0, 3.0, -1.0],
        })
        out = ledger_min(_ds(t), by="u", ts="ts", id_col="id",
                         delta_col="d").to_pandas().set_index("u")
        assert out.loc[1, "min_units"] == -300
        assert out.loc[1, "final_units"] == 700
        assert out.loc[1, "went_negative"] == 1
        assert out.loc[2, "min_units"] == 200
        assert out.loc[2, "went_negative"] == 0

    def test_same_ts_ordered_by_id(self, ray_session):
        from datatest_ray.stages.seq import ledger_min

        # ids decide order at equal ts: -5 first would dip; +5 first not
        t = pa.table({
            "u": [1, 1],
            "ts": pa.array([0, 0], pa.timestamp("us")),
            "id": pa.array([2, 1], pa.int64()),
            "d": [-5.0, 5.0],
        })
        out = ledger_min(_ds(t), by="u", ts="ts", id_col="id",
                         delta_col="d").to_pandas()
        assert out.iloc[0]["min_units"] == 0
        assert out.iloc[0]["went_negative"] == 0


class TestChurnedKeys:
    def test_split_classification(self, ray_session):
        from datatest_ray.stages.temporal import churned_keys

        # u1 active both sides; u2 only before (churned); u3 only after
        t = pa.table({
            "u": [1, 1, 2, 3],
            "ts": pa.array([0, 25 * DAY, 5 * DAY, 26 * DAY],
                           pa.timestamp("us")),
        })
        out = churned_keys(_ds(t), "ts", by="u",
                           split_day=20).to_pandas().set_index("u")
        assert out.loc[1, "churned"] == 0
        assert out.loc[2, "churned"] == 1
        assert out.loc[2, "last_day_before"] == 5
        assert out.loc[3, "churned"] == 0
        assert np.isnan(out.loc[3, "last_day_before"])
        only = churned_keys(_ds(t), "ts", by="u", split_day=20,
                            only_churned=True).to_pandas()
        assert list(only["u"]) == [2]


class TestTrigramTopk:
    def test_counts_and_order(self, ray_session):
        from datatest_ray.stages.seq import trigram_topk

        # user 1: a b a b a → trigrams aba, bab, aba
        t = pa.table({
            "u": [1] * 5 + [2] * 2,
            "ts": pa.array(np.arange(7, dtype=np.int64) * 1000,
                           pa.timestamp("us")),
            "e": ["a", "b", "a", "b", "a", "x", "y"],
            "id": pa.array(np.arange(7), pa.int64()),
        })
        out = trigram_topk(_ds(t), by="u", ts="ts", type_col="e",
                           id_col="id", k=5).to_pandas()
        assert len(out) == 2                      # user 2 too short
        assert (out.iloc[0]["t0"], out.iloc[0]["t1"],
                out.iloc[0]["t2"], out.iloc[0]["n"]) == ("a", "b", "a", 2)
        assert out.iloc[1]["n"] == 1


class TestBorderEntropy:
    def _png(self, img):
        from datatest_ray.functions.png import png_encode

        return png_encode(img)

    def test_letterbox_detected(self, ray_session):
        from datatest_ray.stages.imaging import image_border_audit

        rng = np.random.RandomState(0)
        core = rng.randint(0, 256, (20, 32, 3), dtype=np.uint8)
        img = core.copy()
        img[:4] = 0          # 4-row black top bar
        img[-2:] = 0         # 2-row bottom bar
        plain = rng.randint(0, 256, (20, 32, 3), dtype=np.uint8)
        t = pa.table({
            "image_id": ["boxed", "plain"],
            "bytes": pa.array([self._png(img), self._png(plain)],
                              pa.binary()),
            "fmt": ["png", "png"],
        })
        out = image_border_audit(_ds(t), concurrency=1,
                                 batch_size=2).to_pandas().set_index(
            "image_id")
        assert out.loc["boxed", "border_top"] == 4
        assert out.loc["boxed", "border_bottom"] == 2
        assert out.loc["plain", "border_top"] == 0
        assert out.loc["plain", "entropy"] > 5.0

    def test_flat_image_zero_entropy(self, ray_session):
        from datatest_ray.stages.imaging import image_border_audit

        flat = np.full((8, 8, 3), 77, dtype=np.uint8)
        t = pa.table({
            "image_id": ["flat"],
            "bytes": pa.array([self._png(flat)], pa.binary()),
            "fmt": ["png"],
        })
        out = image_border_audit(_ds(t), concurrency=1,
                                 batch_size=1).to_pandas()
        assert out.iloc[0]["entropy"] == 0.0
        assert out.iloc[0]["border_top"] == 8     # fully flat
        assert out.iloc[0]["border_bottom"] == 0  # not double-counted
