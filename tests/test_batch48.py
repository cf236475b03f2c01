"""Batch 48: Holt-Winters seasonal smoothing, BH-FDR adjustment, Palma
ratio, exposure/color-cast audit (oracle parity for the first three
covered by test_oracle.py)."""

import numpy as np
import pyarrow as pa


def _ds(t: pa.Table):
    import ray.data as rd

    return rd.from_arrow(t)


class TestHoltWinters:
    def _events(self, counts):
        """One event per (day, i) so daily counts equal `counts`."""
        import datetime

        ts, et = [], []
        day0 = datetime.datetime(2024, 1, 1)
        for d, c in enumerate(counts):
            for _ in range(c):
                ts.append(day0 + datetime.timedelta(days=d))
                et.append("a")
        return pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                         "event_type": pa.array(et)})

    def test_pure_weekly_cycle_zero_residuals(self, ray_session):
        from datatest_ray.stages.temporal import holt_winters_daily

        cycle = [10, 12, 14, 16, 18, 30, 40]
        t = self._events(cycle * 4)
        out = holt_winters_daily(_ds(t), "ts",
                                 by="event_type").take_all()
        assert len(out) == 21  # 28 days − 7 init
        # a perfectly periodic series is forecast exactly: L stays at
        # the cycle mean, B at 0, seasonals reproduce the offsets
        assert all(abs(r["resid"]) < 1e-9 for r in out)

    def test_short_group_skipped(self, ray_session):
        from datatest_ray.stages.temporal import holt_winters_daily

        t = self._events([5, 5, 5, 5, 5, 5, 5])  # exactly 7 days
        out = holt_winters_daily(_ds(t), "ts",
                                 by="event_type").take_all()
        assert out == []


class TestBhAdjust:
    def test_known_example(self, ray_session):
        from datatest_ray.stages.stattests import bh_adjust

        # classic textbook set, k=5
        p = [0.01, 0.02, 0.03, 0.04, 0.5]
        t = pa.table({"h": pa.array([f"h{i}" for i in range(5)]),
                      "p": pa.array(p)})
        out = {r["h"]: r for r in
               bh_adjust(_ds(t), p_col="p", alpha=0.05).take_all()}
        # adj = min over j>=i of p_j * k / j
        want = [0.05, 0.05, 0.05, 0.05, 0.5]
        for i, w in enumerate(want):
            assert out[f"h{i}"]["p_adj"] == round(w, 6)
        assert out["h0"]["significant"] and not out["h4"]["significant"]

    def test_monotone_and_capped(self, ray_session):
        from datatest_ray.stages.stattests import bh_adjust

        rng = np.random.default_rng(5)
        p = rng.random(40)
        t = pa.table({"i": pa.array(range(40), pa.int64()),
                      "p": pa.array(p)})
        out = bh_adjust(_ds(t).repartition(4), p_col="p").to_pandas()
        out = out.sort_values("p")
        assert (out["p_adj"] <= 1.0).all()
        assert (np.diff(out["p_adj"].to_numpy()) >= -1e-12).all()
        assert (out["p_adj"].to_numpy()
                >= np.round(out["p"].to_numpy(), 6) - 1e-9).all()


class TestPalma:
    def test_known_split(self, ray_session):
        from datatest_ray.stages.stattests import palma_ratio

        # 100 distinct values 1..100: bottom-40 = 1..40, top-10 = 91..100
        t = pa.table({"v": pa.array(np.arange(1.0, 101.0))})
        row = palma_ratio(_ds(t).repartition(3),
                          value_col="v").take_all()[0]
        total = 5050.0
        bot = sum(range(1, 41))
        top = sum(range(91, 101))
        assert row["bottom40_share"] == round(bot / total, 6)
        assert row["top10_share"] == round(top / total, 6)
        assert row["palma"] == round(top / bot, 6)


class TestExposure:
    def _png(self, img):
        from datatest_ray.functions.png import png_encode

        return png_encode(img)

    def test_clipping_and_cast(self, ray_session):
        from datatest_ray.stages.imaging import image_exposure_scores

        dark = np.zeros((16, 16, 3), dtype=np.uint8)          # all under
        bright = np.full((16, 16, 3), 255, dtype=np.uint8)    # all over
        mid = np.full((16, 16, 3), 128, dtype=np.uint8)       # clean
        castimg = np.zeros((16, 16, 3), dtype=np.uint8)
        castimg[:, :, 0] = 200                                # red cast
        t = pa.table({
            "image_id": pa.array(["dark", "bright", "mid", "cast"]),
            "bytes": pa.array([self._png(i) for i in
                               (dark, bright, mid, castimg)],
                              pa.binary()),
            "fmt": pa.array(["png"] * 4),
        })
        out = {r["image_id"]: r for r in
               image_exposure_scores(_ds(t), concurrency=1,
                                     batch_size=2).take_all()}
        assert out["dark"]["frac_under"] == 1.0
        assert out["dark"]["frac_over"] == 0.0
        assert out["bright"]["frac_over"] == 1.0
        assert out["mid"]["frac_under"] == 0.0
        assert out["mid"]["frac_over"] == 0.0
        assert out["mid"]["cast"] == 0.0
        # gray plane of castimg is 200/3 ≈ 66.7 — not clipped, but cast
        assert out["cast"]["cast"] == 200.0
        assert out["cast"]["frac_under"] == 0.0

    def test_decode_failure_emits_nulls(self, ray_session):
        from datatest_ray.stages.imaging import image_exposure_scores

        t = pa.table({
            "image_id": pa.array(["bad"]),
            "bytes": pa.array([b"not a png"], pa.binary()),
            "fmt": pa.array(["png"]),
        })
        out = image_exposure_scores(_ds(t), concurrency=1).take_all()
        assert out[0]["frac_under"] is None
        assert out[0]["cast"] is None
