"""Session-9 operator batch 10: duplicated-line detection, Welch's
t-test, first-touch attribution."""

import numpy as np
import pyarrow as pa


def _ds(table: pa.Table):
    import ray.data as rd

    return rd.from_arrow(table)


class TestDupLines:
    def test_shared_boilerplate_found(self, ray_session):
        from datatest_ray.stages.text import dup_lines

        boiler = "Subscribe to our newsletter for daily updates"
        texts = [
            f"Unique opening sentence number {i}. {boiler}. "
            f"Another unique closing thought {i * 7}."
            for i in range(6)
        ] + ["Totally standalone document with no shared sentences."]
        t = pa.table({"doc_id": pa.array(range(7), pa.int64()),
                      "text": texts})
        out = dup_lines(_ds(t), "text", "doc_id",
                        min_chars=20).to_pandas()
        assert len(out) == 1
        assert out.iloc[0]["line"] == boiler.lower()
        assert out.iloc[0]["n_docs"] == 6

    def test_within_doc_repeat_not_counted_twice(self, ray_session):
        from datatest_ray.stages.text import dup_lines

        line = "this exact sentence repeats inside one document"
        t = pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": [f"{line}. filler filler filler filler. {line}.",
                     f"{line}. other unrelated filler sentence here."],
        })
        out = dup_lines(_ds(t), "text", "doc_id",
                        min_chars=20).to_pandas()
        assert len(out) == 1
        assert out.iloc[0]["n_docs"] == 2  # distinct docs, not 3

    def test_short_lines_ignored(self, ray_session):
        from datatest_ray.stages.text import dup_lines

        t = pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": ["short. short. unique alpha sentence one here.",
                     "short. unique beta sentence two over there."],
        })
        out = dup_lines(_ds(t), "text", "doc_id",
                        min_chars=20).to_pandas()
        assert len(out) == 0


class TestWelchTTest:
    def test_matches_closed_form(self, ray_session):
        from datatest_ray.stages.robust import welch_ttest

        rng = np.random.default_rng(12)
        va = rng.normal(10, 2, 200)
        vb = rng.normal(11, 5, 80)
        t = pa.table({
            "v": np.concatenate([va, vb]),
            "g": ["A"] * 200 + ["B"] * 80,
        })
        out = welch_ttest(_ds(t), value_col="v", group_col="g",
                          a="A", b="B").to_pandas()
        na, nb = 200, 80
        ma, mb = va.mean(), vb.mean()
        sa, sb = va.var(ddof=1), vb.var(ddof=1)
        se2 = sa / na + sb / nb
        tstat = (ma - mb) / np.sqrt(se2)
        df = se2 ** 2 / ((sa / na) ** 2 / (na - 1)
                         + (sb / nb) ** 2 / (nb - 1))
        r = out.iloc[0]
        assert r["n_a"] == na and r["n_b"] == nb
        assert abs(r["mean_a"] - ma) < 1e-9
        assert abs(r["t"] - tstat) < 1e-9
        assert abs(r["df"] - df) < 1e-6

    def test_degenerate_group_null_stats(self, ray_session):
        from datatest_ray.stages.robust import welch_ttest

        t = pa.table({"v": [1.0, 2.0, 3.0], "g": ["A", "A", "B"]})
        out = welch_ttest(_ds(t), value_col="v", group_col="g",
                          a="A", b="B").to_pandas()
        assert out.iloc[0]["n_b"] == 1
        assert np.isnan(out.iloc[0]["t"])


class TestFirstTouchAttribution:
    def test_credits_first_event_type(self, ray_session):
        from datatest_ray.stages.seq import first_touch_attribution

        # user 1: click first, purchases 10+5; user 2: view first,
        # purchase 7; user 3: purchase first (20); user 4: click
        # first, no purchases
        rows = [
            (1, 1, "click", None), (1, 2, "purchase", 10.0),
            (1, 3, "purchase", 5.0),
            (2, 1, "view", None), (2, 2, "purchase", 7.0),
            (3, 1, "purchase", 20.0),
            (4, 1, "click", None),
        ]
        t = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] * 1_000_000 for r in rows],
                           pa.timestamp("us")),
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        })
        out = first_touch_attribution(
            _ds(t), by="user_id", ts="ts", type_col="event_type",
            id_col="event_id", value_col="value",
        ).to_pandas().set_index("first_type")
        assert out.loc["click", "n_users"] == 2
        assert out.loc["click", "total_value"] == 15.0
        assert out.loc["view", "total_value"] == 7.0
        assert out.loc["purchase", "total_value"] == 20.0

    def test_tie_broken_by_event_id(self, ray_session):
        from datatest_ray.stages.seq import first_touch_attribution

        # same ts: event_id decides the first touch
        t = pa.table({
            "user_id": pa.array([1, 1], pa.int64()),
            "ts": pa.array([0, 0], pa.timestamp("us")),
            "event_id": pa.array([2, 1], pa.int64()),
            "event_type": pa.array(["late", "early"]),
            "value": pa.array([0.0, 0.0], pa.float64()),
        })
        out = first_touch_attribution(
            _ds(t), by="user_id", ts="ts", type_col="event_type",
            id_col="event_id", value_col="value",
        ).to_pandas()
        assert list(out["first_type"]) == ["early"]
