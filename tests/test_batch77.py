"""Batch 77: item-item cosine, median polish (itemcos oracle parity
covered by test_oracle.py)."""

import datetime

import numpy as np
import pyarrow as pa


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestItemCosine:
    def test_known_overlap(self, ray_session):
        from datatest_ray.stages.basket import item_cosine

        # users 1..4 touch a; users 1..2 touch b; user 9 touches c
        rows = [(1, "a"), (2, "a"), (3, "a"), (4, "a"),
                (1, "b"), (2, "b"), (9, "c"), (1, "a")]  # dup row
        t = pa.table({"u": pa.array([r[0] for r in rows], pa.int64()),
                      "i": pa.array([r[1] for r in rows])})
        out = item_cosine(_ds(t), user_col="u", item_col="i",
                          k=5).take_all()
        top = out[0]
        assert (top["item_a"], top["item_b"]) == ("a", "b")
        assert top["n_both"] == 2
        assert top["cosine"] == round(2 / np.sqrt(4 * 2), 6)
        # c shares no users: no (a,c)/(b,c) rows at all
        assert all({r["item_a"], r["item_b"]} != {"a", "c"}
                   for r in out)

    def test_identical_baskets_cosine_one(self, ray_session):
        from datatest_ray.stages.basket import item_cosine

        rows = [(u, it) for u in range(5) for it in ("x", "y")]
        t = pa.table({"u": pa.array([r[0] for r in rows], pa.int64()),
                      "i": pa.array([r[1] for r in rows])})
        out = item_cosine(_ds(t, 1), user_col="u", item_col="i",
                          k=1).take_all()
        assert out[0]["cosine"] == 1.0


class TestMedianPolish:
    def _events(self, fn):
        """fn(dow, type_idx) -> daily count; 4 full weeks, 2 types."""
        ts, et = [], []
        # epoch-week aligned start so dow indexing is stable
        day0 = datetime.datetime(2024, 1, 4)
        for d in range(28):
            for j, t_ in enumerate(("t0", "t1")):
                c = fn(d % 7, j)
                tstamp = day0 + datetime.timedelta(days=d)
                ts.extend([tstamp] * c)
                et.extend([t_] * c)
        return pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                         "event_type": pa.array(et)})

    def test_pure_additive_zero_residuals(self, ray_session):
        from datatest_ray.stages.temporal import median_polish_dow_type

        row_eff = [0, 2, 4, 6, 8, 10, 12]
        col_eff = [0, 5]
        t = self._events(lambda d, j: 20 + row_eff[d] + col_eff[j])
        out = median_polish_dow_type(_ds(t), "ts",
                                     type_col="event_type").take_all()
        assert len(out) == 14
        for r in out:
            assert abs(r["residual"]) < 1e-9
            assert r["fitted"] == r["cell"]

    def test_interaction_cell_flagged(self, ray_session):
        from datatest_ray.stages.temporal import median_polish_dow_type

        def fn(d, j):
            base = 20 + 2 * d + 5 * j
            if d == 3 and j == 1:
                base += 40            # one interaction outlier
            return base

        out = median_polish_dow_type(_ds(self._events(fn)), "ts",
                                     type_col="event_type").take_all()
        resid = {(r["dow"], r["event_type"]): r["residual"]
                 for r in out}
        epoch_dow3 = max(resid, key=lambda k: abs(resid[k]))
        # the largest residual traces to the planted +40 interaction;
        # with only 2 columns the 2-point medians split it evenly, so
        # +/-20 lands on the dow-3 row
        assert abs(resid[epoch_dow3]) >= 19
        assert epoch_dow3[0] == 3
