"""Batch 79: 3-itemset mining, quantile treatment effects (oracle
parity covered by test_oracle.py)."""

import datetime

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestItemTriples:
    def test_known_bundle(self, ray_session):
        from datatest_ray.stages.basket import item_triples

        rows = []
        for u in range(6):                 # 6 users buy the bundle
            rows += [(u, "a"), (u, "b"), (u, "c")]
        rows += [(10, "a"), (11, "b"), (12, "x")]  # singles
        t = pa.table({"u": pa.array([r[0] for r in rows], pa.int64()),
                      "i": pa.array([r[1] for r in rows])})
        out = item_triples(_ds(t), user_col="u", item_col="i",
                           k=3).take_all()
        top = out[0]
        assert (top["item_a"], top["item_b"], top["item_c"]) == \
            ("a", "b", "c")
        assert top["n_all3"] == 6
        n_users = 9
        lift = 6 * n_users ** 2 / (7 * 7 * 6)
        assert top["lift"] == round(lift, 6)

    def test_no_triples_empty(self, ray_session):
        from datatest_ray.stages.basket import item_triples

        t = pa.table({"u": pa.array([1, 1, 2], pa.int64()),
                      "i": pa.array(["a", "b", "c"])})
        out = item_triples(_ds(t, 1), user_col="u",
                           item_col="i").take_all()
        assert out == []


class TestQuantileDiff:
    def test_planted_tail_shift(self, ray_session):
        from datatest_ray.stages.robust import quantile_diff

        # slice A doubles only the top decile
        base = list(np.round(np.linspace(1, 100, 500), 2))
        va = [v * 2 if v > 90 else v for v in base]
        t = pa.table({
            "v": pa.array(va + base, pa.float64()),
            "a": pa.array([True] * 500 + [False] * 500),
        })
        out = {r["q"]: r for r in quantile_diff(
            _ds(t), value_col="v",
            split_expr=lambda b: b.column("a")).take_all()}
        assert out[0.5]["diff"] == 0.0      # medians agree
        assert out[0.9]["diff"] > 50.0      # the tail moved

    def test_identical_slices_zero(self, ray_session):
        from datatest_ray.stages.robust import quantile_diff

        vals = list(np.round(np.linspace(5, 50, 200), 2))
        t = pa.table({"v": pa.array(vals * 2, pa.float64()),
                      "a": pa.array([True] * 200 + [False] * 200)})
        out = quantile_diff(_ds(t, 1), value_col="v",
                            split_expr=lambda b: b.column("a")
                            ).take_all()
        assert all(r["diff"] == 0.0 for r in out)
