"""Batch 32: Jonckheere-Terpstra trend test, Cochran's Q (oracle
parity covered by test_oracle.py)."""

import numpy as np
import pyarrow as pa


def _ds(t: pa.Table):
    import ray.data as rd

    return rd.from_arrow(t)


class TestJonckheereTerpstra:
    def test_matches_brute_force_with_ties(self, ray_session):
        from datatest_ray.stages.stattests import jonckheere_terpstra

        rng = np.random.RandomState(9)
        groups = ["lo", "mid", "hi"]
        data = {g: np.round(rng.normal(i, 1.5, 80), 1)
                for i, g in enumerate(groups)}
        t = pa.table({
            "g": sum(([g] * 80 for g in groups), []),
            "v": pa.array(np.concatenate([data[g] for g in groups])),
        })
        out = jonckheere_terpstra(
            _ds(t), value_col="v", group_col="g",
            ordered_groups=groups).to_pandas()
        u_ref = 0.0
        for i in range(3):
            for j in range(i + 1, 3):
                a, b = data[groups[i]], data[groups[j]]
                u_ref += (a[:, None] < b[None, :]).sum()
                u_ref += 0.5 * (a[:, None] == b[None, :]).sum()
        r = out.iloc[0]
        assert r["n"] == 240
        assert abs(r["u"] - u_ref) < 1e-9
        assert r["z"] > 3  # strong built-in upward trend

    def test_reverse_order_flips_sign(self, ray_session):
        from datatest_ray.stages.stattests import jonckheere_terpstra

        t = pa.table({
            "g": ["a"] * 10 + ["b"] * 10,
            "v": pa.array(list(map(float, range(10)))
                          + list(map(float, range(100, 110)))),
        })
        up = jonckheere_terpstra(_ds(t), value_col="v", group_col="g",
                                 ordered_groups=["a", "b"]).to_pandas()
        dn = jonckheere_terpstra(_ds(t), value_col="v", group_col="g",
                                 ordered_groups=["b", "a"]).to_pandas()
        assert up.iloc[0]["u"] == 100.0  # all pairs concordant
        assert dn.iloc[0]["u"] == 0.0
        assert up.iloc[0]["z"] > 0 > dn.iloc[0]["z"]


class TestCochransQ:
    def test_hand_case(self, ray_session):
        from datatest_ray.stages.stattests import cochrans_q

        # 4 subjects x 3 categories; presence matrix:
        # s1: a,b  s2: a  s3: a,b,c  s4: b
        rows = [(1, "a"), (1, "b"), (2, "a"), (3, "a"), (3, "b"),
                (3, "c"), (4, "b"), (1, "a")]  # dup row ORs away
        t = pa.table({
            "s": pa.array([r[0] for r in rows], pa.int64()),
            "c": pa.array([r[1] for r in rows]),
        })
        out = cochrans_q(_ds(t), subject_col="s", cat_col="c",
                         categories=["a", "b", "c"]).to_pandas()
        r = out.iloc[0]
        # C = (3, 3, 1), R = (2, 1, 3, 1): num = 3*19 - 49 = 8,
        # den = 3*7 - 15 = 6 -> Q = 2 * 8/6
        assert r["n_subjects"] == 4 and r["k"] == 3
        assert abs(r["q"] - 2 * 8.0 / 6.0) < 1e-12

    def test_degenerate_all_present(self, ray_session):
        from datatest_ray.stages.stattests import cochrans_q

        t = pa.table({
            "s": pa.array([1, 1, 2, 2], pa.int64()),
            "c": pa.array(["a", "b", "a", "b"]),
        })
        out = cochrans_q(_ds(t), subject_col="s", cat_col="c",
                         categories=["a", "b"]).to_pandas()
        assert np.isnan(out.iloc[0]["q"])  # every R_s = k -> den 0
