"""Batch 36: Page's L trend test, Somers' D (oracle parity covered by
test_oracle.py)."""

import math

import numpy as np
import pyarrow as pa


def _ds(t: pa.Table):
    import ray.data as rd

    return rd.from_arrow(t)


class TestPagesL:
    def test_perfect_order_max_l(self, ray_session):
        from datatest_ray.stages.stattests import pages_l_test

        # every subject's values follow the hypothesized order exactly
        rows = []
        for s in range(1, 7):
            for j, t in enumerate(["lo", "mid", "hi"]):
                rows.append((s, t, 10.0 * (j + 1) + s))
        tbl = pa.table({
            "s": pa.array([r[0] for r in rows], pa.int64()),
            "t": pa.array([r[1] for r in rows]),
            "v": pa.array([r[2] for r in rows]),
        })
        out = pages_l_test(
            _ds(tbl), subject_col="s", treatment_col="t",
            ordered_treatments=["lo", "mid", "hi"],
            value_col="v").to_pandas()
        r = out.iloc[0]
        # per subject L contribution = 1*1 + 2*2 + 3*3 = 14; N=6
        assert r["n_subjects"] == 6
        assert r["l"] == 84.0
        mu = 6 * 3 * 16 / 4.0
        var = 6 * (27 - 3) ** 2 / (144.0 * 2)
        assert abs(r["z"] - (84.0 - mu) / math.sqrt(var)) < 1e-12
        assert r["z"] > 0

    def test_reverse_order_min_l(self, ray_session):
        from datatest_ray.stages.stattests import pages_l_test

        rows = []
        for s in range(1, 5):
            for j, t in enumerate(["lo", "mid", "hi"]):
                rows.append((s, t, 100.0 - 10.0 * j))
        tbl = pa.table({
            "s": pa.array([r[0] for r in rows], pa.int64()),
            "t": pa.array([r[1] for r in rows]),
            "v": pa.array([r[2] for r in rows]),
        })
        out = pages_l_test(
            _ds(tbl), subject_col="s", treatment_col="t",
            ordered_treatments=["lo", "mid", "hi"],
            value_col="v").to_pandas()
        # per subject: 1*3 + 2*2 + 3*1 = 10 -> L = 40, z < 0
        assert out.iloc[0]["l"] == 40.0
        assert out.iloc[0]["z"] < 0


class TestSomersD:
    def test_matches_brute_force(self, ray_session):
        from datatest_ray.stages.stattests import somers_d

        rng = np.random.RandomState(6)
        i = rng.randint(0, 5, 300)
        j = np.clip(i + rng.randint(-1, 2, 300), 0, 5)
        t = pa.table({"i": pa.array(i, pa.int64()),
                      "j": pa.array(j, pa.int64())})
        out = somers_d(_ds(t), i_col="i", j_col="j").to_pandas()
        c = d = tx = ty = 0
        for a in range(300):
            for b in range(a + 1, 300):
                di, dj = i[a] - i[b], j[a] - j[b]
                if di and dj:
                    if (di > 0) == (dj > 0):
                        c += 1
                    else:
                        d += 1
                elif di == 0 and dj != 0:
                    tx += 1
                elif di != 0 and dj == 0:
                    ty += 1
        r = out.iloc[0]
        assert (r["c_pairs"], r["d_pairs"]) == (c, d)
        assert (r["t_x"], r["t_y"]) == (tx, ty)
        assert abs(r["d_yx"] - (c - d) / (c + d + ty)) < 1e-12
        assert abs(r["d_xy"] - (c - d) / (c + d + tx)) < 1e-12

    def test_perfect_prediction(self, ray_session):
        from datatest_ray.stages.stattests import somers_d

        # y strictly follows x with extra ties only on x -> d_yx = 1
        t = pa.table({"i": pa.array([1, 2, 3, 3], pa.int64()),
                      "j": pa.array([1, 2, 3, 3], pa.int64())})
        out = somers_d(_ds(t), i_col="i", j_col="j").to_pandas()
        assert out.iloc[0]["d_yx"] == 1.0
