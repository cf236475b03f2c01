"""Batch 45: capped running balance and k-core peeling (balance
oracle parity covered by test_oracle.py; brute-force parity below)."""

import numpy as np
import pyarrow as pa


def _ds(t: pa.Table):
    import ray.data as rd

    return rd.from_arrow(t)


class TestCappedBalance:
    def test_hand_case(self, ray_session):
        from datatest_ray.stages.winfunc import capped_balance

        base = np.datetime64("2024-01-01T00:00:00", "us")
        h = np.timedelta64(3_600_000_000, "us")
        # user 1 deltas: +5, -8 (floor! bal 0), +3, -1 -> final 2, 1 reset
        # user 2 deltas: -4 (floor on first row), +2 -> final 2, 1 reset
        t = pa.table({
            "u": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            "ts": pa.array([base + i * h for i in range(4)]
                           + [base, base + h], pa.timestamp("us")),
            "d": pa.array([5, -8, 3, -1, -4, 2], pa.int64()),
            "id": pa.array(list(range(6)), pa.int64()),
        })
        out = capped_balance(_ds(t), by="u", ts_col="ts",
                             delta_col="d", id_col="id"
                             ).to_pandas().set_index("u")
        assert out.loc[1, "final_bal"] == 2 and out.loc[1, "n_resets"] == 1
        assert out.loc[2, "final_bal"] == 2 and out.loc[2, "n_resets"] == 1
        assert out.loc[1, "n_events"] == 4

    def test_matches_sequential_recursion(self, ray_session):
        from datatest_ray.stages.winfunc import capped_balance

        rng = np.random.default_rng(11)
        n = 600
        base = np.datetime64("2024-01-01T00:00:00", "us")
        us = rng.integers(0, 12, n)
        deltas = rng.integers(-50, 40, n)
        t = pa.table({
            "u": pa.array(us, pa.int64()),
            "ts": pa.array([base + np.timedelta64(int(i), "s")
                            for i in range(n)], pa.timestamp("us")),
            "d": pa.array(deltas, pa.int64()),
            "id": pa.array(list(range(n)), pa.int64()),
        })
        out = capped_balance(_ds(t), by="u", ts_col="ts",
                             delta_col="d", id_col="id"
                             ).to_pandas().set_index("u")
        for u in np.unique(us):
            bal, resets = 0, 0
            for d in deltas[us == u]:
                if bal + d < 0:
                    resets += 1
                bal = max(0, bal + int(d))
            assert out.loc[u, "final_bal"] == bal, u
            assert out.loc[u, "n_resets"] == resets, u


def _brute_kcore(edges, k):
    """Reference peeling over a set of undirected edges."""
    es = {tuple(e) for e in edges}
    while True:
        deg = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        drop = {n for n, d in deg.items() if d < k}
        if not drop:
            return deg
        es = {(a, b) for a, b in es if a not in drop and b not in drop}
        if not es:
            return {}


class TestKCore:
    def test_triangle_is_2core_path_is_not(self, ray_session):
        from datatest_ray.stages.graph import k_core

        # triangle 0-1-2 plus a tail 2-3-4: 2-core = the triangle
        t = pa.table({"u": pa.array([0, 1, 2, 2, 3], pa.int64()),
                      "v": pa.array([1, 2, 0, 3, 4], pa.int64())})
        b = list(k_core(_ds(t), k=2).iter_batches(batch_format="pyarrow"))
        out = pa.concat_tables(b).to_pandas()
        assert sorted(out["node"]) == [0, 1, 2]
        assert (out["degree"] == 2).all()

    def test_empty_core(self, ray_session):
        from datatest_ray.stages.graph import k_core

        t = pa.table({"u": pa.array([0, 1], pa.int64()),
                      "v": pa.array([1, 2], pa.int64())})
        ds = k_core(_ds(t), k=3)
        assert ds.count() == 0

    def test_matches_bruteforce(self, ray_session):
        from datatest_ray.stages.graph import k_core

        rng = np.random.default_rng(5)
        raw = {(min(int(a), int(b)), max(int(a), int(b)))
               for a, b in rng.integers(0, 40, size=(180, 2)) if a != b}
        edges = sorted(raw)
        t = pa.table({"u": pa.array([e[0] for e in edges], pa.int64()),
                      "v": pa.array([e[1] for e in edges], pa.int64())})
        for k in (3, 5, 7):
            ref = _brute_kcore(edges, k)
            b = list(k_core(_ds(t), k=k).iter_batches(
                batch_format="pyarrow"))
            got = (dict(zip(pa.concat_tables(b).column("node").to_pylist(),
                            pa.concat_tables(b).column("degree").to_pylist()))
                   if b else {})
            assert got == ref, k
