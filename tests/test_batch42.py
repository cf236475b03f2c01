"""Batch 42: BFS hop levels and degree assortativity (oracle parity
covered by test_oracle.py; hand-checkable graphs below)."""

import math

import numpy as np
import pyarrow as pa


def _ds(t: pa.Table):
    import ray.data as rd

    return rd.from_arrow(t)


def _sym(edges):
    a = np.array([e[0] for e in edges], np.int64)
    b = np.array([e[1] for e in edges], np.int64)
    return pa.table({"u": pa.array(np.concatenate([a, b])),
                     "v": pa.array(np.concatenate([b, a]))})


class TestBfsLevels:
    def test_path_graph(self, ray_session):
        from datatest_ray.stages.graph import bfs_levels

        # 0-1-2-3-4 path: level == node id
        out = bfs_levels(_ds(_sym([(i, i + 1) for i in range(4)])),
                         source=0, max_hops=6).to_pandas()
        got = dict(zip(out["node"], out["level"]))
        assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}

    def test_max_hops_caps_exploration(self, ray_session):
        from datatest_ray.stages.graph import bfs_levels

        out = bfs_levels(_ds(_sym([(i, i + 1) for i in range(9)])),
                         source=0, max_hops=3).to_pandas()
        assert out["level"].max() == 3 and len(out) == 4

    def test_disconnected_and_cycle(self, ray_session):
        from datatest_ray.stages.graph import bfs_levels

        # triangle {0,1,2} plus far component {10,11}
        out = bfs_levels(
            _ds(_sym([(0, 1), (1, 2), (2, 0), (10, 11)])),
            source=0, max_hops=6).to_pandas()
        got = dict(zip(out["node"], out["level"]))
        assert got == {0: 0, 1: 1, 2: 1}

    def test_min_level_not_revisited(self, ray_session):
        from datatest_ray.stages.graph import bfs_levels

        # diamond: 0-1, 0-2, 1-3, 2-3 -> 3 discovered once at level 2
        out = bfs_levels(_ds(_sym([(0, 1), (0, 2), (1, 3), (2, 3)])),
                         source=0, max_hops=6).to_pandas()
        assert (out["node"] == 3).sum() == 1
        assert dict(zip(out["node"], out["level"]))[3] == 2


class TestAssortativity:
    def test_star_is_minus_one(self, ray_session):
        from datatest_ray.stages.graph import degree_assortativity

        # star K(1,5): assortativity exactly -1
        t = pa.table({"u": pa.array([0] * 5, pa.int64()),
                      "v": pa.array([1, 2, 3, 4, 5], pa.int64())})
        out = degree_assortativity(_ds(t))
        assert out.num_rows == 1
        assert out.column("n_edges_directed")[0].as_py() == 10
        assert abs(out.column("assortativity")[0].as_py() + 1.0) < 1e-12

    def test_matches_numpy_pearson(self, ray_session):
        from datatest_ray.stages.graph import degree_assortativity

        rng = np.random.default_rng(7)
        edges = {(int(a), int(b)) for a, b in
                 rng.integers(0, 30, size=(120, 2)) if a != b}
        edges = {(min(a, b), max(a, b)) for a, b in edges}
        u = np.array([e[0] for e in edges], np.int64)
        v = np.array([e[1] for e in edges], np.int64)
        out = degree_assortativity(
            _ds(pa.table({"u": pa.array(u), "v": pa.array(v)})))
        # independent reference: plain Pearson over both directions
        su = np.concatenate([u, v])
        sv = np.concatenate([v, u])
        deg = np.bincount(su, minlength=31)
        x, y = deg[su].astype(float), deg[sv].astype(float)
        ref = np.corrcoef(x, y)[0, 1]
        got = out.column("assortativity")[0].as_py()
        assert math.isfinite(got) and abs(got - ref) < 1e-9


def test_assortativity_modes_bit_identical(ray_session):
    """Broadcast-gather and lookup_join degree attachment must agree
    exactly (integer moment partials: partitioning cannot perturb)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from datatest_ray.stages.graph import degree_assortativity

    rng = np.random.RandomState(7)
    u = rng.randint(0, 200, 900).astype(np.int64)
    v = (rng.randint(0, 200, 900) + 200).astype(np.int64)
    keep = np.unique(u * 1000 + v)
    t = pa.table({"u": pa.array(keep // 1000), "v": pa.array(keep % 1000)})
    fast = degree_assortativity(rd.from_arrow(t)).to_pydict()
    slow = degree_assortativity(
        rd.from_arrow(t), broadcast_nodes_max=0).to_pydict()
    assert fast == slow
