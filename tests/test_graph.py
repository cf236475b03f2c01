"""Connected components over dup-pair edge lists (stages/graph.py)."""

import numpy as np
import pyarrow as pa
import pytest

from datatest_ray.stages.graph import connected_components


def _uf_min_labels(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out

def _run(pairs, **kw):
    import ray.data as rd

    t = pa.table({"a": pa.array([p[0] for p in pairs], pa.int64()),
                  "b": pa.array([p[1] for p in pairs], pa.int64())})
    out = connected_components(rd.from_arrow(t), **kw)
    return {r["node"]: r["cluster_id"] for r in out.take_all()}


def test_chain_collapses_to_one_cluster(ray_session):
    # (1,2),(2,3),...,(9,10): transitivity must label everything 1 —
    # the case pairwise dedup output alone gets wrong
    pairs = [(i, i + 1) for i in range(1, 10)]
    got = _run(pairs, shuffle_partitions=2)
    assert got == {i: 1 for i in range(1, 11)}


def test_matches_union_find_on_random_graph(ray_session):
    rng = np.random.RandomState(7)
    pairs = [tuple(sorted(p)) for p in rng.randint(0, 300, (200, 2)) if p[0] != p[1]]
    got = _run(pairs, shuffle_partitions=4)
    assert got == _uf_min_labels(pairs)


def test_empty_pairs(ray_session):
    got = _run([], shuffle_partitions=2)
    assert got == {}


def test_degree_histogram(ray_session):
    import ray.data as rd

    from datatest_ray.stages.graph import degree_histogram

    # star: 1-2, 1-3, 1-4  plus isolated pair 5-6
    pairs = rd.from_items([
        {"a": 1, "b": 2}, {"a": 1, "b": 3}, {"a": 1, "b": 4},
        {"a": 5, "b": 6},
    ])
    out = degree_histogram(pairs).to_pandas()
    got = dict(zip(out["degree"], out["n_nodes"]))
    # node 1 has degree 3; nodes 2,3,4,5,6 have degree 1
    assert got == {3: 1, 1: 5}


class TestErClusterSizes:
    def test_two_clusters_histogram(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from datatest_ray.stages.graph import er_cluster_sizes

        # three near-identical 'acme' variants + two 'zenith' variants
        # + one singleton that matches nothing (singletons don't appear:
        # they have no pairs, hence no component rows)
        ds = rd.from_arrow(pa.table({
            "id": [1, 2, 3, 4, 5, 6],
            "name": ["acme corporation ltd", "acme corporation ltd.",
                     "acme corporation limited", "zenith widgets inc",
                     "zenith widgets incorporated", "unrelated name here"],
        }))
        out = er_cluster_sizes(ds, "name", "id", block_chars=3,
                               window=5, threshold=0.9).to_pandas()
        got = dict(zip(out["size"], out.n_clusters))
        assert got == {3: 1, 2: 1}


class TestPagerank:
    def test_matches_numpy_power_iteration(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd
        from datatest_ray.stages.graph import pagerank

        # directed triangle + a two-node cycle, symmetrized by hand
        raw = [(0, 1), (1, 2), (2, 0), (3, 4)]
        src = [a for a, b in raw] + [b for a, b in raw]
        dst = [b for a, b in raw] + [a for a, b in raw]
        ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
        out = pagerank(ds, iters=3).to_pandas().set_index("node")

        nodes = sorted(set(src))
        idx = {v: i for i, v in enumerate(nodes)}
        deg = np.zeros(len(nodes))
        for a in src:
            deg[idx[a]] += 1
        r = np.full(len(nodes), 1 / len(nodes))
        for _ in range(3):
            nr = np.full(len(nodes), 0.15 / len(nodes))
            for a, b in zip(src, dst):
                nr[idx[b]] += 0.85 * r[idx[a]] / deg[idx[a]]
            r = nr
        for v in nodes:
            assert abs(out.loc[v, "pr"] - r[idx[v]]) < 1e-9
        # probability mass conserved (no dangling nodes)
        assert abs(out.pr.sum() - 1.0) < 1e-9


class TestTriangleStats:
    def _census(self, edges):
        import ray.data as rd
        from datatest_ray.stages.graph import triangle_stats

        t = pa.table({"u": pa.array([a for a, b in edges], pa.int64()),
                      "v": pa.array([b for a, b in edges], pa.int64())})
        return triangle_stats(rd.from_arrow(t)).to_pydict()

    def test_known_small_graph(self, ray_session):
        # K4 on {0,1,2,3} plus a pendant 3-4: 4 triangles,
        # wedges = sum d(d-1)/2 with degrees (3,3,3,4,1) -> 3*3+6+0 = 15
        edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)]
        out = self._census(edges)
        assert out["n_nodes"] == [5]
        assert out["n_edges"] == [7]
        assert out["n_wedges"] == [15]
        assert out["n_triangles"] == [4]
        assert out["transitivity"] == [3.0 * 4 / 15]

    def test_triangle_free(self, ray_session):
        # star graph: max wedges, zero triangles
        out = self._census([(0, i) for i in range(1, 6)])
        assert out["n_triangles"] == [0]
        assert out["n_wedges"] == [10]
        assert out["transitivity"] == [0.0]

    def test_matches_bruteforce_on_random_graph(self, ray_session):
        from itertools import combinations

        rng = np.random.RandomState(7)
        n = 40
        edges = [(a, b) for a, b in combinations(range(n), 2)
                 if rng.rand() < 0.15]
        adj = {v: set() for v in range(n)}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        t_brute = sum(1 for a, b, c in combinations(range(n), 3)
                      if b in adj[a] and c in adj[a] and c in adj[b])
        w_brute = sum(len(s) * (len(s) - 1) // 2 for s in adj.values())
        out = self._census(edges)
        assert out["n_triangles"] == [t_brute]
        assert out["n_wedges"] == [w_brute]
        assert out["n_edges"] == [len(edges)]

    def test_projected_edges(self, ray_session):
        import ray.data as rd
        from datatest_ray.stages.graph import projected_edges

        # groups: {1,2,3}, {2,3}, {4}, duplicated memberships
        g = [10, 10, 10, 10, 20, 20, 30]
        x = [1, 2, 3, 2, 2, 3, 4]
        ds = rd.from_arrow(pa.table({"g": g, "x": x}))
        out = projected_edges(ds, group_col="g", node_col="x").to_pandas()
        got = sorted(map(tuple, out[["u", "v"]].itertuples(index=False)))
        assert got == [(1, 2), (1, 3), (2, 3)]

    def test_dataset_state_path_matches_broadcast(self, ray_session):
        """The >broadcast_nodes_max co-group rounds must produce the
        same ranks as the broadcast path (forced via threshold 0)."""
        import pyarrow as pa
        import ray.data as rd
        from datatest_ray.stages.graph import pagerank

        raw = [(0, 1), (1, 2), (2, 0), (3, 4), (1, 3)]
        src = [a for a, b in raw] + [b for a, b in raw]
        dst = [b for a, b in raw] + [a for a, b in raw]
        ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
        small = pagerank(ds, iters=3).to_pandas().set_index("node")
        big = pagerank(ds, iters=3,
                       broadcast_nodes_max=0).to_pandas().set_index("node")
        assert set(small.index) == set(big.index)
        for v in small.index:
            assert abs(small.loc[v, "pr"] - big.loc[v, "pr"]) < 1e-12
