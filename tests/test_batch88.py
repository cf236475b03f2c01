"""Batch 88: log-log elasticity, degree Gini (oracle parity covered
by test_oracle.py)."""

import numpy as np
import pyarrow as pa


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestDegreeGini:
    def _run(self, pairs):
        from ray.data.aggregate import Count

        from datatest_ray.stages.graph import degree_gini

        t = pa.table({
            "u": pa.array([p[0] for p in pairs], pa.int64()),
            "v": pa.array([p[1] for p in pairs], pa.int64()),
        })
        d = _ds(t).groupby(["u", "v"]).aggregate(Count(alias_name="_"))
        return degree_gini(d, node_col="u",
                           other_col="v").take_all()[0]

    def test_equal_degrees_zero(self, ray_session):
        pairs = [(u, v) for u in range(10) for v in range(3)]
        out = self._run(pairs)
        assert out["n_nodes"] == 10
        assert out["gini"] == 0.0

    def test_hub_raises_gini(self, ray_session):
        pairs = [(u, 0) for u in range(9)]           # 9 nodes, deg 1
        pairs += [(9, v) for v in range(91)]          # one hub, deg 91
        out = self._run(pairs)
        assert out["gini"] > 0.7

    def test_matches_rank_formula(self, ray_session):
        rng = np.random.RandomState(1)
        pairs = []
        for u in range(20):
            for v in rng.choice(50, size=rng.randint(1, 10),
                                replace=False):
                pairs.append((u, int(v)))
        out = self._run(pairs)
        deg = {}
        for u, v in set(pairs):
            deg[u] = deg.get(u, 0) + 1
        d = np.sort(np.array(list(deg.values()), dtype=float))
        n = len(d)
        i = np.arange(1, n + 1)
        gini = 2 * np.sum(i * d) / (n * d.sum()) - (n + 1) / n
        assert abs(out["gini"] - round(gini, 6)) < 1e-9


class TestElasticity:
    def test_planted_slope(self, ray_session):
        import sys
        sys.path.insert(0, "/root/repo")
        from datatest_ray.pipelines.oracle88 import q_elasticity_parts

        # build a tiny parquet dir where qty = price^-2 exactly
        import os
        import tempfile

        import pyarrow.parquet as pq

        tmp = tempfile.mkdtemp(prefix="elas_sf")
        rows_k, rows_q, rows_p = [], [], []
        for k, price in enumerate([10.0, 20.0, 40.0, 80.0, 160.0]):
            qty = 1e6 / price ** 2
            rows_k.append(k)
            rows_q.append(qty)
            rows_p.append(price)
        pq.write_table(pa.table({
            "l_partkey": pa.array(rows_k, pa.int64()),
            "l_quantity": pa.array(rows_q, pa.float64()),
            "l_extendedprice": pa.array(rows_p, pa.float64()),
        }), f"{tmp}/lineitem.parquet")
        out = q_elasticity_parts(tmp).to_pydict()
        assert out["n_parts"][0] == 5
        assert abs(out["slope"][0] + 2.0) < 0.01
        assert out["r2"][0] > 0.999
