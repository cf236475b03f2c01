"""Batch 81: Dunn's post-hoc pairwise rank test (oracle parity
covered by test_oracle.py)."""

import numpy as np
import pyarrow as pa


def _ds(t, n=3):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestDunnPairs:
    def _run(self, samples):
        from datatest_ray.stages.stattests import dunn_pairs

        g, v = [], []
        for name, xs in samples.items():
            g.extend([name] * len(xs))
            v.extend(xs)
        t = pa.table({"g": pa.array(g), "v": pa.array(v, pa.float64())})
        out = dunn_pairs(_ds(t), value_col="v", group_col="g",
                         groups=sorted(samples)).take_all()
        return {(r["group_a"], r["group_b"]): r["z"] for r in out}

    def test_shifted_group_stands_out(self, ray_session):
        rng = np.random.RandomState(0)
        samples = {
            "a": list(np.round(rng.normal(0, 1, 80), 2)),
            "b": list(np.round(rng.normal(0, 1, 80), 2)),
            "c": list(np.round(rng.normal(5, 1, 80), 2)),
        }
        z = self._run(samples)
        assert abs(z[("a", "b")]) < 2.5       # same distribution
        assert z[("a", "c")] < -5.0           # c ranks far higher
        assert z[("b", "c")] < -5.0

    def test_pair_count_and_symmetric_null(self, ray_session):
        rng = np.random.RandomState(1)
        pooled = np.round(rng.normal(10, 2, 300), 2)
        samples = {"g1": list(pooled[:100]), "g2": list(pooled[100:200]),
                   "g3": list(pooled[200:])}
        z = self._run(samples)
        assert len(z) == 3
        assert all(abs(v) < 3.0 for v in z.values())

    def test_matches_pooled_rank_brute_force(self, ray_session):
        rng = np.random.RandomState(3)
        xa = list(np.round(rng.normal(0, 1, 40), 1))
        xb = list(np.round(rng.normal(1, 1, 50), 1))
        z = self._run({"a": xa, "b": xb})[("a", "b")]
        pooled = np.array(xa + xb)
        # pooled midranks
        order = np.argsort(pooled, kind="stable")
        ranks = np.empty(len(pooled))
        srt = pooled[order]
        i = 0
        while i < len(srt):
            j = i
            while j < len(srt) and srt[j] == srt[i]:
                j += 1
            ranks[order[i:j]] = (i + j + 1) / 2.0
            i = j
        ra, rb = ranks[:40].mean(), ranks[40:].mean()
        n = len(pooled)
        _, t_cnt = np.unique(pooled, return_counts=True)
        ties = float(np.sum(t_cnt ** 3 - t_cnt))
        base = n * (n + 1) / 12.0 - ties / (12.0 * (n - 1))
        se = np.sqrt(base * (1 / 40 + 1 / 50))
        assert abs(z - (ra - rb) / se) < 1e-5
