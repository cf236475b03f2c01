"""Batch 17: Fisher exact, McNemar, Cohen's kappa/d, two-proportion z,
Poisson two-rate, MMR selection (oracle parity covered by
test_oracle.py for the SQL-paired entries)."""

import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _ds(t: pa.Table, blocks: int = 1):
    import ray.data as rd

    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


class TestFisherExact:
    def test_known_table(self, ray_session):
        """Classic tea-tasting 3/1//1/3 table: two-sided p = 0.4857."""
        from datatest_ray.stages.robust import fisher_exact_2x2

        e = ["x"] * 4 + ["y"] * 4
        o = ["F"] * 3 + ["O"] + ["F"] + ["O"] * 3
        out = fisher_exact_2x2(_ds(pa.table({"e": e, "o": o}), blocks=2),
                               exposure_col="e", exposure="x",
                               outcome_col="o",
                               outcome="F").take_all()[0]
        assert (out["a"], out["b"], out["c"], out["d"]) == (3, 1, 1, 3)
        # scipy.stats.fisher_exact two-sided = 0.48571428...
        assert abs(out["p_value"] - 34 / 70) < 1e-9

    def test_independent_large_p(self, ray_session):
        from datatest_ray.stages.robust import fisher_exact_2x2

        rng = np.random.default_rng(7)
        e = rng.choice(["x", "y"], 200)
        o = rng.choice(["F", "O"], 200)
        out = fisher_exact_2x2(_ds(pa.table({"e": e, "o": o}), blocks=3),
                               exposure_col="e", exposure="x",
                               outcome_col="o",
                               outcome="F").take_all()[0]
        assert 0.0 < out["p_value"] <= 1.0


class TestCohensKappa:
    def test_perfect_agreement(self, ray_session):
        from datatest_ray.stages.robust import cohens_kappa

        i = np.array([1, 2, 3, 1, 2, 3] * 10)
        out = cohens_kappa(_ds(pa.table({"i": i, "j": i}), blocks=2),
                           i_col="i", j_col="j").take_all()[0]
        assert out["po"] == 1.0 and abs(out["kappa"] - 1.0) < 1e-12

    def test_matches_bruteforce(self, ray_session):
        from datatest_ray.stages.robust import cohens_kappa

        rng = np.random.default_rng(11)
        i = rng.integers(1, 4, 300)
        j = np.where(rng.random(300) < 0.6, i, rng.integers(1, 4, 300))
        out = cohens_kappa(_ds(pa.table({"i": i, "j": j}), blocks=3),
                           i_col="i", j_col="j").take_all()[0]
        po = (i == j).mean()
        pe = sum((i == v).sum() * (j == v).sum()
                 for v in (1, 2, 3)) / (300 * 300)
        assert abs(out["po"] - po) < 1e-12
        assert abs(out["kappa"] - (po - pe) / (1 - pe)) < 1e-12


class TestMMRSelect:
    def test_matches_bruteforce_greedy(self, ray_session):
        from datatest_ray.stages.robust import mmr_select

        rng = np.random.default_rng(13)
        m = rng.normal(size=(60, 8))
        t = pa.table({"vec_id": np.arange(1, 61),
                      "embedding": [r.tolist() for r in m]})
        out = mmr_select(_ds(t, blocks=4), vec_col="embedding",
                         id_col="vec_id", k=5, lam=0.7)
        # brute-force greedy MMR with the same definition
        x = m / np.linalg.norm(m, axis=1, keepdims=True)
        # query = centroid of the row-NORMALIZED corpus (stage contract)
        q = x.sum(axis=0) / 60
        q = q / np.linalg.norm(q)
        rel = x @ q
        sel = []
        for _ in range(5):
            red = ((x @ x[sel].T).max(axis=1)
                   if sel else np.zeros(60))
            score = 0.7 * rel - 0.3 * red
            score[sel] = -np.inf
            sel.append(int(np.argmax(score)))
        want = [s + 1 for s in sel]
        assert out.column("vec_id").to_pylist() == want
        # scores decrease (relevance-diversity tradeoff is greedy)
        sc = out.column("score").to_pylist()
        assert sc[0] >= sc[-1]

    def test_diversity_beats_redundancy(self, ray_session):
        """Three tight clusters: MMR with low lambda must pick from
        distinct clusters rather than 3 near-identical vectors."""
        from datatest_ray.stages.robust import mmr_select

        rng = np.random.default_rng(17)
        centers = np.eye(3)
        m = np.vstack([c + 0.01 * rng.normal(size=(10, 3))
                       for c in centers])
        t = pa.table({"vec_id": np.arange(1, 31),
                      "embedding": [r.tolist() for r in m]})
        out = mmr_select(_ds(t), vec_col="embedding", id_col="vec_id",
                         k=3, lam=0.3)
        picked = out.column("vec_id").to_pylist()
        clusters = {(p - 1) // 10 for p in picked}
        assert len(clusters) == 3


class TestDriverEntries:
    def test_mcnemar_nonvacuous(self, ray_session):
        from datatest_ray.pipelines.oracle17 import q_mcnemar_users

        out = q_mcnemar_users(SF)
        assert out.num_rows == 1
        assert (out.column("b")[0].as_py()
                + out.column("c")[0].as_py()) > 0

    def test_two_prop_both_variants(self, ray_session):
        from datatest_ray.pipelines.oracle17 import (
            q_two_prop_ztest_events,
        )

        out = q_two_prop_ztest_events(SF)
        assert out.column("n0")[0].as_py() > 0
        assert out.column("n1")[0].as_py() > 0
        assert out.column("z")[0].as_py() is not None
