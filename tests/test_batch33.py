"""Batch 33: Friedman test + Kendall's W (oracle parity covered by
test_oracle.py)."""

import numpy as np
import pyarrow as pa


def _ds(t: pa.Table):
    import ray.data as rd

    return rd.from_arrow(t)


def _events(rows):
    return pa.table({
        "s": pa.array([r[0] for r in rows], pa.int64()),
        "t": pa.array([r[1] for r in rows]),
        "v": pa.array([float(r[2]) for r in rows]),
    })


class TestFriedman:
    def test_perfect_concordance(self, ray_session):
        from datatest_ray.stages.stattests import friedman_test

        # every subject ranks a < b < c -> W = 1,
        # chi2 = N(k-1)W = 4*2 = 8
        rows = []
        for s in range(1, 5):
            rows += [(s, "a", 1 + s), (s, "b", 10 + s), (s, "c", 20 + s)]
        out = friedman_test(
            _ds(_events(rows)), subject_col="s", treatment_col="t",
            treatments=["a", "b", "c"], value_col="v").to_pandas()
        r = out.iloc[0]
        assert r["n_subjects"] == 4 and r["k"] == 3
        assert abs(r["w"] - 1.0) < 1e-12
        assert abs(r["chi2"] - 8.0) < 1e-12

    def test_incomplete_subjects_dropped(self, ray_session):
        from datatest_ray.stages.stattests import friedman_test

        rows = [(1, "a", 1), (1, "b", 2), (2, "a", 5)]  # s=2 lacks b
        out = friedman_test(
            _ds(_events(rows)), subject_col="s", treatment_col="t",
            treatments=["a", "b"], value_col="v").to_pandas()
        assert out.iloc[0]["n_subjects"] == 1

    def test_matches_reference_formula_with_ties(self, ray_session):
        from datatest_ray.stages.stattests import friedman_test

        rng = np.random.RandomState(4)
        k, n = 3, 40
        rows = []
        vals = np.round(rng.normal(0, 1, (n, k)), 1)  # ties likely
        vals[:, 2] += 0.5
        for s in range(n):
            for j, t in enumerate(["a", "b", "c"]):
                rows.append((s, t, vals[s, j]))
        out = friedman_test(
            _ds(_events(rows)), subject_col="s", treatment_col="t",
            treatments=["a", "b", "c"], value_col="v").to_pandas()
        # reference: tie-corrected Friedman from average ranks
        ranks = np.zeros((n, k))
        for s in range(n):
            v = np.round(vals[s] * 100) / 100  # cents round-trip
            order = v.argsort()
            r = np.empty(k)
            i = 0
            srt = v[order]
            while i < k:
                j = i
                while j + 1 < k and srt[j + 1] == srt[i]:
                    j += 1
                r[order[i:j + 1]] = (i + j) / 2 + 1
                i = j + 1
            ranks[s] = r
        big_r = ranks.sum(axis=0)
        num = ((big_r - n * (k + 1) / 2) ** 2).sum()
        den = (ranks ** 2).sum() - n * k * (k + 1) ** 2 / 4
        chi_ref = (k - 1) * num / den
        assert abs(out.iloc[0]["chi2"] - chi_ref) < 1e-9
        assert abs(out.iloc[0]["w"]
                   - chi_ref / (n * (k - 1))) < 1e-9
