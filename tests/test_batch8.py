"""Session-9 operator batch 8: grouped Spearman, chi-square adjusted
residuals, exponential-fit KS, cents uniformity, winnowing substring
near-dup."""

import numpy as np
import pyarrow as pa


def _ds(table: pa.Table):
    import ray.data as rd

    return rd.from_arrow(table)


class TestSpearmanGrouped:
    def _brute(self, x, y):
        """Spearman via pandas average ranks + Pearson (no scipy)."""
        import pandas as pd

        rx = pd.Series(x).rank(method="average")
        ry = pd.Series(y).rank(method="average")
        return rx.corr(ry)

    def test_matches_brute_force_with_ties(self, ray_session):
        from datatest_ray.stages.robust import spearman_grouped

        rng = np.random.default_rng(7)
        x = rng.integers(1, 8, 500).astype(np.float64)
        y = (x * 2 + rng.integers(0, 5, 500)).astype(np.float64)
        g = np.where(rng.random(500) < 0.5, "a", "b")
        t = pa.table({"g": g, "x": x, "y": y})
        out = spearman_grouped(_ds(t), by="g", x_col="x",
                               y_col="y").to_pandas().set_index("g")
        for grp in ["a", "b"]:
            m = g == grp
            assert abs(out.loc[grp, "rho"]
                       - self._brute(x[m], y[m])) < 1e-12
            assert out.loc[grp, "n"] == int(m.sum())

    def test_perfect_monotone_and_degenerate(self, ray_session):
        from datatest_ray.stages.robust import spearman_grouped

        t = pa.table({
            "g": ["m"] * 5 + ["flat"] * 4,
            "x": [1.0, 2, 3, 4, 5] + [1.0, 2, 3, 4],
            "y": [10.0, 20, 30, 40, 50] + [7.0, 7, 7, 7],
        })
        out = spearman_grouped(_ds(t), by="g", x_col="x",
                               y_col="y").to_pandas().set_index("g")
        assert abs(out.loc["m", "rho"] - 1.0) < 1e-12
        assert np.isnan(out.loc["flat", "rho"])  # zero variance -> NULL

    def test_nulls_excluded(self, ray_session):
        from datatest_ray.stages.robust import spearman_grouped

        t = pa.table({
            "g": pa.array(["a", "a", "a", "a", None]),
            "x": pa.array([1.0, 2, 3, None, 9]),
            "y": pa.array([1.0, 4, 9, 1, 9]),
        })
        out = spearman_grouped(_ds(t), by="g", x_col="x",
                               y_col="y").to_pandas()
        assert len(out) == 1 and out.iloc[0]["n"] == 3


class TestAdjustedResiduals:
    def test_matches_crosstab_formula(self, ray_session):
        from datatest_ray.stages.profile import adjusted_residuals

        rng = np.random.default_rng(3)
        a = rng.choice(["x", "y", "z"], 400)
        b = rng.choice(["p", "q"], 400)
        out = adjusted_residuals(
            _ds(pa.table({"a": a, "b": b})), "a", "b"
        ).to_pandas().set_index(["a", "b"])
        import pandas as pd

        ct = pd.crosstab(pd.Series(a, name="a"), pd.Series(b, name="b"))
        tot = ct.values.sum()
        for ai in ct.index:
            for bi in ct.columns:
                n = ct.loc[ai, bi]
                e = ct.loc[ai].sum() * ct[bi].sum() / tot
                r = (n - e) / np.sqrt(
                    e * (1 - ct.loc[ai].sum() / tot)
                    * (1 - ct[bi].sum() / tot))
                assert abs(out.loc[(ai, bi), "stdres"] - r) < 1e-10
                assert out.loc[(ai, bi), "n"] == n

    def test_residuals_flag_planted_association(self, ray_session):
        from datatest_ray.stages.profile import adjusted_residuals

        # "u" occurs almost only with "hot"
        a = ["u"] * 50 + ["v"] * 50
        b = ["hot"] * 48 + ["cold"] * 2 + ["hot"] * 10 + ["cold"] * 40
        out = adjusted_residuals(
            _ds(pa.table({"a": a, "b": b})), "a", "b"
        ).to_pandas().set_index(["a", "b"])
        assert out.loc[("u", "hot"), "stdres"] > 2.0
        assert out.loc[("u", "cold"), "stdres"] < -2.0


class TestExpfitKS:
    def test_matches_brute_force(self, ray_session):
        from datatest_ray.stages.temporal import expfit_ks

        rng = np.random.default_rng(11)
        rows = []
        base = 0
        for uid in range(5):
            ts = np.cumsum(rng.integers(1, 1000, 50)) * 1_000_000 + base
            rows.append((np.full(50, uid), ts))
        uids = np.concatenate([r[0] for r in rows])
        ts = np.concatenate([r[1] for r in rows])
        t = pa.table({
            "event_id": pa.array(np.arange(len(ts), dtype=np.int64)),
            "user_id": pa.array(uids.astype(np.int64)),
            "ts": pa.array(ts.astype(np.int64), pa.timestamp("us")),
        })
        out = expfit_ks(_ds(t), "ts", by="user_id",
                        id_col="event_id").to_pandas()
        # brute force
        gaps = []
        for uid in range(5):
            s = np.sort(ts[uids == uid]).astype(np.int64)
            gaps.append(np.diff(s))
        gaps = np.sort(np.concatenate(gaps)).astype(np.float64)
        n = len(gaps)
        mu = gaps.sum() / n
        f = 1.0 - np.exp(-gaps / mu)
        i = np.arange(1, n + 1)
        ks = max(np.max(i / n - f), np.max(f - (i - 1) / n))
        assert out.iloc[0]["n"] == n
        assert abs(out.iloc[0]["mean_gap_s"] - mu / 1e6) < 1e-9
        assert abs(out.iloc[0]["ks"] - ks) < 1e-12

    def test_exponential_data_fits_well(self, ray_session):
        from datatest_ray.stages.temporal import expfit_ks

        rng = np.random.default_rng(1)
        gaps = rng.exponential(100.0, 2000) * 1e6
        ts = np.cumsum(gaps).astype(np.int64)
        t = pa.table({
            "event_id": pa.array(np.arange(len(ts), dtype=np.int64)),
            "user_id": pa.array(np.zeros(len(ts), dtype=np.int64)),
            "ts": pa.array(ts, pa.timestamp("us")),
        })
        out = expfit_ks(_ds(t), "ts", by="user_id",
                        id_col="event_id").to_pandas()
        assert out.iloc[0]["ks"] < 0.05  # 2000 exp samples: tiny KS


class TestCentsUniformity:
    def test_counts_and_chi2(self, ray_session):
        from datatest_ray.stages.profile import trailing_digit_uniformity

        # 300 rows: cents 0..99 uniform-ish plus a spike at .00
        vals = [i + (i % 100) / 100.0 for i in range(300)] + [42.00] * 100
        out = trailing_digit_uniformity(
            _ds(pa.table({"p": pa.array(vals)})), "p"
        ).to_pandas().set_index("cents")
        assert out["n"].sum() == 400
        assert out.loc[0, "n"] == 3 + 100  # spike detected
        tot = 400.0
        e = tot / 100
        assert abs(out.loc[0, "cell_chi2"]
                   - (103 - e) ** 2 / e) < 1e-9
        assert abs(out["share"].sum() - 1.0) < 1e-12


class TestWinnowPairs:
    def test_guaranteed_detection_of_long_shared_span(self, ray_session):
        from datatest_ray.stages.dedup import winnow_pairs

        rng = np.random.default_rng(5)
        shared = "the quick brown fox jumps over the lazy dog again"

        def junk(n):
            return "".join(rng.choice(list("abcdefghij "), n))

        texts, ids = [], []
        for i in range(20):
            if i % 4 == 0:
                texts.append(junk(80) + " " + shared + " " + junk(80))
            else:
                texts.append(junk(200))
            ids.append(i)
        out = winnow_pairs(
            _ds(pa.table({"doc_id": pa.array(ids, pa.int64()),
                          "text": texts})),
            "text", "doc_id", k=16, w=8, min_shared=1,
        ).to_pandas()
        got = {(r.a, r.b) for r in out.itertuples()}
        carriers = [i for i in range(20) if i % 4 == 0]
        # every carrier pair shares a >= w+k-1 = 23 char span -> guaranteed
        for x in carriers:
            for y in carriers:
                if x < y:
                    assert (x, y) in got, (x, y)

    def test_no_pairs_without_shared_substring(self, ray_session):
        from datatest_ray.stages.dedup import winnow_pairs

        texts = ["aaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
                 "bbbbbbbbbbbbbbbbbbbbbbbbbbbbb",
                 "ccccccccccccccccccccccccccccc"]
        out = winnow_pairs(
            _ds(pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                          "text": texts})),
            "text", "doc_id", k=16, w=8, min_shared=1,
        ).to_pandas()
        assert len(out) == 0

    def test_short_docs_yield_nothing(self, ray_session):
        from datatest_ray.stages.dedup import winnow_pairs

        out = winnow_pairs(
            _ds(pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                          "text": ["tiny", "tiny"]})),
            "text", "doc_id", k=16, w=8, min_shared=1,
        ).to_pandas()
        assert len(out) == 0
