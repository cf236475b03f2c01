"""Batch 47: Ansari-Bradley, Atkinson, Lorenz deciles, skew-aware
join, Adamic-Adar, conditional FDs, WoE/IV, readability (oracle parity
for all eight covered by test_oracle.py)."""

import math

import numpy as np
import pyarrow as pa


def _ds(t: pa.Table):
    import ray.data as rd

    return rd.from_arrow(t)


def _one(ds):
    rows = ds.take_all()
    assert len(rows) == 1
    return rows[0]


class TestAnsariBradley:
    def _brute(self, xa, xb):
        """Reference: pooled mid-score Ansari-Bradley with ties."""
        pooled = sorted([(v, 0) for v in xa] + [(v, 1) for v in xb])
        n = len(pooled)
        scores = [min(r, n + 1 - r) for r in range(1, n + 1)]
        # average scores over tie blocks
        vals = [v for v, _ in pooled]
        avg = [0.0] * n
        i = 0
        while i < n:
            j = i
            while j < n and vals[j] == vals[i]:
                j += 1
            m = sum(scores[i:j]) / (j - i)
            for k in range(i, j):
                avg[k] = m
            i = j
        w = sum(a for a, (_, side) in zip(avg, pooled) if side == 0)
        return w / len(xa)

    def test_matches_bruteforce_with_ties(self, ray_session):
        from datatest_ray.stages.stattests import ansari_bradley

        rng = np.random.default_rng(7)
        xa = np.round(rng.normal(0, 3.0, 80), 1)  # wider → lower scores
        xb = np.round(rng.normal(0, 1.0, 60), 1)
        t = pa.table({
            "g": pa.array(["a"] * 80 + ["b"] * 60),
            "v": pa.array(np.concatenate([xa, xb])),
        })
        row = _one(ansari_bradley(_ds(t).repartition(4), value_col="v",
                                  group_col="g", a="a", b="b"))
        assert row["n_a"] == 80 and row["n_b"] == 60
        assert row["w_mean"] == round(self._brute(xa, xb), 6)
        # wider sample sits in the tails → W below its null mean → z < 0
        assert row["z"] < 0

    def test_partition_invariance(self, ray_session):
        from datatest_ray.stages.stattests import ansari_bradley

        rng = np.random.default_rng(8)
        t = pa.table({
            "g": pa.array(rng.choice(["a", "b"], 300).tolist()),
            "v": pa.array(np.round(rng.normal(0, 1, 300), 2)),
        })
        r1 = _one(ansari_bradley(_ds(t), value_col="v", group_col="g",
                                 a="a", b="b"))
        r2 = _one(ansari_bradley(_ds(t).repartition(7), value_col="v",
                                 group_col="g", a="a", b="b"))
        assert r1 == r2


class TestAtkinson:
    def test_equal_values_zero_inequality(self, ray_session):
        from datatest_ray.stages.stattests import atkinson_index_by_group

        t = pa.table({"g": pa.array(["x"] * 50),
                      "v": pa.array([10.0] * 50)})
        row = _one(atkinson_index_by_group(_ds(t), by="g", value_col="v"))
        assert row["atkinson_half"] == 0.0
        assert row["atkinson_one"] == 0.0

    def test_known_two_point(self, ray_session):
        from datatest_ray.stages.stattests import atkinson_index_by_group

        # x = {1, 4}: mean 2.5, mean sqrt = 1.5, geomean = 2
        t = pa.table({"g": pa.array(["x", "x"]),
                      "v": pa.array([1.0, 4.0])})
        row = _one(atkinson_index_by_group(_ds(t), by="g", value_col="v"))
        assert row["atkinson_half"] == round(1 - 1.5 ** 2 / 2.5, 6)
        assert row["atkinson_one"] == round(1 - 2.0 / 2.5, 6)

    def test_nonpositive_excluded(self, ray_session):
        from datatest_ray.stages.stattests import atkinson_index_by_group

        t = pa.table({"g": pa.array(["x"] * 4),
                      "v": pa.array([1.0, 4.0, 0.0, -3.0])})
        row = _one(atkinson_index_by_group(_ds(t), by="g", value_col="v"))
        assert row["n"] == 2


class TestLorenz:
    def test_uniform_shares(self, ray_session):
        from datatest_ray.stages.stattests import lorenz_deciles

        t = pa.table({"v": pa.array(np.arange(1.0, 101.0))})
        out = lorenz_deciles(_ds(t), value_col="v").take_all()
        assert [r["n"] for r in out] == [10] * 10
        total = 100 * 101 / 2
        assert out[0]["share"] == round(sum(range(1, 11)) / total, 6)
        assert out[-1]["cum_share"] == 1.0

    def test_tie_block_stays_in_one_bucket(self, ray_session):
        from datatest_ray.stages.stattests import lorenz_deciles

        # 95 ones form ONE tie block at cum_before=0 → bucket 0; the
        # five 100.0s sit at cum_before=95 → bucket 9.  No tie is ever
        # split across buckets (the property ntile can't give).
        t = pa.table({"v": pa.array([1.0] * 95 + [100.0] * 5)})
        out = {r["bucket"]: r for r in
               lorenz_deciles(_ds(t).repartition(3),
                              value_col="v").take_all()}
        assert set(out) == {0, 9}
        total = 95 * 1.0 + 5 * 100.0
        assert out[0]["n"] == 95
        assert out[9]["n"] == 5
        assert out[9]["share"] == round(500.0 / total, 6)
        assert out[9]["cum_share"] == 1.0


class TestSkewJoin:
    def _tables(self):
        rng = np.random.default_rng(11)
        # heavy skew: key 1 holds half the fact rows
        keys = np.where(rng.random(2000) < 0.5, 1,
                        rng.integers(2, 50, 2000))
        fact = pa.table({
            "k": pa.array(keys.astype(np.int64)),
            "x": pa.array(rng.integers(0, 100, 2000).astype(np.int64)),
        })
        dim = pa.table({
            "dk": pa.array(np.arange(0, 40, dtype=np.int64)),
            "label": pa.array([f"d{i}" for i in range(40)]),
        })
        return fact, dim

    def test_inner_matches_plain_join(self, ray_session):
        import pandas as pd

        from datatest_ray.stages.relational import skew_join

        fact, dim = self._tables()
        got = skew_join(_ds(fact).repartition(6), _ds(dim), on="k",
                        right_on="dk", right_cols=["label"],
                        how="inner", hot_k=3).to_pandas()
        want = fact.to_pandas().merge(
            dim.to_pandas(), left_on="k", right_on="dk")[
            ["k", "x", "label"]]
        key = ["k", "x", "label"]
        got = got.sort_values(key).reset_index(drop=True)
        want = want.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_left_emits_nulls_for_unmatched(self, ray_session):
        from datatest_ray.stages.relational import skew_join

        fact, dim = self._tables()
        got = skew_join(_ds(fact), _ds(dim), on="k", right_on="dk",
                        right_cols=["label"], how="left",
                        hot_k=3).to_pandas()
        assert len(got) == fact.num_rows
        unmatched = got[got["k"] >= 40]
        assert len(unmatched) > 0 and unmatched["label"].isna().all()


class TestAdamicAdar:
    def test_matches_bruteforce(self, ray_session):
        from datatest_ray.stages.graph import adamic_adar

        rng = np.random.default_rng(13)
        g = rng.integers(0, 30, 500).astype(np.int64)
        x = rng.integers(0, 12, 500).astype(np.int64)
        t = pa.table({"g": pa.array(g), "x": pa.array(x)})

        # brute force
        members = {}
        for gi, xi in set(zip(g.tolist(), x.tolist())):
            members.setdefault(gi, set()).add(xi)
        want = {}
        for gi, nodes in members.items():
            if len(nodes) < 2:
                continue
            w = 1.0 / math.log(len(nodes))
            ns = sorted(nodes)
            for i in range(len(ns)):
                for j in range(i + 1, len(ns)):
                    k = (ns[i], ns[j])
                    cnt, s = want.get(k, (0, 0.0))
                    want[k] = (cnt + 1, s + w)

        out = adamic_adar(_ds(t).repartition(5), group_col="g",
                          node_col="x").take_all()
        got = {(r["u"], r["v"]): (r["n_common"], r["aa"]) for r in out}
        assert set(got) == set(want)
        for k, (cnt, s) in want.items():
            assert got[k][0] == cnt
            assert abs(got[k][1] - s) < 1e-6


class TestCfdWoe:
    def test_cfd_simple(self, ray_session):
        from datatest_ray.stages.mlprep import cfd_violations

        t = pa.table({
            "cond": pa.array(["A", "A", "A", "B", "B"]),
            "det": pa.array([1, 1, 2, 1, 1], pa.int64()),
            "dep": pa.array(["x", "y", "x", "x", "x"]),
        })
        out = cfd_violations(_ds(t).repartition(2), cond_col="cond",
                             det_col="det", dep_col="dep").take_all()
        # only (A, det=1) maps to two dep values
        assert len(out) == 1
        assert out[0]["cond"] == "A" and out[0]["det"] == 1
        assert out[0]["n_vals"] == 2

    def test_woe_signs(self, ray_session):
        from datatest_ray.stages.mlprep import woe_iv

        t = pa.table({
            "cat": pa.array(["hi"] * 100 + ["lo"] * 100),
            "flag": pa.array([True] * 80 + [False] * 20
                             + [True] * 20 + [False] * 80),
        })
        out = {r["cat"]: r for r in
               woe_iv(_ds(t).repartition(3), cat_col="cat",
                      flag_col="flag").take_all()}
        assert out["hi"]["woe"] > 0 > out["lo"]["woe"]
        assert out["hi"]["n_pos"] == 80
        # IV terms are nonnegative by construction
        assert out["hi"]["iv_term"] > 0 and out["lo"]["iv_term"] > 0


class TestReadability:
    def test_counts_and_formula(self, ray_session):
        from datatest_ray.stages.text import readability_by_lang

        t = pa.table({
            "lang": pa.array(["en", "en", "xx"]),
            "text": pa.array([
                "The cat sat. The dog ran!",  # 6 words, 2 sents
                "One two three",              # 3 words, 0→1 sents
                "",                           # 0 words → excluded
            ]),
        })
        out = {r["lang"]: r for r in
               readability_by_lang(_ds(t), text_col="text",
                                   lang_col="lang").take_all()}
        assert "xx" not in out
        en = out["en"]
        assert en["n_docs"] == 2
        assert en["words_per_sent"] == round(9 / 3, 6)
        # vowel-group syllables: doc1 'e-a-a-e-o-a' = 6, doc2 'O-e-o-ee' = 4
        assert en["syll_per_word"] == round(10 / 9, 6)
