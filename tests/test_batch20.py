"""Batch 20: n-gram novelty, distinct-n diversity, MinHash PR report
(oracle parity covered by test_oracle.py for the SQL-paired entries)."""

import pyarrow as pa


def _ds(t: pa.Table, blocks: int = 1):
    import ray.data as rd

    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


class TestNgramNovelty:
    def test_shared_vs_unique_grams(self, ray_session):
        """Docs 1/2 share their one trigram (df=2, not novel); doc 3's
        is unique (novel)."""
        from datatest_ray.stages.text import ngram_novelty

        t = pa.table({
            "id": pa.array([1, 2, 3], pa.int64()),
            "text": ["a b c", "a b c", "x y z"],
        })
        out = ngram_novelty(_ds(t, blocks=2), "text", "id").take_all()
        got = {r["id"]: (r["novel"], r["n_grams"]) for r in out}
        assert got == {1: (0, 1), 2: (0, 1), 3: (1, 1)}

    def test_within_doc_repeat_is_distinct_once(self, ray_session):
        """'a b c a b c a b c' contains shingle 'a b c' 3x but distinct
        once; it appears in no other doc so it's novel."""
        from datatest_ray.stages.text import ngram_novelty

        t = pa.table({
            "id": pa.array([1], pa.int64()),
            "text": ["a b c a b c a b c"],
        })
        out = ngram_novelty(_ds(t), "text", "id").take_all()
        # 7 windows, distinct shingles: abc, bca, cab, abc... -> 3
        assert out[0]["n_grams"] == 3 and out[0]["novel"] == 3


class TestNgramDiversity:
    def test_repetitive_group_scores_low(self, ray_session):
        from datatest_ray.stages.text import ngram_diversity

        t = pa.table({
            "lang": ["en", "en", "de"],
            "text": ["a b c", "a b c", "x y z w"],
        })
        out = ngram_diversity(_ds(t, blocks=2), "text",
                              group_col="lang").take_all()
        got = {r["lang"]: (r["n_distinct"], r["n_docgrams"]) for r in out}
        # en: 1 distinct gram across 2 docs (2 docgrams); de: 2 of 2
        assert got == {"en": (1, 2), "de": (2, 2)}


class TestMinhashPR:
    def test_report_consistency(self, ray_session):
        """LSH-with-exact-verify output is a subset of the exact pair
        set, so n_both == n_lsh and recall = n_lsh / n_exact."""
        from datatest_ray.pipelines.oracle20 import q_minhash_pr_report

        out = q_minhash_pr_report("/root/testdata/sf0.001")
        n_exact = out.column("n_exact")[0].as_py()
        n_lsh = out.column("n_lsh")[0].as_py()
        n_both = out.column("n_both")[0].as_py()
        assert n_both == n_lsh <= n_exact
        assert n_exact > 0
        # LSH at b=16,r=4 has >99% hit probability at j>=0.8
        assert n_lsh / n_exact >= 0.8
