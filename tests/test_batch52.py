"""Batch 52: vocabulary richness (Yule's K / Simpson's D / Honore's H),
Heaps'-law fit, DDSketch quantiles, average precision (oracle parity
covered by test_oracle.py)."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _ds(t: pa.Table, n_parts=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n_parts)


class TestVocabRichness:
    def test_known_spectrum(self, ray_session):
        from datatest_ray.stages.text import vocab_richness

        # corpus: "a a a b b c" -> N=6, V=3, spectrum m=(3,2,1)
        t = pa.table({"text": pa.array(["a a a", "b b c"]),
                      "lang": pa.array(["en", "en"])})
        out = vocab_richness(_ds(t), "text", lang_col="lang").take_all()
        assert len(out) == 1
        r = out[0]
        assert (r["n_tokens"], r["vocab"]) == (6, 3)
        m2 = 9 + 4 + 1
        assert r["yules_k"] == round(10000.0 * (m2 - 6) / 36.0, 6)
        assert r["simpson_d"] == round((m2 - 6) / (6.0 * 5.0), 6)
        # V1=1 hapax of V=3 -> H = 100 ln 6 / (1 - 1/3)
        assert r["honore_h"] == round(100.0 * math.log(6) / (2 / 3), 6)

    def test_all_hapax_gives_null_honore(self, ray_session):
        from datatest_ray.stages.text import vocab_richness

        t = pa.table({"text": pa.array(["x y z"]),
                      "lang": pa.array(["en"])})
        r = vocab_richness(_ds(t, 1), "text", lang_col="lang").take_all()[0]
        assert r["honore_h"] is None
        assert r["yules_k"] == round(10000.0 * (3 - 3) / 9.0, 6)


class TestHeapsLaw:
    def test_recovers_planted_exponent(self, ray_session):
        from datatest_ray.stages.text import heaps_law

        # construct docs where V = N^0.5 exactly (N = k^2, V = k
        # distinct tokens, each repeated k times)
        texts = []
        for k in (2, 3, 4, 5, 6):
            toks = [f"w{i}" for i in range(k) for _ in range(k)]
            texts.append(" ".join(toks))
        t = pa.table({"text": pa.array(texts),
                      "lang": pa.array(["en"] * len(texts))})
        r = heaps_law(_ds(t), "text", lang_col="lang").take_all()[0]
        assert r["n_docs"] == 5
        assert abs(r["beta"] - 0.5) < 1e-9
        assert abs(r["k"] - 1.0) < 1e-9

    def test_single_doc_is_null(self, ray_session):
        from datatest_ray.stages.text import heaps_law

        t = pa.table({"text": pa.array(["a b c"]),
                      "lang": pa.array(["en"])})
        r = heaps_law(_ds(t, 1), "text", lang_col="lang").take_all()[0]
        assert r["beta"] is None and r["k"] is None


class TestDDSketch:
    def test_relative_error_bound(self, ray_session):
        from datatest_ray.stages.profile import ddsketch_quantiles

        rng = np.random.RandomState(3)
        x = np.exp(rng.uniform(0, 10, 4000))
        t = pa.table({"x": pa.array(x, pa.float64())})
        out = {r["q"]: r for r in ddsketch_quantiles(
            _ds(t, 4), "x", gamma=1.02, qs=(0.5, 0.9, 0.99)).take_all()}
        bound = (1.02 - 1) / (1.02 + 1)
        for q, r in out.items():
            exact = float(np.quantile(x, q, method="inverted_cdf"))
            assert abs(r["est"] - exact) / exact <= bound + 1e-9, q

    def test_empty_input_empty_output(self, ray_session):
        # mirrors the SQL oracle: no positive values -> zero rows
        from datatest_ray.stages.profile import ddsketch_quantiles

        t = pa.table({"x": pa.array([], pa.float64())})
        out = ddsketch_quantiles(_ds(t, 1), "x", qs=(0.5,)).take_all()
        assert out == []


class TestAveragePrecision:
    def _ap(self, scores, labels):
        from datatest_ray.stages.mlprep import average_precision

        t = pa.table({"s": pa.array(scores, pa.float64()),
                      "y": pa.array([bool(v) for v in labels])})
        out = average_precision(
            _ds(t), score_col="s",
            label_expr=lambda b: b.column("y")).take_all()
        assert len(out) == 1
        return out[0]

    def test_perfect_ranking(self, ray_session):
        r = self._ap([9.0, 8.0, 7.0, 1.0, 0.5], [1, 1, 1, 0, 0])
        assert r["ap"] == 1.0 and r["p"] == 3

    def test_worst_ranking(self, ray_session):
        # positives ranked last: AP = mean of k/(n-p+k)
        r = self._ap([5.0, 4.0, 1.0, 0.9], [0, 0, 1, 1])
        expected = 0.5 * (1 / 3 + 2 / 4)
        assert abs(r["ap"] - expected) < 1e-6

    def test_tie_group_counts_once(self, ray_session):
        # all scores tied: AP = precision of the full set = P/N
        r = self._ap([2.0, 2.0, 2.0, 2.0], [1, 0, 1, 0])
        assert r["ap"] == 0.5

    def test_no_positives_null(self, ray_session):
        r = self._ap([1.0, 2.0], [0, 0])
        assert r["ap"] is None
