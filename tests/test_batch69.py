"""Batch 69: species-richness estimators, word burstiness (oracle
parity covered by test_oracle.py)."""

import math

import numpy as np
import pyarrow as pa


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestSpeciesRichness:
    def test_known_spectrum(self, ray_session):
        from datatest_ray.stages.text import species_richness

        # spectrum: a x3, b x2, c x1, d x1 -> N=7 V=4 V1=2 V2=1
        t = pa.table({"text": pa.array(["a a a b", "b c d"]),
                      "lang": pa.array(["en", "en"])})
        r = species_richness(_ds(t), "text",
                             lang_col="lang").take_all()[0]
        assert (r["n_tokens"], r["vocab"], r["v1"], r["v2"]) == \
            (7, 4, 2, 1)
        assert r["chao1"] == round(4 + 4 / 2.0, 6)
        assert r["gt_p0"] == round(2 / 7.0, 6)
        h = math.log(7) - (3 * math.log(3) + 2 * math.log(2)) / 7.0
        assert r["hill_1"] == round(math.exp(h), 6)

    def test_uniform_vocab_hill_equals_v(self, ray_session):
        from datatest_ray.stages.text import species_richness

        t = pa.table({"text": pa.array(["a b c d", "a b c d"]),
                      "lang": pa.array(["en", "en"])})
        r = species_richness(_ds(t, 1), "text",
                             lang_col="lang").take_all()[0]
        assert abs(r["hill_1"] - 4.0) < 1e-6  # even use: exp(H) = V
        # all words appear twice: V1=0, V2=4 -> chao1 = V + 0 = V
        assert r["chao1"] == 4.0
        assert r["gt_p0"] == 0.0              # no hapaxes: no unseen mass


class TestWordBurstiness:
    def test_bursty_vs_uniform(self, ray_session):
        from datatest_ray.stages.text import word_burstiness

        docs = []
        # 'glue' once per doc (Poisson-ish, VMR < 1);
        # 'topic' 10x in one doc only (bursty, VMR >> 1)
        for i in range(20):
            base = "glue"
            if i == 0:
                base += " " + " ".join(["topic"] * 10)
            docs.append(base)
        t = pa.table({"doc_id": pa.array(range(20), pa.int64()),
                      "text": pa.array(docs)})
        out = {r["token"]: r for r in word_burstiness(
            _ds(t), "text", id_col="doc_id", k=2).take_all()}
        assert out["glue"]["df"] == 20
        assert out["glue"]["vmr"] == 0.0       # exactly 1 per doc
        assert out["topic"]["df"] == 1
        assert out["topic"]["vmr"] > 4.0

    def test_zeros_count_in_variance(self, ray_session):
        from datatest_ray.stages.text import word_burstiness

        # word in half the docs, 2x each: mean 1, E[x^2] 2, vmr 1
        docs = ["w w" if i % 2 == 0 else "other" for i in range(10)]
        t = pa.table({"doc_id": pa.array(range(10), pa.int64()),
                      "text": pa.array(docs)})
        out = {r["token"]: r for r in word_burstiness(
            _ds(t, 1), "text", id_col="doc_id", k=2).take_all()}
        assert out["w"]["vmr"] == 1.0
