"""Batch 86: script-mix / invisible-char audit (oracle parity covered
by test_oracle.py)."""

import pyarrow as pa


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestScriptMixAudit:
    def test_flags_planted_artifacts(self, ray_session):
        from datatest_ray.stages.text import script_mix_audit

        docs = [
            "clean ascii text",              # clean
            "mixed 漢字word here",            # Han+Latin in one token
            "zero​width space",          # ZWSP
            "bidi ‮attack‬ text",   # RLO control
            "汉语 только 分离 words",          # Han tokens, no mixing
        ]
        t = pa.table({"text": pa.array(docs),
                      "lang": pa.array(["en"] * 5)})
        out = script_mix_audit(_ds(t), "text",
                               lang_col="lang").take_all()[0]
        assert out["n_docs"] == 5
        assert out["n_mixed_script"] == 1
        assert out["n_invisible"] == 1
        assert out["n_bidi"] == 1

    def test_clean_corpus_all_zero(self, ray_session):
        from datatest_ray.stages.text import script_mix_audit

        t = pa.table({"text": pa.array(["hello world", "plain"]),
                      "lang": pa.array(["en", "en"])})
        out = script_mix_audit(_ds(t, 1), "text",
                               lang_col="lang").take_all()[0]
        assert (out["n_mixed_script"], out["n_invisible"],
                out["n_bidi"]) == (0, 0, 0)
