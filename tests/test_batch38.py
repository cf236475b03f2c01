"""Batch 38: empirical-Bayes shrunken rates; distributed BPE trainer
vs a brute-force reference."""

import collections

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _ds(t: pa.Table):
    import ray.data as rd

    return rd.from_arrow(t)


def _bpe_reference(texts, n_merges):
    """Plain-python Sennrich BPE over word frequencies: count all
    adjacent symbol pairs weighted by word count, merge the most
    frequent (ties: lexicographically smaller pair), re-segment
    greedily left-to-right."""
    vocab = collections.Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[tuple(w)] += 1
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = collections.Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        if c < 2:
            break
        merges.append((rank, l, r, c))
        new_vocab = collections.Counter()
        for sym, cnt in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] += cnt
        vocab = new_vocab
    return merges


class TestBpeTrain:
    def test_matches_reference(self, ray_session):
        from datatest_ray.stages.text import bpe_train

        texts = [
            "the cat sat on the mat",
            "the bat and the rat sat flat",
            "that cat that bat that mat",
            "setter better letter matter",
        ] * 3
        t = pa.table({"text": pa.array(texts)})
        out = bpe_train(_ds(t), "text", n_merges=5).to_pandas()
        ref = _bpe_reference(texts, 5)
        got = list(zip(out["merge_rank"], out["left"], out["right"],
                       out["pair_count"]))
        assert got == ref

    def test_early_stop_on_tiny_corpus(self, ray_session):
        from datatest_ray.stages.text import bpe_train

        t = pa.table({"text": pa.array(["ab", "cd"])})
        out = bpe_train(_ds(t), "text", n_merges=8).to_pandas()
        # every pair occurs once -> below min_pair_count -> no merges
        assert len(out) == 0


class TestEbShrunkRates:
    def test_shrinks_toward_mean(self, ray_session):
        from datatest_ray.stages.mlprep import eb_shrunk_rates

        rng = np.random.RandomState(3)
        rows_k, rows_f = [], []
        # 30 keys with 20 trials each at varying true rates
        for key in range(30):
            p = 0.2 + 0.02 * key
            f = (rng.rand(20) < p).astype(int)
            rows_k += [key] * 20
            rows_f += list(f)
        t = pa.table({"k": pa.array(rows_k, pa.int64()),
                      "f": pa.array(rows_f, pa.int64())})
        out = eb_shrunk_rates(
            _ds(t), key_col="k",
            flag_expr=lambda b: pc.equal(b.column("f"), 1),
            flag_col="f", min_n=5).to_pandas()
        assert len(out) == 30
        m = out["raw"].mean()
        # every shrunk value sits between its raw value and the mean
        for _, r in out.iterrows():
            lo, hi = sorted((r["raw"], m))
            assert lo - 1e-9 <= r["shrunk"] <= hi + 1e-9

    def test_small_n_keys_excluded(self, ray_session):
        from datatest_ray.stages.mlprep import eb_shrunk_rates

        t = pa.table({
            "k": pa.array([1] * 6 + [2] * 2, pa.int64()),
            "f": pa.array([1, 0, 1, 0, 1, 0, 1, 1], pa.int64()),
        })
        out = eb_shrunk_rates(
            _ds(t), key_col="k",
            flag_expr=lambda b: pc.equal(b.column("f"), 1),
            flag_col="f", min_n=5).to_pandas()
        assert list(out["key"]) == [1]


class TestTCloseness:
    def test_identical_groups_zero_emd(self, ray_session):
        from datatest_ray.stages.mlprep import t_closeness

        vals = [1.0, 2.0, 3.0, 4.0]
        t = pa.table({
            "g": ["a"] * 4 + ["b"] * 4,
            "v": pa.array(vals + vals),
        })
        out = t_closeness(_ds(t), qi_col="g",
                          sensitive_col="v").to_pandas()
        assert len(out) == 2
        assert np.abs(out["emd"]).max() < 1e-12

    def test_shifted_group_emd_equals_shift(self, ray_session):
        from datatest_ray.stages.mlprep import t_closeness

        # group a at 0, group b at 10: each group's EMD to the pooled
        # 50/50 mixture is half the gap = 5.0
        t = pa.table({
            "g": ["a"] * 5 + ["b"] * 5,
            "v": pa.array([0.0] * 5 + [10.0] * 5),
        })
        out = t_closeness(_ds(t), qi_col="g",
                          sensitive_col="v").to_pandas().set_index("g")
        assert abs(out.loc["a", "emd"] - 5.0) < 1e-12
        assert abs(out.loc["b", "emd"] - 5.0) < 1e-12
