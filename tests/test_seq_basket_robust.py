"""Edge semantics for the event-sequence (seq.py), market-basket
(basket.py), robust-stats (robust.py) and categorical/JSD drift
operators — cases the sf0.001 oracle data never exercises (single-row
keys, timestamp ties, out-of-order delivery, streak gaps, singleton
baskets, zero-variance groups, zero-observed chi-square cells)."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(table: dict):
    import ray.data as rd

    return rd.from_arrow(pa.table(table))


TS = pa.timestamp("us")


def _t(us):
    return pa.array(np.asarray(us, dtype=np.int64), pa.int64()).cast(TS)


class TestFirstLast:
    def test_order_and_tie_break(self, ray_session):
        from datatest_ray.stages.seq import first_last_by

        # user 1: tie on ts at the start — event_id breaks it
        ds = _ds({
            "u": [1, 1, 1, 2],
            "ts": _t([100, 100, 500, 7]),
            "v": ["b", "a", "c", "solo"],
            "eid": [11, 10, 12, 1],
        })
        out = first_last_by(ds, by="u", ts="ts", value_col="v",
                            id_col="eid").to_pandas()
        row1 = out[out.u == 1].iloc[0]
        assert (row1.first_value, row1.last_value, row1.n_events) == \
            ("a", "c", 3)
        row2 = out[out.u == 2].iloc[0]
        assert (row2.first_value, row2.last_value, row2.n_events) == \
            ("solo", "solo", 1)


class TestTransitions:
    def test_counts_within_key_only(self, ray_session):
        from datatest_ray.stages.seq import transition_counts

        ds = _ds({
            "u": [1, 1, 1, 2, 2, 3],
            "ts": _t([1, 2, 3, 1, 2, 1]),
            "y": ["a", "b", "a", "a", "b", "z"],
            "eid": [1, 2, 3, 4, 5, 6],
        })
        out = transition_counts(ds, by="u", ts="ts", type_col="y",
                                id_col="eid").to_pandas()
        got = {(r.from_type, r.to_type): r.n for r in out.itertuples()}
        # a→b twice (u1, u2), b→a once (u1); no cross-user z pair
        assert got == {("a", "b"): 2, ("b", "a"): 1}


class TestEwma:
    def test_matches_recurrence(self, ray_session):
        from datatest_ray.stages.seq import ewma_last

        xs = [3.0, 7.0, 1.0, 4.0]
        a = 0.3
        y = xs[0]
        for x in xs[1:]:
            y = a * x + (1 - a) * y
        ds = _ds({"u": [1] * 4, "ts": _t([1, 2, 3, 4]),
                  "v": xs, "eid": [1, 2, 3, 4]})
        out = ewma_last(ds, by="u", ts="ts", value_col="v",
                        id_col="eid", alpha=a).to_pandas()
        assert out.n_events.iloc[0] == 4
        assert abs(out.ewma.iloc[0] - round(y, 6)) < 1e-9


class TestInversions:
    def test_counts_strict_backwards_steps(self, ray_session):
        from datatest_ray.stages.seq import inversion_counts

        # seq order 1,2,3,4 has ts 10, 5, 5, 20 → one strict inversion
        ds = _ds({"u": [1] * 4, "s": [1, 2, 3, 4],
                  "ts": _t([10, 5, 5, 20])})
        out = inversion_counts(ds, by="u", seq_col="s",
                               ts="ts").to_pandas()
        assert (out.n_events.iloc[0], out.n_inversions.iloc[0]) == (4, 1)


class TestStreaks:
    def test_gaps_and_duplicate_days(self, ray_session):
        from datatest_ray.stages.seq import day_streaks

        DAY = 86_400_000_000
        # days 0,1,1,2 then gap then 5,6 → max streak 3, 5 distinct days
        ds = _ds({"u": [1] * 6,
                  "ts": _t([0, DAY, DAY + 5, 2 * DAY, 5 * DAY, 6 * DAY])})
        out = day_streaks(ds, by="u", ts="ts").to_pandas()
        assert (out.n_days.iloc[0], out.max_streak.iloc[0]) == (5, 3)


class TestBasket:
    def test_pairs_dedupe_and_count(self, ray_session):
        from datatest_ray.stages.basket import cooccur_pairs

        # basket 1: {10, 20, 20, 30}; basket 2: {10, 20}; basket 3: {99}
        ds = _ds({"o": [1, 1, 1, 1, 2, 2, 3],
                  "it": [10, 20, 20, 30, 20, 10, 99]})
        out = cooccur_pairs(ds, by="o", item_col="it", top=10).to_pandas()
        got = {(r.item_a, r.item_b): r.n for r in out.itertuples()}
        assert got == {(10, 20): 2, (10, 30): 1, (20, 30): 1}
        # deterministic order: n DESC, then item_a, item_b
        assert list(map(tuple, out[["item_a", "item_b"]].values)) == \
            [(10, 20), (10, 30), (20, 30)]


class TestRobust:
    def test_iqr_counts_tukey_outliers(self, ray_session):
        from datatest_ray.stages.robust import iqr_outliers

        vals = [1.0, 2.0, 3.0, 4.0, 100.0]
        ds = _ds({"g": ["a"] * 5, "v": vals})
        out = iqr_outliers(ds, by="g", col="v", k=1.5).to_pandas()
        q1, q3 = np.quantile(vals, 0.25), np.quantile(vals, 0.75)
        assert abs(out.q1.iloc[0] - round(q1, 6)) < 1e-9
        assert abs(out.q3.iloc[0] - round(q3, 6)) < 1e-9
        assert out.n_out.iloc[0] == 1  # only the 100.0

    def test_mad_zero_for_constant_group(self, ray_session):
        from datatest_ray.stages.robust import grouped_mad

        ds = _ds({"g": ["a", "a", "a", "b", "b"],
                  "v": [5.0, 5.0, 5.0, 1.0, 3.0]})
        out = grouped_mad(ds, by="g", col="v").to_pandas()
        a = out[out.g == "a"].iloc[0]
        b = out[out.g == "b"].iloc[0]
        assert (a.med, a.mad) == (5.0, 0.0)
        assert (b.med, b.mad) == (2.0, 1.0)


class TestChi2:
    def test_independent_counts_give_zero(self, ray_session):
        from datatest_ray.stages.drift import chi2_independence

        # perfectly independent 2x2: chi2 == 0, dof == 1
        ds = _ds({"a": ["x"] * 4 + ["y"] * 4,
                  "b": ["p", "p", "q", "q"] * 2})
        out = chi2_independence(ds, "a", "b").to_pandas()
        assert (out.chi2.iloc[0], out.dof.iloc[0], out.n.iloc[0]) == \
            (0.0, 1, 8)

    def test_zero_observed_cell_contributes_expected(self, ray_session):
        from datatest_ray.stages.drift import chi2_independence

        # cell (y, q) never observed → expected still in the sum
        ds = _ds({"a": ["x", "x", "y"], "b": ["p", "q", "p"]})
        out = chi2_independence(ds, "a", "b").to_pandas()
        obs = np.array([[1.0, 1.0], [1.0, 0.0]])
        exp = np.outer(obs.sum(1), obs.sum(0)) / obs.sum()
        want = ((obs - exp) ** 2 / exp).sum()
        assert abs(out.chi2.iloc[0] - round(want, 6)) < 1e-9


class TestJsd:
    def test_identical_slices_near_zero_and_bounded(self, ray_session):
        from datatest_ray.stages.drift import jsd

        v = [1.0, 2.0, 3.0, 4.0] * 2
        s = ["r"] * 4 + ["c"] * 4
        out = jsd(_ds({"v": v, "s": s}), "v", split_col="s", ref_value="r",
                  lo=0.0, hi=5.0, bins=5).to_pandas()
        total = out.jsd.sum()
        assert abs(total) < 1e-6
        # disjoint slices → strictly positive, ≤ ln 2
        out2 = jsd(_ds({"v": [1.0, 1.0, 4.0, 4.0],
                        "s": ["r", "r", "c", "c"]}),
                   "v", split_col="s", ref_value="r",
                   lo=0.0, hi=5.0, bins=5).to_pandas()
        assert 0 < out2.jsd.sum() <= np.log(2) + 1e-9


class TestCorrMatrix:
    def test_zero_variance_is_null(self, ray_session):
        from datatest_ray.stages.profile import corr_matrix

        t = corr_matrix(_ds({"a": [1.0, 2.0, 3.0], "b": [2.0, 4.0, 6.0],
                             "c": [5.0, 5.0, 5.0]}), ["a", "b", "c"])
        got = {(r["x"], r["y"]): r["corr"] for r in t.to_pylist()}
        assert got[("a", "b")] == 1.0
        assert got[("a", "c")] is None and got[("b", "c")] is None


class TestQuantileHistogram:
    def test_equi_depth_bins(self, ray_session):
        from datatest_ray.stages.profile import quantile_histogram

        v = [float(i) for i in range(1, 101)]
        out = quantile_histogram(_ds({"v": v}), "v", n_bins=10).to_pandas()
        assert out.n.sum() == 100
        # deciles of 1..100 split into 10 equal-ish bins
        assert out.n.min() >= 9 and out.n.max() <= 11


class TestQuantileDisc:
    def test_disc_picks_data_value(self, ray_session):
        from datatest_ray.stages.window import grouped_quantile

        ds = _ds({"g": ["a"] * 4, "v": [10.0, 20.0, 30.0, 40.0]})
        out = grouped_quantile(ds, by="g", col="v", q=0.5, alias="m",
                               method="disc").to_pandas()
        # ceil(0.5*4)-1 = 1 → 20.0 (quantile_cont would give 25.0)
        assert out.m.iloc[0] == 20.0


class TestLexicalRichness:
    def test_counts_types_and_hapax(self, ray_session):
        from datatest_ray.stages.text import lexical_richness

        ds = _ds({"g": ["x", "x", "y"],
                  "t": ["a b a", "b c", "  "]})
        out = lexical_richness(ds, "t", group_col="g").to_pandas()
        x = out[out.g == "x"].iloc[0]
        # tokens: a,b,a,b,c → 5; types a,b,c → 3; hapax: c
        assert (x.n_tokens, x.n_types, x.hapax) == (5, 3, 1)
        assert abs(x.ttr - round(3 / 5, 6)) < 1e-9
        # whitespace-only doc contributes nothing: group y absent
        assert "y" not in set(out.g)


class TestRetention:
    def test_next_day_pairs(self, ray_session):
        from datatest_ray.stages.seq import next_day_retention

        DAY = 86_400_000_000
        # u1 active d0,d1,d3; u2 active d0 only → d0: 2 active 1 retained
        ds = _ds({"u": [1, 1, 1, 1, 2],
                  "ts": _t([0, 10, DAY, 3 * DAY, 5])})
        out = next_day_retention(ds, by="u", ts="ts").to_pandas()
        got = {r.day: (r.n_active, r.n_retained) for r in out.itertuples()}
        assert got == {0: (2, 1), 1: (1, 0), 3: (1, 0)}


class TestSessionDurations:
    def test_durations_per_session(self, ray_session):
        from datatest_ray.stages.sessions import session_durations

        M = 60_000_000  # one minute in µs
        # sessions (gap 30 min): [0, 10m], [60m], singleton duration 0
        ds = _ds({"u": [1, 1, 1],
                  "ts": _t([0, 10 * M, 60 * M])})
        out = session_durations(ds, by="u", ts="ts",
                                gap_s=1800.0).to_pandas()
        r = out.iloc[0]
        assert (r.n_sessions, r.total_dur_us, r.max_dur_us) == \
            (2, 10 * M, 10 * M)


class TestSkewReport:
    def test_uniform_vs_skewed(self, ray_session):
        from datatest_ray.stages.profile import key_skew_report

        uni = key_skew_report(_ds({"k": [1, 2, 3, 4] * 5}),
                              "k").to_pandas().iloc[0]
        assert (uni.n_keys, uni.n_rows) == (4, 20)
        assert uni.entropy == 1.0 and uni.top1_share == 0.25
        skew = key_skew_report(_ds({"k": [7] * 19 + [8]}),
                               "k").to_pandas().iloc[0]
        assert skew.top1_share == 0.95 and skew.entropy < 0.3


class TestWeightedSample:
    def test_weight_zero_and_saturated(self, ray_session):
        from datatest_ray.stages.sampling import weighted_hash_sample

        ds = _ds({"id": list(range(100)),
                  "w": [0.0] * 50 + [1e9] * 50})
        out = weighted_hash_sample(ds, id_col="id", weight_col="w",
                                   rate_per_unit=1e-6).to_pandas()
        # zero weight never kept; saturated weight (p clamps to 1) always
        assert sorted(out.id.tolist()) == list(range(50, 100))


class TestBigrams:
    def test_pairs_within_rows_only(self, ray_session):
        from datatest_ray.stages.text import bigram_topk

        ds = _ds({"t": ["a b c", "b  c", "x"]})
        out = bigram_topk(ds, "t", k=10).to_pandas()
        got = {(r.w1, r.w2): r.n for r in out.itertuples()}
        # "a b","b c" from doc1, "b c" from doc2 (double space folds);
        # no pair crosses documents, singleton doc contributes none
        assert got == {("b", "c"): 2, ("a", "b"): 1}


class TestCentroidConfusion:
    def test_identical_labels_cos_one(self, ray_session):
        from datatest_ray.stages.similarity import centroid_confusion

        emb = [[1.0, 0.0], [1.0, 0.0], [0.0, 2.0], [1.0, 0.0]]
        lab = [0, 0, 1, 2]
        t = pa.table({
            "label": pa.array(lab, pa.int32()),
            "embedding": pa.array(emb, pa.list_(pa.float32())),
        })
        import ray.data as rd

        out = centroid_confusion(rd.from_arrow(t), label_col="label",
                                 vec_col="embedding").to_pandas()
        got = {(r.label_a, r.label_b): r.cos for r in out.itertuples()}
        assert got[(0, 2)] == 1.0      # same direction
        assert got[(0, 1)] == 0.0      # orthogonal
        assert got[(1, 2)] == 0.0


class TestIntervalIslands:
    def test_merge_touch_and_gap(self, ray_session):
        from datatest_ray.stages.seq import interval_islands

        # key 1: [0,5] + [3,4] (contained) + [5,9] (touching) merge into
        # one island [0,9]; [12,13] is its own island.
        # key 2: one interval. No leakage of key 1's running max.
        ds = _ds({
            "k": [1, 1, 1, 1, 2],
            "s": [0, 3, 5, 12, 1],
            "e": [5, 4, 9, 13, 2],
        })
        out = interval_islands(ds, by="k", start_col="s",
                               end_col="e").to_pandas()
        r1 = out[out.k == 1].iloc[0]
        assert (r1.n_islands, r1.covered) == (2, 10)
        r2 = out[out.k == 2].iloc[0]
        assert (r2.n_islands, r2.covered) == (1, 1)

    def test_no_cross_key_leak_on_sorted_adjacency(self, ray_session):
        from datatest_ray.stages.seq import interval_islands

        # key 10 ends at 100; key 20 starts below that — must still be
        # a fresh island (the K-offset accumulate resets per segment).
        ds = _ds({"k": [10, 20], "s": [0, 50], "e": [100, 60]})
        out = interval_islands(ds, by="k", start_col="s",
                               end_col="e").to_pandas()
        assert sorted(out.n_islands) == [1, 1]
        assert sorted(out.covered) == [10, 100]


class TestWeightedMedian:
    def test_lower_median_integer_cutover(self, ray_session):
        from datatest_ray.stages.robust import weighted_median

        # group A: values 1 (w=1), 2 (w=1), 3 (w=2); tot=4, half=2 →
        # first v with 2*cumw >= 4 is v=2 (cumw 2). Lower median.
        # group B: single value dominates.
        ds = _ds({
            "g": ["A", "A", "A", "A", "B", "B"],
            "v": [3.0, 1.0, 2.0, 3.0, 9.0, 1.0],
            "w": [1, 1, 1, 1, 5, 1],
        })
        out = weighted_median(ds, by="g", col="v",
                              weight_col="w").to_pandas()
        got = dict(zip(out.g, out.wmedian))
        assert got == {"A": 2.0, "B": 9.0}

    def test_cross_batch_partials_merge(self, ray_session):
        import ray.data as rd
        from datatest_ray.stages.robust import weighted_median

        # same (key, value) arriving in different blocks must merge
        # weights before the cutover scan
        t1 = pa.table({"g": ["X"], "v": [5.0], "w": [1]})
        t2 = pa.table({"g": ["X", "X"], "v": [5.0, 1.0], "w": [1, 1]})
        ds = rd.from_arrow(t1).union(rd.from_arrow(t2))
        out = weighted_median(ds, by="g", col="v",
                              weight_col="w").to_pandas()
        assert dict(zip(out.g, out.wmedian)) == {"X": 5.0}


class TestWinsorize:
    def test_clip_bounds_per_group(self, ray_session):
        from datatest_ray.stages.robust import winsorize

        vals = list(map(float, range(1, 101)))
        ds = _ds({
            "g": ["a"] * 100,
            "v": vals,
            "i": list(range(100)),
        })
        out = winsorize(ds, by="g", col="v", id_col="i",
                        p_lo=0.05, p_hi=0.95).to_pandas()
        lo = float(np.round(np.quantile(vals, 0.05), 6))
        hi = float(np.round(np.quantile(vals, 0.95), 6))
        assert out.clipped.min() == lo and out.clipped.max() == hi
        mid = out[(out.i >= 10) & (out.i <= 90)]
        assert (mid.clipped == mid.i + 1).all()


class TestWasserstein:
    def test_identical_slices_zero(self, ray_session):
        from datatest_ray.stages.drift import wasserstein

        # same distribution on both sides -> every dcdf 0
        ds = _ds({
            "v": [1.0, 2.0, 3.0, 1.0, 2.0, 3.0],
            "s": ["a", "a", "a", "b", "b", "b"],
        })
        out = wasserstein(ds, "v", split_col="s", ref_value="a",
                          lo=0.0, hi=4.0, bins=4).to_pandas()
        assert len(out) == 4
        assert (out.dcdf == 0).all()

    def test_full_shift_is_max_mass(self, ray_session):
        from datatest_ray.stages.drift import wasserstein

        # ref mass all in bin 0, cmp mass all in bin 3:
        # dcdf = 1 for bins 0..2, 0 at bin 3 -> W1 = 3 * width
        ds = _ds({
            "v": [0.5, 0.5, 3.5, 3.5],
            "s": ["r", "r", "c", "c"],
        })
        out = wasserstein(ds, "v", split_col="s", ref_value="r",
                          lo=0.0, hi=4.0, bins=4).to_pandas()
        got = dict(zip(out.bin, out.dcdf))
        assert got == {0: 1.0, 1: 1.0, 2: 1.0, 3: 0.0}


class TestMutualInformation:
    def test_independent_is_zero_and_identical_is_entropy(self, ray_session):
        import numpy as np
        from datatest_ray.stages.drift import mutual_information

        # perfectly dependent: y == x over 2 symbols, uniform
        ds = _ds({"x": ["a", "b"] * 50, "y": ["a", "b"] * 50})
        out = mutual_information(ds, "x", "y").to_pandas()
        assert abs(out.mi.sum() - np.log(2)) < 1e-6

        # independent uniform 2x2
        ds2 = _ds({"x": ["a", "a", "b", "b"] * 25,
                   "y": ["u", "v", "u", "v"] * 25})
        out2 = mutual_information(ds2, "x", "y").to_pandas()
        assert abs(out2.mi.sum()) < 1e-9
        assert len(out2) == 4


class TestCusum:
    def test_sustained_shift_alarms_spike_does_not(self, ray_session):
        import numpy as np
        from datatest_ray.stages.drift import cusum_daily

        # 20 calm days at ~100/day, then 10 days shifted to ~130/day:
        # CUSUM must alarm inside the shifted block.  A series with one
        # single-day spike must NOT alarm at the same h.
        def mk(counts):
            us, day = [], 0
            for c in counts:
                base = day * 86_400_000_000
                us.extend(base + np.arange(c, dtype=np.int64) * 1000)
                day += 1
            return _ds({"ts": _t(us)})

        base = [100 + (i % 11) - 5 for i in range(20)]  # 95..105 noise
        shift = base + [115 + (i % 11) - 5 for i in range(10)]
        out = cusum_daily(mk(shift), "ts", k=0.5, h=4.0).to_pandas()
        assert len(out) == 30
        assert out[out.day >= 24].alarm.any()
        assert not out[out.day < 20].alarm.any()

        spike = base + [100 + (i % 11) - 5 for i in range(9)] + [115]
        out2 = cusum_daily(mk(spike), "ts", k=0.5, h=4.0).to_pandas()
        assert not out2.alarm.any()


class TestReviewRegressions:
    def test_interval_islands_epoch_us_magnitudes(self, ray_session):
        from datatest_ray.stages.seq import interval_islands

        # epoch-µs-scale absolute values: the un-normalized offset
        # trick overflowed int64 past ~6 keys per bucket and produced
        # n_islands=2 / negative covered for overlapping intervals
        B = 1_700_000_000_000_000_000
        ks, ss, es = [], [], []
        for k in range(10):
            base = B + k * 1_000_000
            ks += [k, k]
            ss += [base, base + 2]
            es += [base + 10, base + 12]
        ds = _ds({"k": ks, "s": ss, "e": es})
        out = interval_islands(ds, by="k", start_col="s",
                               end_col="e").to_pandas()
        assert (out.n_islands == 1).all()
        assert (out.covered == 12).all()

    def test_interval_islands_wide_range_fallback(self, ray_session):
        from datatest_ray.stages.seq import interval_islands

        # range ~2^55 x 300 keys forces the per-segment fallback path
        W = 1 << 55
        ks = list(range(300))
        ss = [i * (W // 300) for i in ks]
        es = [s + 5 for s in ss]
        ds = _ds({"k": ks, "s": ss, "e": es})
        out = interval_islands(ds, by="k", start_col="s",
                               end_col="e", n_buckets=2).to_pandas()
        assert len(out) == 300
        assert (out.n_islands == 1).all() and (out.covered == 5).all()

    def test_weighted_median_fractional_weights_round_half_away(
            self, ray_session):
        from datatest_ray.stages.robust import weighted_median

        # weight 2.5 must become 3 (CAST semantics), not truncate to 2:
        # with w(1.0)=2.5->3 and w(9.0)=3, tot=6, the cutover 2*cumw>=6
        # lands on v=1.0; truncation (tot=5) would land on v=9.0... keep
        # the discriminating construction: w(1.0)=2.5, w(9.0)=2.
        ds = _ds({"g": ["x", "x"], "v": [1.0, 9.0], "w": [2.5, 2.0]})
        out = weighted_median(ds, by="g", col="v",
                              weight_col="w").to_pandas()
        # half-away: w=[3,2], tot=5, 2*3>=5 at v=1.0
        # truncation would give w=[2,2], tot=4, 2*2>=4 also v=1.0 — so
        # use the mirrored case where the flip is observable:
        ds2 = _ds({"g": ["y", "y"], "v": [1.0, 9.0], "w": [1.5, 2.0]})
        out2 = weighted_median(ds2, by="g", col="v",
                               weight_col="w").to_pandas()
        # half-away: w=[2,2] tot=4 -> v=1.0; truncate: w=[1,2] tot=3 ->
        # 2*1 < 3 -> v=9.0
        assert dict(zip(out.g, out.wmedian)) == {"x": 1.0}
        assert dict(zip(out2.g, out2.wmedian)) == {"y": 1.0}

    def test_null_categories_group_like_sql(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from datatest_ray.stages.drift import mutual_information
        from datatest_ray.stages.robust import weighted_median

        ds = rd.from_arrow(pa.table({
            "x": ["a", "a", None, None],
            "y": ["u", "v", "u", "u"],
        }))
        out = mutual_information(ds, "x", "y").to_pandas()
        # 3 observed cells: (a,u), (a,v), (NULL,u) — null is a group
        assert len(out) == 3
        assert out.x.isna().sum() == 1
        assert abs(out.pxy.sum() - 1.0) < 1e-12

        ds2 = rd.from_arrow(pa.table({
            "g": [None, None, "z"],
            "v": [4.0, 2.0, 7.0],
            "w": [1, 1, 1],
        }))
        out2 = weighted_median(ds2, by="g", col="v",
                               weight_col="w").to_pandas()
        got = {(None if g is None or g != g else g): m
               for g, m in zip(out2.g, out2.wmedian)}
        assert got == {None: 2.0, "z": 7.0}


class TestLateEvents:
    def test_watermark_counts_and_first_arrival_exemption(self, ray_session):
        from datatest_ray.stages.seq import late_events

        M = 1_000_000
        # user 1 arrivals (by eid): ts 100s, 40s (60s late vs wm=100s:
        # NOT >60s), 250s, 100s (150s late -> LATE), 260s
        ds = _ds({
            "u": [1, 1, 1, 1, 1, 2],
            "eid": [1, 2, 3, 4, 5, 6],
            "ts": _t([100 * M, 40 * M, 250 * M, 100 * M, 260 * M, 5 * M]),
        })
        out = late_events(ds, by="u", ts="ts", seq_col="eid",
                          lateness_us=60 * M).to_pandas()
        r1 = out[out.u == 1].iloc[0]
        assert (r1.n_events, r1.n_late, r1.max_lateness_us) == \
            (5, 1, 150 * M)
        r2 = out[out.u == 2].iloc[0]
        assert (r2.n_events, r2.n_late, r2.max_lateness_us) == (1, 0, 0)


class TestCapPerGroup:
    def test_cap_is_deterministic_subset(self, ray_session):
        from datatest_ray.stages.sampling import cap_per_group

        ds = _ds({"id": list(range(100)),
                  "g": ["a"] * 70 + ["b"] * 25 + ["c"] * 5})
        out = cap_per_group(ds, by="g", id_col="id", cap=10).to_pandas()
        sizes = out.groupby("g").size().to_dict()
        assert sizes == {"a": 10, "b": 10, "c": 5}
        # rerun picks the identical subset (pure function of keys)
        out2 = cap_per_group(_ds({"id": list(range(100)),
                                  "g": ["a"] * 70 + ["b"] * 25 + ["c"] * 5}),
                             by="g", id_col="id", cap=10).to_pandas()
        assert sorted(out.id) == sorted(out2.id)


class TestTimeWeightedAvg:
    def test_holding_weights_and_single_event_excluded(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from datatest_ray.stages.seq import time_weighted_avg

        base = np.datetime64("2024-01-01T00:00:00", "us")
        secs = np.array([0, 10, 40, 0], dtype="timedelta64[s]")
        ds = rd.from_arrow(pa.table({
            "u": [1, 1, 1, 2],
            "ts": pa.array(base + secs.astype("timedelta64[us]")),
            "v": [2.0, 8.0, 99.0, 5.0],
            "id": [1, 2, 3, 4],
        }))
        t = pa.concat_tables(list(time_weighted_avg(
            ds, by="u", ts="ts", value_col="v", id_col="id"
        ).iter_batches(batch_format="pyarrow")))
        # user 1: v=2 held 10s, v=8 held 30s, v=99 last (no weight)
        # twa = (2*10 + 8*30) / 40 = 6.5; user 2 single event -> no row
        assert t.column("u").to_pylist() == [1]
        assert t.column("twa").to_pylist() == [6.5]
        assert t.column("span_s").to_pylist() == [40.0]

    def test_cardinality_profile(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from datatest_ray.stages.profile import cardinality_profile

        ds = rd.from_arrow(pa.table({
            "a": [1, 1, 2, 3, None],
            "b": ["x", "x", "x", "y", "y"],
        }))
        t = pa.concat_tables(list(cardinality_profile(
            ds, ["a", "b"]).iter_batches(batch_format="pyarrow")))
        got = dict(zip(t.column("column").to_pylist(),
                       t.column("n_distinct").to_pylist()))
        # nulls are not counted (SQL count(DISTINCT) semantics)
        assert got == {"a": 3, "b": 2}


class TestPairLift:
    def test_lift_above_and_below_independence(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from datatest_ray.stages.basket import pair_lift

        # items 1,2 always together (4 baskets); item 3 in every basket
        baskets = []
        for b in range(4):
            baskets += [(b, 1), (b, 2), (b, 3)]
        for b in range(4, 8):
            baskets += [(b, 3), (b, 4)]
        ds = rd.from_arrow(pa.table({
            "bk": [b for b, _ in baskets],
            "it": [i for _, i in baskets],
        }))
        t = pa.concat_tables(list(pair_lift(
            ds, by="bk", item_col="it", min_n=2
        ).iter_batches(batch_format="pyarrow")))
        rows = {(r["item_a"], r["item_b"]): r for r in t.to_pylist()}
        # (1,2): n=4, n1=4, n2=4, nb=8 -> lift = 4*8/(4*4) = 2.0
        assert rows[(1, 2)]["lift"] == 2.0
        # (1,3): n=4, n1=4, n3=8 -> lift = 4*8/(4*8) = 1.0
        assert rows[(1, 3)]["lift"] == 1.0

    def test_split_basket_across_blocks_counts_once(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from datatest_ray.stages.basket import pair_lift

        # the same (basket, item) row duplicated in two separate blocks
        a = rd.from_arrow(pa.table({"bk": [1, 1], "it": [1, 2]}))
        b = rd.from_arrow(pa.table({"bk": [1, 2, 2], "it": [1, 1, 2]}))
        t = pa.concat_tables(list(pair_lift(
            a.union(b), by="bk", item_col="it", min_n=1
        ).iter_batches(batch_format="pyarrow")))
        rows = {(r["item_a"], r["item_b"]): r for r in t.to_pylist()}
        # item 1 in baskets {1,2} (dup row counts once), item 2 in {1,2}
        assert rows[(1, 2)]["n"] == 2
        assert rows[(1, 2)]["lift"] == 2 * 2 / (2 * 2)


class TestPeakConcurrency:
    def test_end_exclusive_and_peak(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from datatest_ray.stages.seq import peak_concurrency

        base = np.datetime64("2024-01-01T00:00:00", "us")
        m = np.timedelta64(60, "s")
        # [0,2), [1,3), [2,4): ends are exclusive -> peak 2 (not 3)
        ds = rd.from_arrow(pa.table({
            "s": pa.array([base, base + 1 * m, base + 2 * m]),
            "e": pa.array([base + 2 * m, base + 3 * m, base + 4 * m]),
        }))
        t = peak_concurrency(ds, start_col="s", end_col="e")
        assert t.column("peak")[0].as_py() == 2
        assert t.column("n_intervals")[0].as_py() == 3

    def test_nested_intervals(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from datatest_ray.stages.seq import peak_concurrency

        base = np.datetime64("2024-01-01T00:00:00", "us")
        m = np.timedelta64(60, "s")
        starts = [base, base + m, base + 2 * m, base + 10 * m]
        ends = [base + 9 * m, base + 8 * m, base + 7 * m, base + 11 * m]
        ds = rd.from_arrow(pa.table({"s": pa.array(starts),
                                     "e": pa.array(ends)}))
        t = peak_concurrency(ds, start_col="s", end_col="e")
        assert t.column("peak")[0].as_py() == 3

    def test_empty(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from datatest_ray.stages.seq import peak_concurrency

        ds = rd.from_arrow(pa.table({
            "s": pa.array([], pa.timestamp("us")),
            "e": pa.array([], pa.timestamp("us"))}))
        t = peak_concurrency(ds, start_col="s", end_col="e")
        assert t.column("peak")[0].as_py() == 0


class TestGiniByGroup:
    def test_known_values(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from datatest_ray.stages.robust import gini_by_group

        # equal values -> G = 0; one-holder extreme -> G -> (n-1)/n
        ds = rd.from_arrow(pa.table({
            "g": ["eq"] * 4 + ["mono"] * 4,
            "v": [5.0, 5.0, 5.0, 5.0, 0.0, 0.0, 0.0, 100.0],
        }))
        t = gini_by_group(ds, by="g", value_col="v").sort_by("g")
        got = dict(zip(t.column("g").to_pylist(),
                       t.column("gini").to_pylist()))
        assert abs(got["eq"]) < 1e-12
        assert abs(got["mono"] - 0.75) < 1e-12

    def test_matches_numpy_reference_with_ties(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from datatest_ray.stages.robust import gini_by_group

        rng = np.random.default_rng(13)
        v = np.round(rng.uniform(0, 100, 500), 2)
        v[:50] = v[50:100]  # plant heavy ties
        ds = rd.from_arrow(pa.table({"g": ["a"] * 500, "v": v.tolist()}))
        t = gini_by_group(ds, by="g", value_col="v", decimals=2)
        x = np.sort(np.round(v * 100))
        i = np.arange(1, 501)
        want = 2 * (i * x).sum() / (500 * x.sum()) - 501 / 500
        assert abs(t.column("gini")[0].as_py() - want) < 1e-12
