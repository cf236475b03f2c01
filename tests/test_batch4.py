"""Session-8 operator batch: calendar-spine gaps, trimmed mean,
Theil's U, HHI, semantic types, null co-occurrence, exact dup vectors,
daily OHLC, tolerance-bounded as-of."""

import numpy as np
import pyarrow as pa


def _ds(table: pa.Table):
    import ray.data as rd

    return rd.from_arrow(table)


def _collect(ds):
    return ds.to_pandas()


def _ts(us):
    return pa.array(np.asarray(us, dtype=np.int64), pa.timestamp("us"))


DAY = 86_400_000_000


class TestDateSpineGaps:
    def test_holes_and_max_gap(self, ray_session):
        from datatest_ray.stages.seq import date_spine_gaps

        # key 'a': days 0,1,5 (missing 2,3,4 → n_missing=3, max_gap=3)
        # key 'b': days 10,11,12 contiguous; duplicate day entries collapse
        t = pa.table({
            "k": ["a", "a", "a", "a", "b", "b", "b", "b"],
            "ts": _ts([0, DAY, 5 * DAY, 5 * DAY + 7,
                       10 * DAY, 10 * DAY + 3, 11 * DAY, 12 * DAY]),
        })
        out = _collect(date_spine_gaps(_ds(t), by="k", ts="ts")).set_index(
            "k")
        assert out.loc["a", "n_days"] == 3
        assert out.loc["a", "span_days"] == 6
        assert out.loc["a", "n_missing"] == 3
        assert out.loc["a", "max_gap"] == 3
        assert out.loc["b", "n_days"] == 3
        assert out.loc["b", "n_missing"] == 0
        assert out.loc["b", "max_gap"] == 0

    def test_single_day_key_and_null_rows(self, ray_session):
        from datatest_ray.stages.seq import date_spine_gaps

        t = pa.table({
            "k": pa.array(["x", None, "x"]),
            "ts": pa.array([3 * DAY, 4 * DAY, None],
                           pa.timestamp("us")),
        })
        out = _collect(date_spine_gaps(_ds(t), by="k", ts="ts"))
        assert len(out) == 1
        row = out.iloc[0]
        assert (row["n_days"], row["span_days"], row["n_missing"],
                row["max_gap"]) == (1, 1, 0, 0)


class TestTrimmedMean:
    def test_matches_numpy_band_mean(self, ray_session):
        from datatest_ray.stages.robust import trimmed_mean

        rng = np.random.RandomState(7)
        k = np.repeat(["g1", "g2"], 500)
        v = np.round(np.concatenate([
            rng.lognormal(3, 1, 500), rng.normal(100, 10, 500)]), 2)
        out = _collect(trimmed_mean(
            _ds(pa.table({"k": k, "v": v})), by="k", col="v",
            p_lo=0.1, p_hi=0.9)).set_index("k")
        for g in ("g1", "g2"):
            vv = v[k == g]
            lo = np.round(np.quantile(vv, 0.1), 6)
            hi = np.round(np.quantile(vv, 0.9), 6)
            keep = vv[(vv >= lo) & (vv <= hi)]
            want = np.round(
                np.round(keep * 100).sum() / (100.0 * len(keep)), 6)
            assert out.loc[g, "n_kept"] == len(keep)
            assert abs(out.loc[g, "tmean"] - want) < 1e-9

    def test_trims_outlier(self, ray_session):
        from datatest_ray.stages.robust import trimmed_mean

        v = np.array([1.0] * 98 + [1000.0, -1000.0])
        out = _collect(trimmed_mean(
            _ds(pa.table({"k": ["a"] * 100, "v": v})), by="k", col="v",
            p_lo=0.05, p_hi=0.95))
        assert out.iloc[0]["tmean"] == 1.0
        assert out.iloc[0]["n_kept"] == 98


class TestTheilsU:
    def test_perfect_dependence(self, ray_session):
        from datatest_ray.stages.drift import theils_u

        # y is a function of x → H(y|x)=0 → MI=H(y) → u_yx = 1
        x = ["a", "a", "b", "b", "c", "c"] * 10
        y = [v.upper() for v in x]
        out = _collect(theils_u(_ds(pa.table({"x": x, "y": y})), "x", "y"))
        assert abs(out.iloc[0]["u_yx"] - 1.0) < 1e-9
        assert abs(out.iloc[0]["u_xy"] - 1.0) < 1e-9
        assert abs(out.iloc[0]["mi"] - out.iloc[0]["h_y"]) < 1e-6

    def test_independence_near_zero(self, ray_session):
        from datatest_ray.stages.drift import theils_u

        rng = np.random.RandomState(3)
        x = rng.choice(["a", "b"], 4000).tolist()
        y = rng.choice(["p", "q"], 4000).tolist()
        out = _collect(theils_u(_ds(pa.table({"x": x, "y": y})), "x", "y"))
        assert out.iloc[0]["u_xy"] < 0.01
        assert out.iloc[0]["n"] == 4000


class TestGroupHHI:
    def test_extremes(self, ray_session):
        from datatest_ray.stages.profile import group_hhi

        t = pa.table({
            "k": [1, 1, 1, 1, 2, 2, 2, 2],
            "c": ["x", "x", "x", "x", "p", "q", "p", "q"],
        })
        out = _collect(group_hhi(_ds(t), "k", "c")).set_index("k")
        assert out.loc[1, "hhi"] == 1.0           # single category
        assert out.loc[2, "hhi"] == 0.5           # uniform over 2
        assert out.loc[2, "n_cats"] == 2


class TestSemanticTypes:
    def test_match_shares(self, ray_session):
        from datatest_ray.stages.profile import semantic_type_profile

        t = pa.table({
            "a": ["123", "45", "x7", None],
            "b": ["u@x.io", "nope", "v@y.org", "w@z.net"],
        })
        rules = [("a", "digits", "^[0-9]+$"),
                 ("b", "email", "^[a-z]+@[a-z]+\\.[a-z]+$")]
        out = _collect(semantic_type_profile(_ds(t), rules)).set_index(
            "sem_type")
        assert out.loc["digits", "n_match"] == 2
        assert out.loc["digits", "n_nonnull"] == 3
        assert abs(out.loc["digits", "share"] - 2 / 3) < 1e-9
        assert out.loc["email", "n_match"] == 3
        assert out.loc["email", "n_nonnull"] == 4


class TestNullCooccurrence:
    def test_planted_joint_nulls(self, ray_session):
        from datatest_ray.stages.profile import null_cooccurrence

        a = pa.array([None, None, 3.0, 4.0, None])
        b = pa.array([None, 2.0, None, 4.0, None])
        c = pa.array([1.0, 2.0, 3.0, 4.0, 5.0])
        out = _collect(null_cooccurrence(
            _ds(pa.table({"a": a, "b": b, "c": c})), ["a", "b", "c"]))
        out = out.set_index(["x", "y"])
        r = out.loc[("a", "b")]
        assert (r["nx_null"], r["ny_null"], r["n_both"]) == (3, 3, 2)
        assert abs(r["jaccard"] - 0.5) < 1e-9     # 2 both / 4 either
        r2 = out.loc[("a", "c")]
        assert r2["n_both"] == 0 and r2["jaccard"] == 0.0
        # c has no nulls at all with... b: either = 3 → jaccard 0
        assert out.loc[("b", "c")]["jaccard"] == 0.0


class TestExactDupVectors:
    def test_planted_duplicates(self, ray_session):
        from datatest_ray.stages.similarity import exact_dup_vectors

        rng = np.random.RandomState(0)
        M = rng.normal(size=(20, 8)).astype(np.float32)
        M[4] = M[9] = M[14]                     # triple
        M[1] = M[17]                            # pair
        t = pa.table({
            "vec_id": pa.array(np.arange(1, 21)),
            "embedding": pa.array(list(M), pa.list_(pa.float32())),
        })
        out = _collect(exact_dup_vectors(
            _ds(t), vec_col="embedding", id_col="vec_id")).set_index(
            "keep_id")
        assert out.loc[5, "n_dups"] == 2         # ids 5,10,15
        assert out.loc[2, "n_dups"] == 1         # ids 2,18
        assert len(out) == 2

    def test_no_dups_empty(self, ray_session):
        from datatest_ray.stages.similarity import exact_dup_vectors

        M = np.eye(5, 6, dtype=np.float32)
        t = pa.table({
            "vec_id": pa.array(np.arange(5)),
            "embedding": pa.array(list(M), pa.list_(pa.float32())),
        })
        out = _collect(exact_dup_vectors(
            _ds(t), vec_col="embedding", id_col="vec_id"))
        assert len(out) == 0


class TestOHLC:
    def test_tie_break_and_extremes(self, ray_session):
        from datatest_ray.stages.temporal import ohlc_daily

        # two rows share the opening timestamp → open = lower event_id;
        # same at the close
        t = pa.table({
            "k": ["g"] * 6,
            "ts": _ts([10, 10, 50, 60, 99, 99]),
            "id": pa.array([2, 1, 3, 4, 6, 5], pa.int64()),
            "v": pa.array([20.0, 10.0, 99.0, 1.0, 30.0, 40.0]),
        })
        out = _collect(ohlc_daily(_ds(t), "ts", by="k", value_col="v",
                                  id_col="id"))
        assert len(out) == 1
        r = out.iloc[0]
        assert r["open"] == 10.0                 # id 1 wins the tie
        assert r["close"] == 30.0                # id 6 wins the tie
        assert r["high"] == 99.0 and r["low"] == 1.0 and r["n"] == 6

    def test_multi_day_split(self, ray_session):
        from datatest_ray.stages.temporal import ohlc_daily

        t = pa.table({
            "k": ["g"] * 4,
            "ts": _ts([5, DAY - 1, DAY + 5, 2 * DAY - 1]),
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "v": pa.array([1.0, 2.0, 3.0, 4.0]),
        })
        out = _collect(ohlc_daily(_ds(t), "ts", by="k", value_col="v",
                                  id_col="id")).set_index("day")
        assert out.loc[0, "open"] == 1.0 and out.loc[0, "close"] == 2.0
        assert out.loc[1, "open"] == 3.0 and out.loc[1, "close"] == 4.0


class TestAsofTolerance:
    def test_stale_match_nulled(self, ray_session):
        from datatest_ray.stages.joins import asof_join_latest

        left = pa.table({
            "k": [1, 1], "ts": _ts([100, 1_000_000]),
            "id": pa.array([11, 12], pa.int64()),
        })
        right = pa.table({"k": [1], "ts": _ts([50]),
                          "id": pa.array([0, ], pa.int64())})
        out = _collect(asof_join_latest(
            _ds(left), _ds(right), by="k", ts="ts", left_id="id",
            tolerance_us=100)).set_index("left_id")
        assert out.loc[11, "gap_us"] == 50        # within tolerance
        assert np.isnan(out.loc[12, "prior_ts_us"])  # stale → null
