"""Edge semantics for the relational (semi/anti/set-op/pivot) and
ordered-window (lag/rolling) operators — cases the sf0.001 oracle data
never exercises (empty right side, unseen pivot values, empty text,
missing JSON keys, frame shorter than the window)."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(table: dict):
    import ray.data as rd

    return rd.from_arrow(pa.table(table))


def _rows(ds, cols=None):
    t = pa.Table.from_pandas(ds.to_pandas())
    if cols:
        t = t.select(cols)
    return sorted(map(tuple, t.to_pylist() and [
        tuple(r.values()) for r in t.to_pylist()
    ]))


class TestSemiAnti:
    def test_semi_keeps_only_matched(self, ray_session):
        from datatest_ray.stages.relational import semi_join

        left = _ds({"k": [1, 2, 3, 4], "x": ["a", "b", "c", "d"]})
        right = _ds({"rk": [2, 2, 4, 9]})
        out = semi_join(left, right, on="k", right_on="rk").to_pandas()
        assert sorted(out["k"].tolist()) == [2, 4]
        assert set(out.columns) == {"k", "x"}

    def test_anti_empty_right_keeps_everything(self, ray_session):
        from datatest_ray.stages.relational import anti_join

        left = _ds({"k": [1, 2], "x": ["a", "b"]})
        right = _ds({"rk": [7]}).filter(expr="rk < 0")  # empty
        out = anti_join(left, right, on="k", right_on="rk").to_pandas()
        assert sorted(out["k"].tolist()) == [1, 2]

    def test_anti_drops_matched(self, ray_session):
        from datatest_ray.stages.relational import anti_join

        left = _ds({"k": [1, 2, 3], "x": ["a", "b", "c"]})
        right = _ds({"rk": [1, 3, 3]})
        out = anti_join(left, right, on="k", right_on="rk").to_pandas()
        assert out["k"].tolist() == [2]
        assert set(out.columns) == {"k", "x"}


class TestBroadcastJoin:
    def test_left_nulls_inner_drops_and_keep_first(self, ray_session):
        from datatest_ray.stages.relational import broadcast_join

        left = _ds({"k": [1, 2, 3], "x": ["a", "b", "c"]})
        # duplicate right key 1: first occurrence ('one') must win
        right = _ds({"rk": [1, 1, 2], "name": ["one", "uno", "two"]})
        out = broadcast_join(left, right, on="k", right_on="rk",
                             right_cols=["name"]).to_pandas()
        got = dict(zip(out["k"], out["name"]))
        assert got[1] == "one" and got[2] == "two"
        assert got[3] is None or got[3] != got[3]  # null for no match

        inner = broadcast_join(left, right, on="k", right_on="rk",
                               right_cols=["name"], how="inner").to_pandas()
        assert sorted(inner["k"]) == [1, 2]

    def test_empty_right_side(self, ray_session):
        """A dimension side filtered to ZERO rows must not crash (its
        pandas round-trip used to lose the schema): inner drops every
        left row, left emits all-null attach columns."""
        from datatest_ray.stages.relational import broadcast_join

        left = _ds({"k": [1, 2], "x": ["a", "b"]})
        right = _ds({"rk": [7], "name": ["seven"]}).filter(
            expr="rk < 0")  # empty, schema known
        inner = broadcast_join(left, right, on="k", right_on="rk",
                               right_cols=["name"],
                               how="inner").to_pandas()
        assert len(inner) == 0

        # empty AND schema-erased (map_batches plan with 0 out blocks)
        import pyarrow as pa

        def drop_all(t: pa.Table) -> pa.Table:
            return t.slice(0, 0)

        erased = _ds({"rk": [7], "name": ["seven"]}).map_batches(
            drop_all, batch_format="pyarrow")
        out = broadcast_join(left, erased, on="k", right_on="rk",
                             right_cols=["name"]).to_pandas()
        assert len(out) == 2 and out["name"].isna().all()


class TestSetOps:
    def test_except_and_intersect(self, ray_session):
        from datatest_ray.stages.relational import (
            except_distinct, intersect_distinct)

        a = _ds({"v": [1, 1, 2, 3]})
        b = _ds({"w": [2, 4]})
        ex = except_distinct(a, b, col="v", col_b="w").to_pandas()
        assert sorted(ex["v"].tolist()) == [1, 3]
        inter = intersect_distinct(a, b, col="v", col_b="w").to_pandas()
        assert inter["v"].tolist() == [2]


class TestPivot:
    def test_counts_and_unlisted_values_ignored(self, ray_session):
        from datatest_ray.stages.relational import pivot_counts

        ds = _ds({"u": [1, 1, 1, 2, 2],
                  "t": ["a", "a", "b", "b", "zzz"]})
        out = pivot_counts(ds, by="u", pivot_col="t",
                           values=["a", "b"]).to_pandas()
        out = out.sort_values("u").reset_index(drop=True)
        assert out["n_a"].tolist() == [2, 0]
        assert out["n_b"].tolist() == [1, 1]  # 'zzz' ignored


class TestLag:
    def test_gap_null_on_first_per_key(self, ray_session):
        from datatest_ray.stages.winfunc import lag_diff

        ds = _ds({
            "id": [1, 2, 3, 4],
            "u": [10, 10, 10, 20],
            "o": pa.array([100, 250, 400, 7], pa.int64()),
        })
        out = lag_diff(ds, by="u", order_col="o", id_col="id").to_pandas()
        got = {r.id: r.gap for r in out.itertuples()}
        assert np.isnan(got[1]) and np.isnan(got[4])
        assert got[2] == 150 and got[3] == 150


class TestZScore:
    def test_standardizes_and_degenerate_groups(self, ray_session):
        from datatest_ray.stages.winfunc import group_zscore

        ds = _ds({
            "id": [1, 2, 3, 4, 5, 6],
            "g": ["a", "a", "a", "lone", "flat", "flat"],
            "v": [1.0, 2.0, 3.0, 9.0, 5.0, 5.0],
        })
        out = group_zscore(ds, by="g", value_col="v",
                           id_col="id").to_pandas()
        got = {r.id: r.z for r in out.itertuples()}
        assert got[1] == pytest.approx(-1.0)
        assert got[2] == pytest.approx(0.0)
        assert got[3] == pytest.approx(1.0)
        assert np.isnan(got[4])  # n < 2
        assert np.isnan(got[5]) and np.isnan(got[6])  # zero variance


class TestRolling:
    def test_short_frames_and_key_reset(self, ray_session):
        from datatest_ray.stages.winfunc import rolling_agg

        ds = _ds({
            "id": [1, 2, 3, 4, 5],
            "u": [1, 1, 1, 1, 2],
            "o": pa.array([1, 2, 3, 4, 1], pa.int64()),
            "v": [10.0, 20.0, 30.0, 40.0, 99.0],
        })
        out = rolling_agg(ds, by="u", order_col="o", value_col="v",
                          id_col="id", window=3).to_pandas()
        got = {r.id: r.roll for r in out.itertuples()}
        assert got[1] == 10.0            # frame of 1
        assert got[2] == 15.0            # frame of 2
        assert got[3] == 20.0            # full frame 10,20,30
        assert got[4] == 30.0            # slides to 20,30,40
        assert got[5] == 99.0            # new key resets the frame


class TestCumeDist:
    def test_ties_share_the_run_end(self, ray_session):
        from datatest_ray.stages.winfunc import cume_dist

        ds = _ds({"id": [1, 2, 3, 4, 5],
                  "k": [1, 1, 1, 1, 2],
                  "v": [5.0, 5.0, 7.0, 9.0, 3.0]})
        out = cume_dist(ds, by="k", value_col="v", id_col="id").to_pandas()
        got = {r.id: r.cd for r in out.itertuples()}
        assert got[1] == got[2] == 0.5  # both ties count through the run
        assert got[3] == 0.75 and got[4] == 1.0
        assert got[5] == 1.0            # singleton partition


class TestRollup:
    def test_levels_and_totals(self, ray_session):
        from datatest_ray.stages.relational import rollup_counts

        ds = _ds({"a": ["x", "x", "y"], "b": ["p", "q", "p"]})
        out = rollup_counts(ds, cols=["a", "b"]).to_pandas()
        finest = out[out.a.notna() & out.b.notna()]
        subs = out[out.a.notna() & out.b.isna()]
        grand = out[out.a.isna() & out.b.isna()]
        assert len(finest) == 3 and finest["n"].sum() == 3
        assert {(r.a, r.n) for r in subs.itertuples()} == {("x", 2), ("y", 1)}
        assert grand["n"].tolist() == [3]


class TestUnnest:
    def test_explodes_and_skips_empty(self, ray_session):
        from datatest_ray.stages.text import unnest_tokens

        ds = _ds({"doc_id": [1, 2, 3], "text": ["a  b", "", "c"]})
        out = unnest_tokens(ds, "text", "doc_id").to_pandas()
        assert sorted(zip(out["doc_id"], out["token"])) == [
            (1, "a"), (1, "b"), (3, "c")]


class TestSampling:
    def test_deterministic_and_rate(self, ray_session):
        from datatest_ray.stages.sampling import hash_sample

        ds = _ds({"id": list(range(2000)), "x": [0] * 2000})
        a = hash_sample(ds, id_col="id", rate=0.3).to_pandas()
        b = hash_sample(ds, id_col="id", rate=0.3).to_pandas()
        assert sorted(a["id"]) == sorted(b["id"])  # same sample every run
        assert 0.2 < len(a) / 2000 < 0.4
        # nested property: the 10% sample is a subset of the 30% one
        small = hash_sample(ds, id_col="id", rate=0.1).to_pandas()
        assert set(small["id"]) <= set(a["id"])

    def test_fast_method_deterministic(self, ray_session):
        from datatest_ray.stages.sampling import hash_sample

        ds = _ds({"id": list(range(2000)), "x": [0] * 2000})
        a = hash_sample(ds, id_col="id", rate=0.3, method="fast").to_pandas()
        b = hash_sample(ds, id_col="id", rate=0.3, method="fast").to_pandas()
        assert sorted(a["id"]) == sorted(b["id"])
        assert 0.2 < len(a) / 2000 < 0.4
        small = hash_sample(ds, id_col="id", rate=0.1,
                            method="fast").to_pandas()
        assert set(small["id"]) <= set(a["id"])  # nested samples

    def test_stratified_rates(self, ray_session):
        from datatest_ray.stages.sampling import stratified_hash_sample

        n = 2000
        ds = _ds({"id": list(range(n)),
                  "s": ["a" if i % 2 else "b" for i in range(n)]})
        out = stratified_hash_sample(
            ds, id_col="id", strata_col="s",
            rates={"a": 0.5}, default_rate=0.05).to_pandas()
        frac_a = (out["s"] == "a").sum() / (n / 2)
        frac_b = (out["s"] == "b").sum() / (n / 2)
        assert 0.4 < frac_a < 0.6
        assert frac_b < 0.12


class TestGroupedCorr:
    def test_matches_numpy_and_degenerate_groups(self, ray_session):
        from datatest_ray.stages.window import grouped_corr

        rng = np.random.RandomState(7)
        xs = rng.standard_normal(50)
        ys = 2 * xs + rng.standard_normal(50) * 0.5
        ds = _ds({
            "g": ["a"] * 50 + ["single"] + ["flat", "flat"],
            "x": list(xs) + [1.0, 3.0, 3.0],
            "y": list(ys) + [2.0, 5.0, 5.0],
        })
        out = grouped_corr(ds, by="g", x="x", y="y").to_pandas()
        got = {r.g: r.corr for r in out.itertuples()}
        assert got["a"] == pytest.approx(np.corrcoef(xs, ys)[0, 1], rel=1e-9)
        assert np.isnan(got["single"])   # n < 2 -> NULL
        assert np.isnan(got["flat"])     # zero variance -> NULL


class TestGroupedConcat:
    def test_ordered_join(self, ray_session):
        from datatest_ray.stages.window import grouped_concat

        ds = _ds({"g": [1, 1, 1, 2], "s": ["b", "a", "c", "z"]})
        out = grouped_concat(ds, by="g", col="s", sep="|").to_pandas()
        got = {r.g: r.agg for r in out.itertuples()}
        assert got[1] == "a|b|c" and got[2] == "z"


class TestProfile:
    def test_nulls_and_all_null_column(self, ray_session):
        from datatest_ray.stages.profile import profile_columns

        ds = _ds({
            "x": pa.array([1.0, None, 3.0, None], pa.float64()),
            "y": pa.array([None, None, None, None], pa.float64()),
        })
        out = profile_columns(ds, ["x", "y"]).to_pandas()
        got = {r.col: r for r in out.itertuples()}
        assert got["x"].n == 4 and got["x"].n_null == 2
        assert got["x"].min == 1.0 and got["x"].max == 3.0
        assert got["x"].mean == 2.0
        assert got["y"].n_null == 4
        assert np.isnan(got["y"].mean)


class TestEmbeddingHygiene:
    def test_drops_greater_id_of_near_dup_pair(self, ray_session):
        from datatest_ray.pipelines.corpus import embedding_hygiene

        # vectors 1 and 3 are identical (cos=1); 2 is orthogonal
        ds = _ds({
            "vec_id": [1, 2, 3],
            "embedding": pa.array(
                [[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]],
                pa.list_(pa.float32())),
            "label": [7, 7, 8],
        })
        out = embedding_hygiene(ds, threshold=0.9).to_pandas()
        got = dict(zip(out["label"], out["n_kept"]))
        # id 3 (greater of pair 1-3) dropped -> label 8 vanishes
        assert got.get(7) == 2
        assert 8 not in got


class TestTextOps:
    def test_repetition_empty_and_dup(self, ray_session):
        from datatest_ray.stages.text import repetition_stats

        ds = _ds({"doc_id": [1, 2, 3],
                  "text": ["a a b", "x y z", "   "]})
        out = repetition_stats(ds, "text", "doc_id").to_pandas()
        out = out.sort_values("doc_id").reset_index(drop=True)
        assert out["n_tokens"].tolist() == [3, 3, 0]
        assert out["n_distinct"].tolist() == [2, 3, 0]
        assert out["dup_frac"].tolist() == pytest.approx([1 / 3, 0.0, 0.0])

    def test_normalize_fingerprint_matches_manual_md5(self, ray_session):
        import hashlib

        from datatest_ray.stages.text import normalize_fingerprint

        ds = _ds({"doc_id": [1], "text": ["  Hello,  WORLD!  again "]})
        out = normalize_fingerprint(ds, "text", "doc_id").to_pandas()
        norm = "hello world again"
        assert out["norm_len"].tolist() == [len(norm)]
        assert out["norm_fp"].tolist() == [
            hashlib.md5(norm.encode()).hexdigest()]

    def test_json_extract_missing_key_is_null(self, ray_session):
        from datatest_ray.stages.text import json_extract_int

        ds = _ds({"id": [1, 2, 3],
                  "p": ['{"k": 42}', '{"other": 1}', '{"k": -7}']})
        out = json_extract_int(ds, "p", "id", key="k").to_pandas()
        out = out.sort_values("id").reset_index(drop=True)
        assert out["val"][0] == 42
        assert pa.compute.is_null(pa.array([out["val"][1]]))[0].as_py() or \
            out["val"].isna()[1]
        assert out["val"][2] == -7


class TestRangeJoin:
    def _bands(self):
        return pa.table({"band": ["a", "b"],
                         "lo": [0.0, 10.0], "hi": [10.0, 20.0]})

    def test_inner_drops_out_of_range(self, ray_session):
        from datatest_ray.stages.relational import range_join_broadcast

        left = _ds({"id": [1, 2, 3, 4], "v": [5.0, 15.0, 25.0, -1.0]})
        out = range_join_broadcast(left, self._bands(), value_col="v",
                                   how="inner").to_pandas()
        out = out.sort_values("id").reset_index(drop=True)
        assert out["id"].tolist() == [1, 2]
        assert out["band"].tolist() == ["a", "b"]

    def test_left_emits_nulls_and_boundaries_half_open(self, ray_session):
        from datatest_ray.stages.relational import range_join_broadcast

        # lo is inclusive, hi exclusive: 10.0 lands in band b, 20.0 nowhere
        left = _ds({"id": [1, 2, 3], "v": [10.0, 20.0, 0.0]})
        out = range_join_broadcast(left, self._bands(), value_col="v",
                                   how="left").to_pandas()
        out = out.sort_values("id").reset_index(drop=True)
        assert out["band"].tolist()[0] == "b"
        assert out["band"].isna()[1]
        assert out["band"].tolist()[2] == "a"

    def test_overlapping_bands_rejected(self, ray_session):
        from datatest_ray.stages.relational import range_join_broadcast

        bad = pa.table({"band": ["a", "b"], "lo": [0.0, 5.0],
                        "hi": [10.0, 20.0]})
        left = _ds({"id": [1], "v": [1.0]})
        with pytest.raises(ValueError, match="overlap"):
            range_join_broadcast(left, bad, value_col="v")


class TestSafeJoin:
    """safe_join must survive the Ray 2.49 hash-join crash shapes:
    sparse filtered build sides whose hash partitions lack
    schema-carrying slices, and fully-empty sides."""

    def test_left_outer_sparse_right(self, ray_session):
        from datatest_ray.stages.relational import safe_join

        left = _ds({"k": list(range(1, 201)), "lv": list(range(201, 401))})
        # sparse right spread over many mostly-empty blocks, like a
        # selective filter over a multi-block read
        right = _ds({"rk": [3, 50, 120, 199, 250, 260],
                     "rv": ["a", "b", "c", "d", "e", "f"]}).repartition(16)
        out = safe_join(left, right, join_type="left_outer",
                        num_partitions=8, on="k",
                        right_on="rk").to_pandas()
        assert len(out) == 200
        matched = out[out["rv"].notna()]
        assert sorted(matched["k"]) == [3, 50, 120, 199]

    def test_inner_and_empty_sides(self, ray_session):
        from datatest_ray.stages.relational import safe_join

        left = _ds({"k": [1, 2, 3], "lv": [10, 20, 30]})
        empty = _ds({"rk": pa.array([], pa.int64()),
                     "rv": pa.array([], pa.string())})
        out = safe_join(left, empty, join_type="left_outer",
                        num_partitions=8, on="k", right_on="rk").to_pandas()
        assert len(out) == 3 and out["rv"].isna().all()
        out2 = safe_join(left, empty, join_type="inner",
                         num_partitions=8, on="k", right_on="rk")
        assert out2.count() == 0
        empty_left = _ds({"k": pa.array([], pa.int64()),
                          "lv": pa.array([], pa.int64())})
        right = _ds({"rk": [1], "rv": ["x"]})
        out3 = safe_join(empty_left, right, join_type="inner",
                         num_partitions=8, on="k", right_on="rk")
        assert out3.count() == 0
        out4 = safe_join(empty_left, right, join_type="left_outer",
                         num_partitions=8, on="k", right_on="rk")
        assert out4.count() == 0

    def test_left_outer_keeps_legit_null_key_rows(self, ray_session):
        """SQL semantics: a REAL left row with a null key survives a
        left outer join (only the internal sentinel is dropped)."""
        from datatest_ray.stages.relational import safe_join

        left = _ds({"k": pa.array([1, None, 3], pa.int64()),
                    "lv": [10, 20, 30]})
        right = _ds({"rk": [1], "rv": ["x"]})
        out = safe_join(left, right, join_type="left_outer",
                        num_partitions=4, on="k",
                        right_on="rk").to_pandas()
        assert len(out) == 3
        assert sorted(out["lv"]) == [10, 20, 30]
        assert out[out["lv"] == 20]["rv"].isna().all()


class TestAsofNext:
    def test_forward_inclusive_and_empty_right(self, ray_session):
        from datatest_ray.stages.joins import asof_join_next

        left = _ds({"eid": [1, 2, 3, 4],
                    "u": ["a", "a", "a", "b"],
                    "t": pa.array([10, 25, 99, 5], pa.int64()).cast(
                        pa.timestamp("us"))})
        right = _ds({"u": ["a", "a", "a"],
                     "t": pa.array([20, 25, 30], pa.int64()).cast(
                         pa.timestamp("us"))})
        out = asof_join_next(left, right, by="u", ts="t",
                             left_id="eid").to_pandas().set_index("left_id")
        assert out.loc[1, "next_ts_us"] == 20
        assert out.loc[2, "next_ts_us"] == 25  # inclusive >=
        assert out.loc[2, "gap_us"] == 0
        assert np.isnan(out.loc[3, "next_ts_us"])  # nothing follows
        assert np.isnan(out.loc[4, "next_ts_us"])  # key with no right


class TestRollingMedian:
    def test_frame_and_segment_reset(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from datatest_ray.stages.winfunc import rolling_median

        ts = pa.array([1, 2, 3, 4, 1, 2], pa.int64())
        ds = rd.from_arrow(pa.table({
            "k": ["a"] * 4 + ["b"] * 2,
            "o": ts,
            "v": [1.0, 100.0, 3.0, 5.0, 7.0, 9.0],
            "i": [0, 1, 2, 3, 4, 5],
        }))
        out = rolling_median(ds, by="k", order_col="o", value_col="v",
                             id_col="i", window=3).to_pandas()
        got = dict(zip(out.i, out.rmed))
        # a: [1]=1, [1,100]=50.5, [1,100,3]=3, [100,3,5]=5
        # b restarts: [7]=7, [7,9]=8
        assert got == {0: 1.0, 1: 50.5, 2: 3.0, 3: 5.0, 4: 7.0, 5: 8.0}


class TestParetoFront:
    def test_dominance_and_ties(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from datatest_ray.stages.relational import pareto_front

        # (price, size): frontier is (1,5), (2,9); (1,5)-dup kept;
        # (2,5) dominated by (1,5) [strict price]; (3,9) dominated by
        # (2,9); (2,4) dominated by (1,5) strictly both
        ds = rd.from_arrow(pa.table({
            "id": [1, 2, 3, 4, 5, 6],
            "price": [1.0, 2.0, 2.0, 3.0, 1.0, 2.0],
            "size": [5, 9, 5, 9, 5, 4],
        }))
        out = pareto_front(ds, min_col="price", max_col="size",
                           id_col="id").to_pandas()
        assert sorted(out.id) == [1, 2, 5]

    def test_local_prune_never_drops_frontier(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd
        from datatest_ray.stages.relational import pareto_front

        rng = np.random.RandomState(3)
        price = rng.uniform(0, 100, 500)
        size = rng.randint(0, 1000, 500)
        ds = rd.from_arrow(pa.table({
            "id": np.arange(500), "price": price, "size": size,
        })).repartition(8)  # force multi-block local pruning
        out = pareto_front(ds, min_col="price", max_col="size",
                           id_col="id").to_pandas()
        # brute-force oracle
        keep = []
        for i in range(500):
            dom = ((price <= price[i]) & (size >= size[i]) &
                   ((price < price[i]) | (size > size[i]))).any()
            if not dom:
                keep.append(i)
        assert sorted(out.id) == keep


class TestCollectTable:
    def test_preserves_schema_on_empty(self, ray_session):
        import pyarrow as pa

        from datatest_ray.stages.base import collect_table

        ds = _ds({"k": [1, 2, 3], "x": ["a", "b", "c"]})
        t = collect_table(ds, ["k", "x"])
        assert t.column_names == ["k", "x"] and t.num_rows == 3

        empty = ds.filter(expr="k < 0")
        t2 = collect_table(empty, ["k", "x"])
        assert t2.num_rows == 0
        assert t2.schema.field("k").type == pa.int64()

        def drop_all(b: pa.Table) -> pa.Table:
            return b.slice(0, 0)

        erased = ds.map_batches(drop_all, batch_format="pyarrow")
        t3 = collect_table(erased, ["k", "x"])
        assert t3.num_rows == 0 and t3.column_names == ["k", "x"]
