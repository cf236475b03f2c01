"""cluster_representatives (keep-best dedup), charset_profile,
cramers_v."""

import numpy as np
import pyarrow as pa

from datatest_ray.stages.base import RunContext


def _ds(table):
    import ray.data as rd

    return rd.from_arrow(pa.table(table))


def _collect(ds):
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    return pa.concat_tables(batches) if batches else None


class TestClusterRepresentatives:
    def test_picks_highest_quality_with_id_tiebreak(self, ray_session):
        from datatest_ray.stages.dedup import cluster_representatives

        base = "alpha beta gamma delta epsilon zeta eta theta"
        ds = _ds({
            "doc_id": [1, 2, 3, 4, 5],
            # docs 1/2/3 share shingles (near-dups); 4/5 unrelated
            "text": [base, base, base + " iota",
                     "one two three four five six",
                     "unrelated words entirely different tokens here"],
            "q": [10, 30, 30, 5, 5],
        })
        t = _collect(cluster_representatives(
            ds, "text", "doc_id", quality_col="q", n=3, threshold=0.5,
            shuffle_partitions=4)).sort_by("doc_id")
        assert t.column("doc_id").to_pylist() == [1, 2, 3]
        # q ties between 2 and 3 -> lowest id (2) wins
        assert t.column("rep_id").to_pylist() == [2, 2, 2]
        assert t.column("keep").to_pylist() == [False, True, False]
        assert t.column("cluster_id").to_pylist() == [1, 1, 1]

    def test_no_pairs_yields_empty(self, ray_session):
        from datatest_ray.stages.dedup import cluster_representatives

        ds = _ds({
            "doc_id": [1, 2],
            "text": ["aa bb cc dd ee", "ff gg hh ii jj"],
            "q": [1, 2],
        })
        t = _collect(cluster_representatives(
            ds, "text", "doc_id", quality_col="q", threshold=0.5,
            shuffle_partitions=2))
        assert t is None or t.num_rows == 0


class TestCharsetProfile:
    def test_counts_match_python_reference(self, ray_session):
        import string

        from datatest_ray.stages.text import charset_profile

        texts = ["Hello, World! 123", "naïve café ümlaut", "ALLCAPS",
                 "no punct or digits here", ""]
        ds = _ds({"doc_id": [1, 2, 3, 4, 5], "text": texts})
        t = _collect(charset_profile(ds, "text", "doc_id")).sort_by("doc_id")
        punct = set(string.punctuation)
        for i, s in enumerate(texts):
            assert t.column("n_chars_total")[i].as_py() == len(s)
            assert t.column("n_digit")[i].as_py() == sum(
                c.isdigit() and c.isascii() for c in s)
            assert t.column("n_upper")[i].as_py() == sum(
                c.isupper() and c.isascii() for c in s)
            assert t.column("n_punct")[i].as_py() == sum(
                c in punct for c in s)
            assert t.column("n_nonascii")[i].as_py() == sum(
                not c.isascii() for c in s)


class TestCramersV:
    def test_perfect_association_is_one(self, ray_session):
        from datatest_ray.stages.drift import cramers_v

        a = ["x", "y", "z"] * 40
        ds = _ds({"a": a, "b": [s.upper() for s in a]})
        t = _collect(cramers_v(ds, "a", "b"))
        assert abs(t.column("v")[0].as_py() - 1.0) < 1e-12
        assert t.column("n")[0].as_py() == 120

    def test_independence_is_zero(self, ray_session):
        from datatest_ray.stages.drift import cramers_v

        # balanced 2x2 grid: observed == expected everywhere
        ds = _ds({"a": ["x", "x", "y", "y"] * 25,
                  "b": ["p", "q", "p", "q"] * 25})
        t = _collect(cramers_v(ds, "a", "b"))
        assert abs(t.column("v")[0].as_py()) < 1e-12

    def test_matches_direct_formula(self, ray_session):
        from datatest_ray.stages.drift import cramers_v

        rng = np.random.default_rng(7)
        a = rng.choice(["x", "y", "z"], size=300).tolist()
        b = rng.choice(["p", "q"], size=300).tolist()
        t = _collect(cramers_v(ds := _ds({"a": a, "b": b}), "a", "b"))
        del ds
        obs = np.zeros((3, 2))
        for ai, bi in zip(a, b):
            obs["xyz".index(ai), "pq".index(bi)] += 1
        exp = np.outer(obs.sum(1), obs.sum(0)) / obs.sum()
        chi2 = ((obs - exp) ** 2 / exp).sum()
        v = np.sqrt(chi2 / (obs.sum() * 1))
        assert abs(t.column("chi2")[0].as_py() - chi2) < 1e-9
        assert abs(t.column("v")[0].as_py() - v) < 1e-12


class TestCompareTables:
    def _pair(self):
        import ray.data as rd

        actual = rd.from_arrow(pa.table({
            "k": [1, 2, 3, 5],
            "x": [10, 20, 30, 50],
            "s": ["a", "b", None, "e"],
        }))
        reference = rd.from_arrow(pa.table({
            "k": [1, 2, 4, 5],
            "x": [10, 21, 40, 50],
            "s": ["a", "b", "d", None],
        }))
        return actual, reference

    def test_all_three_kinds(self, ray_session):
        from datatest_ray.stages.compare import compare_tables

        a, r = self._pair()
        t = _collect(compare_tables(a, r, key="k", columns=["x", "s"],
                                    num_partitions=4))
        rows = sorted(zip(t.column("kind").to_pylist(),
                          t.column("row_ref").to_pylist(),
                          t.column("key").to_pylist()))
        assert ("extra", "3", None) in rows        # k=3 only in actual
        assert ("missing", "4", None) in rows      # k=4 only in reference
        assert ("invalid", "2", "x") in rows       # 20 vs 21
        # null-vs-value mismatches both directions
        assert ("invalid", "3", None) not in rows
        assert ("invalid", "5", "s") in rows       # 'e' vs NULL
        # k=3 is extra, so its null 's' never reaches column compare
        kinds = [k for k, *_ in rows]
        assert kinds.count("invalid") == 2

    def test_numeric_deviation_and_equal_tables_empty(self, ray_session):
        import ray.data as rd

        from datatest_ray.stages.compare import compare_tables

        a, r = self._pair()
        t = _collect(compare_tables(a, r, key="k", columns=["x"],
                                    num_partitions=4))
        inv = t.filter(pa.compute.equal(t.column("kind"), "invalid"))
        assert inv.column("deviation").to_pylist() == [-1.0]
        same = rd.from_arrow(pa.table({"k": [1, 2], "x": [1, 2]}))
        t2 = _collect(compare_tables(
            same, rd.from_arrow(pa.table({"k": [1, 2], "x": [1, 2]})),
            key="k", columns=["x"], num_partitions=4))
        assert t2 is None or t2.num_rows == 0

    def test_check_wrapper_in_suite(self, ray_session):
        import ray.data as rd

        from datatest_ray.pipelines.suite import CheckSuite
        from datatest_ray.stages.base import RunContext
        from datatest_ray.stages.compare import TableCompareCheck

        a, r = self._pair()
        res = CheckSuite([TableCompareCheck(r, key="k", columns=["x"])],
                         RunContext()).run(a)
        t = res.to_table()
        assert set(t.column("kind").to_pylist()) == {
            "extra", "missing", "invalid"}


class TestJoinConsistencyCheck:
    def test_temporal_and_numeric_ops(self, ray_session):
        import ray.data as rd

        from datatest_ray.stages.compare import JoinConsistencyCheck

        detail = rd.from_arrow(pa.table({
            "fk": [1, 1, 2, 3], "v": [5.0, 2.0, 7.0, 1.0]}))
        header = rd.from_arrow(pa.table({
            "pk": [1, 2, 3], "floor_v": [3.0, 7.0, 2.0]}))
        t = _collect(JoinConsistencyCheck(
            header, on="fk", right_on="pk", left_col="v",
            right_col="floor_v", op=">=").violations(detail, RunContext()))
        t = t.sort_by("key")
        assert t.column("key").to_pylist() == ["1", "3"]
        assert t.column("deviation").to_pylist() == [-1.0, -1.0]

    def test_timestamps_in_epoch_seconds(self, ray_session):
        import ray.data as rd

        from datatest_ray.stages.compare import JoinConsistencyCheck

        base = np.datetime64("2024-01-01T00:00:00", "us")
        detail = rd.from_arrow(pa.table({
            "fk": [1, 2],
            "ship": pa.array([base - np.timedelta64(90, "s"),
                              base + np.timedelta64(60, "s")]),
        }))
        header = rd.from_arrow(pa.table({
            "pk": [1, 2], "odate": pa.array([base, base])}))
        t = _collect(JoinConsistencyCheck(
            header, on="fk", right_on="pk", left_col="ship",
            right_col="odate", op=">=").violations(detail, RunContext()))
        assert t.column("key").to_pylist() == ["1"]
        assert t.column("deviation").to_pylist() == [-90.0]

    def test_all_consistent_empty(self, ray_session):
        import ray.data as rd

        from datatest_ray.stages.compare import JoinConsistencyCheck

        detail = rd.from_arrow(pa.table({"fk": [1], "v": [9.0]}))
        header = rd.from_arrow(pa.table({"pk": [1], "m": [1.0]}))
        t = _collect(JoinConsistencyCheck(
            header, on="fk", right_on="pk", left_col="v",
            right_col="m", op=">=").violations(detail, RunContext()))
        assert t is None or t.num_rows == 0


class TestLatestByKey:
    def test_latest_wins_with_id_tiebreak(self, ray_session):
        from datatest_ray.stages.dedup import latest_by_key

        ds = _ds({
            "k1": [1, 1, 1, 2],
            "k2": ["a", "a", "b", "a"],
            "ts": [10, 20, 5, 7],
            "id": [100, 101, 102, 103],
            "v": [1.0, 2.0, 3.0, 4.0],
        })
        t = _collect(latest_by_key(
            ds, key_cols=["k1", "k2"], order_col="ts", id_col="id"
        )).sort_by([("k1", "ascending"), ("k2", "ascending")])
        assert t.column("id").to_pylist() == [101, 102, 103]
        assert t.column("v").to_pylist() == [2.0, 3.0, 4.0]
        # tie on ts -> larger id wins
        ds2 = _ds({"k1": [1, 1], "k2": ["a", "a"], "ts": [5, 5],
                   "id": [1, 2], "v": [10.0, 20.0]})
        t2 = _collect(latest_by_key(
            ds2, key_cols=["k1", "k2"], order_col="ts", id_col="id"))
        assert t2.column("id").to_pylist() == [2]


class TestChecksumReconcile:
    def test_identical_tables_all_match(self, ray_session):
        import ray.data as rd

        from datatest_ray.stages.compare import checksum_reconcile

        t = pa.table({"k": list(range(200)),
                      "v": [i * 3 for i in range(200)]})
        out = _collect(checksum_reconcile(
            rd.from_arrow(t), rd.from_arrow(t), key_col="k",
            columns=["v"], n_buckets=8))
        assert out.num_rows == 8
        assert all(out.column("match").to_pylist())

    def test_single_changed_row_flips_exactly_its_bucket(self, ray_session):
        import hashlib

        import ray.data as rd

        from datatest_ray.stages.compare import checksum_reconcile

        t = pa.table({"k": list(range(200)),
                      "v": [i * 3 for i in range(200)]})
        vs = t.column("v").to_pylist()
        vs[17] = 999
        t2 = pa.table({"k": t.column("k"), "v": pa.array(vs)})
        out = _collect(checksum_reconcile(
            rd.from_arrow(t), rd.from_arrow(t2), key_col="k",
            columns=["v"], n_buckets=8))
        bad = out.filter(pa.compute.invert(out.column("match")))
        want_bucket = int(hashlib.md5(b"17").hexdigest()[:8], 16) % 8
        assert bad.column("bucket").to_pylist() == [want_bucket]


class TestSilhouetteLabels:
    def test_separated_clusters_near_one(self, ray_session):
        from datatest_ray.stages.similarity import silhouette_labels

        rng = np.random.default_rng(11)
        n, d = 120, 8
        labels = np.repeat([0, 1, 2], n // 3)
        centers = np.array([[10.0] + [0] * (d - 1),
                            [0, 10.0] + [0] * (d - 2),
                            [0, 0, 10.0] + [0] * (d - 3)])
        X = centers[labels] + rng.normal(0, 0.1, (n, d))
        ds = _ds({"vec_id": list(range(n)),
                  "label": labels.tolist(),
                  "embedding": [row.tolist() for row in X]})
        t = _collect(silhouette_labels(
            ds, label_col="label", vec_col="embedding")).sort_by("label")
        assert t.column("label").to_pylist() == [0, 1, 2]
        assert all(v > 0.9 for v in t.column("sil").to_pylist())
        assert t.column("n").to_pylist() == [40, 40, 40]

    def test_identical_clusters_near_zero(self, ray_session):
        from datatest_ray.stages.similarity import silhouette_labels

        rng = np.random.default_rng(12)
        X = rng.normal(0, 1.0, (100, 4))
        ds = _ds({"vec_id": list(range(100)),
                  "label": (np.arange(100) % 2).tolist(),
                  "embedding": [row.tolist() for row in X]})
        t = _collect(silhouette_labels(
            ds, label_col="label", vec_col="embedding"))
        assert all(abs(v) < 0.3 for v in t.column("sil").to_pylist())

    def test_single_label_is_zero(self, ray_session):
        from datatest_ray.stages.similarity import silhouette_labels

        ds = _ds({"vec_id": [1, 2, 3], "label": [7, 7, 7],
                  "embedding": [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]})
        t = _collect(silhouette_labels(
            ds, label_col="label", vec_col="embedding"))
        assert t.column("sil").to_pylist() == [0.0]


class TestAnnRecallReport:
    def test_recall_of_exact_method_is_one_vs_itself(self, ray_session):
        import ray.data as rd

        from datatest_ray.stages.similarity import ann_recall_report

        rng = np.random.default_rng(21)
        n, d = 300, 16
        X = rng.normal(0, 1, (n, d))
        ds = rd.from_arrow(pa.table({
            "vec_id": list(range(n)),
            "embedding": [row.tolist() for row in X]}))
        q = ds.filter(expr="vec_id < 6")
        t = ann_recall_report(ds, q, id_col="vec_id",
                              vec_col="embedding", k=5, method="lsh")
        assert t.column("n_queries")[0].as_py() == 6
        r = t.column("recall")[0].as_py()
        assert 0.0 <= r <= 1.0
        # multi-probe LSH defaults are tuned for >= 0.8 recall
        assert r >= 0.6
        assert t.column("n_hits")[0].as_py() == round(r * 30)


class TestSampleTokenBudget:
    def test_rates_scale_with_group_tokens(self, ray_session):
        import ray.data as rd

        from datatest_ray.pipelines.corpus import sample_token_budget

        big = ["word " * 200] * 50      # 10k tokens -> rate ~ 0.1
        small = ["word " * 2] * 10      # 20 tokens  -> rate 1.0
        ds = rd.from_arrow(pa.table({
            "doc_id": list(range(60)),
            "text": big + small,
            "lang": ["big"] * 50 + ["small"] * 10,
        }))
        t = _collect(sample_token_budget(ds, budget_tokens=1000))
        kept = t.column("lang").to_pylist()
        # every small-group doc survives (rate 1.0); the big group is
        # thinned to roughly budget/t = 10% (md5-deterministic)
        assert kept.count("small") == 10
        assert 0 < kept.count("big") < 25


class TestKsExact:
    def test_matches_scipy_style_reference(self, ray_session):
        import ray.data as rd

        from datatest_ray.stages.drift import ks_exact

        rng = np.random.default_rng(31)
        a = rng.normal(0, 1, 400)
        b = rng.normal(0.5, 1.3, 300)
        ds = rd.from_arrow(pa.table({
            "v": np.concatenate([a, b]).tolist(),
            "g": ["A"] * 400 + ["B"] * 300,
        }))
        t = ks_exact(ds, "v", split_col="g", ref_value="A")
        # brute-force reference: ECDF diff at every pooled point
        pooled = np.sort(np.unique(np.concatenate([a, b])))
        f1 = np.searchsorted(np.sort(a), pooled, side="right") / 400
        f0 = np.searchsorted(np.sort(b), pooled, side="right") / 300
        want = np.abs(f1 - f0).max()
        assert abs(t.column("ks")[0].as_py() - want) < 1e-12
        assert t.column("n_ref")[0].as_py() == 400

    def test_identical_samples_zero(self, ray_session):
        import ray.data as rd

        from datatest_ray.stages.drift import ks_exact

        v = list(range(100))
        ds = rd.from_arrow(pa.table({
            "v": [float(x) for x in v + v],
            "g": ["A"] * 100 + ["B"] * 100,
        }))
        t = ks_exact(ds, "v", split_col="g", ref_value="A")
        assert t.column("ks")[0].as_py() == 0.0

    def test_one_empty_side_is_null(self, ray_session):
        import ray.data as rd

        from datatest_ray.stages.drift import ks_exact

        ds = rd.from_arrow(pa.table({"v": [1.0, 2.0], "g": ["B", "B"]}))
        t = ks_exact(ds, "v", split_col="g", ref_value="A")
        assert t.column("ks")[0].as_py() is None


class TestGoldenRecord:
    def test_columns_survive_independently(self, ray_session):
        from datatest_ray.stages.dedup import golden_record

        ds = _ds({
            "k": [1, 1, 1, 2],
            "ts": [1, 2, 3, 1],
            "id": [1, 2, 3, 4],
            # newest row (ts=3) has null a; a's latest non-null is ts=2
            "a": ["old", "mid", None, None],
            "b": [10.0, None, 30.0, 5.0],
        })
        t = _collect(golden_record(
            ds, key_col="k", order_col="ts", id_col="id",
            value_cols=["a", "b"])).sort_by("k")
        assert t.column("k").to_pylist() == [1, 2]
        assert t.column("a").to_pylist() == ["mid", None]
        assert t.column("b").to_pylist() == [30.0, 5.0]

    def test_tie_breaks_by_id_desc(self, ray_session):
        from datatest_ray.stages.dedup import golden_record

        ds = _ds({"k": [1, 1], "ts": [5, 5], "id": [1, 2],
                  "a": ["low", "high"]})
        t = _collect(golden_record(ds, key_col="k", order_col="ts",
                                   id_col="id", value_cols=["a"]))
        assert t.column("a").to_pylist() == ["high"]

    def test_null_parity_vs_duckdb(self, ray_session, tmp_path):
        """Engine semantics == the paired SQL (ordered first FILTER
        non-null) on data WITH nulls — the case the shared testdata
        never exercises."""
        import duckdb
        import pyarrow.parquet as pq
        import ray.data as rd

        from datatest_ray.stages.dedup import golden_record

        rng = np.random.default_rng(77)
        n = 500
        ts = rng.integers(0, 10_000, n)
        val = rng.uniform(0, 10, n)
        typ = rng.choice(["a", "b", "c"], n).astype(object)
        vmask = rng.random(n) < 0.3
        tmask = rng.random(n) < 0.3
        t = pa.table({
            "user_id": pa.array(rng.integers(1, 40, n)),
            "ts": pa.array(ts * 1_000_000).cast(pa.timestamp("us")),
            "event_id": pa.array(np.arange(1, n + 1)),
            "value": pa.array(val, mask=vmask),
            "event_type": pa.array(
                [None if m else s for s, m in zip(typ, tmask)],
                pa.string()),
        })
        p = str(tmp_path / "ev.parquet")
        pq.write_table(t, p)
        got = pa.concat_tables(list(golden_record(
            rd.from_arrow(t), key_col="user_id", order_col="ts",
            id_col="event_id", value_cols=["value", "event_type"]
        ).iter_batches(batch_format="pyarrow"))).sort_by(
            "user_id").to_pylist()
        con = duckdb.connect()
        want = con.execute(f"""
            SELECT user_id,
                   first(value ORDER BY ts DESC, event_id DESC)
                     FILTER (WHERE value IS NOT NULL) AS value,
                   first(event_type ORDER BY ts DESC, event_id DESC)
                     FILTER (WHERE event_type IS NOT NULL) AS event_type
            FROM read_parquet('{p}') GROUP BY user_id ORDER BY user_id
        """).df().to_dict("records")
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g["user_id"] == w["user_id"]
            assert g["event_type"] == (None if w["event_type"] is None
                                       or w["event_type"] != w["event_type"]
                                       else w["event_type"])
            gv, wv = g["value"], w["value"]
            if gv is None:
                assert wv is None or wv != wv
            else:
                assert abs(gv - wv) < 1e-12


class TestChunkPlanAndBlocklist:
    def test_chunk_windows_with_overlap(self, ray_session):
        from datatest_ray.stages.text import chunk_plan

        ds = _ds({"doc_id": [1, 2, 3],
                  "text": ["t " * 10, "t", ""]})
        t = _collect(chunk_plan(ds, "text", "doc_id", size=4, overlap=1)
                     ).sort_by([("doc_id", "ascending"),
                                ("chunk_id", "ascending")])
        rows = t.to_pylist()
        # doc 1: 10 tokens, step 3 -> starts 0,3,6,9
        d1 = [r for r in rows if r["doc_id"] == 1]
        assert [r["tok_start"] for r in d1] == [0, 3, 6, 9]
        assert [r["tok_end"] for r in d1] == [4, 7, 10, 10]
        # doc 2: one short chunk; doc 3 (empty): no chunks
        d2 = [r for r in rows if r["doc_id"] == 2]
        assert len(d2) == 1 and d2[0]["n_tokens"] == 1
        assert not [r for r in rows if r["doc_id"] == 3]

    def test_overlap_must_be_smaller(self, ray_session):
        import pytest

        from datatest_ray.stages.text import chunk_plan

        with pytest.raises(ValueError):
            chunk_plan(_ds({"doc_id": [1], "text": ["x"]}),
                       "text", "doc_id", size=4, overlap=4)

    def test_blocklist_counts_distinct_terms(self, ray_session):
        from datatest_ray.stages.text import blocklist_scan

        ds = _ds({"doc_id": [1, 2, 3],
                  "text": ["Bad BAD worse", "all clean here", "bad worse"]})
        t = _collect(blocklist_scan(
            ds, "text", "doc_id", terms=["bad", "worse"])).sort_by("doc_id")
        assert t.column("n_terms_hit").to_pylist() == [2, 0, 2]
        assert t.column("flagged").to_pylist() == [True, False, True]
