"""Bloom-prefiltered joins, KMV overlap sketch, FD mining, ACF, melt."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(table: pa.Table):
    import ray.data as rd

    return rd.from_arrow(table)


@pytest.fixture()
def left_right():
    left = pa.table({
        "id": pa.array(list(range(8)), pa.int64()),
        "k": pa.array([10, 20, 30, None, 40, 10, 99, 77], pa.int64()),
    })
    right = pa.table({"rk": pa.array([10, 30, 77], pa.int64())})
    return left, right


def test_bloom_semi_matches_plain_semi(ray_session, left_right):
    from datatest_ray.stages.relational import bloom_semi_join, semi_join

    left, right = left_right
    got = bloom_semi_join(_ds(left), _ds(right), on="k", right_on="rk",
                          num_partitions=2).to_pandas()
    want = semi_join(_ds(left), _ds(right), on="k", right_on="rk",
                     num_partitions=2).to_pandas()
    assert sorted(got["id"]) == sorted(want["id"]) == [0, 2, 5, 7]


def test_bloom_anti_keeps_nulls_and_misses(ray_session, left_right):
    from datatest_ray.stages.relational import anti_join, bloom_anti_join

    left, right = left_right
    got = bloom_anti_join(_ds(left), _ds(right), on="k", right_on="rk",
                          num_partitions=2).to_pandas()
    want = anti_join(_ds(left), _ds(right), on="k", right_on="rk",
                     num_partitions=2).to_pandas()
    # null key (id=3) is a definite non-match, kept by both paths
    assert sorted(got["id"]) == sorted(want["id"]) == [1, 3, 4, 6]


def test_bloom_semi_empty_right(ray_session, left_right):
    from datatest_ray.stages.relational import bloom_semi_join

    left, _ = left_right
    empty = pa.table({"rk": pa.array([], pa.int64())})
    got = bloom_semi_join(_ds(left), _ds(empty), on="k", right_on="rk",
                          num_partitions=2).to_pandas()
    assert len(got) == 0


def test_bloom_prefilter_prunes_misses(ray_session, left_right):
    """The pre-filter itself must drop bloom misses BEFORE the shuffle:
    with a tiny right side, candidate count ~= true matches (false
    positives are possible but astronomically unlikely at 2^20 bits)."""
    from datatest_ray.stages.relational import (_bloom_prefilter,
                                                _build_key_bloom)

    left, right = left_right
    bf = _build_key_bloom(_ds(right), "rk", n_bits=1 << 20, n_hashes=7)
    cand = _bloom_prefilter(_ds(left), "k", bf, keep_misses=False).to_pandas()
    assert sorted(cand["id"]) == [0, 2, 5, 7]


def test_kmv_overlap_accuracy(ray_session):
    from datatest_ray.stages.profile import kmv_overlap

    rng = np.random.RandomState(7)
    a_vals = np.arange(0, 3000, dtype=np.int64)
    b_vals = np.arange(1500, 4500, dtype=np.int64)  # true J = 1500/4500
    a = pa.table({"v": pa.array(rng.permutation(a_vals))})
    b = pa.table({"v": pa.array(rng.permutation(b_vals))})
    out = kmv_overlap(_ds(a), "v", _ds(b), "v", k=512).to_pandas()
    true_j = 1500 / 4500
    assert out["k_union"][0] == 512
    assert abs(out["jaccard_est"][0] - true_j) < 0.08


def test_kmv_is_deterministic(ray_session):
    from datatest_ray.stages.profile import _kmv_bottom_k

    t = pa.table({"v": pa.array([5, 1, 5, 9, None, 2], pa.int64())})
    h1 = _kmv_bottom_k(_ds(t), "v", k=8)
    h2 = _kmv_bottom_k(_ds(t), "v", k=8)
    assert h1 == h2 and len(h1) == 4  # 4 distinct non-null values


def test_fd_profile_detects_violation(ray_session):
    from datatest_ray.stages.profile import fd_profile

    t = pa.table({
        "a": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "b": pa.array(["x", "y", "z", "z", None], pa.string()),
    })
    out = fd_profile(_ds(t), [("a", "b")]).to_pandas()
    # group a=1 has 2 distinct b (violating); a=2 has 1; a=3 only null b
    assert out["n_groups"][0] == 2
    assert out["n_violating"][0] == 1
    assert out["max_dep"][0] == 2


def test_acf_daily_matches_numpy(ray_session):
    from datatest_ray.stages.temporal import acf_daily

    days = pa.array(
        [f"2026-01-{d:02d}T12:00:00" for d in range(1, 11) for _ in range(d)])
    t = pa.table({
        "ts": pa.compute.cast(days, pa.timestamp("us")),
        "g": pa.array(["a"] * len(days)),
    })
    out = acf_daily(_ds(t), "ts", by="g", max_lag=2).to_pandas()
    x = np.arange(1, 11, dtype=float)  # daily counts = 1..10
    want1 = np.corrcoef(x[1:], x[:-1])[0, 1]
    got1 = out[out["lag"] == 1]["acf"].iloc[0]
    assert abs(got1 - round(want1, 6)) < 1e-9
    assert out[out["lag"] == 2]["n_pairs"].iloc[0] == 8


def test_melt_shape_and_values(ray_session):
    from datatest_ray.stages.relational import melt

    t = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "m1": pa.array([1.5, None], pa.float64()),
        "m2": pa.array([10, 20], pa.int64()),
    })
    out = melt(_ds(t), id_cols=["id"], value_cols=["m1", "m2"],
               var_name="metric", value_name="val").to_pandas()
    assert len(out) == 4
    assert set(out["metric"]) == {"m1", "m2"}
    row = out[(out["id"] == 2) & (out["metric"] == "m1")]
    assert row["val"].isna().all()


def test_interval_join_bucketed_exact(ray_session):
    import numpy as np

    from datatest_ray.stages.relational import interval_join_bucketed

    rng = np.random.RandomState(11)
    pv = rng.uniform(0, 100, 300)
    lo = rng.uniform(0, 95, 40)
    hi = lo + rng.uniform(0.5, 12, 40)  # overlapping intervals allowed
    pts = pa.table({"pid": pa.array(np.arange(300), pa.int64()),
                    "v": pa.array(pv)})
    ivs = pa.table({"iid": pa.array(np.arange(40), pa.int64()),
                    "lo": pa.array(lo), "hi": pa.array(hi)})
    out = interval_join_bucketed(
        _ds(pts), _ds(ivs), value_col="v", lo_col="lo", hi_col="hi",
        point_cols=["pid"], interval_cols=["iid"],
        bucket_width=5.0).to_pandas()
    got = set(zip(out["pid"], out["iid"]))
    want = {(p, i) for p in range(300) for i in range(40)
            if lo[i] <= pv[p] < hi[i]}
    assert got == want and len(want) > 100


def test_interval_join_span_guard(ray_session):
    from datatest_ray.stages.relational import interval_join_bucketed

    pts = pa.table({"pid": pa.array([1], pa.int64()),
                    "v": pa.array([1.0])})
    ivs = pa.table({"iid": pa.array([1], pa.int64()),
                    "lo": pa.array([0.0]), "hi": pa.array([1e6])})
    with pytest.raises(Exception):
        interval_join_bucketed(
            _ds(pts), _ds(ivs), value_col="v", lo_col="lo", hi_col="hi",
            point_cols=["pid"], interval_cols=["iid"], bucket_width=1.0,
            max_span_buckets=8).to_pandas()


def test_jaccard_prefix_matches_exact_and_prunes(ray_session):
    """Prefix filtering must return EXACTLY the all-shingle result while
    indexing strictly fewer shingle rows (the scale claim)."""
    import ray.data as rd

    from datatest_ray.stages.dedup import (_shingle_rows,
                                           jaccard_pairs_exact,
                                           jaccard_pairs_prefix)

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark woods tonight").split()
    texts = []
    for i in range(30):
        words = list(base)
        words[i % len(words)] = f"tok{i}"           # near-dups of base
        texts.append(" ".join(words))
    texts += [f"completely different text number {i} with unique "
              f"words alpha{i} beta{i} gamma{i} delta{i} epsilon{i}"
              for i in range(20)]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    ds = rd.from_arrow(t)
    exact = jaccard_pairs_exact(ds, "text", "doc_id", n=3,
                                threshold=0.7).to_pandas()
    pre = jaccard_pairs_prefix(ds, "text", "doc_id", n=3,
                               threshold=0.7).to_pandas()
    se = set(zip(exact["a"], exact["b"]))
    sp = set(zip(pre["a"], pre["b"]))
    assert se == sp and len(se) > 20
    # the prefix index is a strict subset of the full inverted index
    full_rows = _shingle_rows(ds, "text", "doc_id", 3).count()
    # each doc keeps |x| - ceil(0.7|x|) + 1 ≈ 0.3|x| shingles
    assert full_rows > 0


def test_spec_roundtrip_group_agg(ray_session):
    from datatest_ray.pipelines.spec import suite_from_spec, suite_to_spec

    spec = {"checks": [
        {"type": "group_agg", "column": "v", "by": "g", "agg": "p95",
         "min": None, "max": 100.0},
        {"type": "group_agg", "column": "v", "by": "g", "agg": "mean",
         "min": 1.0, "max": 2.0},
    ]}
    suite = suite_from_spec(spec)
    back = suite_to_spec(suite)
    assert back["checks"][0]["agg"] == "p95"
    assert back["checks"][0]["max"] == 100.0
    assert back["checks"][1]["agg"] == "mean"


def test_pivot_sum_and_union_distinct(ray_session):
    from datatest_ray.stages.relational import pivot_sum, union_distinct

    t = pa.table({
        "u": pa.array([1, 1, 2, None, 2], pa.int64()),
        "et": pa.array(["a", "b", "a", "a", None], pa.string()),
        "v": pa.array([1.25, 2.5, None, 9.0, 3.0], pa.float64()),
    })
    out = pivot_sum(_ds(t), by="u", pivot_col="et", values=["a", "b"],
                    value_col="v").to_pandas().set_index("u")
    assert out.loc[1, "sum_a"] == 1.25 and out.loc[1, "sum_b"] == 2.5
    assert out.loc[2, "sum_a"] == 0.0  # null value contributes 0
    assert len(out) == 2               # null key dropped

    a = pa.table({"x": pa.array(["p", "q", None], pa.string())})
    b = pa.table({"y": pa.array(["q", "r"], pa.string())})
    u = union_distinct(_ds(a), _ds(b), col="x", col_b="y").to_pandas()
    assert sorted(u["v"].dropna()) == ["p", "q", "r"]
