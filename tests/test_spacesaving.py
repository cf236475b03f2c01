"""SpaceSaving mergeable top-k summary + null-share drift."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def test_spacesaving_exact_when_k_covers_domain():
    from datatest_ray.functions.aggregates import SpaceSaving

    ss = SpaceSaving(16)
    ss.update(pa.array([1, 1, 1, 2, 2, 3], pa.int64()))
    ss.update(pa.array([1, 3, 3, 3], pa.int64()))
    top = ss.topk(3)
    assert top == [(1, 4, 0), (3, 4, 0), (2, 2, 0)]


def test_spacesaving_bounds_hold_under_truncation():
    """Zipf-ish stream split across 8 'blocks': every true count must
    lie within [upper - err, upper], and the true top-3 must appear in
    the merged top-k."""
    from datatest_ray.functions.aggregates import SpaceSaving

    rng = np.random.RandomState(0)
    # heavy hitters 0,1,2 plus a long tail
    vals = np.concatenate([
        np.zeros(4000, np.int64), np.ones(2500, np.int64),
        np.full(1500, 2, np.int64),
        rng.randint(3, 400, size=3000),
    ])
    rng.shuffle(vals)
    true = {v: int((vals == v).sum()) for v in range(3)}
    merged = SpaceSaving(32)
    for chunk in np.array_split(vals, 8):
        part = SpaceSaving(32)
        part.update(pa.array(chunk))
        merged.merge(part)
    got = {v: (c, e) for v, c, e in merged.topk(32)}
    for v in range(3):
        c, e = got[v]
        assert c - e <= true[v] <= c, (v, c, e, true[v])
    top3 = [v for v, _c, _e in merged.topk(3)]
    assert set(top3) == {0, 1, 2}


def test_spacesaving_merge_is_commutative_on_topk():
    from datatest_ray.functions.aggregates import SpaceSaving

    a_vals = pa.array([1] * 10 + [2] * 5 + list(range(10, 40)), pa.int64())
    b_vals = pa.array([1] * 3 + [3] * 8 + list(range(40, 70)), pa.int64())
    ab = SpaceSaving(16).update(a_vals).merge(SpaceSaving(16).update(b_vals))
    ba = SpaceSaving(16).update(b_vals).merge(SpaceSaving(16).update(a_vals))
    assert ab.topk(3) == ba.topk(3)


def test_null_share_daily(ray_session):
    import ray.data as rd

    from datatest_ray.stages.profile import null_share_daily

    t = pa.table({
        "ts": pc.cast(pa.array([
            "2026-01-01T01:00:00", "2026-01-01T02:00:00",
            "2026-01-02T01:00:00", "2026-01-02T02:00:00",
            "2026-01-02T03:00:00",
        ]), pa.timestamp("us")),
        "x": pa.array([None, 1.0, None, None, 5.0], pa.float64()),
    })
    out = null_share_daily(rd.from_arrow(t), "ts", ["x"]).to_pandas()
    out = out.sort_values("day").reset_index(drop=True)
    assert list(out["n_rows"]) == [2, 3]
    assert list(out["n_null"]) == [1, 2]
    assert abs(out["null_share"][1] - 2 / 3) < 1e-12


def test_grouped_tdigest_close_to_exact(ray_session):
    import ray.data as rd

    from datatest_ray.functions.aggregates import TDigestQuantile

    rng = np.random.RandomState(3)
    g = np.repeat(["a", "b"], 5000)
    v = np.concatenate([rng.lognormal(3, 1, 5000), rng.normal(50, 5, 5000)])
    ds = rd.from_arrow(pa.table({"g": pa.array(g), "v": pa.array(v)}))
    got = ds.groupby("g").aggregate(
        TDigestQuantile(on="v", q=0.5, alias_name="p50")).to_pandas()
    for key in ("a", "b"):
        exact = np.quantile(v[g == key], 0.5)
        est = got[got["g"] == key]["p50"].iloc[0]
        assert abs(est - exact) / exact < 0.02, (key, est, exact)


def test_l_diversity_histogram(ray_session):
    import ray.data as rd

    from datatest_ray.stages.mlprep import l_diversity

    t = pa.table({
        "q1": pa.array(["a", "a", "a", "b", "b", "c"], pa.string()),
        "s": pa.array([1, 1, 2, 3, None, None], pa.int64()),
    })
    out = l_diversity(rd.from_arrow(t), qi_cols=["q1"],
                      sensitive_col="s").to_pandas()
    # group a: {1,2} -> l=2; group b: {3} -> l=1; group c: all-null -> gone
    hist = dict(zip(out["l"], out["n_groups"]))
    assert hist == {2: 1, 1: 1}


def test_mahalanobis_matches_numpy(ray_session):
    import ray.data as rd

    from datatest_ray.stages.robust import mahalanobis_outliers

    rng = np.random.RandomState(5)
    X = rng.multivariate_normal([0, 0], [[1, 0.8], [0.8, 1]], size=500)
    X[7] = [4.0, -4.0]   # jointly implausible, univariately mild
    t = pa.table({
        "id": pa.array(np.arange(500), pa.int64()),
        "x": pa.array(X[:, 0]),
        "y": pa.array(X[:, 1]),
    })
    out = mahalanobis_outliers(rd.from_arrow(t), cols=["x", "y"],
                               id_col="id", top=5)
    out = out if not hasattr(out, "to_pandas") or isinstance(out, pa.Table) \
        else out
    import ray.data
    if isinstance(out, ray.data.Dataset):
        out = out.to_pandas()
    else:
        out = out.to_pandas()
    mu = X.mean(axis=0)
    VI = np.linalg.inv(np.cov(X, rowvar=False))
    d = X - mu
    d2 = np.einsum("ij,jk,ik->i", d, VI, d)
    want_top = np.argsort(-d2)[:5]
    assert out["id"].iloc[0] == 7
    assert set(out["id"]) == set(want_top)
    np.testing.assert_allclose(
        np.sort(out["d2"].to_numpy())[::-1], np.sort(d2[want_top])[::-1],
        rtol=1e-9)
