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


def test_spacesaving_evicted_flag():
    from datatest_ray.functions.aggregates import SpaceSaving

    s = SpaceSaving(8)
    s.update(pa.array(np.arange(8)))
    assert not s.evicted  # k covers the domain: exact regime
    t = SpaceSaving(8)
    t.update(pa.array(np.arange(4, 12)))
    s.merge(t)
    assert s.evicted  # merged distinct 12 > 8: counts are bounds now


def test_spacesaving_capacity_sentinel_matches_sql(ray_session, tmp_path):
    """Past capacity BOTH the engine wrapper and the SQL oracle emit
    the identical self-describing sentinel row (round-4 ADVICE #1)."""
    import duckdb
    import pyarrow.parquet as pq

    from datatest_ray.pipelines.oracle3 import (
        SQL_HEAVY_HITTERS_GROUP,
        SQL_SPACESAVING_TOP_USERS,
        q_heavy_hitters_group,
        q_spacesaving_top_users,
    )

    rng = np.random.RandomState(0)
    n = 3000
    pq.write_table(pa.table({
        "user_id": pa.array(rng.randint(1, 1000, n).astype(np.int64)),
        "event_type": pa.array(
            ["hot"] * (n // 2)
            + list(rng.choice(["a", "b"], n - n // 2))),
    }), str(tmp_path / "events.parquet"))

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")

    eng = q_spacesaving_top_users(str(tmp_path)).to_pandas()
    ora = con.execute(SQL_SPACESAVING_TOP_USERS).fetchdf()
    assert len(eng) == 1 and eng["err"].iloc[0] == -1
    assert eng["user_id"].isna().all()
    assert len(ora) == 1 and int(ora["err"].iloc[0]) == -1
    assert int(eng["count_upper"].iloc[0]) == int(ora["count_upper"].iloc[0]) == 256

    eng_g = q_heavy_hitters_group(str(tmp_path)).to_pandas()
    ora_g = con.execute(SQL_HEAVY_HITTERS_GROUP).fetchdf()
    # every group here exceeds capacity 256 -> one sentinel per group
    for df in (eng_g, ora_g):
        assert (df["rank"] == -1).all() and (df["n"] == -1).all()
        assert df["user_id"].isna().all()
    assert sorted(eng_g["event_type"]) == sorted(ora_g["event_type"])


def test_spacesaving_exact_regime_unchanged(ray_session, tmp_path):
    """Below capacity the sentinel must NOT fire: wrappers and SQL
    still agree on the exact top-k."""
    import duckdb
    import pyarrow.parquet as pq

    from datatest_ray.pipelines.oracle3 import (
        SQL_SPACESAVING_TOP_USERS,
        q_spacesaving_top_users,
    )

    rng = np.random.RandomState(1)
    pq.write_table(pa.table({
        "user_id": pa.array(rng.randint(1, 40, 2000).astype(np.int64)),
        "event_type": pa.array(rng.choice(["a", "b"], 2000)),
    }), str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    eng = q_spacesaving_top_users(str(tmp_path)).to_pandas()
    ora = con.execute(SQL_SPACESAVING_TOP_USERS).fetchdf()
    assert (eng["err"] == 0).all() and len(eng) == 10
    assert list(eng["user_id"]) == list(ora["user_id"])
    assert list(eng["count_upper"]) == list(ora["count_upper"].astype(int))
