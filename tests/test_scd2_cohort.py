"""SCD2 interval construction, user growth curve, cohort matrix."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest


def _ds(table: pa.Table):
    import ray.data as rd

    return rd.from_arrow(table)


def _ev(rows):
    """rows: (event_id, ts_iso, user, state)"""
    ids, tss, users, states = zip(*rows)
    return pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "ts": pc.cast(pa.array(tss), pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "state": pa.array(states, pa.string()),
    })


def test_scd2_collapses_runs_and_versions(ray_session):
    from datatest_ray.stages.seq import scd2_intervals

    t = _ev([
        (1, "2026-01-01T00:00:00", 1, "a"),
        (2, "2026-01-02T00:00:00", 1, "a"),   # same run
        (3, "2026-01-03T00:00:00", 1, "b"),   # new run
        (4, "2026-01-04T00:00:00", 1, "a"),   # back to a -> third run
        (5, "2026-01-01T00:00:00", 2, "x"),   # other key
    ])
    out = scd2_intervals(_ds(t), by="user_id", ts="ts", state_col="state",
                         id_col="event_id").to_pandas()
    u1 = out[out["user_id"] == 1].sort_values("version")
    assert list(u1["version"]) == [1, 2, 3]
    assert list(u1["value"]) == ["a", "b", "a"]
    assert list(u1["n_rows"]) == [2, 1, 1]
    # valid_to chains to the next run's valid_from; last is null
    assert list(u1["valid_to_us"])[:2] == list(u1["valid_from_us"])[1:]
    assert u1["valid_to_us"].isna().iloc[-1]
    u2 = out[out["user_id"] == 2]
    assert list(u2["version"]) == [1] and u2["valid_to_us"].isna().all()


def test_scd2_null_state_is_one_run(ray_session):
    from datatest_ray.stages.seq import scd2_intervals

    t = _ev([
        (1, "2026-01-01T00:00:00", 1, None),
        (2, "2026-01-02T00:00:00", 1, None),  # IS NOT DISTINCT -> same run
        (3, "2026-01-03T00:00:00", 1, "a"),
    ])
    out = scd2_intervals(_ds(t), by="user_id", ts="ts", state_col="state",
                         id_col="event_id").to_pandas().sort_values("version")
    assert list(out["n_rows"]) == [2, 1]
    assert out["value"].isna().iloc[0] and out["value"].iloc[1] == "a"


def test_user_growth_cumulative(ray_session):
    from datatest_ray.stages.temporal import user_growth_daily

    t = _ev([
        (1, "2026-01-01T05:00:00", 1, "a"),
        (2, "2026-01-02T05:00:00", 1, "a"),   # not new on day 2
        (3, "2026-01-02T05:00:00", 2, "a"),   # new on day 2
        (4, "2026-01-04T05:00:00", 3, "a"),   # new on day 4
    ])
    out = user_growth_daily(_ds(t), "ts", by="user_id").to_pandas()
    out = out.sort_values("day").reset_index(drop=True)
    assert list(out["n_new"]) == [1, 1, 1]
    assert list(out["n_cumulative"]) == [1, 2, 3]


def test_cohort_matrix_offsets(ray_session):
    from datatest_ray.stages.temporal import cohort_matrix

    t = _ev([
        (1, "2026-01-01T05:00:00", 1, "a"),   # u1 cohort d0
        (2, "2026-01-03T05:00:00", 1, "a"),   # u1 offset 2
        (3, "2026-01-03T06:00:00", 1, "a"),   # same (user, day): counted once
        (4, "2026-01-03T05:00:00", 2, "a"),   # u2 cohort d2
    ])
    out = cohort_matrix(_ds(t), "ts", by="user_id").to_pandas()
    rows = {(r.cohort_day - out["cohort_day"].min(), r.offset_days): r.n_users
            for r in out.itertuples()}
    assert rows[(0, 0)] == 1  # u1 at its cohort day
    assert rows[(0, 2)] == 1  # u1 two days later, deduped within day
    assert rows[(2, 0)] == 1  # u2's cohort day
    assert len(out) == 3


def test_funnel_steps_ordered_chain(ray_session):
    from datatest_ray.stages.sessions import funnel_steps

    rows = [
        # u1 full ordered chain
        (1, "2026-01-01T00:00:00", 1, "click"),
        (2, "2026-01-01T01:00:00", 1, "view"),
        (3, "2026-01-01T02:00:00", 1, "purchase"),
        # u2: purchase BEFORE view -> stops after step 2
        (4, "2026-01-01T00:00:00", 2, "click"),
        (5, "2026-01-01T02:00:00", 2, "view"),
        (6, "2026-01-01T01:00:00", 2, "purchase"),
        # u3: same-ts view (strict > excludes it) -> stops after step 1
        (7, "2026-01-01T00:00:00", 3, "click"),
        (8, "2026-01-01T00:00:00", 3, "view"),
        # u4: never clicks
        (9, "2026-01-01T00:00:00", 4, "view"),
    ]
    t = _ev([(i, ts, u, s) for i, ts, u, s in rows])
    out = funnel_steps(_ds(t), by="user_id", ts="ts", type_col="state",
                       steps=["click", "view", "purchase"]).to_pandas()
    got = dict(zip(out["step"], out["n_keys"]))
    assert got == {1: 3, 2: 2, 3: 1}


def test_xcorr_shifted_series(ray_session):
    from datatest_ray.stages.temporal import xcorr_daily

    rows = []
    eid = 0
    # type a counts 1..8 on days 1..8; type b = same counts one day later
    for d in range(1, 9):
        for _ in range(d):
            eid += 1
            rows.append((eid, f"2026-01-{d:02d}T01:00:00", 1, "a"))
        for _ in range(d):
            eid += 1
            rows.append((eid, f"2026-01-{d + 1:02d}T01:00:00", 1, "b"))
    t = _ev(rows)
    out = xcorr_daily(_ds(t), "ts", type_col="state", type_a="a",
                      type_b="b", max_lag=1).to_pandas()
    at = dict(zip(out["lag"], out["xcorr"]))
    nd = dict(zip(out["lag"], out["n_days"]))
    assert abs(at[1] - 1.0) < 1e-9   # b lags a by exactly one day
    # all 8 a-days have a b-day one later; only 7 align at lag 0
    assert nd[1] == 8 and nd[0] == 7


def test_groupagg_percentile_and_trend(ray_session):
    import numpy as np
    import ray.data as rd

    from datatest_ray.stages.base import RunContext
    from datatest_ray.stages.mapping import GroupAggCheck
    from datatest_ray.stages.temporal import trend_daily

    t = pa.table({
        "g": pa.array(["a"] * 100 + ["b"] * 100),
        "v": pa.array(list(range(100)) + list(range(100, 200)),
                      pa.float64()),
    })
    # p90(a) = 89.1, p90(b) = 189.1 -> only b violates max=100
    v = GroupAggCheck("v", "g", "p90", max=100.0).violations(
        rd.from_arrow(t), RunContext()).to_pandas()
    assert list(v["key"]) == ["b"]
    assert abs(v["value_num"][0] - np.quantile(
        np.arange(100.0, 200.0), 0.9)) < 1e-9

    # strictly rising daily counts -> S = n_pairs, tau = 1, sen > 0
    rows = []
    eid = 0
    for d in range(1, 7):
        for _ in range(d * 2):
            eid += 1
            rows.append((eid, f"2026-02-{d:02d}T01:00:00", 1, "x"))
    ev = _ev(rows)
    out = trend_daily(_ds(ev), "ts", by="state").to_pandas()
    assert out["mk_s"][0] == out["n_pairs"][0] == 15
    assert out["tau"][0] == 1.0 and out["sen_slope"][0] == 2.0


def test_periodogram_recovers_planted_weekly_cycle(ray_session):
    import numpy as np

    from datatest_ray.stages.drift import periodogram_daily

    from datetime import date, timedelta

    rows = []
    eid = 0
    # 56 days; volume 20 on day%7==0, else 4 -> strong period-7 cycle
    for d in range(56):
        n = 20 if d % 7 == 0 else 4
        iso = (date(2026, 1, 1) + timedelta(days=d)).isoformat()
        for _ in range(n):
            eid += 1
            rows.append((eid, f"{iso}T03:00:00", 1, "x"))
    ev = _ev(rows)
    out = periodogram_daily(_ds(ev), "ts", by="state").to_pandas()
    assert abs(out["dominant_period_days"][0] - 7.0) < 0.6
    assert out["peak_power_share"][0] > 0.3


def test_seasonal_anomaly_flags_broken_monday(ray_session):
    from datatest_ray.stages.drift import seasonal_anomaly_daily

    from datetime import date, timedelta

    rows = []
    eid = 0
    # 6 weeks of stable volume, then one exceptional final Monday
    for w in range(6):
        for d in range(7):
            iso = (date(2026, 1, 1)
                   + timedelta(days=w * 7 + d)).isoformat()
            n = 5 if d != 0 else 8
            if w == 5 and d == 0:
                n = 40  # the anomaly
            for _ in range(n):
                eid += 1
                rows.append((eid, f"{iso}T03:00:00", 1, "x"))
    ev = _ev(rows)
    out = seasonal_anomaly_daily(_ds(ev), "ts", by="state").to_pandas()
    flagged = out[out["anomaly"]]
    assert len(flagged) == 1
    assert flagged["n"].iloc[0] == 40


def test_pca_matches_numpy(ray_session):
    import numpy as np
    import ray.data as rd

    from datatest_ray.stages.similarity import pca_top_components

    rng = np.random.RandomState(9)
    # anisotropic 8-dim cloud with a dominant direction
    base = rng.normal(0, 1, size=(400, 8))
    base[:, 0] *= 5.0
    base[:, 1] *= 2.0
    rows32 = [list(map(float, r)) for r in base.astype(np.float32)]
    t = pa.table({"embedding": pa.array(rows32, pa.list_(pa.float32()))})
    out = pca_top_components(rd.from_arrow(t), vec_col="embedding",
                             k=3).to_pandas()
    cov = np.cov(base.astype(np.float32).astype(np.float64), rowvar=False)
    w = np.sort(np.linalg.eigvalsh(cov))[::-1]
    np.testing.assert_allclose(out["eigenvalue"], w[:3], rtol=1e-6)
    assert out["explained_share"][0] > 0.5


def test_qq_compare_shift(ray_session):
    import numpy as np
    import ray.data as rd

    from datatest_ray.stages.drift import qq_compare

    rng = np.random.RandomState(2)
    ref = rng.normal(0, 1, 2000)
    cmp_ = rng.normal(1.0, 1, 2000)  # shifted by +1
    t = pa.table({
        "side": pa.array(["r"] * 2000 + ["c"] * 2000),
        "v": pa.array(np.concatenate([ref, cmp_])),
    })
    out = qq_compare(rd.from_arrow(t), "v", split_col="side",
                     ref_value="r").to_pandas()
    assert len(out) == 9
    assert (out["diff"] > 0.7).all() and (out["diff"] < 1.3).all()
    med = out[out["q"] == 0.5]
    assert abs(med["ref_q"].iloc[0] - np.quantile(ref, 0.5)) < 1e-6
