"""Batch 41: record-event counts, Bradley-Terry strengths (oracle
parity for records covered by test_oracle.py; BT parity vs an
independent reference below)."""

import numpy as np
import pyarrow as pa


def _ds(t: pa.Table):
    import ray.data as rd

    return rd.from_arrow(t)


class TestRecordCounts:
    def test_hand_case(self, ray_session):
        from datatest_ray.stages.winfunc import record_counts

        # user 1: 5, 3, 7, 7, 9 -> records at 7 (beats 5) and 9
        # user 2: 4 -> single row, no record
        t = pa.table({
            "u": pa.array([1, 1, 1, 1, 1, 2], pa.int64()),
            "ts": pa.array([np.datetime64(f"2024-01-0{d}", "us")
                            for d in (1, 2, 3, 4, 5, 1)],
                           pa.timestamp("us")),
            "v": pa.array([5.0, 3.0, 7.0, 7.0, 9.0, 4.0]),
            "id": pa.array(list(range(6)), pa.int64()),
        })
        out = record_counts(_ds(t), by="u", ts_col="ts", value_col="v",
                            id_col="id").to_pandas().set_index("u")
        assert out.loc[1, "n"] == 5 and out.loc[1, "n_records"] == 2
        assert out.loc[2, "n"] == 1 and out.loc[2, "n_records"] == 0

    def test_monotone_series_all_records(self, ray_session):
        from datatest_ray.stages.winfunc import record_counts

        n = 20
        t = pa.table({
            "u": pa.array([7] * n, pa.int64()),
            "ts": pa.array([np.datetime64("2024-01-01", "us")
                            + np.timedelta64(i, "h") for i in range(n)],
                           pa.timestamp("us")),
            "v": pa.array([float(i) for i in range(n)]),
            "id": pa.array(list(range(n)), pa.int64()),
        })
        out = record_counts(_ds(t), by="u", ts_col="ts", value_col="v",
                            id_col="id").to_pandas()
        assert out.iloc[0]["n_records"] == n - 1


def _bt_reference(pairs, iters=30):
    """Independent MM implementation over a win list."""
    ents = sorted({e for p in pairs for e in p})
    idx = {e: i for i, e in enumerate(ents)}
    m = len(ents)
    n = np.zeros((m, m))
    for w, l in pairs:
        n[idx[w], idx[l]] += 1
    wins = n.sum(axis=1)
    games = n + n.T
    p = np.ones(m)
    for _ in range(iters):
        denom = np.zeros(m)
        for i in range(m):
            for j in range(m):
                if i != j and games[i, j]:
                    denom[i] += games[i, j] / (p[i] + p[j])
        p = np.where(denom > 0, wins / denom, p)
        p = np.where(p <= 0, 1e-12, p)
        p = p / np.exp(np.mean(np.log(p)))
    return dict(zip(ents, p))


class TestBradleyTerry:
    def test_matches_reference_mm(self, ray_session):
        from datatest_ray.stages.graph import bradley_terry

        rng = np.random.RandomState(2)
        true = {1: 3.0, 2: 1.0, 3: 0.5, 4: 2.0}
        pairs = []
        ids = list(true)
        for _ in range(600):
            a, b = rng.choice(ids, 2, replace=False)
            pa_ = true[a] / (true[a] + true[b])
            if rng.rand() < pa_:
                pairs.append((a, b))
            else:
                pairs.append((b, a))
        t = pa.table({
            "winner": pa.array([p[0] for p in pairs], pa.int64()),
            "loser": pa.array([p[1] for p in pairs], pa.int64()),
        })
        out = bradley_terry(_ds(t), winner_col="winner",
                            loser_col="loser",
                            iters=30).to_pandas().set_index("entity")
        ref = _bt_reference(pairs, iters=30)
        for e, s in ref.items():
            assert abs(out.loc[e, "strength"] - s) < 1e-9
        # recovered ordering matches the true strengths
        got = out["strength"].sort_values(ascending=False).index.tolist()
        assert got == [1, 4, 2, 3]

    def test_undefeated_entity_ranks_top(self, ray_session):
        from datatest_ray.stages.graph import bradley_terry

        t = pa.table({
            "winner": pa.array([9, 9, 9, 5], pa.int64()),
            "loser": pa.array([5, 6, 5, 6], pa.int64()),
        })
        out = bradley_terry(_ds(t), winner_col="winner",
                            loser_col="loser").to_pandas()
        top = out.sort_values("strength",
                              ascending=False).iloc[0]["entity"]
        assert top == 9
