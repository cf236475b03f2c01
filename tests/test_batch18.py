"""Batch 18: windowed rate-limit suppression, percent_rank window,
NFC normalization audit, OOV rate (oracle parity covered by
test_oracle.py for the SQL-paired entries)."""

import datetime as dt

import numpy as np
import pyarrow as pa


def _ds(t: pa.Table, blocks: int = 1):
    import ray.data as rd

    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def _ts(*minutes):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    return pa.array([base + dt.timedelta(minutes=m) for m in minutes],
                    pa.timestamp("us"))


class TestRateLimit:
    def test_suppresses_beyond_cap(self, ray_session):
        """u1 fires 3x in one hour window + 1x in the next: cap=1
        suppresses exactly the 2nd/3rd of the first window."""
        from datatest_ray.stages.sessions import rate_limit

        t = pa.table({
            "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "u": pa.array([7, 7, 7, 7, 9], pa.int64()),
            # 12:05, 12:10, 12:50, 13:05 for u7; 12:30 for u9
            "ts": _ts(5, 10, 50, 65, 30),
        })
        out = rate_limit(_ds(t, blocks=3), by="u", ts="ts", id_col="id",
                         window_s=3600, cap=1).take_all()
        got = sorted((r["id"], r["u"], r["rn"]) for r in out)
        assert got == [(2, 7, 2), (3, 7, 3)]

    def test_cap_two(self, ray_session):
        from datatest_ray.stages.sessions import rate_limit

        t = pa.table({
            "id": pa.array([1, 2, 3], pa.int64()),
            "u": pa.array([1, 1, 1], pa.int64()),
            "ts": _ts(1, 2, 3),
        })
        out = rate_limit(_ds(t), by="u", ts="ts", id_col="id",
                         window_s=3600, cap=2).take_all()
        assert [(r["id"], r["rn"]) for r in out] == [(3, 3)]

    def test_tie_breaks_on_id(self, ray_session):
        """Equal timestamps rank by id ascending — deterministic."""
        from datatest_ray.stages.sessions import rate_limit

        t = pa.table({
            "id": pa.array([42, 17], pa.int64()),
            "u": pa.array([1, 1], pa.int64()),
            "ts": _ts(0, 0),
        })
        out = rate_limit(_ds(t), by="u", ts="ts", id_col="id",
                         window_s=3600, cap=1).take_all()
        assert [(r["id"], r["rn"]) for r in out] == [(42, 2)]


class TestPercentRank:
    def test_matches_sql_definition(self, ray_session):
        """(rank-1)/(n-1), tie-aware: values [10,20,20,30] in one key
        -> pct [0, 1/3, 1/3, 1]; singleton key -> 0.0."""
        from datatest_ray.stages.winfunc import percent_rank

        t = pa.table({
            "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "k": ["a", "a", "a", "a", "b"],
            "v": pa.array([10.0, 20.0, 20.0, 30.0, 99.0]),
        })
        out = percent_rank(_ds(t, blocks=2), by="k", value_col="v",
                           id_col="id").take_all()
        got = {r["id"]: r["pct"] for r in out}
        assert got[1] == 0.0
        assert abs(got[2] - 1 / 3) < 1e-12 and abs(got[3] - 1 / 3) < 1e-12
        assert got[4] == 1.0
        assert got[5] == 0.0

    def test_cross_block_key(self, ray_session):
        """A key split across input blocks still ranks globally."""
        from datatest_ray.stages.winfunc import percent_rank

        n = 101
        t = pa.table({
            "id": pa.array(np.arange(n), pa.int64()),
            "k": ["x"] * n,
            "v": pa.array(np.arange(n)[::-1].astype(np.float64)),
        })
        out = percent_rank(_ds(t, blocks=5), by="k", value_col="v",
                           id_col="id").take_all()
        got = {r["id"]: r["pct"] for r in out}
        # id 0 has the LARGEST v -> pct 1.0; id n-1 the smallest -> 0.0
        assert got[0] == 1.0 and got[n - 1] == 0.0
        assert abs(got[50] - 0.5) < 1e-12


class TestNfcAndOov:
    def test_nfc_audit_flags_only_injected(self, ray_session):
        from datatest_ray.pipelines.oracle18 import q_nfc_audit_docs

        out = q_nfc_audit_docs("/root/testdata/sf0.001")
        ids = out.column("doc_id").to_pylist()
        assert len(ids) > 0
        assert all(i >= 2_000_000 for i in ids)
        # NFC composes 'e'+combining-acute -> one char shorter
        raw = out.column("len_raw").to_pylist()
        nfc = out.column("len_nfc").to_pylist()
        assert all(r - 1 == c for r, c in zip(raw, nfc))

    def test_oov_counts_bounded(self, ray_session):
        from datatest_ray.pipelines.oracle18 import q_oov_rate_docs

        out = q_oov_rate_docs("/root/testdata/sf0.001")
        n = np.array(out.column("n_tokens").to_pylist())
        o = np.array(out.column("n_oov").to_pylist())
        assert (n > 0).all() and (o >= 0).all() and (o <= n).all()
        # top-10 vocab over a ~31-word corpus: some tokens in, some out
        assert o.sum() > 0 and (n - o).sum() > 0
