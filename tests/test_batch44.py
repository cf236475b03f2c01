"""Batch 44: consistent-hash sharding and trailing-window distinct
type counts (oracle parity covered by test_oracle.py)."""

import numpy as np
import pyarrow as pa


def _ds(t: pa.Table):
    import ray.data as rd

    return rd.from_arrow(t)


class TestConsistentShards:
    def test_minimal_disruption(self, ray_session):
        from datatest_ray.stages.alloc import consistent_hash_shards

        t = pa.table({"id": pa.array(list(range(2000)), pa.int64())})
        out = pa.concat_tables(list(consistent_hash_shards(
            _ds(t), id_col="id").iter_batches(
            batch_format="pyarrow"))).to_pandas()
        assert out["n_docs"].sum() == 2000
        moved = out["n_moved"].sum()
        # adding shard 5 of 5 should move roughly 1/5 of rows; mod-N
        # rehash would move ~4/5.  generous band: [5%, 45%]
        assert 0.05 < moved / 2000 < 0.45
        # every shard holds something and none lost more than it had
        assert (out["n_docs"] > 0).all()
        assert (out["n_moved"] <= out["n_docs"]).all()

    def test_same_ring_means_no_moves(self, ray_session):
        from datatest_ray.stages.alloc import consistent_hash_shards

        t = pa.table({"id": pa.array(list(range(300)), pa.int64())})
        out = pa.concat_tables(list(consistent_hash_shards(
            _ds(t), id_col="id", n_shards_a=4,
            n_shards_b=4).iter_batches(
            batch_format="pyarrow"))).to_pandas()
        assert out["n_moved"].sum() == 0


class TestTrailingDistinct:
    def test_hand_case(self, ray_session):
        from datatest_ray.stages.winfunc import trailing_distinct

        base = np.datetime64("2024-01-01T00:00:00", "us")
        m = np.timedelta64(60_000_000, "us")  # one minute
        # user 1 (1h window): A@0 -> {A}; B@30 -> {A,B};
        # A@70 -> (10,70] = {B,A}; C@200 -> (140,200] = {C} alone
        t = pa.table({
            "u": pa.array([1, 1, 1, 1], pa.int64()),
            "ts": pa.array([base, base + 30 * m, base + 70 * m,
                            base + 200 * m], pa.timestamp("us")),
            "typ": pa.array(["A", "B", "A", "C"]),
            "id": pa.array([0, 1, 2, 3], pa.int64()),
        })
        out = trailing_distinct(
            _ds(t), by="u", ts_col="ts", type_col="typ", id_col="id",
            window_us=3_600_000_000).to_pandas().set_index("id")
        assert out.loc[0, "n_types"] == 1
        assert out.loc[1, "n_types"] == 2
        assert out.loc[2, "n_types"] == 2
        assert out.loc[3, "n_types"] == 1

    def test_equal_timestamps_all_count(self, ray_session):
        from datatest_ray.stages.winfunc import trailing_distinct

        base = np.datetime64("2024-01-01T00:00:00", "us")
        t = pa.table({
            "u": pa.array([7, 7, 7], pa.int64()),
            "ts": pa.array([base, base, base], pa.timestamp("us")),
            "typ": pa.array(["A", "B", "C"]),
            "id": pa.array([0, 1, 2], pa.int64()),
        })
        out = trailing_distinct(
            _ds(t), by="u", ts_col="ts", type_col="typ", id_col="id",
        ).to_pandas()
        assert (out["n_types"] == 3).all()

    def test_matches_bruteforce(self, ray_session):
        from datatest_ray.stages.winfunc import trailing_distinct

        rng = np.random.default_rng(3)
        n = 400
        base = np.datetime64("2024-01-01T00:00:00", "us")
        us = rng.integers(0, 8, n)
        off = rng.integers(0, 7_200_000_000, n)
        typ = rng.choice(list("ABCDE"), n)
        t = pa.table({
            "u": pa.array(us, pa.int64()),
            "ts": pa.array([base + np.timedelta64(int(o), "us")
                            for o in off], pa.timestamp("us")),
            "typ": pa.array(typ),
            "id": pa.array(list(range(n)), pa.int64()),
        })
        out = trailing_distinct(
            _ds(t), by="u", ts_col="ts", type_col="typ", id_col="id",
        ).to_pandas().set_index("id")["n_types"]
        W = 3_600_000_000
        for i in range(0, n, 37):
            ref = len({typ[j] for j in range(n)
                       if us[j] == us[i]
                       and off[i] - W < off[j] <= off[i]})
            assert out.loc[i] == ref, i
