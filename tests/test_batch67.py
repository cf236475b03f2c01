"""Batch 67: RFM segmentation, Weiszfeld geometric median, greedy
k-center coreset (rfm oracle parity covered by test_oracle.py)."""

import datetime

import numpy as np
import pyarrow as pa


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestRfmSegments:
    def test_extreme_users_land_in_corners(self, ray_session):
        from datatest_ray.stages.mlprep import rfm_segments

        day0 = datetime.datetime(2024, 1, 1)
        rows = []
        # users 0..9: one old cheap event each (dormant, low F/M)
        for u in range(10):
            rows.append((u, day0, 1.0))
        # users 10..19: many recent expensive events
        for u in range(10, 20):
            for j in range(20):
                rows.append((u, day0 + datetime.timedelta(days=30),
                             50.0))
        t = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        })
        out = rfm_segments(_ds(t), id_col="user_id", ts_col="ts",
                           value_col="value", k=5).take_all()
        cells = {(r["r_q"], r["f_q"], r["m_q"]): r["n_users"]
                 for r in out}
        assert sum(cells.values()) == 20
        # dormant cheap users: worst recency (high days-since ->
        # highest r_q), lowest f/m
        assert any(rq >= 4 and fq <= 2 and mq <= 2
                   for (rq, fq, mq) in cells)
        # whale users: best recency, top f/m
        assert any(rq <= 2 and fq >= 4 and mq >= 4
                   for (rq, fq, mq) in cells)


class TestGeometricMedian:
    def test_matches_brute_force_weiszfeld(self, ray_session):
        from datatest_ray.stages.similarity import (
            geometric_median_labels)

        rng = np.random.RandomState(0)
        vecs = rng.normal(0, 1, (120, 6)).astype(np.float32)
        labels = np.array([0] * 60 + [1] * 60, dtype=np.int32)
        t = pa.table({
            "embedding": pa.array([list(v) for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        })
        out = {r["label"]: r for r in geometric_median_labels(
            _ds(t, 3), vec_col="embedding", label_col="label",
            n_iter=8).take_all()}

        # brute-force Weiszfeld on label 0
        x = vecs[labels == 0].astype(np.float64)
        est = x.mean(axis=0)
        for _ in range(8):
            d = np.maximum(np.sqrt(((x - est) ** 2).sum(axis=1)),
                           1e-12)
            w = 1.0 / d
            est = (x * w[:, None]).sum(axis=0) / w.sum()
        md = np.sqrt(((x - est) ** 2).sum(axis=1)).mean()
        shift = np.sqrt(((est - x.mean(axis=0)) ** 2).sum()) / md
        assert out[0]["n"] == 60
        assert abs(out[0]["mean_dist"] - md) < 1e-6
        assert abs(out[0]["shift"] - shift) < 1e-6

    def test_outliers_move_mean_more_than_median(self, ray_session):
        from datatest_ray.stages.similarity import (
            geometric_median_labels)

        rng = np.random.RandomState(1)
        clean = rng.normal(0, 0.1, (50, 4))
        corrupt = np.full((5, 4), 30.0)
        vecs = np.vstack([clean, corrupt]).astype(np.float32)
        t = pa.table({
            "embedding": pa.array([list(v) for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array([0] * 55, pa.int32()),
        })
        out = geometric_median_labels(
            _ds(t), vec_col="embedding", label_col="label",
            n_iter=12).take_all()[0]
        # 9% contamination at distance ~60: the mean moves ~5 units
        # off but the geometric median stays near the clean cluster,
        # so the normalized displacement is large
        assert out["shift"] > 0.3


class TestKCenterGreedy:
    def test_matches_brute_force(self, ray_session):
        from datatest_ray.stages.similarity import kcenter_greedy

        rng = np.random.RandomState(4)
        vecs = rng.normal(0, 1, (80, 5)).astype(np.float32)
        t = pa.table({
            "vec_id": pa.array(range(80), pa.int64()),
            "embedding": pa.array([list(v) for v in vecs],
                                  pa.list_(pa.float32())),
        })
        out = kcenter_greedy(_ds(t, 4), id_col="vec_id",
                             vec_col="embedding", k=5).take_all()
        # brute force farthest-first from id 0
        x = vecs.astype(np.float64)
        chosen = [0]
        for _ in range(4):
            d = np.min(np.sqrt((
                (x[:, None, :] - x[chosen][None, :, :]) ** 2
            ).sum(axis=2)), axis=1)
            order = np.lexsort((np.arange(80), -d))
            chosen.append(int(order[0]))
        assert [r["vec_id"] for r in out] == chosen
        # covering distances decrease monotonically after the seed
        dists = [r["dist"] for r in out][1:]
        assert all(dists[i] >= dists[i + 1] - 1e-9
                   for i in range(len(dists) - 1))
