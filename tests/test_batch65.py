"""Batch 65: TwoNN intrinsic dimension, tile-uniformity imaging audit
(twonn oracle parity covered by test_oracle.py)."""

import numpy as np
import pyarrow as pa


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestTwoNN:
    def _run(self, vecs, n_queries=30):
        from datatest_ray.stages.similarity import twonn_intrinsic_dim

        t = pa.table({
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([list(v) for v in vecs],
                                  pa.list_(pa.float32())),
        })
        return twonn_intrinsic_dim(
            _ds(t), id_col="vec_id", vec_col="embedding",
            n_queries=n_queries).take_all()[0]

    def test_low_dim_manifold_scores_lower(self, ray_session):
        rng = np.random.RandomState(0)
        # 2-d manifold embedded in 16-d vs full-rank 16-d cloud
        base2 = rng.normal(0, 1, (300, 2))
        lift = rng.normal(0, 1, (2, 16))
        low = (base2 @ lift + rng.normal(0, 1e-3, (300, 16))).astype(
            np.float32)
        high = rng.normal(0, 1, (300, 16)).astype(np.float32)
        id_low = self._run(low)["id_mle"]
        id_high = self._run(high)["id_mle"]
        assert id_low is not None and id_high is not None
        assert id_low < id_high

    def test_duplicate_queries_dropped(self, ray_session):
        rng = np.random.RandomState(1)
        vecs = rng.normal(0, 1, (40, 8)).astype(np.float32)
        vecs[1] = vecs[0]  # exact dup: d1 = 0 for both -> dropped
        out = self._run(list(vecs), n_queries=10)
        assert out["n_used"] <= 8


class TestTileUniformity:
    def test_split_frame_flagged_flat_not(self):
        from datatest_ray.stages.imaging import TileStatsExtractor

        flat = np.full((64, 64), 100, dtype=np.uint8)
        assert TileStatsExtractor.tile_nonuniformity(flat, 4) == 0.0
        # left half dark / right half bright: tile means capture all
        # the variance
        split = np.zeros((64, 64), dtype=np.uint8)
        split[:, 32:] = 200
        score = TileStatsExtractor.tile_nonuniformity(split, 4)
        assert score > 0.9
        # fine checkerboard: huge pixel variance, uniform tile means
        checker = np.indices((64, 64)).sum(axis=0) % 2 * 200
        assert TileStatsExtractor.tile_nonuniformity(
            checker.astype(np.uint8), 4) < 0.01

    def test_audit_over_fixture(self, ray_session):
        from datatest_ray.sources.images import (ImageFixtureSpec,
                                                 generate_dataset)
        from datatest_ray.stages.imaging import tile_uniformity_audit

        spec = ImageFixtureSpec(n_rows=200, seed=42, rows_per_part=50)
        ds = generate_dataset(spec, columns={"image_id", "bytes", "fmt"})
        out = tile_uniformity_audit(ds, concurrency=2).take_all()
        assert sum(r["n_images"] for r in out) == 200
        for r in out:
            assert r["n_nonuniform"] <= r["n_images"]
