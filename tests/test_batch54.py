"""Batch 54: variance-of-Laplacian blur audit, aspect-ratio bucket
plan, Matryoshka truncation recall, reciprocal-rank fusion
(matryoshka/rrf oracle parity covered by test_oracle.py)."""

import numpy as np
import pyarrow as pa


def _ds(t: pa.Table, n_parts=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n_parts)


class TestBlurAudit:
    def test_scores_match_brute_force(self, ray_session):
        from datatest_ray.functions.png import decode_image
        from datatest_ray.sources.images import (ImageFixtureSpec,
                                                 generate_dataset)
        from datatest_ray.stages.imaging import (BlurScoreExtractor,
                                                 blur_scores)

        spec = ImageFixtureSpec(n_rows=200, seed=42, rows_per_part=50)
        ds = generate_dataset(spec, columns={"image_id", "bytes", "fmt"})
        got = {r["image_id"]: r["var_lap"]
               for r in blur_scores(ds, concurrency=2).take_all()}
        # brute-force reference over the same fixture
        ref = generate_dataset(spec, columns={"image_id", "bytes", "fmt"})
        n_checked = 0
        for row in ref.take_all():
            try:
                img = decode_image(row["bytes"], row["fmt"])
            except Exception:
                assert got[row["image_id"]] is None
                continue
            expect = BlurScoreExtractor.var_laplacian(img)
            assert abs(got[row["image_id"]] - expect) < 1e-9
            n_checked += 1
        assert n_checked > 150

    def test_flat_image_scores_zero(self):
        from datatest_ray.stages.imaging import BlurScoreExtractor

        flat = np.full((16, 16, 3), 128, dtype=np.uint8)
        assert BlurScoreExtractor.var_laplacian(flat) == 0.0
        noisy = (np.arange(256).reshape(16, 16) ** 2 % 255).astype(
            np.uint8)
        assert BlurScoreExtractor.var_laplacian(noisy) > 0.0


class TestAspectBucketPlan:
    def test_assignment_and_scale(self, ray_session):
        from datatest_ray.stages.transforms import aspect_bucket_plan

        t = pa.table({
            "w": pa.array([100, 400, 300, 1600, 90], pa.int32()),
            "h": pa.array([100, 300, 400, 900, 1600], pa.int32()),
        })
        out = {r["bucket"]: r for r in aspect_bucket_plan(
            _ds(t), target_area=1024 * 1024).take_all()}
        assert out["1:1"]["n_images"] == 1
        assert out["4:3"]["n_images"] == 1
        assert out["3:4"]["n_images"] == 1
        assert out["16:9"]["n_images"] == 1
        assert out["9:16"]["n_images"] == 1
        # 100x100 image upscales by 1024/100
        assert abs(out["1:1"]["mean_scale"] - 10.24) < 1e-6
        assert out["1:1"]["n_upscale"] == 1

    def test_invalid_dims_dropped(self, ray_session):
        from datatest_ray.stages.transforms import aspect_bucket_plan

        t = pa.table({
            "w": pa.array([0, -5, None, 64], pa.int32()),
            "h": pa.array([10, 10, 10, 64], pa.int32()),
        })
        out = aspect_bucket_plan(_ds(t, 1),
                                 target_area=64 * 64).take_all()
        assert len(out) == 1
        assert out[0]["bucket"] == "1:1"
        assert out[0]["n_images"] == 1
        assert out[0]["mean_scale"] == 1.0


class TestMatryoshkaRecall:
    def test_full_prefix_recall_is_one(self, ray_session):
        from datatest_ray.stages.similarity import matryoshka_recall

        rng = np.random.RandomState(4)
        vecs = rng.normal(0, 1, (60, 16)).astype(np.float32)
        t = pa.table({
            "vec_id": pa.array(range(60), pa.int64()),
            "embedding": pa.array(list(vecs),
                                  pa.list_(pa.float32())),
        })
        out = {r["dim"]: r for r in matryoshka_recall(
            _ds(t), id_col="vec_id", vec_col="embedding",
            dims=(2, 16), k=5, n_queries=8).take_all()}
        assert out[16]["recall"] == 1.0        # full prefix = identity
        assert out[16]["n_queries"] == 8
        assert out[2]["recall"] <= 1.0         # heavy truncation degrades
        assert out[2]["overlap"] == round(out[2]["recall"] * 40)


class TestRrfFuse:
    def test_known_fusion(self, ray_session):
        from datatest_ray.stages.mlprep import rrf_fuse

        t = pa.table({
            "k": pa.array([1, 2, 3], pa.int64()),
            "a": pa.array([30, 20, 10], pa.int64()),   # ranks 1,2,3
            "b": pa.array([5, 50, 40], pa.int64()),    # ranks 3,1,2
        })
        out = rrf_fuse(_ds(t, 1), key_col="k", score_cols=["a", "b"],
                       c=60, top_k=3).take_all()
        by_key = {r["k"]: r for r in out}
        assert by_key[1]["rank_a"] == 1 and by_key[1]["rank_b"] == 3
        assert by_key[2]["rank_a"] == 2 and by_key[2]["rank_b"] == 1
        exp2 = 1 / 62 + 1 / 61
        assert abs(by_key[2]["rrf"] - exp2) < 1e-6
        # fused order: key2 (1/62+1/61) > key1 (1/61+1/63) > key3
        assert [r["k"] for r in out] == [2, 1, 3]

    def test_tied_scores_break_by_key(self, ray_session):
        from datatest_ray.stages.mlprep import rrf_fuse

        t = pa.table({
            "k": pa.array([7, 3], pa.int64()),
            "a": pa.array([10, 10], pa.int64()),
        })
        out = rrf_fuse(_ds(t, 1), key_col="k", score_cols=["a"],
                       c=60, top_k=2).take_all()
        assert out[0]["k"] == 3 and out[0]["rank_a"] == 1
        assert out[1]["k"] == 7 and out[1]["rank_a"] == 2
