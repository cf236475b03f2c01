"""Multimodal transform stages: resize / feature-extract / frame-sample
actor pools over binary payload columns (stages/transforms.py)."""

import numpy as np
import pyarrow as pa
import pytest


def _image_ds(n=64):
    import ray.data as rd

    from datatest_ray.sources.images import ImageFixtureSpec, generate_batch

    spec = ImageFixtureSpec(
        n_rows=n, rows_per_part=n, p_dup_id=0, p_corrupt=0.05, p_lossy_bad=0,
        p_oob_w=0, p_null_w=0, p_bad_fmt=0, p_bad_cap=0, p_phash_dup=0.15,
        drift_last_partition=False,
    )
    return rd.from_arrow(generate_batch(np.arange(n), spec))


def test_resize_images(ray_session):
    from datatest_ray import resize_images
    from datatest_ray.functions.png import png_decode

    out = resize_images(_image_ds(), 16, 16, concurrency=2).to_pandas()
    assert len(out) == 64
    decoded = [png_decode(b) for b in out["bytes"] if b is not None]
    assert decoded and all(d.shape == (16, 16) for d in decoded)
    # corrupted payloads pass through as nulls with w=h=0
    assert (out["w"] == 0).sum() == out["bytes"].isna().sum()


def test_feature_extraction_feeds_similarity(ray_session):
    """Composition: decode -> 66-dim embedding -> embedding-cosine
    near-dup finds the injected near-duplicate images."""
    from datatest_ray import extract_image_features
    from datatest_ray.stages.similarity import neardup_cosine_pairs

    ds = _image_ds(64)
    feats = extract_image_features(ds, concurrency=2)
    t = pa.concat_tables(feats.iter_batches(batch_format="pyarrow"))
    assert t.column("embedding").type.value_type == pa.float32()
    assert len(t.column("embedding")[0].as_py()) == 66

    pairs = neardup_cosine_pairs(
        feats, id_col="image_id", vec_col="embedding", threshold=0.995
    ).to_pandas()
    # injected jittered copies are near-identical in block-mean space
    assert len(pairs) > 0
    # spot-verify one pair by recomputing cosine from the table
    emb = {i: np.array(v, dtype=np.float64)
           for i, v in zip(t.column("image_id").to_pylist(),
                           t.column("embedding").to_pylist())}
    a, b = pairs.iloc[0]["a"], pairs.iloc[0]["b"]
    va, vb = emb[a], emb[b]
    cos = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
    assert cos >= 0.995 - 1e-6


def test_frame_sampler_fake_and_stub(ray_session):
    import ray.data as rd

    from datatest_ray import sample_frames
    from datatest_ray.stages.transforms import FrameSampler

    ds = rd.from_arrow(pa.table({
        "video_id": ["v0", "v1"],
        "bytes": pa.array([b"x" * 100, b"y" * 257], pa.binary()),
    }))
    out = sample_frames(ds, n_frames=4, fake=True, concurrency=2).to_pandas()
    assert len(out) == 8  # 2 clips x 4 frames
    assert set(out["video_id"]) == {"v0", "v1"}
    assert out["frame_idx"].between(0, 15).all()

    # unknown container magics: skipped by default (graceful), an
    # explicit stub under on_unsupported="raise"
    out = FrameSampler(fake=False)(pa.table({
        "video_id": ["v"], "bytes": pa.array([b"zz"], pa.binary()),
    }))
    assert out.num_rows == 0
    with pytest.raises(NotImplementedError):
        FrameSampler(fake=False, on_unsupported="raise")(pa.table({
            "video_id": ["v"], "bytes": pa.array([b"zz"], pa.binary()),
        }))


def test_frame_sampler_real_gvc_decode(ray_session):
    import ray.data as rd

    from datatest_ray import sample_frames
    from datatest_ray.functions.av import decode_video, synthetic_clip
    from datatest_ray.functions.png import png_decode

    clips = {f"v{i}": synthetic_clip(seed=i, n_frames=16, w=16, h=16)
             for i in range(3)}
    ds = rd.from_arrow(pa.table({
        "video_id": list(clips),
        "bytes": pa.array(list(clips.values()), pa.binary()),
    }))
    out = sample_frames(ds, n_frames=4, concurrency=2).to_pandas()
    assert len(out) == 12  # 3 clips x 4 frames
    # evenly spaced over 16 frames: linspace(0, 15, 4) -> 0, 5, 10, 15
    assert sorted(out[out.video_id == "v0"]["frame_idx"]) == [0, 5, 10, 15]
    # sampled frame bytes decode back to the exact source frame
    row = out[(out.video_id == "v1") & (out.frame_idx == 5)].iloc[0]
    src = decode_video(clips["v1"])[5]
    assert (png_decode(row["bytes"]) == src).all()


def test_audio_features_fake_and_stub(ray_session):
    import ray.data as rd

    from datatest_ray import extract_audio_features
    from datatest_ray.stages.transforms import AudioFeatureExtractor

    ds = rd.from_arrow(pa.table({
        "audio_id": ["a0", "a1"],
        "bytes": pa.array([b"x" * 100, b"y" * 5000], pa.binary()),
    }))
    out = extract_audio_features(ds, n_windows=8, fake=True,
                                 concurrency=2).to_pandas()
    assert len(out) == 2
    assert set(out["audio_id"]) == {"a0", "a1"}
    assert (out["duration_s"] > 0).all()
    assert all(len(r) == 8 for r in out["rms"])
    # deterministic fake: same payload -> same features
    again = extract_audio_features(ds, n_windows=8, fake=True,
                                   concurrency=2).to_pandas()
    m = out.sort_values("audio_id").reset_index(drop=True)
    n = again.sort_values("audio_id").reset_index(drop=True)
    assert (m["duration_s"] == n["duration_s"]).all()

    # unknown container magics: skipped by default (graceful), an
    # explicit stub under on_unsupported="raise"
    out = AudioFeatureExtractor(fake=False)(pa.table({
        "audio_id": ["a"], "bytes": pa.array([b"zz"], pa.binary()),
    }))
    assert out.num_rows == 0
    with pytest.raises(NotImplementedError):
        AudioFeatureExtractor(fake=False, on_unsupported="raise")(pa.table({
            "audio_id": ["a"], "bytes": pa.array([b"zz"], pa.binary()),
        }))


def test_audio_features_real_gac_decode(ray_session):
    import numpy as np
    import ray.data as rd

    from datatest_ray import extract_audio_features
    from datatest_ray.functions.av import decode_audio, synthetic_pcm

    clips = {f"a{i}": synthetic_pcm(seed=i, n=8000, sample_rate=16000)
             for i in range(3)}
    ds = rd.from_arrow(pa.table({
        "audio_id": list(clips),
        "bytes": pa.array(list(clips.values()), pa.binary()),
    }))
    out = extract_audio_features(ds, n_windows=8, concurrency=2).to_pandas()
    assert len(out) == 3
    # duration comes from the container's embedded rate: 8000/16000 s
    assert np.allclose(out["duration_s"], 0.5)
    # a 0.5-amplitude sine has RMS ~0.35 in every window
    for r in out["rms"]:
        assert all(0.2 < v < 0.5 for v in r)
    # decode round-trip is exact int16 PCM
    pcm, rate = decode_audio(clips["a0"])
    assert rate == 16000 and len(pcm) == 8000 and np.abs(pcm).max() <= 1.0


def test_read_table_source(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from datatest_ray.sources.tables import lance_available, read_table

    pq.write_table(pa.table({"x": [1, 2, 3]}), str(tmp_path / "t.parquet"))
    ds = read_table(str(tmp_path))  # directory of parquet files
    assert ds.count() == 3
    ds2 = read_table(str(tmp_path / "t.parquet"), columns=["x"])
    assert ds2.schema().names == ["x"]

    assert not lance_available()  # sandbox has no lance package
    with pytest.raises(ImportError):
        read_table("/nope/table.lance")


def test_asof_join_latest(ray_session):
    import ray.data as rd

    from datatest_ray.stages.joins import asof_join_latest

    def us(sec):
        return sec * 1_000_000

    left = rd.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "u": ["a", "a", "b", "b", "c", "c"],
        "ts": pa.array([us(10), us(30), us(5), us(50), us(7), us(9)],
                       pa.timestamp("us")),
    }))
    right = rd.from_arrow(pa.table({
        "u": ["a", "a", "b"],
        "ts": pa.array([us(8), us(20), us(40)], pa.timestamp("us")),
    }))
    out = asof_join_latest(left, right, by="u", ts="ts", left_id="id").to_pandas()
    got = {r.left_id: (r.prior_ts_us, r.gap_us) for r in out.itertuples()}
    assert got[1] == (us(8), us(2))     # latest prior of a@10 is a@8
    assert got[2] == (us(20), us(10))   # a@30 -> a@20
    assert np.isnan(got[3][0])          # b@5 has no prior purchase
    assert got[4] == (us(40), us(10))   # b@50 -> b@40
    # key with left rows but ZERO right rows: all-null match, no crash
    assert np.isnan(got[5][0]) and np.isnan(got[5][1])
    assert np.isnan(got[6][0]) and np.isnan(got[6][1])


def test_write_table_parquet_and_lance_gate(ray_session, tmp_path):
    import ray.data as rd

    from datatest_ray.sources.tables import lance_available, read_table, write_table

    t = pa.table({"x": [1, 2, 3], "y": ["a", "b", "c"]})
    # pa.Table -> single parquet file
    write_table(t, str(tmp_path / "t.parquet"))
    assert read_table(str(tmp_path / "t.parquet")).count() == 3
    # Dataset -> partitioned parquet directory (never one giant file)
    write_table(rd.from_arrow(t), str(tmp_path / "d"))
    assert read_table(str(tmp_path / "d")).count() == 3
    # lance sink is gated on the package (absent in this sandbox)
    assert not lance_available()
    with pytest.raises(ImportError):
        write_table(t, str(tmp_path / "t.lance"))

    from datatest_ray.state.checkpoint import CheckpointedRun

    with pytest.raises(ImportError):
        CheckpointedRun(str(tmp_path / "ckpt"), [], violations_fmt="lance")


def test_read_table_csv_validate_end_to_end(ray_session, tmp_path):
    from datatest_ray import validate, ValidationError
    from datatest_ray.sources.tables import read_table

    f = tmp_path / "fixture.csv"
    f.write_text("name,qty\na,1\nb,2\nz,30\n")
    ds = read_table(str(f))
    assert ds.count() == 3
    ds2 = read_table(str(f), columns=["qty"])
    assert ds2.schema().names == ["qty"]
    with pytest.raises(ValidationError) as e:
        validate.interval(ds2, min=1, max=10, columns=["qty"])
    assert len(e.value.differences) == 1


class TestFixtureColumnPruning:
    def test_pruned_generation_bitwise_equals_full(self, ray_session):
        import numpy as np
        from datatest_ray.sources.images import (ImageFixtureSpec,
                                                 generate_batch)

        # pruning skips payload encode + caption text but must keep
        # every row-RNG draw in order: shared columns are bitwise equal
        spec = ImageFixtureSpec(n_rows=400, seed=42, rows_per_part=100,
                                p_phash_dup=0.05)
        idx = np.arange(400)
        full = generate_batch(idx, spec)
        pruned = generate_batch(idx, spec,
                                columns={"image_id", "phash", "fmt", "w"})
        assert set(pruned.column_names) == {"image_id", "phash", "fmt", "w"}
        assert full.select(pruned.column_names).equals(
            pruned.select(pruned.column_names))


def test_read_write_table_json_roundtrip(ray_session, tmp_path):
    """NDJSON source/sink: auto-detect on .json/.jsonl, column prune
    after parse, Dataset and pa.Table writers."""
    import ray.data as rd

    from datatest_ray.sources.tables import read_table, write_table

    t = pa.table({"x": pa.array([1, 2, 3], pa.int64()),
                  "y": ["a", "b", "c"]})
    # Dataset -> NDJSON directory
    write_table(rd.from_arrow(t), str(tmp_path / "d.json"))
    ds = read_table(str(tmp_path / "d.json"))
    assert ds.count() == 3
    assert sorted(ds.schema().names) == ["x", "y"]
    # pa.Table writer + column pruning on read
    write_table(t, str(tmp_path / "e.jsonl"))
    ds2 = read_table(str(tmp_path / "e.jsonl"), columns=["y"])
    assert ds2.schema().names == ["y"]
    assert sorted(r["y"] for r in ds2.take_all()) == ["a", "b", "c"]


def test_read_table_csv(ray_session, tmp_path):
    """CSV source path (the reference's working_directory+csv idiom):
    auto-detect on .csv, post-parse column pruning."""
    from datatest_ray.sources.tables import read_table

    (tmp_path / "t.csv").write_text("x,y\n1,a\n2,b\n3,c\n")
    ds = read_table(str(tmp_path / "t.csv"))
    assert ds.count() == 3
    ds2 = read_table(str(tmp_path / "t.csv"), columns=["y"])
    assert ds2.schema().names == ["y"]


def test_read_sql_sqlite_end_to_end(ray_session, tmp_path):
    """DB-API2 SQL source (SURVEY.md §2.F cursor-adapter line): a
    sqlite3 file read through ray.data.read_sql, validated end-to-end
    with exact difference lists."""
    import sqlite3

    from datatest_ray import validate, ValidationError
    from datatest_ray.sources.tables import read_sql

    db = str(tmp_path / "t.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE items (name TEXT, qty INTEGER)")
    con.executemany("INSERT INTO items VALUES (?, ?)",
                    [("a", 1), ("b", 2), ("z", 30)])
    con.commit()
    con.close()

    ds = read_sql("SELECT name, qty FROM items",
                  lambda: sqlite3.connect(db))
    assert ds.count() == 3
    ds2 = read_sql("SELECT name, qty FROM items",
                   lambda: sqlite3.connect(db), columns=["qty"])
    assert ds2.schema().names == ["qty"]
    with pytest.raises(ValidationError) as e:
        validate.interval(ds2, min=1, max=10, columns=["qty"])
    diffs = e.value.differences
    # interval emits Deviation(actual - max, max): 30 - 10 = +20
    assert len(diffs) == 1
    assert diffs[0].deviation == 20 and diffs[0].expected == 10
