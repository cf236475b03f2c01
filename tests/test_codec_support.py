"""Graceful unknown-codec handling (round-4 verdict item #3).

A real JPEG/MP4/WAV payload reaching the decode seams must produce a
clean ``check_id='codec_unsupported'`` violation row (image checks) or
be streamed past (AV extractors, default ``on_unsupported="skip"``) —
never a worker-side NotImplementedError -> RayTaskError that kills the
pipeline.
"""
import numpy as np
import pyarrow as pa
import pytest

from datatest_ray.functions.png import (
    UnsupportedCodecError,
    container_scan,
    decode_image,
    sniff_real_codec,
)

# minimal real-world magic payloads (>= 12 bytes so the sniffer engages)
JPEG = b"\xff\xd8\xff\xe0\x00\x10JFIF\x00\x01\x01" + b"\x00" * 64
MP4 = b"\x00\x00\x00\x18ftypisom\x00\x00\x02\x00isomiso2" + b"\x00" * 64
WAV = b"RIFF\x24\x00\x00\x00WAVEfmt " + b"\x00" * 64
MKV = b"\x1aE\xdf\xa3" + b"\x00" * 64
GARBAGE = b"zz" + b"\x00" * 64


def test_sniff_real_codec_magics():
    assert sniff_real_codec(JPEG) == "jpeg"
    assert sniff_real_codec(MP4) == "mp4"
    assert sniff_real_codec(WAV) == "wav"
    assert sniff_real_codec(MKV) == "mkv"
    assert sniff_real_codec(b"fLaC" + b"\x00" * 16) == "flac"
    assert sniff_real_codec(b"OggS" + b"\x00" * 16) == "ogg"
    assert sniff_real_codec(b"GIF89a" + b"\x00" * 16) == "gif"
    assert sniff_real_codec(GARBAGE) is None
    assert sniff_real_codec(b"short") is None  # < 12 bytes: never sniffed


def test_decode_image_raises_typed_error():
    with pytest.raises(UnsupportedCodecError) as ei:
        decode_image(JPEG)
    assert ei.value.codec == "jpeg"
    # compat: the seam contract was NotImplementedError; generic decode
    # handlers catch ValueError — the typed error is both
    assert isinstance(ei.value, NotImplementedError)
    assert isinstance(ei.value, ValueError)
    with pytest.raises(ValueError):
        decode_image(GARBAGE)  # garbage stays a generic decode error


def test_container_scan_reports_codec_unsupported():
    fmt, w, h, err = container_scan(WAV)
    assert (fmt, err) == ("wav", "codec_unsupported:wav")
    fmt, w, h, err = container_scan(GARBAGE)
    assert err == "bad_magic"


def _fixture_with_real_payloads(n=60):
    from datatest_ray.sources.images import ImageFixtureSpec, generate_batch

    spec = ImageFixtureSpec(
        n_rows=n, rows_per_part=20, p_dup_id=0, p_corrupt=0, p_lossy_bad=0,
        p_oob_w=0, p_null_w=0, p_bad_fmt=0, p_bad_cap=0, p_phash_dup=0,
        drift_last_partition=False,
    )
    t = generate_batch(np.arange(n), spec)
    payloads = t.column("bytes").to_pylist()
    payloads[3] = JPEG
    payloads[7] = MP4
    payloads[11] = WAV
    cols = {name: t.column(name) for name in t.column_names}
    cols["bytes"] = pa.array(payloads, pa.binary())
    return pa.table(cols), spec, {3, 7, 11}


def test_integrity_check_emits_codec_unsupported(ray_session):
    import ray.data as rd

    from datatest_ray.pipelines.flagship import IMAGE_CTX
    from datatest_ray.pipelines.suite import CheckSuite
    from datatest_ray.stages.imaging import ImageIntegrityCheck

    t, spec, bad = _fixture_with_real_payloads()
    res = CheckSuite([ImageIntegrityCheck()], IMAGE_CTX).run(
        rd.from_arrow(t))
    v = res.to_table().to_pandas()
    cu = v[v.check_id == "codec_unsupported"]
    ids = {t.column("image_id")[i].as_py() for i in bad}
    assert set(cu.row_ref) == ids
    assert set(cu.kind) == {"invalid"}
    assert set(cu.value) == {"codec_unsupported:jpeg",
                             "codec_unsupported:mp4",
                             "codec_unsupported:wav"}
    # nothing mis-reported as corrupt
    assert not set(v[v.kind == "corrupt"].row_ref) & ids


def test_parity_check_emits_codec_unsupported(ray_session):
    import ray.data as rd

    from datatest_ray.pipelines.flagship import IMAGE_CTX
    from datatest_ray.pipelines.suite import CheckSuite
    from datatest_ray.stages.imaging import ImageParityCheck

    t, spec, bad = _fixture_with_real_payloads()
    res = CheckSuite(
        [ImageParityCheck(reference_seed=spec.seed, concurrency=2)],
        IMAGE_CTX,
    ).run(rd.from_arrow(t))
    v = res.to_table().to_pandas()
    cu = v[v.check_id == "codec_unsupported"]
    ids = {t.column("image_id")[i].as_py() for i in bad}
    assert set(cu.row_ref) == ids
    assert set(cu.kind) == {"invalid"}


def test_frame_sampler_skips_real_mp4(ray_session):
    import ray.data as rd

    from datatest_ray import sample_frames
    from datatest_ray.functions.av import synthetic_clip
    from datatest_ray.stages.transforms import FrameSampler

    good = synthetic_clip(seed=1, n_frames=8, w=8, h=8)
    ds = rd.from_arrow(pa.table({
        "video_id": ["good", "real_mp4"],
        "bytes": pa.array([good, MP4], pa.binary()),
    }))
    out = sample_frames(ds, n_frames=4, concurrency=1).to_pandas()
    assert set(out["video_id"]) == {"good"}  # pipeline completed, mp4 skipped
    assert len(out) == 4
    with pytest.raises(NotImplementedError):
        FrameSampler(on_unsupported="raise")(pa.table({
            "video_id": ["v"], "bytes": pa.array([MP4], pa.binary()),
        }))


def test_audio_features_skip_real_wav(ray_session):
    import ray.data as rd

    from datatest_ray import extract_audio_features
    from datatest_ray.functions.av import synthetic_pcm
    from datatest_ray.stages.transforms import AudioFeatureExtractor

    good = synthetic_pcm(seed=1, n=4000, sample_rate=8000)
    ds = rd.from_arrow(pa.table({
        "audio_id": ["good", "real_wav"],
        "bytes": pa.array([good, WAV], pa.binary()),
    }))
    out = extract_audio_features(ds, n_windows=4, concurrency=1).to_pandas()
    assert set(out["audio_id"]) == {"good"}
    with pytest.raises(NotImplementedError):
        AudioFeatureExtractor(on_unsupported="raise")(pa.table({
            "audio_id": ["a"], "bytes": pa.array([WAV], pa.binary()),
        }))


def test_codec_support_check_kinds(ray_session):
    import ray.data as rd

    from datatest_ray.functions.av import synthetic_clip
    from datatest_ray.stages.base import RunContext
    from datatest_ray.stages.transforms import CodecSupportCheck

    ds = rd.from_arrow(pa.table({
        "video_id": ["ok", "mp4", "junk", "nul"],
        "bytes": pa.array(
            [synthetic_clip(seed=0, n_frames=2, w=4, h=4), MP4, GARBAGE,
             None],
            pa.binary()),
    }))
    v = CodecSupportCheck("video").violations(
        ds, RunContext()).to_pandas().set_index("row_ref")
    assert "ok" not in v.index
    assert v.loc["mp4", "check_id"] == "codec_unsupported"
    assert v.loc["mp4", "kind"] == "invalid"
    assert v.loc["mp4", "value"] == "codec_unsupported:mp4"
    assert v.loc["junk", "kind"] == "corrupt"
    assert v.loc["junk", "check_id"] == "av_codec_support"
    assert v.loc["nul", "kind"] == "missing"
