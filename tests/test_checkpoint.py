"""Checkpoint/resume (SURVEY.md §5.2 item 4): kill after k units, rerun,
assert identical final verdicts and no re-validation of finished units."""

import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from datatest_ray.sources.images import ImageFixtureSpec, generate_batch


@pytest.fixture(scope="module")
def fixture_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgparts")
    spec = ImageFixtureSpec(n_rows=400, rows_per_part=100, p_oob_w=0.03, p_bad_fmt=0.03)
    paths = []
    for p in range(4):
        t = generate_batch(np.arange(p * 100, (p + 1) * 100), spec)
        path = str(root / f"part_{p:05d}.parquet")
        pq.write_table(t, path)
        paths.append(path)
    return paths


def _checks():
    from datatest_ray.stages.global_checks import UniqueCheck
    from datatest_ray.stages.row_checks import DomainCheck, IntervalCheck

    per_part = [
        IntervalCheck("w", min=1, max=16384),
        DomainCheck("fmt", {"jpeg", "png", "webp"}),
    ]
    global_ = [UniqueCheck("image_id")]
    return per_part, global_


def _make_run(out_dir, ctx=None):
    from datatest_ray.pipelines.flagship import IMAGE_CTX
    from datatest_ray.state.checkpoint import CheckpointedRun

    per_part, global_ = _checks()
    return CheckpointedRun(str(out_dir), per_part, global_, ctx=IMAGE_CTX)


def test_full_run_then_resume_noop(ray_session, fixture_files, tmp_path):
    run = _make_run(tmp_path / "out1")
    s1 = run.run(fixture_files)
    assert s1["n_units_done"] == 5  # 4 file units + __global__
    assert len(s1["ran"]) == 5 and not s1["skipped"]
    # resume: nothing re-runs
    s2 = _make_run(tmp_path / "out1").run(fixture_files)
    assert not s2["ran"] and len(s2["skipped"]) == 5
    assert s2["n_violations"] == s1["n_violations"]


def test_kill_and_resume_identical_verdicts(ray_session, fixture_files, tmp_path):
    class Killed(RuntimeError):
        pass

    run = _make_run(tmp_path / "killed")
    count = {"n": 0}

    def bomb(key):
        count["n"] += 1
        if count["n"] == 2:
            raise Killed()

    with pytest.raises(Killed):
        run.run(fixture_files, on_unit=bomb)
    # 2 units completed before the crash
    partial = _make_run(tmp_path / "killed")
    done_before = {
        k for k in os.listdir(tmp_path / "killed" / "units")
        if partial.unit_done(k)
    }
    assert len(done_before) == 2

    s_resumed = _make_run(tmp_path / "killed").run(fixture_files)
    assert set(s_resumed["skipped"]) == done_before  # finished units not re-read

    s_clean = _make_run(tmp_path / "clean").run(fixture_files)
    assert s_resumed["n_violations"] == s_clean["n_violations"]
    assert s_resumed["n_failed_verdicts"] == s_clean["n_failed_verdicts"]

    resumed_v = _make_run(tmp_path / "killed").all_violations()
    clean_v = _make_run(tmp_path / "clean").all_violations()
    key = lambda t: sorted(
        (r["check_id"], r["row_ref"], r["kind"], r["value"]) for r in t.to_pylist()
    )
    assert key(resumed_v) == key(clean_v)


def test_atomicity_half_written_unit_ignored(ray_session, fixture_files, tmp_path):
    run = _make_run(tmp_path / "atomic")
    s = run.run(fixture_files[:2])
    units_dir = tmp_path / "atomic" / "units"
    # simulate a crash mid-write: unit dir without _DONE
    fake = units_dir / "halfdone-deadbeef"
    fake.mkdir()
    (fake / "verdicts.json").write_text("[]")
    s2 = run.finalize()
    assert s2["n_units_done"] == s["n_units_done"]  # half unit not counted


def test_write_violations_partitioned(ray_session, tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from datatest_ray import CheckSuite, IntervalCheck, RunContext

    ds = rd.from_arrow(pa.table({"v": [1.0, 50.0, -3.0, 5.0]}))
    res = CheckSuite([IntervalCheck("v", min=0, max=10)], RunContext()).run(ds)
    out = str(tmp_path / "viol")
    res.write_violations(out)
    # hive layout: one directory per check_id
    subdirs = [d for d in os.listdir(out) if d.startswith("check_id=")]
    assert len(subdirs) == 1
    total = sum(
        pq.read_table(os.path.join(root, f)).num_rows
        for root, _, files in os.walk(out) for f in files
        if f.endswith(".parquet")
    )
    assert total == 2
