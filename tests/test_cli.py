"""Job-entrypoint smoke: ``python -m datatest_ray`` main() in-process
(streaming + checkpoint/resume modes) against a tiny fixture."""

import json

import pytest


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    from datatest_ray.sources.images import (
        ImageFixtureSpec, materialize_fixture)

    spec = ImageFixtureSpec(n_rows=500, seed=11, rows_per_part=125)
    return materialize_fixture(
        str(tmp_path_factory.mktemp("cli") / "tbl"), spec)


def test_streaming_mode(ray_session, fixture_dir, tmp_path, capsys):
    from datatest_ray.__main__ import main

    rc = main(["--input", fixture_dir, "--reference-seed", "11",
               "--output", str(tmp_path / "viol"),
               "--no-near-dup"])
    assert rc == 0
    import os
    n_files = len([f for f in os.listdir(fixture_dir)
                   if f.endswith(".parquet")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_input_files"] == n_files >= 1
    assert out["n_violations"] >= 0
    assert isinstance(out["violations_by_check"], dict)
    assert (tmp_path / "viol").exists()


def test_checkpoint_mode_resumes(ray_session, fixture_dir, tmp_path, capsys):
    from datatest_ray.__main__ import main

    args = ["--input", fixture_dir, "--reference-seed", "11",
            "--checkpoint-dir", str(tmp_path / "ckpt"),
            "--no-near-dup", "--no-drift"]
    import os
    n_files = len([f for f in os.listdir(fixture_dir)
                   if f.endswith(".parquet")])

    assert main(args) == 0
    s1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s1["n_units_done"] == n_files + 1 and not s1["skipped"]

    assert main(args) == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert not s2["ran"] and len(s2["skipped"]) == n_files + 1
    assert s2["n_violations"] == s1["n_violations"]
