"""Kill+resume demonstration at 10x scale (round-4 verdict item #4).

Runs the 10M-image flagship check set through the per-partition
checkpoint layout (state/checkpoint.py :: CheckpointedRun), SIGKILLs
the run mid-flight, resumes it, and proves:

1. the resumed run SKIPS every unit completed before the kill (no
   re-validation of finished partitions), and
2. the kill+resume final state (violation rows + verdicts) is
   bit-identical to an uninterrupted run over the same input.

Usage (orchestrator; writes BENCH/resume_10x_r5.json):

    python tools/resume_10x.py [--sf 1.0] [--kill-after-units 5]

Internal child mode (one full-or-partial checkpointed run):

    python tools/resume_10x.py --child <out_dir> --sf 1.0
"""
from __future__ import annotations

import argparse
import glob
import hashlib
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _files(sf: float) -> list:
    sys.path.insert(0, REPO)
    import bench

    path, n_rows = bench.ensure_fixture(sf)
    return sorted(glob.glob(os.path.join(path, "*.parquet"))), n_rows


def _runner(out_dir: str, sf: float):
    from datatest_ray.pipelines.flagship import IMAGE_CTX, flagship_checks
    from datatest_ray.state.checkpoint import CheckpointedRun

    import dataclasses

    all_checks = flagship_checks(
        reference_seed=42, parity_concurrency=max(2, NCPU - 4),
        parity_batch_size=512, near_dup_mode="sampled",
        dim_hi=160, bytes_hi=65536)
    # per-partition checks checkpoint per unit; whole-dataset checks
    # (uniqueness, drift, near-dup) run as the __global__ unit
    global_names = ("UniqueCheck", "DriftCheck", "PhashNearDupCheck")
    per_part = [c for c in all_checks
                if type(c).__name__ not in global_names]
    glob_checks = [c for c in all_checks
                   if type(c).__name__ in global_names]
    ctx = dataclasses.replace(IMAGE_CTX, shuffle_partitions=NCPU)
    return CheckpointedRun(out_dir, per_part, glob_checks, ctx=ctx,
                           files_per_unit=8)


def _violations_digest(run) -> tuple:
    import pyarrow.compute as pc

    t = run.all_violations()
    if t.num_rows == 0:
        return 0, "empty"
    idx = pc.sort_indices(t, sort_keys=[(n, "ascending")
                                        for n in t.column_names])
    t = t.take(idx)
    h = hashlib.sha256()
    for col in t.column_names:
        h.update(str(t.column(col).to_pylist()).encode())
    return t.num_rows, h.hexdigest()[:16]


def child(out_dir: str, sf: float) -> None:
    import ray

    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             logging_level="ERROR")
    files, _ = _files(sf)
    run = _runner(out_dir, sf)
    summary = run.run(files)
    print("CHILD_SUMMARY " + json.dumps(summary))
    ray.shutdown()


def _spawn(out_dir: str, sf: float) -> subprocess.Popen:
    env = dict(os.environ)
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", out_dir,
         "--sf", str(sf)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=REPO, env=env)


def _done_units(out_dir: str) -> set:
    return {os.path.basename(os.path.dirname(p))
            for p in glob.glob(os.path.join(out_dir, "units", "*", "_DONE"))}


def orchestrate(sf: float, kill_after: int) -> None:
    files, n_rows = _files(sf)
    base = os.environ.get("GRAFT_RESUME_TMP", "/tmp/graft_resume10x")
    full_dir = os.path.join(base, "full")
    res_dir = os.path.join(base, "resumed")
    for d in (full_dir, res_dir):
        if os.path.exists(d):
            import shutil

            shutil.rmtree(d)

    # 1) uninterrupted reference run
    t0 = time.time()
    p = _spawn(full_dir, sf)
    out, _ = p.communicate()
    assert p.returncode == 0, f"full run failed rc={p.returncode}"
    full_summary = json.loads(out.split("CHILD_SUMMARY ", 1)[1])
    full_wall = time.time() - t0

    # 2) killed run: SIGKILL once kill_after units carry _DONE
    t0 = time.time()
    p = _spawn(res_dir, sf)
    killed_at = None
    while p.poll() is None:
        done = _done_units(res_dir)
        if len(done) >= kill_after:
            p.send_signal(signal.SIGKILL)
            killed_at = sorted(done)
            break
        time.sleep(0.5)
    assert killed_at is not None, "run finished before the kill threshold"
    p.wait()
    pre_kill = _done_units(res_dir)
    kill_wall = time.time() - t0

    # 3) resume in the same out_dir
    t0 = time.time()
    p = _spawn(res_dir, sf)
    out, _ = p.communicate()
    assert p.returncode == 0, f"resume failed rc={p.returncode}"
    resume_summary = json.loads(out.split("CHILD_SUMMARY ", 1)[1])
    resume_wall = time.time() - t0

    # -- assertions --------------------------------------------------
    skipped = set(resume_summary["skipped"])
    ran = set(resume_summary["ran"])
    assert pre_kill <= skipped, (
        f"resume re-validated completed units: {pre_kill - skipped}")
    assert not (pre_kill & ran), "a completed unit was re-run"

    full_run = _runner(full_dir, sf)
    res_run = _runner(res_dir, sf)
    n_full, dig_full = _violations_digest(full_run)
    n_res, dig_res = _violations_digest(res_run)
    assert (n_full, dig_full) == (n_res, dig_res), (
        f"kill+resume diverged: full=({n_full},{dig_full}) "
        f"resumed=({n_res},{dig_res})")
    for k in ("n_units_done", "n_violations", "n_failed_verdicts",
              "n_verdicts", "n_rows_validated"):
        assert full_summary[k] == resume_summary[k], (
            k, full_summary[k], resume_summary[k])

    report = {
        "metric": "kill+resume at 10x scale (per-partition checkpoints)",
        "sf": sf,
        "n_images": n_rows,
        "num_cpus": NCPU,
        "kill_after_units": kill_after,
        "units_done_before_kill": sorted(pre_kill),
        "resume_skipped": sorted(skipped),
        "resume_ran": sorted(ran),
        "n_violations_full": n_full,
        "n_violations_resumed": n_res,
        "violations_digest_full": dig_full,
        "violations_digest_resumed": dig_res,
        "verdicts": {k: full_summary[k] for k in
                     ("n_units_done", "n_verdicts", "n_failed_verdicts",
                      "n_rows_validated")},
        "wall_s": {"full": round(full_wall, 1),
                   "killed_partial": round(kill_wall, 1),
                   "resume": round(resume_wall, 1)},
        "identical": True,
    }
    print(json.dumps(report))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "resume_10x_r5.json"), "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", default=None)
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--kill-after-units", type=int, default=5)
    args = ap.parse_args()
    if args.child:
        child(args.child, args.sf)
    else:
        orchestrate(args.sf, args.kill_after_units)
