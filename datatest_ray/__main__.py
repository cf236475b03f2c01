"""Job entrypoint: ``python -m datatest_ray --input <table-dir>``.

This is the driver script a multi-node deployment hands to
``ray job submit`` (BASELINE.json north_rule: "run via ray job submit
on fixed-size clusters"); locally it runs against
``ray.init(address="local")``.  Two modes:

streaming (default)
    One streaming pass of the full flagship suite with per-branch
    READ-LEVEL column pruning; violations optionally written as
    check_id-partitioned parquet; ONE summary JSON line on stdout.

--checkpoint-dir DIR
    Resumable per-unit validation (state/checkpoint.py): per-partition
    checks run unit by unit with atomic verdict/violation/metric
    writes; re-running the same command skips finished units.

The script only calls ``ray.init`` when no session exists (the library
itself never does — the embedding driver owns the session).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _input_files(path: str) -> list:
    if os.path.isfile(path):
        return [path]
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    if not files:
        raise SystemExit(f"no parquet files under {path!r}")
    return files


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m datatest_ray",
        description="Flagship validation suite over an image+caption table",
    )
    ap.add_argument("--input", required=True,
                    help="parquet file or directory of parquet files")
    ap.add_argument("--output", default=None,
                    help="write violations here, partitioned by check_id")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="resumable mode: per-unit state under this dir")
    ap.add_argument("--reference-seed", type=int, default=None,
                    help="seed of the synthetic reference for pixel parity")
    ap.add_argument("--no-parity", action="store_true")
    ap.add_argument("--no-drift", action="store_true")
    ap.add_argument("--no-near-dup", action="store_true")
    ap.add_argument("--near-dup-mode", default="sampled",
                    choices=["exact", "sampled"])
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--parity-concurrency", type=int, default=None)
    ap.add_argument("--files-per-unit", type=int, default=1,
                    help="checkpoint mode: input files per resumable unit")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False)
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    files = _input_files(args.input)
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    common = dict(
        reference_seed=args.reference_seed,
        with_parity=not args.no_parity,
        with_drift=not args.no_drift,
        with_near_dup=not args.no_near_dup,
        near_dup_mode=args.near_dup_mode,
        parity_concurrency=args.parity_concurrency
        or max(2, ncpu - max(2, ncpu // 8)),
        parity_batch_size=512,
    )

    if args.checkpoint_dir:
        from .pipelines.flagship import IMAGE_CTX, flagship_checks
        from .state.checkpoint import CheckpointedRun

        checks = flagship_checks(**common)
        # global checks need the whole corpus (uniqueness, near-dup,
        # drift); the rest validate unit-locally
        global_names = {"UniqueCheck", "PhashNearDupCheck", "DriftCheck"}
        per_part = [c for c in checks
                    if type(c).__name__ not in global_names]
        global_ = [c for c in checks if type(c).__name__ in global_names]
        run = CheckpointedRun(args.checkpoint_dir, per_part, global_,
                              ctx=IMAGE_CTX,
                              files_per_unit=args.files_per_unit)
        summary = run.run(files)
        print(json.dumps(summary))
        return 0

    from .pipelines.flagship import run_flagship

    ds = rd.read_parquet(files)
    result = run_flagship(
        ds,
        shuffle_partitions=args.shuffle_partitions or ncpu,
        reader=lambda cols: rd.read_parquet(files, columns=cols),
        **common,
    )
    table = result.to_table()
    if args.output:
        result.write_violations(args.output)
    per_check: dict = {}
    for cid in table.column("check_id").to_pylist():
        per_check[cid] = per_check.get(cid, 0) + 1
    print(json.dumps({
        "n_violations": table.num_rows,
        "violations_by_check": dict(sorted(per_check.items())),
        "n_input_files": len(files),
        "output": args.output,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
