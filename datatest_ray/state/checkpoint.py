"""Per-partition checkpoint / resume (SURVEY.md §2.I, §4).

The reference has no persistence at all (single-process, raises
ValidationError); the north_rule mandates: *"validation state
checkpoints per Lance fragment so runs resume with per-partition
lineage and metrics intact"*.

Layout (parquet files stand in for Lance fragments locally)::

    out_dir/
      units/<unit_key>/
        violations.parquet      # violation rows for the unit's partitions
        verdicts.json           # per (check_id, partition_id) verdicts
        _DONE                   # atomic completion marker (rename)
      units/__global__/...      # one unit for whole-dataset checks
      summary.json              # written by finalize()

A **unit** is a group of input files (default: one file = one unit =
one partition).  Units run as full streaming pipelines one after
another; a killed run resumes by skipping every unit whose ``_DONE``
marker exists — already-validated partitions are never re-read.
Stateless/per-partition checks checkpoint per unit; global checks
(uniqueness, set-missing, near-dup) need the whole dataset and run as
the dedicated ``__global__`` unit, preserved independently.

Markers are written via write-to-temp + ``os.replace`` so a crash
mid-write never yields a half-complete unit that resume would skip.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Callable, Dict, List, Optional, Sequence

import pyarrow as pa
import pyarrow.parquet as pq

from ..differences import VIOLATION_SCHEMA, empty_violations
from ..pipelines.suite import CheckSuite, ValidationResult
from ..stages.base import RunContext

__all__ = ["CheckpointedRun"]


def _unit_key(paths: Sequence[str]) -> str:
    import hashlib

    h = hashlib.sha1("|".join(sorted(paths)).encode()).hexdigest()[:16]
    base = os.path.basename(sorted(paths)[0]).split(".")[0][:40]
    return f"{base}-{h}"


class CheckpointedRun:
    def __init__(
        self,
        out_dir: str,
        per_partition_checks: Sequence,
        global_checks: Sequence = (),
        ctx: Optional[RunContext] = None,
        files_per_unit: int = 1,
        violations_fmt: str = "parquet",
    ):
        if violations_fmt == "lance":
            from ..sources.tables import lance_available

            if not lance_available():
                raise ImportError(
                    "violations_fmt='lance' needs the lance package; "
                    "use 'parquet' (the local stand-in)"
                )
        elif violations_fmt != "parquet":
            raise ValueError(f"unknown violations_fmt {violations_fmt!r}")
        self.out_dir = out_dir
        self.per_partition_checks = list(per_partition_checks)
        self.global_checks = list(global_checks)
        self.ctx = ctx or RunContext()
        self.files_per_unit = files_per_unit
        self.violations_fmt = violations_fmt
        os.makedirs(os.path.join(out_dir, "units"), exist_ok=True)

    # -- unit bookkeeping -------------------------------------------------
    def _unit_dir(self, key: str) -> str:
        return os.path.join(self.out_dir, "units", key)

    def unit_done(self, key: str) -> bool:
        return os.path.exists(os.path.join(self._unit_dir(key), "_DONE"))

    def plan_units(self, input_files: Sequence[str]) -> List[tuple]:
        files = sorted(input_files)
        k = self.files_per_unit
        units = []
        for i in range(0, len(files), k):
            chunk = files[i : i + k]
            units.append((_unit_key(chunk), chunk))
        return units

    # -- execution --------------------------------------------------------
    def _write_unit(self, key: str, result: ValidationResult,
                    partitions: Optional[Sequence[str]],
                    metrics: Optional[Dict] = None) -> None:
        udir = self._unit_dir(key)
        tmp = udir + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        table = result.to_table()
        if self.violations_fmt == "lance":
            from ..sources.tables import write_table

            write_table(table, os.path.join(tmp, "violations.lance"))
        else:
            pq.write_table(table, os.path.join(tmp, "violations.parquet"))
        verdicts = result.verdicts(partitions=partitions)
        with open(os.path.join(tmp, "verdicts.json"), "w") as f:
            json.dump(verdicts.to_pylist(), f)
        with open(os.path.join(tmp, "metrics.json"), "w") as f:
            json.dump(metrics or {}, f)
        open(os.path.join(tmp, "_DONE"), "w").close()
        if os.path.exists(udir):
            shutil.rmtree(udir)
        os.replace(tmp, udir)

    def run(self, input_files: Sequence[str],
            partitions_of: Optional[Callable[[Sequence[str]], List[str]]] = None,
            on_unit=None) -> Dict:
        """Validate all units, skipping completed ones.  Returns the
        summary dict (also written to out_dir/summary.json)."""
        import ray.data as rd

        import time

        units = self.plan_units(input_files)
        ran, skipped = [], []
        for key, paths in units:
            if self.unit_done(key):
                skipped.append(key)
                continue
            t0 = time.time()
            ds = rd.read_parquet(paths)
            n_rows = ds.count()
            result = CheckSuite(self.per_partition_checks, self.ctx).run(ds)
            parts = partitions_of(paths) if partitions_of else None
            wall = time.time() - t0
            self._write_unit(key, result, parts, metrics={
                "n_rows": n_rows, "wall_s": round(wall, 3),
                "rows_per_sec": round(n_rows / wall, 1) if wall > 0 else None,
                "n_violations": result.to_table().num_rows,
                "input_files": list(paths),
            })
            ran.append(key)
            if on_unit:
                on_unit(key)
        if self.global_checks:
            gkey = "__global__"
            if not self.unit_done(gkey):
                t0 = time.time()
                ds = rd.read_parquet(list(input_files))
                result = CheckSuite(self.global_checks, self.ctx).run(ds)
                wall = time.time() - t0
                self._write_unit(gkey, result, None, metrics={
                    "wall_s": round(wall, 3),
                    "n_violations": result.to_table().num_rows,
                })
                ran.append(gkey)
            else:
                skipped.append(gkey)
        return self.finalize(ran=ran, skipped=skipped)

    # -- aggregation ------------------------------------------------------
    def finalize(self, ran=None, skipped=None) -> Dict:
        units_dir = os.path.join(self.out_dir, "units")
        all_verdicts: List[dict] = []
        n_violations = 0
        total_rows, total_wall = 0, 0.0
        for key in sorted(os.listdir(units_dir)):
            udir = os.path.join(units_dir, key)
            if not os.path.exists(os.path.join(udir, "_DONE")):
                continue
            with open(os.path.join(udir, "verdicts.json")) as f:
                all_verdicts.extend(json.load(f))
            mp = os.path.join(udir, "metrics.json")
            if os.path.exists(mp):
                with open(mp) as f:
                    m = json.load(f)
                total_rows += int(m.get("n_rows") or 0)
                total_wall += float(m.get("wall_s") or 0.0)
            vp = os.path.join(udir, "violations.parquet")
            if os.path.exists(vp):
                n_violations += pq.read_metadata(vp).num_rows
        summary = {
            "n_units_done": sum(
                1
                for k in os.listdir(units_dir)
                if os.path.exists(os.path.join(units_dir, k, "_DONE"))
            ),
            "n_violations": n_violations,
            "n_failed_verdicts": sum(1 for v in all_verdicts if not v["passed"]),
            "n_verdicts": len(all_verdicts),
            "n_rows_validated": total_rows,
            "wall_s_units": round(total_wall, 3),
            "rows_per_sec": round(total_rows / total_wall, 1) if total_wall else None,
            "ran": ran or [],
            "skipped": skipped or [],
        }
        tmp = os.path.join(self.out_dir, "summary.json.tmp")
        with open(tmp, "w") as f:
            json.dump(summary, f, indent=1)
        os.replace(tmp, os.path.join(self.out_dir, "summary.json"))
        return summary

    def all_violations(self) -> pa.Table:
        units_dir = os.path.join(self.out_dir, "units")
        tables = []
        for key in sorted(os.listdir(units_dir)):
            vp = os.path.join(units_dir, key, "violations.parquet")
            if os.path.exists(os.path.join(units_dir, key, "_DONE")) and os.path.exists(vp):
                t = pq.read_table(vp)
                if t.num_rows:
                    tables.append(t.cast(VIOLATION_SCHEMA))
        return pa.concat_tables(tables) if tables else empty_violations()
