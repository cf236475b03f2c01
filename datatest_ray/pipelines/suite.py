"""CheckSuite: run many checks over one Dataset in one streaming pass.

Engine equivalent of the reference's ``validate()`` call graph
(``datatest/validation.py :: validate`` -> ``requirements.py ::
get_requirement`` -> single lazy pass; SURVEY.md §3.1), re-planned for
Ray Data:

1. every **stateless** check is fused into ONE ``map_batches(...,
   batch_format='pyarrow', zero_copy_batch=True)`` pass — the input is
   read once for the whole suite, and only the columns some check needs
   are read at all (column pruning at the plan level);
2. each **global** check contributes its own pre-aggregated shuffle plan
   (see stages/global_checks.py);
3. all violation datasets are unioned lazily; verdict aggregation is a
   small ``groupby(check_id, partition_id)`` at the end.

Nothing here materializes the input; only violations (expected small)
are ever collected.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence

import pyarrow as pa

from ..differences import (
    VIOLATION_SCHEMA,
    ValidationError,
    differences_from_table,
    empty_violations,
)
from ..stages.base import Check, RunContext, StatelessCheck

__all__ = ["CheckSuite", "ValidationResult"]


class ValidationResult:
    """Lazy handle over the suite's violations Dataset."""

    def __init__(self, violations_ds, checks: Sequence[Check], ctx: RunContext,
                 pieces: Optional[list] = None,
                 piece_is_actor_pool: Optional[list] = None):
        self.violations = violations_ds
        self.checks = list(checks)
        self.ctx = ctx
        self.pieces = pieces  # per-branch violation Datasets (pre-union)
        self._piece_is_actor_pool = piece_is_actor_pool or (
            [False] * len(pieces) if pieces else []
        )
        self._table: Optional[pa.Table] = None

    # -- materialization (violations only; expected small) ---------------
    def to_table(self) -> pa.Table:
        if self._table is None:
            import ray

            if self.pieces and len(self.pieces) > 1:
                # run each branch as its OWN streaming execution: one big
                # unioned plan makes the resource manager split the
                # cluster across ~20 operators and branch progress
                # serializes.  Task-pool branches run concurrently
                # (phase 1); actor-pool branches (decode — the dominant
                # compute) run AFTER, each with the cluster to itself, so
                # reserved actors never starve the light branches and
                # vice versa.
                from concurrent.futures import ThreadPoolExecutor

                light = [(i, p) for i, p in enumerate(self.pieces)
                         if not self._piece_is_actor_pool[i]]
                heavy = [(i, p) for i, p in enumerate(self.pieces)
                         if self._piece_is_actor_pool[i]]
                mats = {}
                if light:
                    with ThreadPoolExecutor(max_workers=len(light)) as ex:
                        for (i, _), m in zip(
                            light, ex.map(lambda ip: ip[1].materialize(), light)
                        ):
                            mats[i] = m
                for i, p in heavy:
                    mats[i] = p.materialize()
                refs = [r for i in sorted(mats) for r in mats[i].to_arrow_refs()]
            else:
                # materialize once: to_arrow_refs on a lazy union triggers
                # a separate schema-resolution execution (limit-1 per
                # branch) that re-runs every shuffle branch
                mat = self.violations.materialize()
                self.violations = mat
                refs = mat.to_arrow_refs()
            got = [t for t in ray.get(refs) if t.num_rows]
            got = [t.cast(VIOLATION_SCHEMA) for t in got]
            self._table = (
                pa.concat_tables(got) if got else empty_violations()
            )
        return self._table

    def differences(self) -> list:
        return differences_from_table(self.to_table())

    def counts(self) -> dict:
        import pyarrow.compute as pc

        t = self.to_table()
        if t.num_rows == 0:
            return {c.check_id: 0 for c in self.checks}
        counted = t.group_by("check_id").aggregate([("check_id", "count")])
        out = {c.check_id: 0 for c in self.checks}
        for cid, n in zip(
            counted.column("check_id").to_pylist(),
            counted.column("check_id_count").to_pylist(),
        ):
            out[cid] = n
        return out

    def verdicts(self, partitions: Optional[Iterable[str]] = None) -> pa.Table:
        """One row per (check_id, partition_id): pass flag + counts.

        ``partitions``: the full partition list (so untouched partitions
        get explicit PASS rows — required for checkpoint/resume lineage).
        """
        t = self.to_table()
        seen: dict = {}
        for row in t.select(["check_id", "partition_id"]).to_pylist():
            k = (row["check_id"], row["partition_id"] or "")
            seen[k] = seen.get(k, 0) + 1
        parts = list(partitions) if partitions is not None else []
        rows = {"check_id": [], "partition_id": [], "passed": [], "n_violations": []}
        all_parts = set(parts) | {p for (_, p) in seen}
        if not all_parts:
            all_parts = {""}
        for c in self.checks:
            for p in sorted(all_parts):
                n = seen.get((c.check_id, p), 0)
                rows["check_id"].append(c.check_id)
                rows["partition_id"].append(p)
                rows["passed"].append(n == 0)
                rows["n_violations"].append(n)
        return pa.table(rows)

    def write_violations(self, out_dir: str) -> None:
        """Write the violations as parquet partitioned by check_id —
        the resumable-output layout (one directory per check; consumers
        can skip finished checks by directory presence)."""
        import ray.data as rd

        t = self.to_table()
        rd.from_arrow(t).write_parquet(out_dir, partition_cols=["check_id"])

    @property
    def is_valid(self) -> bool:
        return self.to_table().num_rows == 0

    def raise_on_failure(self, msg: Optional[str] = None) -> None:
        t = self.to_table()
        if t.num_rows:
            raise ValidationError(differences_from_table(t), msg or "validation failed")


class CheckSuite:
    def __init__(self, checks: Sequence[Check], ctx: Optional[RunContext] = None):
        self.checks = list(checks)
        self.ctx = ctx or RunContext()

    def _split(self):
        fused: List[StatelessCheck] = []
        solo: List[Check] = []
        for c in self.checks:
            if isinstance(c, StatelessCheck) and getattr(c, "fuseable", True):
                fused.append(c)
            else:
                solo.append(c)
        return fused, solo

    def _pruned_columns(self, ds, fused) -> Optional[List[str]]:
        cols = set()
        for c in fused:
            for attr in ("column",):
                v = getattr(c, attr, None)
                if v:
                    cols.add(v)
            v = getattr(c, "columns", None)
            if v:
                cols.update(v)
            if getattr(c, "needs_all_columns", False):
                return None
        if self.ctx.partition_col:
            cols.add(self.ctx.partition_col)
        if self.ctx.row_ref_col:
            cols.add(self.ctx.row_ref_col)
        have = set(ds.schema().names)
        if not cols or not cols.issubset(have) or cols == have:
            return None
        return sorted(cols)

    def run(self, ds, reader=None) -> ValidationResult:
        """Run every check over ``ds``.

        ``reader``: optional ``callable(columns: list[str]) -> Dataset``
        building a READ-LEVEL-pruned dataset over the same input (e.g.
        ``lambda cols: ray.data.read_parquet(files, columns=cols)``).
        Ray Data does not push ``select_columns`` into the parquet scan,
        so without a reader every branch decompresses every column —
        including the wide ``bytes`` payload branches that never touch
        it (measured 2.3x slower for a metadata-only branch).  With a
        reader, each branch scans only its own columns.
        """
        import ray.data as rd

        fused, solo = self._split()
        ctx = self.ctx
        # fail fast, driver-side, on missing columns (instead of a
        # RayTaskError deep inside a task); SchemaCheck is exempt — its
        # whole job is reporting missing columns
        have = set(ds.schema().names)
        from ..stages.row_checks import SchemaCheck

        for c in self.checks:
            if isinstance(c, SchemaCheck):
                continue
            needed = [getattr(c, "column", None)] + list(getattr(c, "columns", []) or [])
            optional = set(getattr(c, "optional_columns", []) or [])
            missing = [m for m in needed if m and m not in have and m not in optional]
            if missing:
                raise ValueError(
                    f"check {c.check_id!r} needs column(s) {missing} "
                    f"not present in dataset schema {sorted(have)}"
                )
        pieces = []
        piece_pool = []
        if fused:
            cols = self._pruned_columns(ds, fused)
            if cols and reader is not None:
                fused_input = reader(cols)
            elif cols:
                fused_input = ds.select_columns(cols)
            else:
                fused_input = ds
            checks = list(fused)

            def run_fused(batch: pa.Table) -> pa.Table:
                outs = [c.kernel(batch, ctx) for c in checks]
                outs = [o for o in outs if o.num_rows]
                if not outs:
                    return empty_violations()
                return pa.concat_tables(outs)

            pieces.append(
                fused_input.map_batches(
                    run_fused, batch_format="pyarrow", zero_copy_batch=True
                )
            )
            piece_pool.append(False)
        for c in solo:
            c_input = ds
            if reader is not None:
                c_cols = c.input_columns(ctx, have)
                if c_cols:
                    c_input = reader(c_cols)
            pieces.append(c.violations(c_input, ctx))
            piece_pool.append(bool(getattr(c, "actor_pool", False)))
        # seed the union with a known-schema empty block so the lazy
        # violations Dataset always resolves ``.schema()`` to
        # VIOLATION_SCHEMA (a bare union of map_batches branches has no
        # schema until executed — on an empty input a user probing
        # ``.schema()`` before materializing used to get ``None``)
        violations = rd.from_arrow(empty_violations())
        for p in pieces:
            violations = violations.union(p)
        return ValidationResult(violations, self.checks, ctx, pieces=pieces,
                                piece_is_actor_pool=piece_pool)


def violation_examples(violations_ds, *, k: int = 3):
    """Deterministic EXAMPLE rows per check: for each ``check_id``, the
    k violations with the smallest md5 of ``(row_ref, kind)`` — a
    stable pseudo-random sample a report can show ("here are three
    offending rows") that two runs, or two engines, pick identically.
    Built on the grouped-top-k combiner (shuffle moves <= k rows per
    check per block).  Output: (check_id, row_ref, kind, pick).
    """
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.window import grouped_topk

    def add_pick(batch: pa.Table) -> pa.Table:
        rr = pc.fill_null(pc.cast(batch.column("row_ref"),
                                  pa.string()), "").to_pylist()
        kd = pc.fill_null(pc.cast(batch.column("kind"),
                                  pa.string()), "").to_pylist()
        pick = np.array([
            int(hashlib.md5(f"{a}|{b}".encode()).hexdigest()[:15], 16)
            for a, b in zip(rr, kd)], dtype=np.int64)
        return batch.select(["check_id", "row_ref", "kind"]
                            ).append_column("pick", pa.array(pick))

    withpick = violations_ds.map_batches(
        add_pick, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_topk(withpick, by="check_id", order_col="pick", k=k,
                        descending=False, tie_col="pick",
                        keep_cols=["row_ref", "kind"])
