"""Global (shuffle-backed) checks: uniqueness, set membership, referential.

Reference semantics (name citations only; SURVEY.md §0):
``datatest/requirements.py :: RequiredSet, RequiredSubset, RequiredSuperset,
RequiredUnique``.

Scale design (SURVEY.md §7.4): every check here pre-aggregates INSIDE
``map_batches`` (per-batch ``value_counts`` / distinct) before any
``groupby`` shuffle, so the all-to-all exchange moves one row per
distinct value per block — not one row per input row.  Referential checks
against a second Dataset use the union-tag pattern (tag rows with their
side, one groupby, no join operator needed) which is a single hash
shuffle over DISTINCT keys only.

Set-comparison semantics are over DISTINCT values, matching the
reference: ``validate(['x','x','y'], {'x','y','w'})`` yields exactly
``[Missing('w')]`` — duplicates do not multiply Extras.
"""

from __future__ import annotations

from typing import Iterable, Optional, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..differences import empty_violations, violations_table
from .base import Check, RunContext

__all__ = ["UniqueCheck", "SetCheck", "SubsetCheck", "SupersetCheck", "GroupSizeCheck"]


def _norm_type(t: pa.DataType) -> pa.DataType:
    """Common key type so both sides of a referential check align."""
    if pa.types.is_integer(t):
        return pa.int64()
    if pa.types.is_floating(t):
        return pa.float64()
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pa.string()
    return pa.string()


def _cast_key(arr: pa.ChunkedArray) -> pa.Array:
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    target = _norm_type(arr.type)
    if arr.type.equals(target):
        return arr
    return arr.cast(target, safe=False)


def _value_num(values: pa.Array):
    if pa.types.is_integer(values.type) or pa.types.is_floating(values.type):
        return values.cast(pa.float64())
    return None


class UniqueCheck(Check):
    """Elements of a column must be unique (reference ``validate.unique``
    / ``RequiredUnique``): duplicates yield ``Extra`` violations.

    Plan: per-batch ``pc.value_counts`` partials -> ``groupby(value)
    .aggregate(Sum(n))`` over partials -> filter ``n > 1``.  The shuffle
    carries at most one row per distinct value per block.

    ``emit='per_value'`` (default, scale-safe): one violation row per
    duplicated value, with ``value_num = total count`` and ``deviation =
    count - 1`` (number of surplus occurrences).  ``emit=
    'per_occurrence'`` expands to count-1 identical ``Extra`` rows for
    exact reference-multiset parity (bounded data only).

    ``column`` may be a list/tuple of columns for a COMPOSITE key
    (reference ``validate.unique`` over zipped columns): the key is the
    ``'|'``-joined string cast of the parts, so a SQL oracle mirrors it
    with ``CAST(a AS VARCHAR) || '|' || CAST(b AS VARCHAR)``.  Composite
    parts should be integers/strings (float string-casts are
    locale-fragile).
    """

    def __init__(self, column, emit: str = "per_value",
                 check_id: Optional[str] = None):
        assert emit in ("per_value", "per_occurrence")
        if isinstance(column, (list, tuple)):
            self.columns = list(column)
            self.column = None
            name = ",".join(self.columns)
        else:
            self.columns = [column]
            self.column = column
            name = column
        self.emit = emit
        self.check_id = check_id or f"unique({name})"

    def _key_array(self, batch: pa.Table) -> pa.Array:
        if self.column is not None:
            return _cast_key(batch.column(self.column))
        parts = [pc.cast(batch.column(c), pa.string())
                 for c in self.columns]
        return pc.binary_join_element_wise(*parts, "|").combine_chunks()

    def violations(self, ds, ctx: RunContext):
        from ray.data.aggregate import Sum

        cols = list(self.columns)
        key_array = self._key_array

        def partial(batch: pa.Table) -> pa.Table:
            vc = pc.value_counts(key_array(batch))
            return pa.table({"v": vc.field("values"),
                             "n": vc.field("counts").cast(pa.int64())})

        from .base import coalesced
        from ..functions.aggregates import hash64

        partials = coalesced(
            ds.select_columns(cols).map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            ctx,
        )
        # ONE shuffle on a bounded coarse key (hash of the value), then a
        # fully vectorized per-group combine — never a groupby with one
        # tiny group per distinct value
        _ = Sum  # Ray built-in kept for the decomposable-aggregate variants

        def add_coarse(batch: pa.Table) -> pa.Table:
            h = hash64(batch.column("v")) % np.uint64(256)
            return batch.append_column("coarse", pa.array(h.astype(np.int64)))

        partials = partials.map_batches(
            add_coarse, batch_format="pyarrow", zero_copy_batch=True
        )

        check_id, emit = self.check_id, self.emit
        default_part = ctx.default_partition

        def combine_to_violations(group: pa.Table) -> pa.Table:
            values = group.column("v").combine_chunks()
            n = group.column("n").to_numpy(zero_copy_only=False)
            v_np = values.to_numpy(zero_copy_only=False)
            order = np.argsort(v_np, kind="stable")
            v_np, n = v_np[order], n[order]
            new_seg = np.ones(len(v_np), dtype=bool)
            if len(v_np):
                new_seg[1:] = v_np[1:] != v_np[:-1]
            seg = np.cumsum(new_seg) - 1
            totals = np.bincount(seg, weights=n).astype(np.int64)
            first = np.flatnonzero(new_seg)
            dup = totals > 1
            if not dup.any():
                return empty_violations()
            take = pa.array(order[first[dup]])
            dup_values = values.take(take)
            counts = totals[dup]
            if emit == "per_value":
                return violations_table(
                    len(counts), check_id=check_id, kind="extra",
                    partition_id=default_part, value=dup_values,
                    value_num=_value_num(dup_values),
                    deviation=pa.array((counts - 1).astype(np.float64)),
                )
            reps = (counts - 1).astype(np.int64)
            idx = np.repeat(np.arange(len(reps)), reps)
            values_rep = dup_values.take(pa.array(idx))
            return violations_table(
                len(idx), check_id=check_id, kind="extra",
                partition_id=default_part, value=values_rep,
                value_num=_value_num(values_rep),
            )

        return partials.groupby("coarse").map_groups(
            combine_to_violations, batch_format="pyarrow"
        )


def _distinct_partials(ds, column: str):
    """Dataset of one row per distinct value per block: {'v': ...}."""

    def partial(batch: pa.Table) -> pa.Table:
        return pa.table({"v": pc.unique(_cast_key(batch.column(column)))})

    return ds.select_columns([column]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )


def _distinct(ds, column: str):
    """Globally-distinct values dataset {'v': ...}: ONE shuffle on a
    bounded coarse key, Arrow-native dedup inside each group (never a
    groupby with one group per distinct value)."""
    from ..functions.aggregates import hash64

    def add_coarse(t: pa.Table) -> pa.Table:
        coarse = (hash64(t.column("v")) % np.uint64(256)).astype(np.int64)
        return pa.table({"coarse": pa.array(coarse), "v": t.column("v")})

    def dedup_group(group: pa.Table) -> pa.Table:
        return group.select(["v"]).group_by("v").aggregate([])

    if column != "v":
        ds = _distinct_partials(ds, column)  # output column is 'v'
    return (
        ds.map_batches(add_coarse, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse")
        .map_groups(dedup_group, batch_format="pyarrow")
    )


Reference = Union[Iterable, tuple]  # a literal collection, or (Dataset, column)


def _is_dataset_ref(reference) -> bool:
    import ray.data

    return (
        isinstance(reference, tuple)
        and len(reference) == 2
        and isinstance(reference[0], ray.data.Dataset)
    )


def _tagged_union_diff(data_distinct, ref_distinct, *, want: str):
    """Union-tag anti-join over distinct values.

    want='extra'   -> values present in data but not in reference
    want='missing' -> values present in reference but not in data
    want='both'    -> values present on BOTH sides (SQL INTERSECT;
                      used by stages/relational.py set ops)
    ONE hash shuffle on a bounded coarse key (hash(v) % 256) followed by
    a fully vectorized per-group set-difference — not a groupby with one
    tiny group per distinct value.
    """
    from ..functions.aggregates import hash64

    def tag(flag: int):
        def fn(t: pa.Table) -> pa.Table:
            coarse = (hash64(t.column("v")) % np.uint64(256)).astype(np.int64)
            return pa.table({
                "coarse": pa.array(coarse),
                "v": t.column("v"),
                "in_data": pa.array(
                    np.full(t.num_rows, flag, dtype=np.int8)),
            })
        return fn

    d = data_distinct.map_batches(tag(1), batch_format="pyarrow")
    r = ref_distinct.map_batches(tag(0), batch_format="pyarrow")

    if want not in ("extra", "missing", "both"):
        raise ValueError(f"unknown want: {want!r}")

    def diff_group(group: pa.Table) -> pa.Table:
        # fully vectorized set difference: dictionary-encode the values
        # (Arrow hash, no Python objects), then two boolean scatters by
        # side tell which dictionary slots exist on each side
        flags = group.column("in_data").to_numpy(zero_copy_only=False)
        v = group.column("v")
        v = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
        enc = pc.dictionary_encode(v)
        codes = np.asarray(enc.indices)
        n_slots = len(enc.dictionary)
        has_d = np.zeros(n_slots, dtype=bool)
        has_r = np.zeros(n_slots, dtype=bool)
        has_d[codes[flags == 1]] = True
        has_r[codes[flags == 0]] = True
        if want == "extra":
            wanted = has_d & ~has_r
        elif want == "missing":
            wanted = has_r & ~has_d
        else:
            wanted = has_d & has_r
        # one row per value, straight from the dictionary
        return pa.table({"v": enc.dictionary.filter(pa.array(wanted))})

    return d.union(r).groupby("coarse").map_groups(
        diff_group, batch_format="pyarrow"
    ).select_columns(["v"])


def _literal_ref_dataset(values, like_type: Optional[pa.DataType] = None):
    import ray.data as rd

    arr = pa.array(list(values))
    arr = _cast_key(arr)
    return rd.from_arrow(pa.table({"v": arr}))


def _emit_value_violations(vds, *, check_id: str, kind: str, default_part: str,
                           expected: Optional[str] = None):
    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty_violations()
        values = batch.column("v").combine_chunks()
        return violations_table(
            batch.num_rows, check_id=check_id, kind=kind,
            partition_id=default_part, value=values,
            value_num=_value_num(values), expected=expected,
        )

    return vds.map_batches(fn, batch_format="pyarrow")


class SubsetCheck(Check):
    """Distinct data values must be a SUBSET of the reference domain
    (reference ``validate.subset`` / ``RequiredSubset``, final upstream
    orientation — SURVEY.md §2.B7 caveat pinned by tests): stray values
    -> ``Extra``.

    ``reference`` is either a literal collection (broadcast, no shuffle
    beyond the distinct) or ``(Dataset, column)`` for referential
    integrity (FK) via the union-tag anti-join.
    """

    def __init__(self, column: str, reference, check_id: Optional[str] = None):
        self.column = column
        self.reference = reference
        self.check_id = check_id or f"subset({column})"

    def violations(self, ds, ctx: RunContext):
        if _is_dataset_ref(self.reference):
            ref_ds, ref_col = self.reference
            extras = _tagged_union_diff(
                _distinct_partials(ds, self.column),
                _distinct_partials(ref_ds, ref_col),
                want="extra",
            )
            return _emit_value_violations(
                extras, check_id=self.check_id, kind="extra",
                default_part=ctx.default_partition,
            )
        allowed = set(self.reference)
        col = self.column

        def partial(batch: pa.Table) -> pa.Table:
            uniq = pc.unique(_cast_key(batch.column(col)))
            vs = _cast_key(pa.array(list(allowed)))
            mask = pc.invert(pc.is_in(uniq, value_set=vs))
            mask = pc.fill_null(mask, True)  # nulls are never in a literal set
            return pa.table({"v": uniq.filter(mask)})

        extras = (
            ds.select_columns([col])
            .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        )
        extras = _distinct(extras, "v")
        return _emit_value_violations(
            extras, check_id=self.check_id, kind="extra",
            default_part=ctx.default_partition,
        )


class SupersetCheck(Check):
    """Distinct data values must be a SUPERSET of the reference
    (reference ``validate.superset`` / ``RequiredSuperset``): required
    values never observed -> ``Missing``.

    Literal reference: per-batch 'seen required values' partials (each at
    most |required| rows) -> distinct -> required minus seen.  Dataset
    reference: union-tag anti-join over distincts.
    """

    def __init__(self, column: str, reference, check_id: Optional[str] = None):
        self.column = column
        self.reference = reference
        self.check_id = check_id or f"superset({column})"

    def violations(self, ds, ctx: RunContext):
        import ray.data as rd

        if _is_dataset_ref(self.reference):
            ref_ds, ref_col = self.reference
            missing = _tagged_union_diff(
                _distinct_partials(ds, self.column),
                _distinct_partials(ref_ds, ref_col),
                want="missing",
            )
            return _emit_value_violations(
                missing, check_id=self.check_id, kind="missing",
                default_part=ctx.default_partition,
            )

        required = set(self.reference)
        col = self.column
        req_arr = _cast_key(pa.array(list(required)))

        def seen_partial(batch: pa.Table) -> pa.Table:
            uniq = pc.unique(_cast_key(batch.column(col)))
            mask = pc.fill_null(pc.is_in(uniq, value_set=req_arr), False)
            return pa.table({"v": uniq.filter(mask)})

        seen = (
            ds.select_columns([col])
            .map_batches(seen_partial, batch_format="pyarrow", zero_copy_batch=True)
        )
        # seen is tiny (<= |required| rows per block): collect distinct driver-side
        seen_values = set(seen.unique("v"))
        missing_vals = [m for m in req_arr.to_pylist() if m not in seen_values]
        if not missing_vals:
            return rd.from_arrow(empty_violations())
        values = _cast_key(pa.array(missing_vals))
        table = violations_table(
            len(missing_vals), check_id=self.check_id, kind="missing",
            partition_id=ctx.default_partition, value=values,
            value_num=_value_num(values),
        )
        return rd.from_arrow(table)


class SetCheck(Check):
    """Two-sided set membership (reference auto-dispatch on a ``set``
    requirement / ``validate.set`` / ``RequiredSet``): distinct data
    values not in the requirement -> ``Extra``; required values never
    observed -> ``Missing``."""

    def __init__(self, column: str, required, check_id: Optional[str] = None):
        self.column = column
        self.required = set(required)
        self.check_id = check_id or f"set({column},{len(self.required)})"

    def violations(self, ds, ctx: RunContext):
        extra = SubsetCheck(self.column, self.required, check_id=self.check_id)
        missing = SupersetCheck(self.column, self.required, check_id=self.check_id)
        return extra.violations(ds, ctx).union(missing.violations(ds, ctx))


class RareCategoryCheck(Check):
    """Categories whose share of rows falls below ``min_share`` are
    flagged ``Invalid`` — the classic typo/corrupted-enum detector
    (reference analogue: a ``validate.set`` over an *unknown* domain;
    here the domain is learned from the data itself).

    Plan: per-batch ``pc.value_counts`` partials -> ONE coarse-key
    shuffle with a vectorized segment combine (same shape as
    UniqueCheck) -> the per-category count table is materialized (it is
    bounded by the categorical cardinality, not the row count), the
    grand total reduced from it, and violations emitted per rare
    category with ``deviation = share - min_share`` (negative).
    """

    def __init__(self, column: str, min_share: float = 0.01,
                 check_id: Optional[str] = None):
        self.column = column
        self.min_share = float(min_share)
        self.check_id = check_id or f"rare({column},{min_share})"

    def violations(self, ds, ctx: RunContext):
        import ray.data as rd

        from ..functions.aggregates import hash64
        from .base import coalesced

        col = self.column

        def partial(batch: pa.Table) -> pa.Table:
            vc = pc.value_counts(_cast_key(batch.column(col)))
            return pa.table({"v": vc.field("values"),
                             "n": vc.field("counts").cast(pa.int64())})

        partials = coalesced(
            ds.select_columns([col]).map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            ctx,
        )

        def add_coarse(batch: pa.Table) -> pa.Table:
            h = hash64(batch.column("v")) % np.uint64(256)
            return batch.append_column("coarse", pa.array(h.astype(np.int64)))

        partials = partials.map_batches(
            add_coarse, batch_format="pyarrow", zero_copy_batch=True
        )

        def combine_counts(group: pa.Table) -> pa.Table:
            values = group.column("v").combine_chunks()
            n = group.column("n").to_numpy(zero_copy_only=False)
            v_np = values.to_numpy(zero_copy_only=False)
            order = np.argsort(v_np, kind="stable")
            v_np, n = v_np[order], n[order]
            new_seg = np.ones(len(v_np), dtype=bool)
            if len(v_np):
                new_seg[1:] = v_np[1:] != v_np[:-1]
            seg = np.cumsum(new_seg) - 1
            totals = np.bincount(seg, weights=n).astype(np.int64)
            first = np.flatnonzero(new_seg)
            return pa.table({
                "v": values.take(pa.array(order[first])),
                "n": pa.array(totals),
            })

        counts = partials.groupby("coarse").map_groups(
            combine_counts, batch_format="pyarrow"
        )
        # Bounded by categorical cardinality (one row per distinct
        # value), NOT by input rows — safe to pin so the plan is read
        # once for both the total and the filter.
        counts = counts.materialize()
        total = counts.sum("n") or 0

        check_id, ms = self.check_id, self.min_share
        default_part = ctx.default_partition
        tot = float(total)

        def emit(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or tot <= 0:
                return empty_violations()
            n = batch.column("n").to_numpy(zero_copy_only=False)
            share = n / tot
            rare = share < ms
            if not rare.any():
                return empty_violations()
            values = batch.column("v").combine_chunks().filter(pa.array(rare))
            return violations_table(
                int(rare.sum()), check_id=check_id, kind="invalid",
                partition_id=default_part, value=values,
                value_num=pa.array(n[rare].astype(np.float64)),
                deviation=pa.array(share[rare] - ms),
            )

        return counts.map_batches(
            emit, batch_format="pyarrow", zero_copy_batch=True
        )


class CompletenessCheck(Check):
    """Per-column completeness: a column whose NULL share exceeds
    ``max_null_share`` fails (reference analogue: a required-value
    predicate over every row; the canonical 'column went dark upstream'
    detector).

    Plan: each batch reduces to ONE row of per-column null counts +
    row count; ``Dataset.sum`` combines the partials (shuffle moves one
    tiny row per block).  One ``Missing`` violation per failing column:
    ``key`` = column name, ``value_num`` = null count, ``deviation`` =
    null share - max_null_share (positive).
    """

    def __init__(self, columns, max_null_share: float = 0.0,
                 check_id: Optional[str] = None):
        self.columns = list(columns)
        self.max_null_share = float(max_null_share)
        self.check_id = check_id or (
            f"completeness({','.join(self.columns)},{max_null_share})"
        )

    def violations(self, ds, ctx: RunContext):
        import ray.data as rd

        cols = self.columns

        def partial(batch: pa.Table) -> pa.Table:
            out = {"rows": pa.array([batch.num_rows], pa.int64())}
            for c in cols:
                out[f"nulls_{c}"] = pa.array(
                    [batch.column(c).null_count], pa.int64()
                )
            return pa.table(out)

        sums = ds.select_columns(cols).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).sum(["rows"] + [f"nulls_{c}" for c in cols])
        sums = sums or {}
        total = sums.get("sum(rows)", 0) or 0

        bad_cols, bad_nulls, bad_dev = [], [], []
        if total > 0:
            for c in cols:
                n_null = sums.get(f"sum(nulls_{c})", 0) or 0
                share = n_null / total
                if share > self.max_null_share:
                    bad_cols.append(c)
                    bad_nulls.append(float(n_null))
                    bad_dev.append(share - self.max_null_share)
        if not bad_cols:
            return rd.from_arrow(empty_violations())
        table = violations_table(
            len(bad_cols), check_id=self.check_id, kind="missing",
            partition_id=ctx.default_partition,
            key=pa.array(bad_cols),
            value_num=pa.array(bad_nulls),
            deviation=pa.array(bad_dev),
        )
        return rd.from_arrow(table)


class GroupSizeCheck(Check):
    """Every ``group_col`` group's row count must lie in
    ``[min_rows, max_rows]`` — the "entity volume" invariant (a user
    with 10k events, a source shard with 3 rows).  Out-of-bounds groups
    emit one ``deviation`` row: ``key`` = group, ``value_num`` = count,
    ``expected_num`` = the violated bound, ``deviation`` = signed
    excess.

    Plan: per-batch ``value_counts`` partials -> coarse-bucket shuffle
    on the group hash -> vectorized segment combine (same shape as
    :class:`UniqueCheck`; the shuffle carries one row per group per
    block, never the rows).

    ``group_col`` may be a LIST of columns — the composite (pipe-joined
    string) key, which with ``min_rows=k`` is exactly a K-ANONYMITY
    check over quasi-identifier columns: every combination observed
    fewer than k times is a re-identification risk and emits a row."""

    def __init__(self, group_col, *, min_rows: int = 1,
                 max_rows: Optional[int] = None,
                 check_id: Optional[str] = None):
        if isinstance(group_col, (list, tuple)):
            self.columns = list(group_col)
            self.group_col = None
            name = ",".join(self.columns)
        else:
            self.columns = [group_col]
            self.group_col = group_col
            name = group_col
        self.min_rows = int(min_rows)
        self.max_rows = int(max_rows) if max_rows is not None else None
        hi = self.max_rows if self.max_rows is not None else "inf"
        self.check_id = check_id or (
            f"group_size({name} in [{min_rows},{hi}])")

    def _key_array(self, batch: pa.Table) -> pa.Array:
        if self.group_col is not None:
            return _cast_key(batch.column(self.group_col))
        parts = [pc.cast(batch.column(c), pa.string())
                 for c in self.columns]
        return pc.binary_join_element_wise(*parts, "|").combine_chunks()

    def violations(self, ds, ctx: RunContext):
        from ..functions.aggregates import hash64
        from .base import coalesced

        cols = list(self.columns)
        key_array = self._key_array
        lo, hi = self.min_rows, self.max_rows
        check_id = self.check_id
        default_part = ctx.default_partition

        def partial(batch: pa.Table) -> pa.Table:
            vc = pc.value_counts(key_array(batch))
            return pa.table({"v": vc.field("values"),
                             "n": vc.field("counts").cast(pa.int64())})

        def add_coarse(batch: pa.Table) -> pa.Table:
            h = hash64(batch.column("v")) % np.uint64(256)
            return batch.append_column("coarse", pa.array(h.astype(np.int64)))

        def combine(group: pa.Table) -> pa.Table:
            values = group.column("v").combine_chunks()
            n = group.column("n").to_numpy(zero_copy_only=False)
            v_np = values.to_numpy(zero_copy_only=False)
            order = np.argsort(v_np, kind="stable")
            v_np, n = v_np[order], n[order]
            new_seg = np.ones(len(v_np), dtype=bool)
            if len(v_np):
                new_seg[1:] = v_np[1:] != v_np[:-1]
            seg = np.cumsum(new_seg) - 1
            totals = np.bincount(seg, weights=n).astype(np.int64)
            first = np.flatnonzero(new_seg)
            low = totals < lo
            high = (totals > hi) if hi is not None else np.zeros(
                len(totals), dtype=bool)
            bad = low | high
            if not bad.any():
                return empty_violations()
            counts = totals[bad]
            bound = np.where(low[bad], float(lo),
                             float(hi if hi is not None else 0))
            keys = values.take(pa.array(order[first[bad]]))
            return violations_table(
                len(counts), check_id=check_id, kind="deviation",
                partition_id=default_part,
                key=pc.cast(keys, pa.string()),
                value_num=pa.array(counts.astype(np.float64)),
                expected_num=pa.array(bound),
                deviation=pa.array(counts - bound),
            )

        partials = coalesced(
            ds.select_columns(cols).map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True),
            ctx,
        ).map_batches(add_coarse, batch_format="pyarrow",
                      zero_copy_batch=True)
        return partials.groupby("coarse").map_groups(
            combine, batch_format="pyarrow")
