"""Distributed table diff (SURVEY.md §2.A10 at scale).

The reference's core call — ``validate(data, requirement)`` where the
requirement is ANOTHER dataset keyed by the same ids (upstream
``datatest/requirements.py :: RequiredMapping``) — re-expressed as one
full-outer hash join plus vectorized per-column compares:

* a key present in ``actual`` but not in ``reference`` -> ``extra``;
* a key present in ``reference`` but not in ``actual`` -> ``missing``;
* a key in both with any compared column differing -> one ``invalid``
  row PER DIFFERING COLUMN (``key`` = column name, ``row_ref`` = the
  join key, ``value``/``expected`` = both sides; numeric columns also
  carry ``deviation = actual - expected``).

The join is the only all-to-all; column compares are Arrow kernels on
the joined batches (nulls compare equal to nulls, unequal to values).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..differences import empty_violations, violations_table
from .base import Check, RunContext

__all__ = ["TableCompareCheck", "compare_tables", "JoinConsistencyCheck", "bucket_checksums", "checksum_reconcile"]

_A_MARK = "__dtc_in_actual"
_B_MARK = "__dtc_in_reference"
_REF_SUFFIX = "__ref"


def compare_tables(actual_ds, reference_ds, *, key: str,
                   columns: Sequence[str], check_id: str = "compare",
                   num_partitions: int = 8, ctx: Optional[RunContext] = None):
    """Violations Dataset from diffing ``actual_ds`` against
    ``reference_ds`` on ``key`` over ``columns``.  See module docstring
    for the emitted kinds."""
    from .relational import safe_join

    ctx = ctx or RunContext()
    cols = list(columns)

    def mark_a(t: pa.Table) -> pa.Table:
        return t.select([key] + cols).append_column(
            _A_MARK, pa.array(np.ones(t.num_rows, dtype=np.int8)))

    def mark_b(t: pa.Table) -> pa.Table:
        out = pa.table({key: t.column(key)}
                       | {c + _REF_SUFFIX: t.column(c) for c in cols})
        return out.append_column(
            _B_MARK, pa.array(np.ones(t.num_rows, dtype=np.int8)))

    a = actual_ds.map_batches(mark_a, batch_format="pyarrow",
                              zero_copy_batch=True)
    b = reference_ds.map_batches(mark_b, batch_format="pyarrow",
                                 zero_copy_batch=True)
    joined = safe_join(a, b, join_type="full_outer",
                       num_partitions=num_partitions, on=key)

    check_id_ = check_id
    default_part = ctx.default_partition

    def kernel(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return empty_violations()
        in_a = pc.is_valid(t.column(_A_MARK)).to_numpy(
            zero_copy_only=False)
        in_b = pc.is_valid(t.column(_B_MARK)).to_numpy(
            zero_copy_only=False)
        keys = pc.cast(t.column(key), pa.string())
        out = []
        only_a = in_a & ~in_b
        if only_a.any():
            idx = pa.array(np.flatnonzero(only_a))
            out.append(violations_table(
                int(only_a.sum()), check_id=check_id_, kind="extra",
                partition_id=default_part, row_ref=keys.take(idx),
            ))
        only_b = in_b & ~in_a
        if only_b.any():
            idx = pa.array(np.flatnonzero(only_b))
            out.append(violations_table(
                int(only_b.sum()), check_id=check_id_, kind="missing",
                partition_id=default_part, row_ref=keys.take(idx),
            ))
        both = in_a & in_b
        if both.any():
            for c in cols:
                av = t.column(c)
                bv = t.column(c + _REF_SUFFIX)
                ne = pc.fill_null(pc.not_equal(av, bv), False).to_numpy(
                    zero_copy_only=False)
                # null-vs-value mismatches (null==null counts as equal)
                a_null = pc.is_null(av).to_numpy(zero_copy_only=False)
                b_null = pc.is_null(bv).to_numpy(zero_copy_only=False)
                bad = both & (ne | (a_null ^ b_null))
                if not bad.any():
                    continue
                idx = pa.array(np.flatnonzero(bad))
                value = pc.cast(av, pa.string()).take(idx)
                expected = pc.cast(bv, pa.string()).take(idx)
                numeric = (pa.types.is_integer(av.type)
                           or pa.types.is_floating(av.type))
                dev = None
                if numeric:
                    dev = pc.subtract(
                        pc.cast(av, pa.float64()),
                        pc.cast(bv, pa.float64())).take(idx)
                out.append(violations_table(
                    len(idx), check_id=check_id_, kind="invalid",
                    partition_id=default_part, key=c,
                    row_ref=keys.take(idx), value=value,
                    expected=expected, deviation=dev,
                ))
        if not out:
            return empty_violations()
        return pa.concat_tables(out)

    return joined.map_batches(kernel, batch_format="pyarrow")


class TableCompareCheck(Check):
    """Check-protocol wrapper around :func:`compare_tables` so a dataset
    diff can ride inside a :class:`~..pipelines.suite.CheckSuite`."""

    def __init__(self, reference_ds, *, key: str, columns: Sequence[str],
                 check_id: Optional[str] = None, num_partitions: int = 8):
        self.reference_ds = reference_ds
        self.key = key
        self.compare_columns = list(columns)
        self.columns = [key] + list(columns)
        self.num_partitions = num_partitions
        self.check_id = check_id or (
            f"compare({key}:{','.join(columns)})")

    def violations(self, ds, ctx: RunContext):
        return compare_tables(
            ds, self.reference_ds, key=self.key,
            columns=self.compare_columns, check_id=self.check_id,
            num_partitions=self.num_partitions, ctx=ctx)


_OPS = {
    ">=": "greater_equal", ">": "greater",
    "<=": "less_equal", "<": "less",
    "==": "equal", "!=": "not_equal",
}


def _as_f64(arr: pa.ChunkedArray) -> pa.ChunkedArray:
    """Timestamps become epoch seconds; numerics become float64 — one
    comparable numeric frame for both sides (and for a SQL oracle via
    epoch_us(ts)/1e6)."""
    t = arr.type
    if pa.types.is_timestamp(t):
        return pc.divide(pc.cast(arr, pa.int64()).cast(pa.float64()),
                         1_000_000.0)
    return pc.cast(arr, pa.float64())


class JoinConsistencyCheck(Check):
    """Cross-TABLE field consistency: after joining ``ds`` (detail) to
    ``right_ds`` (header) on a key, ``left_col OP right_col`` must hold
    for every row (e.g. every lineitem ships on/after its order date).
    Violating rows emit one ``deviation`` row: ``key`` = join key,
    ``value_num`` = left value, ``expected_num`` = right value,
    ``deviation`` = left − right (timestamps in epoch seconds).

    One inner hash join (safe_join guards) + a vectorized compare on
    the joined batches; the right side ships only its key + one column.
    """

    def __init__(self, right_ds, *, on: str, right_on: str,
                 left_col: str, right_col: str, op: str = ">=",
                 check_id: Optional[str] = None, num_partitions: int = 8):
        if op not in _OPS:
            raise ValueError(f"unsupported op {op!r}")
        self.right_ds = right_ds
        self.on = on
        self.right_on = right_on
        self.left_col = left_col
        self.right_col = right_col
        self.op = op
        self.num_partitions = num_partitions
        self.columns = [on, left_col]
        self.check_id = check_id or (
            f"join_consistency({left_col} {op} {right_col})")

    def violations(self, ds, ctx: RunContext):
        from .relational import safe_join

        on, left_col, right_col = self.on, self.left_col, self.right_col
        ok_kernel = getattr(pc, _OPS[self.op])
        check_id = self.check_id
        default_part = ctx.default_partition

        right = self.right_ds.select_columns(
            [self.right_on, right_col])
        joined = safe_join(
            ds.select_columns([on, left_col]), right,
            join_type="inner", num_partitions=self.num_partitions,
            on=on, right_on=self.right_on)

        def kernel(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return empty_violations()
            lv = _as_f64(t.column(left_col))
            rv = _as_f64(t.column(right_col))
            if isinstance(lv, pa.ChunkedArray):
                lv = lv.combine_chunks()
            if isinstance(rv, pa.ChunkedArray):
                rv = rv.combine_chunks()
            ok = pc.fill_null(ok_kernel(lv, rv), True)
            bad = pc.invert(ok).to_numpy(zero_copy_only=False)
            if not bad.any():
                return empty_violations()
            idx = pa.array(np.flatnonzero(bad))
            return violations_table(
                len(idx), check_id=check_id, kind="deviation",
                partition_id=default_part,
                key=pc.cast(t.column(on), pa.string()).take(idx),
                value_num=lv.take(idx),
                expected_num=rv.take(idx),
                deviation=pc.subtract(lv, rv).take(idx),
            )

        return joined.map_batches(kernel, batch_format="pyarrow")


def _md5_digests(batch: pa.Table, key_col: str, columns: Sequence[str],
                 n_buckets: int):
    """Per-row (bucket, digest): bucket = md5(key) % n_buckets, digest =
    40-bit md5 of the '|'-joined row representation (nulls encode as
    '').  md5 (not the engine's fast hash64) so a SQL oracle recomputes
    both identically; 40-bit digests keep bucket SUMS inside int64 far
    past 10^9 rows per bucket."""
    import hashlib

    strs = [pc.cast(batch.column(key_col), pa.string()).to_pylist()]
    for c in columns:
        strs.append(pc.cast(batch.column(c), pa.string()).to_pylist())
    buckets = np.empty(batch.num_rows, dtype=np.int64)
    digests = np.empty(batch.num_rows, dtype=np.int64)
    for i, row in enumerate(zip(*strs)):
        key = "" if row[0] is None else row[0]
        buckets[i] = int(hashlib.md5(key.encode()).hexdigest()[:8],
                         16) % n_buckets
        joined = "|".join("" if x is None else x for x in row)
        digests[i] = int(hashlib.md5(joined.encode()).hexdigest()[:10], 16)
    return buckets, digests


def bucket_checksums(ds, *, key_col: str, columns: Sequence[str],
                     n_buckets: int = 64):
    """Per-bucket checksum: SUM of 40-bit row digests grouped by
    ``md5(key) % n_buckets`` — a table fingerprint in n_buckets rows."""
    from ray.data.aggregate import Sum

    cols = list(columns)

    def partial(batch: pa.Table) -> pa.Table:
        b, d = _md5_digests(batch, key_col, cols, n_buckets)
        t = pa.table({"bucket": pa.array(b), "d": pa.array(d)})
        g = t.group_by("bucket").aggregate([("d", "sum")])
        return pa.table({"bucket": g.column("bucket"),
                         "checksum": g.column("d_sum").cast(pa.int64())})

    return ds.select_columns([key_col] + cols).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("bucket").aggregate(Sum("checksum", alias_name="checksum"))


def checksum_reconcile(actual_ds, reference_ds, *, key_col: str,
                       columns: Sequence[str], n_buckets: int = 64,
                       num_partitions: int = 8):
    """The CDC reconcile PREFILTER: compare two tables by n_buckets
    checksums instead of row-by-row — identical tables agree on every
    bucket; a mismatched bucket names the key range to re-diff with
    :func:`compare_tables`.  Shuffle payload is O(n_buckets) per block
    per side; the full-row diff only ever runs on flagged buckets.

    Returns (bucket, sum_actual, sum_reference, match) — one row per
    bucket present on either side."""
    from .relational import safe_join

    a = bucket_checksums(actual_ds, key_col=key_col, columns=columns,
                         n_buckets=n_buckets)
    b = bucket_checksums(reference_ds, key_col=key_col, columns=columns,
                         n_buckets=n_buckets)

    def rename_b(t: pa.Table) -> pa.Table:
        return pa.table({"bucket": t.column("bucket"),
                         "checksum_ref": t.column("checksum")})

    hint_a = pa.schema([("bucket", pa.int64()), ("checksum", pa.int64())])
    hint_b = pa.schema([("bucket", pa.int64()),
                        ("checksum_ref", pa.int64())])
    joined = safe_join(
        a, b.map_batches(rename_b, batch_format="pyarrow",
                         zero_copy_batch=True),
        join_type="full_outer", num_partitions=num_partitions,
        on="bucket", left_schema=hint_a, right_schema=hint_b)

    def finalize(t: pa.Table) -> pa.Table:
        sa = t.column("checksum").cast(pa.int64())
        sb = t.column("checksum_ref").cast(pa.int64())
        match = pc.fill_null(pc.equal(sa, sb), False)
        return pa.table({
            "bucket": t.column("bucket").cast(pa.int64()),
            "sum_actual": sa,
            "sum_reference": sb,
            "match": match,
        })

    return joined.map_batches(finalize, batch_format="pyarrow")
