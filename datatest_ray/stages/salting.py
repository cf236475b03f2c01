"""Explicit salting for skewed group keys (SURVEY.md §2.I / §7.4).

A `groupby(key)` over a skewed key (the flagship table's ``fmt`` is ~90%
'jpeg'; `l_returnflag` has 3 values over the whole table) lands almost
every row on one reducer.  Salting splits each hot key across ``salt``
reducers in a first shuffle, then merges the (tiny) per-salt partials in
a second shuffle keyed by the bare key.

Two building blocks:

* :func:`salted_distinct_count` — exact COUNT(DISTINCT col) per key.
  The salt is ``hash(value) % S``, so every duplicate of a (key, value)
  pair lands in the SAME salt bucket and within-bucket dedup is globally
  exact; stage 2 just sums bucket distinct-counts.
* :func:`salted_group_map` — the general two-stage pattern for
  non-decomposable per-key work: a user ``partial_fn`` runs per
  (key, salt) group, a user ``merge_fn`` runs per key over the partials.

Decomposable aggregates (sum/count/min/max/mean) don't need salting in
this engine at all: per-batch combiners (see UniqueCheck / GroupAggCheck)
collapse each block to one row per key BEFORE the shuffle, which beats
salting whenever the per-key state is O(1).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pyarrow as pa

from ..functions.aggregates import hash64

__all__ = ["salted_distinct_count", "salted_group_map", "add_salt_column",
           "zorder_histogram", "morton_sql_expr"]


def add_salt_column(ds, on: str, salt: int, *, by_value: bool = True,
                    name: str = "_salt"):
    """Append a salt column: ``hash(on) % salt`` (by_value=True; keeps
    equal values co-located — required for dedup-style merges) or a
    round-robin row salt (by_value=False; maximal spread for pure
    load-balancing)."""

    def kernel(batch: pa.Table) -> pa.Table:
        if by_value:
            s = (hash64(batch.column(on)) % np.uint64(salt)).astype(np.int64)
        else:
            s = np.arange(batch.num_rows, dtype=np.int64) % salt
        return batch.append_column(name, pa.array(s))

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)


def salted_distinct_count(ds, key: str, col: str, *, salt: int = 32,
                          alias: str = "n_distinct"):
    """Exact ``COUNT(DISTINCT col) GROUP BY key`` with the hot key spread
    over ``salt`` reducers: (key, n_distinct).

    stage 1 (shuffle on (key, salt)): per-batch (key, salt, value)
    distinct projection, then per-group exact dedup and a partial count;
    stage 2 (tiny shuffle on key): sum of partial counts — exact because
    the value-hash salt co-locates duplicates."""
    from ray.data.aggregate import Sum

    def project(batch: pa.Table) -> pa.Table:
        k = batch.column(key)
        v = batch.column(col)
        s = (hash64(v) % np.uint64(salt)).astype(np.int64)
        t = pa.table({key: k, "_salt": pa.array(s), col: v})
        # per-batch combiner: drop duplicate (key, salt, value) rows early
        return t.group_by([key, "_salt", col]).aggregate([])

    def partial_count(group: pa.Table) -> pa.Table:
        distinct = group.group_by([key, col]).aggregate([])
        counted = distinct.group_by([key]).aggregate([(col, "count")])
        return pa.table(
            {key: counted.column(key), "_n": counted.column(f"{col}_count")}
        )

    stage1 = (
        ds.select_columns([key, col])
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key, "_salt"])
        .map_groups(partial_count, batch_format="pyarrow")
    )
    merged = stage1.groupby(key).aggregate(Sum("_n", alias_name=alias))
    return merged


def salted_group_map(ds, key: str, partial_fn: Callable, merge_fn: Callable,
                     *, salt: int = 32, on: Optional[str] = None):
    """General two-stage salted per-key computation.

    ``partial_fn(group: pa.Table) -> pa.Table`` runs once per
    (key, salt) group; ``merge_fn(group: pa.Table) -> pa.Table`` runs
    once per key over the concatenated partials.  ``on`` selects the
    salt source column (defaults to round-robin row salt)."""
    salted = add_salt_column(ds, on or key, salt, by_value=on is not None)
    partials = salted.groupby([key, "_salt"]).map_groups(
        partial_fn, batch_format="pyarrow"
    )
    return partials.groupby(key).map_groups(merge_fn, batch_format="pyarrow")


def _morton_interleave(qx: np.ndarray, qy: np.ndarray,
                       bits: int) -> np.ndarray:
    """Bit-interleaved Morton/Z code (x in the odd bits)."""
    code = np.zeros(len(qx), dtype=np.int64)
    for b in range(bits):
        code |= ((qx >> b) & 1) << (2 * b + 1)
        code |= ((qy >> b) & 1) << (2 * b)
    return code


def morton_sql_expr(x_expr: str, y_expr: str, bits: int) -> str:
    """The DuckDB expression mirroring :func:`_morton_interleave` —
    generated term-by-term so engine and oracle share ONE definition."""
    terms = []
    for b in range(bits):
        terms.append(f"((({x_expr} >> {b}) & 1) << {2 * b + 1})")
        terms.append(f"((({y_expr} >> {b}) & 1) << {2 * b})")
    return " + ".join(terms)


def zorder_histogram(ds, *, x_col: str, y_col: str,
                     x_min: float, x_max: float,
                     y_min: float, y_max: float,
                     bits: int = 8, bucket_shift: int = 10):
    """Z-order (Morton space-filling curve) locality audit — the
    layout primitive behind multi-column data clustering (Delta/Iceberg
    ``ZORDER BY``): both columns quantize to ``bits``-bit grid cells,
    the cell coordinates bit-interleave into one code, and rows bucket
    by ``code >> bucket_shift``.  Rows close in BOTH columns land in
    the same bucket, so range predicates on either column touch few
    buckets — the histogram (with each bucket's code span) is the
    pruning evidence.

    Everything after the quantization is integer-exact; the quantize
    itself is one float expression mirrored op-for-op by
    :func:`morton_sql_expr`-based SQL.  One vectorized pass + one
    small groupby(bucket) — no shuffle wider than the bucket count.

    Output: (bucket, n, code_lo, code_hi) int64.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max, Min

    hi = (1 << bits) - 1
    sx = float(2 ** bits)

    def quantize(t: pa.Table) -> pa.Table:
        ok = None
        for c in (x_col, y_col):
            v = pc.is_valid(t.column(c))
            ok = v if ok is None else pc.and_(ok, v)
        t = t.filter(ok)
        x = t.column(x_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        qx = np.clip(np.floor(((x - x_min) * sx) / (x_max - x_min)),
                     0, hi).astype(np.int64)
        qy = np.clip(np.floor(((y - y_min) * sx) / (y_max - y_min)),
                     0, hi).astype(np.int64)
        code = _morton_interleave(qx, qy, bits)
        return pa.table({"bucket": pa.array(code >> bucket_shift),
                         "code": pa.array(code)})

    agg = ds.map_batches(
        quantize, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("bucket").aggregate(
        Count(alias_name="n"), Min("code", alias_name="code_lo"),
        Max("code", alias_name="code_hi"))
    return agg.map_batches(
        lambda t: pa.table({
            "bucket": pc.cast(t.column("bucket"), pa.int64()),
            "n": pc.cast(t.column("n"), pa.int64()),
            "code_lo": pc.cast(t.column("code_lo"), pa.int64()),
            "code_hi": pc.cast(t.column("code_hi"), pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)
