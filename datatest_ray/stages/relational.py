"""Relational composition operators: semi/anti join, distinct set
operations, pivot.

Engine extensions (SURVEY.md §2.H "joins/lookups"; the reference is a
single-table validator).  All are Ray-Data-native:

- semi/anti join: right side first reduces to DISTINCT KEYS via a
  ``groupby`` (so the join input is bounded by right-key cardinality,
  not right row count), then ONE distributed hash join
  (``Dataset.join``); anti = left_outer + null-marker filter.
- set ops (EXCEPT/INTERSECT over distinct values): the same
  tagged-union coarse-bucket plan as the subset/superset checks
  (stages/global_checks.py) — ONE shuffle on ``hash(v) % 256``,
  fully vectorized per-bucket membership via dictionary-encode
  scatters.
- pivot: per-batch COMBINER (vectorized bincount over
  ``key_code * n_vals + val_idx``) so the shuffle moves one row per
  (key, block) with all pivot counts as columns, then ONE
  ``groupby(key).sum``.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["safe_join", "semi_join", "anti_join", "except_distinct",
           "intersect_distinct", "pivot_counts", "rollup_counts", "cube_counts",
           "broadcast_join", "range_join_broadcast", "pareto_front",
           "bloom_semi_join", "bloom_anti_join", "melt",
           "interval_join_bucketed", "pivot_sum", "union_distinct",
           "lookup_join", "skew_join", "topk_turnover"]

_MARK = "__dtr_semi_mark"


def _null_sentinel_like(ds):
    """One-row Dataset with ``ds``'s schema, every value null.

    Ray 2.49's hash-join aggregator crashes (ArrowInvalid FieldRef)
    when a join partition materializes one side as a schema-less empty
    table — observed whenever a side contributes zero non-empty blocks,
    and data-dependently when a sparse filtered side leaves some hash
    partitions without schema-carrying slices.  A null-key row never
    matches anything, so unioning it onto the BUILD side guarantees a
    schema-carrying block with zero effect on join semantics.
    """
    import ray.data as rd

    sch = ds.schema()
    sch = getattr(sch, "base_schema", sch)
    return rd.from_arrow(pa.table({
        f.name: pa.array([None], f.type) for f in sch
    }))


_REAL = "__dtr_real_row"
_REAL_R = "__dtr_real_row_r"


def safe_join(left_ds, right_ds, *, join_type: str, num_partitions: int,
              on, right_on=None, left_schema=None, right_schema=None):
    """``Dataset.join`` hardened against the empty/sparse-side crashes
    (see :func:`_null_sentinel_like`).  Both sides get a null-key
    sentinel.  For INNER joins an unmatched sentinel can never reach
    the output; for LEFT OUTER joins the join WOULD emit the left
    sentinel, so real left rows carry a marker column (one fused
    vectorized append — no extra pass) and a post-filter drops the
    sentinel without touching legitimate null-key left rows."""
    import ray

    on = (on,) if isinstance(on, str) else tuple(on)
    right_on = on if right_on is None else (
        (right_on,) if isinstance(right_on, str) else tuple(right_on))
    # cap the aggregator pool to the cluster (the executor holds every
    # join's actor pool alive for the whole plan — an oversized pool
    # deadlocks small-CPU sessions before any task runs)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    num_partitions = max(2, min(num_partitions, cpus))
    if join_type == "inner":
        right_ds = _null_sentinel_like(right_ds).union(right_ds)
        left_ds = _null_sentinel_like(left_ds).union(left_ds)
        return left_ds.join(right_ds, join_type=join_type,
                            num_partitions=num_partitions,
                            on=on, right_on=right_on)

    import ray.data as rd

    def _marked(side_ds, marker: str, schema_hint=None):
        """Real rows carry ``marker=True``; a null-key sentinel row
        (marker NULL) is unioned so the side never reaches the hash
        aggregator with zero non-empty blocks.  Sentinel schema comes
        from the ORIGINAL side (a fully-empty mapped dataset reports no
        schema at all); a FULLY-empty side (e.g. an aggregate of zero
        rows) reports None — callers cover that with a schema hint."""
        def mark(t: pa.Table) -> pa.Table:
            return t.append_column(
                marker, pa.array(np.ones(t.num_rows, dtype=bool)))

        sch = side_ds.schema()
        sch = getattr(sch, "base_schema", sch)
        if sch is None:
            sch = schema_hint
        if sch is None:
            raise ValueError(
                "safe_join: side is empty with unknown schema; pass "
                "left_schema/right_schema so the sentinel (and the join "
                "output) keep their columns")
        sent = rd.from_arrow(pa.table(
            {f.name: pa.array([None], f.type) for f in sch}
            | {marker: pa.array([None], pa.bool_())}))
        return sent.union(side_ds.map_batches(
            mark, batch_format="pyarrow", zero_copy_batch=True))

    marked = _marked(left_ds, _REAL, left_schema)
    if join_type == "full_outer":
        # a full-outer join emits each side's unmatched sentinel as a
        # half-null row; one marker per side distinguishes those from
        # legitimate unmatched rows of the OTHER side
        right_ds = _marked(right_ds, _REAL_R, right_schema)
    else:
        # left/right outer: only the build-side sentinel is needed (it
        # can never reach a LEFT OUTER output as a left row)
        right_ds = _null_sentinel_like(right_ds).union(right_ds)
    joined = marked.join(right_ds, join_type=join_type,
                         num_partitions=num_partitions,
                         on=on, right_on=right_on)

    def unmark(t: pa.Table) -> pa.Table:
        keep = None
        drop = []
        for m in (_REAL, _REAL_R):
            if m in t.column_names:
                valid = pc.is_valid(t.column(m))
                keep = valid if keep is None else pc.or_(keep, valid)
                drop.append(m)
        if keep is None:
            return t
        return t.filter(keep).drop_columns(drop)

    return joined.map_batches(unmark, batch_format="pyarrow",
                              zero_copy_batch=True)


def _left_cols(left_ds) -> list:
    """Semi/anti output = the LEFT columns, derived from the left
    schema (metadata-only for reads) — calling ``.schema()`` on the
    JOIN would execute the join once just to list columns, then
    ``select_columns`` would run it again (measured 2x)."""
    sch = left_ds.schema()
    return list(getattr(sch, "names", sch))


def _distinct_right(right_ds, right_on: str):
    import ray.data as rd
    from ray.data.aggregate import Count

    keys = (
        right_ds.select_columns([right_on])
        .groupby(right_on)
        .aggregate(Count(alias_name=_MARK))
    )
    # Sentinel row with a NULL key (null keys never match in a hash
    # join): Ray Data's join breaks when the build side contributes no
    # non-empty block at all (a fully-empty right side loses its schema
    # through the shuffle and Acero can't resolve the key FieldRef), so
    # guarantee one schema-carrying block.
    sch = right_ds.schema()
    key_type = (
        getattr(sch, "base_schema", sch).field(right_on).type
        if sch is not None else pa.int64()
    )
    sentinel = rd.from_arrow(pa.table({
        right_on: pa.array([None], key_type),
        _MARK: pa.array([1], pa.int64()),
    }))
    return sentinel.union(keys)


def semi_join(left_ds, right_ds, *, on: str, right_on: str,
              num_partitions: int = 8):
    """Rows of ``left`` whose ``on`` key appears in ``right`` (SQL
    EXISTS).  Left columns pass through unchanged."""
    keys = _distinct_right(right_ds, right_on)
    joined = left_ds.join(keys, join_type="inner",
                          num_partitions=num_partitions,
                          on=(on,), right_on=(right_on,))
    return joined.select_columns(_left_cols(left_ds))


def anti_join(left_ds, right_ds, *, on: str, right_on: str,
              num_partitions: int = 8):
    """Rows of ``left`` whose ``on`` key does NOT appear in ``right``
    (SQL NOT EXISTS)."""
    keys = _distinct_right(right_ds, right_on)
    joined = left_ds.join(keys, join_type="left_outer",
                          num_partitions=num_partitions,
                          on=(on,), right_on=(right_on,))

    def keep_unmatched(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t.column(_MARK)))

    missing = joined.map_batches(keep_unmatched, batch_format="pyarrow",
                                 zero_copy_batch=True)
    return missing.select_columns(_left_cols(left_ds))


def _build_key_bloom(right_ds, right_on: str, *, n_bits: int, n_hashes: int):
    """Bloom filter of ``right``'s key column: one per-block partial
    (each block returns ONE row holding its bit array), OR-reduced on
    the driver.  The partials stream — the right table itself is never
    collected; what crosses to the driver is ``blocks x n_bits/8``
    bytes."""
    from ..functions.aggregates import BloomFilter

    def partial(t: pa.Table) -> pa.Table:
        bf = BloomFilter(n_bits, n_hashes)
        col = t.column(right_on)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        col = col.drop_null()
        if len(col):
            bf.update(col)
        return pa.table({"bits": pa.array([bf.bits.tobytes()], pa.binary())})

    parts = right_ds.select_columns([right_on]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    acc = None
    for b in parts.iter_batches(batch_format="pyarrow"):
        for raw in b.column("bits"):
            arr = np.frombuffer(raw.as_py(), dtype=np.uint8)
            acc = arr.copy() if acc is None else np.bitwise_or(acc, arr, out=acc)
    bf = BloomFilter(n_bits, n_hashes)
    if acc is not None:
        bf.bits = acc
    return bf


def _bloom_prefilter(left_ds, on: str, bf, *, keep_misses: bool):
    """Split ``left`` by the broadcast bloom: ``keep_misses=False``
    keeps probable-members (semi-join candidates), ``True`` keeps
    definite non-members (anti-join definites).  Null keys count as
    misses (a null key never equals anything in a semi/anti join)."""
    import ray

    from ..functions.aggregates import BloomFilter

    handle = ray.put((bf.bits, bf.n_bits, bf.n_hashes))

    def fn(t: pa.Table) -> pa.Table:
        # BloomFilter is closed over (shipped by value), not imported
        # here: workers running from a foreign cwd can't import the repo
        bits, n_bits, n_hashes = ray.get(handle)
        local = BloomFilter(n_bits, n_hashes)
        local.bits = bits
        col = t.column(on)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        hit = np.zeros(t.num_rows, dtype=bool)
        if valid.any():
            hit[valid] = local.might_contain(col.filter(pa.array(valid)))
        return t.filter(pa.array(hit if not keep_misses else ~hit))

    return left_ds.map_batches(fn, batch_format="pyarrow",
                               zero_copy_batch=True)


def bloom_semi_join(left_ds, right_ds, *, on: str, right_on: str,
                    num_partitions: int = 8, n_bits: int = 1 << 20,
                    n_hashes: int = 7):
    """Exact semi join with a runtime Bloom pre-filter (the
    Spark/Presto runtime-filter pattern): the right side's keys distill
    to an ``n_bits``-bit filter broadcast once via ``ray.put``; left
    rows that MISS the bloom are definitely unmatched and drop locally
    without ever entering the shuffle; the (few) bloom hits go through
    the exact hash semi join, which removes false positives.  Result is
    EXACT — the bloom has no false negatives.

    Scale contract: at 100 TB, when the match rate is low (blocklists,
    small dimension probes), the shuffle moves only the candidate rows
    instead of the whole fact table; the broadcast is ~n_bits/8 bytes
    regardless of right-side row count."""
    candidates = _bloom_prefilter(
        left_ds, on,
        _build_key_bloom(right_ds, right_on, n_bits=n_bits, n_hashes=n_hashes),
        keep_misses=False)
    # the pre-filter may leave ZERO candidates (tiny/empty right side) —
    # a fully-empty probe side crashes Ray's hash join, and a null-key
    # sentinel row can never match an inner (semi) join, so pad with one
    candidates = _null_sentinel_like(left_ds).union(candidates)
    return semi_join(candidates, right_ds, on=on, right_on=right_on,
                     num_partitions=num_partitions)


def bloom_anti_join(left_ds, right_ds, *, on: str, right_on: str,
                    num_partitions: int = 8, n_bits: int = 1 << 20,
                    n_hashes: int = 7):
    """Exact anti join with a runtime Bloom pre-filter: left rows that
    MISS the bloom (or have a null key) are definite non-matches and
    pass through with NO shuffle; only bloom hits — false positives
    plus true members — go through the exact anti join to decide.
    Result is EXACT for the same no-false-negative reason."""
    import ray.data as rd

    bf = _build_key_bloom(right_ds, right_on, n_bits=n_bits,
                          n_hashes=n_hashes)
    definite = _bloom_prefilter(left_ds, on, bf, keep_misses=True)
    candidates = _bloom_prefilter(left_ds, on, bf, keep_misses=False)
    # pad the (possibly empty) candidate side for the same hash-join
    # crash as in bloom_semi_join.  An ANTI join WOULD emit a null-key
    # sentinel as an unmatched row, so real rows carry a marker and the
    # sentinel (marker null) is filtered back out of the result.
    def mark(t: pa.Table) -> pa.Table:
        return t.append_column(
            _REAL, pa.array(np.ones(t.num_rows, dtype=bool)))

    sch = left_ds.schema()
    sch = getattr(sch, "base_schema", sch)
    sent = rd.from_arrow(pa.table(
        {f.name: pa.array([None], f.type) for f in sch}
        | {_REAL: pa.array([None], pa.bool_())}))
    marked = sent.union(candidates.map_batches(
        mark, batch_format="pyarrow", zero_copy_batch=True))
    checked = anti_join(marked, right_ds, on=on, right_on=right_on,
                        num_partitions=num_partitions)

    def unmark(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column(_REAL))).drop_columns([_REAL])

    checked = checked.map_batches(unmark, batch_format="pyarrow",
                                  zero_copy_batch=True)
    return definite.union(checked)


def melt(ds, *, id_cols: Sequence[str], value_cols: Sequence[str],
         var_name: str = "variable", value_name: str = "value"):
    """Unpivot wide columns to long (id_cols..., variable, value) —
    SQL UNPIVOT / pandas ``melt``.  Purely per-batch and shuffle-free:
    each block emits its k stacked slices; value columns are cast to a
    common float64 (the usual metric-melt case)."""
    vcols = list(value_cols)
    icols = list(id_cols)

    def fn(t: pa.Table) -> pa.Table:
        pieces = []
        for c in vcols:
            cols = {ic: t.column(ic) for ic in icols}
            cols[var_name] = pa.array([c] * t.num_rows, pa.string())
            cols[value_name] = pc.cast(t.column(c), pa.float64())
            pieces.append(pa.table(cols))
        return pa.concat_tables(pieces)

    return ds.select_columns(icols + vcols).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True)


def _set_op(a_ds, b_ds, col_a: str, col_b: str, want: str):
    from .global_checks import _distinct_partials, _tagged_union_diff

    a = _distinct_partials(a_ds.select_columns([col_a]), col_a)
    b = _distinct_partials(b_ds.select_columns([col_b]), col_b)
    return _tagged_union_diff(a, b, want=want)


def except_distinct(a_ds, b_ds, *, col: str, col_b: str = None):
    """DISTINCT values of ``a.col`` not present in ``b.col_b`` (SQL
    EXCEPT).  Output column: ``v``."""
    return _set_op(a_ds, b_ds, col, col_b or col, "extra")


def intersect_distinct(a_ds, b_ds, *, col: str, col_b: str = None):
    """DISTINCT values present in both sides (SQL INTERSECT).  Output
    column: ``v``."""
    return _set_op(a_ds, b_ds, col, col_b or col, "both")


def broadcast_join(left_ds, right_ds, *, on: str, right_on: str,
                   right_cols: Sequence[str], how: str = "left"):
    """Map-side hash join against a SMALL right side: the right table
    is collected once, ``ray.put`` into the object store, and every
    ``map_batches`` task attaches the right columns by a vectorized
    ``pc.index_in`` + ``take`` — NO shuffle, the left side streams
    untouched.  This is the scale pattern for dimension lookups
    (orders -> customer/nation): at 100 TB a shuffle join moves the
    fact table; this moves the dimension table once per node.

    Partitioning assumption (caller's contract): the right side's
    DISTINCT keys + ``right_cols`` fit in worker memory.  Duplicate
    right keys keep the FIRST occurrence (dimension tables are unique
    by key; deduping here keeps the semantics defined).
    ``how='left'`` emits nulls for unmatched left rows; ``how='inner'``
    drops them.
    """
    import ray

    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    from .base import collect_table

    need = list(dict.fromkeys([right_on] + list(right_cols)))
    # schema-preserving collect: to_pandas() on an EMPTY dataset loses
    # the schema (a filtered-to-zero dimension side would KeyError
    # below); inner joins then drop every left row, left joins emit
    # all-null attach columns
    small = collect_table(right_ds, need)
    # keep-first per key, deterministically
    keys = small.column(right_on)
    keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
    enc = pc.dictionary_encode(keys)
    codes = np.asarray(enc.indices, dtype=np.int64)
    first = np.full(len(enc.dictionary), len(codes), dtype=np.int64)
    np.minimum.at(first, codes, np.arange(len(codes), dtype=np.int64))
    small = small.take(pa.array(np.sort(first))).combine_chunks()
    handle = ray.put(small)
    out_cols = [c for c in right_cols if c != right_on]

    def attach(batch: pa.Table) -> pa.Table:
        dim = ray.get(handle)
        idx = pc.index_in(batch.column(on), value_set=dim.column(right_on))
        if how == "inner":
            keep = idx.is_valid()
            batch = batch.filter(keep)
            idx = idx.filter(keep)
        for c in out_cols:
            batch = batch.append_column(c, dim.column(c).take(idx))
        return batch

    return left_ds.map_batches(attach, batch_format="pyarrow",
                               zero_copy_batch=True)


def range_join_broadcast(left_ds, bands: pa.Table, *, value_col: str,
                         lo_col: str = "lo", hi_col: str = "hi",
                         band_cols: Sequence[str] = None,
                         how: str = "inner"):
    """Range (interval) join of a streaming fact table against a SMALL
    band table: each left row matches the band with ``lo <= value <
    hi``.  The reference has no join at all (subset/superset are its
    only referential forms); a range join is the standard shape for
    price bands, latency buckets, date epochs, SLA tiers.

    Scale design: bands are validated + sorted ONCE on the driver and
    broadcast via ``ray.put``; every ``map_batches`` task resolves the
    band per row with one vectorized ``np.searchsorted`` against the
    sorted ``lo`` edges (O(n log b) per batch, no shuffle — the fact
    side streams).  A shuffle-based interval join would move the fact
    table; this moves the band table once per node.

    Partitioning assumption (caller's contract): bands are
    NON-OVERLAPPING half-open intervals ``[lo, hi)`` and fit in worker
    memory (validated here — overlap raises).  ``how='inner'`` drops
    left rows matching no band; ``how='left'`` keeps them with null
    band columns.
    """
    import ray

    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    if hasattr(bands, "to_pandas") and not isinstance(bands, pa.Table):
        bands = pa.Table.from_pandas(bands.to_pandas(), preserve_index=False)
    order = pc.sort_indices(bands.column(lo_col))
    bands = bands.take(order).combine_chunks()
    lo = bands.column(lo_col).to_numpy(zero_copy_only=False).astype(np.float64)
    hi = bands.column(hi_col).to_numpy(zero_copy_only=False).astype(np.float64)
    if np.any(hi <= lo):
        raise ValueError("each band needs hi > lo")
    if np.any(lo[1:] < hi[:-1]):
        raise ValueError("bands overlap; range_join_broadcast requires "
                         "disjoint [lo, hi) intervals")
    out_cols = list(band_cols) if band_cols is not None else [
        c for c in bands.column_names if c not in (lo_col, hi_col)
    ]
    handle = ray.put((lo, hi, bands.select(out_cols)))

    def attach(batch: pa.Table) -> pa.Table:
        lo_a, hi_a, dim = ray.get(handle)
        x = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.searchsorted(lo_a, x, side="right") - 1
        ok = (idx >= 0) & (x < hi_a[np.maximum(idx, 0)])
        if how == "inner":
            batch = batch.filter(pa.array(ok))
            take = pa.array(idx[ok])
        else:
            take = pa.array(np.where(ok, idx, -1), pa.int64())
            take = pc.if_else(pa.array(ok), take, pa.nulls(len(ok), pa.int64()))
        for c in dim.column_names:
            batch = batch.append_column(c, dim.column(c).take(take))
        return batch

    return left_ds.map_batches(attach, batch_format="pyarrow",
                               zero_copy_batch=True)


def rollup_counts(ds, *, cols: Sequence[str]):
    """SQL ``GROUP BY ROLLUP(a, b)`` counts: (a, b, n) plus per-a
    subtotals (b NULL) and the grand total (both NULL).

    ONE shuffle: the (a, b) groupby; the finest level is then
    materialized (it is already aggregated — |a|x|b| rows, tiny by
    construction) and the coarser levels re-aggregate it driver-free
    via two more tiny groupbys over that small dataset.
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    if len(cols) != 2:
        raise ValueError("rollup_counts currently supports exactly 2 cols")
    a, b = cols
    finest = (
        ds.select_columns([a, b])
        .groupby([a, b])
        .aggregate(Count(alias_name="n"))
        .materialize()
    )

    sch = finest.schema()
    sch = getattr(sch, "base_schema", sch)
    a_type, b_type = sch.field(a).type, sch.field(b).type

    sub = finest.groupby(a).aggregate(Sum("n", alias_name="n"))
    sub_t = sub.map_batches(
        lambda t: pa.table({
            a: t.column(a),
            b: pa.nulls(t.num_rows, b_type),
            "n": t.column("n"),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    total = int(finest.sum("n") or 0)
    grand = rd.from_arrow(pa.table({
        a: pa.nulls(1, a_type),
        b: pa.nulls(1, b_type),
        "n": pa.array([total], pa.int64()),
    }))
    return finest.union(sub_t).union(grand)


def cube_counts(ds, *, cols: Sequence[str]):
    """SQL ``GROUP BY CUBE(a, b)`` counts: the rollup levels plus the
    per-b subtotals (a NULL).  Same plan as :func:`rollup_counts` —
    ONE row-level shuffle builds the finest level; every coarser level
    re-aggregates that tiny materialized table."""
    from ray.data.aggregate import Sum

    if len(cols) != 2:
        raise ValueError("cube_counts currently supports exactly 2 cols")
    a, b = cols
    with_rollup = rollup_counts(ds, cols=cols)

    # the one grouping set ROLLUP lacks: per-b subtotals (a NULL).
    # rollup's output already contains the finest level; re-aggregate
    # the (a, b, n) rows (a NOT NULL, b NOT NULL) by b.
    def drop_subtotals(t: pa.Table) -> pa.Table:
        return t.filter(pc.and_(pc.is_valid(t.column(a)),
                                pc.is_valid(t.column(b))))

    finest = with_rollup.map_batches(
        drop_subtotals, batch_format="pyarrow", zero_copy_batch=True)
    sch = ds.schema()  # input schema: metadata-only for file reads
    sch = getattr(sch, "base_schema", sch)
    a_type = sch.field(a).type
    sub_b = finest.groupby(b).aggregate(Sum("n", alias_name="n"))
    sub_b_t = sub_b.map_batches(
        lambda t: pa.table({
            a: pa.nulls(t.num_rows, a_type),
            b: t.column(b),
            "n": t.column("n"),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return with_rollup.union(sub_b_t)


def pivot_counts(ds, *, by: str, pivot_col: str, values: Sequence[str],
                 prefix: str = "n_"):
    """Pivot ``pivot_col`` into count columns per ``by`` key:
    (by, prefix+v1, ..., prefix+vk) — SQL
    ``sum(CASE WHEN pivot = v THEN 1 ELSE 0 END)``.

    ``values`` is the (bounded, known) pivot domain; rows with other
    values are ignored.  The per-batch combiner means the shuffle
    carries one row per (key, block), never per input row.
    """
    from ray.data.aggregate import Sum

    vals = list(values)
    names: List[str] = [f"{prefix}{v}" for v in vals]
    value_set = pa.array(vals)

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(by)
        keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
        enc = pc.dictionary_encode(keys)
        kcode = np.asarray(enc.indices)
        vidx = pc.index_in(batch.column(pivot_col), value_set=value_set)
        vcode = vidx.to_numpy(zero_copy_only=False)
        ok = ~np.isnan(vcode.astype(np.float64)) if vcode.dtype.kind == "f" \
            else vidx.is_valid().to_numpy(zero_copy_only=False)
        k = len(vals)
        n_keys = len(enc.dictionary)
        counts = np.bincount(
            kcode[ok].astype(np.int64) * k + vcode[ok].astype(np.int64),
            minlength=n_keys * k,
        ).reshape(n_keys, k)
        cols = {by: enc.dictionary}
        for j, name in enumerate(names):
            cols[name] = pa.array(counts[:, j], pa.int64())
        return pa.table(cols)

    partials = ds.select_columns([by, pivot_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    aggs = [Sum(name, alias_name=name) for name in names]
    return partials.groupby(by).aggregate(*aggs)


def pareto_front(ds, *, min_col: str, max_col: str, id_col: str):
    """Distributed 2-D Pareto skyline: rows not dominated by any other
    row (dominator has ``min_col`` <= and ``max_col`` >= with at least
    one strict) — the cheapest-and-best frontier query (price/quality,
    latency/accuracy).  Ties on BOTH dimensions are mutually
    non-dominating, so exact duplicates all stay on the front.

    Classic two-level plan: the per-block LOCAL skyline is a combiner
    (a block's dominated rows can never enter the global front, so the
    survivor set — O(frontier) per block, typically logarithmic in the
    block for non-degenerate data — is all that moves), then ONE final
    exact pass over the gathered survivors.  The kernel is a sort +
    per-price-group prefix-max scan, no Python loop over rows.
    """
    need = [id_col, min_col, max_col]

    def skyline(t: pa.Table) -> pa.Table:
        t = t.select(need)
        if t.num_rows == 0:
            return t
        t = t.sort_by([(min_col, "ascending"), (max_col, "descending")])
        lo = t.column(min_col).to_numpy(zero_copy_only=False)
        hi = t.column(max_col).to_numpy(zero_copy_only=False)
        n = len(lo)
        newg = np.ones(n, dtype=bool)
        newg[1:] = lo[1:] != lo[:-1]
        grp = np.cumsum(newg) - 1
        gstart = np.flatnonzero(newg)
        gmax = hi[gstart]                      # per-group max (sorted desc)
        prefmax = np.maximum.accumulate(gmax)  # running max over groups
        # max over STRICTLY cheaper groups (none for the first group)
        prev = np.full(len(gmax), -np.inf)
        prev[1:] = prefmax[:-1]
        keep = (hi == gmax[grp]) & (hi > prev[grp])
        return t.filter(pa.array(keep))

    local = ds.select_columns(need).map_batches(
        skyline, batch_format="pyarrow", zero_copy_batch=True)
    # survivors are tiny by construction: one exact global pass
    return local.repartition(1).map_batches(
        skyline, batch_format="pyarrow", batch_size=None)


def interval_join_bucketed(points_ds, intervals_ds, *, value_col: str,
                           lo_col: str, hi_col: str, point_cols,
                           interval_cols, bucket_width: float,
                           max_span_buckets: int = 64):
    """Distributed point-in-interval join where BOTH sides are large
    (the broadcast path :func:`range_join_broadcast` requires a small
    band table; this one co-partitions instead): intervals replicate to
    every ``bucket_width``-wide bucket they overlap, points route to
    their single bucket, ONE shuffle co-locates them, and a vectorized
    within-bucket kernel emits matches ``lo <= v < hi``.

    Partitioning assumption (checked): each interval spans at most
    ``max_span_buckets`` buckets — replication is bounded by
    span/bucket_width.  Intervals may overlap each other freely (unlike
    the broadcast path).  Null values/bounds never match.
    """
    import ray.data as rd

    pcols = list(point_cols)
    icols = list(interval_cols)
    w = float(bucket_width)

    def route_points(t: pa.Table) -> pa.Table:
        v = t.column(value_col)
        t = t.filter(pc.is_valid(v))
        vals = t.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        b = np.floor(vals / w).astype(np.int64)
        out = {c: t.column(c) for c in dict.fromkeys(pcols + [value_col])}
        out["_b"] = pa.array(b)
        out["_side"] = pa.array(np.zeros(len(b), dtype=np.int8))
        for c in icols:
            out[f"_i_{c}"] = pa.nulls(len(b), intervals_ds.schema(
            ).base_schema.field(c).type if hasattr(
                intervals_ds.schema(), "base_schema") else
                intervals_ds.schema().field(c).type)
        out["_lo"] = pa.nulls(len(b), pa.float64())
        out["_hi"] = pa.nulls(len(b), pa.float64())
        return pa.table(out)

    p_sch = points_ds.schema()
    p_sch = getattr(p_sch, "base_schema", p_sch)

    def route_intervals(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(lo_col)),
                     pc.is_valid(t.column(hi_col)))
        t = t.filter(ok)
        lo = t.column(lo_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        hi = t.column(hi_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        b0 = np.floor(lo / w).astype(np.int64)
        # hi is exclusive: the last bucket is the one holding the
        # largest value < hi
        b1 = np.floor(np.nextafter(hi, -np.inf) / w).astype(np.int64)
        b1 = np.maximum(b1, b0)
        span = b1 - b0 + 1
        if span.max(initial=0) > max_span_buckets:
            raise ValueError(
                f"interval spans {int(span.max())} buckets > "
                f"max_span_buckets={max_span_buckets}; raise bucket_width")
        reps = span
        idx = np.repeat(np.arange(len(lo)), reps)
        offs = np.concatenate([np.arange(s) for s in reps]) \
            if len(reps) else np.array([], dtype=np.int64)
        bucket = b0[idx] + offs
        take = pa.array(idx, pa.int64())
        out = {c: pa.nulls(len(idx), p_sch.field(c).type)
               for c in dict.fromkeys(pcols + [value_col])}
        out["_b"] = pa.array(bucket)
        out["_side"] = pa.array(np.ones(len(idx), dtype=np.int8))
        for c in icols:
            col = t.column(c)
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
                else col
            out[f"_i_{c}"] = col.take(take)
        out["_lo"] = pa.array(lo[idx], pa.float64())
        out["_hi"] = pa.array(hi[idx], pa.float64())
        return pa.table(out)

    pts = points_ds.select_columns(
        list(dict.fromkeys(pcols + [value_col]))).map_batches(
        route_points, batch_format="pyarrow", zero_copy_batch=True)
    ivs = intervals_ds.select_columns(
        list(dict.fromkeys(icols + [lo_col, hi_col]))).map_batches(
        route_intervals, batch_format="pyarrow", zero_copy_batch=True)

    def kernel(group: pa.Table) -> pa.Table:
        side = group.column("_side").to_numpy(zero_copy_only=False)
        pmask, imask = side == 0, side == 1
        p = group.filter(pa.array(pmask))
        iv = group.filter(pa.array(imask))
        empty = {c: pa.array([], p_sch.field(c).type)
                 for c in dict.fromkeys(pcols + [value_col])}
        for c in icols:
            empty[c] = group.column(f"_i_{c}").slice(0, 0)
        if p.num_rows == 0 or iv.num_rows == 0:
            return pa.table(empty)
        v = p.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        lo = iv.column("_lo").to_numpy(zero_copy_only=False)
        hi = iv.column("_hi").to_numpy(zero_copy_only=False)
        # sort intervals by lo; for each point, candidates are the
        # intervals with lo <= v — then filter v < hi exactly
        order = np.argsort(lo, kind="stable")
        lo_s, hi_s = lo[order], hi[order]
        upto = np.searchsorted(lo_s, v, side="right")
        reps = upto
        pid = np.repeat(np.arange(len(v)), reps)
        iid = np.concatenate([np.arange(u) for u in upto]) \
            if len(upto) else np.array([], dtype=np.int64)
        keep = v[pid] < hi_s[iid]
        pid, iid = pid[keep], iid[keep]
        ptake = pa.array(pid, pa.int64())
        itake = pa.array(order[iid], pa.int64())
        out = {}
        for c in dict.fromkeys(pcols + [value_col]):
            col = p.column(c)
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
                else col
            out[c] = col.take(ptake)
        for c in icols:
            col = iv.column(f"_i_{c}")
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
                else col
            out[c] = col.take(itake)
        return pa.table(out)

    return pts.union(ivs).groupby("_b").map_groups(
        kernel, batch_format="pyarrow")


def union_distinct(a_ds, b_ds, *, col: str, col_b: str = None):
    """DISTINCT values present in either side (SQL UNION).  Output
    column: ``v``.  Same per-batch-distinct + coarse-bucket plan as the
    other set ops — the exchange carries distinct partials only."""
    from .global_checks import _distinct, _distinct_partials

    a = _distinct_partials(a_ds.select_columns([col]), col)
    b = _distinct_partials(b_ds.select_columns([col_b or col]), col_b or col)
    return _distinct(a.union(b), "v")


def pivot_sum(ds, *, by: str, pivot_col: str, values: Sequence[str],
              value_col: str, prefix: str = "sum_", decimals: int = 2):
    """Pivot ``pivot_col`` into SUM(value_col) columns per ``by`` key —
    SQL ``sum(CASE WHEN pivot = v THEN val ELSE 0 END)``.  Sums
    accumulate as int64 of 10^decimals-scaled units inside the per-batch
    combiner (exact under any distributed summation order), divided back
    at the end.  Null values contribute 0 (SQL SUM ignores them).
    """
    from ray.data.aggregate import Sum

    vals = list(values)
    names: List[str] = [f"{prefix}{v}" for v in vals]
    value_set = pa.array(vals)
    scale = float(10 ** decimals)

    def partial(batch: pa.Table) -> pa.Table:
        # null keys are dropped (mirror the oracle's WHERE key IS NOT
        # NULL) — a null dictionary index would poison the bincount
        batch = batch.filter(pc.is_valid(batch.column(by)))
        keys = batch.column(by)
        keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) \
            else keys
        enc = pc.dictionary_encode(keys)
        kcode = np.asarray(enc.indices)
        vidx = pc.index_in(batch.column(pivot_col), value_set=value_set)
        ok = vidx.is_valid().to_numpy(zero_copy_only=False)
        x = batch.column(value_col)
        x = x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x
        units = pc.cast(pc.round(pc.multiply(
            pc.cast(pc.fill_null(x, 0.0), pa.float64()), scale)),
            pa.int64()).to_numpy(zero_copy_only=False)
        vcode = vidx.fill_null(0).to_numpy(zero_copy_only=False)
        k = len(vals)
        n_keys = len(enc.dictionary)
        sums = np.bincount(
            kcode[ok].astype(np.int64) * k + vcode[ok].astype(np.int64),
            weights=units[ok], minlength=n_keys * k,
        ).astype(np.int64).reshape(n_keys, k)
        cols = {by: enc.dictionary}
        for j, name in enumerate(names):
            cols[name] = pa.array(sums[:, j], pa.int64())
        return pa.table(cols)

    partials = ds.select_columns(
        list(dict.fromkeys([by, pivot_col, value_col]))).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    aggs = [Sum(name, alias_name=name) for name in names]
    out = partials.groupby(by).aggregate(*aggs)

    def unscale(t: pa.Table) -> pa.Table:
        cols = {by: t.column(by)}
        for name in names:
            cols[name] = pc.divide(
                pc.cast(t.column(name), pa.float64()), scale)
        return pa.table(cols)

    return out.map_batches(unscale, batch_format="pyarrow",
                           zero_copy_batch=True)


def lookup_join(left_ds, right_ds, *, on: str, right_on: str,
                right_cols: Sequence[str], how: str = "inner",
                n_buckets: int = 64):
    """Shuffle hash join specialized for the MANY-TO-ONE case (the
    right side's join keys are UNIQUE — an aggregate, a dimension, a
    per-key state table): both sides are tagged and hashed into the
    SAME coarse buckets by one union + one ``groupby``, and each
    bucket kernel attaches the right columns by a vectorized
    sorted-array gather (``searchsorted`` + arrow ``take``).

    This is the join to use when the right side is too big to
    broadcast (:func:`broadcast_join`) but keyed uniquely — it avoids
    ``Dataset.join``'s general-purpose aggregator (measured ~5-7x
    slower on the same shapes in this engine, see BENCH notes) while
    shuffling exactly the same bytes.  ``how`` is ``'inner'`` or
    ``'left'``.  Duplicate right keys are a CALLER ERROR: exactly one
    match row is attached per key (which one is unspecified).

    Output columns: every left column (join key keeps the left name)
    followed by ``right_cols``.  Null join keys are the caller's to
    filter upstream (for string keys a null would gather against a
    null right key).
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    from ..functions.aggregates import hash64

    lsch = left_ds.schema()
    lsch = getattr(lsch, "base_schema", lsch)
    rsch = right_ds.schema()
    rsch = getattr(rsch, "base_schema", rsch)
    left_names = [n for n in lsch.names]
    right_types = {c: rsch.field(c).type for c in right_cols}
    lpay = [n for n in left_names if n != on]

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {"__k": t.column(on), "__s": pa.array(
            np.zeros(n, dtype=np.int8))}
        for c in lpay:
            cols[c] = t.column(c)
        for c in right_cols:
            cols[c] = pa.nulls(n, right_types[c])
        cols["coarse"] = pa.array(
            (hash64(t.column(on)) % np.uint64(n_buckets)).astype(np.int64))
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {"__k": t.column(right_on).cast(lsch.field(on).type),
                "__s": pa.array(np.ones(n, dtype=np.int8))}
        for c in lpay:
            cols[c] = pa.nulls(n, lsch.field(c).type)
        for c in right_cols:
            cols[c] = t.column(c)
        cols["coarse"] = pa.array(
            (hash64(cols["__k"]) % np.uint64(n_buckets)).astype(np.int64))
        return pa.table(cols)

    tagged = left_ds.map_batches(
        tag_left, batch_format="pyarrow", zero_copy_batch=True).union(
        right_ds.map_batches(tag_right, batch_format="pyarrow",
                             zero_copy_batch=True))

    out_fields = ([pa.field(on, lsch.field(on).type)]
                  + [pa.field(c, lsch.field(c).type) for c in lpay]
                  + [pa.field(c, right_types[c]) for c in right_cols])
    out_schema = pa.schema(out_fields)

    def kernel(group: pa.Table) -> pa.Table:
        side = group.column("__s").to_numpy(zero_copy_only=False)
        left = group.filter(pa.array(side == 0))
        right = group.filter(pa.array(side == 1))
        if left.num_rows == 0:
            return out_schema.empty_table()
        lk = left.column("__k").to_numpy(zero_copy_only=False)
        rk = right.column("__k").to_numpy(zero_copy_only=False)
        order = np.argsort(rk, kind="stable")
        rk = rk[order]
        if len(rk):
            pos = np.minimum(np.searchsorted(rk, lk), len(rk) - 1)
            hit = rk[pos] == lk
        else:
            pos = np.zeros(len(lk), dtype=np.int64)
            hit = np.zeros(len(lk), dtype=bool)
        if how == "inner":
            keep = np.flatnonzero(hit)
            left = left.take(pa.array(keep))
            idx = pa.array(order[pos[keep]], pa.int64())
        else:
            # left outer: null right cols where unmatched; a bucket
            # with zero right rows gathers nothing (order is empty —
            # np.where evaluates eagerly, so guard before indexing)
            gathered = (order[pos] if len(rk)
                        else np.zeros(len(lk), dtype=np.int64))
            idx = pa.array(
                np.where(hit, gathered, 0).astype(np.int64),
                pa.int64(), mask=~hit)
        cols = {on: left.column("__k")}
        for c in lpay:
            cols[c] = left.column(c)
        for c in right_cols:
            cols[c] = right.column(c).take(idx)
        return pa.table(cols, schema=out_schema)

    return tagged.groupby("coarse").map_groups(
        kernel, batch_format="pyarrow")


def skew_join(left_ds, right_ds, *, on: str, right_on: str,
              right_cols: Sequence[str], how: str = "inner",
              hot_k: int = 16, n_buckets: int = 64):
    """Skew-aware many-to-one join (fact ⨝ dimension when the fact
    side's key distribution has heavy hitters).

    A plain hash join routes every row of a hot key to ONE aggregator
    — at 100 TB a single skewed key (the null-ish default user, the
    one viral item) turns an all-to-all exchange into one straggler
    task.  This operator routes around it:

    1. one pruned pass over the left KEY COLUMN folds a mergeable
       SpaceSaving summary (O(hot_k) driver state, no collect) to find
       the hottest keys — approximate is fine: routing choice never
       changes the join RESULT, only its balance;
    2. hot-key rows take the map-side path: their (few) dimension rows
       are collected + ``ray.put`` once and attached in-stream
       (:func:`broadcast_join`) — the heavy keys never enter a shuffle;
    3. everything else takes the bucketed :func:`lookup_join` shuffle,
       with the hot dimension rows REMOVED from the build side.

    Same contract as lookup_join: right keys unique (dimension table),
    ``how`` in ('inner', 'left').  The left side is consumed twice
    (hot/cold branch predicates over the same lineage) plus the key-only
    sketch pass — three pruned scans in exchange for skew immunity.
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    from ..functions.aggregates import (SketchAggregate, SpaceSaving,
                                        sketch_loads)

    res = left_ds.select_columns([on]).aggregate(SketchAggregate(
        on=on, factory=lambda: SpaceSaving(max(64, 4 * hot_k)),
        alias_name="ss"))
    hot = []
    if res and res.get("ss") is not None:
        hot = [v for v, _c, _e in sketch_loads(res["ss"]).topk(hot_k)]

    lsch = left_ds.schema()
    lsch = getattr(lsch, "base_schema", lsch)
    out_order = list(lsch.names) + [c for c in right_cols if c != right_on]

    if not hot:
        return lookup_join(left_ds, right_ds, on=on, right_on=right_on,
                           right_cols=right_cols, how=how,
                           n_buckets=n_buckets).select_columns(out_order)

    hot_arr = pa.array(hot).cast(lsch.field(on).type)

    def is_hot(t: pa.Table, invert: bool = False) -> pa.Table:
        m = pc.fill_null(pc.is_in(t.column(on), value_set=hot_arr), False)
        return t.filter(pc.invert(m) if invert else m)

    def right_is_hot(t: pa.Table, invert: bool = False) -> pa.Table:
        m = pc.fill_null(
            pc.is_in(t.column(right_on),
                     value_set=hot_arr.cast(t.column(right_on).type)),
            False)
        return t.filter(pc.invert(m) if invert else m)

    left_hot = left_ds.map_batches(is_hot, batch_format="pyarrow",
                                   zero_copy_batch=True)
    left_cold = left_ds.map_batches(
        lambda t: is_hot(t, invert=True), batch_format="pyarrow",
        zero_copy_batch=True)
    right_hot = right_ds.map_batches(right_is_hot, batch_format="pyarrow",
                                     zero_copy_batch=True)
    right_cold = right_ds.map_batches(
        lambda t: right_is_hot(t, invert=True), batch_format="pyarrow",
        zero_copy_batch=True)

    hot_joined = broadcast_join(
        left_hot, right_hot, on=on, right_on=right_on,
        right_cols=list(dict.fromkeys([right_on] + list(right_cols))),
        how=how).select_columns(out_order)
    cold_joined = lookup_join(
        left_cold, right_cold, on=on, right_on=right_on,
        right_cols=right_cols, how=how,
        n_buckets=n_buckets).select_columns(out_order)
    return hot_joined.union(cold_joined)


def topk_turnover(ds, *, period_col: str, key_col: str,
                  score_col: str, k: int = 5):
    """Leaderboard turnover: per period the top-k keys by integer
    score (score desc, key asc), and for each consecutive period pair
    the Jaccard overlap of the two top-k sets -- "how churny is the
    top of this league table", the stability number behind
    trending/top-N product surfaces.

    Input is an aggregated (period, key, score) table; the per-period
    ranking runs in one single-partition kernel over O(periods x
    keys-kept) rows.  Output: (period_a int64, period_b int64,
    n_common int64, jaccard round-6), consecutive periods ascending.
    """
    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("period_a", pa.int64()),
                            ("period_b", pa.int64()),
                            ("n_common", pa.int64()),
                            ("jaccard", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        p = t.column(period_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        kk = t.column(key_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        s = t.column(score_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        tops = {}
        for per in np.unique(p):
            sel = p == per
            order = np.lexsort((kk[sel], -s[sel]))
            tops[int(per)] = set(kk[sel][order[:k]].tolist())
        periods = sorted(tops)
        rows = {"a": [], "b": [], "c": [], "j": []}
        for a, b in zip(periods, periods[1:]):
            inter = len(tops[a] & tops[b])
            union = len(tops[a] | tops[b])
            rows["a"].append(a)
            rows["b"].append(b)
            rows["c"].append(inter)
            rows["j"].append(round(inter / union, 6) if union else None)
        return pa.table({
            "period_a": pa.array(rows["a"], pa.int64()),
            "period_b": pa.array(rows["b"], pa.int64()),
            "n_common": pa.array(rows["c"], pa.int64()),
            "jaccard": pa.array(rows["j"], pa.float64()),
        })

    return ds.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)
