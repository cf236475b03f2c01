"""Check protocol and run context.

A **Check** is the engine's compiled requirement (reference:
``datatest/requirements.py :: get_requirement`` and the ``Required*``
classes — see SURVEY.md §2.A/§2.B).  Every check emits violation rows in
the fixed Arrow IR (``datatest_ray.differences.VIOLATION_SCHEMA``).

Two execution shapes:

* **Stateless checks** implement ``kernel(batch, ctx) -> pa.Table``.  The
  :class:`~datatest_ray.pipelines.suite.CheckSuite` fuses ALL stateless
  checks into ONE ``map_batches`` pass over zero-copy Arrow batches — the
  data is read once no matter how many checks run.
* **Global checks** (uniqueness, set-missing/superset, drift, near-dup)
  implement ``violations(ds, ctx) -> Dataset`` with their own
  pre-aggregated shuffle plan.

``RunContext`` carries lineage configuration: which column is the
partition id (Lance fragment id at scale; a synthetic column locally) and
which column identifies a row (``image_id`` for the flagship table).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import pyarrow as pa

from ..differences import VIOLATION_SCHEMA, empty_violations, violations_table

__all__ = ["RunContext", "Check", "StatelessCheck", "column_or_none", "mask_to_violations", "coalesced", "collect_table", "round6_half_up"]


def round6_half_up(x) -> float:
    """Round to 6 dp with DECIMAL half-away-from-zero ties — DuckDB's
    ``round()`` rule — instead of Python/numpy banker's rounding.

    Use on every oracle-paired OUTPUT that is an exact integer
    quotient (share = n_i / total, capture = cum / total, ...): such
    values tie exactly on a decimal .5 at 6 dp whenever the
    denominator's reduced form divides 2^a·5^b (total = 512 → ties at
    cum ≡ 4 mod 8; fuzz seeds 606 and 555004), and a 6-dp tie value is
    binary-exact, so this rule equals DuckDB's on every possible tie.
    """
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(x).quantize(Decimal("1e-6"), ROUND_HALF_UP))


@dataclass(frozen=True)
class RunContext:
    """Lineage + naming configuration for a suite run."""

    partition_col: Optional[str] = None   # column carrying the partition id
    row_ref_col: Optional[str] = None     # column identifying a row
    default_partition: str = ""           # used when partition_col is absent
    # coalesce intermediate datasets to this many blocks before each
    # all-to-all (groupby/aggregate) so the shuffle task matrix is P x P
    # instead of n_blocks x n_blocks; None = keep input partitioning
    # (the right default at cluster scale, where block count ~ cluster)
    shuffle_partitions: Optional[int] = None


def coalesced(ds, ctx: "RunContext", cap: Optional[int] = None):
    """Apply the ctx shuffle coalescing to a pre-shuffle dataset.

    ``cap`` bounds the partition count below the ctx default — for
    partial streams that are tiny by construction (drift histograms,
    sketch partials) a P=NCPU shuffle is pure scheduling overhead; a
    handful of blocks feeds the downstream groupby just as well."""
    p = ctx.shuffle_partitions
    if cap is not None:
        p = min(p, cap) if p else cap
    if p:
        return ds.repartition(p)
    return ds


def column_or_none(batch: pa.Table, name: Optional[str]):
    if name is not None and name in batch.column_names:
        return batch.column(name)
    return None


class Check:
    """Base for all checks; ``check_id`` must be stable across runs
    (it keys the checkpoint layout, see state/checkpoint.py)."""

    check_id: str = "check"

    def violations(self, ds, ctx: RunContext):
        """Full plan: Dataset in, violations Dataset out.  Stateless
        checks get a default implementation via ``kernel``."""
        raise NotImplementedError

    def input_columns(self, ctx: "RunContext", names) -> Optional[list]:
        """Columns this check reads, or None for 'all' — lets the suite
        hand the check a READ-LEVEL-pruned dataset
        (``read_parquet(columns=...)``): Ray Data does NOT push a
        ``select_columns`` projection into the parquet read, so without
        this every branch decompresses every column (including a wide
        ``bytes`` payload) it never looks at."""
        if getattr(self, "needs_all_columns", False):
            return None
        cols = set()
        for attr in ("column", "id_column", "pos_col"):
            v = getattr(self, attr, None)
            if isinstance(v, str):
                cols.add(v)
        cols.update(getattr(self, "columns", []) or [])
        cols.update(
            c for c in (getattr(self, "optional_columns", []) or [])
            if c in names
        )
        for c in (ctx.partition_col, ctx.row_ref_col):
            if c and c in names:
                cols.add(c)
        if not cols or not cols.issubset(set(names)):
            return None
        return sorted(cols)

    def __repr__(self):
        return f"<{type(self).__name__} {self.check_id}>"


class StatelessCheck(Check):
    """A check expressible as a pure per-batch Arrow kernel (no shuffle)."""

    def kernel(self, batch: pa.Table, ctx: RunContext) -> pa.Table:
        raise NotImplementedError

    def violations(self, ds, ctx: RunContext):
        check = self

        def _apply(batch: pa.Table) -> pa.Table:
            out = check.kernel(batch, ctx)
            return out if out.num_rows else empty_violations()

        return ds.map_batches(_apply, batch_format="pyarrow", zero_copy_batch=True)


def mask_to_violations(
    batch: pa.Table,
    bad: np.ndarray,
    ctx: RunContext,
    *,
    check_id: str,
    kind: str,
    value_col: Optional[str] = None,
    key_col: Optional[str] = None,
    value=None,
    value_num=None,
    expected=None,
    expected_num=None,
    deviation=None,
) -> pa.Table:
    """Turn a boolean bad-row mask into violation rows, carrying lineage.

    ``value``/``value_num``/... may be full-length arrays (they are
    filtered by the mask) or scalars (broadcast over the bad rows).
    When ``value_col`` is given, value/value_num are taken from that
    column of the batch.
    """
    n_bad = int(bad.sum())
    if n_bad == 0:
        return empty_violations()
    idx = np.flatnonzero(bad)
    take = pa.array(idx)

    def _pick(spec, from_col=None):
        if from_col is not None:
            return from_col.take(take)
        if spec is None:
            return None
        if isinstance(spec, (pa.Array, pa.ChunkedArray)):
            return spec.take(take) if len(spec) == batch.num_rows else spec
        if isinstance(spec, np.ndarray):
            return pa.array(spec[idx]) if len(spec) == batch.num_rows else pa.array(spec)
        return spec  # scalar broadcast

    vcol = column_or_none(batch, value_col)
    value_out = _pick(value, vcol)
    vcol_numeric = vcol is not None and (
        pa.types.is_floating(vcol.type) or pa.types.is_integer(vcol.type)
    )
    if value_num is None and vcol_numeric:
        value_num_out = vcol.take(take)
    else:
        value_num_out = _pick(value_num)

    part = column_or_none(batch, ctx.partition_col)
    part_out = part.take(take) if part is not None else ctx.default_partition
    ref = column_or_none(batch, ctx.row_ref_col)
    ref_out = ref.take(take) if ref is not None else None
    key = column_or_none(batch, key_col)
    key_out = key.take(take) if key is not None else None

    return violations_table(
        n_bad,
        check_id=check_id,
        kind=kind,
        partition_id=part_out,
        row_ref=ref_out,
        key=key_out,
        value=value_out,
        value_num=value_num_out,
        expected=_pick(expected),
        expected_num=_pick(expected_num),
        deviation=_pick(deviation),
    )


def collect_table(ds, columns=None) -> pa.Table:
    """Collect a (SMALL) Dataset to one pyarrow.Table, preserving the
    schema even when the result has ZERO rows — ``to_pandas()`` on an
    empty Dataset loses column names entirely, which crashes any
    driver-side ``.column(...)`` access on a filtered-to-empty
    broadcast side.  Falls back to the plan schema, then to null-typed
    columns when even that is unknown (a zero-block map plan).

    Only for bounded results (dimension sides, aggregates, candidate
    sets); never call it on a full fact table.
    """
    sel = ds.select_columns(list(columns)) if columns else ds
    tbls = list(sel.iter_batches(batch_format="pyarrow",
                                 batch_size=65536))
    if tbls:
        return pa.concat_tables(tbls).combine_chunks()
    schema = sel.schema()
    if schema is not None:
        return getattr(schema, "base_schema", schema).empty_table()
    return pa.schema(
        [(n, pa.null()) for n in (columns or [])]).empty_table()
