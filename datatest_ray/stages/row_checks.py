"""Stateless per-batch checks: pure Arrow kernels, no shuffle.

These cover the reference's element-wise requirement forms (SURVEY.md
§2.A/§2.B; reference symbols ``datatest/requirements.py ::
RequiredPredicate, RequiredRegex, RequiredApprox, RequiredFuzzy,
RequiredInterval`` and ``datatest/_predicate.py :: MatcherTuple`` — name
citations only, mounted reference empty per SURVEY.md §0).

Every kernel is vectorized (pyarrow.compute / numpy) except FuzzyCheck,
whose difflib ratio has no Arrow kernel — that one iterates rows but only
inside its batch (documented hot-path exception, matching upstream
semantics exactly).
"""

from __future__ import annotations

import difflib
import math
import re
from typing import Any, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..differences import empty_violations, violations_table
from ..predicate import Predicate, TuplePredicate, get_predicate
from .base import RunContext, StatelessCheck, column_or_none, mask_to_violations

__all__ = [
    "PredicateCheck",
    "RegexCheck",
    "IntervalCheck",
    "ApproxCheck",
    "FuzzyCheck",
    "TupleCheck",
    "DomainCheck",
    "SchemaCheck",
]


def _to_np_f64(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return np.asarray(arr.cast(pa.float64()).to_numpy(zero_copy_only=False), dtype=np.float64)


class PredicateCheck(StatelessCheck):
    """Element-wise predicate over one column -> ``Invalid`` rows.

    Auto-dispatch parity (SURVEY.md §2.A): when the spec is a scalar
    NUMBER and the column is numeric, mismatches become ``Deviation``
    (actual-expected, expected) instead of ``Invalid`` — reference
    ``datatest/differences.py :: _make_difference``.
    """

    def __init__(self, column: str, spec: Any, check_id: Optional[str] = None):
        self.column = column
        self.pred = get_predicate(spec)
        if isinstance(self.pred, TuplePredicate):
            raise TypeError("use TupleCheck for tuple requirements")
        self.spec = self.pred.spec
        self._numeric_eq = isinstance(self.spec, (int, float)) and not isinstance(
            self.spec, bool
        ) and not self.pred.inverted
        self.check_id = check_id or f"predicate({column},{self.pred.describe()})"

    def kernel(self, batch: pa.Table, ctx: RunContext) -> pa.Table:
        col = batch.column(self.column)
        if (
            callable(self.spec)
            and not isinstance(self.spec, type)
            and not hasattr(self.spec, "search")
            and not self.pred.inverted  # ~pred: plain boolean mask path
        ):
            # bare-callable requirement: the reference lets the callable
            # RETURN a difference object, which becomes the violation
            # verbatim (datatest requirements.py :: RequiredPredicate) —
            # a plain truthiness mask would treat it as a pass
            return self._kernel_callable(batch, col, ctx)
        bad = ~self.pred.mask(col)
        if not bad.any():
            return empty_violations()
        if self._numeric_eq and (
            pa.types.is_integer(col.type) or pa.types.is_floating(col.type)
        ):
            vals = _to_np_f64(col)
            expected = float(self.spec)
            return mask_to_violations(
                batch, bad, ctx,
                check_id=self.check_id, kind="deviation", value_col=self.column,
                expected=repr(self.spec), expected_num=expected,
                deviation=vals - expected,
            )
        return mask_to_violations(
            batch, bad, ctx,
            check_id=self.check_id, kind="invalid", value_col=self.column,
        )

    def _kernel_callable(self, batch: pa.Table, col, ctx: RunContext) -> pa.Table:
        # NOTE: class-identity checks against the difference types are
        # deliberately NAME-based: when this package ships to workers by
        # value (cloudpickle), a user callable can close over a second
        # copy of the classes and isinstance() would miss them.
        def _diff_kind(x) -> Optional[str]:
            names = {c.__name__ for c in type(x).__mro__}
            if "BaseDifference" not in names or not hasattr(x, "args"):
                return None
            for n in ("Missing", "Extra", "Invalid", "Deviation"):
                if n in names:
                    return n.lower()
            return "invalid"

        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        fn = self.spec
        n = batch.num_rows
        bad = np.zeros(n, dtype=bool)
        kinds: list = []
        values: list = []
        expecteds: list = []
        deviations: list = []
        value_nums: list = []

        def _num(x):
            return float(x) if isinstance(x, (int, float)) and not isinstance(
                x, bool) else None

        plist = arr.to_pylist()
        for i, v in enumerate(plist):
            result = fn(v)
            dkind = _diff_kind(result)
            if dkind is not None:
                bad[i] = True
                args = result.args
                if dkind == "deviation":
                    kinds.append("deviation")
                    values.append(str(v))
                    value_nums.append(_num(v))
                    expecteds.append(repr(args[1]) if len(args) > 1 else None)
                    deviations.append(float(args[0]))
                else:
                    kinds.append(dkind)
                    values.append(repr(args[0]) if args else str(v))
                    value_nums.append(_num(args[0]) if args else _num(v))
                    expecteds.append(repr(args[1]) if len(args) > 1 else None)
                    deviations.append(None)
            elif not result:
                bad[i] = True
                kinds.append("invalid")
                values.append(str(v))
                value_nums.append(_num(v))
                expecteds.append(None)
                deviations.append(None)
        if not bad.any():
            return empty_violations()
        return mask_to_violations(
            batch, bad, ctx, check_id=self.check_id,
            kind=kinds, value=pa.array(values, pa.string()),
            value_num=pa.array(value_nums, pa.float64()),
            expected=pa.array(expecteds, pa.string()),
            deviation=pa.array(deviations, pa.float64()),
        )


class RegexCheck(PredicateCheck):
    """``re.search(pattern, value)`` must match (reference
    ``validate.regex`` / ``RequiredRegex``)."""

    def __init__(self, column: str, pattern: str, flags: int = 0,
                 check_id: Optional[str] = None):
        compiled = re.compile(pattern, flags)
        super().__init__(column, compiled,
                         check_id=check_id or f"regex({column},{pattern!r})")


class IntervalCheck(StatelessCheck):
    """``min <= v <= max`` (either bound optional); numeric out-of-range
    emits ``Deviation(v - bound, bound)`` against the violated bound;
    nulls are ``Invalid``.  Reference ``validate.interval`` /
    ``RequiredInterval``."""

    def __init__(self, column: str, min: Optional[float] = None,
                 max: Optional[float] = None, check_id: Optional[str] = None):
        if min is None and max is None:
            raise ValueError("interval needs at least one bound")
        self.column = column
        self.lo = min
        self.hi = max
        self.check_id = check_id or f"interval({column},{min},{max})"

    def kernel(self, batch: pa.Table, ctx: RunContext) -> pa.Table:
        col = batch.column(self.column)
        n = batch.num_rows
        if not (pa.types.is_integer(col.type) or pa.types.is_floating(col.type)):
            # non-numeric comparable (e.g. strings): Invalid for out-of-range
            arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            bad = np.zeros(n, dtype=bool)
            for i, v in enumerate(arr.to_pylist()):
                if v is None:
                    bad[i] = True
                    continue
                try:
                    if (self.lo is not None and v < self.lo) or (
                        self.hi is not None and v > self.hi
                    ):
                        bad[i] = True
                except TypeError:
                    bad[i] = True
            return mask_to_violations(
                batch, bad, ctx, check_id=self.check_id, kind="invalid",
                value_col=self.column,
            )

        vals = _to_np_f64(col)
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        null_mask = np.zeros(n, dtype=bool)
        if arr.null_count:
            null_mask = np.asarray(
                pc.is_null(arr).to_numpy(zero_copy_only=False), dtype=bool
            )
            vals = np.where(null_mask, np.nan, vals)

        below = np.zeros(n, dtype=bool)
        above = np.zeros(n, dtype=bool)
        with np.errstate(invalid="ignore"):
            if self.lo is not None:
                below = vals < self.lo
            if self.hi is not None:
                above = vals > self.hi
        nan_mask = np.isnan(vals) & ~null_mask  # NaN values: Invalid
        parts = []
        if below.any():
            dev = vals - float(self.lo)
            parts.append(mask_to_violations(
                batch, below, ctx, check_id=self.check_id, kind="deviation",
                value_col=self.column, expected=repr(self.lo),
                expected_num=float(self.lo), deviation=dev,
            ))
        if above.any():
            dev = vals - float(self.hi)
            parts.append(mask_to_violations(
                batch, above, ctx, check_id=self.check_id, kind="deviation",
                value_col=self.column, expected=repr(self.hi),
                expected_num=float(self.hi), deviation=dev,
            ))
        bad_other = null_mask | nan_mask
        if bad_other.any():
            parts.append(mask_to_violations(
                batch, bad_other, ctx, check_id=self.check_id, kind="invalid",
                value_col=self.column,
            ))
        if not parts:
            return empty_violations()
        return pa.concat_tables(parts)


class ApproxCheck(StatelessCheck):
    """Approximate numeric equality (reference ``validate.approx`` /
    ``RequiredApprox``): ``round(v - expected, places) == 0`` (default
    places=7) or ``abs(v - expected) <= delta``."""

    def __init__(self, column: str, expected: float, places: Optional[int] = None,
                 delta: Optional[float] = None, check_id: Optional[str] = None):
        if places is not None and delta is not None:
            raise TypeError("specify places or delta, not both")
        self.column = column
        self.expected = float(expected)
        self.places = 7 if (places is None and delta is None) else places
        self.delta = delta
        tag = f"delta={delta}" if delta is not None else f"places={self.places}"
        self.check_id = check_id or f"approx({column},{expected},{tag})"

    def kernel(self, batch: pa.Table, ctx: RunContext) -> pa.Table:
        vals = _to_np_f64(batch.column(self.column))
        diff = vals - self.expected
        with np.errstate(invalid="ignore"):
            if self.delta is not None:
                bad = ~(np.abs(diff) <= self.delta)
            else:
                bad = np.round(diff, self.places) != 0.0
        bad |= np.isnan(vals)
        return mask_to_violations(
            batch, bad, ctx, check_id=self.check_id, kind="deviation",
            value_col=self.column, expected=repr(self.expected),
            expected_num=self.expected, deviation=diff,
        )


class FuzzyCheck(StatelessCheck):
    """Fuzzy string match (reference ``validate.fuzzy`` /
    ``RequiredFuzzy``): ``difflib.SequenceMatcher(None, v, expected)
    .ratio() >= cutoff``.  Per-row by necessity (no Arrow kernel);
    still batched and parallel across blocks."""

    def __init__(self, column: str, expected: str, cutoff: float = 0.6,
                 check_id: Optional[str] = None):
        self.column = column
        self.expected = expected
        self.cutoff = cutoff
        self.check_id = check_id or f"fuzzy({column},{expected!r},{cutoff})"

    def kernel(self, batch: pa.Table, ctx: RunContext) -> pa.Table:
        arr = batch.column(self.column)
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        matcher = difflib.SequenceMatcher(None, "", self.expected)
        bad = np.zeros(batch.num_rows, dtype=bool)
        for i, v in enumerate(arr.to_pylist()):
            if not isinstance(v, str):
                bad[i] = True
                continue
            if v == self.expected:
                continue
            matcher.set_seq1(v)
            if matcher.ratio() < self.cutoff:
                bad[i] = True
        return mask_to_violations(
            batch, bad, ctx, check_id=self.check_id, kind="invalid",
            value_col=self.column, expected=self.expected,
        )


class TupleCheck(StatelessCheck):
    """Row-tuple requirement over N columns; element i of each row
    matched by predicate i, ``...`` wildcard (reference
    ``datatest/_predicate.py :: MatcherTuple``).  The violation's value
    is the offending row projected to the checked columns (JSON-ish)."""

    def __init__(self, columns: Sequence[str], specs: tuple,
                 check_id: Optional[str] = None):
        if len(columns) != len(specs):
            raise ValueError("columns and specs must align")
        self.columns = list(columns)
        self.pred = TuplePredicate(specs)
        self.check_id = check_id or f"tuple({','.join(columns)})"

    def kernel(self, batch: pa.Table, ctx: RunContext) -> pa.Table:
        cols = [batch.column(c) for c in self.columns]
        good = self.pred.mask_columns(cols)
        bad = ~good
        if not bad.any():
            return empty_violations()
        idx = np.flatnonzero(bad)
        take = pa.array(idx)
        tuples = [
            "(" + ", ".join(repr(v) for v in row) + ")"
            for row in zip(*[c.take(take).to_pylist() for c in cols])
        ]
        return mask_to_violations(
            batch, bad, ctx, check_id=self.check_id, kind="invalid",
            value=pa.array(tuples, pa.string()),
            expected=self.pred.describe(),
        )


class DomainCheck(StatelessCheck):
    """Row-level domain membership: every ROW whose value is outside the
    allowed set is an ``Extra`` violation (with row_ref lineage).

    Engine extension: the reference's set semantics compare DISTINCT
    values (see ``global_checks.SetCheck``); at 10^12-row scale you also
    want the per-row view for lineage.  Broadcast-small-side pattern —
    the allowed set ships once per task via closure capture, never per
    batch row."""

    def __init__(self, column: str, allowed, check_id: Optional[str] = None,
                 null_ok: bool = False):
        self.column = column
        self.pred = Predicate(set(allowed))
        self.null_ok = null_ok
        self.check_id = check_id or f"domain({column},{len(self.pred.spec)} allowed)"

    def kernel(self, batch: pa.Table, ctx: RunContext) -> pa.Table:
        col = batch.column(self.column)
        bad = ~self.pred.mask(col)
        if self.null_ok:
            arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            if arr.null_count:
                nulls = np.asarray(
                    pc.is_null(arr).to_numpy(zero_copy_only=False), dtype=bool
                )
                bad &= ~nulls
        return mask_to_violations(
            batch, bad, ctx, check_id=self.check_id, kind="extra",
            value_col=self.column,
        )


class SchemaCheck(StatelessCheck):
    """Required-column + dtype check (reference §2.A3: schema expressed
    as requirements — ``validate(data, {'col': type, ...})``).

    Operates on ``ds.schema()`` driver-side with ZERO data read; also
    usable as a per-batch kernel (first batch only would be redundant —
    the suite calls :meth:`check_schema` once instead).

    ``expected`` maps column name -> pyarrow.DataType | python type.
    Missing column -> ``Missing(col)``; type mismatch ->
    ``Invalid(actual_type, expected_type)``; unexpected extra columns ->
    ``Extra(col)`` when ``exact=True``.
    """

    _PY_TO_ARROW_OK = {
        int: pa.types.is_integer,
        float: pa.types.is_floating,
        str: lambda t: pa.types.is_string(t) or pa.types.is_large_string(t),
        bytes: lambda t: pa.types.is_binary(t) or pa.types.is_large_binary(t),
        bool: pa.types.is_boolean,
    }

    fuseable = False  # runs once on ds.schema(), not per batch
    # must see the FULL schema (a pruned-read view would make it report
    # real columns as missing); it reads zero data anyway
    needs_all_columns = True

    def __init__(self, expected: dict, exact: bool = False,
                 check_id: Optional[str] = None):
        self.expected = dict(expected)
        self.exact = exact
        self.check_id = check_id or f"schema({len(expected)} cols)"

    def _type_ok(self, want, got: pa.DataType) -> bool:
        if isinstance(want, pa.DataType):
            return want.equals(got)
        fn = self._PY_TO_ARROW_OK.get(want)
        if fn is None:
            return False
        return bool(fn(got))

    def check_schema(self, schema: pa.Schema, ctx: RunContext) -> pa.Table:
        names = set(schema.names)
        rows = {"kind": [], "value": [], "expected": []}
        for col, want in self.expected.items():
            if col not in names:
                rows["kind"].append("missing")
                rows["value"].append(col)
                rows["expected"].append(str(want))
                continue
            got = schema.field(col).type
            if not self._type_ok(want, got):
                rows["kind"].append("invalid")
                rows["value"].append(f"{col}:{got}")
                rows["expected"].append(
                    f"{col}:{getattr(want, '__name__', want)}"
                )
        if self.exact:
            for col in schema.names:
                if col not in self.expected:
                    rows["kind"].append("extra")
                    rows["value"].append(col)
                    rows["expected"].append(None)
        n = len(rows["kind"])
        if n == 0:
            return empty_violations()
        parts = [
            violations_table(
                1, check_id=self.check_id, kind=k,
                partition_id=ctx.default_partition, value=v, expected=e,
            )
            for k, v, e in zip(rows["kind"], rows["value"], rows["expected"])
        ]
        return pa.concat_tables(parts)

    def kernel(self, batch: pa.Table, ctx: RunContext) -> pa.Table:
        return self.check_schema(batch.schema, ctx)

    def violations(self, ds, ctx: RunContext):
        import ray.data as rd

        table = self.check_schema(ds.schema().base_schema, ctx)
        return rd.from_arrow(table)
