"""Difference types and the violation-row IR.

Reference semantics: ``datatest/differences.py :: BaseDifference, Missing,
Extra, Invalid, Deviation`` (upstream shawnbrown/datatest 0.11.1 — the
mounted reference tree was empty at survey time, see SURVEY.md §0; symbols
cited by name only).

Two representations live here:

1. **Python difference objects** (``Missing``/``Extra``/``Invalid``/
   ``Deviation``) with upstream-parity equality / repr / NaN handling —
   used by the in-memory ``validate()`` API and by the parity test-suite,
   which asserts on exact difference lists.

2. **The violation-row Arrow schema** — the single IR every distributed
   check emits and every acceptance filters.  A violation row is one
   difference plus lineage (check id, partition id, row ref, mapping key).
   ``differences_from_table`` converts violation rows back into difference
   objects so both representations stay interchangeable in tests.
"""

from __future__ import annotations

import math
from typing import Any, Iterable, Optional

import numpy as np
import pyarrow as pa

__all__ = [
    "BaseDifference",
    "Missing",
    "Extra",
    "Invalid",
    "Deviation",
    "ValidationError",
    "NOVALUE",
    "VIOLATION_SCHEMA",
    "VIOLATION_FIELDS",
    "empty_violations",
    "violations_table",
    "differences_from_table",
]


class _NoValueType:
    """Sentinel for an omitted ``expected`` (upstream ``NOVALUE``)."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self):  # pragma: no cover - trivial
        return "<no value>"

    def __bool__(self):
        return False


NOVALUE = _NoValueType()


def _nan_aware_eq(a: Any, b: Any) -> bool:
    """Equality where NaN == NaN (upstream predicate/difference semantics)."""
    if a is b:
        return True
    a_nan = isinstance(a, float) and math.isnan(a)
    b_nan = isinstance(b, float) and math.isnan(b)
    if a_nan or b_nan:
        return a_nan and b_nan
    try:
        return bool(a == b)
    except Exception:
        return False


class BaseDifference:
    """A single violation record; compares by ``(type, args)``, NaN-safe."""

    __slots__ = ("_args",)

    def __init__(self, *args: Any):
        if not args:
            raise TypeError(f"{type(self).__name__} requires at least one argument")
        self._args = args

    @property
    def args(self) -> tuple:
        return self._args

    def __eq__(self, other: Any) -> bool:
        if type(self) is not type(other):
            return NotImplemented
        if len(self._args) != len(other._args):
            return False
        return all(_nan_aware_eq(a, b) for a, b in zip(self._args, other._args))

    def __ne__(self, other: Any) -> bool:
        result = self.__eq__(other)
        if result is NotImplemented:
            return result
        return not result

    def __hash__(self) -> int:
        def norm(v):
            if isinstance(v, float) and math.isnan(v):
                return "__nan__"
            try:
                hash(v)
                return v
            except TypeError:
                return repr(v)

        return hash((type(self).__name__, tuple(norm(a) for a in self._args)))

    def __repr__(self) -> str:
        return f"{type(self).__name__}({', '.join(repr(a) for a in self._args)})"


class Missing(BaseDifference):
    """A required value that never appeared in the data."""

    def __init__(self, value: Any):
        super().__init__(value)


class Extra(BaseDifference):
    """A data value not present in the requirement (or a duplicate)."""

    def __init__(self, value: Any):
        super().__init__(value)


class Invalid(BaseDifference):
    """A value that failed a predicate; optional ``expected``."""

    def __init__(self, invalid: Any, expected: Any = NOVALUE):
        if expected is NOVALUE:
            super().__init__(invalid)
        else:
            super().__init__(invalid, expected)
        self.invalid = invalid
        self.expected = expected

    def __repr__(self) -> str:
        if self.expected is NOVALUE:
            return f"Invalid({self.invalid!r})"
        return f"Invalid({self.invalid!r}, expected={self.expected!r})"


class Deviation(BaseDifference):
    """A numeric mismatch: ``deviation = actual - expected`` (nonzero)."""

    def __init__(self, deviation: float, expected: float):
        num = (int, float)
        if not isinstance(deviation, num) or not isinstance(expected, num):
            raise ValueError("Deviation requires numeric arguments")
        if not math.isnan(deviation) and deviation == 0:
            raise ValueError("deviation must be nonzero (use Invalid for equality)")
        super().__init__(deviation, expected)
        self.deviation = deviation
        self.expected = expected


class ValidationError(AssertionError):
    """Raised when validation fails; carries the differences.

    Reference: ``datatest/validation.py :: ValidationError`` — a
    list- or dict-shaped collection of differences plus a description,
    with a truncated repr for large collections.
    """

    _max_repr = 10

    # Truncation hooks (reference ``datatest/validation.py ::
    # _should_truncate / _truncation_notice``, set by the test
    # integrations): when ``_should_truncate(line_count, char_count)``
    # returns True, the repr stops there and appends
    # ``_truncation_notice``.  When unset, the default ``_max_repr``
    # elision applies.
    _should_truncate = None
    _truncation_notice = None

    def __init__(self, differences, description: str = "validation failed"):
        self.differences = differences
        self.description = description
        super().__init__(description)

    def _truncation_hook(self):
        # avoid implicit bound-method binding when a plain function is
        # assigned as a class attribute (upstream assigns module-level
        # functions to these hooks)
        return self.__dict__.get("_should_truncate",
                                 type(self)._should_truncate)

    def _hook_truncated(self) -> str:
        should_truncate = self._truncation_hook()
        diffs = self.differences
        if isinstance(diffs, dict):
            all_lines = [f"    {k!r}: {v!r}," for k, v in diffs.items()]
            n, noun, op, cl = len(diffs), "keys", "{", "}"
        else:
            all_lines = [f"    {d!r}," for d in diffs]
            n, noun, op, cl = len(all_lines), "differences", "[", "]"
        kept, chars = [], 0
        truncated = False
        for line in all_lines:
            if should_truncate(len(kept) + 1, chars + len(line)):
                truncated = True
                break
            kept.append(line)
            chars += len(line)
        body = "\n".join(kept)
        tail = f"\n    {self._truncation_notice}" if (
            truncated and self._truncation_notice
        ) else ""
        return (f"{self.description} ({n} {noun}):\n{op}\n{body}{tail}\n{cl}")

    def __str__(self) -> str:
        if callable(self._truncation_hook()):
            return self._hook_truncated()
        diffs = self.differences
        if isinstance(diffs, dict):
            items = list(diffs.items())
            shown = items[: self._max_repr]
            body = "\n".join(f"    {k!r}: {v!r}," for k, v in shown)
            more = len(items) - len(shown)
            tail = f"\n    ... ({more} more keys)" if more > 0 else ""
            return f"{self.description} ({len(items)} keys):\n{{\n{body}{tail}\n}}"
        items = list(diffs)
        shown = items[: self._max_repr]
        body = "\n".join(f"    {d!r}," for d in shown)
        more = len(items) - len(shown)
        tail = f"\n    ... ({more} more)" if more > 0 else ""
        return f"{self.description} ({len(items)} differences):\n[\n{body}{tail}\n]"


# ---------------------------------------------------------------------------
# Violation-row Arrow IR (SURVEY.md §2.D)
# ---------------------------------------------------------------------------

VIOLATION_FIELDS = [
    ("check_id", pa.string()),      # e.g. "interval(w,1,16384)"
    ("partition_id", pa.string()),  # lineage: fragment / file / block id
    ("row_ref", pa.string()),       # row key (image_id etc.); null for group-level
    ("kind", pa.string()),          # 'missing' | 'extra' | 'invalid' | 'deviation'
    ("key", pa.string()),           # mapping/group key, if any
    ("value", pa.string()),         # offending value, stringified
    ("value_num", pa.float64()),    # numeric view of value when numeric
    ("expected", pa.string()),
    ("expected_num", pa.float64()),
    ("deviation", pa.float64()),    # actual - expected (deviation kind only)
]

VIOLATION_SCHEMA = pa.schema(VIOLATION_FIELDS)

_KIND_FOR_CLASS = {Missing: "missing", Extra: "extra", Invalid: "invalid", Deviation: "deviation"}
_CLASS_FOR_KIND = {v: k for k, v in _KIND_FOR_CLASS.items()}


def empty_violations() -> pa.Table:
    return VIOLATION_SCHEMA.empty_table()


def _as_str_array(values, n: int) -> pa.Array:
    if values is None:
        return pa.nulls(n, pa.string())
    if isinstance(values, str):
        return pa.array([values] * n, pa.string())
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        arr = values.combine_chunks() if isinstance(values, pa.ChunkedArray) else values
        if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
            return arr.cast(pa.string())
        return arr.cast(pa.string(), safe=False)
    return pa.array([None if v is None else str(v) for v in values], pa.string())


def _as_f64_array(values, n: int) -> pa.Array:
    if values is None:
        return pa.nulls(n, pa.float64())
    if isinstance(values, (int, float)):
        return pa.array([float(values)] * n, pa.float64())
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        arr = values.combine_chunks() if isinstance(values, pa.ChunkedArray) else values
        try:
            return arr.cast(pa.float64())
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            return pa.nulls(n, pa.float64())
    return pa.array(
        [float(v) if v is not None else None for v in values], pa.float64()
    )


def violations_table(
    n: int,
    *,
    check_id: str,
    kind: str,
    partition_id=None,
    row_ref=None,
    key=None,
    value=None,
    value_num=None,
    expected=None,
    expected_num=None,
    deviation=None,
) -> pa.Table:
    """Build a violation table of ``n`` rows; scalar args broadcast."""
    if n == 0:
        return empty_violations()
    cols = [
        _as_str_array(check_id, n),
        _as_str_array(partition_id, n),
        _as_str_array(row_ref, n),
        _as_str_array(kind, n),
        _as_str_array(key, n),
        _as_str_array(value, n),
        _as_f64_array(value_num, n),
        _as_str_array(expected, n),
        _as_f64_array(expected_num, n),
        _as_f64_array(deviation, n),
    ]
    return pa.Table.from_arrays(cols, schema=VIOLATION_SCHEMA)


def _reify_value(s: Optional[str], num: Optional[float]) -> Any:
    """Prefer the numeric view when present; else the string."""
    if num is not None:
        if s is not None and "." not in s and "e" not in s.lower() and not (
            isinstance(num, float) and math.isnan(num)
        ):
            # integral-looking original
            try:
                return int(s)
            except ValueError:
                return num
        return num
    return s


def differences_from_table(table: pa.Table) -> list:
    """Convert violation rows back to difference objects (test parity)."""
    out = []
    for row in table.to_pylist():
        kind = row["kind"]
        cls = _CLASS_FOR_KIND[kind]
        if cls is Deviation:
            out.append(Deviation(row["deviation"], _reify_value(row["expected"], row["expected_num"])))
        elif cls is Invalid:
            val = _reify_value(row["value"], row["value_num"])
            if row["expected"] is None and row["expected_num"] is None:
                out.append(Invalid(val))
            else:
                out.append(Invalid(val, _reify_value(row["expected"], row["expected_num"])))
        else:
            out.append(cls(_reify_value(row["value"], row["value_num"])))
    return out
