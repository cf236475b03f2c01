"""Predicate: compile any requirement spec into a matcher.

Reference semantics: ``datatest/_predicate.py :: Predicate, get_matcher,
MatcherObject, MatcherTuple`` (upstream 0.11.1; symbol-name citations only —
see SURVEY.md §0/§2.C).

A spec may be: a ``set`` (membership), a callable, a ``type``
(``isinstance``), a compiled ``re.Pattern`` (``.search``), ``True``/``False``
(truthiness), ``Ellipsis`` (wildcard), a scalar (NaN-safe equality), or a
``tuple`` of any of these (row-tuple matching, handled by
:class:`TuplePredicate`).

Each predicate provides two evaluation paths:

* ``pred(value) -> bool`` — per-element, exact upstream parity.
* ``pred.mask(array) -> np.ndarray[bool]`` — vectorized over a pyarrow
  Array/ChunkedArray; True where the element MATCHES.  Nulls resolve to
  False at every leaf (a null never matches a concrete requirement), so
  masks are always dense booleans and ``~`` inversion is exact.

Vectorized lowerings (pyarrow.compute): ``set -> is_in``, ``regex ->
match_substring_regex`` (falls back to per-row ``re`` for non-RE2
patterns), ``scalar -> equal`` (NaN via ``is_nan``), ``type`` -> Arrow
type comparison (zero per-value work for typed columns), ``True/False`` ->
truthiness kernels.  Callables always take the per-row path.
"""

from __future__ import annotations

import math
import re
from typing import Any, Callable, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["Predicate", "TuplePredicate", "get_predicate"]


def _combine(arr) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


def _to_numpy_bool(mask: pa.Array, n: int) -> np.ndarray:
    """Arrow boolean array (possibly with nulls) -> dense numpy bool."""
    if isinstance(mask, pa.ChunkedArray):
        mask = mask.combine_chunks()
    if mask.null_count:
        mask = mask.fill_null(False)
    out = mask.to_numpy(zero_copy_only=False)
    return np.asarray(out, dtype=bool)


def _is_nan(v: Any) -> bool:
    return isinstance(v, float) and math.isnan(v)


_ARROW_TYPE_MATCH: list[tuple[Callable[[pa.DataType], bool], type]] = [
    (pa.types.is_boolean, bool),
    (pa.types.is_integer, int),
    (pa.types.is_floating, float),
    (lambda t: pa.types.is_string(t) or pa.types.is_large_string(t), str),
    (lambda t: pa.types.is_binary(t) or pa.types.is_large_binary(t), bytes),
]


def _arrow_type_is(py_type: type, arrow_type: pa.DataType) -> Optional[bool]:
    """Whether every non-null element of this Arrow type is an instance of
    ``py_type``.  None = undecidable (fall back to per-row)."""
    for check, t in _ARROW_TYPE_MATCH:
        if check(arrow_type):
            if py_type is object:
                return True
            # bool is a subclass of int in Python: isinstance(True, int) is True
            if t is bool and py_type is int:
                return True
            return issubclass(t, py_type)
    if pa.types.is_decimal(arrow_type):
        return None
    if pa.types.is_timestamp(arrow_type) or pa.types.is_date(arrow_type):
        return None
    return None


class Predicate:
    """Compiled single-element matcher. ``~pred`` inverts."""

    def __init__(self, spec: Any, name: Optional[str] = None, _inverted: bool = False):
        if isinstance(spec, Predicate):
            self.spec = spec.spec
            _inverted = _inverted ^ spec.inverted
        else:
            self.spec = spec
        self.name = name
        self.inverted = _inverted
        self._row_fn = self._compile_row_fn(self.spec)

    # -- representation ----------------------------------------------------
    def __repr__(self) -> str:
        inner = getattr(self.spec, "__name__", None) or repr(self.spec)
        prefix = "~" if self.inverted else ""
        return f"{prefix}Predicate({inner})"

    def describe(self) -> str:
        spec = self.spec
        if isinstance(spec, re.Pattern):
            body = f"regex({spec.pattern!r})"
        elif isinstance(spec, (set, frozenset)):
            body = f"in_set({len(spec)})"
        elif isinstance(spec, type):
            body = f"type({spec.__name__})"
        elif callable(spec):
            body = getattr(spec, "__name__", "callable")
        elif spec is Ellipsis:
            body = "any"
        else:
            body = repr(spec)
        return ("~" if self.inverted else "") + body

    def __invert__(self) -> "Predicate":
        return Predicate(self.spec, name=self.name, _inverted=not self.inverted)

    # -- per-element path --------------------------------------------------
    @staticmethod
    def _compile_row_fn(spec: Any) -> Callable[[Any], Any]:
        if spec is Ellipsis:
            return lambda v: True
        if isinstance(spec, (set, frozenset)):
            has_nan = any(_is_nan(m) for m in spec)

            def in_set(v, _s=spec, _nan=has_nan):
                if _is_nan(v):
                    return _nan
                try:
                    return v in _s
                except TypeError:
                    return False

            return in_set
        if isinstance(spec, re.Pattern):

            def regex(v, _p=spec):
                try:
                    return _p.search(v) is not None
                except TypeError:
                    return False

            return regex
        if isinstance(spec, type):
            return lambda v, _t=spec: isinstance(v, _t)
        if spec is True:
            return lambda v: bool(v)
        if spec is False:
            return lambda v: not bool(v)
        if callable(spec):
            return spec
        # scalar equality, NaN-safe
        if _is_nan(spec):
            return lambda v: _is_nan(v)

        def equals(v, _e=spec):
            if _is_nan(v):
                return False
            try:
                return bool(v == _e)
            except Exception:
                return False

        return equals

    def __call__(self, value: Any) -> Any:
        result = self._row_fn(value)
        if self.inverted:
            # a callable may return a difference object; inversion only
            # makes sense for booleans (upstream behaviour)
            return not result
        return result

    # -- vectorized path ---------------------------------------------------
    def mask(self, arr) -> np.ndarray:
        """Dense boolean match-mask over a pyarrow Array/ChunkedArray."""
        arr = _combine(arr)
        n = len(arr)
        m = self._mask_impl(arr, n)
        if self.inverted:
            m = ~m
        return m

    def _mask_impl(self, arr: pa.Array, n: int) -> np.ndarray:
        spec = self.spec
        if spec is Ellipsis:
            return np.ones(n, dtype=bool)
        if isinstance(spec, (set, frozenset)):
            return self._mask_set(arr, n, spec)
        if isinstance(spec, re.Pattern):
            return self._mask_regex(arr, n, spec)
        if isinstance(spec, type):
            decided = _arrow_type_is(spec, arr.type)
            if decided is None:
                return self._mask_rows(arr)
            if not decided:
                return np.zeros(n, dtype=bool)
            valid = pc.is_valid(arr)
            return _to_numpy_bool(valid, n)
        if spec is True or spec is False:
            truthy = self._mask_truthy(arr, n)
            return truthy if spec is True else ~truthy
        if callable(spec):
            return self._mask_rows(arr)
        # scalar equality
        if _is_nan(spec):
            if pa.types.is_floating(arr.type):
                return _to_numpy_bool(pc.is_nan(arr), n)
            return np.zeros(n, dtype=bool)
        try:
            eq = pc.equal(arr, pa.scalar(spec))
            return _to_numpy_bool(eq, n)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
            return self._mask_rows(arr)

    def _mask_set(self, arr: pa.Array, n: int, spec) -> np.ndarray:
        clean = [m for m in spec if not _is_nan(m)]
        has_nan = len(clean) != len(spec)
        try:
            vs = pa.array(clean)
            m = _to_numpy_bool(pc.is_in(arr, value_set=vs), n)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
            return self._mask_rows(arr)
        if has_nan and pa.types.is_floating(arr.type):
            m |= _to_numpy_bool(pc.is_nan(arr), n)
        return m

    def _mask_regex(self, arr: pa.Array, n: int, spec: re.Pattern) -> np.ndarray:
        if not (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)):
            return self._mask_rows(arr)
        try:
            m = pc.match_substring_regex(arr, spec.pattern)
            return _to_numpy_bool(m, n)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            # non-RE2 pattern (backrefs, lookarounds): per-row re fallback
            return self._mask_rows(arr)

    def _mask_truthy(self, arr: pa.Array, n: int) -> np.ndarray:
        t = arr.type
        if pa.types.is_boolean(t):
            return _to_numpy_bool(arr, n)
        if pa.types.is_integer(t) or pa.types.is_floating(t):
            return _to_numpy_bool(pc.not_equal(arr, pa.scalar(0)), n)
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return _to_numpy_bool(pc.not_equal(arr, pa.scalar("")), n)
        return self._mask_rows(arr)

    def _mask_rows(self, arr: pa.Array) -> np.ndarray:
        fn = self._row_fn
        return np.fromiter((bool(fn(v)) for v in arr.to_pylist()), dtype=bool, count=len(arr))


class TuplePredicate:
    """Row-tuple matcher: element i matched by predicate i; ``...`` wildcard.

    Reference: ``datatest/_predicate.py :: MatcherTuple``.
    """

    def __init__(self, specs: tuple):
        self.preds = tuple(Predicate(s) for s in specs)
        self.specs = specs

    def __len__(self) -> int:
        return len(self.preds)

    def __repr__(self) -> str:
        return f"TuplePredicate({self.specs!r})"

    def describe(self) -> str:
        return "(" + ", ".join(p.describe() for p in self.preds) + ")"

    def __call__(self, row: tuple) -> bool:
        if len(row) != len(self.preds):
            return False
        return all(p(v) for p, v in zip(self.preds, row))

    def mask_columns(self, columns: list) -> np.ndarray:
        """AND-compose per-column masks; columns aligned with specs."""
        if len(columns) != len(self.preds):
            raise ValueError("column count != predicate count")
        out: Optional[np.ndarray] = None
        for p, col in zip(self.preds, columns):
            m = p.mask(col)
            out = m if out is None else (out & m)
        return out if out is not None else np.zeros(0, dtype=bool)


def get_predicate(spec: Any):
    """Auto-dispatch: tuple -> TuplePredicate, else Predicate."""
    if isinstance(spec, (Predicate, TuplePredicate)):
        return spec
    if isinstance(spec, tuple):
        return TuplePredicate(spec)
    return Predicate(spec)
