"""``accepted`` — acceptance context-manager algebra.

Reference: ``datatest/acceptances.py :: AcceptedDifferences, AcceptedKeys,
AcceptedArgs, AcceptedTolerance, AcceptedPercent, AcceptedFuzzy,
AcceptedCount`` and the ``|`` / ``&`` composition (upstream 0.11.1;
symbol citations only — SURVEY.md §0/§2.E).

Used as::

    with accepted.tolerance(5):
        validate(data, requirement)          # Deviations within ±5 pass

``__exit__`` intercepts :class:`ValidationError`, filters the differences
through the acceptance, and re-raises with the leftovers (or suppresses
when none remain).

Engine IR path: :meth:`BaseAcceptance.filter_violations` applies the same
algebra to a violation-row Arrow table (SURVEY.md §2.D), in deterministic
``(partition_id, row_ref)`` order so quota-style acceptances (count,
collections) consume matches reproducibly — the key semantic to preserve
per SURVEY.md §2.E.  Violations tables are post-check output (small);
for huge violation sets the stateless acceptances (kind / tolerance /
percent / keys / args) are pure column predicates you can also push into
``Dataset.map_batches`` upstream of collection.
"""

from __future__ import annotations

import difflib
import math
from typing import Any, Mapping, Optional

import pyarrow as pa

from ..differences import (
    BaseDifference,
    Deviation,
    Extra,
    Invalid,
    Missing,
    NOVALUE,
    ValidationError,
    differences_from_table,
    empty_violations,
)
from ..predicate import Predicate

__all__ = ["accepted", "BaseAcceptance"]


class BaseAcceptance:
    """One acceptance; stateful quota bookkeeping resets per filter run."""

    def start(self) -> None:
        """Reset consumable state before filtering a difference set."""

    def accepts(self, diff: BaseDifference, key: Any = None) -> bool:
        raise NotImplementedError

    # -- quota snapshot/rollback (for `&` composition) --------------------
    # `accepts` may consume one-shot quota (collections, count).  An
    # intersection must not consume the left side's quota when the right
    # side then rejects, so quota-bearing acceptances expose a cheap
    # snapshot of their consumable state.  Stateless acceptances snapshot
    # to None.
    def _snapshot(self):
        return None

    def _restore(self, state) -> None:
        pass

    # -- composition ------------------------------------------------------
    def __or__(self, other: "BaseAcceptance") -> "BaseAcceptance":
        return UnionedAcceptance(self, other)

    def __and__(self, other: "BaseAcceptance") -> "BaseAcceptance":
        return IntersectedAcceptance(self, other)

    # -- context manager --------------------------------------------------
    def __enter__(self) -> "BaseAcceptance":
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        if exc_type is None:
            return False
        if not issubclass(exc_type, ValidationError):
            return False
        leftovers = self.filter(exc.differences)
        if isinstance(leftovers, dict):
            if any(v for v in leftovers.values()):
                raise ValidationError(
                    {k: v for k, v in leftovers.items() if v}, exc.description
                ) from None
            return True
        if leftovers:
            raise ValidationError(leftovers, exc.description) from None
        return True

    # -- filtering --------------------------------------------------------
    def filter(self, differences):
        """Leftover differences after acceptance (list or dict shape)."""
        self.start()
        if isinstance(differences, Mapping):
            out: dict = {}
            for k in differences:
                group = differences[k]
                group = group if isinstance(group, (list, tuple)) else [group]
                left = [d for d in group if not self.accepts(d, key=k)]
                if left:
                    out[k] = left
            return out
        return [d for d in differences if not self.accepts(d)]

    # -- statelessness (for the lazy Dataset path) -------------------------
    @property
    def stateless(self) -> bool:
        """True when ``accepts`` never consumes quota — the acceptance is
        then a pure row predicate that can stream over a violations
        Dataset without a deterministic global consume order."""
        return True

    def accepts_mask(self, table: pa.Table) -> "np.ndarray":
        """Vectorized accepts() over violation rows (stateless only);
        default falls back to the per-row predicate."""
        import numpy as np

        diffs = differences_from_table(table)
        keys = table.column("key").to_pylist()
        return np.fromiter(
            (bool(self.accepts(d, key=k)) for d, k in zip(diffs, keys)),
            dtype=bool, count=table.num_rows,
        )

    def filter_violations_dataset(self, vds):
        """LAZY leftover filter over a violations Dataset — the scale
        path for huge violation sets (SURVEY.md §2.E note): stateless
        acceptances are pure column predicates, so they push into
        ``map_batches`` upstream of any collection.  Quota-bearing
        acceptances (collections, count) need the deterministic global
        consume order and must use :meth:`filter_violations` on the
        collected table instead."""
        if not self.stateless:
            raise TypeError(
                f"{type(self).__name__} consumes one-shot quota and "
                "cannot stream; collect the violations and use "
                "filter_violations()"
            )

        def kernel(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            mask = self.accepts_mask(t)
            if mask.all():
                return empty_violations()
            return t.filter(pa.array(~mask))

        return vds.map_batches(kernel, batch_format="pyarrow",
                               zero_copy_batch=True)

    def filter_violations(self, table: pa.Table) -> pa.Table:
        """Engine IR path: violation rows in, leftover rows out."""
        if table.num_rows == 0:
            return table
        import pyarrow.compute as pc

        order = pc.sort_indices(
            table,
            sort_keys=[("check_id", "ascending"), ("partition_id", "ascending"),
                       ("row_ref", "ascending"), ("value", "ascending")],
        )
        table = table.take(order)
        diffs = differences_from_table(table)
        keys = table.column("key").to_pylist()
        self.start()
        keep = [
            i for i, (d, k) in enumerate(zip(diffs, keys)) if not self.accepts(d, key=k)
        ]
        if len(keep) == table.num_rows:
            return table
        if not keep:
            return empty_violations()
        return table.take(pa.array(keep))


class UnionedAcceptance(BaseAcceptance):
    """``a | b`` — accepted when either accepts (a consulted first, so a
    consumes before b)."""

    def __init__(self, a: BaseAcceptance, b: BaseAcceptance):
        self.a, self.b = a, b

    def start(self):
        self.a.start()
        self.b.start()

    def _snapshot(self):
        return (self.a._snapshot(), self.b._snapshot())

    def _restore(self, state):
        self.a._restore(state[0])
        self.b._restore(state[1])

    @property
    def stateless(self):
        return self.a.stateless and self.b.stateless

    def accepts_mask(self, table):
        return self.a.accepts_mask(table) | self.b.accepts_mask(table)

    def accepts(self, diff, key=None):
        return self.a.accepts(diff, key) or self.b.accepts(diff, key)


class IntersectedAcceptance(BaseAcceptance):
    """``a & b`` — accepted only when both accept."""

    def __init__(self, a: BaseAcceptance, b: BaseAcceptance):
        self.a, self.b = a, b

    def start(self):
        self.a.start()
        self.b.start()

    def _snapshot(self):
        return (self.a._snapshot(), self.b._snapshot())

    def _restore(self, state):
        self.a._restore(state[0])
        self.b._restore(state[1])

    @property
    def stateless(self):
        return self.a.stateless and self.b.stateless

    def accepts_mask(self, table):
        return self.a.accepts_mask(table) & self.b.accepts_mask(table)

    def accepts(self, diff, key=None):
        # a may consume one-shot quota before b gets a say; if b then
        # rejects, roll a back so the quota entry stays available for a
        # later difference that satisfies BOTH sides.
        state = self.a._snapshot()
        if not self.a.accepts(diff, key):
            return False
        if self.b.accepts(diff, key):
            return True
        self.a._restore(state)
        return False


def _diff_identity(d: BaseDifference):
    def norm(v):
        if isinstance(v, float) and math.isnan(v):
            return "__nan__"
        try:
            hash(v)
            return v
        except TypeError:
            return repr(v)

    return (type(d).__name__, tuple(norm(a) for a in d.args))


class AcceptedDifferences(BaseAcceptance):
    """``accepted(obj)``: instance, class, collection, or per-key mapping
    (reference ``AcceptedDifferences``).  Instance/collection matches are
    consumed one-for-one."""

    def __init__(self, obj: Any):
        self.obj = obj
        self._quota: dict = {}
        self._classes: list = []
        self._key_quota: dict = {}
        self.start()

    @staticmethod
    def _build_quota(obj) -> tuple[dict, list]:
        """(multiset of instances, list of accepted classes)."""
        quota: dict = {}
        classes: list = []
        items = obj if isinstance(obj, (list, set, frozenset, tuple)) else [obj]
        for it in items:
            if isinstance(it, type) and issubclass(it, BaseDifference):
                classes.append(it)
            elif isinstance(it, BaseDifference):
                k = _diff_identity(it)
                quota[k] = quota.get(k, 0) + 1
            else:
                raise TypeError(f"cannot accept {it!r}")
        return quota, classes

    def start(self):
        if isinstance(self.obj, Mapping):
            self._key_quota = {
                k: self._build_quota(v) for k, v in self.obj.items()
            }
        else:
            self._quota, self._classes = self._build_quota(self.obj)

    @property
    def stateless(self):
        # class-only acceptances (accepted(Missing)) are pure kind
        # filters; instance/collection/mapping forms consume quota
        return (
            not isinstance(self.obj, Mapping)
            and not self._quota
            and bool(self._classes)
        )

    def accepts_mask(self, table):
        import numpy as np
        import pyarrow.compute as pc

        if not self.stateless:
            # the per-row fallback would silently consume quota
            raise TypeError("quota-bearing acceptance has no row mask")
        if BaseDifference in self._classes:
            return np.ones(table.num_rows, dtype=bool)
        kinds = [c.__name__.lower() for c in self._classes]
        return pc.is_in(
            table.column("kind"), value_set=pa.array(kinds)
        ).to_numpy(zero_copy_only=False)

    def _snapshot(self):
        return (
            dict(self._quota),
            {k: (dict(q), c) for k, (q, c) in self._key_quota.items()},
        )

    def _restore(self, state):
        self._quota, self._key_quota = state

    def accepts(self, diff, key=None):
        if isinstance(self.obj, Mapping):
            if key not in self._key_quota:
                return False
            quota, classes = self._key_quota[key]
        else:
            quota, classes = self._quota, self._classes
        if any(isinstance(diff, c) for c in classes):
            return True
        k = _diff_identity(diff)
        if quota.get(k, 0) > 0:
            quota[k] -= 1
            return True
        return False


class AcceptedKeys(BaseAcceptance):
    def __init__(self, predicate):
        self.pred = Predicate(predicate)

    def accepts(self, diff, key=None):
        return bool(self.pred(key))


class AcceptedArgs(BaseAcceptance):
    def __init__(self, predicate):
        from ..predicate import get_predicate

        self.pred = get_predicate(predicate)

    def accepts(self, diff, key=None):
        from ..predicate import TuplePredicate

        args = diff.args
        if isinstance(self.pred, TuplePredicate):
            return bool(self.pred(args))
        if len(args) == 1:
            return bool(self.pred(args[0]))
        return bool(self.pred(args))


class AcceptedTolerance(BaseAcceptance):
    """``accepted.tolerance(tol)`` / ``(lower, upper)``: Deviations whose
    deviation lies within the bounds."""

    def __init__(self, lower, upper=None):
        if upper is None:
            if lower < 0:
                raise ValueError("tolerance must be non-negative")
            self.lower, self.upper = -lower, lower
        else:
            if lower > upper:
                raise ValueError("lower must be <= upper")
            self.lower, self.upper = lower, upper

    def accepts_mask(self, table):
        import numpy as np
        import pyarrow.compute as pc

        kind = pc.equal(table.column("kind"), "deviation").to_numpy(
            zero_copy_only=False
        )
        dev = table.column("deviation").to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore"):
            inside = (dev >= self.lower) & (dev <= self.upper)
        return kind & np.nan_to_num(inside, nan=False).astype(bool)

    def accepts(self, diff, key=None):
        if not isinstance(diff, Deviation):
            return False
        d = diff.deviation
        if isinstance(d, float) and math.isnan(d):
            return False
        return self.lower <= d <= self.upper


class AcceptedPercent(BaseAcceptance):
    """``accepted.percent(tol)``: ``abs(deviation / expected) <= tol``."""

    def __init__(self, tolerance: float):
        if tolerance < 0:
            raise ValueError("tolerance must be non-negative")
        self.tolerance = tolerance

    def accepts_mask(self, table):
        import numpy as np
        import pyarrow.compute as pc

        kind = pc.equal(table.column("kind"), "deviation").to_numpy(
            zero_copy_only=False
        )
        dev = table.column("deviation").to_numpy(zero_copy_only=False)
        exp = table.column("expected_num").to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            ok = np.where(
                (exp == 0) | np.isnan(exp),
                dev == 0,
                np.abs(dev / exp) <= self.tolerance,
            )
        return kind & np.nan_to_num(ok, nan=False).astype(bool)

    def accepts(self, diff, key=None):
        if not isinstance(diff, Deviation):
            return False
        d, e = diff.deviation, diff.expected
        if isinstance(d, float) and math.isnan(d):
            return False
        if not e:
            return d == 0
        return abs(d / e) <= self.tolerance


class AcceptedFuzzy(BaseAcceptance):
    """``accepted.fuzzy(cutoff)``: Invalid string diffs whose value
    fuzzily matches their expected value."""

    def __init__(self, cutoff: float = 0.6):
        self.cutoff = cutoff

    def accepts(self, diff, key=None):
        if not isinstance(diff, Invalid):
            return False
        v, e = diff.invalid, diff.expected
        if e is NOVALUE or not isinstance(v, str) or not isinstance(e, str):
            return False
        if v == e:
            return True
        return difflib.SequenceMatcher(None, v, e).ratio() >= self.cutoff


class AcceptedCount(BaseAcceptance):
    """``accepted.count(n)``: accept up to n differences (consumed in
    iteration order — deterministic under filter_violations' sort)."""

    def __init__(self, number: int):
        self.number = number
        self._left = number

    stateless = False

    def start(self):
        self._left = self.number

    def _snapshot(self):
        return self._left

    def _restore(self, state):
        self._left = state

    def accepts(self, diff, key=None):
        if self._left > 0:
            self._left -= 1
            return True
        return False


class _AcceptedFactory:
    """The ``accepted`` callable with method attributes, mirroring the
    reference's API shape."""

    def __call__(self, obj: Any) -> AcceptedDifferences:
        return AcceptedDifferences(obj)

    @staticmethod
    def keys(predicate) -> AcceptedKeys:
        return AcceptedKeys(predicate)

    @staticmethod
    def args(predicate) -> AcceptedArgs:
        return AcceptedArgs(predicate)

    @staticmethod
    def tolerance(lower, upper=None) -> AcceptedTolerance:
        return AcceptedTolerance(lower, upper)

    @staticmethod
    def percent(tolerance) -> AcceptedPercent:
        return AcceptedPercent(tolerance)

    @staticmethod
    def fuzzy(cutoff: float = 0.6) -> AcceptedFuzzy:
        return AcceptedFuzzy(cutoff)

    @staticmethod
    def count(number: int) -> AcceptedCount:
        return AcceptedCount(number)


accepted = _AcceptedFactory()
