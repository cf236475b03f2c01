"""``DataTestCase`` — the unittest surface (SURVEY.md §2.G).

Reference: ``datatest/case.py :: DataTestCase`` (upstream 0.11.1; symbol
citations only — SURVEY.md §0).  A thin :class:`unittest.TestCase`
subclass wrapping the functional API: ``assertValid`` mirrors
``validate`` (including Dataset dispatch), the ``assertValid<Name>``
variants mirror ``validate.<name>``, and the ``accepted*`` helpers
return the same acceptance context managers as the functional
``accepted`` factory, so::

    class MyTests(DataTestCase):
        def test_fields(self):
            with self.acceptedTolerance(5):
                self.assertValid(data, {'qty': int})

behaves exactly like the functional path.
"""

from __future__ import annotations

import unittest
from typing import Any, Optional

from .pipelines.acceptance import accepted
from .pipelines.validate import validate

__all__ = ["DataTestCase"]


class DataTestCase(unittest.TestCase):
    """unittest integration: assertion wrappers over ``validate`` and
    acceptance-factory helpers (failures raise :class:`ValidationError`,
    an ``AssertionError`` subclass, so unittest reports them as ordinary
    test failures)."""

    maxDiff = None

    # -- assertions (mirror validate / validate.<name>) -------------------
    def assertValid(self, data: Any, requirement: Any,
                    msg: Optional[str] = None, **kwargs) -> None:
        validate(data, requirement, msg, **kwargs)

    def assertValidPredicate(self, data, requirement, msg=None, **kwargs):
        validate.predicate(data, requirement, msg=msg, **kwargs)

    def assertValidRegex(self, data, requirement, flags=0, msg=None, **kwargs):
        validate.regex(data, requirement, flags=flags, msg=msg, **kwargs)

    def assertValidApprox(self, data, requirement, places=None, msg=None,
                          delta=None, **kwargs):
        validate.approx(data, requirement, places=places, msg=msg,
                        delta=delta, **kwargs)

    def assertValidFuzzy(self, data, requirement, cutoff=0.6, msg=None,
                         **kwargs):
        validate.fuzzy(data, requirement, cutoff=cutoff, msg=msg, **kwargs)

    def assertValidInterval(self, data, min=None, max=None, msg=None,
                            **kwargs):
        validate.interval(data, min=min, max=max, msg=msg, **kwargs)

    def assertValidSet(self, data, requirement, msg=None, **kwargs):
        validate.set(data, requirement, msg=msg, **kwargs)

    def assertValidSubset(self, data, requirement, msg=None, **kwargs):
        validate.subset(data, requirement, msg=msg, **kwargs)

    def assertValidSuperset(self, data, requirement, msg=None, **kwargs):
        validate.superset(data, requirement, msg=msg, **kwargs)

    def assertValidUnique(self, data, msg=None, **kwargs):
        validate.unique(data, msg=msg, **kwargs)

    def assertValidOrder(self, data, requirement, msg=None, **kwargs):
        validate.order(data, requirement, msg=msg, **kwargs)

    # -- acceptance helpers (mirror the ``accepted`` factory) -------------
    def accepted(self, obj):
        return accepted(obj)

    def acceptedKeys(self, predicate):
        return accepted.keys(predicate)

    def acceptedArgs(self, predicate):
        return accepted.args(predicate)

    def acceptedTolerance(self, lower, upper=None):
        return accepted.tolerance(lower, upper)

    def acceptedPercent(self, tolerance):
        return accepted.percent(tolerance)

    def acceptedFuzzy(self, cutoff: float = 0.6):
        return accepted.fuzzy(cutoff)

    def acceptedCount(self, number: int):
        return accepted.count(number)
