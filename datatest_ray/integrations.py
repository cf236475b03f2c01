"""Test-framework integration surfaces (SURVEY.md §2.G).

Reference equivalents:

* ``working_directory`` — datatest's fixture-relative-path context
  manager/decorator (``datatest/_working_directory.py``).
* ``register_accessors`` — datatest patches a ``.validate(...)``
  accessor onto pandas DataFrames; here it patches
  ``ray.data.Dataset.validate`` (and ``.valid``) so
  ``ds.validate({'col': requirement})`` raises ``ValidationError``
  exactly like the functional API.
* ``compare_datasets`` — the RepeatingContainer use-case: run one check
  suite over two Datasets (e.g. reference vs candidate table) and diff
  the per-check verdicts.
"""

from __future__ import annotations

import os
from contextlib import ContextDecorator
from typing import Dict, Sequence

__all__ = ["working_directory", "register_accessors", "compare_datasets"]


class working_directory(ContextDecorator):
    """Context manager AND decorator: chdir for the duration (reference
    ``datatest.working_directory``).  Accepts a directory or a file path
    (uses its parent — the upstream `working_directory(__file__)` idiom).
    """

    def __init__(self, path):
        path = os.fspath(path)
        # Only fall back to the parent for an actual FILE (the upstream
        # `working_directory(__file__)` idiom) — a dotted directory name
        # like /data/v1.2 must be used as-is.
        if os.path.isfile(path) or (
            not os.path.exists(path)
            and os.path.splitext(path)[1]
            and os.path.isdir(os.path.dirname(os.path.abspath(path)))
        ):
            path = os.path.dirname(os.path.abspath(path))
        self.path = path
        self._saved: list = []

    def __enter__(self):
        self._saved.append(os.getcwd())
        os.chdir(self.path)
        return self

    def __exit__(self, *exc):
        os.chdir(self._saved.pop())
        return False


def register_accessors() -> None:
    """Patch ``ray.data.Dataset`` with ``.validate`` / ``.valid``
    accessors (reference ``datatest.register_accessors()`` pandas
    integration, re-targeted at Datasets)."""
    import ray.data

    from .pipelines.validate import valid, validate

    def _validate(self, requirement, msg=None, *, columns=None):
        return validate(self, requirement, msg, columns=columns)

    def _valid(self, requirement, *, columns=None):
        return valid(self, requirement, columns=columns)

    ray.data.Dataset.validate = _validate
    ray.data.Dataset.valid = _valid


def compare_datasets(checks: Sequence, ds_a, ds_b, ctx=None) -> Dict[str, dict]:
    """Run the SAME check suite over two Datasets and diff the outcomes
    per check (the reference's RepeatingContainer pattern: one
    expression, N objects).  Returns
    ``{check_id: {'a': n_violations, 'b': n_violations, 'equal': bool}}``.
    """
    from .pipelines.suite import CheckSuite
    from .stages.base import RunContext

    ctx = ctx or RunContext()
    counts_a = CheckSuite(list(checks), ctx).run(ds_a).counts()
    counts_b = CheckSuite(list(checks), ctx).run(ds_b).counts()
    return {
        cid: {
            "a": counts_a.get(cid, 0),
            "b": counts_b.get(cid, 0),
            "equal": counts_a.get(cid, 0) == counts_b.get(cid, 0),
        }
        for cid in {*counts_a, *counts_b}
    }
