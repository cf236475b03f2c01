"""Declarative suite specs: build a CheckSuite from a plain dict/JSON
document and serialize one back — the "expectation suite as config"
surface (reference users keep requirements in code; production
validation pipelines keep them in reviewable config files).

Spec shape::

    {
      "row_ref_col": "event_id",          # optional RunContext fields
      "partition_col": null,
      "checks": [
        {"type": "interval", "column": "value", "min": 0, "max": 95},
        {"type": "regex", "column": "event_type", "pattern": "^a|b$"},
        {"type": "domain", "column": "flag", "allowed": ["A", "N"]},
        {"type": "unique", "column": ["user_id", "event_type"]},
        {"type": "group_size", "column": "user_id", "min_rows": 2},
        {"type": "monotonic", "by": "user_id", "order_col": "ts",
         "value_col": "value", "id_col": "event_id"},
        {"type": "freshness", "column": "ts", "group_col": "user_id",
         "max_lag_s": 86400},
        {"type": "seq_contiguous", "group_col": "l_orderkey",
         "seq_col": "l_linenumber"},
        {"type": "completeness", "columns": ["a", "b"],
         "max_null_share": 0.1},
        {"type": "schema", "columns": {"a": "int", "b": "str"}}
      ]
    }

Every builder is a plain kwargs mapping, so new check types register
with one line.  ``suite_to_spec`` round-trips what it knows and raises
on checks it cannot serialize (never silently drops one).
"""

from __future__ import annotations

import json
from typing import Any, Dict

from ..stages.base import RunContext
from .suite import CheckSuite

__all__ = ["suite_from_spec", "suite_to_spec", "load_suite", "dump_suite"]

_PY_TYPES = {"int": int, "float": float, "str": str, "bool": bool}
_PY_NAMES = {v: k for k, v in _PY_TYPES.items()}


def _build_interval(s):
    from ..stages.row_checks import IntervalCheck

    return IntervalCheck(s["column"], min=s.get("min"), max=s.get("max"))


def _build_regex(s):
    from ..stages.row_checks import RegexCheck

    return RegexCheck(s["column"], s["pattern"])


def _build_domain(s):
    from ..stages.row_checks import DomainCheck

    return DomainCheck(s["column"], set(s["allowed"]))


def _build_schema(s):
    from ..stages.row_checks import SchemaCheck

    return SchemaCheck({c: _PY_TYPES[t] for c, t in s["columns"].items()})


def _build_unique(s):
    from ..stages.global_checks import UniqueCheck

    return UniqueCheck(s["column"], emit=s.get("emit", "per_value"))


def _build_group_size(s):
    from ..stages.global_checks import GroupSizeCheck

    return GroupSizeCheck(s["column"], min_rows=s.get("min_rows", 1),
                          max_rows=s.get("max_rows"))


def _build_completeness(s):
    from ..stages.global_checks import CompletenessCheck

    return CompletenessCheck(s["columns"],
                             max_null_share=s.get("max_null_share", 0.0))


def _build_monotonic(s):
    from ..stages.temporal import MonotonicCheck

    return MonotonicCheck(s["by"], s["order_col"], s["value_col"],
                          s["id_col"],
                          direction=s.get("direction", "non_decreasing"))


def _build_freshness(s):
    from ..stages.temporal import FreshnessCheck

    return FreshnessCheck(s["group_col"], s["column"], s["max_lag_s"])


def _build_seq_contiguous(s):
    from ..stages.temporal import SequenceContiguityCheck

    return SequenceContiguityCheck(s["group_col"], s["seq_col"])


def _build_group_agg(s):
    from ..stages.mapping import GroupAggCheck

    return GroupAggCheck(s["column"], s["by"], agg=s.get("agg", "mean"),
                         min=s.get("min"), max=s.get("max"))


_BUILDERS = {
    "interval": _build_interval,
    "regex": _build_regex,
    "domain": _build_domain,
    "schema": _build_schema,
    "unique": _build_unique,
    "group_size": _build_group_size,
    "completeness": _build_completeness,
    "monotonic": _build_monotonic,
    "freshness": _build_freshness,
    "seq_contiguous": _build_seq_contiguous,
    "group_agg": _build_group_agg,
}


def suite_from_spec(spec: Dict[str, Any]) -> CheckSuite:
    checks = []
    for s in spec.get("checks", []):
        t = s.get("type")
        if t not in _BUILDERS:
            raise ValueError(
                f"unknown check type {t!r}; known: {sorted(_BUILDERS)}")
        checks.append(_BUILDERS[t](s))
    ctx = RunContext(
        partition_col=spec.get("partition_col"),
        row_ref_col=spec.get("row_ref_col"),
    )
    return CheckSuite(checks, ctx)


def _dump_check(c) -> Dict[str, Any]:
    from ..stages.global_checks import (CompletenessCheck, GroupSizeCheck,
                                        UniqueCheck)
    from ..stages.row_checks import (DomainCheck, IntervalCheck,
                                     RegexCheck, SchemaCheck)
    from ..stages.temporal import (FreshnessCheck, MonotonicCheck,
                                   SequenceContiguityCheck)

    if isinstance(c, IntervalCheck):
        return {"type": "interval", "column": c.column,
                "min": c.lo, "max": c.hi}
    if isinstance(c, RegexCheck):
        return {"type": "regex", "column": c.column,
                "pattern": c.spec.pattern}
    if isinstance(c, DomainCheck):
        return {"type": "domain", "column": c.column,
                "allowed": sorted(c.pred.spec)}
    if isinstance(c, SchemaCheck):
        return {"type": "schema", "columns": {
            k: _PY_NAMES[v] for k, v in c.expected.items()}}
    if isinstance(c, UniqueCheck):
        col = c.column if c.column is not None else c.columns
        return {"type": "unique", "column": col, "emit": c.emit}
    if isinstance(c, GroupSizeCheck):
        col = c.group_col if c.group_col is not None else c.columns
        return {"type": "group_size", "column": col,
                "min_rows": c.min_rows, "max_rows": c.max_rows}
    if isinstance(c, CompletenessCheck):
        return {"type": "completeness", "columns": list(c.columns),
                "max_null_share": c.max_null_share}
    if isinstance(c, MonotonicCheck):
        return {"type": "monotonic", "by": c.by, "order_col": c.order_col,
                "value_col": c.value_col, "id_col": c.id_col,
                "direction": c.direction}
    if isinstance(c, FreshnessCheck):
        return {"type": "freshness", "group_col": c.group_col,
                "column": c.ts_col, "max_lag_s": c.max_lag_s}
    if isinstance(c, SequenceContiguityCheck):
        return {"type": "seq_contiguous", "group_col": c.group_col,
                "seq_col": c.seq_col}
    from ..stages.mapping import GroupAggCheck

    if isinstance(c, GroupAggCheck):
        return {"type": "group_agg", "column": c.column, "by": c.by,
                "agg": c.agg, "min": c.min, "max": c.max}
    raise ValueError(f"cannot serialize check {type(c).__name__}")


def suite_to_spec(suite: CheckSuite) -> Dict[str, Any]:
    return {
        "partition_col": suite.ctx.partition_col,
        "row_ref_col": suite.ctx.row_ref_col,
        "checks": [_dump_check(c) for c in suite.checks],
    }


def load_suite(path: str) -> CheckSuite:
    with open(path) as f:
        return suite_from_spec(json.load(f))


def dump_suite(suite: CheckSuite, path: str) -> None:
    with open(path, "w") as f:
        json.dump(suite_to_spec(suite), f, indent=2, sort_keys=True)
