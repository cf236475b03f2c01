"""Per-key (mapping) requirements — reference: datatest's dict
requirement applied per key (``datatest/requirements.py ::
RequiredMapping``, SURVEY.md §2.A10).

The decomposable fast-path: when the per-key requirement is an
aggregate-bound check (mean/sum/count/min/max within an interval), it
lowers to per-batch partials + ONE ``groupby(key).aggregate`` shuffle —
never ``map_groups`` over raw rows.  Violations carry the group key in
the ``key`` column of the violation IR, mirroring the reference's
``{key: [diffs]}`` ValidationError shape.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from ..differences import empty_violations, violations_table
from .base import Check, RunContext

__all__ = ["GroupAggCheck"]

_AGGS = {"mean", "sum", "count", "min", "max"}
_QUANTILE_RE = r"^p(\d{1,2})$"


class GroupAggCheck(Check):
    """Per-key aggregate bound: ``agg(column) within [min, max]`` for
    every distinct value of ``by``.  Emits one 'deviation' violation row
    per out-of-range key (key=group value, value_num=aggregate,
    expected_num=violated bound, deviation=value-bound).

    ``agg`` also accepts a percentile name (``"p50"``, ``"p95"``, ...):
    the SLA form "p95(latency) per service <= bound", computed with the
    exact grouped quantile (= SQL ``quantile_cont``); the scale path
    for huge groups is the t-digest sketch."""

    def __init__(self, column: str, by: str, agg: str = "mean",
                 min: Optional[float] = None, max: Optional[float] = None):
        import re

        self._q = None
        m = re.match(_QUANTILE_RE, agg)
        if m:
            self._q = int(m.group(1)) / 100.0
        elif agg not in _AGGS:
            raise ValueError(
                f"agg must be one of {sorted(_AGGS)} or 'pNN'")
        if min is None and max is None:
            raise ValueError("GroupAggCheck needs min and/or max")
        self.column, self.by, self.agg = column, by, agg
        self.min, self.max = min, max
        self.check_id = f"group_{agg}({column} by {by}, {min}, {max})"
        self.columns = [column, by]

    def violations(self, ds, ctx: RunContext):
        from ray.data.aggregate import Count, Max, Mean, Min, Sum

        if self._q is not None:
            from .window import grouped_quantile

            grouped = grouped_quantile(
                ds, by=self.by, col=self.column, q=self._q,
                alias="agg_value")
        else:
            agg_cls = {"mean": Mean, "sum": Sum, "min": Min,
                       "max": Max}.get(self.agg)
            if self.agg == "count":
                agg_obj = Count(alias_name="agg_value")
            else:
                agg_obj = agg_cls(self.column, alias_name="agg_value")
            grouped = (
                ds.select_columns([self.by, self.column])
                .groupby(self.by)
                .aggregate(agg_obj)
            )
        check = self

        def to_violations(t: pa.Table) -> pa.Table:
            vals = t.column("agg_value").to_numpy(zero_copy_only=False).astype(np.float64)
            keys = t.column(check.by)
            lo = -np.inf if check.min is None else float(check.min)
            hi = np.inf if check.max is None else float(check.max)
            below, above = vals < lo, vals > hi
            bad = below | above
            if not bad.any():
                return empty_violations()
            bound = np.where(below, lo, hi)[bad]
            vb = vals[bad]
            import pyarrow.compute as pc

            key_str = pc.cast(keys.filter(pa.array(bad)), pa.string())
            return violations_table(
                int(bad.sum()),
                check_id=check.check_id,
                kind="deviation",
                partition_id=ctx.default_partition,
                key=key_str,
                value_num=pa.array(vb),
                expected_num=pa.array(bound),
                deviation=pa.array(vb - bound),
            )

        return grouped.map_batches(
            to_violations, batch_format="pyarrow", zero_copy_batch=True
        )
