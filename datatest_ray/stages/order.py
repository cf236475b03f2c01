"""Order-sensitive sequence check (reference ``validate.order`` /
``datatest/requirements.py :: RequiredOrder`` — SURVEY.md §2.B10).

Global order is the one reference semantic that fights Ray Data's
unordered blocks, so this check is explicitly BOUNDED: it sorts the
dataset by an explicit position column (attached at ingest) and aligns
the collected column against the required sequence with difflib opcodes
— identical alignment semantics to the reference.  Use only on
small/bounded data (reference parity), never on the 10^12-row table;
the suite-level uniqueness/set checks are the scalable relatives.
"""

from __future__ import annotations

import difflib
from typing import Sequence

import pyarrow as pa

from ..differences import empty_violations, violations_table
from .base import Check, RunContext

__all__ = ["OrderCheck", "check_order_sequence"]


def check_order_sequence(values: Sequence, required: Sequence):
    """difflib-opcode alignment (reference ``RequiredOrder``): returns
    [('extra'|'missing', (index, value)), ...]."""
    matcher = difflib.SequenceMatcher(a=list(values), b=list(required))
    out = []
    for tag, i1, i2, j1, j2 in matcher.get_opcodes():
        if tag in ("delete", "replace"):
            for i in range(i1, i2):
                out.append(("extra", (i, values[i])))
        if tag in ("insert", "replace"):
            for off, j in enumerate(range(j1, j2)):
                out.append(("missing", (i1 + off, required[j])))
    return out


class OrderCheck(Check):
    """``column`` (ordered by ``pos_col``) must equal ``required`` as a
    sequence.  Emits 'extra'/'missing' violation rows whose value is the
    misplaced element and value_num the position index."""

    def __init__(self, column: str, required: Sequence, pos_col: str):
        self.column = column
        self.required = list(required)
        self.pos_col = pos_col
        self.check_id = f"order({column} by {pos_col})"
        self.columns = [column, pos_col]

    def violations(self, ds, ctx: RunContext):
        import ray.data as rd

        ordered = ds.select_columns([self.pos_col, self.column]).sort(self.pos_col)
        values = [
            v
            for batch in ordered.iter_batches(batch_format="pyarrow")
            for v in batch.column(self.column).to_pylist()
        ]
        diffs = check_order_sequence(values, self.required)
        if not diffs:
            return rd.from_arrow(empty_violations())
        kinds, vals, nums = [], [], []
        for kind, (idx, v) in diffs:
            kinds.append(kind)
            vals.append(str(v))
            nums.append(float(idx))
        t = pa.concat_tables(
            violations_table(
                1,
                check_id=self.check_id,
                kind=k,
                partition_id=ctx.default_partition,
                value=pa.array([v]),
                value_num=pa.array([n]),
            )
            for k, v, n in zip(kinds, vals, nums)
        )
        return rd.from_arrow(t)
