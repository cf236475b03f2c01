"""Per-partition distribution-drift check (SURVEY.md §2.I).

Two-sample KS statistic per partition on numeric columns (w / h /
byte-size for the flagship table) against the pooled rest-of-dataset
distribution.  No scipy in the sandbox — the KS machinery is
hand-rolled in functions/aggregates.py.

Plan (one streaming pass + one SMALL shuffle):

1. ``map_batches``: per batch, per column, histogram counts keyed by
   (column, partition_id, bucket) — fixed bin spec, so partials are
   bounded at |cols| x |partitions-touched| x (bins+2) rows per batch;
2. ``groupby(col, partition_id, bucket).sum`` over partials — the
   shuffle moves histogram rows, never data rows;
3. the merged histogram is tiny (P x C x B); collect driver-side,
   compute per-partition KS vs (global - partition), emit one
   group-level Deviation row per (column, partition) exceeding the
   threshold.

``byte-size`` is expressed as a derived column via
``pc.binary_length`` so the wide payload itself never leaves the read
stage.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..differences import empty_violations, violations_table
from ..functions.aggregates import ks_statistic_from_histograms, ks_threshold
from .base import Check, RunContext

__all__ = ["DriftCheck", "BinSpec"]


@dataclass(frozen=True)
class BinSpec:
    """Fixed-range binning for one column.  ``source='binary_length'``
    derives the value as the byte length of a binary column."""

    column: str
    lo: float
    hi: float
    bins: int = 64
    source: Optional[str] = None  # None | 'binary_length'

    @property
    def label(self) -> str:
        if self.source == "binary_length":
            return f"len({self.column})"
        return self.column


class DriftCheck(Check):
    def __init__(
        self,
        specs: Sequence[BinSpec],
        alpha: float = 0.01,
        min_stat: float = 0.2,  # noise floor: small-sample KS fluctuates ~0.1-0.15
        check_id: Optional[str] = None,
    ):
        self.specs = list(specs)
        self.alpha = alpha
        self.min_stat = min_stat
        self.check_id = check_id or f"drift({','.join(s.label for s in self.specs)})"

    def violations(self, ds, ctx: RunContext):
        import ray.data as rd
        from ray.data.aggregate import Sum

        specs = self.specs
        part_col = ctx.partition_col

        def partial(batch: pa.Table) -> pa.Table:
            parts = (
                np.asarray(batch.column(part_col).to_pylist(), dtype=object)
                if part_col and part_col in batch.column_names
                else np.asarray([""] * batch.num_rows, dtype=object)
            )
            out_col, out_part, out_bucket, out_n = [], [], [], []
            uniq_parts, inv = np.unique(parts, return_inverse=True)
            for s in specs:
                col = batch.column(s.column)
                if s.source == "binary_length":
                    col = pc.binary_length(col)
                v = np.asarray(
                    col.combine_chunks().cast(pa.float64(), safe=False)
                    .to_numpy(zero_copy_only=False)
                )
                ok = ~np.isnan(v)
                idx = np.floor(
                    (np.where(ok, v, s.lo) - s.lo) / (s.hi - s.lo) * s.bins
                ).astype(np.int64)
                idx = np.clip(idx + 1, 0, s.bins + 1)
                for pi, pname in enumerate(uniq_parts):
                    m = ok & (inv == pi)
                    if not m.any():
                        continue
                    counts = np.bincount(idx[m], minlength=s.bins + 2)
                    nz = np.flatnonzero(counts)
                    out_col.extend([s.label] * len(nz))
                    out_part.extend([pname] * len(nz))
                    out_bucket.extend(nz.tolist())
                    out_n.extend(counts[nz].tolist())
            return pa.table({
                "col": pa.array(out_col, pa.string()),
                "part": pa.array(out_part, pa.string()),
                "bucket": pa.array(out_bucket, pa.int64()),
                "n": pa.array(out_n, pa.int64()),
            })

        from .base import coalesced

        cols_needed = sorted({s.column for s in specs} | ({part_col} if part_col else set()))
        partials = coalesced(
            ds.select_columns(cols_needed).map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            ctx,
        )
        merged = partials.groupby(["col", "part", "bucket"]).aggregate(
            Sum("n", alias_name="n")
        )
        # merged is tiny (P x C x B rows): finish driver-side
        t = merged.to_pandas()
        rows = {k: [] for k in ("part", "key", "value_num", "expected_num", "deviation")}
        for s in specs:
            sub = t[t["col"] == s.label]
            if sub.empty:
                continue
            nbins = s.bins + 2
            parts = sorted(sub["part"].unique())
            hists = {}
            for p in parts:
                h = np.zeros(nbins, dtype=np.int64)
                pp = sub[sub["part"] == p]
                h[pp["bucket"].to_numpy()] = pp["n"].to_numpy()
                hists[p] = h
            total = np.sum(list(hists.values()), axis=0)
            for p in parts:
                rest = total - hists[p]
                stat = ks_statistic_from_histograms(hists[p], rest)
                thresh = max(
                    ks_threshold(hists[p].sum(), rest.sum(), self.alpha),
                    self.min_stat,
                )
                if stat > thresh:
                    rows["part"].append(p)
                    rows["key"].append(s.label)
                    rows["value_num"].append(stat)
                    rows["expected_num"].append(thresh)
                    rows["deviation"].append(stat - thresh)
        if not rows["part"]:
            return rd.from_arrow(empty_violations())
        n = len(rows["part"])
        return rd.from_arrow(violations_table(
            n, check_id=self.check_id, kind="deviation",
            partition_id=rows["part"], key=rows["key"],
            value=[f"ks={v:.4f}" for v in rows["value_num"]],
            value_num=rows["value_num"], expected_num=rows["expected_num"],
            deviation=rows["deviation"],
        ))
