"""Column profiling: per-column summary statistics in ONE pass.

Engine extension (upstream datatest users profile columns before
writing requirements; the library itself has no profiler).  Each batch
reduces every profiled column to one partial row
(n, n_null, sum, min, max) — vectorized Arrow kernels, no per-row
Python — so the ONE ``groupby(col)`` exchange moves a handful of
numbers per column per block regardless of input size; a closed-form
finalize emits the merged profile.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["profile_columns"]


def profile_columns(ds, cols: Sequence[str], *, decimals: int = None):
    """(col, n, n_null, min, max, mean) per profiled NUMERIC column;
    min/max/mean are null for all-null columns.

    ``decimals``: when the columns are fixed-point (prices, rates),
    pass their decimal count to accumulate sums as EXACT int64 of
    scaled units — float summation order otherwise makes the mean
    differ across engines in the last ulps, which matters when the
    result sits on a rounding boundary."""
    from ray.data.aggregate import Max, Min, Sum

    cols = list(cols)
    scale = None if decimals is None else float(10 ** decimals)

    def partial(batch: pa.Table) -> pa.Table:
        rows = {"col": [], "n": [], "n_null": [], "s": [],
                "mn": [], "mx": []}
        for c in cols:
            arr = batch.column(c)
            n = len(arr)
            n_null = arr.null_count
            valid = arr.drop_null()
            rows["col"].append(c)
            rows["n"].append(n)
            rows["n_null"].append(n_null)
            if len(valid):
                if scale is None:
                    rows["s"].append(pc.sum(valid).as_py())
                else:
                    ints = pc.cast(
                        pc.round(pc.multiply(
                            pc.cast(valid, pa.float64()), scale)),
                        pa.int64(),
                    )
                    rows["s"].append(float(pc.sum(ints).as_py()))
                rows["mn"].append(pc.min(valid).as_py())
                rows["mx"].append(pc.max(valid).as_py())
            else:
                rows["s"].append(None)
                rows["mn"].append(None)
                rows["mx"].append(None)
        return pa.table({
            "col": pa.array(rows["col"]),
            "n": pa.array(rows["n"], pa.int64()),
            "n_null": pa.array(rows["n_null"], pa.int64()),
            "s": pa.array(rows["s"], pa.float64()),
            "mn": pa.array(rows["mn"], pa.float64()),
            "mx": pa.array(rows["mx"], pa.float64()),
        })

    merged = (
        ds.select_columns(cols)
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("col")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("n_null", alias_name="n_null"),
            Sum("s", alias_name="s"),
            Min("mn", alias_name="min"),
            Max("mx", alias_name="max"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        n_null = t.column("n_null").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        s = t.column("s").to_numpy(zero_copy_only=False)
        valid = n - n_null
        with np.errstate(invalid="ignore", divide="ignore"):
            if scale is None:
                mean = s / valid
            else:
                mean = s / scale / valid
        return pa.table({
            "col": t.column("col"),
            "n": t.column("n"),
            "n_null": t.column("n_null"),
            "min": t.column("min"),
            "max": t.column("max"),
            "mean": pa.array(mean, pa.float64(), mask=valid == 0),
        })

    return merged.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True)
