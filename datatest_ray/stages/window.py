"""Windowed aggregates over event streams.

Not in the datatest reference (it is single-pass batch, no streaming
operators — SURVEY.md §2.H); engine extension for event tables.  A
tumbling window is a pure per-batch ``floor_temporal`` projection
followed by ONE ``groupby(window, keys)`` shuffle — the window column is
just another group key, so the plan is identical to any grouped
aggregate and streams with backpressure.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["tumbling_window", "hopping_window", "grouped_quantile",
           "grouped_topk", "grouped_corr", "grouped_concat",
           "grouped_moments", "grouped_entropy", "grouped_mode",
           "grouped_regression", "regression_two_predictors"]

_UNITS = {"minute", "hour", "day", "week", "month"}


def tumbling_window(ds, ts_col: str, *, unit: str = "hour",
                    by: Optional[Sequence[str]] = None,
                    sum_col: Optional[str] = None):
    """Tumbling-window aggregate: (window, *by, n[, total]).

    ``window`` is the window start formatted '%Y-%m-%d %H:%M:%S' (string
    so results compare stably across engines).
    """
    if unit not in _UNITS:
        raise ValueError(f"unit must be one of {sorted(_UNITS)}")
    from ray.data.aggregate import Count, Sum

    by_cols: List[str] = list(by or [])
    need = [ts_col] + by_cols + ([sum_col] if sum_col else [])

    def project(batch: pa.Table) -> pa.Table:
        win = pc.floor_temporal(batch.column(ts_col), unit=unit)
        # cast to second resolution: Arrow's %S renders fractional digits
        # for timestamp[us], which would break string-level parity
        win = pc.cast(win, pa.timestamp("s"))
        cols = {"window": pc.strftime(win, format="%Y-%m-%d %H:%M:%S")}
        for c in by_cols:
            cols[c] = batch.column(c)
        if sum_col:
            cols[sum_col] = batch.column(sum_col)
        return pa.table(cols)

    projected = ds.select_columns(need).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )
    aggs = [Count(alias_name="n")]
    if sum_col:
        aggs.append(Sum(sum_col, alias_name="total"))
    return projected.groupby(["window"] + by_cols).aggregate(*aggs)


def hopping_window(ds, ts_col: str, *, size_s: int, hop_s: int,
                   by: Optional[Sequence[str]] = None,
                   sum_col: Optional[str] = None):
    """Hopping (sliding) window aggregate: windows of ``size_s`` seconds
    starting every ``hop_s`` seconds (``size_s`` must be a multiple of
    ``hop_s``); each event lands in size/hop windows.  Output
    (window, *by, n[, total]) with ``window`` the window-start string.

    Plan: per batch, vectorized row replication (``take`` with repeated
    indices + shifted window starts) — the overlap factor is the ONLY
    data amplification — then the same single groupby as the tumbling
    window.  No per-row Python, no state; late data is just another row
    in its windows (the groupby is order-free)."""
    if size_s % hop_s != 0:
        raise ValueError("size_s must be a multiple of hop_s")
    k = size_s // hop_s
    from ray.data.aggregate import Count, Sum

    import numpy as np

    by_cols: List[str] = list(by or [])
    need = [ts_col] + by_cols + ([sum_col] if sum_col else [])

    def project(batch: pa.Table) -> pa.Table:
        t = pc.cast(
            pc.cast(batch.column(ts_col), pa.timestamp("s"), safe=False),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        n = len(t)
        base = (t // hop_s) * hop_s
        take = np.repeat(np.arange(n, dtype=np.int64), k)
        shift = np.tile(np.arange(k, dtype=np.int64) * hop_s, n)
        ws = base[take] - shift
        win = pc.strftime(pa.array(ws).cast(pa.timestamp("s")),
                          format="%Y-%m-%d %H:%M:%S")
        sub = batch.select([c for c in need if c != ts_col]).take(pa.array(take))
        cols = {"window": win}
        for c in by_cols:
            cols[c] = sub.column(c)
        if sum_col:
            cols[sum_col] = sub.column(sum_col)
        return pa.table(cols)

    projected = ds.select_columns(need).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )
    aggs = [Count(alias_name="n")]
    if sum_col:
        aggs.append(Sum(sum_col, alias_name="total"))
    return projected.groupby(["window"] + by_cols).aggregate(*aggs)


def grouped_quantile(ds, *, by: str, col: str, q: float = 0.5,
                     alias: str = "quantile", method: str = "cont"):
    """Exact per-group quantile: (by, alias).  ``method='cont'`` is
    linear interpolation (= SQL ``quantile_cont``); ``method='disc'``
    picks the smallest data value whose cumulative rank reaches q
    (= SQL ``quantile_disc``: element ``ceil(q·n)−1`` of the sorted
    group).  Sorts each group's values in one numpy pass — the EXACT
    small/verify path; the scale path for huge groups is the mergeable
    t-digest sketch (functions/aggregates.py :: TDigestQuantile)."""
    import numpy as np

    def kernel(group: pa.Table) -> pa.Table:
        v = group.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            val = float("nan")
        elif method == "disc":
            v = np.sort(v)
            val = float(v[min(int(np.ceil(q * len(v))) - 1, len(v) - 1)]) \
                if q > 0 else float(v[0])
        else:
            val = float(np.quantile(v, q))
        return pa.table({by: group.column(by)[:1],
                         alias: pa.array([val], pa.float64())})

    return ds.select_columns([by, col]).groupby(by).map_groups(
        kernel, batch_format="pyarrow"
    )


def grouped_corr(ds, *, by: str, x: str, y: str, alias: str = "corr"):
    """Per-group sample Pearson correlation (SQL ``corr(x, y)``) via
    SUFFICIENT-STATISTICS combiners: each batch reduces to
    (n, sx, sy, sxx, syy, sxy) per key — vectorized bincount sums, one
    row per (key, block) — so the ONE ``groupby(by).sum`` shuffle moves
    six numbers per key per block, never the data.  The finalize kernel
    is the closed-form corr on the merged moments.  NULL (None) when a
    group has <2 rows or zero variance, matching SQL."""
    import numpy as np
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(by)
        keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
        enc = pc.dictionary_encode(keys)
        code = np.asarray(enc.indices, dtype=np.int64)
        xv = batch.column(x).to_numpy(zero_copy_only=False).astype(np.float64)
        yv = batch.column(y).to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~(np.isnan(xv) | np.isnan(yv))
        code, xv, yv = code[ok], xv[ok], yv[ok]
        m = len(enc.dictionary)
        return pa.table({
            by: enc.dictionary,
            "n": pa.array(np.bincount(code, minlength=m).astype(np.float64)),
            "sx": pa.array(np.bincount(code, weights=xv, minlength=m)),
            "sy": pa.array(np.bincount(code, weights=yv, minlength=m)),
            "sxx": pa.array(np.bincount(code, weights=xv * xv, minlength=m)),
            "syy": pa.array(np.bincount(code, weights=yv * yv, minlength=m)),
            "sxy": pa.array(np.bincount(code, weights=xv * yv, minlength=m)),
        })

    merged = (
        ds.select_columns([by, x, y])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(by)
        .aggregate(*[Sum(c, alias_name=c)
                     for c in ("n", "sx", "sy", "sxx", "syy", "sxy")])
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        sx = t.column("sx").to_numpy(zero_copy_only=False)
        sy = t.column("sy").to_numpy(zero_copy_only=False)
        sxx = t.column("sxx").to_numpy(zero_copy_only=False)
        syy = t.column("syy").to_numpy(zero_copy_only=False)
        sxy = t.column("sxy").to_numpy(zero_copy_only=False)
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        ok = (n > 1) & (vx > 0) & (vy > 0)
        with np.errstate(invalid="ignore", divide="ignore"):
            r = (n * sxy - sx * sy) / np.sqrt(vx * vy)
        return pa.table({
            by: t.column(by),
            alias: pa.array(np.where(ok, r, np.nan), pa.float64(),
                            mask=~ok),
        })

    return merged.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True)


def grouped_regression(ds, *, by: str, x: str, y: str):
    """Per-group simple OLS (SQL ``regr_slope/regr_intercept/regr_r2``,
    DuckDB parity validated numerically): trend-per-slice for drift
    monitoring.  Same sufficient-statistics plan as ``grouped_corr`` —
    the ONE shuffle moves six numbers per key per block.  NULLs when
    the group has <2 rows or zero x-variance (r2 additionally NULL on
    zero y-variance)."""
    import numpy as np
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(by)
        keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
        enc = pc.dictionary_encode(keys)
        code = np.asarray(enc.indices, dtype=np.int64)
        xv = batch.column(x).to_numpy(zero_copy_only=False).astype(np.float64)
        yv = batch.column(y).to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~(np.isnan(xv) | np.isnan(yv))
        code, xv, yv = code[ok], xv[ok], yv[ok]
        m = len(enc.dictionary)
        return pa.table({
            by: enc.dictionary,
            "n": pa.array(np.bincount(code, minlength=m).astype(np.float64)),
            "sx": pa.array(np.bincount(code, weights=xv, minlength=m)),
            "sy": pa.array(np.bincount(code, weights=yv, minlength=m)),
            "sxx": pa.array(np.bincount(code, weights=xv * xv, minlength=m)),
            "syy": pa.array(np.bincount(code, weights=yv * yv, minlength=m)),
            "sxy": pa.array(np.bincount(code, weights=xv * yv, minlength=m)),
        })

    merged = (
        ds.select_columns([by, x, y])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(by)
        .aggregate(*[Sum(c, alias_name=c)
                     for c in ("n", "sx", "sy", "sxx", "syy", "sxy")])
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        sx = t.column("sx").to_numpy(zero_copy_only=False)
        sy = t.column("sy").to_numpy(zero_copy_only=False)
        sxx = t.column("sxx").to_numpy(zero_copy_only=False)
        syy = t.column("syy").to_numpy(zero_copy_only=False)
        sxy = t.column("sxy").to_numpy(zero_copy_only=False)
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        ok = (n > 1) & (vx > 0)
        ok2 = ok & (vy > 0)
        with np.errstate(invalid="ignore", divide="ignore"):
            slope = (n * sxy - sx * sy) / vx
            inter = sy / n - slope * sx / n
            r2 = (n * sxy - sx * sy) ** 2 / (vx * vy)
        return pa.table({
            by: t.column(by),
            "slope": pa.array(np.where(ok, slope, 0), pa.float64(), mask=~ok),
            "icept": pa.array(np.where(ok, inter, 0), pa.float64(), mask=~ok),
            "r2": pa.array(np.where(ok2, r2, 0), pa.float64(), mask=~ok2),
        })

    return merged.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True)


def grouped_moments(ds, *, by: str, col: str):
    """Per-group mean / sample stddev / sample skewness / sample excess
    kurtosis with SQL's bias corrections (DuckDB ``skewness``/
    ``kurtosis`` parity, validated numerically) — the distribution-
    shape profile a drift monitor keeps per slice.

    Same plan as ``grouped_corr``: per-batch power sums (n, s1..s4) per
    key via bincount, ONE ``groupby(by).sum`` over five numbers per key
    per block, closed-form finalize.  skew NULL when n<3 or zero
    variance; kurt NULL when n<4."""
    import numpy as np
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(by)
        keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
        enc = pc.dictionary_encode(keys)
        code = np.asarray(enc.indices, dtype=np.int64)
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(v)
        code, v = code[ok], v[ok]
        m = len(enc.dictionary)
        v2 = v * v
        return pa.table({
            by: enc.dictionary,
            "n": pa.array(np.bincount(code, minlength=m).astype(np.float64)),
            "s1": pa.array(np.bincount(code, weights=v, minlength=m)),
            "s2": pa.array(np.bincount(code, weights=v2, minlength=m)),
            "s3": pa.array(np.bincount(code, weights=v2 * v, minlength=m)),
            "s4": pa.array(np.bincount(code, weights=v2 * v2, minlength=m)),
        })

    merged = (
        ds.select_columns([by, col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(by)
        .aggregate(*[Sum(c, alias_name=c)
                     for c in ("n", "s1", "s2", "s3", "s4")])
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        s1 = t.column("s1").to_numpy(zero_copy_only=False)
        s2 = t.column("s2").to_numpy(zero_copy_only=False)
        s3 = t.column("s3").to_numpy(zero_copy_only=False)
        s4 = t.column("s4").to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = s1 / n
            m2 = s2 / n - mean ** 2
            m3 = s3 / n - 3 * mean * s2 / n + 2 * mean ** 3
            m4 = (s4 / n - 4 * mean * s3 / n
                  + 6 * mean ** 2 * s2 / n - 3 * mean ** 4)
            std = np.sqrt(n * m2 / np.maximum(n - 1, 1))
            g1 = m3 / m2 ** 1.5
            g2 = m4 / m2 ** 2 - 3
            skew = np.sqrt(n * (n - 1)) / (n - 2) * g1
            kurt = (n - 1) / ((n - 2) * (n - 3)) * ((n + 1) * g2 + 6)
        ok_sd = n > 1
        ok_sk = (n > 2) & (m2 > 0)
        ok_ku = (n > 3) & (m2 > 0)
        return pa.table({
            by: t.column(by),
            "mean": pa.array(mean, pa.float64()),
            "sd": pa.array(np.where(ok_sd, std, 0), pa.float64(), mask=~ok_sd),
            "skew": pa.array(np.where(ok_sk, skew, 0), pa.float64(), mask=~ok_sk),
            "kurt": pa.array(np.where(ok_ku, kurt, 0), pa.float64(), mask=~ok_ku),
        })

    return merged.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True)


def grouped_entropy(ds, *, by: str, col: str, alias: str = "entropy"):
    """Per-group Shannon entropy (nats) of ``col``'s value distribution
    — the label/slice-diversity audit of a training-data pipeline.

    Plan: per-batch (by, col) pair counts → ONE ``groupby(by, col).sum``
    over counts (never rows) → per-``by`` vectorized
    ``-Σ p ln p`` finalize on the (small) distinct-pair table."""
    import numpy as np
    from ray.data.aggregate import Sum

    def pair_counts(batch: pa.Table) -> pa.Table:
        t = batch.select([by, col]).group_by([by, col]).aggregate(
            [([], "count_all")]
        )
        return t.rename_columns([by, col, "n"])

    counts = (
        ds.select_columns([by, col])
        .map_batches(pair_counts, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby([by, col])
        .aggregate(Sum("n", alias_name="n"))
    )

    def kernel(group: pa.Table) -> pa.Table:
        n = group.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        p = n / n.sum()
        ent = float(-(p * np.log(p)).sum())
        return pa.table({
            by: group.column(by)[:1],
            alias: pa.array([ent], pa.float64()),
        })

    return counts.groupby(by).map_groups(kernel, batch_format="pyarrow")


def grouped_mode(ds, *, by: str, col: str, alias: str = "mode"):
    """Per-group most frequent value of ``col``; ties break on the
    smallest value so the result is deterministic (mirror
    ``ORDER BY cnt DESC, value ASC`` in any oracle).

    Plan: same counted-pairs shuffle as ``grouped_entropy``, then a
    vectorized per-group argmax (sort + first-row-per-segment)."""
    import numpy as np
    from ray.data.aggregate import Sum

    def pair_counts(batch: pa.Table) -> pa.Table:
        t = batch.select([by, col]).group_by([by, col]).aggregate(
            [([], "count_all")]
        )
        return t.rename_columns([by, col, "n"])

    counts = (
        ds.select_columns([by, col])
        .map_batches(pair_counts, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby([by, col])
        .aggregate(Sum("n", alias_name="n"))
    )

    def kernel(group: pa.Table) -> pa.Table:
        t = group.sort_by([("n", "descending"), (col, "ascending")])
        return pa.table({
            by: t.column(by)[:1],
            alias: t.column(col)[:1],
            "n_mode": t.column("n")[:1],
        })

    return counts.groupby(by).map_groups(kernel, batch_format="pyarrow")


def grouped_concat(ds, *, by: str, col: str, order_col: Optional[str] = None,
                   sep: str = ",", alias: str = "agg"):
    """Per-group ordered string aggregation (SQL
    ``string_agg(col, sep ORDER BY order)``).  Intended for BOUNDED
    group contents (labels, names per region) — the output row holds
    the whole group's strings by definition."""

    order = order_col or col

    def kernel(group: pa.Table) -> pa.Table:
        t = group.sort_by([(order, "ascending")])
        vals = [v for v in t.column(col).to_pylist() if v is not None]
        return pa.table({
            by: group.column(by)[:1],
            alias: pa.array([sep.join(vals)]),
        })

    return ds.select_columns(
        list(dict.fromkeys([by, col, order]))
    ).groupby(by).map_groups(kernel, batch_format="pyarrow")


def grouped_topk(ds, *, by: str, order_col: str, k: int = 3,
                 descending: bool = True, tie_col: Optional[str] = None,
                 keep_cols: Optional[Sequence[str]] = None):
    """Top-k rows per group — with a per-batch COMBINER: each batch
    first reduces to its own local top-k per key, so the shuffle moves
    at most k rows per (key, block) instead of every row.  Final
    ``groupby(by)`` re-ranks the partials.  Ties break on ``tie_col``
    ascending (required for deterministic cross-engine results)."""
    keep = list(keep_cols or [])
    tie = tie_col or order_col
    need = list(dict.fromkeys([by, order_col, tie] + keep))
    import numpy as np

    def local_topk(batch: pa.Table) -> pa.Table:
        order = [(by, "ascending"),
                 (order_col, "descending" if descending else "ascending"),
                 (tie, "ascending")]
        t = batch.select(need).sort_by(order)
        keys = t.column(by).to_numpy(zero_copy_only=False)
        new = np.ones(len(keys), dtype=bool)
        if len(keys):
            new[1:] = keys[1:] != keys[:-1]
        seg = np.cumsum(new) - 1
        counts = np.bincount(seg) if len(keys) else np.array([], dtype=np.int64)
        starts = np.zeros(len(counts), dtype=np.int64)
        if len(counts):
            np.cumsum(counts[:-1], out=starts[1:])
        rank = np.arange(len(keys)) - starts[seg] if len(keys) else np.array([])
        return t.filter(pa.array(rank < k))

    partials = ds.map_batches(local_topk, batch_format="pyarrow",
                              zero_copy_batch=True)
    return partials.groupby(by).map_groups(local_topk, batch_format="pyarrow")


def regression_two_predictors(ds, *, y: str, x1: str, x2: str,
                              y_scale: float = 100.0,
                              x1_scale: float = 1.0,
                              x2_scale: float = 100.0):
    """Global OLS with TWO predictors via exact integer normal
    equations: y ~ b0 + b1·x1 + b2·x2 (the multiple-regression
    extension of ``grouped_regression``; e.g. price ~ quantity +
    discount — does discount still matter once quantity is held
    fixed?).

    Columns are first quantized to integers (``*_scale`` is the
    multiplier, e.g. 100 for 2-dp currency / percentage columns) so
    every sufficient statistic (Σx, Σx², Σxy, …) is an exact int64 per
    batch, accumulated into arbitrary-precision Python ints at the
    finalize — the normal-equation determinant and numerators are
    exact integers converted to double ONCE, making the betas
    summation-order independent and bit-identical to a SQL HUGEINT
    mirror.  Betas are reported in the QUANTIZED units (cents per
    x1-unit, …).  Output one row:
    (n, beta_x1, beta_x2, intercept) — NULLs when the design matrix is
    singular.
    """

    def partial(t: pa.Table) -> pa.Table:
        cols = []
        for c, scale in ((y, y_scale), (x1, x1_scale), (x2, x2_scale)):
            col = t.column(c)
            if scale == 1.0:
                cols.append(pc.cast(pc.round(col), pa.int64()))
            else:
                cols.append(pc.cast(pc.round(pc.multiply(col, scale)),
                                    pa.int64()))
        ok = pc.and_(pc.and_(pc.is_valid(cols[0]), pc.is_valid(cols[1])),
                     pc.is_valid(cols[2]))
        tt = pa.table({"y": cols[0], "x1": cols[1],
                       "x2": cols[2]}).filter(ok)
        yv = tt.column("y").to_numpy(zero_copy_only=False)
        a = tt.column("x1").to_numpy(zero_copy_only=False)
        b = tt.column("x2").to_numpy(zero_copy_only=False)
        return pa.table({
            "n": pa.array([len(yv)], pa.int64()),
            "sy": pa.array([int(yv.sum())], pa.int64()),
            "s1": pa.array([int(a.sum())], pa.int64()),
            "s2": pa.array([int(b.sum())], pa.int64()),
            "s11": pa.array([int((a * a).sum())], pa.int64()),
            "s22": pa.array([int((b * b).sum())], pa.int64()),
            "s12": pa.array([int((a * b).sum())], pa.int64()),
            "s1y": pa.array([int((a * yv).sum())], pa.int64()),
            "s2y": pa.array([int((b * yv).sum())], pa.int64()),
        })

    partials = ds.select_columns([y, x1, x2]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("n", pa.int64()), ("beta_x1", pa.float64()),
                            ("beta_x2", pa.float64()),
                            ("intercept", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        tot = {c: sum(int(v) for v in t.column(c).to_pylist())
               for c in ("n", "sy", "s1", "s2", "s11", "s22", "s12",
                         "s1y", "s2y")}
        n = tot["n"]
        if n < 3:
            return pa.table({"n": pa.array([n], pa.int64()),
                             "beta_x1": pa.array([None], pa.float64()),
                             "beta_x2": pa.array([None], pa.float64()),
                             "intercept": pa.array([None], pa.float64())})
        # centered cross-products, exact integers
        sxx1 = n * tot["s11"] - tot["s1"] ** 2
        sxx2 = n * tot["s22"] - tot["s2"] ** 2
        sx12 = n * tot["s12"] - tot["s1"] * tot["s2"]
        sx1y = n * tot["s1y"] - tot["s1"] * tot["sy"]
        sx2y = n * tot["s2y"] - tot["s2"] * tot["sy"]
        det = sxx1 * sxx2 - sx12 * sx12
        if det == 0:
            b1 = b2 = b0 = None
        else:
            b1 = float(sx1y * sxx2 - sx2y * sx12) / float(det)
            b2 = float(sx2y * sxx1 - sx1y * sx12) / float(det)
            b0 = (float(tot["sy"]) - b1 * float(tot["s1"])
                  - b2 * float(tot["s2"])) / n
        return pa.table({
            "n": pa.array([n], pa.int64()),
            "beta_x1": pa.array([b1], pa.float64()),
            "beta_x2": pa.array([b2], pa.float64()),
            "intercept": pa.array([b0], pa.float64()),
        })

    return partials.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)
