"""Robust per-group statistics: IQR outlier fences and MAD.

Engine extensions (SURVEY.md §2.H / §2.I family): the robust
data-quality screens a validation engine runs next to mean/stddev —
Tukey-fence outlier counting (1.5·IQR beyond the quartiles) and the
median absolute deviation.

Plan (both operators): TWO passes, no data shuffle.
Pass 1 computes the per-group order statistics (exact np.quantile ==
SQL ``quantile_cont``, the same kernel `window.grouped_quantile`
proved against DuckDB) via one ``groupby(by)`` over the (small)
projected columns; the resulting per-group table is broadcast back
with ``ray.put``.  Pass 2 is a streaming ``map_batches`` that compares
each row against its group's broadcast statistic — partials reduced by
one tiny ``groupby(by).sum`` (outlier counting) or a second grouped
quantile over the absolute deviations (MAD).

Partitioning assumption: pass 1 materializes one quantile row per
group — #groups must fit on the driver (it is an aggregate result).
For huge row-per-group counts the exact in-group sort is the
small/verify path; the scale path is the mergeable t-digest sketch
(functions/aggregates.py :: TDigestQuantile).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["iqr_outliers", "grouped_mad", "winsorize", "weighted_median",
           "mahalanobis_outliers", "spearman_grouped",
           "kendall_grouped", "mann_whitney", "welch_ttest",
           "expected_shortfall", "mean_excess_slope", "ecod_topk",
           "boxcox_scan", "lorenz_asymmetry", "quantile_diff",
           "interquartile_mean"]


def _group_positions(col, keys):
    """Positions of each row's group key in the broadcast key array +
    validity mask (False = group absent from the broadcast — callers
    whose pass 1 covers every group may ignore it; callers with truly
    missing groups must drop or special-case those rows).  The shared
    scaffold of every broadcast-stats row pass here and in mlprep."""
    idx = pc.index_in(col, value_set=keys)
    posf = idx.to_numpy(zero_copy_only=False).astype(np.float64)
    valid = ~np.isnan(posf)
    return np.where(valid, posf, 0).astype(np.int64), valid


def _grouped_quantiles(ds, by: str, col: str, qs):
    """One groupby pass → pa.Table (by, q_0..q_{len(qs)-1}), exact
    linear-interpolation quantiles per group."""
    def kernel(group: pa.Table) -> pa.Table:
        v = group.column(col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        v = v[~np.isnan(v)]
        cols = {by: group.column(by)[:1]}
        for j, q in enumerate(qs):
            val = float(np.quantile(v, q)) if len(v) else float("nan")
            cols[f"q{j}"] = pa.array([val], pa.float64())
        return pa.table(cols)

    out = ds.select_columns([by, col]).groupby(by).map_groups(
        kernel, batch_format="pyarrow")
    batches = list(out.iter_batches(batch_format="pyarrow"))
    if batches:
        return pa.concat_tables(batches)
    return pa.schema(
        [(by, pa.string())] +
        [(f"q{j}", pa.float64()) for j in range(len(qs))]
    ).empty_table()


def iqr_outliers(ds, *, by: str, col: str, k: float = 1.5):
    """Per-group Tukey-fence outlier count: rows outside
    ``[q1 − k·IQR, q3 + k·IQR]``.

    Output: (by, q1, q3, n_out) — quartiles rounded to 6 dp (both
    engines pin the float repr the same way).
    """
    import ray
    from ray.data.aggregate import Sum

    stats = _grouped_quantiles(ds, by, col, (0.25, 0.75))
    q1 = np.round(stats.column("q0").to_numpy(zero_copy_only=False), 6)
    q3 = np.round(stats.column("q1").to_numpy(zero_copy_only=False), 6)
    keys = stats.column(by)
    keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
    lo = q1 - k * (q3 - q1)
    hi = q3 + k * (q3 - q1)
    handle = ray.put((keys, lo, hi))

    def partial(batch: pa.Table) -> pa.Table:
        kk, lo_, hi_ = ray.get(handle)
        pos, _ = _group_positions(batch.column(by), kk)
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        out = ((v < lo_[pos]) | (v > hi_[pos])).astype(np.int64)
        enc = pc.dictionary_encode(
            batch.column(by).combine_chunks()
            if isinstance(batch.column(by), pa.ChunkedArray)
            else batch.column(by))
        code = np.asarray(enc.indices, dtype=np.int64)
        m = len(enc.dictionary)
        return pa.table({
            by: enc.dictionary,
            "n_out": pa.array(np.bincount(code, weights=out,
                                          minlength=m).astype(np.int64)),
        })

    counts = ds.select_columns([by, col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(by).aggregate(Sum("n_out", alias_name="n_out"))

    qtab = pa.table({by: keys, "q1": pa.array(q1), "q3": pa.array(q3)})

    def attach(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column(by), value_set=qtab.column(by))
        return pa.table({
            by: t.column(by),
            "q1": pc.take(qtab.column("q1"), idx),
            "q3": pc.take(qtab.column("q3"), idx),
            "n_out": t.column("n_out"),
        })

    return counts.map_batches(attach, batch_format="pyarrow")


def grouped_mad(ds, *, by: str, col: str):
    """Per-group median absolute deviation:
    ``median(|x − median_g(x)|)`` (SQL: two ``quantile_cont`` CTEs).

    Output: (by, med, mad) rounded to 6 dp.
    """
    import ray

    stats = _grouped_quantiles(ds, by, col, (0.5,))
    med = np.round(stats.column("q0").to_numpy(zero_copy_only=False), 6)
    keys = stats.column(by)
    keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
    handle = ray.put((keys, med))

    def absdev(batch: pa.Table) -> pa.Table:
        kk, md = ray.get(handle)
        pos, _ = _group_positions(batch.column(by), kk)
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        return pa.table({
            by: batch.column(by),
            "_ad": pa.array(np.abs(v - md[pos])),
        })

    devs = ds.select_columns([by, col]).map_batches(
        absdev, batch_format="pyarrow", zero_copy_batch=True)
    mad_t = _grouped_quantiles(devs, by, "_ad", (0.5,))
    mad = np.round(mad_t.column("q0").to_numpy(zero_copy_only=False), 6)
    mkeys = mad_t.column(by)
    mkeys = mkeys.combine_chunks() if isinstance(mkeys, pa.ChunkedArray) \
        else mkeys
    idx = pc.index_in(mkeys, value_set=keys)
    return pa.table({
        by: mkeys,
        "med": pc.take(pa.array(med), idx),
        "mad": pa.array(mad),
    })


def winsorize(ds, *, by: str, col: str, id_col: str,
              p_lo: float = 0.05, p_hi: float = 0.95):
    """Per-group winsorization: clip ``col`` to the group's
    ``[quantile(p_lo), quantile(p_hi)]`` — the standard outlier-taming
    step before training a regressor on heavy-tailed features.

    Output: (id_col, by, clipped) with ``clipped`` float64.  Same
    two-pass no-data-shuffle plan as the fences above: pass 1 computes
    per-group ``quantile_cont`` bounds (rounded to 6 dp so both engines
    pin the same float repr) and broadcasts them via ``ray.put``;
    pass 2 is a streaming row pass that clips against the broadcast
    bounds — the rows themselves never move.
    """
    import ray

    stats = _grouped_quantiles(ds, by, col, (p_lo, p_hi))
    lo = np.round(stats.column("q0").to_numpy(zero_copy_only=False), 6)
    hi = np.round(stats.column("q1").to_numpy(zero_copy_only=False), 6)
    keys = stats.column(by)
    keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
    handle = ray.put((keys, lo, hi))

    def clip(batch: pa.Table) -> pa.Table:
        kk, lo_, hi_ = ray.get(handle)
        pos, _ = _group_positions(batch.column(by), kk)
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        out = np.minimum(np.maximum(v, lo_[pos]), hi_[pos])
        return pa.table({
            id_col: batch.column(id_col),
            by: batch.column(by),
            "clipped": pa.array(out),
        })

    return ds.select_columns(
        list(dict.fromkeys([id_col, by, col]))
    ).map_batches(clip, batch_format="pyarrow", zero_copy_batch=True)


def weighted_median(ds, *, by: str, col: str, weight_col: str,
                    n_buckets: int = 64, q_num: int = 1, q_den: int = 2,
                    out_col: str = "wmedian"):
    """Per-group LOWER weighted median: the smallest value v such that
    the cumulative weight of rows with value <= v reaches half the
    group's total weight (2·cumw >= totw) — order-statistics with
    per-row multiplicity (e.g. price weighted by quantity).

    ``q_num``/``q_den`` generalize the cutover to any lower weighted
    quantile q = q_num/q_den (the comparison ``q_den·cumw ≥ q_num·totw``
    stays EXACT integer arithmetic); ``out_col`` names the output.

    Output: (by, wmedian float64).  Plan: per-batch combiner collapses
    rows to distinct (by, value) pairs with int64 weight sums
    (dictionary-encode + bincount — weights are cast to integer units
    so the cutover comparison is EXACT, never a float-association
    coin flip), one coarse-bucket shuffle of those small partials, and
    a vectorized per-bucket kernel: sort by (key, value), per-run
    weight sums via ``np.add.reduceat``, integer cumsum, first index
    with ``2·cumw >= totw``.  Shuffle volume is O(distinct values), not
    O(rows).
    """
    from ..functions.aggregates import dict_encode_keep_null, hash64

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        wf = batch.column(weight_col).to_numpy(
            zero_copy_only=False).astype(np.float64)
        # integer units via round-half-AWAY (nonnegative weights),
        # matching the oracle's CAST(x AS BIGINT) (numpy's .astype
        # would truncate and np.round would round half-even — both
        # diverge on x.5)
        w = np.floor(wf + 0.5).astype(np.int64)
        kc, kdict = dict_encode_keep_null(batch.column(by))
        # pair-encode (key, value) so the per-batch combine is one pass
        uv, vc = np.unique(v, return_inverse=True)
        pair = kc * len(uv) + vc
        up, pc_inv = np.unique(pair, return_inverse=True)
        wsum = np.bincount(pc_inv, weights=w).astype(np.int64)
        kidx = (up // len(uv)).astype(np.int64)
        vidx = (up % len(uv)).astype(np.int64)
        kd = pc.take(kdict, pa.array(kidx))
        coarse = (hash64(kd) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({
            by: kd,
            "_v": pa.array(uv[vidx]),
            "_w": pa.array(wsum),
            "coarse": pa.array(coarse),
        })

    def kernel(group: pa.Table) -> pa.Table:
        t = group.sort_by([(by, "ascending"), ("_v", "ascending")])
        keys = t.column(by).to_numpy(zero_copy_only=False)
        v = t.column("_v").to_numpy(zero_copy_only=False)
        w = t.column("_w").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(v)
        if n == 0:
            return pa.table({by: t.column(by),
                             out_col: pa.array([], pa.float64())})
        new = np.ones(n, dtype=bool)
        new[1:] = keys[1:] != keys[:-1]
        # merge duplicate (key, value) partials from different batches
        newv = new.copy()
        newv[1:] |= v[1:] != v[:-1]
        runs = np.flatnonzero(newv)
        wrun = np.add.reduceat(w, runs)
        krun = keys[runs]
        vrun = v[runs]
        firstk = np.ones(len(runs), dtype=bool)
        firstk[1:] = krun[1:] != krun[:-1]
        seg = np.cumsum(firstk) - 1
        totw = np.bincount(seg, weights=wrun).astype(np.int64)
        cumw = np.cumsum(wrun)
        base = np.zeros(len(runs), dtype=np.int64)
        segstart = np.flatnonzero(firstk)
        base[segstart[1:]] = cumw[segstart[1:] - 1]
        cumw_in = cumw - np.maximum.accumulate(base)
        hit = q_den * cumw_in >= q_num * totw[seg]
        # first hit per segment: arg of min index among hits
        order = np.where(hit, np.arange(len(runs)), len(runs))
        first_hit = np.minimum.reduceat(order, segstart)
        out_k = krun[segstart]
        out_v = vrun[first_hit]
        return pa.table({
            by: pa.array(out_k),
            out_col: pa.array(out_v.astype(np.float64)),
        })

    return ds.select_columns(
        list(dict.fromkeys([by, col, weight_col]))
    ).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("coarse").map_groups(
        kernel, batch_format="pyarrow"
    ).select_columns([by, out_col])


def weighted_quantile(ds, *, by: str, col: str, weight_col: str,
                      q_num: int, q_den: int, n_buckets: int = 64):
    """Per-group lower weighted quantile q = q_num/q_den (exact integer
    cutover; see :func:`weighted_median`).  Output: (by, wq)."""
    return weighted_median(ds, by=by, col=col, weight_col=weight_col,
                           n_buckets=n_buckets, q_num=q_num, q_den=q_den,
                           out_col="wq")


def gini_by_group(ds, *, by: str, value_col: str, n_buckets: int = 32,
                  decimals: int = None):
    """Gini concentration coefficient per group over NON-NEGATIVE
    values: ``G = 2·Σ_i i·x_(i) / (n·Σx) − (n+1)/n`` with x sorted
    ascending and ties ordered arbitrarily (the formula is
    tie-invariant: equal values swap ranks without changing the sum) —
    the revenue-concentration / data-imbalance audit.

    Distributed rank-weighted sum without a global sort
    materialization (same two-level scan as ``drift.ks_exact``): values
    are range-bucketed per group, a tiny per-(group, bucket) count
    table provides each bucket's global rank OFFSET, then each bucket
    sorts locally and computes ``Σ (offset + local_rank)·x``.  One
    shuffle on (group, bucket); the merge moves 3 numbers per group
    per bucket.  Output: (by, gini, n).

    Partitioning note: buckets are equal-width per group between the
    group's min/max (balance only — correctness never depends on the
    edges).  ``decimals``: for fixed-point values (prices), accumulate
    in EXACT scaled integer units so the rank-weighted sums are
    bit-identical across engines (G is scale-invariant).
    """
    import ray
    from ray.data.aggregate import Sum

    proj = ds.select_columns([by, value_col])

    scale = None if decimals is None else float(10 ** decimals)

    def to_vg(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch.column(value_col), pa.float64())
        if scale is not None:
            v = pc.cast(pc.round(pc.multiply(v, scale)), pa.int64()).cast(
                pa.float64())
        t = pa.table({by: batch.column(by), "v": v})
        return t.filter(pc.is_valid(t.column("v")))

    vg = proj.map_batches(to_vg, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()

    # pass 0: per-group (min, max) — tiny
    from ray.data.aggregate import Max, Min

    gb = pa.concat_tables(list(
        vg.groupby(by).aggregate(Min("v", alias_name="lo"),
                                 Max("v", alias_name="hi"))
        .iter_batches(batch_format="pyarrow")))
    lo = dict(zip(gb.column(by).to_pylist(),
                  gb.column("lo").to_pylist()))
    hi = dict(zip(gb.column(by).to_pylist(),
                  gb.column("hi").to_pylist()))
    B = n_buckets
    ref_bounds = ray.put((lo, hi, B))

    def bucketize(batch: pa.Table) -> pa.Table:
        lo_, hi_, b_ = ray.get(ref_bounds)
        g = batch.column(by).to_pylist()
        v = batch.column("v").to_numpy(zero_copy_only=False)
        los = np.array([lo_[x] for x in g])
        his = np.array([hi_[x] for x in g])
        span = np.maximum(his - los, 1e-300)
        idx = np.clip(((v - los) / span * b_).astype(np.int64), 0, b_ - 1)
        return batch.append_column("bk", pa.array(idx))

    bucketed = vg.map_batches(bucketize, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    # pass 1: per-(group, bucket) counts -> rank offsets
    def counts(batch: pa.Table) -> pa.Table:
        t = pa.table({by: batch.column(by), "bk": batch.column("bk")})
        g = t.group_by([by, "bk"]).aggregate([([], "count_all")])
        return pa.table({by: g.column(by), "bk": g.column("bk"),
                         "n": g.column("count_all").cast(pa.int64())})

    cnt = pa.concat_tables(list(
        bucketed.map_batches(counts, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby([by, "bk"]).aggregate(Sum("n", alias_name="n"))
        .iter_batches(batch_format="pyarrow")))
    # offsets: for each (group, bucket), ranks before it
    gk = cnt.column(by).to_pylist()
    bk = cnt.column("bk").to_numpy(zero_copy_only=False)
    nn = cnt.column("n").to_numpy(zero_copy_only=False)
    order = np.lexsort((bk, np.asarray(gk, dtype=object)))
    offsets = {}
    group_n = {}
    run = 0
    prev = None
    for i in order:
        g = gk[i]
        if g != prev:
            run = 0
            prev = g
        offsets[(g, int(bk[i]))] = run
        run += int(nn[i])
        group_n[g] = run
    ref_off = ray.put(offsets)

    def kernel(group: pa.Table) -> pa.Table:
        off = ray.get(ref_off)
        g = group.column(by)[0].as_py()
        b = int(group.column("bk")[0].as_py())
        t = group.sort_by("v")
        v = t.column("v").to_numpy(zero_copy_only=False)
        ranks = np.arange(1, len(v) + 1, dtype=np.float64) + off[(g, b)]
        return pa.table({by: pa.array([g]),
                         "rw": pa.array([float((ranks * v).sum())]),
                         "s": pa.array([float(v.sum())]),
                         "n": pa.array([len(v)])})

    parts = bucketed.groupby([by, "bk"]).map_groups(
        kernel, batch_format="pyarrow")
    merged = pa.concat_tables(list(
        parts.groupby(by).aggregate(Sum("rw", alias_name="rw"),
                                    Sum("s", alias_name="s"),
                                    Sum("n", alias_name="n"))
        .iter_batches(batch_format="pyarrow")))
    n = merged.column("n").to_numpy(zero_copy_only=False).astype(
        np.float64)
    s = merged.column("s").to_numpy(zero_copy_only=False)
    rw = merged.column("rw").to_numpy(zero_copy_only=False)
    with np.errstate(invalid="ignore", divide="ignore"):
        gini = 2.0 * rw / (n * s) - (n + 1.0) / n
    return pa.table({by: merged.column(by),
                     "gini": pa.array(gini, pa.float64(),
                                      mask=(s == 0) | (n == 0)),
                     "n": pa.array(n.astype(np.int64))})


def mahalanobis_outliers(ds, *, cols, id_col: str, top: int = 20):
    """Multivariate outliers by Mahalanobis distance: rows whose
    d² = (x-μ)ᵀ Σ⁻¹ (x-μ) is largest — catches the jointly-implausible
    row (each column in range, the COMBINATION absurd) that univariate
    z-scores/IQR fences cannot.

    Plan: pass 1 reduces each batch to (n, Σx, ΣxxT) partials — one
    tiny row per block — summed into exact global moments; the k×k
    covariance inverse (k = len(cols), driver-side, O(k³) on a handful
    of floats) broadcasts with μ via the task closure.  Pass 2 streams:
    a vectorized per-batch distance + LOCAL top-k partial, then one
    exact final top-k over the gathered survivors (O(top × blocks)
    rows).  Rows with any null in ``cols`` are skipped.

    Approximate-free but rank-based -> rows-only in the driver
    contract; numpy parity is pinned in tests.
    """
    from ray.data.aggregate import Sum

    cols = list(cols)
    k = len(cols)

    def moments(t: pa.Table) -> pa.Table:
        X = np.column_stack([
            t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            for c in cols])
        X = X[~np.isnan(X).any(axis=1)]
        out = {"n": pa.array([len(X)], pa.int64())}
        s = X.sum(axis=0) if len(X) else np.zeros(k)
        xx = X.T @ X if len(X) else np.zeros((k, k))
        for i in range(k):
            out[f"s{i}"] = pa.array([float(s[i])], pa.float64())
            for j in range(i, k):
                out[f"x{i}_{j}"] = pa.array([float(xx[i, j])], pa.float64())
        return pa.table(out)

    aggs = [Sum("n", alias_name="n")]
    aggs += [Sum(f"s{i}", alias_name=f"s{i}") for i in range(k)]
    aggs += [Sum(f"x{i}_{j}", alias_name=f"x{i}_{j}")
             for i in range(k) for j in range(i, k)]
    red = ds.select_columns(cols).map_batches(
        moments, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(*aggs)
    n = int(red["n"] or 0)
    if n < k + 1:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "d2": pa.array([], pa.float64())})
    mu = np.array([red[f"s{i}"] for i in range(k)]) / n
    S = np.empty((k, k))
    for i in range(k):
        for j in range(i, k):
            S[i, j] = S[j, i] = red[f"x{i}_{j}"]
    cov = (S - n * np.outer(mu, mu)) / (n - 1)
    VI = np.linalg.inv(cov)

    def local_topk(t: pa.Table) -> pa.Table:
        X = np.column_stack([
            t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            for c in cols])
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        ok = ~np.isnan(X).any(axis=1)
        X, ids = X[ok], ids[ok]
        d = X - mu
        d2 = np.einsum("ij,jk,ik->i", d, VI, d)
        order = np.lexsort((ids, -d2))[:top]
        return pa.table({id_col: pa.array(ids[order]),
                         "d2": pa.array(d2[order], pa.float64())})

    local = ds.select_columns([id_col] + cols).map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True)
    return local.repartition(1).map_batches(
        local_topk_final(cols, id_col, top, mu, VI),
        batch_format="pyarrow", batch_size=None)


def local_topk_final(cols, id_col, top, mu, VI):
    """Final exact top-k over the gathered per-block survivors (their
    d2 is already computed; re-rank only)."""
    def fin(t: pa.Table) -> pa.Table:
        d2 = t.column("d2").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -d2))[:top]
        return pa.table({id_col: pa.array(ids[order]),
                         "d2": pa.array(d2[order], pa.float64())})
    return fin


def trimmed_mean(ds, *, by: str, col: str, p_lo: float = 0.05,
                 p_hi: float = 0.95):
    """Per-group trimmed mean: the mean of values INSIDE the group's
    ``[quantile(p_lo), quantile(p_hi)]`` band — the robust location
    estimate that, unlike :func:`winsorize`, drops the tails instead of
    clamping them.

    Same two-pass no-data-shuffle plan as winsorize: pass 1 computes
    per-group ``quantile_cont`` bounds (rounded to 6 dp so both engines
    pin the same float repr) and broadcasts them; pass 2 emits one
    (group, n, sum_cents) partial row per batch (integer cents, so the
    cross-block combine is order-independent) and a tiny groupby merges
    them.  Rows themselves never shuffle.

    Output: (by, n_kept, tmean) with tmean = sum_cents/(100·n) rounded
    to 6 dp.
    """
    import ray
    from ray.data.aggregate import Sum

    stats = _grouped_quantiles(ds, by, col, (p_lo, p_hi))
    lo = np.round(stats.column("q0").to_numpy(zero_copy_only=False), 6)
    hi = np.round(stats.column("q1").to_numpy(zero_copy_only=False), 6)
    keys = stats.column(by)
    keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
    handle = ray.put((keys, lo, hi))

    def partial(batch: pa.Table) -> pa.Table:
        kk, lo_, hi_ = ray.get(handle)
        pos, found = _group_positions(batch.column(by), kk)
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        keep = found & ~np.isnan(v) & (v >= lo_[pos]) & (v <= hi_[pos])
        m = len(kk)
        cents = np.round(v * 100.0)
        n = np.bincount(pos[keep], minlength=m).astype(np.int64)
        s = np.zeros(m, dtype=np.int64)
        np.add.at(s, pos[keep], cents[keep].astype(np.int64))
        nz = np.flatnonzero(n)
        return pa.table({
            by: kk.take(pa.array(nz, pa.int64())),
            "n": pa.array(n[nz]),
            "scents": pa.array(s[nz]),
        })

    merged = ds.select_columns([by, col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(by).aggregate(Sum("n", alias_name="n_kept"),
                            Sum("scents", alias_name="scents"))

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({by: pa.array([], pa.string()),
                             "n_kept": pa.array([], pa.int64()),
                             "tmean": pa.array([], pa.float64())})
        n = t.column("n_kept").to_numpy(zero_copy_only=False).astype(
            np.float64)
        s = t.column("scents").to_numpy(zero_copy_only=False).astype(
            np.float64)
        return pa.table({
            by: t.column(by),
            "n_kept": pc.cast(t.column("n_kept"), pa.int64()),
            # cents-sum / count is an exact rational: emit the raw
            # quotient (6-dp rounding can tie half-even vs half-away)
            "tmean": pa.array(s / (100.0 * n)),
        })

    return merged.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True)


def robust_zscore_report(ds, *, by: str, col: str, z: float = 3.5):
    """Per-group robust-z outlier report: modified z-score
    ``rz = |v − median| / (1.4826·MAD)`` (the Iglewicz–Hoaglin screen
    that, unlike mean/std z-scores, is not masked by the outliers
    themselves).  Groups with MAD = 0 are skipped (degenerate).

    Three broadcast passes, rows never shuffle: per-group median
    (quantile_cont parity, 6 dp), per-group MAD over |v − median|
    (6 dp), then a streaming row pass emitting ONE partial row per
    group per batch (n, n_outliers, max rz) merged by a tiny groupby.

    Output: (by, n, n_outliers, max_rz 6 dp).
    """
    import ray
    from ray.data.aggregate import Max, Sum

    med_t = _grouped_quantiles(ds, by, col, (0.5,))
    med = np.round(med_t.column("q0").to_numpy(zero_copy_only=False), 6)
    keys = med_t.column(by)
    keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
    h_med = ray.put((keys, med))

    def absdev(batch: pa.Table) -> pa.Table:
        kk, mm = ray.get(h_med)
        pos, found = _group_positions(batch.column(by), kk)
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        keep = found & ~np.isnan(v)
        return pa.table({
            by: batch.column(by).filter(pa.array(keep)),
            "_ad": pa.array(np.abs(v[keep] - mm[pos[keep]])),
        })

    dev_ds = ds.select_columns([by, col]).map_batches(
        absdev, batch_format="pyarrow", zero_copy_batch=True)
    mad_t = _grouped_quantiles(dev_ds, by, "_ad", (0.5,))
    mad = np.round(mad_t.column("q0").to_numpy(zero_copy_only=False), 6)
    mkeys = mad_t.column(by)
    mkeys = mkeys.combine_chunks() if isinstance(mkeys, pa.ChunkedArray) \
        else mkeys
    # align MAD to the median key order
    mpos = pc.index_in(keys, value_set=mkeys).to_numpy(
        zero_copy_only=False).astype(np.int64)
    h_both = ray.put((keys, med, mad[mpos]))

    def partial(batch: pa.Table) -> pa.Table:
        kk, mm, dd = ray.get(h_both)
        pos, found = _group_positions(batch.column(by), kk)
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        keep = found & ~np.isnan(v) & (dd[pos] > 0)
        p = pos[keep]
        rz = np.round(np.abs(v[keep] - mm[p]) / (1.4826 * dd[p]), 6)
        m = len(kk)
        n = np.bincount(p, minlength=m).astype(np.int64)
        n_out = np.bincount(p[rz > z], minlength=m).astype(np.int64)
        mx = np.zeros(m, dtype=np.float64)
        np.maximum.at(mx, p, rz)
        nz = np.flatnonzero(n)
        return pa.table({
            by: kk.take(pa.array(nz, pa.int64())),
            "n": pa.array(n[nz]),
            "n_outliers": pa.array(n_out[nz]),
            "max_rz": pa.array(mx[nz]),
        })

    merged = ds.select_columns([by, col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(by).aggregate(Sum("n", alias_name="n"),
                            Sum("n_outliers", alias_name="n_outliers"),
                            Max("max_rz", alias_name="max_rz"))

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({by: pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "n_outliers": pa.array([], pa.int64()),
                             "max_rz": pa.array([], pa.float64())})
        return pa.table({
            by: t.column(by),
            "n": pc.cast(t.column("n"), pa.int64()),
            "n_outliers": pc.cast(t.column("n_outliers"), pa.int64()),
            "max_rz": pc.cast(t.column("max_rz"), pa.float64()),
        })

    return merged.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True)


def spearman_grouped(ds, *, by: str, x_col: str, y_col: str):
    """Grouped Spearman rank correlation with exact average-rank tie
    handling — the monotone-association screen (robust to outliers and
    nonlinearity, unlike Pearson).

    Engine extension (upstream datatest has no correlation statistics;
    SURVEY.md §2.H) — the classic EDA companion to ``grouped_corr``.

    Exactness without a global sort: Spearman over a SMALL JOINT DOMAIN
    needs only the per-group contingency counts.  Average rank of a
    distinct value v is ``cum_before(v) + (count(v)+1)/2``, computable
    from the marginal counts alone, and the rank correlation is the
    count-weighted Pearson over the joint cells.  The shuffle therefore
    moves O(distinct (g,x,y) cells) rows — independent of row count —
    which is why this targets bounded-domain measures (quantity 1..50,
    discount 0.00..0.10), not continuous ones (use grouped_corr there).

    Plan: per-batch vectorized cell counting (lexsort + segment
    bincount) → ``repartition(1)`` → single-block finalize (merge
    cells, marginal cumulatives → average ranks, weighted Pearson per
    group).  Rows with a null key or null/NaN measure are excluded on
    both engines.  Output: (by, n, rho); rho is NULL for degenerate
    groups (zero variance or <2 rows).
    """

    def cells(batch: pa.Table) -> pa.Table:
        g = batch.column(by)
        g = g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
        x = batch.column(x_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        ok = pc.is_valid(g).to_numpy(zero_copy_only=False) \
            & ~np.isnan(x) & ~np.isnan(y)
        enc = pc.dictionary_encode(g.filter(pa.array(ok)))
        code = np.asarray(enc.indices, dtype=np.int64)
        x, y = x[ok], y[ok]
        order = np.lexsort((y, x, code))
        code, x, y = code[order], x[order], y[order]
        new = np.ones(len(code), dtype=bool)
        if len(code) > 1:
            new[1:] = ((code[1:] != code[:-1]) | (x[1:] != x[:-1])
                       | (y[1:] != y[:-1]))
        seg = np.cumsum(new) - 1
        c = np.bincount(seg)
        first = np.flatnonzero(new)
        return pa.table({
            by: enc.dictionary.take(pa.array(code[first])),
            "x": pa.array(x[first]),
            "y": pa.array(y[first]),
            "c": pa.array(c.astype(np.int64)),
        })

    partials = ds.select_columns([by, x_col, y_col]).map_batches(
        cells, batch_format="pyarrow", zero_copy_batch=True)

    def finalize(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([(by, t.schema.field(by).type
                                 if t.num_rows else pa.string()),
                                ("n", pa.int64()), ("rho", pa.float64())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        gcol = t.column(by).combine_chunks()
        enc = pc.dictionary_encode(gcol)
        code = np.asarray(enc.indices, dtype=np.int64)
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        # merge duplicate cells from different batches
        order = np.lexsort((y, x, code))
        code, x, y, c = code[order], x[order], y[order], c[order]
        new = np.ones(len(code), dtype=bool)
        if len(code) > 1:
            new[1:] = ((code[1:] != code[:-1]) | (x[1:] != x[:-1])
                       | (y[1:] != y[:-1]))
        seg = np.cumsum(new) - 1
        c = np.bincount(seg, weights=c).astype(np.int64)
        first = np.flatnonzero(new)
        code, x, y = code[first], x[first], y[first]
        # x marginals (cells are (g,x)-sorted): average rank per (g,x)
        newx = np.ones(len(code), dtype=bool)
        if len(code) > 1:
            newx[1:] = (code[1:] != code[:-1]) | (x[1:] != x[:-1])
        segx = np.cumsum(newx) - 1
        cx = np.bincount(segx, weights=c).astype(np.int64)
        newg_x = np.ones(len(cx), dtype=bool)
        gx_codes = code[np.flatnonzero(newx)]
        if len(cx) > 1:
            newg_x[1:] = gx_codes[1:] != gx_codes[:-1]
        cumx = np.cumsum(cx)
        base = np.zeros(len(cx), dtype=np.int64)
        starts = np.flatnonzero(newg_x)
        base[starts[1:]] = cumx[starts[1:] - 1] if len(starts) > 1 else 0
        base = np.maximum.accumulate(base)
        cum_in_g = cumx - base
        arx_per_xcell = (cum_in_g - cx) + (cx + 1) / 2.0
        arx = arx_per_xcell[segx]
        # y marginals: re-sort cells by (g, y)
        order_y = np.lexsort((y, code))
        inv = np.empty(len(order_y), dtype=np.int64)
        inv[order_y] = np.arange(len(order_y))
        code_y, y_s, c_y = code[order_y], y[order_y], c[order_y]
        newy = np.ones(len(code_y), dtype=bool)
        if len(code_y) > 1:
            newy[1:] = (code_y[1:] != code_y[:-1]) | (y_s[1:] != y_s[:-1])
        segy = np.cumsum(newy) - 1
        cy = np.bincount(segy, weights=c_y).astype(np.int64)
        gy_codes = code_y[np.flatnonzero(newy)]
        newg_y = np.ones(len(cy), dtype=bool)
        if len(cy) > 1:
            newg_y[1:] = gy_codes[1:] != gy_codes[:-1]
        cumy = np.cumsum(cy)
        basey = np.zeros(len(cy), dtype=np.int64)
        startsy = np.flatnonzero(newg_y)
        basey[startsy[1:]] = cumy[startsy[1:] - 1] if len(startsy) > 1 else 0
        basey = np.maximum.accumulate(basey)
        ary_per_ycell = (cumy - basey - cy) + (cy + 1) / 2.0
        ary = ary_per_ycell[segy][inv]
        # weighted Pearson over cells, per group
        m = int(code.max()) + 1
        w = c.astype(np.float64)
        n_g = np.bincount(code, weights=w, minlength=m)
        sx = np.bincount(code, weights=w * arx, minlength=m)
        sy_ = np.bincount(code, weights=w * ary, minlength=m)
        sxx = np.bincount(code, weights=w * arx * arx, minlength=m)
        syy = np.bincount(code, weights=w * ary * ary, minlength=m)
        sxy = np.bincount(code, weights=w * arx * ary, minlength=m)
        with np.errstate(invalid="ignore", divide="ignore"):
            cov = sxy - sx * sy_ / n_g
            vx = sxx - sx * sx / n_g
            vy = syy - sy_ * sy_ / n_g
            rho = cov / np.sqrt(vx * vy)
        present = np.bincount(code, minlength=m) > 0
        idx = np.flatnonzero(present)
        bad = ~np.isfinite(rho[idx])
        return pa.table({
            by: enc.dictionary.take(pa.array(idx)),
            "n": pa.array(n_g[idx].astype(np.int64)),
            "rho": pa.array(rho[idx], mask=bad),
        }).cast(pa.schema([(by, t.schema.field(by).type),
                           ("n", pa.int64()), ("rho", pa.float64())]))

    return partials.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def _merge_cells(t: pa.Table, by: str):
    """Merge per-batch joint-contingency partials: returns group codes,
    x, y, summed counts and the group dictionary, cell-sorted by
    (g, x, y)."""
    gcol = t.column(by).combine_chunks()
    enc = pc.dictionary_encode(gcol)
    code = np.asarray(enc.indices, dtype=np.int64)
    x = t.column("x").to_numpy(zero_copy_only=False)
    y = t.column("y").to_numpy(zero_copy_only=False)
    c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((y, x, code))
    code, x, y, c = code[order], x[order], y[order], c[order]
    new = np.ones(len(code), dtype=bool)
    if len(code) > 1:
        new[1:] = ((code[1:] != code[:-1]) | (x[1:] != x[:-1])
                   | (y[1:] != y[:-1]))
    seg = np.cumsum(new) - 1
    c = np.bincount(seg, weights=c).astype(np.int64)
    first = np.flatnonzero(new)
    return code[first], x[first], y[first], c, enc.dictionary


def _cells_partial(by: str, x_col: str, y_col: str):
    """Per-batch joint-cell counting kernel shared by the rank
    statistics (Spearman / Kendall): (by, x, y, c) with nulls/NaNs
    excluded — the shuffle moves O(distinct cells), never rows."""

    def cells(batch: pa.Table) -> pa.Table:
        g = batch.column(by)
        g = g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
        x = batch.column(x_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        ok = pc.is_valid(g).to_numpy(zero_copy_only=False) \
            & ~np.isnan(x) & ~np.isnan(y)
        enc = pc.dictionary_encode(g.filter(pa.array(ok)))
        code = np.asarray(enc.indices, dtype=np.int64)
        x, y = x[ok], y[ok]
        order = np.lexsort((y, x, code))
        code, x, y = code[order], x[order], y[order]
        new = np.ones(len(code), dtype=bool)
        if len(code) > 1:
            new[1:] = ((code[1:] != code[:-1]) | (x[1:] != x[:-1])
                       | (y[1:] != y[:-1]))
        seg = np.cumsum(new) - 1
        c = np.bincount(seg)
        first = np.flatnonzero(new)
        return pa.table({
            by: enc.dictionary.take(pa.array(code[first])),
            "x": pa.array(x[first]),
            "y": pa.array(y[first]),
            "c": pa.array(c.astype(np.int64)),
        })

    return cells


def kendall_grouped(ds, *, by: str, x_col: str, y_col: str):
    """Grouped Kendall tau-b (tie-corrected) — the concordance-based
    rank correlation, exact from the joint contingency grid alone:
    concordant/discordant pair counts are 2-D suffix/prefix sums over
    the per-group (x, y) count matrix, so the shuffle moves O(distinct
    cells) and no O(n²) pair pass ever happens.  Targets
    bounded-domain measures (same positioning as ``spearman_grouped``).

    tau_b = (C − D) / sqrt((n0 − n1)(n0 − n2)) with n0 = n(n−1)/2 and
    n1/n2 the tied-pair counts of the x/y marginals; all pair counts
    are exact int64, the quotient is the only float op.  Output:
    (by, n, tau); NULL for degenerate groups.
    """
    partials = ds.select_columns([by, x_col, y_col]).map_batches(
        _cells_partial(by, x_col, y_col), batch_format="pyarrow",
        zero_copy_batch=True)

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([(by, pa.string()), ("n", pa.int64()),
                              ("tau", pa.float64())]).empty_table()
        code, x, y, c, gdict = _merge_cells(t, by)
        out_g, out_n, out_tau = [], [], []
        for gi in np.unique(code):
            m = code == gi
            xs, ys, cs = x[m], y[m], c[m]
            ux, ix = np.unique(xs, return_inverse=True)
            uy, iy = np.unique(ys, return_inverse=True)
            M = np.zeros((len(ux), len(uy)), dtype=np.int64)
            M[ix, iy] = cs
            # strict 2-D suffix sum: S[i,j] = sum M[k>i, l>j]
            suf = M[::-1, ::-1].cumsum(0).cumsum(1)[::-1, ::-1]
            S = np.zeros_like(M)
            S[:-1, :-1] = suf[1:, 1:]
            C = int((M * S).sum())
            # strict (row-suffix, col-prefix): T[i,j] = sum M[k>i, l<j]
            rs = M[::-1, :].cumsum(0)[::-1, :]
            below = np.zeros_like(M)
            below[:-1, :] = rs[1:, :]
            T = np.zeros_like(M)
            T[:, 1:] = below.cumsum(1)[:, :-1]
            D = int((M * T).sum())
            n = int(cs.sum())
            tx = M.sum(axis=1)
            ty = M.sum(axis=0)
            n0 = n * (n - 1) // 2
            n1 = int((tx * (tx - 1) // 2).sum())
            n2 = int((ty * (ty - 1) // 2).sum())
            den = float(n0 - n1) * float(n0 - n2)
            tau = (C - D) / np.sqrt(den) if den > 0 else None
            out_g.append(gi)
            out_n.append(n)
            out_tau.append(tau)
        return pa.table({
            by: gdict.take(pa.array(np.array(out_g, dtype=np.int64))),
            "n": pa.array(out_n, pa.int64()),
            "tau": pa.array(out_tau, pa.float64()),
        })

    return partials.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def mann_whitney(ds, *, value_col: str, group_col: str, a, b=None):
    """Mann–Whitney U rank-sum test between two segments with exact
    average-rank tie handling and the tie-corrected normal
    approximation — the nonparametric two-sample location test (the
    robust alternative to a t-test for skewed metrics).

    ``b=None`` means "everything that is not ``a``" (one-vs-rest) —
    note U/(n_a·n_b) is then exactly the ROC AUC of ``value_col`` as a
    score for class ``a`` (ties counted half), so this doubles as the
    distributed exact-AUC kernel.

    Exact from value counts alone: pooled average ranks come from the
    cumulative counts at distinct values (same O(distinct) trick as
    ``spearman_grouped``), U from the rank sum of segment ``a``, and
    the tie correction from Σ(t³−t).  Shuffle payload: O(distinct
    values), never rows.  Output one row: (n_a, n_b, u, z).
    """

    def counts(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        g = g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
        v = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.float64)
        isa = pc.fill_null(pc.equal(g, a), False).to_numpy(
            zero_copy_only=False)
        if b is None:
            isb = pc.is_valid(g).to_numpy(zero_copy_only=False) & ~isa
        else:
            isb = pc.fill_null(pc.equal(g, b), False).to_numpy(
                zero_copy_only=False)
        ok = (isa | isb) & ~np.isnan(v)
        v, isa = v[ok], isa[ok]
        order = np.lexsort((isa, v))
        v, isa = v[order], isa[order]
        new = np.ones(len(v), dtype=bool)
        if len(v) > 1:
            new[1:] = v[1:] != v[:-1]
        seg = np.cumsum(new) - 1
        ca = np.bincount(seg, weights=isa.astype(np.int64)).astype(
            np.int64)
        cnt = np.bincount(seg).astype(np.int64)
        first = np.flatnonzero(new)
        return pa.table({"v": pa.array(v[first]), "ca": pa.array(ca),
                         "cnt": pa.array(cnt)})

    partials = ds.select_columns([group_col, value_col]).map_batches(
        counts, batch_format="pyarrow", zero_copy_batch=True)

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("n_a", pa.int64()), ("n_b", pa.int64()),
                            ("u", pa.float64()), ("z", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        v = t.column("v").to_numpy(zero_copy_only=False)
        ca = t.column("ca").to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False).astype(
            np.int64)
        order = np.argsort(v, kind="stable")
        v, ca, cnt = v[order], ca[order], cnt[order]
        new = np.ones(len(v), dtype=bool)
        if len(v) > 1:
            new[1:] = v[1:] != v[:-1]
        seg = np.cumsum(new) - 1
        ca = np.bincount(seg, weights=ca).astype(np.int64)
        cnt = np.bincount(seg, weights=cnt).astype(np.int64)
        na = int(ca.sum())
        n = int(cnt.sum())
        nb = n - na
        cum = np.cumsum(cnt)
        avg_rank = cum - cnt + (cnt + 1) / 2.0
        ra = float((ca * avg_rank).sum())
        u = ra - na * (na + 1) / 2.0
        tie = int((cnt ** 3 - cnt).sum())
        var = (na * 1.0 * nb / 12.0
               * ((n + 1) - tie * 1.0 / (n * 1.0 * (n - 1)))) \
            if n > 1 else 0.0
        z = (u - na * 1.0 * nb / 2.0) / np.sqrt(var) if var > 0 else None
        return pa.table({
            "n_a": pa.array([na], pa.int64()),
            "n_b": pa.array([nb], pa.int64()),
            "u": pa.array([u], pa.float64()),
            "z": pa.array([z], pa.float64()),
        })

    return partials.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def cliffs_delta(ds, *, value_col: str, group_col: str, a, b=None):
    """Cliff's delta — the ordinal effect size between two segments:
    δ = (#{x_a > x_b} − #{x_a < x_b}) / (n_a·n_b), the
    distribution-free companion to Mann–Whitney (δ = 2·AUC − 1 without
    the tie half-credit).  |δ| ≳ 0.15/0.33/0.47 reads as
    small/medium/large.

    ``b=None`` means one-vs-rest.  Exact from distinct-value counts
    (same O(distinct) partial structure as :func:`mann_whitney`):
    greater/less pair counts come from exclusive cumulative counts of
    the other segment at each distinct value — exact int64 arithmetic,
    the shuffle moves one row per distinct value per block.  Output
    one row (n_a, n_b, gt_pairs, lt_pairs, delta); delta NULL when
    either segment is empty.  The final quotient is emitted RAW (no
    6-dp rounding — count rationals can tie half-even vs half-away).
    """

    def counts(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        g = g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
        v = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.float64)
        isa = pc.fill_null(pc.equal(g, a), False).to_numpy(
            zero_copy_only=False)
        if b is None:
            isb = pc.is_valid(g).to_numpy(zero_copy_only=False) & ~isa
        else:
            isb = pc.fill_null(pc.equal(g, b), False).to_numpy(
                zero_copy_only=False)
        ok = (isa | isb) & ~np.isnan(v)
        v, isa = v[ok], isa[ok]
        order = np.lexsort((isa, v))
        v, isa = v[order], isa[order]
        new = np.ones(len(v), dtype=bool)
        if len(v) > 1:
            new[1:] = v[1:] != v[:-1]
        seg = np.cumsum(new) - 1
        ca = np.bincount(seg, weights=isa.astype(np.int64)).astype(
            np.int64)
        cnt = np.bincount(seg).astype(np.int64)
        first = np.flatnonzero(new)
        return pa.table({"v": pa.array(v[first]), "ca": pa.array(ca),
                         "cnt": pa.array(cnt)})

    partials = ds.select_columns([group_col, value_col]).map_batches(
        counts, batch_format="pyarrow", zero_copy_batch=True)

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("n_a", pa.int64()), ("n_b", pa.int64()),
                            ("gt_pairs", pa.int64()),
                            ("lt_pairs", pa.int64()),
                            ("delta", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        v = t.column("v").to_numpy(zero_copy_only=False)
        ca = t.column("ca").to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False).astype(
            np.int64)
        order = np.argsort(v, kind="stable")
        v, ca, cnt = v[order], ca[order], cnt[order]
        new = np.ones(len(v), dtype=bool)
        if len(v) > 1:
            new[1:] = v[1:] != v[:-1]
        seg = np.cumsum(new) - 1
        ca = np.bincount(seg, weights=ca).astype(np.int64)
        cnt = np.bincount(seg, weights=cnt).astype(np.int64)
        cb = cnt - ca
        na, nb = int(ca.sum()), int(cb.sum())
        below = np.cumsum(cb) - cb            # b-values strictly below
        above = nb - np.cumsum(cb)            # b-values strictly above
        gt = int((ca * below).sum())
        lt = int((ca * above).sum())
        # SQL-identical double ops: int diff -> double, double product
        delta = ((gt - lt) / (float(na) * nb)
                 if na > 0 and nb > 0 else None)
        return pa.table({
            "n_a": pa.array([na], pa.int64()),
            "n_b": pa.array([nb], pa.int64()),
            "gt_pairs": pa.array([gt], pa.int64()),
            "lt_pairs": pa.array([lt], pa.int64()),
            "delta": pa.array([delta], pa.float64()),
        })

    return partials.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def cvm_two_sample(ds, *, value_col: str, group_col: str, a, b=None):
    """Two-sample Cramér–von Mises statistic
    T = n·m/(n+m)² · Σ_pooled (F_n(z) − G_m(z))² — the integrated-ECDF
    drift test that weights the whole distribution (where KS takes
    only the max gap).

    Exact integer order statistics: with per-distinct-value counts
    (ca, cb) and cumulative sums cumN/cumM,
    T = Σ cnt·(m·cumN − n·cumM)² / (n·m·(n+m)²) — the numerator is an
    exact (big) integer accumulated in Python ints, converted to
    double ONCE, so the result is order-independent and bitwise equal
    to a SQL HUGEINT mirror.  Same O(distinct) partial structure as
    :func:`mann_whitney`.  Output one row (n_a, n_b, t).
    """

    def counts(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        g = g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
        v = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.float64)
        isa = pc.fill_null(pc.equal(g, a), False).to_numpy(
            zero_copy_only=False)
        if b is None:
            isb = pc.is_valid(g).to_numpy(zero_copy_only=False) & ~isa
        else:
            isb = pc.fill_null(pc.equal(g, b), False).to_numpy(
                zero_copy_only=False)
        ok = (isa | isb) & ~np.isnan(v)
        v, isa = v[ok], isa[ok]
        order = np.lexsort((isa, v))
        v, isa = v[order], isa[order]
        new = np.ones(len(v), dtype=bool)
        if len(v) > 1:
            new[1:] = v[1:] != v[:-1]
        seg = np.cumsum(new) - 1
        ca = np.bincount(seg, weights=isa.astype(np.int64)).astype(
            np.int64)
        cnt = np.bincount(seg).astype(np.int64)
        first = np.flatnonzero(new)
        return pa.table({"v": pa.array(v[first]), "ca": pa.array(ca),
                         "cnt": pa.array(cnt)})

    partials = ds.select_columns([group_col, value_col]).map_batches(
        counts, batch_format="pyarrow", zero_copy_batch=True)

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("n_a", pa.int64()), ("n_b", pa.int64()),
                            ("t", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        v = t.column("v").to_numpy(zero_copy_only=False)
        ca = t.column("ca").to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False).astype(
            np.int64)
        order = np.argsort(v, kind="stable")
        v, ca, cnt = v[order], ca[order], cnt[order]
        new = np.ones(len(v), dtype=bool)
        if len(v) > 1:
            new[1:] = v[1:] != v[:-1]
        seg = np.cumsum(new) - 1
        ca = np.bincount(seg, weights=ca).astype(np.int64)
        cnt = np.bincount(seg, weights=cnt).astype(np.int64)
        cb = cnt - ca
        n, m = int(ca.sum()), int(cb.sum())
        if n == 0 or m == 0:
            stat = None
        else:
            cum_n = np.cumsum(ca)
            cum_m = np.cumsum(cb)
            # exact big-int numerator (can exceed int64): Python ints
            num = sum(int(c) * (m * int(cn) - n * int(cm)) ** 2
                      for c, cn, cm in zip(cnt, cum_n, cum_m))
            # SQL-identical: numerator -> double once, denominator as
            # the same left-assoc double product
            stat = float(num) / (float(n) * m * (n + m) * (n + m))
        return pa.table({
            "n_a": pa.array([n], pa.int64()),
            "n_b": pa.array([m], pa.int64()),
            "t": pa.array([stat], pa.float64()),
        })

    return partials.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def welch_ttest(ds, *, value_col: str, group_col: str, a, b):
    """Welch's unequal-variance t-test between two segments — the
    default two-sample mean comparison (does NOT assume equal
    variances; the Student pooled test is a special case that misfires
    under imbalance).  t = (m_a − m_b)/sqrt(s²_a/n_a + s²_b/n_b) with
    Welch–Satterthwaite degrees of freedom.

    One pass of per-batch moment partials (n, Σv, Σv²) per segment →
    ONE tiny groupby — the data rows are never shuffled.  Output one
    row: (n_a, n_b, mean_a, mean_b, t, df)."""
    from ray.data.aggregate import Sum

    def moments(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        g = g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
        v = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.float64)
        isa = pc.fill_null(pc.equal(g, a), False).to_numpy(
            zero_copy_only=False)
        isb = pc.fill_null(pc.equal(g, b), False).to_numpy(
            zero_copy_only=False)
        ok = ~np.isnan(v)
        rows = []
        for name, m in (("a", isa & ok), ("b", isb & ok)):
            rows.append((name, int(m.sum()), float(v[m].sum()),
                         float((v[m] * v[m]).sum())))
        return pa.table({
            "seg": pa.array([r[0] for r in rows]),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "s": pa.array([r[2] for r in rows], pa.float64()),
            "ss": pa.array([r[3] for r in rows], pa.float64()),
        })

    merged = ds.select_columns([group_col, value_col]).map_batches(
        moments, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("seg").aggregate(Sum("n", alias_name="n"),
                               Sum("s", alias_name="s"),
                               Sum("ss", alias_name="ss"))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("n_a", pa.int64()), ("n_b", pa.int64()),
                            ("mean_a", pa.float64()),
                            ("mean_b", pa.float64()),
                            ("t", pa.float64()), ("df", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        d = {t.column("seg")[i].as_py():
             (t.column("n")[i].as_py(), t.column("s")[i].as_py(),
              t.column("ss")[i].as_py()) for i in range(t.num_rows)}
        na, sa, ssa = d.get("a", (0, 0.0, 0.0))
        nb, sb, ssb = d.get("b", (0, 0.0, 0.0))
        if na < 2 or nb < 2:
            return pa.table({"n_a": pa.array([na], pa.int64()),
                             "n_b": pa.array([nb], pa.int64()),
                             "mean_a": pa.array([None], pa.float64()),
                             "mean_b": pa.array([None], pa.float64()),
                             "t": pa.array([None], pa.float64()),
                             "df": pa.array([None], pa.float64())})
        ma, mb = sa / na, sb / nb
        va = (ssa - sa * sa / na) / (na - 1)
        vb = (ssb - sb * sb / nb) / (nb - 1)
        se2 = va / na + vb / nb
        tstat = (ma - mb) / np.sqrt(se2) if se2 > 0 else None
        df = (se2 * se2
              / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))) \
            if se2 > 0 else None
        return pa.table({
            "n_a": pa.array([na], pa.int64()),
            "n_b": pa.array([nb], pa.int64()),
            "mean_a": pa.array([ma], pa.float64()),
            "mean_b": pa.array([mb], pa.float64()),
            "t": pa.array([tstat], pa.float64()),
            "df": pa.array([df], pa.float64()),
        })

    return merged.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def kruskal_wallis(ds, *, value_col: str, group_col: str):
    """Kruskal–Wallis H rank test across k groups — the k-sample
    generalization of Mann–Whitney (one-way ANOVA on ranks): do the
    groups share one location, without any normality assumption?

    Exact average-rank tie handling from (group, value) counts alone —
    the same O(distinct) trick as ``mann_whitney``: per-batch
    ``group_by(group, value).count`` partials, one final merge, pooled
    ranks from cumulative counts at distinct values, per-group rank
    sums via bincount, and the standard tie correction
    H / (1 − Σ(t³−t)/(n³−n)).  Shuffle payload: O(groups × distinct
    values), never rows.  Output one row: (k, n, h)."""

    def counts(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        v = batch.column(value_col).cast(pa.float64())
        ok = pc.and_(pc.is_valid(g),
                     pc.and_(pc.is_valid(v),
                             pc.invert(pc.is_nan(v))))
        t = pa.table({"g": g, "v": v}).filter(ok)
        return t.group_by(["g", "v"]).aggregate(
            [([], "count_all")]).rename_columns(["g", "v", "cnt"])

    partials = ds.select_columns([group_col, value_col]).map_batches(
        counts, batch_format="pyarrow", zero_copy_batch=True)

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("k", pa.int64()), ("n", pa.int64()),
                            ("h", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        t = t.group_by(["g", "v"]).aggregate([("cnt", "sum")])
        gcode, _ = (t.column("g").combine_chunks()
                    .dictionary_encode().indices,
                    None)
        gcode = gcode.to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column("v").to_numpy(zero_copy_only=False)
        cnt = t.column("cnt_sum").to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.argsort(v, kind="stable")
        v, cnt, gcode = v[order], cnt[order], gcode[order]
        new = np.ones(len(v), dtype=bool)
        if len(v) > 1:
            new[1:] = v[1:] != v[:-1]
        seg = np.cumsum(new) - 1
        tot = np.bincount(seg, weights=cnt).astype(np.int64)
        cum = np.cumsum(tot)
        avg_rank = cum - tot + (tot + 1) / 2.0
        r_g = np.bincount(gcode, weights=cnt * avg_rank[seg])
        n_g = np.bincount(gcode, weights=cnt).astype(np.int64)
        n = int(n_g.sum())
        k = int((n_g > 0).sum())
        if k < 2 or n <= k:
            return pa.table({"k": pa.array([k], pa.int64()),
                             "n": pa.array([n], pa.int64()),
                             "h": pa.array([None], pa.float64())})
        live = n_g > 0
        h = (12.0 / (n * (n + 1.0))
             * float((r_g[live] ** 2 / n_g[live]).sum())
             - 3.0 * (n + 1.0))
        tie = float(((tot ** 3).astype(np.float64) - tot).sum())
        corr = 1.0 - tie / (float(n) ** 3 - n)
        h = h / corr if corr > 0 else None
        return pa.table({"k": pa.array([k], pa.int64()),
                         "n": pa.array([n], pa.int64()),
                         "h": pa.array([h], pa.float64())})

    return partials.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def anova_oneway(ds, *, value_col: str, group_col: str):
    """One-way ANOVA F test across k groups — are the group means
    equal?  F = (SSB/(k−1)) / (SSW/(n−k)) from per-group moment
    partials (n, Σv, Σv²) merged through ONE tiny groupby; data rows
    never shuffle (same skeleton as ``welch_ttest`` generalized to k
    groups).  Output one row: (k, n, f)."""
    from ray.data.aggregate import Sum

    def moments(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        v = batch.column(value_col).cast(pa.float64())
        ok = pc.and_(pc.is_valid(g),
                     pc.and_(pc.is_valid(v),
                             pc.invert(pc.is_nan(v))))
        t = pa.table({"g": g, "v": v}).filter(ok)
        t = t.append_column("v2", pc.multiply(t.column("v"),
                                              t.column("v")))
        out = t.group_by("g").aggregate(
            [("v", "count"), ("v", "sum"), ("v2", "sum")])
        return out.rename_columns(["g", "n", "s", "ss"])

    merged = ds.select_columns([group_col, value_col]).map_batches(
        moments, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("g").aggregate(Sum("n", alias_name="n"),
                             Sum("s", alias_name="s"),
                             Sum("ss", alias_name="ss"))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("k", pa.int64()), ("n", pa.int64()),
                            ("f", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        n_g = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.int64)
        s = t.column("s").to_numpy(zero_copy_only=False)
        ss = t.column("ss").to_numpy(zero_copy_only=False)
        live = n_g > 0
        n_g, s, ss = n_g[live], s[live], ss[live]
        k = int(len(n_g))
        n = int(n_g.sum())
        if k < 2 or n <= k:
            return pa.table({"k": pa.array([k], pa.int64()),
                             "n": pa.array([n], pa.int64()),
                             "f": pa.array([None], pa.float64())})
        within = float((ss - s * s / n_g).sum())
        between = float((s * s / n_g).sum()) - float(s.sum()) ** 2 / n
        f = ((between / (k - 1)) / (within / (n - k))
             if within > 0 else None)
        return pa.table({"k": pa.array([k], pa.int64()),
                         "n": pa.array([n], pa.int64()),
                         "f": pa.array([f], pa.float64())})

    return merged.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def jarque_bera(ds, *, value_col: str, by: str):
    """Jarque–Bera normality screen per group — skewness and excess
    kurtosis from raw power sums (n, Σv, Σv², Σv³, Σv⁴), then
    JB = n/6 · (skew² + (kurt−3)²/4).  Large JB ⇒ the distribution is
    not Gaussian; the classic pre-flight check before z-score /
    3-sigma anomaly rules that silently assume normality.

    One pass of per-group power-sum partials → ONE tiny groupby; rows
    never shuffle.  Population (biased) moments on both sides so the
    DuckDB oracle is formula-identical.  Output per group:
    (by, n, skew, kurt, jb); NULL stats for degenerate groups."""
    from ray.data.aggregate import Sum

    def moments(batch: pa.Table) -> pa.Table:
        g = batch.column(by)
        v = batch.column(value_col).cast(pa.float64())
        ok = pc.and_(pc.is_valid(g),
                     pc.and_(pc.is_valid(v),
                             pc.invert(pc.is_nan(v))))
        t = pa.table({by: g, "v": v}).filter(ok)
        va = t.column("v")
        v2 = pc.multiply(va, va)
        t = t.append_column("v2", v2)
        t = t.append_column("v3", pc.multiply(v2, va))
        t = t.append_column("v4", pc.multiply(v2, v2))
        out = t.group_by(by).aggregate(
            [("v", "count"), ("v", "sum"), ("v2", "sum"),
             ("v3", "sum"), ("v4", "sum")])
        return out.rename_columns([by, "n", "s1", "s2", "s3", "s4"])

    merged = ds.select_columns([by, value_col]).map_batches(
        moments, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(by).aggregate(Sum("n", alias_name="n"),
                            Sum("s1", alias_name="s1"),
                            Sum("s2", alias_name="s2"),
                            Sum("s3", alias_name="s3"),
                            Sum("s4", alias_name="s4"))

    def finalize(t: pa.Table) -> pa.Table:
        key_type = (t.schema.field(by).type if t.num_rows
                    else pa.string())
        schema = pa.schema([(by, key_type), ("n", pa.int64()),
                            ("skew", pa.float64()),
                            ("kurt", pa.float64()),
                            ("jb", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        n = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.float64)
        s1 = t.column("s1").to_numpy(zero_copy_only=False)
        s2 = t.column("s2").to_numpy(zero_copy_only=False)
        s3 = t.column("s3").to_numpy(zero_copy_only=False)
        s4 = t.column("s4").to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            m = s1 / n
            m2 = s2 / n - m * m
            m3 = s3 / n - 3 * m * (s2 / n) + 2 * m ** 3
            m4 = (s4 / n - 4 * m * (s3 / n)
                  + 6 * m * m * (s2 / n) - 3 * m ** 4)
            skew = m3 / m2 ** 1.5
            kurt = m4 / (m2 * m2)
            jb = n / 6.0 * (skew * skew + (kurt - 3.0) ** 2 / 4.0)
        bad = (n < 2) | ~(m2 > 0)
        skew = np.where(bad, np.nan, skew)
        kurt = np.where(bad, np.nan, kurt)
        jb = np.where(bad, np.nan, jb)
        return pa.table({
            by: t.column(by),
            "n": pa.array(n.astype(np.int64), pa.int64()),
            "skew": pa.array(np.where(np.isnan(skew), None, skew),
                             pa.float64(), from_pandas=True),
            "kurt": pa.array(np.where(np.isnan(kurt), None, kurt),
                             pa.float64(), from_pandas=True),
            "jb": pa.array(np.where(np.isnan(jb), None, jb),
                           pa.float64(), from_pandas=True),
        })

    return merged.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def levene_brown_forsythe(ds, *, value_col: str, group_col: str):
    """Brown–Forsythe test (Levene with median centers): are the group
    VARIANCES equal?  The pre-flight check before pooling groups or
    trusting a plain ANOVA.

    Two streaming passes, no materialization of rows:

    1. exact per-group median via :func:`..window.grouped_quantile`
       (one groupby; the medians table is #groups rows, collected to
       the driver and broadcast into pass 2);
    2. per-batch moment partials of z = |x − med(group)| — (n, Σz,
       Σz²) per group — merged by one tiny groupby-sum.

    W = ((N−k)/(k−1)) · Σ nᵢ(z̄ᵢ−z̄)² / ΣΣ(z−z̄ᵢ)², computed from the
    merged moments.  Shuffle payload: O(groups), never rows.  Output
    one row (k, n, w); w NULL when degenerate (k<2 or zero SSW)."""
    import ray
    from ray.data.aggregate import Sum

    from .window import grouped_quantile

    meds_t = grouped_quantile(
        ds, by=group_col, col=value_col, q=0.5, alias="med",
        method="cont").take_all()
    med_map = {r[group_col]: r["med"] for r in meds_t}
    med_ref = ray.put(med_map)

    def z_moments(batch: pa.Table) -> pa.Table:
        meds = ray.get(med_ref)
        g = batch.column(group_col)
        v = batch.column(value_col).cast(pa.float64())
        ok = pc.and_(pc.is_valid(g),
                     pc.and_(pc.is_valid(v), pc.invert(pc.is_nan(v))))
        t = pa.table({"g": g, "v": v}).filter(ok)
        enc = t.column("g").combine_chunks().dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False)
        cats = enc.dictionary.to_pylist()
        centers = np.array([meds.get(c, np.nan) for c in cats])
        z = np.abs(t.column("v").to_numpy(zero_copy_only=False)
                   - centers[code])
        k = len(cats)
        n = np.bincount(code, minlength=k).astype(np.int64)
        return pa.table({
            "g": pa.array(cats, type=batch.column(group_col).type),
            "n": pa.array(n),
            "sz": pa.array(np.bincount(code, weights=z, minlength=k)),
            "szz": pa.array(np.bincount(code, weights=z * z,
                                        minlength=k)),
        })

    merged = ds.select_columns([group_col, value_col]).map_batches(
        z_moments, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("g").aggregate(Sum("n", alias_name="n"),
                             Sum("sz", alias_name="sz"),
                             Sum("szz", alias_name="szz"))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("k", pa.int64()), ("n", pa.int64()),
                            ("w", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        n_i = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.float64)
        sz = t.column("sz").to_numpy(zero_copy_only=False)
        szz = t.column("szz").to_numpy(zero_copy_only=False)
        k = len(n_i)
        n = float(n_i.sum())
        zbar_i = sz / n_i
        zbar = sz.sum() / n
        ssb = float((n_i * (zbar_i - zbar) ** 2).sum())
        ssw = float((szz - n_i * zbar_i ** 2).sum())
        w = ((n - k) / (k - 1)) * ssb / ssw \
            if k >= 2 and n > k and ssw > 0 else None
        return pa.table({"k": pa.array([k], pa.int64()),
                         "n": pa.array([int(n)], pa.int64()),
                         "w": pa.array([w], pa.float64())})

    return merged.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def cronbach_alpha(ds, *, item_cols):
    """Cronbach's alpha internal-consistency coefficient over a fixed
    set of numeric item columns: α = k/(k−1) · (1 − Σvarᵢ/var(total))
    with SAMPLE variances and listwise deletion (rows with any null
    item dropped, matching the SQL ``WHERE ... IS NOT NULL`` oracle).

    One streaming pass: each batch reduces to (n, Σxᵢ, Σxᵢ², Σs, Σs²)
    where s is the row-sum — 2k+3 numbers per batch regardless of
    rows; a single global sum merges them.  Output (k, n, alpha)."""
    from ray.data.aggregate import Sum

    cols = list(item_cols)
    k = len(cols)

    def partial(batch: pa.Table) -> pa.Table:
        ok = None
        arrs = []
        for c in cols:
            a = batch.column(c).cast(pa.float64())
            valid = pc.and_(pc.is_valid(a), pc.invert(pc.is_nan(a)))
            ok = valid if ok is None else pc.and_(ok, valid)
            arrs.append(a)
        t = pa.table({c: a for c, a in zip(cols, arrs)}).filter(ok)
        mats = [t.column(c).to_numpy(zero_copy_only=False)
                for c in cols]
        s = np.zeros(t.num_rows)
        out = {"n": pa.array([t.num_rows], pa.int64())}
        for i, x in enumerate(mats):
            s += x
            out[f"sx{i}"] = pa.array([float(x.sum())])
            out[f"sxx{i}"] = pa.array([float((x * x).sum())])
        out["ss"] = pa.array([float(s.sum())])
        out["sss"] = pa.array([float((s * s).sum())])
        return pa.table(out)

    names = (["n"] + [f"sx{i}" for i in range(k)]
             + [f"sxx{i}" for i in range(k)] + ["ss", "sss"])
    merged = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(*[Sum(c, alias_name=c) for c in names])

    def finalize(row: dict) -> pa.Table:
        n = row.get("n") or 0
        if n < 2:
            return pa.table({"k": pa.array([k], pa.int64()),
                             "n": pa.array([n], pa.int64()),
                             "alpha": pa.array([None], pa.float64())})
        var_sum = 0.0
        for i in range(k):
            var_sum += (row[f"sxx{i}"] - row[f"sx{i}"] ** 2 / n) / (n - 1)
        var_tot = (row["sss"] - row["ss"] ** 2 / n) / (n - 1)
        alpha = k / (k - 1) * (1.0 - var_sum / var_tot) \
            if k >= 2 and var_tot > 0 else None
        return pa.table({"k": pa.array([k], pa.int64()),
                         "n": pa.array([int(n)], pa.int64()),
                         "alpha": pa.array([alpha], pa.float64())})

    # .aggregate() on a Dataset returns a plain dict row
    import ray.data as rd

    return rd.from_arrow(finalize(merged))


def runs_test_daily(ds, *, ts_col: str):
    """Wald–Wolfowitz runs test on the SIGN of day-over-day change of
    the daily row count — "is the direction of daily traffic change
    random, or does it trend/oscillate?".  Zero deltas are dropped
    (standard treatment).

    Daily counts reduce via one groupby (the series is #days rows —
    tiny at any corpus scale); the runs statistic is one vectorized
    pass over that series.  Output (n_pos, n_neg, n_runs, z); z NULL
    when either sign is absent."""
    from ray.data.aggregate import Count

    def to_day(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        day = pc.floor_temporal(ts, unit="day")
        return pa.table({"day": day})

    daily = ds.select_columns([ts_col]).map_batches(
        to_day, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("day").aggregate(Count(alias_name="n"))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("n_pos", pa.int64()), ("n_neg", pa.int64()),
                            ("n_runs", pa.int64()), ("z", pa.float64())])
        if t.num_rows < 2:
            return schema.empty_table()
        t = t.sort_by("day")
        n = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.float64)
        d = np.diff(n)
        sign = np.sign(d)
        sign = sign[sign != 0]
        n_pos = int((sign > 0).sum())
        n_neg = int((sign < 0).sum())
        if len(sign) == 0:
            runs = 0
        else:
            runs = int(1 + (sign[1:] != sign[:-1]).sum())
        z = None
        m = n_pos + n_neg
        if n_pos > 0 and n_neg > 0 and m > 1:
            mu = 2.0 * n_pos * n_neg / m + 1.0
            var = (mu - 1.0) * (mu - 2.0) / (m - 1.0)
            if var > 0:
                z = (runs - mu) / np.sqrt(var)
        return pa.table({"n_pos": pa.array([n_pos], pa.int64()),
                         "n_neg": pa.array([n_neg], pa.int64()),
                         "n_runs": pa.array([runs], pa.int64()),
                         "z": pa.array([z], pa.float64())})

    return daily.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def durbin_watson_grouped(ds, *, by: str, ts_col: str, value_col: str,
                          id_col: str, min_n: int = 3):
    """Durbin–Watson first-order autocorrelation statistic per group
    over the time-ordered value series: DW = Σ(vₜ−vₜ₋₁)² / Σ(vₜ−v̄)²
    (≈2 no autocorrelation, →0 positive, →4 negative).

    One groupby shuffle; each group sorts by (ts, id) — the id
    tiebreak makes equal-timestamp order deterministic (DW is order-
    sensitive) — then one vectorized kernel.  Assumes one group's rows
    fit in a worker (the per-key-fits assumption shared with
    sessionize; salt or pre-aggregate when a key is pathological).
    Groups with n < min_n or zero variance emit NULL dw; a group whose
    values are ALL null emits nothing (= the SQL mirror's
    ``WHERE value IS NOT NULL`` dropping the key before GROUP BY —
    caught by fuzz seed 777777 under the carve=3 hot-key skew)."""

    def kernel(group: pa.Table) -> pa.Table:
        g = group.sort_by([(ts_col, "ascending"), (id_col, "ascending")])
        v = g.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        v = v[~np.isnan(v)]
        n = len(v)
        if n == 0:
            return pa.schema([
                (by, group.column(by).type),
                ("n", pa.int64()),
                ("dw", pa.float64()),
            ]).empty_table()
        dw = None
        if n >= min_n:
            den = float(((v - v.mean()) ** 2).sum())
            if den > 0:
                dw = float((np.diff(v) ** 2).sum()) / den
        return pa.table({
            by: group.column(by)[:1],
            "n": pa.array([n], pa.int64()),
            "dw": pa.array([dw], pa.float64()),
        })

    return ds.select_columns([by, ts_col, value_col, id_col]).groupby(
        by).map_groups(kernel, batch_format="pyarrow")


def bartlett_test(ds, *, value_col: str, group_col: str):
    """Bartlett's test for variance homogeneity across k groups — the
    higher-power (but normality-sensitive) complement to
    :func:`levene_brown_forsythe`.

    T = [(N−k)·ln s²_p − Σ(nᵢ−1)·ln s²ᵢ] / C with the pooled variance
    s²_p = Σ(nᵢ−1)s²ᵢ/(N−k) and the Bartlett correction
    C = 1 + (Σ1/(nᵢ−1) − 1/(N−k)) / (3(k−1)).

    Same skeleton as :func:`anova_oneway`: per-batch moment partials
    (n, Σv, Σv²) per group, ONE tiny groupby-sum, finalize on the
    #groups-row table — data rows never shuffle.  Groups with n<2
    are dropped (their sample variance is undefined).  Output one row
    (k, n, stat); stat NULL when k<2 or any variance is 0."""
    from ray.data.aggregate import Sum

    def moments(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        v = batch.column(value_col).cast(pa.float64())
        ok = pc.and_(pc.is_valid(g),
                     pc.and_(pc.is_valid(v),
                             pc.invert(pc.is_nan(v))))
        t = pa.table({"g": g, "v": v}).filter(ok)
        t = t.append_column("v2", pc.multiply(t.column("v"),
                                              t.column("v")))
        out = t.group_by("g").aggregate(
            [("v", "count"), ("v", "sum"), ("v2", "sum")])
        return out.rename_columns(["g", "n", "s", "ss"])

    merged = ds.select_columns([group_col, value_col]).map_batches(
        moments, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("g").aggregate(Sum("n", alias_name="n"),
                             Sum("s", alias_name="s"),
                             Sum("ss", alias_name="ss"))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("k", pa.int64()), ("n", pa.int64()),
                            ("stat", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        n_g = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.int64)
        s = t.column("s").to_numpy(zero_copy_only=False)
        ss = t.column("ss").to_numpy(zero_copy_only=False)
        live = n_g >= 2
        n_g, s, ss = n_g[live], s[live], ss[live]
        k = int(len(n_g))
        n = int(n_g.sum())
        if k < 2 or n <= k:
            return pa.table({"k": pa.array([k], pa.int64()),
                             "n": pa.array([n], pa.int64()),
                             "stat": pa.array([None], pa.float64())})
        var = (ss - s * s / n_g) / (n_g - 1)
        if not (var > 0).all():
            return pa.table({"k": pa.array([k], pa.int64()),
                             "n": pa.array([n], pa.int64()),
                             "stat": pa.array([None], pa.float64())})
        sp2 = float(((n_g - 1) * var).sum()) / (n - k)
        num = (n - k) * np.log(sp2) - float(
            ((n_g - 1) * np.log(var)).sum())
        c = 1.0 + (float((1.0 / (n_g - 1)).sum()) - 1.0 / (n - k)) / (
            3.0 * (k - 1))
        return pa.table({"k": pa.array([k], pa.int64()),
                         "n": pa.array([n], pa.int64()),
                         "stat": pa.array([num / c], pa.float64())})

    return merged.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def gk_gamma(ds, *, i_col: str, j_col: str):
    """Goodman–Kruskal gamma between two ORDINAL integer columns:
    γ = (C − D)/(C + D) over concordant/discordant pairs, computed
    from the contingency table — never from row pairs.  One groupby
    builds the (i, j, n) cells (≤ levelsᵢ×levelsⱼ rows); the O(cells²)
    concordance sums run vectorized on the driver-side finalize.
    Exact int64 C and D, so γ is deterministic.  Output one row
    (c_pairs, d_pairs, gamma); gamma NULL when C + D = 0."""
    from ray.data.aggregate import Count

    cells_ds = ds.select_columns([i_col, j_col]).groupby(
        [i_col, j_col]).aggregate(Count(alias_name="n"))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("c_pairs", pa.int64()),
                            ("d_pairs", pa.int64()),
                            ("gamma", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        ok = pc.and_(pc.is_valid(t.column(i_col)),
                     pc.is_valid(t.column(j_col)))
        t = t.filter(ok)
        i = t.column(i_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        j = t.column(j_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.int64)
        gt_i = i[:, None] > i[None, :]
        conc = int((n[:, None] * n[None, :])[
            gt_i & (j[:, None] > j[None, :])].sum())
        disc = int((n[:, None] * n[None, :])[
            gt_i & (j[:, None] < j[None, :])].sum())
        gamma = (float(conc - disc) / float(conc + disc)
                 if conc + disc else None)
        return pa.table({"c_pairs": pa.array([conc], pa.int64()),
                         "d_pairs": pa.array([disc], pa.int64()),
                         "gamma": pa.array([gamma], pa.float64())})

    return cells_ds.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def odds_ratio_2x2(ds, *, exposure_col: str, exposure, outcome_col: str,
                   outcome, z: float = 1.959963984540054):
    """2x2 odds ratio with a Wald (log-scale) confidence interval:
    OR = (a·d)/(b·c), CI = exp(ln OR ± z·√(1/a+1/b+1/c+1/d)) where
    a..d are the exposure×outcome cell counts.  One streaming pass of
    per-batch cell partials, one 4-row reduce — no shuffle of data
    rows.  Output one row (a, b, c, d, odds_ratio, ci_lo, ci_hi);
    ratio/CI NULL when any cell is 0 (the Wald CI is undefined)."""
    from ray.data.aggregate import Sum

    def cells(batch: pa.Table) -> pa.Table:
        e = pc.fill_null(pc.equal(batch.column(exposure_col),
                                  exposure), False)
        o = pc.fill_null(pc.equal(batch.column(outcome_col),
                                  outcome), False)
        e = e.to_numpy(zero_copy_only=False)
        o = o.to_numpy(zero_copy_only=False)
        return pa.table({
            "a": pa.array([int((e & o).sum())], pa.int64()),
            "b": pa.array([int((e & ~o).sum())], pa.int64()),
            "c": pa.array([int((~e & o).sum())], pa.int64()),
            "d": pa.array([int((~e & ~o).sum())], pa.int64()),
        })

    merged = ds.select_columns([exposure_col, outcome_col]).map_batches(
        cells, batch_format="pyarrow", zero_copy_batch=True)

    def finalize(t: pa.Table) -> pa.Table:
        a = int(pc.sum(t.column("a")).as_py() or 0)
        b = int(pc.sum(t.column("b")).as_py() or 0)
        c = int(pc.sum(t.column("c")).as_py() or 0)
        d = int(pc.sum(t.column("d")).as_py() or 0)
        if min(a, b, c, d) > 0:
            orr = (a * d) / (b * c)
            se = float(np.sqrt(1 / a + 1 / b + 1 / c + 1 / d))
            lo = float(np.exp(np.log(orr) - z * se))
            hi = float(np.exp(np.log(orr) + z * se))
        else:
            orr = lo = hi = None
        return pa.table({
            "a": pa.array([a], pa.int64()),
            "b": pa.array([b], pa.int64()),
            "c": pa.array([c], pa.int64()),
            "d": pa.array([d], pa.int64()),
            "odds_ratio": pa.array([orr], pa.float64()),
            "ci_lo": pa.array([lo], pa.float64()),
            "ci_hi": pa.array([hi], pa.float64()),
        })

    return merged.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def fisher_exact_2x2(ds, *, exposure_col: str, exposure, outcome_col: str,
                     outcome):
    """Fisher's exact test (two-sided) on the 2x2 exposure×outcome
    table — the small-count-safe alternative to the chi-square screen.
    Cell counts stream exactly like :func:`odds_ratio_2x2`; the
    hypergeometric tail sums run on the driver over the ≤min(r1,c1)
    support points via log-gamma (no factorial overflow).  Two-sided
    per the standard definition: sum P(k) over all tables with
    P(k) ≤ P(observed)·(1+1e-7).  Output one row
    (a, b, c, d, p_value)."""
    from ray.data.aggregate import Sum

    def cells(batch: pa.Table) -> pa.Table:
        e = pc.fill_null(pc.equal(batch.column(exposure_col),
                                  exposure), False)
        o = pc.fill_null(pc.equal(batch.column(outcome_col),
                                  outcome), False)
        e = e.to_numpy(zero_copy_only=False)
        o = o.to_numpy(zero_copy_only=False)
        return pa.table({
            "a": pa.array([int((e & o).sum())], pa.int64()),
            "b": pa.array([int((e & ~o).sum())], pa.int64()),
            "c": pa.array([int((~e & o).sum())], pa.int64()),
            "d": pa.array([int((~e & ~o).sum())], pa.int64()),
        })

    merged = ds.select_columns([exposure_col, outcome_col]).map_batches(
        cells, batch_format="pyarrow", zero_copy_batch=True)

    def finalize(t: pa.Table) -> pa.Table:
        from math import lgamma

        a = int(pc.sum(t.column("a")).as_py() or 0)
        b = int(pc.sum(t.column("b")).as_py() or 0)
        c = int(pc.sum(t.column("c")).as_py() or 0)
        d = int(pc.sum(t.column("d")).as_py() or 0)
        n = a + b + c + d
        p = None
        if n > 0:
            r1, c1 = a + b, a + c

            def logpmf(k: int) -> float:
                return (lgamma(r1 + 1) - lgamma(k + 1)
                        - lgamma(r1 - k + 1)
                        + lgamma(n - r1 + 1) - lgamma(c1 - k + 1)
                        - lgamma(n - r1 - c1 + k + 1)
                        + lgamma(c1 + 1) + lgamma(n - c1 + 1)
                        - lgamma(n + 1))

            k_lo = max(0, r1 + c1 - n)
            k_hi = min(r1, c1)
            obs = np.exp(logpmf(a))
            p = float(sum(
                np.exp(logpmf(k)) for k in range(k_lo, k_hi + 1)
                if np.exp(logpmf(k)) <= obs * (1 + 1e-7)))
            p = min(p, 1.0)
        return pa.table({
            "a": pa.array([a], pa.int64()),
            "b": pa.array([b], pa.int64()),
            "c": pa.array([c], pa.int64()),
            "d": pa.array([d], pa.int64()),
            "p_value": pa.array([p], pa.float64()),
        })

    return merged.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def cohens_kappa(ds, *, i_col: str, j_col: str):
    """Cohen's kappa — chance-corrected agreement between two integer
    labelings of the same rows: κ = (p_o − p_e)/(1 − p_e) with
    observed agreement p_o (diagonal mass) and chance agreement
    p_e = Σ row_share·col_share.  One contingency groupby (≤levels²
    rows), exact int64 marginals in the finalize.  Output one row
    (n, po, pe, kappa); kappa NULL when p_e = 1 (degenerate)."""
    from ray.data.aggregate import Count

    cells_ds = ds.select_columns([i_col, j_col]).groupby(
        [i_col, j_col]).aggregate(Count(alias_name="n"))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("n", pa.int64()), ("po", pa.float64()),
                            ("pe", pa.float64()),
                            ("kappa", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        ok = pc.and_(pc.is_valid(t.column(i_col)),
                     pc.is_valid(t.column(j_col)))
        t = t.filter(ok)
        i = t.column(i_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        j = t.column(j_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.int64)
        tot = int(n.sum())
        if tot == 0:
            return schema.empty_table()
        diag = int(n[i == j].sum())
        # exact integer Σ row_i·col_i via per-level marginal sums
        levels = np.unique(np.concatenate([i, j]))
        row = {int(v): int(n[i == v].sum()) for v in levels}
        col = {int(v): int(n[j == v].sum()) for v in levels}
        chance = sum(row[v] * col[v] for v in row)
        po = diag / tot
        pe = chance / (tot * tot)
        kappa = (po - pe) / (1 - pe) if pe < 1.0 else None
        return pa.table({
            "n": pa.array([tot], pa.int64()),
            "po": pa.array([po], pa.float64()),
            "pe": pa.array([pe], pa.float64()),
            "kappa": pa.array([kappa], pa.float64()),
        })

    return cells_ds.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def mmr_select(ds, *, vec_col: str, id_col: str, k: int = 10,
               lam: float = 0.7, query_vec=None):
    """Maximal-marginal-relevance selection: greedily pick k vectors
    maximizing λ·sim(q, d) − (1−λ)·max_{s∈S} sim(d, s) — the standard
    diversity-aware subset selection for training-data curation.  The
    query defaults to the centroid of the row-normalized corpus
    (then itself L2-normalized).

    Iterative broadcast-state pattern (the same skeleton as the
    k-means pipeline): each of the k rounds broadcasts the selected
    id/vector list via ``ray.put`` and runs ONE distributed argmax
    pass (per-batch top-1 partials → driver pick); the corpus itself
    is never materialized.  k passes over the data by construction —
    use only for k ≪ corpus (selection, not ranking).  Output k rows
    (rank, id, score) in selection order."""
    import ray

    def to_mat(batch: pa.Table):
        import numpy as _np

        v = batch.column(vec_col)
        arr = _np.asarray(v.to_pylist(), dtype=_np.float64)
        nrm = _np.linalg.norm(arr, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        return arr / nrm, batch.column(id_col).to_numpy(
            zero_copy_only=False)

    # pass 0: corpus mean (for the default query vector)
    if query_vec is None:
        def mean_partial(batch: pa.Table) -> pa.Table:
            arr, _ = to_mat(batch)
            return pa.table({
                "s": [arr.sum(axis=0).tolist()],
                "n": pa.array([arr.shape[0]], pa.int64()),
            })

        parts = ds.map_batches(mean_partial, batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
        tot = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
        cnt = sum(p["n"] for p in parts)
        q = tot / max(cnt, 1)
    else:
        q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    q = q / (qn if qn else 1.0)

    selected_ids: list = []
    selected_vecs: list = []
    scores: list = []
    for _ in range(k):
        state = ray.put((q, np.asarray(selected_vecs, dtype=np.float64),
                         set(selected_ids)))

        def best_partial(batch: pa.Table) -> pa.Table:
            qv, sel_m, sel_ids = ray.get(state)
            arr, ids = to_mat(batch)
            rel = arr @ qv
            if sel_m.size:
                red = (arr @ sel_m.T).max(axis=1)
            else:
                red = np.zeros(len(arr))
            score = lam * rel - (1 - lam) * red
            mask = np.array([i not in sel_ids for i in ids])
            if not mask.any():
                return pa.table({"id": pa.array([], pa.int64()),
                                 "score": pa.array([], pa.float64()),
                                 "vec": pa.array([], pa.list_(
                                     pa.float64()))})
            score = np.where(mask, score, -np.inf)
            # deterministic: best score, lowest id tiebreak
            m = score.max()
            cand = np.flatnonzero(score == m)
            b = cand[np.argmin(ids[cand])]
            return pa.table({
                "id": pa.array([int(ids[b])], pa.int64()),
                "score": pa.array([float(score[b])], pa.float64()),
                "vec": pa.array([arr[b].tolist()],
                                pa.list_(pa.float64())),
            })

        tops = ds.map_batches(best_partial, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
        if not tops:
            break
        tops.sort(key=lambda r: (-r["score"], r["id"]))
        best = tops[0]
        selected_ids.append(best["id"])
        selected_vecs.append(best["vec"])
        scores.append(best["score"])

    return pa.table({
        "rank": pa.array(range(1, len(selected_ids) + 1), pa.int64()),
        "vec_id": pa.array(selected_ids, pa.int64()),
        "score": pa.array([round(s, 6) for s in scores], pa.float64()),
    })


def expected_shortfall(ds, *, col: str, q: float = 0.95):
    """Expected shortfall (CVaR): the exact mean of the top
    ceil((1-q)*n) values -- the tail-risk number that, unlike the
    quantile itself, reacts to HOW bad the tail is.  Computed from the
    value-count suffix: whole tail blocks sum exactly in integer
    cents, and the boundary value contributes the exact fractional
    count, so the result is an integer quotient in disguise.

    O(distinct values) shuffle.  Output one row (n int64, m int64 tail
    size, var_q round-6 [the q-quantile, inverted-CDF], es round-6).
    """
    import math

    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        v = v[np.isfinite(v)]
        cents = np.rint(v * 100.0).astype(np.int64)
        uv, cnt = np.unique(cents, return_counts=True)
        return pa.table({"v": pa.array(uv),
                         "cnt": pa.array(cnt.astype(np.int64))})

    agg = ds.select_columns([col]).map_batches(
        partials, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("v").aggregate(Sum("cnt", alias_name="cnt"))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("n", pa.int64()), ("m", pa.int64()),
                            ("var_q", pa.float64()),
                            ("es", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        t = t.sort_by([("v", "descending")])
        v = t.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = int(cnt.sum())
        # exact integer ceil((1-q) n): q carries 2 decimals, so the
        # rank is (n * (100 - 100q) + 99) // 100 -- immune to the
        # float-ceil off-by-one (0.05 * 15000 -> 750.0000000000007)
        qn = int(round((1.0 - q) * 100))
        m = max(1, (n * qn + 99) // 100)
        cum = np.cumsum(cnt)
        j = int(np.searchsorted(cum, m))          # boundary block
        whole = int(np.sum(v[:j] * cnt[:j]))
        take = m - (int(cum[j - 1]) if j > 0 else 0)
        tail_sum = whole + int(v[j]) * take
        # VaR_q: smallest value with ascending-cum >= ceil(q*n)
        r = max(1, (n * (100 - qn) + 99) // 100)
        va = v[::-1]
        ca = np.cumsum(cnt[::-1])
        var_q = int(va[int(np.searchsorted(ca, r))])
        return pa.table({
            "n": pa.array([n], pa.int64()),
            "m": pa.array([m], pa.int64()),
            "var_q": pa.array([round(var_q / 100.0, 6)], pa.float64()),
            "es": pa.array([round(tail_sum / (100.0 * m), 6)],
                           pa.float64()),
        })

    return agg.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def mean_excess_slope(ds, *, col: str, thresholds):
    """Peaks-over-threshold mean-excess diagnostic: e(u) = mean(x - u
    | x > u) at each fixed threshold, plus the OLS slope of e(u) on u
    -- the classical GPD tail-shape probe (slope > 0 heavy tail
    xi > 0, ~0 exponential, < 0 bounded).  Exact integer-cent sums per
    threshold from ONE pass; the grid is user-fixed so the statistic
    is deterministic by construction.

    Output: one row per threshold (u round-6, n_exceed int64, mean_ex
    round-6) plus slope carried on every row (me_slope round-6; NULL
    under 2 usable thresholds).
    """
    from ray.data.aggregate import Sum

    th = [float(u) for u in thresholds]
    th_cents = np.rint(np.array(th) * 100.0).astype(np.int64)

    def partials(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        v = v[np.isfinite(v)]
        cents = np.rint(v * 100.0).astype(np.int64)
        rows_u, rows_n, rows_s = [], [], []
        for i, u in enumerate(th_cents):
            sel = cents > u
            rows_u.append(i)
            rows_n.append(int(sel.sum()))
            rows_s.append(int((cents[sel] - u).sum()))
        return pa.table({"i": pa.array(rows_u, pa.int64()),
                         "n": pa.array(rows_n, pa.int64()),
                         "s": pa.array(rows_s, pa.int64())})

    agg = ds.select_columns([col]).map_batches(
        partials, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("i").aggregate(Sum("n", alias_name="n"),
                             Sum("s", alias_name="s"))

    def finalize(t: pa.Table) -> pa.Table:
        t = t.sort_by([("i", "ascending")])
        idx = t.column("i").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        s = t.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
        u = th_cents[idx] / 100.0
        ok = n > 0
        me = np.where(ok, (s / 100.0) / np.maximum(n, 1), np.nan)
        slope = None
        if int(ok.sum()) >= 2:
            x, y = u[ok], me[ok]
            mx, my = x.mean(), y.mean()
            den = float(np.sum((x - mx) ** 2))
            if den > 0:
                slope = round(float(np.sum((x - mx) * (y - my))) / den,
                              6)
        return pa.table({
            "u": pa.array(np.round(u, 6)),
            "n_exceed": pa.array(n),
            "mean_ex": pa.array(
                [round(m_, 6) if ok_ else None
                 for m_, ok_ in zip(me, ok)], pa.float64()),
            "me_slope": pa.array([slope] * len(u), pa.float64()),
        })

    return agg.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def ecod_topk(ds, *, cols, key_cols, k: int = 10,
              cents_scale: float = 100.0):
    """ECOD outlier scores (Li et al., TKDE 2022, simplified
    unskewed form): per dimension the empirical tail probability
    min(P(X <= x), P(X >= x)) from the EXACT value counts, and the
    outlier score is the summed negative log tail mass -- a
    deterministic, parameter-free multivariate anomaly detector (no
    trees, no seeds) whose top-k is bit-reproducible on any engine.

    Per-dim value counts collect once (O(distinct) driver state,
    broadcast via ``ray.put``); scoring is one vectorized
    ``searchsorted`` pass; the global top-k comes from a sort+limit.
    Output: (*key_cols, score round-6), k rows, score desc then keys
    asc.
    """
    import ray
    from ray.data.aggregate import Sum

    dims = list(cols)
    keys = list(key_cols)

    def vc_partials(c):
        def f(t: pa.Table) -> pa.Table:
            v = t.column(c).to_numpy(zero_copy_only=False).astype(
                np.float64)
            v = v[np.isfinite(v)]
            cents = np.rint(v * cents_scale).astype(np.int64)
            uv, cnt = np.unique(cents, return_counts=True)
            return pa.table({"v": pa.array(uv),
                             "cnt": pa.array(cnt.astype(np.int64))})
        return f

    maps = {}
    for c in dims:
        vc = (ds.select_columns([c])
              .map_batches(vc_partials(c), batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby("v").aggregate(Sum("cnt", alias_name="cnt"))
              ).take_all()
        vs = np.array(sorted(r["v"] for r in vc), dtype=np.int64)
        by_v = {r["v"]: r["cnt"] for r in vc}
        cnt = np.array([by_v[v] for v in vs], dtype=np.int64)
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        maps[c] = (vs, cum, cnt, n)
    refs = ray.put(maps)

    def score(t: pa.Table) -> pa.Table:
        m = ray.get(refs)
        # a null in ANY dimension drops the row (the SQL mirror's
        # equi-joins do the same silently; NaN->int64 garbage must
        # never reach searchsorted)
        ok = None
        for c in dims:
            valid = pc.is_valid(t.column(c))
            ok = valid if ok is None else pc.and_(ok, valid)
        t = t.filter(ok)
        out = {kk: t.column(kk) for kk in keys}
        total = None
        for c in dims:
            vs, cum, cnt, n = m[c]
            x = np.rint(t.column(c).to_numpy(
                zero_copy_only=False).astype(np.float64)
                * cents_scale).astype(np.int64)
            idx = np.searchsorted(vs, x)
            pl = cum[idx] / n                       # P(X <= x)
            pr = (n - cum[idx] + cnt[idx]) / n      # P(X >= x)
            term = -np.log(np.minimum(pl, pr))
            total = term if total is None else total + term
        out["score"] = pa.array(np.round(total, 6))
        out["_neg"] = pa.array(-total)
        return pa.table(out)

    scored = ds.select_columns(keys + dims).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True)
    top = scored.sort(["_neg"] + keys).limit(k)
    return top.select_columns(keys + ["score"])


def boxcox_scan(ds, *, col: str, lambdas=(-1.0, -0.5, 0.0, 0.5, 1.0)):
    """Box-Cox profile-likelihood scan over a FIXED lambda grid for a
    positive column: for each lambda the transform y = (x^l - 1)/l
    (ln x at l = 0) scores ll = -n/2 ln(pop-var(y)) + (l - 1) sum ln x
    -- the principled "should we log this metric" answer, reported for
    every candidate plus the argmax (grid ties to the smaller lambda).

    One pass of exact float sums per lambda (the grid is fixed so the
    statistic is deterministic by construction).  The log-likelihood
    reports PER OBSERVATION (ll/n) so its round-6 representation
    stays inside float-summation noise at any corpus size.  Output:
    (lam round-6, ll_per_n round-6, best int64 0/1).
    """
    from ray.data.aggregate import Sum

    lams = [float(v) for v in lambdas]

    def partials(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        v = v[np.isfinite(v) & (v > 0)]
        lx = np.log(v)
        rows_i, rows_n, rows_s, rows_s2, rows_lx = [], [], [], [], []
        for i, l in enumerate(lams):
            # var((x^l - 1)/l) = var(x^l)/l^2: accumulate the PURE
            # power so the affine constant cannot eat precision
            # (1 - 1/x at l = -1 is a catastrophic-cancellation trap)
            y = lx if l == 0.0 else v ** l
            rows_i.append(i)
            rows_n.append(len(v))
            rows_s.append(float(y.sum()))
            rows_s2.append(float((y * y).sum()))
            rows_lx.append(float(lx.sum()))
        return pa.table({
            "i": pa.array(rows_i, pa.int64()),
            "n": pa.array(rows_n, pa.int64()),
            "s": pa.array(rows_s, pa.float64()),
            "s2": pa.array(rows_s2, pa.float64()),
            "slx": pa.array(rows_lx, pa.float64()),
        })

    agg = ds.select_columns([col]).map_batches(
        partials, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("i").aggregate(
        Sum("n", alias_name="n"), Sum("s", alias_name="s"),
        Sum("s2", alias_name="s2"), Sum("slx", alias_name="slx"))

    def finalize(t: pa.Table) -> pa.Table:
        t = t.sort_by([("i", "ascending")])
        idx = t.column("i").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.int64)
        s = t.column("s").to_numpy(zero_copy_only=False)
        s2 = t.column("s2").to_numpy(zero_copy_only=False)
        slx = t.column("slx").to_numpy(zero_copy_only=False)
        lls = []
        for i in range(len(idx)):
            if n[i] < 2:
                lls.append(None)
                continue
            var = s2[i] / n[i] - (s[i] / n[i]) * (s[i] / n[i])
            if var <= 0:
                lls.append(None)
                continue
            l = lams[int(idx[i])]
            if l != 0.0:
                var = var / (l * l)
            lls.append((-n[i] / 2.0 * np.log(var)
                        + (l - 1.0) * slx[i]) / n[i])
        best_i = None
        best = -np.inf
        for i, v in enumerate(lls):
            if v is not None and v > best:
                best, best_i = v, i
        return pa.table({
            "lam": pa.array([round(lams[int(j)], 6) for j in idx],
                            pa.float64()),
            "ll_per_n": pa.array([None if v is None else round(v, 6)
                                  for v in lls], pa.float64()),
            "best": pa.array(
                [1 if i == best_i else 0 for i in range(len(idx))],
                pa.int64()),
        })

    return agg.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def lorenz_asymmetry(ds, *, col: str):
    """Lorenz asymmetry coefficient S = F(mu) + L(mu) under the
    discrete convention F(mu) = share of units strictly below the
    mean and L(mu) = their value share: S < 1 means inequality is
    driven by many small values, S > 1 by a few giants -- the
    direction Gini alone cannot tell.  Exact integer cents sums.

    O(distinct values) shuffle.  Output one row (n int64, s round-6,
    f_mu round-6, l_mu round-6).
    """
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        v = v[np.isfinite(v) & (v > 0)]
        cents = np.rint(v * 100.0).astype(np.int64)
        uv, cnt = np.unique(cents, return_counts=True)
        return pa.table({"v": pa.array(uv),
                         "cnt": pa.array(cnt.astype(np.int64))})

    agg = ds.select_columns([col]).map_batches(
        partials, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("v").aggregate(Sum("cnt", alias_name="cnt"))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("n", pa.int64()), ("s", pa.float64()),
                            ("f_mu", pa.float64()),
                            ("l_mu", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        t = t.sort_by([("v", "ascending")])
        v = t.column("v").to_numpy(zero_copy_only=False).astype(
            np.int64)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = int(cnt.sum())
        tot = int(np.sum(v * cnt))
        # strictly below the mean: v * n < tot (exact integers)
        below = v * n < tot
        n_below = int(cnt[below].sum())
        sum_below = int(np.sum(v[below] * cnt[below]))
        f_mu = n_below / n
        l_mu = sum_below / tot if tot > 0 else 0.0
        return pa.table({
            "n": pa.array([n], pa.int64()),
            "s": pa.array([round(f_mu + l_mu, 6)], pa.float64()),
            "f_mu": pa.array([round(f_mu, 6)], pa.float64()),
            "l_mu": pa.array([round(l_mu, 6)], pa.float64()),
        })

    return agg.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def quantile_diff(ds, *, value_col: str, split_expr,
                  qs=(0.1, 0.25, 0.5, 0.75, 0.9)):
    """Quantile 'treatment effect' table: the inverted-CDF quantile of
    ``value_col`` in each of two slices (split_expr(table) ->
    BooleanArray marks slice A) at fixed probabilities, plus the
    difference -- WHERE in the distribution the two slices diverge,
    which a mean comparison flattens away.  Ranks are exact integers
    ((n * q + 99) // 100 for 2-decimal q), values exact cents.

    O(distinct values) shuffle of per-slice value counts.  Output:
    (q round-6, q_a round-6, q_b round-6, diff round-6).
    """
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        m = split_expr(t)
        m = m.combine_chunks() if isinstance(m, pa.ChunkedArray) else m
        ok = pc.and_(pc.is_valid(t.column(value_col)), pc.is_valid(m))
        g = pa.table({"v": t.column(value_col),
                      "a": pc.cast(m, pa.int64())}).filter(ok)
        v = g.column("v").to_numpy(zero_copy_only=False).astype(
            np.float64)
        cents = np.rint(v * 100.0).astype(np.int64)
        aa = g.column("a").to_numpy(zero_copy_only=False)
        out = {"v": [], "ca": [], "cb": []}
        for side in (0, 1):
            sel = aa == side
            uv, cnt = np.unique(cents[sel], return_counts=True)
            out["v"].extend(uv.tolist())
            out["ca"].extend((cnt if side else
                              np.zeros_like(cnt)).tolist())
            out["cb"].extend((np.zeros_like(cnt) if side else
                              cnt).tolist())
        return pa.table({"v": pa.array(out["v"], pa.int64()),
                         "ca": pa.array(out["ca"], pa.int64()),
                         "cb": pa.array(out["cb"], pa.int64())})

    agg = ds.map_batches(
        partials, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("v").aggregate(Sum("ca", alias_name="ca"),
                             Sum("cb", alias_name="cb"))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("q", pa.float64()), ("q_a", pa.float64()),
                            ("q_b", pa.float64()),
                            ("diff", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        t = t.sort_by([("v", "ascending")])
        v = t.column("v").to_numpy(zero_copy_only=False).astype(
            np.int64)
        ca = t.column("ca").to_numpy(zero_copy_only=False).astype(
            np.int64)
        cb = t.column("cb").to_numpy(zero_copy_only=False).astype(
            np.int64)
        cum_a, cum_b = np.cumsum(ca), np.cumsum(cb)
        na = int(cum_a[-1]) if len(cum_a) else 0
        nb = int(cum_b[-1]) if len(cum_b) else 0
        rows = {"q": [], "q_a": [], "q_b": [], "diff": []}
        for q in qs:
            qn = int(round(q * 100))
            rows["q"].append(round(q, 6))
            if na == 0 or nb == 0:
                rows["q_a"].append(None)
                rows["q_b"].append(None)
                rows["diff"].append(None)
                continue
            ra = max(1, (na * qn + 99) // 100)
            rb = max(1, (nb * qn + 99) // 100)
            va = int(v[int(np.searchsorted(cum_a, ra))])
            vb = int(v[int(np.searchsorted(cum_b, rb))])
            rows["q_a"].append(round(va / 100.0, 6))
            rows["q_b"].append(round(vb / 100.0, 6))
            rows["diff"].append(round((va - vb) / 100.0, 6))
        return pa.table({
            "q": pa.array(rows["q"], pa.float64()),
            "q_a": pa.array(rows["q_a"], pa.float64()),
            "q_b": pa.array(rows["q_b"], pa.float64()),
            "diff": pa.array(rows["diff"], pa.float64()),
        })

    return agg.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def interquartile_mean(ds, *, col: str):
    """Interquartile mean (midmean): the exact mean of the middle 50%
    of the distribution, with FRACTIONAL weights on the boundary
    order statistics when n is not divisible by 4 (the Olympic-score
    estimator: immune to both tails, smoother than the median).
    With n/4 = k + f, the lowest and highest k observations drop and
    the two boundary values enter with weight 1 - f ... all in exact
    integer quarters of cents, so the quotient is hash-stable.

    O(distinct values) shuffle.  Output one row (n int64, iqm
    round-6).
    """
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        v = v[np.isfinite(v)]
        cents = np.rint(v * 100.0).astype(np.int64)
        uv, cnt = np.unique(cents, return_counts=True)
        return pa.table({"v": pa.array(uv),
                         "cnt": pa.array(cnt.astype(np.int64))})

    agg = ds.select_columns([col]).map_batches(
        partials, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("v").aggregate(Sum("cnt", alias_name="cnt"))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("n", pa.int64()), ("iqm", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        t = t.sort_by([("v", "ascending")])
        v = t.column("v").to_numpy(zero_copy_only=False).astype(
            np.int64)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = int(cnt.sum())
        if n == 0:
            return pa.table({"n": pa.array([0], pa.int64()),
                             "iqm": pa.array([None], pa.float64())})
        # quarter-units: each observation weighs 4 units; keep the
        # overlap of each value's [cum - w, cum] span with the middle
        # band [n, 3n] -- exact integer interval arithmetic
        w = cnt * 4
        cum = np.cumsum(w)
        kept = np.clip(np.minimum(cum, 3 * n)
                       - np.maximum(cum - w, n), 0, None)
        wsum = int(np.sum(v * kept))
        wtot = int(kept.sum())        # = 2n units
        iqm = round(wsum / (100.0 * wtot), 6) if wtot else None
        return pa.table({"n": pa.array([n], pa.int64()),
                         "iqm": pa.array([iqm], pa.float64())})

    return agg.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)
