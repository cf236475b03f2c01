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

from .base import round6_half_up

__all__ = ["profile_columns", "corr_matrix", "quantile_histogram",
           "key_skew_report", "benford_digits", "group_entropy",
           "kmv_overlap", "fd_profile", "null_share_daily",
           "ddsketch_quantiles", "benford_second_digit", "null_pattern_census", "dup_row_census"]


def _kmv_bottom_k(ds, col: str, *, k: int):
    """Bottom-k md5 fingerprints of a column's DISTINCT values (the KMV
    / bottom-k sketch).  Per-batch: distinct non-null values -> md5 hex
    of their decimal-string form (so DuckDB's ``md5(CAST(v AS
    VARCHAR))`` recomputes it bit-for-bit) -> keep the k smallest.
    Each block ships <= k 32-byte strings; the driver merges the tiny
    partials (sort + unique + head-k) — a sketch reduce, same shape as
    the bloom build, never the data."""
    import hashlib

    def partial(t: pa.Table) -> pa.Table:
        arr = t.column(col)
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        uniq = pc.unique(arr.drop_null())
        hs = np.sort(np.array(
            [hashlib.md5(str(v).encode()).hexdigest() for v in uniq.to_pylist()],
            dtype=object))
        return pa.table({"h": pa.array(list(hs[:k]), pa.string())})

    acc: list = []
    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    for b in parts.iter_batches(batch_format="pyarrow"):
        acc.extend(b.column("h").to_pylist())
    return sorted(set(acc))[:k]


def kmv_overlap(ds_a, col_a: str, ds_b, col_b: str, *, k: int = 256):
    """Key-set overlap between two tables via KMV (bottom-k) sketches:
    jaccard_est = |bottom-k(A ∪ B) ∩ A ∩ B| / |bottom-k(A ∪ B)|.
    Because a union-bottom-k hash h is in A iff h is in bottom-k(A)
    (h <= the k-th smallest of the union <= the k-th smallest of A),
    the estimate needs only the two k-hash sketches — the 100 TB way
    to ask "how much do these key spaces overlap" without a shuffle
    join.  Deterministic (md5), so the whole row is oracle-exact; the
    ESTIMATE's accuracy vs true Jaccard is pinned in tests."""
    ka = _kmv_bottom_k(ds_a, col_a, k=k)
    kb = _kmv_bottom_k(ds_b, col_b, k=k)
    ku = sorted(set(ka) | set(kb))[:k]
    sa, sb = set(ka), set(kb)
    n_common = sum(1 for h in ku if h in sa and h in sb)
    k_union = len(ku)
    return pa.table({
        "k_union": pa.array([k_union], pa.int64()),
        "n_common": pa.array([n_common], pa.int64()),
        "jaccard_est": pa.array(
            [n_common / k_union if k_union else None], pa.float64()),
    })


def fd_profile(ds, pairs: Sequence[Sequence[str]]):
    """Functional-dependency MINING over candidate (determinant ->
    dependent) column pairs: for each pair, how many determinant groups
    exist, how many violate the FD (>1 distinct non-null dependent),
    and the worst group's distinct-dependent count.  Two bounded
    shuffles per pair: distinct (det, dep) pairs, then distinct-dep
    counts per det reduced by per-batch partials into ONE global row —
    the n_groups-sized intermediate never hits the driver."""
    from ray.data.aggregate import Count, Max, Sum

    out = []
    for det, dep in pairs:
        def drop_null_dep(t: pa.Table, _dep=dep) -> pa.Table:
            return t.filter(pc.is_valid(t.column(_dep)))

        pair_distinct = (
            ds.select_columns([det, dep])
            .map_batches(drop_null_dep, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby([det, dep]).aggregate(Count(alias_name="_c"))
        )
        per_det = pair_distinct.groupby(det).aggregate(
            Count(alias_name="nd"))

        def partial(t: pa.Table) -> pa.Table:
            nd = t.column("nd").to_numpy(zero_copy_only=False)
            return pa.table({
                "g": pa.array([len(nd)], pa.int64()),
                "v": pa.array([int((nd > 1).sum())], pa.int64()),
                "m": pa.array([int(nd.max()) if len(nd) else 0], pa.int64()),
            })

        red = per_det.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).aggregate(Sum("g", alias_name="n_groups"),
                    Sum("v", alias_name="n_violating"),
                    Max("m", alias_name="max_dep"))
        out.append({
            "determinant": det, "dependent": dep,
            "n_groups": int(red["n_groups"] or 0),
            "n_violating": int(red["n_violating"] or 0),
            "max_dep": int(red["max_dep"] or 0),
        })
    return pa.table({
        "determinant": pa.array([r["determinant"] for r in out], pa.string()),
        "dependent": pa.array([r["dependent"] for r in out], pa.string()),
        "n_groups": pa.array([r["n_groups"] for r in out], pa.int64()),
        "n_violating": pa.array([r["n_violating"] for r in out], pa.int64()),
        "max_dep": pa.array([r["max_dep"] for r in out], pa.int64()),
    })


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


def corr_matrix(ds, cols: Sequence[str]):
    """Pairwise Pearson correlations over k numeric columns in ONE
    pass: each batch reduces to a single row of sufficient statistics
    (n, k sums, k(k+1)/2 upper-triangle cross-products — vectorized
    ``X.T @ X``), the global ``Sum`` merge moves one short vector per
    block, and a closed-form finalize emits the (x, y, corr) pairs.
    Same combiner shape as ``window.grouped_corr``, lifted to the full
    k×k matrix.

    Nulls are deleted PAIRWISE (SQL ``corr(x, y)`` semantics: a row is
    skipped only for the pairs where x or y is null, not for the whole
    matrix), via three k×k validity-mask GEMMs per batch —
    ``N = V'V`` (both-valid counts), ``S = Xz'V`` (``S[i,j]`` = sum of
    x_i over the (i,j)-valid rows), ``Q = (Xz²)'V`` (same for x_i²)
    where ``V`` is the 0/1 validity matrix and ``Xz`` has nulls zeroed.

    Output: one row per unordered pair (x, y, corr), corr rounded to
    6 dp; null when either column has zero variance on the pair's
    valid rows."""
    from ray.data.aggregate import Sum

    cols = list(cols)
    k = len(cols)
    iu = np.triu_indices(k)

    def partial(batch: pa.Table) -> pa.Table:
        X = np.column_stack([
            batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            for c in cols
        ])
        V = (~np.isnan(X)).astype(np.float64)
        Xz = np.where(np.isnan(X), 0.0, X)
        N = V.T @ V
        S = Xz.T @ V
        Q = (Xz * Xz).T @ V
        XX = (Xz.T @ Xz)[iu]
        out = {}
        for i in range(k):
            for j in range(k):
                out[f"n{i}_{j}"] = pa.array([float(N[i, j])])
                out[f"s{i}_{j}"] = pa.array([float(S[i, j])])
                out[f"q{i}_{j}"] = pa.array([float(Q[i, j])])
        for idx in range(len(iu[0])):
            out[f"x{idx}"] = pa.array([float(XX[idx])])
        return pa.table(out)

    agg_cols = ([f"{p}{i}_{j}" for p in ("n", "s", "q")
                 for i in range(k) for j in range(k)]
                + [f"x{i}" for i in range(len(iu[0]))])
    merged = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(*[Sum(c, alias_name=c) for c in agg_cols])

    xx = np.zeros((k, k))
    xx[iu] = [merged[f"x{i}"] for i in range(len(iu[0]))]
    xx = xx + xx.T - np.diag(np.diag(xx))
    xs, ys, cs = [], [], []
    for i in range(k):
        for j in range(i + 1, k):
            n = merged[f"n{i}_{j}"]
            si, sj = merged[f"s{i}_{j}"], merged[f"s{j}_{i}"]
            qi, qj = merged[f"q{i}_{j}"], merged[f"q{j}_{i}"]
            vx = n * qi - si * si
            vy = n * qj - sj * sj
            if n > 1 and vx > 0 and vy > 0:
                r = round((n * xx[i, j] - si * sj)
                          / float(np.sqrt(vx * vy)), 6)
            else:
                r = None
            xs.append(cols[i]); ys.append(cols[j]); cs.append(r)
    return pa.table({"x": pa.array(xs), "y": pa.array(ys),
                     "corr": pa.array(cs, pa.float64())})


def quantile_histogram(ds, col: str, *, n_bins: int = 10):
    """Equi-DEPTH histogram: bin edges are the global
    ``i/n_bins``-quantiles (exact, linear interpolation ==
    ``quantile_cont``), bin id = number of edges <= value
    (``searchsorted(side='right')``), counts per bin from per-batch
    bincount partials.

    Pass 1 computes the 9 (for deciles) exact edges by collecting the
    column into ONE kernel — the documented exact/verify path; the
    scale path for the edges is the mergeable t-digest sketch
    (functions/aggregates.py :: TDigestQuantile).  Edges are rounded
    to 6 dp on both engines before binning so boundary rows land
    identically.  Pass 2 streams.

    Output: (bin, n)."""
    from ray.data.aggregate import Sum

    def edges_kernel(group: pa.Table) -> pa.Table:
        v = group.column(col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        v = v[~np.isnan(v)]
        qs = np.arange(1, n_bins) / n_bins
        e = np.round(np.quantile(v, qs), 6) if len(v) else np.full(
            n_bins - 1, np.nan)
        return pa.table({"edge": pa.array(e)})

    def tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "_k": pa.array(np.zeros(batch.num_rows, dtype=np.int64)),
            col: batch.column(col),
        })

    edges_t = ds.select_columns([col]).map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("_k").map_groups(edges_kernel, batch_format="pyarrow")
    batches = list(edges_t.iter_batches(batch_format="pyarrow"))
    edges = (pa.concat_tables(batches).column("edge")
             .to_numpy(zero_copy_only=False) if batches
             else np.array([]))

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        v = v[~np.isnan(v)]
        b = np.searchsorted(edges, v, side="right")
        cnt = np.bincount(b, minlength=n_bins)
        nz = np.flatnonzero(cnt)
        return pa.table({"bin": pa.array(nz, pa.int64()),
                         "n": pa.array(cnt[nz], pa.int64())})

    return ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("bin").aggregate(Sum("n", alias_name="n"))


def key_skew_report(ds, col: str, *, top: int = 10):
    """Shuffle-planning skew diagnostic for a prospective partition
    key: distinct-key count, total rows, the heaviest key's share,
    the top-``top`` keys' combined share, and the normalized Shannon
    entropy of the key distribution (1.0 = perfectly uniform).  This is
    the measurement that decides whether a key needs salting
    (stages/salting.py) before a groupby at scale.

    Plan: one ``groupby(col).count()`` (bounded by the key cardinality)
    → single-block finalize.  Output: ONE row (n_keys, n_rows,
    top1_share, topk_share, entropy) with shares/entropy rounded to
    6 dp."""
    from ray.data.aggregate import Count

    counts = ds.select_columns([col]).groupby(col).aggregate(
        Count(alias_name="n"))

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "n_keys": pa.array([], pa.int64()),
                "n_rows": pa.array([], pa.int64()),
                "top1_share": pa.array([], pa.float64()),
                "topk_share": pa.array([], pa.float64()),
                "entropy": pa.array([], pa.float64()),
            })
        ni = np.sort(t.column("n").to_numpy(zero_copy_only=False).astype(
            np.int64))[::-1]
        toti = int(ni.sum())
        tot = float(toti)
        p = ni / tot
        k = len(ni)
        ent = float(-(p * np.log(p)).sum() / np.log(k)) if k > 1 else 1.0
        # shares: ONE exact integer-sum / total division (mirrors the
        # SQL `sum(n)/tot` association bitwise); no query-side rounding
        # on the exact quotients — Python round (half-even) vs SQL
        # round (half-away) split on exact 6dp halves.  Entropy keeps
        # the 6dp pin: its log-sum association genuinely differs.
        return pa.table({
            "n_keys": pa.array([k], pa.int64()),
            "n_rows": pa.array([toti], pa.int64()),
            "top1_share": pa.array([float(ni[0]) / tot]),
            "topk_share": pa.array([float(ni[:top].sum()) / tot]),
            "entropy": pa.array([round(ent, 6)]),
        })

    return counts.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def cardinality_profile(ds, cols: Sequence[str]):
    """EXACT distinct count per column, all columns in ONE pass:
    per-batch ``pc.unique`` per column emits tagged (col, value) partial
    rows, a single coarse-bucket shuffle on ``hash(col \\x01 value)``
    dedups within buckets vectorized, then a tiny per-col count merge.
    The approximate companion is the HLL sketch
    (functions/aggregates.py :: HllDistinct) — this is the exact path
    a schema audit runs once per dataset version."""
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..functions.aggregates import hash64

    cols = list(cols)

    def partial(batch: pa.Table) -> pa.Table:
        names, vals = [], []
        for c in cols:
            # drop_null: SQL count(DISTINCT col) ignores nulls
            u = pc.drop_null(pc.cast(pc.unique(batch.column(c)),
                                     pa.string()))
            names.append(np.full(len(u), c, dtype=object))
            vals.append(u.combine_chunks()
                        if isinstance(u, pa.ChunkedArray) else u)
        v = pa.concat_arrays(vals)
        col_arr = pa.array(np.concatenate(names).astype(str))
        tagged = pc.binary_join_element_wise(col_arr, v, "\x01")
        coarse = (hash64(tagged) % np.uint64(256)).astype(np.int64)
        return pa.table({"coarse": pa.array(coarse), "t": tagged,
                         "c": col_arr})

    def bucket_dedup(group: pa.Table) -> pa.Table:
        t = group.column("t").combine_chunks().to_numpy(
            zero_copy_only=False)
        c = group.column("c").combine_chunks().to_numpy(
            zero_copy_only=False)
        order = np.argsort(t, kind="stable")
        ts, cs = t[order], c[order]
        new = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            new[1:] = ts[1:] != ts[:-1]
        uniq_cols, counts = np.unique(cs[new], return_counts=True)
        return pa.table({"column": pa.array(uniq_cols.astype(str)),
                         "n_distinct": pa.array(counts.astype(np.int64))})

    out = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("coarse").map_groups(
        bucket_dedup, batch_format="pyarrow"
    ).groupby("column").aggregate(Sum("n_distinct",
                                      alias_name="n_distinct"))

    def fix(t: pa.Table) -> pa.Table:
        return pa.table({"column": t.column("column"),
                         "n_distinct": t.column("n_distinct").cast(
                             pa.int64())})

    return out.map_batches(fix, batch_format="pyarrow",
                           zero_copy_batch=True)


def sentinel_value_report(ds, cols: Sequence[str]):
    """Disguised-missing-value detector: per column, the most frequent
    NON-NULL value and its share of non-null rows — a dominant '0',
    '-1', 'N/A' or epoch date is the classic silently-encoded null.
    One pass: per-batch value_counts partials per column, a single
    coarse-bucket merge, then a per-column argmax (ties: smallest value
    string, so the verdict is deterministic across engines).
    Output: (column, top_value, n_top, n_nonnull, share)."""
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..functions.aggregates import hash64

    cols = list(cols)

    def partial(batch: pa.Table) -> pa.Table:
        names, vals, counts = [], [], []
        for c in cols:
            vc = pc.value_counts(pc.cast(batch.column(c), pa.string()))
            v = vc.field("values")
            n = vc.field("counts").cast(pa.int64())
            keep = pc.is_valid(v)
            v, n = v.filter(keep), n.filter(keep)
            names.append(np.full(len(v), c, dtype=object))
            vals.append(v)
            counts.append(n)
        v = pa.concat_arrays([x.combine_chunks()
                              if isinstance(x, pa.ChunkedArray) else x
                              for x in vals])
        col_arr = pa.array(np.concatenate(names).astype(str))
        n = pa.concat_arrays([x.combine_chunks()
                              if isinstance(x, pa.ChunkedArray) else x
                              for x in counts])
        tagged = pc.binary_join_element_wise(col_arr, v, "\x01")
        coarse = (hash64(tagged) % np.uint64(64)).astype(np.int64)
        return pa.table({"coarse": pa.array(coarse), "c": col_arr,
                         "v": v, "n": n})

    def bucket_merge(group: pa.Table) -> pa.Table:
        c = group.column("c").combine_chunks().to_numpy(
            zero_copy_only=False)
        v = group.column("v").combine_chunks().to_numpy(
            zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, c))
        c, v, n = c[order], v[order], n[order]
        new = np.ones(len(c), dtype=bool)
        if len(c) > 1:
            new[1:] = (c[1:] != c[:-1]) | (v[1:] != v[:-1])
        seg = np.cumsum(new) - 1
        tot = np.bincount(seg, weights=n).astype(np.int64)
        first = np.flatnonzero(new)
        return pa.table({"c": pa.array(c[first].astype(str)),
                         "v": pa.array(v[first].astype(str)),
                         "n": pa.array(tot)})

    merged = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("coarse").map_groups(bucket_merge, batch_format="pyarrow")

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"column": pa.array([], pa.string()),
                             "top_value": pa.array([], pa.string()),
                             "n_top": pa.array([], pa.int64()),
                             "n_nonnull": pa.array([], pa.int64()),
                             "share": pa.array([], pa.float64())})
        c = t.column("c").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        # per column: total and argmax by (count desc, value asc)
        order = np.lexsort((v, -n, c))
        cs, vs, ns = c[order], v[order], n[order]
        new = np.ones(len(cs), dtype=bool)
        if len(cs) > 1:
            new[1:] = cs[1:] != cs[:-1]
        seg = np.cumsum(new) - 1
        tot = np.bincount(seg, weights=ns).astype(np.int64)
        first = np.flatnonzero(new)
        return pa.table({
            "column": pa.array(cs[first].astype(str)),
            "top_value": pa.array(vs[first].astype(str)),
            "n_top": pa.array(ns[first]),
            "n_nonnull": pa.array(tot),
            "share": pa.array(ns[first] / tot),
        })

    return merged.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def benford_digits(ds, col: str):
    """Benford's-law first-digit audit over a positive numeric column
    (classic accounting/data-forgery screen): observed share of each
    leading decimal digit vs the Benford expectation log10(1 + 1/d).

    Rows with value < 1 or null are excluded (the leading SIGNIFICANT
    digit of sub-unit values needs a scale hunt; audits run on amounts).
    The digit is taken from the DECIMAL STRING of floor(value) — the
    same derivation the SQL oracle uses — so no float-log boundary can
    disagree between engines.

    Plan: per-batch ``pc.value_counts`` over the digit array → ONE
    ``groupby(digit)`` Sum of at most 9 partial rows per block →
    single-block finalize.  Output: one row per observed digit
    (digit, n, share, expected_share, excess), shares left unrounded
    (exact integer quotients; driver canon rounds both sides)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        arr = pc.cast(batch.column(col), pa.float64())
        arr = arr.filter(pc.and_kleene(pc.is_valid(arr),
                                       pc.greater_equal(arr, 1.0)))
        if len(arr) == 0:
            return pa.table({"digit": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        digits = pc.utf8_slice_codeunits(
            pc.cast(pc.cast(pc.floor(arr), pa.int64()), pa.string()), 0, 1)
        vc = pc.value_counts(digits)
        return pa.table({"digit": vc.field("values"),
                         "c": pc.cast(vc.field("counts"), pa.int64())})

    merged = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("digit")
        .aggregate(Sum("c", alias_name="n"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"digit": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "share": pa.array([], pa.float64()),
                             "expected_share": pa.array([], pa.float64()),
                             "excess": pa.array([], pa.float64())})
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column("digit").to_numpy(zero_copy_only=False).astype(str)
        tot = float(n.sum())
        share = n / tot
        expected = np.log10(1.0 + 1.0 / d.astype(np.float64))
        return pa.table({
            "digit": t.column("digit"),
            "n": t.column("n"),
            "share": pa.array(share),
            "expected_share": pa.array(expected),
            "excess": pa.array(share - expected),
        })

    return merged.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def group_entropy(ds, key_col: str, cat_col: str):
    """Shannon entropy (natural log) of a categorical distribution per
    key — behavioral-diversity profiling (e.g. how varied each user's
    event mix is; H = 0 means single-category).

    Fully distributed with NO per-group Python: the identity
    ``H = ln(n) - (Σ c·ln c) / n`` turns entropy into two Sum
    aggregates over the per-(key, cat) count table, so the plan is
    groupby(key, cat).count → vectorized c·ln c column → groupby(key)
    Sum — count vectors never collect anywhere.

    Null keys/categories are excluded (SQL two-level GROUP BY parity).
    Output: (key:str, n, n_cats, entropy round 6)."""
    from ray.data.aggregate import Count, Sum

    def drop_nulls(b: pa.Table) -> pa.Table:
        return b.filter(pc.and_kleene(pc.is_valid(b.column(key_col)),
                                      pc.is_valid(b.column(cat_col))))

    counts = (
        ds.select_columns([key_col, cat_col])
        .map_batches(drop_nulls, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby([key_col, cat_col])
        .aggregate(Count(alias_name="c"))
    )

    def add_clc(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            key_col: t.column(key_col),
            "c": t.column("c"),
            "clc": pa.array(c * np.log(c)),
        })

    merged = (
        counts.map_batches(add_clc, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby(key_col)
        .aggregate(Sum("c", alias_name="n"),
                   Count(alias_name="n_cats"),
                   Sum("clc", alias_name="slc"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"key": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "n_cats": pa.array([], pa.int64()),
                             "entropy": pa.array([], pa.float64())})
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        slc = t.column("slc").to_numpy(zero_copy_only=False)
        ent = np.round(np.log(n) - slc / n, 6)
        return pa.table({
            "key": pc.cast(t.column(key_col), pa.string()),
            "n": pc.cast(t.column("n"), pa.int64()),
            "n_cats": pc.cast(t.column("n_cats"), pa.int64()),
            "entropy": pa.array(ent),
        })

    return merged.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True)


def null_share_daily(ds, ts_col: str, cols: Sequence[str]):
    """Completeness DRIFT: per epoch day, each column's null count and
    share — catches "the upstream feed dropped a field on Tuesday"
    where a whole-table CompletenessCheck only sees the average.

    Per-batch combiner: one (day, rows, nulls_per_col) partial row per
    distinct day per block (vectorized dictionary codes + bincount),
    then ONE tiny groupby(day) sum.  Output long:
    (day int64, col, n_rows, n_null, null_share).
    """
    from ray.data.aggregate import Sum

    cols = list(cols)

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col)
        ts = ts.combine_chunks() if isinstance(ts, pa.ChunkedArray) else ts
        ok = pc.is_valid(ts)
        t = t.filter(ok)
        ts = ts.filter(ok)
        us = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
        day = pc.cast(pc.floor(pc.divide(pc.cast(us, pa.float64()),
                                         86400e6)), pa.int64())
        enc = pc.dictionary_encode(day)
        codes = np.asarray(enc.indices, dtype=np.int64)
        n_days = len(enc.dictionary)
        out = {"day": enc.dictionary,
               "rows": pa.array(np.bincount(codes, minlength=n_days),
                                pa.int64())}
        for c in cols:
            isnull = pc.is_null(t.column(c)).to_numpy(zero_copy_only=False)
            out[f"nulls_{c}"] = pa.array(
                np.bincount(codes, weights=isnull,
                            minlength=n_days).astype(np.int64), pa.int64())
        return pa.table(out)

    sums = (
        ds.select_columns([ts_col] + cols)
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .aggregate(Sum("rows", alias_name="rows"),
                   *[Sum(f"nulls_{c}", alias_name=f"nulls_{c}")
                     for c in cols])
    )

    def widen(t: pa.Table) -> pa.Table:
        pieces = []
        for c in cols:
            n_null = t.column(f"nulls_{c}")
            rows = t.column("rows")
            pieces.append(pa.table({
                "day": t.column("day"),
                "col": pa.array([c] * t.num_rows, pa.string()),
                "n_rows": rows,
                "n_null": n_null,
                "null_share": pc.divide(pc.cast(n_null, pa.float64()),
                                        pc.cast(rows, pa.float64())),
            }))
        return pa.concat_tables(pieces)

    return sums.map_batches(widen, batch_format="pyarrow",
                            zero_copy_batch=True)


def group_hhi(ds, key_col: str, cat_col: str):
    """Herfindahl–Hirschman concentration index of a categorical mix
    per key: HHI = Σ_i (c_i/n)² — 1.0 means a key does only one thing,
    1/k means a uniform spread over k categories.  The concentration
    complement to :func:`group_entropy` (antitrust-style "is this
    user/supplier dominated by one category?" screen).

    Same fully-distributed shape as group_entropy: groupby(key, cat)
    count → per-cell c² column → groupby(key) Sum — the only exchanges
    move count rows, and the final division Σc²/n² is one exact
    integer→double op on both engines (no rounding needed, emitted at
    6 dp anyway for uniformity).

    Null keys/categories are excluded.  Output: (key, n, n_cats, hhi).
    """
    from ray.data.aggregate import Count, Sum

    def drop_nulls(b: pa.Table) -> pa.Table:
        return b.filter(pc.and_kleene(pc.is_valid(b.column(key_col)),
                                      pc.is_valid(b.column(cat_col))))

    cnt = "__hhi_c"                      # collision-proof vs user columns
    counts = (
        ds.select_columns([key_col, cat_col])
        .map_batches(drop_nulls, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby([key_col, cat_col])
        .aggregate(Count(alias_name=cnt))
    )

    def add_c2(t: pa.Table) -> pa.Table:
        c = t.column(cnt).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            key_col: t.column(key_col),
            cnt: t.column(cnt),
            "c2": pa.array(c * c),
        })

    merged = (
        counts.map_batches(add_c2, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby(key_col)
        .aggregate(Sum(cnt, alias_name="n"),
                   Count(alias_name="n_cats"),
                   Sum("c2", alias_name="sc2"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({key_col: pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "n_cats": pa.array([], pa.int64()),
                             "hhi": pa.array([], pa.float64())})
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        sc2 = t.column("sc2").to_numpy(zero_copy_only=False).astype(
            np.float64)
        return pa.table({
            key_col: t.column(key_col),
            "n": pc.cast(t.column("n"), pa.int64()),
            "n_cats": pc.cast(t.column("n_cats"), pa.int64()),
            # raw IEEE quotient, NOT rounded: sc2/n² is an exact
            # rational and can land exactly on a 6-dp half, where
            # np.round (half-even) and SQL round (half-away) disagree
            # (fuzz seed 777: 1338/6400 = .2090625).  Both engines do
            # the same single double division -> bitwise identical.
            "hhi": pa.array(sc2 / (n * n)),
        })

    return merged.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True)


def semantic_type_profile(ds, rules):
    """Semantic-type detection battery: for each (column, type-name,
    regex) rule, the share of non-null values matching — the profiling
    pass that discovers "this string column is actually phone numbers /
    brand codes / ISO dates" before schema tightening.

    ``rules`` is a sequence of (col, sem_type, pattern); patterns are
    RE2 SEARCH semantics (use ^$ anchors for full-match), identical to
    DuckDB's regexp_matches.  One streaming pass emits one partial row
    per rule per batch (n_match, n_nonnull); a tiny groupby sums them.
    Output: (col_name, sem_type, n_match, n_nonnull, share 6 dp).
    """
    from ray.data.aggregate import Sum

    cols = list(dict.fromkeys(c for c, _, _ in rules))

    def partial(batch: pa.Table) -> pa.Table:
        names, types, nm, nn = [], [], [], []
        for col, sem, pat in rules:
            v = batch.column(col)
            valid = pc.is_valid(v)
            n_valid = int(pc.sum(pc.cast(valid, pa.int64())).as_py() or 0)
            hit = pc.match_substring_regex(
                pc.cast(v, pa.string()), pat)
            n_hit = int(pc.sum(pc.cast(
                pc.and_kleene(hit, valid), pa.int64())).as_py() or 0)
            names.append(col)
            types.append(sem)
            nm.append(n_hit)
            nn.append(n_valid)
        return pa.table({
            "col_name": pa.array(names, pa.string()),
            "sem_type": pa.array(types, pa.string()),
            "m": pa.array(nm, pa.int64()),
            "nn": pa.array(nn, pa.int64()),
        })

    merged = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(["col_name", "sem_type"]).aggregate(
        Sum("m", alias_name="n_match"), Sum("nn", alias_name="n_nonnull"))

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"col_name": pa.array([], pa.string()),
                             "sem_type": pa.array([], pa.string()),
                             "n_match": pa.array([], pa.int64()),
                             "n_nonnull": pa.array([], pa.int64()),
                             "share": pa.array([], pa.float64())})
        m = t.column("n_match").to_numpy(zero_copy_only=False).astype(
            np.float64)
        nn = t.column("n_nonnull").to_numpy(zero_copy_only=False).astype(
            np.float64)
        # raw count quotient (see group_hhi note on rounding ties)
        share = np.where(nn > 0, m / np.maximum(nn, 1), np.nan)
        return pa.table({
            "col_name": t.column("col_name"),
            "sem_type": t.column("sem_type"),
            "n_match": pc.cast(t.column("n_match"), pa.int64()),
            "n_nonnull": pc.cast(t.column("n_nonnull"), pa.int64()),
            "share": pa.array(share, pa.float64(),
                              mask=~(nn > 0)),
        })

    return merged.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True)


def null_cooccurrence(ds, cols: Sequence[str]):
    """Missingness co-occurrence audit: for every ordered column pair
    (x, y), how often the two are null TOGETHER — systematic joint
    missingness (sensor down, join fan-in failure) looks very different
    from independent random nulls, and imputation strategies diverge on
    it.

    One streaming pass emits k·(k−1)/2 partial rows per batch (pure
    boolean mask arithmetic, no data movement); a tiny groupby sums.
    Output per pair: (x, y, n_rows, nx_null, ny_null, n_both,
    jaccard 6 dp) where jaccard = |both| / |either| (NULL when neither
    column has any nulls).
    """
    from ray.data.aggregate import Sum

    cols = list(cols)

    def partial(batch: pa.Table) -> pa.Table:
        masks = {c: pc.is_null(batch.column(c)).to_numpy(
            zero_copy_only=False) for c in cols}
        xs, ys, nx, ny, nb, nr = [], [], [], [], [], []
        for i in range(len(cols)):
            for j in range(i + 1, len(cols)):
                x, y = cols[i], cols[j]
                xs.append(x)
                ys.append(y)
                nx.append(int(masks[x].sum()))
                ny.append(int(masks[y].sum()))
                nb.append(int((masks[x] & masks[y]).sum()))
                nr.append(batch.num_rows)
        return pa.table({
            "x": pa.array(xs, pa.string()), "y": pa.array(ys, pa.string()),
            "nx": pa.array(nx, pa.int64()), "ny": pa.array(ny, pa.int64()),
            "nb": pa.array(nb, pa.int64()), "nr": pa.array(nr, pa.int64()),
        })

    merged = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(["x", "y"]).aggregate(
        Sum("nr", alias_name="n_rows"), Sum("nx", alias_name="nx_null"),
        Sum("ny", alias_name="ny_null"), Sum("nb", alias_name="n_both"))

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"x": pa.array([], pa.string()),
                             "y": pa.array([], pa.string()),
                             "n_rows": pa.array([], pa.int64()),
                             "nx_null": pa.array([], pa.int64()),
                             "ny_null": pa.array([], pa.int64()),
                             "n_both": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        nx = t.column("nx_null").to_numpy(zero_copy_only=False).astype(
            np.float64)
        ny = t.column("ny_null").to_numpy(zero_copy_only=False).astype(
            np.float64)
        nb = t.column("n_both").to_numpy(zero_copy_only=False).astype(
            np.float64)
        either = nx + ny - nb
        # raw count quotient (see group_hhi note on rounding ties)
        jac = np.where(either > 0, nb / np.maximum(either, 1), np.nan)
        return pa.table({
            "x": t.column("x"), "y": t.column("y"),
            "n_rows": pc.cast(t.column("n_rows"), pa.int64()),
            "nx_null": pc.cast(t.column("nx_null"), pa.int64()),
            "ny_null": pc.cast(t.column("ny_null"), pa.int64()),
            "n_both": pc.cast(t.column("n_both"), pa.int64()),
            "jaccard": pa.array(jac, pa.float64(), mask=~(either > 0)),
        })

    return merged.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True)


def top_share(ds, *, key_col: str, value_col: str, frac: float = 0.1,
              decimals: int = 2, n_buckets: int = 64):
    """Concentration head-count audit: what share of the total does the
    top ``frac`` of keys capture (revenue share of the top-10%
    customers, token share of the top-1% domains)?  The single-number
    complement of the per-group Gini.

    Scale plan: per-key integer-unit sums (one groupby), then the
    rank-``ceil(frac·N)`` threshold is found WITHOUT a global sort via
    a range-bucket histogram over the per-key sums — only the boundary
    bucket's values are pulled to the driver (≈ N/n_buckets keys,
    documented assumption), everything else stays as per-bucket
    (count, sum) pairs.  Tie-safe: tied threshold values contribute the
    same sum regardless of which tied keys are counted, so the result
    matches any row_number() tie-break.

    Output: one row (n_keys, n_top, top_share 6 dp).
    """
    from ray.data.aggregate import Count, Max, Min, Sum

    scale = float(10 ** decimals)

    def to_cents(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_kleene(
            pc.is_valid(batch.column(key_col)),
            pc.is_valid(batch.column(value_col))))
        v = pc.cast(pc.round(pc.multiply(pc.cast(
            batch.column(value_col), pa.float64()), scale)), pa.int64())
        return pa.table({key_col: batch.column(key_col), "cents": v})

    per_key = ds.select_columns([key_col, value_col]).map_batches(
        to_cents, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(key_col).aggregate(Sum("cents", alias_name="cents")
                                 ).materialize()

    stats = per_key.aggregate(Count(alias_name="n"),
                              Sum("cents", alias_name="total"),
                              Min("cents", alias_name="lo"),
                              Max("cents", alias_name="hi"))
    n_keys = int(stats["n"] or 0)
    if n_keys == 0:
        return pa.table({"n_keys": pa.array([0], pa.int64()),
                         "n_top": pa.array([0], pa.int64()),
                         "top_share": pa.array([None], pa.float64())})
    total = int(stats["total"])
    lo, hi = int(stats["lo"]), int(stats["hi"])
    topn = int(np.ceil(frac * n_keys))
    width = max((hi - lo + 1) / n_buckets, 1e-300)

    def bucketize(batch: pa.Table) -> pa.Table:
        c = batch.column("cents").to_numpy(zero_copy_only=False)
        b = np.minimum(((c - lo) / width).astype(np.int64), n_buckets - 1)
        n = np.bincount(b, minlength=n_buckets)
        s = np.zeros(n_buckets, dtype=np.int64)
        np.add.at(s, b, c)
        keep = np.flatnonzero(n)
        return pa.table({"b": pa.array(keep, pa.int64()),
                         "bn": pa.array(n[keep].astype(np.int64)),
                         "bs": pa.array(s[keep])})

    hist_ds = per_key.map_batches(bucketize, batch_format="pyarrow",
                                  zero_copy_batch=True).groupby(
        "b").aggregate(Sum("bn", alias_name="bn"),
                       Sum("bs", alias_name="bs"))
    hist = pa.concat_tables(list(
        hist_ds.iter_batches(batch_format="pyarrow", batch_size=65536)))
    hb = hist.column("b").to_numpy(zero_copy_only=False)
    hn = hist.column("bn").to_numpy(zero_copy_only=False)
    hs = hist.column("bs").to_numpy(zero_copy_only=False)
    order = np.argsort(-hb)                       # walk from the top bucket
    hb, hn, hs = hb[order], hn[order], hs[order]
    cum = np.cumsum(hn)
    i = int(np.searchsorted(cum, topn))           # boundary bucket index
    above_cnt = int(cum[i - 1]) if i > 0 else 0
    above_sum = int(hs[:i].sum())
    remaining = topn - above_cnt
    part = 0
    if remaining > 0:
        b_star = int(hb[i])

        def in_bucket(batch: pa.Table) -> pa.Table:
            c = batch.column("cents").to_numpy(zero_copy_only=False)
            bb = np.minimum(((c - lo) / width).astype(np.int64),
                            n_buckets - 1)
            return pa.table({"cents": pa.array(c[bb == b_star])})

        vals = pa.concat_tables(list(
            per_key.map_batches(in_bucket, batch_format="pyarrow",
                                zero_copy_batch=True)
            .iter_batches(batch_format="pyarrow", batch_size=65536)
        )).column("cents").to_numpy(zero_copy_only=False)
        vals = np.sort(vals)[::-1]
        part = int(vals[:remaining].sum())
    # raw quotient of exact cent counts (see group_hhi note on
    # 6-dp rounding ties)
    share = (above_sum + part) / total
    return pa.table({"n_keys": pa.array([n_keys], pa.int64()),
                     "n_top": pa.array([topn], pa.int64()),
                     "top_share": pa.array([share], pa.float64())})


def key_candidates(ds, combos):
    """Candidate-key discovery: for each column combination, how close
    it comes to uniquely identifying rows — (n_rows, n_distinct,
    dup_rows, is_key) — the schema-inference pass run before declaring
    primary keys or dedup fingerprints.

    ``combos`` is a sequence of column lists.  Rows with a null in any
    combo column are excluded for that combo (a SQL-mirrorable
    contract).  Per batch, each combo's values are pipe-joined into one
    string key and DEDUPED LOCALLY, so the single (combo, key) exchange
    moves per-block distinct values, not rows; distinct counting is one
    two-level groupby, row counting a one-row-per-batch partial.

    Output: (combo:str, n_rows, n_distinct, dup_rows, is_key 0/1).
    """
    from ray.data.aggregate import Count, Sum

    combos = [list(c) for c in combos]
    names = ["+".join(c) for c in combos]
    cols = list(dict.fromkeys(c for combo in combos for c in combo))

    # the "k" channel carries BOTH distinct keys (prefixed "v|") and
    # per-batch row-count sentinels (literal "#rows") — Ray's sort-based
    # shuffle cannot order null string keys, so a prefix replaces null
    def partial(batch: pa.Table) -> pa.Table:
        out_combo, out_key = [], []
        rows_n = []
        for name, combo in zip(names, combos):
            valid = None
            for c in combo:
                vc = pc.is_valid(batch.column(c))
                valid = vc if valid is None else pc.and_(valid, vc)
            sub = batch.filter(valid)
            parts = [pc.cast(sub.column(c), pa.string()) for c in combo]
            joined = parts[0] if len(parts) == 1 else \
                pc.binary_join_element_wise(*parts, "|")
            uniq = pc.unique(pc.binary_join_element_wise(
                pa.array(["v"] * len(joined) if not isinstance(
                    joined, pa.ChunkedArray) else ["v"] * joined.length(),
                    pa.string()), joined, "|"))
            out_combo.extend([name] * len(uniq))
            out_key.append(uniq)
            rows_n.append(sub.num_rows)
        keys = pa.concat_arrays([u.combine_chunks()
                                 if isinstance(u, pa.ChunkedArray) else u
                                 for u in out_key]) if out_key else \
            pa.array([], pa.string())
        t_keys = pa.table({"combo": pa.array(out_combo, pa.string()),
                           "k": keys,
                           "_rows": pa.array([0] * len(keys), pa.int64())})
        t_rows = pa.table({"combo": pa.array(names, pa.string()),
                           "k": pa.array(["#rows"] * len(names),
                                         pa.string()),
                           "_rows": pa.array(rows_n, pa.int64())})
        return pa.concat_tables([t_keys, t_rows])

    tagged = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    lvl1 = tagged.groupby(["combo", "k"]).aggregate(
        Sum("_rows", alias_name="rows_part"))

    def split(t: pa.Table) -> pa.Table:
        is_key = pc.starts_with(t.column("k"), "v|")
        return pa.table({
            "combo": t.column("combo"),
            "d": pc.cast(is_key, pa.int64()),
            "r": pc.if_else(is_key, pa.scalar(0, pa.int64()),
                            pc.cast(t.column("rows_part"), pa.int64())),
        })

    merged = lvl1.map_batches(split, batch_format="pyarrow",
                              zero_copy_batch=True).groupby(
        "combo").aggregate(Sum("d", alias_name="n_distinct"),
                           Sum("r", alias_name="n_rows"))

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"combo": pa.array([], pa.string()),
                             "n_rows": z, "n_distinct": z,
                             "dup_rows": z, "is_key": z})
        nr = t.column("n_rows").to_numpy(zero_copy_only=False).astype(
            np.int64)
        nd = t.column("n_distinct").to_numpy(zero_copy_only=False).astype(
            np.int64)
        return pa.table({
            "combo": t.column("combo"),
            "n_rows": pa.array(nr),
            "n_distinct": pa.array(nd),
            "dup_rows": pa.array(nr - nd),
            "is_key": pa.array((nr == nd).astype(np.int64)),
        })

    return merged.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True)


def adjusted_residuals(ds, a_col: str, b_col: str):
    """Chi-square ADJUSTED standardized residuals per contingency cell
    (Agresti): r = (obs - exp) / sqrt(exp·(1-p_row)·(1-p_col)) — the
    per-cell attribution that says WHICH cells drive an association,
    where the aggregate chi-square statistic (``chi2_flag_status``)
    only says THAT one exists.  |r| > 2 flags a cell at ~5%.

    Plan: per-batch vectorized cell counting (lexsort + segment
    bincount — same partial shape as the chi-square screen), then a
    single-block finalize computing row/column margins with bincount.
    Shuffle payload is O(distinct (a,b) cells) per batch, never rows.
    Null keys excluded on both engines.  Output one row per observed
    cell: (a, b, n, expected, stdres), unrounded (driver canon rounds).
    """

    def cells(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col)
        b = batch.column(b_col)
        a = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
        b = b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b
        ok = pc.and_(pc.is_valid(a), pc.is_valid(b))
        a, b = a.filter(ok), b.filter(ok)
        ea, eb = pc.dictionary_encode(a), pc.dictionary_encode(b)
        ca = np.asarray(ea.indices, dtype=np.int64)
        cb = np.asarray(eb.indices, dtype=np.int64)
        m = len(eb.dictionary)
        joint = np.bincount(ca * m + cb,
                            minlength=len(ea.dictionary) * m)
        nz = np.flatnonzero(joint)
        return pa.table({
            "a": ea.dictionary.take(pa.array(nz // m)),
            "b": eb.dictionary.take(pa.array(nz % m)),
            "c": pa.array(joint[nz].astype(np.int64)),
        })

    partials = ds.select_columns([a_col, b_col]).map_batches(
        cells, batch_format="pyarrow", zero_copy_batch=True)

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("a", pa.string()), ("b", pa.string()),
                            ("n", pa.int64()), ("expected", pa.float64()),
                            ("stdres", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        ea = pc.dictionary_encode(t.column("a").combine_chunks())
        eb = pc.dictionary_encode(t.column("b").combine_chunks())
        ca = np.asarray(ea.indices, dtype=np.int64)
        cb = np.asarray(eb.indices, dtype=np.int64)
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        m = len(eb.dictionary)
        joint = np.bincount(ca * m + cb, weights=c,
                            minlength=len(ea.dictionary) * m).astype(
            np.int64)
        nz = np.flatnonzero(joint)
        ia, ib, n = nz // m, nz % m, joint[nz]
        tot = float(n.sum())
        rn = np.bincount(ia, weights=n,
                         minlength=len(ea.dictionary))
        cn = np.bincount(ib, weights=n, minlength=m)
        exp = rn[ia] * cn[ib] / tot
        den = np.sqrt(exp * (1.0 - rn[ia] / tot) * (1.0 - cn[ib] / tot))
        with np.errstate(invalid="ignore", divide="ignore"):
            r = (n - exp) / den
        bad = ~np.isfinite(r)
        return pa.table({
            "a": pc.cast(ea.dictionary.take(pa.array(ia)), pa.string()),
            "b": pc.cast(eb.dictionary.take(pa.array(ib)), pa.string()),
            "n": pa.array(n),
            "expected": pa.array(exp),
            "stdres": pa.array(r, mask=bad),
        })

    return partials.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def trailing_digit_uniformity(ds, col: str, *, modulus: int = 100):
    """Trailing-digit (cents) uniformity audit over a 2-dp money column
    — the fabrication screen complementary to Benford's law: leading
    digits follow Benford, but the LAST two digits of organic amounts
    should be near-uniform; spikes at .00/.99/.50 reveal manual entry
    or rounding fraud (Nigrini's number-duplication test).

    Plan: per-batch ``value_counts`` over ``round(x·100) % modulus``
    (≤``modulus`` partial rows per batch) → ONE tiny groupby Sum →
    single-block finalize attaching the uniform expectation and the
    per-cell chi-square contribution.  Output: (cents, n, share,
    cell_chi2) — sum(cell_chi2) is the statistic vs χ²(modulus-1).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        arr = pc.cast(batch.column(col), pa.float64())
        arr = arr.filter(pc.is_valid(arr))
        cents = pc.cast(pc.round(pc.multiply(arr, 100.0)), pa.int64())
        cents = pc.subtract(
            cents, pc.multiply(pc.floor(pc.divide(
                pc.cast(cents, pa.float64()), float(modulus))),
                float(modulus)))
        vc = pc.value_counts(pc.cast(cents, pa.int64()))
        return pa.table({"cents": vc.field("values"),
                         "c": pc.cast(vc.field("counts"), pa.int64())})

    merged = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cents")
        .aggregate(Sum("c", alias_name="n"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("cents", pa.int64()), ("n", pa.int64()),
                              ("share", pa.float64()),
                              ("cell_chi2", pa.float64())]).empty_table()
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        tot = float(n.sum())
        exp = tot / modulus
        return pa.table({
            "cents": pc.cast(t.column("cents"), pa.int64()),
            "n": t.column("n"),
            "share": pa.array(n / tot),
            "cell_chi2": pa.array((n - exp) * (n - exp) / exp),
        })

    return merged.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def cochran_armitage(ds, cat_col: str, outcome_col: str, target,
                     *, score_prefix_chars: int = 1):
    """Cochran–Armitage trend test: is a binary rate monotonically
    drifting across ORDERED categories (e.g. failure rate across
    priority tiers)?  The chi-square screen treats categories as
    unordered and wastes power; CA weights them by score.

    Scores are parsed from the leading ``score_prefix_chars`` of the
    category string (TPC-H style '1-URGENT' → 1).  Closed form from
    per-category (n_i, r_i) count partials — one tiny groupby, data
    rows never shuffle:

        z = Σw_i·(r_i − p̄·n_i) / sqrt(p̄(1−p̄)·(Σw_i²n_i − (Σw_in_i)²/N))

    Output one row: (n, r, z).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        cat = batch.column(cat_col)
        cat = cat.combine_chunks() if isinstance(cat, pa.ChunkedArray) \
            else cat
        out = batch.column(outcome_col)
        out = out.combine_chunks() if isinstance(out, pa.ChunkedArray) \
            else out
        ok = pc.and_(pc.is_valid(cat), pc.is_valid(out))
        cat, out = cat.filter(ok), out.filter(ok)
        succ = pc.fill_null(pc.equal(out, target), False).to_numpy(
            zero_copy_only=False).astype(np.int64)
        enc = pc.dictionary_encode(cat)
        code = np.asarray(enc.indices, dtype=np.int64)
        m = len(enc.dictionary)
        return pa.table({
            "cat": pc.cast(enc.dictionary, pa.string()),
            "n": pa.array(np.bincount(code, minlength=m).astype(
                np.int64)),
            "r": pa.array(np.bincount(code, weights=succ,
                                      minlength=m).astype(np.int64)),
        })

    merged = (
        ds.select_columns([cat_col, outcome_col])
        .map_batches(partial, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("cat")
        .aggregate(Sum("n", alias_name="n"), Sum("r", alias_name="r"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("n", pa.int64()), ("r", pa.int64()),
                            ("z", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        cats = t.column("cat").to_numpy(zero_copy_only=False).astype(str)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        r = t.column("r").to_numpy(zero_copy_only=False).astype(np.int64)
        w = np.array([float(c[:score_prefix_chars]) for c in cats])
        N = int(n.sum())
        R = int(r.sum())
        p = R / N
        num = float((w * r).sum()) - p * float((w * n).sum())
        var = p * (1 - p) * (float((w * w * n).sum())
                             - float((w * n).sum()) ** 2 / N)
        z = num / np.sqrt(var) if var > 0 else None
        return pa.table({
            "n": pa.array([N], pa.int64()),
            "r": pa.array([R], pa.int64()),
            "z": pa.array([z], pa.float64()),
        })

    return merged.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def ddsketch_quantiles(ds, col: str, *, gamma: float = 1.02,
                       qs=(0.5, 0.9, 0.99)):
    """DDSketch quantile estimates (Masson et al., VLDB 2019) for a
    positive-valued column: log-gamma buckets ``ceil(ln x / ln gamma)``
    guarantee RELATIVE error <= (gamma-1)/(gamma+1) per quantile --
    unlike the t-digest, the bucket mapping is deterministic, so the
    estimate is bit-reproducible across engines and partitionings and
    ships with a full SQL oracle.

    One O(distinct buckets) shuffle (buckets are calendar-of-log-range
    bounded, ~log(max/min)/ln(gamma) rows), then a one-row-per-quantile
    finalize.  The bucket index rounds ln x/ln gamma to 9dp before
    ``ceil`` so a 1-ulp libm difference between engines cannot flip a
    boundary value into the neighboring bucket.

    Output: (q double, bucket int64, est double round-6) -- est =
    2 gamma^b / (gamma + 1), the bucket's midpoint in relative space.
    """
    import math

    from ray.data.aggregate import Sum

    lg = math.log(gamma)

    def buckets(t: pa.Table) -> pa.Table:
        x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[np.isfinite(x) & (x > 0)]
        b = np.ceil(np.round(np.log(x) / lg, 9)).astype(np.int64)
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(ub),
                         "n": pa.array(cnt.astype(np.int64))})

    agg = (
        ds.select_columns([col])
        .map_batches(buckets, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket").aggregate(Sum("n", alias_name="n"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        t = t.sort_by([("bucket", "ascending")])
        b = t.column("bucket").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        cum = np.cumsum(n)
        total = int(cum[-1]) if len(cum) else 0
        out_q, out_b, out_e = [], [], []
        for q in qs:
            if total == 0:
                out_q.append(float(q))
                out_b.append(None)
                out_e.append(None)
                continue
            r = max(1, math.ceil(q * total))
            i = int(np.searchsorted(cum, r))
            bb = int(b[i])
            out_q.append(float(q))
            out_b.append(bb)
            out_e.append(round(2.0 * gamma ** bb / (gamma + 1.0), 6))
        return pa.table({
            "q": pa.array(out_q, pa.float64()),
            "bucket": pa.array(out_b, pa.int64()),
            "est": pa.array(out_e, pa.float64()),
        })

    return agg.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def benford_second_digit(ds, col: str):
    """Benford second-digit audit (Nigrini's follow-up when the
    first-digit test passes): observed share of each SECOND decimal
    digit (0-9) of floor(value) vs the Benford expectation
    sum_d1 log10(1 + 1/(10 d1 + d2)) -- doctored numbers often keep a
    clean leading digit but a flat second digit.  The digit comes from
    the decimal STRING (values >= 10 only), so no float-log boundary
    can disagree between engines.

    O(10) shuffle of per-batch digit counts.  Output: (digit int64,
    n int64, share round-6, expected round-6, chi2_term round-6),
    digits ascending.
    """
    import math

    from ray.data.aggregate import Sum

    exp = [sum(math.log10(1.0 + 1.0 / (10 * d1 + d2))
               for d1 in range(1, 10)) for d2 in range(10)]

    def partials(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        v = v[np.isfinite(v) & (v >= 10)]
        iv = np.floor(v).astype(np.int64)
        d2 = np.array([int(str(x)[1]) for x in iv], dtype=np.int64)
        cnt = np.bincount(d2, minlength=10)
        return pa.table({
            "digit": pa.array(range(10), pa.int64()),
            "n": pa.array(cnt.astype(np.int64)),
        })

    agg = ds.select_columns([col]).map_batches(
        partials, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("digit").aggregate(Sum("n", alias_name="n"))

    def finalize(t: pa.Table) -> pa.Table:
        t = t.sort_by([("digit", "ascending")])
        d = t.column("digit").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.int64)
        total = int(n.sum())
        shares, exps, chis = [], [], []
        for di, ni in zip(d, n):
            e = exp[int(di)]
            shares.append(round6_half_up(ni / total) if total else None)
            exps.append(round(e, 6))
            chis.append(round((ni / total - e) ** 2 / e, 6)
                        if total else None)
        return pa.table({
            "digit": pa.array(d),
            "n": pa.array(n),
            "share": pa.array(shares, pa.float64()),
            "expected": pa.array(exps, pa.float64()),
            "chi2_term": pa.array(chis, pa.float64()),
        })

    return agg.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def null_pattern_census(ds, cols, *, k: int = 10):
    """Missingness PATTERN census: every row maps to the bitmask of
    which of ``cols`` are null, and the census reports the top-k
    patterns with counts -- pairwise null co-occurrence
    (null_cooccurrence) says which columns miss together; this says
    which exact COMBINATIONS ship, the fingerprint that identifies
    the upstream system dropping them.

    One O(2^|cols| observed) shuffle of per-batch bitmask counts.
    Output: (pattern string 'col1,col2' or '(none)', n int64,
    share round-6), count desc then pattern asc, top-k.
    """
    from ray.data.aggregate import Sum

    cl = list(cols)

    def partials(t: pa.Table) -> pa.Table:
        mask = np.zeros(t.num_rows, dtype=np.int64)
        for i, c in enumerate(cl):
            isnull = pc.is_null(t.column(c)).to_numpy(
                zero_copy_only=False)
            mask |= isnull.astype(np.int64) << i
        ub, cnt = np.unique(mask, return_counts=True)
        return pa.table({"m": pa.array(ub),
                         "n": pa.array(cnt.astype(np.int64))})

    agg = ds.select_columns(cl).map_batches(
        partials, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("m").aggregate(Sum("n", alias_name="n"))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("pattern", pa.string()),
                            ("n", pa.int64()),
                            ("share", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        m = t.column("m").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.int64)
        total = int(n.sum())

        def name(bits):
            parts = [cl[i] for i in range(len(cl))
                     if bits & (1 << i)]
            return ",".join(parts) if parts else "(none)"

        rows = sorted(((name(mi), int(ni)) for mi, ni in zip(m, n)),
                      key=lambda r: (-r[1], r[0]))[:k]
        return pa.table({
            "pattern": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "share": pa.array([round6_half_up(r[1] / total)
                               for r in rows], pa.float64()),
        })

    return agg.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def dup_row_census(ds, cols):
    """Full-row duplicate census over ``cols``: how many rows are
    exact copies of another row (the accidental-double-ingest
    signature), plus the distinct-combination count.  One groupby on
    the column tuple; counts exact.

    Output one row (n_rows int64, n_distinct int64, n_dup_rows
    int64 [rows beyond the first of each duplicate group],
    max_multiplicity int64).
    """
    from ray.data.aggregate import Count, Max, Sum

    cl = list(cols)
    counted = ds.select_columns(cl).groupby(cl).aggregate(
        Count(alias_name="n"))

    def partials(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.int64)
        return pa.table({
            "rows": pa.array([int(n.sum())], pa.int64()),
            "distinct": pa.array([len(n)], pa.int64()),
            "dups": pa.array([int((n - 1).sum())], pa.int64()),
            "maxm": pa.array([int(n.max()) if len(n) else 0],
                             pa.int64()),
        })

    agg = counted.map_batches(
        partials, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(Sum("rows", alias_name="rows"),
                Sum("distinct", alias_name="distinct"),
                Sum("dups", alias_name="dups"),
                Max("maxm", alias_name="maxm"))

    import ray

    return ray.data.from_arrow(pa.table({
        "n_rows": pa.array([agg["rows"] or 0], pa.int64()),
        "n_distinct": pa.array([agg["distinct"] or 0], pa.int64()),
        "n_dup_rows": pa.array([agg["dups"] or 0], pa.int64()),
        "max_multiplicity": pa.array([agg["maxm"] or 0], pa.int64()),
    }))
