"""ML-prep operators: functional-dependency validation, target
encoding, deterministic dataset splits with class-balance reports.

Engine extensions (the datatest reference validates single tables; a
training-data pipeline also needs the feature-prep primitives wired to
the same distributed discipline):

* ``fd_violations`` — the classic data-quality check "does column A
  functionally determine column B?"  Violating determinant values are
  exactly the keys a uniqueness/consistency audit reports.
* ``target_encode`` — per-category mean of a numeric target attached
  back onto every row (the leakage-prone encoder that needs a
  deterministic, auditable implementation).
* ``split_balance`` — deterministic md5-keyed train/val/test
  assignment plus the per-(split, class) count matrix used to audit
  stratification drift between splits.

Scale notes: ``fd_violations`` pre-distincts (det, dep) pairs per
batch, so the shuffle moves one row per distinct pair per block, never
one per input row.  ``target_encode`` broadcasts the per-category
stats (bounded by category cardinality) via ``ray.put`` — the fact
table streams through a vectorized ``pc.index_in`` lookup with no
shuffle.  ``split_balance`` is one groupby over (split, class) partial
counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import round6_half_up as _r6
from .sampling import _key_units

__all__ = ["fd_violations", "target_encode", "split_balance",
           "quantize_report", "impute_group_median", "quantile_normalize",
           "l_diversity", "eb_shrunk_rates", "t_closeness",
           "cfd_violations", "woe_iv", "cuped", "average_precision",
           "rrf_fuse", "gini_stump", "loo_encode_audit",
           "isotonic_calibration", "gk_lambda", "gains_table",
           "rfm_segments", "mcc_binary", "youden_threshold",
           "weighted_kappa"]


def fd_violations(ds, *, det_col: str, dep_col: str):
    """Determinant values that break the functional dependency
    ``det_col -> dep_col``: output ``(det_col, n_vals)`` with
    ``n_vals = count(DISTINCT dep)`` for every determinant mapping to
    MORE than one dependent value.

    Plan: per-batch distinct (det, dep) pairs (vectorized dictionary
    encode — the combiner), ONE groupby over the pair to global
    distinct, then a count groupby over the determinant.
    """
    from ray.data.aggregate import Count

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        det = batch.column(det_col)
        det = det.combine_chunks() if isinstance(det, pa.ChunkedArray) else det
        dep = batch.column(dep_col)
        dep = dep.combine_chunks() if isinstance(dep, pa.ChunkedArray) else dep
        d1 = pc.dictionary_encode(det)
        d2 = pc.dictionary_encode(dep)
        c1 = np.asarray(d1.indices, dtype=np.int64)
        c2 = np.asarray(d2.indices, dtype=np.int64)
        pair = c1 * max(len(d2.dictionary), 1) + c2
        _, first = np.unique(pair, return_index=True)
        idx = pa.array(np.sort(first), pa.int64())
        return pa.table({
            det_col: pc.take(det, idx),
            dep_col: pc.take(dep, idx),
        })

    pairs = ds.select_columns([det_col, dep_col]).map_batches(
        distinct_pairs, batch_format="pyarrow", zero_copy_batch=True
    )
    per_pair = pairs.groupby([det_col, dep_col]).aggregate(
        Count(alias_name="_n"))
    per_det = per_pair.groupby(det_col).aggregate(
        Count(alias_name="n_vals"))
    return per_det.filter(expr="n_vals > 1")


def target_encode(ds, *, cat_col: str, target_col: str, id_col: str,
                  cents_scale: float = 100.0):
    """Attach the per-category mean of ``target_col`` to every row:
    output ``(id_col, cat_col, te)``.

    The category stats aggregate in INTEGER units (``target *
    cents_scale`` rounded) so the sum is order-independent and the
    final mean is the bitwise-identical two-step division
    ``(s / cents_scale) / n`` any SQL engine reproduces.
    """
    import ray
    from ray.data.aggregate import Count, Sum

    def to_units(t: pa.Table) -> pa.Table:
        return pa.table({
            cat_col: t.column(cat_col),
            "_u": pc.cast(pc.round(pc.multiply(
                t.column(target_col), cents_scale)), pa.int64()),
        })

    stats = (
        ds.select_columns([cat_col, target_col])
        .map_batches(to_units, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(cat_col)
        .aggregate(Sum("_u", alias_name="s"), Count(alias_name="n"))
    )
    small = pa.concat_tables(list(stats.iter_batches(
        batch_format="pyarrow", batch_size=65536)))
    s = small.column("s").to_numpy(zero_copy_only=False).astype(np.float64)
    n = small.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    te = (s / cents_scale) / n
    cats = small.column(cat_col)
    cats = cats.combine_chunks() if isinstance(cats, pa.ChunkedArray) else cats
    lookup = ray.put(pa.table({cat_col: cats, "te": pa.array(te)}))

    def attach(batch: pa.Table) -> pa.Table:
        dim = ray.get(lookup)
        idx = pc.index_in(batch.column(cat_col), value_set=dim.column(cat_col))
        return pa.table({
            id_col: batch.column(id_col),
            cat_col: batch.column(cat_col),
            "te": dim.column("te").take(idx),
        })

    return ds.select_columns([id_col, cat_col]).map_batches(
        attach, batch_format="pyarrow", zero_copy_batch=True)


def split_balance(ds, *, id_col: str, class_col: str,
                  train: float = 0.8, val: float = 0.1,
                  method: str = "md5"):
    """Deterministic train/val/test assignment (md5-keyed, like
    :func:`hash_sample` — reruns and other cluster sizes produce the
    identical split) plus the per-(split, class) count matrix:
    output ``(split, class_col, n)``.
    """
    from ray.data.aggregate import Sum

    def kernel(batch: pa.Table) -> pa.Table:
        u = _key_units(batch.column(id_col), method)
        split = np.where(u < train, "train",
                         np.where(u < train + val, "val", "test"))
        cls = batch.column(class_col)
        cls = cls.combine_chunks() if isinstance(cls, pa.ChunkedArray) else cls
        enc_c = pc.dictionary_encode(cls)
        cc = np.asarray(enc_c.indices, dtype=np.int64)
        enc_s = pc.dictionary_encode(pa.array(split))
        sc = np.asarray(enc_s.indices, dtype=np.int64)
        k = len(enc_c.dictionary)
        flat = sc * k + cc
        cnt = np.bincount(flat, minlength=len(enc_s.dictionary) * k)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "split": pc.take(enc_s.dictionary, pa.array(nz // k, pa.int64())),
            class_col: pc.take(enc_c.dictionary, pa.array(nz % k, pa.int64())),
            "n": pa.array(cnt[nz], pa.int64()),
        })

    partials = ds.select_columns([id_col, class_col]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby(["split", class_col]).aggregate(
        Sum("n", alias_name="n"))


def quantize_report(ds, *, vec_col: str, levels: int = 255):
    """Uniform int8-style quantization audit for an embedding column:
    per-dimension ``(dim, vmin, vmax, scale, mse)`` with ``scale =
    (vmax - vmin) / levels`` and ``mse`` the mean squared
    reconstruction error of ``round((v - vmin) / scale)`` codes — the
    decision table for whether a corpus can ship quantized.

    Two streaming passes: per-dim min/max partials + groupby (pass 1,
    the only exchange moves d rows per block), then the d-vector
    (vmin, scale) broadcasts via ``ray.put`` and error partials
    aggregate the same way.  Constant dimensions (scale 0) quantize
    losslessly by definition.
    """
    import ray
    from ray.data.aggregate import Max, Min, Sum

    from .similarity import _batch_matrix

    def mm_partial(batch: pa.Table) -> pa.Table:
        X = _batch_matrix(batch, vec_col)
        d = X.shape[1]
        return pa.table({
            "dim": pa.array(np.arange(d, dtype=np.int64)),
            "mn": pa.array(X.min(axis=0)),
            "mx": pa.array(X.max(axis=0)),
        })

    mm = (
        ds.select_columns([vec_col])
        .map_batches(mm_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("dim")
        .aggregate(Min("mn", alias_name="vmin"), Max("mx", alias_name="vmax"))
    )
    small = pa.concat_tables(list(mm.iter_batches(
        batch_format="pyarrow", batch_size=65536))).sort_by("dim")
    vmin = small.column("vmin").to_numpy(zero_copy_only=False)
    vmax = small.column("vmax").to_numpy(zero_copy_only=False)
    scale = (vmax - vmin) / float(levels)
    handle = ray.put((vmin, scale))

    def err_partial(batch: pa.Table) -> pa.Table:
        mn, sc = ray.get(handle)
        X = _batch_matrix(batch, vec_col)
        with np.errstate(invalid="ignore", divide="ignore"):
            q = np.round((X - mn) / sc)
            err = np.where(sc == 0, 0.0, X - (mn + q * sc))
        d = X.shape[1]
        return pa.table({
            "dim": pa.array(np.arange(d, dtype=np.int64)),
            "sse": pa.array((err * err).sum(axis=0)),
            "n": pa.array(np.full(d, X.shape[0], dtype=np.int64)),
        })

    agg = (
        ds.select_columns([vec_col])
        .map_batches(err_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("dim")
        .aggregate(Sum("sse", alias_name="sse"), Sum("n", alias_name="n"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        t = t.sort_by("dim")
        dim = t.column("dim").to_numpy(zero_copy_only=False)
        sse = t.column("sse").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "dim": pa.array(dim),
            "vmin": pa.array(vmin[dim]),
            "vmax": pa.array(vmax[dim]),
            "scale": pa.array(scale[dim]),
            "mse": pa.array(sse / n),
        })

    return agg.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def impute_group_median(ds, *, id_cols, by: str, col: str,
                        miss_rate: float = 0.1):
    """Null-imputation with per-group medians, with a DETERMINISTIC
    missingness mask so the whole repair is SQL-auditable: a row is
    treated as missing iff the md5 of its key (same ``_key_units``
    contract as the sampling family) falls below ``miss_rate``; missing
    values are replaced by the exact median (``quantile_cont(0.5)``,
    rounded to 6 dp) of the NON-missing rows in the row's ``by`` group.

    Output: (*id_cols, imputed float64).  Plan: pass 1 computes the
    per-group medians over the non-missing subset (one groupby over
    projected columns — #groups bounded); pass 2 streams rows against
    the broadcast medians.  The md5 loop is the documented per-row
    cross-engine hash contract (sampling.py), not a hot-path kernel.
    """
    import ray

    from .robust import _group_positions, _grouped_quantiles
    from .sampling import _key_units

    ids = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    need = list(dict.fromkeys([*ids, by, col]))

    def keyed(batch: pa.Table):
        parts = []
        for i, c in enumerate(ids):
            if i:
                parts.append("-")
            parts.append(pc.cast(batch.column(c), pa.string()))
        key = parts[0] if len(parts) == 1 else \
            pc.binary_join_element_wise(*parts, "")
        return _key_units(key.combine_chunks()
                          if isinstance(key, pa.ChunkedArray) else key,
                          "md5")

    def nonmiss(batch: pa.Table) -> pa.Table:
        u = keyed(batch)
        return batch.select([by, col]).filter(pa.array(u >= miss_rate))

    clean = ds.select_columns(need).map_batches(
        nonmiss, batch_format="pyarrow", zero_copy_batch=True)
    stats = _grouped_quantiles(clean, by, col, (0.5,))
    med = np.round(stats.column("q0").to_numpy(zero_copy_only=False), 6)
    keys = stats.column(by)
    keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
    handle = ray.put((keys, med))

    def impute(batch: pa.Table) -> pa.Table:
        kk, md = ray.get(handle)
        u = keyed(batch)
        # a group whose EVERY row was masked has no median: drop its
        # rows, mirroring the SQL oracle's inner join against `med`
        pos, valid = _group_positions(batch.column(by), kk)
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        fill = md[pos] if len(md) else np.zeros(len(pos))
        out = np.where(u < miss_rate, fill, v)
        keep = pa.array(valid)
        cols = {c: batch.column(c).filter(keep) for c in ids}
        cols["imputed"] = pa.array(out[valid])
        return pa.table(cols)

    return ds.select_columns(need).map_batches(
        impute, batch_format="pyarrow", zero_copy_batch=True)


def quantile_normalize(ds, *, by: str, col: str, id_col: str,
                       grid_k: int = 101, n_buckets: int = 64):
    """Quantile normalization (batch-effect correction): each value is
    replaced by the GLOBAL distribution's quantile at the value's
    within-group percent-rank — after the transform every group has
    (up to grid resolution) the same marginal distribution, the
    standard fix when one labeling batch / data source runs hot.

    Output: (id_col, by, qn float64).  Deterministic and SQL-auditable:
    percent_rank uses the (value, id) total order; the global quantile
    function is a ``grid_k``-point ``quantile_cont`` grid, linearly
    interpolated — both engines compute ``q[floor(p·(k−1))]`` blends
    with identical IEEE ops.

    Plan: the grid is computed exactly in ONE in-plan task over the
    projected column (small/verify path — the scale path swaps in the
    mergeable t-digest sketch, functions/aggregates.py) and broadcast;
    ranks come from the same coarse-bucket + sorted-segment kernel as
    the window family; the grid lookup is a vectorized gather.
    """
    import ray

    from ..functions.aggregates import hash64

    qs = np.arange(grid_k) / float(grid_k - 1)

    def grid_kernel(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        g = np.quantile(v, qs) if len(v) else np.full(grid_k, np.nan)
        return pa.table({"g": pa.array(g)})

    grid_t = pa.concat_tables(list(
        ds.select_columns([col]).repartition(1).map_batches(
            grid_kernel, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow")
    ))
    grid = grid_t.column("g").to_numpy(zero_copy_only=False)
    handle = ray.put(grid)

    need = list(dict.fromkeys([id_col, by, col]))

    def add_bucket(batch: pa.Table) -> pa.Table:
        coarse = (hash64(batch.column(by)) % np.uint64(n_buckets)).astype(
            np.int64)
        return batch.select(need).append_column("coarse", pa.array(coarse))

    def kernel(group: pa.Table) -> pa.Table:
        g = ray.get(handle)
        t = group.sort_by([(by, "ascending"), (col, "ascending"),
                           (id_col, "ascending")])
        keys = t.column(by).to_numpy(zero_copy_only=False)
        n = len(keys)
        if n == 0:
            return pa.table({id_col: t.column(id_col), by: t.column(by),
                             "qn": pa.array([], pa.float64())})
        new = np.ones(n, dtype=bool)
        new[1:] = keys[1:] != keys[:-1]
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        seg_len = np.bincount(seg)
        rn = np.arange(n, dtype=np.int64) - starts[seg]
        denom = np.maximum(seg_len[seg] - 1, 1).astype(np.float64)
        pr = rn / denom  # percent_rank; single-row groups -> 0
        x = pr * (len(g) - 1)
        i0 = np.minimum(np.floor(x), len(g) - 2).astype(np.int64)
        frac = x - i0
        qn = g[i0] * (1.0 - frac) + g[i0 + 1] * frac
        return pa.table({
            id_col: t.column(id_col),
            by: t.column(by),
            "qn": pa.array(qn),
        })

    return ds.select_columns(need).map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("coarse").map_groups(
        kernel, batch_format="pyarrow"
    ).select_columns([id_col, by, "qn"])


def l_diversity(ds, *, qi_cols, sensitive_col: str):
    """l-diversity histogram: for every quasi-identifier group, how
    many DISTINCT non-null sensitive values it contains — the privacy
    audit that k-anonymity misses (a size-50 group whose every row
    shares one salary is still a disclosure).  Output: (l int64,
    n_groups int64) — one row per observed diversity level.

    Plan: distinct (QI..., sensitive) tuples (one pre-aggregated
    shuffle), per-QI distinct counts (tiny), then a groupby over the
    count value itself — every exchange is already aggregated.
    Groups whose sensitive values are ALL null drop out (SQL
    count(DISTINCT) semantics).
    """
    from ray.data.aggregate import Count

    qi = list(qi_cols)

    def drop_null_sens(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column(sensitive_col)))

    distinct = (
        ds.select_columns(qi + [sensitive_col])
        .map_batches(drop_null_sens, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby(qi + [sensitive_col]).aggregate(Count(alias_name="_c"))
    )
    per_group = distinct.groupby(qi).aggregate(Count(alias_name="l"))
    return per_group.groupby("l").aggregate(Count(alias_name="n_groups"))


def calibration_bins(ds, *, score_col: str, label_col: str,
                     n_bins: int = 8, denom: int | None = None):
    """Reliability-diagram bins + per-bin Brier score for a
    probabilistic score against a boolean label — the calibration
    audit run before trusting model scores as sampling weights or
    quality gates.  Output one row per non-empty bin:
    (bin, n, n_pos, rate, avg_score, brier) with
    rate = n_pos/n, avg_score = Σs/n, brier = Σ(s−y)²/n.

    Two score encodings:

    * ``denom=None``: ``score_col`` holds floats in [0, 1); bins are
      ``floor(s·n_bins)``, sums are float (order-dependent at the ulp
      level — fine for reports, not for hash-exact oracles).
    * ``denom=D``: ``score_col`` holds integer numerators ``k`` with
      s = k/D.  All sums (Σk, Σk², Σk·y) stay exact int64 and every
      output is a single int→double division — order-independent and
      bitwise mirrorable in SQL.  Using a power-of-two D makes each s
      binary-exact.

    Plan: one vectorized partial pass (per-batch groupby on bin) into
    a ≤n_bins-row ``groupby('bin')`` — the shuffle moves n_bins rows
    per block.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        s_col = t.column(score_col)
        y_col = t.column(label_col)
        ok = pc.and_(pc.is_valid(s_col), pc.is_valid(y_col))
        t2 = pa.table({"s": s_col, "y": y_col}).filter(ok)
        y = pc.cast(t2.column("y"), pa.int64()).to_numpy(
            zero_copy_only=False)
        if denom is not None:
            k = t2.column("s").to_numpy(zero_copy_only=False).astype(
                np.int64)
            bins = (k * n_bins) // denom
            sk, sk2, sky = k, k * k, k * y
        else:
            s = t2.column("s").to_numpy(zero_copy_only=False).astype(
                np.float64)
            keep = ~np.isnan(s)
            s, y = s[keep], y[keep]
            bins = np.minimum((s * n_bins).astype(np.int64), n_bins - 1)
            sk, sk2, sky = s, s * s, s * y
        out = pa.table({
            "bin": pa.array(bins, pa.int64()),
            "n": pa.array(np.ones(len(bins), np.int64)),
            "n_pos": pa.array(y.astype(np.int64)),
            "sk": pa.array(sk), "sk2": pa.array(sk2),
            "sky": pa.array(sky),
        })
        # combine locally: the exchange moves <= n_bins rows per block
        # (pyarrow 16 puts the group key FIRST, aggregates after)
        return pa.TableGroupBy(out, "bin").aggregate(
            [("n", "sum"), ("n_pos", "sum"), ("sk", "sum"),
             ("sk2", "sum"), ("sky", "sum")]).rename_columns(
            ["bin", "n", "n_pos", "sk", "sk2", "sky"])

    merged = ds.select_columns([score_col, label_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True).groupby(
        "bin").aggregate(
        Sum("n", alias_name="n"), Sum("n_pos", alias_name="n_pos"),
        Sum("sk", alias_name="sk"), Sum("sk2", alias_name="sk2"),
        Sum("sky", alias_name="sky"))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("bin", pa.int64()), ("n", pa.int64()),
                            ("n_pos", pa.int64()), ("rate", pa.float64()),
                            ("avg_score", pa.float64()),
                            ("brier", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        npos = t.column("n_pos").to_numpy(zero_copy_only=False).astype(
            np.int64)
        sk = t.column("sk").to_numpy(zero_copy_only=False)
        sk2 = t.column("sk2").to_numpy(zero_copy_only=False)
        sky = t.column("sky").to_numpy(zero_copy_only=False)
        nf = n.astype(np.float64)
        if denom is not None:
            d = float(denom)
            # exact int64 numerators -> single double divisions
            # (bitwise SQL-mirrorable, order-independent)
            rate = npos / nf
            avg = sk.astype(np.int64).astype(np.float64) / (d * nf)
            num = (sk2.astype(np.int64) - 2 * denom * sky.astype(np.int64)
                   + denom * denom * npos)
            brier = num.astype(np.float64) / (d * d * nf)
        else:
            rate = npos / nf
            avg = sk / nf
            brier = (sk2 - 2.0 * sky + npos) / nf
        return pa.table({
            "bin": pc.cast(t.column("bin"), pa.int64()),
            "n": pa.array(n), "n_pos": pa.array(npos),
            "rate": pa.array(rate), "avg_score": pa.array(avg),
            "brier": pa.array(brier),
        })

    return merged.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True)


def eb_shrunk_rates(ds, *, key_col: str, flag_expr, flag_col: str,
                    min_n: int = 5):
    """Empirical-Bayes (beta-binomial, method-of-moments) shrinkage of
    per-key success rates: small-sample keys are pulled toward the
    population mean so a 1-for-2 user doesn't outrank a 400-for-1000
    one — the standard fix before ranking keys by rate.

    Prior from the observed rates of keys with n ≥ ``min_n``:
    m = mean(raw), v = var_samp(raw), common = m(1−m)/v − 1,
    α = m·common; shrunk = (k + α)/(n + common).  The prior moments
    are two scalar aggregates (no collect of data); the per-key pass
    attaches raw + shrunk.  Output per eligible key:
    (key, n, k, raw, shrunk) — shrunk NULL when the prior is
    degenerate (zero between-key variance).
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        keys = t.column(key_col)
        flag = flag_expr(t)
        ok = pc.and_(pc.is_valid(keys), pc.is_valid(flag))
        tt = pa.table({"k": keys,
                       "f": pc.cast(flag, pa.int64())}).filter(ok)
        kv = tt.column("k").to_numpy(zero_copy_only=False)
        fv = tt.column("f").to_numpy(zero_copy_only=False)
        u, inv = np.unique(kv, return_inverse=True)
        return pa.table({
            "key": pa.array(u),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "k": pa.array(np.bincount(
                inv, weights=fv).astype(np.int64)),
        })

    keyed = (ds.select_columns(
        list(dict.fromkeys([key_col, flag_col])))
        .map_batches(partial, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("key")
        .aggregate(Sum("n", alias_name="n"), Sum("k", alias_name="k"))
    ).materialize()

    def eligible(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("n"),
                                      pa.scalar(min_n, pa.int64())))
        n = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.float64)
        k = t.column("k").to_numpy(zero_copy_only=False).astype(
            np.float64)
        raw = k / n
        return pa.table({
            "key": t.column("key"),
            "n": t.column("n"), "k": t.column("k"),
            "raw": pa.array(raw, pa.float64()),
        })

    el = keyed.map_batches(eligible, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    def moments(t: pa.Table) -> pa.Table:
        r = t.column("raw").to_numpy(zero_copy_only=False)
        return pa.table({
            "s1": pa.array([float(r.sum())]),
            "s2": pa.array([float((r * r).sum())]),
            "m": pa.array([len(r)], pa.int64()),
        })

    agg = el.map_batches(moments, batch_format="pyarrow",
                         zero_copy_batch=True).aggregate(
        Sum("s1", alias_name="s1"), Sum("s2", alias_name="s2"),
        Sum("m", alias_name="m"))
    s1, s2, m = float(agg["s1"]), float(agg["s2"]), int(agg["m"])
    common = None
    if m >= 2:
        mean = s1 / m
        v = (s2 - s1 * s1 / m) / (m - 1)
        if v > 0:
            c = mean * (1 - mean) / v - 1
            if c > 0:
                common = (mean, c)

    def attach(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.float64)
        k = t.column("k").to_numpy(zero_copy_only=False).astype(
            np.float64)
        if common is None:
            shrunk = pa.nulls(t.num_rows, pa.float64())
        else:
            mean, c = common
            shrunk = pa.array((k + mean * c) / (n + c), pa.float64())
        return t.append_column("shrunk", shrunk)

    return el.map_batches(attach, batch_format="pyarrow",
                          zero_copy_batch=True)


def t_closeness(ds, *, qi_col: str, sensitive_col: str):
    """t-closeness audit: for every quasi-identifier group, the earth
    mover's distance between the group's sensitive-value distribution
    and the GLOBAL one — the release is t-close iff max(emd) ≤ t.
    Complements :func:`l_diversity` (diversity says "many values";
    closeness says "the same SHAPE of values", blocking skew attacks
    where a group is diverse but concentrated in the tail).

    Exact 1-D EMD over the sorted distinct cents values:
    Σ_i |F_g(v_i) − F(v_i)| · (v_{i+1} − v_i), from one
    (group, value) count shuffle; the distance table is
    groups × distinct values on the finalize.  Output per group:
    (qi, n, emd) in original currency units.
    """
    from ray.data.aggregate import Sum

    def counts(t: pa.Table) -> pa.Table:
        g = t.column(qi_col)
        v = t.column(sensitive_col)
        cents = pc.cast(pc.round(pc.multiply(v, 100.0)), pa.int64())
        ok = pc.and_(pc.is_valid(g), pc.is_valid(cents))
        tt = pa.table({"g": g, "v": cents}).filter(ok)
        gv = tt.column("g").to_numpy(zero_copy_only=False)
        vv = tt.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((vv, gv))
        gv, vv = gv[order], vv[order]
        new = np.ones(len(gv), dtype=bool)
        if len(gv) > 1:
            new[1:] = (gv[1:] != gv[:-1]) | (vv[1:] != vv[:-1])
        seg = np.cumsum(new) - 1
        first = np.flatnonzero(new)
        return pa.table({
            "g": pa.array(gv[first]),
            "v": pa.array(vv[first], pa.int64()),
            "c": pa.array(np.bincount(seg).astype(np.int64)),
        })

    merged = (ds.select_columns([qi_col, sensitive_col])
              .map_batches(counts, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby(["g", "v"])
              .aggregate(Sum("c", alias_name="c")))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([(qi_col, pa.string()), ("n", pa.int64()),
                            ("emd", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        g = t.column("g").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        ug, gi = np.unique(g, return_inverse=True)
        uv, vi = np.unique(v, return_inverse=True)
        m, k = len(uv), len(ug)
        mat = np.zeros((k, m), dtype=np.int64)
        np.add.at(mat, (gi, vi), c)
        cum_g = np.cumsum(mat, axis=1).astype(np.float64)
        n_g = mat.sum(axis=1).astype(np.float64)
        cum_all = np.cumsum(mat.sum(axis=0)).astype(np.float64)
        n_all = float(cum_all[-1])
        gaps = (uv[1:] - uv[:-1]).astype(np.float64)
        diff = np.abs(cum_g[:, :-1] / n_g[:, None]
                      - cum_all[None, :-1] / n_all)
        emd = (diff * gaps[None, :]).sum(axis=1) / 100.0
        return pa.table({
            qi_col: pa.array(ug),
            "n": pa.array(n_g.astype(np.int64)),
            "emd": pa.array(emd, pa.float64()),
        })

    return merged.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def cfd_violations(ds, *, cond_col: str, det_col: str, dep_col: str):
    """Conditional functional dependency audit: within each
    ``cond_col`` slice, determinant values that break
    ``det_col -> dep_col``.  A plain FD (``fd_violations``) says "the
    rule holds everywhere"; real data rules are usually CONDITIONAL
    ("within one return-flag regime, an order's lines share one line
    status").  Output ``(cond_col, det_col, n_vals)`` for every
    (condition, determinant) whose dependent takes >1 distinct value.

    Plan: per-batch distinct (cond, det, dep) triples (vectorized
    dictionary-encode combiner — shuffle payload is distinct triples,
    not rows), ONE groupby over the triple, then a count groupby over
    (cond, det).
    """
    from ray.data.aggregate import Count

    def distinct_triples(batch: pa.Table) -> pa.Table:
        cols = []
        for name in (cond_col, det_col, dep_col):
            c = batch.column(name)
            cols.append(c.combine_chunks()
                        if isinstance(c, pa.ChunkedArray) else c)
        encs = [pc.dictionary_encode(c) for c in cols]
        code = np.zeros(batch.num_rows, dtype=np.int64)
        for e in encs:
            code = code * max(len(e.dictionary), 1) + np.asarray(
                e.indices, dtype=np.int64)
        _, first = np.unique(code, return_index=True)
        idx = pa.array(np.sort(first), pa.int64())
        return pa.table({
            cond_col: pc.take(cols[0], idx),
            det_col: pc.take(cols[1], idx),
            dep_col: pc.take(cols[2], idx),
        })

    triples = ds.select_columns([cond_col, det_col, dep_col]).map_batches(
        distinct_triples, batch_format="pyarrow", zero_copy_batch=True)
    per_triple = triples.groupby([cond_col, det_col, dep_col]).aggregate(
        Count(alias_name="_n"))
    per_det = per_triple.groupby([cond_col, det_col]).aggregate(
        Count(alias_name="n_vals"))
    return per_det.filter(expr="n_vals > 1")


def woe_iv(ds, *, cat_col: str, flag_col: str):
    """Weight-of-evidence encoding + information value per category of
    ``cat_col`` against the boolean ``flag_col`` (the risk-scoring /
    feature-screening primitive):

        WoE_k = ln( ((pos_k + 0.5)/POS) / ((neg_k + 0.5)/NEG) )
        IV_k  = (pos_k/POS − neg_k/NEG) · WoE_k

    with the 0.5 Laplace term making empty cells finite.  Per-batch
    (category → pos, neg) count partials, one groupby, one tiny
    finalize (needs the global POS/NEG totals, so the per-category
    table — O(categories) — reduces on one task).  Output one row per
    category: (cat, n, n_pos, woe, iv_term), 6-dp rounded floats.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = t.column(cat_col)
        f = t.column(flag_col)
        ok = pc.and_(pc.is_valid(g), pc.is_valid(f))
        tt = pa.table({"g": g, "f": f}).filter(ok)
        gv = tt.column("g").to_numpy(zero_copy_only=False)
        fv = tt.column("f").to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(gv, return_inverse=True)
        return pa.table({
            cat_col: pa.array(u),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "n_pos": pa.array(np.bincount(inv, weights=fv).astype(np.int64)),
        })

    agg = (ds.select_columns([cat_col, flag_col])
           .map_batches(partial, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby(cat_col)
           .aggregate(Sum("n", alias_name="n"),
                      Sum("n_pos", alias_name="n_pos")))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([(cat_col, pa.string()), ("n", pa.int64()),
                            ("n_pos", pa.int64()), ("woe", pa.float64()),
                            ("iv_term", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        npos = t.column("n_pos").to_numpy(
            zero_copy_only=False).astype(np.int64)
        nneg = n - npos
        pos_tot = float(npos.sum())
        neg_tot = float(nneg.sum())
        woe = np.log(((npos + 0.5) / pos_tot) / ((nneg + 0.5) / neg_tot))
        iv = (npos / pos_tot - nneg / neg_tot) * woe
        return pa.table({
            cat_col: t.column(cat_col),
            "n": pa.array(n, pa.int64()),
            "n_pos": pa.array(npos, pa.int64()),
            "woe": pa.array(np.round(woe, 6), pa.float64()),
            "iv_term": pa.array(np.round(iv, 6), pa.float64()),
        })

    return agg.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def cuped(ds, *, ts_col: str, key_col: str, value_col: str, cutoff: str):
    """CUPED variance reduction audit (Deng et al., "Improving the
    Sensitivity of Online Controlled Experiments"): split each key's
    activity at ``cutoff`` into a pre-period covariate x and a
    post-period metric y (both summed in exact cents; a key missing a
    side contributes 0), estimate

        θ = cov(x, y) / var(x)

    and report the variance the adjusted metric y − θ(x − x̄) would
    have: var_adj = var_y − cov²/var_x — the "how much experiment
    power does pre-period data buy" number.  Population moments from
    exact integer sums (Σx, Σy, Σxy, Σx², Σy², n) so a SQL mirror
    hashes identically.  Plan: per-batch (key → pre, post) cent-sum
    partials, ONE key groupby, then the tiny moment reduce.  Output
    one row (n_keys, theta, var_y, var_adj, var_reduction).
    """
    from ray.data.aggregate import Sum

    cutoff_us = np.datetime64(cutoff, "us").astype(np.int64)

    def partial(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(ts_col)),
                     pc.and_(pc.is_valid(t.column(key_col)),
                             pc.is_valid(t.column(value_col))))
        t = t.filter(ok)
        ts = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.rint(t.column(value_col).to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        pre = np.where(ts < cutoff_us, cents, 0)
        post = np.where(ts >= cutoff_us, cents, 0)
        kv = t.column(key_col).to_numpy(zero_copy_only=False)
        u, inv = np.unique(kv, return_inverse=True)
        return pa.table({
            key_col: pa.array(u),
            "x": pa.array(np.bincount(inv, weights=pre).astype(np.int64)),
            "y": pa.array(np.bincount(inv, weights=post).astype(np.int64)),
        })

    per_key = (ds.select_columns([ts_col, key_col, value_col])
               .map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
               .groupby(key_col)
               .aggregate(Sum("x", alias_name="x"),
                          Sum("y", alias_name="y")))

    def moments(t: pa.Table) -> pa.Table:
        return pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "sx": pa.array([int(pc.sum(t.column("x")).as_py() or 0)],
                           pa.int64()),
            "sy": pa.array([int(pc.sum(t.column("y")).as_py() or 0)],
                           pa.int64()),
            "sxx": pa.array([int(np.sum(
                t.column("x").to_numpy(zero_copy_only=False).astype(
                    object) ** 2))], pa.int64()),
            "syy": pa.array([int(np.sum(
                t.column("y").to_numpy(zero_copy_only=False).astype(
                    object) ** 2))], pa.int64()),
            "sxy": pa.array([int(np.sum(
                t.column("x").to_numpy(zero_copy_only=False).astype(object)
                * t.column("y").to_numpy(zero_copy_only=False)))],
                pa.int64()),
        })

    from ray.data.aggregate import Sum as _Sum

    parts = per_key.map_batches(moments, batch_format="pyarrow")
    red = parts.aggregate(_Sum("n", alias_name="n"),
                          _Sum("sx", alias_name="sx"),
                          _Sum("sy", alias_name="sy"),
                          _Sum("sxx", alias_name="sxx"),
                          _Sum("syy", alias_name="syy"),
                          _Sum("sxy", alias_name="sxy"))

    n = int(red["n"] or 0)
    schema = pa.schema([("n_keys", pa.int64()), ("theta", pa.float64()),
                        ("var_y", pa.float64()),
                        ("var_adj", pa.float64()),
                        ("var_reduction", pa.float64())])
    if n < 2:
        return schema.empty_table()
    sx, sy = int(red["sx"]), int(red["sy"])
    sxx, syy, sxy = int(red["sxx"]), int(red["syy"]), int(red["sxy"])
    # cents → currency: scale at the end (exact int sums up to here)
    var_x = (sxx / n - (sx / n) * (sx / n)) / 10000.0
    var_y = (syy / n - (sy / n) * (sy / n)) / 10000.0
    cov = (sxy / n - (sx / n) * (sy / n)) / 10000.0
    theta = cov / var_x if var_x > 0 else None
    var_adj = (var_y - cov * cov / var_x) if var_x > 0 else var_y
    reduction = (1.0 - var_adj / var_y) if var_y > 0 else None
    return pa.table({
        "n_keys": pa.array([n], pa.int64()),
        "theta": pa.array(
            [None if theta is None else round(theta, 6)], pa.float64()),
        "var_y": pa.array([round(var_y, 6)], pa.float64()),
        "var_adj": pa.array([round(var_adj, 6)], pa.float64()),
        "var_reduction": pa.array(
            [None if reduction is None else round(reduction, 6)],
            pa.float64()),
    })


def average_precision(ds, *, score_col: str, label_expr):
    """PR-AUC as tie-aware average precision: rows are ranked by score
    descending, tied scores form one group, and AP = sum over groups of
    (tp_g / P) * (cumTP_g / cumN_g) -- precision evaluated at each
    group's trailing edge, weighted by the recall it adds.  The
    ranking-quality complement to the ROC AUC (which is blind to class
    imbalance).

    ``label_expr(table) -> BooleanArray`` marks positives.  Plan: one
    O(distinct scores) shuffle of (score, n, tp) partials, then a
    single-partition finalize over the sorted score groups (assumes
    distinct scores fit one task -- quantize the score upstream for
    columns with unbounded cardinality).

    Output: one row (n int64, p int64, ap double round-6; ap NULL when
    P = 0).
    """
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        y = label_expr(t)
        y = y.combine_chunks() if isinstance(y, pa.ChunkedArray) else y
        ok = pc.and_(pc.is_valid(t.column(score_col)), pc.is_valid(y))
        g = pa.table({"s": t.column(score_col),
                      "y": pc.cast(y, pa.int64())}).filter(ok)
        return g.group_by("s").aggregate(
            [("y", "count"), ("y", "sum")]
        ).rename_columns(["s", "n", "tp"])

    agg = ds.map_batches(
        partials, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("s").aggregate(Sum("n", alias_name="n"),
                             Sum("tp", alias_name="tp"))

    def finalize(t: pa.Table) -> pa.Table:
        t = t.sort_by([("s", "descending")])
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        tp = t.column("tp").to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(n.sum())
        p = int(tp.sum())
        if p == 0:
            ap = None
        else:
            ctp = np.cumsum(tp)
            cn = np.cumsum(n)
            ap = round(float(np.sum((tp / p) * (ctp / cn))), 6)
        return pa.table({
            "n": pa.array([total], pa.int64()),
            "p": pa.array([p], pa.int64()),
            "ap": pa.array([ap], pa.float64()),
        })

    return agg.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def rrf_fuse(ds, *, key_col: str, score_cols, c: int = 60,
             top_k: int = 20):
    """Reciprocal-rank fusion over an already-aggregated score table:
    each score column induces a ranking (score DESC, key ASC -- the
    deterministic tie-break), and every key gets
    ``sum_cols 1/(c + rank)``; output the fused top_k.  The standard
    way to combine incomparable rankings (lexical + semantic retrieval,
    revenue + volume league tables) without calibrating scores.

    Single-partition finalize over the aggregate (O(distinct keys) --
    quantize or pre-filter keys upstream for unbounded domains).

    Output: (key_col, rank_<col> int64 per score column, rrf round-6),
    sorted rrf DESC then key ASC, top_k rows.
    """
    cols = list(score_cols)

    def finalize(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        n = len(keys)
        rrf = np.zeros(n, dtype=np.float64)
        ranks = {}
        for col in cols:
            s = t.column(col).to_numpy(zero_copy_only=False)
            order = np.lexsort((keys, -s))
            r = np.empty(n, dtype=np.int64)
            r[order] = np.arange(1, n + 1)
            ranks[col] = r
            rrf += 1.0 / (c + r)
        top = np.lexsort((keys, -rrf))[:top_k]
        out = {key_col: pa.array(keys[top])}
        for col in cols:
            out[f"rank_{col}"] = pa.array(ranks[col][top])
        out["rrf"] = pa.array(np.round(rrf[top], 6))
        return pa.table(out)

    return ds.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def gini_stump(ds, *, score_col: str, label_expr,
               cents_scale: float = 100.0):
    """Best single-threshold decision stump under Gini impurity: over
    every distinct value v of ``score_col``, split left = (x <= v) and
    pick the v maximizing (pl^2+ql^2)/nl + (pr^2+qr^2)/nr (equivalently
    minimizing the weighted Gini (n - imp)/n), ties to the SMALLEST
    threshold -- the univariate feature-quality probe (CART's first
    split) for "does this score separate the classes at all".

    The objective is evaluated with the same single-expression double
    arithmetic a SQL mirror uses, over exact integer class counts from
    one O(distinct scores) shuffle; scores are cents-quantized so the
    threshold is hash-stable.  Output one row (n, pos, threshold
    round-6, gini round-6); NULL when no valid split exists.
    """
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        y = label_expr(t)
        y = y.combine_chunks() if isinstance(y, pa.ChunkedArray) else y
        ok = pc.and_(pc.is_valid(t.column(score_col)), pc.is_valid(y))
        s = pc.cast(pc.round(pc.multiply(
            pc.cast(t.column(score_col), pa.float64()), cents_scale)),
            pa.int64())
        g = pa.table({"s": s, "y": pc.cast(y, pa.int64())}).filter(ok)
        return g.group_by("s").aggregate(
            [("y", "count"), ("y", "sum")]
        ).rename_columns(["s", "n", "pos"])

    agg = ds.map_batches(
        partials, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("s").aggregate(Sum("n", alias_name="n"),
                             Sum("pos", alias_name="pos"))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("n", pa.int64()), ("pos", pa.int64()),
                            ("threshold", pa.float64()),
                            ("gini", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        t = t.sort_by([("s", "ascending")])
        s = t.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
        cn = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        cp = t.column("pos").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = int(cn.sum())
        p = int(cp.sum())
        nl = np.cumsum(cn)
        pl = np.cumsum(cp)
        ql = nl - pl
        nr = n - nl
        pr = p - pl
        qr = nr - pr
        valid = (nl > 0) & (nr > 0)
        if not valid.any():
            return pa.table({
                "n": pa.array([n], pa.int64()),
                "pos": pa.array([p], pa.int64()),
                "threshold": pa.array([None], pa.float64()),
                "gini": pa.array([None], pa.float64()),
            })
        imp = ((pl * pl + ql * ql) / nl.astype(np.float64)
               + (pr * pr + qr * qr)
               / np.where(nr > 0, nr, 1).astype(np.float64))
        imp = np.where(valid, imp, -np.inf)
        best = int(np.argmax(imp))  # argmax takes the FIRST max: min v
        return pa.table({
            "n": pa.array([n], pa.int64()),
            "pos": pa.array([p], pa.int64()),
            "threshold": pa.array(
                [round(s[best] / cents_scale, 6)], pa.float64()),
            "gini": pa.array(
                [_r6((n - imp[best]) / n)], pa.float64()),
        })

    return agg.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def loo_encode_audit(ds, *, cat_col: str, target_col: str,
                     cents_scale: float = 100.0):
    """Leave-one-out target-encoding audit per category: the LOO code
    of row i is (S - x_i)/(n - 1), and this reports its per-category
    mean and standard deviation in closed form from EXACT integer sums
    (S, sum x^2) -- high sd_loo marks categories whose encoding leaks
    per-row information (small n or heavy tails), the screening step
    before shipping an encoded feature.

    One O(categories) shuffle of (sum, sum-of-squares, count) partials.
    Output: (cat_col, n int64, mean_loo round-6, sd_loo round-6;
    NULLs when n < 2).
    """
    from ray.data.aggregate import Count, Sum

    def to_units(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(cat_col)),
                     pc.is_valid(t.column(target_col)))
        t = t.filter(ok)
        u = pc.cast(pc.round(pc.multiply(
            pc.cast(t.column(target_col), pa.float64()), cents_scale)),
            pa.int64())
        u2 = pc.multiply(u, u)
        return pa.table({cat_col: t.column(cat_col), "u": u, "u2": u2})

    agg = ds.select_columns([cat_col, target_col]).map_batches(
        to_units, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(cat_col).aggregate(
        Sum("u", alias_name="s"), Sum("u2", alias_name="s2"),
        Count(alias_name="n"))

    def finalize(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
        s2 = t.column("s2").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        means, sds = [], []
        for si, s2i, ni in zip(s, s2, n):
            if ni < 2:
                means.append(None)
                sds.append(None)
                continue
            # codes c_i = (S - x_i)/(n-1): mean = S/n exactly;
            # E[c^2] = (S^2 (n-2) + sum x^2) / (n (n-1)^2)
            mean = float(si) / ni / cents_scale
            ec2 = (float(si) * si * (ni - 2) + float(s2i)) \
                / (ni * float(ni - 1) ** 2) / (cents_scale ** 2)
            var = ec2 - mean * mean
            means.append(round(mean, 6))
            sds.append(round(float(np.sqrt(max(var, 0.0))), 6))
        return pa.table({
            cat_col: t.column(cat_col),
            "n": pa.array(n),
            "mean_loo": pa.array(means, pa.float64()),
            "sd_loo": pa.array(sds, pa.float64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow",
                           zero_copy_batch=True)


def isotonic_calibration(ds, *, score_col: str, label_expr,
                         n_bins: int = 10):
    """Isotonic (PAVA) calibration audit: quantile-free fixed-score
    binning of the score into ``n_bins`` equal-width bins over the
    observed [min, max], then the pool-adjacent-violators algorithm
    enforces a monotone event-rate curve over the bins -- the
    calibration table a monotone-score consumer (ranker, threshold
    alert) actually needs, plus how much pooling was required (pooled
    bins = score regions where the raw rate INVERTS).

    PAVA runs on the tiny per-bin aggregate (exact integer counts,
    weighted-average pooling); the only shuffle is O(n_bins).
    Output: (bin int64, n int64, pos int64, raw_rate round-6,
    iso_rate round-6), one row per non-empty bin ordered by bin.
    """
    import ray
    from ray.data.aggregate import Max, Min, Sum

    def units(t: pa.Table) -> pa.Table:
        y = label_expr(t)
        y = y.combine_chunks() if isinstance(y, pa.ChunkedArray) else y
        ok = pc.and_(pc.is_valid(t.column(score_col)), pc.is_valid(y))
        s = pc.cast(t.column(score_col), pa.float64())
        return pa.table({"s": s, "y": pc.cast(y, pa.int64())}).filter(ok)

    base = ds.map_batches(units, batch_format="pyarrow",
                          zero_copy_batch=True)
    bounds = base.aggregate(Min("s"), Max("s"))
    lo, hi = bounds["min(s)"], bounds["max(s)"]
    if lo is None or hi is None or hi <= lo:
        return ray.data.from_arrow(pa.schema(
            [("bin", pa.int64()), ("n", pa.int64()),
             ("pos", pa.int64()), ("raw_rate", pa.float64()),
             ("iso_rate", pa.float64())]).empty_table())
    width = (hi - lo) / n_bins

    def to_bins(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        b = np.minimum(((s - lo) / width).astype(np.int64), n_bins - 1)
        g = pa.table({"bin": pa.array(b), "one": pa.array(
            np.ones(len(b), dtype=np.int64)), "y": t.column("y")})
        return g.group_by("bin").aggregate(
            [("one", "sum"), ("y", "sum")]
        ).rename_columns(["bin", "n", "pos"])

    agg = base.map_batches(
        to_bins, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("bin").aggregate(Sum("n", alias_name="n"),
                               Sum("pos", alias_name="pos"))

    def finalize(t: pa.Table) -> pa.Table:
        t = t.sort_by([("bin", "ascending")])
        n = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.float64)
        pos = t.column("pos").to_numpy(zero_copy_only=False).astype(
            np.float64)
        # PAVA with weights n: pool adjacent blocks while decreasing
        blocks = []  # (weight, weighted_rate_sum)
        for w, p in zip(n, pos):
            blocks.append([w, p])
            while (len(blocks) > 1 and
                   blocks[-2][1] * blocks[-1][0]
                   > blocks[-1][1] * blocks[-2][0]):
                w2, p2 = blocks.pop()
                blocks[-1][0] += w2
                blocks[-1][1] += p2
        iso = np.empty(len(n), dtype=np.float64)
        i = 0
        for w, p in blocks:
            rate = p / w
            cnt = 0
            acc = 0.0
            while acc < w - 1e-9:
                acc += n[i + cnt]
                cnt += 1
            iso[i:i + cnt] = rate
            i += cnt
        return pa.table({
            "bin": t.column("bin"),
            "n": pa.array(n.astype(np.int64)),
            "pos": pa.array(pos.astype(np.int64)),
            "raw_rate": pa.array([_r6(x) for x in pos / n]),
            "iso_rate": pa.array([_r6(x) for x in iso]),
        })

    return agg.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def gk_lambda(ds, *, row_col: str, col_col: str):
    """Goodman-Kruskal lambda, both directions: the proportional
    reduction in prediction error when guessing one categorical column
    from the other (0 = the predictor is useless, 1 = perfect) -- the
    "does this category actually predict that one" screen that a
    chi-square cannot answer.  lambda_c = (sum_r max_c n_rc - max_c
    n_c) / (n - max_c n_c), all exact integers until the final
    quotient.

    One O(categories^2) shuffle of the contingency partials.  Output
    one row (n int64, lambda_col round-6 [predict col from row],
    lambda_row round-6; NULL when the denominator is 0).
    """
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(row_col)),
                     pc.is_valid(t.column(col_col)))
        t = t.filter(ok)
        g = pa.table({"r": t.column(row_col), "c": t.column(col_col),
                      "one": pa.array(
                          np.ones(t.num_rows, dtype=np.int64))})
        return g.group_by(["r", "c"]).aggregate(
            [("one", "sum")]).rename_columns(["r", "c", "n"])

    agg = ds.select_columns([row_col, col_col]).map_batches(
        partials, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(["r", "c"]).aggregate(Sum("n", alias_name="n"))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("n", pa.int64()),
                            ("lambda_col", pa.float64()),
                            ("lambda_row", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        rows = t.column("r").to_pylist()
        cols = t.column("c").to_pylist()
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        ri = {v: i for i, v in enumerate(sorted(set(rows)))}
        ci = {v: i for i, v in enumerate(sorted(set(cols)))}
        mat = np.zeros((len(ri), len(ci)), dtype=np.int64)
        for r, c, v in zip(rows, cols, n):
            mat[ri[r], ci[c]] = v
        total = int(mat.sum())

        def lam(m):
            from decimal import ROUND_HALF_UP, Decimal

            big = int(m.sum(axis=0).max())
            num = int(m.max(axis=1).sum()) - big
            den = total - big
            if den <= 0:
                return None
            # decimal half-away rounding: an exact-integer quotient can
            # land exactly on a decimal .5 at 6 dp (1/128 = 0.0078125),
            # where Python's banker's rounding and DuckDB's round()
            # disagree; a 6-dp tie requires den | 2^7*5^6, for which
            # the binary value is exact, so the Decimal rule equals
            # DuckDB's on every possible tie (fuzz seed 606)
            return float(Decimal(num / den).quantize(
                Decimal("1e-6"), ROUND_HALF_UP))

        return pa.table({
            "n": pa.array([total], pa.int64()),
            "lambda_col": pa.array([lam(mat)], pa.float64()),
            "lambda_row": pa.array([lam(mat.T)], pa.float64()),
        })

    return agg.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def gains_table(ds, *, score_col: str, id_col: str, label_expr,
                k: int = 10):
    """Cumulative-gains / lift table: rows rank by score descending
    (id ascending tie-break), split into k SQL-ntile buckets, and each
    decile reports its positive count, the cumulative fraction of all
    positives captured, and the lift over a random ranking -- the
    campaign-targeting readout of ranking quality, complementary to
    AP/AUC.

    The ordered split is computed in a single-partition kernel over
    (score, id, y) triples -- O(rows) memory in ONE task; pre-filter
    or sample upstream for corpora past ~10^7 rows (the decile
    boundaries then come from a t-digest instead).  Output: (tile
    int64, n int64, pos int64, cum_capture round-6, lift round-6).
    """
    def triples(t: pa.Table) -> pa.Table:
        y = label_expr(t)
        y = y.combine_chunks() if isinstance(y, pa.ChunkedArray) else y
        ok = pc.and_(pc.is_valid(t.column(score_col)), pc.is_valid(y))
        return pa.table({"s": t.column(score_col),
                         "id": t.column(id_col),
                         "y": pc.cast(y, pa.int64())}).filter(ok)

    base = ds.map_batches(triples, batch_format="pyarrow",
                          zero_copy_batch=True)

    def finalize(t: pa.Table) -> pa.Table:
        from decimal import ROUND_HALF_UP, Decimal

        schema = pa.schema([("tile", pa.int64()), ("n", pa.int64()),
                            ("pos", pa.int64()),
                            ("cum_capture", pa.float64()),
                            ("lift", pa.float64())])
        n = t.num_rows
        if n == 0:
            return schema.empty_table()
        s = t.column("s").to_numpy(zero_copy_only=False)
        ids = t.column("id").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, -s))
        y = y[order]
        pos_total = int(y.sum())

        def r6(x):
            # exact-integer quotients can tie at a decimal .5 at 6 dp
            # (e.g. p_total a multiple of 128), where Python's banker's
            # rounding and DuckDB's half-away round() disagree — the
            # Decimal rule equals DuckDB's on every possible tie
            # because a 6-dp tie value is binary-exact (fuzz seed
            # 555004 under carve=3 skew; same class as fuzz seed 606)
            return float(Decimal(x).quantize(Decimal("1e-6"),
                                             ROUND_HALF_UP))

        q, r = n // k, n % k
        sizes = np.full(k, q, dtype=np.int64)
        sizes[:r] += 1
        sizes = sizes[sizes > 0]
        bounds = np.concatenate(([0], np.cumsum(sizes)))
        tiles, ns, poss, cums, lifts = [], [], [], [], []
        cum_pos = 0
        for i in range(len(sizes)):
            seg = y[bounds[i]:bounds[i + 1]]
            p = int(seg.sum())
            cum_pos += p
            tiles.append(i + 1)
            ns.append(int(sizes[i]))
            poss.append(p)
            cums.append(r6(cum_pos / pos_total)
                        if pos_total else None)
            lifts.append(r6((p / sizes[i]) / (pos_total / n))
                         if pos_total else None)
        return pa.table({
            "tile": pa.array(tiles, pa.int64()),
            "n": pa.array(ns, pa.int64()),
            "pos": pa.array(poss, pa.int64()),
            "cum_capture": pa.array(cums, pa.float64()),
            "lift": pa.array(lifts, pa.float64()),
        })

    return base.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def rfm_segments(ds, *, id_col: str, ts_col: str, value_col: str,
                 k: int = 5):
    """RFM segmentation: per key, Recency (days from last activity to
    the corpus max day), Frequency (event count) and Monetary (cent-
    exact value sum) each split into k SQL-ntile quantile bins
    (ordered ascending, key-ascending tie-break), and the output is
    the occupied (r_q, f_q, m_q) cell census -- the classic customer-
    base health matrix (e.g. r_q=5,f_q=1: long-dormant one-shot keys).

    Per-key aggregates come from one groupby; the ntile split runs in
    a single-partition kernel over O(keys) rows.  Output: (r_q, f_q,
    m_q int64, n_users int64).
    """
    from ray.data.aggregate import Count, Max, Sum

    def units(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.and_(pc.is_valid(t.column(id_col)),
                             pc.is_valid(t.column(ts_col))),
                     pc.is_valid(t.column(value_col)))
        t = t.filter(ok)
        us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                     pa.int64())
        day = pc.cast(pc.floor(pc.divide(pc.cast(us, pa.float64()),
                                         86400e6)), pa.int64())
        cents = pc.cast(pc.round(pc.multiply(
            pc.cast(t.column(value_col), pa.float64()), 100.0)),
            pa.int64())
        return pa.table({"k": t.column(id_col), "day": day,
                         "c": cents})

    agg = ds.select_columns([id_col, ts_col, value_col]).map_batches(
        units, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("k").aggregate(
        Max("day", alias_name="last_day"),
        Count(alias_name="f"),
        Sum("c", alias_name="m"))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("r_q", pa.int64()), ("f_q", pa.int64()),
                            ("m_q", pa.int64()),
                            ("n_users", pa.int64())])
        if t.num_rows == 0:
            return schema.empty_table()
        t = t.sort_by([("k", "ascending")])
        keys = t.column("k").to_numpy(zero_copy_only=False)
        last = t.column("last_day").to_numpy(
            zero_copy_only=False).astype(np.int64)
        f = t.column("f").to_numpy(zero_copy_only=False).astype(
            np.int64)
        m = t.column("m").to_numpy(zero_copy_only=False).astype(
            np.int64)
        rec = int(last.max()) - last      # days since last activity
        n = len(keys)

        def ntile(metric):
            order = np.lexsort((keys, metric))
            q, r = n // k, n % k
            sizes = np.full(k, q, dtype=np.int64)
            sizes[:r] += 1
            tile_sorted = np.repeat(np.arange(1, k + 1,
                                              dtype=np.int64), sizes)
            tile = np.empty(n, dtype=np.int64)
            tile[order] = tile_sorted[:n]
            return tile

        rq, fq, mq = ntile(rec), ntile(f), ntile(m)
        cell = (rq - 1) * k * k + (fq - 1) * k + (mq - 1)
        cnt = np.bincount(cell, minlength=k * k * k)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "r_q": pa.array(nz // (k * k) + 1, pa.int64()),
            "f_q": pa.array((nz // k) % k + 1, pa.int64()),
            "m_q": pa.array(nz % k + 1, pa.int64()),
            "n_users": pa.array(cnt[nz], pa.int64()),
        })

    return agg.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def mcc_binary(ds, *, flag_expr, label_expr):
    """Matthews correlation coefficient of a binary flag against a
    binary label: MCC = (TP*TN - FP*FN) / sqrt((TP+FP)(TP+FN)(TN+FP)
    (TN+FN)) -- the single confusion-matrix number that stays honest
    under class imbalance (unlike accuracy or F1).  Exact integer
    cells; the product under the sqrt is evaluated in double with the
    same factor order a SQL mirror uses.

    Output one row (n, tp, fp, fn_, tn int64, mcc round-6; NULL when
    any marginal is empty).
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        f = flag_expr(t)
        f = f.combine_chunks() if isinstance(f, pa.ChunkedArray) else f
        y = label_expr(t)
        y = y.combine_chunks() if isinstance(y, pa.ChunkedArray) else y
        ok = pc.and_(pc.is_valid(f), pc.is_valid(y))
        g = pa.table({"f": pc.cast(f, pa.int64()),
                      "y": pc.cast(y, pa.int64())}).filter(ok)
        fv = g.column("f").to_numpy(zero_copy_only=False)
        yv = g.column("y").to_numpy(zero_copy_only=False)
        return pa.table({
            "tp": pa.array([int((fv & yv).sum())], pa.int64()),
            "fp": pa.array([int((fv & (1 - yv)).sum())], pa.int64()),
            "fn_": pa.array([int(((1 - fv) & yv).sum())], pa.int64()),
            "tn": pa.array([int(((1 - fv) & (1 - yv)).sum())],
                           pa.int64()),
        })

    agg = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(Sum("tp", alias_name="tp"), Sum("fp", alias_name="fp"),
                Sum("fn_", alias_name="fn_"),
                Sum("tn", alias_name="tn"))

    import ray

    tp, fp = agg["tp"] or 0, agg["fp"] or 0
    fn, tn = agg["fn_"] or 0, agg["tn"] or 0
    n = tp + fp + fn + tn
    den = (float(tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    mcc = (round((float(tp) * tn - float(fp) * fn) / np.sqrt(den), 6)
           if den > 0 else None)
    return ray.data.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "tp": pa.array([tp], pa.int64()),
        "fp": pa.array([fp], pa.int64()),
        "fn_": pa.array([fn], pa.int64()),
        "tn": pa.array([tn], pa.int64()),
        "mcc": pa.array([mcc], pa.float64()),
    }))


def youden_threshold(ds, *, score_col: str, label_expr,
                     cents_scale: float = 100.0):
    """Optimal decision threshold by Youden's J: over every distinct
    score value v (predict positive when score > v), maximize J =
    TPR - FPR; ties break to the SMALLEST threshold.  J is compared
    through the exact integer cross product tp * neg - fp * pos (same
    ordering as the float J, no float ties), so the chosen cut is
    hash-stable.  Also reports sensitivity/specificity at the cut.

    One O(distinct scores) shuffle + prefix sums.  Output one row
    (n, pos int64, threshold round-6, j round-6, tpr round-6,
    tnr round-6; NULL when a class is empty).
    """
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        y = label_expr(t)
        y = y.combine_chunks() if isinstance(y, pa.ChunkedArray) else y
        ok = pc.and_(pc.is_valid(t.column(score_col)), pc.is_valid(y))
        s = pc.cast(pc.round(pc.multiply(
            pc.cast(t.column(score_col), pa.float64()), cents_scale)),
            pa.int64())
        g = pa.table({"s": s, "y": pc.cast(y, pa.int64())}).filter(ok)
        return g.group_by("s").aggregate(
            [("y", "count"), ("y", "sum")]
        ).rename_columns(["s", "n", "pos"])

    agg = ds.map_batches(
        partials, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("s").aggregate(Sum("n", alias_name="n"),
                             Sum("pos", alias_name="pos"))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("n", pa.int64()), ("pos", pa.int64()),
                            ("threshold", pa.float64()),
                            ("j", pa.float64()),
                            ("tpr", pa.float64()),
                            ("tnr", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        t = t.sort_by([("s", "ascending")])
        s = t.column("s").to_numpy(zero_copy_only=False).astype(
            np.int64)
        cn = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.int64)
        cp = t.column("pos").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = int(cn.sum())
        p = int(cp.sum())
        neg = n - p
        if p == 0 or neg == 0:
            return pa.table({
                "n": pa.array([n], pa.int64()),
                "pos": pa.array([p], pa.int64()),
                "threshold": pa.array([None], pa.float64()),
                "j": pa.array([None], pa.float64()),
                "tpr": pa.array([None], pa.float64()),
                "tnr": pa.array([None], pa.float64()),
            })
        # predict positive when score > s_k: tp = pos above the cut
        cum_p = np.cumsum(cp)
        cum_n = np.cumsum(cn)
        tp = p - cum_p
        fp = neg - (cum_n - cum_p)
        # maximize tp*neg - fp*pos (exact-int ordering of J)
        obj = tp * neg - fp * p
        best = int(np.argmax(obj))      # first max -> smallest cut
        tpb, fpb = int(tp[best]), int(fp[best])
        return pa.table({
            "n": pa.array([n], pa.int64()),
            "pos": pa.array([p], pa.int64()),
            "threshold": pa.array([round(s[best] / cents_scale, 6)],
                                  pa.float64()),
            "j": pa.array(
                [round(tpb / p - fpb / neg, 6)], pa.float64()),
            "tpr": pa.array([round(tpb / p, 6)], pa.float64()),
            "tnr": pa.array([round(1.0 - fpb / neg, 6)],
                            pa.float64()),
        })

    return agg.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def weighted_kappa(ds, *, rater_a_expr, rater_b_expr, k_levels: int):
    """Quadratic-weighted Cohen's kappa between two ORDINAL ratings
    (1..k): disagreement cells weight by ((i-j)/(k-1))^2, so being off
    by one grade costs little and off by four costs everything -- the
    agreement statistic for graded labels (quality tiers, priorities)
    where plain kappa over-penalizes near-misses.

    ``rater_*_expr(table) -> int array (1..k)``.  Exact integer
    contingency from one O(k^2) shuffle; expected weights from the
    marginals.  Output one row (n int64, kappa_w round-6; NULL on
    degenerate marginals).
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        a = rater_a_expr(t)
        a = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
        b = rater_b_expr(t)
        b = b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b
        ok = pc.and_(pc.is_valid(a), pc.is_valid(b))
        g = pa.table({"a": pc.cast(a, pa.int64()),
                      "b": pc.cast(b, pa.int64())}).filter(ok)
        av = g.column("a").to_numpy(zero_copy_only=False)
        bv = g.column("b").to_numpy(zero_copy_only=False)
        cell = (av - 1) * k_levels + (bv - 1)
        cnt = np.bincount(cell, minlength=k_levels * k_levels)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "cell": pa.array(nz.astype(np.int64)),
            "n": pa.array(cnt[nz].astype(np.int64)),
        })

    agg = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("cell").aggregate(Sum("n", alias_name="n"))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("n", pa.int64()),
                            ("kappa_w", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        cell = t.column("cell").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.int64)
        mat = np.zeros((k_levels, k_levels), dtype=np.int64)
        mat[cell // k_levels, cell % k_levels] = n
        total = int(mat.sum())
        i, j = np.meshgrid(np.arange(k_levels), np.arange(k_levels),
                           indexing="ij")
        w = ((i - j) / (k_levels - 1.0)) ** 2
        po = float(np.sum(w * mat)) / total
        ra = mat.sum(axis=1).astype(np.float64)
        rb = mat.sum(axis=0).astype(np.float64)
        pe = float(np.sum(w * np.outer(ra, rb))) / (float(total) *
                                                    total)
        kappa = round(1.0 - po / pe, 6) if pe > 0 else None
        return pa.table({"n": pa.array([total], pa.int64()),
                         "kappa_w": pa.array([kappa], pa.float64())})

    return agg.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)
