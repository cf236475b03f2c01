"""Per-partition distribution-drift check (SURVEY.md §2.I).

Two-sample KS statistic per partition on numeric columns (w / h /
byte-size for the flagship table) against the pooled rest-of-dataset
distribution.  No scipy in the sandbox — the KS machinery is
hand-rolled in functions/aggregates.py.

Plan (one streaming pass + one SMALL shuffle, fully lazy):

1. ``map_batches``: per batch, ONE row per (column, partition-touched)
   carrying the whole fixed-size histogram vector (bins+2 lanes) — the
   shuffle moves histogram vectors, never data rows;
2. ``groupby(col).map_groups``: per column, sum the partial vectors by
   partition (vectorized np.add.at), then per-partition KS vs
   (global - partition) INSIDE the group kernel, emitting the
   group-level Deviation rows directly.

The whole check is a lazy Dataset plan like every other check, so the
suite materializes it CONCURRENTLY with the other branches (it
previously finished driver-side, serializing its full payload read
before any other branch could start — the dominant fixed cost in the
round-1 scaling runs).

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

__all__ = ["DriftCheck", "BinSpec", "psi", "benford", "wasserstein",
           "mutual_information", "cusum_daily", "seasonal_anomaly_daily",
           "periodogram_daily", "qq_compare", "theils_u", "rare_combos"]


def benford(ds, value_col: str, *, scale: int = 100):
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated-/synthetic-data detector for financial-style
    columns.  Values are converted to integer units (``round(v *
    scale)``, e.g. cents) and the first digit is extracted with EXACT
    int64 threshold comparisons — no float ``log10`` whose libm
    rounding could disagree with an oracle at 10^k boundaries.

    Per digit d in 1..9: observed share ``p``, Benford share
    ``q = log10(1 + 1/d)``, and the chi-square contribution
    ``n_total * (p - q)^2 / q``.  Plan: per-batch 9-lane bincount
    partials → ONE ``groupby(digit).sum`` over counts → single-block
    finalize (same shape as :func:`psi`)."""
    from ray.data.aggregate import Sum

    pow10 = 10 ** np.arange(1, 19, dtype=np.int64)  # exact thresholds

    def partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(
            batch.column(value_col).combine_chunks()
            .cast(pa.float64(), safe=False).to_numpy(zero_copy_only=False)
        )
        v = v[~np.isnan(v)]
        iv = np.rint(np.abs(v) * scale).astype(np.int64)
        iv = iv[iv > 0]
        ndig = np.searchsorted(pow10, iv, side="right")  # #digits - 1
        first = iv // pow10[np.maximum(ndig - 1, 0)]
        first = np.where(ndig == 0, iv, first)
        cnt = np.bincount(first, minlength=10)[1:10]
        keep = cnt > 0
        return pa.table({
            "digit": pa.array(np.arange(1, 10)[keep], pa.int64()),
            "n": pa.array(cnt[keep], pa.int64()),
        })

    counts = (
        ds.select_columns([value_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("digit")
        .aggregate(Sum("n", alias_name="n"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            f = pa.array([], pa.float64())
            return pa.table({"digit": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "p": f, "q": f, "chi2": f})
        d = t.column("digit").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        total = n.sum()
        p = n / total
        q = np.log10(1.0 + 1.0 / d)
        chi2 = total * (p - q) ** 2 / q
        return pa.table({
            "digit": t.column("digit"),
            "n": t.column("n"),
            "p": pa.array(p),
            "q": pa.array(q),
            "chi2": pa.array(chi2),
        })

    return counts.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


def psi(ds, value_col: str, *, split_col: str, ref_value,
        lo: float, hi: float, bins: int = 10):
    """Population Stability Index between two slices of one dataset:
    rows where ``split_col == ref_value`` (the reference side) vs all
    other rows.  The standard production drift metric next to
    DriftCheck's KS (same §2.I family; PSI is the one that is exactly
    SQL-expressible, so it carries the family's oracle pairing).

    Per bin ``i`` (fixed-width over [lo, hi), edge bins clamped):
    ``p_i = (nref_i + 0.5) / (Nref + 0.5*bins)`` (Laplace-smoothed so
    empty bins stay finite), ``q_i`` likewise for the comparison side,
    contribution ``(p_i - q_i) * ln(p_i / q_i)``; total PSI is the sum.

    Plan: per-batch bincount partials (2 x bins ints per batch — the
    shuffle moves counts, never rows) → one ``groupby(bin).sum`` over a
    key space of at most ``bins`` values → a single-block finalize that
    computes totals + contributions in-plan.  Returns a lazy Dataset
    with columns (bin, p, q, psi); bins empty on BOTH sides are
    omitted."""
    from ray.data.aggregate import Sum

    width = (float(hi) - float(lo)) / bins

    def partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(
            batch.column(value_col).combine_chunks()
            .cast(pa.float64(), safe=False).to_numpy(zero_copy_only=False)
        )
        is_ref = pc.equal(batch.column(split_col), ref_value)
        r = is_ref.combine_chunks().to_numpy(zero_copy_only=False).astype(bool)
        ok = ~np.isnan(v)
        idx = np.clip(
            np.floor((v[ok] - lo) / width).astype(np.int64), 0, bins - 1
        )
        rr = r[ok]
        nref = np.bincount(idx[rr], minlength=bins)
        ncmp = np.bincount(idx[~rr], minlength=bins)
        keep = (nref + ncmp) > 0
        return pa.table({
            "bin": pa.array(np.flatnonzero(keep), pa.int64()),
            "nref": pa.array(nref[keep], pa.int64()),
            "ncmp": pa.array(ncmp[keep], pa.int64()),
        })

    counts = (
        ds.select_columns([value_col, split_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin")
        .aggregate(Sum("nref", alias_name="nref"),
                   Sum("ncmp", alias_name="ncmp"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"bin": pa.array([], pa.int64()),
                             "p": pa.array([], pa.float64()),
                             "q": pa.array([], pa.float64()),
                             "psi": pa.array([], pa.float64())})
        nref = t.column("nref").to_numpy(zero_copy_only=False).astype(np.float64)
        ncmp = t.column("ncmp").to_numpy(zero_copy_only=False).astype(np.float64)
        p = (nref + 0.5) / (nref.sum() + 0.5 * bins)
        q = (ncmp + 0.5) / (ncmp.sum() + 0.5 * bins)
        contrib = (p - q) * np.log(p / q)
        # p/q are single divisions of exact operands -> bitwise-equal on
        # both engines; only the log-sum contribution keeps the 6dp pin
        return pa.table({
            "bin": t.column("bin"),
            "p": pa.array(p),
            "q": pa.array(q),
            "psi": pa.array(np.round(contrib, 6)),
        })

    # ≤ bins rows reach the finalize: one block, computed in-plan
    return counts.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


def jsd(ds, value_col: str, *, split_col: str, ref_value,
        lo: float, hi: float, bins: int = 10):
    """Jensen–Shannon divergence between two slices of one dataset —
    the SYMMETRIC, bounded ([0, ln 2]) companion to :func:`psi` (same
    §2.I drift family, same Laplace-smoothed fixed-width histograms, so
    it shares PSI's exact SQL oracle form).

    Per bin: ``m_i = (p_i + q_i)/2``, contribution
    ``0.5·p_i·ln(p_i/m_i) + 0.5·q_i·ln(q_i/m_i)``; the total JSD is
    the sum over bins.

    Same plan as psi: per-batch bincount partials → one
    ``groupby(bin).sum`` over ≤ ``bins`` keys → single-block finalize.
    Returns a lazy Dataset (bin, p, q, jsd)."""
    from ray.data.aggregate import Sum

    width = (float(hi) - float(lo)) / bins

    def partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(
            batch.column(value_col).combine_chunks()
            .cast(pa.float64(), safe=False).to_numpy(zero_copy_only=False)
        )
        is_ref = pc.equal(batch.column(split_col), ref_value)
        r = is_ref.combine_chunks().to_numpy(zero_copy_only=False).astype(bool)
        ok = ~np.isnan(v)
        idx = np.clip(
            np.floor((v[ok] - lo) / width).astype(np.int64), 0, bins - 1
        )
        rr = r[ok]
        nref = np.bincount(idx[rr], minlength=bins)
        ncmp = np.bincount(idx[~rr], minlength=bins)
        keep = (nref + ncmp) > 0
        return pa.table({
            "bin": pa.array(np.flatnonzero(keep), pa.int64()),
            "nref": pa.array(nref[keep], pa.int64()),
            "ncmp": pa.array(ncmp[keep], pa.int64()),
        })

    counts = (
        ds.select_columns([value_col, split_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin")
        .aggregate(Sum("nref", alias_name="nref"),
                   Sum("ncmp", alias_name="ncmp"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"bin": pa.array([], pa.int64()),
                             "p": pa.array([], pa.float64()),
                             "q": pa.array([], pa.float64()),
                             "jsd": pa.array([], pa.float64())})
        nref = t.column("nref").to_numpy(zero_copy_only=False).astype(np.float64)
        ncmp = t.column("ncmp").to_numpy(zero_copy_only=False).astype(np.float64)
        p = (nref + 0.5) / (nref.sum() + 0.5 * bins)
        q = (ncmp + 0.5) / (ncmp.sum() + 0.5 * bins)
        m = 0.5 * (p + q)
        contrib = 0.5 * p * np.log(p / m) + 0.5 * q * np.log(q / m)
        return pa.table({
            "bin": t.column("bin"),
            "p": pa.array(p),
            "q": pa.array(q),
            "jsd": pa.array(np.round(contrib, 6)),
        })

    return counts.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


def chi2_independence(ds, a: str, b: str):
    """Pearson chi-square test of independence between two categorical
    columns — the categorical companion to the numeric drift metrics
    (KS / PSI / JSD) in this §2.I family.

    ``chi2 = Σ_cells (observed − expected)² / expected`` over the FULL
    r×c grid (zero-observed cells contribute their expected count),
    ``dof = (r−1)(c−1)``.

    Plan: one tiny ``groupby([a, b]).count()`` (the shuffle moves one
    row per distinct pair), then a single-block finalize that rebuilds
    the dense grid from the observed marginals in numpy.  Returns a
    lazy Dataset with ONE row (chi2, dof, n)."""
    from ray.data.aggregate import Count

    counts = ds.select_columns([a, b]).groupby([a, b]).aggregate(
        Count(alias_name="n"))

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"chi2": pa.array([], pa.float64()),
                             "dof": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        ea = pc.dictionary_encode(t.column(a).combine_chunks()
                                  if isinstance(t.column(a), pa.ChunkedArray)
                                  else t.column(a))
        eb = pc.dictionary_encode(t.column(b).combine_chunks()
                                  if isinstance(t.column(b), pa.ChunkedArray)
                                  else t.column(b))
        ia = np.asarray(ea.indices, dtype=np.int64)
        ib = np.asarray(eb.indices, dtype=np.int64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        r, c = len(ea.dictionary), len(eb.dictionary)
        obs = np.zeros((r, c), dtype=np.float64)
        obs[ia, ib] = n
        total = obs.sum()
        exp = np.outer(obs.sum(axis=1), obs.sum(axis=0)) / total
        chi2 = float(((obs - exp) ** 2 / exp).sum())
        return pa.table({
            "chi2": pa.array([round(chi2, 6)], pa.float64()),
            "dof": pa.array([(r - 1) * (c - 1)], pa.int64()),
            "n": pa.array([int(total)], pa.int64()),
        })

    return counts.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


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
        self.columns = sorted({s.column for s in self.specs})

    def violations(self, ds, ctx: RunContext):
        specs = self.specs
        part_col = ctx.partition_col
        check_id, alpha, min_stat = self.check_id, self.alpha, self.min_stat
        nbins_of = {s.label: s.bins + 2 for s in specs}
        max_lanes = max(nbins_of.values())

        def partial(batch: pa.Table) -> pa.Table:
            parts = (
                np.asarray(batch.column(part_col).to_pylist(), dtype=object)
                if part_col and part_col in batch.column_names
                else np.asarray([""] * batch.num_rows, dtype=object)
            )
            uniq_parts, inv = np.unique(parts, return_inverse=True)
            out_col, out_part, out_hist = [], [], []
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
                # one histogram VECTOR per partition in one bincount:
                # flatten (partition, bucket) into a single index space
                flat = inv[ok] * (s.bins + 2) + idx[ok]
                counts = np.bincount(
                    flat, minlength=len(uniq_parts) * (s.bins + 2)
                ).reshape(len(uniq_parts), s.bins + 2)
                for pi, pname in enumerate(uniq_parts):
                    if not counts[pi].any():
                        continue
                    h = np.zeros(max_lanes, dtype=np.int64)
                    h[: s.bins + 2] = counts[pi]
                    out_col.append(s.label)
                    out_part.append(pname)
                    out_hist.append(h)
            hists = (
                np.stack(out_hist) if out_hist
                else np.empty((0, max_lanes), dtype=np.int64)
            )
            return pa.table({
                "col": pa.array(out_col, pa.string()),
                "part": pa.array(out_part, pa.string()),
                "hist": pa.FixedSizeListArray.from_arrays(
                    pa.array(hists.reshape(-1)), max_lanes
                ),
            })

        def ks_group(group: pa.Table) -> pa.Table:
            label = group.column("col")[0].as_py()
            nbins = nbins_of[label]
            parts = np.asarray(group.column("part").to_pylist(), dtype=object)
            hcol = group.column("hist")
            if isinstance(hcol, pa.ChunkedArray):
                hcol = hcol.combine_chunks()
            H = np.asarray(hcol.values).reshape(len(parts), -1)[:, :nbins]
            uniq, inv = np.unique(parts, return_inverse=True)
            mat = np.zeros((len(uniq), nbins), dtype=np.int64)
            np.add.at(mat, inv, H)
            total = mat.sum(axis=0)
            rows = {k: [] for k in ("part", "value_num", "expected_num",
                                    "deviation")}
            for pi, p in enumerate(uniq):
                rest = total - mat[pi]
                stat = ks_statistic_from_histograms(mat[pi], rest)
                thresh = max(
                    ks_threshold(mat[pi].sum(), rest.sum(), alpha), min_stat
                )
                if stat > thresh:
                    rows["part"].append(p)
                    rows["value_num"].append(stat)
                    rows["expected_num"].append(thresh)
                    rows["deviation"].append(stat - thresh)
            if not rows["part"]:
                return empty_violations()
            n = len(rows["part"])
            return violations_table(
                n, check_id=check_id, kind="deviation",
                partition_id=rows["part"], key=label,
                value=[f"ks={v:.4f}" for v in rows["value_num"]],
                value_num=rows["value_num"],
                expected_num=rows["expected_num"],
                deviation=rows["deviation"],
            )

        from .base import coalesced

        cols_needed = sorted({s.column for s in specs} | ({part_col} if part_col else set()))
        # the partial stream is tiny by construction (|cols| x
        # partitions-touched histogram vectors per batch) — cap the
        # pre-groupby coalesce so the final exchange is a handful of
        # blocks, not an NCPU x NCPU task matrix
        partials = coalesced(
            ds.select_columns(cols_needed).map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            ctx,
            cap=4,
        )
        return partials.groupby("col").map_groups(
            ks_group, batch_format="pyarrow"
        )


def wasserstein(ds, value_col: str, *, split_col: str, ref_value,
                lo: float, hi: float, bins: int = 20):
    """Earth-mover (Wasserstein-1) drift between two slices of one
    dataset over a fixed-width histogram grid: W1 = bin_width · Σ_i
    |CDF_ref(i) − CDF_cmp(i)| — the drift metric that, unlike PSI/JSD,
    weighs HOW FAR probability mass moved, not just that it moved.

    Same plan as :func:`psi` (per-batch bincount partials, one tiny
    ``groupby(bin).sum``, single-block in-plan finalize).  Output: one
    row per grid bin 0..bins-1 (empty bins included — the CDF is
    defined everywhere) with (bin, cdf_ref, cdf_cmp, dcdf); the scalar
    W1 is ``bin_width · Σ dcdf``.  CDFs divide integer cumulative
    counts by the integer total ONCE, so both engines perform the same
    single IEEE division per bin.
    """
    from ray.data.aggregate import Sum

    width = (float(hi) - float(lo)) / bins

    def partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(
            batch.column(value_col).combine_chunks()
            .cast(pa.float64(), safe=False).to_numpy(zero_copy_only=False)
        )
        is_ref = pc.equal(batch.column(split_col), ref_value)
        r = is_ref.combine_chunks().to_numpy(zero_copy_only=False).astype(bool)
        ok = ~np.isnan(v)
        idx = np.clip(
            np.floor((v[ok] - lo) / width).astype(np.int64), 0, bins - 1
        )
        rr = r[ok]
        nref = np.bincount(idx[rr], minlength=bins)
        ncmp = np.bincount(idx[~rr], minlength=bins)
        keep = (nref + ncmp) > 0
        return pa.table({
            "bin": pa.array(np.flatnonzero(keep), pa.int64()),
            "nref": pa.array(nref[keep], pa.int64()),
            "ncmp": pa.array(ncmp[keep], pa.int64()),
        })

    counts = (
        ds.select_columns([value_col, split_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin")
        .aggregate(Sum("nref", alias_name="nref"),
                   Sum("ncmp", alias_name="ncmp"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        full_ref = np.zeros(bins, dtype=np.int64)
        full_cmp = np.zeros(bins, dtype=np.int64)
        if t.num_rows:
            b = t.column("bin").to_numpy(zero_copy_only=False).astype(np.int64)
            full_ref[b] = t.column("nref").to_numpy(zero_copy_only=False)
            full_cmp[b] = t.column("ncmp").to_numpy(zero_copy_only=False)
        tot_ref = max(int(full_ref.sum()), 1)
        tot_cmp = max(int(full_cmp.sum()), 1)
        cdf_ref = np.cumsum(full_ref).astype(np.float64) / tot_ref
        cdf_cmp = np.cumsum(full_cmp).astype(np.float64) / tot_cmp
        return pa.table({
            "bin": pa.array(np.arange(bins, dtype=np.int64)),
            "cdf_ref": pa.array(cdf_ref),
            "cdf_cmp": pa.array(cdf_cmp),
            "dcdf": pa.array(np.abs(cdf_ref - cdf_cmp)),
        })

    return counts.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


def mutual_information(ds, x_col: str, y_col: str):
    """Mutual information between two categorical columns — the
    dependence screen that catches associations chi-square's p-value
    saturates on: MI = Σ_xy p_xy · ln(p_xy / (p_x · p_y)).

    Output: one row per observed (x, y) cell with (x, y, pxy, mi);
    the scalar MI is Σ mi.  Plan mirrors :func:`chi2_independence`:
    per-batch contingency partials via one dictionary-encode +
    bincount, ONE tiny ``groupby(x, y).sum`` (key space = observed
    cells), single-block finalize that forms marginals and per-cell
    contributions.  Every probability is one integer/total division
    and the contribution one ln — identical IEEE ops on both engines,
    pinned at 6 dp.
    """
    from ray.data.aggregate import Sum

    from ..functions.aggregates import dict_encode_keep_null

    def partial(batch: pa.Table) -> pa.Table:
        xc, xd = dict_encode_keep_null(batch.column(x_col))
        yc, yd = dict_encode_keep_null(batch.column(y_col))
        ny = len(yd)
        cell = xc * ny + yc
        cnt = np.bincount(cell, minlength=len(xd) * ny)
        keep = np.flatnonzero(cnt)
        return pa.table({
            x_col: pc.take(xd, pa.array(keep // ny)),
            y_col: pc.take(yd, pa.array(keep % ny)),
            "n": pa.array(cnt[keep].astype(np.int64)),
        })

    counts = (
        ds.select_columns([x_col, y_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([x_col, y_col])
        .aggregate(Sum("n", alias_name="n"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            x_col: pa.array([], pa.string()),
            y_col: pa.array([], pa.string()),
            "pxy": pa.array([], pa.float64()),
            "mi": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        tot = n.sum()
        x = t.column(x_col)
        x = x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x
        y = t.column(y_col)
        y = y.combine_chunks() if isinstance(y, pa.ChunkedArray) else y
        xc, _ = dict_encode_keep_null(x)
        yc, _ = dict_encode_keep_null(y)
        nx = np.bincount(xc, weights=n).astype(np.int64)
        nyv = np.bincount(yc, weights=n).astype(np.int64)
        pxy = n / tot
        px = nx / tot
        py = nyv / tot
        mi = pxy * np.log(pxy / (px[xc] * py[yc]))
        return pa.table({
            x_col: x,
            y_col: y,
            "pxy": pa.array(pxy),
            "mi": pa.array(np.round(mi, 6)),
        })

    return counts.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


def cusum_daily(ds, ts_col: str, *, k: float = 0.5, h: float = 4.0):
    """CUSUM change-point detection over the daily event-count series:
    the sequential drift alarm that fires on a sustained mean shift
    (where a per-day z-score check only flags single outliers).

    Per day (ordered): ``z_d = (n_d − mean) / stddev_samp`` over all
    days, then the clamped recursions ``cp_d = max(0, cp_{d−1} + z_d −
    k)`` and ``cn_d = min(0, cn_{d−1} + z_d + k)``; alarm when
    ``cp > h`` or ``cn < −h``.  Output: (day, cp, cn, alarm) for every
    day.

    Plan: ONE groupby(day) count over per-batch day partials (the
    shuffle moves day counts, never events), then a single-block
    finalize that runs the O(#days) recursion — the state is
    inherently sequential and the day axis is tiny by construction
    (#days ≪ #events), the same bounded-driver-state class as the
    histogram finalizes above.  The SQL oracle replays the recursion
    with a recursive CTE.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(batch.column(ts_col), pa.timestamp("us")),
                     pa.int64())
        day = pc.divide(ts, 86400000000)
        vc = pc.value_counts(day.combine_chunks()
                             if isinstance(day, pa.ChunkedArray) else day)
        return pa.table({
            "day": vc.field("values"),
            "n": vc.field("counts").cast(pa.int64()),
        })

    daily = (
        ds.select_columns([ts_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day").aggregate(Sum("n", alias_name="n"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "day": pa.array([], pa.int64()),
            "cp": pa.array([], pa.float64()),
            "cn": pa.array([], pa.float64()),
            "alarm": pa.array([], pa.bool_()),
        })
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("day", "ascending")])
        day = t.column("day").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        mu = n.mean()
        sd = n.std(ddof=1) if len(n) > 1 else 0.0
        if sd == 0:
            z = np.zeros(len(n))
        else:
            z = (n - mu) / sd
        cp = np.empty(len(n))
        cn = np.empty(len(n))
        p = c = 0.0
        for i, zi in enumerate(z):  # O(#days): bounded, sequential
            p = max(0.0, p + zi - k)
            c = min(0.0, c + zi + k)
            cp[i] = p
            cn[i] = c
        return pa.table({
            "day": pa.array(day),
            "cp": pa.array(np.round(cp, 6)),
            "cn": pa.array(np.round(cn, 6)),
            "alarm": pa.array((cp > h) | (cn < -h)),
        })

    return daily.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


def cramers_v(ds, a: str, b: str):
    """Cramér's V — the [0, 1]-normalized effect size of the chi-square
    independence test (``V = sqrt(chi2 / (n * (min(r, c) - 1)))``), the
    number a drift monitor actually thresholds on (chi2 grows with n;
    V does not).  Same one-tiny-shuffle plan as
    :func:`chi2_independence`; the value is NOT pre-rounded so the
    driver's single canon rounding applies to both engine and SQL."""
    from ray.data.aggregate import Count

    counts = ds.select_columns([a, b]).groupby([a, b]).aggregate(
        Count(alias_name="n"))

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"v": pa.array([], pa.float64()),
                             "chi2": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        ea = pc.dictionary_encode(t.column(a).combine_chunks()
                                  if isinstance(t.column(a), pa.ChunkedArray)
                                  else t.column(a))
        eb = pc.dictionary_encode(t.column(b).combine_chunks()
                                  if isinstance(t.column(b), pa.ChunkedArray)
                                  else t.column(b))
        ia = np.asarray(ea.indices, dtype=np.int64)
        ib = np.asarray(eb.indices, dtype=np.int64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        r, c = len(ea.dictionary), len(eb.dictionary)
        obs = np.zeros((r, c), dtype=np.float64)
        obs[ia, ib] = n
        total = obs.sum()
        exp = np.outer(obs.sum(axis=1), obs.sum(axis=0)) / total
        chi2 = float(((obs - exp) ** 2 / exp).sum())
        k = min(r, c) - 1
        v = float(np.sqrt(chi2 / (total * k))) if k > 0 else 0.0
        return pa.table({
            "v": pa.array([v], pa.float64()),
            "chi2": pa.array([chi2], pa.float64()),
            "n": pa.array([int(total)], pa.int64()),
        })

    return counts.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def ks_exact(ds, value_col: str, *, split_col: str, ref_value):
    """EXACT two-sample Kolmogorov–Smirnov statistic, distributed:
    ``KS = max over pooled values v of |F_ref(v) − F_other(v)|``
    (ECDFs evaluated at every distinct value, ties handled by runs).

    Unlike :class:`DriftCheck`'s histogram KS (binned, streaming, per
    partition), this is the exact global statistic — the verify path —
    computed without any global sort materialization:

    1. one tiny aggregate finds (min, max, n_ref, n_other);
    2. values are range-bucketed (equal-width — balance only, never
       correctness); a per-batch bincount partial + tiny groupby gives
       each bucket's (count, ref-count), whose running sums become the
       PREFIX offsets of every bucket;
    3. one shuffle on bucket id; each bucket kernel sorts locally,
       adds its prefix offsets, and emits its local max |ΔF|; a final
       max reduces.  The classic two-level order-statistic scan.

    Returns one row (ks, n_ref, n_other)."""
    from ray.data.aggregate import Max, Min, Sum

    import ray

    proj = ds.select_columns([value_col, split_col])

    def to_vg(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch.column(value_col), pa.float64())
        g = pc.cast(pc.equal(batch.column(split_col), ref_value),
                    pa.int64())
        t = pa.table({"v": v, "g": g})
        return t.filter(pc.is_valid(t.column("v")))

    vg = proj.map_batches(to_vg, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    stats = vg.aggregate(Min("v", alias_name="lo"),
                         Max("v", alias_name="hi"),
                         Sum("g", alias_name="n1"))
    lo, hi, n1 = stats["lo"], stats["hi"], int(stats["n1"])
    n_all = vg.count()
    n0 = n_all - n1
    B = 32
    if n_all == 0 or n1 == 0 or n0 == 0:
        return pa.table({"ks": pa.array([None], pa.float64()),
                         "n_ref": pa.array([n1], pa.int64()),
                         "n_other": pa.array([n0], pa.int64())})
    edges = np.linspace(lo, hi, B + 1)[1:-1]  # B buckets

    def bucketize(batch: pa.Table) -> pa.Table:
        v = batch.column("v").to_numpy(zero_copy_only=False)
        b = np.searchsorted(edges, v, side="right").astype(np.int64)
        return batch.append_column("b", pa.array(b))

    bucketed = vg.map_batches(bucketize, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    # tiny per-bucket totals -> prefix offsets (B rows on the driver)
    def totals(batch: pa.Table) -> pa.Table:
        b = batch.column("b").to_numpy(zero_copy_only=False)
        g = batch.column("g").to_numpy(zero_copy_only=False)
        nb = np.bincount(b, minlength=B)
        ng = np.bincount(b, weights=g, minlength=B).astype(np.int64)
        return pa.table({"b": pa.array(np.arange(B, dtype=np.int64)),
                         "n": pa.array(nb.astype(np.int64)),
                         "n1": pa.array(ng)})

    tot = pa.concat_tables(list(
        bucketed.map_batches(totals, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("b").aggregate(Sum("n", alias_name="n"),
                                Sum("n1", alias_name="n1"))
        .iter_batches(batch_format="pyarrow"))).sort_by("b")
    bn = np.zeros(B, dtype=np.int64)
    bn1 = np.zeros(B, dtype=np.int64)
    bn[tot.column("b").to_numpy(zero_copy_only=False)] = \
        tot.column("n").to_numpy(zero_copy_only=False)
    bn1[tot.column("b").to_numpy(zero_copy_only=False)] = \
        tot.column("n1").to_numpy(zero_copy_only=False)
    prefix_n = np.concatenate([[0], np.cumsum(bn)[:-1]])
    prefix_n1 = np.concatenate([[0], np.cumsum(bn1)[:-1]])
    ref = ray.put((prefix_n, prefix_n1, float(n1), float(n0)))

    def kernel(group: pa.Table) -> pa.Table:
        pn, pn1, fn1, fn0 = ray.get(ref)
        b = int(group.column("b")[0].as_py())
        t = group.sort_by("v")
        v = t.column("v").to_numpy(zero_copy_only=False)
        g = t.column("g").to_numpy(zero_copy_only=False)
        cum1 = np.cumsum(g) + pn1[b]
        cum = np.arange(1, len(v) + 1) + pn[b]
        # evaluate ECDFs only at run ENDS (ties share one evaluation)
        last = np.ones(len(v), dtype=bool)
        last[:-1] = v[1:] != v[:-1]
        f1 = cum1[last] / fn1
        f0 = (cum[last] - cum1[last]) / fn0
        return pa.table({"d": pa.array([float(np.abs(f1 - f0).max())])})

    local = bucketed.groupby("b").map_groups(kernel,
                                             batch_format="pyarrow")
    ks = local.max("d")
    return pa.table({"ks": pa.array([float(ks)], pa.float64()),
                     "n_ref": pa.array([n1], pa.int64()),
                     "n_other": pa.array([n0], pa.int64())})


def seasonal_anomaly_daily(ds, ts_col: str, *, by: str, z_thresh: float = 2.0):
    """Seasonality-adjusted daily-volume anomaly screen: per group, each
    day's count is z-scored against the mean/stddev of ITS OWN
    day-of-week — a Monday spike is judged against Mondays, so weekly
    rhythm stops masking (or faking) anomalies the plain z-score screen
    (``daily_anomaly``) mis-handles.

    Output: (by, day epoch-days int64, dow int64 0=Sun..6=Sat as SQL
    ``dayofweek``, n, resid_z round-6 — NULL when the dow has <2
    samples or zero variance, like SQL stddev — and ``anomaly``).

    ONE shuffle (daily counts per group); mean/std per (group, dow) and
    the z-scores are vectorized over that tiny aggregate per group.
    """
    from ray.data.aggregate import Count

    def to_day(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(ts_col)),
                     pc.is_valid(t.column(by)))
        t = t.filter(ok)
        us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                     pa.int64())
        day = pc.cast(pc.floor(pc.divide(pc.cast(us, pa.float64()),
                                         86400e6)), pa.int64())
        return pa.table({by: t.column(by), "day": day})

    daily = (
        ds.select_columns([ts_col, by])
        .map_batches(to_day, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([by, "day"]).aggregate(Count(alias_name="n"))
    )

    def kernel(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        day = t.column("day").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        # epoch day 0 = 1970-01-01 = Thursday; SQL dayofweek: Sun=0
        dow = ((day + 4) % 7).astype(np.int64)
        z = np.full(len(n), np.nan)
        for d in range(7):
            m = dow == d
            if m.sum() >= 2:
                mu = n[m].mean()
                sd = n[m].std(ddof=1)
                if sd > 0:
                    z[m] = (n[m] - mu) / sd
        zr = np.round(z, 6)
        return pa.table({
            by: pa.array([t.column(by)[0].as_py()] * len(n)),
            "day": pa.array(day),
            "dow": pa.array(dow),
            "n": t.column("n"),
            "resid_z": pa.array(
                [None if np.isnan(v) else float(v) for v in zr],
                pa.float64()),
            "anomaly": pa.array(
                [bool(abs(v) > z_thresh) if not np.isnan(v) else False
                 for v in zr], pa.bool_()),
        })

    return daily.groupby(by).map_groups(kernel, batch_format="pyarrow")


def periodogram_daily(ds, ts_col: str, *, by: str, max_period: int = 14):
    """Dominant-period detection per group over the daily-count series
    via the FFT periodogram (mean-removed): the "is there a weekly
    cycle in ingest volume" probe.  Output per group: (by, n_days,
    dominant_period_days, peak_power_share) where the period is the
    reciprocal of the strongest nonzero frequency bin (restricted to
    periods 2..max_period) and the share is its fraction of total
    nonzero-frequency power.  Not SQL-expressible (FFT) -> rows-only;
    a planted-cycle unit test pins recovery.

    ONE shuffle (daily counts); the FFT runs on the tiny per-group
    series.  Missing days are treated as zero-count (the series is
    re-laid on the full day grid, as a spectral method requires).
    """
    from ray.data.aggregate import Count

    def to_day(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(ts_col)),
                     pc.is_valid(t.column(by)))
        t = t.filter(ok)
        us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                     pa.int64())
        day = pc.cast(pc.floor(pc.divide(pc.cast(us, pa.float64()),
                                         86400e6)), pa.int64())
        return pa.table({by: t.column(by), "day": day})

    daily = (
        ds.select_columns([ts_col, by])
        .map_batches(to_day, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([by, "day"]).aggregate(Count(alias_name="n"))
    )

    def kernel(t: pa.Table) -> pa.Table:
        day = t.column("day").to_numpy(zero_copy_only=False)
        cnt = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        key = t.column(by)[0].as_py()
        lo, hi = int(day.min()), int(day.max())
        grid = np.zeros(hi - lo + 1)
        grid[day - lo] = cnt
        m = len(grid)
        out = {"n_days": m, "dominant_period_days": None,
               "peak_power_share": None}
        if m >= 4:
            x = grid - grid.mean()
            power = np.abs(np.fft.rfft(x)) ** 2
            freqs = np.fft.rfftfreq(m)  # cycles per day
            with np.errstate(divide="ignore"):
                periods = np.where(freqs > 0, 1.0 / freqs, np.inf)
            ok = (periods >= 2) & (periods <= max_period)
            if ok.any() and power[1:].sum() > 0:
                k = np.flatnonzero(ok)[np.argmax(power[ok])]
                out["dominant_period_days"] = round(float(periods[k]), 3)
                out["peak_power_share"] = round(
                    float(power[k] / power[1:].sum()), 6)
        return pa.table({
            by: pa.array([key]),
            "n_days": pa.array([out["n_days"]], pa.int64()),
            "dominant_period_days": pa.array(
                [out["dominant_period_days"]], pa.float64()),
            "peak_power_share": pa.array(
                [out["peak_power_share"]], pa.float64()),
        })

    return daily.groupby(by).map_groups(kernel, batch_format="pyarrow")


def qq_compare(ds, value_col: str, *, split_col: str, ref_value,
               qs=(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)):
    """Quantile-quantile drift table: the reference slice's deciles side
    by side with the comparison slice's — WHERE a distribution moved,
    not just whether (KS/PSI give one number; the QQ table shows "the
    tail stretched, the median held").

    Output: (q, ref_q, cmp_q, diff) with quantile_cont semantics,
    round-6.  Plan: per-slice exact quantiles in one grouped kernel over
    the projected column (the same exact small/verify path as
    grouped_quantile; t-digest is the scale path).
    """
    qs = list(qs)

    def tag(t: pa.Table) -> pa.Table:
        col = t.column(split_col)
        is_ref = pc.equal(col, ref_value)
        return pa.table({
            "side": pc.if_else(pc.fill_null(is_ref, False),
                               pa.scalar(0, pa.int8()),
                               pa.scalar(1, pa.int8())),
            "v": pc.cast(t.column(value_col), pa.float64()),
        })

    tagged = ds.select_columns([split_col, value_col]).map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True)

    def kernel(group: pa.Table) -> pa.Table:
        v = group.column("v").to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        side = int(group.column("side")[0].as_py())
        vals = np.quantile(v, qs) if len(v) else np.full(len(qs), np.nan)
        return pa.table({
            "side": pa.array([side] * len(qs), pa.int8()),
            "q": pa.array(qs, pa.float64()),
            "qv": pa.array(np.round(vals, 6), pa.float64()),
        })

    per_side = tagged.groupby("side").map_groups(
        kernel, batch_format="pyarrow")

    def widen(t: pa.Table) -> pa.Table:
        side = t.column("side").to_numpy(zero_copy_only=False)
        q = t.column("q").to_numpy(zero_copy_only=False)
        qv = t.column("qv").to_numpy(zero_copy_only=False)
        ref = {qq: vv for qq, vv, s in zip(q, qv, side) if s == 0}
        cmp_ = {qq: vv for qq, vv, s in zip(q, qv, side) if s == 1}
        rows_q = sorted(set(q))
        return pa.table({
            "q": pa.array(rows_q, pa.float64()),
            "ref_q": pa.array([ref.get(x) for x in rows_q], pa.float64()),
            "cmp_q": pa.array([cmp_.get(x) for x in rows_q], pa.float64()),
            "diff": pa.array(
                [round(cmp_[x] - ref[x], 6)
                 if x in ref and x in cmp_ else None
                 for x in rows_q], pa.float64()),
        })

    return per_side.repartition(1).map_batches(
        widen, batch_format="pyarrow", batch_size=None)


def theils_u(ds, x_col: str, y_col: str):
    """Theil's U (uncertainty coefficient) between two categorical
    columns — the ASYMMETRIC normalized-MI dependence score data
    profilers report next to Cramér's V: u_xy = MI/H(x) is the fraction
    of X's entropy explained by knowing Y (and u_yx the reverse), so it
    distinguishes "X determines Y" from "Y determines X", which the
    symmetric chi-square family cannot.

    Plan identical to :func:`mutual_information`: per-batch contingency
    partials (dictionary-encode + bincount), ONE tiny
    ``groupby(x, y).sum`` over observed cells, single-block finalize
    computing H(x)/H(y)/H(x,y) from the marginals via
    ``H = ln t − Σ c·ln c / t`` — identical closed-form IEEE ops on
    both engines, pinned at 6 dp.

    Output: one row (n, h_x, h_y, h_xy, mi, u_xy, u_yx); u terms are
    NULL when the corresponding entropy is 0 (single-category column).
    """
    from ray.data.aggregate import Sum

    from ..functions.aggregates import dict_encode_keep_null

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_kleene(
            pc.is_valid(batch.column(x_col)),
            pc.is_valid(batch.column(y_col))))
        xc, xd = dict_encode_keep_null(batch.column(x_col))
        yc, yd = dict_encode_keep_null(batch.column(y_col))
        ny = max(len(yd), 1)
        cell = xc * ny + yc
        cnt = np.bincount(cell, minlength=len(xd) * ny) if len(cell) \
            else np.zeros(0, dtype=np.int64)
        keep = np.flatnonzero(cnt)
        return pa.table({
            x_col: pc.take(xd, pa.array(keep // ny)),
            y_col: pc.take(yd, pa.array(keep % ny)),
            "n": pa.array(cnt[keep].astype(np.int64)),
        })

    counts = (
        ds.select_columns([x_col, y_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([x_col, y_col])
        .aggregate(Sum("n", alias_name="n"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        def h(cnt: np.ndarray, tot: float) -> float:
            return float(np.log(tot) - np.sum(cnt * np.log(cnt)) / tot)

        if t.num_rows == 0:
            return pa.table({
                "n": pa.array([0], pa.int64()),
                "h_x": pa.array([None], pa.float64()),
                "h_y": pa.array([None], pa.float64()),
                "h_xy": pa.array([None], pa.float64()),
                "mi": pa.array([None], pa.float64()),
                "u_xy": pa.array([None], pa.float64()),
                "u_yx": pa.array([None], pa.float64()),
            })
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        tot = float(n.sum())
        xe = t.column(x_col).to_numpy(zero_copy_only=False)
        ye = t.column(y_col).to_numpy(zero_copy_only=False)
        _, xi = np.unique(xe.astype(str), return_inverse=True)
        _, yi = np.unique(ye.astype(str), return_inverse=True)
        cx = np.bincount(xi, weights=n)
        cy = np.bincount(yi, weights=n)
        h_x, h_y, h_xy = h(cx, tot), h(cy, tot), h(n, tot)
        mi = h_x + h_y - h_xy
        u_xy = mi / h_x if h_x > 0 else None
        u_yx = mi / h_y if h_y > 0 else None
        r6 = lambda v: None if v is None else round(float(np.round(v, 6)), 6)
        return pa.table({
            "n": pa.array([int(tot)], pa.int64()),
            "h_x": pa.array([r6(h_x)], pa.float64()),
            "h_y": pa.array([r6(h_y)], pa.float64()),
            "h_xy": pa.array([r6(h_xy)], pa.float64()),
            "mi": pa.array([r6(mi)], pa.float64()),
            "u_xy": pa.array([r6(u_xy)], pa.float64()),
            "u_yx": pa.array([r6(u_yx)], pa.float64()),
        })

    return counts.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def rare_combos(ds, x_col: str, y_col: str, *, k: int = 5):
    """Most-surprising category combinations: the k observed (x, y)
    cells whose count falls FURTHEST below the independence expectation
    exp = cx·cy/total (ratio = n/exp ascending) — the
    "this state/priority pair should be common but almost never
    happens" screen that chi-square's single scalar hides.

    Same one-exchange contingency plan as :func:`mutual_information`;
    the finalize ranks cells by (ratio, x, y) for a deterministic
    result.  Output: (x, y, n, expected 6 dp, ratio 6 dp), k rows.
    """
    from ray.data.aggregate import Sum

    from ..functions.aggregates import dict_encode_keep_null

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_kleene(
            pc.is_valid(batch.column(x_col)),
            pc.is_valid(batch.column(y_col))))
        xc, xd = dict_encode_keep_null(batch.column(x_col))
        yc, yd = dict_encode_keep_null(batch.column(y_col))
        ny = max(len(yd), 1)
        cell = xc * ny + yc
        cnt = np.bincount(cell, minlength=len(xd) * ny) if len(cell) \
            else np.zeros(0, dtype=np.int64)
        keep = np.flatnonzero(cnt)
        return pa.table({
            x_col: pc.take(xd, pa.array(keep // ny)),
            y_col: pc.take(yd, pa.array(keep % ny)),
            "n": pa.array(cnt[keep].astype(np.int64)),
        })

    counts = (
        ds.select_columns([x_col, y_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([x_col, y_col])
        .aggregate(Sum("n", alias_name="n"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            x_col: pa.array([], pa.string()),
            y_col: pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "expected": pa.array([], pa.float64()),
            "ratio": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        tot = float(n.sum())
        xe = t.column(x_col).to_numpy(zero_copy_only=False)
        ye = t.column(y_col).to_numpy(zero_copy_only=False)
        _, xi = np.unique(xe.astype(str), return_inverse=True)
        _, yi = np.unique(ye.astype(str), return_inverse=True)
        cx = np.bincount(xi, weights=n)
        cy = np.bincount(yi, weights=n)
        exp = cx[xi] * cy[yi] / tot
        # raw IEEE quotients, NOT rounded: counts make these exact
        # rationals that can land on a 6-dp half where np.round
        # (half-even) and SQL round (half-away) disagree; both engines
        # run the same double ops, so raw values are bitwise identical
        ratio = n / exp
        order = np.lexsort((ye.astype(str), xe.astype(str), ratio))[:k]
        idx = pa.array(order, pa.int64())
        xc = t.column(x_col)
        xc = xc.combine_chunks() if isinstance(xc, pa.ChunkedArray) else xc
        yc = t.column(y_col)
        yc = yc.combine_chunks() if isinstance(yc, pa.ChunkedArray) else yc
        return pa.table({
            x_col: pc.take(xc, idx),
            y_col: pc.take(yc, idx),
            "n": pa.array(n[order].astype(np.int64)),
            "expected": pa.array(exp[order]),
            "ratio": pa.array(ratio[order]),
        })

    return counts.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def energy_distance(ds, *, value_col: str, group_col: str, a, b,
                    decimals: int = 2):
    """Two-sample energy distance E = 2·E|X−Y| − E|X−X'| − E|Y−Y'| —
    the e-statistic drift test (Székely–Rizzo), sensitive to ANY
    distributional difference, with the metric interpretability that
    KS/CvM's rank-only statistics lack.

    Exact integer order statistics: values are fixed to integer units
    of 10^-decimals (cents by default), so each pairwise-|diff| sum is
    an exact big integer computed from prefix sums over per-distinct
    counts — O(distinct) work, one double conversion per mean, bitwise
    mirrorable in SQL HUGEINT window arithmetic.  Same O(distinct)
    partial structure as ``robust.mann_whitney``.  Output one row:
    (n_a, n_b, mean_between, mean_within_a, mean_within_b, e);
    e NULL when either side is empty.
    """
    scale = float(10 ** decimals)
    mult = 10.0 ** decimals

    def counts(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        g = g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
        v = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.float64)
        isa = pc.fill_null(pc.equal(g, a), False).to_numpy(
            zero_copy_only=False)
        isb = pc.fill_null(pc.equal(g, b), False).to_numpy(
            zero_copy_only=False)
        ok = (isa | isb) & ~np.isnan(v)
        cents = np.round(v[ok] * mult).astype(np.int64)
        isa = isa[ok]
        order = np.lexsort((isa, cents))
        cents, isa = cents[order], isa[order]
        new = np.ones(len(cents), dtype=bool)
        if len(cents) > 1:
            new[1:] = cents[1:] != cents[:-1]
        seg = np.cumsum(new) - 1
        ca = np.bincount(seg, weights=isa.astype(np.int64)).astype(
            np.int64)
        cnt = np.bincount(seg).astype(np.int64)
        first = np.flatnonzero(new)
        return pa.table({"v": pa.array(cents[first]),
                         "ca": pa.array(ca),
                         "cb": pa.array(cnt - ca)})

    from ray.data.aggregate import Sum

    partials = ds.select_columns([group_col, value_col]).map_batches(
        counts, batch_format="pyarrow", zero_copy_batch=True).groupby(
        "v").aggregate(Sum("ca", alias_name="ca"),
                       Sum("cb", alias_name="cb"))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([
            ("n_a", pa.int64()), ("n_b", pa.int64()),
            ("mean_between", pa.float64()),
            ("mean_within_a", pa.float64()),
            ("mean_within_b", pa.float64()), ("e", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        t = t.sort_by("v")
        v = t.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        ca = t.column("ca").to_numpy(zero_copy_only=False).astype(np.int64)
        cb = t.column("cb").to_numpy(zero_copy_only=False).astype(np.int64)
        n, m = int(ca.sum()), int(cb.sum())

        def pair_sum(left_cnt, right_cnt):
            # Σ_k Σ_l left_k·right_l·|v_k − v_l| via exclusive prefix
            # sums, accumulated in Python ints (can exceed int64)
            below_cnt = np.cumsum(right_cnt) - right_cnt
            below_sum = np.cumsum(right_cnt * v) - right_cnt * v
            tot_cnt = int(right_cnt.sum())
            tot_sum = int((right_cnt * v).sum())
            total = 0
            for k in range(len(v)):
                vb, bc, bs = int(v[k]), int(below_cnt[k]), int(below_sum[k])
                ac = tot_cnt - bc - int(right_cnt[k])
                asum = tot_sum - bs - int(right_cnt[k]) * vb
                total += int(left_cnt[k]) * (vb * bc - bs + asum - vb * ac)
            return total

        if n > 0 and m > 0:
            sxy = pair_sum(ca, cb)
            sxx = pair_sum(ca, ca)
            syy = pair_sum(cb, cb)
            # SQL-identical double ops: one conversion per mean, then
            # the 2·between − within_a − within_b combination
            mxy = float(sxy) / (float(n) * m * scale)
            mxx = float(sxx) / (float(n) * n * scale)
            myy = float(syy) / (float(m) * m * scale)
            e = 2.0 * mxy - mxx - myy
        else:
            mxy = mxx = myy = e = None
        return pa.table({
            "n_a": pa.array([n], pa.int64()),
            "n_b": pa.array([m], pa.int64()),
            "mean_between": pa.array([mxy], pa.float64()),
            "mean_within_a": pa.array([mxx], pa.float64()),
            "mean_within_b": pa.array([myy], pa.float64()),
            "e": pa.array([e], pa.float64()),
        })

    return partials.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)
