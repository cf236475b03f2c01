"""Deterministic (hash-based) sampling for training-data pipelines.

Engine extension (the reference has no sampling).  Unlike
``Dataset.random_sample``, selection here is a pure function of the ROW
KEY — re-runs, retries, and different cluster sizes pick the identical
sample, which is what corpus curation needs (and what makes the op
SQL-oracle-able: DuckDB recomputes the same md5 decision).

Selection rule (``method="md5"``, the default): keep a row iff the
first 8 hex digits of ``md5(str(key))`` read as an integer are
< rate * 16^8.  The md5 loop is the same documented per-row-Python
exception as the fingerprint op (md5 IS the cross-engine contract that
lets DuckDB recompute the decision).  ``method="fast"`` swaps in the
fully-vectorized ``hash64`` decision — same determinism and
nested-sample property, no per-row Python — for the 100 TB hot path
where no SQL engine needs to reproduce the choice.
"""

from __future__ import annotations

import hashlib
from typing import Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.aggregates import hash64

__all__ = ["hash_sample", "stratified_hash_sample", "weighted_hash_sample",
           "cap_per_group", "greedy_coverage",
           "pps_systematic"]

_SCALE = 16 ** 8


def _key_units(arr: pa.ChunkedArray, method: str) -> np.ndarray:
    """Deterministic uniform [0, 1) value per key."""
    if method == "fast":
        return hash64(arr).astype(np.float64) / float(2 ** 64)
    if method != "md5":
        raise ValueError(f"unknown method {method!r}")
    vals = arr.to_pylist()
    return np.array(
        [int(hashlib.md5(str(v).encode("utf-8")).hexdigest()[:8], 16)
         for v in vals],
        dtype=np.float64,
    ) / _SCALE


def hash_sample(ds, *, id_col: str, rate: float, method: str = "md5"):
    """Bernoulli(rate) sample, deterministic in ``id_col``.  Keeps all
    input columns."""

    def kernel(batch: pa.Table) -> pa.Table:
        u = _key_units(batch.column(id_col), method)
        return batch.filter(pa.array(u < rate))

    return ds.map_batches(kernel, batch_format="pyarrow",
                          zero_copy_batch=True)


def stratified_hash_sample(ds, *, id_col: str, strata_col: str,
                           rates: Dict[str, float],
                           default_rate: float = 0.0,
                           method: str = "md5"):
    """Per-stratum deterministic sampling: row keeps with the rate of
    its ``strata_col`` value (``default_rate`` for unlisted strata).
    The downsample-overrepresented-sources primitive of corpus
    balancing."""

    def kernel(batch: pa.Table) -> pa.Table:
        u = _key_units(batch.column(id_col), method)
        strata = batch.column(strata_col).to_pylist()
        thresh = np.array(
            [rates.get(s, default_rate) for s in strata], dtype=np.float64
        )
        return batch.filter(pa.array(u < thresh))

    return ds.map_batches(kernel, batch_format="pyarrow",
                          zero_copy_batch=True)


def weighted_hash_sample(ds, *, id_col: str, weight_col: str,
                         rate_per_unit: float, method: str = "md5"):
    """Probability-proportional-to-size sampling, deterministic in
    ``id_col``: a row keeps iff ``u(id) < weight * rate_per_unit``
    (clamped to 1) — big documents / heavy orders are kept more often,
    the standard PPS primitive for cost-aware corpus subsampling.
    Same md5/hash64 unit-interval contract as :func:`hash_sample`, so
    the SQL oracle recomputes the identical decision."""

    def kernel(batch: pa.Table) -> pa.Table:
        u = _key_units(batch.column(id_col), method)
        w = batch.column(weight_col).to_numpy(
            zero_copy_only=False).astype(np.float64)
        return batch.filter(pa.array(u < np.minimum(
            w * rate_per_unit, 1.0)))

    return ds.map_batches(kernel, batch_format="pyarrow",
                          zero_copy_batch=True)


def cap_per_group(ds, *, by: str, id_col: str, cap: int,
                  method: str = "md5", n_buckets: int = 256):
    """Domain capping: keep at most ``cap`` rows per ``by`` group,
    chosen DETERMINISTICALLY as the rows with the smallest
    ``(hash(id), id)`` rank — the corpus-balancing step that stops one
    domain/source from dominating a web-scale training mix (C4-style
    per-host caps).  Pure function of the row key: re-runs and other
    cluster sizes keep the identical subset, and DuckDB replays the
    decision (``row_number() OVER (PARTITION BY by ORDER BY md5key,
    id) <= cap``).

    Output: (id_col, by) of the survivors.  Plan: one coarse-bucket
    shuffle of (id, key-units, by) — never one tiny group per domain —
    then a vectorized per-bucket sort + segment-rank filter.
    """
    need = [id_col, by]

    def project(batch: pa.Table) -> pa.Table:
        u = _key_units(batch.column(id_col), method)
        coarse = (hash64(batch.column(by)) % np.uint64(n_buckets)).astype(
            np.int64)
        return pa.table({
            id_col: batch.column(id_col),
            by: batch.column(by),
            "_u": pa.array(u),
            "coarse": pa.array(coarse),
        })

    def kernel(group: pa.Table) -> pa.Table:
        t = group.sort_by([(by, "ascending"), ("_u", "ascending"),
                           (id_col, "ascending")])
        keys = t.column(by).to_numpy(zero_copy_only=False)
        n = len(keys)
        if n == 0:
            return t.select(need)
        new = np.ones(n, dtype=bool)
        new[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new)
        seg = np.cumsum(new) - 1
        rank = np.arange(n, dtype=np.int64) - starts[seg]
        return t.filter(pa.array(rank < cap)).select(need)

    return ds.select_columns(need).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("coarse").map_groups(
        kernel, batch_format="pyarrow"
    ).select_columns(need)


def greedy_coverage(ds, *, id_col: str, text_col: str, k: int = 10,
                    ngram: int = 1):
    """Coverage-maximizing corpus selection (greedy facility-location
    on the token-set objective): pick ``k`` documents one at a time,
    each round taking the doc that adds the most NOT-YET-COVERED
    distinct token (or ``ngram``-shingle) hashes — the classic (1-1/e)-approximate greedy for
    monotone submodular coverage, used to seed diverse fine-tuning
    subsets.

    Scale plan per round: the covered-hash set (vocabulary-bounded,
    NOT corpus-bounded) broadcasts once via ``ray.put``; marginal
    gains come from a vectorized ``np.isin`` + ``bincount`` pass over
    the materialized (doc, hash) table as per-block per-doc PARTIALS
    (docs may straddle blocks), made exact by one tiny groupby(doc)
    whose output feeds a per-block argmax combiner — the driver merges
    a handful of candidate rows; the
    winner's hashes are collected (one doc's tokens).  k rounds = k
    scans, no shuffle after the initial distinct.

    Greedy is inherently iterative — rows-only under the driver gate;
    parity is pinned against a brute-force reference in tests.

    Output: (rank, doc_id, gain, covered_total) int64, rank 1..k
    (stops early when the best gain hits 0).
    """
    import ray
    import pyarrow.compute as pc

    from .text import shingle_hash_sets, tokens_and_offsets

    def explode(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(id_col)),
                     pc.is_valid(t.column(text_col)))
        t = t.filter(ok)
        flat, offsets = tokens_and_offsets(t.column(text_col))
        if ngram > 1:
            sh, sh_off = shingle_hash_sets(flat, offsets, n=ngram)
            h = sh.astype(np.int64)
            counts = np.diff(sh_off)
        else:
            h = hash64(flat).astype(np.int64)
            counts = np.diff(offsets)
        docs = np.repeat(
            t.column(id_col).to_numpy(zero_copy_only=False).astype(
                np.int64), counts)
        dh = np.unique(np.stack([docs, h], axis=1), axis=0)
        return pa.table({"doc": pa.array(dh[:, 0]),
                         "h": pa.array(dh[:, 1])})

    base = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    covered = np.array([], dtype=np.int64)
    ranks, winners, gains, totals = [], [], [], []
    for r in range(1, k + 1):
        ref = ray.put(covered)  # already sorted

        def partial_gains(t: pa.Table, _ref=ref) -> pa.Table:
            cov = ray.get(_ref)
            doc = t.column("doc").to_numpy(zero_copy_only=False)
            h = t.column("h").to_numpy(zero_copy_only=False)
            if len(doc) == 0:
                e = pa.array([], pa.int64())
                return pa.table({"doc": e, "gain": e})
            fresh = ~np.isin(h, cov)
            ids, inv = np.unique(doc, return_inverse=True)
            g = np.bincount(inv, weights=fresh.astype(np.float64)
                            ).astype(np.int64)
            # per-block per-doc PARTIALS (a doc may straddle blocks);
            # the groupby below makes them exact before any argmax
            return pa.table({"doc": pa.array(ids),
                             "gain": pa.array(g)})

        from ray.data.aggregate import Sum

        def block_best(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            d = t.column("doc").to_numpy(zero_copy_only=False)
            g = pc.cast(t.column("gain"), pa.int64()).to_numpy(
                zero_copy_only=False)
            j = np.lexsort((d, -g))[0]
            return pa.table({"doc": pa.array([d[j]]),
                             "gain": pa.array([g[j]])})

        parts = pa.concat_tables(list(
            base.map_batches(partial_gains, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("doc").aggregate(Sum("gain", alias_name="gain"))
            .map_batches(block_best, batch_format="pyarrow",
                         zero_copy_batch=True)
            .iter_batches(batch_format="pyarrow")))
        if parts.num_rows == 0:
            break
        d = parts.column("doc").to_numpy(zero_copy_only=False)
        g = parts.column("gain").to_numpy(zero_copy_only=False)
        j = np.lexsort((d, -g))[0]
        if g[j] <= 0:
            break
        win = int(d[j])
        won = base.map_batches(
            lambda t, _w=win: t.filter(pc.equal(t.column("doc"), _w)),
            batch_format="pyarrow", zero_copy_batch=True)
        wh = pa.concat_tables(list(won.iter_batches(
            batch_format="pyarrow"))).column("h").to_numpy(
            zero_copy_only=False)
        covered = np.union1d(covered, wh)
        ranks.append(r)
        winners.append(win)
        gains.append(int(g[j]))
        totals.append(int(covered.size))

    return pa.table({
        "rank": pa.array(ranks, pa.int64()),
        "doc_id": pa.array(winners, pa.int64()),
        "gain": pa.array(gains, pa.int64()),
        "covered_total": pa.array(totals, pa.int64()),
    })


def pps_systematic(ds, *, key_col: str, weight_col: str, k: int = 20,
                   cents_scale: float = 100.0):
    """Systematic probability-proportional-to-size sample: keys sort
    ascending, weights accumulate in exact integer cents, and the i-th
    draw (i = 0..k-1) is the first key whose cumulative weight reaches
    the mid-stride target (2i+1)T/(2k) -- evaluated as the integer
    comparison 2k*cum >= (2i+1)T, so the selection is bit-identical on
    any engine and any partitioning (the classic survey-sampling
    design, deterministic variant).  Non-positive weights drop.

    Single-partition finalize over the (key, weight) aggregate --
    O(distinct keys); pre-aggregate upstream for unbounded key
    domains.  Output: (draw int64, key_col, weight round-6).
    """
    from ray.data.aggregate import Sum

    def units(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(key_col)),
                     pc.is_valid(t.column(weight_col)))
        t = t.filter(ok)
        w = pc.cast(pc.round(pc.multiply(
            pc.cast(t.column(weight_col), pa.float64()), cents_scale)),
            pa.int64())
        return pa.table({"k": t.column(key_col), "w": w})

    agg = ds.select_columns([key_col, weight_col]).map_batches(
        units, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("k").aggregate(Sum("w", alias_name="w"))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("draw", pa.int64()),
                            (key_col, pa.int64()),
                            ("weight", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        t = t.sort_by([("k", "ascending")])
        keys = t.column("k").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
        pos = w > 0
        keys, w = keys[pos], w[pos]
        if len(w) == 0:
            return schema.empty_table()
        cum = np.cumsum(w)
        total = int(cum[-1])
        draws, out_k, out_w = [], [], []
        for i in range(k):
            target = (2 * i + 1) * total          # vs 2k * cum
            j = int(np.searchsorted(2 * k * cum, target))
            if j >= len(cum):
                break
            draws.append(i)
            out_k.append(int(keys[j]))
            out_w.append(round(int(w[j]) / cents_scale, 6))
        return pa.table({
            "draw": pa.array(draws, pa.int64()),
            key_col: pa.array(out_k, pa.int64()),
            "weight": pa.array(out_w, pa.float64()),
        })

    return agg.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)
