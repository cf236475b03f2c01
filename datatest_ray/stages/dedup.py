"""Deduplication operators for large-scale document pipelines.

Engine extensions beyond the datatest reference (SURVEY.md §2.H "set ops
/ dedup": the reference only has the exact-uniqueness check B9).  Five
detectors, each a distributed Ray Data plan:

* exact duplicates        — md5 fingerprint, hash-shuffle groupby
* keep-first per key      — groupby(key) min(id) + count (dedup "choose
                            representative" primitive)
* n-gram Jaccard (exact)  — inverted shingle index: flat_map(shingle,doc)
                            → groupby(shingle) pair emission → groupby
                            (a,b) co-occurrence counts → j = c/(na+nb-c)
* MinHash + LSH           — 64-perm signatures, 16 bands × 4 rows,
                            band-bucket shuffle, exact-Jaccard verify
                            inside each bucket (the scale path: candidate
                            generation is linear in corpus size)
* SimHash                 — 64-bit simhash, 8 bands × 8 bits pigeonhole
                            (guarantees recall for Hamming distance ≤ 7)

Partitioning assumptions: shingle/bucket keys are near-uniform after
hashing; the exact inverted index is quadratic in per-shingle document
frequency, so at 100 TB scale the MinHash path is the default and the
exact path is the verifier.  Embedding-cosine near-dup lives in
stages/similarity.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.aggregates import MinHashSignature, hash64
from .text import shingle_hash_sets, tokens_and_offsets

__all__ = [
    "exact_duplicates",
    "keep_first",
    "jaccard_pairs_exact",
    "jaccard_pairs_prefix",
    "minhash_lsh_pairs",
    "simhash64",
    "simhash_pairs",
    "levenshtein_pairs",
    "jaro_winkler_pairs",
    "sorted_neighborhood_pairs",
    "decontaminate",
    "winnow_pairs",
    "dup_share",
]


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(ds, text_col: str, id_col: str):
    """Duplicate groups by md5 content fingerprint:
    (fingerprint, n_dups=count-1, keep_id=min id).  One hash shuffle on
    the fingerprint; per-batch fingerprints are the combiner."""
    from ray.data.aggregate import Count, Min

    from .text import fingerprints

    fp = fingerprints(ds, text_col, id_col)
    grouped = fp.groupby("fingerprint").aggregate(
        Count(alias_name="n"), Min(id_col, alias_name="keep_id")
    )
    import pyarrow.compute as pc

    def only_dups(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("n"), 1))
        return pa.table(
            {
                "fingerprint": t.column("fingerprint"),
                "n_dups": pc.subtract(t.column("n"), 1),
                "keep_id": t.column("keep_id"),
            }
        )

    return grouped.map_batches(only_dups, batch_format="pyarrow", zero_copy_batch=True)


def keep_first(ds, key_cols, id_col: str):
    """Representative selection: per key group keep the smallest id,
    report group size.  (keys..., keep_id, n)."""
    from ray.data.aggregate import Count, Min

    key_cols = list(key_cols)
    return (
        ds.select_columns(key_cols + [id_col])
        .groupby(key_cols)
        .aggregate(Count(alias_name="n"), Min(id_col, alias_name="keep_id"))
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard via inverted shingle index
# ---------------------------------------------------------------------------


_N_COARSE = 256  # coarse shuffle buckets: the groupby key is bucket-id,
                 # not the raw shingle/band hash, so the shuffle has a
                 # bounded number of near-uniform groups and the per-group
                 # work stays fully vectorized (no tiny-group Python calls)


def _segment_pairs(counts: np.ndarray):
    """Global (i, j) row-index pairs for every within-segment pair, for
    consecutive segments of the given sizes.  Vectorized over segments:
    loops only over pair DISTANCE d (bounded by the largest segment)."""
    total_pairs = int((counts * (counts - 1) // 2).sum())
    if total_pairs == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    out_i = np.empty(total_pairs, dtype=np.int64)
    out_j = np.empty(total_pairs, dtype=np.int64)
    pos = 0
    for d in range(1, int(counts.max())):
        m = counts - d
        live = m > 0
        if not live.any():
            break
        mm = m[live]
        k = int(mm.sum())
        ii = np.repeat(starts[live], mm) + _concat_ranges_np(mm)
        out_i[pos : pos + k] = ii
        out_j[pos : pos + k] = ii + d
        pos += k
    return out_i[:pos], out_j[:pos]


def _concat_ranges_np(counts: np.ndarray) -> np.ndarray:
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ids = np.arange(total, dtype=np.int64)
    offs = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=offs[1:])
    return ids - np.repeat(offs, counts)


def _shingle_rows(ds, text_col: str, id_col: str, n: int):
    """Explode each doc into (coarse, sh, doc, nsh) rows — the inverted
    index input.  sh is the uint64 shingle hash (stored as int64), nsh
    the doc's distinct-shingle count (carried so the pair stage needs no
    second join / broadcast); coarse is the bounded shuffle key."""

    def kernel(batch: pa.Table) -> pa.Table:
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        sh, sh_off = shingle_hash_sets(flat, offsets, n=n)
        counts = np.diff(sh_off)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "coarse": pa.array((sh % np.uint64(_N_COARSE)).astype(np.int64)),
                "sh": pa.array(sh.view(np.int64)),
                "doc": pa.array(np.repeat(ids, counts)),
                "nsh": pa.array(np.repeat(counts, counts)),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


def _pair_key(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Deterministic mix of a doc-id pair into one uint64 (the pair
    shuffle key)."""
    C = np.uint64(0x9E3779B97F4A7C15)
    return (a.astype(np.uint64) * C + b.astype(np.uint64)) * C


def _emit_pairs_from_coarse_group(group: pa.Table) -> pa.Table:
    """Candidate pairs (a<b, with co-occurrence counts COMBINED within
    this bucket) of docs sharing a shingle hashed into this coarse
    bucket — one vectorized pass, no per-shingle Python."""
    docs = group.column("doc").to_numpy(zero_copy_only=False)
    sh = group.column("sh").to_numpy(zero_copy_only=False)
    nsh = group.column("nsh").to_numpy(zero_copy_only=False)
    order = np.lexsort((docs, sh))
    docs, sh, nsh = docs[order], sh[order], nsh[order]
    _, counts = np.unique(sh, return_counts=True)
    ii, jj = _segment_pairs(counts)
    a, b, na, nb = docs[ii], docs[jj], nsh[ii], nsh[jj]
    # local combiner: collapse duplicate (a, b) pairs before the shuffle
    order2 = np.lexsort((b, a))
    a, b, na, nb = a[order2], b[order2], na[order2], nb[order2]
    new = np.ones(len(a), dtype=bool)
    if len(a):
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    seg = np.cumsum(new) - 1
    c = np.bincount(seg)
    first = np.flatnonzero(new)
    a, b, na, nb = a[first], b[first], na[first], nb[first]
    return pa.table(
        {
            "pc": pa.array((_pair_key(a, b) % np.uint64(_N_COARSE)).astype(np.int64)),
            "a": pa.array(a),
            "b": pa.array(b),
            "na": pa.array(na),
            "nb": pa.array(nb),
            "c": pa.array(c),
        }
    )


def jaccard_pairs_exact(ds, text_col: str, id_col: str, *, n: int = 3,
                        threshold: float = 0.8,
                        shuffle_partitions: int | None = None,
                        metric: str = "jaccard"):
    """Every document pair with n-token-shingle similarity >= threshold:
    (a, b, j).  Exact — matches the DuckDB all-pairs oracle.  Cost is
    sum over shingles of df² pair emissions, so this is the small/verify
    path; minhash_lsh_pairs is the scale path.

    ``metric='jaccard'`` scores |A∩B| / |A∪B|; ``metric='overlap'``
    scores the Szymkiewicz–Simpson overlap coefficient
    |A∩B| / min(|A|, |B|) — the CONTAINMENT detector: a short excerpt
    fully quoted inside a long document scores ~1.0 on overlap while
    its Jaccard stays near |A|/|B| (tiny).  Same plan either way; only
    the finalize denominator differs.

    Both shuffles group on a bounded coarse key (shingle-hash buckets,
    then pair-hash buckets) with fully vectorized per-group combines —
    never a groupby over millions of tiny (a, b) groups."""
    if metric not in ("jaccard", "overlap"):
        raise ValueError(f"unknown metric {metric!r}")
    inv = _shingle_rows(ds, text_col, id_col, n)
    if shuffle_partitions:
        # small/medium inputs: coalesce before the all-to-all so the
        # sort/aggregate task matrix is P x P, not n_blocks x n_blocks
        inv = inv.repartition(shuffle_partitions)
    pairs = inv.groupby("coarse").map_groups(
        _emit_pairs_from_coarse_group, batch_format="pyarrow"
    )
    if shuffle_partitions:
        pairs = pairs.repartition(shuffle_partitions)

    def combine_and_finalize(group: pa.Table) -> pa.Table:
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        na = group.column("na").to_numpy(zero_copy_only=False)
        nb = group.column("nb").to_numpy(zero_copy_only=False)
        c = group.column("c").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b, na, nb, c = a[order], b[order], na[order], nb[order], c[order]
        new = np.ones(len(a), dtype=bool)
        if len(a):
            new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        seg = np.cumsum(new) - 1
        csum = np.bincount(seg, weights=c)
        first = np.flatnonzero(new)
        af, bf = a[first], b[first]
        if metric == "overlap":
            j = csum / np.minimum(na[first], nb[first]).astype(np.float64)
        else:
            j = csum / (na[first].astype(np.float64) + nb[first] - csum)
        keep = j >= threshold
        return pa.table(
            {"a": pa.array(af[keep]), "b": pa.array(bf[keep]),
             "j": pa.array(j[keep])}
        )

    return pairs.groupby("pc").map_groups(
        combine_and_finalize, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (scale path)
# ---------------------------------------------------------------------------


def _band_hash(sig_rows: np.ndarray) -> np.ndarray:
    """Mix an (n_docs, r) block of signature lanes into one int64 key."""
    C = np.uint64(0x9E3779B97F4A7C15)
    acc = np.zeros(len(sig_rows), dtype=np.uint64)
    for k in range(sig_rows.shape[1]):
        acc = acc * C + sig_rows[:, k].astype(np.uint64)
    return acc.view(np.int64)


def _make_minhash_bucket_kernel(text_col: str, id_col: str, *, n: int,
                                num_perm: int, bands: int, seed: int):
    """Stage-A kernel factory (exposed for the shuffle-payload unit
    test): each doc emits ``bands`` rows of (coarse, bucket, doc, sig)
    where ``sig`` is the FIXED-SIZE ``num_perm``-lane signature — the
    shuffle payload is O(num_perm) bytes per doc per band, INDEPENDENT of
    document length (round-1 verdict: shipping per-band shingle sets made
    the shuffle carry ~bands x the tokenized corpus)."""
    r = num_perm // bands
    proto = MinHashSignature(k=num_perm, seed=seed)
    a_coef, b_coef = proto.a, proto.b
    mersenne = np.uint64((1 << 61) - 1)

    def to_buckets(batch: pa.Table) -> pa.Table:
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        sh, sh_off = shingle_hash_sets(flat, offsets, n=n)
        counts = np.diff(sh_off)
        n_docs = len(counts)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        # (num_perm, total_shingles) permuted hashes; segment-min per doc
        sigs = np.full((num_perm, n_docs), np.iinfo(np.uint64).max, dtype=np.uint64)
        nonempty = counts > 0
        if sh.size:
            H = (sh[None, :] * a_coef[:, None] + b_coef[:, None]) % mersenne
            seg_starts = sh_off[:-1][nonempty]
            mins = np.minimum.reduceat(H, seg_starts, axis=1)
            sigs[:, nonempty] = mins
        sig_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(np.ascontiguousarray(sigs.T).reshape(-1).view(np.int64)),
            num_perm,
        )
        out_bucket, out_doc, out_sig = [], [], []
        for band in range(bands):
            block = sigs[band * r : (band + 1) * r, :].T  # (n_docs, r)
            keys = _band_hash(block) ^ np.int64(band * 0x51_7C_C1)
            out_bucket.append(keys)
            out_doc.append(ids)
            out_sig.append(sig_arr)
        bucket = np.concatenate(out_bucket)
        return pa.table(
            {
                "coarse": pa.array(
                    (bucket.view(np.uint64) % np.uint64(_N_COARSE)).astype(np.int64)
                ),
                "bucket": pa.array(bucket),
                "doc": pa.array(np.concatenate(out_doc)),
                "sig": pa.concat_arrays(out_sig),
            }
        )

    return to_buckets


def _pairwise_exact_jaccard(a: np.ndarray, b: np.ndarray, needed: np.ndarray,
                            flat_sh: np.ndarray, offs: np.ndarray):
    """Exact Jaccard for each (a[p], b[p]) pair given the distinct-shingle
    arrays of the ``needed`` docs (flat layout: doc k's shingles are
    ``flat_sh[offs[k]:offs[k+1]]``).  Fully vectorized: gather both docs'
    shingles per pair tagged with the pair id, one lexsort, and adjacent-
    equal counting gives the intersection sizes — no per-pair Python."""
    lens = np.diff(offs)
    idx_a = np.searchsorted(needed, a)
    idx_b = np.searchsorted(needed, b)
    P = len(a)

    def gather(idx):
        l = lens[idx]
        rows = np.repeat(offs[:-1][idx], l) + _concat_ranges_np(l)
        pid = np.repeat(np.arange(P, dtype=np.int64), l)
        return flat_sh[rows], pid

    sh_a, pid_a = gather(idx_a)
    sh_b, pid_b = gather(idx_b)
    sh_all = np.concatenate([sh_a, sh_b])
    pid_all = np.concatenate([pid_a, pid_b])
    order = np.lexsort((sh_all, pid_all))
    sh_all, pid_all = sh_all[order], pid_all[order]
    dup = np.zeros(len(sh_all), dtype=bool)
    if len(sh_all) > 1:
        dup[1:] = (sh_all[1:] == sh_all[:-1]) & (pid_all[1:] == pid_all[:-1])
    inter = np.bincount(pid_all[dup], minlength=P).astype(np.float64)
    union = lens[idx_a] + lens[idx_b] - inter
    with np.errstate(invalid="ignore"):
        j = np.where(union > 0, inter / union, 0.0)
    return j


def minhash_lsh_pairs(ds, text_col: str, id_col: str, *, n: int = 3,
                      num_perm: int = 64, bands: int = 16,
                      threshold: float = 0.8, seed: int = 7,
                      shuffle_partitions: int | None = None,
                      est_margin: float = 0.15, verify: str = "exact"):
    """Near-duplicate pairs via MinHash banding: (a, b, j).

    Scale-safe plan (round-1 verdict #3 — the shuffle must NOT carry
    shingle sets):

    1. per batch: vectorized 64-perm signatures (np.minimum.reduceat over
       the flat shingle-hash array); each doc emits ``bands`` rows of
       (bucket, doc, sig) — shuffle payload O(num_perm) per doc per band;
    2. ONE coarse-bucket shuffle; within each exact band bucket the
       candidate filter is the SIGNATURE-JACCARD estimate (fraction of
       equal lanes, vectorized matrix compare) at ``threshold -
       est_margin`` (margin covers the +/- sqrt(j(1-j)/num_perm)
       estimator noise, ~3 sigma at the defaults);
    3. (a, b) groupby dedupes pairs found by several bands;
    4. ``verify='exact'`` (default): a NARROW re-join reads the text of
       candidate docs only (broadcast id set -> is_in filter) and
       computes exact Jaccard fully vectorized (one lexsort over the
       pairs' gathered shingles), so the final ``j`` and the >= threshold
       cut match the all-pairs oracle exactly.  Candidates are the tiny
       LSH survivor set, so materializing them is bounded by design.
       ``verify='signature'`` skips the re-join and emits the estimate
       (fully streaming; for pipelines that tolerate +/-0.06 on j).
       ``verify='join'`` computes the SAME exact j with NO driver
       materialization at all: candidates stay a Dataset, candidate
       docs are selected by a distributed semi-join, and two hash
       joins attach each side's shingle set before a vectorized
       per-pair intersection kernel — the 100 TB path when even the
       survivor set is too big for one process.

    Recall at j >= 0.8 with 16 bands x 4 rows is ~1 - 6e-4."""
    from ray.data.aggregate import Max

    to_buckets = _make_minhash_bucket_kernel(
        text_col, id_col, n=n, num_perm=num_perm, bands=bands, seed=seed
    )
    # any mode that re-verifies exactly must widen the estimate cut by
    # the signature error margin, or true-positive pairs whose 64-perm
    # estimate lands just under the threshold die before the verify
    cut = threshold - est_margin if verify in ("exact", "join") else threshold

    def coarse_pairs(group: pa.Table) -> pa.Table:
        """Segment by exact band bucket; signature-Jaccard estimate for
        every within-bucket pair in one vectorized compare."""
        docs = group.column("doc").to_numpy(zero_copy_only=False)
        bucket = group.column("bucket").to_numpy(zero_copy_only=False)
        sig = group.column("sig")
        if isinstance(sig, pa.ChunkedArray):
            sig = sig.combine_chunks()
        S = np.asarray(sig.values).reshape(len(docs), -1)
        order = np.lexsort((docs, bucket))
        docs, bucket, S = docs[order], bucket[order], S[order]
        _, counts = np.unique(bucket, return_counts=True)
        ii, jj = _segment_pairs(counts)
        keep = docs[ii] != docs[jj]
        ii, jj = ii[keep], jj[keep]
        if not len(ii):
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "j": pa.array([], pa.float64())})
        est = (S[ii] == S[jj]).mean(axis=1)
        keep = est >= cut
        ii, jj, est = ii[keep], jj[keep], est[keep]
        a = np.minimum(docs[ii], docs[jj])
        b = np.maximum(docs[ii], docs[jj])
        return pa.table({"a": pa.array(a.astype(np.int64)),
                         "b": pa.array(b.astype(np.int64)),
                         "j": pa.array(est)})

    buckets = ds.select_columns([id_col, text_col]).map_batches(
        to_buckets, batch_format="pyarrow", zero_copy_batch=True
    )
    if shuffle_partitions:
        buckets = buckets.repartition(shuffle_partitions)
    pairs = buckets.groupby("coarse").map_groups(coarse_pairs, batch_format="pyarrow")
    # a pair can match in several bands — dedupe
    pairs = pairs.groupby(["a", "b"]).aggregate(Max("j", alias_name="j"))
    if verify == "join":
        return _join_exact_verify(ds, pairs, text_col, id_col, n=n,
                                  threshold=threshold,
                                  num_partitions=shuffle_partitions or 16)
    if verify != "exact":
        return pairs

    # -- narrow exact re-join: only candidate docs' text is re-read ------
    import ray

    cand = pairs.to_pandas()
    if not len(cand):
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "j": pa.array([], pa.float64())})
    a = cand["a"].to_numpy().astype(np.int64)
    b = cand["b"].to_numpy().astype(np.int64)
    needed = np.unique(np.concatenate([a, b]))
    needed_ref = ray.put(needed)

    def doc_shingles(batch: pa.Table) -> pa.Table:
        need = ray.get(needed_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mask = np.isin(ids, need)
        if not mask.any():
            return pa.table({
                "doc": pa.array([], pa.int64()),
                "shset": pa.array([], pa.list_(pa.int64())),
            })
        sub = batch.filter(pa.array(mask))
        flat, offsets = tokens_and_offsets(sub.column(text_col))
        sh, sh_off = shingle_hash_sets(flat, offsets, n=n)
        return pa.table({
            "doc": pa.array(sub.column(id_col).to_numpy(
                zero_copy_only=False).astype(np.int64)),
            "shset": pa.ListArray.from_arrays(
                pa.array(sh_off, pa.int32()), pa.array(sh.view(np.int64))
            ),
        })

    sets_tbl = pa.concat_tables(list(
        ds.select_columns([id_col, text_col])
        .map_batches(doc_shingles, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow", batch_size=65536)
    ))
    doc_ids = sets_tbl.column("doc").to_numpy(zero_copy_only=False)
    shset = sets_tbl.column("shset")
    if isinstance(shset, pa.ChunkedArray):
        shset = shset.combine_chunks()
    flat_sh = np.asarray(shset.values)
    lens = np.diff(np.asarray(shset.offsets))
    pos = np.argsort(doc_ids)
    # flat layout ordered by doc id (== `needed` order)
    starts = np.zeros(len(doc_ids) + 1, dtype=np.int64)
    np.cumsum(lens[pos], out=starts[1:])
    src_starts = np.zeros(len(doc_ids), dtype=np.int64)
    np.cumsum(lens[:-1], out=src_starts[1:])
    gather = np.repeat(src_starts[pos], lens[pos]) + _concat_ranges_np(lens[pos])
    flat_sorted = flat_sh[gather]
    j = _pairwise_exact_jaccard(a, b, doc_ids[pos], flat_sorted, starts)
    keep = j >= threshold
    return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep]),
                     "j": pa.array(j[keep])})


def _join_exact_verify(ds, pairs, text_col: str, id_col: str, *, n: int,
                       threshold: float, num_partitions: int = 16):
    """Distributed exact-Jaccard verify of LSH candidate pairs.

    Plan (every step a Dataset op — the driver never sees a row):
    1. semi-join the corpus against the pairs' id set → candidate docs;
    2. per batch, shingle each candidate doc into a list column;
    3. hash-join pairs→sets on ``a`` then on ``b`` (the shuffled
       payload is candidate shingle sets only, bounded by the LSH
       survivor count, not the corpus);
    4. vectorized per-pair intersection: concat both sets tagged by
       row, one lexsort, adjacent-duplicate count = |a ∩ b| (shingle
       sets are dedup'd per doc, so dups across the pair are exactly
       the intersection).
    """
    import ray
    import ray.data as rd

    from .relational import semi_join

    # The streaming executor instantiates EVERY operator's aggregator
    # actor pool up front, so a plan with two JoinOperators holds
    # 2 x num_partitions aggregators alive at once — at small CPU
    # counts (unit tests, laptops) an uncapped pool deadlocks the plan
    # before a single task runs.  Cap so both pools fit the cluster.
    cpus = int(ray.cluster_resources().get("CPU", 8))
    num_partitions = max(2, min(num_partitions, cpus // 2))

    # Pin the candidate pairs in the object store: they feed THREE
    # consumers (the id-set branch, the join probe side, and a schema
    # probe) and would otherwise re-execute the whole LSH lineage once
    # per consumer.  The survivor set is bounded by design, and this is
    # a cluster-side materialize — nothing reaches the driver.
    pairs = pairs.materialize()

    def pair_id_rows(t: pa.Table) -> pa.Table:
        ids = np.concatenate([
            t.column("a").to_numpy(zero_copy_only=False),
            t.column("b").to_numpy(zero_copy_only=False),
        ])
        return pa.table({"doc": pa.array(np.unique(ids).astype(np.int64))})

    need = pairs.map_batches(pair_id_rows, batch_format="pyarrow",
                             zero_copy_batch=True)
    cand = semi_join(ds.select_columns([id_col, text_col]), need,
                     on=id_col, right_on="doc",
                     num_partitions=num_partitions)

    def to_sets(batch: pa.Table) -> pa.Table:
        # the set travels as a BINARY blob of raw int64 hashes: Acero's
        # hash join rejects list-typed payload columns, and binary
        # round-trips with zero per-row Python on both ends
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        sh, sh_off = shingle_hash_sets(flat, offsets, n=n)
        byte_off = (np.asarray(sh_off, dtype=np.int64) * 8).astype(np.int32)
        shset = pa.Array.from_buffers(
            pa.binary(), batch.num_rows,
            [None, pa.py_buffer(byte_off.tobytes()),
             pa.py_buffer(sh.view(np.int64).tobytes())],
        )
        return pa.table({
            "doc": pc.cast(batch.column(id_col), pa.int64()),
            "shset": shset,
        })

    sets = cand.map_batches(to_sets, batch_format="pyarrow",
                            zero_copy_batch=True)
    # Null-key sentinels: Ray's hash join breaks when either side
    # contributes zero non-empty blocks (no candidates at all); null
    # keys never match, so a sentinel row only carries the schema.
    sentinel = rd.from_arrow(pa.table({
        "doc": pa.array([None], pa.int64()),
        "shset": pa.array([None], pa.binary()),
    }))
    sets = sentinel.union(sets)

    # Pair probes: TWO rows per pair keyed by the doc whose set each
    # side needs; the pair identity (a, b) rides along so ONE coarse
    # groupby reunites the sides after a SINGLE hash join — one join
    # pool instead of a chained a-join/b-join (which also needed a
    # block-rebuilding repartition between them).
    def pair_probes(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        m = len(a)
        return pa.table({
            "a": pa.array(np.concatenate([a, a])),
            "b": pa.array(np.concatenate([b, b])),
            "side": pa.array(np.concatenate([
                np.zeros(m, np.int64), np.ones(m, np.int64)])),
            "doc": pa.array(np.concatenate([a, b])),
        })

    probes = pairs.map_batches(pair_probes, batch_format="pyarrow",
                               zero_copy_batch=True)
    probe_sentinel = rd.from_arrow(pa.table({
        "a": pa.array([None], pa.int64()),
        "b": pa.array([None], pa.int64()),
        "side": pa.array([None], pa.int64()),
        "doc": pa.array([None], pa.int64()),
    }))
    # left_outer so the probe sentinel survives and keeps downstream
    # blocks schema-carrying when there are zero candidates
    joined = probe_sentinel.union(probes).join(
        sets, join_type="left_outer", num_partitions=num_partitions,
        on=("doc",), right_on=("doc",))

    def post(t: pa.Table) -> pa.Table:
        """Drop the sentinel, attach the coarse pair-bucket key, and
        rebuild well-formed blocks (the join aggregator emits
        schema-less empties for empty partitions)."""
        empty = pa.table({
            "coarse": pa.array([], pa.int64()),
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "side": pa.array([], pa.int64()),
            "shset": pa.array([], pa.binary()),
        })
        if t.num_rows == 0 or "a" not in t.column_names:
            return empty
        t = t.filter(pc.is_valid(t.column("a")))
        if t.num_rows == 0:
            return empty
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        coarse = (_pair_key(a, b) % np.uint64(_N_COARSE)).astype(np.int64)
        return pa.table({
            "coarse": pa.array(coarse),
            "a": pc.cast(t.column("a"), pa.int64()),
            "b": pc.cast(t.column("b"), pa.int64()),
            "side": pc.cast(t.column("side"), pa.int64()),
            "shset": t.column("shset"),
        })

    tagged = joined.map_batches(post, batch_format="pyarrow",
                                zero_copy_batch=True)

    def exact_pair_j(group: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "j": pa.array([], pa.float64())})
        if group.num_rows == 0:
            return empty
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        side = group.column("side").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, b, a))
        a, b = a[order], b[order]
        arr = group.column("shset")
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        arr = arr.take(pa.array(order, pa.int64()))
        bufs = arr.buffers()
        o = np.frombuffer(bufs[1], np.int32)[
            arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
        data = np.frombuffer(bufs[2], np.int64)
        starts, lens = o[:-1] // 8, (o[1:] - o[:-1]) // 8
        gather = np.repeat(starts, lens) + _concat_ranges_np(lens)
        flat = data[gather]
        # each pair = exactly two adjacent rows (side 0 then side 1)
        npairs = len(a) // 2
        pair_of_row = np.repeat(np.arange(npairs, dtype=np.int64), 2)
        rid = np.repeat(pair_of_row, lens)
        order2 = np.lexsort((flat, rid))
        s, r = flat[order2], rid[order2]
        dup = (s[1:] == s[:-1]) & (r[1:] == r[:-1])
        inter = np.bincount(r[1:][dup], minlength=npairs)
        la, lb = lens[0::2], lens[1::2]
        union = la + lb - inter
        j = inter / np.maximum(union, 1)
        keep = j >= threshold
        return pa.table({
            "a": pa.array(a[0::2][keep].astype(np.int64)),
            "b": pa.array(b[0::2][keep].astype(np.int64)),
            "j": pa.array(j[keep]),
        })

    return tagged.groupby("coarse").map_groups(
        exact_pair_j, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def md5_hash64(flat) -> np.ndarray:
    """uint64 token hashes = the little-endian lower 8 bytes of md5 —
    bit-identical to DuckDB's ``md5_number_lower()``, which is what
    makes the SimHash pipeline SQL-reproducible (round-4: moved
    dedup_simhash from rows-only to oracle-paired).  md5 runs once per
    DISTINCT token via dictionary-encode, then gathers by code, so the
    Python loop is vocabulary-bounded, not token-bounded.

    Null tokens hash as the empty string (= DuckDB
    ``md5_number_lower(coalesce(t, ''))``) — the engine's tokenizers
    never emit nulls, but this is a public helper and must not raise
    AttributeError on a null that arrives from user data."""
    import hashlib

    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if not isinstance(flat, pa.Array):
        flat = pa.array(flat, pa.string())
    if len(flat) == 0:
        return np.empty(0, dtype=np.uint64)
    if flat.null_count:
        flat = pc.fill_null(flat, "")
    enc = pc.dictionary_encode(flat)
    vocab = enc.dictionary.to_pylist()
    hv = np.fromiter(
        (int.from_bytes(hashlib.md5(v.encode("utf-8")).digest()[8:],
                        "little") for v in vocab),
        dtype=np.uint64, count=len(vocab))
    codes = np.asarray(enc.indices, dtype=np.int64)
    return hv[codes]


def simhash64(sh: np.ndarray, sh_off: np.ndarray) -> np.ndarray:
    """64-bit SimHash per doc from flat shingle hashes (vectorized:
    unpack bits, segment-sum, sign)."""
    n_docs = len(sh_off) - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    counts = np.diff(sh_off)
    nonempty = counts > 0
    if not sh.size:
        return out
    bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    votes = bits.astype(np.int64) * 2 - 1  # (n_shingles, 64)
    seg = np.add.reduceat(votes, sh_off[:-1][nonempty], axis=0)  # (ne, 64)
    hi = (seg > 0).astype(np.uint64)
    vals = (hi << np.arange(64, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    out[nonempty] = vals
    return out


def _popcount64(x: np.ndarray) -> np.ndarray:
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)


def simhash_pairs(ds, text_col: str, id_col: str, *, n: int = 3,
                  max_hamming: int = 7,
                  shuffle_partitions: int | None = None):
    """Near-duplicate pairs by SimHash Hamming distance: (a, b, hamming).
    8 bands x 8 bits: any pair within Hamming <= 7 shares at least one
    exact band (pigeonhole), so recall is 1.0 at the default radius —
    with exact-Hamming verification the output is EXACTLY every pair at
    Hamming <= max_hamming.  Token hashes are md5-based
    (``md5_hash64``), so the whole pipeline is deterministic AND
    SQL-reproducible (oracle pair ``dedup_simhash``)."""
    from ray.data.aggregate import Min

    bands, width = 8, 8
    mask = np.uint64((1 << width) - 1)

    def to_buckets(batch: pa.Table) -> pa.Table:
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        sh, sh_off = shingle_hash_sets(flat, offsets, n=n,
                                       tok_hash=md5_hash64)
        sims = simhash64(sh, sh_off)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        out_bucket, out_doc, out_sim = [], [], []
        for band in range(bands):
            chunk = (sims >> np.uint64(band * width)) & mask
            key = (chunk.astype(np.int64) << np.int64(8)) | np.int64(band)
            out_bucket.append(key)
            out_doc.append(ids)
            out_sim.append(sims.view(np.int64))
        bucket = np.concatenate(out_bucket)
        return pa.table(
            {
                "coarse": pa.array(
                    (bucket.view(np.uint64) % np.uint64(_N_COARSE)).astype(np.int64)
                ),
                "bucket": pa.array(bucket),
                "doc": pa.array(np.concatenate(out_doc)),
                "sim": pa.array(np.concatenate(out_sim)),
            }
        )

    def coarse_pairs(group: pa.Table) -> pa.Table:
        docs = group.column("doc").to_numpy(zero_copy_only=False)
        bucket = group.column("bucket").to_numpy(zero_copy_only=False)
        sims = group.column("sim").to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.lexsort((docs, bucket))
        docs, bucket, sims = docs[order], bucket[order], sims[order]
        _, counts = np.unique(bucket, return_counts=True)
        ii, jj = _segment_pairs(counts)
        if not len(ii):
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "hamming": pa.array([], pa.int64())}
            )
        ham = _popcount64(np.bitwise_xor(sims[ii], sims[jj]))
        keep = (ham <= max_hamming) & (docs[ii] != docs[jj])
        return pa.table(
            {
                "a": pa.array(docs[ii][keep].astype(np.int64)),
                "b": pa.array(docs[jj][keep].astype(np.int64)),
                "hamming": pa.array(ham[keep].astype(np.int64)),
            }
        )

    buckets = ds.select_columns([id_col, text_col]).map_batches(
        to_buckets, batch_format="pyarrow", zero_copy_batch=True
    )
    if shuffle_partitions:
        buckets = buckets.repartition(shuffle_partitions)
    pairs = buckets.groupby("coarse").map_groups(coarse_pairs, batch_format="pyarrow")
    return pairs.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming"))


# ---------------------------------------------------------------------------
# Edit-distance (Levenshtein) near-dup — the character-level verifier
# ---------------------------------------------------------------------------


def levenshtein_pairs(ds, text_col: str, id_col: str, *, block_cols,
                      prefix: int = 32, max_dist: int = 12,
                      pair_chunk: int = 1 << 17):
    """Pairs of docs whose first ``prefix`` characters are within
    ``max_dist`` edits, blocked by ``block_cols`` (str or list) — the
    character-level near-dup verifier (catches OCR noise / small edits
    that token-set Jaccard misses).

    Plan: ONE ``groupby(block_cols)`` shuffle of (id, prefix) — never
    the full text — then a per-block kernel that runs the classic
    Levenshtein DP **vectorized across candidate pairs**: strings
    become UTF-32 code-point matrices, the DP walks the L x L lattice
    with pair-length numpy vectors in chunks of ``pair_chunk`` (bounds
    peak memory to ~chunk x prefix x 4 bytes regardless of block size;
    DP cells are int16 — distances never exceed ``prefix``), and each
    pair's distance is read off the row matching its left length.
    O(pairs * L^2) element ops, zero Python per pair.

    Partitioning assumption: a BLOCK's pair count fits a task's WORK
    budget (all-pairs within block) — block on a real blocking key
    (lang + length band here; LSH band / simhash band / fingerprint
    prefix at 100 TB).  This operator is the verify step, like
    ``jaccard_pairs_exact`` for MinHash.
    """
    blocks = [block_cols] if isinstance(block_cols, str) else list(block_cols)

    def project(batch: pa.Table) -> pa.Table:
        cols = {id_col: batch.column(id_col)}
        for c in blocks:
            cols[c] = batch.column(c)
        cols["prefix"] = pc.utf8_slice_codeunits(
            batch.column(text_col), 0, prefix)
        return pa.table(cols)

    def _dp_chunk(A, B, la, lb, L):
        """Distances for one chunk of pairs; A/B int32 (P, L), int16 DP."""
        P = len(la)
        dist = np.zeros(P, dtype=np.int64)
        row = np.broadcast_to(
            np.arange(L + 1, dtype=np.int16), (P, L + 1)
        ).copy()
        take0 = la == 0  # empty left side: distance = lb
        dist[take0] = lb[take0]
        one = np.int16(1)
        for i in range(1, L + 1):
            prev = row
            row = np.empty_like(prev)
            row[:, 0] = i
            ai = A[:, i - 1][:, None]  # (P, 1)
            sub = prev[:, :-1] + (ai != B)  # substitution costs, (P, L)
            up = prev[:, 1:] + one  # deletion
            best = np.minimum(sub, up)
            for j in range(1, L + 1):
                row[:, j] = np.minimum(best[:, j - 1], row[:, j - 1] + one)
            take = la == i
            if take.any():
                dist[take] = row[take, lb[take]]
        return dist

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "a_id": pa.array([], pa.int64()),
            "b_id": pa.array([], pa.int64()),
            "dist": pa.array([], pa.int64()),
        })
        n = group.num_rows
        if n < 2:
            return empty
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        texts = group.column("prefix").to_pylist()
        L = prefix
        # code-point matrix, -1 padding (never matches a real char)
        mat = np.full((n, L), -1, dtype=np.int32)
        lens = np.empty(n, dtype=np.int64)
        for r, s in enumerate(texts):
            cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)[:L]
            mat[r, : len(cp)] = cp
            lens[r] = len(cp)
        ii, jj = np.triu_indices(n, k=1)
        # canonical (smaller id, larger id) orientation
        swap = ids[ii] > ids[jj]
        ii, jj = np.where(swap, jj, ii), np.where(swap, ii, jj)
        # length prefilter: lev >= |la - lb|
        lens_ok = np.abs(lens[ii] - lens[jj]) <= max_dist
        ii, jj = ii[lens_ok], jj[lens_ok]
        out_a, out_b, out_d = [], [], []
        for s0 in range(0, len(ii), pair_chunk):
            ci = ii[s0 : s0 + pair_chunk]
            cj = jj[s0 : s0 + pair_chunk]
            d = _dp_chunk(mat[ci], mat[cj], lens[ci], lens[cj], L)
            keep = d <= max_dist
            out_a.append(ids[ci][keep].astype(np.int64))
            out_b.append(ids[cj][keep].astype(np.int64))
            out_d.append(d[keep])
        if not out_a:
            return empty
        return pa.table({
            "a_id": pa.array(np.concatenate(out_a)),
            "b_id": pa.array(np.concatenate(out_b)),
            "dist": pa.array(np.concatenate(out_d)),
        })

    return (
        ds.select_columns(list(dict.fromkeys([id_col, *blocks, text_col])))
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(blocks)
        .map_groups(kernel, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Jaro-Winkler near-dup — the short-string / name-matching verifier
# ---------------------------------------------------------------------------


def _jw_chunk(A: np.ndarray, B: np.ndarray, la: np.ndarray,
              lb: np.ndarray) -> np.ndarray:
    """Jaro-Winkler similarity for one chunk of string pairs,
    vectorized ACROSS pairs (standard variant: prefix<=4, p=0.1, boost
    only when jaro > 0.7 — matches DuckDB's jaro_winkler_similarity).

    A/B are (P, L) int32 code-point matrices padded with distinct
    negative sentinels so padding never matches.  The greedy window
    match walks the L x L position lattice once with (P,)-vector masks
    — O(P * L^2) elementwise ops, zero Python per pair.
    """
    P, L = A.shape
    w = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    used_b = np.zeros((P, L), dtype=bool)
    aseq = np.full((P, L), -1, dtype=np.int32)
    acnt = np.zeros(P, dtype=np.int64)
    for i in range(L):
        ai = A[:, i]
        open_ = i < la
        if not open_.any():
            break
        lo = np.maximum(i - w, 0)
        hi = np.minimum(i + w + 1, lb)
        found = np.zeros(P, dtype=bool)
        for j in range(L):
            cand = ((~found) & open_ & (j >= lo) & (j < hi)
                    & (~used_b[:, j]) & (B[:, j] == ai))
            if cand.any():
                rows = np.flatnonzero(cand)
                used_b[rows, j] = True
                aseq[rows, acnt[rows]] = ai[rows]
                acnt[rows] += 1
                found |= cand
    m = acnt
    bseq = np.full((P, L), -1, dtype=np.int32)
    bcnt = np.zeros(P, dtype=np.int64)
    for j in range(L):
        rows = np.flatnonzero(used_b[:, j])
        if len(rows):
            bseq[rows, bcnt[rows]] = B[rows, j]
            bcnt[rows] += 1
    pos = np.arange(L, dtype=np.int64)[None, :]
    t = (((aseq != bseq) & (pos < m[:, None])).sum(axis=1) // 2)
    mf = m.astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        jaro = (mf / la + mf / lb + (mf - t) / mf) / 3.0
    jaro = np.where(m == 0, 0.0, jaro)
    k = min(4, L)
    pref_eq = (A[:, :k] == B[:, :k]) & (
        np.arange(k, dtype=np.int64)[None, :]
        < np.minimum(la, lb)[:, None])
    lpref = np.cumprod(pref_eq, axis=1).sum(axis=1).astype(np.float64)
    return np.where(jaro > 0.7, jaro + lpref * 0.1 * (1.0 - jaro), jaro)


def _codepoint_matrix(texts, L: int):
    """(n, L) int32 code-point matrix padded with -1 + true lengths —
    the shared input layout of the chunked JW kernel."""
    n = len(texts)
    mat = np.full((n, L), -1, dtype=np.int32)
    lens = np.empty(n, dtype=np.int64)
    for r, s in enumerate(texts):
        cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)[:L]
        mat[r, : len(cp)] = cp
        lens[r] = len(cp)
    return mat, lens


def _jw_score_pairs(mat, lens, ids, ii, jj, *, threshold: float,
                    pair_chunk: int):
    """Score candidate index pairs (ii, jj) with the chunked JW kernel,
    keep >= threshold, orient ids a < b.  Shared by the blocked
    all-pairs and sorted-neighborhood operators — the pad sentinel
    rewrite (-1 vs -2 so pad never matches pad) lives in ONE place."""
    out_a, out_b, out_j = [], [], []
    for s0 in range(0, len(ii), pair_chunk):
        ci = ii[s0: s0 + pair_chunk]
        cj = jj[s0: s0 + pair_chunk]
        Bm = mat[cj].copy()
        Bm[Bm == -1] = -2
        jw = _jw_chunk(mat[ci], Bm, lens[ci], lens[cj])
        keep = jw >= threshold
        a = ids[ci][keep].astype(np.int64)
        b = ids[cj][keep].astype(np.int64)
        swap = a > b
        out_a.append(np.where(swap, b, a))
        out_b.append(np.where(swap, a, b))
        out_j.append(jw[keep])
    if not out_a:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.float64))
    return (np.concatenate(out_a), np.concatenate(out_b),
            np.concatenate(out_j))


_JW_EMPTY = pa.table({
    "a_id": pa.array([], pa.int64()),
    "b_id": pa.array([], pa.int64()),
    "jw": pa.array([], pa.float64()),
})


def jaro_winkler_pairs(ds, text_col: str, id_col: str, *, block_cols,
                       prefix: int = 32, threshold: float = 0.85,
                       lowercase: bool = True,
                       pair_chunk: int = 1 << 16):
    """Pairs of rows in the same block whose (lowercased, truncated)
    strings have Jaro-Winkler similarity >= ``threshold`` — the
    name/title-matching near-dup family (entity resolution, catalog
    dedup), complementing the token-set (Jaccard) and edit-distance
    (Levenshtein) verifiers.

    Same scale plan as :func:`levenshtein_pairs`: ONE
    ``groupby(block_cols)`` shuffle of (id, prefix); within each block
    the all-pairs JW kernel runs vectorized across ``pair_chunk``-sized
    pair chunks.  Output: (a_id, b_id, jw).
    """
    blocks = [block_cols] if isinstance(block_cols, str) else list(block_cols)

    def project(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col)
        if lowercase:
            s = pc.utf8_lower(s)
        cols = {id_col: batch.column(id_col)}
        for c in blocks:
            cols[c] = batch.column(c)
        cols["prefix"] = pc.utf8_slice_codeunits(s, 0, prefix)
        return pa.table(cols)

    def kernel(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return _JW_EMPTY
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        mat, lens = _codepoint_matrix(group.column("prefix").to_pylist(),
                                      prefix)
        ii, jj = np.triu_indices(n, k=1)
        a, b, jw = _jw_score_pairs(mat, lens, ids, ii, jj,
                                   threshold=threshold,
                                   pair_chunk=pair_chunk)
        return pa.table({"a_id": pa.array(a), "b_id": pa.array(b),
                         "jw": pa.array(jw)})

    return (
        ds.select_columns(list(dict.fromkeys([id_col, *blocks, text_col])))
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(blocks)
        .map_groups(kernel, batch_format="pyarrow")
    )


def sorted_neighborhood_pairs(ds, text_col: str, id_col: str, *,
                              block_chars: int = 3, window: int = 5,
                              prefix: int = 32, threshold: float = 0.88,
                              pair_chunk: int = 1 << 16):
    """Sorted-neighborhood record linkage (Hernández & Stolfo's SNM):
    sort records by a normalized key, compare each record only against
    its next ``window`` neighbors in sort order — O(n·window) candidate
    pairs instead of blocking's O(Σ block²) — scored with the same
    vectorized Jaro-Winkler kernel DuckDB replays exactly.

    The sort itself is distributed by PREFIX BLOCKS (first
    ``block_chars`` chars of the key): one groupby shuffle of
    (id, key32), a per-block Arrow sort, then the d = 1..window
    diagonal pairs scored chunk-vectorized.  Neighborhoods never span
    prefix blocks — the standard SNM pass/window trade-off, documented
    so the oracle can mirror it (``row_number() OVER (PARTITION BY
    block ORDER BY key, id)`` self-join on rn+1..rn+window).

    Output: (a_id, b_id, jw) with a_id < b_id.
    """

    def project(batch: pa.Table) -> pa.Table:
        s = pc.utf8_lower(batch.column(text_col))
        return pa.table({
            id_col: batch.column(id_col),
            "blk": pc.utf8_slice_codeunits(s, 0, block_chars),
            "key": pc.utf8_slice_codeunits(s, 0, prefix),
        })

    def kernel(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return _JW_EMPTY
        t = group.sort_by([("key", "ascending"), (id_col, "ascending")])
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        mat, lens = _codepoint_matrix(t.column("key").to_pylist(), prefix)
        ii_parts, jj_parts = [], []
        for d in range(1, min(window, n - 1) + 1):
            ii_parts.append(np.arange(n - d, dtype=np.int64))
            jj_parts.append(np.arange(d, n, dtype=np.int64))
        ii = np.concatenate(ii_parts)
        jj = np.concatenate(jj_parts)
        a, b, jw = _jw_score_pairs(mat, lens, ids, ii, jj,
                                   threshold=threshold,
                                   pair_chunk=pair_chunk)
        return pa.table({"a_id": pa.array(a), "b_id": pa.array(b),
                         "jw": pa.array(jw)})

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("blk")
        .map_groups(kernel, batch_format="pyarrow")
        .select_columns(["a_id", "b_id", "jw"])
    )


def decontaminate(ds, text_col: str, id_col: str, *,
                  eval_rate: float = 0.05, n: int = 3,
                  min_shared: int = 2):
    """Train/eval decontamination: flag training documents sharing at
    least ``min_shared`` distinct n-token shingles with ANY document of
    the held-out set — the benchmark-leakage scan every LLM corpus
    needs before training.  The eval membership is the deterministic
    md5 contract (``hash_sample`` rule at ``eval_rate``), so the whole
    audit is SQL-replayable.

    Output: (id_col, n_shared) for contaminated TRAIN docs only.

    Plan: shingle rows carry an is-eval flag; ONE groupby over bounded
    shingle-hash buckets marks each shingle value "dirty" when any
    eval doc contains it and emits per-train-doc dirty counts (a
    shingle lives in exactly one bucket and per-doc shingles are
    distinct, so bucket partials SUM exactly); one tiny groupby(doc)
    finishes.  The eval side is never broadcast or collected — both
    sides stream through the same shuffle.
    """
    from ray.data.aggregate import Sum

    from .sampling import _key_units

    def shingle_side_rows(batch: pa.Table) -> pa.Table:
        flat, offsets = tokens_and_offsets(batch.column(text_col))
        sh, sh_off = shingle_hash_sets(flat, offsets, n=n)
        counts = np.diff(sh_off)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        ev = _key_units(batch.column(id_col), "md5") < eval_rate
        return pa.table({
            "coarse": pa.array((sh % np.uint64(_N_COARSE)).astype(np.int64)),
            "sh": pa.array(sh.view(np.int64)),
            "doc": pa.array(np.repeat(ids, counts).astype(np.int64)),
            "ev": pa.array(np.repeat(ev, counts)),
        })

    def bucket(group: pa.Table) -> pa.Table:
        empty = pa.table({"doc": pa.array([], pa.int64()),
                          "k": pa.array([], pa.int64())})
        m = group.num_rows
        if m == 0:
            return empty
        sh = group.column("sh").to_numpy(zero_copy_only=False)
        doc = group.column("doc").to_numpy(zero_copy_only=False)
        ev = group.column("ev").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, sh))
        sh, doc, ev = sh[order], doc[order], ev[order]
        new = np.ones(m, dtype=bool)
        new[1:] = sh[1:] != sh[:-1]
        run = np.cumsum(new) - 1
        dirty_run = np.bincount(run, weights=ev) > 0
        hit = dirty_run[run] & ~ev
        if not hit.any():
            return empty
        d, c = np.unique(doc[hit], return_counts=True)
        return pa.table({"doc": pa.array(d),
                         "k": pa.array(c.astype(np.int64))})

    hits = (
        ds.select_columns([id_col, text_col])
        .map_batches(shingle_side_rows, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("coarse").map_groups(bucket, batch_format="pyarrow")
        .groupby("doc").aggregate(Sum("k", alias_name="n_shared"))
        .filter(expr=f"n_shared >= {int(min_shared)}")
    )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t.column("doc"),
                         "n_shared": t.column("n_shared")})

    return hits.map_batches(rename, batch_format="pyarrow",
                            zero_copy_batch=True)


def cluster_representatives(ds, text_col: str, id_col: str, *,
                            quality_col: str, n: int = 3,
                            threshold: float = 0.8,
                            shuffle_partitions: int | None = None):
    """Keep-BEST-per-cluster selection: near-dup pairs (exact n-gram
    Jaccard) -> connected components -> within each cluster the document
    with the highest ``quality_col`` (ties: lowest id) becomes the
    representative.  This is the dedup decision a training-data pipeline
    actually applies — keep-first (``dedup.py::keep_first``) keys on
    arrival order; this keys on a quality signal.

    Output: one row per CLUSTERED document
    ``(id_col, cluster_id, rep_id, keep)``; singletons (never in any
    pair) are implicitly kept and not emitted.

    Plan: the pair/CC shuffles are the dominant cost (see
    ``jaccard_pairs_exact`` / ``graph.connected_components``); the
    representative pick is one more coarse-bucket shuffle on
    ``cluster_id`` with a vectorized segment argmax — never a groupby
    with one tiny group per cluster."""
    from .graph import connected_components
    from .relational import safe_join

    pairs = jaccard_pairs_exact(
        ds.select_columns([id_col, text_col]), text_col, id_col, n=n,
        threshold=threshold, shuffle_partitions=shuffle_partitions)
    labels = connected_components(
        pairs, a_col="a", b_col="b",
        shuffle_partitions=shuffle_partitions)
    quality = ds.select_columns([id_col, quality_col])
    # join key coalesces into the left name 'node'
    joined = safe_join(labels, quality, join_type="inner",
                       num_partitions=shuffle_partitions or 8,
                       on="node", right_on=id_col)

    def add_bucket(t: pa.Table) -> pa.Table:
        coarse = (hash64(t.column("cluster_id")) % np.uint64(256)).astype(
            np.int64)
        return t.append_column("coarse", pa.array(coarse))

    def kernel(group: pa.Table) -> pa.Table:
        t = group.sort_by([("cluster_id", "ascending"),
                           (quality_col, "descending"),
                           ("node", "ascending")])
        cid = t.column("cluster_id").to_numpy(zero_copy_only=False)
        node = t.column("node").to_numpy(zero_copy_only=False)
        m = len(cid)
        if m == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster_id": pa.array([], pa.int64()),
                             "rep_id": pa.array([], pa.int64()),
                             "keep": pa.array([], pa.bool_())})
        new_seg = np.ones(m, dtype=bool)
        new_seg[1:] = cid[1:] != cid[:-1]
        seg = np.cumsum(new_seg) - 1
        first = np.flatnonzero(new_seg)
        rep = node[first[seg]]
        return pa.table({id_col: pa.array(node),
                         "cluster_id": pa.array(cid),
                         "rep_id": pa.array(rep),
                         "keep": pa.array(node == rep)})

    return joined.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("coarse").map_groups(
        kernel, batch_format="pyarrow"
    ).select_columns([id_col, "cluster_id", "rep_id", "keep"])


def latest_by_key(ds, *, key_cols, order_col: str, id_col: str,
                  n_buckets: int = 256):
    """Snapshot compaction (CDC upsert semantics): keep each key's row
    with the greatest ``(order_col, id_col)`` — "latest version wins",
    the streaming-table counterpart of :func:`keep_first` (which keys
    on SMALLEST id / arrival order).  Ties on ``order_col`` break by
    ``id_col`` so a SQL ``row_number() OVER (ORDER BY order_col DESC,
    id_col DESC)`` oracle picks the identical row.

    One coarse-bucket shuffle on the composite key hash, per-bucket
    Arrow sort + vectorized take of each segment's first row."""
    keys = list(key_cols)

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = np.zeros(batch.num_rows, dtype=np.uint64)
        for k in keys:
            h ^= hash64(batch.column(k)) * np.uint64(0x9E3779B97F4A7C15)
        coarse = (h % np.uint64(n_buckets)).astype(np.int64)
        return batch.append_column("coarse", pa.array(coarse))

    def kernel(group: pa.Table) -> pa.Table:
        order = [(k, "ascending") for k in keys] + [
            (order_col, "descending"), (id_col, "descending")]
        t = group.drop_columns(["coarse"]).sort_by(order)
        n = t.num_rows
        if n == 0:
            return t
        seg_key = t.column(keys[0]).to_numpy(zero_copy_only=False)
        new_seg = np.ones(n, dtype=bool)
        new_seg[1:] = seg_key[1:] != seg_key[:-1]
        for k in keys[1:]:
            kv = t.column(k).to_numpy(zero_copy_only=False)
            new_seg[1:] |= kv[1:] != kv[:-1]
        return t.take(pa.array(np.flatnonzero(new_seg)))

    return ds.map_batches(add_bucket, batch_format="pyarrow",
                          zero_copy_batch=True).groupby(
        "coarse").map_groups(kernel, batch_format="pyarrow")


def golden_record(ds, *, key_col: str, order_col: str, id_col: str,
                  value_cols, n_buckets: int = 256):
    """Survivorship / golden-record merge (MDM): per key, each value
    column independently takes its LATEST NON-NULL value (ordered by
    ``(order_col, id_col)`` descending) — unlike :func:`latest_by_key`
    (whole-row winner), stale rows still contribute columns the newest
    row left null.  Output: one row per key
    ``(key_col, <value_cols...>)``.

    One coarse-bucket shuffle on the key hash; the kernel sorts each
    bucket newest-first and takes each segment's first valid position
    per column via one ``np.minimum.at`` scatter — no Python loop over
    rows or keys."""
    cols = list(value_cols)
    need = list(dict.fromkeys([key_col, order_col, id_col] + cols))

    def add_bucket(batch: pa.Table) -> pa.Table:
        coarse = (hash64(batch.column(key_col))
                  % np.uint64(n_buckets)).astype(np.int64)
        return batch.select(need).append_column("coarse",
                                                pa.array(coarse))

    def kernel(group: pa.Table) -> pa.Table:
        t = group.sort_by([(key_col, "ascending"),
                           (order_col, "descending"),
                           (id_col, "descending")])
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        n = len(keys)
        out = {}
        if n == 0:
            return pa.table({key_col: t.column(key_col)}
                            | {c: t.column(c) for c in cols})
        new = np.ones(n, dtype=bool)
        new[1:] = keys[1:] != keys[:-1]
        seg = np.cumsum(new) - 1
        nseg = int(seg[-1]) + 1
        first_idx = np.flatnonzero(new)
        out[key_col] = t.column(key_col).take(pa.array(first_idx))
        pos = np.arange(n, dtype=np.int64)
        for c in cols:
            col = t.column(c)
            col = col.combine_chunks() if isinstance(
                col, pa.ChunkedArray) else col
            valid = np.asarray(pc.is_valid(col).to_numpy(
                zero_copy_only=False), dtype=bool)
            firstvalid = np.full(nseg, n, dtype=np.int64)
            np.minimum.at(firstvalid, seg[valid], pos[valid])
            has = firstvalid < n
            take = pa.array(np.where(has, firstvalid, 0))
            picked = col.take(take)
            if not has.all():
                picked = pc.if_else(pa.array(has), picked,
                                    pa.scalar(None, col.type))
            out[c] = picked
        return pa.table(out)

    return ds.select_columns(need).map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("coarse").map_groups(kernel, batch_format="pyarrow")


def jaccard_pairs_prefix(ds, text_col: str, id_col: str, *, n: int = 3,
                         threshold: float = 0.8,
                         shuffle_partitions: int | None = None,
                         num_partitions: int = 16):
    """Exact Jaccard pairs via PREFIX FILTERING (Chaudhuri/Bayardo
    all-pairs): index only each doc's ``|x| - ceil(t·|x|) + 1`` RAREST
    shingles under the global document-frequency order — any pair with
    J >= t must share one of them — then verify the (small) candidate
    set exactly with the distributed join verify.  Same result as
    :func:`jaccard_pairs_exact`, but candidate volume scales with
    rare-shingle df², not all-shingle df²: the exactness-preserving
    scale path (minhash_lsh_pairs trades recall instead).

    Plan: shingle index (one scan) -> global df (hash aggregate) ->
    ONE hash join attaches df -> per-doc prefix selection (coarse
    bucket on doc, vectorized segment ranks) -> within-shingle pair
    emission (bounded-coarse groupby) -> pair dedup -> exact verify
    (semi-join + one hash join + intersection kernel; no driver
    materialization anywhere).
    """
    import ray
    from ray.data.aggregate import Count

    from .relational import safe_join

    cpus = int(ray.cluster_resources().get("CPU", 8))
    num_partitions = max(2, min(num_partitions, cpus // 2))

    inv = _shingle_rows(ds, text_col, id_col, n)
    if shuffle_partitions:
        inv = inv.repartition(shuffle_partitions)
    df = inv.groupby("sh").aggregate(Count(alias_name="df"))
    joined = safe_join(inv.drop_columns(["coarse"]), df,
                       join_type="inner", num_partitions=num_partitions,
                       on=("sh",))

    def add_doc_bucket(t: pa.Table) -> pa.Table:
        coarse = (hash64(t.column("doc")) % np.uint64(_N_COARSE)).astype(
            np.int64)
        return t.append_column("dc", pa.array(coarse))

    def select_prefix(group: pa.Table) -> pa.Table:
        t = group.sort_by([("doc", "ascending"), ("df", "ascending"),
                           ("sh", "ascending")])
        doc = t.column("doc").to_numpy(zero_copy_only=False)
        nsh = t.column("nsh").to_numpy(zero_copy_only=False)
        m = len(doc)
        if m == 0:
            return pa.table({"coarse": pa.array([], pa.int64()),
                             "sh": pa.array([], pa.int64()),
                             "doc": pa.array([], doc.dtype and pa.int64()),
                             "nsh": pa.array([], pa.int64())})
        new = np.ones(m, dtype=bool)
        new[1:] = doc[1:] != doc[:-1]
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        rank = np.arange(m, dtype=np.int64) - starts[seg]
        # prefix length |x| - ceil(t|x|) + 1; the 1e-9 absorbs float
        # error in t*nsh CONSERVATIVELY (never shrinks the prefix)
        p = nsh - np.ceil(threshold * nsh - 1e-9).astype(np.int64) + 1
        keep = rank < p
        kept = t.filter(pa.array(keep))
        sh = kept.column("sh").to_numpy(zero_copy_only=False)
        coarse = (sh.view(np.uint64) % np.uint64(_N_COARSE)).astype(
            np.int64)
        return pa.table({
            "coarse": pa.array(coarse),
            "sh": kept.column("sh"),
            "doc": kept.column("doc"),
            "nsh": kept.column("nsh"),
        })

    prefix_rows = joined.map_batches(
        add_doc_bucket, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("dc").map_groups(select_prefix, batch_format="pyarrow")

    cand = prefix_rows.groupby("coarse").map_groups(
        _emit_pairs_from_coarse_group, batch_format="pyarrow")

    def dedup_pairs(group: pa.Table) -> pa.Table:
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        new = np.ones(len(a), dtype=bool)
        if len(a):
            new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return pa.table({"a": pa.array(a[new]), "b": pa.array(b[new])})

    pairs = cand.groupby("pc").map_groups(dedup_pairs,
                                          batch_format="pyarrow")
    return _join_exact_verify(ds, pairs, text_col, id_col, n=n,
                              threshold=threshold,
                              num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# Winnowing (MOSS) substring-level fingerprints
# ---------------------------------------------------------------------------

_WIN_B = np.uint64(1000003)


def _winnow_batch(texts: pa.Array, k: int, w: int):
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03)
    for one batch of normalized strings: rolling k-gram hashes over the
    FLAT utf-8 buffer of the whole batch (doc-boundary windows masked
    out — no per-document Python), sliding-window minima selected by
    leftmost position, deduplicated by position.

    Guarantee: two docs sharing a normalized substring of length
    ≥ w + k − 1 share at least one fingerprint.  Returns (row_idx,
    fingerprint) int64 arrays.
    """
    texts = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) \
        else texts
    buffers = texts.buffers()
    odt = np.int64 if pa.types.is_large_string(texts.type) else np.int32
    offsets = np.frombuffer(
        buffers[1], dtype=odt,
        count=texts.offset + len(texts) + 1
    )[texts.offset:].astype(np.int64)
    if buffers[2] is not None:
        data = np.frombuffer(buffers[2], dtype=np.uint8,
                             count=int(offsets[-1]))[offsets[0]:]
    else:
        data = np.empty(0, np.uint8)
    offsets = offsets - offsets[0]
    n = len(data)
    if n < k:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    # rolling polynomial hashes over the flat buffer: loop over k (tiny),
    # vectorized over all positions
    m = n - k + 1
    h = np.zeros(m, dtype=np.uint64)
    du = data.astype(np.uint64)
    for j in range(k):
        h = h * _WIN_B + du[j:j + m]
    # valid hash positions: k-gram must not cross a doc boundary
    doc_of = np.searchsorted(offsets, np.arange(m), side="right") - 1
    valid_h = (np.arange(m) + k) <= offsets[doc_of + 1]
    if m < w:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    # sliding min over hash windows of width w (leftmost argmin)
    sw = np.lib.stride_tricks.sliding_window_view(h, w)
    sel = np.argmin(sw, axis=1) + np.arange(m - w + 1)
    # a window is valid only if its entire span sits inside one doc
    starts = np.arange(m - w + 1)
    doc_s = doc_of[starts]
    valid_w = ((starts + w - 1 + k) <= offsets[doc_s + 1]) \
        & valid_h[starts] & valid_h[starts + w - 1]
    pos = np.unique(sel[valid_w])
    pos = pos[valid_h[pos]]
    return (doc_of[pos], h[pos].view(np.int64))


def winnow_pairs(ds, text_col: str, id_col: str, *, k: int = 16,
                 w: int = 8, min_shared: int = 2, bucket_cap: int = 64,
                 shuffle_partitions: int = 8):
    """Substring-level near-duplicate candidates via winnowing
    fingerprints — catches COPIED PASSAGES (quotes, boilerplate,
    plagiarized spans) that whole-document MinHash misses when the rest
    of the documents differ.  Any pair sharing a normalized substring
    of ≥ w+k−1 chars is guaranteed a common fingerprint; pairs sharing
    ≥ ``min_shared`` fingerprints are reported.

    Plan: per-batch flat-buffer rolling hashes + sliding-window minima
    (no Python over rows), shuffle (fingerprint → docs) rows — payload
    is the SELECTED fingerprints only, ~2/(w+1) of the k-grams — then
    the coarse-bucket pair emission + pair-count combine used by every
    dedup stage here.  Fingerprints shared by more than ``bucket_cap``
    docs are dropped as boilerplate (documented recall trade, same cap
    discipline as the LSH stages).  Normalization: lowercase, non-
    alphanumeric stripped.  Output: (a, b, shared).
    """
    from ray.data.aggregate import Sum

    def fps(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col)
        txt = txt.combine_chunks() if isinstance(txt, pa.ChunkedArray) \
            else txt
        norm = pc.replace_substring_regex(
            pc.utf8_lower(txt), "[^a-z0-9]+", "")
        row, fp = _winnow_batch(
            norm.combine_chunks() if isinstance(norm, pa.ChunkedArray)
            else norm, k, w)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        # distinct (doc, fp) within the batch
        order = np.lexsort((fp, row))
        rs, fs = row[order], fp[order]
        keep = np.ones(len(rs), dtype=bool)
        if len(rs) > 1:
            keep[1:] = (rs[1:] != rs[:-1]) | (fs[1:] != fs[:-1])
        rs, fs = rs[keep], fs[keep]
        return pa.table({
            "coarse": pa.array((fs.astype(np.uint64)
                                % np.uint64(shuffle_partitions * 32))
                               .astype(np.int64)),
            "fp": pa.array(fs),
            "doc": pa.array(ids[rs].astype(np.int64)),
        })

    def bucket_pairs(group: pa.Table) -> pa.Table:
        docs = group.column("doc").to_numpy(zero_copy_only=False)
        fp = group.column("fp").to_numpy(zero_copy_only=False)
        order = np.lexsort((docs, fp))
        docs, fp = docs[order], fp[order]
        # drop duplicate (fp, doc) rows that met in this bucket
        keep = np.ones(len(fp), dtype=bool)
        if len(fp) > 1:
            keep[1:] = (fp[1:] != fp[:-1]) | (docs[1:] != docs[:-1])
        docs, fp = docs[keep], fp[keep]
        _, counts = np.unique(fp, return_counts=True)
        # boilerplate cap
        big = counts > bucket_cap
        if big.any():
            keep2 = ~np.repeat(big, counts)
            docs, fp = docs[keep2], fp[keep2]
            _, counts = np.unique(fp, return_counts=True)
        ii, jj = _segment_pairs(counts)
        a, b = docs[ii], docs[jj]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        # combine duplicate pairs locally before the pair shuffle
        order2 = np.lexsort((b2, a2))
        a2, b2 = a2[order2], b2[order2]
        new = np.ones(len(a2), dtype=bool)
        if len(a2) > 1:
            new[1:] = (a2[1:] != a2[:-1]) | (b2[1:] != b2[:-1])
        seg = np.cumsum(new) - 1
        c = np.bincount(seg).astype(np.int64)
        first = np.flatnonzero(new)
        a2, b2 = a2[first], b2[first]
        return pa.table({
            "pc": pa.array((_pair_key(a2, b2)
                            % np.uint64(shuffle_partitions * 32))
                           .astype(np.int64)),
            "a": pa.array(a2), "b": pa.array(b2), "c": pa.array(c),
        })

    def pair_reduce(group: pa.Table) -> pa.Table:
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        c = group.column("c").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b, c = a[order], b[order], c[order]
        new = np.ones(len(a), dtype=bool)
        if len(a) > 1:
            new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        seg = np.cumsum(new) - 1
        tot = np.bincount(seg, weights=c).astype(np.int64)
        first = np.flatnonzero(new)
        ok = tot >= min_shared
        return pa.table({"a": pa.array(a[first][ok]),
                         "b": pa.array(b[first][ok]),
                         "shared": pa.array(tot[ok])})

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(fps, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse").map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby("pc").map_groups(pair_reduce, batch_format="pyarrow")
        .select_columns(["a", "b", "shared"])
    )


def dup_share(ds, text_col: str, id_col: str, *, group_col: str,
              num_partitions: int = 8):
    """Per-group exact-duplication share: (group, n_docs, n_duped)
    where ``n_duped`` counts the group's docs whose md5 content
    fingerprint appears more than once CORPUS-WIDE — the curation
    metric behind "which language/source is flooding the corpus with
    copies".

    Plan: per-batch md5 combiner -> ONE groupby(fingerprint, group)
    count (n_fl) -> a tiny re-aggregate of THAT table by fingerprint
    for corpus-wide totals -> hash-join the two aggregated tables on
    fingerprint (both are bounded by distinct texts, never raw rows)
    -> per-group sums.  No driver materialization of fingerprints.
    """
    import hashlib

    from ray.data.aggregate import Count, Sum

    from ..functions.aggregates import hash64

    def kernel(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        fp = [hashlib.md5(("" if t is None else t).encode("utf-8"))
              .hexdigest() for t in texts]
        return pa.table({"fingerprint": pa.array(fp),
                         group_col: batch.column(group_col)})

    fps = ds.select_columns([group_col, text_col]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True)
    n_fl = fps.groupby(["fingerprint", group_col]).aggregate(
        Count(alias_name="n_fl"))

    # corpus-wide totals are computable INSIDE each fingerprint group
    # (its per-group rows are all there after the groupby) — a
    # vectorized segment pass over the sorted group block replaces a
    # hash join of two aggregated tables
    def per_fingerprint(t: pa.Table) -> pa.Table:
        t = t.sort_by([("fingerprint", "ascending")])
        fp = t.column("fingerprint").to_numpy(zero_copy_only=False)
        n = t.column("n_fl").to_numpy(zero_copy_only=False)
        if len(fp) == 0:
            e = pa.array([], pa.int64())
            return pa.table({group_col: t.column(group_col),
                             "n_docs": e, "n_duped": e})
        new_seg = np.ones(len(fp), dtype=bool)
        new_seg[1:] = fp[1:] != fp[:-1]
        seg = np.cumsum(new_seg) - 1
        total = np.bincount(seg, weights=n)[seg]
        duped = np.where(total > 1, n, 0).astype(np.int64)
        return pa.table({
            group_col: t.column(group_col),
            "n_docs": pa.array(n.astype(np.int64)),
            "n_duped": pa.array(duped),
        })

    coarse = n_fl.map_batches(
        lambda t: t.append_column("coarse", pa.array(
            (hash64(t.column("fingerprint"))
             % np.uint64(num_partitions)).astype(np.int64))),
        batch_format="pyarrow", zero_copy_batch=True)
    return coarse.groupby("coarse").map_groups(
        per_fingerprint, batch_format="pyarrow"
    ).groupby(group_col).aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_duped", alias_name="n_duped"))
