"""Similarity search over embedding columns (list<float>).

Engine extensions beyond the datatest reference (SURVEY.md §2.H): the
operations a training-data pipeline needs over an embeddings table.

* ``topk_cosine``        — brute-force cosine top-k: the query matrix is
  broadcast ONCE via ``ray.put`` and read inside every ``map_batches``
  task (never re-shipped per batch); each batch computes a (B x Q) GEMM
  and emits per-batch partial top-k rows; a tiny ``groupby(query_id)``
  merge yields the global top-k.  This is the exact baseline.
* ``neardup_cosine_pairs`` — all pairs with cosine >= threshold, same
  broadcast pattern (one side streams, the other is the broadcast
  matrix).  Exact; suitable while one side fits worker memory.
* ``ann_lsh_topk``       — the scale path: random-hyperplane LSH signs
  bucket both sides; exact rerank only within buckets.  Approximate
  (recall < 1), so it has no SQL oracle — the exact variants are the
  oracle-paired queries.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["embedding_matrix", "topk_cosine", "hard_negatives",
           "pca_top_components",
           "neardup_cosine_pairs",
           "ann_lsh_topk", "ivf_topk", "label_centroids",
           "centroid_confusion", "kmeans", "silhouette_labels", "ann_recall_report",
           "matryoshka_recall", "knn_label_purity",
           "twonn_intrinsic_dim", "geometric_median_labels",
           "kcenter_greedy", "hotelling_t2", "davies_bouldin_labels",
           "hubness", "effective_rank"]


def _pa_ids(arr: np.ndarray):
    """Arrow array from an id numpy array of ANY type (int keys and
    string keys both supported)."""
    if arr.dtype == object:
        return pa.array(arr.tolist(), pa.string())
    return pa.array(arr)


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch.column(vec_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = batch.num_rows
    return flat.reshape(n, -1)


def embedding_matrix(ds, id_col: str, vec_col: str):
    """Collect (ids, L2-normalized float64 matrix) of a SMALL dataset —
    the broadcast side.  Only ever call on the small side (queries, or a
    table known to fit in memory); the streaming side stays a Dataset."""
    tables = list(
        ds.select_columns([id_col, vec_col]).iter_batches(
            batch_format="pyarrow", batch_size=4096
        )
    )
    t = pa.concat_tables(tables)
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    mat = _normalize_rows(_batch_matrix(t, vec_col))
    return ids, mat


def label_centroids(ds, *, label_col: str, vec_col: str,
                    round_to: int = 6):
    """Per-label mean embedding, exploded to (label, dim, val) rows so
    the result is SQL-comparable (one row per centroid coordinate).

    Plan: per-batch partial (sum-vector + count per label touched, one
    fixed-size row each — the combiner), ONE tiny ``groupby(label)``
    exchange over partials, vectorized final divide.  Shuffle volume is
    labels x blocks x dim floats, independent of row count."""
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        labels = batch.column(label_col).to_numpy(zero_copy_only=False)
        mat = _batch_matrix(batch, vec_col)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), mat.shape[1]))
        np.add.at(sums, inv, mat)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table({
            label_col: pa.array(uniq),
            "vsum": pa.FixedSizeListArray.from_arrays(
                pa.array(sums.reshape(-1)), mat.shape[1]
            ),
            "n": pa.array(counts),
        })

    def finalize(group: pa.Table) -> pa.Table:
        vs = group.column("vsum")
        if isinstance(vs, pa.ChunkedArray):
            vs = vs.combine_chunks()
        S = np.asarray(vs.values).reshape(group.num_rows, -1)
        n = group.column("n").to_numpy(zero_copy_only=False)
        centroid = S.sum(axis=0) / n.sum()
        dim = len(centroid)
        lab = group.column(label_col)[0].as_py()
        return pa.table({
            label_col: pa.array([lab] * dim),
            "dim": pa.array(np.arange(dim, dtype=np.int64)),
            "val": pa.array(np.round(centroid, round_to)),
        })

    partials = ds.select_columns([label_col, vec_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby(label_col).map_groups(
        finalize, batch_format="pyarrow"
    )


def topk_cosine(ds, queries_ds, *, id_col: str, vec_col: str, k: int = 5,
                exclude_self: bool = True,
                exclude_label_col: Optional[str] = None):
    """Exact top-k cosine neighbors for each query vector:
    (query_id, neighbor_id, sim) with sim rounded to 6 decimals and ties
    broken by ascending neighbor id (deterministic, matches the SQL
    window oracle).

    ``exclude_label_col``: when set (both sides must carry it), rows
    sharing the query's label are masked out — the HARD-NEGATIVE
    mining mode (:func:`hard_negatives`): nearest neighbors from a
    DIFFERENT class, the contrastive-training pair source."""
    import ray

    q_ids, q_mat = embedding_matrix(queries_ds, id_col, vec_col)
    q_labels = None
    if exclude_label_col is not None:
        qt = pa.concat_tables(list(
            queries_ds.select_columns([id_col, exclude_label_col])
            .iter_batches(batch_format="pyarrow", batch_size=4096)))
        # align label order to embedding_matrix's collection order
        lab = dict(zip(
            qt.column(id_col).to_pylist(),
            qt.column(exclude_label_col).to_pylist()))
        q_labels = np.asarray([lab[i] for i in q_ids], dtype=object)
    q_ref = ray.put((q_ids, q_mat.T, q_labels))  # broadcast once

    def partial_topk(batch: pa.Table) -> pa.Table:
        q_ids_l, q_t, q_lab = ray.get(q_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mat = _normalize_rows(_batch_matrix(batch, vec_col))
        labels = (batch.column(exclude_label_col).to_numpy(
            zero_copy_only=False) if exclude_label_col is not None
            else None)
        sims = mat @ q_t  # (B, Q)
        out_q, out_n, out_s = [], [], []
        kk = min(k, sims.shape[0])
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            if exclude_self:
                col = np.where(ids == q_ids_l[qi], -np.inf, col)
            if labels is not None:
                col = np.where(labels == q_lab[qi], -np.inf, col)
            # partial top-k inside the batch, by the SAME (sim desc,
            # neighbor-id asc) criterion as the global merge so a tie on
            # the k-th place can never select a different winner
            order = np.lexsort((ids, -col))[:kk]
            finite = order[np.isfinite(col[order])]
            out_q.append(np.full(len(finite), q_ids_l[qi],
                                 dtype=q_ids_l.dtype if hasattr(q_ids_l, "dtype") else None))
            out_n.append(ids[finite])
            out_s.append(col[finite])
        return pa.table(
            {
                "query_id": _pa_ids(np.concatenate(out_q) if out_q else
                                    np.empty(0, np.int64)),
                "neighbor_id": _pa_ids(np.concatenate(out_n) if out_n else
                                       np.empty(0, np.int64)),
                "sim": pa.array(np.concatenate(out_s) if out_s else
                                np.empty(0, np.float64)),
            }
        )

    def merge_topk(group: pa.Table) -> pa.Table:
        sims = group.column("sim").to_numpy(zero_copy_only=False)
        nids = group.column("neighbor_id").to_numpy(zero_copy_only=False)
        qids = group.column("query_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((nids, -sims))[:k]
        return pa.table(
            {
                "query_id": _pa_ids(qids[order]),
                "neighbor_id": _pa_ids(nids[order]),
                "sim": pa.array(np.round(sims[order], 6)),
            }
        )

    need = [id_col, vec_col] + (
        [exclude_label_col] if exclude_label_col is not None else [])
    partials = ds.select_columns(need).map_batches(
        partial_topk, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby("query_id").map_groups(merge_topk, batch_format="pyarrow")


def hard_negatives(ds, queries_ds, *, id_col: str, vec_col: str,
                   label_col: str, k: int = 5):
    """Hard-negative mining for contrastive training: each query's
    top-k nearest neighbors restricted to OTHER labels (the
    most-confusable out-of-class examples).  Same exact broadcast +
    per-batch GEMM + tie-exact merge plan as :func:`topk_cosine`."""
    return topk_cosine(ds, queries_ds, id_col=id_col, vec_col=vec_col,
                       k=k, exclude_self=True,
                       exclude_label_col=label_col)


def neardup_cosine_pairs(ds, *, id_col: str, vec_col: str,
                         threshold: float = 0.4,
                         broadcast_ds=None, mode: str = "broadcast",
                         n_blocks: int = 8):
    """All pairs (a < b) with cosine similarity >= threshold:
    (a, b, sim rounded to 6dp).  Exact in BOTH modes.

    * ``mode='broadcast'``: the comparison side is broadcast once
      (``ray.put``); the data side streams batch-by-batch, each batch
      doing one GEMM against the broadcast matrix.  Exact while the
      broadcast side fits worker memory — the small-input fallback.
    * ``mode='blocked'`` (the scale path, round-1 verdict #4): a
      block-pair grid join.  Rows hash into ``n_blocks`` blocks; every
      row is replicated to the ``n_blocks`` pair-buckets its block is a
      member of, ONE shuffle on the pair-bucket key, and each bucket
      does an exact (N/G x N/G) GEMM between its two blocks.  No
      whole-dataset broadcast and no O(N^2) single GEMM anywhere:
      shuffle volume is N x n_blocks rows, per-group memory is two
      blocks.  Still exhaustive — unlike an LSH bucketing, NO pair can
      be missed, so the result matches the all-pairs oracle exactly.
    """
    if mode == "blocked":
        if broadcast_ds is not None:
            raise TypeError("mode='blocked' compares ds with itself")
        return _neardup_blocked(ds, id_col=id_col, vec_col=vec_col,
                                threshold=threshold, n_blocks=n_blocks)
    import ray

    side = broadcast_ds if broadcast_ds is not None else ds
    all_ids, all_mat = embedding_matrix(side, id_col, vec_col)
    ref = ray.put((all_ids, all_mat.T))

    def pairs(batch: pa.Table) -> pa.Table:
        ids_r, mat_t = ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mat = _normalize_rows(_batch_matrix(batch, vec_col))
        sims = mat @ mat_t  # (B, N)
        ii, jj = np.nonzero(sims >= threshold)
        a = ids[ii]
        b = ids_r[jj]
        keep = a < b  # each unordered pair reported once, from the a-side batch
        return pa.table(
            {
                "a": _pa_ids(a[keep]),
                "b": _pa_ids(b[keep]),
                "sim": pa.array(np.round(sims[ii, jj][keep], 6)),
            }
        )

    return ds.select_columns([id_col, vec_col]).map_batches(
        pairs, batch_format="pyarrow", zero_copy_batch=True
    )


def _neardup_blocked(ds, *, id_col: str, vec_col: str, threshold: float,
                     n_blocks: int):
    """Exact all-pairs via a block-pair grid join (see
    neardup_cosine_pairs docstring)."""
    from ..functions.aggregates import hash64

    G = n_blocks

    def expand(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids_arr = batch.column(id_col)
        if isinstance(ids_arr, pa.ChunkedArray):
            ids_arr = ids_arr.combine_chunks()
        g = (hash64(ids_arr) % np.uint64(G)).astype(np.int64)
        take = np.repeat(np.arange(n, dtype=np.int64), G)
        other = np.tile(np.arange(G, dtype=np.int64), n)
        mine = np.repeat(g, G)
        gi = np.minimum(mine, other)
        gj = np.maximum(mine, other)
        sub = batch.select([id_col, vec_col]).take(pa.array(take))
        return sub.append_column(
            "pair_bucket", pa.array(gi * G + gj)
        ).append_column("blk", pa.array(mine))

    def bucket_pairs(group: pa.Table) -> pa.Table:
        bucket = int(group.column("pair_bucket")[0].as_py())
        gi, gj = bucket // G, bucket % G
        blk = group.column("blk").to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        mat = _normalize_rows(_batch_matrix(group, vec_col))
        empty = pa.table({
            "a": _pa_ids(ids[:0]), "b": _pa_ids(ids[:0]),
            "sim": pa.array(np.empty(0, np.float64)),
        })
        if gi == gj:
            # intra-block: upper triangle of one GEMM
            rows = blk == gi
            sub_ids, sub = ids[rows], mat[rows]
            if len(sub_ids) < 2:
                return empty
            sims = sub @ sub.T
            ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
            a, b, s = sub_ids[ii], sub_ids[jj], sims[ii, jj]
        else:
            ra, rb = blk == gi, blk == gj
            if not ra.any() or not rb.any():
                return empty
            A_ids, A = ids[ra], mat[ra]
            B_ids, B = ids[rb], mat[rb]
            sims = A @ B.T
            ii, jj = np.nonzero(sims >= threshold)
            a, b, s = A_ids[ii], B_ids[jj], sims[ii, jj]
        lo = np.where(a < b, a, b)
        hi = np.where(a < b, b, a)
        return pa.table({
            "a": _pa_ids(lo), "b": _pa_ids(hi),
            "sim": pa.array(np.round(s, 6)),
        })

    expanded = ds.select_columns([id_col, vec_col]).map_batches(
        expand, batch_format="pyarrow", zero_copy_batch=True
    )
    return expanded.groupby("pair_bucket").map_groups(
        bucket_pairs, batch_format="pyarrow"
    )


def ann_lsh_topk(ds, queries_ds, *, id_col: str, vec_col: str, k: int = 5,
                 n_planes: int = 10, seed: int = 11,
                 dim: Optional[int] = None, n_probe_bits: int = 3,
                 n_tables: int = 4):
    """Approximate top-k: random-hyperplane LSH with MULTI-PROBE and
    MULTI-TABLE search (round-1 verdict #5: single-probe/single-table
    recall was ~5% on near-orthogonal embeddings).

    ``n_tables`` independent plane sets each bucket the data once (a
    data vector lands in n_tables buckets); a query probes, in every
    table, its own bucket plus all buckets within Hamming distance
    ``n_probe_bits`` of its code (flip 1..n_probe_bits sign bits).
    Candidates from all probes are exactly reranked and merged.  Cost:
    data rows hash n_tables times; query probe set per table is
    1 + C(n_planes,1) + ... + C(n_planes,n_probe_bits) buckets out of
    2^n_planes (~17% per table at the defaults).  Measured recall vs
    exact top-k on the sf0.01 embeddings: 0.975 at the defaults (was
    ~0.05 single-probe/single-table); >= 0.8 is pinned in
    tests/test_text_dedup_similarity.py.  At larger corpus scale raise
    n_planes (halving the probed fraction per plane) and keep
    n_probe_bits — candidate volume, not bucket count, sets the cost."""
    import ray
    from itertools import combinations

    q_ids, q_mat = embedding_matrix(queries_ds, id_col, vec_col)
    if dim is None:
        dim = q_mat.shape[1]
    rng = np.random.RandomState(seed)
    planes_all = [rng.standard_normal((dim, n_planes)) for _ in range(n_tables)]
    powers = (1 << np.arange(n_planes)).astype(np.int64)
    # probe masks: the 0-flip probe plus every 1..n_probe_bits flip
    flip_masks = [0]
    for nb in range(1, n_probe_bits + 1):
        for bits in combinations(range(n_planes), nb):
            flip_masks.append(int(sum(1 << b for b in bits)))
    flip_masks = np.array(flip_masks, dtype=np.int64)
    # per table: bucket -> query ids probing it
    by_bucket: list = []
    for t in range(n_tables):
        q_codes = ((q_mat @ planes_all[t]) > 0).astype(np.int64) @ powers
        table_map: dict = {}
        for qid, code in zip(q_ids, q_codes):
            for probe_code in np.bitwise_xor(int(code), flip_masks):
                table_map.setdefault(int(probe_code), []).append(qid)
        by_bucket.append(table_map)
    q_ref = ray.put((dict(zip(q_ids, q_mat)), by_bucket, planes_all))

    def probe(batch: pa.Table) -> pa.Table:
        q_vecs, buckets_all, planes_l = ray.get(q_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mat = _normalize_rows(_batch_matrix(batch, vec_col))
        out_q, out_n, out_s = [], [], []
        # candidate set per query accumulated across tables; dedup via
        # the downstream (query_id, neighbor_id) max — emit per table
        for t, (pl, buckets) in enumerate(zip(planes_l, buckets_all)):
            codes = ((mat @ pl) > 0).astype(np.int64) @ powers
            for code in np.unique(codes):
                qids = buckets.get(int(code))
                if not qids:
                    continue
                rows = codes == code
                sub, sub_ids = mat[rows], ids[rows]
                qm = np.stack([q_vecs[q] for q in qids])
                sims = sub @ qm.T
                for col, qid in enumerate(qids):
                    s = sims[:, col]
                    mask = sub_ids != qid
                    out_q.append(np.full(mask.sum(), qid,
                                         dtype=sub_ids.dtype))
                    out_n.append(sub_ids[mask])
                    out_s.append(s[mask])
        empty = not out_q
        return pa.table(
            {
                "query_id": _pa_ids(np.empty(0, np.int64) if empty else
                                    np.concatenate(out_q)),
                "neighbor_id": _pa_ids(np.empty(0, np.int64) if empty else
                                       np.concatenate(out_n)),
                "sim": pa.array(np.empty(0, np.float64) if empty else
                                np.concatenate(out_s)),
            }
        )

    def merge_topk(group: pa.Table) -> pa.Table:
        sims = group.column("sim").to_numpy(zero_copy_only=False)
        nids = group.column("neighbor_id").to_numpy(zero_copy_only=False)
        qids = group.column("query_id").to_numpy(zero_copy_only=False)
        # a neighbor can be found by several tables/probes — dedup (the
        # sim values of duplicates are identical) before the final top-k
        _, idx = np.unique(nids, return_index=True)
        sims, nids, qids = sims[idx], nids[idx], qids[idx]
        order = np.lexsort((nids, -sims))[:k]
        return pa.table(
            {
                "query_id": pa.array(qids[order]),
                "neighbor_id": pa.array(nids[order]),
                "sim": pa.array(np.round(sims[order], 6)),
            }
        )

    partials = ds.select_columns([id_col, vec_col]).map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby("query_id").map_groups(merge_topk, batch_format="pyarrow")


def ivf_topk(ds, queries_ds, *, id_col: str, vec_col: str, k: int = 5,
             n_centroids: int = 16, n_probe: int = 4,
             train_sample: int = 4096, kmeans_iters: int = 8,
             seed: int = 13):
    """Approximate top-k via an IVF (inverted-file) index — the classic
    ANN scale path alongside hyperplane LSH.

    A coarse quantizer (k-means trained on a bounded sample, plain numpy
    Lloyd iterations) partitions data vectors into ``n_centroids``
    buckets; each query exactly reranks only its ``n_probe`` nearest
    buckets.  One ``groupby(bucket)``-free plan: the centroid matrix is
    broadcast via ``ray.put`` and every batch compares its rows against
    the probed-queries set — candidate volume is ~n_probe/n_centroids of
    brute force.  Approximate (recall grows with n_probe; n_probe =
    n_centroids degenerates to exact brute force)."""
    import ray

    # -- train the coarse quantizer on a bounded RANDOM sample (round-1
    # verdict #5: ds.limit() takes the FIRST rows — a biased sample) ----
    n_total = ds.count()
    cols = ds.select_columns([id_col, vec_col])
    if n_total > train_sample:
        frac = min(1.0, (train_sample * 1.5) / n_total)
        sample = cols.random_sample(frac, seed=seed).limit(train_sample)
    else:
        sample = cols
    _, train = embedding_matrix(sample, id_col, vec_col)
    rng = np.random.RandomState(seed)
    n_centroids = min(n_centroids, len(train))
    cents = train[rng.choice(len(train), size=n_centroids, replace=False)]
    for _ in range(kmeans_iters):
        sims = train @ cents.T
        assign = np.argmax(sims, axis=1)
        for c in range(n_centroids):
            members = train[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n

    q_ids, q_mat = embedding_matrix(queries_ds, id_col, vec_col)
    # per query: the n_probe closest centroids
    probe = np.argsort(-(q_mat @ cents.T), axis=1)[:, :n_probe]
    # centroid -> query rows probing it
    probing: dict = {}
    for qi in range(len(q_ids)):
        for c in probe[qi]:
            probing.setdefault(int(c), []).append(qi)
    state = ray.put((q_ids, q_mat, cents, probing))

    def probe_batch(batch: pa.Table) -> pa.Table:
        q_ids_l, q_mat_l, cents_l, probing_l = ray.get(state)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mat = _normalize_rows(_batch_matrix(batch, vec_col))
        assign = np.argmax(mat @ cents_l.T, axis=1)
        out_q, out_n, out_s = [], [], []
        for c in np.unique(assign):
            qrows = probing_l.get(int(c))
            if not qrows:
                continue
            rows = assign == c
            sub, sub_ids = mat[rows], ids[rows]
            sims = sub @ q_mat_l[qrows].T
            for col, qi in enumerate(qrows):
                qid = q_ids_l[qi]
                mask = sub_ids != qid
                out_q.append(np.full(int(mask.sum()), qid,
                                     dtype=np.asarray(q_ids_l).dtype))
                out_n.append(sub_ids[mask])
                out_s.append(sims[:, col][mask])
        empty = not out_q
        return pa.table(
            {
                "query_id": _pa_ids(np.empty(0, np.int64) if empty else
                                    np.concatenate(out_q)),
                "neighbor_id": _pa_ids(np.empty(0, np.int64) if empty else
                                       np.concatenate(out_n)),
                "sim": pa.array(np.empty(0, np.float64) if empty else
                                np.concatenate(out_s)),
            }
        )

    def merge_topk(group: pa.Table) -> pa.Table:
        sims = group.column("sim").to_numpy(zero_copy_only=False)
        nids = group.column("neighbor_id").to_numpy(zero_copy_only=False)
        qids = group.column("query_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((nids, -sims))[:k]
        return pa.table(
            {
                "query_id": _pa_ids(qids[order]),
                "neighbor_id": _pa_ids(nids[order]),
                "sim": pa.array(np.round(sims[order], 6)),
            }
        )

    partials = ds.select_columns([id_col, vec_col]).map_batches(
        probe_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby("query_id").map_groups(merge_topk,
                                                   batch_format="pyarrow")


def centroid_confusion(ds, *, label_col: str, vec_col: str,
                       round_to: int = 6):
    """Label-confusion screen: pairwise cosine similarity between
    per-label embedding centroids — near-1 off-diagonal entries mean
    two labels are indistinguishable in embedding space (a labeling or
    feature-collapse red flag).

    Builds on :func:`label_centroids` (sum-vector combiners; the only
    shuffle).  The centroid table is #labels × dim rows — tiny — so the
    pairwise cosine happens in one finalize pass over the collected
    centroids, from the ROUNDED values so the SQL oracle reproduces it
    bit-for-bit.  Output: (label_a, label_b, cos) for label_a <
    label_b, rounded to ``round_to``."""
    cent = label_centroids(ds, label_col=label_col, vec_col=vec_col,
                           round_to=round_to)
    batches = list(cent.iter_batches(batch_format="pyarrow"))
    if not batches:
        return pa.table({"label_a": pa.array([], pa.int64()),
                         "label_b": pa.array([], pa.int64()),
                         "cos": pa.array([], pa.float64())})
    t = pa.concat_tables(batches)
    labs = t.column(label_col).to_numpy(zero_copy_only=False)
    dims = t.column("dim").to_numpy(zero_copy_only=False)
    vals = t.column("val").to_numpy(zero_copy_only=False)
    uniq = np.unique(labs)
    D = int(dims.max()) + 1
    M = np.zeros((len(uniq), D))
    li = np.searchsorted(uniq, labs)
    M[li, dims] = vals
    nrm = np.linalg.norm(M, axis=1)
    la, lb, cs = [], [], []
    for i in range(len(uniq)):
        for j in range(i + 1, len(uniq)):
            la.append(int(uniq[i])); lb.append(int(uniq[j]))
            cs.append(round(float(M[i] @ M[j] / (nrm[i] * nrm[j])),
                            round_to))
    return pa.table({"label_a": pa.array(la, pa.int64()),
                     "label_b": pa.array(lb, pa.int64()),
                     "cos": pa.array(cs, pa.float64())})


def kmeans(ds, *, id_col: str, vec_col: str, k: int = 4, iters: int = 2,
           unit: float = 1_000_000.0):
    """Distributed Lloyd's k-means over an embedding column — the
    canonical ITERATIVE algorithm pattern: per iteration the data
    streams through ONE ``map_batches`` (assignment + per-cluster
    integer partial sums) and one tiny ``groupby``; only the k x d
    centroid matrix lives on the driver and is re-broadcast via
    ``ray.put``.

    Every step is deterministic and SQL-reproducible (the oracle can
    replay the exact run):

    * init: the k lowest-id vectors;
    * assignment: squared-L2 argmin, exact ties to the LOWER cluster id;
    * update: per-dimension sums in integer ``unit``s
      (order-independent), centroid = ``(s / unit) / n`` — the same
      two-step float64 division any SQL engine produces bitwise;
      an empty cluster keeps its previous centroid.

    Output: (cid, dim, c, n) — k*d rows with the final centroids and
    cluster sizes.
    """
    import ray
    from ray.data.aggregate import Sum

    # init = the k lowest-id vectors WITHOUT a global sort (a full
    # shuffle just to pick k rows): per-batch k-smallest partials, tiny
    # driver-side merge (k rows per block)
    def kmin(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        idx = np.sort(np.argsort(ids, kind="stable")[:k])
        return batch.select([id_col, vec_col]).take(
            pa.array(idx, pa.int64()))

    parts = pa.concat_tables(list(
        ds.select_columns([id_col, vec_col])
        .map_batches(kmin, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow", batch_size=65536)
    ))
    init_tbl = parts.sort_by(id_col).slice(0, k)
    C = _batch_matrix(init_tbl, vec_col)
    d = C.shape[1]
    n_final = np.zeros(k, dtype=np.int64)

    for _ in range(iters):
        handle = ray.put(C)

        def partial(batch: pa.Table, _h=handle) -> pa.Table:
            cen = ray.get(_h)
            X = _batch_matrix(batch, vec_col)
            d2 = ((X[:, None, :] - cen[None, :, :]) ** 2).sum(axis=2)
            cid = np.argmin(d2, axis=1)  # first (lowest) cid wins ties
            u = np.round(X * unit).astype(np.int64)
            sums = np.zeros((k, d), dtype=np.int64)
            np.add.at(sums, cid, u)
            counts = np.bincount(cid, minlength=k).astype(np.int64)
            return pa.table({
                "cid": pa.array(np.repeat(np.arange(k, dtype=np.int64), d)),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
                "s": pa.array(sums.ravel()),
                "n_": pa.array(np.repeat(counts, d)),
            })

        agg = (
            ds.select_columns([vec_col])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby(["cid", "dim"])
            .aggregate(Sum("s", alias_name="s"), Sum("n_", alias_name="n"))
        )
        small = pa.concat_tables(list(agg.iter_batches(
            batch_format="pyarrow", batch_size=65536)))
        cid = small.column("cid").to_numpy(zero_copy_only=False)
        dim = small.column("dim").to_numpy(zero_copy_only=False)
        s = small.column("s").to_numpy(zero_copy_only=False)
        n = small.column("n").to_numpy(zero_copy_only=False)
        S = np.zeros((k, d), dtype=np.int64)
        N = np.zeros(k, dtype=np.int64)
        S[cid, dim] = s
        N[cid] = n  # identical across dims of a cid
        newC = C.copy()
        nz = N > 0
        newC[nz] = (S[nz] / unit) / N[nz][:, None]
        C, n_final = newC, N

    return pa.table({
        "cid": pa.array(np.repeat(np.arange(k, dtype=np.int64), d)),
        "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
        "c": pa.array(C.ravel()),
        "n": pa.array(np.repeat(n_final, d)),
    })


def silhouette_labels(ds, *, label_col: str, vec_col: str):
    """Simplified (centroid-based) silhouette per label: for each point
    ``a`` = distance to its own label's centroid, ``b`` = distance to
    the nearest OTHER centroid, ``s = (b − a) / max(a, b)``; returns
    one row per label ``(label, sil, n)`` — the embedding-space label
    coherence audit (low sil = tangled clusters, mislabeled data).

    Plan: centroids via :func:`label_centroids` (tiny: labels × dim),
    collected once and broadcast via ``ray.put``; one streaming pass
    computes per-batch partial (label, sum_s, n); a tiny groupby merges.
    Centroids are rounded to 6dp exactly like the SQL oracle's
    ``ROUND(avg(e), 6)`` so both sides measure against identical
    centroids."""
    import numpy as np
    import ray

    cent = label_centroids(ds, label_col=label_col, vec_col=vec_col)
    rows = pa.concat_tables(
        cent.iter_batches(batch_format="pyarrow", batch_size=65536))
    labs = rows.column(label_col).to_numpy(zero_copy_only=False)
    dims = rows.column("dim").to_numpy(zero_copy_only=False)
    vals = rows.column("val").to_numpy(zero_copy_only=False)
    uniq = np.unique(labs)
    d = int(dims.max()) + 1 if len(dims) else 0
    C = np.zeros((len(uniq), d))
    lab_pos = {int(l): i for i, l in enumerate(uniq)}
    for l, dim, v in zip(labs, dims, vals):
        C[lab_pos[int(l)], int(dim)] = v
    ref = ray.put((uniq.astype(np.int64), C))

    def partial(batch: pa.Table) -> pa.Table:
        u, cm = ray.get(ref)
        labels = batch.column(label_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        mat = _batch_matrix(batch, vec_col)
        # explicit (x - c) differences per centroid: same association
        # as the SQL sum((e - v)^2), no GEMM cancellation
        d2 = np.stack([((mat - cm[i]) ** 2).sum(axis=1)
                       for i in range(len(u))], axis=1)
        pos = np.searchsorted(u, labels)
        n = len(labels)
        a = np.sqrt(d2[np.arange(n), pos])
        if d2.shape[1] > 1:
            d2[np.arange(n), pos] = np.inf
            b = np.sqrt(d2.min(axis=1))
            denom = np.maximum(a, b)
            s = np.where(denom > 0,
                         (b - a) / np.where(denom > 0, denom, 1.0), 0.0)
        else:
            # one label in the corpus: no "other" centroid exists; the
            # silhouette is defined as 0 (mirrors the SQL b-IS-NULL arm)
            s = np.zeros(n)
        ul, inv = np.unique(labels, return_inverse=True)
        return pa.table({
            "label": pa.array(ul),
            "s_sum": pa.array(np.bincount(inv, weights=s)),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
        })

    from ray.data.aggregate import Sum

    merged = ds.select_columns([label_col, vec_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("label").aggregate(Sum("s_sum", alias_name="s_sum"),
                                 Sum("n", alias_name="n"))

    def finalize(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        return pa.table({
            "label": t.column("label").cast(pa.int64()),
            "sil": pa.array(
                t.column("s_sum").to_numpy(zero_copy_only=False) / n),
            "n": pa.array(n.astype(np.int64)),
        })

    return merged.map_batches(finalize, batch_format="pyarrow")


def ann_recall_report(ds, queries_ds, *, id_col: str, vec_col: str,
                      k: int = 5, method: str = "lsh", **ann_kwargs):
    """Evaluation harness: recall@k of an ANN index vs the exact
    brute-force top-k, computed DISTRIBUTED (inner join on
    (query, neighbor), never a driver-side set compare) — the number
    an index tuning loop optimizes.  Returns one row:
    ``(method, k, n_queries, n_hits, recall)``."""
    from ray.data.aggregate import Count

    from .relational import safe_join

    exact = topk_cosine(ds, queries_ds, id_col=id_col, vec_col=vec_col,
                        k=k)
    if method == "lsh":
        approx = ann_lsh_topk(ds, queries_ds, id_col=id_col,
                              vec_col=vec_col, k=k, **ann_kwargs)
    elif method == "ivf":
        approx = ivf_topk(ds, queries_ds, id_col=id_col,
                          vec_col=vec_col, k=k, **ann_kwargs)
    else:
        raise ValueError(f"unknown method {method!r}")

    def pair_key(t: pa.Table) -> pa.Table:
        return pa.table({
            "qn": pc.binary_join_element_wise(
                pc.cast(t.column("query_id"), pa.string()),
                pc.cast(t.column("neighbor_id"), pa.string()), "|"),
            "q": t.column("query_id"),
        })

    e = exact.map_batches(pair_key, batch_format="pyarrow",
                          zero_copy_batch=True)
    a = approx.map_batches(pair_key, batch_format="pyarrow",
                           zero_copy_batch=True).drop_columns(["q"])
    hits = safe_join(e, a, join_type="inner", num_partitions=4,
                     on="qn")
    n_hits = hits.count()
    n_q = exact.groupby("query_id").aggregate(
        Count(alias_name="n")).count()
    denom = n_q * k
    return pa.table({
        "method": pa.array([method]),
        "k": pa.array([k], pa.int64()),
        "n_queries": pa.array([n_q], pa.int64()),
        "n_hits": pa.array([int(n_hits)], pa.int64()),
        "recall": pa.array([(n_hits / denom) if denom else 0.0],
                           pa.float64()),
    })


def pca_top_components(ds, *, vec_col: str, k: int = 3):
    """Top-k PCA of an embedding column via distributed second-moment
    partials: each block reduces to ONE mergeable (n, Σx, ΣxxT)
    accumulator — d(d+1)/2 floats for d-dim embeddings, independent of
    row count — combined through ``ds.aggregate`` as a single sketch
    (one aggregate, not d² Sum columns); the d x d eigendecomposition
    runs driver-side (d = embedding width, tiny by construction).  The
    embedding-hygiene question "how concentrated is the variance / is
    the space collapsing" at any corpus size in ONE pass.

    Output: (component 1-based, eigenvalue, explained_share, loading0 =
    |first element| of the sign-normalized eigenvector).  Not
    SQL-expressible (eig) -> rows-only; numpy parity pinned in tests.
    """
    from ..functions.aggregates import SketchAggregate, sketch_loads

    class _Moments:
        def __init__(self):
            self.n = 0
            self.s = None
            self.xx = None

        def update(self, col):
            X = _batch_matrix(pa.table({"v": col}), "v")
            X = X[~np.isnan(X).any(axis=1)]
            d = X.shape[1]
            if self.s is None:
                self.s = np.zeros(d)
                self.xx = np.zeros((d, d))
            self.n += len(X)
            self.s += X.sum(axis=0)
            self.xx += X.T @ X
            return self

        def merge(self, other):
            if other.s is None:
                return self
            if self.s is None:
                self.n, self.s, self.xx = other.n, other.s, other.xx
                return self
            self.n += other.n
            self.s += other.s
            self.xx += other.xx
            return self

    res = ds.select_columns([vec_col]).aggregate(
        SketchAggregate(on=vec_col, factory=_Moments, alias_name="m"))
    m = sketch_loads(res["m"])
    empty = pa.table({"component": pa.array([], pa.int64()),
                      "eigenvalue": pa.array([], pa.float64()),
                      "explained_share": pa.array([], pa.float64()),
                      "loading0": pa.array([], pa.float64())})
    if m.s is None or m.n < 2:
        return empty
    n = m.n
    mu = m.s / n
    cov = (m.xx - n * np.outer(mu, mu)) / (n - 1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    tot = float(w.sum())
    lead = v[0, order]
    sign = np.where(lead >= 0, 1.0, -1.0)
    return pa.table({
        "component": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
        "eigenvalue": pa.array(np.round(w[order], 9), pa.float64()),
        "explained_share": pa.array(np.round(w[order] / tot, 9),
                                    pa.float64()),
        "loading0": pa.array(np.round(lead * sign, 9), pa.float64()),
    })


def exact_dup_vectors(ds, *, vec_col: str, id_col: str):
    """Bitwise-exact duplicate embedding vectors: the cheapest and most
    common embedding-hygiene screen (re-encoded shards, retried rows
    and default-vector bugs all surface as byte-identical vectors long
    before cosine near-dup matters).

    Each row's float32 payload is fingerprinted with md5 over its raw
    little-endian bytes, so the shuffle moves (16-byte digest, id) —
    never the vectors — and the dup groups come out of ONE
    groupby(fingerprint) with Min/Count combiners, exactly the
    `exact_duplicates` plan re-used on binary payloads.

    Output: (keep_id, n_dups) per duplicate group (n_dups = extra
    copies beyond the kept representative), matching
    ``GROUP BY embedding HAVING count(*) > 1`` on the same table.
    """
    import hashlib

    from ray.data.aggregate import Count, Min

    def fingerprint(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_kleene(
            pc.is_valid(batch.column(vec_col)),
            pc.is_valid(batch.column(id_col))))
        v = batch.column(vec_col)
        v = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
        flat = np.asarray(v.values, dtype=np.float32)
        offs = np.asarray(v.offsets, dtype=np.int64)
        raw = flat.tobytes()
        fps = [hashlib.md5(raw[offs[i] * 4:offs[i + 1] * 4]).hexdigest()
               for i in range(len(v))]
        return pa.table({
            "fp": pa.array(fps, pa.string()),
            id_col: batch.column(id_col),
        })

    groups = ds.select_columns([id_col, vec_col]).map_batches(
        fingerprint, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("fp").aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="n"))

    def finalize(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("n"), 1))
        return pa.table({
            "keep_id": pc.cast(t.column("keep_id"), pa.int64()),
            "n_dups": pc.cast(pc.subtract(t.column("n"), 1), pa.int64()),
        })

    return groups.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True)


def matryoshka_recall(ds, *, id_col: str, vec_col: str,
                      dims=(8, 16, 32), k: int = 10,
                      n_queries: int = 20):
    """Matryoshka/truncation quality report: recall@k of exact cosine
    top-k computed on only the FIRST d dimensions against the full-dim
    exact top-k, per candidate prefix length d -- the measurement that
    decides how far an embedding column can be truncated before ANN
    quality collapses (Kusupati et al. 2022 'Matryoshka Representation
    Learning' motivates prefix-truncation).

    Queries are the rows with ``id_col < n_queries`` (deterministic).
    Each ranking reuses :func:`topk_cosine` (queries broadcast via
    ``ray.put``, per-batch GEMM + partial top-k, ascending-id tie
    break), so every pass streams the dataset once; the comparison
    joins the tiny (n_queries * k)-row result sets on the driver.

    Output: (dim int64, n_queries int64, overlap int64, recall
    round-6), one row per prefix length.
    """
    def truncate(d):
        def cut(t: pa.Table) -> pa.Table:
            col = t.column(vec_col)
            col = (col.combine_chunks()
                   if isinstance(col, pa.ChunkedArray) else col)
            return pa.table({id_col: t.column(id_col),
                             vec_col: pc.list_slice(col, 0, d)})
        return cut

    base = ds.select_columns([id_col, vec_col])
    queries = base.filter(expr=f"{id_col} < {int(n_queries)}")

    def pairs(res) -> set:
        t = pa.concat_tables(list(res.iter_batches(
            batch_format="pyarrow", batch_size=4096)))
        return set(zip(t.column("query_id").to_pylist(),
                       t.column("neighbor_id").to_pylist()))

    full = pairs(topk_cosine(base, queries, id_col=id_col,
                             vec_col=vec_col, k=k))
    nq = len({q for q, _ in full})
    rows_d, rows_n, rows_o, rows_r = [], [], [], []
    for d in dims:
        cut_ds = base.map_batches(truncate(d), batch_format="pyarrow",
                                  zero_copy_batch=True)
        cut_q = queries.map_batches(truncate(d), batch_format="pyarrow",
                                    zero_copy_batch=True)
        got = pairs(topk_cosine(cut_ds, cut_q, id_col=id_col,
                                vec_col=vec_col, k=k))
        overlap = len(full & got)
        rows_d.append(int(d))
        rows_n.append(nq)
        rows_o.append(overlap)
        rows_r.append(round(overlap / float(nq * k), 6) if nq else None)
    import ray

    return ray.data.from_arrow(pa.table({
        "dim": pa.array(rows_d, pa.int64()),
        "n_queries": pa.array(rows_n, pa.int64()),
        "overlap": pa.array(rows_o, pa.int64()),
        "recall": pa.array(rows_r, pa.float64()),
    }))


def knn_label_purity(ds, *, id_col: str, vec_col: str, label_col: str,
                     k: int = 5, n_queries: int = 50):
    """k-NN label purity: for each query vector (``id_col <
    n_queries``), the fraction of its k exact cosine neighbors that
    share its label, reported per label -- the standard "is this
    embedding space linearly usable" probe (low purity for a label =
    its region is contaminated), and the zero-training ceiling for any
    k-NN classifier on the corpus.

    Exact neighbors come from :func:`topk_cosine` (one streamed GEMM
    pass, queries broadcast); labels attach to the tiny (n_queries x
    k) result via :func:`~..stages.relational.lookup_join` against the
    (id, label) dimension.  Output: (label, n_queries int64, n_pairs
    int64, n_same int64, purity round-6).
    """
    from .relational import lookup_join

    pairs = topk_cosine(ds.select_columns([id_col, vec_col]),
                        ds.select_columns([id_col, vec_col]).filter(
                            expr=f"{id_col} < {int(n_queries)}"),
                        id_col=id_col, vec_col=vec_col, k=k)
    dim = ds.select_columns([id_col, label_col])

    def prep_q(t: pa.Table) -> pa.Table:
        return pa.table({"query_id": t.column("query_id"),
                         "neighbor_id": t.column("neighbor_id")})

    base = pairs.map_batches(prep_q, batch_format="pyarrow",
                             zero_copy_batch=True)
    with_q = lookup_join(base, dim, on="query_id", right_on=id_col,
                         right_cols=[label_col])

    def rename_q(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["query_id", "neighbor_id", "q_label"])

    with_q = with_q.map_batches(rename_q, batch_format="pyarrow",
                                zero_copy_batch=True)
    with_n = lookup_join(with_q, dim, on="neighbor_id",
                         right_on=id_col, right_cols=[label_col])

    def agg(t: pa.Table) -> pa.Table:
        same = pc.cast(pc.equal(t.column("q_label"),
                                t.column(label_col)), pa.int64())
        g = pa.table({"label": t.column("q_label"),
                      "query_id": t.column("query_id"),
                      "one": pa.array(np.ones(t.num_rows,
                                              dtype=np.int64)),
                      "same": same})
        return g

    marked = with_n.map_batches(agg, batch_format="pyarrow",
                                zero_copy_batch=True)

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("label", pa.int64()),
                            ("n_queries", pa.int64()),
                            ("n_pairs", pa.int64()),
                            ("n_same", pa.int64()),
                            ("purity", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        labels = t.column("label").to_numpy(zero_copy_only=False)
        qids = t.column("query_id").to_numpy(zero_copy_only=False)
        same = t.column("same").to_numpy(zero_copy_only=False)
        out_l, out_q, out_p, out_s, out_r = [], [], [], [], []
        for lab in sorted(set(labels.tolist())):
            sel = labels == lab
            nq = len(set(qids[sel].tolist()))
            np_ = int(sel.sum())
            ns = int(same[sel].sum())
            out_l.append(int(lab))
            out_q.append(nq)
            out_p.append(np_)
            out_s.append(ns)
            out_r.append(round(ns / np_, 6) if np_ else None)
        return pa.table({
            "label": pa.array(out_l, pa.int64()),
            "n_queries": pa.array(out_q, pa.int64()),
            "n_pairs": pa.array(out_p, pa.int64()),
            "n_same": pa.array(out_s, pa.int64()),
            "purity": pa.array(out_r, pa.float64()),
        })

    return marked.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def twonn_intrinsic_dim(ds, *, id_col: str, vec_col: str,
                        n_queries: int = 50):
    """TwoNN intrinsic-dimension estimate (Facco et al. 2017): for each
    query point, mu = d2/d1 (its two nearest-neighbor cosine
    DISTANCES), and the MLE is  ID = n / sum ln mu  -- the one-number
    answer to "how many effective dimensions does this embedding cloud
    actually use", which decides quantization/truncation budgets.

    Distances derive from the ROUNDED (6dp) similarities
    :func:`topk_cosine` emits, making the estimate hash-identical
    against a SQL window mirror; queries with d1 <= 0 (exact
    duplicates) or d2 = d1 drop.  Output one row (n_used int64,
    id_mle round-6).
    """
    queries = ds.select_columns([id_col, vec_col]).filter(
        expr=f"{id_col} < {int(n_queries)}")
    top2 = topk_cosine(ds.select_columns([id_col, vec_col]), queries,
                       id_col=id_col, vec_col=vec_col, k=2)

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("n_used", pa.int64()),
                            ("id_mle", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        t = t.sort_by([("query_id", "ascending"),
                       ("sim", "descending")])
        q = t.column("query_id").to_numpy(zero_copy_only=False)
        s = t.column("sim").to_numpy(zero_copy_only=False)
        new = np.ones(len(q), dtype=bool)
        new[1:] = q[1:] != q[:-1]
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(q)))
        full = starts[cnt >= 2]
        d1 = 1.0 - s[full]
        d2 = 1.0 - s[full + 1]
        ok = (d1 > 0) & (d2 > d1)
        mu = d2[ok] / d1[ok]
        n_used = int(ok.sum())
        idm = (round(n_used / float(np.sum(np.log(mu))), 6)
               if n_used and float(np.sum(np.log(mu))) > 0 else None)
        return pa.table({
            "n_used": pa.array([n_used], pa.int64()),
            "id_mle": pa.array([idm], pa.float64()),
        })

    return top2.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def geometric_median_labels(ds, *, vec_col: str, label_col: str,
                            n_iter: int = 8):
    """Per-label geometric median of the embedding cloud via Weiszfeld
    iterations -- the ROBUST centroid (minimizes summed euclidean
    distance, not squared), so a few corrupt vectors cannot drag the
    class center the way the mean centroid does.  Reported per label:
    the median's distance to the MEAN centroid (in units of the mean
    per-point distance) -- a large gap flags outlier contamination.

    Fully streaming and iterative: each Weiszfeld step broadcasts the
    current per-label estimates via ``ray.put`` and runs ONE
    ``map_batches`` pass of inverse-distance-weighted partial sums
    (payload O(labels x dim) per block), exactly n_iter passes.
    rows-only by contract (iterative); brute-force parity pinned in
    unit tests.  Output: (label, n int64, shift round-6, mean_dist
    round-6).
    """
    import ray
    from ray.data.aggregate import Count, Sum

    base = ds.select_columns([label_col, vec_col])

    def start_partials(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column(label_col)))
        labs = t.column(label_col).to_numpy(zero_copy_only=False)
        mat = _batch_matrix(t, vec_col)
        uls = np.unique(labs)
        rows = {"label": pa.array(uls.astype(np.int64)),
                "n": pa.array([int((labs == l).sum()) for l in uls],
                              pa.int64())}
        sums = np.stack([mat[labs == l].sum(axis=0) for l in uls])
        rows["s"] = pa.array(list(sums.astype(np.float64)),
                             pa.list_(pa.float64()))
        return pa.table(rows)

    def merge_label_vecs(agg_ds):
        rows = agg_ds.take_all()
        merged = {}
        for r in rows:
            lab = r["label"]
            v = np.asarray(r["s"], dtype=np.float64)
            if lab in merged:
                merged[lab][0] += r["n"]
                merged[lab][1] += v
            else:
                merged[lab] = [r["n"], v.copy()]
        return merged

    first = base.map_batches(start_partials, batch_format="pyarrow",
                             zero_copy_batch=True)
    # per-block partials already reduce to O(labels); merge on driver
    state = merge_label_vecs(first)
    labels = sorted(state)
    est = {lab: state[lab][1] / state[lab][0] for lab in labels}
    counts = {lab: state[lab][0] for lab in labels}
    mean_centroid = dict(est)

    for _ in range(n_iter):
        est_ref = ray.put(est)

        def step(t: pa.Table) -> pa.Table:
            cur = ray.get(est_ref)
            t = t.filter(pc.is_valid(t.column(label_col)))
            labs = t.column(label_col).to_numpy(zero_copy_only=False)
            mat = _batch_matrix(t, vec_col)
            out_l, out_w, out_s = [], [], []
            for lab, c in cur.items():
                sel = labs == lab
                if not sel.any():
                    continue
                x = mat[sel]
                d = np.sqrt(((x - c) ** 2).sum(axis=1))
                d = np.maximum(d, 1e-12)
                w = 1.0 / d
                out_l.append(int(lab))
                out_w.append(float(w.sum()))
                out_s.append((x * w[:, None]).sum(axis=0).astype(
                    np.float64))
            return pa.table({
                "label": pa.array(out_l, pa.int64()),
                "w": pa.array(out_w, pa.float64()),
                "s": pa.array([list(v) for v in out_s],
                              pa.list_(pa.float64())),
            })

        parts = base.map_batches(step, batch_format="pyarrow",
                                 zero_copy_batch=True).take_all()
        acc = {}
        for r in parts:
            lab = r["label"]
            v = np.asarray(r["s"], dtype=np.float64)
            if lab in acc:
                acc[lab][0] += r["w"]
                acc[lab][1] += v
            else:
                acc[lab] = [r["w"], v.copy()]
        est = {lab: acc[lab][1] / acc[lab][0] for lab in acc}

    # final pass: mean distance to the geometric median per label
    est_ref = ray.put(est)

    def dist_partials(t: pa.Table) -> pa.Table:
        cur = ray.get(est_ref)
        t = t.filter(pc.is_valid(t.column(label_col)))
        labs = t.column(label_col).to_numpy(zero_copy_only=False)
        mat = _batch_matrix(t, vec_col)
        out_l, out_d = [], []
        for lab, c in cur.items():
            sel = labs == lab
            if not sel.any():
                continue
            out_l.append(int(lab))
            out_d.append(float(np.sqrt(
                ((mat[sel] - c) ** 2).sum(axis=1)).sum()))
        return pa.table({"label": pa.array(out_l, pa.int64()),
                         "dsum": pa.array(out_d, pa.float64())})

    dparts = base.map_batches(dist_partials, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
    dsum = {}
    for r in dparts:
        dsum[r["label"]] = dsum.get(r["label"], 0.0) + r["dsum"]

    out_rows = {"label": [], "n": [], "shift": [], "mean_dist": []}
    for lab in labels:
        md = dsum.get(lab, 0.0) / counts[lab]
        shift = float(np.sqrt(
            ((est[lab] - mean_centroid[lab]) ** 2).sum()))
        out_rows["label"].append(int(lab))
        out_rows["n"].append(int(counts[lab]))
        out_rows["shift"].append(
            round(shift / md, 6) if md > 0 else None)
        out_rows["mean_dist"].append(round(md, 6))
    return ray.data.from_arrow(pa.table({
        "label": pa.array(out_rows["label"], pa.int64()),
        "n": pa.array(out_rows["n"], pa.int64()),
        "shift": pa.array(out_rows["shift"], pa.float64()),
        "mean_dist": pa.array(out_rows["mean_dist"], pa.float64()),
    }))


def kcenter_greedy(ds, *, id_col: str, vec_col: str, k: int = 8):
    """Greedy k-center coreset (Gonzalez 2-approximation): start from
    the lowest id, repeatedly add the point FARTHEST (euclidean) from
    the current set -- the diversity-maximizing selection used for
    "cover the embedding space with k exemplars" sampling, with a
    provable 2x bound on the covering radius.

    k streaming passes: each pass broadcasts the chosen centers via
    ``ray.put`` and reduces per-block (max min-distance, argmax id,
    argmax VECTOR) candidates — carrying the winning row's vector in
    the partial means the next round's center needs no second
    fetch-by-id scan (one pass per round, not two).  Ties break to the
    smaller id, so the selection is deterministic under any
    partitioning.  rows-only by contract (iterative); brute-force
    parity pinned in unit tests.
    Output: (round int64, id_col int64, dist round-6 [distance to the
    previously chosen set; 0 for the seed]).
    """
    import ray

    base = ds.select_columns([id_col, vec_col])
    seed = int(base.aggregate(ray.data.aggregate.Min(id_col))[
        f"min({id_col})"])

    def seed_partial(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        hit = np.flatnonzero(ids == seed)
        if len(hit) == 0:
            return pa.table({"vec": pa.array([], pa.list_(pa.float64()))})
        mat = _batch_matrix(t, vec_col).astype(np.float64)
        return pa.table({
            "vec": pa.array([mat[hit[0]].tolist()],
                            pa.list_(pa.float64())),
        })

    seed_rows = base.map_batches(
        seed_partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    chosen_ids = [seed]
    chosen_dists = [0.0]
    centers = [np.asarray(seed_rows[0]["vec"], dtype=np.float64)]
    for _ in range(k - 1):
        c_ref = ray.put(np.stack(centers))

        def far_partial(t: pa.Table) -> pa.Table:
            cs = ray.get(c_ref)
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            mat = _batch_matrix(t, vec_col).astype(np.float64)
            d2 = ((mat[:, None, :] - cs[None, :, :]) ** 2).sum(axis=2)
            dmin = np.sqrt(d2.min(axis=1))
            order = np.lexsort((ids, -dmin))
            j = order[0]
            return pa.table({
                "id": pa.array([int(ids[j])], pa.int64()),
                "d": pa.array([float(dmin[j])], pa.float64()),
                "vec": pa.array([mat[j].tolist()],
                                pa.list_(pa.float64())),
            })

        cand = base.map_batches(far_partial, batch_format="pyarrow",
                                zero_copy_batch=True).take_all()
        cand.sort(key=lambda r: (-r["d"], r["id"]))
        best = cand[0]
        chosen_ids.append(int(best["id"]))
        chosen_dists.append(float(best["d"]))
        centers.append(np.asarray(best["vec"], dtype=np.float64))

    return ray.data.from_arrow(pa.table({
        "round": pa.array(range(len(chosen_ids)), pa.int64()),
        id_col: pa.array(chosen_ids, pa.int64()),
        "dist": pa.array([round(d, 6) for d in chosen_dists],
                         pa.float64()),
    }))


def hotelling_t2(ds, *, vec_col: str, label_col: str, label_a,
                 label_b):
    """Two-sample Hotelling T^2 between two labeled embedding clouds:
    T^2 = (n_a n_b / (n_a + n_b)) (mu_a - mu_b)' S_pooled^-1
    (mu_a - mu_b), with the F-scaled statistic reported -- the
    multivariate "did this class's embedding distribution move"
    test that per-dimension t-tests fatally under-power.

    Mergeable (n, sum, sum-outer-product) sketches per label (the PCA
    sketch contract), one d x d solve on the driver; rows-only by
    contract (matrix inverse is not SQL-expressible); brute-force
    parity pinned in unit tests.  Output one row (n_a, n_b, t2
    round-6, f round-6; NULL on singular pooled covariance).
    """
    import ray

    base = ds.select_columns([label_col, vec_col])

    def partials(t: pa.Table) -> pa.Table:
        labs = t.column(label_col).to_numpy(zero_copy_only=False)
        mat = _batch_matrix(t, vec_col).astype(np.float64)
        rows = []
        for lab, tag in ((label_a, 0), (label_b, 1)):
            sel = labs == lab
            if not sel.any():
                continue
            x = mat[sel]
            rows.append((tag, len(x), x.sum(axis=0),
                         x.T @ x))
        if not rows:
            return pa.table({
                "tag": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.list_(pa.float64())),
                "ss": pa.array([], pa.list_(pa.float64())),
            })
        return pa.table({
            "tag": pa.array([r[0] for r in rows], pa.int64()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "s": pa.array([list(r[2]) for r in rows],
                          pa.list_(pa.float64())),
            "ss": pa.array([list(r[3].ravel()) for r in rows],
                           pa.list_(pa.float64())),
        })

    parts = base.map_batches(partials, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    acc = {}
    for r in parts:
        tag = r["tag"]
        if tag not in acc:
            acc[tag] = [0, None, None]
        acc[tag][0] += r["n"]
        s = np.asarray(r["s"], dtype=np.float64)
        ss = np.asarray(r["ss"], dtype=np.float64)
        acc[tag][1] = s if acc[tag][1] is None else acc[tag][1] + s
        acc[tag][2] = ss if acc[tag][2] is None else acc[tag][2] + ss
    schema = pa.schema([("n_a", pa.int64()), ("n_b", pa.int64()),
                        ("t2", pa.float64()), ("f", pa.float64())])
    if 0 not in acc or 1 not in acc:
        return ray.data.from_arrow(schema.empty_table())
    na, sa, ssa = acc[0]
    nb, sb, ssb = acc[1]
    d = len(sa)
    mua, mub = sa / na, sb / nb
    ca = ssa.reshape(d, d) - np.outer(sa, sa) / na
    cb = ssb.reshape(d, d) - np.outer(sb, sb) / nb
    dof = na + nb - 2
    t2 = f = None
    if dof > 0 and na + nb - d - 1 > 0:
        sp = (ca + cb) / dof
        diff = mua - mub
        try:
            sol = np.linalg.solve(sp, diff)
            t2v = (na * nb / (na + nb)) * float(diff @ sol)
            t2 = round(t2v, 6)
            f = round(t2v * (na + nb - d - 1) / (dof * d), 6)
        except np.linalg.LinAlgError:
            pass
    return ray.data.from_arrow(pa.table({
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "t2": pa.array([t2], pa.float64()),
        "f": pa.array([f], pa.float64()),
    }))


def davies_bouldin_labels(ds, *, vec_col: str, label_col: str):
    """Davies-Bouldin index of the label partition of the embedding
    cloud: DB = mean over clusters of max_j (s_i + s_j) / d_ij with
    s = mean euclidean distance to the centroid and d the centroid
    separation -- lower is better-separated; the cheap companion to
    the silhouette (which needs pairwise distances this one avoids).

    Two streaming passes (centroid sums, then scatter sums against
    the broadcast centroids); the k x k finalize runs on the driver.
    rows-only by contract (centroid algebra is not SQL-expressible
    over list columns); brute-force parity pinned in unit tests.
    Output one row (n int64, k int64, db round-6).
    """
    import ray

    base = ds.select_columns([label_col, vec_col])

    def sum_partials(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column(label_col)))
        labs = t.column(label_col).to_numpy(zero_copy_only=False)
        mat = _batch_matrix(t, vec_col).astype(np.float64)
        uls = np.unique(labs)
        return pa.table({
            "label": pa.array(uls.astype(np.int64)),
            "n": pa.array([int((labs == l).sum()) for l in uls],
                          pa.int64()),
            "s": pa.array([list(mat[labs == l].sum(axis=0))
                           for l in uls], pa.list_(pa.float64())),
        })

    parts = base.map_batches(sum_partials, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    acc = {}
    for r in parts:
        lab = r["label"]
        v = np.asarray(r["s"], dtype=np.float64)
        if lab in acc:
            acc[lab][0] += r["n"]
            acc[lab][1] += v
        else:
            acc[lab] = [r["n"], v.copy()]
    labels = sorted(acc)
    cents = {lab: acc[lab][1] / acc[lab][0] for lab in labels}
    c_ref = ray.put(cents)

    def scatter_partials(t: pa.Table) -> pa.Table:
        cs = ray.get(c_ref)
        t = t.filter(pc.is_valid(t.column(label_col)))
        labs = t.column(label_col).to_numpy(zero_copy_only=False)
        mat = _batch_matrix(t, vec_col).astype(np.float64)
        out_l, out_d = [], []
        for lab, c in cs.items():
            sel = labs == lab
            if not sel.any():
                continue
            out_l.append(int(lab))
            out_d.append(float(np.sqrt(
                ((mat[sel] - c) ** 2).sum(axis=1)).sum()))
        return pa.table({"label": pa.array(out_l, pa.int64()),
                         "d": pa.array(out_d, pa.float64())})

    dparts = base.map_batches(scatter_partials,
                              batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
    dsum = {}
    for r in dparts:
        dsum[r["label"]] = dsum.get(r["label"], 0.0) + r["d"]
    k = len(labels)
    n = sum(acc[lab][0] for lab in labels)
    db = None
    if k >= 2:
        s = {lab: dsum.get(lab, 0.0) / acc[lab][0] for lab in labels}
        worst = []
        for i in labels:
            best = -np.inf
            for j in labels:
                if i == j:
                    continue
                dij = float(np.sqrt(
                    ((cents[i] - cents[j]) ** 2).sum()))
                if dij > 0:
                    best = max(best, (s[i] + s[j]) / dij)
            if np.isfinite(best):
                worst.append(best)
        if worst:
            db = round(float(np.mean(worst)), 6)
    return ray.data.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "k": pa.array([k], pa.int64()),
        "db": pa.array([db], pa.float64()),
    }))


def hubness(ds, *, id_col: str, vec_col: str, k: int = 5,
            n_queries: int = 100):
    """Hubness probe (Radovanovic et al. 2010): over the k-NN lists of
    ``n_queries`` query points, how skewed is the neighbor in-degree?
    High-dimensional spaces grow HUBS -- points that appear in
    everyone's neighbor list -- which silently dominate retrieval and
    k-NN labels.  Reports the in-degree distribution's max, the hub
    count (in-degree >= 2k), and the skewness of the in-degree over
    all points that appear at all.

    One :func:`topk_cosine` pass (queries broadcast, exact kNN); the
    in-degree census is O(n_queries x k).  Output one row (n_queries,
    n_neighbors int64 distinct, max_indeg int64, n_hubs int64,
    indeg_skew round-6).
    """
    import ray

    base = ds.select_columns([id_col, vec_col])
    pairs = topk_cosine(base, base.filter(
        expr=f"{id_col} < {int(n_queries)}"),
        id_col=id_col, vec_col=vec_col, k=k)

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("n_queries", pa.int64()),
                            ("n_neighbors", pa.int64()),
                            ("max_indeg", pa.int64()),
                            ("n_hubs", pa.int64()),
                            ("indeg_skew", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        q = t.column("query_id").to_numpy(zero_copy_only=False)
        nb = t.column("neighbor_id").to_numpy(zero_copy_only=False)
        nq = len(set(q.tolist()))
        _, indeg = np.unique(nb, return_counts=True)
        n_nb = len(indeg)
        mx = int(indeg.max())
        hubs = int(np.count_nonzero(indeg >= 2 * k))
        skew = None
        if n_nb >= 2:
            d = indeg.astype(np.float64)
            mu = d.sum() / n_nb
            m2 = float(np.sum((d - mu) ** 2)) / n_nb
            m3 = float(np.sum((d - mu) ** 3)) / n_nb
            if m2 > 0:
                skew = round(m3 / m2 ** 1.5, 6)
        return pa.table({
            "n_queries": pa.array([nq], pa.int64()),
            "n_neighbors": pa.array([n_nb], pa.int64()),
            "max_indeg": pa.array([mx], pa.int64()),
            "n_hubs": pa.array([hubs], pa.int64()),
            "indeg_skew": pa.array([skew], pa.float64()),
        })

    return pairs.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def effective_rank(ds, *, vec_col: str):
    """Effective rank of the embedding cloud (Roy & Vetterli 2007):
    erank = exp(H(lambda)) over the normalized covariance eigenvalue
    spectrum -- "how many dimensions actually carry variance", the
    single number behind truncation and whitening budgets (compare
    with TwoNN's intrinsic dimension: erank is the LINEAR version).

    Uses the same mergeable (n, sum, sum-outer-product) sketch as the
    PCA stage, one d x d eigendecomposition on the driver; rows-only
    by contract (eig).  Output one row (n int64, dim int64, erank
    round-6, top1_share round-6).
    """
    import ray

    base = ds.select_columns([vec_col])

    def partials(t: pa.Table) -> pa.Table:
        mat = _batch_matrix(t, vec_col).astype(np.float64)
        return pa.table({
            "n": pa.array([len(mat)], pa.int64()),
            "s": pa.array([list(mat.sum(axis=0))],
                          pa.list_(pa.float64())),
            "ss": pa.array([list((mat.T @ mat).ravel())],
                           pa.list_(pa.float64())),
        })

    rows = base.map_batches(partials, batch_format="pyarrow",
                            zero_copy_batch=True).take_all()
    n = sum(r["n"] for r in rows)
    schema = pa.schema([("n", pa.int64()), ("dim", pa.int64()),
                        ("erank", pa.float64()),
                        ("top1_share", pa.float64())])
    if n < 2:
        return ray.data.from_arrow(schema.empty_table())
    s = sum(np.asarray(r["s"], dtype=np.float64) for r in rows)
    ss = sum(np.asarray(r["ss"], dtype=np.float64) for r in rows)
    d = len(s)
    cov = (ss.reshape(d, d) - np.outer(s, s) / n) / (n - 1)
    lam = np.linalg.eigvalsh(cov)
    lam = lam[lam > 0]
    p = lam / lam.sum()
    erank = float(np.exp(-(p * np.log(p)).sum()))
    return ray.data.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "dim": pa.array([d], pa.int64()),
        "erank": pa.array([round(erank, 6)], pa.float64()),
        "top1_share": pa.array([round(float(p.max()), 6)],
                               pa.float64()),
    }))
