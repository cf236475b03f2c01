"""Market-basket co-occurrence: item pairs within a grouping key.

Engine extension (SURVEY.md §2.H family): the frequent-itemset /
co-purchase primitive — for every unordered pair of distinct items
appearing under the same key (parts within an order, tags within a
document), count the keys containing both.

Plan: ONE shuffle on the bounded coarse key (``hash(group) % n_buckets``),
then a vectorized per-bucket kernel: sort by (key, item), dedupe
consecutive duplicates, and generate pairs with the SHIFT-JOIN trick —
for each distance ``d`` in ``1..max_basket-1``, rows ``i`` and ``i+d``
form a pair iff they share a key (sorted, so equal keys ⇒ same
segment).  ``d`` is bounded by the largest basket in the bucket, so the
work is Σ len·(len−1)/2 pair slots with NO Python loop over baskets.
Pairs are pre-counted per bucket (codes → bincount) before the final
small ``groupby(pair).sum``; the shuffle moves one row per distinct
pair per bucket, never per pair occurrence.

Partitioning assumption: baskets are small (bounded per-key fan-in,
e.g. line items per order).  A viral key with millions of items would
need a frequency cap upstream — same caveat the reference-style dedup
paths document.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.aggregates import hash64

__all__ = ["cooccur_pairs", "item_cosine", "item_triples"]


def cooccur_pairs(ds, *, by: str, item_col: str, top: int = 100,
                  min_n: int = None, n_buckets: int = 64):
    """Top-``top`` co-occurring item pairs: (item_a, item_b, n) with
    item_a < item_b, ordered by (n DESC, item_a, item_b) — a total
    order, so the cut is deterministic on both engines.

    ``min_n`` switches to SUPPORT-threshold mode: ALL pairs with
    ``n >= min_n`` (unordered output, exact — every pair's occurrences
    land in one pair bucket) instead of a global top-k."""
    from ray.data.aggregate import Sum

    def project(batch: pa.Table) -> pa.Table:
        coarse = (hash64(batch.column(by)) % np.uint64(n_buckets)).astype(
            np.int64)
        return pa.table({
            by: batch.column(by),
            "_it": pc.cast(batch.column(item_col), pa.int64()),
            "coarse": pa.array(coarse),
        })

    def kernel(group: pa.Table) -> pa.Table:
        keys = group.column(by).to_numpy(zero_copy_only=False)
        it = group.column("_it").to_numpy(zero_copy_only=False)
        order = np.lexsort((it, keys))
        keys, it = keys[order], it[order]
        keep = np.ones(len(keys), dtype=bool)  # distinct (key, item)
        if len(keys) > 1:
            keep[1:] = (keys[1:] != keys[:-1]) | (it[1:] != it[:-1])
        keys, it = keys[keep], it[keep]
        empty = pa.table({"item_a": pa.array([], pa.int64()),
                          "item_b": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        n = len(keys)
        if n < 2:
            return empty
        new = np.ones(n, dtype=bool)
        new[1:] = keys[1:] != keys[:-1]
        max_len = int(np.bincount(np.cumsum(new) - 1).max())
        a_parts, b_parts = [], []
        for d in range(1, max_len):
            same = keys[:-d] == keys[d:]
            if same.any():
                a_parts.append(it[:-d][same])
                b_parts.append(it[d:][same])
        if not a_parts:
            return empty
        a = np.concatenate(a_parts)
        b = np.concatenate(b_parts)
        # pre-count within the bucket: code pairs, bincount
        uniq, inv = np.unique(np.stack([a, b]), return_inverse=True)
        inv = inv.reshape(2, -1)
        m = len(uniq)
        pair = inv[0] * m + inv[1]
        cnt = np.bincount(pair)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "item_a": pa.array(uniq[nz // m], pa.int64()),
            "item_b": pa.array(uniq[nz % m], pa.int64()),
            "n": pa.array(cnt[nz], pa.int64()),
        })

    partials = ds.select_columns([by, item_col]).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("coarse").map_groups(kernel, batch_format="pyarrow")

    # Merge partial pair counts on a COARSE pair-hash key, not a
    # groupby over the raw (item_a, item_b) space — distinct pairs are
    # nearly as numerous as pair occurrences, so one-tiny-group-per-pair
    # is the classic many-tiny-groups shuffle.  Every occurrence of a
    # pair lands in ONE pair bucket, so a per-bucket top-`top` is a
    # superset of the global top-`top`; the final sort+limit runs over
    # ≤ n_buckets·top rows.
    def add_pair_coarse(t: pa.Table) -> pa.Table:
        a = t.column("item_a").to_numpy(zero_copy_only=False)
        b = t.column("item_b").to_numpy(zero_copy_only=False)
        h = (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             ^ b.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))
        return t.append_column(
            "pc", pa.array((h % np.uint64(n_buckets)).astype(np.int64)))

    cut_top = top if min_n is None else None

    def combine_topk(group: pa.Table) -> pa.Table:
        a = group.column("item_a").to_numpy(zero_copy_only=False)
        b = group.column("item_b").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(np.stack([a, b]), return_inverse=True)
        inv = inv.reshape(2, -1)
        m = len(uniq)
        pair = inv[0] * m + inv[1]
        order = np.argsort(pair, kind="stable")
        pair_s, n_s = pair[order], n[order]
        new = np.ones(len(pair_s), dtype=bool)
        new[1:] = pair_s[1:] != pair_s[:-1]
        seg = np.cumsum(new) - 1
        tot = np.bincount(seg, weights=n_s).astype(np.int64)
        firsts = pair_s[new]
        aa, bb = uniq[firsts // m], uniq[firsts % m]
        if cut_top is not None:
            keep = np.lexsort((bb, aa, -tot))[:cut_top]
        else:
            keep = np.flatnonzero(tot >= min_n)
        return pa.table({
            "item_a": pa.array(aa[keep], pa.int64()),
            "item_b": pa.array(bb[keep], pa.int64()),
            "n": pa.array(tot[keep], pa.int64()),
        })

    merged = partials.map_batches(
        add_pair_coarse, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("pc").map_groups(combine_topk, batch_format="pyarrow")
    if min_n is not None:
        return merged
    return merged.sort(
        ["n", "item_a", "item_b"], descending=[True, False, False]
    ).limit(top)


def pair_lift(ds, *, by: str, item_col: str, min_n: int = 3,
              n_buckets: int = 64):
    """Association LIFT for every co-occurring pair above a support
    threshold: ``lift(a, b) = n_ab · n_baskets / (n_a · n_b)`` where
    ``n_x`` counts baskets CONTAINING x — lift > 1 means the pair
    co-occurs more than independence predicts (the market-basket /
    template-detection signal on top of raw co-occurrence counts).

    Pair counts come from :func:`cooccur_pairs`'s threshold mode; the
    per-item basket counts are a tiny distinct-pair aggregate,
    broadcast via ``ray.put`` (item vocabulary is catalog-bounded —
    the documented small side).  Output:
    (item_a, item_b, n, lift) for pairs with n >= min_n."""
    import ray
    from ray.data.aggregate import Count

    pairs = cooccur_pairs(ds, by=by, item_col=item_col, min_n=min_n,
                          n_buckets=n_buckets)

    def project(batch: pa.Table) -> pa.Table:
        coarse = (hash64(batch.column(by)) % np.uint64(n_buckets)).astype(
            np.int64)
        return pa.table({
            "coarse": pa.array(coarse),
            by: batch.column(by),
            "_it": pc.cast(batch.column(item_col), pa.int64()),
        })

    def bucket_distinct(group: pa.Table) -> pa.Table:
        # whole baskets land in one bucket, so within-bucket dedup of
        # (basket, item) is GLOBAL dedup — a per-batch dedup would
        # double-count baskets that span input blocks
        keys = group.column(by).to_numpy(zero_copy_only=False)
        it = group.column("_it").to_numpy(zero_copy_only=False)
        order = np.lexsort((it, keys))
        k, i = keys[order], it[order]
        keep = np.ones(len(k), dtype=bool)
        if len(k) > 1:
            keep[1:] = (k[1:] != k[:-1]) | (i[1:] != i[:-1])
        return pa.table({by: pa.array(k[keep]), "_it": pa.array(i[keep])})

    d = ds.select_columns([by, item_col]).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("coarse").map_groups(bucket_distinct,
                                   batch_format="pyarrow")
    item_counts = pa.concat_tables(list(
        d.groupby("_it").aggregate(Count(alias_name="n_item"))
        .iter_batches(batch_format="pyarrow")))
    n_baskets = d.map_batches(
        lambda t: pa.table({by: pc.unique(t.column(by))}),
        batch_format="pyarrow", zero_copy_batch=True
    ).groupby(by).count().count()
    counts = dict(zip(item_counts.column("_it").to_pylist(),
                      item_counts.column("n_item").to_pylist()))
    ref = ray.put((counts, float(n_baskets)))

    def add_lift(t: pa.Table) -> pa.Table:
        cnts, nb = ray.get(ref)
        a = t.column("item_a").to_pylist()
        b = t.column("item_b").to_pylist()
        n = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.float64)
        na = np.array([cnts[x] for x in a], dtype=np.float64)
        nbv = np.array([cnts[x] for x in b], dtype=np.float64)
        return t.append_column(
            "lift", pa.array(n * nb / (na * nbv)))

    return pairs.map_batches(add_lift, batch_format="pyarrow")


def item_cosine(ds, *, user_col: str, item_col: str, k: int = 10):
    """Item-item cosine (Ochiai) similarity over user baskets:
    sim(a, b) = n_ab / sqrt(n_a n_b) with n_a = users touching item a
    and n_ab = users touching both -- the classic item-based
    collaborative-filtering kernel, reported for the top-k pairs
    (cosine desc, names asc).  Exact integer co-occurrence counts
    from per-user distinct item sets.

    Plan: per-batch distinct (user, item) pairs, one groupby to global
    distinct, per-user item-pair expansion (bounded by items-per-user
    squared), one pair-count groupby.  Output: (item_a, item_b,
    n_both int64, cosine round-6).
    """
    from ray.data.aggregate import Count

    def distinct_pairs(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(user_col)),
                     pc.is_valid(t.column(item_col)))
        g = t.filter(ok)
        u = g.column(user_col).to_numpy(zero_copy_only=False)
        it = g.column(item_col)
        it = it.combine_chunks() if isinstance(it, pa.ChunkedArray) \
            else it
        enc = pc.dictionary_encode(it)
        code = np.asarray(enc.indices, dtype=np.int64)
        key = u * max(len(enc.dictionary), 1) + code
        _, first = np.unique(key, return_index=True)
        idx = pa.array(np.sort(first), pa.int64())
        return pa.table({"u": pc.take(pa.array(u), idx),
                         "item": pc.take(it, idx)})

    pairs = (ds.select_columns([user_col, item_col])
             .map_batches(distinct_pairs, batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby(["u", "item"]).aggregate(Count(alias_name="_")))

    item_n = pairs.groupby("item").aggregate(
        Count(alias_name="n")).take_all()
    n_of = {r["item"]: r["n"] for r in item_n}

    def expand(group: pa.Table) -> pa.Table:
        t = group.sort_by([("u", "ascending"),
                           ("item", "ascending")])
        u = t.column("u").to_numpy(zero_copy_only=False)
        items = t.column("item").to_pylist()
        out_a, out_b = [], []
        i = 0
        n = len(u)
        while i < n:
            j = i
            while j < n and u[j] == u[i]:
                j += 1
            basket = items[i:j]
            for a in range(len(basket)):
                for b in range(a + 1, len(basket)):
                    out_a.append(basket[a])
                    out_b.append(basket[b])
            i = j
        return pa.table({"item_a": pa.array(out_a, pa.string()),
                         "item_b": pa.array(out_b, pa.string())})

    co = pairs.groupby("u").map_groups(
        expand, batch_format="pyarrow"
    ).groupby(["item_a", "item_b"]).aggregate(
        Count(alias_name="n_both"))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("item_a", pa.string()),
                            ("item_b", pa.string()),
                            ("n_both", pa.int64()),
                            ("cosine", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        a = t.column("item_a").to_pylist()
        b = t.column("item_b").to_pylist()
        nb = t.column("n_both").to_numpy(zero_copy_only=False).astype(
            np.int64)
        rows = []
        for aa, bb, c in zip(a, b, nb):
            cos = c / np.sqrt(float(n_of[aa]) * n_of[bb])
            rows.append((aa, bb, int(c), cos))
        rows.sort(key=lambda r: (-r[3], r[0], r[1]))
        rows = rows[:k]
        return pa.table({
            "item_a": pa.array([r[0] for r in rows], pa.string()),
            "item_b": pa.array([r[1] for r in rows], pa.string()),
            "n_both": pa.array([r[2] for r in rows], pa.int64()),
            "cosine": pa.array([round(r[3], 6) for r in rows],
                               pa.float64()),
        })

    return co.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def item_triples(ds, *, user_col: str, item_col: str, k: int = 10):
    """Frequent 3-itemset census over user baskets: for every item
    triple {a, b, c} the number of users touching all three, plus the
    LIFT against independence (n_abc * n_users^2 / (n_a n_b n_c)) --
    the beyond-pairs association mining step (pair lift is blind to
    genuinely triadic bundles).  Exact integer counts from per-user
    distinct item sets; triple expansion is bounded by
    (items-per-user choose 3).

    Output: (item_a, item_b, item_c, n_all3 int64, lift round-6),
    top-k by support desc then names asc.
    """
    from ray.data.aggregate import Count

    def distinct_pairs(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(user_col)),
                     pc.is_valid(t.column(item_col)))
        g = t.filter(ok)
        u = g.column(user_col).to_numpy(zero_copy_only=False)
        it = g.column(item_col)
        it = it.combine_chunks() if isinstance(it, pa.ChunkedArray) \
            else it
        enc = pc.dictionary_encode(it)
        code = np.asarray(enc.indices, dtype=np.int64)
        key = u * max(len(enc.dictionary), 1) + code
        _, first = np.unique(key, return_index=True)
        idx = pa.array(np.sort(first), pa.int64())
        return pa.table({"u": pc.take(pa.array(u), idx),
                         "item": pc.take(it, idx)})

    pairs = (ds.select_columns([user_col, item_col])
             .map_batches(distinct_pairs, batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby(["u", "item"]).aggregate(Count(alias_name="_")))

    item_n = pairs.groupby("item").aggregate(
        Count(alias_name="n")).take_all()
    n_of = {r["item"]: r["n"] for r in item_n}
    n_users = len(set()) or None
    n_users = pairs.groupby("u").aggregate(
        Count(alias_name="_")).count()

    def expand(group: pa.Table) -> pa.Table:
        t = group.sort_by([("u", "ascending"), ("item", "ascending")])
        u = t.column("u").to_numpy(zero_copy_only=False)
        items = t.column("item").to_pylist()
        oa, ob, oc = [], [], []
        i = 0
        n = len(u)
        while i < n:
            j = i
            while j < n and u[j] == u[i]:
                j += 1
            basket = items[i:j]
            m = len(basket)
            for a in range(m):
                for b in range(a + 1, m):
                    for c in range(b + 1, m):
                        oa.append(basket[a])
                        ob.append(basket[b])
                        oc.append(basket[c])
            i = j
        return pa.table({"item_a": pa.array(oa, pa.string()),
                         "item_b": pa.array(ob, pa.string()),
                         "item_c": pa.array(oc, pa.string())})

    co = pairs.groupby("u").map_groups(
        expand, batch_format="pyarrow"
    ).groupby(["item_a", "item_b", "item_c"]).aggregate(
        Count(alias_name="n_all3"))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("item_a", pa.string()),
                            ("item_b", pa.string()),
                            ("item_c", pa.string()),
                            ("n_all3", pa.int64()),
                            ("lift", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        a = t.column("item_a").to_pylist()
        b = t.column("item_b").to_pylist()
        c = t.column("item_c").to_pylist()
        n3 = t.column("n_all3").to_numpy(zero_copy_only=False).astype(
            np.int64)
        rows = []
        for aa, bb, cc, nn in zip(a, b, c, n3):
            lift = (float(nn) * n_users * n_users
                    / (float(n_of[aa]) * n_of[bb] * n_of[cc]))
            rows.append((aa, bb, cc, int(nn), lift))
        rows.sort(key=lambda r: (-r[3], r[0], r[1], r[2]))
        rows = rows[:k]
        return pa.table({
            "item_a": pa.array([r[0] for r in rows], pa.string()),
            "item_b": pa.array([r[1] for r in rows], pa.string()),
            "item_c": pa.array([r[2] for r in rows], pa.string()),
            "n_all3": pa.array([r[3] for r in rows], pa.int64()),
            "lift": pa.array([round(r[4], 6) for r in rows],
                             pa.float64()),
        })

    return co.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)
