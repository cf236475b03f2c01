"""Distributed connected components over a duplicate-pair edge list.

At corpus scale, near-dup detection (MinHash/SimHash/Jaccard — see
``stages/dedup.py``) emits PAIRS, but the thing a training-data pipeline
actually needs is the CLUSTER: every document labeled with one canonical
representative so the pipeline can keep exactly one row per cluster.
Pairs chain ((a,b), (b,c) → {a,b,c}), so this is connected components.

Algorithm: **hash-to-min** (Rastogi et al., "Finding Connected
Components in Map-Reduce in Logarithmic Rounds") — a groupby-only
formulation, no joins:

* state = (v, u) rows meaning "u is a known member of v's neighborhood"
  (initialized to the symmetric edge list + self-loops);
* one round = group state by v (via a coarse bucket key so the shuffle
  has a bounded number of near-uniform groups), per node compute
  ``m = min(members)`` and emit ``(m, x)`` and ``(x, m)`` for every
  member x;
* per-node min labels are monotone nonincreasing, so the iteration has
  converged exactly when ``sum(min)`` over all nodes stops changing.

Rounds are O(log n) in the component size; each round shuffles only the
current state, whose size is bounded by the dedup-pair output (orders of
magnitude below the corpus — pairs are the SMALL end of the pipeline).
The per-round ``materialize()`` is therefore bounded, and keeps the
lineage from re-executing the whole prefix every round.

No analogue exists in the reference (upstream datatest validates flat
values only); this is part of the §2.I dedup extension family.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _N_COARSE, _concat_ranges_np

__all__ = ["connected_components", "degree_histogram", "er_cluster_sizes",
           "cluster_size_histogram", "pagerank", "projected_edges",
           "triangle_stats", "bradley_terry", "bfs_levels",
           "degree_assortativity", "k_core", "degree_gini"]

_LABEL_SCHEMA = pa.schema([("node", pa.int64()), ("cluster_id", pa.int64())])


def _coarse(v: np.ndarray) -> pa.Array:
    C = np.uint64(0x9E3779B97F4A7C15)
    return pa.array(
        ((v.astype(np.uint64) * C) % np.uint64(_N_COARSE)).astype(np.int64)
    )


def _segments(v_sorted: np.ndarray) -> np.ndarray:
    """Row counts of consecutive equal-v segments of a sorted array."""
    new = np.ones(len(v_sorted), dtype=bool)
    new[1:] = v_sorted[1:] != v_sorted[:-1]
    return np.diff(np.append(np.flatnonzero(new), len(v_sorted)))


def _hash_to_min_round(group: pa.Table) -> pa.Table:
    """One hash-to-min round over every node hashed into this coarse
    bucket, with LOCAL CLOSURE: instead of one min-propagation step,
    the kernel runs the bucket's (v, u) evidence rows to a fixpoint
    in-memory (vectorized ``np.minimum.at`` edge relaxation plus
    pointer-jumping through locally-present label nodes) — every row
    (v, u) is same-component evidence, so transitive local merging is
    sound.  Cross-bucket chains still need global rounds, but those
    now converge in O(log_buckets diameter) instead of O(diameter):
    2-3 shuffles in practice where plain hash-to-min needs 10+.

    Output carries a tag column ``t``: t=0 rows are the next round's
    state ((m, x) and (x, m) for every node x seen in this bucket);
    t=1 rows are per-node min labels (node in ``v``, label in ``u``),
    emitted ONLY for nodes whose home bucket this is, so each node is
    labeled exactly once per round — the label pass rides the SAME
    shuffle instead of a second groupby (fused-round plan)."""
    v = group.column("v").to_numpy(zero_copy_only=False)
    u = group.column("u").to_numpy(zero_copy_only=False)
    if len(v) == 0:
        e = pa.array([], pa.int64())
        return pa.table({"coarse": e, "v": e, "u": e, "t": e})
    bucket_id = int(group.column("coarse")[0].as_py())
    nodes, inv = np.unique(np.concatenate([v, u]), return_inverse=True)
    iv, iu = inv[:len(v)], inv[len(v):]
    lab = nodes.copy()
    last = len(nodes) - 1
    while True:
        old = lab
        lab = lab.copy()
        # relax every evidence row in both directions
        np.minimum.at(lab, iv, lab[iu])
        np.minimum.at(lab, iu, lab[iv])
        # pointer jump: adopt the label OF the label when the label is
        # itself a node present in this bucket (log-steps chains)
        pos = np.minimum(np.searchsorted(nodes, lab), last)
        hit = nodes[pos] == lab
        lab = np.where(hit, np.minimum(lab, lab[pos]), lab)
        if np.array_equal(lab, old):
            break
    # state: (m, x) and (x, m) for every node; labels only for nodes
    # homed here (their v-rows all hash to this bucket)
    out_v = np.concatenate([lab, nodes])
    out_u = np.concatenate([nodes, lab])
    home = (((nodes.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
             % np.uint64(_N_COARSE)).astype(np.int64) == bucket_id)
    lv, lu = nodes[home], lab[home]
    all_v = np.concatenate([out_v, lv])
    all_u = np.concatenate([out_u, lu])
    tag = np.zeros(len(all_v), dtype=np.int64)
    if len(lv):
        tag[-len(lv):] = 1
    return pa.table({"coarse": _coarse(all_v),
                     "v": pa.array(all_v), "u": pa.array(all_u),
                     "t": pa.array(tag)})


def connected_components(
    pairs_ds,
    *,
    a_col: str = "a",
    b_col: str = "b",
    max_iters: int = 32,
    shuffle_partitions: Optional[int] = None,
):
    """Label every node in the pair list with its component's minimum
    node id.  Returns a Dataset with columns ``(node, cluster_id)`` —
    one row per distinct node.  Node ids must be integers (dedup pair
    ids are; hash string ids upstream if needed)."""
    import ray.data

    def init(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.concatenate([a, b, a, b])
        u = np.concatenate([b, a, a, b])
        return pa.table({"coarse": _coarse(v), "v": pa.array(v), "u": pa.array(u)})

    state = pairs_ds.select_columns([a_col, b_col]).map_batches(
        init, batch_format="pyarrow", zero_copy_batch=True
    )
    if shuffle_partitions:
        state = state.repartition(shuffle_partitions)
    state = state.materialize()
    if state.count() == 0:
        return ray.data.from_arrow(_LABEL_SCHEMA.empty_table())

    def take_state(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("t"), 0)).select(
            ["coarse", "v", "u"])

    def take_labels(t: pa.Table) -> pa.Table:
        lab = t.filter(pc.equal(t.column("t"), 1))
        return pa.table({"node": lab.column("v"),
                         "cluster_id": lab.column("u")})

    # fused-round loop: ONE shuffle per round (state update and the
    # per-node min labels come out of the same map_groups, split by a
    # cheap tag filter over the materialized blocks); convergence when
    # the monotone-nonincreasing label sum stops changing
    prev_sum = None
    labels = None
    for _ in range(max_iters):
        fused = state.groupby("coarse").map_groups(
            _hash_to_min_round, batch_format="pyarrow"
        ).materialize()
        state = fused.map_batches(take_state, batch_format="pyarrow",
                                  zero_copy_batch=True)
        labels = fused.map_batches(take_labels, batch_format="pyarrow",
                                   zero_copy_batch=True).materialize()
        cur_sum = labels.sum("cluster_id")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    extras = [c for c in labels.schema().names
              if c not in ("node", "cluster_id")]
    return labels.drop_columns(extras) if extras else labels


def degree_histogram(pairs_ds, *, a_col: str = "a", b_col: str = "b"):
    """Degree distribution of the (undirected) dup-pair graph:
    ``(degree, n_nodes)`` — the shape diagnostic that tells a dedup
    pipeline whether its pair graph is sparse matches or a hub
    explosion (one template document matching everything).

    Plan: per-batch both-direction degree partials (bincount over
    dictionary codes), ONE groupby(node) sum, then a tiny
    groupby(degree) count.
    """
    from ray.data.aggregate import Count, Sum

    def partial(t: pa.Table) -> pa.Table:
        a = t.column(a_col).to_numpy(zero_copy_only=False)
        b = t.column(b_col).to_numpy(zero_copy_only=False)
        nodes = np.concatenate([a, b]).astype(np.int64)
        uniq, cnt = np.unique(nodes, return_counts=True)
        return pa.table({"node": pa.array(uniq),
                         "d": pa.array(cnt.astype(np.int64))})

    deg = (
        pairs_ds.select_columns([a_col, b_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .aggregate(Sum("d", alias_name="degree"))
    )
    return deg.groupby("degree").aggregate(Count(alias_name="n_nodes"))


def er_cluster_sizes(ds, text_col: str, id_col: str, *,
                     block_chars: int = 3, window: int = 5,
                     threshold: float = 0.94, prefix: int = 32):
    """Composed entity-resolution pipeline: sorted-neighborhood
    candidate pairs (``dedup.sorted_neighborhood_pairs``) → connected
    components over the match graph → cluster-size histogram
    (size, n_clusters) — the end-to-end dedup audit ("how many entity
    groups of each size did linkage find?").

    Every stage is the already-distributed operator; the composition
    adds two tiny groupbys (per-cluster count, per-size count) whose
    key spaces are bounded by cluster count and max cluster size.
    """
    from .dedup import sorted_neighborhood_pairs

    pairs = sorted_neighborhood_pairs(
        ds, text_col, id_col, block_chars=block_chars, window=window,
        prefix=prefix, threshold=threshold)
    return cluster_size_histogram(pairs, a_col="a_id", b_col="b_id")


def cluster_size_histogram(pairs_ds, *, a_col: str = "a",
                           b_col: str = "b"):
    """Connected components over a pair stream → (size, n_clusters)
    histogram; the shared tail of every "how big are my duplicate
    groups?" audit (text ER, image phash near-dup).  Two tiny groupbys
    past the components loop — key spaces bounded by cluster count and
    max cluster size."""
    from ray.data.aggregate import Count

    comp = connected_components(pairs_ds, a_col=a_col, b_col=b_col)
    sizes = comp.groupby("cluster_id").aggregate(
        Count(alias_name="size"))
    return sizes.groupby("size").aggregate(
        Count(alias_name="n_clusters"))


def _pagerank_broadcast(edges, deg, n_nodes, *, src_col: str,
                        dst_col: str, iters: int, damping: float):
    """Small-node-set PageRank rounds: the (sorted nodes, r/outdeg)
    vector is ``ray.put`` once per round; every edge block gathers
    map-side (searchsorted) and pre-sums contributions per dst, so the
    only shuffle per round is a groupby(dst) over per-batch partials.
    The per-round reduce is collected to the driver (node-sized — this
    path is only taken when that is small by contract)."""
    import ray
    import ray.data as rd

    from .base import collect_table

    deg_t = collect_table(deg, [src_col, "deg"])
    nodes = deg_t.column(src_col).to_numpy(zero_copy_only=False).astype(
        np.int64)
    order = np.argsort(nodes, kind="stable")
    nodes = nodes[order]
    outdeg = deg_t.column("deg").to_numpy(
        zero_copy_only=False).astype(np.float64)[order]
    r = np.full(n_nodes, 1.0 / n_nodes)
    base = (1.0 - damping) / n_nodes
    last = n_nodes - 1

    for _ in range(iters):
        handle = ray.put((nodes, r / outdeg))

        def contrib(t: pa.Table) -> pa.Table:
            nd, rdiv = ray.get(handle)
            src = t.column(src_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            dst = t.column(dst_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            pos = np.minimum(np.searchsorted(nd, src), len(nd) - 1)
            hit = nd[pos] == src
            dst, pos = dst[hit], pos[hit]
            ud, inv = np.unique(dst, return_inverse=True)
            return pa.table({
                "node": pa.array(ud, pa.int64()),
                "c": pa.array(np.bincount(inv, weights=rdiv[pos])),
            })

        from ray.data.aggregate import Sum

        sums = edges.map_batches(
            contrib, batch_format="pyarrow", zero_copy_batch=True
        ).groupby("node").aggregate(Sum("c", alias_name="c"))
        st = collect_table(sums, ["node", "c"])
        sn = st.column("node").to_numpy(zero_copy_only=False).astype(
            np.int64)
        sc = st.column("c").to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(nodes, sn), last)
        r = np.full(n_nodes, base)
        good = nodes[pos] == sn
        r[pos[good]] = base + damping * sc[good]

    return rd.from_arrow(pa.table({
        "node": pa.array(nodes, pa.int64()),
        "pr": pa.array(r, pa.float64()),
    }))


def pagerank(edges_ds, *, src_col: str = "src", dst_col: str = "dst",
             iters: int = 3, damping: float = 0.85,
             num_partitions: int = 8,
             broadcast_nodes_max: int = 1 << 22):
    """Distributed PageRank over a DIRECTED edge list (symmetrize
    upstream for undirected graphs), the iterative-JOIN counterpart of
    the broadcast-iterative k-means: each round is one hash join
    (edges ⋈ ranks on src) plus one groupby(dst) sum — rank state
    stays a Dataset end to end, nothing node-sized is ever broadcast
    or collected, so the node set can exceed single-machine memory.

    r_{k+1}(v) = (1-d)/N + d · Σ_{u→v} r_k(u)/outdeg(u).

    Assumes no dangling nodes (every node has an out-edge — true for
    symmetrized graphs).  Rounds materialize between iterations so
    lineage stays one round deep.  Each round is ONE fused co-group
    shuffle (edges and rank state tagged and hashed on src into the
    same coarse buckets; the bucket kernel gathers r/outdeg by sorted
    lookup, then PRE-AGGREGATES contributions per dst and emits the
    per-node deg carrier in the same pass) plus one small groupby(dst)
    over the partials — the second shuffle moves O(distinct dst per
    bucket), not O(edges).  Output: (node, pr) for EVERY node, iters
    rounds deep.

    Mode switch (measured, not guessed): when the node set fits
    comfortably in a worker heap (``n_nodes <= broadcast_nodes_max``,
    default 4M ≈ 100 MB of rank state) the rank vector is ``ray.put``
    once per round and every edge block gathers it MAP-SIDE — the
    edges never shuffle; each round is one combiner-reduced
    groupby(dst) over per-batch partial sums.  Above the threshold the
    dataset-state co-group rounds below run instead (state too big to
    broadcast — the 10^12-node regime), trading shuffles for
    unbounded state.
    """
    from ray.data.aggregate import Count, Max, Sum

    from ..functions.aggregates import hash64

    edges = edges_ds.select_columns([src_col, dst_col]).materialize()
    deg = edges.groupby(src_col).aggregate(
        Count(alias_name="deg")).materialize()
    n_nodes = deg.count()
    if n_nodes == 0:
        import ray.data as _rd

        return _rd.from_arrow(pa.schema(
            [("node", pa.int64()), ("pr", pa.float64())]).empty_table())
    if n_nodes <= broadcast_nodes_max:
        # Coalesce the edge list before the rounds: upstream pair
        # dedup typically leaves O(coarse-bucket) tiny blocks (256 at
        # bench scale), and every round pays per-block scheduling for
        # contrib + the partial aggregate.  One block per ~200k edges
        # (floor num_partitions) keeps the map vectorized and parallel
        # at any scale while cutting the per-round task count ~30x
        # (measured: 3.2 s -> ~1.4 s per round at sf0.1).
        n_edges = edges.count()
        target = max(num_partitions, int(np.ceil(n_edges / 200_000)))
        if edges.num_blocks() > 2 * target:
            edges = edges.repartition(target).materialize()
        return _pagerank_broadcast(edges, deg, n_nodes,
                                   src_col=src_col, dst_col=dst_col,
                                   iters=iters, damping=damping)
    n_buckets = np.uint64(64)

    def init_state(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t.column(src_col),
            "r": pa.array(np.full(t.num_rows, 1.0 / n_nodes)),
            "deg": pc.cast(t.column("deg"), pa.int64()),
        })

    state = deg.map_batches(init_state, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    def tag_edges(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "k": t.column(src_col),
            "dst": t.column(dst_col),
            "r": pa.nulls(n, pa.float64()),
            "deg": pa.nulls(n, pa.int64()),
            "s": pa.array(np.zeros(n, dtype=np.int8)),
            "coarse": pa.array((hash64(t.column(src_col)) %
                                n_buckets).astype(np.int64)),
        })

    def tag_state(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "k": t.column("node"),
            "dst": pa.nulls(n, t.column("node").type),
            "r": t.column("r"),
            "deg": t.column("deg"),
            "s": pa.array(np.ones(n, dtype=np.int8)),
            "coarse": pa.array((hash64(t.column("node")) %
                                n_buckets).astype(np.int64)),
        })

    def round_kernel(group: pa.Table) -> pa.Table:
        """Gather r/outdeg onto this bucket's edges, pre-sum the
        contributions per dst, and re-emit the bucket's state rows as
        zero-contribution deg carriers — contributions and carriers
        reunite in the round's groupby(node)."""
        side = group.column("s").to_numpy(zero_copy_only=False)
        eds = group.filter(pa.array(side == 0))
        st = group.filter(pa.array(side == 1))
        sk = st.column("k").to_numpy(zero_copy_only=False)
        order = np.argsort(sk, kind="stable")
        sk = sk[order]
        sr = st.column("r").to_numpy(zero_copy_only=False)[order]
        sd = st.column("deg").to_numpy(
            zero_copy_only=False).astype(np.float64)[order]
        ek = eds.column("k").to_numpy(zero_copy_only=False)
        dst = eds.column("dst").to_numpy(zero_copy_only=False)
        if len(sk) and len(ek):
            pos = np.minimum(np.searchsorted(sk, ek), len(sk) - 1)
            hit = sk[pos] == ek
            dst, pos = dst[hit], pos[hit]
            c = sr[pos] / sd[pos]
            ud, inv = np.unique(dst, return_inverse=True)
            csum = np.bincount(inv, weights=c)
        else:
            ud = np.array([], dtype=np.int64)
            csum = np.array([], dtype=np.float64)
        return pa.table({
            "node": pa.array(np.concatenate([ud, sk]), pa.int64()),
            "c": pa.array(np.concatenate(
                [csum, np.zeros(len(sk))]), pa.float64()),
            "d": pa.array(np.concatenate(
                [np.zeros(len(ud), dtype=np.int64),
                 st.column("deg").to_numpy(
                     zero_copy_only=False)[order]]), pa.int64()),
        })

    base = (1.0 - damping) / n_nodes

    def finish(t: pa.Table) -> pa.Table:
        s = t.column("c").to_numpy(zero_copy_only=False)
        return pa.table({
            "node": t.column("node"),
            "r": pa.array(base + damping * s),
            "deg": t.column("d"),
        })

    tagged_edges = edges.map_batches(
        tag_edges, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    for _ in range(iters):
        partials = tagged_edges.union(
            state.map_batches(tag_state, batch_format="pyarrow",
                              zero_copy_batch=True)
        ).groupby("coarse").map_groups(round_kernel,
                                       batch_format="pyarrow")
        sums = partials.groupby("node").aggregate(
            Sum("c", alias_name="c"), Max("d", alias_name="d"))
        state = sums.map_batches(
            finish, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"), "pr": t.column("r")})

    return state.map_batches(rename, batch_format="pyarrow",
                             zero_copy_batch=True)


def _run_dedup(keys: np.ndarray) -> np.ndarray:
    """Boolean mask of run starts over a lexsorted 2-col key stack
    (keys shape (2, n)) — vectorized consecutive-distinct."""
    n = keys.shape[1]
    new = np.ones(n, dtype=bool)
    if n > 1:
        new[1:] = (keys[0, 1:] != keys[0, :-1]) | \
                  (keys[1, 1:] != keys[1, :-1])
    return new


def projected_edges(ds, *, group_col: str, node_col: str):
    """Distinct undirected co-membership edges (u < v): two nodes are
    adjacent when they share a ``group_col`` value (e.g. suppliers
    shipping the same part — the bipartite projection every
    co-occurrence graph starts from).

    Scale plan: batch-local (group, node) dedup (lexsort run-collapse),
    ONE coarse-bucket shuffle on ``hash(group) % 256`` (all rows of a
    group co-locate, so the in-bucket dedup is globally exact), fully
    vectorized per-segment pair expansion (repeat + concat-ranges — no
    Python per group), then a second coarse shuffle on the PAIR hash to
    dedup edges produced by different groups.  Hub groups (one group
    containing k nodes) expand to k(k-1)/2 pairs — cap or sample
    upstream if the group-size histogram shows hubs."""

    def project(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        x = batch.column(node_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((x, g))
        g, x = g[order], x[order]
        keep = _run_dedup(np.stack([g, x]))
        g, x = g[keep], x[keep]
        return pa.table({"coarse": _coarse(g), "g": pa.array(g),
                         "x": pa.array(x)})

    def expand(group: pa.Table) -> pa.Table:
        g = group.column("g").to_numpy(zero_copy_only=False)
        x = group.column("x").to_numpy(zero_copy_only=False)
        order = np.lexsort((x, g))
        g, x = g[order], x[order]
        keep = _run_dedup(np.stack([g, x]))
        g, x = g[keep], x[keep]
        d = _segments(g)
        li = np.arange(len(g), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(d[:-1])]), d)
        reps = np.repeat(d, d) - 1 - li
        ii = np.repeat(np.arange(len(g), dtype=np.int64), reps)
        jj = ii + 1 + _concat_ranges_np(reps)
        u, v = x[ii], x[jj]
        C1 = np.uint64(0x9E3779B97F4A7C15)
        C2 = np.uint64(0xC2B2AE3D27D4EB4F)
        ph = ((u.astype(np.uint64) * C1) ^ (v.astype(np.uint64) * C2))
        return pa.table({
            "pcoarse": pa.array((ph % np.uint64(_N_COARSE)).astype(
                np.int64)),
            "u": pa.array(u), "v": pa.array(v),
        })

    def dedup_pairs(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        keep = _run_dedup(np.stack([u, v]))
        return pa.table({"u": pa.array(u[keep]), "v": pa.array(v[keep])})

    return (
        ds.select_columns([group_col, node_col])
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse").map_groups(expand, batch_format="pyarrow")
        .groupby("pcoarse").map_groups(dedup_pairs, batch_format="pyarrow")
    )


def triangle_stats(edges_ds, *, a_col: str = "u", b_col: str = "v",
                   num_partitions: int = 16):
    """Global triangle census over a distinct undirected edge list
    (a < b): node/edge/wedge counts, the exact triangle count, and the
    transitivity ratio 3T/W — the graph-shape audit that separates a
    community-structured dup graph from a hub explosion.

    Distributed min-orientation count: every triangle {a < b < c} is
    counted exactly ONCE as a wedge centered at its smallest node
    (edges grouped by their min endpoint — one coarse shuffle, pair
    expansion vectorized across segments) closed by an existing edge
    (ONE hash join of wedge-endpoint counts against the edge list, so
    the join payload is the DISTINCT wedge endpoints, not one row per
    wedge).  W comes from degrees: Σ d(d-1)/2, exact integers
    throughout.  Returns a one-row pa.Table; transitivity is an exact
    integer quotient (null when W = 0)."""
    from ray.data.aggregate import Count, Sum

    from .relational import safe_join

    edges = edges_ds.select_columns([a_col, b_col]).materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        nodes = np.concatenate([a, b])
        uniq, cnt = np.unique(nodes, return_counts=True)
        return pa.table({"node": pa.array(uniq),
                         "d": pa.array(cnt.astype(np.int64))})

    deg = edges.map_batches(
        deg_partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("node").aggregate(Sum("d", alias_name="d"))

    def wedge_total(t: pa.Table) -> pa.Table:
        d = t.column("d").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "w": pa.array([int((d * (d - 1) // 2).sum())], pa.int64()),
            "k": pa.array([len(d)], pa.int64()),
            # each undirected edge contributes one to two degrees
            "dsum": pa.array([int(d.sum())], pa.int64()),
        })

    dm = deg.map_batches(wedge_total, batch_format="pyarrow",
                         zero_copy_batch=True).aggregate(
        Sum("w", alias_name="w"), Sum("k", alias_name="k"),
        Sum("dsum", alias_name="dsum"))
    n_wedges = int(dm.get("w") or 0)
    n_nodes = int(dm.get("k") or 0)
    n_edges = int(dm.get("dsum") or 0) // 2

    def to_center(batch: pa.Table) -> pa.Table:
        u = batch.column(a_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"coarse": _coarse(u), "u": pa.array(u),
                         "x": batch.column(b_col)})

    def expand(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False)
        x = group.column("x").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((x, u))
        u, x = u[order], x[order]
        d = _segments(u)
        li = np.arange(len(u), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(d[:-1])]), d)
        reps = np.repeat(d, d) - 1 - li
        ii = np.repeat(np.arange(len(u), dtype=np.int64), reps)
        jj = ii + 1 + _concat_ranges_np(reps)
        # local (v, w) count collapse before the shuffle: wedge pairs
        # repeat when hub centers share neighbor pairs
        v, w = x[ii], x[jj]
        order2 = np.lexsort((w, v))
        v, w = v[order2], w[order2]
        new = _run_dedup(np.stack([v, w]))
        seg = np.cumsum(new) - 1
        n = np.bincount(seg).astype(np.int64)
        first = np.flatnonzero(new)
        return pa.table({"wa": pa.array(v[first]),
                         "wb": pa.array(w[first]),
                         "n": pa.array(n)})

    wedge_counts = (
        edges.map_batches(to_center, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("coarse").map_groups(expand, batch_format="pyarrow")
        .groupby(["wa", "wb"]).aggregate(Sum("n", alias_name="n"))
    )

    closed = safe_join(
        wedge_counts, edges, join_type="inner",
        num_partitions=num_partitions,
        on=("wa", "wb"), right_on=(a_col, b_col),
    ).aggregate(Sum("n", alias_name="t"), Count(alias_name="_rows"))
    n_tri = int((closed or {}).get("t") or 0)

    trans = (3.0 * n_tri / n_wedges) if n_wedges > 0 else None
    return pa.table({
        "n_nodes": pa.array([n_nodes], pa.int64()),
        "n_edges": pa.array([n_edges], pa.int64()),
        "n_wedges": pa.array([n_wedges], pa.int64()),
        "n_triangles": pa.array([n_tri], pa.int64()),
        "transitivity": pa.array([trans], pa.float64()),
    })


def bradley_terry(pairs_ds, *, winner_col: str, loser_col: str,
                  weight_col: str = None, iters: int = 30):
    """Bradley-Terry strength estimation from pairwise outcomes — the
    model behind arena-style eval rankings: P(i beats j) =
    p_i/(p_i + p_j), fitted by the standard MM iteration

        p_i ← W_i / Σ_{j≠i} n_ij / (p_i + p_j)

    normalized to geometric mean 1 each round (the MM fixed point is
    scale-free).  The corpus reduces to the aggregated win matrix
    first (one groupby over (winner, loser) — pairs, not rows); the
    MM rounds then run driver-side over that entity-bounded matrix
    (documented assumption: #entities² fits in driver memory — use a
    cut on minimum games upstream for huge entity sets).  rows-only
    vs SQL (iterative); parity pinned in tests.  Output per entity:
    (entity, wins, games, strength), strength geometric-mean-1.
    """
    from .base import collect_table

    def partial(t: pa.Table) -> pa.Table:
        w = t.column(winner_col).to_numpy(zero_copy_only=False)
        l = t.column(loser_col).to_numpy(zero_copy_only=False)
        if weight_col is not None:
            wt = t.column(weight_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
        else:
            wt = np.ones(len(w), dtype=np.int64)
        key = w.astype(np.int64) * (1 << 32) + l.astype(np.int64)
        u, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "w": pa.array((u >> 32).astype(np.int64)),
            "l": pa.array((u & 0xFFFFFFFF).astype(np.int64)),
            "n": pa.array(np.bincount(
                inv, weights=wt).astype(np.int64)),
        })

    # per-batch (w, l, n) partials collect straight to the driver and
    # merge with one exact integer bincount — the win matrix is
    # entity²-bounded by the documented contract (the MM loop below
    # already holds it), so a distributed (w, l) sort-groupby here
    # bought nothing but a shuffle
    parts = (pairs_ds.select_columns(
        [c for c in (winner_col, loser_col, weight_col) if c])
        .map_batches(partial, batch_format="pyarrow",
                     zero_copy_batch=True))
    t = collect_table(parts, ["w", "l", "n"])
    if t.num_rows:
        w0 = t.column("w").to_numpy(zero_copy_only=False)
        l0 = t.column("l").to_numpy(zero_copy_only=False)
        n0 = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        key = w0 * (1 << 32) + l0
        u, inv = np.unique(key, return_inverse=True)
        t = pa.table({
            "w": pa.array((u >> 32).astype(np.int64)),
            "l": pa.array((u & 0xFFFFFFFF).astype(np.int64)),
            "n": pa.array(np.bincount(inv, weights=n0).astype(np.int64)),
        })
    if t.num_rows == 0:
        return pa.schema([("entity", pa.int64()), ("wins", pa.int64()),
                          ("games", pa.int64()),
                          ("strength", pa.float64())]).empty_table()
    w = t.column("w").to_numpy(zero_copy_only=False)
    l = t.column("l").to_numpy(zero_copy_only=False)
    n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    ents, idx = np.unique(np.concatenate([w, l]), return_inverse=True)
    wi, li = idx[:len(w)], idx[len(w):]
    m = len(ents)
    win_tot = np.bincount(wi, weights=n, minlength=m)
    games = np.bincount(wi, weights=n, minlength=m) + np.bincount(
        li, weights=n, minlength=m)
    p = np.ones(m)
    for _ in range(iters):
        denom = np.zeros(m)
        inv_ps = n / (p[wi] + p[li])
        np.add.at(denom, wi, inv_ps)
        np.add.at(denom, li, inv_ps)
        with np.errstate(divide="ignore", invalid="ignore"):
            p = np.where(denom > 0, win_tot / denom, p)
        p = np.where(p <= 0, 1e-12, p)
        p = p / np.exp(np.mean(np.log(p)))
    return pa.table({
        "entity": pa.array(ents.astype(np.int64)),
        "wins": pa.array(win_tot.astype(np.int64)),
        "games": pa.array(games.astype(np.int64)),
        "strength": pa.array(p, pa.float64()),
    })


# ---------------------------------------------------------------------------
# BFS hop levels — broadcast-frontier rounds
# ---------------------------------------------------------------------------

def bfs_levels(edges_ds, *, src_col: str = "u", dst_col: str = "v",
               source: int, max_hops: int = 6):
    """Hop distance (BFS level) from ``source`` over a DIRECTED edge
    list (symmetrize upstream for undirected graphs).  Returns a
    Dataset ``(node:int64, level:int64)`` with one row per node
    reachable within ``max_hops`` hops, ``source`` included at level 0.

    Scale plan: the edge list stays a Dataset and is scanned once per
    level (``max_hops`` bounded passes); the FRONTIER — the only
    node-sized state — is broadcast once per round via ``ray.put`` and
    probed inside ``map_batches`` with a vectorized ``np.isin``, so no
    shuffle is needed at all.  This is the standard broadcast-frontier
    BFS, valid while the visited set fits driver memory (node ids, not
    rows — ~8 bytes/node).  For graphs whose NODE set outgrows one
    machine, switch to the dataset-state co-group rounds used by
    :func:`pagerank` (frontier as a Dataset, one fused shuffle/round);
    the per-level semantics are identical.

    No analogue in upstream datatest (flat-value validation only);
    §2.I graph-extension family.
    """
    import ray
    import ray.data

    edges = edges_ds.select_columns([src_col, dst_col]).materialize()

    visited = np.array([source], dtype=np.int64)
    frontier = np.array([source], dtype=np.int64)
    nodes = [np.array([source], dtype=np.int64)]
    levels = [np.zeros(1, dtype=np.int64)]

    for level in range(1, max_hops + 1):
        ref = ray.put(np.sort(frontier))

        def probe(t: pa.Table, _ref=ref) -> pa.Table:
            f = ray.get(_ref)
            s = t.column(src_col).to_numpy(zero_copy_only=False)
            hit = np.isin(s.astype(np.int64), f, assume_unique=False)
            d = t.column(dst_col).to_numpy(zero_copy_only=False)[hit]
            return pa.table({"n": pa.array(
                np.unique(d.astype(np.int64)))})

        reached = edges.map_batches(
            probe, batch_format="pyarrow", zero_copy_batch=True)
        # per-block unique above is the combiner; the driver-side
        # np.unique merges the (node-bounded) partials
        parts = [b.column("n").to_numpy(zero_copy_only=False)
                 for b in reached.iter_batches(batch_format="pyarrow")]
        cand = (np.unique(np.concatenate(parts)) if parts
                else np.array([], dtype=np.int64))
        new = cand[~np.isin(cand, visited)]
        if new.size == 0:
            break
        nodes.append(new)
        levels.append(np.full(new.size, level, dtype=np.int64))
        visited = np.concatenate([visited, new])
        visited.sort()
        frontier = new

    return ray.data.from_arrow(pa.table({
        "node": pa.array(np.concatenate(nodes)),
        "level": pa.array(np.concatenate(levels)),
    }))


# ---------------------------------------------------------------------------
# Degree assortativity — exact integer moments over the edge list
# ---------------------------------------------------------------------------

def degree_assortativity(edges_ds, *, src_col: str = "u",
                         dst_col: str = "v", n_buckets: int = 64,
                         broadcast_nodes_max: int = 1 << 22):
    """Pearson correlation of endpoint degrees over an UNDIRECTED
    simple graph given as a distinct edge list (each edge once; the
    function symmetrizes internally, the standard convention for
    undirected assortativity).  Returns a one-row pa.Table
    ``(n_edges_directed:int64, assortativity:float64)``.

    Exactness: degrees are integers, so all five moments (Σx, Σy,
    Σxy, Σx², Σy²) accumulate as int64 partials (bound: deg ≤ 2^21
    and |E| ≤ 2^21 keeps Σx² < 2^63; beyond that raise to Python-int
    partials) and ONE float conversion at the end mirrors the SQL
    expression tree op-for-op — hash-exact against the DuckDB oracle.

    Scale plan: symmetrize → degree = one groupby(node) count → attach
    deg(u), deg(v) → per-batch int64 moment partials → one tiny Sum
    aggregate.  Degree attachment mode-switches like
    :func:`pagerank`: when the node set fits a worker heap
    (``<= 2^22``) the sorted (node, deg) vectors are ``ray.put`` once
    and every edge batch gathers MAP-SIDE (no shuffle at all — this
    replaced two edge-sized lookup_join sorts, measured 20.8 s → half
    at sf0.1); above that, two many-to-one :func:`lookup_join` passes
    (degree table uniquely keyed) keep state distributed.  Moments are
    INTEGER partials, so both modes are bit-identical — partition
    boundaries cannot perturb the result.
    """
    import math

    from ray.data.aggregate import Sum

    from .relational import lookup_join

    def sym(t: pa.Table) -> pa.Table:
        a = t.column(src_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"u": pa.array(np.concatenate([a, b])),
                         "v": pa.array(np.concatenate([b, a]))})

    sym_ds = edges_ds.map_batches(
        sym, batch_format="pyarrow", zero_copy_batch=True).materialize()
    from ray.data.aggregate import Count
    deg = sym_ds.groupby("u").aggregate(Count(alias_name="d"))
    deg = deg.map_batches(
        lambda t: pa.table({"node": t.column("u"),
                            "d": pc.cast(t.column("d"), pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    def moments_xy(x: np.ndarray, y: np.ndarray) -> pa.Table:
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sy": pa.array([int(y.sum())], pa.int64()),
            "sxy": pa.array([int((x * y).sum())], pa.int64()),
            "sxx": pa.array([int((x * x).sum())], pa.int64()),
            "syy": pa.array([int((y * y).sum())], pa.int64()),
        })

    n_nodes = deg.count()
    if n_nodes <= broadcast_nodes_max:
        import ray

        from .base import collect_table

        deg_t = collect_table(deg, ["node", "d"])
        nd = deg_t.column("node").to_numpy(zero_copy_only=False).astype(
            np.int64)
        dv = deg_t.column("d").to_numpy(zero_copy_only=False).astype(
            np.int64)
        order = np.argsort(nd, kind="stable")
        handle = ray.put((nd[order], dv[order]))

        def gather_moments(t: pa.Table) -> pa.Table:
            nodes, degs = ray.get(handle)
            u = t.column("u").to_numpy(zero_copy_only=False).astype(
                np.int64)
            v = t.column("v").to_numpy(zero_copy_only=False).astype(
                np.int64)
            # every endpoint has a degree row by construction
            x = degs[np.searchsorted(nodes, u)]
            y = degs[np.searchsorted(nodes, v)]
            return moments_xy(x, y)

        partial_ds = sym_ds.map_batches(
            gather_moments, batch_format="pyarrow", zero_copy_batch=True)
    else:
        both = lookup_join(
            lookup_join(sym_ds, deg, on="u", right_on="node",
                        right_cols=["d"], n_buckets=n_buckets)
            .map_batches(lambda t: t.rename_columns(
                ["u", "v", "x"]), batch_format="pyarrow"),
            deg, on="v", right_on="node", right_cols=["d"],
            n_buckets=n_buckets)

        def moments(t: pa.Table) -> pa.Table:
            x = t.column("x").to_numpy(zero_copy_only=False).astype(
                np.int64)
            y = t.column("d").to_numpy(zero_copy_only=False).astype(
                np.int64)
            return moments_xy(x, y)

        partial_ds = both.map_batches(moments, batch_format="pyarrow")

    row = partial_ds.aggregate(
        Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
        Sum("sy", alias_name="sy"), Sum("sxy", alias_name="sxy"),
        Sum("sxx", alias_name="sxx"), Sum("syy", alias_name="syy"))
    n = int(row["n"] or 0)
    if n == 0:
        return pa.table({"n_edges_directed": pa.array([], pa.int64()),
                         "assortativity": pa.array([], pa.float64())})
    sx, sy = int(row["sx"]), int(row["sy"])
    sxy, sxx, syy = int(row["sxy"]), int(row["sxx"]), int(row["syy"])
    num = float(n) * float(sxy) - float(sx) * float(sy)
    den = math.sqrt((float(n) * float(sxx) - float(sx) * float(sx))
                    * (float(n) * float(syy) - float(sy) * float(sy)))
    r = num / den if den else float("nan")
    return pa.table({"n_edges_directed": pa.array([n], pa.int64()),
                     "assortativity": pa.array([r], pa.float64())})


# ---------------------------------------------------------------------------
# k-core decomposition (fixed k) — iterative peeling rounds
# ---------------------------------------------------------------------------

def k_core(edges_ds, *, src_col: str = "u", dst_col: str = "v",
           k: int = 2, max_iters: int = 64):
    """Nodes of the k-core (maximal subgraph where every node keeps
    degree ≥ k) of an UNDIRECTED simple graph given as a distinct
    edge list.  Returns a Dataset ``(node:int64, degree:int64)`` —
    each survivor with its degree INSIDE the core.

    Peeling rounds: degrees come from one distributed groupby per
    round; the shrinking ALIVE node set — node-ids only, the same
    bounded driver state as :func:`bfs_levels`'s visited set — is
    broadcast via ``ray.put`` and probed with ``np.isin`` to filter
    the edge Dataset for the next round.  Rounds stop when no node
    falls below k (monotone: the alive set only shrinks, so ≤ |V|
    rounds; in practice a handful).  For node sets beyond driver
    memory, the alive set becomes a Dataset and the filter a
    :func:`..relational.lookup_join` semi-join — same round shape.

    Iterative peeling is not SQL-expressible (aggregates per round);
    rows-only under the driver gate, parity pinned by brute-force
    tests.  §2.I graph-extension family.
    """
    import ray
    import ray.data

    from ray.data.aggregate import Count

    def sym(t: pa.Table) -> pa.Table:
        a = t.column(src_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"u": pa.array(np.concatenate([a, b])),
                         "v": pa.array(np.concatenate([b, a]))})

    edges = edges_ds.map_batches(
        sym, batch_format="pyarrow", zero_copy_batch=True).materialize()

    n_alive = None
    for _ in range(max_iters):
        deg = edges.groupby("u").aggregate(Count(alias_name="d"))
        parts = list(deg.iter_batches(batch_format="pyarrow",
                                      batch_size=65536))
        if not parts:
            return ray.data.from_arrow(pa.table(
                {"node": pa.array([], pa.int64()),
                 "degree": pa.array([], pa.int64())}))
        dt = pa.concat_tables(parts)
        nodes = dt.column("u").to_numpy(zero_copy_only=False)
        degs = dt.column("d").to_numpy(zero_copy_only=False)
        alive = np.sort(nodes[degs >= k].astype(np.int64))
        if alive.size == n_alive:
            return ray.data.from_arrow(pa.table({
                "node": pa.array(nodes.astype(np.int64)),
                "degree": pa.array(degs.astype(np.int64)),
            }))
        n_alive = alive.size
        ref = ray.put(alive)

        def keep(t: pa.Table, _ref=ref) -> pa.Table:
            a = ray.get(_ref)
            u = t.column("u").to_numpy(zero_copy_only=False)
            v = t.column("v").to_numpy(zero_copy_only=False)
            m = np.isin(u, a) & np.isin(v, a)
            return pa.table({"u": pa.array(u[m]), "v": pa.array(v[m])})

        edges = edges.map_batches(
            keep, batch_format="pyarrow",
            zero_copy_batch=True).materialize()

    raise RuntimeError("k_core did not converge; raise max_iters")


def adamic_adar(ds, *, group_col: str, node_col: str):
    """Adamic-Adar link-prediction scores over a bipartite projection:

        score(u, v) = Σ_{g shared by u and v}  1 / ln(deg(g))

    where deg(g) = DISTINCT nodes touching group g — common-neighbor
    counting that discounts promiscuous groups (a part supplied by
    every supplier says little; a part only two suppliers share says a
    lot).  The entity-resolution / recommendation primitive on top of
    the same co-membership structure as :func:`projected_edges`.

    Scale plan mirrors projected_edges: batch-local (group, node)
    dedup, ONE coarse shuffle on hash(group) so deg(g) is exact in its
    bucket, vectorized per-segment pair expansion carrying the group
    weight, then one pair-hash shuffle summing weights per (u, v).
    Groups with deg < 2 emit nothing (ln 1 = 0 has no pairs anyway).
    Output (u, v, n_common, aa) with u < v, aa rounded to 6dp.
    """

    def project(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        x = batch.column(node_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((x, g))
        g, x = g[order], x[order]
        keep = _run_dedup(np.stack([g, x]))
        g, x = g[keep], x[keep]
        return pa.table({"coarse": _coarse(g), "g": pa.array(g),
                         "x": pa.array(x)})

    def expand(group: pa.Table) -> pa.Table:
        g = group.column("g").to_numpy(zero_copy_only=False)
        x = group.column("x").to_numpy(zero_copy_only=False)
        order = np.lexsort((x, g))
        g, x = g[order], x[order]
        keep = _run_dedup(np.stack([g, x]))
        g, x = g[keep], x[keep]
        d = _segments(g)
        w_seg = np.zeros(len(d))
        big = d >= 2
        w_seg[big] = 1.0 / np.log(d[big].astype(np.float64))
        li = np.arange(len(g), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(d[:-1])]), d)
        reps = np.repeat(d, d) - 1 - li
        ii = np.repeat(np.arange(len(g), dtype=np.int64), reps)
        jj = ii + 1 + _concat_ranges_np(reps)
        u, v = x[ii], x[jj]
        w = np.repeat(np.repeat(w_seg, d), reps)
        C1 = np.uint64(0x9E3779B97F4A7C15)
        C2 = np.uint64(0xC2B2AE3D27D4EB4F)
        ph = ((u.astype(np.uint64) * C1) ^ (v.astype(np.uint64) * C2))
        return pa.table({
            "pcoarse": pa.array((ph % np.uint64(_N_COARSE)).astype(
                np.int64)),
            "u": pa.array(u), "v": pa.array(v), "w": pa.array(w),
        })

    def reduce_pairs(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        w = group.column("w").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        u, v, w = u[order], v[order], w[order]
        new = np.ones(len(u), dtype=bool)
        if len(u) > 1:
            new[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
        seg = np.cumsum(new) - 1
        first = np.flatnonzero(new)
        aa = np.bincount(seg, weights=w)
        n_common = np.bincount(seg).astype(np.int64)
        return pa.table({
            "u": pa.array(u[first]), "v": pa.array(v[first]),
            "n_common": pa.array(n_common),
            "aa": pa.array(np.round(aa, 6)),
        })

    return (
        ds.select_columns([group_col, node_col])
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse").map_groups(expand, batch_format="pyarrow")
        .groupby("pcoarse").map_groups(reduce_pairs, batch_format="pyarrow")
    )


def degree_gini(pairs_ds, *, node_col: str, other_col: str):
    """Gini concentration of node degree in a bipartite edge list: how
    unequally is fan-out (e.g. distinct parts per supplier) spread
    across nodes?  Gini near 0 = balanced supply graph; high Gini =
    hub suppliers dominating -- the one-number skew warning before a
    per-key repartition.  Uses the rank-weighted formula
    2 sum(i d_i)/(n sum d) - (n+1)/n over EXACT integer degrees via
    the closed-form per-tie-block position sums.

    One distinct-pair groupby + one O(distinct degrees) census.
    Output one row (n_nodes int64, gini round-6).
    """
    from ray.data.aggregate import Count

    deg = pairs_ds.groupby(node_col).aggregate(
        Count(alias_name="d"))
    dvc = deg.groupby("d").aggregate(Count(alias_name="c"))

    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("n_nodes", pa.int64()),
                            ("gini", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        t = t.sort_by([("d", "ascending")])
        d = t.column("d").to_numpy(zero_copy_only=False).astype(
            np.int64)
        c = t.column("c").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = int(c.sum())
        s = int(np.sum(d * c))
        hi = np.cumsum(c)
        lo = hi - c
        # sum of positions within each tie block: c*lo + c(c+1)/2
        pos_sum = c * lo + c * (c + 1) // 2
        rw = int(np.sum(d * pos_sum))
        gini = (round(2.0 * rw / (float(n) * s)
                      - (n + 1.0) / n, 6) if n > 0 and s > 0 else None)
        return pa.table({"n_nodes": pa.array([n], pa.int64()),
                         "gini": pa.array([gini], pa.float64())})

    return dvc.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)
