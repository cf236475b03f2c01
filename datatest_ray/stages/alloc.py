"""Proportional-allocation operators: largest-remainder (Hamilton)
apportionment and D'Hondt highest-averages seat allocation.

The pipeline shape is the classic "heavy aggregate, tiny finish":
the per-key weights come out of ONE distributed groupby (the only
pass over the data); the allocation itself runs over the aggregated
key vector — bounded by the number of DISTINCT keys, not rows — on
the driver, like every other small-result finish in this engine.

Exactness: both methods are pure integer arithmetic end to end —
largest-remainder uses ``(w*S) // W`` floors plus exact ``% W``
remainders; D'Hondt compares quotients ``w/d`` as the scaled integers
``w * lcm(1..S) // d`` (exact because ``d | lcm``) — so results are
hash-identical to the DuckDB oracle with no float anywhere.  Overflow
bound for the D'Hondt scaling: ``w * lcm(1..20) = w * 232792560`` must
stay below 2^63, i.e. w < 4e10 — raise to Python ints past that.

No analogue in upstream datatest (flat-value validation only); these
are §2.H grouped-aggregate extensions (quota allocation shows up in
stratified sampling budgets and shard balancing).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["borda_copeland",
           "apportion_largest_remainder", "dhondt_seats",
           "consistent_hash_shards"]

_LCM20 = 232792560  # lcm(1..20): exact scaled quotients for seats <= 20


def _weights(ds, key_col: str, seats: int):
    """One distributed groupby(key).count(); returns (keys, w) sorted
    by key — the only row-scale pass."""
    from ray.data.aggregate import Count

    agg = ds.groupby(key_col).aggregate(Count(alias_name="w"))
    t = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=65536))) \
        if agg.count() else pa.table(
            {key_col: pa.array([], pa.int64()),
             "w": pa.array([], pa.int64())})
    k = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
    w = t.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(k, kind="stable")
    return k[order], w[order]


def apportion_largest_remainder(ds, *, key_col: str, seats: int):
    """Hamilton/largest-remainder apportionment of ``seats`` across the
    distinct values of ``key_col``, proportional to row counts.

    floor_i = (w_i * seats) // W; the ``seats - Σfloor`` leftovers go
    to the largest exact remainders ``(w_i * seats) % W``, ties broken
    by key ascending.  Returns ``(key, w, seats)`` for keys with w>0.
    """
    k, w = _weights(ds, key_col, seats)
    if len(k) == 0:
        return pa.table({key_col: pa.array([], pa.int64()),
                         "w": pa.array([], pa.int64()),
                         "seats": pa.array([], pa.int64())})
    W = int(w.sum())
    prod = w * np.int64(seats)
    fl = prod // W
    rem = prod % W
    extra = seats - int(fl.sum())
    # rank by remainder desc, key asc — exact integers, fully ordered
    order = np.lexsort((k, -rem))
    bonus = np.zeros(len(k), dtype=np.int64)
    bonus[order[:extra]] = 1
    return pa.table({key_col: pa.array(k), "w": pa.array(w),
                     "seats": pa.array(fl + bonus)})


def dhondt_seats(ds, *, key_col: str, seats: int):
    """D'Hondt (Jefferson) highest-averages allocation: the ``seats``
    largest quotients ``w_i / d`` over divisors ``d = 1..seats`` each
    award one seat to key i.  Quotients compare as the exact scaled
    integers ``w_i * lcm(1..seats) // d``; cross-key exact ties break
    by key ascending (then divisor ascending, which never crosses
    keys' seat COUNTS).  Requires ``seats <= 20`` (the lcm bound).
    Returns ``(key, w, seats)`` for keys that won at least one seat.
    """
    if seats > 20:
        raise ValueError("dhondt_seats supports seats <= 20 "
                         "(lcm-scaled exact quotients)")
    k, w = _weights(ds, key_col, seats)
    if len(k) == 0:
        return pa.table({key_col: pa.array([], pa.int64()),
                         "w": pa.array([], pa.int64()),
                         "seats": pa.array([], pa.int64())})
    d = np.arange(1, seats + 1, dtype=np.int64)
    q = (w[:, None] * np.int64(_LCM20)) // d[None, :]  # (K, S) exact
    kk = np.broadcast_to(k[:, None], q.shape).ravel()
    dd = np.broadcast_to(d[None, :], q.shape).ravel()
    qq = q.ravel()
    order = np.lexsort((dd, kk, -qq))[:seats]
    won_k, won_n = np.unique(kk[order], return_counts=True)
    sel = np.isin(k, won_k)
    n_by_key = np.zeros(len(k), dtype=np.int64)
    n_by_key[np.searchsorted(k, won_k)] = won_n
    return pa.table({key_col: pa.array(k[sel]), "w": pa.array(w[sel]),
                     "seats": pa.array(n_by_key[sel])})


def _ring(n_shards: int, n_vnodes: int):
    """Sorted (pos:uint64, shard:int64) md5 ring — driver-side, tiny."""
    import hashlib

    pos, shard = [], []
    for s in range(n_shards):
        for v in range(n_vnodes):
            h = hashlib.md5(f"s{s}:v{v}".encode()).hexdigest()
            pos.append(int(h[:16], 16))
            shard.append(s)
    pos = np.array(pos, dtype=np.uint64)
    shard = np.array(shard, dtype=np.int64)
    order = np.lexsort((shard, pos))  # pos asc, shard asc on exact ties
    return pos[order], shard[order]


def consistent_hash_shards(ds, *, id_col: str, n_shards_a: int = 4,
                           n_shards_b: int = 5, n_vnodes: int = 8):
    """Consistent-hashing shard assignment and its minimal-disruption
    audit: every row is placed on an md5 ring (first vnode clockwise
    of ``md5(id)``; ``n_vnodes`` virtual nodes per shard) under TWO
    ring sizes, and the output reports, per ring-A shard, how many
    rows it holds and how many of them MOVE when a shard is added
    (``n_shards_a`` → ``n_shards_b``) — the property that makes
    consistent hashing the resharding scheme for 100 TB stores
    (≈ 1/n_shards_b of rows move vs ~all under mod-N).

    Rings are built once on the driver (``shards × vnodes`` entries)
    and captured in the batch closure; per batch the two assignments
    are ONE ``np.searchsorted`` each (binary search over the sorted
    vnode positions, wrap at the top), so the only per-row Python is
    the md5 of the id — the same cost profile as the text
    fingerprints.  One tiny groupby(shard) finishes.

    Returns ``(shard:int64, n_docs:int64, n_moved:int64)``, one row
    per ring-A shard that holds at least one row — hash-exact vs the
    SQL mirror (md5 positions are integers end to end).
    """
    import hashlib

    from ray.data.aggregate import Count, Sum

    pa_pos, pa_shard = _ring(n_shards_a, n_vnodes)
    pb_pos, pb_shard = _ring(n_shards_b, n_vnodes)

    def assign(pos: np.ndarray, ring_pos, ring_shard) -> np.ndarray:
        idx = np.searchsorted(ring_pos, pos, side="left")
        idx[idx == len(ring_pos)] = 0  # wrap past the top of the ring
        return ring_shard[idx]

    def place(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        pos = np.array([int(hashlib.md5(str(i).encode())
                            .hexdigest()[:16], 16) for i in ids],
                       dtype=np.uint64)
        sa = assign(pos, pa_pos, pa_shard)
        sb = assign(pos, pb_pos, pb_shard)
        return pa.table({"shard": pa.array(sa),
                         "moved": pa.array((sa != sb).astype(np.int64))})

    placed = ds.select_columns([id_col]).map_batches(
        place, batch_format="pyarrow", zero_copy_batch=True)
    agg = placed.groupby("shard").aggregate(
        Count(alias_name="n_docs"), Sum("moved", alias_name="n_moved"))
    return agg.map_batches(
        lambda t: pa.table({
            "shard": pc.cast(t.column("shard"), pa.int64()),
            "n_docs": pc.cast(t.column("n_docs"), pa.int64()),
            "n_moved": pc.cast(t.column("n_moved"), pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)


def borda_copeland(scores_ds, *, voter_col: str, cand_col: str,
                   score_col: str):
    """Borda count and Copeland pairwise score over an aggregated
    (voter, candidate, score) table: every voter ranks the FULL
    candidate set by score descending (absent pairs score 0; ties
    break by ascending candidate), Borda awards (n_cands - rank)
    points, and Copeland counts strict-majority pairwise victories
    (score = #beaten - #beaten_by) -- the two classical rank-fusion
    voting rules, robust to one voter's scale.

    Single-partition finalize over the tiny aggregate (voters x
    candidates); all integer arithmetic.  Output: (cand_col, borda
    int64, copeland int64), every candidate.
    """
    def finalize(t: pa.Table) -> pa.Table:
        schema = pa.schema([(cand_col, pa.string()),
                            ("borda", pa.int64()),
                            ("copeland", pa.int64())])
        if t.num_rows == 0:
            return schema.empty_table()
        voters = sorted(set(t.column(voter_col).to_pylist()))
        cands = sorted(set(t.column(cand_col).to_pylist()))
        vi = {v: i for i, v in enumerate(voters)}
        ci = {c: i for i, c in enumerate(cands)}
        nv, nc = len(voters), len(cands)
        mat = np.zeros((nv, nc), dtype=np.int64)   # zero-filled ballots
        for v, c, s in zip(t.column(voter_col).to_pylist(),
                           t.column(cand_col).to_pylist(),
                           t.column(score_col).to_pylist()):
            mat[vi[v], ci[c]] = s
        borda = np.zeros(nc, dtype=np.int64)
        for v in range(nv):
            # rank desc by score, ties to the lower candidate index
            order = np.lexsort((np.arange(nc), -mat[v]))
            pts = np.empty(nc, dtype=np.int64)
            pts[order] = nc - 1 - np.arange(nc)
            borda += pts
        # pairwise: a beats b when a strict majority of voters score
        # a above b
        gt = (mat[:, :, None] > mat[:, None, :]).sum(axis=0)
        beats = gt > nv / 2.0
        copeland = beats.sum(axis=1).astype(np.int64) \
            - beats.sum(axis=0).astype(np.int64)
        return pa.table({
            cand_col: pa.array(cands, pa.string()),
            "borda": pa.array(borda),
            "copeland": pa.array(copeland),
        })

    return scores_ds.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)
