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

__all__ = ["apportion_largest_remainder", "dhondt_seats"]

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
