"""Driver-contract queries, batch 41 (see oracle.py for the contract):
per-user record-event counts (running-maximum breaks — oracle-paired)
and Bradley-Terry supplier strength fitted from within-order
ship-first outcomes (rows-only by design: the MM fit is iterative;
parity pinned in tests).  Merged into ``oracle.queries()`` /
``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_record_counts_user(sf_dir: str):
    """Per-user running-max record counts over (ts, event_id) order
    (stages/winfunc.py :: record_counts)."""
    from ..stages.winfunc import record_counts

    return _materialize(record_counts(
        _read(sf_dir, "events", ["user_id", "ts", "value", "event_id"]),
        by="user_id", ts_col="ts", value_col="value",
        id_col="event_id"))


SQL_RECORD_COUNTS_USER = """
WITH f AS (
  SELECT user_id, event_id, ts, value FROM events
  WHERE user_id IS NOT NULL AND event_id IS NOT NULL
    AND ts IS NOT NULL AND value IS NOT NULL),
r AS (
  SELECT user_id,
         value > max(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS rec
  FROM f)
SELECT user_id, CAST(count(*) AS BIGINT) AS n,
       CAST(coalesce(sum(CAST(rec AS BIGINT)), 0) AS BIGINT)
         AS n_records
FROM r GROUP BY 1
"""


def q_bradley_terry_suppliers(sf_dir: str):
    """Bradley-Terry supplier strengths: within every multi-supplier
    order, the supplier whose first lineitem shipped EARLIER beats the
    later one (ties skipped); pair outcomes aggregate into a win
    matrix and the MM iteration fits strengths (stages/graph.py ::
    bradley_terry).  rows-only: iterative fit."""
    from ..stages.graph import bradley_terry
    from ..functions.aggregates import hash64
    from ray.data.aggregate import Min

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate"])

    def to_us(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.and_(pc.is_valid(t.column("l_orderkey")),
                             pc.is_valid(t.column("l_suppkey"))),
                     pc.is_valid(t.column("l_shipdate")))
        t = t.filter(ok)
        return pa.table({
            "o": t.column("l_orderkey"),
            "s": t.column("l_suppkey"),
            "ship": pc.cast(t.column("l_shipdate"), pa.int64()),
        })

    firsts = (li.map_batches(to_us, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby(["o", "s"]).aggregate(Min("ship",
                                                 alias_name="ship")))

    def order_pairs(t: pa.Table) -> pa.Table:
        o = t.column("o").to_numpy(zero_copy_only=False)
        s = t.column("s").to_numpy(zero_copy_only=False)
        ship = t.column("ship").to_numpy(zero_copy_only=False)
        order = np.lexsort((ship, s, o))
        o, s, ship = o[order], s[order], ship[order]
        n = len(o)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = o[1:] != o[:-1]
        seg_id = np.cumsum(new) - 1
        seg_len = np.bincount(seg_id) if n else np.array([], np.int64)
        max_len = int(seg_len.max()) if len(seg_len) else 0
        win, lose = [], []
        # vectorized all-pairs per order via the d-offset diagonals
        # (orders are tiny groups; max_len is a small constant)
        for d in range(1, max_len):
            i = np.arange(n - d)
            same = seg_id[i] == seg_id[i + d]
            ii, jj = i[same], i[same] + d
            a_first = ship[ii] < ship[jj]
            b_first = ship[jj] < ship[ii]
            win.append(np.concatenate([s[ii[a_first]], s[jj[b_first]]]))
            lose.append(np.concatenate([s[jj[a_first]], s[ii[b_first]]]))
        w = (np.concatenate(win) if win
             else np.array([], dtype=np.int64))
        lo = (np.concatenate(lose) if lose
              else np.array([], dtype=np.int64))
        return pa.table({
            "winner": pa.array(w.astype(np.int64)),
            "loser": pa.array(lo.astype(np.int64)),
        })

    # group each order's per-supplier firsts into one kernel via a
    # coarse bucket on the orderkey (orders are tiny groups)
    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("coarse", pa.array(
            (hash64(t.column("o")) % np.uint64(64)).astype(np.int64)))

    pairs = (firsts.map_batches(add_bucket, batch_format="pyarrow",
                                zero_copy_batch=True)
             .groupby("coarse")
             .map_groups(order_pairs, batch_format="pyarrow"))
    return bradley_terry(pairs, winner_col="winner", loser_col="loser",
                         iters=30)


QUERIES41: Dict[str, Callable] = {
    "record_counts_user": q_record_counts_user,
    "bradley_terry_suppliers": q_bradley_terry_suppliers,
}

SQL41: Dict[str, str] = {
    "record_counts_user": SQL_RECORD_COUNTS_USER,
}
