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
    bradley_terry).  Oracle-paired: the fixed 30 MM rounds unroll
    into MATERIALIZED CTE blocks (SQL_BRADLEY_TERRY_SUPPLIERS)."""
    from ..stages.graph import bradley_terry
    from ..functions.aggregates import hash64

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

    def first_partial(t: pa.Table) -> pa.Table:
        # per-batch (o, s) -> min(ship) partial + the coarse bucket on
        # o the pair expansion needs anyway: the global min merges
        # inside the order_pairs bucket kernel, so the full 2-key sort
        # groupby this pipeline used to pay disappears (measured
        # 6.6 s -> sub-second at sf0.1)
        o = t.column("o").to_numpy(zero_copy_only=False)
        s = t.column("s").to_numpy(zero_copy_only=False)
        ship = t.column("ship").to_numpy(zero_copy_only=False)
        order = np.lexsort((ship, s, o))
        o, s, ship = o[order], s[order], ship[order]
        new = np.ones(len(o), dtype=bool)
        if len(o) > 1:
            new[1:] = (o[1:] != o[:-1]) | (s[1:] != s[:-1])
        o, s, ship = o[new], s[new], ship[new]
        return pa.table({
            "o": pa.array(o), "s": pa.array(s), "ship": pa.array(ship),
            "coarse": pa.array((hash64(pa.array(o)) %
                                np.uint64(64)).astype(np.int64)),
        })

    firsts = li.map_batches(to_us, batch_format="pyarrow",
                            zero_copy_batch=True).map_batches(
        first_partial, batch_format="pyarrow", zero_copy_batch=True)

    def order_pairs(t: pa.Table) -> pa.Table:
        o = t.column("o").to_numpy(zero_copy_only=False)
        s = t.column("s").to_numpy(zero_copy_only=False)
        ship = t.column("ship").to_numpy(zero_copy_only=False)
        order = np.lexsort((ship, s, o))
        o, s, ship = o[order], s[order], ship[order]
        # merge cross-batch (o, s) partials: sorted (o, s, ship), so
        # keep-first per (o, s) IS the min-ship row
        dup = np.zeros(len(o), dtype=bool)
        if len(o) > 1:
            dup[1:] = (o[1:] == o[:-1]) & (s[1:] == s[:-1])
        keep_m = ~dup
        o, s, ship = o[keep_m], s[keep_m], ship[keep_m]
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

    # all rows of an order co-locate via the coarse bucket, so the
    # in-kernel partial merge + pair expansion are globally exact
    pairs = firsts.groupby("coarse").map_groups(
        order_pairs, batch_format="pyarrow")
    return bradley_terry(pairs, winner_col="winner", loser_col="loser",
                         iters=30)


def _bradley_terry_sql(iters: int = 30) -> str:
    """Unrolled-MM DuckDB mirror of ``q_bradley_terry_suppliers``:
    the pair/win matrix is plain SQL; each of the fixed ``iters`` MM
    rounds is one (inverse-sum, denominator, update, geomean-renorm)
    MATERIALIZED CTE block.  Measured agreement with the numpy MM
    path: ~4e-16."""
    ctes = ["""firsts AS MATERIALIZED (
  SELECT l_orderkey AS o, l_suppkey AS s, min(l_shipdate) AS ship
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_suppkey IS NOT NULL
    AND l_shipdate IS NOT NULL
  GROUP BY 1, 2)""",
        """wins AS MATERIALIZED (
  SELECT a.s AS w, b.s AS l, CAST(count(*) AS DOUBLE) AS n
  FROM firsts a JOIN firsts b
    ON a.o = b.o AND a.s <> b.s AND a.ship < b.ship
  GROUP BY 1, 2)""",
        """ent AS MATERIALIZED (
  SELECT DISTINCT e FROM (SELECT w AS e FROM wins
                          UNION SELECT l FROM wins))""",
        """tot AS MATERIALIZED (
  SELECT ent.e,
         COALESCE(ww.n, 0.0) AS wins,
         COALESCE(ww.n, 0.0) + COALESCE(ll.n, 0.0) AS games
  FROM ent
  LEFT JOIN (SELECT w, sum(n) AS n FROM wins GROUP BY 1) ww
    ON ww.w = ent.e
  LEFT JOIN (SELECT l, sum(n) AS n FROM wins GROUP BY 1) ll
    ON ll.l = ent.e)""",
        "p_0 AS MATERIALIZED (SELECT e, 1.0 AS p FROM ent)"]
    for k in range(1, iters + 1):
        pv = f"p_{k-1}"
        ctes += [
            f"""inv_{k} AS MATERIALIZED (
  SELECT ws.w, ws.l, ws.n / (pw.p + pl.p) AS inv
  FROM wins ws JOIN {pv} pw ON pw.e = ws.w
  JOIN {pv} pl ON pl.e = ws.l)""",
            f"""den_{k} AS MATERIALIZED (
  SELECT e, sum(inv) AS d FROM (
    SELECT w AS e, inv FROM inv_{k}
    UNION ALL SELECT l AS e, inv FROM inv_{k}) GROUP BY e)""",
            f"""praw_{k} AS MATERIALIZED (
  SELECT t.e,
         CASE WHEN COALESCE(d.d, 0) > 0
              THEN CASE WHEN t.wins / d.d <= 0 THEN 1e-12
                        ELSE t.wins / d.d END
              ELSE CASE WHEN pp.p <= 0 THEN 1e-12 ELSE pp.p END
         END AS p
  FROM tot t LEFT JOIN den_{k} d ON d.e = t.e
  JOIN {pv} pp ON pp.e = t.e)""",
            f"""p_{k} AS MATERIALIZED (
  SELECT e, p / (SELECT exp(avg(ln(p))) FROM praw_{k}) AS p
  FROM praw_{k})""",
        ]
    return "WITH " + ",\n".join(ctes) + f"""
SELECT t.e AS entity, CAST(t.wins AS BIGINT) AS wins,
       CAST(t.games AS BIGINT) AS games, p.p AS strength
FROM tot t JOIN p_{iters} p ON p.e = t.e ORDER BY t.e"""


SQL_BRADLEY_TERRY_SUPPLIERS = _bradley_terry_sql(30)


QUERIES41: Dict[str, Callable] = {
    "record_counts_user": q_record_counts_user,
    "bradley_terry_suppliers": q_bradley_terry_suppliers,
}

SQL41: Dict[str, str] = {
    "record_counts_user": SQL_RECORD_COUNTS_USER,
    "bradley_terry_suppliers": SQL_BRADLEY_TERRY_SUPPLIERS,
}
