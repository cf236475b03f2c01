"""Driver-contract queries, batch 27 (see oracle.py for the contract):
sequential testing and population estimation — Wald's SPRT
log-likelihood ratio over the event conversion stream (the
stop-early/keep-collecting decision for an ongoing data collection)
and the Chapman capture-recapture estimator of a population's true
distinct count from two overlapping samples (how many distinct
(part, supplier) combinations EXIST given two partial scans — the
coverage estimator run before declaring a crawl complete).
Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

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


# ---------------------------------------------------------------------------
# Wald SPRT over the view->purchase conversion stream
# ---------------------------------------------------------------------------

_P0, _P1 = 0.10, 0.15  # H0 / H1 conversion rates
_LN_A = float(np.log(19.0))  # alpha = beta = 0.05 boundaries


def q_sprt_events(sf_dir: str):
    """Wald sequential probability ratio test: among view/purchase
    events, is the purchase rate p1=0.15 (accept H1) or p0=0.10
    (accept H0)?  LLR = k·ln(p1/p0) + (n−k)·ln((1−p1)/(1−p0)) with
    ±ln(19) boundaries (alpha=beta=0.05).  One filtered count pass —
    two per-batch counters, no shuffle."""
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["event_type"])

    def counts(t: pa.Table) -> pa.Table:
        g = t.column("event_type")
        views = int(pc.sum(pc.cast(pc.fill_null(
            pc.equal(g, "view"), False), pa.int64())).as_py() or 0)
        buys = int(pc.sum(pc.cast(pc.fill_null(
            pc.equal(g, "purchase"), False), pa.int64())).as_py() or 0)
        return pa.table({"n": pa.array([views + buys], pa.int64()),
                         "k": pa.array([buys], pa.int64())})

    row = ev.map_batches(counts, batch_format="pyarrow",
                         zero_copy_batch=True).aggregate(
        Sum("n", alias_name="n"), Sum("k", alias_name="k"))
    n, k = int(row["n"] or 0), int(row["k"] or 0)
    llr = k * np.log(_P1 / _P0) + (n - k) * np.log((1 - _P1) / (1 - _P0))
    decision = ("accept_h1" if llr >= _LN_A
                else "accept_h0" if llr <= -_LN_A else "continue")
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "k": pa.array([k], pa.int64()),
        "llr": pa.array([round(float(llr), 6)], pa.float64()),
        "decision": pa.array([decision], pa.string()),
    })


SQL_SPRT_EVENTS = """
WITH c AS (
  SELECT count(*) FILTER (event_type IN ('view', 'purchase')) AS n,
         count(*) FILTER (event_type = 'purchase') AS k
  FROM events)
SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
  round(k * ln(0.15/0.10) + (n - k) * ln(0.85/0.90), 6) AS llr,
  CASE WHEN k * ln(0.15/0.10) + (n - k) * ln(0.85/0.90) >= ln(19.0)
         THEN 'accept_h1'
       WHEN k * ln(0.15/0.10) + (n - k) * ln(0.85/0.90) <= -ln(19.0)
         THEN 'accept_h0'
       ELSE 'continue' END AS decision
FROM c
"""


# ---------------------------------------------------------------------------
# Chapman capture-recapture population estimate
# ---------------------------------------------------------------------------


def q_capture_recapture_ps(sf_dir: str):
    """Chapman estimator N̂ = (nA+1)(nB+1)/(nAB+1) − 1 of the distinct
    (partkey, suppkey) population from two overlapping deterministic
    samples (lineitems with orderkey % 2 == 0 vs % 3 == 0) — the
    crawl-coverage estimator.  One shuffle on the pair key with
    per-batch distinct flag partials (Max-combine), then a tiny flag
    count."""
    from ray.data.aggregate import Max, Sum

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey"])

    def flags(t: pa.Table) -> pa.Table:
        t = t.drop_null()
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        in_a, in_b = ok % 2 == 0, ok % 3 == 0
        keep = in_a | in_b
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False)[keep]
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False)[keep]
        g = pa.table({
            "p_s": pa.array(pk * 1_000_000 + sk),
            "a": pa.array(in_a[keep].astype(np.int64)),
            "b": pa.array(in_b[keep].astype(np.int64)),
        })
        # per-batch distinct combiner: one row per key with OR'd flags
        agg = g.group_by("p_s").aggregate([("a", "max"), ("b", "max")])
        return pa.table({"p_s": agg.column("p_s"),
                         "a": agg.column("a_max"),
                         "b": agg.column("b_max")})

    per_key = li.map_batches(
        flags, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("p_s").aggregate(Max("a", alias_name="a"),
                               Max("b", alias_name="b"))

    def tally(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table({
            "na": pa.array([int((a == 1).sum())], pa.int64()),
            "nb": pa.array([int((b == 1).sum())], pa.int64()),
            "nab": pa.array([int(((a == 1) & (b == 1)).sum())],
                            pa.int64()),
        })

    row = per_key.map_batches(
        tally, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(Sum("na", alias_name="na"), Sum("nb", alias_name="nb"),
                Sum("nab", alias_name="nab"))
    na, nb, nab = (int(row["na"] or 0), int(row["nb"] or 0),
                   int(row["nab"] or 0))
    chapman = (na + 1.0) * (nb + 1.0) / (nab + 1.0) - 1.0
    return pa.table({
        "na": pa.array([na], pa.int64()),
        "nb": pa.array([nb], pa.int64()),
        "nab": pa.array([nab], pa.int64()),
        "chapman": pa.array([round(chapman, 4)], pa.float64()),
    })


SQL_CAPTURE_RECAPTURE_PS = """
WITH rows_ AS (
  SELECT l_partkey * 1000000 + l_suppkey AS p_s,
         CAST(l_orderkey % 2 = 0 AS INT) AS a,
         CAST(l_orderkey % 3 = 0 AS INT) AS b
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
    AND l_suppkey IS NOT NULL
    AND (l_orderkey % 2 = 0 OR l_orderkey % 3 = 0)),
per_key AS (
  SELECT p_s, max(a) AS a, max(b) AS b FROM rows_ GROUP BY p_s),
c AS (
  SELECT count(*) FILTER (a = 1) AS na,
         count(*) FILTER (b = 1) AS nb,
         count(*) FILTER (a = 1 AND b = 1) AS nab
  FROM per_key)
SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
       CAST(nab AS BIGINT) AS nab,
       round((na + 1.0) * (nb + 1.0) / (nab + 1.0) - 1.0, 4) AS chapman
FROM c
"""


QUERIES27: Dict[str, Callable] = {
    "sprt_events": q_sprt_events,
    "capture_recapture_ps": q_capture_recapture_ps,
}

SQL27: Dict[str, str] = {
    "sprt_events": SQL_SPRT_EVENTS,
    "capture_recapture_ps": SQL_CAPTURE_RECAPTURE_PS,
}
