"""Driver-contract queries, batch 8 (see oracle.py for the contract):
grouped Spearman rank correlation, chi-square adjusted residuals,
exponential-fit KS on inter-arrival gaps, trailing-digit (cents)
uniformity audit, winnowing substring near-dup.  Merged into
``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict

import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


# ---------------------------------------------------------------------------
# Grouped Spearman rank correlation (average-rank ties)
# ---------------------------------------------------------------------------


def q_spearman_qty_disc(sf_dir: str):
    """Spearman rank correlation of quantity vs discount per return
    flag — the outlier-robust monotone-association screen.  Exact
    average-rank tie handling from the joint contingency counts alone
    (O(distinct cells) shuffle, never rows)."""
    from ..stages.robust import spearman_grouped

    return _materialize(spearman_grouped(
        _read(sf_dir, "lineitem",
              ["l_returnflag", "l_quantity", "l_discount"]),
        by="l_returnflag", x_col="l_quantity", y_col="l_discount"))


SQL_SPEARMAN_QTY_DISC = """
WITH base AS (
  SELECT l_returnflag AS l_returnflag, l_quantity AS x, l_discount AS y
  FROM lineitem
  WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
    AND l_discount IS NOT NULL
),
rx AS (
  SELECT l_returnflag, x, avg(rn) AS arx FROM (
    SELECT l_returnflag, x,
           row_number() OVER (PARTITION BY l_returnflag ORDER BY x) AS rn
    FROM base) GROUP BY l_returnflag, x
),
ry AS (
  SELECT l_returnflag, y, avg(rn) AS ary FROM (
    SELECT l_returnflag, y,
           row_number() OVER (PARTITION BY l_returnflag ORDER BY y) AS rn
    FROM base) GROUP BY l_returnflag, y
)
SELECT l_returnflag, count(*) AS n, corr(arx, ary) AS rho
FROM base JOIN rx USING (l_returnflag, x) JOIN ry USING (l_returnflag, y)
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Chi-square adjusted standardized residuals per contingency cell
# ---------------------------------------------------------------------------


def q_stdres_orders(sf_dir: str):
    """Adjusted standardized residuals of the status × priority
    contingency table — per-cell attribution of association (|r|>2 ≈
    a cell off at 5%), where the chi-square screen only reports the
    aggregate."""
    from ..stages.profile import adjusted_residuals

    return _materialize(adjusted_residuals(
        _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"]),
        "o_orderstatus", "o_orderpriority"))


SQL_STDRES_ORDERS = """
WITH c AS (
  SELECT o_orderstatus AS a, o_orderpriority AS b, count(*) AS n
  FROM orders
  WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
  GROUP BY 1, 2
),
t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM c),
r AS (SELECT a, CAST(sum(n) AS DOUBLE) AS rn FROM c GROUP BY a),
k AS (SELECT b, CAST(sum(n) AS DOUBLE) AS cn FROM c GROUP BY b)
SELECT a, b, n,
       rn * cn / tot AS expected,
       (n - rn * cn / tot)
         / sqrt(rn * cn / tot * (1.0 - rn / tot) * (1.0 - cn / tot))
         AS stdres
FROM c CROSS JOIN t JOIN r USING (a) JOIN k USING (b)
"""


# ---------------------------------------------------------------------------
# Exponential-fit one-sample KS on pooled inter-arrival gaps
# ---------------------------------------------------------------------------


def q_expfit_ks_gaps(sf_dir: str):
    """Poisson-process sanity check: MLE-fit Exp(λ=1/mean) to pooled
    per-user inter-event gaps and report the one-sample KS distance —
    large KS means bursty/periodic arrivals where exponential-based
    rate alarms misfire.  Exact integer µs sums; the ECDF needs only
    cumulative counts at distinct gap values."""
    from ..stages.temporal import expfit_ks

    return _materialize(expfit_ks(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"]),
        "ts", by="user_id", id_col="event_id"))


SQL_EXPFIT_KS_GAPS = """
WITH g AS (
  SELECT epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
gg AS (SELECT gap FROM g WHERE gap IS NOT NULL),
s AS (SELECT gap, count(*) AS c FROM gg GROUP BY gap),
p AS (
  SELECT gap, c, sum(c) OVER (ORDER BY gap) AS cum,
         (SELECT count(*) FROM gg) AS n,
         (SELECT CAST(sum(gap) AS BIGINT) FROM gg) AS tot
  FROM s
),
d AS (
  SELECT n, tot,
         greatest(cum * 1.0 / n
                    - (1.0 - exp(-(gap * 1.0) / (tot * 1.0 / n))),
                  (1.0 - exp(-(gap * 1.0) / (tot * 1.0 / n)))
                    - (cum - c) * 1.0 / n) AS dev
  FROM p
)
SELECT CAST(max(n) AS BIGINT) AS n,
       (max(tot) * 1.0 / max(n)) / 1e6 AS mean_gap_s,
       max(dev) AS ks
FROM d
"""


# ---------------------------------------------------------------------------
# Trailing-digit (cents) uniformity audit
# ---------------------------------------------------------------------------


def q_cents_uniformity_price(sf_dir: str):
    """Nigrini number-duplication screen: the last two digits of
    organic amounts should be near-uniform (unlike the Benford-shaped
    leading digits); spikes at .00/.50/.99 reveal manual entry."""
    from ..stages.profile import trailing_digit_uniformity

    return _materialize(trailing_digit_uniformity(
        _read(sf_dir, "lineitem", ["l_extendedprice"]),
        "l_extendedprice"))


SQL_CENTS_UNIFORMITY_PRICE = """
WITH c AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) % 100 AS cents,
         count(*) AS n
  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1
),
t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM c)
SELECT cents, n, n / tot AS share,
       (n - tot / 100.0) * (n - tot / 100.0) / (tot / 100.0) AS cell_chi2
FROM c CROSS JOIN t
"""


# ---------------------------------------------------------------------------
# Winnowing substring-level near-dup (rows-only: algorithmic
# fingerprints are not SQL-expressible; brute-force substring parity is
# pinned in tests/test_batch8.py)
# ---------------------------------------------------------------------------


def q_winnow_docs(sf_dir: str):
    """Winnowing (MOSS) fingerprint candidate pairs over documents
    UNION a deterministic prefix-mutated copy of every 8th doc — the
    copies share the full original text as a substring, so the
    guaranteed-detection path (shared span ≥ w+k−1 chars ⇒ shared
    fingerprint) actually fires on this corpus.  Oracle-paired: the
    rolling k-gram hash is a plain polynomial mod 2^64, reproduced in
    SQL with HUGEINT arithmetic and precomputed base powers; window
    minima, the leftmost-argmin rule, the boilerplate cap and the
    pair/count reduce are all relational (SQL_WINNOW_DOCS — verified
    bit-exact against the numpy path)."""
    from ..stages.dedup import winnow_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def mutate(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id")
        sel = t.filter(pc.equal(pc.bit_wise_and(ids, 7), 0))
        # typed explicitly: an empty batch (more read splits at higher
        # CPU counts) would otherwise make this null-typed and crash
        # binary_join_element_wise
        pre = pa.array(["COPIED PREAMBLE "] * sel.num_rows, pa.string())
        return pa.table({
            "doc_id": pc.add(sel.column("doc_id"), 1_000_000),
            "text": pc.binary_join_element_wise(pre, sel.column("text"),
                                                ""),
        })

    dup = docs.map_batches(mutate, batch_format="pyarrow",
                           zero_copy_batch=True)
    return _materialize(
        winnow_pairs(docs.union(dup), "text", "doc_id",
                     k=16, w=8, min_shared=2),
        empty_schema=pa.schema([("a", pa.int64()), ("b", pa.int64()),
                                ("shared", pa.int64())]))


def _winnow_sql(k: int = 16, w: int = 8, min_shared: int = 2,
                cap: int = 64) -> str:
    """SQL mirror of the full winnowing pipeline: explode normalized
    chars, compute each k-gram's polynomial hash mod 2^64 (HUGEINT sum
    of byte * B^(k-1-j) with powers precomputed here), take the w-wide
    sliding minimum with the leftmost-argmin rule, dedup selected
    positions to (doc, fingerprint), drop boilerplate fingerprints in
    more than ``cap`` docs, and count shared fingerprints per doc
    pair.  The uint64 hash reinterprets as int64 to match the engine's
    ``.view(np.int64)`` fingerprint values."""
    M = 1 << 64
    B = 1000003
    pws = [pow(B, k - 1 - j, M) for j in range(k)]
    pw_vals = ", ".join(f"({j}, {p})" for j, p in enumerate(pws))
    return f"""
WITH corpus AS MATERIALIZED (
  SELECT doc_id AS doc, text FROM documents
  WHERE doc_id IS NOT NULL AND text IS NOT NULL
  UNION ALL
  SELECT doc_id + 1000000 AS doc, 'COPIED PREAMBLE ' || text
  FROM documents
  WHERE doc_id IS NOT NULL AND text IS NOT NULL AND doc_id % 8 = 0),
norm AS MATERIALIZED (
  SELECT doc, regexp_replace(lower(text), '[^a-z0-9]+', '', 'g') AS s
  FROM corpus),
chars AS MATERIALIZED (
  SELECT doc, CAST(unnest(range(1, len(s) + 1)) AS BIGINT) AS i,
         unicode(substr(s, CAST(unnest(range(1, len(s) + 1)) AS BIGINT), 1))
           AS byte
  FROM norm WHERE len(s) >= {k}),
pw(j, p) AS (VALUES {pw_vals}),
hh AS MATERIALIZED (
  SELECT c.doc, c.i AS pos,
         CAST(sum(CAST(c2.byte AS HUGEINT) * pw.p) % {M} AS UBIGINT) AS h
  FROM chars c
  JOIN chars c2 ON c2.doc = c.doc AND c2.i >= c.i AND c2.i < c.i + {k}
  JOIN pw ON pw.j = c2.i - c.i
  GROUP BY 1, 2 HAVING count(*) = {k}),
wmin AS MATERIALIZED (
  SELECT doc, pos AS s,
         min(h) OVER win8 AS mn, count(*) OVER win8 AS cnt
  FROM hh
  WINDOW win8 AS (PARTITION BY doc ORDER BY pos
                  ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)),
sel AS MATERIALIZED (
  SELECT w.doc, w.s, min(p.pos) AS selpos
  FROM wmin w JOIN hh p
    ON p.doc = w.doc AND p.pos >= w.s AND p.pos < w.s + {w}
   AND p.h = w.mn
  WHERE w.cnt = {w}
  GROUP BY 1, 2),
fps AS MATERIALIZED (
  SELECT DISTINCT s.doc,
         CAST(CAST(h.h AS HUGEINT)
              - CASE WHEN h.h >= 9223372036854775808
                     THEN CAST(18446744073709551616 AS HUGEINT)
                     ELSE 0 END AS BIGINT) AS fp
  FROM (SELECT DISTINCT doc, selpos FROM sel) s
  JOIN hh h ON h.doc = s.doc AND h.pos = s.selpos),
freq AS MATERIALIZED (
  SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {cap})
SELECT f1.doc AS a, f2.doc AS b, CAST(count(*) AS BIGINT) AS shared
FROM fps f1
JOIN fps f2 ON f1.fp = f2.fp AND f1.doc < f2.doc
JOIN freq fr ON fr.fp = f1.fp
GROUP BY 1, 2 HAVING count(*) >= {min_shared}
ORDER BY a, b"""


SQL_WINNOW_DOCS = _winnow_sql(16, 8, 2, 64)


QUERIES8: Dict[str, Callable] = {
    "spearman_qty_disc": q_spearman_qty_disc,
    "stdres_orders": q_stdres_orders,
    "expfit_ks_gaps": q_expfit_ks_gaps,
    "cents_uniformity_price": q_cents_uniformity_price,
    "winnow_docs": q_winnow_docs,
}

SQL8: Dict[str, str] = {
    "spearman_qty_disc": SQL_SPEARMAN_QTY_DISC,
    "stdres_orders": SQL_STDRES_ORDERS,
    "expfit_ks_gaps": SQL_EXPFIT_KS_GAPS,
    "cents_uniformity_price": SQL_CENTS_UNIFORMITY_PRICE,
    "winnow_docs": SQL_WINNOW_DOCS,
}
