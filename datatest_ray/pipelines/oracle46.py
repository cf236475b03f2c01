"""Driver-contract queries, batch 46 (see oracle.py for the contract):
Z-order (Morton curve) locality histogram over (price, quantity) —
the multi-column clustering audit, integer-exact after one mirrored
quantize — and greedy coverage-maximizing document selection
(submodular greedy; iterative, rows-only by design, parity pinned by
brute-force tests).  Merged into ``oracle.queries()`` /
``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict

from ..stages.salting import morton_sql_expr


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


_XMIN, _XMAX = 900.0, 105000.0  # l_extendedprice domain bounds
_YMIN, _YMAX = 1.0, 51.0        # l_quantity domain bounds


def q_zorder_price_qty(sf_dir: str):
    """Morton-code bucket histogram over (l_extendedprice,
    l_quantity), 8-bit grid, buckets of 1024 codes (stages/salting.py
    :: zorder_histogram)."""
    from ..stages.salting import zorder_histogram

    li = _read(sf_dir, "lineitem", ["l_extendedprice", "l_quantity"])
    return _materialize(zorder_histogram(
        li, x_col="l_extendedprice", y_col="l_quantity",
        x_min=_XMIN, x_max=_XMAX, y_min=_YMIN, y_max=_YMAX,
        bits=8, bucket_shift=10))


_MORTON = morton_sql_expr("qx", "qy", 8)

SQL_ZORDER_PRICE_QTY = f"""
WITH f AS (
  SELECT l_extendedprice AS x, l_quantity AS y FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
q AS (
  SELECT
    least(greatest(CAST(floor(((x - {_XMIN}) * 256.0)
                               / ({_XMAX} - {_XMIN})) AS BIGINT), 0),
          255) AS qx,
    least(greatest(CAST(floor(((y - {_YMIN}) * 256.0)
                               / ({_YMAX} - {_YMIN})) AS BIGINT), 0),
          255) AS qy
  FROM f),
c AS (SELECT {_MORTON} AS code FROM q)
SELECT CAST(code >> 10 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(code) AS BIGINT) AS code_lo,
       CAST(max(code) AS BIGINT) AS code_hi
FROM c GROUP BY 1
"""


def q_greedy_cover_docs(sf_dir: str):
    """Greedy max-coverage selection of 10 documents by fresh distinct
    3-word shingle hashes (stages/sampling.py :: greedy_coverage).
    Oracle-paired: the coverage objective depends only on shingle
    IDENTITY, so the SQL mirror (SQL_GREEDY_COVER_DOCS) runs the same
    10 greedy rounds over the literal 3-token shingle strings — valid
    as long as the engine's 64-bit shingle hashes are collision-free
    on the corpus (P(collision) ~ 1e-9 at sf0.1)."""
    from ..stages.sampling import greedy_coverage

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return greedy_coverage(docs, id_col="doc_id", text_col="text",
                           k=10, ngram=3)


def _greedy_cover_sql(k: int = 10) -> str:
    """Unrolled greedy facility-location mirror over literal 3-token
    shingles: round r counts each doc's not-yet-covered shingles,
    picks the max (gain DESC, doc ASC), and unions the winner's
    shingles into the covered set.  A zero best gain leaves every
    later pick empty, matching the engine's early stop."""
    ctes = [r"""tk AS MATERIALIZED (
  SELECT doc_id AS doc,
         generate_subscripts(string_split_regex(lower(text), '\s+'), 1)
           AS pos,
         unnest(string_split_regex(lower(text), '\s+')) AS tok
  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL)""",
        """tkf AS MATERIALIZED (
  SELECT doc, row_number() OVER (PARTITION BY doc ORDER BY pos) AS pos,
         tok
  FROM tk WHERE trim(tok) <> '')""",
        """sh AS MATERIALIZED (
  SELECT DISTINCT a.doc, a.tok || ' ' || b.tok || ' ' || c.tok AS h
  FROM tkf a
  JOIN tkf b ON b.doc = a.doc AND b.pos = a.pos + 1
  JOIN tkf c ON c.doc = a.doc AND c.pos = a.pos + 2)""",
        "cov_0 AS MATERIALIZED (SELECT h FROM sh WHERE 1 = 0)"]
    for r in range(1, k + 1):
        p = r - 1
        ctes += [
            f"""gain_{r} AS MATERIALIZED (
  SELECT s.doc, count(*) AS g
  FROM sh s LEFT JOIN cov_{p} c ON c.h = s.h
  WHERE c.h IS NULL GROUP BY 1)""",
            f"""pick_{r} AS MATERIALIZED (
  SELECT {r} AS rank, doc, g FROM gain_{r}
  WHERE g > 0 ORDER BY g DESC, doc ASC LIMIT 1)""",
            f"""cov_{r} AS MATERIALIZED (
  SELECT h FROM cov_{p}
  UNION SELECT s.h FROM sh s JOIN pick_{r} p ON s.doc = p.doc)""",
        ]
    finals = "\nUNION ALL\n".join(
        f"SELECT CAST(p.rank AS BIGINT) AS rank, p.doc AS doc_id, "
        f"CAST(p.g AS BIGINT) AS gain, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM cov_{r}) AS covered_total "
        f"FROM pick_{r} p" for r in range(1, k + 1))
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT * FROM (\n{finals}\n) ORDER BY rank")


SQL_GREEDY_COVER_DOCS = _greedy_cover_sql(10)


QUERIES46: Dict[str, Callable] = {
    "zorder_price_qty": q_zorder_price_qty,
    "greedy_cover_docs": q_greedy_cover_docs,
}

SQL46: Dict[str, str] = {
    "zorder_price_qty": SQL_ZORDER_PRICE_QTY,
    "greedy_cover_docs": SQL_GREEDY_COVER_DOCS,
}
