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
    Iterative submodular greedy — rows-only."""
    from ..stages.sampling import greedy_coverage

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return greedy_coverage(docs, id_col="doc_id", text_col="text",
                           k=10, ngram=3)


QUERIES46: Dict[str, Callable] = {
    "zorder_price_qty": q_zorder_price_qty,
    "greedy_cover_docs": q_greedy_cover_docs,
}

SQL46: Dict[str, str] = {
    "zorder_price_qty": SQL_ZORDER_PRICE_QTY,
}
