"""Driver-contract queries, batch 26 (see oracle.py for the contract):
the 2-D histogram partial — the joint-distribution counterpart of
``hist_price`` used for bivariate drift (a marginal-preserving shift
in (price, quantity) is invisible to two 1-D histograms but not to
the joint grid).  Merged into ``oracle.queries()`` /
``oracle.oracle_sql()``."""

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


def q_hist2d_price_qty(sf_dir: str):
    """(bx, by, n): joint histogram of l_extendedprice (5000-wide
    bins) x l_quantity (10-wide bins).  Same plan as every histogram
    partial: per-batch floor-divide bucketing is the combiner, one
    tiny groupby((bx, by)) count — the shuffle moves grid cells, never
    rows.  Null values keep their null bucket (SQL GROUP BY
    semantics)."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "lineitem", ["l_extendedprice", "l_quantity"])

    def bucketize(t: pa.Table) -> pa.Table:
        bx = pc.cast(pc.floor(
            pc.divide(t.column("l_extendedprice"), 5000.0)), pa.int64())
        by = pc.cast(pc.floor(
            pc.divide(t.column("l_quantity"), 10.0)), pa.int64())
        return pa.table({"bx": bx, "by": by})

    return _materialize(
        ds.map_batches(bucketize, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(["bx", "by"]).aggregate(Count(alias_name="n")))


SQL_HIST2D_PRICE_QTY = """
SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bx,
       CAST(floor(l_quantity / 10.0) AS BIGINT) AS by,
       count(*) AS n
FROM lineitem GROUP BY 1, 2
"""


QUERIES26: Dict[str, Callable] = {
    "hist2d_price_qty": q_hist2d_price_qty,
}

SQL26: Dict[str, str] = {
    "hist2d_price_qty": SQL_HIST2D_PRICE_QTY,
}
