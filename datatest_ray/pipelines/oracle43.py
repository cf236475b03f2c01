"""Driver-contract queries, batch 43 (see oracle.py for the contract):
largest-remainder (Hamilton) apportionment and D'Hondt highest-averages
seat allocation over per-nation customer counts — both pure integer
arithmetic, hash-exact vs the SQL mirrors.  Merged into
``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict

import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _cust_nation(sf_dir: str):
    ds = _read(sf_dir, "customer", ["c_nationkey"])
    return ds.map_batches(
        lambda t: t.filter(pc.is_valid(t.column("c_nationkey"))),
        batch_format="pyarrow", zero_copy_batch=True)


def q_apportion_nations(sf_dir: str):
    """100 seats across nations by customer count, largest remainder
    (stages/alloc.py :: apportion_largest_remainder)."""
    from ..stages.alloc import apportion_largest_remainder

    return apportion_largest_remainder(
        _cust_nation(sf_dir), key_col="c_nationkey", seats=100)


SQL_APPORTION_NATIONS = """
WITH w AS (
  SELECT CAST(c_nationkey AS BIGINT) AS k,
         CAST(count(*) AS BIGINT) AS w
  FROM customer WHERE c_nationkey IS NOT NULL GROUP BY 1),
tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w),
base AS (SELECT k, w, (w * 100) // tw AS fl, (w * 100) % tw AS rem
         FROM w, tot),
ex AS (SELECT 100 - CAST(sum(fl) AS BIGINT) AS extra FROM base),
rk AS (SELECT k, w, fl,
              row_number() OVER (ORDER BY rem DESC, k ASC) AS rn
       FROM base)
SELECT k AS c_nationkey, w,
       CAST(fl + CASE WHEN rn <= (SELECT extra FROM ex)
                      THEN 1 ELSE 0 END AS BIGINT) AS seats
FROM rk
"""


def q_dhondt_nations(sf_dir: str):
    """13 seats across nations by customer count, D'Hondt quotients
    compared as lcm-scaled exact integers (stages/alloc.py ::
    dhondt_seats)."""
    from ..stages.alloc import dhondt_seats

    return dhondt_seats(_cust_nation(sf_dir), key_col="c_nationkey",
                        seats=13)


SQL_DHONDT_NATIONS = """
WITH w AS (
  SELECT CAST(c_nationkey AS BIGINT) AS k,
         CAST(count(*) AS BIGINT) AS w
  FROM customer WHERE c_nationkey IS NOT NULL GROUP BY 1),
q AS (
  SELECT k, w, d, (w * 232792560) // d AS q
  FROM w CROSS JOIN (SELECT CAST(range AS BIGINT) + 1 AS d
                     FROM range(13)) dv),
rk AS (SELECT k, w,
              row_number() OVER (ORDER BY q DESC, k ASC, d ASC) AS rn
       FROM q)
SELECT k AS c_nationkey, CAST(min(w) AS BIGINT) AS w,
       CAST(count(*) AS BIGINT) AS seats
FROM rk WHERE rn <= 13 GROUP BY 1
"""


QUERIES43: Dict[str, Callable] = {
    "apportion_nations": q_apportion_nations,
    "dhondt_nations": q_dhondt_nations,
}

SQL43: Dict[str, str] = {
    "apportion_nations": SQL_APPORTION_NATIONS,
    "dhondt_nations": SQL_DHONDT_NATIONS,
}
