"""Driver-contract queries, batch 44 (see oracle.py for the contract):
consistent-hashing shard assignment with the add-a-shard disruption
audit (md5-ring positions are exact integers) and trailing-window
DISTINCT type counts (correlated self-join oracle).  Merged into
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


def q_consistent_shards_docs(sf_dir: str):
    """Documents on a 4-shard md5 ring (8 vnodes/shard) and how many
    move when a 5th shard joins (stages/alloc.py ::
    consistent_hash_shards)."""
    from ..stages.alloc import consistent_hash_shards

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        lambda t: t.filter(pc.is_valid(t.column("doc_id"))),
        batch_format="pyarrow", zero_copy_batch=True)
    return _materialize(consistent_hash_shards(
        ds, id_col="doc_id", n_shards_a=4, n_shards_b=5, n_vnodes=8))


SQL_CONSISTENT_SHARDS_DOCS = """
WITH va AS (
  SELECT ss.s,
         CAST(('0x' || substr(md5('s' || ss.s || ':v' || vv.v), 1, 16))
              AS UBIGINT) AS pos
  FROM (SELECT CAST(range AS BIGINT) AS s FROM range(4)) ss
  CROSS JOIN (SELECT CAST(range AS BIGINT) AS v FROM range(8)) vv),
vb AS (
  SELECT ss.s,
         CAST(('0x' || substr(md5('s' || ss.s || ':v' || vv.v), 1, 16))
              AS UBIGINT) AS pos
  FROM (SELECT CAST(range AS BIGINT) AS s FROM range(5)) ss
  CROSS JOIN (SELECT CAST(range AS BIGINT) AS v FROM range(8)) vv),
d AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
              AS UBIGINT) AS pos
  FROM documents WHERE doc_id IS NOT NULL),
asg AS (
  SELECT doc_id,
    coalesce((SELECT s FROM va WHERE va.pos >= d.pos
              ORDER BY va.pos, va.s LIMIT 1),
             (SELECT s FROM va ORDER BY va.pos, va.s LIMIT 1)) AS sa,
    coalesce((SELECT s FROM vb WHERE vb.pos >= d.pos
              ORDER BY vb.pos, vb.s LIMIT 1),
             (SELECT s FROM vb ORDER BY vb.pos, vb.s LIMIT 1)) AS sb
  FROM d)
SELECT CAST(sa AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN sa <> sb THEN 1 ELSE 0 END) AS BIGINT)
         AS n_moved
FROM asg GROUP BY 1
"""


def q_trailing_types_user(sf_dir: str):
    """Per event: distinct event types the same user produced in the
    trailing hour, anchor included (stages/winfunc.py ::
    trailing_distinct)."""
    from ..stages.winfunc import trailing_distinct

    ev = _read(sf_dir, "events",
               ["user_id", "ts", "event_type", "event_id"])

    def clean(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.and_(pc.is_valid(t.column("user_id")),
                             pc.is_valid(t.column("ts"))),
                     pc.and_(pc.is_valid(t.column("event_type")),
                             pc.is_valid(t.column("event_id"))))
        return t.filter(ok)

    ds = ev.map_batches(clean, batch_format="pyarrow",
                        zero_copy_batch=True)
    return _materialize(trailing_distinct(
        ds, by="user_id", ts_col="ts", type_col="event_type",
        id_col="event_id"))


SQL_TRAILING_TYPES_USER = """
WITH f AS (
  SELECT user_id, ts, event_type, event_id FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL AND event_id IS NOT NULL)
SELECT e1.event_id, e1.user_id,
       CAST(count(DISTINCT e2.event_type) AS BIGINT) AS n_types
FROM f e1 JOIN f e2
  ON e2.user_id = e1.user_id
 AND e2.ts > e1.ts - INTERVAL 1 HOUR AND e2.ts <= e1.ts
GROUP BY 1, 2
"""


QUERIES44: Dict[str, Callable] = {
    "consistent_shards_docs": q_consistent_shards_docs,
    "trailing_types_user": q_trailing_types_user,
}

SQL44: Dict[str, str] = {
    "consistent_shards_docs": SQL_CONSISTENT_SHARDS_DOCS,
    "trailing_types_user": SQL_TRAILING_TYPES_USER,
}
