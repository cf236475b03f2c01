"""Driver-contract queries, batch 82 (see oracle.py for the contract):
missingness-pattern census over events and the full-row duplicate
census (with injected duplicates).  Merged into ``oracle.queries()``
/ ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_null_patterns_events(sf_dir: str):
    """Top null-combination patterns over events(user_id, value,
    props) (stages/profile.py :: null_pattern_census)."""
    from ..stages.profile import null_pattern_census

    ev = _read(sf_dir, "events", ["user_id", "value", "props"])
    return _materialize(null_pattern_census(
        ev, ["user_id", "value", "props"], k=10))


SQL_NULL_PATTERNS_EVENTS = """
WITH f AS (
  SELECT concat(
           CASE WHEN user_id IS NULL THEN 'user_id,' ELSE '' END,
           CASE WHEN value IS NULL THEN 'value,' ELSE '' END,
           CASE WHEN props IS NULL THEN 'props,' ELSE '' END)
           AS raw
  FROM events),
p AS (
  SELECT CASE WHEN raw = '' THEN '(none)'
              ELSE substr(raw, 1, length(raw) - 1) END AS pattern
  FROM f),
ct AS (SELECT pattern, CAST(count(*) AS BIGINT) AS n
       FROM p GROUP BY pattern),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM ct)
SELECT ct.pattern, ct.n,
       round(ct.n / CAST(tot.n AS DOUBLE), 6) AS share
FROM ct, tot
ORDER BY ct.n DESC, ct.pattern
LIMIT 10
"""


def q_dup_rows_events(sf_dir: str):
    """Full-row duplicate census over events(user_id, event_type,
    value) UNION a deterministic re-ingest of every 20th event (the
    accidental-double-write fixture)
    (stages/profile.py :: dup_row_census)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.profile import dup_row_census

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type",
                                  "value"])

    def every_20th(t: pa.Table) -> pa.Table:
        # event_id % 20 == 0 via integer divide/multiply (positive
        # ids, so truncation == floor)
        eid = t.column("event_id")
        q = pc.divide(eid, 20)
        rem0 = pc.equal(pc.multiply(q, 20), eid)
        return t.filter(pc.fill_null(rem0, False))

    dup = ev.map_batches(every_20th, batch_format="pyarrow",
                         zero_copy_batch=True)
    both = ev.union(dup).select_columns(
        ["user_id", "event_type", "value"])
    return _materialize(dup_row_census(
        both, ["user_id", "event_type", "value"]))


SQL_DUP_ROWS_EVENTS = """
WITH both_ AS (
  SELECT user_id, event_type, value FROM events
  UNION ALL
  SELECT user_id, event_type, value FROM events
  WHERE event_id % 20 = 0),
ct AS (
  SELECT user_id, event_type, value, CAST(count(*) AS BIGINT) AS n
  FROM both_ GROUP BY 1, 2, 3)
SELECT CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(sum(n - 1) AS BIGINT) AS n_dup_rows,
       CAST(max(n) AS BIGINT) AS max_multiplicity
FROM ct
"""


QUERIES82: Dict[str, Callable] = {
    "null_patterns_events": q_null_patterns_events,
    "dup_rows_events": q_dup_rows_events,
}

SQL82: Dict[str, str] = {
    "null_patterns_events": SQL_NULL_PATTERNS_EVENTS,
    "dup_rows_events": SQL_DUP_ROWS_EVENTS,
}
