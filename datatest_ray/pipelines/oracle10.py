"""Driver-contract queries, batch 10 (see oracle.py for the contract):
C4-style duplicated-line detection, Welch's t-test, first-touch
attribution.  Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict

import pyarrow as pa


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


# ---------------------------------------------------------------------------
# Corpus-level duplicated lines (C4 / RefinedWeb line dedup)
# ---------------------------------------------------------------------------


def q_dup_lines_docs(sf_dir: str):
    """Normalized sentences appearing verbatim in >1 document —
    boilerplate (navigation chrome, license headers) that line-level
    dedup strips before LLM training.  The testdata has no repeated
    ≥20-char sentences, so every 5th doc gets a deterministic
    boilerplate footer appended (a 0-row pass proves nothing — round-1
    verdict discipline), exercising the split→distinct→count path."""
    import pyarrow.compute as pc

    from ..stages.text import dup_lines

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def with_footer(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        footer = pa.array([
            ". Subscribe to our newsletter for the latest updates."
            if i % 5 == 0 else "" for i in ids], pa.string())
        return pa.table({
            "doc_id": t.column("doc_id"),
            "text": pc.binary_join_element_wise(
                t.column("text"), footer, ""),
        })

    corpus = docs.map_batches(with_footer, batch_format="pyarrow",
                              zero_copy_batch=True)
    return _materialize(
        dup_lines(corpus, "text", "doc_id", sep=".", min_chars=20),
        empty_schema=pa.schema([("line", pa.string()),
                                ("n_docs", pa.int64())]))


SQL_DUP_LINES_DOCS = """
WITH d AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 5 = 0
                 THEN '. Subscribe to our newsletter for the latest updates.'
                 ELSE '' END AS text
  FROM documents
),
l AS (
  SELECT doc_id,
         trim(lower(unnest(string_split(text, '.'))),
              ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11))
           AS line
  FROM d
)
SELECT line, count(DISTINCT doc_id) AS n_docs
FROM l WHERE length(line) >= 20
GROUP BY line HAVING count(DISTINCT doc_id) > 1
"""


# ---------------------------------------------------------------------------
# Welch's unequal-variance t-test
# ---------------------------------------------------------------------------


def q_welch_value_types(sf_dir: str):
    """Welch's t-test of event value between purchases and clicks —
    the default two-sample mean comparison (no equal-variance
    assumption); moment partials only, data rows never shuffle."""
    from ..stages.robust import welch_ttest

    return _materialize(welch_ttest(
        _read(sf_dir, "events", ["event_type", "value"]),
        value_col="value", group_col="event_type",
        a="purchase", b="click"))


SQL_WELCH_VALUE_TYPES = """
WITH s AS (
  SELECT count(*) FILTER (event_type = 'purchase') AS na,
         count(*) FILTER (event_type = 'click') AS nb,
         avg(value) FILTER (event_type = 'purchase') AS ma,
         avg(value) FILTER (event_type = 'click') AS mb,
         var_samp(value) FILTER (event_type = 'purchase') AS va,
         var_samp(value) FILTER (event_type = 'click') AS vb
  FROM events WHERE value IS NOT NULL
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       ma AS mean_a, mb AS mean_b,
       (ma - mb) / sqrt(va / na + vb / nb) AS t,
       (va / na + vb / nb) * (va / na + vb / nb)
         / ((va / na) * (va / na) / (na - 1)
            + (vb / nb) * (vb / nb) / (nb - 1)) AS df
FROM s
"""


# ---------------------------------------------------------------------------
# First-touch revenue attribution
# ---------------------------------------------------------------------------


def q_attribution_first_touch(sf_dir: str):
    """Each user's total purchase value credited to the user's FIRST
    event type (by ts, event_id) — the classic marketing-attribution
    aggregate as one ordered bucketed kernel."""
    from ..stages.seq import first_touch_attribution

    return _materialize(first_touch_attribution(
        _read(sf_dir, "events",
              ["event_id", "user_id", "ts", "event_type", "value"]),
        by="user_id", ts="ts", type_col="event_type",
        id_col="event_id", value_col="value", target="purchase"))


SQL_ATTRIBUTION_FIRST_TOUCH = """
WITH o AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
f AS (SELECT user_id, event_type AS first_type FROM o WHERE rn = 1),
p AS (
  SELECT user_id, sum(value) AS v
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
    AND event_type = 'purchase' AND value IS NOT NULL
  GROUP BY user_id
)
SELECT f.first_type,
       count(*) AS n_users,
       sum(coalesce(p.v, 0.0)) AS total_value
FROM f LEFT JOIN p USING (user_id)
GROUP BY f.first_type
"""


QUERIES10: Dict[str, Callable] = {
    "dup_lines_docs": q_dup_lines_docs,
    "welch_value_types": q_welch_value_types,
    "attribution_first_touch": q_attribution_first_touch,
}

SQL10: Dict[str, str] = {
    "dup_lines_docs": SQL_DUP_LINES_DOCS,
    "welch_value_types": SQL_WELCH_VALUE_TYPES,
    "attribution_first_touch": SQL_ATTRIBUTION_FIRST_TOUCH,
}
