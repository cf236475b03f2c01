"""Driver-contract queries, batch 70 (see oracle.py for the contract):
exact optimal-partitioning changepoints and SAX motif census over the
daily event series.  Merged into ``oracle.queries()`` /
``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_changepoints_events(sf_dir: str):
    """rows-only by design (sequential DP has no SQL mirror): exact
    optimal-partitioning changepoints per event type; brute-force DP
    parity pinned in tests/test_batch70.py
    (stages/temporal.py :: optimal_changepoints_daily)."""
    from ..stages.temporal import optimal_changepoints_daily

    return _materialize(optimal_changepoints_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type"))


def q_sax_motifs_events(sf_dir: str):
    """SAX 4-symbol motif census per event type over daily counts
    (stages/temporal.py :: sax_motifs_daily)."""
    from ..stages.temporal import sax_motifs_daily

    return _materialize(sax_motifs_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type", word_len=3))


SQL_SAX_MOTIFS_EVENTS = """
WITH f AS (
  SELECT event_type AS g,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL),
daily AS (
  SELECT g, day, CAST(count(*) AS BIGINT) AS x
  FROM f GROUP BY 1, 2),
st AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS DOUBLE) / count(*) AS mu
  FROM daily GROUP BY g),
sig AS (
  SELECT d.g, sqrt(sum((d.x - st.mu) * (d.x - st.mu)) / st.n)
           AS sigma
  FROM daily d JOIN st ON st.g = d.g GROUP BY d.g, st.n),
sym AS (
  SELECT d.g, d.day,
         CASE WHEN (d.x - st.mu) / sig.sigma > 0.6745 THEN 'd'
              WHEN (d.x - st.mu) / sig.sigma > 0.0 THEN 'c'
              WHEN (d.x - st.mu) / sig.sigma > -0.6745 THEN 'b'
              ELSE 'a' END AS s
  FROM daily d
  JOIN st ON st.g = d.g
  JOIN sig ON sig.g = d.g
  WHERE sig.sigma > 0),
words AS (
  SELECT g,
         s || lead(s, 1) OVER w || lead(s, 2) OVER w AS word
  FROM sym WINDOW w AS (PARTITION BY g ORDER BY day)),
wc AS (
  SELECT g, word, CAST(count(*) AS BIGINT) AS c
  FROM words WHERE word IS NOT NULL GROUP BY 1, 2),
agg AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_repeated
  FROM wc GROUP BY g),
top AS (
  SELECT g, word AS top_word, c AS top_count
  FROM (SELECT g, word, c,
               row_number() OVER (PARTITION BY g
                                  ORDER BY c DESC, word) AS rk
        FROM wc) t
  WHERE rk = 1)
SELECT st.g AS event_type, st.n AS n_days,
       coalesce(agg.n_words, 0) AS n_words,
       coalesce(agg.n_repeated, 0) AS n_repeated,
       top.top_word, top.top_count
FROM st
LEFT JOIN agg ON agg.g = st.g
LEFT JOIN top ON top.g = st.g
"""


QUERIES70: Dict[str, Callable] = {
    "changepoints_events": q_changepoints_events,
    "sax_motifs_events": q_sax_motifs_events,
}


def _sql70() -> Dict[str, str]:
    return {
        "sax_motifs_events": SQL_SAX_MOTIFS_EVENTS,
    }
