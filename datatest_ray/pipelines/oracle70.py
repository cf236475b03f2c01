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
    """Exact optimal-partitioning changepoints per event type.
    Oracle-paired: the O(n^2) DP unrolls over series position j — a
    cumulative best/prev table per round plus an unrolled backtrack
    walk (SQL_CHANGEPOINTS_EVENTS, j <= 40; the daily spine is
    calendar-bounded) — with the same prefix-sum sse and argmin
    (cost ASC, i ASC) rule.  Brute-force DP parity additionally
    pinned in tests/test_batch70.py
    (stages/temporal.py :: optimal_changepoints_daily)."""
    from ..stages.temporal import optimal_changepoints_daily

    return _materialize(optimal_changepoints_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type"))


def _changepoints_sql(jmax: int = 40, penalty_factor: float = 2.0) -> str:
    """Unrolled optimal-partitioning mirror.  ``jmax`` caps the series
    length the unroll supports (the events table's daily spine is a
    calendar month; groups longer than jmax would need a larger
    unroll).  Round j selects best[j] = min_i best[i] + sse(i, j) +
    pen; the backtrack walk then follows prev pointers from j = n."""
    ctes = ["""daily AS MATERIALIZED (
  SELECT event_type AS g, CAST(floor(epoch(ts)/86400) AS BIGINT) AS day,
         CAST(count(*) AS DOUBLE) AS x
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2)""",
        """ser AS MATERIALIZED (
  SELECT g, x,
         row_number() OVER (PARTITION BY g ORDER BY day) AS j,
         count(*) OVER (PARTITION BY g) AS n
  FROM daily)""",
        """pre AS MATERIALIZED (
  SELECT g, j, n,
         sum(x) OVER (PARTITION BY g ORDER BY j
                      ROWS UNBOUNDED PRECEDING) AS c1,
         sum(x*x) OVER (PARTITION BY g ORDER BY j
                        ROWS UNBOUNDED PRECEDING) AS c2
  FROM ser)""",
        """pre0 AS MATERIALIZED (
  SELECT g, 0 AS j, any_value(n) AS n, 0.0 AS c1, 0.0 AS c2
  FROM pre GROUP BY g
  UNION ALL SELECT g, j, n, c1, c2 FROM pre)""",
        f"""pen AS MATERIALIZED (
  SELECT s.g,
         CASE WHEN var_pop(s.x) > 0
              THEN {penalty_factor} * var_pop(s.x) * ln(any_value(s.n))
              ELSE 1.0 END AS pen,
         any_value(s.n) AS n
  FROM ser s GROUP BY s.g)""",
        """sse AS MATERIALIZED (
  SELECT a.g, a.j AS i, b.j AS j,
         (b.c2 - a.c2) - (b.c1 - a.c1)*(b.c1 - a.c1)/(b.j - a.j) AS sse
  FROM pre0 a JOIN pre0 b ON b.g = a.g AND b.j > a.j)""",
        """ball_0 AS MATERIALIZED (
  SELECT g, 0 AS j, -pen AS best, 0 AS prev FROM pen)"""]
    for j in range(1, jmax + 1):
        p = j - 1
        ctes += [
            f"""cand_{j} AS MATERIALIZED (
  SELECT b.g, b.best + s.sse + pen.pen AS cost, b.j AS i
  FROM ball_{p} b
  JOIN sse s ON s.g = b.g AND s.i = b.j AND s.j = {j}
  JOIN pen ON pen.g = b.g)""",
            f"""best_{j} AS MATERIALIZED (
  SELECT g, {j} AS j, cost AS best, i AS prev FROM (
    SELECT g, cost, i,
           row_number() OVER (PARTITION BY g ORDER BY cost ASC, i ASC)
             AS r
    FROM cand_{j}) WHERE r = 1)""",
            f"""ball_{j} AS MATERIALIZED (
  SELECT * FROM ball_{p} UNION ALL SELECT * FROM best_{j})""",
        ]
    ctes.append(f"""walk_0 AS MATERIALIZED (
  SELECT b.g, b.j, b.prev, b.best
  FROM ball_{jmax} b JOIN pen ON pen.g = b.g AND b.j = pen.n)""")
    for t in range(1, jmax + 1):
        ctes.append(f"""walk_{t} AS MATERIALIZED (
  SELECT b.g, b.j, b.prev, b.best
  FROM walk_{t - 1} w JOIN ball_{jmax} b
    ON b.g = w.g AND b.j = w.prev
  WHERE w.j > 0)""")
    walk_union = "\nUNION ALL\n".join(
        f"SELECT g, j, prev FROM walk_{t}" for t in range(0, jmax + 1))
    ctes.append(f"""path AS MATERIALIZED (
  SELECT DISTINCT g, prev AS cp FROM ({walk_union}) WHERE prev > 0)""")
    ctes.append("""cps AS MATERIALIZED (
  SELECT g, CAST(count(*) AS BIGINT) AS n_cp,
         string_agg(CAST(cp AS VARCHAR), ',' ORDER BY cp) AS split_pos
  FROM path GROUP BY g)""")
    # Self-describing overflow sentinel (round-3 ADVICE): a group whose
    # series exceeds the unroll depth used to vanish silently (walk_0
    # inner-joins ball_{jmax} on j = n, which has no match past jmax),
    # surfacing as a confusing row-count mismatch.  Now such a group
    # emits an explicit ERROR row instead, so the oracle diff names the
    # failure mode (regenerate with a larger jmax) rather than hiding
    # the group.
    return "WITH " + ",\n".join(ctes) + f"""
SELECT p.g AS event_type, p.n AS n_days,
       COALESCE(c.n_cp, 0) AS n_changepoints,
       COALESCE(c.split_pos, '') AS split_pos,
       round(w.best, 6) AS cost
FROM pen p
JOIN walk_0 w ON w.g = p.g
LEFT JOIN cps c ON c.g = p.g
UNION ALL
SELECT p.g AS event_type, p.n AS n_days,
       CAST(-1 AS BIGINT) AS n_changepoints,
       'ERROR: series length exceeds SQL unroll jmax={jmax}' AS split_pos,
       CAST(NULL AS DOUBLE) AS cost
FROM pen p WHERE p.n > {jmax}
ORDER BY event_type"""


SQL_CHANGEPOINTS_EVENTS = _changepoints_sql(40)


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
        "changepoints_events": SQL_CHANGEPOINTS_EVENTS,
    }
