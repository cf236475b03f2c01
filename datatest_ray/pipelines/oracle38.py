"""Driver-contract queries, batch 38 (see oracle.py for the contract):
empirical-Bayes shrunken per-user purchase rates (oracle-paired) and a
distributed BPE tokenizer-training run over the documents corpus
(rows-only by design: iterative re-segmentation is not one SQL query;
parity vs a brute-force reference is pinned in tests).  Merged into
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


def q_eb_purchase_rates(sf_dir: str):
    """Per-user purchase rates shrunk by a beta-binomial MoM prior
    (stages/mlprep.py :: eb_shrunk_rates); users with ≥5 events."""
    from ..stages.mlprep import eb_shrunk_rates

    def is_purchase(t: pa.Table):
        return pc.equal(t.column("event_type"), "purchase")

    return _materialize(eb_shrunk_rates(
        _read(sf_dir, "events", ["user_id", "event_type"]),
        key_col="user_id", flag_expr=is_purchase,
        flag_col="event_type", min_n=5))


SQL_EB_PURCHASE_RATES = """
WITH u AS (
  SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS k
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1),
e AS (SELECT key, n, k, CAST(k AS DOUBLE) / n AS raw
      FROM u WHERE n >= 5),
pr AS (SELECT sum(raw) AS s1, sum(raw * raw) AS s2,
              CAST(count(*) AS BIGINT) AS m FROM e),
ab AS (
  SELECT CASE WHEN m >= 2 THEN s1 / m END AS mean,
         CASE WHEN m >= 2 THEN (s2 - s1 * s1 / m) / (m - 1) END AS v
  FROM pr),
ab2 AS (
  SELECT mean,
         CASE WHEN v > 0 AND mean * (1 - mean) / v - 1 > 0
              THEN mean * (1 - mean) / v - 1 END AS common
  FROM ab)
SELECT e.key, e.n, e.k, e.raw,
       CASE WHEN common IS NOT NULL THEN
         (k + mean * common) / (n + common) END AS shrunk
FROM e CROSS JOIN ab2
"""


def q_bpe_train_docs(sf_dir: str):
    """Learn 6 BPE merges over the documents corpus (stages/text.py ::
    bpe_train).  rows-only by design (iterative); brute-force parity
    in tests/test_batch38.py."""
    from ..stages.text import bpe_train

    return bpe_train(_read(sf_dir, "documents", ["text"]),
                     "text", n_merges=6)


QUERIES38: Dict[str, Callable] = {
    "eb_purchase_rates": q_eb_purchase_rates,
    "bpe_train_docs": q_bpe_train_docs,
}

SQL38: Dict[str, str] = {
    "eb_purchase_rates": SQL_EB_PURCHASE_RATES,
}
