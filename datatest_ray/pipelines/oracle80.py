"""Driver-contract queries, batch 80 (see oracle.py for the contract):
interquartile mean of order totals and the Davies-Bouldin index of the
embedding label partition.  Merged into ``oracle.queries()`` /
``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_iqm_price(sf_dir: str):
    """Interquartile mean of o_totalprice
    (stages/robust.py :: interquartile_mean)."""
    from ..stages.robust import interquartile_mean

    return _materialize(interquartile_mean(
        _read(sf_dir, "orders", ["o_totalprice"]),
        col="o_totalprice"))


SQL_IQM_PRICE = """
WITH f AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders WHERE o_totalprice IS NOT NULL),
vc AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM f GROUP BY v),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM vc),
w AS (
  SELECT v, cnt * 4 AS w,
         CAST(sum(cnt * 4) OVER (ORDER BY v) AS BIGINT) AS cum
  FROM vc),
kept AS (
  SELECT w.v,
         greatest(least(w.cum, 3 * tot.n)
                  - greatest(w.cum - w.w, tot.n), 0) AS k
  FROM w, tot)
SELECT tot.n,
       round(sum(kept.v * kept.k) / (100.0 * sum(kept.k)), 6) AS iqm
FROM kept, tot
GROUP BY tot.n
"""


def q_davies_bouldin_labels(sf_dir: str):
    """rows-only by design (centroid algebra over list columns has no
    SQL mirror): Davies-Bouldin index of the embedding label
    partition; brute-force parity pinned in tests/test_batch80.py
    (stages/similarity.py :: davies_bouldin_labels)."""
    from ..stages.similarity import davies_bouldin_labels

    emb = _read(sf_dir, "embeddings", ["embedding", "label"])
    return _materialize(davies_bouldin_labels(
        emb, vec_col="embedding", label_col="label"))


QUERIES80: Dict[str, Callable] = {
    "iqm_price": q_iqm_price,
    "davies_bouldin_labels": q_davies_bouldin_labels,
}


def _sql80() -> Dict[str, str]:
    return {
        "iqm_price": SQL_IQM_PRICE,
    }
