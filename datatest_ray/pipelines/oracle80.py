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
    """Davies-Bouldin index of the embedding label partition.
    Oracle-paired: centroids, scatters and the k x k separation grid
    all unnest to (label, dim) rows (SQL_DAVIES_BOULDIN_LABELS);
    brute-force parity additionally pinned in tests/test_batch80.py
    (stages/similarity.py :: davies_bouldin_labels)."""
    from ..stages.similarity import davies_bouldin_labels

    emb = _read(sf_dir, "embeddings", ["embedding", "label"])
    return _materialize(davies_bouldin_labels(
        emb, vec_col="embedding", label_col="label"))


SQL_DAVIES_BOULDIN_LABELS = """
WITH pts AS MATERIALIZED (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings WHERE label IS NOT NULL),
cent AS MATERIALIZED (
  SELECT label, dim, sum(x)/count(*) AS c FROM pts GROUP BY 1, 2),
pd AS MATERIALIZED (
  SELECT p.vec_id, p.label, sqrt(sum((p.x - c.c)*(p.x - c.c))) AS d
  FROM pts p JOIN cent c ON p.label = c.label AND p.dim = c.dim
  GROUP BY 1, 2),
s AS MATERIALIZED (
  SELECT label, sum(d)/count(*) AS s, CAST(count(*) AS BIGINT) AS n
  FROM pd GROUP BY 1),
cd AS MATERIALIZED (
  SELECT a.label AS la, b.label AS lb,
         sqrt(sum((a.c - b.c)*(a.c - b.c))) AS dij
  FROM cent a JOIN cent b ON a.dim = b.dim AND a.label <> b.label
  GROUP BY 1, 2),
r AS (
  SELECT cd.la, max((sa.s + sb.s)/cd.dij) AS best
  FROM cd JOIN s sa ON sa.label = cd.la JOIN s sb ON sb.label = cd.lb
  WHERE cd.dij > 0 GROUP BY 1),
agg AS (SELECT CAST(sum(n) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS k FROM s)
SELECT agg.n, agg.k,
       CASE WHEN agg.k >= 2
            THEN (SELECT round(avg(best), 6) FROM r) END AS db
FROM agg
"""


QUERIES80: Dict[str, Callable] = {
    "iqm_price": q_iqm_price,
    "davies_bouldin_labels": q_davies_bouldin_labels,
}


def _sql80() -> Dict[str, str]:
    return {
        "iqm_price": SQL_IQM_PRICE,
        "davies_bouldin_labels": SQL_DAVIES_BOULDIN_LABELS,
    }
