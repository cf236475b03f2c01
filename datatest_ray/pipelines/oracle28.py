"""Driver-contract queries, batch 28 (see oracle.py for the contract):
distribution-comparison effect sizes and score calibration — Cliff's
delta (the ordinal effect size behind "is the purchase segment's value
actually larger, and by how much"), the two-sample Cramér–von Mises
statistic (integrated-ECDF drift, the whole-distribution complement to
the KS max-gap), and a reliability-diagram calibration report with
per-bin Brier scores (the audit run before trusting a score column as
a sampling weight).  Merged into ``oracle.queries()`` /
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


# ---------------------------------------------------------------------------
# Cliff's delta: purchase event values vs everything else
# ---------------------------------------------------------------------------


def q_cliffs_delta_events(sf_dir: str):
    """Cliff's delta of ``value`` for purchase events vs all other
    event types (one-vs-rest) — exact greater/less pair counts from
    distinct-value partials (stages/robust.py :: cliffs_delta)."""
    from ..stages.robust import cliffs_delta

    return _materialize(cliffs_delta(
        _read(sf_dir, "events", ["event_type", "value"]),
        value_col="value", group_col="event_type", a="purchase"))


SQL_CLIFFS_DELTA_EVENTS = """
WITH va AS (
  SELECT value AS v, count(*) AS c FROM events
  WHERE value IS NOT NULL AND event_type = 'purchase' GROUP BY 1),
vb AS (
  SELECT value AS v, count(*) AS c FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
    AND event_type <> 'purchase' GROUP BY 1),
p AS (
  SELECT CAST(coalesce(sum(va.c * vb.c) FILTER (va.v > vb.v), 0)
              AS BIGINT) AS gt,
         CAST(coalesce(sum(va.c * vb.c) FILTER (va.v < vb.v), 0)
              AS BIGINT) AS lt
  FROM va CROSS JOIN vb),
n AS (
  SELECT CAST((SELECT coalesce(sum(c), 0) FROM va) AS BIGINT) AS na,
         CAST((SELECT coalesce(sum(c), 0) FROM vb) AS BIGINT) AS nb)
SELECT na AS n_a, nb AS n_b, gt AS gt_pairs, lt AS lt_pairs,
       CASE WHEN na > 0 AND nb > 0 THEN
         CAST(gt - lt AS DOUBLE) / (CAST(na AS DOUBLE) * nb)
       END AS delta
FROM p, n
"""


# ---------------------------------------------------------------------------
# Two-sample Cramér–von Mises: view vs purchase value distributions
# ---------------------------------------------------------------------------


def q_cvm_value_events(sf_dir: str):
    """Cramér–von Mises T between the view and purchase ``value``
    distributions — exact big-integer order statistics, one double
    conversion at the end (stages/robust.py :: cvm_two_sample)."""
    from ..stages.robust import cvm_two_sample

    return _materialize(cvm_two_sample(
        _read(sf_dir, "events", ["event_type", "value"]),
        value_col="value", group_col="event_type",
        a="view", b="purchase"))


SQL_CVM_VALUE_EVENTS = """
WITH pts AS (
  SELECT value AS v,
         count(*) FILTER (event_type = 'view') AS ca,
         count(*) FILTER (event_type = 'purchase') AS cb
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('view', 'purchase')
  GROUP BY 1),
c AS (
  SELECT ca + cb AS cnt,
         sum(ca) OVER (ORDER BY v) AS cumn,
         sum(cb) OVER (ORDER BY v) AS cumm
  FROM pts),
nn AS (SELECT CAST(sum(ca) AS BIGINT) AS n, CAST(sum(cb) AS BIGINT) AS m
       FROM pts)
SELECT nn.n AS n_a, nn.m AS n_b,
       CASE WHEN nn.n > 0 AND nn.m > 0 THEN
         CAST(sum(CAST(cnt AS HUGEINT)
                  * ((CAST(nn.m AS HUGEINT) * cumn
                      - CAST(nn.n AS HUGEINT) * cumm)
                     * (CAST(nn.m AS HUGEINT) * cumn
                        - CAST(nn.n AS HUGEINT) * cumm))) AS DOUBLE)
           / (CAST(nn.n AS DOUBLE) * nn.m * (nn.n + nn.m) * (nn.n + nn.m))
       END AS t
FROM c, nn GROUP BY nn.n, nn.m
"""


# ---------------------------------------------------------------------------
# Energy distance: view vs purchase value distributions (exact cents)
# ---------------------------------------------------------------------------


def q_energy_value_events(sf_dir: str):
    """Two-sample energy distance between the view and purchase
    ``value`` distributions — exact integer-cents pairwise-|diff| sums
    via prefix order statistics (stages/drift.py :: energy_distance)."""
    from ..stages.drift import energy_distance

    return _materialize(energy_distance(
        _read(sf_dir, "events", ["event_type", "value"]),
        value_col="value", group_col="event_type",
        a="view", b="purchase", decimals=2))


SQL_ENERGY_VALUE_EVENTS = """
WITH pts AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS v,
         count(*) FILTER (event_type = 'view') AS ca,
         count(*) FILTER (event_type = 'purchase') AS cb
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('view', 'purchase')
  GROUP BY 1),
w AS (
  SELECT v, ca, cb,
    coalesce(sum(ca) OVER (ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bca,
    coalesce(sum(CAST(ca AS HUGEINT) * v) OVER (ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bsa,
    coalesce(sum(cb) OVER (ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bcb,
    coalesce(sum(CAST(cb AS HUGEINT) * v) OVER (ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bsb
  FROM pts),
tot AS (
  SELECT CAST(sum(ca) AS BIGINT) AS n, CAST(sum(cb) AS BIGINT) AS m,
         CAST(sum(CAST(ca AS HUGEINT) * v) AS HUGEINT) AS sa,
         CAST(sum(CAST(cb AS HUGEINT) * v) AS HUGEINT) AS sb
  FROM pts),
s AS (
  SELECT tot.n, tot.m,
    CAST(sum(CAST(w.ca AS HUGEINT)
         * (CAST(w.v AS HUGEINT) * w.bcb - w.bsb
            + (tot.sb - w.bsb - CAST(w.cb AS HUGEINT) * w.v)
            - CAST(w.v AS HUGEINT) * (tot.m - w.bcb - w.cb)))
         AS HUGEINT) AS sxy,
    CAST(sum(CAST(w.ca AS HUGEINT)
         * (CAST(w.v AS HUGEINT) * w.bca - w.bsa
            + (tot.sa - w.bsa - CAST(w.ca AS HUGEINT) * w.v)
            - CAST(w.v AS HUGEINT) * (tot.n - w.bca - w.ca)))
         AS HUGEINT) AS sxx,
    CAST(sum(CAST(w.cb AS HUGEINT)
         * (CAST(w.v AS HUGEINT) * w.bcb - w.bsb
            + (tot.sb - w.bsb - CAST(w.cb AS HUGEINT) * w.v)
            - CAST(w.v AS HUGEINT) * (tot.m - w.bcb - w.cb)))
         AS HUGEINT) AS syy
  FROM w, tot GROUP BY tot.n, tot.m),
means AS (
  SELECT n, m,
    CASE WHEN n > 0 AND m > 0 THEN
      CAST(sxy AS DOUBLE) / (CAST(n AS DOUBLE) * m * 100.0) END AS mxy,
    CASE WHEN n > 0 AND m > 0 THEN
      CAST(sxx AS DOUBLE) / (CAST(n AS DOUBLE) * n * 100.0) END AS mxx,
    CASE WHEN n > 0 AND m > 0 THEN
      CAST(syy AS DOUBLE) / (CAST(m AS DOUBLE) * m * 100.0) END AS myy
  FROM s)
SELECT n AS n_a, m AS n_b, mxy AS mean_between, mxx AS mean_within_a,
       myy AS mean_within_b, 2.0 * mxy - mxx - myy AS e
FROM means
"""


# ---------------------------------------------------------------------------
# Calibration bins + Brier: binary-exact score vs fulfilled status
# ---------------------------------------------------------------------------

_CAL_D = 1024  # power-of-two denominator: every score k/D binary-exact


def q_calibration_orders(sf_dir: str):
    """Reliability bins + per-bin Brier for a deterministic
    pseudo-score s = (price-cents mod 1024)/1024 against the order
    'F'-status label — all sums exact int64, every output a single
    int→double division (stages/mlprep.py :: calibration_bins with
    the ``denom`` exact-integer encoding)."""
    from ..stages.mlprep import calibration_bins

    ds = _read(sf_dir, "orders", ["o_totalprice", "o_orderstatus"])

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            t.column("o_totalprice"), 100.0)), pa.int64())
        k = pc.subtract(cents, pc.multiply(
            pc.divide(cents, pa.scalar(_CAL_D, pa.int64())),
            pa.scalar(_CAL_D, pa.int64())))
        return pa.table({
            "k": k,
            "y": pc.cast(pc.equal(t.column("o_orderstatus"), "F"),
                         pa.int64()),
        })

    scored = ds.map_batches(prep, batch_format="pyarrow",
                            zero_copy_batch=True)
    return _materialize(calibration_bins(
        scored, score_col="k", label_col="y", n_bins=8, denom=_CAL_D))


SQL_CALIBRATION_ORDERS = """
WITH s AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) % 1024 AS k,
         CAST(o_orderstatus = 'F' AS BIGINT) AS y
  FROM orders
  WHERE o_totalprice IS NOT NULL AND o_orderstatus IS NOT NULL),
b AS (
  SELECT k // 128 AS bin, count(*) AS n,
         CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(sum(k) AS BIGINT) AS sk,
         CAST(sum(k * k) AS BIGINT) AS sk2,
         CAST(sum(k * y) AS BIGINT) AS sky
  FROM s GROUP BY 1)
SELECT bin, n, n_pos,
       CAST(n_pos AS DOUBLE) / n AS rate,
       CAST(sk AS DOUBLE) / (1024.0 * CAST(n AS DOUBLE)) AS avg_score,
       CAST(sk2 - 2 * 1024 * sky + 1024 * 1024 * n_pos AS DOUBLE)
         / (1024.0 * 1024.0 * CAST(n AS DOUBLE)) AS brier
FROM b
"""


QUERIES28: Dict[str, Callable] = {
    "cliffs_delta_events": q_cliffs_delta_events,
    "cvm_value_events": q_cvm_value_events,
    "energy_value_events": q_energy_value_events,
    "calibration_orders": q_calibration_orders,
}

SQL28: Dict[str, str] = {
    "cliffs_delta_events": SQL_CLIFFS_DELTA_EVENTS,
    "cvm_value_events": SQL_CVM_VALUE_EVENTS,
    "energy_value_events": SQL_ENERGY_VALUE_EVENTS,
    "calibration_orders": SQL_CALIBRATION_ORDERS,
}
