"""Driver-contract queries, batch 48 (see oracle.py for the contract):
additive Holt-Winters (level+trend+weekly season) residuals under an
unrolled recursive-CTE oracle, Benjamini-Hochberg FDR adjustment over
per-event-type weekend-mix tests, the Palma inequality ratio, and the
decoded-pixel exposure/color-cast audit (rows-only: pure-python codec).
Merged into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_holt_winters_daily(sf_dir: str):
    """Holt-Winters additive smoothing (α=0.5, β=0.25, γ=0.25, weekly
    season) of each event type's daily counts
    (stages/temporal.py :: holt_winters_daily)."""
    from ..stages.temporal import holt_winters_daily

    return _materialize(holt_winters_daily(
        _read(sf_dir, "events", ["event_type", "ts"]),
        "ts", by="event_type"))


SQL_HOLT_WINTERS_DAILY = """
WITH RECURSIVE daily AS (
  SELECT event_type AS g,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2),
numbered AS (
  SELECT g, day, x,
         CAST(row_number() OVER (PARTITION BY g ORDER BY day)
              AS BIGINT) AS rn
  FROM daily),
init AS (
  SELECT g, list(CAST(x AS DOUBLE) ORDER BY rn) AS xs
  FROM numbered WHERE rn <= 7 GROUP BY g HAVING count(*) = 7),
init2 AS (
  SELECT g, xs,
         (((((((0.0 + xs[1]) + xs[2]) + xs[3]) + xs[4]) + xs[5])
            + xs[6]) + xs[7]) / 7.0 AS l
  FROM init),
rec(g, rn, l, b, s1, s2, s3, s4, s5, s6, s7) AS (
  SELECT g, CAST(7 AS BIGINT), l, CAST(0.0 AS DOUBLE),
         xs[1] - l, xs[2] - l, xs[3] - l, xs[4] - l,
         xs[5] - l, xs[6] - l, xs[7] - l
  FROM init2
  UNION ALL
  SELECT r.g, r.rn + 1,
         0.5 * (CAST(n.x AS DOUBLE) - r.s1) + 0.5 * (r.l + r.b),
         0.25 * ((0.5 * (CAST(n.x AS DOUBLE) - r.s1)
                  + 0.5 * (r.l + r.b)) - r.l) + 0.75 * r.b,
         r.s2, r.s3, r.s4, r.s5, r.s6, r.s7,
         0.25 * (CAST(n.x AS DOUBLE)
                 - (0.5 * (CAST(n.x AS DOUBLE) - r.s1)
                    + 0.5 * (r.l + r.b))) + 0.75 * r.s1
  FROM rec r JOIN numbered n ON n.g = r.g AND n.rn = r.rn + 1)
SELECT n.g AS event_type, n.day, n.x,
       r.l + r.b + r.s1 AS forecast,
       CAST(n.x AS DOUBLE) - (r.l + r.b + r.s1) AS resid
FROM rec r JOIN numbered n ON n.g = r.g AND n.rn = r.rn + 1
"""


def q_bh_weekend_mix(sf_dir: str):
    """Per-event-type weekend-share test (two-proportion z² vs the
    pooled rest) with Benjamini-Hochberg FDR adjustment across the
    type family (stages/stattests.py :: bh_adjust)."""
    from ray.data.aggregate import Sum

    from ..stages.stattests import bh_adjust

    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column("event_type")),
                     pc.is_valid(t.column("ts")))
        t = t.filter(ok)
        dow = pc.day_of_week(t.column("ts"), count_from_zero=False,
                             week_start=1)
        wk = pc.greater_equal(dow, 6).to_numpy(
            zero_copy_only=False).astype(np.int64)
        gv = t.column("event_type").to_numpy(zero_copy_only=False)
        u, inv = np.unique(gv, return_inverse=True)
        return pa.table({
            "event_type": pa.array(u),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "nw": pa.array(np.bincount(inv, weights=wk).astype(np.int64)),
        })

    agg = (ev.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("nw", alias_name="nw")))

    def stats(t: pa.Table) -> pa.Table:
        schema = pa.schema([("event_type", pa.string()),
                            ("n", pa.int64()), ("n_weekend", pa.int64()),
                            ("z2", pa.float64()), ("p", pa.float64())])
        if t.num_rows == 0:
            return schema.empty_table()
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        nw = t.column("nw").to_numpy(zero_copy_only=False).astype(np.int64)
        n_tot, nw_tot = int(n.sum()), int(nw.sum())
        nb = n_tot - n
        wb = nw_tot - nw
        p1 = nw / n
        p2 = wb / nb
        pp = (nw + wb) / (n + nb)
        z2 = (p1 - p2) ** 2 / (pp * (1.0 - pp) * (1.0 / n + 1.0 / nb))
        z2 = np.round(z2, 6)
        # BH runs on the UNROUNDED surrogate p: a round-6 p times the
        # small-integer k/rank ratio lands exactly on decimal .5
        # boundaries, where numpy (binary-nearest) and DuckDB
        # (decimal half-away) round differently — fuzz seed 20260820
        # hit 0.289813 * 5/2 = 0.7245325 exactly
        p_raw = np.exp(-z2 / 2.0)
        return pa.table({
            "event_type": t.column("event_type"),
            "n": pa.array(n, pa.int64()),
            "n_weekend": pa.array(nw, pa.int64()),
            "z2": pa.array(z2, pa.float64()),
            "p": pa.array(np.round(p_raw, 6), pa.float64()),
            "p_raw": pa.array(p_raw, pa.float64()),
        })

    stat_ds = agg.repartition(1).map_batches(
        stats, batch_format="pyarrow", batch_size=None)
    adjusted = bh_adjust(stat_ds, p_col="p_raw", alpha=0.05)
    return _materialize(adjusted.drop_columns(["p_raw"]))


SQL_BH_WEEKEND_MIX = """
WITH f AS (
  SELECT event_type AS g,
         CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END AS wk
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
a AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(wk) AS BIGINT) AS nw
      FROM f GROUP BY g),
t AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot,
             CAST(sum(nw) AS BIGINT) AS nw_tot
      FROM a),
s AS (SELECT g, n, nw,
             round(
               pow(nw / CAST(n AS DOUBLE)
                   - (nw_tot - nw) / CAST(n_tot - n AS DOUBLE), 2)
               / ((nw_tot / CAST(n_tot AS DOUBLE))
                  * (1.0 - nw_tot / CAST(n_tot AS DOUBLE))
                  * (1.0 / n + 1.0 / (n_tot - n))), 6) AS z2
      FROM a, t),
ps AS (SELECT g, n, nw, z2, exp(-z2 / 2.0) AS praw FROM s),
r AS (SELECT *,
             CAST(row_number() OVER (ORDER BY praw, g) AS BIGINT) AS rn,
             CAST(count(*) OVER () AS BIGINT) AS k
      FROM ps),
adj AS (SELECT *,
               min(least(praw * k / rn, 1.0))
                 OVER (ORDER BY rn DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS padj
        FROM r)
SELECT g AS event_type, n, nw AS n_weekend, z2, round(praw, 6) AS p,
       round(padj, 6) AS p_adj, padj <= 0.05 AS significant
FROM adj
"""


def q_palma_price(sf_dir: str):
    """Palma ratio (top-10% share / bottom-40% share) of order totals
    (stages/stattests.py :: palma_ratio)."""
    from ..stages.stattests import palma_ratio

    return _materialize(palma_ratio(
        _read(sf_dir, "orders", ["o_totalprice"]),
        value_col="o_totalprice"))


SQL_PALMA_PRICE = """
WITH f AS (SELECT o_totalprice AS v FROM orders
           WHERE o_totalprice IS NOT NULL),
g AS (SELECT v, count(*) AS cnt,
             CAST(round(v * 100) AS BIGINT) AS cents
      FROM f GROUP BY v),
w AS (SELECT cents, cnt,
             CAST(sum(cnt) OVER (ORDER BY v) - cnt AS BIGINT)
               AS cum_before
      FROM g),
t AS (SELECT CAST(sum(cnt) AS BIGINT) AS nt FROM g),
m AS (SELECT (100 * cum_before) // nt AS pct,
             CAST(cents * cnt AS BIGINT) AS mass, cnt
      FROM w, t),
agg AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
               CAST(sum(mass) AS BIGINT) AS total,
               CAST(sum(CASE WHEN pct < 40 THEN mass ELSE 0 END)
                    AS BIGINT) AS bot,
               CAST(sum(CASE WHEN pct >= 90 THEN mass ELSE 0 END)
                    AS BIGINT) AS top
        FROM m)
SELECT n,
       round(bot / CAST(total AS DOUBLE), 6) AS bottom40_share,
       round(top / CAST(total AS DOUBLE), 6) AS top10_share,
       CASE WHEN bot > 0
            THEN round(top / CAST(bot AS DOUBLE), 6) END AS palma
FROM agg
"""


def q_image_exposure_audit(sf_dir: str):
    """rows-only by design (pure-python codec is not SQL-expressible):
    decode the seeded image fixture, measure histogram-clipping
    fractions and color cast, and summarize.  Metric parity is pinned
    in tests/test_batch48.py."""
    import os
    import re

    from ..sources.images import ImageFixtureSpec, generate_dataset
    from ..stages.imaging import image_exposure_scores

    base = os.path.basename(os.path.normpath(sf_dir))
    m = re.search(r"sf(\d+(?:\.\d+)?)", base)
    sf = float(m.group(1)) if m else 0.001
    spec = ImageFixtureSpec(n_rows=max(1000, int(100_000 * sf)),
                            seed=42, rows_per_part=2048)
    images = generate_dataset(spec, columns={"image_id", "bytes", "fmt"})
    t = _materialize(image_exposure_scores(images))
    under = t.column("frac_under").to_numpy(zero_copy_only=False)
    over = t.column("frac_over").to_numpy(zero_copy_only=False)
    cast = t.column("cast").to_numpy(zero_copy_only=False)
    ok = ~np.isnan(under)
    clipped = (under[ok] + over[ok]) > 0.2
    return pa.table({
        "n_images": pa.array([t.num_rows], pa.int64()),
        "n_decoded": pa.array([int(ok.sum())], pa.int64()),
        "n_clipped": pa.array([int(clipped.sum())], pa.int64()),
        "mean_cast": pa.array(
            [round(float(np.sort(cast[ok]).sum() / max(ok.sum(), 1)), 4)],
            pa.float64()),
    })


QUERIES48: Dict[str, Callable] = {
    "holt_winters_daily": q_holt_winters_daily,
    "bh_weekend_mix": q_bh_weekend_mix,
    "palma_price": q_palma_price,
    "image_exposure_audit": q_image_exposure_audit,
}

SQL48: Dict[str, str] = {
    "holt_winters_daily": SQL_HOLT_WINTERS_DAILY,
    "bh_weekend_mix": SQL_BH_WEEKEND_MIX,
    "palma_price": SQL_PALMA_PRICE,
}
