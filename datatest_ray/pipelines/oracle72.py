"""Driver-contract queries, batch 72 (see oracle.py for the contract):
discrete power-law exponent of per-user activity and a gamma
method-of-moments fit to inter-event gaps.  Merged into
``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_powerlaw_users(sf_dir: str):
    """Discrete power-law alpha of per-user event counts (x_min = 5)
    (stages/stattests.py :: powerlaw_alpha)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.stattests import powerlaw_alpha

    ev = _read(sf_dir, "events", ["user_id"]).map_batches(
        lambda t: t.filter(pc.is_valid(t.column("user_id"))),
        batch_format="pyarrow", zero_copy_batch=True)
    return _materialize(powerlaw_alpha(ev, group_col="user_id",
                                       x_min=5))


SQL_POWERLAW_USERS = """
WITH c AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS x
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(CASE WHEN x >= 5 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_tail,
         sum(CASE WHEN x >= 5 THEN ln(x / 4.5) ELSE 0 END) AS slog
  FROM c)
SELECT n_keys, n_tail,
       CASE WHEN n_tail > 0 AND slog > 0
            THEN round(1.0 + n_tail / slog, 6)
       END AS alpha
FROM agg
"""


def q_gammafit_gaps(sf_dir: str):
    """Gamma method-of-moments fit to positive per-user inter-event
    gaps (epoch-us) (stages/stattests.py :: gamma_moments_fit)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.stattests import gamma_moments_fit
    from ..stages.winfunc import lag_diff

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    gaps = lag_diff(ev, by="user_id", order_col="ts",
                    id_col="event_id").filter(expr="gap > 0")

    # gaps fit in SECONDS: at round-6 output precision the raw-us
    # magnitudes would amplify float-sum noise past the rounding slack
    def to_sec(t: pa.Table) -> pa.Table:
        return pa.table({"gap_s": pc.divide(
            pc.cast(t.column("gap"), pa.float64()), 1000000.0)})

    gaps = gaps.map_batches(to_sec, batch_format="pyarrow",
                            zero_copy_batch=True)
    return _materialize(gamma_moments_fit(gaps, value_col="gap_s"))


SQL_GAMMAFIT_GAPS = """
WITH g AS (
  SELECT CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
           AS gap
  FROM events),
f AS (SELECT CAST(gap AS DOUBLE) / 1000000.0 AS v FROM g
      WHERE gap IS NOT NULL AND gap > 0),
s AS (SELECT CAST(count(*) AS BIGINT) AS n,
             sum(v) AS s, sum(v * v) AS s2
      FROM f)
SELECT n,
       CASE WHEN n >= 2 THEN round(s / n, 6) END AS mean,
       CASE WHEN n >= 2 AND s2 / n - (s / n) * (s / n) > 0
            THEN round((s / n) * (s / n)
                       / (s2 / n - (s / n) * (s / n)), 6)
       END AS shape,
       CASE WHEN n >= 2 AND s2 / n - (s / n) * (s / n) > 0
            THEN round((s2 / n - (s / n) * (s / n)) / (s / n), 6)
       END AS scale
FROM s
"""


QUERIES72: Dict[str, Callable] = {
    "powerlaw_users": q_powerlaw_users,
    "gammafit_gaps": q_gammafit_gaps,
}

SQL72: Dict[str, str] = {
    "powerlaw_users": SQL_POWERLAW_USERS,
    "gammafit_gaps": SQL_GAMMAFIT_GAPS,
}
