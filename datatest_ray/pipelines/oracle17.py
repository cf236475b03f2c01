"""Driver-contract queries, batch 17 (see oracle.py for the contract):
the A/B-testing and agreement statistics family — Fisher's exact test
(small-count 2x2), McNemar's paired test, Cohen's kappa agreement,
two-proportion z-test on a deterministic variant split, Cohen's d
effect size, a Poisson two-rate test — plus maximal-marginal-relevance
(MMR) diversity selection over the embeddings table (iterative
broadcast-state pattern; greedy selection is not SQL-expressible, so
rows-only with a brute-force unit test).  Merged into
``oracle.queries()`` / ``oracle.oracle_sql()``."""

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


# ---------------------------------------------------------------------------
# Fisher's exact test: urgent priority x fulfilled status
# ---------------------------------------------------------------------------


def q_fisher_exact_orders(sf_dir: str):
    """Fisher's exact (two-sided) p-value for 1-URGENT priority vs
    fulfilled ('F') status — the exact complement to
    `odds_ratio_orders` on the same 2x2."""
    from ..stages.robust import fisher_exact_2x2

    t = _materialize(fisher_exact_2x2(
        _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"]),
        exposure_col="o_orderpriority", exposure="1-URGENT",
        outcome_col="o_orderstatus", outcome="F"))
    return pa.table({
        "a": t.column("a"), "b": t.column("b"),
        "c": t.column("c"), "d": t.column("d"),
        "p_value": pc.round(t.column("p_value"), ndigits=6),
    })


SQL_FISHER_EXACT_ORDERS = """
WITH cell AS (
  SELECT
    count(*) FILTER (coalesce(o_orderpriority, '') = '1-URGENT'
                     AND coalesce(o_orderstatus, '') = 'F') AS a,
    count(*) FILTER (coalesce(o_orderpriority, '') = '1-URGENT'
                     AND coalesce(o_orderstatus, '') <> 'F') AS b,
    count(*) FILTER (coalesce(o_orderpriority, '') <> '1-URGENT'
                     AND coalesce(o_orderstatus, '') = 'F') AS c,
    count(*) FILTER (coalesce(o_orderpriority, '') <> '1-URGENT'
                     AND coalesce(o_orderstatus, '') <> 'F') AS d
  FROM orders),
par AS (
  SELECT a, b, c, d, a + b AS r1, a + c AS c1,
         a + b + c + d AS n
  FROM cell),
pmf AS (
  SELECT a, b, c, d,
         unnest(generate_series(greatest(0, r1 + c1 - n),
                                least(r1, c1))) AS k,
         r1, c1, n
  FROM par),
probs AS (
  SELECT a, b, c, d, k,
         exp(lgamma(r1 + 1) - lgamma(k + 1) - lgamma(r1 - k + 1)
             + lgamma(n - r1 + 1) - lgamma(c1 - k + 1)
             - lgamma(n - r1 - c1 + k + 1)
             + lgamma(c1 + 1) + lgamma(n - c1 + 1)
             - lgamma(n + 1)) AS p
  FROM pmf),
obs AS (SELECT p AS pobs FROM probs WHERE k = a)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
       round(least(sum(p) FILTER (p <= (SELECT pobs FROM obs)
                                      * (1 + 1e-7)), 1.0), 6)
         AS p_value
FROM probs
GROUP BY a, b, c, d
"""


# ---------------------------------------------------------------------------
# McNemar's paired test: per-user click vs purchase incidence
# ---------------------------------------------------------------------------


def q_mcnemar_users(sf_dir: str):
    """McNemar's test on paired binary outcomes per (user, day) unit —
    viewed vs purchased that day: statistic (b−c)²/(b+c) over the
    discordant cells.  (Per-user-lifetime flags are vacuous in this
    corpus: every user eventually does both.)  One per-unit groupby
    (exact int flags), then a two-cell streaming reduce."""
    from ray.data.aggregate import Max, Sum

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def flags(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column("user_id")),
                     pc.is_valid(t.column("ts")))
        t = t.filter(ok)
        return pa.table({
            "user_id": t.column("user_id"),
            "day": pc.floor_temporal(t.column("ts"), unit="day"),
            "is_c": pc.cast(pc.fill_null(pc.equal(
                t.column("event_type"), pa.scalar("view")), False),
                pa.int64()),
            "is_p": pc.cast(pc.fill_null(pc.equal(
                t.column("event_type"), pa.scalar("purchase")), False),
                pa.int64()),
        })

    per_user = ev.map_batches(flags, batch_format="pyarrow",
                              zero_copy_batch=True).groupby(
        ["user_id", "day"]).aggregate(Max("is_c", alias_name="has_c"),
                                      Max("is_p", alias_name="has_p"))

    def cells(t: pa.Table) -> pa.Table:
        hc = t.column("has_c").to_numpy(zero_copy_only=False) > 0
        hp = t.column("has_p").to_numpy(zero_copy_only=False) > 0
        return pa.table({
            "b": pa.array([int((hc & ~hp).sum())], pa.int64()),
            "c": pa.array([int((~hc & hp).sum())], pa.int64()),
        })

    row = per_user.map_batches(cells, batch_format="pyarrow",
                               zero_copy_batch=True).aggregate(
        Sum("b", alias_name="b"), Sum("c", alias_name="c"))
    b = int(row["b"] or 0)
    c = int(row["c"] or 0)
    # raw IEEE quotient, NOT rounded: (b-c)²/(b+c) is an exact rational
    # over counts and can land on a 6-dp half where Python round
    # (half-even) and SQL round (half-away) disagree (fuzz seed 31337:
    # 196/512 = 0.3828125)
    stat = (b - c) ** 2 / (b + c) if b + c else None
    return pa.table({
        "b": pa.array([b], pa.int64()),
        "c": pa.array([c], pa.int64()),
        "stat": pa.array([stat], pa.float64()),
    })


SQL_MCNEMAR_USERS = """
WITH u AS (
  SELECT user_id, date_trunc('day', ts) AS d,
         count(*) FILTER (event_type = 'view') > 0 AS has_c,
         count(*) FILTER (event_type = 'purchase') > 0 AS has_p
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY user_id, d),
m AS (
  SELECT count(*) FILTER (has_c AND NOT has_p) AS b,
         count(*) FILTER (NOT has_c AND has_p) AS c
  FROM u)
SELECT CAST(b AS BIGINT) AS b, CAST(c AS BIGINT) AS c,
       CASE WHEN b + c > 0 THEN
         CAST((b - c) * (b - c) AS DOUBLE) / (b + c)
       END AS stat
FROM m
"""


# ---------------------------------------------------------------------------
# Cohen's kappa: priority rank vs price band agreement
# ---------------------------------------------------------------------------


def q_cohens_kappa_orders(sf_dir: str):
    """Cohen's kappa between two 5-level labelings of each order —
    priority rank (leading digit) and total-price band (100k-wide,
    clamped to 1..5) — chance-corrected agreement from one
    contingency groupby."""
    from ..stages.robust import cohens_kappa

    orders = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def ranks(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column("o_orderpriority")),
                     pc.is_valid(t.column("o_totalprice")))
        t = t.filter(ok)
        band = pc.add(pc.cast(pc.floor(pc.divide(
            t.column("o_totalprice"), 100000.0)), pa.int64()),
            pa.scalar(1, pa.int64()))
        band = pc.min_element_wise(
            pc.max_element_wise(band, pa.scalar(1, pa.int64())),
            pa.scalar(5, pa.int64()))
        return pa.table({
            "i": pc.cast(pc.utf8_slice_codeunits(
                t.column("o_orderpriority"), 0, 1), pa.int64()),
            "j": band,
        })

    ds = orders.map_batches(ranks, batch_format="pyarrow",
                            zero_copy_batch=True)
    t = _materialize(cohens_kappa(ds, i_col="i", j_col="j"))
    return pa.table({
        "n": t.column("n"),
        # raw count rationals, NOT rounded: po = diag/tot and
        # pe = chance/tot² can land on 6-dp halves where half-even
        # (pa/np) and half-away (SQL) disagree; both sides run the
        # same double ops so raw values are bitwise identical
        "po": t.column("po"),
        "pe": t.column("pe"),
        "kappa": t.column("kappa"),
    })


SQL_COHENS_KAPPA_ORDERS = """
WITH lab AS (
  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS i,
         least(5, greatest(1,
           CAST(floor(o_totalprice / 100000.0) AS BIGINT) + 1)) AS j
  FROM orders
  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
cells AS (SELECT i, j, count(*) AS n FROM lab GROUP BY 1, 2),
marg AS (
  SELECT CAST(sum(n) AS BIGINT) AS tot,
         CAST(sum(n) FILTER (i = j) AS BIGINT) AS diag,
         CAST((SELECT sum(ri.rn * cj.cn) FROM
                 (SELECT i AS v, sum(n) AS rn FROM cells GROUP BY 1) ri
                 JOIN
                 (SELECT j AS v, sum(n) AS cn FROM cells GROUP BY 1) cj
                 USING (v)) AS BIGINT) AS chance
  FROM cells)
SELECT tot AS n,
       CAST(diag AS DOUBLE) / tot AS po,
       CAST(chance AS DOUBLE) / (CAST(tot AS DOUBLE) * tot) AS pe,
       CASE WHEN CAST(chance AS DOUBLE) / (CAST(tot AS DOUBLE) * tot)
                 < 1.0 THEN
         (CAST(diag AS DOUBLE) / tot
          - CAST(chance AS DOUBLE) / (CAST(tot AS DOUBLE) * tot))
           / (1 - CAST(chance AS DOUBLE)
                  / (CAST(tot AS DOUBLE) * tot))
       END AS kappa
FROM marg
"""


# ---------------------------------------------------------------------------
# Two-proportion z-test on a deterministic variant split
# ---------------------------------------------------------------------------


def q_two_prop_ztest_events(sf_dir: str):
    """Two-proportion z-test of "heavy purchaser" conversion (purchase
    share of the user's events > 0.25) between the deterministic A/B
    split `user_id % 2` — the standard experiment readout.  (A plain
    any-purchase flag saturates at 100% in this corpus, degenerating
    the pooled variance.)  Per-user share flags from ONE groupby; the
    2x2 reduce and the pooled-variance z run on four integers."""
    from ray.data.aggregate import Count, Sum

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def flags(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("user_id")))
        return pa.table({
            "user_id": t.column("user_id"),
            "is_p": pc.cast(pc.fill_null(pc.equal(
                t.column("event_type"), pa.scalar("purchase")), False),
                pa.int64()),
        })

    per_user = ev.map_batches(flags, batch_format="pyarrow",
                              zero_copy_batch=True).groupby(
        "user_id").aggregate(Sum("is_p", alias_name="n_p"),
                             Count(alias_name="n_ev"))

    def cells(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        n_p = t.column("n_p").to_numpy(zero_copy_only=False)
        n_ev = t.column("n_ev").to_numpy(zero_copy_only=False)
        conv = (n_p.astype(np.float64) / n_ev) > 0.25
        v1 = (uid % 2) == 1
        return pa.table({
            "n0": pa.array([int((~v1).sum())], pa.int64()),
            "x0": pa.array([int((~v1 & conv).sum())], pa.int64()),
            "n1": pa.array([int(v1.sum())], pa.int64()),
            "x1": pa.array([int((v1 & conv).sum())], pa.int64()),
        })

    row = per_user.map_batches(cells, batch_format="pyarrow",
                               zero_copy_batch=True).aggregate(
        Sum("n0", alias_name="n0"), Sum("x0", alias_name="x0"),
        Sum("n1", alias_name="n1"), Sum("x1", alias_name="x1"))
    n0, x0 = int(row["n0"] or 0), int(row["x0"] or 0)
    n1, x1 = int(row["n1"] or 0), int(row["x1"] or 0)
    z = None
    if n0 > 0 and n1 > 0:
        p0, p1 = x0 / n0, x1 / n1
        pp = (x0 + x1) / (n0 + n1)
        den = np.sqrt(pp * (1 - pp) * (1 / n0 + 1 / n1))
        z = round(float((p1 - p0) / den), 6) if den > 0 else None
    return pa.table({
        "n0": pa.array([n0], pa.int64()),
        "x0": pa.array([x0], pa.int64()),
        "n1": pa.array([n1], pa.int64()),
        "x1": pa.array([x1], pa.int64()),
        "z": pa.array([z], pa.float64()),
    })


SQL_TWO_PROP_ZTEST_EVENTS = """
WITH u AS (
  SELECT user_id % 2 AS variant,
         CASE WHEN CAST(count(*) FILTER (event_type = 'purchase')
                        AS DOUBLE) / count(*) > 0.25
              THEN 1 ELSE 0 END AS conv
  FROM events WHERE user_id IS NOT NULL
  GROUP BY user_id),
s AS (
  SELECT
    CAST(count(*) FILTER (variant = 0) AS BIGINT) AS n0,
    CAST(count(*) FILTER (variant = 0 AND conv = 1) AS BIGINT) AS x0,
    CAST(count(*) FILTER (variant = 1) AS BIGINT) AS n1,
    CAST(count(*) FILTER (variant = 1 AND conv = 1) AS BIGINT) AS x1
  FROM u)
SELECT n0, x0, n1, x1,
       CASE WHEN n0 > 0 AND n1 > 0
                 AND sqrt((CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
                          * (1 - CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
                          * (1.0/n0 + 1.0/n1)) > 0 THEN
         round((CAST(x1 AS DOUBLE)/n1 - CAST(x0 AS DOUBLE)/n0)
               / sqrt((CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
                      * (1 - CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
                      * (1.0/n0 + 1.0/n1)), 6)
       END AS z
FROM s
"""


# ---------------------------------------------------------------------------
# Cohen's d: purchase vs click value effect size
# ---------------------------------------------------------------------------


def q_cohens_d_value(sf_dir: str):
    """Cohen's d (pooled-SD standardized mean difference) of event
    value between purchases and clicks — the effect-size companion to
    `welch_value_types`.  Same moment-partials skeleton: data rows
    never shuffle."""
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def moments(batch: pa.Table) -> pa.Table:
        g = batch.column("event_type")
        v = batch.column("value").cast(pa.float64())
        rows = []
        for name in ("purchase", "click"):
            m = pc.and_(pc.fill_null(pc.equal(g, name), False),
                        pc.and_(pc.is_valid(v),
                                pc.invert(pc.is_nan(v))))
            x = v.filter(m).to_numpy(zero_copy_only=False)
            rows.append((name, len(x), float(x.sum()),
                         float((x * x).sum())))
        return pa.table({
            "seg": pa.array([r[0] for r in rows]),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "s": pa.array([r[2] for r in rows], pa.float64()),
            "ss": pa.array([r[3] for r in rows], pa.float64()),
        })

    merged = ev.map_batches(moments, batch_format="pyarrow",
                            zero_copy_batch=True).groupby(
        "seg").aggregate(Sum("n", alias_name="n"),
                         Sum("s", alias_name="s"),
                         Sum("ss", alias_name="ss"))
    rows = {r["seg"]: r for r in merged.take_all()}
    na, sa, ssa = (rows.get("purchase", {}).get("n", 0) or 0,
                   rows.get("purchase", {}).get("s", 0.0) or 0.0,
                   rows.get("purchase", {}).get("ss", 0.0) or 0.0)
    nb, sb, ssb = (rows.get("click", {}).get("n", 0) or 0,
                   rows.get("click", {}).get("s", 0.0) or 0.0,
                   rows.get("click", {}).get("ss", 0.0) or 0.0)
    d = None
    if na >= 2 and nb >= 2:
        ma, mb = sa / na, sb / nb
        va = (ssa - sa * sa / na) / (na - 1)
        vb = (ssb - sb * sb / nb) / (nb - 1)
        sp = np.sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2))
        d = round(float((ma - mb) / sp), 6) if sp > 0 else None
    return pa.table({
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "d": pa.array([d], pa.float64()),
    })


SQL_COHENS_D_VALUE = """
WITH s AS (
  SELECT count(*) FILTER (event_type = 'purchase') AS na,
         count(*) FILTER (event_type = 'click') AS nb,
         avg(value) FILTER (event_type = 'purchase') AS ma,
         avg(value) FILTER (event_type = 'click') AS mb,
         var_samp(value) FILTER (event_type = 'purchase') AS va,
         var_samp(value) FILTER (event_type = 'click') AS vb
  FROM events WHERE value IS NOT NULL)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       CASE WHEN na >= 2 AND nb >= 2
                 AND ((na-1)*va + (nb-1)*vb) > 0 THEN
         round((ma - mb)
               / sqrt(((na-1)*va + (nb-1)*vb) / (na + nb - 2)), 6)
       END AS d
FROM s
"""


# ---------------------------------------------------------------------------
# Poisson two-rate test: view vs click event rates
# ---------------------------------------------------------------------------


def q_poisson_2rate_events(sf_dir: str):
    """Conditional Poisson two-rate test for equal view and click
    rates over the same observation window: with equal exposure the
    statistic reduces to z = (k₁−k₂)/√(k₁+k₂).  One filtered count
    pass — no shuffle."""
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["event_type"])

    def counts(t: pa.Table) -> pa.Table:
        g = t.column("event_type")
        return pa.table({
            "k1": pa.array([int(pc.sum(pc.cast(pc.fill_null(
                pc.equal(g, "view"), False), pa.int64())).as_py() or 0)],
                pa.int64()),
            "k2": pa.array([int(pc.sum(pc.cast(pc.fill_null(
                pc.equal(g, "click"), False), pa.int64())).as_py() or 0)],
                pa.int64()),
        })

    row = ev.map_batches(counts, batch_format="pyarrow",
                         zero_copy_batch=True).aggregate(
        Sum("k1", alias_name="k1"), Sum("k2", alias_name="k2"))
    k1, k2 = int(row["k1"] or 0), int(row["k2"] or 0)
    # raw quotient, NOT rounded: sqrt of a perfect-square count is
    # IEEE-exact in both engines, making z an exact rational that can
    # tie at a 6-dp half (half-even vs half-away)
    z = (k1 - k2) / np.sqrt(k1 + k2) if k1 + k2 else None
    return pa.table({
        "k1": pa.array([k1], pa.int64()),
        "k2": pa.array([k2], pa.int64()),
        "z": pa.array([z], pa.float64()),
    })


SQL_POISSON_2RATE_EVENTS = """
WITH c AS (
  SELECT count(*) FILTER (event_type = 'view') AS k1,
         count(*) FILTER (event_type = 'click') AS k2
  FROM events)
SELECT CAST(k1 AS BIGINT) AS k1, CAST(k2 AS BIGINT) AS k2,
       CASE WHEN k1 + k2 > 0 THEN
         CAST(k1 - k2 AS DOUBLE) / sqrt(k1 + k2)
       END AS z
FROM c
"""


# ---------------------------------------------------------------------------
# MMR diversity selection over embeddings (rows-only: greedy argmax)
# ---------------------------------------------------------------------------


def q_mmr_select_embeddings(sf_dir: str):
    """Top-10 diversity-aware exemplars via maximal marginal relevance
    (λ=0.7, query = corpus centroid) — the training-data curation
    primitive for picking representative-but-diverse samples.
    Oracle-paired: the fixed 10 greedy rounds unroll into
    MATERIALIZED CTE blocks, each round one (redundancy-max, score,
    argmax-pick) step over the unnested normalized vectors
    (SQL_MMR_SELECT_EMBEDDINGS); brute-force parity additionally
    pinned in test_batch17.py."""
    from ..stages.robust import mmr_select

    return mmr_select(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        vec_col="embedding", id_col="vec_id", k=10, lam=0.7)


QUERIES17: Dict[str, Callable] = {
    "fisher_exact_orders": q_fisher_exact_orders,
    "mcnemar_users": q_mcnemar_users,
    "cohens_kappa_orders": q_cohens_kappa_orders,
    "two_prop_ztest_events": q_two_prop_ztest_events,
    "cohens_d_value": q_cohens_d_value,
    "poisson_2rate_events": q_poisson_2rate_events,
    "mmr_select_embeddings": q_mmr_select_embeddings,
}

def _mmr_select_sql(k: int = 10, lam: float = 0.7) -> str:
    """Unrolled-greedy MMR mirror: normalized vectors and the centroid
    query are plain SQL; each of the fixed ``k`` rounds computes the
    max-dot redundancy against the selected set, scores, and picks the
    argmax (score DESC, id ASC — numpy's exact-tie min-id rule)."""
    ctes = ["""nrm AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings)""",
        """nn AS MATERIALIZED (
  SELECT vec_id, CASE WHEN sqrt(sum(x*x)) = 0 THEN 1.0
                      ELSE sqrt(sum(x*x)) END AS nv
  FROM nrm GROUP BY 1)""",
        """pts AS MATERIALIZED (
  SELECT n.vec_id AS id, n.dim, n.x / nn.nv AS xn
  FROM nrm n JOIN nn ON nn.vec_id = n.vec_id)""",
        """qraw AS MATERIALIZED (
  SELECT dim, sum(xn)/(SELECT count(*) FROM nn) AS v
  FROM pts GROUP BY 1)""",
        """qv AS MATERIALIZED (
  SELECT dim, v / (CASE WHEN (SELECT sqrt(sum(v*v)) FROM qraw) = 0
                        THEN 1.0
                        ELSE (SELECT sqrt(sum(v*v)) FROM qraw) END) AS q
  FROM qraw)""",
        """rel AS MATERIALIZED (
  SELECT p.id, sum(p.xn * q.q) AS rel
  FROM pts p JOIN qv q ON q.dim = p.dim GROUP BY 1)"""]
    for r in range(1, k + 1):
        if r == 1:
            ctes.append(f"""score_1 AS MATERIALIZED (
  SELECT id, {lam} * rel AS score FROM rel)""")
            ctes.append(f"""pick_1 AS MATERIALIZED (
  SELECT 1 AS rank, id, score FROM score_1
  ORDER BY score DESC, id ASC LIMIT 1)""")
            ctes.append(
                "sel_1 AS MATERIALIZED (SELECT rank, id, score FROM pick_1)")
        else:
            p = r - 1
            ctes += [
                f"""red_{r} AS MATERIALIZED (
  SELECT dp.id, max(dp.d) AS red FROM
    (SELECT p2.id, s.id AS sid, sum(p2.xn * ps.xn) AS d
     FROM pts p2 JOIN sel_{p} s ON true
     JOIN pts ps ON ps.id = s.id AND ps.dim = p2.dim
     GROUP BY 1, 2) dp
  GROUP BY 1)""",
                f"""score_{r} AS MATERIALIZED (
  SELECT r.id, {lam} * r.rel - {round(1 - lam, 12)} * d.red AS score
  FROM rel r JOIN red_{r} d ON d.id = r.id
  WHERE r.id NOT IN (SELECT id FROM sel_{p}))""",
                f"""pick_{r} AS MATERIALIZED (
  SELECT {r} AS rank, id, score FROM score_{r}
  ORDER BY score DESC, id ASC LIMIT 1)""",
                f"""sel_{r} AS MATERIALIZED (
  SELECT * FROM sel_{p} UNION ALL SELECT * FROM pick_{r})""",
            ]
    return "WITH " + ",\n".join(ctes) + f"""
SELECT CAST(rank AS BIGINT) AS rank, id AS vec_id,
       round(score, 6) AS score
FROM sel_{k} ORDER BY rank"""


SQL_MMR_SELECT_EMBEDDINGS = _mmr_select_sql(10, 0.7)


SQL17: Dict[str, str] = {
    "mmr_select_embeddings": SQL_MMR_SELECT_EMBEDDINGS,
    "fisher_exact_orders": SQL_FISHER_EXACT_ORDERS,
    "mcnemar_users": SQL_MCNEMAR_USERS,
    "cohens_kappa_orders": SQL_COHENS_KAPPA_ORDERS,
    "two_prop_ztest_events": SQL_TWO_PROP_ZTEST_EVENTS,
    "cohens_d_value": SQL_COHENS_D_VALUE,
    "poisson_2rate_events": SQL_POISSON_2RATE_EVENTS,
    # mmr_select_embeddings: rows-only by design (greedy iterative)
}
