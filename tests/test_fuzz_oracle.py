"""Randomized cross-engine parity: generate a seeded random mini star
schema with ADVERSARIAL edge cases the fixed testdata lacks — click-only
users (as-of/funnel empty-right), single-event users, timestamp ties,
empty and whitespace-only documents, exact- and near-duplicate texts,
orphan foreign keys, line items shipped before their order date,
customers with zero orders — and run EVERY oracle-paired driver query
against DuckDB on it.  This is the defense against "passes by luck on
this testdata" divergences (the class ADVICE.md round 1 flagged)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

# slow tier: a full 462-pair cross-engine replay (~3 min); part of the
# per-round fuzz campaign, not the inner loop
pytestmark = pytest.mark.slow

# default seed is pinned for CI determinism; set GRAFT_FUZZ_SEED to
# probe other corpora (each regenerates the schema and reruns every
# oracle-paired query)
SEED = int(os.environ.get("GRAFT_FUZZ_SEED", "20260817"))
US = 1_000_000
DAY_US = 86_400_000_000

LANGS = ["en", "de", "zh", "fr", "es"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
WORDS = ("the fast key order sort table scan merge part window small hash "
         "join data slow filter customer line batch value group query row "
         "spark today tonight material entirely unrelated words").split()


def _ts(us_array):
    return pa.array(np.asarray(us_array, dtype=np.int64),
                    pa.int64()).cast(pa.timestamp("us"))


def _r2(rng, lo, hi, n):
    return np.round(rng.uniform(lo, hi, n), 2)


def _gen(out_dir: str):
    rng = np.random.RandomState(SEED)

    pq.write_table(pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": pa.array(REGIONS),
    }), f"{out_dir}/region.parquet")

    n_nat = 25
    pq.write_table(pa.table({
        "n_nationkey": pa.array(np.arange(n_nat, dtype=np.int32)),
        "n_name": pa.array([f"NATION_{i}" for i in range(n_nat)]),
        "n_regionkey": pa.array(rng.randint(0, 5, n_nat).astype(np.int32)),
    }), f"{out_dir}/nation.parquet")

    n_cust = 300
    c_nat = rng.randint(0, n_nat, n_cust)
    c_nat[:3] = [25, 26, 27]          # orphan FKs → subset violations
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(1, n_cust + 1)),
        "c_name": pa.array([f"Customer#{i}" for i in range(1, n_cust + 1)]),
        "c_nationkey": pa.array(c_nat.astype(np.int32)),
        "c_acctbal": pa.array(_r2(rng, -999, 9999, n_cust),
                              mask=rng.rand(n_cust) < 0.03),
        "c_mktsegment": pa.array(rng.choice(SEGMENTS, n_cust)),
    }), f"{out_dir}/customer.parquet")

    n_supp = 40
    pq.write_table(pa.table({
        "s_suppkey": pa.array(np.arange(1, n_supp + 1)),
        "s_name": pa.array([f"Supplier#{i}" for i in range(1, n_supp + 1)]),
        "s_nationkey": pa.array(rng.randint(0, n_nat, n_supp).astype(
            np.int32)),
        "s_acctbal": pa.array(_r2(rng, -999, 9999, n_supp)),
    }), f"{out_dir}/supplier.parquet")

    n_part = 80
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(1, n_part + 1)),
        "p_name": pa.array([" ".join(rng.choice(WORDS, 3))
                            for _ in range(n_part)]),
        "p_brand": pa.array([f"Brand#{rng.randint(1, 26)}"
                             for _ in range(n_part)]),
        "p_type": pa.array(rng.choice(PTYPES, n_part)),
        "p_size": pa.array(rng.randint(1, 51, n_part).astype(np.int32)),
        "p_retailprice": pa.array(_r2(rng, 900, 2000, n_part)),
    }), f"{out_dir}/part.parquet")

    n_ord = 500
    base_1995 = int(pd.Timestamp("1995-01-01").value // 1000)
    o_date_us = base_1995 + rng.randint(0, 2400, n_ord).astype(
        np.int64) * DAY_US
    # only ~2/3 of customers ever order → fanout zeros exercised
    o_cust = rng.randint(1, int(n_cust * 2 / 3), n_ord)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(1, n_ord + 1)),
        "o_custkey": pa.array(o_cust),
        "o_orderstatus": pa.array(rng.choice(["F", "O", "P"], n_ord)),
        "o_totalprice": pa.array(_r2(rng, 1000, 499999, n_ord)),
        "o_orderdate": _ts(o_date_us),
        "o_orderpriority": pa.array(rng.choice(PRIORITIES, n_ord)),
    }), f"{out_dir}/orders.parquet")

    n_li = 2000
    li_ord = rng.randint(1, n_ord + 1, n_li)
    ship_off = rng.randint(1, 121, n_li).astype(np.int64)
    ship_off[:60] = -rng.randint(1, 30, 60)   # shipped BEFORE order date
    ship_us = o_date_us[li_ord - 1] + ship_off * DAY_US
    pq.write_table(pa.table({
        "l_orderkey": pa.array(li_ord),
        "l_partkey": pa.array(rng.randint(1, n_part + 1, n_li)),
        "l_suppkey": pa.array(rng.randint(1, n_supp + 1, n_li)),
        "l_linenumber": pa.array(rng.randint(1, 8, n_li).astype(np.int32)),
        "l_quantity": pa.array(rng.randint(1, 51, n_li).astype(np.float64)),
        "l_extendedprice": pa.array(_r2(rng, 901, 104999, n_li)),
        "l_discount": pa.array(np.round(rng.uniform(0, 0.1, n_li), 2),
                               mask=rng.rand(n_li) < 0.02),
        "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n_li), 2)),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n_li)),
        "l_linestatus": pa.array(rng.choice(["F", "O"], n_li)),
        "l_shipdate": _ts(ship_us),
    }), f"{out_dir}/lineitem.parquet")

    # events: 40 users; user 1 has ONE event; users 2-5 click-only (no
    # purchase — the as-of empty-right edge); ties on (user, ts)
    n_ev = 2500
    base_2024 = int(pd.Timestamp("2024-01-01").value // 1000)
    users = rng.randint(6, 41, n_ev)
    types = rng.choice(EVENT_TYPES, n_ev)
    ts_us = base_2024 + rng.randint(0, 30 * 86400, n_ev).astype(
        np.int64) * US
    users[:1] = 1
    users[1:9] = rng.choice([2, 3, 4, 5], 8)
    types[:9] = "click"
    ts_us[10] = ts_us[11] = ts_us[12]          # same-ts ties (users differ)
    ts_us[20] = ts_us[21]                      # possible same-user tie
    users[20] = users[21] = 7
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(1, n_ev + 1)),
        "ts": _ts(ts_us),
        "user_id": pa.array(users),
        "event_type": pa.array(types),
        # ~3% null values: real event streams have them, the fixed
        # driver testdata does not — null-vs-SQL semantics get fuzzed
        "value": pa.array(_r2(rng, 0.01, 300, n_ev),
                          mask=rng.rand(n_ev) < 0.03),
        "props": pa.array(['{"k": %d}' % rng.randint(0, 100)
                           for _ in range(n_ev)]),
    }), f"{out_dir}/events.parquet")

    # documents: empty + whitespace-only + exact dups + near dups
    n_doc = 150
    texts = [" ".join(rng.choice(WORDS, rng.randint(5, 30)))
             for _ in range(n_doc)]
    texts[0] = ""                       # empty (ADVICE empty-token guard)
    texts[1] = "   "                    # whitespace-only
    texts[2] = texts[3] = texts[4]      # exact duplicates
    texts[10] = texts[11] + " extra"    # near duplicate
    # tab/newline-edged + interior runs (round-4 ADVICE: DuckDB's
    # one-arg trim strips only spaces, so edge \t\n used to leave
    # empty tokens in every string_split_regex oracle mirror)
    texts[12] = "\t" + texts[13] + " \n"
    texts[14] = "\t \n  "               # whitespace-only, non-space edges
    texts[15] = "alpha\t\tbeta\ngamma \t delta"
    langs = rng.choice(LANGS, n_doc)
    langs[5:7] = "xx"                   # out-of-domain lang
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(1, n_doc + 1)),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array([f"src{rng.randint(0, 20)}"
                            for _ in range(n_doc)]),
        "n_chars": pa.array(np.array([len(t) for t in texts])),
    }), f"{out_dir}/documents.parquet")

    n_emb = 120
    M = rng.normal(size=(n_emb, 64)).astype(np.float32)
    M[5] = M[6]                          # exact duplicate vector
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(1, n_emb + 1)),
        "embedding": pa.array(list(M), pa.list_(pa.float32())),
        "label": pa.array(rng.randint(0, 10, n_emb).astype(np.int32)),
    }), f"{out_dir}/embeddings.parquet")


def _carve_empty_subsets(out_dir: str) -> None:
    """Optional adversarial carving (GRAFT_FUZZ_CARVE=1): remove every
    ASIA-region supplier and drop one event type so literal-filter and
    complete-block queries hit genuinely EMPTY subsets — the shape that
    exposed the skipped-finalize / unknown-schema crash class (quade,
    pages_l, q5_star_revenue; round 3)."""
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    nat = _pq.read_table(f"{out_dir}/nation.parquet").to_pandas()
    asia = nat[nat.n_regionkey == 2].n_nationkey
    sup = _pq.read_table(f"{out_dir}/supplier.parquet")
    _pq.write_table(sup.filter(_pc.invert(_pc.is_in(
        sup.column("s_nationkey"),
        pa.array(list(asia), sup.column("s_nationkey").type)))),
        f"{out_dir}/supplier.parquet")
    ev = _pq.read_table(f"{out_dir}/events.parquet")
    _pq.write_table(
        ev.filter(_pc.not_equal(ev.column("event_type"), "signup")),
        f"{out_dir}/events.parquet")


def _carve_hot_key_skew(out_dir: str) -> None:
    """GRAFT_FUZZ_CARVE=3: additionally concentrate ~99% of events on
    ONE user and ~60% of lineitem on ONE supplier — the hot-key shape
    the salting paths (stages/salting.py) and skew-aware join exist
    for.  Every per-user / per-supplier oracle pair must stay exact
    under extreme skew (round-4 verdict item #5)."""
    import pyarrow.parquet as _pq

    ev = _pq.read_table(f"{out_dir}/events.parquet").to_pandas()
    rng = np.random.RandomState(777)
    hot = rng.rand(len(ev)) < 0.99
    # keep rows 0-8 (the one-event user / click-only users: fixtures
    # other tests rely on), then flood the rest onto user 39
    hot[:9] = False
    ev.loc[hot, "user_id"] = 39
    _pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                    f"{out_dir}/events.parquet")
    li = _pq.read_table(f"{out_dir}/lineitem.parquet").to_pandas()
    li.loc[rng.rand(len(li)) < 0.6, "l_suppkey"] = 1
    _pq.write_table(pa.Table.from_pandas(li, preserve_index=False),
                    f"{out_dir}/lineitem.parquet")


def _carve_null_tiny_keys(out_dir: str) -> None:
    """GRAFT_FUZZ_CARVE=4: additionally NULL the value of every event
    of the tiny users (1-5) — so every per-user float kernel confronts
    keys whose values are ALL null.  SQL mirrors drop such keys at
    ``WHERE value IS NOT NULL`` before GROUP BY; engine kernels must
    match (the class fuzz seed 777777 + carve=3 exposed in
    durbin_watson / ewma: round-5)."""
    import pyarrow.parquet as _pq

    ev = _pq.read_table(f"{out_dir}/events.parquet").to_pandas()
    ev.loc[ev["user_id"] <= 5, "value"] = None
    _pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                    f"{out_dir}/events.parquet")


def _carve_permute_region(out_dir: str) -> None:
    """GRAFT_FUZZ_CARVE=2: additionally permute the region-name ↔
    regionkey assignment so order_region's documented consistent-order
    assumption is VIOLATED — the engine's difflib OrderCheck would emit
    transposition diffs no set-difference SQL can mirror, so both the
    engine wrapper and the SQL must detect the inversions and emit the
    identical self-describing 'order_inconsistent' sentinel row
    (round-3 ADVICE item on SQL_ORDER_REGION)."""
    import pyarrow.parquet as _pq

    t = _pq.read_table(f"{out_dir}/region.parquet")
    names = t.column("r_name").to_pylist()
    perm = [names[i] for i in (2, 0, 3, 1, 4)]
    _pq.write_table(pa.table({
        "r_regionkey": t.column("r_regionkey"),
        "r_name": pa.array(perm),
    }), f"{out_dir}/region.parquet")


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fuzz_sf"))
    _gen(d)
    carve = os.environ.get("GRAFT_FUZZ_CARVE")
    if carve:
        _carve_empty_subsets(d)
        if carve in ("2", "3", "4"):
            _carve_permute_region(d)
        if carve in ("3", "4"):
            _carve_hot_key_skew(d)
        if carve == "4":
            _carve_null_tiny_keys(d)
    return d


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def test_all_oracle_pairs_on_random_data(ray_session, fuzz_dir):
    import duckdb
    import ray.data

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{fuzz_dir}/{t}.parquet')")

    q, o = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in q.items():
        if name not in o:
            continue
        try:
            got = fn(fuzz_dir)
            if isinstance(got, ray.data.Dataset):
                got = got.to_pandas()
            elif hasattr(got, "to_pandas"):
                got = got.to_pandas()
            want = con.sql(o[name]).df()
            pd.testing.assert_frame_equal(
                _canon(got), _canon(want), check_dtype=False, rtol=1e-6,
                atol=1e-9)
        except Exception as err:
            failures.append(f"{name}: {type(err).__name__}: "
                            f"{str(err).splitlines()[0][:200]}")
    assert not failures, "\n".join(failures)
