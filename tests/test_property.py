"""Property-based tests (hypothesis): the vectorized kernels must agree
with their per-element Python definitions on arbitrary inputs, and the
sketches must stay within their accuracy envelopes."""

import math

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

# no Ray needed: these exercise the pure kernels


# ---------------------------------------------------------------------------
# Predicate compiler: Predicate.mask(arrow array) == [pred(v) for v]
# ---------------------------------------------------------------------------

_scalar = st.one_of(
    st.integers(-1000, 1000),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(alphabet="abcxyz0123456789", max_size=8),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(-50, 50), min_size=1, max_size=60),
       st.integers(-50, 50))
def test_predicate_scalar_mask_matches_python(values, target):
    from datatest_ray.predicate import Predicate

    pred = Predicate(target)
    arr = pa.array(values, pa.int64())
    mask = pred.mask(arr)
    want = np.array([pred(v) for v in values], dtype=bool)
    assert np.array_equal(mask, want)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(alphabet="abcxy", max_size=6), min_size=1, max_size=60),
       st.sets(st.text(alphabet="abcxy", max_size=6), min_size=1, max_size=5))
def test_predicate_set_mask_matches_python(values, domain):
    from datatest_ray.predicate import Predicate

    pred = Predicate(domain)
    arr = pa.array(values, pa.string())
    mask = pred.mask(arr)
    want = np.array([v in domain for v in values], dtype=bool)
    assert np.array_equal(mask, want)
    inv = (~pred).mask(arr)
    assert np.array_equal(inv, ~want)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False), min_size=1, max_size=60),
       st.floats(min_value=-10, max_value=10, allow_nan=False),
       st.floats(min_value=0.1, max_value=20, allow_nan=False))
def test_interval_kernel_matches_python(values, lo, width):
    from datatest_ray.stages.base import RunContext
    from datatest_ray.stages.row_checks import IntervalCheck

    hi = lo + width
    chk = IntervalCheck("v", min=lo, max=hi)
    batch = pa.table({"v": pa.array(values, pa.float64())})
    out = chk.kernel(batch, RunContext())
    want_bad = [v < lo or v > hi for v in values]
    assert out.num_rows == sum(want_bad)
    # every reported deviation equals value - violated bound
    for vn, dv in zip(out.column("value_num").to_pylist(),
                      out.column("deviation").to_pylist()):
        bound = lo if vn < lo else hi
        assert math.isclose(dv, vn - bound, rel_tol=1e-9, abs_tol=1e-9)


# ---------------------------------------------------------------------------
# Sequence alignment (order check) against difflib reference semantics
# ---------------------------------------------------------------------------

@settings(max_examples=150, deadline=None)
@given(st.lists(st.sampled_from("abcde"), max_size=12),
       st.lists(st.sampled_from("abcde"), max_size=12))
def test_order_alignment_round_trip(values, required):
    """Applying the reported extras/missings reconciles the sequences:
    count(values) - extras + missings == count(required) per element."""
    from collections import Counter

    from datatest_ray.stages.order import check_order_sequence

    diffs = check_order_sequence(values, required)
    c = Counter(values)
    for kind, (_i, v) in diffs:
        if kind == "extra":
            c[v] -= 1
        else:
            c[v] += 1
    assert +c == +Counter(required)


# ---------------------------------------------------------------------------
# Sketch accuracy envelopes
# ---------------------------------------------------------------------------

@settings(max_examples=20, deadline=None)
@given(st.integers(100, 20000), st.integers(0, 2**31 - 1))
def test_hll_within_error_bound(n_distinct, seed):
    from datatest_ray.functions.aggregates import HyperLogLog

    rng = np.random.RandomState(seed)
    values = rng.randint(0, 2**62, size=n_distinct)
    # split across 4 "blocks" and merge — the AggregateFnV2 path
    # (update() hashes to full-range uint64; raw 62-bit ints would leave
    # the top bucket bits cold)
    hs = [HyperLogLog(p=12).update(chunk)
          for chunk in np.array_split(values, 4)]
    merged = hs[0]
    for h in hs[1:]:
        merged.merge(h)
    est = merged.estimate()
    true = len(np.unique(values))
    assert abs(est - true) / true < 0.08  # ~1.04/sqrt(4096) = 1.6%, 5x slack


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_tdigest_quantiles_close(seed):
    from datatest_ray.functions.aggregates import TDigest

    rng = np.random.RandomState(seed)
    data = rng.lognormal(3.0, 1.0, size=5000)
    tds = []
    for chunk in np.array_split(data, 5):
        td = TDigest(200.0)
        td.update(chunk)
        tds.append(td)
    merged = tds[0]
    for t in tds[1:]:
        merged.merge(t)
    for q in (0.1, 0.5, 0.9):
        est = merged.quantile(q)
        true = np.quantile(data, q)
        # rank error: the estimate's true rank must be within 2% of q
        rank = (data <= est).mean()
        assert abs(rank - q) < 0.02


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_cms_never_underestimates(seed):
    from datatest_ray.functions.aggregates import CountMinSketch, hash64

    rng = np.random.RandomState(seed)
    values = rng.zipf(1.5, size=3000).astype(np.int64) % 500
    cms = CountMinSketch(width=2048, depth=5)
    cms.update(values)
    uniq, counts = np.unique(values, return_counts=True)
    est = cms.query(uniq)
    assert (est >= counts).all()          # CMS never undercounts
    assert (est - counts).max() <= 3000 * 5 / 2048 * 4  # loose CM bound


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_bloom_no_false_negatives_and_low_fp(seed):
    from datatest_ray.functions.aggregates import BloomFilter

    rng = np.random.RandomState(seed)
    members = rng.randint(0, 10**9, size=2000).astype(np.int64)
    others = rng.randint(10**9, 2 * 10**9, size=2000).astype(np.int64)
    bf = BloomFilter(n_bits=1 << 16, n_hashes=7)
    bf.update(members)
    assert bf.might_contain(members).all()  # never a false negative
    # ~2k keys in 64Kbit with 7 hashes -> theoretical fp ~1%, allow 5%
    assert bf.might_contain(others).mean() < 0.05


def test_bloom_merge_equals_bulk_build():
    from datatest_ray.functions.aggregates import BloomFilter

    a = np.arange(0, 1000, dtype=np.int64)
    b = np.arange(1000, 2000, dtype=np.int64)
    merged = BloomFilter(1 << 14, 5).update(a).merge(
        BloomFilter(1 << 14, 5).update(b))
    bulk = BloomFilter(1 << 14, 5).update(np.arange(0, 2000, dtype=np.int64))
    assert (merged.bits == bulk.bits).all()


def test_bloom_distributed_prefilter(ray_session):
    """The 100 TB referential-check pattern: build the filter as a
    mergeable aggregate over the reference Dataset, broadcast it, drop
    definitely-absent probes locally, verify survivors exactly."""
    import ray
    import ray.data as rd

    from datatest_ray.functions.aggregates import (
        BloomFilter, SketchAggregate, sketch_loads,
    )

    ref = rd.from_arrow(pa.table({"k": list(range(0, 3000, 3))}))
    built = ref.aggregate(SketchAggregate(
        "k", lambda: BloomFilter(1 << 16, 7), alias_name="bloom"))
    bf = sketch_loads(built["bloom"])
    handle = ray.put(bf)

    probes = rd.from_arrow(pa.table({"k": list(range(2995, 3010))}))

    def prefilter(t: pa.Table) -> pa.Table:
        f = ray.get(handle)
        return t.filter(pa.array(f.might_contain(t.column("k"))))

    kept = probes.map_batches(
        prefilter, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    # every true member survives (no false negatives)
    assert {2997} <= set(kept["k"])
    # most non-members are dropped before any exact verification
    assert len(kept) <= 4


def test_grouped_hll_within_bound(ray_session):
    """HLL composes with groupby: per-group estimates land within the
    p=12 error envelope of the exact distinct counts."""
    import ray.data as rd

    from datatest_ray.functions.aggregates import HLLDistinct

    rng = np.random.RandomState(11)
    n = 20000
    g = rng.choice(["a", "b", "c"], n)
    # distinct cardinality differs per group
    v = np.where(g == "a", rng.randint(0, 50, n),
                 np.where(g == "b", rng.randint(0, 500, n),
                          rng.randint(0, 5000, n)))
    import pyarrow as pa

    ds = rd.from_arrow(pa.table({"g": g, "v": v}))
    out = ds.groupby("g").aggregate(
        HLLDistinct(on="v", alias_name="est")).to_pandas()
    import pandas as pd

    exact = pd.DataFrame({"g": g, "v": v}).groupby("g")["v"].nunique()
    for _, row in out.iterrows():
        true = exact[row["g"]]
        assert abs(row["est"] - true) / true < 0.08
