"""Mergeable sketches as Ray Data aggregates (SURVEY.md §2.I).

Not present in the reference (a single-process library with no
aggregation layer — SURVEY.md §2.H); mandated by the north_star:
HyperLogLog for distinct counts, Count-Min + MinHash for phash
uniqueness, t-digest for quantile stats, fixed-bin histograms + a
hand-rolled two-sample KS for distribution drift (no scipy in the
sandbox).

Design: every sketch is a small numpy-backed object with ``update``
(vectorized over a whole Arrow column), ``merge`` (associative,
commutative) and an estimator.  Each gets an ``AggregateFnV2`` adapter
so it runs as ``ds.aggregate(...)`` / ``ds.groupby(k).aggregate(...)``:
one sketch per block, merged in Ray's tree combine — the shuffle moves
sketches (KBs), never rows.  Hashing uses ``pandas.util.hash_array``
(deterministic 64-bit, process-independent) so sketches built on
different workers merge correctly.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "hash64",
    "HyperLogLog",
    "BloomFilter",
    "CountMinSketch",
    "MinHashSignature",
    "SpaceSaving",
    "TDigest",
    "Histogram",
    "ks_statistic_from_histograms",
    "HLLDistinct",
    "TDigestQuantile",
    "SketchAggregate",
    "sketch_loads",
]


def hash64(values) -> np.ndarray:
    """Deterministic uint64 hashes of an Arrow array / numpy array."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        if pa.types.is_integer(values.type) or pa.types.is_floating(values.type):
            np_vals = values.to_numpy(zero_copy_only=False)
        else:
            np_vals = np.asarray(values.to_pylist(), dtype=object)
    else:
        np_vals = np.asarray(values)
    return pd.util.hash_array(np_vals, categorize=False).astype(np.uint64)


def dict_encode_keep_null(arr):
    """``dictionary_encode`` where NULL gets its own (last) code instead
    of a null index — ``np.asarray`` on null indices silently yields
    INT64_MIN, which poisons any ``code*K + other`` cell arithmetic.
    Returns (codes int64 ndarray, dictionary with a trailing null when
    the input had one) so ``pc.take(dictionary, codes)`` round-trips
    nulls and null categories aggregate as their own group, exactly
    like SQL GROUP BY."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    enc = pc.dictionary_encode(arr)
    d = enc.dictionary
    idx = enc.indices
    if idx.null_count:
        idx = idx.fill_null(len(d))
        d = pa.concat_arrays([d, pa.array([None], d.type)])
    return np.asarray(idx, dtype=np.int64), d


# ---------------------------------------------------------------------------
# HyperLogLog (distinct count)
# ---------------------------------------------------------------------------


class HyperLogLog:
    """Classic HLL, p bits of bucket index; merge = lane-wise max."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def update_hashes(self, h: np.ndarray) -> "HyperLogLog":
        p = self.p
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)) >> np.uint64(p)  # low 64-p bits
        # rank = leading-zero count of the (64-p)-bit remainder + 1.
        # 64-p <= 52 for p >= 12, so float64 mantissa holds `rest` exactly.
        restf = rest.astype(np.float64)
        with np.errstate(divide="ignore"):
            bitlen = np.where(rest > 0, np.floor(np.log2(restf)) + 1, 0).astype(np.int64)
        rank = ((64 - p) - bitlen + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def update(self, values) -> "HyperLogLog":
        return self.update_hashes(hash64(values))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        raw = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * m and zeros > 0:
            return m * math.log(m / zeros)  # linear counting
        return float(raw)


# ---------------------------------------------------------------------------
# Bloom filter (approximate membership — no false negatives)
# ---------------------------------------------------------------------------


class BloomFilter:
    """Bit-array Bloom filter; double hashing h1 + i*h2 across k probe
    positions (same scheme as the Count-Min rows).  Merge = bitwise OR,
    so per-block partials combine associatively through a shuffle and
    the finished filter is a compact broadcastable membership oracle —
    the 100 TB pre-filter for referential (subset/anti-join) checks:
    ship ~m/8 bytes once via ``ray.put`` instead of the full key set,
    drop every definitely-absent probe locally, and verify only the
    (no-false-negative) survivors exactly."""

    def __init__(self, n_bits: int = 1 << 20, n_hashes: int = 7):
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.bits = np.zeros(n_bits // 8 + (n_bits % 8 > 0), dtype=np.uint8)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        h1 = h
        h2 = (h >> np.uint64(32)) | np.uint64(1)  # odd
        rows = []
        for i in range(self.n_hashes):
            rows.append(
                ((h1 + np.uint64(i) * h2) % np.uint64(self.n_bits)).astype(
                    np.int64
                )
            )
        return np.concatenate(rows)

    def update(self, values) -> "BloomFilter":
        pos = self._positions(hash64(values))
        np.bitwise_or.at(
            self.bits, pos // 8, (1 << (pos % 8)).astype(np.uint8)
        )
        return self

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        self.bits |= other.bits
        return self

    def might_contain(self, values) -> np.ndarray:
        """Vectorized membership: False is definite, True is probable."""
        h = hash64(values)
        pos = self._positions(h).reshape(self.n_hashes, len(h))
        hit = np.ones(len(h), dtype=bool)
        for i in range(self.n_hashes):
            p = pos[i]
            hit &= (self.bits[p // 8] >> (p % 8).astype(np.uint8)) & 1 == 1
        return hit


# ---------------------------------------------------------------------------
# Count-Min sketch (heavy hitters / frequency)
# ---------------------------------------------------------------------------


class CountMinSketch:
    """d x w counters; double hashing h1 + i*h2 per depth row."""

    def __init__(self, width: int = 2048, depth: int = 5):
        self.width = width
        self.depth = depth
        self.counts = np.zeros((depth, width), dtype=np.int64)

    def _indices(self, h: np.ndarray) -> np.ndarray:
        h1 = h
        h2 = (h >> np.uint64(32)) | np.uint64(1)  # odd
        rows = []
        for i in range(self.depth):
            rows.append(((h1 + np.uint64(i) * h2) % np.uint64(self.width)).astype(np.int64))
        return np.stack(rows)  # (depth, n)

    def update_hashes(self, h: np.ndarray, counts: Optional[np.ndarray] = None):
        idx = self._indices(h)
        add = np.ones(len(h), dtype=np.int64) if counts is None else counts
        for i in range(self.depth):
            np.add.at(self.counts[i], idx[i], add)
        return self

    def update(self, values):
        return self.update_hashes(hash64(values))

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        self.counts += other.counts
        return self

    def query_hashes(self, h: np.ndarray) -> np.ndarray:
        idx = self._indices(h)
        est = self.counts[0][idx[0]]
        for i in range(1, self.depth):
            est = np.minimum(est, self.counts[i][idx[i]])
        return est

    def query(self, values) -> np.ndarray:
        return self.query_hashes(hash64(values))


# ---------------------------------------------------------------------------
# MinHash signatures (set similarity)
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


class MinHashSignature:
    """k-permutation MinHash over a SET of element hashes; merge =
    lane-wise min (signature of the union)."""

    def __init__(self, k: int = 128, seed: int = 7):
        self.k = k
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, size=k, dtype=np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, size=k, dtype=np.uint64)
        self.sig = np.full(k, np.iinfo(np.uint64).max, dtype=np.uint64)

    @staticmethod
    def signature_matrix(elem_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """min over elements of (a*h + b) mod M, per permutation lane."""
        if len(elem_hashes) == 0:
            return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
        h = elem_hashes.astype(np.uint64)[:, None]  # (n, 1)
        vals = (h * a[None, :] + b[None, :]) % _MERSENNE  # (n, k)
        return vals.min(axis=0)

    def update_hashes(self, elem_hashes: np.ndarray) -> "MinHashSignature":
        sig = self.signature_matrix(elem_hashes, self.a, self.b)
        np.minimum(self.sig, sig, out=self.sig)
        return self

    def merge(self, other: "MinHashSignature") -> "MinHashSignature":
        np.minimum(self.sig, other.sig, out=self.sig)
        return self

    @staticmethod
    def jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
        return float((sig_a == sig_b).mean())


# ---------------------------------------------------------------------------
# SpaceSaving (mergeable top-k heavy hitters WITH count bounds)
# ---------------------------------------------------------------------------


class SpaceSaving:
    """Mergeable top-k frequency summary (Metwally et al. SpaceSaving,
    merge per Agarwal et al. "Mergeable Summaries").  Each kept item
    carries (count upper bound, error) with true_count in
    [count - err, count]; an item is a GUARANTEED heavy hitter when
    ``count - err`` beats every dropped item's bound.

    Unlike Count-Min (which answers point queries but can't ENUMERATE
    the heavy hitters without a candidate set), SpaceSaving carries its
    own top-k — the right shape for "what are the k hottest keys"
    across a shuffle: per-block summaries merge associatively, K items
    each, so the exchange moves O(K) rows per block.

    Batch update: a block's exact value_counts fold in as a merge of an
    exact summary (err=0), vectorized via Arrow value_counts — no
    per-row Python.
    """

    def __init__(self, k: int = 64):
        self.k = k
        self.counts: dict = {}  # value -> [count_upper, err]
        self.floor = 0  # upper bound for any value NOT in the summary

    @property
    def evicted(self) -> bool:
        """True iff an eviction has fired anywhere in this summary's
        history (directly or in a merged-in partial) — i.e. counts are
        upper BOUNDS now, not exact.  ``floor`` only leaves 0 on
        truncation and merges propagate it, so this is exactly the
        exact-regime/approximate-regime boundary the SQL-paired
        wrappers key their capacity-exceeded sentinel on."""
        return self.floor > 0

    def _truncate(self) -> None:
        if len(self.counts) <= self.k:
            return
        items = sorted(self.counts.items(),
                       key=lambda kv: (-kv[1][0], str(kv[0])))
        evict_bound = items[self.k][1][0]
        self.floor = max(self.floor, evict_bound)
        self.counts = {v: ce for v, ce in items[:self.k]}

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        """Mergeable-summaries rule: a value absent from one side
        contributes that side's floor as both count and error."""
        f1, f2 = self.floor, other.floor
        merged: dict = {}
        for v in set(self.counts) | set(other.counts):
            c1, e1 = self.counts.get(v, (f1, f1))
            c2, e2 = other.counts.get(v, (f2, f2))
            merged[v] = [c1 + c2, e1 + e2]
        self.counts = merged
        self.floor = f1 + f2
        self._truncate()
        return self

    def update(self, values) -> "SpaceSaving":
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if not isinstance(values, pa.Array):
            values = pa.array(np.asarray(values))
        vc = values.drop_null().value_counts()
        exact = SpaceSaving(self.k)
        exact.counts = {
            v: [int(c), 0]
            for v, c in zip(vc.field("values").to_pylist(),
                            vc.field("counts").to_pylist())
        }
        # exact side has floor 0 and MAY exceed k; merge then truncates
        exact.k = max(self.k, len(exact.counts))
        return self.merge(exact)

    def topk(self, k: Optional[int] = None):
        """[(value, count_upper, err)] sorted by count desc, value asc
        (deterministic).  true_count ∈ [count - err, count]."""
        items = sorted(self.counts.items(),
                       key=lambda kv: (-kv[1][0], str(kv[0])))
        k = k or self.k
        return [(v, c, e) for v, (c, e) in items[:k]]


# ---------------------------------------------------------------------------
# t-digest (quantiles)
# ---------------------------------------------------------------------------


class TDigest:
    """Merging t-digest with the k1 scale bound; centroids kept sorted."""

    def __init__(self, compression: float = 200.0):
        self.compression = compression
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)

    def update(self, values) -> "TDigest":
        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            values = values.to_numpy(zero_copy_only=False)
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return self
        self.means = np.concatenate([self.means, v])
        self.weights = np.concatenate([self.weights, np.ones(len(v))])
        if len(self.means) > 8 * self.compression:
            self._compress()
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self._compress()
        return self

    def _compress(self) -> None:
        if len(self.means) == 0:
            return
        order = np.argsort(self.means, kind="stable")
        means, weights = self.means[order], self.weights[order]
        total = weights.sum()
        out_m, out_w = [], []
        cur_m, cur_w = means[0], weights[0]
        cum = 0.0
        delta = self.compression
        for m, w in zip(means[1:], weights[1:]):
            q = (cum + cur_w / 2) / total
            limit = 4 * total * q * (1 - q) / delta
            if cur_w + w <= max(limit, 1.0):
                cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
                cur_w += w
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                cum += cur_w
                cur_m, cur_w = m, w
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    def quantile(self, q: float) -> float:
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        cum = np.cumsum(self.weights) - self.weights / 2
        target = q * self.weights.sum()
        return float(np.interp(target, cum, self.means))


# ---------------------------------------------------------------------------
# Fixed-bin histogram + KS
# ---------------------------------------------------------------------------


class Histogram:
    """Fixed-range histogram with under/overflow bins; merge = add."""

    def __init__(self, lo: float, hi: float, bins: int = 64):
        self.lo, self.hi, self.bins = lo, hi, bins
        self.counts = np.zeros(bins + 2, dtype=np.int64)  # [under, bins..., over]

    def update(self, values) -> "Histogram":
        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            values = values.to_numpy(zero_copy_only=False)
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        idx = np.floor((v - self.lo) / (self.hi - self.lo) * self.bins).astype(np.int64)
        idx = np.clip(idx + 1, 0, self.bins + 1)
        np.add.at(self.counts, idx, 1)
        return self

    def merge(self, other: "Histogram") -> "Histogram":
        self.counts += other.counts
        return self


def ks_statistic_from_histograms(a: np.ndarray, b: np.ndarray) -> float:
    """Two-sample KS D-statistic from aligned histogram counts (the
    ECDFs are step functions over shared bin edges)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if a.sum() == 0 or b.sum() == 0:
        return 0.0
    ca = np.cumsum(a) / a.sum()
    cb = np.cumsum(b) / b.sum()
    return float(np.abs(ca - cb).max())


def ks_threshold(n1: float, n2: float, alpha: float = 0.01) -> float:
    """Critical D for the two-sample KS test at level alpha."""
    if n1 <= 0 or n2 <= 0:
        return 1.0
    c = math.sqrt(-0.5 * math.log(alpha / 2.0))
    return c * math.sqrt((n1 + n2) / (n1 * n2))


# ---------------------------------------------------------------------------
# AggregateFnV2 adapters
# ---------------------------------------------------------------------------

from ray import cloudpickle  # noqa: E402
from ray.data.aggregate import AggregateFnV2  # noqa: E402
from ray.data.block import BlockAccessor  # noqa: E402


def _column_from_block(block, on: str) -> pa.ChunkedArray:
    t = BlockAccessor.for_block(block).to_arrow()
    return t.column(on)


class HLLDistinct(AggregateFnV2):
    """Approximate COUNT DISTINCT via HyperLogLog; accumulator =
    register array; combine = lane-wise max."""

    def __init__(self, on: str, p: int = 12, alias_name: Optional[str] = None):
        self._p = p
        super().__init__(
            alias_name or f"hll_distinct({on})",
            zero_factory=lambda: np.zeros(1 << p, dtype=np.uint8),
            on=on,
            ignore_nulls=True,
        )

    def aggregate_block(self, block):
        col = _column_from_block(block, self.get_target_column())
        hll = HyperLogLog(self._p)
        hll.update(col.drop_null())
        return hll.registers

    def combine(self, current, new):
        return np.maximum(current, new)

    def finalize(self, accumulator):
        hll = HyperLogLog(self._p)
        hll.registers = accumulator
        return hll.estimate()


class TDigestQuantile(AggregateFnV2):
    """Approximate quantile via a mergeable t-digest.

    The accumulator is a plain ``(2, n)`` float64 array (means row,
    weights row) so Ray can hold it in Arrow blocks between combines."""

    def __init__(self, on: str, q: float = 0.5, compression: float = 200.0,
                 alias_name: Optional[str] = None):
        self._q = q
        self._compression = compression
        super().__init__(
            alias_name or f"tdigest_q{q}({on})",
            zero_factory=lambda: np.zeros((2, 0), dtype=np.float64),
            on=on,
            ignore_nulls=True,
        )

    def _to_digest(self, acc: np.ndarray) -> TDigest:
        td = TDigest(self._compression)
        td.means = np.asarray(acc[0], dtype=np.float64)
        td.weights = np.asarray(acc[1], dtype=np.float64)
        return td

    @staticmethod
    def _to_acc(td: TDigest) -> np.ndarray:
        return np.stack([td.means, td.weights])

    def aggregate_block(self, block):
        col = _column_from_block(block, self.get_target_column())
        td = TDigest(self._compression).update(col.drop_null())
        td._compress()
        return self._to_acc(td)

    def combine(self, current, new):
        td = self._to_digest(np.concatenate([np.asarray(current), np.asarray(new)], axis=1))
        td._compress()
        return self._to_acc(td)

    def finalize(self, accumulator):
        return self._to_digest(np.asarray(accumulator)).quantile(self._q)


class SketchAggregate(AggregateFnV2):
    """Generic adapter: any object with update(column)/merge(other).

    Accumulators cross block boundaries as cloudpickled ``bytes`` so
    Ray can store them in a native Arrow binary column — returning the
    raw Python object would hit Arrow type inference, raise, and fall
    back to object-pickled blocks (noisy worker tracebacks, same bytes
    on the wire but via the exception path).  cloudpickle, not stdlib
    pickle: the driver ships this package to workers by value, so the
    class is not importable by name there."""

    def __init__(self, on: str, factory, finalize_fn=None,
                 alias_name: Optional[str] = None):
        self._factory = factory
        self._finalize_fn = finalize_fn
        super().__init__(
            alias_name or f"sketch({on})",
            zero_factory=lambda: cloudpickle.dumps(factory()),
            on=on,
            ignore_nulls=True,
        )

    def aggregate_block(self, block):
        col = _column_from_block(block, self.get_target_column())
        return cloudpickle.dumps(self._factory().update(col.drop_null()))

    def combine(self, current, new):
        return cloudpickle.dumps(
            cloudpickle.loads(current).merge(cloudpickle.loads(new))
        )

    def finalize(self, accumulator):
        if self._finalize_fn is None:
            # Leave the sketch serialized: the finalized value lands in
            # an Arrow block too, and bytes keep that block native.
            # Callers recover the object with ``sketch_loads``.
            return accumulator
        return self._finalize_fn(cloudpickle.loads(accumulator))


def sketch_loads(raw: bytes):
    """Recover the sketch object from a ``SketchAggregate`` result
    produced without a ``finalize_fn``."""
    return cloudpickle.loads(raw)
