"""hodges_lehmann_shift selection path: bit-identical to the grid,
bounded memory on continuous (all-distinct) columns.

Round-4 verdict "What's wrong" #1: the finalize used to materialize an
O(d_a*d_b) outer difference grid on one worker — ~n^2 when the value
column is continuous (distinct ~ rows).  The fix selects the two middle
weighted order statistics by float bisection with an exact bracketed
count (stages/stattests.py :: _hl_kth_diff); these tests pin that the
selection result is bit-identical to sorting the full grid, including
adversarial float-rounding cases, and that an all-distinct column well
past the grid threshold completes through the Ray path.
"""
import numpy as np
import pyarrow as pa
import pytest

from datatest_ray.stages.stattests import (
    _HL_GRID_MAX_CELLS,
    _hl_count_le,
    _hl_kth_diff,
    hodges_lehmann_shift,
)


def _grid_kth(va, wa, vb, wb, k):
    diff = (va[:, None] - vb[None, :]).ravel()
    w = (wa[:, None] * wb[None, :]).ravel()
    order = np.argsort(diff, kind="stable")
    diff, w = diff[order], w[order]
    cum = np.cumsum(w)
    return float(diff[np.searchsorted(cum, k)])


def _suffix(wb):
    return np.concatenate([np.cumsum(wb[::-1])[::-1], np.zeros(1, wb.dtype)])


def _check_case(va, wa, vb, wb, ks=None):
    va = np.asarray(va, np.float64)
    vb = np.asarray(vb, np.float64)
    wa = np.asarray(wa, np.int64)
    wb = np.asarray(wb, np.int64)
    oa, ob = np.argsort(va, kind="stable"), np.argsort(vb, kind="stable")
    va, wa, vb, wb = va[oa], wa[oa], vb[ob], wb[ob]
    total = int(wa.sum()) * int(wb.sum())
    if ks is None:
        ks = sorted({1, (total + 1) // 2, total // 2 + 1, total})
    sfx = _suffix(wb)
    for k in ks:
        got = _hl_kth_diff(va, wa, vb, wb, sfx, k)
        want = _grid_kth(va, wa, vb, wb, k)
        assert got == want, (k, got, want)


def test_selection_matches_grid_random():
    rng = np.random.default_rng(20260821)
    for trial in range(25):
        da = int(rng.integers(1, 60))
        db = int(rng.integers(1, 60))
        va = np.unique(rng.normal(0, 100, da))
        vb = np.unique(rng.normal(5, 100, db))
        wa = rng.integers(1, 9, len(va))
        wb = rng.integers(1, 9, len(vb))
        _check_case(va, wa, vb, wb)


def test_selection_matches_grid_rounding_adversaries():
    # magnitude mismatch: x ~ 1e9 while vb values are ulp-close — the
    # naive searchsorted(vb, va - x) miscounts here; the bracketed
    # window must not.
    base = 1e9
    vb = base + np.array([0.0, 2.0 ** -22, 2.0 ** -21, 1.0, 1.5])
    va = np.array([-1.0, 0.0, 2.0 ** -23, 0.75, 2.0])
    _check_case(va, [1, 3, 2, 1, 2], vb, [2, 1, 1, 3, 1])
    # ties and duplicated differences across pairs
    va = np.array([0.0, 1.0, 2.0, 3.0])
    vb = np.array([0.5, 1.5, 2.5])
    _check_case(va, [5, 1, 1, 5], vb, [2, 2, 2])
    # subnormal-scale gaps
    tiny = np.float64(5e-324)
    va = np.array([0.0, tiny, 3 * tiny, 10 * tiny])
    vb = np.array([tiny, 2 * tiny])
    _check_case(va, [1, 2, 1, 1], vb, [1, 3])


def test_count_le_exact_on_boundaries():
    rng = np.random.default_rng(7)
    va = np.unique(rng.normal(1e6, 1, 40))
    vb = np.unique(rng.normal(0, 1e-3, 40))
    wa = rng.integers(1, 5, len(va))
    wb = rng.integers(1, 5, len(vb))
    sfx = _suffix(wb)
    diff = (va[:, None] - vb[None, :]).ravel()
    w = (wa[:, None] * wb[None, :]).ravel()
    for x in rng.choice(diff, 30, replace=False):
        assert _hl_count_le(va, wa, vb, wb, sfx, float(x)) == int(
            w[diff <= x].sum())


def test_order_statistic_property_large_all_distinct():
    # d_a * d_b >> grid threshold: the selection path must hold the
    # k-th order-statistic property without ever building the grid.
    rng = np.random.default_rng(99)
    va = np.sort(rng.normal(0, 1, 4000))
    vb = np.sort(rng.normal(0.3, 1, 4000))
    assert len(np.unique(va)) == len(va) and len(np.unique(vb)) == len(vb)
    assert len(va) * len(vb) > _HL_GRID_MAX_CELLS
    wa = np.ones(len(va), np.int64)
    wb = np.ones(len(vb), np.int64)
    sfx = _suffix(wb)
    total = len(va) * len(vb)
    for k in (1, total // 2, total):
        x = _hl_kth_diff(va, wa, vb, wb, sfx, k)
        assert _hl_count_le(va, wa, vb, wb, sfx, x) >= k
        below = float(np.nextafter(x, -np.inf))
        assert _hl_count_le(va, wa, vb, wb, sfx, below) < k


def test_ray_path_all_distinct_continuous(ray_session):
    import ray

    # 6k + 6k all-distinct floats -> 36M grid cells if materialized;
    # the selection path completes and matches a driver-side exact
    # median of pairwise differences computed blockwise.
    rng = np.random.default_rng(20260821)
    na, nb = 6000, 6000
    xa = rng.normal(10.0, 3.0, na)
    xb = rng.normal(9.0, 3.0, nb)
    t = pa.table({
        "g": pa.array(["a"] * na + ["b"] * nb),
        "x": pa.array(np.concatenate([xa, xb])),
    })
    ds = ray.data.from_arrow(t).repartition(8)
    out = hodges_lehmann_shift(ds, value_col="x", group_col="g",
                               a="a", b="b").take_all()
    assert len(out) == 1
    row = out[0]
    assert row["n_a"] == na and row["n_b"] == nb
    assert row["n_pairs"] == na * nb
    # exact reference median via blockwise partial-sort-free counting:
    # np.median over the full pairwise grid in manageable chunks
    diffs = np.sort(
        np.concatenate([xa[i:i + 1000, None] - xb[None, :]
                        for i in range(0, na, 1000)], axis=0).ravel(),
        kind="stable")
    k1 = (na * nb + 1) // 2
    k2 = na * nb // 2 + 1
    want = (diffs[k1 - 1] + diffs[k2 - 1]) / 2.0
    assert row["hl_shift"] == want


@pytest.mark.slow
def test_ray_path_sf01_scale_all_distinct(ray_session):
    """Verdict r4 #1 done-criterion: an all-distinct float column at
    sf0.1 scale (600k rows -> 9e10 virtual grid cells) completes with
    bounded finalize memory and holds the order-statistic property."""
    import ray

    rng = np.random.default_rng(5150)
    na = nb = 300_000
    xa = rng.normal(100.0, 25.0, na)
    xb = rng.normal(98.0, 25.0, nb)
    assert len(np.unique(xa)) == na and len(np.unique(xb)) == nb
    t = pa.table({
        "g": pa.array(["a"] * na + ["b"] * nb),
        "x": pa.array(np.concatenate([xa, xb])),
    })
    ds = ray.data.from_arrow(t).repartition(16)
    out = hodges_lehmann_shift(ds, value_col="x", group_col="g",
                               a="a", b="b").take_all()
    row = out[0]
    assert row["n_pairs"] == na * nb
    # verify the k-th order-statistic property of the reported median
    # directly against the exact bracketed count (no grid anywhere)
    va, vb = np.sort(xa), np.sort(xb)
    wa = np.ones(na, np.int64)
    wb = np.ones(nb, np.int64)
    sfx = np.concatenate([np.cumsum(wb[::-1])[::-1], np.zeros(1, np.int64)])
    total = na * nb
    k1 = (total + 1) // 2
    k2 = total // 2 + 1
    lo = _hl_kth_diff(va, wa, vb, wb, sfx, k1)
    hi = _hl_kth_diff(va, wa, vb, wb, sfx, k2)
    assert row["hl_shift"] == (lo + hi) / 2.0
    assert _hl_count_le(va, wa, vb, wb, sfx, lo) >= k1
    assert _hl_count_le(va, wa, vb, wb, sfx,
                        float(np.nextafter(lo, -np.inf))) < k1
