"""Batch 43: largest-remainder and D'Hondt allocation (oracle parity
covered by test_oracle.py; textbook hand cases below)."""

import numpy as np
import pyarrow as pa


def _rows(weights: dict) -> "object":
    """Dataset with `weights[k]` rows of key k."""
    import ray.data as rd

    ks = np.concatenate([np.full(n, k, dtype=np.int64)
                         for k, n in weights.items()])
    return rd.from_arrow(pa.table({"k": pa.array(ks)}))


def _alloc(table: pa.Table) -> dict:
    return dict(zip(table.column("k").to_pylist(),
                    table.column("seats").to_pylist()))


class TestLargestRemainder:
    def test_textbook_case(self, ray_session):
        from datatest_ray.stages.alloc import apportion_largest_remainder

        # quotas 10*{47,29,24}/100 = 4.7, 2.9, 2.4 -> floors 4,2,2;
        # 2 leftovers to the largest remainders .7 and .9
        out = apportion_largest_remainder(
            _rows({1: 47, 2: 29, 3: 24}), key_col="k", seats=10)
        assert _alloc(out) == {1: 5, 2: 3, 3: 2}

    def test_sum_and_tiebreak(self, ray_session):
        from datatest_ray.stages.alloc import apportion_largest_remainder

        # equal weights, 3 keys, 10 seats: floors 3,3,3 and the one
        # leftover goes to the LOWEST key (remainders all equal)
        out = apportion_largest_remainder(
            _rows({5: 7, 6: 7, 7: 7}), key_col="k", seats=10)
        got = _alloc(out)
        assert sum(got.values()) == 10 and got == {5: 4, 6: 3, 7: 3}


class TestDhondt:
    def test_textbook_case(self, ray_session):
        from datatest_ray.stages.alloc import dhondt_seats

        # classic example: 100/80/30/20 votes, 8 seats -> 4/3/1/0
        out = dhondt_seats(
            _rows({1: 100, 2: 80, 3: 30, 4: 20}), key_col="k", seats=8)
        got = _alloc(out)
        assert got == {1: 4, 2: 3, 3: 1}  # key 4 wins nothing
        assert sum(got.values()) == 8

    def test_favors_large_vs_hamilton(self, ray_session):
        from datatest_ray.stages.alloc import (
            apportion_largest_remainder, dhondt_seats)

        w = {1: 880, 2: 70, 3: 50}
        dh = _alloc(dhondt_seats(_rows(w), key_col="k", seats=10))
        lr = _alloc(apportion_largest_remainder(
            _rows(w), key_col="k", seats=10))
        assert dh[1] >= lr[1]  # D'Hondt never gives the largest less
        assert sum(dh.values()) == sum(lr.values()) == 10

    def test_seats_cap(self, ray_session):
        import pytest

        from datatest_ray.stages.alloc import dhondt_seats

        with pytest.raises(ValueError):
            dhondt_seats(_rows({1: 2}), key_col="k", seats=21)
