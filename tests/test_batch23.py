"""Batch 23: quota acceptances under the oracle (consume-order parity
covered by test_oracle.py; these pin the composition semantics)."""

from datatest_ray.differences import violations_table


def _vtable(values):
    """Minimal violations table: one deviation row per value, single
    check/partition, null row_ref (the consume order then falls to the
    stringified value)."""
    vals = [float(v) for v in values]
    return violations_table(
        len(vals), check_id="interval(q,1,30)", partition_id="p0",
        kind="deviation", value=[str(v) for v in vals], value_num=vals,
        expected="30", expected_num=30.0,
        deviation=[v - 30.0 for v in vals])


class TestQuotaAcceptances:
    def test_count_consumes_in_value_string_order(self):
        from datatest_ray.pipelines.acceptance import accepted

        # string order of values: '100.0' < '31.0' < '45.0' < '9000.0'
        t = _vtable([31.0, 100.0, 45.0, 9000.0])
        left = accepted.count(2).filter_violations(t)
        vals = sorted(left.column("value_num").to_pylist())
        # consumed: 100.0 and 31.0 (first two in string order)
        assert vals == [45.0, 9000.0]

    def test_union_left_side_consumes_first(self):
        from datatest_ray.pipelines.acceptance import accepted

        # 33.0 within tolerance(5) -> accepted by the LEFT side; the
        # count(1) quota must then still cover one of the big ones
        t = _vtable([33.0, 100.0, 45.0])
        acc = accepted.tolerance(5) | accepted.count(1)
        left = acc.filter_violations(t)
        vals = sorted(left.column("value_num").to_pylist())
        # '100.0' < '45.0' in string order -> 100.0 consumed by count
        assert vals == [45.0]
