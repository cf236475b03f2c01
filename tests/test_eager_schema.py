"""Round-4 verdict item #8: the lazy violations Dataset returned by
``CheckSuite.run`` must resolve ``.schema()`` to VIOLATION_SCHEMA even
on empty inputs, without the caller materializing via ``to_table()``.
The union is seeded with a known-schema empty block, so Ray answers the
schema probe from that block instead of returning ``None``."""

from __future__ import annotations

import pyarrow as pa


def test_violations_schema_eager_on_empty_input(ray_session):
    import ray.data as rd

    from datatest_ray import CheckSuite, IntervalCheck, RunContext, UniqueCheck
    from datatest_ray.differences import VIOLATION_SCHEMA

    empty = rd.from_arrow(pa.table({"x": pa.array([], pa.int64())}))
    res = CheckSuite(
        [IntervalCheck("x", min=0, max=5), UniqueCheck("x")], RunContext()
    ).run(empty)
    s = res.violations.schema()
    assert s is not None
    assert list(s.names) == list(VIOLATION_SCHEMA.names)
    assert res.to_table().num_rows == 0


def test_violations_schema_eager_on_nonempty_input(ray_session):
    import ray.data as rd

    from datatest_ray import CheckSuite, IntervalCheck, RunContext
    from datatest_ray.differences import VIOLATION_SCHEMA

    ds = rd.from_items([{"x": i} for i in range(10)])
    res = CheckSuite([IntervalCheck("x", min=0, max=5)], RunContext()).run(ds)
    assert list(res.violations.schema().names) == list(VIOLATION_SCHEMA.names)
    assert res.to_table().num_rows == 4
