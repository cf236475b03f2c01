"""Package-boundary worker shipping (round-4 verdict item #1).

A driver script run from a foreign cwd (NOT the repo root, NO
``__ray_entry__`` import, NO PYTHONPATH) must be able to
``from datatest_ray import validate`` and run a full Dataset pipeline:
Ray workers in that configuration cannot import ``datatest_ray`` by
reference, so the cloudpickle by-value registration that now lives in
``datatest_ray/__init__.py`` is the only thing keeping the check
kernels deserializable in the workers.

Runs in a subprocess with a scrubbed environment so the parent pytest
session's Ray instance / sys.path cannot leak in.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_foreign_cwd_public_api(tmp_path):
    script = tmp_path / "probe.py"
    script.write_text(textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {str(REPO)!r})
        import ray

        ray.init(address="local", num_cpus=2, include_dashboard=False)
        import ray.data as rd

        from datatest_ray import (
            CheckSuite, Deviation, IntervalCheck, Missing, RunContext,
            ValidationError, accepted, validate,
        )

        # 1) Dataset pipeline: check kernels must ship BY VALUE to the
        #    workers (cwd is a tmp dir, so by-reference import fails).
        ds = rd.from_items([{{"x": i}} for i in range(100)])
        res = CheckSuite([IntervalCheck("x", min=0, max=90)],
                         RunContext()).run(ds)
        t = res.to_table()
        assert t.num_rows == 9, t.num_rows

        # 2) The verdict's exact probe: acceptance algebra over
        #    validate.approx — tolerance consumes the in-range
        #    deviation, the out-of-range one re-raises.
        try:
            with accepted.tolerance(5) | accepted(Missing):
                validate.approx([11.0, 23.0], 10.0)
        except ValidationError as e:
            assert e.differences == [Deviation(13.0, 10.0)], e.differences
        else:
            raise AssertionError("expected ValidationError")
        ray.shutdown()
        print("SHIPPING_OK")
        """
    ))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [sys.executable, str(script)],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    assert "SHIPPING_OK" in out.stdout, (out.stdout[-2000:], out.stderr[-4000:])
