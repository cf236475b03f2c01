"""The datatest-style pytest plugin (datatest_ray/pytest_plugin.py):
``@pytest.mark.mandatory`` failure stops the session early;
``--ignore-mandatory`` disables the early exit.  Exercised in real
subprocess pytest sessions over a throwaway test file (no Ray needed)."""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TESTFILE = textwrap.dedent(
    """
    import pytest

    @pytest.mark.mandatory
    def test_prerequisite():
        assert False, "fixture table missing"

    def test_downstream():
        assert True
    """
)


def _run(tmp_path, *extra):
    (tmp_path / "test_mandatory_probe.py").write_text(TESTFILE)
    (tmp_path / "conftest.py").write_text(
        f"import sys\nsys.path.insert(0, {str(REPO)!r})\n"
        "pytest_plugins = ['datatest_ray.pytest_plugin']\n")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    return subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
         str(tmp_path), *extra],
        capture_output=True, text=True, timeout=120, env=env,
        cwd=str(tmp_path),
    )


def test_mandatory_failure_stops_session(tmp_path):
    out = _run(tmp_path)
    assert "1 failed" in out.stdout
    # the downstream test never ran: early session stop
    assert "passed" not in out.stdout
    assert "stopping early" in out.stdout


def test_ignore_mandatory_continues(tmp_path):
    out = _run(tmp_path, "--ignore-mandatory")
    assert "1 failed" in out.stdout
    assert "1 passed" in out.stdout


def test_plain_failure_does_not_stop(tmp_path):
    (tmp_path / "test_plain_probe.py").write_text(textwrap.dedent(
        """
        def test_a():
            assert False

        def test_b():
            assert True
        """
    ))
    (tmp_path / "conftest.py").write_text(
        f"import sys\nsys.path.insert(0, {str(REPO)!r})\n"
        "pytest_plugins = ['datatest_ray.pytest_plugin']\n")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
         str(tmp_path / "test_plain_probe.py")],
        capture_output=True, text=True, timeout=120, env=env,
        cwd=str(tmp_path),
    )
    assert "1 failed, 1 passed" in out.stdout
