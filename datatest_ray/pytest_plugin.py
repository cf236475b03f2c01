"""datatest-style pytest integration (SURVEY.md §2.G).

Behavior-equivalent re-implementation of the upstream vendored plugin
(public ``shawnbrown/datatest`` 0.11.1, ``datatest/_pytest_plugin.py``):

* ``@pytest.mark.mandatory`` — when a mandatory-marked test fails (or
  errors during setup), the session stops early: later tests are not
  run.  Data-wrangling suites use this for prerequisite checks (e.g.
  "the fixture table loaded at all") whose failure makes every
  downstream validation meaningless.  ``--ignore-mandatory`` disables
  the early exit for debugging.
* verbosity-aware ``ValidationError`` reprs — at ``-v`` and above the
  truncated difference-list repr (``ValidationError._max_repr``
  elision / ``_should_truncate`` hook, differences.py) is turned off so
  the full difference list prints.

Not auto-registered (this engine's own suite runs plain pytest per the
driver contract).  Enable per-project with either::

    pytest -p datatest_ray.pytest_plugin ...

or in ``conftest.py``::

    pytest_plugins = ["datatest_ray.pytest_plugin"]
"""

from __future__ import annotations

import pytest


def pytest_addoption(parser):
    group = parser.getgroup("mandatory")
    group.addoption(
        "--ignore-mandatory",
        action="store_true",
        default=False,
        help=("continue the session even when a @pytest.mark.mandatory "
              "test fails (datatest-style early exit disabled)"),
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "mandatory: stop the test session early when this test fails "
        "(datatest-style prerequisite check)",
    )
    if config.getoption("verbose", 0) > 0:
        from datatest_ray.differences import ValidationError

        # full difference list at -v; the default elision otherwise
        ValidationError._should_truncate = staticmethod(
            lambda line_count, char_count: False)


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_makereport(item, call):
    outcome = yield
    report = outcome.get_result()
    if (
        report.failed
        and report.when in ("setup", "call")
        and item.get_closest_marker("mandatory") is not None
        and not item.config.getoption("--ignore-mandatory")
    ):
        item.session.shouldstop = (
            f"mandatory test failed: {item.nodeid} — stopping early "
            "(use --ignore-mandatory to continue)"
        )
