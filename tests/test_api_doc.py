"""docs/API.md examples are executable (round-4 verdict item #6).

Extracts every fenced ```python block from the doc, concatenates them
in order, and runs them in one namespace against the live test Ray
session — the doc cannot drift from the code.
"""
import os
import re

import pytest

DOC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "API.md")


def _blocks():
    src = open(DOC).read()
    return re.findall(r"```python\n(.*?)```", src, flags=re.S)


@pytest.mark.slow
def test_api_doc_examples_run(ray_session):
    blocks = _blocks()
    assert len(blocks) >= 5, "doc lost its examples"
    ns: dict = {}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"docs/API.md[block {i}]", "exec"), ns)
        except Exception as e:  # pragma: no cover - assertion carrier
            raise AssertionError(
                f"docs/API.md block {i} failed: {type(e).__name__}: {e}\n"
                f"---\n{block}") from e
