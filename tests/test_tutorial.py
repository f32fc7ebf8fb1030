"""Executable documentation: every ```python block in docs/tutorial.md runs,
in order, in one shared namespace (VERDICT r1 #9 — the reference ships a
getting-started notebook; this keeps ours permanently green)."""
import os
import re

import pytest

_TUTORIAL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "tutorial.md")


def _blocks():
    text = open(_TUTORIAL).read()
    return re.findall(r"```python\n(.*?)```", text, flags=re.DOTALL)


BLOCKS = _blocks()


def test_tutorial_has_blocks():
    assert len(BLOCKS) >= 10


def test_tutorial_blocks_execute():
    ns: dict = {}
    for i, block in enumerate(BLOCKS):
        try:
            exec(compile(block, f"tutorial.md[block {i}]", "exec"), ns)
        except Exception as e:  # pragma: no cover
            pytest.fail(f"tutorial block {i} failed: {type(e).__name__}: {e}\n"
                        f"---\n{block}")
