"""Docs are tests (reference pattern, ``test_docstrings.py:108-163``):
every python block in the tutorials must execute with its assertions."""

import glob
import os
import re

import pytest

TUTORIALS = sorted(glob.glob(os.path.join(
    os.path.dirname(__file__), '..', 'doc', 'tutorials', '*.md')))


def _code_blocks(path):
    text = open(path).read()
    return re.findall(r'```python\n(.*?)```', text, flags=re.DOTALL)


@pytest.mark.parametrize('path', TUTORIALS,
                         ids=[os.path.basename(p) for p in TUTORIALS])
def test_tutorial_blocks(path):
    blocks = _code_blocks(path)
    assert blocks, f'no python blocks in {path}'
    ns = {}
    for block in blocks:
        exec(compile(block, path, 'exec'), ns)
