"""Doctest harness: every docstring example in the package executes
(reference pattern: ``pygsp/tests/test_docstrings.py:51-105``)."""

import doctest
import importlib
import pkgutil

import pytest

import pygsp_tpu

MODULES = []
for info in pkgutil.walk_packages(pygsp_tpu.__path__,
                                  prefix='pygsp_tpu.'):
    MODULES.append(info.name)


@pytest.mark.parametrize('name', MODULES)
def test_module_doctests(name):
    try:
        mod = importlib.import_module(name)
    except ImportError as e:
        pytest.skip(f'optional import failed: {e}')
    results = doctest.testmod(mod, optionflags=doctest.ELLIPSIS
                              | doctest.NORMALIZE_WHITESPACE)
    assert results.failed == 0, f'{results.failed} doctest failures in {name}'
