"""API-surface audit: every public name the reference exports exists here.

Walks the live reference package (the ``pygsp_ref`` fixture) and asserts
each public class/function it defines — module level, plus every public
``Graph``/``Filter`` attribute — resolves on the corresponding
``pygsp_tpu`` module. This codifies the parity the component inventory
(STATUS.md) claims, so a refactor can't silently drop reference API.
"""

import inspect

import pytest

import pygsp_tpu


def _public_names(mod, pkg_prefix):
    """Classes/functions a reference module defines (not re-exported
    third-party objects, submodules, or module-level singletons)."""
    names = []
    for n in dir(mod):
        if n.startswith('_') or n in ('logger', 'BACKEND'):
            continue
        obj = getattr(mod, n)
        if inspect.ismodule(obj):
            continue
        if not (inspect.isclass(obj) or inspect.isfunction(obj)):
            continue
        if getattr(obj, '__module__', '').startswith(pkg_prefix):
            names.append(n)
    return sorted(names)


@pytest.mark.parametrize('module', [
    'graphs', 'filters', 'reduction', 'features', 'learning',
    'optimization', 'utils', 'plotting',
])
def test_module_surface(pygsp_ref, module):
    ref_mod = getattr(pygsp_ref, module)
    our_mod = getattr(pygsp_tpu, module)
    missing = [n for n in _public_names(ref_mod, 'pygsp')
               if not hasattr(our_mod, n)]
    assert not missing, f'pygsp_tpu.{module} missing: {missing}'


@pytest.mark.parametrize('cls', ['Graph', 'Filter'])
def test_class_surface(pygsp_ref, cls):
    ref_cls = getattr(pygsp_ref.graphs, cls, None) or getattr(
        pygsp_ref.filters, cls)
    our_cls = (pygsp_tpu.graphs.Graph if cls == 'Graph'
               else pygsp_tpu.filters.Filter)
    missing = [n for n in dir(ref_cls)
               if not n.startswith('_') and not hasattr(our_cls, n)]
    assert not missing, f'{cls} missing: {missing}'
