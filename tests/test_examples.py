"""Every example script must run headless — the reference treats docs and
examples as tests (``test_docstrings.py``); here the gallery is executed
directly."""

import glob
import os
import runpy
import sys

import matplotlib
import pytest

matplotlib.use('Agg')

EXAMPLES = sorted(glob.glob(os.path.join(
    os.path.dirname(__file__), '..', 'examples', '*.py')))


@pytest.mark.parametrize('path', EXAMPLES, ids=[os.path.basename(p)
                                                for p in EXAMPLES])
def test_example_runs(path):
    runpy.run_path(path, run_name='not_main')
    import matplotlib.pyplot as plt
    plt.close('all')
