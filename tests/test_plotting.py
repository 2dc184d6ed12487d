"""Plotting suite: every graph class with coordinates renders
(reference pattern: ``pygsp/tests/test_plotting.py:38-101``)."""

import matplotlib

matplotlib.use('Agg')

import numpy as np
import pytest

import pygsp_tpu as gsp
from pygsp_tpu import plotting


@pytest.fixture(autouse=True)
def _close_figures():
    yield
    plotting.close_all()


COORD_GRAPHS = [
    ('Logo', dict()),
    ('Grid2d', dict(N1=4, N2=5)),
    ('Path', dict(N=8)),
    ('Ring', dict(N=8)),
    ('Torus', dict(Nv=4, Mv=4)),          # 3-D coords
    ('Comet', dict(N=10, k=3)),
    ('LowStretchTree', dict(k=2)),
    ('RandomRing', dict(N=10, seed=1)),
    ('DavidSensorNet', dict(N=64)),
    ('SwissRoll', dict(N=40, seed=1)),    # 3-D coords
    ('Sensor', dict(N=20, seed=1)),
    ('Cube', dict(nb_pts=30, seed=1)),
    ('Sphere', dict(nb_pts=30, seed=1)),
    ('TwoMoons', dict(moontype='synthesized', N=40, seed=1)),
]


@pytest.mark.parametrize('name,kwargs', COORD_GRAPHS)
def test_plot_every_graph(name, kwargs):
    G = getattr(gsp.graphs, name)(**kwargs)
    ax = G.plot()
    assert ax.figure is not None
    ax2 = G.plot(vertex_color=np.arange(G.N, dtype=float))
    assert ax2 is not None


def test_plot_options():
    G = gsp.graphs.Sensor(20, seed=1)
    ax = G.plot(edges=False, vertex_size=10, indices=True, highlight=[0, 3],
                title='custom', limits=[0, 1])
    assert ax.get_title() == 'custom'


def test_plot_signal_sized_and_colored():
    """Reference parity: vertex_size as a signal scales to [0.5, 2]x the
    default; per-edge color/width signals normalize into alpha/width
    (reference plotting.py:497-520)."""
    G = gsp.graphs.Sensor(20, seed=1)
    _, _, w = G.get_edge_list()
    sig = np.arange(G.N, dtype=float)
    ax = G.plot(vertex_color=sig, vertex_size=G.dw, edge_color=w,
                edge_width=w)
    sizes = ax.collections[-1].get_sizes()  # vertex scatter drawn last
    assert sizes.min() >= 0.5 * 0.98 * 100 * 0.25  # intercept**2 * 4 * 100
    assert sizes.max() <= 4 * 100 + 1e-6
    # constant signal -> all sizes equal (normalize returns 0.5)
    ax2 = G.plot(vertex_size=np.ones(G.N))
    assert np.ptp(ax2.collections[-1].get_sizes()) == 0


def test_plot_errors():
    G = gsp.graphs.Sensor(20, seed=1)
    with pytest.raises(ValueError):
        G.plot(vertex_color=np.arange(G.N - 1, dtype=float))
    with pytest.raises(ValueError):
        G.plot(vertex_size=np.ones(3))
    with pytest.raises(ValueError):
        G.plot(edge_width=np.ones(G.Ne - 1))


def test_plot_1d_coords():
    G = gsp.graphs.Ring(12)
    G.set_coordinates('line1D')
    ax = G.plot(np.sin(np.arange(12.0)), highlight=2)
    assert ax is not None


def test_plot_signal_alias():
    G = gsp.graphs.Ring(12)
    ax = G.plot_signal(np.sin(np.arange(12.0)))
    assert ax is not None


def test_plot_requires_coords():
    G = gsp.graphs.Graph([[0, 1], [1, 0]])
    with pytest.raises(AttributeError):
        G.plot()


def test_plot_filters():
    G = gsp.graphs.Logo()
    G.estimate_lmax(method='bounds')
    for g in (gsp.filters.Heat(G, [5, 10]), gsp.filters.Itersine(G, Nf=4)):
        ax = g.plot()
        assert len(ax.lines) >= g.Nf


def test_plot_filter_with_eigenvalues():
    G = gsp.graphs.Ring(16)
    G.compute_fourier_basis()
    ax = gsp.filters.Heat(G, 5).plot()
    assert len(ax.lines) > 10      # response + eigenvalue markers


def test_plot_spectrogram():
    G = gsp.graphs.Ring(24)
    G.estimate_lmax(method='bounds')
    ax = G.plot_spectrogram(M=10)
    assert ax.images          # imshow artist present
    assert G.spectr.shape == (24, 10)


def test_plot_1d_coords():
    G = gsp.graphs.Ring(10)
    G.set_coordinates('line1D')
    ax = G.plot()
    assert ax is not None
