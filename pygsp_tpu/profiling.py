"""Tracing / profiling / throughput counters (SURVEY §5: new component —
the reference has only stdlib logging).

- :func:`trace` wraps ``jax.profiler.trace`` for TensorBoard-viewable
  device traces.
- :class:`Throughput` measures achieved edges/s (the BASELINE primary
  metric) around any callable.
- hot ops carry ``jax.named_scope`` annotations so traces show the
  SpMM / halo phases by name.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """edges/s (and derived) counter for repeated filtering steps.

    >>> meter = Throughput(n_edges=1000, k_order=30, n_signals=8)
    >>> with meter:
    ...     pass  # run one filterbank application
    >>> meter.edge_ops >= 0
    True
    """

    def __init__(self, n_edges: int, k_order: int = 1, n_signals: int = 1):
        self.edge_ops = n_edges * k_order * n_signals
        self.times = []

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    @property
    def last_s(self) -> float:
        return self.times[-1]

    @property
    def best_edge_ops_per_s(self) -> float:
        return self.edge_ops / min(self.times)

    def report(self) -> dict:
        best = min(self.times)
        return {'edge_ops': self.edge_ops,
                'best_ms': best * 1e3,
                'edge_ops_per_s': self.edge_ops / max(best, 1e-12),
                'runs': len(self.times)}
