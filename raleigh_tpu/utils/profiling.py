"""Profiling helpers: per-phase wall timers and XLA device traces.

The reference keeps ad-hoc operator-time counters (e.g.
_OperatorSVD.time, reference interfaces/partial_svd.py:244-291); this
module generalizes that into a named-timer registry and adds
``jax.profiler`` trace capture for the device path.
"""

import contextlib
import time
from collections import defaultdict


class Timers:
    """Named accumulating wall timers."""

    def __init__(self):
        self.total = defaultdict(float)
        self.count = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name):
        start = time.time()
        try:
            yield
        finally:
            self.total[name] += time.time() - start
            self.count[name] += 1

    def report(self):
        lines = []
        for name in sorted(self.total, key=self.total.get, reverse=True):
            lines.append('%-28s %8.3f s  x%d'
                         % (name, self.total[name], self.count[name]))
        return '\n'.join(lines)


timers = Timers()


@contextlib.contextmanager
def device_trace(logdir='/tmp/raleigh_tpu_trace'):
    """Capture an XLA device trace viewable in TensorBoard/XProf."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class TimedOperator:
    """Wrap any operator with an accumulated apply-time counter
    (parity with the reference's operator-time metric)."""

    def __init__(self, op, name='operator'):
        self.op = op
        self.name = name
        self.time = 0.0
        self.calls = 0

    def apply(self, x, y, **kw):
        start = time.time()
        self.op.apply(x, y, **kw)
        self.time += time.time() - start
        self.calls += 1

    def __getattr__(self, item):
        return getattr(self.op, item)
