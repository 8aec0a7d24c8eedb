"""Profiling and timing utilities.

The reference's only instrumentation is manual time.time() pairs around
neighbor search and force eval behind a verbose flag (reference:
/root/reference/code/LJ/train_network_lj.py:134-151). Here: a context manager
for jax.profiler device traces (viewable in TensorBoard/Perfetto) and a
simple wall-clock timer that blocks on device work so numbers are honest.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a device trace: with profile_trace('/tmp/trace'): run()."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer that synchronizes on a result pytree.

        t = Timer()
        out = f(x)
        dt = t.stop(out)   # seconds, after block_until_ready
    """

    def __init__(self):
        self.start = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        return time.perf_counter() - self.start
