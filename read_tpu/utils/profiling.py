"""Device profiling helpers.

The reference's tracing is host-side millisecond timers
(``READ/utils/perform.py``; SURVEY.md 5.1). On TPU, in-program timing is
meaningless (everything is one compiled program); the right tool is a
``jax.profiler`` trace viewed in TensorBoard/Perfetto. This wraps it.
"""

from __future__ import annotations

import contextlib
import time


import numpy as np

__all__ = ["trace", "device_timeit"]


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax_trace"):
    """Capture a device trace around a block:

    >>> with trace("/tmp/tr"):
    ...     train_step(state, batch)  # traced
    Open the logdir with TensorBoard's profile plugin or Perfetto.
    """
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def device_timeit(fn, *args, iters: int = 10, warmup: int = 1) -> dict:
    """Steady-state wall timing of a jitted callable.

    Forces a host readback of one element per call — plain
    ``block_until_ready`` can return early through the axon tunnel.
    """
    import jax

    for _ in range(warmup):
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    dt = (time.perf_counter() - t0) / iters
    return {"mean_ms": dt * 1e3, "per_sec": 1.0 / dt}
