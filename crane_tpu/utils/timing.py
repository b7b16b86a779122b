"""Honest device timing under remote-dispatch runtimes.

On tunneled/remote TPU runtimes, ``block_until_ready`` can return before the
device has actually executed (it confirms enqueue, not completion), which
silently inflates throughput numbers. The only reliable sync point is a
device->host transfer of a value data-dependent on the computation.

``marginal_rate`` times two chain lengths and reports the marginal
iterations/second — subtracting fixed RPC/dispatch overhead from the estimate.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np


def host_sync(x) -> float:
    """Force execution to complete by pulling one scalar to the host."""
    return float(np.asarray(x).ravel()[0])


def chain_time(step: Callable, n: int) -> float:
    """Run ``step`` n times (each consuming the prior state) and return the
    wall time including ONE final host sync. ``step()`` must return the object
    to sync on and keep its own state."""
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = step()
    host_sync(out)
    return time.perf_counter() - t0


def marginal_rate(make_step: Callable[[], Callable], n_small: int, n_large: int) -> float:
    """iterations/second from the marginal time between two chain lengths."""
    step = make_step()
    chain_time(step, 2)  # warm
    step = make_step()
    t_small = chain_time(step, n_small)
    step = make_step()
    t_large = chain_time(step, n_large)
    return (n_large - n_small) / max(t_large - t_small, 1e-9)
