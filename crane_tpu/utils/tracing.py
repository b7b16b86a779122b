"""Lightweight tracing spans: named scopes + host-side span timing.

Reference behavior: ``with_tracing.rs`` (205 LoC) wraps Linear / Embedding /
RmsNorm / QMatMul so every forward enters a named tracing span — the
profiling hook for flame graphs. TPU-native equivalent: inside jit,
``jax.named_scope`` attaches the name to the XLA HLO (visible in
``jax.profiler`` traces / xprof); outside jit, a host-side registry
accumulates wall-time per span so ``report()`` gives a quick profile without
a trace viewer.

Usage::

    with span("prefill"):
        logits, cache = prefill(...)

    @traced("decode_step")
    def step(...): ...

    print(report())
"""

from __future__ import annotations

import collections
import contextlib
import functools
import threading
import time

import jax

_lock = threading.Lock()
_stats: dict = collections.defaultdict(lambda: [0, 0.0])  # name -> [calls, secs]
_enabled = True


def enable(on: bool = True) -> None:
    global _enabled
    _enabled = on


def reset() -> None:
    with _lock:
        _stats.clear()


@contextlib.contextmanager
def span(name: str):
    """Named scope (XLA annotation under trace) + host wall-time accounting."""
    if not _enabled:
        with jax.named_scope(name):
            yield
        return
    t0 = time.perf_counter()
    with jax.named_scope(name):
        yield
    dt = time.perf_counter() - t0
    with _lock:
        s = _stats[name]
        s[0] += 1
        s[1] += dt


def traced(name: str | None = None):
    """Decorator form of :func:`span`."""

    def wrap(fn):
        label = name or fn.__name__

        @functools.wraps(fn)
        def inner(*args, **kwargs):
            with span(label):
                return fn(*args, **kwargs)

        return inner

    return wrap


def stats() -> dict:
    """{name: (calls, total_seconds)} snapshot."""
    with _lock:
        return {k: (v[0], v[1]) for k, v in _stats.items()}


def report() -> str:
    """Sorted per-span table: calls, total ms, mean ms."""
    rows = sorted(stats().items(), key=lambda kv: -kv[1][1])
    lines = [f"{'span':<32} {'calls':>7} {'total ms':>10} {'mean ms':>9}"]
    for name, (calls, secs) in rows:
        lines.append(
            f"{name:<32} {calls:>7} {secs * 1e3:>10.2f} {secs * 1e3 / max(calls, 1):>9.3f}"
        )
    return "\n".join(lines)
