"""Persistent XLA compilation cache.

First jit of a 28-layer model costs 30-60 s on the remote-tunnel runtime;
with the on-disk cache a rerun of the same program (bench, server restart,
driver hooks) loads the compiled executable instead. Safe to call any time
before the first compilation; keyed by HLO + compile flags, so code changes
naturally miss. Off only when CRANE_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    if os.environ.get("CRANE_NO_COMPILE_CACHE") == "1":
        return
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            path or os.path.expanduser("~/.cache/crane_tpu_xla"),
        )
        # default thresholds skip small/fast programs; a remote tunnel makes
        # even those worth caching
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:  # never let caching break startup
        pass
