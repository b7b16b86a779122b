"""Test configuration: run everything on a virtual 8-device CPU platform.

The axon sitecustomize registers the TPU plugin and forces
``jax_platforms="axon,cpu"`` before conftest runs, so the env-var route is not
enough — we must override the jax config after import (and before any backend
is initialized by a test).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# CRANE_TPU_TESTS=1 keeps the real TPU attached so tests/test_tpu_kernels.py
# can gate Mosaic-compiled Pallas kernels against XLA on the chip; everything
# else runs on the virtual 8-device CPU platform.
if os.environ.get("CRANE_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")


import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_programs():
    """The full suite compiles hundreds of XLA programs in one process;
    dropping them (and collected fixtures) at each module boundary keeps
    peak memory flat — the accumulated state has produced XLA-compile
    segfaults near the end of long -x runs."""
    yield
    jax.clear_caches()
    gc.collect()
