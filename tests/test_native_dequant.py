"""Native C++ GGUF dequant vs the NumPy reference: bit-exact on every
supported block format, plus fallback behavior and a speed sanity check."""

import os
import time

import numpy as np
import pytest

from crane_tpu.loaders import gguf
from crane_tpu.native import gguf_dequant_native

FORMATS = {
    gguf.GGML_Q8_0: (32, 34),
    gguf.GGML_Q4_0: (32, 18),
    gguf.GGML_Q4_1: (32, 20),
    gguf.GGML_Q5_0: (32, 22),
    gguf.GGML_Q5_1: (32, 24),
    gguf.GGML_Q4_K: (256, 144),
    gguf.GGML_Q5_K: (256, 176),
    gguf.GGML_Q6_K: (256, 210),
}


def _numpy_dequant(raw, ggml_type, n):
    """Force the NumPy path regardless of native availability."""
    os.environ["CRANE_NATIVE"] = "0"
    try:
        return gguf.dequantize(raw.copy(), ggml_type, n)
    finally:
        os.environ.pop("CRANE_NATIVE", None)


def _random_blocks(rng, ggml_type, nb):
    """Random block bytes with sane f16 scale fields (avoid NaN compares)."""
    _, bb = FORMATS[ggml_type]
    raw = rng.integers(0, 256, nb * bb, dtype=np.uint8)
    blocks = raw.reshape(nb, bb)
    # overwrite the leading f16 scale (and min, for _1/_K formats) fields
    n_scale_halves = {gguf.GGML_Q4_1: 2, gguf.GGML_Q5_1: 2,
                      gguf.GGML_Q4_K: 2, gguf.GGML_Q5_K: 2}.get(ggml_type, 1)
    scales = (rng.standard_normal((nb, n_scale_halves)) * 0.01).astype(np.float16)
    blocks[:, : 2 * n_scale_halves] = scales.view(np.uint8)
    if ggml_type == gguf.GGML_Q6_K:
        d = (rng.standard_normal((nb, 1)) * 0.01).astype(np.float16)
        blocks[:, 208:210] = d.view(np.uint8)
    return blocks.reshape(-1)


native_available = gguf_dequant_native(
    np.zeros(34, np.uint8), gguf.GGML_Q8_0, 32
) is not None


@pytest.mark.skipif(not native_available, reason="g++/OpenMP unavailable")
class TestNativeDequant:
    @pytest.mark.parametrize("ggml_type", sorted(FORMATS))
    def test_bit_exact_vs_numpy(self, ggml_type):
        rng = np.random.default_rng(ggml_type)
        be, _ = FORMATS[ggml_type]
        nb = 37  # odd block count
        raw = _random_blocks(rng, ggml_type, nb)
        n = nb * be
        ref = _numpy_dequant(raw, ggml_type, n)
        got = gguf_dequant_native(raw, ggml_type, n)
        np.testing.assert_array_equal(got, ref)

    def test_roundtrip_q8_0(self):
        x = np.random.default_rng(0).standard_normal(256).astype(np.float32)
        raw = gguf.quantize_q8_0(x)
        got = gguf_dequant_native(raw.view(np.uint8), gguf.GGML_Q8_0, 256)
        ref = _numpy_dequant(raw.view(np.uint8), gguf.GGML_Q8_0, 256)
        np.testing.assert_array_equal(got, ref)
        assert np.abs(got - x).max() < 0.05

    def test_reader_path_uses_native_transparently(self, tmp_path):
        """dequantize() (the loader entry point) returns identical results
        with native on and off."""
        rng = np.random.default_rng(5)
        raw = _random_blocks(rng, gguf.GGML_Q4_K, 8)
        a = gguf.dequantize(raw.copy(), gguf.GGML_Q4_K, 8 * 256)
        b = _numpy_dequant(raw, gguf.GGML_Q4_K, 8 * 256)
        np.testing.assert_array_equal(a, b)

    def test_speed_not_slower_than_numpy(self):
        """Coarse sanity: native should beat NumPy on a q6_k MB-scale tensor
        (OpenMP + no intermediate allocations). Allow generous margin for CI
        noise — assert only that it isn't dramatically slower."""
        rng = np.random.default_rng(9)
        nb = 20_000  # ~4.2 MB raw, 5.1M elements
        raw = _random_blocks(rng, gguf.GGML_Q6_K, nb)
        n = nb * 256
        gguf_dequant_native(raw, gguf.GGML_Q6_K, n)  # warm (lib load)
        t0 = time.perf_counter()
        gguf_dequant_native(raw, gguf.GGML_Q6_K, n)
        t_native = time.perf_counter() - t0
        t0 = time.perf_counter()
        _numpy_dequant(raw, gguf.GGML_Q6_K, n)
        t_numpy = time.perf_counter() - t0
        assert t_native < t_numpy * 2.0, (t_native, t_numpy)


def test_unsupported_type_returns_none():
    if not native_available:
        pytest.skip("native unavailable")
    out = gguf_dequant_native(np.zeros(64, np.uint8), 99, 32)
    assert out is None


def test_disable_env(monkeypatch):
    monkeypatch.setenv("CRANE_NATIVE", "0")
    import crane_tpu.native as native

    monkeypatch.setattr(native, "_lib_cache", {})
    assert native.gguf_dequant_native(np.zeros(34, np.uint8), gguf.GGML_Q8_0, 32) is None
