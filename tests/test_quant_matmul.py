"""Pallas w8a16 quantized-matmul kernel correctness (interpret mode)."""

import numpy as np

import jax.numpy as jnp

from crane_tpu.ops.pallas.quant_matmul import quant_matmul_w8


def test_matches_dense():
    r = np.random.default_rng(0)
    I, O, B = 256, 512, 2
    x = jnp.asarray(r.standard_normal((B, I)), jnp.float32)
    codes = jnp.asarray(r.integers(-127, 127, (I, O)), jnp.int8)
    scales = jnp.asarray(np.abs(r.standard_normal((1, O))) * 0.01, jnp.float32)
    got = quant_matmul_w8(x, codes, scales, block_i=128, block_o=256, interpret=True)
    # the kernel computes the dot in bf16 (matching the decode path)
    ref = jnp.dot(
        x.astype(jnp.bfloat16), codes.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) * scales
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=5e-3, atol=5e-3
    )


def test_single_block():
    r = np.random.default_rng(1)
    x = jnp.asarray(r.standard_normal((1, 128)), jnp.float32)
    codes = jnp.asarray(r.integers(-10, 10, (128, 128)), jnp.int8)
    scales = jnp.ones((1, 128), jnp.float32)
    got = quant_matmul_w8(x, codes, scales, interpret=True)
    ref = jnp.dot(
        x.astype(jnp.bfloat16), codes.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=5e-3, atol=5e-3)


def test_mixed_dtype_linear_matches_dequant():
    """The w8a16 mixed-dtype dot must equal the explicit dequant matmul."""
    from crane_tpu.ops.linear import linear, quantize_weight

    r = np.random.default_rng(2)
    w = jnp.asarray(r.standard_normal((256, 96)) * 0.05, jnp.float32)
    x = jnp.asarray(r.standard_normal((3, 256)), jnp.bfloat16)
    qw = quantize_weight(w, bits=8, granularity="channel")
    got = np.asarray(linear(x, qw), np.float32)
    ref = np.asarray(jnp.dot(x, qw.dequant(jnp.bfloat16)), np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_w8a8_matmul_error_bounded(monkeypatch):
    """Dynamic-activation-quant s8xs8 path: bounded relative error vs the
    exact f32 product, and routed through linear() under CRANE_W8A8=1."""
    from crane_tpu.ops.linear import _w8a8_matmul, linear, quantize_weight

    r = np.random.default_rng(3)
    w = jnp.asarray(r.standard_normal((512, 128)) * 0.04, jnp.float32)
    x = jnp.asarray(r.standard_normal((4, 512)), jnp.bfloat16)
    qw = quantize_weight(w, bits=8, granularity="channel")

    exact = np.asarray(jnp.dot(x.astype(jnp.float32), w), np.float32)
    got = np.asarray(_w8a8_matmul(x, qw.codes, qw.scales), np.float32)
    rms = float(np.sqrt((exact ** 2).mean()))
    err = np.abs(got - exact)
    assert np.median(err) / rms < 0.01      # typical error ≪ signal
    assert err.max() / rms < 0.05           # worst case bounded

    monkeypatch.setenv("CRANE_W8A8", "1")
    routed = np.asarray(linear(x, qw), np.float32)
    np.testing.assert_allclose(routed, got, rtol=1e-5, atol=1e-5)

    # int4 weights must NOT take the w8a8 path (quality guard)
    qw4 = quantize_weight(w, bits=4, granularity="channel")
    out4 = np.asarray(linear(x, qw4), np.float32)
    ref4 = np.asarray(jnp.dot(x, qw4.dequant(jnp.bfloat16)), np.float32)
    np.testing.assert_allclose(out4, ref4, rtol=3e-2, atol=3e-2)


def test_int4_kernel_matches_unpacked():
    """Packed-int4 kernel == dequant matmul on the unpacked codes."""
    from crane_tpu.ops.linear import pack_int4_rows, unpack_int4_rows
    from crane_tpu.ops.pallas.quant_matmul import quant_matmul

    r = np.random.default_rng(4)
    I, O, B = 256, 256, 2
    codes = jnp.asarray(r.integers(-7, 8, (I, O)), jnp.int8)
    packed = pack_int4_rows(codes)
    assert packed.shape == (I // 2, O)
    np.testing.assert_array_equal(np.asarray(unpack_int4_rows(packed)), np.asarray(codes))

    x = jnp.asarray(r.standard_normal((B, I)), jnp.float32)
    scales = jnp.asarray(np.abs(r.standard_normal((1, O))) * 0.02, jnp.float32)
    got = quant_matmul(x, packed, scales, bits=4, block_i=64, block_o=128, interpret=True)
    ref = jnp.dot(
        x.astype(jnp.bfloat16), codes.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) * scales
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=5e-3, atol=5e-3)


def test_packed_int4_linear_matches_dequant():
    """linear() on a packed per-channel int4 weight (XLA fallback path on
    CPU) == explicit dequant matmul."""
    from crane_tpu.ops.linear import linear, quantize_weight

    r = np.random.default_rng(5)
    w = jnp.asarray(r.standard_normal((128, 64)) * 0.05, jnp.float32)
    x = jnp.asarray(r.standard_normal((3, 128)), jnp.bfloat16)
    qw = quantize_weight(w, bits=4, granularity="channel")
    assert qw.packed
    got = np.asarray(linear(x, qw), np.float32)
    ref = np.asarray(jnp.dot(x, qw.dequant(jnp.bfloat16)), np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_int4_nonmultiple_of_512_hidden():
    """hidden 1536 packs to 768 rows — the dispatch must pick a 256 block
    (min(512, 768) used to fail the kernel's divisibility assert)."""
    import numpy as np

    from crane_tpu.ops.linear import quantize_weight
    from crane_tpu.ops.pallas.quant_matmul import quant_matmul

    rng = np.random.default_rng(0)
    I, O = 1536, 512
    w = jnp.asarray(rng.standard_normal((I, O)) * 0.05, jnp.float32)
    q = quantize_weight(w, bits=4)
    x = jnp.asarray(rng.standard_normal((1, I)), jnp.float32)
    got = quant_matmul(x, q.codes, q.scales.reshape(1, O), bits=4,
                       block_i=256, block_o=256, interpret=True)
    ref = x @ q.dequant(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_quant_tied_head_default_follows_bits(monkeypatch):
    """int4 ISQ defaults to quantizing a copy of the tied head (the
    measured-fastest serving variant, bench.py --mode quant w4h); int8
    keeps the reference behavior (head never quantized,
    qwen3_5/model.rs:116-121); CRANE_QUANT_TIED_HEAD overrides both ways."""
    import jax.numpy as jnp

    from crane_tpu.generation.config import GenerationConfig
    from crane_tpu.models.auto import quantize_params
    from crane_tpu.models.causal_lm import CausalLM
    from crane_tpu.models.init import QWEN3_TINY, init_params

    monkeypatch.delenv("CRANE_QUANT_TIED_HEAD", raising=False)
    params = init_params(QWEN3_TINY, seed=0, dtype=jnp.float32)
    assert "lm_head" not in params  # tied embeddings
    q4 = quantize_params(params, bits=4)
    assert "lm_head" in q4
    q8 = quantize_params(params, bits=8)
    assert "lm_head" not in q8
    monkeypatch.setenv("CRANE_QUANT_TIED_HEAD", "0")
    assert "lm_head" not in quantize_params(params, bits=4)
    monkeypatch.setenv("CRANE_QUANT_TIED_HEAD", "1")
    assert "lm_head" in quantize_params(params, bits=8)
    monkeypatch.delenv("CRANE_QUANT_TIED_HEAD")

    # the default q4 model still generates (quantized head drives logits)
    lm = CausalLM(QWEN3_TINY, q4, dtype=jnp.float32)
    toks = lm.generate([3, 14, 15], GenerationConfig.greedy(4))
    assert len(toks) == 4
