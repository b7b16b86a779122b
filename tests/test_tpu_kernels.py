"""Real-TPU (Mosaic) parity for the Pallas kernels, gated on
``CRANE_TPU_TESTS=1`` (everything else in the suite runs on the virtual CPU
platform; interpret-mode tests can't catch Mosaic lowering regressions).

Run: ``CRANE_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -q``
(needs the chip to itself — don't run alongside another TPU process).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    os.environ.get("CRANE_TPU_TESTS") != "1"
    or jax.default_backend() == "cpu",
    reason="real-TPU kernel tests need CRANE_TPU_TESTS=1 and a TPU backend",
)


def rng(*shape, seed=0, dtype=jnp.bfloat16):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), dtype
    )


# ── flash attention ─────────────────────────────────────────────────────────


@pytest.mark.parametrize("window,softcap", [(None, None), (512, None),
                                            (None, 30.0), (512, 30.0)])
def test_flash_attention_vs_xla_on_chip(window, softcap):
    from crane_tpu.ops.attention import gqa_attention
    from crane_tpu.ops.pallas.flash_attention import flash_attention_causal

    B, S, Hq, Hkv, D = 1, 2048, 16, 8, 128
    q, k, v = rng(B, S, Hq, D, seed=1), rng(B, S, Hkv, D, seed=2), rng(B, S, Hkv, D, seed=3)
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    ref = gqa_attention(q, k, v, pos, scale=D ** -0.5, window=window,
                        logit_softcap=softcap)
    got = flash_attention_causal(q, k, v, scale=D ** -0.5, window=window,
                                 softcap=softcap)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=5e-2, atol=5e-2,  # bf16 accumulation-order differences
    )


# ── quantized matmul ────────────────────────────────────────────────────────


@pytest.mark.parametrize("bits", [8, 4])
def test_quant_matmul_vs_xla_on_chip(bits):
    from crane_tpu.ops.linear import pack_int4_rows
    from crane_tpu.ops.pallas.quant_matmul import quant_matmul

    B, I, O = 8, 1024, 2048
    x = rng(B, I, seed=4)
    codes = np.random.default_rng(5).integers(
        -(2 ** (bits - 1) - 1), 2 ** (bits - 1), (I, O)
    ).astype(np.int8)
    scales = np.abs(np.random.default_rng(6).normal(size=(1, O))).astype(np.float32) * 0.01
    ref = (np.asarray(x, np.float32) @ codes.astype(np.float32)) * scales
    packed = pack_int4_rows(jnp.asarray(codes)) if bits == 4 else jnp.asarray(codes)
    got = quant_matmul(x, packed, jnp.asarray(scales), bits=bits)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), ref, rtol=5e-2, atol=5e-2
    )


# ── fused quant decode attention ────────────────────────────────────────────


@pytest.mark.parametrize("bits", [8, 4])
def test_quant_decode_attention_vs_xla_on_chip(bits):
    from crane_tpu.ops.kv_cache import QuantLayerKVCache
    from crane_tpu.ops.attention import gqa_attention
    from crane_tpu.ops.pallas.quant_attention import quant_decode_attention

    B, T, Hq, Hkv, D = 2, 1024, 16, 8, 128
    valid = jnp.asarray([700, 512], jnp.int32)
    cache = QuantLayerKVCache.empty(B, T, Hkv, D, bits=bits)
    kv_k = rng(B, T, Hkv, D, seed=7) * 0.5
    kv_v = rng(B, T, Hkv, D, seed=8) * 0.5
    cache = cache.update(kv_k, kv_v, jnp.asarray(0, jnp.int32))
    q = rng(B, 1, Hq, D, seed=9)
    got = quant_decode_attention(
        q, cache.k, cache.v, cache.k_scale, cache.v_scale, valid,
        n_kv_heads=Hkv, bits=bits, scale=D ** -0.5, block_t=256,
    )
    kd, vd = cache.dequant(jnp.bfloat16)
    ref = gqa_attention(q, kd, vd, (valid - 1)[:, None], scale=D ** -0.5)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=5e-2, atol=5e-2,
    )


def test_flash_segments_vs_xla_on_chip():
    """Segmented (VLM image-block) flash attention lowers through Mosaic and
    matches the XLA extra-mask path."""
    from crane_tpu.ops.attention import gqa_attention
    from crane_tpu.ops.pallas.flash_attention import flash_attention_causal

    B, S, Hq, Hkv, D = 1, 1024, 8, 4, 128
    q = rng(B, S, Hq, D, seed=21)
    k = rng(B, S, Hkv, D, seed=22)
    v = rng(B, S, Hkv, D, seed=23)
    seg = np.zeros((B, S), np.int32)
    seg[0, 100:356] = 1
    seg[0, 600:728] = 2
    segj = jnp.asarray(seg)
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    extra = jnp.asarray((seg[:, :, None] == seg[:, None, :]) & (seg[:, :, None] > 0))
    ref = gqa_attention(q, k, v, pos, scale=D ** -0.5, extra_mask=extra)
    got = flash_attention_causal(q, k, v, segj, scale=D ** -0.5)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=5e-2, atol=5e-2,
    )


@pytest.mark.parametrize("Hq,Hkv,D", [(16, 8, 128), (8, 2, 256)])
def test_fp_decode_attention_vs_xla_on_chip(Hq, Hkv, D):
    """bits=16 mode: same kernel, bf16 cache, live-length block clamp.
    (8, 2, 256) is the Gemma3n head geometry."""
    from crane_tpu.ops.kv_cache import LayerKVCache
    from crane_tpu.ops.attention import gqa_attention
    from crane_tpu.ops.pallas.quant_attention import quant_decode_attention

    B, T = 2, 1024
    valid = jnp.asarray([700, 512], jnp.int32)
    cache = LayerKVCache.empty(B, T, Hkv, D, dtype=jnp.bfloat16)
    kv_k = rng(B, T, Hkv, D, seed=7) * 0.5
    kv_v = rng(B, T, Hkv, D, seed=8) * 0.5
    cache = cache.update(kv_k, kv_v, jnp.asarray(0, jnp.int32))
    q = rng(B, 1, Hq, D, seed=9)
    got = quant_decode_attention(
        q, cache.k, cache.v, None, None, valid,
        bits=16, scale=D ** -0.5, block_t=256,
    )
    ref = gqa_attention(q, cache.k, cache.v, (valid - 1)[:, None], scale=D ** -0.5)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=5e-2, atol=5e-2,
    )


# ── GDN recurrence ──────────────────────────────────────────────────────────


def test_gdn_pallas_vs_ref_on_chip():
    from crane_tpu.ops.gdn import gdn_recurrence_ref
    from crane_tpu.ops.pallas.gdn_scan import gdn_recurrence_pallas

    B, S, H, K, V = 2, 256, 4, 128, 128
    r = np.random.default_rng(10)
    q = jnp.asarray(r.standard_normal((B, S, H, K)), jnp.float32) * 0.2
    k = jnp.asarray(r.standard_normal((B, S, H, K)), jnp.float32) * 0.2
    v = jnp.asarray(r.standard_normal((B, S, H, V)), jnp.float32) * 0.2
    g = jnp.asarray(r.uniform(-2, 0, (B, S, H)), jnp.float32)
    beta = jnp.asarray(r.uniform(0, 1, (B, S, H)), jnp.float32)
    out_ref, st_ref = gdn_recurrence_ref(q, k, v, g, beta)
    out, st = gdn_recurrence_pallas(q, k, v, g, beta)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(st), np.asarray(st_ref), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("bits", [16, 8, 4])
def test_cached_continuation_vs_xla_on_chip(bits):
    """Storage-layout continuation kernel (fp no-transpose / int8
    fused-dequant) vs the XLA einsum path on real Mosaic."""
    from crane_tpu.ops.attention import gqa_attention
    from crane_tpu.ops.kv_cache import LayerKVCache, QuantLayerKVCache
    from crane_tpu.ops.pallas.quant_attention import quant_cached_attention

    B, ctx, S, T, Hq, Hkv, D = 1, 700, 512, 2048, 16, 8, 128
    k_new = rng(B, ctx + S, Hkv, D, seed=21, dtype=jnp.float32)
    v_new = rng(B, ctx + S, Hkv, D, seed=22, dtype=jnp.float32)
    q = rng(B, S, Hq, D, seed=23)
    positions = jnp.broadcast_to(
        jnp.arange(S, dtype=jnp.int32)[None] + ctx, (B, S))

    if bits == 16:
        cache = LayerKVCache.empty(B, T, Hkv, D, jnp.bfloat16)
        cache = cache.update(
            k_new.astype(jnp.bfloat16), v_new.astype(jnp.bfloat16),
            jnp.zeros((B,), jnp.int32))
        kd, vd = cache.k, cache.v
        kv_args = (cache.k, cache.v, None, None)
        tol = dict(atol=2e-2, rtol=2e-2)
    else:
        cache = QuantLayerKVCache.empty(B, T, Hkv, D, bits=bits)
        cache = cache.update(k_new, v_new, jnp.zeros((B,), jnp.int32))
        kd, vd = cache.dequant(jnp.bfloat16)
        kv_args = (cache.k, cache.v, cache.k_scale, cache.v_scale)
        tol = dict(atol=3e-2, rtol=3e-2) if bits == 8 else dict(atol=8e-2, rtol=8e-2)

    got = quant_cached_attention(
        q, *kv_args, positions, n_kv_heads=Hkv, bits=bits, scale=D ** -0.5,
        block_q=128, block_k=512)
    ref = gqa_attention(q, kd, vd, positions, scale=D ** -0.5)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), **tol)


@pytest.mark.parametrize("bits", [16, 8, 4])
def test_decode_stats_variant_on_chip(bits):
    """The sequence-parallel merge needs the decode kernels' (m, l) stats
    outputs — check the multi-output Mosaic lowering against the plain
    variant and verify the log-sum-exp identity sums to the same output."""
    from crane_tpu.ops.kv_cache import LayerKVCache, QuantLayerKVCache
    from crane_tpu.ops.pallas.quant_attention import (
        decode_attention_with_stats,
        quant_decode_attention,
    )

    B, T, Hq, Hkv, D = 2, 2048, 16, 8, 128
    k_new = rng(B, 1500, Hkv, D, seed=31, dtype=jnp.float32)
    v_new = rng(B, 1500, Hkv, D, seed=32, dtype=jnp.float32)
    q = rng(B, 1, Hq, D, seed=33)
    valid = jnp.asarray([1500, 700], jnp.int32)

    if bits == 16:
        cache = LayerKVCache.empty(B, T, Hkv, D, jnp.bfloat16)
        cache = cache.update(k_new.astype(jnp.bfloat16),
                             v_new.astype(jnp.bfloat16),
                             jnp.zeros((B,), jnp.int32))
        args = (q, cache.k, cache.v, None, None, valid)
    else:
        cache = QuantLayerKVCache.empty(B, T, Hkv, D, bits=bits)
        cache = cache.update(k_new, v_new, jnp.zeros((B,), jnp.int32))
        args = (q, cache.k, cache.v, cache.k_scale, cache.v_scale, valid)

    out, m, l = decode_attention_with_stats(
        *args, bits=bits, scale=D ** -0.5, block_t=512)
    ref = quant_decode_attention(
        *args, n_kv_heads=Hkv, bits=bits, scale=D ** -0.5, block_t=512)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=1e-6, rtol=1e-6)
    assert np.all(np.isfinite(np.asarray(m))) and np.all(np.asarray(l) > 0)


@pytest.mark.parametrize("bits", [16, 8])
def test_cached_stats_variant_on_chip(bits):
    """The sp continuation merge consumes the cached kernel's (m, l) stats
    outputs — check the Mosaic lowering against the plain variant, including
    slab-shifted NEGATIVE positions (rows attending nothing)."""
    from crane_tpu.ops.kv_cache import LayerKVCache, QuantLayerKVCache
    from crane_tpu.ops.pallas.quant_attention import (
        cached_attention_with_stats,
        quant_cached_attention,
    )

    B, ctx, S, T, Hq, Hkv, D = 1, 700, 256, 2048, 16, 8, 128
    k_new = rng(B, ctx + S, Hkv, D, seed=41, dtype=jnp.float32)
    v_new = rng(B, ctx + S, Hkv, D, seed=42, dtype=jnp.float32)
    q = rng(B, S, Hq, D, seed=43)
    positions = jnp.broadcast_to(
        jnp.arange(S, dtype=jnp.int32)[None] + ctx, (B, S))

    if bits == 16:
        cache = LayerKVCache.empty(B, T, Hkv, D, jnp.bfloat16)
        cache = cache.update(k_new.astype(jnp.bfloat16),
                             v_new.astype(jnp.bfloat16),
                             jnp.zeros((B,), jnp.int32))
        kv_args = (cache.k, cache.v, None, None)
    else:
        cache = QuantLayerKVCache.empty(B, T, Hkv, D, bits=8)
        cache = cache.update(k_new, v_new, jnp.zeros((B,), jnp.int32))
        kv_args = (cache.k, cache.v, cache.k_scale, cache.v_scale)

    out, m, l = cached_attention_with_stats(
        q, *kv_args, positions, bits=bits, scale=D ** -0.5,
        block_q=128, block_k=512)
    ref = quant_cached_attention(
        q, *kv_args, positions, n_kv_heads=Hkv, bits=bits, scale=D ** -0.5,
        block_q=128, block_k=512)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=1e-6, rtol=1e-6)
    assert np.all(np.asarray(l) > 0)

    # negative positions (a later slab's view of an earlier chunk): rows
    # attend nothing -> zero output, l == 0
    neg = positions - 4096
    out2, m2, l2 = cached_attention_with_stats(
        q, *kv_args, neg, bits=bits, scale=D ** -0.5,
        block_q=128, block_k=512)
    np.testing.assert_array_equal(np.asarray(l2), 0.0)
    np.testing.assert_array_equal(np.asarray(out2, np.float32), 0.0)
