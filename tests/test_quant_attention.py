"""int4 KV nibble packing + fused-dequant decode attention kernel.

The packing invariant the reference's long-context story depends on
(qwen3_5/kv_cache.rs:209-342, README.md:374-383): int4 cache arrays are HALF
int8's bytes. The kernel parity bar mirrors the reference's
CRANE_GDN_PORTABLE pattern: Pallas path vs the XLA dequant reference path.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crane_tpu.ops.attention import gqa_attention
from crane_tpu.ops.kv_cache import (
    QuantLayerKVCache,
    pack_int4,
    unpack_int4,
)
from crane_tpu.ops.pallas.quant_attention import quant_decode_attention


class TestInt4Packing:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        codes = rng.integers(-7, 8, size=(3, 5, 2, 64), dtype=np.int8)
        packed = pack_int4(jnp.asarray(codes))
        assert packed.shape == (3, 5, 2, 32)
        out = np.asarray(unpack_int4(packed))
        np.testing.assert_array_equal(out, codes)

    def test_full_nibble_range(self):
        codes = jnp.asarray(np.array([range(-8, 8)], dtype=np.int8))
        np.testing.assert_array_equal(
            np.asarray(unpack_int4(pack_int4(codes))), np.asarray(codes)
        )

    def test_int4_cache_is_half_the_bytes_of_int8(self):
        c8 = QuantLayerKVCache.empty(2, 128, 4, 64, bits=8)
        c4 = QuantLayerKVCache.empty(2, 128, 4, 64, bits=4)
        assert c4.k.nbytes * 2 == c8.k.nbytes
        assert c4.v.nbytes * 2 == c8.v.nbytes
        assert c4.k_scale.shape == c8.k_scale.shape
        assert c4.head_dim == c8.head_dim == 64

    @pytest.mark.parametrize("bits", [8, 4])
    def test_dequant_roundtrip_error_bound(self, bits):
        rng = np.random.default_rng(1)
        k = jnp.asarray(rng.normal(size=(1, 4, 2, 64)).astype(np.float32))
        c = QuantLayerKVCache.empty(1, 4, 2, 64, bits=bits).update(
            k, k, jnp.asarray(0)
        )
        kd, vd = c.dequant(jnp.float32)
        qmax = 7 if bits == 4 else 127
        bound = np.abs(np.asarray(k)).max(axis=-1, keepdims=True) / qmax * 0.51
        assert np.all(np.abs(np.asarray(kd) - np.asarray(k)) <= bound + 1e-6)
        np.testing.assert_array_equal(np.asarray(kd), np.asarray(vd))


def _reference_decode(q, cache, q_positions, *, scale, window=None, softcap=None):
    kc, vc = cache.dequant(q.dtype)
    return gqa_attention(
        q, kc, vc, q_positions, scale=scale, window=window, logit_softcap=softcap
    )


def _setup(bits, *, B=2, T=256, Hq=4, Hkv=2, D=64, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    lengths = np.array([T // 2 - 3, T][:B][:B], dtype=np.int32)
    if B > 2:
        lengths = rng.integers(1, T + 1, size=B).astype(np.int32)
    cache = QuantLayerKVCache.empty(B, T, Hkv, D, bits=bits)
    # fill each row to its length via one aligned prefill per row
    for b in range(B):
        kv = jnp.asarray(rng.normal(size=(1, int(lengths[b]), Hkv, D)).astype(np.float32), dtype)
        v = jnp.asarray(rng.normal(size=(1, int(lengths[b]), Hkv, D)).astype(np.float32), dtype)
        cache = cache.update(kv, v, jnp.asarray(0), row=jnp.asarray(b))
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)).astype(np.float32), dtype)
    return q, cache, jnp.asarray(lengths)


@pytest.mark.parametrize("bits", [8, 4])
def test_kernel_matches_xla_dequant_path(bits):
    q, cache, lengths = _setup(bits)
    scale = 0.125
    out = quant_decode_attention(
        q, cache.k, cache.v, cache.k_scale, cache.v_scale, lengths,
        n_kv_heads=2, bits=bits, scale=scale, block_t=128, interpret=True,
    )
    ref = _reference_decode(q, cache, (lengths - 1)[:, None], scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_kernel_window_and_softcap():
    q, cache, lengths = _setup(8, T=256)
    out = quant_decode_attention(
        q, cache.k, cache.v, cache.k_scale, cache.v_scale, lengths,
        n_kv_heads=2, bits=8, scale=0.125, window=64, logit_softcap=30.0,
        block_t=128, interpret=True,
    )
    ref = _reference_decode(
        q, cache, (lengths - 1)[:, None], scale=0.125, window=64, softcap=30.0
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_kernel_empty_row_is_finite():
    q, cache, _ = _setup(8, T=256)
    lengths = jnp.asarray(np.array([0, 5], dtype=np.int32))
    out = quant_decode_attention(
        q, cache.k, cache.v, cache.k_scale, cache.v_scale, lengths,
        n_kv_heads=2, bits=8, scale=0.125, block_t=128, interpret=True,
    )
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_array_equal(np.asarray(out[0]), 0.0)


def test_kernel_ragged_batch():
    q, cache, _ = _setup(4, B=2, T=512)
    lengths = jnp.asarray(np.array([1, 389], dtype=np.int32))
    out = quant_decode_attention(
        q, cache.k, cache.v, cache.k_scale, cache.v_scale, lengths,
        n_kv_heads=2, bits=4, scale=0.1, block_t=128, interpret=True,
    )
    ref = _reference_decode(q, cache, (lengths - 1)[:, None], scale=0.1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_decode_after_prefill_matches_full_recompute():
    """End-to-end invariant through the cache API: quantize-at-write +
    fused-read decode ≡ dequant + masked SDPA over the same codes."""
    rng = np.random.default_rng(7)
    B, T, Hkv, Hq, D = 1, 128, 2, 4, 64
    cache = QuantLayerKVCache.empty(B, T, Hkv, D, bits=4)
    pre = jnp.asarray(rng.normal(size=(B, 40, Hkv, D)).astype(np.float32))
    cache = cache.update(pre, pre * 0.5, jnp.asarray(0))
    # one decode step appended per-row
    k1 = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)).astype(np.float32))
    cache = cache.update(k1, k1, jnp.asarray(np.array([40], dtype=np.int32)))
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)).astype(np.float32))
    lengths = jnp.asarray(np.array([41], dtype=np.int32))
    out = quant_decode_attention(
        q, cache.k, cache.v, cache.k_scale, cache.v_scale, lengths,
        n_kv_heads=2, bits=4, scale=D**-0.5, block_t=128, interpret=True,
    )
    ref = _reference_decode(q, cache, (lengths - 1)[:, None], scale=D**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


# ── bits=16: same kernel over an fp cache (live-length clamp for the
# default serving decode path) ───────────────────────────────────────────────


def _setup_fp(*, B=2, T=256, Hq=4, Hkv=2, D=64, seed=0, dtype=jnp.float32):
    from crane_tpu.ops.kv_cache import LayerKVCache

    rng = np.random.default_rng(seed)
    lengths = np.array([T // 2 - 3, T][:B], dtype=np.int32)
    cache = LayerKVCache.empty(B, T, Hkv, D, dtype=dtype)
    for b in range(B):
        k = jnp.asarray(rng.normal(size=(1, int(lengths[b]), Hkv, D)).astype(np.float32), dtype)
        v = jnp.asarray(rng.normal(size=(1, int(lengths[b]), Hkv, D)).astype(np.float32), dtype)
        cache = cache.update(k, v, jnp.asarray(0), row=jnp.asarray(b))
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)).astype(np.float32), dtype)
    return q, cache, jnp.asarray(lengths)


def test_fp_kernel_matches_xla_path():
    q, cache, lengths = _setup_fp()
    out = quant_decode_attention(
        q, cache.k, cache.v, None, None, lengths,
        bits=16, scale=0.125, block_t=128, interpret=True,
    )
    ref = gqa_attention(q, cache.k, cache.v, (lengths - 1)[:, None], scale=0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_fp_kernel_window_softcap_and_empty_row():
    q, cache, _ = _setup_fp(T=256)
    lengths = jnp.asarray(np.array([0, 200], dtype=np.int32))
    out = quant_decode_attention(
        q, cache.k, cache.v, None, None, lengths,
        bits=16, scale=0.125, window=64, logit_softcap=30.0,
        block_t=128, interpret=True,
    )
    ref = gqa_attention(
        q, cache.k, cache.v, (lengths - 1)[:, None], scale=0.125,
        window=64, logit_softcap=30.0,
    )
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_array_equal(np.asarray(out[0]), 0.0)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]), atol=2e-5, rtol=1e-4)


def test_block_t_256_on_non_512_multiple_buffer():
    """A 768-slot cache (multiple of 256, not 512) must work with the
    256 block the dispatch now selects (used to assert-crash at 512)."""
    q, cache, lengths = _setup_fp(T=768)
    out = quant_decode_attention(
        q, cache.k, cache.v, None, None, lengths,
        bits=16, scale=0.125, block_t=256, interpret=True,
    )
    ref = gqa_attention(q, cache.k, cache.v, (lengths - 1)[:, None], scale=0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


# ── cached-continuation kernel (storage-layout caches) ──────────────────────

from crane_tpu.ops.pallas.quant_attention import quant_cached_attention


def _rngf(*shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32)


@pytest.mark.parametrize(
    "B,ctx,S,T,Hq,Hkv,D,bq,bk",
    [
        (1, 40, 32, 128, 4, 2, 32, 16, 16),   # GQA continuation mid-buffer
        (2, 17, 48, 96, 2, 2, 16, 16, 32),    # ragged ctx, padded q blocks
        (1, 0, 32, 64, 8, 1, 8, 16, 16),      # fresh (ctx=0) chunk
    ],
)
def test_cached_fp_matches_sdpa(B, ctx, S, T, Hq, Hkv, D, bq, bk):
    q = _rngf(B, S, Hq, D, seed=1)
    k = _rngf(B, T, Hkv, D, seed=2)
    v = _rngf(B, T, Hkv, D, seed=3)
    positions = jnp.broadcast_to(jnp.arange(S)[None] + ctx, (B, S)).astype(jnp.int32)
    ref = gqa_attention(q, k, v, positions, scale=D ** -0.5)
    got = quant_cached_attention(
        q, k, v, None, None, positions, bits=16, scale=D ** -0.5,
        block_q=bq, block_k=bk, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("window,softcap", [(None, None), (24, None), (None, 30.0)])
def test_cached_int8_matches_xla_dequant(window, softcap):
    B, ctx, S, T, Hq, Hkv, D = 2, 30, 32, 128, 4, 2, 32
    cache = QuantLayerKVCache.empty(B, T, Hkv, D, bits=8)
    k_new = _rngf(B, ctx + S, Hkv, D, seed=5)
    v_new = _rngf(B, ctx + S, Hkv, D, seed=6)
    cache = cache.update(k_new, v_new, jnp.zeros((B,), jnp.int32))
    q = _rngf(B, S, Hq, D, seed=4)
    positions = jnp.broadcast_to(jnp.arange(S)[None] + ctx, (B, S)).astype(jnp.int32)

    kd, vd = cache.dequant(jnp.float32)
    ref = gqa_attention(q, kd, vd, positions, scale=D ** -0.5,
                        window=window, logit_softcap=softcap)
    got = quant_cached_attention(
        q, cache.k, cache.v, cache.k_scale, cache.v_scale, positions,
        n_kv_heads=Hkv, bits=8, scale=D ** -0.5, window=window,
        logit_softcap=softcap, block_q=16, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=2e-5)


def test_cached_int8_garbage_beyond_live_region_ignored():
    B, ctx, S, T, Hq, Hkv, D = 1, 24, 16, 128, 2, 2, 16
    cache = QuantLayerKVCache.empty(B, T, Hkv, D, bits=8)
    k_new = _rngf(B, ctx + S, Hkv, D, seed=7)
    v_new = _rngf(B, ctx + S, Hkv, D, seed=8)
    cache = cache.update(k_new, v_new, jnp.zeros((B,), jnp.int32))
    q = _rngf(B, S, Hq, D, seed=9)
    positions = (jnp.arange(S)[None] + ctx).astype(jnp.int32)
    out1 = quant_cached_attention(
        q, cache.k, cache.v, cache.k_scale, cache.v_scale, positions,
        n_kv_heads=Hkv, bits=8, scale=D ** -0.5, block_q=16, block_k=16,
        interpret=True)
    live = ctx + S
    poisoned = dataclasses.replace(
        cache,
        k=cache.k.at[:, live:].set(99),
        v=cache.v.at[:, live:].set(-77),
        k_scale=cache.k_scale.at[:, :, live:].set(1e9),
        v_scale=cache.v_scale.at[:, :, live:].set(1e9),
    )
    out2 = quant_cached_attention(
        q, poisoned.k, poisoned.v, poisoned.k_scale, poisoned.v_scale,
        positions, n_kv_heads=Hkv, bits=8, scale=D ** -0.5, block_q=16,
        block_k=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


@pytest.mark.parametrize("window,softcap", [(None, None), (24, 30.0)])
def test_cached_int4_matches_xla_dequant(window, softcap):
    B, ctx, S, T, Hq, Hkv, D = 2, 30, 32, 128, 4, 2, 32
    cache = QuantLayerKVCache.empty(B, T, Hkv, D, bits=4)
    k_new = _rngf(B, ctx + S, Hkv, D, seed=15)
    v_new = _rngf(B, ctx + S, Hkv, D, seed=16)
    cache = cache.update(k_new, v_new, jnp.zeros((B,), jnp.int32))
    q = _rngf(B, S, Hq, D, seed=14)
    positions = jnp.broadcast_to(jnp.arange(S)[None] + ctx, (B, S)).astype(jnp.int32)

    kd, vd = cache.dequant(jnp.float32)
    ref = gqa_attention(q, kd, vd, positions, scale=D ** -0.5,
                        window=window, logit_softcap=softcap)
    got = quant_cached_attention(
        q, cache.k, cache.v, cache.k_scale, cache.v_scale, positions,
        n_kv_heads=Hkv, bits=4, scale=D ** -0.5, window=window,
        logit_softcap=softcap, block_q=16, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=2e-5)
