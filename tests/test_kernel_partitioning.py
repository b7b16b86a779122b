"""SPMD partitioning of the Pallas attention kernels.

A ``pallas_call`` is an opaque custom call: without a sharding rule the SPMD
partitioner all-gathers every operand (the whole KV cache buffer, per layer,
per step) and runs the kernel replicated. ``ops/pallas/partitioning.py``
registers custom_partitioning rules so the kernels shard over the
(batch, kv-head) mesh axes instead. These tests run the kernels (interpret
mode) under a real 8-device SPMD jit and assert:

- numerics are identical to the single-device call,
- the per-shard lowering really ran on LOCAL shapes (trace hook),
- the compiled HLO contains no all-gather of cache-sized operands.

No reference counterpart (single-device by design, SURVEY.md §2.9).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from crane_tpu.ops.kv_cache import QuantLayerKVCache, LayerKVCache
from crane_tpu.ops.pallas import partitioning
from crane_tpu.ops.pallas.flash_attention import (
    flash_attention_cached,
    flash_attention_causal,
)
from crane_tpu.ops.pallas.quant_attention import quant_decode_attention

B, T, Hq, Hkv, D = 2, 256, 16, 8, 128
SCALE = float(D) ** -0.5


def _mesh(dp, tp):
    dev = jax.devices()
    if len(dev) < dp * tp:
        pytest.skip(f"needs {dp * tp} devices")
    return Mesh(np.asarray(dev[: dp * tp]).reshape(dp, tp), ("dp", "tp"))


def _quant_setup(bits):
    rng = np.random.default_rng(0)
    cache = QuantLayerKVCache.empty(B, T, Hkv, D, bits=bits)
    k_new = jnp.asarray(rng.normal(size=(B, 200, Hkv, D)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(B, 200, Hkv, D)), jnp.float32)
    cache = cache.update(k_new, v_new, jnp.zeros((B,), jnp.int32))
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)), jnp.bfloat16)
    lengths = jnp.asarray([200, 129], jnp.int32)
    return q, cache, lengths


def _shard(mesh, x, spec):
    return jax.device_put(x, NamedSharding(mesh, spec))


@pytest.mark.parametrize("bits", [8, 4])
def test_quant_kernel_partitions_over_heads_and_batch(bits):
    q, cache, lengths = _quant_setup(bits)
    ref = quant_decode_attention(
        q, cache.k, cache.v, cache.k_scale, cache.v_scale, lengths,
        n_kv_heads=Hkv, bits=bits, scale=SCALE, block_t=128, interpret=True)

    mesh = _mesh(2, 4)
    args = (
        _shard(mesh, q, P("dp", None, "tp", None)),
        _shard(mesh, cache.k, P("dp", None, "tp")),
        _shard(mesh, cache.v, P("dp", None, "tp")),
        _shard(mesh, cache.k_scale, P("dp", "tp", None)),
        _shard(mesh, cache.v_scale, P("dp", "tp", None)),
        _shard(mesh, lengths, P("dp")),
    )

    partitioning.partition_trace_log.clear()
    fn = jax.jit(lambda *a: quant_decode_attention(
        *a, n_kv_heads=Hkv, bits=bits, scale=SCALE, block_t=128,
        interpret=True))
    out = fn(*args)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=1e-5, rtol=1e-5)

    # the per-shard lowering saw local shapes: B/dp=1 rows, Hkv/tp=2 heads
    stored = D // 2 if bits == 4 else D
    shapes = [s for n, s in partitioning.partition_trace_log
              if n == "quant_decode_attention"]
    assert ((1, 1, Hq // 4, D), (1, T, (Hkv // 4) * stored)) in [
        (s[0], s[1]) for s in shapes], partitioning.partition_trace_log

    txt = fn.lower(*args).compile().as_text()
    assert "all-gather" not in txt, "cache operands were gathered"


def test_fp_kernel_partitions_over_heads():
    rng = np.random.default_rng(1)
    cache = LayerKVCache.empty(B, T, Hkv, D, jnp.bfloat16)
    k_new = jnp.asarray(rng.normal(size=(B, 200, Hkv, D)), jnp.bfloat16)
    v_new = jnp.asarray(rng.normal(size=(B, 200, Hkv, D)), jnp.bfloat16)
    cache = cache.update(k_new, v_new, jnp.zeros((B,), jnp.int32))
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)), jnp.bfloat16)
    lengths = jnp.asarray([200, 129], jnp.int32)

    ref = quant_decode_attention(
        q, cache.k, cache.v, None, None, lengths,
        bits=16, scale=SCALE, block_t=128, interpret=True)

    mesh = _mesh(1, 8)
    spec = P(None, None, "tp", None)
    args = (
        _shard(mesh, q, spec),
        _shard(mesh, cache.k, spec),
        _shard(mesh, cache.v, spec),
        _shard(mesh, lengths, P()),
    )
    partitioning.partition_trace_log.clear()
    fn = jax.jit(lambda qq, kk, vv, ll: quant_decode_attention(
        qq, kk, vv, None, None, ll, bits=16, scale=SCALE, block_t=128,
        interpret=True))
    out = fn(*args)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=1e-5, rtol=1e-5)
    shapes = [s for n, s in partitioning.partition_trace_log
              if n == "fp_decode_attention"]
    assert ((B, 1, Hq // 8, D), (B, T, Hkv // 8, D)) in [
        (s[0], s[1]) for s in shapes], partitioning.partition_trace_log
    assert "all-gather" not in fn.lower(*args).compile().as_text()


def test_flash_causal_partitions_over_heads():
    rng = np.random.default_rng(2)
    S = 256
    q = jnp.asarray(rng.normal(size=(B, S, Hq, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.bfloat16)
    ref = flash_attention_causal(
        q, k, v, scale=SCALE, block_q=128, block_k=128, interpret=True)

    mesh = _mesh(2, 4)
    spec = P("dp", None, "tp", None)
    args = tuple(_shard(mesh, x, spec) for x in (q, k, v))
    partitioning.partition_trace_log.clear()
    fn = jax.jit(lambda qq, kk, vv: flash_attention_causal(
        qq, kk, vv, scale=SCALE, block_q=128, block_k=128, interpret=True))
    out = fn(*args)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=1e-5, rtol=1e-5)
    shapes = [s for n, s in partitioning.partition_trace_log
              if n == "flash_attention_causal"]
    assert ((1, S, Hq // 4, D), (1, S, Hkv // 4, D)) in [
        (s[0], s[1]) for s in shapes], partitioning.partition_trace_log
    assert "all-gather" not in fn.lower(*args).compile().as_text()


def test_flash_cached_partitions_over_heads():
    rng = np.random.default_rng(3)
    S, ctx = 64, 100
    cache = LayerKVCache.empty(B, T, Hkv, D, jnp.bfloat16)
    k_ctx = jnp.asarray(rng.normal(size=(B, ctx + S, Hkv, D)), jnp.bfloat16)
    v_ctx = jnp.asarray(rng.normal(size=(B, ctx + S, Hkv, D)), jnp.bfloat16)
    cache = cache.update(k_ctx, v_ctx, jnp.zeros((B,), jnp.int32))
    q = jnp.asarray(rng.normal(size=(B, S, Hq, D)), jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(ctx, ctx + S, dtype=jnp.int32), (B, S))

    ref = flash_attention_cached(
        q, cache.k, cache.v, pos, scale=SCALE, block_q=64, block_k=128,
        interpret=True)

    mesh = _mesh(1, 8)
    spec = P(None, None, "tp", None)
    args = (
        _shard(mesh, q, spec),
        _shard(mesh, cache.k, spec),
        _shard(mesh, cache.v, spec),
        _shard(mesh, pos, P()),
    )
    partitioning.partition_trace_log.clear()
    fn = jax.jit(lambda qq, kk, vv, pp: flash_attention_cached(
        qq, kk, vv, pp, scale=SCALE, block_q=64, block_k=128,
        interpret=True))
    out = fn(*args)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=1e-5, rtol=1e-5)
    shapes = [s for n, s in partitioning.partition_trace_log
              if n == "flash_attention_cached"]
    assert ((B, S, Hq // 8, D), (B, T, Hkv // 8, D)) in [
        (s[0], s[1]) for s in shapes], partitioning.partition_trace_log
    assert "all-gather" not in fn.lower(*args).compile().as_text()


def test_indivisible_head_axis_falls_back_to_replication():
    """tp=8 cannot divide Hkv=2 — the partition rule must decline the head
    axis (replicate) and still produce correct numerics."""
    rng = np.random.default_rng(4)
    hq, hkv = 4, 2
    cache = QuantLayerKVCache.empty(B, T, hkv, D, bits=8)
    k_new = jnp.asarray(rng.normal(size=(B, 64, hkv, D)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(B, 64, hkv, D)), jnp.float32)
    cache = cache.update(k_new, v_new, jnp.zeros((B,), jnp.int32))
    q = jnp.asarray(rng.normal(size=(B, 1, hq, D)), jnp.bfloat16)
    lengths = jnp.asarray([64, 33], jnp.int32)

    ref = quant_decode_attention(
        q, cache.k, cache.v, cache.k_scale, cache.v_scale, lengths,
        n_kv_heads=hkv, bits=8, scale=SCALE, block_t=64, interpret=True)

    mesh = _mesh(2, 4)
    args = (
        _shard(mesh, q, P("dp")),
        _shard(mesh, cache.k, P("dp")),
        _shard(mesh, cache.v, P("dp")),
        _shard(mesh, cache.k_scale, P("dp")),
        _shard(mesh, cache.v_scale, P("dp")),
        _shard(mesh, lengths, P("dp")),
    )
    out = jax.jit(lambda *a: quant_decode_attention(
        *a, n_kv_heads=hkv, bits=8, scale=SCALE, block_t=64,
        interpret=True))(*args)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=1e-5, rtol=1e-5)
