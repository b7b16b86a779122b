"""Pallas TPU flash attention for causal GQA prefill.

Replaces the XLA SDPA path for long prompts: online-softmax over KV blocks so
the ``[S, T]`` logit matrix is never materialized in HBM (the reference's CPU
flash-attention analog, modules/flash_attn.rs, rebuilt for the MXU). GQA is
handled in the index map — K/V blocks are fetched per kv-head (``h // G``)
and never repeated.

Layout: ``[B, H, S, D]`` with D = lane dim (128). Grid ``(B, H_q, S/Bq,
S/Bk)`` with the KV axis innermost (sequential on TPU), carrying the running
max/sum/accumulator in VMEM scratch. Fully-masked blocks above the causal
diagonal skip their compute via predication.

Used for fresh prefill (positions from 0, S == T) via
:func:`flash_attention_causal`, and for CACHED-CONTINUATION prefill (new
chunk of S queries at positions ``start..start+S-1`` attending the full
cache buffer) via :func:`flash_attention_cached`, whose KV index map clamps
to the per-row live length so a continuation at length L moves
O(S * L) HBM bytes instead of the whole ``[max_seq]`` buffer the XLA path
materializes. Decode (S == 1) goes through the fused kernel in
``quant_attention.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

_NEG_INF = -1e30


def _flash_kernel(*refs, scale, block_q, block_k, window, softcap, segmented):
    if segmented:
        (q_ref, k_ref, v_ref, qs_ref, ks_ref, o_ref,
         m_scr, l_scr, acc_scr) = refs
    else:
        q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr = refs
    i = pl.program_id(2)
    j = pl.program_id(3)
    nj = pl.num_programs(3)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_start = i * block_q
    kv_start = j * block_k

    # skip blocks entirely above the causal diagonal, and (for a sliding
    # window) blocks entirely below the window band: keys participate iff
    # qi - window < kj <= qi (ops/attention.py::attention_mask)
    relevant = kv_start <= q_start + block_q - 1
    if window is not None:
        relevant &= kv_start + block_k - 1 > q_start - window
    if segmented:
        # bidirectional same-segment pairs (id > 0) resurrect blocks the
        # causal/window tests would skip — data-dependent predicate
        qs = qs_ref[0][:, None]  # [Bq, 1]
        ks = ks_ref[0][None, :]  # [1, Bk]
        same_seg = (qs == ks) & (qs > 0)
        relevant |= jnp.any(same_seg)

    @pl.when(relevant)
    def _():
        q = q_ref[0, 0].astype(jnp.float32)  # [Bq, D]
        k = k_ref[0, 0].astype(jnp.float32)  # [Bk, D]
        v = v_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [Bq, Bk]
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)
        qi = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) + q_start
        kj = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + kv_start
        mask = qi >= kj
        if window is not None:
            mask &= kj > qi - window
        if segmented:
            # (causal & window) | same-segment — matches gqa_attention's
            # extra_mask OR (image blocks bidirectional, Gemma3 VLM)
            mask |= same_seg
        s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_scr[:, :1]  # [Bq, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)  # [Bq, 1]
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jnp.dot(
            p, v, preferred_element_type=jnp.float32
        )
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(j == nj - 1)
    def _():
        o_ref[0, 0] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)


def _flash_causal_impl(
    q, k, v, segments, *,
    scale, block_q, block_k, window, softcap, interpret,
):
    """Causal GQA flash attention, optionally sliding-window and softcapped.

    q ``[B, S, Hq, D]``, k/v ``[B, S, Hkv, D]`` (fresh prefill: positions
    0..S-1). Returns ``[B, S, Hq, D]`` in q.dtype. ``window``: keys with
    ``kj <= qi - window`` are masked (Gemma3 sliding layers) AND their
    blocks are skipped entirely — windowed prefill is O(S * window) compute.
    ``softcap``: Gemma2-style ``softcap * tanh(s / softcap)`` on the scaled
    logits. ``segments [B, S]`` int32: tokens with equal POSITIVE ids attend
    bidirectionally (Gemma3-VLM image blocks; 0 = causal-only text); the
    final mask is ``(causal & window) | same_segment``, and above-diagonal
    blocks are only fetched when a segment actually spans them.

    Default blocks tuned on one v5e (Hq=16/Hkv=8/D=128, median-of-3 chain
    timing at S=4096): (256, 512) runs 0.97 ms vs 2.70 ms for (256, 256) —
    larger KV blocks halve the grid steps along the scan axis and pipeline
    better; (512, 512) was occasionally faster but high-variance. Blocks are
    clamped to S, so short prefills are unaffected.
    """
    B, S, Hq, D = q.shape
    Hkv = k.shape[2]
    G = Hq // Hkv

    qt = q.transpose(0, 2, 1, 3)  # [B, Hq, S, D]
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    block_q = min(block_q, S)
    block_k = min(block_k, S)
    pad_q = (-S) % block_q
    pad_k = (-S) % block_k
    Sq, Sk = S + pad_q, S + pad_k
    if pad_q:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        # padded KV sits at positions > any real query -> causally masked
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, pad_k), (0, 0)))

    kernel = functools.partial(
        _flash_kernel, scale=scale, block_q=block_q, block_k=block_k,
        window=window, softcap=softcap, segmented=segments is not None,
    )
    if segments is None:
        # clamp the KV block index into the causal/window band: repeated
        # indices make Pallas skip the DMA, so irrelevant blocks move no
        # HBM bytes (windowed prefill is O(S*window) in traffic too, not
        # just compute). With segments the needed set is data-dependent —
        # every block is fetched and the in-kernel predicate decides.
        def kv_index(b, h, i, j):
            jj = jnp.minimum(j, (i * block_q + block_q - 1) // block_k)
            if window is not None:
                jj = jnp.maximum(jj, jnp.maximum(
                    (i * block_q - window + 1) // block_k, 0))
            return (b, h // G, jj, 0)
    else:
        def kv_index(b, h, i, j):
            return (b, h // G, j, 0)

    in_specs = [
        pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, D), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, D), kv_index, memory_space=pltpu.VMEM),
    ]
    operands = [qt, kt, vt]
    if segments is not None:
        seg = segments.astype(jnp.int32)
        seg_q = jnp.pad(seg, ((0, 0), (0, pad_q))) if pad_q else seg
        seg_k = jnp.pad(seg, ((0, 0), (0, pad_k))) if pad_k else seg
        in_specs += [
            pl.BlockSpec((1, block_q), lambda b, h, i, j: (b, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k), lambda b, h, i, j: (b, j),
                         memory_space=pltpu.VMEM),
        ]
        operands += [seg_q, seg_k]
    out = pl.pallas_call(
        kernel,
        grid=(B, Hq, Sq // block_q, Sk // block_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, Sq, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max
            pltpu.VMEM((block_q, 128), jnp.float32),  # running sum
            pltpu.VMEM((block_q, D), jnp.float32),  # output accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(2 * 2 * B * Hq * Sq * Sk * D // 2),
            bytes_accessed=int(B * (Hq + 2 * Hkv) * S * D * 2),
            transcendentals=int(B * Hq * Sq * Sk // 2),
        ),
        interpret=interpret,
    )(*operands)

    return out[:, :, :S].transpose(0, 2, 1, 3)


@functools.lru_cache(maxsize=None)
def _partitioned_causal(Hkv, G, segmented, scale, block_q, block_k, window,
                        softcap, interpret):
    from crane_tpu.ops.pallas.partitioning import make_head_partitioned

    kwargs = dict(scale=scale, block_q=block_q, block_k=block_k,
                  window=window, softcap=softcap, interpret=interpret)
    qspec = lambda b, h: P(b, None, h, None)
    if segmented:
        def fn(q, k, v, seg):
            return _flash_causal_impl(q, k, v, seg, **kwargs)
        templates = [qspec, qspec, qspec, lambda b, h: P(b, None), qspec]
        rule = "b s (h g) d, b t h d, b t h d, b s -> b s (h g) d"
    else:
        def fn(q, k, v):
            return _flash_causal_impl(q, k, v, None, **kwargs)
        templates = [qspec, qspec, qspec, qspec]
        rule = "b s (h g) d, b t h d, b t h d -> b s (h g) d"
    return make_head_partitioned(
        "flash_attention_causal", fn,
        templates=templates,
        batch_sources=[(0, 0), (1, 0)],
        head_sources=[(1, 2), (0, 2)],
        n_heads_total=Hkv,
        rule=rule,
        need_replication_factors=("s", "g", "d", "t"),
        factor_sizes=dict(g=G),
    )


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "window", "softcap",
                     "interpret"),
)
def flash_attention_causal(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    segments: jax.Array | None = None,
    *,
    scale: float,
    block_q: int = 256,
    block_k: int = 512,
    window: int | None = None,
    softcap: float | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Causal GQA flash attention (see :func:`_flash_causal_impl` for the
    full contract). Under a sharded jit the call partitions over the
    (batch, kv-head) mesh axes with zero collectives
    (``ops/pallas/partitioning.py``) instead of being replicated."""
    Hkv = k.shape[2]
    fn = _partitioned_causal(
        Hkv, q.shape[2] // Hkv, segments is not None, scale, block_q,
        block_k, window, softcap, interpret)
    if segments is None:
        return fn(q, k, v)
    return fn(q, k, v, segments)


# ── cached-continuation prefill ─────────────────────────────────────────────


def _cached_kernel(
    pos_sref, q_ref, k_ref, v_ref, pos_ref, o_ref, m_scr, l_scr, acc_scr,
    *, scale, block_q, block_k, window, softcap,
):
    b = pl.program_id(0)
    i = pl.program_id(2)
    j = pl.program_id(3)
    nj = pl.num_programs(3)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    kv_start = j * block_k
    # absolute positions of this q block (SMEM scalars, monotone along S)
    q_lo = pos_sref[b, i * block_q]
    q_hi = pos_sref[b, i * block_q + block_q - 1]
    relevant = kv_start <= q_hi
    if window is not None:
        relevant &= kv_start + block_k - 1 > q_lo - window

    @pl.when(relevant)
    def _():
        q = q_ref[0, 0].astype(jnp.float32)  # [Bq, D]
        k = k_ref[0, 0].astype(jnp.float32)  # [Bk, D]
        v = v_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)
        qi = pos_ref[0][:, None]  # [Bq, 1] absolute query positions
        kj = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + kv_start
        mask = qi >= kj
        if window is not None:
            mask &= kj > qi - window
        s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jnp.dot(
            p, v, preferred_element_type=jnp.float32
        )
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(j == nj - 1)
    def _():
        denom = l_scr[:, :1]
        denom = jnp.where(denom == 0.0, 1.0, denom)  # fully-padded q rows
        o_ref[0, 0] = (acc_scr[:] / denom).astype(o_ref.dtype)


def _flash_cached_impl(
    q, k_cache, v_cache, positions, *,
    scale, block_q, block_k, window, softcap, interpret,
):
    """Causal GQA flash attention for a continuation chunk over cache buffers.

    q ``[B, S, Hq, D]`` — the new chunk; k/v ``[B, T, Hkv, D]`` — the FULL
    cache buffers (context + the just-written chunk, T = allocated max_seq,
    multiple of block_k); positions ``[B, S]`` int32 — absolute query
    positions (monotone along S; the chunk occupies cache slots
    ``positions``). Returns ``[B, S, Hq, D]``.

    The per-row live length never needs to be passed: causality bounds it.
    The KV index map clamps block j to ``positions[b, block_end] // block_k``
    and Pallas skips the DMA when the index repeats, so a continuation at
    context length L moves ceil((L+S)/block_k) KV blocks per q block —
    reference-style dequantize-on-read buffers become O(S*(L+S)) traffic
    instead of O(S*T) (the quant_attention live-length clamp, generalized
    from S == 1 to chunks).
    """
    B, S, Hq, D = q.shape
    T, Hkv = k_cache.shape[1], k_cache.shape[2]
    G = Hq // Hkv

    block_q = min(block_q, S)
    block_k = min(block_k, T)
    assert T % block_k == 0, (T, block_k)
    pad_q = (-S) % block_q
    Sq = S + pad_q

    qt = q.transpose(0, 2, 1, 3)  # [B, Hq, S, D]
    kt = k_cache.transpose(0, 2, 1, 3)  # [B, Hkv, T, D]
    vt = v_cache.transpose(0, 2, 1, 3)
    # bucket-padded tail queries carry positions past the live region; clamp
    # so the index map never points outside the allocated buffer
    pos = jnp.minimum(positions.astype(jnp.int32), T - 1)
    if pad_q:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        pos = jnp.pad(pos, ((0, 0), (0, pad_q)), mode="edge")

    def kv_index(b, h, i, j, pos_s):
        jj = jnp.minimum(j, pos_s[b, i * block_q + block_q - 1] // block_k)
        if window is not None:
            jj = jnp.maximum(jj, jnp.maximum(
                (pos_s[b, i * block_q] - window + 1) // block_k, 0))
        return (b, h // G, jj, 0)

    kernel = functools.partial(
        _cached_kernel, scale=scale, block_q=block_q, block_k=block_k,
        window=window, softcap=softcap,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Hq, Sq // block_q, T // block_k),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D),
                             lambda b, h, i, j, pos_s: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_k, D), kv_index),
                pl.BlockSpec((1, 1, block_k, D), kv_index),
                pl.BlockSpec((1, block_q),
                             lambda b, h, i, j, pos_s: (b, i)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, block_q, D), lambda b, h, i, j, pos_s: (b, h, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),  # running max
                pltpu.VMEM((block_q, 128), jnp.float32),  # running sum
                pltpu.VMEM((block_q, D), jnp.float32),  # output accumulator
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, Sq, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * 2 * B * Hq * Sq * T * D // 2),
            bytes_accessed=int(B * (Hq * S + 2 * Hkv * T) * D * 2),
            transcendentals=int(B * Hq * Sq * T // 2),
        ),
        interpret=interpret,
    )(pos, qt, kt, vt, pos)

    return out[:, :, :S].transpose(0, 2, 1, 3)


@functools.lru_cache(maxsize=None)
def _partitioned_cached(Hkv, G, scale, block_q, block_k, window, softcap,
                        interpret):
    from crane_tpu.ops.pallas.partitioning import make_head_partitioned

    def fn(q, k, v, pos):
        return _flash_cached_impl(
            q, k, v, pos, scale=scale, block_q=block_q, block_k=block_k,
            window=window, softcap=softcap, interpret=interpret)

    qspec = lambda b, h: P(b, None, h, None)
    return make_head_partitioned(
        "flash_attention_cached", fn,
        templates=[qspec, qspec, qspec, lambda b, h: P(b, None), qspec],
        batch_sources=[(0, 0), (1, 0)],
        head_sources=[(1, 2), (0, 2)],
        n_heads_total=Hkv,
        rule="b s (h g) d, b t h d, b t h d, b s -> b s (h g) d",
        need_replication_factors=("s", "g", "d", "t"),
        factor_sizes=dict(g=G),
    )


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "window", "softcap",
                     "interpret"),
)
def flash_attention_cached(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    positions: jax.Array,
    *,
    scale: float,
    block_q: int = 256,
    block_k: int = 512,
    window: int | None = None,
    softcap: float | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Cached-continuation flash attention (contract in
    :func:`_flash_cached_impl`). Under a sharded jit the call partitions
    over the (batch, kv-head) mesh axes with zero collectives."""
    Hkv = k_cache.shape[2]
    fn = _partitioned_cached(
        Hkv, q.shape[2] // Hkv, scale, block_q, block_k, window, softcap,
        interpret)
    return fn(q, k_cache, v_cache, positions)
