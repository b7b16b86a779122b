"""Pallas TPU kernel: decode attention fused with KV-cache dequantization.

Decode (S=1) attention over a quantized KV cache reads int8 codes (or
nibble-packed int4) plus per-(token, head) scales straight from HBM and
dequantizes in VMEM — KV HBM traffic is the quantized bytes, never a
materialized bf16 copy. This is the reference's stated follow-up to its
dequantize-on-read cache (/root/reference/crane-core/src/models/qwen3_5/
kv_cache.rs:217-221), shipped here as the default decode path.

Design (measured on one v5e at S=32k, Hq16/Hkv8/D128: int8 63 us/step vs
bf16 XLA 110 us — 1.75x, both at ~1.1 TB/s effective):

- ONE flat MXU dot per block instead of per-head small dots: codes are fed
  pre-flattened ``[T, Hkv*D]`` (a free reshape of the contiguous cache) and
  q arrives as a block-diagonal ``[Hq, Hkv*D]`` matrix built outside the
  kernel, so ``s = qbd @ k_blockᵀ`` computes every head's logits in one
  [Hq, HkvD] x [HkvD, Bt] matmul. The 8x FLOP overhead is free — decode
  attention is bandwidth-bound.
- Scales fold into logits, not operands: per-token scale s_t is constant
  along head_dim, so ``q . (c_t * s_t) == (q . c_t) * s_t``; scales arrive
  per-kv-head ``[Hkv, T]`` (the storage layout) and are expanded to query
  rows IN-KERNEL by a tiny 0/1-matrix MXU dot — a host-side repeat would
  materialize an ``[Hq, T]`` f32 plane per layer per step. More accurate
  than the XLA path (which rounds ``c*s`` to bf16 pre-matmul).
- Code operands are the cache's flat ``[B, T, Hkv*stored]`` buffers read AS
  STORED: any ``[B,T,H,d] -> [B,T,H*d]`` reshape on TPU is a relayout copy
  of the whole buffer (tiling folds major dims into sublanes), which would
  recur every decode step.
- Everything stays [Hq-on-sublanes, T-or-D-on-lanes]: no in-kernel reshapes
  or transposes (Mosaic cannot legalize lane-splitting reshapes).
- int4 uses arithmetic packing (``byte = 16*hi + lo``): unpack is
  ``hi = floor((b+8)*0.0625); lo = b - 16*hi`` — exact in f32 — and the lo /
  hi halves get separate dots against the matching qbd column halves, so no
  lane-concat relayout ever happens.
- Per-row valid lengths ride in scalar-prefetch SMEM: the KV index map
  clamps past-the-end block indices to the last valid block, and Pallas
  skips the DMA when the index repeats — a row at length L moves only
  ceil(L/block_t) blocks of HBM regardless of the allocated max_seq
  (measured: len 2048 in a 32k buffer = 80 us vs 318 us for XLA dequant).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

_NEG_INF = -1e30


def _kernel(
    lens_ref, qbd_ref, k_ref, v_ref, *rest,
    bits, scale, block_t, window, logit_softcap, n_kv_heads, group, head_dim,
    return_stats,
):
    if return_stats:
        ks_ref, vs_ref, o_ref, ms_ref, ls_ref, m_scr, l_scr, acc_scr = rest
    else:
        ks_ref, vs_ref, o_ref, m_scr, l_scr, acc_scr = rest
        ms_ref = ls_ref = None
    b = pl.program_id(0)
    j = pl.program_id(1)
    nt = pl.num_programs(1)
    lv = lens_ref[b]  # number of valid KV slots in this row
    Hq = n_kv_heads * group

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(j * block_t < lv)
    def _():
        qbd = qbd_ref[0]  # [Hq, Hkv*D] compute dtype, block-diagonal
        half = qbd.shape[1] // 2
        if bits == 4:
            kp = k_ref[0].astype(jnp.float32)  # [Bt, Hkv*D/2] packed bytes
            vp = v_ref[0].astype(jnp.float32)
            k_hi = jnp.floor((kp + 8.0) * 0.0625)
            k_lo = kp - 16.0 * k_hi
            v_hi = jnp.floor((vp + 8.0) * 0.0625)
            v_lo = vp - 16.0 * v_hi
            dt = qbd.dtype
            s = jax.lax.dot_general(
                qbd[:, :half], k_lo.astype(dt), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                qbd[:, half:], k_hi.astype(dt), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Hq, Bt]
        else:
            s = jax.lax.dot_general(
                qbd, k_ref[0].astype(qbd.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # expand per-kv-head scales [Hkv, Bt] to query rows [Hq, Bt] with
        # a 0/1-matrix MXU dot (qbd rows are kv-head-major, G per head) —
        # Mosaic cannot legalize a sublane-interleaving repeat, and doing
        # it outside the kernel materialized a [Hq, T] plane every step
        row_kv = jax.lax.broadcasted_iota(jnp.int32, (Hq, n_kv_heads), 0) // group
        col_kv = jax.lax.broadcasted_iota(jnp.int32, (Hq, n_kv_heads), 1)
        expand = (row_kv == col_kv).astype(jnp.float32)
        ks_full = jax.lax.dot_general(
            expand, ks_ref[0].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Hq, Bt]
        s = s * (ks_full * scale)
        if logit_softcap is not None:
            s = jnp.tanh(s / logit_softcap) * logit_softcap

        tok = jax.lax.broadcasted_iota(jnp.int32, (Hq, block_t), 1) + j * block_t
        valid = tok < lv
        if window is not None:
            valid = valid & (tok >= lv - window)
        s = jnp.where(valid, s, _NEG_INF)

        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)  # [Hq, 1]
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        vs_full = jax.lax.dot_general(
            expand, vs_ref[0].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Hq, Bt]
        pv = (p * vs_full).astype(qbd.dtype)
        if bits == 4:
            acc_scr[:, :half] = acc_scr[:, :half] * alpha + jax.lax.dot_general(
                pv, v_lo.astype(qbd.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_scr[:, half:] = acc_scr[:, half:] * alpha + jax.lax.dot_general(
                pv, v_hi.astype(qbd.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
                pv, v_ref[0].astype(qbd.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(j == nt - 1)
    def _():
        denom = l_scr[:, :1]
        denom = jnp.where(denom == 0.0, 1.0, denom)  # empty row (inactive slot)
        a = acc_scr[:] / denom  # [Hq, Hkv*D] (int4: permuted lo|hi halves)
        dh = head_dim // 2
        for h in range(n_kv_heads):
            r = slice(h * group, (h + 1) * group)
            if bits == 4:
                lo = a[r, h * dh : (h + 1) * dh]
                hi = a[r, n_kv_heads * dh + h * dh : n_kv_heads * dh + (h + 1) * dh]
                o_ref[0, h] = jnp.concatenate([lo, hi], axis=-1).astype(o_ref.dtype)
            else:
                o_ref[0, h] = a[r, h * head_dim : (h + 1) * head_dim].astype(o_ref.dtype)
        if return_stats:
            ms_ref[0] = m_scr[:]
            ls_ref[0] = l_scr[:]


def _fp_kernel(
    lens_ref, q_ref, k_ref, v_ref, *rest,
    scale, block_t, window, logit_softcap, n_kv_heads, group, return_stats,
):
    """bits=16 variant: reads the fp cache ``[B, T, H, D]`` AS STORED via
    full-head ``(1, Bt, H, D)`` blocks and loops kv heads in-kernel with
    static ref slices. The flat one-dot design would need a host-side
    ``[B,T,H,D] -> [B,T,H*D]`` reshape, which on TPU is a relayout copy of
    the whole buffer every decode step (at 32K max_seq: 67 MB per layer per
    token)."""
    if return_stats:
        o_ref, ms_ref, ls_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest
        ms_ref = ls_ref = None
    b = pl.program_id(0)
    j = pl.program_id(1)
    nt = pl.num_programs(1)
    lv = lens_ref[b]

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(j * block_t < lv)
    def _():
        tok = jax.lax.broadcasted_iota(
            jnp.int32, (group, block_t), 1) + j * block_t
        valid = tok < lv
        if window is not None:
            valid = valid & (tok >= lv - window)
        for h in range(n_kv_heads):
            r = slice(h * group, (h + 1) * group)
            qh = q_ref[0, r, :]  # [G, D]
            kh = k_ref[0, :, h, :]  # [Bt, D] (strided VMEM read)
            s = jax.lax.dot_general(
                qh, kh.astype(qh.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [G, Bt]
            if logit_softcap is not None:
                s = jnp.tanh(s / logit_softcap) * logit_softcap
            s = jnp.where(valid, s, _NEG_INF)

            m_prev = m_scr[r, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)  # [G, 1]
            l_scr[r, :] = l_scr[r, :] * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc_scr[r, :] = acc_scr[r, :] * alpha + jax.lax.dot_general(
                p.astype(qh.dtype), v_ref[0, :, h, :].astype(qh.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_scr[r, :] = jnp.broadcast_to(m_new, (group, m_scr.shape[1]))

    @pl.when(j == nt - 1)
    def _():
        denom = l_scr[:, :1]
        denom = jnp.where(denom == 0.0, 1.0, denom)  # empty row
        o_ref[0] = (acc_scr[:] / denom).astype(o_ref.dtype)
        if return_stats:
            ms_ref[0] = m_scr[:]
            ls_ref[0] = l_scr[:]


def _fp_decode_attention(q, k, v, kv_valid, *, scale, window, logit_softcap,
                         block_t, interpret, return_stats=False):
    """Fused decode attention over an fp ``[B, T, Hkv, D]`` cache, read in
    its storage layout (no flatten)."""
    B, S, Hq, D = q.shape
    T, Hkv = k.shape[1], k.shape[2]
    G = Hq // Hkv
    block_t = min(block_t, T)
    assert T % block_t == 0, (T, block_t)
    nt = T // block_t

    kv_valid = kv_valid.astype(jnp.int32)

    def kv_index(b, j, lens):
        last = jnp.maximum(pl.cdiv(lens[b], block_t) - 1, 0)
        return (b, jnp.minimum(j, last), 0, 0)

    kernel = functools.partial(
        _fp_kernel, scale=scale, block_t=block_t,
        window=window, logit_softcap=logit_softcap,
        n_kv_heads=Hkv, group=G, return_stats=return_stats,
    )
    out_specs = pl.BlockSpec((1, Hq, D), lambda b, j, lens: (b, 0, 0))
    out_shape = jax.ShapeDtypeStruct((B, Hq, D), q.dtype)
    if return_stats:
        stat_spec = pl.BlockSpec((1, Hq, 128), lambda b, j, lens: (b, 0, 0))
        stat_shape = jax.ShapeDtypeStruct((B, Hq, 128), jnp.float32)
        out_specs = (out_specs, stat_spec, stat_spec)
        out_shape = (out_shape, stat_shape, stat_shape)
    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nt),
            in_specs=[
                pl.BlockSpec((1, Hq, D), lambda b, j, lens: (b, 0, 0)),
                pl.BlockSpec((1, block_t, Hkv, D), kv_index),
                pl.BlockSpec((1, block_t, Hkv, D), kv_index),
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((Hq, 128), jnp.float32),  # running max
                pltpu.VMEM((Hq, 128), jnp.float32),  # running sum
                pltpu.VMEM((Hq, D), jnp.float32),  # output accumulator
            ],
        ),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=int(2 * 2 * B * Hq * T * D),
            bytes_accessed=int(2 * B * T * Hkv * D * k.dtype.itemsize
                               + B * Hq * D * 2),
            transcendentals=int(B * Hq * T),
        ),
        interpret=interpret,
    )(kv_valid, q[:, 0], k, v)
    if return_stats:
        out, ms, ls = res
        return out[:, None], ms[:, :, 0], ls[:, :, 0]
    return res[:, None]


def _quant_decode_attention(
    q, k_codes, v_codes, k_scale, v_scale, kv_valid, *,
    bits, scale, window, logit_softcap, block_t, interpret,
    return_stats=False,
):
    """Quantized-cache kernel impl. ``n_kv_heads`` comes from the scale
    plane's shape (``k_scale [B, Hkv, T]``) so the SPMD partitioner can call
    this same function with shard-local shapes."""
    B, S, Hq, D = q.shape
    T = k_codes.shape[1]
    Hkv = k_scale.shape[1]
    dp = k_codes.shape[2] // Hkv
    k2, v2 = k_codes, v_codes
    G = Hq // Hkv
    block_t = min(block_t, T)
    assert T % block_t == 0, (T, block_t)
    nt = T // block_t

    # block-diagonal q [B, Hq, Hkv*D]; for int4 the column layout matches the
    # kernel's split unpack: [all-heads lo dims | all-heads hi dims]
    qh = q.reshape(B, Hkv, G, D)
    eye = jnp.eye(Hkv, dtype=q.dtype)
    qbd = jnp.einsum("bhgd,hk->bhgkd", qh, eye)  # [B, Hkv(row), G, Hkv(col), D]
    qbd = qbd.reshape(B, Hq, Hkv, D)
    if bits == 4:
        h2 = D // 2
        qbd = jnp.concatenate(
            [
                qbd[..., :h2].reshape(B, Hq, Hkv * h2),
                qbd[..., h2:].reshape(B, Hq, Hkv * h2),
            ],
            axis=-1,
        )
    else:
        qbd = qbd.reshape(B, Hq, Hkv * D)

    kv_valid = kv_valid.astype(jnp.int32)

    def kv_index(b, j, lens):
        last = jnp.maximum(pl.cdiv(lens[b], block_t) - 1, 0)
        return (b, jnp.minimum(j, last), 0)

    def sc_index(b, j, lens):
        last = jnp.maximum(pl.cdiv(lens[b], block_t) - 1, 0)
        return (b, 0, jnp.minimum(j, last))

    kernel = functools.partial(
        _kernel, bits=bits, scale=scale, block_t=block_t,
        window=window, logit_softcap=logit_softcap,
        n_kv_heads=Hkv, group=G, head_dim=D, return_stats=return_stats,
    )
    in_specs = [
        pl.BlockSpec((1, Hq, Hkv * D), lambda b, j, lens: (b, 0, 0)),
        pl.BlockSpec((1, block_t, Hkv * dp), kv_index),
        pl.BlockSpec((1, block_t, Hkv * dp), kv_index),
    ]
    per_tok_bytes = Hkv * dp + Hkv * 4  # int8 codes + f32 scale planes
    in_specs += [
        pl.BlockSpec((1, Hkv, block_t), sc_index),
        pl.BlockSpec((1, Hkv, block_t), sc_index),
    ]
    operands = [kv_valid, qbd, k2, v2, k_scale, v_scale]
    out_specs = pl.BlockSpec((1, Hkv, G, D), lambda b, j, lens: (b, 0, 0, 0))
    out_shape = jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype)
    if return_stats:
        stat_spec = pl.BlockSpec((1, Hq, 128), lambda b, j, lens: (b, 0, 0))
        stat_shape = jax.ShapeDtypeStruct((B, Hq, 128), jnp.float32)
        out_specs = (out_specs, stat_spec, stat_spec)
        out_shape = (out_shape, stat_shape, stat_shape)
    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nt),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((Hq, 128), jnp.float32),  # running max
                pltpu.VMEM((Hq, 128), jnp.float32),  # running sum
                pltpu.VMEM((Hq, Hkv * D), jnp.float32),  # output accumulator
            ],
        ),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=int(2 * 2 * B * Hq * T * D),
            bytes_accessed=int(2 * B * T * per_tok_bytes + B * Hq * D * 2),
            transcendentals=int(B * Hq * T),
        ),
        interpret=interpret,
    )(*operands)

    if return_stats:
        out, ms, ls = res
        return out.reshape(B, 1, Hq, D), ms[:, :, 0], ls[:, :, 0]
    return res.reshape(B, 1, Hq, D)


def decode_attention_with_stats(
    q, k_codes, v_codes, k_scale, v_scale, kv_valid, *,
    bits, scale, window=None, logit_softcap=None, block_t=512,
    interpret=False,
):
    """Decode attention returning ``(out, m, l)`` — the normalized output
    plus each row's softmax running max and sum ``[B, Hq]``. The partials
    let independent KV shards be merged exactly (log-sum-exp combine):
    ``out = sum_i out_i * w_i / sum_i w_i`` with ``w_i = l_i *
    exp(m_i - max_i m_i)`` — the sequence-parallel decode path
    (``parallel/sequence.py``). Called INSIDE shard_map on shard-local
    buffers, so no custom_partitioning wrapper is involved."""
    if bits == 16:
        return _fp_decode_attention(
            q, k_codes, v_codes, kv_valid, scale=scale, window=window,
            logit_softcap=logit_softcap, block_t=block_t,
            interpret=interpret, return_stats=True)
    return _quant_decode_attention(
        q, k_codes, v_codes, k_scale, v_scale, kv_valid, bits=bits,
        scale=scale, window=window, logit_softcap=logit_softcap,
        block_t=block_t, interpret=interpret, return_stats=True)


# ── cached-continuation prefill over storage-layout caches ──────────────────


def _cached_kernel(
    pos_sref, q_ref, k_ref, v_ref, pos_ref, *rest,
    bits, scale, block_q, block_k, window, logit_softcap, n_kv_heads, group,
    head_dim, return_stats,
):
    """Continuation-chunk attention reading cache buffers AS STORED.

    Unlike ``flash_attention_cached`` (which transposes the cache to
    ``[B, H, T, D]`` on the host — a full relayout copy of the buffer per
    prefill chunk), this kernel reads fp caches ``[B, T, Hkv, D]`` and int8
    quant caches (flat codes ``[B, T, Hkv*D]`` + ``[B, Hkv, T]`` scales)
    in their storage layout, looping query heads in-kernel with static ref
    slices. Per-(row, head) online softmax state lives in ``[Hq, Bq, .]``
    VMEM scratch across the sequential KV grid axis.
    """
    if bits == 16:
        ks_ref = vs_ref = None
        rest2 = rest
    else:
        ks_ref, vs_ref, *rest2 = rest
    if return_stats:
        o_ref, ms_ref, ls_ref, m_scr, l_scr, acc_scr = rest2
    else:
        o_ref, m_scr, l_scr, acc_scr = rest2
        ms_ref = ls_ref = None
    j = pl.program_id(2)
    nj = pl.num_programs(2)
    Hq = n_kv_heads * group
    D = head_dim

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    qpos = pos_ref[0]  # [Bq] absolute query positions
    kv_start = j * block_k
    # block participates iff any (row, token) pair is causally visible:
    # min token <= max qpos (and within the window band, if any)
    relevant = kv_start <= jnp.max(qpos)
    if window is not None:
        relevant &= kv_start + block_k - 1 > jnp.min(qpos) - window

    @pl.when(relevant)
    def _():
        tokq = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + kv_start
        posq = qpos[:, None]
        mask = posq >= tokq
        if window is not None:
            mask &= tokq > posq - window
        dh = D // 2
        if bits == 4:
            # arithmetic unpack of the whole block ONCE (byte = 16*hi + lo;
            # lo plane = dims 0..D/2-1, hi plane = dims D/2..D-1); per-head
            # 64-lane VALUE slices below are legal — only ref/BlockSpec
            # reads need 128-lane alignment
            kp = k_ref[0].astype(jnp.float32)
            vp = v_ref[0].astype(jnp.float32)
            k_hi_all = jnp.floor((kp + 8.0) * 0.0625)
            k_lo_all = kp - 16.0 * k_hi_all
            v_hi_all = jnp.floor((vp + 8.0) * 0.0625)
            v_lo_all = vp - 16.0 * v_hi_all
        for h in range(Hq):
            hk = h // group
            q_h = q_ref[0, :, h, :]  # [Bq, D]
            if bits == 16:
                k_h = k_ref[0, :, hk, :]  # [Bk, D]
                v_h = v_ref[0, :, hk, :]
                s = jax.lax.dot_general(
                    q_h, k_h.astype(q_h.dtype), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale  # [Bq, Bk]
            elif bits == 4:
                cs = slice(hk * dh, (hk + 1) * dh)
                dt = q_h.dtype
                ks = ks_ref[0, hk : hk + 1, :].astype(jnp.float32)  # [1, Bk]
                s = (jax.lax.dot_general(
                    q_h[:, :dh], k_lo_all[:, cs].astype(dt),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + jax.lax.dot_general(
                    q_h[:, dh:], k_hi_all[:, cs].astype(dt),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )) * (ks * scale)
            else:
                c = slice(hk * D, (hk + 1) * D)
                k_h = k_ref[0][:, c]  # [Bk, D] int8, static 128-lane slice
                v_h = v_ref[0][:, c]
                ks = ks_ref[0, hk : hk + 1, :].astype(jnp.float32)  # [1, Bk]
                s = jax.lax.dot_general(
                    q_h, k_h.astype(q_h.dtype), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * (ks * scale)
            if logit_softcap is not None:
                s = jnp.tanh(s / logit_softcap) * logit_softcap
            s = jnp.where(mask, s, _NEG_INF)

            m_prev = m_scr[h][:, :1]  # [Bq, 1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_scr[h] = l_scr[h] * alpha + jnp.sum(p, axis=1, keepdims=True)
            if bits == 16:
                pv = p.astype(q_h.dtype)
            else:
                vs = vs_ref[0, hk : hk + 1, :].astype(jnp.float32)
                pv = (p * vs).astype(q_h.dtype)
            if bits == 4:
                cs = slice(hk * dh, (hk + 1) * dh)
                dt = q_h.dtype
                lo = jax.lax.dot_general(
                    pv, v_lo_all[:, cs].astype(dt), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                hi = jax.lax.dot_general(
                    pv, v_hi_all[:, cs].astype(dt), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc_scr[h] = acc_scr[h] * alpha + jnp.concatenate(
                    [lo, hi], axis=1)
            else:
                acc_scr[h] = acc_scr[h] * alpha + jax.lax.dot_general(
                    pv, v_h.astype(q_h.dtype), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            m_scr[h] = jnp.broadcast_to(m_new, (block_q, m_scr.shape[2]))

    @pl.when(j == nj - 1)
    def _():
        for h in range(Hq):
            denom = l_scr[h][:, :1]
            denom = jnp.where(denom == 0.0, 1.0, denom)
            o_ref[0, :, h, :] = (acc_scr[h] / denom).astype(o_ref.dtype)
        if return_stats:
            ms_ref[0] = m_scr[:, :, 0]  # [Hq, Bq]
            ls_ref[0] = l_scr[:, :, 0]


def _cached_attention(q, k, v, k_scale, v_scale, positions, *, bits, scale,
                      window, logit_softcap, block_q, block_k, interpret,
                      return_stats=False):
    B, S, Hq, D = q.shape
    T = k.shape[1]
    if bits == 16:
        Hkv = k.shape[2]
    else:
        Hkv = k_scale.shape[1]
        stored = D // 2 if bits == 4 else D
        assert k.shape[2] == Hkv * stored, (
            "quant continuation needs flat [B,T,Hkv*stored] codes",
            k.shape, Hkv, stored)
    G = Hq // Hkv

    block_q = min(block_q, S)
    block_k = min(block_k, T)
    # per-(head, row) online-softmax scratch is [Hq, block_q, 128]x2 +
    # [Hq, block_q, D] f32; int4 additionally materializes 4 f32 unpack
    # planes [block_k, Hkv*D/2] per block — keep the total within ~8 MB of
    # the ~16 MB VMEM
    unpack = 4 * block_k * Hkv * (D // 2) * 4 if bits == 4 else 0
    while (Hq * block_q * (2 * 128 + D) * 4 + unpack > 8 * 2**20
           and block_q > 64):
        block_q //= 2
    assert T % block_k == 0, (T, block_k)
    pad_q = (-S) % block_q
    Sq = S + pad_q
    pos = jnp.minimum(positions.astype(jnp.int32), T - 1)
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
        pos = jnp.pad(pos, ((0, 0), (0, pad_q)), mode="edge")

    def kv_index(b, i, j, pos_s):
        # max(0, .): sequence-parallel slabs shift query positions into
        # slab-local coordinates, so rows entirely before this slab carry
        # NEGATIVE positions (they attend nothing here; the in-kernel mask
        # handles it) — the block index must still be in range
        jj = jnp.minimum(j, pos_s[b, i * block_q + block_q - 1] // block_k)
        jj = jnp.maximum(jj, 0)
        if window is not None:
            jj = jnp.maximum(jj, jnp.maximum(
                (pos_s[b, i * block_q] - window + 1) // block_k, 0))
        if bits == 16:
            return (b, jj, 0, 0)
        return (b, jj, 0)

    def sc_index(b, i, j, pos_s):
        jj = jnp.minimum(j, pos_s[b, i * block_q + block_q - 1] // block_k)
        jj = jnp.maximum(jj, 0)
        if window is not None:
            jj = jnp.maximum(jj, jnp.maximum(
                (pos_s[b, i * block_q] - window + 1) // block_k, 0))
        return (b, 0, jj)

    kernel = functools.partial(
        _cached_kernel, bits=bits, scale=scale, block_q=block_q,
        block_k=block_k, window=window, logit_softcap=logit_softcap,
        n_kv_heads=Hkv, group=G, head_dim=D, return_stats=return_stats,
    )
    kv_block = ((1, block_k, Hkv, D) if bits == 16
                else (1, block_k, Hkv * (D // 2 if bits == 4 else D)))
    in_specs = [
        pl.BlockSpec((1, block_q, Hq, D), lambda b, i, j, pos_s: (b, i, 0, 0)),
        pl.BlockSpec(kv_block, kv_index),
        pl.BlockSpec(kv_block, kv_index),
        pl.BlockSpec((1, block_q), lambda b, i, j, pos_s: (b, i)),
    ]
    operands = [pos, q, k, v, pos]
    if bits != 16:
        # kernel ref order is (q, k, v, pos, ks, vs)
        in_specs += [
            pl.BlockSpec((1, Hkv, block_k), sc_index),
            pl.BlockSpec((1, Hkv, block_k), sc_index),
        ]
        operands += [k_scale, v_scale]
    kv_elem = (0.5 if bits == 4 else 1) if bits != 16 else k.dtype.itemsize
    out_specs = pl.BlockSpec(
        (1, block_q, Hq, D), lambda b, i, j, pos_s: (b, i, 0, 0))
    out_shape = jax.ShapeDtypeStruct((B, Sq, Hq, D), q.dtype)
    if return_stats:
        stat_spec = pl.BlockSpec((1, Hq, block_q),
                                 lambda b, i, j, pos_s: (b, 0, i))
        stat_shape = jax.ShapeDtypeStruct((B, Hq, Sq), jnp.float32)
        out_specs = (out_specs, stat_spec, stat_spec)
        out_shape = (out_shape, stat_shape, stat_shape)
    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Sq // block_q, T // block_k),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((Hq, block_q, 128), jnp.float32),  # running max
                pltpu.VMEM((Hq, block_q, 128), jnp.float32),  # running sum
                pltpu.VMEM((Hq, block_q, D), jnp.float32),  # out accumulator
            ],
        ),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=int(2 * 2 * B * Hq * Sq * T * D // 2),
            bytes_accessed=int(2 * B * T * Hkv * D * kv_elem
                               + B * Hq * Sq * D * 4),
            transcendentals=int(B * Hq * Sq * T // 2),
        ),
        interpret=interpret,
    )(*operands)
    if return_stats:
        out, ms, ls = res
        return out[:, :S], ms[:, :, :S], ls[:, :, :S]
    return res[:, :S]


def cached_attention_with_stats(
    q, k, v, k_scale, v_scale, positions, *,
    bits, scale, window=None, logit_softcap=None, block_q=256, block_k=512,
    interpret=False,
):
    """Continuation-chunk attention returning ``(out, m, l)`` with per-row
    softmax stats ``[B, Hq, S]`` — the sequence-parallel prefill path:
    every chip runs this over its local sequence slab with slab-shifted
    query positions and the partials merge exactly (parallel/sequence.py).
    Same per-chip cost as ring attention (C x T/n) with zero permutes —
    queries are small (a chunk), so replicating them beats rotating KV."""
    return _cached_attention(
        q, k, v, k_scale, v_scale, positions, bits=bits, scale=scale,
        window=window, logit_softcap=logit_softcap, block_q=block_q,
        block_k=block_k, interpret=interpret, return_stats=True)


@functools.lru_cache(maxsize=None)
def _partitioned_cached_quant(Hkv, G, D, bits, scale, window, logit_softcap,
                              block_q, block_k, interpret):
    from crane_tpu.ops.pallas.partitioning import make_head_partitioned

    kwargs = dict(bits=bits, scale=scale, window=window,
                  logit_softcap=logit_softcap, block_q=block_q,
                  block_k=block_k, interpret=interpret)
    qspec = lambda b, h: P(b, None, h, None)
    if bits == 16:
        def fn(q, k, v, pos):
            return _cached_attention(q, k, v, None, None, pos, **kwargs)
        templates = [qspec, qspec, qspec, lambda b, h: P(b, None), qspec]
        rule = "b s (h g) d, b t h d, b t h d, b s -> b s (h g) d"
        needs = ("s", "g", "d", "t")
        sizes = dict(g=G)
    else:
        def fn(q, k, v, ks, vs, pos):
            return _cached_attention(q, k, v, ks, vs, pos, **kwargs)
        templates = [
            qspec,
            lambda b, h: P(b, None, h),
            lambda b, h: P(b, None, h),
            lambda b, h: P(b, h, None),
            lambda b, h: P(b, h, None),
            lambda b, h: P(b, None),
            qspec,
        ]
        rule = ("b s (h g) d, b t (h c), b t (h c), b h t2, b h t2, b s"
                " -> b s (h g) d")
        needs = ("s", "g", "d", "t", "c", "t2")
        sizes = dict(g=G, c=(D // 2 if bits == 4 else D))
    return make_head_partitioned(
        "quant_cached_attention", fn,
        templates=templates,
        batch_sources=[(0, 0), (1, 0)],
        head_sources=([(3, 1), (1, 2), (0, 2)] if bits != 16
                      else [(1, 2), (0, 2)]),
        n_heads_total=Hkv,
        rule=rule,
        need_replication_factors=needs,
        factor_sizes=sizes,
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_kv_heads", "bits", "scale", "window", "logit_softcap",
                     "block_q", "block_k", "interpret"),
)
def quant_cached_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    k_scale: jax.Array | None,
    v_scale: jax.Array | None,
    positions: jax.Array,
    *,
    n_kv_heads: int | None = None,
    bits: int,
    scale: float,
    window: int | None = None,
    logit_softcap: float | None = None,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Cached-continuation prefill attention over storage-layout caches.

    A continuation chunk of S queries (``positions [B, S]`` absolute, the
    chunk already written to the cache) attends the full cache buffer. Two
    cache forms:

    - ``bits=16``: fp buffers ``[B, T, Hkv, D]`` read as stored — no host
      transpose (``flash_attention_cached`` relayouts the whole buffer to
      ``[B, H, T, D]`` per chunk; at 32K max_seq that is a 67 MB copy per
      layer per chunk).
    - ``bits=8`` / ``bits=4``: flat codes ``[B, T, Hkv*stored]`` + scales
      ``[B, Hkv, T]`` with dequant fused into the logits/output dots — the
      XLA fallback dequantizes the ENTIRE buffer to bf16 per chunk. int4
      unpacks each block once in-kernel (arithmetic unpack) and uses
      per-head 64-lane VALUE slices, which Mosaic legalizes (only
      ref/BlockSpec reads need 128-lane alignment).

    Same live-length index-map clamp as the rest of the family: KV blocks
    past the last visible token (or below the window band) repeat their
    index and Pallas skips the DMA, so traffic is O(S * live), not
    O(S * max_seq). Shards over (batch, kv-head) mesh axes under SPMD.
    """
    B, S, Hq, D = q.shape
    if bits == 16:
        Hkv = k.shape[2]
        fn = _partitioned_cached_quant(
            Hkv, Hq // Hkv, D, 16, scale, window, logit_softcap, block_q,
            block_k, interpret)
        return fn(q, k, v, positions)
    assert bits in (4, 8), "continuation kernel: fp/int8/int4 caches"
    Hkv = n_kv_heads if n_kv_heads is not None else k_scale.shape[1]
    fn = _partitioned_cached_quant(
        Hkv, Hq // Hkv, D, bits, scale, window, logit_softcap, block_q,
        block_k, interpret)
    return fn(q, k, v, k_scale, v_scale, positions)


@functools.lru_cache(maxsize=None)
def _partitioned_quant(Hkv, G, dp, bits, scale, window, logit_softcap,
                       block_t, interpret):
    from crane_tpu.ops.pallas.partitioning import make_head_partitioned

    def fn(q, k, v, ks, vs, valid):
        return _quant_decode_attention(
            q, k, v, ks, vs, valid, bits=bits, scale=scale, window=window,
            logit_softcap=logit_softcap, block_t=block_t, interpret=interpret)

    return make_head_partitioned(
        "quant_decode_attention", fn,
        templates=[
            lambda b, h: P(b, None, h, None),   # q [B, 1, Hq, D]
            lambda b, h: P(b, None, h),         # k codes [B, T, Hkv*dp]
            lambda b, h: P(b, None, h),         # v codes
            lambda b, h: P(b, h, None),         # k_scale [B, Hkv, T]
            lambda b, h: P(b, h, None),         # v_scale
            lambda b, h: P(b),                  # kv_valid [B]
            lambda b, h: P(b, None, h, None),   # out
        ],
        batch_sources=[(0, 0), (1, 0)],
        head_sources=[(3, 1), (1, 2), (0, 2)],
        n_heads_total=Hkv,
        rule="b s (h g) d, b t (h c), b t (h c), b h t2, b h t2, b"
             " -> b s (h g) d",
        need_replication_factors=("s", "g", "d", "t", "c", "t2"),
        factor_sizes=dict(g=G, c=dp),
    )


@functools.lru_cache(maxsize=None)
def _partitioned_fp(Hkv, G, scale, window, logit_softcap, block_t, interpret):
    from crane_tpu.ops.pallas.partitioning import make_head_partitioned

    def fn(q, k, v, valid):
        return _fp_decode_attention(
            q, k, v, valid, scale=scale, window=window,
            logit_softcap=logit_softcap, block_t=block_t, interpret=interpret)

    return make_head_partitioned(
        "fp_decode_attention", fn,
        templates=[
            lambda b, h: P(b, None, h, None),      # q [B, 1, Hq, D]
            lambda b, h: P(b, None, h, None),      # k [B, T, Hkv, D]
            lambda b, h: P(b, None, h, None),      # v
            lambda b, h: P(b),                     # kv_valid [B]
            lambda b, h: P(b, None, h, None),      # out
        ],
        batch_sources=[(0, 0), (1, 0)],
        head_sources=[(1, 2), (0, 2)],
        n_heads_total=Hkv,
        rule="b s (h g) d, b t h d, b t h d, b -> b s (h g) d",
        need_replication_factors=("s", "g", "d", "t"),
        factor_sizes=dict(g=G),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_kv_heads", "bits", "scale", "window", "logit_softcap", "block_t",
        "interpret",
    ),
)
def quant_decode_attention(
    q: jax.Array,
    k_codes: jax.Array,
    v_codes: jax.Array,
    k_scale: jax.Array,
    v_scale: jax.Array,
    kv_valid: jax.Array,
    *,
    n_kv_heads: int | None = None,
    bits: int,
    scale: float,
    window: int | None = None,
    logit_softcap: float | None = None,
    block_t: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Fused dequant + GQA decode attention over a quantized OR fp KV cache.

    q ``[B, 1, Hq, D]``; k/v codes FLAT ``[B, T, Hkv * stored]`` int8
    (stored = D, or D/2 packed int4 — the cache's storage layout,
    :class:`crane_tpu.ops.kv_cache.QuantLayerKVCache`) with ``n_kv_heads``
    given statically; scales ``[B, Hkv, T]`` f32 (expanded to query heads
    inside the kernel); ``kv_valid [B]`` int32 = per-row count of valid KV
    slots (the query attends to ``[max(0, valid-window), valid)``).
    Returns ``[B, 1, Hq, D]`` in q.dtype.

    The flat operand layout is the point: the kernel's BlockSpecs read the
    cache buffers AS STORED — no host-side reshape, which on TPU is a full
    relayout copy of the buffer per decode step (tiled layouts reorder bytes
    when minor dims merge).

    ``bits=16``: k/v are bf16/f32 cache buffers ``[B, T, Hkv, D]`` read AS
    STORED by the per-head :func:`_fp_kernel` grid (no flatten) and
    ``k_scale``/``v_scale`` are ignored (pass None) — same live-length
    index-map clamp (a row at length L moves ceil(L/block_t) blocks
    regardless of the allocated max_seq), which is what the plain XLA decode
    path cannot do.

    Under a sharded jit (``--tp``/``--dp`` serving) the call partitions over
    the kv-head and batch axes via a custom_partitioning rule instead of
    being replicated — each device runs this same kernel on its local heads
    with zero collectives (``ops/pallas/partitioning.py``).
    """
    B, S, Hq, D = q.shape
    assert S == 1, "decode kernel: S must be 1"
    if bits == 16:
        assert k_codes.ndim == 4, "fp cache buffers are [B, T, Hkv, D]"
        Hkv = k_codes.shape[2]
        fn = _partitioned_fp(
            Hkv, Hq // Hkv, scale, window, logit_softcap, block_t, interpret)
        return fn(q, k_codes, v_codes, kv_valid)
    assert k_codes.ndim == 3, "quant cache codes are flat [B, T, Hkv*stored]"
    Hkv = n_kv_heads
    assert Hkv is not None, "n_kv_heads is required for quantized caches"
    assert k_scale.shape[1] == Hkv, (k_scale.shape, Hkv)
    fn = _partitioned_quant(
        Hkv, Hq // Hkv, k_codes.shape[2] // Hkv, bits, scale, window,
        logit_softcap, block_t, interpret)
    return fn(q, k_codes, v_codes, k_scale, v_scale, kv_valid)
