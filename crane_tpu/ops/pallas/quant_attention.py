"""Pallas TPU kernel: decode attention fused with KV-cache dequantization.

Decode (S=1) attention over a quantized KV cache reads int8 codes (or
nibble-packed int4) plus per-(token, head) scales straight from HBM and
dequantizes in VMEM — KV HBM traffic is the quantized bytes, never a
materialized bf16 copy. This is the reference's stated follow-up to its
dequantize-on-read cache (/root/reference/crane-core/src/models/qwen3_5/
kv_cache.rs:217-221), shipped here as the default decode path.

Scales fold into the logits instead of the operands: per-token scale s_t is
constant along head_dim, so ``q . (c_t * s_t) == (q . c_t) * s_t`` — the K dot
runs on exact int8 codes (cast bf16, integers <= 127 are exact in bf16) and
the f32 scale multiplies the logit column. Same for V: the probability row is
scaled before the PV dot. This is *more* accurate than the XLA dequant path,
which rounds ``c * s`` to bf16 before the matmul.

Grid: ``(B, T/block_t)`` with the KV axis innermost (sequential); each step
loads one ``[block_t, H_kv, D]`` code block + ``[H_kv, block_t]`` scale block
and unrolls a static loop over the KV heads (keeps every block's trailing
dims Mosaic-tileable and the scale vectors lane-aligned). Online softmax
carries all ``H_q`` query heads in VMEM scratch. Per-row valid lengths ride
in scalar-prefetch SMEM: the KV index map clamps past-the-end block indices
to the last valid block, and Pallas skips the DMA when the index repeats —
so a row at length L only moves ceil(L/block_t) blocks of HBM traffic
regardless of the cache's allocated max_seq.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _unpack_int4_f32(packed: jax.Array) -> jax.Array:
    """Kernel-local int4 unpack in float arithmetic (Mosaic can't legalize
    int8 vector shifts): the sign-extended byte is ``16*hi + lo_u`` with
    ``hi in [-8,7]``, ``lo_u in [0,15]`` — all exactly representable in f32,
    so floor/multiply recovers both nibbles bit-exactly. Returns f32 codes
    ``[..., D]`` matching :func:`crane_tpu.ops.kv_cache.unpack_int4`."""
    pf = packed.astype(jnp.float32)
    hi = jnp.floor(pf * 0.0625)
    lo_u = pf - hi * 16.0
    lo = lo_u - 16.0 * (lo_u >= 8.0).astype(jnp.float32)
    return jnp.concatenate([lo, hi], axis=-1)


def _kernel(
    lens_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
    m_scr, l_scr, acc_scr,
    *, bits, scale, block_t, window, logit_softcap, n_kv_heads, group,
):
    b = pl.program_id(0)
    j = pl.program_id(1)
    nt = pl.num_programs(1)
    lv = lens_ref[b]  # number of valid KV slots in this row

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(j * block_t < lv)
    def _():
        kc = k_ref[0]  # [block_t, Hkv, D or D/2] int8
        vc = v_ref[0]
        if bits == 4:
            kc = _unpack_int4_f32(kc)
            vc = _unpack_int4_f32(vc)

        tok = jax.lax.broadcasted_iota(jnp.int32, (group, block_t), 1) + j * block_t
        valid = tok < lv
        if window is not None:
            valid = valid & (tok >= lv - window)

        for h in range(n_kv_heads):
            q = q_ref[0, h]  # [G, D] compute dtype
            ks = ks_ref[0, h, :].astype(jnp.float32)  # [block_t]
            vs = vs_ref[0, h, :].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, kc[:, h, :].astype(q.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, block_t]
            s = s * (ks[None, :] * scale)
            if logit_softcap is not None:
                s = jnp.tanh(s / logit_softcap) * logit_softcap
            s = jnp.where(valid, s, _NEG_INF)

            r = slice(h * group, (h + 1) * group)
            m_prev = m_scr[r, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_scr[r, :] = l_scr[r, :] * alpha + jnp.sum(p, axis=1, keepdims=True)
            pv = (p * vs[None, :]).astype(q.dtype)
            acc_scr[r, :] = acc_scr[r, :] * alpha + jax.lax.dot_general(
                pv, vc[:, h, :].astype(q.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_scr[r, :] = jnp.broadcast_to(m_new, (group, m_scr.shape[1]))

    @pl.when(j == nt - 1)
    def _():
        denom = l_scr[:, :1]
        denom = jnp.where(denom == 0.0, 1.0, denom)  # empty row (inactive slot)
        o_ref[0] = (acc_scr[:] / denom).reshape(o_ref.shape[1:]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("bits", "scale", "window", "logit_softcap", "block_t", "interpret"),
)
def quant_decode_attention(
    q: jax.Array,
    k_codes: jax.Array,
    v_codes: jax.Array,
    k_scale: jax.Array,
    v_scale: jax.Array,
    kv_valid: jax.Array,
    *,
    bits: int,
    scale: float,
    window: int | None = None,
    logit_softcap: float | None = None,
    block_t: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Fused dequant + GQA decode attention over a quantized KV cache.

    q ``[B, 1, Hq, D]``; k/v codes ``[B, T, Hkv, D]`` int8 or
    ``[B, T, Hkv, D/2]`` packed int4; scales ``[B, Hkv, T]`` f32;
    ``kv_valid [B]`` int32 = per-row count of valid KV slots (the query
    attends to slots ``[max(0, valid-window), valid)``). Returns
    ``[B, 1, Hq, D]`` in q.dtype.
    """
    B, S, Hq, D = q.shape
    assert S == 1, "decode kernel: S must be 1"
    T, Hkv = k_codes.shape[1], k_codes.shape[2]
    G = Hq // Hkv
    block_t = min(block_t, T)
    assert T % block_t == 0, (T, block_t)
    nt = T // block_t

    qg = q.reshape(B, Hkv, G, D)  # group-major query heads
    kv_valid = kv_valid.astype(jnp.int32)

    def kv_index(b, j, lens):
        last = jnp.maximum(pl.cdiv(lens[b], block_t) - 1, 0)
        return (b, jnp.minimum(j, last), 0, 0)

    def sc_index(b, j, lens):
        last = jnp.maximum(pl.cdiv(lens[b], block_t) - 1, 0)
        return (b, 0, jnp.minimum(j, last))

    kernel = functools.partial(
        _kernel, bits=bits, scale=scale, block_t=block_t,
        window=window, logit_softcap=logit_softcap,
        n_kv_heads=Hkv, group=G,
    )
    dp = k_codes.shape[3]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nt),
            in_specs=[
                pl.BlockSpec((1, Hkv, G, D), lambda b, j, lens: (b, 0, 0, 0)),
                pl.BlockSpec((1, block_t, Hkv, dp), kv_index),
                pl.BlockSpec((1, block_t, Hkv, dp), kv_index),
                pl.BlockSpec((1, Hkv, block_t), sc_index),
                pl.BlockSpec((1, Hkv, block_t), sc_index),
            ],
            out_specs=pl.BlockSpec((1, Hkv, G, D), lambda b, j, lens: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((Hq, 128), jnp.float32),  # running max
                pltpu.VMEM((Hq, 128), jnp.float32),  # running sum
                pltpu.VMEM((Hq, D), jnp.float32),  # output accumulator
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * 2 * B * Hq * T * D),
            bytes_accessed=int(2 * B * T * Hkv * (dp + 4) + B * Hq * D * 2),
            transcendentals=int(B * Hq * T),
        ),
        interpret=interpret,
    )(kv_valid, qg, k_codes, v_codes, k_scale, v_scale)

    return out.reshape(B, 1, Hq, D)
