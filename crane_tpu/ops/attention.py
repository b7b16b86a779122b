"""Grouped-query attention for TPU.

Reference behavior: crane-core GqaAttention has three SDPA paths — CPU flash
decode, a GQA-grouped 4-D matmul decode that never materializes repeated K/V,
and standard SDPA with f32 softmax
(/root/reference/crane-core/src/models/modules/attention.rs:282-345).

TPU-native design: ONE einsum formulation covers prefill and decode — Q is
reshaped to ``[B, S, H_kv, G, D]`` so K/V are contracted directly without
``repeat_kv`` (the grouped-decode trick, generalized to any S). Logits are f32
(``preferred_element_type``), softmax in f32, the PV matmul back in the compute
dtype so both matmuls hit the MXU in bf16. Masking is positional: a KV slot
``t`` participates iff ``t <= q_position`` (optionally windowed), which
subsumes length masking for left-aligned caches.

Supports logit softcapping (Gemma, tanh(l/c)*c — gemma4/modeling.rs:1-21) and
sliding windows. A Pallas flash-attention kernel for long prefill lives in
``crane_tpu.ops.pallas.flash_attention``; this module is the XLA reference
path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def attention_mask(
    q_positions: jax.Array,
    kv_len: int,
    *,
    window: int | None = None,
) -> jax.Array:
    """Boolean mask ``[B, S, T]``: True where KV slot t attends to query s."""
    t = jnp.arange(kv_len, dtype=jnp.int32)[None, None, :]
    p = q_positions[:, :, None]
    mask = t <= p
    if window is not None:
        mask = mask & (t > p - window)
    return mask


def gqa_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_positions: jax.Array,
    *,
    scale: float,
    window: int | None = None,
    logit_softcap: float | None = None,
    sinks: jax.Array | None = None,
    extra_mask: jax.Array | None = None,
) -> jax.Array:
    """GQA scaled-dot-product attention.

    q: ``[B, S, H_q, D]``; k, v: ``[B, T, H_kv, D]`` (full cache buffers —
    invalid tail slots are masked out by position). ``q_positions``: ``[B, S]``
    absolute positions of the queries. ``extra_mask [B, S, T]`` is OR'd with
    the causal mask (Gemma3-style bidirectional image blocks). Returns
    ``[B, S, H_q, D]``.
    """
    B, S, Hq, D = q.shape
    Hkv = k.shape[2]
    assert Hq % Hkv == 0, (Hq, Hkv)
    G = Hq // Hkv
    qg = q.reshape(B, S, Hkv, G, D)

    logits = jnp.einsum(
        "bskgd,btkd->bkgst", qg, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if logit_softcap is not None:
        logits = jnp.tanh(logits / logit_softcap) * logit_softcap

    mask = attention_mask(q_positions, k.shape[1], window=window)
    if extra_mask is not None:
        if extra_mask.shape[-1] != k.shape[1]:
            # extra mask covers the prefill span; the cache tail stays causal
            extra_mask = jnp.pad(
                extra_mask,
                ((0, 0), (0, 0), (0, k.shape[1] - extra_mask.shape[-1])),
            )
        mask = mask | extra_mask
    logits = jnp.where(mask[:, None, None, :, :], logits, _NEG_INF)

    if sinks is not None:
        # attention-sink logits: one extra virtual slot per head that absorbs
        # probability mass (gpt-oss style); sinks shape [H_q]
        sink = sinks.reshape(1, Hkv, G, 1, 1).astype(jnp.float32)
        sink = jnp.broadcast_to(sink, (B, Hkv, G, S, 1))
        all_logits = jnp.concatenate([logits, sink], axis=-1)
        probs = jax.nn.softmax(all_logits, axis=-1)[..., :-1]
    else:
        probs = jax.nn.softmax(logits, axis=-1)

    out = jnp.einsum(
        "bkgst,btkd->bskgd",
        probs.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, S, Hq, D).astype(q.dtype)
