"""Shared prefill-from-embeddings + greedy decode step.

The common shape behind every embed-splicing model (Qwen3-ASR audio splice,
PaddleOCR-VL image splice, codec-TTS prompts): prefill pre-built input
embeddings, then greedy 1-token decode steps over the cache. One jitted
pair here instead of a private copy per model file.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from crane_tpu.models.modules.transformer import forward_hidden, lm_logits


@functools.partial(jax.jit, static_argnums=(0,))
def embeds_prefill(cfg, params, rope, cache, embeds, true_length):
    """embeds ``[B, S_bucket, E]`` (padded); returns last-token logits +
    cache with lengths set to ``true_length``."""
    B, S, _ = embeds.shape
    tokens = jnp.zeros((B, S), jnp.int32)
    hidden, new_cache = forward_hidden(
        cfg, params, tokens, cache, jnp.asarray(0, jnp.int32), rope,
        inputs_embeds=embeds, true_lengths=jnp.asarray([true_length]),
    )
    last = jax.lax.dynamic_slice_in_dim(hidden, true_length - 1, 1, axis=1)
    new_cache = dataclasses.replace(new_cache, lengths=jnp.asarray([true_length]))
    return lm_logits(cfg, params, last)[:, 0], new_cache


@functools.partial(jax.jit, static_argnums=(0,))
def greedy_decode_step(cfg, params, rope, cache, token):
    hidden, new_cache = forward_hidden(
        cfg, params, token[:, None], cache, cache.lengths, rope
    )
    logits = lm_logits(cfg, params, hidden)[:, 0]
    return jnp.argmax(logits, -1).astype(jnp.int32), new_cache
