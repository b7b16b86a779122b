"""Sharded training step (used by the multi-chip dry-run and as the
fine-tuning extension point; the reference is inference-only, SURVEY.md §5.4).

The forward reuses the exact inference code path (forward_hidden) with a
cache sized to the sequence — training and serving share one model
implementation, so parity bugs can't hide between them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from crane_tpu.models.modules.transformer import (
    TransformerConfig,
    forward_hidden,
    lm_logits,
    make_rope_tables,
)
from crane_tpu.ops.kv_cache import KVCache


def next_token_loss(
    cfg: TransformerConfig, params: dict, rope: dict, tokens: jax.Array,
    *, remat: bool = True,
) -> jax.Array:
    B, S = tokens.shape
    cache = KVCache.empty(
        cfg.num_layers, B, S, cfg.num_kv_heads, cfg.head_dim, jnp.float32
    )
    # remat: per-layer jax.checkpoint — activation HBM stays O(one layer)
    hidden, _ = forward_hidden(
        cfg, params, tokens, cache, jnp.asarray(0, jnp.int32), rope,
        remat=remat,
    )
    logits = lm_logits(cfg, params, hidden)  # [B, S, V] f32
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return nll.mean()


def make_train_step(cfg: TransformerConfig, optimizer):
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, rope, tokens):
        loss, grads = jax.value_and_grad(
            lambda p: next_token_loss(cfg, p, rope, tokens)
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
