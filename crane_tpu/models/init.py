"""Random parameter initialization for a TransformerConfig (benchmarks,
dry-runs, tests — decode throughput is weight-content-independent)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from crane_tpu.models.modules.transformer import TransformerConfig


def init_params(cfg: TransformerConfig, seed: int = 0, dtype=jnp.bfloat16) -> dict:
    key = jax.random.PRNGKey(seed)

    def nrm(key, shape, scale):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    E, D = cfg.hidden_size, cfg.head_dim
    H, Hkv, I = cfg.num_heads, cfg.num_kv_heads, cfg.intermediate_size
    s = E ** -0.5
    keys = jax.random.split(key, cfg.num_layers + 2)
    q_out = H * D * (2 if cfg.attn_output_gate else 1)

    layers = []
    for i in range(cfg.num_layers):
        k = jax.random.split(keys[i], 8)
        attn = {
            "wq": nrm(k[0], (E, q_out), s),
            "wk": nrm(k[1], (E, Hkv * D), s),
            "wv": nrm(k[2], (E, Hkv * D), s),
            "wo": nrm(k[3], (H * D, E), (H * D) ** -0.5),
        }
        if cfg.qk_norm:
            attn["q_norm"] = jnp.ones((D,), dtype)
            attn["k_norm"] = jnp.ones((D,), dtype)
        if cfg.attn_bias:
            attn["bq"] = jnp.zeros((q_out,), dtype)
            attn["bk"] = jnp.zeros((Hkv * D,), dtype)
            attn["bv"] = jnp.zeros((Hkv * D,), dtype)
        layers.append(
            {
                "attn": attn,
                "mlp": {
                    "gate": nrm(k[4], (E, I), s),
                    "up": nrm(k[5], (E, I), s),
                    "down": nrm(k[6], (I, E), I ** -0.5),
                },
                "input_ln": jnp.ones((E,), dtype),
                "post_ln": jnp.ones((E,), dtype),
            }
        )
    params = {
        "embed": nrm(keys[-2], (cfg.vocab_size, E), 0.02),
        "layers": tuple(layers),
        "final_norm": jnp.ones((E,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = nrm(keys[-1], (E, cfg.vocab_size), s)
    return params


QWEN3_0_6B = TransformerConfig(
    vocab_size=151936, hidden_size=1024, num_layers=28, num_heads=16,
    num_kv_heads=8, head_dim=128, intermediate_size=3072, rms_norm_eps=1e-6,
    rope_theta=1000000.0, max_position_embeddings=40960, qk_norm=True,
    tie_word_embeddings=True,
)

QWEN3_TINY = TransformerConfig(
    vocab_size=512, hidden_size=128, num_layers=2, num_heads=4, num_kv_heads=2,
    head_dim=32, intermediate_size=256, qk_norm=True, tie_word_embeddings=True,
)
