"""Sparse-MoE Qwen3-Next parity vs HF (the released Qwen3-Next/Ornith models
are MoE; dense parity is covered in test_qwen3_next_parity)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from crane_tpu.generation.config import GenerationConfig
from crane_tpu.models.auto import from_pretrained
from crane_tpu.models.modules.transformer import forward_hidden, lm_logits


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    torch.manual_seed(0)
    cfg = transformers.Qwen3NextConfig(
        vocab_size=160, hidden_size=64, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, linear_num_value_heads=4, linear_num_key_heads=2,
        linear_key_head_dim=16, linear_value_head_dim=8,
        linear_conv_kernel_dim=4, partial_rotary_factor=0.25,
        max_position_embeddings=256, tie_word_embeddings=False,
        num_experts=8, num_experts_per_tok=2, decoder_sparse_step=1,
        moe_intermediate_size=32, shared_expert_intermediate_size=48,
        norm_topk_prob=True, mlp_only_layers=[1],
        layer_types=["linear_attention", "linear_attention", "linear_attention", "full_attention"],
    )
    model = transformers.Qwen3NextForCausalLM(cfg).eval().to(torch.float32)
    d = str(tmp_path_factory.mktemp("moe") / "m")
    model.save_pretrained(d, safe_serialization=True)
    return model, d


def test_prefill_logits_match_hf(tiny):
    model, d = tiny
    ids = np.array([[1, 5, 9, 17, 33, 2, 7, 11]], dtype=np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).logits.numpy()
    lm = from_pretrained(d, dtype=jnp.float32)
    assert lm.config.num_experts == 8
    assert lm.config.is_moe_layer(0) and not lm.config.is_moe_layer(1)
    assert "router" in lm.params["layers"][0]["mlp"]
    assert "router" not in lm.params["layers"][1]["mlp"]
    cache = lm.init_cache(1, 32)
    hidden, _ = forward_hidden(
        lm.config, lm.params, jnp.asarray(ids, jnp.int32), cache,
        jnp.asarray(0, jnp.int32), lm.rope,
    )
    got = np.asarray(lm_logits(lm.config, lm.params, hidden))
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))


def test_greedy_generation_matches_hf(tiny):
    model, d = tiny
    prompt = [3, 14, 15, 92, 6]
    with torch.no_grad():
        ref = model.generate(
            torch.tensor([prompt]), max_new_tokens=10, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )[0, len(prompt):].tolist()
    lm = from_pretrained(d, dtype=jnp.float32)
    lm.eos_token_ids = ()
    got = lm.generate(prompt, GenerationConfig.greedy(10))
    assert got == ref


def test_ragged_dispatch_matches_dense():
    """Token-sorted ragged_dot segmented-GEMM dispatch must reproduce the
    dense one-hot formulation exactly (same routing, same math)."""
    import dataclasses

    import jax.random as jr

    from crane_tpu.models.modules.transformer import (
        TransformerConfig,
        _moe_dispatch_dense,
        _moe_dispatch_ragged,
    )

    cfg = TransformerConfig(
        vocab_size=16, hidden_size=32, num_layers=1, num_heads=2, num_kv_heads=2,
        head_dim=16, intermediate_size=64, num_experts=8, num_experts_per_tok=3,
        moe_intermediate_size=24,
    )
    key = jr.PRNGKey(0)
    k1, k2, k3, k4, k5 = jr.split(key, 5)
    E, I, G = cfg.hidden_size, cfg.moe_intermediate_size, cfg.num_experts
    p = {
        "experts_gate": jr.normal(k1, (G, E, I), jnp.float32) * E ** -0.5,
        "experts_up": jr.normal(k2, (G, E, I), jnp.float32) * E ** -0.5,
        "experts_down": jr.normal(k3, (G, I, E), jnp.float32) * I ** -0.5,
    }
    T = 13  # odd token count: uneven expert groups, some experts empty
    xt = jr.normal(k4, (T, E), jnp.float32)
    logits = jr.normal(k5, (T, G), jnp.float32)
    w, sel = jax.lax.top_k(jax.nn.softmax(logits, -1), cfg.num_experts_per_tok)
    w = w / w.sum(-1, keepdims=True)
    dense = np.asarray(_moe_dispatch_dense(cfg, p, xt, w, sel))
    ragged = np.asarray(_moe_dispatch_ragged(cfg, p, xt, w, sel))
    np.testing.assert_allclose(ragged, dense, rtol=1e-4, atol=1e-5)
