"""Sparse-MoE Qwen3-Next parity vs HF (the released Qwen3-Next/Ornith models
are MoE; dense parity is covered in test_qwen3_next_parity)."""

import numpy as np
import pytest

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
