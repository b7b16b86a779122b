"""Gemma3 text parity vs HF — the reference's "Gemma4" architecture-diversity
family (gemma4/modeling.rs:1-21): sliding/full hybrid, dual-theta RoPE,
unit-offset + sandwich norms, QK norms, scaled embeddings, GELU-tanh."""

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
    cfg = transformers.Gemma3TextConfig(
        vocab_size=160, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128,
        rope_theta=1_000_000.0, rope_local_base_freq=10_000.0,
        sliding_window=8, query_pre_attn_scalar=16,
        layer_types=["sliding_attention", "sliding_attention", "full_attention", "sliding_attention"],
        tie_word_embeddings=True,
    )
    model = transformers.Gemma3ForCausalLM(cfg).eval().to(torch.float32)
    d = str(tmp_path_factory.mktemp("g3") / "m")
    model.save_pretrained(d, safe_serialization=True)
    return model, d


def test_prefill_logits_match_hf(tiny):
    model, d = tiny
    # sequence longer than the sliding window so windowing matters
    ids = np.array([[1, 5, 9, 17, 33, 2, 7, 11, 4, 3, 22, 8]], dtype=np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).logits.numpy()
    lm = from_pretrained(d, dtype=jnp.float32)
    assert lm.config.sandwich_norms and lm.config.rope_local_theta == 10_000.0
    cache = lm.init_cache(1, 32)
    hidden, _ = forward_hidden(
        lm.config, lm.params, jnp.asarray(ids, jnp.int32), cache,
        jnp.asarray(0, jnp.int32), lm.rope,
    )
    got = np.asarray(lm_logits(lm.config, lm.params, hidden))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))


def test_greedy_generation_matches_hf(tiny):
    model, d = tiny
    prompt = [3, 14, 15, 92, 6, 44, 12, 7, 9, 10]  # > sliding window
    with torch.no_grad():
        ref = model.generate(
            torch.tensor([prompt]), max_new_tokens=8, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )[0, len(prompt):].tolist()
    lm = from_pretrained(d, dtype=jnp.float32)
    lm.eos_token_ids = ()  # HF call above disables EOS; mirror that
    got = lm.generate(prompt, GenerationConfig.greedy(8))
    assert got == ref


def test_sliding_decode_equals_prefill(tiny):
    _, d = tiny
    lm = from_pretrained(d, dtype=jnp.float32)
    ids = np.array([[1, 5, 9, 17, 33, 2, 7, 11, 4, 3, 22, 8]], dtype=np.int32)
    cache = lm.init_cache(1, 32)
    hidden, _ = forward_hidden(
        lm.config, lm.params, jnp.asarray(ids), cache, jnp.asarray(0, jnp.int32), lm.rope
    )
    full = np.asarray(lm_logits(lm.config, lm.params, hidden))
    cache = lm.init_cache(1, 32)
    pad = np.zeros((1, 16), np.int32)
    pad[0, :5] = ids[0, :5]
    logits, cache = lm.prefill(cache, pad, [5])
    np.testing.assert_allclose(np.asarray(logits)[0], full[0, 4], rtol=2e-3, atol=2e-3)
    for s in range(5, ids.shape[1]):
        hidden, cache = forward_hidden(
            lm.config, lm.params, jnp.asarray(ids[:, s : s + 1]), cache,
            cache.lengths, lm.rope,
        )
        step = np.asarray(lm_logits(lm.config, lm.params, hidden))[0, 0]
        np.testing.assert_allclose(step, full[0, s], rtol=2e-3, atol=2e-3)
