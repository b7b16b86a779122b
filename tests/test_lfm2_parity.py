"""LFM2 hybrid attention + short-conv parity vs HF (reference lfm2_5/ —
WIP in the reference; complete here)."""

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
    cfg = transformers.Lfm2Config(
        vocab_size=160, hidden_size=64, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        conv_L_cache=3, max_position_embeddings=256,
        block_auto_adjust_ff_dim=False, tie_word_embeddings=False,
        layer_types=["conv", "conv", "full_attention", "conv"],
    )
    model = transformers.Lfm2ForCausalLM(cfg).eval().to(torch.float32)
    d = str(tmp_path_factory.mktemp("lfm2") / "m")
    model.save_pretrained(d, safe_serialization=True)
    return model, d


def test_prefill_logits_match_hf(tiny):
    model, d = tiny
    ids = np.array([[1, 5, 9, 17, 33, 2, 7, 11]], dtype=np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).logits.numpy()
    lm = from_pretrained(d, dtype=jnp.float32)
    assert lm.config.layer_type(0) == "conv" and lm.config.layer_type(2) == "full"
    cache = lm.init_cache(1, 32)
    hidden, _ = forward_hidden(
        lm.config, lm.params, jnp.asarray(ids, jnp.int32), cache,
        jnp.asarray(0, jnp.int32), lm.rope,
    )
    got = np.asarray(lm_logits(lm.config, lm.params, hidden))
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))


def test_greedy_generation_matches_hf(tiny):
    """Exercises the rolling conv-state decode path."""
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
