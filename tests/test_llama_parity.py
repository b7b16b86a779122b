"""Llama parity incl. llama3 NTK-by-parts rope scaling."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from crane_tpu.generation.config import GenerationConfig
from crane_tpu.models.auto import from_pretrained
from crane_tpu.models.modules.transformer import forward_hidden, lm_logits


@pytest.mark.parametrize("scaling", [None, "llama3"])
def test_llama_prefill_and_greedy(tmp_path, scaling):
    torch.manual_seed(0)
    rs = None
    if scaling == "llama3":
        rs = {
            "rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
            "high_freq_factor": 4.0, "original_max_position_embeddings": 64,
        }
    cfg = transformers.LlamaConfig(
        vocab_size=160, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_scaling=rs, tie_word_embeddings=False,
    )
    model = transformers.LlamaForCausalLM(cfg).eval().to(torch.float32)
    d = str(tmp_path / f"llama-{scaling}")
    model.save_pretrained(d, safe_serialization=True)

    ids = np.array([[1, 5, 9, 17, 33, 2, 7, 11]], dtype=np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).logits.numpy()
    lm = from_pretrained(d, dtype=jnp.float32)
    if scaling == "llama3":
        assert lm.config.rope_llama3 is not None
    cache = lm.init_cache(1, 32)
    hidden, _ = forward_hidden(
        lm.config, lm.params, jnp.asarray(ids, jnp.int32), cache,
        jnp.asarray(0, jnp.int32), lm.rope,
    )
    got = np.asarray(lm_logits(lm.config, lm.params, hidden))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    with torch.no_grad():
        gref = model.generate(
            torch.tensor([[3, 14, 15]]), max_new_tokens=8, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )[0, 3:].tolist()
    lm.eos_token_ids = ()
    assert lm.generate([3, 14, 15], GenerationConfig.greedy(8)) == gref
