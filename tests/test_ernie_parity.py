"""Ernie 4.5 parity — PaddleOCR-VL's LLM backbone (reference paddleocr_vl/
model.rs:1-22): llama-style GQA with interleaved rotary pairs."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from crane_tpu.generation.config import GenerationConfig
from crane_tpu.models.auto import from_pretrained
from crane_tpu.models.modules.transformer import forward_hidden, lm_logits


def test_ernie_prefill_and_greedy(tmp_path):
    torch.manual_seed(0)
    cfg = transformers.Ernie4_5Config(
        vocab_size=160, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=500_000.0,
        use_bias=False, tie_word_embeddings=True,
    )
    model = transformers.Ernie4_5ForCausalLM(cfg).eval().to(torch.float32)
    d = str(tmp_path / "ernie")
    model.save_pretrained(d, safe_serialization=True)

    ids = np.array([[1, 5, 9, 17, 33, 2, 7, 11]], dtype=np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).logits.numpy()
    lm = from_pretrained(d, dtype=jnp.float32)
    assert lm.config.rope_mode == "interleaved"
    cache = lm.init_cache(1, 32)
    hidden, _ = forward_hidden(
        lm.config, lm.params, jnp.asarray(ids, jnp.int32), cache,
        jnp.asarray(0, jnp.int32), lm.rope,
    )
    got = np.asarray(lm_logits(lm.config, lm.params, hidden))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))

    with torch.no_grad():
        gref = model.generate(
            torch.tensor([[3, 14, 15]]), max_new_tokens=8, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )[0, 3:].tolist()
    lm.eos_token_ids = ()
    assert lm.generate([3, 14, 15], GenerationConfig.greedy(8)) == gref
