"""Model factory detection cascade (reference model_factory, SURVEY §2.9)."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from crane_tpu.models.factory import detect_model_type, load_model


def test_detects_and_loads_qwen3(tmp_path):
    torch.manual_seed(0)
    cfg = transformers.Qwen3Config(
        vocab_size=128, hidden_size=32, intermediate_size=48,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=1,
        head_dim=16, max_position_embeddings=64,
    )
    d = str(tmp_path / "m")
    transformers.Qwen3ForCausalLM(cfg).save_pretrained(d, safe_serialization=True)
    assert detect_model_type(d) == "qwen3"
    lm = load_model(d, dtype=jnp.float32)
    from crane_tpu.models.causal_lm import CausalLM

    assert isinstance(lm, CausalLM)


def test_detects_and_loads_gemma3n(tmp_path):
    torch.manual_seed(0)
    cfg = transformers.Gemma3nTextConfig(
        vocab_size=96, vocab_size_per_layer_input=96, hidden_size=32,
        hidden_size_per_layer_input=16, intermediate_size=[48] * 2,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=16, layer_types=["sliding_attention", "full_attention"],
        sliding_window=4, num_kv_shared_layers=0, laurel_rank=2,
        altup_num_inputs=4, activation_sparsity_pattern=[0.0, 0.0],
        max_position_embeddings=64,
    )
    d = str(tmp_path / "g3n")
    transformers.Gemma3nForCausalLM(cfg).save_pretrained(d, safe_serialization=True)
    assert detect_model_type(d) == "gemma3n_text"
    from crane_tpu.models.gemma3n import Gemma3nLM

    lm = load_model(d, dtype=jnp.float32, max_seq=32)
    assert isinstance(lm, Gemma3nLM)
    ids = lm.generate_greedy(np.asarray([[3, 5, 7]]), 4)
    assert len(ids) == 4


def test_detects_gguf_file(tmp_path):
    p = tmp_path / "x.gguf"
    p.write_bytes(b"GGUF")
    assert detect_model_type(str(p)) == "gguf"
