"""GGUF end-to-end: tiny qwen3 checkpoint -> GGUF file -> from_gguf model.

Reference bar: greedy byte-comparable generation across weight formats
(crane-core/tests/qwen3_5_quant.rs:24-27) and GGUF-embedded tokenizer
(autotokenizer.rs:162-230)."""

import numpy as np
import pytest

import jax.numpy as jnp

from crane_tpu.generation.config import GenerationConfig
from crane_tpu.loaders.gguf import GGML_F32, quantize_q8_0, GGML_Q8_0
from crane_tpu.loaders.gguf_model import from_gguf
from crane_tpu.models.auto import from_pretrained, load_hf_config
from tests.fixtures import make_tiny_qwen3_checkpoint
from tests.test_gguf import write_gguf

HF_TO_GGUF = {
    "model.embed_tokens.weight": "token_embd.weight",
    "model.norm.weight": "output_norm.weight",
    "lm_head.weight": "output.weight",
}
LAYER_MAP = {
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.o_proj.weight": "attn_output.weight",
    "self_attn.q_norm.weight": "attn_q_norm.weight",
    "self_attn.k_norm.weight": "attn_k_norm.weight",
    "mlp.gate_proj.weight": "ffn_gate.weight",
    "mlp.up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
    "input_layernorm.weight": "attn_norm.weight",
    "post_attention_layernorm.weight": "ffn_norm.weight",
}


def _hf_to_gguf_tensors(d, quant_2d=False):
    from crane_tpu.loaders.safetensors_loader import load_state_dict

    sd = load_state_dict(d)
    out = {}
    for name, arr in sd.items():
        arr = np.asarray(arr, np.float32)
        gname = HF_TO_GGUF.get(name)
        if gname is None:
            parts = name.split(".")
            idx = parts[2]
            sub = ".".join(parts[3:])
            gname = f"blk.{idx}.{LAYER_MAP[sub]}"
        if quant_2d and arr.ndim == 2 and arr.shape[1] % 32 == 0 and "embd" not in gname and gname != "output.weight":
            out[gname] = (GGML_Q8_0, arr.shape, quantize_q8_0(arr).tobytes())
        else:
            out[gname] = (GGML_F32, arr.shape, arr.tobytes())
    return out


def _gguf_metadata(d, tok):
    hf = load_hf_config(d)
    vocab = tok.get_vocab()
    tokens = [None] * len(vocab)
    for t, i in vocab.items():
        tokens[i] = t
    return {
        "general.architecture": "qwen3",
        "qwen3.block_count": hf["num_hidden_layers"],
        "qwen3.embedding_length": hf["hidden_size"],
        "qwen3.feed_forward_length": hf["intermediate_size"],
        "qwen3.attention.head_count": hf["num_attention_heads"],
        "qwen3.attention.head_count_kv": hf["num_key_value_heads"],
        "qwen3.attention.key_length": hf["head_dim"],
        "qwen3.attention.layer_norm_rms_epsilon": hf["rms_norm_eps"],
        "qwen3.rope.freq_base": hf["rope_theta"],
        "qwen3.context_length": hf["max_position_embeddings"],
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.eos_token_id": 1,
        "tokenizer.chat_template": "{% for m in messages %}{{ m.content }}{% endfor %}",
    }


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    return make_tiny_qwen3_checkpoint(str(tmp_path_factory.mktemp("gg") / "m"))


def test_gguf_f32_token_exact(ckpt, tmp_path):
    from tokenizers import Tokenizer

    tok = Tokenizer.from_file(f"{ckpt}/tokenizer.json")
    path = write_gguf(
        str(tmp_path / "m-f32.gguf"),
        _gguf_metadata(ckpt, tok),
        _hf_to_gguf_tensors(ckpt),
    )
    lm_st = from_pretrained(ckpt, dtype=jnp.float32)
    lm_gg = from_gguf(path, dtype=jnp.float32)
    assert lm_gg.config.num_layers == lm_st.config.num_layers
    assert lm_gg.config.qk_norm
    prompt = [3, 14, 15, 92, 6]
    a = lm_st.generate(prompt, GenerationConfig.greedy(10))
    b = lm_gg.generate(prompt, GenerationConfig.greedy(10))
    assert a == b


def test_gguf_q8_generation(ckpt, tmp_path):
    from tokenizers import Tokenizer

    tok = Tokenizer.from_file(f"{ckpt}/tokenizer.json")
    path = write_gguf(
        str(tmp_path / "m-q8.gguf"),
        _gguf_metadata(ckpt, tok),
        _hf_to_gguf_tensors(ckpt, quant_2d=True),
    )
    lm_st = from_pretrained(ckpt, dtype=jnp.float32)
    lm_gg = from_gguf(path, dtype=jnp.float32, keep_quant=True)
    from crane_tpu.ops.linear import QuantizedWeight

    assert isinstance(lm_gg.params["layers"][0]["attn"]["wq"], QuantizedWeight)
    prompt = [3, 14, 15, 92, 6]
    a = lm_st.generate(prompt, GenerationConfig.greedy(8))
    b = lm_gg.generate(prompt, GenerationConfig.greedy(8))
    assert a == b  # q8_0 is token-exact on the tiny model


def test_gguf_embedded_tokenizer(ckpt, tmp_path):
    from tokenizers import Tokenizer

    tok = Tokenizer.from_file(f"{ckpt}/tokenizer.json")
    # merges needed for a usable BPE; take them from the saved tokenizer json
    import json

    with open(f"{ckpt}/tokenizer.json") as f:
        tj = json.load(f)
    merges = [
        m if isinstance(m, str) else " ".join(m) for m in tj["model"]["merges"]
    ]
    md = _gguf_metadata(ckpt, tok)
    md["tokenizer.ggml.merges"] = merges
    path = write_gguf(
        str(tmp_path / "m-tok.gguf"), md, _hf_to_gguf_tensors(ckpt)
    )
    lm = from_gguf(path, dtype=jnp.float32)
    assert lm.tokenizer is not None
    ids = lm.tokenizer.encode("hello world")
    assert ids == Tokenizer.from_file(f"{ckpt}/tokenizer.json").encode("hello world").ids
    out = lm.tokenizer.apply_chat_template([{"role": "user", "content": "hi"}])
    assert out == "hi"
    assert lm.eos_token_ids == (1,)
