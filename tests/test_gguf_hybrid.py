"""GGUF loading of the hybrid GDN arch (llama.cpp qwen35 layout): split
projections, folded unit-offset norms, and the CHUNKED value-head order —
the reference's marquee GGUF hazard ("getting it wrong silently mispairs
every GDN head", ops/gdn/config.rs:13-22). The fixture converts a tiny HF
qwen3_next checkpoint into that exact layout (v_per_group=2: the ordering
matters — the reference notes v_per_group==1 hides the bug)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from crane_tpu.generation.config import GenerationConfig
from crane_tpu.loaders.gguf import GGML_F32
from crane_tpu.loaders.gguf_model import from_gguf
from crane_tpu.models.auto import from_pretrained
from tests.test_gguf import write_gguf

HK, VG = 2, 2  # 4 v heads
K, V = 16, 8


def _interleaved_to_chunked_perm():
    # chunked index c = rep*Hk + kh  <-  interleaved index j = kh*vg + rep
    perm = np.empty(HK * VG, np.int64)
    for kh in range(HK):
        for rep in range(VG):
            perm[rep * HK + kh] = kh * VG + rep
    return perm


def _convert_to_gguf(hf_dir: str, out_path: str):
    """HF qwen3_next -> llama.cpp qwen35 GGUF layout (fold norms, split
    projections, chunked v-head order)."""
    import json

    from crane_tpu.loaders.safetensors_loader import load_state_dict
    from crane_tpu.models.auto import load_hf_config

    hf = load_hf_config(hf_dir)
    sd = {k: np.asarray(v, np.float32) for k, v in load_state_dict(hf_dir).items()}
    n_layers = hf["num_hidden_layers"]
    perm = _interleaved_to_chunked_perm()
    tensors = {}

    def put(name, arr, transpose=False):
        arr = np.ascontiguousarray(arr.T if transpose else arr, dtype=np.float32)
        tensors[name] = (GGML_F32, arr.shape, arr.tobytes())

    put("token_embd.weight", sd["model.embed_tokens.weight"])
    put("output_norm.weight", sd["model.norm.weight"] + 1.0)
    if "lm_head.weight" in sd:
        put("output.weight", sd["lm_head.weight"])
    for i in range(n_layers):
        lp = f"model.layers.{i}."
        b = f"blk.{i}."
        put(b + "attn_norm.weight", sd[lp + "input_layernorm.weight"] + 1.0)
        put(b + "post_attention_norm.weight", sd[lp + "post_attention_layernorm.weight"] + 1.0)
        put(b + "ffn_gate.weight", sd[lp + "mlp.gate_proj.weight"])
        put(b + "ffn_up.weight", sd[lp + "mlp.up_proj.weight"])
        put(b + "ffn_down.weight", sd[lp + "mlp.down_proj.weight"])
        if lp + "linear_attn.in_proj_qkvz.weight" in sd:
            # split the HF per-k-head-grouped fused projection
            w = sd[lp + "linear_attn.in_proj_qkvz.weight"]  # [out, in]
            hidden = w.shape[1]
            blk = w.reshape(HK, 2 * K + 2 * VG * V, hidden)
            q = blk[:, :K].reshape(HK * K, hidden)
            k = blk[:, K : 2 * K].reshape(HK * K, hidden)
            v = blk[:, 2 * K : 2 * K + VG * V].reshape(HK * VG, V, hidden)
            z = blk[:, 2 * K + VG * V :].reshape(HK * VG, V, hidden)
            v = v[perm].reshape(HK * VG * V, hidden)  # -> chunked order
            z = z[perm].reshape(HK * VG * V, hidden)
            put(b + "attn_qkv.weight", np.concatenate([q, k, v], axis=0))
            put(b + "attn_gate.weight", z)
            ba = sd[lp + "linear_attn.in_proj_ba.weight"].reshape(HK, 2 * VG, hidden)
            bb = ba[:, :VG].reshape(HK * VG, hidden)[perm]
            aa = ba[:, VG:].reshape(HK * VG, hidden)[perm]
            put(b + "ssm_beta.weight", bb)
            put(b + "ssm_alpha.weight", aa)
            conv = sd[lp + "linear_attn.conv1d.weight"][:, 0, :]  # [conv_dim, k]
            kd = HK * K
            vrows = conv[2 * kd :].reshape(HK * VG, V, -1)[perm].reshape(HK * VG * V, -1)
            put(b + "ssm_conv1d.weight", np.concatenate([conv[: 2 * kd], vrows], axis=0))
            put(b + "ssm_dt.bias", sd[lp + "linear_attn.dt_bias"][perm])
            put(b + "ssm_a", sd[lp + "linear_attn.A_log"][perm])
            put(b + "ssm_norm.weight", sd[lp + "linear_attn.norm.weight"])
            put(b + "ssm_out.weight", sd[lp + "linear_attn.out_proj.weight"].T.reshape(HK * VG, V, -1)[perm].reshape(HK * VG * V, -1), transpose=True)
        else:
            put(b + "attn_q.weight", sd[lp + "self_attn.q_proj.weight"])
            put(b + "attn_k.weight", sd[lp + "self_attn.k_proj.weight"])
            put(b + "attn_v.weight", sd[lp + "self_attn.v_proj.weight"])
            put(b + "attn_output.weight", sd[lp + "self_attn.o_proj.weight"])
            put(b + "attn_q_norm.weight", sd[lp + "self_attn.q_norm.weight"] + 1.0)
            put(b + "attn_k_norm.weight", sd[lp + "self_attn.k_norm.weight"] + 1.0)

    rot = int(hf["head_dim"] * hf.get("partial_rotary_factor", 0.25))
    metadata = {
        "general.architecture": "qwen35",
        "qwen35.block_count": n_layers,
        "qwen35.embedding_length": hf["hidden_size"],
        "qwen35.feed_forward_length": hf["intermediate_size"],
        "qwen35.attention.head_count": hf["num_attention_heads"],
        "qwen35.attention.head_count_kv": hf["num_key_value_heads"],
        "qwen35.attention.key_length": hf["head_dim"],
        "qwen35.attention.layer_norm_rms_epsilon": hf.get("rms_norm_eps", 1e-6),
        "qwen35.rope.freq_base": hf.get("rope_theta", 10000.0),
        "qwen35.rope.dimension_count": rot,
        "qwen35.context_length": hf["max_position_embeddings"],
        "qwen35.ssm.time_step_rank": hf["linear_num_value_heads"],
        "qwen35.ssm.inner_size": hf["linear_num_value_heads"] * hf["linear_value_head_dim"],
        "qwen35.ssm.group_count": hf["linear_num_key_heads"],
        "qwen35.ssm.state_size": hf["linear_key_head_dim"],
        "qwen35.ssm.conv_kernel": hf["linear_conv_kernel_dim"],
        "tokenizer.ggml.tokens": [f"t{i}" for i in range(hf["vocab_size"])],
        "tokenizer.ggml.eos_token_id": 2,
    }
    return write_gguf(out_path, metadata, tensors)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    torch.manual_seed(0)
    cfg = transformers.Qwen3NextConfig(
        vocab_size=160, hidden_size=64, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, linear_num_value_heads=HK * VG, linear_num_key_heads=HK,
        linear_key_head_dim=K, linear_value_head_dim=V,
        linear_conv_kernel_dim=4, partial_rotary_factor=0.25,
        max_position_embeddings=256, num_experts=0, decoder_sparse_step=0,
        tie_word_embeddings=False,
        layer_types=["linear_attention"] * 3 + ["full_attention"],
    )
    model = transformers.Qwen3NextForCausalLM(cfg).eval().to(torch.float32)
    d = str(tmp_path_factory.mktemp("gh") / "m")
    model.save_pretrained(d, safe_serialization=True)
    return d


def test_gguf_hybrid_token_exact(ckpt, tmp_path):
    path = _convert_to_gguf(ckpt, str(tmp_path / "m.gguf"))
    lm_st = from_pretrained(ckpt, dtype=jnp.float32)
    lm_gg = from_gguf(path, dtype=jnp.float32)
    assert lm_gg.config.gdn is not None
    assert lm_gg.config.layer_type(0) == "gdn" and lm_gg.config.layer_type(3) == "full"
    assert lm_gg.config.attn_output_gate
    prompt = [3, 14, 15, 92, 6]
    a = lm_st.generate(prompt, GenerationConfig.greedy(10))
    b = lm_gg.generate(prompt, GenerationConfig.greedy(10))
    assert a == b


def test_head_order_matters(ckpt, tmp_path):
    """Loading chunked weights WITHOUT the permutation must change outputs —
    the silent-mispairing failure the reference guards against."""
    from crane_tpu.loaders.gguf_model import GGUFReader, config_from_gguf, map_gguf_weights
    import crane_tpu.loaders.gguf_model as gm

    path = _convert_to_gguf(ckpt, str(tmp_path / "m2.gguf"))
    r = GGUFReader(path)
    cfg = config_from_gguf(r)
    good = map_gguf_weights(cfg, r, jnp.float32)
    orig = gm._chunked_to_interleaved_perm
    try:
        gm._chunked_to_interleaved_perm = lambda n, v: np.arange(n * v)
        bad = map_gguf_weights(cfg, r, jnp.float32)
    finally:
        gm._chunked_to_interleaved_perm = orig
    from crane_tpu.models.causal_lm import CausalLM
    from crane_tpu.models.modules.transformer import forward_hidden, lm_logits

    lm_good = CausalLM(cfg, good, dtype=jnp.float32)
    lm_bad = CausalLM(cfg, bad, dtype=jnp.float32)
    ids = jnp.asarray([[3, 14, 15, 92, 6]], jnp.int32)

    def logits(lm):
        cache = lm.init_cache(1, 16)
        h, _ = forward_hidden(
            lm.config, lm.params, ids, cache, jnp.asarray(0, jnp.int32), lm.rope
        )
        return np.asarray(lm_logits(lm.config, lm.params, h))

    diff = np.abs(logits(lm_good) - logits(lm_bad)).max()
    assert diff > 1e-3, diff  # mispaired heads must change the logits


def test_gguf_hybrid_tp_generate_matches(ckpt, tmp_path):
    """The loader fuses GGUF's split GDN projections into the k-head-major
    qkvz/ba layout, so a GGUF hybrid shards under tensor parallelism like a
    safetensors one — token-identical to single-device."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from crane_tpu.parallel.inference import shard_lm
    from crane_tpu.parallel.sharding import make_mesh

    path = _convert_to_gguf(ckpt, str(tmp_path / "tp.gguf"))
    lm = from_gguf(path, dtype=jnp.float32)
    assert "in_proj_qkvz" in lm.params["layers"][0]["gdn"]
    prompt = [3, 14, 15, 92, 6]
    expected = lm.generate(prompt, GenerationConfig.greedy(8))

    slm = shard_lm(lm, make_mesh(dp=1, tp=2))
    w = slm.params["layers"][0]["gdn"]["in_proj_qkvz"]
    assert len(w.sharding.device_set) == 2
    assert slm.generate(prompt, GenerationConfig.greedy(8)) == expected
