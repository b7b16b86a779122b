"""Model auto-detection + HF checkpoint loading.

Reference behavior: crane-serve's model_factory detects the family from
config.json ``model_type`` -> ``architectures`` -> GGUF header -> path
heuristics (/root/reference/crane-serve/src/engine/model_factory.rs:144-304).
Here config.json is authoritative; GGUF detection lives in the GGUF loader.

Weight mapping: HF transformer checkpoints store linear weights ``[out, in]``;
we store ``[in, out]`` so the forward is ``x @ w`` (row-major activations
against the 128-lane axis — the natural MXU layout).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax.numpy as jnp
import numpy as np

from crane_tpu.models.causal_lm import CausalLM
from crane_tpu.models.modules.transformer import TransformerConfig


def read_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def load_hf_config(model_dir: str) -> dict:
    return read_json(os.path.join(model_dir, "config.json"))


def transformer_config_from_hf(hf: dict) -> TransformerConfig:
    """Map an HF config.json dict to a TransformerConfig.

    Supported model_types (dense decoder families of the reference zoo §2.5):
    qwen2 (Qwen2.5 — attn bias, no QK-norm), qwen3, llama, and
    hunyuan-dense-style configs that follow the llama schema.
    """
    mt = hf.get("model_type", "llama")
    hidden = hf["hidden_size"]
    heads = hf["num_attention_heads"]
    head_dim = hf.get("head_dim") or hidden // heads
    common: dict[str, Any] = dict(
        vocab_size=hf["vocab_size"],
        hidden_size=hidden,
        num_layers=hf["num_hidden_layers"],
        num_heads=heads,
        num_kv_heads=hf.get("num_key_value_heads", heads),
        head_dim=head_dim,
        intermediate_size=hf["intermediate_size"],
        rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
        rope_theta=hf.get("rope_theta", 10000.0),
        max_position_embeddings=hf.get("max_position_embeddings", 32768),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
    )
    if mt == "qwen2":
        return TransformerConfig(attn_bias=True, qk_norm=False, **common)
    if mt == "qwen3":
        return TransformerConfig(attn_bias=False, qk_norm=True, **common)
    if mt in ("llama", "mistral"):
        rs = hf.get("rope_scaling") or {}
        llama3 = None
        if rs.get("rope_type", rs.get("type")) == "llama3":
            llama3 = (
                float(rs["factor"]),
                float(rs.get("low_freq_factor", 1.0)),
                float(rs.get("high_freq_factor", 4.0)),
                int(rs.get("original_max_position_embeddings", 8192)),
            )
        return TransformerConfig(
            attn_bias=hf.get("attention_bias", False), qk_norm=False,
            rope_llama3=llama3, **common,
        )
    if mt == "ernie4_5":
        # PaddleOCR-VL's LLM backbone (reference paddleocr_vl/model.rs:1-22
        # wraps candle's paddleocr_vl = NaViT vision + Ernie-4.5 decoder):
        # llama-style GQA with INTERLEAVED rotary pairs and optional
        # all-projection biases
        common["rms_norm_eps"] = hf.get("rms_norm_eps", 1e-5)
        common["rope_theta"] = hf.get("rope_theta", 500_000.0)
        return TransformerConfig(
            attn_bias=hf.get("use_bias", False), qk_norm=False,
            rope_mode="interleaved", **common,
        )
    if mt == "hunyuan_v1_dense":
        # reference Hunyuan Dense (hunyuan_dense/): llama-like with per-head
        # QK norms applied after RoPE
        return TransformerConfig(
            attn_bias=hf.get("attention_bias", False),
            qk_norm=True, qk_norm_after_rope=True, **common,
        )
    if mt in ("gemma3_text", "gemma3"):
        # reference "Gemma4" family (gemma4/modeling.rs:1-21): hybrid
        # sliding/full layers, dual-theta RoPE, unit-offset norms, QK norms,
        # sandwich norms, scaled embeddings, GELU-tanh MLP
        if mt == "gemma3" and "text_config" in hf:
            return transformer_config_from_hf({**hf["text_config"], "model_type": "gemma3_text"})
        layer_types = tuple(
            "sliding" if t == "sliding_attention" else "full"
            for t in hf["layer_types"]
        )
        rope_scaling = hf.get("rope_scaling") or {}
        common["rope_theta"] = hf.get("rope_theta", 1_000_000.0)
        return TransformerConfig(
            qk_norm=True,
            attn_bias=hf.get("attention_bias", False),
            norm_weight_offset=1.0,
            sandwich_norms=True,
            layer_types=layer_types,
            sliding_window=hf.get("sliding_window", 4096),
            rope_local_theta=hf.get("rope_local_base_freq", 10000.0),
            rope_scaling_factor=float(rope_scaling.get("factor", 1.0)),
            query_scale=float(hf.get("query_pre_attn_scalar", hf.get("head_dim", 256))) ** -0.5,
            embed_scale=float(hf["hidden_size"]) ** 0.5,
            act="gelu_tanh",
            attn_logit_softcap=hf.get("attn_logit_softcapping"),
            logit_softcap=hf.get("final_logit_softcapping"),
            **common,
        )
    if mt == "lfm2":
        # reference LFM2.5 (lfm2_5/, WIP there): hybrid attention + short-conv
        return TransformerConfig(
            qk_norm=True,
            rms_norm_eps=hf.get("norm_eps", 1e-5),
            layer_types=tuple(
                "conv" if t != "full_attention" else "full"
                for t in hf["layer_types"]
            ),
            conv_l_cache=hf.get("conv_L_cache", 3),
            conv_bias=hf.get("conv_bias", False),
            **{k: v for k, v in common.items() if k != "rms_norm_eps"},
        )
    if mt in ("qwen3_next", "qwen3_5"):
        # hybrid GDN architecture (reference Qwen3.5/Ornith, qwen3_5/):
        # unit-offset norms, 2x-wide gated q_proj, partial rotary,
        # 3-in-4 linear-attention layers
        from crane_tpu.models.modules.gdn_layer import GdnConfig

        if hf.get("num_experts", 0):
            common.update(
                num_experts=hf["num_experts"],
                num_experts_per_tok=hf.get("num_experts_per_tok", 8),
                moe_intermediate_size=hf.get("moe_intermediate_size", 0),
                shared_expert_intermediate_size=hf.get("shared_expert_intermediate_size", 0),
                norm_topk_prob=hf.get("norm_topk_prob", True),
                decoder_sparse_step=hf.get("decoder_sparse_step", 1),
                mlp_only_layers=tuple(hf.get("mlp_only_layers", ())),
            )
        layer_types = tuple(
            "gdn" if t == "linear_attention" else "full"
            for t in hf["layer_types"]
        )
        gdn = GdnConfig(
            num_v_heads=hf["linear_num_value_heads"],
            num_k_heads=hf["linear_num_key_heads"],
            head_k_dim=hf["linear_key_head_dim"],
            head_v_dim=hf["linear_value_head_dim"],
            conv_kernel=hf.get("linear_conv_kernel_dim", 4),
        )
        return TransformerConfig(
            attn_bias=hf.get("attention_bias", False),
            qk_norm=True,
            norm_weight_offset=1.0,
            attn_output_gate=True,
            partial_rotary_factor=hf.get("partial_rotary_factor", 0.25),
            layer_types=layer_types,
            gdn=gdn,
            **common,
        )
    raise ValueError(f"unsupported model_type for dense causal LM: {mt!r}")


def _t(w, dtype):
    """HF [out, in] linear weight -> [in, out]."""
    return jnp.asarray(np.asarray(w).T, dtype=dtype)


def _a(w, dtype):
    return jnp.asarray(np.asarray(w), dtype=dtype)


def _map_moe(cfg: TransformerConfig, sd: dict, lp: str, dtype) -> dict:
    """Stacked expert weights for the sparse-MoE MLP (qwen3_next naming)."""
    n = cfg.num_experts
    stack_t = lambda name: jnp.asarray(
        np.stack([np.asarray(sd[f"{lp}mlp.experts.{e}.{name}.weight"]).T for e in range(n)]),
        dtype,
    )
    moe = {
        "router": _t(sd[lp + "mlp.gate.weight"], dtype),
        "experts_gate": stack_t("gate_proj"),
        "experts_up": stack_t("up_proj"),
        "experts_down": stack_t("down_proj"),
    }
    if lp + "mlp.shared_expert.gate_proj.weight" in sd:
        moe["shared_gate_proj"] = _t(sd[lp + "mlp.shared_expert.gate_proj.weight"], dtype)
        moe["shared_up"] = _t(sd[lp + "mlp.shared_expert.up_proj.weight"], dtype)
        moe["shared_down"] = _t(sd[lp + "mlp.shared_expert.down_proj.weight"], dtype)
        moe["shared_gate"] = _t(sd[lp + "mlp.shared_expert_gate.weight"], dtype)
    return moe


def _pick(sd: dict, *names: str):
    for n in names:
        if n in sd:
            return sd[n]
    raise KeyError(names[0])


def map_hf_weights(cfg: TransformerConfig, sd: dict, dtype=jnp.bfloat16) -> dict:
    """Map an HF llama/qwen-style state dict to the crane_tpu param tree."""
    p = "model."
    layers = []
    for i in range(cfg.num_layers):
        lp = f"{p}layers.{i}."
        if cfg.is_moe_layer(i):
            mlp = _map_moe(cfg, sd, lp, dtype)
        else:
            mlp = {
                "gate": _t(_pick(sd, lp + "mlp.gate_proj.weight", lp + "feed_forward.w1.weight"), dtype),
                "up": _t(_pick(sd, lp + "mlp.up_proj.weight", lp + "feed_forward.w3.weight"), dtype),
                "down": _t(_pick(sd, lp + "mlp.down_proj.weight", lp + "feed_forward.w2.weight"), dtype),
            }
        if cfg.layer_type(i) == "conv":
            conv = {
                "in_proj": _t(sd[lp + "conv.in_proj.weight"], dtype),
                "out_proj": _t(sd[lp + "conv.out_proj.weight"], dtype),
                "conv_w": _a(np.asarray(sd[lp + "conv.conv.weight"])[:, 0, :], jnp.float32),
            }
            if lp + "conv.conv.bias" in sd:
                conv["conv_b"] = _a(sd[lp + "conv.conv.bias"], dtype)
            layers.append(
                {
                    "conv": conv,
                    "mlp": mlp,
                    "input_ln": _a(_pick(sd, lp + "input_layernorm.weight", lp + "operator_norm.weight"), dtype),
                    "post_ln": _a(_pick(sd, lp + "post_attention_layernorm.weight", lp + "ffn_norm.weight"), dtype),
                }
            )
            continue
        if cfg.layer_type(i) == "gdn":
            gp = lp + "linear_attn."
            layers.append(
                {
                    "gdn": {
                        "in_proj_qkvz": _t(sd[gp + "in_proj_qkvz.weight"], dtype),
                        "in_proj_ba": _t(sd[gp + "in_proj_ba.weight"], dtype),
                        # HF conv1d weight [conv_dim, 1, k] -> [conv_dim, k]
                        "conv_w": _a(np.asarray(sd[gp + "conv1d.weight"])[:, 0, :], jnp.float32),
                        "dt_bias": _a(sd[gp + "dt_bias"], jnp.float32),
                        "A_log": _a(sd[gp + "A_log"], jnp.float32),
                        "norm": _a(sd[gp + "norm.weight"], dtype),
                        "out_proj": _t(sd[gp + "out_proj.weight"], dtype),
                    },
                    "mlp": mlp,
                    "input_ln": _a(sd[lp + "input_layernorm.weight"], dtype),
                    "post_ln": _a(sd[lp + "post_attention_layernorm.weight"], dtype),
                }
            )
            continue
        attn = {
            "wq": _t(sd[lp + "self_attn.q_proj.weight"], dtype),
            "wk": _t(sd[lp + "self_attn.k_proj.weight"], dtype),
            "wv": _t(sd[lp + "self_attn.v_proj.weight"], dtype),
            "wo": _t(_pick(sd, lp + "self_attn.o_proj.weight", lp + "self_attn.out_proj.weight"), dtype),
        }
        if cfg.attn_bias:
            for nm, key in (("bq", "q_proj"), ("bk", "k_proj"), ("bv", "v_proj")):
                bias = sd.get(lp + f"self_attn.{key}.bias")
                if bias is not None:
                    attn[nm] = _a(bias, dtype)
        if cfg.qk_norm:
            attn["q_norm"] = _a(_pick(
                sd, lp + "self_attn.q_norm.weight",
                lp + "self_attn.query_layernorm.weight",  # hunyuan
                lp + "self_attn.q_layernorm.weight",  # lfm2
            ), dtype)
            attn["k_norm"] = _a(_pick(
                sd, lp + "self_attn.k_norm.weight",
                lp + "self_attn.key_layernorm.weight",
                lp + "self_attn.k_layernorm.weight",
            ), dtype)
        layer = {
            "attn": attn,
            "mlp": mlp,
            "input_ln": _a(_pick(sd, lp + "input_layernorm.weight", lp + "operator_norm.weight"), dtype),
        }
        if cfg.sandwich_norms:
            layer["post_attn_ln"] = _a(sd[lp + "post_attention_layernorm.weight"], dtype)
            layer["pre_ffn_ln"] = _a(sd[lp + "pre_feedforward_layernorm.weight"], dtype)
            layer["post_ffn_ln"] = _a(sd[lp + "post_feedforward_layernorm.weight"], dtype)
        else:
            layer["post_ln"] = _a(_pick(sd, lp + "post_attention_layernorm.weight", lp + "ffn_norm.weight"), dtype)
        layers.append(layer)
    params = {
        "embed": _a(sd[p + "embed_tokens.weight"], dtype),
        "layers": tuple(layers),
        "final_norm": _a(_pick(sd, p + "norm.weight", p + "embedding_norm.weight"), dtype),
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = _t(sd["lm_head.weight"], dtype)
    return params


def read_eos_ids(model_dir: str) -> tuple[int, ...]:
    """Multi-id EOS from generation_config.json (reference
    qwen3_5/model.rs:540-567), falling back to config.json."""
    ids: list[int] = []
    for fname in ("generation_config.json", "config.json"):
        path = os.path.join(model_dir, fname)
        if os.path.exists(path):
            eos = read_json(path).get("eos_token_id")
            if eos is None:
                continue
            ids = list(eos) if isinstance(eos, list) else [eos]
            break
    return tuple(ids)


def from_pretrained(
    model_dir: str,
    *,
    dtype=jnp.bfloat16,
    tokenizer=None,
    quant_bits: int | None = None,
) -> CausalLM:
    """Load a dense causal LM from an HF checkpoint directory or hub id
    (hub fallback mirrors reference autotokenizer.rs:232-258)."""
    from crane_tpu.loaders.safetensors_loader import load_state_dict
    from crane_tpu.utils.hub import resolve_checkpoint

    model_dir = resolve_checkpoint(model_dir)
    hf = load_hf_config(model_dir)
    cfg = transformer_config_from_hf(hf)
    sd = load_state_dict(model_dir)
    params = map_hf_weights(cfg, sd, dtype)
    if quant_bits is not None:
        params = quantize_params(params, bits=quant_bits)
    if tokenizer is None:
        try:
            from crane_tpu.tokenizer.autotokenizer import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(model_dir)
        except Exception:
            tokenizer = None
    return CausalLM(
        cfg, params, tokenizer=tokenizer, eos_token_ids=read_eos_ids(model_dir),
        dtype=dtype,
    )


def quantize_params(
    params: dict, *, bits: int = 8, block: int = 32, quant_tied_head: bool | None = None
) -> dict:
    """In-situ quantization of all large linear weights (reference ISQ,
    ops/linear.rs:80-116). Embeddings, norms and biases stay dense.

    ``quant_tied_head``: for tied-embedding models, additionally store a
    quantized COPY of the head projection (the bf16 embedding stays for
    gathers). On Qwen3-0.6B the tied head is ~311 MB bf16 — the single
    largest per-token HBM read in quantized decode — so this trades ~78 MB
    of extra weight memory (int4) for ~1.4x decode. The reference never
    quantizes the tied head (qwen3_5/model.rs:116-121), but measured int4
    decode is HBM-roof-bound on exactly that read (bench.py --mode quant:
    w4h is the fastest variant), so int4 defaults it ON; int8 keeps it off.
    CRANE_QUANT_TIED_HEAD=0/1 overrides either way."""
    import os

    from crane_tpu.ops.linear import quantize_weight

    def q_layer(layer):
        out = {}
        for k, v in layer.items():
            if isinstance(v, dict):
                out[k] = q_layer(v)
            elif k in ("wq", "wk", "wv", "wo", "gate", "up", "down") and v.ndim == 2:
                out[k] = quantize_weight(v, bits=bits, block=block)
            else:
                out[k] = v
        return out

    new = dict(params)
    new["layers"] = tuple(q_layer(l) for l in params["layers"])
    if quant_tied_head is None:
        env = os.environ.get("CRANE_QUANT_TIED_HEAD")
        quant_tied_head = (bits == 4) if env is None else env == "1"
    def q_head(w):
        # pad the vocab dim to a 512 multiple so the Pallas quant kernel is
        # eligible (151936 = 128 x 1187 never divides 256); padded columns
        # quantize to zero codes/scales and lm_logits slices them off
        import jax.numpy as jnp

        o = w.shape[1]
        pad = (-o) % 512
        if pad:
            w = jnp.pad(w, ((0, 0), (0, pad)))
        return quantize_weight(w, bits=bits, block=block)

    if "lm_head" in params:
        new["lm_head"] = q_head(params["lm_head"])
    elif quant_tied_head and "embed" in params:
        new["lm_head"] = q_head(params["embed"].T)
    return new
