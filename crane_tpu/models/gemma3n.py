"""Gemma3n text model (the reference's "Gemma4" family).

Reference behavior (/root/reference/crane-core/src/models/gemma4/
modeling.rs): the Gemma3n decoder wraps each transformer layer in AltUp
(four stacked hidden streams with a learned predict/correct router), adds a
Laurel low-rank residual branch, gates Per-Layer-Embedding (PLE) inputs into
the non-active streams, shares the KV cache of the last non-shared layer of
each attention type across the final ``num_kv_shared_layers`` layers, applies
RMS value-norm (no scale) and unit attention scaling, uses per-layer MLP
widths with gaussian-top-k activation sparsity, and softcaps final logits.

TPU-native design: the whole stack is one pure function over a parameter
pytree — the four AltUp streams live in a single ``[4, B, S, E]`` array so
predict/correct are batched matmuls on the MXU; KV sharing becomes "shared
layers read the source layer's fixed-shape cache buffer and never write";
per-layer embeddings are one ``[B, S, L, P]`` gather + projection computed
once per forward. Verified logit/token-exact against HF
``Gemma3nForCausalLM`` on tiny random checkpoints (tests/test_gemma3n.py).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from crane_tpu.ops.attention import gqa_attention
from crane_tpu.ops.kv_cache import LayerKVCache
from crane_tpu.ops.norm import rms_norm
from crane_tpu.ops.rope import apply_rope, rope_table


@dataclasses.dataclass(frozen=True)
class Gemma3nConfig:
    vocab_size: int
    vocab_size_per_layer_input: int
    hidden_size: int
    hidden_size_per_layer_input: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    intermediate_size: tuple  # per-layer widths
    activation_sparsity: tuple  # per-layer target sparsity (0.0 = dense)
    layer_types: tuple  # "sliding_attention" | "full_attention"
    sliding_window: int = 512
    num_kv_shared_layers: int = 0
    rope_theta: float = 1_000_000.0
    rope_local_theta: float = 10_000.0
    rms_eps: float = 1e-6
    altup_num_inputs: int = 4
    altup_active_idx: int = 0
    altup_correct_scale: bool = True
    final_logit_softcapping: float | None = 30.0
    max_position_embeddings: int = 32768

    @property
    def first_shared_layer(self) -> int:
        """Layers >= this index reuse another layer's KV (own no cache)."""
        if self.num_kv_shared_layers <= 0:
            return self.num_layers
        return self.num_layers - self.num_kv_shared_layers

    def kv_source(self, layer_idx: int) -> int:
        """Cache index this layer attends over: itself if it owns a cache,
        else the last non-shared layer of the same attention type."""
        fs = self.first_shared_layer
        if layer_idx < fs:
            return layer_idx
        t = self.layer_types[layer_idx]
        return max(i for i in range(fs) if self.layer_types[i] == t)


def make_gemma3n_cache(cfg: Gemma3nConfig, batch: int, max_seq: int, dtype=jnp.bfloat16):
    """KV buffers for cache-owning layers only (shared layers read, not write)."""
    return tuple(
        LayerKVCache.empty(batch, max_seq, cfg.num_kv_heads, cfg.head_dim, dtype)
        for _ in range(cfg.first_shared_layer)
    )


def make_gemma3n_rope(cfg: Gemma3nConfig) -> dict:
    cg, sg = rope_table(cfg.head_dim, cfg.max_position_embeddings, theta=cfg.rope_theta)
    cl, sl = rope_table(cfg.head_dim, cfg.max_position_embeddings, theta=cfg.rope_local_theta)
    return {"cos": cg, "sin": sg, "local_cos": cl, "local_sin": sl}


def _rms_only(x: jax.Array, eps: float) -> jax.Array:
    """Scale-free RMS norm (Gemma3n v_norm: with_scale=False)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _router_modalities(cfg: Gemma3nConfig, p: dict, x: jax.Array) -> jax.Array:
    """AltUp modality router: tanh(route(rms(x) / E)), computed in f32."""
    r = rms_norm(x, p["router_norm"], eps=cfg.rms_eps) * (1.0 / cfg.hidden_size)
    routed = (r @ p["modality_router"]).astype(jnp.float32)
    return jnp.tanh(routed).astype(x.dtype)


def altup_predict(cfg: Gemma3nConfig, p: dict, hs: jax.Array) -> jax.Array:
    """hs ``[A, B, S, E]`` -> mixed predictions ``[A, B, S, E]``.

    Per token, a 4x4 mixing matrix is produced from the active stream's
    modalities and applied across the stacked streams (plus identity)."""
    A = cfg.altup_num_inputs
    mod = _router_modalities(cfg, p, hs[cfg.altup_active_idx])  # [B,S,A]
    coefs = (mod @ p["prediction_coefs"]).reshape(*mod.shape[:-1], A, A)
    # HF permutes the last two dims before matmul; einsum over stream axis u.
    preds = jnp.einsum("ubse,bsvu->vbse", hs, coefs)
    return preds + hs


def altup_correct(cfg: Gemma3nConfig, p: dict, preds: jax.Array, activated: jax.Array) -> jax.Array:
    """Propagate the layer output (activated) back into all streams."""
    mod = _router_modalities(cfg, p, activated)  # [B,S,A]
    coefs = mod @ p["correction_coefs"] + 1.0  # [B,S,A]
    innovation = activated - preds[cfg.altup_active_idx]  # [B,S,E]
    corrected = innovation[None] * coefs.transpose(2, 0, 1)[..., None]
    return corrected + preds


def _laurel(cfg: Gemma3nConfig, p: dict, x: jax.Array) -> jax.Array:
    h = x @ p["left"] @ p["right"]
    return x + rms_norm(h, p["post_norm"], eps=cfg.rms_eps)


def _mlp(cfg: Gemma3nConfig, p: dict, x: jax.Array, layer_idx: int) -> jax.Array:
    gate = x @ p["gate"]
    sparsity = cfg.activation_sparsity[layer_idx]
    if sparsity > 0.0:
        # gaussian top-k: keep activations above mean + std * Phi^-1(sparsity)
        with jax.ensure_compile_time_eval():
            std_mult = float(jax.scipy.stats.norm.ppf(sparsity))
        mean = jnp.mean(gate, axis=-1, keepdims=True)
        std = jnp.std(gate, axis=-1, keepdims=True)
        gate = jax.nn.relu(gate - (mean + std * std_mult))
    act = jax.nn.gelu(gate, approximate=True)
    return (act * (x @ p["up"])) @ p["down"]


def _attention(
    cfg: Gemma3nConfig,
    p: dict,
    x: jax.Array,
    cache: tuple,
    positions: jax.Array,
    write_pos: jax.Array,
    rope: dict,
    layer_idx: int,
) -> tuple[jax.Array, tuple]:
    B, S, E = x.shape
    is_sliding = cfg.layer_types[layer_idx] == "sliding_attention"
    cos, sin = (rope["local_cos"], rope["local_sin"]) if is_sliding else (rope["cos"], rope["sin"])

    q = (x @ p["wq"]).reshape(B, S, cfg.num_heads, cfg.head_dim)
    q = rms_norm(q, p["q_norm"], eps=cfg.rms_eps)
    q = apply_rope(q, cos, sin, positions)

    src = cfg.kv_source(layer_idx)
    if layer_idx < cfg.first_shared_layer:
        k = (x @ p["wk"]).reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
        k = rms_norm(k, p["k_norm"], eps=cfg.rms_eps)
        k = apply_rope(k, cos, sin, positions)
        v = _rms_only((x @ p["wv"]).reshape(B, S, cfg.num_kv_heads, cfg.head_dim), cfg.rms_eps)
        layer_cache = cache[src].update(k, v, write_pos)
        cache = cache[:src] + (layer_cache,) + cache[src + 1:]
    else:
        layer_cache = cache[src]  # KV sharing: read the source layer's buffer

    window = cfg.sliding_window if is_sliding else None
    T = layer_cache.k.shape[1]
    use_fused = (
        S == 1
        and jax.default_backend() == "tpu"
        and cfg.head_dim % 128 == 0  # per-head fp kernel: D is the lane axis
        and T % 256 == 0
        and os.environ.get("CRANE_NO_FP_ATTN") != "1"
    )
    if use_fused:
        # same live-length Pallas decode kernel the shared transformer uses
        # (reads ceil(len/block) KV blocks, not the whole [T] buffer)
        from crane_tpu.ops.pallas.quant_attention import quant_decode_attention

        out = quant_decode_attention(
            q, layer_cache.k, layer_cache.v, None, None, positions[:, 0] + 1,
            bits=16, scale=1.0, window=window,
            block_t=512 if T % 512 == 0 else 256,
        )
    else:
        out = gqa_attention(
            q, layer_cache.k, layer_cache.v, positions,
            scale=1.0,  # Gemma3n uses unit attention scaling (v is RMS-normed)
            window=window,
        )
    return out.reshape(B, S, cfg.num_heads * cfg.head_dim) @ p["wo"], cache


def _decoder_layer(
    cfg: Gemma3nConfig,
    p: dict,
    hs: jax.Array,  # [A, B, S, E]
    per_layer_input: jax.Array,  # [B, S, P]
    cache: tuple,
    positions: jax.Array,
    write_pos: jax.Array,
    rope: dict,
    layer_idx: int,
) -> tuple[jax.Array, tuple]:
    preds = altup_predict(cfg, p["altup"], hs)
    active = preds[cfg.altup_active_idx]
    a_norm = rms_norm(active, p["input_ln"], eps=cfg.rms_eps)
    laurel_out = _laurel(cfg, p["laurel"], a_norm)

    attn, cache = _attention(cfg, p["attn"], a_norm, cache, positions, write_pos, rope, layer_idx)
    attn = rms_norm(attn, p["post_attn_ln"], eps=cfg.rms_eps)
    attn_laurel = (active + attn + laurel_out) * (1.0 / math.sqrt(2.0))

    h = rms_norm(attn_laurel, p["pre_ffw_ln"], eps=cfg.rms_eps)
    h = _mlp(cfg, p["mlp"], h, layer_idx)
    h = rms_norm(h, p["post_ffw_ln"], eps=cfg.rms_eps)
    activated = attn_laurel + h

    corrected = altup_correct(cfg, p["altup"], preds, activated)

    first = corrected[cfg.altup_active_idx]
    if cfg.altup_correct_scale:
        first = first * p["altup"]["correct_output_scale"]
    gate = jax.nn.gelu(first @ p["ple"]["gate"], approximate=True) * per_layer_input
    proj = rms_norm(gate @ p["ple"]["proj"], p["ple"]["post_norm"], eps=cfg.rms_eps)
    # PLE feedback goes into the non-active streams only
    corrected = corrected.at[1:].add(proj[None])
    return corrected, cache


def gemma3n_forward(
    cfg: Gemma3nConfig,
    params: dict,
    ids: jax.Array,  # [B, S] int32
    cache: tuple,
    cache_positions: jax.Array,  # scalar start (prefill) or [B] (decode, S==1)
    rope: dict,
) -> tuple[jax.Array, tuple]:
    """Full Gemma3n decoder stack -> final hidden ``[B, S, E]`` + new cache."""
    B, S = ids.shape
    E, P, L = cfg.hidden_size, cfg.hidden_size_per_layer_input, cfg.num_layers
    if cache_positions.ndim == 0:
        positions = jnp.broadcast_to(
            cache_positions[None, None] + jnp.arange(S, dtype=jnp.int32)[None, :], (B, S)
        )
    else:
        assert S == 1
        positions = cache_positions[:, None]
    write_pos = cache_positions

    x0 = params["embed"][ids] * jnp.asarray(math.sqrt(E), params["embed"].dtype)

    # Per-Layer Embeddings: gathered PLE + projection from the embedding, /sqrt(2)
    ple = params["embed_per_layer"][ids].reshape(B, S, L, P) * jnp.asarray(
        math.sqrt(P), params["embed_per_layer"].dtype
    )
    proj = (x0 @ params["per_layer_model_projection"]) * (E ** -0.5)
    proj = rms_norm(proj.reshape(B, S, L, P), params["per_layer_projection_norm"], eps=cfg.rms_eps)
    per_layer_inputs = (proj + ple) * (1.0 / math.sqrt(2.0))

    # AltUp stream init: project streams 1.. and match the RMS magnitude of x0
    target_mag = jnp.sqrt(jnp.mean(x0.astype(jnp.float32) ** 2, axis=-1, keepdims=True))
    streams = [x0]
    for w in params["altup_proj"]:
        h = x0 @ w
        mag = jnp.sqrt(jnp.maximum(jnp.mean(h.astype(jnp.float32) ** 2, axis=-1, keepdims=True), 1e-5))
        streams.append((h * (target_mag / mag).astype(h.dtype)))
    hs = jnp.stack(streams)  # [A, B, S, E]

    for i, p in enumerate(params["layers"]):
        hs, cache = _decoder_layer(
            cfg, p, hs, per_layer_inputs[:, :, i], cache, positions, write_pos, rope, i
        )

    # Collapse streams: unembed-project 1.., magnitude-match to stream 0, mean
    target_mag = jnp.sqrt(jnp.mean(hs[0].astype(jnp.float32) ** 2, axis=-1, keepdims=True))
    outs = [hs[0]]
    for i, w in enumerate(params["altup_unembed"]):
        h = hs[i + 1] @ w
        mag = jnp.sqrt(jnp.maximum(jnp.mean(h.astype(jnp.float32) ** 2, axis=-1, keepdims=True), 1e-5))
        outs.append(h * (target_mag / mag).astype(h.dtype))
    hidden = jnp.mean(jnp.stack(outs), axis=0)
    return rms_norm(hidden, params["final_norm"], eps=cfg.rms_eps), cache


def gemma3n_logits(cfg: Gemma3nConfig, params: dict, hidden: jax.Array) -> jax.Array:
    logits = (hidden @ params["embed"].T).astype(jnp.float32)
    c = cfg.final_logit_softcapping
    if c is not None:
        logits = jnp.tanh(logits / c) * c
    return logits


# ---------------------------------------------------------------------------
# HF checkpoint loading


def config_from_hf(cfg_dict: dict) -> Gemma3nConfig:
    """Build from an HF ``Gemma3nTextConfig`` dict (model_type gemma3n_text,
    or the text_config of a full gemma3n)."""
    if "text_config" in cfg_dict:
        cfg_dict = cfg_dict["text_config"]
    L = cfg_dict["num_hidden_layers"]
    inter = cfg_dict["intermediate_size"]
    if isinstance(inter, int):
        inter = [inter] * L
    sparsity = cfg_dict.get("activation_sparsity_pattern") or [0.0] * L
    layer_types = cfg_dict.get("layer_types")
    if layer_types is None:
        pattern = cfg_dict.get("sliding_window_pattern", 5)
        layer_types = [
            "full_attention" if (i + 1) % pattern == 0 else "sliding_attention"
            for i in range(L)
        ]
    return Gemma3nConfig(
        vocab_size=cfg_dict["vocab_size"],
        vocab_size_per_layer_input=cfg_dict.get("vocab_size_per_layer_input", cfg_dict["vocab_size"]),
        hidden_size=cfg_dict["hidden_size"],
        hidden_size_per_layer_input=cfg_dict.get("hidden_size_per_layer_input", 256),
        num_layers=L,
        num_heads=cfg_dict["num_attention_heads"],
        num_kv_heads=cfg_dict["num_key_value_heads"],
        head_dim=cfg_dict.get("head_dim", 256),
        intermediate_size=tuple(int(i) for i in inter),
        activation_sparsity=tuple(float(s) for s in sparsity),
        layer_types=tuple(layer_types),
        sliding_window=cfg_dict.get("sliding_window", 512),
        num_kv_shared_layers=cfg_dict.get("num_kv_shared_layers", 0),
        rope_theta=cfg_dict.get("rope_theta", 1_000_000.0),
        rope_local_theta=cfg_dict.get("rope_local_base_freq", 10_000.0),
        rms_eps=cfg_dict.get("rms_norm_eps", 1e-6),
        altup_num_inputs=cfg_dict.get("altup_num_inputs", 4),
        altup_active_idx=cfg_dict.get("altup_active_idx", 0),
        altup_correct_scale=cfg_dict.get("altup_correct_scale", True),
        final_logit_softcapping=cfg_dict.get("final_logit_softcapping", 30.0),
        max_position_embeddings=min(cfg_dict.get("max_position_embeddings", 32768), 32768),
    )


def map_hf_weights(cfg: Gemma3nConfig, tensors: dict, dtype=jnp.bfloat16) -> dict:
    """Map HF ``Gemma3nForCausalLM`` tensors to our pytree ([in, out] layout)."""

    def g(name, transpose=True):
        t = tensors.get(name)
        if t is None:
            # transformers' save-time key renaming ("model." ->
            # "model.language_model.") also rewrites the *middle* of
            # "per_layer_model_projection"; accept the mangled spelling.
            t = tensors[name.replace("per_layer_model_", "per_layer_model.language_model_")]
        arr = jnp.asarray(np.asarray(t), dtype)
        return arr.T if transpose and arr.ndim == 2 else arr

    pre = ""
    for cand in ("model.language_model.", "language_model.", "model."):
        if any(k.startswith(cand + "embed_tokens.") for k in tensors):
            pre = cand
            break
    layers = []
    for i in range(cfg.num_layers):
        lp = f"{pre}layers.{i}."
        attn = {
            "wq": g(lp + "self_attn.q_proj.weight"),
            "wo": g(lp + "self_attn.o_proj.weight"),
            "q_norm": g(lp + "self_attn.q_norm.weight"),
            "k_norm": g(lp + "self_attn.k_norm.weight"),
        }
        if i < cfg.first_shared_layer:
            attn["wk"] = g(lp + "self_attn.k_proj.weight")
            attn["wv"] = g(lp + "self_attn.v_proj.weight")
        layers.append({
            "attn": attn,
            "mlp": {
                "gate": g(lp + "mlp.gate_proj.weight"),
                "up": g(lp + "mlp.up_proj.weight"),
                "down": g(lp + "mlp.down_proj.weight"),
            },
            "input_ln": g(lp + "input_layernorm.weight"),
            "post_attn_ln": g(lp + "post_attention_layernorm.weight"),
            "pre_ffw_ln": g(lp + "pre_feedforward_layernorm.weight"),
            "post_ffw_ln": g(lp + "post_feedforward_layernorm.weight"),
            "altup": {
                "router_norm": g(lp + "altup.router_norm.weight"),
                "modality_router": g(lp + "altup.modality_router.weight"),
                "prediction_coefs": g(lp + "altup.prediction_coefs.weight"),
                "correction_coefs": g(lp + "altup.correction_coefs.weight"),
                "correct_output_scale": g(lp + "altup.correct_output_scale"),
            },
            "laurel": {
                "left": g(lp + "laurel.linear_left.weight"),
                "right": g(lp + "laurel.linear_right.weight"),
                "post_norm": g(lp + "laurel.post_laurel_norm.weight"),
            },
            "ple": {
                "gate": g(lp + "per_layer_input_gate.weight"),
                "proj": g(lp + "per_layer_projection.weight"),
                "post_norm": g(lp + "post_per_layer_input_norm.weight"),
            },
        })
    return {
        "embed": g(pre + "embed_tokens.weight", transpose=False),
        "embed_per_layer": g(pre + "embed_tokens_per_layer.weight", transpose=False),
        "per_layer_model_projection": g(pre + "per_layer_model_projection.weight"),
        "per_layer_projection_norm": g(pre + "per_layer_projection_norm.weight"),
        "altup_proj": tuple(
            g(pre + f"altup_projections.{i}.weight") for i in range(cfg.altup_num_inputs - 1)
        ),
        "altup_unembed": tuple(
            g(pre + f"altup_unembed_projections.{i}.weight") for i in range(cfg.altup_num_inputs - 1)
        ),
        "final_norm": g(pre + "norm.weight"),
        "layers": tuple(layers),
    }


class Gemma3nLM:
    """Minimal generate wrapper (prefill + greedy/decode), mirrors CausalLM."""

    def __init__(self, cfg: Gemma3nConfig, params: dict, max_seq: int = 512, batch: int = 1):
        self.cfg = cfg
        self.params = params
        self.max_seq = max_seq
        self.batch = batch
        self.rope = make_gemma3n_rope(cfg)
        dtype = jax.tree_util.tree_leaves(params)[0].dtype
        self.cache_dtype = dtype

        @jax.jit
        def prefill(params, ids, cache):
            hidden, cache = gemma3n_forward(cfg, params, ids, cache, jnp.asarray(0, jnp.int32), self.rope)
            return gemma3n_logits(cfg, params, hidden), cache

        @jax.jit
        def decode_step(params, tok, cache, pos):
            hidden, cache = gemma3n_forward(cfg, params, tok, cache, pos, self.rope)
            return gemma3n_logits(cfg, params, hidden)[:, -1], cache

        self._prefill = prefill
        self._decode_step = decode_step

    def new_cache(self):
        return make_gemma3n_cache(self.cfg, self.batch, self.max_seq, self.cache_dtype)

    def prefill_logits(self, ids: np.ndarray) -> np.ndarray:
        logits, _ = self._prefill(self.params, jnp.asarray(ids, jnp.int32), self.new_cache())
        return np.asarray(logits)

    def generate_greedy(
        self,
        ids: np.ndarray,
        max_new_tokens: int,
        *,
        eos: tuple = (),
        streamer=None,
    ) -> list[int]:
        ids = np.asarray(ids, np.int32)
        assert ids.ndim == 2 and ids.shape[0] == 1
        logits, cache = self._prefill(self.params, jnp.asarray(ids), self.new_cache())
        pos = ids.shape[1]
        eos = set(eos)

        def emit(t) -> bool:  # stream non-eos tokens; False stops generation
            if streamer is None or t in eos:
                return True
            return streamer.append(t) is not False

        tok = int(np.argmax(np.asarray(logits)[0, -1]))
        out = [tok]
        keep_going = emit(tok)
        while (
            keep_going
            and len(out) < max_new_tokens
            and tok not in eos
            and pos < self.max_seq - 1
        ):
            logits, cache = self._decode_step(
                self.params, jnp.asarray([[tok]], jnp.int32), cache,
                jnp.asarray([pos], jnp.int32),
            )
            pos += 1
            tok = int(np.argmax(np.asarray(logits)[0]))
            out.append(tok)
            if not emit(tok):
                break
        if streamer is not None:
            streamer.finalize()
        return out


def from_pretrained(path: str, dtype=jnp.bfloat16, max_seq: int = 512) -> Gemma3nLM:
    from crane_tpu.loaders.safetensors_loader import load_state_dict

    with open(os.path.join(path, "config.json")) as f:
        cfg = config_from_hf(json.load(f))
    tensors = load_state_dict(path)
    params = map_hf_weights(cfg, tensors, dtype)
    return Gemma3nLM(cfg, params, max_seq=max_seq)
