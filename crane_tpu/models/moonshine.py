"""Moonshine ASR: conv frontend + transformer encoder-decoder.

Reference behavior (/root/reference/crane-core/src/models/moonshine_asr/
model.rs:6-160): the reference runs Moonshine through its vendored ONNX
evaluator with explicit per-layer KV-cache I/O. Here the architecture is
implemented natively in JAX (SURVEY.md §7: "port those small graphs natively —
the ONNX subsystem exists only because Candle couldn't run them"): raw 16 kHz
waveform -> conv1(k127,s64)+tanh -> groupnorm -> conv2(k7,s3)+gelu ->
conv3(k3,s2)+gelu -> bidirectional encoder (partial rotary) -> causal decoder
with cross-attention (encoder K/V computed once per utterance) and gated-MLP.

Numerics match HF transformers MoonshineForConditionalGeneration (parity
oracle). token_rate-based max-length heuristic as in the reference.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from crane_tpu.generation.config import TranscribeOptions
from crane_tpu.ops.attention import gqa_attention
from crane_tpu.ops.kv_cache import KVCache, LayerKVCache
from crane_tpu.ops.rope import apply_rope_embeds, rope_table


@dataclasses.dataclass(frozen=True)
class MoonshineConfig:
    vocab_size: int = 32768
    hidden_size: int = 288
    intermediate_size: int = 1152
    encoder_layers: int = 6
    decoder_layers: int = 6
    encoder_heads: int = 8
    decoder_heads: int = 8
    partial_rotary_factor: float = 0.9
    rope_theta: float = 10000.0
    decoder_start_token_id: int = 1
    eos_token_id: int = 2
    # ~6.5 tokens/sec of audio (reference token_rate heuristic)
    token_rate: float = 6.5

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.encoder_heads

    @property
    def rot_dim(self) -> int:
        r = int(self.head_dim * self.partial_rotary_factor)
        return r - (r % 2)


def _moonshine_rope(x: jax.Array, cos_h: jax.Array, sin_h: jax.Array) -> jax.Array:
    """Moonshine uses GPT-J interleaved partial rotary (pairs (2i, 2i+1))."""
    return apply_rope_embeds(x, cos_h, sin_h, mode="interleaved")


def _rope_tables2(cfg: "MoonshineConfig", max_pos: int):
    return rope_table(cfg.rot_dim, max_pos, theta=cfg.rope_theta)


def _ln(x, w, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)).astype(x.dtype)


def _conv1d(x, w, b=None, *, stride: int):
    """x [B, T, Cin], w [k, Cin, Cout] (valid padding)."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if b is not None:
        y = y + b
    return y


def encoder_frontend(cfg: MoonshineConfig, p: dict, wav: jax.Array) -> jax.Array:
    """wav [B, N] -> features [B, T, E]."""
    x = wav[:, :, None]
    x = jnp.tanh(_conv1d(x, p["conv1_w"], stride=64))
    # GroupNorm(num_groups=1) over channels, per position? torch GroupNorm on
    # [B, C, T] normalizes over (C, T) jointly for the single group.
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=(1, 2), keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=(1, 2), keepdims=True)
    x = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * p["gn_w"] + p["gn_b"]).astype(x.dtype)
    x = jax.nn.gelu(_conv1d(x, p["conv2_w"], p["conv2_b"], stride=3), approximate=False)
    x = jax.nn.gelu(_conv1d(x, p["conv3_w"], p["conv3_b"], stride=2), approximate=False)
    return x


def encode(cfg: MoonshineConfig, params: dict, wav: jax.Array) -> jax.Array:
    """wav [B, N] -> encoder states [B, T, E]."""
    x = encoder_frontend(cfg, params["frontend"], wav)
    T = x.shape[1]
    cos, sin = _rope_tables2(cfg, T)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (x.shape[0], T))
    for p in params["encoder_layers"]:
        h = _ln(x, p["ln1"])
        # bidirectional self-attention with rope
        B, S, _ = h.shape
        H, D = cfg.encoder_heads, cfg.head_dim
        q = (h @ p["attn"]["wq"]).reshape(B, S, H, D)
        k = (h @ p["attn"]["wk"]).reshape(B, S, H, D)
        v = (h @ p["attn"]["wv"]).reshape(B, S, H, D)
        q = _moonshine_rope(q, cos[pos], sin[pos])
        k = _moonshine_rope(k, cos[pos], sin[pos])
        logits = jnp.einsum("bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * (D ** -0.5), axis=-1)
        o = jnp.einsum("bhst,bthd->bshd", probs.astype(v.dtype), v).reshape(B, S, H * D)
        x = x + o @ p["attn"]["wo"]
        h = _ln(x, p["ln2"])
        h = jax.nn.gelu(h @ p["mlp"]["fc1_w"] + p["mlp"]["fc1_b"], approximate=False)
        x = x + (h @ p["mlp"]["fc2_w"] + p["mlp"]["fc2_b"])
    return _ln(x, params["encoder_norm"])


def _decoder_step_layers(cfg, params, x, cache, positions, cache_positions, enc_kv, rope_cos, rope_sin):
    """Shared decoder layer stack; enc_kv = [(k,v) per layer] precomputed."""
    new_layers = list(cache.layers)
    B, S, _ = x.shape
    H, D = cfg.decoder_heads, cfg.head_dim
    for i, p in enumerate(params["decoder_layers"]):
        h = _ln(x, p["ln1"])
        q = (h @ p["self_attn"]["wq"]).reshape(B, S, H, D)
        k = (h @ p["self_attn"]["wk"]).reshape(B, S, H, D)
        v = (h @ p["self_attn"]["wv"]).reshape(B, S, H, D)
        q = _moonshine_rope(q, rope_cos, rope_sin)
        k = _moonshine_rope(k, rope_cos, rope_sin)
        new_layers[i] = cache.layers[i].update(k, v, cache_positions)
        out = gqa_attention(q, new_layers[i].k, new_layers[i].v, positions, scale=D ** -0.5)
        x = x + out.reshape(B, S, H * D) @ p["self_attn"]["wo"]

        h = _ln(x, p["ln2"])
        ek, ev = enc_kv[i]
        q = (h @ p["cross_attn"]["wq"]).reshape(B, S, H, D)
        logits = jnp.einsum("bshd,bthd->bhst", q, ek, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * (D ** -0.5), axis=-1)
        o = jnp.einsum("bhst,bthd->bshd", probs.astype(ev.dtype), ev).reshape(B, S, H * D)
        x = x + o @ p["cross_attn"]["wo"]

        h = _ln(x, p["ln3"])
        h2 = h @ p["mlp"]["fc1_w"] + p["mlp"]["fc1_b"]
        hh, gate = jnp.split(h2, 2, axis=-1)
        h2 = jax.nn.silu(gate) * hh
        x = x + (h2 @ p["mlp"]["fc2_w"] + p["mlp"]["fc2_b"])
    x = _ln(x, params["decoder_norm"])
    return x, KVCache(layers=tuple(new_layers), lengths=cache.lengths + S)


@functools.partial(jax.jit, static_argnums=(0,))
def _encode_and_kv(cfg, params, wav):
    enc = encode(cfg, params, wav)
    B, T, _ = enc.shape
    H, D = cfg.decoder_heads, cfg.head_dim
    enc_kv = tuple(
        (
            (enc @ p["cross_attn"]["wk"]).reshape(B, T, H, D),
            (enc @ p["cross_attn"]["wv"]).reshape(B, T, H, D),
        )
        for p in params["decoder_layers"]
    )
    return enc, enc_kv


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
def _decode_step(cfg, params, cache, token, enc_kv, cos_tab, sin_tab):
    x = params["embed"][token[:, None]]
    pos = cache.lengths[:, None]
    rc, rs = cos_tab[pos], sin_tab[pos]
    hidden, cache = _decoder_step_layers(
        cfg, params, x, cache, pos, cache.lengths, enc_kv, rc, rs
    )
    logits = (hidden[:, 0] @ params["proj_out"]).astype(jnp.float32)
    return jnp.argmax(logits, -1).astype(jnp.int32), cache


class MoonshineModel:
    """transcribe(): greedy AR decode (the reference's ASR default,
    generation/mod.rs:41-62)."""

    def __init__(self, config: MoonshineConfig, params: dict, *, tokenizer=None, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.dtype = dtype

    def transcribe_ids(self, wav: np.ndarray, opts: TranscribeOptions | None = None) -> list[int]:
        from crane_tpu.utils.buckets import bucket_length

        cfg = self.config
        opts = opts or TranscribeOptions()
        wav = np.asarray(wav)
        # the conv frontend (k=127,s=64 -> k=7,s=3 -> k=3,s=2, VALID) needs
        # ~0.9k samples for one output frame — zero-pad sub-56 ms uploads
        # instead of crashing encoder tracing
        if wav.shape[-1] < 1024:
            wav = np.pad(wav, (0, 1024 - wav.shape[-1]))
        wav = jnp.asarray(wav, self.dtype)[None]
        enc, enc_kv = _encode_and_kv(cfg, self.params, wav)
        max_new = min(
            opts.max_new_tokens,
            int(len(wav[0]) / 16000 * cfg.token_rate) + 8,
        )
        # bucket the decode cache/rope so the per-duration token budget
        # doesn't recompile the decode-step graph on every distinct length
        slots = bucket_length(max_new + 8, floor=64)
        cos_tab, sin_tab = _rope_tables2(cfg, slots)
        cache = KVCache(
            layers=tuple(
                LayerKVCache.empty(1, slots, cfg.decoder_heads, cfg.head_dim, self.dtype)
                for _ in range(cfg.decoder_layers)
            ),
            lengths=jnp.zeros((1,), jnp.int32),
        )
        tok = jnp.asarray([cfg.decoder_start_token_id], jnp.int32)
        out = []
        for _ in range(max_new):
            tok, cache = _decode_step(
                cfg, self.params, cache, tok, enc_kv, cos_tab, sin_tab
            )
            t = int(tok[0])
            if t == cfg.eos_token_id:
                break
            out.append(t)
        return out

    def transcribe(self, wav: np.ndarray, opts: TranscribeOptions | None = None) -> str:
        ids = self.transcribe_ids(wav, opts)
        if self.tokenizer is None:
            raise ValueError("no tokenizer attached")
        return self.tokenizer.decode(ids)


def load_moonshine(model_dir: str, *, dtype=jnp.float32) -> MoonshineModel:
    from crane_tpu.loaders.safetensors_loader import load_state_dict
    from crane_tpu.models.auto import load_hf_config

    hf = load_hf_config(model_dir)
    cfg = MoonshineConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        encoder_layers=hf["encoder_num_hidden_layers"],
        decoder_layers=hf["decoder_num_hidden_layers"],
        encoder_heads=hf["encoder_num_attention_heads"],
        decoder_heads=hf["decoder_num_attention_heads"],
        partial_rotary_factor=hf.get("partial_rotary_factor", 0.9),
        rope_theta=hf.get("rope_theta", 10000.0),
        decoder_start_token_id=hf.get("decoder_start_token_id", 1),
        eos_token_id=hf.get("eos_token_id", 2),
    )
    sd = load_state_dict(model_dir)
    _t = lambda n: jnp.asarray(np.asarray(sd[n]).T, dtype)
    _a = lambda n: jnp.asarray(np.asarray(sd[n]), dtype)

    def attn(prefix):
        return {
            "wq": _t(prefix + ".q_proj.weight"),
            "wk": _t(prefix + ".k_proj.weight"),
            "wv": _t(prefix + ".v_proj.weight"),
            "wo": _t(prefix + ".o_proj.weight"),
        }

    e = "model.encoder."
    frontend = {
        # torch conv1d weight [Cout, Cin, k] -> WIO [k, Cin, Cout]
        "conv1_w": jnp.asarray(np.asarray(sd[e + "conv1.weight"]).transpose(2, 1, 0), dtype),
        "conv2_w": jnp.asarray(np.asarray(sd[e + "conv2.weight"]).transpose(2, 1, 0), dtype),
        "conv2_b": _a(e + "conv2.bias"),
        "conv3_w": jnp.asarray(np.asarray(sd[e + "conv3.weight"]).transpose(2, 1, 0), dtype),
        "conv3_b": _a(e + "conv3.bias"),
        "gn_w": _a(e + "groupnorm.weight")[None, None, :],
        "gn_b": _a(e + "groupnorm.bias")[None, None, :],
    }
    enc_layers = []
    for i in range(cfg.encoder_layers):
        lp = f"{e}layers.{i}."
        enc_layers.append(
            {
                "ln1": _a(lp + "input_layernorm.weight"),
                "ln2": _a(lp + "post_attention_layernorm.weight"),
                "attn": attn(lp + "self_attn"),
                "mlp": {
                    "fc1_w": _t(lp + "mlp.fc1.weight"), "fc1_b": _a(lp + "mlp.fc1.bias"),
                    "fc2_w": _t(lp + "mlp.fc2.weight"), "fc2_b": _a(lp + "mlp.fc2.bias"),
                },
            }
        )
    d = "model.decoder."
    dec_layers = []
    for i in range(cfg.decoder_layers):
        lp = f"{d}layers.{i}."
        dec_layers.append(
            {
                "ln1": _a(lp + "input_layernorm.weight"),
                "ln2": _a(lp + "post_attention_layernorm.weight"),
                "ln3": _a(lp + "final_layernorm.weight"),
                "self_attn": attn(lp + "self_attn"),
                "cross_attn": attn(lp + "encoder_attn"),
                "mlp": {
                    "fc1_w": _t(lp + "mlp.fc1.weight"), "fc1_b": _a(lp + "mlp.fc1.bias"),
                    "fc2_w": _t(lp + "mlp.fc2.weight"), "fc2_b": _a(lp + "mlp.fc2.bias"),
                },
            }
        )
    params = {
        "frontend": frontend,
        "encoder_layers": tuple(enc_layers),
        "encoder_norm": _a(e + "layer_norm.weight"),
        "decoder_layers": tuple(dec_layers),
        "decoder_norm": _a(d + "norm.weight"),
        "embed": _a(d + "embed_tokens.weight"),
        "proj_out": (
            _t("proj_out.weight") if "proj_out.weight" in sd
            else jnp.asarray(np.asarray(sd[d + "embed_tokens.weight"]).T, dtype)
        ),
    }
    tokenizer = None
    try:
        from crane_tpu.tokenizer.autotokenizer import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(model_dir)
    except Exception:
        pass
    return MoonshineModel(cfg, params, tokenizer=tokenizer, dtype=dtype)
