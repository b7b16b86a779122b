"""Whisper ASR: mel encoder + causal decoder with cross-attention.

The reference's ASR stack is built on Whisper-style frontends
(qwen3_asr/feature_extractor.rs uses the exact Whisper mel constants); this
implements the classic Whisper model itself natively: conv frontend +
sinusoidal positions + bidirectional encoder; token/learned-position decoder
with self-attention KV cache and per-utterance precomputed cross-attention
K/V. Greedy transcription with forced decoder ids.

Numerics match HF transformers WhisperForConditionalGeneration.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from crane_tpu.audio.mel import MelConfig, log_mel_spectrogram
from crane_tpu.generation.config import TranscribeOptions
from crane_tpu.models.modules.vision import layer_norm
from crane_tpu.ops.attention import gqa_attention
from crane_tpu.ops.kv_cache import KVCache, LayerKVCache


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    vocab_size: int = 51865
    d_model: int = 384
    encoder_layers: int = 4
    decoder_layers: int = 4
    num_heads: int = 6
    ffn_dim: int = 1536
    num_mel_bins: int = 80
    max_source_positions: int = 1500
    max_target_positions: int = 448
    decoder_start_token_id: int = 50258
    eos_token_id: int = 50257

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads


def _mha_full(cfg, lp, prefix, x, kv_src):
    """Bidirectional MHA over [B,T,E] (encoder self / decoder cross)."""
    B, S, E = x.shape
    H, D = cfg.num_heads, cfg.head_dim
    q = (x @ lp[prefix + "wq"] + lp[prefix + "bq"]).reshape(B, S, H, D)
    T = kv_src.shape[1]
    k = (kv_src @ lp[prefix + "wk"]).reshape(B, T, H, D)
    v = (kv_src @ lp[prefix + "wv"] + lp[prefix + "bv"]).reshape(B, T, H, D)
    logits = jnp.einsum("bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * (D ** -0.5), axis=-1)
    o = jnp.einsum("bhst,bthd->bshd", probs.astype(v.dtype), v).reshape(B, S, E)
    return o @ lp[prefix + "wo"] + lp[prefix + "bo"]


def whisper_encode(cfg: WhisperConfig, p: dict, mel: jax.Array) -> jax.Array:
    """mel ``[B, mels, 2*max_src]`` -> encoder states ``[B, max_src, E]``."""
    x = mel.transpose(0, 2, 1)
    conv = lambda x, w, b, s: jax.lax.conv_general_dilated(
        x, w, (s,), [(1, 1)], dimension_numbers=("NWC", "WIO", "NWC")
    ) + b
    x = jax.nn.gelu(conv(x, p["conv1_w"], p["conv1_b"], 1), approximate=False)
    x = jax.nn.gelu(conv(x, p["conv2_w"], p["conv2_b"], 2), approximate=False)
    x = x + p["pos_embed"][: x.shape[1]]
    for lp in p["layers"]:
        h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], 1e-5)
        x = x + _mha_full(cfg, lp, "attn_", h, h)
        h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], 1e-5)
        h = jax.nn.gelu(h @ lp["fc1_w"] + lp["fc1_b"], approximate=False)
        x = x + (h @ lp["fc2_w"] + lp["fc2_b"])
    return layer_norm(x, p["ln_post_w"], p["ln_post_b"], 1e-5)


def _decoder_layers(cfg, params, x, cache, positions, cache_positions, enc_kv):
    B, S, E = x.shape
    H, D = cfg.num_heads, cfg.head_dim
    new_layers = list(cache.layers)
    for i, lp in enumerate(params["decoder_layers"]):
        h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], 1e-5)
        q = (h @ lp["self_wq"] + lp["self_bq"]).reshape(B, S, H, D)
        k = (h @ lp["self_wk"]).reshape(B, S, H, D)
        v = (h @ lp["self_wv"] + lp["self_bv"]).reshape(B, S, H, D)
        new_layers[i] = cache.layers[i].update(k, v, cache_positions)
        out = gqa_attention(q, new_layers[i].k, new_layers[i].v, positions, scale=D ** -0.5)
        x = x + (out.reshape(B, S, E) @ lp["self_wo"] + lp["self_bo"])

        h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], 1e-5)
        ek, ev = enc_kv[i]
        q = (h @ lp["cross_wq"] + lp["cross_bq"]).reshape(B, S, H, D)
        logits = jnp.einsum("bshd,bthd->bhst", q, ek, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * (D ** -0.5), axis=-1)
        o = jnp.einsum("bhst,bthd->bshd", probs.astype(ev.dtype), ev).reshape(B, S, E)
        x = x + (o @ lp["cross_wo"] + lp["cross_bo"])

        h = layer_norm(x, lp["ln3_w"], lp["ln3_b"], 1e-5)
        h = jax.nn.gelu(h @ lp["fc1_w"] + lp["fc1_b"], approximate=False)
        x = x + (h @ lp["fc2_w"] + lp["fc2_b"])
    x = layer_norm(x, params["decoder_norm_w"], params["decoder_norm_b"], 1e-5)
    return x, KVCache(layers=tuple(new_layers), lengths=cache.lengths + S)


@functools.partial(jax.jit, static_argnums=(0,))
def _encode_kv(cfg, params, mel):
    enc = whisper_encode(cfg, params["encoder"], mel)
    B, T, _ = enc.shape
    H, D = cfg.num_heads, cfg.head_dim
    enc_kv = tuple(
        (
            (enc @ lp["cross_wk"]).reshape(B, T, H, D),
            ((enc @ lp["cross_wv"]) + lp["cross_bv"]).reshape(B, T, H, D),
        )
        for lp in params["decoder_layers"]
    )
    return enc, enc_kv


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
def _decode_step(cfg, params, cache, tokens, enc_kv):
    """tokens [B, S] (prompt prefix or single step)."""
    B, S = tokens.shape
    pos0 = cache.lengths[:, None]
    positions = pos0 + jnp.arange(S, dtype=jnp.int32)[None, :]
    x = params["embed"][tokens] + params["dec_pos_embed"][positions]
    cache_positions = cache.lengths if S == 1 else cache.lengths[0]
    hidden, cache = _decoder_layers(cfg, params, x, cache, positions, cache_positions, enc_kv)
    logits = (hidden[:, -1] @ params["embed"].T).astype(jnp.float32)
    return jnp.argmax(logits, -1).astype(jnp.int32), cache


class WhisperModel:
    def __init__(self, config: WhisperConfig, params: dict, *, tokenizer=None, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.dtype = dtype
        self.mel_config = MelConfig(n_mels=config.num_mel_bins, log_mode="whisper")

    def extract_features(self, wav: np.ndarray) -> jax.Array:
        """16 kHz waveform -> 30 s padded mel ``[1, mels, 3000]``."""
        n = self.config.max_source_positions * 2 * self.mel_config.hop_length
        wav = np.asarray(wav, np.float32)[:n]
        wav = np.pad(wav, (0, n - len(wav)))
        mel = log_mel_spectrogram(self.mel_config, jnp.asarray(wav))
        return mel[None]

    def transcribe_ids(
        self,
        wav: np.ndarray,
        *,
        forced_ids: Sequence[int] = (),
        max_new_tokens: int = 128,
    ) -> list[int]:
        cfg = self.config
        mel = self.extract_features(wav).astype(self.dtype)
        enc, enc_kv = _encode_kv(cfg, self.params, mel)
        # cache writes past max_target_positions are silently dropped
        # (mode="drop"), which would leave the decoder attending a stale
        # window — cap generation to the positions that actually fit
        max_new_tokens = min(
            max_new_tokens, cfg.max_target_positions - len(forced_ids) - 2
        )
        cache = KVCache(
            layers=tuple(
                LayerKVCache.empty(1, cfg.max_target_positions, cfg.num_heads, cfg.head_dim, self.dtype)
                for _ in range(cfg.decoder_layers)
            ),
            lengths=jnp.zeros((1,), jnp.int32),
        )
        prompt = [cfg.decoder_start_token_id, *forced_ids]
        tok, cache = _decode_step(cfg, self.params, cache, jnp.asarray([prompt], jnp.int32), enc_kv)
        out = []
        for _ in range(max_new_tokens):
            t = int(tok[0])
            if t == cfg.eos_token_id:
                break
            out.append(t)
            tok, cache = _decode_step(cfg, self.params, cache, tok[:, None], enc_kv)
        return out

    def transcribe(self, wav: np.ndarray, opts: TranscribeOptions | None = None, **kw) -> str:
        if opts is not None and "max_new_tokens" not in kw:
            kw["max_new_tokens"] = opts.max_new_tokens
        ids = self.transcribe_ids(wav, **kw)
        if self.tokenizer is None:
            raise ValueError("no tokenizer attached")
        return self.tokenizer.decode(ids)


def load_whisper(model_dir: str, *, dtype=jnp.float32) -> WhisperModel:
    from crane_tpu.loaders.safetensors_loader import load_state_dict
    from crane_tpu.models.auto import load_hf_config

    hf = load_hf_config(model_dir)
    cfg = WhisperConfig(
        vocab_size=hf["vocab_size"],
        d_model=hf["d_model"],
        encoder_layers=hf["encoder_layers"],
        decoder_layers=hf["decoder_layers"],
        num_heads=hf["encoder_attention_heads"],
        ffn_dim=hf["encoder_ffn_dim"],
        num_mel_bins=hf["num_mel_bins"],
        max_source_positions=hf.get("max_source_positions", 1500),
        max_target_positions=hf.get("max_target_positions", 448),
        decoder_start_token_id=hf.get("decoder_start_token_id", 50258),
        eos_token_id=hf.get("eos_token_id", 50257),
    )
    sd = load_state_dict(model_dir)
    pre = "model." if any(k.startswith("model.") for k in sd) else ""
    t = lambda n: jnp.asarray(np.asarray(sd[pre + n]).T, dtype)
    a = lambda n: jnp.asarray(np.asarray(sd[pre + n]), dtype)
    conv_w = lambda n: jnp.asarray(np.asarray(sd[pre + n]).transpose(2, 1, 0), dtype)

    def attn(lp, hf_prefix, mine_prefix):
        return {
            mine_prefix + "wq": t(lp + hf_prefix + ".q_proj.weight"),
            mine_prefix + "bq": a(lp + hf_prefix + ".q_proj.bias"),
            mine_prefix + "wk": t(lp + hf_prefix + ".k_proj.weight"),
            mine_prefix + "wv": t(lp + hf_prefix + ".v_proj.weight"),
            mine_prefix + "bv": a(lp + hf_prefix + ".v_proj.bias"),
            mine_prefix + "wo": t(lp + hf_prefix + ".out_proj.weight"),
            mine_prefix + "bo": a(lp + hf_prefix + ".out_proj.bias"),
        }

    enc_layers = []
    for i in range(cfg.encoder_layers):
        lp = f"encoder.layers.{i}."
        enc_layers.append(
            {
                **attn(lp, "self_attn", "attn_"),
                "ln1_w": a(lp + "self_attn_layer_norm.weight"),
                "ln1_b": a(lp + "self_attn_layer_norm.bias"),
                "ln2_w": a(lp + "final_layer_norm.weight"),
                "ln2_b": a(lp + "final_layer_norm.bias"),
                "fc1_w": t(lp + "fc1.weight"), "fc1_b": a(lp + "fc1.bias"),
                "fc2_w": t(lp + "fc2.weight"), "fc2_b": a(lp + "fc2.bias"),
            }
        )
    dec_layers = []
    for i in range(cfg.decoder_layers):
        lp = f"decoder.layers.{i}."
        dec_layers.append(
            {
                **attn(lp, "self_attn", "self_"),
                **attn(lp, "encoder_attn", "cross_"),
                "ln1_w": a(lp + "self_attn_layer_norm.weight"),
                "ln1_b": a(lp + "self_attn_layer_norm.bias"),
                "ln2_w": a(lp + "encoder_attn_layer_norm.weight"),
                "ln2_b": a(lp + "encoder_attn_layer_norm.bias"),
                "ln3_w": a(lp + "final_layer_norm.weight"),
                "ln3_b": a(lp + "final_layer_norm.bias"),
                "fc1_w": t(lp + "fc1.weight"), "fc1_b": a(lp + "fc1.bias"),
                "fc2_w": t(lp + "fc2.weight"), "fc2_b": a(lp + "fc2.bias"),
            }
        )
    params = {
        "encoder": {
            "conv1_w": conv_w("encoder.conv1.weight"), "conv1_b": a("encoder.conv1.bias"),
            "conv2_w": conv_w("encoder.conv2.weight"), "conv2_b": a("encoder.conv2.bias"),
            "pos_embed": a("encoder.embed_positions.weight"),
            "layers": tuple(enc_layers),
            "ln_post_w": a("encoder.layer_norm.weight"), "ln_post_b": a("encoder.layer_norm.bias"),
        },
        "decoder_layers": tuple(dec_layers),
        "decoder_norm_w": a("decoder.layer_norm.weight"),
        "decoder_norm_b": a("decoder.layer_norm.bias"),
        "embed": a("decoder.embed_tokens.weight"),
        "dec_pos_embed": a("decoder.embed_positions.weight"),
    }
    tokenizer = None
    try:
        from crane_tpu.tokenizer.autotokenizer import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(model_dir)
    except Exception:
        pass
    return WhisperModel(cfg, params, tokenizer=tokenizer, dtype=dtype)
