"""Audio-conditioned LLM (ASR / audio chat): whisper-style encoder + embed
splicing into a causal LM.

Reference behavior (/root/reference/crane-core/src/models/qwen3_asr/): a
Whisper feature extractor (audio/mel.py here, bit-matched), an audio encoder
over mel frames, audio embeds spliced over ``<|audio_pad|>`` positions in a
ChatML prompt, then greedy AR decode (model.rs:106-190; SURVEY.md §3.6).

Architecture follows Qwen2-Audio (the HF parity oracle): conv(k3,p1)+gelu ->
conv(k3,s2,p1)+gelu -> +sinusoidal positions -> pre-LN bidirectional
transformer -> avg-pool(2) -> layer-norm -> linear projector -> text hidden;
the text model is the shared crane_tpu transformer (qwen2 config).
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
from crane_tpu.models.modules.transformer import (
    TransformerConfig,
    forward_hidden,
    lm_logits,
    make_cache,
    make_rope_tables,
)
from crane_tpu.models.modules.vision import layer_norm
from crane_tpu.utils.buckets import bucket_length


@dataclasses.dataclass(frozen=True)
class AudioEncoderConfig:
    d_model: int
    num_layers: int
    num_heads: int
    ffn_dim: int
    num_mel_bins: int = 128
    max_source_positions: int = 1500

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads

    @property
    def max_mel_frames(self) -> int:
        return self.max_source_positions * 2


def audio_feature_lengths(mel_len: int) -> int:
    """mel frames -> post-pool feature count (HF _get_feat_extract_output_lengths)."""
    feat = (mel_len - 1) // 2 + 1
    return (feat - 2) // 2 + 1


def audio_encode(cfg: AudioEncoderConfig, p: dict, mel: jax.Array) -> jax.Array:
    """mel ``[B, n_mels, T_mel]`` (padded to max_mel_frames) -> ``[B, T/4, D]``."""
    x = mel.transpose(0, 2, 1)  # [B, T, mels]
    x = jax.nn.gelu(
        jax.lax.conv_general_dilated(
            x, p["conv1_w"], (1,), [(1, 1)], dimension_numbers=("NWC", "WIO", "NWC")
        )
        + p["conv1_b"],
        approximate=False,
    )
    x = jax.nn.gelu(
        jax.lax.conv_general_dilated(
            x, p["conv2_w"], (2,), [(1, 1)], dimension_numbers=("NWC", "WIO", "NWC")
        )
        + p["conv2_b"],
        approximate=False,
    )
    x = x + p["pos_embed"][: x.shape[1]]

    B, T, E = x.shape
    H, D = cfg.num_heads, cfg.head_dim
    for lp in p["layers"]:
        h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], eps=1e-5)
        q = (h @ lp["wq"] + lp["bq"]).reshape(B, T, H, D)
        k = (h @ lp["wk"]).reshape(B, T, H, D)
        v = (h @ lp["wv"] + lp["bv"]).reshape(B, T, H, D)
        logits = jnp.einsum("bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * (D ** -0.5), axis=-1)
        o = jnp.einsum("bhst,bthd->bshd", probs.astype(v.dtype), v).reshape(B, T, E)
        x = x + (o @ lp["wo"] + lp["bo"])
        h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], eps=1e-5)
        h = jax.nn.gelu(h @ lp["fc1_w"] + lp["fc1_b"], approximate=False)
        x = x + (h @ lp["fc2_w"] + lp["fc2_b"])

    # avg-pool(2) over time, then final norm
    x = x.reshape(B, T // 2, 2, E).mean(axis=2)
    x = layer_norm(x, p["ln_post_w"], p["ln_post_b"], eps=1e-5)
    return x


@functools.partial(jax.jit, static_argnums=(0,))
def _encode_project(cfg, params, mel):
    feats = audio_encode(cfg, params["encoder"], mel)
    return feats @ params["proj_w"] + params["proj_b"]


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(3,))
def _audio_prefill(cfg, params, rope, cache, embeds, true_length):
    tokens = jnp.zeros(embeds.shape[:2], jnp.int32)
    hidden, new_cache = forward_hidden(
        cfg, params, tokens, cache, jnp.asarray(0, jnp.int32), rope,
        inputs_embeds=embeds, true_lengths=true_length[None],
    )
    new_cache = dataclasses.replace(
        new_cache, lengths=jnp.full_like(cache.lengths, true_length)
    )
    last = jax.lax.dynamic_index_in_dim(hidden[0], true_length - 1, 0, keepdims=False)
    return lm_logits(cfg, params, last[None, None])[:, 0], new_cache


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(3,))
def _audio_decode_step(cfg, params, rope, cache, token):
    hidden, new_cache = forward_hidden(
        cfg, params, token[:, None], cache, cache.lengths, rope
    )
    logits = lm_logits(cfg, params, hidden)[:, 0]
    return jnp.argmax(logits, -1).astype(jnp.int32), new_cache


class AudioLLM:
    def __init__(
        self,
        text_config: TransformerConfig,
        audio_config: AudioEncoderConfig,
        params: dict,
        *,
        audio_token_id: int,
        tokenizer=None,
        eos_token_ids: Sequence[int] = (),
        dtype=jnp.float32,
    ):
        self.config = text_config
        self.audio_config = audio_config
        self.params = params
        self.audio_token_id = audio_token_id
        self.tokenizer = tokenizer
        self.eos_token_ids = tuple(eos_token_ids)
        self.dtype = dtype
        self.rope = make_rope_tables(text_config)
        self.mel_config = MelConfig(n_mels=audio_config.num_mel_bins)

    def extract_features(self, wav: np.ndarray) -> tuple[jax.Array, int]:
        """16 kHz waveform -> (padded mel ``[1, mels, max_frames]``, mel_len)."""
        mel = log_mel_spectrogram(self.mel_config, jnp.asarray(wav, jnp.float32))
        mel_len = mel.shape[1]
        maxf = self.audio_config.max_mel_frames
        if mel_len > maxf:
            mel, mel_len = mel[:, :maxf], maxf
        mel = jnp.pad(mel, ((0, 0), (0, maxf - mel_len)))
        return mel[None], mel_len

    def n_audio_tokens(self, wav_len: int) -> int:
        mel_len = min(wav_len // self.mel_config.hop_length, self.audio_config.max_mel_frames)
        return audio_feature_lengths(mel_len)

    def generate(
        self,
        input_ids: Sequence[int],
        wav: Optional[np.ndarray] = None,
        *,
        max_new_tokens: int = 256,
    ) -> list[int]:
        """Greedy decode with audio embeds spliced at audio-token positions."""
        cfg = self.config
        ids = np.asarray(list(input_ids), np.int32)
        S = len(ids)
        embeds = self.params["embed"][jnp.asarray(ids)][None].astype(self.dtype)
        if wav is not None:
            mel, mel_len = self.extract_features(wav)
            feats = _encode_project(self.audio_config, self.params, mel.astype(self.dtype))
            n = audio_feature_lengths(mel_len)
            (pos,) = np.where(ids == self.audio_token_id)
            assert len(pos) == n, (len(pos), n)
            embeds = embeds.at[0, pos].set(feats[0, :n].astype(self.dtype))

        s_bucket = bucket_length(S, floor=64)
        embeds = jnp.pad(embeds, ((0, 0), (0, s_bucket - S), (0, 0)))
        cache = make_cache(cfg, 1, bucket_length(S + max_new_tokens, floor=256), self.dtype)
        logits, cache = _audio_prefill(
            cfg, self.params, self.rope, cache, embeds, jnp.asarray(S, jnp.int32)
        )
        tok = int(jnp.argmax(logits, -1)[0])
        out = []
        cur = jnp.asarray([tok], jnp.int32)
        for _ in range(max_new_tokens):
            out.append(int(cur[0]))
            if out[-1] in self.eos_token_ids:
                break
            cur, cache = _audio_decode_step(cfg, self.params, self.rope, cache, cur)
        return out

    def transcribe(self, wav: np.ndarray, prompt_builder=None, **kw) -> str:
        """ChatML ASR prompt (reference model.rs:106-190) -> text."""
        if self.tokenizer is None:
            raise ValueError("no tokenizer attached")
        n = self.n_audio_tokens(len(wav))
        if prompt_builder is None:
            audio_pads = "<|AUDIO|>" * n
            prompt = (
                f"<|im_start|>user\nAudio 1: {audio_pads}\n"
                "Transcribe the audio.<|im_end|>\n<|im_start|>assistant\n"
            )
        else:
            prompt = prompt_builder(n)
        ids = self.tokenizer.encode(prompt)
        out = self.generate(ids, wav, **kw)
        return self.tokenizer.decode(out)


def load_qwen2_audio(model_dir: str, *, dtype=jnp.float32) -> AudioLLM:
    from crane_tpu.loaders.safetensors_loader import load_state_dict
    from crane_tpu.models.auto import (
        load_hf_config,
        map_hf_weights,
        read_eos_ids,
        transformer_config_from_hf,
    )

    hf = load_hf_config(model_dir)
    ac = hf["audio_config"]
    audio_cfg = AudioEncoderConfig(
        d_model=ac["d_model"],
        num_layers=ac["encoder_layers"],
        num_heads=ac["encoder_attention_heads"],
        ffn_dim=ac["encoder_ffn_dim"],
        num_mel_bins=ac.get("num_mel_bins", 128),
        max_source_positions=ac.get("max_source_positions", 1500),
    )
    text_cfg = transformer_config_from_hf(hf["text_config"])
    sd = load_state_dict(model_dir)

    def strip(prefix):
        return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    lm_prefix = "model.language_model." if any(
        k.startswith("model.language_model.") for k in sd
    ) else "language_model.model."
    text_sd = {"model." + k: v for k, v in strip(lm_prefix).items()}
    head = sd.get("lm_head.weight") or sd.get("language_model.lm_head.weight")
    if head is not None:
        text_sd["lm_head.weight"] = head
    params = map_hf_weights(text_cfg, text_sd, dtype)

    at_prefix = "model.audio_tower." if any(
        k.startswith("model.audio_tower.") for k in sd
    ) else "audio_tower."
    a_sd = strip(at_prefix)
    t = lambda n: jnp.asarray(np.asarray(a_sd[n]).T, dtype)
    a = lambda n: jnp.asarray(np.asarray(a_sd[n]), dtype)
    layers = []
    for i in range(audio_cfg.num_layers):
        lp = f"layers.{i}."
        layers.append(
            {
                "ln1_w": a(lp + "self_attn_layer_norm.weight"),
                "ln1_b": a(lp + "self_attn_layer_norm.bias"),
                "ln2_w": a(lp + "final_layer_norm.weight"),
                "ln2_b": a(lp + "final_layer_norm.bias"),
                "wq": t(lp + "self_attn.q_proj.weight"), "bq": a(lp + "self_attn.q_proj.bias"),
                "wk": t(lp + "self_attn.k_proj.weight"),
                "wv": t(lp + "self_attn.v_proj.weight"), "bv": a(lp + "self_attn.v_proj.bias"),
                "wo": t(lp + "self_attn.out_proj.weight"), "bo": a(lp + "self_attn.out_proj.bias"),
                "fc1_w": t(lp + "fc1.weight"), "fc1_b": a(lp + "fc1.bias"),
                "fc2_w": t(lp + "fc2.weight"), "fc2_b": a(lp + "fc2.bias"),
            }
        )
    conv_w = lambda n: jnp.asarray(np.asarray(a_sd[n]).transpose(2, 1, 0), dtype)
    params["encoder"] = {
        "conv1_w": conv_w("conv1.weight"), "conv1_b": a("conv1.bias"),
        "conv2_w": conv_w("conv2.weight"), "conv2_b": a("conv2.bias"),
        "pos_embed": a("embed_positions.weight"),
        "layers": tuple(layers),
        "ln_post_w": a("layer_norm.weight"), "ln_post_b": a("layer_norm.bias"),
    }
    mp_prefix = "model.multi_modal_projector." if any(
        k.startswith("model.multi_modal_projector.") for k in sd
    ) else "multi_modal_projector."
    params["proj_w"] = jnp.asarray(np.asarray(sd[mp_prefix + "linear.weight"]).T, dtype)
    params["proj_b"] = jnp.asarray(np.asarray(sd[mp_prefix + "linear.bias"]), dtype)

    tokenizer = None
    try:
        from crane_tpu.tokenizer.autotokenizer import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(model_dir)
    except Exception:
        pass
    return AudioLLM(
        text_cfg, audio_cfg, params,
        audio_token_id=hf.get("audio_token_id", hf.get("audio_token_index")),
        tokenizer=tokenizer, eos_token_ids=read_eos_ids(model_dir), dtype=dtype,
    )
