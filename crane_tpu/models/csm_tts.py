"""Two-level autoregressive codec TTS: backbone talker + per-codebook depth
decoder, decoding through the Mimi codec.

Reference behavior (/root/reference/crane-core/src/models/qwen3_tts/
modeling.rs): a TalkerModel predicts codebook-0 per frame and a small
CodePredictor transformer predicts the remaining codebooks conditioned on the
talker hidden state + code-0 (:259-472, :1327-1490); frames feed back as the
sum of codec embeddings; audio is decoded by the Mimi-style speech tokenizer.
This is the same architecture family as Sesame CSM, which transformers
implements — CsmForConditionalGeneration is the parity oracle here.

The backbone and depth decoder both reuse crane_tpu's generic transformer
(llama-style layers) with custom embeddings; generation is greedy per frame
(codebook-0 EOS stops), mirroring the reference's generate_speech_codes loop.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from crane_tpu.models.modules.transformer import (
    TransformerConfig,
    forward_hidden,
    make_cache,
    make_rope_tables,
)
from crane_tpu.ops.kv_cache import KVCache
from crane_tpu.utils.buckets import bucket_length


@dataclasses.dataclass(frozen=True)
class CsmTtsConfig:
    backbone: TransformerConfig
    depth: TransformerConfig
    num_codebooks: int
    audio_vocab_size: int
    text_vocab_size: int
    codebook_eos_token_id: int = 0
    audio_token_id: int = -1
    audio_eos_token_id: int = -1


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(3,))
def _backbone_prefill(cfg, params, rope, cache, embeds, true_length):
    tokens = jnp.zeros(embeds.shape[:2], jnp.int32)
    hidden, new_cache = forward_hidden(
        cfg, params, tokens, cache, jnp.asarray(0, jnp.int32), rope,
        inputs_embeds=embeds, true_lengths=true_length[None],
    )
    new_cache = dataclasses.replace(
        new_cache, lengths=jnp.full_like(cache.lengths, true_length)
    )
    last = jax.lax.dynamic_index_in_dim(hidden[0], true_length - 1, 0, keepdims=False)
    return last, new_cache


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(3,))
def _backbone_step(cfg, params, rope, cache, frame_embed):
    hidden, new_cache = forward_hidden(
        cfg, params, jnp.zeros((1, 1), jnp.int32), cache, cache.lengths, rope,
        inputs_embeds=frame_embed[None, None, :],
    )
    return hidden[0, 0], new_cache


@functools.partial(jax.jit, static_argnums=(0, 1))
def _depth_decode_frame(cfg, K, params, rope, h_last, c0):
    """AR over codebooks 1..K-1 with full recompute (K is tiny).

    Position 0 carries the projected backbone hidden, position i>=1 carries
    code i-1's embedding; position i's logits (head weight i-1) give code i.
    """
    Va = params["audio_embed"].shape[0] // K
    proj = params["depth_projector"]

    def embed(code, idx):
        return (params["depth_embed"][code + idx * Va] @ proj)

    seq0 = jnp.zeros((K, proj.shape[1]), params["depth_embed"].dtype)
    seq0 = seq0.at[0].set(h_last @ proj)
    seq0 = seq0.at[1].set(embed(c0, 0))

    def body(i, carry):
        seq, codes = carry
        cache = make_cache(cfg, 1, K, seq.dtype)
        hidden, _ = forward_hidden(
            cfg, params["depth"], jnp.zeros((1, K), jnp.int32), cache,
            jnp.asarray(0, jnp.int32), rope,
            inputs_embeds=seq[None], true_lengths=jnp.asarray([K], jnp.int32),
        )
        h_i = hidden[0, i]  # position i predicts codebook i
        logits = h_i @ params["codebooks_head"][i - 1]
        c_i = jnp.argmax(logits).astype(jnp.int32)
        codes = codes.at[i].set(c_i)
        seq = jax.lax.cond(
            i + 1 < K,
            lambda s: s.at[i + 1].set(embed(c_i, i)),
            lambda s: s,
            seq,
        )
        return seq, codes

    codes0 = jnp.zeros((K,), jnp.int32).at[0].set(c0)
    _, codes = jax.lax.fori_loop(1, K, body, (seq0, codes0))
    return codes


class CsmTtsModel:
    def __init__(self, config: CsmTtsConfig, params: dict, *, codec=None, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.codec = codec  # optional MimiCodec for codes -> waveform
        self.dtype = dtype
        self.rope = make_rope_tables(config.backbone)
        self.depth_rope = make_rope_tables(config.depth)

    def frame_embed(self, codes: jax.Array) -> jax.Array:
        """codes [K] -> summed backbone audio embedding [E]."""
        K = self.config.num_codebooks
        Va = self.config.audio_vocab_size
        offsets = jnp.arange(K, dtype=jnp.int32) * Va
        return self.params["audio_embed"][codes + offsets].sum(axis=0)

    def prompt_embeds(self, ids: np.ndarray, audio_context: Optional[np.ndarray]) -> jax.Array:
        """Text embeds with voice-clone audio context spliced in: audio-token
        positions carry codec-frame embeddings of the reference audio, the
        audio-EOS position carries the EOS-frame embedding (reference
        voice-clone ICL prompt builders, qwen3_tts/modeling.rs:746-915)."""
        cfg = self.config
        embeds = self.params["text_embed"][jnp.asarray(ids)][None]
        if audio_context is None:
            return embeds
        if self.codec is None:
            raise ValueError("voice cloning needs the codec attached")
        codes = self.codec.encode(audio_context[None], num_quantizers=cfg.num_codebooks)
        frames = jnp.asarray(codes[0].T)  # [T', K]
        K, Va = cfg.num_codebooks, cfg.audio_vocab_size
        offsets = jnp.arange(K, dtype=jnp.int32) * Va
        frame_embeds = self.params["audio_embed"][frames + offsets].sum(axis=1)
        (pos,) = np.where(ids == cfg.audio_token_id)
        assert len(pos) == frame_embeds.shape[0], (len(pos), frame_embeds.shape)
        embeds = embeds.at[0, pos].set(frame_embeds.astype(embeds.dtype))
        eos_frame = jnp.full((K,), cfg.codebook_eos_token_id, jnp.int32)
        eos_embed = self.params["audio_embed"][eos_frame + offsets].sum(axis=0)
        (epos,) = np.where(ids == cfg.audio_eos_token_id)
        if len(epos):
            embeds = embeds.at[0, epos].set(
                jnp.broadcast_to(eos_embed, (len(epos), eos_embed.shape[0])).astype(embeds.dtype)
            )
        return embeds

    def generate_codes(
        self,
        text_ids,
        *,
        audio_context: Optional[np.ndarray] = None,
        max_frames: int = 125,
        stop_on_eos: bool = True,
    ) -> np.ndarray:
        """Greedy frame loop -> audio codes ``[T, K]`` (reference
        generate_speech_codes, modeling.rs:1327-1490). ``audio_context`` is a
        24 kHz reference waveform for voice cloning."""
        cfg = self.config
        ids = np.asarray(list(text_ids), np.int32)
        S = len(ids)
        s_bucket = bucket_length(S, floor=32)
        embeds = self.prompt_embeds(ids, audio_context)
        embeds = jnp.pad(embeds, ((0, 0), (0, s_bucket - S), (0, 0)))

        cache = make_cache(cfg.backbone, 1, bucket_length(S + max_frames, floor=256), self.dtype)
        h_last, cache = _backbone_prefill(
            cfg.backbone, self.params["backbone"], self.rope, cache,
            embeds.astype(self.dtype), jnp.asarray(S, jnp.int32),
        )
        frames = []
        for _ in range(max_frames):
            logits0 = h_last @ self.params["lm_head"]
            c0 = int(jnp.argmax(logits0))
            if stop_on_eos and c0 == cfg.codebook_eos_token_id:
                break
            codes = _depth_decode_frame(
                cfg.depth, cfg.num_codebooks,
                {
                    "depth": self.params["depth"],
                    "depth_embed": self.params["depth_embed"],
                    "depth_projector": self.params["depth_projector"],
                    "codebooks_head": self.params["codebooks_head"],
                    "audio_embed": self.params["audio_embed"],
                },
                self.depth_rope, h_last, jnp.asarray(c0, jnp.int32),
            )
            frames.append(np.asarray(codes))
            h_last, cache = _backbone_step(
                cfg.backbone, self.params["backbone"], self.rope, cache,
                self.frame_embed(codes).astype(self.dtype),
            )
        return np.stack(frames) if frames else np.zeros((0, cfg.num_codebooks), np.int32)

    def generate_speech(self, text_ids, *, max_frames: int = 125) -> np.ndarray:
        """text ids -> 24 kHz waveform via the Mimi codec (chunked decode)."""
        codes = self.generate_codes(text_ids, max_frames=max_frames)
        if self.codec is None:
            raise ValueError("no codec attached")
        if codes.shape[0] == 0:
            return np.zeros((0,), np.float32)
        return self.codec.chunked_decode(codes.T[None], chunk=300, overlap=25)[0]


def load_csm(model_dir: str, *, dtype=jnp.float32, with_codec: bool = False) -> CsmTtsModel:
    from crane_tpu.loaders.safetensors_loader import load_state_dict
    from crane_tpu.models.auto import load_hf_config, map_hf_weights

    hf = load_hf_config(model_dir)
    dd = hf["depth_decoder_config"]

    def tcfg(h, vocab):
        return TransformerConfig(
            vocab_size=vocab,
            hidden_size=h["hidden_size"],
            num_layers=h["num_hidden_layers"],
            num_heads=h["num_attention_heads"],
            num_kv_heads=h.get("num_key_value_heads", h["num_attention_heads"]),
            head_dim=h.get("head_dim") or h["hidden_size"] // h["num_attention_heads"],
            intermediate_size=h["intermediate_size"],
            rms_norm_eps=h.get("rms_norm_eps", 1e-6),
            rope_theta=h.get("rope_theta", 10000.0),
            max_position_embeddings=h.get("max_position_embeddings", 2048),
        )

    cfg = CsmTtsConfig(
        backbone=tcfg(hf, hf["vocab_size"]),
        depth=tcfg(dd, dd["vocab_size"]),
        num_codebooks=hf["num_codebooks"],
        audio_vocab_size=hf["vocab_size"],
        text_vocab_size=hf.get("text_vocab_size", 128256),
        codebook_eos_token_id=hf.get("codebook_eos_token_id", 0),
        audio_token_id=hf.get("audio_token_id", -1),
        audio_eos_token_id=hf.get("audio_eos_token_id", -1),
    )
    sd = load_state_dict(model_dir)
    # tie_codebooks_embeddings dedupes the backbone audio embedding on save
    if "backbone_model.embed_tokens.embed_audio_tokens.weight" not in sd:
        sd["backbone_model.embed_tokens.embed_audio_tokens.weight"] = sd[
            "depth_decoder.model.embed_tokens.weight"
        ]
    bb_sd = {
        k.replace("backbone_model.", "model."): v
        for k, v in sd.items()
        if k.startswith("backbone_model.") and "embed_tokens" not in k
    }
    backbone = map_hf_weights(cfg.backbone, {**bb_sd, "model.embed_tokens.weight": sd["backbone_model.embed_tokens.embed_audio_tokens.weight"]}, dtype)
    backbone.pop("lm_head", None)
    dd_sd = {
        k.replace("depth_decoder.model.", "model."): v
        for k, v in sd.items()
        if k.startswith("depth_decoder.model.") and "embed_tokens" not in k
        and "projector" not in k
    }
    depth = map_hf_weights(cfg.depth, {**dd_sd, "model.embed_tokens.weight": sd["depth_decoder.model.embed_tokens.weight"]}, dtype)
    depth.pop("lm_head", None)

    t = lambda n: jnp.asarray(np.asarray(sd[n]).T, dtype)
    a = lambda n: jnp.asarray(np.asarray(sd[n]), dtype)
    params = {
        "backbone": backbone,
        "depth": depth,
        "text_embed": a("embed_text_tokens.weight"),
        "audio_embed": a("backbone_model.embed_tokens.embed_audio_tokens.weight"),
        "depth_embed": a("depth_decoder.model.embed_tokens.weight"),
        "depth_projector": t("depth_decoder.model.inputs_embeds_projector.weight"),
        "lm_head": t("lm_head.weight"),
        # [K-1, hidden, vocab]
        "codebooks_head": a("depth_decoder.codebooks_head.weight"),
    }
    codec = None
    if with_codec:
        from crane_tpu.models.mimi import MimiCodec, MimiCodecConfig, map_mimi_weights

        cc = hf["codec_config"]
        ccfg = MimiCodecConfig(
            sampling_rate=cc.get("sampling_rate", 24000),
            hidden_size=cc["hidden_size"], num_filters=cc["num_filters"],
            num_residual_layers=cc.get("num_residual_layers", 1),
            upsampling_ratios=tuple(cc["upsampling_ratios"]),
            kernel_size=cc.get("kernel_size", 7),
            last_kernel_size=cc.get("last_kernel_size", 3),
            residual_kernel_size=cc.get("residual_kernel_size", 3),
            dilation_growth_rate=cc.get("dilation_growth_rate", 2),
            codebook_size=cc["codebook_size"],
            codebook_dim=cc.get("codebook_dim") or cc.get("vector_quantization_hidden_dimension", 256),
            num_quantizers=cc["num_quantizers"],
            num_semantic_quantizers=cc.get("num_semantic_quantizers", 1),
            num_hidden_layers=cc.get("num_hidden_layers", 8),
            num_attention_heads=cc.get("num_attention_heads", 8),
            head_dim=cc.get("head_dim") or cc["hidden_size"] // cc.get("num_attention_heads", 8),
            intermediate_size=cc.get("intermediate_size", 2048),
            rope_theta=cc.get("rope_theta", 10000.0),
            sliding_window=cc.get("sliding_window", 250),
            norm_eps=cc.get("norm_eps", 1e-5),
            upsample_groups=cc.get("upsample_groups", cc["hidden_size"]),
        )
        codec_sd = {
            k.replace("codec_model.", ""): v
            for k, v in sd.items() if k.startswith("codec_model.")
        }
        codec = MimiCodec(ccfg, map_mimi_weights(ccfg, codec_sd))
    return CsmTtsModel(cfg, params, codec=codec, dtype=dtype)
