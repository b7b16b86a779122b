"""Qwen3-ASR: the "AuT" chunked-conv audio encoder + Qwen3 LLM backbone.

Reference behavior (/root/reference/crane-core/src/models/qwen3_asr/):
- ``audio_encoder.rs:1-33``: mel frames split into non-overlapping chunks of
  ``n_window*2`` (=100) frames; each chunk independently passes three
  stride-2 3x3 Conv2d+GELU layers (1 -> dhs channels, mel axis 128->16),
  flattens channel-major to ``[tokens, dhs*16]``, projects via bias-free
  ``conv_out`` to d_model, and adds a per-chunk Whisper-style sinusoidal
  positional encoding. Chunk outputs concatenate along time, then
  ``encoder_layers`` pre-norm LayerNorm+GELU transformer blocks run with
  self-attention restricted to independent ``n_window_infer``-frame windows
  (a hard correctness requirement), then ``ln_post``.
- ``modeling.rs:25-60``: MultiModalProjector = linear_1 -> GELU -> linear_2
  (d_model -> output_dim), checkpoint path ``model.multi_modal_projector``.
- ``model.rs:25-37, 106-190``: fixed ChatML prompt with ``<|audio_start|>``
  + N x ``<|audio_pad|>`` + ``<|audio_end|>``, audio embeds spliced over the
  pad positions, greedy AR decode.
- ``feature_extractor.rs``: WhisperFeatureExtractor (n_fft 400, hop 160,
  128 Slaney mels, fmax 8000, log10 + dyn-range norm, no 30s padding,
  min_length 8000-sample zero-pad).

Numeric oracle: transformers' Qwen3OmniMoeAudioEncoder (the same AuT
architecture; its in-encoder proj1/proj2 correspond to the ASR checkpoint's
separate multi_modal_projector.linear_1/linear_2).

TPU-native design: the chunk dimension IS the batch dimension of one
3-conv stack (all chunks convolve in parallel on the MXU); token validity
and window-block masks are precomputed host-side from the static mel length
(bucketed), so the whole encoder jits with static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from crane_tpu.audio.mel import MelConfig, log_mel_spectrogram
from crane_tpu.models.modules.transformer import (
    TransformerConfig,
    make_cache,
    make_rope_tables,
)
from crane_tpu.utils.buckets import bucket_length

_NEG_INF = float(np.finfo(np.float32).min)


@dataclasses.dataclass(frozen=True)
class AuTConfig:
    """Audio tower config (reference config.rs; 0.6B: d_model 896 / 18
    layers / n_window 50 / n_window_infer 800 / output_dim 1024)."""

    d_model: int = 896
    num_layers: int = 18
    num_heads: int = 14
    ffn_dim: int = 3584
    num_mel_bins: int = 128
    downsample_hidden_size: int = 480
    output_dim: int = 1024
    n_window: int = 50
    n_window_infer: int = 800
    max_source_positions: int = 1500

    @property
    def chunk_frames(self) -> int:
        return self.n_window * 2  # raw mel frames per conv chunk

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads

    @property
    def post_conv_mel_bins(self) -> int:
        m = self.num_mel_bins
        for _ in range(3):
            m = _conv_len(m)
        return m

    @property
    def tokens_per_chunk(self) -> int:
        t = self.chunk_frames
        for _ in range(3):
            t = _conv_len(t)
        return t

    @property
    def window_tokens(self) -> int:
        """Attention-window size in tokens (HF: padded-chunk tokens x
        (n_window_infer // chunk_frames))."""
        return self.tokens_per_chunk * (self.n_window_infer // self.chunk_frames)


def _conv_len(n: int) -> int:
    """Output length of one k=3 s=2 p=1 conv."""
    return (n - 1) // 2 + 1


def feat_extract_output_lengths(cfg: AuTConfig, mel_len: int) -> int:
    """Encoder output token count for ``mel_len`` raw mel frames (HF
    _get_feat_extract_output_lengths, generalized to the config chunk)."""
    full, leave = divmod(mel_len, cfg.chunk_frames)
    tail = _conv_len(_conv_len(_conv_len(leave))) if leave else 0
    return full * cfg.tokens_per_chunk + tail


def sinusoid_table(length: int, channels: int) -> np.ndarray:
    """Whisper-style fixed PE: [sin || cos] concatenated (not interleaved)."""
    assert channels % 2 == 0, channels
    log_inc = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_inc * np.arange(channels // 2, dtype=np.float64))
    t = np.arange(length, dtype=np.float64)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


def _conv2d(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """3x3 stride-2 pad-1 conv, NCHW / OIHW (torch layout)."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + b.astype(x.dtype)[None, :, None, None]


def _layer_norm(x: jax.Array, w: jax.Array, b: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def _attn(cfg: AuTConfig, p: dict, x: jax.Array, block_mask: jax.Array) -> jax.Array:
    """Bidirectional MHA restricted to window blocks. x ``[T, E]``."""
    T = x.shape[0]
    H, D = cfg.num_heads, cfg.head_dim
    q = (x @ p["wq"] + p["bq"]).reshape(T, H, D)
    k = (x @ p["wk"] + p["bk"]).reshape(T, H, D)
    v = (x @ p["wv"] + p["bv"]).reshape(T, H, D)
    s = jnp.einsum("qhd,khd->hqk", q, k, preferred_element_type=jnp.float32)
    s = s * (D ** -0.5)
    s = jnp.where(block_mask[None, :, :], s, _NEG_INF)
    a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum("hqk,khd->qhd", a, v).reshape(T, H * D)
    return o @ p["wo"] + p["bo"]


def aut_encode(
    cfg: AuTConfig,
    p: dict,
    mel: jax.Array,
    valid_tokens: jax.Array,
    block_mask: jax.Array,
) -> jax.Array:
    """mel ``[n_chunks, n_mels, chunk_frames]`` (zero-padded tail) ->
    ``[n_chunks * tokens_per_chunk, output_dim]``.

    ``valid_tokens [T]`` bool marks real (non-pad) token slots;
    ``block_mask [T, T]`` is the window-block attention mask (both
    precomputed host-side — they only depend on the static mel length).
    """
    x = mel[:, None, :, :]  # [n_chunks, 1, mels, frames]
    x = jax.nn.gelu(_conv2d(x, p["conv1_w"], p["conv1_b"]), approximate=False)
    x = jax.nn.gelu(_conv2d(x, p["conv2_w"], p["conv2_b"]), approximate=False)
    x = jax.nn.gelu(_conv2d(x, p["conv3_w"], p["conv3_b"]), approximate=False)
    # [n, C, mel', t'] -> [n, t', C * mel'] (channel-major flatten, HF order)
    n, c, f, t = x.shape
    x = x.transpose(0, 3, 1, 2).reshape(n, t, c * f)
    x = x @ p["conv_out"]  # [n, t', d_model], bias-free
    x = x + jnp.asarray(p["pos_embed"])[None, :t, :].astype(x.dtype)

    h = x.reshape(n * t, cfg.d_model)
    # zero out pad slots so they contribute nothing through residuals
    h = jnp.where(valid_tokens[:, None], h, 0.0)
    for layer in p["layers"]:
        r = h
        h = _layer_norm(h, layer["attn_ln_w"], layer["attn_ln_b"])
        h = r + _attn(cfg, layer, h, block_mask)
        r = h
        h = _layer_norm(h, layer["ffn_ln_w"], layer["ffn_ln_b"])
        h = jax.nn.gelu(h @ layer["fc1_w"] + layer["fc1_b"], approximate=False)
        h = h @ layer["fc2_w"] + layer["fc2_b"]
        h = r + h
    h = _layer_norm(h, p["ln_post_w"], p["ln_post_b"])
    h = jax.nn.gelu(h @ p["proj1_w"] + p["proj1_b"], approximate=False)
    return h @ p["proj2_w"] + p["proj2_b"]  # [T, output_dim]


def encoder_masks(cfg: AuTConfig, mel_len: int, n_chunks: int) -> tuple[np.ndarray, np.ndarray]:
    """Host-side static masks for ``aut_encode``.

    Valid tokens: per padded chunk slot of ``tokens_per_chunk`` tokens, the
    first ``conv_len^3(chunk_mel_frames)`` are real. Window blocks: real
    tokens are numbered consecutively and grouped into ``window_tokens``
    blocks (HF cu_seqlens); pad slots attend only to themselves (their
    output is discarded)."""
    tpc = cfg.tokens_per_chunk
    T = n_chunks * tpc
    valid = np.zeros(T, np.bool_)
    for ci in range(n_chunks):
        left = mel_len - ci * cfg.chunk_frames
        if left <= 0:
            break
        frames = min(left, cfg.chunk_frames)
        valid[ci * tpc : ci * tpc + _conv_len(_conv_len(_conv_len(frames)))] = True
    block_id = np.full(T, -1, np.int64)
    block_id[valid] = np.arange(valid.sum()) // cfg.window_tokens
    mask = (block_id[:, None] == block_id[None, :]) & valid[:, None] & valid[None, :]
    np.fill_diagonal(mask, True)  # pad slots self-attend (softmax stays finite)
    return valid, mask


class Qwen3AsrModel:
    """AuT encoder + Qwen3 text backbone, transcribe API (model.rs:106-190)."""

    def __init__(
        self,
        text_config: TransformerConfig,
        audio_config: AuTConfig,
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

    # -- audio frontend -------------------------------------------------------
    def extract_features(self, wav: np.ndarray) -> tuple[jax.Array, int]:
        """16 kHz f32 -> (chunked mel ``[n_chunks, mels, chunk]``, mel_len).
        min_length zero-pad per feature_extractor.rs (0.5 s)."""
        wav = np.asarray(wav, np.float32)
        if len(wav) < 8000:
            wav = np.pad(wav, (0, 8000 - len(wav)))
        mel = log_mel_spectrogram(self.mel_config, jnp.asarray(wav))
        mel_len = mel.shape[1]
        ck = self.audio_config.chunk_frames
        n_chunks = -(-mel_len // ck)
        mel = jnp.pad(mel, ((0, 0), (0, n_chunks * ck - mel_len)))
        return mel.T.reshape(n_chunks, ck, -1).transpose(0, 2, 1), mel_len

    def n_audio_tokens(self, wav_len: int) -> int:
        n = max(wav_len, 8000)
        # centered STFT, whisper drop-last-frame convention
        mel_len = n // self.mel_config.hop_length
        return feat_extract_output_lengths(self.audio_config, mel_len)

    def encode_audio(self, wav: np.ndarray) -> jax.Array:
        """waveform -> ``[n_tokens, output_dim]`` audio embeddings."""
        mel, mel_len = self.extract_features(wav)
        valid, mask = encoder_masks(self.audio_config, mel_len, mel.shape[0])
        feats = _jit_aut_encode(
            self.audio_config, self.params["audio"],
            mel.astype(self.dtype), jnp.asarray(valid), jnp.asarray(mask),
        )
        return feats[jnp.asarray(np.where(valid)[0])]

    # -- generation -----------------------------------------------------------
    def generate(
        self,
        input_ids: Sequence[int],
        wav: Optional[np.ndarray] = None,
        *,
        max_new_tokens: int = 256,
    ) -> list[int]:
        cfg = self.config
        ids = np.asarray(list(input_ids), np.int32)
        S = len(ids)
        embeds = self.params["embed"][jnp.asarray(ids)][None].astype(self.dtype)
        if wav is not None:
            feats = self.encode_audio(wav)
            (pos,) = np.where(ids == self.audio_token_id)
            assert len(pos) == feats.shape[0], (len(pos), feats.shape)
            embeds = embeds.at[0, pos].set(feats.astype(self.dtype))

        block = 16  # device-side steps per host EOS check
        s_bucket = bucket_length(S, floor=64)
        embeds = jnp.pad(embeds, ((0, 0), (0, s_bucket - S), (0, 0)))
        cache = make_cache(
            cfg, 1,
            bucket_length(S + max_new_tokens + block, floor=256), self.dtype,
        )
        logits, cache = _asr_prefill(
            cfg, self.params, self.rope, cache, embeds, jnp.asarray(S, jnp.int32)
        )
        tok = int(jnp.argmax(logits, -1)[0])
        out = [tok]
        eos = set(self.eos_token_ids)
        cur = jnp.asarray([tok], jnp.int32)
        while len(out) < max_new_tokens and out[-1] not in eos:
            toks, cache = _asr_decode_block(
                cfg, block, self.params, self.rope, cache, cur
            )
            toks_np = np.asarray(toks).tolist()
            for t in toks_np:
                out.append(t)
                if t in eos:
                    break
            cur = toks[-1:]
        if out and out[0] in eos:  # prefill emitted EOS immediately
            return out[:1]
        return out[:max_new_tokens]

    def build_prompt(self, n_audio_tokens: int, context: str = "") -> str:
        """The reference's fixed ASR prompt (model.rs:25-37); ``context``
        fills the system turn (hotwords / style hints)."""
        return (
            f"<|im_start|>system\n{context}<|im_end|>\n<|im_start|>user\n"
            "<|audio_start|>" + "<|audio_pad|>" * n_audio_tokens
            + "<|audio_end|><|im_end|>\n<|im_start|>assistant\n"
        )

    def transcribe(self, wav: np.ndarray, *, context: str = "", **kw) -> str:
        if self.tokenizer is None:
            raise ValueError("no tokenizer attached")
        n = self.n_audio_tokens(len(wav))
        ids = self.tokenizer.encode(self.build_prompt(n, context))
        out = self.generate(ids, wav, **kw)
        eos = set(self.eos_token_ids)
        return self.tokenizer.decode([t for t in out if t not in eos])


import functools as _functools


@_functools.partial(jax.jit, static_argnums=(0,))
def _jit_aut_encode(cfg, p, mel, valid, mask):
    return aut_encode(cfg, p, mel, valid, mask)


# prefill-from-embeds + greedy step live in the shared module now
# (also used by PaddleOCR-VL); aliased for this file's call sites
from crane_tpu.models.modules.embeds_decode import (  # noqa: E402
    embeds_prefill as _asr_prefill,
    greedy_decode_step as _asr_decode_step,
)


@_functools.partial(jax.jit, static_argnums=(0, 1), donate_argnums=(4,))
def _asr_decode_block(cfg, n_steps, params, rope, cache, token):
    """``n_steps`` greedy decode steps in one dispatch (lax.scan); the host
    checks for EOS once per block instead of once per token — a per-token
    roundtrip otherwise dominates transcription wall time."""
    from crane_tpu.models.modules.transformer import forward_hidden, lm_logits

    def body(carry, _):
        cache, tok = carry
        hidden, cache = forward_hidden(
            cfg, params, tok[:, None], cache, cache.lengths, rope
        )
        nxt = jnp.argmax(lm_logits(cfg, params, hidden)[:, 0], -1).astype(jnp.int32)
        return (cache, nxt), nxt

    (cache, tok), toks = jax.lax.scan(body, (cache, token), None, length=n_steps)
    return toks[:, 0], cache


def map_aut_weights(cfg: AuTConfig, a_sd: dict, dtype=jnp.float32) -> dict:
    """HF/reference audio-tower state dict (keys relative to the tower:
    conv2d1..3, conv_out, layers.N.*, ln_post) + projector (proj1/proj2 or
    multi_modal_projector linear_1/linear_2) -> params pytree."""
    t = lambda n: jnp.asarray(np.asarray(a_sd[n]).T, dtype)
    arr = lambda n: jnp.asarray(np.asarray(a_sd[n]), dtype)

    def proj(hf_omni: str, hf_asr: str, suffix: str, transpose: bool):
        name = f"{hf_omni}.{suffix}" if f"{hf_omni}.{suffix}" in a_sd else f"{hf_asr}.{suffix}"
        return t(name) if transpose else arr(name)

    layers = []
    for i in range(cfg.num_layers):
        L = f"layers.{i}."
        layers.append({
            "wq": t(L + "self_attn.q_proj.weight"), "bq": arr(L + "self_attn.q_proj.bias"),
            "wk": t(L + "self_attn.k_proj.weight"), "bk": arr(L + "self_attn.k_proj.bias"),
            "wv": t(L + "self_attn.v_proj.weight"), "bv": arr(L + "self_attn.v_proj.bias"),
            "wo": t(L + "self_attn.out_proj.weight"), "bo": arr(L + "self_attn.out_proj.bias"),
            "attn_ln_w": arr(L + "self_attn_layer_norm.weight"),
            "attn_ln_b": arr(L + "self_attn_layer_norm.bias"),
            "ffn_ln_w": arr(L + "final_layer_norm.weight"),
            "ffn_ln_b": arr(L + "final_layer_norm.bias"),
            "fc1_w": t(L + "fc1.weight"), "fc1_b": arr(L + "fc1.bias"),
            "fc2_w": t(L + "fc2.weight"), "fc2_b": arr(L + "fc2.bias"),
        })
    return {
        "conv1_w": arr("conv2d1.weight"), "conv1_b": arr("conv2d1.bias"),
        "conv2_w": arr("conv2d2.weight"), "conv2_b": arr("conv2d2.bias"),
        "conv3_w": arr("conv2d3.weight"), "conv3_b": arr("conv2d3.bias"),
        "conv_out": t("conv_out.weight"),
        "pos_embed": jnp.asarray(
            sinusoid_table(cfg.max_source_positions, cfg.d_model), dtype
        ),
        "layers": layers,
        "ln_post_w": arr("ln_post.weight"), "ln_post_b": arr("ln_post.bias"),
        "proj1_w": proj("proj1", "_projector.linear_1", "weight", True),
        "proj1_b": proj("proj1", "_projector.linear_1", "bias", False),
        "proj2_w": proj("proj2", "_projector.linear_2", "weight", True),
        "proj2_b": proj("proj2", "_projector.linear_2", "bias", False),
    }


def load_qwen3_asr(model_dir: str, *, dtype=jnp.float32) -> Qwen3AsrModel:
    """Load a Qwen3-ASR HF checkpoint: audio tower at ``model.audio_tower``,
    projector at ``model.multi_modal_projector``, LLM at
    ``model.language_model`` (reference modeling.rs:84-103)."""
    from crane_tpu.loaders.safetensors_loader import load_state_dict
    from crane_tpu.models.auto import (
        load_hf_config,
        map_hf_weights,
        read_eos_ids,
        transformer_config_from_hf,
    )
    from crane_tpu.tokenizer.autotokenizer import AutoTokenizer

    hf = load_hf_config(model_dir)
    ac = hf.get("audio_config", hf)
    audio_cfg = AuTConfig(
        d_model=ac.get("d_model", 896),
        num_layers=ac.get("encoder_layers", 18),
        num_heads=ac.get("encoder_attention_heads", 14),
        ffn_dim=ac.get("encoder_ffn_dim", 3584),
        num_mel_bins=ac.get("num_mel_bins", 128),
        downsample_hidden_size=ac.get("downsample_hidden_size", 480),
        output_dim=ac.get("output_dim", 1024),
        n_window=ac.get("n_window", 50),
        n_window_infer=ac.get("n_window_infer", 800),
        max_source_positions=ac.get("max_source_positions", 1500),
    )
    text_cfg = transformer_config_from_hf(hf.get("text_config", hf))
    sd = load_state_dict(model_dir)

    def strip(prefix):
        return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    lm_prefix = "model.language_model." if any(
        k.startswith("model.language_model.") for k in sd
    ) else "language_model.model."
    text_sd = {"model." + k: v for k, v in strip(lm_prefix).items()}
    for hk in ("lm_head.weight", "language_model.lm_head.weight", "model.lm_head.weight"):
        if hk in sd:
            text_sd["lm_head.weight"] = sd[hk]
            break
    params = map_hf_weights(text_cfg, text_sd, dtype)

    a_sd = strip("model.audio_tower.") or strip("audio_tower.")
    for k, v in (strip("model.multi_modal_projector.") or strip("multi_modal_projector.")).items():
        a_sd["_projector." + k] = v
    params["audio"] = map_aut_weights(audio_cfg, a_sd, dtype)

    tok = AutoTokenizer.from_pretrained(model_dir)
    audio_token_id = hf.get("audio_token_id") or tok.token_to_id("<|audio_pad|>")
    return Qwen3AsrModel(
        text_cfg, audio_cfg, params,
        audio_token_id=int(audio_token_id),
        tokenizer=tok,
        eos_token_ids=read_eos_ids(model_dir),
        dtype=dtype,
    )


def init_aut_params(cfg: AuTConfig, seed: int = 0, dtype=jnp.bfloat16) -> dict:
    """Random audio-tower params at ``cfg`` shapes (benchmarks / dry-runs).
    Mirrors the pytree produced by :func:`map_aut_weights`."""
    rng = np.random.default_rng(seed)

    def r(*shape, scale=0.02):
        return jnp.asarray(rng.normal(size=shape) * scale, dtype)

    C, d, f = cfg.downsample_hidden_size, cfg.d_model, cfg.ffn_dim
    ones = lambda n: jnp.ones((n,), dtype)
    zeros = lambda n: jnp.zeros((n,), dtype)
    layers = [
        {
            "wq": r(d, d), "bq": zeros(d), "wk": r(d, d), "bk": zeros(d),
            "wv": r(d, d), "bv": zeros(d), "wo": r(d, d), "bo": zeros(d),
            "attn_ln_w": ones(d), "attn_ln_b": zeros(d),
            "ffn_ln_w": ones(d), "ffn_ln_b": zeros(d),
            "fc1_w": r(d, f), "fc1_b": zeros(f),
            "fc2_w": r(f, d), "fc2_b": zeros(d),
        }
        for _ in range(cfg.num_layers)
    ]
    return {
        "conv1_w": r(C, 1, 3, 3), "conv1_b": zeros(C),
        "conv2_w": r(C, C, 3, 3), "conv2_b": zeros(C),
        "conv3_w": r(C, C, 3, 3), "conv3_b": zeros(C),
        "conv_out": r(C * cfg.post_conv_mel_bins, d),
        "pos_embed": jnp.asarray(
            sinusoid_table(cfg.max_source_positions, d), dtype
        ),
        "layers": layers,
        "ln_post_w": ones(d), "ln_post_b": zeros(d),
        "proj1_w": r(d, d), "proj1_b": zeros(d),
        "proj2_w": r(d, cfg.output_dim), "proj2_b": zeros(cfg.output_dim),
    }
