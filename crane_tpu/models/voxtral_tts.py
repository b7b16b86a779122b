"""Voxtral TTS: hybrid autoregressive + flow-matching text-to-speech.

Reference behavior (/root/reference/crane-core/src/models/voxtral_tts/):
three stages (README.md:6-34) —

1. **LLM backbone** (modeling.rs): Ministral-style decoder (26 layers, GQA
   32/8, dim 3072, interleaved RoPE theta=1e6) consumes the prompt
   ``[BOS, BEGIN_AUDIO, voice-embeddings..., INST_END, text..., INST,
   BEGIN_AUDIO]`` and then, per audio frame, the summed 37-codebook embedding
   of the previous frame's codes.
2. **Acoustic transformer** (modeling.rs:400-640): 3-layer *bidirectional*
   transformer (no rope, no mask). Per frame it predicts one semantic code
   (greedy over an 8192+2-entry padded head, EMPTY=0 and padding masked) and
   36 acoustic codes by flow matching: 7 Euler steps over a 3-token sequence
   [noise-proj, time-proj, llm-proj] with classifier-free guidance alpha=1.2
   (unconditional branch zeros the llm token), then FSQ quantization
   (clamp to [-1,1], 21 levels, +2 special-token offset).
3. **Codec decoder** (codec.rs): codes -> semantic VQ lookup
   (embedding_sum / cluster_usage) + FSQ dequant -> causal conv (k=3) ->
   4 stages of {ALiBi sliding-window transformer layers (full-width QK norm,
   LayerScale, SwiGLU) + causal transpose-conv upsample} with window sizes
   2<<stage -> causal output conv (k=7) to 240-sample patches -> 24 kHz PCM
   (1920 samples/frame).

TPU-native design: the LLM backbone *is* the shared verified transformer
(``TransformerConfig`` with interleaved rope); flow matching is a
``lax.fori_loop`` over a fixed [2, 3, dim] cond/uncond batch so all 7 Euler
steps compile into one XLA program; the codec runs in NWC layout with the
ALiBi + sliding-window bias built in-graph from iota (static per stage
length); weight-norm parameterizations are folded into plain weights at load
time. Everything is a pure function over parameter pytrees.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from crane_tpu.models.modules.transformer import (
    TransformerConfig,
    forward_hidden,
    make_cache,
    make_rope_tables,
)
from crane_tpu.ops.norm import rms_norm

# Prompt special tokens (reference model.rs:22-32, Tekken tokenizer ids)
BOS = 1
BEGIN_AUDIO = 25
INST = 35
INST_END = 36
# Semantic codebook special codes: EMPTY_AUDIO=0, END_AUDIO=1, codes from 2
END_AUDIO_CODE = 1

CFG_ALPHA = 1.2
FLOW_INTERVALS = 7
TIME_EMB_THETA = 10_000.0


@dataclasses.dataclass(frozen=True)
class AcousticArgs:
    dim: int = 3072
    n_layers: int = 3
    n_heads: int = 24
    n_kv_heads: int = 24
    head_dim: int = 128
    hidden_dim: int = 8192


@dataclasses.dataclass(frozen=True)
class CodecArgs:
    dim: int = 1024
    hidden_dim: int = 4096
    n_heads: int = 8
    n_kv_heads: int = 8
    head_dim: int = 128
    qk_norm_eps: float = 1e-6
    norm_eps: float = 0.01
    semantic_dim: int = 256
    patch_size: int = 240
    transformer_lengths: tuple = (2, 2, 2, 2)
    conv_kernels: tuple = (3, 4, 4, 4)
    conv_strides: tuple = (1, 2, 2, 2)

    @property
    def samples_per_frame(self) -> int:
        up = 1
        for s in self.conv_strides[1:len(self.transformer_lengths)]:
            up *= s
        return up * self.patch_size

    def window_size(self, stage: int) -> int:
        return 2 << stage


@dataclasses.dataclass(frozen=True)
class VoxtralConfig:
    dim: int = 3072
    n_layers: int = 26
    n_heads: int = 32
    n_kv_heads: int = 8
    head_dim: int = 96
    hidden_dim: int = 9216
    vocab_size: int = 131072
    rope_theta: float = 1_000_000.0
    norm_eps: float = 1e-5
    max_seq_len: int = 8192
    semantic_codebook_size: int = 8192
    n_acoustic: int = 36
    fsq_levels: int = 21
    sample_rate: int = 24_000
    acoustic: AcousticArgs = AcousticArgs()
    codec: CodecArgs = CodecArgs()

    @property
    def semantic_valid_end(self) -> int:
        return self.semantic_codebook_size + 2

    @property
    def semantic_padded(self) -> int:
        return ((self.semantic_valid_end + 127) // 128) * 128

    @property
    def n_codebooks(self) -> int:
        return 1 + self.n_acoustic

    def llm_config(self) -> TransformerConfig:
        return TransformerConfig(
            vocab_size=self.vocab_size,
            hidden_size=self.dim,
            num_layers=self.n_layers,
            num_heads=self.n_heads,
            num_kv_heads=self.n_kv_heads,
            head_dim=self.head_dim,
            intermediate_size=self.hidden_dim,
            rms_norm_eps=self.norm_eps,
            rope_theta=self.rope_theta,
            max_position_embeddings=self.max_seq_len,
            rope_mode="interleaved",
            tie_word_embeddings=True,  # logits head unused (semantic head instead)
        )


def codebook_offsets(cfg: VoxtralConfig) -> jnp.ndarray:
    """Start offset of each of the 37 codebooks in the concatenated embedding
    table: semantic (8192+2 entries) then 36 x FSQ (21+2 entries)."""
    sem = cfg.semantic_valid_end
    ac = cfg.fsq_levels + 2
    return jnp.asarray([0] + [sem + i * ac for i in range(cfg.n_acoustic)], jnp.int32)


def embed_frame_codes(table: jax.Array, offsets: jax.Array, codes: jax.Array) -> jax.Array:
    """Sum the 37 per-codebook embeddings of one frame: codes ``[..., 37]``
    (local indices) -> ``[..., dim]``."""
    return table[codes + offsets].sum(axis=-2)


# ---------------------------------------------------------------------------
# Acoustic transformer (bidirectional, 3-token sequences)


def _bidir_layer(p: dict, x: jax.Array, *, n_heads: int, head_dim: int, eps: float) -> jax.Array:
    """Pre-norm bidirectional attention + SwiGLU (no rope, no mask)."""
    B, S, E = x.shape
    h = rms_norm(x, p["input_ln"], eps=eps)
    q = (h @ p["wq"]).reshape(B, S, n_heads, head_dim)
    k = (h @ p["wk"]).reshape(B, S, n_heads, head_dim)
    v = (h @ p["wv"]).reshape(B, S, n_heads, head_dim)
    logits = jnp.einsum("bshd,bthd->bhst", q, k) * head_dim ** -0.5
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    o = jnp.einsum("bhst,bthd->bshd", attn, v).reshape(B, S, n_heads * head_dim)
    x = x + o @ p["wo"]
    h = rms_norm(x, p["post_ln"], eps=eps)
    return x + (jax.nn.silu(h @ p["gate"]) * (h @ p["up"])) @ p["down"]


def time_embedding(t: jax.Array, dim: int) -> jax.Array:
    """Sinusoidal timestep embedding ``[cos(t f_i)... sin(t f_i)...]``."""
    half = dim // 2
    inv_freq = jnp.exp(
        -math.log(TIME_EMB_THETA) * jnp.arange(half, dtype=jnp.float32) / half
    )
    angle = t * inv_freq
    return jnp.concatenate([jnp.cos(angle), jnp.sin(angle)])


def predict_semantic_logits(cfg: VoxtralConfig, p: dict, llm_hidden: jax.Array) -> jax.Array:
    """Masked semantic logits: EMPTY (0) and padding beyond the valid range
    are -inf; greedy argmax over the rest picks the frame's semantic code."""
    logits = (llm_hidden @ p["semantic_head"]).astype(jnp.float32)
    idx = jnp.arange(logits.shape[-1])
    invalid = (idx == 0) | (idx >= cfg.semantic_valid_end)
    return jnp.where(invalid, -jnp.inf, logits)


def flow_match(cfg: VoxtralConfig, p: dict, llm_hidden: jax.Array, noise: jax.Array) -> jax.Array:
    """7 Euler steps of CFG flow matching -> 36 FSQ codes in ``[2, 2+levels)``.

    Each step runs the 3-layer bidirectional transformer on a fixed
    ``[2 (cond/uncond), 3 (noise/time/llm), dim]`` batch; the velocity is the
    acoustic head over the normed first position, combined as
    ``alpha * v_cond + (1 - alpha) * v_uncond``.
    """
    ac = cfg.acoustic
    dt = 1.0 / FLOW_INTERVALS
    tok2 = jnp.stack([llm_hidden @ p["llm_proj"], jnp.zeros_like(llm_hidden)])  # [2, dim]

    def step(i, x):
        t = i.astype(jnp.float32) * dt
        tok1 = time_embedding(t, ac.dim).astype(x.dtype) @ p["time_proj"]
        tok0 = x @ p["input_proj"]
        seq = jnp.stack([
            jnp.broadcast_to(tok0, (2, ac.dim)),
            jnp.broadcast_to(tok1, (2, ac.dim)),
            tok2,
        ], axis=1)  # [2, 3, dim]
        for lp in p["layers"]:
            seq = _bidir_layer(lp, seq, n_heads=ac.n_heads, head_dim=ac.head_dim,
                               eps=cfg.norm_eps)
        normed = rms_norm(seq[:, 0], p["norm"], eps=cfg.norm_eps)
        v = normed @ p["acoustic_head"]  # [2, 36]
        v = CFG_ALPHA * v[0] + (1.0 - CFG_ALPHA) * v[1]
        return x + v * dt

    x = jax.lax.fori_loop(0, FLOW_INTERVALS, step, noise)
    return fsq_quantize(x, cfg.fsq_levels)


def fsq_quantize(x: jax.Array, levels: int) -> jax.Array:
    """Clamp to [-1, 1], scale to [0, levels-1], round, +2 special offset."""
    half = (levels - 1) / 2.0
    return (jnp.round(jnp.clip(x, -1.0, 1.0) * half + half) + 2).astype(jnp.int32)


def fsq_dequantize(codes: jax.Array, levels: int) -> jax.Array:
    """Inverse of :func:`fsq_quantize` (codes include the +2 offset)."""
    c = jnp.clip(codes - 2, 0, levels - 1).astype(jnp.float32)
    return c * (2.0 / (levels - 1)) - 1.0


# ---------------------------------------------------------------------------
# Codec decoder


def alibi_slopes(n_heads: int) -> jnp.ndarray:
    return 2.0 ** (-8.0 / n_heads * (jnp.arange(n_heads, dtype=jnp.float32) + 1))


def alibi_sliding_bias(seq_len: int, window: int, slopes: jax.Array) -> jax.Array:
    """``[H, T, T]`` additive bias: causal + sliding window + per-head linear
    distance penalty ``slope * (j - i)`` (codec.rs:103-129)."""
    i = jnp.arange(seq_len)[:, None]
    j = jnp.arange(seq_len)[None, :]
    blocked = j > i
    if window > 0:
        blocked = blocked | (j <= i - window)
    dist = (j - i).astype(jnp.float32)
    bias = slopes[:, None, None] * dist[None]
    return jnp.where(blocked[None], -jnp.inf, bias)


def causal_conv1d_nwc(x: jax.Array, w: jax.Array, b: jax.Array | None, *, stride: int = 1) -> jax.Array:
    """Causal conv with REFLECT left padding of (k - stride) (codec.rs:70-89,
    172-180). x ``[B, T, Cin]``; w ``[k, Cin, Cout]``."""
    k = w.shape[0]
    pad = k - stride
    if pad > 0:
        x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        x, w, (stride,), [(0, 0)], dimension_numbers=("NWC", "WIO", "NWC")
    )
    return y + b if b is not None else y


def causal_conv_transpose1d_nwc(x: jax.Array, w: jax.Array, b: jax.Array | None, *, stride: int) -> jax.Array:
    """Causal transpose conv with right trim of (k - stride) (codec.rs:217-230).
    x ``[B, T, Cin]``; w ``[k, Cin, Cout]`` (already flipped/transposed from
    the PyTorch ``[Cin, Cout, k]`` layout at load time). Output ``[B, T*stride, Cout]``."""
    k = w.shape[0]
    y = jax.lax.conv_general_dilated(
        x, w, (1,), [(k - 1, k - 1)], lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if b is not None:
        y = y + b
    trim = k - stride
    return y[:, : y.shape[1] - trim] if trim > 0 else y


def _codec_layer(p: dict, x: jax.Array, bias: jax.Array, *, cfg: CodecArgs) -> jax.Array:
    """Pre-norm ALiBi attention + LayerScale, pre-norm SwiGLU + LayerScale.
    QK norms apply over the FULL concatenated head width (codec.rs:274-318)."""
    B, T, E = x.shape
    h = rms_norm(x, p["attn_norm"], eps=cfg.norm_eps)
    q = rms_norm(h @ p["wq"], p["q_norm"], eps=cfg.qk_norm_eps)
    k = rms_norm(h @ p["wk"], p["k_norm"], eps=cfg.qk_norm_eps)
    v = h @ p["wv"]
    q = q.reshape(B, T, cfg.n_heads, cfg.head_dim)
    k = k.reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
    v = v.reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
    if cfg.n_heads != cfg.n_kv_heads:
        rep = cfg.n_heads // cfg.n_kv_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    logits = jnp.einsum("bshd,bthd->bhst", q, k) * cfg.head_dim ** -0.5
    logits = logits.astype(jnp.float32) + bias[None]
    attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhst,bthd->bshd", attn, v).reshape(B, T, cfg.n_heads * cfg.head_dim)
    x = x + (o @ p["wo"]) * p["attn_scale"]
    h = rms_norm(x, p["ffn_norm"], eps=cfg.norm_eps)
    ff = (jax.nn.silu(h @ p["w1"]) * (h @ p["w3"])) @ p["w2"]
    return x + ff * p["ffn_scale"]


def codec_embed(cfg: VoxtralConfig, p: dict, codes: jax.Array) -> jax.Array:
    """codes ``[B, T, 37]`` (+2 offset included) -> latents ``[B, T, 292]``:
    semantic VQ lookup concat FSQ dequant."""
    sem_idx = jnp.clip(codes[..., 0] - 2, 0, p["semantic_codebook"].shape[0] - 1)
    sem = p["semantic_codebook"][sem_idx]
    ac = fsq_dequantize(codes[..., 1:], cfg.fsq_levels).astype(sem.dtype)
    return jnp.concatenate([sem, ac], axis=-1)


def codec_decode(cfg: VoxtralConfig, p: dict, codes: jax.Array) -> jax.Array:
    """codes ``[B, n_frames, 37]`` int (with +2 offset) -> PCM ``[B, samples]``."""
    cc = cfg.codec
    x = codec_embed(cfg, p, codes)
    x = causal_conv1d_nwc(x, p["input_conv"]["w"], p["input_conv"]["b"],
                          stride=cc.conv_strides[0])
    slopes = alibi_slopes(cc.n_heads)
    for s, stage in enumerate(p["stages"]):
        bias = alibi_sliding_bias(x.shape[1], cc.window_size(s), slopes)
        for lp in stage["layers"]:
            x = _codec_layer(lp, x, bias, cfg=cc)
        if stage.get("upsample") is not None:
            up = stage["upsample"]
            x = causal_conv_transpose1d_nwc(x, up["w"], up["b"],
                                            stride=cc.conv_strides[s + 1])
    x = causal_conv1d_nwc(x, p["output_conv"]["w"], p["output_conv"]["b"], stride=1)
    B, T, patch = x.shape
    return x.reshape(B, T * patch)


def codec_decode_chunk(cfg: VoxtralConfig, p: dict, chunk_codes: jax.Array, context_frames: int) -> jax.Array:
    """Decode ``[B, ctx + new, 37]`` and trim the context prefix samples."""
    wav = codec_decode(cfg, p, chunk_codes)
    trim = context_frames * cfg.codec.samples_per_frame
    return wav[:, trim:]


def codec_chunked_decode(cfg: VoxtralConfig, p: dict, codes: jax.Array, *, chunk_size: int, left_context: int = 16) -> jax.Array:
    """Streaming decode in overlapping chunks; equals full decode when the
    left context covers the causal receptive field (reference: >= 15)."""
    if chunk_size <= 0:
        return codec_decode(cfg, p, codes)
    n = codes.shape[1]
    parts = []
    pos = 0
    while pos < n:
        end = min(pos + chunk_size, n)
        ctx = min(pos, left_context)
        parts.append(codec_decode_chunk(cfg, p, codes[:, pos - ctx:end], ctx))
        pos = end
    return jnp.concatenate(parts, axis=1)


# ---------------------------------------------------------------------------
# Weight loading / init


def fold_weight_norm(weight_v: np.ndarray, weight_g: np.ndarray) -> np.ndarray:
    """PyTorch weight_norm (dim=0): w = g * v / ||v||, norm over all dims
    except 0 (codec.rs:36-68)."""
    v = np.asarray(weight_v, np.float32)
    g = np.asarray(weight_g, np.float32).reshape(v.shape[0], *([1] * (v.ndim - 1)))
    norm = np.sqrt((v * v).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def init_voxtral_params(cfg: VoxtralConfig, seed: int = 0, dtype=jnp.float32) -> dict:
    """Random init of the full 3-stage stack (tests / scaffolding)."""
    from crane_tpu.models.init import init_params

    key = jax.random.PRNGKey(seed)
    ks = iter(jax.random.split(key, 256))
    ac, cc = cfg.acoustic, cfg.codec

    def lin(i, o, scale=None):
        return (jax.random.normal(next(ks), (i, o)) * (scale or i ** -0.5)).astype(dtype)

    def ac_layer():
        qd, kd = ac.n_heads * ac.head_dim, ac.n_kv_heads * ac.head_dim
        return {
            "wq": lin(ac.dim, qd), "wk": lin(ac.dim, kd), "wv": lin(ac.dim, kd),
            "wo": lin(qd, ac.dim),
            "input_ln": jnp.ones((ac.dim,), dtype), "post_ln": jnp.ones((ac.dim,), dtype),
            "gate": lin(ac.dim, ac.hidden_dim), "up": lin(ac.dim, ac.hidden_dim),
            "down": lin(ac.hidden_dim, ac.dim),
        }

    def codec_layer():
        qd, kd = cc.n_heads * cc.head_dim, cc.n_kv_heads * cc.head_dim
        return {
            "wq": lin(cc.dim, qd), "wk": lin(cc.dim, kd), "wv": lin(cc.dim, kd),
            "wo": lin(qd, cc.dim),
            "q_norm": jnp.ones((qd,), dtype), "k_norm": jnp.ones((kd,), dtype),
            "attn_norm": jnp.ones((cc.dim,), dtype), "ffn_norm": jnp.ones((cc.dim,), dtype),
            "attn_scale": jnp.full((cc.dim,), 0.1, dtype), "ffn_scale": jnp.full((cc.dim,), 0.1, dtype),
            "w1": lin(cc.dim, cc.hidden_dim), "w2": lin(cc.hidden_dim, cc.dim),
            "w3": lin(cc.dim, cc.hidden_dim),
        }

    def conv(k, cin, cout):
        return {
            "w": (jax.random.normal(next(ks), (k, cin, cout)) * (k * cin) ** -0.5).astype(dtype),
            "b": jnp.zeros((cout,), dtype),
        }

    n_stages = len(cc.transformer_lengths)
    stages = []
    for s in range(n_stages):
        stage = {"layers": tuple(codec_layer() for _ in range(cc.transformer_lengths[s]))}
        stage["upsample"] = (
            conv(cc.conv_kernels[s + 1], cc.dim, cc.dim) if s < n_stages - 1 else None
        )
        stages.append(stage)

    sem = cfg.semantic_valid_end
    acsz = cfg.fsq_levels + 2
    table_rows = sem + cfg.n_acoustic * acsz
    embed_dim = cc.semantic_dim + cfg.n_acoustic

    return {
        "llm": init_params(cfg.llm_config(), seed=seed + 1, dtype=dtype),
        "codebook_table": (jax.random.normal(next(ks), (table_rows, cfg.dim)) * 0.02).astype(dtype),
        "acoustic": {
            "layers": tuple(ac_layer() for _ in range(ac.n_layers)),
            "norm": jnp.ones((ac.dim,), dtype),
            "input_proj": lin(cfg.n_acoustic, ac.dim),
            "time_proj": lin(ac.dim, ac.dim),
            "llm_proj": lin(ac.dim, ac.dim),
            "semantic_head": lin(ac.dim, cfg.semantic_padded),
            "acoustic_head": lin(ac.dim, cfg.n_acoustic),
        },
        "codec": {
            "semantic_codebook": (jax.random.normal(next(ks), (cfg.semantic_codebook_size, cc.semantic_dim)) * 0.1).astype(dtype),
            "input_conv": conv(cc.conv_kernels[0], embed_dim, cc.dim),
            "stages": tuple(stages),
            "output_conv": conv(7, cc.dim, cc.patch_size),
        },
    }


def map_voxtral_weights(cfg: VoxtralConfig, sd: dict, dtype=jnp.bfloat16) -> dict:
    """Map a Voxtral safetensors state dict (Mistral-style names,
    modeling.rs:29-80 + codec.rs) to our pytree ([in, out] layout)."""

    def t(name):
        return jnp.asarray(np.asarray(sd[name]).T, dtype)

    def a(name, dt=None):
        return jnp.asarray(np.asarray(sd[name]), dt or dtype)

    llm_layers = []
    for i in range(cfg.n_layers):
        lp = f"layers.{i}."
        llm_layers.append({
            "attn": {
                "wq": t(lp + "attention.wq.weight"),
                "wk": t(lp + "attention.wk.weight"),
                "wv": t(lp + "attention.wv.weight"),
                "wo": t(lp + "attention.wo.weight"),
            },
            "mlp": {
                "gate": t(lp + "feed_forward.w1.weight"),
                "up": t(lp + "feed_forward.w3.weight"),
                "down": t(lp + "feed_forward.w2.weight"),
            },
            "input_ln": a(lp + "attention_norm.weight"),
            "post_ln": a(lp + "ffn_norm.weight"),
        })
    llm = {
        "embed": a("mm_audio_embeddings.tok_embeddings.weight"),
        "layers": tuple(llm_layers),
        "final_norm": a("norm.weight"),
    }

    ap = "acoustic_transformer."
    ac_layers = []
    for i in range(cfg.acoustic.n_layers):
        lp = f"{ap}layers.{i}."
        ac_layers.append({
            "wq": t(lp + "attention.wq.weight"),
            "wk": t(lp + "attention.wk.weight"),
            "wv": t(lp + "attention.wv.weight"),
            "wo": t(lp + "attention.wo.weight"),
            "input_ln": a(lp + "attention_norm.weight"),
            "post_ln": a(lp + "ffn_norm.weight"),
            "gate": t(lp + "feed_forward.w1.weight"),
            "up": t(lp + "feed_forward.w3.weight"),
            "down": t(lp + "feed_forward.w2.weight"),
        })
    acoustic = {
        "layers": tuple(ac_layers),
        "norm": a(ap + "norm.weight"),
        "input_proj": t(ap + "input_projection.weight"),
        "time_proj": t(ap + "time_projection.weight"),
        "llm_proj": t(ap + "llm_projection.weight"),
        "semantic_head": t(ap + "semantic_codebook_output.weight"),
        "acoustic_head": t(ap + "acoustic_codebook_output.weight"),
    }

    tp = "audio_tokenizer."

    def wn_conv(prefix):
        w = fold_weight_norm(
            np.asarray(sd[prefix + ".conv.parametrizations.weight.original1"]),
            np.asarray(sd[prefix + ".conv.parametrizations.weight.original0"]),
        )  # torch conv1d [out, in, k] -> [k, in, out]
        b = sd.get(prefix + ".conv.bias")
        return {
            "w": jnp.asarray(w.transpose(2, 1, 0), dtype),
            "b": jnp.asarray(np.asarray(b), dtype) if b is not None else None,
        }

    def wn_convT(prefix):
        w = fold_weight_norm(
            np.asarray(sd[prefix + ".conv.parametrizations.weight.original1"]),
            np.asarray(sd[prefix + ".conv.parametrizations.weight.original0"]),
        )  # torch convT [in, out, k] -> flipped [k, in, out] for lhs-dilated conv
        b = sd.get(prefix + ".conv.bias")
        return {
            "w": jnp.asarray(w.transpose(2, 0, 1)[::-1].copy(), dtype),
            "b": jnp.asarray(np.asarray(b), dtype) if b is not None else None,
        }

    def codec_layer(prefix):
        return {
            "wq": t(prefix + "attention.wq.weight"),
            "wk": t(prefix + "attention.wk.weight"),
            "wv": t(prefix + "attention.wv.weight"),
            "wo": t(prefix + "attention.wo.weight"),
            "q_norm": a(prefix + "attention.q_norm.weight"),
            "k_norm": a(prefix + "attention.k_norm.weight"),
            "attn_norm": a(prefix + "attention_norm.weight"),
            "ffn_norm": a(prefix + "ffn_norm.weight"),
            "attn_scale": a(prefix + "attention_scale"),
            "ffn_scale": a(prefix + "ffn_scale"),
            "w1": t(prefix + "feed_forward.w1.weight"),
            "w2": t(prefix + "feed_forward.w2.weight"),
            "w3": t(prefix + "feed_forward.w3.weight"),
        }

    cc = cfg.codec
    emb_sum = np.asarray(sd[tp + "quantizer.semantic_codebook.embedding_sum"], np.float32)
    usage = np.asarray(sd[tp + "quantizer.semantic_codebook.cluster_usage"], np.float32)
    semantic_codebook = emb_sum / np.clip(usage, 1e-5, None)[:, None]

    n_stages = len(cc.transformer_lengths)
    stages = []
    block_idx = 1
    for s in range(n_stages):
        layers = tuple(
            codec_layer(f"{tp}decoder_blocks.{block_idx}.layers.{l}.")
            for l in range(cc.transformer_lengths[s])
        )
        block_idx += 1
        upsample = None
        if s < n_stages - 1:
            upsample = wn_convT(f"{tp}decoder_blocks.{block_idx}")
            block_idx += 1
        stages.append({"layers": layers, "upsample": upsample})

    codec = {
        "semantic_codebook": jnp.asarray(semantic_codebook, dtype),
        "input_conv": wn_conv(tp + "decoder_blocks.0"),
        "stages": tuple(stages),
        "output_conv": wn_conv(tp + "output_proj"),
    }
    table = a("mm_audio_embeddings.audio_codebook_embeddings.embeddings.weight")
    return {"llm": llm, "codebook_table": table, "acoustic": acoustic, "codec": codec}


# ---------------------------------------------------------------------------
# Generation


def build_prompt_segments(text_token_ids: list) -> list:
    """``[BOS, BEGIN_AUDIO, 'voice', INST_END, text..., INST, BEGIN_AUDIO]``
    (reference model.rs:231-244). 'voice' marks where voice embeddings splice."""
    return [BOS, BEGIN_AUDIO, "voice", INST_END, *[int(t) for t in text_token_ids], INST, BEGIN_AUDIO]


class VoxtralTts:
    """End-to-end Voxtral TTS: prompt -> AR semantic frames + flow-matched
    acoustic codes -> codec PCM."""

    def __init__(self, cfg: VoxtralConfig, params: dict, voices: dict | None = None,
                 max_seq: int = 1024):
        self.cfg = cfg
        self.params = params
        self.voices = voices or {}
        self.max_seq = max_seq
        self.tokenizer = None  # Tekkenizer, set by load_voxtral_tts
        self.llm_cfg = cfg.llm_config()
        self.rope = make_rope_tables(self.llm_cfg)
        self.offsets = codebook_offsets(cfg)
        dtype = params["codebook_table"].dtype
        self.dtype = dtype

        llm_cfg, rope = self.llm_cfg, self.rope

        @jax.jit
        def prefill(params, embeds, cache):
            ids = jnp.zeros(embeds.shape[:2], jnp.int32)
            hidden, cache = forward_hidden(
                llm_cfg, params["llm"], ids, cache, jnp.asarray(0, jnp.int32),
                rope, inputs_embeds=embeds,
            )
            return hidden[:, -1, :], cache

        @jax.jit
        def frame_step(params, h, noise):
            sem_logits = predict_semantic_logits(cfg, params["acoustic"], h)
            sem = jnp.argmax(sem_logits).astype(jnp.int32)
            ac_codes = flow_match(cfg, params["acoustic"], h, noise)
            codes = jnp.concatenate([sem[None], ac_codes])
            emb = embed_frame_codes(params["codebook_table"], self.offsets, codes)
            return sem, codes, emb

        @jax.jit
        def decode_step(params, emb, cache, pos):
            ids = jnp.zeros((1, 1), jnp.int32)
            hidden, cache = forward_hidden(
                llm_cfg, params["llm"], ids, cache, pos, rope,
                inputs_embeds=emb[None, None, :],
            )
            return hidden[:, -1, :], cache

        self._prefill = prefill
        self._frame_step = frame_step
        self._decode_step = decode_step
        self._codec_decode = jax.jit(lambda p, c: codec_decode(cfg, p, c))

    def _prompt_embeds(self, text_ids: list, voice_embed: np.ndarray | None) -> jax.Array:
        embed = self.params["llm"]["embed"]
        parts = []
        for seg in build_prompt_segments(text_ids):
            if seg == "voice":
                if voice_embed is not None:
                    parts.append(jnp.asarray(voice_embed, self.dtype))
            else:
                parts.append(embed[jnp.asarray([seg])])
        return jnp.concatenate(parts, axis=0)[None]

    def generate(self, text_ids: list, *, voice: str | None = None,
                 max_frames: int = 64, seed: int = 0) -> tuple[np.ndarray, int]:
        """Text token ids (no BOS/EOS) -> (waveform [n_samples], sample_rate).

        Greedy semantic decoding; stops at END_AUDIO_CODE. Flow-matching noise
        is drawn per frame from ``seed``."""
        if voice is not None:
            if voice not in self.voices:
                raise KeyError(f"unknown voice {voice!r}; available: {sorted(self.voices)}")
            voice_embed = self.voices[voice]
        else:
            voice_embed = next(iter(self.voices.values())) if self.voices else None
        embeds = self._prompt_embeds(text_ids, voice_embed)
        cache = make_cache(self.llm_cfg, 1, self.max_seq, dtype=self.dtype)
        h, cache = self._prefill(self.params, embeds, cache)
        prompt_len = embeds.shape[1]

        key = jax.random.PRNGKey(seed)
        frames = []
        for i in range(max_frames):
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, (self.cfg.n_acoustic,), self.dtype)
            sem, codes, emb = self._frame_step(self.params, h[0], noise)
            if int(sem) == END_AUDIO_CODE:
                break
            frames.append(np.asarray(codes))
            if i + 1 < max_frames:
                pos = jnp.asarray([prompt_len + i], jnp.int32)
                h, cache = self._decode_step(self.params, emb, cache, pos)
        if not frames:
            return np.zeros((0,), np.float32), self.cfg.sample_rate
        codes = jnp.asarray(np.stack(frames))[None]  # [1, n_frames, 37]
        wav = self._codec_decode(self.params["codec"], codes)
        return np.asarray(wav[0], np.float32), self.cfg.sample_rate

    def generate_speech(self, text: str, *, voice: str | None = None,
                        max_frames: int = 250, seed: int = 0):
        """Text -> (waveform, sample_rate) via the attached Tekken tokenizer
        (text is encoded WITHOUT BOS/EOS — build_prompt_segments adds the
        prompt specials, reference model.rs:228-244)."""
        if self.tokenizer is None:
            raise ValueError("no tokenizer attached (load via load_voxtral_tts)")
        return self.generate(self.tokenizer.encode(text), voice=voice,
                             max_frames=max_frames, seed=seed)


# ── checkpoint loading ───────────────────────────────────────────────────────


def config_from_params_json(raw: dict) -> VoxtralConfig:
    """Parse the released checkpoint's ``params.json`` (reference
    model.rs:45-185: top-level dims + ``multimodal.audio_model_args`` +
    ``multimodal.audio_tokenizer_args`` with comma-separated stage lists)."""
    mm = raw.get("multimodal", {})
    am = mm.get("audio_model_args", {})
    at = mm.get("audio_tokenizer_args", {})
    ac = am.get("acoustic_transformer_args", {})

    def csv(v, default):
        if v is None:
            return tuple(default)
        if isinstance(v, str):
            return tuple(int(x) for x in v.split(","))
        return tuple(int(x) for x in v)

    d = AcousticArgs()
    acoustic = AcousticArgs(
        dim=ac.get("dim", d.dim), n_layers=ac.get("n_layers", d.n_layers),
        n_heads=ac.get("n_heads", d.n_heads),
        n_kv_heads=ac.get("n_kv_heads", d.n_kv_heads),
        head_dim=ac.get("head_dim", d.head_dim),
        hidden_dim=ac.get("hidden_dim", d.hidden_dim),
    )
    c = CodecArgs()
    codec = CodecArgs(
        dim=at.get("dim", c.dim), hidden_dim=at.get("hidden_dim", c.hidden_dim),
        n_heads=at.get("n_heads", c.n_heads),
        n_kv_heads=at.get("n_kv_heads", c.n_kv_heads),
        head_dim=at.get("head_dim", c.head_dim),
        qk_norm_eps=at.get("qk_norm_eps", c.qk_norm_eps),
        norm_eps=at.get("norm_eps", c.norm_eps),
        semantic_dim=at.get("semantic_dim", c.semantic_dim),
        patch_size=at.get("pretransform_patch_size", c.patch_size),
        transformer_lengths=csv(
            at.get("decoder_transformer_lengths_str"), c.transformer_lengths
        ),
        conv_kernels=csv(at.get("decoder_convs_kernels_str"), c.conv_kernels),
        conv_strides=csv(at.get("decoder_convs_strides_str"), c.conv_strides),
    )
    v = VoxtralConfig()
    return VoxtralConfig(
        dim=raw.get("dim", v.dim), n_layers=raw.get("n_layers", v.n_layers),
        n_heads=raw.get("n_heads", v.n_heads),
        n_kv_heads=raw.get("n_kv_heads", v.n_kv_heads),
        head_dim=raw.get("head_dim", v.head_dim),
        hidden_dim=raw.get("hidden_dim", v.hidden_dim),
        vocab_size=raw.get("vocab_size", v.vocab_size),
        rope_theta=raw.get("rope_theta", v.rope_theta),
        norm_eps=raw.get("norm_eps", v.norm_eps),
        max_seq_len=min(raw.get("max_seq_len", v.max_seq_len), 65536),
        semantic_codebook_size=am.get(
            "semantic_codebook_size", v.semantic_codebook_size
        ),
        n_acoustic=am.get("n_acoustic_codebook", v.n_acoustic),
        fsq_levels=am.get("acoustic_codebook_size", v.fsq_levels),
        sample_rate=at.get("sampling_rate", v.sample_rate),
        acoustic=acoustic, codec=codec,
    )


def load_voice_embedding(path: str) -> np.ndarray:
    """Pre-computed voice embedding ``.pt`` -> ``[N, dim]`` f32. The file is
    a torch ZIP whose single entry is a raw bf16 ``[N, 3072]`` tensor
    (reference model.rs:249-312 reads the raw buffer the same way; we also
    accept a plain ``.npy``)."""
    if path.endswith(".npy"):
        return np.load(path)
    import zipfile

    with zipfile.ZipFile(path) as z:
        names = z.namelist()
        entry = next(
            (n for n in ("voice_embed/data/0", "archive/data/0", "data/0")
             if n in names),
            None,
        )
        if entry is None:  # any */data/N tensor payload
            cands = [n for n in names if "/data/" in n and not n.endswith("/")]
            if not cands:
                raise ValueError(f"no tensor data entry in {path}: {names}")
            entry = cands[0]
        raw = z.read(entry)
    dim = 3072  # codec-encoder output width (reference model.rs:249-252)
    if len(raw) % (dim * 2):
        raise ValueError(f"{path}: {len(raw)} bytes is not [N, {dim}] bf16")
    u16 = np.frombuffer(raw, np.uint16).reshape(-1, dim)
    return (u16.astype(np.uint32) << 16).view(np.float32)


def load_voxtral_tts(model_dir: str, *, dtype=jnp.bfloat16):
    """Load a released Voxtral TTS checkpoint directory (reference
    model.rs:353-417): ``params.json`` + ``tekken.json`` +
    ``consolidated.safetensors`` + ``voice_embedding/*.pt``. Returns
    ``(VoxtralTts, Tekkenizer | None)``; the model also keeps the tokenizer
    at ``.tokenizer``."""
    import glob
    import json
    import os

    from crane_tpu.loaders.safetensors_loader import load_state_dict

    cfg_path = os.path.join(model_dir, "params.json")
    cfg = VoxtralConfig()
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = config_from_params_json(json.load(f))
    params = map_voxtral_weights(cfg, load_state_dict(model_dir), dtype)

    voices = {}
    for pat in ("voice_embedding/*.pt", "voice_embedding/*.npy", "voices/*.npy"):
        for p in glob.glob(os.path.join(model_dir, pat)):
            name = os.path.splitext(os.path.basename(p))[0]
            voices.setdefault(name, load_voice_embedding(p))

    tok = None
    tekken_path = os.path.join(model_dir, "tekken.json")
    if os.path.exists(tekken_path):
        from crane_tpu.tokenizer.tekken import Tekkenizer

        tok = Tekkenizer.from_file(tekken_path)

    model = VoxtralTts(cfg, params, voices=voices, max_seq=1024)
    model.tokenizer = tok
    return model, tok
