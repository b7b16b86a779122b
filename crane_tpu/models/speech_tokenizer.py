"""Qwen3-TTS speech tokenizer v2: 16-codebook RVQGAN decoder (+ chunked decode).

Reference behavior (/root/reference/crane-core/src/models/qwen3_tts/
speech_tokenizer_v2.rs): codes ``[B, 16, T]`` -> split residual VQ decode
(semantic codebook 0 via rvq_first, acoustic 1..15 via rvq_rest, summed)
-> causal pre_conv (k=3) -> 8-layer sliding-window(72) RoPE transformer with
LayerScale + SwiGLU (:406-483) -> two x2 upsample stages (causal transposed
conv + ConvNeXt block, :536-575, :666-698) -> decoder tail: conv(7) -> four
DecoderBlocks (SnakeBeta + transposed conv x[8,5,4,3] + 3 dilated residual
units, :605-664) -> SnakeBeta -> conv(7) -> clamp(-1, 1). total_upsample =
2*2*8*5*4*3 = 1920 -> 24 kHz at 12.5 Hz frames. ``chunked_decode`` decodes
overlapping chunks with ``left_context`` frames of warm-up that get trimmed
(:1650-1698) — the streaming TTS building block.

All compute is f32 (the reference forces F32: SnakeBeta's exp/sin/sqr chain
is precision-sensitive, :1475-1481). Weight layout matches the released
``speech_tokenizer/`` safetensors (prefix ``decoder.``).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SpeechDecoderConfig:
    codebook_size: int = 2048
    hidden_size: int = 1024
    latent_dim: int = 1024
    codebook_dim: int = 1024
    num_attention_heads: int = 16
    num_key_value_heads: int = 16
    head_dim: int = 64
    sliding_window: int = 72
    intermediate_size: int = 3072
    rms_norm_eps: float = 1e-5
    num_hidden_layers: int = 8
    num_quantizers: int = 16
    upsample_rates: tuple = (8, 5, 4, 3)
    upsampling_ratios: tuple = (2, 2)
    decoder_dim: int = 1536
    rope_theta: float = 10000.0
    output_sample_rate: int = 24000

    @property
    def total_upsample(self) -> int:
        n = 1
        for r in tuple(self.upsample_rates) + tuple(self.upsampling_ratios):
            n *= r
        return n


# ── primitive layers (all [B, C, T] f32) ─────────────────────────────────


def causal_conv(x, w, b, *, stride=1, dilation=1, groups=1, pad_mode="zero"):
    """Reference CausalConvNet (:484-533): left pad (K_eff - stride), plus
    right pad to the ideal frame count. ``pad_mode="replicate"`` edge-pads
    instead (the Mimi encoder's frame-rate downsample conv)."""
    K = w.shape[-1]
    eff = (K - 1) * dilation + 1
    pad = max(eff - stride, 0)
    L = x.shape[-1]
    n_frames = (L - eff + pad) / stride + 1.0
    ideal = (int(np.ceil(n_frames)) - 1) * stride + (eff - pad)
    extra = max(ideal - L, 0)
    mode = "edge" if pad_mode == "replicate" else "constant"
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, extra)), mode=mode)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding="VALID",
        rhs_dilation=(dilation,), feature_group_count=groups,
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if b is not None:
        y = y + b[None, :, None]
    return y


def causal_trans_conv(x, w, b, *, stride):
    """Reference CausalTransConvNet (:536-575): torch ConvTranspose1d
    (weight ``[Cin, Cout, K]``, padding=0) as an lhs-dilated conv with the
    flipped kernel (torch-parity formulation), then trim (K - stride) from
    the right."""
    K = w.shape[-1]
    rhs = jnp.flip(w, axis=-1).transpose(1, 0, 2)  # -> [Cout, Cin, K] (OIH)
    y = jax.lax.conv_general_dilated(
        x, rhs, window_strides=(1,), padding=[(K - 1, K - 1)],
        lhs_dilation=(stride,), dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if b is not None:
        y = y + b[None, :, None]
    trim = max(K - stride, 0)
    return y[..., : y.shape[-1] - trim] if trim else y


def snake_beta(p, x):
    """x + sin^2(alpha*x) / (beta + eps), alpha/beta stored in log space."""
    a = jnp.exp(p["alpha"])[None, :, None]
    b = jnp.exp(p["beta"])[None, :, None]
    return x + (1.0 / (b + 1e-9)) * jnp.sin(a * x) ** 2


def _rms(x, w, eps):
    v = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(v + eps)) * w


def _rope_halfsplit(x, cos, sin):
    """[B, T, H, D] half-split rope."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def tokenizer_transformer(cfg: SpeechDecoderConfig, p: dict, x: jax.Array) -> jax.Array:
    """x ``[B, T, latent]`` -> ``[B, T, latent]``: input_proj -> 8 layers
    (RMS pre-norms, sliding-window causal RoPE attention, LayerScale,
    SwiGLU) -> norm -> output_proj."""
    B, T, _ = x.shape
    H, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    h = x @ p["input_proj_w"] + p["input_proj_b"]

    pos = jnp.arange(T, dtype=jnp.float32)
    inv = 1.0 / (cfg.rope_theta ** (jnp.arange(0, D, 2, dtype=jnp.float32) / D))
    freqs = jnp.outer(pos, inv)
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)

    ti = jnp.arange(T)
    mask = (ti[None, :] <= ti[:, None]) & (ti[:, None] - ti[None, :] < cfg.sliding_window)

    for layer in p["layers"]:
        r = h
        n = _rms(h, layer["input_ln"], cfg.rms_norm_eps)
        q = (n @ layer["wq"]).reshape(B, T, H, D)
        k = (n @ layer["wk"]).reshape(B, T, Hkv, D)
        v = (n @ layer["wv"]).reshape(B, T, Hkv, D)
        q = _rope_halfsplit(q, cos, sin)
        k = _rope_halfsplit(k, cos, sin)
        G = H // Hkv
        qg = q.reshape(B, T, Hkv, G, D)
        s = jnp.einsum("bqkgd,btkd->bkgqt", qg, k, preferred_element_type=jnp.float32)
        s = s * (D ** -0.5)
        s = jnp.where(mask[None, None, None], s, -1e30)
        a = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bkgqt,btkd->bqkgd", a, v).reshape(B, T, H * D)
        h = r + (o @ layer["wo"]) * layer["attn_scale"]
        r = h
        n = _rms(h, layer["post_ln"], cfg.rms_norm_eps)
        m = (jax.nn.silu(n @ layer["gate"]) * (n @ layer["up"])) @ layer["down"]
        h = r + m * layer["mlp_scale"]

    h = _rms(h, p["norm"], cfg.rms_norm_eps)
    return h @ p["output_proj_w"] + p["output_proj_b"]


def convnext_block(p, x):
    """ConvNeXt block on [B, C, T] (:666-698)."""
    r = x
    h = causal_conv(x, p["dw_w"], p["dw_b"], groups=x.shape[1])
    h = h.transpose(0, 2, 1)  # [B, T, C]
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.var(h, axis=-1, keepdims=True)
    h = (h - mu) * jax.lax.rsqrt(var + 1e-6) * p["ln_w"] + p["ln_b"]
    h = jax.nn.gelu(h @ p["pw1_w"] + p["pw1_b"], approximate=False)
    h = h @ p["pw2_w"] + p["pw2_b"]
    h = h * p["gamma"]
    return r + h.transpose(0, 2, 1)


def residual_unit(p, x, *, dilation):
    h = snake_beta(p["act1"], x)
    h = causal_conv(h, p["conv1_w"], p["conv1_b"], dilation=dilation)
    h = snake_beta(p["act2"], h)
    h = causal_conv(h, p["conv2_w"], p["conv2_b"])
    return x + h


def decoder_block(p, x, *, up):
    h = snake_beta(p["first_act"], x)
    h = causal_trans_conv(h, p["up_w"], p["up_b"], stride=up)
    for unit, dil in zip(p["units"], (1, 3, 9)):
        h = residual_unit(unit, h, dilation=dil)
    return h


def rvq_decode(cfg: SpeechDecoderConfig, p: dict, codes: jax.Array) -> jax.Array:
    """codes ``[B, K, T]`` int32 -> latent ``[B, codebook_dim, T]`` via the
    split RVQ: codebook 0 through rvq_first, 1..K-1 through rvq_rest, sum."""
    def rvq(branch, sub):  # sub: [B, k, T]
        acc = None
        for i in range(sub.shape[1]):
            emb = branch["embeddings"][i]  # [bins, dim] (already usage-normalized at load)
            q = emb[sub[:, i]]  # [B, T, dim]
            acc = q if acc is None else acc + q
        y = acc @ branch["out_proj"]  # [B, T, codebook_dim]
        return y

    first = rvq(p["rvq_first"], codes[:, :1])
    if codes.shape[1] > 1:
        first = first + rvq(p["rvq_rest"], codes[:, 1:])
    return first.transpose(0, 2, 1)


@functools.partial(jax.jit, static_argnums=(0,))
def decode_frames(cfg: SpeechDecoderConfig, p: dict, codes: jax.Array) -> jax.Array:
    """codes ``[B, num_quantizers, T]`` -> audio ``[B, 1, T * 1920]`` f32."""
    h = rvq_decode(cfg, p, codes)
    h = causal_conv(h, p["pre_conv_w"], p["pre_conv_b"])
    h = tokenizer_transformer(cfg, p["pre_transformer"], h.transpose(0, 2, 1)).transpose(0, 2, 1)
    for stage, ratio in zip(p["upsample"], cfg.upsampling_ratios):
        h = causal_trans_conv(h, stage["up_w"], stage["up_b"], stride=ratio)
        h = convnext_block(stage["convnext"], h)
    h = causal_conv(h, p["head_conv_w"], p["head_conv_b"])
    for block, up in zip(p["blocks"], cfg.upsample_rates):
        h = decoder_block(block, h, up=up)
    h = snake_beta(p["final_act"], h)
    h = causal_conv(h, p["out_conv_w"], p["out_conv_b"])
    return jnp.clip(h, -1.0, 1.0)


class SpeechTokenizerDecoder:
    """Codes -> 24 kHz waveform, with reference-parity chunked decoding."""

    def __init__(self, config: SpeechDecoderConfig, params: dict):
        self.config = config
        self.params = params

    @property
    def sample_rate(self) -> int:
        return self.config.output_sample_rate

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """codes ``[B, T, K]`` (frame-major, talker output order) -> audio
        ``[B, samples]``."""
        c = jnp.asarray(np.asarray(codes), jnp.int32).transpose(0, 2, 1)
        return np.asarray(decode_frames(self.config, self.params, c))[:, 0, :]

    def decode_chunk(self, chunk_codes: np.ndarray, context_frames: int) -> np.ndarray:
        """One streaming chunk ``[B, ctx+new, K]``: decode, trim the warm-up
        context audio, return only the new frames' audio
        (reference :1682-1698)."""
        audio = self.decode(chunk_codes)
        return audio[:, context_frames * self.config.total_upsample :]

    def chunked_decode(
        self, codes: np.ndarray, chunk_size: int = 300, left_context: int = 25
    ) -> np.ndarray:
        """Reference chunked_decode(:1650-1680): decode ``chunk_size``-frame
        windows with ``left_context`` frames of overlap, trim the context."""
        codes = np.asarray(codes)
        B, T, _ = codes.shape
        out = []
        start = 0
        while start < T:
            ctx = min(left_context, start)
            end = min(start + chunk_size, T)
            out.append(self.decode_chunk(codes[:, start - ctx : end], ctx))
            start = end
        return np.concatenate(out, axis=1)


def map_decoder_weights(cfg: SpeechDecoderConfig, sd: dict, prefix: str = "decoder.") -> dict:
    """Map the released speech-tokenizer safetensors (``decoder.*``) to the
    params tree. Codebooks are usage-normalized at load
    (embedding_sum / clamp(cluster_usage), :700-736)."""
    g = lambda n: np.asarray(sd[prefix + n], np.float32)

    def rvq(name, n_q):
        embs = []
        for i in range(n_q):
            s = g(f"quantizer.{name}.vq.layers.{i}._codebook.embedding_sum")
            key = f"{prefix}quantizer.{name}.vq.layers.{i}._codebook.cluster_usage"
            usage = np.asarray(sd[key], np.float32) if key in sd else np.ones(s.shape[0], np.float32)
            embs.append(jnp.asarray(s / np.clip(usage, 1e-5, None)[:, None]))
        w = g(f"quantizer.{name}.output_proj.weight")
        if w.ndim == 3:
            w = w[:, :, 0]
        return {"embeddings": embs, "out_proj": jnp.asarray(w.T)}

    def conv(n):
        b = f"{prefix}{n}.conv.bias"
        return (
            jnp.asarray(g(n + ".conv.weight")),
            jnp.asarray(np.asarray(sd[b], np.float32)) if b in sd else None,
        )

    def snake(n):
        return {"alpha": jnp.asarray(g(n + ".alpha")), "beta": jnp.asarray(g(n + ".beta"))}

    def res_unit(n):
        c1w, c1b = conv(n + ".conv1")
        c2w, c2b = conv(n + ".conv2")
        return {
            "act1": snake(n + ".act1"), "conv1_w": c1w, "conv1_b": c1b,
            "act2": snake(n + ".act2"), "conv2_w": c2w, "conv2_b": c2b,
        }

    layers = []
    for i in range(cfg.num_hidden_layers):
        L = f"pre_transformer.layers.{i}."
        t = lambda n: jnp.asarray(g(L + n).T)
        layers.append({
            "wq": t("self_attn.q_proj.weight"), "wk": t("self_attn.k_proj.weight"),
            "wv": t("self_attn.v_proj.weight"), "wo": t("self_attn.o_proj.weight"),
            "input_ln": jnp.asarray(g(L + "input_layernorm.weight")),
            "post_ln": jnp.asarray(g(L + "post_attention_layernorm.weight")),
            "attn_scale": jnp.asarray(g(L + "self_attn_layer_scale.scale")),
            "mlp_scale": jnp.asarray(g(L + "mlp_layer_scale.scale")),
            "gate": t("mlp.gate_proj.weight"), "up": t("mlp.up_proj.weight"),
            "down": t("mlp.down_proj.weight"),
        })
    pre_transformer = {
        "input_proj_w": jnp.asarray(g("pre_transformer.input_proj.weight").T),
        "input_proj_b": jnp.asarray(g("pre_transformer.input_proj.bias")),
        "output_proj_w": jnp.asarray(g("pre_transformer.output_proj.weight").T),
        "output_proj_b": jnp.asarray(g("pre_transformer.output_proj.bias")),
        "norm": jnp.asarray(g("pre_transformer.norm.weight")),
        "layers": layers,
    }

    upsample = []
    for i in range(len(cfg.upsampling_ratios)):
        uw, ub = conv(f"upsample.{i}.0")
        n = f"upsample.{i}.1"
        dw, db = conv(n + ".dwconv")
        upsample.append({
            "up_w": uw, "up_b": ub,
            "convnext": {
                "dw_w": dw, "dw_b": db,
                "ln_w": jnp.asarray(g(n + ".norm.weight")),
                "ln_b": jnp.asarray(g(n + ".norm.bias")),
                "pw1_w": jnp.asarray(g(n + ".pwconv1.weight").T),
                "pw1_b": jnp.asarray(g(n + ".pwconv1.bias")),
                "pw2_w": jnp.asarray(g(n + ".pwconv2.weight").T),
                "pw2_b": jnp.asarray(g(n + ".pwconv2.bias")),
                "gamma": jnp.asarray(g(n + ".gamma")),
            },
        })

    blocks = []
    for i in range(len(cfg.upsample_rates)):
        n = f"decoder.{i + 1}.block"
        uw, ub = conv(n + ".1")
        blocks.append({
            "first_act": snake(n + ".0"),
            "up_w": uw, "up_b": ub,
            "units": [res_unit(f"{n}.{j}") for j in (2, 3, 4)],
        })

    pc_w, pc_b = conv("pre_conv")
    h_w, h_b = conv("decoder.0")
    n_blocks = len(cfg.upsample_rates)
    o_w, o_b = conv(f"decoder.{n_blocks + 2}")
    return {
        "rvq_first": rvq("rvq_first", 1),
        "rvq_rest": rvq("rvq_rest", cfg.num_quantizers - 1),
        "pre_conv_w": pc_w, "pre_conv_b": pc_b,
        "pre_transformer": pre_transformer,
        "upsample": upsample,
        "head_conv_w": h_w, "head_conv_b": h_b,
        "blocks": blocks,
        "final_act": snake(f"decoder.{n_blocks + 1}"),
        "out_conv_w": o_w, "out_conv_b": o_b,
    }


def load_speech_tokenizer(model_dir: str) -> SpeechTokenizerDecoder:
    """Load from a released ``speech_tokenizer/`` directory (config.json with
    decoder_config + safetensors with ``decoder.*`` tensors)."""
    import json
    import os

    from crane_tpu.loaders.safetensors_loader import load_state_dict

    with open(os.path.join(model_dir, "config.json")) as f:
        raw = json.load(f)
    dc = raw.get("decoder_config", raw)
    cfg = SpeechDecoderConfig(
        codebook_size=dc.get("codebook_size", 2048),
        hidden_size=dc.get("hidden_size", 1024),
        latent_dim=dc.get("latent_dim", 1024),
        codebook_dim=dc.get("codebook_dim", 1024),
        num_attention_heads=dc.get("num_attention_heads", 16),
        num_key_value_heads=dc.get("num_key_value_heads", 16),
        head_dim=dc.get("head_dim", 64),
        sliding_window=dc.get("sliding_window", 72),
        intermediate_size=dc.get("intermediate_size", 3072),
        rms_norm_eps=dc.get("rms_norm_eps", 1e-5),
        num_hidden_layers=dc.get("num_hidden_layers", 8),
        num_quantizers=dc.get("num_quantizers", 16),
        upsample_rates=tuple(dc.get("upsample_rates", (8, 5, 4, 3))),
        upsampling_ratios=tuple(dc.get("upsampling_ratios", (2, 2))),
        decoder_dim=dc.get("decoder_dim", 1536),
        rope_theta=dc.get("rope_theta", 10000.0),
        output_sample_rate=raw.get("output_sample_rate", 24000),
    )
    sd = load_state_dict(model_dir)
    return SpeechTokenizerDecoder(cfg, map_decoder_weights(cfg, sd))


# ── Mimi-style encoder (reference audio -> codec codes, voice clone) ───────
#
# Reference: speech_tokenizer_v2.rs — the model ships an encoder under the
# ``encoder.*`` prefix of the same speech_tokenizer safetensors; the reference
# PREFERS its HF-Mimi-semantics path (HfMimiEncoder, :1382-1472, "mirrors the
# vendor qwen3-tts-rs-3 encoder") over its own conv-then-elu variant, so the
# behavior spec here is the HF Mimi encoder: SEANet tower (ELU *before* each
# conv in residual blocks) -> x2 conv downsample -> 8-layer LayerNorm/GELU
# sliding-window transformer with LayerScale -> split residual VQ
# (1 semantic + N acoustic codebooks, nearest-neighbor on usage-normalized
# codebooks), trimmed to ``valid_num_quantizers`` (:1324-1364, 1449-1472).


@dataclasses.dataclass(frozen=True)
class SpeechEncoderConfig:
    """Reference EncoderConfig defaults (speech_tokenizer_v2.rs:77-185)."""

    num_filters: int = 64
    hidden_size: int = 512
    intermediate_size: int = 2048
    num_hidden_layers: int = 8
    num_attention_heads: int = 8
    num_key_value_heads: int = 8
    head_dim: int = 64
    kernel_size: int = 7
    last_kernel_size: int = 3
    residual_kernel_size: int = 3
    num_residual_layers: int = 1
    dilation_growth_rate: int = 2
    compress: int = 2
    # decoder-order ratios; the encoder strides are these reversed
    upsampling_ratios: tuple = (8, 6, 5, 4)
    codebook_size: int = 2048
    codebook_dim: int = 256
    num_quantizers: int = 32
    num_semantic_quantizers: int = 1
    norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    sliding_window: int = 250
    vector_quantization_hidden_dimension: int = 256
    valid_num_quantizers: int = 16
    input_sample_rate: int = 24000

    @property
    def encoder_strides(self) -> tuple:
        return tuple(reversed(self.upsampling_ratios))


def encoder_seanet(cfg: SpeechEncoderConfig, p: dict, audio: jax.Array) -> jax.Array:
    """audio ``[B, 1, N]`` f32 -> latent ``[B, hidden, T]`` at 12.5 Hz:
    SEANet downsampling tower then the x2 frame-rate conv (HF Mimi order —
    ELU before residual convs and before every downsample/last conv)."""
    h = causal_conv(audio, p["first_w"], p["first_b"])
    for block, stride in zip(p["blocks"], cfg.encoder_strides):
        for j, unit in enumerate(block["units"]):
            r = h
            u = causal_conv(jax.nn.elu(h), unit["conv1_w"], unit["conv1_b"],
                            dilation=cfg.dilation_growth_rate ** j)
            u = causal_conv(jax.nn.elu(u), unit["conv2_w"], unit["conv2_b"])
            h = r + u
        h = causal_conv(jax.nn.elu(h), block["down_w"], block["down_b"], stride=stride)
    h = causal_conv(jax.nn.elu(h), p["last_w"], p["last_b"])
    # ConvDownsample1d(compress=2): k=4, stride=2, no bias, REPLICATE padding
    # (:1294-1298; HF MimiModel passes pad_mode="replicate" here)
    return causal_conv(h, p["downsample_w"], None, stride=2, pad_mode="replicate")


def _layer_norm(x, w, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def encoder_transformer(cfg: SpeechEncoderConfig, layers: list, x: jax.Array) -> jax.Array:
    """x ``[B, T, D]`` -> ``[B, T, D]``: LayerNorm pre-norms, sliding-window
    causal RoPE attention, LayerScale, GELU MLP (fc1/fc2) — the encoder
    transformer (:980-1058); projections are identity (dim == d_model)."""
    B, T, D = x.shape
    H, hd = cfg.num_attention_heads, cfg.head_dim

    pos = jnp.arange(T, dtype=jnp.float32)
    inv = 1.0 / (cfg.rope_theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    freqs = jnp.outer(pos, inv)
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)
    ti = jnp.arange(T)
    mask = (ti[None, :] <= ti[:, None]) & (ti[:, None] - ti[None, :] < cfg.sliding_window)

    h = x
    for layer in layers:
        n = _layer_norm(h, layer["input_ln_w"], layer["input_ln_b"], cfg.norm_eps)
        q = _rope_halfsplit((n @ layer["wq"]).reshape(B, T, H, hd), cos, sin)
        k = _rope_halfsplit((n @ layer["wk"]).reshape(B, T, H, hd), cos, sin)
        v = (n @ layer["wv"]).reshape(B, T, H, hd)
        s = jnp.einsum("bqhd,bthd->bhqt", q, k, preferred_element_type=jnp.float32)
        s = s * (hd ** -0.5)
        s = jnp.where(mask[None, None], s, -jnp.inf)
        a = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqt,bthd->bqhd", a, v).reshape(B, T, H * hd)
        h = h + (o @ layer["wo"]) * layer["attn_scale"]
        n = _layer_norm(h, layer["post_ln_w"], layer["post_ln_b"], cfg.norm_eps)
        m = jax.nn.gelu(n @ layer["fc1"], approximate=False) @ layer["fc2"]
        h = h + m * layer["mlp_scale"]
    return h


def _codebook_table(layer: dict) -> jax.Array:
    """Usage-normalized codebook ``[bins, dim]`` (embed_sum / clamp(usage))."""
    return layer["embed_sum"] / jnp.clip(layer["usage"], 1e-5, None)[:, None]


def _rvq_encode_branch(branch: dict, x: jax.Array, n_layers: int) -> jax.Array:
    """x ``[B, D, T]`` -> codes ``[B, n_layers, T]``: pointwise input_proj then
    the residual nearest-neighbor chain (:1219-1243)."""
    y = jnp.einsum("bdt,nd->bnt", x, branch["input_proj"])
    res = y.transpose(0, 2, 1)  # [B, T, dim]
    codes = []
    for layer in branch["layers"][:n_layers]:
        emb = _codebook_table(layer)  # [C, dim]
        d = (
            jnp.sum(res ** 2, -1, keepdims=True)
            - 2.0 * (res @ emb.T)
            + jnp.sum(emb ** 2, -1)[None, None]
        )
        code = jnp.argmin(d, axis=-1)  # [B, T]
        res = res - emb[code]
        codes.append(code)
    return jnp.stack(codes, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(0,))
def encode_audio(cfg: SpeechEncoderConfig, p: dict, audio: jax.Array) -> jax.Array:
    """audio ``[B, 1, N]`` f32 -> codes ``[B, T, valid_num_quantizers]``
    (semantic codebook first — the talker's codebook-0 stream)."""
    h = encoder_seanet(cfg, p, audio)
    h = encoder_transformer(cfg, p["transformer"], h.transpose(0, 2, 1)).transpose(0, 2, 1)
    sem = _rvq_encode_branch(p["semantic"], h, cfg.num_semantic_quantizers)
    n_aco = cfg.valid_num_quantizers - cfg.num_semantic_quantizers
    if n_aco > 0:
        aco = _rvq_encode_branch(p["acoustic"], h, n_aco)
        sem = jnp.concatenate([sem, aco], axis=1)
    return sem.transpose(0, 2, 1)


class SpeechTokenizerEncoder:
    """24 kHz reference audio -> ``[T, n_q]`` codec codes (voice clone)."""

    def __init__(self, config: SpeechEncoderConfig, params: dict):
        self.config = config
        self.params = params

    @property
    def sample_rate(self) -> int:
        return self.config.input_sample_rate

    def encode(self, audio: np.ndarray) -> np.ndarray:
        """audio mono f32 ``[N]`` (or ``[B, N]``) in [-1, 1] at 24 kHz ->
        codes ``[T, n_q]`` int32 (``[B, T, n_q]`` for batched input)."""
        a = np.asarray(audio, np.float32)
        squeeze = a.ndim == 1
        if squeeze:
            a = a[None]
        codes = np.asarray(encode_audio(self.config, self.params, jnp.asarray(a[:, None, :])))
        return codes[0] if squeeze else codes

    def __call__(self, audio: np.ndarray) -> np.ndarray:
        return self.encode(audio)


def _encoder_layer_indices(cfg: SpeechEncoderConfig):
    """SEANet layer indices in the checkpoint (res units / downsample convs
    interleave with parameterless ELU entries — :1275-1281)."""
    blocks, idx = [], 1
    for _ in cfg.encoder_strides:
        units = list(range(idx, idx + cfg.num_residual_layers))
        down = idx + cfg.num_residual_layers + 1
        blocks.append((units, down))
        idx = down + 1
    return blocks, idx + 1  # (per-block indices, last-conv index)


def map_encoder_weights(cfg: SpeechEncoderConfig, sd: dict, prefix: str = "encoder.") -> dict:
    """Map the released speech-tokenizer ``encoder.*`` tensors (HF MimiModel
    encoder-side layout) to the params tree."""
    g = lambda n: jnp.asarray(np.asarray(sd[prefix + n], np.float32))

    def conv(n):
        b = f"{prefix}{n}.conv.bias"
        return g(n + ".conv.weight"), (g(n + ".conv.bias") if b in sd else None)

    block_idx, last_idx = _encoder_layer_indices(cfg)
    blocks = []
    for units_idx, down_idx in block_idx:
        units = []
        for u in units_idx:
            c1w, c1b = conv(f"encoder.layers.{u}.block.1")
            c2w, c2b = conv(f"encoder.layers.{u}.block.3")
            units.append({
                "conv1_w": c1w, "conv1_b": c1b, "conv2_w": c2w, "conv2_b": c2b,
            })
        dw, db = conv(f"encoder.layers.{down_idx}")
        blocks.append({"units": units, "down_w": dw, "down_b": db})

    layers = []
    for i in range(cfg.num_hidden_layers):
        L = f"encoder_transformer.layers.{i}."
        t = lambda n: g(L + n).T
        layers.append({
            "wq": t("self_attn.q_proj.weight"), "wk": t("self_attn.k_proj.weight"),
            "wv": t("self_attn.v_proj.weight"), "wo": t("self_attn.o_proj.weight"),
            "fc1": t("mlp.fc1.weight"), "fc2": t("mlp.fc2.weight"),
            "input_ln_w": g(L + "input_layernorm.weight"),
            "input_ln_b": g(L + "input_layernorm.bias"),
            "post_ln_w": g(L + "post_attention_layernorm.weight"),
            "post_ln_b": g(L + "post_attention_layernorm.bias"),
            "attn_scale": g(L + "self_attn_layer_scale.scale"),
            "mlp_scale": g(L + "mlp_layer_scale.scale"),
        })

    def rvq_branch(name, n_layers):
        q = f"quantizer.{name}_residual_vector_quantizer."
        w = np.asarray(sd[prefix + q + "input_proj.weight"], np.float32)
        branch = {"input_proj": jnp.asarray(w[:, :, 0]), "layers": []}
        for i in range(n_layers):
            c = f"{q}layers.{i}.codebook."
            usage_key = prefix + c + "cluster_usage"
            usage = (
                jnp.asarray(np.asarray(sd[usage_key], np.float32))
                if usage_key in sd else jnp.ones((cfg.codebook_size,), jnp.float32)
            )
            branch["layers"].append({"embed_sum": g(c + "embed_sum"), "usage": usage})
        return branch

    fw, fb = conv("encoder.layers.0")
    lw, lb = conv(f"encoder.layers.{last_idx}")
    n_aco = cfg.valid_num_quantizers - cfg.num_semantic_quantizers
    return {
        "first_w": fw, "first_b": fb,
        "blocks": blocks,
        "last_w": lw, "last_b": lb,
        "downsample_w": g("downsample.conv.weight"),
        "transformer": layers,
        "semantic": rvq_branch("semantic", cfg.num_semantic_quantizers),
        "acoustic": rvq_branch("acoustic", n_aco),
    }


def load_speech_tokenizer_encoder(model_dir: str) -> "SpeechTokenizerEncoder | None":
    """Build the encoder from a released ``speech_tokenizer/`` directory.
    Returns None when the checkpoint ships no ``encoder.*`` tensors."""
    import json
    import os

    from crane_tpu.loaders.safetensors_loader import load_state_dict

    sd = load_state_dict(model_dir)
    if not any(k.startswith("encoder.") for k in sd):
        return None
    with open(os.path.join(model_dir, "config.json")) as f:
        raw = json.load(f)
    ec = raw.get("encoder_config", {})
    cfg = SpeechEncoderConfig(
        num_filters=ec.get("num_filters", 64),
        hidden_size=ec.get("hidden_size", 512),
        intermediate_size=ec.get("intermediate_size", 2048),
        num_hidden_layers=ec.get("num_hidden_layers", 8),
        num_attention_heads=ec.get("num_attention_heads", 8),
        num_key_value_heads=ec.get("num_key_value_heads", 8),
        head_dim=ec.get("head_dim", 64),
        kernel_size=ec.get("kernel_size", 7),
        last_kernel_size=ec.get("last_kernel_size", 3),
        residual_kernel_size=ec.get("residual_kernel_size", 3),
        num_residual_layers=ec.get("num_residual_layers", 1),
        upsampling_ratios=tuple(ec.get("upsampling_ratios", (8, 6, 5, 4))),
        codebook_size=ec.get("codebook_size", 2048),
        codebook_dim=ec.get("codebook_dim", 256),
        num_quantizers=ec.get("num_quantizers", 32),
        num_semantic_quantizers=ec.get("num_semantic_quantizers", 1),
        norm_eps=ec.get("norm_eps", 1e-5),
        rope_theta=ec.get("rope_theta", 10000.0),
        sliding_window=ec.get("sliding_window", 250),
        vector_quantization_hidden_dimension=ec.get(
            "vector_quantization_hidden_dimension", 256),
        valid_num_quantizers=raw.get("encoder_valid_num_quantizers", 16),
        input_sample_rate=raw.get("output_sample_rate", 24000),
    )
    return SpeechTokenizerEncoder(cfg, map_encoder_weights(cfg, sd))


def random_encoder_state_dict(cfg: SpeechEncoderConfig, seed: int = 0) -> dict:
    """Random state dict with the released checkpoint's ``encoder.*`` key
    layout (tests / dry-runs; real shapes, arbitrary values)."""
    rng = np.random.default_rng(seed)

    def r(*shape, scale=0.05):
        return (rng.normal(size=shape) * scale).astype(np.float32)

    sd, e = {}, "encoder."
    sd[e + "encoder.layers.0.conv.weight"] = r(cfg.num_filters, 1, cfg.kernel_size)
    sd[e + "encoder.layers.0.conv.bias"] = r(cfg.num_filters)
    block_idx, last_idx = _encoder_layer_indices(cfg)
    ch = cfg.num_filters
    for (units_idx, down_idx), stride in zip(block_idx, cfg.encoder_strides):
        for u in units_idx:
            sd[e + f"encoder.layers.{u}.block.1.conv.weight"] = r(
                ch // cfg.compress, ch, cfg.residual_kernel_size)
            sd[e + f"encoder.layers.{u}.block.1.conv.bias"] = r(ch // cfg.compress)
            sd[e + f"encoder.layers.{u}.block.3.conv.weight"] = r(ch, ch // cfg.compress, 1)
            sd[e + f"encoder.layers.{u}.block.3.conv.bias"] = r(ch)
        sd[e + f"encoder.layers.{down_idx}.conv.weight"] = r(2 * ch, ch, 2 * stride)
        sd[e + f"encoder.layers.{down_idx}.conv.bias"] = r(2 * ch)
        ch *= 2
    sd[e + f"encoder.layers.{last_idx}.conv.weight"] = r(
        cfg.hidden_size, ch, cfg.last_kernel_size)
    sd[e + f"encoder.layers.{last_idx}.conv.bias"] = r(cfg.hidden_size)
    sd[e + "downsample.conv.weight"] = r(cfg.hidden_size, cfg.hidden_size, 4)
    H, hd = cfg.num_attention_heads, cfg.head_dim
    for i in range(cfg.num_hidden_layers):
        L = f"{e}encoder_transformer.layers.{i}."
        sd[L + "self_attn.q_proj.weight"] = r(H * hd, cfg.hidden_size)
        sd[L + "self_attn.k_proj.weight"] = r(H * hd, cfg.hidden_size)
        sd[L + "self_attn.v_proj.weight"] = r(H * hd, cfg.hidden_size)
        sd[L + "self_attn.o_proj.weight"] = r(cfg.hidden_size, H * hd)
        sd[L + "mlp.fc1.weight"] = r(cfg.intermediate_size, cfg.hidden_size)
        sd[L + "mlp.fc2.weight"] = r(cfg.hidden_size, cfg.intermediate_size)
        sd[L + "input_layernorm.weight"] = np.ones(cfg.hidden_size, np.float32)
        sd[L + "input_layernorm.bias"] = np.zeros(cfg.hidden_size, np.float32)
        sd[L + "post_attention_layernorm.weight"] = np.ones(cfg.hidden_size, np.float32)
        sd[L + "post_attention_layernorm.bias"] = np.zeros(cfg.hidden_size, np.float32)
        sd[L + "self_attn_layer_scale.scale"] = np.full(cfg.hidden_size, 0.01, np.float32)
        sd[L + "mlp_layer_scale.scale"] = np.full(cfg.hidden_size, 0.01, np.float32)
    dim = cfg.vector_quantization_hidden_dimension
    for name, nq in (
        ("semantic", cfg.num_semantic_quantizers),
        ("acoustic", cfg.num_quantizers - cfg.num_semantic_quantizers),
    ):
        q = f"{e}quantizer.{name}_residual_vector_quantizer."
        sd[q + "input_proj.weight"] = r(dim, cfg.hidden_size, 1)
        for i in range(nq):
            sd[q + f"layers.{i}.codebook.embed_sum"] = r(cfg.codebook_size, dim, scale=1.0)
            sd[q + f"layers.{i}.codebook.cluster_usage"] = np.ones(cfg.codebook_size, np.float32)
    return sd


def init_encoder_params(cfg: SpeechEncoderConfig, seed: int = 0) -> dict:
    """Random encoder params at ``cfg`` shapes (tests / dry-runs)."""
    return map_encoder_weights(cfg, random_encoder_state_dict(cfg, seed))


def random_decoder_state_dict(cfg: SpeechDecoderConfig, seed: int = 0) -> dict:
    """Random state dict with the released checkpoint's key layout
    (benchmarks / dry-runs / tests; real shapes, arbitrary values)."""
    rng = np.random.default_rng(seed)

    def r(*shape, scale=0.05):
        return (rng.normal(size=shape) * scale).astype(np.float32)

    sd, d = {}, "decoder."
    half = cfg.codebook_dim // 2
    for name, nq in (("rvq_first", 1), ("rvq_rest", cfg.num_quantizers - 1)):
        for i in range(nq):
            sd[f"{d}quantizer.{name}.vq.layers.{i}._codebook.embedding_sum"] = r(cfg.codebook_size, half)
            sd[f"{d}quantizer.{name}.vq.layers.{i}._codebook.cluster_usage"] = np.ones(cfg.codebook_size, np.float32)
        sd[f"{d}quantizer.{name}.output_proj.weight"] = r(cfg.codebook_dim, half, 1)
    sd[d + "pre_conv.conv.weight"] = r(cfg.latent_dim, cfg.codebook_dim, 3)
    sd[d + "pre_conv.conv.bias"] = r(cfg.latent_dim)
    pt = d + "pre_transformer."
    sd[pt + "input_proj.weight"] = r(cfg.hidden_size, cfg.latent_dim)
    sd[pt + "input_proj.bias"] = r(cfg.hidden_size)
    sd[pt + "output_proj.weight"] = r(cfg.latent_dim, cfg.hidden_size)
    sd[pt + "output_proj.bias"] = r(cfg.latent_dim)
    sd[pt + "norm.weight"] = np.ones(cfg.hidden_size, np.float32)
    H, Hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    for i in range(cfg.num_hidden_layers):
        L = f"{pt}layers.{i}."
        sd[L + "self_attn.q_proj.weight"] = r(H * hd, cfg.hidden_size)
        sd[L + "self_attn.k_proj.weight"] = r(Hkv * hd, cfg.hidden_size)
        sd[L + "self_attn.v_proj.weight"] = r(Hkv * hd, cfg.hidden_size)
        sd[L + "self_attn.o_proj.weight"] = r(cfg.hidden_size, H * hd)
        sd[L + "input_layernorm.weight"] = np.ones(cfg.hidden_size, np.float32)
        sd[L + "post_attention_layernorm.weight"] = np.ones(cfg.hidden_size, np.float32)
        sd[L + "self_attn_layer_scale.scale"] = np.full(cfg.hidden_size, 0.01, np.float32)
        sd[L + "mlp_layer_scale.scale"] = np.full(cfg.hidden_size, 0.01, np.float32)
        sd[L + "mlp.gate_proj.weight"] = r(cfg.intermediate_size, cfg.hidden_size)
        sd[L + "mlp.up_proj.weight"] = r(cfg.intermediate_size, cfg.hidden_size)
        sd[L + "mlp.down_proj.weight"] = r(cfg.hidden_size, cfg.intermediate_size)
    for i, ratio in enumerate(cfg.upsampling_ratios):
        sd[f"{d}upsample.{i}.0.conv.weight"] = r(cfg.latent_dim, cfg.latent_dim, ratio)
        sd[f"{d}upsample.{i}.0.conv.bias"] = r(cfg.latent_dim)
        n = f"{d}upsample.{i}.1."
        sd[n + "dwconv.conv.weight"] = r(cfg.latent_dim, 1, 7)
        sd[n + "dwconv.conv.bias"] = r(cfg.latent_dim)
        sd[n + "norm.weight"] = np.ones(cfg.latent_dim, np.float32)
        sd[n + "norm.bias"] = np.zeros(cfg.latent_dim, np.float32)
        sd[n + "pwconv1.weight"] = r(4 * cfg.latent_dim, cfg.latent_dim)
        sd[n + "pwconv1.bias"] = r(4 * cfg.latent_dim)
        sd[n + "pwconv2.weight"] = r(cfg.latent_dim, 4 * cfg.latent_dim)
        sd[n + "pwconv2.bias"] = r(cfg.latent_dim)
        sd[n + "gamma"] = np.full(cfg.latent_dim, 0.1, np.float32)
    sd[d + "decoder.0.conv.weight"] = r(cfg.decoder_dim, cfg.latent_dim, 7)
    sd[d + "decoder.0.conv.bias"] = r(cfg.decoder_dim)
    for i, up in enumerate(cfg.upsample_rates):
        n = f"{d}decoder.{i + 1}.block."
        ind = cfg.decoder_dim >> i
        outd = cfg.decoder_dim >> (i + 1)
        sd[n + "0.alpha"] = r(ind)
        sd[n + "0.beta"] = r(ind)
        sd[n + "1.conv.weight"] = r(ind, outd, 2 * up)
        sd[n + "1.conv.bias"] = r(outd)
        for j in (2, 3, 4):
            sd[n + f"{j}.act1.alpha"] = r(outd)
            sd[n + f"{j}.act1.beta"] = r(outd)
            sd[n + f"{j}.conv1.conv.weight"] = r(outd, outd, 7)
            sd[n + f"{j}.conv1.conv.bias"] = r(outd)
            sd[n + f"{j}.act2.alpha"] = r(outd)
            sd[n + f"{j}.act2.beta"] = r(outd)
            sd[n + f"{j}.conv2.conv.weight"] = r(outd, outd, 1)
            sd[n + f"{j}.conv2.conv.bias"] = r(outd)
    nb = len(cfg.upsample_rates)
    outd = cfg.decoder_dim >> nb
    sd[f"{d}decoder.{nb + 1}.alpha"] = r(outd)
    sd[f"{d}decoder.{nb + 1}.beta"] = r(outd)
    sd[f"{d}decoder.{nb + 2}.conv.weight"] = r(1, outd, 7)
    sd[f"{d}decoder.{nb + 2}.conv.bias"] = r(1)
    return sd


def init_decoder_params(cfg: SpeechDecoderConfig, seed: int = 0) -> dict:
    """Random decoder params at ``cfg`` shapes (benchmarks / dry-runs)."""
    return map_decoder_weights(cfg, random_decoder_state_dict(cfg, seed))
