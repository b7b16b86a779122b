"""ECAPA-TDNN speaker encoder for voice-clone embeddings.

Reference behavior (/root/reference/crane-core/src/models/qwen3_tts/
modeling.rs:953-1223): SpeakerEncoder = TDNN blocks, SE-Res2Net blocks with
dilations, multi-layer feature aggregation, and attentive-statistics pooling
producing a fixed speaker embedding from a log-mel spectrogram — used to
condition voice cloning. Implemented natively in JAX (inference-only:
batch norms fold to scale/shift).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class EcapaConfig:
    n_mels: int = 80
    channels: int = 512
    emb_dim: int = 192
    res2net_scale: int = 8
    se_bottleneck: int = 128
    attn_bottleneck: int = 128
    dilations: tuple = (2, 3, 4)


def _conv1d(x, w, b, *, dilation=1, groups=1):
    """x [B,T,C]; w [k,Cin/groups,Cout]; SAME padding."""
    k_eff = (w.shape[0] - 1) * dilation + 1
    pad = k_eff // 2
    y = jax.lax.conv_general_dilated(
        x, w, (1,), [(pad, k_eff - 1 - pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=groups,
    )
    return y + b if b is not None else y


def _bn(x, p):
    """Folded inference batch norm: scale/shift per channel."""
    return x * p["scale"] + p["shift"]


def tdnn_block(p, x, *, dilation=1):
    return _bn(jax.nn.relu(_conv1d(x, p["w"], p["b"], dilation=dilation)), p["bn"])


def se_block(p, x):
    """Squeeze-excitation over channels."""
    s = x.mean(axis=1, keepdims=True)
    s = jax.nn.relu(s @ p["w1"] + p["b1"])
    s = jax.nn.sigmoid(s @ p["w2"] + p["b2"])
    return x * s


def res2net_block(p, x, *, scale, dilation):
    """Res2Net: split channels into `scale` groups; group i is convolved with
    a k=3 dilated conv after adding the previous group's output."""
    parts = jnp.split(x, scale, axis=-1)
    outs = [parts[0]]
    prev = None
    for i in range(1, scale):
        inp = parts[i] if prev is None else parts[i] + prev
        prev = jax.nn.relu(_conv1d(inp, p["ws"][i - 1], p["bs"][i - 1], dilation=dilation))
        outs.append(prev)
    return jnp.concatenate(outs, axis=-1)


def se_res2net_block(p, x, *, scale, dilation):
    h = tdnn_block(p["in"], x)
    h = res2net_block(p["res2"], h, scale=scale, dilation=dilation)
    h = tdnn_block(p["out"], h)
    h = se_block(p["se"], h)
    return x + h


def attentive_stats_pool(p, x):
    """Attentive statistics pooling: attention logits from [x, mean, std]
    context -> weighted mean and std, concatenated."""
    B, T, C = x.shape
    mu = x.mean(axis=1, keepdims=True)
    sg = jnp.sqrt(jnp.clip(((x - mu) ** 2).mean(axis=1, keepdims=True), 1e-9))
    ctx = jnp.concatenate(
        [x, jnp.broadcast_to(mu, x.shape), jnp.broadcast_to(sg, x.shape)], axis=-1
    )
    a = jnp.tanh(ctx @ p["w1"] + p["b1"])
    a = jax.nn.softmax(a @ p["w2"] + p["b2"], axis=1)  # [B,T,C]
    mean = jnp.sum(a * x, axis=1)
    std = jnp.sqrt(jnp.clip(jnp.sum(a * x * x, axis=1) - mean ** 2, 1e-9))
    return jnp.concatenate([mean, std], axis=-1)


@functools.partial(jax.jit, static_argnums=(0,))
def ecapa_forward(cfg: EcapaConfig, params: dict, mel: jax.Array) -> jax.Array:
    """mel ``[B, n_mels, T]`` -> L2-normalized speaker embedding ``[B, emb]``."""
    x = mel.transpose(0, 2, 1)
    x = tdnn_block(params["stem"], x)
    feats = []
    for p, d in zip(params["blocks"], cfg.dilations):
        x = se_res2net_block(p, x, scale=cfg.res2net_scale, dilation=d)
        feats.append(x)
    h = jnp.concatenate(feats, axis=-1)
    h = jax.nn.relu(_conv1d(h, params["mfa_w"], params["mfa_b"]))
    pooled = attentive_stats_pool(params["pool"], h)
    emb = pooled @ params["fc_w"] + params["fc_b"]
    return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True).clip(1e-9)


def init_ecapa_params(cfg: EcapaConfig, seed: int = 0) -> dict:
    """Random init (tests / scaffolding until trained weights are converted)."""
    k = jax.random.PRNGKey(seed)
    ks = iter(jax.random.split(k, 64))
    C = cfg.channels

    def conv(kw, cin, cout):
        return {
            "w": jax.random.normal(next(ks), (kw, cin, cout)) * (kw * cin) ** -0.5,
            "b": jnp.zeros((cout,)),
            "bn": {"scale": jnp.ones((cout,)), "shift": jnp.zeros((cout,))},
        }

    def block():
        s = cfg.res2net_scale
        cs = C // s
        return {
            "in": conv(1, C, C),
            "res2": {
                "ws": [jax.random.normal(next(ks), (3, cs, cs)) * (3 * cs) ** -0.5 for _ in range(s - 1)],
                "bs": [jnp.zeros((cs,)) for _ in range(s - 1)],
            },
            "out": conv(1, C, C),
            "se": {
                "w1": jax.random.normal(next(ks), (C, cfg.se_bottleneck)) * C ** -0.5,
                "b1": jnp.zeros((cfg.se_bottleneck,)),
                "w2": jax.random.normal(next(ks), (cfg.se_bottleneck, C)) * cfg.se_bottleneck ** -0.5,
                "b2": jnp.zeros((C,)),
            },
        }

    n_blocks = len(cfg.dilations)
    mfa_in = C * n_blocks
    mfa_out = C * 3 // 2
    return {
        "stem": conv(5, cfg.n_mels, C),
        "blocks": tuple(block() for _ in range(n_blocks)),
        "mfa_w": jax.random.normal(next(ks), (1, mfa_in, mfa_out)) * mfa_in ** -0.5,
        "mfa_b": jnp.zeros((mfa_out,)),
        "pool": {
            "w1": jax.random.normal(next(ks), (3 * mfa_out, cfg.attn_bottleneck)) * (3 * mfa_out) ** -0.5,
            "b1": jnp.zeros((cfg.attn_bottleneck,)),
            "w2": jax.random.normal(next(ks), (cfg.attn_bottleneck, mfa_out)) * cfg.attn_bottleneck ** -0.5,
            "b2": jnp.zeros((mfa_out,)),
        },
        "fc_w": jax.random.normal(next(ks), (2 * mfa_out, cfg.emb_dim)) * (2 * mfa_out) ** -0.5,
        "fc_b": jnp.zeros((cfg.emb_dim,)),
    }


class SpeakerEncoder:
    def __init__(self, cfg: EcapaConfig | None = None, params: dict | None = None):
        self.cfg = cfg or EcapaConfig()
        self.params = params or init_ecapa_params(self.cfg)

    def embed(self, mel: np.ndarray) -> np.ndarray:
        """log-mel ``[n_mels, T]`` (or batched) -> unit-norm embedding."""
        mel = np.asarray(mel, np.float32)
        if mel.ndim == 2:
            mel = mel[None]
        return np.asarray(ecapa_forward(self.cfg, self.params, jnp.asarray(mel)))

    def similarity(self, mel_a: np.ndarray, mel_b: np.ndarray) -> float:
        ea, eb = self.embed(mel_a)[0], self.embed(mel_b)[0]
        return float(np.dot(ea, eb))
