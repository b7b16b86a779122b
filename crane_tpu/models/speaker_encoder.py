"""ECAPA-TDNN speaker encoder for voice-clone x-vectors, checkpoint-parity.

Reference behavior (/root/reference/crane-core/src/models/qwen3_tts/
modeling.rs:953-1223): SpeakerEncoder = initial TDNN (reflect-padded conv +
ReLU) -> SE-Res2Net blocks (tdnn1 k=1 -> Res2Net chunked dilated convs ->
tdnn2 k=1 -> squeeze-excitation, + residual) -> multi-layer feature
aggregation over the SE block outputs -> attentive statistics pooling
(attention = softmax_T(conv(tanh(relu(conv([x, mean, std])))))) -> k=1 conv
to ``enc_dim``. No batch norms, no output normalization — the layout matches
the released checkpoint's ``speaker_encoder.*`` tensors exactly.

Input is a log-mel at the reference's speaker constants (model.rs:417-435):
n_fft=1024, hop=256, 128 mels, 24 kHz, fmin=0, fmax=12000, Hann,
reflect-padded by (n_fft-hop)/2, MAGNITUDE spectrum, ln compression.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from crane_tpu.audio.mel import MelConfig, log_mel_spectrogram

SPEAKER_MEL = MelConfig(
    n_fft=1024, hop_length=256, n_mels=128, sampling_rate=24000,
    fmin=0.0, fmax=12000.0, log_mode="ln", spectrum="magnitude",
    center_pad="stft",
)


@dataclasses.dataclass(frozen=True)
class EcapaConfig:
    """Reference SpeakerEncoderConfig defaults (modeling.rs:151-195)."""

    mel_dim: int = 128
    enc_dim: int = 1024
    enc_channels: tuple = (512, 512, 512, 512, 1536)
    enc_kernel_sizes: tuple = (5, 3, 3, 3, 1)
    enc_dilations: tuple = (1, 2, 3, 4, 1)
    enc_attention_channels: int = 128
    enc_res2net_scale: int = 8
    enc_se_channels: int = 128
    sample_rate: int = 24000


def _reflect_conv(x, w, b, *, dilation=1):
    """x ``[B, T, C]``; w ``[k, Cin, Cout]``; reflect SAME padding with the
    reference's asymmetric split (modeling.rs:959-972: left = total//2)."""
    k = w.shape[0]
    total = dilation * (k - 1)
    left = total // 2
    if total:
        x = jnp.pad(x, ((0, 0), (left, total - left), (0, 0)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        x, w, (1,), "VALID", rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y + b


def tdnn_block(p, x, *, dilation=1):
    """Reflect-padded conv + ReLU (modeling.rs:976-988)."""
    return jax.nn.relu(_reflect_conv(x, p["w"], p["b"], dilation=dilation))


def res2net_block(p, x, *, scale, dilation):
    """Res2Net over channel chunks (modeling.rs:990-1029): chunk 0 passes
    through; chunk 1 is convolved alone; chunk i>=2 is convolved after
    adding the previous chunk's conv output."""
    parts = jnp.split(x, scale, axis=-1)
    outs = [parts[0]]
    prev = None
    for i in range(1, scale):
        inp = parts[i] if prev is None else parts[i] + prev
        prev = tdnn_block(p["blocks"][i - 1], inp, dilation=dilation)
        outs.append(prev)
    return jnp.concatenate(outs, axis=-1)


def se_block(p, x):
    """Squeeze-excitation (modeling.rs:1031-1053): global T-mean ->
    conv1(k=1)+ReLU -> conv2(k=1)+sigmoid channel gates."""
    s = x.mean(axis=1, keepdims=True)
    s = jax.nn.relu(s @ p["w1"][0] + p["b1"])
    s = jax.nn.sigmoid(s @ p["w2"][0] + p["b2"])
    return x * s


def se_res2net_block(p, x, *, scale, dilation):
    """tdnn1(k=1) -> Res2Net -> tdnn2(k=1) -> SE, + residual
    (modeling.rs:1055-1080)."""
    h = tdnn_block(p["tdnn1"], x)
    h = res2net_block(p["res2net"], h, scale=scale, dilation=dilation)
    h = tdnn_block(p["tdnn2"], h)
    h = se_block(p["se"], h)
    return x + h


def attentive_stats_pool(p, x):
    """Attentive statistics pooling (modeling.rs:1082-1130): attention
    logits = conv(tanh(relu(tdnn([x, mean, std])))), softmax over T;
    output = [weighted mean, weighted std] with the reference's 1e-5
    variance epsilon."""
    mu = x.mean(axis=1, keepdims=True)
    sg = jnp.sqrt(((x - mu) ** 2).mean(axis=1, keepdims=True) + 1e-5)
    ctx = jnp.concatenate(
        [x, jnp.broadcast_to(mu, x.shape), jnp.broadcast_to(sg, x.shape)], axis=-1
    )
    a = tdnn_block(p["tdnn"], ctx)
    a = jnp.tanh(a)
    a = a @ p["conv_w"][0] + p["conv_b"]
    a = jax.nn.softmax(a, axis=1)  # over T
    mean = jnp.sum(a * x, axis=1)
    var = jnp.sum(a * (x - mean[:, None]) ** 2, axis=1)
    std = jnp.sqrt(var + 1e-5)
    return jnp.concatenate([mean, std], axis=-1)


@functools.partial(jax.jit, static_argnums=(0,))
def ecapa_forward(cfg: EcapaConfig, params: dict, mel: jax.Array) -> jax.Array:
    """mel ``[B, n_mels, T]`` -> speaker embedding ``[B, enc_dim]``
    (modeling.rs:1149-1223). Not normalized — the talker consumes it raw."""
    x = mel.transpose(0, 2, 1)  # [B, T, C]
    x = tdnn_block(params["blocks"][0], x, dilation=cfg.enc_dilations[0])
    feats = []
    for p, d in zip(params["blocks"][1:], cfg.enc_dilations[1:-1]):
        x = se_res2net_block(p, x, scale=cfg.enc_res2net_scale, dilation=d)
        feats.append(x)
    h = jnp.concatenate(feats, axis=-1)
    h = tdnn_block(params["mfa"], h, dilation=cfg.enc_dilations[-1])
    pooled = attentive_stats_pool(params["asp"], h)
    return pooled @ params["fc_w"][0] + params["fc_b"]


def map_speaker_encoder_weights(
    cfg: EcapaConfig, sd: dict, prefix: str = "speaker_encoder."
) -> dict:
    """Map the released checkpoint's ``speaker_encoder.*`` tensors (torch
    Conv1d ``[Cout, Cin, k]``) to the params tree (``[k, Cin, Cout]``)."""
    w = lambda n: jnp.asarray(
        np.asarray(sd[prefix + n + ".weight"], np.float32).transpose(2, 1, 0))
    b = lambda n: jnp.asarray(np.asarray(sd[prefix + n + ".bias"], np.float32))

    def tdnn(n):
        return {"w": w(n + ".conv"), "b": b(n + ".conv")}

    n = len(cfg.enc_channels)
    blocks = [tdnn("blocks.0")]
    for i in range(1, n - 1):
        B = f"blocks.{i}."
        blocks.append({
            "tdnn1": tdnn(B + "tdnn1"),
            "res2net": {"blocks": [
                tdnn(f"{B}res2net_block.blocks.{j}")
                for j in range(cfg.enc_res2net_scale - 1)
            ]},
            "tdnn2": tdnn(B + "tdnn2"),
            "se": {
                "w1": w(B + "se_block.conv1"), "b1": b(B + "se_block.conv1"),
                "w2": w(B + "se_block.conv2"), "b2": b(B + "se_block.conv2"),
            },
        })
    return {
        "blocks": blocks,
        "mfa": tdnn("mfa"),
        "asp": {
            "tdnn": tdnn("asp.tdnn"),
            "conv_w": w("asp.conv"), "conv_b": b("asp.conv"),
        },
        "fc_w": w("fc"), "fc_b": b("fc"),
    }


def random_speaker_encoder_state_dict(cfg: EcapaConfig, seed: int = 0) -> dict:
    """Random state dict in the released ``speaker_encoder.*`` layout
    (tests / dry-runs; real shapes, arbitrary values)."""
    rng = np.random.default_rng(seed)

    def conv(name, cin, cout, k, sd):
        sd[name + ".weight"] = (rng.normal(size=(cout, cin, k)) * (k * cin) ** -0.5).astype(np.float32)
        sd[name + ".bias"] = np.zeros(cout, np.float32)

    sd: dict = {}
    p = "speaker_encoder."
    ch, ks = cfg.enc_channels, cfg.enc_kernel_sizes
    n = len(ch)
    conv(p + "blocks.0.conv", cfg.mel_dim, ch[0], ks[0], sd)
    s = cfg.enc_res2net_scale
    for i in range(1, n - 1):
        B = f"{p}blocks.{i}."
        conv(B + "tdnn1.conv", ch[i - 1], ch[i], 1, sd)
        for j in range(s - 1):
            conv(f"{B}res2net_block.blocks.{j}.conv", ch[i] // s, ch[i] // s, ks[i], sd)
        conv(B + "tdnn2.conv", ch[i], ch[i], 1, sd)
        conv(B + "se_block.conv1", ch[i], cfg.enc_se_channels, 1, sd)
        conv(B + "se_block.conv2", cfg.enc_se_channels, ch[i], 1, sd)
    mfa_in = sum(ch[1 : n - 1])
    conv(p + "mfa.conv", mfa_in, ch[-1], ks[-1], sd)
    conv(p + "asp.tdnn.conv", 3 * ch[-1], cfg.enc_attention_channels, 1, sd)
    conv(p + "asp.conv", cfg.enc_attention_channels, ch[-1], 1, sd)
    conv(p + "fc", 2 * ch[-1], cfg.enc_dim, 1, sd)
    return sd


def init_ecapa_params(cfg: EcapaConfig, seed: int = 0) -> dict:
    """Random params at ``cfg`` shapes (tests / dry-runs)."""
    return map_speaker_encoder_weights(cfg, random_speaker_encoder_state_dict(cfg, seed))


class SpeakerEncoder:
    """Raw 24 kHz audio (or a precomputed log-mel) -> speaker x-vector."""

    def __init__(self, cfg: EcapaConfig | None = None, params: dict | None = None):
        self.cfg = cfg or EcapaConfig()
        self.params = params if params is not None else init_ecapa_params(self.cfg)
        self.mel_cfg = dataclasses.replace(
            SPEAKER_MEL, n_mels=self.cfg.mel_dim, sampling_rate=self.cfg.sample_rate
        )

    def embed(self, mel: np.ndarray) -> np.ndarray:
        """log-mel ``[n_mels, T]`` (or batched) -> embedding ``[B, enc_dim]``."""
        mel = np.asarray(mel, np.float32)
        if mel.ndim == 2:
            mel = mel[None]
        return np.asarray(ecapa_forward(self.cfg, self.params, jnp.asarray(mel)))

    def __call__(self, audio: np.ndarray) -> np.ndarray:
        """audio mono f32 ``[N]`` at ``cfg.sample_rate`` -> ``[enc_dim]``
        (the SDK's ``model.speaker_encoder`` contract; reference
        model.rs:411-450 computes exactly this mel -> ECAPA chain)."""
        mel = log_mel_spectrogram(self.mel_cfg, jnp.asarray(np.asarray(audio, np.float32)))
        return self.embed(np.asarray(mel))[0]

    def similarity(self, mel_a: np.ndarray, mel_b: np.ndarray) -> float:
        ea, eb = self.embed(mel_a)[0], self.embed(mel_b)[0]
        ea = ea / np.linalg.norm(ea).clip(1e-9)
        eb = eb / np.linalg.norm(eb).clip(1e-9)
        return float(np.dot(ea, eb))
