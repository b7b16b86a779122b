"""Native JAX detector / recognizer nets for the two-stage OCR pipeline.

Reference behavior: PaddleOCR v6 small det/rec ONNX graphs
(/root/reference/crane-core/src/models/paddleocr_v6/model.rs:1-128) — a
DB-style segmentation detector emitting a text-probability map at input
resolution, and an SVTR-style recognizer emitting CTC logits ``[B, T, C]``
with T = W/8. The reference executes them through its vendored ONNX
evaluator; here they are native XLA programs (SURVEY.md §6: port the small
graphs natively instead of carrying an ONNX runtime).

These are architecture-faithful compact nets with our own parameterization
(PaddlePaddle-format weights are out of scope); the pipeline accepts any
callable pair, so swapping in converted production weights is a loader task,
not an architecture change.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _conv(x, p, *, stride=1):
    """NCHW conv + bias; weights [kh, kw, Cin, Cout], SAME padding."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), "SAME",
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
    )
    return y + p["b"][None, :, None, None]


def _conv_hw(x, p, *, stride):
    """Conv with separate (sh, sw) strides (recognizer keeps width long)."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], stride, "SAME", dimension_numbers=("NCHW", "HWIO", "NCHW"),
    )
    return y + p["b"][None, :, None, None]


def _block(x, p, *, stride=1):
    return jax.nn.relu(_conv(x, p, stride=stride))


@functools.partial(jax.jit, static_argnums=())
def db_detector(params: dict, x: jax.Array) -> jax.Array:
    """[B,3,H,W] (H,W % 32 == 0) -> text probability map [B,1,H,W].

    DB shape: stride-2 backbone to /16, top-down FPN merge, head upsampled
    back to input resolution with a sigmoid binarization."""
    c1 = _block(x, params["stem"], stride=2)      # /2
    c2 = _block(c1, params["down1"], stride=2)    # /4
    c3 = _block(c2, params["down2"], stride=2)    # /8
    c4 = _block(c3, params["down3"], stride=2)    # /16

    def up2(t):
        B, C, H, W = t.shape
        return jax.image.resize(t, (B, C, H * 2, W * 2), "bilinear")

    p3 = _block(c3, params["lat2"]) + up2(_block(c4, params["lat3"]))
    p2 = _block(c2, params["lat1"]) + up2(p3)
    h = _block(p2, params["head1"])               # /4
    h = up2(up2(h))                               # /1
    return jax.nn.sigmoid(_conv(h, params["head2"]))


@functools.partial(jax.jit, static_argnames=("heads",))
def ctc_recognizer(params: dict, x: jax.Array, *, heads: int = 4) -> jax.Array:
    """[B,3,48,W] crops -> CTC logits [B, W/8, n_classes].

    SVTR shape: conv stack collapsing height 48 -> 1 while keeping width at
    W/8, then a small bidirectional transformer encoder over the width axis,
    then the CTC projection."""
    h = _block(x, params["c1"])                                   # 48 x W
    h = jax.nn.relu(_conv_hw(h, params["c2"], stride=(2, 2)))     # 24 x W/2
    h = jax.nn.relu(_conv_hw(h, params["c3"], stride=(2, 2)))     # 12 x W/4
    h = jax.nn.relu(_conv_hw(h, params["c4"], stride=(2, 2)))     # 6  x W/8
    h = jnp.max(h, axis=2)                                        # [B,C,T] height pool
    h = h.transpose(0, 2, 1)                                      # [B,T,C]

    for p in params["encoder"]:
        # pre-norm bidirectional self-attention + GELU MLP
        def ln(t, w, b):
            mu = t.mean(-1, keepdims=True)
            var = ((t - mu) ** 2).mean(-1, keepdims=True)
            return (t - mu) * jax.lax.rsqrt(var + 1e-6) * w + b

        a = ln(h, p["ln1_w"], p["ln1_b"])
        B, T, C = a.shape
        nh = heads
        qkv = (a @ p["wqkv"]).reshape(B, T, 3, nh, C // nh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bthd,bshd->bhts", q, k) * (C // nh) ** -0.5
        attn = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, C)
        h = h + o @ p["wo"]
        m = ln(h, p["ln2_w"], p["ln2_b"])
        h = h + jax.nn.gelu(m @ p["w1"]) @ p["w2"]
    return h @ params["ctc_w"] + params["ctc_b"]


def init_detector_params(channels: int = 24, seed: int = 0) -> dict:
    k = iter(jax.random.split(jax.random.PRNGKey(seed), 32))
    C = channels

    def conv(kh, kw, cin, cout):
        return {
            "w": jax.random.normal(next(k), (kh, kw, cin, cout)) * (kh * kw * cin) ** -0.5,
            "b": jnp.zeros((cout,)),
        }

    return {
        "stem": conv(3, 3, 3, C),
        "down1": conv(3, 3, C, C),
        "down2": conv(3, 3, C, 2 * C),
        "down3": conv(3, 3, 2 * C, 2 * C),
        "lat1": conv(1, 1, C, C),
        "lat2": conv(1, 1, 2 * C, C),
        "lat3": conv(1, 1, 2 * C, C),
        "head1": conv(3, 3, C, C),
        "head2": conv(3, 3, C, 1),
    }


def init_recognizer_params(
    n_classes: int, channels: int = 64, layers: int = 2, heads: int = 4, seed: int = 0
) -> dict:
    k = iter(jax.random.split(jax.random.PRNGKey(seed), 16 + 8 * layers))
    C = channels

    def conv(cin, cout):
        return {
            "w": jax.random.normal(next(k), (3, 3, cin, cout)) * (9 * cin) ** -0.5,
            "b": jnp.zeros((cout,)),
        }

    def enc():
        return {
            "ln1_w": jnp.ones((C,)), "ln1_b": jnp.zeros((C,)),
            "ln2_w": jnp.ones((C,)), "ln2_b": jnp.zeros((C,)),
            "wqkv": jax.random.normal(next(k), (C, 3 * C)) * C ** -0.5,
            "wo": jax.random.normal(next(k), (C, C)) * C ** -0.5,
            "w1": jax.random.normal(next(k), (C, 2 * C)) * C ** -0.5,
            "w2": jax.random.normal(next(k), (2 * C, C)) * (2 * C) ** -0.5,
        }

    return {
        "c1": conv(3, C // 2),
        "c2": conv(C // 2, C // 2),
        "c3": conv(C // 2, C),
        "c4": conv(C, C),
        "encoder": tuple(enc() for _ in range(layers)),
        "ctc_w": jax.random.normal(next(k), (C, n_classes)) * C ** -0.5,
        "ctc_b": jnp.zeros((n_classes,)),
    }
