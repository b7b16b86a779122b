"""Qwen3-VL vision tower: ViT with 2-D RoPE, interpolated pos embeds,
2x2 patch merger, DeepStack feature taps.

TPU-native counterpart of the reference's vision stack
(/root/reference/crane-core/src/models/qwen3_5/vision.rs:13-59,306-558 and
modules/siglip2.rs): the Conv3d patch embed (kernel == stride) is a single
matmul over flattened patches; attention is full/bidirectional so it's one
batched SDPA on the MXU; everything jits into one XLA program per image-grid
shape. Host-side code precomputes only shape-dependent index/weight arrays
(2-D rope positions, bilinear pos-embed taps) — no tensor math off-device.

Numerics match HF transformers Qwen3VLVisionModel (the parity oracle).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    depth: int
    hidden_size: int
    intermediate_size: int
    num_heads: int
    patch_size: int
    temporal_patch_size: int
    spatial_merge_size: int
    out_hidden_size: int
    in_channels: int = 3
    num_position_embeddings: int = 2304
    deepstack_indexes: tuple[int, ...] = ()
    eps: float = 1e-6
    act: str = "gelu_tanh"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size ** 2

    @property
    def merge_unit(self) -> int:
        return self.spatial_merge_size ** 2


def layer_norm(x: jax.Array, w: jax.Array, b: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def _act(cfg: VisionConfig, x):
    if cfg.act == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    if cfg.act == "gelu":
        return jax.nn.gelu(x, approximate=False)
    return jax.nn.silu(x)


# -- host-side shape-dependent precomputation --------------------------------


def vision_rope_positions(grid_thw: tuple[int, int, int], merge_size: int) -> np.ndarray:
    """(row, col) per patch in merge-block-major order -> ``[S, 2]`` int32."""
    t, h, w = grid_thw
    mh, mw = h // merge_size, w // merge_size
    rows = (
        np.arange(mh)[:, None, None, None] * merge_size
        + np.arange(merge_size)[None, None, :, None]
    )
    cols = (
        np.arange(mw)[None, :, None, None] * merge_size
        + np.arange(merge_size)[None, None, None, :]
    )
    rows = np.broadcast_to(rows, (mh, mw, merge_size, merge_size)).reshape(-1)
    cols = np.broadcast_to(cols, (mh, mw, merge_size, merge_size)).reshape(-1)
    coords = np.stack([rows, cols], axis=-1)
    if t > 1:
        coords = np.tile(coords, (t, 1))
    return coords.astype(np.int32)


def vision_rope_tables(cfg: VisionConfig, grid_thw) -> tuple[np.ndarray, np.ndarray]:
    """Full-width cos/sin ``[S, head_dim]`` from 2-D patch positions (HF
    rot_pos_emb: half from rows, half from cols, duplicated)."""
    dim = cfg.head_dim // 2  # rotary dim per spatial axis (quarter pairs)
    inv = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    pos = vision_rope_positions(grid_thw, cfg.spatial_merge_size)  # [S,2]
    freqs = pos[:, :, None].astype(np.float64) * inv[None, None, :]  # [S,2,dim/2]
    half = freqs.reshape(pos.shape[0], -1)  # [S, dim] == [S, head_dim/2]
    emb = np.concatenate([half, half], axis=-1)
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def pos_embed_bilinear_taps(
    cfg: VisionConfig, grid_thw
) -> tuple[np.ndarray, np.ndarray]:
    """4-tap bilinear interpolation over the learned grid pos embeds (HF
    fast_pos_embed_interpolate): returns (idx ``[4, S]``, weight ``[4, S]``)
    already permuted to merge-block-major patch order."""
    t, h, w = grid_thw
    side = int(round(cfg.num_position_embeddings ** 0.5))
    h_idx = np.linspace(0, side - 1, h)
    w_idx = np.linspace(0, side - 1, w)
    hf, wf = h_idx.astype(np.int64), w_idx.astype(np.int64)
    hc = np.clip(hf + 1, None, side - 1)
    wc = np.clip(wf + 1, None, side - 1)
    dh, dw = h_idx - hf, w_idx - wf
    idx = np.stack(
        [
            (hf[:, None] * side + wf[None, :]).ravel(),
            (hf[:, None] * side + wc[None, :]).ravel(),
            (hc[:, None] * side + wf[None, :]).ravel(),
            (hc[:, None] * side + wc[None, :]).ravel(),
        ]
    )
    wgt = np.stack(
        [
            ((1 - dh)[:, None] * (1 - dw)[None, :]).ravel(),
            ((1 - dh)[:, None] * dw[None, :]).ravel(),
            (dh[:, None] * (1 - dw)[None, :]).ravel(),
            (dh[:, None] * dw[None, :]).ravel(),
        ]
    )
    # permute from (h, w) raster order to merge-block-major + tile over t
    m = cfg.spatial_merge_size
    order = (
        np.arange(h * w)
        .reshape(h // m, m, w // m, m)
        .transpose(0, 2, 1, 3)
        .reshape(-1)
    )
    idx = np.tile(idx[:, order], (1, t))
    wgt = np.tile(wgt[:, order], (1, t))
    return idx.astype(np.int32), wgt.astype(np.float32)


# -- jitted vision forward ---------------------------------------------------


def vision_block(cfg: VisionConfig, p: dict, x: jax.Array, cos, sin) -> jax.Array:
    """One ViT block over ``[S, E]`` (bidirectional, single image)."""
    S = x.shape[0]
    H, D = cfg.num_heads, cfg.head_dim
    h = layer_norm(x, p["ln1_w"], p["ln1_b"], cfg.eps)
    qkv = jnp.dot(h, p["qkv_w"].astype(h.dtype)) + p["qkv_b"].astype(h.dtype)
    q, k, v = jnp.split(qkv.reshape(S, 3, H, D), 3, axis=1)
    q, k, v = q[:, 0], k[:, 0], v[:, 0]  # [S, H, D]

    def rot(u):
        uf = u.astype(jnp.float32)
        c = cos[:, None, :]
        s = sin[:, None, :]
        u1, u2 = jnp.split(uf, 2, axis=-1)
        rotated = jnp.concatenate([-u2, u1], axis=-1)
        return (uf * c + rotated * s).astype(u.dtype)

    q, k = rot(q), rot(k)
    logits = jnp.einsum("shd,thd->hst", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * (D ** -0.5), axis=-1)
    o = jnp.einsum("hst,thd->shd", probs.astype(v.dtype), v)
    o = jnp.dot(o.reshape(S, H * D), p["proj_w"].astype(x.dtype)) + p["proj_b"].astype(x.dtype)
    x = x + o
    h = layer_norm(x, p["ln2_w"], p["ln2_b"], cfg.eps)
    h = jnp.dot(h, p["fc1_w"].astype(h.dtype)) + p["fc1_b"].astype(h.dtype)
    h = _act(cfg, h)
    h = jnp.dot(h, p["fc2_w"].astype(h.dtype)) + p["fc2_b"].astype(h.dtype)
    return x + h


def patch_merger(cfg: VisionConfig, p: dict, x: jax.Array, *, postshuffle: bool) -> jax.Array:
    """[S, E] -> [S/merge_unit, out_hidden]."""
    unit = cfg.merge_unit
    if postshuffle:
        h = layer_norm(x.reshape(-1, unit * cfg.hidden_size), p["ln_w"], p["ln_b"], cfg.eps)
    else:
        h = layer_norm(x, p["ln_w"], p["ln_b"], cfg.eps).reshape(-1, unit * cfg.hidden_size)
    h = jnp.dot(h, p["fc1_w"].astype(h.dtype)) + p["fc1_b"].astype(h.dtype)
    h = jax.nn.gelu(h, approximate=False)
    return jnp.dot(h, p["fc2_w"].astype(h.dtype)) + p["fc2_b"].astype(h.dtype)


def vision_forward(
    cfg: VisionConfig,
    params: dict,
    patches: jax.Array,  # [S, patch_dim]
    pos_idx: jax.Array,  # [4, S]
    pos_weight: jax.Array,  # [4, S]
    rope_cos: jax.Array,  # [S, head_dim]
    rope_sin: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Returns (merged features ``[S/unit, out_hidden]``, deepstack features
    ``[n_taps, S/unit, out_hidden]``)."""
    x = jnp.dot(patches.astype(params["patch_w"].dtype), params["patch_w"]) + params["patch_b"]
    pos = jnp.einsum(
        "kse,ks->se", params["pos_embed"][pos_idx].astype(jnp.float32), pos_weight
    )
    x = x + pos.astype(x.dtype)

    taps = []
    for i in range(cfg.depth):
        x = vision_block(cfg, params["blocks"][i], x, rope_cos, rope_sin)
        if i in cfg.deepstack_indexes:
            j = cfg.deepstack_indexes.index(i)
            taps.append(
                patch_merger(cfg, params["deepstack"][j], x, postshuffle=True)
            )
    out = patch_merger(cfg, params["merger"], x, postshuffle=False)
    if taps:
        return out, jnp.stack(taps)
    return out, jnp.zeros((0,) + out.shape, out.dtype)
