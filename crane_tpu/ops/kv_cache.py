"""Fixed-shape KV caches.

Reference behavior: crane-core pre-allocates ``[B, H, S+ROOM, D]`` buffers and
appends in-place via ``slice_set``, regrowing on overflow
(/root/reference/crane-core/src/models/modules/kv_cache.rs:12-101). XLA
requires static shapes, so the TPU-native design allocates ``max_seq_len`` once
per slot and never regrows (SURVEY.md §7: the amortized-growth trick becomes
"allocate max once, donate buffers"). Layout is ``[B, S, H, D]`` — the last dim
is the 128-lane axis, S is the sublane axis, which is the natural TPU tiling.

Quantized variants (int8 / nibble-packed int4 with per-token scales,
dequantize-on-read — reference qwen3_5/kv_cache.rs:26-342) are provided by
``QuantLayerKVCache``; attention fuses the dequant (the reference's stated
follow-up, done here from day one).
"""

from __future__ import annotations

import dataclasses
from typing import Union

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LayerKVCache:
    """One layer's pre-allocated KV buffer: k/v are ``[B, S_max, H_kv, D]``."""

    k: jax.Array
    v: jax.Array

    @staticmethod
    def empty(batch: int, max_seq: int, n_kv_heads: int, head_dim: int, dtype) -> "LayerKVCache":
        shape = (batch, max_seq, n_kv_heads, head_dim)
        return LayerKVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def max_seq(self) -> int:
        return self.k.shape[1]

    def update(
        self,
        k_new: jax.Array,
        v_new: jax.Array,
        positions: jax.Array,
        row: jax.Array | None = None,
    ) -> "LayerKVCache":
        """Write ``k_new/v_new`` ``[B, S_new, H, D]`` at ``positions``.

        ``positions`` is either a scalar start index (all rows share it — the
        prefill path, lowered to a dynamic-update-slice) or ``[B]`` per-row
        start indices (ragged batched decode with S_new == 1). ``row`` offsets
        the batch row for scalar-position writes (slot-targeted prefill into a
        multi-slot serving cache). Per-row positions ``>= max_seq`` are
        DROPPED (inactive-slot masking in the serving engine).
        """
        if positions.ndim == 0:
            r = jnp.asarray(0 if row is None else row, jnp.int32)
            k = jax.lax.dynamic_update_slice(self.k, k_new.astype(self.k.dtype), (r, positions, 0, 0))
            v = jax.lax.dynamic_update_slice(self.v, v_new.astype(self.v.dtype), (r, positions, 0, 0))
            return LayerKVCache(k=k, v=v)
        assert positions.ndim == 1, positions.shape
        # per-row starts; S_new == 1 is batched decode, S_new > 1 is the
        # speculative verify write (K+1 tokens per row)
        s = k_new.shape[1]
        b = jnp.arange(k_new.shape[0])[:, None]
        idx = positions[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]
        k = self.k.at[b, idx].set(k_new.astype(self.k.dtype), mode="drop")
        v = self.v.at[b, idx].set(v_new.astype(self.v.dtype), mode="drop")
        return LayerKVCache(k=k, v=v)


def pack_int4(codes: jax.Array) -> jax.Array:
    """Pack int4 codes (int8-typed, in [-7, 7]) two-per-byte along the last
    dim: ``byte = 16 * codes[D/2:] + codes[:D/2]`` (arithmetic, not bitwise).

    Max |byte| = 16*7+7 = 119, inside int8. The arithmetic scheme is chosen
    for the TPU: Mosaic cannot legalize int8 vector shifts, but the unpack
    ``hi = floor((b+8)/16); lo = b - 16*hi`` is exact in f32 (all values are
    small integers), so the Pallas kernel dequantizes with three VPU ops."""
    d = codes.shape[-1]
    assert d % 2 == 0, d
    lo, hi = codes[..., : d // 2], codes[..., d // 2 :]
    return hi * jnp.int8(16) + lo


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_int4`: ``[..., D/2]`` int8 -> ``[..., D]`` int8."""
    p = packed.astype(jnp.int16)
    hi = jnp.floor_divide(p + 8, 16)
    lo = p - 16 * hi
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.int8)


def _quant_symmetric(x: jax.Array, bits: int) -> tuple[jax.Array, jax.Array]:
    """Per-(token, head) symmetric quantization over the head_dim axis.

    Mirrors the reference's per-token symmetric scheme: scale = amax/qmax
    (qwen3_5/kv_cache.rs:209-342). Returns (int8 codes, f32 scales [..., 1]).
    For bits=4 the codes are in [-7, 7]; storage packing is the cache's job
    (:func:`pack_int4`)."""
    qmax = float(2 ** (bits - 1) - 1)
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = amax / qmax
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -qmax, qmax).astype(jnp.int8)
    return q, scale


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantLayerKVCache:
    """int8 / nibble-packed int4 KV cache with per-(token, head) scales.

    k/v codes are stored FLAT ``[B, S_max, H * stored]`` int8 (stored = D for
    bits=8, D/2 nibble-packed for bits=4 — half int8's HBM bytes, the
    reference's 0.31x long-context lever, qwen3_5/kv_cache.rs:209-342);
    column ``h * stored + j`` is byte ``j`` of head ``h``. Flat storage is a
    TPU layout decision, not cosmetics: the fused decode kernel consumes
    ``[T, H*stored]`` blocks, and a ``[B,S,H,d]`` -> ``[B,S,H*d]`` reshape on
    TPU is a full relayout copy of the buffer (tiled layouts fold all major
    dims into sublanes, so merging the two minor dims reorders bytes) — at
    32K max_seq that copy cost 16 MB *per layer per decode step* and XLA's
    layout assignment additionally ping-ponged the scan carry. Storing the
    kernel's shape makes append + fused attention copy-free.

    k_scale/v_scale: ``[B, H, S_max]`` f32 — head-major so the fused decode
    attention kernel reads a scale row per (batch, head) block without a
    per-step relayout. Dequantize-on-read; at decode time the dequant is
    fused into the Pallas attention kernel (ops/pallas/quant_attention.py),
    the reference's stated follow-up (kv_cache.rs:217-221).
    """

    k: jax.Array
    v: jax.Array
    k_scale: jax.Array
    v_scale: jax.Array
    bits: int = dataclasses.field(metadata=dict(static=True), default=8)
    n_kv_heads: int = dataclasses.field(metadata=dict(static=True), default=1)

    @staticmethod
    def empty(batch: int, max_seq: int, n_kv_heads: int, head_dim: int, dtype=None, *, bits: int = 8) -> "QuantLayerKVCache":
        del dtype  # codes are always int8; kept for signature parity
        assert bits in (4, 8), bits
        stored = head_dim // 2 if bits == 4 else head_dim
        shape = (batch, max_seq, n_kv_heads * stored)
        sshape = (batch, n_kv_heads, max_seq)
        return QuantLayerKVCache(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros(sshape, jnp.float32),
            v_scale=jnp.zeros(sshape, jnp.float32),
            bits=bits,
            n_kv_heads=n_kv_heads,
        )

    @property
    def max_seq(self) -> int:
        return self.k.shape[1]

    @property
    def head_dim(self) -> int:
        stored = self.k.shape[2] // self.n_kv_heads
        return stored * 2 if self.bits == 4 else stored

    def _encode(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        q, s = _quant_symmetric(x, self.bits)
        if self.bits == 4:
            q = pack_int4(q)
        B, S = q.shape[0], q.shape[1]
        # codes flatten to the storage layout (cheap: S_new tokens, not the
        # buffer); scales [B, S, H, 1] -> head-major [B, H, S]
        return q.reshape(B, S, -1), s[..., 0].transpose(0, 2, 1)

    def update(
        self,
        k_new: jax.Array,
        v_new: jax.Array,
        positions: jax.Array,
        row: jax.Array | None = None,
    ) -> "QuantLayerKVCache":
        kq, ks = self._encode(k_new)
        vq, vs = self._encode(v_new)
        if positions.ndim == 0:
            r = jnp.asarray(0 if row is None else row, jnp.int32)
            at = (r, positions, 0)
            sat = (r, 0, positions)
            return dataclasses.replace(
                self,
                k=jax.lax.dynamic_update_slice(self.k, kq, at),
                v=jax.lax.dynamic_update_slice(self.v, vq, at),
                k_scale=jax.lax.dynamic_update_slice(self.k_scale, ks, sat),
                v_scale=jax.lax.dynamic_update_slice(self.v_scale, vs, sat),
            )
        assert positions.ndim == 1, positions.shape
        # per-row starts; S == 1 is batched decode, S > 1 the speculative
        # verify write
        B, S = k_new.shape[0], k_new.shape[1]
        H = self.n_kv_heads
        b = jnp.arange(B)[:, None]
        p = positions[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
        bh = jnp.arange(B)[:, None, None]
        hh = jnp.arange(H)[None, :, None]
        ph = p[:, None, :]  # [B, 1, S] broadcast over heads
        return dataclasses.replace(
            self,
            k=self.k.at[b, p].set(kq, mode="drop"),
            v=self.v.at[b, p].set(vq, mode="drop"),
            k_scale=self.k_scale.at[bh, hh, ph].set(ks, mode="drop"),
            v_scale=self.v_scale.at[bh, hh, ph].set(vs, mode="drop"),
        )

    def dequant(self, compute_dtype=jnp.bfloat16) -> tuple[jax.Array, jax.Array]:
        """XLA reference read path: full dequantized K/V ``[B, S, H, D]``."""
        B, T = self.k.shape[0], self.k.shape[1]
        kc = self.k.reshape(B, T, self.n_kv_heads, -1)
        vc = self.v.reshape(B, T, self.n_kv_heads, -1)
        if self.bits == 4:
            kc, vc = unpack_int4(kc), unpack_int4(vc)
        ks = self.k_scale.transpose(0, 2, 1)[..., None]  # [B, S, H, 1]
        vs = self.v_scale.transpose(0, 2, 1)[..., None]
        k = (kc.astype(jnp.float32) * ks).astype(compute_dtype)
        v = (vc.astype(jnp.float32) * vs).astype(compute_dtype)
        return k, v


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GdnLayerCache:
    """Gated-Delta-Net layer state (reference ops/gdn/cache.rs:15-46):
    a rolling conv window + the recurrent state matrix.

    conv_state: ``[B, k, conv_dim]`` (last k pre-activation conv inputs);
    recurrent_state: ``[B, H_v, K, V]`` — always f32 (reference mandate).
    """

    conv_state: jax.Array
    recurrent_state: jax.Array

    @staticmethod
    def empty(batch: int, conv_kernel: int, conv_dim: int, n_v_heads: int,
              head_k_dim: int, head_v_dim: int, dtype=jnp.bfloat16) -> "GdnLayerCache":
        return GdnLayerCache(
            conv_state=jnp.zeros((batch, conv_kernel, conv_dim), dtype),
            recurrent_state=jnp.zeros(
                (batch, n_v_heads, head_k_dim, head_v_dim), jnp.float32
            ),
        )

    def replace_rows(
        self,
        conv_state: jax.Array,
        recurrent_state: jax.Array,
        row: jax.Array | None = None,
        active: jax.Array | None = None,
    ) -> "GdnLayerCache":
        """Write new states: whole batch, one row (slot prefill), or only
        active rows (masked batched decode)."""
        if row is not None:
            r = jnp.asarray(row, jnp.int32)
            return GdnLayerCache(
                conv_state=jax.lax.dynamic_update_slice(
                    self.conv_state, conv_state.astype(self.conv_state.dtype), (r, 0, 0)
                ),
                recurrent_state=jax.lax.dynamic_update_slice(
                    self.recurrent_state, recurrent_state, (r, 0, 0, 0)
                ),
            )
        if active is not None:
            return GdnLayerCache(
                conv_state=jnp.where(
                    active[:, None, None], conv_state.astype(self.conv_state.dtype),
                    self.conv_state,
                ),
                recurrent_state=jnp.where(
                    active[:, None, None, None], recurrent_state, self.recurrent_state
                ),
            )
        return GdnLayerCache(
            conv_state=conv_state.astype(self.conv_state.dtype),
            recurrent_state=recurrent_state,
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ConvLayerCache:
    """Short-conv layer state (LFM2-style hybrid conv layers): the rolling
    window of the last L pre-conv inputs, ``[B, L, C]``."""

    conv_state: jax.Array

    @staticmethod
    def empty(batch: int, l_cache: int, channels: int, dtype=jnp.bfloat16) -> "ConvLayerCache":
        return ConvLayerCache(conv_state=jnp.zeros((batch, l_cache, channels), dtype))

    def replace_rows(
        self,
        conv_state: jax.Array,
        row: jax.Array | None = None,
        active: jax.Array | None = None,
    ) -> "ConvLayerCache":
        if row is not None:
            return ConvLayerCache(
                conv_state=jax.lax.dynamic_update_slice(
                    self.conv_state, conv_state.astype(self.conv_state.dtype), (jnp.asarray(row, jnp.int32), 0, 0)
                )
            )
        if active is not None:
            return ConvLayerCache(
                conv_state=jnp.where(
                    active[:, None, None], conv_state.astype(self.conv_state.dtype), self.conv_state
                )
            )
        return ConvLayerCache(conv_state=conv_state.astype(self.conv_state.dtype))


AnyLayerKVCache = Union[LayerKVCache, QuantLayerKVCache]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Whole-model cache: one entry per attention layer + per-row lengths.

    ``lengths[b]`` is the number of valid tokens in row ``b`` (the next write
    position). Hybrid models (Qwen3.5 GDN) carry their recurrent state in a
    parallel structure; layers without KV have a None placeholder there.
    """

    layers: tuple
    lengths: jax.Array  # [B] int32

    @staticmethod
    def empty(n_layers: int, batch: int, max_seq: int, n_kv_heads: int, head_dim: int, dtype, *, quant_bits: int | None = None) -> "KVCache":
        if quant_bits is None:
            mk = lambda: LayerKVCache.empty(batch, max_seq, n_kv_heads, head_dim, dtype)
        else:
            mk = lambda: QuantLayerKVCache.empty(batch, max_seq, n_kv_heads, head_dim, bits=quant_bits)
        return KVCache(
            layers=tuple(mk() for _ in range(n_layers)),
            lengths=jnp.zeros((batch,), jnp.int32),
        )

    @property
    def batch(self) -> int:
        return self.lengths.shape[0]

    @property
    def max_seq(self) -> int:
        for layer in self.layers:
            if hasattr(layer, "max_seq"):
                return layer.max_seq
        return 1 << 30  # no KV layers (pure linear-attention model)

    def advanced(self, n: jax.Array | int) -> "KVCache":
        return dataclasses.replace(self, lengths=self.lengths + n)
