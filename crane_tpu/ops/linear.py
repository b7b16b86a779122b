"""Linear layers: dense bf16 and quantized (in-situ / GGUF) variants.

Reference behavior: crane-core's polymorphic ``LinearLayer::{Standard,
Quantized(QMatMul)}`` with in-situ quantization at load keeping peak memory low
(/root/reference/crane-core/src/ops/linear.rs). GGML block formats (q8_0,
q4_0, q4_k) use per-block scales over groups of 32/256 input elements.

TPU-native design: quantized weights are stored as int8 codes (int4 values
occupy int8 storage pre-MXU; a Pallas int4-unpack matmul is the perf follow-up)
with f32 subchannel scales ``[in/block, out]``. The matmul runs
``x_block @ w_block`` per block with scale folding — XLA fuses the dequant into
the dot's operand, so HBM traffic is the int8 bytes, which is the point of
quantization on a bandwidth-bound decode.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def pack_int4_rows(codes: jax.Array) -> jax.Array:
    """Pack int4 codes ``[I, O]`` (int8-typed, [-7, 7]) two-per-byte along
    the input dim: ``packed[i] = 16 * codes[I/2 + i] + codes[i]``. One
    arithmetic scheme shared with the KV cache (kv_cache.pack_int4 is the
    canonical last-dim implementation; this is its transpose) — both Pallas
    kernels unpack it exactly in f32, since int8 vector shifts don't
    legalize on Mosaic."""
    from crane_tpu.ops.kv_cache import pack_int4

    assert codes.shape[0] % 2 == 0, codes.shape
    return pack_int4(codes.T).T


def unpack_int4_rows(packed: jax.Array) -> jax.Array:
    from crane_tpu.ops.kv_cache import unpack_int4

    return unpack_int4(packed.T).T


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedWeight:
    """Blockwise symmetric int8/int4 weight for ``y = x @ w``.

    ``codes``: ``[in, out]`` int8 — except per-channel int4 (bits=4,
    block == in), which is nibble-packed to ``[in/2, out]`` so HBM moves a
    quarter of the bf16 bytes; ``scales``: ``[in // block, out]`` f32;
    ``block`` and ``bits`` static.
    """

    codes: jax.Array
    scales: jax.Array
    block: int = dataclasses.field(metadata=dict(static=True), default=32)
    bits: int = dataclasses.field(metadata=dict(static=True), default=8)

    @property
    def packed(self) -> bool:
        return self.bits == 4 and self.codes.shape[0] == self.block // 2

    @property
    def shape(self) -> tuple[int, int]:
        i, o = self.codes.shape
        return (2 * i if self.packed else i, o)

    def unpacked_codes(self) -> jax.Array:
        return unpack_int4_rows(self.codes) if self.packed else self.codes

    def dequant(self, dtype=jnp.bfloat16) -> jax.Array:
        codes = self.unpacked_codes()
        i, o = codes.shape
        w = codes.astype(jnp.float32).reshape(i // self.block, self.block, o)
        w = w * self.scales[:, None, :]
        return w.reshape(i, o).astype(dtype)


def quantize_weight(
    w: jax.Array, *, bits: int = 8, block: int = 32, granularity: str = "channel"
) -> QuantizedWeight:
    """In-situ symmetric quantization of a dense ``[in, out]`` weight.

    Mirrors the reference's load-then-quantize ISQ path (ops/linear.rs:80-116).
    ``granularity="channel"`` (default) uses one scale per output column —
    the decode-fast path where the int8->bf16 convert fuses into the matmul's
    operand load, so HBM traffic is the int8 bytes. ``"block"`` uses per-block
    scales along the input dim (block=32 = q8_0/q4_0 granularity) — higher
    fidelity, used for GGUF-loaded weights.
    """
    i, o = w.shape
    qmax = float(2 ** (bits - 1) - 1)
    if granularity == "channel":
        wf = w.astype(jnp.float32)
        amax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)  # [1, out]
        scale = amax / qmax
        inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
        codes = jnp.clip(jnp.round(wf * inv), -qmax, qmax).astype(jnp.int8)
        if bits == 4 and i % 2 == 0:
            codes = pack_int4_rows(codes)
        return QuantizedWeight(codes=codes, scales=scale, block=i, bits=bits)
    if i % block != 0:
        # reference falls back to Q8_0 when in_dim % 256 != 0; here we fall
        # back to a whole-column block
        block = i
    wf = w.astype(jnp.float32).reshape(i // block, block, o)
    amax = jnp.max(jnp.abs(wf), axis=1, keepdims=True)
    scale = amax / qmax
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    codes = jnp.clip(jnp.round(wf * inv), -qmax, qmax).astype(jnp.int8)
    return QuantizedWeight(
        codes=codes.reshape(i, o), scales=scale[:, 0, :], block=block, bits=bits
    )


def _w8a8_matmul(x: jax.Array, codes: jax.Array, scales: jax.Array) -> jax.Array:
    """Dynamic-activation-quant int8 matmul: per-token symmetric quant of x,
    s8 x s8 -> s32 dot (native MXU int8 path), rescale by (act * weight)
    scales. HBM reads the int8 weight bytes; the MXU runs at its int8 rate."""
    o = codes.shape[1]
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = amax / 127.0
    xq = jnp.clip(
        jnp.round(xf / jnp.where(sx > 0, sx, 1.0)), -127, 127
    ).astype(jnp.int8)
    contract = (((x.ndim - 1,), (0,)), ((), ()))
    acc = jax.lax.dot_general(xq, codes, contract, preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * sx * scales.reshape(1, o)).astype(x.dtype)


def linear(x: jax.Array, w, b: jax.Array | None = None) -> jax.Array:
    """``y = x @ w (+ b)`` for dense arrays or :class:`QuantizedWeight`."""
    if isinstance(w, QuantizedWeight):
        i, o = w.shape
        if w.block == i:
            import os

            # kernel blocks must divide the PACKED row count (I for int8,
            # I/2 for packed int4 — e.g. hidden 1536 packs to 768) and the
            # out dim; pick the largest block that fits, else fall back
            ip = w.codes.shape[0]
            bi = next((b for b in (512, 256, 128) if ip % b == 0), None)
            bo = next((b for b in (512, 256, 128) if o % b == 0), None)
            pallas_ok = (
                os.environ.get("CRANE_PALLAS_QUANT", "1" if w.packed else "0") == "1"
                and jax.default_backend() == "tpu"
                and bi is not None
                and bo is not None
            )
            x2 = x.reshape(-1, i)
            # the Pallas kernel keeps the whole token axis resident in VMEM
            # (scratch [M, block_o] f32 + [1, M, block_i] x blocks) — it is
            # the bandwidth-bound GEMV/decode path. Prefill-sized M routes
            # to the XLA dot below, which tiles M properly and is
            # compute-bound there anyway.
            if pallas_ok and x2.shape[0] <= 256:
                from crane_tpu.ops.pallas.quant_matmul import quant_matmul

                y = quant_matmul(
                    x2, w.codes, w.scales.reshape(1, o), bits=w.bits,
                    block_i=min(bi, ip), block_o=min(bo, o),
                )
                y = y.reshape(*x.shape[:-1], o)
            elif os.environ.get("CRANE_W8A8") == "1" and w.bits == 8:
                # dynamic per-token activation quant + native s8xs8->s32 MXU
                # matmul: int8 weight streaming AND double MXU rate. Error is
                # bounded by the per-token activation quant (SmoothQuant-style
                # W8A8); opt-in for q8 weights only.
                y = _w8a8_matmul(x, w.codes, w.scales)
            else:
                # per-channel scales: MIXED-dtype dot keeps the weight int8 in
                # HBM (the convert happens inside the dot's operand pipeline;
                # an explicit .astype sometimes materializes a bf16 copy).
                # Packed int4 must unpack first (XLA path; the Pallas kernel
                # above is the no-materialize path)
                codes = w.unpacked_codes()
                contract = (((x.ndim - 1,), (0,)), ((), ()))
                y = jax.lax.dot_general(
                    x, codes, contract, preferred_element_type=jnp.float32
                )
                y = (y * w.scales.reshape(1, o)).astype(x.dtype)
        else:
            # blockwise dequant-matmul (GGUF fidelity path)
            nb = i // w.block
            xb = x.reshape(*x.shape[:-1], nb, w.block).astype(jnp.float32)
            wb = w.codes.reshape(nb, w.block, o)
            y = jnp.einsum(
                "...nk,nko->...no", xb, wb.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            y = jnp.einsum("...no,no->...o", y, w.scales)
            y = y.astype(x.dtype)
    else:
        y = jnp.dot(x, w.astype(x.dtype))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y
