"""Pallas TPU kernel: int8/int4-weight matmul with per-channel scales.

The decode gemv is HBM-bound on weight bytes; this kernel guarantees the
weights cross HBM as int8 (half of bf16) or packed int4 (a quarter) with the
convert happening in VMEM, independent of whether XLA chooses to fuse the
convert into the dot (reference analog: QMatMul's fused dequant-matmul,
ops/linear.rs; q4 formats README.md:81).

int4 packing pairs input-dim halves: ``packed[i, o] = 16 * codes[i + I/2, o]
+ codes[i, o]`` (crane_tpu.ops.linear.pack_int4_rows). The kernel unpacks in
f32 (exact: ``hi = floor((b + 8)/16)``, ``lo = b - 16*hi`` — Mosaic cannot
legalize int8 vector shifts) and runs two dots against the matching x halves,
so no lane concat is ever materialized.

Grid: ``(O/block_o, Ip/block_i)`` with the contraction axis innermost
(sequential), accumulating in f32 VMEM scratch; the per-channel scale
multiplies at the final contraction step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_w8(x_ref, c_ref, s_ref, o_ref, acc):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    xb = x_ref[0].astype(jnp.bfloat16)  # [B, I_b]
    cb = c_ref[:].astype(jnp.bfloat16)  # [I_b, O_b] — int8 -> bf16 in VMEM
    acc[:] += jnp.dot(xb, cb, preferred_element_type=jnp.float32)

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        o_ref[0] = (acc[:] * s_ref[:]).astype(o_ref.dtype)


def _kernel_w4(xlo_ref, xhi_ref, c_ref, s_ref, o_ref, acc):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    pf = c_ref[:].astype(jnp.float32)  # [I_b, O_b] packed bytes
    hi = jnp.floor((pf + 8.0) * 0.0625)
    lo = pf - 16.0 * hi
    xlo = xlo_ref[0].astype(jnp.bfloat16)
    xhi = xhi_ref[0].astype(jnp.bfloat16)
    acc[:] += jnp.dot(xlo, lo.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    acc[:] += jnp.dot(xhi, hi.astype(jnp.bfloat16), preferred_element_type=jnp.float32)

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        o_ref[0] = (acc[:] * s_ref[:]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("bits", "block_o", "block_i", "interpret")
)
def quant_matmul(
    x: jax.Array,
    codes: jax.Array,
    scales: jax.Array,
    *,
    bits: int = 8,
    block_o: int = 512,
    block_i: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """``y = (x @ dequant(codes)) * scales`` — x ``[B, I]`` (compute dtype),
    codes ``[I, O]`` int8 (bits=8) or ``[I/2, O]`` packed int4 (bits=4),
    scales ``[1, O]`` f32. Returns ``[B, O]`` in x.dtype."""
    B, I = x.shape
    O = codes.shape[1]
    Ip = codes.shape[0]  # I (int8) or I/2 (packed int4)
    block_i = min(block_i, Ip)
    block_o = min(block_o, O)
    assert Ip % block_i == 0 and O % block_o == 0, (Ip, O, block_i, block_o)

    scales = scales.astype(jnp.float32)
    common = dict(
        out_specs=pl.BlockSpec((1, B, block_o), lambda o, i: (0, 0, o)),
        out_shape=jax.ShapeDtypeStruct((1, B, O), x.dtype),
        scratch_shapes=[pltpu.VMEM((B, block_o), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=int(2 * B * I * O),
            bytes_accessed=int(Ip * O + B * I * 2 + B * O * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )
    if bits == 8:
        return pl.pallas_call(
            _kernel_w8,
            grid=(O // block_o, Ip // block_i),
            in_specs=[
                pl.BlockSpec((1, B, block_i), lambda o, i: (0, 0, i)),
                pl.BlockSpec((block_i, block_o), lambda o, i: (i, o)),
                pl.BlockSpec((1, block_o), lambda o, i: (0, o)),
            ],
            **common,
        )(x[None], codes, scales)[0]

    assert bits == 4 and I == 2 * Ip, (bits, I, Ip)
    nb = Ip // block_i
    return pl.pallas_call(
        _kernel_w4,
        grid=(O // block_o, nb),
        in_specs=[
            pl.BlockSpec((1, B, block_i), lambda o, i: (0, 0, i)),  # x lo half
            pl.BlockSpec((1, B, block_i), lambda o, i, _n=nb: (0, 0, i + _n)),  # x hi half
            pl.BlockSpec((block_i, block_o), lambda o, i: (i, o)),
            pl.BlockSpec((1, block_o), lambda o, i: (0, o)),
        ],
        **common,
    )(x[None], x[None], codes, scales)[0]


def quant_matmul_w8(x, codes, scales, **kw):
    """Backwards-compatible int8 entry point."""
    kw.pop("bits", None)
    return quant_matmul(x, codes, scales, bits=8, **kw)
