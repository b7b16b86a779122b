"""Pallas TPU kernel: int8-weight matmul with per-channel scales (w8a16).

The decode gemv is HBM-bound on weight bytes; this kernel guarantees the
weights cross HBM as int8 (half of bf16) with the convert happening in VMEM,
independent of whether XLA chooses to fuse the convert into the dot
(reference analog: QMatMul's fused dequant-matmul, ops/linear.rs).

Grid: ``(O/block_o, I/block_i)`` with the contraction axis innermost
(sequential), accumulating in f32 VMEM scratch; the scale multiply happens at
the final contraction step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, c_ref, s_ref, o_ref, acc):
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


@functools.partial(jax.jit, static_argnames=("block_o", "block_i", "interpret"))
def quant_matmul_w8(
    x: jax.Array,
    codes: jax.Array,
    scales: jax.Array,
    *,
    block_o: int = 512,
    block_i: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """``y = (x @ codes) * scales`` — x ``[B, I]`` (compute dtype), codes
    ``[I, O]`` int8, scales ``[1, O]`` f32. Returns ``[B, O]`` in x.dtype."""
    B, I = x.shape
    O = codes.shape[1]
    block_i = min(block_i, I)
    block_o = min(block_o, O)
    assert I % block_i == 0 and O % block_o == 0, (I, O, block_i, block_o)

    return pl.pallas_call(
        _kernel,
        grid=(O // block_o, I // block_i),
        in_specs=[
            pl.BlockSpec((1, B, block_i), lambda o, i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_i, block_o), lambda o, i: (i, o), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_o), lambda o, i: (0, o), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, block_o), lambda o, i: (0, 0, o), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, B, O), x.dtype),
        scratch_shapes=[pltpu.VMEM((B, block_o), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=int(2 * B * I * O),
            bytes_accessed=int(I * O + B * I * 2 + B * O * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x[None], codes, scales.astype(jnp.float32))[0]
