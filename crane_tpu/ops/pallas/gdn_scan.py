"""Pallas TPU kernel for the Gated-Delta-Net recurrence.

TPU counterpart of the reference's flagship CUDA kernel
(/root/reference/crane-core/kernels/cuda/gdn.cu): a single launch scans the
whole sequence with the recurrent state resident in fast memory. The CUDA
kernel gives one thread one state column (K floats in registers); here one
grid cell owns one (batch, head) pair's full ``[K, V]`` state in VMEM
(128x128 f32 = 64 KB) and each timestep is three 2-D MXU ops:
``kv = k_t @ S`` (matvec), ``S += k_t^T (x) delta`` (outer product), and
``y_t = q_t @ S`` — the formulation Mosaic lowers natively (batched-3D
einsums and 1-D->3-D broadcasts are not supported by the vector layout pass).

Grid: ``(B*H, S/chunk)``; the chunk axis is sequential on TPU, so the state
scratch carries across chunks — one kernel launch regardless of S, like the
reference. Per-step scalars g/beta ride in SMEM. Padded tail steps are
neutralized with ``g=0, beta=0`` (identity state update).

L2-norm + 1/sqrt(K) query scaling happen in the jnp wrapper (XLA fuses them
into the projections).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crane_tpu.ops.gdn import l2norm


def _gdn_kernel(g_ref, b_ref, q_ref, k_ref, v_ref, s0_ref, y_ref, sf_ref, state):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        state[:] = s0_ref[0]

    chunk = q_ref.shape[1]
    base = c * chunk

    def body(t, carry):
        g_t = g_ref[0, 0, base + t]  # SMEM scalar: exp(g) precomputed
        b_t = b_ref[0, 0, base + t]
        k_t = k_ref[0, pl.ds(t, 1), :]  # [1, K]
        q_t = q_ref[0, pl.ds(t, 1), :]  # [1, K]
        v_t = v_ref[0, pl.ds(t, 1), :]  # [1, V]
        st = state[:] * g_t
        kv = jnp.dot(k_t, st, preferred_element_type=jnp.float32)  # [1, V]
        delta = (v_t - kv) * b_t
        st = st + jax.lax.dot_general(
            k_t, delta, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # outer(k, delta) -> [K, V]
        y_ref[0, pl.ds(t, 1), :] = jnp.dot(
            q_t, st, preferred_element_type=jnp.float32
        )
        state[:] = st
        return carry

    jax.lax.fori_loop(0, chunk, body, 0)

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        sf_ref[0] = state[:]


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def gdn_recurrence_pallas(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    g: jax.Array,
    beta: jax.Array,
    init_state: jax.Array | None = None,
    *,
    chunk: int = 256,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Same contract as gdn_recurrence_ref: q, k ``[B, S, H, K]``,
    v ``[B, S, H, V]``, g/beta ``[B, S, H]``, init_state ``[B, H, K, V]``."""
    out_dtype = v.dtype
    B, S, H, K = q.shape
    V = v.shape[-1]
    BH = B * H

    # [B, S, H, X] -> [B*H, S, X]
    flat = lambda x: jnp.moveaxis(x, 2, 1).reshape(BH, S, x.shape[-1])
    qn = flat((l2norm(q) * (K ** -0.5)).astype(jnp.float32))
    kn = flat(l2norm(k).astype(jnp.float32))
    vf = flat(v.astype(jnp.float32))
    gexp = jnp.exp(jnp.moveaxis(g.astype(jnp.float32), 2, 1).reshape(BH, S))
    bf = jnp.moveaxis(beta.astype(jnp.float32), 2, 1).reshape(BH, S)

    chunk = min(chunk, max(S, 1))
    pad = (-S) % chunk
    if pad:
        # neutral padding: exp(g)=1, beta=0 -> identity state update
        qn = jnp.pad(qn, ((0, 0), (0, pad), (0, 0)))
        kn = jnp.pad(kn, ((0, 0), (0, pad), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, pad), (0, 0)))
        gexp = jnp.pad(gexp, ((0, 0), (0, pad)), constant_values=1.0)
        bf = jnp.pad(bf, ((0, 0), (0, pad)))
    Sp = S + pad

    s0 = (
        jnp.zeros((BH, K, V), jnp.float32)
        if init_state is None
        else init_state.astype(jnp.float32).reshape(BH, K, V)
    )

    seq_spec = lambda last: pl.BlockSpec(
        (1, chunk, last), lambda bh, c: (bh, c, 0), memory_space=pltpu.VMEM
    )
    # scalars ride whole-row in SMEM (block last-two dims must cover the
    # array dims, hence the [BH, 1, Sp] shape)
    smem_spec = pl.BlockSpec(
        (1, 1, Sp), lambda bh, c: (bh, 0, 0), memory_space=pltpu.SMEM
    )
    state_spec = pl.BlockSpec(
        (1, K, V), lambda bh, c: (bh, 0, 0), memory_space=pltpu.VMEM
    )

    y, sf = pl.pallas_call(
        _gdn_kernel,
        grid=(BH, Sp // chunk),
        in_specs=[smem_spec, smem_spec, seq_spec(K), seq_spec(K), seq_spec(V), state_spec],
        out_specs=(seq_spec(V), state_spec),
        out_shape=(
            jax.ShapeDtypeStruct((BH, Sp, V), jnp.float32),
            jax.ShapeDtypeStruct((BH, K, V), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((K, V), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=int(BH * Sp * K * V * 6),
            bytes_accessed=int(BH * Sp * (2 * K + 2 * V) * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(gexp[:, None, :], bf[:, None, :], qn, kn, vf, s0)

    y = y[:, :S].reshape(B, H, S, V).transpose(0, 2, 1, 3)
    return y.astype(out_dtype), sf.reshape(B, H, K, V)
