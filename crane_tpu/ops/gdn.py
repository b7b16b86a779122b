"""Gated Delta Net (GDN) linear-attention recurrence.

Reference behavior (/root/reference/crane-core/src/ops/gdn/): per timestep
``S = S*exp(g); kv = S^T k; delta = (v - kv)*beta; S += k (x) delta;
y = S^T q`` with f32 state ``[B, H_v, K, V]``, L2-normalized q/k, ``1/sqrt(K)``
query scale, ``beta = sigmoid(b)``, ``g = -exp(A_log)*softplus(a + dt_bias)``
(backend.rs:53-148), plus a depthwise causal conv (k=4, silu) over the
``[Q|K|V]`` channels with a rolling conv state for decode (backend.rs:242-326).
The reference's CUDA kernel (kernels/cuda/gdn.cu) keeps one state column in
registers; here the same single-launch shape is a Pallas TPU kernel with the
state resident in VMEM (crane_tpu/ops/pallas/gdn_scan.py).

Numerics match HF transformers' torch_recurrent_gated_delta_rule
(qwen3_next modeling) — the parity oracle used by the tests.

``CRANE_GDN_PORTABLE=1`` forces the lax.scan reference path (mirrors the
reference's cross-check flag, README.md:386-391).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


def l2norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """FLA-style L2 normalization over the last axis (HF l2norm)."""
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + eps)
    return xf * inv


def compute_beta_g(
    b: jax.Array, a: jax.Array, a_log: jax.Array, dt_bias: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """beta = sigmoid(b); g = -exp(A_log) * softplus(a + dt_bias), in f32
    (reference backend.rs:128-148 / HF GatedDeltaNet.forward)."""
    beta = jax.nn.sigmoid(b.astype(jnp.float32))
    g = -jnp.exp(a_log.astype(jnp.float32)) * jax.nn.softplus(
        a.astype(jnp.float32) + dt_bias.astype(jnp.float32)
    )
    return beta, g


def gdn_recurrence_ref(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    g: jax.Array,
    beta: jax.Array,
    init_state: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """lax.scan reference recurrence (the portable path).

    q, k: ``[B, S, H, K]`` (already head-expanded); v: ``[B, S, H, V]``;
    g, beta: ``[B, S, H]``; init_state: ``[B, H, K, V]`` f32 or None.
    L2-norm + f32 cast + 1/sqrt(K) scale happen inside (HF kernel semantics).
    Returns (y ``[B, S, H, V]`` in v.dtype, final_state f32).
    """
    out_dtype = v.dtype
    K = q.shape[-1]
    q = l2norm(q) * (K ** -0.5)
    k = l2norm(k)
    v = v.astype(jnp.float32)
    g = g.astype(jnp.float32)
    beta = beta.astype(jnp.float32)

    B, S, H, _ = q.shape
    V = v.shape[-1]
    state0 = (
        jnp.zeros((B, H, K, V), jnp.float32)
        if init_state is None
        else init_state.astype(jnp.float32)
    )

    # time-major for scan
    qs = jnp.moveaxis(q, 1, 0)
    ks = jnp.moveaxis(k, 1, 0)
    vs = jnp.moveaxis(v, 1, 0)
    gs = jnp.moveaxis(g, 1, 0)
    bs = jnp.moveaxis(beta, 1, 0)

    def step(state, inp):
        q_t, k_t, v_t, g_t, b_t = inp
        state = state * jnp.exp(g_t)[..., None, None]
        kv = jnp.einsum("bhk,bhkv->bhv", k_t, state)
        delta = (v_t - kv) * b_t[..., None]
        state = state + jnp.einsum("bhk,bhv->bhkv", k_t, delta)
        y = jnp.einsum("bhk,bhkv->bhv", q_t, state)
        return state, y

    final_state, ys = jax.lax.scan(step, state0, (qs, ks, vs, gs, bs))
    return jnp.moveaxis(ys, 0, 1).astype(out_dtype), final_state


def gdn_recurrence_chunked(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    g: jax.Array,
    beta: jax.Array,
    init_state: jax.Array | None = None,
    *,
    chunk_size: int = 64,
) -> tuple[jax.Array, jax.Array]:
    """Chunked (parallel) gated delta rule — the MXU-native prefill path.

    Mathematically identical to the recurrence (HF torch_chunk_gated_delta_rule
    semantics): within each chunk the sequential dependency is folded into the
    inverse of a unit-lower-triangular matrix, computed here in log2(chunk)
    doubling steps — ``(I-A)^-1 = prod_i (I + A^(2^i))`` for nilpotent
    strictly-lower A — instead of the reference CUDA/torch row loop. All work
    is [n x n]/[n x K]/[K x V] matmuls; only the S/chunk cross-chunk state
    carry is sequential (lax.scan). This is why the TPU build needs no
    hand-written sequential kernel for prefill: XLA tiles these matmuls
    straight onto the MXU.
    """
    out_dtype = v.dtype
    B, S, H, K = q.shape
    V = v.shape[-1]
    n = min(chunk_size, max(S, 1))

    q = (l2norm(q) * (K ** -0.5)).astype(jnp.float32)
    k = l2norm(k).astype(jnp.float32)
    v = v.astype(jnp.float32)
    g = g.astype(jnp.float32)
    beta = beta.astype(jnp.float32)

    pad = (-S) % n
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
        beta = jnp.pad(beta, ((0, 0), (0, pad), (0, 0)))
    C = (S + pad) // n

    # -> [B, H, C, n, X]
    toc = lambda x: jnp.moveaxis(x, 2, 1).reshape(B, H, C, n, x.shape[-1])
    qc, kc, vc = toc(q), toc(k), toc(v)
    gc = jnp.moveaxis(g, 2, 1).reshape(B, H, C, n)
    bc = jnp.moveaxis(beta, 2, 1).reshape(B, H, C, n)

    v_beta = vc * bc[..., None]
    k_beta = kc * bc[..., None]

    gcum = jnp.cumsum(gc, axis=-1)  # [B,H,C,n]
    dd = gcum[..., :, None] - gcum[..., None, :]
    tril = jnp.tril(jnp.ones((n, n), bool))
    stril = jnp.tril(jnp.ones((n, n), bool), -1)
    decay_mask = jnp.where(tril, jnp.exp(jnp.where(tril, dd, 0.0)), 0.0)

    A = -(k_beta @ jnp.swapaxes(kc, -1, -2)) * decay_mask
    A = jnp.where(stril, A, 0.0)
    # T = (I - A)^-1 via doubling over the nilpotent strictly-lower A
    T = jnp.eye(n, dtype=jnp.float32) + A
    P = A
    steps = max(int(np.ceil(np.log2(n))), 1) if n > 1 else 0
    for _ in range(steps - 1):
        P = P @ P
        T = T + P @ T

    value_t = T @ v_beta  # [B,H,C,n,V]
    k_cumdecay = T @ (k_beta * jnp.exp(gcum)[..., None])

    state0 = (
        jnp.zeros((B, H, K, V), jnp.float32)
        if init_state is None
        else init_state.astype(jnp.float32)
    )
    qct = jnp.moveaxis(qc, 2, 0)  # [C,B,H,n,K]
    kct = jnp.moveaxis(kc, 2, 0)
    vt = jnp.moveaxis(value_t, 2, 0)
    kcd = jnp.moveaxis(k_cumdecay, 2, 0)
    gt = jnp.moveaxis(gcum, 2, 0)  # [C,B,H,n]
    dmt = jnp.moveaxis(decay_mask, 2, 0)

    def step(state, inp):
        q_i, k_i, v_i, kcd_i, g_i, dm_i = inp
        attn = (q_i @ jnp.swapaxes(k_i, -1, -2)) * dm_i
        attn = jnp.where(tril, attn, 0.0)
        v_prime = kcd_i @ state
        v_new = v_i - v_prime
        attn_inter = (q_i * jnp.exp(g_i)[..., None]) @ state
        out_i = attn_inter + attn @ v_new
        g_last = g_i[..., -1]
        decay_k = jnp.exp(g_last[..., None] - g_i)[..., None]
        state = state * jnp.exp(g_last)[..., None, None] + jnp.swapaxes(
            k_i * decay_k, -1, -2
        ) @ v_new
        return state, out_i

    final_state, outs = jax.lax.scan(step, state0, (qct, kct, vt, kcd, gt, dmt))
    # [C,B,H,n,V] -> [B, S, H, V]
    y = jnp.moveaxis(outs, 0, 2).reshape(B, H, C * n, V)[:, :, :S]
    y = jnp.moveaxis(y, 1, 2)
    return y.astype(out_dtype), final_state


def gdn_recurrence(
    q, k, v, g, beta, init_state=None, *, backend: str | None = None
) -> tuple[jax.Array, jax.Array]:
    """Dispatch between the chunked MXU path (default), the Pallas sequential
    kernel, and the lax.scan reference.

    Mirrors the reference's apply_recurrence dispatch with the
    CRANE_GDN_PORTABLE escape hatch (backend.rs:162-181); backend also
    selectable via CRANE_GDN_BACKEND in {chunked, pallas, scan}.
    """
    if backend is None:
        if os.environ.get("CRANE_GDN_PORTABLE") == "1":
            backend = "scan"
        else:
            backend = os.environ.get("CRANE_GDN_BACKEND", "chunked")
    if backend == "chunked":
        return gdn_recurrence_chunked(q, k, v, g, beta, init_state)
    if backend == "pallas":
        from crane_tpu.ops.pallas.gdn_scan import gdn_recurrence_pallas

        return gdn_recurrence_pallas(q, k, v, g, beta, init_state)
    return gdn_recurrence_ref(q, k, v, g, beta, init_state)


def gdn_decode_step(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    g: jax.Array,
    beta: jax.Array,
    state: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """One-token recurrence (decode): plain jnp, no scan/kernel needed.

    q, k: ``[B, H, K]``; v: ``[B, H, V]``; g, beta: ``[B, H]``;
    state: ``[B, H, K, V]`` f32. Returns (y ``[B, H, V]``, new_state).
    """
    out_dtype = v.dtype
    K = q.shape[-1]
    q = l2norm(q) * (K ** -0.5)
    k = l2norm(k)
    v = v.astype(jnp.float32)
    state = state * jnp.exp(g.astype(jnp.float32))[..., None, None]
    kv = jnp.einsum("bhk,bhkv->bhv", k, state)
    delta = (v - kv) * beta.astype(jnp.float32)[..., None]
    state = state + jnp.einsum("bhk,bhv->bhkv", k, delta)
    y = jnp.einsum("bhk,bhkv->bhv", q, state)
    return y.astype(out_dtype), state


def causal_conv1d(
    x: jax.Array,
    w: jax.Array,
    *,
    activation: bool = True,
    true_lengths: jax.Array | None = None,
    init_window: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Depthwise causal conv over time: x ``[B, S, C]``, w ``[C, k]``
    (w[:, 0] = oldest tap). Returns (y ``[B, S, C]``, conv_state ``[B, k, C]``
    holding the last k pre-activation inputs — HF conv-state layout
    transposed to time-minor for TPU lanes).

    ``true_lengths [B]`` handles bucket-padded prefill: the saved state is the
    window ending at each row's true length, not at the padded tail.

    ``init_window [B, k, C]``: a previously saved conv_state whose last k-1
    inputs form the left context (continuation prefill — the reference rolls
    this window across decode steps, backend.rs:242-326; here a chunk re-enters
    it instead of zero-padding, so chunked prefill matches whole prefill).
    """
    B, S, C = x.shape
    ksz = w.shape[-1]
    if init_window is None:
        xp = jnp.pad(x, ((0, 0), (ksz - 1, 0), (0, 0)))
    else:
        xp = jnp.concatenate([init_window[:, 1:, :].astype(x.dtype), x], axis=1)
    y = jnp.zeros((B, S, C), jnp.float32)
    for j in range(ksz):
        y = y + xp[:, j : j + S, :].astype(jnp.float32) * w[:, j].astype(jnp.float32)
    if activation:
        y = jax.nn.silu(y)
    y = y.astype(x.dtype)
    if true_lengths is None:
        # last k inputs (zero-padded on the left when S < k)
        state = jax.lax.dynamic_slice_in_dim(xp, S - 1, ksz, axis=1)
    else:
        idx = true_lengths[:, None] - 1 + jnp.arange(ksz, dtype=jnp.int32)[None, :]
        state = jnp.take_along_axis(xp, idx[:, :, None], axis=1)
    return y, state


def causal_conv1d_update(
    x_new: jax.Array, conv_state: jax.Array, w: jax.Array, *, activation: bool = True
) -> tuple[jax.Array, jax.Array]:
    """Decode-step conv: x_new ``[B, C]``, conv_state ``[B, k, C]``.

    Rolls the state and applies the depthwise kernel at the newest position
    (reference backend.rs rolling conv state; HF torch_causal_conv1d_update).
    """
    new_state = jnp.concatenate([conv_state[:, 1:, :], x_new[:, None, :]], axis=1)
    y = jnp.einsum(
        "bkc,ck->bc", new_state.astype(jnp.float32), w.astype(jnp.float32)
    )
    if activation:
        y = jax.nn.silu(y)
    return y.astype(x_new.dtype), new_state
