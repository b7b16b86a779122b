"""Elementwise activations the reference ships custom CUDA kernels for.

Reference behavior: ``snake_{f32,f16,bf16}`` (kernels/cuda/snake.cu) computes
the periodic Snake activation ``x + sin^2(alpha * x) / alpha`` used by
vocoder-style nets, and ``atan2_*`` (kernels/cuda/atan2.cu) the two-argument
arctangent for its ONNX optimizer's Atan2 fusion. On TPU both are single XLA
expressions that fuse into neighbouring ops — no custom kernels needed
(SURVEY.md §2.1: "one jnp expression").
"""

from __future__ import annotations

import jax.numpy as jnp


def snake(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Snake activation ``x + sin^2(alpha x) / alpha``.

    ``alpha`` is a positive per-channel (or scalar) frequency parameter;
    computed in f32 for stability and cast back (the bf16 CUDA kernel
    upcasts the same way). ``alpha`` of exactly 0 is the identity (limit).
    """
    xf = x.astype(jnp.float32)
    af = jnp.asarray(alpha, jnp.float32)
    s = jnp.sin(af * xf)
    out = jnp.where(af == 0.0, xf, xf + s * s / jnp.where(af == 0.0, 1.0, af))
    return out.astype(x.dtype)


def atan2(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Two-argument arctangent (reference atan2.cu) — jnp.arctan2 in f32."""
    return jnp.arctan2(y.astype(jnp.float32), x.astype(jnp.float32)).astype(y.dtype)
