"""Normalization ops.

Reference behavior: crane-core RmsNorm layers always normalize in f32 and cast
back (e.g. /root/reference/crane-core/src/models/qwen3_5/modeling.rs:27-75,
which also implements the unit-offset (1+w) variant used by Qwen3.5 and Gemma).
On TPU these are plain jnp expressions — XLA fuses them into neighbors, so no
custom kernel is needed (SURVEY.md §7 translation table).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(
    x: jax.Array,
    weight: jax.Array,
    *,
    eps: float = 1e-6,
    weight_offset: float = 0.0,
) -> jax.Array:
    """RMSNorm computed in f32, cast back to x.dtype.

    ``weight_offset=1.0`` gives the unit-offset variant ``x_hat * (1 + w)``
    used by Qwen3.5 / Gemma (reference qwen3_5/modeling.rs:27-75).
    """
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    w = weight.astype(jnp.float32)
    if weight_offset != 0.0:
        w = w + weight_offset
    return (normed * w).astype(x.dtype)


def gated_rms_norm(
    x: jax.Array,
    gate: jax.Array,
    weight: jax.Array,
    *,
    eps: float = 1e-6,
) -> jax.Array:
    """RMSNorm(x) * silu(gate) — the GDN output norm.

    Reference: RmsNormGated (ops/gdn/norm.rs:17-50): normalize x in f32,
    scale by weight, then multiply by silu(gate).
    """
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    g = gate.astype(jnp.float32)
    out = normed * (g * jax.nn.sigmoid(g))
    return out.astype(x.dtype)
