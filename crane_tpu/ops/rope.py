"""Rotary position embeddings (RoPE).

Reference behavior: crane-core precomputes half-width cos/sin tables
``[max_pos, dim/2]`` and applies either half-split (GPT-NeoX / HF default) or
interleaved rotation, with zero-copy narrows per step
(/root/reference/crane-core/src/models/modules/rotary.rs:5-91).

TPU-native design: tables are small f32 arrays resident on device; application
is a gather on per-token positions followed by fused elementwise math — XLA
fuses the whole thing into the surrounding attention projections. Positions are
explicit ``[B, S]`` arrays so batched decode with ragged per-sequence offsets
is one jitted program (the reference gathers per-seq rope rows the same way,
qwen3/modeling.rs:1164-1197).

Partial-rotary + 3-D multimodal MRoPE (Qwen3.5 / VL) lives in
:func:`apply_mrope` — see qwen3_5/modeling.rs:94-272.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def rope_table(
    rot_dim: int,
    max_pos: int,
    *,
    theta: float = 10000.0,
) -> tuple[jax.Array, jax.Array]:
    """Half-width cos/sin tables, each ``[max_pos, rot_dim // 2]`` f32."""
    assert rot_dim % 2 == 0
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, rot_dim, 2, dtype=jnp.float32) / rot_dim)
    )
    t = jnp.arange(max_pos, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)
    return jnp.cos(freqs), jnp.sin(freqs)


def _rotate_half_split(x: jax.Array, c: jax.Array, s: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate((x1 * c - x2 * s, x2 * c + x1 * s), axis=-1)


def _rotate_interleaved(x: jax.Array, c: jax.Array, s: jax.Array) -> jax.Array:
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    out = jnp.stack((x1 * c - x2 * s, x2 * c + x1 * s), axis=-1)
    return out.reshape(x.shape)


def apply_rope(
    x: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    positions: jax.Array,
    *,
    mode: str = "half",
) -> jax.Array:
    """Apply RoPE to ``x`` of shape ``[B, S, H, D]``.

    ``cos``/``sin`` are half-width tables ``[max_pos, R/2]`` with
    ``R = 2 * cos.shape[-1] <= D`` (partial rotary passes the tail through).
    ``positions`` is ``[B, S]`` int32. ``mode`` is ``"half"`` (NeoX/HF) or
    ``"interleaved"`` (reference RopeMode::Interleaved, rotary.rs:64-91).
    """
    rot = 2 * cos.shape[-1]
    compute_dtype = x.dtype
    c = cos[positions][:, :, None, :].astype(jnp.float32)  # [B,S,1,R/2]
    s = sin[positions][:, :, None, :].astype(jnp.float32)
    xr = x[..., :rot].astype(jnp.float32)
    if mode == "half":
        rotated = _rotate_half_split(xr, c, s)
    elif mode == "interleaved":
        rotated = _rotate_interleaved(xr, c, s)
    else:
        raise ValueError(f"unknown rope mode: {mode!r}")
    rotated = rotated.astype(compute_dtype)
    if rot == x.shape[-1]:
        return rotated
    return jnp.concatenate((rotated, x[..., rot:]), axis=-1)


def apply_rope_embeds(
    x: jax.Array,
    cos_bs: jax.Array,
    sin_bs: jax.Array,
    *,
    mode: str = "half",
) -> jax.Array:
    """Apply RoPE with pre-gathered per-token half-width tables.

    x ``[B, S, H, D]``; cos_bs/sin_bs ``[B, S, R/2]``. Used when positions are
    not scalar indices into a table — e.g. 3-D multimodal MRoPE where cos/sin
    are mixed from T/H/W position streams (qwen3_5/modeling.rs:94-272).
    """
    rot = 2 * cos_bs.shape[-1]
    compute_dtype = x.dtype
    c = cos_bs[:, :, None, :].astype(jnp.float32)
    s = sin_bs[:, :, None, :].astype(jnp.float32)
    xr = x[..., :rot].astype(jnp.float32)
    if mode == "half":
        rotated = _rotate_half_split(xr, c, s)
    elif mode == "interleaved":
        rotated = _rotate_interleaved(xr, c, s)
    else:
        raise ValueError(f"unknown rope mode: {mode!r}")
    rotated = rotated.astype(compute_dtype)
    if rot == x.shape[-1]:
        return rotated
    return jnp.concatenate((rotated, x[..., rot:]), axis=-1)


def mrope_cos_sin(
    positions3: jax.Array,
    rot_dim: int,
    mrope_section: tuple[int, int, int],
    *,
    theta: float = 10000.0,
) -> tuple[jax.Array, jax.Array]:
    """Interleaved multimodal RoPE tables from 3-D (T, H, W) positions.

    positions3 ``[3, B, S]`` -> (cos, sin) each ``[B, S, rot_dim/2]``.
    Frequency columns are owned T/H/W interleaved: column i belongs to H when
    ``i % 3 == 1 and i < 3*sec_h``, to W when ``i % 3 == 2 and i < 3*sec_w``,
    else to T — HF Qwen3VL apply_interleaved_mrope semantics (matching the
    reference's index-interleaved MRoPE, qwen3_5/modeling.rs:94-238). For
    text-only spans (all three streams equal) this reduces to standard RoPE.
    """
    half = rot_dim // 2
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, rot_dim, 2, dtype=jnp.float32) / rot_dim)
    )
    freqs = positions3[..., None].astype(jnp.float32) * inv_freq  # [3,B,S,half]
    sec_t, sec_h, sec_w = mrope_section
    idx = jnp.arange(half)
    own_h = (idx % 3 == 1) & (idx < 3 * sec_h)
    own_w = (idx % 3 == 2) & (idx < 3 * sec_w)
    mixed = jnp.where(own_h, freqs[1], jnp.where(own_w, freqs[2], freqs[0]))
    return jnp.cos(mixed), jnp.sin(mixed)


@functools.partial(jax.jit, static_argnames=("mode",))
def apply_rope_jit(x, cos, sin, positions, *, mode: str = "half"):
    return apply_rope(x, cos, sin, positions, mode=mode)
