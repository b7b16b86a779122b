"""In-graph sampling — greedy, temperature, top-k, top-p, repetition penalty.

Reference behavior: crane-serve samples on-GPU to avoid DtoH copies — greedy
via a two-phase argmax kernel, categorical via Gumbel-max, top-k capped at 64,
top-p via cumsum masking over the top-k candidates, in-place scatter/gather
repetition penalty (/root/reference/crane-serve/src/engine/sampling.rs).

TPU-native design: all of it is ONE jitted XLA program — ``jnp.argmax`` /
``lax.top_k`` / Gumbel-max replace the hand-written CUDA kernels (SURVEY.md §7
translation table); the sampled token never leaves the device inside the
decode loop. Per-request parameters are batched arrays so one compiled program
serves heterogeneous requests; only ``top_k_cap`` and the repetition window
are static.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

_NEG_INF = float(jnp.finfo(jnp.float32).min)

# Reference default cap for the GPU top-k path (engine/sampling.rs:22-128).
DEFAULT_TOP_K_CAP = 64


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SamplingParams:
    """Per-row sampling parameters, batched ``[B]`` arrays.

    ``do_sample=False`` rows take the greedy argmax regardless of the rest
    (reference GenerationConfig, generation/mod.rs:64-108).
    """

    temperature: jax.Array  # [B] f32
    top_k: jax.Array  # [B] i32 (<= top_k_cap; 0 or cap = disabled)
    top_p: jax.Array  # [B] f32 (1.0 = disabled)
    repetition_penalty: jax.Array  # [B] f32 (1.0 = disabled)
    do_sample: jax.Array  # [B] bool

    @staticmethod
    def make(
        batch: int,
        *,
        temperature: float = 1.0,
        top_k: int = 0,
        top_p: float = 1.0,
        repetition_penalty: float = 1.0,
        do_sample: bool = True,
    ) -> "SamplingParams":
        full = lambda v, dt: jnp.full((batch,), v, dt)
        return SamplingParams(
            temperature=full(temperature, jnp.float32),
            top_k=full(top_k, jnp.int32),
            top_p=full(top_p, jnp.float32),
            repetition_penalty=full(repetition_penalty, jnp.float32),
            do_sample=full(do_sample, jnp.bool_),
        )


def apply_repetition_penalty(
    logits: jax.Array,
    recent_tokens: jax.Array,
    penalty: jax.Array,
) -> jax.Array:
    """Penalize tokens present in the recent window.

    logits ``[B, V]`` f32; recent_tokens ``[B, W]`` int32 with -1 padding;
    penalty ``[B]``. Positive logits are divided by the penalty, negative
    multiplied (HF semantics, mirrored by engine/sampling.rs:356-382).
    """
    valid = recent_tokens >= 0
    idx = jnp.where(valid, recent_tokens, 0)
    b = jnp.arange(logits.shape[0])[:, None]
    # order-independent membership mask (duplicates and -1 padding are safe)
    seen = jnp.zeros(logits.shape, jnp.bool_).at[b, idx].max(valid)
    p = penalty[:, None]
    return jnp.where(seen, jnp.where(logits > 0, logits / p, logits * p), logits)


def _exact_top_p_sample(
    scaled: jax.Array, top_p: jax.Array, top_k: jax.Array, key: jax.Array
) -> jax.Array:
    """Full-vocab exact nucleus sampling (the slow path): sort the whole
    distribution and keep exactly the sorted top-p prefix, further capped by
    the row's ``top_k`` (a top_k wider than the fast path's candidate cap
    still binds here). Rank-based masking, so tokens tied with the cutoff
    value do NOT widen the nucleus past the sorted prefix."""
    B, V = scaled.shape
    order = jnp.argsort(scaled, axis=-1)[:, ::-1]  # descending token ids
    b = jnp.arange(B)[:, None]
    pos = jnp.broadcast_to(jnp.arange(V, dtype=jnp.int32)[None, :], (B, V))
    rank = jnp.zeros((B, V), jnp.int32).at[b, order].set(pos)
    sorted_vals = jnp.take_along_axis(scaled, order, axis=-1)
    probs = jax.nn.softmax(sorted_vals, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_sorted = (cum - probs) < top_p[:, None]  # always keeps rank 0
    n_keep = jnp.sum(keep_sorted.astype(jnp.int32), axis=-1)
    k_eff = jnp.where(top_k > 0, top_k, V)
    n_keep = jnp.minimum(n_keep, k_eff)
    masked = jnp.where(rank < n_keep[:, None], scaled, _NEG_INF)
    gumbel = jax.random.gumbel(key, scaled.shape, dtype=jnp.float32)
    return jnp.argmax(masked + gumbel, axis=-1).astype(jnp.int32)


def sample(
    logits: jax.Array,
    params: SamplingParams,
    recent_tokens: jax.Array,
    key: jax.Array,
    *,
    top_k_cap: int = DEFAULT_TOP_K_CAP,
) -> jax.Array:
    """Sample one token per row from ``logits`` ``[B, V]``. Returns ``[B]`` i32.

    Fast path: the candidate set is the static top-``top_k_cap`` logits;
    per-row dynamic ``top_k``/``top_p`` mask within it, then Gumbel-max —
    the reference's GPU fast path (sampling.rs:282-349). When a row's nucleus
    is wider than the cap (cum prob of the top-cap set < top_p), the
    reference falls back to exact CPU sampling (sampling.rs:206-239); here the
    fallback is an in-graph full-vocab sort under ``lax.cond``, so the cost is
    paid only on steps where some row actually truncates — the token still
    never leaves the device.
    """
    logits = logits.astype(jnp.float32)
    logits = apply_repetition_penalty(logits, recent_tokens, params.repetition_penalty)

    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def _sample_branch() -> jax.Array:
        temp = jnp.maximum(params.temperature, 1e-6)[:, None]
        scaled = logits / temp
        cap = min(top_k_cap, logits.shape[-1])
        top_vals, top_idx = jax.lax.top_k(scaled, cap)  # sorted desc

        pos = jnp.arange(cap, dtype=jnp.int32)[None, :]
        k = jnp.where(params.top_k > 0, jnp.minimum(params.top_k, cap), cap)[:, None]
        top_vals = jnp.where(pos < k, top_vals, _NEG_INF)

        # nucleus-truncation detection: true probability mass of the candidate
        # set within the FULL distribution (not the renormalized one)
        lse_full = jax.nn.logsumexp(scaled, axis=-1)
        lse_cand = jax.nn.logsumexp(top_vals, axis=-1)
        cand_mass = jnp.exp(lse_cand - lse_full)
        unrestricted_k = (params.top_k <= 0) | (params.top_k >= cap)
        truncated = (
            params.do_sample
            & unrestricted_k
            & (params.top_p < 1.0)
            & (cand_mass < params.top_p)
        )

        probs = jax.nn.softmax(top_vals, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = (cum - probs) < params.top_p[:, None]  # always keeps rank 0
        top_vals = jnp.where(keep, top_vals, _NEG_INF)

        gumbel = jax.random.gumbel(key, top_vals.shape, dtype=jnp.float32)
        choice = jnp.argmax(top_vals + gumbel, axis=-1)
        fast = jnp.take_along_axis(top_idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)

        return jax.lax.cond(
            jnp.any(truncated),
            lambda: jnp.where(
                truncated,
                _exact_top_p_sample(scaled, params.top_p, params.top_k, key),
                fast,
            ),
            lambda: fast,
        )

    # the full candidate machinery (a 151k-vocab top_k sort, softmax, gumbel)
    # costs ~70 us/step on a v5e — measured 3% of bf16 decode — so greedy-only
    # steps skip it entirely: lax.cond executes one branch at run time, and
    # all-greedy is the common serving case (do_sample rows pay as before)
    sampled = jax.lax.cond(jnp.any(params.do_sample), _sample_branch, lambda: greedy)

    return jnp.where(params.do_sample, sampled, greedy).astype(jnp.int32)


def update_recent(recent_tokens: jax.Array, new_tokens: jax.Array) -> jax.Array:
    """Shift the recent-token ring left and append ``new_tokens`` ``[B]``."""
    return jnp.concatenate(
        [recent_tokens[:, 1:], new_tokens[:, None].astype(recent_tokens.dtype)],
        axis=-1,
    )
