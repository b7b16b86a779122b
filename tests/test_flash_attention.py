"""Flash-attention kernel vs the einsum SDPA reference (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from crane_tpu.ops.attention import gqa_attention
from crane_tpu.ops.pallas.flash_attention import flash_attention_causal


def rng(*shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32
    )


@pytest.mark.parametrize(
    "B,S,Hq,Hkv,D,bq,bk",
    [
        (1, 64, 4, 2, 32, 16, 16),  # GQA, multiple blocks
        (2, 48, 2, 2, 16, 16, 32),  # ragged block sizes + padding
        (1, 16, 8, 1, 8, 16, 16),   # MQA single block
    ],
)
def test_matches_sdpa(B, S, Hq, Hkv, D, bq, bk):
    q = rng(B, S, Hq, D, seed=1)
    k = rng(B, S, Hkv, D, seed=2)
    v = rng(B, S, Hkv, D, seed=3)
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    ref = gqa_attention(q, k, v, pos, scale=D ** -0.5)
    got = flash_attention_causal(
        q, k, v, scale=D ** -0.5, block_q=bq, block_k=bk, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_first_token_attends_only_self():
    q = rng(1, 8, 2, 16, seed=5)
    k = rng(1, 8, 2, 16, seed=6)
    v = rng(1, 8, 2, 16, seed=7)
    out = flash_attention_causal(q, k, v, scale=0.25, block_q=8, block_k=8, interpret=True)
    # position 0 output == v[0] exactly (softmax over one element)
    np.testing.assert_allclose(
        np.asarray(out[0, 0]), np.asarray(v[0, 0]), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("window", [8, 24, 64])
def test_sliding_window_matches_sdpa(window):
    B, S, Hq, Hkv, D = 1, 96, 4, 2, 32
    q, k, v = rng(B, S, Hq, D, seed=1), rng(B, S, Hkv, D, seed=2), rng(B, S, Hkv, D, seed=3)
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    ref = gqa_attention(q, k, v, pos, scale=D ** -0.5, window=window)
    got = flash_attention_causal(
        q, k, v, scale=D ** -0.5, block_q=16, block_k=16, window=window,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_softcap_matches_sdpa():
    B, S, Hq, Hkv, D = 1, 64, 4, 2, 32
    q, k, v = rng(B, S, Hq, D, seed=4), rng(B, S, Hkv, D, seed=5), rng(B, S, Hkv, D, seed=6)
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    ref = gqa_attention(q, k, v, pos, scale=D ** -0.5, logit_softcap=20.0)
    got = flash_attention_causal(
        q, k, v, scale=D ** -0.5, block_q=16, block_k=32, softcap=20.0,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_windowed_softcap_combined():
    B, S, Hq, Hkv, D = 2, 48, 2, 2, 16
    q, k, v = rng(B, S, Hq, D, seed=7), rng(B, S, Hkv, D, seed=8), rng(B, S, Hkv, D, seed=9)
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    ref = gqa_attention(q, k, v, pos, scale=0.2, window=12, logit_softcap=30.0)
    got = flash_attention_causal(
        q, k, v, scale=0.2, block_q=16, block_k=16, window=12, softcap=30.0,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


# ── segments: bidirectional same-id blocks (Gemma3-VLM image runs) ──────────


def _seg_extra_mask(seg):
    """[B, S] int32 -> extra_mask [B, S, S]: same positive id attends
    bidirectionally (gemma3_vl.py's image-block mask)."""
    same = seg[:, :, None] == seg[:, None, :]
    pos = seg[:, :, None] > 0
    return same & pos


@pytest.mark.parametrize("window,softcap", [(None, None), (24, None),
                                            (None, 25.0)])
def test_segments_match_extra_mask_path(window, softcap):
    B, S, Hq, Hkv, D = 1, 96, 4, 2, 32
    q, k, v = rng(B, S, Hq, D, seed=11), rng(B, S, Hkv, D, seed=12), rng(B, S, Hkv, D, seed=13)
    seg = np.zeros((B, S), np.int32)
    seg[0, 10:42] = 1   # one image run spanning block boundaries
    seg[0, 60:75] = 2   # second image
    seg = jnp.asarray(seg)
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    ref = gqa_attention(
        q, k, v, pos, scale=D ** -0.5, window=window, logit_softcap=softcap,
        extra_mask=_seg_extra_mask(seg),
    )
    got = flash_attention_causal(
        q, k, v, seg, scale=D ** -0.5, block_q=16, block_k=16,
        window=window, softcap=softcap, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_segments_above_diagonal_blocks_not_skipped():
    """An image run far above the causal diagonal of its queries must still
    be attended (the data-dependent block-skip predicate)."""
    B, S, Hq, Hkv, D = 1, 128, 2, 2, 16
    q, k, v = rng(B, S, Hq, D, seed=14), rng(B, S, Hkv, D, seed=15), rng(B, S, Hkv, D, seed=16)
    seg = np.zeros((B, S), np.int32)
    seg[0, 8:120] = 3  # one run spanning nearly everything
    seg = jnp.asarray(seg)
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    ref = gqa_attention(q, k, v, pos, scale=0.25, extra_mask=_seg_extra_mask(seg))
    got = flash_attention_causal(
        q, k, v, seg, scale=0.25, block_q=16, block_k=16, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_no_segments_unchanged():
    B, S, Hq, Hkv, D = 1, 64, 4, 2, 32
    q, k, v = rng(B, S, Hq, D, seed=17), rng(B, S, Hkv, D, seed=18), rng(B, S, Hkv, D, seed=19)
    a = flash_attention_causal(q, k, v, scale=D ** -0.5, block_q=16,
                               block_k=16, interpret=True)
    z = flash_attention_causal(q, k, v, jnp.zeros((B, S), jnp.int32),
                               scale=D ** -0.5, block_q=16, block_k=16,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(z), rtol=1e-6, atol=1e-6)


# ── cached-continuation kernel ──────────────────────────────────────────────

from crane_tpu.ops.pallas.flash_attention import flash_attention_cached


@pytest.mark.parametrize(
    "B,ctx,S,T,Hq,Hkv,D,bq,bk",
    [
        (1, 40, 32, 128, 4, 2, 32, 16, 16),   # GQA continuation mid-buffer
        (2, 17, 48, 96, 2, 2, 16, 16, 32),    # ragged ctx, padded q blocks
        (1, 0, 32, 64, 8, 1, 8, 16, 16),      # fresh (ctx=0) through the cached kernel
    ],
)
def test_cached_matches_sdpa(B, ctx, S, T, Hq, Hkv, D, bq, bk):
    """Continuation chunk at positions ctx..ctx+S-1 over full cache buffers
    must reproduce the einsum path (which masks by query position)."""
    q = rng(B, S, Hq, D, seed=1)
    k = rng(B, T, Hkv, D, seed=2)
    v = rng(B, T, Hkv, D, seed=3)
    positions = jnp.broadcast_to(jnp.arange(S)[None] + ctx, (B, S)).astype(jnp.int32)
    ref = gqa_attention(q, k, v, positions, scale=D ** -0.5)
    got = flash_attention_cached(
        q, k, v, positions, scale=D ** -0.5, block_q=bq, block_k=bk,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("window", [8, 24])
def test_cached_sliding_window_matches_sdpa(window):
    B, ctx, S, T, Hq, Hkv, D = 1, 30, 32, 128, 4, 2, 32
    q = rng(B, S, Hq, D, seed=4)
    k = rng(B, T, Hkv, D, seed=5)
    v = rng(B, T, Hkv, D, seed=6)
    positions = (jnp.arange(S)[None] + ctx).astype(jnp.int32)
    ref = gqa_attention(q, k, v, positions, scale=D ** -0.5, window=window)
    got = flash_attention_cached(
        q, k, v, positions, scale=D ** -0.5, window=window,
        block_q=16, block_k=16, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_cached_softcap_matches_sdpa():
    B, ctx, S, T, Hq, Hkv, D = 1, 20, 16, 64, 2, 2, 16
    q = rng(B, S, Hq, D, seed=7) * 3
    k = rng(B, T, Hkv, D, seed=8) * 3
    v = rng(B, T, Hkv, D, seed=9)
    positions = (jnp.arange(S)[None] + ctx).astype(jnp.int32)
    ref = gqa_attention(q, k, v, positions, scale=D ** -0.5, logit_softcap=30.0)
    got = flash_attention_cached(
        q, k, v, positions, scale=D ** -0.5, softcap=30.0,
        block_q=16, block_k=16, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-5)


def test_cached_garbage_beyond_live_region_ignored():
    """Slots past the live region hold stale data from a previous occupant;
    causal masking by absolute position must make them invisible."""
    B, ctx, S, T, Hq, Hkv, D = 1, 24, 16, 128, 2, 2, 16
    q = rng(B, S, Hq, D, seed=10)
    k = rng(B, T, Hkv, D, seed=11)
    v = rng(B, T, Hkv, D, seed=12)
    positions = (jnp.arange(S)[None] + ctx).astype(jnp.int32)
    out1 = flash_attention_cached(q, k, v, positions, scale=D ** -0.5,
                                  block_q=16, block_k=16, interpret=True)
    live = ctx + S
    k2 = k.at[:, live:].set(99.0)  # poison the dead region
    v2 = v.at[:, live:].set(-77.0)
    out2 = flash_attention_cached(q, k2, v2, positions, scale=D ** -0.5,
                                  block_q=16, block_k=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_cached_bucket_padded_positions():
    """Positions may run past the buffer for bucket-pad tail queries; real
    rows must be unaffected by the clamp."""
    B, ctx, S, T, Hq, Hkv, D = 1, 100, 32, 128, 2, 2, 16
    # true chunk is 20 tokens; 12 pad rows carry positions 120..131 > T-1
    q = rng(B, S, Hq, D, seed=13)
    k = rng(B, T, Hkv, D, seed=14)
    v = rng(B, T, Hkv, D, seed=15)
    positions = (jnp.arange(S)[None] + ctx).astype(jnp.int32)
    got = flash_attention_cached(q, k, v, positions, scale=D ** -0.5,
                                 block_q=16, block_k=16, interpret=True)
    true_S = 20
    ref = gqa_attention(q[:, :true_S], k, v, positions[:, :true_S], scale=D ** -0.5)
    np.testing.assert_allclose(np.asarray(got[:, :true_S]), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    assert np.isfinite(np.asarray(got)).all()  # pad rows defined, no NaN
