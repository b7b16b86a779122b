"""Op-level invariant tests, modeled on the reference's unit-test style
(SURVEY.md §4): mathematical invariants on synthetic weights, no checkpoints."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crane_tpu.ops.attention import gqa_attention
from crane_tpu.ops.kv_cache import KVCache, LayerKVCache, QuantLayerKVCache
from crane_tpu.ops.linear import linear, quantize_weight
from crane_tpu.ops.norm import gated_rms_norm, rms_norm
from crane_tpu.ops.rope import apply_rope, rope_table
from crane_tpu.ops.sampling import (
    SamplingParams,
    apply_repetition_penalty,
    sample,
    update_recent,
)


def rng(*shape, seed=0, dtype=np.float32):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape), dtype)


class TestNorm:
    def test_rms_norm_matches_manual(self):
        x = rng(2, 5, 8)
        w = rng(8, seed=1)
        got = rms_norm(x, w, eps=1e-6)
        xf = np.asarray(x, np.float64)
        expect = xf / np.sqrt((xf**2).mean(-1, keepdims=True) + 1e-6) * np.asarray(w)
        np.testing.assert_allclose(np.asarray(got), expect, rtol=2e-4)

    def test_unit_offset(self):
        x = rng(2, 8)
        w = jnp.zeros(8)
        # with offset=1 and zero weight, acts like weightless rmsnorm
        got = rms_norm(x, w, weight_offset=1.0)
        base = rms_norm(x, jnp.ones(8))
        np.testing.assert_allclose(np.asarray(got), np.asarray(base), rtol=1e-5)

    def test_gated(self):
        x, z, w = rng(2, 8), rng(2, 8, seed=1), rng(8, seed=2)
        got = gated_rms_norm(x, z, w)
        silu = np.asarray(z) / (1 + np.exp(-np.asarray(z)))
        expect = np.asarray(rms_norm(x, w)) * silu
        np.testing.assert_allclose(np.asarray(got), expect, rtol=2e-4, atol=1e-5)


class TestRope:
    def test_rotation_formula(self):
        """Hand-computed rotation at a given position (reference
        rotary.rs:93+ invariant)."""
        D = 8
        cos, sin = rope_table(D, 32, theta=10000.0)
        x = rng(1, 1, 1, D)
        pos = jnp.array([[3]], dtype=jnp.int32)
        got = np.asarray(apply_rope(x, cos, sin, pos))
        xf = np.asarray(x, np.float64)[0, 0, 0]
        inv = 1.0 / (10000.0 ** (np.arange(0, D, 2) / D))
        ang = 3.0 * inv
        c, s = np.cos(ang), np.sin(ang)
        x1, x2 = xf[: D // 2], xf[D // 2 :]
        expect = np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s])
        np.testing.assert_allclose(got[0, 0, 0], expect, rtol=1e-5)

    def test_norm_preserved(self):
        cos, sin = rope_table(16, 64)
        x = rng(2, 7, 3, 16)
        pos = jnp.broadcast_to(jnp.arange(7, dtype=jnp.int32)[None], (2, 7))
        y = apply_rope(x, cos, sin, pos)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(y), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1),
            rtol=1e-4,
        )

    def test_interleaved_vs_half_are_permutations(self):
        cos, sin = rope_table(16, 64)
        x = rng(1, 4, 2, 16)
        pos = jnp.broadcast_to(jnp.arange(4, dtype=jnp.int32)[None], (1, 4))
        h = np.sort(np.abs(np.asarray(apply_rope(x, cos, sin, pos, mode="half"))))
        # not equal elementwise but both preserve norms
        i = np.asarray(apply_rope(x, cos, sin, pos, mode="interleaved"))
        np.testing.assert_allclose(
            np.linalg.norm(i, axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1),
            rtol=1e-4,
        )

    def test_partial_rotary_passthrough(self):
        D, R = 16, 8
        cos, sin = rope_table(R, 64)
        x = rng(1, 3, 2, D)
        pos = jnp.broadcast_to(jnp.arange(3, dtype=jnp.int32)[None], (1, 3))
        y = apply_rope(x, cos, sin, pos)
        np.testing.assert_array_equal(np.asarray(y[..., R:]), np.asarray(x[..., R:]))
        assert not np.allclose(np.asarray(y[..., 1:2, :, :R]), np.asarray(x[..., 1:2, :, :R]))


class TestKVCache:
    def test_prefill_then_decode_layout(self):
        c = LayerKVCache.empty(2, 16, 2, 4, jnp.float32)
        k = rng(2, 3, 2, 4)
        v = rng(2, 3, 2, 4, seed=1)
        c = c.update(k, v, jnp.asarray(0))
        np.testing.assert_allclose(np.asarray(c.k[:, :3]), np.asarray(k))
        # ragged decode append at per-row positions
        k1 = rng(2, 1, 2, 4, seed=2)
        c = c.update(k1, k1, jnp.asarray([3, 5]))
        np.testing.assert_allclose(np.asarray(c.k[0, 3]), np.asarray(k1[0, 0]))
        np.testing.assert_allclose(np.asarray(c.k[1, 5]), np.asarray(k1[1, 0]))
        np.testing.assert_allclose(np.asarray(c.k[1, 3]), 0.0)  # untouched

    def test_quantized_roundtrip_accuracy(self):
        c = QuantLayerKVCache.empty(1, 8, 2, 32, bits=8)
        k = rng(1, 8, 2, 32)
        c = c.update(k, k, jnp.asarray(0))
        kd, vd = c.dequant(jnp.float32)
        err = np.abs(np.asarray(kd) - np.asarray(k)).max()
        amax = np.abs(np.asarray(k)).max()
        assert err < amax / 127 * 1.01

    def test_int4_coarser_than_int8(self):
        k = rng(1, 4, 1, 32)
        c8 = QuantLayerKVCache.empty(1, 4, 1, 32, bits=8).update(k, k, jnp.asarray(0))
        c4 = QuantLayerKVCache.empty(1, 4, 1, 32, bits=4).update(k, k, jnp.asarray(0))
        e8 = np.abs(np.asarray(c8.dequant(jnp.float32)[0]) - np.asarray(k)).max()
        e4 = np.abs(np.asarray(c4.dequant(jnp.float32)[0]) - np.asarray(k)).max()
        assert e4 > e8
        # int4 codes are nibble-packed: half the storage bytes of int8
        assert c4.k.nbytes * 2 == c8.k.nbytes
        from crane_tpu.ops.kv_cache import unpack_int4

        assert np.abs(np.asarray(unpack_int4(c4.k))).max() <= 7


class TestAttention:
    def _random_qkv(self, B, S, Hq, Hkv, D, T):
        q = rng(B, S, Hq, D)
        k = jnp.zeros((B, T, Hkv, D), jnp.float32)
        v = jnp.zeros((B, T, Hkv, D), jnp.float32)
        kv = rng(B, S, Hkv, D, seed=1), rng(B, S, Hkv, D, seed=2)
        k = k.at[:, :S].set(kv[0])
        v = v.at[:, :S].set(kv[1])
        return q, k, v

    def test_incremental_equals_prefill(self):
        """Decode-vs-prefill equivalence — the reference's core attention
        invariant (modules/attention.rs:549+)."""
        B, S, Hq, Hkv, D, T = 1, 6, 4, 2, 8, 16
        q, k, v = self._random_qkv(B, S, Hq, Hkv, D, T)
        pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
        full = gqa_attention(q, k, v, pos, scale=D**-0.5)
        for s in range(S):
            one = gqa_attention(
                q[:, s : s + 1], k, v, pos[:, s : s + 1], scale=D**-0.5
            )
            np.testing.assert_allclose(
                np.asarray(one[:, 0]), np.asarray(full[:, s]), rtol=1e-4, atol=1e-5
            )

    def test_causality(self):
        """Future KV slots must not affect output."""
        B, S, Hq, Hkv, D, T = 1, 4, 2, 2, 8, 8
        q, k, v = self._random_qkv(B, S, Hq, Hkv, D, T)
        pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
        base = gqa_attention(q, k, v, pos, scale=1.0)
        k2 = k.at[:, S:].set(999.0)
        v2 = v.at[:, S:].set(999.0)
        got = gqa_attention(q, k2, v2, pos, scale=1.0)
        np.testing.assert_allclose(np.asarray(base), np.asarray(got), atol=1e-6)

    def test_sliding_window(self):
        B, S, H, D, T = 1, 8, 2, 4, 8
        q, k, v = self._random_qkv(B, S, H, H, D, T)
        pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
        win = gqa_attention(q, k, v, pos, scale=1.0, window=2)
        # with window=2 the last query only sees slots 6,7; perturbing slot 0
        # must not change it, but changes the full-attention output
        k2 = k.at[:, 0].add(5.0)
        win2 = gqa_attention(q, k2, v, pos, scale=1.0, window=2)
        np.testing.assert_allclose(np.asarray(win[:, -1]), np.asarray(win2[:, -1]), atol=1e-6)
        full = gqa_attention(q, k, v, pos, scale=1.0)
        full2 = gqa_attention(q, k2, v, pos, scale=1.0)
        assert not np.allclose(np.asarray(full[:, -1]), np.asarray(full2[:, -1]))

    def test_gqa_matches_repeated_mha(self):
        B, S, Hq, Hkv, D, T = 2, 5, 6, 2, 8, 8
        q, k, v = self._random_qkv(B, S, Hq, Hkv, D, T)
        pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
        got = gqa_attention(q, k, v, pos, scale=D**-0.5)
        krep = jnp.repeat(k, Hq // Hkv, axis=2)
        vrep = jnp.repeat(v, Hq // Hkv, axis=2)
        expect = gqa_attention(q, krep, vrep, pos, scale=D**-0.5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-4, atol=1e-5)

    def test_softcap_bounds_logit_influence(self):
        B, S, H, D, T = 1, 2, 1, 4, 4
        q, k, v = self._random_qkv(B, S, H, H, D, T)
        pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
        capped = gqa_attention(q * 100, k, v, pos, scale=1.0, logit_softcap=5.0)
        assert np.isfinite(np.asarray(capped)).all()


class TestLinearQuant:
    def test_int8_quant_accuracy(self):
        w = rng(64, 32)
        x = rng(3, 64, seed=1)
        qw = quantize_weight(w, bits=8, block=32)
        got = np.asarray(linear(x, qw))
        expect = np.asarray(x) @ np.asarray(w)
        rel = np.abs(got - expect).max() / np.abs(expect).max()
        assert rel < 0.02, rel

    def test_int4(self):
        w = rng(64, 32)
        qw = quantize_weight(w, bits=4, block=32)
        # per-channel int4 is nibble-packed: half the rows, codes in range
        # after unpacking
        assert qw.codes.shape == (32, 32) and qw.shape == (64, 32)
        assert np.abs(np.asarray(qw.unpacked_codes())).max() <= 7
        x = rng(3, 64, seed=1)
        got = np.asarray(linear(x, qw))
        expect = np.asarray(x) @ np.asarray(w)
        rel = np.abs(got - expect).max() / np.abs(expect).max()
        assert rel < 0.2, rel

    def test_dequant_roundtrip(self):
        w = rng(64, 16)
        qw = quantize_weight(w, bits=8)
        np.testing.assert_allclose(
            np.asarray(qw.dequant(jnp.float32)), np.asarray(w), atol=np.abs(np.asarray(w)).max() / 127 * 1.01
        )


class TestSampling:
    def test_greedy_is_argmax(self):
        logits = rng(3, 100)
        sp = SamplingParams.make(3, do_sample=False)
        recent = jnp.full((3, 8), -1, jnp.int32)
        tok = sample(logits, sp, recent, jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(tok), np.asarray(jnp.argmax(logits, -1)))

    def test_repetition_penalty(self):
        logits = jnp.asarray([[2.0, -1.0, 0.5]])
        recent = jnp.asarray([[0, 1, -1, -1]], dtype=jnp.int32)
        out = apply_repetition_penalty(logits, recent, jnp.asarray([2.0]))
        np.testing.assert_allclose(np.asarray(out[0]), [1.0, -2.0, 0.5])

    def test_top_k_restricts_support(self):
        logits = jnp.asarray(np.linspace(0, 10, 50)[None].repeat(4, 0), jnp.float32)
        sp = SamplingParams.make(4, temperature=1.0, top_k=3, do_sample=True)
        recent = jnp.full((4, 4), -1, jnp.int32)
        toks = set()
        for s in range(50):
            t = sample(logits, sp, recent, jax.random.PRNGKey(s))
            toks.update(np.asarray(t).tolist())
        assert toks <= {47, 48, 49}, toks

    def test_top_p_keeps_head(self):
        v = np.full(20, -10.0, np.float32)
        v[7] = 10.0  # prob mass ~1 on token 7
        sp = SamplingParams.make(1, top_p=0.5, do_sample=True, temperature=1.0)
        recent = jnp.full((1, 4), -1, jnp.int32)
        for s in range(20):
            t = sample(jnp.asarray(v[None]), sp, recent, jax.random.PRNGKey(s))
            assert int(t[0]) == 7

    def test_temperature_zero_ish_is_peaked(self):
        logits = rng(1, 100, seed=3)
        sp = SamplingParams.make(1, temperature=1e-4, do_sample=True)
        recent = jnp.full((1, 4), -1, jnp.int32)
        t = sample(logits, sp, recent, jax.random.PRNGKey(0))
        assert int(t[0]) == int(jnp.argmax(logits, -1)[0])

    def test_update_recent_shifts(self):
        r = jnp.asarray([[1, 2, 3]], dtype=jnp.int32)
        r2 = update_recent(r, jnp.asarray([9]))
        np.testing.assert_array_equal(np.asarray(r2), [[2, 3, 9]])

    def test_wide_nucleus_exact_fallback(self):
        """A nucleus wider than the top-64 candidate cap must NOT be silently
        truncated (reference falls back to exact sampling,
        engine/sampling.rs:206-239). Flat logits over 1000 tokens with
        top_p=0.95 -> nucleus = 950 tokens; the fast path alone could only
        ever emit ranks 0-63."""
        V = 1000
        logits = jnp.zeros((1, V), jnp.float32)  # exactly flat
        sp = SamplingParams.make(1, top_p=0.95, do_sample=True, temperature=1.0)
        recent = jnp.full((1, 4), -1, jnp.int32)
        draws = jax.vmap(
            lambda k: sample(logits, sp, recent, k)[0]
        )(jax.random.split(jax.random.PRNGKey(0), 512))
        draws = np.asarray(draws)
        # support extends past the cap and stays inside the vocab
        assert draws.max() >= 64, draws.max()
        assert draws.min() >= 0 and draws.max() < V
        # roughly uniform: no single token dominates 512 flat draws
        _, counts = np.unique(draws, return_counts=True)
        assert counts.max() <= 8, counts.max()

    def test_peaked_nucleus_keeps_fast_path_distribution(self):
        """When the nucleus fits in the cap, results match the pre-fallback
        fast path bit-for-bit (the lax.cond false branch)."""
        logits = rng(2, 500, seed=11) * 8.0  # peaked enough for p=0.9
        sp = SamplingParams.make(2, top_p=0.9, do_sample=True, temperature=1.0)
        recent = jnp.full((2, 4), -1, jnp.int32)
        for s in range(8):
            t = sample(logits, sp, recent, jax.random.PRNGKey(s))
            assert np.asarray(t).min() >= 0

    def test_exact_fallback_respects_nucleus_boundary(self):
        """Two-tier distribution: a 200-token high tier wider than the cap
        (top-64 mass ~0.32 < top_p=0.5 -> fallback triggers). The exact path
        must widen the support past the cap but never into the low tier."""
        V = 400
        v = np.full(V, -8.0, np.float32)
        v[:200] = 0.0  # uniform high tier
        sp = SamplingParams.make(1, top_p=0.5, do_sample=True, temperature=1.0)
        recent = jnp.full((1, 4), -1, jnp.int32)
        draws = np.asarray(
            jax.vmap(lambda k: sample(jnp.asarray(v[None]), sp, recent, k)[0])(
                jax.random.split(jax.random.PRNGKey(1), 256)
            )
        )
        assert draws.max() >= 64  # support widened past the fast-path cap
        assert draws.max() < 200  # ...but never into the low tier


def test_gqa_attention_sinks_numeric():
    """Attention sinks (gpt-oss style): one virtual logit per head absorbs
    probability mass; output equals manual softmax-with-extra-slot."""
    import numpy as np

    from crane_tpu.ops.attention import gqa_attention

    rng = np.random.default_rng(0)
    B, S, Hq, Hkv, D = 1, 4, 4, 2, 8
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    sinks = jnp.asarray(rng.standard_normal(Hq), jnp.float32)
    pos = jnp.arange(S, dtype=jnp.int32)[None]
    got = np.asarray(gqa_attention(q, k, v, pos, scale=D ** -0.5, sinks=sinks))

    # manual reference per query head
    G = Hq // Hkv
    ref = np.zeros_like(got)
    for h in range(Hq):
        kv = h // G
        for s in range(S):
            logits = np.asarray(q[0, s, h] @ k[0, : s + 1, kv].T) * D ** -0.5
            all_l = np.concatenate([logits, [float(sinks[h])]])
            p = np.exp(all_l - all_l.max())
            p /= p.sum()
            ref[0, s, h] = p[:-1] @ np.asarray(v[0, : s + 1, kv])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    # sinks reduce total attention mass vs plain softmax
    plain = np.asarray(gqa_attention(q, k, v, pos, scale=D ** -0.5))
    assert not np.allclose(got, plain)
