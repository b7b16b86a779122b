"""ECAPA-TDNN speaker encoder invariants (reference SpeakerEncoder,
qwen3_tts/modeling.rs:953-1223 — no public oracle, so structural +
mathematical invariants)."""

import numpy as np

import jax.numpy as jnp

from crane_tpu.models.speaker_encoder import (
    EcapaConfig,
    SpeakerEncoder,
    attentive_stats_pool,
    init_ecapa_params,
)


def mel(seed=0, T=120, mels=24):
    return np.random.default_rng(seed).standard_normal((mels, T)).astype(np.float32)


def small_cfg():
    return EcapaConfig(n_mels=24, channels=32, emb_dim=16, res2net_scale=4,
                       se_bottleneck=8, attn_bottleneck=8)


class TestSpeakerEncoder:
    def test_embedding_shape_and_norm(self):
        enc = SpeakerEncoder(small_cfg())
        e = enc.embed(mel())
        assert e.shape == (1, 16)
        np.testing.assert_allclose(np.linalg.norm(e, axis=-1), 1.0, rtol=1e-5)

    def test_deterministic_and_input_sensitive(self):
        enc = SpeakerEncoder(small_cfg())
        a1, a2 = enc.embed(mel(0)), enc.embed(mel(0))
        b = enc.embed(mel(1))
        np.testing.assert_array_equal(a1, a2)
        assert np.abs(a1 - b).max() > 1e-4

    def test_variable_length_inputs(self):
        enc = SpeakerEncoder(small_cfg())
        for T in (40, 77, 200):
            e = enc.embed(mel(0, T=T))
            assert e.shape == (1, 16)
            assert np.isfinite(e).all()

    def test_similarity_self_highest(self):
        enc = SpeakerEncoder(small_cfg())
        s_self = enc.similarity(mel(0), mel(0))
        s_other = enc.similarity(mel(0), mel(5))
        assert s_self > s_other
        np.testing.assert_allclose(s_self, 1.0, rtol=1e-5)

    def test_attentive_pool_matches_weighted_stats(self):
        """Pooling must equal the explicit weighted mean/std formula."""
        rng = np.random.default_rng(3)
        B, T, C = 1, 9, 6
        x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
        p = {
            "w1": jnp.asarray(rng.standard_normal((3 * C, 4)) * 0.3, jnp.float32),
            "b1": jnp.zeros((4,)),
            "w2": jnp.asarray(rng.standard_normal((4, C)) * 0.3, jnp.float32),
            "b2": jnp.zeros((C,)),
        }
        out = np.asarray(attentive_stats_pool(p, x))
        # recompute attention weights explicitly
        xf = np.asarray(x)[0]
        mu, sg = xf.mean(0), xf.std(0)
        ctx = np.concatenate([xf, np.tile(mu, (T, 1)), np.tile(np.sqrt(xf.var(0) + 0e0), (T, 1))], -1)
        a = np.tanh(ctx @ np.asarray(p["w1"]))
        a = a @ np.asarray(p["w2"])
        a = np.exp(a - a.max(0)) / np.exp(a - a.max(0)).sum(0)
        mean = (a * xf).sum(0)
        std = np.sqrt(np.clip((a * xf * xf).sum(0) - mean ** 2, 1e-9, None))
        np.testing.assert_allclose(out[0, :C], mean, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(out[0, C:], std, rtol=1e-3, atol=1e-4)
