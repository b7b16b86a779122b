"""ECAPA-TDNN speaker encoder invariants (reference SpeakerEncoder,
qwen3_tts/modeling.rs:953-1223 — no public oracle, so the tests synthesize a
random checkpoint in the REAL released ``speaker_encoder.*`` layout and
assert structural + mathematical invariants)."""

import numpy as np

import jax.numpy as jnp

from crane_tpu.models.speaker_encoder import (
    EcapaConfig,
    SpeakerEncoder,
    attentive_stats_pool,
    init_ecapa_params,
    map_speaker_encoder_weights,
    random_speaker_encoder_state_dict,
)


def mel(seed=0, T=120, mels=24):
    return np.random.default_rng(seed).standard_normal((mels, T)).astype(np.float32)


def small_cfg():
    return EcapaConfig(
        mel_dim=24, enc_dim=16, enc_channels=(32, 32, 32, 48),
        enc_kernel_sizes=(5, 3, 3, 1), enc_dilations=(1, 2, 3, 1),
        enc_attention_channels=8, enc_res2net_scale=4, enc_se_channels=8,
        sample_rate=2400,
    )


class TestSpeakerEncoder:
    def test_checkpoint_layout_round_trip(self):
        """The mapper consumes exactly the released key layout: every torch
        Conv1d [Cout, Cin, k] tensor lands transposed in the params tree."""
        cfg = small_cfg()
        sd = random_speaker_encoder_state_dict(cfg, seed=1)
        keys = set(sd)
        assert "speaker_encoder.blocks.0.conv.weight" in keys
        assert "speaker_encoder.blocks.1.res2net_block.blocks.0.conv.weight" in keys
        assert "speaker_encoder.blocks.2.se_block.conv2.bias" in keys
        assert "speaker_encoder.asp.tdnn.conv.weight" in keys
        assert "speaker_encoder.fc.weight" in keys
        p = map_speaker_encoder_weights(cfg, sd)
        assert p["fc_w"].shape == (1, 2 * cfg.enc_channels[-1], cfg.enc_dim)
        w_torch = sd["speaker_encoder.blocks.0.conv.weight"]
        np.testing.assert_array_equal(
            np.asarray(p["blocks"][0]["w"]), w_torch.transpose(2, 1, 0)
        )

    def test_embedding_shape_and_determinism(self):
        enc = SpeakerEncoder(small_cfg())
        e1, e2 = enc.embed(mel(0)), enc.embed(mel(0))
        assert e1.shape == (1, 16)
        np.testing.assert_array_equal(e1, e2)
        b = enc.embed(mel(1))
        assert np.abs(e1 - b).max() > 1e-4

    def test_variable_length_inputs(self):
        enc = SpeakerEncoder(small_cfg())
        for T in (40, 77, 200):
            e = enc.embed(mel(0, T=T))
            assert e.shape == (1, 16)
            assert np.isfinite(e).all()

    def test_raw_audio_to_embedding(self):
        """The SDK contract: enc(audio) computes the speaker mel (magnitude
        spectrum, (n_fft-hop)/2 reflect pad, ln) then ECAPA."""
        cfg = EcapaConfig(
            mel_dim=128, enc_dim=16, enc_channels=(32, 32, 32, 48),
            enc_kernel_sizes=(5, 3, 3, 1), enc_dilations=(1, 2, 3, 1),
            enc_attention_channels=8, enc_res2net_scale=4, enc_se_channels=8,
            sample_rate=24000,
        )
        enc = SpeakerEncoder(cfg)
        wav = (np.random.default_rng(2).normal(size=24000) * 0.2).astype(np.float32)
        e = enc(wav)
        assert e.shape == (16,)
        assert np.isfinite(e).all()
        # frame count follows the reference's (n_fft - hop)/2 padding
        n = len(wav)
        pad = (1024 - 256) // 2
        frames = 1 + (n + 2 * pad - 1024) // 256
        m = np.asarray(
            __import__("crane_tpu.audio.mel", fromlist=["log_mel_spectrogram"])
            .log_mel_spectrogram(enc.mel_cfg, jnp.asarray(wav))
        )
        assert m.shape == (128, frames)

    def test_similarity_self_highest(self):
        enc = SpeakerEncoder(small_cfg())
        s_self = enc.similarity(mel(0), mel(0))
        s_other = enc.similarity(mel(0), mel(5))
        assert s_self > s_other
        np.testing.assert_allclose(s_self, 1.0, rtol=1e-5)

    def test_attentive_pool_matches_weighted_stats(self):
        """Pooling must equal the explicit formula: attention from
        [x, mean, std] context through relu -> tanh -> conv -> softmax_T,
        then weighted mean and sqrt(weighted var + 1e-5)."""
        rng = np.random.default_rng(3)
        B, T, C = 1, 9, 6
        x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
        p = {
            "tdnn": {
                "w": jnp.asarray(rng.standard_normal((1, 3 * C, 4)) * 0.3, jnp.float32),
                "b": jnp.zeros((4,)),
            },
            "conv_w": jnp.asarray(rng.standard_normal((1, 4, C)) * 0.3, jnp.float32),
            "conv_b": jnp.zeros((C,)),
        }
        out = np.asarray(attentive_stats_pool(p, x))
        xf = np.asarray(x)[0]
        mu = xf.mean(0)
        sg = np.sqrt(xf.var(0) + 1e-5)
        ctx = np.concatenate([xf, np.tile(mu, (T, 1)), np.tile(sg, (T, 1))], -1)
        a = np.maximum(ctx @ np.asarray(p["tdnn"]["w"])[0], 0.0)  # relu
        a = np.tanh(a) @ np.asarray(p["conv_w"])[0]
        a = np.exp(a - a.max(0)) / np.exp(a - a.max(0)).sum(0)
        mean = (a * xf).sum(0)
        std = np.sqrt((a * (xf - mean) ** 2).sum(0) + 1e-5)
        np.testing.assert_allclose(out[0, :C], mean, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(out[0, C:], std, rtol=1e-4, atol=1e-5)

    def test_res2net_chunk_semantics(self):
        """Chunk 0 passes through untouched; chunk 1 is convolved alone;
        chunk i>=2 sees chunk_i + out_{i-1} (modeling.rs:1008-1028)."""
        from crane_tpu.models.speaker_encoder import res2net_block

        rng = np.random.default_rng(4)
        C, s = 8, 4
        x = jnp.asarray(rng.standard_normal((1, 5, C)), jnp.float32)
        # identity k=1 convs make the chain arithmetic checkable
        eye = jnp.eye(C // s)[None]  # [k=1, cs, cs]
        p = {"blocks": [{"w": eye, "b": jnp.zeros(C // s)} for _ in range(s - 1)]}
        out = np.asarray(res2net_block(p, x, scale=s, dilation=1))
        xs = np.split(np.asarray(x), s, axis=-1)
        o1 = np.maximum(xs[1], 0)
        o2 = np.maximum(xs[2] + o1, 0)
        o3 = np.maximum(xs[3] + o2, 0)
        np.testing.assert_allclose(out, np.concatenate([xs[0], o1, o2, o3], -1), rtol=1e-6)
