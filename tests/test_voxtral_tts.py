"""Voxtral TTS tests (reference voxtral_tts/): no public HF oracle for the
full model, so — torch functional oracles for the conv/weight-norm pieces,
mathematical invariants for FSQ / ALiBi / flow matching / codec causality,
and an end-to-end generate() pipeline check on a tiny config."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crane_tpu.models.voxtral_tts import (
    END_AUDIO_CODE,
    AcousticArgs,
    CodecArgs,
    VoxtralConfig,
    VoxtralTts,
    alibi_sliding_bias,
    alibi_slopes,
    build_prompt_segments,
    causal_conv1d_nwc,
    causal_conv_transpose1d_nwc,
    codebook_offsets,
    codec_chunked_decode,
    codec_decode,
    embed_frame_codes,
    flow_match,
    fold_weight_norm,
    fsq_dequantize,
    fsq_quantize,
    init_voxtral_params,
    predict_semantic_logits,
    time_embedding,
)

torch = pytest.importorskip("torch")


def tiny_config():
    return VoxtralConfig(
        dim=32, n_layers=2, n_heads=4, n_kv_heads=2, head_dim=8, hidden_dim=64,
        vocab_size=64, max_seq_len=256, semantic_codebook_size=50, n_acoustic=6,
        fsq_levels=21,
        acoustic=AcousticArgs(dim=32, n_layers=2, n_heads=4, n_kv_heads=4,
                              head_dim=8, hidden_dim=64),
        codec=CodecArgs(dim=16, hidden_dim=32, n_heads=2, n_kv_heads=2, head_dim=8,
                        semantic_dim=10, patch_size=4,
                        transformer_lengths=(1, 1), conv_kernels=(3, 4),
                        conv_strides=(1, 2)),
    )


class TestFsq:
    def test_round_trip_on_lattice(self):
        levels = 21
        vals = jnp.linspace(-1, 1, levels)
        codes = fsq_quantize(vals, levels)
        assert int(codes.min()) == 2 and int(codes.max()) == 22
        back = fsq_dequantize(codes, levels)
        np.testing.assert_allclose(np.asarray(back), np.asarray(vals), atol=1e-6)

    def test_out_of_range_clamps(self):
        codes = fsq_quantize(jnp.asarray([-5.0, 5.0]), 21)
        assert codes.tolist() == [2, 22]


class TestCodebookEmbedding:
    def test_summed_lookup_matches_manual(self):
        cfg = tiny_config()
        offsets = np.asarray(codebook_offsets(cfg))
        # semantic block is 52 entries, then 6 blocks of 23
        assert offsets[0] == 0 and offsets[1] == 52 and offsets[2] == 75
        rows = offsets[-1] + cfg.fsq_levels + 2
        table = jnp.asarray(np.random.default_rng(0).standard_normal((rows, cfg.dim)), jnp.float32)
        codes = jnp.asarray([3, 2, 22, 10, 11, 12, 4], jnp.int32)
        got = embed_frame_codes(table, jnp.asarray(offsets), codes)
        want = sum(np.asarray(table)[c + o] for c, o in zip(np.asarray(codes), offsets))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


class TestAlibi:
    def test_slopes(self):
        s = np.asarray(alibi_slopes(8))
        np.testing.assert_allclose(s[0], 0.5)
        np.testing.assert_allclose(s[7], 2.0 ** -8)

    def test_mask_blocks_future_and_window(self):
        bias = np.asarray(alibi_sliding_bias(6, 2, alibi_slopes(2)))
        assert bias.shape == (2, 6, 6)
        assert np.isneginf(bias[0, 2, 3])      # future
        assert np.isneginf(bias[0, 4, 2])      # beyond window 2
        np.testing.assert_allclose(bias[0, 4, 3], 2.0 ** -4 * (3 - 4))  # slope[0] for 2 heads
        np.testing.assert_allclose(bias[0, 4, 4], 0.0)


class TestCausalConvsVsTorch:
    def test_causal_conv_matches_torch_reflect_pad(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 20, 5)).astype(np.float32)   # NWC
        w = rng.standard_normal((3, 5, 7)).astype(np.float32)    # [k,in,out]
        b = rng.standard_normal(7).astype(np.float32)
        got = np.asarray(causal_conv1d_nwc(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=1))
        xt = torch.from_numpy(x.transpose(0, 2, 1))               # NCL
        xt = torch.nn.functional.pad(xt, (2, 0), mode="reflect")
        wt = torch.from_numpy(w.transpose(2, 1, 0).copy())        # [out,in,k]
        ref = torch.nn.functional.conv1d(xt, wt, torch.from_numpy(b)).numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_causal_conv_stride2(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((1, 16, 4)).astype(np.float32)
        w = rng.standard_normal((4, 4, 6)).astype(np.float32)
        got = np.asarray(causal_conv1d_nwc(jnp.asarray(x), jnp.asarray(w), None, stride=2))
        xt = torch.nn.functional.pad(torch.from_numpy(x.transpose(0, 2, 1)), (2, 0), mode="reflect")
        ref = torch.nn.functional.conv1d(
            xt, torch.from_numpy(w.transpose(2, 1, 0).copy()), stride=2
        ).numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_transpose_conv_matches_torch_with_right_trim(self):
        rng = np.random.default_rng(2)
        k, s, cin, cout = 4, 2, 5, 3
        x = rng.standard_normal((2, 9, cin)).astype(np.float32)
        w_pt = rng.standard_normal((cin, cout, k)).astype(np.float32)  # torch layout
        b = rng.standard_normal(cout).astype(np.float32)
        # our layout: [k, in, out], flipped (as map_voxtral_weights produces)
        w_ours = jnp.asarray(w_pt.transpose(2, 0, 1)[::-1].copy())
        got = np.asarray(causal_conv_transpose1d_nwc(jnp.asarray(x), w_ours, jnp.asarray(b), stride=s))
        ref = torch.nn.functional.conv_transpose1d(
            torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(w_pt),
            torch.from_numpy(b), stride=s,
        ).numpy().transpose(0, 2, 1)
        ref = ref[:, : ref.shape[1] - (k - s)]                   # causal right trim
        assert got.shape == (2, 18, cout)                        # T * stride
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_weight_norm_fold_matches_torch(self):
        rng = np.random.default_rng(3)
        v = rng.standard_normal((7, 5, 3)).astype(np.float32)
        g = rng.standard_normal((7, 1, 1)).astype(np.float32)
        got = fold_weight_norm(v, g)
        ref = (torch.from_numpy(g) * torch.from_numpy(v)
               / torch.linalg.vector_norm(torch.from_numpy(v), dim=(1, 2), keepdim=True)).numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


class TestAcoustic:
    def test_time_embedding_layout(self):
        emb = np.asarray(time_embedding(jnp.asarray(0.5), 8))
        inv = np.exp(-np.log(10000.0) * np.arange(4) / 4)
        np.testing.assert_allclose(emb[:4], np.cos(0.5 * inv), rtol=1e-6)
        np.testing.assert_allclose(emb[4:], np.sin(0.5 * inv), rtol=1e-6)

    def test_semantic_logits_mask_empty_and_padding(self):
        cfg = tiny_config()
        p = init_voxtral_params(cfg, seed=0)
        h = jnp.asarray(np.random.default_rng(0).standard_normal(cfg.dim), jnp.float32)
        logits = np.asarray(predict_semantic_logits(cfg, p["acoustic"], h))
        assert logits.shape == (cfg.semantic_padded,)
        assert np.isneginf(logits[0])
        assert np.isneginf(logits[cfg.semantic_valid_end:]).all()
        assert np.isfinite(logits[1:cfg.semantic_valid_end]).all()

    def test_flow_match_deterministic_and_in_range(self):
        cfg = tiny_config()
        p = init_voxtral_params(cfg, seed=0)
        h = jnp.asarray(np.random.default_rng(1).standard_normal(cfg.dim), jnp.float32)
        noise = jnp.asarray(np.random.default_rng(2).standard_normal(cfg.n_acoustic), jnp.float32)
        a = np.asarray(flow_match(cfg, p["acoustic"], h, noise))
        b = np.asarray(flow_match(cfg, p["acoustic"], h, noise))
        np.testing.assert_array_equal(a, b)
        assert a.shape == (cfg.n_acoustic,)
        assert (a >= 2).all() and (a <= 2 + cfg.fsq_levels - 1).all()

    def test_flow_match_depends_on_conditioning(self):
        cfg = tiny_config()
        p = init_voxtral_params(cfg, seed=0)
        rng = np.random.default_rng(3)
        noise = jnp.asarray(rng.standard_normal(cfg.n_acoustic), jnp.float32)
        h1 = jnp.asarray(rng.standard_normal(cfg.dim) * 3, jnp.float32)
        h2 = jnp.asarray(rng.standard_normal(cfg.dim) * 3, jnp.float32)
        a = np.asarray(flow_match(cfg, p["acoustic"], h1, noise))
        b = np.asarray(flow_match(cfg, p["acoustic"], h2, noise))
        assert (a != b).any()


class TestCodec:
    def _codes(self, cfg, n_frames, seed=0):
        rng = np.random.default_rng(seed)
        sem = rng.integers(2, cfg.semantic_valid_end, (1, n_frames, 1))
        ac = rng.integers(2, 2 + cfg.fsq_levels, (1, n_frames, cfg.n_acoustic))
        return jnp.asarray(np.concatenate([sem, ac], -1), jnp.int32)

    def test_output_length(self):
        cfg = tiny_config()
        p = init_voxtral_params(cfg, seed=0)
        codes = self._codes(cfg, 12)
        wav = np.asarray(codec_decode(cfg, p["codec"], codes))
        spf = cfg.codec.samples_per_frame
        assert spf == 2 * 4  # stride product (strides[1:]) * patch
        assert wav.shape == (1, 12 * spf)
        assert np.isfinite(wav).all()

    def test_causality(self):
        """Changing a future frame's codes must not change earlier samples
        (causal convs + causal ALiBi attention)."""
        cfg = tiny_config()
        p = init_voxtral_params(cfg, seed=0)
        codes = self._codes(cfg, 16)
        wav_a = np.asarray(codec_decode(cfg, p["codec"], codes))
        changed = codes.at[0, 12:].set(self._codes(cfg, 16, seed=9)[0, 12:])
        wav_b = np.asarray(codec_decode(cfg, p["codec"], changed))
        spf = cfg.codec.samples_per_frame
        np.testing.assert_allclose(wav_a[0, : 12 * spf], wav_b[0, : 12 * spf],
                                   rtol=1e-5, atol=1e-6)
        assert (np.abs(wav_a[0, 12 * spf:] - wav_b[0, 12 * spf:]) > 1e-7).any()

    def test_chunked_decode_matches_full(self):
        cfg = tiny_config()
        p = init_voxtral_params(cfg, seed=0)
        codes = self._codes(cfg, 20)
        full = np.asarray(codec_decode(cfg, p["codec"], codes))
        chunked = np.asarray(codec_chunked_decode(cfg, p["codec"], codes,
                                                  chunk_size=6, left_context=16))
        np.testing.assert_allclose(chunked, full, rtol=1e-4, atol=1e-5)


class TestGenerate:
    def test_prompt_segments(self):
        segs = build_prompt_segments([100, 101])
        assert segs == [1, 25, "voice", 36, 100, 101, 35, 25]

    def test_end_to_end_waveform(self):
        cfg = tiny_config()
        params = init_voxtral_params(cfg, seed=0)
        voice = np.random.default_rng(0).standard_normal((3, cfg.dim)).astype(np.float32) * 0.1
        tts = VoxtralTts(cfg, params, voices={"demo": voice}, max_seq=128)
        wav, sr = tts.generate([10, 11, 12], voice="demo", max_frames=5, seed=0)
        assert sr == 24_000
        spf = cfg.codec.samples_per_frame
        assert wav.shape[0] % spf == 0 and wav.shape[0] <= 5 * spf
        if wav.shape[0]:
            assert np.isfinite(wav).all()

    def test_generation_deterministic(self):
        cfg = tiny_config()
        params = init_voxtral_params(cfg, seed=0)
        tts = VoxtralTts(cfg, params, max_seq=128)
        a, _ = tts.generate([5, 6], max_frames=4, seed=7)
        b, _ = tts.generate([5, 6], max_frames=4, seed=7)
        np.testing.assert_array_equal(a, b)

    def test_stops_on_end_code(self):
        """Force the semantic head to always pick END_AUDIO_CODE -> 0 frames."""
        cfg = tiny_config()
        params = init_voxtral_params(cfg, seed=0)
        head = np.zeros((cfg.dim, cfg.semantic_padded), np.float32)
        head[:, END_AUDIO_CODE] = 1.0  # END wins for any positive-sum hidden
        ac = dict(params["acoustic"])
        ac["semantic_head"] = jnp.asarray(head)
        params = {**params, "acoustic": ac}
        tts = VoxtralTts(cfg, params, max_seq=128)
        wav, _ = tts.generate([5], max_frames=4, seed=0)
        assert wav.shape == (0,)


class TestWeightMapping:
    def test_map_voxtral_weights_shapes(self):
        """Build a synthetic Mistral-style state dict and check the mapped
        tree runs end-to-end (exercises weight-norm folding + renames)."""
        from crane_tpu.models.voxtral_tts import map_voxtral_weights

        cfg = tiny_config()
        rng = np.random.default_rng(0)
        sd = {}

        def lin(name, o, i):
            sd[name] = rng.standard_normal((o, i)).astype(np.float32) * i ** -0.5

        def vec(name, n, val=None):
            sd[name] = (np.full(n, val, np.float32) if val is not None
                        else rng.standard_normal(n).astype(np.float32))

        E, H = cfg.dim, cfg.hidden_dim
        qd, kd = cfg.n_heads * cfg.head_dim, cfg.n_kv_heads * cfg.head_dim
        sd["mm_audio_embeddings.tok_embeddings.weight"] = rng.standard_normal(
            (cfg.vocab_size, E)).astype(np.float32) * 0.02
        vec("norm.weight", E, 1.0)
        for i in range(cfg.n_layers):
            lp = f"layers.{i}."
            lin(lp + "attention.wq.weight", qd, E)
            lin(lp + "attention.wk.weight", kd, E)
            lin(lp + "attention.wv.weight", kd, E)
            lin(lp + "attention.wo.weight", E, qd)
            lin(lp + "feed_forward.w1.weight", H, E)
            lin(lp + "feed_forward.w2.weight", E, H)
            lin(lp + "feed_forward.w3.weight", H, E)
            vec(lp + "attention_norm.weight", E, 1.0)
            vec(lp + "ffn_norm.weight", E, 1.0)
        ac = cfg.acoustic
        aqd = ac.n_heads * ac.head_dim
        for i in range(ac.n_layers):
            lp = f"acoustic_transformer.layers.{i}."
            lin(lp + "attention.wq.weight", aqd, ac.dim)
            lin(lp + "attention.wk.weight", aqd, ac.dim)
            lin(lp + "attention.wv.weight", aqd, ac.dim)
            lin(lp + "attention.wo.weight", ac.dim, aqd)
            lin(lp + "feed_forward.w1.weight", ac.hidden_dim, ac.dim)
            lin(lp + "feed_forward.w2.weight", ac.dim, ac.hidden_dim)
            lin(lp + "feed_forward.w3.weight", ac.hidden_dim, ac.dim)
            vec(lp + "attention_norm.weight", ac.dim, 1.0)
            vec(lp + "ffn_norm.weight", ac.dim, 1.0)
        vec("acoustic_transformer.norm.weight", ac.dim, 1.0)
        lin("acoustic_transformer.input_projection.weight", ac.dim, cfg.n_acoustic)
        lin("acoustic_transformer.time_projection.weight", ac.dim, ac.dim)
        lin("acoustic_transformer.llm_projection.weight", ac.dim, ac.dim)
        lin("acoustic_transformer.semantic_codebook_output.weight", cfg.semantic_padded, ac.dim)
        lin("acoustic_transformer.acoustic_codebook_output.weight", cfg.n_acoustic, ac.dim)
        offs = np.asarray(codebook_offsets(cfg))
        rows = int(offs[-1]) + cfg.fsq_levels + 2
        sd["mm_audio_embeddings.audio_codebook_embeddings.embeddings.weight"] = (
            rng.standard_normal((rows, E)).astype(np.float32) * 0.02
        )
        cc = cfg.codec
        tp = "audio_tokenizer."
        sd[tp + "quantizer.semantic_codebook.embedding_sum"] = rng.standard_normal(
            (cfg.semantic_codebook_size, cc.semantic_dim)).astype(np.float32)
        sd[tp + "quantizer.semantic_codebook.cluster_usage"] = np.abs(
            rng.standard_normal(cfg.semantic_codebook_size)).astype(np.float32) + 0.5

        def wn(prefix, out_c, in_c, k, transpose=False):
            shape = (in_c, out_c, k) if transpose else (out_c, in_c, k)
            sd[prefix + ".conv.parametrizations.weight.original1"] = (
                rng.standard_normal(shape).astype(np.float32))
            sd[prefix + ".conv.parametrizations.weight.original0"] = (
                np.abs(rng.standard_normal((shape[0], 1, 1))).astype(np.float32) + 0.1)
            sd[prefix + ".conv.bias"] = rng.standard_normal(out_c).astype(np.float32)

        embed_dim = cc.semantic_dim + cfg.n_acoustic
        wn(tp + "decoder_blocks.0", cc.dim, embed_dim, cc.conv_kernels[0])
        block = 1
        cqd = cc.n_heads * cc.head_dim
        for s in range(len(cc.transformer_lengths)):
            for l in range(cc.transformer_lengths[s]):
                lp = f"{tp}decoder_blocks.{block}.layers.{l}."
                lin(lp + "attention.wq.weight", cqd, cc.dim)
                lin(lp + "attention.wk.weight", cqd, cc.dim)
                lin(lp + "attention.wv.weight", cqd, cc.dim)
                lin(lp + "attention.wo.weight", cc.dim, cqd)
                vec(lp + "attention.q_norm.weight", cqd, 1.0)
                vec(lp + "attention.k_norm.weight", cqd, 1.0)
                vec(lp + "attention_norm.weight", cc.dim, 1.0)
                vec(lp + "ffn_norm.weight", cc.dim, 1.0)
                vec(lp + "attention_scale", cc.dim, 0.1)
                vec(lp + "ffn_scale", cc.dim, 0.1)
                lin(lp + "feed_forward.w1.weight", cc.hidden_dim, cc.dim)
                lin(lp + "feed_forward.w2.weight", cc.dim, cc.hidden_dim)
                lin(lp + "feed_forward.w3.weight", cc.hidden_dim, cc.dim)
            block += 1
            if s < len(cc.transformer_lengths) - 1:
                wn(f"{tp}decoder_blocks.{block}", cc.dim, cc.dim,
                   cc.conv_kernels[s + 1], transpose=True)
                block += 1
        wn(tp + "output_proj", cc.patch_size, cc.dim, 7)

        params = map_voxtral_weights(cfg, sd, dtype=jnp.float32)
        tts = VoxtralTts(cfg, params, max_seq=128)
        wav, sr = tts.generate([10, 20], max_frames=3, seed=0)
        assert sr == 24_000 and np.isfinite(wav).all()
