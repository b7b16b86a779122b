"""Qwen3-TTS Talker/CodePredictor + speech tokenizer v2 decoder.

No public numeric oracle exists for these weights (same situation as the
reference, which validates against the vendor implementation); the tests
synthesize a random checkpoint in the REAL released layout
(talker.model.* / talker.code_predictor.* / decoder.*) and assert the
architecture's structural and behavioral invariants from
/root/reference/crane-core/src/models/qwen3_tts/modeling.rs and
speech_tokenizer_v2.rs.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crane_tpu.generation.config import SpeechOptions
from crane_tpu.models.speech_tokenizer import (
    SpeechDecoderConfig,
    SpeechTokenizerDecoder,
    decode_frames,
    map_decoder_weights,
)

RNG = np.random.default_rng(0)


def _r(*shape, scale=0.05):
    return (RNG.normal(size=shape) * scale).astype(np.float32)


# ── speech tokenizer decoder ─────────────────────────────────────────────


def _tiny_decoder_cfg():
    return SpeechDecoderConfig(
        codebook_size=32, hidden_size=48, latent_dim=40, codebook_dim=40,
        num_attention_heads=4, num_key_value_heads=2, head_dim=12,
        sliding_window=8, intermediate_size=64, num_hidden_layers=2,
        num_quantizers=4, upsample_rates=(4, 3), upsampling_ratios=(2, 2),
        decoder_dim=32,
    )


def _decoder_sd(cfg: SpeechDecoderConfig) -> dict:
    sd = {}
    d = "decoder."
    half = cfg.codebook_dim // 2
    for name, nq in (("rvq_first", 1), ("rvq_rest", cfg.num_quantizers - 1)):
        for i in range(nq):
            sd[f"{d}quantizer.{name}.vq.layers.{i}._codebook.embedding_sum"] = _r(cfg.codebook_size, half)
            sd[f"{d}quantizer.{name}.vq.layers.{i}._codebook.cluster_usage"] = np.ones(cfg.codebook_size, np.float32)
        sd[f"{d}quantizer.{name}.output_proj.weight"] = _r(cfg.codebook_dim, half, 1)
    sd[d + "pre_conv.conv.weight"] = _r(cfg.latent_dim, cfg.codebook_dim, 3)
    sd[d + "pre_conv.conv.bias"] = _r(cfg.latent_dim)
    pt = d + "pre_transformer."
    sd[pt + "input_proj.weight"] = _r(cfg.hidden_size, cfg.latent_dim)
    sd[pt + "input_proj.bias"] = _r(cfg.hidden_size)
    sd[pt + "output_proj.weight"] = _r(cfg.latent_dim, cfg.hidden_size)
    sd[pt + "output_proj.bias"] = _r(cfg.latent_dim)
    sd[pt + "norm.weight"] = np.ones(cfg.hidden_size, np.float32)
    H, Hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    for i in range(cfg.num_hidden_layers):
        L = f"{pt}layers.{i}."
        sd[L + "self_attn.q_proj.weight"] = _r(H * hd, cfg.hidden_size)
        sd[L + "self_attn.k_proj.weight"] = _r(Hkv * hd, cfg.hidden_size)
        sd[L + "self_attn.v_proj.weight"] = _r(Hkv * hd, cfg.hidden_size)
        sd[L + "self_attn.o_proj.weight"] = _r(cfg.hidden_size, H * hd)
        sd[L + "input_layernorm.weight"] = np.ones(cfg.hidden_size, np.float32)
        sd[L + "post_attention_layernorm.weight"] = np.ones(cfg.hidden_size, np.float32)
        sd[L + "self_attn_layer_scale.scale"] = np.full(cfg.hidden_size, 0.01, np.float32)
        sd[L + "mlp_layer_scale.scale"] = np.full(cfg.hidden_size, 0.01, np.float32)
        sd[L + "mlp.gate_proj.weight"] = _r(cfg.intermediate_size, cfg.hidden_size)
        sd[L + "mlp.up_proj.weight"] = _r(cfg.intermediate_size, cfg.hidden_size)
        sd[L + "mlp.down_proj.weight"] = _r(cfg.hidden_size, cfg.intermediate_size)
    for i, ratio in enumerate(cfg.upsampling_ratios):
        sd[f"{d}upsample.{i}.0.conv.weight"] = _r(cfg.latent_dim, cfg.latent_dim, ratio)
        sd[f"{d}upsample.{i}.0.conv.bias"] = _r(cfg.latent_dim)
        n = f"{d}upsample.{i}.1."
        sd[n + "dwconv.conv.weight"] = _r(cfg.latent_dim, 1, 7)
        sd[n + "dwconv.conv.bias"] = _r(cfg.latent_dim)
        sd[n + "norm.weight"] = np.ones(cfg.latent_dim, np.float32)
        sd[n + "norm.bias"] = np.zeros(cfg.latent_dim, np.float32)
        sd[n + "pwconv1.weight"] = _r(4 * cfg.latent_dim, cfg.latent_dim)
        sd[n + "pwconv1.bias"] = _r(4 * cfg.latent_dim)
        sd[n + "pwconv2.weight"] = _r(cfg.latent_dim, 4 * cfg.latent_dim)
        sd[n + "pwconv2.bias"] = _r(cfg.latent_dim)
        sd[n + "gamma"] = np.full(cfg.latent_dim, 0.1, np.float32)
    sd[d + "decoder.0.conv.weight"] = _r(cfg.decoder_dim, cfg.latent_dim, 7)
    sd[d + "decoder.0.conv.bias"] = _r(cfg.decoder_dim)
    for i, up in enumerate(cfg.upsample_rates):
        n = f"{d}decoder.{i + 1}.block."
        ind = cfg.decoder_dim >> i
        outd = cfg.decoder_dim >> (i + 1)
        sd[n + "0.alpha"] = _r(ind)
        sd[n + "0.beta"] = _r(ind)
        sd[n + "1.conv.weight"] = _r(ind, outd, 2 * up)
        sd[n + "1.conv.bias"] = _r(outd)
        for j in (2, 3, 4):
            sd[n + f"{j}.act1.alpha"] = _r(outd)
            sd[n + f"{j}.act1.beta"] = _r(outd)
            sd[n + f"{j}.conv1.conv.weight"] = _r(outd, outd, 7)
            sd[n + f"{j}.conv1.conv.bias"] = _r(outd)
            sd[n + f"{j}.act2.alpha"] = _r(outd)
            sd[n + f"{j}.act2.beta"] = _r(outd)
            sd[n + f"{j}.conv2.conv.weight"] = _r(outd, outd, 1)
            sd[n + f"{j}.conv2.conv.bias"] = _r(outd)
    nb = len(cfg.upsample_rates)
    outd = cfg.decoder_dim >> nb
    sd[f"{d}decoder.{nb + 1}.alpha"] = _r(outd)
    sd[f"{d}decoder.{nb + 1}.beta"] = _r(outd)
    sd[f"{d}decoder.{nb + 2}.conv.weight"] = _r(1, outd, 7)
    sd[f"{d}decoder.{nb + 2}.conv.bias"] = _r(1)
    return sd


@pytest.fixture(scope="module")
def tiny_decoder():
    cfg = _tiny_decoder_cfg()
    params = map_decoder_weights(cfg, _decoder_sd(cfg))
    return SpeechTokenizerDecoder(cfg, params)


def test_decoder_upsample_shape(tiny_decoder):
    dec = tiny_decoder
    T = 12
    codes = RNG.integers(0, dec.config.codebook_size, size=(1, T, dec.config.num_quantizers))
    audio = dec.decode(codes)
    assert audio.shape == (1, T * dec.config.total_upsample)
    assert np.all(np.abs(audio) <= 1.0)
    assert np.abs(audio).max() > 0


def test_decoder_causality(tiny_decoder):
    """Causal convs + causal attention: changing later frames must not
    change earlier audio (the property chunked streaming relies on)."""
    dec = tiny_decoder
    T = 24
    codes = RNG.integers(0, dec.config.codebook_size, size=(1, T, dec.config.num_quantizers))
    codes2 = codes.copy()
    codes2[:, -8:, :] = (codes2[:, -8:, :] + 7) % dec.config.codebook_size
    a1, a2 = dec.decode(codes), dec.decode(codes2)
    up = dec.config.total_upsample
    np.testing.assert_allclose(a1[:, : (T - 8) * up], a2[:, : (T - 8) * up], atol=1e-5)
    assert np.abs(a1[:, (T - 8) * up :] - a2[:, (T - 8) * up :]).max() > 1e-6


def test_chunked_decode_matches_full(tiny_decoder):
    """With full left context each chunk sees everything before it, so
    chunked_decode must reproduce the full decode exactly (causality)."""
    dec = tiny_decoder
    T = 30
    codes = RNG.integers(0, dec.config.codebook_size, size=(1, T, dec.config.num_quantizers))
    full = dec.decode(codes)
    chunked = dec.chunked_decode(codes, chunk_size=10, left_context=T)
    assert chunked.shape == full.shape
    np.testing.assert_allclose(chunked, full, atol=1e-5)
    # the production setting (bounded context) keeps length and stays close
    bounded = dec.chunked_decode(codes, chunk_size=10, left_context=8)
    assert bounded.shape == full.shape


# ── talker + code predictor ──────────────────────────────────────────────


def _tts_checkpoint(tmp_path):
    import safetensors.numpy as st

    V, D, Dp = 64, 32, 24  # codec vocab, talker hidden, predictor hidden
    TV, TD = 160000, 40  # text vocab (must cover role ids ~151644), text hidden
    groups = 4
    sd = {}

    def block(prefix, hidden, inter, H, Hkv, hd, n_layers):
        for i in range(n_layers):
            L = f"{prefix}model.layers.{i}."
            sd[L + "self_attn.q_proj.weight"] = _r(H * hd, hidden)
            sd[L + "self_attn.k_proj.weight"] = _r(Hkv * hd, hidden)
            sd[L + "self_attn.v_proj.weight"] = _r(Hkv * hd, hidden)
            sd[L + "self_attn.o_proj.weight"] = _r(hidden, H * hd)
            sd[L + "self_attn.q_norm.weight"] = np.ones(hd, np.float32)
            sd[L + "self_attn.k_norm.weight"] = np.ones(hd, np.float32)
            sd[L + "input_layernorm.weight"] = np.ones(hidden, np.float32)
            sd[L + "post_attention_layernorm.weight"] = np.ones(hidden, np.float32)
            sd[L + "mlp.gate_proj.weight"] = _r(2 * hidden, hidden)
            sd[L + "mlp.up_proj.weight"] = _r(2 * hidden, hidden)
            sd[L + "mlp.down_proj.weight"] = _r(hidden, 2 * hidden)
        sd[f"{prefix}model.norm.weight"] = np.ones(hidden, np.float32)

    block("talker.", D, 2 * D, 4, 2, 8, 2)
    sd["talker.model.codec_embedding.weight"] = _r(V, D, scale=0.2)
    sd["talker.model.text_embedding.weight"] = _r(TV, TD, scale=0.2)
    sd["talker.codec_head.weight"] = _r(V, D, scale=0.2)
    sd["talker.text_projection.linear_fc1.weight"] = _r(TD, TD)
    sd["talker.text_projection.linear_fc1.bias"] = _r(TD)
    sd["talker.text_projection.linear_fc2.weight"] = _r(D, TD)
    sd["talker.text_projection.linear_fc2.bias"] = _r(D)

    block("talker.code_predictor.", Dp, 2 * Dp, 2, 2, 8, 2)
    for i in range(groups - 1):
        sd[f"talker.code_predictor.model.codec_embedding.{i}.weight"] = _r(V, D, scale=0.2)
        sd[f"talker.code_predictor.lm_head.{i}.weight"] = _r(V, Dp, scale=0.2)
    sd["talker.code_predictor.small_to_mtp_projection.weight"] = _r(Dp, D)
    sd["talker.code_predictor.small_to_mtp_projection.bias"] = _r(Dp)

    st.save_file(sd, str(tmp_path / "model.safetensors"))
    cfg = {
        "model_type": "qwen3_tts",
        "tts_bos_token_id": 151672,
        "tts_eos_token_id": 151673,
        "tts_pad_token_id": 151671,
        "talker_config": {
            "vocab_size": V, "hidden_size": D, "intermediate_size": 2 * D,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "num_key_value_heads": 2, "head_dim": 8,
            "num_code_groups": groups,
            "text_hidden_size": TD, "text_vocab_size": TV,
            "codec_eos_token_id": V - 1, "codec_think_id": V - 2,
            "codec_nothink_id": V - 3, "codec_think_bos_id": V - 4,
            "codec_think_eos_id": V - 5, "codec_pad_id": V - 6,
            "codec_bos_id": V - 7,
            "codec_language_id": {"english": V - 10, "sichuan dialect": V - 11},
            "spk_id": {"vivian": V - 12},
            "spk_is_dialect": {"vivian": False},
            "code_predictor_config": {
                "vocab_size": V, "hidden_size": Dp, "intermediate_size": 2 * Dp,
                "num_hidden_layers": 2, "num_attention_heads": 2,
                "num_key_value_heads": 2, "head_dim": 8,
                "num_code_groups": groups,
            },
        },
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg))
    return tmp_path


@pytest.fixture(scope="module")
def tts_model(tmp_path_factory):
    from crane_tpu.models.qwen3_tts import load_qwen3_tts

    d = _tts_checkpoint(tmp_path_factory.mktemp("qwen3tts"))
    return load_qwen3_tts(str(d))


def test_prefill_layout(tts_model):
    m = tts_model
    # no language, no speaker: codec = [nothink, think_bos, think_eos, pad, bos]
    pre, trailing, pad = m.build_prefill_embeds([5, 6, 7], "auto", None)
    assert pre.shape[1] == 3 + 4 + 1  # role(3) + overlay(n-1=4) + first_text+bos
    assert trailing.shape[1] == 3 - 1 + 1  # remaining text + tts_eos
    # language adds one codec slot; speaker adds another
    pre2, _, _ = m.build_prefill_embeds([5, 6, 7], "english", None)
    assert pre2.shape[1] == pre.shape[1] + 1
    pre3, _, _ = m.build_prefill_embeds([5, 6, 7], "english", "Vivian")
    assert pre3.shape[1] == pre2.shape[1] + 1


def test_generate_speech_codes_shape_and_range(tts_model):
    m = tts_model
    opts = SpeechOptions(max_new_tokens=6, seed=1)
    codes = m.generate_speech_codes([5, 6, 7, 8], "english", "Vivian", opts)
    assert codes.ndim == 2 and codes.shape[1] == m.num_code_groups
    assert 2 <= codes.shape[0] <= 6  # EOS suppressed for the first 2 frames
    V = m.sp_tokens.vocab_size
    # code-0 never lands in the suppressed control range (top 1024 ids)
    assert np.all(codes[:, 0] < max(V - 1024, 0)) or V <= 1024
    assert np.all((codes >= 0) & (codes < V))


def test_streaming_equals_batch(tts_model):
    m = tts_model
    opts = SpeechOptions(max_new_tokens=5, seed=3)
    batch = m.generate_speech_codes([9, 10, 11], "auto", None, opts)
    state = m.prepare_streaming([9, 10, 11], "auto", None, opts)
    frames = []
    for _ in range(5):
        f = m.generate_one_frame(state)
        if f is None:
            break
        frames.append(f)
    stream = np.asarray(frames, np.int32).reshape(-1, m.num_code_groups)
    np.testing.assert_array_equal(batch, stream)


def test_voice_clone_codes(tts_model):
    m = tts_model
    ref_codes = RNG.integers(0, 40, size=(6, m.num_code_groups))
    spk = _r(m.tcfg.hidden_size)[...]
    opts = SpeechOptions(max_new_tokens=4, seed=5)
    codes = m.generate_voice_clone_codes([5, 6], [7, 8], ref_codes, spk, "english", opts)
    assert codes.shape[1] == m.num_code_groups
    assert codes.shape[0] >= 1


def test_icl_prompt_overlay_branches(tts_model):
    m = tts_model
    ref_embeds = jnp.asarray(_r(5, m.tcfg.hidden_size))[None]
    # text (2+2+1=5) < codec (1+5=6): padded overlay, trailing = tts_pad
    icl, trailing = m.build_icl_prompt([1, 2], [3, 4], ref_embeds)
    assert icl.shape[1] == 6 and trailing.shape[1] == 1
    # text (8+2+1=11) > codec (6): overlay first 6, trailing = rest (5)
    icl2, t2 = m.build_icl_prompt(list(range(10, 18)), [3, 4], ref_embeds)
    assert icl2.shape[1] == 6 and t2.shape[1] == 5


def test_voice_clone_end_to_end_from_wav(tts_model, tiny_decoder):
    """WAV in -> cloned speech out through the SDK adapter: the speech
    tokenizer ENCODER turns reference audio into codec codes
    (speech_tokenizer_v2.rs:1324-1364), the ICL prompt conditions the talker,
    and the decoder renders audio. Also asserts determinism (same seed ->
    same waveform) — the batch/streaming invariant for the clone path."""
    from crane_tpu.models.speech_tokenizer import (
        SpeechEncoderConfig,
        SpeechTokenizerEncoder,
        init_encoder_params,
    )
    from crane_tpu.sdk.audio import Qwen3Tts

    m = tts_model
    ecfg = SpeechEncoderConfig(
        num_filters=8, hidden_size=24, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        head_dim=8, upsampling_ratios=(4, 3), codebook_size=32,
        codebook_dim=12, num_quantizers=6, num_semantic_quantizers=1,
        sliding_window=8, vector_quantization_hidden_dimension=12,
        valid_num_quantizers=m.num_code_groups,
    )
    m.ref_encoder = SpeechTokenizerEncoder(ecfg, init_encoder_params(ecfg, seed=7))
    m.speaker_encoder = lambda wav: _r(m.tcfg.hidden_size)
    m.decoder = tiny_decoder

    class Tok:
        def encode(self, s):
            return [5 + (ord(c) % 7) for c in s][:6]

    m.tokenizer = Tok()
    wav_ref = (RNG.normal(size=2400) * 0.2).astype(np.float32)

    # the encoder emits [T, num_code_groups] codes within the talker vocab
    ref_codes = m.encode_reference(wav_ref)
    assert ref_codes.shape[1] == m.num_code_groups
    assert np.all((ref_codes >= 0) & (ref_codes < ecfg.codebook_size))

    tts = Qwen3Tts(m)
    assert tts.supports_voice_cloning()
    opts = SpeechOptions(max_new_tokens=4, seed=11)
    out1 = tts.generate_voice_clone("hi there", wav_ref, "ref text", opts)
    assert out1.ndim == 1 and len(out1) > 0
    assert len(out1) % tiny_decoder.config.total_upsample == 0
    out2 = tts.generate_voice_clone("hi there", wav_ref, "ref text", opts)
    np.testing.assert_array_equal(out1, out2)


def test_load_path_wires_clone_stack(tmp_path):
    """load_qwen3_tts on a released-layout checkpoint (talker +
    ``speaker_encoder.*`` in the main safetensors, ``speech_tokenizer/``
    with ``decoder.*`` AND ``encoder.*``) wires the FULL voice-clone stack:
    ECAPA speaker encoder, Mimi ref encoder, RVQGAN decoder — WAV in ->
    cloned audio out with no manual attribute set."""
    import safetensors.numpy as st

    from crane_tpu.models.qwen3_tts import load_qwen3_tts
    from crane_tpu.models.speech_tokenizer import (
        SpeechEncoderConfig,
        random_decoder_state_dict,
        random_encoder_state_dict,
    )
    from crane_tpu.models.speaker_encoder import random_speaker_encoder_state_dict
    from crane_tpu.sdk.audio import Qwen3Tts

    d = _tts_checkpoint(tmp_path)
    # splice speaker_encoder tensors into the main checkpoint
    sd = dict(st.load_file(str(d / "model.safetensors")))
    sec = {
        "mel_dim": 128, "enc_dim": 32, "enc_channels": [32, 32, 48],
        "enc_kernel_sizes": [5, 3, 1], "enc_dilations": [1, 2, 1],
        "enc_attention_channels": 8, "enc_res2net_scale": 4,
        "enc_se_channels": 8, "sample_rate": 24000,
    }
    from crane_tpu.models.speaker_encoder import EcapaConfig

    sd.update(random_speaker_encoder_state_dict(EcapaConfig(
        mel_dim=128, enc_dim=32, enc_channels=(32, 32, 48),
        enc_kernel_sizes=(5, 3, 1), enc_dilations=(1, 2, 1),
        enc_attention_channels=8, enc_res2net_scale=4, enc_se_channels=8,
    ), seed=3))
    st.save_file(sd, str(d / "model.safetensors"))
    cfg = json.loads((d / "config.json").read_text())
    cfg["speaker_encoder_config"] = sec
    (d / "config.json").write_text(json.dumps(cfg))

    # speech_tokenizer dir: decoder + encoder in one safetensors
    stdir = d / "speech_tokenizer"
    stdir.mkdir()
    dcfg = _tiny_decoder_cfg()
    ecfg = SpeechEncoderConfig(
        num_filters=8, hidden_size=24, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        head_dim=8, upsampling_ratios=(4, 3), codebook_size=32,
        codebook_dim=12, num_quantizers=6, num_semantic_quantizers=1,
        sliding_window=8, vector_quantization_hidden_dimension=12,
        valid_num_quantizers=4,
    )
    st_sd = {**random_decoder_state_dict(dcfg, seed=4),
             **random_encoder_state_dict(ecfg, seed=5)}
    st.save_file(st_sd, str(stdir / "model.safetensors"))
    (stdir / "config.json").write_text(json.dumps({
        "decoder_config": {
            "codebook_size": 32, "hidden_size": 48, "latent_dim": 40,
            "codebook_dim": 40, "num_attention_heads": 4,
            "num_key_value_heads": 2, "head_dim": 12, "sliding_window": 8,
            "intermediate_size": 64, "num_hidden_layers": 2,
            "num_quantizers": 4, "upsample_rates": [4, 3],
            "upsampling_ratios": [2, 2], "decoder_dim": 32,
        },
        "encoder_config": {
            "num_filters": 8, "hidden_size": 24, "intermediate_size": 48,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "num_key_value_heads": 2, "head_dim": 8,
            "upsampling_ratios": [4, 3], "codebook_size": 32,
            "codebook_dim": 12, "num_quantizers": 6,
            "num_semantic_quantizers": 1, "sliding_window": 8,
            "vector_quantization_hidden_dimension": 12,
        },
        "encoder_valid_num_quantizers": 4,
        "output_sample_rate": 24000,
    }))

    m = load_qwen3_tts(str(d))
    assert m.speaker_encoder is not None
    assert m.ref_encoder is not None
    assert m.decoder is not None

    class Tok:
        def encode(self, s):
            return [5 + (ord(c) % 7) for c in s][:6]

    m.tokenizer = Tok()
    wav_ref = (RNG.normal(size=2400) * 0.2).astype(np.float32)
    tts = Qwen3Tts(m)
    assert tts.supports_voice_cloning()
    out = tts.generate_voice_clone(
        "hello", wav_ref, "ref words", SpeechOptions(max_new_tokens=3, seed=9))
    assert out.ndim == 1 and len(out) > 0


def test_end_to_end_synthesis_with_decoder(tts_model, tiny_decoder):
    m = tts_model
    m.decoder = tiny_decoder

    class Tok:
        def encode(self, s):
            return [5 + (ord(c) % 7) for c in s][:6]

    m.tokenizer = Tok()
    # decoder vocab is 32; clamp codes via a wrapper to stay in range
    codes = m.generate_speech_codes([5, 6], "auto", None, SpeechOptions(max_new_tokens=4, seed=2))
    codes = codes % tiny_decoder.config.codebook_size
    # tiny decoder expects 4 quantizers == num_code_groups
    audio = tiny_decoder.chunked_decode(codes[None], chunk_size=3, left_context=2)
    assert audio.shape == (1, codes.shape[0] * tiny_decoder.config.total_upsample)


def test_sdk_voices_and_language_codes(tts_model):
    """voices() discovery + ISO-code language acceptance (reference
    tts_qwen3.rs:16-96): dialects and "auto" excluded, names -> codes,
    and generate paths accept "en" as an alias of "english"."""
    from crane_tpu.sdk.audio import Qwen3Tts, VoiceInfo

    adapter = Qwen3Tts(tts_model)
    voices = adapter.voices()
    assert voices == [VoiceInfo(name="vivian", languages=["en", "sichuan dialect"])]

    # ISO code aliases resolve to the same talker language id
    assert tts_model._language_id("en", None) == tts_model._language_id("english", None)
    assert tts_model._language_id("en", None) is not None
    # unknown codes and "auto" pass through (auto -> no language id)
    assert tts_model._language_id("auto", None) is None
