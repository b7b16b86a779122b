"""Qwen3-TTS speech-tokenizer ENCODER parity (voice-clone reference codes).

The reference prefers HF-Mimi encode semantics for reference-audio codes
(speech_tokenizer_v2.rs:1382-1472, HfMimiEncoder "mirrors the vendor
qwen3-tts-rs-3 encoder"; encode() dispatch :1584-1593 tries encoder_hf
first). Oracle: transformers MimiModel's encoder path at tiny shapes — the
released speech_tokenizer ships exactly this layout under ``encoder.*``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from crane_tpu.models.speech_tokenizer import (
    SpeechEncoderConfig,
    SpeechTokenizerEncoder,
    encode_audio,
    encoder_seanet,
    encoder_transformer,
    map_encoder_weights,
)

RATIOS = (4, 3)  # decoder order; encoder strides are reversed -> (3, 4)
VALID_NQ = 3


def _tiny_cfgs():
    hf = transformers.MimiConfig(
        audio_channels=1, num_filters=8, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=2, head_dim=8,
        intermediate_size=64, kernel_size=7, last_kernel_size=3,
        residual_kernel_size=3, num_residual_layers=1,
        upsampling_ratios=list(RATIOS), codebook_size=32, codebook_dim=16,
        num_quantizers=4, num_semantic_quantizers=1, sliding_window=16,
        vector_quantization_hidden_dimension=16, upsample_groups=32,
        sampling_rate=600, frame_rate=25.0, use_causal_conv=True,
        use_cache=False, use_conv_shortcut=False,
    )
    cfg = SpeechEncoderConfig(
        num_filters=8, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        head_dim=8, kernel_size=7, last_kernel_size=3, residual_kernel_size=3,
        num_residual_layers=1, upsampling_ratios=RATIOS, codebook_size=32,
        codebook_dim=16, num_quantizers=4, num_semantic_quantizers=1,
        sliding_window=16, vector_quantization_hidden_dimension=16,
        valid_num_quantizers=VALID_NQ,
    )
    return hf, cfg


@pytest.fixture(scope="module")
def setup():
    hf_cfg, cfg = _tiny_cfgs()
    torch.manual_seed(0)
    model = transformers.MimiModel(hf_cfg).eval().to(torch.float32)
    # make the codebooks real quantizers: random embed_sum with unit usage
    with torch.no_grad():
        for q in (
            model.quantizer.semantic_residual_vector_quantizer,
            model.quantizer.acoustic_residual_vector_quantizer,
        ):
            for layer in q.layers:
                layer.codebook.embed_sum.normal_(0, 1.0)
                layer.codebook.cluster_usage.uniform_(0.5, 2.0)
    sd = {"encoder." + k: v.numpy() for k, v in model.state_dict().items()}
    params = map_encoder_weights(cfg, sd)
    return model, cfg, params


def test_seanet_latent_matches_hf(setup):
    model, cfg, params = setup
    wav = np.random.default_rng(0).normal(size=(1, 1, 480)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = model.encoder(torch.from_numpy(wav))
        ref = model.downsample(ref).numpy()
    got = np.asarray(encoder_seanet(cfg, params, jnp.asarray(wav)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_transformer_latent_matches_hf(setup):
    model, cfg, params = setup
    wav = np.random.default_rng(1).normal(size=(1, 1, 480)).astype(np.float32) * 0.3
    with torch.no_grad():
        h = model.downsample(model.encoder(torch.from_numpy(wav)))
        ref = model.encoder_transformer(h.transpose(1, 2))[0].numpy()
    lat = encoder_seanet(cfg, params, jnp.asarray(wav))
    got = np.asarray(encoder_transformer(cfg, params["transformer"], lat.transpose(0, 2, 1)))
    np.testing.assert_allclose(got, ref, rtol=5e-5, atol=5e-5)


def test_codes_match_hf_encode(setup):
    """End-to-end: audio -> [B, T, n_q] codes identical to MimiModel.encode
    (the reference's parity bar: ICL conditioning consumes these verbatim)."""
    model, cfg, params = setup
    wav = np.random.default_rng(2).normal(size=(1, 1, 1200)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = model.encode(torch.from_numpy(wav), num_quantizers=VALID_NQ).audio_codes
    got = np.asarray(encode_audio(cfg, params, jnp.asarray(wav)))
    assert got.shape == (1, ref.shape[2], VALID_NQ)
    np.testing.assert_array_equal(got.transpose(0, 2, 1), ref.numpy())


def test_encoder_class_and_voice_clone_wiring(setup):
    """SpeechTokenizerEncoder.encode returns [T, n_q]; a Qwen3TTSModel with
    ref_encoder set no longer raises from encode_reference."""
    model, cfg, params = setup
    enc = SpeechTokenizerEncoder(cfg, params)
    wav = np.random.default_rng(3).normal(size=2400).astype(np.float32) * 0.3
    codes = enc.encode(wav)
    assert codes.ndim == 2 and codes.shape[1] == VALID_NQ
    assert codes.dtype == np.int32
    with torch.no_grad():
        ref = model.encode(
            torch.from_numpy(wav[None, None]), num_quantizers=VALID_NQ
        ).audio_codes[0].numpy().T
    np.testing.assert_array_equal(codes, ref)
