"""Mimi codec parity vs HF transformers MimiModel — the speech-tokenizer
oracle for the TTS stack (reference speech_tokenizer_v2.rs is a Mimi-style
RVQGAN; SURVEY.md §2.5)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from crane_tpu.models.mimi import MimiCodec


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    torch.manual_seed(0)
    cfg = transformers.MimiConfig(
        hidden_size=64, num_filters=8, num_residual_layers=1,
        upsampling_ratios=[4, 3], codebook_size=64, codebook_dim=16,
        num_quantizers=4, num_semantic_quantizers=1,
        vector_quantization_hidden_dimension=16,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        head_dim=16, intermediate_size=64, sliding_window=32,
        upsample_groups=64,
    )
    model = transformers.MimiModel(cfg).eval().to(torch.float32)
    # randomize codebooks (zero-init by default -> degenerate)
    with torch.no_grad():
        for q in (model.quantizer.semantic_residual_vector_quantizer,
                  model.quantizer.acoustic_residual_vector_quantizer):
            for layer in q.layers:
                layer.codebook.embed_sum.normal_()
                layer.codebook.cluster_usage.fill_(1.0)
    d = str(tmp_path_factory.mktemp("mimi") / "m")
    model.save_pretrained(d, safe_serialization=True)
    return model, d


def test_decode_matches_hf(tiny):
    model, d = tiny
    codec = MimiCodec.from_pretrained(d)
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 64, (1, 4, 10)).astype(np.int64)
    with torch.no_grad():
        ref = model.decode(torch.from_numpy(codes)).audio_values.numpy()
    got = codec.decode(codes)
    assert got.shape == ref[:, 0, :].shape
    np.testing.assert_allclose(got, ref[:, 0, :], rtol=2e-3, atol=2e-3)


def test_encode_matches_hf(tiny):
    model, d = tiny
    codec = MimiCodec.from_pretrained(d)
    rng = np.random.default_rng(1)
    # 24 samples/frame at these ratios (4*3*2); use 10 frames of audio
    audio = rng.standard_normal((1, 240)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = model.encode(torch.from_numpy(audio)[:, None, :]).audio_codes.numpy()
    got = codec.encode(audio, num_quantizers=4)
    np.testing.assert_array_equal(got, ref)


def test_roundtrip_and_chunked_decode(tiny):
    _, d = tiny
    codec = MimiCodec.from_pretrained(d)
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 64, (1, 4, 23)).astype(np.int64)
    full = codec.decode(codes)
    # everything after the RVQ is causal, so chunked decode with full left
    # context must equal the one-shot decode exactly
    exact = codec.chunked_decode(codes, chunk=8, overlap=23)
    assert exact.shape == full.shape
    np.testing.assert_allclose(exact, full, rtol=1e-4, atol=1e-4)
    # small overlap: approximate but well-formed
    approx = codec.chunked_decode(codes, chunk=8, overlap=3)
    assert approx.shape == full.shape
    assert np.isfinite(approx).all()
