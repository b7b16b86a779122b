"""Moonshine ASR parity vs HF transformers (reference moonshine_asr/,
which runs it via ONNX; here native JAX — SURVEY.md §7)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from crane_tpu.models.moonshine import load_moonshine


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    torch.manual_seed(0)
    cfg = transformers.MoonshineConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        encoder_num_hidden_layers=2, decoder_num_hidden_layers=2,
        encoder_num_attention_heads=4, decoder_num_attention_heads=4,
        encoder_num_key_value_heads=4, decoder_num_key_value_heads=4,
        partial_rotary_factor=0.9,
    )
    model = transformers.MoonshineForConditionalGeneration(cfg).eval().to(torch.float32)
    d = str(tmp_path_factory.mktemp("moon") / "m")
    model.save_pretrained(d, safe_serialization=True)
    return model, d


def _wav(n=16000):
    t = np.arange(n, dtype=np.float32) / 16000
    return (0.3 * np.sin(2 * np.pi * 300 * t) + 0.1 * np.sin(2 * np.pi * 950 * t)).astype(np.float32)


def test_encoder_matches_hf(tiny):
    model, d = tiny
    mine = load_moonshine(d, dtype=jnp.float32)
    wav = _wav()
    from crane_tpu.models.moonshine import encode

    got = np.asarray(encode(mine.config, mine.params, jnp.asarray(wav)[None]))
    with torch.no_grad():
        ref = model.model.encoder(torch.from_numpy(wav)[None]).last_hidden_state.numpy()
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_greedy_transcription_matches_hf(tiny):
    model, d = tiny
    mine = load_moonshine(d, dtype=jnp.float32)
    wav = _wav()
    with torch.no_grad():
        ref = model.generate(
            torch.from_numpy(wav)[None], max_new_tokens=12, do_sample=False,
        )[0].tolist()
    # HF output starts with decoder_start_token and may end with EOS
    ref_core = [t for t in ref[1:] if t != mine.config.eos_token_id][:12]
    got = mine.transcribe_ids(wav)
    assert got[: len(ref_core)] == ref_core
