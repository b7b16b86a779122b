"""Whisper ASR parity vs HF (the mel frontend already matches
WhisperFeatureExtractor bit-for-bit in test_audio)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from crane_tpu.models.whisper import load_whisper


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    torch.manual_seed(0)
    cfg = transformers.WhisperConfig(
        vocab_size=256, d_model=64, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128, num_mel_bins=16,
        max_source_positions=75, max_target_positions=64,
        decoder_start_token_id=3, eos_token_id=2, pad_token_id=0,
        bos_token_id=1, suppress_tokens=[], begin_suppress_tokens=[],
    )
    model = transformers.WhisperForConditionalGeneration(cfg).eval().to(torch.float32)
    d = str(tmp_path_factory.mktemp("whisper") / "m")
    model.save_pretrained(d, safe_serialization=True)
    return model, d


def _mel():
    rng = np.random.default_rng(0)
    return rng.standard_normal((1, 16, 150)).astype(np.float32)


def test_encoder_matches_hf(tiny):
    model, d = tiny
    mine = load_whisper(d, dtype=jnp.float32)
    mel = _mel()
    with torch.no_grad():
        ref = model.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    from crane_tpu.models.whisper import whisper_encode

    got = np.asarray(whisper_encode(mine.config, mine.params["encoder"], jnp.asarray(mel)))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_greedy_transcription_matches_hf(tiny):
    model, d = tiny
    mine = load_whisper(d, dtype=jnp.float32)
    mel = _mel()
    with torch.no_grad():
        ref = model.generate(
            input_features=torch.from_numpy(mel), max_new_tokens=12,
            do_sample=False,
        )[0].tolist()
    # strip the leading decoder_start + trailing EOS
    ref_core = [t for t in ref if t not in (3, 2)][:12]

    from crane_tpu.models.whisper import _decode_step, _encode_kv
    from crane_tpu.ops.kv_cache import KVCache, LayerKVCache

    cfg = mine.config
    enc, enc_kv = _encode_kv(cfg, mine.params, jnp.asarray(mel))
    cache = KVCache(
        layers=tuple(
            LayerKVCache.empty(1, 64, cfg.num_heads, cfg.head_dim, jnp.float32)
            for _ in range(cfg.decoder_layers)
        ),
        lengths=jnp.zeros((1,), jnp.int32),
    )
    tok, cache = _decode_step(
        cfg, mine.params, cache, jnp.asarray([[3]], jnp.int32), enc_kv
    )
    got = []
    for _ in range(12):
        t = int(tok[0])
        if t == 2:
            break
        got.append(t)
        tok, cache = _decode_step(cfg, mine.params, cache, tok[:, None], enc_kv)
    assert got[: len(ref_core)] == ref_core
