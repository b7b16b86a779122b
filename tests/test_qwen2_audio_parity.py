"""Audio-LLM parity vs HF Qwen2AudioForConditionalGeneration — the reference's
qwen3_asr call stack (mel -> audio encoder -> splice -> AR decode, §3.6)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from crane_tpu.models.qwen2_audio import audio_feature_lengths, load_qwen2_audio

AUDIO_TOKEN = 151646


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    torch.manual_seed(0)
    cfg = transformers.Qwen2AudioConfig(
        audio_config=dict(
            d_model=32, encoder_layers=2, encoder_attention_heads=2,
            encoder_ffn_dim=64, num_mel_bins=16, max_source_positions=50,
        ),
        text_config=dict(
            model_type="qwen2", vocab_size=151700, hidden_size=64,
            intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=512,
            tie_word_embeddings=False,
        ),
        audio_token_index=AUDIO_TOKEN,
    )
    model = transformers.Qwen2AudioForConditionalGeneration(cfg).eval().to(torch.float32)
    d = str(tmp_path_factory.mktemp("q2a") / "m")
    model.save_pretrained(d, safe_serialization=True)
    return model, d


def test_encoder_matches_hf(tiny):
    model, d = tiny
    mine = load_qwen2_audio(d, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 16, 100)).astype(np.float32)  # max frames = 100
    with torch.no_grad():
        ref = model.audio_tower(torch.from_numpy(mel)).last_hidden_state
        ref = model.multi_modal_projector(ref).numpy()
    from crane_tpu.models.qwen2_audio import _encode_project

    got = np.asarray(_encode_project(mine.audio_config, mine.params, jnp.asarray(mel)))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_generation_with_audio_matches_hf(tiny):
    model, d = tiny
    mine = load_qwen2_audio(d, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    mel_len = 100
    n_audio = audio_feature_lengths(mel_len)
    mel = rng.standard_normal((1, 16, 100)).astype(np.float32)
    ids = [5, 6] + [AUDIO_TOKEN] * n_audio + [7, 8]

    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.tensor([ids]),
            input_features=torch.from_numpy(mel),
            feature_attention_mask=torch.ones((1, 100), dtype=torch.long),
            max_new_tokens=8, do_sample=False, eos_token_id=None, pad_token_id=0,
        )[0, len(ids):].tolist()

    # splice my path with the same mel directly (bypass wav->mel)
    import jax

    from crane_tpu.models.qwen2_audio import _audio_decode_step, _audio_prefill, _encode_project
    from crane_tpu.models.modules.transformer import make_cache
    from crane_tpu.utils.buckets import bucket_length

    feats = _encode_project(mine.audio_config, mine.params, jnp.asarray(mel))
    embeds = mine.params["embed"][jnp.asarray(np.asarray(ids))][None]
    (pos,) = np.where(np.asarray(ids) == AUDIO_TOKEN)
    embeds = embeds.at[0, pos].set(feats[0, :n_audio])
    S = len(ids)
    sb = bucket_length(S, floor=64)
    embeds = jnp.pad(embeds, ((0, 0), (0, sb - S), (0, 0)))
    cache = make_cache(mine.config, 1, 128, jnp.float32)
    logits, cache = _audio_prefill(
        mine.config, mine.params, mine.rope, cache, embeds, jnp.asarray(S, jnp.int32)
    )
    got = [int(jnp.argmax(logits, -1)[0])]
    cur = jnp.asarray(got, jnp.int32)
    for _ in range(7):
        cur, cache = _audio_decode_step(mine.config, mine.params, mine.rope, cache, cur)
        got.append(int(cur[0]))
    assert got == ref


def test_transcribe_end_to_end(tiny):
    """Full wav -> mel -> encoder -> prompt -> decode path runs."""
    _, d = tiny
    mine = load_qwen2_audio(d, dtype=jnp.float32)
    # pick wav length so mel frames <= max (50*2=100): 100 frames = 16000 samples
    t = np.arange(15999, dtype=np.float32) / 16000
    wav = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    n = mine.n_audio_tokens(len(wav))
    ids = [5] + [AUDIO_TOKEN] * n + [7]
    out = mine.generate(ids, wav, max_new_tokens=4)
    assert len(out) == 4
