"""Two-level AR TTS parity vs HF CsmForConditionalGeneration — the reference's
Talker + CodePredictor architecture family (qwen3_tts/modeling.rs)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from crane_tpu.models.csm_tts import load_csm


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    torch.manual_seed(0)
    cfg = transformers.CsmConfig(
        num_codebooks=4, vocab_size=64, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=96,
        max_position_embeddings=256, text_vocab_size=200, rope_scaling=None,
        audio_token_id=150, audio_eos_token_id=151,
        depth_decoder_config=dict(
            num_codebooks=4, vocab_size=64, backbone_hidden_size=64,
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=1, intermediate_size=48, rope_scaling=None,
        ),
        codec_config=dict(
            model_type="mimi", hidden_size=32, num_filters=8,
            num_residual_layers=1, upsampling_ratios=[4, 3], codebook_size=64,
            codebook_dim=16, num_quantizers=4, num_semantic_quantizers=1,
            vector_quantization_hidden_dimension=16, num_hidden_layers=1,
            num_attention_heads=2, num_key_value_heads=2, head_dim=16,
            intermediate_size=32, sliding_window=16, upsample_groups=32,
        ),
    )
    model = transformers.CsmForConditionalGeneration(cfg).eval().to(torch.float32)
    d = str(tmp_path_factory.mktemp("csm") / "m")
    model.save_pretrained(d, safe_serialization=True)
    return model, d


def test_codes_match_hf(tiny):
    model, d = tiny
    mine = load_csm(d, dtype=jnp.float32)
    text = [5, 17, 42, 9, 3]
    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.tensor([text]), max_new_tokens=6, do_sample=False,
            depth_decoder_do_sample=False, output_audio=False,
        )
    ref_codes = ref[0].numpy()  # [frames, K] (possibly ending with EOS frame)
    got = mine.generate_codes(text, max_frames=6)
    n = min(len(got), len(ref_codes))
    # drop a trailing EOS frame from the HF output if present
    ref_trim = ref_codes[: len(got)] if len(ref_codes) > len(got) else ref_codes
    got_trim = got[: len(ref_trim)]
    assert len(got_trim) > 0
    np.testing.assert_array_equal(got_trim, ref_trim)


def test_voice_clone_audio_context_matches_hf(tiny):
    """Voice cloning: reference audio encoded to codec frames and spliced at
    audio-token positions must reproduce HF's audio-conditioned generation."""
    model, d = tiny
    mine = load_csm(d, dtype=jnp.float32, with_codec=True)
    cfg = model.config
    rng = np.random.default_rng(3)
    # 5 codec frames of context: 5 * 24 samples at these tiny ratios
    wav = (rng.standard_normal(40 * 24) * 0.1).astype(np.float32)
    n_audio = mine.codec.encode(wav[None], num_quantizers=4).shape[-1]
    ids = (
        [5, 17] + [cfg.audio_token_id] * n_audio + [cfg.audio_eos_token_id] + [9, 3]
    )
    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.tensor([ids]),
            input_values=torch.from_numpy(wav)[None, None, :],
            input_values_cutoffs=torch.tensor([[len(wav)]]),
            max_new_tokens=5, do_sample=False, depth_decoder_do_sample=False,
            output_audio=False,
        )[0].numpy()
    got = mine.generate_codes(ids, audio_context=wav, max_frames=5)
    n = min(len(got), len(ref))
    assert n > 0
    np.testing.assert_array_equal(got[:n], ref[:n])


def test_speech_decodes_through_codec(tiny):
    model, d = tiny
    mine = load_csm(d, dtype=jnp.float32, with_codec=False)
    # attach the codec from the nested codec_config weights
    import json, os

    from crane_tpu.loaders.safetensors_loader import load_state_dict
    from crane_tpu.models.mimi import MimiCodec, MimiCodecConfig, map_mimi_weights

    with open(os.path.join(d, "config.json")) as f:
        hf = json.load(f)["codec_config"]
    ccfg = MimiCodecConfig(
        hidden_size=hf["hidden_size"], num_filters=hf["num_filters"],
        num_residual_layers=hf["num_residual_layers"],
        upsampling_ratios=tuple(hf["upsampling_ratios"]),
        codebook_size=hf["codebook_size"], codebook_dim=hf["codebook_dim"],
        num_quantizers=hf["num_quantizers"],
        num_semantic_quantizers=hf["num_semantic_quantizers"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"], head_dim=hf["head_dim"],
        intermediate_size=hf["intermediate_size"],
        sliding_window=hf["sliding_window"], upsample_groups=hf["upsample_groups"],
    )
    sd = load_state_dict(d)
    codec_sd = {
        k.replace("codec_model.", ""): v
        for k, v in sd.items() if k.startswith("codec_model.")
    }
    mine.codec = MimiCodec(ccfg, map_mimi_weights(ccfg, codec_sd))
    wav = mine.generate_speech([5, 17, 42], max_frames=4)
    assert wav.ndim == 1
    assert np.isfinite(wav).all()
