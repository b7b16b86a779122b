"""Tekken tokenizer: tekken.json parsing, BPE merge order, special offsets,
round-trip, and the Voxtral checkpoint loader pieces that feed it
(reference voxtral_tts/model.rs:315-329 loads the same file format)."""

import base64
import json

import numpy as np
import pytest

from crane_tpu.tokenizer.tekken import Tekkenizer

PATTERN = r"""[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]*[\p{Ll}\p{Lm}\p{Lo}\p{M}]+|[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]+[\p{Ll}\p{Lm}\p{Lo}\p{M}]*|\p{N}{1,3}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"""


def _tekken_file(tmp_path, merges, n_special=8, extra_vocab=0):
    """Build a tekken.json: 256 byte tokens + given merge byte-strings."""
    vocab = [bytes([i]) for i in range(256)] + list(merges)
    vocab += [b"\xff" + bytes([i % 256]) * 3 for i in range(extra_vocab)]
    entries = [
        {"rank": i, "token_bytes": base64.b64encode(b).decode(), "token_str": None}
        for i, b in enumerate(vocab)
    ]
    specials = [
        {"rank": i, "token_str": s, "is_control": True}
        for i, s in enumerate(
            ["<unk>", "<s>", "</s>", "[INST]", "[/INST]", "[PAD]", "[A]", "[B]"][:n_special]
        )
    ]
    data = {
        "config": {
            "pattern": PATTERN,
            "num_vocab_tokens": len(vocab),
            "default_vocab_size": n_special + 256 + len(merges),
            "default_num_special_tokens": n_special,
            "version": "v7",
        },
        "vocab": entries,
        "special_tokens": specials,
    }
    p = tmp_path / "tekken.json"
    p.write_text(json.dumps(data))
    return str(p)


@pytest.fixture
def tok(tmp_path):
    merges = [b"he", b"ll", b"llo", b"hello", b" hello", b"lo"]
    return Tekkenizer.from_file(_tekken_file(tmp_path, merges))


def test_byte_fallback_and_specials_offset(tok):
    ids = tok.encode("\x01\x02")
    assert ids == [8 + 1, 8 + 2]  # id = rank + num_special_tokens
    assert tok.bos_id == 1 and tok.eos_id == 2
    assert tok.token_to_id("</s>") == 2
    assert tok.token_to_id("he") == 8 + 256


def test_merge_order_lowest_rank_first(tok):
    # "hello" merges he(256) then ll(257) -> then llo? "he"+"llo" pair ranks:
    # full piece "hello" itself is in vocab -> single token
    assert tok.encode("hello") == [8 + 256 + 3]
    # "helo": he + lo (ranks 256, 261); no "helo" token
    assert tok.encode("helo") == [8 + 256, 8 + 256 + 5]


def test_regex_presplit_space_prefix(tok):
    # " hello" is one regex piece and a single vocab entry
    assert tok.encode("say hello") == tok.encode("say") + [8 + 256 + 4]


def test_roundtrip_utf8(tok):
    for text in ["hello world", "héllo ünïcode", "日本語テスト", "a\nb\tc"]:
        assert tok.decode(tok.encode(text)) == text


def test_bos_eos_and_special_decode(tok):
    ids = tok.encode("hello", bos=True, eos=True)
    assert ids[0] == tok.bos_id and ids[-1] == tok.eos_id
    assert tok.decode(ids) == "hello"
    assert tok.decode(ids, include_specials=True) == "<s>hello</s>"


def test_inactive_tail_ranks_excluded(tmp_path):
    # default_vocab_size cuts the trained vocab: tail ranks must not be used
    merges = [b"he"]
    path = _tekken_file(tmp_path, merges, extra_vocab=4)
    raw = json.loads(open(path).read())
    raw["config"]["default_vocab_size"] = 8 + 256 + 1  # keep only "he"
    open(path, "w").write(json.dumps(raw))
    t = Tekkenizer.from_file(path)
    assert t.vocab_size == 8 + 257
    ids = t.encode("\xff\xff")
    assert all(i < t.vocab_size for i in ids)


def test_v3_file_without_special_tokens_field(tmp_path):
    merges = [b"ab"]
    path = _tekken_file(tmp_path, merges)
    raw = json.loads(open(path).read())
    del raw["special_tokens"]
    raw["config"]["default_num_special_tokens"] = 1000
    raw["config"]["default_vocab_size"] = 1000 + 257
    open(path, "w").write(json.dumps(raw))
    t = Tekkenizer.from_file(path)
    assert t.num_special_tokens == 1000
    assert t.token_to_id("<s>") == 1 and t.token_to_id("[INST]") == 3
    assert t.encode("ab") == [1000 + 256]


def test_voice_embedding_pt_roundtrip(tmp_path):
    """load_voice_embedding reads a torch-saved bf16 [N, 3072] tensor's raw
    buffer (reference model.rs:266-312)."""
    torch = pytest.importorskip("torch")
    from crane_tpu.models.voxtral_tts import load_voice_embedding

    x = torch.randn(5, 3072, dtype=torch.float32).to(torch.bfloat16)
    p = tmp_path / "alice.pt"
    torch.save(x, str(p))
    got = load_voice_embedding(str(p))
    assert got.shape == (5, 3072)
    np.testing.assert_allclose(got, x.float().numpy(), rtol=0, atol=0)


def test_params_json_parsing():
    from crane_tpu.models.voxtral_tts import config_from_params_json

    raw = {
        "dim": 128, "n_layers": 2, "head_dim": 32, "hidden_dim": 256,
        "n_heads": 4, "n_kv_heads": 2, "rope_theta": 10000.0,
        "norm_eps": 1e-5, "vocab_size": 512, "max_seq_len": 4096,
        "tied_embeddings": True,
        "multimodal": {
            "bos_token_id": 1,
            "audio_model_args": {
                "semantic_codebook_size": 64, "acoustic_codebook_size": 5,
                "n_acoustic_codebook": 4, "audio_token_id": 24,
                "begin_audio_token_id": 25,
                "acoustic_transformer_args": {
                    "dim": 128, "n_layers": 1, "head_dim": 32,
                    "hidden_dim": 256, "n_heads": 4, "n_kv_heads": 4,
                },
            },
            "audio_tokenizer_args": {
                "sampling_rate": 24000, "pretransform_patch_size": 240,
                "semantic_codebook_size": 64, "semantic_dim": 16,
                "acoustic_codebook_size": 5, "acoustic_dim": 4,
                "dim": 64, "hidden_dim": 128, "head_dim": 16,
                "n_heads": 4, "n_kv_heads": 4, "qk_norm_eps": 1e-6,
                "norm_eps": 0.01, "layer_scale_init": 0.01,
                "decoder_transformer_lengths_str": "2,2",
                "decoder_convs_kernels_str": "3,4",
                "decoder_convs_strides_str": "1,2",
                "voice": {"alice": 0},
            },
        },
    }
    cfg = config_from_params_json(raw)
    assert cfg.dim == 128 and cfg.n_layers == 2
    assert cfg.semantic_codebook_size == 64 and cfg.n_acoustic == 4
    assert cfg.fsq_levels == 5
    assert cfg.codec.conv_strides == (1, 2)
    assert cfg.acoustic.n_layers == 1
