"""Hub-id fallback for checkpoint paths (reference autotokenizer.rs:232-258:
the tokenizer loader downloads from the HF hub when the path isn't local).

The fetch itself is mocked — the offline round trip through
``resolve_checkpoint`` -> ``snapshot_download`` -> ``from_pretrained`` is
what these tests pin; tests/test_real_checkpoint.py covers the real-network
tier.
"""

import json
import os

import pytest

from crane_tpu.utils.hub import looks_like_hub_id, resolve_checkpoint


def test_local_paths_pass_through(tmp_path):
    d = tmp_path / "ckpt"
    d.mkdir()
    assert resolve_checkpoint(str(d)) == str(d)
    f = tmp_path / "model.gguf"
    f.write_bytes(b"GGUF")
    assert resolve_checkpoint(str(f)) == str(f)


def test_hub_id_grammar():
    assert looks_like_hub_id("Qwen/Qwen3-0.6B")
    assert looks_like_hub_id("gpt2")
    assert not looks_like_hub_id("/abs/path")
    assert not looks_like_hub_id("./rel/path")
    assert not looks_like_hub_id("~/home/path")
    assert not looks_like_hub_id("a/b/c")
    assert not looks_like_hub_id("org/name?x=1")


def test_nonexistent_non_id_raises():
    with pytest.raises(FileNotFoundError, match="not a local path"):
        resolve_checkpoint("definitely/missing/dir/levels")


def test_hub_id_resolves_via_snapshot_download(tmp_path, monkeypatch):
    calls = {}

    def fake_snapshot_download(repo_id, allow_patterns):
        calls["repo_id"] = repo_id
        calls["allow_patterns"] = allow_patterns
        return str(tmp_path)

    import huggingface_hub

    monkeypatch.setattr(huggingface_hub, "snapshot_download",
                        fake_snapshot_download)
    out = resolve_checkpoint("acme/tiny-model")
    assert out == str(tmp_path)
    assert calls["repo_id"] == "acme/tiny-model"
    # torch .bin pickles are deliberately not fetched
    assert not any("bin" in p for p in calls["allow_patterns"])
    assert "*.safetensors" in calls["allow_patterns"]


def test_autotokenizer_from_pretrained_accepts_hub_id(tmp_path, monkeypatch):
    from tests.fixtures import make_tiny_tokenizer

    make_tiny_tokenizer(str(tmp_path))
    import huggingface_hub

    monkeypatch.setattr(huggingface_hub, "snapshot_download",
                        lambda repo_id, allow_patterns: str(tmp_path))
    from crane_tpu.tokenizer.autotokenizer import AutoTokenizer

    tok = AutoTokenizer.from_pretrained("acme/tiny-tok")
    ids = tok.encode("hello world")
    assert ids, ids


def test_from_pretrained_accepts_hub_id(tmp_path, monkeypatch):
    from tests.fixtures import make_tiny_qwen3_checkpoint

    make_tiny_qwen3_checkpoint(str(tmp_path))
    import huggingface_hub

    monkeypatch.setattr(huggingface_hub, "snapshot_download",
                        lambda repo_id, allow_patterns: str(tmp_path))
    from crane_tpu.generation.config import GenerationConfig
    from crane_tpu.models.auto import from_pretrained

    lm = from_pretrained("acme/tiny-lm")
    out = lm.generate([3, 4, 5], GenerationConfig.greedy(4))
    assert len(out) == 4
