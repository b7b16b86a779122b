"""Gemma3 VLM parity vs HF (reference gemma4/{vision,vlm}.rs family)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from crane_tpu.generation.config import GenerationConfig
from crane_tpu.models.gemma3_vl import load_gemma3_vl

IMG_TOKEN = 150


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    torch.manual_seed(0)
    cfg = transformers.Gemma3Config(
        text_config=dict(
            model_type="gemma3_text", vocab_size=160, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16, max_position_embeddings=512,
            rope_theta=1_000_000.0, rope_local_base_freq=10_000.0,
            sliding_window=16, query_pre_attn_scalar=16,
            layer_types=["sliding_attention", "full_attention"],
            tie_word_embeddings=True,
        ),
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64, image_size=32, patch_size=4,
            vision_use_head=False,
        ),
        image_token_id=IMG_TOKEN, mm_tokens_per_image=4,
        boi_token_id=151, eoi_token_id=152,
    )
    model = transformers.Gemma3ForConditionalGeneration(cfg).eval().to(torch.float32)
    d = str(tmp_path_factory.mktemp("g3vl") / "m")
    model.save_pretrained(d, safe_serialization=True)
    return model, d


def _pixels():
    rng = np.random.default_rng(0)
    return rng.standard_normal((1, 3, 32, 32)).astype(np.float32) * 0.5


def test_vision_features_match_hf(tiny):
    model, d = tiny
    mine = load_gemma3_vl(d, dtype=jnp.float32)
    px = _pixels()
    with torch.no_grad():
        ref = model.model.get_image_features(torch.from_numpy(px)).numpy()
    got = np.asarray(mine.encode_images(px))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_image_chat_generation_matches_hf(tiny):
    model, d = tiny
    mine = load_gemma3_vl(d, dtype=jnp.float32)
    px = _pixels()
    ids = [2, 5, 151] + [IMG_TOKEN] * 4 + [152, 9, 3]
    token_type_ids = torch.tensor([[1 if t == IMG_TOKEN else 0 for t in ids]])
    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.from_numpy(px),
            token_type_ids=token_type_ids,
            max_new_tokens=8, do_sample=False, eos_token_id=None, pad_token_id=0,
        )[0, len(ids):].tolist()
    got = mine.generate(ids, pixels=px, gen=GenerationConfig.greedy(8))
    assert got == ref


def test_text_only_matches_hf(tiny):
    model, d = tiny
    mine = load_gemma3_vl(d, dtype=jnp.float32)
    ids = [2, 5, 9, 3, 7]
    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.tensor([ids]), max_new_tokens=6, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )[0, len(ids):].tolist()
    got = mine.generate(ids, gen=GenerationConfig.greedy(6))
    assert got == ref
