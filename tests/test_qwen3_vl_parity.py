"""Qwen3-VL parity vs HF: preprocessing bit-match, vision tower, full
image-chat generation with DeepStack + MRoPE (reference qwen3_5/{vision,
processor,vlm}.rs — SURVEY.md §3.5 call stack)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from crane_tpu.models.image_processing import patchify, preprocess_image, smart_resize
from crane_tpu.models.qwen3_vl import load_qwen3_vl

IMG_TOKEN = 151655


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    torch.manual_seed(0)
    cfg = transformers.Qwen3VLConfig(
        text_config=dict(
            vocab_size=151700, hidden_size=64, intermediate_size=96,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, max_position_embeddings=512, rope_theta=10000.0,
            rope_scaling={"rope_type": "default", "mrope_section": [2, 3, 3], "mrope_interleaved": True},
            tie_word_embeddings=False,
        ),
        vision_config=dict(
            depth=3, hidden_size=32, intermediate_size=64, num_heads=4,
            patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
            out_hidden_size=64, num_position_embeddings=16,
            deepstack_visual_indexes=[0, 1],
        ),
        image_token_id=IMG_TOKEN, video_token_id=151656,
        vision_start_token_id=151652,
    )
    model = transformers.Qwen3VLForConditionalGeneration(cfg).eval().to(torch.float32)
    d = str(tmp_path_factory.mktemp("vl") / "m")
    model.save_pretrained(d, safe_serialization=True)
    return model, d


def _positional_image(h=24, w=32):
    """Positionally-encoded image: scrambling it changes every patch
    (reference processor.rs:249-316 test trick)."""
    y = np.arange(h)[:, None, None]
    x = np.arange(w)[None, :, None]
    c = np.arange(3)[None, None, :]
    return ((y * 7 + x * 13 + c * 29) % 256).astype(np.uint8)


def test_smart_resize_rounds_to_nearest():
    # 30 -> 28 (nearest), not 56 (ceil); reference hard-part #3
    assert smart_resize(30, 30, factor=28, min_pixels=1, max_pixels=10**9) == (28, 28)
    assert smart_resize(43, 43, factor=28, min_pixels=1, max_pixels=10**9) == (56, 56)


def test_preprocess_bit_matches_hf():
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import Qwen2VLImageProcessor

    img = _positional_image(40, 52)
    proc = Qwen2VLImageProcessor(
        patch_size=4, merge_size=2, temporal_patch_size=2,
    )
    out = proc(images=[img], min_pixels=16, max_pixels=4096, return_tensors="np")
    ref_patches = out["pixel_values"]
    ref_grid = tuple(out["image_grid_thw"][0].tolist())

    mine, grid = preprocess_image(
        img, patch_size=4, merge_size=2, temporal_patch_size=2,
        min_pixels=16, max_pixels=4096,
    )
    assert grid == ref_grid
    np.testing.assert_allclose(mine, ref_patches, atol=2e-6)


def test_vision_tower_matches_hf(tiny):
    model, d = tiny
    vlm = load_qwen3_vl(d, dtype=jnp.float32)
    img = _positional_image(16, 24)
    patches, grid = preprocess_image(
        img, patch_size=4, merge_size=2, temporal_patch_size=2,
        min_pixels=16, max_pixels=10**8,
    )
    feats, deep = vlm.encode_images(patches, grid)
    with torch.no_grad():
        ref, ref_deep = model.model.visual(
            torch.from_numpy(patches).float(),
            torch.tensor([list(grid)], dtype=torch.long),
        )
    np.testing.assert_allclose(np.asarray(feats), ref.numpy(), rtol=2e-3, atol=2e-3)
    for j in range(len(ref_deep)):
        np.testing.assert_allclose(
            np.asarray(deep[j]), ref_deep[j].numpy(), rtol=2e-3, atol=2e-3
        )


def test_rope_index_matches_hf(tiny):
    model, d = tiny
    vlm = load_qwen3_vl(d, dtype=jnp.float32)
    grid = (1, 4, 6)
    n_img = (grid[1] // 2) * (grid[2] // 2)
    ids = [5, 6, 151652] + [IMG_TOKEN] * n_img + [7, 8, 9]
    pos, delta = vlm.get_rope_index(np.asarray(ids), [grid])
    ref_pos, ref_delta = model.model.get_rope_index(
        torch.tensor([ids]), image_grid_thw=torch.tensor([list(grid)])
    )
    np.testing.assert_array_equal(pos, ref_pos[:, 0].numpy())
    assert delta == int(ref_delta[0])


def test_image_chat_generation_matches_hf(tiny):
    model, d = tiny
    vlm = load_qwen3_vl(d, dtype=jnp.float32)
    img = _positional_image(16, 24)
    patches, grid = preprocess_image(
        img, patch_size=4, merge_size=2, temporal_patch_size=2,
        min_pixels=16, max_pixels=10**8,
    )
    n_img = (grid[1] // 2) * (grid[2] // 2)
    ids = [5, 6, 151652] + [IMG_TOKEN] * n_img + [7, 8, 9]

    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.from_numpy(patches).float(),
            image_grid_thw=torch.tensor([list(grid)]),
            max_new_tokens=8, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )[0, len(ids):].tolist()

    got = vlm.generate(ids, images=[(patches, grid)])
    from crane_tpu.generation.config import GenerationConfig

    got = vlm.generate(ids, images=[(patches, grid)], gen=GenerationConfig.greedy(8))
    assert got == ref


def test_text_only_generation(tiny):
    """No image: behaves as a plain causal LM (positions 3-equal)."""
    model, d = tiny
    vlm = load_qwen3_vl(d, dtype=jnp.float32)
    ids = [5, 6, 7, 8, 9]
    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.tensor([ids]), max_new_tokens=6, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )[0, len(ids):].tolist()
    from crane_tpu.generation.config import GenerationConfig

    got = vlm.generate(ids, gen=GenerationConfig.greedy(6))
    assert got == ref


VID_TOKEN = 151656
VSTART = 151652


def test_video_chat_generation_matches_hf(tiny):
    """Video spans: per-frame t=1 rope spans with timestamp text between
    frames (HF Qwen3VL splits video_grid_thw by t)."""
    model, d = tiny
    vlm = load_qwen3_vl(d, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    t, h, w = 2, 4, 4  # 2 temporal patches, 4x4 spatial -> 4 merged tokens/frame
    pdim = 3 * 2 * 4 * 4
    patches = rng.standard_normal((t * h * w, pdim)).astype(np.float32) * 0.5
    per_frame = (h // 2) * (w // 2)
    # timestamp-separated frame spans, as the HF video processor renders them
    ids = ([5, 6]
           + [11, VSTART] + [VID_TOKEN] * per_frame
           + [12, VSTART] + [VID_TOKEN] * per_frame
           + [7, 8, 9])

    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.tensor([ids]),
            pixel_values_videos=torch.from_numpy(patches).float(),
            video_grid_thw=torch.tensor([[t, h, w]]),
            max_new_tokens=8, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )[0, len(ids):].tolist()

    from crane_tpu.generation.config import GenerationConfig

    got = vlm.generate(ids, videos=[(patches, (t, h, w))],
                       gen=GenerationConfig.greedy(8))
    assert got == ref


def test_mixed_image_and_video_matches_hf(tiny):
    """Image + video in one prompt: joint DeepStack merge in position order."""
    model, d = tiny
    vlm = load_qwen3_vl(d, dtype=jnp.float32)
    rng = np.random.default_rng(1)

    img = _positional_image(16, 24)
    ipatches, igrid = preprocess_image(
        img, patch_size=4, merge_size=2, temporal_patch_size=2,
        min_pixels=16, max_pixels=10**8,
    )
    n_img = (igrid[1] // 2) * (igrid[2] // 2)

    t, h, w = 2, 4, 4
    vpatches = rng.standard_normal((t * h * w, 3 * 2 * 4 * 4)).astype(np.float32) * 0.5
    per_frame = (h // 2) * (w // 2)

    ids = ([5, VSTART] + [VID_TOKEN] * per_frame
           + [13, VSTART] + [VID_TOKEN] * per_frame
           + [6, VSTART] + [IMG_TOKEN] * n_img
           + [7, 9])

    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.from_numpy(ipatches).float(),
            image_grid_thw=torch.tensor([list(igrid)]),
            pixel_values_videos=torch.from_numpy(vpatches).float(),
            video_grid_thw=torch.tensor([[t, h, w]]),
            max_new_tokens=8, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )[0, len(ids):].tolist()

    from crane_tpu.generation.config import GenerationConfig

    got = vlm.generate(
        ids, images=[(ipatches, igrid)], videos=[(vpatches, (t, h, w))],
        gen=GenerationConfig.greedy(8),
    )
    assert got == ref
