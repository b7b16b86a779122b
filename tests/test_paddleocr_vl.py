"""PaddleOCR-VL NaViT tower + end-to-end image->text OCR pipeline.

The tower has no in-image numeric oracle (the reference delegates to candle's
paddleocr_vl; transformers has no PaddleOCR-VL); these tests pin the
reference-specified parts exactly (smart resize math, prompt construction,
patch layout) and the tower by structural invariants, then drive the full
image->text path through the HF-parity-tested Ernie backbone.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crane_tpu.models.paddleocr_vl import (
    FACTOR,
    MAX_PIXELS,
    MIN_PIXELS,
    navit_forward,
    navit_pos_taps,
    navit_rope_tables,
    preprocess_image,
    smart_resize,
)
from crane_tpu.models.modules.vision import VisionConfig

RNG = np.random.default_rng(0)


class TestSmartResize:
    def test_multiples_of_factor(self):
        for h, w in [(1080, 1920), (333, 517), (28, 28), (10, 800)]:
            rh, rw = smart_resize(h, w)
            assert rh % FACTOR == 0 and rw % FACTOR == 0
            assert MIN_PIXELS <= rh * rw <= MAX_PIXELS + FACTOR * FACTOR

    def test_round_half_up_within_range(self):
        # 1092 x 1400 = 1528800 px > max -> sqrt downscale path
        rh, rw = smart_resize(1092, 1400)
        assert rh * rw <= MAX_PIXELS
        # a mid-range image that rounds to the nearest factor multiple
        rh, rw = smart_resize(700, 700)
        assert rh == ((700 + 14) // 28) * 28 or rh % 28 == 0

    def test_upscale_small(self):
        # the reference computes the upscale factor from the ROUNDED pixel
        # count but applies it to the original size, so the result can land
        # slightly below min_pixels (image_utils.rs:160-165) — match exactly
        rh, rw = smart_resize(100, 100)
        assert (rh, rw) == (364, 364)
        assert rh * rw >= MIN_PIXELS * 0.85

    def test_aspect_guard(self):
        with pytest.raises(ValueError):
            smart_resize(28, 28 * 250)


def _tiny_vcfg():
    return VisionConfig(
        depth=2, hidden_size=32, intermediate_size=48, num_heads=4,
        patch_size=14, temporal_patch_size=1, spatial_merge_size=2,
        out_hidden_size=24, eps=1e-6, act="gelu_tanh",
    )


def _tower_params(cfg: VisionConfig, llm_dim: int, side: int = 6):
    r = lambda *s: jnp.asarray(RNG.normal(size=s).astype(np.float32) * 0.05)
    layers = []
    for _ in range(cfg.depth):
        layers.append({
            "qkv_w": r(cfg.hidden_size, 3 * cfg.hidden_size),
            "qkv_b": r(3 * cfg.hidden_size),
            "proj_w": r(cfg.hidden_size, cfg.hidden_size),
            "proj_b": r(cfg.hidden_size),
            "ln1_w": jnp.ones(cfg.hidden_size), "ln1_b": jnp.zeros(cfg.hidden_size),
            "ln2_w": jnp.ones(cfg.hidden_size), "ln2_b": jnp.zeros(cfg.hidden_size),
            "fc1_w": r(cfg.hidden_size, cfg.intermediate_size),
            "fc1_b": r(cfg.intermediate_size),
            "fc2_w": r(cfg.intermediate_size, cfg.hidden_size),
            "fc2_b": r(cfg.hidden_size),
        })
    mu = cfg.spatial_merge_size ** 2
    return {
        "embed_w": r(3 * 14 * 14, cfg.hidden_size),
        "embed_b": r(cfg.hidden_size),
        "pos_embed": r(side * side, cfg.hidden_size),
        "layers": layers,
        "post_ln_w": jnp.ones(cfg.hidden_size), "post_ln_b": jnp.zeros(cfg.hidden_size),
        "proj_ln_w": jnp.ones(mu * cfg.hidden_size), "proj_ln_b": jnp.zeros(mu * cfg.hidden_size),
        "proj_fc1_w": r(mu * cfg.hidden_size, 64), "proj_fc1_b": r(64),
        "proj_fc2_w": r(64, llm_dim), "proj_fc2_b": r(llm_dim),
    }


def _run_tower(cfg, p, patches, grid):
    idx, wgt = navit_pos_taps(int(round(np.asarray(p["pos_embed"]).shape[0] ** 0.5)), grid)
    cos, sin = navit_rope_tables(cfg, grid)
    return np.asarray(navit_forward(
        cfg, p, jnp.asarray(patches), jnp.asarray(idx), jnp.asarray(wgt),
        (jnp.asarray(cos), jnp.asarray(sin)), (grid[1], grid[2]),
    ))


class TestNaViT:
    def test_token_count_and_shape(self):
        cfg = _tiny_vcfg()
        p = _tower_params(cfg, llm_dim=16)
        h, w = 6, 8
        patches = RNG.normal(size=(h * w, 3 * 14 * 14)).astype(np.float32)
        out = _run_tower(cfg, p, patches, (1, h, w))
        assert out.shape == ((h // 2) * (w // 2), 16)

    def test_merge_is_spatial_not_raster(self):
        """Positional-encoding trick (reference test style,
        qwen3_5/processor.rs:249-316): merged token (r, c) must depend
        exactly on the 2x2 patch block at rows 2r..2r+1, cols 2c..2c+1."""
        cfg = _tiny_vcfg()
        p = _tower_params(cfg, llm_dim=16)
        h, w = 4, 6
        patches = RNG.normal(size=(h * w, 3 * 14 * 14)).astype(np.float32)
        base = _run_tower(cfg, p, patches, (1, h, w))
        # perturb patch (row 2, col 5) -> merged token (1, 2) = index 1*3+2
        pert = patches.copy()
        pert[2 * w + 5] += 1.0
        out = _run_tower(cfg, p, pert, (1, h, w))
        diff = np.abs(out - base).max(axis=1)
        # attention mixes all tokens, but the merged token owning the patch
        # must change the most (it gets the direct residual path)
        assert diff.argmax() == 1 * (w // 2) + 2

    def test_rope_tables_encode_2d(self):
        cfg = _tiny_vcfg()
        cos, sin = navit_rope_tables(cfg, (1, 3, 4))
        assert cos.shape == (12, cfg.head_dim)
        # same column, different row -> first half differs, second half equal
        d4 = cfg.head_dim // 4
        np.testing.assert_allclose(cos[0][d4:2 * d4], cos[4][d4:2 * d4])  # col part
        assert np.abs(cos[0][:d4] - cos[4][:d4]).max() > 1e-6  # row part

    def test_preprocess_patch_math(self):
        img = RNG.integers(0, 255, size=(300, 500, 3), dtype=np.uint8)
        patches, (t, h, w) = preprocess_image(img)
        rh, rw = smart_resize(300, 500)
        assert (t, h, w) == (1, rh // 14, rw // 14)
        assert patches.shape == (h * w, 3 * 14 * 14)
        assert patches.min() >= 0.0 and patches.max() <= 1.0  # /255, no mean/std


def _tiny_ocr_checkpoint(tmp_path):
    import safetensors.numpy as st

    from tests.fixtures import make_tiny_tokenizer

    make_tiny_tokenizer(
        str(tmp_path),
        extra_tokens=["<|begin_of_sentence|>", "</s>", "<|image_start|>",
                      "<|image_end|>", "<|IMAGE_PLACEHOLDER|>"],
    )
    import tokenizers

    tok = tokenizers.Tokenizer.from_file(str(tmp_path / "tokenizer.json"))
    V = tok.get_vocab_size()
    E = 24
    sd = {}
    r = lambda *s: (RNG.normal(size=s) * 0.05).astype(np.float32)
    # ernie backbone (interleaved rope, no qk norm)
    sd["model.embed_tokens.weight"] = r(V, E)
    sd["model.norm.weight"] = np.ones(E, np.float32)
    sd["lm_head.weight"] = r(V, E)
    for i in range(2):
        L = f"model.layers.{i}."
        sd |= {
            L + "input_layernorm.weight": np.ones(E, np.float32),
            L + "post_attention_layernorm.weight": np.ones(E, np.float32),
            L + "self_attn.q_proj.weight": r(32, E),
            L + "self_attn.k_proj.weight": r(16, E),
            L + "self_attn.v_proj.weight": r(16, E),
            L + "self_attn.o_proj.weight": r(E, 32),
            L + "mlp.gate_proj.weight": r(48, E),
            L + "mlp.up_proj.weight": r(48, E),
            L + "mlp.down_proj.weight": r(E, 48),
        }
    # NaViT tower
    vcfg = _tiny_vcfg()
    for i in range(vcfg.depth):
        L = f"visual.vision_model.encoder.layers.{i}."
        sd |= {
            L + "self_attn.q_proj.weight": r(32, 32), L + "self_attn.q_proj.bias": r(32),
            L + "self_attn.k_proj.weight": r(32, 32), L + "self_attn.k_proj.bias": r(32),
            L + "self_attn.v_proj.weight": r(32, 32), L + "self_attn.v_proj.bias": r(32),
            L + "self_attn.out_proj.weight": r(32, 32), L + "self_attn.out_proj.bias": r(32),
            L + "layer_norm1.weight": np.ones(32, np.float32), L + "layer_norm1.bias": np.zeros(32, np.float32),
            L + "layer_norm2.weight": np.ones(32, np.float32), L + "layer_norm2.bias": np.zeros(32, np.float32),
            L + "mlp.fc1.weight": r(48, 32), L + "mlp.fc1.bias": r(48),
            L + "mlp.fc2.weight": r(32, 48), L + "mlp.fc2.bias": r(32),
        }
    sd["visual.vision_model.embeddings.patch_embedding.weight"] = r(32, 3, 14, 14)
    sd["visual.vision_model.embeddings.patch_embedding.bias"] = r(32)
    sd["visual.vision_model.embeddings.position_embedding.weight"] = r(36, 32)
    sd["visual.vision_model.post_layernorm.weight"] = np.ones(32, np.float32)
    sd["visual.vision_model.post_layernorm.bias"] = np.zeros(32, np.float32)
    sd["mlp_AR.0.weight"] = r(64, 4 * 32)
    sd["mlp_AR.0.bias"] = r(64)
    sd["mlp_AR.2.weight"] = r(E, 64)
    sd["mlp_AR.2.bias"] = r(E)
    st.save_file(sd, str(tmp_path / "model.safetensors"))

    cfg = {
        "model_type": "paddleocr_vl",
        "image_token_id": tok.token_to_id("<|IMAGE_PLACEHOLDER|>"),
        "eos_token_id": tok.token_to_id("</s>"),
        "vision_config": {
            "num_hidden_layers": vcfg.depth, "hidden_size": 32,
            "intermediate_size": 48, "num_attention_heads": 4,
            "patch_size": 14, "spatial_merge_size": 2,
            "hidden_act": "gelu_pytorch_tanh",
        },
        "text_config": {
            "model_type": "ernie4_5", "vocab_size": V, "hidden_size": E,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "num_key_value_heads": 2, "head_dim": 8, "intermediate_size": 48,
            "rms_norm_eps": 1e-5, "rope_theta": 500000.0,
            "max_position_embeddings": 4096, "tie_word_embeddings": False,
        },
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg))
    return tmp_path


def test_e2e_image_to_text(tmp_path):
    """Full OCR pipeline from a real released-layout checkpoint: image ->
    smart resize -> NaViT -> splice over <|IMAGE_PLACEHOLDER|> -> Ernie
    greedy decode -> text."""
    from crane_tpu.models.paddleocr_vl import load_paddleocr_vl

    d = _tiny_ocr_checkpoint(tmp_path)
    model = load_paddleocr_vl(str(d))
    img = RNG.integers(0, 255, size=(290, 400, 3), dtype=np.uint8)
    text = model.recognize(img, task="ocr", max_new_tokens=6)
    assert isinstance(text, str)
    # the image content must actually reach the logits
    t2 = model.recognize(255 - img, task="ocr", max_new_tokens=6)
    assert isinstance(t2, str)
    # prompt layout: bos + User: + image_start + pads + image_end + task + assistant
    feats, n = model.encode_image(img)
    ids = model.build_prompt_ids(n, "ocr")
    assert ids.count(model.image_token_id) == n
    assert ids[0] == model.lm.tokenizer.token_to_id("<|begin_of_sentence|>")


def test_factory_routes_paddleocr(tmp_path):
    from crane_tpu.models.factory import load_model
    from crane_tpu.models.paddleocr_vl import PaddleOcrVL

    d = _tiny_ocr_checkpoint(tmp_path)
    m = load_model(str(d))
    assert isinstance(m, PaddleOcrVL)


def test_recognize_stream_yields_incrementally(tmp_path):
    """recognize_stream must be a real token-by-token generator whose
    concatenation equals recognize() (it used to import a non-existent
    class and yield one blob)."""
    from crane_tpu.models.paddleocr_vl import load_paddleocr_vl
    from crane_tpu.sdk.vision import OcrClient

    d = _tiny_ocr_checkpoint(tmp_path)
    model = load_paddleocr_vl(str(d))
    img = RNG.integers(0, 255, size=(290, 400, 3), dtype=np.uint8)
    pieces = list(model.recognize_stream(img, task="ocr", max_new_tokens=6))
    assert all(isinstance(p, str) for p in pieces)
    assert "".join(pieces).strip() == model.recognize(img, task="ocr", max_new_tokens=6)
    # and through the SDK client front (used to crash on missing attrs)
    client = OcrClient(model, max_new_tokens=6)
    assert "".join(client.recognize_stream(img)).strip() == client.recognize(img)


def test_vision_client_analyze(tmp_path):
    """Freeform VisionClient over the same backend: the question reaches the
    prompt (different questions -> different prompt ids)."""
    from crane_tpu.models.paddleocr_vl import load_paddleocr_vl
    from crane_tpu.sdk.vision import VisionClient

    d = _tiny_ocr_checkpoint(tmp_path)
    client = VisionClient(load_paddleocr_vl(str(d)), max_new_tokens=4)
    img = RNG.integers(0, 255, size=(290, 400, 3), dtype=np.uint8)
    out = client.analyze(img, "What color is the square?")
    assert isinstance(out, str)
    assert client.analyze_image(img) == client.analyze(img)
