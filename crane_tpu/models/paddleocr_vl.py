"""PaddleOCR-VL: NaViT dynamic-resolution vision tower + Ernie-4.5 decoder.

Reference behavior (/root/reference/crane-core/src/models/paddleocr_vl/
model.rs + utils/image_utils.rs:74-190):
- preprocessing: RGB / 255 (no mean/std norm), bilinear resize to the
  smart-resize shape (factor = patch*merge = 28, min 147384 px, max
  1473600 px, round-half-up to the factor, sqrt rescale when out of range,
  aspect guard 200:1) -> grid_thw = (1, H/14, W/14)
- prompt: ``<|begin_of_sentence|>User: <|image_start|>`` + image pads
  (``(h/merge)*(w/merge)`` of them) + ``<|image_end|>`` + task prompt +
  ``\\nAssistant: `` (model.rs:363-413), tasks OCR/Table/Formula/Chart
  (:26-42), greedy decode to ``</s>``.
- tower: SigLIP-so400m-shaped NaViT (per the public PaddleOCR-VL checkpoint;
  the reference delegates to candle's paddleocr_vl): 14x14 patch conv,
  bilinear-interpolated learned position embeddings over the native grid,
  pre-LN bidirectional blocks with QKV bias + 2-D rotary, post_layernorm,
  then a 2x2 spatial-merge projector (LN -> fc1 GELU fc2) into the Ernie
  hidden size. No public HF-transformers implementation exists in this
  image, so the tower is validated by structural invariants + the e2e
  pipeline rather than a logit oracle (the Ernie backbone itself is
  HF-parity-tested in tests/test_ernie_parity.py).

TPU-native: everything per image-grid shape jits into one XLA program; the
patch conv is a single matmul; host code precomputes only index/weight
arrays (reusing modules/vision.py, raster patch order instead of Qwen's
merge-block-major).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from crane_tpu.models.modules.vision import layer_norm, vision_block, VisionConfig

FACTOR = 28  # patch 14 * spatial merge 2
MIN_PIXELS = 147_384
MAX_PIXELS = 1_473_600

TASK_PROMPTS = {
    "ocr": "OCR:",
    "table": "Table Recognition:",
    "formula": "Formula Recognition:",
    "chart": "Chart Recognition:",
}


def smart_resize(h: int, w: int, factor: int = FACTOR,
                 min_pixels: int = MIN_PIXELS, max_pixels: int = MAX_PIXELS) -> tuple[int, int]:
    """Exact port of the reference smart_resize (image_utils.rs:131-177)."""
    height, width = h, w
    if height < factor:
        width = width * factor // max(height, 1)
        height = factor
    if width < factor:
        height = height * factor // max(width, 1)
        width = factor
    h_bar = ((height + factor // 2) // factor) * factor
    w_bar = ((width + factor // 2) // factor) * factor
    pixels = h_bar * w_bar
    if pixels > max_pixels:
        scale = (pixels / max_pixels) ** 0.5
        h_bar = max(int(height / scale / factor), 1) * factor
        w_bar = max(int(width / scale / factor), 1) * factor
    elif pixels < min_pixels:
        scale = (min_pixels / pixels) ** 0.5
        h_bar = int(np.ceil(height * scale / factor)) * factor
        w_bar = int(np.ceil(width * scale / factor)) * factor
    if max(h_bar / w_bar, w_bar / h_bar) > 200.0:
        raise ValueError("Aspect ratio too extreme after resize")
    return h_bar, w_bar


def preprocess_image(image: np.ndarray) -> tuple[np.ndarray, tuple[int, int, int]]:
    """HWC uint8/float RGB -> (raster patches ``[h*w, 3*14*14]``, grid (1,h,w)).
    Reference: /255 then bilinear resize (image_utils.rs:104-118)."""
    img = np.asarray(image)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    H, W = img.shape[:2]
    rh, rw = smart_resize(H, W)
    x = jax.image.resize(jnp.asarray(img), (rh, rw, 3), method="bilinear")
    x = np.asarray(x).transpose(2, 0, 1)  # [3, H, W]
    h, w = rh // 14, rw // 14
    # conv(k=14, s=14) == matmul over patches flattened in (C, ph, pw) order
    patches = (
        x.reshape(3, h, 14, w, 14).transpose(1, 3, 0, 2, 4).reshape(h * w, 3 * 14 * 14)
    )
    return patches.astype(np.float32), (1, h, w)


def navit_rope_tables(cfg: VisionConfig, grid: tuple[int, int, int]) -> tuple[np.ndarray, np.ndarray]:
    """2-D rope over RASTER patch order: half the rotary dims carry the row
    index, half the column (Qwen2-VL-style duplicated half tables)."""
    _, h, w = grid
    dim = cfg.head_dim // 2
    inv = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    rows = np.repeat(np.arange(h), w)
    cols = np.tile(np.arange(w), h)
    pos = np.stack([rows, cols], axis=1)  # [S, 2]
    freqs = pos[:, :, None].astype(np.float64) * inv[None, None, :]
    half = freqs.reshape(pos.shape[0], -1)
    emb = np.concatenate([half, half], axis=-1)
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def navit_pos_taps(side: int, grid: tuple[int, int, int]) -> tuple[np.ndarray, np.ndarray]:
    """Bilinear interpolation taps of the ``side x side`` learned PE onto the
    native ``h x w`` grid, raster order: (idx [4, S], weight [4, S])."""
    _, h, w = grid
    h_idx = np.linspace(0, side - 1, h)
    w_idx = np.linspace(0, side - 1, w)
    hf, wf = h_idx.astype(np.int64), w_idx.astype(np.int64)
    hc = np.clip(hf + 1, None, side - 1)
    wc = np.clip(wf + 1, None, side - 1)
    dh, dw = h_idx - hf, w_idx - wf
    idx = np.stack([
        (hf[:, None] * side + wf[None, :]).ravel(),
        (hf[:, None] * side + wc[None, :]).ravel(),
        (hc[:, None] * side + wf[None, :]).ravel(),
        (hc[:, None] * side + wc[None, :]).ravel(),
    ])
    wgt = np.stack([
        ((1 - dh)[:, None] * (1 - dw)[None, :]).ravel(),
        ((1 - dh)[:, None] * dw[None, :]).ravel(),
        (dh[:, None] * (1 - dw)[None, :]).ravel(),
        (dh[:, None] * dw[None, :]).ravel(),
    ])
    return idx.astype(np.int32), wgt.astype(np.float32)


@functools.partial(jax.jit, static_argnums=(0, 6))
def navit_forward(
    cfg: VisionConfig,
    p: dict,
    patches: jax.Array,   # [S, 3*14*14] raster order
    pos_idx: jax.Array,   # [4, S]
    pos_wgt: jax.Array,   # [4, S]
    rope: tuple,          # (cos [S, head_dim], sin)
    grid_hw: tuple,       # static (h, w)
) -> jax.Array:
    """Tower + projector: raster patches -> ``[h/2*w/2, llm_hidden]``."""
    h, w = grid_hw
    x = patches.astype(p["embed_w"].dtype) @ p["embed_w"] + p["embed_b"]
    pe = jnp.einsum("ksd,ks->sd", p["pos_embed"][pos_idx], pos_wgt)
    x = x + pe.astype(x.dtype)
    cos, sin = rope
    for layer in p["layers"]:
        x = vision_block(cfg, layer, x, cos, sin)
    x = layer_norm(x, p["post_ln_w"], p["post_ln_b"], cfg.eps)
    # 2x2 spatial merge from raster order, then LN -> fc1 GELU fc2
    m = cfg.spatial_merge_size
    C = x.shape[-1]
    x = x.reshape(h // m, m, w // m, m, C).transpose(0, 2, 1, 3, 4)
    x = x.reshape((h // m) * (w // m), m * m * C)
    if "proj_ln_w" in p:
        x = layer_norm(x, p["proj_ln_w"], p["proj_ln_b"], cfg.eps)
    x = x @ p["proj_fc1_w"] + p["proj_fc1_b"]
    x = jax.nn.gelu(x, approximate=False)
    return x @ p["proj_fc2_w"] + p["proj_fc2_b"]


class PaddleOcrVL:
    """Vision tower + Ernie backbone with the reference recognize API."""

    def __init__(self, lm, vision_cfg: VisionConfig, vision_params: dict, *,
                 image_token_id: int, dtype=jnp.float32):
        self.lm = lm  # CausalLM (Ernie-4.5)
        self.vision_config = vision_cfg
        self.vision_params = vision_params
        self.image_token_id = image_token_id
        self.dtype = dtype

    def encode_image(self, image: np.ndarray) -> tuple[jax.Array, int]:
        """image -> (visual embeds [n_tokens, llm_hidden], n_tokens)."""
        patches, grid = preprocess_image(image)
        side = int(round(self.vision_params["pos_embed"].shape[0] ** 0.5))
        idx, wgt = navit_pos_taps(side, grid)
        cos, sin = navit_rope_tables(self.vision_config, grid)
        feats = navit_forward(
            self.vision_config, self.vision_params,
            jnp.asarray(patches, self.dtype), jnp.asarray(idx), jnp.asarray(wgt),
            (jnp.asarray(cos), jnp.asarray(sin)), (grid[1], grid[2]),
        )
        return feats, feats.shape[0]

    def build_prompt_ids(self, n_image_tokens: int, task: str = "ocr",
                         prompt: Optional[str] = None) -> list[int]:
        """Reference build_input_tokens (model.rs:363-413)."""
        tok = self.lm.tokenizer
        bos = tok.token_to_id("<|begin_of_sentence|>")
        ids = [bos] if bos is not None else []
        ids += tok.encode("User: ")
        ids += tok.encode("<|image_start|>")
        ids += [self.image_token_id] * n_image_tokens
        ids += tok.encode("<|image_end|>")
        ids += tok.encode(prompt or TASK_PROMPTS[task])
        ids += tok.encode("\nAssistant: ")
        return ids

    def recognize(self, image: np.ndarray, *, task: str = "ocr",
                  prompt: Optional[str] = None, max_new_tokens: int = 1024) -> str:
        """Full image -> text OCR (greedy, reference generate_stream)."""
        return "".join(self.recognize_stream(
            image, task=task, prompt=prompt, max_new_tokens=max_new_tokens
        )).strip()

    def recognize_stream(self, image, *, task: str = "ocr", prompt=None,
                         max_new_tokens: int = 1024):
        """Greedy decode, yielding detokenized text pieces as they emerge."""
        from crane_tpu.models.modules.embeds_decode import (
            embeds_prefill as _asr_prefill,
            greedy_decode_step as _asr_decode_step,
        )
        from crane_tpu.utils.buckets import bucket_length
        from crane_tpu.models.modules.transformer import make_cache
        from crane_tpu.tokenizer.token_stream import TokenOutputStream

        feats, n = self.encode_image(image)
        ids = np.asarray(self.build_prompt_ids(n, task, prompt), np.int32)
        S = len(ids)
        embeds = self.lm.params["embed"][jnp.asarray(ids)][None].astype(self.dtype)
        (pos,) = np.where(ids == self.image_token_id)
        assert len(pos) == n, (len(pos), n)
        embeds = embeds.at[0, pos].set(feats.astype(self.dtype))

        s_bucket = bucket_length(S, floor=64)
        embeds = jnp.pad(embeds, ((0, 0), (0, s_bucket - S), (0, 0)))
        cache = make_cache(
            self.lm.config, 1, bucket_length(S + max_new_tokens, floor=256), self.dtype
        )
        logits, cache = _asr_prefill(
            self.lm.config, self.lm.params, self.lm.rope, cache, embeds,
            jnp.asarray(S, jnp.int32),
        )
        cur = jnp.argmax(logits, -1).astype(jnp.int32)
        eos = set(self.lm.eos_token_ids)
        detok = TokenOutputStream(self.lm.tokenizer)
        for _ in range(max_new_tokens):
            t = int(cur[0])
            if t in eos:
                break
            piece = detok.next_token(t)
            if piece:
                yield piece
            cur, cache = _asr_decode_step(
                self.lm.config, self.lm.params, self.lm.rope, cache, cur
            )
        rest = detok.decode_rest()
        if rest:
            yield rest


def _pick(sd: dict, *names: str):
    for n in names:
        if n in sd:
            return sd[n]
    raise KeyError(f"none of {names} in checkpoint (have {len(sd)} keys)")


def map_navit_weights(cfg: VisionConfig, sd: dict, dtype=jnp.float32) -> dict:
    """Map the PaddleOCR-VL vision tower + projector weights. Accepts the
    public checkpoint's SigLIP-style naming (separate q/k/v fused here)."""
    a = lambda x: jnp.asarray(np.asarray(x), dtype)
    t = lambda x: jnp.asarray(np.asarray(x).T, dtype)

    emb_w = _pick(sd, "embeddings.patch_embedding.weight", "patch_embed.proj.weight")
    emb_w = np.asarray(emb_w)
    if emb_w.ndim == 4:  # conv [C_out, 3, 14, 14] -> [3*14*14, C_out]
        emb_w = emb_w.reshape(emb_w.shape[0], -1).T
    else:
        emb_w = emb_w.T
    layers = []
    for i in range(cfg.depth):
        L = f"encoder.layers.{i}."
        qw, kw, vw = (np.asarray(sd[L + f"self_attn.{n}_proj.weight"]) for n in "qkv")
        qb, kb, vb = (np.asarray(sd[L + f"self_attn.{n}_proj.bias"]) for n in "qkv")
        layers.append({
            "qkv_w": jnp.asarray(np.concatenate([qw, kw, vw], 0).T, dtype),
            "qkv_b": jnp.asarray(np.concatenate([qb, kb, vb], 0), dtype),
            "proj_w": t(_pick(sd, L + "self_attn.out_proj.weight", L + "self_attn.o_proj.weight")),
            "proj_b": a(_pick(sd, L + "self_attn.out_proj.bias", L + "self_attn.o_proj.bias")),
            "ln1_w": a(sd[L + "layer_norm1.weight"]), "ln1_b": a(sd[L + "layer_norm1.bias"]),
            "ln2_w": a(sd[L + "layer_norm2.weight"]), "ln2_b": a(sd[L + "layer_norm2.bias"]),
            "fc1_w": t(sd[L + "mlp.fc1.weight"]), "fc1_b": a(sd[L + "mlp.fc1.bias"]),
            "fc2_w": t(sd[L + "mlp.fc2.weight"]), "fc2_b": a(sd[L + "mlp.fc2.bias"]),
        })
    p = {
        "embed_w": jnp.asarray(emb_w, dtype),
        "embed_b": a(_pick(sd, "embeddings.patch_embedding.bias", "patch_embed.proj.bias")),
        "pos_embed": a(_pick(sd, "embeddings.position_embedding.weight", "pos_embed")),
        "layers": layers,
        "post_ln_w": a(sd["post_layernorm.weight"]),
        "post_ln_b": a(sd["post_layernorm.bias"]),
        "proj_fc1_w": t(_pick(sd, "_projector.linear_1.weight", "_projector.0.weight")),
        "proj_fc1_b": a(_pick(sd, "_projector.linear_1.bias", "_projector.0.bias")),
        "proj_fc2_w": t(_pick(sd, "_projector.linear_2.weight", "_projector.2.weight")),
        "proj_fc2_b": a(_pick(sd, "_projector.linear_2.bias", "_projector.2.bias")),
    }
    for cand_w, cand_b in (("_projector.norm.weight", "_projector.norm.bias"),
                           ("_projector.pre_norm.weight", "_projector.pre_norm.bias")):
        if cand_w in sd:
            p["proj_ln_w"] = a(sd[cand_w])
            p["proj_ln_b"] = a(sd[cand_b])
            break
    return p


def load_paddleocr_vl(model_dir: str, *, dtype=jnp.float32) -> PaddleOcrVL:
    """Load a PaddleOCR-VL checkpoint: Ernie LLM + NaViT tower + projector.

    Tower keys are searched under the ``visual.``/``vision_model.``/
    ``model.visual.`` prefixes; the projector under ``mlp_AR.``/
    ``projector.``/``visual.projector.`` (normalized to ``_projector.``)."""
    from crane_tpu.loaders.safetensors_loader import load_state_dict
    from crane_tpu.models.auto import (
        load_hf_config,
        map_hf_weights,
        read_eos_ids,
        transformer_config_from_hf,
    )
    from crane_tpu.models.causal_lm import CausalLM
    from crane_tpu.tokenizer.autotokenizer import AutoTokenizer

    hf = load_hf_config(model_dir)
    vc = hf.get("vision_config", {})
    vcfg = VisionConfig(
        depth=vc.get("num_hidden_layers", vc.get("depth", 27)),
        hidden_size=vc.get("hidden_size", 1152),
        intermediate_size=vc.get("intermediate_size", 4304),
        num_heads=vc.get("num_attention_heads", 16),
        patch_size=vc.get("patch_size", 14),
        temporal_patch_size=1,
        spatial_merge_size=vc.get("spatial_merge_size", 2),
        out_hidden_size=vc.get("out_hidden_size", 1024),
        eps=vc.get("layer_norm_eps", 1e-6),
        act="gelu_tanh" if "tanh" in vc.get("hidden_act", "gelu_pytorch_tanh") else "gelu",
    )
    text_hf = hf.get("text_config", hf)
    if "model_type" not in text_hf or text_hf is hf:
        text_hf = {**text_hf, "model_type": "ernie4_5"}
    tcfg = transformer_config_from_hf(text_hf)
    sd = load_state_dict(model_dir)

    def strip(prefix):
        return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    v_sd = {}
    for pref in ("visual.vision_model.", "vision_model.", "model.visual.", "visual."):
        v_sd = strip(pref)
        if any(k.startswith("encoder.layers.0.") for k in v_sd):
            break
    for pref in ("mlp_AR.", "projector.", "visual.projector.", "model.projector."):
        for k, v in strip(pref).items():
            v_sd.setdefault("_projector." + k, v)
    # Sequential-style projector (mlp_AR.0 / mlp_AR.2)
    vision_params = map_navit_weights(vcfg, v_sd, dtype)

    lm_prefix = "model.language_model." if any(
        k.startswith("model.language_model.") for k in sd
    ) else ("language_model.model." if any(k.startswith("language_model.") for k in sd) else "model.")
    text_sd = {"model." + k: v for k, v in strip(lm_prefix).items()}
    for hk in ("lm_head.weight", "language_model.lm_head.weight"):
        if hk in sd:
            text_sd["lm_head.weight"] = sd[hk]
            break
    params = map_hf_weights(tcfg, text_sd, dtype)
    tok = AutoTokenizer.from_pretrained(model_dir)
    lm = CausalLM(tcfg, params, tokenizer=tok, eos_token_ids=read_eos_ids(model_dir), dtype=dtype)

    image_token_id = hf.get("image_token_id") or tok.token_to_id("<|IMAGE_PLACEHOLDER|>") or 0
    return PaddleOcrVL(
        lm, vcfg, vision_params, image_token_id=int(image_token_id), dtype=dtype
    )
