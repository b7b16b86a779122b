"""Gemma3 vision-language model (reference "Gemma4 VL", gemma4/{vision,vlm}.rs).

SigLIP vision tower (conv patch embed, learned position embeddings, pre-LN
bidirectional transformer with biases, gelu-tanh MLP, final LN) -> multimodal
projector (4x4 average pool -> unit-offset RMSNorm -> projection matrix) ->
image features spliced over ``<image>`` token positions. Image tokens attend
BIDIRECTIONALLY within their image block while text stays causal (HF
token_type_ids mask), passed through the transformer as an extra mask.

Numerics match HF transformers Gemma3ForConditionalGeneration.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from crane_tpu.generation.config import GenerationConfig
from crane_tpu.models.modules.transformer import (
    TransformerConfig,
    forward_hidden,
    lm_logits,
    make_cache,
    make_rope_tables,
)
from crane_tpu.models.modules.vision import layer_norm
from crane_tpu.ops.norm import rms_norm
from crane_tpu.utils.buckets import bucket_length


@dataclasses.dataclass(frozen=True)
class SiglipConfig:
    hidden_size: int
    num_layers: int
    num_heads: int
    intermediate_size: int
    image_size: int
    patch_size: int
    eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def patches_per_side(self) -> int:
        return self.image_size // self.patch_size


def siglip_encode(cfg: SiglipConfig, p: dict, pixels: jax.Array) -> jax.Array:
    """pixels ``[B, C, H, W]`` -> features ``[B, n_patches, E]``."""
    B = pixels.shape[0]
    P = cfg.patch_size
    n = cfg.patches_per_side
    # conv(k=P, s=P) == matmul over flattened patches
    x = pixels.reshape(B, 3, n, P, n, P).transpose(0, 2, 4, 1, 3, 5)
    x = x.reshape(B, n * n, 3 * P * P)
    x = x @ p["patch_w"] + p["patch_b"]
    x = x + p["pos_embed"]

    H, D = cfg.num_heads, cfg.head_dim
    T = n * n
    for lp in p["layers"]:
        h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.eps)
        q = (h @ lp["wq"] + lp["bq"]).reshape(B, T, H, D)
        k = (h @ lp["wk"] + lp["bk"]).reshape(B, T, H, D)
        v = (h @ lp["wv"] + lp["bv"]).reshape(B, T, H, D)
        logits = jnp.einsum("bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * (D ** -0.5), axis=-1)
        o = jnp.einsum("bhst,bthd->bshd", probs.astype(v.dtype), v).reshape(B, T, -1)
        x = x + (o @ lp["wo"] + lp["bo"])
        h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.eps)
        h = jax.nn.gelu(h @ lp["fc1_w"] + lp["fc1_b"], approximate=True)
        x = x + (h @ lp["fc2_w"] + lp["fc2_b"])
    return layer_norm(x, p["post_ln_w"], p["post_ln_b"], cfg.eps)


def project_features(
    cfg: SiglipConfig, p: dict, feats: jax.Array, tokens_per_image: int
) -> jax.Array:
    """Avg-pool to mm_tokens_per_image, unit-offset RMSNorm, project."""
    B, T, E = feats.shape
    n = cfg.patches_per_side
    side = int(tokens_per_image ** 0.5)
    k = n // side
    x = feats.reshape(B, side, k, side, k, E).mean(axis=(2, 4))  # [B, side, side, E]
    x = x.reshape(B, side * side, E)
    x = rms_norm(x, p["mm_norm"], eps=cfg.eps, weight_offset=1.0)
    return x @ p["mm_proj"]


@functools.partial(jax.jit, static_argnums=(0, 1))
def _encode_images(vcfg, tokens_per_image, vparams, pixels):
    feats = siglip_encode(vcfg, vparams, pixels)
    return project_features(vcfg, vparams, feats, tokens_per_image)


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(3,))
def _vl_prefill(cfg, params, rope, cache, embeds, extra_mask, true_length,
                segments=None):
    tokens = jnp.zeros(embeds.shape[:2], jnp.int32)
    # fresh prefill (read_cache=False): in-context K/V attention makes the
    # flash kernel eligible; segments carry the image-block bidirectional
    # mask into it (extra_mask stays for the XLA path at small S)
    hidden, new_cache = forward_hidden(
        cfg, params, tokens, cache, jnp.asarray(0, jnp.int32), rope,
        inputs_embeds=embeds, true_lengths=true_length[None],
        extra_mask=extra_mask, segments=segments, read_cache=False,
    )
    new_cache = dataclasses.replace(
        new_cache, lengths=jnp.full_like(cache.lengths, true_length)
    )
    last = jax.lax.dynamic_index_in_dim(hidden[0], true_length - 1, 0, keepdims=False)
    return lm_logits(cfg, params, last[None, None])[:, 0], new_cache


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(3,))
def _vl_decode_step(cfg, params, rope, cache, token):
    hidden, new_cache = forward_hidden(
        cfg, params, token[:, None], cache, cache.lengths, rope
    )
    logits = lm_logits(cfg, params, hidden)[:, 0]
    return jnp.argmax(logits, -1).astype(jnp.int32), new_cache


def preprocess_gemma3(image, *, image_size: int = 224) -> np.ndarray:
    """PIL image -> normalized ``[3, H, W]`` (SigLIP processing: bilinear
    resize, rescale 1/255, mean/std 0.5)."""
    from PIL import Image

    if isinstance(image, np.ndarray):
        image = Image.fromarray(image)
    image = image.convert("RGB").resize((image_size, image_size), Image.BILINEAR)
    arr = np.asarray(image, np.float32) / 255.0
    arr = (arr - 0.5) / 0.5
    return arr.transpose(2, 0, 1)


class Gemma3VLModel:
    def __init__(
        self,
        text_config: TransformerConfig,
        vision_config: SiglipConfig,
        params: dict,
        vision_params: dict,
        *,
        image_token_id: int,
        mm_tokens_per_image: int = 256,
        tokenizer=None,
        eos_token_ids: Sequence[int] = (),
        dtype=jnp.float32,
    ):
        self.config = text_config
        self.vision_config = vision_config
        self.params = params
        self.vision_params = vision_params
        self.image_token_id = image_token_id
        self.mm_tokens_per_image = mm_tokens_per_image
        self.tokenizer = tokenizer
        self.eos_token_ids = tuple(eos_token_ids)
        self.dtype = dtype
        self.rope = make_rope_tables(text_config)

    def encode_images(self, pixels: np.ndarray) -> jax.Array:
        """pixels ``[N, 3, H, W]`` -> features ``[N, mm_tokens, E_text]``."""
        return _encode_images(
            self.vision_config, self.mm_tokens_per_image, self.vision_params,
            jnp.asarray(pixels, self.dtype),
        )

    def generate(
        self,
        input_ids: Sequence[int],
        pixels: Optional[np.ndarray] = None,
        gen: GenerationConfig | None = None,
        streamer=None,
    ) -> list[int]:
        gen = gen or GenerationConfig()
        eos = set(gen.eos_token_ids) | set(self.eos_token_ids)
        cfg = self.config
        ids = np.asarray(list(input_ids), np.int32)
        S = len(ids)
        embeds = self.params["embed"][jnp.asarray(ids)][None].astype(self.dtype)
        if cfg.embed_scale is not None:
            # scaling is applied inside forward_hidden; splice raw embeds with
            # features pre-divided so the shared scale cancels
            pass
        img_mask = ids == self.image_token_id
        if pixels is not None:
            feats = self.encode_images(pixels)
            flat = feats.reshape(-1, feats.shape[-1])
            (pos,) = np.where(img_mask)
            assert len(pos) == flat.shape[0], (len(pos), flat.shape)
            # forward_hidden multiplies all inputs_embeds by embed_scale;
            # compensate so image features enter unscaled (HF splices after
            # the scaled text embedding)
            scale = cfg.embed_scale or 1.0
            embeds = embeds.at[0, pos].set((flat / scale).astype(self.dtype))

        s_bucket = bucket_length(S, floor=64)
        embeds = jnp.pad(embeds, ((0, 0), (0, s_bucket - S), (0, 0)))
        # bidirectional attention within each contiguous image block
        m = np.zeros((s_bucket, s_bucket), bool)
        seg = np.zeros((s_bucket,), np.int32)
        if img_mask.any():
            group = np.cumsum(~img_mask)  # constant within an image run
            gm = img_mask[:, None] & img_mask[None, :] & (group[:, None] == group[None, :])
            m[:S, :S] = gm
            seg[:S] = np.where(img_mask, group + 1, 0)
        extra = jnp.asarray(m)[None]
        segments = jnp.asarray(seg)[None]

        cache = make_cache(cfg, 1, bucket_length(S + gen.max_new_tokens, floor=256), self.dtype)
        logits, cache = _vl_prefill(
            cfg, self.params, self.rope, cache, embeds, extra,
            jnp.asarray(S, jnp.int32), segments,
        )
        tok = int(jnp.argmax(logits, -1)[0])
        out = []
        cur = jnp.asarray([tok], jnp.int32)
        for _ in range(gen.max_new_tokens):
            out.append(int(cur[0]))
            if streamer is not None and streamer.append(out[-1]) is False:
                break
            if out[-1] in eos:
                break
            cur, cache = _vl_decode_step(cfg, self.params, self.rope, cache, cur)
        if streamer is not None:
            streamer.finalize()
        return out


def load_gemma3_vl(model_dir: str, *, dtype=jnp.float32) -> Gemma3VLModel:
    from crane_tpu.loaders.safetensors_loader import load_state_dict
    from crane_tpu.models.auto import (
        load_hf_config,
        map_hf_weights,
        read_eos_ids,
        transformer_config_from_hf,
    )

    hf = load_hf_config(model_dir)
    tc = dict(hf["text_config"])
    tc["model_type"] = "gemma3_text"
    text_cfg = transformer_config_from_hf(tc)
    vc = hf["vision_config"]
    vision_cfg = SiglipConfig(
        hidden_size=vc["hidden_size"],
        num_layers=vc["num_hidden_layers"],
        num_heads=vc["num_attention_heads"],
        intermediate_size=vc["intermediate_size"],
        image_size=vc["image_size"],
        patch_size=vc["patch_size"],
        eps=vc.get("layer_norm_eps", 1e-6),
    )
    sd = load_state_dict(model_dir)
    lm_prefix = (
        "model.language_model." if any(k.startswith("model.language_model.") for k in sd)
        else "language_model.model."
    )
    text_sd = {
        k.replace(lm_prefix, "model."): v for k, v in sd.items() if k.startswith(lm_prefix)
    }
    if "lm_head.weight" in sd:
        text_sd["lm_head.weight"] = sd["lm_head.weight"]
    params = map_hf_weights(text_cfg, text_sd, dtype)

    vt = (
        "model.vision_tower.vision_model."
        if any(k.startswith("model.vision_tower.") for k in sd)
        else "vision_tower.vision_model."
    )
    t = lambda n: jnp.asarray(np.asarray(sd[vt + n]).T, dtype)
    a = lambda n: jnp.asarray(np.asarray(sd[vt + n]), dtype)
    pw = np.asarray(sd[vt + "embeddings.patch_embedding.weight"], np.float32)  # [E,3,P,P]
    layers = []
    for i in range(vision_cfg.num_layers):
        lp = f"encoder.layers.{i}."
        layers.append(
            {
                "ln1_w": a(lp + "layer_norm1.weight"), "ln1_b": a(lp + "layer_norm1.bias"),
                "ln2_w": a(lp + "layer_norm2.weight"), "ln2_b": a(lp + "layer_norm2.bias"),
                "wq": t(lp + "self_attn.q_proj.weight"), "bq": a(lp + "self_attn.q_proj.bias"),
                "wk": t(lp + "self_attn.k_proj.weight"), "bk": a(lp + "self_attn.k_proj.bias"),
                "wv": t(lp + "self_attn.v_proj.weight"), "bv": a(lp + "self_attn.v_proj.bias"),
                "wo": t(lp + "self_attn.out_proj.weight"), "bo": a(lp + "self_attn.out_proj.bias"),
                "fc1_w": t(lp + "mlp.fc1.weight"), "fc1_b": a(lp + "mlp.fc1.bias"),
                "fc2_w": t(lp + "mlp.fc2.weight"), "fc2_b": a(lp + "mlp.fc2.bias"),
            }
        )
    vision_params = {
        # conv weight [E, 3, P, P] -> [3*P*P, E] matching the (c, ph, pw) patch flatten
        "patch_w": jnp.asarray(pw.reshape(pw.shape[0], -1).T, dtype),
        "patch_b": a("embeddings.patch_embedding.bias"),
        "pos_embed": a("embeddings.position_embedding.weight"),
        "layers": tuple(layers),
        "post_ln_w": a("post_layernorm.weight"),
        "post_ln_b": a("post_layernorm.bias"),
        "mm_norm": jnp.asarray(np.asarray(
            sd.get("model.multi_modal_projector.mm_soft_emb_norm.weight",
                   sd.get("multi_modal_projector.mm_soft_emb_norm.weight"))), dtype),
        "mm_proj": jnp.asarray(np.asarray(
            sd.get("model.multi_modal_projector.mm_input_projection_weight",
                   sd.get("multi_modal_projector.mm_input_projection_weight"))), dtype),
    }

    tokenizer = None
    try:
        from crane_tpu.tokenizer.autotokenizer import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(model_dir)
    except Exception:
        pass
    return Gemma3VLModel(
        text_cfg, vision_cfg, params, vision_params,
        image_token_id=hf.get("image_token_id", hf.get("image_token_index")),
        mm_tokens_per_image=hf.get("mm_tokens_per_image", 256),
        tokenizer=tokenizer, eos_token_ids=read_eos_ids(model_dir), dtype=dtype,
    )
