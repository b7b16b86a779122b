"""Qwen3-VL: vision-language model (image chat / OCR).

Reference behavior (/root/reference/crane-core/src/models/qwen3_5/{vision,
processor,vlm}.rs): smart-resized merge-block-major patches -> ViT + 2x2
merger -> image embeds spliced over ``<|image_pad|>`` positions -> 3-D MRoPE
position ids (text advances the counter, image spans use base+(t,h,w), counter
resumes at base+max — get_rope_index, vlm.rs:187-235) -> greedy decode with a
separately tracked mrope position (decode position != token index,
vlm.rs:288-299). Plus Qwen3-VL DeepStack: mid-ViT features added to the first
text layers at visual positions.

Numerics match HF transformers Qwen3VLForConditionalGeneration (parity
oracle). Single-sequence generation, like the reference VLM path.
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
from crane_tpu.models.modules.vision import (
    VisionConfig,
    pos_embed_bilinear_taps,
    vision_forward,
    vision_rope_tables,
)
from crane_tpu.ops.rope import mrope_cos_sin
from crane_tpu.utils.buckets import bucket_length


@functools.partial(jax.jit, static_argnums=(0,))
def _encode_images(vcfg, vparams, patches, pos_idx, pos_weight, cos, sin):
    return vision_forward(vcfg, vparams, patches, pos_idx, pos_weight, cos, sin)


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(3,))
def _vlm_prefill(cfg, params, rope, cache, embeds, rope_cos, rope_sin, deepstack_mask, deepstack_embeds, true_length):
    tokens = jnp.zeros(embeds.shape[:2], jnp.int32)
    hidden, new_cache = forward_hidden(
        cfg, params, tokens, cache, jnp.asarray(0, jnp.int32), rope,
        inputs_embeds=embeds,
        rope_embeds={"cos": rope_cos, "sin": rope_sin},
        deepstack=(deepstack_mask, deepstack_embeds),
        true_lengths=true_length[None],
    )
    new_cache = dataclasses.replace(
        new_cache, lengths=jnp.full_like(cache.lengths, true_length)
    )
    last = jax.lax.dynamic_index_in_dim(hidden[0], true_length - 1, axis=0, keepdims=False)
    logits = lm_logits(cfg, params, last[None, None])[:, 0]
    return logits, new_cache


def _vlm_decode_body(cfg, mrope_section, params, rope, cache, token, pos_delta):
    # decode position = token index + mrope delta; all three streams equal
    p = (cache.lengths + pos_delta).astype(jnp.int32)
    pos3 = jnp.broadcast_to(p[None, :, None], (3, 1, 1))
    cos, sin = mrope_cos_sin(pos3, cfg.rot_dim, mrope_section, theta=cfg.rope_theta)
    hidden, new_cache = forward_hidden(
        cfg, params, token[:, None], cache, cache.lengths, rope,
        rope_embeds={"cos": cos, "sin": sin},
    )
    logits = lm_logits(cfg, params, hidden)[:, 0]
    return jnp.argmax(logits, -1).astype(jnp.int32), new_cache


@functools.partial(jax.jit, static_argnums=(0, 1, 7), donate_argnums=(4,))
def _vlm_decode_block(cfg, mrope_section, params, rope, cache, token, pos_delta, n_steps):
    """``n_steps`` greedy decode steps in ONE device dispatch (lax.scan) —
    the same per-block dispatch amortization the text engine and TTS/ASR
    paths use; per-token host loops pay one RPC per token on remote
    runtimes. Returns (tokens ``[B, n_steps]``, cache)."""

    def step(carry, _):
        cache, tok = carry
        nxt, cache = _vlm_decode_body(
            cfg, mrope_section, params, rope, cache, tok, pos_delta
        )
        return (cache, nxt), nxt

    (cache, _), toks = jax.lax.scan(step, (cache, token), None, length=n_steps)
    return toks.T, cache  # [n_steps, B] -> [B, n_steps]


class Qwen3VLModel:
    def __init__(
        self,
        text_config: TransformerConfig,
        vision_config: VisionConfig,
        params: dict,
        vision_params: dict,
        *,
        mrope_section: tuple[int, int, int] = (24, 20, 20),
        image_token_id: int,
        video_token_id: int,
        vision_start_token_id: int,
        tokenizer=None,
        eos_token_ids: Sequence[int] = (),
        dtype=jnp.bfloat16,
    ):
        self.config = text_config
        self.vision_config = vision_config
        self.params = params
        self.vision_params = vision_params
        self.mrope_section = tuple(mrope_section)
        self.image_token_id = image_token_id
        self.video_token_id = video_token_id
        self.vision_start_token_id = vision_start_token_id
        self.tokenizer = tokenizer
        self.eos_token_ids = tuple(eos_token_ids)
        self.dtype = dtype
        self.rope = make_rope_tables(text_config)

    # -- vision --------------------------------------------------------------
    def encode_images(self, patches: np.ndarray, grid_thw: tuple[int, int, int]):
        """patches ``[S, C*T*P*P]`` -> (features ``[S/4, E]``, deepstack)."""
        pos_idx, pos_w = pos_embed_bilinear_taps(self.vision_config, grid_thw)
        cos, sin = vision_rope_tables(self.vision_config, grid_thw)
        return _encode_images(
            self.vision_config, self.vision_params,
            jnp.asarray(patches, self.dtype), jnp.asarray(pos_idx),
            jnp.asarray(pos_w), jnp.asarray(cos), jnp.asarray(sin),
        )

    # -- 3-D positions (host-side; numpy port of HF get_rope_index) ----------
    def get_rope_index(
        self, input_ids: np.ndarray, image_grid_thw, video_grid_thw=None
    ) -> tuple[np.ndarray, int]:
        """input_ids ``[S]`` -> (positions ``[3, S]``, mrope_delta).

        Videos are timestamp-separated in Qwen3-VL: each video frame is its
        own t=1 vision span (HF pre-splits video_grid_thw by t and zeroes the
        temporal index — temporal information lives in the timestamp text
        tokens between frames, not in the rope t channel)."""
        ids = list(np.asarray(input_ids).tolist())
        merge = self.vision_config.spatial_merge_size
        img_grids = [tuple(g) for g in (image_grid_thw or [])]
        vid_grids = []
        for t, h, w in (video_grid_thw or []):
            vid_grids.extend([(1, h, w)] * int(t))  # per-frame spans
        pos_chunks = []
        st, img_i, vid_i = 0, 0, 0
        n_spans = len(img_grids) + len(vid_grids)
        for _ in range(n_spans):
            ed_img = ids.index(self.image_token_id, st) if (
                img_i < len(img_grids) and self.image_token_id in ids[st:]
            ) else len(ids) + 1
            ed_vid = ids.index(self.video_token_id, st) if (
                vid_i < len(vid_grids) and self.video_token_id in ids[st:]
            ) else len(ids) + 1
            if ed_img < ed_vid:
                t, h, w = img_grids[img_i]
                img_i += 1
                ed = ed_img
            else:
                t, h, w = vid_grids[vid_i]
                vid_i += 1
                ed = ed_vid
            gh, gw = h // merge, w // merge
            st_idx = pos_chunks[-1].max() + 1 if pos_chunks else 0
            text_len = ed - st
            pos_chunks.append(np.tile(np.arange(text_len), (3, 1)) + st_idx)
            t_idx = np.repeat(np.arange(t), gh * gw)
            h_idx = np.tile(np.repeat(np.arange(gh), gw), t)
            w_idx = np.tile(np.arange(gw), t * gh)
            pos_chunks.append(np.stack([t_idx, h_idx, w_idx]) + text_len + st_idx)
            st = ed + t * gh * gw
        if st < len(ids):
            st_idx = pos_chunks[-1].max() + 1 if pos_chunks else 0
            pos_chunks.append(np.tile(np.arange(len(ids) - st), (3, 1)) + st_idx)
        pos = np.concatenate(pos_chunks, axis=1).astype(np.int32)
        delta = int(pos.max()) + 1 - len(ids)
        return pos, delta

    # -- generation ----------------------------------------------------------
    def generate(
        self,
        input_ids: Sequence[int],
        images: Optional[list] = None,
        gen: GenerationConfig | None = None,
        streamer=None,
        videos: Optional[list] = None,
    ) -> list[int]:
        """Greedy decode with spliced image/video embeds (single sequence).

        ``images``/``videos`` are lists of ``(patches, grid_thw)``; video
        grids have t > 1 (frames / temporal_patch_size) and splice at
        ``video_token_id`` pads. DeepStack features from both modalities are
        merged in token-position order (HF Qwen3VLModel.forward semantics)."""
        gen = gen or GenerationConfig()
        eos = set(gen.eos_token_ids) | set(self.eos_token_ids)
        ids = np.asarray(list(input_ids), np.int32)
        S = len(ids)
        cfg = self.config

        def encode_all(items):
            feats, deeps, grids = [], [], []
            for patches, grid in items or []:
                f, dsk = self.encode_images(patches, grid)
                feats.append(f)
                deeps.append(dsk)
                grids.append(grid)
            return feats, deeps, grids

        img_feats, img_deep, img_grids = encode_all(images)
        # video frames are separate attention blocks in the vision tower (HF
        # builds per-frame cu_seqlens), so encode each frame independently —
        # identical math, and all frames share one compiled shape
        per_frame = []
        for patches, (t, h, w) in videos or []:
            fp = np.asarray(patches).reshape(t, h * w, -1)
            per_frame.extend((fp[i], (1, h, w)) for i in range(t))
        vid_feats, vid_deep, _ = encode_all(per_frame)
        vid_grids = [grid for _, grid in (videos or [])]

        embeds = self.params["embed"][jnp.asarray(ids)][None].astype(self.dtype)
        img_mask = ids == self.image_token_id
        vid_mask = ids == self.video_token_id
        mask = img_mask | vid_mask
        deep_parts = []  # (positions, deepstack [L, n, E]) per modality
        for m, feats_list, deep_list in (
            (img_mask, img_feats, img_deep), (vid_mask, vid_feats, vid_deep)
        ):
            if not feats_list:
                continue
            feats = jnp.concatenate(feats_list, axis=0)
            (pos,) = np.where(m)
            assert len(pos) == feats.shape[0], (len(pos), feats.shape)
            embeds = embeds.at[0, pos].set(feats.astype(self.dtype))
            deep_parts.append((pos, jnp.concatenate(deep_list, axis=1)))
        if deep_parts:
            # merge deepstack features in token-position order across modalities
            (all_pos,) = np.where(mask)
            L = deep_parts[0][1].shape[0]
            deepstack = jnp.zeros((L, len(all_pos), cfg.hidden_size), self.dtype)
            lookup = {p: i for i, p in enumerate(all_pos)}
            for pos, d in deep_parts:
                idx = np.asarray([lookup[p] for p in pos])
                deepstack = deepstack.at[:, idx].set(d.astype(self.dtype))
        else:
            deepstack = jnp.zeros((0, 0, cfg.hidden_size), self.dtype)

        pos3, delta = self.get_rope_index(ids, img_grids, vid_grids)
        s_bucket = bucket_length(S, floor=64)
        pad = s_bucket - S
        embeds = jnp.pad(embeds, ((0, 0), (0, pad), (0, 0)))
        pos3_p = np.pad(pos3, ((0, 0), (0, pad)))
        mask_p = jnp.asarray(np.pad(mask, (0, pad)))[None]

        cos, sin = mrope_cos_sin(
            jnp.asarray(pos3_p)[:, None, :], cfg.rot_dim, self.mrope_section,
            theta=cfg.rope_theta,
        )
        total = S + gen.max_new_tokens
        cache = make_cache(cfg, 1, bucket_length(total, floor=256), self.dtype)
        logits, cache = _vlm_prefill(
            cfg, self.params, self.rope, cache, embeds, cos, sin,
            mask_p, deepstack, jnp.asarray(S, jnp.int32),
        )
        tok = int(jnp.argmax(logits, -1)[0])

        # block decode: BLOCK tokens per device dispatch (per-token loops
        # pay one RPC per token on remote runtimes); EOS is detected on the
        # host within the block and the overrun tokens are dropped
        BLOCK = 8
        if gen.max_new_tokens <= 0:
            if streamer is not None:
                streamer.finalize()
            return []
        out = [tok]
        stopped = (
            streamer is not None and streamer.append(tok) is False
        ) or tok in eos
        cur = jnp.asarray([tok], jnp.int32)
        pos_delta = jnp.asarray(delta, jnp.int32)
        while not stopped and len(out) < gen.max_new_tokens:
            toks, cache = _vlm_decode_block(
                cfg, self.mrope_section, self.params, self.rope, cache, cur,
                pos_delta, BLOCK,
            )
            cur = toks[:, -1]
            for t in np.asarray(toks[0]).tolist():
                if len(out) >= gen.max_new_tokens:
                    stopped = True
                    break
                out.append(int(t))
                if streamer is not None and streamer.append(out[-1]) is False:
                    stopped = True
                    break
                if out[-1] in eos:
                    stopped = True
                    break
        if streamer is not None:
            streamer.finalize()
        return out


# -- loading -----------------------------------------------------------------


def load_qwen3_vl(model_dir: str, *, dtype=jnp.bfloat16) -> Qwen3VLModel:
    from crane_tpu.loaders.safetensors_loader import load_state_dict
    from crane_tpu.models.auto import load_hf_config, map_hf_weights, read_eos_ids

    hf = load_hf_config(model_dir)
    tc = hf["text_config"]
    vc = hf["vision_config"]
    text_cfg = TransformerConfig(
        vocab_size=tc["vocab_size"],
        hidden_size=tc["hidden_size"],
        num_layers=tc["num_hidden_layers"],
        num_heads=tc["num_attention_heads"],
        num_kv_heads=tc.get("num_key_value_heads", tc["num_attention_heads"]),
        head_dim=tc.get("head_dim") or tc["hidden_size"] // tc["num_attention_heads"],
        intermediate_size=tc["intermediate_size"],
        rms_norm_eps=tc.get("rms_norm_eps", 1e-6),
        rope_theta=tc.get("rope_theta", 5_000_000.0),
        max_position_embeddings=tc.get("max_position_embeddings", 128000),
        qk_norm=True,
        tie_word_embeddings=hf.get("tie_word_embeddings", tc.get("tie_word_embeddings", False)),
    )
    vision_cfg = VisionConfig(
        depth=vc["depth"],
        hidden_size=vc["hidden_size"],
        intermediate_size=vc["intermediate_size"],
        num_heads=vc["num_heads"],
        patch_size=vc["patch_size"],
        temporal_patch_size=vc["temporal_patch_size"],
        spatial_merge_size=vc["spatial_merge_size"],
        out_hidden_size=vc["out_hidden_size"],
        in_channels=vc.get("in_channels", 3),
        num_position_embeddings=vc["num_position_embeddings"],
        deepstack_indexes=tuple(vc.get("deepstack_visual_indexes", ())),
        act=("gelu_tanh" if vc.get("hidden_act", "gelu_pytorch_tanh") == "gelu_pytorch_tanh" else vc["hidden_act"]),
    )

    sd = load_state_dict(model_dir)
    # text weights use the standard llama-style names under language_model.
    text_sd = {
        k.replace("model.language_model.", "model."): v
        for k, v in sd.items()
        if k.startswith("model.language_model.")
    }
    if "lm_head.weight" in sd:
        text_sd["lm_head.weight"] = sd["lm_head.weight"]
    params = map_hf_weights(text_cfg, text_sd, dtype)

    v = lambda n: sd["model.visual." + n]
    _t = lambda w: jnp.asarray(np.asarray(w).T, dtype)
    _a = lambda w: jnp.asarray(np.asarray(w), dtype)

    def merger_params(prefix):
        return {
            "ln_w": _a(v(prefix + ".norm.weight")),
            "ln_b": _a(v(prefix + ".norm.bias")),
            "fc1_w": _t(v(prefix + ".linear_fc1.weight")),
            "fc1_b": _a(v(prefix + ".linear_fc1.bias")),
            "fc2_w": _t(v(prefix + ".linear_fc2.weight")),
            "fc2_b": _a(v(prefix + ".linear_fc2.bias")),
        }

    blocks = []
    for i in range(vision_cfg.depth):
        b = f"blocks.{i}."
        blocks.append(
            {
                "ln1_w": _a(v(b + "norm1.weight")), "ln1_b": _a(v(b + "norm1.bias")),
                "ln2_w": _a(v(b + "norm2.weight")), "ln2_b": _a(v(b + "norm2.bias")),
                "qkv_w": _t(v(b + "attn.qkv.weight")), "qkv_b": _a(v(b + "attn.qkv.bias")),
                "proj_w": _t(v(b + "attn.proj.weight")), "proj_b": _a(v(b + "attn.proj.bias")),
                "fc1_w": _t(v(b + "mlp.linear_fc1.weight")), "fc1_b": _a(v(b + "mlp.linear_fc1.bias")),
                "fc2_w": _t(v(b + "mlp.linear_fc2.weight")), "fc2_b": _a(v(b + "mlp.linear_fc2.bias")),
            }
        )
    # Conv3d [E, C, T, P, P] with kernel == stride -> flat matmul over
    # patches laid out (c, t, p_h, p_w) — matching patchify's order
    pw = np.asarray(v("patch_embed.proj.weight"), np.float32)
    vision_params = {
        "patch_w": jnp.asarray(pw.reshape(pw.shape[0], -1).T, dtype),
        "patch_b": _a(v("patch_embed.proj.bias")),
        "pos_embed": _a(v("pos_embed.weight")),
        "blocks": tuple(blocks),
        "merger": merger_params("merger"),
        "deepstack": tuple(
            merger_params(f"deepstack_merger_list.{j}")
            for j in range(len(vision_cfg.deepstack_indexes))
        ),
    }

    tokenizer = None
    try:
        from crane_tpu.tokenizer.autotokenizer import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(model_dir)
    except Exception:
        pass

    rs = tc.get("rope_scaling") or {}
    return Qwen3VLModel(
        text_cfg, vision_cfg, params, vision_params,
        mrope_section=tuple(rs.get("mrope_section", (24, 20, 20))),
        image_token_id=hf["image_token_id"],
        video_token_id=hf.get("video_token_id", -1),
        vision_start_token_id=hf.get("vision_start_token_id", -1),
        tokenizer=tokenizer,
        eos_token_ids=read_eos_ids(model_dir),
        dtype=dtype,
    )
