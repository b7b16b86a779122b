"""Shared decoder-only transformer: config, pure forward functions.

This is the TPU-native counterpart of crane-core's shared modules
(/root/reference/crane-core/src/models/modules/{transformer,attention,ffn}.rs):
pre-norm block = input_ln -> GQA attention -> +res -> post_ln -> SwiGLU -> +res.
One parameterized implementation serves Qwen2.5 (attn bias, no QK-norm),
Qwen3 / Qwen3.5 full-attn layers (per-head QK-RMSNorm, optional output gate),
Hunyuan-dense, Gemma (unit-offset norms, pre/post FFN norms, sliding-window +
dual-theta RoPE via layer_types, logit softcap), and Llama-likes.

Everything is a pure function of (config, params, inputs) — jit/vmap/shard
friendly. Params are plain nested dicts of arrays (or QuantizedWeight leaves).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import jax
import jax.numpy as jnp

from crane_tpu.models.modules.gdn_layer import GdnConfig, gdn_block
from crane_tpu.ops.attention import gqa_attention
from crane_tpu.ops.kv_cache import ConvLayerCache, GdnLayerCache, KVCache, LayerKVCache, QuantLayerKVCache
from crane_tpu.ops.linear import linear
from crane_tpu.ops.norm import rms_norm
from crane_tpu.ops.rope import apply_rope_embeds, rope_table


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    """Static architecture description (hashable; safe as a jit static arg)."""

    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    intermediate_size: int
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    max_position_embeddings: int = 32768
    qk_norm: bool = False
    # Hunyuan applies the per-head QK norms after RoPE; Qwen3/Gemma before
    qk_norm_after_rope: bool = False
    attn_bias: bool = False
    tie_word_embeddings: bool = False
    rope_mode: str = "half"
    partial_rotary_factor: float = 1.0
    # per-layer attention kind: "full" | "sliding" | (hybrid models add more,
    # e.g. "gdn" for Qwen3.5); None means all-"full".
    layer_types: tuple[str, ...] | None = None
    sliding_window: int | None = None
    # Gemma-style extras (logit_softcap = final logits; attn_logit_softcap =
    # inside attention — Gemma2 semantics, gemma4/modeling.rs:1-21)
    logit_softcap: float | None = None
    attn_logit_softcap: float | None = None
    norm_weight_offset: float = 0.0
    embed_scale: float | None = None
    act: str = "silu"
    # Gemma3: norms around both sub-blocks (input_ln -> attn -> post_attn_ln,
    # pre_ffn_ln -> mlp -> post_ffn_ln), local rope theta for sliding layers,
    # query scale decoupled from head_dim, linear rope position scaling
    sandwich_norms: bool = False
    rope_local_theta: float | None = None
    query_scale: float | None = None
    rope_scaling_factor: float = 1.0
    # llama3 NTK-by-parts rope scaling (factor, low_freq_factor,
    # high_freq_factor, original_max_position_embeddings); None = off
    rope_llama3: tuple[float, float, float, int] | None = None
    # Qwen3.5-style sigmoid output gate carried in a 2x-wide q_proj
    attn_output_gate: bool = False
    # hybrid linear-attention (Gated Delta Net) layers ("gdn" in layer_types)
    gdn: GdnConfig | None = None
    # LFM2-style short-conv hybrid layers ("conv" in layer_types)
    conv_l_cache: int = 3
    conv_bias: bool = False
    # sparse MoE MLP (Qwen3-Next): 0 experts = dense MLP everywhere
    num_experts: int = 0
    num_experts_per_tok: int = 8
    moe_intermediate_size: int = 0
    shared_expert_intermediate_size: int = 0
    norm_topk_prob: bool = True
    decoder_sparse_step: int = 1
    mlp_only_layers: tuple[int, ...] = ()
    # sequence parallelism: mesh axis name the KV sequence dim shards over
    # (parallel/sequence.py sets it; decode attention then runs the fused
    # kernel per sequence slab and log-sum-exp merges with collectives)
    sequence_axis: str | None = None

    def is_moe_layer(self, i: int) -> bool:
        return (
            self.num_experts > 0
            and i not in self.mlp_only_layers
            and self.decoder_sparse_step > 0
            and (i + 1) % self.decoder_sparse_step == 0
        )

    @property
    def rot_dim(self) -> int:
        r = int(self.head_dim * self.partial_rotary_factor)
        return r - (r % 2)

    def layer_type(self, i: int) -> str:
        if self.layer_types is None:
            return "full"
        return self.layer_types[i]

    @property
    def attention_layer_indices(self) -> tuple[int, ...]:
        return tuple(
            i for i in range(self.num_layers) if self.layer_type(i) != "gdn"
        )

    @property
    def has_recurrent_layers(self) -> bool:
        """True for hybrid models carrying rolling state (GDN / short-conv).
        Speculative verify needs cache rollback on draft rejection, which a
        positional KV buffer gives for free (rejected entries sit beyond the
        valid length) but a recurrent state cannot — so speculative decoding
        is gated off for these models."""
        return self.layer_types is not None and any(
            t in ("gdn", "conv") for t in self.layer_types
        )


def make_cache(
    cfg: TransformerConfig,
    batch: int,
    max_seq: int,
    dtype=jnp.bfloat16,
    *,
    quant_bits: int | None = None,
) -> KVCache:
    """Allocate the per-layer cache: KV buffers for attention layers,
    conv+recurrent state for GDN layers (mutually exclusive per layer —
    reference qwen3_5/model.rs:494-516)."""
    layers = []
    for i in range(cfg.num_layers):
        if cfg.layer_type(i) == "gdn":
            g = cfg.gdn
            layers.append(
                GdnLayerCache.empty(
                    batch, g.conv_kernel, g.conv_dim, g.num_v_heads,
                    g.head_k_dim, g.head_v_dim, dtype,
                )
            )
        elif cfg.layer_type(i) == "conv":
            layers.append(
                ConvLayerCache.empty(batch, cfg.conv_l_cache, cfg.hidden_size, dtype)
            )
        elif quant_bits is not None:
            layers.append(
                QuantLayerKVCache.empty(
                    batch, max_seq, cfg.num_kv_heads, cfg.head_dim, bits=quant_bits
                )
            )
        else:
            layers.append(
                LayerKVCache.empty(batch, max_seq, cfg.num_kv_heads, cfg.head_dim, dtype)
            )
    return KVCache(layers=tuple(layers), lengths=jnp.zeros((batch,), jnp.int32))


def make_rope_tables(cfg: TransformerConfig) -> dict[str, Any]:
    """Precompute cos/sin tables; Gemma-style models carry two thetas
    (global for full-attention layers, local for sliding ones)."""
    cos, sin = rope_table(
        cfg.rot_dim, cfg.max_position_embeddings, theta=cfg.rope_theta
    )
    if cfg.rope_llama3 is not None:
        factor, low_f, high_f, orig_max = cfg.rope_llama3
        inv = 1.0 / (
            cfg.rope_theta
            ** (jnp.arange(0, cfg.rot_dim, 2, dtype=jnp.float32) / cfg.rot_dim)
        )
        wavelen = 2 * jnp.pi / inv
        low_wl = orig_max / low_f
        high_wl = orig_max / high_f
        smooth = (orig_max / wavelen - low_f) / (high_f - low_f)
        inv_scaled = jnp.where(
            wavelen > low_wl,
            inv / factor,
            jnp.where(wavelen < high_wl, inv, (1 - smooth) * inv / factor + smooth * inv),
        )
        t = jnp.arange(cfg.max_position_embeddings, dtype=jnp.float32)
        freqs = jnp.outer(t, inv_scaled)
        cos, sin = jnp.cos(freqs), jnp.sin(freqs)
    if cfg.rope_scaling_factor != 1.0:
        # linear position scaling: equivalent to dividing positions
        t = jnp.arange(cfg.max_position_embeddings, dtype=jnp.float32)
        inv = 1.0 / (
            cfg.rope_theta
            ** (jnp.arange(0, cfg.rot_dim, 2, dtype=jnp.float32) / cfg.rot_dim)
        )
        freqs = jnp.outer(t / cfg.rope_scaling_factor, inv)
        cos, sin = jnp.cos(freqs), jnp.sin(freqs)
    tables = {"cos": cos, "sin": sin}
    if cfg.rope_local_theta is not None:
        lcos, lsin = rope_table(
            cfg.rot_dim, cfg.max_position_embeddings, theta=cfg.rope_local_theta
        )
        tables["local_cos"] = lcos
        tables["local_sin"] = lsin
    return tables


def _activation(cfg: TransformerConfig, x: jax.Array) -> jax.Array:
    if cfg.act == "silu":
        return jax.nn.silu(x)
    if cfg.act == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    raise ValueError(f"unknown activation {cfg.act!r}")


def mlp_block(cfg: TransformerConfig, p: dict, x: jax.Array) -> jax.Array:
    """SwiGLU: down(act(gate(x)) * up(x)) — reference modules/ffn.rs."""
    if "router" in p:
        return moe_block(cfg, p, x)
    if "gate_up" in p:
        # fused gate|up projection (models/fuse.py): one GEMV over the same
        # bytes — bit-identical to the two separate dots per output column
        gu = linear(x, p["gate_up"])
        half = gu.shape[-1] // 2
        g, u = gu[..., :half], gu[..., half:]
        return linear(_activation(cfg, g) * u, p["down"])
    return linear(_activation(cfg, linear(x, p["gate"])) * linear(x, p["up"]), p["down"])


def _moe_dispatch_dense(cfg: TransformerConfig, p: dict, xt: jax.Array,
                        w: jax.Array, sel: jax.Array) -> jax.Array:
    """Dense one-hot dispatch: every expert computes every token, weighted by
    the sparse combine matrix. Exact and GSPMD-friendly (experts shard over
    tp without re-layout) — the right choice for small token counts (decode)
    and for expert-parallel meshes."""
    T = xt.shape[0]
    cw = (
        jnp.zeros((T, cfg.num_experts), jnp.float32)
        .at[jnp.arange(T)[:, None], sel]
        .add(w)
    ).astype(xt.dtype)
    h = jnp.einsum("td,edi->tei", xt, p["experts_gate"])
    h = _activation(cfg, h) * jnp.einsum("td,edi->tei", xt, p["experts_up"])
    return jnp.einsum("tei,eid,te->td", h, p["experts_down"], cw)


def _moe_dispatch_ragged(cfg: TransformerConfig, p: dict, xt: jax.Array,
                         w: jax.Array, sel: jax.Array) -> jax.Array:
    """Token-sorted segmented-GEMM dispatch via ``lax.ragged_dot``: the T*k
    (token, expert) slots are sorted by expert id, each expert runs one
    contiguous GEMM over its group (MXU-native grouped matmul on TPU), and
    the weighted results scatter-add back per token. FLOPs scale with k/E of
    the dense formulation — the reference's planned scale path, done the
    XLA way instead of with custom kernels."""
    T, E = xt.shape
    K = cfg.num_experts_per_tok
    flat_sel = sel.reshape(-1)                     # [T*K]
    order = jnp.argsort(flat_sel)                  # stable expert-major order
    token_idx = (jnp.arange(T * K) // K)[order]
    xs = xt[token_idx]                             # [T*K, E] sorted by expert
    group_sizes = jnp.bincount(flat_sel, length=cfg.num_experts).astype(jnp.int32)

    h = jax.lax.ragged_dot(xs, p["experts_gate"], group_sizes)
    h = _activation(cfg, h) * jax.lax.ragged_dot(xs, p["experts_up"], group_sizes)
    out = jax.lax.ragged_dot(h, p["experts_down"], group_sizes)  # [T*K, E]
    out = out * w.reshape(-1)[order][:, None].astype(out.dtype)
    return jnp.zeros((T, E), out.dtype).at[token_idx].add(out)


def moe_block(cfg: TransformerConfig, p: dict, x: jax.Array) -> jax.Array:
    """Sparse-MoE SwiGLU with a sigmoid-gated shared expert (Qwen3-Next).

    Routing: full softmax over experts (f32) -> top-k -> optional renorm (HF
    Qwen3NextSparseMoeBlock semantics). Dispatch defaults to the dense
    one-hot formulation: measured on one v5e (64 experts, top-8, E=1024,
    I=512, T=2048 bf16) it runs 2.98 ms/block (~138 TFLOP/s, near MXU peak)
    vs 11.9 ms for the token-sorted ``ragged_dot`` path — XLA's grouped-GEMM
    lowering plus the sort/gather/scatter swamps the 8x FLOP saving at this
    expert count. ``CRANE_MOE_DISPATCH=ragged`` opts into the segmented-GEMM
    path (the win flips at much higher expert counts, e.g. 512-expert top-10,
    where dense wastes 50x FLOPs).
    """
    import os

    B, S, E = x.shape
    T = B * S
    xt = x.reshape(T, E)
    logits = (xt @ p["router"]).astype(jnp.float32)  # [T, n_exp]
    probs = jax.nn.softmax(logits, axis=-1)
    w, sel = jax.lax.top_k(probs, cfg.num_experts_per_tok)
    if cfg.norm_topk_prob:
        w = w / jnp.sum(w, axis=-1, keepdims=True)

    if os.environ.get("CRANE_MOE_DISPATCH", "dense") == "ragged":
        y = _moe_dispatch_ragged(cfg, p, xt, w, sel)
    else:
        y = _moe_dispatch_dense(cfg, p, xt, w, sel)

    if "shared_gate" in p:
        sh = linear(
            _activation(cfg, linear(xt, p["shared_gate_proj"]))
            * linear(xt, p["shared_up"]),
            p["shared_down"],
        )
        gate = jax.nn.sigmoid((xt @ p["shared_gate"]).astype(jnp.float32)).astype(x.dtype)
        y = y + gate * sh
    return y.reshape(B, S, E)


def attention_block(
    cfg: TransformerConfig,
    p: dict,
    x: jax.Array,
    layer_cache,
    positions: jax.Array,
    cache_positions: jax.Array,
    rope: dict,
    *,
    window: int | None = None,
    read_cache: bool = True,
    cache_row=None,
    use_local_rope: bool = False,
    extra_mask=None,
    segments=None,
):
    """GQA attention with QK-norm, RoPE, KV-cache append, optional out-gate.

    ``segments [B, S]``: when the caller's ``extra_mask`` is EXACTLY the
    same-positive-segment bidirectional mask (Gemma3-VLM image blocks), it
    also passes this compact form so fresh prefills stay flash-eligible.

    x: ``[B, S, E]``; positions ``[B, S]``; cache_positions scalar or ``[B]``
    (see LayerKVCache.update). Returns (out ``[B, S, E]``, new_layer_cache).

    ``read_cache=False`` attends over the freshly computed in-context K/V
    instead of the cache buffers (fresh prefill from position 0) — this lets
    the serving engine prefill directly into one slot ``cache_row`` of a
    multi-slot cache without touching other rows.
    """
    B, S, _ = x.shape
    H, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    if "wqkv" in p:
        # fused q|k|v projection (models/fuse.py): one GEMV, sliced after —
        # bit-identical to the three separate dots per output column
        qkv = linear(x, p["wqkv"], p.get("bqkv"))
        sq = H * D * (2 if cfg.attn_output_gate else 1)
        sk = Hkv * D
        q, k, v = qkv[..., :sq], qkv[..., sq : sq + sk], qkv[..., sq + sk :]
    else:
        q = linear(x, p["wq"], p.get("bq"))
        k = linear(x, p["wk"], p.get("bk"))
        v = linear(x, p["wv"], p.get("bv"))

    gate = None
    if cfg.attn_output_gate:
        # 2x-wide q_proj = [query | gate] per head (qwen3_5/modeling.rs:279-294)
        q = q.reshape(B, S, H, 2 * D)
        q, gate = q[..., :D], q[..., D:]
    else:
        q = q.reshape(B, S, H, D)
    k = k.reshape(B, S, Hkv, D)
    v = v.reshape(B, S, Hkv, D)

    def qk_normalize(q, k):
        q = rms_norm(q, p["q_norm"], eps=cfg.rms_norm_eps, weight_offset=cfg.norm_weight_offset)
        k = rms_norm(k, p["k_norm"], eps=cfg.rms_norm_eps, weight_offset=cfg.norm_weight_offset)
        return q, k

    if cfg.qk_norm and not cfg.qk_norm_after_rope:
        q, k = qk_normalize(q, k)

    # rope carries pre-gathered per-token cos/sin (one gather per forward,
    # shared by all layers; also the MRoPE injection point for VLMs)
    cos = rope["local_cos"] if use_local_rope else rope["cos"]
    sin = rope["local_sin"] if use_local_rope else rope["sin"]
    q = apply_rope_embeds(q, cos, sin, mode=cfg.rope_mode)
    k = apply_rope_embeds(k, cos, sin, mode=cfg.rope_mode)

    if cfg.qk_norm and cfg.qk_norm_after_rope:
        q, k = qk_normalize(q, k)

    new_cache = layer_cache.update(k, v, cache_positions, row=cache_row)
    scale = cfg.query_scale if cfg.query_scale is not None else D ** -0.5

    def finish(out):
        # shared epilogue for every attention path: optional sigmoid output
        # gate (2x-wide q_proj carries it), head merge, output projection
        if gate is not None:
            g = jax.nn.sigmoid(gate.astype(jnp.float32)).astype(out.dtype)
            out = out * g
        out = out.reshape(B, S, H * D)
        return linear(out, p["wo"], p.get("bo")), new_cache

    # sequence-parallel decode: the cache's sequence axis is sharded over
    # cfg.sequence_axis (contexts beyond one chip's HBM); run the fused
    # kernel per sequence slab inside shard_map and log-sum-exp merge the
    # partials with 3 small collectives (parallel/sequence.py). Sliding
    # windows never need sp (their KV is bounded) and stay on the local
    # paths below.
    if cfg.sequence_axis is not None and jax.default_backend() == "tpu":
        # Mosaic alignment for the per-slab kernel run: head_dim on the
        # lane axis (fp per-head kernel needs 128; quant flat-dot 64) and
        # 256-aligned sequence slabs. Ineligible shapes fall through to
        # the XLA paths below, which stay correct on sharded buffers
        # (GSPMD inserts the collectives).
        from crane_tpu.parallel.sequence import sequence_mesh

        n_sp = sequence_mesh(cfg.sequence_axis).shape[cfg.sequence_axis]
        slab = new_cache.k.shape[1] // n_sp
        # slabs only need sublane (8) alignment — _local_block shrinks the
        # kernel block to divide the slab; head_dim is the lane axis
        sp_mosaic_ok = (
            slab % 8 == 0
            and (D % 64 == 0 if isinstance(new_cache, QuantLayerKVCache)
                 else D % 128 == 0)
        )
    else:
        sp_mosaic_ok = True  # interpret mode has no alignment constraints
    use_sp = (
        cfg.sequence_axis is not None
        and read_cache
        and S == 1
        and extra_mask is None
        and window is None
        and sp_mosaic_ok
        and (isinstance(new_cache, QuantLayerKVCache)
             or not hasattr(new_cache, "dequant"))
    )
    if use_sp:
        from crane_tpu.parallel.sequence import sp_attention

        out = sp_attention(
            cfg.sequence_axis, new_cache, q, positions[:, 0] + 1,
            scale=scale, logit_softcap=cfg.attn_logit_softcap,
            interpret=jax.default_backend() != "tpu",
        )
        return finish(out)

    use_fused_quant = (
        read_cache
        and S == 1
        and isinstance(new_cache, QuantLayerKVCache)
        and extra_mask is None
        and cfg.sequence_axis is None
        and D % 64 == 0
        and new_cache.max_seq % 256 == 0
        and jax.default_backend() == "tpu"
        and os.environ.get("CRANE_NO_QUANT_ATTN") != "1"
    )
    use_fused_fp = (
        read_cache
        and S == 1
        and not hasattr(new_cache, "dequant")
        and extra_mask is None
        and cfg.sequence_axis is None
        and D % 128 == 0  # per-head kernel: D is the lane axis
        and new_cache.k.shape[1] % 256 == 0
        and jax.default_backend() == "tpu"
        and os.environ.get("CRANE_NO_FP_ATTN") != "1"
    )
    if use_fused_quant or use_fused_fp:
        # decode through the Pallas kernel: quantized caches dequant in VMEM
        # (HBM moves int8/int4 bytes); fp caches get the same live-length
        # index-map clamp, so a row at length L moves ceil(L/block) KV blocks
        # instead of the whole [max_seq] buffer the XLA path reads
        from crane_tpu.ops.pallas.quant_attention import quant_decode_attention

        if use_fused_quant:
            kv_args = (new_cache.k, new_cache.v, new_cache.k_scale,
                       new_cache.v_scale)
            bits, max_t = new_cache.bits, new_cache.max_seq
        else:
            kv_args = (new_cache.k, new_cache.v, None, None)
            bits, max_t = 16, new_cache.k.shape[1]
        out = quant_decode_attention(
            q, *kv_args, positions[:, 0] + 1,
            n_kv_heads=Hkv, bits=bits, scale=scale, window=window,
            logit_softcap=cfg.attn_logit_softcap,
            # largest kernel block that divides the buffer (eligibility
            # guarantees max_t % 256 == 0, but not % 512 — e.g. 768)
            block_t=512 if max_t % 512 == 0 else 256,
        )
        return finish(out)

    # cached-continuation prefill over an int8/int4 quant cache: the kernel
    # reads the flat [B, T, Hkv*stored] codes in storage layout with dequant
    # fused into the logits/output dots (measured 4.6x the XLA path, which
    # dequantizes the WHOLE buffer to bf16 per chunk: 1.13 ms vs 5.2 ms for
    # a 512-chunk at 16K ctx in a 32K buffer, int8). int4 unpacks each
    # block once in-kernel and uses 64-lane value slices per head. fp caches
    # take flash_attention_cached below (its one-transpose layout benches
    # faster than strided [Bk, Hkv, D] in-kernel reads).
    use_cached_quant = (
        read_cache
        and S > 1
        and extra_mask is None
        and segments is None
        and isinstance(new_cache, QuantLayerKVCache)
        and new_cache.bits in (4, 8)
        and cfg.sequence_axis is None
        and S >= 256
        and D % 128 == 0
        and new_cache.k.shape[0] == B
        and new_cache.k.shape[1] % 256 == 0
        and jax.default_backend() == "tpu"
        and os.environ.get("CRANE_NO_FLASH") != "1"
    )
    if use_cached_quant:
        from crane_tpu.ops.pallas.quant_attention import quant_cached_attention

        max_t = new_cache.k.shape[1]
        out = quant_cached_attention(
            q, new_cache.k, new_cache.v, new_cache.k_scale,
            new_cache.v_scale, positions,
            n_kv_heads=Hkv, bits=new_cache.bits, scale=scale, window=window,
            logit_softcap=cfg.attn_logit_softcap,
            block_k=512 if max_t % 512 == 0 else 256,
        )
        return finish(out)

    # sequence-parallel continuation chunk: run the cached-continuation
    # kernel per sequence slab (slab-shifted query positions) and merge the
    # per-row softmax partials — same per-chip cost as ring attention with
    # zero permutes, and peak HBM stays one slab instead of the GSPMD
    # all-gather of the whole sharded cache (parallel/sequence.py)
    use_sp_chunk = (
        cfg.sequence_axis is not None
        and read_cache
        and S > 1
        and extra_mask is None
        and segments is None
        and window is None
        and sp_mosaic_ok
        and (jax.default_backend() != "tpu" or D % 128 == 0)
        and (isinstance(new_cache, QuantLayerKVCache)
             or not hasattr(new_cache, "dequant"))
    )
    if use_sp_chunk:
        from crane_tpu.parallel.sequence import sp_chunk_attention

        out = sp_chunk_attention(
            cfg.sequence_axis, new_cache, q, positions, scale=scale,
            logit_softcap=cfg.attn_logit_softcap,
            interpret=jax.default_backend() != "tpu",
        )
        return finish(out)

    if not read_cache:
        kc, vc = k, v
    elif hasattr(new_cache, "dequant"):
        kc, vc = new_cache.dequant(x.dtype)
    else:
        kc, vc = new_cache.k, new_cache.v

    use_flash = (
        not read_cache  # fresh prefill: positions 0..S-1, S == T
        and (extra_mask is None or segments is not None)
        and S >= 256
        and D % 128 == 0
        and jax.default_backend() == "tpu"
        and os.environ.get("CRANE_NO_FLASH") != "1"
    )
    # cached-continuation prefill over an fp cache (multi-turn chat: a new
    # chunk attends the full cache buffer): the Pallas kernel's live-length
    # index-map clamp moves O(S * ctx) KV bytes, where the XLA path
    # materializes the whole [max_seq] buffer and an [S, max_seq] logit
    # matrix
    use_flash_cached = (
        read_cache
        and S > 1
        and extra_mask is None
        and segments is None
        and not hasattr(new_cache, "dequant")  # quant caches handled above
        and cfg.sequence_axis is None
        and S >= 256
        and D % 128 == 0
        and new_cache.k.shape[0] == B
        and new_cache.k.shape[1] % 256 == 0
        and jax.default_backend() == "tpu"
        and os.environ.get("CRANE_NO_FLASH") != "1"
    )
    if use_flash:
        from crane_tpu.ops.pallas.flash_attention import flash_attention_causal

        out = flash_attention_causal(
            q, kc, vc, segments, scale=scale, window=window,
            softcap=cfg.attn_logit_softcap,
        )
    elif use_flash_cached:
        from crane_tpu.ops.pallas.flash_attention import flash_attention_cached

        max_t = new_cache.k.shape[1]
        out = flash_attention_cached(
            q, kc, vc, positions, scale=scale, window=window,
            softcap=cfg.attn_logit_softcap,
            block_k=512 if max_t % 512 == 0 else 256,
        )
    else:
        out = gqa_attention(
            q, kc, vc, positions,
            scale=scale,
            window=window,
            logit_softcap=cfg.attn_logit_softcap,
            extra_mask=extra_mask,
        )
    return finish(out)


def short_conv_block(
    cfg: TransformerConfig,
    p: dict,
    x: jax.Array,
    layer_cache,
    *,
    decode: bool,
    cache_row=None,
    active: jax.Array | None = None,
    true_lengths: jax.Array | None = None,
    continuation: bool = False,
):
    """LFM2 short-conv mixer: in_proj -> (B, C, x) -> depthwise causal conv
    of B*x (no activation) -> C * conv_out -> out_proj, with a rolling
    L-window state for decode (HF Lfm2ShortConv semantics). ``continuation``
    re-enters the saved conv window (chunked prefill == whole prefill)."""
    from crane_tpu.ops.gdn import causal_conv1d, causal_conv1d_update

    bcx = linear(x, p["in_proj"], p.get("in_bias"))
    b, c, xx = jnp.split(bcx, 3, axis=-1)
    bx = b * xx
    if decode:
        y, new_state = causal_conv1d_update(
            bx[:, 0], layer_cache.conv_state, p["conv_w"], activation=False
        )
        conv_out = y[:, None]
    else:
        conv_out, new_state = causal_conv1d(
            bx, p["conv_w"], activation=False, true_lengths=true_lengths,
            init_window=layer_cache.conv_state if continuation else None,
        )
    if "conv_b" in p:
        conv_out = conv_out + p["conv_b"]
    out = linear(c * conv_out, p["out_proj"], p.get("out_bias"))
    new_cache = layer_cache.replace_rows(new_state, row=cache_row, active=active)
    return out, new_cache


def decoder_layer(
    cfg: TransformerConfig,
    p: dict,
    x: jax.Array,
    layer_cache,
    positions: jax.Array,
    cache_positions: jax.Array,
    rope: dict,
    *,
    layer_idx: int,
    read_cache: bool = True,
    cache_row=None,
    active: jax.Array | None = None,
    true_lengths: jax.Array | None = None,
    extra_mask=None,
    segments=None,
):
    ltype = cfg.layer_type(layer_idx)
    h = rms_norm(x, p["input_ln"], eps=cfg.rms_norm_eps, weight_offset=cfg.norm_weight_offset)
    if ltype == "gdn":
        # symmetric with attention semantics: S == 1 while reading cached
        # state is decode; S > 1 while reading cached state is a
        # continuation chunk (re-enters the saved conv window + recurrent
        # state, so chunked prefill == whole prefill); read_cache=False is
        # a fresh slot/generate prefill restarting from zero state. Over a
        # zeroed cache, continuation == fresh prefill (zero init state).
        decode = read_cache and x.shape[1] == 1
        continuation = read_cache and x.shape[1] > 1 and cache_row is None
        attn_out, new_cache = gdn_block(
            cfg.gdn, p["gdn"], h, layer_cache,
            eps=cfg.rms_norm_eps, decode=decode, cache_row=cache_row,
            active=active if decode else None,
            true_lengths=true_lengths if not decode else None,
            continuation=continuation,
        )
    elif ltype == "conv":
        decode = read_cache and x.shape[1] == 1
        continuation = read_cache and x.shape[1] > 1 and cache_row is None
        attn_out, new_cache = short_conv_block(
            cfg, p["conv"], h, layer_cache,
            decode=decode, cache_row=cache_row,
            active=active if decode else None,
            true_lengths=true_lengths if not decode else None,
            continuation=continuation,
        )
    else:
        window = cfg.sliding_window if ltype == "sliding" else None
        attn_out, new_cache = attention_block(
            cfg, p["attn"], h, layer_cache, positions, cache_positions, rope,
            window=window, read_cache=read_cache, cache_row=cache_row,
            use_local_rope=(ltype == "sliding" and cfg.rope_local_theta is not None),
            extra_mask=extra_mask, segments=segments,
        )
    nrm = lambda t, w: rms_norm(t, w, eps=cfg.rms_norm_eps, weight_offset=cfg.norm_weight_offset)
    if cfg.sandwich_norms:
        # Gemma3: residual + post_ln(attn_out); pre/post ffn norms
        x = x + nrm(attn_out, p["post_attn_ln"])
        h = nrm(x, p["pre_ffn_ln"])
        x = x + nrm(mlp_block(cfg, p["mlp"], h), p["post_ffn_ln"])
    else:
        x = x + attn_out
        h = nrm(x, p["post_ln"])
        x = x + mlp_block(cfg, p["mlp"], h)
    return x, new_cache


def forward_hidden(
    cfg: TransformerConfig,
    params: dict,
    tokens: jax.Array,
    cache: KVCache,
    cache_positions: jax.Array,
    rope: dict,
    *,
    read_cache: bool = True,
    cache_row=None,
    active: jax.Array | None = None,
    inputs_embeds: jax.Array | None = None,
    true_lengths: jax.Array | None = None,
    rope_embeds: dict | None = None,
    deepstack: tuple | None = None,
    extra_mask: jax.Array | None = None,
    segments: jax.Array | None = None,
    remat: bool = False,
) -> tuple[jax.Array, KVCache]:
    """Token ids ``[B, S]`` -> final hidden states ``[B, S, E]`` + new cache.

    ``cache_positions``: scalar start (prefill; all rows aligned) or ``[B]``
    per-row write positions (batched decode, S == 1). ``active [B]`` masks
    rows out of a batched decode: their KV writes are dropped and their
    lengths don't advance (static-slot serving). ``inputs_embeds`` bypasses
    the embedding lookup (VLM/audio embed splicing). ``rope_embeds`` overrides
    the per-token cos/sin (MRoPE). ``deepstack`` = (mask ``[B, S]``, embeds
    ``[n_layers, n_visual, E]``): visual features added to the hidden states
    after the first n layers (Qwen3-VL DeepStack).
    """
    B, S = tokens.shape
    if cache_positions.ndim == 0:
        positions = cache_positions[None, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
        positions = jnp.broadcast_to(positions, (B, S))
        write_pos = cache_positions
        new_lengths = cache.lengths + S
    else:
        positions = cache_positions[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
        if active is not None:
            write_pos = jnp.where(active, cache_positions, cache.max_seq)
            new_lengths = cache.lengths + active.astype(jnp.int32)
        else:
            write_pos = cache_positions
            new_lengths = cache.lengths + S

    if rope_embeds is None:
        rope_embeds = {"cos": rope["cos"][positions], "sin": rope["sin"][positions]}
        if "local_cos" in rope:
            rope_embeds["local_cos"] = rope["local_cos"][positions]
            rope_embeds["local_sin"] = rope["local_sin"][positions]

    if inputs_embeds is not None:
        x = inputs_embeds
    else:
        x = params["embed"][tokens]
    if cfg.embed_scale is not None:
        x = (x.astype(jnp.float32) * cfg.embed_scale).astype(x.dtype)

    new_layers = list(cache.layers)
    for i in range(cfg.num_layers):
        def layer_fn(p, x, lc, *, _i=i):
            return decoder_layer(
                cfg, p, x, lc,
                positions, write_pos, rope_embeds, layer_idx=_i,
                read_cache=read_cache, cache_row=cache_row, active=active,
                true_lengths=true_lengths, extra_mask=extra_mask,
                segments=segments,
            )
        if remat:
            # training: recompute each layer's activations in the backward
            # pass instead of saving them — activation memory drops from
            # O(layers * S * E) to O(S * E) per stored boundary, the
            # standard HBM-for-FLOPs trade on TPU (jax.checkpoint)
            layer_fn = jax.checkpoint(layer_fn)
        x, new_layers[i] = layer_fn(params["layers"][i], x, cache.layers[i])
        if deepstack is not None and i < deepstack[1].shape[0]:
            mask, embeds = deepstack
            # add visual features at the visual positions (VLM prefill;
            # mask selects exactly embeds.shape[1] slots)
            b_idx, s_idx = jnp.where(mask, size=embeds[i].shape[0])
            x = x.at[b_idx, s_idx].add(embeds[i].astype(x.dtype))

    x = rms_norm(x, params["final_norm"], eps=cfg.rms_norm_eps, weight_offset=cfg.norm_weight_offset)
    new_cache = KVCache(layers=tuple(new_layers), lengths=new_lengths)
    return x, new_cache


def lm_logits(cfg: TransformerConfig, params: dict, hidden: jax.Array) -> jax.Array:
    """Project hidden states to vocab logits (tied or separate head), f32."""
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    if hasattr(head, "dequant"):  # QuantizedWeight lm_head
        logits = linear(hidden, head).astype(jnp.float32)
        if logits.shape[-1] != cfg.vocab_size:  # vocab padded for the kernel
            logits = logits[..., : cfg.vocab_size]
    else:
        logits = jnp.dot(
            hidden, head.astype(hidden.dtype), preferred_element_type=jnp.float32
        )
    if cfg.logit_softcap is not None:
        logits = jnp.tanh(logits / cfg.logit_softcap) * cfg.logit_softcap
    return logits
