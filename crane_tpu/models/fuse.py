"""Decode-GEMV projection fusion: wq|wk|wv -> wqkv, gate|up -> gate_up.

The reference merges QKV into one Linear
(/root/reference/crane-core/src/models/qwen3/modeling.rs:186-202); here it is
a pure parameter-tree transform — ``attention_block``/``mlp_block`` read the
fused weight when present and slice the result, which is bit-identical to the
unfused matmuls (same contraction per output column).

MEASURED NEGATIVE on TPU, so OFF by default (CRANE_FUSE_PROJ=1 opts in): an
interleaved same-session A/B on one v5e chip put Qwen3-0.6B bf16 fused decode
at 403.9 tok/s vs 417.1 tok/s unfused — XLA pipelines the three separate
GEMVs' HBM streams better than one wide dot, so the CUDA-era launch-overhead
argument does not transfer. Kept as an option because the tradeoff is
shape-dependent (and the transform doubles as the canonical fused-layout
reader for checkpoints that SHIP merged QKV).

Fusion applies to dense arrays and to :class:`QuantizedWeight` leaves with
identical (bits, block, packed) metadata — concatenation along the output
axis is exact for both per-channel and blockwise scales.

Tensor parallelism shards q/k/v head axes separately, so ``shard_lm`` calls
:func:`unfuse_params` first; sequence parallelism replicates weights and
keeps the fused layout.
"""

from __future__ import annotations

import jax.numpy as jnp

from crane_tpu.ops.linear import QuantizedWeight


def _fusable_quant(ws: list) -> bool:
    w0 = ws[0]
    return all(
        isinstance(w, QuantizedWeight)
        and w.bits == w0.bits
        and w.block == w0.block
        and w.packed == w0.packed
        and w.codes.shape[0] == w0.codes.shape[0]
        for w in ws
    )


def _concat_out(ws: list):
    """Concatenate weights along the output axis; None if not fusable."""
    if all(isinstance(w, jnp.ndarray) or hasattr(w, "dtype") for w in ws) and not any(
        isinstance(w, QuantizedWeight) for w in ws
    ):
        if len({w.dtype for w in ws}) != 1 or any(w.ndim != 2 for w in ws):
            return None
        return jnp.concatenate(ws, axis=1)
    if _fusable_quant(ws):
        w0 = ws[0]
        return QuantizedWeight(
            codes=jnp.concatenate([w.codes for w in ws], axis=1),
            scales=jnp.concatenate([w.scales for w in ws], axis=1),
            block=w0.block,
            bits=w0.bits,
        )
    return None


def _split_out(w, sizes: list[int]):
    """Inverse of :func:`_concat_out`."""
    offs = [0]
    for s in sizes:
        offs.append(offs[-1] + s)
    if isinstance(w, QuantizedWeight):
        return [
            QuantizedWeight(
                codes=w.codes[:, lo:hi], scales=w.scales[:, lo:hi],
                block=w.block, bits=w.bits,
            )
            for lo, hi in zip(offs, offs[1:])
        ]
    return [w[:, lo:hi] for lo, hi in zip(offs, offs[1:])]


def _out_dim(w) -> int:
    return w.shape[1]


def fuse_layer(layer: dict) -> dict:
    """Fuse one decoder layer's projections (returns a new dict; the input
    is never mutated). Layers whose weights are not fusable (mixed dtypes,
    partial biases, MoE) pass through unchanged. Split sizes are derived
    from the config at forward time, so the params tree stays pure arrays."""
    out = dict(layer)
    attn = layer.get("attn")
    if attn is not None and all(k in attn for k in ("wq", "wk", "wv")):
        biases = [attn.get(b) for b in ("bq", "bk", "bv")]
        n_bias = sum(b is not None for b in biases)
        fused = _concat_out([attn["wq"], attn["wk"], attn["wv"]])
        if fused is not None and n_bias in (0, 3):
            a = {k: v for k, v in attn.items()
                 if k not in ("wq", "wk", "wv", "bq", "bk", "bv")}
            a["wqkv"] = fused
            if n_bias == 3:
                a["bqkv"] = jnp.concatenate(biases)
            out["attn"] = a
    mlp = layer.get("mlp")
    if (
        mlp is not None
        and "gate" in mlp and "up" in mlp and "router" not in mlp
        and _out_dim(mlp["gate"]) == _out_dim(mlp["up"])
    ):
        fused = _concat_out([mlp["gate"], mlp["up"]])
        if fused is not None:
            m = {k: v for k, v in mlp.items() if k not in ("gate", "up")}
            m["gate_up"] = fused
            out["mlp"] = m
    return out


def unfuse_layer(cfg, layer: dict) -> dict:
    out = dict(layer)
    attn = layer.get("attn")
    if attn is not None and "wqkv" in attn:
        a = {k: v for k, v in attn.items() if k not in ("wqkv", "bqkv")}
        H, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        sq = H * D * (2 if cfg.attn_output_gate else 1)
        sizes = [sq, Hkv * D, Hkv * D]
        a["wq"], a["wk"], a["wv"] = _split_out(attn["wqkv"], sizes)
        if "bqkv" in attn:
            b = attn["bqkv"]
            a["bq"] = b[:sq]
            a["bk"] = b[sq : sq + sizes[1]]
            a["bv"] = b[sq + sizes[1] :]
        out["attn"] = a
    mlp = layer.get("mlp")
    if mlp is not None and "gate_up" in mlp:
        m = {k: v for k, v in mlp.items() if k != "gate_up"}
        half = _out_dim(mlp["gate_up"]) // 2
        m["gate"], m["up"] = _split_out(mlp["gate_up"], [half, half])
        out["mlp"] = m
    return out


def fuse_params(params: dict) -> dict:
    """Fuse every decoder layer's projections; other entries untouched."""
    if "layers" not in params:
        return params
    new = dict(params)
    new["layers"] = tuple(fuse_layer(l) for l in params["layers"])
    return new


def unfuse_params(cfg, params: dict) -> dict:
    if "layers" not in params:
        return params
    new = dict(params)
    new["layers"] = tuple(unfuse_layer(cfg, l) for l in params["layers"])
    return new
