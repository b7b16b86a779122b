"""Sequence parallelism: shard the KV cache's sequence axis over ICI.

The reference's long-context strategy is algorithmic and single-device
(hybrid GDN layers + int4 KV, SURVEY.md §5.7); this module is the stated
TPU-native extension: when a context no longer fits one chip's HBM, the KV
buffers shard their SEQUENCE axis over an ``sp`` mesh axis — n chips hold an
n-times-longer context. Weights replicate (sp is the long-context lever;
``tp`` in ``parallel/inference.py`` is the big-model lever).

Decode attention is where sp needs actual communication, and it needs very
little: softmax is a log-sum-exp reduction, so each device runs the SAME
fused Pallas decode kernel (``quant_attention.py``) over its local slab —
including the live-length DMA clamp, so only slabs holding live tokens move
HBM bytes — and returns its normalized partial plus per-row (max, sum)
stats. One ``pmax`` and two ``psum`` over [B, Hq]-sized arrays merge the
partials exactly:

    out = sum_i out_i * w_i / sum_i w_i,   w_i = l_i * exp(m_i - max m)

Everything else (prefill reads/writes, cache append) stays plain XLA under
GSPMD, which partitions the sharded-axis scatter/softmax itself.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from crane_tpu.models.causal_lm import CausalLM
from crane_tpu.ops.kv_cache import LayerKVCache, QuantLayerKVCache

# attention_block (traced under jit with a static config) looks the mesh up
# by axis name at trace time; one sp mesh per process (the serving reality)
_MESHES: dict[str, Mesh] = {}


def register_sequence_mesh(axis: str, mesh: Mesh) -> None:
    _MESHES[axis] = mesh


def sequence_mesh(axis: str) -> Mesh:
    return _MESHES[axis]


def make_sp_mesh(n: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n, (len(devices), n)
    return Mesh(np.asarray(devices[:n]), axis_names=("sp",))


def _merge(q, out, m, l, axis):
    """Log-sum-exp combine of per-shard normalized outputs (exact)."""
    m_max = jax.lax.pmax(m, axis)
    w = jnp.where(jnp.isfinite(m), l * jnp.exp(m - m_max), 0.0)  # [B, Hq]
    denom = jax.lax.psum(w, axis)
    num = jax.lax.psum(out.astype(jnp.float32) * w[:, None, :, None], axis)
    denom = jnp.maximum(denom, 1e-30)[:, None, :, None]
    return (num / denom).astype(q.dtype)


def _local_block(block_t, t_local):
    bt = min(block_t, t_local)
    while t_local % bt:
        bt //= 2
    return bt


def sp_decode_attention(
    q, k, v, k_scale, v_scale, lengths, *, axis, bits, scale,
    logit_softcap=None, block_t=512, interpret=False,
):
    """Runs INSIDE shard_map: ``k``/``v`` (+ scales for quant caches) are
    this device's contiguous sequence slab; ``lengths`` are the GLOBAL live
    counts. Slabs entirely past a row's live region compute nothing and
    move no KV bytes (local length clamps to 0 and the kernel's index-map
    clamp skips the DMAs)."""
    from crane_tpu.ops.pallas.quant_attention import decode_attention_with_stats

    idx = jax.lax.axis_index(axis)
    t_local = k.shape[1]
    local_len = jnp.clip(
        lengths.astype(jnp.int32) - idx * t_local, 0, t_local)
    out, m, l = decode_attention_with_stats(
        q, k, v, k_scale, v_scale, local_len, bits=bits, scale=scale,
        logit_softcap=logit_softcap, block_t=_local_block(block_t, t_local),
        interpret=interpret)
    return _merge(q, out, m, l, axis)


def sp_cached_attention(
    q, k, v, k_scale, v_scale, positions, *, axis, bits, scale,
    logit_softcap=None, block_q=256, block_k=512, interpret=False,
):
    """Runs INSIDE shard_map: continuation-chunk prefill over this device's
    sequence slab. Query positions shift into slab-local coordinates (rows
    before the slab go negative and attend nothing); partials merge with
    the same log-sum-exp combine as decode, per query row. Per-chip cost
    equals ring attention's (chunk x slab) with zero permutes — the chunk
    is small, so replicating queries beats rotating KV slabs, and peak HBM
    stays at one slab instead of the GSPMD all-gather of the full cache."""
    from crane_tpu.ops.pallas.quant_attention import cached_attention_with_stats

    idx = jax.lax.axis_index(axis)
    t_local = k.shape[1]
    pos_local = positions.astype(jnp.int32) - idx * t_local
    out, m, l = cached_attention_with_stats(
        q, k, v, k_scale, v_scale, pos_local, bits=bits, scale=scale,
        logit_softcap=logit_softcap, block_q=block_q,
        block_k=_local_block(block_k, t_local), interpret=interpret)
    # per-row merge: m/l [B, Hq, S], out [B, S, Hq, D]
    m_max = jax.lax.pmax(m, axis)
    w = jnp.where(l > 0.0, l * jnp.exp(m - m_max), 0.0)  # [B, Hq, S]
    denom = jax.lax.psum(w, axis)
    wt = w.transpose(0, 2, 1)[..., None]  # [B, S, Hq, 1]
    num = jax.lax.psum(out.astype(jnp.float32) * wt, axis)
    denom = jnp.maximum(denom, 1e-30).transpose(0, 2, 1)[..., None]
    return (num / denom).astype(q.dtype)


def sp_chunk_attention(cfg_axis, layer_cache, q, positions, *, scale,
                       logit_softcap=None, interpret=False):
    """shard_map entry for the cached-continuation chunk under sp."""
    mesh = sequence_mesh(cfg_axis)
    ax = cfg_axis
    if isinstance(layer_cache, QuantLayerKVCache):
        bits = layer_cache.bits
        fn = jax.shard_map(
            lambda qq, kk, vv, ks, vs, pp: sp_cached_attention(
                qq, kk, vv, ks, vs, pp, axis=ax, bits=bits, scale=scale,
                logit_softcap=logit_softcap, interpret=interpret),
            mesh=mesh,
            in_specs=(P(), P(None, ax, None), P(None, ax, None),
                      P(None, None, ax), P(None, None, ax), P()),
            out_specs=P(),
            check_vma=False,
        )
        return fn(q, layer_cache.k, layer_cache.v, layer_cache.k_scale,
                  layer_cache.v_scale, positions)
    fn = jax.shard_map(
        lambda qq, kk, vv, pp: sp_cached_attention(
            qq, kk, vv, None, None, pp, axis=ax, bits=16, scale=scale,
            logit_softcap=logit_softcap, interpret=interpret),
        mesh=mesh,
        in_specs=(P(), P(None, ax, None, None), P(None, ax, None, None), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(q, layer_cache.k, layer_cache.v, positions)


def sp_attention(cfg_axis, layer_cache, q, kv_valid, *, scale,
                 logit_softcap=None, interpret=False):
    """shard_map entry used by attention_block when ``cfg.sequence_axis``
    is set: dispatches on the cache type and builds the sharded call."""
    mesh = sequence_mesh(cfg_axis)
    ax = cfg_axis
    if isinstance(layer_cache, QuantLayerKVCache):
        bits = layer_cache.bits
        fn = jax.shard_map(
            lambda qq, kk, vv, ks, vs, ll: sp_decode_attention(
                qq, kk, vv, ks, vs, ll, axis=ax, bits=bits, scale=scale,
                logit_softcap=logit_softcap, interpret=interpret),
            mesh=mesh,
            in_specs=(P(), P(None, ax, None), P(None, ax, None),
                      P(None, None, ax), P(None, None, ax), P()),
            out_specs=P(),
            check_vma=False,  # pallas out_shapes carry no vma annotations
        )
        return fn(q, layer_cache.k, layer_cache.v, layer_cache.k_scale,
                  layer_cache.v_scale, kv_valid)
    fn = jax.shard_map(
        lambda qq, kk, vv, ll: sp_decode_attention(
            qq, kk, vv, None, None, ll, axis=ax, bits=16, scale=scale,
            logit_softcap=logit_softcap, interpret=interpret),
        mesh=mesh,
        in_specs=(P(), P(None, ax, None, None), P(None, ax, None, None), P()),
        out_specs=P(),
        check_vma=False,  # pallas out_shapes carry no vma annotations
    )
    return fn(q, layer_cache.k, layer_cache.v, kv_valid)


def _cache_spec_tree(cache, ax):
    """NamedSharding placement for a KVCache pytree: sequence axis over
    ``ax``, everything else replicated."""

    def put_layer(layer, mesh):
        if isinstance(layer, QuantLayerKVCache):
            return dataclasses.replace(
                layer,
                k=jax.device_put(layer.k, NamedSharding(mesh, P(None, ax, None))),
                v=jax.device_put(layer.v, NamedSharding(mesh, P(None, ax, None))),
                k_scale=jax.device_put(
                    layer.k_scale, NamedSharding(mesh, P(None, None, ax))),
                v_scale=jax.device_put(
                    layer.v_scale, NamedSharding(mesh, P(None, None, ax))),
            )
        if isinstance(layer, LayerKVCache):
            return dataclasses.replace(
                layer,
                k=jax.device_put(
                    layer.k, NamedSharding(mesh, P(None, ax, None, None))),
                v=jax.device_put(
                    layer.v, NamedSharding(mesh, P(None, ax, None, None))),
            )
        return jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), layer)

    return put_layer


class SequenceShardedCausalLM(CausalLM):
    """CausalLM whose KV caches shard their sequence axis over an ``sp``
    mesh: a max_seq beyond one chip's HBM splits across n chips. Weights
    replicate; the decode step's attention runs the fused kernel per shard
    and merges with 3 small collectives (``sp_attention``)."""

    def __init__(self, base: CausalLM, mesh: Mesh, axis: str = "sp"):
        register_sequence_mesh(axis, mesh)
        cfg = dataclasses.replace(base.config, sequence_axis=axis)
        params = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), base.params)
        super().__init__(
            cfg, params,
            tokenizer=base.tokenizer,
            eos_token_ids=base.eos_token_ids,
            dtype=base.dtype,
        )
        self.mesh = mesh
        self.axis = axis

    def init_cache(self, batch: int, max_seq: int, *, quant_bits=None):
        n = self.mesh.shape[self.axis]
        # round the (power-of-two-bucketed) max_seq up to a slab multiple so
        # non-power-of-two sp degrees work; on real chips 256-multiple slabs
        # give the Mosaic kernel aligned blocks (attention_block falls back
        # to XLA when they are not)
        max_seq = -(-max_seq // n) * n
        cache = super().init_cache(batch, max_seq, quant_bits=quant_bits)
        put = _cache_spec_tree(cache, self.axis)
        replicate = lambda l: jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(self.mesh, P())), l)
        layers = tuple(
            # sliding-window layers never take the sp decode path (their KV
            # is window-bounded); keep their buffers replicated so the XLA
            # window path stays chip-local instead of gathering a sharded
            # buffer every step
            replicate(l) if self.config.layer_type(i) == "sliding" else
            put(l, self.mesh)
            for i, l in enumerate(cache.layers)
        )
        lengths = jax.device_put(
            cache.lengths, NamedSharding(self.mesh, P()))
        return dataclasses.replace(cache, layers=layers, lengths=lengths)


def sp_shard_lm(lm: CausalLM, mesh: Mesh) -> SequenceShardedCausalLM:
    """Shard a loaded CausalLM's KV sequence axis over ``mesh`` ("sp")."""
    return SequenceShardedCausalLM(lm, mesh)
