"""Tensor-parallel inference: run a CausalLM sharded over a device mesh.

The reference is single-device by design (SURVEY.md §2.9); this is the
TPU-native extension that serves models too large for one chip's HBM.
Weights take the Megatron TP layout (`sharding.param_partition_specs`), KV
caches shard their kv-head axis over ``tp``, and the existing jitted
prefill/decode programs run unchanged — GSPMD propagates the shardings and
places the psum/all-gather collectives on ICI (scaling-book recipe:
annotate, let XLA insert collectives).

    mesh = make_mesh(dp=1, tp=8)
    lm = shard_lm(lm, mesh)          # same CausalLM API, distributed arrays
    out = lm.generate(ids, gen)      # identical tokens, 1/8th HBM per chip
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from crane_tpu.models.causal_lm import CausalLM
from crane_tpu.parallel.sharding import cache_partition_spec, shard_params


def shard_cache(cache, mesh: Mesh):
    """Distribute a KVCache pytree: kv heads over ``tp``, slot batch over
    ``dp`` (per-layer length vectors replicate). Quantized layer caches
    store codes FLAT ``[B, S, H*stored]`` — the head-major feature axis
    shards over ``tp`` the same way, and scale planes ``[B, H, S]`` shard
    their head axis."""
    from crane_tpu.ops.kv_cache import GdnLayerCache, QuantLayerKVCache

    spec = cache_partition_spec()
    quant_leaf_specs = {
        "k": P("dp", None, "tp"), "v": P("dp", None, "tp"),
        "k_scale": P("dp", "tp", None), "v_scale": P("dp", "tp", None),
    }

    def put_layer(layer):
        if isinstance(layer, QuantLayerKVCache):
            import dataclasses

            return dataclasses.replace(layer, **{
                name: jax.device_put(
                    getattr(layer, name), NamedSharding(mesh, s))
                for name, s in quant_leaf_specs.items()
            })
        if isinstance(layer, GdnLayerCache):
            # recurrent state [B, Hv, K, V]: v-heads over tp (matches the
            # sharded GDN projections); the few-KB rolling conv window
            # replicates (its [Q|K|V] channel layout is not head-major)
            return GdnLayerCache(
                conv_state=jax.device_put(
                    layer.conv_state, NamedSharding(mesh, P("dp"))),
                recurrent_state=jax.device_put(
                    layer.recurrent_state,
                    NamedSharding(mesh, P("dp", "tp", None, None))),
            )

        def put(x):
            if hasattr(x, "ndim") and x.ndim == 4:  # [B, S, H, D] buffers
                return jax.device_put(x, NamedSharding(mesh, spec))
            return jax.device_put(x, NamedSharding(mesh, P()))

        return jax.tree.map(put, layer)

    out = jax.tree.map(
        put_layer, cache,
        is_leaf=lambda x: isinstance(x, (QuantLayerKVCache, GdnLayerCache)),
    )
    return out


class ShardedCausalLM(CausalLM):
    """CausalLM whose parameters live distributed over ``mesh``; caches from
    :meth:`init_cache` are sharded to match, so every jitted step fn runs
    SPMD with no code changes."""

    def __init__(self, base: CausalLM, mesh: Mesh):
        from crane_tpu.models.fuse import unfuse_params

        # TP shards q/k/v head axes under their own names and tp-splitting a
        # fused wqkv would mix q/k/v columns across chips — unfuse first
        # (fuse=False keeps it that way; the per-chip GEMVs are already
        # 1/tp-sized, so the single-chip fusion win doesn't apply)
        super().__init__(
            base.config,
            shard_params(unfuse_params(base.config, base.params), mesh),
            tokenizer=base.tokenizer,
            eos_token_ids=base.eos_token_ids,
            dtype=base.dtype,
            fuse=False,
        )
        self.mesh = mesh

    def init_cache(self, batch: int, max_seq: int, *, quant_bits=None):
        cache = super().init_cache(batch, max_seq, quant_bits=quant_bits)
        return shard_cache(cache, self.mesh)


def shard_lm(lm: CausalLM, mesh: Mesh) -> ShardedCausalLM:
    """Distribute a loaded CausalLM over ``mesh`` (Megatron TP + dp slots)."""
    return ShardedCausalLM(lm, mesh)
