"""Multi-chip sharding: mesh construction + parameter/cache sharding rules.

The reference is single-device by design (SURVEY.md §2.9); scaling here is the
TPU-native extension: a ``jax.sharding.Mesh`` over ICI with GSPMD annotations.
Weights follow the Megatron tensor-parallel layout (attention heads and FFN
hidden sharded over ``tp``; vocab sharded embedding/head), batch over ``dp``;
XLA inserts the psum/all-gather collectives (scaling-book recipe: annotate,
let XLA place collectives, profile).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = dp * tp
    assert len(devices) >= n, (len(devices), n)
    arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def param_partition_specs(params: dict) -> dict:
    """PartitionSpec tree matching the crane_tpu param tree layout.

    Linear weights are stored ``[in, out]``:
      wq/wk/wv ``[E, H*D]`` -> shard out (heads) over tp
      wo ``[H*D, E]``       -> shard in  (heads) over tp
      gate/up ``[E, I]``    -> shard out over tp
      down ``[I, E]``       -> shard in  over tp
      embed ``[V, E]``      -> shard vocab over tp
      lm_head ``[E, V]``    -> shard vocab over tp
      norms / biases        -> replicated
    """

    def mlp_spec(mlp: dict) -> dict:
        if "router" in mlp:
            # expert parallelism: shard the expert axis over tp (the stacked
            # expert weights are [n_experts, in, out]); router replicated
            spec = {
                "router": P(),
                "experts_gate": P("tp", None, None),
                "experts_up": P("tp", None, None),
                "experts_down": P("tp", None, None),
            }
            for k in ("shared_gate_proj", "shared_up"):
                if k in mlp:
                    spec[k] = P(None, "tp")
            if "shared_down" in mlp:
                spec["shared_down"] = P("tp", None)
            if "shared_gate" in mlp:
                spec["shared_gate"] = P()
            return spec
        return {"gate": P(None, "tp"), "up": P(None, "tp"), "down": P("tp", None)}

    def gdn_spec(gdn: dict) -> dict:
        """Hybrid GDN layer (fused HF projections): the in_proj_qkvz /
        in_proj_ba out-columns are k-head-major blocks, so sharding the out
        axis over ``tp`` splits whole k-head groups (tp must divide
        num_k_heads); per-v-head vectors shard to match; out_proj reduces
        over sharded v-heads (GSPMD inserts the psum, Megatron row
        layout). conv_w stays replicated — the depthwise conv runs per
        part with static channel slices (gdn_layer.py), and the rolling
        conv state is a few KB. GGUF split projections are fused into this
        same layout at load, so every checkpoint format shards."""
        spec = {
            "in_proj_qkvz": P(None, "tp"),
            "in_proj_ba": P(None, "tp"),
            "A_log": P("tp"),
            "dt_bias": P("tp"),
            "out_proj": P("tp", None),
            "conv_w": P(),
            "norm": P(),
        }
        return {k: spec.get(k, P()) for k in gdn}

    def layer_spec(layer: dict) -> dict:
        out = {
            "mlp": mlp_spec(layer["mlp"]),
            "input_ln": P(),
        }
        if "post_ln" in layer:
            out["post_ln"] = P()
        if "gdn" in layer:
            out["gdn"] = gdn_spec(layer["gdn"])
        if "attn" in layer:
            attn = {
                "wq": P(None, "tp"), "wk": P(None, "tp"), "wv": P(None, "tp"),
                "wo": P("tp", None),
            }
            for b in ("bq", "bk", "bv"):
                if b in layer["attn"]:
                    attn[b] = P("tp")
            for nrm in ("q_norm", "k_norm"):
                if nrm in layer["attn"]:
                    attn[nrm] = P()
            out["attn"] = attn
        for k in layer:
            if k not in out:
                out[k] = jax.tree.map(lambda _: P(), layer[k])
        return out

    spec: dict[str, Any] = {
        "embed": P("tp", None),
        "layers": tuple(layer_spec(l) for l in params["layers"]),
        "final_norm": P(),
    }
    if "lm_head" in params:
        spec["lm_head"] = P(None, "tp")
    return spec


def shard_params(params: dict, mesh: Mesh) -> dict:
    specs = param_partition_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def cache_partition_spec() -> P:
    """KV buffers ``[B, S, H, D]``: batch over dp, kv heads over tp."""
    return P("dp", None, "tp", None)


def token_partition_spec() -> P:
    return P("dp", None)
