"""Gated-Delta-Net layer: projections, conv, recurrence, gated norm.

Reference: /root/reference/crane-core/src/ops/gdn/layer.rs:69-137 —
in_proj -> causal conv1d (k=4) -> split/expand heads -> L2-norm Q,K ->
beta/g -> recurrence -> RmsNormGated(y, z) -> out_proj. Head grouping follows
the HF "interleaved" ordering (VHeadOrder::Interleaved, layer.rs:171-186):
each k-head block carries [q | k | v_group | z_group]; GGUF's chunked order is
normalized to this layout at load time, so the compute path has ONE ordering
and the reference's silent-head-mispairing hazard (config.rs:13-22) is
confined to the GGUF loader.

Numerics match HF transformers Qwen3NextGatedDeltaNet (the parity oracle).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from crane_tpu.ops.gdn import (
    causal_conv1d,
    causal_conv1d_update,
    compute_beta_g,
    gdn_decode_step,
    gdn_recurrence,
)
from crane_tpu.ops.kv_cache import GdnLayerCache
from crane_tpu.ops.linear import linear
from crane_tpu.ops.norm import gated_rms_norm


@dataclasses.dataclass(frozen=True)
class GdnConfig:
    num_v_heads: int
    num_k_heads: int
    head_k_dim: int
    head_v_dim: int
    conv_kernel: int = 4

    @property
    def key_dim(self) -> int:
        return self.num_k_heads * self.head_k_dim

    @property
    def value_dim(self) -> int:
        return self.num_v_heads * self.head_v_dim

    @property
    def conv_dim(self) -> int:
        return 2 * self.key_dim + self.value_dim

    @property
    def v_per_group(self) -> int:
        return self.num_v_heads // self.num_k_heads


def split_qkvz_ba(g: GdnConfig, qkvz: jax.Array, ba: jax.Array):
    """HF fix_query_key_value_ordering: per-k-head grouped projection output
    -> (q [B,S,Hk,K], k [B,S,Hk,K], v [B,S,Hv,V], z [B,S,Hv,V], b/a [B,S,Hv])."""
    B, S, _ = qkvz.shape
    Hk, K, V, vg = g.num_k_heads, g.head_k_dim, g.head_v_dim, g.v_per_group
    blk = qkvz.reshape(B, S, Hk, 2 * K + 2 * vg * V)
    q = blk[..., :K]
    k = blk[..., K : 2 * K]
    v = blk[..., 2 * K : 2 * K + vg * V].reshape(B, S, g.num_v_heads, V)
    z = blk[..., 2 * K + vg * V :].reshape(B, S, g.num_v_heads, V)
    bab = ba.reshape(B, S, Hk, 2 * vg)
    b = bab[..., :vg].reshape(B, S, g.num_v_heads)
    a = bab[..., vg:].reshape(B, S, g.num_v_heads)
    return q, k, v, z, b, a


def gdn_block(
    gcfg: GdnConfig,
    p: dict,
    x: jax.Array,
    layer_cache: GdnLayerCache,
    *,
    eps: float = 1e-6,
    decode: bool = False,
    cache_row=None,
    active: jax.Array | None = None,
    backend: str | None = None,
    true_lengths: jax.Array | None = None,
    continuation: bool = False,
):
    """x ``[B, S, E]`` -> (out ``[B, S, E]``, new GdnLayerCache).

    ``decode=True``: S must be 1, uses the rolling conv state + one-step
    recurrence. Otherwise: fresh prefill from position 0 (zero initial
    state — slot prefill always restarts, matching the engine contract) —
    unless ``continuation=True``, which re-enters the cached recurrent state
    and conv window (chunked/continuation prefill: chunk N continues exactly
    where chunk N-1 left off, so chunked ≡ whole prefill; requires the cache
    rows to line up with the batch, i.e. ``cache_row is None``).
    ``true_lengths [B]`` masks bucket-padded tail steps out of the cumulative
    state: padded steps get beta=0, g=0 (identity update) and the conv state
    window ends at the true length — without this, pad tokens would corrupt
    the recurrent state (unlike attention, where positional masking suffices).
    """
    if continuation and (decode or cache_row is not None):
        raise ValueError("continuation excludes decode/cache_row (documented contract)")
    B, S, _ = x.shape
    # one projection layout: HF's fused k-head-major qkvz/ba columns. GGUF's
    # split projections (reference GdnInputProjection::Split) are fused into
    # this layout at load (loaders/gguf_model.py::_map_gguf_gdn), so every
    # checkpoint format shares ONE compute path and the Megatron column
    # sharding under tp.
    qkvz = linear(x, p["in_proj_qkvz"])
    ba = linear(x, p["in_proj_ba"])
    q, k, v, z, b, a = split_qkvz_ba(gcfg, qkvz, ba)

    # Depthwise conv runs PER PART (q, k, v) with static channel slices of
    # the (small, replicated) conv weight, never concatenating the
    # activations into one [B, S, conv_dim] tensor: under tensor-parallel
    # sharding the three parts are sharded along their own head axes, and a
    # concat along a sharded axis forces GSPMD to all-gather — the conv
    # itself is shift-and-multiply, so per-part application is identical
    # math. Only the tiny [B, k, conv_dim] rolling state keeps the
    # reference's concatenated [Q|K|V] channel layout (cache.rs:15-46).
    kd, vd = gcfg.key_dim, gcfg.value_dim
    wq, wk, wv = p["conv_w"][:kd], p["conv_w"][kd : 2 * kd], p["conv_w"][2 * kd :]
    qf = q.reshape(B, S, kd)
    kf = k.reshape(B, S, kd)
    vf = v.reshape(B, S, vd)

    if decode:
        if cache_row is not None:
            raise ValueError("decode with cache_row unsupported")
        cs = layer_cache.conv_state
        yq, sq = causal_conv1d_update(qf[:, 0], cs[..., :kd], wq)
        yk, sk = causal_conv1d_update(kf[:, 0], cs[..., kd : 2 * kd], wk)
        yv, sv = causal_conv1d_update(vf[:, 0], cs[..., 2 * kd :], wv)
        qc, kc, vc = yq[:, None], yk[:, None], yv[:, None]
    else:
        # continuation re-enters the saved rolling window per part; fresh
        # prefill left-pads with zeros (zero state == zero window, so a
        # continuation over a zeroed cache is identical to fresh prefill)
        cs = layer_cache.conv_state if continuation else None
        iwq = cs[..., :kd] if continuation else None
        iwk = cs[..., kd : 2 * kd] if continuation else None
        iwv = cs[..., 2 * kd :] if continuation else None
        qc, sq = causal_conv1d(qf, wq, true_lengths=true_lengths, init_window=iwq)
        kc, sk = causal_conv1d(kf, wk, true_lengths=true_lengths, init_window=iwk)
        vc, sv = causal_conv1d(vf, wv, true_lengths=true_lengths, init_window=iwv)
    new_conv = jnp.concatenate([sq, sk, sv], axis=-1)

    qc = qc.reshape(B, S, gcfg.num_k_heads, gcfg.head_k_dim)
    kc = kc.reshape(B, S, gcfg.num_k_heads, gcfg.head_k_dim)
    vc = vc.reshape(B, S, gcfg.num_v_heads, gcfg.head_v_dim)

    beta, gdecay = compute_beta_g(b, a, p["A_log"], p["dt_bias"])
    if not decode and true_lengths is not None:
        valid = (
            jnp.arange(S, dtype=jnp.int32)[None, :] < true_lengths[:, None]
        )[..., None]
        beta = beta * valid
        gdecay = gdecay * valid
    if gcfg.v_per_group > 1:
        qc = jnp.repeat(qc, gcfg.v_per_group, axis=2)
        kc = jnp.repeat(kc, gcfg.v_per_group, axis=2)

    if decode:
        y, new_state = gdn_decode_step(
            qc[:, 0], kc[:, 0], vc[:, 0], gdecay[:, 0], beta[:, 0],
            layer_cache.recurrent_state,
        )
        y = y[:, None]
    else:
        init = layer_cache.recurrent_state if continuation else None
        y, new_state = gdn_recurrence(
            qc, kc, vc, gdecay, beta, init, backend=backend
        )

    new_cache = layer_cache.replace_rows(new_conv, new_state, row=cache_row, active=active)

    y = gated_rms_norm(y, z, p["norm"], eps=eps)
    out = linear(y.reshape(B, S, gcfg.value_dim), p["out_proj"])
    return out, new_cache
