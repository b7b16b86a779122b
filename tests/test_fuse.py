"""Projection fusion (models/fuse.py): wqkv / gate_up fused GEMVs.

Parity bar: fused and unfused parameter trees produce the same greedy tokens
and near-identical logits (same contraction per output column; only XLA
tiling may differ)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crane_tpu.models.causal_lm import CausalLM
from crane_tpu.models.fuse import fuse_params, unfuse_params
from crane_tpu.models.init import init_params
from crane_tpu.models.modules.transformer import TransformerConfig

CFG = TransformerConfig(
    vocab_size=256, hidden_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
    head_dim=16, intermediate_size=96, qk_norm=True, tie_word_embeddings=True,
)
CFG_BIAS = TransformerConfig(
    vocab_size=256, hidden_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
    head_dim=16, intermediate_size=96, attn_bias=True, tie_word_embeddings=True,
)


def _params(cfg, seed=0):
    p = init_params(cfg, seed=seed, dtype=jnp.float32)
    if cfg.attn_bias:
        rng = np.random.default_rng(5)
        for l in p["layers"]:
            for b, n in (("bq", 64), ("bk", 32), ("bv", 32)):
                l["attn"][b] = jnp.asarray(rng.normal(size=n) * 0.02, jnp.float32)
    return p


@pytest.mark.parametrize("cfg", [CFG, CFG_BIAS], ids=["nobias", "bias"])
def test_fused_matches_unfused_generate(cfg):
    from crane_tpu.generation.config import GenerationConfig

    p = _params(cfg)
    lm_f = CausalLM(cfg, p, dtype=jnp.float32, fuse=True)
    lm_u = CausalLM(cfg, p, dtype=jnp.float32, fuse=False)
    assert "wqkv" in lm_f.params["layers"][0]["attn"]
    assert "gate_up" in lm_f.params["layers"][0]["mlp"]
    assert "wq" in lm_u.params["layers"][0]["attn"]
    prompt = [3, 17, 99, 42, 7]
    gen = GenerationConfig(max_new_tokens=24, do_sample=False)
    assert lm_f.generate(prompt, gen) == lm_u.generate(prompt, gen)


def test_fused_logits_close():
    p = _params(CFG)
    lm_f = CausalLM(CFG, p, dtype=jnp.float32, fuse=True)
    lm_u = CausalLM(CFG, p, dtype=jnp.float32, fuse=False)
    ids = np.arange(1, 9, dtype=np.int32)[None]
    cf = lm_f.init_cache(1, 64)
    cu = lm_u.init_cache(1, 64)
    lf, _ = lm_f.prefill(cf, ids, [8])
    lu, _ = lm_u.prefill(cu, ids, [8])
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lu), rtol=1e-5, atol=1e-5)


def test_unfuse_roundtrip_dense_and_bias():
    p = _params(CFG_BIAS)
    rt = unfuse_params(CFG_BIAS, fuse_params(p))
    for l0, l1 in zip(p["layers"], rt["layers"]):
        for part in ("attn", "mlp"):
            for k, v in l0[part].items():
                np.testing.assert_array_equal(np.asarray(v), np.asarray(l1[part][k]))


def test_fuse_quantized_weights_and_parity():
    from crane_tpu.models.auto import quantize_params

    p = quantize_params(_params(CFG), bits=8)
    lm_f = CausalLM(CFG, p, dtype=jnp.float32, fuse=True)
    lm_u = CausalLM(CFG, p, dtype=jnp.float32, fuse=False)
    fused = lm_f.params["layers"][0]["attn"]["wqkv"]
    assert fused.bits == 8 and fused.shape == (64, 64 + 32 + 32)
    ids = np.arange(1, 9, dtype=np.int32)[None]
    lf, _ = lm_f.prefill(lm_f.init_cache(1, 64), ids, [8])
    lu, _ = lm_u.prefill(lm_u.init_cache(1, 64), ids, [8])
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lu), rtol=1e-5, atol=1e-5)


def test_fuse_quantized_int4_packed_roundtrip():
    from crane_tpu.models.auto import quantize_params
    from crane_tpu.ops.linear import QuantizedWeight

    p = quantize_params(_params(CFG), bits=4, quant_tied_head=False)
    f = fuse_params(p)
    w = f["layers"][0]["attn"]["wqkv"]
    assert isinstance(w, QuantizedWeight) and w.bits == 4 and w.packed
    u = unfuse_params(CFG, f)
    for name in ("wq", "wk", "wv"):
        a, b = p["layers"][0]["attn"][name], u["layers"][0]["attn"][name]
        np.testing.assert_array_equal(np.asarray(a.codes), np.asarray(b.codes))
        np.testing.assert_array_equal(np.asarray(a.scales), np.asarray(b.scales))


def test_moe_and_missing_weights_pass_through():
    # router present -> MoE layer: gate/up untouched; missing wv -> no wqkv
    moe_layer = {
        "attn": {"wq": jnp.ones((8, 8)), "wk": jnp.ones((8, 4))},
        "mlp": {"router": jnp.ones((8, 4)), "gate": jnp.ones((8, 16)),
                "up": jnp.ones((8, 16))},
    }
    f = fuse_params({"layers": (moe_layer,)})
    assert "gate_up" not in f["layers"][0]["mlp"]
    assert "wqkv" not in f["layers"][0]["attn"]


def test_tp_sharded_lm_stays_unfused():
    """shard_lm must see unfused names (sharding.py pattern-matches wq/gate);
    a pre-fused base lm unfuses on entry."""
    from crane_tpu.parallel.inference import shard_lm
    from crane_tpu.parallel.sharding import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    lm = CausalLM(CFG, _params(CFG), dtype=jnp.float32, fuse=True)
    slm = shard_lm(lm, make_mesh(dp=1, tp=2))
    attn = slm.params["layers"][0]["attn"]
    assert "wq" in attn and "wqkv" not in attn
    from crane_tpu.generation.config import GenerationConfig

    gen = GenerationConfig(max_new_tokens=12, do_sample=False)
    assert slm.generate([3, 17, 99], gen) == lm.generate([3, 17, 99], gen)
