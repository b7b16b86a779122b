"""Hybrid GDN model (Qwen3-Next / Qwen3.5 architecture) parity vs HF.

The reference's Qwen3.5/Ornith is this architecture (SURVEY.md §2.5): 3-in-4
GDN linear-attention layers, unit-offset RMSNorm, 2x-wide gated q_proj,
partial rotary. Oracle: transformers Qwen3NextForCausalLM (dense, MoE off)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from crane_tpu.generation.config import GenerationConfig
from crane_tpu.models.auto import from_pretrained
from crane_tpu.models.modules.transformer import forward_hidden, lm_logits


def _save_tiny_next(tmp_path):
    torch.manual_seed(0)
    cfg = transformers.Qwen3NextConfig(
        vocab_size=160, hidden_size=64, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, linear_num_value_heads=4, linear_num_key_heads=2,
        linear_key_head_dim=16, linear_value_head_dim=8,
        linear_conv_kernel_dim=4, partial_rotary_factor=0.25,
        max_position_embeddings=256, rope_theta=10000.0,
        num_experts=0, decoder_sparse_step=0, mlp_only_layers=[],
        tie_word_embeddings=False,
        layer_types=["linear_attention", "linear_attention", "linear_attention", "full_attention"],
    )
    model = transformers.Qwen3NextForCausalLM(cfg).eval().to(torch.float32)
    d = str(tmp_path / "next")
    model.save_pretrained(d, safe_serialization=True)
    return model, d


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    return _save_tiny_next(tmp_path_factory.mktemp("next"))


def test_prefill_logits_match_hf(tiny):
    model, d = tiny
    ids = np.array([[1, 5, 9, 17, 33, 2, 7, 11, 4, 3]], dtype=np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).logits.numpy()
    lm = from_pretrained(d, dtype=jnp.float32)
    cache = lm.init_cache(1, 32)
    hidden, _ = forward_hidden(
        lm.config, lm.params, jnp.asarray(ids, jnp.int32), cache,
        jnp.asarray(0, jnp.int32), lm.rope,
    )
    got = np.asarray(lm_logits(lm.config, lm.params, hidden))
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))


def test_greedy_generation_matches_hf(tiny):
    model, d = tiny
    prompt = [3, 14, 15, 92, 6]
    n_new = 10
    with torch.no_grad():
        ref = model.generate(
            torch.tensor([prompt]), max_new_tokens=n_new, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )[0, len(prompt):].tolist()
    lm = from_pretrained(d, dtype=jnp.float32)
    got = lm.generate(prompt, GenerationConfig.greedy(n_new))
    assert got == ref


def test_decode_equals_prefill_hybrid(tiny):
    """Incremental GDN decode (conv state + recurrence continuation) must
    reproduce prefill logits — the CRANE_FULL_RECOMPUTE cross-check."""
    _, d = tiny
    lm = from_pretrained(d, dtype=jnp.float32)
    ids = np.array([[1, 5, 9, 17, 33, 2, 7]], dtype=np.int32)
    cache = lm.init_cache(1, 32)
    hidden, _ = forward_hidden(
        lm.config, lm.params, jnp.asarray(ids, jnp.int32), cache,
        jnp.asarray(0, jnp.int32), lm.rope,
    )
    full = np.asarray(lm_logits(lm.config, lm.params, hidden))

    cache = lm.init_cache(1, 32)
    pad = np.zeros((1, 8), np.int32)
    pad[0, :4] = ids[0, :4]
    logits, cache = lm.prefill(cache, pad, [4])
    np.testing.assert_allclose(np.asarray(logits)[0], full[0, 3], rtol=5e-4, atol=5e-4)
    for s in range(4, ids.shape[1]):
        hidden, cache = forward_hidden(
            lm.config, lm.params, jnp.asarray(ids[:, s : s + 1]), cache,
            cache.lengths, lm.rope,
        )
        step = np.asarray(lm_logits(lm.config, lm.params, hidden))[0, 0]
        np.testing.assert_allclose(step, full[0, s], rtol=5e-4, atol=5e-4)


def test_serving_engine_on_hybrid(tiny):
    """Static-slot engine with mixed GDN/attention caches: batch of ragged
    requests matches single-request generation."""
    from crane_tpu.serve.engine import InferenceEngine
    from tests.test_engine import collect, greedy_request, run_until_idle

    _, d = tiny
    lm = from_pretrained(d, dtype=jnp.float32)
    prompts = [[3, 14, 15], [92, 6, 44, 12, 7]]
    expected = [lm.generate(p, GenerationConfig.greedy(5)) for p in prompts]
    engine = InferenceEngine(lm, max_slots=2, max_seq_len=64, decode_tokens_per_seq=2)
    qs = [engine.submit(greedy_request(f"r{i}", p, n=5)) for i, p in enumerate(prompts)]
    run_until_idle(engine)
    for q, exp in zip(qs, expected):
        toks, _ = collect(q)
        assert toks == exp


def test_hbm_budget_counts_only_attention_layers(tiny):
    """The startup HBM check must size the cache exactly as allocated: for
    this 3-in-4 GDN hybrid only 1 of 4 layers carries a full-length KV
    buffer, so a limit that fits the real footprint — but NOT a naive
    all-layers-are-KV estimate — must admit the config (VERDICT r2 weak #2).
    The GDN conv ring + f32 recurrent state must still be counted."""
    import os

    import jax

    from crane_tpu.serve.engine import InferenceEngine, _tree_bytes

    _, d = tiny
    lm = from_pretrained(d, dtype=jnp.float32)
    max_slots, max_seq = 2, 512
    weights = _tree_bytes(lm.params)
    cache = jax.eval_shape(lambda: lm.init_cache(max_slots, max_seq))
    exact = _tree_bytes(cache)
    cfg = lm.config
    naive_kv = (
        max_slots * max_seq * cfg.num_layers * cfg.num_kv_heads
        * cfg.head_dim * 2 * 4  # f32
    )
    one_layer_kv = naive_kv // cfg.num_layers
    # sanity on the fixture: exact sits between 1-layer KV and the naive
    # 4-layer estimate (GDN state is small but nonzero)
    assert one_layer_kv < exact < naive_kv

    limit = int((weights + exact) * 1.15) + 4096
    assert limit < int((weights + naive_kv) * 1.15)  # old formula would reject
    os.environ["CRANE_HBM_BYTES"] = str(limit)
    try:
        InferenceEngine(lm, max_slots=max_slots, max_seq_len=max_seq)
        # and the check still rejects a genuinely oversized config
        with pytest.raises(RuntimeError, match="HBM budget exceeded"):
            InferenceEngine(lm, max_slots=max_slots * 16, max_seq_len=max_seq)
    finally:
        del os.environ["CRANE_HBM_BYTES"]


def test_kv_quant_on_hybrid_attention_layers(tiny):
    """int8 KV quantization applies to the full-attention layers of the
    hybrid model (reference CRANE_KV_QUANT, qwen3_5/kv_cache.rs)."""
    _, d = tiny
    lm = from_pretrained(d, dtype=jnp.float32)
    prompt = [3, 14, 15, 92, 6]
    base = lm.generate(prompt, GenerationConfig.greedy(8))

    from crane_tpu.models.causal_lm import CausalLM
    from crane_tpu.ops.sampling import SamplingParams
    from crane_tpu.ops.kv_cache import QuantLayerKVCache

    cache = lm.init_cache(1, 64, quant_bits=8)
    assert any(isinstance(c, QuantLayerKVCache) for c in cache.layers)
    pad = np.zeros((1, 8), np.int32)
    pad[0, : len(prompt)] = prompt
    logits, cache = lm.prefill(cache, pad, [len(prompt)])
    tok = int(np.asarray(logits).argmax(-1)[0])
    got = [tok]
    sp = SamplingParams.make(1, do_sample=False)
    recent = jnp.full((1, 4), -1, jnp.int32)
    cur = jnp.asarray([tok], jnp.int32)
    for _ in range(7):
        cur, cache, recent = lm.decode_step(cache, cur, recent, sp, jax.random.PRNGKey(0))
        got.append(int(cur[0]))
    # int8 KV is nearly lossless on a tiny model: token-level agreement
    assert got == base


def test_tp_hybrid_generate_matches_single_device(tiny):
    """Tensor-parallel hybrid: the GDN layers shard their k-head-major
    projections / v-head state over tp (parallel/sharding.py::gdn_spec,
    per-part conv in gdn_layer.py) and still emit the single-device
    tokens. The reference is single-device by design (SURVEY.md §2.9)."""
    from crane_tpu.ops.kv_cache import GdnLayerCache
    from crane_tpu.parallel.inference import shard_lm
    from crane_tpu.parallel.sharding import make_mesh

    _, d = tiny
    lm = from_pretrained(d, dtype=jnp.float32)
    prompt = [3, 14, 15, 92, 6]
    expected = lm.generate(prompt, GenerationConfig.greedy(10))

    mesh = make_mesh(dp=1, tp=2)
    slm = shard_lm(lm, mesh)
    gdn_w = slm.params["layers"][0]["gdn"]["in_proj_qkvz"]
    assert len(gdn_w.sharding.device_set) == 2  # GDN weights distributed
    cache = slm.init_cache(1, 32)
    gdn_layer = next(
        l for l in cache.layers if isinstance(l, GdnLayerCache))
    assert len(gdn_layer.recurrent_state.sharding.device_set) == 2

    got = slm.generate(prompt, GenerationConfig.greedy(10))
    assert got == expected
