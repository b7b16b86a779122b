"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The reference is single-device (SURVEY.md §2.9); tensor/data parallelism here
is the TPU-native extension: Megatron-layout NamedShardings + GSPMD. These
tests prove the sharded forward/train paths produce the same numbers as
single-device execution."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from crane_tpu.models.init import QWEN3_TINY, init_params
from crane_tpu.models.modules.transformer import forward_hidden, lm_logits, make_rope_tables
from crane_tpu.ops.kv_cache import KVCache, LayerKVCache
from crane_tpu.parallel.sharding import (
    cache_partition_spec,
    make_mesh,
    param_partition_specs,
    shard_params,
)


@pytest.fixture(scope="module")
def setup():
    cfg = QWEN3_TINY
    params = init_params(cfg, seed=0, dtype=jnp.float32)
    rope = make_rope_tables(cfg)
    return cfg, params, rope


def _cache(cfg, batch, max_seq):
    return KVCache(
        layers=tuple(
            LayerKVCache.empty(batch, max_seq, cfg.num_kv_heads, cfg.head_dim, jnp.float32)
            for _ in range(cfg.num_layers)
        ),
        lengths=jnp.zeros((batch,), jnp.int32),
    )


def test_tp_forward_matches_single_device(setup):
    cfg, params, rope = setup
    ids = np.array([[1, 5, 9, 17, 33, 2, 7, 11]], dtype=np.int32)
    cache = _cache(cfg, 1, 16)
    hidden, _ = forward_hidden(
        cfg, params, jnp.asarray(ids), cache, jnp.asarray(0, jnp.int32), rope
    )
    ref = np.asarray(lm_logits(cfg, params, hidden))

    mesh = make_mesh(dp=1, tp=2)
    sparams = shard_params(params, mesh)
    # verify weights are actually distributed
    wq = sparams["layers"][0]["attn"]["wq"]
    assert len(wq.sharding.device_set) == 2
    scache = jax.device_put(cache, NamedSharding(mesh, P()))
    hidden_s, _ = forward_hidden(
        cfg, sparams, jnp.asarray(ids), scache, jnp.asarray(0, jnp.int32), rope
    )
    got = np.asarray(lm_logits(cfg, sparams, hidden_s))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_moe_expert_parallel_forward(setup):
    """Expert-parallel sharding (experts over tp) reproduces single-device
    logits on a MoE config."""
    import dataclasses

    from crane_tpu.models.init import init_params

    cfg, _, _ = setup
    cfg = dataclasses.replace(
        cfg, num_experts=4, num_experts_per_tok=2, moe_intermediate_size=64,
        decoder_sparse_step=1,
    )
    params = init_params(cfg, seed=1, dtype=jnp.float32)
    # convert dense MLPs to MoE params (random experts)
    import jax.random as jr

    key = jr.PRNGKey(0)
    layers = []
    for layer in params["layers"]:
        k1, k2, k3, k4, key = jr.split(key, 5)
        E, I = cfg.hidden_size, cfg.moe_intermediate_size
        layer = dict(layer)
        layer["mlp"] = {
            "router": jr.normal(k4, (E, cfg.num_experts)) * 0.1,
            "experts_gate": jr.normal(k1, (cfg.num_experts, E, I)) * E ** -0.5,
            "experts_up": jr.normal(k2, (cfg.num_experts, E, I)) * E ** -0.5,
            "experts_down": jr.normal(k3, (cfg.num_experts, I, E)) * I ** -0.5,
        }
        layers.append(layer)
    params = {**params, "layers": tuple(layers)}
    rope = make_rope_tables(cfg)

    ids = np.array([[1, 5, 9, 17]], dtype=np.int32)
    cache = _cache(cfg, 1, 8)
    hidden, _ = forward_hidden(
        cfg, params, jnp.asarray(ids), cache, jnp.asarray(0, jnp.int32), rope
    )
    ref = np.asarray(lm_logits(cfg, params, hidden))

    mesh = make_mesh(dp=1, tp=4)
    sparams = shard_params(params, mesh)
    eg = sparams["layers"][0]["mlp"]["experts_gate"]
    assert len(eg.sharding.device_set) == 4  # experts distributed
    scache = jax.device_put(_cache(cfg, 1, 8), NamedSharding(mesh, P()))
    hidden_s, _ = forward_hidden(
        cfg, sparams, jnp.asarray(ids), scache, jnp.asarray(0, jnp.int32), rope
    )
    got = np.asarray(lm_logits(cfg, sparams, hidden_s))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_dp_tp_train_step_runs(setup):
    import optax

    from crane_tpu.parallel.sharding import token_partition_spec
    from crane_tpu.parallel.train import make_train_step

    cfg, params, rope = setup
    mesh = make_mesh(dp=2, tp=2)
    sparams = shard_params(params, mesh)
    tokens = jax.device_put(
        jnp.asarray(np.arange(32, dtype=np.int32).reshape(2, 16) % cfg.vocab_size),
        NamedSharding(mesh, token_partition_spec()),
    )
    optimizer = optax.adamw(1e-4)
    opt_state = optimizer.init(sparams)
    step = make_train_step(cfg, optimizer)
    new_params, _, loss = step(sparams, opt_state, rope, tokens)
    assert np.isfinite(float(loss))
    # params stay sharded after the update
    wq = new_params["layers"][0]["attn"]["wq"]
    assert len(wq.sharding.device_set) >= 2


def test_tp_generate_matches_single_device(setup):
    """End-to-end sharded INFERENCE: prefill + block-decode generation with
    Megatron-TP params and tp-sharded KV produces the single-device tokens
    (parallel/inference.py — the serve-a-model-too-big-for-one-chip path)."""
    from crane_tpu.generation.config import GenerationConfig
    from crane_tpu.models.causal_lm import CausalLM
    from crane_tpu.parallel.inference import shard_lm

    cfg, _, _ = setup
    # fresh params: the donating train-step test above may have consumed the
    # fixture's buffers (replicated shards can alias the source array)
    params = init_params(cfg, seed=0, dtype=jnp.float32)
    lm = CausalLM(cfg, params, dtype=jnp.float32)
    prompt = [3, 14, 15, 92, 6, 53]
    expected = lm.generate(prompt, GenerationConfig.greedy(10))

    mesh = make_mesh(dp=1, tp=2)
    slm = shard_lm(lm, mesh)
    wq = slm.params["layers"][0]["attn"]["wq"]
    assert len(wq.sharding.device_set) == 2  # weights actually distributed
    got = slm.generate(prompt, GenerationConfig.greedy(10))
    assert got == expected

    # sampling path too (same seed -> same tokens through the sharded fns)
    g = GenerationConfig(max_new_tokens=8, do_sample=True, temperature=0.8, seed=11)
    assert slm.generate(prompt, g) == lm.generate(prompt, g)


def test_tp_engine_serving_matches_single_device(setup):
    """The continuous-batching engine over a tensor-parallel model: admit +
    batched block-decode run SPMD and stream the single-device tokens."""
    from crane_tpu.generation.config import GenerationConfig
    from crane_tpu.models.causal_lm import CausalLM
    from crane_tpu.parallel.inference import shard_lm
    from crane_tpu.serve.engine import InferenceEngine
    from crane_tpu.serve.sequence import EngineRequest, SamplingOptions

    cfg, _, _ = setup
    params = init_params(cfg, seed=0, dtype=jnp.float32)
    lm = CausalLM(cfg, params, dtype=jnp.float32)
    prompts = [[3, 14, 15], [92, 6, 44, 12]]
    expected = [lm.generate(p, GenerationConfig.greedy(6)) for p in prompts]

    slm = shard_lm(lm, make_mesh(dp=1, tp=2))
    engine = InferenceEngine(slm, max_slots=2, max_seq_len=64,
                             decode_tokens_per_seq=2)
    qs = [
        engine.submit(EngineRequest(
            request_id=f"r{i}", prompt_ids=p, max_new_tokens=6,
            sampling=SamplingOptions(do_sample=False, repetition_penalty=1.0),
        ))
        for i, p in enumerate(prompts)
    ]
    for _ in range(200):
        if not engine.step() and engine.request_q.empty():
            break
    for q, exp in zip(qs, expected):
        toks = []
        while True:
            r = q.get(timeout=60)
            if r.finished:
                assert r.error is None, r.error
                break
            if r.token is not None:
                toks.append(r.token)
        assert toks == exp


def test_remat_gradients_match(setup):
    """Per-layer jax.checkpoint changes memory, not math: loss and grads
    must be identical with and without rematerialization."""
    from crane_tpu.parallel.train import next_token_loss

    cfg, _, rope = setup
    params = init_params(cfg, seed=2, dtype=jnp.float32)
    tokens = jnp.asarray(np.arange(16, dtype=np.int32).reshape(1, 16) % cfg.vocab_size)
    f_plain = lambda p: next_token_loss(cfg, p, rope, tokens, remat=False)
    f_remat = lambda p: next_token_loss(cfg, p, rope, tokens, remat=True)
    l1, g1 = jax.value_and_grad(f_plain)(params)
    l2, g2 = jax.value_and_grad(f_remat)(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        g1, g2,
    )


def test_dp_tp_engine_serving_matches_single_device(setup):
    """--dp x --tp serving: slot batch sharded over dp, heads over tp;
    engine admit + batched block-decode stream single-device tokens."""
    from crane_tpu.generation.config import GenerationConfig
    from crane_tpu.models.causal_lm import CausalLM
    from crane_tpu.parallel.inference import shard_lm
    from crane_tpu.serve.engine import InferenceEngine
    from crane_tpu.serve.sequence import EngineRequest, SamplingOptions

    cfg, _, _ = setup
    params = init_params(cfg, seed=0, dtype=jnp.float32)
    lm = CausalLM(cfg, params, dtype=jnp.float32)
    prompts = [[3, 14, 15], [92, 6, 44, 12], [5, 6], [9, 9, 9]]
    expected = [lm.generate(p, GenerationConfig.greedy(5)) for p in prompts]

    slm = shard_lm(lm, make_mesh(dp=2, tp=2))
    engine = InferenceEngine(slm, max_slots=4, max_seq_len=64,
                             decode_tokens_per_seq=2)
    qs = [
        engine.submit(EngineRequest(
            request_id=f"r{i}", prompt_ids=p, max_new_tokens=5,
            sampling=SamplingOptions(do_sample=False, repetition_penalty=1.0),
        ))
        for i, p in enumerate(prompts)
    ]
    for _ in range(200):
        if not engine.step() and engine.request_q.empty():
            break
    for q, exp in zip(qs, expected):
        toks = []
        while True:
            r = q.get(timeout=60)
            if r.finished:
                assert r.error is None, r.error
                break
            if r.token is not None:
                toks.append(r.token)
        assert toks == exp
