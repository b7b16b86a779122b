"""Sequence parallelism: KV sequence axis sharded over an "sp" mesh.

The reference's long-context levers are single-device (SURVEY.md §5.7);
sharding the context across chips is the TPU-native extension
(parallel/sequence.py). These tests run the REAL fused decode kernels
(interpret mode) per sequence slab inside shard_map on the virtual 8-device
mesh and assert the log-sum-exp merge reproduces single-device tokens.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crane_tpu.generation.config import GenerationConfig
from crane_tpu.models.causal_lm import CausalLM
from crane_tpu.models.init import QWEN3_TINY, init_params
from crane_tpu.parallel.sequence import make_sp_mesh, sp_shard_lm


@pytest.fixture(scope="module")
def lm():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    cfg = QWEN3_TINY
    return CausalLM(cfg, init_params(cfg, seed=0, dtype=jnp.float32),
                    dtype=jnp.float32)


def test_sp_generate_matches_single_device(lm):
    prompt = [3, 14, 15, 92, 6]
    expected = lm.generate(prompt, GenerationConfig.greedy(10))
    slm = sp_shard_lm(lm, make_sp_mesh(4))
    cache = slm.init_cache(1, 32)
    k0 = cache.layers[0].k
    assert len(k0.sharding.device_set) == 4  # cache actually distributed
    got = slm.generate(prompt, GenerationConfig.greedy(10))
    assert got == expected


def test_sp_prompt_spanning_slabs_matches(lm):
    """A prompt longer than one sequence slab: prefill writes cross shard
    boundaries (GSPMD scatter) and decode attends tokens on 3 shards."""
    prompt = list(range(2, 25))  # 23 tokens over 8-token slabs
    expected = lm.generate(prompt, GenerationConfig.greedy(8))
    slm = sp_shard_lm(lm, make_sp_mesh(4))
    got = slm.generate(prompt, GenerationConfig.greedy(8))
    assert got == expected


@pytest.mark.parametrize("bits", [8, 4])
def test_sp_quant_cache_matches_single_device(lm, bits):
    """int8/int4 KV + sp compose: the long-context lever stack — quantized
    bytes per token AND the context split across chips."""
    prompt = [3, 14, 15, 92, 6, 7, 21, 9, 44, 2]
    # explicit cache control to force quant bits
    ref_cache = lm.init_cache(1, 32, quant_bits=bits)
    logits, ref_cache = lm.prefill(ref_cache, jnp.asarray([prompt], jnp.int32),
                                   [len(prompt)])
    ref_toks = [int(jnp.argmax(logits[0, -1]))] if logits.ndim == 3 else [
        int(jnp.argmax(logits, -1)[0])]

    slm = sp_shard_lm(lm, make_sp_mesh(4))
    sp_cache = slm.init_cache(1, 32, quant_bits=bits)
    sp_logits, sp_cache = slm.prefill(
        sp_cache, jnp.asarray([prompt], jnp.int32), [len(prompt)])
    sp_toks = [int(jnp.argmax(sp_logits[0, -1]))] if sp_logits.ndim == 3 else [
        int(jnp.argmax(sp_logits, -1)[0])]
    assert sp_toks == ref_toks

    # 6 greedy decode steps through the sharded fused kernel
    from crane_tpu.ops.sampling import SamplingParams
    sp_params = SamplingParams.make(1, do_sample=False)
    key = jax.random.PRNGKey(0)
    cur_r = jnp.asarray(ref_toks, jnp.int32)
    cur_s = jnp.asarray(sp_toks, jnp.int32)
    rec_r = jnp.full((1, 64), -1, jnp.int32)
    rec_s = jnp.full((1, 64), -1, jnp.int32)
    toks_r, ref_cache, rec_r = lm.decode_steps(
        ref_cache, cur_r, rec_r, sp_params, key, 6)
    toks_s, sp_cache, rec_s = slm.decode_steps(
        sp_cache, cur_s, rec_s, sp_params, key, 6)
    np.testing.assert_array_equal(np.asarray(toks_r), np.asarray(toks_s))


def test_sp_engine_serving_matches_single_device(lm):
    """The continuous-batching engine over a sequence-parallel model:
    slot caches shard their sequence axis; admit + batched block-decode
    stream the single-device tokens (--sp serving)."""
    from crane_tpu.serve.engine import InferenceEngine
    from crane_tpu.serve.sequence import EngineRequest, SamplingOptions

    prompts = [[3, 14, 15], [92, 6, 44, 12]]
    expected = [lm.generate(p, GenerationConfig.greedy(6)) for p in prompts]

    slm = sp_shard_lm(lm, make_sp_mesh(4))
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


def test_sp_sliding_window_hybrid_matches():
    """Gemma-style sliding/full hybrid under sp: window layers keep
    replicated caches (their KV is bounded; the sp decode path excludes
    them) while full layers sequence-shard — tokens match single-device."""
    import dataclasses

    from crane_tpu.models.init import init_params
    from crane_tpu.models.modules.transformer import TransformerConfig

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    cfg = TransformerConfig(
        vocab_size=512, hidden_size=64, num_layers=4, num_heads=4,
        num_kv_heads=2, head_dim=16, intermediate_size=96, qk_norm=True,
        layer_types=("sliding", "full", "sliding", "full"),
        sliding_window=8, rope_local_theta=10000.0,
    )
    lm = CausalLM(cfg, init_params(cfg, seed=3, dtype=jnp.float32),
                  dtype=jnp.float32)
    prompt = list(range(2, 20))
    expected = lm.generate(prompt, GenerationConfig.greedy(8))

    slm = sp_shard_lm(lm, make_sp_mesh(4))
    cache = slm.init_cache(1, 32)
    assert len(cache.layers[0].k.sharding.device_set) in (1, 4)
    # sliding layer cache replicated; full layer cache sharded
    assert cache.layers[0].k.sharding.is_fully_replicated
    assert not cache.layers[1].k.sharding.is_fully_replicated
    got = slm.generate(prompt, GenerationConfig.greedy(8))
    assert got == expected


def test_sp_chunked_prefill_matches_single_device(lm):
    """Continuation chunks under sp run the cached kernel per slab with
    slab-shifted positions and per-row log-sum-exp merge (the sp prefill
    path that avoids GSPMD's full-cache all-gather)."""
    import numpy as np

    rng = np.random.default_rng(5)
    first = rng.integers(1, 500, 20)[None].astype(np.int32)
    chunk = rng.integers(1, 500, 8)[None].astype(np.int32)

    ref_cache = lm.init_cache(1, 64)
    _, ref_cache = lm.prefill_slot(ref_cache, first, 0, 20)
    ref_out, ref_cache = lm.prefill_slot_continue(ref_cache, chunk, 0, 20, 8)

    slm = sp_shard_lm(lm, make_sp_mesh(4))
    sp_cache = slm.init_cache(1, 64)
    _, sp_cache = slm.prefill_slot(sp_cache, first, 0, 20)
    sp_out, sp_cache = slm.prefill_slot_continue(sp_cache, chunk, 0, 20, 8)
    np.testing.assert_allclose(
        np.asarray(sp_out, np.float32), np.asarray(ref_out, np.float32),
        atol=2e-4, rtol=2e-4)

    # and the engine's chunked admission end-to-end under sp
    from crane_tpu.serve.engine import InferenceEngine
    from crane_tpu.serve.sequence import EngineRequest, SamplingOptions

    prompt = list(rng.integers(1, 500, 40))
    expected = lm.generate(prompt, GenerationConfig.greedy(5))
    engine = InferenceEngine(slm, max_slots=1, max_seq_len=64,
                             prefill_chunk=16)
    q = engine.submit(EngineRequest(
        request_id="r", prompt_ids=prompt, max_new_tokens=5,
        sampling=SamplingOptions(do_sample=False, repetition_penalty=1.0)))
    for _ in range(200):
        if not engine.step() and engine.request_q.empty():
            break
    toks = []
    while True:
        r = q.get(timeout=60)
        if r.finished:
            assert r.error is None, r.error
            break
        if r.token is not None:
            toks.append(r.token)
    assert toks == expected


def test_sp_with_engine_speculative_matches(lm):
    """--sp + --speculative compose: the chained on-device propose/verify
    dispatch runs its S=K+1 verify chunks through the sp continuation path
    and stays byte-identical. The repetitive prompt guarantees the on-device
    n-gram proposer finds real drafts, so acceptance actually exercises the
    multi-token accept path, not just the 1-token floor."""
    from crane_tpu.serve.engine import InferenceEngine
    from crane_tpu.serve.sequence import EngineRequest, SamplingOptions

    prompt = [5, 6, 7, 8] * 6
    expected = lm.generate(prompt, GenerationConfig.greedy(10))
    slm = sp_shard_lm(lm, make_sp_mesh(4))
    engine = InferenceEngine(slm, max_slots=1, max_seq_len=64,
                             speculative="ngram", spec_k=4, spec_rounds=4)
    q = engine.submit(EngineRequest(
        request_id="r", prompt_ids=prompt, max_new_tokens=10,
        sampling=SamplingOptions(do_sample=False, repetition_penalty=1.0)))
    for _ in range(200):
        if not engine.step() and engine.request_q.empty():
            break
    toks = []
    while True:
        r = q.get(timeout=60)
        if r.finished:
            assert r.error is None, r.error
            break
        if r.token is not None:
            toks.append(r.token)
    assert toks == expected
    assert engine.stats.spec_steps > 0  # the fast path actually ran


def test_sp_prefix_reuse_matches_single_device(lm):
    """Cross-request prefix reuse composes with sequence parallelism: the
    reused resident rows are sequence-sharded, and the suffix admits through
    the sp continuation path — token-identical to single-device."""
    from crane_tpu.serve.engine import InferenceEngine
    from crane_tpu.serve.sequence import EngineRequest, SamplingOptions

    def run(engine, rid, prompt, n):
        q = engine.submit(EngineRequest(
            request_id=rid, prompt_ids=prompt, max_new_tokens=n,
            sampling=SamplingOptions(do_sample=False, repetition_penalty=1.0),
        ))
        for _ in range(300):
            if not engine.step() and engine.request_q.empty():
                break
        toks = []
        while True:
            r = q.get(timeout=60)
            if r.finished:
                assert r.error is None, r.error
                break
            if r.token is not None:
                toks.append(r.token)
        return toks

    slm = sp_shard_lm(lm, make_sp_mesh(4))
    engine = InferenceEngine(slm, max_slots=2, max_seq_len=64,
                             decode_tokens_per_seq=2, prefix_reuse_min=4,
                             bucket_align=4)  # fine-grained reuse under test
    assert engine.prefix_cache  # the sp wrapper exposes a positional config
    prompt = [3, 14, 15, 92, 6, 5, 35, 89]
    t1 = run(engine, "turn1", prompt, 6)
    prompt2 = prompt + t1 + [7, 9, 2]
    t2 = run(engine, "turn2", prompt2, 6)
    assert engine.stats.prefix_hits == 1
    assert t2 == lm.generate(prompt2, GenerationConfig.greedy(6))
