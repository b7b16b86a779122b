"""Numeric parity vs HuggingFace transformers on tiny random checkpoints.

The reference's acceptance bar: "once the float values of output are matched,
the model can be ready to go" (/root/reference/README.md:430), with prefill
argmax bit-exact vs HF (README.md:344-347). Tiny models are randomly
initialized via transformers (torch CPU), saved as safetensors, then loaded by
crane_tpu's own loader — exercising config parsing, weight mapping, attention,
RoPE, KV cache and the decode loop end to end.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from crane_tpu.generation.config import GenerationConfig
from crane_tpu.models.auto import from_pretrained, quantize_params
from crane_tpu.models.causal_lm import CausalLM
from crane_tpu.models.modules.transformer import forward_hidden, lm_logits
from crane_tpu.ops.kv_cache import KVCache


def _save_tiny(tmp_path, kind: str):
    torch.manual_seed(0)
    if kind == "qwen3":
        cfg = transformers.Qwen3Config(
            vocab_size=128, hidden_size=64, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
            tie_word_embeddings=False,
        )
        model = transformers.Qwen3ForCausalLM(cfg)
    elif kind == "qwen2":
        cfg = transformers.Qwen2Config(
            vocab_size=128, hidden_size=64, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256, rope_theta=10000.0,
            tie_word_embeddings=False,
        )
        model = transformers.Qwen2ForCausalLM(cfg)
    else:
        raise ValueError(kind)
    model = model.eval().to(torch.float32)
    d = tmp_path / kind
    model.save_pretrained(d, safe_serialization=True)
    return model, str(d)


def _full_logits(lm: CausalLM, ids: np.ndarray) -> np.ndarray:
    B, S = ids.shape
    cache = lm.init_cache(B, 64)
    hidden, _ = forward_hidden(
        lm.config, lm.params, jnp.asarray(ids, jnp.int32), cache,
        jnp.asarray(0, jnp.int32), lm.rope,
    )
    return np.asarray(lm_logits(lm.config, lm.params, hidden))


@pytest.mark.parametrize("kind", ["qwen3", "qwen2"])
def test_prefill_logits_match_hf(tmp_path, kind):
    model, d = _save_tiny(tmp_path, kind)
    ids = np.array([[1, 5, 9, 17, 33, 2, 7, 11]], dtype=np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).logits.numpy()
    lm = from_pretrained(d, dtype=jnp.float32)
    got = _full_logits(lm, ids)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    # argmax parity at every position (the reference's bit-exact bar)
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))


def test_greedy_generation_matches_hf(tmp_path):
    model, d = _save_tiny(tmp_path, "qwen3")
    prompt = [3, 14, 15, 92, 6]
    n_new = 12
    with torch.no_grad():
        ref = model.generate(
            torch.tensor([prompt]), max_new_tokens=n_new, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )[0, len(prompt):].tolist()
    lm = from_pretrained(d, dtype=jnp.float32)
    got = lm.generate(prompt, GenerationConfig.greedy(n_new))
    assert got == ref


def test_decode_equals_prefill(tmp_path):
    """Incremental decode must reproduce prefill logits (reference
    attention.rs invariant + CRANE_FULL_RECOMPUTE cross-check)."""
    _, d = _save_tiny(tmp_path, "qwen3")
    lm = from_pretrained(d, dtype=jnp.float32)
    ids = np.array([[1, 5, 9, 17, 33, 2]], dtype=np.int32)
    full = _full_logits(lm, ids)

    cache = lm.init_cache(1, 64)
    # prefill only the first 3, then decode the rest one by one
    pad = np.zeros((1, 8), np.int32)
    pad[0, :3] = ids[0, :3]
    logits, cache = lm.prefill(cache, pad, [3])
    np.testing.assert_allclose(np.asarray(logits)[0], full[0, 2], rtol=2e-4, atol=2e-4)
    for s in range(3, ids.shape[1]):
        hidden, cache = forward_hidden(
            lm.config, lm.params, jnp.asarray(ids[:, s : s + 1]), cache,
            cache.lengths, lm.rope,
        )
        step = np.asarray(lm_logits(lm.config, lm.params, hidden))[0, 0]
        np.testing.assert_allclose(step, full[0, s], rtol=2e-4, atol=2e-4)


def test_batched_ragged_decode_matches_single(tmp_path):
    """Batch rows with different lengths decode identically to running each
    row alone (reference batch-row consistency, qwen3/modeling.rs tests)."""
    _, d = _save_tiny(tmp_path, "qwen3")
    lm = from_pretrained(d, dtype=jnp.float32)
    prompts = [[1, 5, 9], [2, 7, 11, 13, 42]]

    singles = []
    for pr in prompts:
        cache = lm.init_cache(1, 32)
        pad = np.zeros((1, 8), np.int32)
        pad[0, : len(pr)] = pr
        logits, cache = lm.prefill(cache, pad, [len(pr)])
        tok = int(np.asarray(logits).argmax(-1)[0])
        seq = [tok]
        import jax.random as jrandom
        from crane_tpu.ops.sampling import SamplingParams
        sp = SamplingParams.make(1, do_sample=False)
        recent = jnp.full((1, 4), -1, jnp.int32)
        cur = jnp.asarray([tok], jnp.int32)
        for _ in range(4):
            cur, cache, recent = lm.decode_step(cache, cur, recent, sp, jrandom.PRNGKey(0))
            seq.append(int(cur[0]))
        singles.append(seq)

    # batched: prefill each row into a 2-row cache at its own length
    from crane_tpu.ops.sampling import SamplingParams
    cache = lm.init_cache(2, 32)
    first = []
    for b, pr in enumerate(prompts):
        c1 = lm.init_cache(1, 32)
        pad = np.zeros((1, 8), np.int32)
        pad[0, : len(pr)] = pr
        logits, c1 = lm.prefill(c1, pad, [len(pr)])
        first.append(int(np.asarray(logits).argmax(-1)[0]))
        # copy row into the batch cache (slot assembly, engine-style)
        layers = []
        for lc_b, lc_1 in zip(cache.layers, c1.layers):
            layers.append(type(lc_b)(
                k=lc_b.k.at[b].set(lc_1.k[0]), v=lc_b.v.at[b].set(lc_1.v[0]),
            ))
        cache = KVCache(layers=tuple(layers), lengths=cache.lengths.at[b].set(len(pr)))

    sp = SamplingParams.make(2, do_sample=False)
    recent = jnp.full((2, 4), -1, jnp.int32)
    cur = jnp.asarray(first, jnp.int32)
    seqs = [[first[0]], [first[1]]]
    for _ in range(4):
        cur, cache, recent = lm.decode_step(cache, cur, recent, sp, jax.random.PRNGKey(0))
        for b in range(2):
            seqs[b].append(int(cur[b]))
    assert seqs == singles


def test_isq_quantized_generation_close(tmp_path):
    """ISQ int8 path generates the same greedy tokens on a tiny model
    (reference bar: byte-comparable across bf16/ISQ paths, qwen3_5_quant.rs)."""
    _, d = _save_tiny(tmp_path, "qwen3")
    lm = from_pretrained(d, dtype=jnp.float32)
    base = lm.generate([3, 14, 15, 92], GenerationConfig.greedy(8))
    lmq = from_pretrained(d, dtype=jnp.float32, quant_bits=8)
    gotq = lmq.generate([3, 14, 15, 92], GenerationConfig.greedy(8))
    assert base == gotq
