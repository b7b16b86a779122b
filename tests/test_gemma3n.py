"""Gemma3n text parity vs HF — the reference's Gemma3n/"Gemma4" family
(gemma4/modeling.rs): AltUp 4-stream predict/correct, Laurel low-rank
residual, Per-Layer Embeddings gated into the non-active streams, KV-cache
sharing across the tail layers, RMS v-norm + unit attention scaling,
per-layer MLP widths with gaussian-top-k activation sparsity, final logit
softcapping."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from crane_tpu.models.gemma3n import Gemma3nLM, from_pretrained


LAYER_TYPES = [
    "sliding_attention", "sliding_attention", "full_attention",
    "sliding_attention", "sliding_attention", "full_attention",
]


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    torch.manual_seed(0)
    cfg = transformers.Gemma3nTextConfig(
        vocab_size=128, vocab_size_per_layer_input=128,
        hidden_size=32, hidden_size_per_layer_input=16,
        intermediate_size=[64] * 6, num_hidden_layers=6,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        layer_types=LAYER_TYPES, sliding_window=4,
        num_kv_shared_layers=2, laurel_rank=4,
        altup_num_inputs=4, altup_active_idx=0,
        activation_sparsity_pattern=[0.95, 0.95, 0.0, 0.0, 0.0, 0.0],
        rope_theta=1_000_000.0, rope_local_base_freq=10_000.0,
        max_position_embeddings=64, final_logit_softcapping=30.0,
        tie_word_embeddings=True,
    )
    model = transformers.Gemma3nForCausalLM(cfg).eval().to(torch.float32)
    d = str(tmp_path_factory.mktemp("g3n") / "m")
    model.save_pretrained(d, safe_serialization=True)
    return model, d


def test_prefill_logits_match_hf(tiny):
    model, d = tiny
    # longer than the sliding window so windowing + KV sharing both matter
    ids = np.array([[1, 5, 9, 17, 33, 2, 7, 11, 4, 3, 22, 8]], dtype=np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).logits.numpy()
    lm = from_pretrained(d, dtype=jnp.float32, max_seq=32)
    assert lm.cfg.first_shared_layer == 4
    assert lm.cfg.kv_source(4) == 3 and lm.cfg.kv_source(5) == 2
    got = lm.prefill_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))


def test_greedy_generation_matches_hf(tiny):
    model, d = tiny
    prompt = [3, 14, 15, 92, 6, 44, 12, 7, 9, 10]
    with torch.no_grad():
        ref = model.generate(
            torch.tensor([prompt]), max_new_tokens=8, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )[0, len(prompt):].tolist()
    lm = from_pretrained(d, dtype=jnp.float32, max_seq=32)
    got = lm.generate_greedy(np.asarray([prompt]), 8)
    assert got == ref


def test_decode_equals_prefill(tiny):
    """KV-shared decode continuity: stepping one token at a time reproduces
    the one-shot prefill logits at every position."""
    _, d = tiny
    lm = from_pretrained(d, dtype=jnp.float32, max_seq=32)
    ids = np.array([[1, 5, 9, 17, 33, 2, 7, 11]], dtype=np.int32)
    full = lm.prefill_logits(ids)
    cache = lm.new_cache()
    logits, cache = lm._prefill(lm.params, jnp.asarray(ids[:, :3]), cache)
    np.testing.assert_allclose(np.asarray(logits), full[:, :3], rtol=1e-4, atol=1e-5)
    for t in range(3, ids.shape[1]):
        step, cache = lm._decode_step(
            lm.params, jnp.asarray(ids[:, t:t + 1]), cache, jnp.asarray([t], jnp.int32)
        )
        np.testing.assert_allclose(np.asarray(step), full[:, t], rtol=1e-4, atol=1e-5)


def test_activation_sparsity_is_load_bearing(tiny):
    """Zeroing the sparsity pattern must change the logits (proves the
    gaussian-top-k path executes on layers 0-1)."""
    import dataclasses

    _, d = tiny
    lm = from_pretrained(d, dtype=jnp.float32, max_seq=32)
    ids = np.array([[1, 5, 9, 17]], dtype=np.int32)
    a = lm.prefill_logits(ids)
    dense = Gemma3nLM(
        dataclasses.replace(lm.cfg, activation_sparsity=(0.0,) * 6),
        lm.params, max_seq=32,
    )
    b = dense.prefill_logits(ids)
    assert np.abs(a - b).max() > 1e-4
