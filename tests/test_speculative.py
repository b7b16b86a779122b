"""Prompt-lookup (n-gram) speculative decoding: exact greedy equivalence.

Not in the reference — a TPU-native extension (one K+1-wide verify forward
reads the weights once, so accepted drafts are nearly free tokens on a
bandwidth-bound decode). The correctness bar is byte-identical greedy
output, which also proves the cache-rollback path: rejected-draft KV
entries written past the valid length must never leak into attention."""

import jax.numpy as jnp
import numpy as np
import pytest

from crane_tpu.generation.config import GenerationConfig
from crane_tpu.models.causal_lm import CausalLM, ngram_propose
from crane_tpu.models.init import QWEN3_TINY, init_params


@pytest.fixture(scope="module")
def lm():
    params = init_params(QWEN3_TINY, seed=0, dtype=jnp.float32)
    return CausalLM(QWEN3_TINY, params, dtype=jnp.float32)


class TestNgramPropose:
    def test_match_returns_continuation(self):
        h = [1, 2, 3, 9, 8, 1, 2, 3]
        assert ngram_propose(h, 3, 2) == [9, 8]

    def test_most_recent_occurrence_wins(self):
        h = [1, 2, 5, 7, 1, 2, 6, 1, 2]
        assert ngram_propose(h, 2, 1) == [6]

    def test_no_match_pads(self):
        assert ngram_propose([1, 2, 3, 4], 2, 3) == [0, 0, 0]
        assert ngram_propose([1], 3, 2) == [0, 0]

    def test_short_continuation_pads(self):
        h = [1, 2, 3, 1, 2]
        assert ngram_propose(h, 2, 4) == [3, 1, 2, 0]


class TestSpeculativeGenerate:
    @pytest.mark.parametrize("prompt", [
        [3, 14, 15, 92, 6, 53],
        [7, 7, 7, 7, 7, 7, 7, 7],            # degenerate repetition
        list(range(40, 52)) * 3,              # strongly periodic prompt
        [11],
    ])
    def test_matches_plain_greedy(self, lm, prompt):
        plain = lm.generate(prompt, GenerationConfig.greedy(24))
        spec = lm.generate(
            prompt, GenerationConfig.greedy(24, speculative="ngram"))
        assert spec == plain

    def test_spec_k_variants_match(self, lm):
        prompt = [3, 14, 15, 92, 6]
        plain = lm.generate(prompt, GenerationConfig.greedy(16))
        for k in (1, 4, 12):
            got = lm.generate(prompt, GenerationConfig.greedy(
                16, speculative="ngram", spec_k=k))
            assert got == plain, k

    def test_sampling_falls_back(self, lm):
        """do_sample configs take the normal block-decode path (exactness
        holds only for greedy): same seed must reproduce non-speculative
        sampling exactly."""
        prompt = [3, 14, 15]
        g1 = GenerationConfig(max_new_tokens=12, do_sample=True,
                              temperature=0.9, seed=5)
        g2 = GenerationConfig(max_new_tokens=12, do_sample=True,
                              temperature=0.9, seed=5, speculative="ngram")
        assert lm.generate(prompt, g1) == lm.generate(prompt, g2)

    def test_eos_inside_accepted_block_stops(self, lm):
        prompt = [3, 14, 15, 92, 6]
        full = lm.generate(prompt, GenerationConfig.greedy(16))
        eos = full[5]
        plain = lm.generate(prompt, GenerationConfig.greedy(16, eos_token_ids=(eos,)))
        spec = lm.generate(prompt, GenerationConfig.greedy(
            16, eos_token_ids=(eos,), speculative="ngram"))
        assert spec == plain

    def test_speculative_with_quantized_kv(self, lm):
        """Verify writes K+1 tokens per row into the QUANT cache (codes +
        scale planes) — must match plain greedy on the same quant config."""
        prompt = [3, 14, 15, 92, 6, 53]
        plain = lm.generate(prompt, GenerationConfig.greedy(16, kv_quant_bits=8))
        spec = lm.generate(prompt, GenerationConfig.greedy(
            16, kv_quant_bits=8, speculative="ngram"))
        assert spec == plain
