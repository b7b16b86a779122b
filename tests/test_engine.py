"""Serving-engine tests: static-slot continuous batching correctness.

Mirrors the reference's engine test strategy (scheduler/sequence/stats tests +
batch-vs-single consistency, SURVEY.md §4) on a tiny random model."""

import queue

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crane_tpu.generation.config import GenerationConfig
from crane_tpu.models.causal_lm import CausalLM
from crane_tpu.models.init import QWEN3_TINY, init_params
from crane_tpu.serve.engine import InferenceEngine
from crane_tpu.serve.sequence import (
    EngineRequest,
    FinishReason,
    SamplingOptions,
    Sequence,
)


@pytest.fixture(scope="module")
def lm():
    params = init_params(QWEN3_TINY, seed=0, dtype=jnp.float32)
    return CausalLM(QWEN3_TINY, params, dtype=jnp.float32)


def greedy_request(rid, prompt, n=8, eos=()):
    return EngineRequest(
        request_id=rid, prompt_ids=prompt, max_new_tokens=n,
        sampling=SamplingOptions(do_sample=False, repetition_penalty=1.0),
        eos_token_ids=eos,
    )


def collect(q):
    toks, reason = [], None
    while True:
        r = q.get(timeout=60)
        if r.finished:
            reason = r.finish_reason
            assert r.error is None, r.error
            break
        if r.token is not None:
            toks.append(r.token)
    return toks, reason


def run_until_idle(engine, max_steps=500):
    for _ in range(max_steps):
        if not engine.step() and engine.request_q.empty():
            return
    raise AssertionError("engine did not drain")


class TestEngine:
    def test_single_request_matches_generate(self, lm):
        prompt = [3, 14, 15, 92, 6]
        expected = lm.generate(prompt, GenerationConfig.greedy(8))

        engine = InferenceEngine(lm, max_slots=4, max_seq_len=128)
        q = engine.submit(greedy_request("r1", prompt))
        run_until_idle(engine)
        toks, reason = collect(q)
        assert toks == expected
        assert reason == FinishReason.LENGTH

    def test_concurrent_requests_match_single(self, lm):
        prompts = [[3, 14, 15], [92, 6, 44, 12, 7], [1], [5, 5, 5, 5]]
        expected = [lm.generate(p, GenerationConfig.greedy(6)) for p in prompts]

        engine = InferenceEngine(lm, max_slots=4, max_seq_len=128,
                                 decode_tokens_per_seq=4)
        qs = [engine.submit(greedy_request(f"r{i}", p, n=6))
              for i, p in enumerate(prompts)]
        run_until_idle(engine)
        for q, exp in zip(qs, expected):
            toks, _ = collect(q)
            assert toks == exp

    def test_more_requests_than_slots(self, lm):
        """Waiting queue drains as slots free (continuous batching)."""
        prompts = [[i + 1, i + 2] for i in range(6)]
        expected = [lm.generate(p, GenerationConfig.greedy(4)) for p in prompts]
        engine = InferenceEngine(lm, max_slots=2, max_seq_len=64,
                                 decode_tokens_per_seq=2)
        qs = [engine.submit(greedy_request(f"r{i}", p, n=4))
              for i, p in enumerate(prompts)]
        run_until_idle(engine)
        for q, exp in zip(qs, expected):
            toks, _ = collect(q)
            assert toks == exp
        assert engine.stats.requests_completed == 6

    def test_eos_stops_early(self, lm):
        prompt = [3, 14, 15]
        full = lm.generate(prompt, GenerationConfig.greedy(8))
        eos = full[2]  # third generated token acts as EOS
        engine = InferenceEngine(lm, max_slots=2, max_seq_len=64)
        q = engine.submit(greedy_request("r1", prompt, n=8, eos=(eos,)))
        run_until_idle(engine)
        toks, reason = collect(q)
        assert reason == FinishReason.STOP
        assert toks == full[:2]  # EOS itself not streamed

    def test_prompt_too_long_rejected(self, lm):
        engine = InferenceEngine(lm, max_slots=1, max_seq_len=64)
        q = engine.submit(greedy_request("r1", list(range(80)), n=4))
        run_until_idle(engine)
        r = q.get(timeout=10)
        assert r.finished and r.error is not None
        assert engine.stats.requests_failed == 1

    def test_abort_waiting_and_running(self, lm):
        engine = InferenceEngine(lm, max_slots=1, max_seq_len=64,
                                 decode_tokens_per_seq=1)
        q1 = engine.submit(greedy_request("r1", [1, 2, 3], n=50))
        q2 = engine.submit(greedy_request("r2", [4, 5], n=4))
        # r1 admitted, r2 waits
        engine.step()
        engine.step()
        engine.abort("r1")
        run_until_idle(engine)
        # r1 aborted, r2 completes
        reason1 = None
        while True:
            r = q1.get(timeout=10)
            if r.finished:
                reason1 = r.finish_reason
                break
        assert reason1 == FinishReason.ABORT
        toks2, reason2 = collect(q2)
        assert len(toks2) == 4

    def test_slot_reuse_is_clean(self, lm):
        """A slot reused after a finished sequence must not leak KV."""
        engine = InferenceEngine(lm, max_slots=1, max_seq_len=64)
        p1, p2 = [9, 8, 7, 6, 5], [3, 14, 15]
        exp2 = lm.generate(p2, GenerationConfig.greedy(5))
        q1 = engine.submit(greedy_request("a", p1, n=3))
        q2 = engine.submit(greedy_request("b", p2, n=5))
        run_until_idle(engine)
        collect(q1)
        toks2, _ = collect(q2)
        assert toks2 == exp2

    def test_stats_snapshot(self, lm):
        engine = InferenceEngine(lm, max_slots=2, max_seq_len=64)
        q = engine.submit(greedy_request("r1", [1, 2, 3], n=4))
        run_until_idle(engine)
        collect(q)
        snap = engine.stats.snapshot()
        assert snap["requests_completed"] == 1
        assert snap["prompt_tokens"] == 3
        assert snap["generated_tokens"] == 4
        assert snap["decode_tok_s"] >= 0


class TestPreemption:
    """Longest-first preempt-and-requeue under slot starvation (reference
    engine/mod.rs:477-545 translated to static slots: the scarce resource
    is slots, KV state is reconstructed by re-prefilling prompt+generated)."""

    def test_preempted_stream_matches_unpreempted(self, lm):
        prompt_a, prompt_b = [3, 14, 15, 92, 6], [7, 8, 9]
        exp_a = lm.generate(prompt_a, GenerationConfig.greedy(12))
        exp_b = lm.generate(prompt_b, GenerationConfig.greedy(4))

        engine = InferenceEngine(lm, max_slots=1, max_seq_len=128,
                                 decode_tokens_per_seq=2, preempt_after_s=0.0)
        qa = engine.submit(greedy_request("a", prompt_a, n=12))
        for _ in range(3):  # admit A, decode a couple of blocks
            engine.step()
        qb = engine.submit(greedy_request("b", prompt_b, n=4))
        run_until_idle(engine)

        toks_b, _ = collect(qb)
        toks_a, _ = collect(qa)
        assert toks_b == exp_b
        # byte-identical despite mid-stream eviction + KV reconstruction
        assert toks_a == exp_a
        assert engine.stats.requests_preempted == 1
        assert engine.stats.requests_completed == 2

    def test_requeued_victim_never_retriggers_preemption(self, lm):
        """Two long requests at timeout 0 must not ping-pong: the requeued
        victim waits for a natural release, so exactly one preemption."""
        engine = InferenceEngine(lm, max_slots=1, max_seq_len=128,
                                 decode_tokens_per_seq=2, preempt_after_s=0.0)
        qa = engine.submit(greedy_request("a", [1, 2, 3], n=10))
        for _ in range(3):
            engine.step()
        qb = engine.submit(greedy_request("b", [4, 5, 6], n=10))
        run_until_idle(engine)
        toks_a, _ = collect(qa)
        toks_b, _ = collect(qb)
        assert len(toks_a) == 10 and len(toks_b) == 10
        assert engine.stats.requests_preempted == 1

    def test_preemption_disabled_by_default_config(self, lm):
        engine = InferenceEngine(lm, max_slots=1, max_seq_len=64,
                                 decode_tokens_per_seq=2, preempt_after_s=None)
        qa = engine.submit(greedy_request("a", [1, 2], n=6))
        for _ in range(3):
            engine.step()
        qb = engine.submit(greedy_request("b", [3, 4], n=4))
        run_until_idle(engine)
        collect(qa), collect(qb)
        assert engine.stats.requests_preempted == 0
        assert engine.stats.requests_completed == 2


class TestEngineThread:
    def test_threaded_run(self, lm):
        engine = InferenceEngine(lm, max_slots=2, max_seq_len=64)
        engine.start()
        try:
            q = engine.submit(greedy_request("r1", [3, 14, 15], n=5))
            toks, reason = collect(q)
            assert len(toks) == 5
        finally:
            engine.stop()


def test_hbm_budget_check_rejects_oversized_config(lm):
    """Startup must fail fast with the sizing math when weights + committed
    KV exceed the device limit (reference memory governor,
    engine/mod.rs:199-214)."""
    import os

    import pytest

    from crane_tpu.serve.engine import InferenceEngine

    os.environ["CRANE_HBM_BYTES"] = str(1024 * 1024)  # 1 MiB: nothing fits
    try:
        with pytest.raises(RuntimeError, match="HBM budget exceeded"):
            InferenceEngine(lm, max_slots=4, max_seq_len=512)
    finally:
        del os.environ["CRANE_HBM_BYTES"]
    # generous limit: constructs fine
    os.environ["CRANE_HBM_BYTES"] = str(64 * 1024 ** 3)
    try:
        InferenceEngine(lm, max_slots=4, max_seq_len=512)
    finally:
        del os.environ["CRANE_HBM_BYTES"]


def test_hbm_budget_sp_counts_replicated_weights(lm):
    """Under a sequence mesh only the KV sequence axis shards; weights
    REPLICATE per chip (parallel/sequence.py) — the budget check must count
    full weights + kv/n, not (weights+kv)/n (VERDICT r3 weak #3)."""
    import os

    import pytest

    from crane_tpu.parallel.sequence import make_sp_mesh, sp_shard_lm
    from crane_tpu.serve.engine import InferenceEngine, _tree_bytes

    slm = sp_shard_lm(lm, make_sp_mesh(4))
    weights = _tree_bytes(slm.params)
    kv = _tree_bytes(
        jax.eval_shape(lambda: slm.init_cache(4, 512, quant_bits=None))
    )
    per_chip = int((weights + kv // 4) * 1.15)
    wrong = int((weights + kv) * 1.15) // 4  # the old accounting
    assert wrong < per_chip  # the configs this distinction matters for
    os.environ["CRANE_HBM_BYTES"] = str((wrong + per_chip) // 2)
    try:
        with pytest.raises(RuntimeError, match="HBM budget exceeded"):
            InferenceEngine(slm, max_slots=4, max_seq_len=512)
    finally:
        del os.environ["CRANE_HBM_BYTES"]
    os.environ["CRANE_HBM_BYTES"] = str(per_chip + 1024)
    try:
        InferenceEngine(slm, max_slots=4, max_seq_len=512)
    finally:
        del os.environ["CRANE_HBM_BYTES"]


@pytest.mark.parametrize("dp,tp", [(1, 2), (4, 1), (2, 2)])
def test_hbm_budget_weights_divide_by_tp_only(lm, dp, tp):
    """Weights shard ONLY over tp (parallel/sharding.py: every weight spec
    uses "tp"); KV shards over dp x tp. Under --dp the old accounting
    (everything / mesh.size) approved configs needing tp_extent x more weight
    bytes per chip than approved (VERDICT r4 weak #3, generalizing the r3 sp
    fix). Accept/reject both directions in tp, dp, and dp x tp topologies."""
    import os

    from crane_tpu.parallel.inference import shard_lm
    from crane_tpu.parallel.sharding import make_mesh
    from crane_tpu.serve.engine import InferenceEngine, _tree_bytes

    mesh = make_mesh(dp=dp, tp=tp)
    slm = shard_lm(lm, mesh)
    weights = _tree_bytes(slm.params)
    kv = _tree_bytes(
        jax.eval_shape(lambda: slm.init_cache(4, 512, quant_bits=None))
    )
    need = int((weights // tp + kv // mesh.size) * 1.15)
    if dp > 1:
        # the configs this distinction matters for: the old accounting
        # under-counts per-chip residency whenever weights replicate
        wrong = int((weights + kv) * 1.15) // mesh.size
        assert wrong < need
    os.environ["CRANE_HBM_BYTES"] = str(need - 1024)
    try:
        with pytest.raises(RuntimeError, match="HBM budget exceeded"):
            InferenceEngine(slm, max_slots=4, max_seq_len=512)
    finally:
        del os.environ["CRANE_HBM_BYTES"]
    os.environ["CRANE_HBM_BYTES"] = str(need + 1024)
    try:
        InferenceEngine(slm, max_slots=4, max_seq_len=512)
    finally:
        del os.environ["CRANE_HBM_BYTES"]


def test_backed_up_queue_keeps_full_decode_blocks(lm):
    """A waiting queue with every slot busy must NOT throttle running
    sequences to 1-token blocks: while no slot is free and no preemption is
    imminent, decode keeps running decode_tokens_per_seq-sized blocks (the
    aggregate rate stays unchanged during slot starvation)."""
    engine = InferenceEngine(lm, max_slots=1, max_seq_len=128,
                             decode_tokens_per_seq=4, preempt_after_s=1e9)
    block_sizes = []
    orig = engine._decode_block
    engine._decode_block = lambda n: (block_sizes.append(n), orig(n))[1]

    qa = engine.submit(greedy_request("a", [1, 2, 3], n=16))
    engine.step()  # admit a
    qb = engine.submit(greedy_request("b", [4, 5], n=4))  # backs up the queue
    run_until_idle(engine)
    collect(qa), collect(qb)
    # every decode block while b waited (and after) ran at full width
    assert block_sizes and all(n == 4 for n in block_sizes)
    assert engine.stats.requests_completed == 2


def test_imminent_preemption_shortens_decode_blocks(lm):
    """With the starvation timer about to fire, blocks drop to 1 token so
    the preemption check runs promptly (admission latency over throughput)."""
    # timeout shorter than the 1s imminence margin: blocks throttle from the
    # moment b waits, while the preemption itself fires only at 0.5s
    engine = InferenceEngine(lm, max_slots=1, max_seq_len=128,
                             decode_tokens_per_seq=4, preempt_after_s=0.5)
    block_sizes = []
    orig = engine._decode_block
    engine._decode_block = lambda n: (block_sizes.append(n), orig(n))[1]

    qa = engine.submit(greedy_request("a", [1, 2, 3], n=12))
    engine.step()
    qb = engine.submit(greedy_request("b", [4, 5], n=4))
    run_until_idle(engine)
    collect(qa), collect(qb)
    assert 1 in block_sizes  # throttled while b starved toward the timeout


def test_preemption_admits_starved_request_not_requeued_victim(lm):
    """When a preemption is triggered FOR a starved fresh request, the freed
    slot must go to it — not to an earlier-requeued victim at the queue
    head (which would cascade into a second pointless eviction)."""
    engine = InferenceEngine(lm, max_slots=1, max_seq_len=128,
                             decode_tokens_per_seq=2, preempt_after_s=0.0)
    qa = engine.submit(greedy_request("a", [1, 2, 3], n=12))
    for _ in range(3):
        engine.step()
    # b preempts a; a is requeued behind b
    qb = engine.submit(greedy_request("b", [4, 5, 6], n=12))
    for _ in range(3):
        engine.step()
    # c arrives while a (preempted) waits; preempting b for c must put c
    # in FRONT of a, so exactly one more preemption happens
    qc = engine.submit(greedy_request("c", [7, 8], n=4))
    run_until_idle(engine)
    for q in (qa, qb, qc):
        toks, _ = collect(q)
        assert toks
    assert engine.stats.requests_preempted == 2
    assert engine.stats.requests_completed == 3


class TestChunkedPrefill:
    """Chunked admission: long prompts prefill in chunks (first fresh, rest
    through the cached-continuation path) with decode interleaved — a long
    prompt no longer stalls running streams for its whole prefill."""

    def test_chunked_tokens_match_whole_prompt(self, lm):
        prompt = list(np.random.default_rng(7).integers(1, 500, 50))
        expected = lm.generate(prompt, GenerationConfig.greedy(6))
        engine = InferenceEngine(lm, max_slots=2, max_seq_len=256,
                                 prefill_chunk=16, bucket_align=16)
        q = engine.submit(greedy_request("r1", prompt, n=6))
        run_until_idle(engine)
        toks, reason = collect(q)
        assert toks == expected
        assert reason == FinishReason.LENGTH

    def test_final_chunk_bucket_clamped_to_buffer_end(self, lm):
        """A final chunk whose power-of-two bucket would overrun max_seq_len:
        dynamic_update_slice CLAMPS out-of-range starts, which used to shift
        the write left and silently corrupt live KV. The bucket is now
        capped at the remaining buffer; tokens must match whole-prompt."""
        prompt = list(np.random.default_rng(11).integers(1, 500, 90))
        expected = lm.generate(prompt, GenerationConfig.greedy(4))
        # offsets 0/32/64; last chunk n=26 buckets to 64 -> 64+64 > 96
        engine = InferenceEngine(lm, max_slots=1, max_seq_len=96,
                                 prefill_chunk=32, bucket_align=32)
        q = engine.submit(greedy_request("r1", prompt, n=4))
        run_until_idle(engine)
        toks, _ = collect(q)
        assert toks == expected

    def test_short_prompts_take_the_single_dispatch_path(self, lm):
        engine = InferenceEngine(lm, max_slots=1, max_seq_len=128,
                                 prefill_chunk=64)
        calls = []
        orig = engine.lm.prefill_slot_continue
        engine.lm.prefill_slot_continue = (
            lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
        )
        q = engine.submit(greedy_request("r1", [1, 2, 3], n=4))
        run_until_idle(engine)
        collect(q)
        engine.lm.prefill_slot_continue = orig
        assert calls == []  # 3 tokens <= chunk: no continuation chunks

    def test_decode_interleaves_between_chunks(self, lm):
        """While a long admission is pending, running sequences keep
        decoding (one block between chunks)."""
        engine = InferenceEngine(lm, max_slots=2, max_seq_len=256,
                                 decode_tokens_per_seq=4, prefill_chunk=16,
                                 bucket_align=16)
        qa = engine.submit(greedy_request("a", [1, 2, 3], n=30))
        engine.step()  # admit a
        long_prompt = list(np.random.default_rng(8).integers(1, 500, 64))
        qb = engine.submit(greedy_request("b", long_prompt, n=4))
        # drive steps until b is fully admitted; count a's tokens meanwhile
        steps = 0
        while engine._pending is None and steps < 10:
            engine.step()  # picks up b -> starts pending
            steps += 1
        a_before = len(engine.slots[0].generated) if engine.slots[0] else 0
        while engine._pending is not None:
            engine.step()
        seq_a = next(s for s in engine.slots if s is not None and s.request_id == "a")
        assert len(seq_a.generated) > a_before  # a progressed during admission
        run_until_idle(engine)
        toks_a, _ = collect(qa)
        toks_b, _ = collect(qb)
        exp_a = lm.generate([1, 2, 3], GenerationConfig.greedy(30))
        exp_b = lm.generate(long_prompt, GenerationConfig.greedy(4))
        assert toks_a == exp_a  # interleaving never corrupts a's stream
        assert toks_b == exp_b

    def test_abort_mid_admission_frees_the_slot(self, lm):
        engine = InferenceEngine(lm, max_slots=1, max_seq_len=256,
                                 prefill_chunk=16, bucket_align=16)
        long_prompt = list(np.random.default_rng(9).integers(1, 500, 64))
        q1 = engine.submit(greedy_request("r1", long_prompt, n=4))
        engine.step()  # starts pending admission (first chunk done)
        assert engine._pending is not None
        engine.abort("r1")
        q2 = engine.submit(greedy_request("r2", [5, 6], n=3))
        run_until_idle(engine)
        r = q1.get(timeout=10)
        while not r.finished:
            r = q1.get(timeout=10)
        assert r.finish_reason == FinishReason.ABORT
        toks2, _ = collect(q2)
        assert toks2 == lm.generate([5, 6], GenerationConfig.greedy(3))

    def test_hybrid_gdn_chunked_matches_whole(self):
        """Chunked admission through GDN conv/recurrent state continuation."""
        import torch  # noqa: F401  (oracle fixture needs transformers)

        pytest.importorskip("transformers")
        from tests.test_qwen3_next_parity import _save_tiny_next
        import tempfile, pathlib

        from crane_tpu.models.auto import from_pretrained

        d = pathlib.Path(tempfile.mkdtemp())
        _, ckpt = _save_tiny_next(d)
        hlm = from_pretrained(ckpt, dtype=jnp.float32)
        prompt = list(np.random.default_rng(10).integers(1, 150, 40))
        expected = hlm.generate(prompt, GenerationConfig.greedy(5))
        engine = InferenceEngine(hlm, max_slots=2, max_seq_len=128,
                                 prefill_chunk=16, bucket_align=16)
        q = engine.submit(greedy_request("r1", prompt, n=5))
        run_until_idle(engine)
        toks, _ = collect(q)
        assert toks == expected


class TestStopStrings:
    """OpenAI ``stop`` strings, implemented for real (the reference parses
    the field but never consumes it, openai_api.rs:45): output halts at the
    first occurrence and the match itself is never emitted, even when the
    stop string spans token boundaries."""

    class LetterTok:
        def decode(self, ids, skip_special_tokens=True):
            return "".join(chr(97 + (i % 26)) for i in ids)

    def _lm(self, lm):
        lm2 = CausalLM(QWEN3_TINY, lm.params, dtype=jnp.float32,
                       tokenizer=self.LetterTok())
        return lm2

    def _run(self, lm2, prompt, n, stop=()):
        engine = InferenceEngine(lm2, max_slots=2, max_seq_len=128,
                                 decode_tokens_per_seq=2)
        req = EngineRequest(
            request_id="r", prompt_ids=prompt, max_new_tokens=n,
            sampling=SamplingOptions(do_sample=False, repetition_penalty=1.0),
            stop_strings=tuple(stop),
        )
        q = engine.submit(req)
        run_until_idle(engine)
        toks, texts, reason = [], [], None
        while True:
            r = q.get(timeout=60)
            if r.finished:
                reason = r.finish_reason
                break
            if r.token is not None:
                toks.append(r.token)
            if r.text:
                texts.append(r.text)
        return toks, "".join(texts), reason

    def test_earliest_match_position_wins(self):
        """OpenAI stop semantics: the stop that occurs EARLIEST in the text
        truncates, not the first one in tuple order."""
        req = EngineRequest("x", [1], stop_strings=("world", "lo"))
        seq = Sequence(req, queue.Queue())
        out, stopped = seq.filter_stop("hello world")
        assert stopped and out == "hel"

    def test_filter_holdback_and_cross_chunk_match(self):
        req = EngineRequest("x", [1], stop_strings=("XYZ",))
        seq = Sequence(req, queue.Queue())
        out1, s1 = seq.filter_stop("abcX")
        assert not s1 and out1 == "ab"  # holds back len(stop)-1 chars
        out2, s2 = seq.filter_stop("YZtail")
        assert s2 and out2 == "c"  # match assembled across chunks

    def test_stop_string_truncates_stream(self, lm):
        lm2 = self._lm(lm)
        _, full, _ = self._run(lm2, [3, 14, 15, 9], n=16)
        assert len(full) >= 8
        stop = full[4:7]
        toks, text, reason = self._run(lm2, [3, 14, 15, 9], n=16, stop=[stop])
        assert reason == FinishReason.STOP
        assert stop not in text
        assert text == full[: full.find(stop)]

    def test_no_match_flushes_heldback_tail(self, lm):
        lm2 = self._lm(lm)
        _, full, _ = self._run(lm2, [5, 6, 7], n=8)
        toks, text, reason = self._run(lm2, [5, 6, 7], n=8,
                                       stop=["£NEVER£"])
        assert reason == FinishReason.LENGTH
        assert text == full  # holdback fully flushed at finish


class TestSpeculativeEngine:
    """Engine-level prompt-lookup speculative decode: exact greedy fast
    path when one sequence runs alone (no reference counterpart)."""

    def _collect(self, engine, reqs):
        qs = [engine.submit(r) for r in reqs]
        run_until_idle(engine)
        outs = []
        for q in qs:
            toks, reason = collect(q)
            outs.append(toks)
        return outs

    def test_single_stream_byte_identical(self, lm):
        # repetitive prompt: drafts actually get accepted
        prompt = [5, 6, 7, 8] * 6
        plain = InferenceEngine(lm, max_slots=2, max_seq_len=128)
        spec = InferenceEngine(lm, max_slots=2, max_seq_len=128,
                               speculative="ngram")
        [exp] = self._collect(plain, [greedy_request("a", prompt, n=12)])
        [got] = self._collect(spec, [greedy_request("b", prompt, n=12)])
        assert got == exp

    def test_multi_stream_batched_spec_byte_identical(self, lm):
        """8 greedy streams with repetitive tails: ONE batched verify serves
        all of them per step (VERDICT r3 weak #5) and every stream matches
        the plain engine byte-for-byte."""
        rng = np.random.default_rng(3)
        prompts = [
            (rng.integers(1, 40, 4).tolist() * 5)[: 4 + 4 * i] + [5, 6, 7, 8] * 3
            for i in range(8)
        ]
        plain = InferenceEngine(lm, max_slots=8, max_seq_len=128)
        spec = InferenceEngine(lm, max_slots=8, max_seq_len=128,
                               speculative="ngram")
        exp = self._collect(plain, [greedy_request(f"p{i}", p, n=10)
                                    for i, p in enumerate(prompts)])
        got = self._collect(spec, [greedy_request(f"s{i}", p, n=10)
                                   for i, p in enumerate(prompts)])
        assert got == exp
        assert spec.stats.spec_steps > 0
        # emitted more tokens than verify steps x streams -> drafts accepted
        assert spec.stats.spec_tokens > 0

    def test_mixed_traffic_falls_back_to_batched(self, lm):
        """A sampled request in the batch makes speculative ineligible (a
        subset verify would pay a second weight stream for the rest): both
        engines take the plain batched path, byte-identical."""
        from crane_tpu.serve.sequence import EngineRequest, SamplingOptions

        rep = [5, 6, 7, 8] * 6
        sampled = lambda rid: EngineRequest(
            request_id=rid, prompt_ids=[9, 8, 7], max_new_tokens=6,
            sampling=SamplingOptions(do_sample=True, temperature=0.9, seed=3,
                                     repetition_penalty=1.0),
        )
        plain = InferenceEngine(lm, max_slots=2, max_seq_len=128)
        spec = InferenceEngine(lm, max_slots=2, max_seq_len=128,
                               speculative="ngram")
        exp = self._collect(plain, [greedy_request("p0", rep, n=8), sampled("p1")])
        got = self._collect(spec, [greedy_request("s0", rep, n=8), sampled("s1")])
        assert got == exp

    def test_sampling_requests_not_speculated(self, lm):
        from crane_tpu.serve.sequence import EngineRequest, SamplingOptions

        prompt = [5, 6, 7, 8, 5, 6, 7, 8]
        mk = lambda rid: EngineRequest(
            request_id=rid, prompt_ids=prompt, max_new_tokens=8,
            sampling=SamplingOptions(do_sample=True, temperature=0.8, seed=7,
                                     repetition_penalty=1.0),
        )
        plain = InferenceEngine(lm, max_slots=1, max_seq_len=128)
        spec = InferenceEngine(lm, max_slots=1, max_seq_len=128,
                               speculative="ngram")
        [exp] = self._collect(plain, [mk("a")])
        [got] = self._collect(spec, [mk("b")])
        assert got == exp  # same seed, same batched path

    def test_headroom_guard_near_buffer_end(self, lm):
        # position close to max_seq: spec must decline (the verify chunk
        # would clamp at the buffer end), falling back to plain decode
        prompt = [5, 6, 7, 8] * 13  # 52 tokens in a 64-slot cache
        plain = InferenceEngine(lm, max_slots=1, max_seq_len=64)
        spec = InferenceEngine(lm, max_slots=1, max_seq_len=64,
                               speculative="ngram")
        [exp] = self._collect(plain, [greedy_request("a", prompt, n=10)])
        [got] = self._collect(spec, [greedy_request("b", prompt, n=10)])
        assert got == exp

    def test_device_ngram_propose_matches_host(self):
        """The on-device proposer must produce the HOST proposer's drafts
        (most recent strictly-earlier n-gram occurrence, 0-padded) for
        arbitrary histories and lengths — including no-match, history
        shorter than the n-gram, and continuation running off the end."""
        from crane_tpu.models.causal_lm import device_ngram_propose, ngram_propose

        rng = np.random.default_rng(0)
        H, n, k = 64, 3, 6
        cases = []
        for L in [1, 2, 3, 4, 7, 20, 40, 64]:
            cases.append(rng.integers(1, 5, L).tolist())    # dense repeats
            cases.append(rng.integers(1, 50, L).tolist())   # sparse matches
        cases.append(([7, 8, 9] * 22)[:64])                 # match at the end
        B = len(cases)
        hist = np.zeros((B, H), np.int32)
        lens = np.zeros((B,), np.int32)
        for i, c in enumerate(cases):
            hist[i, : len(c)] = c
            lens[i] = len(c)
        got = np.asarray(device_ngram_propose(
            jnp.asarray(hist), jnp.asarray(lens), n, k))
        for i, c in enumerate(cases):
            assert got[i].tolist() == ngram_propose(c, n, k), (i, c)

    def test_gating_stops_probing_on_low_acceptance(self, lm):
        """Random (non-repetitive) prompts give ~zero draft acceptance: after
        the first probe dispatch the EMA falls below spec_min_gain and plain
        blocks take over — the never-lose property's fallback half. Output
        stays byte-identical to the plain engine."""
        rng = np.random.default_rng(9)
        prompts = [rng.integers(1, 500, 24).tolist() for _ in range(4)]
        plain = InferenceEngine(lm, max_slots=4, max_seq_len=256)
        spec = InferenceEngine(lm, max_slots=4, max_seq_len=256,
                               speculative="ngram", spec_rounds=4)
        exp = self._collect(plain, [greedy_request(f"p{i}", p, n=24)
                                    for i, p in enumerate(prompts)])
        got = self._collect(spec, [greedy_request(f"s{i}", p, n=24)
                                   for i, p in enumerate(prompts)])
        assert got == exp
        # exactly one probe ran (spec_rounds verify forwards), then cooldown
        assert spec.stats.spec_steps == 4
        assert spec._spec_wait > 0

    def test_history_survives_plain_blocks_between_probes(self, lm):
        """With spec_min_gain forced unattainable, every probe is followed by
        plain decode blocks (which must keep the device history rows
        current); byte-identity across the alternation proves the
        hist_len == lengths + 1 invariant holds through both paths."""
        prompt = [5, 6, 7, 8] * 6
        plain = InferenceEngine(lm, max_slots=2, max_seq_len=256)
        spec = InferenceEngine(lm, max_slots=2, max_seq_len=256,
                               speculative="ngram", spec_rounds=2,
                               spec_min_gain=100.0, spec_cooldown=1)
        [exp] = self._collect(plain, [greedy_request("a", prompt, n=24)])
        [got] = self._collect(spec, [greedy_request("b", prompt, n=24)])
        assert got == exp
        assert spec.stats.spec_steps >= 4  # several probes actually ran

    def test_recurrent_models_never_speculate(self):
        """GDN/conv hybrids can't roll a recurrent state back past rejected
        drafts — the engine must take the batched path, byte-identical."""
        torch = pytest.importorskip("torch")  # noqa: F841
        pytest.importorskip("transformers")
        import pathlib
        import tempfile

        from tests.test_qwen3_next_parity import _save_tiny_next
        from crane_tpu.models.auto import from_pretrained

        d = pathlib.Path(tempfile.mkdtemp())
        _, ckpt = _save_tiny_next(d)
        hlm = from_pretrained(ckpt, dtype=jnp.float32)
        prompt = [5, 6, 7, 8] * 6
        exp = hlm.generate(prompt, GenerationConfig.greedy(8))
        spec = InferenceEngine(hlm, max_slots=2, max_seq_len=128,
                               speculative="ngram")
        [got] = self._collect(spec, [greedy_request("h", prompt, n=8)])
        assert got == exp
        assert spec.stats.spec_steps == 0


class TestPrefixReuse:
    """Cross-request prefix reuse: a freed slot's resident KV serves any new
    prompt that shares its token prefix (multi-turn chats resend the
    conversation verbatim), so admission prefills only the unseen suffix.
    Exact by construction — KV at position i depends only on tokens <= i."""

    def _engine(self, lm, **kw):
        kw.setdefault("max_slots", 2)
        kw.setdefault("max_seq_len", 128)
        kw.setdefault("decode_tokens_per_seq", 2)
        kw.setdefault("prefix_reuse_min", 4)
        # exact token-level reuse for the fine-grained assertions below
        # (production default aligns reuse offsets to 64 for the
        # zero-recompile bucket discipline)
        kw.setdefault("bucket_align", 1)
        return InferenceEngine(lm, **kw)

    def _round(self, engine, rid, prompt, n):
        q = engine.submit(greedy_request(rid, prompt, n=n))
        run_until_idle(engine)
        toks, _ = collect(q)
        return toks

    def test_multiturn_reuse_is_token_identical(self, lm):
        engine = self._engine(lm)
        prompt = [3, 14, 15, 92, 6, 5, 35, 89]
        t1 = self._round(engine, "turn1", prompt, 6)
        # turn 2: client resends conversation + a new user turn
        prompt2 = prompt + t1 + [7, 9, 2]
        t2 = self._round(engine, "turn2", prompt2, 6)
        assert engine.stats.prefix_hits == 1
        # everything resident was reused: prompt + all but the final
        # generated token (whose KV was never written)
        assert engine.stats.prefix_tokens_reused == len(prompt) + len(t1) - 1
        assert t2 == lm.generate(prompt2, GenerationConfig.greedy(6))

    def test_partial_prefix_reuse(self, lm):
        engine = self._engine(lm)
        base = [3, 14, 15, 92, 6, 5, 35, 89]
        self._round(engine, "a", base, 4)
        # diverges after 6 shared tokens -> partial reuse of the prompt
        prompt2 = base[:6] + [70, 71, 72, 73]
        t2 = self._round(engine, "b", prompt2, 5)
        assert engine.stats.prefix_hits == 1
        assert engine.stats.prefix_tokens_reused == 6
        assert t2 == lm.generate(prompt2, GenerationConfig.greedy(5))

    def test_reuse_below_threshold_prefills_fresh(self, lm):
        engine = self._engine(lm, prefix_reuse_min=64)
        prompt = [3, 14, 15, 92, 6]
        t1 = self._round(engine, "a", prompt, 4)
        t2 = self._round(engine, "b", prompt + t1, 4)
        assert engine.stats.prefix_hits == 0
        assert t2 == lm.generate(prompt + t1, GenerationConfig.greedy(4))

    def test_reuse_composes_with_chunked_prefill(self, lm):
        engine = self._engine(lm, prefill_chunk=4)
        prompt = [3, 14, 15, 92, 6, 5, 35, 89, 44, 12]
        t1 = self._round(engine, "a", prompt, 4)
        prompt2 = prompt + t1 + [7, 9, 2, 11, 13, 17, 19, 23, 29]
        t2 = self._round(engine, "b", prompt2, 5)
        assert engine.stats.prefix_hits == 1
        assert t2 == lm.generate(prompt2, GenerationConfig.greedy(5))

    def test_reuse_composes_with_quantized_kv(self, lm):
        engine = self._engine(lm, kv_quant_bits=8)
        prompt = [3, 14, 15, 92, 6, 5, 35, 89]
        t1 = self._round(engine, "a", prompt, 5)
        prompt2 = prompt + t1 + [7, 9]
        t2 = self._round(engine, "b", prompt2, 5)
        assert engine.stats.prefix_hits == 1
        # quant cache: compare against the same engine path without reuse
        engine2 = self._engine(lm, kv_quant_bits=8, prefix_cache=False)
        t2_fresh = self._round(engine2, "b", prompt2, 5)
        assert t2 == t2_fresh

    def test_exact_resend_still_produces_logits(self, lm):
        # identical conversation resent: at least one suffix token must run
        engine = self._engine(lm)
        prompt = [3, 14, 15, 92, 6, 5, 35, 89]
        t1 = self._round(engine, "a", prompt, 4)
        resend = prompt + t1[:-1]  # exactly the resident tokens
        t2 = self._round(engine, "b", resend, 4)
        assert engine.stats.prefix_hits == 1
        assert engine.stats.prefix_tokens_reused == len(resend) - 1
        assert t2 == lm.generate(resend, GenerationConfig.greedy(4))

    def test_fresh_admission_prefers_nonresident_slot(self, lm):
        engine = self._engine(lm, max_slots=3)
        prompt = [3, 14, 15, 92, 6]
        self._round(engine, "a", prompt, 4)  # slot 0 now holds a resident
        # an unrelated prompt should land on a slot WITHOUT resident data
        q = engine.submit(greedy_request("b", [80, 81, 82], n=2))
        engine.step()
        assert engine.slots[0] is None  # resident slot left untouched
        run_until_idle(engine)
        collect(q)
        assert engine.stats.prefix_hits == 0

    def test_clear_prefix_cache(self, lm):
        engine = self._engine(lm)
        prompt = [3, 14, 15, 92, 6, 5, 35, 89]
        t1 = self._round(engine, "a", prompt, 4)
        engine.clear_prefix_cache()
        t2 = self._round(engine, "b", prompt + t1, 4)
        assert engine.stats.prefix_hits == 0
        assert t2 == lm.generate(prompt + t1, GenerationConfig.greedy(4))

    def test_hybrid_layer_types_disable_prefix_cache(self):
        import dataclasses as dc

        from crane_tpu.models.init import init_params

        cfg = dc.replace(
            QWEN3_TINY,
            layer_types=("full", "sliding") * (QWEN3_TINY.num_layers // 2),
            sliding_window=16,
        )
        params = init_params(cfg, seed=0, dtype=jnp.float32)
        hybrid = CausalLM(cfg, params, dtype=jnp.float32)
        engine = InferenceEngine(hybrid, max_slots=2, max_seq_len=64,
                                 prefix_cache=True, prefix_reuse_min=4)
        assert engine.prefix_cache is False
        prompt = [3, 14, 15, 92, 6, 5, 35, 89]
        q = engine.submit(greedy_request("a", prompt, n=4))
        run_until_idle(engine)
        t1, _ = collect(q)
        q2 = engine.submit(greedy_request("b", prompt + t1, n=4))
        run_until_idle(engine)
        t2, _ = collect(q2)
        assert engine.stats.prefix_hits == 0
        assert t2 == hybrid.generate(prompt + t1, GenerationConfig.greedy(4))


class TestZeroRecompileAfterWarmup:
    """warmup() compiles every shape serving can reach (VERDICT r3 weak #4):
    a traffic mix touching chunked prefill, deep-offset prefix reuse,
    mixed sampling admissions, batched decode, and speculative decode must
    trigger ZERO XLA compilations after warmup returns."""

    @staticmethod
    def _count_compiles(fn):
        import logging

        msgs = []

        class H(logging.Handler):
            def emit(self, r):
                m = r.getMessage()
                if m.startswith("Compiling "):
                    msgs.append(m)

        h = H()
        jax_logger = logging.getLogger("jax")
        old_level = jax_logger.level
        jax_logger.addHandler(h)
        jax_logger.setLevel(logging.WARNING)
        jax.config.update("jax_log_compiles", True)
        try:
            fn()
        finally:
            jax.config.update("jax_log_compiles", False)
            jax_logger.removeHandler(h)
            jax_logger.setLevel(old_level)
        return msgs

    def test_serving_mix_compiles_nothing_after_warmup(self, lm):
        engine = InferenceEngine(
            lm, max_slots=4, max_seq_len=256, decode_tokens_per_seq=4,
            prefill_chunk=64, speculative="ngram", spec_k=4,
            prefix_cache=True, prefix_reuse_min=8, bucket_align=8,
        )
        engine.warmup()

        rng = np.random.default_rng(0)
        long_prompt = rng.integers(1, 50, 150).tolist()  # chunked admission
        short = [3, 14, 15, 92, 6, 5, 35]

        def scenario():
            qs = [engine.submit(greedy_request("g", long_prompt, n=6))]
            sampled = EngineRequest(
                request_id="s", prompt_ids=short, max_new_tokens=6,
                sampling=SamplingOptions(do_sample=True, temperature=0.8,
                                         top_k=8, top_p=0.9,
                                         repetition_penalty=1.1),
            )
            qs.append(engine.submit(sampled))
            run_until_idle(engine)
            outs = [collect(q)[0] for q in qs]
            # prefix reuse at a deep (aligned-down) offset
            q3 = engine.submit(
                greedy_request("r", long_prompt + outs[0] + [7, 9], n=4))
            run_until_idle(engine)
            collect(q3)
            assert engine.stats.prefix_hits == 1
            # lone greedy stream with a repetitive tail -> speculative path
            rep = [5, 6, 7, 8] * 6
            q4 = engine.submit(greedy_request("spec", rep, n=8))
            run_until_idle(engine)
            collect(q4)
            assert engine.stats.spec_steps > 0

        msgs = self._count_compiles(scenario)
        assert msgs == [], f"recompiled after warmup: {msgs}"

    def test_reuse_near_buffer_end_shrinks_to_warmed_buckets(self, lm):
        """A reused prefix deep in the buffer forces the continuation bucket
        past max_seq: admission must chunk down to warmed power-of-two
        buckets (never an odd clamped shape) and stay token-identical."""
        engine = InferenceEngine(lm, max_slots=2, max_seq_len=64,
                                 prefix_cache=True, prefix_reuse_min=8,
                                 bucket_align=8)
        prompt = np.random.default_rng(1).integers(1, 50, 41).tolist()
        q = engine.submit(greedy_request("a", prompt, n=4))
        run_until_idle(engine)
        t1, _ = collect(q)
        resend = prompt + t1[:-1] + [11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21]
        assert len(resend) + 1 < 64
        q2 = engine.submit(greedy_request("b", resend, n=4))
        run_until_idle(engine)
        t2, _ = collect(q2)
        assert engine.stats.prefix_hits == 1
        assert t2 == lm.generate(resend, GenerationConfig.greedy(4))
