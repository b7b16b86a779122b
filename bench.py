"""Benchmark: Qwen3-0.6B-architecture decode throughput on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's best published small-LLM decode number —
Qwen2.5-0.5B at 35 tok/s (f16, Mac M1 Metal, /root/reference/README.md:477-479;
see BASELINE.md). Weights are randomly initialized at the real architecture
shapes (decode throughput is weight-content-independent); bf16 compute, B=1,
2048-slot KV cache, sampling in-graph — the full serving decode step.

Timing is the MARGINAL rate between two decode-chain lengths with a final
device->host sync (remote TPU runtimes can ack `block_until_ready` before
execution completes; the marginal rate also subtracts fixed dispatch/RPC
overhead). This understates burst throughput and is the honest sustained
number.
"""

from __future__ import annotations

import json
import time

BASELINE_TOK_S = 35.0


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from crane_tpu.models.causal_lm import CausalLM
    from crane_tpu.models.init import QWEN3_0_6B, init_params
    from crane_tpu.ops.sampling import SamplingParams
    from crane_tpu.utils.timing import host_sync

    cfg = QWEN3_0_6B
    params = init_params(cfg, seed=0, dtype=jnp.bfloat16)
    lm = CausalLM(cfg, params, dtype=jnp.bfloat16)

    prompt = np.random.default_rng(0).integers(0, cfg.vocab_size, 64).astype(np.int32)
    padded = np.zeros((1, 64), np.int32)
    padded[0] = prompt
    sp = SamplingParams.make(1, do_sample=False)
    key = jax.random.PRNGKey(0)

    def run_chain(n: int) -> float:
        cache = lm.init_cache(1, 2048)
        recent = jnp.full((1, 64), -1, jnp.int32)
        logits, cache = lm.prefill(cache, padded, [64])
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        tok, cache, recent = lm.decode_step(cache, tok, recent, sp, key)
        host_sync(tok)  # warm compile + true sync
        t0 = time.perf_counter()
        cur = tok
        for _ in range(n):
            cur, cache, recent = lm.decode_step(cache, cur, recent, sp, key)
        host_sync(cur)
        return time.perf_counter() - t0

    run_chain(4)  # warmup
    rates = []
    for _ in range(3):
        t1 = run_chain(64)
        t2 = run_chain(320)
        rates.append((320 - 64) / max(t2 - t1, 1e-9))
    tok_s = sorted(rates)[1]  # median

    print(
        json.dumps(
            {
                "metric": "qwen3_0.6b_decode_tok_s_per_chip",
                "value": round(tok_s, 2),
                "unit": "tokens/sec",
                "vs_baseline": round(tok_s / BASELINE_TOK_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
