"""GDN recurrence tests: scan reference vs HF torch oracle vs Pallas kernel.

Mirrors the reference's GDN test strategy (shape smoke + semantic head-order
tests + portable-vs-fused cross-checks, SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crane_tpu.ops.gdn import (
    causal_conv1d,
    causal_conv1d_update,
    compute_beta_g,
    gdn_decode_step,
    gdn_recurrence_ref,
    l2norm,
)


def rng(*shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape), jnp.float32)


def _rand_inputs(B=2, S=7, H=3, K=8, V=10, seed=0):
    r = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(r.standard_normal(s), jnp.float32)
    q, k = mk(B, S, H, K), mk(B, S, H, K)
    v = mk(B, S, H, V)
    g = -jnp.abs(mk(B, S, H)) * 0.5
    beta = jax.nn.sigmoid(mk(B, S, H))
    return q, k, v, g, beta


class TestScanVsTorchOracle:
    def test_matches_hf_recurrent_rule(self):
        torch = pytest.importorskip("torch")
        from transformers.models.qwen3_next.modeling_qwen3_next import (
            torch_recurrent_gated_delta_rule,
        )

        q, k, v, g, beta = _rand_inputs()
        y_ref, state_ref = gdn_recurrence_ref(q, k, v, g, beta)

        t = lambda x: torch.from_numpy(np.asarray(x))
        y_t, state_t = torch_recurrent_gated_delta_rule(
            t(q), t(k), t(v), t(g), t(beta),
            initial_state=None, output_final_state=True,
            use_qk_l2norm_in_kernel=True,
        )
        np.testing.assert_allclose(
            np.asarray(y_ref), y_t.numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(state_ref), state_t.numpy(), rtol=1e-4, atol=1e-5
        )

    def test_initial_state_continuation(self):
        """Splitting a sequence and carrying state must equal one pass
        (the serving decode contract)."""
        q, k, v, g, beta = _rand_inputs(S=9)
        y_full, s_full = gdn_recurrence_ref(q, k, v, g, beta)
        y1, s1 = gdn_recurrence_ref(
            q[:, :4], k[:, :4], v[:, :4], g[:, :4], beta[:, :4]
        )
        y2, s2 = gdn_recurrence_ref(
            q[:, 4:], k[:, 4:], v[:, 4:], g[:, 4:], beta[:, 4:], init_state=s1
        )
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y_full[:, :4]), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y_full[:, 4:]), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s_full), rtol=1e-4, atol=1e-5)

    def test_decode_step_equals_scan(self):
        q, k, v, g, beta = _rand_inputs(S=5)
        y_full, s_full = gdn_recurrence_ref(q, k, v, g, beta)
        state = jnp.zeros((2, 3, 8, 10), jnp.float32)
        for t in range(5):
            y_t, state = gdn_decode_step(
                q[:, t], k[:, t], v[:, t], g[:, t], beta[:, t], state
            )
            np.testing.assert_allclose(
                np.asarray(y_t), np.asarray(y_full[:, t]), rtol=1e-4, atol=1e-5
            )
        np.testing.assert_allclose(np.asarray(state), np.asarray(s_full), rtol=1e-4, atol=1e-5)


class TestChunked:
    def test_matches_scan(self):
        """Chunked MXU formulation ≡ sequential recurrence."""
        from crane_tpu.ops.gdn import gdn_recurrence_chunked

        q, k, v, g, beta = _rand_inputs(B=2, S=50, H=3, K=8, V=10, seed=11)
        y_ref, s_ref = gdn_recurrence_ref(q, k, v, g, beta)
        y_ch, s_ch = gdn_recurrence_chunked(q, k, v, g, beta, chunk_size=16)
        np.testing.assert_allclose(np.asarray(y_ch), np.asarray(y_ref), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(s_ch), np.asarray(s_ref), rtol=1e-4, atol=1e-4)

    def test_matches_scan_with_init_state_and_pad(self):
        from crane_tpu.ops.gdn import gdn_recurrence_chunked

        q, k, v, g, beta = _rand_inputs(B=1, S=7, H=2, K=8, V=8, seed=12)
        s0 = rng(1, 2, 8, 8, seed=13) * 0.3
        y_ref, s_ref = gdn_recurrence_ref(q, k, v, g, beta, init_state=s0)
        y_ch, s_ch = gdn_recurrence_chunked(q, k, v, g, beta, init_state=s0, chunk_size=4)
        np.testing.assert_allclose(np.asarray(y_ch), np.asarray(y_ref), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(s_ch), np.asarray(s_ref), rtol=1e-4, atol=1e-4)

    def test_matches_hf_chunked_oracle(self):
        torch = pytest.importorskip("torch")
        from transformers.models.qwen3_next.modeling_qwen3_next import (
            torch_chunk_gated_delta_rule,
        )
        from crane_tpu.ops.gdn import gdn_recurrence_chunked

        q, k, v, g, beta = _rand_inputs(B=1, S=37, H=2, K=16, V=8, seed=14)
        y_ch, s_ch = gdn_recurrence_chunked(q, k, v, g, beta, chunk_size=16)
        t = lambda x: torch.from_numpy(np.asarray(x))
        y_t, s_t = torch_chunk_gated_delta_rule(
            t(q), t(k), t(v), t(g), t(beta), chunk_size=16,
            initial_state=None, output_final_state=True,
            use_qk_l2norm_in_kernel=True,
        )
        np.testing.assert_allclose(np.asarray(y_ch), y_t.numpy(), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(s_ch), s_t.numpy(), rtol=1e-4, atol=1e-4)


class TestPallasKernel:
    def test_matches_scan_interpret(self):
        """Pallas kernel (interpret mode on CPU) ≡ scan reference — the
        CRANE_GDN_PORTABLE cross-check as a permanent test."""
        from crane_tpu.ops.pallas.gdn_scan import gdn_recurrence_pallas

        q, k, v, g, beta = _rand_inputs(B=2, S=13, H=4, K=16, V=16, seed=3)
        y_ref, s_ref = gdn_recurrence_ref(q, k, v, g, beta)
        y_pl, s_pl = gdn_recurrence_pallas(q, k, v, g, beta, chunk=8, interpret=True)
        np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s_pl), np.asarray(s_ref), rtol=1e-4, atol=1e-5)

    def test_with_initial_state_and_padding(self):
        from crane_tpu.ops.pallas.gdn_scan import gdn_recurrence_pallas

        q, k, v, g, beta = _rand_inputs(B=1, S=5, H=2, K=8, V=8, seed=4)
        s0 = rng(1, 2, 8, 8, seed=9) * 0.3
        y_ref, s_ref = gdn_recurrence_ref(q, k, v, g, beta, init_state=s0)
        # chunk larger than S forces tail padding
        y_pl, s_pl = gdn_recurrence_pallas(
            q, k, v, g, beta, init_state=s0, chunk=8, interpret=True
        )
        np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s_pl), np.asarray(s_ref), rtol=1e-4, atol=1e-5)


class TestBetaG:
    def test_formula(self):
        b = rng(2, 3, seed=1)
        a = rng(2, 3, seed=2)
        a_log = rng(3, seed=3)
        dt_bias = rng(3, seed=4)
        beta, g = compute_beta_g(b, a, a_log, dt_bias)
        np.testing.assert_allclose(
            np.asarray(beta), 1 / (1 + np.exp(-np.asarray(b))), rtol=1e-5
        )
        expect_g = -np.exp(np.asarray(a_log)) * np.log1p(
            np.exp(np.asarray(a) + np.asarray(dt_bias))
        )
        np.testing.assert_allclose(np.asarray(g), expect_g, rtol=1e-4)
        assert (np.asarray(g) <= 0).all()


class TestCausalConv:
    def test_matches_torch_conv(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        B, S, C, ksz = 2, 9, 6, 4
        x = rng(B, S, C, seed=5)
        w = rng(C, ksz, seed=6)
        y, state = causal_conv1d(x, w)

        xt = torch.from_numpy(np.asarray(x)).transpose(1, 2)  # [B, C, S]
        wt = torch.from_numpy(np.asarray(w)).unsqueeze(1)  # [C, 1, k]
        yt = F.silu(F.conv1d(xt, wt, padding=ksz - 1, groups=C)[:, :, :S])
        np.testing.assert_allclose(
            np.asarray(y), yt.transpose(1, 2).numpy(), rtol=1e-4, atol=1e-5
        )
        # state holds the last k inputs
        np.testing.assert_allclose(
            np.asarray(state), np.asarray(x)[:, S - ksz :, :], rtol=1e-6
        )

    def test_decode_continuation(self):
        """Prefill-then-decode conv must equal full prefill conv."""
        B, S, C, ksz = 1, 8, 5, 4
        x = rng(B, S, C, seed=7)
        w = rng(C, ksz, seed=8)
        y_full, _ = causal_conv1d(x, w)
        y_pre, state = causal_conv1d(x[:, :5], w)
        outs = [y_pre]
        for t in range(5, S):
            y_t, state = causal_conv1d_update(x[:, t], state, w)
            outs.append(y_t[:, None, :])
        got = jnp.concatenate(outs, axis=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(y_full), rtol=1e-4, atol=1e-5)

    def test_short_prefill_state_padded(self):
        B, S, C, ksz = 1, 2, 3, 4
        x = rng(B, S, C, seed=9)
        w = rng(C, ksz, seed=10)
        _, state = causal_conv1d(x, w)
        assert state.shape == (B, ksz, C)
        np.testing.assert_allclose(np.asarray(state[:, :2]), 0.0)
        np.testing.assert_allclose(np.asarray(state[:, 2:]), np.asarray(x), rtol=1e-6)


class TestContinuationPrefill:
    """Chunked/continuation prefill re-enters saved state (ADVICE r3):
    chunk N's conv window + recurrent state continue chunk N-1 exactly, so
    chunked prefill is numerically identical to whole prefill."""

    def test_conv1d_chunked_matches_whole(self):
        B, S, C, ksz = 2, 13, 5, 4
        x = rng(B, S, C, seed=20)
        w = rng(C, ksz, seed=21)
        y_full, state_full = causal_conv1d(x, w)
        outs, state = [], None
        for lo, hi in ((0, 5), (5, 8), (8, 13)):  # includes an S < k chunk
            y, state = causal_conv1d(
                x[:, lo:hi], w, init_window=state
            )
            outs.append(y)
        got = jnp.concatenate(outs, axis=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(y_full), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(state), np.asarray(state_full), rtol=1e-5, atol=1e-6)

    def test_conv1d_chunked_with_true_lengths(self):
        """Final chunk bucket-padded per row: saved window ends at each
        row's true length, continuing the left context."""
        B, C, ksz = 2, 4, 4
        x = rng(B, 11, C, seed=22)
        w = rng(C, ksz, seed=23)
        lens = jnp.asarray([3, 5], jnp.int32)  # valid tokens in the 2nd chunk
        _, st_whole_r0 = causal_conv1d(x[:, : 6 + 3], w)
        _, st_whole_r1 = causal_conv1d(x[:, : 6 + 5], w)
        _, state1 = causal_conv1d(x[:, :6], w)
        y2, state2 = causal_conv1d(
            x[:, 6:], w, init_window=state1, true_lengths=lens
        )
        np.testing.assert_allclose(
            np.asarray(state2[0]), np.asarray(st_whole_r0[0]), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(state2[1]), np.asarray(st_whole_r1[1]), rtol=1e-5, atol=1e-6
        )

    def _gdn_setup(self, seed=30):
        from crane_tpu.models.modules.gdn_layer import GdnConfig, gdn_block
        from crane_tpu.ops.kv_cache import GdnLayerCache

        g = GdnConfig(num_v_heads=4, num_k_heads=2, head_k_dim=8, head_v_dim=8)
        E = 32
        r = np.random.default_rng(seed)
        mk = lambda *s: jnp.asarray(r.standard_normal(s) * 0.2, jnp.float32)
        qkvz_out = g.num_k_heads * (2 * g.head_k_dim + 2 * g.v_per_group * g.head_v_dim)
        p = {
            "in_proj_qkvz": mk(E, qkvz_out),
            "in_proj_ba": mk(E, g.num_k_heads * 2 * g.v_per_group),
            "conv_w": mk(g.conv_dim, g.conv_kernel),
            "A_log": mk(g.num_v_heads),
            "dt_bias": mk(g.num_v_heads),
            "norm": jnp.ones((g.head_v_dim,), jnp.float32),
            "out_proj": mk(g.value_dim, E),
        }
        return g, p, E, gdn_block, GdnLayerCache

    def test_gdn_block_chunked_matches_whole(self):
        g, p, E, gdn_block, GdnLayerCache = self._gdn_setup()
        B, S = 1, 12
        x = rng(B, S, E, seed=31)
        cache0 = GdnLayerCache.empty(B, g.conv_kernel, g.conv_dim, g.num_v_heads,
                                     g.head_k_dim, g.head_v_dim, jnp.float32)
        y_full, c_full = gdn_block(g, p, x, cache0)
        c = cache0
        outs = []
        for lo, hi in ((0, 5), (5, 8), (8, 12)):
            y, c = gdn_block(g, p, x[:, lo:hi], c, continuation=lo > 0)
            outs.append(y)
        got = jnp.concatenate(outs, axis=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(y_full), rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(c.recurrent_state), np.asarray(c_full.recurrent_state),
            rtol=2e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(c.conv_state), np.asarray(c_full.conv_state), rtol=1e-5, atol=1e-6
        )

    def test_gdn_block_continuation_contract_errors(self):
        g, p, E, gdn_block, GdnLayerCache = self._gdn_setup()
        cache = GdnLayerCache.empty(1, g.conv_kernel, g.conv_dim, g.num_v_heads,
                                    g.head_k_dim, g.head_v_dim, jnp.float32)
        x = rng(1, 1, E, seed=32)
        with pytest.raises(ValueError):
            gdn_block(g, p, x, cache, decode=True, continuation=True)
        with pytest.raises(ValueError):
            gdn_block(g, p, rng(1, 4, E, seed=33), cache, cache_row=0, continuation=True)

    def test_hybrid_model_chunked_prefill_logits_match(self):
        """Model-level: prefill_slot(whole) == prefill_slot + slot_continue
        chunks, asserted on LOGITS (greedy tokens can hide a wrong state)."""
        torch = pytest.importorskip("torch")  # noqa: F841
        pytest.importorskip("transformers")
        import pathlib
        import tempfile

        from tests.test_qwen3_next_parity import _save_tiny_next
        from crane_tpu.models.auto import from_pretrained

        d = pathlib.Path(tempfile.mkdtemp())
        _, ckpt = _save_tiny_next(d)
        lm = from_pretrained(ckpt, dtype=jnp.float32)
        toks = np.asarray(
            np.random.default_rng(40).integers(1, 150, 24), np.int32
        )
        cache_w = lm.init_cache(2, 64)
        pad = np.zeros((1, 64), np.int32)
        pad[0, : len(toks)] = toks
        logits_whole, _ = lm.prefill_slot(cache_w, pad, 1, len(toks))

        cache_c = lm.init_cache(2, 64)
        p1 = np.zeros((1, 64), np.int32)
        p1[0, :16] = toks[:16]
        _, cache_c = lm.prefill_slot(cache_c, p1, 1, 16)
        p2 = np.zeros((1, 8), np.int32)
        p2[0, :8] = toks[16:]
        logits_chunk, _ = lm.prefill_slot_continue(cache_c, p2, 1, 16, 8)
        np.testing.assert_allclose(
            np.asarray(logits_chunk), np.asarray(logits_whole), rtol=2e-4, atol=2e-4
        )
