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
