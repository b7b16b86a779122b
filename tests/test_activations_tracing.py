"""Snake/atan2 ops (reference kernels/cuda/{snake,atan2}.cu) and tracing
spans (reference with_tracing.rs)."""

import numpy as np

import jax
import jax.numpy as jnp

from crane_tpu.ops.activations import atan2, snake
from crane_tpu.utils import tracing


class TestSnake:
    def test_formula(self):
        x = jnp.asarray(np.linspace(-3, 3, 17), jnp.float32)
        a = jnp.asarray(0.7, jnp.float32)
        got = np.asarray(snake(x, a))
        want = np.asarray(x) + np.sin(0.7 * np.asarray(x)) ** 2 / 0.7
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_per_channel_alpha_and_bf16(self):
        x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 8)), jnp.bfloat16)
        a = jnp.asarray(np.abs(np.random.default_rng(1).standard_normal(8)) + 0.1, jnp.float32)
        out = snake(x, a)
        assert out.dtype == jnp.bfloat16 and out.shape == x.shape
        ref = snake(x.astype(jnp.float32), a)
        np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref), atol=0.05)

    def test_alpha_zero_is_identity(self):
        x = jnp.asarray([1.5, -2.0])
        np.testing.assert_allclose(np.asarray(snake(x, jnp.asarray(0.0))), np.asarray(x))

    def test_jit_fuses(self):
        f = jax.jit(lambda x: snake(x * 2, jnp.asarray(1.3)) + 1)
        out = f(jnp.ones((8,)))
        assert np.isfinite(np.asarray(out)).all()


class TestAtan2:
    def test_quadrants(self):
        y = jnp.asarray([1.0, 1.0, -1.0, -1.0, 0.0])
        x = jnp.asarray([1.0, -1.0, 1.0, -1.0, -2.0])
        got = np.asarray(atan2(y, x))
        np.testing.assert_allclose(got, np.arctan2(np.asarray(y), np.asarray(x)), rtol=1e-6)


class TestTracing:
    def test_span_accumulates(self):
        tracing.reset()
        with tracing.span("unit-a"):
            pass
        with tracing.span("unit-a"):
            pass
        calls, secs = tracing.stats()["unit-a"]
        assert calls == 2 and secs >= 0.0

    def test_traced_decorator_and_report(self):
        tracing.reset()

        @tracing.traced()
        def work():
            return 41 + 1

        assert work() == 42
        rep = tracing.report()
        assert "work" in rep and "calls" in rep

    def test_span_inside_jit_is_transparent(self):
        tracing.reset()

        @jax.jit
        def f(x):
            with tracing.span("jit-inner"):
                return x * 2

        np.testing.assert_allclose(np.asarray(f(jnp.asarray(3.0))), 6.0)

    def test_disable(self):
        tracing.reset()
        tracing.enable(False)
        with tracing.span("off"):
            pass
        assert "off" not in tracing.stats()
        tracing.enable(True)
