"""Pallas w8a16 quantized-matmul kernel correctness (interpret mode)."""

import numpy as np

import jax.numpy as jnp

from crane_tpu.ops.pallas.quant_matmul import quant_matmul_w8


def test_matches_dense():
    r = np.random.default_rng(0)
    I, O, B = 256, 512, 2
    x = jnp.asarray(r.standard_normal((B, I)), jnp.float32)
    codes = jnp.asarray(r.integers(-127, 127, (I, O)), jnp.int8)
    scales = jnp.asarray(np.abs(r.standard_normal((1, O))) * 0.01, jnp.float32)
    got = quant_matmul_w8(x, codes, scales, block_i=128, block_o=256, interpret=True)
    # the kernel computes the dot in bf16 (matching the decode path)
    ref = jnp.dot(
        x.astype(jnp.bfloat16), codes.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) * scales
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=5e-3, atol=5e-3
    )


def test_single_block():
    r = np.random.default_rng(1)
    x = jnp.asarray(r.standard_normal((1, 128)), jnp.float32)
    codes = jnp.asarray(r.integers(-10, 10, (128, 128)), jnp.int8)
    scales = jnp.ones((1, 128), jnp.float32)
    got = quant_matmul_w8(x, codes, scales, interpret=True)
    ref = jnp.dot(
        x.astype(jnp.bfloat16), codes.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=5e-3, atol=5e-3)
