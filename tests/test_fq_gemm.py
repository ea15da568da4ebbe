"""Pallas fused fake-quant GEMM: numerics vs the unfused XLA path
(interpreter mode on the CPU test platform)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adalog_tpu.ops import fq_gemm
from adalog_tpu.quantizers.uniform import uniform_quant
from adalog_tpu.quantizers.logarithm import adalog_quant
from adalog_tpu.quantizers.state import GELU_MIN


@pytest.fixture(autouse=True)
def interpret_mode():
    fq_gemm.INTERPRET = True
    yield
    fq_gemm.INTERPRET = False


def test_uniform_kernel_matches_xla(rng):
    T, K, O = 48, 32, 40
    x = jnp.asarray(rng.standard_normal((T, K)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((K, O)).astype(np.float32))
    scale, zp = np.float32(0.11), np.float32(7.0)
    params = jnp.asarray([scale, zp, 0.0, 0.0], jnp.float32)

    got = fq_gemm.fq_gemm(x, w, params, kind="uniform", bits=4, tm=16, to=16)
    x_q = uniform_quant(x, scale, zp, bits=4, symmetric=False)
    want = jnp.matmul(x_q, w, precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_adalog_shift_kernel_matches_xla(rng):
    T, K, O = 32, 24, 16
    # post-GeLU-like input range
    x = jnp.asarray((np.abs(rng.standard_normal((T, K))) - GELU_MIN
                     ).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((K, O)).astype(np.float32))
    scale, q = np.float32(1.7), np.float32(41.0)
    params = jnp.asarray([scale, 0.0, GELU_MIN, q], jnp.float32)

    got = fq_gemm.fq_gemm(x, w, params, kind="adalog_shift", bits=4,
                          tm=16, to=16)
    # inference form after the bias fold: quantize x+shift, no subtract-back
    x_q = adalog_quant(x + GELU_MIN, scale, q, bits=4)
    want = jnp.matmul(x_q, w, precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_padding_path(rng):
    """Non-multiple shapes are padded and sliced back."""
    T, K, O = 10, 8, 7
    x = jnp.asarray(rng.standard_normal((T, K)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((K, O)).astype(np.float32))
    params = jnp.asarray([0.2, 8.0, 0.0, 0.0], jnp.float32)
    got = fq_gemm.fq_gemm(x, w, params, kind="uniform", bits=6, tm=16, to=16)
    assert got.shape == (T, O)
    x_q = uniform_quant(x, jnp.float32(0.2), jnp.float32(8.0), bits=6,
                        symmetric=False)
    want = jnp.matmul(x_q, w, precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)
