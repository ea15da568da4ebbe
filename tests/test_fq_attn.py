"""Pallas fused attention fake-quant matmul vs the unfused XLA path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adalog_tpu.ops import fq_attn
from adalog_tpu.models.layers import MatMulSite, qmatmul
from adalog_tpu.quantizers.state import QuantizerState
from adalog_tpu.quantizers.apply import apply_quantizer


@pytest.fixture(autouse=True)
def interpret_mode():
    fq_attn.INTERPRET = True
    yield
    fq_attn.INTERPRET = False


def _site(rng, H, post_softmax: bool):
    Bq = QuantizerState(
        scale=jnp.asarray(0.1 + 0.05 * rng.random((1, H, 1, 1)), jnp.float32),
        zero_point=jnp.asarray(
            rng.integers(6, 10, (1, H, 1, 1)).astype(np.float32)),
        kind="uniform", bits=4, symmetric=False)
    if post_softmax:
        Aq = QuantizerState(scale=jnp.ones((1, 1, 1, 1), jnp.float32),
                            log_q=jnp.asarray(29.0), kind="adalog", bits=4)
    else:
        Aq = QuantizerState(
            scale=jnp.asarray(0.2 + 0.1 * rng.random((1, H, 1, 1)), jnp.float32),
            zero_point=jnp.asarray(
                rng.integers(6, 10, (1, H, 1, 1)).astype(np.float32)),
            kind="uniform", bits=4, symmetric=False)
    return MatMulSite(Aq=Aq, Bq=Bq)


@pytest.mark.parametrize("post_softmax", [False, True])
def test_fused_matches_unfused(rng, post_softmax):
    N, H, S, C = 2, 3, 16, 8
    if post_softmax:
        A = jnp.asarray(jax.nn.softmax(
            jnp.asarray(rng.standard_normal((N, H, S, S)).astype(np.float32)),
            axis=-1))
        B = jnp.asarray(rng.standard_normal((N, H, S, C)).astype(np.float32))
    else:
        A = jnp.asarray(rng.standard_normal((N, H, S, C)).astype(np.float32))
        B = jnp.asarray(rng.standard_normal((N, H, C, S)).astype(np.float32))
    site = _site(rng, H, post_softmax)

    want = jnp.matmul(apply_quantizer(site.Aq, A),
                      apply_quantizer(site.Bq, B),
                      precision=jax.lax.Precision.HIGHEST)
    got = fq_attn.run(site, A, B)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def _uniform_site(rng, H):
    def uq():
        return QuantizerState(
            scale=jnp.asarray(0.1 + 0.05 * rng.random((1, H, 1, 1)),
                              jnp.float32),
            zero_point=jnp.asarray(
                rng.integers(6, 10, (1, H, 1, 1)).astype(np.float32)),
            kind="uniform", bits=4, symmetric=False)
    return MatMulSite(Aq=uq(), Bq=uq())


def _flash_oracle(m1, m2, q, kT, v, logit_scale, bias):
    l = jnp.matmul(apply_quantizer(m1.Aq, q), apply_quantizer(m1.Bq, kT),
                   precision=jax.lax.Precision.HIGHEST) * logit_scale
    if bias is not None:
        G = q.shape[0] * q.shape[1]
        P, S, _ = bias.shape
        full = jnp.tile(bias, (G // P, 1, 1)).reshape(q.shape[:2] + (S, S))
        l = l + full
    sm = jax.nn.softmax(l, axis=-1)
    return jnp.matmul(apply_quantizer(m2.Aq, sm), apply_quantizer(m2.Bq, v),
                      precision=jax.lax.Precision.HIGHEST)


@pytest.mark.parametrize("with_bias", [False, True])
def test_flash_matches_unfused(rng, with_bias):
    """Fully fused q@kT -> scale -> (+bias) -> softmax -> AdaLog -> @v
    equals the unfused XLA chain; bias exercises the period-P broadcast
    (P = heads < G, the Swin rel-pos layout)."""
    N, H, S, D = 2, 4, 16, 8
    q = jnp.asarray(rng.standard_normal((N, H, S, D)).astype(np.float32))
    kT = jnp.asarray(rng.standard_normal((N, H, D, S)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((N, H, S, D)).astype(np.float32))
    m1 = _uniform_site(rng, H)
    m2 = _site(rng, H, post_softmax=True)
    scale = 1.0 if with_bias else D ** -0.5
    bias = (jnp.asarray(rng.standard_normal((H, S, S)).astype(np.float32))
            if with_bias else None)

    want = _flash_oracle(m1, m2, q, kT, v, scale, bias)
    got = fq_attn.run_flash(m1, m2, q, kT, v, logit_scale=scale, bias=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_flash_gate():
    """supports_flash requires both-uniform matmul1 + adalog matmul2."""
    rng = np.random.default_rng(0)
    m1, m2 = _uniform_site(rng, 2), _site(rng, 2, post_softmax=True)
    assert not fq_attn.supports_flash(m1, m2, "quant", "raw")
    assert not fq_attn.supports_flash(None, m2, "quant", "quant")
    assert not fq_attn.supports_flash(m2, m2, "quant", "quant")


@pytest.mark.parametrize("heads", [3, 4])
def test_fused_softmax_matches_unfused(rng, heads):
    """softmax fused in-kernel == XLA softmax -> quant -> matmul.

    heads=4 makes G=8 exercise the G-blocked grid (block_g > 1)."""
    N, S, C = 2, 16, 8
    L = jnp.asarray(rng.standard_normal((N, heads, S, S)).astype(np.float32))
    B = jnp.asarray(rng.standard_normal((N, heads, S, C)).astype(np.float32))
    site = _site(rng, heads, post_softmax=True)
    assert fq_attn.supports_softmax(site, "quant") or \
        jax.default_backend() != "tpu"

    A = jax.nn.softmax(L, axis=-1)
    want = jnp.matmul(apply_quantizer(site.Aq, A),
                      apply_quantizer(site.Bq, B),
                      precision=jax.lax.Precision.HIGHEST)
    got = fq_attn.run_softmax(site, L, B)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
