"""Gradient parity for the BRECQ training path vs torch autograd.

The reconstruction loop optimizes AdaRound alphas and activation scales
through straight-through estimators (reference block_recon.py:84-127 with the
quantizers' training_mode forwards). This oracle builds the same computation
in torch — soft-sigmoid rounded weights, STE-rounded asymmetric activations,
layer MSE — and checks jax.grad against torch autograd.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adalog_tpu.quantizers.adaround import (
    adaround_quant, adaround_init_alpha, GAMMA, ZETA,
)
from adalog_tpu.quantizers.uniform import uniform_quant

BITS = 4
N = 2 ** (BITS - 1)


@pytest.mark.slow
def test_brecq_grads_match_torch(rng):
    torch = pytest.importorskip("torch")

    T, I, O = 24, 10, 8
    x_np = rng.standard_normal((T, I)).astype(np.float32)
    w_np = (rng.standard_normal((O, I)) * 0.4).astype(np.float32)
    tgt_np = rng.standard_normal((T, O)).astype(np.float32)
    w_scale = np.float32(0.05)
    w_zp = np.float32(8.0)
    a_scale0 = np.float32(0.21)
    a_zp = np.float32(7.0)

    alpha0 = np.asarray(adaround_init_alpha(jnp.asarray(w_np), w_scale))

    # ---- torch oracle ----
    tw = torch.tensor(w_np)
    talpha = torch.tensor(alpha0, requires_grad=True)
    tascale = torch.tensor(a_scale0, requires_grad=True)
    tx = torch.tensor(x_np)
    ttgt = torch.tensor(tgt_np)

    soft = torch.clamp(torch.sigmoid(talpha) * (ZETA - GAMMA) + GAMMA, 0, 1)
    w_int = torch.floor(tw / w_scale) + soft
    w_q = (torch.clamp(w_int + w_zp, 0, 2 * N - 1) - w_zp) * w_scale

    x_div = tx / tascale
    x_round = x_div + (torch.round(x_div) - x_div).detach()   # round_ste
    x_q = (torch.clamp(x_round + round(a_zp), 0, 2 * N - 1) - round(a_zp)) \
        * tascale
    out = x_q @ w_q.T
    loss = ((out - ttgt) ** 2).sum(1).mean() / 10.0
    loss.backward()
    want_ga = talpha.grad.numpy()
    want_gs = float(tascale.grad)

    # ---- jax ----
    def loss_fn(alpha, a_scale):
        w_q = adaround_quant(jnp.asarray(w_np), w_scale, w_zp, alpha,
                             bits=BITS, symmetric=False, soft=True)
        x_q = uniform_quant(jnp.asarray(x_np), a_scale, jnp.float32(a_zp),
                            bits=BITS, symmetric=False, training=True)
        out = jnp.matmul(x_q, w_q.T, precision=jax.lax.Precision.HIGHEST)
        err = jnp.square(out - jnp.asarray(tgt_np))
        return jnp.mean(jnp.sum(err, axis=1)) / 10.0

    (ga, gs) = jax.grad(loss_fn, argnums=(0, 1))(
        jnp.asarray(alpha0), jnp.float32(a_scale0))

    np.testing.assert_allclose(np.asarray(ga), want_ga, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(gs), want_gs, rtol=2e-4, atol=1e-5)


@pytest.mark.slow
def test_adalog_training_grads_match_torch(rng):
    """Shifted-AdaLog training forward (continuous 2^(-code*q/r), STE round):
    gradients wrt scale match torch autograd."""
    torch = pytest.importorskip("torch")
    from adalog_tpu.quantizers.logarithm import adalog_quant
    from adalog_tpu.quantizers.state import GELU_MIN

    R, q = 37.0, 41.0
    x_np = (np.abs(rng.standard_normal(64)) - GELU_MIN).astype(np.float32)
    s0 = np.float32(1.3)

    tx = torch.tensor(x_np)
    ts = torch.tensor(s0, requires_grad=True)
    scaled = torch.clamp((tx + GELU_MIN) / ts, min=1e-15, max=1.0)
    raw_code = -torch.log2(scaled) * R / q
    code = raw_code + (torch.round(raw_code) - raw_code).detach()
    keep = (code < 2 * N).float().detach()
    code = torch.clamp(code, 0, 2 * N - 1)
    dq = (2 ** (-code * q / R)) * ts * keep - GELU_MIN
    loss = (dq ** 2).sum()
    loss.backward()
    want = float(ts.grad)

    def loss_fn(s):
        out = adalog_quant(jnp.asarray(x_np) + GELU_MIN, s, jnp.float32(q),
                           bits=BITS, training=True) - GELU_MIN
        return jnp.sum(out ** 2)

    got = float(jax.grad(loss_fn)(jnp.float32(s0)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)
