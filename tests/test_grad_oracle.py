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
