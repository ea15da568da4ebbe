"""Differential parity of the BRECQ building blocks vs the actual reference.

Covers block_recon.py:160-238 (LossFunction + LinearTempDecay) and
quantizers/adaround.py against our recon/brecq.py and quantizers/adaround.py
on identical inputs. The training loop itself is covered by the torch
autograd oracle (test_grad_oracle.py); here the exact loss/schedule VALUES
are pinned to upstream.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ref_bridge import cuda_stubs, load_reference, load_reference_full

from adalog_tpu.quantizers.adaround import (
    adaround_init_alpha, adaround_soft_targets, adaround_quant,
    adaround_hard_weight,
)
from adalog_tpu.recon import brecq

BITS = 4


def _ref_block_recon():
    load_reference_full()          # installs fake timm first
    import utils.block_recon as br
    return br


@pytest.mark.slow
def test_adaround_vs_reference(rng):
    ref = load_reference()
    w = (rng.standard_normal((12, 16)) * 0.3).astype(np.float32)
    scale = np.full((12, 1), 0.021, np.float32)
    zp = np.full((12, 1), 7.0, np.float32)

    with cuda_stubs() as torch:
        uq = ref.uniform.UniformQuantizer(n_bits=BITS, symmetric=False,
                                          channel_wise=True)
        uq.scale = torch.nn.Parameter(torch.tensor(scale))
        uq.zero_point = torch.nn.Parameter(torch.tensor(zp))
        uq.inited = True
        from quantizers.adaround import AdaRoundQuantizer
        m = AdaRoundQuantizer(uq, torch.tensor(w))
        ref_alpha = m.alpha.detach().numpy()
        ref_soft = m.get_soft_targets().detach().numpy()
        m.soft_targets = True
        ref_fq_soft = m(torch.tensor(w)).detach().numpy()
        m.soft_targets = False
        ref_fq_hard = m(torch.tensor(w)).detach().numpy()
        ref_hard_w = m.get_hard_value(torch.tensor(w)).detach().numpy()

    alpha = adaround_init_alpha(jnp.asarray(w), jnp.asarray(scale))
    np.testing.assert_allclose(np.asarray(alpha), ref_alpha,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(adaround_soft_targets(alpha)),
                               ref_soft, rtol=1e-5, atol=1e-6)
    got_soft = adaround_quant(jnp.asarray(w), jnp.asarray(scale),
                              jnp.asarray(zp), alpha, bits=BITS,
                              symmetric=False, soft=True)
    np.testing.assert_allclose(np.asarray(got_soft), ref_fq_soft,
                               rtol=1e-5, atol=1e-6)
    got_hard = adaround_quant(jnp.asarray(w), jnp.asarray(scale),
                              jnp.asarray(zp), alpha, bits=BITS,
                              symmetric=False, soft=False)
    np.testing.assert_allclose(np.asarray(got_hard), ref_fq_hard,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(adaround_hard_weight(jnp.asarray(w), jnp.asarray(scale),
                                        alpha)),
        ref_hard_w, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_temp_decay_and_losses_vs_reference(rng):
    br = _ref_block_recon()
    iters = 1000

    # temperature schedule, 1-based counts, reference b_range/warmup
    decay = br.LinearTempDecay(iters, rel_start_decay=brecq.WARMUP,
                               start_b=brecq.B_RANGE[0],
                               end_b=brecq.B_RANGE[1])
    counts = np.array([1, 10, 199, 200, 201, 500, 900, 1000], np.float32)
    want = np.array([decay(float(c)) for c in counts], np.float32)
    got = np.array([brecq._b_temperature(c, iters) for c in counts],
                   np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # rec losses
    import torch
    pred = rng.standard_normal((8, 24)).astype(np.float32)
    tgt = rng.standard_normal((8, 24)).astype(np.float32)
    want_mse = float(br.LossFunction.lp_loss(
        torch.tensor(pred), torch.tensor(tgt), p=2.0) / 10)
    got_mse = float(brecq._rec_loss(jnp.asarray(pred), jnp.asarray(tgt),
                                    "mse"))
    np.testing.assert_allclose(got_mse, want_mse, rtol=1e-5)

    want_kl = float(torch.nn.functional.kl_div(
        torch.log_softmax(torch.tensor(pred), dim=-1),
        torch.softmax(torch.tensor(tgt), dim=-1), reduction="batchmean"))
    got_kl = float(brecq._rec_loss(jnp.asarray(pred), jnp.asarray(tgt), "kl"))
    np.testing.assert_allclose(got_kl, want_kl, rtol=1e-5, atol=1e-6)

    # round loss at a given alpha and b (reference: weight * sum(1-|2s-1|^b))
    alpha = rng.standard_normal((12, 16)).astype(np.float32)
    for b in (20.0, 7.3, 2.0):
        s = torch.clamp(torch.sigmoid(torch.tensor(alpha)) * 1.2 - 0.1, 0, 1)
        want_rnd = float(0.01 * (1 - ((s - 0.5).abs() * 2).pow(b)).sum())
        sj = adaround_soft_targets(jnp.asarray(alpha))
        got_rnd = float(0.01 * jnp.sum(1.0 - jnp.abs(2.0 * sj - 1.0) ** b))
        np.testing.assert_allclose(got_rnd, want_rnd, rtol=1e-5, atol=1e-6)
