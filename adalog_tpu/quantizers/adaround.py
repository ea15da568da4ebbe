"""AdaRound learned-rounding weight quantization (Nagel et al. 2020).

Parity: reference quantizers/adaround.py. The rounding decision for each weight
is a learnable logit ``alpha``; during reconstruction the forward uses a
rectified-sigmoid "soft target" in [0, 1], afterwards the hard 0/1 decision
(alpha >= 0) is frozen into the weights.
"""

import jax.numpy as jnp

from adalog_tpu.quantizers.ste import tclip

GAMMA, ZETA = -0.1, 1.1


def adaround_init_alpha(w, scale):
    """Inverse rectified sigmoid so that soft_targets(alpha) == frac(w/scale).

    Parity: adaround.py:62-69 — rest = w/s - floor(w/s);
    alpha = -log((zeta-gamma)/(rest-gamma) - 1)  =>  sigmoid(alpha)*(z-g)+g = rest.
    """
    rest = w / scale - jnp.floor(w / scale)
    return -jnp.log((ZETA - GAMMA) / (rest - GAMMA) - 1.0)


def adaround_soft_targets(alpha):
    """clip(sigmoid(alpha)*(zeta-gamma)+gamma, 0, 1) (adaround.py:59-60)."""
    return tclip(jnp.reciprocal(1.0 + jnp.exp(-alpha)) * (ZETA - GAMMA) + GAMMA,
                 0.0, 1.0)


def adaround_quant(w, scale, zero_point, alpha, *, bits: int, symmetric: bool,
                   soft: bool):
    """Fake-quantize weights with learned rounding (adaround.py:38-57).

    soft=True uses the differentiable soft target (reconstruction training);
    soft=False uses the hard (alpha >= 0) decision.
    """
    N = 2 ** (bits - 1)
    x_floor = jnp.floor(w / scale)
    if soft:
        x_int = x_floor + adaround_soft_targets(alpha)
    else:
        x_int = x_floor + (alpha >= 0).astype(w.dtype)
    if symmetric:
        x_q = tclip(x_int, -N, N - 1)
        return x_q * scale
    x_q = tclip(x_int + zero_point, 0, 2 * N - 1)
    return (x_q - zero_point) * scale


def adaround_hard_weight(w, scale, alpha):
    """Final hard-rounded weight values, *without* clamping, frozen into the
    model at the end of reconstruction (adaround.py:71-73 get_hard_value)."""
    return (jnp.floor(w / scale) + (alpha >= 0).astype(w.dtype)) * scale
