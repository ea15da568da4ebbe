"""Uniform (affine) fake quantization as pure functions.

Parity: reference quantizers/uniform.py.
  - symmetric:  q = clamp(round(x/s), -N, N-1);           dq = q*s
  - asymmetric: q = clamp(round(x/s) + round(zp), 0, 2N-1); dq = (q - round(zp))*s
  with N = n_levels = 2**(bits-1)  (uniform.py:25-36).
  - twin (PTQ4ViT): separate positive/negative scales summed (uniform.py:57-68).
  - 32 bits => identity.

``training=True`` switches round() to the straight-through round so gradients
flow to x and scale (uniform.py:29, `round_ste` path), matching the reference's
``training_mode`` toggle used during BRECQ activation training.
"""

import jax.numpy as jnp

from adalog_tpu.quantizers.ste import round_ste, tclip


def n_levels(bits: int) -> int:
    return 2 ** (bits - 1)


def uniform_quant(x, scale, zero_point=None, *, bits: int, symmetric: bool,
                  training: bool = False):
    """Fake-quantize ``x`` with a uniform quantizer.

    scale/zero_point broadcast against x (per-tensor, per-channel, per-head,
    or per-row-group layouts are all just broadcasting shapes here).
    """
    if bits == 32:
        return x
    N = n_levels(bits)
    rnd = round_ste if training else jnp.round
    x_int = rnd(x / scale)
    if symmetric:
        x_q = tclip(x_int, -N, N - 1)
        return x_q * scale
    zp = round_ste(zero_point)
    x_q = tclip(x_int + zp, 0, 2 * N - 1)
    return (x_q - zp) * scale


def twin_uniform_quant(x, scale_pos, scale_neg, *, bits: int,
                       training: bool = False):
    """PTQ4ViT twin-range quantizer for post-GeLU activations.

    Positive half uses ``scale_pos`` clamped to [0, N-1]; negative half uses
    ``scale_neg`` clamped to [-N, 0]; halves are summed (uniform.py:57-68).
    """
    if bits == 32:
        return x
    N = n_levels(bits)
    rnd = round_ste if training else jnp.round
    x_pos = tclip(rnd(x / scale_pos), 0, N - 1) * scale_pos
    x_neg = tclip(rnd(x / scale_neg), -N, 0) * scale_neg
    return x_pos + x_neg
