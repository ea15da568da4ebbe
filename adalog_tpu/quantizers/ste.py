"""Straight-through estimators for non-differentiable rounding ops.

Parity: reference quantizers/_ste.py:5-14 expresses these as
``(f(x) - x).detach() + x``; the JAX-native formulation is
``x + stop_gradient(f(x) - x)`` — identical forward value, identity gradient.
"""

import functools

import jax
import jax.numpy as jnp


def round_ste(x):
    """Round to nearest (ties to even), gradient = identity."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def floor_ste(x):
    """Floor, gradient = identity."""
    return x + jax.lax.stop_gradient(jnp.floor(x) - x)


def ceil_ste(x):
    """Ceil, gradient = identity."""
    return x + jax.lax.stop_gradient(jnp.ceil(x) - x)


@functools.partial(jax.custom_jvp, nondiff_argnums=(1, 2))
def tclip(x, lo, hi):
    """clip with the torch.clamp subgradient convention.

    jnp.clip passes gradient 0.5 at EXACT boundary values (it averages the
    min/max one-sided derivatives at ties) while torch.clamp passes 1.0.
    Quantization training paths clamp INTEGER codes, which sit exactly on the
    boundary whenever a value saturates — so the convention difference halves
    the gradient of every saturated element vs the reference's torch training
    (block_recon.py AdaRound/scale optimization). This clip matches torch:
    gradient 1 for lo <= x <= hi inclusive, 0 outside.
    """
    return jnp.clip(x, lo, hi)


@tclip.defjvp
def _tclip_jvp(lo, hi, primals, tangents):
    (x,), (dx,) = primals, tangents
    keep = jnp.logical_and(x >= lo, x <= hi).astype(x.dtype)
    return jnp.clip(x, lo, hi), dx * keep
