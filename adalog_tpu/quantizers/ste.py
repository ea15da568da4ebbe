"""Straight-through estimators for non-differentiable rounding ops.

Parity: reference quantizers/_ste.py:5-14 expresses these as
``(f(x) - x).detach() + x``; the JAX-native formulation is
``x + stop_gradient(f(x) - x)`` — identical forward value, identity gradient.
"""

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
