"""Quantizer state pytrees.

The reference holds quantizer parameters as mutable nn.Module attributes
(scale/zero_point/shift/q/table1/table2/bias_reparamed buffers, e.g.
quantizers/uniform.py:8-23, logarithm.py:68-81,105-135). Here the same state is
an immutable flax.struct dataclass: array leaves are pytree children (jitted,
sharded, checkpointed), the quantizer *kind* and bit width are static metadata
baked into the compiled computation.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

# |min(GeLU)| — the shift applied to post-GeLU activations so the log quantizers
# see non-negative inputs (reference linear.py:749, 0.16997124254703522).
GELU_MIN = 0.16997124254703522


@struct.dataclass
class QuantizerState:
    """One activation quantizer's parameters.

    kind:      'uniform' | 'twin' | 'log2' | 'logsqrt2' | 'adalog'
    bits:      bit width; 32 means identity
    symmetric: uniform only
    shifted:   quantize (x + shift) and subtract shift back until the shift has
               been folded into the consumer's bias (Shift* variants,
               logarithm.py:105-135, uniform.py:42-50)
    scale:     broadcastable against x; twin packs (pos, neg) along axis 0
    zero_point: asymmetric uniform only
    log_q:     AdaLog integer base numerator q (r is fixed at 37.0)
    bias_reparamed: 0/1 flag; when 1 the shift subtraction is skipped
    """

    scale: jnp.ndarray
    zero_point: Optional[jnp.ndarray] = None
    shift: Optional[jnp.ndarray] = None
    log_q: Optional[jnp.ndarray] = None
    bias_reparamed: Optional[jnp.ndarray] = None
    kind: str = struct.field(pytree_node=False, default="uniform")
    bits: int = struct.field(pytree_node=False, default=8)
    symmetric: bool = struct.field(pytree_node=False, default=False)
    shifted: bool = struct.field(pytree_node=False, default=False)


@struct.dataclass
class WeightQuantizerState:
    """One weight quantizer's parameters.

    ``scale``/``zero_point`` broadcast against the *viewed* weight:
      linear -> (n_V, crb_rows, 1) against (n_V, crb_rows, in)   (linear.py:262-263)
      conv   -> (out_channels, 1)  against (oc, ic*kh*kw)        (conv.py:229-230)
    ``alpha`` is the AdaRound rounding logit, present only during block
    reconstruction (block_recon.py:48-60); None otherwise.
    """

    scale: jnp.ndarray
    zero_point: Optional[jnp.ndarray] = None
    alpha: Optional[jnp.ndarray] = None
    bits: int = struct.field(pytree_node=False, default=8)
    symmetric: bool = struct.field(pytree_node=False, default=False)


def uniform_act_state(bits: int, scale_shape=(1,), symmetric: bool = False) -> QuantizerState:
    return QuantizerState(
        scale=jnp.zeros(scale_shape, jnp.float32),
        zero_point=None if symmetric else jnp.zeros(scale_shape, jnp.float32),
        kind="uniform", bits=bits, symmetric=symmetric,
    )


def adalog_act_state(bits: int, shifted: bool, scale_shape=(1,), r: float = 37.0) -> QuantizerState:
    return QuantizerState(
        scale=jnp.ones(scale_shape, jnp.float32),
        shift=jnp.full((1,), GELU_MIN, jnp.float32) if shifted else None,
        log_q=jnp.asarray(int(r), jnp.float32),
        bias_reparamed=jnp.zeros((), jnp.bool_) if shifted else None,
        kind="adalog", bits=bits, shifted=shifted,
    )


def log_act_state(kind: str, bits: int, shifted: bool, scale_shape=(1,)) -> QuantizerState:
    assert kind in ("log2", "logsqrt2")
    return QuantizerState(
        scale=jnp.ones(scale_shape, jnp.float32),
        shift=jnp.full((1,), GELU_MIN, jnp.float32) if shifted else None,
        bias_reparamed=jnp.zeros((), jnp.bool_) if shifted else None,
        kind=kind, bits=bits, shifted=shifted,
    )


def twin_act_state(bits: int) -> QuantizerState:
    return QuantizerState(scale=jnp.zeros((2, 1), jnp.float32), kind="twin", bits=bits)
