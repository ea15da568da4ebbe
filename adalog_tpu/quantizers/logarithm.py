"""Logarithmic fake quantization: log2, log-sqrt2, and the AdaLog quantizer.

Parity: reference quantizers/logarithm.py.

All log quantizers share the front end (logarithm.py:28-31):
    scaled = clip(x/scale, 1e-15, 1.0); code = round(-log2(scaled) * k)
    codes >= 2N underflow to zero;      codes clamped to [0, 2N-1]
with N = 2**(bits-1) and k the base factor (1 for log2, 2 for log-sqrt2,
r/q for AdaLog).

AdaLog (logarithm.py:68-102) quantizes with base 2**(q/r), r fixed at 37.0 and
integer q searched during calibration. Its hardware-friendly inference dequant
decomposes 2**(-code*q/r) into a right shift and a fixed-point mantissa:
    table1[i] = floor(i*q/r)                                   (shift amount)
    table2[i] = round(2**(-((q*i) mod r)/r) * (4N-2)) / (4N-2) (mantissa)
    dq = 2**(-table1[code]) * table2[code] * scale
We evaluate the decomposition *analytically* (floor/mod on integer products are
exact) instead of gathering from a materialized LUT — gathers are slow on the
TPU VPU while exp2 is cheap — and provide make_adalog_tables() to materialize
the reference-format LUT buffers for checkpoints.
"""

import numpy as np
import jax.numpy as jnp

from adalog_tpu.quantizers.ste import round_ste, tclip

ADALOG_R = 37.0
_EPS = 1e-15


def _log_codes(x, scale, k, bits: int, training: bool):
    """Shared code computation; returns (codes clamped to [0, 2N-1], underflow mask)."""
    N = 2 ** (bits - 1)
    scaled = jnp.clip(x / scale, _EPS, 1.0)
    rnd = round_ste if training else jnp.round
    code = rnd(-jnp.log2(scaled) * k)
    keep = code < 2 * N  # codes beyond the last level dequantize to exactly 0
    code = tclip(code, 0, 2 * N - 1)
    return code, keep


def log2_quant(x, scale, *, bits: int, training: bool = False):
    """Power-of-two quantizer: dq = 2**(-code) * scale (logarithm.py:25-35)."""
    if bits == 32:
        return x
    code, keep = _log_codes(x, scale, 1.0, bits, training)
    return jnp.exp2(-code) * scale * keep


def logsqrt2_quant(x, scale, *, bits: int, training: bool = False):
    """Base-sqrt(2) quantizer (logarithm.py:45-62).

    Training path keeps the continuous 2**(-code/2); inference decomposes into a
    power-of-two shift of ceil(code/2) times (sqrt(2)-1)+1 for odd codes — the
    hardware shift+single-multiply form.
    """
    if bits == 32:
        return x
    code, keep = _log_codes(x, scale, 2.0, bits, training)
    if training:
        dq = jnp.exp2(-code / 2.0) * scale
    else:
        odd = (code % 2) * (np.sqrt(2.0) - 1.0) + 1.0
        dq = jnp.exp2(-jnp.ceil(code / 2.0)) * odd * scale
    return dq * keep


def adalog_mantissa(frac_codes, bits: int, r: float = ADALOG_R):
    """Fixed-point mantissa round(2**(-j/r) * (4N-2)) / (4N-2) for j = frac_codes.

    This is the closed form of both the reference's per-quantizer ``table2``
    (logarithm.py:77-81) and the 120-entry search table (linear.py:750-752,
    matmul.py:313-315): j is always an exact integer (mod of integer products),
    so evaluating the formula equals gathering from the materialized LUT.
    """
    ts = 1.0 / (4 * 2 ** (bits - 1) - 2)
    return jnp.round(jnp.exp2(-frac_codes / r) / ts) * ts


def adalog_dequant_code(code, q, *, bits: int, r: float = ADALOG_R):
    """LUT-decomposed dequant of integer codes: 2**(-floor(code*q/r)) * mantissa."""
    prod = code * q
    shift = jnp.floor(prod / r)
    frac = jnp.round(jnp.remainder(prod, r))
    return jnp.exp2(-shift) * adalog_mantissa(frac, bits, r)


def adalog_quant(x, scale, q, *, bits: int, r: float = ADALOG_R,
                 training: bool = False):
    """AdaLog fake quantization with log base 2**(q/r) (logarithm.py:83-99).

    q may be a traced array (candidate search vmaps over it). Training path uses
    the continuous 2**(-code*q/r) with straight-through rounding; inference uses
    the exact LUT decomposition.
    """
    if bits == 32:
        return x
    code, keep = _log_codes(x, scale, r / q, bits, training)
    if training:
        dq = jnp.exp2(-code * q / r) * scale
    else:
        dq = adalog_dequant_code(code, q, bits=bits, r=r) * scale
    return dq * keep


def make_adalog_tables(q: int, bits: int, r: float = ADALOG_R):
    """Materialize reference-format LUT buffers (logarithm.py:77-81).

    table1[i] = floor(i*q/r); table2[i] = round(2**(-((q*i) mod r)/r)*(4N-2))/(4N-2)
    for i in [0, 2N). Computed in float64 to match the reference's Python-float
    table construction bit-for-bit after the fp32 cast.
    """
    N = 2 ** (bits - 1)
    i = np.arange(2 * N, dtype=np.float64)
    q = float(q)
    table1 = np.floor(i * q / r)
    ts = 1.0 / (4 * N - 2)
    table2 = np.round(np.exp2(-np.mod(q * i, r) / r) / ts) * ts
    return jnp.asarray(table1, jnp.float32), jnp.asarray(table2, jnp.float32)


def make_mantissa_table(bits: int, r: float = ADALOG_R, size: int = 120):
    """The fixed 120-entry fixed-point table round(2**(-j/r)/ts)*ts used by the
    calibration searches (linear.py:750-752). Depends only on bits and r."""
    j = np.arange(size, dtype=np.float64)
    ts = 1.0 / (4 * 2 ** (bits - 1) - 2)
    return jnp.asarray(np.round(np.exp2(-j / r) / ts) * ts, jnp.float32)
