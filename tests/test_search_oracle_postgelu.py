"""Post-GeLU search parity vs independent float64 NumPy oracles.

Covers the two fc2 activation-search families (VERDICT round-1 weak #4):

- AdaLog joint (scale, log-base q) search — reference linear.py:969-997
  non-fpcs path: alternating [q argmax at current scale -> scale argmax at
  chosen q -> weight output-MSE argmax with the AdaLog-quantized input].
- PTQ4ViT twin-uniform search — reference linear.py:697-721: negative scale
  fixed at GELU_MIN/N, positive scale argmax over 2^i * s_neg, i in [-5, 24).

The oracles re-derive candidate grids (percentile weight grid, NaN-aware
positive percentile scale grid), the AdaLog shift/mantissa decomposition and
the scoring reductions directly in float64 from the algorithm description;
agreement of the selected parameters with our jitted float32 searches
validates them end-to-end. (The FPCS refinement schedule itself is covered
by test_fpcs_oracle.py; the actual-reference-code differentials by
test_ref_differential.py.)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from adalog_tpu.calib import search as SRCH
from adalog_tpu.quantizers.state import GELU_MIN

BITS = 4
EQ_N = 32
ROUNDS = 2
R_ADALOG = 37.0


# -- shared float64 helpers --------------------------------------------------

def _uq(x, s, z, N):
    q = np.clip(np.round(x / s) + z, 0, 2 * N - 1)
    return (q - z) * s


def _w_cands(w, N):
    """Per-row percentile grid: scale fastest, zp slowest (linear.py:432-451)."""
    num_zp = min(16, N)
    num_scale = EQ_N // num_zp
    up = np.quantile(w, [0.9, 1.0], axis=1)
    lo = np.quantile(w, [0.1, 0.0], axis=1)
    dmin, dmax = up[0] - lo[0], up[1] - lo[1]
    t = np.linspace(0, 1, num_scale)[:, None]
    scales = np.tile((dmin[None] + t * (dmax - dmin)[None]) / (2 * N - 1),
                     (num_zp, 1))
    zps = np.repeat(np.arange(N - num_zp // 2, N + num_zp // 2,
                              dtype=np.float64), num_scale)[:, None] \
        * np.ones_like(scales)
    return scales, zps


def _w_self_argmax(w, ws, wz, N):
    O = w.shape[0]
    errs = np.stack([np.mean((w - _uq(w, ws[e][:, None], wz[e][:, None], N))
                             ** 2, axis=1) for e in range(EQ_N)])
    idx = errs.argmin(axis=0)
    return ws[idx, np.arange(O)], wz[idx, np.arange(O)]


def _w_out_argmax(x_q, tgt, w, ws, wz, N):
    O = w.shape[0]
    errs = np.stack([
        np.sum((tgt - x_q @ _uq(w, ws[e][:, None], wz[e][:, None], N).T) ** 2,
               axis=0) for e in range(EQ_N)])
    idx = errs.argmin(axis=0)
    return ws[idx, np.arange(O)], wz[idx, np.arange(O)]


def _adalog_fq(x, s, q, N):
    """Shift/mantissa decomposition (quantizers/logarithm.py, scoring.py:84-96)."""
    scaled = np.clip(x / s, 1e-15, 1.0)
    code = np.round(-np.log2(scaled) * R_ADALOG / q)
    keep = code < 2 * N
    code = np.clip(code, 0, 2 * N - 1)
    prod = code * q
    ts = 1.0 / (4 * N - 2)
    mant = np.round(np.exp2(-np.round(np.remainder(prod, R_ADALOG))
                            / R_ADALOG) / ts) * ts
    return np.exp2(-np.floor(prod / R_ADALOG)) * mant * keep * s


def _positive_percentile(flat, qs):
    """rank = clip(ceil(count*q)-1, 0) over ascending-sorted positives
    (linear.py:763-798)."""
    pos = np.sort(flat[flat > 0])
    if pos.size == 0:
        return np.zeros(len(qs))
    ranks = np.clip(np.ceil(pos.size * np.asarray(qs)).astype(int) - 1, 0,
                    pos.size - 1)
    return pos[ranks]


# -- oracles -----------------------------------------------------------------

def oracle_postgelu_adalog(x, y, w, b):
    N = 2 ** (BITS - 1)
    tgt = y - b
    shift = GELU_MIN

    ws, wz = _w_cands(w, N)
    w_s, w_z = _w_self_argmax(w, ws, wz, N)

    # percentile over the positives of raw x, then shifted (linear.py:977:
    # the candidate deltas come before the shift is applied)
    ud = _positive_percentile(x.reshape(-1), [0.9, 1.0]) + shift
    scale_grid = ud[0] + (ud[1] - ud[0]) * np.arange(EQ_N) / (EQ_N - 1)
    a_s = scale_grid[-2]
    q = 37.0
    q_grid = np.arange(10, 10 + EQ_N, dtype=np.float64)

    for _ in range(ROUNDS):
        w_q = _uq(w, w_s[:, None], w_z[:, None], N)
        sims = np.array([
            -np.sum((tgt - (_adalog_fq(x + shift, a_s, qc, N) - shift)
                     @ w_q.T) ** 2) for qc in q_grid])
        q = q_grid[sims.argmax()]
        sims = np.array([
            -np.sum((tgt - (_adalog_fq(x + shift, sc, q, N) - shift)
                     @ w_q.T) ** 2) for sc in scale_grid])
        a_s = scale_grid[sims.argmax()]
        x_q = _adalog_fq(x + shift, a_s, q, N) - shift
        w_s, w_z = _w_out_argmax(x_q, tgt, w, ws, wz, N)

    return w_s, w_z, a_s, q


def oracle_postgelu_twin(x, y, w, b):
    N = 2 ** (BITS - 1)
    tgt = y - b

    ws, wz = _w_cands(w, N)
    w_s, w_z = _w_self_argmax(w, ws, wz, N)

    s_neg = GELU_MIN / N
    pos_grid = np.exp2(np.arange(-5, 24, dtype=np.float64)) * s_neg
    s_pos = None

    def twin_q(sp):
        x_pos = np.clip(np.round(x / sp), 0, N - 1) * sp
        x_neg = np.clip(np.round(x / s_neg), -N, 0) * s_neg
        return x_pos + x_neg

    for _ in range(ROUNDS):
        w_q = _uq(w, w_s[:, None], w_z[:, None], N)
        sims = np.array([-np.sum((tgt - twin_q(sp) @ w_q.T) ** 2)
                         for sp in pos_grid])
        s_pos = pos_grid[sims.argmax()]
        w_s, w_z = _w_out_argmax(twin_q(s_pos), tgt, w, ws, wz, N)

    return w_s, w_z, s_pos, s_neg


# -- tests -------------------------------------------------------------------

def _fixture(rng):
    T, I, O = 96, 12, 10
    z = rng.standard_normal((T, I)).astype(np.float32)
    x = (0.5 * z * (1.0 + np.tanh(np.sqrt(2 / np.pi)
                                  * (z + 0.044715 * z ** 3)))).astype(np.float32)
    w = (rng.standard_normal((O, I)) * 0.4).astype(np.float32)
    b = (rng.standard_normal(O) * 0.1).astype(np.float32)
    y = (x.astype(np.float64) @ w.astype(np.float64).T + b).astype(np.float32)
    return x, y, w, b


@pytest.mark.slow
def test_postgelu_adalog_matches_numpy_oracle(rng):
    x, y, w, b = _fixture(rng)
    ow_s, ow_z, oa_s, oq = oracle_postgelu_adalog(
        x.astype(np.float64), y.astype(np.float64), w.astype(np.float64),
        b.astype(np.float64))

    w_s, w_z, a_s, q = SRCH.search_linear_postgelu_adalog(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(w), jnp.asarray(b),
        jnp.float32(GELU_MIN), w_bits=BITS, a_bits=BITS, n_V=1, eq_n=EQ_N,
        steps=1, rounds=ROUNDS, use_fpcs=False)

    assert float(q) == oq
    assert np.isclose(float(a_s[0]), oa_s, rtol=1e-5)
    w_s = np.asarray(w_s).reshape(-1)
    w_z = np.asarray(w_z).reshape(-1)
    agree = np.isclose(w_s, ow_s, rtol=1e-5) & np.isclose(w_z, ow_z)
    assert agree.mean() >= 0.8, (w_s, ow_s)


@pytest.mark.slow
def test_postgelu_twin_matches_numpy_oracle(rng):
    x, y, w, b = _fixture(rng)
    ow_s, ow_z, os_pos, os_neg = oracle_postgelu_twin(
        x.astype(np.float64), y.astype(np.float64), w.astype(np.float64),
        b.astype(np.float64))

    w_s, w_z, s_pos, s_neg = SRCH.search_linear_postgelu_twin(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(w), jnp.asarray(b),
        w_bits=BITS, a_bits=BITS, n_V=1, eq_n=EQ_N, steps=1, rounds=ROUNDS,
        use_fpcs=False)

    assert np.isclose(float(s_pos[0]), os_pos, rtol=1e-6)
    assert np.isclose(float(s_neg[0]), os_neg, rtol=1e-6)
    w_s = np.asarray(w_s).reshape(-1)
    w_z = np.asarray(w_z).reshape(-1)
    agree = np.isclose(w_s, ow_s, rtol=1e-5) & np.isclose(w_z, ow_z)
    assert agree.mean() >= 0.8, (w_s, ow_s)
