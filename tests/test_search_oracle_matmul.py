"""NumPy float64 oracle for the post-softmax matmul search (AdaLog base q +
per-head B scale, fpcs=False single round)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adalog_tpu.calib import search as SRCH

BITS = 4
EQ_N = 32
R = 37.0


def _uq(x, s, z, N):
    q = np.clip(np.round(x / s) + z, 0, 2 * N - 1)
    return (q - z) * s


def _adalog(x, q, N):
    code = np.round(-np.log2(np.maximum(x, 1e-300)) * R / q)
    keep = code < 2 * N
    code = np.clip(code, 0, 2 * N - 1)
    prod = code * q
    ts = 1.0 / (4 * N - 2)
    mant = np.round(np.exp2(-np.mod(prod, R) / R) / ts) * ts
    return np.exp2(-np.floor(prod / R)) * mant * keep


def _b_cands(B, N):
    """Per-head percentile grid (matmul.py:211-240)."""
    H = B.shape[1]
    num_zp = min(16, N)
    num_scale = EQ_N // num_zp
    per_head = np.moveaxis(B, 1, 0).reshape(H, -1)
    up = np.quantile(per_head, [0.9, 1.0], axis=1)
    lo = np.quantile(per_head, [0.1, 0.0], axis=1)
    dmin, dmax = up[0] - lo[0], up[1] - lo[1]
    t = np.linspace(0, 1, num_scale)[:, None]
    scales = np.tile((dmin[None] + t * (dmax - dmin)[None]) / (2 * N - 1),
                     (num_zp, 1))                        # (EQ_N, H)
    zps = np.repeat(np.arange(N - num_zp // 2, N + num_zp // 2,
                              dtype=np.float64), num_scale)[:, None] * \
        np.ones_like(scales)
    return scales, zps


def oracle(A, B, y):
    N = 2 ** (BITS - 1)
    H = A.shape[1]
    Bs, Bz = _b_cands(B, N)
    b_s, b_z = Bs[-2], Bz[-2]                            # init [-2]

    # round: base search then B search (matmul.py:360-378, single round here)
    qs = np.arange(10, 10 + EQ_N, dtype=np.float64)
    B_q = _uq(B, b_s.reshape(1, H, 1, 1), b_z.reshape(1, H, 1, 1), N)
    errs = np.array([
        np.sum(np.mean((y - _adalog(A, q, N) @ B_q) ** 2, axis=(1, 2, 3)))
        for q in qs])
    q = qs[errs.argmin()]

    A_q = _adalog(A, q, N)
    errs = np.stack([
        np.sum(np.mean((y - A_q @ _uq(B, Bs[e].reshape(1, H, 1, 1),
                                      Bz[e].reshape(1, H, 1, 1), N)) ** 2,
                       axis=(2, 3)), axis=0)             # per head
        for e in range(EQ_N)])                           # (EQ_N, H)
    idx = errs.argmin(axis=0)
    return q, Bs[idx, np.arange(H)], Bz[idx, np.arange(H)]


@pytest.mark.slow
def test_postsoftmax_matches_oracle(rng):
    Nb, H, S, C = 3, 2, 12, 8
    logits = rng.standard_normal((Nb, H, S, S))
    A = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    B = rng.standard_normal((Nb, H, S, C)) * 0.5
    y = A @ B

    oq, ob_s, ob_z = oracle(A, B, y)

    q, B_s, B_z = SRCH.search_matmul_postsoftmax(
        jnp.asarray(A, jnp.float32), jnp.asarray(B, jnp.float32),
        jnp.asarray(y, jnp.float32), A_bits=BITS, B_bits=BITS, eq_n=EQ_N,
        steps=1, rounds=1, use_fpcs=False, head_cw=True, a_kind="adalog")

    assert float(q) == oq
    np.testing.assert_allclose(np.asarray(B_s).reshape(-1), ob_s, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(B_z).reshape(-1), ob_z, rtol=1e-6)
