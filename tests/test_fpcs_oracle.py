"""FPCS refinement-schedule parity vs an independent NumPy float64 oracle.

Re-implements the reference's full FPCS loop (percentile grid -> top-k ->
re-grid around survivors with shrinking delta, final top-1; linear.py:483-523)
directly in NumPy for the weight self-search, and checks our scan-based fpcs()
selects the same scales/zero-points.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adalog_tpu.calib import candidates as C
from adalog_tpu.calib.search import fpcs
from adalog_tpu.ops import scoring as S

BITS = 4
N = 2 ** (BITS - 1)
EQ_N = 32
WIDTH = 8
STEPS = 4


def _uq(x, s, z):
    q = np.clip(np.round(x / s) + z, 0, 2 * N - 1)
    return (q - z) * s


def oracle_weight_self_fpcs(w):
    """w: (O, I) float64; per-row FPCS over the percentile grid."""
    O, I = w.shape
    num_zp = min(16, N, EQ_N)
    num_scale = EQ_N // num_zp
    up = np.quantile(w, [0.9, 1.0], axis=1)
    lo = np.quantile(w, [0.1, 0.0], axis=1)
    dmin, dmax = up[0] - lo[0], up[1] - lo[1]
    t = np.linspace(0, 1, num_scale)[:, None]
    scales = np.tile((dmin[None] + t * (dmax - dmin)[None]) / (2 * N - 1),
                     (num_zp, 1))                                  # (E, O)
    zgrid = np.arange(N - num_zp // 2, N + num_zp // 2, dtype=np.float64)
    zps = np.repeat(zgrid, num_scale)[:, None] * np.ones((1, O))

    def score(sc, zc):
        # per-row mean squared weight quant error (higher similarity = better)
        return -np.stack([np.mean((w - _uq(w, sc[e][:, None], zc[e][:, None]))
                                  ** 2, axis=1) for e in range(EQ_N)])

    delta = scales[1] - scales[0]                                  # (O,)
    cnt = EQ_N // WIDTH
    sims = score(scales, zps)
    for step in range(STEPS - 1):
        # top-WIDTH per row
        idx = np.argsort(-sims, axis=0, kind="stable")[:WIDTH]     # (W, O)
        ksc = np.take_along_axis(scales, idx, axis=0)
        kzp = np.take_along_axis(zps, idx, axis=0)
        offs = (np.linspace(0, 1, cnt) - 0.5)[:, None]             # (cnt, 1)
        scales = (ksc[:, None, :] + offs[None, :, :] * delta).reshape(EQ_N, O)
        zps = np.repeat(kzp, cnt, axis=0)
        delta = delta / (cnt - 0.5)
        sims = score(scales, zps)
    best = sims.argmax(axis=0)
    return (np.take_along_axis(scales, best[None], 0)[0],
            np.take_along_axis(zps, best[None], 0)[0])


@pytest.mark.slow
def test_fpcs_schedule_matches_numpy_oracle(rng):
    O, I = 12, 20
    w = (rng.standard_normal((O, I)) * 0.3).astype(np.float32)

    os_, oz = oracle_weight_self_fpcs(w.astype(np.float64))

    w_v = jnp.asarray(w).reshape(1, O, I)
    s0, z0 = C.weight_candidates(w_v, BITS, EQ_N)

    def score2d(s, z):
        return S.score_weight_self(
            w_v, s.reshape(-1, 1, O, 1), z.reshape(-1, 1, O, 1), BITS
        ).reshape(EQ_N, O)

    bs, bz = fpcs(score2d, s0, z0, eq_n=EQ_N, steps=STEPS, width=WIDTH)
    bs, bz = np.asarray(bs), np.asarray(bz)

    # fp32-vs-fp64 scoring can flip near-ties on a few rows
    agree = np.isclose(bs, os_, rtol=1e-4) & np.isclose(bz, oz)
    assert agree.mean() >= 0.8, (bs, os_)
