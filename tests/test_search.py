"""Search-engine tests: candidate generation, FPCS convergence, reparam
identities — on synthetic tensors small enough for the CPU test platform."""

import numpy as np
import jax
import jax.numpy as jnp

from adalog_tpu.calib import candidates as C
from adalog_tpu.calib import search as SRCH
from adalog_tpu.calib.reparam import (
    layernorm_channel_reparam, rewrite_cached_input,
    fold_gelu_shift_into_bias,
)
from adalog_tpu.models.layers import (
    LinearP, LayerNormP, layer_norm, qlinear, LinearSite,
)
from adalog_tpu.quantizers.state import WeightQuantizerState, QuantizerState
from adalog_tpu.quantizers.apply import apply_quantizer
from adalog_tpu.ops import scoring as S

EQ_N, STEPS, ROUNDS = 32, 2, 2
BITS = 4


def test_candidate_layout_scale_fastest(rng):
    w = jnp.asarray(rng.standard_normal((2, 4, 16)).astype(np.float32))
    scales, zps = C.weight_candidates(w, BITS, EQ_N)
    assert scales.shape == (EQ_N, 8) and zps.shape == (EQ_N, 8)
    num_zp = min(16, 2 ** (BITS - 1))
    num_scale = EQ_N // num_zp
    # zero-point constant within each scale run, scale strictly increasing
    z = np.asarray(zps[:, 0])
    assert (z[:num_scale] == z[0]).all() and z[num_scale] == z[0] + 1
    s = np.asarray(scales[:num_scale, 0])
    assert (np.diff(s) > 0).all()


def test_positive_percentile_matches_rank_formula(rng):
    x = rng.standard_normal((1000,)).astype(np.float32)
    qs = np.asarray([0.5, 0.9, 1.0], np.float32)
    got = np.asarray(C.positive_percentile(jnp.asarray(x), jnp.asarray(qs)))
    pos = np.sort(x[x > 0])
    ranks = np.clip(np.ceil(len(pos) * qs).astype(int) - 1, 0, None)
    np.testing.assert_allclose(got, pos[ranks], rtol=1e-6)
    # no positives -> 0
    got0 = np.asarray(C.positive_percentile(jnp.asarray(-np.abs(x)), jnp.asarray(qs)))
    np.testing.assert_array_equal(got0, np.zeros(3))


def test_fpcs_beats_or_matches_initial_grid(rng):
    """FPCS refinement never ends worse than the best of the initial grid."""
    x = jnp.asarray(rng.standard_normal((64, 8)).astype(np.float32))

    def score2d(s, z):
        return S.score_act_self(x, s[:, :, None], z[:, :, None], BITS,
                                channel_wise=False, n_batch=1)[:, None]

    s0, z0 = C.act_candidates(x, BITS, EQ_N, channel_wise=False)
    init_best = float(jnp.max(score2d(s0, z0)))
    bs, bz = SRCH.fpcs(score2d, s0, z0, eq_n=EQ_N, steps=4, clamp_min=1e-4)
    final = float(score2d(jnp.broadcast_to(bs, (EQ_N, 1)),
                          jnp.broadcast_to(bz, (EQ_N, 1)))[0, 0])
    assert final >= init_best - 1e-6


def test_search_linear_default_reduces_output_error(rng):
    I, O, T = 16, 24, 128
    x = jnp.asarray(rng.standard_normal((T, I)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((O, I)) * 0.3).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((O,)).astype(np.float32) * 0.1)
    y = jnp.matmul(x, w.T, precision=jax.lax.Precision.HIGHEST) + b

    w_s, w_z, a_s, a_z = SRCH.search_linear_default(
        x, y, w, b, w_bits=BITS, a_bits=BITS, n_V=1, eq_n=EQ_N, steps=STEPS,
        rounds=ROUNDS, use_fpcs=True)
    assert w_s.shape == (1, O, 1) and a_s.shape == (1,)
    assert (np.asarray(w_s) > 0).all() and float(a_s[0]) > 0

    # searched params beat a naive min-max baseline on output MSE
    def out_mse(ws, wz, as_, az):
        w_q = S.uq_asym(w.reshape(1, O, I), ws, wz, BITS).reshape(O, I)
        x_q = S.uq_asym(x, as_, az, BITS)
        out = jnp.matmul(x_q, w_q.T, precision=jax.lax.Precision.HIGHEST) + b
        return float(jnp.mean((y - out) ** 2))

    N = 2 ** (BITS - 1)
    mm_ws = ((w.max(axis=1) - w.min(axis=1)) / (2 * N - 1)).reshape(1, O, 1)
    mm_wz = (-w.min(axis=1).reshape(1, O, 1) / mm_ws)
    mm_as = ((x.max() - x.min()) / (2 * N - 1)).reshape(1)
    mm_az = (-x.min() / mm_as).reshape(1)
    searched = out_mse(w_s, w_z, a_s, a_z)
    naive = out_mse(mm_ws, mm_wz, mm_as, mm_az)
    assert searched <= naive * 1.05, (searched, naive)


def test_layernorm_channel_reparam_preserves_composite(rng):
    I, O, T = 12, 8, 64
    norm = LayerNormP(g=jnp.asarray(1 + 0.3 * rng.standard_normal(I).astype(np.float32)),
                      b=jnp.asarray(0.2 * rng.standard_normal(I).astype(np.float32)))
    lin = LinearP(w=jnp.asarray(rng.standard_normal((O, I)).astype(np.float32)),
                  b=jnp.asarray(rng.standard_normal((O,)).astype(np.float32)))
    a_scale = jnp.asarray((0.5 + rng.random(I)).astype(np.float32))
    a_zp = jnp.asarray(rng.integers(4, 12, I).astype(np.float32))

    x = jnp.asarray(rng.standard_normal((T, I)).astype(np.float32))
    before = qlinear(lin, None, layer_norm(norm, x))

    new_norm, new_lin, r, b, ts, tz = layernorm_channel_reparam(
        norm, lin, a_scale, a_zp)
    after = qlinear(new_lin, None, layer_norm(new_norm, x))
    np.testing.assert_allclose(np.asarray(after), np.asarray(before),
                               rtol=2e-4, atol=2e-4)

    # cached-input rewrite mirrors what the new norm now produces
    ln_old = layer_norm(norm, x)
    ln_new = layer_norm(new_norm, x)
    np.testing.assert_allclose(np.asarray(rewrite_cached_input(ln_old, r, b)),
                               np.asarray(ln_new), rtol=2e-4, atol=2e-4)

    # bias created when absent (the Swin reduction case)
    lin_nb = LinearP(w=lin.w, b=None)
    _, new_lin_nb, *_ = layernorm_channel_reparam(norm, lin_nb, a_scale, a_zp)
    assert new_lin_nb.b is not None


def test_gelu_shift_bias_fold_identity(rng):
    """quant_forward(x) is identical before/after the bias fold."""
    from adalog_tpu.quantizers.state import GELU_MIN
    I, O, T = 16, 8, 32
    lin = LinearP(w=jnp.asarray(rng.standard_normal((O, I)).astype(np.float32) * 0.2),
                  b=jnp.asarray(rng.standard_normal((O,)).astype(np.float32) * 0.1))
    site = LinearSite(
        wq=WeightQuantizerState(
            scale=jnp.full((1, O, 1), 0.02, jnp.float32),
            zero_point=jnp.full((1, O, 1), 8.0, jnp.float32),
            bits=4, symmetric=False),
        aq=QuantizerState(scale=jnp.full((1,), 0.8, jnp.float32),
                          shift=jnp.full((1,), GELU_MIN, jnp.float32),
                          log_q=jnp.asarray(40.0),
                          bias_reparamed=jnp.zeros((), jnp.bool_),
                          kind="adalog", bits=4, shifted=True),
        n_V=1)
    x = jnp.asarray(np.abs(rng.standard_normal((T, I))).astype(np.float32) - GELU_MIN)
    before = qlinear(lin, site, x, mode="quant")

    new_lin = fold_gelu_shift_into_bias(lin, site, shift=GELU_MIN)
    site2 = site.replace(aq=site.aq.replace(
        bias_reparamed=jnp.ones((), jnp.bool_)))
    after = qlinear(new_lin, site2, x, mode="quant")
    np.testing.assert_allclose(np.asarray(after), np.asarray(before),
                               rtol=1e-4, atol=1e-5)


def test_search_matmul_shapes(rng):
    N, H, Sq, Ck = 4, 2, 8, 6
    A = jnp.asarray(rng.standard_normal((N, H, Sq, Ck)).astype(np.float32))
    B = jnp.asarray(rng.standard_normal((N, H, Ck, Sq)).astype(np.float32))
    y = jnp.matmul(A, B, precision=jax.lax.Precision.HIGHEST)
    A_s, A_z, B_s, B_z = SRCH.search_matmul(
        A, B, y, A_bits=BITS, B_bits=BITS, eq_n=EQ_N, steps=STEPS,
        rounds=1, use_fpcs=True, head_cw=True)
    assert A_s.shape == (1, H, 1, 1) and B_z.shape == (1, H, 1, 1)
    assert (np.asarray(A_s) > 0).all()


def test_search_matmul_postsoftmax_q(rng):
    N, H, Sq, Ck = 4, 2, 8, 6
    logits = rng.standard_normal((N, H, Sq, Sq)).astype(np.float32)
    A = jnp.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    B = jnp.asarray(rng.standard_normal((N, H, Sq, Ck)).astype(np.float32))
    y = jnp.matmul(A, B, precision=jax.lax.Precision.HIGHEST)
    q, B_s, B_z = SRCH.search_matmul_postsoftmax(
        A, B, y, A_bits=BITS, B_bits=BITS, eq_n=EQ_N, steps=STEPS,
        rounds=1, use_fpcs=True, head_cw=True, a_kind="adalog")
    assert 10 <= float(q) <= 10 + EQ_N
    assert B_s.shape == (1, H, 1, 1)
