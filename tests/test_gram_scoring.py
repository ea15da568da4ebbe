"""Gram-form weight scoring: ranking equivalence with the direct form."""

import numpy as np
import jax
import jax.numpy as jnp

from adalog_tpu.ops import scoring as S
from adalog_tpu.calib import candidates as C
from adalog_tpu.calib import search as SRCH


def test_gram_matches_direct_ranking(rng):
    T, I, O, V = 256, 24, 30, 3
    R = O // V
    x_q = jnp.asarray(rng.standard_normal((T, I)).astype(np.float32))
    w_v = jnp.asarray((rng.standard_normal((V, R, I)) * 0.3).astype(np.float32))
    tgt = jnp.asarray(jnp.einsum(
        "ti,vri->tvr", x_q, w_v,
        precision=jax.lax.Precision.HIGHEST).reshape(T, O)
        + 0.01 * rng.standard_normal((T, O)).astype(np.float32))

    s2d, z2d = C.weight_candidates(w_v, 4, 32)
    scales = s2d.reshape(-1, V, R, 1)
    zps = z2d.reshape(-1, V, R, 1)

    direct = np.asarray(S.score_linear_w_out(x_q, tgt, w_v, scales, zps, 4))
    G, Cm = S.gram_stats(x_q, tgt)
    gram = np.asarray(S.score_linear_w_out_gram(G, Cm, w_v, scales, zps, 4))

    # same ranking: identical argmax per unit, and score DIFFERENCES between
    # candidates agree (the gram form drops the constant target energy)
    assert (direct.argmax(0) == gram.argmax(0)).mean() > 0.95
    d_rel = direct - direct[:1]
    g_rel = gram - gram[:1]
    np.testing.assert_allclose(g_rel, d_rel, rtol=1e-3, atol=1e-2)


def test_a_gram_matches_direct_ranking(rng):
    """Gram-form ACTIVATION scoring ranks candidates like the direct form
    (O > I shapes, where the gram path engages)."""
    T, I, O = 256, 16, 48
    x = jnp.asarray(rng.standard_normal((T, I)).astype(np.float32))
    w_q = jnp.asarray((rng.standard_normal((O, I)) * 0.3).astype(np.float32))
    tgt = jnp.asarray(
        jnp.matmul(x, w_q.T, precision=jax.lax.Precision.HIGHEST)
        + 0.01 * rng.standard_normal((T, O)).astype(np.float32))

    s2d, z2d = C.act_candidates(x, 4, 32, channel_wise=False)

    direct = np.asarray(S.score_linear_a_out(x, tgt, w_q, s2d, z2d, 4))
    Mw, Gw = S.act_gram_stats(tgt, w_q)
    gram = np.asarray(S.score_linear_a_out_gram(x, Mw, Gw, s2d, z2d, 4))

    assert direct.argmax() == gram.argmax()
    d_rel = direct - direct[:1]
    g_rel = gram - gram[:1]
    np.testing.assert_allclose(g_rel, d_rel, rtol=1e-3, atol=1e-2)


def test_search_with_a_gram_close_to_direct(rng):
    """Full default-linear search with a_gram on (O > I so the gate engages)
    finds an equal-quality point to the direct activation scorer."""
    T, I, O = 128, 16, 48
    x = jnp.asarray(rng.standard_normal((T, I)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((O, I)) * 0.3).astype(np.float32))
    b = jnp.zeros((O,), jnp.float32)
    y = jnp.matmul(x, w.T, precision=jax.lax.Precision.HIGHEST)
    kw = dict(w_bits=4, a_bits=4, n_V=1, eq_n=32, steps=2, rounds=1,
              use_fpcs=True)
    rd = SRCH.search_linear_default(x, y, w, b, a_gram=False, **kw)
    rg = SRCH.search_linear_default(x, y, w, b, a_gram=True, **kw)

    def out_mse(r):
        w_q = S.uq_asym(w.reshape(1, O, I), r[0], r[1], 4).reshape(O, I)
        x_q = S.uq_asym(x, r[2], r[3], 4)
        out = jnp.matmul(x_q, w_q.T, precision=jax.lax.Precision.HIGHEST)
        return float(jnp.mean((y - out) ** 2))

    md, mg = out_mse(rd), out_mse(rg)
    assert mg <= md * 1.05, (mg, md)


def test_a_gram_noop_when_I_ge_O(rng):
    """At fc2/proj-like shapes (I >= O) the gate keeps the direct scorer, so
    a_gram=True must be bit-identical to a_gram=False."""
    T, I, O = 64, 24, 24
    x = jnp.asarray(rng.standard_normal((T, I)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((O, I)) * 0.3).astype(np.float32))
    b = jnp.zeros((O,), jnp.float32)
    y = jnp.matmul(x, w.T, precision=jax.lax.Precision.HIGHEST)
    kw = dict(w_bits=4, a_bits=4, n_V=1, eq_n=16, steps=2, rounds=1,
              use_fpcs=True)
    rd = SRCH.search_linear_default(x, y, w, b, a_gram=False, **kw)
    rg = SRCH.search_linear_default(x, y, w, b, a_gram=True, **kw)
    for a, c in zip(rd, rg):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_matmul_gram_matches_direct_ranking(rng):
    """Gram-form matmul A/B-candidate scoring ranks like the direct form
    (q@kT shapes: S, S2 > C so both gates engage)."""
    n, h, sdim, cdim = 2, 3, 40, 8
    A = jnp.asarray(rng.standard_normal((n, h, sdim, cdim)).astype(np.float32))
    B = jnp.asarray(rng.standard_normal((n, h, cdim, sdim)).astype(np.float32))
    tgt = jnp.asarray(jnp.einsum("nhsc,nhct->nhst", A, B,
                                 precision=jax.lax.Precision.HIGHEST)
                      + 0.01 * rng.standard_normal((n, h, sdim, sdim))
                      .astype(np.float32))
    for head_cw in (False, True):
        s2d, z2d = C.matmul_candidates(A, 4, 16, head_channel_wise=head_cw)
        U = h if head_cw else 1
        scales = s2d.reshape(-1, 1, U, 1, 1)
        zps = z2d.reshape(-1, 1, U, 1, 1)

        B_q = S.uq_asym(B, jnp.float32(0.3), jnp.float32(8.0), 4)
        direct = np.asarray(S.score_matmul_opA(
            A, B_q, tgt, scales, zps, 4, head_channel_wise=head_cw))
        G_B, M = S.matmul_gram_stats_opA(B_q, tgt)
        gram = np.asarray(S.score_matmul_opA_gram(
            A, G_B, M, sdim, scales, zps, 4, head_channel_wise=head_cw))
        assert (direct.argmax(0) == gram.argmax(0)).all(), head_cw
        np.testing.assert_allclose(gram - gram[:1], direct - direct[:1],
                                   rtol=1e-3, atol=1e-2)

        s2d, z2d = C.matmul_candidates(B, 4, 16, head_channel_wise=head_cw)
        scales = s2d.reshape(-1, 1, U, 1, 1)
        zps = z2d.reshape(-1, 1, U, 1, 1)
        A_q = S.uq_asym(A, jnp.float32(0.3), jnp.float32(8.0), 4)
        direct = np.asarray(S.score_matmul_opB(
            A_q, B, tgt, scales, zps, 4, head_channel_wise=head_cw))
        G_A, M2 = S.matmul_gram_stats_opB(A_q, tgt)
        gram = np.asarray(S.score_matmul_opB_gram(
            B, G_A, M2, sdim, scales, zps, 4, head_channel_wise=head_cw))
        assert (direct.argmax(0) == gram.argmax(0)).all(), head_cw
        np.testing.assert_allclose(gram - gram[:1], direct - direct[:1],
                                   rtol=1e-3, atol=1e-2)


def test_search_matmul_with_gram_close_to_direct(rng):
    """Full q@kT search quality with gram on vs off."""
    n, h, sdim, cdim = 2, 2, 32, 8
    A = jnp.asarray(rng.standard_normal((n, h, sdim, cdim)).astype(np.float32))
    B = jnp.asarray(rng.standard_normal((n, h, cdim, sdim)).astype(np.float32))
    y = jnp.einsum("nhsc,nhct->nhst", A, B,
                   precision=jax.lax.Precision.HIGHEST)
    kw = dict(A_bits=4, B_bits=4, eq_n=16, steps=2, rounds=1, use_fpcs=True,
              head_cw=True)
    rd = SRCH.search_matmul(A, B, y, gram=False, **kw)
    rg = SRCH.search_matmul(A, B, y, gram=True, **kw)

    def out_mse(r):
        A_q = S.uq_asym(A, r[0], r[1], 4)
        B_q = S.uq_asym(B, r[2], r[3], 4)
        out = jnp.einsum("nhsc,nhct->nhst", A_q, B_q,
                         precision=jax.lax.Precision.HIGHEST)
        return float(jnp.mean((y - out) ** 2))

    md, mg = out_mse(rd), out_mse(rg)
    assert mg <= md * 1.05, (mg, md)


def test_matmul_gram_noop_when_C_large(rng):
    """When the contraction dim is >= both output extents the gates keep the
    direct scorer — gram=True must be bit-identical."""
    n, h, sdim, cdim = 1, 2, 8, 16
    A = jnp.asarray(rng.standard_normal((n, h, sdim, cdim)).astype(np.float32))
    B = jnp.asarray(rng.standard_normal((n, h, cdim, sdim)).astype(np.float32))
    y = jnp.einsum("nhsc,nhct->nhst", A, B,
                   precision=jax.lax.Precision.HIGHEST)
    kw = dict(A_bits=4, B_bits=4, eq_n=16, steps=2, rounds=1, use_fpcs=True,
              head_cw=False)
    rd = SRCH.search_matmul(A, B, y, gram=False, **kw)
    rg = SRCH.search_matmul(A, B, y, gram=True, **kw)
    for a, c in zip(rd, rg):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_search_with_gram_close_to_direct(rng):
    T, I, O = 128, 16, 24
    x = jnp.asarray(rng.standard_normal((T, I)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((O, I)) * 0.3).astype(np.float32))
    b = jnp.zeros((O,), jnp.float32)
    y = jnp.matmul(x, w.T, precision=jax.lax.Precision.HIGHEST)
    kw = dict(w_bits=4, a_bits=4, n_V=1, eq_n=32, steps=2, rounds=1,
              use_fpcs=True)
    rd = SRCH.search_linear_default(x, y, w, b, gram=False, **kw)
    rg = SRCH.search_linear_default(x, y, w, b, gram=True, **kw)

    def out_mse(r):
        w_q = S.uq_asym(w.reshape(1, O, I), r[0], r[1], 4).reshape(O, I)
        x_q = S.uq_asym(x, r[2], r[3], 4)
        out = jnp.matmul(x_q, w_q.T, precision=jax.lax.Precision.HIGHEST)
        return float(jnp.mean((y - out) ** 2))

    md, mg = out_mse(rd), out_mse(rg)
    # equal-quality searches (tiny fp differences may flip near-tied picks)
    assert mg <= md * 1.05, (mg, md)
