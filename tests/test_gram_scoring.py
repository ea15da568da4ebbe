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
