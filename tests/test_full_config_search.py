"""Shipped-config search smoke: eq_n=128 / steps=6 / rounds=3 (the actual
3/4/6-bit config geometry: fpcs_new_cnt=8, postgelu joint width 32 cnt 4)
traces and runs for every search family on small tensors."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adalog_tpu.calib import search as SRCH

KW = dict(eq_n=128, steps=6, rounds=3, use_fpcs=True)


@pytest.mark.slow
def test_full_config_linear_and_postgelu(rng):
    T, I, O = 64, 12, 9
    x = jnp.asarray(rng.standard_normal((T, I)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((O, I)) * 0.3).astype(np.float32))
    b = jnp.zeros((O,), jnp.float32)
    y = jnp.matmul(x, w.T, precision=jax.lax.Precision.HIGHEST)

    r = SRCH.search_linear_default(x, y, w, b, w_bits=4, a_bits=4, n_V=3,
                                   **KW)
    assert all(np.isfinite(np.asarray(t)).all() for t in r)
    assert float(r[2][0]) > 0

    xp = jnp.asarray(np.abs(rng.standard_normal((T, I))).astype(np.float32))
    yp = jnp.matmul(xp, w.T, precision=jax.lax.Precision.HIGHEST)
    r2 = SRCH.search_linear_postgelu_adalog(
        xp, yp, w, b, jnp.float32(0.17), w_bits=4, a_bits=4, n_V=1, **KW)
    q = float(r2[3])
    assert 10 <= q < 10 + 128 and float(r2[2][0]) > 0

    r3 = SRCH.search_linear_postgelu_twin(xp, yp, w, b, w_bits=4, a_bits=4,
                                          n_V=1, **KW)
    assert float(r3[2][0]) > 0 and float(r3[3][0]) > 0


@pytest.mark.slow
def test_full_config_matmul_and_conv(rng):
    N, H, S, C = 2, 2, 8, 6
    A = jnp.asarray(rng.standard_normal((N, H, S, C)).astype(np.float32))
    B = jnp.asarray(rng.standard_normal((N, H, C, S)).astype(np.float32))
    y = jnp.matmul(A, B, precision=jax.lax.Precision.HIGHEST)
    r = SRCH.search_matmul(A, B, y, A_bits=4, B_bits=4, head_cw=True, **KW)
    assert all(np.isfinite(np.asarray(t)).all() for t in r)

    As = jnp.asarray(jax.nn.softmax(
        jnp.asarray(rng.standard_normal((N, H, S, S)).astype(np.float32)), -1))
    Bs = jnp.asarray(rng.standard_normal((N, H, S, C)).astype(np.float32))
    ys = jnp.matmul(As, Bs, precision=jax.lax.Precision.HIGHEST)
    q, B_s, B_z = SRCH.search_matmul_postsoftmax(
        As, Bs, ys, A_bits=4, B_bits=4, head_cw=True, a_kind="adalog", **KW)
    assert 10 <= float(q) < 10 + 128

    xc = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    wc = jnp.asarray((rng.standard_normal((8, 3, 8, 8)) * 0.2).astype(np.float32))
    bc = jnp.zeros((8,), jnp.float32)
    yc = jax.lax.conv_general_dilated(
        xc, jnp.transpose(wc, (2, 3, 1, 0)), (8, 8), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    w_s, w_z = SRCH.search_conv(xc, yc, wc, bc, w_bits=4,
                                conv_dims=(8, 8, 8, 0), eq_n=128, steps=6,
                                use_fpcs=True)
    assert np.isfinite(np.asarray(w_s)).all()
