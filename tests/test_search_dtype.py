"""bfloat16 scoring mode: searched parameters stay quality-equivalent to the
fp32 scoring path (rankings are argmax-compared; bf16 perturbs near-ties only).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adalog_tpu.ops import scoring as S
from adalog_tpu.calib import search as SRCH


@pytest.fixture
def bf16_scoring():
    S.set_score_dtype("bfloat16")
    yield
    S.set_score_dtype("float32")


def test_bf16_search_quality(rng, bf16_scoring):
    T, I, O = 256, 16, 24
    x = jnp.asarray(rng.standard_normal((T, I)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((O, I)) * 0.3).astype(np.float32))
    b = jnp.zeros((O,), jnp.float32)
    y = jnp.matmul(x, w.T, precision=jax.lax.Precision.HIGHEST)
    kw = dict(w_bits=4, a_bits=4, n_V=1, eq_n=32, steps=2, rounds=1,
              use_fpcs=True)
    r_bf = SRCH.search_linear_default(x, y, w, b, **kw)
    S.set_score_dtype("float32")
    jax.clear_caches()   # dtype is baked into traced programs
    r_fp = SRCH.search_linear_default(x, y, w, b, **kw)

    def out_mse(r):
        w_q = S.uq_asym(w.reshape(1, O, I), r[0], r[1], 4).reshape(O, I)
        x_q = S.uq_asym(x, r[2], r[3], 4)
        out = jnp.matmul(x_q, w_q.T, precision=jax.lax.Precision.HIGHEST)
        return float(jnp.mean((y - out) ** 2))

    m_bf, m_fp = out_mse(r_bf), out_mse(r_fp)
    assert m_bf <= m_fp * 1.1, (m_bf, m_fp)
