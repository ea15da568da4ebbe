"""Golden tests for the quantizer math.

Expected values are computed with independent float64 numpy formulas written
from the quantizer definitions (affine rounding, log-domain rounding, the
AdaLog shift/mantissa LUT decomposition), not from any framework code.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adalog_tpu.quantizers import (
    round_ste, floor_ste, ceil_ste,
    uniform_quant, twin_uniform_quant,
    log2_quant, logsqrt2_quant, adalog_quant,
    make_adalog_tables, make_mantissa_table,
    adaround_init_alpha, adaround_soft_targets, adaround_quant,
    adaround_hard_weight,
    QuantizerState, apply_quantizer, GELU_MIN,
)
from adalog_tpu.quantizers.state import (
    adalog_act_state, uniform_act_state,
)

R = 37.0


def test_ste_forward_and_grad():
    x = jnp.asarray([0.4, 1.6, -2.5, 2.5])
    np.testing.assert_allclose(round_ste(x), np.array([0.0, 2.0, -2.0, 2.0]))
    np.testing.assert_allclose(floor_ste(x), np.floor(np.asarray(x)))
    np.testing.assert_allclose(ceil_ste(x), np.ceil(np.asarray(x)))
    for f in (round_ste, floor_ste, ceil_ste):
        g = jax.grad(lambda t: f(t * 3.0).sum())(x)
        np.testing.assert_allclose(g, 3.0 * np.ones(4))


@pytest.mark.parametrize("bits", [3, 4, 6, 8])
def test_uniform_symmetric_golden(rng, bits):
    x = rng.standard_normal((64,)).astype(np.float32)
    scale = np.float32(0.1)
    got = uniform_quant(jnp.asarray(x), scale, bits=bits, symmetric=True)
    N = 2 ** (bits - 1)
    want = np.clip(np.round(x.astype(np.float64) / scale), -N, N - 1) * scale
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-6)


@pytest.mark.parametrize("bits", [3, 4, 6])
def test_uniform_asymmetric_golden(rng, bits):
    x = (rng.standard_normal((64,)) + 0.5).astype(np.float32)
    scale, zp = np.float32(0.07), np.float32(5.3)
    got = uniform_quant(jnp.asarray(x), scale, zp, bits=bits, symmetric=False)
    N = 2 ** (bits - 1)
    zpr = np.round(zp)
    q = np.clip(np.round(x.astype(np.float64) / scale) + zpr, 0, 2 * N - 1)
    want = (q - zpr) * scale
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-6)


def test_uniform_identity_at_32_bits(rng):
    x = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))
    out = uniform_quant(x, jnp.float32(0.1), bits=32, symmetric=True)
    np.testing.assert_array_equal(out, x)


def test_twin_uniform_golden(rng):
    bits = 4
    N = 2 ** (bits - 1)
    x = rng.standard_normal((128,)).astype(np.float32)
    sp, sn = np.float32(0.2), np.float32(GELU_MIN / N)
    got = twin_uniform_quant(jnp.asarray(x), sp, sn, bits=bits)
    xp = np.clip(np.round(x / sp), 0, N - 1) * sp
    xn = np.clip(np.round(x / sn), -N, 0) * sn
    np.testing.assert_allclose(got, (xp + xn).astype(np.float32), rtol=1e-5)


def _log_expected(x, scale, k, bits):
    """Independent float64 log-quant model: code=round(-log2(clip(x/s))*k)."""
    N = 2 ** (bits - 1)
    scaled = np.clip(x.astype(np.float64) / scale, 1e-15, 1.0)
    code = np.round(-np.log2(scaled) * k)
    keep = code < 2 * N
    code = np.clip(code, 0, 2 * N - 1)
    return code, keep


@pytest.mark.parametrize("bits", [3, 4, 6])
def test_log2_golden(rng, bits):
    x = np.abs(rng.standard_normal((256,))).astype(np.float32)
    scale = np.float32(1.3)
    code, keep = _log_expected(x, scale, 1.0, bits)
    want = np.exp2(-code) * scale * keep
    got = log2_quant(jnp.asarray(x), scale, bits=bits)
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-5)


@pytest.mark.parametrize("bits", [4, 6])
def test_logsqrt2_inference_decomposition(rng, bits):
    """Inference path: 2^(-ceil(c/2)) * ((c%2)(sqrt2-1)+1) == 2^(-c/2) on the grid."""
    x = np.abs(rng.standard_normal((256,))).astype(np.float32) * 0.7
    scale = np.float32(1.0)
    code, keep = _log_expected(x, scale, 2.0, bits)
    odd = (code % 2) * (np.sqrt(2.0) - 1.0) + 1.0
    want = np.exp2(-np.ceil(code / 2.0)) * odd * scale * keep
    got = logsqrt2_quant(jnp.asarray(x), scale, bits=bits)
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-5)
    # training path (continuous) agrees with 2^(-c/2) exactly on codes
    got_tr = logsqrt2_quant(jnp.asarray(x), scale, bits=bits, training=True)
    want_tr = np.exp2(-code / 2.0) * scale * keep
    np.testing.assert_allclose(got_tr, want_tr.astype(np.float32), rtol=1e-5)


@pytest.mark.parametrize("bits", [3, 4, 6])
@pytest.mark.parametrize("q", [10, 29, 37, 80, 137])
def test_adalog_lut_identity(bits, q):
    """table1/table2 decomposition reproduces 2^(-i*q/r) within the fixed-point
    mantissa grid 1/(4N-2) (the defining property of the AdaLog LUT)."""
    N = 2 ** (bits - 1)
    t1, t2 = make_adalog_tables(q, bits)
    i = np.arange(2 * N, dtype=np.float64)
    reconstructed = np.exp2(-np.asarray(t1, np.float64)) * np.asarray(t2, np.float64)
    exact = np.exp2(-i * q / R)
    # mantissa is rounded to the grid ts*2^-shift; error bounded by half a grid step
    ts = 1.0 / (4 * N - 2)
    err = np.abs(reconstructed - exact)
    bound = 0.5 * ts * np.exp2(-np.asarray(t1, np.float64)) + 1e-12
    assert np.all(err <= bound)


@pytest.mark.parametrize("bits", [4, 6])
@pytest.mark.parametrize("q", [25, 37, 50])
def test_adalog_quant_matches_lut_gather(rng, bits, q):
    """Analytic shift/mantissa evaluation == gathering from materialized LUTs."""
    N = 2 ** (bits - 1)
    x = np.abs(rng.standard_normal((512,))).astype(np.float32)
    scale = np.float32(1.1)
    got = adalog_quant(jnp.asarray(x), scale, jnp.float32(q), bits=bits)
    t1, t2 = make_adalog_tables(q, bits)
    code, keep = _log_expected(x, scale, R / q, bits)
    codes = code.astype(np.int64)
    want = np.exp2(-np.asarray(t1)[codes]) * np.asarray(t2)[codes] * scale * keep
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-5, atol=1e-8)


def test_adalog_negative_inputs_dequant_to_zero():
    x = jnp.asarray([-0.5, -1e-3, 0.0])
    out = adalog_quant(x, jnp.float32(1.0), jnp.float32(37), bits=4)
    np.testing.assert_array_equal(np.asarray(out), np.zeros(3))


def test_mantissa_table_values():
    bits = 4
    tab = np.asarray(make_mantissa_table(bits))
    ts = 1.0 / (4 * 8 - 2)
    j = np.arange(120, dtype=np.float64)
    want = np.round(np.exp2(-j / R) / ts) * ts
    np.testing.assert_allclose(tab, want.astype(np.float32), rtol=1e-6)


def test_shift_quantizer_pre_and_post_reparam(rng):
    """Shifted quantizer: result-shift before reparam; raw result after."""
    bits = 6
    qs = adalog_act_state(bits, shifted=True)
    qs = qs.replace(scale=jnp.ones((1,)) * 1.5)
    x = jnp.asarray(np.abs(rng.standard_normal((64,))).astype(np.float32)) - GELU_MIN
    pre = apply_quantizer(qs, x)
    inner = adalog_quant(x + qs.shift, qs.scale, qs.log_q, bits=bits)
    np.testing.assert_allclose(pre, inner - qs.shift, rtol=1e-6)
    post = apply_quantizer(qs.replace(bias_reparamed=jnp.ones((), jnp.bool_)), x)
    np.testing.assert_allclose(post, inner, rtol=1e-6)


def test_adaround_alpha_init_property(rng):
    """sigmoid-rectified soft target of the initial alpha == frac(w/scale)."""
    w = rng.standard_normal((32, 16)).astype(np.float32)
    scale = np.float32(0.05)
    alpha = adaround_init_alpha(jnp.asarray(w), scale)
    st = adaround_soft_targets(alpha)
    rest = w / scale - np.floor(w / scale)
    np.testing.assert_allclose(np.asarray(st), rest, rtol=1e-4, atol=1e-5)


def test_adaround_hard_vs_soft(rng):
    w = rng.standard_normal((8, 8)).astype(np.float32)
    scale = np.float32(0.1)
    alpha = adaround_init_alpha(jnp.asarray(w), scale)
    zp = jnp.float32(8.0)
    hard = adaround_quant(jnp.asarray(w), scale, zp, alpha, bits=4,
                          symmetric=False, soft=False)
    N = 8
    dec = (np.asarray(alpha) >= 0).astype(np.float64)
    q = np.clip(np.floor(w / scale) + dec + 8.0, 0, 2 * N - 1)
    want = (q - 8.0) * scale
    np.testing.assert_allclose(hard, want.astype(np.float32), rtol=1e-5)
    # soft targets keep values within one scale step of hard decisions
    soft = adaround_quant(jnp.asarray(w), scale, zp, alpha, bits=4,
                          symmetric=False, soft=True)
    assert np.max(np.abs(np.asarray(soft) - np.asarray(hard))) <= scale + 1e-6


def test_adaround_hard_weight_unclamped(rng):
    w = rng.standard_normal((4, 4)).astype(np.float32)
    scale = np.float32(0.2)
    alpha = adaround_init_alpha(jnp.asarray(w), scale)
    hw = adaround_hard_weight(jnp.asarray(w), scale, alpha)
    want = (np.floor(w / scale) + (np.asarray(alpha) >= 0)) * scale
    np.testing.assert_allclose(hw, want.astype(np.float32), rtol=1e-5)


def test_apply_quantizer_uniform_state(rng):
    x = jnp.asarray(rng.standard_normal((32,)).astype(np.float32))
    qs = uniform_act_state(4)
    qs = qs.replace(scale=jnp.full((1,), 0.1, jnp.float32),
                    zero_point=jnp.full((1,), 8.0, jnp.float32))
    out = apply_quantizer(qs, x)
    want = uniform_quant(x, qs.scale, qs.zero_point, bits=4, symmetric=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


def test_uniform_training_grads_flow_to_scale():
    x = jnp.linspace(-1.0, 1.0, 16)

    def loss(scale):
        y = uniform_quant(x, scale, jnp.float32(8.0), bits=4, symmetric=False,
                          training=True)
        return jnp.sum((y - x) ** 2)

    g = jax.grad(loss)(jnp.float32(0.13))
    assert np.isfinite(np.asarray(g)) and np.asarray(g) != 0.0
