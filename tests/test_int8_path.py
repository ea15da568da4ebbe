"""True-int8 Linear execution: exact equivalence with the fake-quant path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adalog_tpu.models.layers import LinearP, LinearSite, qlinear
from adalog_tpu.quantizers.state import QuantizerState, WeightQuantizerState
from adalog_tpu.ops import int8_linear
from adalog_tpu.models.vit import ViTConfig, vit_init, vit_forward
from adalog_tpu.utils.config import Config
from adalog_tpu.calib.init_state import init_qstate


@pytest.fixture(autouse=True)
def enable_int8():
    int8_linear.set_enabled(True)
    yield
    int8_linear.set_enabled(False)


def _site(rng, O, n_V=1, bits=4):
    N = 2 ** (bits - 1)
    V, R = n_V, O // n_V
    return LinearSite(
        wq=WeightQuantizerState(
            scale=jnp.asarray(0.02 + 0.01 * rng.random((V, R, 1)), jnp.float32),
            zero_point=jnp.asarray(
                rng.integers(N - 2, N + 2, (V, R, 1)).astype(np.float32)),
            bits=bits, symmetric=False),
        aq=QuantizerState(scale=jnp.full((1,), 0.07, jnp.float32),
                          zero_point=jnp.full((1,), float(N - 1), jnp.float32),
                          kind="uniform", bits=bits, symmetric=False),
        n_V=n_V)


@pytest.mark.parametrize("bits,n_V", [(3, 1), (4, 3), (6, 1)])
def test_int8_matches_fake_quant(rng, bits, n_V):
    T, I, O = 24, 16, 12
    p = LinearP(w=jnp.asarray((rng.standard_normal((O, I)) * 0.2
                               ).astype(np.float32)),
                b=jnp.asarray(rng.standard_normal(O).astype(np.float32)))
    site = _site(rng, O, n_V, bits)
    x = jnp.asarray(rng.standard_normal((T, I)).astype(np.float32))

    got = int8_linear.int8_qlinear(p, site, x)
    int8_linear.set_enabled(False)
    want = qlinear(p, site, x, mode="quant")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("bits,n_V", [(4, 3), (6, 1)])
def test_int8_prepared_weights_identical(rng, bits, n_V):
    """prepare()d weight codes (registry path) produce BIT-IDENTICAL results
    to the per-call requantization — the prep is a pure hoist."""
    T, I, O = 24, 16, 12
    p = LinearP(w=jnp.asarray((rng.standard_normal((O, I)) * 0.2
                               ).astype(np.float32)),
                b=jnp.asarray(rng.standard_normal(O).astype(np.float32)))
    site = _site(rng, O, n_V, bits)
    x = jnp.asarray(rng.standard_normal((T, I)).astype(np.float32))

    want = np.asarray(int8_linear.int8_qlinear(p, site, x))
    int8_linear._PREP["ln"] = int8_linear.weight_codes(p, site)
    try:
        got = np.asarray(int8_linear.int8_qlinear(p, site, x, name="ln"))
    finally:
        int8_linear.clear_prepared()
    np.testing.assert_array_equal(got, want)


def test_int8_prepare_walks_model(rng):
    """prepare() finds the uniform Linear sites of a model layout and the
    prepared model forward matches the unprepared int8 forward exactly."""
    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4)

    class TinySpec:
        family = "vit"
        cfg = ViTConfig(img_size=16, patch_size=8, dim=32, depth=1, heads=2,
                        num_classes=10)

    params = vit_init(TinySpec.cfg, jax.random.PRNGKey(0))
    qstate = init_qstate(TinySpec, cfg, params)
    for nm, site in list(qstate.items()):
        if hasattr(site, "aq") and site.aq.kind == "uniform" and \
                site.aq.zero_point is not None:
            qstate[nm] = site.replace(aq=site.aq.replace(
                scale=jnp.full_like(site.aq.scale, 0.05),
                zero_point=jnp.full_like(site.aq.zero_point, 8.0)))
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    want = np.asarray(vit_forward(TinySpec.cfg, params, x, qstate,
                                  {"*": "quant"}))
    n = int8_linear.prepare(TinySpec, params, qstate, cfg)
    assert n >= 4, n        # qkv, proj, fc1 at minimum (fc2/head gating vary)
    try:
        got = np.asarray(vit_forward(TinySpec.cfg, params, x, qstate,
                                     {"*": "quant"}))
    finally:
        int8_linear.clear_prepared()
    np.testing.assert_array_equal(got, want)


def test_int8_dispatch_in_model(rng):
    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4)

    class TinySpec:
        family = "vit"
        cfg = ViTConfig(img_size=16, patch_size=8, dim=32, depth=1, heads=2,
                        num_classes=10)

    params = vit_init(TinySpec.cfg, jax.random.PRNGKey(0))
    qstate = init_qstate(TinySpec, cfg, params)
    for nm, site in list(qstate.items()):
        if hasattr(site, "aq") and site.aq.kind == "uniform" and \
                site.aq.zero_point is not None:
            qstate[nm] = site.replace(aq=site.aq.replace(
                scale=jnp.full_like(site.aq.scale, 0.05),
                zero_point=jnp.full_like(site.aq.zero_point, 8.0)))
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    got = np.asarray(vit_forward(TinySpec.cfg, params, x, qstate,
                                 {"*": "quant"}))
    int8_linear.set_enabled(False)
    want = np.asarray(vit_forward(TinySpec.cfg, params, x, qstate,
                                  {"*": "quant"}))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
