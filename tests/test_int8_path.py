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
    table = {"ln": int8_linear.weight_codes(p, site)}
    with int8_linear.activate(table):
        got = np.asarray(int8_linear.int8_qlinear(p, site, x, name="ln"))
    np.testing.assert_array_equal(got, want)


def test_int8_prepared_shape_mismatch_falls_back(rng):
    """A prepared table holds FULL-model codes; under tensor parallelism the
    forward sees a device-local weight shard — the lookup must fall back to
    requantizing the shard, not apply full-width codes (ADVICE r4 #1)."""
    T, I, O, bits = 24, 16, 12, 4
    p = LinearP(w=jnp.asarray((rng.standard_normal((O, I)) * 0.2
                               ).astype(np.float32)),
                b=jnp.asarray(rng.standard_normal(O).astype(np.float32)))
    site = _site(rng, O, 1, bits)
    x = jnp.asarray(rng.standard_normal((T, I)).astype(np.float32))

    # shard: first half of the output rows (column-parallel qkv/fc1 layout);
    # parallel/tp.py shards the per-row wq state alongside the weights
    p_sh = LinearP(w=p.w[: O // 2], b=p.b[: O // 2])
    site_sh = site.replace(wq=site.wq.replace(
        scale=site.wq.scale[:, : O // 2], zero_point=site.wq.zero_point[:, : O // 2]))
    want = np.asarray(int8_linear.int8_qlinear(p_sh, site_sh, x))
    table = {"ln": int8_linear.weight_codes(p, site)}       # full (O, I)
    with int8_linear.activate(table):
        got = np.asarray(int8_linear.int8_qlinear(p_sh, site_sh, x,
                                                  name="ln"))
    assert got.shape == (T, O // 2)
    np.testing.assert_array_equal(got, want)


def test_int8_prep_tables_isolated_across_loads(rng):
    """Two lazily-traced predictors each bake THEIR OWN prepared codes even
    when the second model is loaded before the first predictor's first call
    (ADVICE r4 #2 — a process-global registry rebound silently)."""
    T, I, O, bits = 8, 16, 12, 4
    site = _site(rng, O, 1, bits)
    x = jnp.asarray(rng.standard_normal((T, I)).astype(np.float32))

    def make_model(seed):
        r = np.random.default_rng(seed)
        p = LinearP(w=jnp.asarray((r.standard_normal((O, I)) * 0.2
                                   ).astype(np.float32)), b=None)
        table = {"ln": int8_linear.weight_codes(p, site)}

        @jax.jit
        def f(xx):
            return int8_linear.int8_qlinear(p, site, xx, name="ln")

        def predict(xx):                      # serve.make_predictor pattern
            with int8_linear.activate(table):
                return f(xx)
        return p, predict

    p1, pred1 = make_model(1)
    p2, pred2 = make_model(2)
    # second load first: a global registry would leave pred1 tracing p2 codes
    out2 = np.asarray(pred2(x))
    out1 = np.asarray(pred1(x))
    np.testing.assert_array_equal(
        out1, np.asarray(int8_linear.int8_qlinear(p1, site, x)))
    np.testing.assert_array_equal(
        out2, np.asarray(int8_linear.int8_qlinear(p2, site, x)))
    assert not np.array_equal(out1, out2)


def test_int8_prepare_cast_dtype_matches_per_call(rng):
    """prepare(cast_dtype=bf16) derives codes from the SAME cast weights a
    bf16 predictor evaluates per call — bit-identical under bf16 eval
    (ADVICE r4 #3)."""
    T, I, O, bits = 24, 16, 12, 4
    p = LinearP(w=jnp.asarray((rng.standard_normal((O, I)) * 0.2
                               ).astype(np.float32)),
                b=jnp.asarray(rng.standard_normal(O).astype(np.float32)))
    site = _site(rng, O, 1, bits)
    x = jnp.asarray(rng.standard_normal((T, I)).astype(np.float32))

    p_bf = LinearP(w=p.w.astype(jnp.bfloat16), b=p.b)   # predictor-cast
    want = np.asarray(int8_linear.int8_qlinear(p_bf, site, x))
    table = {"ln": int8_linear.weight_codes(p, site,
                                            cast_dtype=jnp.bfloat16)}
    with int8_linear.activate(table):
        got = np.asarray(int8_linear.int8_qlinear(p_bf, site, x, name="ln"))
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
    table = int8_linear.prepare(TinySpec, params, qstate, cfg)
    assert len(table) >= 4, sorted(table)   # qkv, proj, fc1 at minimum
    with int8_linear.activate(table):
        got = np.asarray(vit_forward(TinySpec.cfg, params, x, qstate,
                                     {"*": "quant"}))
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
