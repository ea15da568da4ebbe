"""Debug-mode ablations (the reference's debug_only_quant_weight/act,
linear.py:31-34), multi-batch calibration capture, and model-zoo geometry."""

import numpy as np
import jax
import jax.numpy as jnp

from adalog_tpu.models.vit import ViTConfig, vit_init, vit_forward
from adalog_tpu.models.zoo import model_spec
from adalog_tpu.models.swin import SwinConfig
from adalog_tpu.utils.config import Config
from adalog_tpu.calib.init_state import init_qstate
from adalog_tpu.calib.calibrator import QuantCalibrator, capture_all_sites

CFG = ViTConfig(img_size=16, patch_size=8, dim=32, depth=2, heads=2,
                num_classes=10)


class TinySpec:
    family = "vit"
    cfg = CFG


def test_debug_mode_ablation(rng):
    """w_only and a_only isolate weight- vs activation-quant error; both lie
    between raw and fully-quantized outputs in error magnitude."""
    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4)
    params = vit_init(CFG, jax.random.PRNGKey(0))
    qstate = init_qstate(TinySpec, cfg, params)
    x = jnp.asarray(rng.standard_normal((4, 16, 16, 3)).astype(np.float32))

    y_raw = np.asarray(vit_forward(CFG, params, x))
    outs = {m: np.asarray(vit_forward(CFG, params, x, qstate, {"*": m}))
            for m in ("raw", "w_only", "a_only", "quant")}
    np.testing.assert_array_equal(outs["raw"], y_raw)
    err = {m: np.linalg.norm(outs[m] - y_raw) for m in outs}
    assert err["w_only"] > 0 and err["a_only"] > 0
    # partial quantization errs no more than full quantization (up to noise)
    assert err["w_only"] <= err["quant"] * 2.0
    assert err["a_only"] <= err["quant"] * 2.0


def test_per_site_mode_override(rng):
    """modes dict: one site raw while the rest quantize."""
    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4)
    params = vit_init(CFG, jax.random.PRNGKey(0))
    qstate = init_qstate(TinySpec, cfg, params)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    full = np.asarray(vit_forward(CFG, params, x, qstate, {"*": "quant"}))
    partial = np.asarray(vit_forward(
        CFG, params, x, qstate, {"*": "quant", "head": "raw"}))
    assert not np.array_equal(full, partial)


def test_multi_batch_capture_concat(rng):
    params = vit_init(CFG, jax.random.PRNGKey(0))
    b1 = rng.standard_normal((4, 16, 16, 3)).astype(np.float32)
    b2 = rng.standard_normal((4, 16, 16, 3)).astype(np.float32)
    taps_multi = capture_all_sites(TinySpec, params, [b1, b2])
    taps_single = capture_all_sites(TinySpec, params,
                                    [np.concatenate([b1, b2])])
    for nm in taps_single:
        for a, b in zip(taps_multi[nm], taps_single[nm]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)


def test_capture_spill_matches_device(rng):
    params = vit_init(CFG, jax.random.PRNGKey(0))
    b = rng.standard_normal((4, 16, 16, 3)).astype(np.float32)
    dev = capture_all_sites(TinySpec, params, [b], device_budget_bytes=None)
    spl = capture_all_sites(TinySpec, params, [b], device_budget_bytes=1)
    for nm in dev:
        assert isinstance(spl[nm][0], np.ndarray)
        for a, c in zip(dev[nm], spl[nm]):
            np.testing.assert_allclose(np.asarray(a), c, rtol=1e-6, atol=1e-6)


def test_capture_spill_bf16_dtype_and_accuracy(rng):
    """bf16 spill taps are actually bf16 on host (the halved-transfer claim)
    and equal the fp32 taps to bf16 rounding."""
    import jax.numpy as jnp
    import ml_dtypes
    params = vit_init(CFG, jax.random.PRNGKey(0))
    b = rng.standard_normal((4, 16, 16, 3)).astype(np.float32)
    f32 = capture_all_sites(TinySpec, params, [b], device_budget_bytes=1)
    bf16 = capture_all_sites(TinySpec, params, [b], device_budget_bytes=1,
                             spill_dtype=jnp.bfloat16)
    for nm in f32:
        for a, c in zip(f32[nm], bf16[nm]):
            assert c.dtype == ml_dtypes.bfloat16
            np.testing.assert_allclose(np.asarray(a),
                                       np.asarray(c, np.float32),
                                       rtol=8e-3, atol=8e-3)


def test_capture_bf16_on_device_halves_footprint(rng):
    """capture_dtype=bf16 keeps taps ON DEVICE in bf16 and makes the spill
    decision against the halved bytes: a budget that forces fp32 to spill
    keeps bf16 resident (the vit_large never-spill optimization)."""
    import ml_dtypes
    params = vit_init(CFG, jax.random.PRNGKey(0))
    b = rng.standard_normal((4, 16, 16, 3)).astype(np.float32)
    f32 = capture_all_sites(TinySpec, params, [b], device_budget_bytes=None)
    total_f32 = sum(int(np.prod(a.shape)) * 4
                    for tup in f32.values() for a in tup)
    budget = int(total_f32 * 0.6)    # fp32 spills, bf16 (0.5x) fits

    spl = capture_all_sites(TinySpec, params, [b],
                            device_budget_bytes=budget)
    assert all(isinstance(a, np.ndarray) for a in spl[next(iter(spl))])

    bf16 = capture_all_sites(TinySpec, params, [b],
                             device_budget_bytes=budget,
                             capture_dtype=jnp.bfloat16)
    for nm in f32:
        for a, c in zip(f32[nm], bf16[nm]):
            assert not isinstance(c, np.ndarray)     # stayed on device
            assert c.dtype == jnp.bfloat16
            np.testing.assert_allclose(np.asarray(a),
                                       np.asarray(c, np.float32),
                                       rtol=8e-3, atol=8e-3)


def test_capture_grouped_on_device_matches_single_pass(rng):
    """A budget that fits the total but not one pass (total < budget,
    per-pass cap = budget//4) takes grouped on-device passes — taps must
    stay on device and match the single-pass capture (to fusion-order ulps:
    returning a tap subset lets XLA fuse the forward differently)."""
    params = vit_init(CFG, jax.random.PRNGKey(0))
    b = rng.standard_normal((4, 16, 16, 3)).astype(np.float32)
    single = capture_all_sites(TinySpec, params, [b])
    total = sum(int(np.prod(a.shape)) * 4
                for tup in single.values() for a in tup)
    grouped = capture_all_sites(TinySpec, params, [b],
                                device_budget_bytes=int(total * 1.5))
    for nm in single:
        for a, c in zip(single[nm], grouped[nm]):
            assert not isinstance(c, np.ndarray)
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=1e-6, atol=1e-6)


def test_capture_bf16_calibration_drift(rng):
    """Full calibration with on-device bf16 taps (no spill) vs fp32: the
    quantized models must be equally good approximations of FP32."""
    from adalog_tpu.models.vit import vit_forward

    params = vit_init(CFG, jax.random.PRNGKey(0))
    batches = [rng.standard_normal((8, 16, 16, 3)).astype(np.float32)]
    x = np.asarray(batches[0])

    outs = {}
    for cd in ("float32", "bfloat16"):
        cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4, eq_n=32,
                     steps=2, search_round=1, capture_dtype=cd)
        calib = QuantCalibrator(TinySpec, params, cfg)
        calib.calibrate(batches)
        p, q = calib.finish_calibration()
        outs[cd] = np.asarray(vit_forward(CFG, p, x, q, {"*": "quant"}))
    y_raw = np.asarray(vit_forward(CFG, params, x))
    e32 = np.linalg.norm(outs["float32"] - y_raw)
    e16 = np.linalg.norm(outs["bfloat16"] - y_raw)
    assert e16 <= e32 * 1.10, (e16, e32)


def test_spill_bf16_calibration_drift(rng):
    """Full calibration with forced spill, fp32 vs bf16 taps: the quantized
    models must be equally good approximations of FP32 (the drift bound the
    vit_large wall-clock optimization relies on)."""
    from adalog_tpu.utils.config import Config
    from adalog_tpu.calib.calibrator import QuantCalibrator
    from adalog_tpu.models.vit import vit_forward

    params = vit_init(CFG, jax.random.PRNGKey(0))
    batches = [rng.standard_normal((8, 16, 16, 3)).astype(np.float32)]
    x = np.asarray(batches[0])

    outs = {}
    for sd in ("float32", "bfloat16"):
        cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4, eq_n=32,
                     steps=2, search_round=1, capture_device_budget_bytes=1,
                     capture_spill_dtype=sd, streaming_calib="off")
        calib = QuantCalibrator(TinySpec, params, cfg)
        calib.calibrate(batches)
        p, q = calib.finish_calibration()
        outs[sd] = np.asarray(vit_forward(CFG, p, x, q, {"*": "quant"}))
    y_raw = np.asarray(vit_forward(CFG, params, x))
    e32 = np.linalg.norm(outs["float32"] - y_raw)
    e16 = np.linalg.norm(outs["bfloat16"] - y_raw)
    assert e16 <= e32 * 1.10, (e16, e32)


def test_swin_384_geometry():
    spec = model_spec("swin_base_384")
    cfg = spec.cfg
    assert [cfg.stage_res(i) for i in range(4)] == [96, 48, 24, 12]
    for i in range(4):
        ws, shift0 = cfg.stage_window_shift(i, 0)
        _, shift1 = cfg.stage_window_shift(i, 1)
        assert ws == 12
        assert shift0 == 0
        # last stage: resolution == window -> shift disabled
        assert shift1 == (0 if cfg.stage_res(i) <= 12 else 6)


def test_zoo_specs_consistent():
    for name in ("vit_tiny", "vit_small", "vit_base", "vit_large",
                 "deit_tiny", "deit_small", "deit_base"):
        spec = model_spec(name)
        assert spec.cfg.dim % spec.cfg.heads == 0
    for name in ("swin_tiny", "swin_small", "swin_base"):
        spec = model_spec(name)
        for i in range(len(spec.cfg.depths)):
            assert spec.cfg.stage_res(i) % min(7, spec.cfg.stage_res(i)) == 0


def test_layout_site_counts_all_models():
    """Every zoo model's quant layout enumerates the expected site count:
    conv + head + 6 per transformer block + swin reductions."""
    from adalog_tpu.calib.layout import quant_layout
    from adalog_tpu.utils.config import Config as RunCfg
    cfg = RunCfg(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4)
    expect = {
        "vit_tiny": 2 + 6 * 12, "vit_small": 2 + 6 * 12,
        "vit_base": 2 + 6 * 12, "vit_large": 2 + 6 * 24,
        "deit_tiny": 2 + 6 * 12,
        "swin_tiny": 2 + 6 * 12 + 3, "swin_small": 2 + 6 * 24 + 3,
        "swin_base": 2 + 6 * 24 + 3, "swin_base_384": 2 + 6 * 24 + 3,
    }
    for name, n in expect.items():
        layout = quant_layout(model_spec(name), cfg)
        assert len(layout) == n, (name, len(layout), n)
        kinds = {s.kind for s in layout.values()}
        assert {"conv", "matmul", "matmul_post", "postgelu"} <= kinds


def test_validate_metrics(rng):
    """validate() top-1/top-5/loss against a manual computation."""
    from adalog_tpu.utils.metrics import validate
    B, C = 16, 12
    logits = rng.standard_normal((B, C)).astype(np.float32)
    labels = rng.integers(0, C, B).astype(np.int32)

    def fwd(x):
        return jnp.asarray(logits)

    loader = [(np.zeros((B, 4, 4, 3), np.float32), labels)]
    loss, top1, top5 = validate(iter(loader), fwd)

    order = np.argsort(-logits, axis=1)
    want1 = (order[:, 0] == labels).mean() * 100
    want5 = np.any(order[:, :5] == labels[:, None], axis=1).mean() * 100
    assert abs(top1 - want1) < 1e-6
    assert abs(top5 - want5) < 1e-6
    lse = np.log(np.exp(logits).sum(1))
    want_loss = float(np.mean(lse - logits[np.arange(B), labels]))
    assert abs(loss - want_loss) < 1e-4
