"""End-to-end calibration on a tiny ViT with synthetic data (the CPU-runnable
analog of BASELINE.json config 1: deit_tiny + 6-bit calibrate-only).

Checks: the full pipeline (capture -> per-site FPCS search -> LayerNorm
reparam -> post-GeLU bias fold) runs, produces a quantized model whose output
stays close to the FP32 model, and beats plain rounding without search.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adalog_tpu.models.vit import ViTConfig, vit_init, vit_forward
from adalog_tpu.utils.config import Config
from adalog_tpu.calib.calibrator import QuantCalibrator

CFG = ViTConfig(img_size=16, patch_size=8, dim=32, depth=2, heads=2,
                num_classes=10)


class TinySpec:
    family = "vit"
    cfg = CFG


def make_cfg(**kw):
    base = dict(w_bit=6, a_bit=6, s_bit=6, qhead_a_bit=6, eq_n=32, steps=2,
                search_round=1, fpcs=True, calib_size=8, calib_batch_size=8)
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def calibrated():
    cfg = make_cfg()
    params = vit_init(CFG, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    batches = [rng.standard_normal((8, 16, 16, 3)).astype(np.float32)]
    calib = QuantCalibrator(TinySpec, params, cfg)
    prefold_params, _ = calib.calibrate(batches)
    new_params, qstate = calib.finish_calibration()
    return params, new_params, qstate, batches, calib, prefold_params


def test_all_sites_calibrated(calibrated):
    _, _, qstate, _, calib, _ = calibrated
    assert set(qstate) == set(calib.layout)
    # reparam created per-tensor act quantizers on qkv/fc1
    site = qstate["blocks.0.attn.qkv"]
    assert site.aq.scale.shape == (1,) and site.n_V == 3
    # post-GeLU fc2 carries a shifted AdaLog quantizer with searched base
    fc2 = qstate["blocks.0.mlp.fc2"]
    assert fc2.aq.kind == "adalog" and fc2.aq.shifted
    assert 10 <= float(fc2.aq.log_q) < 10 + 32
    assert bool(fc2.aq.bias_reparamed)  # finish_calibration folded the shift
    # post-softmax matmul2 A frozen at scale 1 with searched base
    mm2 = qstate["blocks.1.attn.matmul2"]
    assert float(mm2.Aq.scale.reshape(-1)[0]) == 1.0
    assert mm2.Aq.kind == "adalog"


def test_reparam_preserves_fp32_forward(calibrated):
    """The LayerNorm channel reparam preserves the FP32 function exactly
    (pre-fold params: the GeLU bias fold intentionally changes the raw
    function, so it is excluded here)."""
    params0, _, _, batches, _, prefold = calibrated
    x = jnp.asarray(batches[0])
    y0 = np.asarray(vit_forward(CFG, params0, x))
    y1 = np.asarray(vit_forward(CFG, prefold, x))
    np.testing.assert_allclose(y1, y0, rtol=5e-3, atol=5e-3)


def test_quantized_forward_close_to_raw(calibrated):
    params0, params1, qstate, batches, _, _ = calibrated
    x = jnp.asarray(batches[0])
    y_raw = np.asarray(vit_forward(CFG, params0, x))
    y_q = np.asarray(vit_forward(CFG, params1, x, qstate, {"*": "quant"}))
    assert np.isfinite(y_q).all()
    rel = np.linalg.norm(y_q - y_raw) / np.linalg.norm(y_raw)
    # 6-bit calibrated quantization on a random tiny net: modest error
    assert rel < 0.5, rel


def test_calibrated_beats_minmax_baseline(calibrated):
    """FPCS output-MSE search should beat classic per-site min-max activation
    ranges (computed from the same captured calibration inputs) on end-to-end
    quantized output error."""
    from adalog_tpu.models.layers import LinearSite
    from adalog_tpu.calib.calibrator import capture_all_sites
    params0, params1, qstate, batches, calib, _ = calibrated
    x = jnp.asarray(batches[0])
    y_raw = np.asarray(vit_forward(CFG, params0, x))
    y_q = np.asarray(vit_forward(CFG, params1, x, qstate, {"*": "quant"}))

    taps = capture_all_sites(TinySpec, params1, batches)
    base = {}
    for nm, site in qstate.items():
        if isinstance(site, LinearSite) and site.aq.kind == "uniform":
            xin = np.asarray(taps[nm][0])
            N = 2 ** (site.aq.bits - 1)
            lo, hi = float(xin.min()), float(xin.max())
            s = max((hi - lo) / (2 * N - 1), 1e-8)
            base[nm] = site.replace(aq=site.aq.replace(
                scale=jnp.full((1,), s, jnp.float32),
                zero_point=jnp.full((1,), round(-lo / s), jnp.float32)))
        else:
            base[nm] = site
    y_b = np.asarray(vit_forward(CFG, params1, x, base, {"*": "quant"}))
    err_q = np.linalg.norm(y_q - y_raw)
    err_b = np.linalg.norm(y_b - y_raw)
    assert err_q <= err_b * 1.15, (err_q, err_b)


def test_resume_after_interruption(rng, tmp_path):
    """Interrupted calibration resumes from the per-site checkpoint and
    produces the same final state as an uninterrupted run."""
    cfg = make_cfg(batch_sites=False)   # per-site saves need sequential flow
    params = vit_init(CFG, jax.random.PRNGKey(0))
    batches = [rng.standard_normal((8, 16, 16, 3)).astype(np.float32)]
    resume = str(tmp_path / "resume.pkl")

    class Boom(Exception):
        pass

    calib = QuantCalibrator(TinySpec, params, cfg, resume_path=resume)
    orig = calib._do_matmul
    calls = {"n": 0}

    def bomb(*a, **k):
        calls["n"] += 1
        if calls["n"] == 3:
            raise Boom()
        return orig(*a, **k)

    calib._do_matmul = bomb
    import pytest as _pytest
    with _pytest.raises(Boom):
        calib.calibrate(batches)
    n_done = len(calib.qstate)
    assert 0 < n_done < len(calib.layout)

    # resume with a fresh calibrator; previously searched sites are skipped
    calib2 = QuantCalibrator(TinySpec, params, cfg, resume_path=resume)
    calib2.calibrate(batches)
    p2, q2 = calib2.finish_calibration()
    assert set(q2) == set(calib2.layout)

    # equal to an uninterrupted run
    calib3 = QuantCalibrator(TinySpec, params, cfg)
    calib3.calibrate(batches)
    p3, q3 = calib3.finish_calibration()
    x = jnp.asarray(batches[0])
    y2 = np.asarray(vit_forward(CFG, p2, x, q2, {"*": "quant"}))
    y3 = np.asarray(vit_forward(CFG, p3, x, q3, {"*": "quant"}))
    np.testing.assert_allclose(y2, y3, rtol=1e-5, atol=1e-6)


def _uninterrupted(cfg, params, batches):
    calib = QuantCalibrator(TinySpec, params, cfg)
    calib.calibrate(batches)
    return calib.finish_calibration()


def test_resume_between_fold_and_search(rng, tmp_path):
    """Death in the window between a LayerNorm reparam fold and that site's
    per-tensor re-search must NOT double-fold on resume: the fold record
    restores the folded params and the stored (r, b) rewrite the captured
    input, so the re-search runs against consistent activations."""
    cfg = make_cfg(batch_sites=False)
    params = vit_init(CFG, jax.random.PRNGKey(0))
    batches = [rng.standard_normal((8, 16, 16, 3)).astype(np.float32)]
    resume = str(tmp_path / "resume.bin")

    class Boom(Exception):
        pass

    calib = QuantCalibrator(TinySpec, params, cfg, resume_path=resume)
    orig = calib._set_linear_state

    def bomb(name, *a, **k):
        if name == "blocks.0.attn.qkv":   # first reparam site, post-fold
            raise Boom()
        return orig(name, *a, **k)

    calib._set_linear_state = bomb
    with pytest.raises(Boom):
        calib.calibrate(batches)
    assert "blocks.0.attn.qkv" not in calib.qstate   # fold recorded, search not

    calib2 = QuantCalibrator(TinySpec, params, cfg, resume_path=resume)
    assert any(t == "fold" for t, _, _ in calib2._resume_scan())
    calib2.calibrate(batches)
    p2, q2 = calib2.finish_calibration()
    assert "blocks.0.attn.qkv" in calib2._folded     # fold applied, not re-run

    p3, q3 = _uninterrupted(cfg, params, batches)
    x = jnp.asarray(batches[0])
    y2 = np.asarray(vit_forward(CFG, p2, x, q2, {"*": "quant"}))
    y3 = np.asarray(vit_forward(CFG, p3, x, q3, {"*": "quant"}))
    np.testing.assert_allclose(y2, y3, rtol=1e-5, atol=1e-6)


def test_resume_batched_after_reparam_flush(rng, tmp_path):
    """Layer-batched calibration: death at the first per-tensor group flush —
    after every reparam fold was recorded but before any site record — resumes
    to the same final state as an uninterrupted batched run."""
    cfg = make_cfg(batch_sites=True)
    params = vit_init(CFG, jax.random.PRNGKey(0))
    batches = [rng.standard_normal((8, 16, 16, 3)).astype(np.float32)]
    resume = str(tmp_path / "resume.bin")

    class Boom(Exception):
        pass

    calib = QuantCalibrator(TinySpec, params, cfg, resume_path=resume)
    orig = calib._flush_one_group
    calls = {"n": 0}

    def bomb(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise Boom()
        return orig(*a, **k)

    calib._flush_one_group = bomb
    with pytest.raises(Boom):
        calib.calibrate(batches)

    calib2 = QuantCalibrator(TinySpec, params, cfg, resume_path=resume)
    calib2.calibrate(batches)
    p2, q2 = calib2.finish_calibration()
    assert set(q2) == set(calib2.layout)
    assert len(calib2._folded) > 0

    p3, q3 = _uninterrupted(cfg, params, batches)
    x = jnp.asarray(batches[0])
    y2 = np.asarray(vit_forward(CFG, p2, x, q2, {"*": "quant"}))
    y3 = np.asarray(vit_forward(CFG, p3, x, q3, {"*": "quant"}))
    np.testing.assert_allclose(y2, y3, rtol=1e-5, atol=1e-6)


def test_resume_file_is_not_pickle(rng, tmp_path):
    """The resume stream must be framed npz records (no pickle opcodes), and
    a legacy pickle resume file must be rejected loudly, not half-loaded."""
    import pickle
    cfg = make_cfg(batch_sites=False)
    params = vit_init(CFG, jax.random.PRNGKey(0))
    batches = [rng.standard_normal((8, 16, 16, 3)).astype(np.float32)]
    resume = str(tmp_path / "resume.bin")
    calib = QuantCalibrator(TinySpec, params, cfg, resume_path=resume)
    calib.calibrate(batches)

    with open(resume, "rb") as f:
        head = f.read(6)
    assert head == QuantCalibrator._RESUME_MAGIC

    # truncated tail (death mid-write) is tolerated: records before it load
    with open(resume, "rb") as f:
        data = f.read()
    with open(resume, "wb") as f:
        f.write(data[:-7])
    calib2 = QuantCalibrator(TinySpec, params, cfg, resume_path=resume)
    recs = calib2._resume_scan()
    assert len(recs) > 0

    legacy = str(tmp_path / "legacy.pkl")
    with open(legacy, "wb") as f:
        pickle.dump(("site", {}), f)
    calib3 = QuantCalibrator(TinySpec, params, cfg, resume_path=legacy)
    with pytest.raises(ValueError, match="not a v2 resume file"):
        calib3.calibrate(batches)


# -- streaming calibration (capture waves instead of host spill) -------------


def _tiny_budget(params, batches, frac=0.25):
    """A device budget ~frac of the tiny model's tap footprint, forcing
    multiple streaming waves."""
    calib = QuantCalibrator(TinySpec, params, make_cfg())
    total = sum(calib._tap_bytes(batches, list(calib.layout)).values())
    return max(1, int(total * frac))


def test_streaming_matches_one_pass(rng):
    """Streaming waves (capture a budget-sized slice, search, free,
    recapture) produce the same calibration as the one-pass capture: raw
    taps are invariant under the reparam folds, so per-wave recapture is
    exact up to XLA fusion order."""
    params = vit_init(CFG, jax.random.PRNGKey(0))
    batches = [rng.standard_normal((8, 16, 16, 3)).astype(np.float32)]
    budget = _tiny_budget(params, batches)

    cfg_stream = make_cfg(capture_device_budget_bytes=budget)   # auto streams
    calib_s = QuantCalibrator(TinySpec, params, cfg_stream)
    waves = calib_s._streaming_waves(batches, list(calib_s.layout))
    assert waves is not None and len(waves) >= 3
    calib_s.calibrate(batches)
    p_s, q_s = calib_s.finish_calibration()

    cfg_one = make_cfg(streaming_calib="off")
    p_o, q_o = _uninterrupted(cfg_one, params, batches)

    assert set(q_s) == set(q_o)
    for nm in q_o:
        for a, b in zip(jax.tree_util.tree_leaves(q_s[nm]),
                        jax.tree_util.tree_leaves(q_o[nm])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6, err_msg=nm)
    x = jnp.asarray(batches[0])
    y_s = np.asarray(vit_forward(CFG, p_s, x, q_s, {"*": "quant"}))
    y_o = np.asarray(vit_forward(CFG, p_o, x, q_o, {"*": "quant"}))
    np.testing.assert_allclose(y_s, y_o, rtol=1e-5, atol=1e-5)


def test_streaming_forced_single_wave(rng):
    """streaming_calib='on' with an ample budget degenerates to one wave and
    still matches the one-pass path."""
    params = vit_init(CFG, jax.random.PRNGKey(0))
    batches = [rng.standard_normal((8, 16, 16, 3)).astype(np.float32)]
    cfg_on = make_cfg(streaming_calib="on")
    calib_s = QuantCalibrator(TinySpec, params, cfg_on)
    waves = calib_s._streaming_waves(batches, list(calib_s.layout))
    assert waves is not None and len(waves) == 1
    calib_s.calibrate(batches)
    p_s, q_s = calib_s.finish_calibration()

    p_o, q_o = _uninterrupted(make_cfg(streaming_calib="off"),
                              params, batches)
    x = jnp.asarray(batches[0])
    y_s = np.asarray(vit_forward(CFG, p_s, x, q_s, {"*": "quant"}))
    y_o = np.asarray(vit_forward(CFG, p_o, x, q_o, {"*": "quant"}))
    np.testing.assert_allclose(y_s, y_o, rtol=1e-5, atol=1e-5)


def test_streaming_resume_between_fold_and_search(rng, tmp_path):
    """Streaming + resume across the fold/search window: the restored fold
    is applied to the params BEFORE the wave captures, so the recaptured tap
    is already rewritten (the folded norm outputs x/r - b) and must not be
    rewritten a second time."""
    params = vit_init(CFG, jax.random.PRNGKey(0))
    batches = [rng.standard_normal((8, 16, 16, 3)).astype(np.float32)]
    budget = _tiny_budget(params, batches)
    cfg = make_cfg(capture_device_budget_bytes=budget, batch_sites=False)
    resume = str(tmp_path / "resume.bin")

    class Boom(Exception):
        pass

    calib = QuantCalibrator(TinySpec, params, cfg, resume_path=resume)
    orig = calib._set_linear_state

    def bomb(name, *a, **k):
        if name == "blocks.0.attn.qkv":
            raise Boom()
        return orig(name, *a, **k)

    calib._set_linear_state = bomb
    with pytest.raises(Boom):
        calib.calibrate(batches)
    assert "blocks.0.attn.qkv" not in calib.qstate

    calib2 = QuantCalibrator(TinySpec, params, cfg, resume_path=resume)
    calib2.calibrate(batches)
    p2, q2 = calib2.finish_calibration()
    assert "blocks.0.attn.qkv" in calib2._taps_post_fold   # skip-rewrite path
    assert set(q2) == set(calib2.layout)

    p3, q3 = _uninterrupted(cfg, params, batches)
    x = jnp.asarray(batches[0])
    y2 = np.asarray(vit_forward(CFG, p2, x, q2, {"*": "quant"}))
    y3 = np.asarray(vit_forward(CFG, p3, x, q3, {"*": "quant"}))
    np.testing.assert_allclose(y2, y3, rtol=1e-5, atol=1e-6)


def test_streaming_resume_mid_run(rng, tmp_path):
    """Death partway through a streaming run resumes and completes; already-
    searched sites are excluded from later waves entirely."""
    params = vit_init(CFG, jax.random.PRNGKey(0))
    batches = [rng.standard_normal((8, 16, 16, 3)).astype(np.float32)]
    budget = _tiny_budget(params, batches)
    cfg = make_cfg(capture_device_budget_bytes=budget, batch_sites=False)
    resume = str(tmp_path / "resume.bin")

    class Boom(Exception):
        pass

    calib = QuantCalibrator(TinySpec, params, cfg, resume_path=resume)
    orig = calib._do_matmul
    calls = {"n": 0}

    def bomb(*a, **k):
        calls["n"] += 1
        if calls["n"] == 3:
            raise Boom()
        return orig(*a, **k)

    calib._do_matmul = bomb
    with pytest.raises(Boom):
        calib.calibrate(batches)
    n_done = len(calib.qstate)
    assert 0 < n_done < len(calib.layout)

    calib2 = QuantCalibrator(TinySpec, params, cfg, resume_path=resume)
    calib2.calibrate(batches)
    p2, q2 = calib2.finish_calibration()
    assert set(q2) == set(calib2.layout)

    p3, q3 = _uninterrupted(cfg, params, batches)
    x = jnp.asarray(batches[0])
    y2 = np.asarray(vit_forward(CFG, p2, x, q2, {"*": "quant"}))
    y3 = np.asarray(vit_forward(CFG, p3, x, q3, {"*": "quant"}))
    np.testing.assert_allclose(y2, y3, rtol=1e-5, atol=1e-6)
