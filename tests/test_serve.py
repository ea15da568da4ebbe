"""Serving API (adalog_tpu/serve.py): one predictor over every mesh layout."""

import numpy as np
import jax
import jax.numpy as jnp

from adalog_tpu.models.vit import ViTConfig, vit_init, vit_forward
from adalog_tpu.utils.config import Config
from adalog_tpu.calib.init_state import init_qstate
from adalog_tpu.serve import make_predictor, load_quantized

CFG = ViTConfig(img_size=16, patch_size=8, dim=32, depth=2, heads=2,
                num_classes=10)


class TinySpec:
    family = "vit"
    cfg = CFG


def _fixture(rng, n=8):
    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4)
    params = vit_init(CFG, jax.random.PRNGKey(0))
    qstate = init_qstate(TinySpec, cfg, params)
    x = jnp.asarray(rng.standard_normal((n, 16, 16, 3)).astype(np.float32))
    return params, qstate, x


def test_predictor_single_device(rng):
    params, qstate, x = _fixture(rng)
    y_ref = np.asarray(vit_forward(CFG, params, x, qstate, {"*": "quant"}))
    pred = make_predictor(TinySpec, params, qstate)
    np.testing.assert_allclose(np.asarray(pred(x)), y_ref,
                               rtol=1e-6, atol=1e-6)


def test_predictor_dp_mesh_with_remainder(rng):
    """Divisible batches go through shard_map; the remainder batch falls
    back to the single-program path. Both must match the reference."""
    from adalog_tpu.parallel.mesh import make_mesh

    params, qstate, x = _fixture(rng, n=16)
    pred = make_predictor(TinySpec, params, qstate, mesh=make_mesh(8))
    for n in (16, 5):      # 16 % 8 == 0 -> shard_map; 5 -> fallback
        xb = x[:n]
        y_ref = np.asarray(vit_forward(CFG, params, xb, qstate,
                                       {"*": "quant"}))
        np.testing.assert_allclose(np.asarray(pred(xb)), y_ref,
                                   rtol=2e-5, atol=2e-5)


def test_predictor_tp_mesh_pads_remainder(rng):
    """dp×tp: remainder batches are padded to a dp multiple and sliced back
    (never falling back to an unsharded single-device program)."""
    from adalog_tpu.parallel.mesh import make_mesh_2d

    params, qstate, x = _fixture(rng, n=8)
    pred = make_predictor(TinySpec, params, qstate, mesh=make_mesh_2d(4, 2))
    for n in (8, 3):       # 3 pads to 4 on dp=4
        xb = x[:n]
        y_ref = np.asarray(vit_forward(CFG, params, xb, qstate,
                                       {"*": "quant"}))
        y = np.asarray(pred(xb))
        assert y.shape == (n, 10)
        np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-4)


def test_load_quantized_roundtrip(rng, tmp_path, monkeypatch):
    """load_quantized: native .ckpt -> predictor equals the in-memory one."""
    from adalog_tpu.utils.checkpoint import save_checkpoint
    from adalog_tpu.models import zoo

    params, qstate, x = _fixture(rng)
    path = str(tmp_path / "m.ckpt")
    save_checkpoint(path, params, qstate, {"model": "test_tiny"})

    # route the zoo's test_tiny fixture onto this test's tiny config
    monkeypatch.setitem(
        zoo.MODEL_ZOO, "test_tiny",
        zoo.ModelSpec(name="test_tiny", family="vit", timm_id="test_tiny",
                      cfg=CFG))
    pred, spec, p2, qs2 = load_quantized(
        "test_tiny", path, config=Config(w_bit=4, a_bit=4, s_bit=4,
                                         qhead_a_bit=4))
    y_ref = np.asarray(vit_forward(CFG, params, x, qstate, {"*": "quant"}))
    np.testing.assert_allclose(np.asarray(pred(x)), y_ref,
                               rtol=1e-6, atol=1e-6)


def test_load_quantized_reference_pth(rng, tmp_path, monkeypatch):
    """load_quantized routes .pth through the reference-format loader and
    the resulting predictor matches the in-memory quantized forward."""
    torch = __import__("torch")
    from adalog_tpu.utils.ref_checkpoint import (
        export_reference_state_dict, load_reference_checkpoint)
    from adalog_tpu.models import zoo

    params, qstate, x = _fixture(rng)
    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4)
    sd = export_reference_state_dict(TinySpec, cfg, params, qstate)
    pth = str(tmp_path / "ref.pth")
    torch.save({k: torch.tensor(np.asarray(v)) for k, v in sd.items()}, pth)

    monkeypatch.setitem(
        zoo.MODEL_ZOO, "test_tiny",
        zoo.ModelSpec(name="test_tiny", family="vit", timm_id="test_tiny",
                      cfg=CFG))
    pred, spec, p2, qs2 = load_quantized("test_tiny", pth, config=cfg)

    y_ref = np.asarray(vit_forward(CFG, p2, x, qs2, {"*": "quant"}))
    np.testing.assert_allclose(np.asarray(pred(x)), y_ref,
                               rtol=1e-6, atol=1e-6)
    # and the loaded state reproduces the exporter's quantized forward
    y0 = np.asarray(vit_forward(CFG, params, x, qstate, {"*": "quant"}))
    np.testing.assert_allclose(y_ref, y0, rtol=2e-4, atol=2e-4)


def test_predictor_tp_bfloat16(rng):
    """bf16 serving under dp×tp: psum order may perturb low bits; the result
    must stay within bf16 tolerance of the single-device bf16 path."""
    from adalog_tpu.parallel.mesh import make_mesh_2d

    params, qstate, x = _fixture(rng, n=8)
    pred1 = make_predictor(TinySpec, params, qstate, eval_dtype="bfloat16")
    pred = make_predictor(TinySpec, params, qstate, eval_dtype="bfloat16",
                          mesh=make_mesh_2d(4, 2))
    y1 = np.asarray(pred1(x))
    y = np.asarray(pred(x))
    np.testing.assert_allclose(y, y1, rtol=2e-2, atol=2e-2)


def test_predictor_bake_and_args_paths_agree(rng):
    """Small models bake weights into the executable (XLA constant-folds the
    weight fake-quant pipeline); big ones pass them as jit arguments (serialized
    constants exceed remote-compile limits at vit_large scale). Both execution
    schemes — and the load-time weight_prep table the args scheme relies on —
    must produce identical logits."""
    params, qstate, x = _fixture(rng)
    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4)
    y_ref = np.asarray(vit_forward(CFG, params, x, qstate, {"*": "quant"}))
    for bake in (True, False):
        pred = make_predictor(TinySpec, params, qstate, cfg=cfg,
                              bake_weights=bake)
        np.testing.assert_allclose(np.asarray(pred(x)), y_ref,
                                   rtol=1e-6, atol=1e-6)


def test_predictor_dp_mesh_arg_weights(rng):
    """The dp shard_map path with jit-argument weights (big-model scheme)."""
    from adalog_tpu.parallel.mesh import make_mesh

    params, qstate, x = _fixture(rng, n=16)
    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4)
    pred = make_predictor(TinySpec, params, qstate, mesh=make_mesh(8),
                          cfg=cfg, bake_weights=False)
    y_ref = np.asarray(vit_forward(CFG, params, x, qstate, {"*": "quant"}))
    np.testing.assert_allclose(np.asarray(pred(x)), y_ref,
                               rtol=2e-5, atol=2e-5)
