"""CLI end-to-end: calibrate -> save -> load -> optimize on the tiny fixture
model with synthetic data (the full reference test_quant.py orchestration,
test_quant.py:197-241)."""

import argparse
import glob
import os

import numpy as np
import pytest

from adalog_tpu.cli import get_args_parser, main, make_run_dir


def _write_tiny_config(path):
    with open(path, "w") as f:
        f.write(
            "class Config:\n"
            "    def __init__(self):\n"
            "        self.calib_size = 8\n"
            "        self.optim_size = 8\n"
            "        self.calib_batch_size = 8\n"
            "        self.optim_batch_size = 4\n"
            "        self.w_bit = 6\n"
            "        self.a_bit = 6\n"
            "        self.s_bit = 6\n"
            "        self.qconv_a_bit = 8\n"
            "        self.qhead_a_bit = 6\n"
            "        self.matmul_head_channel_wise = True\n"
            "        self.post_softmax_quantizer = 'adalog'\n"
            "        self.post_gelu_quantizer = 'adalog'\n"
            "        self.eq_n = 32\n"
            "        self.search_round = 1\n"
            "        self.fpcs = True\n"
            "        self.steps = 2\n"
            "        self.keep_gpu = True\n"
            "        self.train_act = True\n"
            "        self.recon_iters = 10\n"
            "        self.use_pallas = False\n")


def _args(tmp_path, config, **overrides):
    parser = argparse.ArgumentParser(parents=[get_args_parser()])
    args = parser.parse_args([])
    args.model = "test_tiny"
    args.config = config
    args.synthetic_data = True
    args.val_batch_size = 8
    args.output_dir = os.path.join(tmp_path, "out")
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


@pytest.mark.slow
def test_cli_calibrate_then_load_then_optimize(tmp_path, monkeypatch):
    tmp_path = str(tmp_path)
    config = os.path.join(tmp_path, "tiny_cfg.py")
    _write_tiny_config(config)

    # shrink the synthetic val set for speed
    import adalog_tpu.data.imagenet as di
    monkeypatch.setattr(
        di.SyntheticLoader, "__init__",
        lambda self, spec, val_batch_size=8, n_val=16, num_classes=1000,
        seed=0: (setattr(self, "spec", spec),
                 setattr(self, "val_batch_size", 8),
                 setattr(self, "n_val", 16),
                 setattr(self, "num_classes", 10),
                 setattr(self, "seed", 0))[-1])

    # 1) calibrate
    args = _args(tmp_path, config, calibrate=True)
    params, qstate = main(args)
    assert qstate is not None and len(qstate) > 0
    ckpts = glob.glob(os.path.join(tmp_path, "out", "*", "*.ckpt"))
    assert len(ckpts) == 1
    assert "test_tiny_w6_a6_s6_calibsize_8" in ckpts[0]

    # 2) load the calibrated checkpoint and re-validate
    args2 = _args(tmp_path, config, load_calibrate_checkpoint=ckpts[0],
                  test_calibrate_checkpoint=True)
    params2, qstate2 = main(args2)
    assert set(qstate2) == set(qstate)

    # 3) calibrate + optimize (BRECQ)
    args3 = _args(tmp_path, config, calibrate=True, optimize=True)
    params3, qstate3 = main(args3)
    opt_ckpts = glob.glob(os.path.join(tmp_path, "out", "*",
                                       "*optimsize*.ckpt"))
    assert len(opt_ckpts) == 1


def test_run_dir_creation(tmp_path):
    d = make_run_dir(str(tmp_path))
    assert os.path.isdir(d)


@pytest.mark.slow
def test_cli_swin_calibrate(tmp_path, monkeypatch):
    tmp_path = str(tmp_path)
    config = os.path.join(tmp_path, "tiny_cfg.py")
    _write_tiny_config(config)
    import adalog_tpu.data.imagenet as di
    monkeypatch.setattr(
        di.SyntheticLoader, "__init__",
        lambda self, spec, val_batch_size=8, n_val=16, num_classes=1000,
        seed=0: (setattr(self, "spec", spec),
                 setattr(self, "val_batch_size", 8),
                 setattr(self, "n_val", 8),
                 setattr(self, "num_classes", 10),
                 setattr(self, "seed", 0))[-1])
    args = _args(tmp_path, config, calibrate=True)
    args.model = "test_tiny_swin"
    params, qstate = main(args)
    assert "layers.1.downsample.reduction" in qstate


@pytest.mark.slow
def test_cli_loads_reference_pth_checkpoint(tmp_path):
    """--load-calibrate-checkpoint with a reference-format torch state_dict
    (.pth) routes through ref_checkpoint and evaluates (test_quant.py:109-127
    semantics)."""
    torch = pytest.importorskip("torch")
    import jax
    import numpy as np
    from adalog_tpu.models.zoo import build_model
    from adalog_tpu.utils.config import Config
    from adalog_tpu.calib.calibrator import QuantCalibrator
    from adalog_tpu.utils.ref_checkpoint import export_reference_state_dict

    tmp_path = str(tmp_path)
    config = os.path.join(tmp_path, "tiny_cfg.py")
    _write_tiny_config(config)

    # produce a reference-format checkpoint from a calibrated tiny model
    cfg = Config(w_bit=6, a_bit=6, s_bit=6, qhead_a_bit=6, eq_n=32, steps=2,
                 search_round=1)
    spec, params = build_model("test_tiny", seed=0)
    rng = np.random.default_rng(0)
    img = spec.cfg.img_size
    batches = [rng.standard_normal((8, img, img, 3)).astype(np.float32)]
    calib = QuantCalibrator(spec, params, cfg)
    params, qstate = calib.calibrate(batches)
    params, qstate = calib.finish_calibration()
    sd = export_reference_state_dict(spec, cfg, params, qstate)
    pth = os.path.join(tmp_path, "ref.pth")
    torch.save({k: torch.tensor(np.asarray(v)) for k, v in sd.items()}, pth)

    args = _args(tmp_path, config, load_calibrate_checkpoint=pth,
                 test_calibrate_checkpoint=True)
    params2, qstate2 = main(args)
    assert sorted(qstate2) == sorted(qstate)
    # the loaded model must reproduce the exporter's quantized forward
    from adalog_tpu.models.zoo import model_forward_fn
    fwd = model_forward_fn(spec)
    x = jax.numpy.asarray(rng.standard_normal((2, img, img, 3)),
                          jax.numpy.float32)
    y0 = np.asarray(fwd(spec.cfg, params, x, qstate, {"*": "quant"}))
    y1 = np.asarray(fwd(spec.cfg, params2, x, qstate2, {"*": "quant"}))
    np.testing.assert_allclose(y0, y1, rtol=2e-5, atol=2e-5)
