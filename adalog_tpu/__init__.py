"""AdaLog-TPU: a TPU-native post-training-quantization framework for Vision Transformers.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of GoatWu/AdaLog
(ECCV 2024, "AdaLog: Post-Training Quantization for Vision Transformers with
Adaptive Logarithm Quantizer"): adaptive-logarithm activation quantization with
hardware-friendly LUT dequant, percentile + FPCS progressive hyperparameter
search, LayerNorm channel reparameterization, post-GeLU bias reparameterization,
and BRECQ/AdaRound block reconstruction — all expressed as pure functions over
explicit parameter pytrees, jitted/vmapped for TPU, and sharded over device
meshes with jax.sharding.

Reference parity map (file:line cites point into the upstream repo):
  quantizers/    <- reference quantizers/{uniform,logarithm,adaround,_ste}.py
  models/        <- timm model zoo + utils/wrap_net.py graph surgery (here: native forwards)
  calib/         <- utils/calibrator.py + the per-layer search code in quant_layers/*.py
  recon/         <- utils/block_recon.py
  data/          <- utils/datasets.py
  utils/         <- utils/test_utils.py, configs/, checkpointing
  ops/           <- (new) Pallas TPU kernels + XLA scoring primitives
  parallel/      <- (new) device-mesh sharding of calibration/eval/reconstruction
"""

__version__ = "0.1.0"

from adalog_tpu.utils.config import Config, load_config  # noqa: F401


def __getattr__(name):
    # lazy convenience API (keeps `import adalog_tpu` light)
    if name == "QuantCalibrator":
        from adalog_tpu.calib.calibrator import QuantCalibrator
        return QuantCalibrator
    if name == "BlockReconstructor":
        from adalog_tpu.recon.brecq import BlockReconstructor
        return BlockReconstructor
    if name == "build_model":
        from adalog_tpu.models.zoo import build_model
        return build_model
    if name == "model_forward_fn":
        from adalog_tpu.models.zoo import model_forward_fn
        return model_forward_fn
    if name == "load_quantized":
        from adalog_tpu.serve import load_quantized
        return load_quantized
    if name == "make_predictor":
        from adalog_tpu.serve import make_predictor
        return make_predictor
    raise AttributeError(name)
