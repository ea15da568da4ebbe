"""Run configuration.

Parity: reference configs/{3bit,4bit,6bit}.py expose a plain ``Config`` class
with attributes; test_quant.py:139-152 imports it dynamically via importlib and
lets the CLI override five fields. We keep that exact protocol (user configs are
plain .py files defining ``Config``) and add a dataclass with the same defaults
so programmatic use is typed.
"""

from __future__ import annotations

import importlib.util
import os
import sys
from dataclasses import dataclass, fields
from typing import Optional


@dataclass
class Config:
    # calibration settings (configs/4bit.py:3-15)
    calib_size: int = 32
    optim_size: int = 1024
    calib_batch_size: int = 32
    optim_batch_size: int = 32
    w_bit: int = 4
    a_bit: int = 4
    s_bit: int = 4
    qconv_a_bit: int = 8
    qhead_a_bit: int = 4
    matmul_head_channel_wise: bool = True
    post_softmax_quantizer: str = "adalog"
    post_gelu_quantizer: str = "adalog"
    # search settings (configs/4bit.py:17-20)
    eq_n: int = 128
    search_round: int = 3
    fpcs: bool = True
    steps: int = 6
    # optimization settings (configs/4bit.py:22-23)
    keep_gpu: bool = True       # keep cached block I/O on device during recon
    train_act: bool = True
    # TPU-native additions (no reference equivalent)
    search_dtype: str = "float32"   # dtype of the candidate-scoring matmuls
    # precision of the fp32 scoring GEMMs: 'highest' reproduces the
    # reference's exact-fp32 numerics (~14 TFLOP/s on v5e); 'default' (the
    # shipped default) runs the MXU's native fp32 path (~46 TFLOP/s) with
    # fp32 ACCUMULATION — only operand mantissas round. Probed on real
    # deit_small shapes (scripts/probe_precision.py, v5e): every integer
    # AdaLog base selection identical across all six families, scale/zp
    # near-ties flip with end-to-end quantized error 0.2996 vs 0.2958
    # (objective-equivalent), warm calibration 56.6 s vs 127.0 s (2.2x).
    search_precision: str = "default"
    # Gram-form weight scoring: ~12x fewer scoring FLOPs per candidate;
    # selections differential-validated against the upstream reference code
    # (test_ref_differential.py gram variants). bf16 search_dtype measured
    # SLOWER on-chip (ROUND2_NOTES) and stays off.
    w_search_gram: bool = True
    # Gram-form ACTIVATION scoring at sites where the dropped output extent
    # exceeds the contraction dim: Linear with out_features > in_features
    # (qkv 3x, fc1 4x, head ~2.6x fewer scoring FLOPs per candidate) and the
    # q@kT matmul operand searches (S/head_dim ~ 3x at ViT, ~4.5x at Swin
    # windows). Ungated shapes keep the direct scorer. On-chip probe
    # (scripts/probe_a_gram.py, real deit_small, shipped W4A4 config): every
    # integer AdaLog base selection identical (q_mismatch 0 in all six
    # families), end-to-end quantized rel err 0.3029 vs 0.2996 (the same
    # near-tie class as search_precision='default'); scale/zp leaves flip
    # only on fp32 near-ties. Default OFF: bench.py median-of-3 measured the
    # Gram form consistently ~4-5 s SLOWER at deit_small (35.0/34.4 s vs
    # 30.0 s direct) — search execution there is dispatch/bandwidth-bound,
    # not FLOP-bound, and the Gram assembly adds kernels. Opt in for big
    # models where the per-candidate FLOP cut can dominate.
    a_search_gram: bool = False
    batch_sites: bool = True        # layer-batched (vmapped) same-shape searches
    # stacked device bytes per vmapped site group; >1 GB groups crash the v5e
    # worker at vit_large shapes (ROUND2_NOTES), 512 MB measured safe
    batch_group_bytes: int = 1 << 29
    eval_dtype: str = "float32"     # dtype of the quantized eval forward
    capture_device_budget_bytes: int = 8 << 30  # spill capture to host above this
    # dtype of capture taps WHEN (and only when) they spill to host:
    # 'bfloat16' halves the device<->host transfer that dominates big-model
    # wall-clock through the tunnel (~1,230 s of vit_large's 2,983 s at
    # fp32); searches still run in fp32 (taps upcast on device after
    # re-upload). Selection drift vs fp32 capture is bounded by the spill
    # differential (tests/test_calib_e2e.py) and the on-chip probe.
    capture_spill_dtype: str = "float32"
    # dtype of capture taps ON DEVICE: 'bfloat16' halves the capture
    # FOOTPRINT (not just transfers), so a model whose fp32 taps exceed
    # capture_device_budget_bytes can stay on-device and never spill at all
    # (vit_large: 15 GB fp32 -> 7.5 GB bf16 < the 8 GB budget). Same
    # rounding/drift class as capture_spill_dtype (searches upcast to fp32
    # at consumption); supersedes it when set.
    capture_dtype: str = "float32"
    # streaming calibration: when the capture footprint exceeds
    # capture_device_budget_bytes, instead of spilling taps to host (the
    # ~20 MB/s tunnel dominates big-model wall-clock), partition the sites
    # into capture WAVES that fit the budget and re-run the raw forward per
    # wave — capture a wave's taps on-device, search its groups, free,
    # recapture the next wave. Exact: raw taps are invariant under the
    # LayerNorm reparam folds (the fold preserves the composite function —
    # the property the one-pass capture already relies on), so per-wave
    # recapture returns identical taps; the extra forward FLOPs (one raw
    # pass per wave, ~0.1-5 s) are noise next to the transfers they replace.
    # 'auto' (default): stream only when the one-pass capture would spill.
    # 'on': always stream (single wave when everything fits).
    # 'off': legacy one-pass capture with host spill.
    streaming_calib: str = "auto"
    recon_iters: int = 20000
    recon_block_group: int = 4      # same-shape blocks trained concurrently
    # (vmap) — an upper bound; the effective group size is derated so one
    # group's stacked device I/O stays under recon_group_bytes (the tunneled
    # v5e worker crashes past ~1 GB of stacked allocations; 512 MB measured
    # safe — same line calibration's batch_group_bytes budgets for)
    recon_group_bytes: int = 1 << 29
    # iterations per jitted training segment: bounds the wall-clock of one
    # device execution (multi-minute monolithic scans crash the tunneled
    # worker); the carry is donated between segments
    recon_seg_iters: int = 1000
    use_pallas: Optional[bool] = None   # Pallas fused attention kernels.
    #   None = auto: per-MODEL measured defaults (ops/kernel_defaults.py) —
    #   the verdict is model-dependent. Against CALIBRATED checkpoints
    #   (median-of-3 true-execution, same session per model): deit_small
    #   bf16-XLA 3850 img/s beats fqattn 3711 (XLA's own attention fusion
    #   wins once calibration bias-folds the shifted post-GeLU sites and
    #   downgrades cheap log bases), but the flash kernel wins +12.6% at
    #   deit_base and +57% at swin_base_384 (scripts/bench_eval_scale.py).
    #   Against an UNCALIBRATED qstate the kernel wins even at deit_small
    #   (+11%, scripts/probe_eval_throughput.py). Explicit True/False here
    #   overrides the auto table.
    use_pallas_gemm: bool = False   # Pallas fused linear GEMM kernels —
    #   measured SLOWER than XLA's own fusion at ViT shapes; opt-in
    eval_int8: Optional[bool] = None    # true-int8 MXU GEMMs for uniform
    #   Linear sites. None = auto per model (ops/kernel_defaults.py)

    @classmethod
    def from_object(cls, obj) -> "Config":
        """Build from any object with matching attributes (e.g. a user Config)."""
        kwargs = {}
        for f in fields(cls):
            if hasattr(obj, f.name):
                kwargs[f.name] = getattr(obj, f.name)
        return cls(**kwargs)


def load_config(path: str) -> Config:
    """Import ``Config`` from a user .py file (test_quant.py:139-147 protocol)."""
    path = os.path.abspath(path)
    name = os.path.splitext(os.path.basename(path))[0]
    spec = importlib.util.spec_from_file_location(name, path)
    module = importlib.util.module_from_spec(spec)
    sys.modules[name] = module
    spec.loader.exec_module(module)
    user_cls = getattr(module, "Config")
    return Config.from_object(user_cls())
