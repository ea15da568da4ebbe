"""CLI driver — the reference test_quant.py surface, preserved:

  python test_quant.py --model deit_small --config configs/4bit.py
      --dataset /path/imagenet [--calibrate | --load-calibrate-checkpoint P]
      [--test-calibrate-checkpoint] [--optimize | --load-optimize-checkpoint P]
      [--test-optimize-checkpoint] [--calib-size N] [--calib-batch-size N]
      [--val-batch-size N] [--w_bit N] [--a_bit N] [--s_bit N] [--seed N]

Mirrors test_quant.py:45-81 flags (mutually-exclusive calibrate/load groups),
the timestamped run dir with collision retry (test_quant.py:21-29), file+stdout
logging, config-file import with CLI overrides (test_quant.py:139-152), and the
same orchestration (197-241). TPU-native additions: --synthetic-data (no
ImageNet on disk), --checkpoint-path (timm weights), --eval-dtype bfloat16.
"""

from __future__ import annotations

import argparse
import copy
import logging
import os
import sys
import time
from datetime import datetime

import numpy as np

log = logging.getLogger("adalog_tpu")


def get_args_parser():
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("--model", default="deit_small",
                   choices=["vit_tiny", "vit_small", "vit_base", "vit_large",
                            "deit_tiny", "deit_small", "deit_base",
                            "swin_tiny", "swin_small", "swin_base",
                            "swin_base_384", "test_tiny", "test_tiny_swin"])
    p.add_argument("--config", type=str, default="./configs/4bit.py",
                   help="path to a .py file defining Config")
    p.add_argument("--dataset", default="/dataset/imagenet/")
    p.add_argument("--calib-size", default=argparse.SUPPRESS, type=int)
    p.add_argument("--calib-batch-size", default=argparse.SUPPRESS, type=int)
    p.add_argument("--val-batch-size", default=200, type=int)
    p.add_argument("--num-workers", default=8, type=int)
    p.add_argument("--device", default="tpu", type=str,
                   help="accepted for reference-CLI compatibility; "
                        "device selection is JAX-managed")

    cal = p.add_mutually_exclusive_group()
    cal.add_argument("--calibrate", action="store_true")
    cal.add_argument("--load-calibrate-checkpoint", type=str, default=None)
    p.add_argument("--test-calibrate-checkpoint", action="store_true")

    opt = p.add_mutually_exclusive_group()
    opt.add_argument("--optimize", action="store_true")
    opt.add_argument("--load-optimize-checkpoint", type=str, default=None)
    p.add_argument("--test-optimize-checkpoint", action="store_true")

    p.add_argument("--print-freq", default=10, type=int)
    p.add_argument("--seed", default=5, type=int)
    p.add_argument("--w_bit", type=int, default=argparse.SUPPRESS)
    p.add_argument("--a_bit", type=int, default=argparse.SUPPRESS)
    p.add_argument("--s_bit", type=int, default=argparse.SUPPRESS)
    # TPU-native additions
    p.add_argument("--checkpoint-path", type=str, default=None,
                   help="timm-format pretrained weights; defaults to "
                        "./checkpoints/vit_raw/<timm_id>.bin when present")
    p.add_argument("--synthetic-data", action="store_true",
                   help="use a deterministic synthetic dataset")
    p.add_argument("--eval-dtype", default=None,
                   choices=[None, "float32", "bfloat16"])
    p.add_argument("--output-dir", default="./checkpoints/quant_result")
    p.add_argument("--no-augment-calib", action="store_true",
                   help="use the deterministic eval transform for the "
                        "calibration set instead of the reference's "
                        "training-transform distribution")
    p.add_argument("--crop-pct", type=float, default=None,
                   help="override the model spec's eval crop percentage "
                        "(timm resolve_data_config parity tuning)")
    p.add_argument("--profile", action="store_true",
                   help="capture a device trace of calibration into the run "
                        "dir (view with TensorBoard/Perfetto)")
    p.add_argument("--resume", type=str, default=None, metavar="PATH",
                   help="per-site calibration resume file: an interrupted "
                        "--calibrate run restarts where it left off "
                        "(framed npz records; TPU-native addition, the "
                        "reference has no mid-calibration resume)")
    p.add_argument("--mesh-devices", type=int, default=0,
                   help="shard calibration scoring, BRECQ and eval over the "
                        "first N local devices (jax.sharding Mesh over ICI); "
                        "0 = single-device, -1 = all local devices")
    p.add_argument("--mesh-tp", type=int, default=1,
                   help="tensor-parallel factor for EVAL on a 2D dp×tp mesh "
                        "(Megatron placement: qkv/fc1/head column-, "
                        "proj/fc2 row-parallel; GSPMD all-reduces over ICI)."
                        " Must divide --mesh-devices; calibration stays dp")
    return p


def make_run_dir(base: str) -> str:
    """Timestamped run dir with collision retry (test_quant.py:21-29)."""
    while True:
        stamp = datetime.now().strftime("%Y%m%d_%H%M")
        path = os.path.join(base, stamp)
        try:
            os.makedirs(path)
            return path
        except FileExistsError:
            time.sleep(10)


def setup_logging(run_dir: str):
    logging.basicConfig(
        level=logging.INFO, format="%(message)s",
        handlers=[logging.FileHandler(os.path.join(run_dir, "output.log")),
                  logging.StreamHandler()], force=True)


def seed_all(seed: int):
    np.random.seed(seed)


def main(args):
    import jax
    from adalog_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from adalog_tpu.utils.config import Config, load_config
    from adalog_tpu.utils.checkpoint import (
        save_checkpoint, load_checkpoint, checkpoint_name)
    from adalog_tpu.utils.metrics import validate
    from adalog_tpu.models.zoo import build_model, model_spec, model_forward_fn
    from adalog_tpu.data.imagenet import ImageNetLoader, SyntheticLoader
    from adalog_tpu.calib.calibrator import QuantCalibrator
    from adalog_tpu.calib.layout import quant_layout
    from adalog_tpu.recon.brecq import BlockReconstructor

    run_dir = make_run_dir(args.output_dir)
    setup_logging(run_dir)
    log.info("%s - start the process.", datetime.now())
    log.info("%s", args)

    cfg = load_config(args.config)
    for f in ("calib_size", "calib_batch_size", "w_bit", "a_bit", "s_bit"):
        if hasattr(args, f):
            setattr(cfg, f, getattr(args, f))
    if args.eval_dtype:
        cfg.eval_dtype = args.eval_dtype
    for name, value in vars(cfg).items():
        log.info("%s: %s", name, value)

    seed_all(args.seed)

    log.info("Building model ...")
    spec = model_spec(args.model)
    ckpt = args.checkpoint_path
    if ckpt is None:
        default = f"./checkpoints/vit_raw/{spec.timm_id}.bin"
        ckpt = default if os.path.exists(default) else None
        if ckpt is None:
            log.warning("no pretrained weights found at %s; using random "
                        "init (accuracy numbers will be meaningless)", default)
    spec, params = build_model(args.model, checkpoint_path=ckpt,
                               seed=args.seed)
    if args.crop_pct is not None:
        import dataclasses
        spec = dataclasses.replace(spec, crop_pct=args.crop_pct)
    params_full = copy.deepcopy(params)   # pristine FP32 twin for BRECQ

    log.info("Building dataloaders ...")
    if args.synthetic_data or not os.path.isdir(args.dataset):
        if not args.synthetic_data:
            log.warning("dataset %s not found; falling back to synthetic data",
                        args.dataset)
        loader = SyntheticLoader(spec, args.val_batch_size)
    else:
        loader = ImageNetLoader(args.dataset, spec, args.val_batch_size,
                                args.num_workers)

    reparam = (args.load_calibrate_checkpoint is None and
               args.load_optimize_checkpoint is None)
    qstate = None
    fwd = model_forward_fn(spec)

    mesh = None
    mesh_n = getattr(args, "mesh_devices", 0)
    if mesh_n:
        from adalog_tpu.parallel.mesh import make_mesh
        n_local = len(jax.devices())
        n = n_local if mesh_n == -1 else mesh_n
        if n > n_local:
            raise SystemExit(f"--mesh-devices {n} > {n_local} local devices")
        if n > 1:
            mesh = make_mesh(n)
            log.info("data-parallel mesh over %d devices: %s", n, mesh)

    tp = max(1, getattr(args, "mesh_tp", 1))
    eval_mesh_tp = None
    if tp > 1:
        if mesh is None or mesh.devices.size % tp:
            raise SystemExit(f"--mesh-tp {tp} must divide --mesh-devices")
        from adalog_tpu.parallel.mesh import make_mesh_2d
        eval_mesh_tp = make_mesh_2d(mesh.devices.size // tp, tp)
        log.info("eval on a 2D dp×tp mesh: %s", eval_mesh_tp)

    from adalog_tpu.ops.kernel_defaults import resolve_kernel_config
    resolve_kernel_config(cfg, spec)   # None = auto -> measured per-model
    log.info("eval kernels: use_pallas=%s eval_int8=%s",
             cfg.use_pallas, cfg.eval_int8)
    if cfg.use_pallas:
        # Under a mesh the eval forward runs inside shard_map (below) — dp
        # shards the batch, tp shards weights/heads with in-forward psums
        # (parallel/tp.py) — so the opaque pallas_call executes per-device
        # on local data and GSPMD never sees it. Kernels stay on.
        from adalog_tpu.ops import fq_attn
        fq_attn.set_enabled(True)
    if getattr(cfg, "use_pallas_gemm", False):
        if mesh is None:
            from adalog_tpu.ops import fq_gemm
            fq_gemm.set_enabled(True)
        else:
            log.info("mesh active: fq_gemm linear kernels stay disabled")
    if cfg.eval_int8:
        from adalog_tpu.ops import int8_linear
        int8_linear.set_enabled(True)

    def _prep_int8(p, qs):
        if not cfg.eval_int8:
            return None
        from adalog_tpu.ops import int8_linear
        table = int8_linear.prepare(spec, p, qs, cfg,
                                    cast_dtype=cfg.eval_dtype)
        log.info("int8 eval: weight codes materialized for %d sites",
                 len(table))
        return table

    def eval_forward(p, qs):
        # the serving API (serve.py) owns the mesh-layout dispatch:
        # single-device jit, dp shard_map, or dp×tp shard_map (parallel/tp.py)
        from adalog_tpu.serve import make_predictor
        return make_predictor(
            spec, p, qs, eval_dtype=cfg.eval_dtype,
            mesh=eval_mesh_tp if eval_mesh_tp is not None else mesh,
            int8_prep=_prep_int8(p, qs), cfg=cfg)

    def load_any_checkpoint(path):
        """Route by format: the reference's torch.save(state_dict) .pth/.bin
        (test_quant.py:109-127 semantics) or our native .ckpt."""
        if path.endswith((".pth", ".pt", ".bin")):
            from adalog_tpu.utils.ref_checkpoint import \
                load_reference_checkpoint
            log.info("loading reference-format (torch state_dict) checkpoint")
            p2, qs = load_reference_checkpoint(spec, cfg, path, params)
            return p2, qs, {}
        return load_checkpoint(path)

    calibrator = QuantCalibrator(spec, params, cfg, reparam=reparam,
                                 mesh=mesh,
                                 resume_path=getattr(args, "resume", None))

    if not args.load_optimize_checkpoint:
        if args.load_calibrate_checkpoint:
            log.info("Restoring checkpoint from '%s'",
                     args.load_calibrate_checkpoint)
            params, qstate, _ = load_any_checkpoint(
                args.load_calibrate_checkpoint)
            calibrator.params, calibrator.qstate = params, dict(qstate)
            if args.test_calibrate_checkpoint:
                validate(loader.val_loader(), eval_forward(params, qstate),
                         args.print_freq)
        else:
            log.info("%s - start calibration", datetime.now())
            t0 = time.time()
            calib_kw = ({"augment": not args.no_augment_calib}
                        if hasattr(loader, "_train") else {})
            batches = loader.calib_batches(cfg.calib_size,
                                           cfg.calib_batch_size, args.seed,
                                           **calib_kw)
            if args.profile:
                from adalog_tpu.utils.profiling import device_trace
                with device_trace(os.path.join(run_dir, "trace")):
                    params, qstate = calibrator.calibrate(batches)
            else:
                params, qstate = calibrator.calibrate(batches)
            if not args.optimize:
                params, qstate = calibrator.finish_calibration()
            log.info("%s - calibration finished in %.1fs.",
                     datetime.now(), time.time() - t0)
            save_checkpoint(
                os.path.join(run_dir, checkpoint_name(args.model, cfg,
                                                      "calibrate")),
                params, qstate)
            log.info("Validating after calibration ...")
            validate(loader.val_loader(), eval_forward(params, qstate),
                     args.print_freq)

    calib_loader_batches = None
    if args.optimize and qstate is None:
        raise SystemExit("--optimize requires a calibrated model: pass "
                         "--calibrate or --load-calibrate-checkpoint")
    if args.optimize:
        log.info("%s - start block reconstruction", datetime.now())
        t0 = time.time()
        calib_loader_batches = loader.calib_batches(
            cfg.optim_size, cfg.optim_batch_size, args.seed)
        recon = BlockReconstructor(spec, params, params_full, qstate,
                                   quant_layout(spec, cfg, reparam), cfg,
                                   mesh=mesh,
                                   resume_path=getattr(args, "resume", None))
        params, qstate = recon.reconstruct(calib_loader_batches,
                                          quant_act=cfg.train_act)
        calibrator.params, calibrator.qstate = params, dict(qstate)
        params, qstate = calibrator.finish_calibration()
        log.info("%s - block reconstruction finished in %.1fs.",
                 datetime.now(), time.time() - t0)
        save_checkpoint(
            os.path.join(run_dir, checkpoint_name(args.model, cfg,
                                                  "optimize")),
            params, qstate)
    if args.load_optimize_checkpoint:
        params, qstate, _ = load_any_checkpoint(args.load_optimize_checkpoint)
        calib_loader_batches = loader.calib_batches(
            cfg.optim_size, cfg.optim_batch_size, args.seed)
    if args.optimize or args.test_optimize_checkpoint:
        log.info("Validating on calibration set after block reconstruction ...")
        f = eval_forward(params, qstate)
        calib_iter = zip(calib_loader_batches,
                         loader.calib_labels(cfg.optim_batch_size))
        validate(calib_iter, f, args.print_freq)
        log.info("Validating on test set after block reconstruction ...")
        validate(loader.val_loader(), f, args.print_freq)
    log.info("%s - finished the process.", datetime.now())
    return params, qstate


def run():
    parser = argparse.ArgumentParser(parents=[get_args_parser()])
    main(parser.parse_args())


if __name__ == "__main__":
    run()
