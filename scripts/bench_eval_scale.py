#!/usr/bin/env python
"""Calibrated-state eval throughput at scale (VERDICT r4 #1).

Round 4 settled the use_pallas / eval_int8 defaults at deit_small only, while
the isolated attention-kernel roofline (PERFORMANCE.md) says the flash kernel
wins +15% at vit_large and +21% at swin_base_384 window shapes. This bench
measures what actually ships: end-to-end eval throughput against a CALIBRATED
qstate (round 4 proved the verdict flips between init_qstate and calibrated
state — calibration bias-folds shifted post-GeLU ops and downgrades log
bases, changing the eval graph itself), per model, all variants same-session,
median of N true-execution measurements.

Per model: calibrate once (full W4A4 FPCS, shipped config sizes, bf16
on-device capture) and save the checkpoint to /tmp so re-runs skip straight
to eval; then measure bf16-XLA vs bf16+flash-attention vs int8prep+bf16.

Measurement mode per relay hazards (CLAUDE.md):
- deit_base: iterations chained on-device via lax.fori_loop (single forward
  is sub-100 ms — dispatch latency would dominate unchained). Same depth as
  deit_small whose chained program compiles fine.
- vit_large / swin_base_384: NO chaining — the vit_large chained mega-program
  killed the remote compile server in round 3. Plain async-queued dispatches
  with one trailing sync; execution per dispatch is sized >= ~100 ms so the
  relay per-dispatch latency is noise.

Usage:
    nohup python scripts/bench_eval_scale.py > /tmp/eval_scale.log 2>&1 &
    SCALE_MODELS=vit_large python scripts/bench_eval_scale.py   # subset
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# (model, eval batch, iters, chain)
RUNS = [
    ("deit_base", 128, 10, True),
    ("vit_large", 64, 10, False),
    ("swin_base_384", 32, 10, False),
]

OUT = "/tmp/eval_scale_result.json"


def flops_per_image(spec) -> float:
    """Static forward GFLOPs of the quantized inference graph (2*M*N*K over
    its GEMMs), for MFU accounting. ViT formula matches bench.py; Swin adds
    windowed attention + PatchMerging reductions."""
    c = spec.cfg
    if spec.family == "vit":
        T = c.num_patches + 1
        D, depth, mlp = c.dim, c.depth, int(c.dim * c.mlp_ratio)
        fl = (2 * c.num_patches * (c.in_chans * c.patch_size ** 2) * D
              + depth * (2 * T * D * (3 * D)
                         + 2 * T * T * D * 2
                         + 2 * T * D * D
                         + 2 * T * D * mlp * 2)
              + 2 * D * c.num_classes)
        return fl / 1e9
    # swin
    fl = 0.0
    T0 = (c.img_size // c.patch_size) ** 2
    fl += 2 * T0 * (c.in_chans * c.patch_size ** 2) * c.embed_dim
    for i, depth in enumerate(c.depths):
        D = c.stage_dim(i)
        R = c.stage_res(i)
        T = R * R
        mlp = int(D * c.mlp_ratio)
        for j in range(depth):
            ws, _ = c.stage_window_shift(i, j)
            fl += 2 * T * D * (3 * D)          # qkv
            fl += 2 * T * (ws * ws) * D * 2    # windowed QK^T + AV
            fl += 2 * T * D * D                # proj
            fl += 2 * T * D * mlp * 2          # fc1 + fc2
        if i < len(c.depths) - 1:              # PatchMerging: 4D -> 2D
            fl += 2 * (T // 4) * (4 * D) * (2 * D)
    fl += 2 * c.stage_dim(len(c.depths) - 1) * c.num_classes
    return fl / 1e9


def calibrated_state(model, cfg):
    """Load the cached calibrated checkpoint or run the full calibration."""
    import jax
    from adalog_tpu.models.zoo import build_model
    from adalog_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
    from adalog_tpu.calib.calibrator import QuantCalibrator

    spec, params = build_model(model, seed=0)
    ckpt = f"/tmp/{model}_w4a4_scale.ckpt"
    if os.path.exists(ckpt):
        print(f"[{model}] loading cached calibration {ckpt}", flush=True)
        new_params, qstate, _ = load_checkpoint(ckpt)
        return spec, new_params, qstate

    img = spec.cfg.img_size
    rng = np.random.default_rng(0)
    bs = cfg.calib_batch_size
    batches = [rng.standard_normal((bs, img, img, 3)).astype(np.float32)
               for _ in range(max(1, cfg.calib_size // bs))]
    t0 = time.time()
    calib = QuantCalibrator(spec, params, cfg,
                            resume_path=f"/tmp/{model}_scale_resume.rs2")
    calib.calibrate(batches)
    new_params, qstate = calib.finish_calibration()
    for leaf in jax.tree_util.tree_leaves(qstate):
        np.asarray(leaf)
    print(f"[{model}] calibrated in {time.time()-t0:.1f}s "
          f"({len(qstate)} sites)", flush=True)
    save_checkpoint(ckpt, new_params, qstate,
                    meta={"model": model, "w_bit": 4, "a_bit": 4})
    return spec, new_params, qstate


def main():
    import jax
    import jax.numpy as jnp
    from adalog_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from adalog_tpu.models.zoo import model_forward_fn
    from adalog_tpu.utils.config import Config
    from adalog_tpu.ops import fq_attn, int8_linear, weight_prep

    print(f"devices: {jax.devices()}", flush=True)
    only = {m for m in os.environ.get("SCALE_MODELS", "").split(",") if m}
    eval_runs = max(1, int(os.environ.get("SCALE_EVAL_RUNS", "3")))
    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)

    for model, bs, iters, chain in RUNS:
        if only and model not in only:
            continue
        cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4)
        # bf16 on-device capture: vit_large's 15 GB fp32 tap set halves and
        # never spills (AdaLog bases proven identical, PERFORMANCE.md)
        cfg.capture_dtype = "bfloat16"
        spec, new_params, qstate = calibrated_state(model, cfg)
        fwd = model_forward_fn(spec)
        gflop = flops_per_image(spec)
        img = spec.cfg.img_size
        rng = np.random.default_rng(1)
        x = jnp.asarray(
            rng.standard_normal((bs, img, img, 3)).astype(np.float32))
        print(f"[{model}] {gflop:.1f} GFLOP/img, batch {bs}, "
              f"iters {iters}, chain={chain}", flush=True)

        variants = [
            ("bf16", False, False),
            ("bf16+flash", True, False),
            ("int8prep+bf16", False, True),
            # flash covers attention, int8 the uniform GEMMs — independent
            # site sets, so the wins should compose where both help
            ("bf16+flash+int8prep", True, True),
        ]
        mres = results.setdefault(model, {})
        mres.update({"batch": bs, "iters": iters, "chained": chain,
                     "gflop_per_img": round(gflop, 1),
                     "aggregate": f"median_of_{eval_runs}"})
        vres = mres.setdefault("variants", {})
        for name, attn, int8 in variants:
            fq_attn.set_enabled(attn)
            int8_linear.set_enabled(int8)
            prep = (int8_linear.prepare(spec, new_params, qstate, cfg,
                                        cast_dtype="bfloat16")
                    if int8 else None)
            p = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16), new_params)

            # params/qstate/prep are jit ARGUMENTS — closed-over arrays are
            # baked into the serialized HLO as literals, and vit_large's
            # ~600 MB of bf16 weights exceed the relay's remote-compile body
            # limit (HTTP 413, first hit here; serve.make_predictor carries
            # the same fix). activate() inside the traced body makes the
            # prepared codes traced args too.
            # fake-quant weights of the remaining Linear sites materialized
            # once (ops/weight_prep.py) — the serving path does the same;
            # without it every call re-quantizes every weight matrix
            wprep = weight_prep.prepare(spec, p, qstate, cfg,
                                        skip=set(prep or ()))

            def raw(pp, qs, pr, wp, xc):
                with int8_linear.activate(pr), weight_prep.activate(wp):
                    return fwd(spec.cfg, pp, xc.astype(jnp.bfloat16), qs,
                               {"*": "quant"}).astype(jnp.float32)

            fj = jax.jit(raw)

            @jax.jit
            def chained(pp, qs, pr, wp, x0):
                def body(_, carry):
                    acc, xc = carry
                    out = raw(pp, qs, pr, wp, xc)
                    acc = acc + out[0, 0]
                    xc = x0 + (acc * 1e-30).astype(x0.dtype)
                    return (acc, xc)
                acc, _ = jax.lax.fori_loop(0, iters, body,
                                           (jnp.float32(0.0), x0))
                return acc

            def run_once():
                return (chained(p, qstate, prep, wprep, x) if chain
                        else fj(p, qstate, prep, wprep, x))

            def measure_once():
                if chain:
                    t0 = time.time()
                    np.asarray(run_once())
                else:
                    t0 = time.time()
                    outs = [run_once() for _ in range(iters)]
                    np.asarray(outs[-1])       # drain the async queue
                return time.time() - t0

            try:
                # compile + first execution (not timed)
                t0 = time.time()
                np.asarray(run_once())
                compile_s = time.time() - t0
                times = [measure_once() for _ in range(eval_runs)]
                dt = float(np.median(times))
                ips = bs * iters / dt
                tflops = gflop * ips / 1e3
                vres[name] = {"img_per_s": round(ips),
                              "tflop_per_s": round(tflops, 1),
                              "runs_s": [round(t, 3) for t in times],
                              "compile_s": round(compile_s, 1)}
                print(f"[{model}] {name}: {ips:.0f} img/s "
                      f"({tflops:.1f} TFLOP/s, runs {times})", flush=True)
            except Exception as e:
                vres[name] = {"error": f"{type(e).__name__}: {e}"}
                print(f"[{model}] {name} FAILED: {type(e).__name__}: {e}",
                      flush=True)
            finally:
                fq_attn.set_enabled(False)
                int8_linear.set_enabled(False)
            with open(OUT, "w") as fo:
                json.dump(results, fo, indent=1)
        del new_params, qstate
    print("SCALE_RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
