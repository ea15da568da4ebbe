#!/usr/bin/env python
"""Derive a defensible reference-calibration baseline (VERDICT item 3).

The reference publishes no latency numbers (BASELINE.md). This script makes
the baseline empirical instead of guessed:

1. TIME the actual reference search code (CUDA gates stubbed, tests/ref_bridge
   style) on this machine's CPU at REAL deit_small site shapes, one
   representative site per family, at a reduced calib size; extrapolate
   linearly in the token count (every scoring loop is linear in T) and
   multiply by the model's site census -> measured CPU-torch total.
2. COUNT the exact scoring-GEMM FLOPs per family from the loop structure
   (eq_n x steps x rounds x batched fake-quant GEMMs, linear.py:296-523) ->
   an analytic GPU-equivalent floor: FLOPs / assumed achieved GPU rate.
3. TIME our JAX searches on the same CPU at the same reduced shapes ->
   same-hardware apples-to-apples speedup.

Writes BASELINE_DERIVED.json next to the repo root and prints a summary.
Run it with the TPU idle (it is CPU-only but the box has one core).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np

# deit_small geometry (12 blocks, D=384, H=6, N=197 tokens, imgsize 224/16)
D, H, N_TOK, DEPTH = 384, 6, 197, 12
CALIB_FULL = 32          # shipped config (configs/4bit.py)
CALIB_MEAS = 2           # measured size; extrapolate x(32/2) linearly in T
EQ_N, ROUNDS, STEPS = 128, 3, 6
BITS = 4


def ref_times():
    """Per-family wall-clock of the actual reference searches at deit_small
    shapes, calib_size=CALIB_MEAS, on CPU torch."""
    from ref_bridge import cuda_stubs, load_reference
    ref = load_reference()
    rng = np.random.default_rng(0)
    S = CALIB_MEAS
    out = {}

    def tt(x):
        import torch
        return torch.tensor(np.asarray(x))

    with cuda_stubs() as torch:
        with torch.no_grad():
            # --- default Linear: qkv (384 -> 1152, n_V=3) ---
            x = rng.standard_normal((S, N_TOK, D)).astype(np.float32)
            m = ref.linear.AsymmetricallyBatchingQuantLinear(
                D, 3 * D, bias=True, w_bit=BITS, a_bit=BITS,
                calib_batch_size=32, search_round=ROUNDS, eq_n=EQ_N, n_V=3,
                fpcs=True, steps=STEPS)
            m.raw_input = tt(x)
            m.raw_out = m(tt(x))
            t0 = time.time()
            m.hyperparameter_searching()
            out["linear_qkv"] = time.time() - t0

            # --- default Linear: proj (384 -> 384) ---
            m = ref.linear.AsymmetricallyBatchingQuantLinear(
                D, D, bias=True, w_bit=BITS, a_bit=BITS, calib_batch_size=32,
                search_round=ROUNDS, eq_n=EQ_N, n_V=1, fpcs=True, steps=STEPS)
            m.raw_input = tt(x)
            m.raw_out = m(tt(x))
            t0 = time.time()
            m.hyperparameter_searching()
            out["linear_proj"] = time.time() - t0

            # --- default Linear: fc1 (384 -> 1536) ---
            m = ref.linear.AsymmetricallyBatchingQuantLinear(
                D, 4 * D, bias=True, w_bit=BITS, a_bit=BITS,
                calib_batch_size=32, search_round=ROUNDS, eq_n=EQ_N, n_V=1,
                fpcs=True, steps=STEPS)
            m.raw_input = tt(x)
            m.raw_out = m(tt(x))
            t0 = time.time()
            m.hyperparameter_searching()
            out["linear_fc1"] = time.time() - t0

            # --- post-GeLU fc2 (1536 -> 384, adalog) ---
            xg = np.abs(rng.standard_normal((S, N_TOK, 4 * D))
                        ).astype(np.float32) * 0.5 - 0.17
            m = ref.linear.PostGeluLogBasedBatchingQuantLinear(
                4 * D, D, bias=True, w_bit=BITS, a_bit=BITS,
                calib_batch_size=32, search_round=ROUNDS, eq_n=EQ_N, n_V=1,
                quantizer="adalog", fpcs=True, steps=STEPS)
            m.raw_input = tt(xg)
            m.raw_out = m(tt(xg))
            t0 = time.time()
            m.hyperparameter_searching()
            out["linear_fc2"] = time.time() - t0

            # --- matmul1 q@kT (S,H,N,64)@(S,H,64,N) ---
            hd = D // H
            A = rng.standard_normal((S, H, N_TOK, hd)).astype(np.float32)
            Bm = rng.standard_normal((S, H, hd, N_TOK)).astype(np.float32)
            m = ref.matmul.AsymmetricallyBatchingQuantMatMul(
                A_bit=BITS, B_bit=BITS, calib_batch_size=32,
                search_round=ROUNDS, eq_n=EQ_N, head_channel_wise=True,
                num_heads=H, fpcs=True, steps=STEPS)
            m.raw_input = [tt(A), tt(Bm)]
            m.raw_out = tt(A @ Bm)
            t0 = time.time()
            m.hyperparameter_searching()
            out["matmul1"] = time.time() - t0

            # --- matmul2 softmax@v ---
            logits = rng.standard_normal((S, H, N_TOK, N_TOK)).astype(
                np.float32)
            e = np.exp(logits - logits.max(-1, keepdims=True))
            As = (e / e.sum(-1, keepdims=True)).astype(np.float32)
            V = rng.standard_normal((S, H, N_TOK, hd)).astype(np.float32)
            m = ref.matmul.PostSoftmaxAsymmetricallyBatchingQuantMatMul(
                A_bit=BITS, B_bit=BITS, calib_batch_size=32,
                search_round=ROUNDS, eq_n=EQ_N, head_channel_wise=True,
                num_heads=H, fpcs=True, steps=STEPS, quantizer="adalog")
            m.raw_input = [tt(As), tt(V)]
            m.raw_out = tt(As @ V)
            t0 = time.time()
            m.hyperparameter_searching()
            out["matmul2"] = time.time() - t0

            # --- patch-embed conv (3->384, k16 s16) ---
            xi = rng.standard_normal((S, 3, 224, 224)).astype(np.float32)
            m = ref.conv.AsymmetricallyBatchingQuantConv2d(
                3, D, 16, stride=16, bias=True, w_bit=BITS, a_bit=8,
                calib_batch_size=32, search_round=ROUNDS, eq_n=EQ_N,
                fpcs=True, steps=STEPS)
            m.raw_input = tt(xi)
            m.raw_out = torch.nn.functional.conv2d(
                tt(xi), m.weight, m.bias, stride=16)
            t0 = time.time()
            m.hyperparameter_searching()
            out["conv"] = time.time() - t0

            # --- head (384 -> 1000) ---
            m = ref.linear.AsymmetricallyBatchingQuantLinear(
                D, 1000, bias=True, w_bit=BITS, a_bit=BITS,
                calib_batch_size=32, search_round=ROUNDS, eq_n=EQ_N, n_V=1,
                fpcs=True, steps=STEPS)
            xh = rng.standard_normal((S, D)).astype(np.float32)
            m.raw_input = tt(xh)
            m.raw_out = m(tt(xh))
            t0 = time.time()
            m.hyperparameter_searching()
            out["head"] = time.time() - t0
    return out


def ours_times():
    """Our jitted searches, same shapes/config, on the SAME CPU (jax cpu)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from adalog_tpu.calib import search as SRCH
    from adalog_tpu.quantizers.state import GELU_MIN

    rng = np.random.default_rng(0)
    S = CALIB_MEAS
    T = S * N_TOK
    kw = dict(w_bits=BITS, a_bits=BITS, eq_n=EQ_N, steps=STEPS, rounds=ROUNDS,
              use_fpcs=True)
    out = {}

    def timed(name, fn, *args, **kws):
        fn(*args, **kws)  # compile
        t0 = time.time()
        r = fn(*args, **kws)
        jax.block_until_ready(r)
        out[name] = time.time() - t0

    x = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
    for name, O, nv in (("linear_qkv", 3 * D, 3), ("linear_proj", D, 1),
                        ("linear_fc1", 4 * D, 1)):
        w = jnp.asarray(rng.standard_normal((O, D)) * 0.1, jnp.float32)
        b = jnp.zeros((O,), jnp.float32)
        y = jnp.matmul(x, w.T) + b
        timed(name, SRCH.search_linear_default, x, y, w, b, n_V=nv, **kw)

    xg = jnp.asarray(np.abs(rng.standard_normal((T, 4 * D))) * 0.5 - 0.17,
                     jnp.float32)
    w = jnp.asarray(rng.standard_normal((D, 4 * D)) * 0.1, jnp.float32)
    b = jnp.zeros((D,), jnp.float32)
    y = jnp.matmul(xg, w.T) + b
    timed("linear_fc2", SRCH.search_linear_postgelu_adalog, xg, y, w, b,
          jnp.float32(GELU_MIN), n_V=1, **kw)

    hd = D // H
    A = jnp.asarray(rng.standard_normal((S, H, N_TOK, hd)), jnp.float32)
    Bm = jnp.asarray(rng.standard_normal((S, H, hd, N_TOK)), jnp.float32)
    timed("matmul1", SRCH.search_matmul, A, Bm, A @ Bm,
          A_bits=BITS, B_bits=BITS, eq_n=EQ_N, steps=STEPS, rounds=ROUNDS,
          use_fpcs=True, head_cw=True)

    logits = rng.standard_normal((S, H, N_TOK, N_TOK)).astype(np.float32)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    As = jnp.asarray(e / e.sum(-1, keepdims=True), jnp.float32)
    V = jnp.asarray(rng.standard_normal((S, H, N_TOK, hd)), jnp.float32)
    timed("matmul2", SRCH.search_matmul_postsoftmax, As, V, As @ V,
          A_bits=BITS, B_bits=BITS, eq_n=EQ_N, steps=STEPS, rounds=ROUNDS,
          use_fpcs=True, head_cw=True, a_kind="adalog")

    xi = jnp.asarray(rng.standard_normal((S, 224, 224, 3)), jnp.float32)
    wc = jnp.asarray(rng.standard_normal((D, 3, 16, 16)) * 0.1, jnp.float32)
    bc = jnp.zeros((D,), jnp.float32)
    import jax.lax as lax
    yc = lax.conv_general_dilated(
        xi, jnp.transpose(wc, (2, 3, 1, 0)), (16, 16), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bc
    timed("conv", SRCH.search_conv, xi, yc, wc, bc, w_bits=BITS, eq_n=EQ_N,
          steps=STEPS, use_fpcs=True, conv_dims=(16, 16, 16, 0))

    xh = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
    wh = jnp.asarray(rng.standard_normal((1000, D)) * 0.1, jnp.float32)
    bh = jnp.zeros((1000,), jnp.float32)
    yh = jnp.matmul(xh, wh.T) + bh
    timed("head", SRCH.search_linear_default, xh, yh, wh, bh, n_V=1, **kw)
    return out


# site census for deit_small: per block qkv/proj/fc1/fc2/matmul1/matmul2,
# plus patch-embed conv and head (wrap_net.py walk). The reparam sites add
# one channel-wise self-search + re-search; the re-search IS the default
# search already counted, so the census is a (slight) underestimate of the
# reference's work.
CENSUS = {"linear_qkv": DEPTH, "linear_proj": DEPTH, "linear_fc1": DEPTH,
          "linear_fc2": DEPTH, "matmul1": DEPTH, "matmul2": DEPTH,
          "conv": 1, "head": 1}

# exact scoring-GEMM FLOPs per family per FPCS pass (one candidate set of
# eq_n, T tokens): out-MSE scoring runs eq_n fake-quant GEMMs of the site
# shape (linear.py:355-430). Self-searches are elementwise (no GEMM).
def score_flops(T):
    hd = D // H
    per_pass = {
        "linear_qkv": 2 * T * D * 3 * D,
        "linear_proj": 2 * T * D * D,
        "linear_fc1": 2 * T * D * 4 * D,
        "linear_fc2": 2 * T * 4 * D * D,
        "matmul1": 2 * (T // N_TOK) * H * N_TOK * hd * N_TOK,
        "matmul2": 2 * (T // N_TOK) * H * N_TOK * N_TOK * hd,
        "conv": 2 * (T // N_TOK) * 196 * (3 * 16 * 16) * D,
        "head": 2 * (T // N_TOK) * D * 1000,
    }
    # passes: w and a each get ROUNDS x STEPS FPCS passes of eq_n candidates
    # (+1 self init for w/a, elementwise, ignored). matmuls alternate A/B the
    # same way; conv runs a single weight round (conv.py:328-331).
    passes = {k: (2 * ROUNDS * STEPS if k.startswith("linear") else
                  (2 * ROUNDS * STEPS if k.startswith("matmul") else STEPS))
              for k in per_pass}
    return {k: per_pass[k] * EQ_N * passes[k] for k in per_pass}


def main():
    scale = CALIB_FULL / CALIB_MEAS
    print(f"timing reference searches at calib={CALIB_MEAS} "
          f"(extrapolate x{scale:.0f}) ...", flush=True)
    ref = ref_times()
    print("reference per-site:", {k: round(v, 1) for k, v in ref.items()},
          flush=True)
    print("timing our searches on the same CPU ...", flush=True)
    ours = ours_times()
    print("ours per-site:", {k: round(v, 1) for k, v in ours.items()},
          flush=True)

    ref_total = sum(ref[k] * CENSUS[k] for k in CENSUS) * scale
    ours_total = sum(ours[k] * CENSUS[k] for k in CENSUS) * scale
    fl = score_flops(CALIB_FULL * N_TOK)
    total_tflop = sum(fl[k] * CENSUS[k] for k in CENSUS) / 1e12

    # GPU-equivalent floor: the paper-era reference ran fp32 torch on a
    # consumer CUDA GPU. Achieved fp32 GEMM rates for these small-K shapes
    # with per-candidate quantize overhead: 5-15 TFLOP/s is generous.
    gpu_rate_lo, gpu_rate_hi = 5e12, 15e12
    gpu_s_hi = total_tflop * 1e12 / gpu_rate_lo
    gpu_s_lo = total_tflop * 1e12 / gpu_rate_hi

    result = {
        "measured": {
            "ref_cpu_per_site_s": ref, "ours_cpu_per_site_s": ours,
            "calib_measured": CALIB_MEAS, "extrapolation": scale,
        },
        "ref_cpu_total_s": round(ref_total, 1),
        "ours_cpu_total_s": round(ours_total, 1),
        "cpu_speedup": round(ref_total / max(ours_total, 1e-9), 2),
        "scoring_tflop_total": round(total_tflop, 1),
        "gpu_equiv_range_s": [round(gpu_s_lo, 1), round(gpu_s_hi, 1)],
        "notes": "ref_cpu: actual reference code, CUDA gates stubbed, CPU "
                 "torch, 1 core; gpu_equiv: exact scoring FLOPs / assumed "
                 "5-15 TFLOP/s achieved fp32",
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_DERIVED.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "measured"},
                     indent=1))


if __name__ == "__main__":
    main()
