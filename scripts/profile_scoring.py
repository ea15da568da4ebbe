#!/usr/bin/env python
"""Measure achieved compute/memory rates of the FPCS scoring path on-chip.

Decides VERDICT item 7 (Pallas candidate-scoring kernel): if the warm
search is far below both the MXU FLOP roofline and the HBM bandwidth
roofline, a fused kernel could win; if it sits near either roofline, XLA is
already optimal and the obligation closes with this measurement.

Times the full jitted search (quantiles + FPCS + all rounds) and the
dominant single scoring pass at deit_small qkv shapes, warm, with true
syncs (np.asarray through the tunnel).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

EQ_N, ROUNDS, STEPS, BITS = 128, 3, 6, 4
T, I, O = 32 * 197, 384, 1152     # deit_small qkv site


def main():
    import jax
    import jax.numpy as jnp
    from adalog_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from adalog_tpu.calib import search as SRCH
    from adalog_tpu.ops import scoring as S

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, I)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((O, I)) * 0.1, jnp.float32)
    b = jnp.zeros((O,), jnp.float32)
    y = jnp.matmul(x, w.T) + b

    kw = dict(w_bits=BITS, a_bits=BITS, n_V=3, eq_n=EQ_N, steps=STEPS,
              rounds=ROUNDS, use_fpcs=True)

    def sync(r):
        jax.block_until_ready(r)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0])

    # full search, warm
    sync(SRCH.search_linear_default(x, y, w, b, **kw))
    t0 = time.time()
    sync(SRCH.search_linear_default(x, y, w, b, **kw))
    full_s = time.time() - t0

    # scoring passes in the full search: w-out and a-out, each
    # ROUNDS*STEPS passes of EQ_N candidates; each candidate one (T,I)@(I,O)
    # GEMM (w side re-quantizes weights per candidate; a side re-quantizes x)
    gemm_flops = 2.0 * T * I * O
    total_flops = gemm_flops * EQ_N * (2 * ROUNDS * STEPS)
    # HBM floor per candidate: read x (T*I*4) + write/read sim (T*O*4);
    # weights are small. Per pass eq_n candidates.
    bytes_per_cand = 4.0 * (T * I + T * O)
    total_bytes = bytes_per_cand * EQ_N * (2 * ROUNDS * STEPS)

    print(f"full search (qkv site, warm): {full_s:.2f}s")
    print(f"scoring-GEMM work: {total_flops/1e12:.2f} TFLOP, "
          f">= {total_bytes/1e9:.1f} GB candidate traffic")
    print(f"achieved if scoring-bound: {total_flops/full_s/1e12:.1f} TFLOP/s "
          f"({total_bytes/full_s/1e9:.0f} GB/s)")
    print("rooflines (measured, CLAUDE.md): ~46 TFLOP/s fp32 default-prec; "
          "v5e HBM ~820 GB/s")

    # isolated single w-scoring pass, warm (one FPCS step's work)
    w_v = w.reshape(3, O // 3, I)
    s2 = jnp.full((EQ_N, 3, O // 3, 1), 0.02, jnp.float32)
    z2 = jnp.full((EQ_N, 3, O // 3, 1), 8.0, jnp.float32)
    f = jax.jit(lambda xq, tgt: S.score_linear_w_out(xq, tgt, w_v, s2, z2,
                                                     BITS))
    sync(f(x, y - b))
    t0 = time.time()
    iters = 5
    for _ in range(iters):
        r = f(x, y - b)
    sync(r)
    one_s = (time.time() - t0) / iters
    pass_flops = gemm_flops * EQ_N
    print(f"single w-scoring pass: {one_s*1e3:.0f} ms -> "
          f"{pass_flops/one_s/1e12:.1f} TFLOP/s, "
          f"{bytes_per_cand*EQ_N/one_s/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
