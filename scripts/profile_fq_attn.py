#!/usr/bin/env python
"""fq_attn kernel vs plain-XLA roofline at real model shapes (VERDICT item 8).

Isolated microbench of the post-softmax AV matmul (AdaLog A at scale 1,
uniform B): the Pallas kernel vs the XLA path (quantize ops + batched matmul,
which XLA fuses). Run at deit_small / vit_large / swin_base window shapes.

  nohup python scripts/profile_fq_attn.py > /tmp/profile_fq_attn.log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SHAPES = {
    # (batch, heads, S, head_dim)
    "deit_small_224": (32, 6, 197, 64),
    "vit_large_224": (8, 16, 577, 64),
    "swin_base_384_win": (256, 32, 144, 32),   # nW*B windows, deep stage
}


def main():
    import jax
    import jax.numpy as jnp
    from adalog_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from adalog_tpu.ops import fq_attn
    from adalog_tpu.quantizers.state import QuantizerState
    from adalog_tpu.quantizers.apply import apply_quantizer
    from adalog_tpu.models.layers import MatMulSite

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    results = {}
    for name, (N, H, S, D) in SHAPES.items():
        if N * H * S * D * 4 > 3 << 30:
            print(f"{name}: skipped (too large for one microbench buffer)")
            continue
        logits = rng.standard_normal((N, H, S, S)).astype(np.float32)
        A = np.exp(logits - logits.max(-1, keepdims=True))
        A = (A / A.sum(-1, keepdims=True)).astype(np.float32)
        B = rng.standard_normal((N, H, S, D)).astype(np.float32)
        Aq = QuantizerState(scale=jnp.ones((1, 1, 1, 1), jnp.float32),
                            log_q=jnp.asarray(25.0), kind="adalog", bits=4)
        Bq = QuantizerState(scale=jnp.full((1, H, 1, 1), 0.05, jnp.float32),
                            zero_point=jnp.full((1, H, 1, 1), 8.0,
                                                jnp.float32),
                            kind="uniform", bits=4, symmetric=False)
        site = MatMulSite(Aq=Aq, Bq=Bq)

        for dtype in (jnp.float32, jnp.bfloat16):
            Ad = jnp.asarray(A, dtype)
            Bd = jnp.asarray(B, dtype)
            Ld = jnp.asarray(logits, dtype)

            @jax.jit
            def xla_path(a, b):
                a_q = apply_quantizer(site.Aq, a.astype(jnp.float32))
                b_q = apply_quantizer(site.Bq, b.astype(jnp.float32))
                return jnp.matmul(a_q.astype(dtype), b_q.astype(dtype),
                                  preferred_element_type=jnp.float32)

            @jax.jit
            def pallas_path(a, b):
                return fq_attn.run(site, a, b)

            # full eval-pipeline comparison from the pre-softmax logits: the
            # fused kernel never materializes the post-softmax tensor in HBM
            @jax.jit
            def xla_sm_path(l, b):
                a = jax.nn.softmax(l.astype(jnp.float32), axis=-1)
                a_q = apply_quantizer(site.Aq, a)
                b_q = apply_quantizer(site.Bq, b.astype(jnp.float32))
                return jnp.matmul(a_q.astype(dtype), b_q.astype(dtype),
                                  preferred_element_type=jnp.float32)

            @jax.jit
            def pallas_sm_path(l, b):
                return fq_attn.run_softmax(site, l, b)

            ITERS = 20

            def make_rep(fn):
                # chain ITERS calls on-device: each iteration's input depends
                # on the previous output, so XLA cannot hoist the call, and
                # the relay's per-dispatch latency (~ms — which swamped the
                # round-2 numbers) is paid once for the whole loop
                @jax.jit
                def rep(a, b):
                    def body(_, carry):
                        acc, a = carry
                        out = fn(a, b)
                        acc = acc + out[0, 0, 0, 0].astype(jnp.float32)
                        a = a + (acc * 1e-30).astype(a.dtype)
                        return (acc, a)
                    acc, _ = jax.lax.fori_loop(
                        0, ITERS, body, (jnp.float32(0.0), a))
                    return acc
                return rep

            for label, fn in (("xla", xla_path), ("pallas", pallas_path),
                              ("xla+sm", None), ("pallas+sm", None)):
                if label.endswith("+sm"):
                    fn = xla_sm_path if label == "xla+sm" else pallas_sm_path
                    args = (Ld, Bd)
                else:
                    args = (Ad, Bd)
                try:
                    rep = make_rep(fn)
                    np.asarray(rep(*args))                # compile+sync
                    t0 = time.time()
                    np.asarray(rep(*args))                # one dispatch
                    dt = (time.time() - t0) / ITERS
                    tflops = 2 * N * H * S * S * D / dt / 1e12
                    key = f"{name}/{np.dtype(dtype).name}/{label}"
                    results[key] = round(tflops, 2)
                    print(f"{key}: {dt*1e3:.2f} ms  {tflops:.2f} TFLOP/s",
                          flush=True)
                except Exception as e:
                    print(f"{name}/{np.dtype(dtype).name}/{label} failed: "
                          f"{type(e).__name__}: {e}", flush=True)
    print("FQATTN_RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
