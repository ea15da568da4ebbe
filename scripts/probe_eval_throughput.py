#!/usr/bin/env python
"""E2E quantized-eval throughput: plain XLA vs the fused attention kernels.

Round-3 finding (ROUND3_NOTES "post-item work"): the softmax-only fused
kernel (`run_softmax`) LOSES end-to-end because it forces the (B,H,S,S)
logits to materialize in HBM as a kernel operand, while XLA keeps the
matmul1->softmax chain fused in bf16. The flash kernel (`run_flash`) is the
fix — the whole quantized attention runs in one Pallas program and the
logits never leave VMEM. This probe measures all three paths end-to-end on
the full quantized forward (uncalibrated-but-runnable qstate; throughput
does not depend on scale values), iterations chained on-device so the relay
dispatch latency is paid once.

  nohup python scripts/probe_eval_throughput.py > /tmp/probe_eval.log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# (model, batch, iters, chain)
# chain=True: iterations linked on-device via lax.fori_loop so the relay's
# per-dispatch latency is paid once — needed where a single forward is
# sub-10ms (deit_small). For the big models a single dispatch executes for
# ~0.5-1s, so dispatch latency is noise AND the chained mega-program is a
# compile hazard: the vit_large fp32 chained forward CRASHED the remote
# compile worker (connection refused after a 45-min compile; the deit
# chained executable was already 185 MB in the cache). Plain async
# dispatches with one trailing sync are accurate there.
RUNS = [
    ("deit_small", 128, 10, True),
    ("vit_large", 16, 4, False),
    ("swin_base_384", 16, 4, False),
]


def main():
    import jax
    import jax.numpy as jnp
    from adalog_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from adalog_tpu.models.zoo import build_model, model_forward_fn, model_spec
    from adalog_tpu.utils.config import Config
    from adalog_tpu.calib.init_state import init_qstate
    from adalog_tpu.ops import fq_attn

    print(f"devices: {jax.devices()}", flush=True)
    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4)
    rng = np.random.default_rng(0)
    results = {}

    only = os.environ.get("PROBE_MODEL")
    for model, bs, iters, chain in RUNS:
        if only and model != only:
            continue
        spec, params = build_model(model, seed=0)
        qstate = init_qstate(spec, cfg, params)
        fwd = model_forward_fn(spec)
        res = spec.cfg.img_size if hasattr(spec.cfg, "img_size") else 224
        x = jnp.asarray(
            rng.standard_normal((bs, res, res, 3)).astype(np.float32))

        real_supports_flash = fq_attn.supports_flash
        from adalog_tpu.ops import int8_linear
        # (name, dtype, attn_kernels, flash, int8_linears); int8: true
        # integer int8xint8->int32 MXU GEMMs for the uniform Linear sites
        # (round-2 "no win" was a per-dispatch measurement — retest with
        # chained true execution, alone and composed with flash attention)
        variants = [
            ("fp32", jnp.float32, False, False, False),
            ("bf16", jnp.bfloat16, False, False, False),
            ("bf16+fqattn_sm", jnp.bfloat16, True, False, False),
            ("bf16+fqattn_flash", jnp.bfloat16, True, True, False),
            ("fp32+fqattn_flash", jnp.float32, True, True, False),
            ("bf16+int8", jnp.bfloat16, False, False, True),
            ("bf16+int8+flash", jnp.bfloat16, True, True, True),
        ]
        if not chain:
            # big models: bf16-only (fp32 doubles the compile load on the
            # fragile remote worker for a variant nobody ships)
            variants = [v for v in variants if v[1] == jnp.bfloat16]
        for name, dtype, attn, flash, int8 in variants:
            fq_attn.set_enabled(attn)
            int8_linear.set_enabled(int8)
            fq_attn.supports_flash = (real_supports_flash if flash
                                      else lambda *a: False)
            p = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)

            def f(xc):
                return fwd(spec.cfg, p, xc.astype(dtype), qstate,
                           {"*": "quant"}).astype(jnp.float32)

            @jax.jit
            def chained(x0):
                def body(_, carry):
                    acc, xc = carry
                    out = f(xc)
                    acc = acc + out[0, 0]
                    xc = x0 + (acc * 1e-30).astype(x0.dtype)
                    return (acc, xc)
                acc, _ = jax.lax.fori_loop(0, iters, body,
                                           (jnp.float32(0.0), x0))
                return acc

            fj = jax.jit(f)

            def measure():
                if chain:
                    np.asarray(chained(x))        # compile + sync
                    t0 = time.time()
                    np.asarray(chained(x))        # one dispatch
                else:
                    np.asarray(fj(x))             # compile + sync
                    t0 = time.time()
                    outs = [fj(x) for _ in range(iters)]
                    np.asarray(outs[-1])          # drain the async queue
                return time.time() - t0

            try:
                ips = bs * iters / measure()
                key = f"{model}/{name}"
                results[key] = round(ips, 0)
                print(f"{key}: {ips:.0f} img/s", flush=True)
            except Exception as e:
                print(f"{model}/{name} failed: {type(e).__name__}: {e}",
                      flush=True)
            finally:
                fq_attn.set_enabled(False)
                int8_linear.set_enabled(False)
                fq_attn.supports_flash = real_supports_flash
        del params, qstate
    print("EVAL_RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
