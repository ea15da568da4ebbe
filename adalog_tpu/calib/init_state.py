"""Build an uncalibrated-but-runnable qstate (min-max weight scales, unit act
scales). Used as a checkpoint-loading template, for benchmarks that only need
the quantized compute graph, and as the pre-search state.
"""

from __future__ import annotations

import jax.numpy as jnp

from adalog_tpu.models.layers import LinearSite, ConvSite, MatMulSite
from adalog_tpu.models.layers import linear_view, conv_view
from adalog_tpu.quantizers.state import (
    QuantizerState, WeightQuantizerState, GELU_MIN,
)
from adalog_tpu.calib.layout import quant_layout, tree_get


def _minmax_wq(w_v, bits):
    N = 2 ** (bits - 1)
    hi = jnp.max(w_v, axis=-1, keepdims=True)
    lo = jnp.min(w_v, axis=-1, keepdims=True)
    scale = jnp.maximum((hi - lo) / (2 * N - 1), 1e-8)
    return WeightQuantizerState(scale=scale, zero_point=jnp.round(-lo / scale),
                                bits=bits, symmetric=False)


def init_qstate(spec, cfg, params):
    layout = quant_layout(spec, cfg, reparam=False)
    qstate = {}
    for name, ss in layout.items():
        if ss.kind == "conv":
            p = tree_get(params, ss.param_path)
            qstate[name] = ConvSite(
                wq=_minmax_wq(conv_view(p.w), ss.w_bits),
                aq=QuantizerState(scale=jnp.ones((1, 1, 1, 1), jnp.float32),
                                  kind="uniform", bits=ss.a_bits,
                                  symmetric=True))
        elif ss.kind in ("matmul", "matmul_post"):
            H = ss.heads if cfg.matmul_head_channel_wise else 1
            Bq = QuantizerState(scale=jnp.ones((1, H, 1, 1), jnp.float32),
                                zero_point=jnp.zeros((1, H, 1, 1), jnp.float32),
                                kind="uniform", bits=ss.a_bits, symmetric=False)
            if ss.kind == "matmul":
                Aq = QuantizerState(
                    scale=jnp.ones((1, H, 1, 1), jnp.float32),
                    zero_point=jnp.zeros((1, H, 1, 1), jnp.float32),
                    kind="uniform", bits=ss.s_bits, symmetric=False)
            else:
                Aq = QuantizerState(
                    scale=jnp.ones((1, 1, 1, 1), jnp.float32),
                    log_q=jnp.asarray(37.0) if ss.post_quantizer == "adalog"
                    else None,
                    kind=ss.post_quantizer, bits=ss.s_bits)
            qstate[name] = MatMulSite(Aq=Aq, Bq=Bq)
        else:
            p = tree_get(params, ss.param_path)
            wq = _minmax_wq(linear_view(p.w, ss.n_V), ss.w_bits)
            if ss.kind == "postgelu" and ss.post_quantizer != "ptq4vit":
                aq = QuantizerState(
                    scale=jnp.ones((1,), jnp.float32),
                    shift=jnp.full((1,), GELU_MIN, jnp.float32),
                    log_q=jnp.asarray(37.0) if ss.post_quantizer == "adalog"
                    else None,
                    bias_reparamed=jnp.zeros((), jnp.bool_),
                    kind=ss.post_quantizer, bits=ss.a_bits, shifted=True)
            elif ss.kind == "postgelu_twin":
                aq = QuantizerState(scale=jnp.ones((2, 1), jnp.float32),
                                    kind="twin", bits=ss.a_bits)
            else:
                aq = QuantizerState(scale=jnp.ones((1,), jnp.float32),
                                    zero_point=jnp.zeros((1,), jnp.float32),
                                    kind="uniform", bits=ss.a_bits,
                                    symmetric=False)
            qstate[name] = LinearSite(wq=wq, aq=aq, n_V=ss.n_V)
    return qstate
