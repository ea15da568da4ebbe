"""Per-model eval-kernel defaults, set by measurement.

The reference has a single fp eval path (quant_layers/matmul.py:28-45 runs
fake-quant through torch GEMMs), so it has no kernel decision to make. We
ship three interchangeable eval paths — plain XLA bf16, the fused Pallas
flash-attention kernel (ops/fq_attn.py), and true-int8 MXU GEMMs for the
uniform Linear sites (ops/int8_linear.py) — and which one is fastest is a
property of the MODEL, not of the framework: XLA's own attention fusion wins
at deit_small, while the flash kernel wins increasingly with scale and
dominates in Swin's many-small-windows regime.

Measured verdicts (scripts/bench_eval_scale.py: end-to-end eval against a
CALIBRATED qstate — round 4 proved the verdict flips vs an uncalibrated one —
median-of-3 true-execution img/s, same session per model, single v5e, the
serving execution scheme: params/tables as jit args + load-time weight prep;
run r5b /tmp/eval_scale_r5b.log, PERFORMANCE.md carries the table):

  model          bf16   +flash  +int8   +both   verdict
  deit_base      1273   1413    1477    1673    flash+int8 (+31%)
  vit_large       447    491     505     557    flash+int8 (+25%)
  swin_base_384   145    214     160     238    flash+int8 (+64%)
  deit_small     (BENCH_r05 settles it at the small end)

``Config.use_pallas`` / ``Config.eval_int8`` default to None = "auto": the
CLI and the serving API resolve None through this table (exact model name
first, then the family/width heuristic the measurements support). An
explicit True/False in a config or flag always wins.
"""

from __future__ import annotations

# Exact-name verdicts. Only models that were actually measured end-to-end
# belong here; everything else falls through to the heuristic.
MEASURED: dict[str, dict[str, bool]] = {
    "deit_small": {"use_pallas": False, "eval_int8": False},
    "deit_base": {"use_pallas": True, "eval_int8": True},
    "vit_large": {"use_pallas": True, "eval_int8": True},
    "swin_base_384": {"use_pallas": True, "eval_int8": True},
}


def kernel_defaults(spec) -> dict[str, bool]:
    """Measured defaults for ``spec`` (a models.zoo.ModelSpec), heuristic
    fallback for unmeasured names: flash attention on for every Swin (the
    windowed small-GEMM regime where it wins big) and for ViTs of
    deit_base width and up; int8 off unless measured on."""
    hit = MEASURED.get(spec.name)
    if hit is not None:
        return dict(hit)
    if spec.family == "swin":
        # real swins only — the tiny CI fixtures (embed 16) are below the
        # kernel's tile sizes and gain nothing from it
        on = bool(getattr(spec.cfg, "embed_dim", 0) >= 96)
    else:
        on = bool(getattr(spec.cfg, "dim", 0) >= 768)
    return {"use_pallas": on, "eval_int8": on}


def resolve_kernel_config(cfg, spec):
    """Fill ``cfg.use_pallas`` / ``cfg.eval_int8`` in place where they are
    None (= auto); explicit bools are left untouched. Returns cfg."""
    auto = kernel_defaults(spec)
    if cfg.use_pallas is None:
        cfg.use_pallas = auto["use_pallas"]
    if getattr(cfg, "eval_int8", None) is None:
        cfg.eval_int8 = auto["eval_int8"]
    return cfg
