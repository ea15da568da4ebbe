"""Seed-sweep the e2e pipeline differential's quality ratio.

Runs the reference pipeline (actual /root/reference code) and ours on
identical weights/data across seeds and prints the quantization-quality
ratio q_err_ours / q_err_ref — the statistic that calibrates the e2e
differential's tolerance (tests/test_ref_e2e_differential.py). The claim
the sweep supports: at tiny random-init shapes the ratio is symmetric
noise from the reparam-site FPCS trajectory forks, not a directional
quality gap.

Usage: python scripts/probe_e2e_ratio.py [seeds ...] (default 1..12)
"""

import os
import sys

_root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, _root)
sys.path.insert(0, os.path.join(_root, "tests"))

# force the CPU platform exactly like tests/conftest.py (the image's
# sitecustomize pins the axon TPU plugin; env vars alone are overridden)
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

def main():
    seeds = [int(s) for s in sys.argv[1:]] or list(range(1, 13))
    bits = int(os.environ.get("PROBE_BITS", "4"))
    family = os.environ.get("PROBE_FAMILY", "vit")
    if family == "swin":
        import test_ref_swin_e2e_differential as T
    else:
        import test_ref_e2e_differential as T
    ratios = []
    for seed in seeds:
        rng = np.random.default_rng(seed)
        r = T.run_pipelines(rng, bits)
        ratio = r["q_err_ours"] / r["q_err_ref"]
        ratios.append(ratio)
        print(f"seed {seed}: q_err_ours {r['q_err_ours']:.5f} "
              f"q_err_ref {r['q_err_ref']:.5f} ratio {ratio:.4f} "
              f"agree {r['agree']:.2f}", flush=True)
    ratios = np.asarray(ratios)
    print(f"RESULT family={family} bits={bits} n={len(ratios)} min {ratios.min():.4f} "
          f"max {ratios.max():.4f} geomean {np.exp(np.mean(np.log(ratios))):.4f}")


if __name__ == "__main__":
    main()
