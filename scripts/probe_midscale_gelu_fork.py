#!/usr/bin/env python
"""Measure the mid-scale post-GeLU AdaLog base fork (q=13 vs q=14) in fp64.

tests/test_ref_midscale_differential.py sees our pipeline pick log_q=14 at
~5/12 fc2 sites where the cached reference fixture picked 13. Per the
fork-measurement methodology (CLAUDE.md / probe_e2e_ratio.py): before
loosening any gate, score both bases under the reference's own objective
(the fp64 oracle from tests/test_search_oracle_postgelu.py) on the REAL
captured post-GeLU activations, and report the relative objective gap. A
gap orders of magnitude below the grid's score spread = near-tie fork
(either choice is the same-quality quantizer); a material gap = real bug.

Usage: python scripts/probe_midscale_gelu_fork.py [block_idx ...]
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, os.path.join(_REPO, "tests"))
sys.path.insert(0, _REPO)

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import midscale_differential as md  # noqa: E402
import test_search_oracle_postgelu as O  # noqa: E402

# align the oracle module's grid constants with the midscale config
O.BITS = md.BITS
O.EQ_N = md.EQ_N


def main():
    import torch

    blocks = [int(a) for a in sys.argv[1:]] or [0, 1, 2, 3, 4, 5]
    seed_set = int(os.environ.get("SEED_SET", "0"))
    seed_model, seed_data = md.SEEDS[seed_set]
    tm = md.make_model(seed_model)
    calib_np, _ = md.make_data(seed_data)
    x_t = torch.from_numpy(np.transpose(calib_np, (0, 3, 1, 2)))

    taps = {}

    def hook(i):
        def f(_m, inp, _out):
            taps[i] = inp[0].detach().double().numpy()
        return f

    hs = [tm.blocks[i].mlp.fc2.register_forward_hook(hook(i))
          for i in blocks]
    with torch.no_grad():
        tm(x_t)
    for h in hs:
        h.remove()

    N = 2 ** (md.BITS - 1)
    shift = float(O.GELU_MIN)
    for i in blocks:
        fc2 = tm.blocks[i].mlp.fc2
        w = fc2.weight.detach().double().numpy()
        b = fc2.bias.detach().double().numpy()
        x = taps[i].reshape(-1, w.shape[1])
        tgt = x @ w.T  # y - b exactly

        ws, wz = O._w_cands(w, N)
        w_s, w_z = O._w_self_argmax(w, ws, wz, N)
        w_q = O._uq(w, w_s[:, None], w_z[:, None], N)

        ud = O._positive_percentile(x.reshape(-1), [0.9, 1.0]) + shift
        grid = ud[0] + (ud[1] - ud[0]) * np.arange(md.EQ_N) / (md.EQ_N - 1)
        a_s = grid[-2]
        q_grid = np.arange(10, 10 + md.EQ_N, dtype=np.float64)
        sims = np.array([
            -np.sum((tgt - (O._adalog_fq(x + shift, a_s, qc, N) - shift)
                     @ w_q.T) ** 2) for qc in q_grid])
        order = np.argsort(sims)[::-1]
        top = q_grid[order[:3]]
        s13 = sims[q_grid == 13.0][0]
        s14 = sims[q_grid == 14.0][0]
        spread = sims.max() - np.median(sims)
        gap = abs(s13 - s14)
        print(f"block {i}: argmax q={q_grid[sims.argmax()]:.0f} top3 {top} "
              f"| s13 {s13:.6e} s14 {s14:.6e} "
              f"gap/|s| {gap / abs(sims.max()):.2e} "
              f"gap/spread {gap / spread:.2e}", flush=True)


if __name__ == "__main__":
    main()
