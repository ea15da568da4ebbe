"""fpcs() must warn when the refine schedule is a diverging walk.

With eq_n/width < 2 the reference's refine step (linear.py:491-502) has one
child per survivor and delta/(cnt-0.5) DOUBLES the delta each step — a
noise-sensitive random walk instead of a contraction. We keep the faithful
behavior (the midscale BRECQ fork analysis showed the reference itself forks
fc2 scales there, scripts/probe_midscale_site_fork.py) but surface it, since
a user-supplied config can reach it via the width-32 post-GeLU joint FPCS
with eq_n < 64.
"""

import logging

import jax.numpy as jnp
import numpy as np

from adalog_tpu.calib.search import fpcs


def _run(eq_n, width, steps):
    u = 3
    scales = jnp.linspace(0.1, 1.0, eq_n)[:, None] * jnp.ones((1, u))
    zps = jnp.zeros((eq_n, u))
    target = jnp.asarray([0.3, 0.5, 0.7])

    def score2d(s, z):
        return -((s - target[None, :]) ** 2)

    return fpcs(score2d, scales, zps, eq_n=eq_n, steps=steps, width=width)


def test_degenerate_refine_warns(caplog):
    with caplog.at_level(logging.WARNING, logger="adalog_tpu"):
        bs, bz = _run(eq_n=32, width=32, steps=2)
    assert any("diverging scale walk" in r.message for r in caplog.records)
    # still returns a usable selection near the per-unit optimum
    assert np.allclose(np.asarray(bs), [0.3, 0.5, 0.7], atol=0.1)


def test_contracting_refine_does_not_warn(caplog):
    with caplog.at_level(logging.WARNING, logger="adalog_tpu"):
        _run(eq_n=64, width=32, steps=2)
        _run(eq_n=32, width=32, steps=1)  # steps=1: single-pass path
    assert not [r for r in caplog.records
                if "diverging scale walk" in r.message]
