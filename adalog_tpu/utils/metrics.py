"""Evaluation loop and metrics.

Parity: reference utils/test_utils.py — validate() computing top-1/top-5/loss
with running averages. Here the per-batch metric computation is jitted and the
loop stays in Python only to feed data; logits never leave the device.
"""

from __future__ import annotations

import logging
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

log = logging.getLogger("adalog_tpu")


class AverageMeter:
    def __init__(self):
        self.val = self.sum = self.count = 0.0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self):
        return self.sum / max(self.count, 1)


@partial(jax.jit, static_argnames=())
def _batch_metrics(logits, labels):
    """Returns (sum cross-entropy, #top1 correct, #top5 correct)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                               axis=-1).sum()
    top5 = jax.lax.top_k(logits, 5)[1]
    correct1 = jnp.sum(top5[:, 0] == labels)
    correct5 = jnp.sum(jnp.any(top5 == labels[:, None], axis=-1))
    return nll, correct1, correct5


def validate(loader, forward_fn, print_freq: int = 10):
    """forward_fn: jitted images -> logits. loader yields (images, labels).

    Returns (loss, top1%, top5%) like test_utils.py:10-54.
    """
    loss_m, top1_m, top5_m, time_m = (AverageMeter() for _ in range(4))
    t_start = end = time.time()
    for i, (images, labels) in enumerate(loader):
        logits = forward_fn(jnp.asarray(images))
        nll, c1, c5 = _batch_metrics(logits, jnp.asarray(labels))
        n = images.shape[0]
        loss_m.update(float(nll) / n, n)
        top1_m.update(float(c1) * 100.0 / n, n)
        top5_m.update(float(c5) * 100.0 / n, n)
        time_m.update(time.time() - end)
        end = time.time()
        if i % print_freq == 0:
            log.info("Test: [%d] Time %.3f (%.3f) Loss %.4f (%.4f) "
                     "Prec@1 %.3f (%.3f) Prec@5 %.3f (%.3f)",
                     i, time_m.val, time_m.avg, loss_m.val, loss_m.avg,
                     top1_m.val, top1_m.avg, top5_m.val, top5_m.avg)
    log.info(" * Prec@1 %.3f Prec@5 %.3f Loss %.3f Time %.3f",
             top1_m.avg, top5_m.avg, loss_m.avg, time.time() - t_start)
    return loss_m.avg, top1_m.avg, top5_m.avg
